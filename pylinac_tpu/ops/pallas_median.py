"""Pallas TPU kernel: fused 3x3 median filter.

The 3x3 median is the de-spiking workhorse (reference
``core/array_utils.py:106``, ``picketfence.py:221``). The XLA fallback
materializes a (9, H, W) stack in HBM and runs a full sort; this kernel
instead keeps the padded image in VMEM and evaluates the classic
19-exchange median-of-9 selection network (Paeth) as pure VPU min/max ops —
one HBM read, one HBM write, no intermediate stack.

On non-TPU backends the kernel runs in Pallas interpreter mode so tests
exercise the same code path on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM is ~16 MB/core; padded image + 9 live shifted values must fit.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _median9_kernel(padded_ref, out_ref):
    h, w = out_ref.shape

    p = [padded_ref[i : i + h, j : j + w] for i in range(3) for j in range(3)]

    def ex(a: int, b: int) -> None:
        lo = jnp.minimum(p[a], p[b])
        hi = jnp.maximum(p[a], p[b])
        p[a], p[b] = lo, hi

    # 19-exchange median-of-9 network; median lands in p[4]
    ex(1, 2); ex(4, 5); ex(7, 8)
    ex(0, 1); ex(3, 4); ex(6, 7)
    ex(1, 2); ex(4, 5); ex(7, 8)
    ex(0, 3); ex(5, 8); ex(4, 7)
    ex(3, 6); ex(1, 4); ex(2, 5)
    ex(4, 7); ex(2, 4); ex(4, 6)
    ex(2, 4)
    out_ref[:] = p[4]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _median3x3_f32(x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    h, w = x.shape
    # reflect pad by 1 (scipy mode='reflect': d c b a | a b c d | d c b a)
    padded = jnp.pad(x, 1, mode="symmetric")
    return pl.pallas_call(
        _median9_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded)


def median3x3_supported(x: jnp.ndarray) -> bool:
    """True when the Pallas fast path applies: 2D and fits VMEM."""
    if x.ndim != 2:
        return False
    padded_bytes = (x.shape[0] + 2) * (x.shape[1] + 2) * 4
    return padded_bytes * 3 < _VMEM_BUDGET_BYTES  # padded + ~2 live copies


def median3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 median filter of a 2D image via the fused Pallas kernel.

    Caller must check :func:`median3x3_supported` first. Preserves dtype by
    computing in the input's own dtype (min/max are exact for ints too).
    """
    from .filters import _platform_of

    interpret = _platform_of(x) != "tpu"
    return _median3x3_f32(jnp.asarray(x), interpret)
