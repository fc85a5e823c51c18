"""Benchmark: batched TPU 2D-gamma throughput vs the reference's numpy path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's Low-2004 brute-force 2D gamma (``core/gamma.py:229``
semantics — disk of shifted grids, edge padding, nanmin, cap) at the clinical
3%/3mm criterion on EPID-sized 768x1024 pairs (0.336 mm pixels -> DTA=9px). This is pylinac's hot math: image gamma,
log-fluence gamma, and field gamma all funnel through it.

Fairness rules: both sides consume the same uint16 pixel batches and convert
to float32 themselves; both are warmed before timing; both are timed with
min-of-N (the host->device link in the test harness is a network tunnel with
high variance). The TPU time INCLUDES host->device transfer of both batches.
"""

from __future__ import annotations

import json
import time

import numpy as np

H, W = 768, 1024
N_PAIRS = 16
DTA = 9          # pixels: 3 mm at the AS1200's 0.336 mm/px
DOSE_TA = 3.0    # percent
CAP = 2.0
THRESH = 5.0     # percent of max


def _sig(x):
    return 1.0 / (1 + np.exp(np.clip(-x, -60, 60)))


def make_pairs(n: int, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """(ref, eval) uint16 dose-image batches: open fields with small
    per-pair shifts and noise so gamma is non-trivial."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    refs = np.empty((n, H, W), np.uint16)
    evals = np.empty((n, H, W), np.uint16)
    for i in range(n):
        cy, cx = H / 2, W / 2
        half = 256 + (i % 4) * 8
        def field(cy, cx, amp):
            v = (_sig((xx - (cx - half)) / 4) - _sig((xx - (cx + half)) / 4))
            v *= (_sig((yy - (cy - half)) / 4) - _sig((yy - (cy + half)) / 4))
            return amp * v
        r = field(cy, cx, 40000) + rng.normal(0, 60, (H, W))
        e = field(cy + rng.normal(0, 1.5), cx + rng.normal(0, 1.5),
                  40000 * (1 + rng.normal(0, 0.01))) + rng.normal(0, 60, (H, W))
        refs[i] = np.clip(r, 0, 65535).astype(np.uint16)
        evals[i] = np.clip(e, 0, 65535).astype(np.uint16)
    return refs, evals


def _disk_offsets(dta: int) -> list[tuple[int, int]]:
    # identical search neighborhood to the TPU kernel (skimage disk semantics)
    from pylinac_tpu.ops.gamma import _disk_offsets as kernel_offsets

    return kernel_offsets(dta)


def numpy_gamma_2d(reference_u16: np.ndarray, evaluation_u16: np.ndarray) -> np.ndarray:
    """The reference's brute-force single-pair path in plain numpy."""
    reference = reference_u16.astype(np.float32)
    evaluation = evaluation_u16.astype(np.float32)
    dose_ta = DOSE_TA / 100.0 * reference.max()
    ref_n = reference / dose_ta
    eval_n = evaluation / dose_ta
    eval_p = np.pad(eval_n, DTA, mode="edge")
    min_gamma2 = np.full((H, W), CAP**2, np.float32)
    for dy, dx in _disk_offsets(DTA):
        shifted = eval_p[DTA + dy: DTA + dy + H, DTA + dx: DTA + dx + W]
        dd = shifted - ref_n
        cand = (dy * dy + dx * dx) / (DTA * DTA) + dd * dd
        np.minimum(min_gamma2, cand, out=min_gamma2)
    gamma = np.minimum(np.sqrt(min_gamma2), CAP)
    below = reference < THRESH / 100.0 * reference.max()
    gamma[below] = np.nan
    return gamma


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pylinac_tpu.ops.gamma import gamma_2d

    refs, evals = make_pairs(N_PAIRS)

    @jax.jit
    def _batched(r_u16, e_u16):
        def one(r, e):
            return gamma_2d(r.astype(jnp.float32), e.astype(jnp.float32),
                            dose_to_agreement=DOSE_TA, distance_to_agreement=DTA,
                            gamma_cap_value=CAP, global_dose=True,
                            dose_threshold=THRESH)
        return jax.vmap(one)(r_u16, e_u16)

    out = _batched(jnp.asarray(refs), jnp.asarray(evals))  # warmup/compile
    jax.block_until_ready(out)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        r_dev = jax.device_put(refs)
        e_dev = jax.device_put(evals)
        out = _batched(r_dev, e_dev)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    tpu_time = min(times)
    tpu_pps = N_PAIRS / tpu_time

    # parity + sanity: device result matches the numpy algorithm
    g_np = numpy_gamma_2d(refs[0], evals[0])
    g_dev = np.asarray(out[0])
    both = ~(np.isnan(g_np) | np.isnan(g_dev))
    assert both.any()
    assert np.allclose(g_np[both], g_dev[both], atol=1e-3), "gamma parity failed"
    pass_rate = float(np.nanmean(g_np < 1) * 100)
    assert 30 < pass_rate <= 100, f"implausible pass rate {pass_rate}"

    # numpy single-pair baseline (warm, min-of-N)
    numpy_gamma_2d(refs[0], evals[0])  # warm
    np_times = []
    for i in range(4):
        t0 = time.perf_counter()
        numpy_gamma_2d(refs[i], evals[i])
        np_times.append(time.perf_counter() - t0)
    np_time = min(np_times)
    np_pps = 1.0 / np_time

    print(json.dumps({
        "metric": "2D gamma (3%/3mm Low-2004 brute force, DTA=9px) 768x1024 pairs/sec per chip",
        "value": round(tpu_pps, 2),
        "unit": "pairs/s",
        "vs_baseline": round(tpu_pps / np_pps, 2),
    }))


if __name__ == "__main__":
    main()
