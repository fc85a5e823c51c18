"""Chunked host->device staging (ops/staging.py) and the batched gamma
product entry that rides it."""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _reload_with_chunk(monkeypatch, mb):
    monkeypatch.setenv("PYLINAC_TPU_STAGE_CHUNK_MB", str(mb))
    import pylinac_tpu.ops.staging as st

    importlib.reload(st)
    return st


@pytest.mark.parametrize("chunk_mb", [0, 0.25, 1])
@pytest.mark.parametrize(
    "shape,dtype",
    [((64, 64), np.float32),          # small: passthrough
     ((16, 768, 128), np.uint16),     # integer dtype, non-divisible tail
     ((3, 555, 333), np.int32)])      # odd shape (f64 would downcast: x32)
def test_stage_roundtrip(monkeypatch, chunk_mb, shape, dtype):
    st = _reload_with_chunk(monkeypatch, chunk_mb)
    rng = np.random.default_rng(7)
    arr = (rng.normal(0, 1000, shape)).astype(dtype)
    out = st.stage(arr)
    assert out.shape == arr.shape
    assert out.dtype == arr.dtype
    np.testing.assert_array_equal(np.asarray(out), arr)


def test_stage_passthrough_for_jax_arrays(monkeypatch):
    st = _reload_with_chunk(monkeypatch, 1)
    dev = jnp.arange(10.0)
    assert st.stage(dev) is dev


def test_stage_noncontiguous_input(monkeypatch):
    st = _reload_with_chunk(monkeypatch, 0.25)
    base = np.arange(4 * 600 * 600, dtype=np.float32).reshape(4, 600, 600)
    view = base[:, ::2, ::2]  # non-contiguous
    np.testing.assert_array_equal(np.asarray(st.stage(view)), view)


def test_gamma_2d_batch_matches_single(monkeypatch):
    _reload_with_chunk(monkeypatch, 0.25)  # force chunking even at this size
    from pylinac_tpu.ops.gamma import gamma_2d, gamma_2d_batch

    rng = np.random.default_rng(3)
    refs = rng.uniform(0, 60000, (3, 96, 128)).astype(np.uint16)
    evals = np.clip(
        refs.astype(np.float64) + rng.normal(0, 300, refs.shape),
        0, 65535).astype(np.uint16)
    batch = np.asarray(gamma_2d_batch(
        refs, evals, dose_to_agreement=3.0, distance_to_agreement=3,
        gamma_cap_value=2.0, global_dose=True, dose_threshold=5.0))
    for i in range(refs.shape[0]):
        single = np.asarray(gamma_2d(
            jnp.asarray(refs[i], jnp.float32),
            jnp.asarray(evals[i], jnp.float32),
            dose_to_agreement=3.0, distance_to_agreement=3,
            gamma_cap_value=2.0, global_dose=True, dose_threshold=5.0))
        both = ~(np.isnan(single) | np.isnan(batch[i]))
        np.testing.assert_array_equal(np.isnan(single), np.isnan(batch[i]))
        np.testing.assert_allclose(batch[i][both], single[both], atol=1e-5)


def test_gamma_2d_batch_mesh_matches(monkeypatch):
    _reload_with_chunk(monkeypatch, 1)
    from jax.sharding import Mesh

    from pylinac_tpu.ops.gamma import gamma_2d_batch

    devs = np.array(jax.devices())
    if len(devs) < 2:
        pytest.skip("needs multi-device mesh")
    mesh = Mesh(devs, ("data",))
    rng = np.random.default_rng(5)
    refs = rng.uniform(0, 60000, (8, 64, 64)).astype(np.uint16)
    evals = refs.copy()
    plain = np.asarray(gamma_2d_batch(refs, evals, dose_to_agreement=3.0,
                                      distance_to_agreement=2))
    sharded = np.asarray(gamma_2d_batch(refs, evals, dose_to_agreement=3.0,
                                        distance_to_agreement=2, mesh=mesh))
    both = ~(np.isnan(plain) | np.isnan(sharded))
    np.testing.assert_allclose(sharded[both], plain[both], atol=1e-5)
