"""Multi-chip batch runtime: mesh/pjit sharding for QA workloads.

The reference is single-process scipy (SURVEY §2.5); the TPU-native
equivalents here are:

* **data parallelism** — a QA session's image batch sharded over the
  ``data`` mesh axis; each chip runs the fused field pipeline on its shard
  and global statistics ride a ``psum`` over ICI;
* **spatial (z) parallelism** — a CT stack sharded along z; per-slice
  localization runs shard-locally, per-slice centroids are ``all_gather``-ed
  for the global z-axis fit (mirrors ``ct.py:2398``'s cross-slice polyfit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.field import batched_field_metrics, image_field_metrics
from ..ops.filters import scharr
from ..ops.threshold import otsu_threshold


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def sharded_batch_metrics(images: jnp.ndarray, mesh: Mesh,
                          n_valid: int | None = None):
    """Run the fused field pipeline data-parallel over the mesh.

    Returns (per-image metrics, global mean field width) — the global stat is
    produced with a psum inside shard_map so the collective rides ICI.

    ``n_valid`` is the true image count when the batch was zero-padded to a
    device-count multiple; padded entries are masked out of the global mean.
    """
    n_total = images.shape[0]
    if n_valid is None:
        n_valid = n_total
    n_dev = len(mesh.devices.ravel())
    per_shard = n_total // n_dev

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P("data"),
        out_specs=(P("data"), P()),
    )
    def _run(local_images):
        local = jax.vmap(image_field_metrics)(local_images.astype(jnp.float32))
        global_idx = (jax.lax.axis_index("data") * per_shard
                      + jnp.arange(per_shard))
        width = jnp.where(global_idx < n_valid,
                          local["vertical"].field_width_px, 0.0)
        total = jax.lax.psum(jnp.sum(width, keepdims=True), axis_name="data")
        return local, total / n_valid

    sharded = jax.device_put(images, NamedSharding(mesh, P("data")))
    return jax.jit(_run)(sharded)


def sharded_ct_localization(volume: jnp.ndarray, mesh: Mesh):
    """Per-slice phantom centroiding with the z-axis sharded over the mesh.

    Each chip computes Scharr-edge centroids for its z-shard; the per-slice
    centroids are all-gathered and the z-axis linear fit (the cross-slice
    reduction of ``find_phantom_axis``) runs replicated on the gathered
    (Z, 3) result — tiny, so it stays out of HBM-heavy paths.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P("data"),
        out_specs=P(),
        check_rep=False,  # lstsq on the all-gathered result is replicated
    )
    def _run(local_vol):
        from ..ops import label as jlabel
        from ..ops.filters import gaussian_filter

        def one_slice(sl):
            # the real per-slice localization pipeline (ct.py
            # _stack_phantom_regions): blurred Scharr edges -> Otsu ->
            # regionprops -> centroid of the largest filled region,
            # weighted by its area for the global fit
            edges = gaussian_filter(scharr(sl), 1.0)
            bw = edges > otsu_threshold(edges)
            regions = jlabel.clear_border(
                jlabel.regionprops(bw, edges, K=16, connectivity=2, hull=False))
            score = jnp.where(regions.valid, regions.area_filled, -1.0)
            best = jnp.argmax(score)
            return jnp.stack([regions.centroid_r[best], regions.centroid_c[best],
                              jnp.maximum(score[best], 0.0)])

        local_centroids = jax.vmap(one_slice)(local_vol.astype(jnp.float32))
        all_centroids = jax.lax.all_gather(local_centroids, axis_name="data",
                                           tiled=True)
        # weighted linear fit of centroid vs z (normal equations; z is the
        # global slice index)
        z = jnp.arange(all_centroids.shape[0], dtype=jnp.float32)
        w = all_centroids[:, 2]
        A = jnp.stack([z, jnp.ones_like(z)], axis=1) * jnp.sqrt(w)[:, None]
        fits = []
        for col in range(2):
            b = all_centroids[:, col] * jnp.sqrt(w)
            coef, *_ = jnp.linalg.lstsq(A, b)
            fits.append(coef)
        return jnp.stack(fits)  # (2, 2): [slope, intercept] for y and x

    sharded = jax.device_put(volume, NamedSharding(mesh, P("data")))
    return jax.jit(_run)(sharded)


class QABatchRunner:
    """Convenience wrapper: compile once, stream QA image batches through the
    sharded pipeline with shape bucketing to avoid recompiles."""

    def __init__(self, mesh: Mesh | None = None):
        self.mesh = mesh or make_mesh()
        self._bucket_cache: dict[tuple, object] = {}

    @staticmethod
    def _bucket_shape(shape: tuple[int, int]) -> tuple[int, int]:
        """Round H, W up to multiples of 128 so heterogeneous EPID sizes land
        in a small set of compiled shapes."""
        return tuple(int(np.ceil(s / 128) * 128) for s in shape)

    def run(self, images: np.ndarray):
        from .. import profiling

        n, h, w = images.shape
        with profiling.stage("bucket+pad"):
            bh, bw = self._bucket_shape((h, w))
            n_dev = len(self.mesh.devices.ravel())
            pad_n = int(np.ceil(n / n_dev) * n_dev)
            batch = np.zeros((pad_n, bh, bw), np.float32)
            batch[:n, :h, :w] = images
        with profiling.stage("sharded_compute"):
            metrics, mean_width = sharded_batch_metrics(
                jnp.asarray(batch), self.mesh, n_valid=n)
            jax.block_until_ready(metrics)
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[:n], metrics), float(
            np.asarray(mean_width)[0])
