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

from ..ops.filters import scharr
from ..ops.threshold import otsu_threshold


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def sharded_field_analysis(images: jnp.ndarray, mesh: Mesh,
                           n_valid: int | None = None,
                           dpmm: float = 1.0, **analysis):
    """Run the REAL fused FieldAnalysis kernel
    (:func:`pylinac_tpu.ops.field_pipeline.field_analysis_image` — the same
    per-image product code :class:`~pylinac_tpu.field_analysis.FieldAnalysisBatch`
    dispatches) data-parallel over the mesh.

    Returns (per-image FieldResult scalar tree, global mean field size mm) —
    the global stat is produced with a psum inside shard_map so the
    collective rides ICI.

    ``n_valid`` is the true image count when the batch was zero-padded to a
    device-count multiple; padded entries are masked out of the global mean.
    ``analysis`` overrides the kernel statics (edge, normalization, ...);
    defaults mirror ``FieldAnalysis.analyze``'s Varian-protocol defaults.
    """
    from ..ops.field_pipeline import FAParams, field_analysis_image

    n_total, H, W = images.shape
    if n_valid is None:
        n_valid = n_total
    n_dev = mesh.shape["data"]  # only the data axis shards the batch
    per_shard = n_total // n_dev

    params = FAParams(
        dpmm=jnp.float32(dpmm),
        in_field_ratio=jnp.float32(analysis.pop("in_field_ratio", 0.8)),
        slope_exclusion_ratio=jnp.float32(
            analysis.pop("slope_exclusion_ratio", 0.2)),
        pen_lower=jnp.float32(20.0), pen_upper=jnp.float32(80.0),
        vert_position=jnp.float32(0.5), horiz_position=jnp.float32(0.5),
        vert_width=jnp.float32(analysis.pop("vert_width", 0.0)),
        horiz_width=jnp.float32(analysis.pop("horiz_width", 0.0)))
    static = dict(
        samples_v=int(round(H / (dpmm * 0.1))),
        samples_h=int(round(W / (dpmm * 0.1))),
        edge="Inflection Derivative", centering="Beam center",
        normalization="Beam center", flatness="difference",
        symmetry="point difference")
    static.update(analysis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P("data"),
        out_specs=(P("data"), P()),
    )
    def _run(local_images):
        single = functools.partial(field_analysis_image, params=params,
                                   **static)
        local = jax.vmap(single)(local_images.astype(jnp.float32))
        global_idx = (jax.lax.axis_index("data") * per_shard
                      + jnp.arange(per_shard))
        size = jnp.where(global_idx < n_valid,
                         local["vert"]["field_size_mm"], 0.0)
        total = jax.lax.psum(jnp.sum(size, keepdims=True), axis_name="data")
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

    n_dev = len(mesh.devices.ravel())
    z = volume.shape[0]
    pad = (-z) % n_dev
    if pad:
        # zero slices produce invalid regions -> zero fit weight, so an
        # uneven final shard costs nothing but the padding itself
        volume = jnp.concatenate(
            [volume, jnp.zeros((pad, *volume.shape[1:]), volume.dtype)])
    sharded = jax.device_put(volume, NamedSharding(mesh, P("data")))
    return jax.jit(_run)(sharded)


def sharded_picket_fence(images: jnp.ndarray, cfg, params, mesh: Mesh,
                         **static):
    """The REAL fused picket-fence pipeline
    (:func:`pylinac_tpu.ops.picket_pipeline.picket_fence_image`) run
    data-parallel: the image batch shards over the mesh's ``data`` axis and
    every chip analyzes its shard with the product kernel — per-image
    results bit-match the single-device batch path."""
    from ..ops.picket_pipeline import picket_fence_image

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"), P(), P()),
        out_specs=P("data"),
    )
    def _run(local_images, cfg_rep, params_rep):
        single = functools.partial(picket_fence_image, cfg=cfg_rep,
                                   params=params_rep, **static)
        return jax.vmap(single)(local_images)

    sharded = jax.device_put(images, NamedSharding(mesh, P("data")))
    return jax.jit(_run)(sharded, cfg, params)


def sharded_gamma_2d(refs: jnp.ndarray, evals: jnp.ndarray, mesh: Mesh,
                     **gamma_kwargs):
    """Batched 2D gamma (Low 2004 brute force) sharded over image pairs.

    Batches not divisible by the device count are padded (and the result
    sliced back), matching the PF/FA/CT mesh entries."""
    from ..ops.gamma import gamma_2d

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
    )
    def _run(local_r, local_e):
        def one(r, e):
            return gamma_2d(r.astype(jnp.float32), e.astype(jnp.float32),
                            **gamma_kwargs)
        return jax.vmap(one)(local_r, local_e)

    n = mesh.devices.size
    refs_p, B = _pad_batch(jnp.asarray(refs), n)
    evals_p, _ = _pad_batch(jnp.asarray(evals), n)
    shard = NamedSharding(mesh, P("data"))
    out = jax.jit(_run)(jax.device_put(refs_p, shard),
                        jax.device_put(evals_p, shard))
    return out[:B]


def sharded_wl_centroids(images: jnp.ndarray, mesh: Mesh,
                         bb_window_px: int = 24):
    """Winston-Lutz per-image field-CAX + BB centroiding sharded over the
    image-set axis; centroids are all-gathered so the (tiny) 3D solves can
    run on the full set (SURVEY §2.5: WL image sets shard over images).

    Per image (the same physics as ``WLBaseImage.analyze``): the open-field
    centroid from the 50%-threshold mask with holes filled, then the BB as
    the intensity-weighted centroid of the inverted signal in a window
    around the field CAX. Returns (N, 4): field_y, field_x, bb_y, bb_x.
    """
    from ..ops.label import fill_holes

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P("data"),
        out_specs=P(),
        check_rep=False,
    )
    def _run(local_images):
        def one(img):
            img = img.astype(jnp.float32)
            img = img - jnp.min(img)
            h, w = img.shape
            yy = jnp.arange(h, dtype=jnp.float32)[:, None]
            xx = jnp.arange(w, dtype=jnp.float32)[None, :]
            # field: 50% threshold -> fill -> center of mass
            field = fill_holes(img > 0.5 * jnp.max(img))
            fmass = jnp.maximum(jnp.sum(field), 1.0)
            fy = jnp.sum(field * yy) / fmass
            fx = jnp.sum(field * xx) / fmass
            # BB: inverted-signal weighted centroid in a window at the CAX
            half = bb_window_px
            inv = jnp.where(field, jnp.max(img) - img, 0.0)
            in_win = ((jnp.abs(yy - fy) <= half) & (jnp.abs(xx - fx) <= half))
            wgt = jnp.where(in_win, inv, 0.0)
            # subtract the in-window floor so the flat field doesn't bias
            floor = jnp.min(jnp.where(in_win, inv, jnp.inf))
            wgt = jnp.where(in_win, jnp.maximum(wgt - floor, 0.0), 0.0)
            bmass = jnp.maximum(jnp.sum(wgt), 1e-6)
            by = jnp.sum(wgt * yy) / bmass
            bx = jnp.sum(wgt * xx) / bmass
            return jnp.stack([fy, fx, by, bx])

        local = jax.vmap(one)(local_images)
        return jax.lax.all_gather(local, axis_name="data", tiled=True)

    sharded = jax.device_put(images, NamedSharding(mesh, P("data")))
    return jax.jit(_run)(sharded)


# --------------------------------------------------------------------------
# Product-API sharding: the *Batch classes delegate here when analyze() is
# given a mesh. Each helper pads the batch axis to a device multiple, runs
# the IDENTICAL per-image product kernel shard-locally, packs the result
# tree on device (one D2H fetch), and drops the padded rows — per-image
# results bit-match the single-device batch path.
# --------------------------------------------------------------------------
def _pad_batch(images: jnp.ndarray, n: int) -> tuple[jnp.ndarray, int]:
    B = images.shape[0]
    pad = (-B) % n
    if pad:
        reps = -(-pad // B)  # pad can exceed B (e.g. 3 images on 8 devices)
        filler = jnp.concatenate([images] * reps, axis=0)[:pad]
        images = jnp.concatenate([images, filler], axis=0)
    return images, B


def sharded_pf_batch(images: jnp.ndarray, cfg, params, mesh: Mesh,
                     **static) -> dict:
    """:class:`~pylinac_tpu.picketfence.PicketFenceBatch`'s fused pipeline
    data-parallel over ``mesh`` (reference per-image loop:
    ``/root/reference/pylinac/picketfence.py:636``)."""
    from ..ops.pack import pack_tree, tree_spec, unpack_tree
    from ..ops.picket_pipeline import picket_fence_batch

    n = mesh.devices.size
    padded, B = _pad_batch(images, n)
    static = dict(static)
    static["chunk"] = max(1, min(static.get("chunk", 32),
                                 padded.shape[0] // n))

    run = shard_map(
        lambda im, c, p: picket_fence_batch(im, c, p, **static),
        mesh=mesh, in_specs=(P("data"), P(), P()), out_specs=P("data"))
    packed_fn = jax.jit(lambda im, c, p: pack_tree(run(im, c, p)))
    sharded = jax.device_put(padded, NamedSharding(mesh, P("data")))
    packed = packed_fn(sharded, cfg, params)
    spec = tree_spec(
        functools.partial(picket_fence_batch, **static),
        jax.ShapeDtypeStruct(padded.shape, padded.dtype), cfg, params,
        cache_key=("pf-sharded", padded.shape, str(padded.dtype),
                   cfg.tops.shape, n, tuple(sorted(static.items()))))
    out = unpack_tree(packed, spec)
    return jax.tree_util.tree_map(lambda x: x[:B], out)


def sharded_fa_strips_batch(vert_strips: np.ndarray, horiz_strips: np.ndarray,
                            params, mesh: Mesh, **static) -> dict:
    """:class:`~pylinac_tpu.field_analysis.FieldAnalysisBatch`'s fused strip
    pipeline data-parallel over ``mesh`` (reference per-image loop:
    ``/root/reference/pylinac/field_analysis.py:565``)."""
    from ..ops.field_pipeline import field_analysis_strips_batch
    from ..ops.pack import pack_tree, tree_spec, unpack_tree

    n = mesh.devices.size
    vert, B = _pad_batch(jnp.asarray(vert_strips, jnp.float32), n)
    horiz, _ = _pad_batch(jnp.asarray(horiz_strips, jnp.float32), n)

    run = shard_map(
        lambda v, hz, p: field_analysis_strips_batch(v, hz, p, **static),
        mesh=mesh, in_specs=(P("data"), P("data"), P()),
        out_specs=P("data"))
    packed_fn = jax.jit(lambda v, hz, p: pack_tree(run(v, hz, p)))
    shard = NamedSharding(mesh, P("data"))
    packed = packed_fn(jax.device_put(vert, shard),
                       jax.device_put(horiz, shard), params)
    spec = tree_spec(
        functools.partial(field_analysis_strips_batch, **static),
        jax.ShapeDtypeStruct(vert.shape, jnp.float32),
        jax.ShapeDtypeStruct(horiz.shape, jnp.float32), params,
        cache_key=("fa-sharded", vert.shape, horiz.shape, n,
                   tuple(sorted(static.items()))))
    out = unpack_tree(packed, spec)
    return jax.tree_util.tree_map(lambda x: x[:B], out)


def sharded_stack_phantom_regions(volume: jnp.ndarray, K: int,
                                  clear_borders: bool, ds: int, clip: bool,
                                  mesh: Mesh):
    """CatPhan's whole-stack localization pass sharded along z
    (reference per-slice loop: ``/root/reference/pylinac/ct.py:2398``).
    Per-slice output order matches the unsharded
    :func:`pylinac_tpu.ct._stack_phantom_regions`; padded slices (all-zero,
    appended at the end) are dropped before returning."""
    from ..ct import _stack_phantom_regions

    n = mesh.devices.size
    N = volume.shape[0]
    pad = (-N) % n
    if pad:
        volume = jnp.concatenate(
            [volume, jnp.zeros((pad,) + volume.shape[1:], volume.dtype)])

    run = shard_map(
        lambda v: _stack_phantom_regions(v, K, clear_borders, ds, clip),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        # the pallas CCL branch traced by platform_dependent can't carry
        # vma annotations; per-slice outputs are trivially varying-on-data
        check_rep=False)
    packed, max_edges = jax.jit(run)(
        jax.device_put(volume, NamedSharding(mesh, P("data"))))
    main, label_id = packed
    return (main[:N], label_id[:N]), max_edges[:N]


class QABatchRunner:
    """Convenience wrapper: compile once, stream QA image batches through the
    sharded REAL FieldAnalysis pipeline (one compiled program per image
    shape; the batch axis is padded to a device-count multiple and padded
    entries are masked out of global stats)."""

    def __init__(self, mesh: Mesh | None = None, dpmm: float = 1.0,
                 **analysis):
        self.mesh = mesh or make_mesh()
        self.dpmm = dpmm
        self.analysis = analysis

    def run(self, images: np.ndarray):
        """(N, H, W) open-field images → (per-image FieldResult scalar tree,
        global mean field size mm). Images in one call must share a shape;
        the product kernel's H/W are baked into the compiled program."""
        from .. import profiling

        n, h, w = images.shape
        with profiling.stage("bucket+pad"):
            n_dev = len(self.mesh.devices.ravel())
            pad_n = int(np.ceil(n / n_dev) * n_dev)
            batch = np.zeros((pad_n, h, w), np.float32)
            batch[:n] = images
        with profiling.stage("sharded_compute"):
            metrics, mean_size = sharded_field_analysis(
                jnp.asarray(batch), self.mesh, n_valid=n, dpmm=self.dpmm,
                **self.analysis)
            jax.block_until_ready(metrics)
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[:n], metrics), float(
            np.asarray(mean_size)[0])
