"""Fixed-shape 1D peak analysis (scipy.signal.find_peaks parity) in pure JAX.

Replaces the reference's scipy dependency at ``core/profile.py:2545-2649``.
The core (:func:`peak_analysis`) is a pure, jit- and vmap-friendly function
over a 1D signal returning fixed-size (K,) arrays with a validity mask:

* plateau-aware local maxima (scipy midpoint convention),
* height filter, distance (separation) filter with scipy's priority order,
* prominences with scipy's base conventions,
* interpolated widths/ips at a relative height (used for FWXM edges).

Everything is O(K·N) masked vector math — no data-dependent shapes — so a
whole batch of profiles (e.g. every leaf-kiss window of a picket fence image)
is analyzed in one fused XLA computation via ``vmap``.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PeakResult(NamedTuple):
    """Fixed-size peak analysis results. Invalid slots have ``valid=False``."""

    positions: jnp.ndarray      # (K,) int32 peak indices (into the signal)
    values: jnp.ndarray         # (K,) float32 peak heights
    prominences: jnp.ndarray    # (K,) float32
    left_bases: jnp.ndarray     # (K,) int32
    right_bases: jnp.ndarray    # (K,) int32
    widths: jnp.ndarray         # (K,) float32
    width_heights: jnp.ndarray  # (K,) float32
    left_ips: jnp.ndarray       # (K,) float32 interpolated left crossing
    right_ips: jnp.ndarray      # (K,) float32
    valid: jnp.ndarray          # (K,) bool
    overflowed: jnp.ndarray     # () bool — more raw maxima existed than K slots

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid)


def _local_maxima(v: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of plateau-aware local maxima (scipy midpoint rule)."""
    n = v.shape[0]
    idx = jnp.arange(n)
    border = jnp.array(jnp.inf, v.dtype)  # sentinel that can never be "smaller"
    # run segmentation: a "run" is a maximal stretch of equal values
    change = jnp.concatenate([jnp.array([True]), v[1:] != v[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, idx, -1))
    change_r = jnp.concatenate([v[:-1] != v[1:], jnp.array([True])])
    run_end = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(change_r, idx, n))))
    prev_val = jnp.where(run_start > 0, v[jnp.maximum(run_start - 1, 0)], border)
    next_val = jnp.where(run_end < n - 1, v[jnp.minimum(run_end + 1, n - 1)], border)
    is_peak_run = (prev_val < v) & (next_val < v)
    mid = run_start + (run_end - run_start) // 2
    return is_peak_run & (idx == mid)


def _distance_filter(pos: jnp.ndarray, val: jnp.ndarray, valid: jnp.ndarray,
                     distance: jnp.ndarray, K: int) -> jnp.ndarray:
    """scipy _select_by_peak_distance: iterate peaks by descending height,
    removing not-yet-removed neighbors closer than `distance`."""
    # stable ascending argsort on height (invalid slots forced to -inf so they
    # sort first and never remove anything), then iterate in reverse.
    order = jnp.argsort(jnp.where(valid, val, -jnp.inf), stable=True)
    slots = jnp.arange(K)

    def body(k, keep):
        j = order[K - 1 - k]
        cond = valid[j] & keep[j]
        within = (jnp.abs(pos - pos[j]) < distance) & (slots != j)
        return jnp.where(cond & within, False, keep)

    # all-True carry derived from `valid` (not a fresh constant) so its
    # varying-manual-axes type matches under shard_map
    keep = jax.lax.fori_loop(0, K, body, valid | ~valid)
    return valid & keep


@functools.partial(jax.jit, static_argnames=("K",))
def peak_analysis(
    v: jnp.ndarray,
    K: int = 32,
    rel_height: float | jnp.ndarray = 0.5,
    height: float | jnp.ndarray = -jnp.inf,
    distance: float | jnp.ndarray = 1.0,
    min_width: float | jnp.ndarray = 0.0,
    required_prominence: float | jnp.ndarray | None = None,
) -> PeakResult:
    v = v.astype(jnp.float32)
    n = v.shape[0]
    idx = jnp.arange(n)
    inf = jnp.inf

    is_peak = _local_maxima(v)
    # height filter BEFORE slot collection: scipy applies height first and
    # it is elementwise, so this is semantics-preserving — and it stops
    # sub-threshold noise maxima from exhausting the K slots before the
    # real peaks are reached (slots fill left-to-right).
    is_peak &= v >= height
    overflowed = jnp.sum(is_peak) > K
    pos = jnp.nonzero(is_peak, size=K, fill_value=-1)[0].astype(jnp.int32)
    valid = pos >= 0
    safe_pos = jnp.maximum(pos, 0)
    val = v[safe_pos]

    # distance filter (scipy ceils the distance)
    valid = _distance_filter(pos, val, valid, jnp.ceil(jnp.asarray(distance, jnp.float32)), K)

    # prominences, vectorized over peaks: O(K*N)
    def prom_one(p, pv):
        higher_left = (v > pv) & (idx < p)
        L = jnp.max(jnp.where(higher_left, idx, -1)) + 1
        left_mask = (idx >= L) & (idx <= p)
        left_vals = jnp.where(left_mask, v, inf)
        left_min = jnp.min(left_vals)
        # scipy keeps the base closest to the peak on the left side
        left_base = jnp.max(jnp.where(left_vals == left_min, idx, -1))
        higher_right = (v > pv) & (idx > p)
        R = jnp.min(jnp.where(higher_right, idx, n)) - 1
        right_mask = (idx <= R) & (idx >= p)
        right_vals = jnp.where(right_mask, v, inf)
        right_min = jnp.min(right_vals)
        # ...and the base closest to the peak on the right side
        right_base = jnp.min(jnp.where(right_vals == right_min, idx, n))
        prom = pv - jnp.maximum(left_min, right_min)
        return prom, left_base.astype(jnp.int32), right_base.astype(jnp.int32)

    proms, left_bases, right_bases = jax.vmap(prom_one)(safe_pos, val)

    if required_prominence is not None:
        valid &= proms >= required_prominence

    # widths at rel_height (scipy _peak_widths)
    def width_one(p, pv, prom, lb, rb):
        h = pv - prom * rel_height
        # left crossing: largest j in [lb, p] with v[j] <= h, else lb
        lmask = (idx >= lb) & (idx <= p) & (v <= h)
        j = jnp.max(jnp.where(lmask, idx, lb))
        jn = jnp.minimum(j + 1, n - 1)
        interp = (h - v[j]) / jnp.where(v[jn] == v[j], 1.0, v[jn] - v[j])
        left_ip = jnp.where(v[j] < h, j + interp, j.astype(jnp.float32))
        # right crossing: smallest j in [p, rb] with v[j] <= h, else rb
        rmask = (idx >= p) & (idx <= rb) & (v <= h)
        j2 = jnp.min(jnp.where(rmask, idx, rb))
        jp = jnp.maximum(j2 - 1, 0)
        interp2 = (h - v[j2]) / jnp.where(v[jp] == v[j2], 1.0, v[jp] - v[j2])
        right_ip = jnp.where(v[j2] < h, j2 - interp2, j2.astype(jnp.float32))
        return right_ip - left_ip, h, left_ip, right_ip

    widths, wheights, left_ips, right_ips = jax.vmap(width_one)(
        safe_pos, val, proms, left_bases, right_bases
    )
    valid &= widths >= min_width

    return PeakResult(
        positions=pos, values=val, prominences=proms,
        left_bases=left_bases, right_bases=right_bases,
        widths=widths, width_heights=wheights,
        left_ips=left_ips, right_ips=right_ips, valid=valid,
        overflowed=overflowed,
    )


def compact_slots(result: PeakResult, K_out: int) -> PeakResult:
    """Move valid slots to the front (preserving left-to-right order) and
    truncate to ``K_out`` slots. Lets callers analyze with a generous K and
    carry a small fixed slot count downstream."""
    K = result.positions.shape[0]
    order = jnp.argsort(jnp.where(result.valid, jnp.arange(K), K + jnp.arange(K)))
    take = order[:K_out]

    def gather(f):
        return f[take]

    n = jnp.sum(result.valid)
    new_valid = jnp.arange(K_out) < n
    return PeakResult(
        positions=jnp.where(new_valid, gather(result.positions), -1),
        values=gather(result.values),
        prominences=gather(result.prominences),
        left_bases=gather(result.left_bases),
        right_bases=gather(result.right_bases),
        widths=gather(result.widths),
        width_heights=gather(result.width_heights),
        left_ips=gather(result.left_ips),
        right_ips=gather(result.right_ips),
        valid=new_valid & gather(result.valid),
        overflowed=result.overflowed,
    )


class MainPeak(NamedTuple):
    """The most prominent peak of a 1D signal: everything needed to evaluate
    FWXM crossings at any relative height without a fixed-K peak search."""

    pos: jnp.ndarray     # int32 peak index
    val: jnp.ndarray     # f32 height
    prom: jnp.ndarray    # f32 prominence
    lb: jnp.ndarray      # int32 left base
    rb: jnp.ndarray      # int32 right base


def main_peak(v: jnp.ndarray) -> MainPeak:
    """The most prominent peak = the global-max plateau (scipy midpoint
    convention), computed directly in O(N). No slot collection, so
    arbitrarily noisy signals cannot overflow a K budget."""
    n = v.shape[0]
    idx = jnp.arange(n)
    p0 = jnp.argmax(v)
    pv = v[p0]
    # contiguous equal-value run containing the argmax → midpoint
    brk = v != pv
    run_start = jnp.max(jnp.where((idx <= p0) & brk, idx, -1)) + 1
    run_end = jnp.min(jnp.where((idx >= p0) & brk, idx, n)) - 1
    p = (run_start + (run_end - run_start) // 2).astype(jnp.int32)
    # prominence bases: nothing is higher, so windows span the whole signal
    left_vals = jnp.where(idx <= p, v, jnp.inf)
    left_min = jnp.min(left_vals)
    lb = jnp.max(jnp.where(left_vals == left_min, idx, -1)).astype(jnp.int32)
    right_vals = jnp.where(idx >= p, v, jnp.inf)
    right_min = jnp.min(right_vals)
    rb = jnp.min(jnp.where(right_vals == right_min, idx, n)).astype(jnp.int32)
    prom = pv - jnp.maximum(left_min, right_min)
    return MainPeak(p, pv, prom, lb, rb)


def main_peak_ips(v: jnp.ndarray, pk: MainPeak, rel_height) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Interpolated left/right crossings of ``pk`` at ``rel_height`` (scipy
    ``peak_widths`` semantics; ``rel_height`` may be traced)."""
    n = v.shape[0]
    idx = jnp.arange(n)
    h = pk.val - pk.prom * rel_height
    lmask = (idx >= pk.lb) & (idx <= pk.pos) & (v <= h)
    j = jnp.max(jnp.where(lmask, idx, pk.lb))
    jn = jnp.minimum(j + 1, n - 1)
    interp = (h - v[j]) / jnp.where(v[jn] == v[j], 1.0, v[jn] - v[j])
    left_ip = jnp.where(v[j] < h, j + interp, j.astype(jnp.float32))
    rmask = (idx >= pk.pos) & (idx <= pk.rb) & (v <= h)
    j2 = jnp.min(jnp.where(rmask, idx, pk.rb))
    jp = jnp.maximum(j2 - 1, 0)
    interp2 = (h - v[j2]) / jnp.where(v[jp] == v[j2], 1.0, v[jp] - v[j2])
    right_ip = jnp.where(v[j2] < h, j2 - interp2, j2.astype(jnp.float32))
    return left_ip, right_ip


def select_top(result: PeakResult, max_number: int | None, sort_key: str = "prominences") -> PeakResult:
    """Keep the `max_number` peaks with the largest `sort_key`, preserving
    left-to-right order — mirrors the reference's max_number handling
    (``core/profile.py:2618-2624``). Pure jax; shape stays (K,)."""
    if max_number is None:
        return result
    key = getattr(result, sort_key)
    K = key.shape[0]
    masked = jnp.where(result.valid, key, -jnp.inf)
    order = jnp.argsort(masked, stable=True)  # ascending
    rank = jnp.empty(K, jnp.int32).at[order].set(jnp.arange(K, dtype=jnp.int32))
    # rank K-1 is the largest; keep ranks >= K - max_number
    keep = result.valid & (rank >= K - max_number)
    return result._replace(valid=keep)


_PEAK_DTYPES = (np.int32, np.float32, np.float32, np.int32, np.int32,
                np.float32, np.float32, np.float32, np.float32, np.bool_)


@jax.jit
def _pack_peaks(res: PeakResult) -> jnp.ndarray:
    """(10*K + 1,) float32: the ten (K,) fields then the overflow flag."""
    parts = [f.astype(jnp.float32) for f in res[:-1]]
    parts.append(res.overflowed.astype(jnp.float32)[None])
    return jnp.concatenate([p.ravel() for p in parts])


def _unpack_peaks(packed: np.ndarray, K: int) -> PeakResult:
    fields = [packed[i * K:(i + 1) * K].astype(dt)
              for i, dt in enumerate(_PEAK_DTYPES)]
    fields.append(packed[-1:].astype(bool)[0])
    return PeakResult(*fields)


@functools.partial(jax.jit, static_argnames=("K", "max_number", "sort_key"))
def _find_peaks_packed_rows(rows, heights, K, rel_height, distance,
                            min_width, required_prominence, max_number,
                            sort_key):
    """Row-batched form of :func:`_find_peaks_packed`: (B, N) signals with
    per-row height thresholds → (B, packed) in one dispatch."""
    return jax.vmap(
        lambda v, h: _find_peaks_packed.__wrapped__(
            v, K, rel_height, h, distance, min_width,
            required_prominence, max_number, sort_key))(rows, heights)


@functools.partial(jax.jit, static_argnames=("K", "max_number", "sort_key"))
def _find_peaks_packed(v, K, rel_height, height, distance, min_width,
                       required_prominence, max_number, sort_key):
    """Full find-peaks query (analysis + top-N select + pack) as ONE jitted
    dispatch — host callers pay a single device round trip per query."""
    res = peak_analysis(v, K=K, rel_height=rel_height, height=height,
                        distance=distance, min_width=min_width,
                        required_prominence=required_prominence)
    res = select_top(res, max_number, sort_key)
    return _pack_peaks(res)


# --------------------------------------------------------------------------
# Host-facing wrapper with the reference's argument semantics
# --------------------------------------------------------------------------
def find_peaks(
    values: np.ndarray,
    threshold: float = -np.inf,
    peak_separation: float = 0,
    max_number: int | None = None,
    fwxm_height: float = 0.5,
    min_width: int = 0,
    search_region: tuple[float, float] = (0.0, 1.0),
    peak_sort: str = "prominences",
    required_prominence: float | None = None,
    K: int = 64,
) -> tuple[np.ndarray, dict]:
    """Reference-compatible peak finder (``core/profile.py:2545``): returns
    (peak_indices, props_dict) as numpy with ratio/int argument coercion."""
    values = np.asarray(values, dtype=np.float32)
    n = len(values)
    if max_number is not None:
        # small-K fast path: the packed kernel's slot work scales with K;
        # callers wanting a handful of peaks (the CTP528 MTF windows ask
        # for <=5) start small — the adaptive escalation below still
        # recovers exactly if the raw maxima overflow the slots
        K = min(K, max(16, 4 * int(max_number)))
    val_range = float(values.max() - values.min())
    if 0 <= threshold <= 1:
        threshold = float(values.min()) + threshold * val_range
    if 0 <= peak_separation <= 1:
        peak_separation = max(int(peak_separation * n), 1)
    if max(search_region) <= 1:
        lo = int(search_region[0] * n)
        hi = int(search_region[1] * n)
    else:
        lo, hi = int(search_region[0]), int(search_region[1])
    trimmed = values[lo:hi]

    # adaptive K: escalate geometrically if the raw maxima overflow the slots
    # (keeps the jit cache bounded to a few K buckets). The result comes back
    # as ONE flattened float32 transfer — integer/bool arrays and multi-dim
    # float arrays fetch one element/row per round trip on remote transports.
    from . import route

    trimmed_dev = route.put(trimmed)
    while True:
        packed = np.asarray(_find_peaks_packed(
            trimmed_dev, K=K, rel_height=1 - fwxm_height,
            height=float(threshold), distance=float(peak_separation),
            min_width=float(min_width),
            required_prominence=required_prominence,
            max_number=max_number, sort_key=peak_sort,
        ))
        if not bool(packed[-1]) or K >= len(trimmed):
            break
        K = min(K * 4, max(len(trimmed), 1))
    res = _unpack_peaks(packed, K)
    mask = res.valid.astype(bool)
    props = {
        "prominences": res.prominences[mask].astype(float),
        "left_bases": res.left_bases[mask] + lo,
        "right_bases": res.right_bases[mask] + lo,
        "widths": res.widths[mask].astype(float),
        "width_heights": res.width_heights[mask].astype(float),
        "left_ips": res.left_ips[mask].astype(float) + lo,
        "right_ips": res.right_ips[mask].astype(float) + lo,
        "peak_heights": res.values[mask].astype(float),
    }
    peak_idxs = res.positions[mask].astype(np.int64) + lo
    return peak_idxs, props


def find_peaks_rows(
    rows: np.ndarray,
    threshold: float = -np.inf,
    peak_separation: float = 0,
    max_number: int | None = None,
    fwxm_height: float = 0.5,
    min_width: int = 0,
    search_region: tuple[float, float] = (0.0, 1.0),
    peak_sort: str = "prominences",
    required_prominence: float | None = None,
    K: int = 64,
) -> list[tuple[np.ndarray, dict]]:
    """Row-batched :func:`find_peaks`: one device dispatch + one fetch for a
    (B, N) stack of profiles sharing every argument (ratio thresholds
    resolve per row, exactly like B sequential calls). Returns the per-row
    (peak_indices, props) pairs in order — identical to looping
    :func:`find_peaks` over the rows."""
    rows = np.asarray(rows, dtype=np.float32)
    b, n = rows.shape
    if max_number is not None:
        K = min(K, max(16, 4 * int(max_number)))
    rmin = rows.min(axis=1)
    rmax = rows.max(axis=1)
    if 0 <= threshold <= 1:
        heights = rmin + threshold * (rmax - rmin)
    else:
        heights = np.full(b, threshold, np.float32)
    if 0 <= peak_separation <= 1:
        peak_separation = max(int(peak_separation * n), 1)
    if max(search_region) <= 1:
        lo = int(search_region[0] * n)
        hi = int(search_region[1] * n)
    else:
        lo, hi = int(search_region[0]), int(search_region[1])
    trimmed = rows[:, lo:hi]
    from . import route

    trimmed_dev = route.put(trimmed)
    heights_dev = route.put(heights.astype(np.float32),
                            small=trimmed.size <= route.SMALL_ELEMS)
    while True:
        packed = np.asarray(_find_peaks_packed_rows(
            trimmed_dev, heights_dev, K=K, rel_height=1 - fwxm_height,
            distance=float(peak_separation), min_width=float(min_width),
            required_prominence=required_prominence,
            max_number=max_number, sort_key=peak_sort))
        if not bool(packed[:, -1].any()) or K >= trimmed.shape[1]:
            break
        K = min(K * 4, max(trimmed.shape[1], 1))
    out = []
    for r in range(b):
        res = _unpack_peaks(packed[r], K)
        mask = res.valid.astype(bool)
        props = {
            "prominences": res.prominences[mask].astype(float),
            "left_bases": res.left_bases[mask] + lo,
            "right_bases": res.right_bases[mask] + lo,
            "widths": res.widths[mask].astype(float),
            "width_heights": res.width_heights[mask].astype(float),
            "left_ips": res.left_ips[mask].astype(float) + lo,
            "right_ips": res.right_ips[mask].astype(float) + lo,
            "peak_heights": res.values[mask].astype(float),
        }
        out.append((res.positions[mask].astype(np.int64) + lo, props))
    return out


def find_valleys(values: np.ndarray, **kwargs) -> tuple[np.ndarray, dict]:
    """Find valleys by inverting the signal (max+min-v, the reference's invert)."""
    values = np.asarray(values, dtype=np.float32)
    inverted = values.max() + values.min() - values
    return find_peaks(inverted, **kwargs)


def fwhm_center(v: jnp.ndarray, fwxm_height: float = 0.5, K: int = 8) -> jnp.ndarray:
    """Center of the FWXM of the single largest peak — the inner step of the
    reference's FWXM field-edge logic (``core/profile.py:598-608``). Jittable."""
    res = peak_analysis(v, K=K, rel_height=1 - fwxm_height)
    best = jnp.argmax(jnp.where(res.valid, res.prominences, -jnp.inf))
    return (res.left_ips[best] + res.right_ips[best]) / 2.0


def fwxm_edges(v: jnp.ndarray, fwxm_height: float = 0.5, K: int = 8) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(left_ip, right_ip) of the most prominent peak at the given FWXM height."""
    res = peak_analysis(v, K=K, rel_height=1 - fwxm_height)
    best = jnp.argmax(jnp.where(res.valid, res.prominences, -jnp.inf))
    return res.left_ips[best], res.right_ips[best]
