"""Profile layer tests: FWXM parity, SingleProfile semantics, circle profiles."""

import numpy as np
import pytest

from pylinac_tpu.core import profile as pprof
from pylinac_tpu.core.geometry import Point


def make_field(n=400, center=200.0, width=160.0, penumbra=8.0, amp=1000.0):
    """Analytic field: flat top with sigmoid penumbra; exact 50% edges at
    center±width/2."""
    x = np.arange(n, dtype=np.float64)
    left = center - width / 2
    right = center + width / 2
    v = amp / (1 + np.exp((left - x) / (penumbra / 4))) \
        - amp / (1 + np.exp((right - x) / (penumbra / 4)))
    return v + 10  # baseline


def test_fwxm_profile_edges():
    v = make_field()
    p = pprof.FWXMProfile(v, fwxm_height=50)
    left = p.field_edge_idx("left")
    right = p.field_edge_idx("right")
    assert abs(left - 120) < 0.2
    assert abs(right - 280) < 0.2
    assert abs(p.center_idx - 200) < 0.1
    assert abs(p.field_width_px - 160) < 0.3


def test_fwxm_profile_physical():
    v = make_field()
    p = pprof.FWXMProfilePhysical(v, dpmm=2.0)
    assert abs(p.field_width_mm - 80) < 0.3


def test_inflection_profile_edges():
    v = make_field()
    p = pprof.InflectionDerivativeProfile(v)
    left = p.field_edge_idx("left")
    right = p.field_edge_idx("right")
    # inflection of the sigmoid is at the exact edge for symmetric sigmoid
    assert abs(left - 120) < 0.5
    assert abs(right - 280) < 0.5


def test_hill_profile_edges():
    v = make_field()
    p = pprof.HillProfile(v, hill_window_ratio=0.2)
    left = p.field_edge_idx("left")
    right = p.field_edge_idx("right")
    assert abs(left - 120) < 0.5
    assert abs(right - 280) < 0.5


def test_single_profile_fwxm_data():
    v = make_field()
    p = pprof.SingleProfile(v, interpolation=pprof.Interpolation.LINEAR, dpmm=None)
    data = p.fwxm_data(x=50)
    assert abs(data["width (exact)"] - 160) < 0.3
    assert abs(data["center index (exact)"] - 200) < 0.2


def test_single_profile_dpmm_interpolation():
    v = make_field()
    p = pprof.SingleProfile(v, dpmm=2.0, interpolation_resolution_mm=0.1)
    # data interpolated to 0.1mm res: new dpmm = 10
    data = p.fwxm_data(x=50)
    assert abs(data["width (exact)"] - 160) < 0.3  # in ORIGINAL index units
    assert "width (exact) mm" in data
    assert abs(data["width (exact) mm"] - 80) < 0.2


def test_single_profile_field_data():
    v = make_field()
    p = pprof.SingleProfile(v, dpmm=2.0)
    data = p.field_data(in_field_ratio=0.8)
    assert abs(data["width (exact)"] - 128) < 0.5
    assert abs(data["beam center index (exact)"] - 200) < 0.2
    assert abs(data["cax index (exact)"] - 199.5) < 0.2
    assert "field values" in data


def test_single_profile_penumbra():
    v = make_field()
    p = pprof.SingleProfile(v, dpmm=2.0)
    data = p.penumbra(lower=20, upper=80)
    # for the logistic profile with k=penumbra/4=2:
    # 20-80% width = 2*ln(4)*2 = 5.545 px
    assert abs(data["left penumbra width (exact)"] - 5.545) < 0.3
    assert abs(data["right penumbra width (exact)"] - 5.545) < 0.3
    assert abs(data["left penumbra width (exact) mm"] - 2.77) < 0.2


def test_single_profile_normalization_beam_center():
    v = make_field()
    p = pprof.SingleProfile(v, normalization_method=pprof.Normalization.BEAM_CENTER)
    # beam center value should be ~1.0
    assert abs(p.values.max() - 1.0) < 0.05


def test_multi_profile_peaks():
    x = np.linspace(0, 6 * np.pi, 600)
    v = np.sin(x) + 1.5
    mp = pprof.MultiProfile(v)
    idxs, vals = mp.find_peaks()
    assert len(idxs) == 3
    # fwxm peaks
    idxs2, _ = mp.find_fwxm_peaks()
    assert len(idxs2) == 3
    np.testing.assert_allclose(idxs, idxs2, atol=2)
    vidxs, _ = mp.find_valleys()
    assert len(vidxs) >= 2


def test_circle_profile():
    # image with a bright ring
    yy, xx = np.mgrid[:200, :200]
    r = np.sqrt((yy - 100.0) ** 2 + (xx - 100.0) ** 2)
    img = np.exp(-((r - 60) ** 2) / 8)
    cp = pprof.CircleProfile(Point(100, 100), 60, img, ccw=True)
    assert len(cp.values) == int(np.pi * 60 * 2) or len(cp.values) >= 370
    assert cp.values.mean() > 0.5  # on the ring


def test_circle_profile_peak_mapping():
    # spots at 0 and 180 degrees on the circle
    img = np.zeros((200, 200))
    img[160, 100] = 10  # 90 deg (y+60)
    img[40, 100] = 10   # 270 deg
    from pylinac_tpu.ops.filters import gaussian_filter
    import jax.numpy as jnp
    img = np.asarray(gaussian_filter(jnp.asarray(img, jnp.float32), 2.0))
    cp = pprof.CircleProfile(Point(100, 100), 60, img, ccw=False)
    idxs, vals = cp.find_peaks(max_number=2)
    assert len(idxs) == 2
    ys = sorted(p.y for p in cp.peaks)
    assert abs(ys[0] - 40) < 3
    assert abs(ys[1] - 160) < 3


def test_collapsed_circle_profile():
    yy, xx = np.mgrid[:200, :200]
    r = np.sqrt((yy - 100.0) ** 2 + (xx - 100.0) ** 2)
    img = ((r > 55) & (r < 65)).astype(float)
    ccp = pprof.CollapsedCircleProfile(Point(100, 100), 60, img, width_ratio=0.05,
                                       num_profiles=5)
    assert ccp.values.mean() > 0.9  # the band is inside the ring


def test_resample_to():
    v = make_field()
    p1 = pprof.FWXMProfilePhysical(v, dpmm=2.0)
    p2 = pprof.FWXMProfilePhysical(make_field(n=200, center=100, width=80), dpmm=1.0)
    # physical ranges: p1 0..200mm, p2 0..200mm
    resampled = p1.resample_to(p2)
    assert len(resampled) == len(p2.values)


def test_profile_gamma_identical():
    v = make_field()
    p1 = pprof.FWXMProfilePhysical(v, dpmm=2.0)
    p2 = pprof.FWXMProfilePhysical(v.copy(), dpmm=2.0)
    g = p1.gamma(p2, dose_to_agreement=1, distance_to_agreement=1)
    valid = ~np.isnan(g)
    assert np.nanmax(np.abs(g[valid])) < 1e-4
