"""Batched picket fence pipeline: one-dispatch batch vs single-image parity."""

import numpy as np
import pytest

from pylinac_tpu.imggen.layers import GaussianFilterLayer, PerfectFieldLayer
from pylinac_tpu.imggen.simulators import AS1200Image
from pylinac_tpu.imggen.utils import generate_picketfence


@pytest.fixture(scope="module")
def pf_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pfbatch")
    paths = []
    for i, err in enumerate(([0] * 10, [0, 0, 0.4, 0, 0, 0, 0, 0, 0, 0])):
        path = str(tmp / f"pf{i}.dcm")
        sim = AS1200Image(sid=1500)
        generate_picketfence(
            simulator=sim, field_layer=PerfectFieldLayer, file_out=path,
            final_layers=[GaussianFilterLayer(sigma_mm=1)],
            pickets=10, picket_spacing_mm=20, picket_width_mm=3,
            picket_offset_error=list(err))
        paths.append(path)
    return paths


def test_batch_matches_single(pf_files):
    from pylinac_tpu import PicketFence
    from pylinac_tpu.picketfence import analyze_batch

    batch_results = analyze_batch(pf_files, tolerance=0.5)
    assert len(batch_results) == len(pf_files)

    for path, br in zip(pf_files, batch_results):
        pf = PicketFence(path)
        pf.analyze(tolerance=0.5)
        sr = pf.results_data()
        assert br.number_of_pickets == sr.number_of_pickets
        assert br.percent_leaves_passing == pytest.approx(
            sr.percent_leaves_passing, abs=1e-9)
        assert br.max_error_mm == pytest.approx(sr.max_error_mm, abs=1e-3)
        assert br.absolute_median_error_mm == pytest.approx(
            sr.absolute_median_error_mm, abs=1e-3)
        assert br.mean_picket_spacing_mm == pytest.approx(
            sr.mean_picket_spacing_mm, abs=1e-3)
        assert br.mlc_skew == pytest.approx(sr.mlc_skew, abs=1e-3)
        assert np.allclose(br.offsets_from_cax_mm, sr.offsets_from_cax_mm,
                           atol=2e-3)
        assert br.failed_leaves == sr.failed_leaves
        assert sorted(br.mlc_errors_by_leaf) == sorted(sr.mlc_errors_by_leaf)
        for leaf, errs in br.mlc_errors_by_leaf.items():
            assert np.allclose(errs, sr.mlc_errors_by_leaf[leaf], atol=1.5e-3)
        for leaf, poss in br.mlc_positions_by_leaf.items():
            assert np.allclose(poss, sr.mlc_positions_by_leaf[leaf], atol=1.5e-3)


def test_batch_separate_leaves(pf_files):
    from pylinac_tpu import PicketFence
    from pylinac_tpu.picketfence import analyze_batch

    br = analyze_batch(pf_files[:1], tolerance=0.5, separate_leaves=True,
                       nominal_gap_mm=3)[0]
    pf = PicketFence(pf_files[0])
    pf.analyze(tolerance=0.5, separate_leaves=True, nominal_gap_mm=3)
    sr = pf.results_data()
    assert br.number_of_pickets == sr.number_of_pickets
    assert br.max_error_mm == pytest.approx(sr.max_error_mm, abs=2e-3)
    assert br.percent_leaves_passing == pytest.approx(
        sr.percent_leaves_passing, abs=1e-9)


def test_batch_detects_picket_error(pf_files):
    from pylinac_tpu.picketfence import analyze_batch

    results = analyze_batch(pf_files, tolerance=0.5)
    offsets = np.array(results[1].offsets_from_cax_mm)
    diffs = np.abs(np.diff(offsets))
    assert (np.max(diffs) - np.min(diffs)) > 0.1
