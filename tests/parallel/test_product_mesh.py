"""Product-API multi-chip sharding: *Batch.analyze(mesh=...) on the virtual
8-device CPU mesh must produce results identical to the unsharded path.

This is the product-level counterpart to the raw ``sharded_*`` kernel tests
in ``test_mesh.py`` (VERDICT r3 weak #7): a clinic with N chips shards a
real QA session through the public batch API, not a sidecar runner.
"""
import numpy as np
import pytest

from pylinac_tpu.imggen.layers import GaussianFilterLayer, PerfectFieldLayer
from pylinac_tpu.imggen.simulators import AS1200Image
from pylinac_tpu.imggen.utils import generate_picketfence
from pylinac_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    import jax

    assert len(jax.devices()) >= 8, "conftest should force the 8-device mesh"
    return make_mesh(8)


@pytest.fixture(scope="module")
def pf_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pfmesh")
    paths = []
    for i, err in enumerate(([0] * 8, [0, 0, 0.4, 0, 0, 0, 0, 0])):
        path = str(tmp / f"pf{i}.dcm")
        generate_picketfence(
            simulator=AS1200Image(sid=1500), field_layer=PerfectFieldLayer,
            file_out=path, final_layers=[GaussianFilterLayer(sigma_mm=1)],
            pickets=8, picket_spacing_mm=20, picket_width_mm=3,
            picket_offset_error=list(err))
        paths.append(path)
    return paths


def test_picketfence_batch_mesh(pf_files, mesh8):
    """PicketFenceBatch.analyze(mesh=...) == analyze(): 3 images over an
    8-device mesh (exercises batch padding to the device multiple)."""
    from pylinac_tpu.picketfence import PicketFenceBatch

    paths = [pf_files[0], pf_files[1], pf_files[0]]
    plain = PicketFenceBatch(paths)
    plain.analyze(tolerance=0.5)
    sharded = PicketFenceBatch(paths)
    sharded.analyze(tolerance=0.5, mesh=mesh8)

    for pr, sr in zip(plain.results_data(), sharded.results_data()):
        assert sr.number_of_pickets == pr.number_of_pickets
        assert sr.max_error_mm == pytest.approx(pr.max_error_mm, abs=1e-6)
        assert sr.absolute_median_error_mm == pytest.approx(
            pr.absolute_median_error_mm, abs=1e-6)
        assert np.allclose(sr.offsets_from_cax_mm, pr.offsets_from_cax_mm,
                           atol=1e-6)
        assert sr.failed_leaves == pr.failed_leaves


def test_field_analysis_batch_mesh(tmp_path, mesh8):
    """FieldAnalysisBatch.analyze(mesh=...) == analyze() on 5 images
    (padding 5 -> 8)."""
    from pylinac_tpu.field_analysis import FieldAnalysisBatch
    from pylinac_tpu.imggen.layers import FilteredFieldLayer
    from pylinac_tpu.imggen.simulators import AS1000Image

    paths = []
    for i in range(5):
        sim = AS1000Image(sid=1000)
        sim.add_layer(FilteredFieldLayer(
            field_size_mm=(60 + 10 * i, 60 + 10 * i)))
        sim.add_layer(GaussianFilterLayer(sigma_mm=1))
        p = str(tmp_path / f"f{i}.dcm")
        sim.generate_dicom(p)
        paths.append(p)

    plain = FieldAnalysisBatch(paths)
    plain.analyze()
    sharded = FieldAnalysisBatch(paths)
    sharded.analyze(mesh=mesh8)

    for pr, sr in zip(plain.results_data(), sharded.results_data()):
        assert sr.field_size_vertical_mm == pytest.approx(
            pr.field_size_vertical_mm, abs=1e-6)
        assert sr.field_size_horizontal_mm == pytest.approx(
            pr.field_size_horizontal_mm, abs=1e-6)
        assert sr.protocol_results["flatness_vertical"] == pytest.approx(
            pr.protocol_results["flatness_vertical"], abs=1e-9)


@pytest.mark.slow
def test_catphan_batch_mesh(tmp_path, mesh8):
    """CatPhanBatch.analyze(mesh=...) == analyze(): the z-sharded
    localization must yield the same origin/roll/HU results."""
    from pylinac_tpu.ct import CatPhanBatch
    from pylinac_tpu.imggen.ct import generate_catphan504

    dirs = []
    for i in range(2):
        d = str(tmp_path / f"scan{i}")
        generate_catphan504(d, num_slices=60, slice_thickness_mm=2.5)
        dirs.append(d)

    plain = CatPhanBatch(dirs)
    plain.analyze()
    sharded = CatPhanBatch(dirs)
    sharded.analyze(mesh=mesh8)

    for pc, sc in zip(plain.cts, sharded.cts):
        assert sc.origin_slice == pc.origin_slice
        assert sc.catphan_roll == pytest.approx(pc.catphan_roll, abs=1e-9)
        for name, roi in pc.ctp404.rois.items():
            assert sc.ctp404.rois[name].pixel_value == pytest.approx(
                roi.pixel_value, abs=1e-9), name
