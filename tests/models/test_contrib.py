"""Contrib module tests: jaw orthogonality + quasar scaling."""

import numpy as np
import pytest

from pylinac_tpu.contrib.orthogonality import JawOrthogonality
from pylinac_tpu.contrib.quasar import QuasarLightRadScaling


class TestJawOrthogonality:
    def test_square_field(self, tmp_path):
        from pylinac_tpu.imggen.layers import FilteredFieldLayer, GaussianFilterLayer
        from pylinac_tpu.imggen.simulators import AS1000Image

        sim = AS1000Image(sid=1000)
        sim.add_layer(FilteredFieldLayer(field_size_mm=(100, 100)))
        sim.add_layer(GaussianFilterLayer(sigma_mm=0.5))
        path = str(tmp_path / "ortho.dcm")
        sim.generate_dicom(path)
        jo = JawOrthogonality(path)
        jo.analyze()
        result = jo.results()
        assert set(result) == {"top_left", "top_right", "bottom_left",
                               "bottom_right"}
        for corner, angle in result.items():
            assert angle == pytest.approx(90, abs=0.5), corner


class TestQuasar:
    def test_light_rad_and_scaling(self, tmp_path):
        from pylinac_tpu.imggen.layers import (
            FilteredFieldLayer,
            GaussianFilterLayer,
            PerfectBBLayer,
        )
        from pylinac_tpu.imggen.simulators import AS1000Image

        sim = AS1000Image(sid=1000)
        sim.add_layer(FilteredFieldLayer(field_size_mm=(120, 120)))
        # corner BBs 11mm inside the field edges
        for pos in ((-49, -49), (-49, 49), (49, -49), (49, 49)):
            sim.add_layer(PerfectBBLayer(bb_size_mm=5, cax_offset_mm=pos))
        # 5 central scaling BBs
        for pos in ((0, 0), (-12, 0), (12, 0), (0, -12), (0, 12)):
            sim.add_layer(PerfectBBLayer(bb_size_mm=5, cax_offset_mm=pos))
        sim.add_layer(GaussianFilterLayer(sigma_mm=0.5))
        path = str(tmp_path / "quasar.dcm")
        sim.generate_dicom(path)
        q = QuasarLightRadScaling(path)
        q.analyze()
        data = q.results_data()
        assert data.field_size_x_mm == pytest.approx(120, abs=2)
        assert abs(data.field_bb_offset_x_mm) < 1.5
        assert len(q.scaling_centers) == 5
