"""Interface-tester mixins: the reference's FromZip/Init/ResultsData testers
(``tests_basic/utils.py:294-343``) as parametrized pytest mixins.

Every analysis class must: construct from its canonical input, refuse
result access before ``analyze()``, produce ``results()`` text plus
``results_data()`` in object/dict/JSON forms with populated warnings
plumbing, and (where the reference supports it) load from a zip archive.
"""

import json
import zipfile

import numpy as np
import pytest

from pylinac_tpu.imggen.layers import (
    FilteredFieldLayer,
    GaussianFilterLayer,
    PerfectFieldLayer,
)
from pylinac_tpu.imggen.simulators import AS1000Image, AS1200Image
from pylinac_tpu.imggen.utils import generate_picketfence, generate_winstonlutz


@pytest.fixture(scope="module")
def pf_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("iface_pf")
    path = str(tmp / "pf.dcm")
    generate_picketfence(
        simulator=AS1200Image(sid=1500), field_layer=PerfectFieldLayer,
        file_out=path, final_layers=[GaussianFilterLayer(sigma_mm=1)],
        pickets=5, picket_spacing_mm=30, picket_width_mm=3)
    return path


@pytest.fixture(scope="module")
def field_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("iface_fa")
    path = str(tmp / "field.dcm")
    sim = AS1000Image(sid=1000)
    sim.add_layer(FilteredFieldLayer(field_size_mm=(100, 100)))
    sim.add_layer(GaussianFilterLayer(sigma_mm=1))
    sim.generate_dicom(path)
    return path


class ResultsDataTester:
    """Mixin: results_data object/dict/json forms agree and carry metadata
    (reference ResultsDataBase, tests_basic/core/test_utilities.py)."""

    def build_analyzed(self, tmp_path):  # pragma: no cover - override
        raise NotImplementedError

    def test_results_before_analyze_raises(self, tmp_path):
        obj = self.build_unanalyzed(tmp_path)
        with pytest.raises(Exception):  # NotAnalyzed / ValueError
            obj.results_data()

    def test_results_data_forms(self, tmp_path):
        obj = self.build_analyzed(tmp_path)
        data = obj.results_data()
        as_dict = obj.results_data(as_dict=True)
        as_json = obj.results_data(as_json=True)
        assert isinstance(as_dict, dict)
        parsed = json.loads(as_json)
        assert parsed.keys() == as_dict.keys()
        assert data.pylinac_version
        assert hasattr(data, "warnings")
        assert isinstance(obj.results(), str)


class TestPicketFenceInterface(ResultsDataTester):
    def build_unanalyzed(self, tmp_path, pf=None):
        from pylinac_tpu import PicketFence

        return PicketFence(self._path)

    def build_analyzed(self, tmp_path):
        obj = self.build_unanalyzed(tmp_path)
        obj.analyze()
        return obj

    @pytest.fixture(autouse=True)
    def _setup(self, pf_file):
        self._path = pf_file

    def test_from_multiple_images(self, tmp_path, pf_file):
        # the reference PF has no from_zip; its multi-image combiner is the
        # equivalent loader surface (picketfence.py:403)
        from pylinac_tpu import PicketFence

        pf = PicketFence.from_multiple_images([pf_file, pf_file])
        pf.analyze()
        assert pf.results_data().max_error_mm < 0.01


class TestFieldAnalysisInterface(ResultsDataTester):
    @pytest.fixture(autouse=True)
    def _setup(self, field_file):
        self._path = field_file

    def build_unanalyzed(self, tmp_path):
        from pylinac_tpu import FieldAnalysis

        return FieldAnalysis(self._path)

    def build_analyzed(self, tmp_path):
        obj = self.build_unanalyzed(tmp_path)
        obj.analyze()
        return obj


class TestStarshotInterface(ResultsDataTester):
    @pytest.fixture(autouse=True)
    def _setup(self, tmp_path_factory):
        from tests.models.test_starshot import make_starshot

        tmp = tmp_path_factory.mktemp("iface_star")
        self._path = make_starshot(tmp)

    def build_unanalyzed(self, tmp_path):
        from pylinac_tpu import Starshot

        return Starshot(self._path)

    def build_analyzed(self, tmp_path):
        obj = self.build_unanalyzed(tmp_path)
        obj.analyze()
        return obj

    def test_from_zip(self, tmp_path):
        from pylinac_tpu import Starshot

        zpath = tmp_path / "star.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            z.write(self._path, "star.dcm")
        s = Starshot.from_zip(str(zpath))
        s.analyze()
        assert s.results_data().circle_diameter_mm < 0.05


class TestWinstonLutzInterface(ResultsDataTester):
    @pytest.fixture(autouse=True)
    def _setup(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("iface_wl")
        d = str(tmp / "set")
        generate_winstonlutz(
            simulator=AS1200Image(sid=1000), field_layer=PerfectFieldLayer,
            final_layers=[GaussianFilterLayer(sigma_mm=1)], dir_out=d,
            image_axes=((0, 0, 0), (90, 0, 0), (180, 0, 0), (270, 0, 0)))
        self._dir = d

    def build_unanalyzed(self, tmp_path):
        from pylinac_tpu import WinstonLutz

        return WinstonLutz(self._dir)

    def build_analyzed(self, tmp_path):
        obj = self.build_unanalyzed(tmp_path)
        obj.analyze()
        return obj

    def test_from_zip(self, tmp_path):
        import pathlib

        from pylinac_tpu import WinstonLutz

        zpath = tmp_path / "wl.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            for f in pathlib.Path(self._dir).iterdir():
                z.write(f, f.name)
        wl = WinstonLutz.from_zip(str(zpath))
        wl.analyze()
        assert wl.results_data().max_2d_cax_to_bb_mm < 0.5


class TestVMATInterface(ResultsDataTester):
    @pytest.fixture(autouse=True)
    def _setup(self, tmp_path_factory):
        from tests.models.test_vmat import make_drgs_pair

        tmp = tmp_path_factory.mktemp("iface_vmat")
        self._paths = make_drgs_pair(tmp)

    def build_unanalyzed(self, tmp_path):
        from pylinac_tpu.vmat import DRGS

        return DRGS(image_paths=self._paths)

    def build_analyzed(self, tmp_path):
        obj = self.build_unanalyzed(tmp_path)
        obj.analyze()
        return obj

    def test_from_zip(self, tmp_path):
        from pylinac_tpu.vmat import DRGS

        zpath = tmp_path / "vmat.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            for i, f in enumerate(self._paths):
                z.write(f, f"img{i}.dcm")
        v = DRGS.from_zip(str(zpath))
        v.analyze()
        assert v.results_data().passed
