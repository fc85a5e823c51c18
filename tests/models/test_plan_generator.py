"""Plan generator tests: MLC shaping, RTPLAN generation, fluence rasterizing,
and an end-to-end loop into the PicketFence analysis."""

import numpy as np
import pytest

from pylinac_tpu.core import dcm
from pylinac_tpu.plan_generator import (
    FluenceMode,
    HalcyonPlanGenerator,
    MLCShaper,
    OvertravelError,
    Stack,
    TrueBeamPlanGenerator,
    generate_fluences,
)
from pylinac_tpu.plan_generator.dicom import (
    MLC_MILLENNIUM_BOUNDARIES,
    MLC_DISTAL_BOUNDARIES,
    MLC_PROXIMAL_BOUNDARIES,
)
from pylinac_tpu.plan_generator.mlc import (
    interpolate_control_points,
    next_sacrifice_shift,
    split_sacrifice_travel,
)


def make_template_plan(machine: str = "truebeam") -> dcm.Dataset:
    """A minimal RTPLAN template like the clinical ones the reference mutates."""
    ds = dcm.Dataset()
    ds.SOPClassUID = "1.2.840.10008.5.1.4.1.1.481.5"
    ds.SOPInstanceUID = dcm.generate_uid()
    ds.StudyInstanceUID = dcm.generate_uid()
    ds.SeriesInstanceUID = dcm.generate_uid()
    ds.Modality = "RTPLAN"
    ds.PatientName = "QA^Physics"
    ds.PatientID = "QA123"
    ds.RTPlanLabel = "template"
    tol = dcm.Dataset()
    tol.ToleranceTableNumber = 1
    ds.ToleranceTableSequence = [tol]
    beam = dcm.Dataset()
    beam.TreatmentMachineName = "TB01" if machine == "truebeam" else "HAL01"
    if machine == "truebeam":
        mlc = dcm.Dataset()
        mlc.RTBeamLimitingDeviceType = "MLCX"
        mlc.NumberOfLeafJawPairs = 60
        mlc.LeafPositionBoundaries = MLC_MILLENNIUM_BOUNDARIES
        beam.BeamLimitingDeviceSequence = [mlc]
    else:
        mlc1 = dcm.Dataset()
        mlc1.RTBeamLimitingDeviceType = "MLCX1"
        mlc1.NumberOfLeafJawPairs = 28
        mlc1.LeafPositionBoundaries = MLC_DISTAL_BOUNDARIES
        mlc2 = dcm.Dataset()
        mlc2.RTBeamLimitingDeviceType = "MLCX2"
        mlc2.NumberOfLeafJawPairs = 29
        mlc2.LeafPositionBoundaries = MLC_PROXIMAL_BOUNDARIES
        beam.BeamLimitingDeviceSequence = [mlc1, mlc2]
    ds.BeamSequence = [beam]
    return ds


class TestMLCShaper:
    def test_basic_strip(self):
        shaper = MLCShaper(MLC_MILLENNIUM_BOUNDARIES, max_mlc_position=200,
                           max_overtravel_mm=140)
        shaper.add_strip(position_mm=0, strip_width_mm=2,
                         meterset_at_target=1.0)
        cps = shaper.as_control_points()
        assert len(cps) == 2  # start + target
        assert shaper.as_metersets() == [0, 1.0]
        assert len(cps[0]) == 120
        # bank B at -1, bank A at +1
        assert cps[0][0] == -1
        assert cps[0][60] == 1

    def test_meterset_over_1_raises(self):
        shaper = MLCShaper(MLC_MILLENNIUM_BOUNDARIES, 200, 140)
        shaper.add_strip(0, 2, meterset_at_target=0.7)
        with pytest.raises(ValueError, match="exceeds"):
            shaper.add_strip(10, 2, meterset_at_target=0.7)

    def test_sacrifice_requires_transition(self):
        shaper = MLCShaper(MLC_MILLENNIUM_BOUNDARIES, 200, 140,
                           sacrifice_max_move_mm=50)
        shaper.add_strip(0, 2, meterset_at_target=0.1)
        with pytest.raises(ValueError, match="transition"):
            shaper.add_strip(10, 2, meterset_at_target=0.1,
                             sacrificial_distance_mm=20)

    def test_sacrificial_interpolation(self):
        shaper = MLCShaper(MLC_MILLENNIUM_BOUNDARIES, 200, 140,
                           sacrifice_max_move_mm=50)
        shaper.add_strip(0, 2, meterset_at_target=0.1)
        shaper.add_strip(10, 2, meterset_at_target=0,
                         meterset_transition=0.3,
                         sacrificial_distance_mm=120)
        # 120mm at 50mm/cp -> 3 interpolation chunks
        assert len(shaper.as_control_points()) >= 5
        assert shaper.as_metersets()[-1] == pytest.approx(0.4)

    def test_split_travel(self):
        assert split_sacrifice_travel(66, 50) == [50, 16]
        assert split_sacrifice_travel(100, 50) == [50, 50]

    def test_next_sacrifice_shift_oscillates(self):
        shift = next_sacrifice_shift(current_position_mm=-190, travel_mm=30,
                                     x_width_mm=400, other_mlc_position=0,
                                     max_overtravel_mm=140)
        assert shift == 30  # toward the other leaves
        shift = next_sacrifice_shift(current_position_mm=190, travel_mm=30,
                                     x_width_mm=400, other_mlc_position=0,
                                     max_overtravel_mm=140)
        assert shift == -30

    def test_interpolate_validation(self):
        with pytest.raises(ValueError):
            interpolate_control_points([0] * 4, [1] * 4, [], [], 140)
        with pytest.raises(ValueError):
            interpolate_control_points([0] * 4, [1] * 6, [1], [10], 140)


class TestTrueBeamPlanGenerator:
    @pytest.fixture()
    def pg(self):
        return TrueBeamPlanGenerator(make_template_plan(), plan_label="QA",
                                     plan_name="QA Plan")

    def test_not_rtplan_raises(self):
        ds = make_template_plan()
        ds.Modality = "CT"
        with pytest.raises(ValueError, match="RTPLAN"):
            TrueBeamPlanGenerator(ds, plan_label="x", plan_name="y")

    def test_halcyon_template_rejected(self):
        with pytest.raises(ValueError, match="TrueBeam"):
            TrueBeamPlanGenerator(make_template_plan("halcyon"),
                                  plan_label="x", plan_name="y")

    def test_picketfence_beam(self, pg):
        pg.add_picketfence_beam(mu=100)
        ds = pg.as_dicom()
        assert len(ds.BeamSequence) == 1
        beam = ds.BeamSequence[0]
        assert str(beam.BeamName) == "PF"
        # 1 start + 7 pickets x 2 cps
        assert int(beam.NumberOfControlPoints) == 15
        ref = ds.FractionGroupSequence[0].ReferencedBeamSequence[0]
        assert float(ref.BeamMeterset) == pytest.approx(100)

    def test_beam_name_too_long(self, pg):
        with pytest.raises(ValueError, match="16"):
            pg.add_open_field_beam(x1=-10, x2=10, y1=-10, y2=10,
                                   beam_name="a" * 17)

    def test_mlc_transmission(self, pg):
        pg.add_mlc_transmission(bank="A")
        assert "MLC Tx A" == str(pg.as_dicom().BeamSequence[0].BeamName)
        with pytest.raises(ValueError, match="Bank"):
            pg.add_mlc_transmission(bank="C")

    def test_transmission_overtravel(self, pg):
        with pytest.raises(OvertravelError):
            pg.add_mlc_transmission(bank="A", x1=-100, x2=100, overreach=50)

    def test_winston_lutz_beams(self, pg):
        pg.add_winston_lutz_beams(axes_positions=(
            {"gantry": 0, "collimator": 0, "couch": 0},
            {"gantry": 90, "collimator": 15, "couch": 0},
        ))
        names = [str(b.BeamName) for b in pg.as_dicom().BeamSequence]
        assert names == ["G0C0P0", "G90C15P0"]

    def test_dose_rate_beams(self, pg):
        pg.add_dose_rate_beams()
        names = [str(b.BeamName) for b in pg.as_dicom().BeamSequence]
        assert names == ["DR Ref", "DR100-600"]

    def test_mlc_speed_beams(self, pg):
        pg.add_mlc_speed_beams()
        names = [str(b.BeamName) for b in pg.as_dicom().BeamSequence]
        assert names == ["MLC Speed Ref", "MLC Speed"]
        with pytest.raises(ValueError, match="maximum MLC speed"):
            pg.add_mlc_speed_beams(speeds=(50,))

    def test_gantry_speed_beams(self, pg):
        pg.add_gantry_speed_beams()
        beams = pg.as_dicom().BeamSequence
        assert str(beams[0].BeamType) == "DYNAMIC"
        with pytest.raises(ValueError, match="gantry speed"):
            pg.add_gantry_speed_beams(speeds=(10,))

    def test_file_roundtrip(self, pg, tmp_path):
        pg.add_open_field_beam(x1=-50, x2=50, y1=-50, y2=50)
        f = tmp_path / "plan.dcm"
        pg.to_file(str(f))
        ds = dcm.dcmread(str(f))
        assert str(ds.Modality) == "RTPLAN"
        assert len(ds.BeamSequence) == 1
        assert str(ds.BeamSequence[0].BeamName) == "Open"
        assert str(ds.RTPlanLabel) == "QA"


class TestFluenceGeneration:
    def test_open_field_fluence(self):
        pg = TrueBeamPlanGenerator(make_template_plan(), plan_label="QA",
                                   plan_name="QA")
        pg.add_open_field_beam(x1=-50, x2=50, y1=-50, y2=50, mu=100)
        fl = generate_fluences(pg.as_dicom(), width_mm=200, resolution_mm=1,
                               dtype=np.float32)
        assert fl.shape[0] == 1
        # fluence accumulates the meterset WEIGHT (0..1) x1000, like the
        # reference; the center sees the full weight
        center = float(fl[0, fl.shape[1] // 2, fl.shape[2] // 2])
        assert center == pytest.approx(1000, rel=0.01)
        # outside the field: 0
        assert fl[0, fl.shape[1] // 2, 5] == 0

    def test_picketfence_fluence_peaks(self):
        pg = TrueBeamPlanGenerator(make_template_plan(), plan_label="QA",
                                   plan_name="QA")
        pg.add_picketfence_beam(mu=70)
        fl = generate_fluences(pg.as_dicom(), width_mm=200, resolution_mm=1)
        profile = fl[0, fl.shape[1] // 2, :]
        n_peaks = np.sum((profile[1:-1] > 0)
                         & (np.diff(profile[:-1]) >= 0)
                         & (np.diff(profile[1:]) <= 0))
        assert np.count_nonzero(profile) >= 7  # 7 pickets present

    def test_to_dicom_images_closes_loop(self, tmp_path):
        """Plan -> fluence -> simulated EPID image -> PicketFence analysis."""
        from pylinac_tpu.imggen.simulators import AS1200Image
        from pylinac_tpu.picketfence import PicketFence

        pg = TrueBeamPlanGenerator(make_template_plan(), plan_label="QA",
                                   plan_name="QA")
        pg.add_picketfence_beam(mu=100)
        images = pg.to_dicom_images(AS1200Image, invert=True)
        assert len(images) == 1
        path = str(tmp_path / "pf_epid.dcm")
        dcm.dcmwrite(path, images[0])
        pf = PicketFence(path)
        pf.analyze()
        assert pf.num_pickets == 7
        assert pf.max_error < 0.5


class TestHalcyonPlanGenerator:
    @pytest.fixture()
    def pg(self):
        return HalcyonPlanGenerator(make_template_plan("halcyon"),
                                    plan_label="QA", plan_name="QA")

    def test_truebeam_template_rejected(self):
        with pytest.raises(ValueError, match="Halcyon"):
            HalcyonPlanGenerator(make_template_plan("truebeam"),
                                 plan_label="x", plan_name="y")

    def test_dual_stack_picketfence(self, pg):
        pg.add_picketfence_beam(stack=Stack.BOTH)
        beam = pg.as_dicom().BeamSequence[0]
        blds = [str(b.RTBeamLimitingDeviceType)
                for b in beam.BeamLimitingDeviceSequence]
        assert "MLCX1" in blds and "MLCX2" in blds
        fl = generate_fluences(pg.as_dicom(), width_mm=200, resolution_mm=1)
        profile = fl[0, fl.shape[1] // 2, :]
        assert np.count_nonzero(profile) >= 7

    def test_unimplemented(self, pg):
        with pytest.raises(NotImplementedError):
            pg.add_gantry_speed_beams()
        with pytest.raises(NotImplementedError):
            pg.add_winston_lutz_beams()
