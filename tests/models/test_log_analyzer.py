"""Log analyzer tests on synthesized Dynalog and TrajectoryLog files."""

import struct

import numpy as np
import pytest

from pylinac_tpu.log_analyzer import (
    Dynalog,
    DynalogMatchError,
    MachineLogs,
    MLCBank,
    NotALogError,
    TrajectoryLog,
    TreatmentType,
    is_dlog,
    is_tlog,
    load_log,
)

N_SNAP = 40
CM_TO_DYNALOG = 1000 / 1.96078  # cm at iso -> dynalog counts


def write_dynalog_pair(directory, num_leaf_pairs=60, aperture_cm=5.0,
                       error_cm=0.05):
    """Write a synthetic A/B dynalog pair: a static aperture on pairs 20-40
    with a constant actual-vs-expected offset on bank A."""
    ncols = 14 + num_leaf_pairs * 4
    mu = np.linspace(0, 25000, N_SNAP)

    def make_rows(bank: str):
        rows = []
        for s in range(N_SNAP):
            row = [0.0] * ncols
            row[0] = mu[s]
            row[2] = 0  # beam hold
            row[3] = 1  # beam on
            row[6] = 1800  # gantry 180deg (x10)
            row[7] = 0  # collimator
            row[8] = 100  # y1 10cm (x10)
            row[9] = 100  # y2
            row[10] = 50  # x1 5cm
            row[11] = 50  # x2
            for leaf in range(1, num_leaf_pairs + 1):
                open_leaf = 20 <= leaf <= 40
                pos = aperture_cm * CM_TO_DYNALOG if open_leaf else 0.0
                expected = pos
                actual = pos + (error_cm * CM_TO_DYNALOG
                                if (bank == "A" and open_leaf) else 0.0)
                row[(leaf - 1) * 4 + 14] = expected
                row[(leaf - 1) * 4 + 15] = actual
            rows.append(row)
        return rows

    header = [
        ["B"],
        ["Patient Name", "12345_id"],
        ["plan.dcm"],
        ["2"],
        [str(num_leaf_pairs)],
        ["1"],
    ]
    paths = {}
    for bank in ("A", "B"):
        path = str(directory / f"{bank}12345_patient.dlg")
        with open(path, "w", encoding="utf-8") as f:
            for line in header:
                f.write(",".join(line) + "\n")
            for row in make_rows(bank):
                f.write(",".join(f"{v:.1f}" for v in row) + "\n")
        paths[bank] = path
    return paths


def write_tlog(path, num_leaves=120, version=b"2.1", moving=True):
    """Write a synthetic v2.x trajectory log."""
    num_axes = 14
    samples = [1] * 13 + [num_leaves + 2]
    with open(path, "wb") as f:
        f.write(b"VOSTL".ljust(16, b"\x00"))
        f.write(version.ljust(16, b"\x00"))
        f.write(struct.pack("i", 1024))  # header size
        f.write(struct.pack("i", 20))  # sampling interval
        f.write(struct.pack("i", num_axes))
        f.write(struct.pack(f"{num_axes}i", *range(num_axes)))  # axis enum
        f.write(struct.pack(f"{num_axes}i", *samples))
        f.write(struct.pack("i", 1))  # axis scale
        f.write(struct.pack("i", 1))  # num subbeams
        f.write(struct.pack("i", 0))  # not truncated
        f.write(struct.pack("i", N_SNAP))
        f.write(struct.pack("i", 2))  # mlc model: NDS120
        # reference's v<4 reserved block: pad so data starts at
        # 180 + (1024 - (64 + num_axes*8)) bytes
        f.write(b"\x00" * (1024 - (64 + num_axes * 8)))
        # one subbeam: cp, mu, rad time, seq, 32-char name + 32 pad
        f.write(struct.pack("i", 0))
        f.write(struct.pack("f", 100.0))
        f.write(struct.pack("f", 10.0))
        f.write(struct.pack("i", 1))
        f.write(b"beam1".ljust(32, b"\x00"))
        f.write(b"\x00" * 32)
        # snapshots
        mu = np.linspace(0, 100, N_SNAP)
        cp = np.linspace(0, 10, N_SNAP)
        num_pairs = num_leaves // 2
        for s in range(N_SNAP):
            vals = []
            vals += [0.0, 0.0]  # collimator e/a
            vals += [180.0, 180.0]  # gantry
            vals += [10.0, 10.0, 10.0, 10.0]  # y1, y2
            vals += [5.0, 5.0, 5.0, 5.0]  # x1, x2
            vals += [0.0] * 8  # couch vrt/lng/lat/rtn
            vals += [mu[s], mu[s]]
            vals += [0.0, 0.0]  # beam hold
            vals += [cp[s], cp[s]]
            vals += [0.0] * 4  # carriages
            for leaf in range(1, num_leaves + 1):
                pair = leaf if leaf <= num_pairs else leaf - num_pairs
                open_leaf = 20 <= pair <= 40
                pos = 5.0 if open_leaf else 0.0
                if moving and open_leaf and leaf <= num_pairs:
                    pos += 0.5 * s / N_SNAP  # slow sweep
                vals += [pos, pos + 0.01]
            f.write(struct.pack(f"{len(vals)}f", *vals))
    return str(path)


class TestDynalog:
    @pytest.fixture(scope="class")
    def dlog(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("dlog")
        paths = write_dynalog_pair(d)
        return Dynalog(paths["A"])

    def test_loads_and_header(self, dlog):
        assert dlog.header.num_mlc_leaves == 120
        assert dlog.axis_data.num_snapshots == N_SNAP

    def test_identifies_b_file(self, dlog):
        assert "B12345" in dlog.b_logfile

    def test_missing_b_file_raises(self, tmp_path):
        paths = write_dynalog_pair(tmp_path)
        import os

        os.remove(paths["B"])
        with pytest.raises(DynalogMatchError):
            Dynalog(paths["A"])

    def test_rms(self, dlog):
        # bank A open leaves carry a constant 0.05cm error; RMS in cm
        rms_a = dlog.axis_data.mlc.get_RMS_max(MLCBank.A)
        assert rms_a == pytest.approx(0.05, abs=0.005)
        rms_b = dlog.axis_data.mlc.get_RMS_max(MLCBank.B)
        assert rms_b == pytest.approx(0, abs=1e-6)

    def test_fluence_geometry(self, dlog):
        fl = dlog.fluence.actual.calc_map(resolution=0.1)
        # open pairs 20..40, jaw-clamped aperture = [-5, 5]cm = 1000 bins
        assert fl.shape == (60, 4000)
        open_row = fl[25]
        assert np.isclose(open_row.max(), 1.0, atol=0.01)  # normalized MU
        assert np.sum(open_row > 0.5) == pytest.approx(1000, abs=4)
        assert fl[5].max() == 0  # leaf pair under y jaw

    def test_gamma_near_perfect(self, dlog):
        dlog.fluence.gamma.calc_map()
        # 0.5mm MLC error over a 100mm field: nearly all pixels pass
        assert dlog.fluence.gamma.pass_prcnt > 95
        assert dlog.fluence.gamma.avg_gamma < 0.3

    def test_treatment_type(self, dlog):
        assert dlog.treatment_type == TreatmentType.DYNAMIC_IMRT.value

    def test_num_beamholds(self, dlog):
        assert dlog.num_beamholds == 0

    def test_report(self, dlog):
        s = dlog.report_basic_parameters(printout=False)
        assert "Average RMS" in s and "Gamma pass" in s

    def test_pdf(self, dlog, tmp_path):
        f = tmp_path / "dlog.pdf"
        dlog.publish_pdf(str(f))
        assert f.read_bytes().startswith(b"%PDF")

    def test_anonymize(self, tmp_path):
        paths = write_dynalog_pair(tmp_path)
        dlog = Dynalog(paths["A"])
        files = dlog.anonymize(inplace=False, suffix="1")
        assert len(files) == 2
        assert all("Anonymous" in f for f in files)
        with open(files[0], encoding="utf-8") as f:
            lines = f.readlines()
        assert "Anonymous" in lines[1]


class TestTrajectoryLog:
    @pytest.fixture(scope="class")
    def tlog(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("tlog")
        path = write_tlog(d / "Pat123_log.bin")
        return TrajectoryLog(path)

    def test_header(self, tlog):
        assert tlog.header.header == "VOSTL"
        assert tlog.header.version == 2.1
        assert tlog.header.num_mlc_leaves == 120
        assert tlog.header.num_snapshots == N_SNAP
        assert not tlog.is_hdmlc

    def test_subbeam(self, tlog):
        assert len(tlog.subbeams) == 1
        assert tlog.subbeams[0].beam_name == "beam1"
        assert tlog.subbeams[0].mu_delivered == pytest.approx(100.0)

    def test_axes(self, tlog):
        assert tlog.axis_data.gantry.actual[0] == pytest.approx(180.0)
        assert tlog.axis_data.jaws.x1.actual[0] == pytest.approx(5.0)
        assert tlog.axis_data.mu.actual[-1] == pytest.approx(100.0)

    def test_treatment_type(self, tlog):
        assert tlog.treatment_type == TreatmentType.DYNAMIC_IMRT.value

    def test_rms(self, tlog):
        # constant 0.01cm actual-vs-expected offset on every leaf
        assert tlog.axis_data.mlc.get_RMS_avg() == pytest.approx(0.01, abs=0.001)

    def test_fluence(self, tlog):
        fl = tlog.fluence.actual.calc_map(resolution=0.1)
        assert fl.shape == (60, 4000)
        assert fl[25].max() > 50  # MU accumulated in the aperture

    def test_fluence_equal_aspect(self, tlog):
        fl = tlog.fluence.actual.calc_map(resolution=0.5, equal_aspect=True)
        assert fl.shape == (800, 800)

    def test_gamma(self, tlog):
        tlog.fluence.gamma.calc_map()
        assert tlog.fluence.gamma.pass_prcnt > 90

    def test_csv_roundtrip(self, tlog, tmp_path):
        out = tlog.to_csv(str(tmp_path / "log.csv"))
        text = open(out, encoding="utf-8").read()
        assert "Gantry" in text and "Leaf 120" in text

    def test_pdf(self, tlog, tmp_path):
        f = tmp_path / "tlog.pdf"
        tlog.publish_pdf(str(f))
        assert f.read_bytes().startswith(b"%PDF")


class TestLoaders:
    def test_load_log_dispatch(self, tmp_path):
        paths = write_dynalog_pair(tmp_path)
        log = load_log(paths["A"])
        assert isinstance(log, Dynalog)
        tpath = write_tlog(tmp_path / "T1_log.bin")
        log = load_log(tpath)
        assert isinstance(log, TrajectoryLog)

    def test_is_log_fns(self, tmp_path):
        paths = write_dynalog_pair(tmp_path)
        tpath = write_tlog(tmp_path / "T2_log.bin")
        assert is_dlog(paths["A"]) and not is_tlog(paths["A"])
        assert is_tlog(tpath)

    def test_not_a_log(self, tmp_path):
        f = tmp_path / "junk.txt"
        f.write_text("not a log")
        with pytest.raises(NotALogError):
            load_log(str(f))

    def test_machine_logs_folder(self, tmp_path):
        write_dynalog_pair(tmp_path)
        write_tlog(tmp_path / "T3_log.bin")
        logs = MachineLogs(str(tmp_path))
        assert logs.num_logs == 2
        assert logs.num_tlogs == 1
        assert logs.num_dlogs == 1
        assert logs.avg_gamma_pct() > 90
