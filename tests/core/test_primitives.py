"""Core-primitive coverage: scale conversions, Hill fits, MTF classes,
SNC Profiler parsing (mirrors the reference's tests_basic/core layout)."""

import numpy as np
import pytest

from pylinac_tpu.core.hill import Hill
from pylinac_tpu.core.io import SNCProfiler
from pylinac_tpu.core.mtf import EdgeSpreadFunctionMTF, MomentMTF
from pylinac_tpu.core.scale import MachineScale, convert, wrap180, wrap360


class TestScale:
    def test_wraps(self):
        assert wrap360(365) == 5
        assert wrap360(-10) == 350
        assert wrap180(270) == -90
        assert wrap180(180) == -180

    def test_identity(self):
        out = convert(MachineScale.IEC61217, MachineScale.IEC61217,
                      gantry=45, collimator=90, rotation=270)
        assert out == (45, 90, 270)

    def test_varian_standard_to_iec(self):
        # Varian Standard: value = 180 - IEC (mirrored + shifted).
        # Varian gantry 180 ("up") == IEC 0
        g, c, r = convert(MachineScale.VARIAN_STANDARD, MachineScale.IEC61217,
                          gantry=180, collimator=180, rotation=180)
        assert (g, c, r) == (0, 0, 0)
        # Varian 90 -> IEC 90; Varian 270 -> IEC 270 (both mirror symmetric)
        g, _c, _r = convert(MachineScale.VARIAN_STANDARD, MachineScale.IEC61217,
                            gantry=90, collimator=0, rotation=0)
        assert g == 90

    def test_roundtrip_all_scales(self):
        for scale in MachineScale:
            for angle in (0, 12.5, 90, 181, 359):
                g, c, r = convert(scale, MachineScale.IEC61217,
                                  gantry=angle, collimator=angle, rotation=angle)
                g2, c2, r2 = convert(MachineScale.IEC61217, scale,
                                     gantry=g, collimator=c, rotation=r)
                assert g2 == pytest.approx(wrap360(angle))
                assert r2 == pytest.approx(wrap360(angle))

    def test_elekta_rotation_mirrored(self):
        _g, _c, r = convert(MachineScale.ELEKTA_IEC, MachineScale.IEC61217,
                            gantry=0, collimator=0, rotation=10)
        assert r == 350


class TestHill:
    def test_fit_recovers_sigmoid(self):
        a, b, c, d = 5.0, 100.0, 30.0, 8.0
        x = np.linspace(5, 60, 80)
        y = a + (b - a) / (1 + (c / x) ** d)
        fit = Hill.fit(x, y)
        # inverse and gradient are self-consistent with the fit
        mid = (a + b) / 2
        assert fit.x(mid) == pytest.approx(c, rel=0.02)
        idx = fit.inflection_idx()["index (exact)"]
        assert idx == pytest.approx(c * ((d - 1) / (d + 1)) ** (1 / d), rel=0.05)
        assert fit.gradient_at(c) > 0

    def test_from_params(self):
        h = Hill.from_params([0, 1, 10, 4])
        assert h.x(0.5) == pytest.approx(10, rel=1e-3)


class TestMomentMTF:
    def test_declining_contrast(self):
        # Hander moments MTF: sqrt(2(std^2 - mean))/mean; higher-frequency
        # bars blur -> lower std -> lower MTF (reference core/mtf.py:194)
        lpmms = [0.2, 0.4, 0.8]
        m = MomentMTF(lpmms, means=[1000, 1000, 1000], stds=[500, 300, 100])
        assert m.mtfs[0.2] == pytest.approx(np.sqrt(2 * (500**2 - 1000)) / 1000)
        vals = list(m.mtfs.values())
        assert vals == sorted(vals, reverse=True)
        # fwhms defined for valid count statistics; widest bars, largest fwhm
        assert m.fwhms[0.2] > m.fwhms[0.8] > 0


class TestEdgeSpreadFunctionMTF:
    def _esf(self, sigma: float, n: int = 200) -> np.ndarray:
        from scipy.special import erf

        x = np.arange(n) - n / 2
        return 0.5 * (1 + erf(x / (sigma * np.sqrt(2))))

    def test_sharper_edge_higher_resolution(self):
        sharp = EdgeSpreadFunctionMTF([self._esf(1.0)], sample_spacing=0.5)
        blurry = EdgeSpreadFunctionMTF([self._esf(4.0)], sample_spacing=0.5)
        assert sharp.relative_resolution(50) > blurry.relative_resolution(50)

    def test_padding_none_requires_same_size(self):
        with pytest.raises(ValueError):
            EdgeSpreadFunctionMTF([np.ones(10), np.ones(12)], padding_mode="none")


class TestSNCProfiler:
    N_COLS = 254

    def _write_prs(self, path):
        """Minimal .prs: 109 tab-separated rows with the fields the parser reads."""
        lines = []
        for i in range(109):
            lines.append(f"row{i}\tfiller")
        lines[20] = "Gain\t2.0"
        pad = ["x"] * 5  # columns before the data block
        lines[106] = "\t".join(pad + [f"det{i}" for i in range(self.N_COLS)])
        lines[107] = "\t".join(pad + ["1.0"] * self.N_COLS)  # bias
        lines[108] = "\t".join(pad + ["2.0"] * self.N_COLS)  # calibration
        # data row (last): col2 = timetic; each detector bank holds a
        # field-shaped bump so SingleProfile FWXM finds a peak
        def bank(n):
            x = np.arange(n)
            prof = 3.0 + 100.0 / (1 + np.exp(-(x - n * 0.25))) \
                - 100.0 / (1 + np.exp(-(x - n * 0.75)))
            return [f"{v:.3f}" for v in prof]

        det_vals = bank(63) + bank(65) + bank(63) + bank(63)
        data = ["d", "e", "3.0", "f", "g"] + det_vals
        lines.append("\t".join(data))
        path.write_text("\n".join(lines), encoding="cp437")
        return str(path)

    def test_parse_and_profiles(self, tmp_path):
        prs = self._write_prs(tmp_path / "t.prs")
        p = SNCProfiler(prs)
        assert p.gain == 2.0
        assert p.timetic == 3.0
        # dose = cal * (data - bias*timetic) / gain; edge detectors read 3.0
        # so their dose is 2*(3-3)/2 = 0
        assert p.integrated_dose[0] == pytest.approx(0.0, abs=0.01)
        assert p.integrated_dose.max() == pytest.approx(100.0, abs=1)
        from pylinac_tpu.core.profile import Interpolation

        x, y, pos, neg = p.to_profiles(interpolation=Interpolation.NONE)
        assert len(x.values) == 63
        assert len(y.values) == 65
        assert len(pos.values) == 63
        assert len(neg.values) == 63
