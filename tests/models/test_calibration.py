"""TG-51 / TRS-398 calibration tests.

Expected values are the published protocol numbers (same known-value suite
the reference exercises in ``tests_basic/test_tg51.py`` / ``test_trs398.py``).
"""

import warnings

import pytest

from pylinac_tpu.calibration import tg51, trs398


class TestTG51Functions:
    @pytest.mark.parametrize("temp,press,exp", [
        (22, 101.33, 1.0), (25, 102.66, 0.997), (19, 98.66, 1.0165)])
    def test_p_tp(self, temp, press, exp):
        assert tg51.p_tp(temp=temp, press=press) == pytest.approx(exp, abs=0.001)

    def test_p_tp_bounds(self):
        with pytest.raises(ValueError):
            tg51.p_tp(temp=80, press=101.33)  # Fahrenheit mistake
        with pytest.raises(ValueError):
            tg51.p_tp(temp=22, press=760)  # mmHg mistake

    @pytest.mark.parametrize("m_ref,m_opp,exp", [
        (20, -20, 1.0), (-20.2, 19.8, 0.99), (19.8, -20.1, 1.0075)])
    def test_p_pol(self, m_ref, m_opp, exp):
        assert tg51.p_pol(m_reference=m_ref, m_opposite=m_opp) == pytest.approx(
            exp, abs=0.001)

    @pytest.mark.parametrize("m_low,m_high,exp", [(20, 20, 1.0), (20.05, 20.1, 1.0025)])
    def test_p_ion(self, m_low, m_high, exp):
        assert tg51.p_ion(voltage_reference=300, voltage_reduced=150,
                          m_reference=m_high, m_reduced=m_low) == pytest.approx(
            exp, abs=0.001)

    @pytest.mark.parametrize("i50,exp", [(3, 1.72), (5, 2.96), (7, 4.19)])
    def test_d_ref(self, i50, exp):
        assert tg51.d_ref(i_50=i50) == pytest.approx(exp, abs=0.01)

    @pytest.mark.parametrize("i50,exp", [(3.5, 3.54), (5.5, 5.60), (12, 18.71)])
    def test_r_50(self, i50, exp):
        assert tg51.r_50(i_50=i50) == pytest.approx(exp, abs=0.01)

    @pytest.mark.parametrize("pdd,exp", [
        (0.38 / 0.663, 0.6662), (0.385 / 0.667, 0.6713), (0.527 / 0.793, 0.7819)])
    def test_tpr_from_pdd(self, pdd, exp):
        assert tg51.tpr2010_from_pdd2010(pdd2010=pdd) == pytest.approx(exp, abs=0.01)

    def test_m_corrected(self):
        res = tg51.m_corrected(p_ion=1.01, p_tp=0.995, p_elec=1, p_pol=1.005,
                               m_reference=(20, 20.05))
        assert res == pytest.approx(20.225, abs=0.002)

    @pytest.mark.parametrize("pdd,energy,exp,foil", [
        (66.4, 6, 66.4, None),
        (70.5, 10, 70.5, "30cm"),
        (72.8, 10, 72.8, "50cm"),
        (73.3, 10, 73.3, None),
        (76.7, 15, 77.18, None),
        (77.1, 15, 77.57, "50cm"),
        (77.1, 15, 78.27, "30cm"),
        (79.3, 18, 80.47, None)])
    def test_pddx(self, pdd, energy, exp, foil):
        assert tg51.pddx(pdd=pdd, energy=energy, lead_foil=foil) == pytest.approx(
            exp, abs=0.01)

    @pytest.mark.parametrize("chamber,pddx,exp", [
        ("30010", 66.4, 0.9927), ("A12", 76.7, 0.976)])
    def test_kq_photon_pddx(self, chamber, pddx, exp):
        assert tg51.kq_photon_pddx(chamber=chamber, pddx=pddx) == pytest.approx(
            exp, abs=0.001)

    def test_kq_photon_tpr(self):
        assert tg51.kq_photon_tpr(chamber="30010", tpr=0.666) == pytest.approx(
            0.9927, abs=0.001)

    @pytest.mark.parametrize("chamber,r50,exp", [
        ("30010", 3, 0.926), ("A12", 5, 0.915)])
    def test_kq_electron(self, chamber, r50, exp):
        assert tg51.kq_electron(chamber=chamber, r_50=r50) == pytest.approx(
            exp, abs=0.001)

    def test_conversions(self):
        assert tg51.mmHg2kPa(760) == pytest.approx(101.33, abs=0.01)
        assert tg51.mbar2kPa(1013) == pytest.approx(101.3, abs=0.01)
        assert tg51.fahrenheit2celsius(71.6) == pytest.approx(22.0, abs=0.01)


class TestTG51Photon:
    def _build(self, **over):
        kwargs = dict(
            unit="TB1", chamber="30013", temp=22, press=101.33, n_dw=5.555,
            p_elec=1.0, measured_pdd10=66.0, clinical_pdd10=66.0, energy=6,
            voltage_reference=-300, voltage_reduced=-150,
            m_reference=(25.65,), m_opposite=(-25.66,), m_reduced=(25.64,),
            mu=200, tissue_correction=1.0)
        kwargs.update(over)
        return tg51.TG51Photon(**kwargs)

    def test_workflow_runs(self):
        t = self._build()
        assert 0.95 < t.kq < 1.01
        assert t.p_tp == pytest.approx(1.0, abs=1e-6)
        assert t.dose_mu_dmax == pytest.approx(t.dose_mu_10 / 0.66, rel=1e-9)
        # manual recomputation of the dose equation
        exp = t.tissue_correction * t.m_corrected * t.kq * 5.555 / 200
        assert t.dose_mu_10 == pytest.approx(exp, rel=1e-12)

    def test_adjusted(self):
        t = self._build(m_reference_adjusted=(25.70,))
        assert t.output_was_adjusted
        assert t.dose_mu_10_adjusted > t.dose_mu_10

    def test_pdf(self, tmp_path):
        f = tmp_path / "tg51.pdf"
        self._build().publish_pdf(str(f))
        assert f.read_bytes().startswith(b"%PDF")


class TestTG51Electron:
    def test_legacy(self):
        t = tg51.TG51ElectronLegacy(
            chamber="30013", temp=22, press=101.33, n_dw=5.555, p_elec=1.0,
            k_ecal=0.906, i_50=7.5, clinical_pdd=100.0,
            voltage_reference=-300, voltage_reduced=-150,
            m_reference=(25.65,), m_opposite=(-25.66,), m_reduced=(25.61,),
            m_gradient=(25.64,), mu=200, tissue_correction=1.0)
        assert t.r_50 == pytest.approx(1.029 * 7.5 - 0.06, abs=0.001)
        assert t.dref == pytest.approx(0.6 * t.r_50 - 0.1, abs=0.001)
        assert 0.85 < t.kq < 1.0
        assert t.dose_mu_dref > 0

    def test_modern(self):
        t = tg51.TG51ElectronModern(
            chamber="30013", temp=22, press=101.33, n_dw=5.555, p_elec=1.0,
            i_50=7.5, clinical_pdd=100.0,
            voltage_reference=-300, voltage_reduced=-150,
            m_reference=(25.65,), m_opposite=(-25.66,), m_reduced=(25.61,),
            mu=200, tissue_correction=1.0)
        assert 0.85 < t.kq < 1.0
        assert t.dose_mu_dref > 0


class TestTRS398Functions:
    @pytest.mark.parametrize("m_low,m_high,exp", [(20, 20, 1.0), (20.05, 20.1, 1.0025)])
    def test_k_s(self, m_low, m_high, exp):
        assert trs398.k_s(voltage_reference=300, voltage_reduced=150,
                          m_reference=m_high, m_reduced=m_low) == pytest.approx(
            exp, abs=0.001)

    def test_k_s_invalid_ratio(self):
        with pytest.raises(ValueError):
            trs398.k_s(voltage_reference=300, voltage_reduced=110,
                       m_reference=20.1, m_reduced=20)

    def test_m_corrected(self):
        res = trs398.m_corrected(k_s=1.01, k_tp=0.995, k_elec=1, k_pol=1.005,
                                 m_reference=(20, 20.05))
        assert res == pytest.approx(20.225, abs=0.002)

    @pytest.mark.parametrize("chamber,tpr,exp", [
        ("30010", 0.65, 0.994), ("A12", 0.75, 0.983)])
    def test_kq_photon(self, chamber, tpr, exp):
        assert trs398.kq_photon(chamber=chamber, tpr=tpr) == pytest.approx(
            exp, abs=0.001)

    @pytest.mark.parametrize("chamber,r50,exp", [
        ("30013", 4.5, 0.909), ("2571", 8.2, 0.905)])
    def test_kq_electron(self, chamber, r50, exp):
        assert trs398.kq_electron(chamber=chamber, r_50=r50) == pytest.approx(
            exp, abs=0.001)

    @pytest.mark.parametrize("temp,press,ref_temp,exp", [
        (15, 101.3, 20, 0.983),
        (18, 101.3, 20, 0.993),
        (22, 101.3, 20, 1.007),
        (26, 101.3, 20, 1.020),
        (20, 110, 20, 0.921),
        (22, 101.3, 22, 1.000)])
    def test_k_tp(self, temp, press, ref_temp, exp):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            assert trs398.k_tp(temp=temp, press=press,
                               ref_temp=ref_temp) == pytest.approx(exp, abs=0.001)

    def test_k_tp_warns(self):
        with pytest.warns(UserWarning):
            trs398.k_tp(temp=22, press=101.33)


class TestTRS398Workflows:
    def _photon(self, **over):
        kwargs = dict(
            setup="SSD", chamber="30013", temp=22, press=101.33, n_dw=5.555,
            k_elec=1.0, tpr2010=0.666, clinical_pdd_zref=66.0,
            voltage_reference=-300, voltage_reduced=-150,
            m_reference=(25.65,), m_opposite=(-25.66,), m_reduced=(25.64,),
            mu=200, tissue_correction=1.0)
        kwargs.update(over)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return trs398.TRS398Photon(**kwargs)

    def test_photon_ssd(self):
        t = self._photon()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            assert 0.95 < t.kq < 1.01
            exp = t.tissue_correction * t.m_corrected * 5.555 * t.kq / 200
            assert t.dose_mu_zref == pytest.approx(exp, rel=1e-12)
            assert t.dose_mu_zmax == pytest.approx(100 * t.dose_mu_zref / 66.0,
                                                   rel=1e-12)

    def test_photon_sad_uses_tmr(self):
        t = self._photon(setup="SAD", clinical_pdd_zref=None,
                         clinical_tmr_zref=0.79)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            assert t.dose_mu_zmax == pytest.approx(t.dose_mu_zref / 0.79,
                                                   rel=1e-12)

    def test_photon_bad_setup(self):
        with pytest.raises(ValueError):
            self._photon(setup="nonsense")

    def test_electron(self):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            t = trs398.TRS398Electron(
                chamber="30013", temp=22, press=101.33, n_dw=5.555, k_elec=1.0,
                i_50=7.5, clinical_pdd_zref=100.0,
                voltage_reference=-300, voltage_reduced=-150,
                m_reference=(25.65,), m_opposite=(-25.66,), m_reduced=(25.61,),
                mu=200, tissue_correction=1.0)
            assert t.r_50 == pytest.approx(1.029 * 7.5 - 0.06, abs=0.001)
            assert t.zref == pytest.approx(0.6 * t.r_50 - 0.1, abs=0.001)
            assert 0.85 < t.kq < 1.0
            assert t.dose_mu_zmax == pytest.approx(t.dose_mu_zref, rel=1e-9)

    def test_photon_pdf(self, tmp_path):
        f = tmp_path / "trs398.pdf"
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            self._photon().publish_pdf(str(f))
        assert f.read_bytes().startswith(b"%PDF")
