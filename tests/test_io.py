"""I/O layer unit tests: FITS roundtrip, MJD precision, par, tim, zap."""

import numpy as np
import pytest

from pulseportraiture_tpu.io import fits as ppfits
from pulseportraiture_tpu.io.mjd import MJD
from pulseportraiture_tpu.io.par import parse_par, period_at
from pulseportraiture_tpu.io.psrfits import (Archive, read_psrfits,
                                             write_psrfits)
from pulseportraiture_tpu.io.tim import TOA, write_TOAs, filter_TOAs, \
    toa_string
from pulseportraiture_tpu.pipelines.zap import get_zap_channels

RNG = np.random.default_rng(5)


def test_fits_roundtrip_types(tmp_path):
    path = str(tmp_path / "t.fits")
    cols = {
        "F4": RNG.normal(size=(3, 8)).astype("f4"),
        "F8": RNG.normal(size=3).astype("f8"),
        "I2": RNG.integers(-1000, 1000, (3, 4)).astype("i2"),
        "I4": RNG.integers(-100000, 100000, 3).astype("i4"),
        "STR": np.asarray(["alpha", "beta", "gamma"], dtype="S8"),
    }
    hdu = ppfits.HDU(columns=cols, header={"MYKEY": 42, "MYFLOAT": 3.25,
                                           "MYSTR": "hello"}, name="TEST")
    primary = ppfits.HDU(header={"SRC_NAME": "J0000+0000",
                                 "STT_OFFS": 0.123456789})
    ppfits.write_fits(path, [primary, hdu])
    hdus = ppfits.read_fits(path)
    assert hdus[0].header["SRC_NAME"] == "J0000+0000"
    assert abs(hdus[0].header["STT_OFFS"] - 0.123456789) < 1e-12
    t = hdus[1]
    assert t.name == "TEST"
    assert t.header["MYKEY"] == 42 and t.header["MYSTR"] == "hello"
    np.testing.assert_allclose(t.columns["F4"], cols["F4"], rtol=1e-7)
    np.testing.assert_allclose(t.columns["F8"], cols["F8"], rtol=1e-15)
    np.testing.assert_array_equal(t.columns["I2"], cols["I2"])
    np.testing.assert_array_equal(t.columns["I4"], cols["I4"])
    assert list(t.columns["STR"]) == [b"alpha", b"beta", b"gamma"]


def test_psrfits_int16_quantization(tmp_path):
    path = str(tmp_path / "q.fits")
    nsub, npol, nchan, nbin = 2, 1, 4, 64
    data = RNG.normal(0, 1, (nsub, npol, nchan, nbin)) * 50 + 10
    arch = Archive(data=data,
                   freqs=np.tile(np.linspace(1e3, 2e3, nchan), (nsub, 1)),
                   weights=np.ones((nsub, nchan)),
                   Ps=np.full(nsub, 0.005),
                   epochs=[MJD(55000.0), MJD(55000.0).add_seconds(60.0)],
                   subtimes=np.full(nsub, 60.0), DM=10.0, nu0=1500.0,
                   bw=1000.0, source="TEST", telescope="GBT")
    write_psrfits(path, arch, dtype="i2")
    back = read_psrfits(path)
    # 16-bit quantization: relative error bounded by range/65534
    scale = (data.max() - data.min()) / 65534.0
    assert np.abs(back.data - data).max() < scale
    np.testing.assert_allclose(back.Ps, arch.Ps, rtol=1e-12)


def test_mjd_precision_and_arithmetic():
    m = MJD(57000, 43200, 0.25)
    assert m.intday() == 57000
    np.testing.assert_allclose(m.fracday(), (43200 + 0.25) / 86400.0,
                               rtol=1e-16)
    m2 = m.add_seconds(86400.0 * 2 + 1.5)
    assert m2.intday() == 57002
    np.testing.assert_allclose(m2 - m, 86400.0 * 2 + 1.5, rtol=1e-15)
    # sub-ns precision preserved across a large epoch
    m3 = MJD(57000, 0, 0.0).add_seconds(1e-9)
    assert (m3 - MJD(57000, 0, 0.0)) == 1e-9
    # negative seconds normalize
    m4 = MJD(57000, 0, 0.0).add_seconds(-1.0)
    assert m4.intday() == 56999 and m4.secs == 86399


def test_mjd_fracstr_midnight_rounding_carry():
    """Epochs within half an ulp of midnight must print as the NEXT day
    (advisor r2: '%d.%015d' overflowed to a 16-digit fraction)."""
    m = MJD(57000, 86399, 1.0 - 1e-13)     # fracday rounds to 1.0 @15dp
    s = m.day_fracstr(15)
    assert s == "57001.000000000000000", s
    days, frac = s.split(".")
    assert len(frac) == 15
    assert str(m) == s
    # an ordinary epoch is unaffected
    assert MJD(57000, 43200, 0.0).day_fracstr(15) == \
        "57000.500000000000000"
    # and the .tim writer uses the carried form
    from pulseportraiture_tpu.io.tim import toa_string
    toa = TOA("f.fits", 1420.0, m, 1.0, "GBT", "1", flags={})
    assert "57001.000000000000000" in toa_string(toa)


def test_parse_par():
    par = parse_par(["PSR  J0437-4715", "F0  173.6879458121843  1  3e-13",
                     "F1  -1.728366D-15", "PEPOCH 50000.0",
                     "DM 2.64476", "C comment line", "# other comment"])
    assert par.PSR == "J0437-4715"
    np.testing.assert_allclose(par.P0, 1 / 173.6879458121843, rtol=1e-15)
    np.testing.assert_allclose(par.F1, -1.728366e-15)
    assert par.DM == 2.64476
    # spin-down: period grows with time
    assert period_at(par, 51000.0) > period_at(par, 50000.0)


def test_toa_string_format_and_filtering():
    toa = TOA("file.fits", 1420.5, MJD(57000, 43200, 0.5), 1.234,
              "GBT", "1", DM=34.5678901, DM_error=0.0012345,
              flags=dict(snr=42.5, gof=1.01, subint=0,
                         phi_DM_cov=-2.3e-8, phs=0.12345678,
                         flux=1.23456, be="fake_be"))
    s = toa_string(toa)
    toks = s.split()
    assert toks[0] == "file.fits"
    assert toks[1] == "1420.50000000"
    assert toks[2].startswith("57000.500")
    assert len(toks[2].split(".")[1]) == 15
    assert "-pp_dm 34.5678901" in s
    assert "-pp_dme 0.0012345" in s
    assert "-snr 42.500" in s            # default %.3f
    assert "-subint 0" in s              # int format
    assert "-phi_DM_cov -2.3e-08" in s   # _cov -> %.1e
    assert "-phs 0.12345678" in s        # phs -> %.8f
    assert "-flux 1.23456" in s          # flux -> %.5f
    assert "-be fake_be" in s            # string
    kept = filter_TOAs([toa], "snr", 50.0, ">=")
    assert kept == []
    kept = filter_TOAs([toa], "snr", 10.0, ">=")
    assert len(kept) == 1
    # unflagged attribute
    kept = filter_TOAs([toa], "nonexistent", 0, ">=", pass_unflagged=True)
    assert len(kept) == 1


def test_infinite_frequency_convention():
    toa = TOA("f.fits", np.inf, MJD(57000, 0, 0.0), 1.0, "GBT", "1",
              flags=dict(snr=10.0))
    s = toa_string(toa, inf_is_zero=True)
    assert s.split()[1] == "0.00000000"


def test_get_zap_channels_clips_outliers():
    noise = np.ones(64)
    noise[[5, 40]] = 10.0   # RFI channels
    noise[10] = 0.0         # already dead
    zap = get_zap_channels(noise, nstd=3.0)
    assert 5 in zap and 40 in zap and 10 not in zap
    assert len(zap) == 2


def test_foreign_psrfits_missing_period_column(tmp_path):
    """Standard PSRFITS has no PERIOD/DOPPLER columns: periods fall
    back to the PSRPARAM F0/F1 spin model; FITS round-trips after
    column edits stay consistent (structural cards are regenerated)."""
    import numpy as np

    from pulseportraiture_tpu.io import fits
    from pulseportraiture_tpu.io.mjd import MJD
    from pulseportraiture_tpu.io.psrfits import read_psrfits
    from pulseportraiture_tpu.models.gmodel_io import write_model
    from pulseportraiture_tpu.sim.fake import make_fake_pulsar

    par = tmp_path / "f.par"
    par.write_text("PSR J2\nRAJ 01:02:03\nDECJ 04:05:06\n"
                   "F0 345.6789012345\nF1 -1.2346D-13\n"
                   "PEPOCH 50000\nDM 10.0\n")
    gm = str(tmp_path / "f.gmodel")
    write_model(gm, "F", "000", 1500.0,
                [0.0, 0.0, 0.3, 0.0, 0.05, 0.0, 3.0, -1.0], [1] * 8,
                -4.0, 0, quiet=True)
    orig = str(tmp_path / "orig.fits")
    make_fake_pulsar(gm, str(par), outfile=orig, nsub=2, npol=1, nchan=8,
                     nbin=64, nu0=1500.0, bw=400.0, tsub=30.0, dDM=0.0,
                     start_MJD=MJD(57202.0), noise_stds=0.1,
                     dedispersed=True, quiet=True,
                     rng=np.random.default_rng(0))
    hdus = fits.read_fits(orig)
    for h in hdus:
        if h.name == "SUBINT":
            h.columns.pop("PERIOD")
            h.columns.pop("DOPPLER")
    foreign = str(tmp_path / "foreign.fits")
    fits.write_fits(foreign, hdus)
    a0 = read_psrfits(orig)
    a1 = read_psrfits(foreign)
    np.testing.assert_allclose(a1.Ps, a0.Ps, rtol=0, atol=1e-11)
    np.testing.assert_allclose(a1.data, a0.data)
    assert a1.doppler_factors is None


def test_psrchive_style_polyco_fixture():
    """The checked-in PSRCHIVE-flavored fixture (POLYCO + HISTORY, no
    PERIOD/DOPPLER columns, no DM/DEDISP header keys) loads with
    polyco-derived periods and HISTORY-derived state."""
    import os

    import numpy as np

    from pulseportraiture_tpu.io.archive import load_data
    from pulseportraiture_tpu.io.psrfits import read_psrfits

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "psrchive_style.fits")
    arch = read_psrfits(fixture)
    assert arch.dedispersed is True          # HISTORY last-row DEDISP
    np.testing.assert_allclose(arch.DM, 12.3456)   # HISTORY CHAN_DM
    # periods come from the POLYCO evaluation, not the PSRPARAM F0
    # fallback: the polyco's apparent F0 is Doppler-shifted by 8.5e-5
    F0_par = 345.6789012345
    mjds = np.array([e.in_days() for e in arch.epochs])
    # independent polyco evaluation (generator values, see
    # scripts/make_psrchive_fixture.py)
    ref_mjds = np.array([57202 - 0.5 + 21600 / 86400.0,
                         57202 + 0.5 + 21600 / 86400.0])
    ref_f0s = F0_par * (1 - 8.5e-5) * np.array([1.0, 1 - 1e-7])
    i = np.argmin(np.abs(ref_mjds[None] - mjds[:, None]), axis=1)
    dt_min = (mjds - ref_mjds[i]) * 1440.0
    f = ref_f0s[i] + (1.2e-6 + 2 * -3.0e-10 * dt_min) / 60.0
    np.testing.assert_allclose(arch.Ps, 1.0 / f, rtol=0, atol=1e-16)
    assert np.all(np.abs(arch.Ps - 1.0 / F0_par) > 1e-7 / F0_par)
    # epochs = start + OFFS_SUB
    np.testing.assert_allclose(
        mjds, 57202 + (21600 + np.array([15.0, 45.0])) / 86400.0,
        rtol=0, atol=1e-12)
    # and the full loader runs end-to-end on it (analytic Doppler path)
    data = load_data(fixture, quiet=True)
    assert data.nchan == 4 and data.nbin == 64
    assert np.all(np.abs(data.doppler_factors - 1.0) > 1e-7)


def test_t2predict_chebymodel():
    """tempo2 ChebyModelSet: a linear-in-time phase model round-trips
    through the parser/evaluator to the exact apparent frequency."""
    import numpy as np

    from pulseportraiture_tpu.io.predictor import (parse_t2predict,
                                                   t2predict_periods)

    t0, t1 = 57000.0, 57002.0
    f_app = 123.456789          # Hz
    B, A = 1000.25, f_app * 86400.0 * (t1 - t0) / 2.0
    # phase = B + A*x with the 1/2 zeroth-order weights:
    # c00*(1/4) = B, c10*(1/2) = A
    lines = [
        "ChebyModelSet 1 segments",
        "ChebyModel begin",
        "PSRNAME J0000+00",
        "SITENAME gbt",
        f"TIME_RANGE {t0} {t1}",
        "FREQ_RANGE 1000 2000",
        "DISPERSION_CONSTANT -7.3e3",
        "NCOEFF_TIME 2",
        "NCOEFF_FREQ 1",
        f"COEFFS {4.0 * B}",
        f"COEFFS {2.0 * A}",
        "ChebyModel end",
    ]
    models = parse_t2predict(lines)
    assert len(models) == 1
    m = models[0]
    # phase at midpoint (x=0): B + dispersion term
    np.testing.assert_allclose(m.phase(57001.0, 1500.0),
                               B - 7.3e3 / 1500.0 ** 2, rtol=1e-12)
    Ps = t2predict_periods(lines, [57000.3, 57001.7], 1500.0)
    np.testing.assert_allclose(Ps, 1.0 / f_app, rtol=1e-12)


def test_doppler_from_ephemeris(tmp_path):
    """load_data on a DOPPLER-less archive computes per-subint Doppler
    factors and parallactic angles from the stored ephemeris + site
    (reference pplib.py:2696-2707), and bary=True then visibly scales
    the output DMs (reference pptoas.py:539-549)."""
    import numpy as np

    from pulseportraiture_tpu.io import fits
    from pulseportraiture_tpu.io.archive import load_data
    from pulseportraiture_tpu.io.ephem import doppler_factor
    from pulseportraiture_tpu.io.mjd import MJD
    from pulseportraiture_tpu.io.parang import (OBSERVATORY_COORDS,
                                                dms_to_deg, hms_to_deg)
    from pulseportraiture_tpu.models.gmodel_io import write_model
    from pulseportraiture_tpu.pipelines.toas import GetTOAs
    from pulseportraiture_tpu.sim.fake import make_fake_pulsar

    par = tmp_path / "d.par"
    # an ecliptic-plane source maximizes the annual Doppler term
    par.write_text("PSR JD\nRAJ 00:00:00\nDECJ 00:00:00\n"
                   "F0 345.6789012345\nF1 -1.2346D-13\n"
                   "PEPOCH 50000\nDM 10.0\n")
    gm = str(tmp_path / "d.gmodel")
    write_model(gm, "D", "000", 1500.0,
                [0.0, 0.0, 0.3, 0.0, 0.05, 0.0, 3.0, -1.0], [1] * 8,
                -4.0, 0, quiet=True)
    orig = str(tmp_path / "orig.fits")
    make_fake_pulsar(gm, str(par), outfile=orig, nsub=2, npol=1, nchan=8,
                     nbin=64, nu0=1500.0, bw=400.0, tsub=30.0, dDM=0.0,
                     start_MJD=MJD(57100.0), noise_stds=0.02,
                     dedispersed=True, quiet=True,
                     rng=np.random.default_rng(7))
    hdus = fits.read_fits(orig)
    for h in hdus:
        if h.name == "SUBINT":
            h.columns.pop("DOPPLER")
    foreign = str(tmp_path / "foreign.fits")
    fits.write_fits(foreign, hdus)

    data = load_data(foreign, quiet=True)
    # independent recomputation from the same inputs
    lat, lon = OBSERVATORY_COORDS["GBT"]
    mjds = np.array([e.in_days() for e in data.epochs])
    expect = doppler_factor(mjds, hms_to_deg("00:00:00"),
                            dms_to_deg("00:00:00"), lat, lon)
    np.testing.assert_allclose(data.doppler_factors, expect, rtol=0,
                               atol=1e-12)
    assert np.all(np.abs(data.doppler_factors - 1.0) > 1e-6)
    assert np.all(np.isfinite(data.parallactic_angles))
    assert np.any(data.parallactic_angles != 0.0)
    # the archive's own DOPPLER column (ones) still overrides
    data0 = load_data(orig, quiet=True)
    np.testing.assert_array_equal(data0.doppler_factors, 1.0)

    # bary=True multiplies DMs by df (and GMs by df^3)
    dms = {}
    for bary in (False, True):
        gt = GetTOAs([foreign], gm, quiet=True)
        gt.get_TOAs(bary=bary, quiet=True)
        dms[bary] = np.array([t.DM for t in gt.TOA_list])
    ratio = dms[True] / dms[False]
    np.testing.assert_allclose(ratio, data.doppler_factors, rtol=1e-9)


def test_parallactic_angle_sanity():
    """GMST/parallactic-angle formulas: transiting source has q ~ 0 for
    a northern site with dec < lat; unknown telescopes give NaN."""
    import math

    from pulseportraiture_tpu.io.parang import (gmst_deg,
                                                parallactic_angle,
                                                hms_to_deg, dms_to_deg)

    assert abs(hms_to_deg("12:00:00") - 180.0) < 1e-12
    assert abs(dms_to_deg("-30:30:00") + 30.5) < 1e-12
    # GMST at J2000.0 epoch (MJD 51544.5) is ~280.46 deg
    assert abs(gmst_deg(51544.5) - 280.46061837) < 1e-6
    # find the transit (hour angle 0) by scanning a day: q crosses 0
    qs = [parallactic_angle("GBT", "05:00:00", "20:00:00",
                            55000.0 + f / 24.0) for f in range(24)]
    assert min(qs) < 0 < max(qs)
    pa = parallactic_angle("NOT_A_SCOPE", "05:00:00", "20:00:00", 55000.0)
    assert pa != pa  # NaN


def test_i2_quantized_archive_roundtrip(tmp_path):
    """16-bit PSRFITS storage: write/read recovers amplitudes at the
    quantization noise level (native codec when built)."""
    import numpy as np

    from pulseportraiture_tpu.io.mjd import MJD
    from pulseportraiture_tpu.io.psrfits import (Archive, read_psrfits,
                                                 write_psrfits)
    rng = np.random.default_rng(2)
    data = rng.normal(0, 1, (2, 1, 8, 64))
    arch = Archive(data=data, freqs=np.tile(np.linspace(1100, 1900, 8),
                                            (2, 1)),
                   weights=np.ones((2, 8)), Ps=np.full(2, 0.005),
                   epochs=[MJD(57000.0), MJD(57000.001)],
                   subtimes=np.full(2, 30.0), DM=10.0, nu0=1500.0,
                   bw=800.0, source="T", telescope="GBT")
    path = str(tmp_path / "q.fits")
    write_psrfits(path, arch, dtype="i2")
    back = read_psrfits(path)
    span = data.max() - data.min()
    assert np.abs(back.data - data).max() < 2e-4 * span


def test_convert_state_roundtrip():
    """Coherence <-> Stokes conversion is exactly invertible."""
    import numpy as np

    from pulseportraiture_tpu.io.mjd import MJD
    from pulseportraiture_tpu.io.psrfits import Archive
    rng = np.random.default_rng(3)
    data = rng.normal(0, 1, (1, 4, 4, 32))
    arch = Archive(data=data.copy(), freqs=np.linspace(1, 2, 4)[None],
                   weights=np.ones((1, 4)), Ps=np.ones(1),
                   epochs=[MJD(57000.0)], subtimes=np.ones(1),
                   state="Coherence")
    arch.convert_state("Stokes")
    # I = AA+BB
    np.testing.assert_allclose(arch.data[:, 0],
                               data[:, 0] + data[:, 1])
    arch.convert_state("Coherence")
    np.testing.assert_allclose(arch.data, data, atol=1e-14)


def test_polyco_span_based_block_selection():
    """TEMPO semantics: the block whose NSPAN validity window contains
    the epoch wins, even when another block's REF_MJD is nearer
    (VERDICT r2 missing #4; io/predictor.py)."""
    from pulseportraiture_tpu.io.predictor import polyco_frequency

    start = 57000.25
    cols = {
        "REF_MJD": np.array([start - 6.0 / 1440.0,
                             start + 72.0 / 1440.0]),
        "REF_F0": np.array([100.0, 200.0]),
        "NSPAN": np.array([10, 288]),
        "NCOEF": np.array([3, 3]),
        "COEFF": np.zeros((2, 3)),
    }
    # epoch 1 min after start: nearest REF is block 0 (6 min) but its
    # span [-11, -1] min does not contain it; block 1's does
    f = polyco_frequency(cols, [start + 1.0 / 1440.0])
    assert f[0] == 200.0
    # an epoch inside block 0's span uses block 0
    f = polyco_frequency(cols, [start - 5.0 / 1440.0])
    assert f[0] == 100.0
    # outside every span: extrapolate from the nearest block
    f = polyco_frequency(cols, [start - 200.0 / 1440.0])
    assert f[0] == 100.0
    # without NSPAN the nearest-block rule applies
    cols2 = {k: v for k, v in cols.items() if k != "NSPAN"}
    f = polyco_frequency(cols2, [start + 1.0 / 1440.0])
    assert f[0] == 100.0


def test_foreign_4pol_coherence_fixture(tmp_path):
    """4-pol Coherence + int16 quantization + descending band +
    irregular multi-block POLYCO, through the full get_TOAs path."""
    import os

    from pulseportraiture_tpu.io.archive import load_data
    from pulseportraiture_tpu.io.psrfits import read_psrfits
    from pulseportraiture_tpu.models.gmodel_io import write_model
    from pulseportraiture_tpu.pipelines.toas import GetTOAs

    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       "psrchive_4pol.fits")
    arch = read_psrfits(fix)
    assert arch.state == "Coherence" and arch.data.shape[1] == 4
    # descending band preserved
    assert np.all(np.diff(arch.freqs[0]) < 0)
    # span-based POLYCO selection: periods come from the containing
    # block (REF_F0 = F0_TOPO), not the nearest-REF_MJD block
    F0_TOPO = 345.6789012345 * (1.0 - 8.5e-5)
    np.testing.assert_allclose(arch.Ps, 1.0 / F0_TOPO, rtol=1e-9)
    # int16 round trip: pscrunched total intensity has the pulse
    d = load_data(fix, dededisperse=True, pscrunch=True,
                  rm_baseline=True, quiet=True)
    assert d.subints.shape == (2, 1, 4, 64)
    # per-channel pulses survive the i2 round trip (the channel-mean is
    # dispersion-smeared: the file re-dispersed at load, DEDISP=1)
    for c in range(4):
        p = d.subints[0, 0, c]
        base = np.sort(p)[:32]
        assert p.max() > 10 * (base.std() + 1e-6), c

    gmodel = str(tmp_path / "p4.gmodel")
    write_model(gmodel, "J0000+00", "000", 1500.0,
                [0.0, 0.0, 0.3, 0.0, 0.04, 0.0, 1.0, 0.0],
                [1] * 8, -4.0, 0, quiet=True)
    gt = GetTOAs([fix], gmodel, quiet=True)
    gt.get_TOAs(quiet=True)
    assert len(gt.TOA_list) == 2
    for t in gt.TOA_list:
        assert np.isfinite(t.TOA_error) and t.TOA_error > 0
        assert np.isfinite(t.DM)


def test_remove_baseline_matches_closed_form():
    """The scratch-buffer in-place baseline equals the direct algorithm.

    Reference behavior: PSRCHIVE-style minimum-window baseline
    (pplib.py:2690 relies on arch.remove_baseline()).  The direct form
    here is the pre-scratch implementation: padded cumsum window means,
    double-smoothed selection, subtract the unsmoothed window mean.
    """
    import numpy as np

    from pulseportraiture_tpu.io.mjd import MJD
    from pulseportraiture_tpu.io.psrfits import Archive

    rng = np.random.default_rng(11)
    for dt in (np.float32, np.float64):
        for shape in [(1, 1, 64, 256), (2, 1, 8, 64), (3, 4, 16, 128)]:
            data = (rng.normal(0, 1, shape) + 3.0).astype(dt)
            nbin = shape[-1]
            wlen = max(1, int(0.15 * nbin))
            d32 = data.astype(np.float32)
            csum = np.cumsum(np.concatenate(
                [d32, d32[..., :wlen]], axis=-1, dtype=np.float32),
                axis=-1)
            wmean = (csum[..., wlen:] - csum[..., :-wlen]) / \
                np.float32(wlen)
            c2 = np.cumsum(np.concatenate(
                [wmean, wmean[..., :wlen]], axis=-1), axis=-1)
            sel = c2[..., wlen:] - c2[..., :-wlen]
            imin = np.argmin(sel, axis=-1)
            base = np.take_along_axis(wmean, imin[..., None], axis=-1)
            expect = data - base
            arch = Archive(
                data=data.copy(),
                freqs=np.linspace(1, 2, shape[2])[None].repeat(shape[0],
                                                               0),
                weights=np.ones((shape[0], shape[2])),
                Ps=np.ones(shape[0]), epochs=[MJD(57000.0)] * shape[0],
                subtimes=np.ones(shape[0]))
            arch.remove_baseline()
            assert arch.data.dtype == dt
            np.testing.assert_array_equal(arch.data, expect.astype(dt))

    # non-contiguous data view (Stokes pscrunch keeps pol 0 as a slice):
    # the scratch path must read through the view and subtract in place
    data = (rng.normal(0, 1, (2, 4, 8, 64)) + 3.0).astype(np.float32)
    arch = Archive(data=data.copy(),
                   freqs=np.linspace(1, 2, 8)[None].repeat(2, 0),
                   weights=np.ones((2, 8)), Ps=np.ones(2),
                   epochs=[MJD(57000.0)] * 2, subtimes=np.ones(2),
                   state="Stokes")
    arch.pscrunch()
    assert not arch.data.flags["C_CONTIGUOUS"]
    ref = Archive(data=np.ascontiguousarray(data[:, :1]),
                  freqs=np.linspace(1, 2, 8)[None].repeat(2, 0),
                  weights=np.ones((2, 8)), Ps=np.ones(2),
                  epochs=[MJD(57000.0)] * 2, subtimes=np.ones(2))
    ref.remove_baseline()
    arch.remove_baseline()
    np.testing.assert_array_equal(arch.data, ref.data)
