"""Smoke tests for the five CLI tools on tiny synthetic archives."""

import numpy as np
import pytest

from pulseportraiture_tpu.io.mjd import MJD
from pulseportraiture_tpu.models.gmodel_io import write_model
from pulseportraiture_tpu.sim.fake import make_fake_pulsar

PAR_LINES = [
    "PSR            J0000+00",
    "RAJ       00:01:02.345",
    "DECJ     -04:05:06.789",
    "F0      345.6789012345",
    "F1       -1.2346D-13  1",
    "PEPOCH        50000.0",
    "DM                34.6",
]

MODEL_PARAMS = [0.0, 0.0,
                0.2193, -0.0052, 0.0482, -2.08, 5.13, -1.66]


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    par = str(d / "t.par")
    with open(par, "w") as f:
        f.write("\n".join(PAR_LINES) + "\n")
    gmodel = str(d / "t.gmodel")
    write_model(gmodel, "T", "000", 1500.0, MODEL_PARAMS,
                [1] * len(MODEL_PARAMS), -4.0, 0, quiet=True)
    rng = np.random.default_rng(11)
    fits = str(d / "t.fits")
    make_fake_pulsar(gmodel, par, outfile=fits, nsub=2, npol=1,
                     nchan=16, nbin=128, nu0=1500.0, bw=800.0,
                     tsub=60.0, phase=0.0, dDM=2e-4,
                     start_MJD=MJD(57202.0), noise_stds=0.2,
                     dedispersed=False, quiet=True, rng=rng)
    return d, par, gmodel, fits


def test_cli_pptoas(ws, capsys):
    d, par, gmodel, fits = ws
    from pulseportraiture_tpu.cli.pptoas import main
    tim = str(d / "out.tim")
    assert main(["-d", fits, "-m", gmodel, "-o", tim, "--quiet"]) == 0
    lines = open(tim).read().strip().splitlines()
    assert len(lines) == 2  # nsub TOAs
    assert "-pp_dm" in lines[0]


def test_cli_pptoas_narrowband(ws):
    d, par, gmodel, fits = ws
    from pulseportraiture_tpu.cli.pptoas import main
    tim = str(d / "nb.tim")
    assert main(["-d", fits, "-m", gmodel, "-o", tim, "--narrowband",
                 "--quiet"]) == 0
    lines = open(tim).read().strip().splitlines()
    assert len(lines) == 2 * 16  # nsub x nchan TOAs
    assert "-chan" in lines[0] and "-pp_dm" not in lines[0]


def test_cli_pptoas_princeton(ws):
    d, par, gmodel, fits = ws
    from pulseportraiture_tpu.cli.pptoas import main
    out = str(d / "out.princeton")
    assert main(["-d", fits, "-m", gmodel, "-o", out, "--princeton",
                 "--quiet"]) == 0
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 2


def test_cli_ppgauss(ws):
    d, par, gmodel, fits = ws
    from pulseportraiture_tpu.cli.ppgauss import main
    out = str(d / "fit.gmodel")
    assert main(["-d", fits, "-o", out, "--ngauss", "1",
                 "--quiet"]) == 0
    text = open(out).read()
    assert "COMP" in text and "FREQ" in text


def test_cli_ppspline(ws):
    d, par, gmodel, fits = ws
    from pulseportraiture_tpu.cli.ppspline import main
    out = str(d / "fit.spl")
    assert main(["-d", fits, "-o", out, "--quiet"]) == 0
    from pulseportraiture_tpu.models.spline_io import read_spline_model
    read_spline_model(out)


def test_cli_ppalign(ws):
    d, par, gmodel, fits = ws
    from pulseportraiture_tpu.cli.ppalign import main
    out = str(d / "avg.fits")
    assert main(["-d", fits, "-o", out, "-T", "--quiet"]) == 0
    from pulseportraiture_tpu.io.archive import load_data
    data = load_data(out, quiet=True)
    assert data.nchan == 16


def test_cli_ppalign_gaussian_init(ws):
    """-g seeds alignment with a constant fixed-FWHM Gaussian template
    (reference ppalign.py:352-361)."""
    d, par, gmodel, fits = ws
    from pulseportraiture_tpu.cli.ppalign import main
    out = str(d / "avg_g.fits")
    assert main(["-d", fits, "-o", out, "-T", "-g", "0.05",
                 "--quiet"]) == 0
    from pulseportraiture_tpu.io.archive import load_data
    data = load_data(out, quiet=True)
    assert data.nchan == 16
    # the aligned average must carry real structure, not the flat seed
    prof = data.subints[0, 0].mean(0)
    assert prof.max() > 5 * prof.std()


def test_cli_ppzap(ws):
    d, par, gmodel, fits = ws
    from pulseportraiture_tpu.cli.ppzap import main
    out = str(d / "zapped.fits")
    assert main(["-d", fits, "-o", out, "--quiet"]) == 0
    from pulseportraiture_tpu.io.archive import load_data
    load_data(out, quiet=True)


def test_get_psrchive_toas_and_filter(ws):
    """Native ArrivalTime equivalent + TOA flag filtering."""
    d, par, gmodel, fits = ws
    import pytest as _pytest

    from pulseportraiture_tpu.io.tim import filter_TOAs
    from pulseportraiture_tpu.pipelines.toas import GetTOAs
    gt = GetTOAs([fits], gmodel, quiet=True)
    toas = gt.get_psrchive_TOAs(algorithm="PGS", quiet=True)
    # matches the reference contract: results in self.psrchive_toas
    # (pat-style lines), returned as TOA objects; TOA_list untouched
    assert len(toas) == 2 * 16
    assert len(gt.psrchive_toas) == 1
    assert len(gt.psrchive_toas[0]) == 2 * 16
    high = filter_TOAs(toas, "snr", 50.0, ">=")
    assert 0 < len(high) <= len(toas)
    with _pytest.raises(ValueError):
        gt.get_psrchive_TOAs(algorithm="RVM")
