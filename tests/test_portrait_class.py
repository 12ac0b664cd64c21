"""DataPortrait + model-building driver tests (ppgauss/ppspline flows)."""

import numpy as np
import pytest

from pulseportraiture_tpu.io.mjd import MJD
from pulseportraiture_tpu.models.gmodel_io import read_model, write_model
from pulseportraiture_tpu.models.spline_io import read_spline_model
from pulseportraiture_tpu.pipelines.toas import GetTOAs
from pulseportraiture_tpu.portrait import DataPortrait
from pulseportraiture_tpu.sim.fake import make_fake_pulsar

PAR_LINES = [
    "PSR             J1234-5678",
    "RAJ      01:02:03.45678901  1",
    "DECJ     -04:05:06.7890123  1",
    "F0      345.67890123456789  1",
    "PEPOCH        50000.000000",
    "DM                34.56789",
]

# no loc evolution: the gaussian-model test freezes the fiducial
# component's position drift (fiducial_gaussian), so a drifting truth
# would be legitimately absorbed as a constant DM bias
MODEL_PARAMS = [0.0, 0.0,
                0.40, 0.0, 0.05, -0.4, 5.0, -1.6]


@pytest.fixture(scope="module")
def avg_archive(tmp_path_factory):
    ws = tmp_path_factory.mktemp("dp")
    par = str(ws / "t.par")
    with open(par, "w") as f:
        f.write("\n".join(PAR_LINES) + "\n")
    gmodel = str(ws / "t.gmodel")
    write_model(gmodel, "TRUE", "000", 1500.0, MODEL_PARAMS,
                [1] * len(MODEL_PARAMS), -4.0, 0, quiet=True)
    path = str(ws / "avg.fits")
    make_fake_pulsar(gmodel, par, outfile=path, nsub=1, npol=1, nchan=32,
                     nbin=256, nu0=1500.0, bw=800.0, tsub=600.0, dDM=0.0,
                     start_MJD=MJD(57000.0), noise_stds=0.05,
                     dedispersed=False, quiet=True,
                     rng=np.random.default_rng(4))
    return ws, path, gmodel, par


def test_dataportrait_attributes(avg_archive):
    ws, path, gmodel, par = avg_archive
    dp = DataPortrait(path, quiet=True)
    assert dp.port.shape == (32, 256)
    assert dp.portx.shape[0] == 32
    assert len(dp.freqsxs[0]) == 32
    assert dp.source == "J1234-5678"
    # normalization roundtrip
    before = dp.port.copy()
    dp.normalize_portrait("mean")
    assert not np.allclose(dp.port, before)
    dp.unnormalize_portrait()
    np.testing.assert_allclose(dp.port, before, rtol=1e-10)


def test_make_gaussian_model_recovers_component(avg_archive):
    ws, path, gmodel, par = avg_archive
    dp = DataPortrait(path, quiet=True)
    out = str(ws / "fit.gmodel")
    res = dp.make_gaussian_model(ref_prof=(1500.0, 200.0), ngauss=1,
                                 niter=2, fiducial_gaussian=True,
                                 outfile=out, model_name="FIT",
                                 quiet=True)
    assert res.red_chi2 < 1.5
    # recovered loc/wid/amp near truth at nu_ref ~ 1500
    p = dp.model_params
    assert abs(p[2] - 0.40) < 5e-3       # loc
    assert abs(p[4] - 0.05) < 5e-3       # wid
    assert abs(p[6] - 5.0) < 0.3         # amp
    # model file written and readable
    name, code, nu_ref, ngauss, rp, rf, alpha, fa = read_model(out)
    assert ngauss == 1 and name == "FIT"
    # the fitted model measures TOAs on the original data without bias
    gt = GetTOAs([path], out, quiet=True)
    gt.get_TOAs(quiet=True)
    assert len(gt.TOA_list) == 1
    assert abs(gt.DeltaDM_means[0]) < 6 * gt.DeltaDM_errs[0] + 1e-5


def test_make_spline_model_and_use(avg_archive):
    ws, path, gmodel, par = avg_archive
    dp = DataPortrait(path, quiet=True)
    dp.normalize_portrait("prof")
    dp.make_spline_model(max_ncomp=3, smooth=True, snr_cutoff=150.0,
                         quiet=True)
    assert dp.model.shape == (32, 256)
    # residuals of model vs data should be noise-like
    resid = dp.portx - dp.modelx
    assert np.abs(resid.mean()) < 0.02
    out = str(ws / "fit.spl")
    dp.write_model(out, quiet=True)
    name, source, datafile, mean_prof, eigvec, tck = \
        read_spline_model(out, quiet=True)
    assert mean_prof.shape == (256,)
    # spline model measures TOAs on the original data
    gt = GetTOAs([path], out, quiet=True)
    gt.get_TOAs(quiet=True)
    assert len(gt.TOA_list) == 1
    assert gt.TOA_list[0].flags["gof"] < 2.0


def test_metafile_joins_gaussian_model(tmp_path):
    """Two-band metafile: join machinery + joined Gaussian fit
    (reference pplib.py:163-305, ppgauss join handling)."""
    import numpy as np

    from pulseportraiture_tpu.io.mjd import MJD
    from pulseportraiture_tpu.models.gmodel_io import write_model
    from pulseportraiture_tpu.portrait import DataPortrait
    from pulseportraiture_tpu.sim.fake import make_fake_pulsar

    par = tmp_path / "j.par"
    par.write_text("PSR J1\nRAJ 01:02:03\nDECJ 04:05:06\n"
                   "F0 200.0\nPEPOCH 57000\nDM 20.0\n")
    gmodel = str(tmp_path / "j.gmodel")
    write_model(gmodel, "J", "000", 1500.0,
                [0.0, 0.0, 0.35, 0.0, 0.04, -0.5, 4.0, -1.5],
                [1] * 8, -4.0, 0, quiet=True)
    rng = np.random.default_rng(12)
    files = []
    for i, nu0 in enumerate([1300.0, 1700.0]):
        f = str(tmp_path / f"band{i}.fits")
        make_fake_pulsar(gmodel, str(par), outfile=f, nsub=1, npol=1,
                         nchan=16, nbin=256, nu0=nu0, bw=400.0, tsub=60.0,
                         dDM=0.0, start_MJD=MJD(57202.0), noise_stds=0.05,
                         dedispersed=True, quiet=True, rng=rng)
        files.append(f)
    meta = tmp_path / "bands.meta"
    meta.write_text("\n".join(files) + "\n")
    dp = DataPortrait(str(meta), quiet=True)
    assert dp.njoin == 2
    assert dp.nchan == 32
    res = dp.make_gaussian_model(ngauss=1, niter=1, quiet=True,
                                 outfile=str(tmp_path / "j-fit.gmodel"))
    assert res.red_chi2 < 2.0
    jf = tmp_path / "bands.join"
    dp.write_join_parameters(str(jf), quiet=True)
    lines = jf.read_text().strip().splitlines()
    assert len(lines) == 2 and "band0" in lines[0]
