"""Model-builder tests: Gaussian portraits, LM fits, wavelets, splines."""

import os

import jax.numpy as jnp
import numpy as np
import scipy.interpolate as si
import scipy.signal as ss
import pytest

from pulseportraiture_tpu.models import (
    gen_gaussian_profile, gen_gaussian_portrait, evolve_parameter,
    fit_gaussian_profile, fit_gaussian_portrait, read_model, write_model,
    pca, reconstruct_portrait, gen_spline_portrait, splev,
    fit_parametric_spline, swt, iswt, wavelet_smooth, smart_smooth,
)
from pulseportraiture_tpu.models.wavelet import daubechies_dec_lo
from pulseportraiture_tpu.models.spline import _fourier_resample
from pulseportraiture_tpu.ops import gaussian_profile

RNG = np.random.default_rng(99)


# ---------------------------------------------------------------- wavelets

def test_daubechies_filters_are_orthonormal():
    for N in (2, 4, 8):
        h = np.asarray(daubechies_dec_lo(N))
        assert len(h) == 2 * N
        np.testing.assert_allclose(h.sum(), np.sqrt(2), rtol=1e-12)
        np.testing.assert_allclose((h ** 2).sum(), 1.0, rtol=1e-10)
        # double-shift orthogonality
        for shift in range(1, N):
            np.testing.assert_allclose(
                (h[2 * shift:] * h[:len(h) - 2 * shift]).sum(), 0.0,
                atol=1e-10)


def test_db8_matches_known_leading_coefficients():
    # first/last coefficients of db8 (Daubechies 1992, table 6.1 scaled)
    h = np.asarray(daubechies_dec_lo(8))
    np.testing.assert_allclose(abs(h[0]), 0.05441584224308161, rtol=1e-6)
    np.testing.assert_allclose(abs(h[-1]), 0.00011747678400228192,
                               rtol=1e-4)


def test_swt_iswt_perfect_reconstruction():
    x = jnp.asarray(RNG.normal(size=256))
    for level in (1, 3, 5):
        A, D = swt(x, "db8", level)
        rec = iswt(A, D, "db8")
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                                   atol=1e-10)


def test_wavelet_smooth_denoises():
    nbin = 512
    clean = np.asarray(gaussian_profile(nbin, 0.5, 0.05))
    noisy = clean + RNG.normal(0, 0.05, nbin)
    sm = np.asarray(wavelet_smooth(jnp.asarray(noisy), nlevel=5, fact=1.0))
    assert np.mean((sm - clean) ** 2) < 0.25 * np.mean((noisy - clean) ** 2)


def test_smart_smooth_keeps_signal_zeroes_noise():
    nbin = 256
    clean = np.asarray(gaussian_profile(nbin, 0.5, 0.08)) * 5
    noisy = clean + RNG.normal(0, 0.05, nbin)
    sm = np.asarray(smart_smooth(noisy))
    assert np.mean((sm - clean) ** 2) < np.mean((noisy - clean) ** 2)


# ---------------------------------------------------------------- gaussians

def test_gen_gaussian_profile_matches_composition():
    params = [0.01, 0.0, 0.3, 0.05, 2.0, 0.5, 0.02, 1.0]
    prof = np.asarray(gen_gaussian_profile(jnp.asarray(params), 256))
    expected = 0.01 + 2.0 * np.asarray(gaussian_profile(256, 0.3, 0.05)) + \
        1.0 * np.asarray(gaussian_profile(256, 0.5, 0.02))
    np.testing.assert_allclose(prof, expected, atol=1e-12)


def test_gen_gaussian_portrait_evolution():
    freqs = np.linspace(1100.0, 1900.0, 8)
    phases = (np.arange(128) + 0.5) / 128
    # one component, power-law evolution
    params = jnp.asarray([0.0, 0.0, 0.3, -0.1, 0.05, -0.5, 2.0, -1.5])
    port = np.asarray(gen_gaussian_portrait("000", params, -4.0, phases,
                                            freqs, 1500.0))
    for i, f in enumerate(freqs):
        loc = 0.3 * (f / 1500.0) ** -0.1
        wid = 0.05 * (f / 1500.0) ** -0.5
        amp = 2.0 * (f / 1500.0) ** -1.5
        expected = amp * np.asarray(gaussian_profile(128, loc, wid))
        np.testing.assert_allclose(port[i], expected, atol=1e-10)


def test_gen_gaussian_portrait_linear_code():
    freqs = np.linspace(1300.0, 1700.0, 4)
    phases = (np.arange(64) + 0.5) / 64
    params = jnp.asarray([0.0, 0.0, 0.3, 1e-5, 0.05, 0.0, 2.0, 0.0])
    port = np.asarray(gen_gaussian_portrait("111", params, -4.0, phases,
                                            freqs, 1500.0))
    for i, f in enumerate(freqs):
        loc = 0.3 + 1e-5 * (f - 1500.0)
        expected = 2.0 * np.asarray(gaussian_profile(64, loc, 0.05))
        np.testing.assert_allclose(port[i], expected, atol=1e-10)


def test_fit_gaussian_profile_recovers_params():
    nbin = 256
    true = [0.02, 0.0, 0.4, 0.05, 3.0]
    prof = np.asarray(gen_gaussian_profile(jnp.asarray(true), nbin))
    noisy = prof + RNG.normal(0, 0.01, nbin)
    init = [0.0, 0.0, 0.38, 0.06, 2.5]
    res = fit_gaussian_profile(jnp.asarray(noisy), init, 0.01)
    fitted = res.fitted_params
    assert abs(fitted[2] - 0.4) < 1e-3
    assert abs(fitted[3] - 0.05) < 2e-3
    assert abs(fitted[4] - 3.0) < 0.05
    assert res.red_chi2 < 1.3


def test_fit_gaussian_portrait_recovers_evolution():
    freqs = np.linspace(1100.0, 1900.0, 16)
    nbin = 128
    phases = (np.arange(nbin) + 0.5) / nbin
    true = jnp.asarray([0.0, 0.0, 0.4, 0.0, 0.05, -0.3, 2.0, -1.5])
    port = np.asarray(gen_gaussian_portrait("000", true, -4.0, phases,
                                            freqs, 1500.0))
    noisy = port + RNG.normal(0, 0.01, port.shape)
    init = jnp.asarray([0.0, 0.0, 0.41, 0.0, 0.045, -0.2, 1.8, -1.2])
    fit_flags = [1, 0, 1, 0, 1, 1, 1, 1]  # dc fit, tau fixed, loc-evol fixed
    res = fit_gaussian_portrait("000", jnp.asarray(noisy), init, -4.0,
                                np.full(16, 0.01), fit_flags, False, phases,
                                freqs, 1500.0)
    f = res.fitted_params
    assert abs(f[2] - 0.4) < 1e-3       # loc
    assert abs(f[4] - 0.05) < 2e-3      # wid
    assert abs(f[5] + 0.3) < 0.1        # wid evolution
    assert abs(f[6] - 2.0) < 0.05       # amp
    assert abs(f[7] + 1.5) < 0.05       # amp index
    assert res.red_chi2 < 1.2


def test_gmodel_roundtrip(tmp_path):
    path = str(tmp_path / "test.gmodel")
    params = [0.005, 1e-4, 0.3, -0.1, 0.05, -0.5, 2.0, -1.5,
              0.5, 0.0, 0.02, 0.3, 1.0, -2.0]
    flags = [1, 0] + [1] * 12
    write_model(path, "TEST_MODEL", "000", 1400.0, params, flags, -4.0, 0,
                quiet=True)
    name, code, nu_ref, ngauss, rparams, rflags, alpha, fit_alpha = \
        read_model(path)
    assert name == "TEST_MODEL" and code == "000"
    assert nu_ref == 1400.0 and ngauss == 2
    np.testing.assert_allclose(rparams, params, atol=1e-8)
    np.testing.assert_allclose(rflags, flags)
    assert alpha == -4.0
    # evaluated model: tau converted sec -> bins
    freqs = np.linspace(1300.0, 1500.0, 4)
    phases = (np.arange(64) + 0.5) / 64
    name2, ng2, model = read_model(path, phases, freqs, P=0.003)
    assert model.shape == (4, 64)
    p_eval = np.array(params)
    p_eval[1] *= 64 / 0.003
    expected = np.asarray(gen_gaussian_portrait("000", jnp.asarray(p_eval),
                                                -4.0, phases, freqs, 1400.0))
    np.testing.assert_allclose(np.asarray(model), expected, atol=1e-10)


# ---------------------------------------------------------------- splines

def test_pca_matches_numpy_cov():
    port = RNG.normal(size=(32, 64))
    w = RNG.uniform(0.5, 2.0, 32)
    eigval, eigvec = pca(port, weights=w)
    mean = (port * w[:, None]).sum(0) / w.sum()
    delta = port - mean
    cov = np.cov(delta.T, aweights=w, ddof=1)
    ev, evec = np.linalg.eigh(cov)
    isort = np.argsort(ev)[::-1]
    np.testing.assert_allclose(eigval, ev[isort], rtol=1e-10, atol=1e-12)


def test_reconstruct_portrait_full_basis_is_identity():
    port = RNG.normal(size=(16, 32))
    eigval, eigvec = pca(port)
    rec = np.asarray(reconstruct_portrait(jnp.asarray(port),
                                          jnp.asarray(port.mean(0)),
                                          jnp.asarray(eigvec)))
    np.testing.assert_allclose(rec, port, atol=1e-8)


def test_splev_matches_scipy():
    u = np.linspace(1100.0, 1900.0, 40)
    pts = np.stack([np.sin(u / 200.0), np.cos(u / 300.0), u / 1000.0])
    tck_scipy, _ = si.splprep(list(pts), u=u, k=3, s=0.5)
    x = np.linspace(1100.0, 1900.0, 111)
    expected = np.asarray(si.splev(x, tck_scipy))
    t, c, k = tck_scipy
    got = np.asarray(splev(jnp.asarray(x), (jnp.asarray(t),
                                            jnp.asarray(np.asarray(c)), k)))
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_splev_extrapolates_like_scipy():
    u = np.linspace(0.0, 10.0, 20)
    pts = np.stack([u ** 2 / 10.0])
    tck_scipy, _ = si.splprep(list(pts), u=u, k=3, s=0)
    x = np.array([-1.0, 11.0])
    expected = np.asarray(si.splev(x, tck_scipy, ext=0))
    t, c, k = tck_scipy
    got = np.asarray(splev(jnp.asarray(x),
                           (jnp.asarray(t), jnp.asarray(np.asarray(c)), k)))
    np.testing.assert_allclose(got, expected, atol=1e-8)


def test_fit_parametric_spline_interpolates_smooth_curve():
    u = np.linspace(1100.0, 1900.0, 64)
    pts = np.stack([np.sin(u / 300.0), (u / 1500.0) ** -2])
    w = np.full(64, 100.0)
    # near-interpolation: tiny smoothing target forces knot insertion
    tck, fp = fit_parametric_spline(u, pts, weights=w, k=3, s=1e-6)
    got = np.asarray(splev(jnp.asarray(u), tck))
    np.testing.assert_allclose(got, pts, atol=1e-3)
    # smoothing: fp obeys the FITPACK criterion sum((w r)^2) <= s
    tck2, fp2 = fit_parametric_spline(u, pts, weights=w, k=3, s=float(len(u)))
    assert fp2 <= len(u)


def test_fourier_resample_matches_scipy():
    x = RNG.normal(size=(4, 64))
    for n_new in (32, 128):
        expected = ss.resample(x, n_new, axis=1)
        got = np.asarray(_fourier_resample(jnp.asarray(x), n_new))
        np.testing.assert_allclose(got, expected, atol=1e-10)


def test_gen_spline_portrait_zero_components():
    mean = np.asarray(gaussian_profile(64, 0.5, 0.1))
    port = np.asarray(gen_spline_portrait(jnp.asarray(mean),
                                          np.linspace(1, 2, 5),
                                          jnp.zeros((64, 0)),
                                          None))
    assert port.shape == (5, 64)
    np.testing.assert_allclose(port, np.tile(mean, (5, 1)))


def test_fit_parametric_spline_matches_scipy_splprep_evaluation():
    """Our penalized-LS spline and FITPACK's splprep agree where it
    matters: the evaluated curve (knot placement may differ;
    SURVEY.md section 7 'hard parts')."""
    rng = np.random.default_rng(3)
    u = np.linspace(1100.0, 1900.0, 48)
    truth = np.stack([np.sin(u / 250.0), 0.5 * np.cos(u / 400.0)])
    noisy = truth + rng.normal(0, 0.01, truth.shape)
    w = np.full(len(u), 1.0 / 0.01)
    s_target = len(u)  # FITPACK-style smoothing target
    tck_sp, _ = si.splprep(list(noisy), u=u, w=w, k=3, s=s_target)
    from pulseportraiture_tpu.models.spline import (fit_parametric_spline,
                                                    splev)
    tck_pp, _ = fit_parametric_spline(u, noisy, weights=w, k=3,
                                      s=s_target)
    ue = np.linspace(u[0], u[-1], 300)
    ours = np.asarray(splev(ue, tck_pp))
    theirs = np.stack(si.splev(ue, tck_sp))
    # smoothing fits with different knot placements diverge most at the
    # endpoints; the parity statement is interior agreement at the noise
    # scale plus global truth-tracking
    # two different knot-insertion strategies reaching the same RSS
    # target agree pointwise only to the noise scale
    interior = slice(30, 270)
    assert np.max(np.abs(ours - theirs)[:, interior]) < 2.5e-2, \
        np.max(np.abs(ours - theirs)[:, interior])
    truth_e = np.stack([np.sin(ue / 250.0), 0.5 * np.cos(ue / 400.0)])
    # relative quality: our smoothing fit must not be meaningfully
    # wigglier than FITPACK's on the same data (both sit ~2.5 sigma off
    # truth at worst; knot placement differs)
    err_ours = np.max(np.abs(ours - truth_e))
    err_theirs = np.max(np.abs(theirs - truth_e))
    assert err_ours < 1.5 * err_theirs + 1e-3, (err_ours, err_theirs)


def test_host_spline_evaluators_match_jax():
    """splev_np / gen_spline_portrait_np / reconstruct_portrait_np (the
    round-5 host-side evaluation twins) agree with the JAX versions to
    f64 rounding — the model-build and pipeline paths consume them on
    the host to avoid portrait-sized device fetches."""
    import numpy as np

    from pulseportraiture_tpu.models.spline import (
        fit_parametric_spline, gen_spline_portrait,
        gen_spline_portrait_np, reconstruct_portrait,
        reconstruct_portrait_np, splev, splev_np)

    rng = np.random.default_rng(0)
    u = np.linspace(1100.0, 1900.0, 64)
    pts = np.stack([np.sin(u / 300.0), np.cos(u / 500.0)])
    tck, _ = fit_parametric_spline(u, pts, k=3, s=1e-6)
    # include x OUTSIDE the knot span: splev/scipy ext=0 EXTRAPOLATE
    # there, and production evaluates zapped band-edge channels and
    # foreign frequency grids beyond the fitted ok-channel span
    x = np.linspace(900.0, 2100.0, 300)
    assert np.abs(np.asarray(splev(x, tck)) -
                  splev_np(x, tck)).max() < 1e-12
    mean = rng.normal(0, 1, 128)
    V = np.linalg.qr(rng.normal(0, 1, (128, 2)))[0]
    assert np.abs(np.asarray(gen_spline_portrait(mean, x, V, tck)) -
                  gen_spline_portrait_np(mean, x, V, tck)).max() < 1e-12
    port = rng.normal(0, 1, (16, 128))
    assert np.abs(np.asarray(reconstruct_portrait(port, mean, V)) -
                  reconstruct_portrait_np(port, mean, V)).max() < 1e-12
    # empty-eigvec branch
    g0 = gen_spline_portrait_np(mean, x, V[:, :0], tck)
    assert g0.shape == (len(x), len(mean))
    assert np.abs(g0 - mean[None]).max() == 0.0
