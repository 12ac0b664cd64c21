"""DIRECT numerical parity against the reference's own code.

tests/reference_shim.py executes the reference's pptoaslib (converted
only syntactically) under python3; these tests compare our fused
sufficient-statistics core against the reference's objective, gradient,
Hessian, Woodbury covariance, and zero-covariance frequencies on the
same inputs, in float64, to near machine precision.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from reference_shim import load_reference_pptoaslib  # noqa: E402

from pulseportraiture_tpu.fitters import nu_zeros, stats  # noqa: E402
from pulseportraiture_tpu.ops import gaussian_profile  # noqa: E402

REF = load_reference_pptoaslib()
RNG = np.random.default_rng(99)


@pytest.fixture(scope="module")
def problem():
    nchan, nbin, P = 16, 256, 0.003
    freqs = np.linspace(1100.0, 1900.0, nchan)
    model = np.zeros((nchan, nbin))
    for i, f in enumerate(freqs):
        model[i] = (f / 1500.0) ** -1.3 * np.asarray(
            gaussian_profile(nbin, 0.4, 0.04 * (f / 1500.0) ** -0.2))
    data = model + RNG.normal(0, 0.05, model.shape)
    errs = np.full(nchan, 0.05)
    errs_FT = errs * np.sqrt(nbin / 2.0)
    dFT = np.fft.rfft(data, axis=-1)
    mFT = np.fft.rfft(model, axis=-1)
    dFT[:, 0] = 0.0
    mFT[:, 0] = 0.0   # F0_fact = 0 convention
    setup = stats.make_setup(jnp.asarray(data), jnp.asarray(model),
                             jnp.asarray(errs), P, jnp.asarray(freqs),
                             1500.0, 1500.0, 1500.0)
    return dict(dFT=dFT, mFT=mFT, errs_FT=errs_FT, P=P, freqs=freqs,
                setup=setup, nbin=nbin)


PARAMS = np.array([0.07, 1.5e-3, 2e-8, -1.7, -4.3])
FLAGS = [1, 1, 1, 1, 1]


def test_objective_matches_reference(problem):
    p = problem
    ref_val = REF.fit_portrait_full_function(
        PARAMS, p["dFT"], p["mFT"], p["errs_FT"], p["P"], p["freqs"],
        1500.0, 1500.0, 1500.0, FLAGS, True)
    ours = float(stats.chi2_prime(jnp.asarray(PARAMS), p["setup"],
                                  log10_tau=True))
    np.testing.assert_allclose(ours, ref_val, rtol=1e-12)


def test_gradient_matches_reference(problem):
    p = problem
    ref_g = REF.fit_portrait_full_function_deriv(
        PARAMS, p["dFT"], p["mFT"], p["errs_FT"], p["P"], p["freqs"],
        1500.0, 1500.0, 1500.0, FLAGS, True)
    _, g, _ = stats.chi2_value_grad_hess(jnp.asarray(PARAMS), p["setup"],
                                         fit_flags=(1, 1, 1, 1, 1),
                                         log10_tau=True)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g),
                               rtol=1e-10, atol=1e-9)


def test_hessian_matches_reference(problem):
    p = problem
    ref_H = REF.fit_portrait_full_function_2deriv(
        PARAMS, p["dFT"], p["mFT"], p["errs_FT"], p["P"], p["freqs"],
        1500.0, 1500.0, 1500.0, FLAGS, True)
    _, _, H = stats.chi2_value_grad_hess(jnp.asarray(PARAMS), p["setup"],
                                         fit_flags=(1, 1, 1, 1, 1),
                                         log10_tau=True)
    np.testing.assert_allclose(np.asarray(H), np.asarray(ref_H),
                               rtol=1e-9, atol=1e-7)


def test_scales_match_reference(problem):
    p = problem
    ref_scales = REF.get_scales_full(
        PARAMS, p["dFT"], p["mFT"], p["errs_FT"], p["P"], p["freqs"],
        1500.0, 1500.0, 1500.0, True)
    scales, S = stats.get_scales(jnp.asarray(PARAMS), p["setup"],
                                 log10_tau=True)
    np.testing.assert_allclose(np.asarray(scales), np.asarray(ref_scales),
                               rtol=1e-11)


def test_nu_zeros_match_reference(problem):
    p = problem
    for flags in ([1, 1, 0, 0, 0], [1, 0, 1, 0, 0], [0, 0, 0, 1, 1],
                  [1, 1, 0, 1, 0], [1, 1, 0, 1, 1]):
        ref_nz = REF.get_nu_zeros(
            PARAMS, p["dFT"], p["mFT"], p["errs_FT"], p["P"], p["freqs"],
            1500.0, 1500.0, 1500.0, flags, True, option=0)
        ours = nu_zeros.get_nu_zeros(jnp.asarray(PARAMS), p["setup"],
                                     fit_flags=tuple(flags),
                                     log10_tau=True)
        ours_arr = np.array([float(x) for x in ours])
        ref_arr = np.asarray(ref_nz, dtype=float)
        # compare where the reference defines a value (it returns the
        # fit reference for unconstrained slots)
        for a, b in zip(ours_arr, ref_arr):
            if np.isfinite(b) and b > 0:
                np.testing.assert_allclose(a, b, rtol=1e-9,
                                           err_msg=str(flags))


def test_woodbury_covariance_matches_reference(problem):
    p = problem
    out = REF.fit_portrait_full_function_2deriv_with_scales(
        PARAMS, p["dFT"], p["mFT"], p["errs_FT"], p["P"], p["freqs"],
        1500.0, 1500.0, 1500.0, FLAGS, True,
        return_covariance_matrix=True, return_scales=True)
    _, ref_cov, ref_scales = out
    cov, perrs, scales, scale_errs, S = stats.covariance_with_scales(
        jnp.asarray(PARAMS), p["setup"], fit_flags=(1, 1, 1, 1, 1),
        log10_tau=True)
    nfit = 5
    np.testing.assert_allclose(np.asarray(cov),
                               np.asarray(ref_cov)[:nfit, :nfit],
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(scale_errs) ** 2,
        np.diag(np.asarray(ref_cov))[nfit:], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(scales),
                               np.asarray(ref_scales), rtol=1e-11)


def test_gen_gaussian_portrait_matches_reference():
    """Evolving-Gaussian portrait generation vs the reference's own
    pplib code: all evolution codes, with and without scattering."""
    from reference_shim import load_reference_pplib_generators

    from pulseportraiture_tpu.models.gaussian import gen_gaussian_portrait

    ref = load_reference_pplib_generators()
    nbin, nchan = 128, 8
    freqs = np.linspace(1100.0, 1900.0, nchan)
    phases = (np.arange(nbin) + 0.5) / nbin
    params = np.array([0.01, 0.0, 0.3, -0.01, 0.05, -0.5, 4.0, -1.2,
                       0.55, 0.004, 0.02, 0.8, 2.0, -0.7])
    for code in ("000", "111", "010", "101"):
        want = np.asarray(ref.gen_gaussian_portrait(
            code, params, -4.0, phases, freqs, 1500.0))
        got = np.asarray(gen_gaussian_portrait(
            code, jnp.asarray(params), -4.0, jnp.asarray(phases),
            jnp.asarray(freqs), 1500.0))
        np.testing.assert_allclose(got, want, atol=5e-13, err_msg=code)
    scat = params.copy()
    scat[1] = 3.0  # tau [bins]
    want = np.asarray(ref.gen_gaussian_portrait(
        "000", scat, -4.0, phases, freqs, 1500.0))
    got = np.asarray(gen_gaussian_portrait(
        "000", jnp.asarray(scat), -4.0, jnp.asarray(phases),
        jnp.asarray(freqs), 1500.0))
    np.testing.assert_allclose(got, want, atol=5e-13)


def test_two_param_fit_functions_match_reference():
    """The reference's SEPARATE 2-parameter implementation
    (pplib.py:1282-1391) equals our 5-parameter core restricted to
    (phi, DM) — objective, gradient, and phi/DM Hessian block."""
    from reference_shim import REF as REFDIR
    from reference_shim import _extract_defs, _py3ify

    src = open(f"{REFDIR}/pplib.py").read()
    block = _py3ify(_extract_defs(src, {
        "fit_portrait_function", "fit_portrait_function_deriv",
        "fit_portrait_function_2deriv"}))
    ns = {"np": np, "Dconst": 0.000241 ** -1}
    exec(compile(block, "pplib_fit_ref.py", "exec"), ns)

    rng = np.random.default_rng(4)
    nchan, nbin, P = 12, 128, 0.003
    freqs = np.linspace(1100.0, 1900.0, nchan)
    model = np.abs(rng.normal(1, 0.3, (nchan, nbin)))
    data = model + rng.normal(0, 0.05, model.shape)
    errs = np.full(nchan, 0.05)
    errs_FT = errs * np.sqrt(nbin / 2.0)
    dFT = np.fft.rfft(data, axis=-1)
    mFT = np.fft.rfft(model, axis=-1)
    dFT[:, 0] = 0.0
    mFT[:, 0] = 0.0
    p_n = np.real(np.sum(mFT * np.conj(mFT), axis=1))
    params = np.array([0.05, 2e-3])
    ref_f = ns["fit_portrait_function"](params, mFT, p_n, dFT, errs_FT,
                                        P, freqs, 1500.0)
    ref_g = ns["fit_portrait_function_deriv"](params, mFT, p_n, dFT,
                                              errs_FT, P, freqs, 1500.0)
    setup = stats.make_setup(jnp.asarray(data), jnp.asarray(model),
                             jnp.asarray(errs), P, jnp.asarray(freqs),
                             1500.0, jnp.inf, 1500.0)
    p5 = jnp.asarray([0.05, 2e-3, 0.0, 0.0, 0.0])
    f, g, H = stats.chi2_value_grad_hess(p5, setup,
                                         fit_flags=(1, 1, 0, 0, 0),
                                         log10_tau=False,
                                         scattering=False)
    np.testing.assert_allclose(float(f), float(ref_f), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(g)[:2], np.asarray(ref_g),
                               rtol=1e-12)


def test_noise_scales_phase_shift_match_reference():
    """get_noise_PS, get_scales, and the FFTFIT phase objective vs the
    reference's own pplib code (pplib.py:2227-2253, 2310-2336,
    1244-1280)."""
    from reference_shim import REF as REFDIR
    from reference_shim import _extract_defs, _py3ify, _pplib_stub

    src = open(f"{REFDIR}/pplib.py").read()
    block = _py3ify(_extract_defs(src, {
        "get_noise_PS", "get_scales", "fit_phase_shift_function",
        "fit_phase_shift_function_deriv",
        "fit_phase_shift_function_2deriv"}))
    pl = _pplib_stub()
    ns = {"np": np, "fft": np.fft, "Dconst": pl.Dconst, "F0_fact": 0,
          "phase_transform": pl.phase_transform,
          "rotate_portrait": pl.rotate_portrait}
    exec(compile(block, "pplib_misc_ref.py", "exec"), ns)

    rng = np.random.default_rng(6)
    nchan, nbin, P = 10, 128, 0.003
    freqs = np.linspace(1100.0, 1900.0, nchan)
    model = np.abs(rng.normal(1, 0.3, (nchan, nbin)))
    data = 1.3 * model + rng.normal(0, 0.04, model.shape)

    # noise estimator
    from pulseportraiture_tpu.ops.noise import get_noise_PS
    ref_noise = ns["get_noise_PS"](data, chans=True)
    ours_noise = np.asarray(get_noise_PS(jnp.asarray(data), chans=True))
    np.testing.assert_allclose(ours_noise, ref_noise, rtol=1e-12)
    np.testing.assert_allclose(
        float(get_noise_PS(jnp.asarray(data))),
        float(ns["get_noise_PS"](data)), rtol=1e-12)

    # ML scales at a rotation (reference get_scales signature:
    # (params, model, data, errs, P, freqs, nu_ref), Fourier inputs)
    errs = np.full(nchan, 0.04)
    ref_scales = ns["get_scales"](data, model, 0.02, 1e-3, P, freqs,
                                  1500.0)
    setup = stats.make_setup(jnp.asarray(data), jnp.asarray(model),
                             jnp.asarray(errs), P, jnp.asarray(freqs),
                             1500.0, jnp.inf, 1500.0)
    p5 = jnp.asarray([0.02, 1e-3, 0.0, 0.0, 0.0])
    scales, _ = stats.get_scales(p5, setup, log10_tau=False,
                                 scattering=False)
    np.testing.assert_allclose(np.asarray(scales), np.asarray(ref_scales),
                               rtol=1e-11)
