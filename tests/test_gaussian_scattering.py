"""Gaussian/scattering evaluator tests against scipy closed forms."""

import jax.numpy as jnp
import numpy as np
import scipy.special as sp

from pulseportraiture_tpu.ops import (
    gaussian_profile, gaussian_profile_FT, scattering_times,
    scattering_profile_FT, scattering_portrait_FT, scattering_kernel,
    add_scattering, instrumental_response_FT,
)
from pulseportraiture_tpu.ops.gaussian import _exp_erf_re


def test_exp_erf_re_vs_scipy_complex_erf():
    for a in [0.3, 1.7, 10.0, 40.0]:
        b = np.linspace(0.0, 30.0, 200)
        with np.errstate(all="ignore"):
            expected = np.exp(-b ** 2) * np.real(sp.erf(a + 1j * b))
        got = np.asarray(_exp_erf_re(jnp.asarray(float(a)), jnp.asarray(b)))
        assert np.all(np.isfinite(got))  # stable where scipy overflows
        ok = np.isfinite(expected)
        np.testing.assert_allclose(got[ok], expected[ok], atol=1e-12)


def test_gaussian_profile_peak_and_zero_width():
    # reference renormalizes to the nearest *bin center* (pplib.py:816-821):
    # the max equals exp(-z^2/2) for the half-bin offset z, exactly 1 when
    # loc lands on a bin center.
    prof = np.asarray(gaussian_profile(256, 0.3, 0.05))
    assert abs(prof.max() - 1.0) < 5e-3
    on_center = np.asarray(gaussian_profile(256, (100 + 0.5) / 256, 0.05))
    assert abs(on_center.max() - 1.0) < 1e-12
    assert np.asarray(gaussian_profile(256, 0.3, 0.0)).max() == 0.0
    assert np.asarray(gaussian_profile(256, 0.3, -0.1)).max() == 0.0


def test_gaussian_profile_FT_matches_reference_formula():
    """Direct numpy transcription of the analytic formula
    (pptoaslib.py:14-50)."""
    nbin, loc, wid, amp = 128, 0.37, 0.06, 2.5
    nharm = nbin // 2 + 1
    sigma = wid / (2 * np.sqrt(2 * np.log(2)))
    a_ = amp * (2 * np.pi * sigma ** 2) ** 0.5
    sigma_f = 1.0 / (2 * np.pi * sigma)
    k = np.arange(nharm)
    snc = 1.0 / np.pi
    a = sigma_f / (snc * 2 ** 0.5)
    b = k / (sigma_f * 2 ** 0.5)
    expected = np.exp(-b ** 2) * (sp.erf(a - b * 1j) + sp.erf(a + b * 1j)) / 2
    expected = np.nan_to_num(expected * a_ * nbin *
                             np.exp(-k * 2.0j * np.pi * loc))
    got = np.asarray(gaussian_profile_FT(nbin, loc, wid, amp))
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_gaussian_profile_FT_vs_fft_of_time_domain():
    nbin, loc, wid = 512, 0.5, 0.08
    prof = np.asarray(gaussian_profile(nbin, loc, wid, norm=True))
    fft_direct = np.fft.rfft(prof)
    # norm=True time-domain peak is 1/(sigma sqrt(2 pi)); the analytic
    # evaluator's amp parameter is the time-domain peak amplitude.
    sigma = wid / (2 * np.sqrt(2 * np.log(2)))
    amp = 1.0 / (sigma * np.sqrt(2 * np.pi))
    analytic = np.asarray(gaussian_profile_FT(nbin, loc, wid, amp))
    # the time-domain profile is sampled at bin *centers*, so its DFT
    # carries an extra half-bin phase ramp relative to the analytic FT
    k = np.arange(nbin // 2 + 1)
    fft_centered = fft_direct * np.exp(-1j * np.pi * k / nbin)
    # windowed analytic FT approximates the sampled-profile DFT
    np.testing.assert_allclose(analytic[:40], fft_centered[:40],
                               rtol=2e-3, atol=1e-4 * abs(fft_direct[0]))


def test_scattering_FT_formula_and_zero_tau():
    nbin = 64
    B = np.asarray(scattering_profile_FT(0.01, nbin))
    k = np.arange(nbin // 2 + 1)
    np.testing.assert_allclose(B, (1 + 2j * np.pi * k * 0.01) ** -1,
                               rtol=1e-14)
    B0 = np.asarray(scattering_profile_FT(0.0, nbin))
    np.testing.assert_allclose(B0, np.ones(nbin // 2 + 1), rtol=0)


def test_scattering_portrait_FT_stack():
    taus = jnp.asarray([0.0, 0.01, 0.05])
    out = np.asarray(scattering_portrait_FT(taus, 64))
    for i, tau in enumerate([0.0, 0.01, 0.05]):
        np.testing.assert_allclose(
            out[i], np.asarray(scattering_profile_FT(tau, 64)), rtol=1e-14)


def test_analytic_FT_vs_time_domain_convolution():
    """Legacy/analytic scattering pair (pplib.py:1098-1144 vs 4055-4095)."""
    nbin, nchan = 512, 4
    freqs = np.linspace(1100.0, 1900.0, nchan)
    phases_bin = np.arange(nbin, dtype=float)
    tau_bin = 12.0  # scattering time in bins
    prof = np.asarray(gaussian_profile(nbin, 0.5, 0.05))
    port = jnp.asarray(np.tile(prof, (nchan, 1)))
    kern = scattering_kernel(tau_bin, 1500.0, jnp.asarray(freqs),
                             jnp.asarray(phases_bin), 1.0, alpha=-4.0)
    conv = np.asarray(add_scattering(port, kern, repeat=3))
    taus_rot = np.asarray(scattering_times(tau_bin / nbin, -4.0, freqs,
                                           1500.0))
    B = np.asarray(scattering_portrait_FT(jnp.asarray(taus_rot), nbin))
    analytic = np.fft.irfft(B * np.fft.rfft(np.asarray(port), axis=-1),
                            n=nbin, axis=-1)
    # time-domain truncated kernel vs analytic continuous FT: loose agreement
    np.testing.assert_allclose(analytic, conv, atol=5e-2 * conv.max())


def test_instrumental_response_rect():
    out = np.asarray(instrumental_response_FT(64, 0.1, "rect"))
    np.testing.assert_allclose(out, np.sinc(np.arange(33) * 0.1), rtol=1e-7)
    out0 = np.asarray(instrumental_response_FT(64, 0.0, "rect"))
    np.testing.assert_allclose(out0, np.ones(33), rtol=0)
