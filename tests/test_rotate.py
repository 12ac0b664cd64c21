"""Rotation/dedispersion kernel parity tests (SURVEY.md section 4).

Closed-form anchors: integer-bin rotation == np.roll, invertibility,
phase_transform associativity, legacy/analytic consistency pairs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pulseportraiture_tpu.config import DCONST
from pulseportraiture_tpu.ops import (
    rotate_portrait, rotate_portrait_full, rotate_profile, rotate_data,
    fft_rotate, add_DM_nu, phase_transform, phase_shifts, DM_delay,
    guess_fit_freq,
)

RNG = np.random.default_rng(42)


def make_port(nchan=8, nbin=256):
    x = np.zeros((nchan, nbin))
    phases = (np.arange(nbin) + 0.5) / nbin
    for i in range(nchan):
        x[i] = np.exp(-0.5 * ((phases - 0.3) / 0.02) ** 2) * (1 + 0.1 * i)
    return jnp.asarray(x)


def test_integer_bin_rotation_is_roll():
    port = make_port()
    nbin = port.shape[-1]
    for shift_bins in [1, 5, 17]:
        rotated = rotate_portrait(port, shift_bins / nbin)
        # positive phase rotates to earlier phase = roll left
        expected = np.roll(np.asarray(port), -shift_bins, axis=-1)
        np.testing.assert_allclose(np.asarray(rotated), expected, atol=1e-10)


def test_rotation_invertibility():
    port = make_port()
    freqs = jnp.linspace(1100.0, 1900.0, port.shape[0])
    out = rotate_portrait(port, 0.123, 0.01, 0.004, freqs, 1500.0)
    back = rotate_portrait(out, -0.123, -0.01, 0.004, freqs, 1500.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(port), atol=1e-10)


def test_fft_rotate_matches_rotate_profile():
    prof = np.asarray(make_port())[0]
    nbin = len(prof)
    out1 = fft_rotate(prof, 3.7)
    out2 = rotate_profile(prof, 3.7 / nbin)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-10)


def test_rotate_portrait_full_gm0_matches_rotate_portrait():
    port = make_port()
    freqs = jnp.linspace(1100.0, 1900.0, port.shape[0])
    a = rotate_portrait_full(port, 0.05, 0.02, 0.0, freqs, 1500.0,
                             jnp.inf, P=0.003)
    b = rotate_portrait(port, 0.05, 0.02, 0.003, freqs, 1500.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_rotate_data_4d_consistency():
    port = make_port(nchan=4, nbin=32)
    freqs = jnp.linspace(1100.0, 1900.0, 4)
    data4 = jnp.stack([jnp.stack([port])] * 3)  # (3, 1, 4, 32)
    out4 = rotate_data(data4, 0.05, 0.02, jnp.full(3, 0.003), freqs, 1500.0)
    out2 = rotate_portrait(port, 0.05, 0.02, 0.003, freqs, 1500.0)
    for isub in range(3):
        np.testing.assert_allclose(np.asarray(out4[isub, 0]),
                                   np.asarray(out2), atol=1e-10)


def test_add_DM_nu_default_matches_rotate_portrait():
    port = make_port()
    freqs = jnp.linspace(1100.0, 1900.0, port.shape[0])
    a = add_DM_nu(port, 0.05, 0.02, 0.003, freqs, xs=[-2.0], Cs=[1.0],
                  nu_ref=1500.0)
    b = rotate_portrait(port, 0.05, 0.02, 0.003, freqs, 1500.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_phase_transform_associativity():
    phi, DM, P = 0.1, 0.01, 0.003
    p12 = phase_transform(phi, DM, 1200.0, 1500.0, P)
    p123 = phase_transform(p12, DM, 1500.0, 1700.0, P)
    p13 = phase_transform(phi, DM, 1200.0, 1700.0, P)
    np.testing.assert_allclose(float(p123), float(p13), rtol=0, atol=1e-12)


def test_phase_shifts_numpy_parity():
    freqs = np.linspace(1100.0, 1900.0, 16)
    phi, DM, GM, P = 0.05, 0.01, 1e-6, 0.003
    nu_DM, nu_GM = 1500.0, 1400.0
    expected = phi + DCONST * DM * (freqs ** -2 - nu_DM ** -2) / P + \
        DCONST ** 2 * GM * (freqs ** -4 - nu_GM ** -4) / P
    got = phase_shifts(phi, DM, GM, jnp.asarray(freqs), nu_DM, nu_GM, P)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-14)


def test_DM_delay_infinite_reference():
    d = DM_delay(10.0, 1400.0)
    np.testing.assert_allclose(float(d), DCONST * 10.0 * 1400.0 ** -2,
                               rtol=1e-14)


def test_guess_fit_freq_weighted_com():
    freqs = np.linspace(1100.0, 1900.0, 16)
    snrs = np.ones(16)
    nu0 = (freqs.min() + freqs.max()) / 2
    expected = nu0 + np.sum((freqs - nu0) * snrs * freqs ** -2) / \
        np.sum(snrs * freqs ** -2)
    got = guess_fit_freq(jnp.asarray(freqs), jnp.asarray(snrs))
    np.testing.assert_allclose(float(got), expected, rtol=1e-14)
