"""Scattering law and its analytic Fourier-domain representation.

The scattering impulse response is a one-sided exponential with timescale
tau(nu) = tau * (nu/nu_tau)**alpha.  Its analytic FT at harmonic k is
B_k = (1 + 2 pi i k tau)**-1 (tau in [rot]).

Behavioral parity: reference pplib.py:4049-4095 (scattering_times,
scattering_profile_FT, scattering_portrait_FT), pplib.py:1098-1144 (legacy
time-domain kernel, kept for cross-validation tests).
"""

from __future__ import annotations

import jax.numpy as jnp

from pulseportraiture_tpu.config import SCATTERING_ALPHA


def scattering_times(tau, alpha, freqs, nu_tau):
    """tau(nu) = tau * (freqs/nu_tau)**alpha.  Reference: pplib.py:4049-4053."""
    return tau * (freqs / nu_tau) ** alpha


def scattering_profile_FT(tau, nbin):
    """Analytic FT of the one-sided exponential kernel, nharm samples.

    Returns ones when tau == 0 (no scattering).  tau is in [rot].
    Reference: pplib.py:4055-4078.
    """
    nharm = nbin // 2 + 1
    k = jnp.arange(nharm)
    B = (1.0 + 2.0j * jnp.pi * k * tau) ** -1
    return jnp.where(tau == 0.0, jnp.ones(nharm, dtype=B.dtype), B)


def scattering_portrait_FT(taus, nbin):
    """Per-channel stack of scattering_profile_FT: (..., nchan, nharm).

    Reference: pplib.py:4080-4095 (vectorized; no per-channel loop).
    """
    taus = jnp.asarray(taus)
    nharm = nbin // 2 + 1
    k = jnp.arange(nharm, dtype=taus.dtype)
    B = (1.0 + 2.0j * jnp.pi * k * taus[..., None]) ** -1
    return jnp.where(taus[..., None] == 0.0,
                     jnp.ones_like(B), B)


def scattering_kernel(tau, nu_ref, freqs, phases, P, alpha=SCATTERING_ALPHA):
    """Time-domain one-sided exponential kernel (legacy; for tests).

    Reference: pplib.py:1098-1119.  tau in [sec] or [bin]; phases in [rot]
    (or [bin] if tau is in [bin]); P = 1.0 if tau is in [bin].
    """
    freqs = jnp.asarray(freqs)
    phases = jnp.asarray(phases)
    nchan = freqs.shape[0]
    nbin = phases.shape[0]
    if tau == 0.0:
        sk = jnp.zeros((nchan, nbin))
        return sk.at[:, 0].set(1.0)
    ts = jnp.broadcast_to(phases * P, (nchan, nbin))
    taus = scattering_times(tau, alpha, freqs, nu_ref)
    return jnp.exp(-ts / taus[:, None])


def add_scattering(port, kernel, repeat=3):
    """Convolve port with a scattering kernel, tiled to kill edge effects.

    Reference: pplib.py:1121-1144.  Used only for cross-validation of the
    analytic FT path in tests and simulation.
    """
    port = jnp.atleast_2d(jnp.asarray(port))
    kernel = jnp.atleast_2d(jnp.asarray(kernel))
    nbin = port.shape[-1]
    mid = repeat // 2
    d = jnp.tile(port, (1, repeat))
    k = jnp.tile(kernel, (1, repeat))
    norm_kernel = k / k.sum(axis=-1, keepdims=True)
    out = jnp.fft.irfft(jnp.fft.rfft(norm_kernel, axis=-1) *
                        jnp.fft.rfft(d, axis=-1), n=nbin * repeat, axis=-1)
    return out[:, mid * nbin:(mid + 1) * nbin]
