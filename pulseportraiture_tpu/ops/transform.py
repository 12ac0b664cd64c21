"""Phase-delay model and phase-ramp (phasor) construction.

The physical delay model for the extended-FFTFIT likelihood is

    phi_n = phi + (Dconst/P) * DM * (nu_n**-2 - nu_DM**-2)
                + (Dconst**2/P) * GM * (nu_n**-4 - nu_GM**-4)

with the sign convention that *positive* phase/DM rotate the data to
*earlier* phase (dedispersion) for nu < nu_ref.

Behavioral parity targets: reference pptoaslib.py:181-238 (phase_shifts,
phase_shifts_deriv, phasor), pplib.py:2577-2632 (DM_delay, phase_transform,
guess_fit_freq).
"""

from __future__ import annotations

import jax.numpy as jnp

from pulseportraiture_tpu.config import DCONST


def _inv2(nu):
    """nu**-2 that maps inf -> 0 exactly (nu_ref = inf means 'no reference')."""
    return jnp.where(jnp.isinf(nu), 0.0, nu ** -2.0)


def _inv4(nu):
    return jnp.where(jnp.isinf(nu), 0.0, nu ** -4.0)


def mod_pm_half(x):
    """Map x to the interval [-0.5, 0.5).

    Matches the reference's two-step where/mod construction
    (pptoaslib.py:209-214, pplib.py:2610-2615).
    """
    x = jnp.where(jnp.abs(x) >= 0.5, x % 1.0, x)
    return jnp.where(x >= 0.5, x - 1.0, x)


def phase_shifts(phi, DM, GM, freqs, nu_DM=jnp.inf, nu_GM=jnp.inf, P=None,
                 mod=False, dconst=DCONST):
    """Per-frequency phase delays [rot] (or [sec] if P is None).

    Reference: pptoaslib.py:181-214.
    """
    if P is None:
        P = 1.0
        mod = False
    dispersive = dconst * DM * (_inv2(freqs) - _inv2(nu_DM)) / P
    refractive = dconst ** 2 * GM * (_inv4(freqs) - _inv4(nu_GM)) / P
    delays = phi + dispersive + refractive
    if mod:
        delays = mod_pm_half(delays)
    return delays


def phase_shifts_deriv(freqs, nu_DM=jnp.inf, nu_GM=jnp.inf, P=None,
                       dconst=DCONST):
    """Gradient of phase_shifts wrt (phi, DM, GM): shape (3, nchan).

    Reference: pptoaslib.py:216-225.  The second derivative is identically
    zero (pptoaslib.py:227-231).
    """
    if P is None:
        P = 1.0
    freqs = jnp.asarray(freqs)
    dphi = jnp.ones_like(freqs)
    dDM = dconst * (_inv2(freqs) - _inv2(nu_DM)) / P
    dGM = dconst ** 2 * (_inv4(freqs) - _inv4(nu_GM)) / P
    return jnp.stack([dphi, dDM, dGM])


def phasor(phis, nharm, dtype=None):
    """exp(2 pi i * outer(phis, k)) for harmonics k = 0..nharm-1.

    phis may have any shape; a trailing harmonic axis is appended.
    Reference: pptoaslib.py:233-238.
    """
    phis = jnp.asarray(phis)
    k = jnp.arange(nharm, dtype=phis.dtype)
    ang = 2.0 * jnp.pi * phis[..., None] * k
    out = jax_cis(ang)
    if dtype is not None:
        out = out.astype(dtype)
    return out


def jax_cis(ang):
    """cos(ang) + i sin(ang) without forming exp of a complex array."""
    return jnp.cos(ang) + 1.0j * jnp.sin(ang)


def DM_delay(DM, freq, freq_ref=jnp.inf, P=None, dconst=DCONST):
    """Dispersive delay [sec] (or [rot] if P given) between two frequencies.

    Reference: pplib.py:2577-2590.
    """
    delay = dconst * DM * (_inv2(freq) - _inv2(freq_ref))
    if P is not None:
        return delay / P
    return delay


def phase_transform(phi, DM, nu_ref1=jnp.inf, nu_ref2=jnp.inf, P=None,
                    mod=False, dconst=DCONST):
    """Transport a delay referenced at nu_ref1 to nu_ref2.

    Reference: pplib.py:2592-2616.
    """
    if P is None:
        P = 1.0
        mod = False
    phi_prime = phi + dconst * DM * (_inv2(nu_ref2) - _inv2(nu_ref1)) / P
    if mod:
        phi_prime = mod_pm_half(phi_prime)
    return phi_prime


def guess_fit_freq(freqs, SNRs=None):
    """SNR * nu**-2 weighted center-of-mass frequency.

    Estimates a zero-covariance frequency before a fit exists.
    Reference: pplib.py:2618-2632.
    """
    freqs = jnp.asarray(freqs)
    nu0 = (freqs.min() + freqs.max()) * 0.5
    if SNRs is None:
        SNRs = jnp.ones_like(freqs)
    w = SNRs * freqs ** -2
    return nu0 + jnp.sum((freqs - nu0) * w) / jnp.sum(w)


def GM_from_DMc(DMc, D, a_perp):
    """Geometric ("GM") nu^-4 delay factor from a discrete cloud.

    DMc [pc cm^-3] is the cloud's dispersion measure, D [kpc] the
    Earth-cloud distance, a_perp [AU] its transverse scale (Lam+16).
    Reference: pptoaslib.py:83-96.
    """
    c = 3e10 / 3.1e21  # cm/s over cm/kpc
    return DMc ** 2 * (c * D) / (2.0 * (a_perp * 4.8e-9) ** 2)


def DMc_from_GM(GM, D, a_perp):
    """Inverse of GM_from_DMc.

    Implemented as the exact algebraic inverse; the reference's version
    (pptoaslib.py:98-110) misplaces a square on a_perp and is not the
    inverse of its own forward function.
    """
    c = 3e10 / 3.1e21
    return (GM * 2.0 * (a_perp * 4.8e-9) ** 2 / (c * D)) ** 0.5


def calculate_TOA(epoch, P, phi, DM=0.0, nu_ref1=jnp.inf, nu_ref2=jnp.inf):
    """TOA (an io.mjd.MJD) = epoch + phase_transform(phi)*P.

    epoch is an MJD; the un-Doppler-corrected DM must be used.
    Reference: pplib.py:2634-2648.
    """
    phi_prime = phase_transform(phi, DM, nu_ref1, nu_ref2, P, mod=False)
    return epoch.add_seconds(float(phi_prime) * P)
