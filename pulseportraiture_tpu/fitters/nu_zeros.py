"""Zero-covariance reference frequencies for the wideband fit.

After the fit, phase is re-referenced to the frequency at which its
covariance with DM (or GM, or tau) vanishes, computed in closed form from
the per-channel Hessian.  All branch formulas follow the reference
(pptoaslib.py:733-906) exactly:

  [1,1,0,0,0]  phi+DM:        weighted harmonic mean (closed form, JAX)
  [1,0,1,0,0]  phi+GM:        nu^-4 analogue (closed form, JAX)
  [0,0,0,1,1]  tau+alpha:     log-space mean (closed form, JAX)
  [1,1,0,1,0]  phi+DM+tau:    3x3 cofactor closed form (JAX)
  [1,1,1,0,0]  phi+DM+GM:     even degree-6 polynomial -> cubic in nu^2 (host)
  [1,1,0,1,1]  phi+DM+tau+a:  4x4 cofactor closed form (JAX)
  [1,1,1,1,0]  no alpha:      degree-5/4 polynomial in nu^2 (host roots)
  [1,1,1,1,1]  all:           approximated by the [1,1,0,1,1] formulas

Polynomial branches use numpy roots on host (nonsymmetric eigensolves are
unsupported on TPU); they run once per fit, outside the jitted hot loop.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pulseportraiture_tpu.fitters import stats
from pulseportraiture_tpu.ops.transform import phase_shifts_deriv


def get_nu_zeros(params, setup, fit_flags=(1, 1, 1, 1, 1), log10_tau=True,
                 option=0):
    """Return [nu_zero_DM, nu_zero_GM, nu_zero_tau].

    Closed-form branches stay on device; polynomial branches transfer the
    (5,5,nchan) per-channel Hessian to host (runs once per fit).
    """
    ff = tuple(int(bool(f)) for f in fit_flags)
    Hn = stats.chi2_hess_per_channel(params, setup, fit_flags=(1, 1, 1, 1, 1),
                                     log10_tau=log10_tau)
    freqs = setup.freqs
    phis_d = phase_shifts_deriv(freqs, setup.nu_DM, setup.nu_GM, setup.P)
    taus, dtau, _ = stats._taus_and_derivs(params, setup, log10_tau)
    nu_DM, nu_GM, nu_tau = setup.nu_DM, setup.nu_GM, setup.nu_tau

    # ln(freqs/nu_tau) divisor used by the tau branches: taus_deriv[1]/taus
    def _log_ratio():
        return jnp.log(freqs / nu_tau)

    if ff == (1, 1, 0, 0, 0):  # pptoaslib.py:746-752
        H21_n = Hn[0, 1] / phis_d[1]
        nu_zero_DM = (jnp.sum(freqs ** -2 * H21_n) / jnp.sum(H21_n)) ** -0.5
        return [nu_zero_DM, nu_GM, nu_tau]

    if ff == (1, 0, 1, 0, 0):  # pptoaslib.py:753-760
        H21_n = Hn[0, 2] / phis_d[2]
        nu_zero_GM = (jnp.sum(freqs ** -4 * H21_n) / jnp.sum(H21_n)) ** -0.25
        return [nu_DM, nu_zero_GM, nu_tau]

    if ff == (0, 0, 0, 1, 1):  # pptoaslib.py:761-767
        H21_n = Hn[3, 4] / _log_ratio()
        nu_zero_tau = jnp.exp(jnp.sum(jnp.log(freqs) * H21_n) /
                              jnp.sum(H21_n))
        return [nu_DM, nu_GM, nu_zero_tau]

    if ff == (1, 1, 0, 1, 0):  # pptoaslib.py:768-778
        # sub-Hessian over (phi, DM, tau)
        H21_n = Hn[1, 0] / phis_d[1]
        H23_n = Hn[1, 3] / phis_d[1]
        H13 = jnp.sum(Hn[3, 0])
        H33 = jnp.sum(Hn[3, 3])
        numer = H13 * jnp.sum(freqs ** -2 * H23_n) - \
            H33 * jnp.sum(freqs ** -2 * H21_n)
        denom = H13 * jnp.sum(H23_n) - H33 * jnp.sum(H21_n)
        nu_zero_DM = (numer / denom) ** -0.5
        return [nu_zero_DM, nu_GM, nu_tau]

    if ff == (1, 1, 0, 1, 1) or ff == (1, 1, 1, 1, 1):
        # pptoaslib.py:813-836; the all-fit case approximates with this
        # branch (pptoaslib.py:893-901).
        idx = [0, 1, 3, 4]  # drop GM
        H = Hn[jnp.array(idx)][:, jnp.array(idx)]  # (4,4,nchan)
        lr = _log_ratio()
        H21_n, H23_n, H24_n = (H[1, 0] / phis_d[1], H[1, 2] / phis_d[1],
                               H[1, 3] / phis_d[1])
        H41_n, H42_n, H43_n = (H[3, 0] / lr, H[3, 1] / lr, H[3, 2] / lr)
        Hij = jnp.sum(H, axis=-1)
        H11, H22, H33, H44 = Hij[0, 0], Hij[1, 1], Hij[2, 2], Hij[3, 3]
        H12, H13, H14 = Hij[0, 1], Hij[0, 2], Hij[0, 3]
        H23, H24 = Hij[1, 2], Hij[1, 3]
        H34 = Hij[2, 3]
        f2 = freqs ** -2
        numer = ((H34 * H34 - H33 * H44) * jnp.sum(f2 * H21_n) +
                 (H13 * H44 - H14 * H34) * jnp.sum(f2 * H23_n) +
                 (H14 * H33 - H13 * H34) * jnp.sum(f2 * H24_n))
        denom = ((H34 * H34 - H33 * H44) * jnp.sum(H21_n) +
                 (H13 * H44 - H14 * H34) * jnp.sum(H23_n) +
                 (H14 * H33 - H13 * H34) * jnp.sum(H24_n))
        nu_zero_DM = (numer / denom) ** -0.5
        lf = jnp.log(freqs)
        numer_t = ((H13 * H22 - H12 * H23) * jnp.sum(lf * H41_n) +
                   (H11 * H23 - H12 * H13) * jnp.sum(lf * H42_n) +
                   (H12 * H12 - H11 * H22) * jnp.sum(lf * H43_n))
        denom_t = ((H13 * H22 - H12 * H23) * jnp.sum(H41_n) +
                   (H11 * H23 - H12 * H13) * jnp.sum(H42_n) +
                   (H12 * H12 - H11 * H22) * jnp.sum(H43_n))
        nu_zero_tau = jnp.exp(numer_t / denom_t)
        return [nu_zero_DM, nu_GM, nu_zero_tau]

    if ff == (1, 1, 1, 0, 0):  # pptoaslib.py:779-812, host polynomial
        Hn_np = np.asarray(Hn)[:3, :3]
        freqs_np = np.asarray(freqs)
        pd = np.asarray(phis_d)
        if option == 0:  # zero covariance between phi and DM
            H21_n, H23_n = Hn_np[1, 0] / pd[1], Hn_np[1, 2] / pd[1]
            H31_n, H33_n = Hn_np[2, 0] / pd[2], Hn_np[2, 2] / pd[2]
            A, B = (H31_n * freqs_np ** -4).sum(), H31_n.sum()
            C, D = (H23_n * freqs_np ** -2).sum(), H23_n.sum()
            E, F = (H33_n * freqs_np ** -4).sum(), H33_n.sum()
            G, H = (H21_n * freqs_np ** -2).sum(), H21_n.sum()
        elif option == 1:  # zero covariance between phi and GM
            H21_n, H22_n = Hn_np[1, 0] / pd[1], Hn_np[1, 1] / pd[1]
            H31_n, H32_n = Hn_np[2, 0] / pd[2], Hn_np[2, 1] / pd[2]
            A, B = (H21_n * freqs_np ** -4).sum(), H21_n.sum()
            C, D = (H32_n * freqs_np ** -2).sum(), H32_n.sum()
            E, F = (H22_n * freqs_np ** -4).sum(), H22_n.sum()
            G, H = (H31_n * freqs_np ** -2).sum(), H31_n.sum()
        else:
            return [nu_DM, nu_GM, nu_tau]
        coeffs = [(A * C - E * G), 0.0, (E * H - A * D), 0.0,
                  (F * G - B * C), 0.0, (B * D - F * H)]
        nu_zero = _nearest_positive_real_root(coeffs, float(freqs_np.mean()))
        return [jnp.asarray(nu_zero), jnp.asarray(nu_zero), nu_tau]

    if ff == (1, 1, 1, 1, 0):  # pptoaslib.py:837-892, host polynomial
        Hn_np = np.asarray(Hn)[:4, :4]
        freqs_np = np.asarray(freqs)
        Hij = Hn_np.sum(axis=-1)
        nuDM = float(nu_DM)
        nuGM = float(nu_GM)
        t2 = freqs_np ** -2 - (0.0 if np.isinf(nuDM) else nuDM ** -2)
        t4 = freqs_np ** -4 - (0.0 if np.isinf(nuGM) else nuGM ** -4)
        H14, H44 = Hij[3, 0], Hij[3, 3]
        if option == 0:
            H21_n, H23_n, H24_n = (Hn_np[1, 0] / t2, Hn_np[1, 2] / t2,
                                   Hn_np[1, 3] / t2)
            H31_n, H33_n, H34_n = (Hn_np[2, 0] / t4, Hn_np[2, 2] / t4,
                                   Hn_np[2, 3] / t4)
            A, a = (freqs_np ** -4 * H34_n).sum(), H34_n.sum()
            B, b = (freqs_np ** -2 * H21_n).sum(), H21_n.sum()
            C, c = (freqs_np ** -4 * H31_n).sum(), H31_n.sum()
            D, d = (freqs_np ** -2 * H23_n).sum(), H23_n.sum()
            E, e = (freqs_np ** -4 * H33_n).sum(), H33_n.sum()
            F, f = (freqs_np ** -2 * H24_n).sum(), H24_n.sum()
            P5 = A * A * B + H44 * C * D + H14 * E * F - H44 * B * E - \
                A * C * F - H14 * A * D
            P4 = -A * A * b - H44 * C * d - H14 * E * f + H44 * b * E + \
                A * C * f + H14 * A * d
            P3 = -2 * A * a * B - H44 * c * D - H14 * e * F + H44 * B * e + \
                (A * c + a * C) * F + H14 * a * D
            P2 = 2 * A * a * b + H44 * c * d + H14 * e * f - H44 * b * e - \
                (A * c + a * C) * f - H14 * a * d
            P1 = a * a * B - a * c * F
            P0 = -a * a * b + a * c * f
            coeffs = [P5, P4, P3, P2, P1, P0]
        elif option == 1:
            H21_n, H22_n, H24_n = (Hn_np[1, 0] / t2, Hn_np[1, 1] / t2,
                                   Hn_np[1, 3] / t2)
            H31_n, H32_n, H34_n = (Hn_np[2, 0] / t4, Hn_np[2, 1] / t4,
                                   Hn_np[2, 3] / t4)
            A, a = (freqs_np ** -2 * H24_n).sum(), H24_n.sum()
            B, b = (freqs_np ** -4 * H31_n).sum(), H31_n.sum()
            C, c = (freqs_np ** -2 * H21_n).sum(), H21_n.sum()
            D, d = (freqs_np ** -4 * H32_n).sum(), H32_n.sum()
            E, e = (freqs_np ** -2 * H22_n).sum(), H22_n.sum()
            F, f = (freqs_np ** -4 * H34_n).sum(), H34_n.sum()
            P4 = A * A * B + H44 * C * D + H14 * E * F - H44 * B * E - \
                A * C * F - H14 * A * D
            P3 = -2 * A * a * B - H44 * c * D - H14 * e * F + H44 * B * e + \
                (A * c + a * C) * F + H14 * a * D
            P2 = -(A * A * b - a * a * B) - H44 * C * d - H14 * E * f + \
                H44 * b * E + (A * C * f - a * c * F) + H14 * A * d
            P1 = 2 * A * a * b + H44 * c * d + H14 * e * f - H44 * b * e - \
                (A * c + a * C) * f - H14 * a * d
            P0 = -a * a * b + a * c * f
            coeffs = [P4, P3, P2, P1, P0]
        else:
            return [nu_DM, nu_GM, nu_tau]
        # roots are in u = nu^2 for this branch (reference takes roots**0.5)
        roots = np.roots(coeffs)
        roots = np.real(roots[np.imag(roots) == 0.0])
        roots = roots[roots > 0.0] ** 0.5
        mean_f = float(freqs_np.mean())
        if len(roots) == 0:
            return [nu_DM, nu_GM, nu_tau]
        nu_zero = roots[np.argmin(np.abs(mean_f - roots))]
        return [jnp.asarray(nu_zero), jnp.asarray(nu_zero), nu_tau]

    # no zero-covariance frequencies for this flag combination
    return [nu_DM, nu_GM, nu_tau]


def _nearest_positive_real_root(coeffs, target):
    roots = np.roots(coeffs)
    roots = np.real(roots[np.imag(roots) == 0.0])
    roots = roots[roots > 0.0]
    if len(roots) == 0:
        return target
    return roots[np.argmin(np.abs(target - roots))]
