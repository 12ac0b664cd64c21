"""Power-law spectrum fit and DM-from-frequency-residuals fit.

Reference: pplib.py:1763-1840 (lmfit power-law; weighted polyfit of
residuals vs nu^-2 including the zero-crossing reference frequency).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pulseportraiture_tpu.config import DCONST
from pulseportraiture_tpu.models.gaussian import levenberg_marquardt
from pulseportraiture_tpu.utils import DataBunch


def fit_powlaw(data, init_params, errs, freqs, nu_ref):
    """Fit F(nu) = A*(nu/nu_ref)**alpha.  Reference: pplib.py:1763-1802."""
    data = jnp.asarray(data, dtype=float)
    errs_b = jnp.broadcast_to(jnp.asarray(errs, dtype=float), data.shape)
    freqs = jnp.asarray(freqs, dtype=float)

    def residual(p):
        return (data - p[0] * (freqs / nu_ref) ** p[1]) / errs_b

    res = levenberg_marquardt(residual, jnp.asarray(init_params,
                                                    dtype=float),
                              jnp.asarray([-jnp.inf, -jnp.inf]),
                              jnp.asarray([jnp.inf, jnp.inf]),
                              jnp.ones(2))
    import jax
    J = np.asarray(jax.jacfwd(residual)(res.x))
    dof = data.shape[0] - 2
    try:
        cov = np.linalg.inv(J.T @ J)
        # lmfit's default scale_covar=True: stderr scaled by red_chi2
        # (the reference's fit_powlaw uses lmfit defaults,
        # pplib.py:1787)
        scale = float(res.chi2) / max(dof, 1)
        perr = np.sqrt(np.clip(np.diag(cov) * scale, 0, None))
    except np.linalg.LinAlgError:
        perr = np.zeros(2)
    residuals = np.asarray(residual(res.x)) * np.asarray(errs_b)
    return DataBunch(alpha=float(res.x[1]), alpha_err=float(perr[1]),
                     amp=float(res.x[0]), amp_err=float(perr[0]),
                     residuals=residuals, nu_ref=nu_ref,
                     chi2=float(res.chi2), dof=dof,
                     red_chi2=float(res.chi2) / max(dof, 1))


def fit_DM_to_freq_resids(freqs, frequency_residuals, errs, dconst=DCONST):
    """Weighted linear fit res = a*nu^-2 + b -> (DM, offset, nu_ref).

    Reference: pplib.py:1804-1840.
    """
    freqs = np.asarray(freqs, dtype=float)
    y = np.asarray(frequency_residuals, dtype=float)
    errs = np.asarray(errs, dtype=float)
    x = freqs ** -2
    w = errs ** -2
    p, V = np.polyfit(x=x, y=y, deg=1, w=w, cov=True)
    a, b = p[0], p[1]
    DM = a / dconst
    offset = b
    nu_ref = (-b / a) ** -0.5 if -b / a > 0 else np.nan
    a_err, b_err = np.sqrt(np.diag(V))
    cov = V.ravel()[1]
    DM_err = a_err / dconst
    nu_ref_err = (((nu_ref ** 2) / 4.0) *
                  ((a_err / a) ** 2 + (b_err / b) ** 2 -
                   2 * cov / (a * b))) ** 0.5 if np.isfinite(nu_ref) \
        else np.nan
    residuals = y - (a * x + b)
    chi2 = float(((residuals / errs) ** 2).sum())
    dof = len(y) - 2
    return DataBunch(DM=DM, DM_err=DM_err, offset=offset,
                     offset_err=b_err, nu_ref=nu_ref,
                     nu_ref_err=nu_ref_err, ab_cov=cov,
                     residuals=residuals, chi2=chi2, dof=dof,
                     red_chi2=chi2 / max(dof, 1))


def powlaw(nu, nu_ref, A, alpha):
    """Power-law spectrum A*(nu/nu_ref)**alpha.  Reference: pplib.py:1048."""
    return A * (nu / nu_ref) ** alpha


def powlaw_integral(nu2, nu1, nu_ref, A, alpha):
    """Definite integral of the power law from nu1 to nu2.

    Reference: pplib.py:1054-1066 (log form at alpha == -1).
    """
    alpha = float(alpha)
    if alpha == -1.0:
        return A * nu_ref * np.log(nu2 / nu1)
    c = 1.0 + alpha
    return A * nu_ref ** -alpha * (nu2 ** c - nu1 ** c) / c


def powlaw_freqs(lo, hi, N, alpha, mid=False):
    """Channel-edge (or center, mid=True) frequencies giving equal flux
    per channel under a power-law spectrum.

    Reference: pplib.py:1068-1096.
    """
    alpha = float(alpha)
    if alpha == -1.0:
        edges = np.exp(np.linspace(np.log(lo), np.log(hi), N + 1))
    else:
        c = 1.0 + alpha
        edges = np.linspace(lo ** c, hi ** c, N + 1) ** (1.0 / c)
    if mid:
        return 0.5 * (edges[:-1] + edges[1:])
    return edges
