"""Per-channel portrait normalization.

Reference: pplib.py:2462-2507 (normalize_portrait function).  Methods:
'mean', 'max', 'prof' (scale from a phase fit against the weighted mean
profile), 'rms' (noise -> 1), 'abs' (unit vector norm).  Zero channels are
left untouched and report norm 1.
"""

from __future__ import annotations

import jax.numpy as jnp

from pulseportraiture_tpu.ops.noise import get_noise_PS

_METHODS = ("mean", "max", "prof", "rms", "abs")


def normalize_portrait(port, method="rms", weights=None, return_norms=False):
    port = jnp.asarray(port)
    active = jnp.any(port != 0.0, axis=-1)
    if method == "mean":
        norms = port.mean(axis=-1)
    elif method == "max":
        norms = port.max(axis=-1)
    elif method == "rms":
        norms = get_noise_PS(port, chans=True)
    elif method == "abs":
        norms = jnp.sqrt((port ** 2).sum(axis=-1))
    elif method == "prof":
        # scale of each profile against the weighted mean profile, via the
        # vmapped Fourier-domain phase fit (reference pplib.py:2496-2497).
        from pulseportraiture_tpu.fitters.phase_shift import fit_phase_shift_batch
        good = port.sum(axis=-1) != 0.0
        if weights is None:
            w = good.astype(port.dtype)
        else:
            w = jnp.asarray(weights) * good.astype(port.dtype)
        mean_prof = (port * w[:, None]).sum(axis=0) / w.sum()
        res = fit_phase_shift_batch(port, jnp.broadcast_to(mean_prof,
                                                           port.shape))
        norms = res.scale
    else:
        raise ValueError(f"Unknown normalize_portrait method {method!r}")
    safe = jnp.where(active & (norms != 0.0), norms, 1.0)
    out = jnp.where(active[:, None], port / safe[:, None], port)
    norms = jnp.where(active, safe, 1.0)
    if return_norms:
        return out, norms
    return out
