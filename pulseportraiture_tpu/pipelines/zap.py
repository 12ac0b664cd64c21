"""Channel zapping (the ppzap tool).

Model-free path: iterative median/sigma clipping on per-channel noise
levels (reference ppzap.py:18-48).  Model-based path: run the full TOA
pipeline and flag channels by red-chi2 / channel S/N via
GetTOAs.get_channels_to_zap.  Instead of printing PSRCHIVE `paz` commands
(ppzap.py:50-95), zap masks can be applied directly to archives.
"""

from __future__ import annotations

import numpy as np

from pulseportraiture_tpu.io.archive import load_data, unload_new_archive


def get_zap_channels(noise_stds, nstd=3.0, maxiter=20):
    """Iterative median + nstd*std clip on per-channel noise levels.

    noise_stds: (nchan,) noise estimates (zero entries = already dead).
    Returns the list of channel indices to zap.
    Reference: ppzap.py:18-48.
    """
    noise = np.asarray(noise_stds, dtype=float).copy()
    alive = noise > 0
    zap = []
    for _ in range(maxiter):
        vals = noise[alive]
        if len(vals) < 3:
            break
        med = np.median(vals)
        std = vals.std()
        bad = alive & (noise > med + nstd * std)
        if not bad.any():
            break
        zap.extend(np.where(bad)[0].tolist())
        alive &= ~bad
    return sorted(zap)


def zap_archive(datafile, outfile, nstd=3.0, per_subint=False,
                normalize=False, quiet=True):
    """Model-free zap: clip noisy channels and write a masked archive.

    Reference: ppzap.py model-free __main__ path (ppzap.py:98-241).
    """
    import jax.numpy as jnp
    data = load_data(datafile, rm_baseline=True, pscrunch=True, quiet=True)
    weights = data.weights.copy()
    all_zaps = []
    for isub in range(data.nsub):
        noise = data.noise_stds[isub, 0].copy()
        if normalize:
            from pulseportraiture_tpu.ops.normalize import \
                normalize_portrait
            port, norms = normalize_portrait(
                jnp.asarray(data.subints[isub, 0]), method="mean",
                return_norms=True)
            noise = noise / np.asarray(norms)
        noise = np.where(weights[isub] > 0, noise, 0.0)
        zap = get_zap_channels(noise, nstd=nstd)
        all_zaps.append(zap)
        weights[isub, zap] = 0.0
    if not per_subint:
        # union of per-subint zaps applied everywhere
        union = sorted({c for z in all_zaps for c in z})
        weights[:, union] = 0.0
    unload_new_archive(data.subints, data.arch, outfile, DM=data.DM,
                       dmc=int(data.dmc), weights=weights, quiet=quiet)
    return all_zaps


def zap_channels_from_fit(gt, SNR_threshold=8.0, rchi2_threshold=1.3):
    """Model-based zap list from a completed GetTOAs run.

    Reference: ppzap.py model path + pptoas.py:1208-1285.
    """
    return gt.get_channels_to_zap(SNR_threshold=SNR_threshold,
                                  rchi2_threshold=rchi2_threshold)
