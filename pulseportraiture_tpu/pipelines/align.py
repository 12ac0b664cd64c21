"""Iterative multi-epoch alignment and averaging (the ppalign tool).

align_archives mirrors the reference (ppalign.py:54-243): iterate over
archives/subints, fit (phi, DM) of each subint against the current
template with the wideband fitter, rotate, and accumulate a
weights/sigma^2-weighted average; the average becomes the next template.
The PSRCHIVE psradd/psrsmooth shell-outs are replaced by in-framework
averaging and wavelet smoothing.
"""

from __future__ import annotations

import numpy as np

from pulseportraiture_tpu.io.archive import load_data, unload_new_archive


def average_archives(metafile_or_list, outfile, tscrunch=True,
                     pscrunch=True, quiet=True):
    """Weight-average archives phase-aligned by header ephemeris only
    (the psradd replacement used to build initial templates,
    ppalign.py:21-35)."""
    from pulseportraiture_tpu.pipelines.toas import _resolve_datafiles
    files = _resolve_datafiles(metafile_or_list)
    acc = None
    wacc = None
    first = None
    for f in files:
        data = load_data(f, dededisperse=False, tscrunch=tscrunch,
                         pscrunch=pscrunch, rm_baseline=True, quiet=True)
        if first is None:
            first = data
        w = data.weights[:, :, None] * data.noise_stds[:, 0][:, :, None] \
            ** -2.0
        w = np.where(np.isfinite(w), w, 0.0)
        contrib = (data.subints[:, 0] * w).sum(0)
        wsum = w.sum(0)
        if acc is None:
            acc, wacc = contrib, wsum
        else:
            acc = acc + contrib
            wacc = wacc + wsum
    avg = acc / np.where(wacc > 0, wacc, 1.0)
    arch = first.arch.copy()
    arch.tscrunch()
    arch.pscrunch()
    weights_out = (wacc[:, 0] > 0).astype(float)[None]
    unload_new_archive(avg[None, None], arch, outfile, DM=first.DM,
                       dmc=0, weights=weights_out, quiet=quiet)
    return outfile


def psrsmooth_archive(archive, outfile=None, quiet=True):
    """Wavelet-smooth an archive's profiles (psrsmooth -W replacement,
    ppalign.py:38-52)."""
    from pulseportraiture_tpu.models.wavelet import smart_smooth
    from pulseportraiture_tpu.io.psrfits import read_psrfits, write_psrfits
    arch = read_psrfits(archive)
    nsub, npol, nchan, nbin = arch.data.shape
    sm = np.zeros_like(arch.data)
    for isub in range(nsub):
        for ipol in range(npol):
            sm[isub, ipol] = np.asarray(smart_smooth(arch.data[isub, ipol]))
    arch.data = sm
    out = outfile or (archive + ".sm")
    write_psrfits(out, arch, quiet=quiet)
    return out


def align_archives(metafile=None, datafiles=None, initial_guess=None,
                   tscrunch=False, pscrunch=True, outfile="aligned.port",
                   norm=None, fit_dm=True, niter=1, quiet=True,
                   SNR_cutoff=0.0, place=None, smooth=False, rot_phase=0.0):
    """Iteratively align archives to a template and average them.

    Reference: ppalign.py:54-243.  initial_guess is an archive whose
    tscrunched/pscrunched portrait seeds the template.
    """
    import jax.numpy as jnp
    from pulseportraiture_tpu.fitters.phase_shift import fit_phase_shift
    from pulseportraiture_tpu.fitters.portrait import fit_portrait_full
    from pulseportraiture_tpu.ops.rotate import (rotate_portrait,
        rotate_portrait_np)
    from pulseportraiture_tpu.ops.transform import guess_fit_freq
    from pulseportraiture_tpu.pipelines.toas import _resolve_datafiles

    if datafiles is None:
        datafiles = _resolve_datafiles(metafile)
    if initial_guess is None:
        initial_guess = datafiles[0]
    # the template must be dedispersed (reference ppalign.py:103-106 loads
    # the initial guess with dedisperse=True); epoch data stay in their
    # stored state and carry DM_guess into the fit instead
    tmpl_data = load_data(initial_guess, dedisperse=True, tscrunch=True,
                          pscrunch=True, rm_baseline=True, quiet=True)
    template = tmpl_data.subints[0, 0].copy()
    tmpl_freqs = tmpl_data.freqs[0]
    nchan_t, nbin = template.shape

    niter = max(1, int(niter))
    npol_out = 1 if pscrunch else 4
    load_cache = []
    for f in datafiles:
        try:
            load_cache.append(load_data(f, dededisperse=False,
                                        tscrunch=tscrunch,
                                        pscrunch=pscrunch,
                                        rm_baseline=True, quiet=True))
        except (OSError, ValueError, KeyError) as exc:
            print(f"Skipping {f}: {exc}")

    for it in range(niter):
        aligned = np.zeros((npol_out,) + template.shape)
        wsum = np.zeros(nchan_t)
        for data in load_cache:
            if data.subints.shape[1] < npol_out:
                print(f"{data.source}: npol < {npol_out}; skipping")
                continue
            for isub in data.ok_isubs:
                P = data.Ps[isub]
                freqs = data.freqs[isub]
                port = data.subints[isub, 0]
                weights = data.weights[isub]
                errs = np.where(weights > 0,
                                data.noise_stds[isub, 0], 0.0)
                okc = data.ok_ichans[isub]
                if not len(okc):
                    continue
                # match template channels by nearest frequency
                # (ppalign.py:161-172)
                if len(freqs) != nchan_t or \
                        not np.allclose(freqs, tmpl_freqs):
                    idx = np.array([np.argmin(np.abs(tmpl_freqs - f))
                                    for f in freqs])
                    model = template[idx]
                else:
                    idx = None
                    model = template
                DM_guess = data.DM if not data.dmc else 0.0
                nu_fit = float(guess_fit_freq(
                    jnp.asarray(freqs[okc]),
                    jnp.asarray(data.SNRs[isub, 0][okc])))
                # base rotation at host float64: the device fit solves a
                # small residual dDM around the header DM (see
                # pipelines/toas.py for the precision rationale)
                port_fit = rotate_portrait_np(port, 0.0, DM_guess, P,
                                              freqs, nu_fit)
                mean_prof = port_fit[okc].mean(0)
                pg = fit_phase_shift(jnp.asarray(mean_prof),
                                     jnp.asarray(model[okc].mean(0)),
                                     Ns=nbin)
                if len(okc) > 1:
                    res, _ = fit_portrait_full(
                        jnp.asarray(port_fit), jnp.asarray(model),
                        jnp.asarray([float(pg.phase), 0.0, 0.0, 0.0,
                                     0.0]),
                        P, jnp.asarray(freqs),
                        nu_fits=(nu_fit, nu_fit, nu_fit),
                        nu_outs=(nu_fit, nu_fit, nu_fit),
                        errs=jnp.asarray(errs),
                        fit_flags=(1, int(fit_dm), 0, 0, 0),
                        log10_tau=False, quiet=True, scattering=False)
                    phi, dDM_fit = float(res.phi), float(res.DM)
                    scales = np.asarray(res.scales)
                    if float(res.snr) < SNR_cutoff:
                        continue
                else:  # single-channel fallback (ppalign.py:196-201)
                    phi, dDM_fit = float(pg.phase), 0.0
                    scales = np.full(len(freqs), float(pg.scale))
                w = np.where(errs > 0, scales / np.where(errs > 0, errs,
                                                         1.0) ** 2, 0.0)
                for ipol in range(npol_out):
                    # rotate base-rotated data by the small residual:
                    # equals rotating the original by the full
                    # (phi, DM_guess + dDM) at nu_fit, at f64 precision
                    if ipol == 0:
                        pol_base = port_fit
                    else:
                        pol_base = rotate_portrait_np(
                            data.subints[isub, ipol], 0.0, DM_guess, P,
                            freqs, nu_fit)
                    rotated = rotate_portrait_np(pol_base, phi, dDM_fit,
                                                 P, freqs, nu_fit)
                    if idx is None:
                        aligned[ipol] += rotated * w[:, None]
                    else:
                        # scatter-add into the matched template rows
                        # (grids differ; duplicates accumulate)
                        np.add.at(aligned[ipol], idx,
                                  rotated * w[:, None])
                if idx is None:
                    wsum += w
                else:
                    np.add.at(wsum, idx, w)
        aligned = aligned / np.where(wsum > 0, wsum, 1.0)[None, :, None]
        template = aligned[0]

    if norm is not None:
        # normalization factors come from total intensity and apply to
        # every polarization
        from pulseportraiture_tpu.ops.normalize import normalize_portrait
        _, norms = normalize_portrait(jnp.asarray(aligned[0]), method=norm,
                                      return_norms=True)
        norms = np.where(np.asarray(norms) != 0.0, np.asarray(norms), 1.0)
        aligned = aligned / norms[None, :, None]
    if rot_phase:
        aligned = np.stack([np.asarray(rotate_portrait(
            jnp.asarray(p), rot_phase)) for p in aligned])
    if place is not None:
        # rotate the peak to a chosen phase via a narrow-Gaussian fit
        # (ppalign.py:222-226)
        from pulseportraiture_tpu.ops.gaussian import gaussian_profile
        mean_prof = aligned[0].mean(0)
        narrow = np.asarray(gaussian_profile(nbin, place, 0.01))
        pg = fit_phase_shift(jnp.asarray(mean_prof), jnp.asarray(narrow),
                             Ns=nbin)
        aligned = np.stack([np.asarray(rotate_portrait(
            jnp.asarray(p), float(pg.phase))) for p in aligned])
    if smooth:
        from pulseportraiture_tpu.models.wavelet import smart_smooth
        aligned = np.stack([np.asarray(smart_smooth(p)) for p in aligned])

    # unload with DM=0 and 0/1 weights (ppalign.py:227-243)
    arch = tmpl_data.arch.copy()
    if npol_out == 4:
        arch.state = "Stokes"
    weights_out = (wsum > 0).astype(float)[None]
    unload_new_archive(aligned[None], arch, outfile, DM=0.0, dmc=0,
                       weights=weights_out, quiet=quiet)
    return outfile
