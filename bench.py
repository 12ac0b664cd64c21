#!/usr/bin/env python
"""Headline benchmark: wideband (phi, DM) portrait fits/sec/chip.

Config from BASELINE.json: 4096 channels x 2048 bins, batched 5-parameter
fitter restricted to (phi, DM), float32 on the TPU chip (float64 FFTs are
unsupported on TPU).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fits/sec/chip", "vs_baseline": N}
vs_baseline is value / 1e4 (the BASELINE.json north-star target).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NCHAN = int(os.environ.get("PP_BENCH_NCHAN", 4096))
NBIN = int(os.environ.get("PP_BENCH_NBIN", 2048))
BATCH = int(os.environ.get("PP_BENCH_BATCH", 128))
REPS = int(os.environ.get("PP_BENCH_REPS", 10))
# PP_BENCH_I2=1 times the int16-native ingest path (what campaigns
# actually feed the chip: raw i2 samples + per-channel DAT_SCL,
# dequantized inside the fused setup kernel — half the setup read
# bytes).  Quantization happens outside the timed region, like the
# file codec's.  Default stays the f32-upload path.
I2 = os.environ.get("PP_BENCH_I2", "0") not in ("0", "false")


def _backend_alive(timeout_s=240):
    """Probe default-backend init in a subprocess; the remote-TPU tunnel
    can hang indefinitely inside C code where no signal can interrupt."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-u", "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        return "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax

    global BATCH, REPS
    if not _backend_alive():
        print("bench: default backend unreachable, falling back to CPU",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        BATCH, REPS = min(BATCH, 2), 1

    # persistent compilation cache: repeated bench runs skip the XLA
    # compile (first TPU compile of the batched fitter is tens of seconds)
    cache_dir = os.environ.get("PP_JAX_CACHE",
                               "/tmp/pp_jax_compilation_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from pulseportraiture_tpu.fitters.portrait import fit_portrait_full_batch

    rng = np.random.default_rng(0)
    freqs = np.linspace(1100.0, 1900.0, NCHAN)
    x = (np.arange(NBIN) + 0.5) / NBIN
    prof = np.exp(-0.5 * ((x - 0.4) / 0.02) ** 2) + \
        0.4 * np.exp(-0.5 * ((x - 0.47) / 0.01) ** 2)
    model = (prof[None, :] * (freqs[:, None] / 1500.0) ** -1.5).astype(
        np.float32)
    noise = 0.1
    P = 0.003

    # realistic per-item injected shifts
    phis = rng.uniform(-0.01, 0.01, BATCH)
    dms = rng.uniform(-2e-4, 2e-4, BATCH)
    data = np.empty((BATCH, NCHAN, NBIN), np.float32)
    k = 2j * np.pi * np.arange(NBIN // 2 + 1)
    from pulseportraiture_tpu.config import DCONST
    mfft = np.fft.rfft(model, axis=-1)
    nu_fit = freqs.mean()
    for i in range(BATCH):
        shift = phis[i] + DCONST * dms[i] / P * (freqs ** -2 -
                                                 nu_fit ** -2)
        data[i] = np.fft.irfft(mfft * np.exp(-k * shift[:, None]),
                               n=NBIN, axis=-1)
    data += rng.normal(0, noise, data.shape).astype(np.float32)

    scales = None
    if I2:
        from pulseportraiture_tpu.io import native
        raw, scl, _offs = native.quantize_i2(
            data.reshape(BATCH * NCHAN, NBIN))
        # per-profile offsets feed only the DC harmonic, which F0_FACT
        # zeroing discards (io/archive.py raw_i2 ingest convention)
        data = raw.reshape(BATCH, NCHAN, NBIN)
        scales = jax.device_put(jnp.asarray(
            scl.reshape(BATCH, NCHAN), jnp.float32))
    data = jax.device_put(jnp.asarray(data))
    # 2-D shared model: the production fast path (one template per
    # archive); the model DFT and M2 are computed once per batch.
    model_j = jax.device_put(jnp.asarray(model))
    Ps = jnp.full(BATCH, P, jnp.float32)
    freqs_j = jnp.asarray(freqs, jnp.float32)
    errs = jnp.full((BATCH, NCHAN), noise, jnp.float32)
    nu_fits = jnp.full((BATCH, 3), nu_fit, jnp.float32)
    init = jnp.zeros((BATCH, 5), jnp.float32)

    # model-band harmonic cap (ops/ct_dft.band_cap_model_ft): the host
    # f64 model FT, cleaned at 1e-6 relative, caps the stored CT
    # spectrum at the template's true band — the production model feed
    # (pipelines compute the same host-side).  PP_BENCH_MHARM=0 opts
    # out (full NH storage).
    model_ft_arg, mharm = None, None
    if os.environ.get("PP_BENCH_MHARM", "1") not in ("0", "false"):
        from pulseportraiture_tpu.ops.ct_dft import band_cap_model_ft
        mf64 = np.fft.rfft(model.astype(np.float64), axis=-1)
        mr_c, mi_c, mharm = band_cap_model_ft(mf64.real, mf64.imag, NBIN)
        if mharm is not None:
            model_ft_arg = (jax.device_put(jnp.asarray(mr_c)),
                            jax.device_put(jnp.asarray(mi_c)))

    def make_run(mft, mh):
        # seed_phase/seed_dm=True performs the production seeding
        # in-program (pipelines/toas.py): a brute band-summed phase
        # guess plus the half-band-difference DM guess, both fused
        # into the setup kernel on TPU — zero extra passes over the
        # spectra, one dispatch per batch (PP_SEED_DM=0 opts out,
        # matching the pipeline's gate)
        seed_dm = os.environ.get("PP_SEED_DM", "1") not in ("0", "false")

        def run():
            return fit_portrait_full_batch(data, model_j, init, Ps,
                                           freqs_j, errs, nu_fits=nu_fits,
                                           fit_flags=(1, 1, 0, 0, 0),
                                           log10_tau=False, max_iter=30,
                                           fft_matmul=True,
                                           scattering=False,
                                           dft_precision="high",
                                           seed_phase=True,
                                           seed_dm=seed_dm, scales=scales,
                                           model_ft_ri=mft, mharm=mh)
        return run

    def measure(run):
        """(fits/s, sec/batch, max|dphi|, mean niter) for one variant."""
        res = run()  # compile + warmup
        np.asarray(res.params)  # full fetch: block_until_ready alone
        # can return before remote execution finishes on tunneled backends
        params = np.asarray(res.params)
        nu_out = np.asarray(res.nu_DM)
        from pulseportraiture_tpu.ops.transform import phase_transform
        phi_back = np.asarray(jax.vmap(
            lambda p, d, n: phase_transform(p, d, n, jnp.float32(nu_fit),
                                            jnp.float32(P), mod=True))(
            jnp.asarray(params[:, 0]), jnp.asarray(params[:, 1]),
            jnp.asarray(nu_out)))
        max_dphi = np.abs(phi_back - phis).max()
        # pipelined timing: queue REPS executions, sync once — the
        # remote-tunnel dispatch latency (~30 ms/call) otherwise dominates
        t0 = time.time()
        rs = [run() for _ in range(max(REPS, 1))]
        np.asarray(rs[-1].params)
        dt = (time.time() - t0) / max(REPS, 1)
        return (BATCH / dt, dt, float(max_dphi),
                float(np.asarray(res.niter).mean()))

    # the official number is the production (capped) configuration, but
    # every run also records the full-band (uncapped) number so the
    # official record can't drift template-flattering: a wide or
    # data-derived template gets the uncapped rate (VERDICT r3 weak #2)
    fits_per_sec, dt, max_dphi, mniter = measure(
        make_run(model_ft_arg, mharm))
    if mharm is not None:
        fps_uncapped, _, dphi_unc, _ = measure(make_run(None, None))
    else:
        fps_uncapped, dphi_unc = fits_per_sec, max_dphi
    print(json.dumps({
        "metric": "portrait fits (phase+DM)/sec/chip at "
                  f"{NCHAN}ch x {NBIN}bin",
        "value": round(fits_per_sec, 2),
        "unit": "fits/sec/chip",
        "vs_baseline": round(fits_per_sec / 1e4, 4),
        "value_uncapped": round(fps_uncapped, 2),
        "extra": {"batch": BATCH, "sec_per_batch": round(dt, 4),
                  "max_abs_dphi_vs_injected": max_dphi,
                  "max_abs_dphi_uncapped": dphi_unc,
                  "mean_niter": mniter,
                  "ingest": "int16" if I2 else "float32",
                  "mharm": mharm,
                  "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
