#!/usr/bin/env python
"""Component timings (default B=32; --batch N) for the headline fit at 4096x2048, on-chip.

Times, with the bench's exact operands: the fused CT setup (with seed
outputs), one full fgh evaluation (Pallas CT moments + stats), the same
with bf16-stored spectra, and the complete fit at f32 vs bf16 stats
(the VERDICT r2 weak-#7 re-measure).  Pipelined timing per CLAUDE.md.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=32)
_ap.add_argument("--cap", action="store_true",
                 help="also time the model-band harmonic-cap variants "
                 "(capped ct_setup+seed, capped fgh, capped full fit)")
_args = _ap.parse_args()
NCHAN, NBIN, B = 4096, 2048, _args.batch


def timed(fn, fetch, args=(), reps=8):
    fetch(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    fetch(outs[-1])
    return (time.time() - t0) / reps


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pp_jax_compilation_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from pulseportraiture_tpu.config import DCONST
    from pulseportraiture_tpu.fitters import stats
    from pulseportraiture_tpu.fitters.portrait import (
        _brute_phase_seed, fit_portrait_full_batch)
    from pulseportraiture_tpu.ops.ct_dft import (ct_kvec, ct_setup,
                                                 permute_spectrum)

    rng = np.random.default_rng(0)
    freqs = np.linspace(1100.0, 1900.0, NCHAN)
    x = (np.arange(NBIN) + 0.5) / NBIN
    prof = np.exp(-0.5 * ((x - 0.4) / 0.02) ** 2) + \
        0.4 * np.exp(-0.5 * ((x - 0.47) / 0.01) ** 2)
    model = (prof[None, :] * (freqs[:, None] / 1500.0) ** -1.5).astype(
        np.float32)
    noise, P = 0.1, 0.003
    nu_fit = freqs.mean()
    phis0 = rng.uniform(-0.01, 0.01, B)
    dms0 = rng.uniform(-2e-4, 2e-4, B)
    k = 2j * np.pi * np.arange(NBIN // 2 + 1)
    mfft = np.fft.rfft(model, axis=-1)
    data = np.empty((B, NCHAN, NBIN), np.float32)
    for i in range(B):
        shift = phis0[i] + DCONST * dms0[i] / P * (freqs ** -2 -
                                                   nu_fit ** -2)
        data[i] = np.fft.irfft(mfft * np.exp(-k * shift[:, None]),
                               n=NBIN, axis=-1)
    data += rng.normal(0, noise, data.shape).astype(np.float32)
    data = jax.device_put(jnp.asarray(data))
    model_j = jax.device_put(jnp.asarray(model))
    errs = jnp.full((B, NCHAN), noise, jnp.float32)
    w_host = np.full((B, NCHAN),
                     (noise * np.sqrt(NBIN / 2.0)) ** -2.0, np.float32)
    w = jax.device_put(jnp.asarray(w_host))

    mr, mi = stats.model_ft(model_j, fft_matmul=True,
                            dft_precision="highest")
    mrp, mip = permute_spectrum(mr, mi, NBIN)
    mrp = jax.device_put(mrp)
    mip = jax.device_put(mip)
    kvec = jnp.asarray(ct_kvec(NBIN))

    # ---- 1. fused CT setup + seed outputs, B=32 ----
    f_setup = jax.jit(lambda d, a, b, ww: ct_setup(
        d, a, b, f0_fact=False, dft_precision="high", w=ww))
    dt = timed(f_setup, lambda o: np.asarray(o[2][:, :2]),
               (data, mrp, mip, w))
    print(f"B{B} ct_setup+seed   {dt*1e3:7.2f} ms", flush=True)
    Grp, Gip, sd, gsr, gsi = f_setup(data, mrp, mip, w)

    f_seed = jax.jit(lambda a, b: _brute_phase_seed(a, b, kvec))
    dt = timed(f_seed, lambda o: np.asarray(o[:2]), (gsr, gsi))
    print(f"B{B} brute seed      {dt*1e3:7.2f} ms", flush=True)

    if _args.cap:
        from pulseportraiture_tpu.ops.ct_dft import band_cap_model_ft
        mf64 = np.fft.rfft(np.asarray(model, np.float64), axis=-1)
        mrc, mic, mh = band_cap_model_ft(mf64.real, mf64.imag, NBIN)
        assert mh is not None, "bench model should cap"
        mrpc, mipc = permute_spectrum(jnp.asarray(mrc, jnp.float32),
                                      jnp.asarray(mic, jnp.float32),
                                      NBIN, mharm=mh)
        mrpc = jax.device_put(mrpc)
        mipc = jax.device_put(mipc)
        kvec_c = jnp.asarray(ct_kvec(NBIN, mharm=mh))
        f_setup_c = jax.jit(lambda d, a, b, ww: ct_setup(
            d, a, b, f0_fact=False, dft_precision="high", w=ww,
            mharm=mh))
        dtc = timed(f_setup_c, lambda o: np.asarray(o[2][:, :2]),
                    (data, mrpc, mipc, w))
        print(f"B{B} ct_setup cap(mharm={mh}) {dtc*1e3:7.2f} ms",
              flush=True)
        Grc, Gic, sdc, gsrc, gsic = f_setup_c(data, mrpc, mipc, w)
        f_seed_c = jax.jit(lambda a, b: _brute_phase_seed(a, b, kvec_c))
        dtc = timed(f_seed_c, lambda o: np.asarray(o[:2]), (gsrc, gsic))
        print(f"B{B} brute seed cap  {dtc*1e3:7.2f} ms", flush=True)

    # ---- 2. one full fgh evaluation (what each Newton iter costs) ----
    M2 = mrp * mrp + mip * mip
    S0 = jnp.sum(M2, axis=-1)
    Sd = jnp.sum(w * sd, axis=-1)
    dt32 = jnp.float32
    setup_b = stats.FitSetup(
        Gr=Grp, Gi=Gip, M2=M2, w=w,
        freqs=jnp.broadcast_to(jnp.asarray(freqs, dt32), (B, NCHAN)),
        P=jnp.full(B, P, dt32), nu_DM=jnp.full(B, nu_fit, dt32),
        nu_GM=jnp.full(B, nu_fit, dt32), nu_tau=jnp.full(B, nu_fit, dt32),
        Sd=Sd, S0=S0, nbin=NBIN, kvec=kvec)
    axes = stats.FitSetup(Gr=0, Gi=0, M2=None, w=0, freqs=0, P=0,
                          nu_DM=0, nu_GM=0, nu_tau=0, Sd=0, S0=None,
                          nbin=None, kvec=None)
    xs = jnp.zeros((B, 5), dt32)

    def fgh(sb, x):
        return jax.vmap(
            lambda s, xx: stats.chi2_value_grad_hess(
                xx, s, fit_flags=(1, 1, 0, 0, 0), log10_tau=False,
                scattering=False, use_pallas=None),
            in_axes=(axes, 0))(sb, x)

    f_fgh = jax.jit(fgh)
    dt = timed(f_fgh, lambda o: np.asarray(o[0]), (setup_b, xs))
    print(f"B{B} fgh (Pallas CT) {dt*1e3:7.2f} ms  "
          f"{B*2*4*NCHAN*(NBIN//2+1)/dt/1e9:6.1f} GB/s", flush=True)

    def fgh_xla(sb, x):
        return jax.vmap(
            lambda s, xx: stats.chi2_value_grad_hess(
                xx, s, fit_flags=(1, 1, 0, 0, 0), log10_tau=False,
                scattering=False, use_pallas=False),
            in_axes=(axes, 0))(sb, x)

    f_fghx = jax.jit(fgh_xla)
    dt = timed(f_fghx, lambda o: np.asarray(o[0]), (setup_b, xs))
    print(f"B{B} fgh (XLA)       {dt*1e3:7.2f} ms  "
          f"{B*2*4*NCHAN*(NBIN//2+1)/dt/1e9:6.1f} GB/s", flush=True)

    if _args.cap:
        M2c = mrpc * mrpc + mipc * mipc
        setup_c = setup_b._replace(Gr=Grc, Gi=Gic, M2=M2c,
                                   Sd=jnp.sum(w * sdc, axis=-1),
                                   S0=jnp.sum(M2c, axis=-1),
                                   kvec=kvec_c)
        dtc = timed(f_fghx, lambda o: np.asarray(o[0]), (setup_c, xs))
        nhc = int(kvec_c.shape[-1])
        print(f"B{B} fgh cap (XLA)   {dtc*1e3:7.2f} ms  "
              f"{B*2*4*NCHAN*nhc/dtc/1e9:6.1f} GB/s", flush=True)

    # bf16-stored spectra fgh
    setup_h = setup_b._replace(Gr=Grp.astype(jnp.bfloat16),
                               Gi=Gip.astype(jnp.bfloat16),
                               M2=M2.astype(jnp.bfloat16))
    dt = timed(f_fgh, lambda o: np.asarray(o[0]), (setup_h, xs))
    print(f"B{B} fgh (bf16 Gr/Gi){dt*1e3:7.2f} ms  "
          f"{B*2*2*NCHAN*(NBIN//2+1)/dt/1e9:6.1f} GB/s eff", flush=True)

    # ---- 3. complete fit: f32 vs bf16 stats storage ----
    Ps = jnp.full(B, P, jnp.float32)
    freqs_j = jnp.asarray(freqs, jnp.float32)
    nu_fits = jnp.full((B, 3), nu_fit, jnp.float32)
    init = jnp.zeros((B, 5), jnp.float32)

    def full_fit(sdtype, **kw):
        return fit_portrait_full_batch(
            data, model_j, init, Ps, freqs_j, errs, nu_fits=nu_fits,
            fit_flags=(1, 1, 0, 0, 0), log10_tau=False, max_iter=30,
            fft_matmul=True, scattering=False, dft_precision="high",
            seed_phase=True, stats_dtype=sdtype, **kw)

    for sdtype, label in ((None, "f32 "), ("bfloat16", "bf16")):
        f = lambda: full_fit(sdtype)           # noqa: E731
        res = f()
        np.asarray(res.params)
        t0 = time.time()
        rs = [f() for _ in range(8)]
        np.asarray(rs[-1].params)
        dt = (time.time() - t0) / 8
        from pulseportraiture_tpu.ops.transform import phase_transform
        ph = np.asarray(jax.vmap(
            lambda p, d, n: phase_transform(
                p, d, n, jnp.float32(nu_fit), jnp.float32(P),
                mod=True))(rs[-1].params[:, 0], rs[-1].params[:, 1],
                           rs[-1].nu_DM))
        dphi = np.abs(ph - phis0).max()
        print(f"B{B} full fit {label} {dt*1e3:7.2f} ms -> "
              f"{B/dt:7.1f} fits/s  niter={float(np.asarray(res.niter).mean()):.2f}  "
              f"max|dphi| {dphi:.2e}", flush=True)

    if _args.cap:
        from pulseportraiture_tpu.ops.ct_dft import band_cap_model_ft
        mf64 = np.fft.rfft(np.asarray(model, np.float64), axis=-1)
        mrc, mic, mh = band_cap_model_ft(mf64.real, mf64.imag, NBIN)
        f = lambda: full_fit(None, model_ft_ri=(      # noqa: E731
            jnp.asarray(mrc, jnp.float32),
            jnp.asarray(mic, jnp.float32)), mharm=mh)
        res = f()
        np.asarray(res.params)
        t0 = time.time()
        rs = [f() for _ in range(8)]
        np.asarray(rs[-1].params)
        dt = (time.time() - t0) / 8
        print(f"B{B} full fit cap(mharm={mh}) {dt*1e3:7.2f} ms -> "
              f"{B/dt:7.1f} fits/s  "
              f"niter={float(np.asarray(res.niter).mean()):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
