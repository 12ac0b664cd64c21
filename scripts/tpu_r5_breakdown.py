#!/usr/bin/env python
"""Round-5 breakdown of the official bench configuration, on chip.

Times, with bench.py's exact operands (4096x2048, capped model,
B=128, f32 ingest, dft_precision=high): the fused Pallas direct
setup+seed, one capped fgh evaluation (XLA moments), the complete fit,
and the niter distribution (the vmapped while_loop runs max-over-batch
iterations, so the max — not the mean — prices the loop).  Also probes
B=256 (HBM headroom check).  Pipelined timing per CLAUDE.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

NCHAN, NBIN = 4096, 2048


def timed(fn, fetch, args=(), reps=8):
    fetch(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    fetch(outs[-1])
    return (time.time() - t0) / reps


def make_data(B, rng, model, freqs, nu_fit, P, noise):
    from pulseportraiture_tpu.config import DCONST
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
    return data, phis0, dms0


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

    from pulseportraiture_tpu.fitters import stats
    from pulseportraiture_tpu.fitters.portrait import (
        _brute_phase_seed, fit_portrait_full_batch)
    from pulseportraiture_tpu.ops.ct_dft import (band_cap_model_ft,
                                                 ct_kvec,
                                                 pallas_direct_setup,
                                                 permute_spectrum)

    B = int(os.environ.get("PP_B", 128))
    rng = np.random.default_rng(0)
    freqs = np.linspace(1100.0, 1900.0, NCHAN)
    x = (np.arange(NBIN) + 0.5) / NBIN
    prof = np.exp(-0.5 * ((x - 0.4) / 0.02) ** 2) + \
        0.4 * np.exp(-0.5 * ((x - 0.47) / 0.01) ** 2)
    model = (prof[None, :] * (freqs[:, None] / 1500.0) ** -1.5).astype(
        np.float32)
    noise, P = 0.1, 0.003
    nu_fit = freqs.mean()
    data_h, phis0, dms0 = make_data(B, rng, model, freqs, nu_fit, P, noise)
    data = jax.device_put(jnp.asarray(data_h))
    model_j = jax.device_put(jnp.asarray(model))
    errs = jnp.full((B, NCHAN), noise, jnp.float32)
    w_host = np.full((B, NCHAN),
                     (noise * np.sqrt(NBIN / 2.0)) ** -2.0, np.float32)
    w = jax.device_put(jnp.asarray(w_host))

    mf64 = np.fft.rfft(model.astype(np.float64), axis=-1)
    mrc, mic, mh = band_cap_model_ft(mf64.real, mf64.imag, NBIN)
    assert mh is not None
    mrp, mip = permute_spectrum(jnp.asarray(mrc, jnp.float32),
                                jnp.asarray(mic, jnp.float32), NBIN,
                                mharm=mh)
    mrp = jax.device_put(mrp)
    mip = jax.device_put(mip)
    kvec_c = jnp.asarray(ct_kvec(NBIN, mharm=mh))
    NHc = int(kvec_c.shape[-1])
    print(f"B={B} mharm={mh} NH'={NHc}", flush=True)

    # ---- 1. fused Pallas direct setup + seed ----
    f_setup = jax.jit(lambda d, a, b, ww: pallas_direct_setup(
        d, a, b, f0_fact=False, w=ww, mharm=mh))
    dt = timed(f_setup, lambda o: np.asarray(o[2][:, :2]),
               (data, mrp, mip, w))
    gbs = B * NCHAN * NBIN * 4 / dt / 1e9
    print(f"setup+seed (pallas direct)  {dt*1e3:7.2f} ms  "
          f"{gbs:6.1f} GB/s data read", flush=True)
    Grc, Gic, sdc, gsr, gsi = f_setup(data, mrp, mip, w)

    f_seed = jax.jit(lambda a, b: _brute_phase_seed(a, b, kvec_c))
    dt = timed(f_seed, lambda o: np.asarray(o[:2]), (gsr, gsi))
    print(f"brute seed (from gs)        {dt*1e3:7.2f} ms", flush=True)

    # ---- 2. one capped fgh (XLA moments) ----
    M2c = mrp * mrp + mip * mip
    dt32 = jnp.float32
    setup_c = stats.FitSetup(
        Gr=Grc, Gi=Gic, M2=M2c, w=w,
        freqs=jnp.broadcast_to(jnp.asarray(freqs, dt32), (B, NCHAN)),
        P=jnp.full(B, P, dt32), nu_DM=jnp.full(B, nu_fit, dt32),
        nu_GM=jnp.full(B, nu_fit, dt32), nu_tau=jnp.full(B, nu_fit, dt32),
        Sd=jnp.sum(w * sdc, axis=-1), S0=jnp.sum(M2c, axis=-1),
        nbin=NBIN, kvec=kvec_c, sd_chan=(w * sdc))
    axes = stats.FitSetup(Gr=0, Gi=0, M2=None, w=0, freqs=0, P=0,
                          nu_DM=0, nu_GM=0, nu_tau=0, Sd=0, S0=None,
                          nbin=None, kvec=None, sd_chan=0)
    xs = jnp.zeros((B, 5), dt32)

    def fgh_xla(sb, xx):
        return jax.vmap(
            lambda s, x1: stats.chi2_value_grad_hess(
                x1, s, fit_flags=(1, 1, 0, 0, 0), log10_tau=False,
                scattering=False, use_pallas=False),
            in_axes=(axes, 0))(sb, xx)

    f_fgh = jax.jit(fgh_xla)
    dt = timed(f_fgh, lambda o: np.asarray(o[0]), (setup_c, xs))
    print(f"one capped fgh (XLA)        {dt*1e3:7.2f} ms  "
          f"{B*2*4*NCHAN*NHc/dt/1e9:6.1f} GB/s", flush=True)

    # ---- 3. full fit (bench configuration) + niter stats ----
    Ps = jnp.full(B, P, jnp.float32)
    freqs_j = jnp.asarray(freqs, jnp.float32)
    nu_fits = jnp.full((B, 3), nu_fit, jnp.float32)
    init = jnp.zeros((B, 5), jnp.float32)
    mft = (jnp.asarray(mrc, jnp.float32), jnp.asarray(mic, jnp.float32))

    def full_fit():
        return fit_portrait_full_batch(
            data, model_j, init, Ps, freqs_j, errs, nu_fits=nu_fits,
            fit_flags=(1, 1, 0, 0, 0), log10_tau=False, max_iter=30,
            fft_matmul=True, scattering=False, dft_precision="high",
            seed_phase=True, model_ft_ri=mft, mharm=mh)

    res = full_fit()
    np.asarray(res.params)
    t0 = time.time()
    rs = [full_fit() for _ in range(8)]
    np.asarray(rs[-1].params)
    dt = (time.time() - t0) / 8
    ni = np.asarray(res.niter)
    print(f"full fit                    {dt*1e3:7.2f} ms -> "
          f"{B/dt:7.1f} fits/s", flush=True)
    print(f"niter mean {ni.mean():.2f} max {ni.max()} "
          f"hist {np.bincount(ni.astype(int))}", flush=True)
    st = np.asarray(res.return_code)
    print(f"status hist {np.bincount(st.astype(int))}", flush=True)


if __name__ == "__main__":
    main()
