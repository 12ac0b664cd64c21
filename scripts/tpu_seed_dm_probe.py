#!/usr/bin/env python
"""On-chip A/B of the joint (phi, DM) brute seed (round 5).

Times the bench configuration (4096x2048, capped mharm=8, f32 ingest,
fused Pallas direct setup) with seed_phase only vs seed_phase+seed_dm,
at B=128 and B=256 (PP_B overrides), and records the niter histogram —
the vmapped while_loop runs max-over-batch iterations, so the seed pays
exactly when it pulls the batch MAX down.  Pipelined timing per
CLAUDE.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

NCHAN, NBIN = 4096, 2048


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
    from pulseportraiture_tpu.fitters.portrait import \
        fit_portrait_full_batch
    from pulseportraiture_tpu.ops.ct_dft import band_cap_model_ft
    from pulseportraiture_tpu.ops.transform import phase_transform
    from pulseportraiture_tpu.utils import retry_transient

    rng = np.random.default_rng(0)
    freqs = np.linspace(1100.0, 1900.0, NCHAN)
    x = (np.arange(NBIN) + 0.5) / NBIN
    prof = np.exp(-0.5 * ((x - 0.4) / 0.02) ** 2) + \
        0.4 * np.exp(-0.5 * ((x - 0.47) / 0.01) ** 2)
    model = (prof[None, :] * (freqs[:, None] / 1500.0) ** -1.5).astype(
        np.float32)
    noise, P = 0.1, 0.003
    nu_fit = freqs.mean()
    mf64 = np.fft.rfft(model.astype(np.float64), axis=-1)
    mrc, mic, mh = band_cap_model_ft(mf64.real, mf64.imag, NBIN)
    mft = (jnp.asarray(mrc, jnp.float32), jnp.asarray(mic, jnp.float32))
    model_j = jax.device_put(jnp.asarray(model))
    freqs_j = jnp.asarray(freqs, jnp.float32)
    k = 2j * np.pi * np.arange(NBIN // 2 + 1)
    mfft = np.fft.rfft(model, axis=-1)

    for B in [int(b) for b in os.environ.get("PP_B", "128,256").split(",")]:
        phis0 = rng.uniform(-0.01, 0.01, B)
        dms0 = rng.uniform(-2e-4, 2e-4, B)
        data = np.empty((B, NCHAN, NBIN), np.float32)
        for i in range(B):
            sh = phis0[i] + DCONST * dms0[i] / P * (freqs ** -2 -
                                                    nu_fit ** -2)
            data[i] = np.fft.irfft(mfft * np.exp(-k * sh[:, None]),
                                   n=NBIN, axis=-1)
        data += rng.normal(0, noise, data.shape).astype(np.float32)
        data = jax.device_put(jnp.asarray(data))
        Ps = jnp.full(B, P, jnp.float32)
        errs = jnp.full((B, NCHAN), noise, jnp.float32)
        nu_fits = jnp.full((B, 3), nu_fit, jnp.float32)
        init = jnp.zeros((B, 5), jnp.float32)

        def run(seed_dm):
            return fit_portrait_full_batch(
                data, model_j, init, Ps, freqs_j, errs, nu_fits=nu_fits,
                fit_flags=(1, 1, 0, 0, 0), log10_tau=False, max_iter=30,
                fft_matmul=True, scattering=False, dft_precision="high",
                seed_phase=True, seed_dm=seed_dm, model_ft_ri=mft,
                mharm=mh)

        for seed_dm in (False, True):
            res = retry_transient(lambda: run(seed_dm))
            np.asarray(res.params)
            t0 = time.time()
            rs = [run(seed_dm) for _ in range(8)]
            np.asarray(rs[-1].params)
            dt = (time.time() - t0) / 8
            ni = np.asarray(res.niter)
            ph = np.asarray(jax.vmap(
                lambda p, d, n: phase_transform(
                    p, d, n, jnp.float32(nu_fit), jnp.float32(P),
                    mod=True))(res.params[:, 0], res.params[:, 1],
                               res.nu_DM))
            dphi = np.abs(ph - phis0).max()
            print(f"B{B} seed_dm={int(seed_dm)}  {dt*1e3:7.2f} ms -> "
                  f"{B/dt:7.1f} fits/s  niter mean {ni.mean():.2f} "
                  f"max {ni.max()} hist {np.bincount(ni.astype(int))} "
                  f"max|dphi| {dphi:.2e}", flush=True)


if __name__ == "__main__":
    main()
