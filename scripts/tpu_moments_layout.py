#!/usr/bin/env python
"""On-chip A/B: CT phase-moments kernel with split Gr/Gi streams vs a
merged single-stream (nchan, 2*nk) layout, vs raw copy ceilings.

The PERF.md record shows the split kernel at ~87-120 GB/s against a
~145 GB/s "2-stream" ceiling while single-stream reads measure higher;
if the merged layout closes the gap it becomes the FitSetup storage
format for the Newton loop (4x Gr/Gi reads per fit).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

NCHAN, NBIN, B = 4096, 2048, 16
_LANES = 128


def timed(fn, fetch, args=(), reps=10):
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pulseportraiture_tpu.fitters.stats import _phase_trig
    from pulseportraiture_tpu.ops.pallas_moments import (
        _make_phase_kernel_ct, phase_moments)
    from pulseportraiture_tpu.ops.ct_dft import ct_kvec

    NQ = NBIN // _LANES
    nk = NQ * 64
    rng = np.random.default_rng(0)
    Gr = rng.normal(size=(B, NCHAN, nk)).astype(np.float32)
    Gi = rng.normal(size=(B, NCHAN, nk)).astype(np.float32)
    phis = rng.uniform(-0.5, 0.5, (B, NCHAN)).astype(np.float32)
    Grj = jax.device_put(jnp.asarray(Gr))
    Gij = jax.device_put(jnp.asarray(Gi))
    Gm = jax.device_put(jnp.asarray(
        np.concatenate([Gr, Gi], axis=-1)))        # (B, NCHAN, 2*nk)
    ph = jax.device_put(jnp.asarray(phis))
    kvec = jnp.asarray(ct_kvec(NBIN)[:nk])
    bytes_split = B * 2 * NCHAN * nk * 4

    # ---- 0. copy ceilings: 2-stream and 1-stream elementwise reduce ----
    f2 = jax.jit(lambda a, b: jnp.sum(a, axis=-1) + jnp.sum(b, axis=-1))
    dt = timed(f2, lambda o: np.asarray(o[0, :2]), (Grj, Gij))
    print(f"XLA 2-stream reduce  {dt*1e3:7.2f} ms "
          f"{bytes_split/dt/1e9:6.1f} GB/s", flush=True)
    f1 = jax.jit(lambda a: jnp.sum(a, axis=-1))
    dt = timed(f1, lambda o: np.asarray(o[0, :2]), (Gm,))
    print(f"XLA 1-stream reduce  {dt*1e3:7.2f} ms "
          f"{bytes_split/dt/1e9:6.1f} GB/s", flush=True)

    # ---- 1. current split-stream CT kernel (vmapped) ----
    f_split = jax.jit(lambda p, a, b: jax.vmap(
        lambda pp, aa, bb: phase_moments(pp, aa, bb, kvec=kvec))(p, a, b))
    dt = timed(f_split, lambda o: np.asarray(o[0][0, :2]), (ph, Grj, Gij))
    print(f"CT kernel split      {dt*1e3:7.2f} ms "
          f"{bytes_split/dt/1e9:6.1f} GB/s", flush=True)
    ref = f_split(ph, Grj, Gij)

    # ---- 2. merged single-stream variant ----
    def make_merged_kernel(NQ, nk):
        base = _make_phase_kernel_ct(NQ)

        def kernel(phis_ref, g_ref, out_ref):
            class _View:
                shape = (g_ref.shape[0], nk)

                def __getitem__(self, idx):
                    return g_ref[idx[0], idx[1]]
            # inline: re-implement with lane slicing
            import jax as _jax
            phis = phis_ref[:]
            p = phis[:, 0]
            ngroups = nk // _LANES
            lane = _jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
            k0 = (NQ * (lane % 64) + lane // 64).astype(jnp.float32)
            P0r, P0i = _phase_trig(p, k0)
            g2 = (2.0 * _jax.lax.broadcasted_iota(
                jnp.int32, (1, ngroups), 1).astype(jnp.float32))
            cg, sg = _phase_trig(p, g2)
            accC = None
            accCp = None
            accCpp = None
            for g in range(ngroups):
                if g == 0:
                    Pr, Pi = P0r, P0i
                else:
                    cgg = cg[:, g:g + 1]
                    sgg = sg[:, g:g + 1]
                    Pr = P0r * cgg - P0i * sgg
                    Pi = P0r * sgg + P0i * cgg
                w1 = k0 + jnp.float32(2 * g)
                w2 = w1 * w1
                sl = slice(g * _LANES, (g + 1) * _LANES)
                sl2 = slice(nk + g * _LANES, nk + (g + 1) * _LANES)
                gr = g_ref[:, sl]
                gi = g_ref[:, sl2]
                zr = gr * Pr - gi * Pi
                zi = gr * Pi + gi * Pr
                accC = zr if accC is None else accC + zr
                t = w1 * zi
                accCp = t if accCp is None else accCp + t
                t2 = w2 * zr
                accCpp = t2 if accCpp is None else accCpp + t2
            TWO_PI = 2.0 * np.pi
            C = jnp.sum(accC, axis=-1)
            Cp = (-TWO_PI) * jnp.sum(accCp, axis=-1)
            Cpp = (-TWO_PI * TWO_PI) * jnp.sum(accCpp, axis=-1)
            out_ref[:] = jnp.stack([C, Cp, Cpp], axis=-1)

        del base
        return kernel

    def merged_call(p, g, cblk):
        grid = (NCHAN // cblk,)
        return pl.pallas_call(
            make_merged_kernel(NQ, nk),
            out_shape=jax.ShapeDtypeStruct((NCHAN, 3), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((cblk, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cblk, 2 * nk), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((cblk, 3), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(p[..., None], g)

    for cblk in (128, 256, 512):
        f_m = jax.jit(lambda p, g, c=cblk: jax.vmap(
            lambda pp, gg: merged_call(pp, gg, c))(p, g))
        try:
            out = f_m(ph, Gm)
            d = max(float(jnp.max(jnp.abs(out[..., j] - ref[j]))) /
                    (float(jnp.max(jnp.abs(ref[j]))) + 1e-30)
                    for j in range(3))
            dt = timed(f_m, lambda o: np.asarray(o[0, :2]), (ph, Gm))
            print(f"CT merged cblk={cblk:4d} {dt*1e3:7.2f} ms "
                  f"{bytes_split/dt/1e9:6.1f} GB/s  rel {d:.1e}",
                  flush=True)
        except Exception as e:
            print(f"CT merged cblk={cblk:4d} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # ---- 3. split kernel, cblk sweep (DMA-size sensitivity) ----
    for cblk in (128, 512):
        os.environ["PP_MOMENTS_CBLK"] = str(cblk)
        try:
            f_s = jax.jit(lambda p, a, b: jax.vmap(
                lambda pp, aa, bb: phase_moments(
                    pp, aa, bb, kvec=kvec))(p, a, b))
            dt = timed(f_s, lambda o: np.asarray(o[0][0, :2]),
                       (ph, Grj, Gij))
            print(f"CT split  cblk={cblk:4d} {dt*1e3:7.2f} ms "
                  f"{bytes_split/dt/1e9:6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"CT split  cblk={cblk:4d} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        del os.environ["PP_MOMENTS_CBLK"]


if __name__ == "__main__":
    main()
