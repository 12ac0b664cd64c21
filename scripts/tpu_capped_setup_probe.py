#!/usr/bin/env python
"""Probe: capped DIRECT DFT-matmul setup vs the Pallas CT setup kernel.

With the model-band harmonic cap active (mharm=8 at 4096x2048 -> only
k < NQ*mharm = 128 harmonics survive), the setup's output shrinks 8x
and the arithmetic balance changes: the CT kernel's step-1 q-DFT is
NQ^2 scalar-weighted VPU accumulations per channel REGARDLESS of the
cap, while a direct DFT-as-matmul over just the kept harmonics is
(nbin x 2*NH) of pure MXU work ((B*nchan, 2048) @ (2048, 258) at
precision HIGH ~ 550 GFLOP/batch ~ 11 ms at this chip's measured 51
TFLOP/s).  The i2-vs-f32 bench delta (50.8 vs 52.2 ms/batch for a
2 GB read difference) proves the current setup is compute-bound, not
bandwidth-bound, so this probe times:

  A. ct_setup(mharm=8) + fused seed            (current production)
  B. XLA capped DFT-matmul setup + Parseval sd + seed (same outputs,
     natural order; kvec = arange makes the fit loop order-free)
  C. B without the per-channel sd (floor: skips the 2nd data read)

and checks B's Gr/Gi/sd/seed against A (unpermuted).  Timing per
CLAUDE.md: queue >=8 dispatches, fetch a small output.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=128)
_ap.add_argument("--nchan", type=int, default=4096)
_ap.add_argument("--platform", default=None)
_args = _ap.parse_args()
NCHAN, NBIN, B = _args.nchan, 2048, _args.batch


def timed(fn, fetch, args=(), reps=8):
    out = fn(*args)
    fetch(out)
    t0 = time.time()
    rs = [fn(*args) for _ in range(reps)]
    fetch(rs[-1])
    return (time.time() - t0) / reps


def main():
    import jax

    if _args.platform:
        jax.config.update("jax_platforms", _args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pp_jax_compilation_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pulseportraiture_tpu.ops.ct_dft import (band_cap_model_ft,
                                                 ct_geometry, ct_kvec,
                                                 ct_setup,
                                                 permute_spectrum,
                                                 unpermute_spectrum)

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    freqs = np.linspace(1100.0, 1900.0, NCHAN)
    x = (np.arange(NBIN) + 0.5) / NBIN
    prof = np.exp(-0.5 * ((x - 0.4) / 0.02) ** 2) + \
        0.4 * np.exp(-0.5 * ((x - 0.47) / 0.01) ** 2)
    model = (prof[None, :] * (freqs[:, None] / 1500.0) ** -1.5).astype(
        np.float32)
    data_h = (model[None] +
              rng.normal(0, 0.1, (B, NCHAN, NBIN))).astype(np.float32)
    data = jax.device_put(jnp.asarray(data_h))
    noise = jnp.float32(0.1)
    errs_FT = noise * np.sqrt(NBIN / 2.0)
    w_h = np.full((B, NCHAN), float(errs_FT) ** -2.0, np.float32)
    w = jax.device_put(jnp.asarray(w_h))

    mf64 = np.fft.rfft(np.asarray(model, np.float64), axis=-1)
    mr_c, mi_c, mh = band_cap_model_ft(mf64.real, mf64.imag, NBIN)
    assert mh is not None
    NQ, M0, NH = ct_geometry(NBIN, mh)
    print(f"mharm={mh}  NH={NH}", flush=True)

    # ---- A. current: Pallas CT capped setup + fused seed ----
    mrp, mip = permute_spectrum(jnp.asarray(mr_c), jnp.asarray(mi_c),
                                NBIN, mharm=mh)
    mrp = jax.device_put(mrp)
    mip = jax.device_put(mip)
    interp = jax.default_backend() != "tpu"
    f_ct = jax.jit(lambda d, ww: ct_setup(
        d, mrp, mip, f0_fact=False, dft_precision="high", w=ww,
        mharm=mh, interpret=interp))
    dt = timed(f_ct, lambda o: np.asarray(o[2][:, :2]), (data, w))
    print(f"A ct_setup cap       {dt*1e3:7.2f} ms", flush=True)
    Gr_a, Gi_a, sd_a, gsr_a, gsi_a = f_ct(data, w)

    # ---- B. capped direct DFT-matmul setup (XLA, natural order) ----
    # trig matrices built in f64 on host, cast f32; one extra cos
    # column at k = nbin/2 gives the Nyquist sum for Parseval sd
    j = np.arange(NBIN)[:, None]
    kk = np.arange(NH)[None, :]
    Ecos = np.cos(2 * np.pi * j * kk / NBIN)
    Esin = np.sin(2 * np.pi * j * kk / NBIN)
    Ecos = np.concatenate([Ecos, np.cos(np.pi * j)], axis=1)  # + Nyquist
    Ec = jax.device_put(jnp.asarray(Ecos, jnp.float32))
    Es = jax.device_put(jnp.asarray(Esin, jnp.float32))
    mr_j = jax.device_put(jnp.asarray(mr_c[:, :NH]))
    mi_j = jax.device_put(jnp.asarray(mi_c[:, :NH]))

    def direct_setup(d, ww, with_sd=True):
        hp = jax.lax.Precision.HIGH
        Xr_full = jnp.matmul(d, Ec, precision=hp,
                             preferred_element_type=jnp.float32)
        Xi = -jnp.matmul(d, Es, precision=hp,
                         preferred_element_type=jnp.float32)
        Xr, ny = Xr_full[..., :NH], Xr_full[..., NH]
        x0 = Xr[..., 0]
        Gr = Xr * mr_j + Xi * mi_j
        Gi = Xi * mr_j - Xr * mi_j
        # DC zeroed (F0_FACT falsy) — the model spectrum already has
        # mr[0] = mi[0] = 0 from band_cap_model_ft?  No: keep explicit.
        Gr = Gr.at[..., 0].set(0.0)
        Gi = Gi.at[..., 0].set(0.0)
        if with_sd:
            sx2 = jnp.sum(d * d, axis=-1)
            sd = 0.5 * (jnp.float32(NBIN) * sx2 - x0 * x0) + \
                0.5 * ny * ny
        else:
            sd = x0
        gsr = jnp.einsum("bc,bck->bk", ww, Gr)
        gsi = jnp.einsum("bc,bck->bk", ww, Gi)
        return Gr, Gi, sd, gsr, gsi

    f_dir = jax.jit(lambda d, ww: direct_setup(d, ww, True))
    dt = timed(f_dir, lambda o: np.asarray(o[2][:, :2]), (data, w))
    print(f"B direct cap (HIGH)  {dt*1e3:7.2f} ms", flush=True)

    f_dir0 = jax.jit(lambda d, ww: direct_setup(d, ww, False))
    dt = timed(f_dir0, lambda o: np.asarray(o[2][:, :2]), (data, w))
    print(f"C direct, no sd      {dt*1e3:7.2f} ms", flush=True)

    # ---- parity B vs A (one item, fetched once) ----
    Gr_b, Gi_b, sd_b, gsr_b, gsi_b = f_dir(data, w)
    # unpermute A's CT order -> natural: capped layout is a pure
    # permutation of k = 0..NH-1
    kv = ct_kvec(NBIN, mharm=mh).astype(np.int64)
    pos = np.zeros(NH, np.int64)
    pos[kv] = np.arange(NH)
    ga = np.asarray(Gr_a[0])[:, pos]
    gb = np.asarray(Gr_b[0])
    scale = np.abs(ga).max()
    print(f"max|dGr|/max        {np.abs(ga - gb).max()/scale:.2e}",
          flush=True)
    sa = np.asarray(sd_a[0])
    sb = np.asarray(sd_b[0])
    print(f"max|dsd|/max        {np.abs(sa-sb).max()/np.abs(sa).max():.2e}",
          flush=True)
    ra = np.asarray(gsr_a[0])[pos]
    rb = np.asarray(gsr_b[0])
    print(f"max|dgsr|/max       {np.abs(ra-rb).max()/np.abs(ra).max():.2e}",
          flush=True)


if __name__ == "__main__":
    main()
