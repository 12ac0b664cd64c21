#!/usr/bin/env python
"""Probe: FUSED Pallas direct-capped setup vs the XLA direct setup.

The XLA direct setup (ops/ct_dft.direct_capped_setup, 25.5 ms/batch
f32 at 128x4096x2048 mharm=8) has two structural costs the dot itself
can't shed:

  1. the Parseval sd needs sum(x^2), and XLA cannot fuse a reduction
     into a dot operand -> a SECOND full HBM pass over the 4.3 GB
     (f32) / 2.1 GB (i2) data;
  2. its 258-column matmul pads to 384 lanes -> 1.5x wasted MXU work.

ops/ct_dft.pallas_direct_setup fuses everything into one kernel: the
data tile is VMEM-resident once (dots + sum(x^2) + dequant + Gr/Gi +
seed accumulators in one pass) and the trig slab is exactly 2*NH = 256
lanes with the Nyquist column folded into the dead DC-imag slot.
Mosaic dots only run at DEFAULT/HIGHEST, so HIGH precision is
reproduced manually: split-bf16 3-pass (xhi Ehi + xlo Ehi + xhi Elo)
at the native bf16 MXU rate.

Times (pipelined per CLAUDE.md: queue >=8, fetch a small slice):
  A. XLA direct setup + seed, f32 ingest       (current production)
  B. XLA direct setup + seed, i2 ingest
  C. Pallas fused npass=3, f32
  D. Pallas fused npass=3, i2
  E. Pallas fused npass=2, i2  (accuracy opt-out: data-lo dropped)
and checks C/D outputs against A/B (same f32 class).
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
_ap.add_argument("--reps", type=int, default=8)
_args = _ap.parse_args()
NCHAN, NBIN, B = _args.nchan, 2048, _args.batch


def timed(fn, fetch, args=(), reps=_args.reps):
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
                                                 ct_geometry,
                                                 direct_capped_setup,
                                                 pallas_direct_setup,
                                                 permute_spectrum)

    print("backend:", jax.default_backend(), flush=True)
    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    freqs = np.linspace(1100.0, 1900.0, NCHAN)
    x = (np.arange(NBIN) + 0.5) / NBIN
    prof = np.exp(-0.5 * ((x - 0.4) / 0.02) ** 2) + \
        0.4 * np.exp(-0.5 * ((x - 0.47) / 0.01) ** 2)
    model = (prof[None, :] * (freqs[:, None] / 1500.0) ** -1.5).astype(
        np.float32)
    data_h = (model[None] +
              rng.normal(0, 0.1, (B, NCHAN, NBIN))).astype(np.float32)
    noise = 0.1
    errs_FT = noise * np.sqrt(NBIN / 2.0)
    w_h = np.full((B, NCHAN), float(errs_FT) ** -2.0, np.float32)
    w = jax.device_put(jnp.asarray(w_h))

    from pulseportraiture_tpu.io import native
    raw_h, scl_h, _ = native.quantize_i2(data_h.reshape(B * NCHAN, NBIN))
    raw = jax.device_put(jnp.asarray(raw_h.reshape(B, NCHAN, NBIN)))
    scl = jax.device_put(jnp.asarray(scl_h.reshape(B, NCHAN), jnp.float32))
    data = jax.device_put(jnp.asarray(data_h))

    mf64 = np.fft.rfft(np.asarray(model, np.float64), axis=-1)
    mr_c, mi_c, mh = band_cap_model_ft(mf64.real, mf64.imag, NBIN)
    assert mh is not None
    NQ, M0, NH = ct_geometry(NBIN, mh)
    print(f"mharm={mh}  NH={NH}", flush=True)
    mrp, mip = permute_spectrum(jnp.asarray(mr_c), jnp.asarray(mi_c),
                                NBIN, mharm=mh)
    mrp = jax.device_put(mrp)
    mip = jax.device_put(mip)

    fetch = lambda o: np.asarray(o[2][:, :2])  # noqa: E731

    f_a = jax.jit(lambda d, ww: direct_capped_setup(
        d, mrp, mip, f0_fact=False, dft_precision="high", w=ww,
        mharm=mh))
    dt_a = timed(f_a, fetch, (data, w))
    print(f"A xla direct  f32    {dt_a*1e3:7.2f} ms", flush=True)

    f_b = jax.jit(lambda d, ww, s: direct_capped_setup(
        d, mrp, mip, f0_fact=False, dft_precision="high", w=ww,
        scale=s, mharm=mh))
    dt_b = timed(f_b, fetch, (raw, w, scl))
    print(f"B xla direct  i2     {dt_b*1e3:7.2f} ms", flush=True)

    f_c = jax.jit(lambda d, ww: pallas_direct_setup(
        d, mrp, mip, f0_fact=False, w=ww, mharm=mh, npass=3,
        interpret=interp))
    dt_c = timed(f_c, fetch, (data, w))
    print(f"C pallas n3   f32    {dt_c*1e3:7.2f} ms", flush=True)

    f_d = jax.jit(lambda d, ww, s: pallas_direct_setup(
        d, mrp, mip, f0_fact=False, w=ww, scale=s, mharm=mh, npass=3,
        interpret=interp))
    dt_d = timed(f_d, fetch, (raw, w, scl))
    print(f"D pallas n3   i2     {dt_d*1e3:7.2f} ms", flush=True)

    f_e = jax.jit(lambda d, ww, s: pallas_direct_setup(
        d, mrp, mip, f0_fact=False, w=ww, scale=s, mharm=mh, npass=2,
        interpret=interp))
    dt_e = timed(f_e, fetch, (raw, w, scl))
    print(f"E pallas n2   i2     {dt_e*1e3:7.2f} ms", flush=True)

    # parity: fetch one item's outputs from each
    a = f_a(data, w)
    c = f_c(data, w)
    b = f_b(raw, w, scl)
    d = f_d(raw, w, scl)
    ref_scale = float(np.abs(np.asarray(a[0][0])).max())
    for name, u, v in (("C-vs-A Gr", a[0][0], c[0][0]),
                       ("C-vs-A Gi", a[1][0], c[1][0]),
                       ("C-vs-A sd", a[2][0], c[2][0]),
                       ("C-vs-A gsr", a[3][0], c[3][0]),
                       ("D-vs-B Gr", b[0][0], d[0][0]),
                       ("D-vs-B sd", b[2][0], d[2][0])):
        u = np.asarray(u, np.float64)
        v = np.asarray(v, np.float64)
        den = ref_scale if "Gr" in name or "Gi" in name or \
            "gs" in name else float(np.abs(u).max())
        print(f"{name:12s} max rel err {np.abs(u-v).max()/den:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
