#!/usr/bin/env python
"""On-chip self-check + bandwidth meter for the Pallas/CT kernels.

Runs the fused CT-DFT setup and both moments kernels (phase + 9-term
scattering) on the default backend at a production shape, compares every
output against the XLA reference path, and prints achieved HBM
bandwidth.  Record the output in PERF.md: it is the canary for Mosaic
regressions without paying for a full bench run (VERDICT r2, next #6).

Timing protocol (CLAUDE.md): queue >=REPS executions, fetch one small
output with np.asarray — block_until_ready can return early through the
axon tunnel and per-dispatch latency is ~30 ms.

Usage: python scripts/tpu_kernel_check.py [--nchan 4096] [--nbin 2048]
           [--platform cpu]   # CPU+interpret mode for a smoke test
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def timed(fn, fetch, reps=10, args=()):
    """Pipelined seconds/call: queue reps calls, fetch a small output.

    Operands must be passed via args, NOT closed over: the remote-TPU
    compile helper ships closure constants in the HTTP request body and
    rejects bodies over ~100 MB (HTTP 413).
    """
    fetch(fn(*args))                 # warm (compile)
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    fetch(outs[-1])
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nchan", type=int, default=4096)
    ap.add_argument("--nbin", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache = os.environ.get("PP_JAX_CACHE", "/tmp/pp_jax_compilation_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from pulseportraiture_tpu.ops import ct_dft, pallas_moments
    from pulseportraiture_tpu.fitters.stats import model_ft

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    interp = not on_tpu
    nchan, nbin = args.nchan, args.nbin
    NH = nbin // 2 + 1
    reps = args.reps if on_tpu else 2
    print(f"# backend={backend} nchan={nchan} nbin={nbin} reps={reps}")

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (nchan, nbin)).astype(np.float32)
    model = rng.normal(0, 1, (nchan, nbin)).astype(np.float32)
    phis = rng.uniform(-0.5, 0.5, nchan).astype(np.float32)
    taus = (10.0 ** rng.uniform(-3, -1, nchan)).astype(np.float32)

    # ---- reference spectra (XLA DFT-matmul path, HIGHEST) ----
    mr, mi = model_ft(jnp.asarray(model), fft_matmul=True,
                      dft_precision="highest")
    mr_p, mi_p = ct_dft.permute_spectrum(mr, mi, nbin)
    mr_p = jax.device_put(mr_p)
    mi_p = jax.device_put(mi_p)
    xd = jax.device_put(jnp.asarray(x))
    kvec = jnp.asarray(ct_dft.ct_kvec(nbin))

    # numpy float64 truth
    dftt = np.fft.rfft(x.astype(np.float64), axis=-1)
    mftt = np.fft.rfft(model.astype(np.float64), axis=-1)
    G = dftt * np.conj(mftt)
    G[:, 0] = 0.0            # f0_fact=False zeroes the DC harmonic
    perm = ct_dft.ct_perm_np(nbin)
    Gr_t = G.real[:, perm]
    Gi_t = G.imag[:, perm]
    scale = np.abs(G).max()

    # ---- 1. fused CT setup ----
    f = jax.jit(lambda: ct_dft.ct_setup(xd, mr_p, mi_p, f0_fact=False,
                                        dft_precision="high",
                                        interpret=interp))
    dt = timed(f, lambda o: np.asarray(o[2][:4]), reps)
    Gr_p, Gi_p, sd = f()
    dGr = np.abs(np.asarray(Gr_p) - Gr_t).max() / scale
    dGi = np.abs(np.asarray(Gi_p) - Gi_t).max() / scale
    gb = (x.nbytes + 2 * 4 * nchan * NH) / dt / 1e9
    print(f"ct_setup          {dt*1e3:8.2f} ms  {gb:6.1f} GB/s (r+w)  "
          f"max|dGr| {dGr:.2e}  max|dGi| {dGi:.2e}")
    assert dGr < 1e-5 and dGi < 1e-5, "CT setup parity FAIL"

    Gr_p = jax.device_put(Gr_p)
    Gi_p = jax.device_put(Gi_p)
    M2 = mr_p * mr_p + mi_p * mi_p
    phis_d = jax.device_put(jnp.asarray(phis))
    taus_d = jax.device_put(jnp.asarray(taus))

    # float64 truth for the moments
    k64 = perm.astype(np.float64)
    ang = 2.0 * np.pi * phis.astype(np.float64)[:, None] * k64
    zr = Gr_t * np.cos(ang) - Gi_t * np.sin(ang)
    zi = Gr_t * np.sin(ang) + Gi_t * np.cos(ang)
    C_t = zr.sum(-1)
    Cp_t = -2 * np.pi * (k64 * zi).sum(-1)
    Cpp_t = -(2 * np.pi) ** 2 * (k64 * k64 * zr).sum(-1)
    Cs = np.abs(C_t).max()

    bytes_phase = 2 * 4 * nchan * NH          # Gr+Gi read

    # ---- 2. phase moments: XLA reference vs Pallas CT kernel ----
    f_xla = jax.jit(lambda: pallas_moments.phase_moments_reference(
        phis_d, Gr_p, Gi_p, kvec=kvec))
    dt = timed(f_xla, lambda o: np.asarray(o[0][:4]), reps)
    o = f_xla()
    d_xla = max(np.abs(np.asarray(o[0]) - C_t).max() / Cs,
                np.abs(np.asarray(o[1]) - Cp_t).max() / (np.abs(Cp_t).max()),
                np.abs(np.asarray(o[2]) - Cpp_t).max() /
                np.abs(Cpp_t).max())
    print(f"phase_moments XLA {dt*1e3:8.2f} ms  {bytes_phase/dt/1e9:6.1f} "
          f"GB/s  rel err {d_xla:.2e}")

    f_ct = jax.jit(lambda: pallas_moments.phase_moments(
        phis_d, Gr_p, Gi_p, kvec=kvec, interpret=interp))
    dt = timed(f_ct, lambda o: np.asarray(o[0][:4]), reps)
    o = f_ct()
    d_ct = max(np.abs(np.asarray(o[0]) - C_t).max() / Cs,
               np.abs(np.asarray(o[1]) - Cp_t).max() / np.abs(Cp_t).max(),
               np.abs(np.asarray(o[2]) - Cpp_t).max() /
               np.abs(Cpp_t).max())
    print(f"phase_moments CT  {dt*1e3:8.2f} ms  {bytes_phase/dt/1e9:6.1f} "
          f"GB/s  rel err {d_ct:.2e}")
    assert d_ct < 5e-5, "CT phase moments parity FAIL"

    # ---- 3. scattering moments (9 accumulators): XLA vs Pallas CT ----
    st_ref = jax.jit(lambda: pallas_moments._scat_terms_ref(
        phis_d, taus_d, Gr_p, Gi_p, M2, kvec))
    bytes_scat = 3 * 4 * nchan * NH
    dt = timed(st_ref, lambda o: np.asarray(o[0][:4]), reps)
    ref9 = [np.asarray(v, np.float64) for v in st_ref()]
    print(f"scat_moments XLA  {dt*1e3:8.2f} ms  {bytes_scat/dt/1e9:6.1f} "
          f"GB/s")

    f_sc = jax.jit(lambda: pallas_moments.scattering_moments(
        phis_d, taus_d, Gr_p, Gi_p, M2, kvec=kvec, interpret=interp))
    dt = timed(f_sc, lambda o: np.asarray(o[0][:4]), reps)
    out9 = f_sc()
    worst = 0.0
    for a, b in zip(out9, ref9):
        sc = np.abs(b).max() or 1.0
        worst = max(worst, np.abs(np.asarray(a, np.float64) - b).max() / sc)
    print(f"scat_moments CT   {dt*1e3:8.2f} ms  {bytes_scat/dt/1e9:6.1f} "
          f"GB/s  rel-vs-XLA {worst:.2e}")
    assert worst < 5e-5, "CT scattering moments parity FAIL"

    # ---- 4. raw 2-stream read ceiling on the same arrays ----
    f_raw = jax.jit(lambda: jnp.sum(Gr_p + 2.0 * Gi_p))
    dt = timed(f_raw, lambda o: np.asarray(o), reps)
    print(f"raw 2-stream read {dt*1e3:8.2f} ms  {bytes_phase/dt/1e9:6.1f} "
          f"GB/s (ceiling)")

    # ---- 5. batched bandwidth rows: the fit runs the moments vmapped
    # over the batch inside one program, so per-execution dispatch
    # overhead (~3 ms on the axon tunnel) is amortized over B items;
    # single-item rows above are overhead-dominated at 33 MB. ----
    B = args.batch if on_tpu else min(args.batch, 2)
    if B > 1:
        tile = jax.jit(lambda a: jnp.broadcast_to(
            a, (B,) + a.shape) + 0.0)
        GrB = tile(Gr_p)
        GiB = tile(Gi_p)
        phB = tile(phis_d)
        tauB = tile(taus_d)
        bph = B * bytes_phase
        f = jax.jit(lambda ph, a, b: jax.vmap(
            lambda p, x, y: pallas_moments.phase_moments(
                p, x, y, kvec=kvec, interpret=interp))(ph, a, b))
        dt = timed(f, lambda o: np.asarray(o[0][:, :2]), reps,
                   args=(phB, GrB, GiB))
        print(f"B{B:<3d} phase CT     {dt*1e3:8.2f} ms  "
              f"{bph/dt/1e9:6.1f} GB/s")
        f = jax.jit(lambda ph, a, b: jax.vmap(
            lambda p, x, y: pallas_moments.phase_moments_reference(
                p, x, y, kvec=kvec))(ph, a, b))
        dt = timed(f, lambda o: np.asarray(o[0][:, :2]), reps,
                   args=(phB, GrB, GiB))
        print(f"B{B:<3d} phase XLA    {dt*1e3:8.2f} ms  "
              f"{bph/dt/1e9:6.1f} GB/s")
        bsc = B * 2 * 4 * nchan * NH + 4 * nchan * NH   # M2 shared
        f = jax.jit(lambda ph, ta, a, b, m2: jax.vmap(
            lambda p, t, x, y: pallas_moments.scattering_moments(
                p, t, x, y, m2, kvec=kvec, interpret=interp))(
            ph, ta, a, b))
        dt = timed(f, lambda o: np.asarray(o[0][:, :2]), reps,
                   args=(phB, tauB, GrB, GiB, M2))
        print(f"B{B:<3d} scat CT      {dt*1e3:8.2f} ms  "
              f"{bsc/dt/1e9:6.1f} GB/s")
        f = jax.jit(lambda ph, ta, a, b, m2: jax.vmap(
            lambda p, t, x, y: pallas_moments._scat_terms_ref(
                p, t, x, y, m2, kvec))(ph, ta, a, b))
        dt = timed(f, lambda o: np.asarray(o[0][:, :2]), reps,
                   args=(phB, tauB, GrB, GiB, M2))
        print(f"B{B:<3d} scat XLA     {dt*1e3:8.2f} ms  "
              f"{bsc/dt/1e9:6.1f} GB/s")
        f = jax.jit(lambda a, b: jnp.sum(a + 2.0 * b, axis=(1, 2)))
        dt = timed(f, lambda o: np.asarray(o), reps, args=(GrB, GiB))
        print(f"B{B:<3d} 2-stream     {dt*1e3:8.2f} ms  "
              f"{bph/dt/1e9:6.1f} GB/s (ceiling)")
        xB = tile(xd)
        f = jax.jit(lambda xx, a, b: ct_dft.ct_setup(
            xx, a, b, f0_fact=False, dft_precision="high",
            interpret=interp))
        dt = timed(f, lambda o: np.asarray(o[2][:, :2]), reps,
                   args=(xB, mr_p, mi_p))
        bst = B * (4 * nchan * nbin + 2 * 4 * nchan * NH)
        print(f"B{B:<3d} ct_setup     {dt*1e3:8.2f} ms  "
              f"{bst/dt/1e9:6.1f} GB/s (r+w)")
    print("ALL KERNEL CHECKS PASS")


if __name__ == "__main__":
    main()
