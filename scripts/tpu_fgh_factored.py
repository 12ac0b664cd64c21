#!/usr/bin/env python
"""Prototype: factored-phasor phase moments in PLAIN XLA on the CT
layout — trig on 128 + ngroups values per channel (like the Pallas CT
kernel) but letting XLA's fusion/pipelining stream Gr/Gi.

Compares, at the bench shape (B x 4096 x 1025 CT layout, f32):
  1. current XLA moments (per-element double-single trig)
  2. factored XLA moments (this prototype)
  3. Pallas CT kernel (ops/pallas_moments.py)
for time (pipelined, one fetch) and agreement.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

B = int(os.environ.get("PP_PROBE_B", 32))
NCHAN, NBIN = 4096, 2048
TWO_PI = 2.0 * np.pi

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if "--platform" in sys.argv:
    jax.config.update("jax_platforms",
                      sys.argv[sys.argv.index("--platform") + 1])
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pp_jax_compilation_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from pulseportraiture_tpu.fitters.stats import _phase_trig  # noqa: E402
from pulseportraiture_tpu.ops.ct_dft import ct_kvec  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(0)
NH = NBIN // 2 + 1
Gr = jax.device_put(jnp.asarray(
    rng.normal(0, 1, (B, NCHAN, NH)).astype(np.float32)))
Gi = jax.device_put(jnp.asarray(
    rng.normal(0, 1, (B, NCHAN, NH)).astype(np.float32)))
phis = jax.device_put(jnp.asarray(
    rng.uniform(-0.5, 0.5, (B, NCHAN)).astype(np.float32)))
kvec = jnp.asarray(ct_kvec(NBIN), jnp.float32)
NQ = NBIN // 128
nk = (NH // 128) * 128


@jax.jit
def plain(phis, Gr, Gi):
    Pr, Pi = _phase_trig(phis, kvec)
    zr = Gr * Pr - Gi * Pi
    zi = Gr * Pi + Gi * Pr
    C = jnp.sum(zr, axis=-1)
    Cp = (-TWO_PI) * jnp.sum(kvec * zi, axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(kvec * kvec * zr, axis=-1)
    return C, Cp, Cpp


lane = np.arange(128)
K0 = jnp.asarray((NQ * (lane % 64) + lane // 64).astype(np.float32))
G = nk // 128
G2 = jnp.asarray((2.0 * np.arange(G)).astype(np.float32))
KT = kvec[nk:]


@jax.jit
def factored(phis, Gr, Gi):
    P0r, P0i = _phase_trig(phis, K0)            # (B, nchan, 128)
    cg, sg = _phase_trig(phis, G2)              # (B, nchan, G)
    Gr4 = Gr[..., :nk].reshape(B, NCHAN, G, 128)
    Gi4 = Gi[..., :nk].reshape(B, NCHAN, G, 128)
    Pr = P0r[..., None, :] * cg[..., :, None] - \
        P0i[..., None, :] * sg[..., :, None]
    Pi = P0r[..., None, :] * sg[..., :, None] + \
        P0i[..., None, :] * cg[..., :, None]
    zr = Gr4 * Pr - Gi4 * Pi
    zi = Gr4 * Pi + Gi4 * Pr
    w1 = K0[None, :] + G2[:, None]              # (G, 128)
    C = jnp.sum(zr, axis=(-2, -1))
    Cp = (-TWO_PI) * jnp.sum(w1 * zi, axis=(-2, -1))
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum((w1 * w1) * zr, axis=(-2, -1))
    # Nyquist tail (positions beyond nk)
    c, s = _phase_trig(phis, KT)
    gr_t, gi_t = Gr[..., nk:], Gi[..., nk:]
    tzr = gr_t * c - gi_t * s
    tzi = gr_t * s + gi_t * c
    C = C + jnp.sum(tzr, axis=-1)
    Cp = Cp + (-TWO_PI) * jnp.sum(KT * tzi, axis=-1)
    Cpp = Cpp + (-TWO_PI * TWO_PI) * jnp.sum(KT * KT * tzr, axis=-1)
    return C, Cp, Cpp


@jax.jit
def pallas_ct(phis, Gr, Gi):
    from pulseportraiture_tpu.ops.pallas_moments import phase_moments
    return jax.vmap(lambda p, a, b: phase_moments(p, a, b, kvec=kvec))(
        phis, Gr, Gi)


@jax.jit
def single(phis, Gr, Gi):
    """C only — is ONE fused reduce at the 2-stream read ceiling?"""
    Pr, Pi = _phase_trig(phis, kvec)
    zr = Gr * Pr - Gi * Pi
    C = jnp.sum(zr, axis=-1)
    return C, C, C


@jax.jit
def two_zr(phis, Gr, Gi):
    """C + Cpp (both consume zr) — does a 2-output reduce fuse?"""
    Pr, Pi = _phase_trig(phis, kvec)
    zr = Gr * Pr - Gi * Pi
    C = jnp.sum(zr, axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(kvec * kvec * zr, axis=-1)
    return C, Cpp, Cpp


W2 = jnp.stack([jnp.ones_like(kvec), kvec * kvec], axis=-1)  # (NH, 2)


@jax.jit
def dots(phis, Gr, Gi):
    """reductions as MXU matvecs: zr @ [1, k^2], zi @ k."""
    Pr, Pi = _phase_trig(phis, kvec)
    zr = Gr * Pr - Gi * Pi
    zi = Gr * Pi + Gi * Pr
    a = jnp.einsum("bck,kj->bcj", zr, W2,
                   preferred_element_type=jnp.float32)
    Cp = (-TWO_PI) * jnp.einsum("bck,k->bc", zi, kvec,
                                preferred_element_type=jnp.float32)
    return a[..., 0], Cp, (-TWO_PI * TWO_PI) * a[..., 1]


# ---- pre-split operands: aligned (B, nchan, 1024) main + (B, nchan)
# Nyquist side arrays (the candidate layout surgery) ----
GrM = Gr[..., :nk]
GiM = Gi[..., :nk]
GrN = Gr[..., nk]
GiN = Gi[..., nk]
GrM, GiM, GrN, GiN = jax.device_put((GrM, GiM, GrN, GiN))
KN = float(NBIN // 2)
KVM = kvec[:nk]


@jax.jit
def split_factored(phis, GrM, GiM, GrN, GiN):
    P0r, P0i = _phase_trig(phis, K0)
    cg, sg = _phase_trig(phis, G2)
    Gr4 = GrM.reshape(B, NCHAN, G, 128)
    Gi4 = GiM.reshape(B, NCHAN, G, 128)
    Pr = P0r[..., None, :] * cg[..., :, None] - \
        P0i[..., None, :] * sg[..., :, None]
    Pi = P0r[..., None, :] * sg[..., :, None] + \
        P0i[..., None, :] * cg[..., :, None]
    zr = Gr4 * Pr - Gi4 * Pi
    zi = Gr4 * Pi + Gi4 * Pr
    w1 = K0[None, :] + G2[:, None]
    C = jnp.sum(zr, axis=(-2, -1))
    Cp = (-TWO_PI) * jnp.sum(w1 * zi, axis=(-2, -1))
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum((w1 * w1) * zr, axis=(-2, -1))
    cn, sn = _phase_trig(phis, jnp.asarray([KN], jnp.float32))
    cn, sn = cn[..., 0], sn[..., 0]
    tzr = GrN * cn - GiN * sn
    tzi = GrN * sn + GiN * cn
    C = C + tzr
    Cp = Cp + (-TWO_PI) * KN * tzi
    Cpp = Cpp + (-TWO_PI * TWO_PI) * (KN * KN) * tzr
    return C, Cp, Cpp


@jax.jit
def split_plain(phis, GrM, GiM, GrN, GiN):
    Pr, Pi = _phase_trig(phis, KVM)
    zr = GrM * Pr - GiM * Pi
    zi = GrM * Pi + GiM * Pr
    C = jnp.sum(zr, axis=-1)
    Cp = (-TWO_PI) * jnp.sum(KVM * zi, axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(KVM * KVM * zr, axis=-1)
    cn, sn = _phase_trig(phis, jnp.asarray([KN], jnp.float32))
    cn, sn = cn[..., 0], sn[..., 0]
    tzr = GrN * cn - GiN * sn
    tzi = GrN * sn + GiN * cn
    C = C + tzr
    Cp = Cp + (-TWO_PI) * KN * tzi
    Cpp = Cpp + (-TWO_PI * TWO_PI) * (KN * KN) * tzr
    return C, Cp, Cpp


def timed(fn, reps=12, split=False):
    args = (phis, GrM, GiM, GrN, GiN) if split else (phis, Gr, Gi)
    o = fn(*args)
    np.asarray(o[0])
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    np.asarray(outs[-1][0])
    return (time.time() - t0) / reps, o


gb = 2 * B * NCHAN * NH * 4 / 1e9
base = None
for name, fn in (("plain XLA", plain), ("factored XLA", factored),
                 ("pallas CT", pallas_ct), ("single C", single),
                 ("two-zr", two_zr), ("dots MXU", dots),
                 ("split factored", split_factored),
                 ("split plain", split_plain)):
    try:
        dt, o = timed(fn, split=name.startswith("split"))
    except Exception as e:
        print(f"{name:14s}  FAILED: {type(e).__name__}: {e}", flush=True)
        continue
    o = tuple(np.asarray(x) for x in o)
    if base is None:
        base = o
        rel = 0.0
    else:
        rel = max(np.max(np.abs(a - b) /
                         (np.abs(b).max() + 1e-30))
                  for a, b in zip(o, base))
    print(f"{name:14s}  {dt * 1e3:8.2f} ms  {gb / dt:7.1f} GB/s  "
          f"rel-vs-plain {rel:.2e}", flush=True)
