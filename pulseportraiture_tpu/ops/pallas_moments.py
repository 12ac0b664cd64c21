"""Pallas TPU kernel: fused harmonic moments for the wideband fit.

The (phi, DM) Newton iteration needs three harmonic reductions per
channel of the cross-spectrum G = d * conj(m) under a phase ramp
theta_n = 2 pi phis[n] (reference pptoaslib.py:424-523, specialized to
zero scattering):

    C_n   =           sum_k Re(G_nk e^{i theta_n k})
    Cp_n  = -2 pi     sum_k k   Im(G_nk e^{i theta_n k})
    Cpp_n = -4 pi^2   sum_k k^2 Re(G_nk e^{i theta_n k})

XLA emits this as a fused elementwise+reduce too, but materializes the
trig intermediates between the value/grad/hess consumers in some
batched-while-loop contexts; this kernel guarantees ONE pass over G per
Newton iteration at HBM-bandwidth speed: read 8 bytes/element, do one
complex multiply per element (the transcendentals run on nk/128 + 128
values per channel via phasor factorization), accumulate all three
moments in VMEM.

Channel weights are applied by the caller (they multiply the per-channel
outputs, not the harmonic elements).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pulseportraiture_tpu.fitters.stats import _phase_trig

TWO_PI = 2.0 * np.pi

# harmonic lanes per inner step: one full VPU lane vector
_LANES = 128


def _chan_block(nchan, cap=256):
    """Channels per program: large blocks amortize grid overhead; small
    portraits get one padded-to-sublane block (16 covers the bf16 tile).
    cap bounds the scoped-VMEM footprint (the 9-accumulator scattering
    kernel overflows the 16 MB scoped limit above 64 channels/program).
    PP_MOMENTS_CBLK overrides the phase-kernel cap (perf experiments)."""
    import os
    env = os.environ.get("PP_MOMENTS_CBLK")
    if env and cap >= 256:
        cap = int(env)
    if nchan >= cap:
        return cap
    return nchan + ((-nchan) % 16)


def _phase_kernel(phis_ref, gr_ref, gi_ref, out_ref):
    """Single-pass moments over a (CBLK, nk) block, nk % 128 == 0.

    The phasor e^{2 pi i t k} is factored as e^{i t 128 q} * e^{i t r}
    (k = 128 q + r): double-single trig runs on nk/128 + 128 values per
    channel instead of nk, and each element costs one complex multiply
    on the VPU.  Accumulators stay full lane vectors; the cross-lane
    reduce happens once at the end.
    """
    phis = phis_ref[:]                      # (CBLK, 1)
    p = phis[:, 0]
    nk = gr_ref.shape[-1]
    nq = nk // _LANES
    f32 = jnp.float32
    # Mosaic requires integer iota results; cast to f32 afterwards.
    kr = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1).astype(
        jnp.float32)
    kq = (jax.lax.broadcasted_iota(jnp.int32, (1, nq), 1) *
          _LANES).astype(jnp.float32)
    cr, sr = _phase_trig(p, kr)             # (CBLK, 128)
    cq, sq = _phase_trig(p, kq)             # (CBLK, nq)
    accC = jnp.zeros_like(cr)
    accCp = jnp.zeros_like(cr)
    accCpp = jnp.zeros_like(cr)
    for q in range(nq):
        gr = gr_ref[:, q * _LANES:(q + 1) * _LANES].astype(f32)
        gi = gi_ref[:, q * _LANES:(q + 1) * _LANES].astype(f32)
        cqq = cq[:, q:q + 1]
        sqq = sq[:, q:q + 1]
        Pr = cqq * cr - sqq * sr
        Pi = cqq * sr + sqq * cr
        zr = gr * Pr - gi * Pi              # Re(G e^{i ang})
        zi = gr * Pi + gi * Pr              # Im(G e^{i ang})
        w1 = kr + jnp.float32(q * _LANES)
        accC = accC + zr
        accCp = accCp + w1 * zi
        accCpp = accCpp + (w1 * w1) * zr
    C = jnp.sum(accC, axis=-1)
    Cp = (-TWO_PI) * jnp.sum(accCp, axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(accCpp, axis=-1)
    out_ref[:] = jnp.stack([C, Cp, Cpp], axis=-1)


def _phase_kernel_kvec(phis_ref, k_ref, gr_ref, gi_ref, out_ref):
    """Moments with an arbitrary per-lane harmonic vector (the CT-
    permuted layout from ops.ct_dft): per-element double-single trig
    (hi*k stays exact: hi <= 2^12/8192, k <= 2^11), with the same
    128-lane blocked accumulation as the natural-order kernel (one
    cross-lane reduce at the end, not per row)."""
    phis = phis_ref[:]
    p = phis[:, 0]
    nk = gr_ref.shape[-1]
    nq = nk // _LANES
    accC = None
    accCp = None
    accCpp = None
    for q in range(nq):
        sl = slice(q * _LANES, (q + 1) * _LANES)
        kq = k_ref[:, sl]                   # (1, 128)
        c, s = _phase_trig(p, kq)           # (CBLK, 128)
        gr = gr_ref[:, sl].astype(jnp.float32)
        gi = gi_ref[:, sl].astype(jnp.float32)
        zr = gr * c - gi * s
        zi = gr * s + gi * c
        accC = zr if accC is None else accC + zr
        t = kq * zi
        accCp = t if accCp is None else accCp + t
        t2 = (kq * kq) * zr
        accCpp = t2 if accCpp is None else accCpp + t2
    C = jnp.sum(accC, axis=-1)
    Cp = (-TWO_PI) * jnp.sum(accCp, axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(accCpp, axis=-1)
    out_ref[:] = jnp.stack([C, Cp, Cpp], axis=-1)


def _make_phase_kernel_ct(NQ):
    """Factored-phasor moments kernel for the CT layout of ops.ct_dft:
    position p = u*64 + m holds k = NQ*m + u.  Group g's 128 lanes are
    the u = 2g and u = 2g+1 blocks, i.e. k = k0 + 2g with the FIXED
    lane pattern k0 = [NQ*m | NQ*m + 1] — so the group phasor is the
    base phasor P0 = e^{2 pi i phi k0} (double-single trig, once)
    rotated by the per-channel scalar e^{2 pi i phi 2g}.  No per-group
    lane concatenates/broadcasts: the harmonic weights k0+2g and
    (k0+2g)^2 are trace-time constants, and the rotation is 6 FMAs on
    full lane vectors — the kernel streams Gr/Gi at close to the
    2-stream HBM ceiling instead of burning VPU issue slots on copies."""
    def kernel(phis_ref, gr_ref, gi_ref, out_ref):
        phis = phis_ref[:]
        p = phis[:, 0]
        nk = gr_ref.shape[-1]
        ngroups = nk // _LANES
        # lane pattern k0 = [NQ*m | NQ*m + 1] built from iota (Mosaic
        # rejects captured host constants; integer iota only)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        k0 = (NQ * (lane % 64) + lane // 64).astype(jnp.float32)
        P0r, P0i = _phase_trig(p, k0)                     # (CBLK, 128)
        g2 = (2.0 * jax.lax.broadcasted_iota(
            jnp.int32, (1, ngroups), 1).astype(jnp.float32))
        cg, sg = _phase_trig(p, g2)                       # (CBLK, ngroups)
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
            gr = gr_ref[:, sl].astype(jnp.float32)
            gi = gi_ref[:, sl].astype(jnp.float32)
            zr = gr * Pr - gi * Pi
            zi = gr * Pi + gi * Pr
            accC = zr if accC is None else accC + zr
            t = w1 * zi
            accCp = t if accCp is None else accCp + t
            t2 = w2 * zr
            accCpp = t2 if accCpp is None else accCpp + t2
        C = jnp.sum(accC, axis=-1)
        Cp = (-TWO_PI) * jnp.sum(accCp, axis=-1)
        Cpp = (-TWO_PI * TWO_PI) * jnp.sum(accCpp, axis=-1)
        out_ref[:] = jnp.stack([C, Cp, Cpp], axis=-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("ct_nbin", "interpret"))
def _phase_moments_ct_impl(phis, kvec, Gr, Gi, ct_nbin, interpret=False):
    """Moments over the CT-permuted layout: the kernel handles the
    NQ*64 block-structured lanes; the trailing Nyquist position (plus
    anything beyond a 128 multiple) is added in XLA via kvec."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NQ = ct_nbin // _LANES
    assert Gr.ndim == 2
    half = (jnp.bfloat16, jnp.float16)
    orig_dtype = jnp.float32 if Gr.dtype in half else Gr.dtype
    phis = phis.astype(jnp.float32)
    if Gr.dtype not in half:
        Gr = Gr.astype(jnp.float32)
        Gi = Gi.astype(jnp.float32)
    nchan, nharm = Gr.shape
    nk = (nharm // _LANES) * _LANES       # == NQ*64 (Nyquist in tail)
    cblk = _chan_block(nchan)
    pad = (-nchan) % cblk
    if pad:
        Gr = jnp.pad(Gr, [(0, pad), (0, 0)])
        Gi = jnp.pad(Gi, [(0, pad), (0, 0)])
        phis = jnp.pad(phis, [(0, pad)])
    ntot = nchan + pad
    grid = (ntot // cblk,)
    out = pl.pallas_call(
        _make_phase_kernel_ct(NQ),
        out_shape=jax.ShapeDtypeStruct((ntot, 3), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((cblk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cblk, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cblk, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cblk, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phis[..., None], Gr, Gi)
    out = out[:nchan, :]
    C, Cp, Cpp = out[..., 0], out[..., 1], out[..., 2]
    if nharm > nk:
        phis_n = phis[:nchan]
        k_t = jnp.asarray(kvec[nk:], jnp.float32)
        c, s = _phase_trig(phis_n, k_t)
        gr_t = Gr[:nchan, nk:]
        gi_t = Gi[:nchan, nk:]
        zr = gr_t * c - gi_t * s
        zi = gr_t * s + gi_t * c
        C = C + jnp.sum(zr, axis=-1)
        Cp = Cp + (-TWO_PI) * jnp.sum(k_t * zi, axis=-1)
        Cpp = Cpp + (-TWO_PI * TWO_PI) * jnp.sum(k_t * k_t * zr, axis=-1)
    return (C.astype(orig_dtype), Cp.astype(orig_dtype),
            Cpp.astype(orig_dtype))


def _ct_layout_nbin(kvec, nharm):
    """Static nbin when kvec matches the ct_dft layout, else None."""
    import numpy as np

    from pulseportraiture_tpu.ops.ct_dft import ct_kvec, ct_supported
    if kvec is None or isinstance(kvec, jax.core.Tracer):
        return None
    nbin = 2 * (nharm - 1)
    if not ct_supported(nbin):
        return None
    ref = ct_kvec(nbin)
    kv = np.asarray(kvec)
    if kv.shape == ref.shape and np.array_equal(kv, ref):
        return nbin
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _phase_moments_kvec_impl(phis, kvec, Gr, Gi, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert Gr.ndim == 2
    half = (jnp.bfloat16, jnp.float16)
    orig_dtype = jnp.float32 if Gr.dtype in half else Gr.dtype
    phis = phis.astype(jnp.float32)
    kvec = kvec.astype(jnp.float32)
    if Gr.dtype not in half:
        Gr = Gr.astype(jnp.float32)
        Gi = Gi.astype(jnp.float32)
    nchan, nharm = Gr.shape
    nk = (nharm // _LANES) * _LANES
    if nk == 0:
        out = phase_moments_reference(phis, Gr, Gi, kvec=kvec)
        return tuple(o.astype(orig_dtype) for o in out)
    cblk = _chan_block(nchan)
    pad = (-nchan) % cblk
    if pad:
        Gr = jnp.pad(Gr, [(0, pad), (0, 0)])
        Gi = jnp.pad(Gi, [(0, pad), (0, 0)])
        phis = jnp.pad(phis, [(0, pad)])
    ntot = nchan + pad
    grid = (ntot // cblk,)
    out = pl.pallas_call(
        _phase_kernel_kvec,
        out_shape=jax.ShapeDtypeStruct((ntot, 3), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((cblk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cblk, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cblk, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cblk, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phis[..., None], kvec[None, :], Gr, Gi)
    out = out[:nchan, :]
    C, Cp, Cpp = out[..., 0], out[..., 1], out[..., 2]
    if nharm > nk:
        phis_n = phis[:nchan]
        k_t = kvec[nk:]
        c, s = _phase_trig(phis_n, k_t)
        gr_t = Gr[:nchan, nk:]
        gi_t = Gi[:nchan, nk:]
        zr = gr_t * c - gi_t * s
        zi = gr_t * s + gi_t * c
        C = C + jnp.sum(zr, axis=-1)
        Cp = Cp + (-TWO_PI) * jnp.sum(k_t * zi, axis=-1)
        Cpp = Cpp + (-TWO_PI * TWO_PI) * jnp.sum(k_t * k_t * zr, axis=-1)
    return (C.astype(orig_dtype), Cp.astype(orig_dtype),
            Cpp.astype(orig_dtype))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _phase_moments_impl(phis, Gr, Gi, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert Gr.ndim == 2, "2-D (nchan, nharm) only; vmap for batches"
    half = (jnp.bfloat16, jnp.float16)
    orig_dtype = jnp.float32 if Gr.dtype in half else Gr.dtype
    phis = phis.astype(jnp.float32)
    if Gr.dtype not in half:     # half stays half: storage-only format
        Gr = Gr.astype(jnp.float32)
        Gi = Gi.astype(jnp.float32)
    nchan, nharm = Gr.shape
    nk = (nharm // _LANES) * _LANES
    if nk == 0:
        out = phase_moments_reference(phis, Gr, Gi)
        return tuple(o.astype(orig_dtype) for o in out)
    cblk = _chan_block(nchan)
    # pad channels to the block size
    pad = (-nchan) % cblk
    if pad:
        Gr = jnp.pad(Gr, [(0, pad), (0, 0)])
        Gi = jnp.pad(Gi, [(0, pad), (0, 0)])
        phis = jnp.pad(phis, [(0, pad)])
    ntot = nchan + pad
    grid = (ntot // cblk,)

    out = pl.pallas_call(
        _phase_kernel,
        out_shape=jax.ShapeDtypeStruct((ntot, 3), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((cblk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # (cblk, nk) blocks of the (ntot, nharm) array: the kernel
            # covers full 128-lane groups; the tail harmonics (nharm is
            # typically 2^m + 1, so one Nyquist lane) are added in XLA.
            pl.BlockSpec((cblk, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cblk, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cblk, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phis[..., None], Gr, Gi)
    out = out[:nchan, :]
    C, Cp, Cpp = out[..., 0], out[..., 1], out[..., 2]
    if nharm > nk:
        phis_n = phis[:nchan]
        k_t = jnp.arange(nk, nharm, dtype=jnp.float32)
        c, s = _phase_trig(phis_n, k_t)
        gr_t = Gr[:nchan, nk:]
        gi_t = Gi[:nchan, nk:]
        zr = gr_t * c - gi_t * s
        zi = gr_t * s + gi_t * c
        C = C + jnp.sum(zr, axis=-1)
        Cp = Cp + (-TWO_PI) * jnp.sum(k_t * zi, axis=-1)
        Cpp = Cpp + (-TWO_PI * TWO_PI) * jnp.sum(k_t * k_t * zr, axis=-1)
    return (C.astype(orig_dtype), Cp.astype(orig_dtype),
            Cpp.astype(orig_dtype))


def phase_moments(phis, Gr, Gi, interpret=None, kvec=None):
    """(C, Cp, Cpp) each (..., nchan) from phis (..., nchan) and
    Gr/Gi (..., nchan, nharm) float32.

    kvec: optional per-lane harmonic numbers (nharm,) for permuted
    layouts (ops.ct_dft); None means natural order 0..nharm-1.
    interpret=None auto-selects the Pallas interpreter off-TPU so the
    kernel stays runnable (slowly) on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if kvec is not None:
        ct_nbin = _ct_layout_nbin(kvec, Gr.shape[-1])
        if ct_nbin:
            return _phase_moments_ct_impl(phis, kvec, Gr, Gi,
                                          ct_nbin=ct_nbin,
                                          interpret=interpret)
        return _phase_moments_kvec_impl(phis, kvec, Gr, Gi,
                                        interpret=interpret)
    return _phase_moments_impl(phis, Gr, Gi, interpret=interpret)


def phase_moments_reference(phis, Gr, Gi, kvec=None):
    """Pure-jnp reference implementation (for tests and CPU)."""
    nharm = Gr.shape[-1]
    kdt = jnp.float32 if Gr.dtype in (jnp.bfloat16, jnp.float16) \
        else Gr.dtype
    k = jnp.arange(nharm, dtype=kdt) if kvec is None else \
        jnp.asarray(kvec, kdt)
    c, s = _phase_trig(phis, k)
    zr = Gr * c - Gi * s
    zi = Gr * s + Gi * c
    C = jnp.sum(zr, axis=-1)
    Cp = (-TWO_PI) * jnp.sum(k * zi, axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(k * k * zr, axis=-1)
    return C, Cp, Cpp


def _scat_kernel(phis_ref, taus_ref, gr_ref, gi_ref, m2_ref, out_ref):
    """Full-scattering moments: 9 harmonic reductions in one pass.

    Mirrors fitters.stats._moments order=2 (reference pptoaslib.py
    318-523): phasor x scattering-FT algebra with B = 1/(1 + i c tau),
    f = dB/dtau = -2 pi i k B^2, g2 = d2B/dtau2 = -8 pi^2 k^2 B^3.
    Same blocked/factored-phasor structure as _phase_kernel.
    """
    phis = phis_ref[:]
    taus = taus_ref[:]
    p = phis[:, 0]
    nk = gr_ref.shape[-1]
    nq = nk // _LANES
    # Mosaic requires integer iota results; cast to f32 afterwards.
    kr = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1).astype(
        jnp.float32)
    kq = (jax.lax.broadcasted_iota(jnp.int32, (1, nq), 1) *
          _LANES).astype(jnp.float32)
    cqv, sqv = _phase_trig(p, kq)
    crv, srv = _phase_trig(p, kr)
    acc = [jnp.zeros_like(crv) for _ in range(9)]
    for q in range(nq):
        gr = gr_ref[:, q * _LANES:(q + 1) * _LANES].astype(jnp.float32)
        gi = gi_ref[:, q * _LANES:(q + 1) * _LANES].astype(jnp.float32)
        m2 = m2_ref[:, q * _LANES:(q + 1) * _LANES].astype(jnp.float32)
        cqq = cqv[:, q:q + 1]
        sqq = sqv[:, q:q + 1]
        Pr = cqq * crv - sqq * srv
        Pi = cqq * srv + sqq * crv
        k = kr + jnp.float32(q * _LANES)

        ct = TWO_PI * k * taus
        Bden = 1.0 + ct * ct
        Br = 1.0 / Bden
        Bi = -ct / Bden
        Ar = gr * Br + gi * Bi
        Ai = gi * Br - gr * Bi
        zr = Ar * Pr - Ai * Pi
        zi = Ar * Pi + Ai * Pr
        B2 = Br * Br + Bi * Bi

        cb2r = Br * Br - Bi * Bi
        cb2i = -2.0 * Br * Bi
        cfr = TWO_PI * k * (-cb2i)
        cfi = TWO_PI * k * cb2r
        GPr = gr * Pr - gi * Pi
        GPi = gr * Pi + gi * Pr
        zfr = GPr * cfr - GPi * cfi
        zfi = GPr * cfi + GPi * cfr
        u1 = 2.0 * (Br * cfr - Bi * cfi)

        cb3r = cb2r * Br + cb2i * Bi
        cb3i = -cb2r * Bi + cb2i * Br
        w2k2 = -(TWO_PI ** 2) * 2.0 * k * k
        cgr = w2k2 * cb3r
        cgi = w2k2 * cb3i
        zgr = GPr * cgr - GPi * cgi
        f2 = cfr * cfr + cfi * cfi
        u2 = 2.0 * (f2 + (Br * cgr - Bi * cgi))

        acc[0] = acc[0] + zr
        acc[1] = acc[1] + B2 * m2
        acc[2] = acc[2] + k * zi
        acc[3] = acc[3] + zfr
        acc[4] = acc[4] + u1 * m2
        acc[5] = acc[5] + (k * k) * zr
        acc[6] = acc[6] + k * zfi
        acc[7] = acc[7] + zgr
        acc[8] = acc[8] + u2 * m2
    C = jnp.sum(acc[0], axis=-1)
    S = jnp.sum(acc[1], axis=-1)
    Cp = (-TWO_PI) * jnp.sum(acc[2], axis=-1)
    Rf = jnp.sum(acc[3], axis=-1)
    S1 = jnp.sum(acc[4], axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(acc[5], axis=-1)
    If1 = (-TWO_PI) * jnp.sum(acc[6], axis=-1)
    Rg = jnp.sum(acc[7], axis=-1)
    S2 = jnp.sum(acc[8], axis=-1)
    out_ref[:] = jnp.stack([C, S, Cp, Rf, S1, Cpp, If1, Rg, S2], axis=-1)


def _scat_terms_ref(phis, taus, Gr, Gi, M2, k):
    """jnp evaluation of the 9 scattering reductions (any k range)."""
    c, s = _phase_trig(phis, k)
    taus_e = taus[..., None]
    ct = TWO_PI * k * taus_e
    Bden = 1.0 + ct * ct
    Br = 1.0 / Bden
    Bi = -ct / Bden
    Ar = Gr * Br + Gi * Bi
    Ai = Gi * Br - Gr * Bi
    zr = Ar * c - Ai * s
    zi = Ar * s + Ai * c
    B2 = Br * Br + Bi * Bi

    cb2r = Br * Br - Bi * Bi
    cb2i = -2.0 * Br * Bi
    cfr = TWO_PI * k * (-cb2i)
    cfi = TWO_PI * k * cb2r
    GPr = Gr * c - Gi * s
    GPi = Gr * s + Gi * c
    zfr = GPr * cfr - GPi * cfi
    zfi = GPr * cfi + GPi * cfr
    u1 = 2.0 * (Br * cfr - Bi * cfi)

    cb3r = cb2r * Br + cb2i * Bi
    cb3i = -cb2r * Bi + cb2i * Br
    w2k2 = -(TWO_PI ** 2) * 2.0 * k * k
    cgr = w2k2 * cb3r
    cgi = w2k2 * cb3i
    zgr = GPr * cgr - GPi * cgi
    f2 = cfr * cfr + cfi * cfi
    u2 = 2.0 * (f2 + (Br * cgr - Bi * cgi))

    C = jnp.sum(zr, axis=-1)
    S = jnp.sum(B2 * M2, axis=-1)
    Cp = (-TWO_PI) * jnp.sum(k * zi, axis=-1)
    Rf = jnp.sum(zfr, axis=-1)
    S1 = jnp.sum(u1 * M2, axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(k * k * zr, axis=-1)
    If1 = (-TWO_PI) * jnp.sum(k * zfi, axis=-1)
    Rg = jnp.sum(zgr, axis=-1)
    S2 = jnp.sum(u2 * M2, axis=-1)
    return C, S, Cp, Rf, S1, Cpp, If1, Rg, S2


def _make_scat_kernel_ct(NQ):
    """Scattering moments for the CT layout (factored phasor; see
    _make_phase_kernel_ct)."""

    def kernel(phis_ref, taus_ref, gr_ref, gi_ref, m2_ref, out_ref):
        phis = phis_ref[:]
        taus = taus_ref[:]
        p = phis[:, 0]
        nk = gr_ref.shape[-1]
        ngroups = nk // _LANES
        m64 = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1).astype(
            jnp.float32)
        cm, sm = _phase_trig(jnp.float32(NQ) * p, m64)
        cmt = jnp.concatenate([cm, cm], axis=-1)
        smt = jnp.concatenate([sm, sm], axis=-1)
        ku = jax.lax.broadcasted_iota(jnp.int32, (1, NQ), 1).astype(
            jnp.float32)
        cu, su = _phase_trig(p, ku)
        km = jnp.float32(NQ) * m64
        cb = cm.shape[0]
        acc = [None] * 9
        for g in range(ngroups):
            u0, u1 = 2 * g, 2 * g + 1
            cuv = jnp.concatenate(
                [jnp.broadcast_to(cu[:, u0:u0 + 1], (cb, 64)),
                 jnp.broadcast_to(cu[:, u1:u1 + 1], (cb, 64))], axis=-1)
            suv = jnp.concatenate(
                [jnp.broadcast_to(su[:, u0:u0 + 1], (cb, 64)),
                 jnp.broadcast_to(su[:, u1:u1 + 1], (cb, 64))], axis=-1)
            Pr = cmt * cuv - smt * suv
            Pi = cmt * suv + smt * cuv
            k = jnp.concatenate([km + jnp.float32(u0),
                                 km + jnp.float32(u1)], axis=-1)
            sl = slice(g * _LANES, (g + 1) * _LANES)
            gr = gr_ref[:, sl].astype(jnp.float32)
            gi = gi_ref[:, sl].astype(jnp.float32)
            m2 = m2_ref[:, sl].astype(jnp.float32)

            ct = TWO_PI * k * taus
            Bden = 1.0 + ct * ct
            Br = 1.0 / Bden
            Bi = -ct / Bden
            Ar = gr * Br + gi * Bi
            Ai = gi * Br - gr * Bi
            zr = Ar * Pr - Ai * Pi
            zi = Ar * Pi + Ai * Pr
            B2 = Br * Br + Bi * Bi

            cb2r = Br * Br - Bi * Bi
            cb2i = -2.0 * Br * Bi
            cfr = TWO_PI * k * (-cb2i)
            cfi = TWO_PI * k * cb2r
            GPr = gr * Pr - gi * Pi
            GPi = gr * Pi + gi * Pr
            zfr = GPr * cfr - GPi * cfi
            zfi = GPr * cfi + GPi * cfr
            u1t = 2.0 * (Br * cfr - Bi * cfi)

            cb3r = cb2r * Br + cb2i * Bi
            cb3i = -cb2r * Bi + cb2i * Br
            w2k2 = -(TWO_PI ** 2) * 2.0 * k * k
            cgr = w2k2 * cb3r
            cgi = w2k2 * cb3i
            zgr = GPr * cgr - GPi * cgi
            f2 = cfr * cfr + cfi * cfi
            u2 = 2.0 * (f2 + (Br * cgr - Bi * cgi))

            terms = [zr, B2 * m2, k * zi, zfr, u1t * m2, (k * k) * zr,
                     k * zfi, zgr, u2 * m2]
            acc = [t if a is None else a + t for a, t in zip(acc, terms)]
        C = jnp.sum(acc[0], axis=-1)
        S = jnp.sum(acc[1], axis=-1)
        Cp = (-TWO_PI) * jnp.sum(acc[2], axis=-1)
        Rf = jnp.sum(acc[3], axis=-1)
        S1 = jnp.sum(acc[4], axis=-1)
        Cpp = (-TWO_PI * TWO_PI) * jnp.sum(acc[5], axis=-1)
        If1 = (-TWO_PI) * jnp.sum(acc[6], axis=-1)
        Rg = jnp.sum(acc[7], axis=-1)
        S2 = jnp.sum(acc[8], axis=-1)
        out_ref[:] = jnp.stack([C, S, Cp, Rf, S1, Cpp, If1, Rg, S2],
                               axis=-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("ct_nbin", "interpret"))
def _scattering_moments_ct_impl(phis, taus, kvec, Gr, Gi, M2, ct_nbin,
                                interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NQ = ct_nbin // _LANES
    assert Gr.ndim == 2
    half = (jnp.bfloat16, jnp.float16)
    orig_dtype = jnp.float32 if Gr.dtype in half else Gr.dtype
    phis = phis.astype(jnp.float32)
    taus = taus.astype(jnp.float32)
    if Gr.dtype not in half:
        Gr = Gr.astype(jnp.float32)
        Gi = Gi.astype(jnp.float32)
        M2 = M2.astype(jnp.float32)
    nchan, nharm = Gr.shape
    nk = (nharm // _LANES) * _LANES
    cblk = _chan_block(nchan, cap=64)
    pad = (-nchan) % cblk
    if pad:
        Gr = jnp.pad(Gr, [(0, pad), (0, 0)])
        Gi = jnp.pad(Gi, [(0, pad), (0, 0)])
        M2 = jnp.pad(M2, [(0, pad), (0, 0)])
        phis = jnp.pad(phis, [(0, pad)])
        taus = jnp.pad(taus, [(0, pad)])
    ntot = nchan + pad
    grid = (ntot // cblk,)
    spec1 = pl.BlockSpec((cblk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    specH = pl.BlockSpec((cblk, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_scat_kernel_ct(NQ),
        out_shape=jax.ShapeDtypeStruct((ntot, 9), jnp.float32),
        grid=grid,
        in_specs=[spec1, spec1, specH, specH, specH],
        out_specs=pl.BlockSpec((cblk, 9), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phis[..., None], taus[..., None], Gr, Gi, M2)
    out = out[:nchan, :]
    outs = [out[..., j] for j in range(9)]
    if nharm > nk:
        k_t = jnp.asarray(kvec[nk:], jnp.float32)
        tail = _scat_terms_ref(phis[:nchan], taus[:nchan], Gr[:nchan, nk:],
                               Gi[:nchan, nk:], M2[:nchan, nk:], k_t)
        outs = [a + b for a, b in zip(outs, tail)]
    return tuple(o.astype(orig_dtype) for o in outs)


def _scat_kernel_kvec(phis_ref, taus_ref, k_ref, gr_ref, gi_ref, m2_ref,
                      out_ref):
    """Scattering moments with an arbitrary per-lane harmonic vector,
    blocked like _scat_kernel (one cross-lane reduce at the end)."""
    phis = phis_ref[:]
    taus = taus_ref[:]
    p = phis[:, 0]
    nk = gr_ref.shape[-1]
    nq = nk // _LANES
    acc = [None] * 9
    for q in range(nq):
        sl = slice(q * _LANES, (q + 1) * _LANES)
        k = k_ref[:, sl]                    # (1, 128)
        gr = gr_ref[:, sl].astype(jnp.float32)
        gi = gi_ref[:, sl].astype(jnp.float32)
        m2 = m2_ref[:, sl].astype(jnp.float32)
        Pr, Pi = _phase_trig(p, k)

        ct = TWO_PI * k * taus
        Bden = 1.0 + ct * ct
        Br = 1.0 / Bden
        Bi = -ct / Bden
        Ar = gr * Br + gi * Bi
        Ai = gi * Br - gr * Bi
        zr = Ar * Pr - Ai * Pi
        zi = Ar * Pi + Ai * Pr
        B2 = Br * Br + Bi * Bi

        cb2r = Br * Br - Bi * Bi
        cb2i = -2.0 * Br * Bi
        cfr = TWO_PI * k * (-cb2i)
        cfi = TWO_PI * k * cb2r
        GPr = gr * Pr - gi * Pi
        GPi = gr * Pi + gi * Pr
        zfr = GPr * cfr - GPi * cfi
        zfi = GPr * cfi + GPi * cfr
        u1 = 2.0 * (Br * cfr - Bi * cfi)

        cb3r = cb2r * Br + cb2i * Bi
        cb3i = -cb2r * Bi + cb2i * Br
        w2k2 = -(TWO_PI ** 2) * 2.0 * k * k
        cgr = w2k2 * cb3r
        cgi = w2k2 * cb3i
        zgr = GPr * cgr - GPi * cgi
        f2 = cfr * cfr + cfi * cfi
        u2 = 2.0 * (f2 + (Br * cgr - Bi * cgi))

        terms = [zr, B2 * m2, k * zi, zfr, u1 * m2, (k * k) * zr,
                 k * zfi, zgr, u2 * m2]
        acc = [t if a is None else a + t for a, t in zip(acc, terms)]
    C = jnp.sum(acc[0], axis=-1)
    S = jnp.sum(acc[1], axis=-1)
    Cp = (-TWO_PI) * jnp.sum(acc[2], axis=-1)
    Rf = jnp.sum(acc[3], axis=-1)
    S1 = jnp.sum(acc[4], axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(acc[5], axis=-1)
    If1 = (-TWO_PI) * jnp.sum(acc[6], axis=-1)
    Rg = jnp.sum(acc[7], axis=-1)
    S2 = jnp.sum(acc[8], axis=-1)
    out_ref[:] = jnp.stack([C, S, Cp, Rf, S1, Cpp, If1, Rg, S2], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scattering_moments_kvec_impl(phis, taus, kvec, Gr, Gi, M2,
                                  interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert Gr.ndim == 2
    half = (jnp.bfloat16, jnp.float16)
    orig_dtype = jnp.float32 if Gr.dtype in half else Gr.dtype
    phis = phis.astype(jnp.float32)
    taus = taus.astype(jnp.float32)
    kvec = kvec.astype(jnp.float32)
    if Gr.dtype not in half:
        Gr = Gr.astype(jnp.float32)
        Gi = Gi.astype(jnp.float32)
        M2 = M2.astype(jnp.float32)
    nchan, nharm = Gr.shape
    nk = (nharm // _LANES) * _LANES
    if nk == 0:
        out = _scat_terms_ref(phis, taus, Gr, Gi, M2,
                              jnp.asarray(kvec, jnp.float32))
        return tuple(o.astype(orig_dtype) for o in out)
    cblk = _chan_block(nchan, cap=32)
    pad = (-nchan) % cblk
    if pad:
        Gr = jnp.pad(Gr, [(0, pad), (0, 0)])
        Gi = jnp.pad(Gi, [(0, pad), (0, 0)])
        M2 = jnp.pad(M2, [(0, pad), (0, 0)])
        phis = jnp.pad(phis, [(0, pad)])
        taus = jnp.pad(taus, [(0, pad)])
    ntot = nchan + pad
    grid = (ntot // cblk,)
    spec1 = pl.BlockSpec((cblk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    specH = pl.BlockSpec((cblk, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    speck = pl.BlockSpec((1, nk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _scat_kernel_kvec,
        out_shape=jax.ShapeDtypeStruct((ntot, 9), jnp.float32),
        grid=grid,
        in_specs=[spec1, spec1, speck, specH, specH, specH],
        out_specs=pl.BlockSpec((cblk, 9), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phis[..., None], taus[..., None], kvec[None, :], Gr, Gi, M2)
    out = out[:nchan, :]
    outs = [out[..., j] for j in range(9)]
    if nharm > nk:
        k_t = jnp.asarray(kvec[nk:], jnp.float32)
        tail = _scat_terms_ref(phis[:nchan], taus[:nchan], Gr[:nchan, nk:],
                               Gi[:nchan, nk:], M2[:nchan, nk:], k_t)
        outs = [a + b for a, b in zip(outs, tail)]
    return tuple(o.astype(orig_dtype) for o in outs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scattering_moments_impl(phis, taus, Gr, Gi, M2, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert Gr.ndim == 2, "2-D (nchan, nharm) only; vmap for batches"
    half = (jnp.bfloat16, jnp.float16)
    orig_dtype = jnp.float32 if Gr.dtype in half else Gr.dtype
    phis = phis.astype(jnp.float32)
    taus = taus.astype(jnp.float32)
    if Gr.dtype not in half:     # half stays half: storage-only format
        Gr = Gr.astype(jnp.float32)
        Gi = Gi.astype(jnp.float32)
        M2 = M2.astype(jnp.float32)
    nchan, nharm = Gr.shape
    nk = (nharm // _LANES) * _LANES
    if nk == 0:
        k = jnp.arange(nharm, dtype=jnp.float32)
        out = _scat_terms_ref(phis, taus, Gr, Gi, M2, k)
        return tuple(o.astype(orig_dtype) for o in out)
    cblk = _chan_block(nchan, cap=64)
    pad = (-nchan) % cblk
    if pad:
        Gr = jnp.pad(Gr, [(0, pad), (0, 0)])
        Gi = jnp.pad(Gi, [(0, pad), (0, 0)])
        M2 = jnp.pad(M2, [(0, pad), (0, 0)])
        phis = jnp.pad(phis, [(0, pad)])
        taus = jnp.pad(taus, [(0, pad)])
    ntot = nchan + pad
    grid = (ntot // cblk,)
    spec1 = pl.BlockSpec((cblk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    specH = pl.BlockSpec((cblk, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _scat_kernel,
        out_shape=jax.ShapeDtypeStruct((ntot, 9), jnp.float32),
        grid=grid,
        in_specs=[spec1, spec1, specH, specH, specH],
        out_specs=pl.BlockSpec((cblk, 9), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phis[..., None], taus[..., None], Gr, Gi, M2)
    out = out[:nchan, :]
    outs = [out[..., j] for j in range(9)]
    if nharm > nk:
        k_t = jnp.arange(nk, nharm, dtype=jnp.float32)
        tail = _scat_terms_ref(phis[:nchan], taus[:nchan], Gr[:nchan, nk:],
                               Gi[:nchan, nk:], M2[:nchan, nk:], k_t)
        outs = [a + b for a, b in zip(outs, tail)]
    return tuple(o.astype(orig_dtype) for o in outs)


def scattering_moments(phis, taus, Gr, Gi, M2, interpret=None, kvec=None):
    """(C, S, Cp, Rf, S1, Cpp, If1, Rg, S2), each (..., nchan)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if kvec is not None:
        ct_nbin = _ct_layout_nbin(kvec, Gr.shape[-1])
        if ct_nbin:
            return _scattering_moments_ct_impl(phis, taus, kvec, Gr, Gi,
                                               M2, ct_nbin=ct_nbin,
                                               interpret=interpret)
        return _scattering_moments_kvec_impl(phis, taus, kvec, Gr, Gi, M2,
                                             interpret=interpret)
    return _scattering_moments_impl(phis, taus, Gr, Gi, M2,
                                    interpret=interpret)
