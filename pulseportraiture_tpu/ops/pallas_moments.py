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
Newton iteration at HBM-bandwidth speed: read 8 bytes/element, compute
sin/cos once, accumulate all three moments in VMEM.

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

# channels per program: 8 f32 sublanes
_CBLK = 8


def _kernel(phis_ref, gr_ref, gi_ref, out_ref):
    phis = phis_ref[:]                      # (CBLK, 1)
    gr = gr_ref[:]                          # (CBLK, nharm)
    gi = gi_ref[:]
    nharm = gr.shape[-1]
    # Mosaic requires integer iota results; cast to f32 afterwards.
    k = jax.lax.broadcasted_iota(jnp.int32, (1, nharm), 1).astype(
        jnp.float32)
    # shared double-single phase product
    c, s = _phase_trig(phis[:, 0], k)
    zr = gr * c - gi * s                    # Re(G e^{i ang})
    zi = gr * s + gi * c                    # Im(G e^{i ang})
    C = jnp.sum(zr, axis=-1)
    Cp = (-TWO_PI) * jnp.sum(k * zi, axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(k * k * zr, axis=-1)
    out_ref[:] = jnp.stack([C, Cp, Cpp], axis=-1)   # (CBLK, 3)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _phase_moments_impl(phis, Gr, Gi, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert Gr.ndim == 2, "2-D (nchan, nharm) only; vmap for batches"
    orig_dtype = Gr.dtype
    phis = phis.astype(jnp.float32)
    Gr = Gr.astype(jnp.float32)
    Gi = Gi.astype(jnp.float32)
    nchan, nharm = Gr.shape
    # pad channels to the block size
    pad = (-nchan) % _CBLK
    if pad:
        Gr = jnp.pad(Gr, [(0, pad), (0, 0)])
        Gi = jnp.pad(Gi, [(0, pad), (0, 0)])
        phis = jnp.pad(phis, [(0, pad)])
    ntot = nchan + pad
    grid = (ntot // _CBLK,)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((ntot, 3), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CBLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CBLK, nharm), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CBLK, nharm), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_CBLK, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phis[..., None], Gr, Gi)
    out = out[..., :nchan, :].astype(orig_dtype)
    return out[..., 0], out[..., 1], out[..., 2]


def phase_moments(phis, Gr, Gi, interpret=None):
    """(C, Cp, Cpp) each (..., nchan) from phis (..., nchan) and
    Gr/Gi (..., nchan, nharm) float32.

    interpret=None auto-selects the Pallas interpreter off-TPU so the
    kernel stays runnable (slowly) on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _phase_moments_impl(phis, Gr, Gi, interpret=interpret)


def phase_moments_reference(phis, Gr, Gi):
    """Pure-jnp reference implementation (for tests and CPU)."""
    nharm = Gr.shape[-1]
    k = jnp.arange(nharm, dtype=Gr.dtype)
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
    """
    phis = phis_ref[:]
    taus = taus_ref[:]
    gr = gr_ref[:]
    gi = gi_ref[:]
    m2 = m2_ref[:]
    nharm = gr.shape[-1]
    # Mosaic requires integer iota results; cast to f32 afterwards.
    k = jax.lax.broadcasted_iota(jnp.int32, (1, nharm), 1).astype(
        jnp.float32)
    # shared double-single phase product
    Pr, Pi = _phase_trig(phis[:, 0], k)

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

    C = jnp.sum(zr, axis=-1)
    S = jnp.sum(B2 * m2, axis=-1)
    Cp = (-TWO_PI) * jnp.sum(k * zi, axis=-1)
    Rf = jnp.sum(zfr, axis=-1)
    S1 = jnp.sum(u1 * m2, axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(k * k * zr, axis=-1)
    If1 = (-TWO_PI) * jnp.sum(k * zfi, axis=-1)
    Rg = jnp.sum(zgr, axis=-1)
    S2 = jnp.sum(u2 * m2, axis=-1)
    out_ref[:] = jnp.stack([C, S, Cp, Rf, S1, Cpp, If1, Rg, S2], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scattering_moments_impl(phis, taus, Gr, Gi, M2, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert Gr.ndim == 2, "2-D (nchan, nharm) only; vmap for batches"
    orig_dtype = Gr.dtype
    phis = phis.astype(jnp.float32)
    taus = taus.astype(jnp.float32)
    Gr = Gr.astype(jnp.float32)
    Gi = Gi.astype(jnp.float32)
    M2 = M2.astype(jnp.float32)
    nchan, nharm = Gr.shape
    pad = (-nchan) % _CBLK
    if pad:
        Gr = jnp.pad(Gr, [(0, pad), (0, 0)])
        Gi = jnp.pad(Gi, [(0, pad), (0, 0)])
        M2 = jnp.pad(M2, [(0, pad), (0, 0)])
        phis = jnp.pad(phis, [(0, pad)])
        taus = jnp.pad(taus, [(0, pad)])
    ntot = nchan + pad
    grid = (ntot // _CBLK,)
    spec1 = pl.BlockSpec((_CBLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    specH = pl.BlockSpec((_CBLK, nharm), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _scat_kernel,
        out_shape=jax.ShapeDtypeStruct((ntot, 9), jnp.float32),
        grid=grid,
        in_specs=[spec1, spec1, specH, specH, specH],
        out_specs=pl.BlockSpec((_CBLK, 9), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phis[..., None], taus[..., None], Gr, Gi, M2)
    out = out[..., :nchan, :].astype(orig_dtype)
    return tuple(out[..., j] for j in range(9))


def scattering_moments(phis, taus, Gr, Gi, M2, interpret=None):
    """(C, S, Cp, Rf, S1, Cpp, If1, Rg, S2), each (..., nchan)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _scattering_moments_impl(phis, taus, Gr, Gi, M2,
                                    interpret=interpret)
