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

TWO_PI = 2.0 * np.pi

# channels per program: 8 f32 sublanes
_CBLK = 8


def _kernel(phis_ref, gr_ref, gi_ref, out_ref):
    phis = phis_ref[:]                      # (CBLK, 1)
    gr = gr_ref[:]                          # (CBLK, nharm)
    gi = gi_ref[:]
    nharm = gr.shape[-1]
    k = jax.lax.broadcasted_iota(jnp.float32, (1, nharm), 1)
    # double-single phase product (see fitters.stats._phase_trig)
    p = phis - jnp.round(phis)
    hi = jnp.round(p * 8192.0) / 8192.0
    lo = p - hi
    prod = hi * k
    frac = prod - jnp.round(prod)
    ang = TWO_PI * (frac + lo * k)          # (CBLK, nharm)
    c = jnp.cos(ang)
    s = jnp.sin(ang)
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

    orig_dtype = Gr.dtype
    phis = phis.astype(jnp.float32)
    Gr = Gr.astype(jnp.float32)
    Gi = Gi.astype(jnp.float32)
    nchan, nharm = Gr.shape[-2], Gr.shape[-1]
    # pad channels to the block size
    pad = (-nchan) % _CBLK
    if pad:
        pz = [(0, 0)] * (Gr.ndim - 2) + [(0, pad), (0, 0)]
        Gr = jnp.pad(Gr, pz)
        Gi = jnp.pad(Gi, pz)
        phis = jnp.pad(phis, [(0, 0)] * (phis.ndim - 1) + [(0, pad)])
    ntot = nchan + pad
    grid = (ntot // _CBLK,)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(Gr.shape[:-2] + (ntot, 3),
                                       jnp.float32),
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
    from pulseportraiture_tpu.fitters.stats import _phase_trig
    nharm = Gr.shape[-1]
    k = jnp.arange(nharm, dtype=Gr.dtype)
    c, s = _phase_trig(phis, k)
    zr = Gr * c - Gi * s
    zi = Gr * s + Gi * c
    C = jnp.sum(zr, axis=-1)
    Cp = (-TWO_PI) * jnp.sum(k * zi, axis=-1)
    Cpp = (-TWO_PI * TWO_PI) * jnp.sum(k * k * zr, axis=-1)
    return C, Cp, Cpp
