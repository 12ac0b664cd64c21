"""Mesh construction and sharded batched fitting.

The workload's parallel axes (SURVEY.md section 2): *batch* =
epochs x subints (embarrassingly parallel TOA fits, the data-parallel
axis) and *channel* (the per-channel Cdbp/Sbp sufficient statistics are
channel-separable sums, so the channel axis shards like a sequence axis —
each device reduces its channels' partial C/S/gradient/Hessian and a
single small psum closes the Newton step).

Sharding is expressed with jax.sharding.NamedSharding on the inputs of
the already-jitted batched fitter; GSPMD propagates the layout through
the while_loop and inserts the cross-device reductions over 'chan'
(1 + 5 + 25 floats per item per iteration) on ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_batch=None, n_chan=1, devices=None) -> Mesh:
    """Build a ('batch', 'chan') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_batch is None:
        n_batch = total // n_chan
    assert n_batch * n_chan <= total, \
        f"mesh {n_batch}x{n_chan} exceeds {total} devices"
    grid = np.array(devices[:n_batch * n_chan]).reshape(n_batch, n_chan)
    return Mesh(grid, ("batch", "chan"))


def shard_fit_inputs(mesh, data_ports, model_ports, init_params, Ps, freqs,
                     errs, weights=None, nu_fits=None):
    """device_put the batched-fit operands with ('batch','chan') layouts.

    model_ports may be (nchan, nbin) — the shared-model fast path — in
    which case it shards as ('chan', None) and replicates over 'batch'.
    Returns the sharded operands in fit_portrait_full_batch order.
    """
    B, nchan, _ = data_ports.shape
    if freqs.ndim == 1:
        freqs = jnp.broadcast_to(freqs, (B, nchan))
    if weights is None:
        weights = jnp.ones_like(errs)
    if nu_fits is None:
        nu_fits = jnp.broadcast_to(freqs.mean(axis=-1)[:, None], (B, 3))

    s_port = NamedSharding(mesh, P("batch", "chan", None))
    s_model = s_port if model_ports.ndim == 3 else \
        NamedSharding(mesh, P("chan", None))
    s_chan = NamedSharding(mesh, P("batch", "chan"))
    s_item = NamedSharding(mesh, P("batch"))

    return (jax.device_put(data_ports, s_port),
            jax.device_put(model_ports, s_model),
            jax.device_put(init_params, s_item),
            jax.device_put(Ps, s_item),
            jax.device_put(freqs, s_chan),
            jax.device_put(errs, s_chan),
            jax.device_put(weights, s_chan),
            jax.device_put(nu_fits, s_item))


def fit_portrait_full_sharded(mesh, data_ports, model_ports, init_params,
                              Ps, freqs, errs, weights=None,
                              nu_fits=None, fit_flags=(1, 1, 0, 0, 0),
                              log10_tau=True, max_iter=100, **kwargs):
    """Batched wideband fit with (batch, chan)-sharded portraits.

    data_ports: (B, nchan, nbin) sharded as ('batch', 'chan', None);
    model_ports likewise, or (nchan, nbin) for the shared-model path;
    per-item scalars are sharded along 'batch'.  Extra kwargs
    (scattering, dft_precision, fft_matmul, ...) pass through.  Returns
    the same PortraitFitResult as fit_portrait_full_batch.
    """
    from pulseportraiture_tpu.fitters.portrait import fit_portrait_full_batch

    (data_ports, model_ports, init_params, Ps, freqs, errs, weights,
     nu_fits) = shard_fit_inputs(mesh, data_ports, model_ports, init_params,
                                 Ps, freqs, errs, weights, nu_fits)
    # ct=False: the fused CT setup kernel (pallas_call) does not
    # partition under GSPMD; sharded fits take the XLA DFT-matmul path
    kwargs.setdefault("ct", False)
    return fit_portrait_full_batch(data_ports, model_ports, init_params,
                                   Ps, freqs, errs, weights=weights,
                                   nu_fits=nu_fits, fit_flags=fit_flags,
                                   log10_tau=log10_tau, max_iter=max_iter,
                                   **kwargs)
