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
    # pallas_call does not partition under GSPMD: sharded fits take the
    # XLA DFT-matmul setup AND XLA moments (a pallas_call inside the
    # GSPMD-partitioned Newton loop would compute on unpartitioned
    # shapes); the shard_map CT variant below runs the fused kernels
    # correctly per shard
    kwargs.setdefault("ct", False)
    kwargs.setdefault("pallas", False)
    return fit_portrait_full_batch(data_ports, model_ports, init_params,
                                   Ps, freqs, errs, weights=weights,
                                   nu_fits=nu_fits, fit_flags=fit_flags,
                                   log10_tau=log10_tau, max_iter=max_iter,
                                   **kwargs)


def fit_portrait_full_sharded_ct(mesh, data_ports, model_port, init_params,
                                 Ps, freqs, errs, weights=None,
                                 nu_fits=None, fit_flags=(1, 1, 0, 0, 0),
                                 log10_tau=True, max_iter=100,
                                 scattering=None, dft_precision="high",
                                 interpret=None, seed_phase=False,
                                 model_ft_ri=None, mharm=None):
    """Multi-chip fit with the fused CT setup running per shard.

    pallas_call does not partition under GSPMD, so the CT kernel runs
    inside shard_map: each device transforms its own ('batch','chan')
    block of the data against its channel shard of the (nchan, nbin)
    shared model — zero cross-device traffic in the setup (the CT
    kernel is channel-local).  The Newton loop then runs under GSPMD
    with XLA moments (pallas=False), whose channel reductions lower to
    the per-item scalar all-reduces (tests/test_parallel.py).

    interpret=None auto-selects the Pallas interpreter off-TPU so the
    path is testable on the virtual CPU mesh.
    """
    from pulseportraiture_tpu.config import F0_FACT
    from pulseportraiture_tpu.fitters import stats
    from pulseportraiture_tpu.fitters.portrait import fit_batch_from_setup
    from pulseportraiture_tpu.ops.ct_dft import (ct_kvec, ct_setup,
                                                 ct_supported,
                                                 permute_spectrum)

    B, nchan, nbin = data_ports.shape
    assert ct_supported(nbin), f"CT layout unsupported for nbin={nbin}"
    assert model_port.ndim == 2, "CT sharded path needs one shared model"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if freqs.ndim == 1:
        freqs = jnp.broadcast_to(freqs, (B, nchan))
    if weights is None:
        weights = jnp.ones_like(errs)
    if nu_fits is None:
        nu_fits = jnp.broadcast_to(freqs.mean(axis=-1)[:, None], (B, 3))
    dt = jnp.asarray(data_ports).dtype

    if model_ft_ri is not None:
        mft = (jnp.asarray(model_ft_ri[0], dt),
               jnp.asarray(model_ft_ri[1], dt))
    else:
        mft = stats.model_ft(jnp.asarray(model_port, dt),
                             fft_matmul=True, dft_precision="highest")
    # model-band harmonic cap (ops/ct_dft): the capped CT layout is
    # channel-local, so it shards exactly like the full one
    mrp, mip = permute_spectrum(*mft, nbin, mharm=mharm)

    s_port = NamedSharding(mesh, P("batch", "chan", None))
    s_spec = NamedSharding(mesh, P("chan", None))
    s_chan = NamedSharding(mesh, P("batch", "chan"))
    s_item = NamedSharding(mesh, P("batch"))
    data_ports = jax.device_put(jnp.asarray(data_ports, dt), s_port)
    mrp = jax.device_put(mrp, s_spec)
    mip = jax.device_put(mip, s_spec)

    errs_FT = jnp.asarray(errs, dt) * jnp.sqrt(jnp.asarray(nbin / 2.0, dt))
    w = jnp.where(errs_FT > 0.0, errs_FT ** -2.0, 0.0)
    w = w * (jnp.asarray(weights) > 0.0)
    w = jax.device_put(w, s_chan)

    # pallas_call's out_shape carries no varying-mesh-axes annotation,
    # so the vma/replication check must be off
    if seed_phase:
        def local_setup_seed(d, a, b, wl):
            Grp, Gip, sd, gsr, gsi = ct_setup(
                d, a, b, f0_fact=bool(F0_FACT),
                dft_precision=dft_precision, interpret=interpret, w=wl,
                mharm=mharm)
            # close the channel-sharded band sum for the brute seed:
            # one (B_local, NH) psum over 'chan' on ICI
            gsr = jax.lax.psum(gsr, "chan")
            gsi = jax.lax.psum(gsi, "chan")
            return Grp, Gip, sd, gsr, gsi

        Grp, Gip, sd, gsr, gsi = jax.shard_map(
            local_setup_seed, mesh=mesh,
            in_specs=(P("batch", "chan", None), P("chan", None),
                      P("chan", None), P("batch", "chan")),
            out_specs=(P("batch", "chan", None),
                       P("batch", "chan", None), P("batch", "chan"),
                       P("batch", None), P("batch", None)),
            check_vma=False)(data_ports, mrp, mip, w)
        from pulseportraiture_tpu.fitters.portrait import \
            _brute_phase_seed
        phi0 = _brute_phase_seed(gsr, gsi,
                                 jnp.asarray(ct_kvec(nbin, mharm=mharm),
                                             dt))
        init_params = jnp.asarray(init_params, dt).at[:, 0].set(
            phi0.astype(dt))
    else:
        def local_setup(d, a, b):
            return ct_setup(d, a, b, f0_fact=bool(F0_FACT),
                            dft_precision=dft_precision,
                            interpret=interpret, mharm=mharm)

        Grp, Gip, sd = jax.shard_map(
            local_setup, mesh=mesh,
            in_specs=(P("batch", "chan", None), P("chan", None),
                      P("chan", None)),
            out_specs=(P("batch", "chan", None),
                       P("batch", "chan", None), P("batch", "chan")),
            check_vma=False)(data_ports, mrp, mip)

    M2 = mrp * mrp + mip * mip
    S0 = jnp.sum(M2, axis=-1)
    Sd = jnp.sum(w * sd, axis=-1)
    setup_b = stats.FitSetup(
        Gr=Grp, Gi=Gip, M2=M2, w=w,
        freqs=jax.device_put(jnp.asarray(freqs, dt), s_chan),
        P=jax.device_put(jnp.asarray(Ps, dt), s_item),
        nu_DM=nu_fits[:, 0].astype(dt), nu_GM=nu_fits[:, 1].astype(dt),
        nu_tau=nu_fits[:, 2].astype(dt), Sd=Sd.astype(dt), S0=S0,
        nbin=int(nbin), kvec=jnp.asarray(ct_kvec(nbin, mharm=mharm), dt),
        sd_chan=(w * sd).astype(dt))
    axes = stats.FitSetup(Gr=0, Gi=0, M2=None, w=0, freqs=0, P=0,
                          nu_DM=0, nu_GM=0, nu_tau=0, Sd=0, S0=None,
                          nbin=None, kvec=None, sd_chan=0)
    fitter = jax.jit(fit_batch_from_setup,
                     static_argnames=("setup_axes", "fit_flags",
                                      "log10_tau", "max_iter",
                                      "scattering", "pallas"))
    return fitter(setup_b, jax.device_put(jnp.asarray(init_params, dt),
                                          s_item),
                  setup_axes=axes, fit_flags=fit_flags,
                  log10_tau=log10_tau, max_iter=max_iter,
                  scattering=scattering, pallas=False)
