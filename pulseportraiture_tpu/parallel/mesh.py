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


def fit_portrait_full_sharded_direct(mesh, data_ports, model_port,
                                     init_params, Ps, freqs, errs,
                                     weights=None, nu_fits=None,
                                     fit_flags=(1, 1, 0, 0, 0),
                                     log10_tau=True, max_iter=100,
                                     scattering=None, dft_precision="high",
                                     seed_phase=False, seed_dm=False,
                                     scales=None,
                                     model_ft_ri=None, mharm=None,
                                     packed=False):
    """Multi-chip capped fit through the DIRECT DFT-matmul setup.

    The direct capped setup (ops/ct_dft.direct_capped_setup) is plain
    XLA, so unlike the Pallas CT kernel it partitions under GSPMD: one
    jit over the mesh covers setup + seed + Newton loop with no
    shard_map.  That closes the two multi-chip host gaps of VERDICT r3
    weak #3 in one move:

    - int16-native ingest works sharded: data_ports may be int16 with
      per-channel `scales` (sharded ('batch','chan')); the dequantize
      is shard-local inside the setup matmul's epilogue, so the tunnel
      and PCIe carry half the bytes exactly as on one chip.
    - the result is packed on device (packed=True) into ONE (B, K)
      array per chunk.  The only cross-shard layout work is gathering
      the four (B, nchan)-sized channel stats into replicated columns:
      ~(46 + 4*nchan)*4 bytes/item over ICI (8.4 MB at B=128,
      nchan=4096, ~100 us at ICI rates) vs 15 extra ~30 ms tunnel
      round trips for the pytree fetch — four orders of magnitude in
      the packed path's favor on the tunneled backend.

    Caller must ensure ops.ct_dft.direct_cap_wins(mharm, dft_precision)
    (pipelines/toas.py gates on it); otherwise fit_portrait_full_batch
    would dispatch the non-partitionable Pallas kernel.
    """
    from pulseportraiture_tpu.fitters.portrait import (
        fit_portrait_full_batch, fit_portrait_full_batch_packed)
    from pulseportraiture_tpu.ops.ct_dft import direct_cap_wins

    assert model_ft_ri is not None and mharm is not None, \
        "the direct sharded path is the capped configuration"
    assert direct_cap_wins(mharm, dft_precision), \
        f"direct setup does not dispatch at mharm={mharm}, " \
        f"precision={dft_precision} (would fall back to Pallas CT, " \
        f"which cannot partition under GSPMD)"
    B, nchan, _ = data_ports.shape
    assert model_port.ndim == 2, "direct sharded path needs one model"
    if freqs.ndim == 1:
        freqs = jnp.broadcast_to(freqs, (B, nchan))
    if weights is None:
        weights = jnp.ones_like(errs)
    if nu_fits is None:
        nu_fits = jnp.broadcast_to(freqs.mean(axis=-1)[:, None], (B, 3))

    s_port = NamedSharding(mesh, P("batch", "chan", None))
    s_spec = NamedSharding(mesh, P("chan", None))
    s_chan = NamedSharding(mesh, P("batch", "chan"))
    s_item = NamedSharding(mesh, P("batch"))
    fn = fit_portrait_full_batch_packed if packed else \
        fit_portrait_full_batch
    return fn(jax.device_put(data_ports, s_port),
              jax.device_put(jnp.asarray(model_port), s_spec),
              jax.device_put(jnp.asarray(init_params), s_item),
              jax.device_put(jnp.asarray(Ps), s_item),
              jax.device_put(jnp.asarray(freqs), s_chan),
              jax.device_put(jnp.asarray(errs), s_chan),
              weights=jax.device_put(jnp.asarray(weights), s_chan),
              nu_fits=jax.device_put(jnp.asarray(nu_fits), s_item),
              fit_flags=fit_flags, log10_tau=log10_tau,
              max_iter=max_iter, scattering=scattering,
              dft_precision=dft_precision, fft_matmul=True,
              ct=True, pallas=False, seed_phase=seed_phase,
              seed_dm=seed_dm,
              scales=None if scales is None else
              jax.device_put(jnp.asarray(scales), s_chan),
              model_ft_ri=(jax.device_put(jnp.asarray(model_ft_ri[0]),
                                          s_spec),
                           jax.device_put(jnp.asarray(model_ft_ri[1]),
                                          s_spec)),
              mharm=mharm)


def fit_portrait_full_sharded_ct(mesh, data_ports, model_port, init_params,
                                 Ps, freqs, errs, weights=None,
                                 nu_fits=None, fit_flags=(1, 1, 0, 0, 0),
                                 log10_tau=True, max_iter=100,
                                 scattering=None, dft_precision="high",
                                 interpret=None, seed_phase=False,
                                 model_ft_ri=None, mharm=None,
                                 scales=None, packed=False):
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

    scales: optional (B, nchan) int16-dequantization scales (int16
    data_ports); shard-local — the dequantize fuses into each device's
    CT setup pass, so the sharded campaign keeps the half-width
    uploads.  packed=True returns pack_result's one (B, K) array
    (single tunnel fetch per chunk) instead of the result pytree.
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
    if scales is not None:
        from pulseportraiture_tpu.config import F0_FACT as _f0
        assert not _f0, "int16 ingest requires F0_FACT zeroing"
        dt = jnp.float32

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
    # int16 ingest: the quantized samples ship AS int16 (half the
    # tunnel/PCIe bytes); the per-channel dequantize runs shard-local
    # inside the CT kernel's VMEM pass
    data_ports = jax.device_put(
        jnp.asarray(data_ports) if scales is not None
        else jnp.asarray(data_ports, dt), s_port)
    if scales is not None:
        scales = jax.device_put(
            jnp.asarray(scales, jnp.float32), s_chan)
    mrp = jax.device_put(mrp, s_spec)
    mip = jax.device_put(mip, s_spec)

    errs_FT = jnp.asarray(errs, dt) * jnp.sqrt(jnp.asarray(nbin / 2.0, dt))
    w = jnp.where(errs_FT > 0.0, errs_FT ** -2.0, 0.0)
    w = w * (jnp.asarray(weights) > 0.0)
    w = jax.device_put(w, s_chan)

    # pallas_call's out_shape carries no varying-mesh-axes annotation,
    # so the vma/replication check must be off
    sc_spec = () if scales is None else (P("batch", "chan"),)
    sc_args = () if scales is None else (scales,)
    if seed_phase:
        def local_setup_seed(d, a, b, wl, *sc):
            Grp, Gip, sd, gsr, gsi = ct_setup(
                d, a, b, f0_fact=bool(F0_FACT),
                dft_precision=dft_precision, interpret=interpret, w=wl,
                scale=sc[0] if sc else None, mharm=mharm)
            # close the channel-sharded band sum for the brute seed:
            # one (B_local, NH) psum over 'chan' on ICI
            gsr = jax.lax.psum(gsr, "chan")
            gsi = jax.lax.psum(gsi, "chan")
            return Grp, Gip, sd, gsr, gsi

        Grp, Gip, sd, gsr, gsi = jax.shard_map(
            local_setup_seed, mesh=mesh,
            in_specs=(P("batch", "chan", None), P("chan", None),
                      P("chan", None), P("batch", "chan")) + sc_spec,
            out_specs=(P("batch", "chan", None),
                       P("batch", "chan", None), P("batch", "chan"),
                       P("batch", None), P("batch", None)),
            check_vma=False)(data_ports, mrp, mip, w, *sc_args)
        from pulseportraiture_tpu.fitters.portrait import \
            _brute_phase_seed
        phi0 = _brute_phase_seed(gsr, gsi,
                                 jnp.asarray(ct_kvec(nbin, mharm=mharm),
                                             dt))
        init_params = jnp.asarray(init_params, dt).at[:, 0].set(
            phi0.astype(dt))
    else:
        def local_setup(d, a, b, *sc):
            return ct_setup(d, a, b, f0_fact=bool(F0_FACT),
                            dft_precision=dft_precision,
                            scale=sc[0] if sc else None,
                            interpret=interpret, mharm=mharm)

        Grp, Gip, sd = jax.shard_map(
            local_setup, mesh=mesh,
            in_specs=(P("batch", "chan", None), P("chan", None),
                      P("chan", None)) + sc_spec,
            out_specs=(P("batch", "chan", None),
                       P("batch", "chan", None), P("batch", "chan")),
            check_vma=False)(data_ports, mrp, mip, *sc_args)

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
    fit_fn = fit_batch_from_setup
    if packed:
        # pack on device: ONE (B, K) fetch per chunk (see pack_result);
        # the only cross-shard cost is gathering the channel-stat
        # columns, ~4*nchan f32/item over ICI
        from pulseportraiture_tpu.fitters.portrait import pack_result

        def fit_fn(setup, x0, **kw):
            return pack_result(fit_batch_from_setup(setup, x0, **kw))

    fitter = jax.jit(fit_fn,
                     static_argnames=("setup_axes", "fit_flags",
                                      "log10_tau", "max_iter",
                                      "scattering", "pallas"))
    return fitter(setup_b, jax.device_put(jnp.asarray(init_params, dt),
                                          s_item),
                  setup_axes=axes, fit_flags=fit_flags,
                  log10_tau=log10_tau, max_iter=max_iter,
                  scattering=scattering, pallas=False)
