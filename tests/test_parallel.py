"""Sharded fits must equal single-device fits bit-for-bit in results.

SURVEY.md section 4: 'multi-chip tests that the channel-sharded
reduction equals the single-chip sum.'  Runs on the 8-device virtual
CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pulseportraiture_tpu.fitters.portrait import fit_portrait_full_batch
from pulseportraiture_tpu.parallel.mesh import (fit_portrait_full_sharded,
                                                make_mesh)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    B, nchan, nbin = 4, 16, 128
    freqs = np.linspace(1100.0, 1900.0, nchan)
    x = (np.arange(nbin) + 0.5) / nbin
    prof = np.exp(-0.5 * ((x - 0.4) / 0.03) ** 2)
    model = prof[None, :] * (freqs[:, None] / 1500.0) ** -1.3
    data = np.broadcast_to(model, (B, nchan, nbin)) + \
        rng.normal(0, 0.02, (B, nchan, nbin))
    return (jnp.asarray(data), jnp.asarray(np.broadcast_to(
        model, (B, nchan, nbin))), jnp.zeros((B, 5)),
        jnp.full(B, 0.003), jnp.asarray(freqs),
        jnp.full((B, nchan), 0.02))


def test_sharded_fit_equals_single_device(problem):
    data, model, init, Ps, freqs, errs = problem
    res_single = fit_portrait_full_batch(
        data, model, init, Ps, freqs, errs, fit_flags=(1, 1, 0, 0, 0),
        log10_tau=False, max_iter=30)
    assert len(jax.devices()) >= 8, "conftest should provide 8 devices"
    mesh = make_mesh(n_batch=4, n_chan=2)
    res_shard = fit_portrait_full_sharded(
        mesh, data, model, init, Ps, freqs, errs,
        fit_flags=(1, 1, 0, 0, 0), log10_tau=False, max_iter=30)
    np.testing.assert_allclose(np.asarray(res_shard.params),
                               np.asarray(res_single.params),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res_shard.chi2),
                               np.asarray(res_single.chi2),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res_shard.snr),
                               np.asarray(res_single.snr), rtol=1e-10)


def test_chan_only_sharding(problem):
    data, model, init, Ps, freqs, errs = problem
    res_single = fit_portrait_full_batch(
        data, model, init, Ps, freqs, errs, fit_flags=(1, 1, 0, 0, 0),
        log10_tau=False, max_iter=30)
    mesh = make_mesh(n_batch=1, n_chan=8)
    res_shard = fit_portrait_full_sharded(
        mesh, data, model, init, Ps, freqs, errs,
        fit_flags=(1, 1, 0, 0, 0), log10_tau=False, max_iter=30)
    np.testing.assert_allclose(np.asarray(res_shard.params),
                               np.asarray(res_single.params),
                               rtol=0, atol=1e-9)
