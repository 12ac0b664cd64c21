"""Pallas fused-moments kernel vs the jnp reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from pulseportraiture_tpu.ops.pallas_moments import (
    phase_moments, phase_moments_reference)


def test_phase_moments_matches_reference():
    rng = np.random.default_rng(0)
    nchan, nharm = 20, 257  # deliberately non-multiples of tiles
    phis = jnp.asarray(rng.uniform(-0.5, 0.5, nchan).astype(np.float32))
    Gr = jnp.asarray(rng.normal(0, 1, (nchan, nharm)).astype(np.float32))
    Gi = jnp.asarray(rng.normal(0, 1, (nchan, nharm)).astype(np.float32))
    got = phase_moments(phis, Gr, Gi)
    want = phase_moments_reference(phis, Gr, Gi)
    for a, b in zip(got, want):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-6)


def test_stats_no_scattering_pallas_path_matches(monkeypatch):
    """chi2_value_grad_hess with PP_PALLAS=1 equals the plain path."""
    monkeypatch.setenv("PP_PALLAS", "0")
    import jax.numpy as jnp

    from pulseportraiture_tpu.fitters import stats

    rng = np.random.default_rng(5)
    nchan, nbin = 12, 128
    freqs = jnp.asarray(np.linspace(1100.0, 1900.0, nchan),
                        dtype=jnp.float32)
    data = jnp.asarray(rng.normal(1.0, 0.3, (nchan, nbin)),
                       dtype=jnp.float32)
    model = jnp.asarray(rng.normal(1.0, 0.3, (nchan, nbin)),
                        dtype=jnp.float32)
    setup = stats.make_setup(data, model, jnp.full(nchan, 0.1,
                                                   jnp.float32),
                             0.003, freqs, 1500.0, 1500.0, 1500.0)
    params = jnp.asarray([0.01, 1e-4, 0.0, 0.0, -4.0], jnp.float32)
    f0, g0, H0 = stats.chi2_value_grad_hess(
        params, setup, fit_flags=(1, 1, 0, 0, 0), log10_tau=False,
        scattering=False)
    monkeypatch.setenv("PP_PALLAS", "1")
    f1, g1, H1 = stats.chi2_value_grad_hess(
        params, setup, fit_flags=(1, 1, 0, 0, 0), log10_tau=False,
        scattering=False)
    np.testing.assert_allclose(float(f1), float(f0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), rtol=1e-4,
                               atol=1e-3)


def test_scattering_moments_kernel_matches_stats(monkeypatch):
    """The 9-reduction scattering kernel equals the plain jnp path."""
    import jax.numpy as jnp

    from pulseportraiture_tpu.fitters import stats

    rng = np.random.default_rng(8)
    nchan, nbin = 12, 128
    freqs = jnp.asarray(np.linspace(1100.0, 1900.0, nchan), jnp.float32)
    data = jnp.asarray(rng.normal(1.0, 0.3, (nchan, nbin)), jnp.float32)
    model = jnp.asarray(rng.normal(1.0, 0.3, (nchan, nbin)), jnp.float32)
    setup = stats.make_setup(data, model,
                             jnp.full(nchan, 0.1, jnp.float32), 0.003,
                             freqs, 1500.0, 1500.0, 1500.0)
    params = jnp.asarray([0.01, 1e-4, 0.0, -2.0, -4.0], jnp.float32)
    monkeypatch.setenv("PP_PALLAS", "0")
    m0 = stats._moments(params, setup, True, order=2)
    monkeypatch.setenv("PP_PALLAS", "1")
    m1 = stats._moments(params, setup, True, order=2)
    for key in ("C", "S", "Cp", "Rf", "S1", "Cpp", "If1", "Rg", "S2"):
        a, b = np.asarray(m0[key]), np.asarray(m1[key])
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(b / scale, a / scale, atol=3e-6,
                                   err_msg=key)


def test_kernels_batch_under_vmap():
    """The production fitter vmaps the kernels over the batch axis;
    verify the pallas_call batching rule (interpret mode on CPU)."""
    import jax

    from pulseportraiture_tpu.ops.pallas_moments import scattering_moments

    rng = np.random.default_rng(1)
    B, nchan, nharm = 3, 12, 129
    phis = jnp.asarray(rng.uniform(-0.5, 0.5, (B, nchan)).astype(
        np.float32))
    Gr = jnp.asarray(rng.normal(0, 1, (B, nchan, nharm)).astype(
        np.float32))
    Gi = jnp.asarray(rng.normal(0, 1, (B, nchan, nharm)).astype(
        np.float32))
    M2 = jnp.asarray(np.abs(rng.normal(0, 1, (B, nchan, nharm))).astype(
        np.float32))
    taus = jnp.asarray(np.abs(rng.normal(0, 0.01, (B, nchan))).astype(
        np.float32))
    out_b = jax.vmap(lambda p, r, i: phase_moments(p, r, i))(phis, Gr, Gi)
    ref_b = jax.vmap(phase_moments_reference)(phis, Gr, Gi)
    for a, b in zip(out_b, ref_b):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-6)
    out_s = jax.vmap(lambda p, t, r, i, m: scattering_moments(
        p, t, r, i, m))(phis, taus, Gr, Gi, M2)
    for o in out_s:
        assert np.isfinite(np.asarray(o)).all()
