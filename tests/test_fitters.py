"""End-to-end fitter recovery tests: inject known (phi, DM, tau, alpha),
recover to tight tolerances (BASELINE.md parity anchors)."""

import jax.numpy as jnp
import numpy as np

from pulseportraiture_tpu.config import DCONST
from pulseportraiture_tpu.fitters import (fit_phase_shift,
                                          fit_phase_shift_batch,
                                          fit_portrait, fit_portrait_full,
                                          fit_portrait_full_batch)
from pulseportraiture_tpu.ops import (gaussian_profile, phase_transform,
                                      rotate_portrait, rotate_portrait_full)
from pulseportraiture_tpu.ops.scattering import (scattering_times,
                                                 scattering_portrait_FT)

RNG = np.random.default_rng(123)


def make_model(nchan=16, nbin=256):
    freqs = np.linspace(1100.0, 1900.0, nchan)
    model = np.zeros((nchan, nbin))
    for i, f in enumerate(freqs):
        wid = 0.04 * (f / 1500.0) ** -0.3
        amp = (f / 1500.0) ** -1.2
        model[i] = amp * np.asarray(gaussian_profile(nbin, 0.4, wid)) + \
            0.4 * amp * np.asarray(gaussian_profile(nbin, 0.47, 0.02))
    return jnp.asarray(model), jnp.asarray(freqs)


def test_fit_phase_shift_recovers_injected_shift():
    nbin = 256
    model = np.asarray(gaussian_profile(nbin, 0.4, 0.05))
    for shift in [0.0123456789, -0.3333, 0.49]:
        data = np.asarray(rotate_portrait(jnp.asarray(model[None]),
                                          -shift))[0]
        res = fit_phase_shift(jnp.asarray(data), jnp.asarray(model),
                              noise=1e-3)
        assert abs(float(res.phase) - shift) < 1e-9, shift
        assert abs(float(res.scale) - 1.0) < 1e-6


def test_fit_phase_shift_batch_matches_single():
    nbin = 256
    model = np.asarray(gaussian_profile(nbin, 0.4, 0.05))
    shifts = [0.01, -0.2, 0.35]
    datas = np.stack([np.asarray(rotate_portrait(jnp.asarray(model[None]),
                                                 -s))[0] for s in shifts])
    datas += RNG.normal(0, 1e-3, datas.shape)
    res_b = fit_phase_shift_batch(jnp.asarray(datas),
                                  jnp.asarray(np.tile(model, (3, 1))))
    for i in range(3):
        res_s = fit_phase_shift(jnp.asarray(datas[i]), jnp.asarray(model))
        np.testing.assert_allclose(float(res_b.phase[i]),
                                   float(res_s.phase), atol=1e-12)


def test_fit_portrait_recovers_phi_dm_noiseless():
    model, freqs = make_model()
    P = 0.003
    phi0, DM0 = 0.05, 2.5e-3
    nu_fit = float(np.asarray(freqs).mean())
    data = rotate_portrait(model, -phi0, -DM0, P, freqs, nu_fit)
    res = fit_portrait(data, model, [0.0, 0.0], P, freqs, nu_fit=nu_fit,
                       nu_out=nu_fit, errs=jnp.full(model.shape[0], 1e-3))
    assert abs(float(res.phase) - phi0) < 1e-9
    assert abs(float(res.DM) - DM0) < 1e-9


def test_fit_portrait_noisy_within_errors():
    model, freqs = make_model()
    P = 0.003
    phi0, DM0 = 0.05, 2.5e-3
    nu_fit = float(np.asarray(freqs).mean())
    noise = 0.03
    data = np.asarray(rotate_portrait(model, -phi0, -DM0, P, freqs, nu_fit))
    data = data + RNG.normal(0, noise, data.shape)
    res = fit_portrait(jnp.asarray(data), model, [0.04, 2e-3], P, freqs,
                       nu_fit=nu_fit, nu_out=nu_fit,
                       errs=jnp.full(model.shape[0], noise))
    assert abs(float(res.phase) - phi0) < 5 * float(res.phase_err)
    assert abs(float(res.DM) - DM0) < 5 * float(res.DM_err)
    assert 0.8 < float(res.red_chi2) < 1.2


def test_fit_portrait_full_recovers_scattering():
    model, freqs = make_model(nchan=24, nbin=256)
    nchan, nbin = model.shape
    P = 0.003
    phi0, DM0 = 0.02, 1.5e-3
    tau0 = 0.01  # [rot] at nu_tau
    alpha0 = -4.0
    nu_ref = float(np.asarray(freqs).mean())
    taus = scattering_times(tau0, alpha0, np.asarray(freqs), nu_ref)
    B = np.asarray(scattering_portrait_FT(jnp.asarray(taus), nbin))
    scat = np.fft.irfft(B * np.fft.rfft(np.asarray(model), axis=-1),
                        n=nbin, axis=-1)
    data = rotate_portrait_full(jnp.asarray(scat), -phi0, -DM0, 0.0, freqs,
                                nu_ref, np.inf, P=P)
    init = jnp.asarray([0.0, 0.0, 0.0, np.log10(0.5 * tau0), alpha0])
    res, duration = fit_portrait_full(
        data, model, init, P, freqs,
        nu_fits=(nu_ref, nu_ref, nu_ref),
        nu_outs=(nu_ref, nu_ref, nu_ref),
        errs=jnp.full(nchan, 1e-4),
        fit_flags=(1, 1, 0, 1, 0), log10_tau=True)
    assert abs(float(res.phi) - phi0) < 1e-8
    assert abs(float(res.DM) - DM0) < 1e-8
    assert abs(10 ** float(res.tau) - tau0) < 1e-6
    assert int(res.return_code) < 3


def test_fit_portrait_full_nu_zero_decorrelates():
    """At the zero-covariance frequency, the phi-DM covariance ~ 0."""
    model, freqs = make_model()
    P = 0.003
    nu_fit = float(np.asarray(freqs).mean())
    data = np.asarray(rotate_portrait(model, -0.05, -2e-3, P, freqs, nu_fit))
    data = data + RNG.normal(0, 0.02, data.shape)
    res, _ = fit_portrait_full(jnp.asarray(data), model,
                               jnp.zeros(5), P, freqs,
                               nu_fits=(nu_fit, nu_fit, nu_fit),
                               errs=jnp.full(model.shape[0], 0.02),
                               fit_flags=(1, 1, 0, 0, 0))
    cov = np.asarray(res.covariance_matrix)
    corr = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
    assert abs(corr) < 1e-4


def test_batched_fit_matches_single_fits():
    model, freqs = make_model(nchan=8, nbin=128)
    nchan = model.shape[0]
    P = 0.003
    nu_fit = float(np.asarray(freqs).mean())
    noise = 0.02
    shifts = [(0.01, 1e-3), (-0.04, 2e-3), (0.11, -5e-4)]
    datas = []
    for phi0, DM0 in shifts:
        d = np.asarray(rotate_portrait(model, -phi0, -DM0, P, freqs, nu_fit))
        datas.append(d + RNG.normal(0, noise, d.shape))
    datas = jnp.asarray(np.stack(datas))
    B = len(shifts)
    # realistic initial guesses (the pipeline seeds phase from a brute
    # phase fit; far-off inits can lock onto correlation-function aliases)
    inits = np.zeros((B, 5))
    for i, (phi0, DM0) in enumerate(shifts):
        inits[i, 0] = phi0 + 0.005
        inits[i, 1] = DM0 + 1e-4
    inits = jnp.asarray(inits)
    res_b = fit_portrait_full_batch(
        datas, jnp.broadcast_to(model, datas.shape),
        inits, jnp.full(B, P), freqs,
        jnp.full((B, nchan), noise), fit_flags=(1, 1, 0, 0, 0),
        log10_tau=False)
    for i, (phi0, DM0) in enumerate(shifts):
        res_s, _ = fit_portrait_full(
            datas[i], model, inits[i], P, freqs,
            errs=jnp.full(nchan, noise), fit_flags=(1, 1, 0, 0, 0),
            log10_tau=False)
        np.testing.assert_allclose(float(res_b.params[i, 0]),
                                   float(res_s.phi), atol=1e-10)
        np.testing.assert_allclose(float(res_b.params[i, 1]),
                                   float(res_s.DM), atol=1e-10)
        np.testing.assert_allclose(float(res_b.nu_DM[i]),
                                   float(res_s.nu_DM), rtol=1e-10)
        # output phase is referenced at nu_zero; transport back to nu_fit
        phi_at_fit = phase_transform(res_b.params[i, 0], res_b.params[i, 1],
                                     res_b.nu_DM[i], nu_fit, P, mod=True)
        assert abs(float(phi_at_fit) - phi0) < \
            5 * float(res_b.param_errs[i, 0]) + 1e-6


def test_nu_zeros_decorrelate_other_branches():
    """At nu_zero, the targeted parameter covariance vanishes for the
    closed-form branches (reference pptoaslib.py:733-906)."""
    from pulseportraiture_tpu.fitters import nu_zeros, stats
    from pulseportraiture_tpu.ops.scattering import (
        scattering_portrait_FT, scattering_times)

    nchan, nbin, P = 24, 256, 0.003
    freqs = np.linspace(1100.0, 1900.0, nchan)
    model, _ = make_model(nchan=nchan, nbin=nbin)
    model = np.asarray(model)
    tau0 = 0.01
    taus = scattering_times(tau0, -4.0, freqs, 1500.0)
    B = np.asarray(scattering_portrait_FT(jnp.asarray(taus), nbin))
    scat = np.fft.irfft(B * np.fft.rfft(model, axis=-1), n=nbin, axis=-1)
    data = np.asarray(rotate_portrait_full(
        jnp.asarray(scat), -0.02, -1.5e-3, 0.0, jnp.asarray(freqs),
        1500.0, np.inf, P=P))
    data = data + RNG.normal(0, 1e-3, data.shape)

    for ff, icov in [((1, 1, 0, 1, 0), (0, 1)),   # phi-DM
                     ((1, 0, 1, 0, 0), (0, 2)),   # phi-GM
                     ((0, 0, 0, 1, 1), (3, 4))]:  # tau-alpha (log space)
        res, _ = fit_portrait_full(
            jnp.asarray(data), jnp.asarray(model),
            jnp.asarray([0.0, 0.0, 0.0, np.log10(tau0), -4.0]), P,
            jnp.asarray(freqs), errs=jnp.full(nchan, 1e-3),
            nu_fits=(1500.0, 1500.0, 1500.0), fit_flags=ff,
            log10_tau=True)
        cov = np.asarray(res.covariance_matrix)
        i, j = icov
        denom = np.sqrt(abs(cov[i, i] * cov[j, j]))
        corr = cov[i, j] / denom if denom > 0 else 0.0
        assert abs(corr) < 5e-2, (ff, corr)


def test_base_rotation_equivalence():
    """Fitting base-rotated data for dDM equals fitting the original for
    the full DM (the pipelines' float32-precision parameterization):
    DM_base + dDM == DM_full and phases agree after the f64 transport."""
    from pulseportraiture_tpu.ops.rotate import rotate_portrait_np

    model, freqs = make_model(nchan=16, nbin=256)
    model = np.asarray(model)
    freqs_np = np.asarray(freqs)
    P = 0.004
    DM_full, phi_in = 30.0 + 2.4e-4, 0.0123
    nu_fit = float(freqs_np.mean())
    data = rotate_portrait_np(model, -phi_in, -DM_full, P, freqs_np,
                              nu_fit)
    errs = jnp.full(16, 1e-3)
    # direct full-DM fit
    res_a, _ = fit_portrait_full(
        jnp.asarray(data), jnp.asarray(model),
        jnp.asarray([0.0, 30.0, 0.0, 0.0, 0.0]), P, freqs,
        nu_fits=(nu_fit,) * 3, nu_outs=(nu_fit,) * 3, errs=errs,
        fit_flags=(1, 1, 0, 0, 0), log10_tau=False, scattering=False)
    # base-rotated dDM fit
    base = 30.0
    data_rot = rotate_portrait_np(data, 0.0, base, P, freqs_np, nu_fit)
    res_b, _ = fit_portrait_full(
        jnp.asarray(data_rot), jnp.asarray(model), jnp.zeros(5), P, freqs,
        nu_fits=(nu_fit,) * 3, nu_outs=(nu_fit,) * 3, errs=errs,
        fit_flags=(1, 1, 0, 0, 0), log10_tau=False, scattering=False)
    assert abs((base + float(res_b.DM)) - float(res_a.DM)) < 1e-10
    # at nu_fit the base rotation is anchored: phases agree directly
    assert abs(float(res_b.phi) - float(res_a.phi)) < 1e-9
    assert abs(float(res_a.DM) - DM_full) < 1e-8
    assert abs(float(res_a.phi) - phi_in) < 1e-9


def test_nu_zero_finite_when_reference_is_a_channel_frequency():
    """Regression: evenly spaced odd-nchan grids put mean(freqs) exactly
    on the center channel; the nu_zero divisions were 0/0 = NaN there
    (the reference's own forms share this flaw; ours use the exact
    algebraic identities instead)."""
    nchan, nbin, P = 3, 128, 0.003
    freqs = jnp.asarray(np.linspace(1300.0, 1500.0, nchan))
    x = (np.arange(nbin) + 0.5) / nbin
    prof = np.exp(-0.5 * ((x - 0.4) / 0.04) ** 2)
    model = jnp.asarray(np.tile(prof, (nchan, 1)))
    data = np.asarray(model) + RNG.normal(0, 0.01, (nchan, nbin))
    res, _ = fit_portrait_full(
        jnp.asarray(data), model, jnp.zeros(5), P, freqs,
        errs=jnp.full(nchan, 0.01), fit_flags=(1, 1, 0, 0, 0),
        log10_tau=False, scattering=False)
    assert np.isfinite(float(res.nu_DM)), float(res.nu_DM)
    assert np.isfinite(float(res.phi)) and np.isfinite(float(res.DM))


def test_newton_shrinks_radius_on_nonfinite_trials():
    """Regression: a NaN trial objective must shrink the trust radius,
    not stall the optimizer at x0 for max_iter."""
    from pulseportraiture_tpu.fitters import newton

    def fgh(x):
        # objective blows up to NaN beyond |x| > 2; quadratic inside
        bad = jnp.abs(x[0]) > 2.0
        f = jnp.where(bad, jnp.nan, (x[0] - 1.0) ** 2)
        g = jnp.where(bad, jnp.nan, 2.0 * (x[0] - 1.0))[None]
        H = jnp.where(bad, jnp.nan, 2.0)[None, None]
        return f, g, H

    res = newton.trust_region_minimize(fgh, jnp.asarray([-1.5]),
                                       max_iter=50, init_radius=100.0)
    assert abs(float(res.x[0]) - 1.0) < 1e-6, float(res.x[0])
    assert int(res.niter) < 50


def test_fit_portrait_full_recovers_GM():
    """phi+DM+GM fit with the polynomial nu_zero branch (host roots)."""
    nchan, nbin, P = 24, 256, 0.003
    freqs = np.linspace(1100.0, 1900.0, nchan)
    model = np.stack([np.asarray(gaussian_profile(nbin, 0.4, 0.04)) *
                      (f / 1500.0) ** -1.2 for f in freqs])
    phi0, DM0, GM0 = 0.01, 1e-3, 0.5
    nu_ref = float(freqs.mean())
    data = np.asarray(rotate_portrait_full(
        jnp.asarray(model), -phi0, -DM0, -GM0, jnp.asarray(freqs),
        nu_ref, nu_ref, P=P))
    res, _ = fit_portrait_full(
        jnp.asarray(data), jnp.asarray(model), jnp.zeros(5), P,
        jnp.asarray(freqs), nu_fits=(nu_ref, nu_ref, nu_ref),
        errs=jnp.full(nchan, 1e-4), fit_flags=(1, 1, 1, 0, 0),
        log10_tau=False)
    assert abs(float(res.GM) - GM0) < 1e-6
    assert abs(float(res.DM) - DM0) < 1e-8
    assert np.isfinite(float(res.nu_DM))


def test_batched_GM_fit_matches_single_path():
    """The batched fitter must re-reference GM fits at the true
    polynomial zero-covariance frequency (via the in-jit host root
    callback), matching fit_portrait_full exactly (VERDICT r1, weak #4).
    """
    from pulseportraiture_tpu.fitters.portrait import fit_portrait_full_batch

    nchan, nbin, P = 24, 256, 0.003
    B = 3
    freqs = np.linspace(1100.0, 1900.0, nchan)
    model = np.stack([np.asarray(gaussian_profile(nbin, 0.4, 0.04)) *
                      (f / 1500.0) ** -1.2 for f in freqs])
    nu_ref = float(freqs.mean())
    rng = np.random.default_rng(3)
    phis = rng.uniform(-0.01, 0.01, B)
    DMs = rng.uniform(-1e-3, 1e-3, B)
    GMs = rng.uniform(-0.5, 0.5, B)
    data = np.stack([np.asarray(rotate_portrait_full(
        jnp.asarray(model), -phis[b], -DMs[b], -GMs[b], jnp.asarray(freqs),
        nu_ref, nu_ref, P=P)) for b in range(B)])
    singles = []
    for b in range(B):
        res, _ = fit_portrait_full(
            jnp.asarray(data[b]), jnp.asarray(model), jnp.zeros(5), P,
            jnp.asarray(freqs), nu_fits=(nu_ref, nu_ref, nu_ref),
            errs=jnp.full(nchan, 1e-4), fit_flags=(1, 1, 1, 0, 0),
            log10_tau=False)
        singles.append(res)
    bres = fit_portrait_full_batch(
        jnp.asarray(data), jnp.asarray(model),
        jnp.zeros((B, 5)), jnp.full(B, P),
        jnp.asarray(np.broadcast_to(freqs, (B, nchan))),
        jnp.full((B, nchan), 1e-4),
        nu_fits=jnp.full((B, 3), nu_ref),
        fit_flags=(1, 1, 1, 0, 0), log10_tau=False, scattering=False)
    for b in range(B):
        s = singles[b]
        np.testing.assert_allclose(np.asarray(bres.nu_DM)[b],
                                   float(s.nu_DM), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(bres.params)[b],
                                   np.asarray(s.params), rtol=0,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(bres.param_errs)[b],
                                   np.asarray(s.param_errs), rtol=1e-6,
                                   atol=1e-12)


def test_brute_phase_seed_accuracy():
    """In-program brute seed: <2e-4 turns at any wrap position."""
    from pulseportraiture_tpu.fitters.portrait import _brute_phase_seed

    nbin = 512
    prof = np.exp(-0.5 * ((np.arange(nbin) / nbin - 0.4) / 0.02) ** 2)
    F = np.fft.rfft(prof)
    k = np.arange(nbin // 2 + 1)
    for true in (0.0123, -0.37, 0.499, -0.5):
        G = (F * np.exp(-2j * np.pi * k * true)) * np.conj(F)
        ph = float(_brute_phase_seed(
            jnp.asarray(G.real, jnp.float64)[None],
            jnp.asarray(G.imag, jnp.float64)[None],
            jnp.asarray(k, jnp.float64))[0])
        d = (ph - true + 0.5) % 1.0 - 0.5
        assert abs(d) < 2e-4, (true, ph)


def test_fit_batch_seed_phase_matches_seeded_init():
    """seed_phase=True recovers large injected shifts from zero init
    (the fused production seeding; bench.py uses this path)."""
    model, freqs = make_model(nchan=16, nbin=256)
    nchan, nbin = model.shape
    P, nu_fit = 0.003, float(np.asarray(freqs).mean())
    phis = np.array([0.01, -0.2, 0.35, 0.49])
    B = len(phis)
    noise = 0.01
    datas = []
    for p in phis:
        d = np.asarray(rotate_portrait(jnp.asarray(model), -p))
        datas.append(d + RNG.normal(0, noise, d.shape))
    datas = jnp.asarray(np.stack(datas))
    res = fit_portrait_full_batch(
        datas, model, jnp.zeros((B, 5)), jnp.full(B, P), freqs,
        jnp.full((B, nchan), noise), nu_fits=jnp.full((B, 3), nu_fit),
        fit_flags=(1, 1, 0, 0, 0), log10_tau=False, scattering=False,
        seed_phase=True)
    phf = np.array([float(phase_transform(res.params[i, 0],
                                          res.params[i, 1], res.nu_DM[i],
                                          nu_fit, P, mod=True))
                    for i in range(B)])
    d = (phf - phis + 0.5) % 1.0 - 0.5
    assert np.abs(d).max() < 5 * np.asarray(res.param_errs)[:, 0].max() \
        + 1e-6, d


def test_model_side_base_rotation_equivalence():
    """Fitting unrotated data against a -DM_base-rotated model equals
    fitting +DM_base-rotated data against the plain model (the pipeline
    rotates the shared MODEL once per campaign instead of every subint;
    pipelines/toas.py prep)."""
    from pulseportraiture_tpu.ops.rotate import rotate_portrait_np

    rng = np.random.default_rng(3)
    nchan, nbin, P, DMb = 16, 256, 0.003, 34.5678
    model, freqs = make_model(nchan=nchan, nbin=nbin)
    nu_fit = float(np.asarray(freqs).mean())
    port = np.array(rotate_portrait_full(
        model, -0.0123, -(DMb + 2e-4), 0.0, freqs, nu_fit, np.inf, P=P))
    port += rng.normal(0, 0.01, port.shape)
    anchor = nu_fit + 37.0
    kw = dict(nu_fits=(nu_fit,) * 3, errs=jnp.full(nchan, 0.01),
              fit_flags=(1, 1, 0, 0, 0), log10_tau=False,
              scattering=False)
    pa = rotate_portrait_np(port, 0.0, DMb, P, np.asarray(freqs), anchor)
    ra, _ = fit_portrait_full(jnp.asarray(pa), model, jnp.zeros(5), P,
                              freqs, **kw)
    mb = rotate_portrait_np(np.asarray(model), 0.0, -DMb, P,
                            np.asarray(freqs), anchor)
    rb, _ = fit_portrait_full(jnp.asarray(port), jnp.asarray(mb),
                              jnp.zeros(5), P, freqs, **kw)
    assert abs(float(ra.phi) - float(rb.phi)) < 1e-9
    assert abs(float(ra.DM) - float(rb.DM)) < 1e-9
    assert abs(float(ra.nu_DM) - float(rb.nu_DM)) < 1e-6


def test_newton_speculative_final_step_exact_quadratic():
    """The speculative final step (round 5): on a pure quadratic with a
    huge constant offset (so the 8*eps*|f| floor dwarfs the remaining
    decrease after one Newton step), the optimizer takes the exact
    Newton step on iteration 1, then the lookahead solves the next
    subproblem (p2 = 0 at the optimum) and stops WITHOUT another fgh
    evaluation — landing exactly at the minimizer with nfev == 2."""
    from pulseportraiture_tpu.fitters import newton

    a = jnp.asarray([0.3, -0.7])
    H0 = jnp.asarray([[4.0, 1.0], [1.0, 3.0]])
    C = jnp.asarray(3e7, jnp.float32)       # bench-scale chi2 offset

    calls = []

    def fgh(x):
        calls.append(1)
        d = x - a
        return C + 0.5 * d @ H0 @ d, H0 @ d, H0

    res = newton.trust_region_minimize(fgh, jnp.asarray([0.0, 0.0]),
                                       max_iter=30, init_radius=100.0)
    assert np.abs(np.asarray(res.x) - np.asarray(a)).max() < 1e-5
    # exactly two fgh evaluations: the initial one and the accepted
    # Newton step; the stop (gconv under x64, the speculative lookahead
    # under f32's large floor) costs none
    assert int(res.nfev) == 2 and int(res.niter) == 1
    assert int(res.status) in (0, 1) and bool(res.success)

    # tiny offset: the floor is negligible, classic convergence applies
    # and the result is identical
    def fgh_small(x):
        d = x - a
        return 0.5 * d @ H0 @ d, H0 @ d, H0

    res2 = newton.trust_region_minimize(fgh_small,
                                        jnp.asarray([0.0, 0.0]),
                                        max_iter=30, init_radius=100.0)
    assert np.abs(np.asarray(res2.x) - np.asarray(a)).max() < 1e-5
    assert bool(res2.success)


def test_newton_speculative_step_respects_mask():
    """Masked (non-fitted) coordinates must not move through the
    speculative final step either."""
    from pulseportraiture_tpu.fitters import newton

    a = jnp.asarray([0.3, -0.7, 0.25])
    H0 = jnp.asarray([[4.0, 1.0, 0.0], [1.0, 3.0, 0.0],
                      [0.0, 0.0, 1.0]])
    C = jnp.asarray(3e7, jnp.float32)

    def fgh(x):
        d = x - a
        # masked coordinate: zero gradient row, identity Hessian
        g = (H0 @ d).at[2].set(0.0)
        return C + 0.5 * d @ H0 @ d, g, H0

    res = newton.trust_region_minimize(
        fgh, jnp.asarray([0.0, 0.0, 0.125]), max_iter=30,
        init_radius=100.0, step_mask=(1, 1, 0))
    assert float(res.x[2]) == 0.125
    assert np.abs(np.asarray(res.x[:2]) - np.asarray(a[:2])).max() < 1e-5


def test_newton_speculative_step_bounded_on_singular_hessian():
    """The speculative final step must not fire on a near-singular
    Hessian's say-so: along a soft direction the quadratic model can
    predict a sub-floor decrease for a large jump it has no authority
    over.  The guard (|p| <= last verified step) forces a real
    evaluation instead, and the optimizer must land at the true
    minimizer of the quartic valley, not at a speculative overshoot."""
    from pulseportraiture_tpu.fitters import newton

    C = jnp.asarray(3e7, jnp.float32)     # large offset -> large floor
    # stiff in x0, quartic (locally near-singular) valley in x1:
    # f = C + 1e6 (x0-0.1)^2 + (x1-0.2)^4
    a0, a1 = 0.1, 0.2

    def fgh(x):
        d0 = x[0] - a0
        d1 = x[1] - a1
        f = C + 1e6 * d0 ** 2 + d1 ** 4
        g = jnp.asarray([2e6 * d0, 4.0 * d1 ** 3])
        H = jnp.asarray([[2e6, 0.0], [0.0, 12.0 * d1 ** 2]])
        return f, g, H

    res = newton.trust_region_minimize(fgh, jnp.asarray([0.0, 0.0]),
                                       max_iter=60, init_radius=1.0)
    x = np.asarray(res.x)
    assert abs(x[0] - a0) < 1e-4, x
    # the quartic direction converges only to the floor's resolution
    # (d1^4 <= 8 eps |C| -> |d1| ~ 0.13 in f32), but must not OVERSHOOT
    # past the minimizer by a speculative radius-sized jump
    assert x[1] < a1 + 0.15 and x[1] > -0.05, x
