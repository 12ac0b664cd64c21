"""Agg-backend smoke tests for every diagnostic plot."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest


@pytest.fixture(scope="module")
def port():
    rng = np.random.default_rng(0)
    nchan, nbin = 12, 64
    x = (np.arange(nbin) + 0.5) / nbin
    prof = np.exp(-0.5 * ((x - 0.4) / 0.05) ** 2)
    p = prof[None] * np.linspace(2.0, 1.0, nchan)[:, None]
    return p + rng.normal(0, 0.05, (nchan, nbin))


def test_show_portrait(port, tmp_path):
    from pulseportraiture_tpu.viz import show_portrait
    f = str(tmp_path / "p.png")
    show_portrait(port, freqs=np.linspace(1100, 1900, 12), title="t",
                  savefig=f, show=False)
    assert (tmp_path / "p.png").stat().st_size > 1000


def test_show_profiles_and_stacked(port, tmp_path):
    from pulseportraiture_tpu.viz import (show_profiles,
                                          show_stacked_profiles)
    show_profiles(port, nprofs=4, savefig=str(tmp_path / "a.png"),
                  show=False)
    show_stacked_profiles(port, savefig=str(tmp_path / "b.png"),
                          show=False)
    assert (tmp_path / "a.png").exists() and (tmp_path / "b.png").exists()


def test_show_residual_plot(port, tmp_path):
    from pulseportraiture_tpu.viz import show_residual_plot
    show_residual_plot(port, port * 0.95, title="overall",
                       savefig=str(tmp_path / "r.png"), show=False)
    assert (tmp_path / "r.png").exists()


def test_show_eigenprofiles(tmp_path):
    from pulseportraiture_tpu.viz import show_eigenprofiles
    rng = np.random.default_rng(1)
    show_eigenprofiles(rng.normal(0, 1, (64, 3)),
                       mean_prof=rng.normal(0, 1, 64),
                       savefig=str(tmp_path / "e.png"), show=False)
    assert (tmp_path / "e.png").exists()


def test_show_spline_curve_projections(tmp_path):
    from pulseportraiture_tpu.models.spline import fit_parametric_spline
    from pulseportraiture_tpu.viz import show_spline_curve_projections
    freqs = np.linspace(1100, 1900, 24)
    proj = np.stack([np.sin(freqs / 300.0), np.cos(freqs / 500.0)], -1)
    tck, _ = fit_parametric_spline(freqs, proj.T, s=0.1)
    show_spline_curve_projections(proj, freqs, tck=tck,
                                  savefig=str(tmp_path / "s.png"),
                                  show=False)
    assert (tmp_path / "s.png").exists()
