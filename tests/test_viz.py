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


def test_gaussian_selector_event_workflow():
    """Drive the interactive selector headlessly: drag-add via the
    rubber band, middle-click fit (residual panel), right-click remove,
    auto_gauss bootstrap (reference ppgauss.py:374-655)."""
    import matplotlib
    matplotlib.use("Agg", force=True)
    import numpy as np

    from pulseportraiture_tpu.ops.gaussian import gaussian_profile
    from pulseportraiture_tpu.viz import GaussianSelector

    nbin = 128
    rng = np.random.default_rng(0)
    prof = 2.0 * np.asarray(gaussian_profile(nbin, 0.45, 0.06)) + \
        rng.normal(0, 0.02, nbin)

    class _Ev:
        def __init__(self, ax, x, y, button=1, key=None):
            self.inaxes = ax
            self.xdata = x
            self.ydata = y
            self.button = button
            self.key = key

    sel = GaussianSelector(prof, 0.02, quiet=True)
    assert sel.ax_resid is not None
    # drag a box roughly over the pulse
    sel._on_press(_Ev(sel.ax, 0.40, 0.0, button=1))
    sel._on_move(_Ev(sel.ax, 0.48, 1.8))
    sel._on_release(_Ev(sel.ax, 0.48, 1.8, button=1))
    assert len(sel.components) == 1
    loc, wid, amp = sel.components[0]
    assert abs(loc - 0.44) < 0.02 and abs(wid - 0.08) < 0.02
    # middle-click fit
    sel._on_press(_Ev(sel.ax, 0.45, 1.0, button=2))
    assert sel.fitted_params is not None
    assert abs(sel.components[0][0] - 0.45) < 0.01  # loc refined
    assert abs(sel.components[0][1] - 0.06) < 0.02  # width recovered
    assert sel.residuals is not None and sel.residuals.std() < 0.05
    # add a junk component, right-click removes the LAST one
    sel._on_press(_Ev(sel.ax, 0.1, 0.0, button=1))
    sel._on_release(_Ev(sel.ax, 0.15, 0.5, button=1))
    assert len(sel.components) == 2
    sel._on_press(_Ev(sel.ax, 0.9, 0.0, button=3))
    assert len(sel.components) == 1
    assert abs(sel.components[0][0] - 0.45) < 0.01

    # auto_gauss: fully automatic single-component bootstrap
    sel2 = GaussianSelector(prof, 0.02, quiet=True, auto_gauss=0.05)
    assert sel2.fitted_params is not None
    assert abs(sel2.components[0][0] - 0.45) < 0.01
