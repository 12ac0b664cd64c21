"""Diagnostic plots (matplotlib; import-guarded for headless use).

Functional equivalents of the reference's show_* family
(pplib.py:3505-4045): portrait image + profile/flux side panels, stacked
profiles, data/model/residual panels with per-channel red-chi2, eigen
profiles, and spline-curve projections.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    if not matplotlib.get_backend().lower().startswith(("qt", "tk", "mac",
                                                        "gtk", "wx")):
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def show_portrait(port, phases=None, freqs=None, title=None, prof=True,
                  fluxprof=True, rvrsd=False, colorbar=True, savefig=False,
                  show=True, aspect="auto", interpolation="none",
                  origin="lower", **kwargs):
    """Portrait image with optional mean-profile and flux side panels.

    Reference: pplib.py:3505-3610.
    """
    plt = _plt()
    port = np.asarray(port)
    nchan, nbin = port.shape
    if phases is None:
        phases = (np.arange(nbin) + 0.5) / nbin
    if freqs is None:
        freqs = np.arange(nchan)
    if rvrsd:
        port = port[::-1]
        freqs = freqs[::-1]
    extent = (phases[0], phases[-1], freqs.min(), freqs.max())
    fig = plt.figure(figsize=(8, 7))
    if prof or fluxprof:
        grid = fig.add_gridspec(2, 2, width_ratios=[4, 1],
                                height_ratios=[4, 1], hspace=0.05,
                                wspace=0.05)
        ax = fig.add_subplot(grid[0, 0])
    else:
        ax = fig.add_subplot(111)
    im = ax.imshow(port, aspect=aspect, origin=origin, extent=extent,
                   interpolation=interpolation, **kwargs)
    ax.set_ylabel("Frequency [MHz]")
    if title:
        ax.set_title(title)
    if prof:
        axp = fig.add_subplot(grid[1, 0], sharex=ax)
        axp.plot(phases, port.mean(0), "k-")
        axp.set_xlabel("Phase [rot]")
        axp.set_ylabel("Flux")
    if fluxprof:
        axf = fig.add_subplot(grid[0, 1], sharey=ax)
        axf.plot(port.mean(1), freqs, "k-")
        axf.set_xlabel("Flux")
    if colorbar:
        fig.colorbar(im, ax=ax, fraction=0.046)
    return _finish(plt, fig, savefig, show)


def show_profiles(port, nprofs=8, savefig=False, show=True):
    """A subset of channel profiles.  Reference: pplib.py:3677-3700."""
    plt = _plt()
    port = np.asarray(port)
    idx = np.linspace(0, len(port) - 1, min(nprofs, len(port))).astype(int)
    fig, ax = plt.subplots(figsize=(7, 5))
    for i in idx:
        ax.plot(port[i], label=f"chan {i}")
    ax.set_xlabel("Bin")
    ax.legend(fontsize=7)
    return _finish(plt, fig, savefig, show)


def show_stacked_profiles(port, freqs=None, spacing=None, savefig=False,
                          show=True):
    """Vertically offset channel profiles.  Reference: pplib.py:3612-3675."""
    plt = _plt()
    port = np.asarray(port)
    if spacing is None:
        spacing = 1.5 * np.abs(port).max()
    fig, ax = plt.subplots(figsize=(6, 9))
    for i, prof in enumerate(port):
        ax.plot(prof + i * spacing, "k-", lw=0.5)
    ax.set_xlabel("Bin")
    ax.set_yticks([])
    return _finish(plt, fig, savefig, show)


def show_residual_plot(port, model, phases=None, freqs=None, errs=None,
                       titles=("Data", "Model", "Residuals"),
                       savefig=False, show=True, **kwargs):
    """Data/model/residual panels + per-channel red-chi2 histogram.

    Reference: pplib.py:3702-3823.
    """
    plt = _plt()
    port = np.asarray(port)
    model = np.asarray(model)
    resid = port - model
    nchan, nbin = port.shape
    if phases is None:
        phases = (np.arange(nbin) + 0.5) / nbin
    if freqs is None:
        freqs = np.arange(nchan)
    extent = (phases[0], phases[-1], np.min(freqs), np.max(freqs))
    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    for ax, dataset, title in zip(axes.flat[:3], (port, model, resid),
                                  titles):
        ax.imshow(dataset, aspect="auto", origin="lower", extent=extent,
                  **kwargs)
        ax.set_title(title)
        ax.set_xlabel("Phase [rot]")
        ax.set_ylabel("Freq [MHz]")
    if errs is None:
        errs = resid.std(axis=1)
    errs = np.where(errs > 0, errs, 1.0)
    red_chi2 = (resid ** 2).sum(axis=1) / (errs ** 2 * nbin)
    axes.flat[3].hist(red_chi2[red_chi2 > 0], bins=20, color="gray")
    axes.flat[3].set_xlabel("Channel red chi2")
    return _finish(plt, fig, savefig, show)


def show_eigenprofiles(eigvec, mean_prof=None, ncomp=None, savefig=False,
                       show=True):
    """Mean profile + eigenprofiles.  Reference: pplib.py:3964-4045."""
    plt = _plt()
    eigvec = np.asarray(eigvec)
    if ncomp is None:
        ncomp = min(4, eigvec.shape[1])
    nrow = ncomp + (1 if mean_prof is not None else 0)
    fig, axes = plt.subplots(max(nrow, 1), 1, figsize=(6, 2 * nrow),
                             sharex=True)
    axes = np.atleast_1d(axes)
    irow = 0
    if mean_prof is not None:
        axes[0].plot(mean_prof, "k-")
        axes[0].set_ylabel("mean")
        irow = 1
    for ic in range(ncomp):
        axes[irow + ic].plot(eigvec[:, ic], "b-")
        axes[irow + ic].set_ylabel(f"e{ic}")
    axes[-1].set_xlabel("Bin")
    return _finish(plt, fig, savefig, show)


def show_spline_curve_projections(proj_port, freqs, tck=None, savefig=False,
                                  show=True):
    """Projected coordinates vs frequency (+ spline curve).

    Reference: pplib.py:3825-3962.
    """
    plt = _plt()
    proj_port = np.asarray(proj_port)
    ncomp = proj_port.shape[1]
    fig, axes = plt.subplots(max(ncomp, 1), 1, figsize=(6, 2 * ncomp),
                             sharex=True)
    axes = np.atleast_1d(axes)
    if tck is not None:
        from pulseportraiture_tpu.models.spline import splev
        fine = np.linspace(np.min(freqs), np.max(freqs), 400)
        curve = np.asarray(splev(fine, tck))
    for ic in range(ncomp):
        axes[ic].plot(freqs, proj_port[:, ic], "k.")
        if tck is not None:
            axes[ic].plot(fine, curve[ic], "r-")
        axes[ic].set_ylabel(f"proj {ic}")
    axes[-1].set_xlabel("Frequency [MHz]")
    return _finish(plt, fig, savefig, show)


def _finish(plt, fig, savefig, show):
    if savefig:
        fig.savefig(savefig if isinstance(savefig, str) else "ppplot.png",
                    dpi=120, bbox_inches="tight")
    if show and not savefig:
        try:
            plt.show()
        except Exception:
            pass
    plt.close(fig)
    return fig
