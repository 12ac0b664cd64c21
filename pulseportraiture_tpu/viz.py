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
                       titles=("Data", "Model", "Residuals"), title=None,
                       savefig=False, show=True, **kwargs):
    """Data/model/residual panels + per-channel red-chi2 histogram.

    Reference: pplib.py:3702-3823.  ``title`` is an overall figure title;
    ``titles`` label the three panels.
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
    for ax, dataset, panel_title in zip(axes.flat[:3],
                                        (port, model, resid), titles):
        ax.imshow(dataset, aspect="auto", origin="lower", extent=extent,
                  **kwargs)
        ax.set_title(panel_title)
        ax.set_xlabel("Phase [rot]")
        ax.set_ylabel("Freq [MHz]")
    if errs is None:
        errs = resid.std(axis=1)
    errs = np.where(errs > 0, errs, 1.0)
    red_chi2 = (resid ** 2).sum(axis=1) / (errs ** 2 * nbin)
    axes.flat[3].hist(red_chi2[red_chi2 > 0], bins=20, color="gray")
    axes.flat[3].set_xlabel("Channel red chi2")
    if title:
        fig.suptitle(title)
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


class GaussianSelector:
    """Interactive matplotlib profile-component picker.

    A thin event-driven frontend over the jit Gaussian fitters,
    replicating the reference's workflow (ppgauss.py:374-655):
    left-click-drag adds a Gaussian at the dragged location/width,
    middle-click runs the fit, right-click near a component removes it.
    Close the figure to finish; the final fit is in ``self.fit``.
    """

    def __init__(self, profile, errs, fit_scattering=False, quiet=True):
        import jax.numpy as jnp
        self._jnp = jnp
        self.profile = np.asarray(profile, dtype=float)
        self.errs = errs
        self.fit_scattering = fit_scattering
        self.quiet = quiet
        self.nbin = len(self.profile)
        self.phases = (np.arange(self.nbin) + 0.5) / self.nbin
        self.components = []  # (loc, wid, amp)
        self.dc = float(np.median(self.profile))
        self.fit = None
        self._press = None
        plt = _plt()
        self.fig, self.ax = plt.subplots(figsize=(10, 5))
        self.ax.plot(self.phases, self.profile, "k-", lw=1)
        self.ax.set_xlabel("Phase [rot]")
        self.ax.set_ylabel("Amplitude")
        self._model_line, = self.ax.plot([], [], "r-", lw=1)
        self.fig.canvas.mpl_connect("button_press_event", self._on_press)
        self.fig.canvas.mpl_connect("button_release_event",
                                    self._on_release)
        plt.show()

    def _on_press(self, event):
        if event.inaxes != self.ax:
            return
        if event.button == 1:
            self._press = (event.xdata, event.ydata)
        elif event.button == 2:
            self._do_fit()
        elif event.button == 3 and self.components:
            dists = [abs(c[0] - event.xdata) for c in self.components]
            self.components.pop(int(np.argmin(dists)))
            self._redraw()

    def _on_release(self, event):
        if event.inaxes != self.ax or self._press is None or \
                event.button != 1:
            return
        x0, y0 = self._press
        self._press = None
        loc = x0
        wid = max(abs(event.xdata - x0), 1.0 / self.nbin)
        amp = max(y0 - self.dc, float(self.profile.max()) * 0.05)
        self.components.append((loc, wid, amp))
        self._redraw()

    def _params(self):
        params = [self.dc, 0.0]
        for loc, wid, amp in self.components:
            params += [loc, wid, amp]
        return params

    def _do_fit(self):
        if not self.components:
            return
        from pulseportraiture_tpu.models.gaussian import \
            fit_gaussian_profile
        jnp = self._jnp
        self.fit = fit_gaussian_profile(
            jnp.asarray(self.profile), jnp.asarray(self._params()),
            self.errs, fit_scattering=self.fit_scattering,
            quiet=self.quiet)
        p = list(self.fit.fitted_params)
        self.dc = p[0]
        self.components = [(p[i], p[i + 1], p[i + 2])
                           for i in range(2, len(p) - 2, 3)]
        self._redraw()

    def _redraw(self):
        from pulseportraiture_tpu.models.gaussian import \
            gen_gaussian_profile
        jnp = self._jnp
        model = np.asarray(gen_gaussian_profile(
            jnp.asarray(self._params()), self.nbin))
        self._model_line.set_data(self.phases, model)
        self.fig.canvas.draw_idle()


def set_colormap(cmap="viridis"):
    """Set the default matplotlib colormap (reference pplib.py:656-669)."""
    import matplotlib
    matplotlib.rcParams["image.cmap"] = cmap
