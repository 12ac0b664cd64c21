"""Spline model (.spl) serialization.

The reference pickles [modelname, source, datafile, mean_prof, eigvec,
tck] with protocol 2 (ppspline.py:206-232, pplib.py:2955-2987).  We read
that legacy format, and write both it (for cross-compatibility) and a
safer .npz representation (extension .spl.npz) that needs no unpickling.
"""

from __future__ import annotations

import pickle

import numpy as np

from pulseportraiture_tpu.models.spline import gen_spline_portrait


def write_spline_model(modelfile, modelname, source, datafile, mean_prof,
                       eigvec, tck, fmt="pickle", quiet=False):
    """Write a spline model.  fmt: 'pickle' (legacy-compatible) or 'npz'."""
    t, c, k = tck
    t = np.asarray(t)
    c = np.asarray(c)
    if fmt == "pickle":
        # legacy layout: tck coefficient list per dimension
        legacy_tck = [t, [np.asarray(ci) for ci in c], int(k)]
        with open(modelfile, "wb") as f:
            pickle.dump([modelname, source, datafile,
                         np.asarray(mean_prof), np.asarray(eigvec),
                         legacy_tck], f, protocol=2)
    elif fmt == "npz":
        np.savez(modelfile, modelname=modelname, source=source,
                 datafile=datafile, mean_prof=np.asarray(mean_prof),
                 eigvec=np.asarray(eigvec), knots=t, coefs=c, degree=int(k))
    else:
        raise ValueError(f"Unknown spline model format {fmt!r}")
    if not quiet:
        print("%s written." % modelfile)


def read_spline_model(modelfile, freqs=None, nbin=None, quiet=True):
    """Read a spline model (.spl pickle or .npz).

    Read-only: returns (modelname, source, datafile, mean_prof, eigvec,
    tck).  With freqs: returns (modelname, portrait built at freqs).
    Reference: pplib.py:2955-2987.
    """
    if str(modelfile).endswith(".npz"):
        z = np.load(modelfile, allow_pickle=False)
        modelname = str(z["modelname"])
        source = str(z["source"])
        datafile = str(z["datafile"])
        mean_prof = z["mean_prof"]
        eigvec = z["eigvec"]
        tck = (z["knots"], z["coefs"], int(z["degree"]))
    else:
        with open(modelfile, "rb") as f:
            modelname, source, datafile, mean_prof, eigvec, tck = \
                pickle.load(f, encoding="latin1")
        t, c, k = tck
        tck = (np.asarray(t), np.asarray(c), int(k))
    if freqs is None:
        return (modelname, source, datafile, mean_prof, eigvec, tck)
    from pulseportraiture_tpu.models.spline import gen_spline_portrait_np
    return (modelname,
            gen_spline_portrait_np(mean_prof, freqs, eigvec, tck, nbin))


def get_spline_model_coords(modelfile, nfreq=1000, lo_freq=None,
                            hi_freq=None):
    """Spline curve coordinates over a frequency grid.

    Reference: pplib.py:2989-3013.
    """
    from pulseportraiture_tpu.models.spline import splev
    modelname, source, datafile, mean_prof, eigvec, tck = \
        read_spline_model(modelfile, quiet=True)
    t = np.asarray(tck[0])
    if lo_freq is None:
        lo_freq = t.min()
    if hi_freq is None:
        hi_freq = t.max()
    model_freqs = np.linspace(lo_freq, hi_freq, nfreq)
    proj = np.asarray(splev(model_freqs, tck)).T
    return model_freqs, proj
