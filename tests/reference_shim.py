"""Import the REFERENCE implementation's numerical core under python3.

The reference at /root/reference is python2 (print statements, exec,
psrchive imports).  Its extended-FFTFIT math (pptoaslib.py) and the
handful of pplib helpers it uses are pure numpy, so this shim:

  * regex-converts `print x` statements to `pass  # print`,
  * provides a stub `pplib` module exposing exactly the names
    pptoaslib's numeric functions touch (np, fft, Dconst,
    scattering_times/_profile_FT/_portrait_FT, rotate_portrait/data,
    phase-fit helpers), transcribed or re-exported,
  * execs the converted pptoaslib source in that namespace.

Used by tests/test_reference_parity.py to check our objective, gradient,
Hessian, covariance, and nu_zeros against the reference's own code.
This reads the reference for TESTING ONLY; no converted code ships in
the package.
"""

import re
import sys
import types

import numpy as np

REF = "/root/reference"


def _py3ify(src):
    out = []
    lines = src.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        if re.match(r"^\s*print\s+[^(\s]", line) or \
                re.match(r"^\s*print\s*$", line):
            indent = line[:len(line) - len(line.lstrip())]
            out.append(indent + "pass  # print")
            # swallow continuations: trailing backslash or open parens
            bal = line.count("(") - line.count(")")
            while (line.rstrip().endswith("\\") or bal > 0) and \
                    i + 1 < len(lines):
                i += 1
                line = lines[i]
                bal += line.count("(") - line.count(")")
        else:
            out.append(line)
        i += 1
    text = "\n".join(out)
    # python2 integer divisions at known sites (SURVEY.md section 2b)
    text = text.replace("(len(params) - 2) / 3", "(len(params) - 2) // 3")
    text = text.replace("(len(params) - 2)/3", "(len(params) - 2)//3")
    text = text.replace("nbin/2 + 1", "nbin//2 + 1")
    text = text.replace("len(params)/2", "len(params)//2")
    return text


def _pplib_stub():
    """Minimal pplib namespace: the symbols pptoaslib's numeric
    functions actually reference, rebuilt with numpy from the same
    formulas (pplib.py:44-83, 2428-2616, 4047-4095)."""
    pl = types.ModuleType("pplib")
    pl.np = np
    pl.fft = np.fft
    pl.Dconst = 0.000241 ** -1  # "traditional" (pplib.py:47-51)
    pl.F0_fact = 0
    pl.scattering_alpha = -4.0

    def scattering_times(tau, alpha, freqs, nu_tau):
        return tau * (freqs / nu_tau) ** alpha

    def scattering_profile_FT(tau, nbin, binshift=1.0):
        nharm = nbin // 2 + 1
        k = np.arange(nharm)
        if tau == 0.0:
            return np.ones(nharm)
        return (1.0 + 2j * np.pi * k * tau) ** -1

    def scattering_portrait_FT(taus, nbin, binshift=1.0):
        return np.array([scattering_profile_FT(t, nbin) for t in taus])

    def phase_transform(phi, DM, nu_ref1=np.inf, nu_ref2=np.inf, P=None,
                        mod=False):
        if P is None:
            P = 1.0
            mod = False
        phi_prime = phi + pl.Dconst * DM * (nu_ref2 ** -2 -
                                            nu_ref1 ** -2) / P
        if mod:
            phi_prime = np.where(abs(phi_prime) >= 0.5,
                                 phi_prime % 1, phi_prime)
            phi_prime = np.where(phi_prime >= 0.5, phi_prime - 1.0,
                                 phi_prime)
        return phi_prime

    def rotate_portrait(port, phase=0.0, DM=None, P=None, freqs=None,
                        nu_ref=np.inf):
        pFFT = np.fft.rfft(port, axis=1)
        for nn in range(len(pFFT)):
            if DM is None and freqs is None:
                pFFT[nn, :] *= np.exp(
                    2.0j * np.pi * np.arange(len(pFFT[nn])) * phase)
            else:
                D = pl.Dconst * DM / P
                phasor = np.exp(2.0j * np.pi * np.arange(len(pFFT[nn])) *
                                (phase + (D * (freqs[nn] ** -2.0 -
                                               nu_ref ** -2.0))))
                pFFT[nn, :] *= phasor
        return np.fft.irfft(pFFT)

    pl.scattering_times = scattering_times
    pl.scattering_profile_FT = scattering_profile_FT
    pl.scattering_portrait_FT = scattering_portrait_FT
    pl.phase_transform = phase_transform
    pl.rotate_portrait = rotate_portrait
    # symbols referenced by non-numeric parts of pptoaslib; stubbed
    pl.DataBunch = dict
    return pl


_cache = {}


def load_reference_pptoaslib():
    """exec the converted pptoaslib in a stubbed namespace; cached."""
    if "mod" in _cache:
        return _cache["mod"]
    from scipy.special import erf
    src = _py3ify(open(f"{REF}/pptoaslib.py").read())
    # drop the star import; we inject the stub names directly
    src = src.replace("from pplib import *", "")
    src = src.replace("from scipy.special import erf", "")
    pl = _pplib_stub()
    ns = {"np": np, "fft": np.fft, "erf": erf, "time": __import__("time"),
          "binshift": 1.0}
    for name in dir(pl):
        if not name.startswith("_"):
            ns[name] = getattr(pl, name)
    exec(compile(src, "pptoaslib_ref.py", "exec"), ns)
    mod = types.SimpleNamespace(**ns)
    _cache["mod"] = mod
    return mod


def _extract_defs(src, names):
    """Pull whole top-level `def name(...)` blocks out of a module
    source (reference pplib is not importable as a whole)."""
    lines = src.splitlines()
    out = []
    i = 0
    while i < len(lines):
        line = lines[i]
        m = re.match(r"^def (\w+)\(", line)
        if m and m.group(1) in names:
            out.append(line)
            i += 1
            while i < len(lines) and (not lines[i] or
                                      lines[i][0] in " \t#"):
                out.append(lines[i])
                i += 1
        else:
            i += 1
    return "\n".join(out)


def load_reference_pplib_generators():
    """The reference's Gaussian-portrait generator chain, executable."""
    if "gen" in _cache:
        return _cache["gen"]
    src = open(f"{REF}/pplib.py").read()
    block = _py3ify(_extract_defs(src, {
        "gaussian_profile", "gen_gaussian_profile",
        "gen_gaussian_portrait", "power_law_evolution",
        "linear_evolution", "evolve_parameter", "get_bin_centers",
        "rotate_data"}))
    pl = _pplib_stub()
    ns = {"np": np, "fft": np.fft, "Dconst": pl.Dconst,
          "scattering_times": pl.scattering_times,
          "scattering_portrait_FT": pl.scattering_portrait_FT,
          "binshift": 1.0}
    exec(compile(block, "pplib_gen_ref.py", "exec"), ns)
    mod = types.SimpleNamespace(**ns)
    _cache["gen"] = mod
    return mod
