"""ppalign — align and average archives into a template portrait.

Reference CLI: ppalign.py:245-380.  PSRCHIVE psradd/psrsmooth shell-outs
are replaced by in-framework averaging and wavelet smoothing.
"""

from __future__ import annotations

import argparse
import sys


def build_parser():
    p = argparse.ArgumentParser(
        prog="ppalign",
        description="Iteratively align and average archives.")
    p.add_argument("-M", "--metafile", default=None,
                   help="metafile listing archives to align")
    p.add_argument("-d", "--datafiles", nargs="*", default=None,
                   help="archive files to align")
    p.add_argument("-I", "--init", default=None,
                   help="initial-template archive "
                        "(default: header-aligned average of the inputs)")
    p.add_argument("-g", "--width", type=float, default=None,
                   help="align to a single constant Gaussian component of "
                        "this FWHM (in phase) instead of -I")
    p.add_argument("-o", "--outfile", default="aligned.fits",
                   help="output averaged archive")
    p.add_argument("-T", "--tscrunch", action="store_true",
                   help="time-scrunch archives before aligning")
    p.add_argument("-D", "--phase_only", action="store_true",
                   help="fit phase only (no DM)")
    p.add_argument("-p", "--stokes", action="store_true",
                   help="average all four Stokes polarizations "
                        "(alignment still uses total intensity)")
    p.add_argument("-C", "--snr_cutoff", type=float, default=0.0,
                   help="skip subints below this S/N")
    p.add_argument("-N", "--norm", default=None,
                   choices=["mean", "max", "prof", "rms", "abs"],
                   help="normalize the final average")
    p.add_argument("-s", "--smooth", action="store_true",
                   help="wavelet-smooth the final average")
    p.add_argument("-r", "--rot", type=float, default=0.0,
                   help="rotate the final average by this phase")
    p.add_argument("--place", type=float, default=None,
                   help="place the profile peak at this phase")
    p.add_argument("--niter", type=int, default=1,
                   help="alignment iterations")
    p.add_argument("--quiet", action="store_true")
    from pulseportraiture_tpu.cli import add_common_args
    return add_common_args(p)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from pulseportraiture_tpu.cli import apply_common_args
    apply_common_args(args)
    if not args.metafile and not args.datafiles:
        sys.exit("provide -M metafile or -d datafiles")
    import os
    import tempfile

    from pulseportraiture_tpu.pipelines.align import (align_archives,
        average_archives, psrsmooth_archive)
    from pulseportraiture_tpu.pipelines.toas import _resolve_datafiles

    files = args.datafiles or _resolve_datafiles(args.metafile)

    # Initial-template selection mirrors the reference __main__
    # (ppalign.py:342-368): -g builds a constant single-Gaussian
    # portrait (overrides -I); no -I averages the inputs header-aligned
    # (the psradd replacement); a 1-channel -I archive is expanded to a
    # constant portrait of the data's own average profile.
    init = args.init
    tmp_init = None
    if args.width is not None or init is None:
        fd, tmp_init = tempfile.mkstemp(suffix=".tmp.fits",
                                        prefix="ppalign.")
        os.close(fd)
    if args.width is not None:
        import numpy as np

        from pulseportraiture_tpu.io.psrfits import read_psrfits
        from pulseportraiture_tpu.ops.gaussian import gaussian_profile
        from pulseportraiture_tpu.sim.fake import make_constant_portrait
        nbin = read_psrfits(files[0]).data.shape[-1]
        profile = np.asarray(gaussian_profile(nbin, 0.5, args.width))
        make_constant_portrait(files[0], tmp_init, profile=profile,
                               DM=0.0, dmc=False, quiet=True)
        init = tmp_init
    elif init is None:
        average_archives(files, tmp_init, tscrunch=True,
                         pscrunch=not args.stokes, quiet=True)
        init = tmp_init
    else:
        from pulseportraiture_tpu.io.psrfits import read_psrfits
        if read_psrfits(init).data.shape[2] == 1:
            from pulseportraiture_tpu.sim.fake import \
                make_constant_portrait
            fd, tmp_init = tempfile.mkstemp(suffix=".tmp.fits",
                                            prefix="ppalign.")
            os.close(fd)
            make_constant_portrait(files[0], tmp_init, profile=None,
                                   DM=0.0, dmc=False, quiet=True)
            init = tmp_init

    try:
        align_archives(
            metafile=args.metafile, datafiles=args.datafiles,
            initial_guess=init, tscrunch=args.tscrunch,
            pscrunch=not args.stokes,
            outfile=args.outfile, norm=args.norm,
            fit_dm=not args.phase_only, niter=args.niter,
            SNR_cutoff=args.snr_cutoff, place=args.place,
            rot_phase=args.rot, quiet=args.quiet)
        if args.smooth:
            # second, smoothed archive alongside the average
            # (reference ppalign.py:369-373)
            psrsmooth_archive(args.outfile, quiet=args.quiet)
    finally:
        if tmp_init is not None and os.path.exists(tmp_init):
            os.remove(tmp_init)
    return 0


if __name__ == "__main__":
    sys.exit(main())
