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
                        "(default: header-aligned average)")
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
    from pulseportraiture_tpu.pipelines.align import align_archives

    align_archives(
        metafile=args.metafile, datafiles=args.datafiles,
        initial_guess=args.init, tscrunch=args.tscrunch,
        pscrunch=not args.stokes,
        outfile=args.outfile, norm=args.norm,
        fit_dm=not args.phase_only, niter=args.niter,
        SNR_cutoff=args.snr_cutoff, place=args.place,
        smooth=args.smooth, rot_phase=args.rot, quiet=args.quiet)
    return 0


if __name__ == "__main__":
    sys.exit(main())
