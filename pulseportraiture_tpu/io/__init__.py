"""Archive/model/TOA I/O (L0 and L5 of SURVEY.md)."""

from pulseportraiture_tpu.io.mjd import MJD
from pulseportraiture_tpu.io.par import parse_par
from pulseportraiture_tpu.io.psrfits import (Archive, read_psrfits,
                                             write_psrfits)
from pulseportraiture_tpu.io.archive import load_data, unload_new_archive, \
    write_archive
from pulseportraiture_tpu.io.tim import write_TOAs, write_princeton_TOA, \
    filter_TOAs
from pulseportraiture_tpu.io.telescopes import telescope_code_dict
