"""Fitters / optimizers (L2 of SURVEY.md), all jit/vmap-compatible."""

from pulseportraiture_tpu.fitters.phase_shift import (
    fit_phase_shift,
    fit_phase_shift_batch,
)
from pulseportraiture_tpu.fitters.portrait import (
    fit_portrait,
    fit_portrait_full,
    fit_portrait_full_batch,
)
