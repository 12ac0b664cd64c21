"""Synthetic data generation (cross-cutting layer of SURVEY.md)."""

from pulseportraiture_tpu.sim.fake import (make_fake_pulsar,
                                           add_scintillation,
                                           make_constant_portrait,
                                           mean_C2N, dDM)
