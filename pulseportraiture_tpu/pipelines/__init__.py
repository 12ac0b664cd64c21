"""Measurement pipelines (L4 of SURVEY.md)."""

from pulseportraiture_tpu.pipelines.toas import GetTOAs
from pulseportraiture_tpu.pipelines.align import align_archives
from pulseportraiture_tpu.pipelines.zap import get_zap_channels
