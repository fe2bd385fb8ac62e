"""jaxlsq.utils — checkpointing, profiling, and observability helpers."""

from .checkpoint import (latest_step, restore_checkpoint, restore_or_init,
                         save_checkpoint)
from .migrate import load_torchlsq_state
from .profiling import StepTimer, annotate, trace
from .report import format_report, quantizer_report, serving_size_report

__all__ = [
    "latest_step", "restore_checkpoint", "restore_or_init", "save_checkpoint",
    "StepTimer", "annotate", "trace",
    "load_torchlsq_state",
    "format_report", "quantizer_report", "serving_size_report",
]
