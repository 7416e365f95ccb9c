"""Shared utilities (convenience re-exports).

The canonical homes are the focused packages; this module exists for the
``ttasr.utils`` import path of the documented layout.
"""

from ttasr.core.config import ServiceConfig, load_config
from ttasr.core.logging import setup_api_logging, setup_hourly_logging
from ttasr.core.profiling import StageTimer, annotate, trace
from ttasr.engine.results import format_srt_timestamp, segments_to_srt, segments_to_txt
from ttasr.text.filters import filter_text, language_codes

__all__ = [
    "ServiceConfig", "load_config",
    "setup_api_logging", "setup_hourly_logging",
    "StageTimer", "annotate", "trace",
    "format_srt_timestamp", "segments_to_srt", "segments_to_txt",
    "filter_text", "language_codes",
]
