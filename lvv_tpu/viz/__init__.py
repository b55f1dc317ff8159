"""Visualization subsystem (reference src/rerun-visualization, SURVEY.md
§2.5): rerun.io streaming of LiDAR sweeps + predicted boxes."""
from .boxes import normalize_box_convention
from .rerun_viz import (RERUN_AVAILABLE, log_frame, stream_predictions,
                        stream_scene)
