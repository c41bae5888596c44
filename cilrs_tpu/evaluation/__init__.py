"""Evaluation: on-device metrics accumulation, host-side scoring/grading/report, HUD."""

from cilrs_tpu.evaluation.metrics import Metrics, init_metrics, update_metrics  # noqa: F401
from cilrs_tpu.evaluation.scoring import compute_scores, format_report  # noqa: F401
