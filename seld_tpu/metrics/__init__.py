"""Evaluation metrics: L3DAS21 location-sensitive detection + DCASE21 SELD."""

from seld_tpu.metrics.decode import gen_submission_list_task2  # noqa: F401
from seld_tpu.metrics.lsd import (  # noqa: F401
    location_sensitive_detection,
    sed_score_computation,
    compute_seld_metrics,
)
from seld_tpu.metrics.dcase21 import (  # noqa: F401
    SELDMetrics,
    distance_between_cartesian_coordinates,
    distance_between_spherical_coordinates_rad,
    early_stopping_metric,
    least_distance_between_gt_pred,
    segment_labels,
)
