from trackintel_spark.analysis.entropy import location_entropy
from trackintel_spark.analysis.privacy import anonymize_grid, anonymize_time
from trackintel_spark.analysis.prediction import (
    location_transition_matrix,
    predict_next_location,
)
from trackintel_spark.analysis.flows import origin_destination_matrix
from trackintel_spark.analysis.labelling import create_activity_flag, predict_transport_mode
from trackintel_spark.analysis.location_identification import (
    freq_method,
    location_identifier,
    osna_method,
    pre_filter_locations,
)
from trackintel_spark.analysis.metrics import jump_length, radius_gyration
from trackintel_spark.analysis.rollup import (
    grid_rollup,
    merge_grid_tiles,
    merge_time_buckets,
    time_rollup,
)
from trackintel_spark.analysis.modal_split import calculate_modal_split
from trackintel_spark.analysis.tracking_quality import split_overlaps, temporal_tracking_quality

__all__ = [
    "split_overlaps",
    "create_activity_flag",
    "predict_transport_mode",
    "radius_gyration",
    "grid_rollup",
    "merge_grid_tiles",
    "merge_time_buckets",
    "time_rollup",
    "jump_length",
    "origin_destination_matrix",
    "location_entropy",
    "location_transition_matrix",
    "predict_next_location",
    "anonymize_grid",
    "anonymize_time",
    "calculate_modal_split",
    "temporal_tracking_quality",
    "location_identifier",
    "pre_filter_locations",
    "freq_method",
    "osna_method",
]
