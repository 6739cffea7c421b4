from bigvectorbench_spark.functions.distance import (
    angular_dist,
    dot,
    hamming_dist,
    jaccard_dist,
    jaccard_valid,
    l2_dist,
    l2_sq,
    metric_dist,
    norm_l2,
    norm_sq,
    unit_vec,
)

__all__ = [
    "angular_dist",
    "dot",
    "hamming_dist",
    "jaccard_dist",
    "jaccard_valid",
    "l2_dist",
    "l2_sq",
    "metric_dist",
    "norm_l2",
    "norm_sq",
    "unit_vec",
]
