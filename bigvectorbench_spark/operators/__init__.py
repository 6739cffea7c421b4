# NOTE: no re-exports here — a `from .knn import knn` would shadow the
# `operators.knn` *module* with the `knn` *function* and break
# `from bigvectorbench_spark.operators import knn as knn_ops` imports.
# The convenience API lives in the top-level package __init__ instead.
