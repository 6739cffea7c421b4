import os

import numpy as np
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from bigvectorbench_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "bvb-tests",
        **{
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": "/tmp/bvb-test-warehouse",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def make_blobs(n, d, centers=10, seed=1):
    """Deterministic gaussian blobs mirroring the reference's random_float
    fixtures (datasets.py:332-340, random_state=1)."""
    rng = np.random.RandomState(seed)
    C = rng.randn(centers, d) * 5
    idx = rng.randint(0, centers, size=n)
    return (C[idx] + rng.randn(n, d)).astype(np.float32)


@pytest.fixture(scope="session")
def vec_fixture(spark):
    """9000/1000 split, d=32 — the random-xs-32-euclidean analog."""
    X = make_blobs(1000, 16, seed=1)
    train = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(900)], "id bigint, vec array<float>"
    ).cache()
    test = spark.createDataFrame(
        [(i, [float(x) for x in X[900 + i]]) for i in range(100)], "qid bigint, vec array<float>"
    ).cache()
    return train, test


def brute_force_knn(X_train, X_test, k, metric="euclidean"):
    """Numpy oracle with the reference's exact formulas (distance.py)."""
    out = []
    for q in X_test:
        if metric == "euclidean":
            d = np.sqrt(((X_train.astype(np.float64) - q.astype(np.float64)) ** 2).sum(axis=1))
        elif metric == "angular":
            a = X_train.astype(np.float64)
            d = 1 - (a @ q.astype(np.float64)) / (np.linalg.norm(a, axis=1) * np.linalg.norm(q))
        elif metric == "hamming":
            d = (X_train != q).mean(axis=1)
        else:
            raise ValueError(metric)
        order = np.lexsort((np.arange(len(d)), d))[:k]
        out.append(order)
    return np.array(out)
