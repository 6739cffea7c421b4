"""Multimodal column plumbing: schemas, batch shapes, determinism."""

import pytest
from pyspark.sql import functions as F

from bigvectorbench_spark.operators import multimodal as mm
from bigvectorbench_spark.operators.knn import knn


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=60).cache()


def test_media_schema(media):
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    assert dict(media.dtypes)["content"] == "binary"


def test_decode_image_shapes(media):
    out = mm.decode_image(media, max_pixels=32 * 32).collect()
    assert len(out) == 20  # a third of 60
    for r in out:
        assert len(r["pixels"]) == r["height"] * r["width"]
        assert r["height"] * r["width"] <= 32 * 32


def test_decode_deterministic(media):
    a = {r["media_id"]: r["pixels"][:5] for r in mm.decode_image(media).collect()}
    b = {r["media_id"]: r["pixels"][:5] for r in mm.decode_image(media).collect()}
    assert a == b


def test_extract_features_and_knn(media, spark):
    emb = mm.extract_features(media, dim=16)
    rows = emb.collect()
    assert len(rows) == 60 and all(len(r["embedding"]) == 16 for r in rows)
    # embeddings feed straight into the kNN operator (the mm-ann pipeline)
    train = emb.selectExpr("media_id as id", "embedding as vec")
    q = train.limit(3).selectExpr("id as qid", "vec")
    res = knn(train, q, k=3, method="expr")
    top1 = {r["qid"]: r["id"] for r in res.filter("rank = 1").collect()}
    assert all(top1[q] == q for q in top1)  # self is nearest


def test_resize_meta_aspect(media):
    out = mm.resize_meta(media.filter("kind = 'image'"), max_side=32).collect()
    for r in out:
        assert max(r["target_width"], r["target_height"]) <= 32
        # aspect ratio approximately preserved
        orig = r["meta"]["width"] / r["meta"]["height"]
        new = r["target_width"] / r["target_height"]
        assert abs(orig - new) / orig < 0.2


def test_sample_frames(media):
    out = mm.sample_frames(media, every_n=30).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    meta = {r["media_id"]: r["meta"]["n_frames"] for r in
            media.filter("kind = 'video'").collect()}
    assert set(by_id) == set(meta)
    for mid, frames in by_id.items():
        assert frames == list(range(0, meta[mid], 30))
