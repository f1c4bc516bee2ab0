"""Multimodal pipeline: binary plumbing through Arrow-batched stages
(deterministic fake decode), codec gating, and schema contracts."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_application_spark.functions import multimodal as M
from vector_search_application_spark.operators import media_udf
from vector_search_application_spark.plans import corpus


@pytest.fixture(scope="module")
def media(spark):
    docs = corpus.docs(spark, SF_SMOKE).limit(120)
    return M.media_corpus(docs).cache()


def test_media_corpus_schema_and_metadata(media):
    assert dict(media.dtypes)["content"] == "binary"
    bad_audio = media.filter(
        (F.col("media_type") == "audio") & F.col("width").isNotNull()
    ).count()
    assert bad_audio == 0
    bad_visual = media.filter(
        F.col("media_type").isin("image", "video") & F.col("sample_rate").isNotNull()
    ).count()
    assert bad_visual == 0


def test_image_features_deterministic(media):
    rows = media_udf.image_features(media).orderBy("doc_id").collect()
    assert len(rows) == media.filter(F.col("media_type") == "image").count() > 0
    # recompute one row driver-side from the raw payload
    sample = (
        media.filter(F.col("media_type") == "image")
        .orderBy("doc_id")
        .select("doc_id", "content", "width", "height")
        .first()
    )
    n = sample["width"] * sample["height"]
    px = list(sample["content"][:n]) + [0] * max(0, n - len(sample["content"]))
    got = next(r for r in rows if r["doc_id"] == sample["doc_id"])
    assert got["min_px"] == min(px)
    assert got["max_px"] == max(px)
    assert abs(got["mean_px"] - sum(px) / n) < 1e-5


def test_resize_output_shape_contract(media):
    out = media_udf.resize_images(media, 16, 12)
    lens = out.select(F.length("content").alias("n")).distinct().collect()
    assert [r["n"] for r in lens] == [16 * 12]


def test_frame_sampling(media):
    frames = media_udf.sample_frames(media, frame_bytes=32, every_k=2)
    rows = frames.collect()
    assert all(r["frame_idx"] % 2 == 0 for r in rows)
    sample = (
        media.filter(F.col("media_type") == "video").select("doc_id", "content").first()
    )
    expect = hashlib.md5(sample["content"][:32]).hexdigest()
    got = [r for r in rows if r["doc_id"] == sample["doc_id"] and r["frame_idx"] == 0]
    assert got[0]["frame_digest"] == expect


def test_real_codec_gated(media):
    checked = 0
    for fn, lib in [
        (media_udf.image_features, "PIL"),
        (lambda m, backend: media_udf.resize_images(m, 8, 8, backend=backend), "PIL"),
        (media_udf.sample_frames, "av"),
    ]:
        try:
            __import__(lib)
            continue  # this lib is installed; gate not applicable —
            # but keep checking the OTHER backends (a whole-test skip
            # here left e.g. the av gate unchecked whenever PIL exists)
        except ImportError:
            pass
        with pytest.raises(NotImplementedError):
            fn(media, backend="real")
        checked += 1
    if checked == 0:
        pytest.skip("all codec libs installed; gating not applicable")


def test_unknown_backend_rejected(media):
    with pytest.raises(ValueError):
        media_udf.image_features(media, backend="bogus")
