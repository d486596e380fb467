"""Multimodal plumbing: binary payload schema, mapInPandas featurization
with an injected deterministic decoder, frame-sampling plan, stub refusal."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_entity_matching_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image/png", bytes(range(64)), 8, 8, None),
        (2, "image/png", bytes(range(64)), 8, 8, None),  # identical payload
        (3, "audio/wav", b"\x01\x02\x03\x04" * 100, None, None, 400),
        (4, "video/mp4", b"\xff" * 256, 16, 16, 3500),
        (5, "image/png", None, None, None, None),  # null payload
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA).cache()


def test_stub_refuses_without_decoder(media):
    with pytest.raises(Exception) as exc:
        multimodal.extract_media_features(media).collect()
    assert "NotImplementedError" in str(exc.value) or "decode" in str(exc.value)


def test_fake_decoder_features_deterministic(media):
    dec = multimodal.deterministic_fake_decoder(dim=16)
    out = multimodal.extract_media_features(media, decode_fn=dec)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 5
    # identical payloads -> identical features (dedup-ready)
    assert rows[1]["feature"] == rows[2]["feature"]
    assert rows[1]["n_bytes"] == 64
    assert rows[5]["n_bytes"] == 0
    # unit norm (fake decoder normalizes)
    v = np.array(rows[3]["feature"])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_features_feed_ann(media, spark):
    """Feature column plugs straight into the ANN operator."""
    from neural_entity_matching_spark.operators import ann

    dec = multimodal.deterministic_fake_decoder(dim=16)
    feats = multimodal.extract_media_features(media, decode_fn=dec).select(
        F.col("media_id").alias("vec_id"),
        F.col("feature").cast("array<double>").alias("embedding"),
    )
    out = ann.brute_force_topk(feats, feats.filter(F.col("vec_id") == 1), k=1)
    top = out.collect()[0]
    assert top["nn_id"] == 2  # the byte-identical payload
    assert top["cos_sim"] == pytest.approx(1.0)


def test_frame_sampling_plan(media):
    frames = multimodal.sample_frames(media, every_ms=1000).collect()
    got = [(r["media_id"], r["frame_ts_ms"]) for r in frames]
    assert got == [(4, 0), (4, 1000), (4, 2000), (4, 3000)]
