"""Structured Streaming: file source -> watermark/window/session aggs ->
memory sink, driven deterministically with processAllAvailable."""

import pyspark.sql.functions as F

from neural_entity_matching_spark.sources.synth import generate
from neural_entity_matching_spark.streaming import ingest


def _write_fixture(spark, path, n_base=40):
    t, _, _ = generate(n_base=n_base, seed=13)
    from neural_entity_matching_spark import schema

    spark.createDataFrame(t, schema=schema.TRANSCRIPTS).repartition(4).write.mode(
        "overwrite"
    ).parquet(path)


def test_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "turns")
    _write_fixture(spark, src)
    stream = ingest.stream_transcripts(spark, src)
    q = (
        ingest.windowed_turn_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["role"]): r["n_turns"]
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
    finally:
        q.stop()

    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "role")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    exp = {(r["w"]["start"], r["role"]): r["n"] for r in batch}
    assert got == exp


def test_session_windows_close_conversations(spark, tmp_path):
    src = str(tmp_path / "turns2")
    _write_fixture(spark, src, n_base=20)
    stream = ingest.stream_transcripts(spark, src)
    q = (
        ingest.conversation_sessions(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sessions").collect()
    finally:
        q.stop()
    assert rows
    # every session's turn count is consistent with max_turn_idx
    for r in rows:
        assert r["n_turns"] >= 1
        assert r["max_turn_idx"] >= r["n_turns"] - 1


def test_incremental_signatures_foreachbatch(spark, tmp_path):
    src = str(tmp_path / "turns3")
    target = str(tmp_path / "sigs")
    ckpt = str(tmp_path / "sck")
    _write_fixture(spark, src, n_base=15)
    stream = ingest.stream_transcripts(spark, src)
    q = ingest.incremental_signatures(spark, stream, target, ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(target)
    from neural_entity_matching_spark.functions.normalize import build_signatures

    exp = build_signatures(spark.read.parquet(src))
    # EVERY conversation — including those whose turns straddle
    # micro-batches (maxFilesPerTrigger=4 over 4 input files guarantees
    # splits) — must match the batch signature exactly: the handler
    # rebuilds from the accumulated turn history, never the batch subset
    assert got.count() == exp.count()
    g = {r["conv_id"]: r["sig_text"] for r in got.collect()}
    e = {r["conv_id"]: r["sig_text"] for r in exp.collect()}
    assert g == e
