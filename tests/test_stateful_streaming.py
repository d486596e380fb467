"""applyInPandasWithState: per-conversation cumulative state across
micro-batches must equal the batch groupBy at end of stream."""

import pyspark.sql.functions as F

from neural_entity_matching_spark import schema
from neural_entity_matching_spark.sources.synth import generate
from neural_entity_matching_spark.streaming import ingest, stateful


def test_running_state_matches_batch(spark, tmp_path):
    src = str(tmp_path / "turns")
    t, _, _ = generate(n_base=25, seed=21)
    spark.createDataFrame(t, schema=schema.TRANSCRIPTS).repartition(6).write.mode(
        "overwrite"
    ).parquet(src)

    stream = ingest.stream_transcripts(spark, src)  # maxFilesPerTrigger=4 -> several batches
    q = (
        stateful.running_conversation_state(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_state")
        .start()
    )
    try:
        q.processAllAvailable()
        # update sink appends one row per (conv, batch) update: take the last
        rows = spark.sql(
            "SELECT conv_id, max(n_turns) AS n_turns, max(max_turn_idx) AS mx "
            "FROM conv_state GROUP BY conv_id"
        ).collect()
    finally:
        q.stop()
    got = {r["conv_id"]: (r["n_turns"], r["mx"]) for r in rows}

    exp_rows = (
        spark.read.parquet(src)
        .groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"))
        .collect()
    )
    exp = {r["conv_id"]: (r["n"], r["mx"]) for r in exp_rows}
    assert got == exp
