"""Text-analysis functions + evaluation metrics (AP vs pure-python oracle,
missed-positive adjustment, pruning/recall arithmetic, plan quality)."""

import pyspark.sql.functions as F
import pytest

from neural_entity_matching_spark.functions import text
from neural_entity_matching_spark.operators import evaluation


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(1, "The data  of tables"), (2, "zz zz zz zz"), (3, "x1 y2! z")],
        ["id", "t"],
    )
    out = df.select(
        "id",
        text.n_ws_tokens(F.col("t")).alias("n"),
        text.n_bpe_tokens(F.col("t")).alias("bpe"),
        F.round(text.distinct_token_ratio(F.col("t")), 4).alias("dr"),
        text.content_fingerprint(F.col("t")).alias("fp"),
        text.lang_id(F.col("t")).alias("lang"),
    ).collect()
    r = {x["id"]: x for x in out}
    assert r[1]["n"] == 4 and r[1]["dr"] == 1.0
    assert r[2]["n"] == 4 and r[2]["dr"] == 0.25
    assert r[3]["bpe"] == 6  # x,1,y,2,!,z
    assert r[1]["lang"] == "en" and r[2]["lang"] == "unk"
    fp2 = df.filter(F.col("id") == 1).select(
        text.content_fingerprint(F.lit(" the DATA of   tables "))
    ).collect()[0][0]
    assert r[1]["fp"] == fp2  # normalization-stable


def test_rolling_fingerprints_detect_containment(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    contained = "PREFIX " * 5 + base[:200]
    df = spark.createDataFrame([(1, base), (2, contained), (3, "unrelated words only")], ["id", "t"])
    fps = df.select("id", text.rolling_fingerprints(F.col("t")).alias("f")).collect()
    f = {r["id"]: set(r["f"]) for r in fps}
    assert f[1] & f[2]  # shared chunks found
    assert not (f[1] & f[3])


def test_average_precision_matches_python(spark):
    rows = [(0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0), (0.5, 1), (0.4, 0)]
    df = spark.createDataFrame(rows, ["score", "y"])
    got = evaluation.average_precision(df)
    # pure-python AP on the same ranking
    ranked = sorted(rows, key=lambda r: (-r[0], r[1]))
    cum = 0
    s = 0.0
    for i, (_, y) in enumerate(ranked, start=1):
        cum += y
        if y:
            s += cum / i
    exp = s / 3
    assert got == pytest.approx(exp)


def test_missed_positive_adjustment(spark):
    scored = spark.createDataFrame(
        [("a", "b", 0.9, 1), ("a", "c", 0.2, 0)],
        ["conv_id_a", "conv_id_b", "score", "is_match"],
    )
    truth = spark.createDataFrame(
        [("a", "b"), ("x", "y")], ["conv_id_a", "conv_id_b"]
    )
    adj = evaluation.missed_positive_adjustment(scored, truth)
    rows = {(r["conv_id_a"], r["conv_id_b"]): r for r in adj.collect()}
    assert rows[("x", "y")]["score"] == 0.0  # blocker-missed positive appended
    assert len(rows) == 3


def test_filter_pushdown_reaches_parquet_scan(spark):
    """Plan-quality gate: a filtered, projected parquet read must show
    PushedFilters + pruned ReadSchema in the formatted plan."""
    df = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    explained = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ) if hasattr(df._sc._jvm, "PythonSQLUtils") else plan
    text_plan = str(explained)
    assert "PushedFilters" in text_plan
    assert "o_orderstatus" in text_plan.split("PushedFilters", 1)[1][:200]
    # column pruning: the scan schema must not include unused columns
    read_schema = text_plan.split("ReadSchema", 1)[1][:300]
    assert "o_orderdate" not in read_schema
