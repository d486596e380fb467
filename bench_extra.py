"""Extra measurement harness (guide §1.4): per-query noop-sink isolation,
plan capture, and ER/ML stage breakdown — WITHOUT touching the frozen
bench.py protocol.

Usage:
  python bench_extra.py queries [sf_dir] [rounds] [q1 q2 ...]
  python bench_extra.py plans   [sf_dir] [out_dir] [q1 q2 ...]
  python bench_extra.py er      [n_base] [rounds]
  python bench_extra.py ml      [n_base] [rounds]

Numbers printed here feed OPTIMIZATION_r07.md; the driver's comparable
numbers come from the round-start bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from neural_entity_matching_spark.session import get_spark

    return get_spark(app_name="nem-bench-extra", master=f"local[{CPUS}]",
                     shuffle_partitions=CPUS, tmpfs_shuffle=True)


def cmd_queries(sf_dir: str, rounds: int, only: list[str]) -> None:
    from neural_entity_matching_spark.plans import contract

    spark = _spark()
    names = only or list(contract.QUERIES)
    raw: list[dict[str, float]] = []
    for r in range(rounds + 1):  # +1 warm-up round, dropped
        q = {}
        for name in names:
            fn = contract.QUERIES[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            q[name] = round(time.monotonic() - t0, 3)
        if r > 0:
            raw.append(q)
        spark.sparkContext.setJobDescription(None)
    med = {n: round(statistics.median(r[n] for r in raw), 3) for n in names}
    mn = {n: round(min(r[n] for r in raw), 3) for n in names}
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds, "median": med,
                      "min": mn, "total_median": round(sum(med.values()), 3),
                      "raw": raw}))
    spark.stop()


def cmd_plans(sf_dir: str, out_dir: str, only: list[str]) -> None:
    from neural_entity_matching_spark.plans import contract

    spark = _spark()
    os.makedirs(out_dir, exist_ok=True)
    for name in (only or list(contract.QUERIES)):
        df = contract.QUERIES[name](spark, sf_dir)
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        with open(f"{out_dir}/{name}.txt", "w") as f:
            f.write(p)
        print(name, "->", f"{out_dir}/{name}.txt")
    spark.stop()


def _er_fixture(spark, n_base: int):
    from neural_entity_matching_spark.sources.synth import to_spark

    transcripts, labeled, _ = to_spark(spark, n_base=n_base, seed=42)
    transcripts = transcripts.cache()
    transcripts.count()
    labeled = labeled.cache()
    labeled.count()
    return transcripts, labeled


def cmd_er(n_base: int, rounds: int) -> None:
    import bench

    spark = _spark()
    transcripts, _ = _er_fixture(spark, n_base)
    warm = transcripts.limit(1500).cache()
    warm.count()
    bench.run_er_pipeline(spark, warm)
    warm.unpersist()
    runs = []
    for _ in range(rounds):
        runs.append(bench.run_er_pipeline(spark, transcripts))
    for k in ("wall", "block_wall", "score_wall", "cluster_wall"):
        vals = [round(r[k], 3) for r in runs]
        print(k, "median", round(statistics.median(vals), 3), "min",
              round(min(vals), 3), "raw", vals)
    print("pairs", runs[0]["pairs"], "clusters", runs[0]["clusters"],
          "oversized", runs[0]["oversized_blocks"])
    spark.stop()


def cmd_ml(n_base: int, rounds: int) -> None:
    import bench

    spark = _spark()
    transcripts, labeled = _er_fixture(spark, n_base)
    warm = transcripts.limit(1500).cache()
    warm.count()
    bench.run_er_pipeline(spark, warm)
    warm.unpersist()
    runs = []
    for _ in range(rounds):
        runs.append(bench.run_ml_scorer(spark, transcripts, labeled))
    for k in ("wall", "featurize_wall", "train_wall", "score_wall"):
        vals = [round(r[k], 3) for r in runs]
        print(k, "median", round(statistics.median(vals), 3), "min",
              round(min(vals), 3), "raw", vals)
    print("pairs", runs[0]["pairs"], "matches", runs[0]["matches"])
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        cmd_queries(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
                    int(sys.argv[3]) if len(sys.argv) > 3 else 3,
                    sys.argv[4:])
    elif cmd == "plans":
        cmd_plans(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
                  sys.argv[3] if len(sys.argv) > 3 else "plans/r07/tmp",
                  sys.argv[4:])
    elif cmd == "er":
        cmd_er(int(sys.argv[2]) if len(sys.argv) > 2 else 30000,
               int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif cmd == "ml":
        cmd_ml(int(sys.argv[2]) if len(sys.argv) > 2 else 30000,
               int(sys.argv[3]) if len(sys.argv) > 3 else 1)
    else:
        raise SystemExit(f"unknown command {cmd}")
