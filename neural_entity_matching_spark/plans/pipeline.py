"""End-to-end pipeline orchestration: block -> score -> cluster, with
snapshot checkpoints, resume, and per-partition lineage metrics.

This is the Spark lifecycle of the reference's EP2
(reference script/model_magellan_ml.py:138-430) re-expressed as staged
DataFrame jobs (SURVEY.md §3): scan -> normalize -> signature -> minhash
band keys -> salted/capped block join -> pair features -> scorer ->
threshold -> edge list -> connected components -> clusters table. Each
stage commits a snapshot (sources/io.py) and appends lineage rows, so a
killed run resumes from the last committed stage (north rule).
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neural_entity_matching_spark.functions.minhash import HASH_FAMILY
from neural_entity_matching_spark.functions.normalize import build_signatures
from neural_entity_matching_spark.operators.blocking import lsh_block
from neural_entity_matching_spark.operators.clustering import connected_components
from neural_entity_matching_spark.operators.scoring import (
    fast_threshold_score,
    featurize_pairs,
    threshold_scorer,
)
from neural_entity_matching_spark.sources.io import CheckpointManager, fingerprint


# which config fields a stage's output actually depends on — the grid
# runner sweeps configs, and two configs that agree on a stage's fields
# (and upstream) share the stage snapshot instead of recomputing it
# (reference expand_grid recomputes everything per combination,
# model_magellan_ml.py:383-430)
STAGE_FIELDS = {
    "signatures": (),
    "candidates": ("blocker", "num_hashes", "bands", "char_ngram", "seed",
                   "block_cap", "seq_min_tokens", "seq_cutoff",
                   "seq_max_token_df"),
    "scored": ("scorer", "threshold", "w_lev", "w_jacc", "exact_scores",
               "ml_seed", "feat_lev_band", "feat_hashed_tokens"),
    "clusters": (),
}


@dataclass
class PipelineConfig:
    # blocking axis — the reference grid sweeps blocker type
    # {lsh, sequential} x params (model_magellan_ml.py:183-193,383-396):
    # 'lsh' = MinHash-LSH band join; 'sequential' = token-overlap
    # candidates then edit-distance filter on survivors
    blocker: str = "lsh"
    num_hashes: int = 128
    bands: int = 64
    char_ngram: int = 8
    seed: int = 42
    block_cap: int = 35
    # sequential-blocker params (reference overlap_size and
    # cutoff_distance in {50,60,70,80}, model_magellan_ml.py:391)
    seq_min_tokens: int = 2
    seq_cutoff: float = 60.0
    seq_max_token_df: int | None = 1000
    # scoring axis — 'threshold' (deterministic linear) or a trained
    # matcher 'logistic' | 'gbt' | 'random_forest' (reference M1, trained
    # on the post-blocking labeled candidates; requires labeled_pairs).
    # A trained scorer's output depends on the label table; run_pipeline
    # digests labeled_pairs and folds it into the scored-stage
    # fingerprint, so a changed label set re-scores instead of resuming
    # a stale snapshot (enforced in code, not a caller contract).
    scorer: str = "threshold"
    ml_seed: int = 0
    threshold: float = 0.55
    w_lev: float = 0.5
    w_jacc: float = 0.5
    # broadcast the signature table into the featurize joins — valid while
    # signatures fit an executor; keep False at full table scale
    broadcast_signatures: bool = False
    # in-partition sort of candidates by conv_id_a before scoring for
    # payload-probe cache locality — pays only on bandwidth-starved
    # few-core executors; measured a net loss on many-core hosts
    # (see compute_scored)
    cluster_pairs_by_a: bool = False
    # split the scoring broadcast into a toks-only probe map plus a
    # string map probed only by jaccard survivors — bit-identical
    # decisions/scores, ~75% fewer broadcast bytes per probe (93% of
    # pairs never fetch the string); requires broadcast_signatures.
    # Physical knob: excluded from stage fingerprints like the other
    # broadcast/sort toggles, so flipping it never invalidates snapshots
    split_broadcast: bool = False
    # exact_scores=False uses the banded-levenshtein cascade: identical
    # match decisions, exact scores on matches, upper-bounded scores on
    # non-matches, ~order-of-magnitude less edit-distance work
    exact_scores: bool = False
    # feature-table knobs for the paths that run featurize_pairs (trained
    # scorers and exact_scores=True): banded lev_ratio (exact within the
    # band, deterministic upper bound beyond — see featurize_pairs) and
    # once-per-signature hashed tokenization. SEMANTIC knobs (feature
    # values feed the model), so both sit in the scored stage fingerprint
    # — unlike the physical broadcast/sort toggles
    feat_lev_band: float | None = None
    feat_hashed_tokens: bool = False
    # bumped whenever ANY persisted stage output changes meaning for the
    # same config fields ("2": round-4 minhash family change — old
    # candidate snapshots are key-space-incompatible and must not resume)
    version: str = "2"

    def fingerprint(self, stage: str, upstream: str) -> str:
        d = asdict(self)
        fields = STAGE_FIELDS.get(stage)
        sel = sorted(d.items()) if fields is None else [
            (k, d[k]) for k in sorted(fields)
        ]
        # the minhash family tag is folded into EVERY stage fingerprint
        # (not just 'candidates'): a family change invalidates candidates
        # and everything downstream of them, and version bumps alone are
        # easy to forget when the family moves again
        return fingerprint(stage, upstream, sel, self.version, HASH_FAMILY)


@dataclass
class PipelineReport:
    run_id: str
    stages: dict = field(default_factory=dict)
    # stage-name -> output DataFrame (in-process handles for grid/eval)
    outputs: dict = field(default_factory=dict)


def _labels_digest(labeled_pairs: DataFrame) -> str:
    """Order-independent content digest of the label table (bit_xor of
    row hashes + count). One aggregate job over the o(corpus) label set —
    cheap insurance that a trained scorer never resumes a snapshot built
    from different labels."""
    row = labeled_pairs.agg(
        F.bit_xor(F.xxhash64("conv_id_a", "conv_id_b", "y")).alias("h"),
        F.count("*").alias("n"),
    ).collect()[0]
    return f"+labels:{row['n']}:{row['h']}"


def _lineage_rows(spark, run_id: str, stage: str, df: DataFrame,
                  snapshot_id: str, wall_ms: int, resumed: bool) -> DataFrame:
    """Per-partition lineage: one row per output partition + a stage total
    (north rule 'per-partition lineage + metrics')."""
    per_part = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows_out"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "rows_out",
            F.lit(wall_ms).cast("long").alias("wall_ms"),
            F.lit(snapshot_id).alias("snapshot_id"),
            F.lit(resumed).alias("resumed"),
            F.lit(None).cast("string").alias("event"),
            F.lit(None).cast("long").alias("event_value"),
        )
    )
    return per_part


_LINEAGE_EVENT_SCHEMA = (
    "run_id string, stage string, partition_id int, rows_out long, "
    "wall_ms long, snapshot_id string, resumed boolean, event string, "
    "event_value long"
)


def _event_rows(spark, run_id: str, stage: str, snapshot_id: str,
                stats) -> DataFrame:
    """Cap/fallback events as queryable ``run_metrics`` rows (north rule:
    caps must be 'semantically visible', not just in-memory stats): one
    row per event with a numeric value; the packed strategy's
    prune-before-collect fallback trigger is folded into the event name
    (``fallback:<trigger>``, value 1). Same schema as the per-partition
    lineage rows with partition_id/rows_out/wall_ms null."""
    events: list[tuple[str, int]] = []
    for name in ("total_blocks", "oversized_blocks", "dropped_memberships",
                 "capped_at"):
        v = getattr(stats, name, None)
        if v is not None:
            events.append((name, int(v)))
    hot = stats.extra.get("hot_tokens_dropped")
    if hot is not None:
        events.append(("hot_tokens_dropped", int(hot)))
    fb = stats.extra.get("fallback")
    if fb:
        events.append((f"fallback:{fb}", 1))
    rows = [(run_id, stage, None, None, None, snapshot_id, False, k, v)
            for k, v in events]
    return spark.createDataFrame(rows, _LINEAGE_EVENT_SCHEMA)


def read_run_metrics(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """THE way to read the lineage table. ``run_metrics`` is append-only
    and gained the (event, event_value) columns in a later release, so a
    long-lived checkpoint_dir mixes 7- and 9-column files; a bare
    ``read.parquet`` infers the schema from one arbitrary footer and can
    either drop the new columns or fail on ``col('event')``. mergeSchema
    unions the footers (pre-event rows read as NULL events)."""
    return (spark.read.option("mergeSchema", "true")
            .parquet(f"{checkpoint_dir}/run_metrics"))


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    checkpoint_dir: str,
    config: PipelineConfig | None = None,
    input_fingerprint: str = "",
    run_id: str = "run",
    labeled_pairs: DataFrame | None = None,
) -> tuple[DataFrame, PipelineReport]:
    """Run (or resume) the full chain; returns (clusters, report).

    ``input_fingerprint`` should identify the input snapshot (e.g. the
    Iceberg snapshot id of the transcripts table); stages re-run only when
    it or the config changes. ``labeled_pairs`` (conv_id_a, conv_id_b, y)
    is required when ``config.scorer`` is a trained matcher — its identity
    should be part of ``input_fingerprint`` (see PipelineConfig note).
    """
    cfg = config or PipelineConfig()
    ckpt = CheckpointManager(spark, checkpoint_dir)
    report = PipelineReport(run_id=run_id)
    metrics: list[DataFrame] = []

    def stage(name: str, upstream_fp: str, compute, repartition_by=None):
        fp = cfg.fingerprint(name, upstream_fp + input_fingerprint)
        res = ckpt.run_or_resume(name, fp, compute, repartition_by=repartition_by)
        report.stages[name] = {
            "rows": res.rows, "wall_ms": res.wall_ms, "resumed": res.resumed,
            "snapshot_id": res.snapshot_id,
        }
        metrics.append(
            _lineage_rows(spark, run_id, name, res.df, res.snapshot_id,
                          res.wall_ms, res.resumed)
        )
        report.outputs[name] = res.df
        return res

    sig_res = stage(
        "signatures", "input", lambda: build_signatures(transcripts),
        repartition_by=["conv_id"],
    )

    pair_handle: list[DataFrame] = []
    bstats_holder: list = []  # BlockingStats when candidates ran this run

    def compute_candidates():
        if cfg.blocker == "sequential":
            # reference sequential mode: cheap token-overlap candidates,
            # edit-distance predicate on the survivors only
            # (model_magellan_ml.py:189-191)
            from neural_entity_matching_spark.operators.blocking import (
                edit_distance_filter,
                token_overlap_block,
            )

            cand, stats = token_overlap_block(
                sig_res.df, min_shared_tokens=cfg.seq_min_tokens,
                max_token_df=cfg.seq_max_token_df,
            )
            pairs = edit_distance_filter(
                cand, sig_res.df, cutoff_ratio=cfg.seq_cutoff)
            report.stages["_blocking_stats"] = {
                "strategy": "sequential",
                "hot_tokens_dropped": stats.extra.get("hot_tokens_dropped"),
                "capped_at": stats.capped_at,
            }
            bstats_holder.append(stats)
            return pairs
        pairs, stats = lsh_block(
            sig_res.df,
            num_hashes=cfg.num_hashes, bands=cfg.bands,
            char_ngram=cfg.char_ngram, seed=cfg.seed, block_cap=cfg.block_cap,
        )
        pair_handle.append(pairs)  # released after the snapshot write
        report.stages["_blocking_stats"] = {
            "total_blocks": stats.total_blocks,
            "oversized_blocks": stats.oversized_blocks,
            "dropped_memberships": stats.dropped_memberships,
            "capped_at": stats.capped_at,
        }
        bstats_holder.append(stats)
        return pairs

    cand_res = stage("candidates", sig_res.snapshot_id, compute_candidates,
                     repartition_by=["conv_id_a"])
    for h in pair_handle:
        h.unpersist()
    if bstats_holder:
        # cap/fallback events land in run_metrics next to the stage's
        # per-partition rows; a RESUMED candidates stage emits none (the
        # events describe the run that actually blocked)
        metrics.append(_event_rows(spark, run_id, "candidates",
                                   cand_res.snapshot_id, bstats_holder[0]))

    feat_handle: list[DataFrame] = []

    def compute_scored():
        cand = cand_res.df
        if cfg.cluster_pairs_by_a:
            # run-length locality: consecutive pairs share conv_id_a, so
            # the payload probe's entry stays cache-hot. Opt-in: it pays
            # on bandwidth-starved 1-core executors (measured in
            # bench/scaling_worker.py) but A/B measured a net LOSS on
            # local[32] at 261k AND 5.0M pairs (the in-partition sort's
            # fixed cost exceeds the probe-locality win when many cores
            # share one cache hierarchy).
            cand = cand.sortWithinPartitions("conv_id_a")
        if cfg.scorer in ("logistic", "gbt", "random_forest"):
            # trained matcher (reference M1): featurize once, train on the
            # label-attached candidates (negatives implied by absence),
            # score every candidate with the broadcast model — with the
            # reference's degenerate single-class bypass
            from neural_entity_matching_spark.operators.ml_scorer import (
                score_with_model,
                train_scorer,
            )
            from neural_entity_matching_spark.operators.scoring import (
                attach_labels,
                degenerate_scorer,
                is_single_class,
            )

            if labeled_pairs is None:
                raise ValueError(
                    f"scorer={cfg.scorer!r} needs labeled_pairs")
            feats = featurize_pairs(
                cand, sig_res.df,
                broadcast_signatures=cfg.broadcast_signatures,
                lev_band=cfg.feat_lev_band,
                hashed_tokens=cfg.feat_hashed_tokens,
            ).persist()
            feat_handle.append(feats)  # fit + transform share one pass
            labeled = attach_labels(feats, labeled_pairs)
            if is_single_class(labeled):
                return degenerate_scorer(feats)
            model = train_scorer(labeled, model=cfg.scorer, seed=cfg.ml_seed)
            return score_with_model(model, feats, threshold=cfg.threshold)
        if cfg.exact_scores:
            return threshold_scorer(
                featurize_pairs(cand, sig_res.df,
                                broadcast_signatures=cfg.broadcast_signatures,
                                lev_band=cfg.feat_lev_band,
                                hashed_tokens=cfg.feat_hashed_tokens),
                threshold=cfg.threshold, w_lev=cfg.w_lev, w_jacc=cfg.w_jacc,
            )
        return fast_threshold_score(
            cand, sig_res.df, threshold=cfg.threshold,
            w_lev=cfg.w_lev, w_jacc=cfg.w_jacc,
            broadcast_signatures=cfg.broadcast_signatures,
            split_broadcast=cfg.split_broadcast,
            # the split path's internal jaccard-stage persist is released
            # with the featurize handle after the scored snapshot lands
            persist_handles=feat_handle,
        )

    # fold the label-set identity into the scored fingerprint for trained
    # scorers: same config + same candidates + DIFFERENT labels must
    # retrain, never resume the stale snapshot
    labels_fp = ""
    if cfg.scorer in ("logistic", "gbt", "random_forest"):
        if labeled_pairs is None:
            raise ValueError(f"scorer={cfg.scorer!r} needs labeled_pairs")
        labels_fp = _labels_digest(labeled_pairs)

    scored_res = stage(
        "scored", cand_res.snapshot_id + labels_fp, compute_scored,
        repartition_by=["conv_id_a"],
    )
    for h in feat_handle:
        h.unpersist()

    cluster_res = stage(
        "clusters",
        scored_res.snapshot_id,
        lambda: connected_components(
            scored_res.df.filter(F.col("is_match") == 1)
            .select("conv_id_a", "conv_id_b"),
            vertices=sig_res.df,
        ),
        repartition_by=["cluster_id"],
    )

    # append lineage (run_metrics table)
    all_metrics = metrics[0]
    for m in metrics[1:]:
        all_metrics = all_metrics.unionByName(m)
    all_metrics.write.mode("append").parquet(f"{checkpoint_dir}/run_metrics")

    return cluster_res.df, report


def run_grid(
    spark: SparkSession,
    transcripts: DataFrame,
    labeled_pairs: DataFrame,
    checkpoint_dir: str,
    configs: list[PipelineConfig],
    input_fingerprint: str = "",
    run_id: str = "grid",
) -> tuple[DataFrame, list[PipelineReport]]:
    """Hyperparameter-grid runner (reference M5): sweep the configs, land
    ONE metrics row per config in ``<checkpoint_dir>/grid_metrics``
    (the Spark shape of the reference's expand_grid loop writing one
    result object per {sampler x blocker x params} combination,
    model_magellan_ml.py:383-430).

    Stage resume makes shared prefixes free: stage fingerprints hash only
    the fields that stage depends on (STAGE_FIELDS), and the snapshot
    store is fingerprint-keyed, so e.g. two configs that differ only in
    ``threshold`` share signatures AND candidates (resumed, not
    recomputed) and only re-score.

    Metrics per config: blocking recall / pruning (at that config's
    blocking keys), pairwise F1 vs the labeled pairs restricted to the
    candidate universe — the reference's eval protocol
    (evaluation_functions.py:100-125).
    """
    from neural_entity_matching_spark.operators.evaluation import (
        blocking_recall,
        pairwise_f1,
        pruning_rate,
    )

    reports: list[PipelineReport] = []
    rows = []
    for idx, cfg in enumerate(configs):
        rid = f"{run_id}-{idx:03d}"
        _, report = run_pipeline(
            spark, transcripts, checkpoint_dir, cfg,
            input_fingerprint=input_fingerprint, run_id=rid,
            labeled_pairs=labeled_pairs,
        )
        reports.append(report)
        cand = report.outputs["candidates"]
        scored = report.outputs["scored"]
        n_entities = report.stages["signatures"]["rows"]
        n_cand = report.stages["candidates"]["rows"]
        rec = blocking_recall(cand, labeled_pairs)
        f1 = pairwise_f1(scored, labeled_pairs, universe=cand)
        rows.append({
            "run_id": rid,
            "config": json.dumps(asdict(cfg), sort_keys=True),
            "n_candidates": int(n_cand),
            "blocking_recall": float(rec),
            "pruning_rate": float(pruning_rate(n_cand, n_entities)),
            "precision": float(f1.precision),
            "recall": float(f1.recall),
            "f1": float(f1.f1),
            "resumed_stages": sum(
                1 for s in ("signatures", "candidates", "scored", "clusters")
                if report.stages[s]["resumed"]
            ),
        })
    out = spark.createDataFrame(rows)
    out.write.mode("append").parquet(f"{checkpoint_dir}/grid_metrics")
    return out, reports
