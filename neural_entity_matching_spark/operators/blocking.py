"""Blocking: prune the O(n^2) pair space to candidate pairs.

Three blockers, mirroring the reference grid
(reference script/model_magellan_ml.py:383-396):

* MinHash-LSH (reference script/blocking_algorithms.py:83-176)
* word-token overlap (Magellan OverlapBlocker, blocking_algorithms.py:20-55)
* edit-distance cascade on survivors (blocking_algorithms.py:58-80 +
  script/utilities.py:492-502)

The reference walks Python dict buckets and emits ``itertools.combinations``
per bucket — a mega-bucket is quadratic with no guard
(blocking_algorithms.py:135-140). Here pair generation is distributed, and
hot blocks are handled EXPLICITLY (north rule): a bounded block-size cap
drops oversized buckets *visibly* (counted + returned in stats, never
silent), and joins run under AQE skew handling.

Shuffle discipline (this is the stage that binds at cluster scale):

* ids are dictionary-encoded to int64 (``xxhash64``, collision-checked)
  before any exchange — pair rows shuffle as 16 bytes instead of two
  strings, and the final decode back to real ids is a broadcast map join;
* block keys are int64 where the producer allows (LSH band keys);
* oversized blocks are truncated to cap+1 members inside the first
  exchange (row_number), so a mega block never materializes a list nor
  fans out pairs that a later filter would drop;
* intermediates are persisted only while pair generation runs and are
  unpersisted once the pair set is materialized (``materialize=True``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neural_entity_matching_spark.functions.minhash import band_keys_udf
from neural_entity_matching_spark.functions.similarity import lev_ratio, tokens


@dataclass
class BlockingStats:
    """Semantically-visible skew accounting (SURVEY.md §7 risk 3)."""

    total_blocks: int = 0
    oversized_blocks: int = 0
    dropped_memberships: int = 0
    capped_at: int | None = None
    extra: dict = field(default_factory=dict)


def lsh_band_keys(
    signatures: DataFrame,
    num_hashes: int = 128,
    bands: int = 32,
    char_ngram: int = 8,
    seed: int = 42,
    text_col: str = "sig_text",
    id_col: str = "conv_id",
) -> DataFrame:
    """(id, block_key) rows — one per (doc, band), block_key an int64.

    block_key is deterministic and partition-invariant (seeded hashing only;
    SURVEY.md §7 risk 2). The band hash is already salted by band index
    inside the UDF, so the raw int64 IS the cross-band-unique key — keeping
    it numeric (instead of a "band:hash" string) cuts the band-key exchange
    bytes ~3x. These ARE the "fixed blocking keys" the F1 gate is evaluated
    at (frozen params per FIXTURES.md §4).
    """
    udf = band_keys_udf(num_hashes=num_hashes, bands=bands,
                        char_ngram=char_ngram, seed=seed)
    return (
        signatures
        .select(F.col(id_col).alias("conv_id"), udf(F.col(text_col)).alias("bands"))
        .select("conv_id", F.explode("bands").alias("block_key"))
    )


def _prepare_keys(
    keys: DataFrame, id_col: str, encode_ids: bool
) -> tuple[DataFrame, DataFrame | None, list[DataFrame]]:
    """Dictionary-encode the id column to int64 (``encode_ids=True``).

    Returns (narrow keys (iid, block_key), mapping (iid, _id) or None,
    persisted intermediates to release). The raw key table is persisted
    FIRST so the (typically expensive) upstream key producer — e.g. the
    minhash band UDF — runs exactly once across the mapping build, the
    stats pass and pair generation. The mapping dedup is partial-aggregated
    (ids repeat once per band within a partition, so the exchange carries
    ~n_docs rows, not n_docs * bands) and collision-checked: a 64-bit
    collision would merge two entities, so it fails loudly (callers can
    pre-assign dense int ids and pass ``encode_ids=False`` if their id
    space ever trips this)."""
    if not encode_ids:
        narrow = keys.select(F.col(id_col).alias("iid"), "block_key").persist()
        return narrow, None, [narrow]
    raw = keys.persist()
    mapping = (
        raw.select(F.col(id_col).alias("_id")).dropDuplicates()
        .withColumn("iid", F.xxhash64(F.col("_id")))
        .persist()
    )
    chk = mapping.agg(
        F.count("*").alias("n"), F.countDistinct("iid").alias("d")
    ).collect()[0]
    n_ids, n_iids = chk["n"], chk["d"]
    if n_ids != n_iids:
        mapping.unpersist()
        raw.unpersist()
        raise ValueError(
            f"xxhash64 id collision ({n_ids} ids -> {n_iids} hashes); "
            "pre-assign dense int ids and call with encode_ids=False"
        )
    narrow = raw.select(F.xxhash64(F.col(id_col)).alias("iid"), "block_key")
    return narrow, mapping, [raw, mapping]


def _decode_pairs(iid_pairs: DataFrame, mapping: DataFrame) -> DataFrame:
    """Map (iid_a, iid_b) back to real ids via two broadcast map joins and
    re-canonicalize to conv_id_a < conv_id_b in id space."""
    m = F.broadcast(mapping)
    return (
        iid_pairs
        .join(m.select(F.col("iid").alias("iid_a"), F.col("_id").alias("_ida")), "iid_a")
        .join(m.select(F.col("iid").alias("iid_b"), F.col("_id").alias("_idb")), "iid_b")
        .select(
            F.least("_ida", "_idb").alias("conv_id_a"),
            F.greatest("_ida", "_idb").alias("conv_id_b"),
        )
    )


def _finalize(
    pairs: DataFrame,
    stats: BlockingStats,
    materialize: bool,
    release: list[DataFrame],
) -> tuple[DataFrame, BlockingStats]:
    """Materialize the pair set (persist + count -> stats.extra['n_pairs'])
    and release every intermediate persist. With ``materialize=False`` the
    caller owns materialization and the intermediates stay cached (callers
    must unpersist via the returned stats.extra['_persisted'])."""
    if materialize:
        pairs = pairs.persist()
        stats.extra["n_pairs"] = pairs.count()
        for df in release:
            df.unpersist()
    else:
        stats.extra["_persisted"] = release
    return pairs, stats


def dense_id_mapping(
    ids: DataFrame,
    id_col: str = "_id",
    partitions: int | None = None,
) -> DataFrame:
    """(\\_id, iid) with iid a dense 0-based BIJECTION over the distinct
    id set — deterministic, distributed, recompute-safe.

    Bucket assignment is ``pmod(xxhash64(_id), p)`` — a pure function of
    the id, so any recomputation (cache eviction, executor loss, retried
    stage) reproduces the exact same bucket membership; within a bucket
    the rank is a sort by id. This replaces the earlier sampled
    ``repartitionByRange`` scheme, whose bounds were re-sampled per
    evaluation: if the persisted partitioning was lost between the
    offsets pass and the rank pass, ids moved buckets and duplicate iids
    were silently assigned (observed at 176k ids: two docs sharing an
    iid merged their pair sets). Determinism now comes from the hash,
    not from pinning one evaluation. iid order is (bucket, id) order —
    a bijection but NOT the global id sort order, which packing never
    needed; consumers must canonicalize decoded pair orientation with
    least/greatest on the real ids.

    A post-build invariant check asserts the bijection onto [0, n) AND
    that the input ids were distinct (one aggregate over the o(corpus)
    dictionary — cheap insurance against a nondeterminism regression on
    one side and a caller passing a non-deduplicated id column on the
    other; callers relying on "signatures are one row per entity" get
    that assumption enforced here rather than as silent join fan-out).

    Returns a PERSISTED, materialized DataFrame; the caller owns the
    unpersist.
    """
    p = int(
        partitions
        or ids.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    base = (
        ids.select(F.col(id_col).alias("_id"))
        .withColumn(
            "_pid", F.pmod(F.xxhash64("_id"), F.lit(p)).cast("int")
        )
        .persist()
    )
    counts = (
        base.groupBy("_pid").agg(F.count("*").alias("_c"))
        .orderBy("_pid")
        .collect()
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_pid"], acc))
        acc += r["_c"]
    off_df = base.sparkSession.createDataFrame(offsets, ["_pid", "_off"])
    w = Window.partitionBy("_pid").orderBy("_id")
    mapping = (
        base.join(F.broadcast(off_df), "_pid")
        .withColumn("iid", F.row_number().over(w) - 1 + F.col("_off"))
        .select("_id", "iid")
        .persist()
    )
    chk = mapping.agg(
        F.count("*").alias("n"),
        F.countDistinct("iid").alias("d"),
        F.countDistinct("_id").alias("du"),
        F.max("iid").alias("hi"),
    ).collect()[0]
    if not (chk["n"] == chk["d"] == chk["du"]
            == (chk["hi"] + 1 if chk["n"] else 0)):
        mapping.unpersist()
        base.unpersist()
        # du < n means the CALLER passed duplicate ids (each would get
        # several iids and every downstream pair join would fan out);
        # d < n would be a determinism regression in the rank pass
        raise AssertionError(
            f"dense_id_mapping lost bijectivity: n={chk['n']} "
            f"distinct_iid={chk['d']} distinct_id={chk['du']} "
            f"max={chk['hi']}"
            + (" — input ids contain duplicates"
               if chk["du"] < chk["n"] else "")
        )
    base.unpersist()
    # stash the (already-computed) cardinality so callers skip a count job
    mapping.nem_n = chk["n"]
    return mapping


_PACK = 1 << 32


def packed_pairs_from_block_keys(
    keys: DataFrame,
    block_cap: int = 200,
    id_col: str = "conv_id",
    materialize: bool = True,
    ids: DataFrame | None = None,
    physical_block_cap: int = 1 << 20,
) -> tuple[DataFrame, BlockingStats]:
    """Grouped pair generation over DENSE ids with pairs packed into ONE
    int64 (``iid_a * 2^32 + iid_b``) until after dedup.

    Same semantics as ``grouped_pairs_from_block_keys(decode_ids=False)``
    except the candidate ids are dense ranks (``dense_id_mapping``), not
    xxhash64 codes. Why: the pair-dedup exchange is the largest exchange
    of the blocking stage (measured 21.9s of a 71s blocking stage at 4x1
    executors, n=176k sigs / 30.0M pre-dedup pair rows), and packing
    halves its row payload and reduces the hash-aggregate to a
    single-long key (measured 21.9s -> 15.1s). The persisted candidate
    cache stays PACKED (half the bytes); the returned DataFrame projects
    ``conv_id_a`` / ``conv_id_b`` from it lazily, so the unpack fuses
    into whatever stage consumes the pairs (no extra materialization).

    Requires < 2^31 distinct ids (packing headroom); raises otherwise —
    callers beyond that operate on the xxhash64 path. Downstream payload
    joins must map real ids through ``stats.extra['id_mapping']`` (dense
    codes are not a hash of the id), and decoded pair orientation must be
    canonicalized with least/greatest on the REAL ids (iid order is a
    bijection, not the id sort order).

    ``stats.extra['packed_pairs']`` holds the persisted packed handle in
    both materialize branches; ``n_pairs`` exists only when
    ``materialize=True`` (counting is materialization).

    ``ids``: optional pre-distinct entity-id set (one row per entity,
    e.g. the signature table's id column). Supplying it removes a
    dropDuplicates exchange over the ~bands-per-doc membership set AND
    lets ``keys`` stream straight into the grouping (no persist — it is
    consumed exactly once), cutting the blocking stage's fixed job count
    — the costs that do NOT shrink with executors and therefore tax the
    N->4N scaling ratio hardest.

    ``physical_block_cap``: automatic degenerate-distribution fallback.
    The single-pass group buffers each block's member array BEFORE the
    ``block_cap`` filter (8 bytes/member in one task); if the size stats
    show any physical block above this threshold (default 2^20 members =
    8 MB buffered), pair generation REBUILDS through the
    prune-before-collect shape (sizes partial-agg -> eligibility join ->
    collect over surviving memberships only) instead of relying on the
    caller to know to switch to strategy='grouped'. The oversized arrays
    are buffered once — in the stats job that detects them — and never
    again; ``stats.extra['fallback']`` records the trigger.
    """
    if ids is not None:
        raw = keys
        id_src = ids.select(F.col(id_col).alias("_id"))
        release_raw: list[DataFrame] = []
    else:
        raw = keys.persist()
        id_src = raw.select(F.col(id_col).alias("_id")).dropDuplicates()
        release_raw = [raw]
    # dense_id_mapping returns the mapping already persisted + materialized
    mapping = dense_id_mapping(id_src)
    n_ids = getattr(mapping, "nem_n", None) or mapping.count()
    if n_ids >= (1 << 31):
        mapping.unpersist()
        for df in release_raw:
            df.unpersist()
        raise ValueError(
            f"{n_ids} distinct ids exceed the int32 packing range; "
            "use grouped_pairs_from_block_keys instead"
        )
    narrow = (
        raw.join(F.broadcast(mapping), raw[id_col] == mapping["_id"])
        .select("iid", "block_key")
    )
    # SINGLE-PASS group: one exchange of the (iid, block_key) membership
    # set builds both the member arrays and the size stats. The earlier
    # two-pass shape (sizes agg -> eligibility join -> collect_list)
    # exchanged the same ~64-bands-per-doc membership set TWICE (partial
    # count-agg barely reduces it at ~1.3 members/block) plus a join —
    # the blocking stage's dedup/expand exchanges are its scaling
    # residual, so one full exchange is removed here. Trade-off: member
    # lists buffer BEFORE the cap filter, bounded by the largest
    # physical block at 8 bytes/member (a degenerate 10M-member block
    # buffers 80 MB in one task); for adversarial distributions use
    # strategy='grouped', whose eligibility join prunes before any list
    # materializes.
    grouped = (
        narrow.groupBy("block_key")
        .agg(F.sort_array(F.collect_list("iid")).alias("ids"))
        .select("ids", F.size("ids").alias("bs"))
        .persist()
    )
    release = release_raw + [grouped]
    stats_row = grouped.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("bs") > block_cap, 1).otherwise(0)).alias("over"),
        F.sum(
            F.when(F.col("bs") > block_cap, F.col("bs")).otherwise(0)
        ).alias("dropped"),
        F.max("bs").alias("max_bs"),
    ).collect()[0]
    stats = BlockingStats(
        total_blocks=stats_row["total"] or 0,
        oversized_blocks=stats_row["over"] or 0,
        dropped_memberships=stats_row["dropped"] or 0,
        capped_at=block_cap,
        extra={"strategy": "packed", "id_mapping": mapping},
    )
    if (stats_row["max_bs"] or 0) > physical_block_cap:
        # degenerate distribution: some physical block's member array is
        # past the single-task buffering budget. It was buffered ONCE (in
        # the stats job above); rebuild pair-gen through the
        # prune-before-collect shape so it never materializes again.
        grouped.unpersist()
        narrow_p = narrow.persist()
        sizes = narrow_p.groupBy("block_key").agg(F.count("*").alias("bs"))
        eligible = sizes.filter(
            (F.col("bs") >= 2) & (F.col("bs") <= block_cap)
        ).select("block_key")
        grouped = (
            narrow_p.join(eligible, "block_key")
            .groupBy("block_key")
            .agg(F.sort_array(F.collect_list("iid")).alias("ids"))
            .select("ids", F.size("ids").alias("bs"))
            .persist()
        )
        release = release_raw + [narrow_p, grouped]
        stats.extra["fallback"] = (
            f"prune-before-collect (max physical block "
            f"{stats_row['max_bs']} > {physical_block_cap})"
        )
    blocks = grouped.filter((F.col("bs") >= 2) & (F.col("bs") <= block_cap))
    # ids sorted ascending -> iid_a < iid_b holds inside the packed long
    pair_expr = (
        "flatten(transform(sequence(1, size(ids) - 1), i -> "
        "transform(slice(ids, i + 1, size(ids) - i), "
        "y -> element_at(ids, i) * 4294967296L + y)))"
    )
    packed = (
        blocks.select(F.explode(F.expr(pair_expr)).alias("pk"))
        .dropDuplicates(["pk"])
    )
    packed = packed.persist()
    stats.extra["packed_pairs"] = packed
    if materialize:
        stats.extra["n_pairs"] = packed.count()
        for df in release:
            df.unpersist()
    else:
        # n_pairs intentionally absent: counting IS materialization.
        # packed is persisted (lazily) in both branches so the handle in
        # extra['packed_pairs'] is always safe to reuse / unpersist.
        stats.extra["_persisted"] = release + [packed]
    pairs = packed.select(
        F.floor(F.col("pk") / F.lit(_PACK)).cast("long").alias("conv_id_a"),
        F.pmod("pk", F.lit(_PACK)).alias("conv_id_b"),
    )
    return pairs, stats


def pairs_from_block_keys(
    keys: DataFrame,
    block_cap: int = 200,
    id_col: str = "conv_id",
    encode_ids: bool = True,
    materialize: bool = True,
) -> tuple[DataFrame, BlockingStats]:
    """Self-join (block_key, id) on block_key with ``id_a < id_b``.

    Replaces the reference's per-bucket ``itertools.combinations``
    (blocking_algorithms.py:135-140) with the distributed equivalent:
    equi-join on block key + range predicate, deduped across bands.

    ``block_cap`` bounds per-block membership: blocks larger than the cap
    are dropped entirely and counted in stats (the reference has no guard;
    the north rule requires bounded caps). Pair volume per surviving block
    is <= cap*(cap-1)/2.
    """
    keyed, mapping, release = _prepare_keys(keys, id_col, encode_ids)
    sizes = keyed.groupBy("block_key").agg(F.count("*").alias("block_size")).persist()
    release.append(sizes)
    stats_row = sizes.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("block_size") > block_cap, 1).otherwise(0)).alias("over"),
        F.sum(
            F.when(F.col("block_size") > block_cap, F.col("block_size")).otherwise(0)
        ).alias("dropped"),
    ).collect()[0]
    stats = BlockingStats(
        total_blocks=stats_row["total"] or 0,
        oversized_blocks=stats_row["over"] or 0,
        dropped_memberships=stats_row["dropped"] or 0,
        capped_at=block_cap,
        extra={"strategy": "join"},
    )

    eligible = sizes.filter(
        (F.col("block_size") >= 2) & (F.col("block_size") <= block_cap)
    ).select("block_key")
    # AQE coalesces / splits this join at runtime; eligible is usually the
    # small side but can be large — leave the strategy to the optimizer.
    pruned = keyed.join(eligible, "block_key")

    a = pruned.select(F.col("block_key"), F.col("iid").alias("iid_a"))
    b = pruned.select(F.col("block_key"), F.col("iid").alias("iid_b"))
    pairs = (
        a.join(b, "block_key")
        .filter(F.col("iid_a") < F.col("iid_b"))
        .select("iid_a", "iid_b")
        .dropDuplicates(["iid_a", "iid_b"])
    )
    if mapping is not None:
        pairs = _decode_pairs(pairs, mapping)
    else:
        pairs = pairs.select(F.col("iid_a").alias("conv_id_a"),
                             F.col("iid_b").alias("conv_id_b"))
    return _finalize(pairs, stats, materialize, release)


def grouped_pairs_from_block_keys(
    keys: DataFrame,
    block_cap: int = 200,
    id_col: str = "conv_id",
    encode_ids: bool = True,
    materialize: bool = True,
    decode_ids: bool = True,
    ids: DataFrame | None = None,
    physical_block_cap: int = 1 << 20,
) -> tuple[DataFrame, BlockingStats]:
    """Grouped pair generation, SINGLE-PASS (r7, guide §2.4): one exchange
    of the (iid, block_key) membership set builds the member arrays AND
    the size stats — the same shape ``packed_pairs_from_block_keys`` uses.
    The earlier two-pass form (sizes agg -> eligibility join ->
    collect_list) exchanged the ~bands-per-doc membership set TWICE plus
    a join; at 66k sigs / 4.2M membership rows the removed exchange+join
    measured ~2s of a 15.5s blocking stage on local[32].

    Memory trade (same as packed): member arrays buffer BEFORE the cap
    filter, bounded by the largest physical block at 8 bytes/member. If
    the size stats show any block above ``physical_block_cap`` the pair
    generation REBUILDS through the prune-before-collect shape (sizes ->
    eligibility join -> collect over survivors only), so a degenerate
    distribution buffers the oversized arrays exactly once, in the stats
    job that detects them. ``stats.extra['fallback']`` records the
    trigger.

    ``ids``: optional pre-distinct entity-id set (one row per entity,
    e.g. the signature table's id column). Supplying it replaces the
    dropDuplicates exchange over the membership rows with a projection
    of the entity table AND lets ``keys`` stream straight into the group
    exchange with no persist (the expensive key producer — the minhash
    band UDF — runs exactly once either way, but the cache write/read
    and its materialization job disappear).
    """
    release: list[DataFrame] = []
    if not encode_ids:
        narrow = keys.select(F.col(id_col).alias("iid"), "block_key")
        mapping = None
    elif ids is not None:
        mapping = (
            ids.select(F.col(id_col).alias("_id"))
            .withColumn("iid", F.xxhash64(F.col("_id")))
            .persist()
        )
        release.append(mapping)
        chk = mapping.agg(
            F.count("*").alias("n"), F.countDistinct("iid").alias("d")
        ).collect()[0]
        if chk["n"] != chk["d"]:
            for df in release:
                df.unpersist()
            raise ValueError(
                f"xxhash64 id collision or duplicate input ids "
                f"({chk['n']} ids -> {chk['d']} hashes); pre-assign dense "
                "int ids and call with encode_ids=False"
            )
        narrow = keys.select(F.xxhash64(F.col(id_col)).alias("iid"),
                             "block_key")
    else:
        narrow, mapping, release = _prepare_keys(keys, id_col, True)
    grouped = (
        narrow.groupBy("block_key")
        .agg(F.sort_array(F.collect_list("iid")).alias("ids"))
        .select("ids", F.size("ids").alias("bs"))
        .persist()
    )
    release.append(grouped)
    stats_row = grouped.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("bs") > block_cap, 1).otherwise(0)).alias("over"),
        F.sum(
            F.when(F.col("bs") > block_cap, F.col("bs")).otherwise(0)
        ).alias("dropped"),
        F.max("bs").alias("max_bs"),
    ).collect()[0]
    stats = BlockingStats(
        total_blocks=stats_row["total"] or 0,
        oversized_blocks=stats_row["over"] or 0,
        dropped_memberships=stats_row["dropped"] or 0,
        capped_at=block_cap,
        extra={"strategy": "grouped"},
    )
    if (stats_row["max_bs"] or 0) > physical_block_cap:
        # degenerate distribution: rebuild through prune-before-collect so
        # the mega block's member array never materializes again (it was
        # buffered exactly once, in the stats job above)
        grouped.unpersist()
        release.remove(grouped)
        if ids is not None or not encode_ids:
            narrow = narrow.persist()  # keys stream twice below
            release.append(narrow)
        sizes = narrow.groupBy("block_key").agg(F.count("*").alias("bs"))
        eligible = sizes.filter(
            (F.col("bs") >= 2) & (F.col("bs") <= block_cap)
        ).select("block_key")
        grouped = (
            narrow.join(eligible, "block_key")
            .groupBy("block_key")
            .agg(F.sort_array(F.collect_list("iid")).alias("ids"))
            .select("ids", F.size("ids").alias("bs"))
            .persist()
        )
        release.append(grouped)
        stats.extra["fallback"] = (
            f"prune-before-collect (max physical block "
            f"{stats_row['max_bs']} > {physical_block_cap})"
        )
    blocks = grouped.filter((F.col("bs") >= 2) & (F.col("bs") <= block_cap))
    pair_expr = (
        "flatten(transform(sequence(1, size(ids) - 1), i -> "
        "transform(slice(ids, i + 1, size(ids) - i), "
        "y -> struct(element_at(ids, i) AS iid_a, y AS iid_b))))"
    )
    pairs = (
        blocks.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(F.col("p.iid_a"), F.col("p.iid_b"))
        .dropDuplicates(["iid_a", "iid_b"])
    )
    if mapping is not None and not decode_ids:
        # scale path: keep the int64 ids flowing — downstream joins run on
        # longs and the (tiny) match set is decoded at the boundary via
        # stats.extra['id_mapping'] instead of all candidate pairs here.
        # The mapping stays persisted; the caller releases it.
        release.remove(mapping)
        stats.extra["id_mapping"] = mapping
        pairs = pairs.select(F.col("iid_a").alias("conv_id_a"),
                             F.col("iid_b").alias("conv_id_b"))
    elif mapping is not None:
        pairs = _decode_pairs(pairs, mapping)
    else:
        pairs = pairs.select(F.col("iid_a").alias("conv_id_a"),
                             F.col("iid_b").alias("conv_id_b"))
    return _finalize(pairs, stats, materialize, release)


def salted_pairs_from_block_keys(
    keys: DataFrame,
    block_cap: int = 200,
    salt: int = 8,
    id_col: str = "conv_id",
    encode_ids: bool = True,
    materialize: bool = True,
) -> tuple[DataFrame, BlockingStats]:
    """Skew-spread variant of ``pairs_from_block_keys`` (north rule:
    explicit salting). The left side of the self-join gets a deterministic
    salt ``hash(id) % salt`` appended to the join key; the right side is
    replicated ``salt`` times, once per salt value. Every pair still meets
    exactly once, but a hot block's work fans out over ``salt`` reducers
    instead of one straggler task.

    Caps still apply above the salted path: salting bounds per-task skew,
    the cap bounds total quadratic work per block. Use this when block_cap
    must be large (e.g. dedup with legitimate big near-dup families)."""
    keyed, mapping, release = _prepare_keys(keys, id_col, encode_ids)
    sizes = keyed.groupBy("block_key").agg(F.count("*").alias("block_size")).persist()
    release.append(sizes)
    stats_row = sizes.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("block_size") > block_cap, 1).otherwise(0)).alias("over"),
        F.sum(
            F.when(F.col("block_size") > block_cap, F.col("block_size")).otherwise(0)
        ).alias("dropped"),
    ).collect()[0]
    stats = BlockingStats(
        total_blocks=stats_row["total"] or 0,
        oversized_blocks=stats_row["over"] or 0,
        dropped_memberships=stats_row["dropped"] or 0,
        capped_at=block_cap,
        extra={"strategy": "salted", "salt": salt},
    )
    eligible = sizes.filter(
        (F.col("block_size") >= 2) & (F.col("block_size") <= block_cap)
    ).select("block_key")
    pruned = keyed.join(eligible, "block_key")

    a = pruned.select(
        "block_key",
        F.col("iid").alias("iid_a"),
        F.pmod(F.xxhash64("iid"), F.lit(salt)).alias("salt"),
    )
    b = pruned.select(
        "block_key",
        F.col("iid").alias("iid_b"),
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("salt"),
    )
    pairs = (
        a.join(b, ["block_key", "salt"])
        .filter(F.col("iid_a") < F.col("iid_b"))
        .select("iid_a", "iid_b")
        .dropDuplicates(["iid_a", "iid_b"])
    )
    if mapping is not None:
        pairs = _decode_pairs(pairs, mapping)
    else:
        pairs = pairs.select(F.col("iid_a").alias("conv_id_a"),
                             F.col("iid_b").alias("conv_id_b"))
    return _finalize(pairs, stats, materialize, release)


def two_table_pairs_from_block_keys(
    keys_lhs: DataFrame,
    keys_rhs: DataFrame,
    block_cap: int = 200,
    id_col: str = "conv_id",
    encode_ids: bool = True,
    materialize: bool = True,
) -> tuple[DataFrame, BlockingStats]:
    """Two-table blocking: cross-side candidate pairs only.

    The reference blocks ACROSS two entity tables (Amazon vs Google) and
    keeps only lhs x rhs pairs — the lhs/rhs re-alignment at
    reference script/blocking_algorithms.py:149-172 and every
    ``run_magellan_models`` call (model_magellan_ml.py:183-193). Here each
    side's (id, block_key) rows meet in an equi-join on block_key;
    same-side pairs never form because the join sides are distinct tables.

    Output preserves orientation: ``conv_id_a`` is always from the lhs
    table, ``conv_id_b`` from the rhs (the reference's ltable/rtable
    convention) — NOT canonicalized by value order.

    ``block_cap`` applies per side: a block whose lhs OR rhs membership
    exceeds the cap is dropped and counted (pair volume per surviving
    block <= cap^2). Blocks present on only one side are inert and are
    not counted.
    """
    la, ma, rel_a = _prepare_keys(keys_lhs, id_col, encode_ids)
    lb, mb, rel_b = _prepare_keys(keys_rhs, id_col, encode_ids)
    release = rel_a + rel_b
    sizes = (
        la.groupBy("block_key").agg(F.count("*").alias("ca"))
        .join(lb.groupBy("block_key").agg(F.count("*").alias("cb")), "block_key")
        .persist()
    )
    release.append(sizes)
    over = (F.col("ca") > block_cap) | (F.col("cb") > block_cap)
    stats_row = sizes.agg(
        F.count("*").alias("total"),
        F.sum(over.cast("int")).alias("over"),
        F.sum(F.when(over, F.col("ca") + F.col("cb")).otherwise(0)).alias("dropped"),
    ).collect()[0]
    stats = BlockingStats(
        total_blocks=stats_row["total"] or 0,
        oversized_blocks=stats_row["over"] or 0,
        dropped_memberships=stats_row["dropped"] or 0,
        capped_at=block_cap,
        extra={"strategy": "two_table"},
    )
    eligible = sizes.filter(~over).select("block_key")
    pairs = (
        la.join(eligible, "block_key")
        .select("block_key", F.col("iid").alias("iid_a"))
        .join(lb.select("block_key", F.col("iid").alias("iid_b")), "block_key")
        .select("iid_a", "iid_b")
        .dropDuplicates(["iid_a", "iid_b"])
    )
    if ma is not None:
        m_a, m_b = F.broadcast(ma), F.broadcast(mb)
        pairs = (
            pairs
            .join(m_a.select(F.col("iid").alias("iid_a"),
                             F.col("_id").alias("conv_id_a")), "iid_a")
            .join(m_b.select(F.col("iid").alias("iid_b"),
                             F.col("_id").alias("conv_id_b")), "iid_b")
            .select("conv_id_a", "conv_id_b")
        )
    else:
        pairs = pairs.select(F.col("iid_a").alias("conv_id_a"),
                             F.col("iid_b").alias("conv_id_b"))
    return _finalize(pairs, stats, materialize, release)


def packed_two_table_pairs_from_block_keys(
    keys_lhs: DataFrame,
    keys_rhs: DataFrame,
    block_cap: int = 200,
    id_col: str = "conv_id",
    materialize: bool = True,
    ids_lhs: DataFrame | None = None,
    ids_rhs: DataFrame | None = None,
) -> tuple[DataFrame, BlockingStats]:
    """Two-table pair generation with cross-side pairs PACKED into one
    int64 (``iid_lhs * 2^32 + iid_rhs``, each side's OWN dense rank)
    through the dedup exchange — the two-table analogue of
    ``packed_pairs_from_block_keys``.

    Why: ``two_table_pairs_from_block_keys`` shuffles two int64 columns
    through its pair dedup — the stage's largest exchange at
    decontamination scale (cross-corpus dedup blocks a training corpus
    against a benchmark corpus; the candidate volume is bands x corpus).
    Packing halves the dedup exchange's row payload and reduces the hash
    aggregate to a single-long key, exactly the measured win of the
    one-table packed path (21.9s -> 15.1s on 30.0M pre-dedup rows).

    Orientation is structural: the lhs rank ALWAYS occupies the high 32
    bits, so unpacking preserves the reference's ltable/rtable
    convention with no least/greatest canonicalization. Same single-pass
    per-side grouping as the one-table path: one exchange per side
    builds member arrays AND sizes; blocks present on only one side drop
    out in the inner join (inert, uncounted — same stats semantics as
    the unpacked two-table path). Requires < 2^31 distinct ids PER SIDE.

    ``ids_lhs`` / ``ids_rhs``: optional pre-distinct id sets (e.g. each
    signature table's id column) — skips a dropDuplicates exchange per
    side. ``stats.extra``: ``packed_pairs`` (persisted packed handle),
    ``id_mapping_lhs`` / ``id_mapping_rhs``.
    """
    sides = {}
    release: list[DataFrame] = []
    for tag, keys, ids in (("lhs", keys_lhs, ids_lhs),
                           ("rhs", keys_rhs, ids_rhs)):
        if ids is not None:
            raw = keys
            id_src = ids.select(F.col(id_col).alias("_id"))
        else:
            raw = keys.persist()
            release.append(raw)
            id_src = raw.select(F.col(id_col).alias("_id")).dropDuplicates()
        mapping = dense_id_mapping(id_src)
        n_ids = getattr(mapping, "nem_n", None) or mapping.count()
        if n_ids >= (1 << 31):
            mapping.unpersist()
            for df in release:
                df.unpersist()
            for _, prior_mapping in sides.values():
                # a side already built (lhs when rhs trips the guard)
                # persisted its dense-id mapping too — release it
                prior_mapping.unpersist()
            raise ValueError(
                f"{n_ids} distinct {tag} ids exceed the int32 packing "
                "range; use two_table_pairs_from_block_keys instead")
        grouped = (
            raw.join(F.broadcast(mapping), raw[id_col] == mapping["_id"])
            .select("iid", "block_key")
            .groupBy("block_key")
            .agg(F.sort_array(F.collect_list("iid")).alias(f"ids_{tag}"))
        )
        sides[tag] = (grouped, mapping)
    ga, ma = sides["lhs"]
    gb, mb = sides["rhs"]
    joined = (
        ga.join(gb, "block_key")
        .select("ids_lhs", "ids_rhs",
                F.size("ids_lhs").alias("ca"), F.size("ids_rhs").alias("cb"))
        .persist()
    )
    release.append(joined)
    over = (F.col("ca") > block_cap) | (F.col("cb") > block_cap)
    stats_row = joined.agg(
        F.count("*").alias("total"),
        F.sum(over.cast("int")).alias("over"),
        F.sum(F.when(over, F.col("ca") + F.col("cb")).otherwise(0))
        .alias("dropped"),
    ).collect()[0]
    stats = BlockingStats(
        total_blocks=stats_row["total"] or 0,
        oversized_blocks=stats_row["over"] or 0,
        dropped_memberships=stats_row["dropped"] or 0,
        capped_at=block_cap,
        extra={"strategy": "two_table_packed",
               "id_mapping_lhs": ma, "id_mapping_rhs": mb},
    )
    pair_expr = (
        "flatten(transform(ids_lhs, x -> "
        "transform(ids_rhs, y -> x * 4294967296L + y)))"
    )
    packed = (
        joined.filter(~over)
        .select(F.explode(F.expr(pair_expr)).alias("pk"))
        .dropDuplicates(["pk"])
        .persist()
    )
    stats.extra["packed_pairs"] = packed
    if materialize:
        stats.extra["n_pairs"] = packed.count()
        for df in release:
            df.unpersist()
    else:
        stats.extra["_persisted"] = release + [packed]
    pairs = packed.select(
        F.floor(F.col("pk") / F.lit(_PACK)).cast("long").alias("iid_a"),
        F.pmod("pk", F.lit(_PACK)).alias("iid_b"),
    )
    # lazy decode through each side's mapping: real ids, lhs/rhs
    # orientation preserved structurally by the packing
    pairs = (
        pairs
        .join(F.broadcast(ma).select(F.col("iid").alias("iid_a"),
                                     F.col("_id").alias("conv_id_a")),
              "iid_a")
        .join(F.broadcast(mb).select(F.col("iid").alias("iid_b"),
                                     F.col("_id").alias("conv_id_b")),
              "iid_b")
        .select("conv_id_a", "conv_id_b")
    )
    return pairs, stats


def lsh_block(
    signatures: DataFrame,
    num_hashes: int = 128,
    bands: int = 32,
    char_ngram: int = 8,
    seed: int = 42,
    block_cap: int = 200,
    strategy: str = "grouped",
    materialize: bool = True,
    signatures_rhs: DataFrame | None = None,
    decode_ids: bool = True,
) -> tuple[DataFrame, BlockingStats]:
    """Full MinHash-LSH blocker: signatures -> unique candidate pairs.

    ``strategy``: 'grouped' (single exchange, default), 'join' (self-join
    form), 'salted' (skew-spread join for very large caps), or 'packed'
    (dense-rank ids packed into one int64 through the dedup exchange —
    the cheapest exchange shape; see packed_pairs_from_block_keys).

    ``signatures_rhs``: two-table mode (reference ltable/rtable) — band
    keys are computed for both sides with the SAME seeded hash family and
    only cross-side pairs are emitted. strategy='packed' routes to
    ``packed_two_table_pairs_from_block_keys`` (per-side dense ranks,
    single-int64 dedup exchange); every other strategy uses the standard
    two-table join plan.

    ``decode_ids=False`` (grouped/packed strategies): candidate pairs
    keep the compact codes (xxhash64 for grouped, dense ranks for
    packed); downstream payload joins key on the code and decode only
    final matches via stats.extra['id_mapping'] — the right shape at
    full scale, where decoding every candidate pair is pure wasted
    shuffle width. With ``decode_ids=True`` (default) packed pairs are
    decoded lazily through the mapping, canonicalized least/greatest."""
    keys = lsh_band_keys(signatures, num_hashes, bands, char_ngram, seed)
    if signatures_rhs is not None:
        keys_rhs = lsh_band_keys(signatures_rhs, num_hashes, bands,
                                 char_ngram, seed)
        if strategy == "packed":
            return packed_two_table_pairs_from_block_keys(
                keys, keys_rhs, block_cap=block_cap,
                materialize=materialize,
                ids_lhs=signatures.select(F.col("conv_id")),
                ids_rhs=signatures_rhs.select(F.col("conv_id")))
        return two_table_pairs_from_block_keys(
            keys, keys_rhs, block_cap=block_cap, materialize=materialize)
    if strategy == "grouped":
        # signatures are one-row-per-entity: their id column is the
        # pre-distinct id set (skips the raw-keys persist and the
        # dropDuplicates exchange over the 64-bands-per-doc memberships)
        return grouped_pairs_from_block_keys(
            keys, block_cap=block_cap, materialize=materialize,
            decode_ids=decode_ids,
            ids=signatures.select(F.col("conv_id")))
    if strategy == "packed":
        # signatures are one-row-per-entity: pass their id column as the
        # pre-distinct id set (skips a dropDuplicates exchange over the
        # 64-bands-per-doc membership rows and the keys persist)
        pairs, stats = packed_pairs_from_block_keys(
            keys, block_cap=block_cap, materialize=materialize,
            ids=signatures.select(F.col("conv_id")))
        if decode_ids:
            # lazy decode at the boundary: real ids, canonical order
            m = F.broadcast(stats.extra["id_mapping"])
            pairs = (
                pairs
                .join(m.select(F.col("iid").alias("conv_id_a"),
                               F.col("_id").alias("_ida")), "conv_id_a")
                .join(m.select(F.col("iid").alias("conv_id_b"),
                               F.col("_id").alias("_idb")), "conv_id_b")
                .select(F.least("_ida", "_idb").alias("conv_id_a"),
                        F.greatest("_ida", "_idb").alias("conv_id_b"))
            )
        return pairs, stats
    if strategy == "salted":
        return salted_pairs_from_block_keys(
            keys, block_cap=block_cap, materialize=materialize)
    return pairs_from_block_keys(
        keys, block_cap=block_cap, materialize=materialize)


def token_overlap_block(
    signatures: DataFrame,
    min_shared_tokens: int = 2,
    text_col: str = "sig_text",
    id_col: str = "conv_id",
    max_token_df: int | None = 1000,
    signatures_rhs: DataFrame | None = None,
) -> tuple[DataFrame, BlockingStats]:
    """Word-level token-overlap blocker (>= min_shared_tokens shared tokens),
    the OverlapBlocker semantics of blocking_algorithms.py:34-53.

    Distributed as an inverted-index join: tokenize -> explode ->
    equi-join on token -> groupBy(pair) count >= k. ``max_token_df`` drops
    tokens appearing in more than that many docs (a stopword token would
    otherwise emit a quadratic pair explosion); dropped tokens are counted
    in stats — visible, like the block cap.

    ``signatures_rhs``: two-table mode (reference ltable/rtable,
    blocking_algorithms.py:34-53 blocks Amazon x Google) — the index join
    runs lhs-tokens x rhs-tokens, only cross-side pairs form, orientation
    is preserved (conv_id_a from lhs), and the token-df cap counts
    document frequency across BOTH sides.
    """

    def _toks(df):
        return (
            df.select(F.col(id_col).alias("conv_id"),
                      F.explode(tokens(F.col(text_col))).alias("token"))
            .filter(F.length("token") > 0)
        )

    toks_a = _toks(signatures)
    toks_b = _toks(signatures_rhs) if signatures_rhs is not None else None
    stats = BlockingStats(
        capped_at=max_token_df,
        extra={"strategy": "two_table" if toks_b is not None else "self"},
    )
    if max_token_df is not None:
        both = toks_a if toks_b is None else toks_a.unionByName(toks_b)
        df_counts = both.groupBy("token").agg(F.count("*").alias("df"))
        hot = df_counts.filter(F.col("df") > max_token_df)
        stats.extra["hot_tokens_dropped"] = hot.count()
        hot_b = F.broadcast(hot.select("token"))
        toks_a = toks_a.join(hot_b, "token", "left_anti")
        if toks_b is not None:
            toks_b = toks_b.join(hot_b, "token", "left_anti")

    if toks_b is None:
        a = toks_a.select(F.col("token"), F.col("conv_id").alias("conv_id_a"))
        b = toks_a.select(F.col("token"), F.col("conv_id").alias("conv_id_b"))
        joined = a.join(b, "token").filter(F.col("conv_id_a") < F.col("conv_id_b"))
    else:
        a = toks_a.select(F.col("token"), F.col("conv_id").alias("conv_id_a"))
        b = toks_b.select(F.col("token"), F.col("conv_id").alias("conv_id_b"))
        joined = a.join(b, "token")
    pairs = (
        joined
        .groupBy("conv_id_a", "conv_id_b")
        .agg(F.count("*").alias("shared_tokens"))
        .filter(F.col("shared_tokens") >= min_shared_tokens)
        .select("conv_id_a", "conv_id_b")
    )
    return pairs, stats


def edit_distance_filter(
    candidates: DataFrame,
    signatures: DataFrame,
    cutoff_ratio: float = 60.0,
    id_col: str = "conv_id",
    text_col: str = "sig_text",
    metric: str = "lev_ratio",
) -> DataFrame:
    """Second stage of the reference's sequential cascade: keep candidate
    pairs whose edit-similarity ratio >= cutoff (calculate_edit_block_bool,
    reference script/utilities.py:492-502; grid cutoffs {50,60,70,80}).

    Cheap blocker first, expensive distance on survivors — the reference's
    one manual optimization (model_magellan_ml.py:189-191).

    ``metric`` — NORMALIZATION FIDELITY: the reference thresholds
    fuzz.ratio, the INDEL ratio ``100*(1 - indel/(len_a+len_b))``
    (substitutions cost 2), while the default ``'lev_ratio'`` here is
    ``100*(1 - levenshtein/max_len)`` on Spark's JVM codegen'd
    levenshtein. The two agree on pure insert/delete edits but diverge
    on substitutions (e.g. 'ab' vs 'ba': lev_ratio 0, indel 50), so the
    SAME cutoff values select different survivor sets. Pass
    ``metric='indel'`` for bit-exact reference parity — it routes
    through the Arrow-batched fuzz_ratio_udf, which dispatches to
    rapidfuzz's C ``fuzz.ratio`` when that package is importable on the
    workers and otherwise runs a vectorized numpy whole-batch LCS DP
    (length-sorted chunks, one np.maximum.accumulate per DP row — no
    per-string Python loop; rapidfuzz is absent from this image).
    Either way 'indel' is the slow path relative to the JVM
    'lev_ratio': keep 'lev_ratio' unless reference-identical survivor
    sets are required.
    """
    sig = signatures.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")
    )
    if metric == "indel":
        from neural_entity_matching_spark.functions.similarity import (
            fuzz_ratio_udf,
        )

        ratio = fuzz_ratio_udf(F.col("_txt_a"), F.col("_txt_b"))
    elif metric == "lev_ratio":
        ratio = lev_ratio(F.col("_txt_a"), F.col("_txt_b"))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return (
        candidates
        .join(sig.withColumnRenamed("_id", "conv_id_a")
                 .withColumnRenamed("_txt", "_txt_a"), "conv_id_a")
        .join(sig.withColumnRenamed("_id", "conv_id_b")
                 .withColumnRenamed("_txt", "_txt_b"), "conv_id_b")
        .filter(ratio >= cutoff_ratio)
        .select("conv_id_a", "conv_id_b")
    )
