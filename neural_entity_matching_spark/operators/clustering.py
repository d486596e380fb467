"""Transitive clustering: connected components over matched pairs.

ABSENT from the reference (it stops at pairwise decisions; entity clusters
are the components implied by matched pairs — SURVEY.md §2.8); required by
the north rule. GraphFrames isn't on this classpath, so this is a
hand-rolled iterative min-label propagation over hash-partitioned joins:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint. ER components are shallow (duplicate groups), so the
iteration count ~ cluster diameter, a small constant; each iteration is
one shuffle join + one aggregation. Lineage is cut with localCheckpoint
every iteration (a 50-iteration loop would otherwise build an
un-analyzable plan). At 10^12-turn scale the same loop runs with edges
bucketed by src; for pathological diameters use
``algorithm='star'`` — the large-star/small-star alternation
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014), which converges in O(log^2 n) rounds independent of
component diameter, with the same groupBy/join primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 50,
    checkpoint_every: int = 1,
    algorithm: str = "label_propagation",
) -> DataFrame:
    """(conv_id, cluster_id) with cluster_id = min conv_id in the component.

    ``edges``: (conv_id_a, conv_id_b) matched pairs.
    ``vertices``: optional full entity set so singletons get their own
    cluster (cluster_id = conv_id).
    ``algorithm``: 'label_propagation' (default — rounds ~ component
    diameter, the right choice for shallow ER duplicate groups) or
    'star' (large-star/small-star, O(log^2 n) rounds regardless of
    diameter — for pathological chain-shaped components).
    """
    if algorithm == "star":
        return _star_components(edges, vertices, max_iterations)
    if algorithm != "label_propagation":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    sym = (
        edges.select(F.col("conv_id_a").alias("src"), F.col("conv_id_b").alias("dst"))
        .unionByName(
            edges.select(
                F.col("conv_id_b").alias("src"), F.col("conv_id_a").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    # r7: fuse initialization with the first propagation round. With
    # identity labels, iteration 1's neighbor-min join degenerates to
    # min(dst) per src, so label(v) = min(v, min(N(v))) comes from ONE
    # hash aggregate — this also replaces the labels-distinct exchange.
    # Identical to running the old loop once (same labels, same
    # convergence from here), one join and one exchange cheaper.
    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_nbr"))
        .select(
            F.col("src").alias("conv_id"),
            F.least(F.col("src"), F.col("_nbr")).alias("cluster_id"),
        )
    )

    for i in range(max_iterations):
        # candidate label for each vertex: min over neighbor labels
        neighbor_min = (
            sym.join(
                labels.withColumnRenamed("conv_id", "dst").withColumnRenamed(
                    "cluster_id", "nbr_label"
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nbr_label").alias("nbr_label"))
            .withColumnRenamed("src", "conv_id")
        )
        updated = (
            labels.join(neighbor_min, "conv_id", "left")
            .select(
                "conv_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_label", "cluster_id")
                ).alias("cluster_id"),
                (
                    F.coalesce("nbr_label", "cluster_id") < F.col("cluster_id")
                ).cast("int").alias("_changed"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            updated = updated.localCheckpoint(eager=True)
        changed = updated.agg(F.sum("_changed")).collect()[0][0] or 0
        labels = updated.drop("_changed")
        if changed == 0:
            break

    if vertices is not None:
        labels = (
            vertices.select("conv_id")
            .distinct()
            .join(labels, "conv_id", "left")
            .select(
                "conv_id", F.coalesce("cluster_id", "conv_id").alias("cluster_id")
            )
        )
    return labels


def _star_components(
    edges: DataFrame,
    vertices: DataFrame | None,
    max_iterations: int,
) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al., SoCC 2014).

    Each round rewires edges toward per-neighborhood minima:

    * large-star: for every vertex u, connect each STRICTLY LARGER
      neighbor v to m = min(neighborhood(u) ∪ {u});
    * small-star: orient edges high->low; for every u, connect u and
      each smaller neighbor to m = min(smaller neighbors).

    Both steps preserve connectivity and never raise a vertex's
    reachable minimum; the alternation converges in O(log^2 n) rounds
    to a forest of stars rooted at each component's minimum — no
    dependence on component diameter, unlike label propagation. Each
    step is one groupBy + one broadcast-free equi-join on the vertex
    key, the same shuffle primitive the rest of the engine uses.

    Convergence test: the canonical edge multiset is stable (count +
    order-independent xxhash64 bit_xor digest — one aggregate per
    round, no driver-side edge collection).
    """
    # canonical (a < b) undirected edge set
    e = (
        edges.select(
            F.least("conv_id_a", "conv_id_b").alias("a"),
            F.greatest("conv_id_a", "conv_id_b").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def digest(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    prev = digest(e)
    converged = prev[0] == 0  # no edges: already a (trivial) forest
    for _ in range(max_iterations):
        # ---- large-star ----
        sym = e.select("a", "b").unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )  # (u=a, neighbor v=b)
        m = (
            sym.groupBy("a")
            .agg(F.least(F.min("b"), F.first("a")).alias("m"))
        )
        e = (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("m").alias("a"), F.col("b").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # ---- small-star ----  (orient high u -> low v: u=b, v=a)
        d = e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        mins = d.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            d.join(mins, "u")
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .unionByName(mins.select(F.col("m").alias("a"),
                                     F.col("u").alias("b")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = digest(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # labels derived from a still-moving edge set are NOT component
        # labels (a vertex can carry several cluster_id rows or a
        # non-minimum root) — fail loudly rather than return them.
        # O(log^2 n) rounds suffice in theory; the default budget is
        # generous, so hitting this means pathological input or a bug.
        raise RuntimeError(
            "connected_components(algorithm='star') did not converge "
            f"within max_iterations={max_iterations} rounds (edge digest "
            "still changing); raise max_iterations"
        )

    # converged: every edge is (root=min, member); roots map to themselves
    labels = (
        e.select(F.col("b").alias("conv_id"), F.col("a").alias("cluster_id"))
        .unionByName(
            e.select(F.col("a").alias("conv_id"),
                     F.col("a").alias("cluster_id"))
        )
        .distinct()
    )
    if vertices is not None:
        labels = (
            vertices.select("conv_id")
            .distinct()
            .join(labels, "conv_id", "left")
            .select(
                "conv_id",
                F.coalesce("cluster_id", "conv_id").alias("cluster_id"),
            )
        )
    return labels


def union_find_oracle(pairs: list[tuple[str, str]], vertices: list[str]) -> dict[str, str]:
    """Pure-Python union-find — the test oracle for transitive closure
    (SURVEY.md §5 invariant 2). Driver-side only, never in the pipeline."""
    parent: dict[str, str] = {v: v for v in vertices}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    # canonical: min member id per component
    comp: dict[str, list[str]] = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    out: dict[str, str] = {}
    for members in comp.values():
        root = min(members)
        for m in members:
            out[m] = root
    return out
