"""Large-star/small-star connected components (Kiveris et al., SoCC
2014) — the O(log^2 n)-round variant for pathological diameters — must
match the union-find oracle and the default label-propagation algorithm
on chain, star, and random fixtures (round-3 verdict stretch item)."""

import random

import pyspark.sql.functions as F

from neural_entity_matching_spark.operators.clustering import (
    connected_components,
    union_find_oracle,
)


def _run(spark, edge_list, vertices, algorithm, **kw):
    edges = spark.createDataFrame(
        edge_list or [("_x", "_x")], ["conv_id_a", "conv_id_b"]
    )
    if not edge_list:
        edges = edges.filter(F.lit(False))
    vdf = spark.createDataFrame([(v,) for v in vertices], ["conv_id"])
    out = connected_components(edges, vertices=vdf, algorithm=algorithm, **kw)
    return {r["conv_id"]: r["cluster_id"] for r in out.collect()}


def test_star_matches_oracle_on_long_chain(spark):
    """A 60-vertex chain has diameter 59: label propagation needs ~59
    rounds, the star alternation O(log^2 n) — both must produce the
    min-id component labeling."""
    chain = [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(59)]
    vertices = [f"v{i:03d}" for i in range(60)] + ["lonely"]
    oracle = union_find_oracle(chain, vertices)
    got = _run(spark, chain, vertices, "star")
    assert got == oracle
    # and it converges in far fewer rounds than the diameter
    got_capped = _run(spark, chain, vertices, "star", max_iterations=12)
    assert got_capped == oracle


def test_star_matches_label_propagation_on_random_graph(spark):
    rng = random.Random(7)
    vertices = [f"n{i:02d}" for i in range(40)]
    edge_list = [
        tuple(rng.sample(vertices, 2)) for _ in range(35)
    ]
    oracle = union_find_oracle(edge_list, vertices)
    star = _run(spark, edge_list, vertices, "star")
    lp = _run(spark, edge_list, vertices, "label_propagation")
    assert star == oracle == lp


def test_star_empty_edges_and_singletons(spark):
    vertices = ["a", "b", "c"]
    got = _run(spark, [], vertices, "star")
    assert got == {"a": "a", "b": "b", "c": "c"}


def test_unknown_algorithm_raises(spark):
    import pytest

    edges = spark.createDataFrame([("a", "b")], ["conv_id_a", "conv_id_b"])
    with pytest.raises(ValueError):
        connected_components(edges, algorithm="nope")


def test_star_raises_on_non_convergence(spark):
    """An exhausted iteration budget with the edge digest still moving
    must RAISE — labels derived from a still-moving edge set are not
    component labels (round-4 advice item)."""
    import pytest

    chain = [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(59)]
    vertices = [f"v{i:03d}" for i in range(60)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _run(spark, chain, vertices, "star", max_iterations=1)
