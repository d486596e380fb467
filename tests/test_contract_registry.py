"""Contract-registry invariants (r7, verdict item #5): the query and
oracle registries must stay in lockstep so a query can neither lose its
oracle nor drift silently — pure-python, no SparkSession."""

from neural_entity_matching_spark.plans import contract


def test_queries_and_oracles_in_lockstep():
    assert set(contract.QUERIES) == set(contract.ORACLES)
    assert len(contract.QUERIES) == 29


def test_entry_module_exposes_full_registry():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "spark_entry",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.queries().keys() == contract.QUERIES.keys()
    assert mod.oracle_sql().keys() == contract.ORACLES.keys()
