"""Catalog registration (S5): named views over the testdata tables with a
key registry, plus schema-validated transcript registration."""

import os

import pytest

from neural_entity_matching_spark.sources import catalog

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_register_testdata_views(spark):
    reg = catalog.register_testdata(spark, SF_DIR)
    assert "documents" in reg and reg["documents"] == ["doc_id"]
    n = spark.sql("SELECT count(*) AS n FROM documents").collect()[0]["n"]
    assert n > 0
    # key registry is usable for joins by name
    joined = spark.sql(
        "SELECT count(*) AS n FROM orders o JOIN customer c "
        "ON o.o_custkey = c.c_custkey"
    ).collect()[0]["n"]
    assert joined > 0


def test_register_transcripts_validates_schema(spark, fixture_small):
    transcripts, _, _ = fixture_small
    catalog.register_transcripts(spark, transcripts, name="t_view")
    n = spark.sql("SELECT count(DISTINCT conv_id) AS n FROM t_view").collect()[0]["n"]
    assert n > 0
    with pytest.raises(ValueError, match="missing columns"):
        catalog.register_transcripts(spark, transcripts.drop("turn_idx"))
