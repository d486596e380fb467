"""Pair-format ingestion: decompose a labeled PAIR file into EM inputs.

The reference's Quora loader (reference script/utilities.py:444-471)
reads a pair-per-row file (qid1, qid2, question1, question2,
is_duplicate) and splits it into the entity-matching shape its whole
pipeline expects: two entity tables (qid1 -> question1,
qid2 -> question2) plus a positive-match table (pairs with
is_duplicate == 1, payload columns dropped). Same idea for the
renamed-suffix variants the other loaders build by selecting suffixed
columns.

Spark shape: three projections off one scan. Entity tables are
deduplicated to one row per id with a deterministic representative
(min over the text — the reference keeps duplicate rows and relies on
downstream pandas indexing; one-row-per-entity is the semantic the rest
of this engine's operators assume, and is what Magellan's ltable/rtable
contract requires anyway). Everything is a narrow projection +
hash-aggregate: at 100 TB the scan prunes to the selected columns and
each output is a single map-side-combined aggregate / filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_pair_table(
    pairs: DataFrame,
    id_cols: tuple[str, str] = ("qid1", "qid2"),
    text_cols: tuple[str, str] = ("question1", "question2"),
    label_col: str = "is_duplicate",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (lhs_entities, rhs_entities, matches).

    lhs_entities: (id, text) one row per distinct lhs id;
    rhs_entities: likewise for the rhs side;
    matches: (id_a, id_b) for rows where ``label_col`` == 1
    (reference utilities.py:452-459 — payload columns dropped).
    """
    l_id, r_id = id_cols
    l_txt, r_txt = text_cols
    lhs = (
        pairs.groupBy(F.col(l_id).alias("id"))
        .agg(F.min(l_txt).alias("text"))
    )
    rhs = (
        pairs.groupBy(F.col(r_id).alias("id"))
        .agg(F.min(r_txt).alias("text"))
    )
    matches = (
        pairs.filter(F.col(label_col) == 1)
        .select(F.col(l_id).alias("id_a"), F.col(r_id).alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return lhs, rhs, matches
