"""PySpark-native record-linkage / entity-matching engine.

A from-scratch, Spark-first reimplementation of the *semantics* of the
reference research pipeline (Stochastic-Squirrel/neural_entity_matching):
blocking -> pairwise scoring -> transitive clustering, over tables of
multi-turn conversation transcripts, plus the large-scale training-data
operators (dedup, ANN, text analysis) a 100 TB pipeline needs.

Everything is built on the public PySpark DataFrame API; all custom logic
is vectorized pandas/Arrow UDFs (never per-row Python UDFs).
"""

__version__ = "0.1.0"
