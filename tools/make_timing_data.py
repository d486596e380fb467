"""Generate a TIMING-ONLY scaled dataset from /root/testdata/sf0.1.

The driver's round-end measurement runs at a larger, driver-generated
scale factor (BENCH_r06.json: sf=1.0) whose tables we cannot read. To
optimize at that scale we synthesize a statistically similar sf1.0-like
directory: relational tables are replicated ``factor`` times with
disjoint key offsets (join fan-outs and group cardinalities scale like
the real generator's), and ``documents`` is re-generated from the sf0.1
marginals (per-language vocabulary, token-count histogram, 20 sources,
a planted ~1.5%% near-duplicate rate) so LSH/similarity workloads see
realistic block-size and candidate distributions instead of degenerate
10x copies.

This data is used ONLY by bench_extra.py for local measurement — the
driver's bench and oracle gates run on driver-generated inputs. Nothing
here is cached or keyed into any query path.

Usage: python tools/make_timing_data.py [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"

# key-offset strides per replica, disjoint from the sf0.1 key ranges
STRIDES = {
    "o_orderkey": 10_000_000, "l_orderkey": 10_000_000,
    "c_custkey": 1_000_000, "o_custkey": 1_000_000, "user_id": 1_000_000,
    "s_suppkey": 100_000, "l_suppkey": 100_000,
    "p_partkey": 1_000_000, "l_partkey": 1_000_000,
    "event_id": 10_000_000, "vec_id": 100_000, "doc_id": 1_000_000,
}

REL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]


def replicate(df: pd.DataFrame, factor: int) -> pd.DataFrame:
    out = []
    for i in range(factor):
        c = df.copy()
        for col, stride in STRIDES.items():
            if col in c.columns and i > 0:
                c[col] = c[col] + i * stride
        out.append(c)
    return pd.concat(out, ignore_index=True)


def gen_documents(d: pd.DataFrame, factor: int, seed: int = 7) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    n_out = len(d) * factor
    langs = d["lang"].value_counts(normalize=True)
    vocab = {}
    tok_lens = {}
    for lang, grp in d.groupby("lang"):
        toks = set()
        lens = []
        for t in grp["text"]:
            parts = t.split()
            toks.update(parts)
            lens.append(len(parts))
        vocab[lang] = sorted(toks)
        tok_lens[lang] = np.asarray(lens)
    rows = []
    doc_id = 0
    n_sources = d["source"].nunique()
    lang_names = list(langs.index)
    lang_p = langs.values
    while doc_id < n_out:
        lang = lang_names[rng.choice(len(lang_names), p=lang_p)]
        v = vocab[lang]
        n_tok = int(rng.choice(tok_lens[lang]))
        words = [v[i] for i in rng.randint(0, len(v), size=n_tok)]
        text = " ".join(words)
        src = f"src{doc_id % n_sources}"
        rows.append((doc_id, text, lang, src, len(text)))
        doc_id += 1
        # planted near-dup (~1.5%): perturb <=5% of tokens
        if rng.rand() < 0.015 and doc_id < n_out:
            w2 = list(words)
            for _ in range(max(1, n_tok // 20)):
                w2[rng.randint(0, len(w2))] = v[rng.randint(0, len(v))]
            t2 = " ".join(w2)
            rows.append((doc_id, t2, lang, f"src{doc_id % n_sources}",
                         len(t2)))
            doc_id += 1
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/timing_sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in REL_TABLES:
        df = con.sql(
            f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')").df()
        big = replicate(df, factor) if t not in ("region", "nation") else df
        big.to_parquet(f"{out_dir}/{t}.parquet", index=False)
        print(t, len(big))
    d = con.sql(
        f"SELECT * FROM read_parquet('{SRC}/documents.parquet')").df()
    docs = gen_documents(d, factor)
    docs.to_parquet(f"{out_dir}/documents.parquet", index=False)
    print("documents", len(docs))


if __name__ == "__main__":
    main()
