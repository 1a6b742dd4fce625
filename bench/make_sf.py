"""Synthesize a larger scale-factor directory from /root/testdata/sf0.1.

Measurement tooling only (round-6): the driver's own sf1.0 tables are
generated driver-side and are not present in the sandbox; this script
builds a deterministic, schema- and distribution-faithful 10x (or Nx)
scale-up so that tree-vs-tree bench comparisons can be run at driver
scale locally. It is NEVER used by bench.py defaults, the oracle gates,
or any declared query — correctness is always checked against the
driver-generated sf0.001/sf0.01/sf0.1 dirs.

Method per table (seed-deterministic, replica r in 1..N-1; replica 0 is
the source data verbatim):

- region/nation: dimension tables, copied once.
- customer/supplier/part/orders/lineitem/events: replicated with key
  offsets that preserve referential integrity (o_custkey follows the
  customer offset, l_orderkey the orders offset, ...).
- documents: texts re-sampled word-by-word from the source corpus's
  empirical unigram distribution, matching each source doc's word count
  (and therefore its length distribution); n_chars recomputed. This
  preserves the natural shingle-overlap statistics that drive the
  minhash/LSH/cluster queries without creating cross-replica
  near-duplicate families that the driver's data would not have.
- embeddings: replicated with vec_id offsets and small deterministic
  gaussian perturbation so ANN neighborhoods stay non-degenerate.

Usage: python bench/make_sf.py [N] [OUT_DIR]
  defaults: N=10, OUT_DIR=/root/bigdata/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _read(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SRC}/{name}.parquet").to_pandas()


def _write(df: pd.DataFrame, out_dir: str, name: str, schema: pa.Schema) -> None:
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, f"{out_dir}/{name}.parquet")
    print(f"  {name}: {len(df):,} rows")


def main() -> None:
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/bigdata/sf1.0"
    os.makedirs(out_dir, exist_ok=True)

    for name in ("region", "nation"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{out_dir}/{name}.parquet")
        print(f"  {name}: copied")

    def replicate(name: str, offsets: dict[str, int]) -> None:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        schema = src.schema
        df = src.to_pandas()
        parts = []
        for r in range(n_rep):
            p = df.copy()
            for col, off in offsets.items():
                p[col] = p[col] + r * off
            parts.append(p)
        _write(pd.concat(parts, ignore_index=True), out_dir, name, schema)

    cust = _read("customer")
    n_cust = int(cust.c_custkey.max()) + 1
    supp = _read("supplier")
    n_supp = int(supp.s_suppkey.max()) + 1
    part = _read("part")
    n_part = int(part.p_partkey.max()) + 1
    orders = _read("orders")
    n_ord = int(orders.o_orderkey.max()) + 1
    ev = _read("events")
    n_event = int(ev.event_id.max()) + 1
    n_user = int(ev.user_id.max()) + 1

    replicate("customer", {"c_custkey": n_cust})
    replicate("supplier", {"s_suppkey": n_supp})
    replicate("part", {"p_partkey": n_part})
    replicate("orders", {"o_orderkey": n_ord, "o_custkey": n_cust})
    replicate(
        "lineitem",
        {"l_orderkey": n_ord, "l_partkey": n_part, "l_suppkey": n_supp},
    )
    replicate("events", {"event_id": n_event, "user_id": n_user})

    # documents: replica 0 verbatim; replicas 1.. resample words from the
    # empirical unigram distribution, matched per-doc word count.
    src_tbl = pq.read_table(f"{SRC}/documents.parquet")
    docs = src_tbl.to_pandas()
    n_docs = int(docs.doc_id.max()) + 1
    all_words = np.concatenate([t.split() for t in docs.text])
    vocab, counts = np.unique(all_words, return_counts=True)
    probs = counts / counts.sum()
    wc = docs.text.str.split().str.len().to_numpy()
    parts = [docs]
    for r in range(1, n_rep):
        rng = np.random.RandomState(1_000_003 * r + 7)
        sampled = rng.choice(vocab, size=int(wc.sum()), p=probs)
        texts = []
        pos = 0
        for k in wc:
            texts.append(" ".join(sampled[pos : pos + k]))
            pos += k
        p = docs.copy()
        p["doc_id"] = p["doc_id"] + r * n_docs
        p["text"] = texts
        p["n_chars"] = p.text.str.len().astype(docs.n_chars.dtype)
        parts.append(p)
    _write(pd.concat(parts, ignore_index=True), out_dir, "documents", src_tbl.schema)

    # embeddings: key offset + small deterministic perturbation
    emb_tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    emb = emb_tbl.to_pandas()
    n_vec = int(emb.vec_id.max()) + 1
    dim = len(emb.embedding.iloc[0])
    parts = [emb]
    for r in range(1, n_rep):
        rng = np.random.RandomState(2_000_003 * r + 11)
        p = emb.copy()
        p["vec_id"] = p["vec_id"] + r * n_vec
        base = np.stack(p.embedding.to_numpy())
        noise = rng.normal(0.0, 0.01, size=(len(p), dim))
        p["embedding"] = list((base + noise).astype(base.dtype))
        parts.append(p)
    _write(pd.concat(parts, ignore_index=True), out_dir, "embeddings", emb_tbl.schema)

    # marker the test-data loader looks for
    with open(f"{out_dir}/_DONE", "w") as f:
        f.write("synthesized from sf0.1 by bench/make_sf.py\n")
    print(f"done: {out_dir}")


if __name__ == "__main__":
    main()
