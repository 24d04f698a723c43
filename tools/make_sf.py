"""Synthesize a larger sf directory for LOCAL timing only (the driver
generates its own). Relational tables are scaled by key-offset replication
of sf0.1 (each copy is a disjoint key universe, so join selectivities,
group cardinalities and per-key row counts match sf0.1 exactly);
documents/embeddings are regenerated at scale with the same vocabulary /
length / cluster shape observed in sf0.1. Deterministic (seed 42).

Usage: python tools/make_sf.py [factor] [out_dir]
Default: factor 10 -> /root/testdata/sf1.0 (existing dirs never touched).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = sorted(
    "a agg batch big column customer data dup fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream table "
    "the value vector window".split()
)


def replicate(name: str, factor: int, offsets: dict[str, int], out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    cols = {c: t.column(c) for c in t.column_names}
    parts = []
    for c in range(factor):
        piece = {}
        for col in t.column_names:
            if col in offsets and c > 0:
                piece[col] = pa.compute.add(cols[col], c * offsets[col])
            else:
                piece[col] = cols[col]
        parts.append(pa.table(piece, schema=t.schema))
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, f"{name}.parquet"))


def gen_documents(n: int, out_dir: str, rng: np.random.Generator) -> None:
    src01 = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    word_counts = src01.text.str.split().str.len().to_numpy()
    langs = src01.lang.to_numpy()
    wc = rng.choice(word_counts, size=n)
    texts = [" ".join(rng.choice(VOCAB, size=k)) for k in wc]
    # mirror the near-dup structure: a few percent of docs are copies of an
    # earlier doc with a handful of words changed (sf0.1 has 8/5000 exact dups
    # plus heavy natural shingle overlap from the 31-word vocab)
    n_dup = n // 60
    for i in rng.choice(np.arange(n // 2, n), size=n_dup, replace=False):
        base = texts[int(i) // 2].split()
        for _ in range(max(1, len(base) // 30)):
            base[rng.integers(0, len(base))] = VOCAB[rng.integers(0, len(VOCAB))]
        texts[int(i)] = " ".join(base)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(rng.choice(langs, size=n), pa.string()),
            "source": pa.array([f"src{int(i)}" for i in rng.integers(0, 20, size=n)], pa.string()),
            "n_chars": pa.array(np.array([len(s) for s in texts]), pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))


def gen_embeddings(n: int, out_dir: str, rng: np.random.Generator) -> None:
    dim, n_labels = 64, 10
    cents = rng.standard_normal((n_labels, dim)).astype(np.float32) * 0.08
    labels = rng.integers(0, n_labels, size=n).astype(np.int32)
    v = rng.standard_normal((n, dim)).astype(np.float32) + cents[labels]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
    assert not os.path.realpath(out_dir).startswith(
        ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    ), "never touch the driver's dirs"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    def span(name, col):
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"), columns=[col])
        return int(pa.compute.max(t.column(col)).as_py()) + 1

    o_orders = span("orders", "o_orderkey")
    o_cust = span("customer", "c_custkey")
    o_part = span("part", "p_partkey")
    o_supp = span("supplier", "s_suppkey")
    o_event = span("events", "event_id")
    o_user = span("events", "user_id")

    for name in ("region", "nation"):
        replicate(name, 1, {}, out_dir)
    replicate("supplier", factor, {"s_suppkey": o_supp}, out_dir)
    replicate("part", factor, {"p_partkey": o_part}, out_dir)
    replicate("customer", factor, {"c_custkey": o_cust}, out_dir)
    replicate("orders", factor, {"o_orderkey": o_orders, "o_custkey": o_cust}, out_dir)
    replicate(
        "lineitem",
        factor,
        {"l_orderkey": o_orders, "l_partkey": o_part, "l_suppkey": o_supp},
        out_dir,
    )
    replicate("events", factor, {"event_id": o_event, "user_id": o_user}, out_dir)
    gen_documents(5000 * factor, out_dir, rng)
    gen_embeddings(2000 * factor, out_dir, rng)
    print(f"wrote {out_dir} at {factor}x sf0.1")


if __name__ == "__main__":
    main()
