#!/usr/bin/env python
"""Generate a scaled MEASUREMENT dataset with the same schema and marginal
distributions as the driver's /root/testdata/sf* tables (TPC-H-ish star
schema + events/documents/embeddings), so per-query optimization work can be
isolated at data volumes where restructures bite (guide §1: measure at the
scale you are optimizing for — the sf0.1 battery is fixed-overhead-dominated).

This does NOT regenerate or touch /root/testdata (read-only, driver-owned);
output goes to an explicit --out dir. Distributions are matched to the
measured sf0.1 marginals (tok-length U[10,100] over the 31-word vocabulary,
lang {en:0.4, others:0.15}, TPC-H-ish key ranges scaled linearly, 64-dim
unit-norm clustered embeddings). Deterministic (numpy PCG64, seed 42).

Usage: python tools/make_sf_data.py --scale 10 --out /root/sfbig/sf1.0
(scale is relative to sf0.1: scale 10 = sf1.0-equivalent row counts).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream table "
    "the value vector window"
).split()
assert len(VOCAB) == 31


def write(out: str, name: str, table: pa.Table) -> None:
    # one row group per file — the driver's tables are single-row-group
    # parquet (verified on every sf0.01/sf0.1 table incl. 600k-row
    # lineitem), which caps Spark scan parallelism at ~1 task; measurement
    # data must reproduce that layout or it overstates scan width
    pq.write_table(
        table, os.path.join(out, f"{name}.parquet"),
        row_group_size=max(table.num_rows, 1),
    )
    print(f"{name}: {table.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=10.0, help="x sf0.1 rows")
    ap.add_argument("--out", default="/root/sfbig/sf1.0")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    s = args.scale

    n_cust, n_supp, n_part = int(15000 * s), int(1000 * s), int(20000 * s)
    n_ord, n_li = int(150000 * s), int(600000 * s)
    n_ev, n_doc, n_emb = int(100000 * s), int(5000 * s), int(2000 * s)

    # region / nation: fixed dimensions, copied shape
    write(args.out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    write(args.out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(rng.integers(0, 5, 25), pa.int64()),
    }))

    segs = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
    write(args.out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int64()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [segs[i] for i in rng.integers(0, 5, n_cust)],
    }))
    write(args.out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int64()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    adjs = ["large", "hot", "small", "cold", "round", "flat", "long", "short"]
    nouns = ["ring", "bolt", "screw", "plate", "gear", "rod", "pin", "cap"]
    types_ = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
    write(args.out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in zip(
            rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [types_[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    day_us = 86_400_000_000
    base95 = np.datetime64("1995-01-01", "us").astype("int64")
    span_days = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int)
    statuses = ["P", "O", "F"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    write(args.out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [statuses[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(
            base95 + rng.integers(0, span_days + 1, n_ord) * day_us,
            pa.timestamp("us")),
        "o_orderpriority": [prios[i] for i in rng.integers(0, 5, n_ord)],
    }))
    qty = rng.integers(1, 51, n_li).astype("float64")
    write(args.out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [["N", "R", "A"][i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [["F", "O"][i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(
            base95 + rng.integers(1, span_days + 96, n_li) * day_us,
            pa.timestamp("us")),
    }))

    base24 = np.datetime64("2024-01-01", "us").astype("int64")
    ts = base24 + np.sort(rng.integers(0, 30 * day_us, n_ev))
    etypes = ["signup", "purchase", "view", "click", "error"]
    write(args.out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, int(1500 * max(s, 1)), n_ev), pa.int64()),
        "event_type": [etypes[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 560, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: U[10,100] tokens over the 31-word vocab (uniform draws —
    # matches the measured flat frequency profile), lang {en .4, rest .15}
    lens = rng.integers(10, 101, n_doc)
    toks = rng.integers(0, 31, int(lens.sum()))
    texts, off = [], 0
    for ln in lens:
        texts.append(" ".join(VOCAB[t] for t in toks[off:off + ln]))
        off += ln
    langs = np.array(["en", "zh", "es", "fr", "de"])[
        rng.choice(5, n_doc, p=[0.4, 0.15, 0.15, 0.15, 0.15])]
    write(args.out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": langs.tolist(),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 cluster centers + noise, L2-normalized (matches the
    # unit-norm, ~10-label structure of the driver table)
    centers = rng.normal(0, 1, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] * 0.6 + rng.normal(0, 0.6, (n_emb, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype("float32")
    write(args.out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    main()
