#!/usr/bin/env python
"""Generate driver-shaped synthetic tables at arbitrary scale factors.

The driver's TESTDATA recipe (TESTDATA.md) ships sf0.001/sf0.01/sf0.1;
the scale-slope bench (SCALE_MEASURED.md) needs the SAME shape at
larger sf to measure how query time grows with data. This regenerates
all ten tables — `region nation customer supplier part orders lineitem
events documents embeddings` — with the driver's schemas, dense 0-based
keys, value ranges, and category sets (measured from the read-only
sf0.1 parquet), scaled by ``g``:

    rows(customer)=150k*g  rows(supplier)=10k*g   rows(part)=200k*g
    rows(orders)=1.5M*g    rows(lineitem)≈4*orders rows(events)=1M*g
    rows(documents)=max(500, 50k*g)  rows(embeddings)=max(500, 20k*g)

Deliberately mirrored data-density properties (they shape the slope):
  * documents text draws from the driver's OWN bounded 31-word
    vocabulary, 10..100 words/doc — so n-gram/shingle collision density
    rises with corpus size exactly as it would if the driver ran its
    recipe at larger sf (a real 100 TB corpus has a growing vocabulary;
    this one does not — SCALE_MEASURED.md discusses the difference);
  * ~0.16% exact-duplicate documents (8 per 5000 at sf0.1);
  * embeddings are unit-norm 64-dim with 10 mild label clusters;
  * events.user_id spans customer/10 users over the same 30-day window.

Everything is deterministic from ``--seed`` + g (numpy Generator per
table). Output: ``<out>/g{g}/{table}.parquet`` (pyarrow, zstd) — kept
INSIDE the repo tree; /root/testdata stays untouched.

Usage: python scripts/make_scale_data.py 0.1 0.3 1.0 [--out DIR]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array(
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window".split())
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["large", "hot", "blue", "red", "small", "dim", "green", "cold"]
P_NOUN = ["ring", "bolt", "nut", "cog", "gear", "pin", "rod", "cap"]
DAY_US = 86_400_000_000  # one day in microseconds


def _rng(seed: int, g: float, table: str) -> np.random.Generator:
    # hashlib, not hash(): str hashing is randomized per process
    # (PYTHONHASHSEED), which would break --seed reproducibility
    key = hashlib.md5(f"{seed}|{round(g * 1000)}|{table}".encode()).digest()
    return np.random.default_rng(int.from_bytes(key[:8], "little"))


def _ts_us(rng, n: int, start: str, days: float) -> pa.Array:
    base = np.datetime64(start, "us").astype("int64")
    off = rng.integers(0, int(days * DAY_US), n)
    return pa.array(base + off, type=pa.timestamp("us"))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"),
                   compression="zstd")


def generate(g: float, out_dir: str, seed: int = 42) -> dict[str, int]:
    os.makedirs(out_dir, exist_ok=True)
    n_cust = round(150_000 * g)
    n_supp = round(10_000 * g)
    n_part = round(200_000 * g)
    n_ord = round(1_500_000 * g)
    n_ev = round(1_000_000 * g)
    n_doc = max(500, round(50_000 * g))
    n_emb = max(500, round(20_000 * g))
    n_users = max(1, n_cust // 10)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    r = _rng(seed, g, "customer")
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(r.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(r.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[
            r.integers(0, 5, n_cust)])}))

    r = _rng(seed, g, "supplier")
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(r.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(r.uniform(-1000, 10_000, n_supp), 2)}))

    r = _rng(seed, g, "part")
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{P_ADJ[int(a)]} {P_NOUN[int(b)]}" for a, b in zip(
            r.integers(0, 8, n_part), r.integers(0, 8, n_part))],
        "p_brand": pa.array([f"Brand#{i}" for i in
                             r.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(P_TYPES)[r.integers(0, 6, n_part)]),
        "p_size": pa.array(r.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(r.uniform(900, 1000, n_part), 2)}))

    r = _rng(seed, g, "orders")
    order_date = _ts_us(r, n_ord, "1995-01-01", 2400)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(r.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
            r.choice(3, n_ord, p=[0.49, 0.49, 0.02])]),
        "o_totalprice": np.round(r.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": order_date,
        "o_orderpriority": pa.array(np.array(PRIORITIES)[
            r.integers(0, 5, n_ord)])}))

    r = _rng(seed, g, "lineitem")
    per_order = r.integers(1, 8, n_ord)  # avg ~4 lines/order
    n_li = int(per_order.sum())
    l_orderkey = np.repeat(np.arange(n_ord), per_order)
    l_linenumber = (np.arange(n_li)
                    - np.repeat(np.cumsum(per_order) - per_order,
                                per_order) + 1)
    ship_off = r.integers(1, 121, n_li) * DAY_US
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(r.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(r.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": r.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(r.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(r.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(r.uniform(0, 0.08, n_li), 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            r.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[
            r.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            order_date.cast(pa.int64()).to_numpy() [l_orderkey] + ship_off,
            pa.timestamp("us"))}))

    r = _rng(seed, g, "events")
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_us(r, n_ev, "2024-01-01", 30),
        "user_id": pa.array(r.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(
            ["click", "view", "purchase", "signup", "error"])[
                r.integers(0, 5, n_ev)]),
        "value": np.round(np.minimum(r.exponential(50.0, n_ev), 560.0), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in
                           r.integers(0, 100, n_ev)])}))

    r = _rng(seed, g, "documents")
    n_words = r.integers(10, 101, n_doc)
    words = r.integers(0, len(VOCAB), int(n_words.sum()))
    texts, pos = [], 0
    for nw in n_words:
        texts.append(" ".join(VOCAB[words[pos:pos + nw]]))
        pos += nw
    for i in range(599, n_doc, 600):  # ~0.16% exact dups, driver-shaped
        texts[i] = texts[i - 1]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(LANGS[r.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    r = _rng(seed, g, "embeddings")
    cent = r.normal(0, 1, (10, 64))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    labels = r.integers(0, 10, n_emb)
    vecs = cent[labels] * 2.0 + r.normal(0, 1, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs.astype("float32")),
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))

    return {"customer": n_cust, "supplier": n_supp, "part": n_part,
            "orders": n_ord, "lineitem": n_li, "events": n_ev,
            "documents": n_doc, "embeddings": n_emb}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scales", nargs="+", type=float)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_scale"))
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    for g in args.scales:
        out_dir = os.path.join(args.out, f"g{g}")
        counts = generate(g, out_dir, args.seed)
        print(json.dumps({"g": g, "dir": out_dir, "rows": counts}))


if __name__ == "__main__":
    main()
