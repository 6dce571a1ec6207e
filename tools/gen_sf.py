"""Deterministic scale-factor data generator for local scaling-slope runs.

The driver ships read-only testdata at sf0.001/0.01/0.1 (TESTDATA.md) but the
100x-scale story needs at least one more order of magnitude of real rows.
This generator reproduces the driver tables' schemas and marginal
distributions (profiled from /root/testdata/sf0.1 — row-count ratios, value
ranges, category frequencies) at arbitrary sf, writing under
/root/repo/localdata/sf{sf}/.  It is NOT the driver's generator and makes no
attempt to match its rows bit-for-bit; the scaling bench only needs the same
shape, cardinality profile and datatypes.

Row-count model (profiled):
    region 5, nation 25 (fixed)
    customer 150_000*sf   supplier 10_000*sf   part 200_000*sf
    orders 1_500_000*sf   lineitem ~6_000_000*sf (Poisson 4 lines/order, 1..17)
    events 1_000_000*sf   documents max(500, 50_000*sf)
    embeddings max(500, 20_000*sf)

Usage: python tools/gen_sf.py 1        # writes /root/repo/localdata/sf1
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB = (
    "batch part spark line column order small sort fast value scan query agg "
    "table hash slow filter customer stream key group join shuffle plan stage "
    "task executor driver broadcast window frame merge index vector cache disk "
    "memory codegen parquet arrow"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
PNOUNS = ["ring", "bolt", "screw", "gear", "pin", "rod", "cap", "nut"]
PADJ = ["large", "hot", "cold", "small", "round", "flat", "long", "short"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY = np.timedelta64(1, "D").astype("timedelta64[us]")


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    # small row groups so Spark can split the single file across cores
    # (a task maps to the row groups whose start offset falls in its byte
    # range — pyarrow's default 1M-row groups would cap lineitem at ~6
    # scan tasks)
    pq.write_table(
        table, os.path.join(out_dir, f"{name}.parquet"), row_group_size=131_072
    )
    print(f"  {name}: {table.num_rows} rows")


def _ts(base: str, offsets_us: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us")
    return pa.array(base_us + offsets_us.astype("timedelta64[us]"))


def generate(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS),
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10_000, n_cust), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10_000, n_supp), 2)),
    }))
    pk = np.arange(n_part, dtype=np.int64)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(pk),
        "p_name": pa.array([
            f"{PADJ[a]} {PNOUNS[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(900.0 + (pk % 1000) * 0.1, 2)),
    }))

    ok = np.arange(n_orders, dtype=np.int64)
    odate_off = rng.integers(0, 2404, n_orders) * DAY  # 1995-01-01 .. ~2001-08
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(ok),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders).astype(np.int64)),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_orders)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500_000, n_orders), 2)),
        "o_orderdate": _ts("1995-01-01", odate_off),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_orders)]),
    }))

    # lineitem: Poisson(4) lines per order, clipped to 1..17 like the profile
    lines_per = np.clip(rng.poisson(4.0, n_orders), 1, 17)
    l_orderkey = np.repeat(ok, lines_per)
    n_li = l_orderkey.shape[0]
    l_linenumber = (np.arange(n_li) - np.repeat(np.cumsum(lines_per) - lines_per, lines_per) + 1)
    ship_off = (rng.integers(1, 96, n_li) + np.repeat(odate_off.astype(np.int64) // DAY.astype(np.int64), lines_per)) * DAY
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li).astype(np.int64)),
        "l_linenumber": pa.array(np.minimum(l_linenumber, 7).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105_000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2)),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts("1995-01-01", ship_off),
    }))

    ev_off = np.sort(rng.integers(0, 30 * 86_400_000_000, n_events))  # one month of us offsets
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
        "ts": _ts("2024-01-01", ev_off),
        "user_id": pa.array(rng.integers(0, max(n_cust // 10, 1), n_events).astype(np.int64)),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_events)]),
        "value": pa.array(np.round(np.minimum(rng.exponential(50.0, n_events), 600.0), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)]),
    }))

    # documents: bags of VOCAB words, ~0.2% exact duplicates + a few near-dups
    lens = rng.integers(8, 90, n_docs)
    words = np.array(VOCAB)
    texts = [" ".join(words[rng.integers(0, len(words), L)]) for L in lens]
    n_dup = max(4, n_docs // 500)
    dup_src = rng.integers(0, n_docs, n_dup)
    dup_dst = rng.integers(0, n_docs, n_dup)
    for s, d in zip(dup_src, dup_dst):
        texts[d] = texts[s]                      # exact duplicate
    for s, d in zip(dup_src, (dup_dst + 1) % n_docs):
        toks = texts[s].split()
        if len(toks) > 3:
            toks[len(toks) // 2] = str(words[rng.integers(0, len(words))])
        texts[d] = " ".join(toks)                # near-duplicate
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_docs, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_docs)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    # r14: the structured ANN fixture (clustered + anisotropic) — the
    # NUMPY TWIN of similarity.structured_embeddings (same float64 ops
    # in the same order, bit-parity pinned in tests); materialized here
    # so sweeps can read it, derived on the fly everywhere else
    mu_rng = np.random.default_rng(24)
    mu = mu_rng.standard_normal((10, 64))
    mu /= np.linalg.norm(mu, axis=1, keepdims=True)
    # iterative multiply, not pow() — bit-twins the Spark derivation
    # (libm pow is not correctly rounded; cumprod is left-to-right)
    scale = np.cumprod(np.concatenate([[1.0], np.full(63, 0.92)]))
    emb_s = mu[labels % 10] + vecs.astype(np.float64) * scale
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels),
        "embedding_s": pa.array(list(emb_s), type=pa.list_(pa.float64())),
    }))

    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump({"sf": sf, "seed": SEED, "generator": "tools/gen_sf.py"}, f)


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    sf_name = ("%g" % sf)
    out = os.path.join("/root/repo/localdata", f"sf{sf_name}")
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
    print("done")
