"""Builder-side measurement tool: regenerate a DRIVER-SHAPED scale
factor directory at an arbitrary sf (the driver's escalated bench runs
at sf1.0, which is not kept under /root/testdata between rounds).

Replicates the deterministic synthetic schema documented in TESTDATA.md
by matching the published per-sf cardinalities and the measured column
distributions of the committed sf0.001/0.01/0.1 directories:

  documents   max(500, 50000*sf) rows; 20 round-robin sources; text =
              10..100 uniform words over a 30-word vocabulary; ~5% of
              docs carry one rare 'dup' token; 0.16% of texts are
              exact duplicates; lang ~ {en:.4, zh/es/fr/de:.15}
  embeddings  max(500, 20000*sf) unit-norm 64-dim float32, label 0..9
  events      1e6*sf rows over a fixed 30-day span; 15000*sf users
  lineitem    6e6*sf; orders 1.5e6*sf; customer 1.5e5*sf;
              part 2e5*sf; supplier 1e4*sf; nation 25; region 5

This is NOT byte-identical to the driver's generator (seeds differ);
it reproduces the distributions that drive plan shapes and per-row
costs, which is what before/after measurement needs. It never touches
/root/testdata (read-only per TESTDATA.md).

Usage: python scripts/gen_sf_replica.py <out_dir> <sf>
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(t: pa.Table, path: str) -> None:
    # the driver writes each table as ONE row group (measured on the
    # committed sf dirs) — the narrow-scan regime _widen_if_narrow
    # exists for; keep the replica equally adversarial
    pq.write_table(t, path, row_group_size=max(1, t.num_rows))

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    wc = rng.integers(10, 101, n)
    widx = rng.integers(0, len(VOCAB), int(wc.sum()))
    offs = np.concatenate(([0], np.cumsum(wc)))
    varr = np.array(VOCAB)
    texts = [" ".join(varr[widx[offs[i]:offs[i + 1]]]) for i in range(n)]
    # ~5% of docs carry one rare 'dup' token (inserted, as measured)
    for i in rng.choice(n, max(1, n // 20), replace=False):
        ws = texts[i].split(" ")
        ws.insert(int(rng.integers(0, len(ws))), "dup")
        texts[i] = " ".join(ws)
    # 0.16% exact-duplicate texts (8 pairs per 5000 docs at sf0.1)
    k = max(1, round(n * 0.0016))
    srcs = rng.choice(n, 2 * k, replace=False)
    for a, b in zip(srcs[:k], srcs[k:]):
        texts[int(b)] = texts[int(a)]
    langs = rng.choice(
        np.array(["en", "zh", "es", "fr", "de"]),
        n,
        p=[0.4, 0.15, 0.15, 0.15, 0.15],
    )
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n), pa.int32()),
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    span_us = 30 * 86400 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, n)) + np.int64(1704067200000000)
    types = rng.choice(
        np.array(["click", "view", "purchase", "signup", "error"]), n
    )
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array(np.round(rng.uniform(0, 561, n), 2)),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)]
            ),
        }
    )


def gen_tpch(rng: np.random.Generator, sf: float, out: str) -> None:
    n_cust = max(100, int(150_000 * sf))
    n_supp = max(50, int(10_000 * sf))
    n_part = max(100, int(200_000 * sf))
    n_ord = max(150, int(1_500_000 * sf))
    n_li = max(600, int(6_000_000 * sf))
    day_us = 86400 * 1_000_000

    _write(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array([f"NATION{i:02d}" for i in range(25)]),
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        f"{out}/nation.parquet",
    )
    _write(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
                ),
            }
        ),
        f"{out}/region.parquet",
    )
    _write(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)]
                ),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-1000, 10000, n_cust), 2)
                ),
                "c_mktsegment": pa.array(
                    rng.choice(
                        np.array(
                            ["AUTOMOBILE", "BUILDING", "FURNITURE",
                             "HOUSEHOLD", "MACHINERY"]
                        ),
                        n_cust,
                    )
                ),
            }
        ),
        f"{out}/customer.parquet",
    )
    _write(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(n_supp)]
                ),
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-1000, 10000, n_supp), 2)
                ),
            }
        ),
        f"{out}/supplier.parquet",
    )
    _write(
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": pa.array([f"part {i}" for i in range(n_part)]),
                "p_brand": pa.array(
                    [f"Brand#{i % 25 + 11}" for i in range(n_part)]
                ),
                "p_type": pa.array(
                    rng.choice(
                        np.array(
                            ["STANDARD", "SMALL", "MEDIUM", "LARGE",
                             "ECONOMY", "PROMO"]
                        ),
                        n_part,
                    )
                ),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": pa.array(
                    np.round(rng.uniform(900, 1000, n_part), 2)
                ),
            }
        ),
        f"{out}/part.parquet",
    )
    odate = (
        rng.integers(0, 2405, n_ord) * day_us + np.int64(788918400000000)
    )
    _write(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
                "o_orderstatus": pa.array(
                    rng.choice(np.array(["O", "F", "P"]), n_ord)
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(900, 500000, n_ord), 2)
                ),
                "o_orderdate": pa.array(odate, pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    rng.choice(
                        np.array(
                            ["1-URGENT", "2-HIGH", "3-MEDIUM",
                             "4-NOT SPECIFIED", "5-LOW"]
                        ),
                        n_ord,
                    )
                ),
            }
        ),
        f"{out}/orders.parquet",
    )
    sdate = (
        rng.integers(1, 2500, n_li) * day_us + np.int64(788918400000000)
    )
    _write(
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
                "l_quantity": pa.array(
                    rng.integers(1, 51, n_li).astype(np.float64)
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900, 105000, n_li), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, n_li) / 100.0, 2)
                ),
                "l_tax": pa.array(
                    np.round(rng.integers(0, 9, n_li) / 100.0, 2)
                ),
                "l_returnflag": pa.array(
                    rng.choice(np.array(["A", "N", "R"]), n_li)
                ),
                "l_linestatus": pa.array(
                    rng.choice(np.array(["O", "F"]), n_li)
                ),
                "l_shipdate": pa.array(sdate, pa.timestamp("us")),
            }
        ),
        f"{out}/lineitem.parquet",
    )


def main() -> None:
    out, sf = sys.argv[1], float(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260822)
    _write(
        gen_documents(rng, max(500, int(50_000 * sf))),
        f"{out}/documents.parquet",
    )
    _write(
        gen_embeddings(rng, max(500, int(20_000 * sf))),
        f"{out}/embeddings.parquet",
    )
    _write(
        gen_events(rng, int(1_000_000 * sf), max(15, int(15_000 * sf))),
        f"{out}/events.parquet",
    )
    gen_tpch(rng, sf, out)
    open(f"{out}/_DONE", "w").write("replica\n")
    print(f"wrote {out} at sf={sf}")


if __name__ == "__main__":
    main()
