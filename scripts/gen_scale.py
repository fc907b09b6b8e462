"""Generate an sf1 sibling of the driver's sf0.1 fixtures for the scale
proof-point (COVERAGE.md §scale): 10 deterministic replicas of every
table with per-replica key offsets, preserving referential integrity
(orders.o_custkey shifts by the same customer offset as c_custkey, etc.).

This is a THROUGHPUT probe, not a correctness oracle — the per-query
oracles stay at sf0.01/sf0.001.  Distribution shape is preserved by
construction (each replica is the sf0.1 distribution verbatim); text and
keys are perturbed per replica so dedup/similarity families see realistic
near-dup structure (each doc has 9 high-similarity siblings) rather than
degenerate exact clones.

Usage: python scripts/gen_scale.py [out_dir] [replicas]
(default /root/repo/.scale/sf1, 10 replicas; 30 replicas ≙ an sf3
sibling for the second scale point).  Writes one parquet per table;
~0.5 GB total at sf1.  The output dir is gitignored.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# (table, [(col, offset_key)]) — offset_key names the key-space whose max
# drives the per-replica shift; None columns pass through.
SHIFTS: dict[str, dict[str, str]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "ev", "user_id": "cust"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

KEY_MAX_SQL = {
    "cust": "SELECT MAX(c_custkey) FROM read_parquet('{s}/customer.parquet')",
    "supp": "SELECT MAX(s_suppkey) FROM read_parquet('{s}/supplier.parquet')",
    "part": "SELECT MAX(p_partkey) FROM read_parquet('{s}/part.parquet')",
    "ord": "SELECT MAX(o_orderkey) FROM read_parquet('{s}/orders.parquet')",
    "ev": "SELECT MAX(event_id) FROM read_parquet('{s}/events.parquet')",
    "doc": "SELECT MAX(doc_id) FROM read_parquet('{s}/documents.parquet')",
    "vec": "SELECT MAX(vec_id) FROM read_parquet('{s}/embeddings.parquet')",
}


def main() -> int:
    global REPLICAS
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    if len(sys.argv) > 2:
        REPLICAS = int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    offs = {
        k: con.execute(q.format(s=SRC)).fetchone()[0] + 1
        for k, q in KEY_MAX_SQL.items()
    }
    for table, shifts in SHIFTS.items():
        src = f"read_parquet('{SRC}/{table}.parquet')"
        dst = os.path.join(out, f"{table}.parquet")
        if not shifts:  # fixed dimensions copy through once
            con.execute(f"COPY (SELECT * FROM {src}) TO '{dst}' (FORMAT PARQUET)")
            continue
        cols = [
            c[0]
            for c in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        ]
        sel = []
        for c in cols:
            if c in shifts:
                sel.append(f"{c} + r.i * {offs[shifts[c]]} AS {c}")
            elif table == "documents" and c == "text":
                # Per-replica tail perturbation: families of 10 near-dups,
                # not exact clones (realistic dedup workload at scale).
                sel.append("text || ' r' || r.i AS text")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM {src}, "
            f"(SELECT UNNEST(range({REPLICAS})) AS i) r) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
    for table in SHIFTS:
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
