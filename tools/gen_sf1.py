"""Generate an sf1.0 stress tier (~6M lineitem rows) from sf0.1 (round-7).

The driver materializes sf{0.001,0.01,0.1}; every scale claim above sf0.1
was extrapolated from plan shape until this tier.  Each table replicates
10× with KEY OFFSETS so referential joins keep their fan-out (orderkey/
custkey/partkey/suppkey offset in lockstep), timestamps stay in range so
event-time density scales 10× (the axis that stresses rolling/dynamic
windows), and document text gets a per-replica suffix so near-dup rates
match the base corpus instead of exploding 10× exact clusters.

Usage: python tools/gen_sf1.py [out_dir]    (default /tmp/plsq_sf1.0)
DuckDB does the heavy lifting — no Spark session needed.
"""

from __future__ import annotations

import os
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plsq_sf1.0"
SRC = "/root/testdata/sf0.1"
REPL = 10

# per-table key columns to offset, with the base-table max providing the
# stride; (column, stride_table, stride_column)
PLAN = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [("o_orderkey", "orders", "o_orderkey"),
               ("o_custkey", "customer", "c_custkey")],
    "lineitem": [("l_orderkey", "orders", "o_orderkey"),
                 ("l_partkey", "part", "p_partkey"),
                 ("l_suppkey", "supplier", "s_suppkey")],
    "events": [("event_id", "events", "event_id"),
               ("user_id", "events", "user_id")],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}


def main():
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    strides = {}
    for t in PLAN:
        for _c, st, sc in PLAN[t]:
            key = (st, sc)
            if key not in strides:
                strides[key] = con.execute(
                    f"SELECT max({sc}) + 1 FROM "
                    f"read_parquet('{SRC}/{st}.parquet')").fetchone()[0]
    for t, offsets in PLAN.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if not offsets and t in ("region", "nation"):
            con.execute(f"COPY (SELECT * FROM {src}) TO "
                        f"'{OUT}/{t}.parquet' (FORMAT PARQUET)")
            print(f"{t}: copied")
            continue
        parts = []
        for i in range(REPL):
            sel = []
            cols = [d[0] for d in con.execute(
                f"DESCRIBE SELECT * FROM {src}").fetchall()]
            off = {c: i * strides[(st, sc)] for c, st, sc in offsets}
            for c in cols:
                if c in off:
                    sel.append(f"({c} + {off[c]}) AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    # suffix keeps near-dup rates at the base corpus level
                    sel.append(f"(text || ' r{i}') AS text")
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM {src}")
        con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                    f"'{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
