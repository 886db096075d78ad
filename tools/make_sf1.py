"""Materialize an sf1 rehearsal dataset (~10x sf0.1) by deterministic
replication with consistently shifted keys — the driver only ships
sf{0.001,0.01,0.1}, and the oracle gate only needs Spark and DuckDB to read
IDENTICAL files, so replicated data is a valid correctness input at 10x
scale. Dimensions (region/nation/supplier/part) are kept as-is; fact keys
shift by k*max so joins stay consistent.

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/sf1)
"""

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
K = 10

# per-table: columns to shift by k * (their own table's key span)
SHIFTS = {
    "customer": {"c_custkey": "c_custkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_ONLY = ["region", "nation", "supplier", "part"]


def main():
    os.makedirs(OUT, exist_ok=True)
    spans = {}
    for t in ("customer", "orders", "events", "documents", "embeddings"):
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        for c in tab.column_names:
            if c in ("c_custkey", "o_orderkey", "event_id", "user_id",
                     "doc_id", "vec_id"):
                spans[c] = int(pc.max(tab[c]).as_py()) + 1
    for t in COPY_ONLY:
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tab, f"{OUT}/{t}.parquet")
        print(t, tab.num_rows)
    for t, shifts in SHIFTS.items():
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        parts = []
        for k in range(K):
            cols = []
            for c in tab.column_names:
                col = tab[c]
                if c in shifts and k:
                    col = pc.add(col, k * spans[shifts[c]])
                cols.append(col)
            parts.append(pa.table(cols, names=tab.column_names))
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{OUT}/{t}.parquet")
        print(t, big.num_rows)


if __name__ == "__main__":
    main()
