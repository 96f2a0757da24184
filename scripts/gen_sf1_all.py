#!/usr/bin/env python3
"""Generate a FULL sf1-equivalent dataset (all 10 tables) under
target/sf1 for the whole-suite scale bench (PLANS.md round 10).

Relational tables + events are 10x key-shifted replicas of sf0.1:
each copy i offsets every key column by i * (max_key + 1) of its
table, so FK relationships (orders->customer, lineitem->orders/part/
supplier, events per-user histories) hold within each replica and the
join/window cardinality shapes scale the way real 10x data would.
Region/nation stay fixed (dimensions). documents/embeddings come from
gen_sf1.py (same vocab/Zipf/dup-planting as sf0.1, seed 421).

Dev tooling only (like check_oracle.py) - not part of the library.
"""
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "target/sf1"
COPIES = 10

# table -> key columns to shift, each by its own table's stride so
# references line up across tables
STRIDES = {}


def stride(table, col):
    key = (table, col)
    if key not in STRIDES:
        t = pq.read_table(f"{SRC}/{table}.parquet", columns=[col])
        STRIDES[key] = pc.max(t[col]).as_py() + 1
    return STRIDES[key]


# col -> (home table, home col) giving the stride to use
SHIFTS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey"),
                 "l_suppkey": ("supplier", "s_suppkey")},
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
}


def replicate(table):
    t = pq.read_table(f"{SRC}/{table}.parquet")
    t = t.replace_schema_metadata(None)
    shifts = SHIFTS.get(table, {})
    chunks = []
    for i in range(COPIES):
        cols = []
        for name in t.column_names:
            c = t[name]
            if name in shifts and i > 0:
                ht, hc = shifts[name]
                c = pc.add(c, i * stride(ht, hc))
            cols.append(c)
        chunks.append(pa.table(dict(zip(t.column_names, cols)),
                               schema=t.schema if not shifts else None))
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{DST}/{table}.parquet",
                   row_group_size=max(len(out) // 32, 1024))
    print(f"{table}: {len(t)} -> {len(out)}")


def main():
    os.makedirs(DST, exist_ok=True)
    for table in ["region", "nation"]:
        t = pq.read_table(f"{SRC}/{table}.parquet")
        pq.write_table(t.replace_schema_metadata(None),
                       f"{DST}/{table}.parquet")
        print(f"{table}: {len(t)} (dimension, unscaled)")
    for table in ["customer", "supplier", "part", "orders", "lineitem",
                  "events"]:
        replicate(table)
    if not (os.path.exists(f"{DST}/documents.parquet")
            and os.path.exists(f"{DST}/embeddings.parquet")):
        subprocess.run([sys.executable, "scripts/gen_sf1.py"], check=True)
    print("done")


if __name__ == "__main__":
    main()
