#!/usr/bin/env python3
"""Dev-only harness (not part of the engine): build the 10x replica corpus
used by SCALING.md from an sf directory.

Methodology (fixed since round 5): 10 replicas per row. Documents re-key
doc_id and prefix replica k>0 text with a `repK` token (every row lands in a
10-member near-dup group -- the dup-dense profile of a real crawl).
Embeddings perturb each component with ~sigma=0.02 uniform noise. Events,
orders and lineitem re-key their event/order ids (order ids consistently
across both fact tables, so joins still match); user/cust/part/supp keys are
kept, which preserves the reference tables and makes per-user windows the
documented worst case (10x rows per group). Dim tables copy through as-is.

Events `ts` is written as a raw ns-epoch BIGINT -- the same LONG shape
Spark's nanosAsLong conf yields from the driver's TIMESTAMP(NANOS) parquet,
so `graft.Tables.events` reads both identically.

An optional third argument scales the replica count (default 10) for the
30x-100x spot runs -- same construction, more replicas per row:

Usage: python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/sf1x10 [factor]
"""
import shutil, sys
from pathlib import Path

import duckdb

KEYSPAN = 1_000_000_000  # replica k shifts re-keyed ids by k * KEYSPAN

def main(src: str, dst: str, reps: int = 10) -> None:
    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SELECT setseed(0.42)")
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({reps})) AS k")

    def build(table: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql.format(src=f'{src}/{table}.parquet')}) "
            f"TO '{dst}/{table}.parquet' (FORMAT parquet)"
        )
        print(f"  {table}: ", con.sql(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0], "rows")

    build("documents", f"""
        SELECT doc_id + k * {KEYSPAN} AS doc_id,
               CASE WHEN k = 0 THEN text ELSE 'rep' || k || ' ' || text END AS text,
               lang, source,
               CAST(len(CASE WHEN k = 0 THEN text ELSE 'rep' || k || ' ' || text END) AS BIGINT) AS n_chars
        FROM '{{src}}' CROSS JOIN reps""")
    build("embeddings", f"""
        SELECT vec_id + k * {KEYSPAN} AS vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE list_transform(embedding,
                         x -> CAST(x + 0.069 * (random() - 0.5) AS FLOAT)) END AS embedding,
               label
        FROM '{{src}}' CROSS JOIN reps""")
    build("events", f"""
        SELECT event_id + k * {KEYSPAN} AS event_id,
               epoch_ns(ts) AS ts, user_id, event_type, value, props
        FROM '{{src}}' CROSS JOIN reps""")
    build("orders", f"""
        SELECT o_orderkey + k * {KEYSPAN} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{{src}}' CROSS JOIN reps""")
    build("lineitem", f"""
        SELECT l_orderkey + k * {KEYSPAN} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{{src}}' CROSS JOIN reps""")
    for dim in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(f"{src}/{dim}.parquet", f"{dst}/{dim}.parquet")
        print(f"  {dim}: copied")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
