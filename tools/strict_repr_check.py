"""Strict representation sweep: beyond check_entry's value-tolerant
comparison, render BOTH engines' frames to one canonical CSV (sorted
columns, sorted rows) and compare byte-for-byte — the closest local
stand-in for a representation-sensitive hash gate. Reports per query:
csv_equal plus any residual pandas-dtype differences.

Usage: python tools/strict_repr_check.py [sf_dir] [names...]
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from traval_spark.session import get_spark
    spark = get_spark("strict-repr", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from '{p}'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    def canon(df):
        df = df[sorted(df.columns)].copy()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    bad = []
    ran = 0
    for name in qs:
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            a = canon(qs[name](spark, sf_dir).toPandas())
            b = canon(con.sql(oracles[name]).df())
        except Exception as e:
            bad.append((name, f"ERROR {str(e)[:120]}"))
            continue
        ran += 1
        ha = hashlib.md5(a.to_csv(index=False).encode()).hexdigest()
        hb = hashlib.md5(b.to_csv(index=False).encode()).hexdigest()
        if ha != hb:
            la = a.to_csv(index=False).splitlines()
            lb = b.to_csv(index=False).splitlines()
            diff = next(((x, y) for x, y in zip(la, lb) if x != y),
                        ("<len>", f"{len(la)} vs {len(lb)}"))
            bad.append((name, f"CSV DIFF spark={diff[0][:90]} "
                              f"oracle={diff[1][:90]}"))
            print(f"DIFF {name}: {diff[0][:80]} | {diff[1][:80]}",
                  flush=True)
        else:
            dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
                  if str(a[c].dtype) != str(b[c].dtype)]
            print(f"  ok {name}" + (f"  (dtype-only: {dt})" if dt else ""),
                  flush=True)
    print(f"\nran={ran} csv_mismatches={len(bad)}")
    for n, d in bad:
        print(f"  - {n}: {d}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
