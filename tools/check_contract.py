"""Pre-flight mirror of the grading driver: run every __spark_entry__
queries() entry and its oracle_sql() through DuckDB at a given sf dir,
compare row count, column names, and exact (order-insensitive) values.

Usage: python tools/check_contract.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style: exact float repr after both sides rounded
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .appName("contract-check")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        import re
        if name_filter and not re.search(name_filter, name):
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            fails.append((name, f"SPARK ERROR: {e}"))
            print(f"{name:24s} SPARK ERROR: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):6d} (no oracle — rows-only)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            fails.append((name, f"ORACLE ERROR: {e}"))
            print(f"{name:24s} ORACLE ERROR: {str(e)[:200]}")
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orw = norm_rows(ocols, orows)
        if sc != oc:
            fails.append((name, f"SCHEMA {sc} vs {oc}"))
            print(f"{name:24s} SCHEMA MISMATCH {sc} vs {oc}")
        elif sr != orw:
            diff_n = sum(1 for a, b in zip(sr, orw) if a != b)
            fails.append((name, f"VALUES ({len(sr)} vs {len(orw)} rows, "
                                f"{diff_n} differing)"))
            print(f"{name:24s} VALUE MISMATCH rows {len(sr)} vs {len(orw)}")
            for a, b in list(zip(sr, orw))[:5]:
                if a != b:
                    print("   spark:", a)
                    print("   duck :", b)
        else:
            print(f"{name:24s} OK rows={len(sr)}")
    print()
    if fails:
        print(f"FAILED: {len(fails)}")
        for n, m in fails:
            print(" -", n, m[:200])
        sys.exit(1)
    print("ALL OK")
    spark.stop()


if __name__ == "__main__":
    main()
