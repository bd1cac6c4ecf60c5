"""Driver-style correctness gate, runnable locally: execute every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, compare row count, column names,
and a value hash (columns sorted by name, rows sorted by their string
form, floats rounded to 6 significant decimals — the same normalisation
the round driver applies).

Usage: python scripts/check_oracles.py [sf_dir] [only_prefix ...]
       python scripts/check_oracles.py [sf_dir] --names names.json --out results.json

``--names``: JSON list of EXACT query names to run (the window-file
workflow — prefix matching would over-match).  ``--out``: where to write
the results JSON (default /tmp/oracle_check.json).
"""
from __future__ import annotations

import json
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    import hashlib

    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    args = sys.argv[1:]
    out_path = "/tmp/oracle_check.json"
    names = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i:i + 2]
    if "--names" in args:
        i = args.index("--names")
        names = set(json.load(open(args[i + 1])))
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1:]
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("check_oracles")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    os_ = entry.oracle_sql()
    results = {}
    failed = []
    for name, fn in qs.items():
        if names is not None and name not in names:
            continue
        if only and not any(name.startswith(p) for p in only):
            continue
        rec = {}
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(rows)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"spark: {type(e).__name__}: {e}"
            results[name] = rec
            failed.append(name)
            print(f"FAIL {name}: {rec['err'][:200]}")
            continue
        if name not in os_:
            rec["err"] = "no_oracle"
            results[name] = rec
            print(f"skip {name}: no_oracle rows={len(rows)}")
            continue
        try:
            cur = con.execute(os_[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"oracle: {type(e).__name__}: {e}"
            results[name] = rec
            failed.append(name)
            print(f"FAIL {name}: {rec['err'][:200]}")
            continue
        rec["oracle_rows"] = len(orows)
        rec["rows_match"] = len(rows) == len(orows)
        rec["schema_match"] = sorted(cols) == sorted(ocols)
        rec["hash_match"] = (
            rec["rows_match"]
            and rec["schema_match"]
            and frame_hash(cols, rows) == frame_hash(ocols, orows)
        )
        results[name] = rec
        ok = rec["hash_match"]
        if not ok:
            failed.append(name)
        print(("ok   " if ok else "FAIL ") + f"{name} rows={len(rows)}/{len(orows)} "
              f"schema={rec['schema_match']} hash={rec['hash_match']}")
    print(f"\n{len(results) - len(failed)}/{len(results)} green; failed: {failed}")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
