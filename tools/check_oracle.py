"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB, compare row count,
column names, and order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from sgpt_spark.session import get_spark  # noqa: E402
from sgpt_spark.sources.tables import TABLES  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


# DuckDB type name -> Spark simpleString, for the type parity check.
# The driver's hash canonicalizer is TYPE-sensitive (round-2 lesson:
# DuckDB sum() widening to HUGEINT hash-mismatched against Spark
# BIGINT even with identical values), so any pair outside this map or
# mapping to a different Spark type is flagged.
_DUCK2SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
}


def compare(name, sdf, sql, con):
    spark_rows = sdf.collect()
    spark_cols = sorted(sdf.columns)
    duck = con.sql(sql)
    duck_cols_raw = list(duck.columns)
    duck_types_raw = [str(t) for t in duck.types]
    duck_rows = duck.fetchall()
    duck_cols = sorted(duck_cols_raw)
    ok = True
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    for c, dt in zip(duck_cols_raw, duck_types_raw):
        st = spark_types.get(c)
        if st is None:
            continue  # schema mismatch reported below
        mapped = _DUCK2SPARK.get(dt.split("(")[0])
        if mapped != st:
            print(f"  [{name}] TYPE MISMATCH col={c} spark={st} duck={dt}")
            ok = False
    if spark_cols != duck_cols:
        print(f"  [{name}] SCHEMA MISMATCH spark={spark_cols} duck={duck_cols}")
        ok = False
    if len(spark_rows) != len(duck_rows):
        print(f"  [{name}] ROWCOUNT MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}")
        ok = False
    if ok:
        def row_key(row):
            # None-safe total order (drivers canonicalize with pandas,
            # which handles NaN; plain tuple sort does not)
            return tuple((v is None, v) for v in row)

        s_set = sorted(
            (tuple(norm_cell(r[c]) for c in spark_cols) for r in spark_rows),
            key=row_key,
        )
        d_idx = [duck_cols_raw.index(c) for c in duck_cols]
        d_set = sorted(
            (tuple(norm_cell(r[i]) for i in d_idx) for r in duck_rows), key=row_key
        )
        if s_set != d_set:
            ok = False
            diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
            print(f"  [{name}] VALUE MISMATCH, first diffs: {diffs}")
    print(f"  [{name}] {'OK' if ok else 'FAIL'} rows={len(spark_rows)}")
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional: check just these query names
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        if name in oracles:
            if not compare(name, sdf, oracles[name], con):
                failures.append(name)
        else:
            n = sdf.count()
            print(f"  [{name}] rows-only check rows={n}")
            if n < 0:
                failures.append(name)
        print(f"    ({time.time() - t0:.1f}s)")
    print("FAILURES:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
