#!/usr/bin/env python
"""Oracle column-TYPE audit: Spark result schema vs DuckDB oracle types.

The driver's correctness compare sorts columns by name and hashes VALUES
type-sensitively, while tools/verify_oracles.py normalizes floats — so a
DuckDB DECIMAL (bare VALUES literal, un-CAST aggregate) against a Spark
double could pass the local gate yet fail the driver's hash. This audit
closes that gap: every oracle's column set and canonicalized types must
match the Spark DataFrame exactly.

Usage: python tools/type_audit.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402


def canon_spark(dt) -> str:
    s = dt.simpleString()
    return {
        "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
        "double": "float", "float": "float", "string": "str",
        "boolean": "bool", "timestamp": "ts", "timestamp_ntz": "ts",
        "date": "date",
    }.get(s, s)


def canon_duck(t) -> str:
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return "decimal"  # always a mismatch: oracles must CAST to DOUBLE
    if t == "HUGEINT":
        # DuckDB SUM(BIGINT/INT) widens to int128; Spark has no int128, and
        # the driver hashes values type-sensitively — oracles must CAST to
        # BIGINT (or DOUBLE). Treat like DECIMAL: always a mismatch.
        return "hugeint"
    return {
        "BIGINT": "int", "INTEGER": "int", "SMALLINT": "int",
        "TINYINT": "int", "DOUBLE": "float",
        "FLOAT": "float", "REAL": "float", "VARCHAR": "str",
        "BOOLEAN": "bool", "TIMESTAMP": "ts", "DATE": "date",
    }.get(t, t.lower())


def main() -> int:
    import __spark_entry__ as entrymod
    from tdigest_spark.sources.tables import TABLES, get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", app_name="type-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    bad = 0
    for name, sql in sorted(oracles.items()):
        sdf = qs[name](spark, sf_dir)
        stypes = {f.name: canon_spark(f.dataType) for f in sdf.schema.fields}
        rel = con.sql(sql)
        dtypes = {c: canon_duck(t) for c, t in zip(rel.columns, rel.types)}
        if set(stypes) != set(dtypes):
            print(f"MISMATCH {name}: columns {sorted(stypes)} vs {sorted(dtypes)}")
            bad += 1
            continue
        diff = {c: (stypes[c], dtypes[c]) for c in stypes if stypes[c] != dtypes[c]}
        if diff:
            print(f"MISMATCH {name}: {diff}")
            bad += 1
        else:
            print(f"ok   {name}")
    spark.stop()
    if bad:
        print(f"\n{bad} TYPE MISMATCHES")
        return 1
    print("\nALL ORACLE TYPES MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
