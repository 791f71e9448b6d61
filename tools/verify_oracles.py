"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
schema width, and exact sorted values. Usage:
    python tools/verify_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402


def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # 12 significant digits, not absolute decimals: an absolute
        # round(v, 9) is bit-exact for 1e8-scale aggregates (flaky on
        # summation-order noise) yet sloppy for tiny values
        return float(f"{v:.12g}")
    return v


def main() -> int:
    import __spark_entry__ as entrymod
    from tdigest_spark.sources.tables import TABLES, get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(master="local[8]", app_name="verify", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd filter must not let THE gate exit 0 having checked nothing
        print(f"ERROR: unknown queries: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            spark_vals = sorted(
                (tuple(norm(r[c]) for c in scols) for r in srows), key=repr
            )
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"pass {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = sorted(orel.columns)
            orows = orel.fetchall()
            colidx = [orel.columns.index(c) for c in ocols]
            # key=repr: None/mixed-type tuples aren't orderable in Python;
            # repr gives a total order consistent across both engines after
            # normalization (the driver's hash compare is order-insensitive)
            oracle_vals = sorted(
                (tuple(norm(r[i]) for i in colidx) for r in orows), key=repr
            )
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        if scols != ocols:
            failures.append(name)
            print(f"FAIL {name}: schema {scols} vs {ocols}")
        elif len(spark_vals) != len(oracle_vals):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(spark_vals)} vs {len(oracle_vals)}")
            for a, b in list(zip(spark_vals, oracle_vals))[:3]:
                print("   spark ", a, "\n   oracle", b)
        elif spark_vals != oracle_vals:
            failures.append(name)
            bad = [
                (a, b)
                for a, b in zip(spark_vals, oracle_vals)
                if a != b
            ]
            print(f"FAIL {name}: {len(bad)}/{len(spark_vals)} rows differ")
            for a, b in bad[:4]:
                print("   spark ", a, "\n   oracle", b)
        else:
            print(f"PASS {name}: rows={len(spark_vals)}")
    spark.stop()
    if failures:
        print("\nFAILED:", ", ".join(failures))
        return 1
    print("\nALL ORACLE CHECKS PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
