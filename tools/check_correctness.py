"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir;
compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # full precision — exact match required
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry_mod
    from lucene_solr_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("check_correctness", cores=8)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    failures = []
    for name in sorted(qs):
        if name_filter and name not in name_filter:
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        skey = frame_key(scols, [[r[c] for c in scols] for r in srows])
        okey = frame_key(ocols, [list(r) for r in orows])
        ok_values = skey == okey
        status = "ok" if (ok_count and ok_schema and ok_values) else "FAIL"
        print(
            f"{status:5} {name}: rows {len(srows)}/{len(orows)} "
            f"schema {'=' if ok_schema else scols + ['|'] + ocols} values {'=' if ok_values else 'DIFFER'}"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_count and ok_schema:
                for i, (a, b) in enumerate(zip(skey, okey)):
                    if a != b:
                        print(f"      first diff row {i}:\n        spark={a}\n        duck ={b}")
                        break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
