"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir; compare row count, column names, and order-insensitive
cell values (exact string equality after canonical formatting — stricter
than the driver's hash).

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s.replace("+00:00", "").replace("T", " ")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from code_indexer_spark.session import get_spark

    spark = get_spark("oracle-compare")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # a typo'd query name must FAIL the gate, not silently skip
    # everything and print a false-green "0 pass, 0 fail"
    unknown = only - set(queries)
    if unknown:
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows ({dt:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = canon_rows(scols, [tuple(r) for r in srows])
        dc, dr = canon_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duckdb={len(dr)}")
            n_fail += 1
            continue
        if sr != dr:
            bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: {sum(1 for a, b in zip(sr, dr) if a != b)} "
                  f"differing rows of {len(sr)}; cols={sc}; first: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sr)} rows ({dt:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
