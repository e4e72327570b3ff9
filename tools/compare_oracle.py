"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given SF dir and
compares row count, schema width, and order-insensitive values against
the DuckDB oracle. Values are compared exactly after canonicalization
(columns sorted by name, rows sorted, floats repr'd at full precision) —
stricter than a hash, so passing here should imply passing the driver.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def arrow_types(tbl, cols):
    """Canonical Arrow type label per column, sorted by column name.

    Emulates the driver's type-sensitive value hash: DuckDB integer sum()
    returns HUGEINT (arrow decimal128(38,0)) while Spark emits int64 — values
    identical, hash red. Comparing Arrow types catches that class locally.
    string/large_string are unified (engine-default string width, not a
    semantic difference).
    """
    label = {}
    for name in cols:
        t = str(tbl.schema.field(name).type)
        if t in ("large_string", "string_view"):
            t = "string"
        label[name] = t
    return [label[c] for c in sorted(cols)]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(round(v, 9))
        if isinstance(v, bool):
            return str(v).lower()
        return str(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]


def main() -> int:
    import json
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    artifact_path = os.environ.get("COMPARE_ORACLE_JSON")  # optional artifact
    results: dict[str, dict] = {}

    import __spark_entry__ as entry_mod
    from reviews_quality_check_spark.session import get_spark

    spark = get_spark(cores=16, shuffle_partitions=16)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            satbl = sdf.toArrow()
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "FAIL-spark", "err": str(e)[:200]}
            print(f"[FAIL-spark] {name}: {type(e).__name__}: {str(e)[:400]}")
            continue
        if name not in oracles:
            results[name] = {"status": "rows-only", "spark_rows": len(srows)}
            print(f"[rows-only] {name}: {len(srows)} rows, {len(scols)} cols")
            continue
        try:
            oatbl = con.execute(oracles[name]).arrow()
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "FAIL-duckdb", "err": str(e)[:200]}
            print(f"[FAIL-duckdb] {name}: {type(e).__name__}: {str(e)[:400]}")
            continue
        st, ot = arrow_types(satbl, scols), arrow_types(oatbl, ocols)
        if sorted(scols) == sorted(ocols) and st != ot:
            failures.append(name)
            results[name] = {"status": "FAIL-types"}
            diffs = [
                (c, a, b)
                for c, a, b in zip(sorted(scols), st, ot)
                if a != b
            ]
            print(f"[FAIL-types] {name}: arrow type diffs {diffs}")
            continue
        sc, scn = canon(srows, scols)
        oc, ocn = canon(orows, ocols)
        if scn != ocn:
            failures.append(name)
            results[name] = {"status": "FAIL-schema"}
            print(f"[FAIL-schema] {name}: spark={scn} oracle={ocn}")
            continue
        if len(sc) != len(oc):
            failures.append(name)
            results[name] = {"status": "FAIL-count"}
            print(f"[FAIL-count] {name}: spark={len(sc)} oracle={len(oc)}")
            continue
        if sc != oc:
            failures.append(name)
            results[name] = {"status": "FAIL-values"}
            bad = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            print(f"[FAIL-values] {name}: first diffs {bad}")
            continue
        results[name] = {"status": "OK", "rows": len(sc)}
        print(f"[OK] {name}: {len(sc)} rows")
    spark.stop()
    if artifact_path:
        with open(artifact_path, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "n_queries": len(results),
                 "n_failures": len(failures), "results": results},
                fh, indent=1, sort_keys=True,
            )
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
