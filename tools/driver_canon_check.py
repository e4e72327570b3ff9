"""Driver-canonicalizer emulation over the full registry (VERDICT r3
next-round #8).

`tools/compare_oracle.py` is STRICTER than the driver (exact value
compare), but it canonicalizes with its own pure-Python cell rules — it
cannot reproduce the driver's observed pandas-based failure modes
(r2: `pandas.sort_values` TypeError on array/map columns; decimal128
dtype objects hashing differently from int64). This tool emulates the
driver's pipeline as observed from CORRECTNESS_r{1..3}.json:

  result -> pandas DataFrame -> columns sorted by name ->
  sort_values(by=all columns) -> per-column string render -> md5

and records rows_match / schema_match / hash_match per query, so both
harness styles are green in checked-in artifacts before the driver
samples. Anything that raises inside the pandas path (the TypeError
class) is a FAIL here even if values would compare equal.

Usage: python tools/driver_canon_check.py [sf_dir] [query ...]
Artifact: set DRIVER_CANON_JSON=path to write the per-query dict.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _render(series):
    import decimal

    def cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(round(v, 9))
        if isinstance(v, decimal.Decimal):
            # decimal-typed values (DuckDB HUGEINT/DECIMAL sums) render
            # through float/int semantics NOT str(): '5' vs '5.0000'
            # class mismatches are exactly what the driver's hash sees
            return str(v)
        if isinstance(v, bool):
            return str(v).lower()
        return str(v)

    return [cell(v) for v in series.tolist()]


def driver_hash(pdf):
    """(n_rows, sorted_cols, dtype_kinds, md5) — raises like the driver
    would on unsortable object columns (arrays/maps/mixed types)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.md5()
    for c in cols:
        h.update(("\x00".join(_render(pdf[c])) + "\x01").encode())
    kinds = [pdf[c].dtype.kind for c in cols]
    return len(pdf), cols, kinds, h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    artifact_path = os.environ.get("DRIVER_CANON_JSON")

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
    results: dict[str, dict] = {}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            spdf = fn(spark, sf_dir).toPandas()
            sn, scols, skinds, shash = driver_hash(spdf)
            rec["spark_rows"] = sn
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"spark/canon: {type(e).__name__}: {str(e)[:200]}"
            failures.append(name)
            results[name] = rec
            print(f"[FAIL] {name}: {rec['err']}")
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            failures.append(name)  # registry contract: every query oracled
            results[name] = rec
            print(f"[FAIL] {name}: registered without oracle")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
            on, ocols, okinds, ohash = driver_hash(opdf)
            rec["oracle_rows"] = on
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"duckdb/canon: {type(e).__name__}: {str(e)[:200]}"
            failures.append(name)
            results[name] = rec
            print(f"[FAIL] {name}: {rec['err']}")
            continue
        rec["rows_match"] = sn == on
        rec["schema_match"] = scols == ocols and skinds == okinds
        rec["hash_match"] = shash == ohash
        results[name] = rec
        if all((rec["rows_match"], rec["schema_match"], rec["hash_match"])):
            print(f"[OK] {name}: {sn} rows")
        else:
            failures.append(name)
            print(
                f"[FAIL] {name}: rows {sn}/{on} schema {rec['schema_match']} "
                f"(kinds {skinds} vs {okinds}) hash {rec['hash_match']}"
            )
    spark.stop()
    if artifact_path:
        Path(artifact_path).write_text(json.dumps(results, indent=2))
    print(f"\n{len(failures)} failures: {sorted(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
