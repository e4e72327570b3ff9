"""End-to-end test of the north_rule launch mode: the REAL
``spark-submit --py-files`` invocation of tools/submit_validate.py, at
two parallelism levels, asserting identical verdicts (the
determinism-across-cluster-sizes requirement) and a working resume.

Each submit is a fresh JVM (~30s each), so this test keeps the input
tiny (sf0.001) and runs the minimum launches that still certify the
contract: local[2] and local[4] full runs + one --resume no-op."""

from __future__ import annotations

import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SF_DIR = Path("/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None or not SF_DIR.exists(),
    reason="spark-submit or testdata not available",
)


def _zip_package(tmp_path: Path) -> Path:
    zpath = tmp_path / "rqc.zip"
    pkg = REPO / "reviews_quality_check_spark"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for f in pkg.rglob("*.py"):
            z.write(f, f.relative_to(REPO))
    return zpath


def _submit(master: str, zpath: Path, out_dir: Path, resume: bool = False,
            extra: tuple = ()) -> int:
    cmd = [
        "spark-submit",
        "--master", master,
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zpath),
        str(REPO / "tools" / "submit_validate.py"),
        "--input", str(SF_DIR / "documents.parquet"),
        "--output", str(out_dir),
        "--partition-col", "lang",
    ]
    if resume:
        cmd.append("--resume")
    cmd.extend(extra)
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode in (0, 2), proc.stderr[-3000:]
    return proc.returncode


def _read_verdicts(out_dir: Path):
    import duckdb

    rows = duckdb.sql(
        "SELECT partition_id, check_name, passed, violation_count "
        f"FROM '{out_dir}/verdicts/**/*.parquet' "
        "ORDER BY partition_id, check_name"
    ).fetchall()
    return rows


def test_spark_submit_two_cluster_sizes_identical(tmp_path):
    zpath = _zip_package(tmp_path)
    rc2 = _submit("local[2]", zpath, tmp_path / "out2")
    rc4 = _submit("local[4]", zpath, tmp_path / "out4")
    v2 = _read_verdicts(tmp_path / "out2")
    v4 = _read_verdicts(tmp_path / "out4")
    assert v2, "no verdicts written"
    # determinism across cluster sizes: byte-equal verdict sets
    assert v2 == v4
    # exit code encodes the overall pass/fail deterministically too
    assert rc2 == rc4
    # lineage rows committed per partition (the resume contract)
    lineage = list((tmp_path / "out2" / "lineage").rglob("*.parquet"))
    assert lineage, "no lineage committed"

    # resume against completed output is a cheap no-op that preserves
    # the verdicts byte-for-byte
    rc_resume = _submit("local[2]", zpath, tmp_path / "out2", resume=True)
    assert rc_resume == rc2
    assert _read_verdicts(tmp_path / "out2") == v2

    # a third full run with --history-anomalies: the cluster entrypoint
    # exposes the run-over-run regression pass. History is per output
    # dir — out2 now carries the initial run plus this one, identical
    # values, so every committed point exists and none is flagged.
    rc_hist = _submit(
        "local[2]", zpath, tmp_path / "out2", extra=("--history-anomalies",)
    )
    assert rc_hist == rc2
    import duckdb

    anom = duckdb.sql(
        f"SELECT metric, window_id, value, rel_anomaly, z_anomaly "
        f"FROM '{tmp_path}/out2/anomalies/*.parquet' ORDER BY metric, window_id"
    ).fetchall()
    assert anom, "no anomaly history written"
    # identical repeated runs: every committed point exists, none flagged
    assert all(not r[3] and not r[4] for r in anom)
