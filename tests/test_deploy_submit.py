"""Deploy-path test: the pipeline ships and runs via spark-submit --py-files
(north rule, BASELINE.json:14). Builds dist/etf_topox_spark.zip, then runs
deploy/submit_main.py through real spark-submit with cwd set to an empty
temp dir and no PYTHONPATH — every engine import must resolve from the zip.
A second run against the same checkpoint dir proves lineage resume.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = shutil.which("spark-submit")


def _run_submit(zip_path: str, ckpt: str, cwd: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "deploy", "submit_main.py"),
            "--checkpoint", ckpt,
            "--smoke",
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    line = next(l for l in proc.stdout.splitlines() if l.startswith("PIPELINE_SUMMARY "))
    return json.loads(line[len("PIPELINE_SUMMARY "):])


def test_artifact_is_importable_package(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "deploy"))
    try:
        from build_artifact import build
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "etf_topox_spark.zip")
    build(out)
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert "etf_topox_spark/__init__.py" in names
    assert "etf_topox_spark/operators/topology.py" in names
    assert all(n.startswith("etf_topox_spark/") for n in names)
    # deterministic rebuild → byte-identical artifact
    out2 = str(tmp_path / "rebuild.zip")
    build(out2)
    assert open(out, "rb").read() == open(out2, "rb").read()


@pytest.mark.skipif(SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pipeline_and_resume(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "deploy"))
    try:
        from build_artifact import build
    finally:
        sys.path.pop(0)
    zip_path = build(str(tmp_path / "etf_topox_spark.zip"))
    ckpt = str(tmp_path / "ckpt")
    cwd = str(tmp_path / "emptycwd")
    os.makedirs(cwd)

    s1 = _run_submit(zip_path, ckpt, cwd)
    assert s1["ok"] is True
    assert s1["stages"]["edges"]["resumed_partitions"] == 0
    assert s1["stages"]["edges"]["written_rows"] > 0
    assert s1["stages"]["errors"]["count"] > 0
    assert s1["stages"]["tiles"]["invariant_violations"] == 0

    # second run: edges stage fully covered by the manifest → resume skips it
    s2 = _run_submit(zip_path, ckpt, cwd)
    assert s2["ok"] is True
    assert s2["stages"]["edges"]["resumed_partitions"] > 0
    assert s2["stages"]["edges"]["written_rows"] == 0
    assert s2["stages"]["errors"]["count"] == s1["stages"]["errors"]["count"]


def test_iceberg_smoke_skips_cleanly_without_jar(tmp_path):
    """deploy/iceberg_smoke.py must be executable documentation: without
    the Iceberg runtime jar it exits 2 with the spark-submit instructions,
    never a stack trace (the deploy-only S2 path, SURVEY.md §1.2)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "deploy", "iceberg_smoke.py"),
            "--images",
            "10",
            "--checkpoint",
            str(tmp_path / "ck"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYTHONPATH": repo},
        cwd=str(tmp_path),
    )
    assert out.returncode == 2, (out.returncode, out.stderr[-1500:])
    assert "ICEBERG-SMOKE SKIP" in out.stderr
    assert "Traceback" not in out.stderr
