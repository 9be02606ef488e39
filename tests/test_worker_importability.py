"""Grading-driver environment rehearsal: the driver imports
__spark_entry__ with the repo on the DRIVER's sys.path only — local-mode
Python workers do NOT get /root/repo on their sys.path (verified: worker
sys.path = [cwd, spark userFiles, pyspark.zip, ...]). Every Arrow kernel
must therefore be fully cloudpickled by value; a runtime
`import etf_topox_spark...` INSIDE a kernel body dies on the worker with
ModuleNotFoundError (found live in round 4 on the audio kernel).

This test runs the kernel-bearing queries from a subprocess whose cwd is
outside the repo, exactly like the driver.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as mod
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("worker-import-rehearsal")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
qs = mod.queries()
for name in {names!r}:
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    print(f"{{name}}:{{n}}", flush=True)
print("REHEARSAL-OK")
"""

# one representative per kernel family: audio decode, WKB parse+serialize,
# image decode, mosaic generator, grouped topology kernel
NAMES = [
    "multimodal_audio_features",
    "topology_wkb_roundtrip",
    "multimodal_image_features",
    "image_tile_stats",
]


def test_kernels_run_with_driver_only_syspath(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO, names=NAMES)],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=420,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    assert "REHEARSAL-OK" in out.stdout, out.stderr[-3000:]
