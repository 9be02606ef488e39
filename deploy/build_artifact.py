#!/usr/bin/env python
"""Build the --py-files artifact for spark-submit deployment.

Produces ``dist/etf_topox_spark.zip`` containing the ``etf_topox_spark``
package at the zip root, so executors can import it straight off the
archive (north rule, BASELINE.json:14: "ships via spark-submit --py-files").

Usage:  python deploy/build_artifact.py [--out dist/etf_topox_spark.zip]

Deterministic: entries are written in sorted order with a fixed timestamp so
re-builds of the same tree are byte-identical (content-addressable deploys).
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "etf_topox_spark"
FIXED_DATE = (2026, 1, 1, 0, 0, 0)  # stable zip metadata → reproducible artifact


def build(out_path: str) -> str:
    pkg_root = os.path.join(REPO_ROOT, PACKAGE)
    entries: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, REPO_ROOT)
            entries.append((full, arc))

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO_ROOT, "dist", "etf_topox_spark.zip"))
    args = ap.parse_args()
    path = build(args.out)
    print(path)


if __name__ == "__main__":
    main()
