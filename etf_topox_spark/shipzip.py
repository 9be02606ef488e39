"""Build the etf_topox_spark --py-files zip (shared by deploy/build_artifact
and the in-session addPyFile shipping in registry.load_all_operators).

Deterministic: sorted entries, fixed timestamp → byte-identical rebuilds.
"""

from __future__ import annotations

import os
import zipfile

PACKAGE_ROOT = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.dirname(PACKAGE_ROOT)
FIXED_DATE = (2026, 1, 1, 0, 0, 0)


def build(out_path: str) -> str:
    """Zip the package (py files only, package dir at zip root)."""
    entries: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(PACKAGE_ROOT):
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
