"""Build the ``--py-files`` artifact for cluster submission.

The north-rule deployment shape is::

    python jobs/package.py dist/engine.zip
    spark-submit --master ... --py-files dist/engine.zip \
        jobs/extract.py --source ... --target ... --checkpoint ... --run-id r1

The zip contains the ``tika_addons_spark`` package only (sources, no tests,
no caches) with deterministic entry order and zeroed timestamps, so the
artifact is reproducible byte-for-byte for a given tree.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_engine_zip(out_path: str) -> str:
    pkg_root = os.path.join(REPO, "tika_addons_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for f in filenames:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/engine.zip"
    print(build_engine_zip(out))
