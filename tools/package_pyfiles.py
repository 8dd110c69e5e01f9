"""Build the --py-files artifact for cluster submission.

The north rule runs the engine via ``spark-submit --py-files`` on a
multi-executor cluster; this packages the engine as a single zip whose
top-level directory is the importable package, e.g.::

    python tools/package_pyfiles.py              # -> dist/dwsc_spark.zip
    spark-submit --py-files dist/dwsc_spark.zip your_driver.py

Pure stdlib (zipfile) — no build backend needed on the cluster edge node.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "distributed_web_scrapper_and_crawler_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "dwsc_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
