#!/usr/bin/env python3
"""Build dist/activestorage_ocr_spark.zip for spark-submit --py-files.

The reference ships a self-contained binary (`lib/activestorage/ocr/binary.rb`
installer); our deployment artifact is the package zip SparkFiles distributes
to every executor (SURVEY.md §2.1 S5/S6: no network at run time — everything
the kernel needs travels with the job).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "activestorage_ocr_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "activestorage_ocr_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
