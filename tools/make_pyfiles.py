"""Build the --py-files artifact for spark-submit deployment.

Zips the `quad_processor_util_spark` package (sources only) into
dist/quad_processor_util_spark.zip — the artifact a cluster launch ships:

    spark-submit --master <cluster> \
        --py-files dist/quad_processor_util_spark.zip \
        tools/submit_job.py <table_dir>

Usage: python tools/make_pyfiles.py [out_zip]
Prints the artifact path.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "quad_processor_util_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "quad_processor_util_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
