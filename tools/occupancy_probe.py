"""Core-occupancy probe: run the scaling flagship child at the given
parallelism levels and report how many cores each level actually keeps busy
(JVM vs Python-worker split) alongside throughput.

Why: the thread-level scaling substitute advertises local[N] as "N cores",
but the extraction hot path is mapInPandas — each running task occupies a
JVM task thread AND a pyspark.daemon worker process concurrently. Measured
occupancy (e.g. local[8] ≈ 10 busy cores, local[32] ≈ 21) is the number the
4:1 pair efficiencies must be read against (round-3 verdict item 2); the
sampling itself lives in tools/scaling_bench.run_level and rides every
scaling trial.

Usage: python tools/occupancy_probe.py [cpus ...]   (default: 8 32)
Reuses /tmp/scaling_input if present (else preps it at replication 120).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)

from scaling_bench import (  # noqa: E402
    _CHILD, _PREP, _pyfiles_zip, _run, PREP_DIR, run_level,
)


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [8, 32]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.exists(os.path.join(PREP_DIR, "_SUCCESS")):
        print("# prepping input (repl=120)...", file=sys.stderr)
        _run(_PREP.format(repo=REPO, sf_dir=sf_dir,
                          repl=120, prep_dir=PREP_DIR))
    else:
        # a pre-existing prep may have been built at a different replication
        # — throughputs are then not comparable to a fresh repl=120 run
        print(f"# reusing existing {PREP_DIR} (delete it to re-prep at "
              "repl=120)", file=sys.stderr)
    zip_path = _pyfiles_zip()
    child_py = os.path.join(tempfile.mkdtemp(prefix="occ_child_"), "child.py")
    with open(child_py, "w") as f:
        f.write(_CHILD)
    out = []
    for c in levels:
        r = run_level(c, child_py, zip_path)
        out.append({"cpus": c, "sec": round(r["sec"], 2),
                    "turns_per_sec": round(r["turns_per_sec"]),
                    "busy_cores": r.get("busy_cores")})
    print(json.dumps({"levels": out}))


if __name__ == "__main__":
    main()
