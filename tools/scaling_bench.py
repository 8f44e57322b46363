"""Scaling-efficiency evidence: run the SAME flagship job on the SAME input
at two parallelism levels (local[N] vs local[4N]) in separate JVMs, report
turns/sec at both and efficiency = (thr_4N / thr_N) / 4 (BASELINE.md
protocol — the sandbox substitute for N vs 4N executor clusters).

Usage: python tools/scaling_bench.py [sf_dir] [N]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from quad_processor_util_spark.session import get_spark
from __spark_entry__ import _events_as_transcripts, _GAZ
from quad_processor_util_spark.plans.pipeline import extract_quads

cpus = {cpus}
sf_dir = {sf_dir!r}
spark = get_spark("scaling-bench", parallelism=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
# warm: JVM + parquet footer + Arrow path, excluded from the measurement
n_turns = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
tr = _events_as_transcripts(spark, sf_dir)
extract_quads(tr.limit(1000), _GAZ).count()
t0 = time.time()
out = extract_quads(tr, _GAZ).select("subject","predicate","obj","graph").distinct().count()
dt = time.time() - t0
print(json.dumps({{"cpus": cpus, "sec": dt, "turns": n_turns,
                   "turns_per_sec": n_turns / dt, "quads": out}}))
spark.stop()
"""


def run_level(cpus: int, sf_dir: str) -> dict:
    code = _CHILD.format(repo=REPO, cpus=cpus, sf_dir=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800,
        cwd=REPO,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo = run_level(n, sf_dir)
    hi = run_level(4 * n, sf_dir)
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4
    result = {
        "sf_dir": sf_dir,
        "N": n,
        "low": lo,
        "high": hi,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    import multiprocessing
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling evidence

Protocol (BASELINE.md): same flagship job (events-derived transcripts →
stable order → vectorized extraction → distinct quads), same input
({sf_dir}), two parallelism levels in separate JVMs, warm-up excluded.

Machine: {multiprocessing.cpu_count()} cores visible.
Command: `python tools/scaling_bench.py {sf_dir} {n}`

| level | master | wall sec | turns | turns/sec |
|---|---|---|---|---|
| N | local[{n}] | {lo['sec']:.2f} | {lo['turns']} | {lo['turns_per_sec']:.0f} |
| 4N | local[{4*n}] | {hi['sec']:.2f} | {hi['turns']} | {hi['turns_per_sec']:.0f} |

**Scaling efficiency = (thr_4N / thr_N) / 4 = {eff:.3f}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

Notes: single-machine thread-level substitute for the N→4N executor
criterion per BASELINE.md; shuffle partitions scaled with parallelism.
""")


if __name__ == "__main__":
    main()
