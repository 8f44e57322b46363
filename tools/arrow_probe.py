"""Arrow-transport probe at wide fan-out (round-4 verdict item 4).

The round-4 decomposition of the engine's 8->32 thread-level scaling left
one engine-owned residual: per-busy-core retention ~0.88x of the host's
own pure-numpy ceiling at the same widening, attributed to Arrow transport
at wide fan-out. This tool probes the three candidate levers the verdict
names — `spark.python.worker.reuse`, `spark.sql.execution.arrow.
maxRecordsPerBatch` (the 10k default was tuned at lower width), and
`spark.sql.execution.arrow.pyspark.selfDestruct.enabled` — by running the
SAME flagship extraction (scaling_bench child, spark-submit --py-files,
local[32]) with one conf varied per variant, interleaved across trials,
with /proc busy-core sampling. It then runs the host-ceiling calibration
SAME-DAY at the engine's measured busy-core counts and reports the
absolute per-busy-core rate ratio per variant (for the WIDENING-retention
comparison the verdict's 0.95 criterion is about, see
tools/retention_pair.py — that needs paired local[8]/local[32] runs).

Usage: python tools/arrow_probe.py [sf_dir] [cpus] [repl] [trials]
Prints one JSON line; appends a markdown section to BENCH/CEILING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scaling_bench as sb  # noqa: E402

REPO = sb.REPO

VARIANTS: dict[str, list[str]] = {
    # Spark defaults: worker.reuse=true, maxRecordsPerBatch=10000,
    # selfDestruct=false — 'base' pins them explicitly so the baseline is
    # self-describing rather than default-dependent
    "base": ["spark.python.worker.reuse=true",
             "spark.sql.execution.arrow.maxRecordsPerBatch=10000"],
    "noreuse": ["spark.python.worker.reuse=false",
                "spark.sql.execution.arrow.maxRecordsPerBatch=10000"],
    "batch2k": ["spark.python.worker.reuse=true",
                "spark.sql.execution.arrow.maxRecordsPerBatch=2000"],
    "batch50k": ["spark.python.worker.reuse=true",
                 "spark.sql.execution.arrow.maxRecordsPerBatch=50000"],
    "batch100k": ["spark.python.worker.reuse=true",
                  "spark.sql.execution.arrow.maxRecordsPerBatch=100000"],
    "selfdestruct": [
        "spark.python.worker.reuse=true",
        "spark.sql.execution.arrow.maxRecordsPerBatch=10000",
        "spark.sql.execution.arrow.pyspark.selfDestruct.enabled=true"],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repl = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    n_rows = sb.prep_input(sf_dir, repl)
    zip_path = sb._pyfiles_zip()
    child_py = sb.make_child()

    runs: dict[str, list[dict]] = {v: [] for v in VARIANTS}
    for t in range(trials):
        for name, conf in VARIANTS.items():  # interleaved across variants
            r = sb.run_level(cpus, child_py, zip_path, extra_conf=conf)
            runs[name].append(r)
            print(f"# trial {t} {name}: {r['turns_per_sec']:,.0f} tps, "
                  f"busy {r.get('busy_cores', {}).get('total', '?')}",
                  file=sys.stderr, flush=True)

    summary = {name: sb.agg_runs(rs) for name, rs in runs.items()}

    # same-day host ceiling at the engine's measured busy-core counts
    busy_levels = sorted({int(round(s["busy_cores"]))
                          for s in summary.values() if s["busy_cores"]})
    ceiling = sb.host_ceiling_at(busy_levels)
    host_per_proc = {int(k): v / int(k)
                     for k, v in ceiling["rows_per_sec"].items()}

    for s in summary.values():
        if s["busy_cores"]:
            n = int(round(s["busy_cores"]))
            h = min(host_per_proc, key=lambda x: abs(x - n))
            s["host_rows_per_proc_at"] = h
            s["rate_ratio_vs_host"] = round(
                s["tps_per_busy_core"] / host_per_proc[h], 3)

    result = {
        "cpus": cpus, "turns": n_rows, "trials": trials,
        "variants": summary,
        "host_ceiling_rows_per_sec": ceiling["rows_per_sec"],
    }
    print(json.dumps(result))

    rows = "\n".join(
        f"| {name} | {s['median_tps']:,} | {s['busy_cores']} "
        f"| {s['tps_per_busy_core'] or '—'} "
        f"| {s.get('rate_ratio_vs_host', '—')} "
        f"| {', '.join(f'{x:,}' for x in s['all_tps'])} |"
        for name, s in summary.items())
    stamp = time.strftime("%Y-%m-%d")
    with open(os.path.join(REPO, "BENCH", "CEILING.md"), "a") as f:
        f.write(f"""
## Arrow-transport probe at local[{cpus}] ({stamp}, round 5)

`python tools/arrow_probe.py {sf_dir} {cpus} {repl} {trials}` — flagship
extraction ({n_rows:,} turns), one conf varied per variant, {trials}
interleaved trials, median reported. Host ceiling re-measured same-day at
the engine's busy-core counts: {ceiling['rows_per_sec']} rows/sec.
"rate ratio" is the ABSOLUTE engine-tps-per-busy-core over host-rows-per-
proc (expected ≪ 1: roughly half the engine's busy cores are JVM-side
scan/shuffle/Arrow transport, which the pure-numpy host loop doesn't pay)
— the verdict's ≥0.95 criterion is about widening RETENTION, measured by
tools/retention_pair.py below.

| variant | median turns/sec | busy cores | tps/busy core | rate ratio vs host/proc | all trials |
|---|---|---|---|---|---|
{rows}
""")


if __name__ == "__main__":
    main()
