"""Per-busy-core retention across the 8->32 widening, per conf variant.

Companion to tools/arrow_probe.py (which ranks confs at local[32] alone).
The round-4 decomposition defined the engine-owned residual as: engine
per-busy-core productivity RETENTION over the 8->32 widening (0.66) vs
the host's own pure-numpy per-proc retention over the same widening
(0.751) — engine/host = 0.88x, the ~12% Arrow-transport gap. This tool
measures that ratio per variant: each variant runs at local[8] and
local[32] (interleaved trials, /proc busy-core sampling), the host
ceiling runs SAME-DAY at the measured busy-core counts, and the report
is retention_engine / retention_host per variant.

Usage: python tools/retention_pair.py [sf_dir] [repl] [trials]
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
    "base": ["spark.python.worker.reuse=true",
             "spark.sql.execution.arrow.maxRecordsPerBatch=10000"],
    "selfdestruct": [
        "spark.python.worker.reuse=true",
        "spark.sql.execution.arrow.maxRecordsPerBatch=10000",
        "spark.sql.execution.arrow.pyspark.selfDestruct.enabled=true"],
}

LEVELS = (8, 32)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    n_rows = sb.prep_input(sf_dir, repl)
    zip_path = sb._pyfiles_zip()
    child_py = sb.make_child()

    runs: dict[tuple[str, int], list[dict]] = {
        (v, c): [] for v in VARIANTS for c in LEVELS}
    for t in range(trials):
        for name, conf in VARIANTS.items():
            for cpus in LEVELS:  # interleaved across variants AND levels
                r = sb.run_level(cpus, child_py, zip_path, extra_conf=conf)
                runs[(name, cpus)].append(r)
                print(f"# trial {t} {name}@local[{cpus}]: "
                      f"{r['turns_per_sec']:,.0f} tps, busy "
                      f"{r.get('busy_cores', {}).get('total', '?')}",
                      file=sys.stderr, flush=True)

    summary = {name: {str(c): sb.agg_runs(runs[(name, c)]) for c in LEVELS}
               for name in VARIANTS}

    # same-day host ceiling at the engine's measured busy-core counts
    busy_levels = sorted({int(round(s[str(c)]["busy_cores"]))
                          for s in summary.values() for c in LEVELS
                          if s[str(c)]["busy_cores"]})
    ceiling = sb.host_ceiling_at(busy_levels)
    host_pp = {int(k): v / int(k)
               for k, v in ceiling["rows_per_sec"].items()}

    def nearest(n: float) -> int:
        return min(host_pp, key=lambda x: abs(x - n))

    for name, s in summary.items():
        lo, hi = s[str(LEVELS[0])], s[str(LEVELS[1])]
        if lo["tps_per_busy_core"] and hi["tps_per_busy_core"]:
            eng_ret = hi["tps_per_busy_core"] / lo["tps_per_busy_core"]
            h_lo = nearest(lo["busy_cores"])
            h_hi = nearest(hi["busy_cores"])
            host_ret = host_pp[h_hi] / host_pp[h_lo]
            s["engine_retention"] = round(eng_ret, 3)
            s["host_retention"] = round(host_ret, 3)
            s["host_levels_used"] = [h_lo, h_hi]
            s["engine_vs_host"] = round(eng_ret / host_ret, 3)

    result = {"turns": n_rows, "trials": trials, "levels": LEVELS,
              "variants": summary,
              "host_ceiling_rows_per_sec": ceiling["rows_per_sec"]}
    print(json.dumps(result))

    rows = "\n".join(
        f"| {name} | {s['8']['median_tps']:,} @ {s['8']['busy_cores']} "
        f"| {s['32']['median_tps']:,} @ {s['32']['busy_cores']} "
        f"| {s.get('engine_retention', '—')} | {s.get('host_retention', '—')} "
        f"| **{s.get('engine_vs_host', '—')}** |"
        for name, s in summary.items())
    stamp = time.strftime("%Y-%m-%d")
    with open(os.path.join(REPO, "BENCH", "CEILING.md"), "a") as f:
        f.write(f"""
## Widening-retention pairs ({stamp}, round 5)

`python tools/retention_pair.py {sf_dir} {repl} {trials}` — per-busy-core
productivity retention across the 8→32 widening per conf variant, vs the
host's same-day pure-numpy per-proc retention over the engine's measured
busy-core counts ({ceiling['rows_per_sec']} rows/sec).

| variant | tps @ busy (local[8]) | tps @ busy (local[32]) | engine retention | host retention | engine/host |
|---|---|---|---|---|---|
{rows}
""")


if __name__ == "__main__":
    main()
