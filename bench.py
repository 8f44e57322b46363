"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship measurement is the KG extraction pipeline's turns/sec
(events-derived transcripts -> stable order -> vectorized extraction ->
distinct quads), reported alongside per-query wall seconds.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entrymod
    from quad_processor_util_spark.session import get_spark

    spark = get_spark("bench", parallelism=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    bench_names = [
        "extract_kg",
        "tpch_q1",
        "star_join",
        "stable_turn_order",
        "dedup_exact",
        "minhash_dedup",
        "simhash",
        "cosine_topk",
        "lsh_topk",
        "sessionize",
        "star_group",
        "text_metrics",
        "predicate_split_counts",
        "nt_format",
        "quad_parse",
        "salted_join",
        "connected_components",
    ]

    # warm JVM codegen, shuffle, and Python-worker/Arrow paths once
    # (one-time session costs would otherwise land on the first queries)
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    from quad_processor_util_spark.plans.pipeline import extract_quads
    from __spark_entry__ import _events_as_transcripts, _GAZ
    extract_quads(
        _events_as_transcripts(spark, sf_dir).limit(2000), _GAZ
    ).distinct().count()

    # best-of-2 per query: the sandbox host shows minute-scale throughput
    # variance (other tenants); the second run also reflects the steady
    # state a long-lived cluster job lives in
    timings: dict[str, float] = {}
    for name in bench_names:
        fn = qs[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        if n == 0 and name not in ("anti_join",):
            print(f"# WARN {name}: 0 rows", file=sys.stderr)

    # turns/sec over the flagship extraction (turns = event rows driven
    # through the stable-order + extraction path)
    n_turns = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    turns_per_sec = round(n_turns / timings["extract_kg"], 1)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "turns": n_turns,
        "turns_per_sec": turns_per_sec,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
