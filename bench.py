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

    qs = dict(entrymod.queries())

    # bench the PRODUCTION hash variants (xxhash64, JVM-native): the gate
    # queries() deliberately switch minhash/simhash to md5-based hashing so
    # DuckDB can replay them — correct but slower, and not what a cluster
    # deployment runs. Overriding here keeps round-over-round comparability
    # with earlier BENCH_r*.json files (same operator, same hash).
    from quad_processor_util_spark.demo import read_table
    from quad_processor_util_spark.operators.dedup import (
        dedup_clusters as _dc,
        minhash_dedup as _mh,
        simhash_signatures as _sh,
    )

    def _bench_minhash(spark, sf):
        return _mh(read_table(spark, sf, "documents"),
                   num_hashes=36, bands=6, threshold=0.7).select("doc_id")

    def _bench_simhash(spark, sf):
        return _sh(read_table(spark, sf, "documents")).select("doc_id", "simhash")

    def _bench_dedup_clusters(spark, sf):
        return _dc(read_table(spark, sf, "documents"),
                   num_hashes=36, bands=6, threshold=0.7)

    qs["minhash_dedup"] = _bench_minhash
    qs["simhash"] = _bench_simhash
    qs["dedup_clusters"] = _bench_dedup_clusters

    bench_names = [
        "extract_kg",
        "extract_kg_shuffled",
        "mint_iri",
        "media_features",
        "pipeline_e2e",
        "pipeline_full",
        "tpch_q1",
        "star_join",
        "star_view",
        "stable_turn_order",
        "dedup_exact",
        "minhash_dedup",
        "dedup_clusters",
        "simhash",
        "jaccard_pairs",
        "cosine_topk",
        "lsh_topk",
        "ivf_topk",
        "uri_to_iri",
        "sessionize",
        "star_group",
        "text_metrics",
        "repetition_metrics",
        "chunk_docs",
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

    # best-of-N with adaptive retries: the sandbox host shows minute-scale
    # co-tenant bursts (observed up to ~8x on single queries). Two runs
    # always; while the runs disagree by >1.5x, re-run (up to 4 total) so
    # one burst doesn't poison the recorded number. The best run also
    # reflects the steady state a long-lived cluster job lives in.
    def best_of(action) -> tuple[float, int]:
        runs: list[float] = []
        n = 0
        while len(runs) < 2 or (len(runs) < 4 and max(runs) > 1.5 * min(runs)):
            t0 = time.time()
            n = action()
            runs.append(time.time() - t0)
            # queries that persist() intermediates (the linking split) would
            # otherwise serve rerun N+1 from the CacheManager — Spark
            # substitutes structurally identical plans with the populated
            # InMemoryRelation, and min(runs) would time a cache read, not
            # the pipeline
            spark.catalog.clearCache()
        return min(runs), n

    timings: dict[str, float] = {}
    for name in bench_names:
        fn = qs[name]
        best, n = best_of(lambda: fn(spark, sf_dir).count())
        timings[name] = round(best, 3)
        if n == 0:
            print(f"# WARN {name}: 0 rows", file=sys.stderr)

    # Flagship turns/sec at a compute-dominated scale: the sf0.1 events
    # table (100k turns) finishes in a few seconds of mostly fixed job
    # overhead at local[32], which hides the per-turn hot path entirely
    # (see BENCH/BASELINE.md — same reasoning as the scaling protocol).
    # Replicate the transcripts ×10 (~1M turns, distinct conv ids per
    # replica), materialize UNTIMED, then time the full extraction path
    # including the stable-order shuffle and the output distinct.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    _tr = _events_as_transcripts

    rep_dir = tempfile.mkdtemp(prefix="bench_turns_")
    try:
        big = (
            _tr(spark, sf_dir)
            .withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(9))))
            .withColumn("conv_id", F.concat_ws("#", "conv_id", "__r"))
            .drop("__r")
        )
        big.write.mode("overwrite").parquet(rep_dir)
        big = spark.read.parquet(rep_dir)
        n_turns = big.count()
        best_ext, _ = best_of(
            lambda: extract_quads(big, _GAZ)
            .select("subject", "predicate", "obj", "graph")
            .distinct().count()
        )
        turns_per_sec = round(n_turns / best_ext, 1)
    finally:
        shutil.rmtree(rep_dir, ignore_errors=True)

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
