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
        # round-5 additions (keys are additive — earlier BENCH_r*.json
        # comparability is per-key)
        "unigram_logprob",
        "shuffle_rank",
        "pack_sequences",
        "bpe_pairs",
        "bpe_encode",
        "dup_spans",
        "entity_pagerank",
    ]

    # warm JVM codegen, shuffle, and Python-worker/Arrow paths once
    # (one-time session costs would otherwise land on the first queries)
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    from quad_processor_util_spark.plans.pipeline import extract_quads
    from __spark_entry__ import _events_as_transcripts, _GAZ
    extract_quads(
        _events_as_transcripts(spark, sf_dir).limit(2000), _GAZ
    ).distinct().count()

    # Interleaved-median protocol (same as tools/scaling_bench.py, adopted
    # per round-3 verdict item 3): the sandbox host shows minute-scale
    # co-tenant bursts (observed up to ~8x on single queries), so best-of-N
    # reruns of ONE query back-to-back can all land inside the same burst
    # and record a phantom regression (round 3's lsh_topk 1.62->7.34s).
    # Instead run ALL queries round-robin for TRIALS passes — a burst then
    # taxes every query a little instead of one query entirely — and report
    # the per-query MEDIAN plus min/max spread so r(N)-vs-r(N+1) deltas are
    # interpretable.
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "5"))

    def _loadavg() -> list[float]:
        # host weather rides the record: the co-tenanted box swings up to
        # ~8x minute-to-minute, so a bench JSON is only interpretable next
        # to the load the machine was under while it ran
        try:
            with open("/proc/loadavg") as f:
                return [float(x) for x in f.read().split()[:3]]
        except OSError:
            return []

    # Loadavg-gated trial starts (round-4 verdict item 1b): a trial pass
    # that starts while a co-tenant burst is in flight records phantom
    # regressions (r4's shipped window ran at loadavg 3.2->8.1 and looked
    # 4x slower than the same code in a calm minute). Before each trial
    # pass, wait — bounded — for the 1-min loadavg to drop below the
    # threshold; record every deferral so the artifact says whether the
    # gate ever had to engage. The wait is capped so a persistently busy
    # host still yields an artifact (flagged by deferrals + loadavg_end).
    load_gate = float(os.environ.get("SPARK_GRAFT_BENCH_LOADGATE", "2.5"))
    gate_wait_cap = float(os.environ.get("SPARK_GRAFT_BENCH_LOADWAIT", "120"))
    deferrals: list[dict] = []

    def _await_calm(label: str) -> None:
        waited = 0.0
        la = _loadavg()
        while la and la[0] > load_gate and waited < gate_wait_cap:
            time.sleep(10.0)
            waited += 10.0
            la = _loadavg()
        if waited:
            deferrals.append({"at": label, "waited_sec": waited,
                              "loadavg_after": la[0] if la else None})

    load_start = _loadavg()

    from statistics import median as _median

    runs: dict[str, list[float]] = {name: [] for name in bench_names}
    rowcounts: dict[str, int] = {}
    for t in range(trials):
        _await_calm(f"trial_{t}")
        for name in bench_names:
            fn = qs[name]
            t0 = time.time()
            rowcounts[name] = fn(spark, sf_dir).count()
            runs[name].append(time.time() - t0)
            # queries that persist() intermediates (the linking split) would
            # otherwise serve the next trial from the CacheManager — Spark
            # substitutes structurally identical plans with the populated
            # InMemoryRelation — and the median would time cache reads, not
            # the pipeline
            spark.catalog.clearCache()

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name in bench_names:
        timings[name] = round(_median(runs[name]), 3)
        detail[name] = {
            "median": timings[name],
            "min": round(min(runs[name]), 3),
            "max": round(max(runs[name]), 3),
            "trials": len(runs[name]),
        }
        if rowcounts[name] == 0:
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
        ext_runs: list[float] = []
        for t in range(trials):
            _await_calm(f"flagship_{t}")
            t0 = time.time()
            (extract_quads(big, _GAZ)
             .select("subject", "predicate", "obj", "graph")
             .distinct().count())
            ext_runs.append(time.time() - t0)
            spark.catalog.clearCache()
        med_ext = _median(ext_runs)
        turns_per_sec = round(n_turns / med_ext, 1)
        # best-trial figure: the calm-window number, comparable across
        # rounds even when a co-tenant burst eats part of the 5-trial window
        turns_per_sec_best = round(n_turns / min(ext_runs), 1)
        detail["flagship_extract"] = {
            "median": round(med_ext, 3),
            "min": round(min(ext_runs), 3),
            "max": round(max(ext_runs), 3),
            "trials": len(ext_runs),
        }
    finally:
        shutil.rmtree(rep_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    load_end = _loadavg()

    # Per-trial min/max spread + deferral log go to a SIDE FILE, not the
    # printed line: round 4's queries_detail block made the one JSON line
    # outgrow the driver's tail capture and BENCH_r04.json landed with
    # "parsed": null. The printed line must stay compact and parseable.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH", "bench_detail.json"),
    )
    try:
        os.makedirs(os.path.dirname(detail_path), exist_ok=True)
        with open(detail_path, "w") as f:
            json.dump({
                "queries_detail": detail,
                "trials": trials,
                "loadavg_start": load_start,
                "loadavg_end": load_end,
                "load_gate": load_gate,
                "deferrals": deferrals,
                "sf": sf,
                "cpus": cpus,
            }, f, indent=1)
    except OSError as e:
        print(f"# WARN detail sidecar not written: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "trials": trials,
        "loadavg_start": load_start,
        "loadavg_end": load_end,
        "deferrals": len(deferrals),
        "sf": sf,
        "cpus": cpus,
        "turns": n_turns,
        "turns_per_sec": turns_per_sec,
        "turns_per_sec_best": turns_per_sec_best,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
