"""Per-partition checkpoint ledger + counter metrics.

Reinterprets the reference's resumable byte-limit scan (QuadReader.scala:
163-203: stop at a byte budget, resume from the recorded offset) and its
LogRecorder counters (log/LogRecorder.scala:234-251) at Spark granularity:
the conv_id space is hashed into B buckets; each bucket is one commit unit
with its own output partition, row counters, and ledger entry. A restarted
run skips buckets already in the ledger — no recomputation of completed
partitions (BASELINE.md resumability target).

The ledger is a JSON-lines file next to the output (the Iceberg
snapshot-summary analog; see sources/io.py)."""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def bucket_expr(conv_col: str = "conv_id", n_buckets: int = 8):
    """Deterministic bucket id for a conversation (explicit partitioning of
    the input space — the resume unit)."""
    return F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_buckets)).cast("int")


class Ledger:
    """Append-only JSONL ledger of completed buckets with counters."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def completed(self) -> dict[int, dict]:
        done: dict[int, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                lines = [ln.strip() for ln in f]
            lines = [ln for ln in lines if ln]
            for i, line in enumerate(lines):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    if i == len(lines) - 1:
                        # torn trailing append (crash mid-write): the record
                        # never committed — ignore it, the bucket re-runs
                        continue
                    raise
                done[rec["bucket"]] = rec
        return done

    def record(self, bucket: int, metrics: dict) -> None:
        rec = {
            "bucket": bucket,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            **metrics,
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")


def run_checkpointed(
    transcripts: DataFrame,
    process: Callable[[DataFrame], DataFrame],
    out_path: str,
    ledger_path: str,
    n_buckets: int = 8,
    conv_col: str = "conv_id",
) -> dict[int, dict]:
    """Process the transcript table bucket-by-bucket with resume.

    Each bucket: filter (partition-pruned by the bucket column once the
    input is bucket-partitioned at rest) → `process` → write under
    bucket=<b>/ → ledger entry {turns_in, quads_out}. Buckets present in the
    ledger are skipped entirely. Dedup inside `process` is bucket-local;
    run a final global dedup compaction if cross-bucket identity collisions
    matter (conversations never span buckets, so graph-scoped quads cannot
    collide; only identical cross-conversation triples can).
    Returns the full ledger state.

    Counters ride the write itself via df.observe() — ONE job, ONE scan of
    the input per bucket (the reference's LogRecorder counters accumulate
    during the pass, LogRecorder.scala:234-251; a pre-count plus an output
    re-read would triple-touch every byte at 100 TB)."""
    ledger = Ledger(ledger_path)
    done = ledger.completed()
    # a ledger written under a different bucketing covers DIFFERENT conv_id
    # subsets — resuming against it would silently skip or double-process
    for b, rec in done.items():
        if rec.get("n_buckets", n_buckets) != n_buckets or \
                rec.get("conv_col", conv_col) != conv_col:
            raise ValueError(
                f"ledger {ledger_path} was written with n_buckets="
                f"{rec.get('n_buckets')}/conv_col={rec.get('conv_col')!r}; "
                f"refusing to resume with n_buckets={n_buckets}/"
                f"conv_col={conv_col!r}"
            )
    with_bucket = transcripts.withColumn("__bucket", bucket_expr(conv_col, n_buckets))
    for b in range(n_buckets):
        if b in done:
            continue
        sub = with_bucket.where(F.col("__bucket") == b).drop("__bucket")
        obs_in = Observation()
        sub = sub.observe(obs_in, F.count(F.lit(1)).alias("turns_in"))
        result = process(sub)
        obs_out = Observation()
        result = result.observe(obs_out, F.count(F.lit(1)).alias("quads_out"))
        target = os.path.join(out_path, f"bucket={b}")
        result.write.mode("overwrite").parquet(target)
        metrics = {
            "turns_in": obs_in.get["turns_in"],
            "quads_out": obs_out.get["quads_out"],
            "output": target,
            "n_buckets": n_buckets,
            "conv_col": conv_col,
        }
        ledger.record(b, metrics)
        done[b] = metrics
    return done
