"""The flagship demo job, shared by every launch surface.

One definition of the events→transcripts derivation and the demo
gazetteer, consumed by (a) the driver contract (`__spark_entry__.entry`/
`extract_kg`), (b) the scaling bench, and (c) the `spark-submit
--py-files` launch path (`tools/submit_job.py`) — the north star's
deployment form. Keeping the derivation inside the package is what makes
(c) possible: the submitted job imports ONLY this package (shipped as a
zip via --py-files) plus pyspark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DBR = "http://dbpedia.org/resource/"
PEOPLE = ["Ada Lovelace", "Alan Turing", "Grace Hopper", "Barbara Liskov"]
ORGS = ["Turing Institute", "Hopper Labs", "Liskov Systems", "Knuth Press"]
# clean constant IRIs (the minting path has its own gate, mint_iri)
GAZETTEER = {n: DBR + n.replace(" ", "_") for n in PEOPLE + ORGS}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        # JVM case mapping (ASCII-identical): avoids a ~60s one-time ICU
        # title-case table build on the first lower() of a fresh JVM
        spark.conf.set("spark.sql.icu.caseMappings.enabled", "false")
    except Exception:
        pass
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_to_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic transcripts table (BASELINE.json input shape:
    conv_id, turn_idx, role, text, tool, ts) from the driver's events
    table — same construction as the SQL oracles replay."""
    ev = read_table(spark, sf_dir, "events")
    people = F.array(*[F.lit(p) for p in PEOPLE])
    orgs = F.array(*[F.lit(o) for o in ORGS])
    a = F.element_at(people, (F.col("event_id") % 4 + 1).cast("int"))
    b = F.element_at(orgs, (F.floor((F.col("event_id") % 16) / 4) + 1).cast("int"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(a, F.lit(" works at "), b, F.lit(".")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts"),
    )


def flagship_quads(spark: SparkSession, sf_dir: str,
                   assume_bucketed: bool = True) -> DataFrame:
    """events → transcripts → vectorized extraction → distinct quads.
    assume_bucketed: the row_number window already leaves rows conv-grouped
    and turn-ordered — the same zero-shuffle fast path an Iceberg
    bucket(conv_id)+sorted layout gets."""
    from .plans.pipeline import extract_quads

    tr = events_to_transcripts(spark, sf_dir)
    quads = extract_quads(tr, GAZETTEER, assume_bucketed=assume_bucketed)
    return quads.select("subject", "predicate", "obj", "graph").distinct()
