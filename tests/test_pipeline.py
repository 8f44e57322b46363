"""End-to-end pipeline vs the pure-Python oracle: P/R >= 0.95 on the
5-field triple identity (the BASELINE.md correctness gate), plus the
per-turn invariant and the partitioned materialization."""

import os

import pytest
from pyspark.sql import functions as F

from quad_processor_util_spark.datagen import (
    build_alias_edges,
    build_entity_catalog,
    build_gazetteer,
    build_transcripts,
)
from quad_processor_util_spark.oracle import (
    canonicalize_quads,
    dedup_quads,
    extract_conversation,
    resolve_canonical,
)
from quad_processor_util_spark.plans.pipeline import (
    extract_quads,
    run_pipeline,
    turn_numbers,
)


@pytest.fixture(scope="module")
def data(spark, fixtures_dir):
    transcripts = spark.read.parquet(os.path.join(fixtures_dir, "transcripts.parquet"))
    catalog = build_entity_catalog()
    edges_pdf = build_alias_edges(42)
    edges = spark.createDataFrame(edges_pdf)
    return transcripts, catalog, edges_pdf, edges


def _oracle_quads(catalog, edges_pdf, n_convs=120, seed=42, canonical=True):
    gaz = build_gazetteer(catalog)
    pdf = build_transcripts(n_convs, seed)
    quads = []
    for conv_id, grp in pdf.groupby("conv_id"):
        turns = list(zip(grp["turn_idx"], grp["role"], grp["text"], grp["tool"]))
        turns = [(int(a), b, c, (d if isinstance(d, str) else None)) for a, b, c, d in turns]
        quads.extend(extract_conversation(turns, gaz, conv_id))
    if canonical:
        mapping, excluded = resolve_canonical(
            list(zip(edges_pdf["src_iri"], edges_pdf["dst_iri"], edges_pdf["edge_kind"]))
        )
        quads = canonicalize_quads(quads, mapping, excluded)
    return {q.identity() for q in dedup_quads(quads)}


def test_extract_matches_oracle_exactly(spark, data):
    transcripts, catalog, edges_pdf, _ = data
    gaz = build_gazetteer(catalog)
    got = {
        (r.subject, r.predicate, r.obj, r.datatype, r.language)
        for r in extract_quads(transcripts, gaz.surface_to_iri).collect()
    }
    expected = _oracle_quads(catalog, edges_pdf, canonical=False)
    assert got == expected
    assert len(expected) > 100


def test_pipeline_precision_recall(spark, data):
    transcripts, catalog, edges_pdf, edges = data
    final = run_pipeline(spark, transcripts, catalog, edges)
    got = {
        (r.subject, r.predicate, r.obj, r.datatype, r.language)
        for r in final.collect()
    }
    expected = _oracle_quads(catalog, edges_pdf, canonical=True)
    tp = len(got & expected)
    precision = tp / len(got)
    recall = tp / len(expected)
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"
    # with shared semantics it should in fact be exact:
    assert got == expected


def test_stable_turn_ordering_invariant(spark, data):
    """per-turn text equality under stable turn ordering: the row_number
    over (conv_id, turn_idx) minus one equals turn_idx (dense 0-based)."""
    transcripts, *_ = data
    df = turn_numbers(transcripts)
    violations = df.where(F.col("rn") - 1 != F.col("turn_idx")).count()
    assert violations == 0
    # and texts keyed by (conv_id, turn_idx) are unique (equality well-defined)
    dup = (
        transcripts.groupBy("conv_id", "turn_idx")
        .agg(F.count_distinct("text").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert dup == 0


def test_materialize_partitioned_by_predicate(spark, data, tmp_path):
    transcripts, catalog, _, edges = data
    out = str(tmp_path / "quads_out")
    run_pipeline(spark, transcripts, catalog, edges, out_path=out)
    parts = [p for p in os.listdir(out) if p.startswith("pred_label=")]
    assert len(parts) >= 3  # worksAt, bornIn, population, toolUsed, ...
    back = spark.read.parquet(out)
    # row conservation through the write (QuadSorter.scala:474 analog)
    assert back.count() == back.dropDuplicates(
        ["subject", "predicate", "obj", "datatype", "language"]
    ).count()
    # predicate pushdown: the partition filter must reach the scan (a plan
    # with PartitionFilters prunes to one directory; count()>0 alone would
    # also pass on a broken full scan)
    one = back.where(F.col("pred_label") == parts[0].split("=", 1)[1])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "pred_label" in plan.split(
        "PartitionFilters", 1)[1][:200]
    assert one.count() > 0
    # and every file actually read lives under the single partition dir
    files = {r[0] for r in
             one.select(F.input_file_name()).distinct().collect()}
    assert files and all(f"/{parts[0]}/" in f for f in files)
