"""Grouped traversal + star-view aggregation.

- ``sorted_group_scan``: the Spark-first reinterpretation of the reference's
  sorted-file group streaming (QuadReader.readSortedQuads, QuadReader.scala:
  44-62): ONE hash repartition on the key + in-partition secondary sort, then
  mapInPandas sees contiguous key runs — grouping without groupBy's
  per-group object overhead, and downstream stages reuse the partitioning.
- ``grouped_apply``: per-group pandas transform (the `Traversable[Quad] =>
  Traversable[Quad]` extension point, QuadMapper.scala:84-153,
  scripts/SortedQuadTraversal.scala:34-47) as applyInPandas.
- ``star_view``: per-subject entity document (SolrLoader.scala:137-174) as a
  single groupBy.agg — first label + overflow altLabels, collected types /
  sameAs / subjects, all list-distinct, map-side partial aggregation free.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sorted_group_scan(
    df: DataFrame,
    key: str,
    order: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by key + sort within partitions by (key, order) so each
    partition is a sequence of contiguous, internally ordered key runs —
    the shape the reference got from subject-sorted files."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartition(parts, key)
    cols = [key] + ([order] if order else [])
    return out.sortWithinPartitions(*cols)


def grouped_apply(
    df: DataFrame,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
    order: str | None = None,
) -> DataFrame:
    """groupBy(key).applyInPandas with deterministic intra-group order:
    applyInPandas does NOT guarantee row order inside a group, so when
    `order` is given the group is sorted before `fn` (SURVEY.md risk
    register: stable turn ordering)."""

    if order is not None:
        def wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
            return fn(pdf.sort_values(order, kind="mergesort"))
    else:
        wrapped = fn
    return df.groupBy(key).applyInPandas(wrapped, schema)


def run_boundary_groups(
    df: DataFrame, key: str, fn: Callable[[pd.DataFrame], pd.DataFrame], schema,
    order: str | None = None,
) -> DataFrame:
    """Group-run traversal without groupBy: sorted_group_scan + mapInPandas
    with carry-over of the split tail between Arrow batches, so `fn` always
    sees whole key groups. Cheaper than applyInPandas when groups are small
    and numerous (no per-group Python call from JVM, larger Arrow batches)."""

    def _runs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_key = pdf[key].iloc[-1]
            head = pdf[pdf[key] != last_key]
            carry = pdf[pdf[key] == last_key]
            if len(head):
                yield from _apply_groups(head)
        if carry is not None and len(carry):
            yield from _apply_groups(carry)

    def _apply_groups(pdf: pd.DataFrame) -> Iterator[pd.DataFrame]:
        for _, grp in pdf.groupby(key, sort=False):
            if order is not None:
                grp = grp.sort_values(order, kind="mergesort")
            out = fn(grp)
            if out is not None and len(out):
                yield out

    return sorted_group_scan(df, key, order).mapInPandas(_runs, schema)


def star_view(quads: DataFrame, label_overflow: int = 1) -> DataFrame:
    """Per-subject entity document (the solr-loader aggregation,
    SolrLoader.scala:137-174): first label (deterministic min) + remaining
    labels as altLabels, collect_set of types / sameAs / subjects — one
    shuffle, partial aggregation map-side."""
    p = F.col("predicate")
    is_label = p.endswith("label") | p.endswith("Label")
    is_type = p == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    is_same = p.endswith("sameAs") | p.endswith("exactMatch")
    is_subject_rel = p.endswith("subject")
    labels_sorted = F.sort_array(F.collect_set(F.when(is_label, F.col("obj"))))
    return quads.groupBy("subject").agg(
        # try_element_at: a subject with zero label quads has an EMPTY array
        # here, and plain element_at throws under ANSI mode (Spark 4 default)
        F.try_element_at(labels_sorted, F.lit(1)).alias("label"),
        F.slice(
            labels_sorted, label_overflow + 1,
            F.greatest(F.size(labels_sorted) - label_overflow, F.lit(0)),
        ).alias("altLabels"),
        F.sort_array(F.collect_set(F.when(is_type, F.col("obj")))).alias("types"),
        F.sort_array(F.collect_set(F.when(is_same, F.col("obj")))).alias("sameAs"),
        F.sort_array(F.collect_set(F.when(is_subject_rel, F.col("obj")))).alias("subjects"),
        F.count(F.lit(1)).alias("n_quads"),
    )


def assert_sorted(df: DataFrame, key: str, order: str) -> int:
    """Sortedness-violation count within key groups (the QuadSorterTest
    invariant, QuadSorterTest.scala:36-54) via a lag window. Returns the
    number of out-of-order adjacent pairs (0 = sorted)."""
    w = Window.partitionBy(key).orderBy(order)
    return (
        df.withColumn("__prev", F.lag(order).over(w))
        .where(F.col("__prev").isNotNull() & (F.col("__prev") > F.col(order)))
        .count()
    )
