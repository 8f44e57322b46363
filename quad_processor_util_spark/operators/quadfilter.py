"""IN-list quad filtering — FilterDestination semantics
(destination/FilterDestination.scala:52-78): keep a quad iff each non-empty
list contains the corresponding field; the graph check applies only when the
quad has a context; dataset is an equality check. Pure Catalyst — at scan
time this pushes into the parquet/Iceberg reader (the reference applied it
at the SINK, the opposite of pushdown — SURVEY.md §4)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class QuadFilterParams:
    """FilterParams (FilterDestination.scala:73-78): empty list = no filter."""

    subjects: list[str] = field(default_factory=list)
    predicates: list[str] = field(default_factory=list)
    objects: list[str] = field(default_factory=list)
    graphs: list[str] = field(default_factory=list)
    dataset: str | None = None


def quad_filter_condition(p: QuadFilterParams) -> Column:
    cond = F.lit(True)
    if p.subjects:
        cond = cond & F.col("subject").isin(p.subjects)
    if p.predicates:
        cond = cond & F.col("predicate").isin(p.predicates)
    if p.objects:
        cond = cond & F.col("obj").isin(p.objects)
    if p.graphs:
        # graph membership only checked when context is present
        # (DestinationFilter.filter, FilterDestination.scala:60-64)
        cond = cond & (F.col("graph").isNull() | F.col("graph").isin(p.graphs))
    if p.dataset is not None:
        cond = cond & (F.col("dataset") == p.dataset)
    return cond


def quad_filter(quads: DataFrame, p: QuadFilterParams) -> DataFrame:
    return quads.where(quad_filter_condition(p))


def title_filter(df: DataFrame, col: str = "subject") -> DataFrame:
    """Drop File:/Template: entities; strip Category: prefixes from values
    (solr/SolrLoader.scala:122,248-262)."""
    keep = ~F.regexp_extract(F.col(col), r"/([^/]*)$", 1).rlike("^(File:|Template:)")
    return df.where(keep).withColumn(
        col, F.regexp_replace(F.col(col), r"(/)Category:([^/]*)$", r"$1$2")
    )
