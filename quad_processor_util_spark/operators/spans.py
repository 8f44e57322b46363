"""Duplicated-span detection: substring-level dedup for training data.

Document-level dedup (exact / MinHash / SimHash, :mod:`.dedup`) removes
whole near-duplicate documents, but web corpora are also full of REPEATED
PASSAGES inside otherwise-distinct pages — boilerplate headers, license
blocks, quoted chain mail. Removing those duplicated substrings (rather
than whole documents) measurably improves trained models (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better"), whose
exact tool is a corpus-wide suffix array — a construction with no
sensible 100 TB Spark expression. The scalable stand-in implemented here
is the standard fingerprint route used by plagiarism detectors:
robust-winnowing fingerprints (Schleimer et al. 2003, already gated as
``winnow_fp``) indexed corpus-wide, so a span is flagged when one of its
selected k-grams also appears in ``min_docs``-or-more other documents.

:func:`duplicate_spans` -> one row per flagged span: maximal runs of
selected, corpus-shared k-grams, merged when they overlap or touch.
Guarantee inherited from winnowing: any passage of length >=
``k + window - 1`` shared verbatim (after normalization) by enough
documents yields at least one selected shared fingerprint, so no long
duplicated passage escapes with zero flagged spans; boundaries are cores,
not exact extents (selected grams sample ~2/(window+1) of positions).
Downstream either drops the span's documents, masks ``[span_start,
span_end)`` in the NORMALIZED text, or audits.

100 TB stance: one corpus-sized fingerprint pass (the winnow window per
doc), ONE groupBy(fp) to find shared fingerprints, one equi-join back on
fp (inverted index — never pairwise), one per-doc window to merge
intervals. A boilerplate fingerprint present in millions of documents
costs its occurrence count linearly (each occurrence joins one flag row)
— no quadratic bucket blowup anywhere. No ``collect``, no Python rows.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import winnow_occurrences

__all__ = ["duplicate_spans"]


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 7,
    window: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """-> (id_col, span_start BIGINT, span_end BIGINT, n_grams BIGINT):
    merged spans of winnow-selected k-grams whose fingerprint occurs in at
    least ``min_docs`` DISTINCT documents (including this one).

    Offsets are 1-based character positions into the NORMALIZED text
    (lowercased, trimmed, whitespace collapsed — the same normalization
    ``winnow_fingerprints`` hashes), ``span_end`` exclusive; two selected
    grams merge into one span when their [pos, pos+k) intervals overlap
    or touch. ``n_grams`` counts the selected grams backing the span —
    a crude span-confidence signal (1 = a lone 7-char match; large =
    a long verbatim passage).
    """
    if min_docs < 2:
        raise ValueError(
            f"duplicate_spans: min_docs must be >= 2 (got {min_docs}) — "
            "1 would flag every selected gram in the corpus")
    occ = winnow_occurrences(docs, text_col, id_col, k=k, window=window)
    # Shared-fp filter in ONE pass over occ (round 6, guide §2.4): the old
    # groupBy(fp) -> join-back shape computed the whole winnowing subtree
    # TWICE (once per consumer — no exchange reuse, the partial-agg side
    # differs) and paid a second equi-join exchange. Two window functions
    # over the same fp partitioning share one Exchange + one sort:
    # __first marks the first row of each (fp, doc) run in the (id, pos)
    # sort order, its partition-wide sum is exactly
    # count_distinct(id) per fp. NULL fps (NULL-text docs) are dropped
    # explicitly — the old equi-join dropped them implicitly.
    w_fp = Window.partitionBy("fp").orderBy(id_col, "pos")
    first = F.when(
        F.lag(id_col).over(w_fp).isNull()
        | (F.lag(id_col).over(w_fp) != F.col(id_col)),
        F.lit(1)).otherwise(F.lit(0))
    hits = (
        occ.where(F.col("fp").isNotNull())
        .withColumn("__first", first)
        .withColumn("__nd", F.sum("__first").over(Window.partitionBy("fp")))
        .where(F.col("__nd") >= min_docs)
        .drop("__first", "__nd")
    )  # inverted index: one shuffle on fp, no pairs

    # gaps-and-islands with FIXED-length intervals: sorted by pos, the
    # running max end is simply lag(pos) + k, so a new island starts
    # exactly when the gap since the previous gram exceeds k
    w = Window.partitionBy(id_col).orderBy("pos")
    grp = F.sum(
        F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0))
        .otherwise(F.lit(1))
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        hits.withColumn("__g", grp)
        .groupBy(id_col, "__g")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .drop("__g")
    )
