"""Entity-link candidate generation + scoring.

Reinterprets the reference's Solr candidate retrieval + payload-BM25 scoring
(solr/SolrHandler.java:296-322, solr/PayloadBM25SimilarityFacory.java:38-41)
as: character-n-gram MinHash-style blocking (an inverted-index join — no
cross join) followed by an expression-only score combining n-gram Jaccard
with the form-weight prior (the payload boost analog: score ∝ sim ×
weight, SolrLoader.scala:153-154).

The gazetteer side is small (dimension table) and broadcast; the mention
side is the 10^12-row fact side. All pure Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams of the lowercased form."""
    s = F.lower(F.trim(col))
    k = F.length(s) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(F.sequence(F.lit(1), k), lambda i: F.substring(s, i, n)),
    ).otherwise(F.array(s))
    return F.array_distinct(grams)


def link_candidates(
    mentions: DataFrame,
    catalog: DataFrame,
    mention_col: str = "surface",
    catalog_form_col: str = "surface_form",
    ngram_n: int = 3,
    min_jaccard: float = 0.4,
) -> DataFrame:
    """-> (surface, entity_iri, form_weight, jaccard): candidate links whose
    char-n-gram Jaccard clears the blocking threshold. Inverted-index join on
    the n-gram (catalog side broadcast after explode)."""
    m = mentions.select(F.col(mention_col).alias("surface")).distinct()
    m_sets = m.select("surface", char_ngrams(F.col("surface"), ngram_n).alias("__mg"))
    # gram sets per DISTINCT candidate FORM: the Jaccard is a property of
    # the (surface string, form string) pair, so catalog rows sharing a
    # surface_form (ambiguous gazetteers — the case score_and_pick's
    # tie-break exists for) must not multiply the intersection count; the
    # old per-row explode inflated __inter N-fold and a 2-way exact match
    # divided by zero and was silently DROPPED (round-5 review finding).
    f_sets = (
        catalog.select(F.col(catalog_form_col).alias("cand_form")).distinct()
        .select("cand_form",
                char_ngrams(F.col("cand_form"), ngram_n).alias("__cg"))
    )
    # sizes ride the exploded rows (constant per key) instead of a second
    # scan+join against the fact-side gram build (round-5 review finding)
    m_inv = m_sets.select(
        "surface", F.size("__mg").alias("__msz"),
        F.explode("__mg").alias("__g"))
    f_inv = f_sets.select(
        "cand_form", F.size("__cg").alias("__csz"),
        F.explode("__cg").alias("__g"))
    pairs = (
        m_inv.join(F.broadcast(f_inv), "__g")
        .groupBy("surface", "cand_form", "__msz", "__csz")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    out = (
        pairs.select(
            "surface", "cand_form",
            (F.col("__inter")
             / (F.col("__msz") + F.col("__csz") - F.col("__inter"))
             ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .join(
            F.broadcast(catalog.select(
                F.col(catalog_form_col).alias("cand_form"),
                "entity_iri", "form_weight")),
            "cand_form",
        )
        .select("surface", "entity_iri", "form_weight", "jaccard")
    )
    return out


def score_and_pick(candidates: DataFrame) -> DataFrame:
    """score = jaccard × form_weight (the payload-boost shape,
    PayloadBM25SimilarityFacory.java:38-41); keep the best candidate per
    surface, deterministic tie-break by entity_iri."""
    scored = candidates.withColumn("score", F.col("jaccard") * F.col("form_weight"))
    w = Window.partitionBy("surface").orderBy(F.desc("score"), F.asc("entity_iri"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("surface", "entity_iri", F.round("score", 6).alias("score"))
    )


def link_surface_forms(
    mentions: DataFrame,
    catalog: DataFrame,
    mention_col: str = "surface",
    ngram_n: int = 3,
    min_jaccard: float = 0.4,
) -> DataFrame:
    """Blocking + scoring end-to-end: one best entity_iri per surface form."""
    cands = link_candidates(mentions, catalog, mention_col, ngram_n=ngram_n,
                            min_jaccard=min_jaccard)
    return score_and_pick(cands)
