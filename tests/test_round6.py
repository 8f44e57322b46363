"""Round-6 optimization regression tests: every rewrite that changed an
operator's internals is pinned bit-identical to the shape it replaced."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from quad_processor_util_spark.session import get_spark

    return get_spark("test-round6", parallelism=4, shuffle_partitions=4)


# ---------------------------------------------------------------------------
# winnow: mapInPandas fast path vs the original expression form
# ---------------------------------------------------------------------------

_WINNOW_TEXTS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank."),
    (2, "the  QUICK\tbrown fox  jumps over the lazy dog near the river bank"),
    (3, None),                      # NULL text -> one (id, NULL[, NULL]) row
    (4, ""),                        # empty -> md5("") partial-gram row
    (5, "short"),                   # < k chars -> single truncated gram
    (6, "exactly"),                 # == k chars -> one full gram
    (7, "abcabcabcabcabcabcabcabc"),  # periodic: repeated fingerprints
    (8, "naïve café über straße — ünïcödé text with combining marks"),
    (9, "x" * 300),                 # constant text: all grams identical
    (10, "A sentence that is long enough to exercise several full windows "
         "of the winnowing selection, with mixed CASE and   spacing."),
]


@pytest.mark.parametrize("with_pos", [False, True])
def test_winnow_fast_path_matches_expression_form(spark, with_pos):
    from quad_processor_util_spark.functions.text import (
        _winnow_selected,
        _winnow_selected_expr,
    )

    df = spark.createDataFrame(_WINNOW_TEXTS, "doc_id long, text string")
    kw = dict(text_col="text", id_col="doc_id", k=7, window=4,
              with_pos=with_pos)
    fast = _winnow_selected(df, **kw).collect()
    ref = _winnow_selected_expr(df, **kw).collect()
    key = (lambda r: (r.doc_id, r.fp if r.fp is not None else -1,
                      r.pos if r.pos is not None else -1)) if with_pos else (
        lambda r: (r.doc_id, r.fp if r.fp is not None else -1))
    assert sorted(map(key, fast)) == sorted(map(key, ref))


def test_word_shingle_rows_matches_expression_form(spark):
    from quad_processor_util_spark.operators.dedup import (
        word_shingle_rows,
        word_shingles,
    )

    rows = [
        (1, None), (2, ""), (3, "   "), (4, "one"), (5, "two words"),
        (6, "a b c d e f"), (7, "a a a a a a"),         # dup shingles
        (8, "Mixed   CASE\ttokens  here and naïve ünïcödé words too"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = word_shingle_rows(df, "text", "doc_id", 3).collect()
    ref = df.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("__sh")
    ).collect()
    assert sorted((r["doc_id"], r["__sh"]) for r in fast) \
        == sorted((r["doc_id"], r["__sh"]) for r in ref)


def test_winnow_fast_path_rejects_oversized_docs(spark):
    from quad_processor_util_spark.functions.text import winnow_fingerprints

    # m = len - k + 1 must reach the 2^20 packing span (k = 7)
    big = spark.createDataFrame(
        [(1, "y" * ((1 << 20) + 6))], "doc_id long, text string")
    with pytest.raises(Exception, match="chunk it upstream"):
        winnow_fingerprints(big).collect()


def test_packing_rejects_pk_namespace_collision(spark):
    from quad_processor_util_spark.operators.packing import shuffle_rank

    df = spark.createDataFrame([(1, 5)], "doc_id long, _pk_key long")
    with pytest.raises(ValueError, match="_pk_"):
        shuffle_rank(df)


def test_decontaminate_rejects_min_hits_zero(spark):
    from quad_processor_util_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_hits"):
        decontaminate(docs, docs, min_hits=0)


def test_group_quota_rejects_internal_rank_collision(spark):
    from quad_processor_util_spark.operators.sampling import group_quota

    df = spark.createDataFrame(
        [(1, "g", 3)], "doc_id long, grp string, __gq_rank long")
    with pytest.raises(ValueError, match="__gq_rank"):
        group_quota(df, group_col="grp", quota=1)
