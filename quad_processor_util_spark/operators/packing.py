"""Deterministic global ordering + sequence packing for training-data
pipelines.

Two staples of turning a filtered corpus into actual pretraining batches:

- :func:`shuffle_rank` — a deterministic global "shuffle": every row gets
  a stable 0-based position in md5-hash order, the training-order
  randomization pass (reproducible across runs, retries and cluster
  sizes, unlike ``rand()``/``zipWithIndex`` whose numbering depends on
  partitioning);
- :func:`pack_sequences` — GPT-style concat-and-chunk packing: documents
  are laid out end-to-end in that same deterministic order and sliced
  into fixed ``block_tokens`` training sequences; each output row is one
  (document × block) slice, so a downstream tokenizer can materialize
  block ``seq_id`` from its slices without ever touching a token stream
  wider than one document.

Both need an exact GLOBAL prefix over a total order — the one primitive a
naive DataFrame solution gets wrong at scale (a single unpartitioned
``Window.orderBy`` funnels 100 TB through one task). The scaffold here is
the classic two-pass distributed scan, expressed declaratively:

1. range-bucket every row by the HIGH BITS of its 60-bit md5 order key
   (so bucket order == key order, and md5 uniformity makes bucket sizes
   even — no sampling pass needed, unlike ``repartitionByRange``);
2. per-bucket ``Window`` (partitioned, parallel) computes local ranks and
   local token cumsums;
3. a tiny per-bucket aggregate (``n_buckets`` rows) turns into exclusive
   bucket offsets with a window over that aggregate alone — the only
   unpartitioned window runs over n_buckets rows, not the corpus — and is
   broadcast-joined back.

Global position = bucket offset + local position. Results are invariant
to ``n_buckets`` (it only splits a fixed total order), which the tests
assert. The reference engine has no packing utilities; this belongs to
the beyond-the-reference training-data family (SURVEY.md §2,
LLM-pipeline operators), composing with :mod:`.sampling` (sample → split
→ shuffle → pack) and ``functions.text.chunk_documents`` (which chunks
WITHIN documents; packing concatenates ACROSS them).

100 TB stance: one shuffle on the bucket key (uniform by construction),
one broadcast join of an n_buckets-row dimension, and for packing a
``sequence()`` explode whose fan-out per row is ``1 + slices-1`` (a
document spans ``ceil(n_tokens / block_tokens) + 1`` blocks at most —
bounded, data-independent given a length cap upstream). The bucket
count/total branch is a second SCAN of the source, but Catalyst prunes
it to just the id (+ token-count) column with map-side partial
aggregation — one narrow column of extra I/O, not a second pass over
the table's bytes (asserted in tests).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import KEY_BITS, seeded_key

__all__ = ["shuffle_rank", "pack_sequences"]


def _bucketed(df: DataFrame, id_col: str, seed: int,
              n_buckets: int) -> DataFrame:
    """Append the shared 60-bit order key (:func:`.sampling.seeded_key` —
    full range, no modulus, so the induced order is as collision-free as
    md5; ties break on the id itself, and a NULL id hashes as '' on both
    the Spark and DuckDB sides) plus its high-bits range bucket."""
    if (n_buckets < 1 or (n_buckets & (n_buckets - 1)) != 0
            or n_buckets > (1 << KEY_BITS)):
        raise ValueError(
            "packing: n_buckets must be a positive power of two "
            f"<= 2^{KEY_BITS} (got {n_buckets}) so buckets are exact "
            "key ranges")
    clash = [c for c in df.columns if c.startswith("_pk_")]
    if clash:
        # silently overwriting (and later dropping) a caller's _pk_* column
        # would corrupt ordering or eat data — fail loudly (round-5 advice)
        raise ValueError(
            f"packing: input columns {clash} collide with the _pk_* "
            f"internal namespace — rename them before calling")
    bits = n_buckets.bit_length() - 1
    key = seeded_key(F.col(id_col), seed)
    # high bits => bucket order == key order (range bucketing without the
    # sampling job repartitionByRange would run); shiftright keeps the
    # arithmetic in long range where key * n_buckets would overflow
    return (
        df.withColumn("_pk_key", key)
          .withColumn("_pk_bucket",
                      F.shiftright(F.col("_pk_key"), KEY_BITS - bits)
                      if bits else F.lit(0)))


def shuffle_rank(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 1024,
    rank_col: str = "shuffle_pos",
) -> DataFrame:
    """Append ``rank_col``: this row's 0-based position in the
    deterministic global shuffle order ``(md5(id:seed), id)``.

    A pure function of (ids present, seed): stable under task retry,
    repartitioning and cluster size — reshuffling a grown corpus with the
    same seed keeps surviving rows in the same relative order. Use it to
    fix training order (``ORDER BY shuffle_pos``) or as the preference
    order for :func:`~.sampling.group_quota`.
    """
    b = _bucketed(df, id_col, seed, n_buckets)
    w = Window.partitionBy("_pk_bucket").orderBy("_pk_key", id_col)
    local = b.withColumn("_pk_local", F.row_number().over(w) - F.lit(1))
    # The counts branch IS a second pass over the source — deliberate.
    # Catalyst prunes it to an id-only scan with map-side partial counts
    # (verified ReadSchema struct<doc_id> vs the full row on the main
    # branch; tested), so pass 2 costs one column's I/O + md5 and ships
    # n_buckets partial rows. ReuseExchange can't fire here (that same
    # pruning makes the two exchanges canonically different), and
    # persisting the bucketed corpus to save an id-column re-read is the
    # bigger-than-input-cache trap measured in the jaccard A/B.
    counts = local.groupBy("_pk_bucket") \
        .agg(F.count(F.lit(1)).alias("_pk_n"))
    off_w = Window.orderBy("_pk_bucket") \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pk_bucket",
        F.coalesce(F.sum("_pk_n").over(off_w), F.lit(0)).alias("_pk_off"))
    return (
        local.join(F.broadcast(offsets), "_pk_bucket")
        .withColumn(rank_col,
                    (F.col("_pk_off") + F.col("_pk_local")).cast("long"))
        .drop("_pk_bucket", "_pk_key", "_pk_local", "_pk_off")
    )


def pack_sequences(
    df: DataFrame,
    block_tokens: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 1024,
) -> DataFrame:
    """-> (id_col, seq_id BIGINT, block_offset BIGINT, tok_start BIGINT,
    slice_len BIGINT): concat-and-chunk packing of the corpus into fixed
    ``block_tokens`` training sequences.

    Documents are laid end-to-end in the deterministic shuffle order of
    :func:`shuffle_rank` and the token stream is cut every
    ``block_tokens``; a document straddling a cut contributes one row per
    block it touches (tokens ``[tok_start, tok_start + slice_len)`` of
    the document land at ``block_offset`` of block ``seq_id``) — exactly
    the layout a batch materializer needs to build block ``seq_id`` by
    equi-joining slices to documents, never holding more than one
    document's tokens plus one block in memory.

    Rows with NULL or non-positive ``n_tokens_col`` are dropped (nothing
    to pack); every surviving token is emitted exactly once
    (``sum(slice_len) == sum(n_tokens)``, asserted in tests). The final
    partial block is emitted short rather than padded — pad or drop
    downstream per training recipe.
    """
    if block_tokens < 1:
        raise ValueError("pack_sequences: block_tokens must be >= 1")
    b = _bucketed(
        df.where(F.col(n_tokens_col).cast("long") > 0), id_col, seed,
        n_buckets)
    n_tok = F.col(n_tokens_col).cast("long")
    w = Window.partitionBy("_pk_bucket").orderBy("_pk_key", id_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    local = b.select(
        id_col, "_pk_bucket", "_pk_key", n_tok.alias("_pk_len"),
        F.coalesce(F.sum(n_tok).over(w), F.lit(0)).alias("_pk_cum"))
    # deliberate second pass, pruned to (id, n_tokens) — see shuffle_rank
    totals = local.groupBy("_pk_bucket") \
        .agg(F.sum("_pk_len").alias("_pk_t"))
    off_w = Window.orderBy("_pk_bucket") \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pk_bucket",
        F.coalesce(F.sum("_pk_t").over(off_w), F.lit(0)).alias("_pk_off"))

    start = F.col("_pk_off") + F.col("_pk_cum")
    end = start + F.col("_pk_len")
    blk = F.lit(int(block_tokens)).cast("long")
    placed = (
        local.join(F.broadcast(offsets), "_pk_bucket")
        .select(id_col, start.alias("_pk_s"), end.alias("_pk_e"))
        .select(
            id_col, "_pk_s", "_pk_e",
            # integer `div`, not `/`: double division loses exact floors
            # once cumulative offsets pass 2^53-ish token counts
            F.explode(
                F.sequence(
                    F.expr(f"_pk_s div {int(block_tokens)}"),
                    F.expr(f"(_pk_e - 1) div {int(block_tokens)}"))
            ).alias("seq_id"))
    )
    blk_start = F.col("seq_id") * blk
    slice_from = F.greatest(F.col("_pk_s"), blk_start)
    slice_to = F.least(F.col("_pk_e"), blk_start + blk)
    return placed.select(
        id_col,
        F.col("seq_id"),
        (slice_from - blk_start).alias("block_offset"),
        (slice_from - F.col("_pk_s")).alias("tok_start"),
        (slice_to - slice_from).alias("slice_len"),
    )
