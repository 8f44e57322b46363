"""Single-pass table profiling — the data-quality census a training-data
pipeline runs before (and after) every transform.

The reference's only profiling is the per-file quad counter in its sink
headers (file/StreamSourceMetaData.scala:7-49); a 100 TB corpus wants the
standard column census: rows, nulls, distincts per column, in ONE pass.

Shape: one aggregate computes ``3 × n_cols`` measures over a single scan
(count + null-count + count(DISTINCT col) per column — Catalyst plans the
multi-distinct via one Expand + two-phase aggregate, still a single scan
of the input), then one ``stack`` unpivot to the long
``(column, n_rows, n_null, n_distinct)`` form. All counts are exact
BIGINTs, so the gate compares bit-for-bit with the DuckDB replay. With
``approx=True`` the distincts switch to ``approx_count_distinct`` (HLL++)
— the 100 TB default, where exact multi-distinct's Expand multiplies scan
rows by the column count; approximate sketches differ across engines, so
that variant is pytest-covered rather than oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """-> DataFrame(col_name STRING, n_rows BIGINT, n_null BIGINT,
    n_distinct BIGINT), one row per profiled column (default: all).
    ``n_distinct`` counts distinct NON-NULL values (SQL count-distinct
    semantics, matching DuckDB)."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    # count(DISTINCT) cannot be planned over MapType (not groupable) in
    # either mode — fail up front with the fix instead of an
    # AnalysisException mid-plan (round-5 review finding)
    from pyspark.sql.types import MapType

    maps = [c for c in cols
            if isinstance(df.schema[c].dataType, MapType)]
    if maps:
        raise ValueError(
            f"profile_table: map-typed columns {maps} have no distinct "
            f"count — pass columns= excluding them")
    distinct_fn = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        # backtick-quoted, not bare F.col(c): a top-level name containing
        # '.' must not be parsed as struct-field access (round-5 review
        # finding); embedded backticks double per Spark quoting rules
        qc = F.col("`" + c.replace("`", "``") + "`")
        aggs.append(F.count(F.when(qc.isNull(), 1))
                    .alias(f"__null_{i}"))
        aggs.append(distinct_fn(qc).alias(f"__dist_{i}"))
    one = df.agg(*aggs)
    labels = [c.replace("\\", "\\\\").replace("'", "\\'") for c in cols]
    stack_args = ", ".join(
        f"'{lab}', __null_{i}, __dist_{i}" for i, lab in enumerate(labels))
    return one.select(
        F.expr(f"stack({len(cols)}, {stack_args}) "
               f"AS (col_name, n_null, n_distinct)"),
        F.col("__rows").alias("n_rows"),
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )
