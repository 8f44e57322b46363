"""Round-4 regressions: hybrid \\uXXXX parse route, NaN-aware sortedness,
tolerant size-conf parsing, repartition-aware parallelism guard, scoped
cache release for composed pipelines."""

from __future__ import annotations

import pandas as pd
import pytest


class TestHybridUnicodeParse:
    def test_unicode_escaped_lines_agree_across_paths(self, spark):
        from quad_processor_util_spark.functions.nt import (
            parse_nt_expr, parse_nt_lines,
        )

        lines = [
            # \uXXXX in every literal position, mixed with clean lines so the
            # rlike split exercises both branches of the hybrid union
            r'<http://s> <http://p> "café" .',
            r'<http://s> <http://p> "astral \U0001F600 x" .',
            r'<http://s> <http://p> "mix\tAb" .',
            r'<http://s> <http://p> "u-langü"@de .',
            r'<http://s> <http://p> "u-dtß"^^<http://ex.org/dt> .',
            '<http://s> <http://p> "clean" .',
            "<http://s> <http://p> <http://o> <http://g> .",
            # backslash-escaped backslash before u: NOT a unicode escape —
            # routed to the exact path by the cheap rlike, which must still
            # return backslash + 'u0041' literally, not 'A'
            r'<http://s> <http://p> "not\\u0041esc" .',
        ]
        df = spark.createDataFrame(pd.DataFrame({"line": lines}))
        cols = ["subject", "predicate", "obj", "datatype", "language", "graph"]
        fast = sorted(tuple(r) for r in
                      parse_nt_expr(df).select(*cols).collect())
        exact = sorted(tuple(r) for r in
                       parse_nt_lines(df).select(*cols).collect())
        assert fast == exact
        objs = {r[2] for r in fast}
        assert "café" in objs
        assert "astral \U0001F600 x" in objs
        assert "mix\tAb" in objs
        assert "not\\u0041esc" in objs

    def test_hybrid_false_keeps_raw_residual(self, spark):
        from quad_processor_util_spark.functions.nt import parse_nt_expr

        # a REAL \u escape (raw text 'café'): hybrid=False has no
        # codepoint constructor and must pass the sequence through verbatim
        # — the documented pure-JVM residual; hybrid=True must decode it
        df = spark.createDataFrame(pd.DataFrame({
            "line": ['<http://s> <http://p> "caf\\u00e9" .'],
        }))
        raw = parse_nt_expr(df, hybrid=False).collect()
        assert raw[0].obj == "caf\\u00e9"
        dec = parse_nt_expr(df, hybrid=True).collect()
        assert dec[0].obj == "café"


class TestNaNSortedness:
    def test_nan_last_double_column_is_sorted(self, spark):
        from quad_processor_util_spark.operators.sort import (
            is_globally_sorted,
        )

        # Spark's own sort puts NaN LAST (greater than any real); the check
        # must agree instead of bucketing NaN with nulls-first (r3 advice)
        df = spark.createDataFrame(
            [(1.0,), (2.5,), (float("nan"),)], "v double"
        )
        assert is_globally_sorted(df.orderBy("v").coalesce(1), "v") is True
        # NaN ahead of the reals is NOT Spark-sorted
        df2 = spark.createDataFrame(
            [(float("nan"),), (1.0,), (2.5,)], "v double"
        )
        assert is_globally_sorted(df2.coalesce(1), "v") is False

    def test_assert_sorted_nan_last(self, spark):
        from quad_processor_util_spark.operators.grouping import assert_sorted

        df = spark.createDataFrame(
            [("a", 1.0), ("a", float("nan")), ("b", 0.5)],
            "k string, v double",
        )
        assert assert_sorted(df.coalesce(1), "k", "v") == 0


class TestSizeConfParsing:
    def test_extended_suffixes_and_floats(self):
        from quad_processor_util_spark.operators.dedup import _size_bytes

        assert _size_bytes("2t") == 2 << 40
        assert _size_bytes("1tb") == 1 << 40
        assert _size_bytes("1p") == 1 << 50
        assert _size_bytes("0.5g") == 512 << 20
        assert _size_bytes("1.5m") == int(1.5 * (1 << 20))
        # unparseable values degrade to the 128 MB default, never raise
        assert _size_bytes("weird") == 128 << 20
        assert _size_bytes("") == 128 << 20


class TestParallelismGuard:
    def test_explicit_repartition_not_reshuffled(self, spark, tmp_path):
        from quad_processor_util_spark.operators.dedup import (
            _ensure_parallelism,
        )

        p = str(tmp_path / "tiny.parquet")
        spark.range(100).selectExpr(
            "cast(id as string) doc_id", "repeat('x', 10) text"
        ).coalesce(1).write.mode("overwrite").parquet(p)
        df = spark.read.parquet(p)
        # raw tiny scan: guard re-spreads it
        spread = _ensure_parallelism(df)
        assert spread is not df
        # caller already repartitioned: guard must trust that and not add a
        # second shuffle (r3 advice — redundant-exchange fix)
        pre = df.repartition(8)
        assert _ensure_parallelism(pre) is pre


class TestScopedCacheRelease:
    def test_cache_registry_collects_and_unpersists(self, spark):
        from quad_processor_util_spark.plans.pipeline import (
            EX, link_unknown_mentions,
        )

        quads = spark.createDataFrame(
            [
                ("http://t/1", EX + "mentionSurface", "acme corp",
                 None, None, "http://g", None),
                ("http://t/1", EX + "role", "assistant",
                 "http://www.w3.org/2001/XMLSchema#string", None,
                 "http://g", None),
            ],
            "subject string, predicate string, obj string, datatype string,"
            " language string, graph string, dataset string",
        )
        catalog = spark.createDataFrame(
            [("acme corp", "http://e/acme", 1.0)],
            "surface_form string, entity_iri string, form_weight double",
        )
        reg: list = []
        out = link_unknown_mentions(quads, catalog, cache_registry=reg)
        out.count()
        assert len(reg) == 1 and reg[0].is_cached
        for d in reg:
            d.unpersist()
        assert not reg[0].is_cached
