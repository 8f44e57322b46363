"""Operator tests: joins (salted == plain), connected components vs
union-find oracle, grouping/star-view, sortedness assertion."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from quad_processor_util_spark.datagen import build_alias_edges
from quad_processor_util_spark.operators.cc import canonical_mapping, connected_components
from quad_processor_util_spark.operators.grouping import (
    assert_sorted,
    grouped_apply,
    run_boundary_groups,
    sorted_group_scan,
    star_view,
)
from quad_processor_util_spark.operators.joins import (
    broadcast_join,
    left_anti_membership,
    salted_join,
)
from quad_processor_util_spark.oracle import resolve_canonical


class TestJoins:
    def test_salted_equals_plain(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        plain = (
            orders.join(customer, orders.o_custkey == customer.c_custkey)
            .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
        )
        fact = orders.withColumnRenamed("o_custkey", "k")
        dim = customer.withColumnRenamed("c_custkey", "k")
        salted = (
            salted_join(fact, dim, "k", salt_buckets=4)
            .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    def test_broadcast_plan_is_broadcast(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        j = broadcast_join(orders, customer, orders.o_custkey == customer.c_custkey)
        assert "BroadcastHashJoin" in j._jdf.queryExecution().executedPlan().toString()

    def test_left_anti(self, spark, sf_dir):
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        banned = orders.select(F.col("o_custkey").alias("c_custkey"))
        no_orders = left_anti_membership(customer, banned, "c_custkey")
        total = customer.count()
        with_orders = customer.join(banned.distinct(), "c_custkey", "left_semi").count()
        assert no_orders.count() == total - with_orders


class TestConnectedComponents:
    def test_matches_union_find(self, spark):
        edges_pdf = build_alias_edges(42)
        edges = spark.createDataFrame(edges_pdf)
        mapping, excluded = canonical_mapping(edges)
        got = {r.node: r.canonical for r in mapping.collect()}
        exp_map, exp_excl = resolve_canonical(
            list(zip(edges_pdf["src_iri"], edges_pdf["dst_iri"], edges_pdf["edge_kind"]))
        )
        # compare on common domain: every CC node label must equal the oracle's
        for node, canon in got.items():
            assert exp_map.get(node, node) == canon, node
        assert {r.iri for r in excluded.collect()} == exp_excl

    def test_cycle_converges(self, spark):
        pdf = pd.DataFrame({
            "src_iri": ["a", "b", "c"], "dst_iri": ["b", "c", "a"],
        })
        cc = connected_components(spark.createDataFrame(pdf))
        labels = {r.node: r.canonical for r in cc.collect()}
        assert set(labels.values()) == {"a"}


class TestGrouping:
    def test_sorted_group_scan_runs_are_contiguous_and_sorted(self, spark, sf_dir):
        events = spark.read.parquet(f"{sf_dir}/events.parquet").limit(5000)
        out = sorted_group_scan(events, "user_id", "ts")

        def check(it):
            for pdf in it:
                # within a batch, user_id runs are contiguous & ts sorted per run
                prev_user, prev_ts, seen = None, None, set()
                for r in pdf.itertuples():
                    if r.user_id != prev_user:
                        assert r.user_id not in seen, "non-contiguous run"
                        seen.add(r.user_id)
                        prev_user, prev_ts = r.user_id, r.ts
                    else:
                        assert r.ts >= prev_ts
                        prev_ts = r.ts
                yield pdf[["event_id"]]

        n = out.mapInPandas(check, "event_id long").count()
        assert n == 5000

    def test_grouped_apply_order(self, spark, fixtures_dir):
        tr = spark.read.parquet(f"{fixtures_dir}/transcripts.parquet")

        def first_text(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "conv_id": [pdf["conv_id"].iloc[0]],
                "first_turn": [int(pdf["turn_idx"].iloc[0])],
            })

        out = grouped_apply(tr, "conv_id", first_text,
                            "conv_id string, first_turn int", order="turn_idx")
        rows = out.collect()
        assert all(r.first_turn == 0 for r in rows)
        assert len(rows) == tr.select("conv_id").distinct().count()

    def test_run_boundary_groups_sees_whole_groups(self, spark, fixtures_dir):
        tr = spark.read.parquet(f"{fixtures_dir}/transcripts.parquet")

        def agg(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n": [len(pdf)],
                "ordered": [bool((pdf["turn_idx"].diff().dropna() > 0).all())],
            })

        out = run_boundary_groups(tr, "conv_id", agg,
                                  "conv_id string, n long, ordered boolean",
                                  order="turn_idx")
        got = {r.conv_id: (r.n, r.ordered) for r in out.collect()}
        exp = {r.conv_id: r["count"] for r in tr.groupBy("conv_id").count().collect()}
        assert {k: v[0] for k, v in got.items()} == exp
        assert all(v[1] for v in got.values())

    def test_star_view(self, spark):
        pdf = pd.DataFrame({
            "subject": ["s1"] * 4 + ["s2"],
            "predicate": [
                "http://www.w3.org/2000/01/rdf-schema#label",
                "http://www.w3.org/2000/01/rdf-schema#label",
                "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                "http://example.org/ontology/sameAs",
                "http://www.w3.org/2000/01/rdf-schema#label",
            ],
            "obj": ["Alpha", "Beta", "http://t/T1", "http://same/x", "Gamma"],
            "datatype": [None] * 5, "language": [None] * 5,
            "graph": [None] * 5, "dataset": [None] * 5,
        })
        sv = star_view(spark.createDataFrame(pdf)).orderBy("subject").collect()
        s1 = sv[0]
        assert s1.label == "Alpha" and s1.altLabels == ["Beta"]
        assert s1.types == ["http://t/T1"] and s1.sameAs == ["http://same/x"]
        assert sv[1].label == "Gamma" and sv[1].altLabels == []

    def test_assert_sorted(self, spark, fixtures_dir):
        tr = spark.read.parquet(f"{fixtures_dir}/transcripts.parquet")
        # the fixture is emitted in SHUFFLED order by design (datagen) —
        # the physical check must SEE that (the old window-based
        # assert_sorted returned 0 on any input and asserted 0 here)
        assert assert_sorted(tr.coalesce(1), "conv_id", "turn_idx") > 0
        assert assert_sorted(
            sorted_group_scan(tr, "conv_id", "turn_idx"),
            "conv_id", "turn_idx",
        ) == 0
