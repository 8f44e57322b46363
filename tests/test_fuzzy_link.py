"""Fuzzy linking stage: unknown-mention placeholders -> linked entity quads."""

import pandas as pd
from pyspark.sql import functions as F

from quad_processor_util_spark.datagen import build_entity_catalog, build_gazetteer
from quad_processor_util_spark.oracle import Gazetteer, find_unknown_mentions
from quad_processor_util_spark.plans.pipeline import (
    extract_quads,
    link_unknown_mentions,
)


class TestFindUnknownMentions:
    def test_excludes_known_spans(self):
        gaz = Gazetteer({"Ada Lovelace": "http://x/Ada"})
        ms = gaz.find_all("Ada Lovelace met Grace Hoper in Bostn")
        unknown = find_unknown_mentions("Ada Lovelace met Grace Hoper in Bostn", ms)
        assert unknown == ["Grace Hoper", "Bostn"]

    def test_dedup_and_boundaries(self):
        unknown = find_unknown_mentions("Bostn and Bostn again, lowercase ok", [])
        assert unknown == ["Bostn"]


class TestPipelineFuzzyLink:
    def test_misspelled_entities_get_linked(self, spark):
        catalog = build_entity_catalog()
        gaz = build_gazetteer(catalog)
        pdf = pd.DataFrame({
            "conv_id": ["c1", "c1"],
            "turn_idx": pd.array([0, 1], dtype="int32"),
            "role": ["user", "user"],
            "text": [
                "Ada Lovelace works at Hopper Labs.",  # fully known
                "I met Grace Hoper yesterday.",        # misspelled -> fuzzy
            ],
            "tool": [None, None],
            "ts": pd.to_datetime(["2026-01-01", "2026-01-01"]).astype("datetime64[us]"),
        })
        tr = spark.createDataFrame(pdf)
        quads = extract_quads(tr, gaz.surface_to_iri, emit_unknown=True)
        linked = link_unknown_mentions(quads, spark.createDataFrame(catalog))
        rows = linked.collect()
        # the known relation survives untouched
        assert any(r.predicate.endswith("worksAt") for r in rows)
        # the misspelled mention resolves to Grace_Hopper as an object quad
        mention_rows = [r for r in rows if r.predicate.endswith("/mentions")]
        assert len(mention_rows) == 1
        m = mention_rows[0]
        assert m.obj.endswith("Grace_Hopper")
        assert m.subject == "http://example.org/conv/c1/turn/1"
        assert m.datatype is None
        # no placeholder quads leak through
        assert not any(r.predicate.endswith("mentionSurface") for r in rows)
