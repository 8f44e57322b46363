"""Vectorized extraction (plans/extract_vec.extract_batch) must be
byte-identical — rows, values, and per-row order — to the per-row oracle
path (_extract_batch_rows), across policies, overlap shapes, and the
fixture transcripts."""

import numpy as np
import pandas as pd
import pytest

from quad_processor_util_spark.datagen import (
    build_entity_catalog,
    build_gazetteer,
    build_transcripts,
)
from quad_processor_util_spark.oracle import Gazetteer
from quad_processor_util_spark.plans.extract_vec import (
    _extract_batch_rows,
    extract_batch,
)


def _frame(texts, roles=None, tools=None):
    n = len(texts)
    return pd.DataFrame(
        {
            "conv_id": [f"c{i % 3}" for i in range(n)],
            "turn_idx": np.arange(n, dtype="int32"),
            "role": roles or ["user"] * n,
            "text": texts,
            "tool": tools or [None] * n,
            "ts": pd.Timestamp("2026-01-01"),
        }
    )


ADVERSARIAL_TEXTS = [
    "Ada Lovelace works at Turing Institute.",
    "Alan Turing Institute is a staggered overlap trap.",  # staggered forms
    "New York City has population 8000000.",
    "Boston NOW covered Boston.com and Boston.",
    'Grace Hopper is known as "The Grace"@en.',
    'Edsger Dijkstra is known as "esc \\" quote"@pt-br.',
    "York City York City New York City",  # repeated + shared tokens
    "",  # empty
    None,  # null text
    "no mentions at all, just chit-chat",
    "Ada Lovelace, founded Analytical Engines Ltd.",  # comma-stripped connector
    "Turing Institute is located in Cambridge.",
    "London has population 9000000. Cambridge has population 123456.",
    "Unknown Capitalized Run and Another Unknown thing.",
    "Ada Lovelace collaborated with Alan Turing.",
    "Helsinki",  # bare mention, nothing else
    "Knuth Press Knuth Press",  # adjacent same mentions, no connector
]


@pytest.fixture(scope="module")
def gaz():
    return build_gazetteer(build_entity_catalog())


def _check_parity(pdf, gaz, policy="LONGEST_DOMINANT_RIGHT", emit_unknown=False):
    got = extract_batch(pdf, gaz, policy, emit_unknown)
    exp = _extract_batch_rows(pdf, gaz, policy, emit_unknown)
    assert got.columns.tolist() == exp.columns.tolist()
    assert len(got) == len(exp), f"{len(got)} vs {len(exp)}"
    for c in got.columns:
        a = got[c].tolist()
        b = exp[c].tolist()
        assert a == b, f"column {c}: first diff at " + str(
            next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
        )


@pytest.mark.parametrize("policy", ["LONGEST_DOMINANT_RIGHT", "ALL", "NO_SUB"])
@pytest.mark.parametrize("emit_unknown", [False, True])
def test_adversarial_parity(gaz, policy, emit_unknown):
    roles = ["tool" if i % 5 == 0 else "user" for i in range(len(ADVERSARIAL_TEXTS))]
    tools = ["search" if i % 5 == 0 else None for i in range(len(ADVERSARIAL_TEXTS))]
    pdf = _frame(ADVERSARIAL_TEXTS, roles, tools)
    _check_parity(pdf, gaz, policy, emit_unknown)


@pytest.mark.parametrize("emit_unknown", [False, True])
def test_fixture_transcripts_parity(gaz, emit_unknown):
    pdf = build_transcripts(n_convs=80, seed=7)
    _check_parity(pdf, gaz, emit_unknown=emit_unknown)


def test_empty_batch(gaz):
    pdf = _frame([])
    out = extract_batch(pdf, gaz)
    assert len(out) == 0
    assert out.columns.tolist() == _extract_batch_rows(pdf, gaz, "ALL", False).columns.tolist()


def test_nul_separator_fallback(gaz):
    """Texts containing \\x00 take the exact per-row fallback."""
    pdf = _frame(["Ada Lovelace works at Hopper Labs.", "weird\x00byte Ada Lovelace"])
    _check_parity(pdf, gaz)


def test_staggered_overlap_detected():
    """ADVICE regression: 'New York' vs 'York City' are staggered (suffix of
    one is a prefix of the other) — must take the overlap-aware path and
    find BOTH candidate mentions in 'New York City'."""
    g = Gazetteer({"New York": "http://e/NY", "York City": "http://e/YC"})
    assert g.has_overlaps
    found = {(m.start, m.end, m.surface) for m in g.find_all("New York City")}
    assert (0, 8, "New York") in found
    assert (4, 13, "York City") in found
    pdf = _frame(["in New York City today", "York City New York, New York City"])
    for policy in ["LONGEST_DOMINANT_RIGHT", "ALL", "NO_SUB"]:
        _check_parity(pdf, g, policy)


def test_self_overlapping_form():
    # 'a b a' can overlap itself in 'a b a b a' (junctions are spaces, so the
    # word-boundary lookarounds admit both occurrences)
    g = Gazetteer({"a b a": "http://e/aba"})
    assert g.has_overlaps
    _check_parity(_frame(["a b a b a", "x a b a"]), g)
    # 'aba' canNOT self-overlap: the junction char is alnum, which the
    # boundary lookarounds reject — stays on the fast path
    assert not Gazetteer({"aba": "http://e/aba"}).has_overlaps


def test_overlap_free_gazetteer_fast_path():
    g = Gazetteer({"alpha": "http://e/a", "beta": "http://e/b"})
    assert not g.has_overlaps
    _check_parity(_frame(["alpha met beta", "beta beta alpha"]), g)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _WORDS = ["Ada", "Ada Lovelace", "Lovelace", "New York", "York City",
              "New York City", "Boston", "Boston NOW", "works", "at",
              "has", "population", "is", "known", "as", "the", "42",
              "café", '"x"@en', ",", ".", "a b a"]

    @st.composite
    def _texts(draw):
        n = draw(st.integers(1, 12))
        return " ".join(draw(st.sampled_from(_WORDS)) for _ in range(n))

    _GAZ_FORMS = st.sets(
        st.sampled_from(["Ada", "Ada Lovelace", "Lovelace", "New York",
                         "York City", "New York City", "Boston",
                         "Boston NOW", "a b a", "42"]),
        min_size=1, max_size=8,
    )

    @given(forms=_GAZ_FORMS,
           texts=st.lists(_texts(), min_size=1, max_size=8),
           policy=st.sampled_from(["LONGEST_DOMINANT_RIGHT", "ALL", "NO_SUB"]),
           emit_unknown=st.booleans())
    @settings(max_examples=150, deadline=None)
    def test_property_parity(forms, texts, policy, emit_unknown):
        g = Gazetteer({f: f"http://e/{i}" for i, f in enumerate(sorted(forms))})
        pdf = _frame(texts)
        got = extract_batch(pdf, g, policy, emit_unknown)
        exp = _extract_batch_rows(pdf, g, policy, emit_unknown)
        assert got.values.tolist() == exp.values.tolist()
except ImportError:  # pragma: no cover
    pass


def test_empty_gazetteer():
    g = Gazetteer({})
    pdf = _frame(["Some Text here", "more"], roles=["tool", "user"],
                 tools=["sql_runner", None])
    _check_parity(pdf, g, emit_unknown=True)


@pytest.mark.parametrize("policy", ["LONGEST_DOMINANT_RIGHT", "ALL", "NO_SUB"])
@pytest.mark.parametrize("emit_unknown", [False, True])
def test_template_memo_repeated_texts_parity(gaz, policy, emit_unknown):
    """Round-6 template path: heavy text repetition (the flagship shape —
    few distinct texts across many rows) must expand per-row quads
    bit-identically, including row-dependent turn IRIs (unknown
    placeholders), graphs, and interleaved tool quads."""
    base = [
        "Ada Lovelace works at Turing Institute.",
        "Unknown Capitalized Run and Another Unknown thing.",
        "London has population 9000000. Cambridge has population 123456.",
        'Grace Hopper is known as "The Grace"@en.',
        "no mentions here",
    ]
    texts = [base[i % len(base)] for i in range(137)]
    roles = ["tool" if i % 7 == 3 else "user" for i in range(len(texts))]
    tools = ["calc" if i % 7 == 3 else None for i in range(len(texts))]
    pdf = _frame(texts, roles, tools)
    _check_parity(pdf, gaz, policy, emit_unknown)


def _check_arrow_parity(pdf, gaz, policy="LONGEST_DOMINANT_RIGHT",
                        emit_unknown=False):
    import pyarrow as pa

    from quad_processor_util_spark.plans.extract_vec import extract_batch_arrow

    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()), ("tool", pa.string()),
    ])
    rb = pa.RecordBatch.from_pandas(
        pdf[["conv_id", "turn_idx", "role", "text", "tool"]],
        schema=schema, preserve_index=False)
    got_rb = extract_batch_arrow(rb, gaz, policy, emit_unknown)
    exp = extract_batch(pdf, gaz, policy, emit_unknown)
    if got_rb is None:
        assert len(exp) == 0
        return
    got = got_rb.to_pandas()
    assert got.columns.tolist() == exp.columns.tolist()
    assert len(got) == len(exp), f"{len(got)} vs {len(exp)}"
    for c in got.columns:
        a = [None if pd.isna(x) else x for x in got[c].tolist()]
        b = exp[c].tolist()
        assert a == b, f"column {c}: first diff at " + str(
            next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
        )


@pytest.mark.parametrize("policy", ["LONGEST_DOMINANT_RIGHT", "ALL", "NO_SUB"])
@pytest.mark.parametrize("emit_unknown", [False, True])
def test_arrow_batch_parity(gaz, policy, emit_unknown):
    """Round-6 mapInArrow face: extract_batch_arrow must be value- and
    order-identical to extract_batch on adversarial texts with interleaved
    tool rows and null texts."""
    roles = ["tool" if i % 5 == 0 else "user"
             for i in range(len(ADVERSARIAL_TEXTS))]
    tools = ["search" if i % 5 == 0 else None
             for i in range(len(ADVERSARIAL_TEXTS))]
    pdf = _frame(ADVERSARIAL_TEXTS, roles, tools)
    _check_arrow_parity(pdf, gaz, policy, emit_unknown)


def test_arrow_batch_parity_repeated_and_nul(gaz):
    base = ["Ada Lovelace works at Turing Institute.", None,
            "Unknown Capitalized Run here.", ""]
    texts = [base[i % len(base)] for i in range(97)]
    pdf = _frame(texts)
    _check_arrow_parity(pdf, gaz, emit_unknown=True)
    # \x00 text takes the per-row fallback inside the arrow route too
    pdf2 = _frame(["weird\x00byte Ada Lovelace", "Ada Lovelace works at Hopper Labs."])
    _check_arrow_parity(pdf2, gaz)


def test_arrow_batch_empty(gaz):
    import pyarrow as pa

    from quad_processor_util_spark.plans.extract_vec import extract_batch_arrow

    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()), ("tool", pa.string()),
    ])
    rb = pa.RecordBatch.from_pandas(
        _frame([])[["conv_id", "turn_idx", "role", "text", "tool"]],
        schema=schema, preserve_index=False)
    assert extract_batch_arrow(rb, gaz) is None


def test_null_turn_idx_renders_none_on_all_paths(gaz):
    """Round-6 review finding: NULL turn_idx must render '.../turn/None'
    identically on the per-row, pandas-template, and arrow paths (floats
    NaN used to print 'nan' on some, NULL the subject on arrow)."""
    import pyarrow as pa

    from quad_processor_util_spark.plans.extract_vec import extract_batch_arrow

    pdf = _frame(["Unknown Capitalized Run here.", "Boston"],
                 roles=["tool", "user"], tools=["calc", None])
    pdf["turn_idx"] = pd.array([None, 3], dtype="Int64")
    exp = _extract_batch_rows(
        pdf.assign(turn_idx=pdf["turn_idx"].astype(object)
                   .where(pdf["turn_idx"].notna(), None)),
        gaz, "LONGEST_DOMINANT_RIGHT", True)
    assert any(s.endswith("/turn/None") for s in exp["subject"])
    got_pd = extract_batch(
        pdf.assign(turn_idx=pdf["turn_idx"].astype("float64")), gaz,
        emit_unknown=True)
    assert got_pd["subject"].tolist() == exp["subject"].tolist()
    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int64()),
        ("role", pa.string()), ("text", pa.string()), ("tool", pa.string()),
    ])
    rb = pa.RecordBatch.from_pandas(
        pdf[["conv_id", "turn_idx", "role", "text", "tool"]],
        schema=schema, preserve_index=False)
    got_ar = extract_batch_arrow(rb, gaz, "LONGEST_DOMINANT_RIGHT", True)
    assert got_ar.to_pandas()["subject"].tolist() == exp["subject"].tolist()
