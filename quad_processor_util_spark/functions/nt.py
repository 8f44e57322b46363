"""N-Triples/N-Quads parse + format on Spark.

Two paths for each direction:

- **JVM path** (`parse_nt_expr`, `format_nt_expr`): built-in Catalyst
  expressions (regexp / concat / when) — whole-stage-codegen'd, zero Python.
  Formatting on this path is Turtle-mode (non-ASCII kept raw,
  ref: TurtleUtils.scala:100-140 turtle branch).
- **exact path** (`parse_nt_lines`, `format_nt_exact`): Arrow-batched
  pandas execution of the *same pure-Python oracle functions* the tests
  use (oracle.parse_nt_line / oracle.format_nt_line), for byte-exact
  N-Triples-mode semantics incl. \\uXXXX escapes.

Reference: parser Quad.scala:189-265; formatter TerseBuilder.scala:10-82.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..oracle import (
    QUAD_FIELDS, XSD_STRING, PyQuad, format_nt_line, parse_nt_line,
)

# Python's \s / str.isspace() set spelled out for JAVA regex character
# classes. Java's \s is ASCII-only ([ \t\n\x0B\f\r]) and even (?U)\s
# (Unicode White_Space) EXCLUDES \x1c-\x1f which Python includes — so any
# JVM path mirroring the oracle's Python whitespace semantics must use this
# explicit class, not \s (round-4 review finding: U+00A0 inside a URI made
# format_nt_expr and format_nt_exact disagree on the bad-URI guard).
PY_WS_CLASS = (r"\x09-\x0d\x1c-\x1f \x85\xa0  - "
               r"    　")
QUAD_SCHEMA = StructType([StructField(f, StringType(), True) for f in QUAD_FIELDS])
# 5-field identity — graph/dataset excluded (ref: Quad.scala:79-93)
QUAD_IDENTITY = ["subject", "predicate", "obj", "datatype", "language"]


# ---------------------------------------------------------------------------
# exact parse: mapInPandas over a `line` column
# ---------------------------------------------------------------------------


# Canonical-NT fast-path pattern: EXACTLY single-space separated, no
# backslash anywhere, URIs without <>"\ or spaces, literal without "\ .
# For any line matching this, oracle.parse_nt_line provably returns the
# captured groups verbatim (no unescaping can apply — no backslash; no
# whitespace skipping can differ — separators are exact), so the whole
# batch parses with ONE C-level regex extract. Everything else (comments,
# escapes, exotic whitespace, malformed) takes the per-row oracle.
_CANON_U = r'[^<>"\\ \t\n]*'
# URI-object / datatype / graph groups capture WITH their brackets so a
# participating-but-empty URI ('<>' -> 2 chars) is distinguishable from a
# non-participating group ('' in findall) — the branch decides datatype
_CANON_NT_RE = (
    rf"^<({_CANON_U})> <({_CANON_U})> "
    rf'(?:(<{_CANON_U}>)|"([^"\\\n]*)"(?:@([a-z][a-z0-9-]*)|\^\^(<{_CANON_U}>))?)'
    rf"(?: (<{_CANON_U}>))? \.$"
)
_CANON_RX_M = re.compile(_CANON_NT_RE, re.M)
_RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _quads_from_canonical_groups(g) -> pd.DataFrame:
    """7 parallel group tuples (findall conventions: '' = not matched;
    bracketed groups include <>) -> quad frame."""
    import numpy as np

    subj, pred, uobj, lit, lang, dt, graph = (
        np.asarray(x, dtype=object) for x in g
    )
    is_uri = np.array([v != "" for v in uobj])
    strip = np.vectorize(lambda v: v[1:-1] if v else None, otypes=[object])
    obj = np.where(is_uri, strip(uobj), lit)
    has_lang = np.array([v != "" for v in lang])
    has_dt = np.array([v != "" for v in dt])
    datatype = np.where(
        is_uri, None,
        np.where(has_lang, _RDF_LANGSTRING,
                 np.where(has_dt, strip(dt), XSD_STRING)),
    )
    return pd.DataFrame({
        "subject": subj,
        "predicate": pred,
        "obj": obj,
        "datatype": datatype,
        "language": np.where(has_lang, lang, None),
        "graph": strip(graph),
        "dataset": pd.Series([None] * len(subj), dtype=object),
    }, columns=QUAD_FIELDS)


def _parse_canonical_batch(lines: pd.Series) -> tuple[pd.DataFrame, pd.Series]:
    """Vectorized parse of canonical lines -> (quad frame, leftover lines)."""
    s = lines.dropna().astype(str)
    vals = s.tolist()
    if not vals:
        return pd.DataFrame(columns=QUAD_FIELDS), s
    mega = "\n".join(vals)
    # all-canonical fast route: no backslash anywhere, no embedded newlines,
    # and every joined line matches — then ONE findall gives all groups at
    # C speed (each line matches at most once, so counts prove totality)
    if "\\" not in mega and mega.count("\n") == len(vals) - 1:
        hits = _CANON_RX_M.findall(mega)
        if len(hits) == len(vals):
            return _quads_from_canonical_groups(list(zip(*hits))), s.iloc[0:0]
    # mixed batch: per-line extract splits canonical rows from leftovers
    ext = s.str.extract(_CANON_NT_RE)
    hit = ext[0].notna()
    leftovers = s[~hit]
    e = ext[hit]
    if not len(e):
        return pd.DataFrame(columns=QUAD_FIELDS), leftovers
    groups = [e[i].fillna("").tolist() for i in range(7)]
    # subject can be legitimately '' (<<>> impossible; '<> ...' gives '') —
    # fillna('') is safe because extract only keeps matched rows here
    return _quads_from_canonical_groups(groups), leftovers


def parse_nt_lines(lines_df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse a DataFrame of raw N-Triples/N-Quads lines into the quad table.

    Comments/blank/malformed lines are skipped (skip-with-warning semantics,
    QuadReader.scala:178-179 — counts observable as input minus output).
    Runs as mapInPandas (Arrow batches, no shuffle); canonical single-space
    lines — the overwhelming bulk of real NT dumps — parse with one
    vectorized regex extract per batch, the rest per-row through the exact
    oracle parser. Semantics are identical either way (tests cover both
    routes)."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fast, leftovers = _parse_canonical_batch(pdf[line_col])
            rows = []
            for line in leftovers:
                q = parse_nt_line(line)
                if q is not None:
                    rows.append((q.subject, q.predicate, q.obj, q.datatype,
                                 q.language, q.graph, q.dataset))
            slow = pd.DataFrame(rows, columns=QUAD_FIELDS)
            yield pd.concat([fast, slow], ignore_index=True) if len(slow) else fast

    return lines_df.mapInPandas(_parse, QUAD_SCHEMA)


# ---------------------------------------------------------------------------
# JVM parse: regexp-based fast path (benchmarkable, codegen'd)
# ---------------------------------------------------------------------------

_URI = r"<([^>]*)>"
_LIT = r'"((?:[^"\\]|\\.)*)"'
# separators are [ \t]* to match the oracle scanner EXACTLY: skip_ws skips
# only space/tab (so '\f' separators are malformed on both paths) and
# allows ZERO whitespace between terms ('<s><p><o>.' parses on both);
# @lang / ^^dt attach tight to the closing quote, as the scanner requires
_WS = r"[ \t]*"
_TRIPLE_RE = (
    r"^" + _WS + _URI + _WS + _URI + _WS +
    r"(?:" + _URI + r"|" + _LIT + r"(?:@([a-z][a-z0-9-]*)|\^\^" + _URI + r")?)"
    r"(?:" + _WS + _URI + r")?" + _WS + r"\." + _WS + r"$"
)


def _unescape_expr(col: Column) -> Column:
    """Literal unescape for the JVM path, pure Catalyst (ref: Quad.scala:
    216-220 unescapes the lexical form; TurtleUtils.scala:51-90). A NUL
    sentinel makes the sequential replaces single-pass-correct: '\\\\' is
    captured FIRST, so a backslash freed by a later replace can never be
    re-interpreted as starting a new escape (raw NUL cannot occur in an NT
    line — the grammar forbids control chars; the exact path escapes them).
    Residual gap vs the exact path: \\uXXXX / \\UXXXXXXXX stay raw (no
    codepoint constructor in Catalyst) — parse_nt_lines handles those;
    unknown escapes like '\\q' pass through unchanged on both paths."""
    c = F.regexp_replace(col, r"\\\\", "\x00")
    for pat, rep in ((r"\\t", "\t"), (r"\\b", "\b"), (r"\\n", "\n"),
                     (r"\\r", "\r"), (r"\\f", "\f"), (r"\\\"", "\""),
                     (r"\\'", "'")):
        c = F.regexp_replace(c, pat, rep)
    return F.regexp_replace(c, "\x00", "\\\\")


def parse_nt_expr(lines_df: DataFrame, line_col: str = "line",
                  unescape: bool = True, hybrid: bool = True,
                  consistent: bool = False) -> DataFrame:
    """Catalyst parse (regexp_extract chain) with a hybrid escape route.

    Literal lexical forms get the simple-escape unescape chain
    (\\\\ \\t \\b \\n \\r \\f \\\" \\') in pure expressions. \\uXXXX /
    \\UXXXXXXXX have no codepoint constructor in Catalyst, so with
    hybrid=True (default) the rare lines containing a ``\\u``/``\\U``
    sequence are routed through the exact Arrow parser (parse_nt_lines)
    and unioned back — a cheap rlike split; the 99%+ clean lines keep the
    JVM fast path, and the two routes now agree on unicode-escaped corpora
    (closes the round-3 residual; ref TurtleUtils.scala:51-90).
    hybrid=False restores the pure-expression plan (\\uXXXX stays raw).
    unescape=False keeps lexical forms raw for scan-speed benches over
    clean data (implies no hybrid split).

    Plan-shape note: the hybrid union references the input in BOTH branches,
    so the SOURCE subtree (file scan / generating expressions) is evaluated
    twice — each with its rlike filter pushed toward the scan. Each line is
    still PARSED exactly once, on exactly one branch; at scale the duplicate
    scan is cheap relative to the regexp-extract work, and avoiding it would
    take an eager pre-count or a persist, both worse. Callers who know their
    corpus is escape-free can pass hybrid=False for the single-scan plan.

    The double scan assumes the source is DETERMINISTIC: with a
    non-deterministic upstream (rand()-generated lines, a directory whose
    files change between the two scans) rows can be dropped or duplicated
    across the rlike split. ``consistent=True`` localCheckpoints the input
    first so both branches read one pinned computation (costs a
    materialization; round-4 advice); without it, a source whose plan shows
    a known non-deterministic generator gets a loud warning."""
    if unescape and hybrid:
        if consistent:
            # eager: a LAZY checkpoint would materialize during the union
            # job itself, where two executors can each independently compute
            # a partition of a non-deterministic source (no cross-executor
            # block dedup) — the branches would still diverge. Paying the
            # materialization up front is the whole point of the flag
            # (round-5 review finding).
            lines_df = lines_df.localCheckpoint(eager=True)
        else:
            try:
                plan = lines_df._jdf.queryExecution().analyzed().toString()
            except Exception:
                plan = ""
            if re.search(r"\b(rand|randn|uuid|shuffle|random|"
                         r"monotonically_increasing_id)\(", plan):
                import warnings

                warnings.warn(
                    "parse_nt_expr(hybrid=True) scans its source twice; the "
                    "input plan contains a non-deterministic generator, so "
                    "rows may drop/duplicate across the split. Pass "
                    "consistent=True to pin the input first.",
                    RuntimeWarning, stacklevel=2)
        has_u = F.col(line_col).rlike(r"\\[uU]")
        fast = parse_nt_expr(lines_df.where(~has_u), line_col,
                             unescape=True, hybrid=False)
        slow = parse_nt_lines(lines_df.where(has_u), line_col)
        return fast.unionByName(slow)
    # edge trim matching the oracle's line.strip(): Python strips the FULL
    # unicode whitespace set (\f \v \x1c-\x1f U+00A0 ...) before scanning,
    # while _TRIPLE_RE's anchors admit only [ \t] — without this a
    # '\f'-edged line parsed on the exact path but was silently dropped
    # here (round-4 review finding). INTERIOR exotic whitespace stays
    # malformed on both paths.
    c = F.regexp_replace(
        F.col(line_col),
        "^[" + PY_WS_CLASS + "]+|[" + PY_WS_CLASS + "]+$", "")
    g = lambda i: F.regexp_extract(c, _TRIPLE_RE, i)  # noqa: E731
    matched = c.rlike(_TRIPLE_RE)
    uri_obj = g(3)
    lit = _unescape_expr(g(4)) if unescape else g(4)
    lang = g(5)
    dtype = g(6)
    graph = g(7)
    # Empty captures are ambiguous ("group empty" vs "group didn't
    # participate" — both extract ''), so `<>` tokens need structural
    # discriminators: after the two leading URIs, a '<' starts a URI object;
    # '"..."^^<' marks a typed literal; a further '<' before the final dot
    # marks a graph. These match the exact-path (oracle) classification for
    # degenerate empty URIs.
    _pfx = r"^[ \t]*<[^>]*>[ \t]*<[^>]*>[ \t]*"
    _litp = _pfx + r'"(?:[^"\\]|\\.)*"'
    is_uri_obj = c.rlike(_pfx + "<")
    has_dtype = c.rlike(_litp + r"\^\^<")
    has_graph = F.when(
        is_uri_obj, c.rlike(_pfx + r"<[^>]*>[ \t]*<")
    ).otherwise(
        c.rlike(_litp + r"(?:@[a-z][a-z0-9-]*|\^\^<[^>]*>)?[ \t]*<")
    )
    out = (
        lines_df.where(matched)
        .select(
            g(1).alias("subject"),
            g(2).alias("predicate"),
            F.when(is_uri_obj, uri_obj).otherwise(lit).alias("obj"),
            F.when(is_uri_obj, F.lit(None).cast("string"))
            .when(lang != "", F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"))
            .when(has_dtype, dtype)
            .otherwise(F.lit(XSD_STRING))
            .alias("datatype"),
            F.when(lang != "", lang).cast("string").alias("language"),
            F.when(has_graph, graph).cast("string").alias("graph"),
            F.lit(None).cast("string").alias("dataset"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# format: JVM expression path (turtle-mode escaping) + exact pandas path
# ---------------------------------------------------------------------------


# control chars the turtle escape must \\uXXXX (everything < 0x20 except
# \n \r \t, which have short escapes)
_CTRL_CODEPOINTS = [*range(0x00, 0x09), 0x0B, 0x0C, *range(0x0E, 0x20)]
_CTRL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"


def _escape_expr(col: Column) -> Column:
    """Turtle-mode literal escape with built-ins: \\ " \n \r \t, and
    \\uXXXX for the remaining control chars — matching oracle.nt_escape's
    turtle branch exactly (TurtleUtils.scala:100-140; non-ASCII kept raw).
    The 26-replace control chain only runs on rows that actually contain a
    control char (rlike-guarded branch) — clean literals pay 5 replaces."""
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\n", "\\\\n")
    c = F.regexp_replace(c, "\r", "\\\\r")
    c = F.regexp_replace(c, "\t", "\\\\t")
    ctrl = c
    for cp in _CTRL_CODEPOINTS:
        ctrl = F.regexp_replace(ctrl, "\\x%02X" % cp, "\\\\u%04X" % cp)
    return F.when(col.rlike(_CTRL_CLASS), ctrl).otherwise(c)


def format_nt_expr(quads: DataFrame, quads_mode: bool = False) -> DataFrame:
    """Quad table -> one `line` column, entirely in Catalyst expressions.

    Dispatch (TripleFormatter.scala:18-20): URI object when datatype is null;
    lang literal; typed literal with xsd:string omitted
    (TerseBuilder.scala:44-48). Bad URIs comment the line out with `# `
    (TerseBuilder.scala:23). Graph appended only in quads mode (:51-60).
    """
    # [^\s<>] matches oracle.is_absolute_uri exactly: a URI containing
    # '<'/'>' is BAD (would corrupt the line syntax) and must comment out
    uri_ok = lambda c: c.rlike(  # noqa: E731
        "^[A-Za-z][A-Za-z0-9+.-]*://[^<>" + PY_WS_CLASS + "]+$")
    s, p, o, dt, lang, gr = (F.col(x) for x in
                             ["subject", "predicate", "obj", "datatype", "language", "graph"])
    obj_part = (
        F.when(dt.isNull(), F.concat(F.lit("<"), o, F.lit(">")))
        .when(lang.isNotNull(),
              F.concat(F.lit('"'), _escape_expr(o), F.lit('"@'), lang))
        .when(dt == XSD_STRING, F.concat(F.lit('"'), _escape_expr(o), F.lit('"')))
        .otherwise(F.concat(F.lit('"'), _escape_expr(o), F.lit('"^^<'), dt, F.lit(">")))
    )
    line = F.concat(F.lit("<"), s, F.lit("> <"), p, F.lit("> "), obj_part)
    # empty-string graph counts as ABSENT, matching the oracle's falsy check
    # (format_nt_line: `quads_mode and q.graph`)
    has_graph = gr.isNotNull() & (gr != "")
    if quads_mode:
        line = F.when(has_graph, F.concat(line, F.lit(" <"), gr, F.lit(">"))).otherwise(line)
    line = F.concat(line, F.lit(" ."))
    bad = (
        ~uri_ok(s) | ~uri_ok(p)
        | (dt.isNull() & ~uri_ok(o))
        | (dt.isNotNull() & lang.isNull() & (dt != XSD_STRING) & ~uri_ok(dt))
    )
    if quads_mode:
        bad = bad | (has_graph & ~uri_ok(gr))
    return quads.select(
        F.when(bad, F.concat(F.lit("# "), line)).otherwise(line).alias("line")
    )


# clean-row predicates for the vectorized exact-format route:
# a URI the oracle accepts verbatim (absolute, no angle brackets) ...
_CLEAN_URI_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^\s<>]+$"
# ... and a literal needing NO escaping at all: printable ASCII minus
# '"' (0x22) and '\' (0x5C) — everything outside this set takes the
# per-row oracle (escape-family, control chars, non-ASCII \uXXXX)
_CLEAN_LIT_RE = r"^[\x20-\x21\x23-\x5B\x5D-\x7E]*$"


def _format_clean_batch(pdf: pd.DataFrame, quads_mode: bool):
    """-> (lines ndarray aligned to pdf rows with None where not clean)."""
    import numpy as np

    s = pdf["subject"].astype(str)
    p = pdf["predicate"].astype(str)
    o = pdf["obj"].astype(str)
    dt = pdf["datatype"]
    lang = pdf["language"]
    gr = pdf["graph"]
    uri_ok = lambda c: c.str.match(_CLEAN_URI_RE, na=False)  # noqa: E731
    # mutually exclusive, in the ORACLE'S dispatch order (format_nt_line:
    # datatype-null URI first, then language, then plain, then typed)
    b_uri = dt.isna()
    b_lang = ~b_uri & lang.notna()
    b_plain = ~b_uri & ~b_lang & dt.eq(XSD_STRING)
    b_typed = ~b_uri & ~b_lang & dt.notna() & ~dt.eq(XSD_STRING)
    lit_ok = o.str.match(_CLEAN_LIT_RE, na=False)
    clean = (
        uri_ok(s) & uri_ok(p)
        & (
            (b_uri & uri_ok(o))
            | ((b_lang | b_plain) & lit_ok)
            | (b_typed & lit_ok & uri_ok(dt.astype(str)))
        )
    )
    if quads_mode:
        has_g = gr.notna() & gr.ne("")
        clean = clean & (~has_g | uri_ok(gr.astype(str)))
    if not clean.any():
        return np.full(len(pdf), None, dtype=object)
    obj_part = np.where(
        b_uri, "<" + o + ">",
        np.where(b_lang, '"' + o + '"@' + lang.astype(str),
                 np.where(b_plain, '"' + o + '"',
                          '"' + o + '"^^<' + dt.astype(str) + ">")),
    )
    lines = "<" + s + "> <" + p + "> " + pd.Series(obj_part, index=pdf.index)
    if quads_mode:
        lines = lines + np.where(gr.notna() & gr.ne(""),
                                 " <" + gr.astype(str) + ">", "")
    lines = lines + " ."
    return np.where(clean, lines, None)


def format_nt_exact(quads: DataFrame, quads_mode: bool = False) -> DataFrame:
    """Byte-exact N-Triples formatting (incl. \\uXXXX non-ASCII escapes).
    Clean rows — valid absolute URIs, literals with nothing to escape —
    format vectorized (pandas string ops, provably identical to the
    oracle: no escape can apply and no `# ` marking can trigger); rows
    needing escapes or bad-URI commenting take the per-row oracle
    function. Output order matches input order (the sorted-write path
    depends on it)."""

    def _fmt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            res = _format_clean_batch(pdf, quads_mode)
            miss = np.nonzero(res == None)[0]  # noqa: E711 (elementwise)
            if len(miss):
                res[miss] = [
                    format_nt_line(
                        PyQuad(r.subject, r.predicate, r.obj,
                               None if pd.isna(r.datatype) else r.datatype,
                               None if pd.isna(r.language) else r.language,
                               None if pd.isna(r.graph) else r.graph),
                        quads_mode=quads_mode,
                    )
                    for r in pdf.iloc[miss].itertuples()
                ]
            yield pd.DataFrame({"line": res})

    return quads.mapInPandas(_fmt, StructType([StructField("line", StringType())]))


def format_rdf_json(quads: DataFrame) -> DataFrame:
    """Quad -> RDF/JSON-ish line via to_json (formatters/RDFJSONBuilder.scala:
    8-104 semantics: object kind dispatched to uri / literal+lang / literal+
    datatype; JSON escaping is native to to_json — the reference's manual
    control-char quoting, RDFJSONBuilder.scala:73-102, is built in).
    -> DataFrame(json STRING)."""
    s, p, o, dt, lang = (F.col(x) for x in
                         ["subject", "predicate", "obj", "datatype", "language"])
    value = F.struct(
        s.alias("subject"),
        p.alias("predicate"),
        F.struct(
            o.alias("value"),
            F.when(dt.isNull(), F.lit("uri")).otherwise(F.lit("literal")).alias("type"),
            lang.alias("lang"),
            F.when(lang.isNull() & dt.isNotNull() & (dt != XSD_STRING), dt)
            .alias("datatype"),
        ).alias("object"),
    )
    return quads.select(F.to_json(value, {"ignoreNullFields": "true"}).alias("json"))


def dedup_quads_df(quads: DataFrame) -> DataFrame:
    """Global dedup on the 5-field identity (ref: Quad.scala:79-93;
    DeduplicatingDestination.scala:10-24 — Spark's shuffle dedup is the
    global, stronger form)."""
    return quads.dropDuplicates(QUAD_IDENTITY)


# ---------------------------------------------------------------------------
# TriX serialization (ref: formatters/TriXBuilder.scala:28-60,
# TriXFormatter.scala:10-21, utils/XmlUtils.scala escape table)
# ---------------------------------------------------------------------------

TRIX_HEADER = '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/" >\n'
TRIX_FOOTER = "</TriX>\n"


def xml_escape_expr(col: Column) -> Column:
    """The reference's XML escape table (XmlUtils.scala): & < > " to
    entities; control chars below 0x20 REMOVED except \\n \\r \\t (kept
    raw). Chars >= 0x40 pass through untouched."""
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    c = F.regexp_replace(c, '"', "&quot;")
    return F.regexp_replace(c, r"[\x00-\x08\x0B\x0C\x0E-\x1F]", "")


def format_trix(quads: DataFrame, quads_mode: bool = False) -> DataFrame:
    """Quad table -> one TriX <graph><triple>…</triple></graph> fragment
    per quad (column `trix`), pure Catalyst. Wrap output between
    TRIX_HEADER/TRIX_FOOTER when writing a document.

    Faithful to TriXBuilder.scala:28-60: 2-space-per-depth indentation, the
    context <uri> emitted in quads mode even when the graph is null (the
    reference's parseUri(null) yields the literal 'BAD URI: null' text,
    UriTripleBuilder.scala:19-30), xsd:string NOT omitted (the omission is
    TerseBuilder-specific). Simplification: URI validity uses the same
    absolute-URI guard as the N-Triples path instead of java.net.URI's
    parser (whose exact error strings are JVM-internal)."""
    # [^\s<>] matches oracle.is_absolute_uri exactly: a URI containing
    # '<'/'>' is BAD (would corrupt the line syntax) and must comment out
    uri_ok = lambda c: c.rlike(  # noqa: E731
        "^[A-Za-z][A-Za-z0-9+.-]*://[^<>" + PY_WS_CLASS + "]+$")

    def uri_el(col: Column, indent: str) -> Column:
        val = (
            F.when(col.isNull(), F.lit("BAD URI: null"))
            .when(uri_ok(col), col)
            .otherwise(F.concat(F.lit("BAD URI: not absolute: "), col))
        )
        return F.concat(F.lit(indent + "<uri>"), xml_escape_expr(val),
                        F.lit("</uri>\n"))

    s, p, o, dt, lang, gr = (F.col(x) for x in
                             ["subject", "predicate", "obj", "datatype",
                              "language", "graph"])
    dt_val = (
        F.when(uri_ok(dt), dt)
        .otherwise(F.concat(F.lit("BAD URI: not absolute: "), dt))
    )
    obj_el = (
        F.when(dt.isNull(), uri_el(o, "      "))
        .when(lang.isNotNull(), F.concat(
            F.lit('      <plainLiteral xml:lang="'), lang, F.lit('">'),
            xml_escape_expr(o), F.lit("</plainLiteral>\n")))
        .otherwise(F.concat(
            F.lit('      <typedLiteral datatype="'),
            xml_escape_expr(dt_val), F.lit('">'),
            xml_escape_expr(o), F.lit("</typedLiteral>\n")))
    )
    parts = [F.lit("  <graph>\n")]
    if quads_mode:
        parts.append(uri_el(gr, "    "))
    parts += [
        F.lit("    <triple>\n"),
        uri_el(s, "      "),
        uri_el(p, "      "),
        obj_el,
        F.lit("    </triple>\n"),
        F.lit("  </graph>\n"),
    ]
    return quads.select(F.concat(*parts).alias("trix"))
