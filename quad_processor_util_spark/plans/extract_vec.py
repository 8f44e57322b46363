"""Vectorized (batch-at-a-time) transcript extraction.

Replaces the per-row Python loop inside the extraction ``mapInPandas``
(the flagship hot path) with batch-level work:

- ONE gazetteer regex scan per Arrow batch over a ``\\x00``-joined
  mega-string (the regex engine runs in C; row boundaries are ``\\x00``,
  which no gazetteer form, relation connector, or pattern can match
  across, and which satisfies the word-boundary lookarounds exactly like
  start/end-of-string does per row);
- numpy offset arithmetic maps absolute match positions back to rows;
- overlap-policy, relation, population/label and unknown-mention logic
  run on flat arrays, with per-row Python only for the rare rows whose
  mentions actually overlap.

Semantics are EXACTLY oracle.Gazetteer.find_all + apply_overlap_policy +
extract_triples_from_text + find_unknown_mentions per row, in the same
per-row quad order (relations by adjacent pair, then per mention
population/label, then unknown-mention placeholders, then the tool quad)
— verified structurally by tests/test_extract_vec.py against the per-row
oracle. Reference semantics: solr/SolrHandler.java:367-512 (tagger +
policies); QuadMapper.scala:104-128 (sorted-group map).

Pure pandas/numpy + oracle helpers — no Spark imports (runs inside
executors' mapInPandas closures and inside pytest alike).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..oracle import (
    EX,
    RDF_LANGSTRING,
    XSD_INTEGER,
    XSD_STRING,
    _CAP_RUN_RE,
    _LABEL_RE,
    _POPULATION_RE,
    Gazetteer,
    Mention,
    RELATION_CONNECTORS,
    apply_overlap_policy,
    extract_triples_from_text,
    find_unknown_mentions,
    nt_unescape,
)
from ..oracle import QUAD_FIELDS  # the one definition (Spark-free module)

_TOOL_PRED = EX + "toolUsed"
_SURF_PRED = EX + "mentionSurface"
_SEP = "\x00"


def _find_mentions_mega(gaz: Gazetteer, mega: str):
    """All (start, end, surface) matches over the mega-string with exact
    oracle.find_all semantics: longest match at every matching start plus
    boundary-clean prefix recoveries, span-deduped, sorted by (start, -end).

    Fast path (overlap-free gazetteer): one C-speed finditer pass.
    Overlapping gazetteers: finditer gives the non-overlapping spine (every
    missed match must START strictly inside a spine span — anything starting
    outside would itself be the leftmost match from the previous spine end);
    overlapped matches are recovered by ANCHORED rx.match probes at the
    boundary positions inside each (cover-extended) spine span. The
    alternation is longest-first, so an anchored match returns exactly the
    longest form at that start — the same thing the oracle's rescan loop
    finds. Probes ≈ interior word starts per mention (1-2), each failing
    fast, instead of one full rx.search per match.
    """
    rx = gaz.rx
    if rx is None:
        return []
    if not gaz.has_overlaps:
        return [(m.start(), m.end(), m.group(0)) for m in rx.finditer(mega)]
    static_emits = gaz._static_emits
    probe_offsets = gaz._probe_offsets
    # negated end stored so a PLAIN tuple sort gives the oracle's
    # (start, -end) order — no per-element key lambda
    out = []
    append = out.append
    amatch = rx.match
    sget = static_emits.get
    pget = probe_offsets.get
    probed: set[int] = set()
    stack: list[tuple[int, str]] = []
    for m in rx.finditer(mega):
        s = m.start()
        g = m.group(0)
        append((s, -(s + len(g)), g))
        se = sget(g)
        if se is not None:
            for k, e_off, sub in se:
                append((s + k, -(s + e_off), sub))
        if pget(g) is None:
            continue
        stack.append((s, g))
        while stack:
            s, g = stack.pop()
            for k in pget(g, ()):
                q = s + k
                if q in probed:
                    continue
                probed.add(q)
                m2 = amatch(mega, q)
                if m2 is not None:
                    g2 = m2.group(0)
                    append((q, -(q + len(g2)), g2))
                    se = sget(g2)
                    if se is not None:
                        for k2, e_off, sub in se:
                            append((q + k2, -(q + e_off), sub))
                    if pget(g2) is not None:
                        stack.append((q, g2))
    return [(s, -ne, g) for s, ne, g in sorted(set(out))]


def extract_batch(
    pdf: pd.DataFrame,
    gaz: Gazetteer,
    policy: str = "LONGEST_DOMINANT_RIGHT",
    emit_unknown: bool = False,
) -> pd.DataFrame:
    """One Arrow batch of transcripts -> quad table (QUAD_FIELDS columns)."""
    n = len(pdf)
    if n == 0:
        return pd.DataFrame({f: pd.Series(dtype=object) for f in QUAD_FIELDS},
                            columns=QUAD_FIELDS)
    texts = pdf["text"].fillna("").astype(str).tolist()
    if any(_SEP in t for t in texts):  # cannot join safely — exact fallback
        return _extract_batch_rows(pdf, gaz, policy, emit_unknown)

    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    row_start = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=row_start[1:])
    row_text_end = row_start + lens
    mega = _SEP.join(texts)

    graphs = ("http://example.org/conv/" + pdf["conv_id"].astype(str)).tolist()
    s2i = gaz.surface_to_iri

    # ---- mention detection (batched) ------------------------------------
    raw = _find_mentions_mega(gaz, mega)
    if raw:
        m_start = np.fromiter((t[0] for t in raw), dtype=np.int64, count=len(raw))
        m_end = np.fromiter((t[1] for t in raw), dtype=np.int64, count=len(raw))
        m_row = np.searchsorted(row_start, m_start, side="right") - 1
        m_surf = [t[2] for t in raw]
    else:
        m_start = m_end = m_row = np.empty(0, dtype=np.int64)
        m_surf = []

    # ---- overlap policy (vectorized) --------------------------------------
    # Sorted by (start, -end), with per-row mega positions strictly
    # increasing across rows, a global running max of `end` never leaks
    # across row boundaries:
    #   contained(i)    = cummax(end[:i]) >= end[i]     (strict containment)
    #   overlaps(i,i+1) = same row and start[i+1] < end[i]
    # ALL keeps everything; NO_SUB drops contained; LDR drops contained and,
    # when the row's remaining maximal mentions are pairwise disjoint (the
    # overwhelmingly common case), that IS the greedy LDR result: every
    # container is processed before (longer than) anything it contains, and
    # disjoint maximals never reject each other. Only rows whose MAXIMAL
    # mentions overlap (genuinely staggered) take the per-row oracle policy.
    if len(m_start):
        if policy not in ("ALL", "NO_SUB", "LONGEST_DOMINANT_RIGHT"):
            raise ValueError(f"unknown overlap policy: {policy}")
        if policy in ("NO_SUB", "LONGEST_DOMINANT_RIGHT"):
            keep = np.ones(len(m_start), dtype=bool)
            if len(m_start) > 1:
                keep[1:] = np.maximum.accumulate(m_end)[:-1] < m_end[1:]
            if policy == "LONGEST_DOMINANT_RIGHT":
                ks, ke, kr = m_start[keep], m_end[keep], m_row[keep]
                still = (kr[1:] == kr[:-1]) & (ks[1:] < ke[:-1])
                if still.any():
                    bad_rows = np.unique(kr[:-1][still])
                    lo = np.searchsorted(m_row, bad_rows, side="left")
                    hi = np.searchsorted(m_row, bad_rows, side="right")
                    for a, b in zip(lo, hi):
                        ms = [
                            Mention(int(m_start[i]), int(m_end[i]),
                                    m_surf[i], s2i[m_surf[i]])
                            for i in range(a, b)
                        ]
                        kept = {
                            (k.start, k.end)
                            for k in apply_overlap_policy(ms, policy)
                        }
                        for i in range(a, b):
                            keep[i] = (int(m_start[i]), int(m_end[i])) in kept
            if not keep.all():
                m_start, m_end, m_row = m_start[keep], m_end[keep], m_row[keep]
                m_surf = [s for s, k in zip(m_surf, keep) if k]
        # final per-row order: (row, start, end) — the policy output order
        order = np.lexsort((m_end, m_start, m_row))
        if not np.array_equal(order, np.arange(len(order))):
            m_start, m_end, m_row = m_start[order], m_end[order], m_row[order]
            m_surf = [m_surf[i] for i in order]
    m_iri = [s2i[s] for s in m_surf]
    nm = len(m_surf)

    # quad accumulator: (row, stage, seq, subject, predicate, obj,
    #                    datatype, language)
    q_row: list[int] = []
    q_stage: list[int] = []
    q_seq: list[int] = []
    q_s: list = []
    q_p: list = []
    q_o: list = []
    q_d: list = []
    q_l: list = []

    def emit(row, stage, seq, s, p, o, d, lang):
        q_row.append(row); q_stage.append(stage); q_seq.append(seq)
        q_s.append(s); q_p.append(p); q_o.append(o); q_d.append(d)
        q_l.append(lang)

    # ---- relations: adjacent mention pairs within a row -------------------
    if nm > 1:
        pair = np.nonzero(m_row[1:] == m_row[:-1])[0]
        getp = RELATION_CONNECTORS.get
        for i in pair:
            p = getp(mega[m_end[i]:m_start[i + 1]].strip().strip(",;").strip())
            if p is not None:
                emit(int(m_row[i]), 1, int(i), m_iri[i], p, m_iri[i + 1],
                     None, None)

    # ---- population / label: anchored at mention end ----------------------
    # candidate anchor positions located with C-speed str.find sweeps; the
    # anchored regex then confirms with exact oracle semantics (bounded by
    # the row's text end so no pattern crosses a row boundary)
    def _find_positions(needle: str) -> set[int]:
        pos = set()
        i = mega.find(needle)
        while i != -1:
            pos.add(i)
            i = mega.find(needle, i + 1)
        return pos

    # anchors are only consulted per MENTION — a mention-free batch must
    # not pay two O(len(mega)) sweeps on the flagship hot path (round-5
    # review finding)
    pop_pos = _find_positions(" has population ") if nm else set()
    lab_pos = _find_positions(' is known as "') if nm else set()
    for mi in range(nm):
        e = int(m_end[mi])
        if e in pop_pos:
            r = int(m_row[mi])
            pm = _POPULATION_RE.match(mega, e, int(row_text_end[r]))
            if pm:
                emit(r, 2, 2 * mi, m_iri[mi], EX + "population", pm.group(1),
                     XSD_INTEGER, None)
        elif e in lab_pos:
            r = int(m_row[mi])
            lm = _LABEL_RE.match(mega, e, int(row_text_end[r]))
            if lm:
                emit(r, 2, 2 * mi + 1, m_iri[mi], EX + "label",
                     nt_unescape(lm.group(1)), RDF_LANGSTRING, lm.group(2))

    # ---- unknown-mention placeholders --------------------------------------
    if emit_unknown:
        # per-row running max of mention ends (O(1) interval-overlap tests)
        if nm:
            row_first = np.searchsorted(m_row, np.arange(n), side="left")
            row_last = np.searchsorted(m_row, np.arange(n), side="right")
            cummax_end = np.empty(nm, dtype=np.int64)
            for r0 in np.unique(m_row):
                lo, hi = row_first[r0], row_last[r0]
                cummax_end[lo:hi] = np.maximum.accumulate(m_end[lo:hi])
        turn_idx = pdf["turn_idx"].to_numpy()
        seen: set[tuple[int, str]] = set()
        seq = 0
        for um in _CAP_RUN_RE.finditer(mega):
            s, e = um.start(), um.end()
            r = int(np.searchsorted(row_start, s, side="right") - 1)
            # skip runs crossing into the separator pad (cannot happen: the
            # pattern admits no \x00) — runs overlapping a kept mention skip
            if nm:
                lo, hi = row_first[r], row_last[r]
                if lo < hi:
                    # mentions with start < e, within row r
                    j = int(np.searchsorted(m_start[lo:hi], e, side="left"))
                    if j > 0 and cummax_end[lo + j - 1] > s:
                        continue
            surface = um.group(0)
            if (r, surface) in seen:
                continue
            seen.add((r, surface))
            turn_iri = f"{graphs[r]}/turn/{turn_idx[r]}"
            emit(r, 3, seq, turn_iri, _SURF_PRED, surface, XSD_STRING, None)
            seq += 1

    # ---- tool quads ---------------------------------------------------------
    roles = pdf["role"].to_numpy()
    tools = pdf["tool"].to_numpy()
    turn_idx_all = pdf["turn_idx"].to_numpy()
    tool_rows = np.nonzero(roles == "tool")[0]
    for r in tool_rows:
        t = tools[r]
        if isinstance(t, str) and t:
            emit(int(r), 4, 0,
                 f"{graphs[r]}/turn/{turn_idx_all[r]}", _TOOL_PRED, t,
                 XSD_STRING, None)

    # ---- assemble in per-row oracle order -----------------------------------
    if not q_row:
        return pd.DataFrame({f: pd.Series(dtype=object) for f in QUAD_FIELDS},
                            columns=QUAD_FIELDS)
    order = np.lexsort((np.asarray(q_seq), np.asarray(q_stage), np.asarray(q_row)))
    return pd.DataFrame(
        {
            "subject": [q_s[i] for i in order],
            "predicate": [q_p[i] for i in order],
            "obj": [q_o[i] for i in order],
            "datatype": [q_d[i] for i in order],
            "language": [q_l[i] for i in order],
            "graph": [graphs[q_row[i]] for i in order],
            "dataset": [None] * len(order),
        },
        columns=QUAD_FIELDS,
    )


def _extract_batch_rows(
    pdf: pd.DataFrame,
    gaz: Gazetteer,
    policy: str,
    emit_unknown: bool,
) -> pd.DataFrame:
    """Exact per-row fallback (texts containing the \\x00 separator)."""
    cols: dict[str, list] = {f: [] for f in QUAD_FIELDS}
    app = [cols[f].append for f in QUAD_FIELDS]
    for conv_id, turn_idx, role, text, tool in zip(
        pdf["conv_id"].to_numpy(), pdf["turn_idx"].to_numpy(),
        pdf["role"].to_numpy(), pdf["text"].to_numpy(), pdf["tool"].to_numpy(),
    ):
        # str() matches the vectorized path's astype(str): a non-string
        # conv_id (int64 convs) must not crash only on the \x00-fallback
        # route (round-4 review finding)
        graph = "http://example.org/conv/" + str(conv_id)
        ms = apply_overlap_policy(gaz.find_all(text or ""), policy)
        for q in extract_triples_from_text(text or "", gaz, graph, policy,
                                           mentions=ms):
            app[0](q.subject); app[1](q.predicate); app[2](q.obj)
            app[3](q.datatype); app[4](q.language); app[5](q.graph)
            app[6](None)
        if emit_unknown:
            turn_iri = f"{graph}/turn/{turn_idx}"
            for surface in find_unknown_mentions(text or "", ms):
                app[0](turn_iri); app[1](_SURF_PRED); app[2](surface)
                app[3](XSD_STRING); app[4](None); app[5](graph); app[6](None)
        if role == "tool" and isinstance(tool, str) and tool:
            app[0](f"{graph}/turn/{turn_idx}"); app[1](_TOOL_PRED)
            app[2](tool); app[3](XSD_STRING); app[4](None); app[5](graph)
            app[6](None)
    return pd.DataFrame(cols, columns=QUAD_FIELDS)
