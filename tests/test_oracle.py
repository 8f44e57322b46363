"""Unit tests for the pure-Python reference-semantics oracle.

Vectors hand-written from the reference's semantics (cites in oracle.py).
"""

from quad_processor_util_spark.oracle import (
    RDF_LANGSTRING,
    XSD_STRING,
    Gazetteer,
    PyQuad,
    apply_overlap_policy,
    canonicalize_quads,
    capitalize_first,
    clean_space,
    dedup_quads,
    extract_triples_from_text,
    format_nt_line,
    is_absolute_uri,
    mint_dbpedia_iri,
    nt_escape,
    nt_unescape,
    parse_nt_line,
    percent_decode_lenient,
    resolve_canonical,
    wiki_encode,
)


class TestEscape:
    def test_basic(self):
        assert nt_escape('a"b\\c\nd\te\rf') == 'a\\"b\\\\c\\nd\\te\\rf'

    def test_non_ascii_nt(self):
        assert nt_escape("é") == "\\u00E9"
        assert nt_escape("😀") == "\\U0001F600"

    def test_non_ascii_turtle(self):
        assert nt_escape("é", turtle=True) == "é"

    def test_roundtrip(self):
        for s in ['x "y" \\ z', "é😀\n\t", "plain"]:
            assert nt_unescape(nt_escape(s)) == s

    def test_unescape_hex(self):
        assert nt_unescape("\\u00E9") == "é"
        assert nt_unescape("\\U0001F600") == "😀"


class TestPercentDecode:
    def test_lenient(self):
        assert percent_decode_lenient("a%20b") == "a b"
        assert percent_decode_lenient("a%2Gb") == "a%2Gb"  # bad seq passes through
        assert percent_decode_lenient("a+b") == "a+b"  # + kept

    def test_utf8(self):
        assert percent_decode_lenient("%C3%A9") == "é"


class TestUriToIri:
    """X4 (uri/UriToIriDecoder.java:47-127) — the reference's quirks are the
    spec: exact-case reserved match, `<= 'F'` validity guard, leading-'+'
    and %20 suppression of the plus rule, bracket guard, -1&0xf nibbles."""

    def test_plus_rules(self):
        from quad_processor_util_spark.oracle import uri_to_iri_decode as d
        assert d("a+b") == "a b"
        assert d("+ab") == "+ab"          # indexOf('+') == 0 disables rule
        assert d("a+b%20c") == "a+b c"    # %20 present keeps '+'

    def test_reserved_kept_case_sensitive(self):
        from quad_processor_util_spark.oracle import uri_to_iri_decode as d
        assert d("x%3Fy%23z%5B%5D%7D") == "x%3Fy%23z%5B%5D%7D"
        assert d("x%3fy") == "x%3fy"      # lowercase fails the <='F' guard
        assert d("a%41b%c3%a9") == "aAb%c3%a9"

    def test_runs_brackets_truncation(self):
        from quad_processor_util_spark.oracle import uri_to_iri_decode as d
        assert d("c%C3%A9f") == "céf"
        assert d("a%20%3F%20b") == "a %3F b"  # reserved inside a run
        assert d("[%41]%41") == "[%41]A"
        assert d("x%4") == "x%4" and d("x%") == "x%"

    def test_invalid_low_chars_decode_via_nibble_quirk(self):
        from quad_processor_util_spark.oracle import uri_to_iri_decode as d
        assert d("a%:0b") == "a�b"   # ':' passes guard, -1&0xf -> 0xF0


class TestWikiEncode:
    def test_clean_space(self):
        assert clean_space("  a _ b__c  ") == "a b c"

    def test_encode(self):
        assert wiki_encode("Ada  Lovelace") == "Ada_Lovelace"
        assert wiki_encode('q?x "y"') == "q%3Fx_%22y%22"

    def test_capitalize(self):
        assert capitalize_first("ada") == "Ada"
        assert capitalize_first("ßeta") == "ßeta"  # ligature-safe

    def test_mint(self):
        assert mint_dbpedia_iri("ada lovelace") == "http://dbpedia.org/resource/Ada_lovelace"
        assert mint_dbpedia_iri("New York City") == "http://dbpedia.org/resource/New_York_City"
        # decode-to-fixpoint then re-encode
        assert mint_dbpedia_iri("Ada%20Lovelace") == "http://dbpedia.org/resource/Ada_Lovelace"


class TestParser:
    def test_uri_object(self):
        q = parse_nt_line("<http://a/s> <http://a/p> <http://a/o> .")
        assert q == PyQuad("http://a/s", "http://a/p", "http://a/o", None, None, None)

    def test_plain_literal_default_xsd_string(self):
        q = parse_nt_line('<http://a/s> <http://a/p> "lit" .')
        assert q.datatype == XSD_STRING and q.obj == "lit" and q.language is None

    def test_lang_literal(self):
        q = parse_nt_line('<http://a/s> <http://a/p> "olá"@pt-br .')
        assert q.language == "pt-br" and q.datatype == RDF_LANGSTRING

    def test_typed_literal(self):
        q = parse_nt_line('<http://a/s> <http://a/p> "3.14"^^<http://x/double> .')
        assert q.datatype == "http://x/double" and q.obj == "3.14"

    def test_quad_graph(self):
        q = parse_nt_line("<http://a/s> <http://a/p> <http://a/o> <http://a/g> .")
        assert q.graph == "http://a/g"

    def test_escaped_literal(self):
        q = parse_nt_line('<http://a/s> <http://a/p> "a \\"q\\" and \\\\" .')
        assert q.obj == 'a "q" and \\'

    def test_comment_blank_skipped(self):
        assert parse_nt_line("# comment") is None
        assert parse_nt_line("   ") is None

    def test_malformed_skipped(self):
        assert parse_nt_line("<http://a/s> <http://a/p> <http://a/o>") is None  # no dot
        assert parse_nt_line("<unclosed <http://a/p> <http://a/o> .") is None
        assert parse_nt_line('<http://a/s> <http://a/p> "x"@EN .') is None  # bad lang
        assert parse_nt_line("garbage") is None

    def test_whitespace_tolerant(self):
        assert parse_nt_line('\t <http://a/s>  <http://a/p> "x" .  ') is not None


class TestFormatter:
    def test_roundtrip_uri(self):
        q = PyQuad("http://a/s", "http://a/p", "http://a/o")
        assert format_nt_line(q) == "<http://a/s> <http://a/p> <http://a/o> ."
        assert parse_nt_line(format_nt_line(q)) == q

    def test_xsd_string_omitted(self):
        q = PyQuad("http://a/s", "http://a/p", "lit", XSD_STRING)
        assert format_nt_line(q) == '<http://a/s> <http://a/p> "lit" .'

    def test_lang(self):
        q = PyQuad("http://a/s", "http://a/p", "olá", RDF_LANGSTRING, "pt-br")
        assert format_nt_line(q) == '<http://a/s> <http://a/p> "ol\\u00E1"@pt-br .'

    def test_graph_only_in_quads_mode(self):
        q = PyQuad("http://a/s", "http://a/p", "http://a/o", graph="http://a/g")
        assert format_nt_line(q, quads_mode=False).endswith("<http://a/o> .")
        assert format_nt_line(q, quads_mode=True).endswith("<http://a/o> <http://a/g> .")

    def test_bad_uri_commented_out(self):
        q = PyQuad("not a uri", "http://a/p", "http://a/o")
        assert format_nt_line(q).startswith("# ")

    def test_parse_format_roundtrip(self):
        lines = [
            "<http://a/s> <http://a/p> <http://a/o> .",
            '<http://a/s> <http://a/p> "lit" .',
            '<http://a/s> <http://a/p> "ol\\u00E1"@pt-br .',
            '<http://a/s> <http://a/p> "3.14"^^<http://x/d> .',
            "<http://a/s> <http://a/p> <http://a/o> <http://a/g> .",
        ]
        for ln in lines:
            q = parse_nt_line(ln)
            assert format_nt_line(q, quads_mode=True) == ln


class TestAbsoluteUri:
    def test(self):
        assert is_absolute_uri("http://a/b")
        assert not is_absolute_uri("relative/path")
        assert not is_absolute_uri("http://a b")
        assert not is_absolute_uri("")


class TestMentions:
    def gaz(self):
        return Gazetteer({
            "Boston": "http://dbpedia.org/resource/Boston",
            "Boston NOW": "http://dbpedia.org/resource/Boston_NOW",
            "Ada Lovelace": "http://dbpedia.org/resource/Ada_Lovelace",
            "Lovelace": "http://dbpedia.org/resource/Ada_Lovelace",
        })

    def test_all_policy_finds_overlaps(self):
        ms = apply_overlap_policy(self.gaz().find_all("Boston NOW is here"), "ALL")
        surfaces = {m.surface for m in ms}
        assert "Boston NOW" in surfaces and "Boston" in surfaces

    def test_no_sub(self):
        ms = apply_overlap_policy(self.gaz().find_all("Boston NOW is here"), "NO_SUB")
        assert [m.surface for m in ms] == ["Boston NOW"]

    def test_longest_dominant_right(self):
        ms = apply_overlap_policy(
            self.gaz().find_all("Ada Lovelace met Lovelace in Boston NOW"),
            "LONGEST_DOMINANT_RIGHT",
        )
        assert [m.surface for m in ms] == ["Ada Lovelace", "Lovelace", "Boston NOW"]

    def test_word_boundary(self):
        assert self.gaz().find_all("Bostonian things") == []


class TestExtraction:
    def gaz(self):
        return Gazetteer({
            "Ada Lovelace": "http://dbpedia.org/resource/Ada_Lovelace",
            "Hopper Labs": "http://dbpedia.org/resource/Hopper_Labs",
            "Boston": "http://dbpedia.org/resource/Boston",
        })

    def test_relation(self):
        qs = extract_triples_from_text("Ada Lovelace works at Hopper Labs.", self.gaz(), "g")
        assert len(qs) == 1
        q = qs[0]
        assert q.subject.endswith("Ada_Lovelace")
        assert q.predicate.endswith("worksAt")
        assert q.obj.endswith("Hopper_Labs")
        assert q.datatype is None and q.graph == "g"

    def test_population_literal(self):
        qs = extract_triples_from_text("Boston has population 654776.", self.gaz(), None)
        assert qs[0].obj == "654776"
        assert qs[0].datatype == "http://www.w3.org/2001/XMLSchema#integer"

    def test_lang_label(self):
        qs = extract_triples_from_text('Ada Lovelace is known as "The Ada"@es.', self.gaz(), None)
        assert qs[0].obj == "The Ada" and qs[0].language == "es"

    def test_noise_yields_nothing(self):
        assert extract_triples_from_text("nothing of note here", self.gaz(), None) == []


class TestCanonicalize:
    def test_chain_and_cycle(self):
        edges = [
            ("B", "A", "redirect"),
            ("C", "B", "sameAs"),
            ("X", "Y", "sameAs"),
            ("Y", "X", "sameAs"),
            ("D", "A", "disambiguation"),
        ]
        mapping, excluded = resolve_canonical(edges)
        assert mapping["C"] == "A" and mapping["B"] == "A"
        assert mapping["Y"] == "X"
        assert excluded == {"D"}

    def test_rewrite_and_anti_join(self):
        mapping = {"B": "A"}
        quads = [
            PyQuad("B", "p", "B", None),
            PyQuad("D", "p", "x", XSD_STRING),
            PyQuad("A", "p", "D", None),
        ]
        out = canonicalize_quads(quads, mapping, {"D"})
        assert [(q.subject, q.obj) for q in out] == [("A", "A")]


class TestDedup:
    def test_five_field_identity(self):
        a = PyQuad("s", "p", "o", None, None, "g1", "d1")
        b = PyQuad("s", "p", "o", None, None, "g2", "d2")  # same triple, diff graph
        c = PyQuad("s", "p", "o", XSD_STRING, None, "g1")
        out = dedup_quads([a, b, c])
        assert out == [a, c]
