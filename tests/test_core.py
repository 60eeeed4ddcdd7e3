"""Unit tests for the pure-Python core: IRI minting, templating,
rule compilation, and the row-wise oracle (reference semantics per
SURVEY.md §2.2 / FIXTURES.md F5)."""

import pytest

from cow_ray.iri import expand_url, needs_escape, to_iri, validate_iri
from cow_ray.namespaces import SKOS, XSD, XSD_STRING
from cow_ray.oracle import is_value_null, process_row, process_table
from cow_ray.rules import RuleError, expand_term, parse_rules
from cow_ray.templating import (
    COMPLEX,
    CONST,
    SIMPLE,
    compile_template,
    render_pattern,
)


# ---------------- IRI ----------------

class TestIri:
    def test_passthrough(self):
        assert to_iri("http://example.com/a/b?x=1#f") == "http://example.com/a/b?x=1#f"

    def test_space_escaped(self):
        assert to_iri("http://ex.com/a b") == "http://ex.com/a%20b"

    def test_comma_kept(self):
        # sub-delims are legal in paths: "Tussenbroek, van" keeps its comma
        assert to_iri("http://ex.com/Tussenbroek, van") == "http://ex.com/Tussenbroek,%20van"

    def test_braces_escaped(self):
        assert to_iri("http://ex.com/{_row}") == "http://ex.com/%7B_row%7D"

    def test_unicode_kept(self):
        assert to_iri("http://ex.com/café") == "http://ex.com/café"

    def test_existing_escape_preserved(self):
        assert to_iri("http://ex.com/a%20b") == "http://ex.com/a%20b"

    def test_stray_percent_escaped(self):
        assert to_iri("http://ex.com/100%") == "http://ex.com/100%25"

    def test_no_scheme_raises(self):
        with pytest.raises(ValueError):
            to_iri("no-scheme-here/foo bar")

    def test_validate(self):
        validate_iri("urn:uuid:1234")
        with pytest.raises(ValueError):
            validate_iri("http://ex.com/with space")

    def test_needs_escape(self):
        assert not needs_escape("http://ex.com/a/b-c_d.e?x=1")
        assert needs_escape("http://ex.com/a b")
        assert needs_escape("http://ex.com/café")
        assert needs_escape("http://ex.com/100%")
        assert not needs_escape("http://ex.com/a%20b")


# ---------------- templating ----------------

class TestTemplating:
    def test_classify(self):
        assert compile_template("http://x/const").kind == CONST
        assert compile_template("http://x/{a}/{_row}").kind == SIMPLE
        assert compile_template("{{a}}").kind == COMPLEX
        assert compile_template("{% if a %}x{% endif %}").kind == COMPLEX
        assert compile_template("{a:>5}").kind == COMPLEX
        assert compile_template("{a}}").kind == COMPLEX

    def test_simple_render(self):
        row = {"a": "v", "_row": 7}
        assert render_pattern("http://x/{a}/{_row}", row) == "http://x/v/7"

    def test_jinja_then_format(self):
        # docs/index.rst "Template Expansion": {_row}/{{Country}} →
        # jinja first, then format
        row = {"Country": "Qatar", "_row": 1}
        assert render_pattern("http://e/{_row}/{{Country}}", row) == "http://e/1/Qatar"

    def test_jinja_expressions(self):
        row = {"v": "12", "_row": 0}
        assert render_pattern("{{'%05d'|format(v|int)}}", row) == "00012"
        assert render_pattern("{{v|float()*1000}}", row) == "12000.0"
        assert render_pattern("{% if v == '12' %}yes{% else %}no{% endif %}", row) == "yes"
        assert render_pattern("{{v ~ 's'}}", row) == "12s"
        assert render_pattern("{{v[0:1]}}", row) == "1"

    def test_jinja_row_arithmetic(self):
        assert render_pattern("{{_row + 42}}", {"_row": 1}) == "43"

    def test_format_keyerror_propagates(self):
        with pytest.raises(KeyError):
            render_pattern("http://x/{missing}", {"a": "v", "_row": 0})

    def test_batch_simple_matches_row(self):
        import pyarrow as pa
        from cow_ray.templating import normalize_column

        t = compile_template("http://x/{a}/{_row}")
        cols = {
            "a": normalize_column(pa.array(["p", None, "q r"])),
            "_row": normalize_column(pa.array([0, 1, 2])),
        }
        got = t.render_batch(cols, 3).to_pylist()
        want = [
            t.render_row({"a": a, "_row": i})
            for i, a in enumerate(["p", None, "q r"])
        ]
        assert got == want == ["http://x/p/0", "http://x//1", "http://x/q r/2"]


# ---------------- rules ----------------

BASE = "https://ex.org/id/"


def doc_of(columns, **kw):
    d = {"base": BASE, "aboutUrl": "row/{_row}", "columns": columns}
    d.update(kw)
    return parse_rules(d)


class TestRules:
    def test_expand_term(self):
        ns = {"rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#"}
        assert expand_term("rdf:type", BASE, ns).endswith("#type")
        assert expand_term("http://a/b", BASE, ns) == "http://a/b"
        assert expand_term("doc/{x}", BASE, ns) == BASE + "doc/{x}"
        assert expand_term("urn:uuid:1", BASE, ns) == "urn:uuid:1"

    def test_default_predicate_is_vocab_name(self):
        d = doc_of([{"name": "Country", "datatype": "string"}])
        assert d.columns[0].property_const == BASE + "vocab/Country"

    def test_datatype_alias(self):
        d = doc_of([{"name": "a", "datatype": "integer"}])
        assert d.columns[0].datatype == XSD + "integer"

    def test_csvw_shaped_document(self):
        d = parse_rules(
            {
                "@context": [
                    "https://example.org/csvw.json",
                    {"@base": BASE, "@language": "en"},
                ],
                "url": "x.csv",
                "tableSchema": {
                    "aboutUrl": "{_row}",
                    "primaryKey": "Rank",
                    "columns": [
                        {"name": "Rank", "datatype": "string",
                         "csvw:value": "{{Rank}}", "propertyUrl": "skos:notation"}
                    ],
                },
            }
        )
        assert d.base == BASE
        assert d.columns[0].property_const == SKOS + "notation"
        assert d.columns[0].value_tmpl.pattern == "{{Rank}}"

    def test_nameless_column_needs_property_url(self):
        with pytest.raises(RuleError):
            doc_of([{"datatype": "string"}])

    def test_escaping_fixes_bad_const_iri(self):
        # to_iri percent-escapes the space, so this compiles fine
        d = doc_of([{"name": "a", "propertyUrl": "http://bad iri/x"}])
        assert d.columns[0].property_const == "http://bad%20iri/x"

    def test_malformed_jinja_fails_fast(self):
        """A Jinja syntax error in ANY template must raise RuleError at
        parse time, not surface as a million swallowed row errors
        (reference validates every metadata term before converting,
        csvw.py:281-293)."""
        with pytest.raises(RuleError, match="malformed"):
            doc_of([{"name": "a", "value": "{{a|lower"}])  # unclosed
        with pytest.raises(RuleError, match="malformed"):
            doc_of([{"name": "a", "valueUrl": "x/{{ a + }}"}])  # bad expr
        with pytest.raises(RuleError, match="malformed"):
            doc_of([{"name": "a",
                     "aboutUrl": "{% if a %}x{% endif"}])  # unclosed stmt

    def test_complex_url_iri_prevalidated(self):
        # a COMPLEX valueUrl whose placeholder render raises (beyond
        # the reference's TypeError quirk) fails fast…
        with pytest.raises(RuleError, match="valid IRI"):
            doc_of([{"name": "a", "valueUrl": "x/{{ none.foo() }}"}])
        # …but the same failure inside a {% %} conditional only warns
        # (the placeholder render sees one row-dependent branch)
        with pytest.warns(UserWarning):
            doc_of([{"name": "a",
                     "valueUrl":
                     "{% if a == 'x' %}{{ none.foo() }}{% endif %}"}])
        # valid COMPLEX url templates still parse clean, and the
        # reference's TypeError quirk ({{_row + 'x'}}) stays accepted
        d = doc_of([{"name": "a", "valueUrl": "thing/{{a|lower}}"}])
        assert d.columns[0].value_url.kind == "complex"
        doc_of([{"name": "a", "valueUrl": "t/{{_row + 'x'}}"}])

    def test_null_parsing(self):
        d = doc_of(
            [
                {"name": "a", "null": "NA"},
                {"name": "b", "null": ["x", "y"]},
                {"name": "c", "null": [{"name": "a", "null": "0"}]},
            ]
        )
        assert d.columns[0].null_scalar == "NA"
        assert d.columns[1].null_list == ["x", "y"]
        assert d.columns[2].null_conditions == [("a", "0")]


# ---------------- oracle ----------------

class TestOracle:
    def test_basic_row(self):
        d = doc_of(
            [
                {"name": "Country", "datatype": "string"},
                {"name": "Rank", "datatype": "integer"},
            ]
        )
        r = process_row({"Country": "Qatar", "Rank": "1"}, 0, d)
        assert set(r.triples) == {
            (BASE + "row/0", BASE + "vocab/Country", "Qatar", "literal", None, None),
            (BASE + "row/0", BASE + "vocab/Rank", "1", "literal", XSD + "integer", None),
        }

    def test_empty_cell_skipped(self):
        d = doc_of([{"name": "a"}])
        assert process_row({"a": ""}, 0, d).triples == []
        assert process_row({"a": ""}, 0, d).null_skips == 1

    def test_parse_on_empty(self):
        d = doc_of([{"name": "a", "parseOnEmpty": True}])
        r = process_row({"a": ""}, 0, d)
        assert len(r.triples) == 1
        assert r.triples[0][2] == ""

    def test_null_scalar_and_char_quirk(self):
        d = doc_of([{"name": "a", "null": "NA"}])
        assert process_row({"a": "NA"}, 0, d).triples == []
        # reference quirk: single chars of the scalar null also match
        assert process_row({"a": "N"}, 0, d).triples == []
        assert len(process_row({"a": "NAB"}, 0, d).triples) == 1

    def test_schema_null_requires_column_null(self):
        # quirk: schema-level null is only consulted when the column
        # defines its own null (csvw.py:916-930 TypeError path)
        d_no = doc_of([{"name": "a"}], null="XX")
        assert len(process_row({"a": "XX"}, 0, d_no).triples) == 1
        d_yes = doc_of([{"name": "a", "null": "zz"}], null="XX")
        assert process_row({"a": "XX"}, 0, d_yes).triples == []

    def test_conditional_null(self):
        d = doc_of(
            [
                {"name": "age", "null": [{"name": "flag", "null": "0"}]},
                {"name": "flag"},
            ]
        )
        r = process_row({"age": "30", "flag": "0"}, 0, d)
        preds = {t[1] for t in r.triples}
        assert BASE + "vocab/age" not in preds
        assert BASE + "vocab/flag" in preds
        r2 = process_row({"age": "30", "flag": "1"}, 0, d)
        assert BASE + "vocab/age" in {t[1] for t in r2.triples}

    def test_value_url_object_property(self):
        d = doc_of([{"name": "place", "valueUrl": "place/{place}"}])
        r = process_row({"place": "Amsterdam"}, 3, d)
        assert r.triples == [
            (BASE + "row/3", BASE + "vocab/place", BASE + "place/Amsterdam",
             "iri", None, None)
        ]

    def test_value_url_null_basename_drops_triple(self):
        d = doc_of([{"name": "place", "null": "unknown", "valueUrl": "p/{place}"}])
        assert process_row({"place": "unknown"}, 0, d).triples == []

    def test_lang_literal_drops_datatype(self):
        d = doc_of([{"name": "t", "datatype": "string", "lang": "{l}"}, {"name": "l"}])
        r = process_row({"t": "hoi", "l": "nl"}, 0, d)
        lang_triples = [t for t in r.triples if t[1].endswith("/t")]
        assert lang_triples == [
            (BASE + "row/0", BASE + "vocab/t", "hoi", "literal", None, "nl")
        ]

    def test_xsd_string_emitted_plain(self):
        d = doc_of([{"name": "a", "datatype": "string"}])
        t = process_row({"a": "x"}, 0, d).triples[0]
        assert t[4] is None  # RDF 1.1 plain

    def test_any_uri_object(self):
        d = doc_of([{"name": "u", "datatype": "anyURI"}])
        t = process_row({"u": "http://ex.com/a b"}, 0, d).triples[0]
        assert t[3] == "iri"
        assert t[2] == "http://ex.com/a%20b"

    def test_virtual_any_uri(self):
        d = doc_of(
            [
                {"name": "u", "virtual": True, "datatype": "anyURI",
                 "propertyUrl": "rdfs:seeAlso", "valueUrl": "ignored/{u}"}
            ]
        )
        t = process_row({"u": "http://ex.com/x"}, 0, d).triples[0]
        assert t[2] == "http://ex.com/x"
        assert t[3] == "iri"

    def test_link_uri(self):
        d = doc_of(
            [
                {"virtual": True, "name": None, "datatype": "xsd:linkURI",
                 "propertyUrl": "owl:sameAs",
                 "aboutUrl": "x/{a}", "valueUrl": "y/{b}"}
            ]
        )
        r = process_row({"a": "http://s.org/1", "b": "http://o.org/2"}, 0, d)
        assert r.triples == [
            ("http://s.org/1", "http://www.w3.org/2002/07/owl#sameAs",
             "http://o.org/2", "iri", None, None)
        ]

    def test_skos_collection(self):
        d = doc_of(
            [{"name": "code", "valueUrl": "code/{code}",
              "collectionUrl": "collection/codes"}]
        )
        r = process_row({"code": "A"}, 0, d)
        coll = BASE + "collection/codes"
        obj = BASE + "code/A"
        assert (coll, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                SKOS + "Collection", "iri", None, None) in r.triples
        assert (coll, SKOS + "member", obj, "iri", None, None) in r.triples
        # main triple emitted last
        assert r.triples[-1][1] == BASE + "vocab/code"

    def test_skos_scheme(self):
        d = doc_of(
            [{"name": "p", "valueUrl": "p/{p}", "schemeUrl": "scheme/places"}]
        )
        r = process_row({"p": "X"}, 0, d)
        assert (BASE + "p/X", SKOS + "inScheme", BASE + "scheme/places",
                "iri", None, None) in r.triples

    def test_error_swallowed(self):
        # valueUrl referencing a missing column → KeyError → dropped
        d = doc_of([{"name": "a", "valueUrl": "x/{nope}"}])
        r = process_row({"a": "v"}, 0, d)
        assert r.triples == []
        assert r.errors == 1

    def test_csvw_value_template(self):
        d = doc_of(
            [{"name": "v", "value": "{{'%03d'|format(v|int)}}", "datatype": "string"}]
        )
        t = process_row({"v": "7"}, 0, d).triples[0]
        assert t[2] == "007"

    def test_process_table_row_ids(self):
        d = doc_of([{"name": "a"}])
        triples, _, _ = process_table([{"a": "x"}, {"a": "y"}], d, start_row_id=5)
        assert triples[0][0].endswith("row/5")
        assert triples[1][0].endswith("row/6")

    def test_imf_gdppc_golden(self):
        """FIXTURES.md F4: the docs' worked example — 8 rows × 3 string
        columns under aboutUrl {_row} → 24 assertion triples with
        base-relative subjects 0..7 (docs/index.rst "Converting a CSV
        file")."""
        rows = [
            {"Rank": "1", "Country": "Qatar", "GDP_Per_Capita": "131,063"},
            {"Rank": "2", "Country": "Luxembourg", "GDP_Per_Capita": "104,906"},
            {"Rank": "3", "Country": "Macau", "GDP_Per_Capita": "96,832"},
            {"Rank": "4", "Country": "Singapore", "GDP_Per_Capita": "90,249"},
            {"Rank": "5", "Country": "Brunei Darussalam", "GDP_Per_Capita": "83,513"},
            {"Rank": "6", "Country": "Kuwait", "GDP_Per_Capita": "72,675"},
            {"Rank": "7", "Country": "Ireland", "GDP_Per_Capita": "72,524"},
            {"Rank": "8", "Country": "Norway", "GDP_Per_Capita": "70,645"},
        ]
        base = "http://example.com/resource/"
        d = parse_rules(
            {
                "base": base,
                "aboutUrl": "{_row}",
                "primaryKey": "Rank",
                "columns": [
                    {"name": "Rank", "datatype": "string"},
                    {"name": "Country", "datatype": "string"},
                    {"name": "GDP_Per_Capita", "datatype": "string"},
                ],
            }
        )
        triples, errors, skips = process_table(rows, d)
        assert errors == 0 and skips == 0
        assert len(triples) == 24
        assert (base + "0", base + "vocab/Country", "Qatar",
                "literal", None, None) in triples
        assert (base + "7", base + "vocab/GDP_Per_Capita", "70,645",
                "literal", None, None) in triples

    def test_null_value_check(self):
        assert is_value_null("", parse_rules(
            {"base": BASE, "aboutUrl": "r/{_row}",
             "columns": [{"name": "a"}]}).columns[0], None)


class TestLowering:
    """Cookbook-pattern lowering must agree with exact Jinja rendering
    on every value class (guard-masked rows fall back)."""

    VALUES = ["abc", "ABC", "MiXed", "café", "İstanbul", "012", "0", "12345",
              "1234567", "-5", " 12", "", "x1", "nan", "12.5"]

    def _check(self, pattern, col="v"):
        import numpy as np
        import pyarrow as pa
        from cow_ray.templating import compile_template, normalize_column

        t = compile_template(pattern)
        assert t.lowering is not None, f"{pattern} did not lower"
        cols = {col: normalize_column(pa.array(self.VALUES))}
        arr, need = t.lowering(cols, len(self.VALUES))
        vals = arr.to_pylist()
        need = np.asarray(need.to_pylist() if hasattr(need, "to_pylist")
                          else need, dtype=bool)
        for i, v in enumerate(self.VALUES):
            want = None
            try:
                want = t.render_row({col: v, "_row": i})
            except Exception:
                continue  # jinja raises → fallback handles; skip
            if not need[i]:
                assert vals[i] == want, (pattern, v, vals[i], want)

    def test_lower_upper(self):
        self._check("{{v|lower}}")
        self._check("{{v|upper}}")

    def test_zeropad(self):
        self._check("{{'%05d'|format(v|int)}}")
        self._check("{{'%03d'|format(v|int)}}")

    def test_if_else(self):
        self._check("{% if v == 'abc' %}yes{% else %}no{% endif %}")

    def test_kernel_uses_lowering_consistently(self):
        import pyarrow as pa
        from cow_ray.oracle import process_table
        from cow_ray.triples import EmitTriples

        d = parse_rules({
            "base": BASE, "aboutUrl": "r/{_row}",
            "columns": [
                {"name": "v", "value": "{{'%05d'|format(v|int)}}"},
                {"name": "v", "value": "{{v|upper}}", "propertyUrl": "rdfs:label"},
            ],
        })
        rows = [{"v": x} for x in self.VALUES]
        want, errors, _ = process_table(rows, d)
        t = pa.Table.from_pylist(rows).append_column(
            "_row", pa.array(range(len(rows)), type=pa.int64()))
        k = EmitTriples(d)
        out = k(t)
        got = set(zip(*[out[c].to_pylist() for c in out.column_names]))
        assert got == set(want)
        assert k.errors == errors
