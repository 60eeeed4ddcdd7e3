"""The vectorized EmitTriples kernel must agree with the row-wise
oracle on every rule class (FIXTURES.md F5 rule-coverage matrix).

The kernel is a pure ``pa.Table -> pa.Table`` function, so most tests
run without Ray; one end-to-end test drives
source → map_batches(EmitTriples) under a real Ray session.
"""

import pyarrow as pa
import pytest

from cow_ray.fixtures import make_pages_rows, pages_rule_doc, pages_table
from cow_ray.oracle import process_table
from cow_ray.rules import parse_rules
from cow_ray.triples import EmitTriples, TRIPLE_SCHEMA

BASE = "https://ex.org/id/"


def run_kernel(doc, rows: list[dict], start_row: int = 0):
    """Drive the kernel on a python-row table with _row attached."""
    table = pa.Table.from_pylist(rows)
    table = table.append_column(
        "_row", pa.array(range(start_row, start_row + len(rows)), type=pa.int64())
    )
    kernel = EmitTriples(doc)
    out = kernel(table)
    assert out.schema.equals(TRIPLE_SCHEMA)
    return set(map(tuple, zip(*[out[c].to_pylist() for c in out.column_names]))), kernel


def oracle_set(doc, rows: list[dict], start_row: int = 0):
    triples, errors, skips = process_table(rows, doc, start_row)
    return set(triples), errors, skips


def assert_match(doc_dict, rows, start_row=0):
    doc = parse_rules(doc_dict)
    got, kernel = run_kernel(doc, rows, start_row)
    want, errors, skips = oracle_set(doc, rows, start_row)
    assert got == want
    assert kernel.errors == errors
    assert kernel.null_skips == skips
    return got


class TestKernelVsOracle:
    def test_plain_literals(self):
        assert_match(
            {"base": BASE, "aboutUrl": "r/{_row}",
             "columns": [{"name": "a"}, {"name": "b", "datatype": "integer"}]},
            [{"a": "x", "b": "1"}, {"a": "y", "b": "2"}],
        )

    def test_nulls_all_kinds(self):
        doc = {
            "base": BASE, "aboutUrl": "r/{_row}", "null": "GLOBAL",
            "columns": [
                {"name": "a", "null": "NA"},
                {"name": "b", "null": ["x", "y"]},
                {"name": "c", "null": [{"name": "flag", "null": "0"}]},
                {"name": "d", "parseOnEmpty": True},
                {"name": "e"},
                {"name": "flag"},
            ],
        }
        rows = [
            {"a": "NA", "b": "x", "c": "v", "d": "", "e": "GLOBAL", "flag": "0"},
            {"a": "N", "b": "GLOBAL", "c": "w", "d": "q", "e": "", "flag": "1"},
            {"a": "ok", "b": "z", "c": "", "d": "", "e": "E", "flag": "0"},
        ]
        assert_match(doc, rows)

    def test_value_url_and_skos(self):
        doc = {
            "base": BASE, "aboutUrl": "r/{_row}",
            "columns": [
                {"name": "place", "null": "unknown", "valueUrl": "place/{place}",
                 "schemeUrl": "scheme/places"},
                {"name": "code", "valueUrl": "code/{code}",
                 "collectionUrl": "collection/codes"},
            ],
        }
        rows = [
            {"place": "Amsterdam", "code": "A"},
            {"place": "unknown", "code": "B"},
            {"place": "Den Haag", "code": ""},
        ]
        assert_match(doc, rows)

    def test_lang_and_anyuri(self):
        doc = {
            "base": BASE, "aboutUrl": "r/{_row}",
            "columns": [
                {"name": "t", "datatype": "string", "lang": "{l}"},
                {"name": "l"},
                {"name": "u", "datatype": "anyURI"},
            ],
        }
        rows = [
            {"t": "hoi", "l": "nl", "u": "http://ex.com/a b"},
            {"t": "hey", "l": "en-GB", "u": "not a uri"},  # anyURI error path
        ]
        assert_match(doc, rows)

    def test_virtual_anyuri_and_linkuri(self):
        doc = {
            "base": BASE, "aboutUrl": "r/{_row}",
            "columns": [
                {"name": "u", "virtual": True, "datatype": "anyURI",
                 "propertyUrl": "rdfs:seeAlso", "valueUrl": "x/{u}"},
                {"virtual": True, "datatype": "xsd:linkURI",
                 "propertyUrl": "owl:sameAs",
                 "aboutUrl": "s/{s}", "valueUrl": "o/{o}"},
            ],
        }
        rows = [
            {"u": "http://ex.com/1", "s": "http://a.org/x", "o": "http://b.org/y"},
            {"u": "http://ex.com/2", "s": "bad", "o": "http://b.org/z"},
        ]
        assert_match(doc, rows)

    def test_jinja_complex(self):
        doc = {
            "base": BASE, "aboutUrl": "r/{_row}",
            "columns": [
                {"name": "gdp", "value": "{{'%09d'|format(gdp|int)}}",
                 "datatype": "integer"},
                {"virtual": True, "propertyUrl": "rdf:type",
                 "valueUrl": "{% if gdp|int > 100 %}rich{% else %}poor{% endif %}"},
                {"name": "name", "value": "{{name|lower}} ({{_row + 1}})"},
            ],
        }
        rows = [{"gdp": "150", "name": "Qatar"}, {"gdp": "50", "name": "Chad"}]
        assert_match(doc, rows, start_row=7)

    def test_cookbook_concat_lowering(self):
        """{{a ~ '-' ~ b}} (docs/index.rst cookbook) — Arrow fast path
        must match exact Jinja+format on hostile values."""
        vals = ["x", "", "café", "{brace}", "a}b", "  sp  ", "12", "none"]
        rows = [{"a": va, "b": vb} for va in vals for vb in vals]
        assert_match(
            {"base": BASE, "aboutUrl": "r/{_row}",
             "columns": [{"name": "a", "value": "{{a ~ '-' ~ b}}",
                          "datatype": "string"}]},
            rows,
        )
        # literal containing '~' stays one literal
        assert_match(
            {"base": BASE, "aboutUrl": "r/{_row}",
             "columns": [{"name": "a", "value": "{{a ~ '~x~' ~ a}}",
                          "datatype": "string"}]},
            rows[:8],
        )

    def test_cookbook_slice_lowering(self):
        """{{v[n:m]}} — codepoint slicing incl. unicode, negatives,
        out-of-range bounds, open ends."""
        vals = ["hello world", "", "ü", "çafé-unicode", "{x}", "ab",
                "0123456789abcdef"]
        rows = [{"v": v} for v in vals]
        for pat in ("{{v[0:5]}}", "{{v[2:4]}}", "{{v[3:]}}", "{{v[:4]}}",
                    "{{v[-3:]}}", "{{v[1:-1]}}", "{{v[5:2]}}"):
            assert_match(
                {"base": BASE, "aboutUrl": "r/{_row}",
                 "columns": [{"name": "v", "value": pat,
                              "datatype": "string"}]},
                rows,
            )

    def test_cookbook_arithmetic_lowering(self):
        """{{v|float() * 1000}} family — numeric formatting must equal
        Python str() exactly (the '.0' / exponent-padding cases)."""
        vals = ["2.5", "0", "-3", "1", "0.001", "12.75", "999999999999999",
                "00123", "1e3", "abc", "", " 7 ", "инф", "12.5.3", "0.0000001"]
        rows = [{"v": v} for v in vals]
        for pat in ("{{v|float() * 1000}}", "{{v|float * 2}}",
                    "{{v|float() / 3}}", "{{v|float - 0.5}}",
                    "{{v|int * 10}}", "{{v|int + 1}}", "{{v|int() - 7}}",
                    "{{v|int / 4}}"):
            assert_match(
                {"base": BASE, "aboutUrl": "r/{_row}",
                 "columns": [{"name": "v", "value": pat,
                              "datatype": "string"}]},
                rows,
            )

    def test_cookbook_lowerings_are_active(self):
        """The shapes above must actually compile to a lowering (not
        silently fall back to row-wise Jinja)."""
        from cow_ray.templating import CompiledTemplate

        for pat in ("{{a ~ '-' ~ b}}", "{{v[2:4]}}", "{{v|float() * 1000}}",
                    "{{v|int + 1}}", "{{v|lower()}}"):
            assert CompiledTemplate(pat).lowering is not None, pat
        # div-by-zero must NOT lower (Python raises; IEEE gives inf)
        assert CompiledTemplate("{{v|float() / 0}}").lowering is None

    def test_error_isolation_missing_column(self):
        doc = {
            "base": BASE, "aboutUrl": "r/{_row}",
            "columns": [{"name": "a", "valueUrl": "x/{missing}"}, {"name": "a"}],
        }
        assert_match(doc, [{"a": "v1"}, {"a": "v2"}])

    def test_unicode_and_escaping(self):
        doc = {
            "base": BASE, "aboutUrl": "r/{n}",
            "columns": [{"name": "n", "valueUrl": "p/{n}"}],
        }
        rows = [
            {"n": "café"},
            {"n": "a b,c"},
            {"n": "100%"},
            {"n": "already%20ok"},
            {"n": "tricky?"},
        ]
        assert_match(doc, rows)

    def test_about_override(self):
        doc = {
            "base": BASE, "aboutUrl": "r/{_row}",
            "columns": [
                {"name": "a", "aboutUrl": "entity/{a}", "propertyUrl": "rdfs:label"},
            ],
        }
        assert_match(doc, [{"a": "X"}, {"a": "Y Z"}])

    def test_pages_fixture_rules(self):
        rows = make_pages_rows(200, seed=7)
        for r in rows:
            r["host"] = r["url"].split("/")[2]
            r["warc_ts"] = str(r["warc_ts"])  # oracle sees normalized strings
            del r["html"]
        assert_match(pages_rule_doc(), rows)

    def test_empty_batch(self):
        doc = parse_rules(
            {"base": BASE, "aboutUrl": "r/{_row}", "columns": [{"name": "a"}]}
        )
        out = EmitTriples(doc)(
            pa.table({"a": pa.array([], type=pa.string()),
                      "_row": pa.array([], type=pa.int64())})
        )
        assert out.num_rows == 0
        assert out.schema.equals(TRIPLE_SCHEMA)


class TestRaySourceAndKernel:
    def test_row_id_determinism_and_e2e(self, ray_session, tmp_path):
        """read_parquet_with_row_ids → EmitTriples over multiple row
        groups must equal the oracle regardless of block order."""
        from cow_ray.fixtures import write_pages_parquet
        from cow_ray.sources import read_parquet_with_row_ids

        path = str(tmp_path / "pages.parquet")
        write_pages_parquet(path, 500, seed=11, row_group_size=64)

        doc = parse_rules(
            {"base": BASE, "aboutUrl": "page/{_row}",
             "columns": [
                 {"name": "url", "datatype": "anyURI"},
                 {"name": "text", "datatype": "string", "lang": "{lang}"},
             ]}
        )
        ds = read_parquet_with_row_ids(path, columns=["url", "text", "lang"])
        out = ds.map_batches(
            EmitTriples(doc), batch_format="pyarrow", batch_size=100
        )
        got = set(
            map(tuple, (tuple(r.values()) for r in out.take_all()))
        )

        rows = [
            {k: r[k] for k in ("url", "text", "lang")}
            for r in make_pages_rows(500, seed=11)
        ]
        want, _, _ = oracle_set(parse_rules(
            {"base": BASE, "aboutUrl": "page/{_row}",
             "columns": [
                 {"name": "url", "datatype": "anyURI"},
                 {"name": "text", "datatype": "string", "lang": "{lang}"},
             ]}
        ), rows)
        assert got == want

    def test_row_ids_match_file_order(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        from cow_ray.sources import read_parquet_with_row_ids

        p1 = str(tmp_path / "a.parquet")
        p2 = str(tmp_path / "b.parquet")
        pq.write_table(pa.table({"v": ["r0", "r1", "r2"]}), p1, row_group_size=2)
        pq.write_table(pa.table({"v": ["r3", "r4"]}), p2)
        ds = read_parquet_with_row_ids([p1, p2])
        got = {r["_row"]: r["v"] for r in ds.take_all()}
        assert got == {0: "r0", 1: "r1", 2: "r2", 3: "r3", 4: "r4"}

    def test_single_row_group_splits_into_subrange_tasks(
        self, ray_session, tmp_path
    ):
        """A single giant row group must yield >1 read task (round-3
        verdict: one row group == one task serialized the whole fused
        chain), and _row ids must be split-factor invariant."""
        import numpy as np
        import pyarrow.parquet as pq
        from cow_ray.sources import plan_row_groups, read_parquet_with_row_ids
        from cow_ray.sources.parquet import RowIdParquetDatasource

        p = str(tmp_path / "one_group.parquet")
        n = 10_000
        pq.write_table(
            pa.table({"v": np.arange(n, dtype=np.int64)}), p,
            row_group_size=n,
        )
        assert pq.ParquetFile(p).metadata.num_row_groups == 1

        plan = plan_row_groups(p, max_rows_per_task=3_000)
        assert len(plan) == 4  # ceil(10000/3000)
        assert sum(t["num_rows"] for t in plan) == n
        assert [t["row_start"] for t in plan] == [0, 2500, 5000, 7500]

        src = RowIdParquetDatasource(p, max_rows_per_task=3_000)
        assert len(src.get_read_tasks(8)) > 1

        split = read_parquet_with_row_ids(p, max_rows_per_task=3_000)
        whole = read_parquet_with_row_ids(p, max_rows_per_task=10**9)
        a = split.sort("_row").take_batch(n, batch_format="pyarrow")
        b = whole.sort("_row").take_batch(n, batch_format="pyarrow")
        assert a.equals(b)
        assert a["_row"].to_pylist() == list(range(n))
        assert a["v"].to_pylist() == list(range(n))

    def test_read_parquet_split_no_row_ids(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq
        from cow_ray.sources import read_parquet_split

        p = str(tmp_path / "plain.parquet")
        pq.write_table(
            pa.table({"a": np.arange(5_000), "b": np.arange(5_000) * 2}),
            p, row_group_size=5_000,
        )
        ds = read_parquet_split(p, columns=["b"], max_rows_per_task=1_000)
        assert ds.schema().names == ["b"]
        assert sorted(r["b"] for r in ds.take_all()) == [
            x * 2 for x in range(5_000)
        ]


class TestCustomFilters:
    """User-extension surface (SURVEY §2.9): custom Jinja filters —
    the reference lists this as future work (docs/index.rst f3)."""

    def test_register_filter_end_to_end(self, ray_session):
        import ray.data

        from cow_ray.rules import parse_rules
        from cow_ray.templating import register_filter, unregister_filter
        from cow_ray.triples import EmitTriples

        def rot13(s):
            import codecs

            return codecs.encode(str(s), "rot_13")

        register_filter("rot13", rot13)
        try:
            rules = {
                "base": "http://x/", "aboutUrl": "r/{_row}",
                "columns": [{"name": "name",
                             "value": "{{name|rot13|upper}}",
                             "datatype": "string",
                             "propertyUrl": "rdfs:label"}],
            }
            ds = ray.data.from_items(
                [{"name": "hello", "_row": 0}, {"name": "world", "_row": 1}]
            )
            out = ds.map_batches(
                EmitTriples(parse_rules(rules)), batch_format="pyarrow"
            ).take_all()
            assert sorted(r["obj_lex"] for r in out) == ["JBEYQ", "URYYB"]
        finally:
            unregister_filter("rot13")

    def test_unknown_filter_fails_fast(self):
        import pytest as _pytest

        from cow_ray.rules import RuleError, parse_rules

        with _pytest.raises(RuleError, match="nosuchfilter"):
            parse_rules({
                "base": "http://x/", "aboutUrl": "r/{_row}",
                "columns": [{"name": "a", "value": "{{a|nosuchfilter}}",
                             "datatype": "string",
                             "propertyUrl": "rdfs:label"}],
            })
