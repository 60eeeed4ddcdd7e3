"""Property-based equivalence: for randomized rule documents × row
tables, the vectorized kernel must produce exactly the oracle's triple
set, error count, and null-skip count (SURVEY.md §5: randomized
rule/row property tests against the row-wise oracle)."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from cow_ray.oracle import process_table
from cow_ray.rules import parse_rules
from cow_ray.triples import EmitTriples

BASE = "https://ex.org/id/"

# cell values that exercise every gate: empties, null sentinels, chars
# of null sentinels, IRI-hostile strings, unicode, format-hostile braces
CELLS = st.sampled_from(
    ["", "NA", "N", "x", "0", "1", "val", "a b", "100%", "café",
     "{bad}", "a,b;c", "http://ex.com/ok", "not a uri", "  ", "A#B",
     "unknown", "none", "-1", "12.5", "12,5"]
)

COLS = ["c0", "c1", "c2"]


def col_rule(i: int, kind: str, null_kind: str, datatype: str | None,
             parse_on_empty: bool):
    rule: dict = {"name": COLS[i % len(COLS)]}
    other = COLS[(i + 1) % len(COLS)]
    if null_kind == "scalar":
        rule["null"] = "NA"
    elif null_kind == "list":
        rule["null"] = ["NA", "none"]
    elif null_kind == "list_empty":
        # '' as an explicit null sentinel — exercises the
        # parseOnEmpty short-circuit (reference isValueNull returns
        # False on an empty cell before consulting the spec)
        rule["null"] = ["", "NA"]
    elif null_kind == "cond":
        rule["null"] = [{"name": other, "null": "0"}]
    if parse_on_empty:
        rule["parseOnEmpty"] = True
    if kind == "literal":
        if datatype:
            rule["datatype"] = datatype
        if datatype == "string" and i % 2:
            rule["lang"] = "{" + other + "}"
    elif kind == "value_url":
        rule["valueUrl"] = f"obj/{{{rule['name']}}}"
        if i % 3 == 0:
            rule["schemeUrl"] = "scheme/s"
        if i % 3 == 1:
            rule["collectionUrl"] = f"coll/{{{other}}}"
    elif kind == "value_tmpl":
        rule["value"] = f"v-{{{other}}}-{{_row}}"
        if datatype:
            rule["datatype"] = datatype
    elif kind == "jinja":
        rule["value"] = "{{" + rule["name"] + "|upper}}:{{_row + 1}}"
    elif kind == "jinja_concat":
        rule["value"] = "{{" + rule["name"] + " ~ '-' ~ " + other + "}}"
    elif kind == "jinja_slice":
        rule["value"] = "{{" + rule["name"] + "[1:4]}}"
    elif kind == "jinja_arith":
        rule["value"] = "{{" + rule["name"] + "|float() * 1000}}"
    elif kind == "about_override":
        rule["aboutUrl"] = f"alt/{{{other}}}"
        rule["propertyUrl"] = "rdfs:seeAlso"
        rule["valueUrl"] = f"o/{{{rule['name']}}}"
    return rule


rule_st = st.builds(
    col_rule,
    st.integers(0, 2),
    st.sampled_from(["literal", "value_url", "value_tmpl", "jinja",
                     "jinja_concat", "jinja_slice", "jinja_arith",
                     "about_override"]),
    st.sampled_from(["none", "scalar", "list", "list_empty", "cond"]),
    st.sampled_from([None, "string", "integer", "anyURI"]),
    st.booleans(),
)

doc_st = st.builds(
    lambda cols, schema_null: {
        "base": BASE,
        "aboutUrl": "row/{_row}",
        **({"null": "GLOBALNULL"} if schema_null else {}),
        "columns": cols,
    },
    st.lists(rule_st, min_size=1, max_size=5),
    st.booleans(),
)

rows_st = st.lists(
    st.fixed_dictionaries({c: CELLS for c in COLS}), min_size=0, max_size=12
)


@settings(max_examples=250, deadline=None)
@given(doc_st, rows_st, st.integers(0, 10_000))
def test_kernel_equals_oracle(doc_dict, rows, start_row):
    doc = parse_rules(doc_dict)

    want, errors, skips = process_table(rows, doc, start_row)

    if rows:
        table = pa.Table.from_pylist(rows)
    else:
        table = pa.table({c: pa.array([], type=pa.string()) for c in COLS})
    table = table.append_column(
        "_row", pa.array(range(start_row, start_row + len(rows)),
                         type=pa.int64())
    )
    kernel = EmitTriples(doc)
    out = kernel(table)
    got = set(zip(*[out[c].to_pylist() for c in out.column_names])) \
        if out.num_rows else set()

    assert got == set(want)
    assert kernel.errors == errors
    assert kernel.null_skips == skips
