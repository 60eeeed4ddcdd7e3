"""The reference's own example CSVs (FIXTURES.md F3) through the real
pipeline with authored COW-style metadata: `;`-delimited dialect,
decimal commas, empty cells, conditional nulls, names with commas —
compared against the row-wise oracle."""

import csv as _csv
import io

import pytest


def _oracle_rows(path, delimiter=";"):
    with open(path, encoding="utf-8") as f:
        return list(_csv.DictReader(f, delimiter=delimiter))


def _run(csv_path, meta, ray_session):
    from cow_ray.oracle import process_table
    from cow_ray.rules import parse_rules
    from cow_ray.sources.csv import read_csv_with_row_ids
    from cow_ray.triples import EmitTriples

    doc = parse_rules(meta)
    dialect = doc.dialect
    ds = read_csv_with_row_ids(
        csv_path,
        delimiter=dialect.get("delimiter"),
        quotechar=dialect.get("quoteChar", '"'),
    )
    got = {
        tuple(r[k] for k in ("subj", "pred", "obj_lex", "obj_kind",
                             "obj_datatype", "obj_lang"))
        for r in ds.map_batches(EmitTriples(doc),
                                batch_format="pyarrow").take_all()
    }
    rows = _oracle_rows(csv_path, dialect.get("delimiter", ";"))
    want, errors, skips = process_table(rows, doc)
    return got, set(want), errors, skips


def test_tafelvbis_stress(ray_session):
    """25 columns, frequent empties, decimal commas, multi-null,
    name-with-comma IRI stress (reference examples/tafelvbis.csv)."""
    meta = {
        "@context": ["csvw.json", {"@base": "https://iisg.amsterdam/"}],
        "url": "tafelvbis.csv",
        "dialect": {"delimiter": ";"},
        "tableSchema": {
            "aboutUrl": "person/{ID}",
            "primaryKey": "ID",
            "columns": [
                {"name": "Family-Name", "datatype": "string",
                 "propertyUrl": "foaf:familyName"},
                {"name": "Gender",
                 "valueUrl": "gender/{Gender}",
                 "null": [{"name": "Gender", "null": ""}]},
                {"name": "Hiscam", "datatype": "decimal"},  # "64,41" kept lexical
                {"name": "Profession", "null": "",
                 "valueUrl": "occupation/{Profession}",
                 "schemeUrl": "scheme/occupations"},
                {"name": "Age", "datatype": "integer",
                 "null": [{"name": "Year_Birth", "null": ""}]},
                {"name": "Residence", "valueUrl": "place/{Residence}"},
                {"name": "Net_value", "datatype": "decimal"},
            ],
        },
    }
    got, want, errors, skips = _run(
        "/root/reference/examples/tafelvbis.csv", meta, ray_session)
    assert got == want
    assert len(got) > 50
    # decimal comma preserved lexically (unnormalized literal)
    assert any(t[2] == "64,41" for t in got)
    # apostrophe place name minted as IRI
    assert any("place/" in t[2] and "Gravenhage" in t[2] for t in got
               if t[3] == "iri")


def test_buurt_decimal_commas(ray_session):
    meta = {
        "base": "https://iisg.amsterdam/",
        "url": "buurt.csv",
        "dialect": {"delimiter": ";"},
        "aboutUrl": "buurt/{properties_name_in_uri}",
        "columns": [
            {"name": "Dienstboden", "datatype": "decimal"},
        ],
    }
    got, want, errors, skips = _run(
        "/root/reference/examples/buurt.csv", meta, ray_session)
    assert got == want and errors == 0
    assert any(t[2] == "1,5" for t in got)
