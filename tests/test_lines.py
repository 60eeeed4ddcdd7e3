"""Corpus-level exact line dedup (cow_ray/ops/lines.py)."""

import numpy as np
import pyarrow as pa
import pytest

from cow_ray.ops.lines import count_repeated_lines, dedup_lines


def _corpus():
    docs = []
    for i in range(12):
        lines = ["shared header", f"unique body {i}"]
        if i % 2 == 0:
            lines.append("even promo")   # 6 occurrences
        if i < 2:
            lines.append("rare pair")    # 2 occurrences (< 3, kept)
        lines.append("")                 # blank: never dropped
        lines.append("   ")              # whitespace-only: kept
        docs.append({"doc_id": i, "text": "\n".join(lines)})
    docs.append({"doc_id": 99, "text": ""})  # empty doc
    return docs


def _brute(docs, min_count=3):
    from collections import Counter

    c = Counter()
    for d in docs:
        for ln in d["text"].split("\n"):
            if ln.strip():
                c[ln] += 1
    bad = {ln for ln, n in c.items() if n >= min_count}
    out = {}
    for d in docs:
        kept = [ln for ln in d["text"].split("\n")
                if not ln.strip() or ln not in bad]
        out[d["doc_id"]] = ("\n".join(kept),
                            len(d["text"].split("\n")) - len(kept))
    return bad, out


def test_census_matches_brute_force(ray_session):
    import ray.data

    docs = _corpus()
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    bad_h = count_repeated_lines(ds, min_count=3, num_parts=4)
    bad_ref, _ = _brute(docs)
    assert len(bad_h) == len(bad_ref)  # {shared header, even promo}
    assert len(bad_ref) == 2


def test_dedup_matches_brute_force(ray_session):
    import ray.data

    docs = _corpus()
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    got = {r["doc_id"]: (r["clean_text"], r["n_lines_removed"])
           for r in dedup_lines(ds, min_count=3,
                                num_parts=4).take_all()}
    _, want = _brute(docs)
    assert got == want
    # spot invariants: blanks survive, rare pair survives
    assert got[0][0].split("\n").count("") == 1
    assert "rare pair" in got[0][0] and "even promo" not in got[0][0]
    assert got[99] == ("", 0)


def test_min_count_boundary(ray_session):
    import ray.data

    docs = _corpus()
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    # min_count=2 also catches "rare pair"
    bad_h = count_repeated_lines(ds, min_count=2, num_parts=4)
    assert len(bad_h) == 3


def test_max_bad_budget_raises(ray_session):
    import ray.data

    docs = _corpus()
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    with pytest.raises(ValueError, match="max_bad"):
        count_repeated_lines(ds, min_count=2, num_parts=4, max_bad=1)


def test_census_reuse_via_objectref(ray_session):
    import ray
    import ray.data

    docs = _corpus()
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    bad = count_repeated_lines(ds, min_count=3, num_parts=4)
    out = dedup_lines(ds, bad_hashes=ray.put(bad)).take_all()
    _, want = _brute(docs)
    assert {r["doc_id"]: (r["clean_text"], r["n_lines_removed"])
            for r in out} == want


def test_no_repeats_is_identity(ray_session):
    import ray.data

    tbl = pa.table({"doc_id": [1, 2],
                    "text": ["only one\nof these", "and another"]})
    out = dedup_lines(ray.data.from_arrow(tbl), min_count=2,
                      num_parts=2).take_all()
    assert all(r["clean_text"] == r["text"]
               and r["n_lines_removed"] == 0 for r in out)


class TestParagraphSep:
    def test_paragraph_granularity(self, ray_session):
        """sep='\\n\\n' dedups whole paragraphs and leaves intra-
        paragraph newlines (and the structural blank boundaries)
        intact."""
        import ray.data

        from cow_ray.ops.lines import dedup_lines

        boiler = "terms\nall rights reserved"
        rows = [{"doc_id": i,
                 "text": f"{boiler}\n\nbody {i}\nline two {i}"}
                for i in range(4)]
        out = {r["doc_id"]: r for r in dedup_lines(
            ray.data.from_items(rows).repartition(2),
            min_count=3, num_parts=2, sep="\n\n",
            removed_col="n_paras_removed").take_all()}
        for i in range(4):
            assert out[i]["clean_text"] == f"body {i}\nline two {i}"
            assert out[i]["n_paras_removed"] == 1

    def test_line_mode_would_differ(self, ray_session):
        """The same corpus under LINE dedup drops the shared lines
        inside otherwise-unique paragraphs — proving the two
        granularities are distinct operators."""
        import ray.data

        from cow_ray.ops.lines import dedup_lines

        rows = [{"doc_id": i, "text": f"shared line\n\nbody {i}"}
                for i in range(4)]
        out = dedup_lines(ray.data.from_items(rows).repartition(2),
                          min_count=3, num_parts=2).take_all()
        for r in out:
            assert "shared line" not in r["clean_text"]
            assert f"body {r['doc_id']}" in r["clean_text"]
