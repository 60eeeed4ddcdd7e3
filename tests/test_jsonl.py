"""JSONL source: chunk-invariant parsing, deterministic _row, blank
lines, schema/column projection, gzip shards."""

import gzip
import json
import os

import pyarrow as pa
import pytest

from cow_ray.sources.jsonl import (
    _count_record_starts,
    read_jsonl_with_row_ids,
)


def write_jsonl(path, records, trailing_newline=True):
    body = "\n".join(json.dumps(r) for r in records)
    if trailing_newline:
        body += "\n"
    with open(path, "w") as f:
        f.write(body)


def records(n, start=0):
    return [
        {"doc_id": i, "text": f"doc {i} " + "x" * (i % 17),
         "lang": ["en", "de", "fr"][i % 3]}
        for i in range(start, start + n)
    ]


class TestCountKernel:
    def count_whole(self, data: bytes) -> int:
        return _count_record_starts(data, True)

    def test_basic(self):
        assert self.count_whole(b'{"a":1}\n{"a":2}\n') == 2
        assert self.count_whole(b'{"a":1}\n{"a":2}') == 2  # no trailer
        assert self.count_whole(b"") == 0
        assert self.count_whole(b"\n\n\n") == 0
        assert self.count_whole(b'\n\n{"a":1}\n\n{"a":2}\n\n\n') == 2

    def test_window_tiling_matches_whole(self):
        """Counting over 1-byte-overlapping windows == whole-buffer
        count for every cut position and window size."""
        data = b'\n{"a":1}\n\n{"bb":2}\n{"c":3}'
        whole = self.count_whole(data)
        for w in range(1, len(data) + 1):
            cuts = list(range(0, len(data), w)) + [len(data)]
            total = 0
            for s, e in zip(cuts, cuts[1:]):
                win = data[max(s - 1, 0):e]
                total += _count_record_starts(win, s == 0)
            assert total == whole, w


class TestReadJsonl:
    def test_roundtrip_with_row_ids(self, ray_session, tmp_path):
        recs = records(50)
        p = str(tmp_path / "a.jsonl")
        write_jsonl(p, recs)
        out = read_jsonl_with_row_ids(p).take_all()
        assert len(out) == 50
        by_row = sorted(out, key=lambda r: r["_row"])
        for i, r in enumerate(by_row):
            assert r["_row"] == i
            assert r["doc_id"] == i and r["lang"] == recs[i]["lang"]

    @pytest.mark.parametrize("chunk_bytes", [16, 37, 128, 4096])
    def test_chunk_invariance(self, ray_session, tmp_path, chunk_bytes):
        """Result is identical whatever the chunk size — the ownership
        rule never duplicates or drops a boundary record."""
        recs = records(40)
        p = str(tmp_path / f"c{chunk_bytes}.jsonl")
        write_jsonl(p, recs, trailing_newline=(chunk_bytes % 2 == 0))
        out = read_jsonl_with_row_ids(
            p, target_chunk_bytes=chunk_bytes).take_all()
        assert sorted(r["doc_id"] for r in out) == list(range(40))
        assert sorted(r["_row"] for r in out) == list(range(40))
        id_by_row = {r["_row"]: r["doc_id"] for r in out}
        assert all(id_by_row[i] == i for i in range(40))

    def test_blank_lines_and_leading_newlines(self, ray_session,
                                              tmp_path):
        p = str(tmp_path / "b.jsonl")
        with open(p, "w") as f:
            f.write('\n\n{"doc_id": 0}\n\n\n{"doc_id": 1}\n\n')
        out = sorted(read_jsonl_with_row_ids(p).take_all(),
                     key=lambda r: r["_row"])
        assert [r["doc_id"] for r in out] == [0, 1]
        assert [r["_row"] for r in out] == [0, 1]

    def test_multi_file_and_gz_unified_row_space(self, ray_session,
                                                 tmp_path):
        a = records(20)
        b = records(15, start=20)
        c = records(10, start=35)
        pa_ = str(tmp_path / "a.jsonl")
        pb = str(tmp_path / "b.jsonl.gz")
        pc = str(tmp_path / "c.jsonl")
        write_jsonl(pa_, a)
        with gzip.open(pb, "wt") as f:
            for r in b:
                f.write(json.dumps(r) + "\n")
        write_jsonl(pc, c, trailing_newline=False)
        out = sorted(
            read_jsonl_with_row_ids(
                [pa_, pb, pc], target_chunk_bytes=200).take_all(),
            key=lambda r: r["_row"])
        assert [r["_row"] for r in out] == list(range(45))
        assert [r["doc_id"] for r in out] == list(range(45))

    def test_schema_projection_and_missing_keys(self, ray_session,
                                                tmp_path):
        p = str(tmp_path / "h.jsonl")
        with open(p, "w") as f:
            f.write('{"doc_id": 0, "text": "a", "extra": 9}\n')
            f.write('{"doc_id": 1}\n')
        schema = pa.schema([("doc_id", pa.int64()),
                            ("text", pa.string())])
        out = sorted(
            read_jsonl_with_row_ids(p, schema=schema).take_all(),
            key=lambda r: r["_row"])
        assert set(out[0]) == {"doc_id", "text", "_row"}
        assert out[0]["text"] == "a" and out[1]["text"] is None

    def test_columns_selection(self, ray_session, tmp_path):
        p = str(tmp_path / "s.jsonl")
        write_jsonl(p, records(5))
        out = read_jsonl_with_row_ids(p, columns=["doc_id"]).take_all()
        assert set(out[0]) == {"doc_id", "_row"}

    def test_empty_file(self, ray_session, tmp_path):
        p = str(tmp_path / "e.jsonl")
        open(p, "w").close()
        assert read_jsonl_with_row_ids(p).count() == 0

    def test_determinism_across_reads(self, ray_session, tmp_path):
        p = str(tmp_path / "d.jsonl")
        write_jsonl(p, records(30))
        r1 = sorted(read_jsonl_with_row_ids(
            p, target_chunk_bytes=64).take_all(),
            key=lambda r: r["_row"])
        r2 = sorted(read_jsonl_with_row_ids(
            p, target_chunk_bytes=64).take_all(),
            key=lambda r: r["_row"])
        assert r1 == r2


class TestConvertJsonl:
    def test_jsonl_convert_matches_csv_convert(self, ray_session,
                                               tmp_path):
        """The reference example serialized as JSONL (string values,
        same row order) must emit the exact same triple set as the CSV
        path under the same rules."""
        import csv as _csv
        import json as _json

        from cow_ray.sources.csv import convert_csv
        from cow_ray.sources.jsonl import convert_jsonl

        with open("examples/imf_gdppc.csv", newline="") as f:
            rows = list(_csv.DictReader(f, delimiter=";"))
        p = str(tmp_path / "imf.jsonl")
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        rules = _json.load(open("examples/imf_gdppc.csv-rules.json"))

        def triple_set(ds):
            return sorted(
                (r["subj"], r["pred"], r["obj_lex"], r["obj_kind"])
                for r in ds.take_all())

        want, _ = convert_csv("examples/imf_gdppc.csv", rules)
        got, _ = convert_jsonl(p, rules)
        assert triple_set(got) == triple_set(want)
        assert len(triple_set(got)) == 24  # the CLI golden count

    def test_build_skeleton_from_jsonl(self, tmp_path):
        from cow_ray.build import build_rules

        p = str(tmp_path / "t.jsonl")
        with open(p, "w") as f:
            f.write('{"a": 1, "b": "x"}\n{"a": 2, "c": null}\n')
        doc = build_rules(p, base="https://example.com/id")
        names = [c["name"] for c in doc["tableSchema"]["columns"]]
        assert names == ["a", "b", "c"]  # first-seen order, unioned
        assert doc["tableSchema"]["primaryKey"] == "a"


class TestSinkRoundtrip:
    def test_shard_export_roundtrip(self, ray_session, tmp_path):
        import os

        import ray.data

        from cow_ray.sources.jsonl import (
            read_jsonl_with_row_ids,
            write_jsonl_shards,
        )

        rows = records(25)
        # adversarial content: quotes, newline-escapes, unicode
        rows[3]["text"] = 'he said "hi"\\n\t naïve — ünïcödé'
        rows[7]["text"] = ""
        ds = ray.data.from_items(rows).repartition(4)
        out = str(tmp_path / "shards")
        m = pa.Table.from_pandas(
            write_jsonl_shards(ds, out).to_pandas(),
            preserve_index=False)
        assert sum(m["records"].to_pylist()) == 25
        files = sorted(os.path.join(out, f) for f in os.listdir(out)
                       if f.endswith(".jsonl.gz"))
        assert len(files) == len(m["path"])
        back = read_jsonl_with_row_ids(files).to_pandas()
        got = sorted(
            (int(r.doc_id), r.text, r.lang)
            for r in back.itertuples(index=False))
        want = sorted((r["doc_id"], r["text"], r["lang"]) for r in rows)
        assert got == want

    def test_plain_shards(self, ray_session, tmp_path):
        import os

        import ray.data

        from cow_ray.sources.jsonl import (
            read_jsonl_with_row_ids,
            write_jsonl_shards,
        )

        ds = ray.data.from_items(records(10)).repartition(2)
        out = str(tmp_path / "plain")
        write_jsonl_shards(ds, out, gzip_shards=False).materialize()
        files = sorted(os.path.join(out, f) for f in os.listdir(out)
                       if f.endswith(".jsonl"))
        assert files and not any(f.endswith(".gz") for f in files)
        back = read_jsonl_with_row_ids(files).to_pandas()
        assert len(back) == 10

    def test_duplicate_batches_keep_cardinality(self, ray_session,
                                                tmp_path):
        """Byte-identical batches must produce DISTINCT shard files
        (content-only naming would collapse them and silently change
        bag cardinality)."""
        import os

        import ray.data

        from cow_ray.sources.jsonl import (
            read_jsonl_with_row_ids,
            write_jsonl_shards,
        )

        rows = [{"doc_id": 1, "text": "same", "lang": "en"}] * 2
        # two single-row, byte-identical blocks
        ds = ray.data.from_items(rows).repartition(2)
        out = str(tmp_path / "dup")
        m = write_jsonl_shards(ds, out).to_pandas()
        files = [f for f in os.listdir(out) if f.endswith(".jsonl.gz")]
        assert len(files) == 2 and m["records"].sum() == 2
        back = read_jsonl_with_row_ids(
            sorted(os.path.join(out, f) for f in files)).to_pandas()
        assert len(back) == 2
