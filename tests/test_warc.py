"""WARC source/sink: exact header-jump walk, deterministic _row,
record-type filtering, HTTP unwrapping, gz members, adversarial
payloads, distributed shard export round-trip."""

import gzip
import os

import pyarrow as pa
import pytest

from cow_ray.sources.warc import (
    PAGES_SCHEMA,
    _parse_records,
    _walk_plain,
    format_warc_record,
    read_warc_pages,
    write_warc,
    write_warc_shards,
)

KEEP = frozenset({"response"})


def make_records(n, start=0, with_noise=True):
    """Alternating response records + (optionally) request/metadata
    noise records, like a real crawl shard."""
    recs = []
    for i in range(start, start + n):
        body = (f"<html><body>doc {i} " + "x" * (i % 23)
                + "</body></html>").encode()
        recs.append(format_warc_record(
            f"https://example.org/doc/{i}", body,
            date=f"2026-01-0{1 + i % 9}T0{i % 10}:00:00Z"))
        if with_noise and i % 3 == 0:
            recs.append(format_warc_record(
                f"https://example.org/doc/{i}", b"GET / HTTP/1.1\r\n\r\n",
                warc_type="request"))
        if with_noise and i % 5 == 0:
            recs.append(format_warc_record(
                f"https://example.org/doc/{i}", b'{"k": 1}',
                warc_type="metadata", http=False, mime="application/json"))
    return recs


def table_of(ds) -> pa.Table:
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    return t.sort_by("_row")


class TestWalk:
    def test_walk_matches_parse(self, tmp_path):
        recs = make_records(10)
        p = str(tmp_path / "a.warc")
        write_warc(p, recs)
        walk = _walk_plain(p, KEEP)
        assert len(walk) == len(recs)
        # offsets are exact record boundaries
        data = open(p, "rb").read()
        for s, e, _ in walk:
            assert data.startswith(b"WARC/1.0\r\n", s)
        assert walk[-1][1] == len(data)
        assert sum(k for _, _, k in walk) == 10

    def test_payload_quoting_warc_header(self, tmp_path):
        """An HTML body that CONTAINS the bytes '\\r\\n\\r\\nWARC/1.0'
        must not split the record — only Content-Length jumps are
        exact."""
        evil = b"<html>look: \r\n\r\nWARC/1.0\r\nWARC-Type: response" \
               b"\r\nContent-Length: 0\r\n\r\n end</html>"
        recs = [
            format_warc_record("https://e.org/1", evil),
            format_warc_record("https://e.org/2", b"<html>two</html>"),
        ]
        p = str(tmp_path / "evil.warc")
        write_warc(p, recs)
        assert len(_walk_plain(p, KEEP)) == 2
        parsed = _parse_records(open(p, "rb").read(), KEEP)
        assert len(parsed) == 2
        assert evil in parsed[0][3]

    def test_corrupt_header_raises(self, tmp_path):
        p = str(tmp_path / "bad.warc")
        with open(p, "wb") as f:
            f.write(b"NOT A WARC FILE\r\n\r\n")
        with pytest.raises(ValueError, match="expected record header"):
            _walk_plain(p, KEEP)


class TestRead:
    def test_roundtrip_plain(self, ray_session, tmp_path):
        p = str(tmp_path / "a.warc")
        write_warc(p, make_records(12))
        t = table_of(read_warc_pages(p))
        assert t.num_rows == 12  # noise records filtered
        assert t.column("_row").to_pylist() == list(range(12))
        assert t.column("url").to_pylist() == [
            f"https://example.org/doc/{i}" for i in range(12)]
        assert t.column("status").to_pylist() == [200] * 12
        assert t.column("mime").to_pylist() == ["text/html"] * 12
        body0 = t.column("html").to_pylist()[0]
        assert body0.startswith(b"<html><body>doc 0")
        # schema matches the advertised pages shape
        for f in PAGES_SCHEMA:
            assert t.schema.field(f.name).type == f.type
        # warc_ts parsed
        assert t.column("warc_ts").null_count == 0

    def test_chunk_invariance(self, ray_session, tmp_path):
        p = str(tmp_path / "a.warc")
        write_warc(p, make_records(30))
        big = table_of(read_warc_pages(p))
        small = table_of(read_warc_pages(p, target_chunk_bytes=256))
        assert big.equals(small)

    def test_gz_members(self, ray_session, tmp_path):
        p = str(tmp_path / "a.warc.gz")
        write_warc(p, make_records(9))
        # file really is multi-member gzip
        raw = open(p, "rb").read()
        assert raw.count(b"\x1f\x8b\x08") >= 9
        t = table_of(read_warc_pages(p))
        assert t.num_rows == 9
        assert t.column("_row").to_pylist() == list(range(9))

    def test_multi_file_global_rows(self, ray_session, tmp_path):
        p1 = str(tmp_path / "a.warc")
        p2 = str(tmp_path / "b.warc.gz")
        write_warc(p1, make_records(7, start=0))
        write_warc(p2, make_records(5, start=7))
        t = table_of(read_warc_pages([p1, p2]))
        assert t.num_rows == 12
        assert t.column("_row").to_pylist() == list(range(12))
        assert t.column("url").to_pylist() == [
            f"https://example.org/doc/{i}" for i in range(12)]

    def test_record_type_selection(self, ray_session, tmp_path):
        p = str(tmp_path / "a.warc")
        write_warc(p, make_records(10))
        t = table_of(read_warc_pages(p, record_types=("metadata",)))
        assert t.num_rows == 2  # i = 0, 5
        assert t.column("mime").to_pylist() == ["application/json"] * 2
        assert t.column("status").to_pylist() == [None, None]
        assert t.column("html").to_pylist() == [b'{"k": 1}'] * 2


class TestSink:
    def test_shard_export_roundtrip(self, ray_session, tmp_path):
        import ray.data

        src = str(tmp_path / "src.warc")
        write_warc(src, make_records(20, with_noise=False))
        pages = read_warc_pages(src)
        out = str(tmp_path / "shards")
        manifest = table_of_manifest(write_warc_shards(pages, out))
        assert manifest["records"].to_pylist() and \
            sum(manifest["records"].to_pylist()) == 20
        files = sorted(
            os.path.join(out, f) for f in os.listdir(out)
            if f.endswith(".warc.gz"))
        assert files == manifest["path"].to_pylist() or \
            sorted(manifest["path"].to_pylist()) == files
        back = table_of(read_warc_pages(files))
        assert back.num_rows == 20
        assert sorted(back["url"].to_pylist()) == sorted(
            f"https://example.org/doc/{i}" for i in range(20))
        # payloads survive byte-exactly
        orig = table_of(read_warc_pages(src))
        assert sorted(orig["html"].to_pylist()) == \
            sorted(back["html"].to_pylist())


def table_of_manifest(ds) -> pa.Table:
    return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)


class TestConvertWarc:
    """Raw crawl -> KG: convert_warc must emit the SAME triple set as
    convert_pages over an equivalent pages parquet (same html payloads
    through the same extract + emit chain)."""

    RULES = {
        "base": "https://x.org/",
        "aboutUrl": "{url}",
        "columns": [
            {"name": "text", "datatype": "string"},
            {"name": "url", "datatype": "string"},
        ],
    }

    @staticmethod
    def triple_set(store):
        from cow_ray.stages.materialize import read_triple_store

        out = set()
        for b in read_triple_store(store).iter_batches(
                batch_format="pyarrow"):
            out |= set(zip(b["subj"].to_pylist(),
                           b["pred"].to_pylist(),
                           b["obj_lex"].to_pylist(),
                           b["obj_kind"].to_pylist()))
        return out

    def test_parity_with_pages_path(self, ray_session, tmp_path):
        import pyarrow.parquet as pq_

        from cow_ray.fixtures import pages_table
        from cow_ray.pipelines import convert_pages
        from cow_ray.sources.warc import convert_warc, write_warc

        tbl = pages_table(24)
        # WARC shard: one response record per page, html as payload
        recs = []
        for r in tbl.to_pylist():
            recs.append(format_warc_record(
                r["url"], r["html"],
                date="2026-02-02T00:00:00Z"))
        warc = str(tmp_path / "crawl.warc.gz")
        write_warc(warc, recs)
        # equivalent parquet: url + html only (text must come from the
        # SAME extraction stage on both paths)
        src = str(tmp_path / "pages.parquet")
        pq_.write_table(tbl.select(["url", "html"]), src)

        s1 = str(tmp_path / "s1")
        s2 = str(tmp_path / "s2")
        convert_warc(warc, self.RULES, s1)
        convert_pages(src, self.RULES, s2)
        t1, t2 = self.triple_set(s1), self.triple_set(s2)
        assert t1 == t2 and len(t1) > 24

    def test_staging_cache(self, ray_session, tmp_path):
        import os

        from cow_ray.fixtures import pages_table
        from cow_ray.sources.warc import stage_warc_to_parquet, write_warc

        tbl = pages_table(6)
        recs = [format_warc_record(r["url"], r["html"])
                for r in tbl.to_pylist()]
        warc = str(tmp_path / "c.warc.gz")
        write_warc(warc, recs)
        staging = str(tmp_path / "staging")
        files1 = stage_warc_to_parquet(warc, staging)
        mtimes = {f: os.path.getmtime(f) for f in files1}
        files2 = stage_warc_to_parquet(warc, staging)
        assert files1 == files2
        assert mtimes == {f: os.path.getmtime(f) for f in files2}
        # touched input invalidates
        os.utime(warc)
        files3 = stage_warc_to_parquet(warc, staging)
        assert sum(1 for _ in files3) >= 1

    def test_cli_warc_convert(self, tmp_path):
        import json as _json
        import subprocess
        import sys

        from cow_ray.fixtures import pages_table

        REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        tbl = pages_table(8)
        recs = [format_warc_record(r["url"], r["html"])
                for r in tbl.to_pylist()]
        warc = str(tmp_path / "c.warc.gz")
        write_warc(warc, recs)
        rules_p = tmp_path / "rules.json"
        rules_p.write_text(_json.dumps(self.RULES))
        store = tmp_path / "store"
        env = dict(os.environ, PYTHONPATH=REPO)
        r = subprocess.run(
            [sys.executable, "-m", "cow_ray", "convert", warc,
             "--rules", str(rules_p), "--out", str(store),
             "--parallelism", "4"],
            capture_output=True, text=True, env=env, cwd=REPO)
        assert r.returncode == 0, r.stderr
        assert "wrote" in r.stdout and "triples" in r.stdout
        assert (store / "_SUCCESS").exists()


class TestStagingSafety:
    def test_refuses_foreign_nonempty_dir(self, ray_session, tmp_path):
        from cow_ray.fixtures import pages_table
        from cow_ray.sources.warc import stage_warc_to_parquet, write_warc

        tbl = pages_table(3)
        warc = str(tmp_path / "c.warc.gz")
        write_warc(warc, [format_warc_record(r["url"], r["html"])
                          for r in tbl.to_pylist()])
        foreign = tmp_path / "precious"
        foreign.mkdir()
        (foreign / "data.txt").write_text("do not delete")
        with pytest.raises(ValueError, match="refusing to delete"):
            stage_warc_to_parquet(warc, str(foreign))
        assert (foreign / "data.txt").exists()

    def test_stale_marker_restages(self, ray_session, tmp_path):
        from cow_ray.fixtures import pages_table
        from cow_ray.sources.warc import stage_warc_to_parquet, write_warc

        tbl = pages_table(3)
        warc = str(tmp_path / "c.warc.gz")
        write_warc(warc, [format_warc_record(r["url"], r["html"])
                          for r in tbl.to_pylist()])
        staging = str(tmp_path / "st")
        files = stage_warc_to_parquet(warc, staging)
        for f in files:  # simulate cleanup eating the files
            os.remove(f)
        files2 = stage_warc_to_parquet(warc, staging)
        assert files2 and all(os.path.exists(f) for f in files2)
