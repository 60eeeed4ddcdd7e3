"""Stage tests: extraction round-trip, entity linking, canonicalization
shuffles, materialization + resume, flagship pipeline e2e."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cow_ray.fixtures import (
    GAZETTEER,
    build_html,
    make_pages_rows,
    write_pages_parquet,
)
from cow_ray.stages.extract import ExtractText, extract_text
from cow_ray.stages.linker import EntityLinker, LinkerModel


class TestExtract:
    def test_round_trip_byte_identical(self):
        """input_hint invariant: extract_text(html) == text per url."""
        for r in make_pages_rows(300, seed=5):
            assert extract_text(r["html"]) == r["text"]

    def test_entities_and_empty(self):
        assert extract_text(b"") == ""
        assert extract_text(None) == ""
        html = build_html("u", "a < b & c\n\nsecond ¶ para")
        assert extract_text(html) == "a < b & c\n\nsecond ¶ para"

    def test_nav_script_dropped(self):
        html = (b"<html><body><nav><p>menu</p></nav>"
                b"<article><p>keep</p><script>drop()</script></article>"
                b"</body></html>")
        assert extract_text(html) == "keep"

    def test_fast_path_equivalence_fuzz(self):
        """The regex fast path must agree with the parser (the semantic
        definition) on clean fixtures AND random byte-mutated html —
        it may bail to the parser, never diverge."""
        import random

        from cow_ray.stages.extract import extract_text_reference

        rows = make_pages_rows(300, seed=123)
        rng = random.Random(7)
        for trial in range(1000):
            r = rows[trial % len(rows)]
            h = bytearray(r["html"])
            for _ in range(rng.randrange(1, 5)):
                h[rng.randrange(len(h))] = rng.randrange(32, 127)
            b = bytes(h)
            assert extract_text(b) == extract_text_reference(b)

    def test_stage_drops_html(self):
        rows = make_pages_rows(10, seed=1)
        t = pa.Table.from_pylist(rows)
        out = ExtractText()(t)
        assert "html" not in out.column_names
        assert out["text"].to_pylist() == [r["text"] for r in rows]


class TestLinker:
    def test_leftmost_longest(self):
        m = LinkerModel({"e/a": ["Ada"], "e/al": ["Ada Lovelace"]})
        got = m.link_text("Ada Lovelace wrote notes.")
        assert got == [("Ada Lovelace", "e/al", 0, 12)]

    def test_word_boundaries(self):
        m = LinkerModel({"e/t": ["Turing"]})
        assert m.link_text("Turingmachine") == []
        assert m.link_text("by Turing.") == [("Turing", "e/t", 3, 9)]

    def test_ambiguous_deterministic(self):
        gaz = {"org/mercury": ["Mercury"], "planet/mercury": ["Mercury"]}
        m = LinkerModel(gaz)
        a = m.link_text("Mercury rose today.")
        b = m.link_text("Mercury rose today.")
        assert a == b and len(a) == 1
        assert a[0][1] in gaz

    def test_batch_stage_matches_pure_function(self):
        rows = make_pages_rows(100, seed=9)
        t = pa.Table.from_pylist(
            [{"url": r["url"], "text": r["text"]} for r in rows]
        ).append_column("_row", pa.array(range(100), type=pa.int64()))
        linker = EntityLinker(GAZETTEER, carry=["url"])
        out = linker(t)
        model = LinkerModel(GAZETTEER)
        want = []
        for i, r in enumerate(rows):
            for surface, ent, b, e in model.link_text(r["text"]):
                want.append((r["url"], i, surface, ent, b, e))
        got = list(
            zip(
                out["url"].to_pylist(),
                out["_row"].to_pylist(),
                out["surface"].to_pylist(),
                out["entity_id"].to_pylist(),
                out["begin"].to_pylist(),
                out["end"].to_pylist(),
            )
        )
        assert got == want
        assert len(got) > 50  # fixture really contains mentions

    def test_empty_batch_schema_stable(self):
        linker = EntityLinker(GAZETTEER, carry=["url"])
        t = pa.table({"url": pa.array([], type=pa.string()),
                      "text": pa.array([], type=pa.string()),
                      "_row": pa.array([], type=pa.int64())})
        out = linker(t)
        assert out.num_rows == 0
        assert out.schema.field("_row").type == pa.int64()


class TestCanonicalize:
    def test_dedup_triples(self, ray_session):
        import ray.data
        from cow_ray.stages.canonicalize import dedup_triples
        from cow_ray.triples import TRIPLE_SCHEMA

        rows = []
        for i in range(500):
            rows.append(
                {
                    "subj": f"s/{i % 50}",
                    "pred": "p",
                    "obj_lex": f"o/{i % 25}",
                    "obj_kind": "iri",
                    "obj_datatype": None,
                    "obj_lang": None,
                }
            )
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=TRIPLE_SCHEMA))
        out = dedup_triples(ds, num_parts=8).take_all()
        keys = {(r["subj"], r["obj_lex"]) for r in out}
        assert len(out) == len(keys) == 50  # i%50 determines i%25 on this data

    def test_dedup_distinguishes_null_vs_empty(self, ray_session):
        import ray.data
        from cow_ray.stages.canonicalize import dedup_triples
        from cow_ray.triples import TRIPLE_SCHEMA

        rows = [
            {"subj": "s", "pred": "p", "obj_lex": "o", "obj_kind": "literal",
             "obj_datatype": None, "obj_lang": None},
            {"subj": "s", "pred": "p", "obj_lex": "o", "obj_kind": "literal",
             "obj_datatype": "", "obj_lang": None},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=TRIPLE_SCHEMA))
        assert dedup_triples(ds, num_parts=2).count() == 2

    def test_grouped_count_with_salt(self, ray_session):
        import ray.data
        from cow_ray.stages.canonicalize import grouped_count

        rows = [{"k": "hot"}] * 900 + [{"k": f"cold{i}"} for i in range(100)]
        ds = ray.data.from_items(rows).repartition(10)
        out = {r["k"]: r["n"] for r in grouped_count(ds, ["k"], salt=4).take_all()}
        assert out["hot"] == 900
        assert out["cold7"] == 1
        assert len(out) == 101

    def test_canonicalize_surface_forms(self, ray_session):
        import ray.data
        from cow_ray.stages.canonicalize import canonicalize_surface_forms

        mentions = (
            [{"surface": "Ada  Lovelace", "entity_id": "person/ada"}] * 5
            + [{"surface": "ada lovelace", "entity_id": "person/ada"}] * 3
            + [{"surface": "Ada Lovelace", "entity_id": "person/other"}] * 2
        )
        ds = ray.data.from_items(mentions)
        out = canonicalize_surface_forms(ds, salt=2).take_all()
        assert len(out) == 1
        r = out[0]
        assert r["surface_key"] == "ada lovelace"
        assert r["entity_id"] == "person/ada"  # 8 > 2
        assert r["n_total"] == 10


class TestMaterialize:
    def _triples_ds(self, n=300):
        import ray.data
        from cow_ray.triples import TRIPLE_SCHEMA

        rows = [
            {"subj": f"https://x/s{i % 40}", "pred": f"https://x/p{i % 3}",
             "obj_lex": f"v{i}", "obj_kind": "literal",
             "obj_datatype": None, "obj_lang": None}
            for i in range(n)
        ]
        return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=TRIPLE_SCHEMA))

    def test_write_sorted_partitioned_with_manifests(self, ray_session, tmp_path):
        from cow_ray.nanopub import Nanopub
        from cow_ray.stages.materialize import materialize_triples

        out = str(tmp_path / "store")
        np_ = Nanopub("https://x/", "t", "ab" * 20)
        manifests = materialize_triples(
            self._triples_ds(), out, num_parts=4, job="j1", nanopub=np_
        )
        assert sum(m["num_triples"] for m in manifests) == 300
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        # partition files sorted by (subj, pred, obj_lex)
        for m in manifests:
            t = pq.read_table(m["path"])
            trip = list(zip(t["subj"].to_pylist(), t["pred"].to_pylist(),
                            t["obj_lex"].to_pylist()))
            assert trip == sorted(trip)
            mf = json.load(open(os.path.join(os.path.dirname(m["path"]),
                                             "manifest.json")))
            assert mf["num_triples"] == t.num_rows
        # provenance partition exists and has the nanopub skeleton
        prov = pq.read_table(os.path.join(out, "_provenance", "quads.parquet"))
        preds = set(prov["pred"].to_pylist())
        assert "http://www.nanopub.org/nschema#hasAssertion" in preds
        assert any(p.endswith("tripleCount") for p in preds)

    def test_resume_skips_done_parts(self, ray_session, tmp_path):
        from cow_ray.stages.materialize import (
            completed_parts,
            materialize_triples,
            read_triple_store,
        )

        out = str(tmp_path / "store")
        ds = self._triples_ds()
        materialize_triples(ds, out, num_parts=4, job="j1", resume=True)
        done1 = completed_parts(out)
        assert len(done1) >= 3
        # simulate partial failure: remove one partition
        import shutil

        victim = sorted(done1)[0]
        shutil.rmtree(os.path.join(out, f"part-{victim:05d}"))
        os.remove(os.path.join(out, "_SUCCESS"))
        before = completed_parts(out)
        assert victim not in before
        manifests = materialize_triples(ds, out, num_parts=4, job="j1", resume=True)
        assert completed_parts(out) == done1
        assert sum(m["num_triples"] for m in manifests) == 300
        # store readback equals the full triple set
        back = read_triple_store(out)
        assert back.count() == 300

    def test_resume_refuses_other_job(self, ray_session, tmp_path):
        from cow_ray.stages.materialize import materialize_triples

        out = str(tmp_path / "store")
        materialize_triples(self._triples_ds(50), out, num_parts=2, job="j1")
        with pytest.raises(ValueError, match="refusing"):
            materialize_triples(self._triples_ds(50), out, num_parts=2, job="OTHER")

    def test_resume_refuses_num_parts_change(self, ray_session, tmp_path):
        """Rerunning with a different modulus would duplicate triples
        (done partitions filtered against new part ids) — must raise."""
        from cow_ray.stages.materialize import materialize_triples

        out = str(tmp_path / "store")
        materialize_triples(self._triples_ds(100), out, num_parts=4, job="j1")
        with pytest.raises(ValueError, match="num_parts"):
            materialize_triples(self._triples_ds(100), out, num_parts=8,
                                job="j1")

    def test_shuffle_modes_equivalent(self, ray_session, tmp_path):
        """The object-store (actors) and filesystem (storage) shuffles
        must publish byte-identical partitions: same manifests, same
        content hashes, same read-back."""
        from cow_ray.stages.materialize import (
            materialize_triples,
            read_triple_store,
        )

        ds = self._triples_ds(400)
        outs = {}
        for mode in ("actors", "storage"):
            out = str(tmp_path / f"store_{mode}")
            m = materialize_triples(ds, out, num_parts=4, job="j1",
                                    dedup=True, shuffle=mode)
            outs[mode] = sorted(
                (x["part_id"], x["num_triples"], x["content_sha1"],
                 x["errors"], x["null_skips"])
                for x in m
            )
            assert read_triple_store(out).count() == sum(
                x["num_triples"] for x in m
            )
        assert outs["actors"] == outs["storage"]

    def test_per_partition_error_and_skip_counters(self, ray_session,
                                                   tmp_path):
        """Manifests must carry subject-attributed errors/null_skips,
        and the marker rows must never reach triples.parquet."""
        import pyarrow.parquet as pq_

        from cow_ray.oracle import process_table
        from cow_ray.pipelines import convert_pages
        from cow_ray.pipelines.convert import ConvertConfig
        from cow_ray.rules import parse_rules
        from cow_ray.stages.materialize import read_triple_store

        rows = [
            {"a": "ok", "b": "1"},
            {"a": "NA", "b": "2"},      # null-skip on column a
            {"a": "x{bad}", "b": "3"},  # format error in COMPLEX value
            {"a": "NA", "b": "x{y}"},   # skip + error in one row
        ]
        src = str(tmp_path / "in.parquet")
        pq_.write_table(pa.Table.from_pylist(rows), src)
        rules = {
            "base": "https://x.org/", "aboutUrl": "r/{_row}",
            "columns": [
                {"name": "a", "null": "NA", "datatype": "string"},
                {"name": "b", "value": "{{b|upper}}", "datatype": "string"},
            ],
        }
        out = str(tmp_path / "store")
        returned, manifests = convert_pages(
            src, rules, out, config=ConvertConfig(num_parts=4))
        # the RETURNED Dataset is marker-free (markers are a
        # store-internal protocol)
        ret_kinds = set(
            k for b in returned.iter_batches(batch_format="pyarrow")
            for k in b["obj_kind"].to_pylist()
        )
        assert "__marker__" not in ret_kinds
        doc = parse_rules(rules)
        _, want_errors, want_skips = process_table(
            [dict(r) for r in rows], doc, 0)
        assert sum(m["errors"] for m in manifests) == want_errors > 0
        assert sum(m["null_skips"] for m in manifests) == want_skips == 2
        back = read_triple_store(out)
        kinds = set(
            k for b in back.iter_batches(batch_format="pyarrow")
            for k in b["obj_kind"].to_pylist()
        )
        assert "__marker__" not in kinds
        # triples equal the oracle set exactly (markers fully stripped)
        want_triples, _, _ = process_table([dict(r) for r in rows], doc, 0)
        assert back.count() == len(set(want_triples))

    def test_stale_tmp_dir_not_double_counted(self, ray_session, tmp_path):
        """A part-NNNNN.tmp-<pid> left by a crash between populate and
        os.replace must be cleaned on rerun and never read back."""
        import shutil

        from cow_ray.stages.materialize import (
            materialize_triples,
            read_triple_store,
        )

        out = str(tmp_path / "store")
        ds = self._triples_ds(100)
        materialize_triples(ds, out, num_parts=4, job="j1")
        # simulate the crash window: a fully-populated tmp clone
        src = os.path.join(out, "part-00001")
        stale = os.path.join(out, "part-00001.tmp-9999")
        shutil.copytree(src, stale)
        assert read_triple_store(out).count() == 100  # glob ignores tmp
        materialize_triples(ds, out, num_parts=4, job="j1")
        assert not os.path.exists(stale)  # rerun cleans it
        assert read_triple_store(out).count() == 100


class TestConvertPipeline:
    def test_flagship_e2e(self, ray_session, tmp_path):
        """pages parquet → extract → link → triples → dedup → store;
        compared against the pure oracle composition."""
        from cow_ray.oracle import process_table
        from cow_ray.pipelines import ConvertConfig, convert_pages
        from cow_ray.pipelines.convert import derive_host
        from cow_ray.rules import parse_rules
        from cow_ray.stages.linker import LinkerModel
        from cow_ray.stages.materialize import read_triple_store

        path = str(tmp_path / "pages.parquet")
        write_pages_parquet(path, 400, seed=21, row_group_size=128)

        page_rules = {
            "base": "https://kg.example.org/",
            "aboutUrl": "page/{_row}",
            "columns": [
                {"name": "url", "datatype": "anyURI", "propertyUrl": "schema:url"},
                {"name": "text", "datatype": "string", "lang": "{lang}",
                 "propertyUrl": "schema:text"},
                {"name": "host", "valueUrl": "host/{host}",
                 "propertyUrl": "schema:isPartOf"},
            ],
        }
        mention_rules = {
            "base": "https://kg.example.org/",
            "aboutUrl": "page/{_row}",
            "columns": [
                {"name": "entity_id", "valueUrl": "entity/{entity_id}",
                 "propertyUrl": "schema:mentions"},
                {"name": "surface", "aboutUrl": "entity/{entity_id}",
                 "propertyUrl": "rdfs:label"},
            ],
        }
        out_dir = str(tmp_path / "store")
        triples, manifests = convert_pages(
            path,
            page_rules,
            out_dir,
            gazetteer=GAZETTEER,
            mention_rules=mention_rules,
            config=ConvertConfig(
                num_parts=4,
                derived={"host": derive_host},
                link_concurrency=2,
            ),
        )
        got = {
            tuple(r[k] for k in ("subj", "pred", "obj_lex", "obj_kind",
                                 "obj_datatype", "obj_lang"))
            for r in read_triple_store(out_dir).take_all()
        }

        # oracle composition over the same rows
        rows = make_pages_rows(400, seed=21)
        model = LinkerModel(GAZETTEER)
        prows, mrows = [], []
        for i, r in enumerate(rows):
            host = r["url"].split("/")[2]
            prows.append({"url": r["url"], "text": r["text"], "lang": r["lang"],
                          "host": host})
            for surface, ent, b, e in model.link_text(r["text"]):
                mrows.append({"_i": i, "surface": surface, "entity_id": ent})
        want, _, _ = process_table(prows, parse_rules(page_rules))
        mdoc = parse_rules(mention_rules)
        from cow_ray.oracle import process_row

        wset = set(want)
        for m in mrows:
            rr = process_row({"surface": m["surface"],
                              "entity_id": m["entity_id"]}, m["_i"], mdoc)
            wset |= set(rr.triples)
        assert got == wset
        assert sum(x["num_triples"] for x in manifests) == len(wset)


class TestAppendTriples:
    def _tri(self, lo, hi):
        import ray.data

        from cow_ray.triples import TRIPLE_SCHEMA

        rows = [
            {"subj": f"https://x/s{i % 40}", "pred": f"https://x/p{i % 3}",
             "obj_lex": f"v{i}", "obj_kind": "literal",
             "obj_datatype": None, "obj_lang": None}
            for i in range(lo, hi)
        ]
        return ray.data.from_arrow(
            pa.Table.from_pylist(rows, schema=TRIPLE_SCHEMA))

    def test_append_equals_one_shot_rebuild(self, ray_session, tmp_path):
        """materialize(A) + append(B) must publish byte-identical
        partitions to materialize(A ∪ B, dedup) — same modulus, same
        distinct-union, same sort."""
        from cow_ray.stages.materialize import (append_triples,
                                                materialize_triples,
                                                read_triple_store)

        inc = str(tmp_path / "inc")
        materialize_triples(self._tri(0, 200), inc, num_parts=4,
                            job="j1", dedup=True)
        # overlap rows 150..200 — dedup makes the merge idempotent
        manifests = append_triples(self._tri(150, 300), inc)
        assert sum(m["num_triples"] for m in manifests) == 300

        full = str(tmp_path / "full")
        want = materialize_triples(self._tri(0, 300), full, num_parts=4,
                                   job="j1", dedup=True)
        got_sha = {m["part_id"]: m["content_sha1"] for m in manifests}
        want_sha = {m["part_id"]: m["content_sha1"] for m in want}
        assert got_sha == want_sha
        assert read_triple_store(inc).count() == 300
        assert os.path.exists(os.path.join(inc, "_SUCCESS"))
        import json as _json

        with open(os.path.join(inc, "_job.json")) as f:
            assert _json.load(f)["generation"] == 2

    def test_append_idempotent_and_delta_only(self, ray_session,
                                              tmp_path):
        from cow_ray.stages.materialize import (append_triples,
                                                materialize_triples)

        out = str(tmp_path / "store")
        materialize_triples(self._tri(0, 200), out, num_parts=4,
                            job="j1", dedup=True)
        m1 = append_triples(self._tri(0, 200), out)  # pure re-append
        assert sum(m["num_triples"] for m in m1) == 200
        # a delta hitting one subject only rewrites its partition
        import json as _json

        shas_before = {}
        for p in range(4):
            with open(os.path.join(out, f"part-{p:05d}",
                                   "manifest.json")) as f:
                shas_before[p] = _json.load(f)["content_sha1"]
        one = self._tri(400, 401)  # subj s0 only
        m2 = append_triples(one, out)
        changed = [p for p in range(4)]
        shas_after = {}
        for p in range(4):
            with open(os.path.join(out, f"part-{p:05d}",
                                   "manifest.json")) as f:
                shas_after[p] = _json.load(f)["content_sha1"]
        diff = [p for p in changed if shas_before[p] != shas_after[p]]
        assert len(diff) == 1  # only the delta's partition rewrote
        assert sum(m["num_triples"] for m in m2) == 201

    def test_append_refuses_incomplete_store(self, ray_session,
                                             tmp_path):
        from cow_ray.stages.materialize import (append_triples,
                                                materialize_triples)

        out = str(tmp_path / "store")
        materialize_triples(self._tri(0, 100), out, num_parts=2,
                            job="j1")
        os.remove(os.path.join(out, "_SUCCESS"))
        with pytest.raises(ValueError, match="_SUCCESS"):
            append_triples(self._tri(100, 120), out)
        # job mismatch also refuses
        with open(os.path.join(out, "_SUCCESS"), "w") as f:
            f.write("j1")
        with pytest.raises(ValueError, match="refusing"):
            append_triples(self._tri(100, 120), out, job="OTHER")

    def test_append_crash_recovery_and_provenance(self, ray_session,
                                                  tmp_path):
        """Interrupted-swap recovery: a part-N.old-* backup with its
        final missing must be restored by the next append (no data
        loss, _append.json admits the re-run); the _provenance lineage
        must track the rewritten partition's new sha."""
        import json as _json

        import pyarrow.parquet as _pq

        from cow_ray.nanopub import Nanopub
        from cow_ray.stages.materialize import (append_triples,
                                                materialize_triples,
                                                read_triple_store)

        out = str(tmp_path / "store")
        np_ = Nanopub("https://x/", "ds", "j1")
        materialize_triples(self._tri(0, 200), out, num_parts=4,
                            job="j1", dedup=True, nanopub=np_)
        prov = os.path.join(out, "_provenance", "quads.parquet")
        before = _pq.read_table(prov)

        # simulate a crash mid-swap: final renamed aside, not replaced
        victim = os.path.join(out, "part-00001")
        os.replace(victim, victim + ".old-999")
        os.remove(os.path.join(out, "_SUCCESS"))
        with open(os.path.join(out, "_append.json"), "w") as f:
            _json.dump({"job": "j1", "generation_target": 2}, f)

        manifests = append_triples(self._tri(150, 300), out,
                                   input_desc="delta.parquet")
        assert sum(m["num_triples"] for m in manifests) == 300
        assert read_triple_store(out).count() == 300
        assert not os.path.exists(victim + ".old-999")
        assert not os.path.exists(os.path.join(out, "_append.json"))

        after = _pq.read_table(prov)
        shas = {m["part_id"]: m["content_sha1"] for m in manifests}
        subj = after["subj"].to_pylist()
        pred = after["pred"].to_pylist()
        obj = after["obj_lex"].to_pylist()
        seen = {}
        for s, p, o in zip(subj, pred, obj):
            if p.endswith("contentSha1"):
                seen[int(s.rsplit("/", 1)[1])] = o
        assert seen == shas  # lineage tracks every partition's real sha
        assert any(p.endswith("inputSlice") and "delta.parquet" in o
                   for p, o in zip(pred, obj))
        assert after.num_rows == before.num_rows  # replaced, not grown

    def test_append_resume_requires_dedup(self, ray_session, tmp_path):
        """A crash-resume without the distinct-union merge would
        silently duplicate rows into partitions that published before
        the crash — refused on either side's dedup=False."""
        import json as _json

        from cow_ray.stages.materialize import (append_triples,
                                                materialize_triples)

        out = str(tmp_path / "store")
        materialize_triples(self._tri(0, 100), out, num_parts=2,
                            job="j1", dedup=True)
        os.remove(os.path.join(out, "_SUCCESS"))
        with open(os.path.join(out, "_append.json"), "w") as f:
            _json.dump({"job": "j1", "dedup": False,
                        "generation_target": 2}, f)
        with pytest.raises(ValueError, match="dedup"):
            append_triples(self._tri(100, 120), out)  # marker says False
        with open(os.path.join(out, "_append.json"), "w") as f:
            _json.dump({"job": "j1", "dedup": True,
                        "generation_target": 2}, f)
        with pytest.raises(ValueError, match="dedup"):
            append_triples(self._tri(100, 120), out, dedup=False)

    def test_append_resume_skips_published_generation(self, ray_session,
                                                      tmp_path):
        """Partitions whose manifest already carries the target append
        generation are NOT re-merged on resume: bytes untouched,
        counts not re-accumulated, lineage inputSlice single."""
        import json as _json

        import pyarrow.parquet as _pq

        from cow_ray.nanopub import Nanopub
        from cow_ray.stages.materialize import (append_triples,
                                                materialize_triples)

        out = str(tmp_path / "store")
        materialize_triples(self._tri(0, 200), out, num_parts=4,
                            job="j1", dedup=True,
                            nanopub=Nanopub("https://x/", "ds", "j1"))
        m1 = append_triples(self._tri(150, 300), out,
                            input_desc="delta.parquet")
        sha1 = {m["part_id"]: m["content_sha1"] for m in m1}
        mtimes = {p: os.path.getmtime(
            os.path.join(out, f"part-{p:05d}", "triples.parquet"))
            for p in range(4)}

        # craft the crashed-after-publish state: marker back, _SUCCESS
        # gone, _job.json generation rolled back to pre-append
        os.remove(os.path.join(out, "_SUCCESS"))
        with open(os.path.join(out, "_append.json"), "w") as f:
            _json.dump({"job": "j1", "dedup": True,
                        "generation_target": 2}, f)
        jf = os.path.join(out, "_job.json")
        with open(jf) as f:
            meta = _json.load(f)
        meta["generation"] = 1
        with open(jf, "w") as f:
            _json.dump(meta, f)

        m2 = append_triples(self._tri(150, 300), out,
                            input_desc="delta.parquet")
        assert {m["part_id"]: m["content_sha1"] for m in m2} == sha1
        for p in range(4):
            # already-published partitions skipped the re-merge
            got = os.path.getmtime(
                os.path.join(out, f"part-{p:05d}", "triples.parquet"))
            assert got == mtimes[p]
            with open(os.path.join(out, f"part-{p:05d}",
                                   "manifest.json")) as f:
                assert _json.load(f).get("generation") == 2
        prov = _pq.read_table(
            os.path.join(out, "_provenance", "quads.parquet"))
        for p_, o in zip(prov["pred"].to_pylist(),
                         prov["obj_lex"].to_pylist()):
            if p_.endswith("inputSlice"):
                # generation-tagged component, exactly once
                assert o.split(";").count("delta.parquet@g2") <= 1
                assert "delta.parquet@g3" not in o

    def test_append_resume_late_crash_window(self, ray_session,
                                             tmp_path):
        """Crash BETWEEN the _job.json generation bump and the marker
        removal: resume must reuse the marker's generation_target (2),
        not recompute 3 from the bumped _job.json — otherwise every
        partition re-merges and error counters double-count (review
        finding)."""
        import json as _json

        import pyarrow.parquet as _pq

        from cow_ray.nanopub import Nanopub
        from cow_ray.stages.materialize import (append_triples,
                                                materialize_triples)

        out = str(tmp_path / "store")
        materialize_triples(self._tri(0, 200), out, num_parts=4,
                            job="j1", dedup=True,
                            nanopub=Nanopub("https://x/", "ds", "j1"))
        m1 = append_triples(self._tri(150, 300), out,
                            input_desc="delta.parquet")
        sha1 = {m["part_id"]: m["content_sha1"] for m in m1}

        # craft the LATE crash: _job.json already says generation 2,
        # marker still present, _SUCCESS gone
        os.remove(os.path.join(out, "_SUCCESS"))
        with open(os.path.join(out, "_append.json"), "w") as f:
            _json.dump({"job": "j1", "dedup": True,
                        "generation_target": 2}, f)

        m2 = append_triples(self._tri(150, 300), out,
                            input_desc="delta.parquet")
        assert {m["part_id"]: m["content_sha1"] for m in m2} == sha1
        jf = os.path.join(out, "_job.json")
        with open(jf) as f:
            assert _json.load(f)["generation"] == 2  # no drift to 3
        for p in range(4):
            with open(os.path.join(out, f"part-{p:05d}",
                                   "manifest.json")) as f:
                assert _json.load(f).get("generation") == 2
        prov = _pq.read_table(
            os.path.join(out, "_provenance", "quads.parquet"))
        for p_, o in zip(prov["pred"].to_pylist(),
                         prov["obj_lex"].to_pylist()):
            if p_.endswith("inputSlice"):
                assert o.split(";").count("delta.parquet@g2") <= 1

    def test_repeat_append_same_input_records_both(self, ray_session,
                                                   tmp_path):
        """Two INTENTIONAL appends of the same input_desc (e.g. a
        regenerated daily delta) must both appear in lineage — the
        crash-resume idempotence is keyed by generation, not by the
        bare input string (review finding)."""
        import json as _json

        import pyarrow.parquet as _pq

        from cow_ray.nanopub import Nanopub
        from cow_ray.stages.materialize import (append_triples,
                                                materialize_triples)

        out = str(tmp_path / "store")
        materialize_triples(self._tri(0, 200), out, num_parts=4,
                            job="j1", dedup=True,
                            nanopub=Nanopub("https://x/", "ds", "j1"))
        append_triples(self._tri(150, 300), out,
                       input_desc="delta.parquet")
        append_triples(self._tri(250, 400), out,
                       input_desc="delta.parquet")
        jf = os.path.join(out, "_job.json")
        with open(jf) as f:
            assert _json.load(f)["generation"] == 3
        prov = _pq.read_table(
            os.path.join(out, "_provenance", "quads.parquet"))
        slices = [o for p_, o in zip(prov["pred"].to_pylist(),
                                     prov["obj_lex"].to_pylist())
                  if p_.endswith("inputSlice")]
        # at least one partition touched by both appends carries both
        # generation-tagged components
        assert any("delta.parquet@g2" in s.split(";")
                   and "delta.parquet@g3" in s.split(";")
                   for s in slices), slices
