"""merge_sameas: closure over the alias graph, canonical rewrite,
literal protection, guards."""

import pyarrow as pa
import pytest


def tri_rows(rows):
    out = []
    for s, p, o, k in rows:
        out.append({"subj": s, "pred": p, "obj_lex": o, "obj_kind": k,
                    "obj_datatype": None, "obj_lang": None})
    return out


def run(rows, **kw):
    import ray.data

    from cow_ray.ops.sameas import merge_sameas

    ds = ray.data.from_items(tri_rows(rows)).repartition(2)
    out = merge_sameas(ds, **kw)
    return sorted((r["subj"], r["pred"], r["obj_lex"])
                  for r in out.take_all())


class TestSameAs:
    SA = "http://www.w3.org/2002/07/owl#sameAs"

    def test_chain_merges_to_lex_min(self, ray_session):
        rows = [
            ("e:b", self.SA, "e:c", "iri"),
            ("e:a", self.SA, "e:b", "iri"),
            ("e:c", "p", "v", "literal"),
            ("x", "q", "e:b", "iri"),
        ]
        got = run(rows)
        # clique {a,b,c} -> canonical e:a (lexicographic min)
        assert got == [("e:a", "p", "v"), ("x", "q", "e:a")]

    def test_literal_objects_never_rewrite(self, ray_session):
        rows = [
            ("e:a", self.SA, "e:b", "iri"),
            ("d", "p", "e:b", "literal"),  # a literal that LOOKS like
        ]
        got = run(rows)
        assert got == [("d", "p", "e:b")]

    def test_no_edges_identity(self, ray_session):
        rows = [("s", "p", "o", "iri")]
        assert run(rows) == [("s", "p", "o")]

    def test_entity_guard(self, ray_session):
        rows = [(f"e:{i}", self.SA, f"e:{i + 1}", "iri")
                for i in range(10)]
        with pytest.raises(ValueError, match="max_entities"):
            run(rows, max_entities=3)

    def test_extra_columns_pass_through(self, ray_session):
        import ray.data

        from cow_ray.ops.sameas import merge_sameas

        rows = tri_rows([("e:a", self.SA, "e:b", "iri"),
                         ("e:b", "p", "v", "literal")])
        for i, r in enumerate(rows):
            r["extra"] = i * 10
        out = merge_sameas(ray.data.from_items(rows)).take_all()
        assert len(out) == 1
        assert out[0]["subj"] == "e:a" and out[0]["extra"] == 10


class TestSameAsReviewFixes:
    SA = TestSameAs.SA

    def test_self_loop_only_edges(self, ray_session):
        """Reflexive sameAs statements (common in real dumps) must
        not crash — they drop, everything else is identity."""
        rows = [("e:a", self.SA, "e:a", "iri"),
                ("e:a", "p", "v", "literal")]
        assert run(rows) == [("e:a", "p", "v")]

    def test_null_lexicals_survive(self, ray_session):
        import ray.data

        from cow_ray.ops.sameas import merge_sameas

        rows = tri_rows([("e:a", self.SA, "e:b", "iri"),
                         ("e:b", "p", "x", "literal")])
        rows.append({"subj": "d", "pred": "q", "obj_lex": None,
                     "obj_kind": "literal", "obj_datatype": None,
                     "obj_lang": None})
        out = sorted((r["subj"], r["pred"], r["obj_lex"])
                     for r in merge_sameas(
                         ray.data.from_items(rows)).take_all())
        assert out == [("d", "q", None), ("e:a", "p", "x")]
