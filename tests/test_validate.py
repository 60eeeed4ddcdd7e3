"""validate_triples: SHACL-core subset vs hand-computed violations."""

import pytest


def tri(s, p, o):
    return {"subj": s, "pred": p, "obj_lex": o}


ROWS = [
    tri("d1", "text", "hello"),
    tri("d1", "lang", "en"),
    tri("d1", "n", "12"),
    tri("d2", "text", "welt"),          # no lang -> minCount violation
    tri("d2", "n", "456"),              # 3 digits -> pattern violation
    tri("d3", "n", "7"),                # no text: out of minCount scope
    tri("d4", "text", "x"),
    tri("d4", "lang", "fr"),
    tri("d4", "lang", "de"),            # 2 langs -> maxCount violation
    tri("d4", "n", "9"),
]

CONSTRAINTS = [
    {"id": "lang_req", "kind": "minCount", "focus_pred": "text",
     "pred": "lang", "min": 1},
    {"id": "n_2digit", "kind": "pattern", "pred": "n",
     "regex": "^[0-9]{1,2}$"},
    {"id": "lang_max1", "kind": "maxCount", "pred": "lang", "max": 1},
]


def run(rows, constraints, **kw):
    import ray.data

    from cow_ray.ops.validate import validate_triples

    ds = ray.data.from_items(rows).repartition(3)
    out = validate_triples(ds, constraints, num_partitions=4, **kw)
    return sorted((r["subj"], r["constraint"], r["detail"])
                  for r in out.take_all())


class TestValidate:
    def test_all_constraint_kinds(self, ray_session):
        got = run(ROWS, CONSTRAINTS)
        assert got == [
            ("d2", "lang_req", "0"),
            ("d2", "n_2digit", "456"),
            ("d4", "lang_max1", "2"),
        ]

    def test_conformant_graph_is_empty(self, ray_session):
        rows = [tri("d1", "text", "a"), tri("d1", "lang", "en"),
                tri("d1", "n", "42")]
        assert run(rows, CONSTRAINTS) == []

    def test_min_count_gt_one(self, ray_session):
        rows = [tri("d1", "text", "a"), tri("d1", "lang", "en"),
                tri("d2", "text", "b"), tri("d2", "lang", "en"),
                tri("d2", "lang", "fr")]
        got = run(rows, [{"id": "two_langs", "kind": "minCount",
                          "focus_pred": "text", "pred": "lang",
                          "min": 2}])
        assert got == [("d1", "two_langs", "1")]

    def test_unknown_kind_raises(self, ray_session):
        import ray.data

        with pytest.raises(ValueError, match="unknown constraint"):
            run(ROWS, [{"id": "x", "kind": "closed"}])


class TestValidateReviewFixes:
    def test_min_count_requires_focus(self, ray_session):
        with pytest.raises(ValueError, match="focus_pred"):
            run(ROWS, [{"id": "x", "kind": "minCount", "pred": "lang",
                        "min": 1}])

    def test_null_lexical_not_a_pattern_violation(self, ray_session):
        rows = [tri("d1", "n", None), tri("d2", "n", "999")]
        got = run(rows, [{"id": "n2", "kind": "pattern", "pred": "n",
                          "regex": "^[0-9]{1,2}$"}])
        assert got == [("d2", "n2", "999")]
