"""Distributed per-graph content fingerprints (kg/fingerprint.py::graph_content_hashes)."""

# ---------------------------------------------------------------------------
# graph_content_hashes (distributed per-graph fingerprints)
# ---------------------------------------------------------------------------

QUAD_SCHEMA = ("context string, subj string, pred string, obj_value string, "
               "obj_kind string, obj_lang string")


def _quads(spark, rows):
    return spark.createDataFrame(rows, QUAD_SCHEMA)


def _hashes(spark, rows):
    from meresco_rdf_spark.kg.fingerprint import graph_content_hashes
    return {r.graph: (r.n_triples, r.content_hash)
            for r in graph_content_hashes(_quads(spark, rows)).collect()}


BASE = [
    ("g1", "urn:a", "urn:p", "x", "literal", None),
    ("g1", "urn:b", "urn:p", "y", "literal", "en"),
    ("g2", "urn:b", "urn:p", "y", "literal", "en"),
]


def test_order_independent(spark):
    assert _hashes(spark, BASE) == _hashes(spark, list(reversed(BASE)))


def test_duplicates_collapse_before_xor(spark):
    assert _hashes(spark, BASE + [BASE[0]]) == _hashes(spark, BASE)


def test_graphs_hash_independently(spark):
    h = _hashes(spark, BASE)
    assert h["g1"][0] == 2 and h["g2"][0] == 1
    assert h["g1"][1] != h["g2"][1]
    # same single triple in another graph -> same content hash
    only = [r for r in BASE if r[0] == "g2"][0]
    h2 = _hashes(spark, BASE + [("g3",) + only[1:]])
    assert h2["g3"] == h2["g2"]


def test_lang_and_kind_distinguish(spark):
    a = _hashes(spark, [("g", "s", "p", "v", "literal", None)])["g"]
    b = _hashes(spark, [("g", "s", "p", "v", "literal", "en")])["g"]
    c = _hashes(spark, [("g", "s", "p", "v", "uri", None)])["g"]
    assert len({a[1], b[1], c[1]}) == 3


def test_default_graph_under_empty_name(spark):
    h = _hashes(spark, [(None, "s", "p", "v", "uri", None)])
    assert set(h) == {""} and h[""][0] == 1
