"""Distributed Graph operators vs the local reference-exact Graph.

Every operator is checked two ways: against hand-computed expectations
ported from reference graphtest.py, and (for find_labels / match_patterns)
against the local Graph on the same triples — the local Graph is the
semantics anchor."""

import pytest

from meresco_rdf_spark.graph import Graph
from meresco_rdf_spark.model import BNode, Literal, Uri
from meresco_rdf_spark.namespaces import curie_to_uri
from meresco_rdf_spark.operators import (
    add_triples,
    contains,
    find_labels,
    in_degrees,
    literal_values,
    match_patterns,
    objects,
    remove_triples,
    scan,
    triples_df,
)

pytestmark = pytest.mark.spark


BASE_TRIPLES = [
    ("x", "y", Literal("z")),
    ("x", "y", Literal("3")),
    ("x", "2", Literal("z")),
    ("x", "2", Literal("3")),
    ("1", "y", Literal("z")),
    ("1", "y", Literal("3")),
    ("1", "2", Literal("z")),
    ("1", "2", Literal("3")),
    ("a", "b", Literal("c")),
]


@pytest.fixture(scope="module")
def base_df(spark):
    return triples_df(spark, BASE_TRIPLES).cache()


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_scan_all_eight_masks(base_df):
    assert scan(base_df, "x", "y", "z").count() == 1
    assert scan(base_df, "x", "y").count() == 2
    assert scan(base_df, "x", obj_value="z").count() == 2
    assert scan(base_df, "x").count() == 4
    assert scan(base_df, predicate="y", obj_value="z").count() == 2
    assert scan(base_df, predicate="y").count() == 4
    assert scan(base_df, obj_value="z").count() == 4
    assert scan(base_df).count() == 9


def test_scan_lang_no_guessing(spark):
    df = triples_df(spark, [("s", "p", Literal("obj", lang="en"))])
    assert scan(df, obj_value="obj", obj_lang="en").count() == 1
    assert scan(df, obj_value="obj", obj_lang=None).count() == 0  # require lang-less
    assert scan(df, obj_value="obj").count() == 1  # lang "don't care"


def test_add_triples_set_semantics(spark, base_df):
    extra = triples_df(spark, [("x", "y", Literal("z")), ("new", "p", Uri("u:o"))])
    merged = add_triples(base_df, extra)
    assert merged.count() == 10  # duplicate collapses


def test_remove_triples(spark, base_df):
    doomed = triples_df(spark, [("x", "y", Literal("z")), ("no", "such", Literal("t"))])
    remaining = remove_triples(base_df, doomed)
    assert remaining.count() == 8
    assert scan(remaining, "x", "y").count() == 1


def test_diff_triples_tags_changes_both_ways(spark):
    from meresco_rdf_spark.operators.graph_ops import diff_triples

    before = triples_df(spark, [
        ("a", "p", Literal("v")),
        ("b", "p", Literal("w", lang="en")),
        ("c", "p", Uri("u:kept")),
    ])
    after = triples_df(spark, [
        ("b", "p", Literal("w", lang="en")),   # unchanged (lang-tagged)
        ("c", "p", Uri("u:kept")),             # unchanged
        ("d", "p", Literal("new")),            # added
    ])
    got = {(r.subj, r.pred, r.obj_value, r.obj_kind, r.obj_lang, r.op)
           for r in diff_triples(before, after).collect()}
    assert got == {
        ("d", "p", "new", "literal", None, "+"),
        ("a", "p", "v", "literal", None, "-"),
    }
    # identical snapshots -> empty diff (null-safe on obj_lang)
    assert diff_triples(before, before).count() == 0




def test_objects_projection(spark, base_df):
    got = sorted(r.obj_value for r in objects(base_df, subject="x", predicate="y").collect())
    assert got == ["3", "z"]


def test_objects_by_curie(spark):
    df = triples_df(spark, [("s", curie_to_uri("rdfs:label"), Literal("L"))])
    assert objects(df, subject="s", curie="rdfs:label").count() == 1


def test_contains(base_df):
    assert contains(base_df, "x", "y", "z")
    assert contains(base_df, "x")
    assert contains(base_df)
    assert not contains(base_df, "X")
    assert not contains(base_df, "x", "y", "Z")


def test_literal_values_deterministic_first(spark):
    df = triples_df(spark, [
        ("s", "p", Uri("u:ignored")),
        ("s", "p", Literal("b")),
        ("s", "p", Literal("a")),
        ("s", "p", Literal("")),  # falsy skipped
        ("s2", "p", Literal("only")),
    ])
    got = {(r.subj, r.pred): r.literal_value for r in literal_values(df).collect()}
    assert got == {("s", "p"): "a", ("s2", "p"): "only"}


LABEL_CASES = [
    # (triples, expected (value, lang)) — mirrors graphtest.py:142-170
    ([("u", "rdfs:label", "rdfsLabel", None)], ("rdfsLabel", None)),
    ([("u", "rdfs:label", "rdfsLabel", None),
      ("u", "rdfs:label", "rdfsLabelEN", "en")], ("rdfsLabelEN", "en")),
    ([("u", "rdfs:label", "rdfsLabelEN", "en"),
      ("u", "skos:prefLabel", "skosPrefLabel", None)], ("rdfsLabelEN", "en")),
    # nl on a lower-priority predicate beats en on a higher one
    ([("u", "rdfs:label", "rdfsLabelEN", "en"),
      ("u", "skos:prefLabel", "skosPrefLabelNL", "nl")], ("skosPrefLabelNL", "nl")),
    ([("u", "rdfs:label", "rdfsLabelNL", "nl"),
      ("u", "skos:prefLabel", "skosPrefLabelNL", "nl")], ("rdfsLabelNL", "nl")),
    ([("u", "foaf:name", "foafNameNL", "nl"),
      ("u", "rdfs:label", "rdfsLabelNL", "nl")], ("foafNameNL", "nl")),
    # other languages never win
    ([("u", "rdfs:label", "de-label", "de")], None),
]


@pytest.mark.parametrize("case", LABEL_CASES)
def test_find_labels_matches_local_graph(spark, case):
    triples, expected = case
    node_triples = [
        (s, curie_to_uri(p), Literal(v, lang=lang)) for s, p, v, lang in triples]
    df = triples_df(spark, node_triples)
    got = {r.subj: (r.label_value, r.label_lang) for r in find_labels(df).collect()}

    g = Graph()
    g.addTriples(node_triples)
    local = g.findLabel("u")
    if expected is None:
        assert got == {} and local is None
    else:
        assert got == {"u": expected}
        assert (local.value, local.lang) == expected


def test_find_labels_empty_predicates(spark):
    df = triples_df(spark, [("u", curie_to_uri("rdfs:label"), Literal("x"))])
    assert find_labels(df, label_predicates=[]).count() == 0


def test_find_labels_restricted_predicates(spark):
    df = triples_df(spark, [("u2", curie_to_uri("skos:altLabel"), Literal("altLabel"))])
    assert find_labels(df, label_predicates=[curie_to_uri("rdfs:label")]).count() == 0
    got = find_labels(df, label_predicates=[
        curie_to_uri("rdfs:label"), curie_to_uri("skos:altLabel")]).collect()
    assert [(r.subj, r.label_value, r.label_lang) for r in got] == [("u2", "altLabel", None)]


def test_in_degrees(spark):
    from meresco_rdf_spark.model import RDF_SUBJECT

    df = triples_df(spark, [
        ("a", "p", BNode("_:1")),
        ("b", "p", BNode("_:1")),
        ("c", RDF_SUBJECT, BNode("_:1")),  # rdf:subject edges don't count
        ("a", "q", Uri("u:x")),
    ])
    got = {(r.obj_value): r.in_degree for r in in_degrees(df).collect()}
    assert got == {"_:1": 2, "u:x": 1}


# -- BGP pattern matching ----------------------------------------------------

BGP_GRAPH = [
    ("uri:x", "uri:y", Uri("uri:z")),
    ("uri:a", "uri:b", Literal("c")),
    ("uri:z", "uri:d", Uri("uri:a")),
    ("uri:a", "uri:e", Uri("uri:x")),
]


@pytest.fixture(scope="module")
def bgp_df(spark):
    return triples_df(spark, BGP_GRAPH).cache()


def local_bindings(patterns):
    g = Graph()
    g.addTriples(BGP_GRAPH)
    out = set()
    for binding in g.matchTriplePatterns(*patterns):
        out.add(tuple(sorted(
            (k, getattr(v, "value", v),
             "uri" if v.isUri() else "bnode" if v.isBNode() else "literal",
             getattr(v, "lang", None))
            for k, v in binding.items())))
    return out


def spark_bindings(df, patterns):
    result = match_patterns(df, patterns)
    vars_ = sorted({c for c in result.columns if "_" not in c})
    out = set()
    for row in result.collect():
        out.add(tuple(sorted(
            (v, row[v], row[v + "_kind"], row[v + "_lang"]) for v in vars_)))
    return out


@pytest.mark.parametrize("patterns", [
    [("?v", "uri:y", Uri("uri:z"))],
    [("?v", "uri:b", None)],
    [(None, None, "?v"), ("?v", None, None)],
    [("?v", None, None), (None, None, "?v")],
    [("?v0", None, "?v1"), ("?v1", None, "?v2"),
     ("?v2", None, "?v0"), ("?v0", None, Literal("c"))],
])
def test_match_patterns_vs_local(bgp_df, patterns):
    assert spark_bindings(bgp_df, patterns) == local_bindings(patterns)


def test_match_patterns_malformed(bgp_df):
    with pytest.raises(ValueError):
        match_patterns(bgp_df, [("a", "b")])
