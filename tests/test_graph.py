"""Local Graph semantics, ported from reference test/graph/graphtest.py."""

from meresco_rdf_spark.graph import Graph, unique
from meresco_rdf_spark.model import BNode, Literal, Uri
from meresco_rdf_spark.namespaces import curie_to_uri


def test_masked_lookup_all_eight_patterns():
    g = Graph()
    g.addTriple("x", "y", "z")
    g.addTriple(subject="a", predicate="b", object="c")
    assert sorted(g.triples()) == [("a", "b", "c"), ("x", "y", "z")]

    for s, p, o in [("x", "y", "3"), ("x", "2", "z"), ("x", "2", "3"),
                    ("1", "y", "z"), ("1", "y", "3"), ("1", "2", "z"),
                    ("1", "2", "3")]:
        g.addTriple(s, p, o)

    assert sorted(g.triples("x", "y", "z")) == [("x", "y", "z")]
    assert sorted(g.triples(subject="x", predicate="y", object="z")) == [("x", "y", "z")]
    assert sorted(g.triples("x", "y", None)) == [("x", "y", "3"), ("x", "y", "z")]
    assert sorted(g.triples("x", None, "z")) == [("x", "2", "z"), ("x", "y", "z")]
    assert sorted(g.triples("x", None, None)) == [
        ("x", "2", "3"), ("x", "2", "z"), ("x", "y", "3"), ("x", "y", "z")]
    assert sorted(g.triples(None, "y", "z")) == [("1", "y", "z"), ("x", "y", "z")]
    assert sorted(g.triples(None, "y", None)) == [
        ("1", "y", "3"), ("1", "y", "z"), ("x", "y", "3"), ("x", "y", "z")]
    assert sorted(g.triples(None, None, "z")) == [
        ("1", "2", "z"), ("1", "y", "z"), ("x", "2", "z"), ("x", "y", "z")]
    assert sorted(g.triples()) == sorted(g.triples(None, None, None))
    assert len(list(g.triples())) == 9
    assert sorted(g.objects(subject="x", predicate="y")) == ["3", "z"]


def test_set_semantics_add_twice_is_one():
    g = Graph()
    g.addTriple("s", "p", Literal("o"))
    g.addTriple("s", "p", Literal("o"))
    assert len(g.triples()) == 1


def test_remove_triple_and_index_gc():
    g = Graph()
    g.addTriple(subject="u:ri", predicate="p:redicate", object="obj")
    g.addTriple(subject="u:ri", predicate="p:redicate", object="obj2")
    assert len(list(g.triples())) == 2
    # whitebox: no leaked index buckets (reference graphtest.py:70-74)
    assert len(g._index) == 12

    g.removeTriple(subject="u:ri", predicate="p:redicate", object="obj2")
    assert len(g._index) == 8

    assert len(list(g.triples())) == 1
    for mask in [(None, None, None), (None, None, "obj"),
                 (None, "p:redicate", None), (None, "p:redicate", "obj"),
                 ("u:ri", None, None), ("u:ri", None, "obj"),
                 ("u:ri", "p:redicate", None), ("u:ri", "p:redicate", "obj")]:
        assert len(list(g.triples(*mask))) == 1
    for mask in [(None, None, "obj2"), (None, "p:redicate", "obj2"),
                 ("u:ri", "p:redicate", "obj2")]:
        assert len(list(g.triples(*mask))) == 0


def test_remove_nonexistent_does_not_leak():
    g = Graph()
    assert len(g._index) == 0
    g.removeTriple(subject="u:ri", predicate="p:redicate", object="obj2")
    assert len(g._index) == 0


def test_contains_all_masks():
    g = Graph()
    g.addTriple("u:ri", "p:redicate", "obj")
    assert ("u:ri", "p:redicate", "obj") in g
    assert ("u:ri", "p:redicate", None) in g
    assert ("u:ri", None, "obj") in g
    assert ("u:ri", None, None) in g
    assert (None, "p:redicate", "obj") in g
    assert (None, "p:redicate", None) in g
    assert (None, None, "obj") in g
    assert (None, None, None) in g
    assert ("U:ri", "p:redicate", "obj") not in g
    assert ("u:ri", "P:redicate", "obj") not in g
    assert ("u:ri", "p:redicate", "Obj") not in g


def test_contains_typed_nodes():
    g = Graph()
    g.addTriple("u:ri", "p:redicate", Uri("o:bj"))
    assert ("u:ri", "p:redicate", Uri("o:bj")) in g
    assert (None, "p:redicate", Uri("o:bj")) in g
    assert ("u:ri", "p:redicate", None) in g
    assert ("u:ri", "p:redicate", Uri("O:bj")) not in g

    g = Graph()
    g.addTriple("u:ri", "p:redicate", BNode("_:42"))
    assert ("u:ri", "p:redicate", BNode("_:42")) in g
    assert ("u:ri", "p:redicate", BNode("_:666")) not in g

    g = Graph()
    g.addTriple("u:ri", "p:redicate", Literal("obj", lang="en"))
    assert ("u:ri", "p:redicate", Literal("obj", lang="en")) in g
    assert ("u:ri", "p:redicate", Literal("Obj", lang="en")) not in g
    # no lang guessing
    assert ("u:ri", "p:redicate", Literal("obj", lang="nl")) not in g
    assert ("u:ri", "p:redicate", Literal("obj")) not in g


def test_find_label_priority(ref=curie_to_uri):
    g = Graph()
    g.addTriple("u:ri", ref("rdfs:label"), Literal("rdfsLabel"))
    assert g.findLabel(uri="u:ri") == Literal("rdfsLabel")

    g.addTriple("u:ri", ref("rdfs:label"), Literal("rdfsLabelEN", lang="en"))
    assert g.findLabel(uri="u:ri") == Literal("rdfsLabelEN", lang="en")

    g.addTriple("u:ri", ref("skos:prefLabel"), Literal("skosPrefLabel"))
    assert g.findLabel(uri="u:ri") == Literal("rdfsLabelEN", lang="en")

    # nl beats en even on a lower-priority predicate
    g.addTriple("u:ri", ref("skos:prefLabel"), Literal("skosPrefLabelNL", lang="nl"))
    assert g.findLabel(uri="u:ri") == Literal("skosPrefLabelNL", lang="nl")

    g.addTriple("u:ri", ref("rdfs:label"), Literal("rdfsLabelNL", lang="nl"))
    assert g.findLabel(uri="u:ri") == Literal("rdfsLabelNL", lang="nl")

    g.addTriple("u:ri", ref("foaf:name"), Literal("foafNameNL", lang="nl"))
    assert g.findLabel(uri="u:ri") == Literal("foafNameNL", lang="nl")


def test_find_label_explicit_predicates():
    g = Graph()
    g.addTriple("u:ri", curie_to_uri("rdfs:label"), Literal("rdfsLabel"))
    assert g.findLabel(uri="u:ri", labelPredicates=[]) is None
    assert g.findLabel(
        uri="u:ri", labelPredicates=[curie_to_uri("rdfs:label")]
    ) == Literal("rdfsLabel")

    g.addTriple("u:ri2", curie_to_uri("skos:altLabel"), Literal("altLabel"))
    assert g.findLabel(uri="u:ri2", labelPredicates=[curie_to_uri("rdfs:label")]) is None
    assert g.findLabel(
        uri="u:ri2",
        labelPredicates=[curie_to_uri("rdfs:label"), curie_to_uri("skos:altLabel")],
    ) == Literal("altLabel")


def test_literal_value_deterministic_first():
    g = Graph()
    g.addTriple("s", "p", Uri("u:ignored"))
    g.addTriple("s", "p", Literal("b"))
    g.addTriple("s", "p", Literal("a"))
    g.addTriple("s", "p", Literal(""))  # falsy value skipped
    assert g.literalValue("s", "p") == "a"
    assert g.literalValue("s", "nope") is None


def test_match_triple_patterns():
    # ported from reference graphtest.py:172-199
    g = Graph()
    g.addTriple("uri:x", "uri:y", Uri("uri:z"))
    g.addTriple("uri:a", "uri:b", Literal("c"))
    g.addTriple("uri:z", "uri:d", Uri("uri:a"))
    g.addTriple("uri:a", "uri:e", Uri("uri:x"))

    assert list(g.matchTriplePatterns(("?v", "uri:y", Uri("uri:z")))) == [
        {"v": Uri("uri:x")}]
    assert list(g.matchTriplePatterns(("?v", "uri:b", None))) == [{"v": Uri("uri:a")}]

    def by_v(bindings):
        return sorted(bindings, key=lambda b: b["v"].value)

    expected = [{"v": Uri("uri:a")}, {"v": Uri("uri:x")}, {"v": Uri("uri:z")}]
    assert by_v(g.matchTriplePatterns((None, None, "?v"), ("?v", None, None))) == expected
    assert by_v(g.matchTriplePatterns(("?v", None, None), (None, None, "?v"))) == expected

    # 4-pattern cycle query with a constant-object anchor
    assert list(g.matchTriplePatterns(
        ("?v0", None, "?v1"),
        ("?v1", None, "?v2"),
        ("?v2", None, "?v0"),
        ("?v0", None, Literal("c")),
    )) == [dict(v0=Uri("uri:a"), v1=Uri("uri:x"), v2=Uri("uri:z"))]


def test_unique_streaming_dedup():
    assert list(unique([1, 2, 1, 3, 2])) == [1, 2, 3]
    assert list(unique(["aa", "ab", "ba"], key=lambda s: s[0])) == ["aa", "ba"]
