"""Serializer golden-output + round-trip tests.

Behavior parity with reference test/graph/triples2rdfxmltest.py:40-276;
the expected-XML fixtures live as data under tests/data/serializer/
(see the README there — the XML is the parity spec, the logic here is
original).
"""

import xml.etree.ElementTree as ET

from meresco_rdf_spark.graph import Graph
from meresco_rdf_spark.model import BNode, Literal, Uri
from meresco_rdf_spark.namespaces import curie_to_uri, namespaces
from meresco_rdf_spark.rdfxml import RDFParser, Triples2RdfXml, serialize_triples

from helpers import load_fixture, xml_equal


def golden(name, ns=None):
    return load_fixture("serializer/%s.xml.tmpl" % name, ns)


def graph_of(*triples):
    g = Graph()
    for t in triples:
        g.addTriple(*t)
    return g


def check(name, triples_or_graph, ns=None, **kwargs):
    xml_equal(golden(name, ns), serialize_triples(triples_or_graph, **kwargs))


def test_empty_graph():
    class A:
        def triples(self):
            return iter([])

    assert serialize_triples(A()) == (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"/>')


def test_single_triple():
    # bare list input (K3 duck typing), language-tagged literal
    check("single_triple", [("http://example.org/item",
                             curie_to_uri("rdfs:label"),
                             Literal("The Item", lang="nl"))])


def test_more_than_one_triple_per_subject_sorted_by_pred():
    check("multi_pred_sorted", graph_of(
        ("http://example.org/item", curie_to_uri("rdfs:label"),
         Literal("The Item", lang="en")),
        ("http://example.org/item", curie_to_uri("dcterms:creator"),
         Literal("The Creator"))))


def test_rdf_resource():
    check("rdf_resource", graph_of(
        ("http://example.org/item", curie_to_uri("dcterms:creator"),
         Uri("http://example.org/theCreator"))))


def test_rdf_description_per_uri():
    # one rdf:Description per subject, subjects in sorted order
    check("description_per_uri", graph_of(
        ("http://example.org/item", curie_to_uri("dcterms:creator"),
         Uri("http://example.org/theCreator")),
        ("http://example.org/theCreator", curie_to_uri("rdfs:label"),
         Literal("The Creator")),
        ("http://example.org/somethingEntirelyDifferent",
         curie_to_uri("dcterms:title"),
         Literal("Something Entirely Different"))))


def test_anonymous_bnode_inlined():
    check("anonymous_bnode_inlined", graph_of(
        ("http://example.org/item", curie_to_uri("dcterms:creator"),
         BNode("_:1")),
        ("_:1", curie_to_uri("rdfs:label"),
         Literal("The Creator", lang="en"))))


def test_nested_anonymous_bnodes():
    check("nested_anonymous_bnodes", graph_of(
        ("http://example.org/item", curie_to_uri("dcterms:creator"),
         BNode("_:1")),
        ("_:1", curie_to_uri("rdfs:label"), Literal("The Creator", lang="en")),
        ("_:1", curie_to_uri("dcterms:spatial"), BNode("_:2")),
        ("_:2", curie_to_uri("geo:lat"), Literal("123.123")),
        ("_:2", curie_to_uri("geo:long"), Literal("1.3"))))


def annotation_graph():
    BNode.nextGenId = 0
    body = BNode()
    uri = "uri:a"
    return graph_of(
        (uri, curie_to_uri("oa:hasBody"), body),
        (uri, curie_to_uri("rdf:type"), Uri(curie_to_uri("oa:Annotation"))),
        (uri, curie_to_uri("oa:annotatedBy"), Uri("uri:testAnnotation")),
        (uri, curie_to_uri("oa:motivatedBy"), Uri("uri:testAnnotation:motive")),
        (uri, curie_to_uri("oa:hasTarget"), Uri("uri:target")),
        (body.value, curie_to_uri("dcterms:title"), Literal("Title")),
        (body.value, curie_to_uri("dcterms:source"), Uri("uri:source")),
        ("uri:source", curie_to_uri("rdfs:label"), Literal("A Source")))


def test_annotation_inline_descriptions():
    # oa:Annotation type promotion + inlineDescriptions=True nests the
    # uri:source description inside the bnode body
    check("annotation_inline", annotation_graph(), inlineDescriptions=True)


def test_annotation_separate_descriptions():
    check("annotation_separate", annotation_graph())


def test_anonymous_bnode_with_known_type_promoted():
    check("bnode_known_type", graph_of(
        ("http://example.org/item", curie_to_uri("dcterms:creator"),
         BNode("_:1")),
        ("_:1", curie_to_uri("rdfs:label"), Literal("The Creator", lang="en")),
        ("_:1", curie_to_uri("rdf:type"), Uri(curie_to_uri("foaf:Person")))),
        knownTypes=["foaf:Person"])


def round_trip(rdf_xml, **kwargs):
    graph = RDFParser().parse(ET.fromstring(rdf_xml))
    return serialize_triples(graph, **kwargs)


def test_identified_bnode_round_trip():
    # two incoming references -> rdf:nodeID must be emitted
    rdf_xml = golden("identified_bnode")
    xml_equal(rdf_xml, round_trip(rdf_xml))


def test_reification_with_rdf_id_round_trip():
    test_ns = namespaces.copy_update(dict(test="urn:test#"))
    rdf_xml = golden("reification_rdf_id", test_ns)
    graph = RDFParser().parse(ET.fromstring(rdf_xml))
    result = serialize_triples(graph, namespaces=test_ns)
    root = ET.fromstring(result)
    # rdf:Description first, rdf:Statement last (relative type positions)
    tags = [test_ns.tag_to_curie(child.tag) for child in root]
    assert tags == ["rdf:Description", "rdf:Statement"]
    xml_equal(rdf_xml, result)


def test_top_level_bnode():
    rdf_xml = golden("top_level_bnode")
    BNode.nextGenId = 0
    xml_equal(rdf_xml, round_trip(rdf_xml))


def test_reification_with_blank_node_subject():
    test_ns = namespaces.copy_update(dict(test="urn:test#"))
    rdf_xml = golden("reification_bnode_subject", test_ns)
    BNode.nextGenId = 0
    graph = RDFParser().parse(ET.fromstring(rdf_xml))
    result = serialize_triples(graph, namespaces=test_ns)
    root = ET.fromstring(result)
    tags = [test_ns.tag_to_curie(child.tag) for child in root]
    assert tags == ["rdf:Description", "rdf:Statement"]
    statement = root[1]
    # rdf:Statement keeps rdf:about and its own relation...
    assert statement.attrib.get(
        "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}about") == "#_987"
    child_tags = [test_ns.tag_to_curie(c.tag) for c in statement]
    assert "test:reificationRelation" in child_tags
    # ...but never emits rdf:subject pointing at a bnode
    # (triples2rdfxmltest.py:260-276)
    assert "rdf:subject" not in child_tags
    # the reified property element carries its rdf:ID again
    description = root[0]
    relation = description[0]
    assert relation.attrib.get(
        "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}ID") == "_987"
    assert relation.text == "object"


def test_parse_serialize_round_trip_dense_fixture():
    from helpers import assert_isomorphic, triple_set

    BNode.nextGenId = 0
    graph = RDFParser().parse(ET.fromstring(load_fixture("input_rdf.xml.tmpl")))
    BNode.nextGenId = 0
    graph2 = RDFParser().parse(ET.fromstring(serialize_triples(graph)))
    assert_isomorphic(triple_set(graph), triple_set(graph2))
