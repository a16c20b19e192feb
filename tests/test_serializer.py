"""Serializer golden-output + round-trip tests, ported from reference
test/graph/triples2rdfxmltest.py:40-276."""

import xml.etree.ElementTree as ET

from meresco_rdf_spark.graph import Graph
from meresco_rdf_spark.model import BNode, Literal, Uri
from meresco_rdf_spark.namespaces import curie_to_uri, namespaces
from meresco_rdf_spark.rdfxml import RDFParser, Triples2RdfXml, serialize_triples

from helpers import xml_equal


def to_xml(triples_or_graph, **kwargs):
    return serialize_triples(triples_or_graph, **kwargs)


def test_empty_graph():
    class A:
        def triples(self):
            return iter([])

    assert to_xml(A()) == (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"/>')


def test_single_triple():
    xml_equal('''<rdf:RDF %(xmlns_rdf)s %(xmlns_rdfs)s>
<rdf:Description rdf:about="http://example.org/item">
    <rdfs:label xml:lang="nl">The Item</rdfs:label>
</rdf:Description>
</rdf:RDF>''' % namespaces, to_xml([
        ("http://example.org/item", curie_to_uri("rdfs:label"), Literal("The Item", lang="nl"))]))


def test_more_than_one_triple_per_subject_sorted_by_pred():
    g = Graph()
    g.addTriple("http://example.org/item", curie_to_uri("rdfs:label"), Literal("The Item", lang="en"))
    g.addTriple("http://example.org/item", curie_to_uri("dcterms:creator"), Literal("The Creator"))
    xml_equal('''<rdf:RDF %(xmlns_rdf)s %(xmlns_rdfs)s %(xmlns_dcterms)s>
<rdf:Description rdf:about="http://example.org/item">
    <dcterms:creator>The Creator</dcterms:creator>
    <rdfs:label xml:lang="en">The Item</rdfs:label>
</rdf:Description>
</rdf:RDF>''' % namespaces, to_xml(g))


def test_rdf_resource():
    g = Graph()
    g.addTriple("http://example.org/item", curie_to_uri("dcterms:creator"),
                Uri("http://example.org/theCreator"))
    xml_equal('''<rdf:RDF %(xmlns_rdf)s %(xmlns_dcterms)s>
<rdf:Description rdf:about="http://example.org/item">
    <dcterms:creator rdf:resource="http://example.org/theCreator"/>
</rdf:Description>
</rdf:RDF>''' % namespaces, to_xml(g))


def test_rdf_description_per_uri():
    g = Graph()
    g.addTriple("http://example.org/item", curie_to_uri("dcterms:creator"),
                Uri("http://example.org/theCreator"))
    g.addTriple("http://example.org/theCreator", curie_to_uri("rdfs:label"),
                Literal("The Creator"))
    g.addTriple("http://example.org/somethingEntirelyDifferent",
                curie_to_uri("dcterms:title"), Literal("Something Entirely Different"))
    xml_equal('''<rdf:RDF %(xmlns_rdf)s %(xmlns_rdfs)s %(xmlns_dcterms)s>
<rdf:Description rdf:about="http://example.org/item">
    <dcterms:creator rdf:resource="http://example.org/theCreator"/>
</rdf:Description>
<rdf:Description rdf:about="http://example.org/somethingEntirelyDifferent">
  <dcterms:title>Something Entirely Different</dcterms:title>
</rdf:Description>
<rdf:Description rdf:about="http://example.org/theCreator">
  <rdfs:label>The Creator</rdfs:label>
</rdf:Description>
</rdf:RDF>''' % namespaces, to_xml(g))


def test_anonymous_bnode_inlined():
    g = Graph()
    g.addTriple("http://example.org/item", curie_to_uri("dcterms:creator"), BNode("_:1"))
    g.addTriple("_:1", curie_to_uri("rdfs:label"), Literal("The Creator", lang="en"))
    xml_equal('''<rdf:RDF %(xmlns_rdf)s %(xmlns_rdfs)s %(xmlns_dcterms)s>
<rdf:Description rdf:about="http://example.org/item">
    <dcterms:creator>
        <rdf:Description>
            <rdfs:label xml:lang="en">The Creator</rdfs:label>
        </rdf:Description>
    </dcterms:creator>
</rdf:Description>
</rdf:RDF>''' % namespaces, to_xml(g))


def test_nested_anonymous_bnodes():
    g = Graph()
    for triple in [
        ("http://example.org/item", curie_to_uri("dcterms:creator"), BNode("_:1")),
        ("_:1", curie_to_uri("rdfs:label"), Literal("The Creator", lang="en")),
        ("_:1", curie_to_uri("dcterms:spatial"), BNode("_:2")),
        ("_:2", curie_to_uri("geo:lat"), Literal("123.123")),
        ("_:2", curie_to_uri("geo:long"), Literal("1.3")),
    ]:
        g.addTriple(*triple)
    xml_equal('''<rdf:RDF %(xmlns_rdf)s %(xmlns_rdfs)s %(xmlns_dcterms)s %(xmlns_geo)s>
<rdf:Description rdf:about="http://example.org/item">
    <dcterms:creator>
        <rdf:Description>
            <dcterms:spatial>
                <rdf:Description>
                    <geo:lat>123.123</geo:lat>
                    <geo:long>1.3</geo:long>
                </rdf:Description>
            </dcterms:spatial>
            <rdfs:label xml:lang="en">The Creator</rdfs:label>
        </rdf:Description>
    </dcterms:creator>
</rdf:Description>
</rdf:RDF>''' % namespaces, to_xml(g))


def annotation_graph():
    g = Graph()
    BNode.nextGenId = 0
    body = BNode()
    uri = "uri:a"
    g.addTriple(uri, curie_to_uri("oa:hasBody"), body)
    g.addTriple(uri, curie_to_uri("rdf:type"), Uri(curie_to_uri("oa:Annotation")))
    g.addTriple(uri, curie_to_uri("oa:annotatedBy"), Uri("uri:testAnnotation"))
    g.addTriple(uri, curie_to_uri("oa:motivatedBy"), Uri("uri:testAnnotation:motive"))
    g.addTriple(uri, curie_to_uri("oa:hasTarget"), Uri("uri:target"))
    g.addTriple(body.value, curie_to_uri("dcterms:title"), Literal("Title"))
    g.addTriple(body.value, curie_to_uri("dcterms:source"), Uri("uri:source"))
    g.addTriple("uri:source", curie_to_uri("rdfs:label"), Literal("A Source"))
    return g


def test_annotation_inline_descriptions():
    # oa:Annotation type promotion + inlineDescriptions=True nests the
    # uri:source description inside the bnode body
    xml_equal('''<rdf:RDF %(xmlns_dcterms)s %(xmlns_oa)s %(xmlns_rdf)s %(xmlns_rdfs)s>
<oa:Annotation rdf:about="uri:a">
  <oa:annotatedBy rdf:resource="uri:testAnnotation"/>
  <oa:hasBody>
    <rdf:Description>
        <dcterms:source>
            <rdf:Description rdf:about="uri:source">
                <rdfs:label>A Source</rdfs:label>
            </rdf:Description>
        </dcterms:source>
        <dcterms:title>Title</dcterms:title>
    </rdf:Description>
  </oa:hasBody>
  <oa:hasTarget rdf:resource="uri:target"/>
  <oa:motivatedBy rdf:resource="uri:testAnnotation:motive"/>
</oa:Annotation>
</rdf:RDF>''' % namespaces, to_xml(annotation_graph(), inlineDescriptions=True))


def test_annotation_separate_descriptions():
    xml_equal('''<rdf:RDF %(xmlns_dcterms)s %(xmlns_oa)s %(xmlns_rdf)s %(xmlns_rdfs)s>
<oa:Annotation rdf:about="uri:a">
  <oa:annotatedBy rdf:resource="uri:testAnnotation"/>
  <oa:hasBody>
    <rdf:Description>
        <dcterms:source rdf:resource="uri:source"/>
        <dcterms:title>Title</dcterms:title>
    </rdf:Description>
  </oa:hasBody>
  <oa:hasTarget rdf:resource="uri:target"/>
  <oa:motivatedBy rdf:resource="uri:testAnnotation:motive"/>
</oa:Annotation>
<rdf:Description rdf:about="uri:source">
    <rdfs:label>A Source</rdfs:label>
</rdf:Description>
</rdf:RDF>''' % namespaces, to_xml(annotation_graph()))


def test_anonymous_bnode_with_known_type_promoted():
    g = Graph()
    g.addTriple("http://example.org/item", curie_to_uri("dcterms:creator"), BNode("_:1"))
    g.addTriple("_:1", curie_to_uri("rdfs:label"), Literal("The Creator", lang="en"))
    g.addTriple("_:1", curie_to_uri("rdf:type"), Uri(curie_to_uri("foaf:Person")))
    xml_equal('''<rdf:RDF %(xmlns_rdf)s %(xmlns_rdfs)s %(xmlns_dcterms)s %(xmlns_foaf)s>
<rdf:Description rdf:about="http://example.org/item">
    <dcterms:creator>
        <foaf:Person>
            <rdfs:label xml:lang="en">The Creator</rdfs:label>
        </foaf:Person>
    </dcterms:creator>
</rdf:Description>
</rdf:RDF>''' % namespaces, to_xml(g, knownTypes=["foaf:Person"]))


def round_trip(rdf_xml, **kwargs):
    graph = RDFParser().parse(ET.fromstring(rdf_xml))
    return to_xml(graph, **kwargs)


def test_identified_bnode_round_trip():
    # two incoming references -> rdf:nodeID must be emitted
    rdf_xml = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" %(xmlns_rdfs)s %(xmlns_dcterms)s>
<rdf:Description rdf:about="http://example.com/something">
    <dcterms:related rdf:nodeID="abc"/>
</rdf:Description>
<rdf:Description rdf:about="http://example.com/somethingElse">
    <dcterms:related rdf:nodeID="abc"/>
</rdf:Description>
<rdf:Description rdf:nodeID="abc">
    <rdfs:label>ABC</rdfs:label>
</rdf:Description>
</rdf:RDF>""" % namespaces
    xml_equal(rdf_xml, round_trip(rdf_xml))


def test_reification_with_rdf_id_round_trip():
    test_ns = namespaces.copy_update(dict(test="urn:test#"))
    rdf_xml = '''<rdf:RDF %(xmlns_rdf)s %(xmlns_test)s>
    <rdf:Description rdf:about="some:uri">
        <test:relation rdf:ID="_987">object</test:relation>
    </rdf:Description>
    <rdf:Statement rdf:about="#_987">
        <test:reificationRelation>reification object</test:reificationRelation>
    </rdf:Statement>
</rdf:RDF>''' % test_ns
    graph = RDFParser().parse(ET.fromstring(rdf_xml))
    result = to_xml(graph, namespaces=test_ns)
    root = ET.fromstring(result)
    # rdf:Description first, rdf:Statement last (relative type positions)
    tags = [test_ns.tag_to_curie(child.tag) for child in root]
    assert tags == ["rdf:Description", "rdf:Statement"]
    xml_equal(rdf_xml, result)


def test_top_level_bnode():
    rdf_xml = '''<rdf:RDF %(xmlns_rdf)s %(xmlns_dcterms)s>
    <rdf:Description>
        <dcterms:title>a title</dcterms:title>
    </rdf:Description>
</rdf:RDF>''' % namespaces
    BNode.nextGenId = 0
    xml_equal(rdf_xml, round_trip(rdf_xml))


def test_reification_with_blank_node_subject():
    test_ns = namespaces.copy_update(dict(test="urn:test#"))
    rdf_xml = '''<rdf:RDF %(xmlns_rdf)s %(xmlns_test)s>
    <rdf:Description>
        <test:relation rdf:ID="_987">object</test:relation>
    </rdf:Description>
    <rdf:Statement rdf:about="#_987">
        <test:reificationRelation>reification object</test:reificationRelation>
    </rdf:Statement>
</rdf:RDF>''' % test_ns
    BNode.nextGenId = 0
    graph = RDFParser().parse(ET.fromstring(rdf_xml))
    result = to_xml(graph, namespaces=test_ns)
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
    from helpers import assert_isomorphic, load_fixture, triple_set

    BNode.nextGenId = 0
    graph = RDFParser().parse(ET.fromstring(load_fixture("input_rdf.xml.tmpl")))
    BNode.nextGenId = 0
    graph2 = RDFParser().parse(ET.fromstring(to_xml(graph)))
    assert_isomorphic(triple_set(graph), triple_set(graph2))
