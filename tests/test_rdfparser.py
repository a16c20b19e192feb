"""RDF/XML parser conformance, ported from reference
test/graph/rdfparsertest.py (incl. the dense INPUT_RDF fixture) and
test/graph/graphcomponenttest.py's real-ontology cases."""

import xml.etree.ElementTree as ET

from meresco_rdf_spark.graph import Graph
from meresco_rdf_spark.model import BNode, Literal, Uri
from meresco_rdf_spark.namespaces import curie_to_uri, namespaces
from meresco_rdf_spark.rdfxml import RDFParser, get_text, parse_rdfxml

from helpers import load_fixture

URI = "urn:GGC:oclc-ggc:780950577"


def parse(xml_text, sink=None):
    sink = sink if sink is not None else Graph()
    return RDFParser(sink=sink).parse(ET.fromstring(xml_text))


def input_rdf():
    return load_fixture("input_rdf.xml.tmpl")


def test_one():
    graph = parse(input_rdf())
    objects = sorted(graph.objects(subject=URI, curie="rdfs:seeAlso"),
                     key=lambda n: n.value)
    assert objects == [Uri("http://example.com"), Literal("http://example.org")]


def test_convenience_graph():
    graph = parse_rdfxml(input_rdf())
    assert len(graph.objects(subject=URI, curie="rdfs:seeAlso")) == 2


def test_type_from_element_tag():
    based_xml = '''<rdf:RDF
    %(xmlns_rdf)s %(xmlns_rdfs)s %(xmlns_owl)s
    xml:base="http://purl.org/ontology/mo/"
    >
    <owl:Class rdf:about="Track">
        <rdfs:label>track</rdfs:label>
        <rdfs:subClassOf rdf:resource="MusicalManifestation"/>
    </owl:Class>
    </rdf:RDF>''' % namespaces
    graph = parse(based_xml)
    assert graph.objects(
        subject="http://purl.org/ontology/mo/Track", curie="rdf:type"
    ) == [Uri(namespaces.owl + "Class")]
    # xml:base also resolves rdf:resource objects (reference testBase2)
    assert ("http://purl.org/ontology/mo/Track",
            "http://www.w3.org/2000/01/rdf-schema#subClassOf",
            Uri("http://purl.org/ontology/mo/MusicalManifestation")) in set(graph.triples())


def test_parse_node_without_rdf_container():
    xml = '''<owl:Class %(xmlns_rdf)s %(xmlns_rdfs)s %(xmlns_owl)s rdf:about="http://purl.org/ontology/mo/Track">
        <rdfs:label>track</rdfs:label>
        <rdfs:subClassOf rdf:resource="http://purl.org/ontology/mo/MusicalManifestation"/>
    </owl:Class>''' % namespaces
    graph = parse(xml)
    assert graph.objects(
        subject="http://purl.org/ontology/mo/Track", curie="rdf:type"
    ) == [Uri(namespaces.owl + "Class")]


def test_literal_with_comment_and_pi():
    graph = parse(input_rdf())
    dates = sorted(
        (o for _, _, o in graph.triples(subject=URI, predicate=curie_to_uri("dcterms:date"))),
        key=lambda n: (n.value, n.lang or ""))
    assert dates == [Literal("1970"), Literal("1970-01-01")]


def test_blank_nodes_and_literals():
    BNode.nextGenId = 0
    graph = parse(input_rdf())
    assert graph.objects(subject=URI, curie="dcterms:creator") == [BNode("_:id0")]
    assert graph.objects(subject="_:id0", curie="rdf:type") == [
        Uri("http://dbpedia.org/ontology/Person")]

    contributor = graph.objects(subject=URI, predicate=curie_to_uri("dcterms:contributor"))[0]
    assert graph.objects(subject=contributor.value, curie="rdfs:label") == [
        Literal("Anonymous", lang="en")]

    assert Literal("An illustrated history of Black Americans", lang="en") in set(
        graph.objects(subject=URI, curie="dcterms:title"))
    # trailing-NBSP literal preserved exactly
    assert Literal("An illustrated history of Black Americans ") in set(
        graph.objects(subject=URI, curie="dcterms:title"))


def test_base():
    graph = parse(load_fixture("rdf_with_base.xml"))
    assert list(graph.triples()) == [(
        "http://example.org/base/2",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        Uri("http://example.org/base/Book"),
    )]


def test_parsing_entities_no_problem():
    graph = parse(load_fixture("custom_type_relations.rdf"))
    assert ("http://purl.org/ontology/mo/Track",
            "http://www.w3.org/2000/01/rdf-schema#subClassOf",
            Uri("http://dbpedia.org/ontology/MusicalWork")) in set(graph.triples())


def test_empty_property_attribs():
    graph = parse(input_rdf())
    relation_bnode = graph.objects(subject=URI, curie="dcterms:relation")[0]
    assert graph.objects(
        subject=relation_bnode.value, predicate=curie_to_uri("dcterms:title")
    ) == [Literal("JPM")]
    assert graph.objects(subject=relation_bnode.value, curie="rdf:type") == [
        Uri(curie_to_uri("foaf:Person"))]


def test_get_text():
    assert get_text(ET.fromstring(
        "<node>v<!-- com -->w<!-- ment -->x<?pro ce?>y<?ss ing?>z</node>")) == "vwxyz"
    assert get_text(ET.fromstring(
        "<node>x<sub>subtext<subsub />subsubtail</sub>y<a><b>text</b>text</a>z</node>")) == "xyz"
    assert get_text(ET.fromstring("<node><a><b /></a></node>")) is None
    assert get_text(ET.fromstring("<node> <a><b /></a></node>")) == " "
    assert get_text(ET.fromstring("<node><a><b /></a> </node>")) == " "
    assert get_text(ET.fromstring("<node><a /> <b /></node>")) == " "
    assert get_text(ET.fromstring("<node><!-- comment --></node>")) is None
    assert get_text(ET.fromstring("<node><?pi 3.14?></node>")) is None


def test_rdf_id():
    graph = parse("""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
           xmlns:exterms="http://www.example.com/terms/"
           xml:base="http://www.example.com/2002/04/products">
<rdf:Description rdf:ID="item10245">
    <exterms:model>Overnighter</exterms:model>
</rdf:Description>
</rdf:RDF>""")
    assert list(graph.triples()) == [(
        "http://www.example.com/2002/04/products#item10245",
        "http://www.example.com/terms/model",
        Literal("Overnighter"),
    )]


def test_node_id():
    graph = parse("""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" %(xmlns_rdfs)s
           xmlns:exterms="http://www.example.com/terms/">
<rdf:Description rdf:about="http://example.com/something">
    <exterms:relatedTo rdf:nodeID="abc"/>
</rdf:Description>
<rdf:Description rdf:nodeID="abc">
    <rdfs:label>ABC</rdfs:label>
</rdf:Description>
</rdf:RDF>""" % namespaces)
    assert set(graph.triples()) == {
        ("http://example.com/something", "http://www.example.com/terms/relatedTo", BNode("_:abc")),
        ("_:abc", namespaces.rdfs + "label", Literal("ABC")),
    }


def test_node_id_non_alpha_prefixed():
    graph = parse("""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
           xmlns:ex="http://example.com/terms/">
<rdf:Description rdf:about="http://example.com/x">
    <ex:rel rdf:nodeID="123"/>
</rdf:Description>
</rdf:RDF>""")
    # rdfparser.py:75-79: non-alpha first char gets 'b' prefix
    assert list(graph.triples()) == [(
        "http://example.com/x", "http://example.com/terms/rel", BNode("_:b123"))]


def test_property_elt_without_value_is_empty_literal():
    graph = parse("""<rdf:RDF %(xmlns_rdf)s %(xmlns_rdfs)s
           xmlns:exterms="http://www.example.com/terms/">
<rdf:Description rdf:about="http://example.com/something">
    <exterms:relatedTo/>
</rdf:Description>
</rdf:RDF>""" % namespaces)
    assert list(graph.triples()) == [(
        "http://example.com/something",
        "http://www.example.com/terms/relatedTo",
        Literal(""),
    )]


def test_parse_type_resource():
    BNode.nextGenId = 0
    graph = parse("""<rdf:RDF %(xmlns_rdf)s %(xmlns_rdfs)s %(xmlns_dcterms)s>
<rdf:Description rdf:about="http://example.com/something">
    <dcterms:hasFormat rdf:parseType="Resource">
        <dcterms:title>Title</dcterms:title>
        <dcterms:format>application/epub</dcterms:format>
    </dcterms:hasFormat>
</rdf:Description>
</rdf:RDF>""" % namespaces)
    assert set(graph.triples()) == {
        ("http://example.com/something", curie_to_uri("dcterms:hasFormat"), BNode("_:id0")),
        ("_:id0", curie_to_uri("dcterms:format"), Literal("application/epub")),
        ("_:id0", curie_to_uri("dcterms:title"), Literal("Title")),
    }


def test_reification_rdf_id():
    BNode.nextGenId = 0
    graph = parse("""<rdf:RDF %(xmlns_rdf)s %(xmlns_rdfs)s %(xmlns_dcterms)s>
<rdf:Description rdf:about="http://example.com/something">
    <dcterms:title rdf:ID="triple2">Title</dcterms:title>
</rdf:Description>
<rdf:Statement rdf:about="#triple2">
    <dcterms:source>source</dcterms:source>
</rdf:Statement>
</rdf:RDF>""" % namespaces)
    rdf = namespaces.rdf
    assert set(graph.triples()) == {
        ("http://example.com/something", curie_to_uri("dcterms:title"), Literal("Title")),
        ("#triple2", rdf + "predicate", Uri("http://purl.org/dc/terms/title")),
        ("#triple2", rdf + "object", Literal("Title")),
        ("#triple2", rdf + "type", Uri(rdf + "Statement")),
        ("#triple2", "http://purl.org/dc/terms/source", Literal("source")),
        ("#triple2", rdf + "subject", Uri("http://example.com/something")),
    }


def test_reification_from_bnode_subject():
    BNode.nextGenId = 0
    graph = parse("""<rdf:RDF %(xmlns_rdf)s %(xmlns_rdfs)s %(xmlns_dcterms)s>
<rdf:Description>
    <dcterms:title rdf:ID="triple2">Title</dcterms:title>
</rdf:Description>
<rdf:Statement rdf:about="#triple2">
    <dcterms:source>source</dcterms:source>
</rdf:Statement>
</rdf:RDF>""" % namespaces)
    rdf = namespaces.rdf
    assert ("#triple2", rdf + "subject", BNode("_:id0")) in set(graph.triples())
    assert ("_:id0", curie_to_uri("dcterms:title"), Literal("Title")) in set(graph.triples())


def test_find_label_using_real_ontology():
    graph = parse(load_fixture("nl_property_labels.rdf"))
    assert graph.findLabel(namespaces.dcterms + "title") == Literal("Titel", lang="nl")
    assert graph.findLabel(namespaces.dcterms + "creator") == Literal("Maker", lang="nl")
    assert graph.findLabel("http://purl.org/NET/c4dm/event.owl#time") == Literal("Tijd", lang="nl")
    assert 10 < len(list(graph.triples()))
    assert graph.triples(
        subject=curie_to_uri("dcterms:title"), predicate=curie_to_uri("rdfs:label")
    ) == [(curie_to_uri("dcterms:title"), curie_to_uri("rdfs:label"), Literal("Titel", lang="nl"))]
