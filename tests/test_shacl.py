"""SHACL-core validation: shapes-graph parsing + every constraint family
over the five-column triple relation (engine extension — the reference
has no validation counterpart)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meresco_rdf_spark.operators.shacl import (
    ShaclUnsupported,
    conforms,
    shapes_from_graph,
    validate,
)
from meresco_rdf_spark.rdfxml.turtle import iter_turtle

TRIPLE_SCHEMA = ("subj string, pred string, obj_value string, "
                 "obj_kind string, obj_lang string")

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <urn:ex:> .

ex:PersonShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ; sh:maxCount 1 ;
                sh:nodeKind sh:Literal ] ;
  sh:property [ sh:path ex:knows ; sh:nodeKind sh:IRI ; sh:class ex:Person ] ;
  sh:property [ sh:path ex:id ; sh:pattern "^P[0-9]+$" ] .

ex:TagShape a sh:NodeShape ;
  sh:targetSubjectsOf ex:tag ;
  sh:property [ sh:path ex:tag ; sh:in ("red" "green" "blue") ] ;
  sh:property [ sh:path ex:label ; sh:languageIn ("en" "nl") ;
                sh:uniqueLang true ] ;
  sh:property [ sh:path ex:status ; sh:hasValue "active" ] .
"""


def tri(spark, rows):
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def person(pid, name=None, knows=(), typed=True):
    rows = []
    s = "urn:ex:%s" % pid
    if typed:
        rows.append((s, RDF_TYPE, "urn:ex:Person", "uri", None))
    if name is not None:
        rows.append((s, "urn:ex:name", name, "literal", None))
    for k in knows:
        rows.append((s, "urn:ex:knows", k, "uri", None))
    return rows


class TestShapesFromGraph:
    def test_parses_full_fixture(self):
        shapes = {s["id"]: s for s in shapes_from_graph(iter_turtle(SHAPES_TTL))}
        person_shape = shapes["urn:ex:PersonShape"]
        assert person_shape["target_class"] == "urn:ex:Person"
        props = {p["path"]: p for p in person_shape["properties"]}
        assert props["urn:ex:name"]["min_count"] == 1
        assert props["urn:ex:name"]["max_count"] == 1
        assert props["urn:ex:name"]["node_kind"] == ("literal",)
        assert props["urn:ex:knows"]["class"] == "urn:ex:Person"
        assert props["urn:ex:id"]["pattern"] == "^P[0-9]+$"
        tag_shape = shapes["urn:ex:TagShape"]
        assert tag_shape["target_subjects_of"] == "urn:ex:tag"
        tprops = {p["path"]: p for p in tag_shape["properties"]}
        assert tprops["urn:ex:tag"]["in"] == ["red", "green", "blue"]
        assert tprops["urn:ex:label"]["language_in"] == ["en", "nl"]
        assert tprops["urn:ex:label"]["unique_lang"] is True
        assert tprops["urn:ex:status"]["has_value"] == "active"

    def test_unsupported_constraint_raises(self):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s> a sh:NodeShape ; sh:targetClass <urn:C> ;
          sh:property [ sh:path <urn:p> ; sh:datatype <urn:dt> ] ."""
        with pytest.raises(ShaclUnsupported, match="datatype"):
            shapes_from_graph(iter_turtle(ttl))

    def test_unsupported_node_kind_raises(self):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s> a sh:NodeShape ; sh:targetClass <urn:C> ;
          sh:property [ sh:path <urn:p> ; sh:nodeKind sh:Anything ] ."""
        with pytest.raises(ShaclUnsupported, match="nodeKind"):
            shapes_from_graph(iter_turtle(ttl))

    def test_non_numeric_bound_raises_shacl_unsupported(self):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s> a sh:NodeShape ; sh:targetClass <urn:C> ;
          sh:property [ sh:path <urn:p> ; sh:minInclusive "abc" ] ."""
        with pytest.raises(ShaclUnsupported, match="non-numeric"):
            shapes_from_graph(iter_turtle(ttl))

    def test_shape_without_target_raises(self):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s> a sh:NodeShape ;
          sh:property [ sh:path <urn:p> ; sh:minCount 1 ] ."""
        with pytest.raises(ShaclUnsupported, match="no target"):
            shapes_from_graph(iter_turtle(ttl))

    def test_unknown_path_structure_raises(self):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s> a sh:NodeShape ; sh:targetClass <urn:C> ;
          sh:property [ sh:path [ <urn:weird> <urn:p> ] ] ."""
        with pytest.raises(ShaclUnsupported, match="path structure"):
            shapes_from_graph(iter_turtle(ttl))


class TestValidate:
    def report(self, spark, rows):
        df = validate(tri(spark, rows), shapes_from_graph(iter_turtle(SHAPES_TTL)))
        return {(r.shape_id, r.focus, r.path, r.constraint, r.value)
                for r in df.collect()}

    def test_conforming_person_is_clean(self, spark):
        rows = person("p1", "Alice") + person("p2", "Bob", knows=["urn:ex:p1"])
        assert self.report(spark, rows) == set()
        assert conforms(tri(spark, rows),
                        shapes_from_graph(iter_turtle(SHAPES_TTL)))

    def test_min_count_zero_case(self, spark):
        # p1 has NO ex:name triple at all: the zero-count row must still
        # appear (left join from the expectation relation, not a scan)
        rows = person("p1")
        assert ("urn:ex:PersonShape", "urn:ex:p1", "urn:ex:name",
                "minCount", "0") in self.report(spark, rows)

    def test_max_count(self, spark):
        rows = person("p1", "Alice") + [
            ("urn:ex:p1", "urn:ex:name", "Alias", "literal", None)]
        assert ("urn:ex:PersonShape", "urn:ex:p1", "urn:ex:name",
                "maxCount", "2") in self.report(spark, rows)

    def test_node_kind(self, spark):
        rows = person("p1", "Alice") + [
            ("urn:ex:p1", "urn:ex:knows", "just text", "literal", None)]
        got = self.report(spark, rows)
        assert ("urn:ex:PersonShape", "urn:ex:p1", "urn:ex:knows",
                "nodeKind", "just text") in got
        # a literal can also never be a SHACL instance of ex:Person
        assert ("urn:ex:PersonShape", "urn:ex:p1", "urn:ex:knows",
                "class", "just text") in got

    def test_pattern(self, spark):
        rows = person("p1", "Alice") + [
            ("urn:ex:p1", "urn:ex:id", "Q77", "literal", None)]
        assert ("urn:ex:PersonShape", "urn:ex:p1", "urn:ex:id",
                "pattern", "Q77") in self.report(spark, rows)

    def test_class_requires_direct_type(self, spark):
        rows = person("p1", "Alice", knows=["urn:ex:ghost"])
        assert ("urn:ex:PersonShape", "urn:ex:p1", "urn:ex:knows",
                "class", "urn:ex:ghost") in self.report(spark, rows)

    def test_in_list(self, spark):
        rows = [("urn:ex:t1", "urn:ex:tag", "mauve", "literal", None),
                ("urn:ex:t1", "urn:ex:status", "active", "literal", None)]
        got = self.report(spark, rows)
        assert ("urn:ex:TagShape", "urn:ex:t1", "urn:ex:tag",
                "in", "mauve") in got

    def test_has_value_missing(self, spark):
        rows = [("urn:ex:t1", "urn:ex:tag", "red", "literal", None),
                ("urn:ex:t1", "urn:ex:status", "retired", "literal", None)]
        assert ("urn:ex:TagShape", "urn:ex:t1", "urn:ex:status",
                "hasValue", "1") in self.report(spark, rows)

    def test_language_in_and_unique_lang(self, spark):
        rows = [("urn:ex:t1", "urn:ex:tag", "red", "literal", None),
                ("urn:ex:t1", "urn:ex:status", "active", "literal", None),
                ("urn:ex:t1", "urn:ex:label", "rood", "literal", "nl"),
                ("urn:ex:t1", "urn:ex:label", "red", "literal", "en"),
                ("urn:ex:t1", "urn:ex:label", "crimson", "literal", "en"),
                ("urn:ex:t1", "urn:ex:label", "rouge", "literal", "fr")]
        got = self.report(spark, rows)
        assert ("urn:ex:TagShape", "urn:ex:t1", "urn:ex:label",
                "languageIn", "rouge") in got
        assert ("urn:ex:TagShape", "urn:ex:t1", "urn:ex:label",
                "uniqueLang", "en") in got
        # the lang-less literal model: an untagged label also violates
        rows2 = rows[:2] + [
            ("urn:ex:t1", "urn:ex:label", "plain", "literal", None)]
        assert ("urn:ex:TagShape", "urn:ex:t1", "urn:ex:label",
                "languageIn", "plain") in self.report(spark, rows2)

    def test_dict_shapes_and_unknown_key_raises(self, spark):
        rows = person("p1", "Alice")
        shapes = [{"id": "urn:s", "target_class": "urn:ex:Person",
                   "properties": [{"path": "urn:ex:name", "min_count": 1}]}]
        assert validate(tri(spark, rows), shapes).count() == 0
        bad = [{"id": "urn:s", "target_class": "urn:ex:Person",
                "properties": [{"path": "urn:ex:name", "sparql": "..."}]}]
        with pytest.raises(ShaclUnsupported, match="sparql"):
            validate(tri(spark, rows), bad)

    def test_focus_isolation_between_shapes(self, spark):
        # a subject that is target of TagShape only must not be checked
        # against PersonShape's constraints (no phantom minCount rows)
        rows = [("urn:ex:t9", "urn:ex:tag", "red", "literal", None),
                ("urn:ex:t9", "urn:ex:status", "active", "literal", None)]
        got = self.report(spark, rows)
        assert not any(sid == "urn:ex:PersonShape" for sid, *_ in got)


PAIR_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <urn:ex:> .

ex:EventShape a sh:NodeShape ;
  sh:targetClass ex:Event ;
  sh:property [ sh:path ex:start ; sh:lessThan ex:end ] ;
  sh:property [ sh:path ex:code ; sh:minLength 3 ; sh:maxLength 5 ;
                sh:equals ex:alias ] ;
  sh:property [ sh:path ex:draftTag ; sh:disjoint ex:tag ] ;
  sh:property [ sh:path ex:seq ; sh:lessThanOrEquals ex:cap ] ;
  sh:property [ sh:path ex:ref ; sh:nodeKind sh:BlankNodeOrIRI ] .

ex:PinnedShape a sh:NodeShape ;
  sh:targetNode ex:pinned ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .

ex:UsedShape a sh:NodeShape ;
  sh:targetObjectsOf ex:uses ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
"""


class TestExtendedConstraints:
    def report(self, spark, rows, ttl=PAIR_TTL):
        df = validate(tri(spark, rows), shapes_from_graph(iter_turtle(ttl)))
        return {(r.shape_id, r.focus, r.path, r.constraint, r.value)
                for r in df.collect()}

    def ev(self, extra):
        return [("urn:ex:e1", RDF_TYPE, "urn:ex:Event", "uri", None)] + [
            ("urn:ex:e1", "urn:ex:" + p, v, k, None) for p, v, k in extra]

    def test_parses_new_keys(self):
        shapes = {s["id"]: s for s in shapes_from_graph(iter_turtle(PAIR_TTL))}
        props = {p["path"]: p
                 for p in shapes["urn:ex:EventShape"]["properties"]}
        assert props["urn:ex:start"]["less_than"] == "urn:ex:end"
        assert props["urn:ex:code"]["min_length"] == 3
        assert props["urn:ex:code"]["max_length"] == 5
        assert props["urn:ex:code"]["equals"] == "urn:ex:alias"
        assert props["urn:ex:draftTag"]["disjoint"] == "urn:ex:tag"
        assert props["urn:ex:seq"]["less_than_or_equals"] == "urn:ex:cap"
        assert props["urn:ex:ref"]["node_kind"] == ("bnode", "uri")
        assert shapes["urn:ex:PinnedShape"]["target_node"] == ["urn:ex:pinned"]
        assert (shapes["urn:ex:UsedShape"]["target_objects_of"]
                == "urn:ex:uses")

    def test_conforming_event_is_clean(self, spark):
        rows = self.ev([("start", "a", "literal"), ("end", "b", "literal"),
                        ("code", "ABC", "literal"),
                        ("alias", "ABC", "literal"),
                        ("draftTag", "x", "literal"), ("tag", "y", "literal"),
                        ("seq", "5", "literal"), ("cap", "5", "literal"),
                        ("ref", "urn:ex:other", "uri")]) + [
            # PinnedShape's targetNode is ALWAYS in focus — satisfy it
            ("urn:ex:pinned", "urn:ex:name", "pin", "literal", None)]
        assert self.report(spark, rows) == set()

    def test_less_than_flags_each_bad_pair(self, spark):
        rows = self.ev([("start", "b", "literal"), ("end", "a", "literal"),
                        ("end", "b", "literal")])
        got = self.report(spark, rows)
        # 'b' < 'a' fails and 'b' < 'b' fails -> the pair loop reports per
        # offending pair, both carried as value 'b'
        assert ("urn:ex:EventShape", "urn:ex:e1", "urn:ex:start",
                "lessThan", "b") in got

    def test_less_than_or_equals(self, spark):
        rows = self.ev([("seq", "7", "literal"), ("cap", "5", "literal")])
        assert ("urn:ex:EventShape", "urn:ex:e1", "urn:ex:seq",
                "lessThanOrEquals", "7") in self.report(spark, rows)
        rows_ok = self.ev([("seq", "5", "literal"), ("cap", "5", "literal")])
        assert not any(c == "lessThanOrEquals" for *_, c, _v
                       in self.report(spark, rows_ok))

    def test_equals_both_directions(self, spark):
        rows = self.ev([("code", "ABC", "literal"),
                        ("alias", "ABD", "literal")])
        got = self.report(spark, rows)
        # ABC missing from alias AND ABD missing from code — both reported
        # on the declaring path
        assert ("urn:ex:EventShape", "urn:ex:e1", "urn:ex:code",
                "equals", "ABC") in got
        assert ("urn:ex:EventShape", "urn:ex:e1", "urn:ex:code",
                "equals", "ABD") in got

    def test_disjoint(self, spark):
        rows = self.ev([("draftTag", "shared", "literal"),
                        ("tag", "shared", "literal")])
        assert ("urn:ex:EventShape", "urn:ex:e1", "urn:ex:draftTag",
                "disjoint", "shared") in self.report(spark, rows)

    def test_min_max_length(self, spark):
        rows = self.ev([("code", "AB", "literal")])
        assert ("urn:ex:EventShape", "urn:ex:e1", "urn:ex:code",
                "minLength", "AB") in self.report(spark, rows)
        rows2 = self.ev([("code", "ABCDEF", "literal"),
                         ("alias", "ABCDEF", "literal")])
        assert ("urn:ex:EventShape", "urn:ex:e1", "urn:ex:code",
                "maxLength", "ABCDEF") in self.report(spark, rows2)

    def test_node_kind_union(self, spark):
        rows = self.ev([("ref", "_:b1", "bnode"),
                        ("ref", "plain", "literal")])
        got = self.report(spark, rows)
        assert ("urn:ex:EventShape", "urn:ex:e1", "urn:ex:ref",
                "nodeKind", "plain") in got
        assert not any(v == "_:b1" for *_, v in got)

    def test_target_node_zero_count(self, spark):
        # ex:pinned never appears in the data: targetNode must still put
        # it in focus and flag the missing ex:name
        rows = [("urn:ex:other", "urn:ex:name", "x", "literal", None)]
        assert ("urn:ex:PinnedShape", "urn:ex:pinned", "urn:ex:name",
                "minCount", "0") in self.report(spark, rows)

    def test_target_objects_of(self, spark):
        rows = [("urn:ex:a", "urn:ex:uses", "urn:ex:tool", "uri", None)]
        assert ("urn:ex:UsedShape", "urn:ex:tool", "urn:ex:name",
                "minCount", "0") in self.report(spark, rows)

    def test_multi_target_focus_counted_once(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s> a sh:NodeShape ; sh:targetClass <urn:ex:Person> ;
          sh:targetSubjectsOf <urn:ex:name> ;
          sh:property [ sh:path <urn:ex:name> ; sh:maxCount 1 ] ."""
        # p1 matches BOTH targets; its single name must count once (no
        # phantom maxCount from duplicated focus rows)
        rows = person("p1", "Alice")
        assert self.report(spark, rows, ttl) == set()


PATHS_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <urn:ex:> .

ex:TeamShape a sh:NodeShape ;
  sh:targetClass ex:Team ;
  sh:property [ sh:path [ sh:inversePath ex:member ] ; sh:minCount 2 ] .

ex:SeqShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ( ex:worksFor ex:name ) ; sh:minCount 1 ;
                sh:nodeKind sh:Literal ] .

ex:AltShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path [ sh:alternativePath ( ex:phone ex:email ) ] ;
                sh:minCount 1 ] .

ex:ChainShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path [ sh:oneOrMorePath ex:boss ] ; sh:maxCount 2 ] .

ex:RootedShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path [ sh:zeroOrMorePath ex:boss ] ; sh:minCount 1 ] .
"""


class TestPropertyPaths:
    def report(self, spark, rows, ttl=PATHS_TTL):
        df = validate(tri(spark, rows), shapes_from_graph(iter_turtle(ttl)))
        return {(r.shape_id, r.focus, r.path, r.constraint, r.value)
                for r in df.collect()}

    def test_parses_path_structures(self):
        shapes = {s["id"]: s
                  for s in shapes_from_graph(iter_turtle(PATHS_TTL))}
        path_of = {sid: s["properties"][0]["path"]
                   for sid, s in shapes.items()}
        assert path_of["urn:ex:TeamShape"] == "^urn:ex:member"
        assert path_of["urn:ex:SeqShape"] == "urn:ex:worksFor/urn:ex:name"
        assert path_of["urn:ex:AltShape"] == "urn:ex:phone|urn:ex:email"
        assert path_of["urn:ex:ChainShape"] == "urn:ex:boss+"
        assert path_of["urn:ex:RootedShape"] == "urn:ex:boss*"
        expr = shapes["urn:ex:SeqShape"]["properties"][0]["path_expr"]
        assert expr == ("seq", (("iri", "urn:ex:worksFor"),
                                ("iri", "urn:ex:name")))

    def test_inverse_path_counts_incoming(self, spark):
        rows = [
            ("urn:ex:t1", RDF_TYPE, "urn:ex:Team", "uri", None),
            ("urn:ex:t2", RDF_TYPE, "urn:ex:Team", "uri", None),
            ("urn:ex:a", "urn:ex:member", "urn:ex:t1", "uri", None),
            ("urn:ex:b", "urn:ex:member", "urn:ex:t1", "uri", None),
            ("urn:ex:c", "urn:ex:member", "urn:ex:t2", "uri", None),
        ]
        got = self.report(spark, rows)
        assert ("urn:ex:TeamShape", "urn:ex:t2", "^urn:ex:member",
                "minCount", "1") in got
        assert not any(f == "urn:ex:t1" for _, f, *_ in got)

    def test_sequence_path_walks_two_hops(self, spark):
        rows = [
            ("urn:ex:p1", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p1", "urn:ex:worksFor", "urn:ex:acme", "uri", None),
            ("urn:ex:acme", "urn:ex:name", "Acme", "literal", None),
            ("urn:ex:p2", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p2", "urn:ex:worksFor", "urn:ex:shell", "uri", None),
            # shell has no name: p2's path value set is empty
        ]
        got = {v for v in self.report(spark, rows)
               if v[0] == "urn:ex:SeqShape"}
        assert ("urn:ex:SeqShape", "urn:ex:p2",
                "urn:ex:worksFor/urn:ex:name", "minCount", "0") in got
        assert not any(f == "urn:ex:p1" for _, f, *_ in got)

    def test_alternative_path_unions_value_sets(self, spark):
        rows = [
            ("urn:ex:p1", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p1", "urn:ex:phone", "123", "literal", None),
            ("urn:ex:p2", RDF_TYPE, "urn:ex:Person", "uri", None),
        ]
        got = {v for v in self.report(spark, rows)
               if v[0] == "urn:ex:AltShape"}
        assert got == {("urn:ex:AltShape", "urn:ex:p2",
                        "urn:ex:phone|urn:ex:email", "minCount", "0")}

    def test_one_or_more_counts_distinct_nodes_through_cycle(self, spark):
        # a->b->c->a: from a the closure reaches {b, c, a} = 3 distinct
        # value NODES (each once, despite infinitely many walks) > max 2
        rows = [
            ("urn:ex:a", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:b", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:c", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:a", "urn:ex:boss", "urn:ex:b", "uri", None),
            ("urn:ex:b", "urn:ex:boss", "urn:ex:c", "uri", None),
            ("urn:ex:c", "urn:ex:boss", "urn:ex:a", "uri", None),
            ("urn:ex:solo", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:solo", "urn:ex:boss", "urn:ex:root", "uri", None),
        ]
        got = {v for v in self.report(spark, rows)
               if v[0] == "urn:ex:ChainShape"}
        assert got == {
            ("urn:ex:ChainShape", "urn:ex:a", "urn:ex:boss+",
             "maxCount", "3"),
            ("urn:ex:ChainShape", "urn:ex:b", "urn:ex:boss+",
             "maxCount", "3"),
            ("urn:ex:ChainShape", "urn:ex:c", "urn:ex:boss+",
             "maxCount", "3"),
        }

    def test_zero_or_more_includes_focus_itself(self, spark):
        # no boss at all: the empty walk makes the focus its own value
        # node, so minCount 1 holds
        rows = [("urn:ex:solo", RDF_TYPE, "urn:ex:Person", "uri", None)]
        got = {v for v in self.report(spark, rows)
               if v[0] == "urn:ex:RootedShape"}
        assert got == set()

    def test_nested_zero_or_one_in_sequence(self, spark):
        # worksFor/(parent?) : values are the company AND its parent;
        # with no parent the zero branch keeps the company itself
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        @prefix ex: <urn:ex:> .
        ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
          sh:property [ sh:path ( ex:worksFor [ sh:zeroOrOnePath ex:parent ] ) ;
                        sh:minCount 2 ] ."""
        rows = [
            ("urn:ex:p1", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p1", "urn:ex:worksFor", "urn:ex:acme", "uri", None),
            ("urn:ex:acme", "urn:ex:parent", "urn:ex:mega", "uri", None),
            ("urn:ex:p2", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p2", "urn:ex:worksFor", "urn:ex:indie", "uri", None),
        ]
        got = self.report(spark, rows, ttl)
        # p1: {acme, mega} = 2 ok; p2: {indie} = 1 < 2
        assert got == {("urn:ex:S", "urn:ex:p2",
                        "urn:ex:worksFor/(urn:ex:parent?)",
                        "minCount", "1")}


NODE_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <urn:ex:> .

ex:PersonShape2 a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:knows ; sh:node ex:FriendShape ] .

ex:FriendShape a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
"""


class TestShNode:
    def report(self, spark, rows, ttl=NODE_TTL):
        df = validate(tri(spark, rows), shapes_from_graph(iter_turtle(ttl)))
        return {(r.shape_id, r.focus, r.path, r.constraint, r.value)
                for r in df.collect()}

    def test_parses_library_shape_without_target(self):
        shapes = {s["id"]: s
                  for s in shapes_from_graph(iter_turtle(NODE_TTL))}
        outer = shapes["urn:ex:PersonShape2"]
        assert outer["properties"][0]["node"] == "urn:ex:FriendShape"
        assert "target_class" not in shapes["urn:ex:FriendShape"]

    def test_value_node_must_conform(self, spark):
        rows = [
            ("urn:ex:p1", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p1", "urn:ex:knows", "urn:ex:named", "uri", None),
            ("urn:ex:p1", "urn:ex:knows", "urn:ex:anon", "uri", None),
            ("urn:ex:named", "urn:ex:name", "N", "literal", None),
        ]
        got = self.report(spark, rows)
        # one 'node' row for the non-conforming value; inner violations
        # are silent and the library shape contributes no rows itself
        assert got == {("urn:ex:PersonShape2", "urn:ex:p1", "urn:ex:knows",
                        "node", "urn:ex:anon")}

    def test_conforming_values_are_clean(self, spark):
        rows = [
            ("urn:ex:p1", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p1", "urn:ex:knows", "urn:ex:named", "uri", None),
            ("urn:ex:named", "urn:ex:name", "N", "literal", None),
        ]
        assert self.report(spark, rows) == set()

    def test_nested_node_recursion(self, spark):
        ttl = NODE_TTL + """
ex:FriendShape sh:property [ sh:path ex:employer ;
                             sh:node ex:OrgShape ] .
ex:OrgShape a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
"""
        rows = [
            ("urn:ex:p1", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p1", "urn:ex:knows", "urn:ex:f", "uri", None),
            ("urn:ex:f", "urn:ex:name", "F", "literal", None),
            ("urn:ex:f", "urn:ex:employer", "urn:ex:shadyco", "uri", None),
            # shadyco has no name: f fails FriendShape via ITS sh:node,
            # so p1 fails PersonShape2
        ]
        got = self.report(spark, rows, ttl)
        assert got == {("urn:ex:PersonShape2", "urn:ex:p1", "urn:ex:knows",
                        "node", "urn:ex:f")}

    def test_cyclic_node_reference_raises(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        @prefix ex: <urn:ex:> .
        ex:A a sh:NodeShape ; sh:targetClass ex:T ;
          sh:property [ sh:path ex:p ; sh:node ex:B ] .
        ex:B a sh:NodeShape ;
          sh:property [ sh:path ex:q ; sh:node ex:A ] ."""
        rows = [("urn:ex:x", RDF_TYPE, "urn:ex:T", "uri", None),
                ("urn:ex:x", "urn:ex:p", "urn:ex:y", "uri", None)]
        with pytest.raises(ShaclUnsupported, match="cyclic sh:node"):
            validate(tri(spark, rows),
                     shapes_from_graph(iter_turtle(ttl))).collect()

    def test_unknown_node_reference_raises(self, spark):
        shapes = [{"id": "urn:s", "target_class": "urn:ex:T",
                   "properties": [{"path": "urn:p", "node": "urn:ghost"}]}]
        rows = [("urn:ex:x", RDF_TYPE, "urn:ex:T", "uri", None)]
        with pytest.raises(ShaclUnsupported, match="unknown shape"):
            validate(tri(spark, rows), shapes).collect()

    def test_orphan_targetless_shape_still_raises(self):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s> a sh:NodeShape ;
          sh:property [ sh:path <urn:p> ; sh:minCount 1 ] ."""
        with pytest.raises(ShaclUnsupported, match="no target"):
            shapes_from_graph(iter_turtle(ttl))


class TestLogicalConstraints:
    def report(self, spark, rows, ttl):
        df = validate(tri(spark, rows), shapes_from_graph(iter_turtle(ttl)))
        return {(r.shape_id, r.focus, r.path, r.constraint, r.value)
                for r in df.collect()}

    OR_TTL = """@prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <urn:ex:> .
    ex:Reachable a sh:NodeShape ; sh:targetClass ex:Person ;
      sh:or ( [ sh:path ex:phone ; sh:minCount 1 ]
              [ sh:path ex:email ; sh:minCount 1 ] ) ."""

    def test_or_requires_at_least_one_branch(self, spark):
        rows = [
            ("urn:ex:p1", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p1", "urn:ex:phone", "123", "literal", None),
            ("urn:ex:p2", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p2", "urn:ex:email", "a@b", "literal", None),
            ("urn:ex:p3", RDF_TYPE, "urn:ex:Person", "uri", None),
        ]
        got = self.report(spark, rows, self.OR_TTL)
        assert got == {("urn:ex:Reachable", "urn:ex:p3", "",
                        "or", "urn:ex:p3")}

    def test_and_requires_every_branch(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        @prefix ex: <urn:ex:> .
        ex:Full a sh:NodeShape ; sh:targetClass ex:Person ;
          sh:and ( [ sh:path ex:phone ; sh:minCount 1 ]
                   [ sh:path ex:email ; sh:minCount 1 ] ) ."""
        rows = [
            ("urn:ex:p1", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p1", "urn:ex:phone", "123", "literal", None),
            ("urn:ex:p1", "urn:ex:email", "a@b", "literal", None),
            ("urn:ex:p2", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p2", "urn:ex:phone", "456", "literal", None),
        ]
        got = self.report(spark, rows, ttl)
        assert got == {("urn:ex:Full", "urn:ex:p2", "",
                        "and", "urn:ex:p2")}

    def test_not_flags_conforming_focus(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        @prefix ex: <urn:ex:> .
        ex:Live a sh:NodeShape ; sh:targetClass ex:Person ;
          sh:not [ sh:path ex:deprecated ; sh:minCount 1 ] ."""
        rows = [
            ("urn:ex:p1", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p1", "urn:ex:deprecated", "yes", "literal", None),
            ("urn:ex:p2", RDF_TYPE, "urn:ex:Person", "uri", None),
        ]
        got = self.report(spark, rows, ttl)
        assert got == {("urn:ex:Live", "urn:ex:p1", "",
                        "not", "urn:ex:p1")}

    def test_named_shape_operand(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        @prefix ex: <urn:ex:> .
        ex:Main a sh:NodeShape ; sh:targetClass ex:Person ;
          sh:or ( ex:HasName [ sh:path ex:alias ; sh:minCount 1 ] ) .
        ex:HasName a sh:NodeShape ;
          sh:property [ sh:path ex:name ; sh:minCount 1 ] ."""
        rows = [
            ("urn:ex:p1", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p1", "urn:ex:name", "N", "literal", None),
            ("urn:ex:p2", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p2", "urn:ex:alias", "A", "literal", None),
            ("urn:ex:p3", RDF_TYPE, "urn:ex:Person", "uri", None),
        ]
        got = self.report(spark, rows, ttl)
        assert got == {("urn:ex:Main", "urn:ex:p3", "",
                        "or", "urn:ex:p3")}

    def test_cyclic_logical_reference_raises(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        @prefix ex: <urn:ex:> .
        ex:A a sh:NodeShape ; sh:targetClass ex:T ;
          sh:not ex:B .
        ex:B a sh:NodeShape ; sh:not ex:A ."""
        rows = [("urn:ex:x", RDF_TYPE, "urn:ex:T", "uri", None)]
        with pytest.raises(ShaclUnsupported, match="cyclic sh:not"):
            validate(tri(spark, rows),
                     shapes_from_graph(iter_turtle(ttl))).collect()


QUAD_SCHEMA = ("context string, subj string, pred string, "
               "obj_value string, obj_kind string, obj_lang string")


class TestPerGraphValidation:
    def report(self, spark, rows, ttl):
        df = validate(spark.createDataFrame(rows, QUAD_SCHEMA),
                      shapes_from_graph(iter_turtle(ttl)), per_graph=True)
        return {(r.graph, r.focus, r.path, r.constraint, r.value)
                for r in df.collect()}

    MIN_TTL = """@prefix sh: <http://www.w3.org/ns/shacl#> .
    <urn:S> a sh:NodeShape ; sh:targetClass <urn:P> ;
      sh:property [ sh:path <urn:name> ; sh:minCount 1 ] ."""

    def test_verdicts_are_per_graph(self, spark):
        rows = [
            ("urn:g1", "urn:a", RDF_TYPE, "urn:P", "uri", None),
            ("urn:g1", "urn:a", "urn:name", "A", "literal", None),
            ("urn:g2", "urn:a", RDF_TYPE, "urn:P", "uri", None),
            (None, "urn:b", RDF_TYPE, "urn:P", "uri", None),
        ]
        # the SAME node conforms in g1 (named there) and fails in g2;
        # the default graph reports with graph NULL
        got = self.report(spark, rows, self.MIN_TTL)
        assert got == {
            ("urn:g2", "urn:a", "urn:name", "minCount", "0"),
            (None, "urn:b", "urn:name", "minCount", "0")}

    def test_counts_never_cross_graphs(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:S> a sh:NodeShape ; sh:targetClass <urn:P> ;
          sh:property [ sh:path <urn:name> ; sh:maxCount 1 ] ."""
        rows = [
            ("urn:g1", "urn:a", RDF_TYPE, "urn:P", "uri", None),
            ("urn:g1", "urn:a", "urn:name", "A", "literal", None),
            ("urn:g2", "urn:a", RDF_TYPE, "urn:P", "uri", None),
            ("urn:g2", "urn:a", "urn:name", "B", "literal", None),
        ]
        # one name in each graph: 1+1 must NOT add up to a maxCount hit
        assert self.report(spark, rows, ttl) == set()

    def test_structured_path_confined_per_graph(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:S> a sh:NodeShape ; sh:targetClass <urn:P> ;
          sh:property [ sh:path [ sh:inversePath <urn:member> ] ;
                        sh:minCount 1 ] ."""
        rows = [
            ("urn:g1", "urn:t", RDF_TYPE, "urn:P", "uri", None),
            ("urn:g1", "urn:m", "urn:member", "urn:t", "uri", None),
            ("urn:g2", "urn:t", RDF_TYPE, "urn:P", "uri", None),
        ]
        got = self.report(spark, rows, ttl)
        assert got == {("urn:g2", "urn:t", "^urn:member",
                        "minCount", "0")}

    def test_sh_node_per_graph(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:S> a sh:NodeShape ; sh:targetClass <urn:P> ;
          sh:property [ sh:path <urn:knows> ; sh:node <urn:Lib> ] .
        <urn:Lib> a sh:NodeShape ;
          sh:property [ sh:path <urn:name> ; sh:minCount 1 ] ."""
        rows = [
            ("urn:g1", "urn:p", RDF_TYPE, "urn:P", "uri", None),
            ("urn:g1", "urn:p", "urn:knows", "urn:f", "uri", None),
            ("urn:g1", "urn:f", "urn:name", "F", "literal", None),
            ("urn:g2", "urn:p", RDF_TYPE, "urn:P", "uri", None),
            ("urn:g2", "urn:p", "urn:knows", "urn:f", "uri", None),
            # f is named in g1 only: the sh:node verdict flips per graph
        ]
        got = self.report(spark, rows, ttl)
        assert got == {("urn:g2", "urn:p", "urn:knows",
                        "node", "urn:f")}

    def test_requires_quad_relation(self, spark):
        rows = [("urn:a", RDF_TYPE, "urn:P", "uri", None)]
        with pytest.raises(ShaclUnsupported, match="context"):
            validate(tri(spark, rows),
                     shapes_from_graph(iter_turtle(self.MIN_TTL)),
                     per_graph=True)


class TestXone:
    def test_exactly_one_branch_must_conform(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        @prefix ex: <urn:ex:> .
        ex:OneId a sh:NodeShape ; sh:targetClass ex:Person ;
          sh:xone ( [ sh:path ex:ssn ; sh:minCount 1 ]
                    [ sh:path ex:passport ; sh:minCount 1 ] ) ."""
        rows = [
            ("urn:ex:p1", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p1", "urn:ex:ssn", "1", "literal", None),
            ("urn:ex:p2", RDF_TYPE, "urn:ex:Person", "uri", None),
            ("urn:ex:p2", "urn:ex:ssn", "2", "literal", None),
            ("urn:ex:p2", "urn:ex:passport", "X", "literal", None),
            ("urn:ex:p3", RDF_TYPE, "urn:ex:Person", "uri", None),
        ]
        df = validate(tri(spark, rows), shapes_from_graph(iter_turtle(ttl)))
        got = {(r.focus, r.constraint) for r in df.collect()}
        # p1 conforms to exactly one branch; p2 to both; p3 to none
        assert got == {("urn:ex:p2", "xone"), ("urn:ex:p3", "xone")}


class TestQualifiedValueShape:
    TTL = """@prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <urn:ex:> .
    ex:TeamQ a sh:NodeShape ; sh:targetClass ex:Team ;
      sh:property [ sh:path ex:member ;
                    sh:qualifiedValueShape ex:Senior ;
                    sh:qualifiedMinCount 1 ;
                    sh:qualifiedMaxCount 2 ] .
    ex:Senior a sh:NodeShape ;
      sh:property [ sh:path ex:grade ; sh:hasValue "senior" ;
                    sh:minCount 1 ] ."""

    def _run(self, spark, rows):
        df = validate(tri(spark, rows),
                      shapes_from_graph(iter_turtle(self.TTL)))
        return {(r.focus, r.constraint, r.value) for r in df.collect()}

    def _team(self, team, members):
        rows = [("urn:ex:%s" % team, RDF_TYPE, "urn:ex:Team",
                 "uri", None)]
        for m, senior in members:
            rows.append(("urn:ex:%s" % team, "urn:ex:member",
                         "urn:ex:%s" % m, "uri", None))
            if senior:
                rows.append(("urn:ex:%s" % m, "urn:ex:grade", "senior",
                             "literal", None))
        return rows

    def test_counts_only_conforming_values(self, spark):
        rows = (self._team("ok", [("a", True), ("b", False)])
                + self._team("none", [("c", False), ("d", False)])
                + self._team("many", [("e", True), ("f", True),
                                      ("g", True)]))
        got = self._run(spark, rows)
        assert got == {
            ("urn:ex:none", "qualifiedMinCount", "0"),
            ("urn:ex:many", "qualifiedMaxCount", "3")}

    def test_zero_values_focus_still_reported(self, spark):
        rows = [("urn:ex:empty", RDF_TYPE, "urn:ex:Team", "uri", None)]
        assert self._run(spark, rows) == {
            ("urn:ex:empty", "qualifiedMinCount", "0")}

    def test_qualified_without_counts_raises(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s> a sh:NodeShape ; sh:targetClass <urn:T> ;
          sh:property [ sh:path <urn:p> ;
                        sh:qualifiedValueShape <urn:s2> ] .
        <urn:s2> a sh:NodeShape ;
          sh:property [ sh:path <urn:q> ; sh:minCount 1 ] ."""
        rows = [("urn:x", RDF_TYPE, "urn:T", "uri", None)]
        with pytest.raises(ShaclUnsupported, match="qualifiedMinCount"):
            validate(tri(spark, rows),
                     shapes_from_graph(iter_turtle(ttl))).collect()


SH = "http://www.w3.org/ns/shacl#"


class TestClosed:
    """sh:closed + sh:ignoredProperties (ClosedConstraintComponent)."""

    TTL = """@prefix sh: <http://www.w3.org/ns/shacl#> .
    <urn:s:C> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:name> ;
      sh:closed true ;
      sh:ignoredProperties ( <urn:p:meta> ) ;
      sh:property [ sh:path <urn:p:name> ; sh:minCount 1 ] ."""

    def _run(self, spark, rows, ttl=None):
        rep = validate(tri(spark, rows),
                       shapes_from_graph(iter_turtle(ttl or self.TTL)))
        return {(r.focus, r.path, r.constraint, r.value)
                for r in rep.collect()}

    def test_unlisted_predicate_violates(self, spark):
        rows = [("urn:a", "urn:p:name", "A", "literal", None),
                ("urn:a", "urn:p:rogue", "x", "literal", None)]
        assert self._run(spark, rows) == {
            ("urn:a", "urn:p:rogue", "closed", "x")}

    def test_declared_and_ignored_predicates_conform(self, spark):
        rows = [("urn:a", "urn:p:name", "A", "literal", None),
                ("urn:a", "urn:p:meta", "m", "literal", None)]
        assert self._run(spark, rows) == set()

    def test_one_violation_per_offending_triple(self, spark):
        rows = [("urn:a", "urn:p:name", "A", "literal", None),
                ("urn:a", "urn:p:rogue", "x", "literal", None),
                ("urn:a", "urn:p:rogue", "y", "literal", None),
                ("urn:a", "urn:p:other", "z", "uri", None)]
        assert self._run(spark, rows) == {
            ("urn:a", "urn:p:rogue", "closed", "x"),
            ("urn:a", "urn:p:rogue", "closed", "y"),
            ("urn:a", "urn:p:other", "closed", "z")}

    def test_complex_paths_open_nothing(self, spark):
        # a sequence-path property does NOT add its first step to the
        # allowed set (SHACL 4.8.1: only IRI sh:path values count)
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s:C> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:name> ;
          sh:closed true ;
          sh:property [ sh:path <urn:p:name> ; sh:minCount 1 ] ;
          sh:property [ sh:path ( <urn:p:via> <urn:p:name> ) ;
                        sh:maxCount 99 ] ."""
        rows = [("urn:a", "urn:p:name", "A", "literal", None),
                ("urn:a", "urn:p:via", "urn:b", "uri", None),
                ("urn:b", "urn:p:name", "B", "literal", None)]
        got = self._run(spark, rows, ttl)
        assert got == {("urn:a", "urn:p:via", "closed", "urn:b")}

    def test_non_closed_shape_unaffected(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s:C> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:name> ;
          sh:property [ sh:path <urn:p:name> ; sh:minCount 1 ] ."""
        rows = [("urn:a", "urn:p:name", "A", "literal", None),
                ("urn:a", "urn:p:rogue", "x", "literal", None)]
        assert self._run(spark, rows, ttl) == set()


class TestRanges:
    """sh:minInclusive / maxInclusive / minExclusive / maxExclusive."""

    def _run(self, spark, rows, constraint):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s:R> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:v> ;
          sh:property [ sh:path <urn:p:v> ; sh:%s 10 ] .""" % constraint
        rep = validate(tri(spark, rows),
                       shapes_from_graph(iter_turtle(ttl)))
        return {(r.focus, r.constraint, r.value) for r in rep.collect()}

    def test_min_inclusive(self, spark):
        rows = [("urn:a", "urn:p:v", "10", "literal", None),
                ("urn:b", "urn:p:v", "9.5", "literal", None)]
        assert self._run(spark, rows, "minInclusive") == {
            ("urn:b", "minInclusive", "9.5")}

    def test_max_inclusive(self, spark):
        rows = [("urn:a", "urn:p:v", "10", "literal", None),
                ("urn:b", "urn:p:v", "10.5", "literal", None)]
        assert self._run(spark, rows, "maxInclusive") == {
            ("urn:b", "maxInclusive", "10.5")}

    def test_exclusive_bounds_reject_the_bound(self, spark):
        rows = [("urn:a", "urn:p:v", "10", "literal", None),
                ("urn:b", "urn:p:v", "11", "literal", None)]
        assert self._run(spark, rows, "minExclusive") == {
            ("urn:a", "minExclusive", "10")}
        assert self._run(spark, rows, "maxExclusive") == {
            ("urn:a", "maxExclusive", "10"),
            ("urn:b", "maxExclusive", "11")}

    def test_non_numeric_and_non_literal_values_violate(self, spark):
        # error-as-NULL coercion: unparsable lexical forms and IRI value
        # nodes fail the comparison, they never raise
        rows = [("urn:a", "urn:p:v", "abc", "literal", None),
                ("urn:b", "urn:p:v", "urn:x", "uri", None),
                ("urn:c", "urn:p:v", "12", "literal", None)]
        assert self._run(spark, rows, "minInclusive") == {
            ("urn:a", "minInclusive", "abc"),
            ("urn:b", "minInclusive", "urn:x")}


class TestDeactivatedAndSeverity:
    def test_deactivated_shape_validates_nothing(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s:Off> a sh:NodeShape ; sh:deactivated true ;
          sh:targetSubjectsOf <urn:p:name> ;
          sh:property [ sh:path <urn:p:name> ; sh:maxCount 0 ] ."""
        rows = [("urn:a", "urn:p:name", "A", "literal", None)]
        rep = validate(tri(spark, rows),
                       shapes_from_graph(iter_turtle(ttl)))
        assert rep.count() == 0

    def test_deactivated_targetless_shape_parses(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s:Live> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:n> ;
          sh:property [ sh:path <urn:p:n> ; sh:minCount 1 ] .
        <urn:s:Off> a sh:NodeShape ; sh:deactivated true ;
          sh:property [ sh:path <urn:p:n> ; sh:maxCount 0 ] ."""
        shapes_from_graph(iter_turtle(ttl))  # no "declares no target"

    def test_deactivated_property_shape_skipped(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s:P> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:name> ;
          sh:property [ sh:path <urn:p:name> ; sh:maxCount 0 ;
                        sh:deactivated true ] ;
          sh:property [ sh:path <urn:p:id> ; sh:minCount 1 ] ."""
        rows = [("urn:a", "urn:p:name", "A", "literal", None)]
        rep = validate(tri(spark, rows),
                       shapes_from_graph(iter_turtle(ttl)))
        got = {(r.focus, r.constraint) for r in rep.collect()}
        assert got == {("urn:a", "minCount")}

    def test_deactivated_property_path_still_closed_allowed(self, spark):
        # a deactivated property shape's sh:path still counts toward the
        # closed allowed set (it is declared, just not validated)
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s:C> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:name> ;
          sh:closed true ;
          sh:property [ sh:path <urn:p:name> ; sh:minCount 1 ] ;
          sh:property [ sh:path <urn:p:extra> ; sh:maxCount 0 ;
                        sh:deactivated true ] ."""
        rows = [("urn:a", "urn:p:name", "A", "literal", None),
                ("urn:a", "urn:p:extra", "x", "literal", None)]
        rep = validate(tri(spark, rows),
                       shapes_from_graph(iter_turtle(ttl)))
        assert rep.count() == 0

    def test_sh_node_reference_to_deactivated_conforms(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s:A> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:ref> ;
          sh:property [ sh:path <urn:p:ref> ; sh:node <urn:s:Off> ] .
        <urn:s:Off> a sh:NodeShape ; sh:deactivated true ;
          sh:property [ sh:path <urn:p:n> ; sh:minCount 1 ] ."""
        rows = [("urn:a", "urn:p:ref", "urn:b", "uri", None)]
        rep = validate(tri(spark, rows),
                       shapes_from_graph(iter_turtle(ttl)))
        assert rep.count() == 0

    def test_logical_operand_deactivated_conforms(self, spark):
        # sh:and over (live-failing, deactivated): only the live
        # operand's failure surfaces — the deactivated one conforms
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s:A> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:name> ;
          sh:and ( <urn:s:Live> <urn:s:Off> ) .
        <urn:s:Live> a sh:NodeShape ;
          sh:property [ sh:path <urn:p:id> ; sh:minCount 1 ] .
        <urn:s:Off> a sh:NodeShape ; sh:deactivated true ;
          sh:property [ sh:path <urn:p:name> ; sh:maxCount 0 ] ."""
        rows = [("urn:a", "urn:p:name", "A", "literal", None)]
        rep = validate(tri(spark, rows),
                       shapes_from_graph(iter_turtle(ttl)))
        got = {(r.focus, r.constraint) for r in rep.collect()}
        assert got == {("urn:a", "and")}

    SEV_TTL = """@prefix sh: <http://www.w3.org/ns/shacl#> .
    <urn:s:S> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:name> ;
      sh:severity sh:Warning ;
      sh:property [ sh:path <urn:p:name> ; sh:maxCount 1 ] ;
      sh:property [ sh:path <urn:p:v> ; sh:minInclusive 10 ;
                    sh:severity sh:Info ] ."""

    def test_severity_column(self, spark):
        rows = [("urn:a", "urn:p:name", "A", "literal", None),
                ("urn:a", "urn:p:name", "B", "literal", None),
                ("urn:a", "urn:p:v", "3", "literal", None)]
        rep = validate(tri(spark, rows),
                       shapes_from_graph(iter_turtle(self.SEV_TTL)),
                       with_severity=True)
        got = {(r.constraint, r.severity) for r in rep.collect()}
        assert got == {("maxCount", SH + "Warning"),
                       ("minInclusive", SH + "Info")}

    def test_default_report_has_no_severity_column(self, spark):
        rows = [("urn:a", "urn:p:name", "A", "literal", None)]
        rep = validate(tri(spark, rows),
                       shapes_from_graph(iter_turtle(self.SEV_TTL)))
        assert "severity" not in rep.columns

    def test_conforms_ignores_non_violation_severity(self, spark):
        rows = [("urn:a", "urn:p:name", "A", "literal", None),
                ("urn:a", "urn:p:name", "B", "literal", None)]
        t = tri(spark, rows)
        assert conforms(t, shapes_from_graph(iter_turtle(self.SEV_TTL)))
        strict = self.SEV_TTL.replace("sh:severity sh:Warning ;", "")
        assert not conforms(t, shapes_from_graph(iter_turtle(strict)))

    def test_conflicting_property_severities_raise(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s:S> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:n> ;
          sh:property [ sh:path <urn:p:n> ; sh:minCount 1 ;
                        sh:severity sh:Info ] ;
          sh:property [ sh:path <urn:p:n> ; sh:maxCount 9 ;
                        sh:severity sh:Warning ] ."""
        rows = [("urn:a", "urn:p:n", "x", "literal", None)]
        with pytest.raises(ShaclUnsupported, match="conflicting"):
            validate(tri(spark, rows),
                     shapes_from_graph(iter_turtle(ttl)),
                     with_severity=True).collect()

    def test_literal_severity_raises(self, spark):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s:S> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:n> ;
          sh:severity "high" ;
          sh:property [ sh:path <urn:p:n> ; sh:minCount 1 ] ."""
        with pytest.raises(ShaclUnsupported, match="severity"):
            shapes_from_graph(iter_turtle(ttl))


class TestReportTriples:
    """report_triples: the report rendered as W3C validation-report RDF."""

    TTL = """@prefix sh: <http://www.w3.org/ns/shacl#> .
    <urn:s:R> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:n> ;
      sh:severity sh:Warning ;
      sh:property [ sh:path <urn:p:n> ; sh:maxCount 1 ] ."""

    def _render(self, spark, rows, with_severity=False):
        from meresco_rdf_spark.operators.shacl import (
            report_triples,
            validate,
        )
        rep = validate(tri(spark, rows),
                       shapes_from_graph(iter_turtle(self.TTL)),
                       with_severity=with_severity)
        return {(r.subj, r.pred, r.obj_value, r.obj_kind)
                for r in report_triples(rep).collect()}

    BAD = [("urn:a", "urn:p:n", "x", "literal", None),
           ("urn:a", "urn:p:n", "y", "literal", None)]

    def test_violation_renders_result_node(self, spark):
        got = self._render(spark, self.BAD)
        assert ("_:report", RDF_TYPE, SH + "ValidationReport", "uri") in got
        assert ("_:report", SH + "conforms", "false", "literal") in got
        results = {s for (s, p, v, k) in got if p == SH + "focusNode"}
        assert len(results) == 1
        (node,) = results
        assert (node, SH + "focusNode", "urn:a", "uri") in got
        assert (node, SH + "resultPath", "urn:p:n", "uri") in got
        assert (node, SH + "value", "2", "literal") in got
        assert (node, SH + "sourceShape", "urn:s:R", "uri") in got
        assert (node, SH + "sourceConstraintComponent",
                SH + "MaxCountConstraintComponent", "uri") in got
        assert ("_:report", SH + "result", node, "bnode") in got

    def test_severity_column_renders_when_present(self, spark):
        got = self._render(spark, self.BAD, with_severity=True)
        assert any(p == SH + "resultSeverity" and v == SH + "Warning"
                   for (_, p, v, _k) in got)
        got2 = self._render(spark, self.BAD, with_severity=False)
        assert not any(p == SH + "resultSeverity"
                       for (_, p, v, _k) in got2)

    def test_conforming_report_is_header_only(self, spark):
        got = self._render(spark, [("urn:a", "urn:p:n", "x",
                                    "literal", None)])
        assert got == {
            ("_:report", RDF_TYPE, SH + "ValidationReport", "uri"),
            ("_:report", SH + "conforms", "true", "literal")}
