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
        assert props["urn:ex:name"]["node_kind"] == "literal"
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
          sh:property [ sh:path <urn:p> ; sh:nodeKind sh:BlankNodeOrIRI ] ."""
        with pytest.raises(ShaclUnsupported, match="nodeKind"):
            shapes_from_graph(iter_turtle(ttl))

    def test_shape_without_target_raises(self):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s> a sh:NodeShape ;
          sh:property [ sh:path <urn:p> ; sh:minCount 1 ] ."""
        with pytest.raises(ShaclUnsupported, match="no target"):
            shapes_from_graph(iter_turtle(ttl))

    def test_non_iri_path_raises(self):
        ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s> a sh:NodeShape ; sh:targetClass <urn:C> ;
          sh:property [ sh:path [ sh:inversePath <urn:p> ] ] ."""
        with pytest.raises(ShaclUnsupported):
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
