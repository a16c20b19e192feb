"""Tests for the vectorized scalar-function library (SURVEY.md §2.5
scalar row) — asserted against the reference-semantics Python
implementations (model / namespaces / urllib)."""

from __future__ import annotations

from urllib.parse import urljoin

from pyspark.sql import functions as F

from meresco_rdf_spark.functions import (
    curie_to_uri_col,
    fragment,
    is_bnode,
    matches_iri,
    normalize_node_id,
    uri_join,
    uri_to_curie_col,
)
from meresco_rdf_spark.model import matches_iri_syntax
from meresco_rdf_spark.namespaces import namespaces


def col_values(spark, values, expr_fn):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r.out for r in df.select(expr_fn(F.col("v")).alias("out")).collect()]


class TestScalarFns:
    def test_is_bnode_and_fragment(self, spark):
        vals = ["_:b1", "urn:x", "http://e.org/p#frag", "http://e.org/p"]
        assert col_values(spark, vals, is_bnode) == [True, False, False, False]
        assert col_values(spark, vals, fragment) == ["", "", "frag", ""]

    def test_matches_iri_agrees_with_python_grammar(self, spark):
        vals = [
            "http://example.org/path?q=1#f",
            "urn:isbn:0451450523",
            "not a uri",
            "http://example.org/<bad>",
            "ftp://user@host:21/dir",
            "relative/path",
        ]
        got = col_values(spark, vals, matches_iri)
        expect = [matches_iri_syntax(v) for v in vals]
        assert got == expect
        assert expect == [True, True, False, False, True, False]

    def test_normalize_node_id(self, spark):
        vals = ["abc", "1abc", "_x", "Xyz"]
        assert col_values(spark, vals, normalize_node_id) == [
            "_:abc", "_:b1abc", "_:b_x", "_:Xyz"]

    def test_uri_join_matches_urljoin_for_reference_cases(self, spark):
        base = "http://example.org/dir/doc.rdf"
        refs = ["#frag", "other.rdf", "/abs/path", "http://else.where/x", ""]
        df = spark.createDataFrame([(base, r) for r in refs], "b string, r string")
        got = [r.out for r in df.select(
            uri_join(F.col("b"), F.col("r")).alias("out")).collect()]
        assert got == [urljoin(base, r) for r in refs]

    def test_curie_uri_roundtrip(self, spark):
        curies = ["rdfs:label", "foaf:name", "skos:prefLabel", "unknown:x"]
        uris = col_values(spark, curies, curie_to_uri_col)
        assert uris[0] == namespaces.curie_to_uri("rdfs:label")
        assert uris[3] == "unknown:x"  # pass-through
        back = col_values(spark, uris[:3], uri_to_curie_col)
        assert back == curies[:3]

    def test_uri_to_curie_longest_match(self, spark):
        # dcterms: is a longer namespace than dc:; longest must win
        uri = namespaces.curie_to_uri("dcterms:title")
        assert col_values(spark, [uri], uri_to_curie_col) == ["dcterms:title"]
