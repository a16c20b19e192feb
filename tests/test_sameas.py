"""owl:sameAs canonicalization (operators/sameas.py): transitive
collapse, literal safety, link provenance, predicate rewriting,
idempotence, and local/distributed component-path agreement."""

import pytest

from meresco_rdf_spark.operators.sameas import (
    OWL_SAMEAS,
    sameas_canonicalize,
    sameas_mapping,
)

pytestmark = pytest.mark.spark

SCHEMA = ("subj string, pred string, obj_value string, obj_kind string, "
          "obj_lang string")

ROWS = [
    # chain a <-> b <-> c (one direction each; symmetry is derived)
    ("urn:b", OWL_SAMEAS, "urn:a", "uri", None),
    ("urn:b", OWL_SAMEAS, "urn:c", "uri", None),
    # data using all three spellings
    ("urn:a", "ex:p", "v1", "literal", None),
    ("urn:b", "ex:p", "v1", "literal", None),          # collides after rewrite
    ("urn:c", "ex:q", "urn:b", "uri", None),           # object rewritten too
    ("urn:x", "ex:q", "urn:c", "uri", None),
    # literal whose lexical form equals an alias IRI: must NOT rewrite
    ("urn:x", "ex:note", "urn:c", "literal", None),
]


def df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_transitive_collapse_and_literal_safety(spark):
    got = {tuple(r) for r in sameas_canonicalize(df(spark, ROWS)).collect()}
    assert got == {
        ("urn:a", "ex:p", "v1", "literal", None),      # two rows collapsed
        ("urn:a", "ex:q", "urn:a", "uri", None),       # subj AND obj rewritten
        ("urn:x", "ex:q", "urn:a", "uri", None),
        ("urn:x", "ex:note", "urn:c", "literal", None),  # literal untouched
    }


def test_keep_links_reemits_normalized_provenance(spark):
    got = {tuple(r) for r in
           sameas_canonicalize(df(spark, ROWS), keep_links=True).collect()}
    assert ("urn:a", OWL_SAMEAS, "urn:b", "uri", None) in got
    assert ("urn:a", OWL_SAMEAS, "urn:c", "uri", None) in got
    # the raw input-direction link is gone
    assert ("urn:b", OWL_SAMEAS, "urn:a", "uri", None) not in got


def test_predicate_rewriting_opt_in(spark):
    rows = [
        ("ex:p2", OWL_SAMEAS, "ex:p1", "uri", None),
        ("urn:s", "ex:p2", "o", "literal", None),
    ]
    default = {r.pred for r in sameas_canonicalize(df(spark, rows)).collect()}
    assert default == {"ex:p2"}
    rewritten = {r.pred for r in sameas_canonicalize(
        df(spark, rows), rewrite_predicates=True).collect()}
    assert rewritten == {"ex:p1"}


def test_idempotent(spark):
    once = sameas_canonicalize(df(spark, ROWS))
    twice = {tuple(r) for r in sameas_canonicalize(once).collect()}
    assert twice == {tuple(r) for r in once.collect()}


def test_mapping_paths_agree(spark):
    frame = df(spark, ROWS)
    local = {tuple(r) for r in sameas_mapping(frame).collect()}
    dist = {tuple(r) for r in
            sameas_mapping(frame, local_threshold=0).collect()}
    assert dist == local == {("urn:b", "urn:a"), ("urn:c", "urn:a")}


def test_no_links_is_passthrough_set(spark):
    rows = [("urn:s", "ex:p", "o", "literal", None),
            ("urn:s", "ex:p", "o", "literal", None)]
    got = [tuple(r) for r in sameas_canonicalize(df(spark, rows)).collect()]
    assert got == [("urn:s", "ex:p", "o", "literal", None)]
