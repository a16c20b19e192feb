"""Explicit P/R metric vs the reference fixtures (BASELINE.json metric:
'triple P/R >= 0.95 vs meresco-rdf reference fixtures').

The per-construct parser/serializer tests assert exact set equality; this
test computes the aggregate precision/recall number the north rule names,
over every ported reference fixture, so the metric is visible and pinned:
our target is not 0.95 but 1.0 — byte-level fixture parity implies exact
triple parity.

Expected triple sets are derived by OUR parser; their correctness against
the reference is established construct-by-construct in
tests/test_rdfparser.py (each reference test case's expected triples are
transcribed from /root/reference/test/graph/rdfparsertest.py).  Here the
P/R is measured for the full pipeline surface: parse -> Graph ->
serialize -> re-parse, per fixture, with bnode-bijection comparison.
"""

from __future__ import annotations

from meresco_rdf_spark.graph import Graph
from meresco_rdf_spark.model import BNode, node_to_row
from meresco_rdf_spark.namespaces import namespaces
from meresco_rdf_spark.rdfxml.parser import parse_rdfxml
from meresco_rdf_spark.rdfxml.serializer import (
    Triples2RdfXml,
    element_to_string,
)

from tests.helpers import canonical_triples, load_fixture

FIXTURES = [
    "input_rdf.xml.tmpl",
    "nl_property_labels.rdf",
    "custom_type_relations.rdf",
    "rdf_with_base.xml",
]


def rows_of(graph: Graph) -> set:
    return canonical_triples(
        {node_to_row(s, p, o) for s, p, o in graph.triples()})


def test_roundtrip_precision_recall_is_1() -> None:
    tp = fp = fn = 0
    for name in FIXTURES:
        BNode.nextGenId = 0
        expected = rows_of(parse_rdfxml(load_fixture(name)))
        # full surface: parse -> serialize -> re-parse
        BNode.nextGenId = 0
        g = parse_rdfxml(load_fixture(name))
        xml = element_to_string(
            Triples2RdfXml(namespaces=namespaces).as_rdfxml(g), namespaces)
        BNode.nextGenId = 0
        got = rows_of(parse_rdfxml(xml))
        tp += len(expected & got)
        fp += len(got - expected)
        fn += len(expected - got)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    assert tp > 100  # the fixtures are substantial
    assert precision == 1.0 and recall == 1.0, (precision, recall)


def test_every_fixture_parses_to_nonempty_graph() -> None:
    for name in FIXTURES:
        BNode.nextGenId = 0
        g = parse_rdfxml(load_fixture(name))
        assert len(g.triples()) > 0, name


def test_pipeline_matches_independent_reference_on_fresh_input(spark) -> None:
    """End-to-end P/R = 1.0 of the DISTRIBUTED pipeline against the
    independent pure-Python reference pipeline (tools/golden_ref.py) on a
    fresh input shape (200 convs x 6 turns) that the committed goldens
    (120 x 8) never saw — guards against the golden files accidentally
    encoding a shared bug reproduced only at the pinned input."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import golden_ref as ref

    from meresco_rdf_spark.kg.pipeline import run_pipeline
    from meresco_rdf_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, 200, 6)
    rows = [(r.conv_id, r.turn_idx, r.text)
            for r in t.select("conv_id", "turn_idx", "text").collect()]
    mentions = ref.ref_mentions(rows)
    canon = ref.ref_canonical_map({m["surface_key"] for m in mentions})
    expected = set(ref.ref_triples(mentions, canon))

    res = run_pipeline(t)
    got = {(r.subj, r.pred, r.obj_value, r.obj_kind, r.obj_lang)
           for r in res.triples.collect()}
    res.mentions.unpersist()
    res.canonical_map.unpersist()

    tp = len(got & expected)
    assert expected and got
    precision = tp / len(got)
    recall = tp / len(expected)
    assert precision == 1.0 and recall == 1.0, {
        "got": len(got), "expected": len(expected),
        "spurious": sorted(got - expected)[:5],
        "missing": sorted(expected - got)[:5],
    }
