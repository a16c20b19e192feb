"""TriG parser (Turtle + named-graph blocks), distributed ingest, and
(graph, subject)-blocked sink round-trips."""

import pytest

from meresco_rdf_spark.model import BNode, Literal, Uri
from meresco_rdf_spark.rdfxml.trig import parse_trig
from meresco_rdf_spark.rdfxml.turtle import TurtleParseError

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def setup_function(fn):
    BNode.nextGenId = 0


# --------------------------------------------------------------- parser

def test_bare_statements_are_default_graph():
    quads = parse_trig('<urn:s> <urn:p> "v" .')
    assert quads == [(None, "urn:s", "urn:p", Literal("v"))]


def test_graph_keyword_block():
    quads = parse_trig("""
        GRAPH <urn:g> { <urn:s> <urn:p> <urn:o> . <urn:s> <urn:q> "x" }
    """)
    assert quads == [
        ("urn:g", "urn:s", "urn:p", Uri("urn:o")),
        ("urn:g", "urn:s", "urn:q", Literal("x")),
    ]


def test_keywordless_label_block_and_prefixed_label():
    quads = parse_trig("""
        @prefix ex: <http://ex.org/> .
        ex:g { ex:s ex:p "v"@nl . }
    """)
    assert quads == [("http://ex.org/g", "http://ex.org/s",
                      "http://ex.org/p", Literal("v", lang="nl"))]


def test_explicit_default_graph_block():
    quads = parse_trig('{ <urn:s> <urn:p> "v" . }')
    assert quads == [(None, "urn:s", "urn:p", Literal("v"))]


def test_graph_keyword_case_insensitive_and_bnode_label():
    quads = parse_trig('graph _:g { <urn:s> <urn:p> "v" . }')
    assert quads == [("_:g", "urn:s", "urn:p", Literal("v"))]


def test_anon_graph_label():
    quads = parse_trig('GRAPH [] { <urn:s> <urn:p> "v" . }')
    assert quads[0][0].startswith("_:id")


def test_full_turtle_inside_block():
    quads = parse_trig("""
        @prefix ex: <http://ex.org/> .
        GRAPH ex:g {
          ex:s a ex:T ;
              ex:p [ ex:q "inner" ] ;
              ex:r ( ex:a )
        }
    """)
    graphs = {g for g, *_ in quads}
    assert graphs == {"http://ex.org/g"}
    preds = {p for _, _, p, _ in quads}
    assert RDF_NS + "type" in preds
    assert RDF_NS + "first" in preds  # collection desugared inside block


def test_same_label_blocks_union():
    quads = parse_trig("""
        GRAPH <urn:g> { <urn:s> <urn:p> "a" . }
        GRAPH <urn:g> { <urn:s> <urn:p> "b" . }
    """)
    assert len(quads) == 2 and {g for g, *_ in quads} == {"urn:g"}


def test_mixed_default_and_named():
    quads = parse_trig("""
        <urn:s0> <urn:p> "before" .
        GRAPH <urn:g> { <urn:s1> <urn:p> "in" . }
        <urn:s2> <urn:p> "after" .
    """)
    assert [g for g, *_ in quads] == [None, "urn:g", None]


def test_unterminated_block_raises():
    with pytest.raises(TurtleParseError):
        parse_trig('GRAPH <urn:g> { <urn:s> <urn:p> "v" .')


def test_plain_turtle_rejects_braces():
    from meresco_rdf_spark.rdfxml.turtle import parse_turtle

    with pytest.raises(TurtleParseError):
        parse_turtle('{ <urn:s> <urn:p> "v" . }')


# ------------------------------------------------------ distributed read

pytestmark = pytest.mark.spark

TRIG_DOC = """@prefix ex: <http://ex.org/> .
ex:s0 ex:p "default" .
GRAPH ex:g { ex:s1 ex:p _:joe . _:joe ex:q "named" }
graph _:gb { ex:s2 ex:p "bnode graph" . }
"""


def test_read_trig_quads(spark, tmp_path):
    from meresco_rdf_spark.sources import read_trig_quads

    (tmp_path / "f.trig").write_text(TRIG_DOC, encoding="utf-8")
    rows = read_trig_quads(spark, str(tmp_path)).collect()
    by_subj = {r.subj: r for r in rows}
    assert by_subj["http://ex.org/s0"].context is None
    assert by_subj["http://ex.org/s1"].context == "http://ex.org/g"
    # bnode object AND bnode graph label rescoped with the same doc scope
    joe = by_subj["http://ex.org/s1"].obj_value
    assert joe.startswith("_:d") and joe.endswith(":joe")
    assert by_subj[joe].obj_value == "named"
    gb = by_subj["http://ex.org/s2"].context
    assert gb.startswith("_:d") and gb.endswith(":gb")
    assert joe.split(":")[1] == gb.split(":")[1]  # same per-file scope


def test_read_trig_quarantines_malformed(spark, tmp_path):
    from meresco_rdf_spark.sources import read_trig_quads

    (tmp_path / "bad.trig").write_text(
        'GRAPH <urn:g> { <urn:s> <urn:p> "v" .', encoding="utf-8")
    (tmp_path / "ok.trig").write_text(
        '<urn:s> <urn:p> "v" .', encoding="utf-8")
    df = read_trig_quads(spark, str(tmp_path), keep_errors=True)
    rows = df.collect()
    assert len([r for r in rows if r.error is None]) == 1
    errs = [r for r in rows if r.error is not None]
    assert len(errs) == 1 and errs[0].context == "file:bad.trig"


# ------------------------------------------------------------------ sink

def test_trig_sink_roundtrip(spark, tmp_path):
    from meresco_rdf_spark.sinks import write_trig
    from meresco_rdf_spark.sources import read_trig_quads

    rows = [
        (None, "urn:s", "urn:p", 'tricky "q" nl\nhere', "literal", None),
        ("urn:g:a", "urn:s", "urn:p", "taal", "literal", "nl"),
        ("urn:g:a", "urn:s", RDF_NS + "type", "urn:T", "uri", None),
        ("urn:g:a", "urn:s2", "urn:q", "urn:o", "uri", None),
        ("_:g0", "_:b0", "urn:p", "_:b1", "bnode", None),
        (None, "urn:s", "urn:r", "unicode ë ok", "literal", None),
    ]
    quads = spark.createDataFrame(
        rows, "context string, subj string, pred string, obj_value string, "
              "obj_kind string, obj_lang string")
    out = str(tmp_path / "trig")
    write_trig(quads, out, num_files=2)
    back = set()
    for r in read_trig_quads(spark, out, glob="*.txt").collect():
        ctx, subj, val = r.context, r.subj, r.obj_value
        # reader rescopes bnodes per file; strip the scope for comparison
        unscope = lambda v: "_:" + v.rsplit(":", 1)[1] \
            if v is not None and v.startswith("_:d") else v  # noqa: E731
        back.add((unscope(ctx), unscope(subj), r.pred,
                  unscope(val) if r.obj_kind == "bnode" else val,
                  r.obj_kind, r.obj_lang))
    assert back == set(rows)


def test_trig_lines_no_python(spark):
    from meresco_rdf_spark.sinks import trig_lines

    quads = spark.createDataFrame(
        [("urn:g", "urn:s", "urn:p", "v", "literal", "en"),
         (None, "urn:s", "urn:p", "urn:o", "uri", None)],
        "context string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_lang string")
    lines = sorted(r.value for r in trig_lines(quads).collect())
    assert lines == ['<urn:g> { <urn:s> <urn:p> "v"@en . }',
                     '<urn:s> <urn:p> <urn:o> .']
    plan = trig_lines(quads)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_trig_queryable_with_sparql_graph(spark, tmp_path):
    from meresco_rdf_spark.sources import read_trig_quads
    from meresco_rdf_spark.sparql import sparql_select

    (tmp_path / "f.trig").write_text(TRIG_DOC, encoding="utf-8")
    quads = read_trig_quads(spark, str(tmp_path))
    named = sparql_select(
        quads, "SELECT ?g ?s WHERE { GRAPH ?g { ?s <http://ex.org/p> ?o } }")
    assert {r["g"] for r in named.collect()} >= {"http://ex.org/g"}
    dflt = sparql_select(quads, "SELECT ?o WHERE { ?s <http://ex.org/p> ?o }")
    assert [r["o"] for r in dflt.collect()] == ["default"]


def test_read_rdf_directory_all_five_formats(spark, tmp_path):
    # one directory, five serializations, one unified quad relation:
    # triple formats carry file contexts, quad formats their graph labels
    from meresco_rdf_spark.sources import read_rdf_directory
    from meresco_rdf_spark.sparql import sparql_select

    (tmp_path / "a.rdf").write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:dct="http://purl.org/dc/terms/">'
        '<rdf:Description rdf:about="urn:x:1"><dct:title>X</dct:title>'
        '</rdf:Description></rdf:RDF>', encoding="utf-8")
    (tmp_path / "b.nt").write_text(
        '<urn:x:2> <urn:p> "nt" .\n', encoding="utf-8")
    (tmp_path / "c.ttl").write_text(
        '<urn:x:3> <urn:p> "ttl" .\n', encoding="utf-8")
    (tmp_path / "d.nq").write_text(
        '<urn:x:4> <urn:p> "nq" <urn:g> .\n'
        '<urn:x:5> <urn:p> "nq-default" .\n', encoding="utf-8")
    (tmp_path / "e.trig").write_text(
        'GRAPH <urn:g> { <urn:x:6> <urn:p> "trig" . }', encoding="utf-8")
    quads = read_rdf_directory(spark, str(tmp_path))
    ctx = {r.context for r in quads.collect()}
    assert ctx == {"file:a.rdf", "file:b.nt", "file:c.ttl", "urn:g", None}
    # the shared <urn:g> label spans .nq and .trig: one graph, two files
    g = sparql_select(
        quads, 'SELECT ?s WHERE { GRAPH <urn:g> { ?s ?p ?o } }')
    assert {r["s"] for r in g.collect()} == {"urn:x:4", "urn:x:6"}


def test_graph_var_binds_bnode_kind(spark):
    # GRAPH ?g over a bnode-labeled graph binds ?g with term kind 'bnode'
    from meresco_rdf_spark.sparql import sparql_select

    quads = spark.createDataFrame(
        [("_:g0", "urn:s", "urn:p", "v", "literal", None),
         ("urn:g1", "urn:s", "urn:p", "w", "literal", None)],
        "context string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_lang string")
    out = sparql_select(quads, "SELECT ?g WHERE { GRAPH ?g { ?s ?p ?o } }")
    kinds = {r["g"]: r["g_kind"] for r in out.collect()}
    assert kinds == {"_:g0": "bnode", "urn:g1": "uri"}
