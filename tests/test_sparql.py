"""SPARQL-subset front-end: parser + compiler semantics.

Ground truth is computed by hand on small graphs; the sf-scale driver
queries (`sparql_bgp_filter`, `sparql_optional_label`,
`sparql_union_paths`) get independent DuckDB oracles via the driver
contract.
"""

import pytest

from meresco_rdf_spark.operators.graph_ops import predicate_stats, triples_df
from meresco_rdf_spark.sparql import parse_query, sparql_select
from meresco_rdf_spark.sparql.compiler import SparqlCompileError, _order_patterns
from meresco_rdf_spark.sparql.parser import (
    Iri,
    Lit,
    PathPlus,
    SparqlSyntaxError,
    TriplesBlock,
    Var,
)
from meresco_rdf_spark.model import BNode, Literal, Uri


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def test_parse_prefixes_and_bgp():
    q = parse_query("""
        PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        SELECT ?s ?name WHERE {
            ?s foaf:name ?name .
            ?s a <urn:type:Person> .
        }
    """)
    assert q.variables == ["s", "name"]
    block = q.where.parts[0]
    assert isinstance(block, TriplesBlock)
    assert block.patterns[0] == (
        Var("s"), Iri("http://xmlns.com/foaf/0.1/name"), Var("name"))
    # 'a' expands to rdf:type
    assert block.patterns[1][1].uri.endswith("#type")


def test_parse_predicate_object_lists():
    q = parse_query("""
        SELECT * WHERE {
            <urn:a> <urn:p> "x", "y" ; <urn:q> ?z .
        }
    """)
    pats = q.where.parts[0].patterns
    assert len(pats) == 3
    assert pats[0][2] == Lit("x")
    assert pats[1][2] == Lit("y")
    assert pats[2][1] == Iri("urn:q")


def test_parse_literals_lang_and_dtype():
    q = parse_query("""SELECT * WHERE {
        ?s <urn:p> "hi"@EN .
        ?s <urn:q> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .
    }""")
    pats = q.where.parts[0].patterns
    assert pats[0][2] == Lit("hi", lang="en")   # lang tags normalize lower
    assert pats[1][2].dtype.endswith("integer")


def test_parse_modifiers():
    q = parse_query("""SELECT DISTINCT ?s WHERE { ?s ?p ?o }
                       ORDER BY DESC(?s) LIMIT 10 OFFSET 5""")
    assert q.distinct and q.limit == 10 and q.offset == 5
    assert q.order_by == [("s", False)]


def test_parse_errors_have_positions():
    with pytest.raises(SparqlSyntaxError, match="offset"):
        parse_query("SELECT ?s WHERE { ?s <urn:p> }")
    with pytest.raises(SparqlSyntaxError, match="undeclared prefix"):
        parse_query("SELECT ?s WHERE { ?s foaf:name ?n }")


def test_service_clause_named_in_error():
    with pytest.raises(SparqlSyntaxError, match="SERVICE .*not supported"):
        parse_query("""SELECT ?s WHERE {
            SERVICE <http://example.org/sparql> { ?s ?p ?o }
        }""")


# ---------------------------------------------------------------------------
# compiler semantics on a small graph
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def small_graph(spark):
    return triples_df(spark, [
        ("urn:alice", "urn:p:knows", Uri("urn:bob")),
        ("urn:alice", "urn:p:name", Literal("Alice", lang="en")),
        ("urn:alice", "urn:p:age", Literal("34")),
        ("urn:bob", "urn:p:name", Literal("Bob", lang="en")),
        ("urn:bob", "urn:p:name", Literal("Bobby")),
        ("urn:bob", "urn:p:knows", Uri("urn:carol")),
        ("urn:carol", "urn:p:age", Literal("29")),
        ("_:b1", "urn:p:name", Literal("Anon")),
    ]).cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bgp_join(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?a ?b WHERE {
            ?a <urn:p:knows> ?b .
            ?b <urn:p:name> ?n .
        }
    """)
    assert set(out.columns) == {"a", "a_kind", "a_lang",
                                "b", "b_kind", "b_lang"}
    got = {(r["a"], r["b"]) for r in out.collect()}
    # carol has no name -> (bob, carol) only matches via bob
    assert got == {("urn:alice", "urn:bob")}


def test_constant_object_literal_with_lang(small_graph):
    out = sparql_select(small_graph,
                        'SELECT ?s WHERE { ?s <urn:p:name> "Bob"@en }')
    assert [r["s"] for r in out.collect()] == ["urn:bob"]
    # without the lang tag: no match (term identity includes lang)
    out2 = sparql_select(small_graph,
                         'SELECT ?s WHERE { ?s <urn:p:name> "Bob" }')
    assert out2.count() == 0


def test_filter_numeric_and_regex(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s ?v WHERE {
            ?s <urn:p:age> ?v . FILTER (?v > 30)
        }
    """)
    assert [(r["s"], r["v"]) for r in out.collect()] == [("urn:alice", "34")]

    out2 = sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:name> ?n . FILTER (regex(?n, "^Bob")) }
    """)
    assert sorted(r["s"] for r in out2.collect()) == ["urn:bob", "urn:bob"]


def test_filter_lang_and_bound(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s ?n WHERE { ?s <urn:p:name> ?n . FILTER (lang(?n) = "en") }
    """)
    assert sorted(r["n"] for r in out.collect()) == ["Alice", "Bob"]


def test_optional_left_join(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s ?age WHERE {
            ?s <urn:p:name> ?n .
            OPTIONAL { ?s <urn:p:age> ?age }
        }
    """)
    got = {(r["s"], r["age"]) for r in out.collect()}
    assert ("urn:alice", "34") in got
    assert ("urn:bob", None) in got          # OPTIONAL miss -> NULL
    assert ("_:b1", None) in got


def test_optional_then_negation_filter(small_graph):
    # the classic "not exists" idiom: OPTIONAL + !bound
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?s WHERE {
            ?s <urn:p:name> ?n .
            OPTIONAL { ?s <urn:p:age> ?age }
            FILTER (!bound(?age))
        }
    """)
    assert sorted(r["s"] for r in out.collect()) == ["_:b1", "urn:bob"]


def test_union(small_graph):
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?s WHERE {
            { ?s <urn:p:age> ?v } UNION { ?s <urn:p:knows> ?o }
        }
    """)
    assert sorted(r["s"] for r in out.collect()) == [
        "urn:alice", "urn:bob", "urn:carol"]


def test_union_pads_missing_vars(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?v ?o WHERE {
            { ?s <urn:p:age> ?v } UNION { ?s <urn:p:knows> ?o }
        }
    """)
    rows = {(r["v"], r["o"]) for r in out.collect()}
    assert ("34", None) in rows and (None, "urn:bob") in rows


def test_distinct_order_limit_offset(small_graph):
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?s WHERE { ?s ?p ?o } ORDER BY ?s LIMIT 2 OFFSET 1
    """)
    assert [r["s"] for r in out.collect()] == ["urn:alice", "urn:bob"]


def test_reduced_eliminates_duplicates(small_graph):
    # §18.2.4.3 allows REDUCED to eliminate any number of duplicates;
    # this engine eliminates all of them (same plan as DISTINCT)
    q = parse_query("SELECT REDUCED ?s WHERE { ?s ?p ?o }")
    assert q.distinct
    out = sparql_select(small_graph, """
        SELECT REDUCED ?s WHERE { ?s ?p ?o } ORDER BY ?s
    """)
    rows = [r["s"] for r in out.collect()]
    assert rows == sorted(set(rows))


def test_subject_bnode_kind(small_graph):
    out = sparql_select(small_graph, "SELECT ?s WHERE { ?s <urn:p:name> ?n }")
    kinds = {r["s"]: r["s_kind"] for r in out.collect()}
    assert kinds["_:b1"] == "bnode"
    assert kinds["urn:alice"] == "uri"


def test_shared_var_subject_object(small_graph):
    # ?b bound as object then reused as subject: joins on term identity
    out = sparql_select(small_graph, """
        SELECT ?b WHERE {
            <urn:alice> <urn:p:knows> ?b .
            ?b <urn:p:knows> ?c .
        }
    """)
    assert [r["b"] for r in out.collect()] == ["urn:bob"]


def test_projection_unbound_raises(small_graph):
    with pytest.raises(SparqlCompileError, match="not bound"):
        sparql_select(small_graph, "SELECT ?zzz WHERE { ?s ?p ?o }")


def test_filter_str_eq(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:name> ?n . FILTER (str(?n) = "Bobby") }
    """)
    assert [r["s"] for r in out.collect()] == ["urn:bob"]


def test_ground_pattern_existence(small_graph):
    # fully ground pattern acts as an existence gate on the group
    out = sparql_select(small_graph, """
        SELECT ?s WHERE {
            <urn:alice> <urn:p:knows> <urn:bob> .
            ?s <urn:p:age> ?v .
        }
    """)
    assert sorted(r["s"] for r in out.collect()) == ["urn:alice", "urn:carol"]
    out2 = sparql_select(small_graph, """
        SELECT ?s WHERE {
            <urn:alice> <urn:p:knows> <urn:carol> .
            ?s <urn:p:age> ?v .
        }
    """)
    assert out2.count() == 0


# ---------------------------------------------------------------------------
# stats-guided join ordering
# ---------------------------------------------------------------------------

def test_order_patterns_most_selective_first_connected():
    stats = {"urn:p:common": 1_000_000, "urn:p:rare": 10, "__total__": 1_000_010}
    pats = [
        (Var("a"), Iri("urn:p:common"), Var("b")),
        (Var("b"), Iri("urn:p:common"), Var("c")),
        (Var("c"), Iri("urn:p:rare"), Var("d")),
    ]
    ordered = _order_patterns(pats, stats, stats["__total__"])
    # rare pattern first; then only patterns connected to bound vars
    assert ordered[0][1].uri == "urn:p:rare"
    assert ordered[1] == pats[1]  # shares ?c via ?b->?c chain? no: shares ?c
    assert ordered[2] == pats[0]


def test_stats_reorder_same_result(small_graph):
    q = """
        SELECT ?a ?c WHERE {
            ?a <urn:p:knows> ?b .
            ?b <urn:p:knows> ?c .
        }
    """
    base = _rows(sparql_select(small_graph, q))
    stats = predicate_stats(small_graph)
    assert stats["__total__"] == 8
    reordered = _rows(sparql_select(small_graph, q, pattern_stats=stats))
    assert base == reordered == [("urn:alice", "uri", None,
                                  "urn:carol", "uri", None)]


def test_plan_constant_filters_reach_scan(spark, small_graph, tmp_path):
    # constant terms must appear as pushed data filters on the parquet scan
    path = str(tmp_path / "t.parquet")
    small_graph.write.parquet(path)
    t = spark.read.parquet(path)
    out = sparql_select(t, 'SELECT ?s WHERE { ?s <urn:p:age> ?v }')
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "urn:p:age" in plan


# ---------------------------------------------------------------------------
# property paths
# ---------------------------------------------------------------------------

def test_parse_path_sequence_desugars_to_fresh_vars():
    q = parse_query("""SELECT ?s ?o WHERE {
        ?s <urn:p:a>/<urn:p:b> ?o .
    }""")
    pats = q.where.parts[0].patterns
    assert len(pats) == 2
    assert pats[0][1] == Iri("urn:p:a") and pats[1][1] == Iri("urn:p:b")
    mid = pats[0][2]
    assert isinstance(mid, Var) and mid.name.startswith("_path")
    assert pats[1][0] == mid


def test_parse_path_inverse_swaps_subject_object():
    q = parse_query("SELECT * WHERE { ?o ^<urn:p:a> ?s }")
    pats = q.where.parts[0].patterns
    assert pats == [(Var("s"), Iri("urn:p:a"), Var("o"))]


def test_parse_path_star_and_opt():
    from meresco_rdf_spark.sparql.parser import PathOpt, PathStar

    q = parse_query("SELECT * WHERE { ?s <urn:p:a>* ?o }")
    assert q.where.parts[0].patterns[0][1] == PathStar(("urn:p:a",))
    q = parse_query("SELECT * WHERE { ?s (<urn:p:a>|<urn:p:b>)? ?o }")
    assert q.where.parts[0].patterns[0][1] == PathOpt(("urn:p:a", "urn:p:b"))


def test_parse_path_star_rejected_in_templates():
    with pytest.raises(SparqlSyntaxError, match="not allowed"):
        parse_query("""CONSTRUCT { ?s <urn:p:a>* ?o }
                       WHERE { ?s <urn:p:a> ?o }""")


def test_path_sequence_semantics(small_graph):
    # knows/name: alice->bob->{"Bob"@en,"Bobby"}, bob->carol (no name)
    out = sparql_select(small_graph, """
        SELECT ?s ?n WHERE { ?s <urn:p:knows>/<urn:p:name> ?n }
    """)
    got = {(r["s"], r["n"]) for r in out.collect()}
    assert got == {("urn:alice", "Bob"), ("urn:alice", "Bobby")}
    # fresh join variables never leak into SELECT *
    star = sparql_select(small_graph,
                         "SELECT * WHERE { ?s <urn:p:knows>/<urn:p:name> ?n }")
    assert not any(c.startswith("_path") for c in star.columns)


def test_path_inverse_semantics(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?who WHERE { <urn:bob> ^<urn:p:knows> ?who }
    """)
    assert {r["who"] for r in out.collect()} == {"urn:alice"}


def test_path_alternation_union(small_graph):
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?v WHERE { <urn:alice> (<urn:p:name>|<urn:p:age>) ?v }
    """)
    assert {r["v"] for r in out.collect()} == {"Alice", "34"}


def test_path_alternation_distributes_over_sequence(small_graph):
    # knows/(name|age): alice->bob has name x2; bob->carol has age
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?s ?v WHERE {
            ?s <urn:p:knows>/(<urn:p:name>|<urn:p:age>) ?v .
        }
    """)
    got = {(r["s"], r["v"]) for r in out.collect()}
    assert got == {("urn:alice", "Bob"), ("urn:alice", "Bobby"),
                   ("urn:bob", "29")}


def test_path_plus_transitive_closure(spark):
    chain = triples_df(spark, [
        ("urn:1", "urn:p:next", Uri("urn:2")),
        ("urn:2", "urn:p:next", Uri("urn:3")),
        ("urn:3", "urn:p:next", Uri("urn:4")),
        ("urn:9", "urn:p:other", Uri("urn:1")),
    ])
    out = sparql_select(chain, """
        SELECT ?x ?y WHERE { ?x <urn:p:next>+ ?y }
    """)
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {("urn:1", "urn:2"), ("urn:1", "urn:3"), ("urn:1", "urn:4"),
                   ("urn:2", "urn:3"), ("urn:2", "urn:4"),
                   ("urn:3", "urn:4")}


def test_path_plus_cycle_terminates(spark):
    cyc = triples_df(spark, [
        ("urn:a", "urn:p:n", Uri("urn:b")),
        ("urn:b", "urn:p:n", Uri("urn:a")),
    ])
    out = sparql_select(cyc, "SELECT ?x ?y WHERE { ?x <urn:p:n>+ ?y }")
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {("urn:a", "urn:b"), ("urn:b", "urn:a"),
                   ("urn:a", "urn:a"), ("urn:b", "urn:b")}


def test_path_plus_seeded_from_constant_subject(spark):
    chain = triples_df(spark, [
        ("urn:1", "urn:p:next", Uri("urn:2")),
        ("urn:2", "urn:p:next", Uri("urn:3")),
        ("urn:5", "urn:p:next", Uri("urn:6")),
    ])
    out = sparql_select(chain,
                        "SELECT ?y WHERE { <urn:1> <urn:p:next>+ ?y }")
    assert {r["y"] for r in out.collect()} == {"urn:2", "urn:3"}


def test_path_plus_literal_terminates_but_does_not_extend(spark):
    g = triples_df(spark, [
        ("urn:1", "urn:p:n", Uri("urn:2")),
        ("urn:2", "urn:p:n", Literal("leaf")),
    ])
    out = sparql_select(g, "SELECT ?x ?y WHERE { ?x <urn:p:n>+ ?y }")
    got = {(r["x"], r["y"], r["y_kind"]) for r in out.collect()}
    assert got == {("urn:1", "urn:2", "uri"),
                   ("urn:1", "leaf", "literal"),
                   ("urn:2", "leaf", "literal")}


def test_path_plus_in_sequence(small_graph):
    # knows+/name from alice reaches bob and carol; carol has no name
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?n WHERE { <urn:alice> <urn:p:knows>+/<urn:p:name> ?n }
    """)
    assert {r["n"] for r in out.collect()} == {"Bob", "Bobby"}


def test_path_star_from_constant_includes_self(spark):
    chain = triples_df(spark, [
        ("urn:1", "urn:p:next", Uri("urn:2")),
        ("urn:2", "urn:p:next", Uri("urn:3")),
        ("urn:5", "urn:p:next", Uri("urn:6")),
    ])
    out = sparql_select(chain,
                        "SELECT ?y WHERE { <urn:1> <urn:p:next>* ?y }")
    assert {r["y"] for r in out.collect()} == {"urn:1", "urn:2", "urn:3"}
    # constant not in the graph still matches itself (zero-length)
    out2 = sparql_select(chain,
                         "SELECT ?y WHERE { <urn:99> <urn:p:next>* ?y }")
    assert {r["y"] for r in out2.collect()} == {"urn:99"}


def test_path_star_both_vars_binds_every_term(spark):
    g = triples_df(spark, [
        ("urn:1", "urn:p:n", Uri("urn:2")),
        ("urn:2", "urn:p:lbl", Literal("two", lang="en")),
    ])
    out = sparql_select(g, "SELECT ?x ?y WHERE { ?x <urn:p:n>* ?y }")
    got = {(r["x"], r["y"], r["y_kind"]) for r in out.collect()}
    # identity over ALL graph terms (incl. the literal) + the real edge
    assert got == {("urn:1", "urn:1", "uri"), ("urn:2", "urn:2", "uri"),
                   ("two", "two", "literal"), ("urn:1", "urn:2", "uri")}
    # ?x p* ?x binds every term to itself
    cyc = sparql_select(g, "SELECT ?x WHERE { ?x <urn:p:n>* ?x }")
    assert {r["x"] for r in cyc.collect()} == {"urn:1", "urn:2", "two"}


def test_path_star_in_sequence_subclassof_shape(small_graph):
    # knows*/name from alice: zero steps -> Alice's own name; one step ->
    # bob's names; two steps -> carol (no name)
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?n WHERE { <urn:alice> <urn:p:knows>*/<urn:p:name> ?n }
    """)
    assert {r["n"] for r in out.collect()} == {"Alice", "Bob", "Bobby"}


def test_path_opt_zero_or_one(spark):
    chain = triples_df(spark, [
        ("urn:1", "urn:p:next", Uri("urn:2")),
        ("urn:2", "urn:p:next", Uri("urn:3")),
    ])
    out = sparql_select(chain,
                        "SELECT ?y WHERE { <urn:1> <urn:p:next>? ?y }")
    # self + ONE step, never two
    assert {r["y"] for r in out.collect()} == {"urn:1", "urn:2"}


def test_path_star_const_const_zero_length(spark):
    g = triples_df(spark, [("urn:1", "urn:p:n", Uri("urn:2"))])
    # zero-length match grounds the pattern even with no connecting edge
    out = sparql_select(g, """
        SELECT ?o WHERE { <urn:9> <urn:p:n>* <urn:9> .
                          <urn:1> <urn:p:n> ?o }
    """)
    assert {r["o"] for r in out.collect()} == {"urn:2"}


@pytest.fixture(scope="module")
def mixed_path_graph(spark):
    # a -p-> b -q-> c -p-> d, plus two subjects sharing a literal object
    return triples_df(spark, [
        ("urn:a", "urn:p", Uri("urn:b")),
        ("urn:b", "urn:q", Uri("urn:c")),
        ("urn:c", "urn:p", Uri("urn:d")),
        ("urn:x", "urn:p", Literal("lit1")),
        ("urn:y", "urn:p", Literal("lit1")),
        ("urn:z", "urn:p", Literal("lit1", lang="en")),
    ])


def test_path_plus_over_sequence_group(mixed_path_graph):
    # (p/q)+ composes the two-step edge before closing: only a->c exists
    out = sparql_select(mixed_path_graph, """
        SELECT ?x ?y WHERE { ?x (<urn:p>/<urn:q>)+ ?y }
    """)
    assert {(r["x"], r["y"]) for r in out.collect()} == {("urn:a", "urn:c")}


def test_path_plus_over_inverse_group_and_sugar(mixed_path_graph):
    # (^p)+ from b reaches a; ^p+ is the same closure over reversed edges
    for q in ("SELECT ?x WHERE { <urn:b> (^<urn:p>)+ ?x }",
              "SELECT ?x WHERE { <urn:b> ^<urn:p>+ ?x }"):
        out = sparql_select(mixed_path_graph, q)
        assert {r["x"] for r in out.collect()} == {"urn:a"}


def test_path_plus_literal_continuation_full_term_identity(mixed_path_graph):
    # (p/^p)+: x and y meet at the shared plain literal "lit1"; z's
    # "lit1"@en is a DIFFERENT term, so z never joins them
    out = sparql_select(mixed_path_graph, """
        SELECT ?x ?y WHERE { ?x (<urn:p>/^<urn:p>)+ ?y .
                             FILTER(?x != ?y) }
    """)
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {("urn:x", "urn:y"), ("urn:y", "urn:x")}


def test_path_star_and_opt_over_sequence_group(mixed_path_graph):
    star = sparql_select(mixed_path_graph, """
        SELECT ?y WHERE { <urn:a> (<urn:p>/<urn:q>)* ?y }
    """)
    assert {r["y"] for r in star.collect()} == {"urn:a", "urn:c"}
    opt = sparql_select(mixed_path_graph, """
        SELECT ?y WHERE { <urn:a> (<urn:p>/<urn:q>)? ?y }
    """)
    assert {r["y"] for r in opt.collect()} == {"urn:a", "urn:c"}


def test_path_plus_mixed_direction_alternation(spark):
    # (in|^in)+ from a seed walks the component in both directions
    g = triples_df(spark, [
        ("urn:c1", "urn:in", Uri("urn:n1")),
        ("urn:c2", "urn:in", Uri("urn:n1")),
        ("urn:c3", "urn:in", Uri("urn:n2")),
    ])
    out = sparql_select(g, """
        SELECT ?x WHERE { <urn:c1> (<urn:in>|^<urn:in>)+ ?x }
    """)
    assert {r["x"] for r in out.collect()} == {"urn:n1", "urn:c1", "urn:c2"}


def test_path_quantified_group_rejects_nested_quantifiers():
    # negated sets inside quantified groups are now supported (SS18.4);
    # nested quantifiers remain the documented refusal
    with pytest.raises(SparqlSyntaxError, match="no nested quantifiers"):
        parse_query("SELECT ?x ?y WHERE { ?x (<urn:p>+/<urn:q>)+ ?y }")
    parse_query("SELECT ?x ?y WHERE { ?x (!<urn:p>)* ?y }")  # parses now


# ---------------------------------------------------------------------------
# aggregates
# ---------------------------------------------------------------------------

def test_parse_aggregates():
    q = parse_query("""
        SELECT ?g (COUNT(?v) AS ?n) (SUM(?v) AS ?total) WHERE {
            ?g <urn:p> ?v .
        } GROUP BY ?g
    """)
    assert q.group_by == ["g"]
    assert [(a.func, a.var, a.distinct, a.alias) for a in q.aggregates] == [
        ("count", "v", False, "n"), ("sum", "v", False, "total")]


def test_parse_aggregate_errors():
    with pytest.raises(SparqlSyntaxError, match="not in GROUP BY"):
        parse_query("SELECT ?a (COUNT(?v) AS ?n) WHERE { ?a <urn:p> ?v }")
    with pytest.raises(SparqlSyntaxError, match="only valid in COUNT"):
        parse_query("SELECT (SUM(*) AS ?n) WHERE { ?s ?p ?v }")
    with pytest.raises(SparqlSyntaxError, match="requires at least one"):
        parse_query("SELECT ?s WHERE { ?s ?p ?v } GROUP BY ?s")


def test_aggregate_count_group_by(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s (COUNT(?n) AS ?c) WHERE { ?s <urn:p:name> ?n }
        GROUP BY ?s ORDER BY ?s
    """)
    got = [(r["s"], r["c"]) for r in out.collect()]
    assert got == [("_:b1", 1), ("urn:alice", 1), ("urn:bob", 2)]


def test_aggregate_count_star_and_distinct(small_graph):
    out = sparql_select(small_graph, """
        SELECT (COUNT(*) AS ?all) (COUNT(DISTINCT ?p) AS ?preds) WHERE {
            ?s ?p ?o .
        }
    """)
    row = out.collect()[0]
    assert row["all"] == 8 and row["preds"] == 3


def test_aggregate_numeric_sum_avg(small_graph):
    out = sparql_select(small_graph, """
        SELECT (SUM(?a) AS ?total) (AVG(?a) AS ?mean)
               (MIN(?a) AS ?lo) (MAX(?a) AS ?hi)
        WHERE { ?s <urn:p:age> ?a }
    """)
    row = out.collect()[0]
    assert row["total"] == 63.0 and row["mean"] == 31.5
    assert row["lo"] == "29" and row["hi"] == "34"


def test_aggregate_order_by_alias(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s (COUNT(?n) AS ?c) WHERE { ?s <urn:p:name> ?n }
        GROUP BY ?s ORDER BY DESC(?c) LIMIT 1
    """)
    assert [(r["s"], r["c"]) for r in out.collect()] == [("urn:bob", 2)]


# ---------------------------------------------------------------------------
# EXISTS / NOT EXISTS / MINUS
# ---------------------------------------------------------------------------

def test_filter_exists_semi_join(small_graph):
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?s WHERE {
            ?s <urn:p:name> ?n .
            FILTER EXISTS { ?s <urn:p:knows> ?x }
        }
    """)
    got = sorted(r["s"] for r in out.collect())
    assert got == ["urn:alice", "urn:bob"]


def test_filter_not_exists_anti_join(small_graph):
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?s WHERE {
            ?s <urn:p:name> ?n .
            FILTER NOT EXISTS { ?s <urn:p:knows> ?x }
        }
    """)
    assert sorted(r["s"] for r in out.collect()) == ["_:b1"]


def test_exists_uncorrelated(small_graph):
    # no shared vars: keeps everything iff the sub-group has a solution
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?s WHERE {
            ?s <urn:p:age> ?a .
            FILTER EXISTS { <urn:alice> <urn:p:knows> <urn:bob> }
        }
    """)
    assert sorted(r["s"] for r in out.collect()) == ["urn:alice", "urn:carol"]
    empty = sparql_select(small_graph, """
        SELECT DISTINCT ?s WHERE {
            ?s <urn:p:age> ?a .
            FILTER EXISTS { <urn:alice> <urn:p:knows> <urn:carol> }
        }
    """)
    assert empty.count() == 0


def test_minus_removes_compatible(small_graph):
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?s ?n WHERE {
            ?s <urn:p:name> ?n .
            MINUS { ?s <urn:p:knows> <urn:carol> }
        }
    """)
    got = sorted((r["s"], r["n"]) for r in out.collect())
    assert got == [("_:b1", "Anon"), ("urn:alice", "Alice")]


def test_minus_disjoint_domains_removes_nothing(small_graph):
    # SPARQL 1.1 §8.3: MINUS with no shared variables is a no-op
    out = sparql_select(small_graph, """
        SELECT DISTINCT ?s WHERE {
            ?s <urn:p:name> ?n .
            MINUS { ?x <urn:p:age> ?y }
        }
    """)
    assert out.count() == 3


# ---------------------------------------------------------------------------
# VALUES / BIND
# ---------------------------------------------------------------------------

def test_values_single_var_constrains(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s ?n WHERE {
            ?s <urn:p:name> ?n .
            VALUES ?n { "Bobby" "Anon" }
        }
    """)
    got = sorted((r["s"], r["n"]) for r in out.collect())
    assert got == [("_:b1", "Anon"), ("urn:bob", "Bobby")]


def test_values_lang_tag_is_part_of_identity(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:name> ?n . VALUES ?n { "Bob" } }
    """)
    # graph has "Bob"@en, VALUES row is plain "Bob": no match
    assert out.count() == 0
    out2 = sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:name> ?n . VALUES ?n { "Bob"@en } }
    """)
    assert [r["s"] for r in out2.collect()] == ["urn:bob"]


def test_values_multi_var_with_undef(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s ?a ?tag WHERE {
            ?s <urn:p:age> ?a .
            VALUES (?s ?tag) { (<urn:alice> "A") (UNDEF "X") }
        }
    """)
    got = sorted((r["s"], r["a"], r["tag"]) for r in out.collect())
    assert got == [("urn:alice", "34", "A"), ("urn:alice", "34", "X"),
                   ("urn:carol", "29", "X")]


def test_values_introduces_new_var(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s ?cat WHERE {
            ?s <urn:p:knows> <urn:bob> .
            VALUES ?cat { "x" "y" }
        }
    """)
    got = sorted((r["s"], r["cat"]) for r in out.collect())
    assert got == [("urn:alice", "x"), ("urn:alice", "y")]


def test_bind_term_function(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?n ?l WHERE {
            <urn:bob> <urn:p:name> ?n .
            BIND (lang(?n) AS ?l)
        }
    """)
    got = sorted((r["n"], r["l"]) for r in out.collect())
    assert got == [("Bob", "en"), ("Bobby", "")]
    # BIND result is a plain literal binding
    kinds = {r["l_kind"] for r in out.collect()}
    assert kinds == {"literal"}


def test_bind_boolean_expression(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?n ?is_bobby WHERE {
            <urn:bob> <urn:p:name> ?n .
            BIND (str(?n) = "Bobby" AS ?is_bobby)
        }
    """)
    got = sorted((r["n"], r["is_bobby"]) for r in out.collect())
    assert got == [("Bob", "false"), ("Bobby", "true")]


def test_bind_alias_already_bound_raises(small_graph):
    with pytest.raises(SparqlCompileError, match="already bound"):
        sparql_select(small_graph, """
            SELECT ?s WHERE { ?s <urn:p:name> ?n . BIND (str(?n) AS ?n) }
        """).collect()


def test_bind_then_filter_on_alias(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s WHERE {
            ?s <urn:p:name> ?n .
            BIND (lang(?n) AS ?l)
            FILTER (?l = "en")
        }
    """)
    assert sorted(r["s"] for r in out.collect()) == ["urn:alice", "urn:bob"]


# ---------------------------------------------------------------------------
# HAVING
# ---------------------------------------------------------------------------

def test_having_filters_groups(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s (COUNT(?n) AS ?c) WHERE { ?s <urn:p:name> ?n }
        GROUP BY ?s HAVING (?c > 1)
    """)
    assert [(r["s"], r["c"]) for r in out.collect()] == [("urn:bob", 2)]


def test_having_conjunction_and_group_var(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s (COUNT(?n) AS ?c) WHERE { ?s <urn:p:name> ?n }
        GROUP BY ?s HAVING (?c >= 1 && ?c < 2) ORDER BY ?s
    """)
    got = [(r["s"], r["c"]) for r in out.collect()]
    assert got == [("_:b1", 1), ("urn:alice", 1)]


def test_having_without_aggregates_rejected():
    with pytest.raises(SparqlSyntaxError, match="HAVING requires"):
        parse_query("SELECT ?s WHERE { ?s ?p ?o } HAVING (?s > 1)")


# ---------------------------------------------------------------------------
# CONSTRUCT
# ---------------------------------------------------------------------------

def test_construct_basic_template(small_graph):
    from meresco_rdf_spark.sparql import sparql_construct
    out = sparql_construct(small_graph, """
        CONSTRUCT { ?a <urn:p:friend> ?b . ?a <urn:p:known> "yes" }
        WHERE { ?a <urn:p:knows> ?b }
    """)
    got = sorted((r.subj, r.pred, r.obj_value, r.obj_kind)
                 for r in out.collect())
    assert got == [
        ("urn:alice", "urn:p:friend", "urn:bob", "uri"),
        ("urn:alice", "urn:p:known", "yes", "literal"),
        ("urn:bob", "urn:p:friend", "urn:carol", "uri"),
        ("urn:bob", "urn:p:known", "yes", "literal"),
    ]


def test_construct_identity_roundtrip(small_graph):
    from meresco_rdf_spark.sparql import sparql_construct
    out = sparql_construct(small_graph, """
        CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }
    """)
    assert _rows(out) == _rows(small_graph)


def test_construct_bnodes_fresh_per_solution(small_graph):
    from meresco_rdf_spark.sparql import sparql_construct
    out = sparql_construct(small_graph, """
        CONSTRUCT { ?a <urn:p:card> _:c . _:c <urn:p:of> ?a }
        WHERE { ?a <urn:p:knows> ?b }
    """).collect()
    # two solutions (alice, bob) -> two distinct bnodes; within a
    # solution the same label is the same node
    card = {r.subj: r.obj_value for r in out if r.pred == "urn:p:card"}
    of = {r.obj_value: r.subj for r in out if r.pred == "urn:p:of"}
    assert set(card) == {"urn:alice", "urn:bob"}
    assert card["urn:alice"] != card["urn:bob"]
    for who, bnode in card.items():
        assert bnode.startswith("_:")
        assert of[who] == bnode


def test_construct_drops_invalid_instantiations(small_graph):
    from meresco_rdf_spark.sparql import sparql_construct
    # literal subjects are dropped per SPARQL 1.1 §16.2
    out = sparql_construct(small_graph, """
        CONSTRUCT { ?n <urn:p:x> ?a } WHERE { ?a <urn:p:name> ?n }
    """)
    assert out.count() == 0


def test_construct_unbound_template_var_raises(small_graph):
    from meresco_rdf_spark.sparql import sparql_construct
    with pytest.raises(SparqlCompileError, match="not bound"):
        sparql_construct(small_graph, """
            CONSTRUCT { ?a <urn:p:x> ?zzz } WHERE { ?a <urn:p:knows> ?b }
        """)


def test_construct_select_dispatch_guards(small_graph):
    from meresco_rdf_spark.sparql import sparql_construct
    with pytest.raises(SparqlCompileError, match="sparql_construct"):
        sparql_select(small_graph, "CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }")
    with pytest.raises(SparqlCompileError, match="sparql_select"):
        sparql_construct(small_graph, "SELECT ?s WHERE { ?s ?p ?o }")


def test_construct_output_composes_with_select(small_graph):
    from meresco_rdf_spark.sparql import sparql_construct
    derived = sparql_construct(small_graph, """
        CONSTRUCT { ?a <urn:p:friend> ?b } WHERE { ?a <urn:p:knows> ?b }
    """)
    out = sparql_select(derived, """
        SELECT ?b WHERE { <urn:alice> <urn:p:friend> ?b }
    """)
    assert [r["b"] for r in out.collect()] == ["urn:bob"]


def test_construct_template_path_rejected():
    with pytest.raises(SparqlSyntaxError, match="not allowed"):
        parse_query("""
            CONSTRUCT { ?a <urn:p>+ ?b } WHERE { ?a <urn:p> ?b }
        """)


def test_values_row_arity_mismatch_rejected():
    with pytest.raises(SparqlSyntaxError, match="arity"):
        parse_query("""
            SELECT ?s WHERE {
                ?s ?p ?o . VALUES (?a ?b) { ("x") }
            }
        """)


# ---------------------------------------------------------------------------
# ASK / DESCRIBE
# ---------------------------------------------------------------------------

def test_ask_true_and_false(small_graph):
    from meresco_rdf_spark.sparql import sparql_ask
    yes = sparql_ask(small_graph, """
        ASK { <urn:alice> <urn:p:knows> ?x . ?x <urn:p:name> "Bob"@en }
    """)
    assert yes.collect()[0]["ask"] is True
    no = sparql_ask(small_graph, """
        ASK WHERE { <urn:carol> <urn:p:knows> ?x }
    """)
    assert no.collect()[0]["ask"] is False


def test_ask_with_filter(small_graph):
    from meresco_rdf_spark.sparql import sparql_ask
    out = sparql_ask(small_graph, """
        ASK { ?s <urn:p:age> ?a . FILTER (?a > 30) }
    """)
    assert out.collect()[0]["ask"] is True
    out2 = sparql_ask(small_graph, """
        ASK { ?s <urn:p:age> ?a . FILTER (?a > 40) }
    """)
    assert out2.collect()[0]["ask"] is False


def test_describe_constant_subject(small_graph):
    from meresco_rdf_spark.sparql import sparql_describe
    out = sparql_describe(small_graph, "DESCRIBE <urn:alice>")
    got = sorted((r.subj, r.pred, r.obj_value) for r in out.collect())
    assert got == [
        ("urn:alice", "urn:p:age", "34"),
        ("urn:alice", "urn:p:knows", "urn:bob"),
        ("urn:alice", "urn:p:name", "Alice"),
    ]


def test_describe_variable_with_where(small_graph):
    from meresco_rdf_spark.sparql import sparql_describe
    out = sparql_describe(small_graph, """
        DESCRIBE ?s WHERE { ?s <urn:p:name> "Bobby" }
    """)
    subjects = {r.subj for r in out.collect()}
    assert subjects == {"urn:bob"}
    assert out.count() == 3  # Bob's two names + knows edge


def test_describe_bnode_closure(spark):
    from meresco_rdf_spark.sparql import sparql_describe
    g = triples_df(spark, [
        ("urn:doc", "urn:p:part", BNode("_:b1")),
        ("_:b1", "urn:p:part", BNode("_:b2")),
        ("_:b2", "urn:p:val", Literal("leaf")),
        ("urn:doc", "urn:p:title", Literal("Doc")),
        ("urn:other", "urn:p:val", Literal("unrelated")),
    ])
    out = sparql_describe(g, "DESCRIBE <urn:doc>")
    got = sorted((r.subj, r.pred, r.obj_value) for r in out.collect())
    assert got == [
        ("_:b1", "urn:p:part", "_:b2"),
        ("_:b2", "urn:p:val", "leaf"),
        ("urn:doc", "urn:p:part", "_:b1"),
        ("urn:doc", "urn:p:title", "Doc"),
    ]


def test_describe_bnode_cycle_terminates(spark):
    from meresco_rdf_spark.sparql import sparql_describe
    g = triples_df(spark, [
        ("urn:doc", "urn:p:part", BNode("_:x")),
        ("_:x", "urn:p:next", BNode("_:y")),
        ("_:y", "urn:p:next", BNode("_:x")),
    ])
    out = sparql_describe(g, "DESCRIBE <urn:doc>")
    assert out.count() == 3


def test_describe_multiple_resources(small_graph):
    from meresco_rdf_spark.sparql import sparql_describe
    out = sparql_describe(small_graph, "DESCRIBE <urn:alice> <urn:carol>")
    subjects = {r.subj for r in out.collect()}
    assert subjects == {"urn:alice", "urn:carol"}


def test_describe_var_requires_where():
    with pytest.raises(SparqlSyntaxError, match="requires a WHERE"):
        parse_query("DESCRIBE ?x")


def test_ask_describe_dispatch_guards(small_graph):
    from meresco_rdf_spark.sparql import sparql_ask, sparql_describe
    with pytest.raises(SparqlCompileError, match="sparql_ask"):
        sparql_select(small_graph, "ASK { ?s ?p ?o }")
    with pytest.raises(SparqlCompileError, match="sparql_describe"):
        sparql_select(small_graph, "DESCRIBE <urn:alice>")
    with pytest.raises(SparqlCompileError, match="not an ASK"):
        sparql_ask(small_graph, "SELECT ?s WHERE { ?s ?p ?o }")
    with pytest.raises(SparqlCompileError, match="not a DESCRIBE"):
        sparql_describe(small_graph, "SELECT ?s WHERE { ?s ?p ?o }")


# ---------------------------------------------------------------------------
# SAMPLE / GROUP_CONCAT aggregates
# ---------------------------------------------------------------------------

def test_parse_sample_and_group_concat():
    q = parse_query("""
        SELECT ?s (SAMPLE(?n) AS ?one)
                  (GROUP_CONCAT(DISTINCT ?n ; SEPARATOR=", ") AS ?all)
        WHERE { ?s <urn:p:name> ?n } GROUP BY ?s
    """)
    assert [a.func for a in q.aggregates] == ["sample", "group_concat"]
    assert q.aggregates[1].separator == ", "
    assert q.aggregates[1].distinct
    with pytest.raises(SparqlSyntaxError, match="SEPARATOR"):
        parse_query("""SELECT (SUM(?x ; SEPARATOR=",") AS ?s)
                       WHERE { ?a ?p ?x }""")


def test_aggregate_sample_deterministic(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s (SAMPLE(?n) AS ?one) WHERE { ?s <urn:p:name> ?n }
        GROUP BY ?s
    """)
    got = {(r["s"], r["one"]) for r in out.collect()}
    # bob has two names; the pinned deterministic sample is the minimum
    assert got == {("urn:alice", "Alice"), ("urn:bob", "Bob"),
                   ("_:b1", "Anon")}


def test_aggregate_group_concat_sorted(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s (GROUP_CONCAT(?n ; SEPARATOR=", ") AS ?names)
        WHERE { ?s <urn:p:name> ?n } GROUP BY ?s
    """)
    got = dict((r["s"], r["names"]) for r in out.collect())
    assert got["urn:bob"] == "Bob, Bobby"  # lexically sorted
    assert got["urn:alice"] == "Alice"


def test_aggregate_group_concat_global_default_sep(small_graph):
    out = sparql_select(small_graph, """
        SELECT (GROUP_CONCAT(DISTINCT ?n) AS ?all)
        WHERE { ?s <urn:p:name> ?n }
    """)
    assert out.collect()[0]["all"] == "Alice Anon Bob Bobby"


# ---------------------------------------------------------------------------
# scalar built-ins (SPARQL 1.1 §17.4 subset)
# ---------------------------------------------------------------------------

def test_filter_strstarts_contains_strends(small_graph):
    got = {r["n"] for r in sparql_select(small_graph, """
        SELECT ?n WHERE { ?s <urn:p:name> ?n FILTER(strstarts(?n, "Bob")) }
    """).collect()}
    assert got == {"Bob", "Bobby"}
    got = {r["s"] for r in sparql_select(small_graph, """
        SELECT ?s WHERE { ?s ?p ?o FILTER(contains(str(?s), "carol")) }
    """).collect()}
    assert got == {"urn:carol"}
    got = {r["n"] for r in sparql_select(small_graph, """
        SELECT ?n WHERE { ?s <urn:p:name> ?n FILTER(strends(?n, "by")) }
    """).collect()}
    assert got == {"Bobby"}


def test_filter_is_kind_tests(small_graph):
    got = {r["s"] for r in sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:name> ?n FILTER(isBlank(?s)) }
    """).collect()}
    assert got == {"_:b1"}
    got = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:alice> ?p ?o FILTER(isURI(?o)) }
    """).collect()}
    assert got == {"urn:bob"}
    got = sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:alice> ?p ?o FILTER(isLiteral(?o)) }
    """).count()
    assert got == 2  # name + age


def test_filter_strlen_numeric_compare(small_graph):
    got = {r["n"] for r in sparql_select(small_graph, """
        SELECT ?n WHERE { ?s <urn:p:name> ?n FILTER(strlen(?n) > 4) }
    """).collect()}
    assert got == {"Alice", "Bobby"}


def test_filter_langmatches(small_graph):
    got = {r["n"] for r in sparql_select(small_graph, """
        SELECT ?n WHERE { ?s <urn:p:name> ?n
                          FILTER(langmatches(lang(?n), "en")) }
    """).collect()}
    assert got == {"Alice", "Bob"}
    got = {r["n"] for r in sparql_select(small_graph, """
        SELECT ?n WHERE { ?s <urn:p:name> ?n
                          FILTER(!langmatches(lang(?n), "*")) }
    """).collect()}
    assert got == {"Bobby", "Anon"}


def test_bind_case_and_substr(small_graph):
    rows = sparql_select(small_graph, """
        SELECT ?n ?u ?pre WHERE {
            <urn:bob> <urn:p:name> ?n .
            BIND(ucase(?n) AS ?u)
            BIND(substr(?n, 1, 3) AS ?pre)
        }
    """).collect()
    got = {(r["n"], r["u"], r["u_lang"], r["pre"]) for r in rows}
    # UCASE preserves the language tag
    assert got == {("Bob", "BOB", "en", "Bob"), ("Bobby", "BOBBY", None, "Bob")}


def test_bind_concat_lang_compatibility(small_graph):
    rows = sparql_select(small_graph, """
        SELECT ?n ?x ?y WHERE {
            <urn:alice> <urn:p:name> ?n .
            BIND(concat(?n, "!") AS ?x)
            BIND(concat(?n, ?n) AS ?y)
        }
    """).collect()
    r = rows[0]
    assert r["x"] == "Alice!" and r["x_lang"] is None  # mixed lang -> plain
    assert r["y"] == "AliceAlice" and r["y_lang"] == "en"  # same lang kept


def test_bind_strbefore_strafter_replace(small_graph):
    rows = sparql_select(small_graph, """
        SELECT ?s ?local ?ns ?sub WHERE {
            ?s <urn:p:age> ?a .
            BIND(strafter(str(?s), "urn:") AS ?local)
            BIND(strbefore(str(?s), ":") AS ?ns)
            BIND(replace(?local, "[aeiou]", "_") AS ?sub)
        }
    """).collect()
    got = {(r["local"], r["ns"], r["sub"]) for r in rows}
    assert got == {("alice", "urn", "_l_c_"), ("carol", "urn", "c_r_l")}


def test_strbefore_strafter_edge_cases(small_graph):
    rows = sparql_select(small_graph, """
        SELECT ?n ?nom ?emp ?all WHERE {
            <urn:alice> <urn:p:name> ?n .
            BIND(strbefore(?n, "zzz") AS ?nom)
            BIND(strbefore(?n, "") AS ?emp)
            BIND(strafter(?n, "") AS ?all)
        }
    """).collect()
    r = rows[0]
    assert r["nom"] == ""     # no match -> empty string
    assert r["emp"] == ""     # empty needle -> "" (spec)
    assert r["all"] == "Alice"  # strafter empty needle -> whole string


def test_bind_coalesce_with_optional(small_graph):
    rows = sparql_select(small_graph, """
        SELECT ?s ?a2 WHERE {
            ?s <urn:p:name> ?n .
            OPTIONAL { ?s <urn:p:age> ?age }
            BIND(coalesce(?age, "unknown") AS ?a2)
        }
    """).collect()
    got = {(r["s"], r["a2"], r["a2_kind"]) for r in rows}
    assert ("urn:alice", "34", "literal") in got
    assert ("urn:bob", "unknown", "literal") in got
    assert ("_:b1", "unknown", "literal") in got


def test_bind_if_and_round(small_graph):
    rows = sparql_select(small_graph, """
        SELECT ?s ?bucket WHERE {
            ?s <urn:p:age> ?a .
            BIND(if(?a >= 30, "old", "young") AS ?bucket)
        }
    """).collect()
    got = {(r["s"], r["bucket"]) for r in rows}
    assert got == {("urn:alice", "old"), ("urn:carol", "young")}
    got = {r["s"] for r in sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:age> ?a FILTER(floor(?a) >= 30) }
    """).collect()}
    assert got == {"urn:alice"}


def test_numeric_lexical_form(small_graph):
    # strlen/round render integral results without a trailing ".0"
    rows = sparql_select(small_graph, """
        SELECT ?n ?len WHERE {
            <urn:alice> <urn:p:name> ?n . BIND(strlen(?n) AS ?len)
        }
    """).collect()
    assert rows[0]["len"] == "5"


# ---------------------------------------------------------------------------
# SPARQL 1.1 Update
# ---------------------------------------------------------------------------

from meresco_rdf_spark.sparql import sparql_update, sparql_update_sets
from meresco_rdf_spark.sparql.parser import UpdateQuery


def _triples(df):
    return {tuple(r) for r in
            df.select("subj", "pred", "obj_value", "obj_kind",
                      "obj_lang").collect()}


def test_parse_update_forms():
    q = parse_query('INSERT DATA { <urn:a> <urn:p> "x" }')
    assert isinstance(q, UpdateQuery) and q.data_form
    assert q.insert_template and q.delete_template is None
    q = parse_query('DELETE WHERE { ?s <urn:p> ?o }')
    assert q.delete_template == q.where.parts[0].patterns
    q = parse_query("""DELETE { ?s <urn:p> ?o } INSERT { ?s <urn:q> ?o }
                       WHERE { ?s <urn:p> ?o }""")
    assert q.delete_template and q.insert_template and q.where


def test_parse_update_errors():
    with pytest.raises(SparqlSyntaxError, match="ground"):
        parse_query('INSERT DATA { ?s <urn:p> "x" }')
    with pytest.raises(SparqlSyntaxError, match="blank nodes"):
        parse_query('DELETE DATA { _:b <urn:p> "x" }')
    with pytest.raises(SparqlSyntaxError, match="blank nodes"):
        parse_query('DELETE { _:b <urn:p> ?o } WHERE { ?s <urn:p> ?o }')
    with pytest.raises(SparqlSyntaxError, match="plain basic graph"):
        parse_query("""DELETE WHERE { ?s <urn:p> ?o
                       FILTER(isLiteral(?o)) }""")
    with pytest.raises(SparqlSyntaxError, match="property paths"):
        parse_query('DELETE WHERE { ?s <urn:p>+ ?o }')
    with pytest.raises(SparqlSyntaxError, match="path sequences"):
        parse_query('INSERT { ?s <urn:p>/<urn:q> ?o } WHERE { ?s ?p ?o }')


def test_insert_data_set_semantics(small_graph):
    out = sparql_update(small_graph, """
        INSERT DATA {
            <urn:dave> <urn:p:name> "Dave" .
            <urn:alice> <urn:p:knows> <urn:bob> .
        }
    """)
    # re-inserting an existing triple is a no-op (reference graph.py:45-51)
    assert out.count() == small_graph.count() + 1
    assert ("urn:dave", "urn:p:name", "Dave", "literal", None) in _triples(out)


def test_delete_data_lang_sensitive(small_graph):
    # "Alice" plain does NOT match "Alice"@en — full term identity
    out = sparql_update(small_graph,
                        'DELETE DATA { <urn:alice> <urn:p:name> "Alice" }')
    assert out.count() == small_graph.count()
    out = sparql_update(
        small_graph,
        'DELETE DATA { <urn:alice> <urn:p:name> "Alice"@en }')
    assert out.count() == small_graph.count() - 1


def test_delete_where(small_graph):
    out = sparql_update(small_graph,
                        'DELETE WHERE { ?s <urn:p:name> ?n }')
    assert _triples(out) == {
        ("urn:alice", "urn:p:knows", "urn:bob", "uri", None),
        ("urn:alice", "urn:p:age", "34", "literal", None),
        ("urn:bob", "urn:p:knows", "urn:carol", "uri", None),
        ("urn:carol", "urn:p:age", "29", "literal", None),
    }


def test_delete_insert_where_pre_state(small_graph):
    # both halves instantiate against the PRE-update graph: the rename
    # sees every name triple even though DELETE removes them
    out = sparql_update(small_graph, """
        DELETE { ?s <urn:p:name> ?n }
        INSERT { ?s <urn:p:label> ?n }
        WHERE { ?s <urn:p:name> ?n }
    """)
    t = _triples(out)
    assert ("urn:bob", "urn:p:label", "Bob", "literal", "en") in t
    assert ("urn:bob", "urn:p:label", "Bobby", "literal", None) in t
    assert not any(p == "urn:p:name" for _, p, _, _, _ in t)
    assert out.count() == small_graph.count()  # pure rename


def test_insert_where_fresh_bnodes(small_graph):
    out = sparql_update(small_graph, """
        INSERT { _:m <urn:p:of> ?s . _:m <urn:p:v> ?n }
        WHERE { ?s <urn:p:age> ?n }
    """)
    new = _triples(out) - _triples(small_graph)
    # 2 solutions x 2 template triples, one fresh bnode per solution
    assert len(new) == 4
    bnodes = {s for s, _, _, _, _ in new}
    assert len(bnodes) == 2 and all(b.startswith("_:") for b in bnodes)
    by_bnode = {}
    for s, p, v, k, _ in new:
        by_bnode.setdefault(s, set()).add((p, v))
    # each solution's template triples share ITS bnode
    assert sorted(sorted(v) for v in by_bnode.values()) == sorted([
        sorted({("urn:p:of", "urn:alice"), ("urn:p:v", "34")}),
        sorted({("urn:p:of", "urn:carol"), ("urn:p:v", "29")})])


def test_update_invalid_instantiations_dropped(small_graph):
    # literal in subject position after substitution -> triple dropped
    out = sparql_update(small_graph, """
        INSERT { ?n <urn:p:tag> "x" } WHERE { ?s <urn:p:name> ?n }
    """)
    assert _triples(out) == _triples(small_graph)


def test_update_sets_compose_with_merge(small_graph):
    dels, ins = sparql_update_sets(small_graph, """
        DELETE { ?s ?p ?o } WHERE { ?s ?p ?o FILTER(isLiteral(?o)) }
    """)
    assert ins is None
    assert dels.count() == 6  # all literal-object triples
    assert set(dels.columns) == {"subj", "pred", "obj_value", "obj_kind",
                                 "obj_lang"}


def test_update_dispatch_guards(small_graph):
    with pytest.raises(SparqlCompileError, match="sparql_update"):
        sparql_select(small_graph, 'INSERT DATA { <urn:a> <urn:p> "x" }')
    with pytest.raises(SparqlCompileError, match="not an update"):
        sparql_update(small_graph, "SELECT ?s WHERE { ?s ?p ?o }")


# ---------------------------------------------------------------------------
# sub-selects (SPARQL 1.1 §12)
# ---------------------------------------------------------------------------

from meresco_rdf_spark.sparql.parser import SubSelect


def test_parse_subselect():
    q = parse_query("""
        SELECT ?s ?n WHERE {
            ?s <urn:p:name> ?nm .
            { SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <urn:p> ?o }
              GROUP BY ?s }
        }
    """)
    subs = [p for p in q.where.parts if isinstance(p, SubSelect)]
    assert len(subs) == 1
    assert subs[0].query.aggregates[0].alias == "n"
    with pytest.raises(SparqlSyntaxError, match="UNION branch"):
        parse_query("""SELECT ?s WHERE {
            { SELECT ?s WHERE { ?s ?p ?o } } UNION { ?s ?p ?o } }""")


def test_subselect_aggregate_joins_outer(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s ?name ?n WHERE {
            ?s <urn:p:name> ?name .
            { SELECT ?s (COUNT(?o) AS ?n)
              WHERE { ?s <urn:p:knows> ?o } GROUP BY ?s }
        }
    """)
    rows = {(r["s"], r["name"], r["n"], r["n_kind"]) for r in out.collect()}
    # only subjects with a knows edge survive the (inner) join
    assert rows == {("urn:alice", "Alice", "1", "literal"),
                    ("urn:bob", "Bob", "1", "literal"),
                    ("urn:bob", "Bobby", "1", "literal")}


def test_subselect_limit_scopes_inside(small_graph):
    # ORDER BY + LIMIT apply INSIDE the sub-select, before the outer join
    out = sparql_select(small_graph, """
        SELECT ?s ?who WHERE {
            ?s <urn:p:knows> ?who .
            { SELECT ?s WHERE { ?s <urn:p:age> ?a }
              ORDER BY ?a LIMIT 1 }
        }
    """)
    rows = {(r["s"], r["who"]) for r in out.collect()}
    # min age is carol (29) — but carol knows nobody; ORDER BY ?a picks
    # "29" lexically first, so the sub-select yields carol only
    assert rows == set()
    out2 = sparql_select(small_graph, """
        SELECT ?s ?who WHERE {
            ?s <urn:p:knows> ?who .
            { SELECT ?s WHERE { ?s <urn:p:age> ?a }
              ORDER BY DESC(?a) LIMIT 1 }
        }
    """)
    rows2 = {(r["s"], r["who"]) for r in out2.collect()}
    assert rows2 == {("urn:alice", "urn:bob")}


def test_subselect_leading_position(small_graph):
    # a sub-select can open the group (no preceding pattern required)
    out = sparql_select(small_graph, """
        SELECT ?s ?n WHERE {
            { SELECT ?s (COUNT(?x) AS ?n)
              WHERE { ?s <urn:p:name> ?x } GROUP BY ?s }
            ?s <urn:p:age> ?a .
        }
    """)
    rows = {(r["s"], r["n"]) for r in out.collect()}
    assert rows == {("urn:alice", "1")}


# ---------------------------------------------------------------------------
# arithmetic expressions
# ---------------------------------------------------------------------------

def test_filter_arithmetic(small_graph):
    got = {r["s"] for r in sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:age> ?a FILTER(?a + 5 > 35) }
    """).collect()}
    assert got == {"urn:alice"}
    got = {r["s"] for r in sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:age> ?a FILTER(?a - 30 > 0) }
    """).collect()}
    assert got == {"urn:alice"}
    # signed-literal juxtaposition: "?a -30" means subtraction
    got = {r["s"] for r in sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:age> ?a FILTER(?a -30 > 0) }
    """).collect()}
    assert got == {"urn:alice"}


def test_bind_arithmetic_precedence(small_graph):
    rows = sparql_select(small_graph, """
        SELECT ?s ?d ?h ?m WHERE {
            ?s <urn:p:age> ?a .
            BIND(?a * 2 AS ?d)
            BIND(?a / 2 AS ?h)
            BIND(?a + 2 * 3 AS ?m)
        }
    """).collect()
    got = {(r["s"], r["d"], r["h"], r["m"]) for r in rows}
    # integral doubles render without ".0"; 29/2 keeps the fraction;
    # * binds tighter than +
    assert got == {("urn:alice", "68", "17", "40"),
                   ("urn:carol", "58", "14.5", "35")}


def test_arithmetic_error_eliminates_row(small_graph):
    # non-numeric operand -> NULL -> FILTER error semantics (row dropped)
    got = sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:name> ?n FILTER(?n + 1 > 0) }
    """).count()
    assert got == 0
    # BIND error leaves the variable unbound but keeps the row
    rows = sparql_select(small_graph, """
        SELECT ?s ?x WHERE {
            ?s <urn:p:name> ?n . BIND(?n * 2 AS ?x)
        }
    """).collect()
    assert len(rows) == 4 and all(r["x"] is None for r in rows)


# ---------------------------------------------------------------------------
# negated property sets
# ---------------------------------------------------------------------------

def test_negated_property_set(small_graph):
    got = {(r["s"], r["o"]) for r in sparql_select(small_graph, """
        SELECT ?s ?o WHERE { ?s !<urn:p:name> ?o }
    """).collect()}
    assert got == {("urn:alice", "urn:bob"), ("urn:alice", "34"),
                   ("urn:bob", "urn:carol"), ("urn:carol", "29")}
    got = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:alice> !(<urn:p:name>|<urn:p:age>) ?o }
    """).collect()}
    assert got == {"urn:bob"}


def test_negated_set_in_sequence_and_errors(small_graph):
    # usable as a step inside a path sequence
    got = {r["n"] for r in sparql_select(small_graph, """
        SELECT ?n WHERE { <urn:alice> !<urn:p:name>/<urn:p:name> ?n }
    """).collect()}
    assert got == {"Bob", "Bobby"}
    with pytest.raises(SparqlSyntaxError, match="property paths"):
        parse_query("CONSTRUCT { ?s !<urn:p> ?o } WHERE { ?s ?p ?o }")


def test_negated_set_inverse_members(small_graph):
    # !^p: every edge ARRIVING at the subject whose predicate is not p
    # (§18.4 — the inverse component swaps the endpoint terms)
    got = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:carol> !(^<urn:p:name>) ?o }
    """).collect()}
    assert got == {"urn:bob"}  # bob knows carol; knows not-in {name}
    # bare !^iri form
    got = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:carol> !^<urn:p:knows> ?o }
    """).collect()}
    assert got == set()  # the only inbound edge IS knows
    # mixed set = union of forward and inverse components
    got = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:bob> !(<urn:p:name>|^<urn:p:knows>) ?o }
    """).collect()}
    assert got == {"urn:carol"}  # fwd: knows->carol; inv: only alice-knows
    got = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:bob> !(<urn:p:name>|^<urn:p:name>) ?o }
    """).collect()}
    assert got == {"urn:carol", "urn:alice"}  # inv side now admits knows


# ---------------------------------------------------------------------------
# IN / NOT IN, sameTerm, ENCODE_FOR_URI, IRI expression primaries
# ---------------------------------------------------------------------------

def test_filter_in_and_not_in(small_graph):
    got = {r["s"] for r in sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:knows> ?o
                          FILTER(?o IN (<urn:bob>, <urn:carol>)) }
    """).collect()}
    assert got == {"urn:alice", "urn:bob"}
    got = {r["s"] for r in sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:knows> ?o
                          FILTER(?o NOT IN (<urn:bob>)) }
    """).collect()}
    assert got == {"urn:bob"}
    # literals participate with full term identity (lang matters)
    got = {r["s"] for r in sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:name> ?n FILTER(?n IN ("Bob"@en, "Anon")) }
    """).collect()}
    assert got == {"urn:bob", "_:b1"}


def test_filter_iri_equality(small_graph):
    got = {r["p"] for r in sparql_select(small_graph, """
        SELECT ?p WHERE { ?s ?p ?o FILTER(?s = <urn:carol>) }
    """).collect()}
    assert got == {"urn:p:age"}


def test_sameterm(small_graph):
    got = {r["s"] for r in sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:name> ?n FILTER(sameterm(?n, "Bob"@en)) }
    """).collect()}
    assert got == {"urn:bob"}
    # sameterm distinguishes lang where plain = would also fail, but
    # unlike "=" it never errors on unbound: test via OPTIONAL
    got = sparql_select(small_graph, """
        SELECT ?s WHERE {
            ?s <urn:p:name> ?n
            OPTIONAL { ?s <urn:p:age> ?a }
            FILTER(sameterm(?a, "34"))
        }
    """).collect()
    assert {r["s"] for r in got} == {"urn:alice"}


def test_encode_for_uri(small_graph):
    rows = sparql_select(small_graph, """
        SELECT ?e WHERE {
            <urn:bob> <urn:p:name> ?n . FILTER(langmatches(lang(?n), "en"))
            BIND(encode_for_uri(concat(?n, " & co/+")) AS ?e)
        }
    """).collect()
    # space -> %20 (not '+'), '&' '/' '+' percent-encoded
    assert rows[0]["e"] == "Bob%20%26%20co%2F%2B"


def test_order_by_term_type_precedence(spark):
    # SPARQL §15.1: bnode < IRI < literal, then value
    g = triples_df(spark, [
        ("urn:s", "urn:p", Uri("urn:z")),
        ("urn:s", "urn:p", Literal("aaa")),
        ("urn:s", "urn:p", BNode("_:b")),
    ])
    out = sparql_select(g, """
        SELECT ?o WHERE { <urn:s> <urn:p> ?o } ORDER BY ?o
    """).collect()
    assert [r["o"] for r in out] == ["_:b", "urn:z", "aaa"]
    out = sparql_select(g, """
        SELECT ?o WHERE { <urn:s> <urn:p> ?o } ORDER BY DESC(?o)
    """).collect()
    assert [r["o"] for r in out] == ["aaa", "urn:z", "_:b"]


def test_construct_where_shorthand(small_graph):
    from meresco_rdf_spark.sparql import sparql_construct

    out = sparql_construct(small_graph, """
        CONSTRUCT WHERE { ?s <urn:p:knows> ?o }
    """)
    got = {(r.subj, r.pred, r.obj_value) for r in out.collect()}
    assert got == {("urn:alice", "urn:p:knows", "urn:bob"),
                   ("urn:bob", "urn:p:knows", "urn:carol")}
    with pytest.raises(SparqlSyntaxError, match="plain basic graph"):
        parse_query("""CONSTRUCT WHERE { ?s <urn:p> ?o
                       FILTER(isLiteral(?o)) }""")


def test_aggregate_over_expression(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s (SUM(strlen(?n)) AS ?chars)
                  (MIN(strlen(?n)) AS ?shortest)
        WHERE { ?s <urn:p:name> ?n } GROUP BY ?s
    """)
    got = {(r["s"], r["chars"], r["shortest"]) for r in out.collect()}
    # bob: Bob(3) + Bobby(5); numeric MIN renders without ".0"
    assert ("urn:bob", 8.0, "3") in got
    assert ("urn:alice", 5.0, "5") in got
    out = sparql_select(small_graph, """
        SELECT (AVG(?a + 1) AS ?m) WHERE { ?s <urn:p:age> ?a }
    """)
    assert out.collect()[0]["m"] == 32.5  # (35 + 30) / 2
    # numeric MIN over values where lexical order would disagree
    out = sparql_select(small_graph, """
        SELECT (MIN(?a - 25) AS ?lo) (MAX(?a - 25) AS ?hi)
        WHERE { ?s <urn:p:age> ?a }
    """)
    r = out.collect()[0]
    assert (r["lo"], r["hi"]) == ("4", "9")  # lexical max would be "9" too,
    # but lexical MIN of {"4","9"} is "4" while numeric of {4,9} agrees;
    # the trap case is {4, 10}:
    out = sparql_select(small_graph, """
        SELECT (MAX(?a - 24) AS ?hi) WHERE { ?s <urn:p:age> ?a }
    """)
    assert out.collect()[0]["hi"] == "10"  # lexical MAX would pick "5"


def test_having_inline_aggregates(small_graph):
    # HAVING aggregate without an alias; GROUP BY with no projected agg
    out = sparql_select(small_graph, """
        SELECT ?s WHERE { ?s <urn:p:name> ?n }
        GROUP BY ?s HAVING (COUNT(?n) > 1)
    """)
    assert out.columns == ["s", "s_kind", "s_lang"]
    assert {r["s"] for r in out.collect()} == {"urn:bob"}
    # mixed projected + inline expression aggregate
    out = sparql_select(small_graph, """
        SELECT ?s (COUNT(?n) AS ?c) WHERE { ?s <urn:p:name> ?n }
        GROUP BY ?s HAVING (MAX(strlen(?n)) >= 5)
    """)
    got = {(r["s"], r["c"]) for r in out.collect()}
    assert got == {("urn:alice", 1), ("urn:bob", 2)}
    # HAVING with neither aggregates nor GROUP BY still rejected
    with pytest.raises(SparqlSyntaxError, match="HAVING requires"):
        parse_query("SELECT ?s WHERE { ?s ?p ?o } HAVING (?s > 1)")


# ---------------------------------------------------------------------------
# round-3 advisor fixes: ANSI-safe division, term-identity DISTINCT,
# numeric ordering of MIN/MAX aliases, XPath regex flags
# ---------------------------------------------------------------------------

def test_division_by_zero_yields_unbound_not_error(small_graph):
    # Spark 4 ANSI mode throws DIVIDE_BY_ZERO on plain '/'; SPARQL says a
    # zero divisor is an expression ERROR: BIND leaves the var unbound,
    # FILTER eliminates the row — the query itself must not abort
    rows = sparql_select(small_graph, """
        SELECT ?s ?d WHERE {
            ?s <urn:p:age> ?a .
            BIND(1 / (?a - 29) AS ?d)
        } ORDER BY ?s
    """).collect()
    got = {(r["s"], r["d"]) for r in rows}
    assert got == {("urn:alice", "0.2"), ("urn:carol", None)}
    # FILTER over a zero divisor eliminates the row, no exception
    out = sparql_select(small_graph, """
        SELECT ?s WHERE {
            ?s <urn:p:age> ?a .
            FILTER(1 / (?a - 29) > 0)
        }
    """)
    assert [r["s"] for r in out.collect()] == ["urn:alice"]


def test_count_distinct_expression_uses_term_identity(spark):
    # same lexical value, different kind (uri vs literal): DISTINCT over
    # an expression must count full term identity like the variable path
    g = triples_df(spark, [
        ("urn:x", "urn:p:v", Uri("urn:same")),
        ("urn:y", "urn:p:v", Literal("urn:same")),
    ])
    row = sparql_select(g, """
        SELECT (COUNT(DISTINCT COALESCE(?o, ?o)) AS ?n)
        WHERE { ?s <urn:p:v> ?o }
    """).collect()[0]
    assert row["n"] == 2


def test_order_by_numeric_minmax_alias(spark):
    # MAX over a numeric expression renders lexically ('9' vs '10'):
    # ORDER BY the alias must still sort numerically
    g = triples_df(spark, [
        ("urn:a", "urn:p:age", Literal("9")),
        ("urn:b", "urn:p:age", Literal("10")),
        ("urn:c", "urn:p:age", Literal("2")),
    ])
    out = sparql_select(g, """
        SELECT ?s (MAX(?a + 0) AS ?m) WHERE { ?s <urn:p:age> ?a }
        GROUP BY ?s ORDER BY DESC(?m)
    """)
    assert [r["m"] for r in out.collect()] == ["10", "9", "2"]


def test_replace_and_regex_xpath_flags(small_graph):
    # 'q': pattern is a literal string, not a regex
    rows = sparql_select(small_graph, """
        SELECT ?s ?y WHERE {
            <urn:alice> <urn:p:name> ?n .
            BIND(replace(str(?n), ".", "-", "q") AS ?y)
            BIND(replace(str(?n), "a.i", "X", "iq") AS ?s)
        }
    """).collect()
    assert rows[0]["y"] == "Alice"          # no literal '.' to replace
    assert rows[0]["s"] == "Alice"          # 'a.i' literal not present
    # 's' flag: '.' matches newline
    g2 = triples_df(small_graph.sparkSession, [
        ("urn:d", "urn:p:txt", Literal("a\nb")),
    ])
    out = sparql_select(g2, """
        SELECT ?s WHERE { ?s <urn:p:txt> ?t . FILTER(regex(?t, "a.b", "s")) }
    """)
    assert [r["s"] for r in out.collect()] == ["urn:d"]
    out0 = sparql_select(g2, """
        SELECT ?s WHERE { ?s <urn:p:txt> ?t . FILTER(regex(?t, "a.b")) }
    """)
    assert out0.count() == 0
    # unknown flag raises instead of silently matching wrong
    with pytest.raises(SparqlCompileError, match="unsupported regex"):
        sparql_select(small_graph, """
            SELECT ?s WHERE { ?s <urn:p:name> ?n . FILTER(regex(?n, "a", "z")) }
        """)


def test_json_sink_encodes_aggregate_aliases(small_graph):
    from meresco_rdf_spark.sinks.sparql_json_sink import (
        results_document, solution_variables)
    import json as _json
    sol = sparql_select(small_graph, """
        SELECT ?s (COUNT(?n) AS ?c) WHERE { ?s <urn:p:name> ?n }
        GROUP BY ?s
    """)
    assert solution_variables(sol) == ["s", "c"]
    doc = _json.loads(results_document(sol))
    assert doc["head"]["vars"] == ["s", "c"]
    by_s = {b["s"]["value"]: b["c"] for b in doc["results"]["bindings"]}
    assert by_s["urn:bob"] == {"type": "literal", "value": "2"}
    assert by_s["urn:alice"]["value"] == "1"


# ---------------------------------------------------------------------------
# §17.4.4 hashes, §17.4.5 dateTime accessors, constructors (round 3)
# ---------------------------------------------------------------------------

def test_hash_builtins_match_hashlib(spark):
    import hashlib
    g = triples_df(spark, [("urn:a", "urn:p:v", Literal("abc"))])
    row = sparql_select(g, """
        SELECT ?h1 ?h2 ?h3 ?h4 ?h5 WHERE {
            ?s <urn:p:v> ?v .
            BIND(md5(?v) AS ?h1) BIND(sha1(?v) AS ?h2)
            BIND(sha256(?v) AS ?h3) BIND(sha384(?v) AS ?h4)
            BIND(sha512(?v) AS ?h5)
        }
    """).collect()[0]
    b = b"abc"
    assert row["h1"] == hashlib.md5(b).hexdigest()
    assert row["h2"] == hashlib.sha1(b).hexdigest()
    assert row["h3"] == hashlib.sha256(b).hexdigest()
    assert row["h4"] == hashlib.sha384(b).hexdigest()
    assert row["h5"] == hashlib.sha512(b).hexdigest()
    assert row["h1_kind"] == "literal" and row["h5_lang"] is None


def test_datetime_accessors_lexical(spark):
    # components come from the LEXICAL form — the -05:00 hour must stay
    # 14, not shift into the session timezone
    g = triples_df(spark, [
        ("urn:a", "urn:p:dt", Literal("2011-01-10T14:45:13.815-05:00")),
        ("urn:b", "urn:p:dt", Literal("2020-06-01T00:30:09+05:30")),
        ("urn:c", "urn:p:dt", Literal("1999-03-04T05:06:07")),
        ("urn:d", "urn:p:dt", Literal("not a dateTime")),
    ])
    rows = {r["s"]: r for r in sparql_select(g, """
        SELECT ?s ?y ?mo ?d ?h ?mi ?sec ?tzs ?dur WHERE {
            ?s <urn:p:dt> ?t .
            BIND(year(?t) AS ?y) BIND(month(?t) AS ?mo)
            BIND(day(?t) AS ?d) BIND(hours(?t) AS ?h)
            BIND(minutes(?t) AS ?mi) BIND(seconds(?t) AS ?sec)
            BIND(tz(?t) AS ?tzs) BIND(timezone(?t) AS ?dur)
        }
    """).collect()}
    a = rows["urn:a"]
    assert (a["y"], a["mo"], a["d"], a["h"], a["mi"], a["sec"]) == \
        ("2011", "1", "10", "14", "45", "13.815")
    assert a["tzs"] == "-05:00" and a["dur"] == "-PT5H"
    b = rows["urn:b"]
    assert (b["h"], b["mi"], b["sec"]) == ("0", "30", "9")
    assert b["dur"] == "PT5H30M"
    c = rows["urn:c"]
    assert c["tzs"] == "" and c["tzs_kind"] == "literal"
    assert c["dur"] is None and c["dur_kind"] is None  # TIMEZONE error
    d = rows["urn:d"]  # non-dateTime: every accessor is an error
    assert all(d[k] is None
               for k in ("y", "mo", "d", "h", "mi", "sec", "tzs", "dur"))


def test_datetime_accessor_in_filter_is_numeric(spark):
    g = triples_df(spark, [
        ("urn:a", "urn:p:dt", Literal("2009-12-31T23:00:00Z")),
        ("urn:b", "urn:p:dt", Literal("2011-01-01T00:00:00Z")),
    ])
    out = sparql_select(g, """
        SELECT ?s WHERE { ?s <urn:p:dt> ?t . FILTER(year(?t) >= 2010) }
    """)
    assert [r["s"] for r in out.collect()] == ["urn:b"]


def test_isnumeric(spark):
    g = triples_df(spark, [
        ("urn:a", "urn:p:v", Literal("42.5")),
        ("urn:b", "urn:p:v", Literal("-3e10")),
        ("urn:c", "urn:p:v", Literal("hello")),
        ("urn:d", "urn:p:v", Literal("7", lang="en")),  # tagged: not numeric
        ("urn:e", "urn:p:v", Uri("urn:x:7")),
    ])
    out = sparql_select(g, """
        SELECT ?s WHERE { ?s <urn:p:v> ?v . FILTER(isnumeric(?v)) }
        ORDER BY ?s
    """)
    assert [r["s"] for r in out.collect()] == ["urn:a", "urn:b"]


def test_uuid_struuid_bnode_rand_now(spark):
    import re as _re
    g = triples_df(spark, [
        ("urn:a", "urn:p:v", Literal("x")),
        ("urn:b", "urn:p:v", Literal("y")),
        ("urn:c", "urn:p:v", Literal("x")),
    ])
    rows = sparql_select(g, """
        SELECT ?s ?u ?su ?b ?bs ?r ?n WHERE {
            ?s <urn:p:v> ?v .
            BIND(uuid() AS ?u) BIND(struuid() AS ?su)
            BIND(bnode() AS ?b) BIND(bnode(?v) AS ?bs)
            BIND(rand() AS ?r) BIND(now() AS ?n)
        }
    """).collect()
    uuid_re = _re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}"
                          r"-[0-9a-f]{4}-[0-9a-f]{12}$")
    by_s = {r["s"]: r for r in rows}
    for r in rows:
        assert r["u"].startswith("urn:uuid:") and r["u_kind"] == "uri"
        assert uuid_re.match(r["u"][len("urn:uuid:"):])
        assert uuid_re.match(r["su"]) and r["su_kind"] == "literal"
        assert r["b"].startswith("_:b") and r["b_kind"] == "bnode"
        assert 0.0 <= float(r["r"]) < 1.0
        # now(): xsd:dateTime lexical with offset, query-constant
        assert _re.match(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}"
                         r"(Z|[+-]\d{2}:\d{2})$", r["n"])
    assert len({r["u"] for r in rows}) == 3       # fresh per row
    assert len({r["b"] for r in rows}) == 3
    assert len({r["n"] for r in rows}) == 1       # one instant per query
    # BNODE(str): same lexical value -> same bnode, different -> different
    assert by_s["urn:a"]["bs"] == by_s["urn:c"]["bs"]
    assert by_s["urn:a"]["bs"] != by_s["urn:b"]["bs"]


def test_zero_arg_parse_and_arity_errors(spark):
    g = triples_df(spark, [("urn:a", "urn:p:v", Literal("x"))])
    with pytest.raises(SparqlCompileError, match="takes no arguments"):
        sparql_select(g, """
            SELECT ?u WHERE { ?s <urn:p:v> ?v . BIND(uuid(?v) AS ?u) }
        """)
    with pytest.raises(SparqlCompileError, match="md5"):
        sparql_select(g, """
            SELECT ?m WHERE { ?s <urn:p:v> ?v . BIND(md5(?v, ?v) AS ?m) }
        """)
    with pytest.raises(SparqlCompileError, match="bnode"):
        sparql_select(g, """
            SELECT ?b WHERE { ?s <urn:p:v> ?v . BIND(bnode(?v, ?v) AS ?b) }
        """)


# ---------------------------------------------------------------------------
# GRAPH / named graphs over quad relations (round 3)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def quad_graph(spark):
    return spark.createDataFrame([
        ("file:a.rdf", "urn:x", "urn:p:name", "Alice", "literal", None),
        ("file:a.rdf", "urn:x", "urn:p:age", "30", "literal", None),
        ("file:b.rdf", "urn:x", "urn:p:name", "Alicia", "literal", None),
        ("file:b.rdf", "urn:y", "urn:p:name", "Bob", "literal", None),
        (None, "urn:z", "urn:p:name", "Default", "literal", None),
    ], "context string, subj string, pred string, obj_value string, "
       "obj_kind string, obj_lang string")


def test_graph_default_graph_isolation(quad_graph):
    # patterns outside GRAPH see only context-IS-NULL rows
    out = sparql_select(quad_graph,
                        "SELECT ?n WHERE { ?s <urn:p:name> ?n }")
    assert [r["n"] for r in out.collect()] == ["Default"]
    # the union of all graphs is one .drop() away
    out2 = sparql_select(quad_graph.drop("context"),
                         "SELECT ?n WHERE { ?s <urn:p:name> ?n }")
    assert sorted(r["n"] for r in out2.collect()) == \
        ["Alice", "Alicia", "Bob", "Default"]


def test_graph_constant_iri(quad_graph):
    out = sparql_select(quad_graph, """
        SELECT ?n WHERE { GRAPH <file:b.rdf> { ?s <urn:p:name> ?n } }
    """)
    assert sorted(r["n"] for r in out.collect()) == ["Alicia", "Bob"]


def test_graph_variable_binds_and_scopes_joins(quad_graph):
    # OPTIONAL inside GRAPH ?g joins within the same graph only:
    # urn:x has an age in file:a.rdf but not in file:b.rdf
    rows = sorted(sparql_select(quad_graph, """
        SELECT ?g ?s ?n ?a WHERE {
            GRAPH ?g { ?s <urn:p:name> ?n
                       OPTIONAL { ?s <urn:p:age> ?a } }
        }
    """).collect())
    assert [(r["g"], r["s"], r["n"], r["a"], r["g_kind"]) for r in rows] == [
        ("file:a.rdf", "urn:x", "Alice", "30", "uri"),
        ("file:b.rdf", "urn:x", "Alicia", None, "uri"),
        ("file:b.rdf", "urn:y", "Bob", None, "uri"),
    ]


def test_graph_joins_with_default_graph_patterns(quad_graph):
    rows = sorted(sparql_select(quad_graph, """
        SELECT ?g ?n ?dn WHERE {
            ?z <urn:p:name> ?dn .
            GRAPH ?g { ?x <urn:p:name> ?n . FILTER(strstarts(?n, "Ali")) }
        }
    """).collect())
    assert [(r["g"], r["n"], r["dn"]) for r in rows] == [
        ("file:a.rdf", "Alice", "Default"),
        ("file:b.rdf", "Alicia", "Default"),
    ]


def test_graph_requires_quads(quad_graph):
    with pytest.raises(SparqlCompileError, match="quad relation"):
        sparql_select(quad_graph.drop("context"), """
            SELECT ?n WHERE { GRAPH ?g { ?s <urn:p:name> ?n } }
        """).collect()
    # paths under a CONSTANT graph: plain filtered relation
    out = sparql_select(quad_graph, """
        SELECT ?n WHERE { GRAPH <file:a.rdf> { ?s <urn:p:name>? ?n } }
    """)
    assert "Alice" in {r["n"] for r in out.collect()}


@pytest.fixture(scope="module")
def quad_chain_graph(spark):
    # per-graph sub-chains: g1 has a->b->c, g2 has a->x; a default row
    # that must stay invisible to GRAPH ?g
    return spark.createDataFrame([
        ("urn:g1", "urn:a", "urn:sub", "urn:b", "uri", None),
        ("urn:g1", "urn:b", "urn:sub", "urn:c", "uri", None),
        ("urn:g2", "urn:a", "urn:sub", "urn:x", "uri", None),
        (None, "urn:d", "urn:sub", "urn:e", "uri", None),
    ], "context string, subj string, pred string, obj_value string, "
       "obj_kind string, obj_lang string")


def test_graph_var_path_plus_confined_per_graph(quad_chain_graph):
    # the closure never crosses graph boundaries: a reaches c only in g1
    rows = sparql_select(quad_chain_graph, """
        SELECT ?g ?x WHERE { GRAPH ?g { <urn:a> <urn:sub>+ ?x } }
    """).collect()
    assert sorted((r["g"], r["x"]) for r in rows) == [
        ("urn:g1", "urn:b"), ("urn:g1", "urn:c"), ("urn:g2", "urn:x")]


def test_graph_var_path_star_zero_length_per_graph(quad_chain_graph):
    # the constant endpoint matches itself in EVERY named graph
    rows = sparql_select(quad_chain_graph, """
        SELECT ?g ?x WHERE { GRAPH ?g { <urn:a> <urn:sub>* ?x } }
    """).collect()
    assert sorted((r["g"], r["x"]) for r in rows) == [
        ("urn:g1", "urn:a"), ("urn:g1", "urn:b"), ("urn:g1", "urn:c"),
        ("urn:g2", "urn:a"), ("urn:g2", "urn:x")]


def test_graph_var_path_opt_terms_per_graph(quad_chain_graph):
    # zero-length domain = each graph's own terms, not the union
    rows = sparql_select(quad_chain_graph, """
        SELECT ?g ?s ?x WHERE { GRAPH ?g { ?s <urn:sub>? ?x } }
    """).collect()
    got = sorted((r["g"], r["s"], r["x"]) for r in rows)
    assert ("urn:g1", "urn:x", "urn:x") not in got
    assert got == [
        ("urn:g1", "urn:a", "urn:a"), ("urn:g1", "urn:a", "urn:b"),
        ("urn:g1", "urn:b", "urn:b"), ("urn:g1", "urn:b", "urn:c"),
        ("urn:g1", "urn:c", "urn:c"),
        ("urn:g2", "urn:a", "urn:a"), ("urn:g2", "urn:a", "urn:x"),
        ("urn:g2", "urn:x", "urn:x")]


def test_graph_var_path_joins_scope_within_graph(quad_chain_graph):
    # the bound ?g joins other patterns in the same GRAPH block
    rows = sparql_select(quad_chain_graph, """
        SELECT ?g ?mid WHERE {
            GRAPH ?g { <urn:a> <urn:sub>+ ?mid . ?mid <urn:sub>+ ?end }
        }
    """).collect()
    assert sorted((r["g"], r["mid"]) for r in rows) == [("urn:g1", "urn:b")]


def test_graph_var_path_ground_endpoints_binds_graphs(quad_chain_graph):
    rows = sparql_select(quad_chain_graph, """
        SELECT ?g WHERE { GRAPH ?g { <urn:a> <urn:sub>+ <urn:c> } }
    """).collect()
    assert [r["g"] for r in rows] == ["urn:g1"]


def test_from_merges_named_graphs_into_default(quad_graph):
    # FROM clauses REPLACE the dataset: only the listed graphs form the
    # default graph; the relation's own default rows disappear
    out = sparql_select(quad_graph, """
        SELECT ?n FROM <file:a.rdf> FROM <file:b.rdf>
        WHERE { ?s <urn:p:name> ?n }
    """)
    assert sorted(r["n"] for r in out.collect()) == \
        ["Alice", "Alicia", "Bob"]
    out2 = sparql_select(quad_graph, """
        SELECT ?n FROM <file:a.rdf> WHERE { ?s <urn:p:name> ?n }
    """)
    assert [r["n"] for r in out2.collect()] == ["Alice"]


def test_from_named_scopes_graph_visibility(quad_graph):
    # only FROM NAMED graphs are visible to GRAPH ?g; with FROM NAMED
    # alone there is no default graph at all
    out = sparql_select(quad_graph, """
        SELECT ?g ?n FROM NAMED <file:b.rdf>
        WHERE { GRAPH ?g { ?s <urn:p:name> ?n } }
    """)
    assert sorted((r["g"], r["n"]) for r in out.collect()) == \
        [("file:b.rdf", "Alicia"), ("file:b.rdf", "Bob")]
    # ASK against a default graph that the clauses leave empty
    from meresco_rdf_spark.sparql import sparql_ask
    row = sparql_ask(quad_graph, """
        ASK FROM NAMED <file:b.rdf> { ?s <urn:p:name> ?n }
    """).collect()[0]
    assert row["ask"] is False


def test_from_requires_quads_and_not_in_subselect(quad_graph):
    with pytest.raises(SparqlCompileError, match="quad relation"):
        sparql_select(quad_graph.drop("context"), """
            SELECT ?n FROM <file:a.rdf> WHERE { ?s <urn:p:name> ?n }
        """).collect()
    with pytest.raises(SparqlCompileError, match="sub-select"):
        sparql_select(quad_graph, """
            SELECT ?n WHERE {
                { SELECT ?n FROM <file:a.rdf>
                  WHERE { ?s <urn:p:name> ?n } }
            }
        """).collect()


def test_order_by_expression(small_graph):
    g = small_graph.sparkSession.createDataFrame([
        ("urn:a", "urn:p:n", "Bo", "literal", None),
        ("urn:b", "urn:p:n", "Alexander", "literal", None),
        ("urn:c", "urn:p:n", "Cal", "literal", None),
    ], "subj string, pred string, obj_value string, obj_kind string, "
       "obj_lang string")
    out = sparql_select(g, """
        SELECT ?n WHERE { ?s <urn:p:n> ?n }
        ORDER BY DESC(strlen(?n)) ?n
    """)
    assert [r["n"] for r in out.collect()] == ["Alexander", "Cal", "Bo"]
    out2 = sparql_select(g, """
        SELECT ?n WHERE { ?s <urn:p:n> ?n } ORDER BY lcase(?n)
    """)
    assert [r["n"] for r in out2.collect()] == ["Alexander", "Bo", "Cal"]
    with pytest.raises(SparqlCompileError, match="non-projected"):
        sparql_select(g, """
            SELECT ?s WHERE { ?s <urn:p:n> ?n } ORDER BY strlen(?n)
        """).collect()


def test_group_by_expression(small_graph):
    g = small_graph.sparkSession.createDataFrame([
        ("urn:a", "urn:p:n", "Bo", "literal", None),
        ("urn:b", "urn:p:n", "Alexander", "literal", None),
        ("urn:c", "urn:p:n", "alt", "literal", None),
    ], "subj string, pred string, obj_value string, obj_kind string, "
       "obj_lang string")
    out = sparql_select(g, """
        SELECT ?k (COUNT(?n) AS ?c) WHERE { ?s <urn:p:n> ?n }
        GROUP BY (ucase(substr(?n, 1, 1)) AS ?k) ORDER BY ?k
    """)
    assert [(r["k"], r["c"]) for r in out.collect()] == \
        [("A", "2"), ("B", "1")] or \
        [(r["k"], int(r["c"])) for r in out.collect()] == \
        [("A", 2), ("B", 1)]
    # bare (un-aliased) grouping expression: hidden non-projectable key
    out2 = sparql_select(g, """
        SELECT (COUNT(?n) AS ?c) WHERE { ?s <urn:p:n> ?n }
        GROUP BY (strlen(?n)) ORDER BY ?c
    """)
    assert sorted(int(r["c"]) for r in out2.collect()) == [1, 1, 1]


# ------------------------------------------------- quad-aware UPDATE

QUAD_SCHEMA = ("context string, subj string, pred string, obj_value string, "
               "obj_kind string, obj_lang string")

QUAD_ROWS = [
    (None, "urn:s1", "urn:p", "default", "literal", None),
    ("urn:g:a", "urn:s2", "urn:p", "in-a", "literal", None),
    ("urn:g:a", "urn:s2", "urn:q", "urn:o", "uri", None),
    ("urn:g:b", "urn:s3", "urn:p", "in-b", "literal", None),
]


def _quads(spark):
    return spark.createDataFrame(QUAD_ROWS, QUAD_SCHEMA)


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_update_clear_drop_forms(spark):
    from meresco_rdf_spark.sparql import sparql_update_quads as upd

    quads, all_rows = _quads(spark), set(map(tuple, QUAD_ROWS))
    assert _rowset(upd(quads, "CLEAR GRAPH <urn:g:a>")) == {
        r for r in all_rows if r[0] != "urn:g:a"}
    assert _rowset(upd(quads, "CLEAR DEFAULT")) == {
        r for r in all_rows if r[0] is not None}
    assert _rowset(upd(quads, "DROP NAMED")) == {
        r for r in all_rows if r[0] is None}
    assert _rowset(upd(quads, "CLEAR ALL")) == set()
    assert _rowset(upd(quads, "CREATE GRAPH <urn:new>")) == all_rows


def test_update_add_copy_move(spark):
    from meresco_rdf_spark.sparql import sparql_update_quads as upd

    quads = _quads(spark)
    # COPY replaces the destination graph
    got = _rowset(upd(quads, "COPY GRAPH <urn:g:a> TO GRAPH <urn:g:b>"))
    assert ("urn:g:b", "urn:s2", "urn:p", "in-a", "literal", None) in got
    assert ("urn:g:b", "urn:s3", "urn:p", "in-b", "literal", None) not in got
    assert ("urn:g:a", "urn:s2", "urn:p", "in-a", "literal", None) in got
    # MOVE empties the source and replaces the destination
    got = _rowset(upd(quads, "MOVE GRAPH <urn:g:a> TO DEFAULT"))
    assert (None, "urn:s2", "urn:p", "in-a", "literal", None) in got
    assert not any(g == "urn:g:a" for g, *_ in got)
    assert (None, "urn:s1", "urn:p", "default", "literal", None) not in got
    # ADD unions into the destination
    got = _rowset(upd(quads, "ADD GRAPH <urn:g:a> TO DEFAULT"))
    assert (None, "urn:s1", "urn:p", "default", "literal", None) in got
    assert (None, "urn:s2", "urn:p", "in-a", "literal", None) in got
    # same-graph is a no-op
    assert _rowset(upd(quads, "MOVE GRAPH <urn:g:a> TO GRAPH <urn:g:a>")) \
        == set(map(tuple, QUAD_ROWS))


def test_update_quad_data_forms(spark):
    from meresco_rdf_spark.sparql import sparql_update_quads as upd

    quads = _quads(spark)
    got = _rowset(upd(quads, 'INSERT DATA { GRAPH <urn:g:c> '
                           '{ <urn:s9> <urn:p> "nine" } '
                           '<urn:s0> <urn:p> "zero" . }'))
    assert ("urn:g:c", "urn:s9", "urn:p", "nine", "literal", None) in got
    assert (None, "urn:s0", "urn:p", "zero", "literal", None) in got
    assert len(got) == len(QUAD_ROWS) + 2
    got = _rowset(upd(quads, 'DELETE DATA { GRAPH <urn:g:a> '
                           '{ <urn:s2> <urn:p> "in-a" } }'))
    assert ("urn:g:a", "urn:s2", "urn:p", "in-a", "literal", None) not in got
    assert len(got) == len(QUAD_ROWS) - 1


def test_update_with_scopes_where_and_targets(spark):
    from meresco_rdf_spark.sparql import sparql_update_quads as upd

    quads = _quads(spark)
    got = _rowset(upd(quads, """
        WITH <urn:g:a> DELETE { ?s <urn:p> ?o }
        INSERT { GRAPH <urn:g:new> { ?s <urn:p> ?o } }
        WHERE { ?s <urn:p> ?o }"""))
    assert ("urn:g:a", "urn:s2", "urn:p", "in-a", "literal", None) not in got
    assert ("urn:g:new", "urn:s2", "urn:p", "in-a", "literal", None) in got
    # other graphs and the true default graph untouched
    assert (None, "urn:s1", "urn:p", "default", "literal", None) in got
    assert ("urn:g:b", "urn:s3", "urn:p", "in-b", "literal", None) in got
    # the WITH graph stays visible to explicit GRAPH patterns
    got = _rowset(upd(quads, """
        WITH <urn:g:b> INSERT { ?s <urn:tag> "both" }
        WHERE { GRAPH <urn:g:a> { ?s <urn:q> ?o } }"""))
    assert ("urn:g:b", "urn:s2", "urn:tag", "both", "literal", None) in got


def test_update_quad_guards(spark):
    from meresco_rdf_spark.sparql import sparql_update, sparql_update_quads
    from meresco_rdf_spark.sparql.compiler import SparqlCompileError

    quads = _quads(spark)
    with pytest.raises(SparqlCompileError, match="quad"):
        sparql_update(quads.drop("context"), "CLEAR GRAPH <urn:g:a>")
    with pytest.raises(SparqlCompileError, match="quad relation"):
        sparql_update_quads(quads.drop("context"), "CLEAR ALL")
    # plain (triple-form) updates still run through the quad API
    got = _rowset(sparql_update_quads(
        quads, 'INSERT DATA { <urn:s9> <urn:p> "nine" }'))
    assert (None, "urn:s9", "urn:p", "nine", "literal", None) in got


def test_update_parser_manage_errors(spark):
    from meresco_rdf_spark.sparql.parser import SparqlSyntaxError, parse_query

    for bad in ("ADD NAMED TO GRAPH <urn:g>",
                "WITH <urn:g> INSERT DATA { <urn:s> <urn:p> <urn:o> }",
                "WITH <urn:g> SELECT ?s WHERE { ?s ?p ?o }",
                "COPY GRAPH <urn:a> TO ALL"):
        with pytest.raises(SparqlSyntaxError):
            parse_query(bad)


def test_update_load_file_into_graph(spark, tmp_path):
    from meresco_rdf_spark.sparql import sparql_update_quads as upd

    doc = tmp_path / "doc.nt"
    doc.write_text('<urn:s9> <urn:p> "loaded" .\n'
                   '<urn:s9> <urn:q> <urn:o9> .\n')
    quads = _quads(spark)
    got = _rowset(upd(quads, "LOAD <file://%s> INTO GRAPH <urn:g:new>"
                      % doc))
    assert ("urn:g:new", "urn:s9", "urn:p", "loaded", "literal", None) in got
    assert ("urn:g:new", "urn:s9", "urn:q", "urn:o9", "uri", None) in got
    assert set(map(tuple, QUAD_ROWS)) <= got
    assert len(got) == len(QUAD_ROWS) + 2
    # no INTO GRAPH -> the default graph; intrinsic labels subsumed
    got = _rowset(upd(quads, "LOAD <file:%s>" % doc))
    assert (None, "urn:s9", "urn:p", "loaded", "literal", None) in got


def test_update_load_silent_and_errors(spark, tmp_path):
    from meresco_rdf_spark.sparql import sparql_update_quads as upd
    from meresco_rdf_spark.sparql.compiler import SparqlCompileError

    quads = _quads(spark)
    # non-file scheme refused loudly...
    with pytest.raises(SparqlCompileError, match="file:"):
        upd(quads, "LOAD <http://example.org/doc.nt>")
    # ...but SILENT turns any load failure into the spec's no-op
    assert _rowset(upd(quads, "LOAD SILENT <http://example.org/doc.nt>")) \
        == set(map(tuple, QUAD_ROWS))
    assert _rowset(upd(
        quads, "LOAD SILENT <file://%s/absent.nt> INTO GRAPH <urn:g>"
        % tmp_path)) == set(map(tuple, QUAD_ROWS))


def test_update_quads_delete_where(spark):
    # DELETE WHERE through the quad API: pattern doubles as template,
    # targeting the default graph (no WITH, no GRAPH block)
    from meresco_rdf_spark.sparql import sparql_update_quads

    quads = _quads(spark)
    got = _rowset(sparql_update_quads(quads,
                                    "DELETE WHERE { ?s <urn:p> ?o }"))
    # only the DEFAULT-graph <urn:p> row is matched and deleted
    assert (None, "urn:s1", "urn:p", "default", "literal", None) not in got
    assert ("urn:g:a", "urn:s2", "urn:p", "in-a", "literal", None) in got
    assert len(got) == len(QUAD_ROWS) - 1


def test_literal_subject_plain_pattern_never_matches(mixed_path_graph):
    out = sparql_select(mixed_path_graph, """
        SELECT ?o WHERE { "lit1" <urn:p> ?o }
    """)
    assert out.collect() == []


def test_literal_subject_inverse_path_binds(mixed_path_graph):
    # "lit1" is the object of x's and y's urn:p rows; (^p)+ seeded from
    # the literal reaches both.  "lit1"@en (z's object) is a different
    # term and must not seed from the plain literal.
    out = sparql_select(mixed_path_graph, """
        SELECT ?s WHERE { "lit1" (^<urn:p>)+ ?s }
    """)
    assert {r["s"] for r in out.collect()} == {"urn:x", "urn:y"}


def test_literal_subject_zero_length_star(mixed_path_graph):
    # SPARQL 1.1 §18.4 ZeroLengthPath: a constant matches itself
    out = sparql_select(mixed_path_graph, """
        SELECT ?ok WHERE { "anything" <urn:p>* "anything" .
                           BIND(1 AS ?ok) }
    """)
    assert [r["ok"] for r in out.collect()] == ["1"]


def test_update_where_supports_property_paths(spark):
    # the WHERE body shares the SELECT compiler, so quantified paths
    # instantiate templates — pin it (reachability materialization via
    # INSERT ... WHERE { ?x p+ ?y })
    g = triples_df(spark, [
        ("urn:a", "urn:sub", Uri("urn:b")),
        ("urn:b", "urn:sub", Uri("urn:c")),
    ])
    dels, adds = sparql_update_sets(g, """
        INSERT { ?x <urn:reaches> ?y } WHERE { ?x (<urn:sub>)+ ?y }
    """)
    assert dels is None
    got = sorted((r.subj, r.obj_value) for r in adds.collect())
    assert got == [("urn:a", "urn:b"), ("urn:a", "urn:c"),
                   ("urn:b", "urn:c")]


def test_trailing_values_clause_joins_solutions(spark):
    g = triples_df(spark, [
        ("urn:a", "urn:p", Literal("1")),
        ("urn:b", "urn:p", Literal("2")),
        ("urn:c", "urn:p", Literal("3")),
    ])
    # §10.2 ValuesClause after the solution modifiers
    out = sparql_select(g, """
        SELECT ?s ?o WHERE { ?s <urn:p> ?o } ORDER BY ?s
        VALUES ?s { <urn:a> <urn:c> }
    """)
    assert [(r["s"], r["o"]) for r in out.collect()] == [
        ("urn:a", "1"), ("urn:c", "3")]


def test_trailing_values_over_group_key(spark):
    g = triples_df(spark, [
        ("urn:a", "urn:p", Literal("1")),
        ("urn:a", "urn:p", Literal("2")),
        ("urn:b", "urn:p", Literal("3")),
    ])
    out = sparql_select(g, """
        SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <urn:p> ?o }
        GROUP BY ?s VALUES ?s { <urn:a> }
    """)
    assert [(r["s"], r["n"]) for r in out.collect()] == [("urn:a", 2)]


def test_trailing_values_over_aggregate_alias_rejected():
    with pytest.raises(SparqlSyntaxError, match="aggregate alias"):
        parse_query("""
            SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <urn:p> ?o }
            GROUP BY ?s VALUES ?n { 2 }
        """)


def test_parse_inverted_quantified_group_reverses_steps():
    # ^(a/b)+ walks b backwards then a backwards: branch steps are
    # REVERSED and each flipped — pin the order, it is easy to get wrong
    q = parse_query("SELECT ?x ?y WHERE { ?x ^(<urn:a>/<urn:b>)+ ?y }")
    pred = q.where.parts[0].patterns[0][1]
    assert isinstance(pred, PathPlus)
    assert pred.preds == ()
    assert pred.branches == ((("inv", "urn:b"), ("inv", "urn:a")),)


def test_parse_quantified_group_fast_path_stays_preds():
    # bare-IRI alternation keeps the single predicate-set fast path
    q = parse_query("SELECT ?x ?y WHERE { ?x (<urn:a>|<urn:b>)* ?y }")
    pred = q.where.parts[0].patterns[0][1]
    assert pred.preds == ("urn:a", "urn:b")
    assert pred.branches == ()


def test_parse_mixed_group_goes_to_branches():
    q = parse_query("SELECT ?x ?y WHERE { ?x (<urn:a>|^<urn:b>)? ?y }")
    pred = q.where.parts[0].patterns[0][1]
    assert pred.preds == ()
    assert pred.branches == ((("fwd", "urn:a"),), (("inv", "urn:b"),))


def test_quantified_negated_set(small_graph):
    # !(p)+ : closure over the predicate-COMPLEMENT edge relation
    # complement of {name} = knows/age edges; from alice:
    # alice-knows->bob, alice-age->"34", bob-knows->carol, carol-age->"29"
    got = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:alice> !(<urn:p:name>)+ ?o }
    """).collect()}
    assert got == {"urn:bob", "34", "urn:carol", "29"}
    # bare form: !p+ == (!p)+ per the SPARQL grammar
    got2 = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:alice> !<urn:p:name>+ ?o }
    """).collect()}
    assert got2 == got


def test_quantified_negated_set_star_identity(small_graph):
    # !(^knows)* from carol: the only inbound edge is knows (excluded),
    # so the closure is empty and the zero-length identity remains
    got = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:carol> !(^<urn:p:knows>)* ?o }
    """).collect()}
    assert got == {"urn:carol"}


def test_quantified_negated_set_mixed(small_graph):
    # !(name|^knows)+ from bob: forward complement-of-name edges union
    # reverse complement-of-knows edges.  bob-knows->carol (fwd),
    # carol-age->"29" (fwd), "29"-[rev age]->carol (adds nothing new)
    got = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE {
            <urn:bob> !(<urn:p:name>|^<urn:p:knows>)+ ?o }
    """).collect()}
    assert got == {"urn:carol", "29"}


def test_negated_set_inside_quantified_sequence(small_graph):
    # (!name/name)+ : one complement step then one name step, repeated.
    # From alice: !name -> {bob, "34"}; name from bob -> {Bob, Bobby}
    # (literals end the path; no further rounds produce new pairs)
    got = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE {
            <urn:alice> (!<urn:p:name>/<urn:p:name>)+ ?o }
    """).collect()}
    assert got == {"Bob", "Bobby"}


def test_inverse_of_negated_set(small_graph):
    # ^!p == !^p: inverting an NPS swaps every member's direction
    a = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:carol> ^!<urn:p:name> ?o }
    """).collect()}
    b = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:carol> !^<urn:p:name> ?o }
    """).collect()}
    assert a == b == {"urn:bob"}
    # parenthesized form and quantified inverse form
    c = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:carol> ^(!<urn:p:name>) ?o }
    """).collect()}
    assert c == a
    d = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:carol> ^!(<urn:p:name>)+ ?o }
    """).collect()}
    e = {r["o"] for r in sparql_select(small_graph, """
        SELECT ?o WHERE { <urn:carol> !(^<urn:p:name>)+ ?o }
    """).collect()}
    # carol <-knows- bob <-knows- alice; reverse edges only, so
    # alice's outgoing age literal is NOT reachable
    assert d == e == {"urn:bob", "urn:alice"}


# ---------------------------------------------------------------------------
# §17.4.2 term constructors (round-5 completeness sweep) + loud
# rejections for the datatype-presupposing stragglers
# ---------------------------------------------------------------------------

def test_datatype_of_literals(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?n ?dt WHERE {
            <urn:bob> <urn:p:name> ?n .
            BIND (datatype(?n) AS ?dt)
        }
    """)
    got = sorted((r["n"], r["dt"], r["dt_kind"]) for r in out.collect())
    assert got == [
        ("Bob", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
         "uri"),
        ("Bobby", "http://www.w3.org/2001/XMLSchema#string", "uri"),
    ]


def test_datatype_of_uri_is_unbound(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?o ?dt WHERE {
            <urn:alice> <urn:p:knows> ?o .
            BIND (datatype(?o) AS ?dt)
        }
    """)
    rows = out.collect()
    assert [r["o"] for r in rows] == ["urn:bob"]
    assert rows[0]["dt"] is None  # type error -> unbound in BIND


def test_iri_constructor_from_string(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s ?i WHERE {
            ?s <urn:p:age> "34" .
            BIND (iri(concat("urn:idx:", str(?s))) AS ?i)
        }
    """)
    rows = out.collect()
    assert [(r["i"], r["i_kind"]) for r in rows] == \
        [("urn:idx:urn:alice", "uri")]


def test_uri_synonym_and_identity_on_iri(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?o ?u WHERE {
            <urn:alice> <urn:p:knows> ?o .
            BIND (uri(?o) AS ?u)
        }
    """)
    rows = out.collect()
    assert [(r["u"], r["u_kind"]) for r in rows] == [("urn:bob", "uri")]


def test_iri_of_lang_literal_is_unbound(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?n ?i WHERE {
            <urn:alice> <urn:p:name> ?n .
            BIND (iri(?n) AS ?i)
        }
    """)
    rows = out.collect()
    assert rows[0]["n"] == "Alice" and rows[0]["i"] is None


def test_strlang_builds_lang_literal(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?s ?l WHERE {
            ?s <urn:p:age> ?a .
            BIND (strlang(?a, "EN-gb") AS ?l)
        }
    """)
    got = sorted((r["l"], r["l_kind"], r["l_lang"]) for r in out.collect())
    # language tags normalize to lowercase exactly like parsed LANGTAGs
    assert got == [("29", "literal", "en-gb"), ("34", "literal", "en-gb")]


def test_strlang_of_lang_literal_is_unbound(small_graph):
    out = sparql_select(small_graph, """
        SELECT ?n ?l WHERE {
            <urn:alice> <urn:p:name> ?n .
            BIND (strlang(?n, "fr") AS ?l)
        }
    """)
    rows = out.collect()
    assert rows[0]["l"] is None  # arg0 already language-tagged


def test_strlang_arity_error(small_graph):
    with pytest.raises(SparqlCompileError, match="strlang"):
        sparql_select(small_graph, """
            SELECT ?l WHERE {
                ?s <urn:p:age> ?a . BIND (strlang(?a) AS ?l)
            }
        """)


def test_strdt_rejected_loudly():
    with pytest.raises(SparqlSyntaxError, match="STRDT is not supported"):
        parse_query("""
            SELECT ?l WHERE {
                ?s <urn:p:age> ?a .
                BIND (STRDT(?a, <http://www.w3.org/2001/XMLSchema#int>)
                      AS ?l)
            }
        """)


def test_xsd_cast_rejected_loudly():
    with pytest.raises(SparqlSyntaxError, match="IRI function call"):
        parse_query("""
            PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
            SELECT ?l WHERE {
                ?s <urn:p:age> ?a . BIND (xsd:integer(?a) AS ?l)
            }
        """)


def test_extension_function_rejected_loudly():
    with pytest.raises(SparqlSyntaxError, match="IRI function call"):
        parse_query("""
            SELECT ?l WHERE {
                ?s <urn:p:age> ?a .
                BIND (<urn:my:fn>(?a) AS ?l)
            }
        """)
