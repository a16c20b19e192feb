"""Property-based tests (hypothesis): invariants the example-based suite
can't sweep — serializer round-trips over random small graphs, Jaccard
estimator consistency, canonicalization idempotence."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from meresco_rdf_spark.graph import Graph
from meresco_rdf_spark.model import BNode, Literal, Uri, node_to_row
from meresco_rdf_spark.namespaces import namespaces
from meresco_rdf_spark.rdfxml.parser import parse_rdfxml
from meresco_rdf_spark.rdfxml.serializer import Triples2RdfXml, element_to_string

from tests.helpers import assert_isomorphic

SUBJECTS = st.sampled_from(
    ["http://ex.org/a", "http://ex.org/b", "http://ex.org/c"])
PREDICATES = st.sampled_from([
    "http://www.w3.org/2000/01/rdf-schema#label",
    "http://www.w3.org/2004/02/skos/core#prefLabel",
    "http://purl.org/dc/terms/title",
    "http://ex.org/rel",
])
# XML-safe literal text (the serializer escapes; control chars are not
# representable in XML 1.0 at all, so exclude them as the reference does)
LITERALS = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
    min_size=0, max_size=12)
OBJECTS = st.one_of(
    st.builds(lambda v: Uri("http://ex.org/o/%s" % v),
              st.integers(min_value=0, max_value=5)),
    st.builds(Literal, LITERALS),
    # non-empty text only: `<p xml:lang="nl"/>` (an EMPTY lang-tagged
    # literal) is parsed by the reference's emptyPropertyElt as a fresh
    # bnode + xml-lang property triple (rdfparser.py:127-141 — xml:lang
    # is not in its DISALLOWED set), so that corner cannot round-trip in
    # the reference dialect; our parser reproduces it faithfully
    st.builds(lambda v, lang: Literal(v, lang=lang),
              LITERALS.filter(lambda s: s.strip() != ""),
              st.sampled_from(["nl", "en"])),
)
TRIPLES = st.lists(
    st.tuples(SUBJECTS, PREDICATES, OBJECTS), min_size=1, max_size=12)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(TRIPLES)
def test_serialize_parse_roundtrip_preserves_triples(triples):
    g = Graph()
    for s, p, o in triples:
        g.addTriple(s, p, o)
    ns = namespaces.copy_update({"ex": "http://ex.org/"})
    xml = element_to_string(Triples2RdfXml(namespaces=ns).as_rdfxml(g), ns)
    g2 = parse_rdfxml(xml)
    assert_isomorphic(
        {node_to_row(s, p, o) for s, p, o in g.triples()},
        {node_to_row(s, p, o) for s, p, o in g2.triples()})


@settings(max_examples=60, deadline=None)
@given(TRIPLES)
def test_graph_add_is_idempotent_and_remove_inverts(triples):
    g = Graph()
    for s, p, o in triples:
        g.addTriple(s, p, o)
        g.addTriple(s, p, o)  # set semantics: double add is one triple
    assert len(g.triples()) == len({(str(s), str(p), repr(o))
                                    for s, p, o in g.triples()})
    n = len(g.triples())
    s, p, o = triples[0]
    first = next(t for t in g.triples()
                 if t[0] == s and t[1] == p and t[2] == o)
    g.removeTriple(*first)
    assert len(g.triples()) == n - 1
    assert first not in g.triples()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=1, max_size=30),
                min_size=2, max_size=6, unique=True))
def test_local_minhash_never_reports_pairs_below_exact_jaccard_zero(texts):
    """Banding can MISS similar pairs but must never invent dissimilar
    ones: every reported pair's jaccard is the exact value computed from
    the shingle sets (verified locally, mirroring the Spark operator's
    verify stage)."""
    def shingles(t):
        toks = [w for w in t.lower().split() if w]
        n = 3
        if len(toks) <= n:
            return {" ".join(toks[:n])}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                exact = inter / union if union else 0.0
                # the operator's output formula: inter/(na+nb-inter)
                na, nb = len(sets[a]), len(sets[b])
                assert union == na + nb - inter
                assert 0.0 <= exact <= 1.0


def test_bnode_roundtrip_with_nested_structure():
    g = Graph()
    b = BNode("_:b1")
    g.addTriple("http://ex.org/a", "http://ex.org/rel", b)
    g.addTriple("_:b1", "http://www.w3.org/2000/01/rdf-schema#label",
                Literal("inner", lang="nl"))
    ns = namespaces.copy_update({"ex": "http://ex.org/"})
    xml = element_to_string(Triples2RdfXml(namespaces=ns).as_rdfxml(g), ns)
    g2 = parse_rdfxml(xml)
    assert_isomorphic(
        {node_to_row(s, p, o) for s, p, o in g.triples()},
        {node_to_row(s, p, o) for s, p, o in g2.triples()})


# ---------------------------------------------------------------------------
# N-Triples codec: line round-trip over adversarial strings
# ---------------------------------------------------------------------------

_nt_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    min_size=0, max_size=40)
_nt_uri = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"),
        whitelist_characters=":/._-#?&%"),
    min_size=1, max_size=30).map(lambda s: "urn:" + s)
_nt_lang = st.one_of(st.none(), st.sampled_from(["en", "nl", "de", "pt-BR"]))


@settings(max_examples=200, deadline=None)
@given(subj=_nt_uri, pred=_nt_uri, value=_nt_text, lang=_nt_lang)
def test_ntriples_literal_line_roundtrip(subj, pred, value, lang):
    """serialize(line) -> parse == original for arbitrary literal values
    (quotes, backslashes, newlines, tabs, unicode)."""
    from meresco_rdf_spark.model import Literal
    from meresco_rdf_spark.rdfxml.ntriples import parse_ntriples_line

    def esc(s):
        return (s.replace("\\", "\\\\").replace('"', '\\"')
                 .replace("\n", "\\n").replace("\r", "\\r")
                 .replace("\t", "\\t"))

    line = '<%s> <%s> "%s"%s .' % (
        esc(subj), esc(pred), esc(value), "@" + lang if lang else "")
    parsed = parse_ntriples_line(line)
    assert parsed == (subj, pred, Literal(value, lang=lang))


@settings(max_examples=100, deadline=None)
@given(value=_nt_text)
def test_ntriples_unescape_inverts_sink_escaping(value):
    """The pure unescape inverts exactly the escape set the Spark sink
    emits (sinks/nt_sink.py nt_escape)."""
    from meresco_rdf_spark.rdfxml.ntriples import unescape

    escaped = (value.replace("\\", "\\\\").replace('"', '\\"')
                    .replace("\n", "\\n").replace("\r", "\\r")
                    .replace("\t", "\\t"))
    assert unescape(escaped) == value


# ---------------------------------------------------------------------------
# SPARQL compiler vs hand-built match_patterns (O9): two independent
# implementations of BGP semantics must agree on random graphs/patterns
# ---------------------------------------------------------------------------

_B_SUBJ = st.sampled_from(["urn:a", "urn:b", "urn:c"])
_B_PRED = st.sampled_from(["urn:p", "urn:q"])
_B_OBJ = st.one_of(
    st.sampled_from([Uri("urn:a"), Uri("urn:b"), Uri("urn:c")]),
    st.builds(Literal, st.sampled_from(["x", "y"])),
    st.builds(lambda v: Literal(v, lang="en"), st.sampled_from(["x", "y"])),
)
_B_TRIPLES = st.lists(st.tuples(_B_SUBJ, _B_PRED, _B_OBJ),
                      min_size=1, max_size=10)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_B_TRIPLES, st.sampled_from(["urn:p", "urn:q"]),
       st.sampled_from(["urn:p", "urn:q"]), st.booleans())
def test_sparql_bgp_agrees_with_match_patterns(spark, triples, p1, p2,
                                               star_join):
    """For star (?x p1 ?y . ?x p2 ?z) and chain (?x p1 ?y . ?y p2 ?z)
    shapes, the parsed SPARQL front-end and the hand-built O9 self-join
    cascade — independently written compilers — must produce identical
    binding multirows (both dedup: SELECT DISTINCT vs reference dedup)."""
    from meresco_rdf_spark.operators.graph_ops import (match_patterns,
                                                       triples_df)
    from meresco_rdf_spark.sparql import sparql_select

    df = triples_df(spark, triples)
    if star_join:
        pats = [("?x", p1, "?y"), ("?x", p2, "?z")]
        q = "SELECT DISTINCT ?x ?y ?z WHERE { ?x <%s> ?y . ?x <%s> ?z }" \
            % (p1, p2)
    else:
        pats = [("?x", p1, "?y"), ("?y", p2, "?z")]
        q = "SELECT DISTINCT ?x ?y ?z WHERE { ?x <%s> ?y . ?y <%s> ?z }" \
            % (p1, p2)
    cols = ["x", "x_kind", "x_lang", "y", "y_kind", "y_lang",
            "z", "z_kind", "z_lang"]
    got_o9 = {tuple(r) for r in
              match_patterns(df, pats).select(*cols).collect()}
    got_sparql = {tuple(r) for r in
                  sparql_select(df, q).select(*cols).collect()}
    assert got_sparql == got_o9


_CTX = st.sampled_from([None, "urn:g:1", "urn:g:2"])
_Q_SUBJ = st.sampled_from(["urn:s1", "urn:s2", "urn:s3"])
_Q_OBJ = st.sampled_from(["v1", "v2", "v3"])
_QUADS = st.lists(st.tuples(_CTX, _Q_SUBJ, _Q_OBJ), min_size=1,
                  max_size=10, unique=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_QUADS)
def test_sparql_graph_agrees_with_pure_python_quad_eval(spark, quads):
    """GRAPH ?g iteration and default-graph isolation vs a three-line
    pure-Python evaluation of the same dataset semantics (named graphs =
    non-null contexts, default graph = null context)."""
    from meresco_rdf_spark.sparql import sparql_select

    df = spark.createDataFrame(
        [(c, s, "urn:p", o, "literal", None) for c, s, o in quads],
        "context string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_lang string")
    got_named = {(r["g"], r["s"], r["o"]) for r in sparql_select(df, """
        SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s <urn:p> ?o } }
    """).collect()}
    want_named = {(c, s, o) for c, s, o in quads if c is not None}
    assert got_named == want_named
    got_default = {(r["s"], r["o"]) for r in sparql_select(df, """
        SELECT ?s ?o WHERE { ?s <urn:p> ?o }
    """).collect()}
    want_default = {(s, o) for c, s, o in quads if c is None}
    assert got_default == want_default


_DT = st.datetimes(
    min_value=__import__("datetime").datetime(1, 1, 1),
    max_value=__import__("datetime").datetime(9999, 12, 31))
_OFF = st.sampled_from(["", "Z", "+05:30", "-08:00", "+00:00", "-11:45"])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(_DT, _OFF), min_size=1, max_size=6))
def test_datetime_accessors_agree_with_python_datetime(spark, items):
    """YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS/TZ over arbitrary
    xsd:dateTime lexicals vs Python's own datetime components — the
    compiled lexical extraction must never shift a component (the
    session-timezone trap the docstring promises to avoid)."""
    from meresco_rdf_spark.sparql import sparql_select

    rows = [("urn:x%d" % i, "urn:p:dt", dt.isoformat() + off,
             "literal", None)
            for i, (dt, off) in enumerate(items)]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj_value string, "
              "obj_kind string, obj_lang string")
    got = {r["s"]: r for r in sparql_select(df, """
        SELECT ?s ?y ?mo ?d ?h ?mi ?sec ?tzs WHERE {
            ?s <urn:p:dt> ?t .
            BIND(year(?t) AS ?y) BIND(month(?t) AS ?mo)
            BIND(day(?t) AS ?d) BIND(hours(?t) AS ?h)
            BIND(minutes(?t) AS ?mi) BIND(seconds(?t) AS ?sec)
            BIND(tz(?t) AS ?tzs)
        }
    """).collect()}
    for i, (dt, off) in enumerate(items):
        r = got["urn:x%d" % i]
        assert (int(r["y"]), int(r["mo"]), int(r["d"])) == \
            (dt.year, dt.month, dt.day)
        assert (int(r["h"]), int(r["mi"])) == (dt.hour, dt.minute)
        want_sec = dt.second + dt.microsecond / 1e6
        assert abs(float(r["sec"]) - want_sec) < 1e-9
        assert r["tzs"] == off


@settings(max_examples=200, deadline=None)
@given(subj=_nt_uri, pred=_nt_uri, value=_nt_text, lang=_nt_lang,
       graph=st.one_of(st.none(), _nt_uri))
def test_nquads_literal_line_roundtrip(subj, pred, value, lang, graph):
    """N-Quads line round-trip for arbitrary literal values, with and
    without the 4th graph term (mirror of the N-Triples property)."""
    from meresco_rdf_spark.model import Literal
    from meresco_rdf_spark.rdfxml.nquads import parse_nquads_line

    def esc(s):
        return (s.replace("\\", "\\\\").replace('"', '\\"')
                 .replace("\n", "\\n").replace("\r", "\\r")
                 .replace("\t", "\\t"))

    line = '<%s> <%s> "%s"%s%s .' % (
        esc(subj), esc(pred), esc(value),
        "@" + lang if lang else "",
        " <%s>" % esc(graph) if graph else "")
    assert parse_nquads_line(line) == (
        graph, subj, pred, Literal(value, lang=lang))


@settings(max_examples=60, deadline=None)
@given(triples=st.lists(st.tuples(SUBJECTS, PREDICATES, OBJECTS),
                  min_size=1, max_size=8),
       graph=_nt_uri)
def test_trig_graph_block_equals_turtle_tagged(triples, graph):
    """Any Turtle statement sequence wrapped in GRAPH <g> { } parses to
    the same triples as plain Turtle, each tagged with g — and the same
    text at top level parses to default-graph (None) quads."""
    from meresco_rdf_spark.model import BNode
    from meresco_rdf_spark.rdfxml.nquads import parse_nquads_line  # noqa: F401
    from meresco_rdf_spark.rdfxml.trig import parse_trig
    from meresco_rdf_spark.rdfxml.turtle import parse_turtle

    def encode(s, p, o):
        def term(t):
            if isinstance(t, Uri):
                return "<%s>" % t.value
            v = (t.value.replace("\\", "\\\\").replace('"', '\\"')
                 .replace("\n", "\\n").replace("\r", "\\r")
                 .replace("\t", "\\t"))
            return '"%s"%s' % (v, "@" + t.lang if t.lang else "")
        return "<%s> <%s> %s ." % (s, p, term(o))

    doc = "\n".join(encode(*t) for t in triples)
    BNode.nextGenId = 0
    plain = set(parse_turtle(doc).triples())
    BNode.nextGenId = 0
    wrapped = parse_trig("GRAPH <%s> {\n%s\n}" % (graph, doc))
    assert {(g,) + (s, p, o) for g, s, p, o in wrapped} \
        == {(graph, s, p, o) for s, p, o in plain}
    BNode.nextGenId = 0
    toplevel = parse_trig(doc)
    assert {(g,) + (s, p, o) for g, s, p, o in toplevel} \
        == {(None, s, p, o) for s, p, o in plain}


_STEP = st.tuples(st.sampled_from(["fwd", "inv"]),
                  st.sampled_from(["urn:p", "urn:q"]))
_BRANCH = st.lists(_STEP, min_size=1, max_size=2)
_PATH = st.tuples(st.lists(_BRANCH, min_size=1, max_size=2),
                  st.sampled_from(["+", "*", "?"]))
_P_EDGES = st.lists(
    st.tuples(st.sampled_from(["urn:n0", "urn:n1", "urn:n2", "urn:n3"]),
              st.sampled_from(["urn:p", "urn:q"]),
              st.sampled_from(["urn:n0", "urn:n1", "urn:n2", "urn:n3"])),
    min_size=1, max_size=8, unique=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_P_EDGES, _PATH)
def test_quantified_path_agrees_with_pure_python_closure(spark, edges,
                                                         path):
    """Quantified paths over |, / and ^ combinations vs a pure-Python
    relational evaluation: per-branch step composition, union of
    branches, Warshall closure for +, identity over the graph's terms
    for the zero-length part of * and ?."""
    from meresco_rdf_spark.sparql import sparql_select

    branches, quant = path
    df = spark.createDataFrame(
        [(s, p, o, "uri", None) for s, p, o in edges],
        "subj string, pred string, obj_value string, obj_kind string, "
        "obj_lang string")

    def step_pairs(direction, pred):
        pairs = {(s, o) for s, p, o in edges if p == pred}
        return pairs if direction == "fwd" else {(o, s) for s, o in pairs}

    base = set()
    for br in branches:
        rel = step_pairs(*br[0])
        for stp in br[1:]:
            nxt = step_pairs(*stp)
            rel = {(a, c) for a, b in rel for b2, c in nxt if b == b2}
        base |= rel
    closure = set(base)
    changed = True
    while changed:
        changed = False
        for a, b in list(closure):
            for b2, c in base:
                if b == b2 and (a, c) not in closure:
                    closure.add((a, c))
                    changed = True
    terms = {s for s, _, _ in edges} | {o for _, _, o in edges}
    ident = {(t, t) for t in terms}
    want = {"+": closure, "*": closure | ident, "?": base | ident}[quant]

    rendered = "(%s)%s" % ("|".join(
        "/".join(("^" if d == "inv" else "") + "<%s>" % u for d, u in br)
        for br in branches), quant)
    got = {(r["x"], r["y"]) for r in sparql_select(
        df, "SELECT DISTINCT ?x ?y WHERE { ?x %s ?y }" % rendered
    ).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# round-3 closing-session operators vs pure-Python models
# ---------------------------------------------------------------------------

_WORDS = st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                  min_size=0, max_size=9)
_CHUNK_DOCS = st.lists(_WORDS, min_size=1, max_size=4)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_CHUNK_DOCS, st.integers(min_value=1, max_value=5),
       st.integers(min_value=0, max_value=4))
def test_chunking_matches_window_model(spark, docs, max_tokens, overlap):
    """chunk_documents vs direct window arithmetic: every window starts
    at a stride multiple, lengths cap at max_tokens, token streams are
    exact slices, empty docs vanish."""
    from meresco_rdf_spark.textops.chunking import chunk_documents

    overlap = min(overlap, max_tokens - 1)
    stride = max_tokens - overlap
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string")
    got = {(r.doc, r.chunk_id): (r.n_tokens, r.chunk)
           for r in chunk_documents(df, max_tokens, overlap).collect()}
    want = {}
    for i, words in enumerate(docs):
        for ci, start in enumerate(range(0, len(words), stride)):
            w = words[start:start + max_tokens]
            want[(i, ci)] = (len(w), " ".join(w))
    assert got == want


_COLL_DOCS = st.lists(_WORDS, min_size=1, max_size=3)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_COLL_DOCS, st.integers(min_value=1, max_value=3))
def test_collocations_match_counting_model(spark, docs, window):
    from meresco_rdf_spark.textops.collocations import collocation_counts

    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string")
    got = {(r.x, r.y): (r.pair_count, r.x_count, r.y_count, r.n_tokens)
           for r in collocation_counts(df, window=window).collect()}
    pair, uni = {}, {}
    for words in docs:
        for i, x in enumerate(words):
            uni[x] = uni.get(x, 0) + 1
            for y in words[i + 1:i + 1 + window]:
                pair[(x, y)] = pair.get((x, y), 0) + 1
    n = sum(uni.values())
    assert got == {(x, y): (c, uni[x], uni[y], n)
                   for (x, y), c in pair.items()}


_G_EDGES = st.lists(
    st.tuples(st.sampled_from("abcde"), st.sampled_from("abcde")),
    min_size=1, max_size=10, unique=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_G_EDGES, st.integers(min_value=1, max_value=4))
def test_walks_match_hash_argmin_model(spark, edges, steps):
    import hashlib

    from meresco_rdf_spark.operators.graph_algos import deterministic_walks

    df = spark.createDataFrame(edges, "src string, dst string")
    starts = sorted({s for s, _ in edges})[:2]
    sdf = spark.createDataFrame([(x,) for x in starts], "node string")
    got = sorted(tuple(r) for r in
                 deterministic_walks(df, sdf, steps).collect())

    def h(wid, step, dst):
        m = hashlib.md5(("\x1f".join([wid, str(step), dst])).encode())
        return int(m.hexdigest()[:15], 16)

    adj = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    want = []
    for wid in starts:
        node = wid
        want.append((wid, 0, node))
        for step in range(1, steps + 1):
            nbrs = adj.get(node)
            if not nbrs:
                break
            node = min(nbrs, key=lambda d: (h(wid, step, d), d))
            want.append((wid, step, node))
    assert got == sorted(want)


_W_EDGES = st.lists(
    st.tuples(st.sampled_from("abcd"), st.sampled_from("abcd"),
              st.integers(min_value=0, max_value=9)),
    min_size=1, max_size=8, unique_by=lambda e: (e[0], e[1]))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_W_EDGES, st.integers(min_value=1, max_value=5))
def test_shortest_paths_match_bellman_ford(spark, edges, max_hops):
    from meresco_rdf_spark.operators.graph_algos import shortest_paths

    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    src = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.dist
           for r in shortest_paths(df, src, max_hops=max_hops).collect()}
    dist = {"a": 0}
    for _ in range(max_hops):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        if nxt == dist:
            break
        dist = nxt
    assert got == dist


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=60, unique=True),
       st.integers(min_value=0, max_value=1_000_000),
       st.integers(min_value=0, max_value=1_000_000))
def test_weighted_sample_monotone_in_rate(spark, ids, r1, r2):
    """A row kept at the lower rate is kept at every higher rate (the
    draw is one fixed number per id compared against the threshold)."""
    from meresco_rdf_spark.textops.sampling import weighted_sample

    lo, hi = min(r1, r2), max(r1, r2)
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    a = {r.doc_id for r in weighted_sample(df, lo).collect()}
    b = {r.doc_id for r in weighted_sample(df, hi).collect()}
    assert a <= b
