"""Turtle (Terse RDF Triple Language) parser.

The reference ingests RDF/XML (``meresco/rdf/graph/graphcomponent.py:68-74``
routes ``.rdf`` -> ``text/xml``) and declares a ``.nt`` path; Turtle is the
third — and in the wild the most common — RDF serialization, so a user
switching from the reference to this engine gets ``.ttl`` ingest as an
engine extension (polish, not parity; same positioning as the ``.nt``
path, ``rdfxml/ntriples.py``).

Node model is the reference's exactly (``meresco/rdf/graph/literal.py:39``):
objects are Uri / BNode / Literal where a Literal carries an optional
language tag and NO datatype — ``^^<datatype>`` is accepted syntactically
and dropped, numeric/boolean shorthands keep their lexical form as plain
literals.

Grammar subset (https://www.w3.org/TR/turtle/): ``@prefix``/``@base`` and
SPARQL-style ``PREFIX``/``BASE`` directives, IRIREFs with ``\\uXXXX``
escapes, prefixed names (PN_LOCAL ``\\``-escapes decoded, interior dots
kept, trailing dot excluded), ``a``, predicate lists ``;``, object lists
``,``, labeled ``_:x`` and anonymous ``[]`` blank nodes, blank-node
property lists ``[ p o ; ... ]``, collections ``( ... )`` desugared to
``rdf:first``/``rdf:rest``/``rdf:nil`` chains, short and long strings in
both quote styles with N-Triples escapes, ``@lang`` tags, numeric and
boolean shorthands, ``#`` comments.  Not covered: ``sparql``-base
case-insensitivity beyond PREFIX/BASE keywords themselves, RDF-star.

Anonymous blank nodes draw ``_:idN`` from the process-global ``BNode``
counter, exactly like ``rdfxml/parser.py`` — the distributed ingest
(``sources/rdf_source.py``) resets the counter per document and rescopes
labels deterministically.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Tuple
from urllib.parse import urljoin

from ..graph import Graph
from ..model import BNode, Literal, Uri
from .ntriples import unescape

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_TYPE = RDF_NS + "type"

# Reserved characters a PN_LOCAL may carry behind a backslash
# (https://www.w3.org/TR/turtle/#grammar-production-PN_LOCAL_ESC)
_PN_LOCAL_ESC_RE = re.compile(r"\\([_~.\-!$&'()*+,;=/?#@%])")

# one master scanner; alternatives ordered so the longest/most-specific
# token wins (long strings before short, directives before langtags,
# numbers before the '.' statement terminator)
_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<long_str>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"
                  |'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<short_str>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
    | (?P<iriref><[^<>\s]*>)
    | (?P<directive>@prefix\b|@base\b)
    | (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<dtype>\^\^)
    | (?P<number>[+-]?(?:\d*\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<blank>_:[A-Za-z0-9_](?:[A-Za-z0-9_.:\-]*[A-Za-z0-9_\-])?)
    | (?P<pname>(?:[A-Za-z][A-Za-z0-9_.\-]*)?:
                (?:[A-Za-z0-9_:%\-]|\\[_~.\-!$&'()*+,;=/?\#@%]
                 |\.(?=[A-Za-z0-9_:%\-\\.]))*)
    | (?P<punct>[\[\](){};,.])
    | (?P<keyword>a\b|true\b|false\b|(?i:PREFIX\b|BASE\b|GRAPH\b))
    """,
    re.VERBOSE | re.DOTALL,
)


class TurtleParseError(ValueError):
    pass


def _tokenize(text: str) -> List[Tuple[str, str]]:
    tokens: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise TurtleParseError(
                "unexpected input at offset %d: %r" % (pos, text[pos:pos + 30]))
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            tokens.append((kind, m.group()))
    return tokens


class _Parser:
    # tokens that may legally follow a statement in place of its '.'
    # (TriG subclasses add '}' for statements ending a graph block)
    STMT_END = (".",)

    def __init__(self, text: str, sink: Graph, base: Optional[str]):
        self.tokens = _tokenize(text)
        self.i = 0
        self.graph = sink
        self.base = base
        self.prefixes: dict[str, str] = {}

    # -- token stream ------------------------------------------------------
    def _peek(self) -> Tuple[str, str]:
        if self.i >= len(self.tokens):
            return ("eof", "")
        return self.tokens[self.i]

    def _next(self) -> Tuple[str, str]:
        tok = self._peek()
        self.i += 1
        return tok

    def _expect(self, value: str) -> None:
        kind, tok = self._next()
        if tok != value:
            raise TurtleParseError("expected %r, got %r" % (value, tok))

    # -- term helpers ------------------------------------------------------
    def _resolve_iriref(self, tok: str) -> str:
        ref = unescape(tok[1:-1])
        if self.base is not None:
            return urljoin(self.base, ref)
        return ref

    def _expand_pname(self, tok: str) -> str:
        prefix, _, local = tok.partition(":")
        if prefix not in self.prefixes:
            raise TurtleParseError("undeclared prefix %r" % prefix)
        return self.prefixes[prefix] + _PN_LOCAL_ESC_RE.sub(r"\1", local)

    def _iri(self, kind: str, tok: str) -> str:
        if kind == "iriref":
            return self._resolve_iriref(tok)
        if kind == "pname":
            return self._expand_pname(tok)
        raise TurtleParseError("expected IRI, got %r" % tok)

    # -- grammar -----------------------------------------------------------
    def parse(self) -> Graph:
        while self._peek()[0] != "eof":
            kind, tok = self._peek()
            if kind == "directive" or (kind == "keyword"
                                       and tok.upper() in ("PREFIX", "BASE")):
                self._directive()
            else:
                self._triples()
                self._expect(".")
        return self.graph

    def _directive(self) -> None:
        _, tok = self._next()
        sparql_style = not tok.startswith("@")
        if tok.lower().lstrip("@") == "prefix":
            kind, name = self._next()
            if kind != "pname" or not name.endswith(":"):
                raise TurtleParseError("bad prefix name %r" % name)
            kind, iri = self._next()
            if kind != "iriref":
                raise TurtleParseError("prefix IRI must be an IRIREF")
            self.prefixes[name[:-1]] = self._resolve_iriref(iri)
        else:  # base
            kind, iri = self._next()
            if kind != "iriref":
                raise TurtleParseError("base IRI must be an IRIREF")
            self.base = self._resolve_iriref(iri)
        if not sparql_style:
            self._expect(".")

    def _triples(self) -> None:
        kind, tok = self._peek()
        if tok == "[":
            subj = self._bnode_property_list()
            # a lone "[...]" may legally end the statement (subject with
            # no further predicates)
            if self._peek()[1] not in self.STMT_END:
                self._predicate_object_list(subj)
            return
        if tok == "(":
            subj = self._collection()
        elif kind == "blank":
            self._next()
            subj = tok
        else:
            self._next()
            subj = self._iri(kind, tok)
        self._predicate_object_list(subj)

    def _predicate_object_list(self, subj: str) -> None:
        while True:
            kind, tok = self._next()
            if kind == "keyword" and tok == "a":
                pred = RDF_TYPE
            else:
                pred = self._iri(kind, tok)
            while True:
                obj = self._object()
                self.graph.addTriple(subj, pred, obj)
                if self._peek()[1] == ",":
                    self._next()
                    continue
                break
            if self._peek()[1] == ";":
                self._next()
                # trailing ';' before '.' or ']' is legal
                if (self._peek()[1] in self.STMT_END + ("]",)
                        or self._peek()[0] == "eof"):
                    return
                continue
            return

    def _object(self):
        kind, tok = self._peek()
        if tok == "[":
            return BNode(self._bnode_property_list())
        if tok == "(":
            head = self._collection()
            return Uri(head) if head == RDF_NIL else BNode(head)
        self._next()
        if kind == "blank":
            return BNode(tok)
        if kind in ("iriref", "pname"):
            return Uri(self._iri(kind, tok))
        if kind in ("short_str", "long_str"):
            return self._literal(tok)
        if kind == "number":
            return Literal(tok)
        if kind == "keyword" and tok in ("true", "false"):
            return Literal(tok)
        raise TurtleParseError("expected object, got %r" % tok)

    def _literal(self, tok: str) -> Literal:
        body = tok[3:-3] if tok[:3] in ('"""', "'''") else tok[1:-1]
        value = unescape(body)
        kind, nxt = self._peek()
        if kind == "langtag":
            self._next()
            return Literal(value, lang=nxt[1:])
        if kind == "dtype":  # ^^<iri> accepted, datatype dropped
            self._next()
            kind, tok = self._next()
            self._iri(kind, tok)  # validate it IS an IRI
            return Literal(value)
        return Literal(value)

    def _bnode_property_list(self) -> str:
        self._expect("[")
        node = BNode()
        if self._peek()[1] != "]":
            self._predicate_object_list(node.value)
        self._expect("]")
        return node.value

    def _collection(self) -> str:
        self._expect("(")
        items = []
        while self._peek()[1] != ")":
            if self._peek()[0] == "eof":
                raise TurtleParseError("unterminated collection")
            items.append(self._object())
        self._expect(")")
        if not items:
            return RDF_NIL
        cells = [BNode() for _ in items]
        for cell, item, rest in zip(
                cells, items, cells[1:] + [None]):
            self.graph.addTriple(cell.value, RDF_FIRST, item)
            self.graph.addTriple(
                cell.value, RDF_REST,
                Uri(RDF_NIL) if rest is None else rest)
        return cells[0].value


def parse_turtle(text: str, sink: Optional[Graph] = None,
                 base: Optional[str] = None) -> Graph:
    """Parse a Turtle document into a Graph (mirror of ``parse_rdfxml`` /
    ``parse_ntriples``)."""
    graph = sink if sink is not None else Graph()
    return _Parser(text, graph, base).parse()


def iter_turtle(text: str, base: Optional[str] = None) -> Iterator[tuple]:
    yield from parse_turtle(text, base=base).triples()
