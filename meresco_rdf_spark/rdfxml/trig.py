"""TriG (Turtle for RDF datasets) parser.

TriG (https://www.w3.org/TR/trig/) is Turtle plus named-graph blocks —
the human-readable counterpart of N-Quads.  Supported dataset grammar:

- ``GRAPH <label> { ... }``  (label: IRI, prefixed name, or blank node)
- ``<label> { ... }``        (the keyword-less form)
- ``{ ... }``                (an explicit default-graph block)
- bare Turtle statements     (the default graph)

Statements inside a block are full Turtle (the entire grammar of
``rdfxml/turtle.py`` — property/object lists, bnode property lists,
collections, long strings); the final ``.`` inside a block is optional
per the TriG production ``triplesBlock``.  The same graph label may
label several blocks; the graph is the union (spec §2.2) — which is
exactly what lets the distributed sink emit per-subject blocks.

Node/literal model identical to the Turtle module (reference semantics:
lang kept, ``^^datatype`` accepted and dropped).  No reference
counterpart (the reference has no quad model); engine extension
completing the quad story alongside ``rdfxml/nquads.py``.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

from ..model import BNode
from .turtle import TurtleParseError, _Parser

Quad = Tuple[Optional[str], str, str, object]


class _QuadSink:
    """Graph-shaped sink that tags each triple with the parser's current
    graph label (None = default graph)."""

    def __init__(self) -> None:
        self.current_graph: Optional[str] = None
        self.quads: List[Quad] = []

    def addTriple(self, subj: str, pred: str, obj: object) -> None:
        self.quads.append((self.current_graph, subj, pred, obj))


class _TrigParser(_Parser):
    STMT_END = (".", "}")

    def __init__(self, text: str, base: Optional[str]):
        sink = _QuadSink()
        super().__init__(text, sink, base)
        self.sink = sink

    def parse_quads(self) -> List[Quad]:
        while self._peek()[0] != "eof":
            kind, tok = self._peek()
            if kind == "directive" or (kind == "keyword"
                                       and tok.upper() in ("PREFIX", "BASE")):
                self._directive()
            elif kind == "keyword" and tok.upper() == "GRAPH":
                self._next()
                self._wrapped_graph(self._graph_label())
            elif tok == "{":
                self._wrapped_graph(None)
            elif tok in ("[", "("):
                self._triples()
                self._expect(".")
            else:
                # labelOrSubject: an IRI/bnode followed by '{' opens a
                # graph block; anything else is a default-graph statement
                self._next()
                term = tok if kind == "blank" else self._iri(kind, tok)
                if self._peek()[1] == "{":
                    self._wrapped_graph(term)
                else:
                    self._predicate_object_list(term)
                    self._expect(".")
        return self.sink.quads

    def _graph_label(self) -> str:
        kind, tok = self._next()
        if kind == "blank":
            return tok
        if tok == "[":  # ANON graph label
            self._expect("]")
            return BNode().value
        return self._iri(kind, tok)

    def _wrapped_graph(self, label: Optional[str]) -> None:
        prev = self.sink.current_graph
        self.sink.current_graph = label
        self._expect("{")
        while self._peek()[1] != "}":
            if self._peek()[0] == "eof":
                raise TurtleParseError("unterminated graph block")
            self._triples()
            if self._peek()[1] == ".":
                self._next()
            elif self._peek()[1] != "}":
                raise TurtleParseError(
                    "expected '.' or '}' after statement, got %r"
                    % self._peek()[1])
        self._expect("}")
        self.sink.current_graph = prev


def parse_trig(text: str, base: Optional[str] = None) -> List[Quad]:
    """Parse a TriG document into a list of
    (graph-or-None, subject, predicate, object-node) quads."""
    return _TrigParser(text, base).parse_quads()


def iter_trig(text: str, base: Optional[str] = None) -> Iterator[Quad]:
    yield from parse_trig(text, base=base)
