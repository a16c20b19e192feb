"""N-Triples (line-oriented) parser.

The reference DECLARES the ``.nt`` -> text/plain ingest path
(``meresco/rdf/graph/graphcomponent.py:68-74``) but ships no N-Triples
parser — feeding a ``.nt`` file into its ``lxml.etree.XML`` call would
fail, so the path is dead there.  This module makes the declared path
real, with the reference's node model: objects are Uri / BNode / Literal
(lang tag only — ``rdf:datatype`` is accepted syntactically and dropped,
matching the reference's documented literal model,
``meresco/rdf/graph/literal.py:39`` and ``rdfparser.py:156``).

Grammar (https://www.w3.org/TR/n-triples/, the subset without datatype
preservation): one triple per line, ``subject predicate object .``,
``#`` comments, blank lines.  Escapes handled: ``\\t \\b \\n \\r \\f
\\" \\' \\\\ \\uXXXX \\UXXXXXXXX``.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional, Tuple

from ..graph import Graph
from ..model import BNode, Literal, Uri

# subject: IRIREF or blank node label; predicate: IRIREF; object: either,
# or a quoted literal with optional language tag / datatype
_LINE_RE = re.compile(
    r'^\s*'
    r'(?P<subj><[^<>\s]*>|_:\S+)\s+'
    r'(?P<pred><[^<>\s]*>)\s+'
    r'(?P<obj><[^<>\s]*>|_:\S+|"(?:[^"\\]|\\.)*"'
    r'(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^<>\s]*>)?)'
    r'\s*\.\s*$')

_ESCAPE_RE = re.compile(
    r'\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|[tbnrf"\'\\])')

_ESCAPE_MAP = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def unescape(value: str) -> str:
    """Decode N-Triples string escapes (``\\n``, ``\\uXXXX``, ...)."""
    def sub(m: re.Match) -> str:
        esc = m.group(1)
        if esc[0] in "uU":
            return chr(int(esc[1:], 16))
        return _ESCAPE_MAP[esc]

    return _ESCAPE_RE.sub(sub, value)


def parse_ntriples_line(line: str) -> Optional[Tuple[str, str, object]]:
    """One line -> (subject, predicate, object-node), or None for blank
    lines and comments.  Raises ``ValueError`` on malformed input."""
    stripped = line.strip()
    if not stripped or stripped.startswith("#"):
        return None
    m = _LINE_RE.match(line)
    if m is None:
        raise ValueError("malformed N-Triples line: %r" % line.strip())
    subj_tok, pred_tok, obj_tok = m.group("subj", "pred", "obj")
    subj = unescape(subj_tok[1:-1]) if subj_tok.startswith("<") else subj_tok
    pred = unescape(pred_tok[1:-1])
    if obj_tok.startswith("<"):
        obj: object = Uri(unescape(obj_tok[1:-1]))
    elif obj_tok.startswith("_:"):
        obj = BNode(obj_tok)
    else:
        lang = None
        body = obj_tok
        if not body.endswith('"'):
            if body.rfind("@") > body.rfind('"'):
                body, _, lang = body.rpartition("@")
            else:  # ^^<datatype>: dropped (reference literal model)
                body = body[:body.rfind("^^")]
        obj = Literal(unescape(body[1:-1]), lang=lang)
    return subj, pred, obj


def parse_ntriples(text: str, sink: Optional[Graph] = None) -> Graph:
    """Parse a whole N-Triples document into a Graph (mirror of
    ``parse_rdfxml``)."""
    graph = sink if sink is not None else Graph()
    for line in text.splitlines():
        parsed = parse_ntriples_line(line)
        if parsed is not None:
            graph.addTriple(*parsed)
    return graph


def iter_ntriples(text: str) -> Iterator[Tuple[str, str, object]]:
    for line in text.splitlines():
        parsed = parse_ntriples_line(line)
        if parsed is not None:
            yield parsed
