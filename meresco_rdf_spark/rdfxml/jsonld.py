"""JSON-LD parser (scoped subset) — the sixth ingest format.

The reference ingests RDF/XML only (``graphcomponent.py:68-74``);
JSON-LD is the serialization REST APIs and schema.org publishers emit,
so a pipeline user gets ``.jsonld`` ingest as an engine extension (same
positioning as the ``.nt``/``.ttl``/``.nq``/``.trig`` paths).

Node model is the reference's exactly (``meresco/rdf/graph/literal.py:39``):
objects are Uri / BNode / Literal where a Literal carries an optional
language tag and NO datatype — ``@type`` inside a value object is
accepted and dropped; JSON numbers and booleans keep their JSON lexical
form as plain literals.

Accepted document shapes (https://www.w3.org/TR/json-ld11/): a single
node object, an array of node objects (expanded / flattened form — the
same ``@id`` MAY recur; the graph is the union), a document wrapper with
``@context`` and/or ``@graph``, and NDJSON shards (one node object per
line — the form ``sinks.jsonld_sink`` writes; tried when the whole file
is not one JSON value).  Inside node objects: ``@id`` (absent -> fresh
document-scoped bnode), ``@type`` (string or array), nested node
objects, value objects (``@value``/``@language``/``@type``), ``@list``
(desugared to ``rdf:first``/``rdf:rest``/``rdf:nil`` chains like the
Turtle parser), ``@graph`` blocks (named graphs — quad entry point),
and ``@reverse`` blocks (inverted emission).

``@context`` subset: a local MAP (term -> IRI string, or term ->
``{"@id", "@type": "@id"|dropped-datatype, "@language",
"@container": "@set"|"@list"}``), ``@vocab``, ``@base``,
``@language``; terms double as prefixes for compact IRIs.  REJECTED
loudly (``JsonLdUnsupported``): remote contexts (a URL — this engine
does not fetch), context arrays, scoped/nested contexts, ``@container``
values other than ``@set``/``@list``, ``@index``/``@nest``/``@json``,
and keyword aliasing.  Rejecting beats silently mis-reading a document
whose semantics live in an unfetched context.
"""

from __future__ import annotations

import json
from typing import Dict, Iterator, List, Optional, Tuple
from urllib.parse import urljoin

from ..graph import Graph
from ..model import BNode, Literal, Uri

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_TYPE = RDF_NS + "type"

Quad = Tuple[Optional[str], str, str, object]

_KEYWORDS = {"@id", "@type", "@value", "@language", "@list", "@set",
             "@graph", "@context", "@reverse", "@base", "@vocab"}


class JsonLdParseError(ValueError):
    pass


class JsonLdUnsupported(JsonLdParseError):
    """The document needs a JSON-LD feature outside this engine's
    documented subset (e.g. a remote context)."""


class _TermDef:
    __slots__ = ("iri", "is_id", "language", "is_list")

    def __init__(self, iri, is_id=False, language=None, is_list=False):
        self.iri = iri
        self.is_id = is_id
        self.language = language
        self.is_list = is_list


class _Context:
    def __init__(self) -> None:
        self.base: Optional[str] = None
        self.vocab: Optional[str] = None
        self.language: Optional[str] = None
        self.terms: Dict[str, _TermDef] = {}

    def load(self, ctx) -> None:
        if not isinstance(ctx, dict):
            raise JsonLdUnsupported(
                "only a local map @context is supported (remote context "
                "URLs are not fetched; context arrays are not merged) — "
                "got %s" % type(ctx).__name__)
        for key, val in ctx.items():
            if key == "@base":
                self.base = val
            elif key == "@vocab":
                self.vocab = val
            elif key == "@language":
                self.language = val
            elif key.startswith("@"):
                raise JsonLdUnsupported(
                    "unsupported @context keyword %r" % key)
            elif isinstance(val, str):
                if val in _KEYWORDS:
                    raise JsonLdUnsupported(
                        "keyword aliasing (%r -> %r) is not supported"
                        % (key, val))
                self.terms[key] = _TermDef(val)
            elif isinstance(val, dict):
                extra = set(val) - {"@id", "@type", "@language",
                                    "@container"}
                if extra:
                    raise JsonLdUnsupported(
                        "unsupported term-definition keys %s for %r"
                        % (sorted(extra), key))
                container = val.get("@container")
                if container not in (None, "@set", "@list"):
                    raise JsonLdUnsupported(
                        "@container %r is not supported (only @set/"
                        "@list)" % container)
                self.terms[key] = _TermDef(
                    val.get("@id", key),
                    is_id=val.get("@type") == "@id",
                    language=val.get("@language"),
                    is_list=container == "@list")
            else:
                raise JsonLdUnsupported(
                    "term %r has unsupported definition type %s"
                    % (key, type(val).__name__))
        # expand term IRIs that are themselves compact (one pass is
        # enough for the prefix:suffix convention)
        for t in self.terms.values():
            t.iri = self._expand(t.iri, vocab=True)

    def _expand(self, value: str, vocab: bool) -> str:
        if value.startswith("_:") or value.startswith("@"):
            return value
        if ":" in value:
            prefix, _, suffix = value.partition(":")
            td = self.terms.get(prefix)
            if td is not None and not suffix.startswith("//"):
                return td.iri + suffix
            return value  # absolute IRI (or urn:/http: etc.)
        td = self.terms.get(value)
        if td is not None:
            return td.iri
        if vocab and self.vocab:
            return self.vocab + value
        if not vocab and self.base:
            return urljoin(self.base, value)
        return value

    def expand_pred(self, value: str) -> str:
        return self._expand(value, vocab=True)

    def expand_id(self, value: str) -> str:
        return self._expand(value, vocab=False)


class _Parser:
    def __init__(self) -> None:
        self.quads: List[Quad] = []

    def emit(self, graph: Optional[str], s: str, p: str, o) -> None:
        self.quads.append((graph, s, p, o))

    def parse_document(self, doc) -> None:
        ctx = _Context()
        if isinstance(doc, dict) and "@context" in doc:
            ctx.load(doc["@context"])
            doc = {k: v for k, v in doc.items() if k != "@context"}
        if isinstance(doc, dict) and "@graph" in doc and "@id" not in doc:
            # document wrapper: @graph is the default graph
            body = doc["@graph"]
            rest = {k: v for k, v in doc.items() if k != "@graph"}
            if rest:
                raise JsonLdParseError(
                    "document wrapper carries node properties %s without "
                    "an @id" % sorted(rest))
        else:
            body = doc
        for node in body if isinstance(body, list) else [body]:
            self.node_object(node, ctx, graph=None)

    # -- node objects ------------------------------------------------

    def node_object(self, node, ctx: _Context, graph: Optional[str]):
        """Emit a node object's statements; return its subject term
        string (IRI or bnode label)."""
        if not isinstance(node, dict):
            raise JsonLdParseError(
                "expected a node object, got %s" % type(node).__name__)
        if "@value" in node:
            raise JsonLdParseError("a value object cannot be a node")
        if "@context" in node:
            raise JsonLdUnsupported(
                "nested @context (scoped contexts) are not supported")
        subj = (ctx.expand_id(node["@id"]) if "@id" in node
                else BNode().value)
        for key, val in node.items():
            if key == "@id":
                continue
            elif key == "@type":
                for t in val if isinstance(val, list) else [val]:
                    self.emit(graph, subj, RDF_TYPE,
                              Uri(ctx.expand_pred(t)))
            elif key == "@graph":
                # a node object with @id and @graph names a graph
                inner = val if isinstance(val, list) else [val]
                for n in inner:
                    self.node_object(n, ctx, graph=subj)
            elif key == "@reverse":
                if not isinstance(val, dict):
                    raise JsonLdParseError("@reverse must be a map")
                for rp, rv in val.items():
                    pred = ctx.expand_pred(rp)
                    for item in rv if isinstance(rv, list) else [rv]:
                        other = self.node_object(item, ctx, graph)
                        self.emit(graph, other, pred, _as_node(subj))
            elif key.startswith("@"):
                raise JsonLdUnsupported(
                    "unsupported keyword %r in node object" % key)
            else:
                pred = ctx.expand_pred(key)
                td = ctx.terms.get(key)
                values = val if isinstance(val, list) else [val]
                if td is not None and td.is_list:
                    self.emit(graph, subj, pred,
                              _as_node(self.list_chain(values, ctx,
                                                       graph, td)))
                    continue
                for item in values:
                    self.value(subj, pred, item, ctx, graph, td)
        return subj

    def value(self, subj, pred, item, ctx, graph, td) -> None:
        if isinstance(item, dict):
            if "@list" in item:
                extra = set(item) - {"@list"}
                if extra:
                    raise JsonLdParseError(
                        "@list object carries extra keys %s"
                        % sorted(extra))
                self.emit(graph, subj, pred,
                          _as_node(self.list_chain(item["@list"], ctx,
                                                   graph, td)))
            elif "@value" in item:
                extra = set(item) - {"@value", "@language", "@type"}
                if extra:
                    raise JsonLdUnsupported(
                        "unsupported value-object keys %s"
                        % sorted(extra))
                self.emit(graph, subj, pred, Literal(
                    _lexical(item["@value"]),
                    lang=item.get("@language")))  # @type (datatype) dropped
            elif set(item) == {"@id"}:
                self.emit(graph, subj, pred,
                          _as_node(ctx.expand_id(item["@id"])))
            else:
                other = self.node_object(item, ctx, graph)
                self.emit(graph, subj, pred, _as_node(other))
        elif isinstance(item, str):
            if td is not None and td.is_id:
                self.emit(graph, subj, pred, _as_node(ctx.expand_id(item)))
            else:
                lang = (td.language if td is not None
                        and td.language is not None else ctx.language)
                self.emit(graph, subj, pred, Literal(item, lang=lang))
        elif item is None:
            return  # null value = statement absent (JSON-LD 1.1 §4.1)
        else:
            self.emit(graph, subj, pred, Literal(_lexical(item)))

    def list_chain(self, items, ctx, graph, td) -> str:
        """Desugar a @list to rdf:first/rest/nil (Turtle collection
        discipline)."""
        if not isinstance(items, list):
            items = [items]
        if not items:
            return RDF_NIL
        # list members never inherit the @list coercion itself
        td_member = (None if td is None else
                     _TermDef(td.iri, td.is_id, td.language, False))
        cells = [BNode().value for _ in items]
        for i, item in enumerate(items):
            self.value(cells[i], RDF_FIRST, item, ctx, graph, td_member)
            self.emit(graph, cells[i], RDF_REST,
                      _as_node(cells[i + 1] if i + 1 < len(items)
                               else RDF_NIL))
        return cells[0]


def _as_node(term: str):
    return BNode(term) if term.startswith("_:") else Uri(term)


def _lexical(value) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float) and value == int(value):
        return str(value)  # keep the JSON float's lexical shape
    return str(value)


def _load(text_or_obj):
    if not isinstance(text_or_obj, str):
        return text_or_obj
    try:
        return json.loads(text_or_obj)
    except json.JSONDecodeError:
        # NDJSON shard (the jsonld_sink output shape): one node object
        # per non-empty line
        out = []
        for i, line in enumerate(text_or_obj.splitlines()):
            if not line.strip():
                continue
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError as exc:
                raise JsonLdParseError(
                    "neither a JSON document nor NDJSON (line %d: %s)"
                    % (i + 1, exc)) from exc
        return out


def parse_jsonld_quads(text_or_obj) -> List[Quad]:
    """JSON-LD document (or parsed object) -> quads
    ``(graph_label_or_None, subj, pred, obj_node)``."""
    p = _Parser()
    p.parse_document(_load(text_or_obj))
    return p.quads


def parse_jsonld(text_or_obj, sink: Optional[Graph] = None) -> Graph:
    """Triple entry point: named-graph documents are rejected (use
    ``parse_jsonld_quads``)."""
    graph = sink if sink is not None else Graph()
    for g, s, pred, o in parse_jsonld_quads(text_or_obj):
        if g is not None:
            raise JsonLdParseError(
                "document uses named graphs (@graph under an @id); use "
                "parse_jsonld_quads")
        graph.addTriple(s, pred, o)
    return graph


def iter_jsonld(text_or_obj) -> Iterator[tuple]:
    for _, s, p, o in parse_jsonld_quads(text_or_obj):
        yield s, p, o
