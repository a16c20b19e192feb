"""Triple data model: node types + the columnar triple schema.

Node semantics mirror the reference exactly (SURVEY.md §1.2):

- ``Uri`` / ``BNode`` are identifiers (valid graph branch points); ``Literal``
  carries an optional language tag and NO datatype (reference
  ``meresco/rdf/graph/literal.py:39`` — datatype explicitly absent).
- equality = same class + same value (+ lang for Literal:
  ``literal.py:44-45``); hash = hash(value) only (``literal.py:50-51`` —
  hash ignores lang, eq does not).
- ``BNode()`` with no value auto-generates ``_:id0, _:id1, ...`` from a
  process-global counter (``bnode.py:32-39``); tests reset it.  At cluster
  scale the counter is replaced by deterministic scoped ids
  (:func:`scoped_bnode_id`).

At scale there are no row objects: the columnar schema ``TRIPLE_SCHEMA``
(subj, pred, obj_value, obj_kind, obj_lang) IS the type system — the class
tags of ``abstract.py`` flatten into the ``obj_kind`` discriminator column
(SURVEY.md §1.4).  These dataclass-like mirrors exist only at the
serialization / test boundary.
"""

from __future__ import annotations

import hashlib
import re

from .namespaces import namespaces as _ns

# --------------------------------------------------------------------------
# node classes
# --------------------------------------------------------------------------


class GraphElement:
    """Base node type; mirrors ``meresco/rdf/graph/abstract.py:28-44``."""

    __slots__ = ()

    def isUri(self) -> bool:
        return False

    def isBNode(self) -> bool:
        return False

    def isLiteral(self) -> bool:
        return False

    def isIdentifier(self) -> bool:
        return False

    # pythonic aliases
    is_uri = isUri
    is_bnode = isBNode
    is_literal = isLiteral
    is_identifier = isIdentifier

    # total order over nodes so sorted(relations) is deterministic even for
    # mixed kinds (reference relies on py2 __cmp__ by .value:
    # uri.py:79-80, literal.py:62-63)
    def _sort_key(self):
        value = getattr(self, "value", None) or ""
        lang = getattr(self, "lang", None) or ""
        return (value, lang, type(self).__name__)

    def __lt__(self, other):
        return self._sort_key() < other._sort_key()


class Identifier(GraphElement):
    """Uri/BNode superclass; mirrors ``abstract.py:47-53``."""

    __slots__ = ()

    def isIdentifier(self) -> bool:
        return True

    is_identifier = isIdentifier


class Uri(Identifier):
    """URI-reference node; mirrors ``meresco/rdf/graph/uri.py:47-81``."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = str(value) if value else value

    def isUri(self) -> bool:
        return True

    is_uri = isUri

    def __str__(self):
        return self.value

    def __repr__(self):
        return "%s(%s)" % (type(self).__name__, repr(self.value))

    def __hash__(self):
        return hash(self.value)

    def __eq__(self, other):
        return type(other) is type(self) and other.value == self.value

    def __ne__(self, other):
        return not self.__eq__(other)

    @staticmethod
    def matchesIriSyntax(value: str) -> bool:
        return matches_iri_syntax(value)


class BNode(Identifier):
    """Blank node; mirrors ``meresco/rdf/graph/bnode.py:31-59``.

    ``BNode()`` draws ``_:id<N>`` from the process-global counter
    ``BNode.nextGenId`` (deterministic only single-process; the distributed
    path uses :func:`scoped_bnode_id` instead).
    """

    __slots__ = ("value",)

    nextGenId = 0

    def __init__(self, value=None):
        if value is None:
            self.value = "_:id" + str(BNode.nextGenId)
            BNode.nextGenId += 1
        else:
            self.value = str(value) if value else value

    def isBNode(self) -> bool:
        return True

    is_bnode = isBNode

    def __str__(self):
        return self.value

    def __repr__(self):
        return "%s(%s)" % (type(self).__name__, repr(self.value))

    def __hash__(self):
        return hash(self.value)

    def __eq__(self, other):
        return type(other) is type(self) and other.value == self.value

    def __ne__(self, other):
        return not self.__eq__(other)


class Literal(GraphElement):
    """Literal node (value + optional lang); mirrors ``literal.py:33-64``."""

    __slots__ = ("value", "lang")

    def __init__(self, value, lang=None):
        self.value = str(value) if value else value
        self.lang = str(lang) if lang is not None else None

    def isLiteral(self) -> bool:
        return True

    is_literal = isLiteral

    def __str__(self):
        if self.lang:
            return "%s@%s" % (repr(self.value), self.lang)
        return self.value

    def __repr__(self):
        if self.lang:
            return "%s(%s, lang=%s)" % (
                type(self).__name__, repr(self.value), repr(self.lang))
        return "%s(%s)" % (type(self).__name__, repr(self.value))

    def __hash__(self):
        # hash intentionally ignores lang while __eq__ does not
        # (reference literal.py:50-51 vs :44-45)
        return hash(self.value)

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and self.value == other.value
            and other.lang == self.lang
        )

    def __ne__(self, other):
        return not self.__eq__(other)


def is_graph_element(o) -> bool:
    return isinstance(o, GraphElement)


# --------------------------------------------------------------------------
# IRI syntax validation (reference: graph/uri.py:35-44 via the rfc3987 pkg)
# --------------------------------------------------------------------------

# RFC 3987 IRI grammar condensed to a single anchored regex (public grammar;
# scheme ":" ihier-part [ "?" iquery ] [ "#" ifragment ]).  Vectorizes to a
# Spark `rlike` for cluster-side validation (functions/uri_fns.py).
_UCS = " -퟿豈-﷏ﷰ-￯\U00010000-\U000effff"
_IPRIVATE = "-\U000f0000-\U000ffffd\U00100000-\U0010fffd"
_UNRES = "A-Za-z0-9\\-._~" + _UCS
_SUBDEL = "!$&'()*+,;="
_PCT = "(?:%[0-9A-Fa-f]{2})"
_PCHAR = "(?:[%s%s:@]|%s)" % (_UNRES, _SUBDEL, _PCT)
_SCHEME = "[A-Za-z][A-Za-z0-9+.\\-]*"
_USERINFO = "(?:[%s%s:]|%s)*" % (_UNRES, _SUBDEL, _PCT)
_REGNAME = "(?:[%s%s]|%s)*" % (_UNRES, _SUBDEL, _PCT)
_IPLITERAL = r"\[[0-9A-Fa-f:.v]+\]"
_IPV4 = r"(?:\d{1,3}\.){3}\d{1,3}"
_HOST = "(?:%s|%s|%s)" % (_IPLITERAL, _IPV4, _REGNAME)
_AUTHORITY = "(?:%s@)?%s(?::\\d*)?" % (_USERINFO, _HOST)
_SEGMENT = "%s*" % _PCHAR
_SEGMENT_NZ = "%s+" % _PCHAR
_PATH_ABEMPTY = "(?:/%s)*" % _SEGMENT
_PATH_ABS = "/(?:%s(?:/%s)*)?" % (_SEGMENT_NZ, _SEGMENT)
_PATH_ROOTLESS = "%s(?:/%s)*" % (_SEGMENT_NZ, _SEGMENT)
_HIER = "(?://%s%s|%s|%s|)" % (_AUTHORITY, _PATH_ABEMPTY, _PATH_ABS, _PATH_ROOTLESS)
_QUERY = "(?:[%s%s:@/?%s]|%s)*" % (_UNRES, _SUBDEL, _IPRIVATE, _PCT)
_FRAGMENT = "(?:[%s%s:@/?]|%s)*" % (_UNRES, _SUBDEL, _PCT)
IRI_REGEX = "%s:%s(?:\\?%s)?(?:#%s)?" % (_SCHEME, _HIER, _QUERY, _FRAGMENT)
_IRI_RE = re.compile("^(?:%s)$" % IRI_REGEX)


def matches_iri_syntax(value: str) -> bool:
    """RFC-3987 'IRI' rule check (reference graph/uri.py:35-44)."""
    try:
        return _IRI_RE.match(value) is not None
    except TypeError:
        return False


# --------------------------------------------------------------------------
# columnar triple schema (SURVEY.md §1.4 / FIXTURES.md §2)
# --------------------------------------------------------------------------

OBJ_KIND_URI = "uri"
OBJ_KIND_BNODE = "bnode"
OBJ_KIND_LITERAL = "literal"

TRIPLE_COLUMNS = ("subj", "pred", "obj_value", "obj_kind", "obj_lang")


def triple_schema():
    """``StructType`` for the triples relation (imported lazily so the pure
    model stays usable without a JVM)."""
    from pyspark.sql.types import StringType, StructField, StructType

    return StructType([
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj_value", StringType(), True),
        StructField("obj_kind", StringType(), False),
        StructField("obj_lang", StringType(), True),
    ])


def node_to_row(subj: str, pred: str, obj) -> tuple:
    """(s, p, node-or-str) -> 5-column row.

    A bare-string object is classified by the reference's convention: only
    objects are wrapped; raw strings stay opaque — we map them to literals
    unless they look like ``_:`` bnode labels (``triples2rdfxml.py:83``
    uses the same ``startswith('_:')`` test).
    """
    if isinstance(obj, Uri):
        return (subj, pred, obj.value, OBJ_KIND_URI, None)
    if isinstance(obj, BNode):
        return (subj, pred, obj.value, OBJ_KIND_BNODE, None)
    if isinstance(obj, Literal):
        return (subj, pred, obj.value if obj.value else "", OBJ_KIND_LITERAL, obj.lang)
    value = str(obj)
    if value.startswith("_:"):
        return (subj, pred, value, OBJ_KIND_BNODE, None)
    return (subj, pred, value, OBJ_KIND_LITERAL, None)


def row_to_node(obj_value, obj_kind, obj_lang=None):
    if obj_kind == OBJ_KIND_URI:
        return Uri(obj_value)
    if obj_kind == OBJ_KIND_BNODE:
        return BNode(obj_value)
    return Literal(obj_value, lang=obj_lang)


def scoped_bnode_id(scope: str, ordinal: int) -> str:
    """Deterministic cluster-safe bnode id (replaces BNode.nextGenId).

    Bnode labels are document-scoped in RDF, so hashing (scope, ordinal)
    is collision-safe across a cluster with no coordination
    (SURVEY.md §1.4).
    """
    digest = hashlib.sha1(("%s\x00%d" % (scope, ordinal)).encode("utf-8")).hexdigest()
    return "_:b" + digest[:20]


# --------------------------------------------------------------------------
# label-predicate priorities (reference _uris.py:28-35)
# --------------------------------------------------------------------------

FOAF_NAME = _ns.curie_to_uri("foaf:name")
RDFS_LABEL = _ns.curie_to_uri("rdfs:label")
SKOS_PREFLABEL = _ns.curie_to_uri("skos:prefLabel")
DCTERMS_TITLE = _ns.curie_to_uri("dcterms:title")
SKOS_ALTLABEL = _ns.curie_to_uri("skos:altLabel")

PRIMARY_LABEL_PREDICATES = [FOAF_NAME, RDFS_LABEL, SKOS_PREFLABEL, DCTERMS_TITLE]
LABEL_PREDICATES = PRIMARY_LABEL_PREDICATES + [SKOS_ALTLABEL]

RDF_TYPE = _ns.curie_to_uri("rdf:type")
RDF_STATEMENT = _ns.curie_to_uri("rdf:Statement")
RDF_SUBJECT = _ns.curie_to_uri("rdf:subject")
RDF_PREDICATE = _ns.curie_to_uri("rdf:predicate")
RDF_OBJECT = _ns.curie_to_uri("rdf:object")
