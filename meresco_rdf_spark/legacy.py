"""Legacy flat node API with strict typing + SPARQL-JSON decoding.

Mirrors the reference's top-level ``meresco/rdf/{uri,literal,bnode}.py``
(distinct from the graph node classes): constructors raise ``ValueError``
on non-string input — including re-wrapping an existing node
(``rdf/uri.py:29-31``, pinned by ``test/uritest.py:48-56``) — and
``fromDict`` classmethods decode SPARQL-JSON result bindings
``{"type": "uri"|"literal"|"bnode", "value": ..., "xml:lang": ...}``
(``rdf/uri.py:35-36``, ``rdf/literal.py:35-38``, ``rdf/bnode.py:34-35``).

The distributed equivalent of ``fromDict`` is
``sources.sparql_json.decode_bindings`` (``from_json`` + kind mapping).
"""

from __future__ import annotations

from .model import matches_iri_syntax


class Uri:
    def __init__(self, value):
        if not isinstance(value, str):
            raise ValueError("Expected a stringlike object")
        self.value = value

    @classmethod
    def fromDict(cls, valueDict):
        return cls(valueDict["value"])

    from_dict = fromDict

    def __str__(self):
        return self.value

    def __repr__(self):
        return "%s(%s)" % (type(self).__name__, repr(self.value))

    def __hash__(self):
        return hash(str(self))

    def __eq__(self, other):
        return type(other) is type(self) and other.value == self.value

    def __ne__(self, other):
        return not self.__eq__(other)

    matchesUriSyntax = staticmethod(matches_iri_syntax)


class BNode:
    def __init__(self, value):
        if not isinstance(value, str):
            raise ValueError("Expected a stringlike object")
        self.value = value

    @classmethod
    def fromDict(cls, valueDict):
        return cls(valueDict["value"])

    from_dict = fromDict

    def __str__(self):
        return self.value

    def __repr__(self):
        return "%s(%s)" % (type(self).__name__, repr(self.value))

    def __hash__(self):
        return hash(str(self))

    def __eq__(self, other):
        return type(other) is type(self) and other.value == self.value

    def __ne__(self, other):
        return not self.__eq__(other)


class Literal:
    def __init__(self, value, lang=None):
        if not isinstance(value, str):
            raise ValueError("Expected a stringlike object")
        self.value = value
        self.lang = lang

    @classmethod
    def fromDict(cls, valueDict):
        return cls(value=valueDict["value"], lang=valueDict.get("xml:lang", None))

    from_dict = fromDict

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
        return hash(str(self))

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and self.value == other.value
            and other.lang == self.lang
        )

    def __ne__(self, other):
        return not self.__eq__(other)


def node_from_dict(valueDict):
    """Dispatch a SPARQL-JSON binding dict to the right node class."""
    kind = valueDict["type"]
    if kind == "uri":
        return Uri.fromDict(valueDict)
    if kind == "bnode":
        return BNode.fromDict(valueDict)
    if kind in ("literal", "typed-literal"):
        return Literal.fromDict(valueDict)
    raise ValueError("unknown SPARQL-JSON binding type %r" % kind)
