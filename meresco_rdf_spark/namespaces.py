"""Namespace / CURIE table.

Replaces the reference's external ``meresco.xml.namespaces`` dependency
(used by ``meresco/rdf/graph/graph.py:34``, ``_uris.py:28-35``,
``triples2rdfxml.py:36``) with a self-contained table of the standard,
publicly defined prefixes the reference exercises (SURVEY.md §1.3).

Supports:
- attribute access: ``ns.rdfs`` -> namespace URI
- ``curie_to_uri('rdfs:label')`` / ``uri_to_curie(uri)`` (longest match)
- ``curie_to_tag`` / ``tag_to_curie`` for ElementTree ``{uri}local`` tags
- ``copy_update({...})`` -> extended table (reference ``copyUpdate``)
- mapping access for test fixtures: ``'%(xmlns_rdf)s' % ns`` expands to an
  ``xmlns:rdf="..."`` declaration, as the reference test suite does.

camelCase aliases (``curieToUri`` etc.) are provided for API parity with
the reference.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Iterator

DEFAULT_PREFIXES: dict[str, str] = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "dc": "http://purl.org/dc/elements/1.1/",
    "dcterms": "http://purl.org/dc/terms/",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "oa": "http://www.w3.org/ns/oa#",
    "geo": "http://www.w3.org/2003/01/geo/wgs84_pos#",
    "bibo": "http://purl.org/ontology/bibo/",
    "schema": "http://schema.org/",
    "prov": "http://www.w3.org/ns/prov#",
    "xml": "http://www.w3.org/XML/1998/namespace",
    # this engine's own KG vocabulary (kg/extract.py) — present so the
    # serializer can emit pipeline triples as RDF/XML shards
    "kg": "http://data.example.org/kg#",
}


class Namespaces(Mapping):
    """Immutable prefix->namespace-URI table with CURIE helpers."""

    def __init__(self, prefixes: dict[str, str] | None = None):
        self._prefixes = dict(DEFAULT_PREFIXES if prefixes is None else prefixes)
        # longest-URI-first for uri_to_curie longest-match resolution
        self._by_uri = sorted(
            ((uri, prefix) for prefix, uri in self._prefixes.items()),
            key=lambda t: -len(t[0]),
        )

    # -- attribute access: ns.rdfs -> uri ---------------------------------
    def __getattr__(self, prefix: str) -> str:
        try:
            return self._prefixes[prefix]
        except KeyError:
            raise AttributeError(prefix) from None

    # -- mapping interface (fixture '%(xmlns_rdf)s' substitution) ----------
    def __getitem__(self, key: str) -> str:
        if key.startswith("xmlns_"):
            prefix = key[len("xmlns_"):]
            return 'xmlns:%s="%s"' % (prefix, self._prefixes[prefix])
        return self._prefixes[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._prefixes)

    def __len__(self) -> int:
        return len(self._prefixes)

    def prefixes(self) -> dict[str, str]:
        return dict(self._prefixes)

    # -- CURIE helpers ------------------------------------------------------
    def curie_to_uri(self, curie: str) -> str:
        prefix, _, local = curie.partition(":")
        return self._prefixes[prefix] + local

    def curie_to_tag(self, curie: str) -> str:
        """CURIE -> ElementTree tag form ``{namespace-uri}local``."""
        prefix, _, local = curie.partition(":")
        return "{%s}%s" % (self._prefixes[prefix], local)

    def uri_to_curie(self, uri: str) -> str:
        for ns_uri, prefix in self._by_uri:
            if uri.startswith(ns_uri):
                return "%s:%s" % (prefix, uri[len(ns_uri):])
        raise KeyError("no namespace prefix declared for %r" % uri)

    def tag_to_curie(self, tag: str) -> str:
        if tag.startswith("{"):
            ns_uri, _, local = tag[1:].partition("}")
            return self.uri_to_curie(ns_uri + local)
        return self.uri_to_curie(tag)

    def copy_update(self, extra: dict[str, str]) -> "Namespaces":
        merged = dict(self._prefixes)
        merged.update(extra)
        return Namespaces(merged)

    # camelCase parity with the reference API
    curieToUri = curie_to_uri
    curieToTag = curie_to_tag
    uriToCurie = uri_to_curie
    tagToCurie = tag_to_curie
    copyUpdate = copy_update


namespaces = Namespaces()

curie_to_uri = namespaces.curie_to_uri
curie_to_tag = namespaces.curie_to_tag
uri_to_curie = namespaces.uri_to_curie
tag_to_curie = namespaces.tag_to_curie
curieToUri = namespaces.curie_to_uri
curieToTag = namespaces.curie_to_tag
