"""Local in-memory Graph with reference-exact semantics.

This is the small-scale anchor for fixture parity (reference
``meresco/rdf/graph/graph.py:40-143``): a set of (s, p, o) triples under an
8-way exhaustive mask index, set semantics on add, masked O(1) lookup,
priority label resolution, and backtracking BGP matching.  The distributed
equivalents live in ``operators.graph_ops`` — this class exists so the
serializer / parser / tests can run per-document inside executors (the
per-document graphs are tiny) and so semantics can be asserted against the
reference's own test cases.

Deliberate deterministic refinements vs the reference (SURVEY.md §2.4):
- ``literalValue`` picks min by (pred, value) instead of set-iteration order.
- ``findLabel`` tie-breaks deterministically within a (priority, lang) rank.
Both only affect cases the reference leaves undefined.
"""

from __future__ import annotations

from itertools import product
from typing import Iterable, Iterator, Optional

from .model import LABEL_PREDICATES, Literal, Uri
from .namespaces import namespaces as default_namespaces


def _as_str(value) -> Optional[str]:
    """unicode-or-None coercion (reference graph.py:142-143)."""
    return None if value is None else str(value)


def unique(iterable, key=None):
    """Order-preserving streaming dedup (reference _utils.py:26-30)."""
    seen = set()
    for item in iterable:
        marker = item if key is None else key(item)
        if marker not in seen:
            seen.add(marker)
            yield item


class Graph:
    """Triple multigraph; every triple is indexed under all 2^3 masks
    (reference graph.py:45-51) so any bound/unbound pattern is one dict hit.
    """

    def __init__(self, namespaces=None):
        self._index: dict[tuple, set] = {}
        self.namespaces = namespaces or default_namespaces

    # -- mutation ----------------------------------------------------------

    def addTriple(self, subject, predicate, object):
        subject, predicate = _as_str(subject), _as_str(predicate)
        triple = (subject, predicate, object)
        for mask in product((None, subject), (None, predicate), (None, object)):
            self._index.setdefault(mask, set()).add(triple)

    def addTriples(self, triples: Iterable[tuple]):
        for s, p, o in triples:
            self.addTriple(s, p, o)

    def removeTriple(self, subject, predicate, object):
        subject, predicate = _as_str(subject), _as_str(predicate)
        triple = (subject, predicate, object)
        for mask in product((None, subject), (None, predicate), (None, object)):
            bucket = self._index.get(mask)
            if bucket is None:
                continue
            bucket.discard(triple)
            if not bucket:
                # GC empty buckets so deletes don't leak index entries
                # (reference graph.py:63-68, whitebox-tested)
                del self._index[mask]

    # -- lookup -------------------------------------------------------------

    def triples(self, subject=None, predicate=None, object=None) -> list:
        return list(self._index.get((_as_str(subject), _as_str(predicate), object), ()))

    def objects(self, subject, predicate=None, curie=None) -> list:
        predicate = _as_str(predicate)
        if predicate is None and curie is not None:
            predicate = self.namespaces.curie_to_uri(curie)
        return [o for _, _, o in self.triples(subject=subject, predicate=predicate)]

    def literalValue(self, *args, **kwargs):
        """First truthy literal value; 'first' made deterministic by
        sorting (reference leaves it set-iteration-ordered, SURVEY.md §2.4).
        """
        candidates = sorted(
            (node for node in self.objects(*args, **kwargs)
             if node.isLiteral() and node.value),
            key=lambda n: (n.value, n.lang or ""),
        )
        return candidates[0].value if candidates else None

    def findLabel(self, uri, labelPredicates=None):
        """Priority label resolution (reference graph.py:85-97).

        Scans predicates in priority order; an ``nl`` label wins immediately
        (even on a lower-priority predicate than an earlier ``en`` hit);
        otherwise the first-seen label per language wins, preferring
        ``en`` then lang-less.  Within one (predicate, lang) bucket the
        reference order is undefined — we take min by value.
        """
        predicates = LABEL_PREDICATES if labelPredicates is None else labelPredicates
        first_per_lang: dict = {}
        for pred in predicates:
            hits = sorted(
                (o for _, _, o in self.triples(subject=uri, predicate=pred)),
                key=lambda n: (n.value or "", n.lang or ""),
            )
            for obj in hits:
                if obj.lang == "nl":
                    return obj
                first_per_lang.setdefault(obj.lang, obj)
        return first_per_lang.get("en") or first_per_lang.get(None)

    def __contains__(self, triple) -> bool:
        return triple in self._index

    def __iter__(self) -> Iterator[tuple]:
        return iter(self.triples())

    # -- BGP matching --------------------------------------------------------

    def matchTriplePatterns(self, *patterns):
        """Conjunctive basic-graph-pattern match (reference graph.py:102-131).

        Patterns are 3-tuples of constant / ``'?var'`` / ``None`` (wildcard,
        non-binding).  Left-to-right backtracking nested-loop join; subject/
        predicate bindings are wrapped as ``Uri`` (even for bnode labels),
        object bindings keep their node type (graph.py:121,127).  Result
        stream is deduped on the sorted binding items.
        """
        def solve(remaining, bindings):
            if not remaining:
                yield bindings
                return
            pattern, rest = remaining[0], remaining[1:]
            if len(pattern) != 3:
                raise ValueError("%r should have been a triple" % (pattern,))
            mask = list(pattern)
            var_at = {}
            for pos, term in enumerate(pattern):
                if isinstance(term, str) and term.startswith("?"):
                    name = term[1:]
                    var_at[pos] = name
                    bound = bindings.get(name)
                    # bound vars reused in s/p position unwrap to .value
                    mask[pos] = (
                        getattr(bound, "value", bound) if pos < 2 else bound
                    )
            for triple in self.triples(*mask):
                extended = dict(bindings)
                for pos, name in var_at.items():
                    extended[name] = Uri(triple[pos]) if pos < 2 else triple[pos]
                yield from solve(rest, extended)

        def binding_key(b):
            return tuple(sorted(
                (k, type(v).__name__, getattr(v, "value", v),
                 getattr(v, "lang", None) or "")
                for k, v in b.items()))

        return unique(solve(tuple(patterns), {}), key=binding_key)

    match_triple_patterns = matchTriplePatterns
    add_triple = addTriple
    add_triples = addTriples
    remove_triple = removeTriple
    literal_value = literalValue
    find_label = findLabel
