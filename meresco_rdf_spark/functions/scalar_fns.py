"""The reference's scalar functions as vectorized Spark column
expressions (SURVEY.md §2.5: unicode coercion, bnode test, fragment
extraction, urijoin, curie<->uri, RFC-3987 validation, nodeID
normalization).  Everything is a pure `pyspark.sql.functions` composition
— JVM-side, codegen-friendly, no UDFs — so these run at scan speed inside
any plan.

Reference provenance per function in the docstrings (file:line of
/root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..model import IRI_REGEX
from ..namespaces import namespaces as _default_ns


def is_bnode(col: Column) -> Column:
    """``value.startswith('_:')`` (reference triples2rdfxml.py:83,96)."""
    return col.startswith("_:")


def fragment(col: Column) -> Column:
    """Fragment after the last '#', '' if none — the reference's
    ``partition('#')[-1]`` idiom (triples2rdfxml.py:114,134) returns the
    part after the FIRST '#' (URIs have at most one)."""
    return F.when(col.contains("#"),
                  F.substring_index(col, "#", -1)).otherwise(F.lit(""))


def matches_iri(col: Column) -> Column:
    """RFC-3987 IRI syntax check (reference graph/uri.py:35-44 via the
    rfc3987 package) vectorized as one anchored ``rlike`` against the
    same condensed grammar used by ``model.matches_iri_syntax``."""
    return col.rlike("^(?:%s)$" % IRI_REGEX)


def normalize_node_id(col: Column) -> Column:
    """rdf:nodeID normalization (reference rdfparser.py:75-79): ids whose
    first char is not a letter get a ``b`` prefix, then ``_:`` is
    prepended."""
    fixed = F.when(col.rlike("^[A-Za-z]"), col).otherwise(F.concat(F.lit("b"), col))
    return F.concat(F.lit("_:"), fixed)


def uri_join(base: Column, ref: Column) -> Column:
    """RFC-3986 reference resolution for the cases the reference's parser
    exercises via ``urljoin`` (rdfparser.py:92-94,133): absolute refs pass
    through; ``#frag`` appends to the defragmented base; ``/path``
    replaces the path; other relative refs resolve against the base's
    directory.  (Dot-segment normalization is not needed for the
    reference's fixtures and is left to the full parser path.)"""
    scheme_abs = ref.rlike("^[A-Za-z][A-Za-z0-9+.-]*:")
    base_nofrag = F.when(base.contains("#"),
                         F.substring_index(base, "#", 1)).otherwise(base)
    authority = F.regexp_extract(base_nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    base_dir = F.regexp_replace(
        F.when(base_nofrag.contains("?"),
               F.substring_index(base_nofrag, "?", 1)).otherwise(base_nofrag),
        "[^/]*$", "")
    return (
        F.when(scheme_abs, ref)
        .when(ref.startswith("#"), F.concat(base_nofrag, ref))
        .when(ref.startswith("/"), F.concat(authority, ref))
        .when(ref == "", base_nofrag)
        .otherwise(F.concat(base_dir, ref))
    )


def curie_to_uri_col(col: Column, ns=None) -> Column:
    """CURIE -> URI expansion over the (broadcast-literal) namespace
    table (reference graph.py:76-77 via namespaces.curieToUri)."""
    ns = ns or _default_ns
    expr = col  # unknown prefixes pass through unchanged
    for prefix, uri in ns.prefixes().items():
        local = col.substr(F.lit(len(prefix) + 2), F.length(col))
        expr = F.when(col.startswith(prefix + ":"),
                      F.concat(F.lit(uri), local)).otherwise(expr)
    return expr


def uri_to_curie_col(col: Column, ns=None) -> Column:
    """URI -> CURIE by longest-prefix match (namespaces.py semantics)."""
    ns = ns or _default_ns
    pairs = sorted(ns.prefixes().items(), key=lambda kv: -len(kv[1]))
    expr = col
    for prefix, uri in reversed(pairs):  # build inside-out so the
        # longest namespace URI ends up as the outermost (winning) branch
        local = col.substr(F.lit(len(uri) + 1), F.length(col))
        expr = F.when(col.startswith(uri),
                      F.concat(F.lit(prefix + ":"), local)).otherwise(expr)
    return expr
