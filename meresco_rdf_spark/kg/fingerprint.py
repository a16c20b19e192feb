"""Bijection-safe triple-set fingerprints.

RDF graph comparison is defined up to blank-node relabeling (SURVEY.md
§2.4: bnode labels must be compared as a bijection).  These helpers
normalize bnode labels by a structural signature and hash the normalized
triple multiset, so a serialize->parse round trip (which regenerates
anonymous bnode labels) fingerprints identically to its input — used by
the ``kg_rdfxml_shards`` driver query and the committed golden oracle.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict


def normalize_bnode_labels(rows):
    """Relabel bnodes by a structural signature so two triple sets that
    differ only by a bnode bijection normalize identically.

    Signature = sorted in/out edges with bnode positions masked.  Bnodes
    with identical signatures are interchangeable under any bijection, so
    tie-breaking by original label still yields the same normalized
    multiset.  (Sufficient for graphs without bnode-bnode co-reference
    chains — the shapes this engine emits; a full canonical labeling à la
    RGDA1 is not needed.)

    rows: iterable of (subj, pred, obj_value, obj_kind, obj_lang).
    """
    sig = defaultdict(list)
    for s, p, v, k, lang in rows:
        if s.startswith("_:"):
            sig[s].append(("out", p, "\x02" if k == "bnode" else v, k, lang or ""))
        if k == "bnode":
            sig[v].append(("in", p, "\x02" if s.startswith("_:") else s, "", ""))
    order = {
        label: i for i, label in enumerate(
            sorted(sig, key=lambda b: (sorted(sig[b]), b)))
    }
    out = []
    for s, p, v, k, lang in rows:
        if s.startswith("_:"):
            s = "_:n%d" % order[s]
        if k == "bnode":
            v = "_:n%d" % order[v]
        out.append((s, p, v, k, lang))
    return sorted(out)


def triple_set_fingerprint(rows) -> str:
    """Order-insensitive, bnode-bijection-safe sha1 of a triple set."""
    normalized = normalize_bnode_labels(rows)
    basis = "\x1e".join(
        "\x1f".join("" if c is None else str(c) for c in row)
        for row in normalized)
    return hashlib.sha1(basis.encode("utf-8")).hexdigest()
