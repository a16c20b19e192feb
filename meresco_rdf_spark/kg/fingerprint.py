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


def graph_content_hashes(quads, context_col: str = "context"):
    """Distributed per-named-graph content fingerprints over a quad
    relation: one row ``(graph, n_triples, content_hash)`` per graph.

    The dataset-versioning primitive: two snapshots' graphs compare by
    (count, hash) without moving triples — change detection, graph-level
    dedup, sync protocols.  The hash is ORDER-INDEPENDENT (bit_xor of a
    per-row 60-bit md5-prefix over the canonical unit-separated term
    tuple), so it needs no per-graph sort and no collect_list — a hub
    graph with 10^9 triples never materializes in one task.  Set
    semantics are enforced first (duplicate quads would XOR-cancel):
    one dedup exchange on the full quad key, then one tiny
    ``(graph, hash)`` partial-aggregated exchange.

    Bnode labels hash as-is: for bijection-invariant comparison,
    normalize labels upstream (``normalize_bnode_labels`` per document
    at ingest — structural relabeling is document-local, never a
    distributed concern).  A NULL context (the default graph) hashes
    under the empty-string graph name.

    Content hashing, not cryptography: a 60-bit XOR fold is ample for
    versioning/change detection, but an adversary could craft
    collisions — do not use as an integrity MAC.
    """
    from pyspark.sql import functions as F

    cols = ["subj", "pred", "obj_value", "obj_kind", "obj_lang"]
    g = F.coalesce(F.col(context_col), F.lit("")).alias("graph")
    line = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c), F.lit("")) for c in cols])
    row_hash = F.conv(F.substring(F.md5(line), 1, 15), 16, 10).cast("long")
    return (quads.select(g, *cols).dropDuplicates()
            .select("graph", row_hash.alias("h"))
            .groupBy("graph")
            .agg(F.count("*").alias("n_triples"),
                 F.bit_xor("h").alias("content_hash")))
