"""Pure-Python reference implementation of the KG pipeline semantics.

Used by ``tools/make_golden.py`` to generate the committed golden parquet
under ``tests/golden/`` — the independent oracle for the driver queries
that are not ANSI-SQL-expressible (``kg_mentions``, ``kg_triples``,
``kg_canonical_map``, ``kg_entity_labels``, ``kg_rdfxml_shards``,
``stream_mention_rate``).

Independence: no code here calls into the Spark operators.  Mention
scoring is a fresh single-threaded implementation of the documented
semantics; canonicalization uses EXACT all-pairs Jaccard + union-find
(ground truth — the distributed path must not miss LSH candidates on
this input, which ``make_golden`` asserts); label resolution goes through
the local reference-semantics ``Graph.findLabel``.  Only constants
(gazetteer, vocabulary URIs) are shared.
"""

from __future__ import annotations

import hashlib
import re
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from meresco_rdf_spark.kg.extract import (  # noqa: E402  (constants only)
    CONV_URI_PREFIX,
    FOAF_NAME,
    KG_CANDIDATE,
    KG_CONVERSATION,
    KG_MENTIONS,
    KG_SCORE,
    KG_SURFACE,
    KG_TURN,
    OA_ANNOTATION,
    OWL_SAMEAS,
    RDF_TYPE,
    SKOS_ALTLABEL,
    SURFACE_URI_PREFIX,
)
from meresco_rdf_spark.sources.transcripts import GAZETTEER  # noqa: E402


# --------------------------------------------------------------------------
# mention detection (fresh implementation of the documented semantics)
# --------------------------------------------------------------------------

def ref_mentions(rows):
    """rows: iterable of (conv_id, turn_idx, text) — ANY order.  Returns
    mention dicts with cumulative within-conversation support scores under
    stable (conv_id, turn_idx) ordering."""
    aliases = sorted({a for names in GAZETTEER.values() for a in names},
                     key=lambda a: (-len(a), a))
    rx = re.compile(r"(?<![0-9A-Za-z])(?:%s)(?![0-9A-Za-z])"
                    % "|".join(re.escape(a) for a in aliases))
    out = []
    support = {}
    for conv_id, turn_idx, text in sorted(rows, key=lambda r: (r[0], r[1])):
        if not text:
            continue
        for m in rx.finditer(text):
            surface = m.group(0)
            key = re.sub(r"[^a-z0-9]+", " ", surface.lower()).strip()
            seen = support.get((conv_id, key), 0)
            out.append({
                "conv_id": conv_id, "turn_idx": int(turn_idx),
                "start": m.start(), "end": m.end(), "surface": surface,
                "surface_key": key, "score": float(len(key)) + float(seen),
            })
            support[(conv_id, key)] = seen + 1
    return out


# --------------------------------------------------------------------------
# canonicalization: exact all-pairs Jaccard (ground truth) + union-find
# --------------------------------------------------------------------------

def char_shingles(s, n=3):
    padded = " %s " % s
    if len(padded) <= n:
        return {padded}
    return {padded[i:i + n] for i in range(len(padded) - n + 1)}


def ref_canonical_map(surface_keys, threshold=0.5):
    keys = sorted(set(surface_keys))
    sh = {k: char_shingles(k) for k in keys}
    parent = {k: k for k in keys}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = sorted((ra, rb))
                    parent[hi] = lo
    out = []
    for k in keys:
        canonical = find(k)
        out.append({
            "surface_key": k, "canonical_key": canonical,
            "canonical_uri": SURFACE_URI_PREFIX + canonical.replace(" ", "-"),
        })
    return out


# --------------------------------------------------------------------------
# triple emission (pipeline_triples semantics, re-derived)
# --------------------------------------------------------------------------

def _bnode_of(conv_id, turn_idx, start):
    basis = "\x00".join([conv_id, str(turn_idx), str(start)])
    return "_:b" + hashlib.sha1(basis.encode("utf-8")).hexdigest()[:20]


def _fmt_score(score):
    return format(score, ",.1f")  # Spark format_number(score, 1)


def ref_triples(mentions, canon):
    """Canonical triple set (list of 5-tuples) from mention dicts + the
    canonical map — the unique-by-construction fan-out."""
    canon_uri = {c["surface_key"]: c["canonical_uri"] for c in canon}
    triples = set()
    conv_edges = set()
    counts = defaultdict(int)  # (canonical_uri, surface) -> n
    for m in mentions:
        b = _bnode_of(m["conv_id"], m["turn_idx"], m["start"])
        conv = CONV_URI_PREFIX + m["conv_id"]
        target = canon_uri[m["surface_key"]]
        triples.update([
            (b, RDF_TYPE, OA_ANNOTATION, "uri", None),
            (b, KG_SURFACE, m["surface"], "literal", None),
            (b, KG_TURN, str(m["turn_idx"]), "literal", None),
            (b, KG_SCORE, _fmt_score(m["score"]), "literal", None),
            (b, KG_CONVERSATION, conv, "uri", None),
            (b, KG_CANDIDATE, target, "uri", None),
        ])
        conv_edges.add((conv, KG_MENTIONS, target, "uri", None))
        counts[(target, m["surface"])] += 1
    triples |= conv_edges

    by_entity = defaultdict(dict)
    for (uri, surface), n in counts.items():
        by_entity[uri][surface] = n
    for uri, surfaces in by_entity.items():
        best = min(surfaces, key=lambda s: (-surfaces[s], s))
        triples.add((uri, FOAF_NAME, best, "literal", None))
        for surface in surfaces:
            if surface != best:
                triples.add((uri, SKOS_ALTLABEL, surface, "literal", None))

    for c in canon:
        if c["surface_key"] != c["canonical_key"]:
            from_uri = SURFACE_URI_PREFIX + c["surface_key"].replace(" ", "-")
            triples.add((from_uri, OWL_SAMEAS, c["canonical_uri"], "uri", None))
    return sorted(triples)


# --------------------------------------------------------------------------
# label resolution via the local reference-semantics Graph
# --------------------------------------------------------------------------

def ref_entity_labels(triples):
    from meresco_rdf_spark.graph import Graph
    from meresco_rdf_spark.model import row_to_node

    g = Graph()
    for s, p, v, k, lang in triples:
        g.addTriple(s, p, row_to_node(v, k, lang))
    out = []
    for subj in sorted({s for s, *_ in triples}):
        label = g.findLabel(subj)
        if label is not None:
            out.append({"subj": subj, "label_value": label.value,
                        "label_lang": label.lang})
    return out


# --------------------------------------------------------------------------
# per-conversation shard fingerprints (bnode-bijection-safe; the
# fingerprint helper is shared infrastructure, imported from the package)
# --------------------------------------------------------------------------

from meresco_rdf_spark.kg.fingerprint import (  # noqa: E402
    triple_set_fingerprint,
)


def ref_shards(triples):
    """(shard, n_triples, fp) per conversation — the expected content of
    each RDF/XML shard, fingerprinted bijection-safely (the serializer
    may relabel inlined/anonymous bnodes on the way through XML)."""
    conv_of = {}
    for s, p, v, k, lang in triples:
        if p == KG_CONVERSATION:
            conv_of[s] = v
    by_shard = defaultdict(list)
    for row in triples:
        s = row[0]
        if s.startswith("_:"):
            by_shard[conv_of[s]].append(row)
        elif s.startswith(CONV_URI_PREFIX):
            by_shard[s].append(row)
    return [
        {"shard": shard, "n_triples": len(rows),
         "fp": triple_set_fingerprint(rows)}
        for shard, rows in sorted(by_shard.items())
    ]


def ref_stream_triples(mentions):
    """Triple set the STREAMING emission path converges to (list of
    5-tuples): the stateless ``mention_triples`` fan-out — raw surface
    URIs (no canonical map exists mid-stream) and score pinned to 0.0 —
    deduplicated with set semantics, exactly what the incremental MERGE
    sink accumulates regardless of micro-batch slicing."""
    triples = set()
    for m in mentions:
        b = _bnode_of(m["conv_id"], m["turn_idx"], m["start"])
        conv = CONV_URI_PREFIX + m["conv_id"]
        surf = SURFACE_URI_PREFIX + m["surface_key"].replace(" ", "-")
        triples.update([
            (b, RDF_TYPE, OA_ANNOTATION, "uri", None),
            (b, KG_SURFACE, m["surface"], "literal", None),
            (b, KG_TURN, str(m["turn_idx"]), "literal", None),
            (b, KG_SCORE, "0.0", "literal", None),
            (b, KG_CONVERSATION, conv, "uri", None),
            (b, KG_CANDIDATE, surf, "uri", None),
            (conv, KG_MENTIONS, surf, "uri", None),
        ])
    return sorted(triples)


def ref_structure_triples(rows):
    """rows: (conv_id, turn_idx, role, tool) — transcript-structure
    triples: distinct conv->tool edges + per-conversation turn counts."""
    from meresco_rdf_spark.kg.extract import (
        KG_TURN_COUNT,
        KG_USED_TOOL,
        TOOL_URI_PREFIX,
    )

    tools = set()
    counts = defaultdict(int)
    for conv_id, _turn_idx, _role, tool in rows:
        counts[conv_id] += 1
        if tool is not None:
            tools.add((conv_id, tool))
    triples = {
        (CONV_URI_PREFIX + c, KG_USED_TOOL, TOOL_URI_PREFIX + t, "uri", None)
        for c, t in tools
    } | {
        (CONV_URI_PREFIX + c, KG_TURN_COUNT, str(n), "literal", None)
        for c, n in counts.items()
    }
    return sorted(triples)


# --------------------------------------------------------------------------
# streaming mention-rate windows (exact)
# --------------------------------------------------------------------------

def ref_mention_rate(rows, window_seconds=3600):
    """rows: (conv_id, turn_idx, text, ts_epoch_seconds).  Exact hourly
    tumbling-window mention counts + distinct conversations per surface."""
    mentions = []
    ts_of = {(c, t): ts for c, t, _, ts in rows}
    for m in ref_mentions([(c, t, x) for c, t, x, _ in rows]):
        mentions.append((m["surface_key"], m["conv_id"],
                         ts_of[(m["conv_id"], m["turn_idx"])]))
    agg = defaultdict(lambda: [0, set()])
    for key, conv, ts in mentions:
        wstart = (int(ts) // window_seconds) * window_seconds
        cell = agg[(wstart, key)]
        cell[0] += 1
        cell[1].add(conv)
    return [
        {"window_start": ws, "window_end": ws + window_seconds,
         "surface_key": key, "n_mentions": n, "n_convs": len(convs)}
        for (ws, key), (n, convs) in sorted(agg.items())
    ]


def ref_bpe_merges(texts, n_merges=10, min_count=2):
    """Pure-Python BPE trainer (greedy left-to-right fold semantics —
    the same contract textops/bpe.py implements with F.aggregate).
    Returns [(rank, left, right, n)]."""
    corpus = []
    for text in texts:
        for w in text.lower().split():
            syms = list(w)
            syms[-1] = syms[-1] + "</w>"
            corpus.append(syms)
    merges = []
    for rank in range(n_merges):
        counts = {}
        for syms in corpus:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (left, right), n = min(counts.items(),
                               key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((rank, left, right, n))
        nxt = []
        for syms in corpus:
            out = []
            for t in syms:
                if out and out[-1] == left and t == right:
                    out[-1] = left + right
                else:
                    out.append(t)
            nxt.append(out)
        corpus = nxt
    return merges


def ref_bpe_tokens(rows, merges):
    """Apply a trained merge list per (conv_id, turn_idx) text row —
    the reference for textops/bpe.py::apply_bpe."""
    out = []
    for conv_id, turn_idx, text in rows:
        toks = []
        for w in text.lower().split():
            syms = list(w)
            syms[-1] = syms[-1] + "</w>"
            for _, left, right, _n in merges:
                nxt = []
                for t in syms:
                    if nxt and nxt[-1] == left and t == right:
                        nxt[-1] = left + right
                    else:
                        nxt.append(t)
                syms = nxt
            toks.extend(syms)
        out.append((conv_id, turn_idx, toks))
    return out
