"""owl:sameAs canonicalization ("smushing") — materialize the canonical
graph implied by entity-resolution links.

The reference models plain graphs and leaves identity resolution to
callers (no counterpart in /root/reference); in a KG-construction
pipeline the canonicalization stage (kg/canonicalize.py) or an external
linker emits ``owl:sameAs`` links, and every downstream consumer wants
ONE node per real-world entity.  This operator rewrites the graph so
each sameAs-equivalence class collapses onto a single deterministic
representative (the min IRI of its component — the same min-label
discipline as ``kg.canonicalize.connected_components``).

Scale shape: sameAs links are a tiny fraction of a 100-TB corpus, so
the connected-components run touches ONLY the link relation (adaptive
driver-local union-find under a size gate, alternating large/small-star
above it).  The corpus itself sees exactly two equi-joins against the
alias->canonical map (subject-side and object-side) — AQE broadcasts
the map when it fits, otherwise they are plain shuffled hash joins
keyed on subj / obj_value — plus the one final set-semantics dedup
(rewriting can collide distinct rows).  The corpus is never iterated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

_COLS = ["subj", "pred", "obj_value", "obj_kind", "obj_lang"]


def sameas_mapping(triples: DataFrame,
                   local_threshold: int = 1_000_000) -> DataFrame:
    """(alias, canonical) for every IRI that is NOT its own
    representative, from the ``owl:sameAs`` links in ``triples``.
    Symmetry and transitivity are supplied by the components run, so
    one-directional link emission is fine."""
    from ..kg.canonicalize import connected_components

    links = (triples
             .filter((F.col("pred") == OWL_SAMEAS)
                     & (F.col("obj_kind") == "uri")
                     & (F.col("subj") != F.col("obj_value")))
             .select(F.col("subj").alias("a"),
                     F.col("obj_value").alias("b")))
    comp = connected_components(links, local_threshold=local_threshold)
    return (comp.filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias("alias"),
                    F.col("component").alias("canonical")))


def sameas_canonicalize(triples: DataFrame,
                        keep_links: bool = False,
                        rewrite_predicates: bool = False,
                        local_threshold: int = 1_000_000) -> DataFrame:
    """Rewrite ``triples`` onto sameAs-canonical identifiers.

    - subjects and uri-kind objects map alias -> canonical (literals are
      never touched even if their lexical form collides with an alias);
    - the ``owl:sameAs`` rows themselves are dropped from the output —
      with ``keep_links=True`` they are re-emitted in normalized
      ``canonical owl:sameAs alias`` form (full provenance: one row per
      absorbed alias, so the rewrite is losslessly invertible);
    - ``rewrite_predicates=True`` additionally maps the predicate column
      (owl:sameAs between properties is rare but legal).

    Output is set-semantics deduplicated: distinct input rows that
    become equal after rewriting collapse, same as ``Graph.addTriple``'s
    set-insert discipline (reference graph.py:45-58).
    """
    mapping = sameas_mapping(triples, local_threshold=local_threshold)
    data = triples.select(*_COLS).filter(F.col("pred") != OWL_SAMEAS)

    m_subj = mapping.select(F.col("alias").alias("subj"),
                            F.col("canonical").alias("_canon_s"))
    m_obj = mapping.select(F.col("alias").alias("obj_value"),
                           F.col("canonical").alias("_canon_o"))
    out = (data
           .join(m_subj, "subj", "left")
           .join(m_obj, "obj_value", "left")
           .select(
               F.coalesce("_canon_s", "subj").alias("subj"),
               F.col("pred"),
               F.when((F.col("obj_kind") == "uri")
                      & F.col("_canon_o").isNotNull(), F.col("_canon_o"))
               .otherwise(F.col("obj_value")).alias("obj_value"),
               F.col("obj_kind"), F.col("obj_lang")))
    if rewrite_predicates:
        m_pred = mapping.select(F.col("alias").alias("pred"),
                                F.col("canonical").alias("_canon_p"))
        out = (out.join(m_pred, "pred", "left")
               .select(F.col("subj"),
                       F.coalesce("_canon_p", "pred").alias("pred"),
                       "obj_value", "obj_kind", "obj_lang"))
    if keep_links:
        out = out.unionByName(mapping.select(
            F.col("canonical").alias("subj"),
            F.lit(OWL_SAMEAS).alias("pred"),
            F.col("alias").alias("obj_value"),
            F.lit("uri").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_lang")))
    return out.dropDuplicates(_COLS)
