"""Pipeline metrics: one-aggregation summaries that ship with every run
(SURVEY.md §7 step 7 — the checkpoint manifest carries per-bucket counts
and lineage; these are the run-level rollups).

All metrics are single-pass aggregations over already-materialized
DataFrames — cheap relative to the pipeline, and the numbers a 100 TB
operator actually watches: triple volume by predicate family, entity
counts, canonicalization compression, mention yield.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triples_by_predicate(triples: DataFrame) -> DataFrame:
    """(pred, n) — the shape of the graph; skew in this table is the
    early-warning signal for hot-key handling."""
    return triples.groupBy("pred").agg(F.count("*").alias("n"))


def kind_histogram(triples: DataFrame) -> DataFrame:
    """(obj_kind, n) — uri/bnode/literal balance."""
    return triples.groupBy("obj_kind").agg(F.count("*").alias("n"))


def canonicalization_stats(canon: DataFrame) -> DataFrame:
    """One row: surfaces in, canonical entities out, merged count —
    the compression the MinHash+CC stage achieved."""
    return canon.agg(
        F.count("*").alias("n_surfaces"),
        F.countDistinct("canonical_key").alias("n_entities"),
        F.sum((F.col("surface_key") != F.col("canonical_key")).cast("long"))
        .alias("n_merged"))


def mention_yield(mentions: DataFrame, n_turns: int) -> DataFrame:
    """One row: mentions, distinct surfaces, conversations touched, and
    mentions-per-1000-turns (detector yield)."""
    return mentions.agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct("surface_key").alias("n_surfaces"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.round(F.count("*") * 1000.0 / F.lit(n_turns), 2)
        .alias("mentions_per_1k_turns"))


def run_metrics(result, n_turns: int) -> dict:
    """Collect the run-level metrics of a PipelineResult into one dict
    (driver-side; each value is a tiny aggregation job)."""
    canon_row = canonicalization_stats(result.canonical_map).first()
    yield_row = mention_yield(result.mentions, n_turns).first()
    kinds = {r.obj_kind: r.n for r in kind_histogram(result.triples).collect()}
    return {
        "n_surfaces": canon_row.n_surfaces,
        "n_entities": canon_row.n_entities,
        "n_merged": canon_row.n_merged,
        "n_mentions": yield_row.n_mentions,
        "n_convs": yield_row.n_convs,
        "mentions_per_1k_turns": yield_row.mentions_per_1k_turns,
        "triples_by_kind": kinds,
    }
