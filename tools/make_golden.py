"""Generate the committed golden parquet oracles under ``tests/golden/``.

Runs the PURE-PYTHON reference pipeline (tools/golden_ref.py) over the
seeded synthetic transcript input (the only shared piece — the input
itself), writes one parquet per rows-only driver query, then
cross-checks every file against the live Spark query output and fails
loudly on any divergence.

Usage: python tools/make_golden.py [--no-check]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import golden_ref as ref  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden")

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()), ("pred", pa.string()), ("obj_value", pa.string()),
    ("obj_kind", pa.string()), ("obj_lang", pa.string()),
])


def write(name: str, table: pa.Table) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    pq.write_table(table, os.path.join(GOLDEN_DIR, name + ".parquet"))
    print("wrote %s.parquet  (%d rows)" % (name, table.num_rows))


def main() -> None:
    check = "--no-check" not in sys.argv

    from meresco_rdf_spark.session import get_spark
    from meresco_rdf_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # the seeded input of the kg_*/stream driver queries (entry_queries.
    # _synth_transcripts): 120 conversations x 8 turns
    collected = synthesize_transcripts(spark, 120, 8).collect()
    input_rows = [
        (r.conv_id, r.turn_idx, r.text, int(r.ts.timestamp()))
        for r in collected
    ]
    structure_rows = [
        (r.conv_id, r.turn_idx, r.role, r.tool) for r in collected
    ]

    # ---- pure-Python reference pipeline -------------------------------
    mentions = ref.ref_mentions([(c, t, x) for c, t, x, _ in input_rows])
    canon = ref.ref_canonical_map({m["surface_key"] for m in mentions})
    triples = ref.ref_triples(mentions, canon)
    labels = ref.ref_entity_labels(triples)
    shards = ref.ref_shards(triples)
    rates = ref.ref_mention_rate(input_rows)
    stream_triples = ref.ref_stream_triples(mentions)
    structure = ref.ref_structure_triples(structure_rows)
    bpe = ref.ref_bpe_merges([x for _, _, x, _ in input_rows],
                             n_merges=10, min_count=2)
    bpe_tokens = ref.ref_bpe_tokens(
        [(c, t, x) for c, t, x, _ in input_rows], bpe)

    write("kg_mentions", pa.table({
        "conv_id": pa.array([m["conv_id"] for m in mentions], pa.string()),
        "turn_idx": pa.array([m["turn_idx"] for m in mentions], pa.int32()),
        "start": pa.array([m["start"] for m in mentions], pa.int32()),
        "end": pa.array([m["end"] for m in mentions], pa.int32()),
        "surface": pa.array([m["surface"] for m in mentions], pa.string()),
        "surface_key": pa.array([m["surface_key"] for m in mentions], pa.string()),
        "score": pa.array([m["score"] for m in mentions], pa.float64()),
    }))
    write("kg_triples", pa.Table.from_arrays(
        [pa.array([t[i] for t in triples], pa.string()) for i in range(5)],
        schema=TRIPLE_SCHEMA))
    write("kg_canonical_map", pa.table({
        "surface_key": pa.array([c["surface_key"] for c in canon], pa.string()),
        "canonical_key": pa.array([c["canonical_key"] for c in canon], pa.string()),
        "canonical_uri": pa.array([c["canonical_uri"] for c in canon], pa.string()),
    }))
    write("kg_entity_labels", pa.table({
        "subj": pa.array([r["subj"] for r in labels], pa.string()),
        "label_value": pa.array([r["label_value"] for r in labels], pa.string()),
        "label_lang": pa.array([r["label_lang"] for r in labels], pa.string()),
    }))
    write("kg_rdfxml_shards", pa.table({
        "shard": pa.array([s["shard"] for s in shards], pa.string()),
        "n_triples": pa.array([s["n_triples"] for s in shards], pa.int64()),
        "fp": pa.array([s["fp"] for s in shards], pa.string()),
    }))
    write("stream_merge_triples", pa.Table.from_arrays(
        [pa.array([t[i] for t in stream_triples], pa.string())
         for i in range(5)],
        schema=TRIPLE_SCHEMA))
    write("kg_structure_triples", pa.Table.from_arrays(
        [pa.array([t[i] for t in structure], pa.string())
         for i in range(5)],
        schema=TRIPLE_SCHEMA))
    write("text_bpe", pa.table({
        "rank": pa.array([m[0] for m in bpe], pa.int32()),
        "left": pa.array([m[1] for m in bpe], pa.string()),
        "right": pa.array([m[2] for m in bpe], pa.string()),
        "n": pa.array([m[3] for m in bpe], pa.int64()),
    }))
    tok_rows = [(c, t, i, tok) for c, t, toks in bpe_tokens
                for i, tok in enumerate(toks)]
    write("text_bpe_tokens", pa.table({
        "conv_id": pa.array([r[0] for r in tok_rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in tok_rows], pa.int32()),
        "pos": pa.array([r[2] for r in tok_rows], pa.int32()),
        "token": pa.array([r[3] for r in tok_rows], pa.string()),
    }))
    write("stream_mention_rate", pa.table({
        "window_start": pa.array([r["window_start"] for r in rates], pa.int64()),
        "window_end": pa.array([r["window_end"] for r in rates], pa.int64()),
        "surface_key": pa.array([r["surface_key"] for r in rates], pa.string()),
        "n_mentions": pa.array([r["n_mentions"] for r in rates], pa.int64()),
        "n_convs": pa.array([r["n_convs"] for r in rates], pa.int64()),
    }))

    if not check:
        spark.stop()
        return

    # ---- cross-check: Spark query output == golden multiset -----------
    import duckdb

    from meresco_rdf_spark.entry_queries import QUERIES

    con = duckdb.connect()
    failures = []
    for name in ("kg_mentions", "kg_triples", "kg_canonical_map",
                 "kg_entity_labels", "kg_rdfxml_shards",
                 "stream_mention_rate", "stream_merge_triples",
                 "kg_structure_triples", "text_bpe",
                 "text_bpe_tokens"):
        sdf = QUERIES[name](spark, "/root/testdata/sf0.01")
        s_cols = sorted(sdf.columns)
        s_rows = sorted(
            tuple(str(row[c]) for c in s_cols) for row in sdf.collect())
        res = con.execute(
            "SELECT * FROM read_parquet('%s')"
            % os.path.join(GOLDEN_DIR, name + ".parquet"))
        o_cols = [d[0] for d in res.description]
        order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
        o_rows = sorted(
            tuple(str(row[i]) for i in order) for row in res.fetchall())
        ok = s_rows == o_rows and sorted(o_cols) == s_cols
        print("%-22s %s (spark=%d golden=%d)"
              % (name, "MATCH" if ok else "DIVERGED", len(s_rows), len(o_rows)))
        if not ok:
            failures.append(name)
            for a, b in list(zip(s_rows, o_rows))[:200]:
                if a != b:
                    print("  spark : %s\n  golden: %s" % (a, b))
                    break

    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
