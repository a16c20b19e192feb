"""Tests for training-data operators: dedup, similarity, text analysis,
multimodal plumbing — including DuckDB parity spot-checks for the
oracle-checkable ones."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from meresco_rdf_spark.textops.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
    simhash_fingerprints,
    word_shingles,
)
from meresco_rdf_spark.textops.multimodal import (
    extract_features,
    fake_feature,
    synthesize_media,
)
from meresco_rdf_spark.textops.similarity import (
    cosine_pairs,
    cosine_topk,
    lsh_topk,
)
from meresco_rdf_spark.textops.textstats import (
    fingerprint,
    lang_id,
    quality_features,
    token_count,
)

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog again and again"),
    (2, "The quick brown fox jumps over the lazy dog again and again"),  # exact dup
    (3, "The quick brown fox jumps over the lazy cat again and again"),  # near dup
    (4, "Der Hund und die Katze sind nicht mit der Maus"),
    (5, "completely different words about spark engines and tables"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string").cache()


class TestTextStats:
    def test_token_count_and_fingerprint(self, spark, docs):
        rows = {r.doc_id: (r.n, r.fp) for r in docs.select(
            "doc_id", token_count(F.col("text")).alias("n"),
            fingerprint(F.col("text")).alias("fp")).collect()}
        assert rows[1][0] == 12
        assert rows[1][1] == rows[2][1]
        assert rows[1][1] != rows[3][1]

    def test_fingerprint_matches_duckdb(self, spark, docs):
        got = {r.doc_id: r.fp for r in docs.select(
            "doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
        for doc_id, text in DOCS:
            expect = duckdb.sql(
                "select md5(trim(regexp_replace(lower(?), '[^a-z0-9]+', ' ', 'g')))",
                params=[text]).fetchone()[0]
            assert got[doc_id] == expect

    def test_lang_id(self, spark, docs):
        rows = {r.doc_id: r.lang for r in docs.select(
            "doc_id", lang_id(F.col("text")).alias("lang")).collect()}
        assert rows[1] == "en"
        assert rows[4] == "de"

    def test_quality_features(self, spark, docs):
        rows = {r.doc_id: r for r in quality_features(docs).collect()}
        assert rows[1].n_tokens == 12
        assert rows[1].quality_score >= 3
        assert rows[1].n_distinct == 10  # 'the' and 'again' repeat


class TestDedup:
    def test_exact_dedup_keeps_min_id(self, spark, docs):
        rows = {r.doc_id: r.keep for r in exact_dedup(docs).collect()}
        assert rows == {1: True, 2: False, 3: True, 4: True, 5: True}

    def test_ngram_jaccard_finds_near_dup(self, spark, docs):
        pairs = {(r.a, r.b): r.jaccard
                 for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
        assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
        assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
        assert not any({a, b} & {4, 5} for a, b in pairs)

    def test_minhash_pairs_both_hash_paths(self, spark, docs):
        for fn in ("xx", "md5"):
            pairs = {(r.a, r.b) for r in minhash_dedup_pairs(
                docs, threshold=0.5, hash_fn=fn).collect()}
            assert (1, 2) in pairs
            assert not any({a, b} & {4, 5} for a, b in pairs)

    def test_dedup_clusters_transitive_and_singletons(self, spark, docs):
        # A~B (exact dup) and A~C (near dup) pair; even if B~C were never
        # a candidate pair, all three must land in ONE cluster with the
        # min id canonical; 4 and 5 stay their own keepers
        from meresco_rdf_spark.textops.dedup import minhash_dedup_clusters

        rows = {r.doc_id: (r.canonical_id, r.keep)
                for r in minhash_dedup_clusters(
                    docs, threshold=0.5, hash_fn="xx").collect()}
        assert set(rows) == {1, 2, 3, 4, 5}
        assert rows[1] == (1, True)
        assert rows[2] == (1, False)
        assert rows[3] == (1, False)
        assert rows[4] == (4, True)
        assert rows[5] == (5, True)

    def test_dedup_clusters_chain_via_explicit_pairs(self, spark):
        # pure chain a-b, b-c with int ids: connected components must
        # collapse the chain; the untouched doc keeps itself; both the
        # driver union-find and the distributed path agree
        from meresco_rdf_spark.kg.canonicalize import connected_components
        from meresco_rdf_spark.textops.dedup import dedup_clusters

        docs = spark.createDataFrame(
            [(i,) for i in (10, 20, 30, 40)], "doc_id long")
        pairs = spark.createDataFrame([(20, 30), (10, 20)], "a long, b long")
        expect = {10: (10, True), 20: (10, False),
                  30: (10, False), 40: (40, True)}
        got = {r.doc_id: (r.canonical_id, r.keep)
               for r in dedup_clusters(docs, pairs).collect()}
        assert got == expect
        # distributed components path preserves the long node type too
        comp = connected_components(pairs, local_threshold=0)
        assert dict((r.node, r.component) for r in comp.collect()) == \
            {10: 10, 20: 10, 30: 10}
        assert comp.schema["node"].dataType.typeName() == "long"

    def test_simhash_identical_for_dups_and_hamming(self, spark, docs):
        fp = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
        assert fp[1] == fp[2]
        assert len(fp[1]) == 32 and set(fp[1]) <= {"0", "1"}
        pairs = {(r.a, r.b): r.hamming
                 for r in simhash_dup_pairs(docs, max_hamming=6).collect()}
        assert pairs[(1, 2)] == 0
        assert (1, 3) in pairs  # one word changed -> small hamming

    def test_simhash_matches_duckdb(self, spark, docs):
        got = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
        bit_exprs = ", ".join(
            "case when list_sum(list_transform(toks, x -> case when "
            "substr(md5(x), %d, 1) in ('8','9','a','b','c','d','e','f') "
            "then 1 else -1 end)) >= 0 then '1' else '0' end" % (j + 1)
            for j in range(32))
        sql = (
            "with t as (select doc_id, list_filter(string_split(trim("
            "regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), "
            "x -> x != '') as toks from docs) "
            "select doc_id, concat(%s) as simhash from t" % bit_exprs)
        con = duckdb.connect()
        con.execute("create table docs as select * from (values %s) t(doc_id, text)"
                    % ", ".join("(%d, '%s')" % (i, t) for i, t in DOCS))
        expect = {r[0]: r[1] for r in con.execute(sql).fetchall()}
        assert got == expect


class TestSynthDocs:
    def test_deterministic_and_parallelism_independent(self, spark):
        from meresco_rdf_spark.sources.synth_docs import synthesize_documents

        a = {r.doc_id: r.text
             for r in synthesize_documents(spark, 200, partitions=1).collect()}
        b = {r.doc_id: r.text
             for r in synthesize_documents(spark, 200, partitions=7).collect()}
        assert a == b and len(a) == 200

    def test_dup_lanes_match_head(self, spark):
        from pyspark.sql import functions as F

        from meresco_rdf_spark.sources.synth_docs import synthesize_documents

        docs = synthesize_documents(spark, 2000)
        lanes = docs.withColumn(
            "lane", F.pmod(F.xxhash64("doc_id", F.lit("dup")), F.lit(10)))
        rows = lanes.collect()
        text = {r.doc_id: r.text for r in rows}
        n_exact = n_near = 0
        for r in rows:
            head = (r.doc_id // 10) * 10
            if r.doc_id % 10 == 0 or r.lane >= 3:
                continue
            if r.lane <= 1:
                assert r.text == text[head]
                n_exact += 1
            else:
                assert r.text.startswith(text[head] + " ")
                assert len(r.text.split()) == len(text[head].split()) + 1
                n_near += 1
        assert n_exact > 100 and n_near > 50


class TestSimilarity:
    def _vecs(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
            (4, [1.0, 0.01, 0.0, 0.0]),
        ]
        return spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    def test_cosine_topk_exact(self, spark):
        v = self._vecs(spark)
        q = v.filter(F.col("vec_id") == 0).withColumnRenamed("vec_id", "query_id")
        got = cosine_topk(v, q, k=2).collect()
        assert [(r.neighbor_id, r.rank) for r in got] == [(4, 1), (1, 2)]
        expect = 0.9 / math.sqrt(0.81 + 0.01)
        assert abs(got[1].cos - round(expect, 6)) < 1e-9

    def test_lsh_topk_subset_of_exact_with_high_recall(self, spark):
        v = self._vecs(spark)
        q = v.withColumnRenamed("vec_id", "query_id")
        exact = {(r.query_id, r.neighbor_id)
                 for r in cosine_topk(v, q, k=1).collect()}
        approx = {(r.query_id, r.neighbor_id)
                  for r in lsh_topk(v, q, k=1, n_planes=8, dim=4, bands=4).collect()}
        # banding guarantees recall of near-identical vectors
        assert (0, 4) in approx
        assert approx <= {(q, n) for q in range(5) for n in range(5)}
        assert len(approx & exact) >= 3

    def test_cosine_pairs_threshold(self, spark):
        v = self._vecs(spark)
        exact = {(r.a, r.b) for r in cosine_pairs(v, threshold=0.99).collect()}
        # cos(0,1)=.99388, cos(0,4)=.99995, cos(1,4)=.99448 — all >= .99
        assert exact == {(0, 1), (0, 4), (1, 4)}
        lsh = {(r.a, r.b) for r in cosine_pairs(
            v, threshold=0.99, n_planes=8, dim=4).collect()}
        assert (0, 4) in lsh and lsh <= exact


class TestMultimodal:
    def test_feature_extraction_shapes(self, spark):
        media = synthesize_media(spark, 12)
        feats = extract_features(media, dim=8).collect()
        assert len(feats) == 12
        for r in feats:
            assert len(r.feature) == 8
            assert all(0.0 <= x <= 1.0 for x in r.feature)
            assert r.n_bytes == 32  # sha2-256 payload

    def test_fake_feature_deterministic(self):
        assert fake_feature(b"abc", 4) == fake_feature(b"abc", 4)
        assert fake_feature(b"abc", 4) != fake_feature(b"abd", 4)
        assert fake_feature(None, 3) == [0.0, 0.0, 0.0]

    def test_real_decode_probes_then_gates(self):
        from meresco_rdf_spark.textops.multimodal import (
            _image_codec,
            decode_image,
        )

        if _image_codec() is None:
            # this container ships neither Pillow nor OpenCV: clear gate
            with pytest.raises(NotImplementedError, match="Pillow or OpenCV"):
                decode_image(b"payload")
        else:  # pragma: no cover - runs only where a codec is installed
            import numpy as np

            # 1x1 white PNG
            png = bytes.fromhex(
                "89504e470d0a1a0a0000000d49484452000000010000000108020000"
                "0090775"
                "3de0000000c4944415408d763f8ffff3f0005fe02fea7356081000000"
                "0049454e44ae426082")
            arr = np.asarray(decode_image(png))
            assert arr.shape == (1, 1, 3)

    def test_real_decode_branch_with_injected_codec(self, spark):
        # drives the use_fake=False mapInPandas branch end-to-end in a
        # codec-less container: the injected decoder ships to executors
        # inside the closure, exactly like a Pillow-backed one would
        def decode_stub(payload: bytes):
            v = (payload[0] if payload else 0) / 255.0
            return [[[v, v, v]] * 4] * 4  # (4, 4, 3)

        media = synthesize_media(spark, 10)
        feats = extract_features(media, dim=4, use_fake=False,
                                 codec=decode_stub).collect()
        assert len(feats) == 10
        for r in feats:
            assert len(r.feature) == 4
            assert all(0.0 <= x <= 1.0 for x in r.feature)
            # pooled bands of a constant image all equal payload[0]/255
            assert len(set(r.feature)) == 1

    def test_real_decode_mode_without_codec_raises_clearly(self, spark):
        from meresco_rdf_spark.textops.multimodal import _image_codec

        if _image_codec() is not None:  # pragma: no cover
            pytest.skip("a real codec is installed here")
        media = synthesize_media(spark, 2)
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PythonException

        with pytest.raises((PythonException, Py4JJavaError),
                           match="Pillow or OpenCV"):
            extract_features(media, dim=4, use_fake=False).collect()

    def test_pooled_feature_band_means(self):
        from meresco_rdf_spark.textops.multimodal import pooled_feature

        # 4 rows: two black then two white -> top band 0.0, bottom 1.0
        img = [[[0.0] * 3] * 2] * 2 + [[[1.0] * 3] * 2] * 2
        assert pooled_feature(img, dim=2) == [0.0, 1.0]

    def test_resize_fake_mode_shapes_and_determinism(self, spark):
        from meresco_rdf_spark.textops.multimodal import resize_images

        media = synthesize_media(spark, 24)
        out = resize_images(media, out_w=8, out_h=8).collect()
        # image rows only (kind cycles image/audio/video)
        assert len(out) == 8
        for r in out:
            assert (r.out_width, r.out_height, r.n_bytes) == (8, 8, 192)
            assert len(r.payload) == 192
            import hashlib
            assert r.digest == hashlib.md5(
                bytes(r.payload).hex().encode("ascii")).hexdigest()
        again = resize_images(media, out_w=8, out_h=8).collect()
        assert {r.digest for r in out} == {r.digest for r in again}

    def test_resize_real_branch_with_injected_codec(self, spark):
        from meresco_rdf_spark.textops.multimodal import resize_images

        def decode_stub(payload: bytes):
            # 2x2 image: top row black, bottom row white
            return [[[0.0] * 3] * 2, [[1.0] * 3] * 2]

        out = resize_images(synthesize_media(spark, 6), out_w=2, out_h=4,
                            use_fake=False, codec=decode_stub).collect()
        assert len(out) == 2
        for r in out:
            raw = bytes(r.payload)
            assert len(raw) == 2 * 4 * 3
            # nearest-neighbor: output rows 0-1 from source row 0 (black),
            # rows 2-3 from source row 1 (white)
            assert raw[: 2 * 2 * 3] == b"\x00" * 12
            assert raw[2 * 2 * 3:] == b"\xff" * 12

    def test_resize_pixels_nearest_neighbor(self):
        from meresco_rdf_spark.textops.multimodal import resize_pixels

        img = [[[0.0] * 3, [1.0] * 3], [[0.5] * 3, [0.25] * 3]]  # 2x2
        up = resize_pixels(img, 4, 4)
        assert up.shape == (4, 4, 3)
        assert float(up[0][0][0]) == 0.0 and float(up[0][3][0]) == 1.0
        assert float(up[3][0][0]) == 0.5 and float(up[3][3][0]) == 0.25
        down = resize_pixels(img, 1, 1)
        assert down.shape == (1, 1, 3) and float(down[0][0][0]) == 0.0

    def test_sample_frames_fake_mode(self, spark):
        from meresco_rdf_spark.textops.multimodal import sample_frames

        media = synthesize_media(spark, 24)  # 8 videos, duration 1000ms
        out = sample_frames(media, n_frames=4).collect()
        assert len(out) == 8 * 4
        by_id = {}
        for r in out:
            by_id.setdefault(r.media_id, []).append((r.frame_idx, r.ts_ms))
        for frames in by_id.values():
            assert sorted(frames) == [(0, 0), (1, 250), (2, 500), (3, 750)]
        # distinct digests per frame index (salted by index)
        one = [r for r in out if r.media_id == out[0].media_id]
        assert len({r.digest for r in one}) == 4

    def test_sample_frames_real_branch_and_gate(self, spark):
        from meresco_rdf_spark.textops.multimodal import sample_frames

        def extractor(payload: bytes, ts_ms: int):
            v = ((ts_ms // 250) % 4) / 4.0
            return [[[v] * 3]]

        media = synthesize_media(spark, 6)
        out = sample_frames(media, n_frames=2, use_fake=False,
                            extractor=extractor).collect()
        assert len(out) == 2 * 2
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PythonException

        with pytest.raises((PythonException, Py4JJavaError),
                           match="video codec"):
            sample_frames(media, n_frames=2, use_fake=False).collect()


class TestArrowFastPaths:
    def test_arrow_shingles_match_native(self, spark, docs):
        from meresco_rdf_spark.textops.dedup import word_shingles_arrow

        both = docs.select(
            F.array_sort(word_shingles(F.col("text"))).alias("a"),
            F.array_sort(word_shingles_arrow(F.col("text"))).alias("b"))
        assert both.filter(F.col("a") != F.col("b")).count() == 0

    def test_arrow_simhash_matches_native(self, spark, docs):
        from meresco_rdf_spark.textops.dedup import simhash_bits, simhash_bits_arrow

        both = docs.select(
            simhash_bits(F.col("text")).alias("a"),
            simhash_bits_arrow(F.col("text")).alias("b"))
        assert both.filter(F.col("a") != F.col("b")).count() == 0

    def test_arrow_hyperplane_signature_matches_expression(self, spark):
        from meresco_rdf_spark.textops.similarity import (
            hyperplane_signature,
            hyperplane_signature_arrow,
        )

        vecs = spark.range(200).select(
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: ((F.xxhash64(F.col("id"), i) % 100).cast("double")
                           / 10.0)).alias("v"))
        both = vecs.select(
            hyperplane_signature(F.col("v"), 8, 64).alias("a"),
            hyperplane_signature_arrow(F.col("v"), 8, 64).alias("b"))
        assert both.filter(F.col("a") != F.col("b")).count() == 0


class TestSignatureDimRobust:
    def test_production_dims_no_codegen_blowup(self, spark):
        # dim=1024 x 16 planes: the plane matrix must enter the plan as
        # ONE literal (no O(planes x dim) inlined constants); the query
        # must run and produce 16-bit signatures for every row
        from meresco_rdf_spark.textops.similarity import hyperplane_signature

        vecs = spark.range(64).select(
            F.transform(
                F.sequence(F.lit(0), F.lit(1023)),
                lambda i: (F.xxhash64(F.col("id"), i) % 100).cast("double")
            ).alias("v"))
        out = vecs.select(hyperplane_signature(F.col("v"), 16, 1024).alias("s"))
        # ONE projection chain over one array<array<double>> literal — not
        # 16 per-plane aggregate chains (the old codegen-blowup shape)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("zip_with") == 1
        assert plan.count("array_join") == 1
        assert out.filter(F.length("s") == 16).count() == 64


class TestShingles:
    def test_word_shingles(self, spark):
        df = spark.range(1).select(
            word_shingles(F.lit("a b c d"), 2).alias("s"))
        assert df.collect()[0].s == ["a b", "b c", "c d"]

    def test_short_text_single_shingle(self, spark):
        df = spark.range(1).select(word_shingles(F.lit("a b"), 3).alias("s"))
        assert df.collect()[0].s == ["a b"]


class TestIvf:
    def test_ivf_topk_recovers_near_identical_vectors(self, spark):
        from meresco_rdf_spark.textops.similarity import ivf_topk

        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
            (4, [1.0, 0.01, 0.0, 0.0]),
        ]
        v = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
        q = v.withColumnRenamed("vec_id", "query_id")
        approx = {(r.query_id, r.neighbor_id, r.rank)
                  for r in ivf_topk(v, q, k=1, n_pivots=4, probes=2,
                                    dim=4).collect()}
        # near-parallel vectors quantize to the same Voronoi cell
        assert (0, 4, 1) in approx

    def test_ivf_full_probe_equals_exact(self, spark):
        from meresco_rdf_spark.textops.similarity import cosine_topk, ivf_topk

        rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(4)])
                for i in range(12)]
        v = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
        q = v.filter("vec_id < 4").withColumnRenamed("vec_id", "query_id")
        exact = {(r.query_id, r.neighbor_id, r.rank)
                 for r in cosine_topk(v, q, k=3).collect()}
        full = {(r.query_id, r.neighbor_id, r.rank)
                for r in ivf_topk(v, q, k=3, n_pivots=4, probes=4,
                                  dim=4).collect()}
        assert full == exact  # probes == n_pivots -> no pruning

    def test_arrow_twins_bucket_and_topk_parity(self, spark):
        # the numpy-matmul scale path (use_arrow=True) must agree with
        # the expression path: identical bucket assignment over the
        # clustered synthetic corpus, identical top-k result set
        from meresco_rdf_spark.sources.synth_vecs import synthesize_embeddings
        from meresco_rdf_spark.textops.similarity import (
            ivf_bucket,
            ivf_bucket_arrow,
            ivf_topk,
        )

        vecs = synthesize_embeddings(spark, 500, dim=32, n_clusters=8)
        both = vecs.select(
            ivf_bucket(F.col("embedding"), 16, 32).alias("a"),
            ivf_bucket_arrow(F.col("embedding"), 16, 32).alias("b"))
        assert both.filter(F.col("a") != F.col("b")).count() == 0

        q = (synthesize_embeddings(spark, 8, dim=32, n_clusters=8)
             .withColumnRenamed("vec_id", "query_id"))
        expr = {(r.query_id, r.neighbor_id, r.rank)
                for r in ivf_topk(vecs, q, k=5, n_pivots=16, probes=3,
                                  dim=32).collect()}
        arrow = {(r.query_id, r.neighbor_id, r.rank)
                 for r in ivf_topk(vecs, q, k=5, n_pivots=16, probes=3,
                                   dim=32, use_arrow=True).collect()}
        assert arrow == expr
        # broadcast_queries: closure-captured query matrix — values must
        # stay bit-identical (same numpy multiply + row-sum), so the
        # full (id, id, cos, rank) tuples match, not just the id sets
        bq = {(r.query_id, r.neighbor_id, r.cos, r.rank)
              for r in ivf_topk(vecs, q, k=5, n_pivots=16, probes=3,
                                dim=32, use_arrow=True,
                                broadcast_queries=True).collect()}
        full_arrow = {(r.query_id, r.neighbor_id, r.cos, r.rank)
                      for r in ivf_topk(vecs, q, k=5, n_pivots=16, probes=3,
                                        dim=32, use_arrow=True).collect()}
        assert bq == full_arrow
        import pytest

        with pytest.raises(ValueError):
            ivf_topk(vecs, q, broadcast_queries=True)

    def test_lsh_topk_arrow_rerank_parity(self, spark):
        from meresco_rdf_spark.sources.synth_vecs import synthesize_embeddings
        from meresco_rdf_spark.textops.similarity import lsh_topk

        vecs = synthesize_embeddings(spark, 300, dim=32, n_clusters=6)
        q = (synthesize_embeddings(spark, 6, dim=32, n_clusters=6)
             .withColumnRenamed("vec_id", "query_id"))
        expr = {(r.query_id, r.neighbor_id, r.rank)
                for r in lsh_topk(vecs, q, k=5, n_planes=8, dim=32,
                                  bands=4).collect()}
        arrow = {(r.query_id, r.neighbor_id, r.rank)
                 for r in lsh_topk(vecs, q, k=5, n_planes=8, dim=32,
                                   bands=4, use_arrow=True).collect()}
        assert arrow == expr


class TestSynthVecs:
    def test_deterministic_and_parallelism_independent(self, spark):
        from meresco_rdf_spark.sources.synth_vecs import synthesize_embeddings

        a = synthesize_embeddings(spark, 100, dim=8, partitions=1).collect()
        b = synthesize_embeddings(spark, 100, dim=8, partitions=7).collect()
        assert sorted((r.vec_id, tuple(r.embedding)) for r in a) == \
            sorted((r.vec_id, tuple(r.embedding)) for r in b)

    def test_cluster_structure_recoverable(self, spark):
        # same-cluster vectors are measurably closer than cross-cluster:
        # intra-cluster mean cosine must dominate inter-cluster
        import itertools
        import math

        from meresco_rdf_spark.sources.synth_vecs import synthesize_embeddings

        rows = synthesize_embeddings(spark, 60, dim=16, n_clusters=4).collect()
        import pyspark.sql.functions as _F  # noqa: F401 (parity of style)

        def cos(u, v):
            d = sum(x * y for x, y in zip(u, v))
            return d / (math.sqrt(sum(x * x for x in u))
                        * math.sqrt(sum(y * y for y in v)))

        # recompute the generator's cluster id: pmod(xxhash64(id,'c'),4) is
        # JVM-side; instead group by nearest-neighbor agreement — simpler:
        # vectors whose pairwise cosine > 0.8 should form >1 groups
        sims = [cos(a.embedding, b.embedding)
                for a, b in itertools.combinations(rows, 2)]
        close = sum(1 for s in sims if s > 0.8)
        far = sum(1 for s in sims if s < 0.5)
        assert close > 0 and far > 0  # structure exists, not degenerate


def test_simhash_wide_fingerprints_jvm_arrow_parity(spark, docs):
    """64/128-bit simhash (block-salted md5 nibbles beyond nibble 32)
    must be identical between the JVM expression and the Arrow fast
    path — and must not regress the unsalted 32-bit prefix."""
    from meresco_rdf_spark.textops.dedup import simhash_bits, simhash_bits_arrow

    sample = docs.limit(50)
    both = sample.select(
        simhash_bits(F.col("text"), 64).alias("jvm64"),
        simhash_bits_arrow(F.col("text"), 64).alias("arrow64"),
        simhash_bits_arrow(F.col("text"), 32).alias("arrow32"))
    rows = both.collect()
    assert all(r.jvm64 == r.arrow64 for r in rows)
    assert all(len(r.jvm64) == 64 for r in rows)
    # block 0 is unsalted: the 32-bit fingerprint is a strict prefix
    assert all(r.jvm64[:32] == r.arrow32 for r in rows)


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def _decon_frames(spark):
    corpus = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely unrelated words in this one document here"),
        (3, "short text"),
    ], "doc_id long, text string")
    eval_set = spark.createDataFrame([
        (100, "we saw the quick brown fox jumps over the lazy dog yesterday"),
    ], "doc_id long, text string")
    return corpus, eval_set


def test_decontaminate_flags_overlap(spark):
    from meresco_rdf_spark.textops.decontaminate import decontaminate
    corpus, eval_set = _decon_frames(spark)
    out = {r.doc_id: (r.n_hits, r.contaminated)
           for r in decontaminate(corpus, eval_set, n=5).collect()}
    # doc 1 shares the 9-token span -> 5 distinct 5-grams of the span
    assert out[1][1] is True and out[1][0] == 5
    assert out[2] == (0, False)
    assert out[3] == (0, False)  # shorter than n: no grams, never flagged


def test_decontaminate_hash_and_string_paths_agree(spark):
    from meresco_rdf_spark.textops.decontaminate import decontaminate
    corpus, eval_set = _decon_frames(spark)
    a = sorted(tuple(r) for r in
               decontaminate(corpus, eval_set, n=5, hash_grams=True).collect())
    b = sorted(tuple(r) for r in
               decontaminate(corpus, eval_set, n=5,
                             hash_grams=False).collect())
    assert a == b


def test_decontaminate_normalization_case_punct(spark):
    from meresco_rdf_spark.textops.decontaminate import decontaminate
    corpus = spark.createDataFrame(
        [(1, "Alpha, BETA; gamma. delta epsilon!")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    out = decontaminate(corpus, ev, n=5).collect()[0]
    assert out.contaminated is True


def test_ngrams_column_expression(spark):
    from meresco_rdf_spark.textops.decontaminate import ngrams
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = [r[0] for r in df.select(ngrams(F.col("text"), 3)).collect()]
    assert got == [["a b c", "b c d"], []]


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def test_redact_pii_classes(spark):
    from meresco_rdf_spark.textops.redact import redact_pii
    df = spark.createDataFrame([
        (1, "mail me at jo.doe+x@sub.example.org or call +31 20 555 0199"),
        (2, "ssn 123-45-6789 from host 192.168.0.1 end"),
        (3, "nothing sensitive here"),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1
    assert "[EMAIL]" in out[1].redacted and "[PHONE]" in out[1].redacted
    assert "@" not in out[1].redacted
    assert out[2].n_ssn == 1 and out[2].n_ipv4 == 1
    assert out[2].redacted == "ssn [SSN] from host [IP] end"
    assert out[3].n_pii == 0 and out[3].redacted == out[3].text


def test_redact_pii_sequential_no_double_count(spark):
    from meresco_rdf_spark.textops.redact import redact_pii
    # an SSN also matches the phone shape; sequential detection must
    # count it exactly once (as ssn), and n_pii equals replacements made
    df = spark.createDataFrame([(1, "id 123-45-6789 only")],
                               "doc_id long, text string")
    r = redact_pii(df).collect()[0]
    assert r.n_ssn == 1 and r.n_phone == 0 and r.n_pii == 1
    assert r.redacted == "id [SSN] only"


class TestStdlibPng:
    """Pure-stdlib PNG codec (multimodal.decode_png / encode_png)."""

    def _px(self, size=8, m=0):
        import numpy as np
        y, x, c = np.meshgrid(np.arange(size), np.arange(size),
                              np.arange(3), indexing="ij")
        return ((3 * x + 5 * y + 11 * c + 7 * m) % 256).astype(np.uint8)

    def test_roundtrip_every_filter_type(self):
        import numpy as np
        from meresco_rdf_spark.textops.multimodal import (
            decode_png, encode_png)
        px = self._px(16)
        for filt in (0, 1, 2, 3, 4):
            png = encode_png(px, filter_per_row=lambda y, f=filt: f)
            back = (np.asarray(decode_png(png)) * 255).round()
            assert np.array_equal(back.astype(np.uint8), px), filt
        # mixed filters per row
        png = encode_png(px, filter_per_row=lambda y: y % 5)
        back = (np.asarray(decode_png(png)) * 255).round()
        assert np.array_equal(back.astype(np.uint8), px)

    def test_probe_finds_stdlib_codec_here(self):
        from meresco_rdf_spark.textops.multimodal import _image_codec
        name, decode = _image_codec()
        # Pillow/OpenCV absent in this container -> stdlib branch
        assert name in ("stdlib-png", "pillow", "opencv")

    def test_decode_image_real_png(self):
        import numpy as np
        from meresco_rdf_spark.textops.multimodal import (
            decode_image, encode_png)
        arr = np.asarray(decode_image(encode_png(self._px(4))))
        assert arr.shape == (4, 4, 3)
        assert 0.0 <= float(arr.min()) and float(arr.max()) <= 1.0

    def test_non_png_payload_gates_loudly(self):
        from meresco_rdf_spark.textops.multimodal import decode_png
        with pytest.raises(NotImplementedError, match="PNG"):
            decode_png(b"\xff\xd8\xff\xe0 jpeg-ish")

    def test_corrupt_idat_raises_value_error(self):
        from meresco_rdf_spark.textops.multimodal import (
            decode_png, encode_png)
        png = bytearray(encode_png(self._px(4)))
        png[60] ^= 0xFF  # flip a byte inside IDAT
        with pytest.raises(ValueError):
            decode_png(bytes(png))

    def test_grey_and_alpha_color_types(self):
        # hand-build a 2x1 greyscale PNG (color type 0) and an RGBA one
        import struct
        import zlib

        import numpy as np
        from meresco_rdf_spark.textops.multimodal import decode_png

        def chunk(ctype, body):
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I", zlib.crc32(ctype + body)))

        magic = b"\x89PNG\r\n\x1a\n"
        grey = (magic
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(b"\x00\x40\x80"))
                + chunk(b"IEND", b""))
        g = np.asarray(decode_png(grey))
        assert g.shape == (1, 2, 3)
        assert np.allclose(g[0, 0], 64 / 255.0)
        assert np.allclose(g[0, 1], 128 / 255.0)
        rgba = (magic
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(b"\x00\x10\x20\x30\xff"))
                + chunk(b"IEND", b""))
        a = np.asarray(decode_png(rgba))
        assert a.shape == (1, 1, 3)
        assert np.allclose(a[0, 0] * 255, [0x10, 0x20, 0x30])

    def test_unsupported_variants_gate(self):
        import struct
        import zlib

        from meresco_rdf_spark.textops.multimodal import decode_png

        def chunk(ctype, body):
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I", zlib.crc32(ctype + body)))

        magic = b"\x89PNG\r\n\x1a\n"
        # 16-bit depth
        deep = (magic
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(b"\x00" + b"\x00" * 6))
                + chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError, match="8-bit"):
            decode_png(deep)
        # Adam7 interlace
        inter = (magic
                 + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1))
                 + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
                 + chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError, match="interlacing"):
            decode_png(inter)

    def test_synthesized_media_decodes_distributed(self, spark):
        import numpy as np
        from meresco_rdf_spark.textops.multimodal import (
            extract_features, synthesize_png_media)
        feats = extract_features(synthesize_png_media(spark, 6, size=8),
                                 dim=4, use_fake=False).collect()
        assert len(feats) == 6
        got = {r.media_id: list(r.feature) for r in feats}
        # independent expectation from the pixel formula
        for m in range(6):
            px = self._px(8, m).astype(np.float32) / np.float32(255.0)
            want = [float(b.mean()) for b in
                    np.array_split(px.mean(axis=2), 4, axis=0)]
            assert np.allclose(got["png%d" % m], want, atol=1e-6), m
