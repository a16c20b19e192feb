"""Incremental SHACL maintenance: retraction, late appearance, late
focus, class repair, batch equivalence, replay idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from meresco_rdf_spark.operators.shacl import validate
from meresco_rdf_spark.streaming.shacl_stream import run_shacl_maintenance

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SCHEMA = ("subj string, pred string, obj_value string, obj_kind string, "
          "obj_lang string")

SHAPES = [
    {"id": "urn:s:person", "target_class": "urn:ex:Person",
     "properties": [
         {"path": "urn:ex:name", "min_count": 1, "max_count": 1,
          "node_kind": ("literal",)},
         {"path": "urn:ex:knows", "node_kind": ("uri",),
          "class": "urn:ex:Person"},
     ]},
    {"id": "urn:s:tagged", "target_subjects_of": "urn:ex:tag",
     "properties": [{"path": "urn:ex:tag", "in": ["red", "green"]}]},
]


def person(pid, name=None, knows=(), typed=True):
    rows, s = [], "urn:ex:%s" % pid
    if typed:
        rows.append((s, RDF_TYPE, "urn:ex:Person", "uri", None))
    if name is not None:
        rows.append((s, "urn:ex:name", name, "literal", None))
    rows += [(s, "urn:ex:knows", k, "uri", None) for k in knows]
    return rows


def report_set(spark, path):
    return {(r.shape_id, r.focus, r.path, r.constraint, r.value)
            for r in spark.read.parquet(path).collect()}


class _Harness:
    """File-sliced triple stream + one-call maintenance runs.  Files can
    be added between runs; the shared checkpoint makes each run process
    only the new ones (the resumable-batch shape)."""

    def __init__(self, spark, tmp_path, shapes=SHAPES):
        self.spark, self.shapes = spark, shapes
        self.in_dir = str(tmp_path / "in")
        os.makedirs(self.in_dir)
        self.table = str(tmp_path / "table")
        self.report = str(tmp_path / "report")
        self.ckpt = str(tmp_path / "ckpt")
        self._n = 0

    def add_slice(self, rows):
        self._n += 1
        part = self.in_dir + "/.build%d" % self._n
        self.spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.parquet(part)
        src = [f for f in os.listdir(part) if f.endswith(".parquet")][0]
        dst = os.path.join(self.in_dir, "slice_%03d.parquet" % self._n)
        os.rename(os.path.join(part, src), dst)
        os.utime(dst, (1_700_000_000 + self._n,) * 2)

    def run(self, ckpt=None):
        stream = (self.spark.readStream.schema(SCHEMA).format("parquet")
                  .option("maxFilesPerTrigger", 1)
                  .option("pathGlobFilter", "slice_*.parquet")
                  .load(self.in_dir))
        q = run_shacl_maintenance(stream, self.shapes, self.table,
                                  self.report, ckpt or self.ckpt)
        q.awaitTermination(300)


class TestShaclStream:
    def test_min_count_violation_retracts(self, spark, tmp_path):
        h = _Harness(spark, tmp_path)
        h.add_slice(person("p1"))  # focus without a name yet
        h.run()
        assert ("urn:s:person", "urn:ex:p1", "urn:ex:name",
                "minCount", "0") in report_set(spark, h.report)
        h.add_slice([("urn:ex:p1", "urn:ex:name", "Alice", "literal",
                      None)])  # name arrives in a LATER batch
        h.run()
        assert report_set(spark, h.report) == set()

    def test_max_count_appears_across_batches(self, spark, tmp_path):
        h = _Harness(spark, tmp_path)
        h.add_slice(person("p1", "Alice"))
        h.run()
        assert report_set(spark, h.report) == set()
        h.add_slice([("urn:ex:p1", "urn:ex:name", "Alias", "literal",
                      None)])  # second name: only visible ACROSS batches
        h.run()
        assert ("urn:s:person", "urn:ex:p1", "urn:ex:name",
                "maxCount", "2") in report_set(spark, h.report)

    def test_late_focus_checks_earlier_rows(self, spark, tmp_path):
        h = _Harness(spark, tmp_path)
        # value rows first: p2 is not yet focus, nothing to report
        h.add_slice([("urn:ex:p2", "urn:ex:knows", "zzz", "literal", None)])
        h.run()
        assert report_set(spark, h.report) == set()
        # the typing row arrives: p2 becomes focus and the OLD literal
        # knows-row must now be flagged (nodeKind + class)
        h.add_slice(person("p2", "Bob"))
        h.run()
        got = report_set(spark, h.report)
        assert ("urn:s:person", "urn:ex:p2", "urn:ex:knows",
                "nodeKind", "zzz") in got

    def test_class_violation_repaired_by_late_type(self, spark, tmp_path):
        h = _Harness(spark, tmp_path)
        h.add_slice(person("p1", "Alice", knows=["urn:ex:ghost"]))
        h.run()
        assert ("urn:s:person", "urn:ex:p1", "urn:ex:knows",
                "class", "urn:ex:ghost") in report_set(spark, h.report)
        # ghost gets typed in a later batch -> the reverse lookup must
        # revalidate p1 and retract the class violation
        h.add_slice([("urn:ex:ghost", RDF_TYPE, "urn:ex:Person", "uri",
                      None),
                     ("urn:ex:ghost", "urn:ex:name", "Ghost", "literal",
                      None)])
        h.run()
        assert report_set(spark, h.report) == set()

    def test_equals_batch_validation_and_replay(self, spark, tmp_path):
        rows1 = person("p1", "Alice") + person("p2", knows=["urn:ex:p1"])
        rows2 = [("urn:ex:t1", "urn:ex:tag", "mauve", "literal", None),
                 ("urn:ex:p2", "urn:ex:name", "Bob", "literal", None),
                 ("urn:ex:p2", "urn:ex:name", "Bobby", "literal", None)]
        h = _Harness(spark, tmp_path)
        h.add_slice(rows1)
        h.add_slice(rows2)
        h.run()
        batch = validate(
            spark.createDataFrame(rows1 + rows2, SCHEMA), SHAPES)
        want = {(r.shape_id, r.focus, r.path, r.constraint, r.value)
                for r in batch.collect()}
        assert want  # non-trivial fixture
        assert report_set(spark, h.report) == want
        n_table = spark.read.parquet(h.table).count()
        # max-scale replay: the WHOLE stream again with a fresh
        # checkpoint — table and report must not change
        h.run(ckpt=str(tmp_path / "ckpt2"))
        assert report_set(spark, h.report) == want
        assert spark.read.parquet(h.table).count() == n_table

    def test_duplicate_deliveries_absorbed(self, spark, tmp_path):
        h = _Harness(spark, tmp_path)
        rows = person("p1", "Alice")
        h.add_slice(rows)
        h.add_slice(rows)  # the same rows delivered twice
        h.run()
        assert report_set(spark, h.report) == set()
        assert spark.read.parquet(h.table).count() == len(rows)


def test_structured_paths_rejected_loudly(spark):
    # the affected-focus derivation reads paths as predicates; a
    # structured path must fail fast, not silently under-revalidate
    import pytest

    from meresco_rdf_spark.operators.shacl import (
        ShaclUnsupported, shapes_from_graph)
    from meresco_rdf_spark.rdfxml.turtle import iter_turtle
    from meresco_rdf_spark.streaming.shacl_stream import _affected_focus

    shapes = shapes_from_graph(iter_turtle("""
        @prefix sh: <http://www.w3.org/ns/shacl#> .
        <urn:s> a sh:NodeShape ; sh:targetClass <urn:C> ;
          sh:property [ sh:path [ sh:inversePath <urn:p> ] ;
                        sh:minCount 1 ] ."""))
    rows = spark.createDataFrame(
        [("urn:a", "urn:p", "urn:b", "uri", None)],
        "subj string, pred string, obj_value string, obj_kind string, "
        "obj_lang string")
    with pytest.raises(ShaclUnsupported, match="IRI paths only"):
        _affected_focus(spark, shapes, rows, None)
