"""Snapshot-versioned triple tables: COW merge semantics, atomic-commit
CAS, reader isolation, time travel, emptied/new buckets, expiry."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meresco_rdf_spark.kg.materialize import with_subj_bucket
from meresco_rdf_spark.kg.snapshots import (
    SnapshotConflict,
    SnapshotNotFound,
    _commit_manifest,
    _fs,
    expire_snapshots,
    read_snapshot,
    snapshot_create,
    snapshot_merge,
    snapshot_versions,
)

SCHEMA = ("subj string, pred string, obj_value string, obj_kind string, "
          "obj_lang string")


def tri(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def rowset(df):
    return {(r.subj, r.pred, r.obj_value, r.obj_kind, r.obj_lang)
            for r in df.select(
                "subj", "pred", "obj_value", "obj_kind", "obj_lang")
            .collect()}


def base_rows(n=40):
    return [("urn:s:%d" % i, "urn:p:label", "name %d" % i, "literal", None)
            for i in range(n)] + [
        ("urn:s:%d" % i, "urn:p:ref", "urn:s:%d" % ((i + 1) % n), "uri",
         None) for i in range(n)]


class TestSnapshotTable:
    def test_create_read_roundtrip(self, spark, tmp_path):
        root = str(tmp_path / "t")
        df = tri(spark, base_rows())
        m = snapshot_create(spark, df, root, buckets=4)
        assert m["version"] == 1 and m["total_rows"] == 80
        got = read_snapshot(spark, root)
        assert rowset(got) == rowset(df)
        # subj_bucket recovered via partition discovery and correct
        chk = with_subj_bucket(df, 4).collect()
        want = {(r.subj, r.pred, r.subj_bucket) for r in chk}
        assert {(r.subj, r.pred, r.subj_bucket) for r in got.collect()} \
            == want

    def test_merge_semantics_and_cow_reuse(self, spark, tmp_path):
        root = str(tmp_path / "t")
        df = tri(spark, base_rows())
        snapshot_create(spark, df, root, buckets=4)
        adds = tri(spark, [
            ("urn:s:0", "urn:p:alt", "zero", "literal", "en"),
            # set-semantics leg: re-adding an existing row must not dup
            ("urn:s:1", "urn:p:label", "name 1", "literal", None)])
        deletes = tri(spark, [
            ("urn:s:2", "urn:p:label", "name 2", "literal", None),
            # no-op delete leg
            ("urn:s:2", "urn:p:label", "GONE", "literal", None)])
        m2 = snapshot_merge(spark, root, adds=adds, deletes=deletes)
        want = ((rowset(df) - rowset(deletes)) | rowset(adds))
        assert rowset(read_snapshot(spark, root)) == want
        assert m2["total_rows"] == len(want)
        # copy-on-write: untouched buckets' manifest entries point at the
        # PARENT's data directory (no rewrite happened)
        m1 = snapshot_versions(spark, root)[0]
        untouched = [b for b in m2["buckets"]
                     if int(b) not in m2["buckets_touched"]]
        assert untouched, "test needs at least one untouched bucket"
        for b in untouched:
            assert m2["buckets"][b] == m1["buckets"][b]
        for b in m2["buckets_touched"]:
            assert m2["buckets"][str(b)] != m1["buckets"].get(str(b))

    def test_reader_isolation_and_time_travel(self, spark, tmp_path):
        root = str(tmp_path / "t")
        df = tri(spark, base_rows())
        snapshot_create(spark, df, root, buckets=4)
        reader = read_snapshot(spark, root)  # resolved BEFORE the merge
        snapshot_merge(spark, root, deletes=df)  # empty the whole table
        # the pre-merge reader still sees v1 in full (immutable files)
        assert reader.count() == 80
        assert rowset(reader) == rowset(df)
        # current is empty; time travel reopens v1
        assert read_snapshot(spark, root).count() == 0
        assert rowset(read_snapshot(spark, root, version=1)) == rowset(df)

    def test_emptied_bucket_leaves_manifest(self, spark, tmp_path):
        root = str(tmp_path / "t")
        df = tri(spark, base_rows())
        snapshot_create(spark, df, root, buckets=4)
        bucketed = with_subj_bucket(df, 4)
        victim = bucketed.select("subj_bucket").first().subj_bucket
        dels = bucketed.filter(F.col("subj_bucket") == victim).drop(
            "subj_bucket")
        m2 = snapshot_merge(spark, root, deletes=dels)
        assert str(victim) not in m2["buckets"]
        cur = read_snapshot(spark, root)
        assert cur.filter(F.col("subj_bucket") == victim).count() == 0
        assert cur.count() == 80 - dels.count()

    def test_add_into_previously_empty_bucket(self, spark, tmp_path):
        root = str(tmp_path / "t")
        df = tri(spark, base_rows(4))
        bucketed = with_subj_bucket(df, 4)
        present = {r.subj_bucket for r in bucketed.collect()}
        snapshot_create(
            spark, bucketed.filter(
                F.col("subj_bucket") == min(present)).drop("subj_bucket"),
            root, buckets=4)
        other = bucketed.filter(F.col("subj_bucket") != min(present)).drop(
            "subj_bucket")
        assert other.count() > 0
        snapshot_merge(spark, root, adds=other)
        assert rowset(read_snapshot(spark, root)) == rowset(df)

    def test_commit_conflict_raises(self, spark, tmp_path):
        root = str(tmp_path / "t")
        snapshot_create(spark, tri(spark, base_rows(4)), root, buckets=2)
        fs, hpath = _fs(spark, root)
        doomed = {"version": 1, "parent": None, "operation": "overwrite",
                  "n_buckets": 2, "buckets": {}, "row_counts": {},
                  "total_rows": 0, "created_unix": 0.0}
        with pytest.raises(SnapshotConflict):
            _commit_manifest(fs, hpath, root, doomed)
        # the losing writer's temp file must not linger
        assert not [f for f in os.listdir(os.path.join(root, "_meta"))
                    if f.startswith(".tmp-")]

    def test_merge_without_snapshot_raises(self, spark, tmp_path):
        with pytest.raises(SnapshotNotFound):
            snapshot_merge(spark, str(tmp_path / "none"),
                           adds=tri(spark, base_rows(2)))
        with pytest.raises(SnapshotNotFound):
            read_snapshot(spark, str(tmp_path / "none"))

    def test_expire_drops_history_keeps_current(self, spark, tmp_path):
        root = str(tmp_path / "t")
        df = tri(spark, base_rows())
        snapshot_create(spark, df, root, buckets=4)
        adds = tri(spark, [("urn:s:0", "urn:p:alt", "x", "literal", None)])
        snapshot_merge(spark, root, adds=adds)
        dels = tri(spark, [("urn:s:0", "urn:p:alt", "x", "literal", None)])
        snapshot_merge(spark, root, deletes=dels)
        current = rowset(read_snapshot(spark, root))
        out = expire_snapshots(spark, root, keep_last=1)
        assert out["expired_versions"] == [1, 2]
        # v3's untouched buckets still reference v1 data dirs — those
        # must SURVIVE expiry (referenced), while v2's superseded touched
        # dir is deleted
        assert rowset(read_snapshot(spark, root)) == current
        with pytest.raises(SnapshotNotFound):
            read_snapshot(spark, root, version=1)
        data_dirs = set(os.listdir(os.path.join(root, "data")))
        kept = snapshot_versions(spark, root)[-1]
        referenced = {p.split("/subj_bucket=", 1)[0].split("/", 1)[1]
                      for p in kept["buckets"].values()}
        assert data_dirs == referenced

    def test_lineage_metrics(self, spark, tmp_path):
        root = str(tmp_path / "t")
        df = tri(spark, base_rows())
        snapshot_create(spark, df, root, buckets=4)
        m2 = snapshot_merge(spark, root, adds=tri(
            spark, [("urn:s:0", "urn:p:alt", "x", "literal", None)]))
        assert m2["parent"] == 1 and m2["version"] == 2
        assert m2["operation"] == "merge"
        assert sum(m2["row_counts"].values()) == m2["total_rows"] == 81
        vs = snapshot_versions(spark, root)
        assert [m["version"] for m in vs] == [1, 2]


class TestSnapshotDiff:
    def _setup(self, spark, tmp_path):
        from meresco_rdf_spark.kg.snapshots import snapshot_diff
        root = str(tmp_path / "t")
        snapshot_create(spark, tri(spark, base_rows()), root, buckets=4)
        adds = tri(spark, [("urn:s:1", "urn:p:new", "v", "literal", None)])
        dels = tri(spark, [("urn:s:1", "urn:p:label", "name 1",
                            "literal", None)])
        snapshot_merge(spark, root, adds=adds, deletes=dels)
        return root, snapshot_diff

    def test_diff_reports_added_and_removed(self, spark, tmp_path):
        root, snapshot_diff = self._setup(spark, tmp_path)
        got = {(r.change, r.subj, r.pred, r.obj_value)
               for r in snapshot_diff(spark, root, 1, 2).collect()}
        assert got == {("added", "urn:s:1", "urn:p:new", "v"),
                       ("removed", "urn:s:1", "urn:p:label", "name 1")}

    def test_diff_is_directional(self, spark, tmp_path):
        root, snapshot_diff = self._setup(spark, tmp_path)
        got = {(r.change, r.pred)
               for r in snapshot_diff(spark, root, 2, 1).collect()}
        assert got == {("removed", "urn:p:new"), ("added", "urn:p:label")}

    def test_diff_scans_only_changed_buckets(self, spark, tmp_path):
        root, snapshot_diff = self._setup(spark, tmp_path)
        import re as _re
        files = snapshot_diff(spark, root, 1, 2).inputFiles()
        assert files  # resolved to concrete parquet files
        # only the single touched bucket's directories (old + new) scan
        buckets = {_re.search(r"subj_bucket=(\d+)", f).group(1)
                   for f in files}
        assert len(buckets) == 1

    def test_self_diff_empty(self, spark, tmp_path):
        root, snapshot_diff = self._setup(spark, tmp_path)
        assert snapshot_diff(spark, root, 2, 2).count() == 0

    def test_mismatched_bucket_counts_raise(self, spark, tmp_path):
        from meresco_rdf_spark.kg.snapshots import snapshot_diff
        r1 = str(tmp_path / "a")
        snapshot_create(spark, tri(spark, base_rows()), r1, buckets=4)
        with pytest.raises(SnapshotNotFound):
            snapshot_diff(spark, r1, 1, 9)


class TestSnapshotCompact:
    def _fragmented(self, spark, tmp_path):
        from meresco_rdf_spark.kg.snapshots import snapshot_compact
        root = str(tmp_path / "t")
        # parallel salted create: 3 writers (files) per bucket — the
        # write-fast layout compaction exists to consolidate
        snapshot_create(spark, tri(spark, base_rows()), root, buckets=4,
                        files_per_bucket=3)
        return root, snapshot_compact

    def test_compaction_preserves_rowset_and_history(self, spark, tmp_path):
        root, snapshot_compact = self._fragmented(spark, tmp_path)
        before = rowset(read_snapshot(spark, root))
        m = snapshot_compact(spark, root)
        assert m["operation"] == "compact"
        assert rowset(read_snapshot(spark, root)) == before
        # time travel to pre-compaction versions still works
        assert rowset(read_snapshot(spark, root, version=m["parent"])) \
            == before

    def test_one_file_per_compacted_bucket(self, spark, tmp_path):
        import glob as _glob
        root, snapshot_compact = self._fragmented(spark, tmp_path)
        m = snapshot_compact(spark, root)
        for b in m["buckets_touched"]:
            d = root + "/" + m["buckets"][str(b)]
            assert len(_glob.glob(d + "/*.parquet")) == 1

    def test_unfragmented_is_a_noop(self, spark, tmp_path):
        from meresco_rdf_spark.kg.snapshots import snapshot_compact
        root = str(tmp_path / "t")
        snapshot_create(spark, tri(spark, base_rows()), root, buckets=4)
        m1 = snapshot_versions(spark, root)[-1]
        assert snapshot_compact(spark, root)["version"] == m1["version"]

    def test_untouched_buckets_reuse_parent_dirs(self, spark, tmp_path):
        root, snapshot_compact = self._fragmented(spark, tmp_path)
        parent = snapshot_versions(spark, root)[-1]
        m = snapshot_compact(spark, root)
        for b, rel in m["buckets"].items():
            if int(b) not in m["buckets_touched"]:
                assert rel == parent["buckets"][b]


class TestIcebergSeam:
    """kg/iceberg.py: one API that routes filesystem paths to the
    parquet COW layer and catalog identifiers to native Iceberg
    DDL/DML; the catalog branch is config-gated (skips without a
    configured spark.sql.catalog.*)."""

    def test_path_target_delegates_to_parquet_layer(self, spark, tmp_path):
        from meresco_rdf_spark.kg.iceberg import (
            expire,
            read_table,
            table_create,
            table_merge,
            table_versions,
        )

        root = str(tmp_path / "seam")
        df = tri(spark, base_rows())
        m = table_create(spark, df, root, buckets=4)
        assert m["version"] == 1  # parquet manifest returned
        adds = tri(spark, [("urn:s:new", "urn:p:label", "n", "literal",
                            None)])
        dels = tri(spark, [("urn:s:0", "urn:p:label", "name 0", "literal",
                            None)])
        table_merge(spark, root, adds=adds, deletes=dels)
        got = rowset(read_table(spark, root))
        assert ("urn:s:new", "urn:p:label", "n", "literal", None) in got
        assert ("urn:s:0", "urn:p:label", "name 0", "literal",
                None) not in got
        # time travel + lineage + expiry all reach the parquet layer
        assert rowset(read_table(spark, root, version=1)) == rowset(df)
        assert [v["version"] for v in table_versions(spark, root)] == [1, 2]
        expire(spark, root, keep_last=1)
        assert [v["version"] for v in table_versions(spark, root)] == [2]

    def test_unconfigured_catalog_named_error(self, spark):
        from meresco_rdf_spark.kg.iceberg import (
            IcebergCatalogNotConfigured,
            catalog_of,
        )

        assert catalog_of(spark, "/some/path/t") is None
        assert catalog_of(spark, "file:/some/path") is None
        with pytest.raises(IcebergCatalogNotConfigured,
                           match="spark.sql.catalog.prod"):
            catalog_of(spark, "prod.kg.triples")

    def test_configured_catalog_detected(self, spark):
        from meresco_rdf_spark.kg.iceberg import catalog_of

        spark.conf.set("spark.sql.catalog.mycat", "x.y.FakeCatalog")
        try:
            assert catalog_of(spark, "mycat.db.t") == "mycat"
        finally:
            spark.conf.unset("spark.sql.catalog.mycat")

    def test_merge_sql_shape(self):
        from meresco_rdf_spark.kg.iceberg import merge_sql

        sql = merge_sql("cat.db.t", "delta_v")
        # null-safe identity on every triple column (obj_lang nullable)
        for c in ("subj", "pred", "obj_value", "obj_kind", "obj_lang"):
            assert "t.%s <=> s.%s" % (c, c) in sql
        assert "WHEN MATCHED AND s.op = 'del' THEN DELETE" in sql
        assert "WHEN NOT MATCHED AND s.op = 'add' THEN INSERT" in sql

    def test_delta_source_add_wins(self, spark):
        from meresco_rdf_spark.kg.iceberg import _delta_source

        both = ("urn:s:b", "urn:p", "v", "literal", None)
        adds = tri(spark, [both, ("urn:s:a", "urn:p", "v", "literal",
                                  None)])
        dels = tri(spark, [both, ("urn:s:d", "urn:p", "v", "literal",
                                  None)])
        got = {(r.subj, r.op) for r in _delta_source(adds, dels).collect()}
        # the row in both sets resolves to 'add' (delete-then-add
        # survives, matching snapshot_merge), one row per triple
        assert got == {("urn:s:b", "add"), ("urn:s:a", "add"),
                       ("urn:s:d", "del")}
        assert _delta_source(None, None) is None

    @pytest.mark.skipif(
        not os.environ.get("MRS_ICEBERG_CATALOG"),
        reason="no Iceberg catalog in this environment; set "
               "MRS_ICEBERG_CATALOG=<catalog> (with spark.sql.catalog."
               "<catalog> configured + the Iceberg runtime jar) to run "
               "the native-branch end-to-end test")
    def test_catalog_branch_end_to_end(self, spark):
        from meresco_rdf_spark.kg.iceberg import (
            read_table,
            table_create,
            table_merge,
            table_versions,
        )

        cat = os.environ["MRS_ICEBERG_CATALOG"]
        ident = "%s.mrs_test.triples_seam" % cat
        spark.sql("CREATE NAMESPACE IF NOT EXISTS %s.mrs_test" % cat)
        df = tri(spark, base_rows())
        table_create(spark, df, ident, buckets=4)
        assert rowset(read_table(spark, ident)) == rowset(df)
        adds = tri(spark, [("urn:s:new", "urn:p:label", "n", "literal",
                            None)])
        dels = tri(spark, [("urn:s:0", "urn:p:label", "name 0", "literal",
                            None)])
        table_merge(spark, ident, adds=adds, deletes=dels)
        got = rowset(read_table(spark, ident))
        assert ("urn:s:new", "urn:p:label", "n", "literal", None) in got
        assert ("urn:s:0", "urn:p:label", "name 0", "literal",
                None) not in got
        assert rowset(read_table(spark, ident, version=1)) == rowset(df)
        assert len(table_versions(spark, ident)) == 2
        spark.sql("DROP TABLE %s" % ident)
