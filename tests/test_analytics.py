"""Tests for the composed analytics operators (as-of join, range join,
pivot, cube, quantiles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meresco_rdf_spark.operators.analytics import (
    as_of_join,
    cube_counts,
    group_quantiles,
    pivot_sum,
    range_join_broadcast,
    range_join_bucketized,
)


class TestAsOfJoin:
    def test_picks_latest_at_or_before(self, spark):
        left = spark.createDataFrame(
            [("u1", 100, "p1"), ("u1", 250, "p2"), ("u2", 50, "p3")],
            "k string, ts long, pid string")
        right = spark.createDataFrame(
            [("u1", 100, 1.0), ("u1", 200, 2.0), ("u2", 60, 9.0)],
            "k string, ts long, v double")
        got = {(r.pid, r.v_asof) for r in as_of_join(
            left, right, key="k", ts="ts", value_cols=["v"]).collect()}
        # ties (ts equal) resolve to the right row; u2 purchase precedes
        # its only signup -> NULL
        assert got == {("p1", 1.0), ("p2", 2.0), ("p3", None)}

    def test_null_value_on_latest_right_row_is_preserved(self, spark):
        # DuckDB ASOF semantics: the LATEST matching right row wins even
        # when its payload is NULL — an older non-NULL row must not leak
        # through (regression for per-column last(ignorenulls))
        left = spark.createDataFrame(
            [("u1", 300, "p1")], "k string, ts long, pid string")
        right = spark.createDataFrame(
            [("u1", 100, 1.0), ("u1", 200, None)],
            "k string, ts long, v double")
        row = as_of_join(left, right, "k", "ts", ["v"]).collect()[0]
        assert row.v_asof is None

    def test_multiple_value_columns(self, spark):
        left = spark.createDataFrame([("k", 10, 1)], "k string, ts long, n int")
        right = spark.createDataFrame(
            [("k", 5, 1.5, "x")], "k string, ts long, a double, b string")
        row = as_of_join(left, right, "k", "ts", ["a", "b"]).collect()[0]
        assert (row.a_asof, row.b_asof) == (1.5, "x")


class TestRangeJoin:
    def _data(self, spark):
        rows = spark.createDataFrame(
            [(i, t) for i, t in enumerate([5, 15, 25, 35, 95])],
            "rid int, ts long")
        intervals = spark.createDataFrame(
            [(10, 30, "a"), (90, 100, "b")],
            "start long, end long, label string")
        return rows, intervals

    def test_broadcast_and_bucketized_agree(self, spark):
        rows, intervals = self._data(spark)
        bc = {(r.rid, r.label) for r in range_join_broadcast(
            rows, intervals, "ts", "start", "end").collect()}
        bk = {(r.rid, r.label) for r in range_join_bucketized(
            rows, intervals, "ts", "start", "end", bucket_width=7).collect()}
        assert bc == bk == {(1, "a"), (2, "a"), (4, "b")}

    def test_bucketized_interval_spanning_many_buckets(self, spark):
        rows = spark.createDataFrame([(1, 50)], "rid int, ts long")
        intervals = spark.createDataFrame([(0, 1000, "wide")],
                                          "start long, end long, label string")
        got = range_join_bucketized(
            rows, intervals, "ts", "start", "end", bucket_width=3).collect()
        assert [(r.rid, r.label) for r in got] == [(1, "wide")]


class TestPivotCubeQuantiles:
    def test_pivot_sum_pinned_columns(self, spark):
        df = spark.createDataFrame(
            [("A", "O", 1.0), ("A", "F", 2.0), ("B", "O", 3.0)],
            "k string, s string, v double")
        rows = {r.k: (r.O, r.F) for r in pivot_sum(
            df, "k", "s", ["O", "F"], F.col("v")).collect()}
        assert rows == {"A": (1.0, 2.0), "B": (3.0, None)}

    def test_cube_includes_rollup_rows(self, spark):
        df = spark.createDataFrame(
            [("A", "O"), ("A", "F"), ("B", "O")], "k string, s string")
        rows = {(r.k, r.s): r.n for r in cube_counts(df, ["k", "s"]).collect()}
        assert rows[(None, None)] == 3
        assert rows[("A", None)] == 2
        assert rows[(None, "O")] == 2
        assert rows[("A", "O")] == 1

    def test_group_quantiles_interpolation(self, spark):
        df = spark.createDataFrame(
            [("g", float(v)) for v in [1, 2, 3, 4]], "k string, v double")
        rows = {r.prob: r.quantile for r in group_quantiles(
            df, "k", "v", [0.25, 0.5]).collect()}
        assert rows == {0.25: 1.75, 0.5: 2.5}
