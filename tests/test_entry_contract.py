"""Driver-contract tests: entry() smoke, queries()/oracle_sql() registry
consistency, and a DuckDB parity spot-check (the full parity run lives in
tools/check_oracles.py and covers every oracle at sf0.01)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
ORACLE_TABLES = ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]


class TestDriverContract:
    def test_entry_returns_rows_with_stable_schema(self, spark):
        df = entry_mod.entry(spark)
        assert df.columns == ["subj", "label_value", "label_lang", "in_degree"]
        assert df.count() > 0

    def test_registry_consistency(self):
        queries = entry_mod.queries()
        oracles = entry_mod.oracle_sql()
        assert len(queries) >= 25
        # every query carries an oracle (SQL or committed-golden parquet)
        assert set(oracles) == set(queries)

    @pytest.mark.parametrize("name", ["graph_find_labels", "dedup_exact",
                                      "pricing_summary"])
    def test_query_matches_oracle(self, spark, name):
        queries = entry_mod.queries()
        oracles = entry_mod.oracle_sql()
        sdf = queries[name](spark, SF_DIR)
        con = duckdb.connect()
        for t in ORACLE_TABLES:
            con.execute("CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet'"
                        % (t, SF_DIR, t))
        res = con.execute(oracles[name])
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
        s_rows = [tuple(r) for r in sdf.collect()]
        assert sorted(sdf.columns) == sorted(o_cols)
        assert len(s_rows) == len(o_rows)

        def key(cols, row):
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            return tuple(
                "%.9g" % row[i] if isinstance(row[i], float) else str(row[i])
                for i in order)

        assert sorted(key(sdf.columns, r) for r in s_rows) == \
            sorted(key(o_cols, r) for r in o_rows)

    def test_rows_only_queries_run(self, spark):
        queries = entry_mod.queries()
        df = queries["kg_mentions"](spark, SF_DIR)
        assert df.count() > 0


class TestDynamicRotation:
    def test_driver_green_unions_correctness_files(self, tmp_path):
        import json

        from meresco_rdf_spark.entry_queries import _driver_green

        (tmp_path / "CORRECTNESS_r01.json").write_text(
            json.dumps({"a": {}, "b": {}}))
        (tmp_path / "CORRECTNESS_r02.json").write_text(
            json.dumps({"b": {}, "c": {}}))
        (tmp_path / "CORRECTNESS_r02_broken.json").write_text("not json")
        assert _driver_green(str(tmp_path)) == {"a", "b", "c"}

    def test_driver_green_falls_back_when_no_files(self, tmp_path):
        from meresco_rdf_spark.entry_queries import (
            _DRIVER_GREEN_FALLBACK,
            _driver_green,
        )

        assert _driver_green(str(tmp_path)) == _DRIVER_GREEN_FALLBACK

    def test_repo_rotation_front_loads_unverified(self):
        # in the actual repo: every entry before the first driver-green
        # one must be non-green (the driver's budget is spent on
        # provenance gaps first)
        import meresco_rdf_spark.entry_queries as eq

        green = eq._driver_green()
        names = list(eq.QUERIES.keys())
        first_green = next(i for i, n in enumerate(names) if n in green)
        assert all(n not in green for n in names[:first_green])
        assert all(n in green for n in names[first_green:])

    def test_driver_green_tolerates_non_dict_json(self, tmp_path):
        import json

        from meresco_rdf_spark.entry_queries import _driver_green

        (tmp_path / "CORRECTNESS_r01.json").write_text(
            json.dumps(["not", "a", "dict"]))
        (tmp_path / "CORRECTNESS_r02.json").write_text(
            json.dumps({"x": {}}))
        assert _driver_green(str(tmp_path)) == {"x"}
