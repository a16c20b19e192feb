

class TestEdgeCut:
    def _t(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj_value string, "
            "obj_kind string, obj_lang string, subj_bucket int")

    def test_counts_cut_and_local_edges(self, spark):
        from meresco_rdf_spark.kg.materialize import edge_cut_stats
        rows = [
            ("a", "p", "b", "uri", None, 0),   # a(0) -> b(0): local
            ("b", "p", "c", "uri", None, 0),   # b(0) -> c(1): cut
            ("c", "p", "a", "uri", None, 1),   # c(1) -> a(0): cut
            ("a", "q", "lit", "literal", None, 0),  # not an edge
            ("a", "p", "zz", "uri", None, 0),  # zz never a subject
        ]
        got = edge_cut_stats(self._t(spark, rows)).collect()[0]
        assert (got.n_edges, got.cut_edges) == (3, 2)
        assert got.cut_ppm == 2 * 1_000_000 // 3

    def test_all_local_is_zero_ppm(self, spark):
        from meresco_rdf_spark.kg.materialize import edge_cut_stats
        rows = [("a", "p", "b", "uri", None, 3),
                ("b", "p", "a", "uri", None, 3)]
        got = edge_cut_stats(self._t(spark, rows)).collect()[0]
        assert (got.n_edges, got.cut_edges, got.cut_ppm) == (2, 0, 0)

    def test_zero_traversable_edges_yields_defined_zeros(self, spark):
        # a corpus with no uri-object edge that resolves to a subject
        # must report (0, 0, 0), not a row of NULLs (sum over empty is
        # NULL; the ppm ratio would divide by zero)
        from meresco_rdf_spark.kg.materialize import edge_cut_stats
        rows = [("a", "q", "lit", "literal", None, 0),
                ("a", "p", "dangling", "uri", None, 0)]
        got = edge_cut_stats(self._t(spark, rows)).collect()[0]
        assert (got.n_edges, got.cut_edges, got.cut_ppm) == (0, 0, 0)
