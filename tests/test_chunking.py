"""Fixed-window chunking (textops/chunking.py)."""

import pytest

from meresco_rdf_spark.textops.chunking import chunk_documents

SCHEMA = "doc_id long, text string"


def docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def rows_of(df):
    return {(r.doc, r.chunk_id): (r.n_tokens, r.chunk) for r in df.collect()}


def test_exact_windows_no_overlap(spark):
    got = rows_of(chunk_documents(
        docs(spark, [(1, "a b c d e f")]), max_tokens=3))
    assert got == {(1, 0): (3, "a b c"), (1, 1): (3, "d e f")}


def test_short_tail_window(spark):
    got = rows_of(chunk_documents(
        docs(spark, [(1, "a b c d e")]), max_tokens=3))
    assert got == {(1, 0): (3, "a b c"), (1, 1): (2, "d e")}


def test_overlap_slides_by_stride(spark):
    got = rows_of(chunk_documents(
        docs(spark, [(1, "a b c d e")]), max_tokens=3, overlap=1))
    assert got == {(1, 0): (3, "a b c"), (1, 1): (3, "c d e"),
                   (1, 2): (1, "e")}


def test_doc_shorter_than_window(spark):
    got = rows_of(chunk_documents(
        docs(spark, [(1, "only two")]), max_tokens=10))
    assert got == {(1, 0): (2, "only two")}


def test_empty_and_whitespace_docs_yield_nothing(spark):
    got = chunk_documents(
        docs(spark, [(1, ""), (2, "   "), (3, "x")]), max_tokens=4)
    assert rows_of(got) == {(3, 0): (1, "x")}


def test_multi_whitespace_normalized(spark):
    got = rows_of(chunk_documents(
        docs(spark, [(1, "a   b\tc")]), max_tokens=2))
    assert got == {(1, 0): (2, "a b"), (1, 1): (1, "c")}


def test_bad_params_raise(spark):
    d = docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        chunk_documents(d, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(d, max_tokens=3, overlap=3)
