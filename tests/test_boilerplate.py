"""Boilerplate line detection + stripping (textops/boilerplate.py)."""

import pytest
from pyspark.sql import functions as F

from meresco_rdf_spark.textops.boilerplate import (
    boilerplate_lines,
    strip_boilerplate,
)

SCHEMA = "doc_id long, source string, text string"


def docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


CORPUS = [
    (1, "a", "MENU\nalpha body one\nfooter"),
    (2, "a", "MENU\nbeta body two\nfooter"),
    (3, "a", "MENU\ngamma body three\nfooter"),
    (4, "a", "delta body four\nMENU"),
    # source b: MENU recurs but only in 1 of 2 docs (50%, not strictly
    # more) -> not boilerplate there
    (5, "b", "MENU\nb-one"),
    (6, "b", "b-two\nunique"),
]


def test_detects_frequent_lines_per_source(spark):
    got = {(r.group, r.line, r.n, r.n_docs)
           for r in boilerplate_lines(docs(spark, CORPUS)).collect()}
    assert got == {("a", "MENU", 4, 4), ("a", "footer", 3, 4)}


def test_threshold_is_strict_integer_compare(spark):
    # exactly 50% (2 of 4) must NOT qualify at max_doc_pct=50
    rows = [(1, "s", "half\nx1"), (2, "s", "half\nx2"),
            (3, "s", "x3"), (4, "s", "x4")]
    assert boilerplate_lines(docs(spark, rows)).count() == 0
    got = {r.line for r in boilerplate_lines(
        docs(spark, rows), max_doc_pct=49).collect()}
    assert got == {"half"}


def test_in_doc_repeats_count_once(spark):
    rows = [(1, "s", "dup\ndup\ndup\nbody"), (2, "s", "other")]
    # dup appears in 1 of 2 docs only -> not boilerplate
    assert boilerplate_lines(docs(spark, rows)).count() == 0


def test_min_docs_floor(spark):
    rows = [(1, "s", "only")]
    # 1 of 1 docs = 100% but min_docs=2 keeps singleton sources safe
    assert boilerplate_lines(docs(spark, rows)).count() == 0


def test_trim_normalization(spark):
    rows = [(1, "s", "  PAD  \na"), (2, "s", "PAD\nb"), (3, "s", "PAD\nc")]
    got = {r.line for r in boilerplate_lines(docs(spark, rows)).collect()}
    assert got == {"PAD"}


def test_strip_preserves_order_and_unlisted_sources(spark):
    out = {r.doc_id: r.text
           for r in strip_boilerplate(docs(spark, CORPUS)).collect()}
    assert out[1] == "alpha body one"
    assert out[4] == "delta body four"
    # source b untouched (no boilerplate detected there)
    assert out[5] == "MENU\nb-one"
    assert out[6] == "b-two\nunique"


def test_strip_keeps_empty_lines_and_untrimmed_content(spark):
    rows = [(1, "s", "BOIL\nkeep one\n\n  keep  padded  "),
            (2, "s", "BOIL\nx"), (3, "s", " BOIL \ny")]
    out = {r.doc_id: r.text for r in strip_boilerplate(docs(spark, rows)).collect()}
    # trimmed form matches -> all BOIL variants stripped; empty line and
    # inner padding survive verbatim
    assert out[1] == "keep one\n\n  keep  padded  "
    assert out[3] == "y"


def test_strip_with_precomputed_sample_detection(spark):
    sample = docs(spark, CORPUS[:3])
    boiler = boilerplate_lines(sample)
    out = {r.doc_id: r.text
           for r in strip_boilerplate(docs(spark, CORPUS),
                                      boiler=boiler).collect()}
    # detection on the sample found MENU+footer; applied corpus-wide
    assert out[4] == "delta body four"


def test_schema_preserved(spark):
    out = strip_boilerplate(docs(spark, CORPUS))
    assert out.columns == ["doc_id", "source", "text"]


def test_bad_pct_raises(spark):
    with pytest.raises(ValueError):
        boilerplate_lines(docs(spark, CORPUS), max_doc_pct=101)
