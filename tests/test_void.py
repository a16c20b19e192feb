"""VoID dataset statistics (operators/void_stats.py)."""

from meresco_rdf_spark.operators.void_stats import (
    RDF_TYPE,
    VOID,
    void_description,
)

SCHEMA = ("subj string, pred string, obj_value string, obj_kind string, "
          "obj_lang string")

ROWS = [
    ("urn:a", RDF_TYPE, "urn:C1", "uri", None),
    ("urn:a", "urn:p", "urn:b", "uri", None),
    ("urn:b", RDF_TYPE, "urn:C1", "uri", None),
    ("_:x", RDF_TYPE, "urn:C2", "uri", None),
    ("_:x", "urn:p", "hello", "literal", "en"),
    ("urn:a", "urn:q", "urn:b", "uri", None),
]


def _desc(spark, rows=ROWS):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r.subj, r.pred, r.obj_value, r.obj_kind)
            for r in void_description(df).collect()}


def test_global_counts(spark):
    got = _desc(spark)
    ds = "urn:void:dataset"
    assert (ds, VOID + "triples", "6", "literal") in got
    assert (ds, VOID + "distinctSubjects", "3", "literal") in got
    assert (ds, VOID + "properties", "3", "literal") in got
    assert (ds, VOID + "classes", "2", "literal") in got
    # entities = distinct URI subjects (bnode _:x excluded)
    assert (ds, VOID + "entities", "2", "literal") in got


def test_property_partitions(spark):
    got = _desc(spark)
    # find the partition node for urn:p and check its triple count
    part = [s for (s, p, v, k) in got
            if p == VOID + "property" and v == "urn:p"][0]
    assert part.startswith("_:pp-")
    assert (part, VOID + "triples", "2", "literal") in got
    assert ("urn:void:dataset", VOID + "propertyPartition", part,
            "bnode") in got


def test_class_partitions_count_distinct_entities(spark):
    rows = ROWS + [("urn:a", RDF_TYPE, "urn:C1", "uri", None)]  # dup row
    got = _desc(spark, rows)
    part = [s for (s, p, v, k) in got
            if p == VOID + "class" and v == "urn:C1"][0]
    assert (part, VOID + "entities", "2", "literal") in got


def test_description_is_valid_triple_relation(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = void_description(df)
    assert out.columns == ["subj", "pred", "obj_value", "obj_kind",
                           "obj_lang"]
    kinds = {r.obj_kind for r in out.collect()}
    assert kinds <= {"literal", "uri", "bnode"}
