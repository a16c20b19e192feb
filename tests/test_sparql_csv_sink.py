"""W3C SPARQL 1.1 Results CSV/TSV encoders (sinks/sparql_csv_sink.py):
format conformance per https://www.w3.org/TR/sparql11-results-csv-tsv/
— term syntax, RFC 4180 quoting, backslash escapes, unbound fields,
bare numeric aggregates."""

from meresco_rdf_spark.sinks.sparql_csv_sink import (
    csv_header,
    encode_csv,
    encode_tsv,
    results_csv,
    results_tsv,
    tsv_header,
)


def sol(spark, rows):
    """A solution frame with one full variable ``x`` and its
    companions, matching sparql_select's projection shape."""
    return spark.createDataFrame(
        rows, "x string, x_kind string, x_lang string")


def lines(frame):
    return [r[0] for r in frame.collect()]


def test_csv_terms_are_raw_strings(spark):
    df = sol(spark, [("http://ex/a", "uri", None),
                     ("plain value", "literal", "en"),
                     ("_:b0", "bnode", None)])
    assert sorted(lines(encode_csv(df))) == [
        "_:b0", "http://ex/a", "plain value"]


def test_csv_rfc4180_quoting(spark):
    df = sol(spark, [('say "hi"', "literal", None),
                     ("a,b", "literal", None),
                     ("two\nlines", "literal", None),
                     ("safe", "literal", None)])
    got = sorted(lines(encode_csv(df)))
    assert '"a,b"' in got
    assert '"say ""hi"""' in got
    assert '"two\nlines"' in got
    assert "safe" in got


def test_csv_unbound_is_empty_field(spark):
    df = spark.createDataFrame(
        [("http://ex/a", "uri", None, None, None, None)],
        "x string, x_kind string, x_lang string, "
        "y string, y_kind string, y_lang string")
    assert lines(encode_csv(df)) == ["http://ex/a,"]


def test_csv_document_has_header_and_crlf(spark):
    df = sol(spark, [("v", "literal", None)])
    assert results_csv(df) == "x\r\nv\r\n"
    assert csv_header(["a", "b"]) == "a,b"


def test_tsv_term_syntax(spark):
    df = sol(spark, [("http://ex/a", "uri", None),
                     ("hello", "literal", None),
                     ("hallo", "literal", "nl"),
                     ("_:b0", "bnode", None)])
    assert sorted(lines(encode_tsv(df))) == [
        '"hallo"@nl', '"hello"', "<http://ex/a>", "_:b0"]


def test_tsv_backslash_escapes(spark):
    df = sol(spark, [('a"b', "literal", None),
                     ("tab\there", "literal", None),
                     ("back\\slash", "literal", None),
                     ("nl\nhere", "literal", None)])
    got = sorted(lines(encode_tsv(df)))
    assert '"a\\"b"' in got
    assert '"tab\\there"' in got
    assert '"back\\\\slash"' in got
    assert '"nl\\nhere"' in got


def test_tsv_unbound_and_multi_column(spark):
    df = spark.createDataFrame(
        [("http://ex/a", "uri", None, None, None, None),
         ("http://ex/b", "uri", None, "lbl", "literal", "en")],
        "x string, x_kind string, x_lang string, "
        "y string, y_kind string, y_lang string")
    assert sorted(lines(encode_tsv(df))) == [
        '<http://ex/a>\t', '<http://ex/b>\t"lbl"@en']


def test_tsv_numeric_aggregate_bare(spark):
    df = spark.createDataFrame([("http://ex/a", "uri", None, 3)],
                               "x string, x_kind string, x_lang string, "
                               "n bigint")
    assert lines(encode_tsv(df)) == ["<http://ex/a>\t3"]


def test_tsv_string_scalar_is_plain_literal(spark):
    df = spark.createDataFrame([("k", "grp")], "k string, s string")
    # no companion columns at all: both are scalar; strings quote
    assert lines(encode_tsv(df)) == ['"k"\t"grp"']


def test_tsv_document_and_header(spark):
    df = sol(spark, [("v", "literal", None)])
    assert results_tsv(df) == "?x\n\"v\"\n"
    assert tsv_header(["a", "b"]) == "?a\t?b"


# --------------------------------------------------------------------------
# XML results format (sinks/sparql_xml_sink.py)
# --------------------------------------------------------------------------

from meresco_rdf_spark.sinks.sparql_xml_sink import (  # noqa: E402
    XML_EPILOG,
    boolean_xml,
    encode_xml,
    results_xml,
    xml_prolog,
)


def test_xml_term_kinds(spark):
    df = sol(spark, [("http://ex/a", "uri", None),
                     ("hello", "literal", None),
                     ("bonjour", "literal", "fr"),
                     ("_:b0", "bnode", None)])
    got = sorted(lines(encode_xml(df)))
    assert ('<result><binding name="x"><uri>http://ex/a</uri>'
            "</binding></result>") in got
    assert ('<result><binding name="x"><literal>hello</literal>'
            "</binding></result>") in got
    assert ('<result><binding name="x"><literal xml:lang="fr">bonjour'
            "</literal></binding></result>") in got
    assert ('<result><binding name="x"><bnode>_:b0</bnode>'
            "</binding></result>") in got


def test_xml_escapes_markup(spark):
    df = sol(spark, [("a <b> & c", "literal", None)])
    assert lines(encode_xml(df)) == [
        '<result><binding name="x"><literal>a &lt;b&gt; &amp; c'
        "</literal></binding></result>"]


def test_xml_unbound_binding_omitted(spark):
    df = spark.createDataFrame(
        [("http://ex/a", "uri", None, None, None, None)],
        "x string, x_kind string, x_lang string, "
        "y string, y_kind string, y_lang string")
    assert lines(encode_xml(df)) == [
        '<result><binding name="x"><uri>http://ex/a</uri>'
        "</binding></result>"]


def test_xml_scalar_aggregate_is_plain_literal(spark):
    df = spark.createDataFrame([("g", 3)], "k string, n bigint")
    assert lines(encode_xml(df)) == [
        '<result><binding name="k"><literal>g</literal></binding>'
        '<binding name="n"><literal>3</literal></binding></result>']


def test_xml_document_parses_and_roundtrips(spark):
    from xml.etree import ElementTree as etree

    df = spark.createDataFrame(
        [("http://ex/a", "uri", None, "A <&>", "literal", "en"),
         ("_:b", "bnode", None, None, None, None)],
        "x string, x_kind string, x_lang string, "
        "y string, y_kind string, y_lang string")
    doc = etree.fromstring(results_xml(df))
    ns = {"s": "http://www.w3.org/2005/sparql-results#"}
    assert [v.get("name") for v in doc.findall(".//s:variable", ns)] == [
        "x", "y"]
    results = doc.findall(".//s:result", ns)
    assert len(results) == 2
    lits = doc.findall(".//s:literal", ns)
    assert [l.text for l in lits] == ["A <&>"]
    assert lits[0].get(
        "{http://www.w3.org/XML/1998/namespace}lang") == "en"
    # unbound y on the bnode row: that result has exactly one binding
    by_count = sorted(len(r.findall("s:binding", ns)) for r in results)
    assert by_count == [1, 2]
    assert results_xml(df).endswith(XML_EPILOG)
    assert xml_prolog(["a"]).startswith('<?xml version="1.0"?>')


def test_xml_boolean_document():
    assert "<boolean>true</boolean>" in boolean_xml(True)
    assert "<boolean>false</boolean>" in boolean_xml(False)


def test_json_boolean_document():
    import json

    from meresco_rdf_spark.sinks.sparql_json_sink import boolean_document

    assert json.loads(boolean_document(True)) == {"head": {},
                                                  "boolean": True}
    assert json.loads(boolean_document(False))["boolean"] is False
