"""SPARQL-JSON result-binding decode (distributed ``fromDict``).

The reference's legacy flat API decodes per-binding dicts
``{"type": "uri"|"literal"|"bnode", "value": ..., "xml:lang": ...}``
(``rdf/uri.py:35-36``, ``rdf/literal.py:35-38``, ``rdf/bnode.py:34-35``).
Here: a JSON string column -> typed (obj_value, obj_kind, obj_lang)
columns, entirely JVM-side via ``from_json`` — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BINDING_SCHEMA = "struct<type: string, value: string, `xml:lang`: string>"


def decode_bindings(df: DataFrame, json_col: str = "binding",
                    prefix: str = "obj") -> DataFrame:
    parsed = F.from_json(F.col(json_col), BINDING_SCHEMA)
    kind: Column = F.when(
        parsed["type"] == "typed-literal", F.lit("literal")
    ).otherwise(parsed["type"])
    return (
        df.withColumn("%s_value" % prefix, parsed["value"])
        .withColumn("%s_kind" % prefix, kind)
        .withColumn(
            "%s_lang" % prefix,
            F.when(kind == "literal", parsed["xml:lang"]).otherwise(F.lit(None)),
        )
    )
