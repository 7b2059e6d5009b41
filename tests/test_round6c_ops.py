"""Units for the round-6 continuation (third session) operators: XML
source/sink, product quantization, and the survival/RFM analytics shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_xml_roundtrip_escaping_nulls_and_versioning(spark, tmp_path):
    """The XML sink/scan pair must survive markup-hostile values (&, <, >),
    preserve NULLs (absent element -> NULL), round-trip inferred types, and
    obey the S2 no-overwrite versioning contract."""
    from agent_data_wrangler_spark.sources.readers import read_xml
    from agent_data_wrangler_spark.sources.writers import write_versioned

    rows = [
        (1, "plain", 1.5),
        (2, 'needs <escaping> & "quotes"', None),
        (3, None, -0.25),
    ]
    df = spark.createDataFrame(rows, "id bigint, s string, v double")
    base = str(tmp_path / "out.xml")
    p1 = write_versioned(df, base, fmt="xml")
    back = read_xml(spark, p1)
    assert back.schema.simpleString() == "struct<id:bigint,s:string,v:double>"
    assert sorted(back.collect()) == sorted(df.collect())
    # versioned: second write lands in a NEW path, first is untouched
    p2 = write_versioned(df, base, fmt="xml")
    assert p2 != p1
    assert read_xml(spark, p1).count() == 3


def test_xml_explicit_schema_skips_inference(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from agent_data_wrangler_spark.sources.readers import read_xml
    from agent_data_wrangler_spark.sources.writers import write_versioned

    df = spark.createDataFrame([(7,), (9,)], "id bigint")
    p = write_versioned(df, str(tmp_path / "ids.xml"), fmt="xml")
    schema = StructType([StructField("id", LongType())])
    back = read_xml(spark, p, schema=schema)
    assert back.schema == schema
    assert {r.id for r in back.collect()} == {7, 9}
