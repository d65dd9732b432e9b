"""functions/: XSD regex translation and lexical helpers."""

from pyspark.sql import functions as F

from xmlschema_spark.functions.lexical import (base64_binary_ok,
                                               boolean_lexical,
                                               hex_binary_ok, union_decode,
                                               ws_collapse, ws_replace)
from xmlschema_spark.functions.xsd_regex import translate_xsd_pattern


def test_translate_anchoring():
    assert translate_xsd_pattern("abc") == "^(?:abc)$"
    assert translate_xsd_pattern("abc", anchor=False) == "abc"


def test_translate_name_escapes():
    t = translate_xsd_pattern(r"\i\c*")
    assert t.startswith("^(?:[") and t.endswith("]*)$")
    assert "A-Za-z_" in t


def test_translate_class_subtraction():
    t = translate_xsd_pattern(r"[a-z-[aeiou]]+")
    assert "&&[^aeiou]" in t


def test_translated_patterns_match_in_spark(spark):
    df = spark.createDataFrame(
        [("x", "bcd"), ("y", "bce"), ("z", "bcda")], "k string, v string")
    pat = translate_xsd_pattern(r"[a-z-[aeiou]]{3}")
    got = {r.k for r in df.where(F.col("v").rlike(pat)).collect()}
    assert got == {"x"}   # 'bce' has a vowel; 'bcda' longer than 3


def test_ws_modes(spark):
    df = spark.createDataFrame([("a", "x\t y\n z ")], "k string, v string")
    row = df.select(ws_replace(F.col("v")).alias("r"),
                    ws_collapse(F.col("v")).alias("c")).collect()[0]
    assert row.r == "x  y  z "
    assert row.c == "x y z"


def test_boolean_lexical(spark):
    df = spark.createDataFrame(
        [("1",), ("true",), (" false ",), ("0",), ("yes",), (None,)],
        "v string")
    got = [r.b for r in df.select(boolean_lexical(F.col("v")).alias("b")).collect()]
    assert got == [True, True, False, False, None, None]


def test_hex_base64(spark):
    df = spark.createDataFrame(
        [("a", "deadBEEF", "aGVsbG8="), ("b", "xyz", "aGVsbG8"),
         ("c", "abc", "####")],
        "k string, hx string, b64 string")
    got = df.select("k", hex_binary_ok(F.col("hx")).alias("h"),
                    base64_binary_ok(F.col("b64")).alias("b")).collect()
    by = {r.k: (r.h, r.b) for r in got}
    assert by["a"] == (True, True)
    assert by["b"][0] is False       # xyz not hex
    assert by["c"] == (False, False)


def test_union_decode_struct(spark):
    df = spark.createDataFrame([("5",), ("2.5",), ("true",), ("pear",)],
                               "v string")
    got = [r.d for r in df.select(
        union_decode(F.col("v"), ["bigint", "double", "boolean"]).alias("d")
    ).collect()]
    assert got[0]["member"] == "bigint" and got[0]["value"] == "5"
    assert got[1]["member"] == "double"
    assert got[2]["member"] == "boolean"
    assert got[3] is None            # no member matched
