"""Conditional type assignment, schema/wildcard checks, defaults,
extra-validator hook."""

from pyspark.sql import functions as F

from xmlschema_spark import (ColumnSpec, ConditionalSpec, TableSpec,
                             apply_defaults, compile_plan, schema_violations,
                             validate)
from xmlschema_spark.operators.row_checks import row_violations


def test_conditional_type_assignment(spark):
    spec = TableSpec(
        name="t", key_column="k",
        conditionals=[
            ConditionalSpec("img", "fmt = 'png'",
                            [ColumnSpec("v", "int", max_inclusive=10)]),
            ConditionalSpec("vid", "fmt = 'mp4'",
                            [ColumnSpec("v", "int", max_inclusive=100)]),
        ])
    df = spark.createDataFrame(
        [("a", "png", 5), ("b", "png", 50), ("c", "mp4", 50),
         ("d", "mp4", 500), ("e", "txt", 500)],
        "k string, fmt string, v int")
    got = {(r.row_key, r.constraint) for r in
           row_violations(df, compile_plan(spec)).collect()}
    assert got == {("b", "cond:img:facet:maxInclusive:v"),
                   ("d", "cond:vid:facet:maxInclusive:v")}


def test_schema_violations_wildcard(spark):
    spec = TableSpec(name="t", key_column="k",
                     columns=[ColumnSpec("a", "int"), ColumnSpec("b", "int")],
                     allow_extra_columns=False)
    df = spark.createDataFrame([("x", 1, "zzz")], "k string, a int, extra string")
    got = {r.constraint for r in schema_violations(df, spec).collect()}
    assert got == {"schema:missing:b", "schema:unexpected:extra"}
    spec.allow_extra_columns = True
    got = {r.constraint for r in schema_violations(df, spec).collect()}
    assert got == {"schema:missing:b"}   # wildcard tolerates extras


def test_apply_defaults(spark):
    spec = TableSpec(name="t", key_column="k",
                     columns=[ColumnSpec("v", "int", default=7)])
    df = spark.createDataFrame([("a", None), ("b", 3)], "k string, v int")
    got = {r.k: r.v for r in apply_defaults(df, spec).collect()}
    assert got == {"a": 7, "b": 3}


def test_extra_validator_hook(spark):
    spec = TableSpec(name="t", key_column="k",
                     columns=[ColumnSpec("v", "int")])

    def my_check(df):
        return df.where(F.col("v") == 13).select(
            F.col("k").cast("string").alias("row_key"),
            F.lit(0).cast("bigint").alias("part_key"),
            F.lit("extra:unlucky").alias("constraint"),
            F.lit("13 is not allowed here").alias("reason"),
            F.col("v").cast("string").alias("value"),
            F.lit(1).cast("bigint").alias("occurs"))

    df = spark.createDataFrame([("a", 13), ("b", 1)], "k string, v int")
    res = validate(df, spec, extra_validators=[my_check])
    got = {(r.row_key, r.constraint) for r in res.violations.collect()}
    assert got == {("a", "extra:unlucky")}


def test_missing_declared_column_raises(spark):
    import pytest
    spec = TableSpec(name="t", key_column="k",
                     columns=[ColumnSpec("nope", "int")])
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(KeyError):
        validate(df, spec)
