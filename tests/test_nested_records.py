"""Nested-record columns: ColumnSpec with a dotted name + parent guard
validates struct fields in place (reference: complex child elements,
complex_types.py content mapping — a record-shaped child maps to a
struct column instead of a content-model tag sequence)."""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark import ColumnSpec, TableSpec, UniqueSpec, validate
from xmlschema_spark.runner import (_has_column, apply_defaults,
                                    schema_violations)


@pytest.fixture(scope="module")
def nested_df(spark):
    return spark.createDataFrame(
        [("r1", ("alice", "42")),
         ("r2", ("bob", "-5")),          # facet violation inside struct
         ("r3", (None, "7")),            # required nested field missing
         ("r4", None)],                  # whole optional record absent
        "rid string, owner struct<name string, quota string>")


def _spec(**over):
    base = dict(
        name="t", key_column="rid",
        columns=[
            ColumnSpec("owner.name", "string", nullable=False,
                       parent="owner"),
            ColumnSpec("owner.quota", "int", min_inclusive=0,
                       parent="owner"),
        ])
    base.update(over)
    return TableSpec(**base)


def test_nested_facets_and_guarded_required(nested_df):
    got = sorted((r.row_key, r.constraint)
                 for r in validate(nested_df, _spec()).violations.collect())
    # r2: quota < 0; r3: required owner.name absent while owner present;
    # r4: owner itself NULL -> NO violations (parent guard)
    assert got == [("r2", "facet:minInclusive:owner.quota"),
                   ("r3", "required:owner.name")]


def test_unguarded_nested_required_fires_on_absent_parent(nested_df):
    spec = _spec(columns=[ColumnSpec("owner.name", "string",
                                     nullable=False)])
    got = {r.row_key for r in
           validate(nested_df, spec).violations.collect()}
    assert got == {"r3", "r4"}


def test_has_column_walks_structs(nested_df):
    assert _has_column(nested_df, "owner.name")
    assert _has_column(nested_df, "owner")
    assert not _has_column(nested_df, "owner.nope")
    assert not _has_column(nested_df, "owner.name.deeper")
    assert not _has_column(nested_df, "nope.name")


def test_schema_violations_nested(spark, nested_df):
    spec = _spec(columns=[
        ColumnSpec("owner.name", "string", parent="owner"),
        ColumnSpec("owner.missing", "string", parent="owner"),
    ])
    rows = schema_violations(nested_df, spec).collect()
    assert [r.constraint for r in rows] == ["schema:missing:owner.missing"]
    # the struct column itself is NOT "unexpected": the dotted declared
    # names imply their top-level prefix


def test_nested_default_fill(spark, nested_df):
    spec = _spec(columns=[
        ColumnSpec("owner.name", "string", default="anon",
                   parent="owner"),
        ColumnSpec("owner.quota", "int", parent="owner"),
    ])
    out = {r.rid: r.owner for r in
           apply_defaults(nested_df, spec).collect()}
    assert out["r3"].name == "anon"
    assert out["r1"].name == "alice"
    assert out["r4"] is None           # absent record stays absent


def test_unique_over_nested_selector(spark):
    df = spark.createDataFrame(
        [("a", ("x",)), ("b", ("x",)), ("c", ("y",))],
        "rid string, meta struct<tag string>")
    spec = TableSpec(name="t", key_column="rid", columns=[],
                     uniques=[UniqueSpec("u", ["meta/tag"])],
                     allow_extra_columns=True)
    got = sorted(r.row_key for r in
                 validate(df, spec).violations.collect())
    assert got == ["a", "b"]
