"""REQUIRED element wildcards (xs:any with effective minOccurs>0) in
the record engine — AttrWildcardSpec.min_occurs.

Reference: the wildcard participates in the group's occurrence check
like any particle (validators/groups.py model visitors); an instance
whose content provides no wildcard-matched child where minOccurs>0 is
invalid. Tabular projection: extra struct fields are the wildcard's
children, presence = non-NULL, so the check is one codegen predicate —
at least one ADMITTED (namespace constraint + notQName) extra field is
non-null per scope instance, `forall` across record arrays. The bound
is always >=1, the sound relaxation of minOccurs>1 (same-named
children collapse onto one field). Previously this shape raised
_NotRecord and fell back to the tags_column content-model path."""

import pytest

from xmlschema_spark import validate
from xmlschema_spark.sources.xsd_export import spec_to_xsd
from xmlschema_spark.sources.xsd_import import spec_from_xsd
from xmlschema_spark.specs import (AttrWildcardSpec, ColumnSpec,
                                   RecordArraySpec, TableSpec)

XS = 'xmlns:xs="http://www.w3.org/2001/XMLSchema"'


def _wc(path, **kw):
    base = dict(path=path, kind="element", process="skip",
                namespace=["##any"], min_occurs=1)
    base.update(kw)
    return AttrWildcardSpec(**base)


def _viols(spark, df, spec):
    return sorted((r.row_key, r.constraint)
                  for r in validate(df, spec).violations.collect())


def test_row_level_required(spark):
    spec = TableSpec(name="t", key_column="rid",
                     columns=[ColumnSpec("note", "string")],
                     attr_wildcards=[_wc("")])
    df = spark.createDataFrame(
        [("ok", "n", "x"), ("bad", "n", None)],
        "rid string, note string, extra string")
    assert _viols(spark, df, spec) == [("bad", "wildcard:required:<row>")]


def test_row_level_no_extra_columns_all_violate(spark):
    spec = TableSpec(name="t", key_column="rid",
                     columns=[ColumnSpec("note", "string")],
                     attr_wildcards=[_wc("")])
    df = spark.createDataFrame([("r1", "n"), ("r2", "m")],
                               "rid string, note string")
    assert _viols(spark, df, spec) == [
        ("r1", "wildcard:required:<row>"),
        ("r2", "wildcard:required:<row>")]


def test_nested_struct_required_and_absent_scope_vacuous(spark):
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("box.tag", "string", parent="box")],
        attr_wildcards=[_wc("box")])
    df = spark.createDataFrame(
        [("ok", ("t", "x")), ("bad", ("t", None)), ("absent", None)],
        "rid string, box struct<tag string, extra string>")
    assert _viols(spark, df, spec) == [("bad", "wildcard:required:box")]


def test_namespace_constraint_gates_satisfaction(spark):
    """A non-admitted extra field never satisfies the requirement."""
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("box.tag", "string", parent="box")],
        attr_wildcards=[_wc("box", namespace=["urn:x"],
                            target_ns="urn:t")])
    df = spark.createDataFrame(
        [("ok", ("t", "v", None)), ("bad", ("t", None, "v"))],
        "rid string, box struct<tag string, `{urn:x}q` string, "
        "plain string>")
    got = _viols(spark, df, spec)
    # 'plain' is outside urn:x: a namespace violation row plus the
    # unsatisfied requirement for 'bad'
    assert ("bad", "wildcard:required:box") in got
    assert ("ok", "wildcard:required:box") not in got


def test_not_qname_excluded_field_does_not_satisfy(spark):
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("box.tag", "string", parent="box")],
        attr_wildcards=[_wc("box", not_qname=["ban"])])
    df = spark.createDataFrame(
        [("bad", ("t", "v", None)), ("ok", ("t", "v", "w"))],
        "rid string, box struct<tag string, ban string, free string>")
    got = _viols(spark, df, spec)
    assert ("bad", "wildcard:required:box") in got
    assert ("ok", "wildcard:required:box") not in got


def test_record_array_required_per_element(spark):
    """Across a record array the requirement applies to EVERY element
    instance (forall)."""
    spec = TableSpec(
        name="t", key_column="rid",
        record_arrays=[RecordArraySpec(
            name="items",
            fields=[ColumnSpec("items.sku", "string", parent="items")])],
        attr_wildcards=[_wc("items")])
    df = spark.createDataFrame(
        [("ok", [("a", "x"), ("b", "y")]),
         ("bad", [("a", "x"), ("b", None)]),
         ("empty_ok", []),
         ("null_ok", None)],
        "rid string, items array<struct<sku string, extra string>>")
    got = _viols(spark, df, spec)
    assert [k for k, c in got if c == "wildcard:required:items"] \
        == ["bad"]


def test_importer_required_any_no_fallback(spark):
    """xs:any minOccurs=1 inside a record type imports FLAT (no
    tags_column fallback) and enforces presence per row."""
    text = (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            '<xs:sequence><xs:element name="box" minOccurs="0">'
            '<xs:complexType><xs:sequence>'
            '<xs:element name="note" type="xs:string" minOccurs="0"/>'
            '<xs:any minOccurs="1" maxOccurs="unbounded" '
            'processContents="skip"/>'
            '</xs:sequence></xs:complexType></xs:element>'
            '</xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')
    spec = spec_from_xsd(text, key_column="rid")
    assert not spec.content_models          # flat import, no fallback
    ws = [w for w in spec.attr_wildcards if w.path == "box"]
    assert len(ws) == 1 and ws[0].min_occurs == 1
    df = spark.createDataFrame(
        [("ok", ("n", "x")), ("bad", ("n", None)), ("absent", None)],
        "rid string, box struct<note string, extra string>")
    got = _viols(spark, df, spec)
    assert [k for k, c in got if c == "wildcard:required:box"] \
        == ["bad"]


def test_importer_row_level_required_any(spark):
    text = (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            '<xs:sequence>'
            '<xs:element name="note" type="xs:string" minOccurs="0"/>'
            '<xs:any minOccurs="1" processContents="lax"/>'
            '</xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')
    spec = spec_from_xsd(text, key_column="rid")
    ws = [w for w in spec.attr_wildcards if w.path == ""]
    assert len(ws) == 1 and ws[0].min_occurs == 1
    df = spark.createDataFrame(
        [("ok", "n", "x"), ("bad", "n", None)],
        "rid string, note string, free string")
    assert _viols(spark, df, spec) == [("bad", "wildcard:required:<row>")]


def test_optional_any_unchanged(spark):
    """minOccurs=0 wildcards stay metadata-only (no required rows)."""
    text = (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            '<xs:sequence>'
            '<xs:any minOccurs="0" processContents="skip"/>'
            '</xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')
    spec = spec_from_xsd(text, key_column="rid")
    assert all(w.min_occurs == 0 for w in spec.attr_wildcards)
    df = spark.createDataFrame([("r1",)], "rid string")
    assert _viols(spark, df, spec) == []


def test_group_multiplier_makes_wildcard_required(spark):
    """An optional-looking xs:any under a required repeated group has
    effective minOccurs = group lo * own lo."""
    text = (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            '<xs:sequence minOccurs="2" maxOccurs="2">'
            '<xs:element name="a" type="xs:string"/>'
            '<xs:any minOccurs="1" processContents="skip"/>'
            '</xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')
    spec = spec_from_xsd(text, key_column="rid")
    ws = [w for w in spec.attr_wildcards if w.path == ""]
    assert ws and ws[0].min_occurs == 1


def test_export_round_trip_required(spark):
    text = (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            '<xs:sequence><xs:element name="box" minOccurs="0">'
            '<xs:complexType><xs:sequence>'
            '<xs:element name="note" type="xs:string" minOccurs="0"/>'
            '<xs:any minOccurs="1" maxOccurs="unbounded" '
            'processContents="skip"/>'
            '</xs:sequence></xs:complexType></xs:element>'
            '</xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')
    spec = spec_from_xsd(text, key_column="rid")
    out = spec_to_xsd(spec)
    assert 'minOccurs="1"' in out
    spec2 = spec_from_xsd(out, key_column="rid")
    df = spark.createDataFrame(
        [("ok", ("n", "x")), ("bad", ("n", None))],
        "rid string, box struct<note string, extra string>")
    assert _viols(spark, df, spec) == _viols(spark, df, spec2)
    assert ("bad", "wildcard:required:box") in _viols(spark, df, spec)


def test_strict_required_still_reports_strict_rows(spark):
    """processContents='strict' admission rows coexist with the
    required check: the extra field satisfies presence but is
    strict-rejected for having no declaration."""
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("box.tag", "string", parent="box")],
        attr_wildcards=[_wc("box", process="strict")])
    df = spark.createDataFrame(
        [("r1", ("t", "x"))],
        "rid string, box struct<tag string, extra string>")
    got = _viols(spark, df, spec)
    assert ("<schema>", "wildcard:strict:box.extra") in got
    assert not any(c == "wildcard:required:box" for _, c in got)
