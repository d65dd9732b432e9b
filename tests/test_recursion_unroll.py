"""Bounded recursion unrolling (spec_from_xsd unroll_recursion=k).

The reference validates recursive types to unbounded depth over XML
trees (validators/groups.py iter_model); a Spark schema is finite-depth
by construction. unroll_recursion=k materializes k recursive re-entries
of a type as nested struct/array levels and records a CUT path beyond
them (TableSpec.recursion_cuts): content deeper than the unrolled depth
is a 'recursion:depth:<path>' violation when the physical schema can
carry it, and vacuously valid when it cannot. Default (0) keeps the
content-model fallback; REQUIRED recursion admits no finite instance
and always falls back."""

import pytest

from xmlschema_spark import validate
from xmlschema_spark.sources.xsd_import import spec_from_xsd

XS = 'xmlns:xs="http://www.w3.org/2001/XMLSchema"'

LIST_XSD = f"""<xs:schema {XS}>
  <xs:complexType name="TNode">
    <xs:sequence>
      <xs:element name="next" type="TNode" minOccurs="0"/>
    </xs:sequence>
    <xs:attribute name="val" type="xs:int"/>
  </xs:complexType>
  <xs:element name="row">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="next" type="TNode" minOccurs="0"/>
      </xs:sequence>
      <xs:attribute name="rid" type="xs:string" use="required"/>
    </xs:complexType>
  </xs:element>
</xs:schema>"""

TREE_XSD = f"""<xs:schema {XS}>
  <xs:complexType name="TTree">
    <xs:sequence>
      <xs:element name="kids" type="TTree" minOccurs="0"
                  maxOccurs="unbounded"/>
    </xs:sequence>
    <xs:attribute name="v" type="xs:int"/>
  </xs:complexType>
  <xs:element name="row">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="kids" type="TTree" minOccurs="0"
                    maxOccurs="unbounded"/>
      </xs:sequence>
      <xs:attribute name="rid" type="xs:string" use="required"/>
    </xs:complexType>
  </xs:element>
</xs:schema>"""


def test_default_recursive_type_still_falls_back():
    with pytest.raises(ValueError, match="tags_column"):
        spec_from_xsd(LIST_XSD, key_column="rid")


def test_unroll_materializes_levels_and_records_cut():
    spec = spec_from_xsd(LIST_XSD, key_column="rid",
                         unroll_recursion=1)
    by_name = {c.name for c in spec.columns}
    assert {"next.val", "next.next.val"} <= by_name
    assert not any(n.startswith("next.next.next.") for n in by_name)
    assert spec.recursion_cuts == ["next.next.next"]


def test_cut_field_absent_is_vacuously_valid(spark):
    spec = spec_from_xsd(LIST_XSD, key_column="rid",
                         unroll_recursion=1)
    df = spark.createDataFrame(
        [("r1", ("1", ("2",))), ("r2", None)],
        "rid string, next struct<val string, "
        "next struct<val string>>")
    assert validate(df, spec).violations.count() == 0


def test_content_beyond_cut_violates(spark):
    spec = spec_from_xsd(LIST_XSD, key_column="rid",
                         unroll_recursion=1)
    df = spark.createDataFrame(
        [("r1", ("1", ("2", None))),
         ("r2", ("1", ("2", ("3",))))],       # depth 3 > unrolled 2
        "rid string, next struct<val string, next struct<val string, "
        "next struct<val string>>>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert got == [("r2", "recursion:depth:next.next.next")]


def test_required_recursion_always_falls_back():
    with pytest.raises(ValueError, match="tags_column"):
        spec_from_xsd(LIST_XSD.replace(
            '<xs:element name="next" type="TNode" minOccurs="0"/>',
            '<xs:element name="next" type="TNode"/>', 1),
            key_column="rid", unroll_recursion=3)


def test_tree_recursion_cut_inside_record_array(spark):
    spec = spec_from_xsd(TREE_XSD, key_column="rid",
                         unroll_recursion=1)
    ras = {r.name: r for r in spec.record_arrays}
    assert "kids" in ras
    grand = {g.name: g for g in ras["kids"].nested}
    assert grand["kids.kids"].recursion_cuts == ["kids.kids.kids"]
    df = spark.createDataFrame(
        [("r1", [("1", [("2", [])])]),       # depth 2, empty level 3
         ("r2", [("1", [("2", [("3", None)])])])],   # depth 3: cut
        "rid string, kids array<struct<v string, kids array<struct<"
        "v string, kids array<struct<v string, kids string>>>>>>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert got == [("r2", "recursion:depth:kids.kids.kids")]


def test_cut_spec_survives_json_round_trip():
    from xmlschema_spark.specs import TableSpec
    spec = spec_from_xsd(TREE_XSD, key_column="rid",
                         unroll_recursion=1)
    spec2 = TableSpec.from_json(spec.to_json())
    ras2 = {r.name: r for r in spec2.record_arrays}
    assert {g.name: g.recursion_cuts for g in ras2["kids"].nested} \
        == {"kids.kids": ["kids.kids.kids"]}


def test_cut_spec_is_not_exportable():
    from xmlschema_spark.sources.xsd_export import spec_to_xsd
    spec = spec_from_xsd(LIST_XSD, key_column="rid",
                         unroll_recursion=1)
    with pytest.raises(ValueError, match="recursion"):
        spec_to_xsd(spec)
    assert "omitted" in spec_to_xsd(spec, lossy=True)


def test_cut_check_plan_no_shuffle(spark):
    """The recursion-cut check is a row-local filter over the existing
    scan — zero Exchange at any scale."""
    spec = spec_from_xsd(LIST_XSD, key_column="rid",
                         unroll_recursion=1)
    df = spark.createDataFrame(
        [("r1", ("1", ("2", ("3",))))],
        "rid string, next struct<val string, next struct<val string, "
        "next struct<val string>>>")
    from xmlschema_spark.runner import _recursion_cut_parts
    parts = _recursion_cut_parts(df, spec)
    assert len(parts) == 1
    p = parts[0]._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p[:1500]


def test_recursion_cut_streaming_parity(spark, tmp_path):
    """Structured Streaming applies the same cut check per micro-batch:
    stream violations == batch violations for a cut spec."""
    from xmlschema_spark.streaming.validate_stream import validate_stream
    spec = spec_from_xsd(LIST_XSD, key_column="rid",
                         unroll_recursion=1)
    df = spark.createDataFrame(
        [("r1", ("1", ("2", None))),
         ("r2", ("1", ("2", ("3",)))),
         ("r3", None)],
        "rid string, next struct<val string, next struct<val string, "
        "next struct<val string>>>")
    src = str(tmp_path / "src")
    df.write.parquet(src)
    batch = sorted((r.row_key, r.constraint)
                   for r in validate(df, spec).violations.collect())
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = validate_stream(stream, spec, str(tmp_path / "chk"),
                        str(tmp_path / "out"))
    q.awaitTermination(120)
    got = sorted((r.row_key, r.constraint) for r in spark.read.parquet(
        str(tmp_path / "out" / "violations")).collect())
    assert got == batch
    assert ("r2", "recursion:depth:next.next.next") in got
