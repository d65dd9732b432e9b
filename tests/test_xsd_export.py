"""spec_to_xsd: TableSpec -> XSD text (sources/xsd_export.py), the
inverse of the importer. The contract is BEHAVIORAL round-trip: the
exported document re-imports to a spec that produces identical
violations on the same rows."""

import pytest

from xmlschema_spark import spec_from_xsd, spec_to_xsd, validate
from xmlschema_spark.specs import (AssertSpec, ColumnSpec, KeyrefSpec,
                                   TableSpec, UniqueSpec)


def _viol(spark, spec, rows, schema):
    df = spark.createDataFrame(rows, schema)
    refs = {spec.name: df} if spec.keyrefs else None
    res = validate(df, spec, refs=refs)
    return sorted(((r.row_key, r.constraint, r.value)
                   for r in res.violations.collect()),
                  key=lambda t: (t[0] or "", t[1], t[2] or ""))


def _roundtrip_equal(spark, spec, rows, schema, key_column):
    xsd = spec_to_xsd(spec)
    back = spec_from_xsd(xsd, key_column=key_column)
    a = _viol(spark, spec, rows, schema)
    b = _viol(spark, back, rows, schema)
    assert a == b, (a, b)
    assert a  # the fixture must actually exercise violations


def test_facets_roundtrip(spark):
    spec = TableSpec(name="t", key_column="rid", columns=[
        ColumnSpec("rid", "string", nullable=False),
        ColumnSpec("n", "xsd:int", min_inclusive="0",
                   max_exclusive="100"),
        ColumnSpec("z", "string", pattern=[r"[0-9]{5}"]),
        ColumnSpec("flag", "xsd:token", enum=["A", "N"]),
    ])
    _roundtrip_equal(spark, spec,
                     [("r1", "5", "55555", "A"),
                      ("r2", "100", "abc", "X"),
                      (None, "-1", "99999", "N")],
                     "rid string, n string, z string, flag string",
                     "rid")


def test_chain_union_list_roundtrip(spark):
    spec = TableSpec(
        name="t", key_column="rid",
        simple_types={
            "pct": ColumnSpec("pct", "xsd:decimal", min_inclusive="0"),
            "smallPct": ColumnSpec("smallPct", base="pct",
                                   max_exclusive="0.1")},
        columns=[
            ColumnSpec("rid", "string", nullable=False),
            ColumnSpec("d", base="smallPct"),
            ColumnSpec("toks", lexical_list=True, max_length=2,
                       item=ColumnSpec("toks", "xsd:NMTOKEN")),
            ColumnSpec("when", union_members=[
                ColumnSpec("when", "xsd:date"),
                ColumnSpec("when", "xsd:dateTime")]),
        ])
    _roundtrip_equal(spark, spec,
                     [("r1", "0.05", "a b", "2021-05-01"),
                      ("r2", "0.2", "a b c", "yesterday"),
                      ("r3", "1e2", "a,b", "2021-05-01T10:00:00")],
                     "rid string, d string, toks string, when string",
                     "rid")


def test_identities_and_arrays_roundtrip(spark):
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[
            ColumnSpec("rid", "string", nullable=False),
            ColumnSpec("tag", "array<string>", min_length=1,
                       max_length=2,
                       item=ColumnSpec("tag", "xsd:NCName")),
        ],
        uniques=[UniqueSpec("u_rid", ["rid"], is_key=True)],
        keyrefs=[KeyrefSpec("kr", ["rid"], ref_table="t",
                            ref_columns=["rid"])])
    xsd = spec_to_xsd(spec)
    back = spec_from_xsd(xsd, key_column="rid")
    assert [(u.name, u.is_key) for u in back.uniques] \
        == [("u_rid", True)]
    assert [(k.name, k.columns) for k in back.keyrefs] \
        == [("kr", ["rid"])]
    by = {c.name: c for c in back.columns}
    assert by["tag"].dtype == "array<string>"
    assert (by["tag"].min_length, by["tag"].max_length) == (1, 2)
    _roundtrip_equal(spark, spec,
                     [("r1", ["a"]), ("r1", ["b"]),
                      ("r3", ["a", "b", "c"]), ("r4", ["x:y"])],
                     "rid string, tag array<string>", "rid")


def test_pattern_groups_nest_as_steps(spark):
    """AND-of-OR pattern groups export as nested restriction steps and
    re-import as a chain with identical AND semantics."""
    spec = TableSpec(name="t", key_column="rid", columns=[
        ColumnSpec("rid", "string", nullable=False),
        ColumnSpec("v", "string", pattern=["[a-z]+", "[0-9]+"],
                   pattern_groups=[["[a-z0-9]{3}"]]),
    ])
    _roundtrip_equal(spark, spec,
                     [("r1", "abc"), ("r2", "123"), ("r3", "ab"),
                      ("r4", "ABC")],
                     "rid string, v string", "rid")


def test_unexportable_raises_and_lossy_reports():
    spec = TableSpec(name="t", key_column="rid",
                     columns=[ColumnSpec("rid", "string")],
                     asserts=[AssertSpec(name="a", expr="rid IS NOT NULL",
                                         columns=["rid"])])
    with pytest.raises(ValueError, match="no XSD rendering"):
        spec_to_xsd(spec)
    xsd = spec_to_xsd(spec, lossy=True)
    assert "omitted" in xsd and "table assert 'a'" in xsd
    # the lossy document still re-imports
    back = spec_from_xsd(xsd, key_column="rid")
    assert back.name == "t" and not back.asserts


def test_cross_table_keyref_unexportable():
    spec = TableSpec(name="orders", key_column="o_orderkey",
                     columns=[ColumnSpec("o_custkey", "bigint")],
                     keyrefs=[KeyrefSpec("fk", ["o_custkey"],
                                         ref_table="customer",
                                         ref_columns=["c_custkey"])])
    with pytest.raises(ValueError, match="keyref 'fk' into table"):
        spec_to_xsd(spec)
    assert "omitted" in spec_to_xsd(spec, lossy=True)


def test_imported_schema_reexports(spark):
    """import -> export -> import is stable (the exporter speaks the
    importer's dialect)."""
    xsd = """
    <xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      <xs:simpleType name="flagType">
        <xs:restriction base="xs:token">
          <xs:enumeration value="A"/><xs:enumeration value="N"/>
        </xs:restriction>
      </xs:simpleType>
      <xs:element name="t">
        <xs:complexType>
          <xs:attribute name="rid" type="xs:string" use="required"/>
          <xs:attribute name="flag" type="flagType"/>
          <xs:attribute name="score">
            <xs:simpleType>
              <xs:restriction base="xs:int">
                <xs:maxInclusive value="100"/>
              </xs:restriction>
            </xs:simpleType>
          </xs:attribute>
        </xs:complexType>
        <xs:key name="k"><xs:selector xpath="."/>
          <xs:field xpath="@rid"/></xs:key>
      </xs:element>
    </xs:schema>"""
    spec1 = spec_from_xsd(xsd, key_column="rid")
    spec2 = spec_from_xsd(spec_to_xsd(spec1), key_column="rid")
    rows = [("r1", "A", "5"), ("r2", "X", "101"), (None, "N", "1"),
            ("r1", "N", "2")]
    schema = "rid string, flag string, score string"
    assert _viol(spark, spec1, rows, schema) \
        == _viol(spark, spec2, rows, schema)


# ---------------------------------------------------------------- round 7:
# multi-namespace schema-set export (reference exports.py:141-287)

def test_multins_export_round_trip(spark):
    """Production-shaped 2-namespace set (events schema imports a
    metrics type library): import -> spec_to_xsd_set -> re-import with
    locations= yields IDENTICAL violations (behavioral contract)."""
    from xmlschema_spark.queries import (_EVENTS_MULTINS_XSD,
                                         _METRICS_LIB_XSD)
    from xmlschema_spark.runner import validate
    from xmlschema_spark.sources.xsd_export import spec_to_xsd_set
    from xmlschema_spark.sources.xsd_import import spec_from_xsd
    spec = spec_from_xsd(_EVENTS_MULTINS_XSD, key_column="event_id",
                         locations={"urn:metrics": _METRICS_LIB_XSD})
    main, docs = spec_to_xsd_set(spec)
    assert "urn:metrics" in docs and "xs:import" in main
    spec2 = spec_from_xsd(main, key_column="event_id", locations=docs)
    assert spec2.simple_types["{urn:metrics}boundedReading"].base \
        == "{urn:metrics}reading"
    df = spark.createDataFrame(
        [(1, "click", "5.0"), (2, "bogus", "5.0"),
         (3, "view", "-1"), (4, "view", "150")],
        "event_id long, event_type string, value string")
    v1 = sorted((r.row_key, r.constraint)
                for r in validate(df, spec).violations.collect())
    v2 = sorted((r.row_key, r.constraint)
                for r in validate(df, spec2).violations.collect())
    assert v1 == v2
    assert ("2", "facet:enumeration:event_type") in v1
    assert ("3", "facet:minInclusive:value") in v1
    assert ("4", "facet:maxExclusive:value") in v1


def test_reference_issue_362_export_round_trip(spark):
    """A reference multi-namespace schema (crossed imports,
    issues/issue_362) round-trips: export -> re-import -> identical
    violations through the content-model path."""
    from xmlschema_spark.runner import validate
    from xmlschema_spark.sources.xsd_export import spec_to_xsd_set
    from xmlschema_spark.sources.xsd_import import spec_from_xsd
    src = ("/root/reference/tests/test_cases/issues/issue_362/"
           "issue_362_1.xsd")
    spec = spec_from_xsd(src, key_column="rid", tags_column="children",
                         element="root")
    main, docs = spec_to_xsd_set(spec)
    spec2 = spec_from_xsd(main, key_column="rid",
                          tags_column="children", locations=docs)
    df = spark.createDataFrame(
        [("r1", ["item1", "item2", "item3"]),
         ("r2", ["item2"])],
        "rid string, children array<string>")
    v1 = sorted((r.row_key, r.constraint)
                for r in validate(df, spec).violations.collect())
    v2 = sorted((r.row_key, r.constraint)
                for r in validate(df, spec2).violations.collect())
    assert v1 == v2 and any(k == "r2" for k, _ in v1) \
        and not any(k == "r1" for k, _ in v1)


def test_single_ns_set_export_has_no_foreign_docs():
    from xmlschema_spark.sources.xsd_export import (spec_to_xsd,
                                                    spec_to_xsd_set)
    from xmlschema_spark.sources.xsd_import import spec_from_xsd
    xs = 'xmlns:xs="http://www.w3.org/2001/XMLSchema"'
    xsd = f"""<xs:schema {xs}><xs:element name="row"><xs:complexType>
      <xs:attribute name="rid" type="xs:string"/>
      </xs:complexType></xs:element></xs:schema>"""
    spec = spec_from_xsd(xsd, key_column="rid")
    main, docs = spec_to_xsd_set(spec)
    assert docs == {}
    assert main == spec_to_xsd(spec)
