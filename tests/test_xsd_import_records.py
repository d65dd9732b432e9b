"""XSD importer: record-shaped complex children -> struct columns.

A single-occurrence complex child whose type is attributes + an
all-simple (or recursively record-shaped) sequence maps to a struct
column with dotted nested-field ColumnSpecs instead of requiring a
tags_column content model (reference: complex children decode to
nested dicts, complex_types.py content mapping + the converters'
default layout). Multi-step identity fields ('owner/@id',
identities.py:70-96) map to selector strings over those structs."""

import os

import pytest

from xmlschema_spark import validate
from xmlschema_spark.sources.xsd_import import spec_from_xsd

XS = 'xmlns:xs="http://www.w3.org/2001/XMLSchema"'


def _imp(text, tmp_path=None, **kw):
    if tmp_path is not None:
        p = tmp_path / "s.xsd"
        p.write_text(text)
        return spec_from_xsd(str(p), **kw)
    return spec_from_xsd(text, **kw)


def _row_schema(body, attrs='<xs:attribute name="rid" type="xs:string" '
                            'use="required"/>'):
    return (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            f'<xs:sequence>{body}</xs:sequence>{attrs}'
            '</xs:complexType></xs:element></xs:schema>')


OWNER = """
<xs:element name="owner" minOccurs="0">
  <xs:complexType>
    <xs:sequence>
      <xs:element name="quota" type="xs:int" minOccurs="0"/>
    </xs:sequence>
    <xs:attribute name="name" type="xs:string" use="required"/>
  </xs:complexType>
</xs:element>"""


def test_record_child_maps_to_struct_columns():
    spec = _imp(_row_schema(OWNER), key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["owner.name"].parent == "owner"
    assert not by_name["owner.name"].nullable
    assert by_name["owner.quota"].dtype == "xsd:int"
    assert by_name["owner.quota"].parent == "owner"


def test_record_validation_end_to_end(spark):
    spec = _imp(_row_schema(OWNER), key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("alice", "5")), ("r2", (None, "7")), ("r3", None),
         ("r4", ("bob", "99999999999"))],
        "rid string, owner struct<name string, quota string>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    # r3: absent optional record -> no violations at all
    assert ("r2", "required:owner.name") in got
    assert any(k == "r4" and c.startswith("facet:") for k, c in got)
    assert not any(k == "r3" for k, c in got)


def test_required_record_emits_presence_assert(spark):
    spec = _imp(_row_schema(OWNER.replace('minOccurs="0"', "", 1)),
                key_column="rid")
    assert any(a.name == "required_owner" for a in spec.asserts)
    df = spark.createDataFrame(
        [("r1", ("alice", "1")), ("r2", None)],
        "rid string, owner struct<name string, quota string>")
    got = {(r.row_key, r.constraint)
           for r in validate(df, spec).violations.collect()}
    assert ("r2", "assert:required_owner") in got


def test_nested_record_in_record(spark):
    spec = _imp(_row_schema("""
<xs:element name="meta" minOccurs="0">
  <xs:complexType>
    <xs:sequence>
      <xs:element name="owner">
        <xs:complexType>
          <xs:attribute name="id" type="xs:int" use="required"/>
        </xs:complexType>
      </xs:element>
    </xs:sequence>
  </xs:complexType>
</xs:element>"""), key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["meta.owner.id"].parent == "meta.owner"
    # inner record required WITHIN an optional outer: guarded assert
    req = [a for a in spec.asserts if a.name == "required_meta.owner"]
    assert req and req[0].expr.startswith("meta IS NULL OR ")
    df = spark.createDataFrame(
        [("r1", ((("7"),),)), ("r2", None), ("r3", (None,))],
        "rid string, meta struct<owner struct<id string>>")
    got = {(r.row_key, r.constraint)
           for r in validate(df, spec).violations.collect()}
    assert got == {("r3", "assert:required_meta.owner")}


def test_simple_content_record_value_field():
    spec = _imp(_row_schema("""
<xs:element name="price">
  <xs:complexType>
    <xs:simpleContent>
      <xs:extension base="xs:decimal">
        <xs:attribute name="currency" type="xs:string" use="required"/>
      </xs:extension>
    </xs:simpleContent>
  </xs:complexType>
</xs:element>"""), key_column="rid")
    names = {c.name for c in spec.columns}
    assert "price.value" in names and "price.currency" in names


def test_repeated_simple_child_in_record_is_array_field():
    spec = _imp(_row_schema("""
<xs:element name="box" minOccurs="0">
  <xs:complexType>
    <xs:sequence>
      <xs:element name="tag" type="xs:string" maxOccurs="3"/>
    </xs:sequence>
  </xs:complexType>
</xs:element>"""), key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["box.tag"].dtype == "array<string>"
    assert by_name["box.tag"].max_length == 3


def test_repeated_record_maps_to_record_array():
    spec = _imp(_row_schema(OWNER.replace('minOccurs="0"',
                                          'minOccurs="1" maxOccurs="4"',
                                          1)),
                key_column="rid")
    assert len(spec.record_arrays) == 1
    ra = spec.record_arrays[0]
    assert ra.name == "owner"
    assert (ra.min_occurs, ra.max_occurs) == (1, 4)
    by_name = {c.name: c for c in ra.fields}
    assert not by_name["owner.name"].nullable
    assert by_name["owner.quota"].dtype == "xsd:int"


def test_record_array_validation_end_to_end(spark):
    spec = _imp(_row_schema(OWNER.replace('minOccurs="0"',
                                          'minOccurs="1" maxOccurs="2"',
                                          1)),
                key_column="rid")
    df = spark.createDataFrame(
        [("r1", [("alice", "5")]),
         ("r2", []),                              # below minOccurs
         ("r3", [("a", "1"), ("b", "2"), ("c", "3")]),  # above max
         ("r4", [("bob", "not-an-int")]),         # element facet
         ("r5", [(None, "3")]),                   # required field in elem
         ("r6", None)],                           # absent = 0 elements
        "rid string, owner array<struct<name string, quota string>>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert ("r2", "occurs:owner:min") in got
    assert ("r3", "occurs:owner:max") in got
    assert ("r5", "required:owner.name") in got
    assert ("r6", "occurs:owner:min") in got
    assert any(k == "r4" and c.startswith("facet:") for k, c in got)
    assert not any(k == "r1" for k, c in got)


def test_mixed_record_maps_value_field():
    """mixed='true' on a record type: the interleaved character data
    becomes the record's nullable value-column text field (the
    reference decodes mixed text as untyped character data,
    complex_types.py content_type) — no tags_column fallback."""
    spec = _imp(_row_schema(OWNER.replace("<xs:complexType>",
                                          '<xs:complexType mixed="true">',
                                          1)),
                key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["owner.value"].dtype == "string"
    assert by_name["owner.value"].nullable
    assert by_name["owner.quota"].dtype == "xsd:int"


def test_explicit_tags_column_keeps_content_model_path():
    spec = _imp(_row_schema(OWNER), key_column="rid",
                tags_column="tags")
    assert spec.content_models
    assert not any("." in c.name for c in spec.columns)


def test_multi_step_identity_field(spark):
    spec = _imp(_row_schema(
        OWNER,
        attrs='<xs:attribute name="rid" type="xs:string"/>').replace(
        "</xs:complexType></xs:element>",
        '</xs:complexType>'
        '<xs:unique name="uq"><xs:selector xpath="."/>'
        '<xs:field xpath="owner/@name"/></xs:unique></xs:element>'),
        key_column="rid")
    assert spec.uniques[0].columns == ["owner/@name"]
    df = spark.createDataFrame(
        [("a", ("x", "1")), ("b", ("x", "2")), ("c", ("y", "3")),
         ("d", None)],
        "rid string, owner struct<name string, quota string>")
    got = sorted(r.row_key for r in
                 validate(df, spec).violations.collect())
    assert got == ["a", "b"]


def test_multi_step_key_not_inferred_as_key_column():
    with pytest.raises(ValueError, match="pass key_column="):
        _imp(_row_schema(
            OWNER,
            attrs='<xs:attribute name="rid" type="xs:string"/>').replace(
            "</xs:complexType></xs:element>",
            '</xs:complexType>'
            '<xs:key name="k"><xs:selector xpath="."/>'
            '<xs:field xpath="owner/@name"/></xs:key></xs:element>'))


def test_nested_default_applied(spark):
    from xmlschema_spark.runner import apply_defaults
    spec = _imp(_row_schema(OWNER.replace(
        'type="xs:int" minOccurs="0"',
        'type="xs:int" minOccurs="0" default="42"')), key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("alice", None)), ("r2", None)],
        "rid string, owner struct<name string, quota string>")
    out = {r.rid: r.owner for r in apply_defaults(df, spec).collect()}
    assert out["r1"].quota == "42"
    assert out["r2"] is None


def test_prohibited_attr_inside_record(spark):
    spec = _imp(_row_schema("""
<xs:element name="owner" minOccurs="0">
  <xs:complexType>
    <xs:attribute name="name" type="xs:string"/>
    <xs:attribute name="secret" type="xs:string" use="prohibited"/>
  </xs:complexType>
</xs:element>"""), key_column="rid")
    assert any(a.name == "prohibited_owner.secret" for a in spec.asserts)
    df = spark.createDataFrame(
        [("r1", ("a", None)), ("r2", ("b", "x"))],
        "rid string, owner struct<name string, secret string>")
    got = {(r.row_key, r.constraint)
           for r in validate(df, spec).violations.collect()}
    assert got == {("r2", "assert:prohibited_owner.secret")}


def _violations(spark, df, spec):
    from xmlschema_spark import validate
    return sorted((r.row_key, r.constraint, r.value)
                  for r in validate(df, spec).violations.collect())


def test_nested_record_export_round_trip(spark):
    """Behavioral round-trip: export the record spec, re-import, and
    the violations are identical (fields re-render as attributes — the
    importer maps both attributes and simple children onto the same
    dotted fields)."""
    from xmlschema_spark.sources.xsd_export import spec_to_xsd
    spec = _imp(_row_schema(OWNER), key_column="rid")
    spec2 = _imp(spec_to_xsd(spec), key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("alice", "5")), ("r2", (None, "7")), ("r3", None),
         ("r4", ("bob", "xx"))],
        "rid string, owner struct<name string, quota string>")
    assert _violations(spark, df, spec) == _violations(spark, df, spec2)


def test_required_record_export_round_trip(spark):
    from xmlschema_spark.sources.xsd_export import spec_to_xsd
    spec = _imp(_row_schema(OWNER.replace('minOccurs="0"', "", 1)),
                key_column="rid")
    spec2 = _imp(spec_to_xsd(spec), key_column="rid")
    assert any(a.name == "required_owner" for a in spec2.asserts)
    df = spark.createDataFrame(
        [("r1", ("alice", "1")), ("r2", None)],
        "rid string, owner struct<name string, quota string>")
    assert _violations(spark, df, spec) == _violations(spark, df, spec2)


def test_record_array_export_round_trip(spark):
    from xmlschema_spark.sources.xsd_export import spec_to_xsd
    spec = _imp(_row_schema(OWNER.replace('minOccurs="0"',
                                          'minOccurs="1" maxOccurs="2"',
                                          1)),
                key_column="rid")
    spec2 = _imp(spec_to_xsd(spec), key_column="rid")
    assert len(spec2.record_arrays) == 1
    df = spark.createDataFrame(
        [("r1", [("alice", "5")]), ("r2", []),
         ("r3", [("a", "1"), ("b", "2"), ("c", "3")]),
         ("r4", [(None, "bad")])],
        "rid string, owner array<struct<name string, quota string>>")
    assert _violations(spark, df, spec) == _violations(spark, df, spec2)


NESTED_ARR = """
<xs:element name="meta" minOccurs="0">
  <xs:complexType>
    <xs:sequence>
      <xs:element name="sub" minOccurs="1" maxOccurs="2">
        <xs:complexType>
          <xs:attribute name="v" type="xs:int" use="required"/>
        </xs:complexType>
      </xs:element>
    </xs:sequence>
  </xs:complexType>
</xs:element>"""


def test_nested_array_in_single_record(spark):
    """A repeated record inside a single record -> a dotted
    RecordArraySpec ('meta.sub') exploded straight from the top frame;
    occurs bounds are guarded by the parent record's presence."""
    spec = _imp(_row_schema(NESTED_ARR), key_column="rid")
    assert [r.name for r in spec.record_arrays] == ["meta.sub"]
    df = spark.createDataFrame(
        [("r1", ([("1",)],)),
         ("r2", ([],)),                       # present meta, 0 subs
         ("r3", None),                        # absent meta: no checks
         ("r4", ([("1",), ("2",), ("3",)],)),  # above max
         ("r5", ([("x",)],))],                # element facet
        "rid string, meta struct<sub array<struct<v string>>>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert ("r2", "occurs:meta.sub:min") in got
    assert ("r4", "occurs:meta.sub:max") in got
    assert any(k == "r5" and c.startswith("facet:") for k, c in got)
    assert not any(k in ("r1", "r3") for k, c in got)


def test_nested_array_inside_record_array(spark):
    """An array inside array ELEMENTS recurses: explode level 1, then
    level 2 — every level narrow/shuffle-free."""
    spec = _imp(_row_schema("""
<xs:element name="items" maxOccurs="unbounded">
  <xs:complexType>
    <xs:sequence>
      <xs:element name="tag" minOccurs="1" maxOccurs="2">
        <xs:complexType>
          <xs:attribute name="t" type="xs:string" use="required"/>
        </xs:complexType>
      </xs:element>
    </xs:sequence>
  </xs:complexType>
</xs:element>"""), key_column="rid")
    ras = spec.record_arrays[0]
    assert ras.name == "items" and [n.name for n in ras.nested] \
        == ["items.tag"]
    df = spark.createDataFrame(
        [("r1", [([("a",)],)]),
         ("r2", [([],)]),                    # element with 0 tags
         ("r3", [([(None,)],)])],            # tag.t missing
        "rid string, items array<struct<tag array<struct<t string>>>>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert got == [("r2", "occurs:items.tag:min"),
                   ("r3", "required:items.tag.t")]


def test_reference_collection_imports_as_nested_tables(spark):
    """The reference's flagship example schema
    (examples/collection/collection.xsd) imports WITHOUT tags_column:
    the repeated 'object' child becomes a record array whose elements
    carry the author record and the characters/person nested array."""
    from xmlschema_spark.sources.xsd_import import spec_from_xsd
    spec = spec_from_xsd(
        "/root/reference/tests/test_cases/examples/collection/"
        "collection.xsd", element="collection", key_column="rid")
    assert [r.name for r in spec.record_arrays] == ["object"]
    ras = spec.record_arrays[0]
    names = {c.name for c in ras.fields}
    assert {"object.position", "object.title", "object.year",
            "object.author.name", "object.author.id",
            "object.id", "object.available"} <= names
    assert [n.name for n in ras.nested] == ["object.characters.person"]
    person = ("Joan Miró", "1893-04-20", "1983-12-25", "painter", "JM")
    obj = ("1", "The Umbrellas", "1886",
           ("Pierre-Auguste Renoir", "1841-02-25", "1919-12-03",
            "painter", "PAR"),
           "10000.00", "b0836217462", "true", ([person],))
    bad = ("x", "Untitled", "bad-year",
           (None, "1893-04-20", None, None, "JM2"),  # author.name missing
           None, "b0836217463", "true", (([],)))     # 0 persons
    df = spark.createDataFrame(
        [("r1", [obj]), ("r2", [bad]), ("r3", [])],
        "rid string, object array<struct<"
        "position string, title string, year string,"
        "author struct<name string, born string, dead string,"
        "              qualification string, id string>,"
        "estimation string, id string, available string,"
        "characters struct<person array<struct<"
        "  name string, born string, dead string,"
        "  qualification string, id string>>>>>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert ("r2", "required:object.author.name") in got
    assert ("r2", "occurs:object.characters.person:min") in got
    assert ("r3", "occurs:object:min") in got
    assert any(k == "r2" and "object.position" in c for k, c in got)
    assert any(k == "r2" and "object.year" in c for k, c in got)
    assert not any(k == "r1" for k, c in got)


def test_nested_array_export_round_trip(spark):
    from xmlschema_spark.sources.xsd_export import spec_to_xsd
    spec = _imp(_row_schema(NESTED_ARR), key_column="rid")
    spec2 = _imp(spec_to_xsd(spec), key_column="rid")
    assert [r.name for r in spec2.record_arrays] == ["meta.sub"]
    df = spark.createDataFrame(
        [("r1", ([("1",)],)), ("r2", ([],)), ("r3", None),
         ("r4", ([("1",), ("2",), ("3",)],))],
        "rid string, meta struct<sub array<struct<v string>>>")
    assert _violations(spark, df, spec) == _violations(spark, df, spec2)


def test_multi_step_identity_export_round_trip(spark):
    from xmlschema_spark.sources.xsd_export import spec_to_xsd
    spec = _imp(_row_schema(
        OWNER,
        attrs='<xs:attribute name="rid" type="xs:string"/>').replace(
        "</xs:complexType></xs:element>",
        '</xs:complexType>'
        '<xs:unique name="uq"><xs:selector xpath="."/>'
        '<xs:field xpath="owner/@name"/></xs:unique></xs:element>'),
        key_column="rid")
    spec2 = _imp(spec_to_xsd(spec), key_column="rid")
    assert spec2.uniques[0].columns == ["owner/@name"]


# ---------------------------------------------------------------- round 7:
# choice / mixed / repeated-group content INSIDE record types (and at the
# row level) validate WITHOUT the tags_column fallback — the particle tree
# walks into fields + occurrence-count asserts (groups.py:953-1094 decodes
# these shapes uniformly; the tabular projection drops interleaving order).

CHOICE_BOX = """
<xs:element name="box" minOccurs="0">
  <xs:complexType>
    <xs:choice%s>
      <xs:element name="num">
        <xs:simpleType>
          <xs:restriction base="xs:int">
            <xs:maxInclusive value="75"/>
          </xs:restriction>
        </xs:simpleType>
      </xs:element>
      <xs:element name="txt" type="xs:string"/>
    </xs:choice>
  </xs:complexType>
</xs:element>"""


def test_choice_in_record_fields_nullable():
    spec = _imp(_row_schema(CHOICE_BOX % ""), key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["box.num"].nullable
    assert str(by_name["box.num"].max_inclusive) == "75"
    assert by_name["box.txt"].nullable
    ch = [a for a in spec.asserts if a.name.startswith("choice_box")]
    assert len(ch) == 1


def test_choice_in_record_exactly_one(spark):
    spec = _imp(_row_schema(CHOICE_BOX % ""), key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("5", None)),        # num selected — ok
         ("r2", (None, "hello")),    # txt selected — ok
         ("r3", ("5", "hello")),     # BOTH — violates choice
         ("r4", (None, None)),       # NEITHER — violates choice
         ("r5", None),               # absent optional record — ok
         ("r6", ("99", None))],      # branch facet still applies
        "rid string, box struct<num string, txt string>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert ("r3", "assert:choice_box") in got
    assert ("r4", "assert:choice_box") in got
    assert ("r6", "facet:maxInclusive:box.num") in got
    assert not any(k in ("r1", "r2", "r5") for k, _ in got)


def test_optional_choice_at_most_one(spark):
    spec = _imp(_row_schema(CHOICE_BOX % ' minOccurs="0"'),
                key_column="rid")
    df = spark.createDataFrame(
        [("r1", (None, None)),       # no selection — ok (minOccurs=0)
         ("r2", ("5", "x"))],        # both — still exclusive
        "rid string, box struct<num string, txt string>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert got == [("r2", "assert:choice_box")]


def test_repeated_choice_in_record_maps_arrays(spark):
    """mixed-content.xsd shape as a record child: mixed='true' +
    <choice maxOccurs='unbounded'> — branches become arrays, the
    summed count enforces the choice minOccurs, interleaved text is
    the value field."""
    spec = _imp(_row_schema("""
<xs:element name="data" minOccurs="0">
  <xs:complexType mixed="true">
    <xs:choice maxOccurs="unbounded">
      <xs:element name="decimal_value" type="xs:decimal"/>
      <xs:element name="string_value" type="xs:string"/>
    </xs:choice>
  </xs:complexType>
</xs:element>"""), key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["data.decimal_value"].dtype == "array<string>"
    assert by_name["data.value"].nullable          # mixed text field
    df = spark.createDataFrame(
        [("r1", (["1.5", "2"], [], "text between")),   # ok
         ("r2", ([], [], None)),                       # 0 selections < 1
         ("r3", (["x"], ["a"], None))],                # decode violation
        "rid string, data struct<decimal_value array<string>, "
        "string_value array<string>, value string>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert ("r2", "assert:choice_data") in got
    assert any(k == "r3" and "decimal_value" in c for k, c in got)
    assert not any(k == "r1" for k, _ in got)


def test_reference_mixed_content_schema_imports_flat(spark):
    """The reference's features/decoder/mixed-content.xsd — a mixed
    complexType over a repeated choice — imports WITHOUT tags_column
    (round 7; previously raised 'pass tags_column=')."""
    spec = _imp("/root/reference/tests/test_cases/features/decoder/"
                "mixed-content.xsd", key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["decimal_value"].dtype == "array<string>"
    assert by_name["value"].nullable
    assert {"string_value", "boolean_value", "date_and_time",
            "interval", "hexbin"} <= set(by_name)
    ch = [a for a in spec.asserts if a.name.startswith("choice_row")]
    assert len(ch) == 1


def test_repeated_group_in_record_coupling(spark):
    """A repeated sequence group inside a record: the exactly-once
    child is the count DRIVER; optional children are bounded by the
    driver count; the driver count carries the group occurs."""
    spec = _imp(_row_schema("""
<xs:element name="box">
  <xs:complexType>
    <xs:sequence minOccurs="1" maxOccurs="3">
      <xs:element name="a" type="xs:int"/>
      <xs:element name="b" type="xs:string" minOccurs="0"/>
    </xs:sequence>
  </xs:complexType>
</xs:element>"""), key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["box.a"].dtype == "array<string>"
    assert by_name["box.a"].min_length == 1
    assert by_name["box.a"].max_length == 3
    df = spark.createDataFrame(
        [("r1", (["1", "2"], ["x"])),     # 2 reps, 1 optional b — ok
         ("r2", (["1"], ["x", "y"])),     # b count 2 > a count 1
         ("r3", (["1", "2", "3", "4"], [])),   # 4 reps > maxOccurs 3
         ("r4", ([], []))],               # 0 reps < minOccurs 1
        "rid string, box struct<a array<string>, b array<string>>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert ("r2", "assert:group_occurs_box") in got
    assert ("r3", "facet:maxLength:box.a") in got
    assert ("r4", "facet:minLength:box.a") in got
    assert not any(k == "r1" for k, _ in got)


def test_choice_with_record_branch(spark):
    """A choice whose branch is itself record-shaped: the branch maps
    to a nullable STRUCT field and participates in the selection
    count via IS NOT NULL."""
    spec = _imp(_row_schema("""
<xs:element name="pay">
  <xs:complexType>
    <xs:choice>
      <xs:element name="cash" type="xs:decimal"/>
      <xs:element name="card">
        <xs:complexType>
          <xs:sequence>
            <xs:element name="pan" type="xs:string"/>
          </xs:sequence>
          <xs:attribute name="scheme" type="xs:string" use="required"/>
        </xs:complexType>
      </xs:element>
    </xs:choice>
  </xs:complexType>
</xs:element>"""), key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["pay.card.scheme"].parent == "pay.card"
    df = spark.createDataFrame(
        [("r1", ("9.99", None)),
         ("r2", (None, ("visa", "4111"))),
         ("r3", ("9.99", ("visa", "4111"))),   # both branches
         ("r4", (None, None)),                 # neither
         ("r5", (None, (None, "4111")))],      # branch field required
        "rid string, pay struct<cash string, "
        "card struct<scheme string, pan string>>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert ("r3", "assert:choice_pay") in got
    assert ("r4", "assert:choice_pay") in got
    assert ("r5", "required:pay.card.scheme") in got
    assert not any(k in ("r1", "r2") for k, _ in got)


def test_top_level_choice_without_tags(spark):
    """Choice as the ROW element's own content model also maps flat
    (plain columns + selection assert) when no tags_column is given."""
    spec = _imp(f"""
    <xs:schema {XS}>
      <xs:element name="row">
        <xs:complexType>
          <xs:choice>
            <xs:element name="num" type="xs:int"/>
            <xs:element name="txt" type="xs:string"/>
          </xs:choice>
          <xs:attribute name="rid" type="xs:string" use="required"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    df = spark.createDataFrame(
        [("r1", "5", None), ("r2", None, "x"), ("r3", "5", "x"),
         ("r4", None, None)],
        "rid string, num string, txt string")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert got == [("r3", "assert:choice_row"),
                   ("r4", "assert:choice_row")]


def test_nested_choice_inlines_as_alternatives():
    """A single-occurrence choice nested in a choice flattens to one
    alternative set (models.py nested-choice matching)."""
    spec = _imp(_row_schema("""
<xs:element name="box">
  <xs:complexType>
    <xs:choice>
      <xs:element name="a" type="xs:string"/>
      <xs:choice>
        <xs:element name="b" type="xs:string"/>
        <xs:element name="c" type="xs:string"/>
      </xs:choice>
    </xs:choice>
  </xs:complexType>
</xs:element>"""), key_column="rid")
    ch = [a for a in spec.asserts if a.name.startswith("choice_box")]
    assert len(ch) == 1
    assert "box.a" in ch[0].expr and "box.c" in ch[0].expr


# ---------------------------------------------------------------- round 7:
# xs:anyAttribute INSIDE record types (wildcards.py:164+,
# attributes.py:659-712): extra struct fields beyond the declared ones
# are governed by the wildcard's namespace constraint + processContents.

def _wc_schema(any_attr):
    return _row_schema(f"""
<xs:element name="box" minOccurs="0">
  <xs:complexType>
    <xs:attribute name="tag" type="xs:string" use="required"/>
    {any_attr}
  </xs:complexType>
</xs:element>""")


def test_any_attribute_strict_rejects_undeclared(spark):
    """processContents='strict' (also the XSD default): an extra
    nested field has no declaration to validate against — violation."""
    spec = _imp(_wc_schema('<xs:anyAttribute processContents="strict"/>'),
                key_column="rid")
    assert spec.attr_wildcards and spec.attr_wildcards[0].path == "box"
    df = spark.createDataFrame(
        [("r1", ("a", "x"))],
        "rid string, box struct<tag string, extra string>")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:strict:box.extra" in got


def test_any_attribute_skip_admits_undeclared(spark):
    spec = _imp(_wc_schema('<xs:anyAttribute processContents="skip"/>'),
                key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("a", "x"))],
        "rid string, box struct<tag string, extra string>")
    assert validate(df, spec).violations.count() == 0


def test_any_attribute_lax_admits_undeclared(spark):
    spec = _imp(_wc_schema('<xs:anyAttribute processContents="lax"/>'),
                key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("a", "x"))],
        "rid string, box struct<tag string, extra string>")
    assert validate(df, spec).violations.count() == 0


def test_any_attribute_namespace_constraint(spark):
    """##other excludes both the (absent) target namespace and
    NO-namespace fields: a plain extra field violates the namespace
    constraint even under processContents='skip'."""
    spec = _imp(_wc_schema(
        '<xs:anyAttribute namespace="##other" '
        'processContents="skip"/>'), key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("a", "x", "y"))],
        "rid string, box struct<tag string, extra string, "
        "`{urn:x}ext` string>")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:namespace:box.extra" in got
    assert not any("{urn:x}ext" in c for c in got)   # qualified admitted


def test_no_wildcard_keeps_schema_evolution_tolerance(spark):
    """A record WITHOUT anyAttribute keeps the engine's default
    tolerance for extra nested fields (same as allow_extra_columns)."""
    spec = _imp(_wc_schema(""), key_column="rid")
    assert not spec.attr_wildcards
    df = spark.createDataFrame(
        [("r1", ("a", "x"))],
        "rid string, box struct<tag string, extra string>")
    assert validate(df, spec).violations.count() == 0


def test_any_attribute_export_round_trip(spark):
    """Behavioral round-trip: import -> export -> re-import preserves
    the record's attribute wildcard (same verdicts on a frame with an
    undeclared nested field)."""
    from xmlschema_spark.sources.xsd_export import spec_to_xsd
    spec = _imp(_wc_schema(
        '<xs:anyAttribute processContents="strict"/>'), key_column="rid")
    text = spec_to_xsd(spec)
    assert "anyAttribute" in text
    spec2 = _imp(text, key_column="rid")
    assert spec2.attr_wildcards
    w = spec2.attr_wildcards[0]
    assert (w.path, w.process) == ("box", "strict")
    df = spark.createDataFrame(
        [("r1", ("a", "x"))],
        "rid string, box struct<tag string, extra string>")
    v1 = sorted((r.row_key, r.constraint)
                for r in validate(df, spec).violations.collect())
    v2 = sorted((r.row_key, r.constraint)
                for r in validate(df, spec2).violations.collect())
    assert v1 == v2
    assert ("<schema>", "wildcard:strict:box.extra") in v1


# ---------------------------------------------------------------- round 7:
# selector-addressed identities over record-array elements
# (FieldValueSelector inside repeated content, identities.py:461-544).

REPEATED_ID = """
<xs:element name="item" minOccurs="0" maxOccurs="unbounded">
  <xs:complexType>
    <xs:sequence>
      <xs:element name="ref" type="xs:string" minOccurs="0"/>
    </xs:sequence>
    <xs:attribute name="id" type="xs:string" use="required"/>
  </xs:complexType>
</xs:element>"""


def _identity_schema(constraints):
    return (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            f'<xs:sequence>{REPEATED_ID}</xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '<xs:attribute name="tag" type="xs:string"/>'
            f'</xs:complexType>{constraints}</xs:element></xs:schema>')


def test_unique_over_record_array_elements(spark):
    """xs:unique whose selector targets a repeated record child: the
    node set is the exploded elements; duplicated @id values across
    ALL rows' elements violate (the table is the collection scope)."""
    spec = _imp(_identity_schema(
        '<xs:unique name="uq_item"><xs:selector xpath="item"/>'
        '<xs:field xpath="@id"/></xs:unique>'), key_column="rid")
    u = spec.uniques[0]
    assert u.scope == "item" and u.columns == ["item/id"]
    df = spark.createDataFrame(
        [("r1", [("a", "i1"), ("b", "i2")], None),
         ("r2", [("c", "i1")], None),        # i1 duplicated vs r1
         ("r3", [], None),
         ("r4", None, None)],
        "rid string, item array<struct<ref string, id string>>, "
        "tag string")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert got == [("r1", "unique:uq_item"), ("r2", "unique:uq_item")]


def test_keyref_fields_inside_record_array(spark):
    """xs:keyref whose fields live inside a record array, referring to
    a key that ALSO lives inside a record array (ref_scope): every
    element's ref value must match some element's @id."""
    spec = _imp(_identity_schema(
        '<xs:key name="k_item"><xs:selector xpath="item"/>'
        '<xs:field xpath="@id"/></xs:key>'
        '<xs:keyref name="fk_item" refer="k_item">'
        '<xs:selector xpath="item"/>'
        '<xs:field xpath="ref"/></xs:keyref>'), key_column="rid")
    kr = spec.keyrefs[0]
    assert (kr.scope, kr.ref_scope) == ("item", "item")
    assert kr.columns == ["item/ref"]
    df = spark.createDataFrame(
        [("r1", [("i2", "i1"), (None, "i2")], None),   # i2 exists — ok
         ("r2", [("iX", "i3")], None)],                # iX unknown
        "rid string, item array<struct<ref string, id string>>, "
        "tag string")
    from xmlschema_spark import compile_plan as _cp
    from xmlschema_spark.runner import validate as _v
    res = _v(df, spec, refs={"row": df})
    got = sorted((r.row_key, r.constraint)
                 for r in res.violations.collect())
    assert ("r2", "keyref:fk_item") in got
    assert not any(k == "r1" and c.startswith("keyref") for k, c in got)


def test_scoped_key_missing_field(spark):
    """xs:key over record-array elements: a NULL key field in any
    element is itself a violation (identities.py:523-531)."""
    spec = _imp(_identity_schema(
        '<xs:key name="k_item"><xs:selector xpath="item"/>'
        '<xs:field xpath="@id"/></xs:key>'), key_column="rid")
    df = spark.createDataFrame(
        [("r1", [("a", None)], None)],
        "rid string, item array<struct<ref string, id string>>, "
        "tag string")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "key:k_item:missing" in got


def test_selector_crossing_array_field_errors():
    with pytest.raises(ValueError, match="crosses repeated content"):
        _imp(_row_schema("""
<xs:element name="box">
  <xs:complexType>
    <xs:sequence>
      <xs:element name="item" maxOccurs="5">
        <xs:complexType>
          <xs:attribute name="id" type="xs:string"/>
        </xs:complexType>
      </xs:element>
    </xs:sequence>
  </xs:complexType>
</xs:element>""").replace(
            "</xs:complexType></xs:element></xs:schema>",
            '</xs:complexType><xs:unique name="u">'
            '<xs:selector xpath="box"/>'
            '<xs:field xpath="item/@id"/></xs:unique>'
            "</xs:element></xs:schema>"), key_column="rid")


def test_unknown_selector_still_errors():
    with pytest.raises(ValueError, match="does not resolve"):
        _imp(_identity_schema(
            '<xs:unique name="u"><xs:selector xpath="nope"/>'
            '<xs:field xpath="@id"/></xs:unique>'), key_column="rid")


def test_scoped_identity_export_round_trip(spark):
    """import -> export -> re-import keeps record-array-scoped
    identities (same violations)."""
    from xmlschema_spark.sources.xsd_export import spec_to_xsd
    spec = _imp(_identity_schema(
        '<xs:key name="k_item"><xs:selector xpath="item"/>'
        '<xs:field xpath="@id"/></xs:key>'
        '<xs:keyref name="fk_item" refer="k_item">'
        '<xs:selector xpath="item"/>'
        '<xs:field xpath="ref"/></xs:keyref>'), key_column="rid")
    spec2 = _imp(spec_to_xsd(spec), key_column="rid")
    assert spec2.uniques[0].scope == "item"
    assert (spec2.keyrefs[0].scope, spec2.keyrefs[0].ref_scope) \
        == ("item", "item")
    df = spark.createDataFrame(
        [("r1", [("i2", "i1"), (None, "i2")], None),
         ("r2", [("iX", "i1")], None)],       # dup id + unknown ref
        "rid string, item array<struct<ref string, id string>>, "
        "tag string")
    from xmlschema_spark.runner import validate as _v
    v1 = sorted((r.row_key, r.constraint) for r in
                _v(df, spec, refs={"row": df}).violations.collect())
    v2 = sorted((r.row_key, r.constraint) for r in
                _v(df, spec2, refs={"row": df}).violations.collect())
    assert v1 == v2
    assert ("r2", "keyref:fk_item") in v1
    assert ("r1", "unique:k_item") in v1     # i1 dup across rows


# ---- same-named element siblings (round 7): the XSD Element
# Declarations Consistent constraint forces one type per name in a
# content model; the reference's converters merge same-named siblings
# into a list, so the record engine maps them to ONE repeated field
# whose occurs bounds are the sums of the siblings' bounds.

DUP = ('<xs:element name="a" type="xs:int"/>'
       '<xs:element name="b" type="xs:string"/>'
       '<xs:element name="a" type="xs:int" maxOccurs="2"/>')


def test_duplicate_sibling_merges_to_array(spark):
    spec = _imp(_row_schema(DUP), key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["a"].dtype == "array<string>"
    assert (by_name["a"].min_length, by_name["a"].max_length) == (2, 3)
    assert by_name["b"].dtype == "string"
    df = spark.createDataFrame(
        [("r1", ["1", "2"], "x"), ("r2", ["1"], "x"),
         ("r3", ["1", "2", "3", "4"], "x"), ("r4", ["1", "oops"], "x")],
        "rid string, a array<string>, b string")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert not any(k == "r1" for k, _ in got)
    assert any(k == "r2" and "minLength" in c for k, c in got)
    assert any(k == "r3" and "maxLength" in c for k, c in got)
    assert any(k == "r4" for k, _ in got)        # int decode on items


def test_duplicate_sibling_unbounded_second():
    spec = _imp(_row_schema(DUP.replace('maxOccurs="2"',
                                        'maxOccurs="unbounded"')),
                key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["a"].min_length == 2
    assert by_name["a"].max_length is None


def test_duplicate_sibling_inside_record_child(spark):
    """The merge also applies inside a nested record type."""
    spec = _imp(_row_schema(
        '<xs:element name="box"><xs:complexType><xs:sequence>'
        + DUP + "</xs:sequence></xs:complexType></xs:element>"),
        key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["box.a"].dtype == "array<string>"
    assert (by_name["box.a"].min_length,
            by_name["box.a"].max_length) == (2, 3)


def test_duplicate_conflicting_types_falls_back():
    """EDC-violating duplicates (different types) cannot merge: the
    flat mapping declines and asks for tags_column."""
    bad = ('<xs:element name="a" type="xs:int"/>'
           '<xs:element name="a" type="xs:string"/>')
    with pytest.raises(ValueError, match="tags_column"):
        _imp(_row_schema(bad), key_column="rid")
    spec = _imp(_row_schema(bad), key_column="rid",
                tags_column="tags")
    assert spec.content_models


def test_duplicate_across_choice_falls_back():
    """A name shared between a sequence sibling and a choice branch
    is NOT a sibling merge (counts don't provably add) — fallback."""
    body = ('<xs:element name="a" type="xs:int"/>'
            '<xs:choice><xs:element name="a" type="xs:int"/>'
            '<xs:element name="c" type="xs:string"/></xs:choice>')
    with pytest.raises(ValueError, match="tags_column"):
        _imp(_row_schema(body), key_column="rid")


def test_duplicate_sibling_in_repeated_group(spark):
    """Inside a repeated group the merged per-repetition bounds
    couple to the driver count: (a, b, a) x [1..2] => size(a) = 2*d."""
    spec = _imp(_row_schema(
        '<xs:element name="box"><xs:complexType>'
        '<xs:sequence minOccurs="1" maxOccurs="2">'
        '<xs:element name="a" type="xs:int"/>'
        '<xs:element name="b" type="xs:string"/>'
        '<xs:element name="a" type="xs:int"/>'
        "</xs:sequence></xs:complexType></xs:element>"),
        key_column="rid")
    df = spark.createDataFrame(
        [("r1", (["1", "2"], ["x"])),             # 1 rep: 2a, 1b
         ("r2", (["1", "2", "3", "4"], ["x", "y"])),   # 2 reps
         ("r3", (["1", "2", "3"], ["x"]))],       # 3a with 1b: bad
        "rid string, box struct<a array<string>, b array<string>>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert not any(k in ("r1", "r2") for k, _ in got)
    assert any(k == "r3" and "group_occurs" in c for k, c in got)


def test_duplicate_sibling_export_round_trip(spark):
    """export renders the merged field once with summed bounds;
    re-import produces identical violations."""
    from xmlschema_spark.sources.xsd_export import spec_to_xsd
    spec = _imp(_row_schema(DUP), key_column="rid")
    spec2 = _imp(spec_to_xsd(spec), key_column="rid")
    df = spark.createDataFrame(
        [("r1", ["1", "2"], "x"), ("r2", ["1"], "x")],
        "rid string, a array<string>, b string")
    v1 = sorted((r.row_key, r.constraint)
                for r in validate(df, spec).violations.collect())
    v2 = sorted((r.row_key, r.constraint)
                for r in validate(df, spec2).violations.collect())
    assert v1 == v2 and any(k == "r2" for k, _ in v1)


def test_duplicate_sibling_value_constraint_falls_back():
    """Same-typed duplicated siblings carrying fixed/default (EDC-valid
    — EDC constrains the TYPE only) must NOT merge: the repeated-field
    emit path has no fixed/default support, so merging would silently
    drop the value constraint. Such shapes keep the content-model
    fallback (r8, ADVICE item 1)."""
    for attr in ('fixed="7"', 'default="7"'):
        body = (f'<xs:element name="a" type="xs:int" {attr}/>'
                '<xs:element name="a" type="xs:int"/>')
        with pytest.raises(ValueError, match="tags_column"):
            _imp(_row_schema(body), key_column="rid")
    # differing nillable is likewise not comparable for the merge
    body = ('<xs:element name="a" type="xs:int" nillable="true"/>'
            '<xs:element name="a" type="xs:int"/>')
    with pytest.raises(ValueError, match="tags_column"):
        _imp(_row_schema(body), key_column="rid")
