"""spec_from_xsd: XSD schema text -> TableSpec (sources/xsd_import.py).

The reference's front door is an XSD document; these tests feed
reference-style schema text through the importer and check that the
resulting spec validates rows exactly like the hand-built equivalent
(mapping anchors cited in the module docstring)."""

import pytest

from xmlschema_spark import validate
from xmlschema_spark.sources.xsd_import import spec_from_xsd

XS = 'xmlns:xs="http://www.w3.org/2001/XMLSchema"'


def _viol(spark, spec, rows, schema, refs=None):
    df = spark.createDataFrame(rows, schema)
    res = validate(df, spec, refs=refs)
    return sorted(((r.row_key, r.constraint)
                   for r in res.violations.collect()),
                  key=lambda t: (t[0] or "", t[1]))


# ------------------------------------------------------------ simple types

def test_facet_restriction_attributes(spark):
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:simpleType name="zipType">
        <xs:restriction base="xs:string">
          <xs:pattern value="[0-9]{{5}}(-[0-9]{{4}})?"/>
        </xs:restriction>
      </xs:simpleType>
      <xs:element name="addr">
        <xs:complexType>
          <xs:attribute name="id" type="xs:NCName" use="required"/>
          <xs:attribute name="zip" type="zipType"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="id")
    assert spec.name == "addr"
    assert {c.name for c in spec.columns} == {"id", "zip"}
    got = _viol(spark, spec,
                [("a1", "55555"), ("a2", "I-55555"), ("a3", None),
                 (None, "55555-5555")],
                "id string, zip string")
    assert set(got) == {("a2", "facet:pattern:zip"),
                        (None, "required:id")}


def test_restriction_chain_flattens(spark):
    # derivation chain: token -> small (maxLength 5) -> tiny (pattern)
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:simpleType name="small">
        <xs:restriction base="xs:token">
          <xs:maxLength value="5"/>
        </xs:restriction>
      </xs:simpleType>
      <xs:simpleType name="tiny">
        <xs:restriction base="small">
          <xs:pattern value="[a-z]+"/>
        </xs:restriction>
      </xs:simpleType>
      <xs:element name="t">
        <xs:complexType>
          <xs:attribute name="rid" type="xs:string" use="required"/>
          <xs:attribute name="v" type="tiny"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    got = _viol(spark, spec,
                [("r1", "abc"), ("r2", "abcdef"), ("r3", "ABC")],
                "rid string, v string")
    assert ("r2", "facet:maxLength:v") in got      # from the base step
    assert ("r3", "facet:pattern:v") in got        # from the final step
    assert not [g for g in got if g[0] == "r1"]


def test_inline_anonymous_base(spark):
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:element name="t">
        <xs:complexType>
          <xs:attribute name="rid" type="xs:string" use="required"/>
          <xs:attribute name="v">
            <xs:simpleType>
              <xs:restriction>
                <xs:simpleType>
                  <xs:restriction base="xs:string">
                    <xs:maxLength value="3"/>
                  </xs:restriction>
                </xs:simpleType>
                <xs:pattern value="[0-9]+"/>
              </xs:restriction>
            </xs:simpleType>
          </xs:attribute>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    got = _viol(spark, spec, [("r1", "12"), ("r2", "1234"), ("r3", "ab")],
                "rid string, v string")
    assert ("r2", "facet:maxLength:v") in got
    assert ("r3", "facet:pattern:v") in got


def test_builtin_list_and_custom_list(spark):
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:simpleType name="bytes3">
        <xs:restriction>
          <xs:simpleType>
            <xs:list itemType="xs:byte"/>
          </xs:simpleType>
          <xs:maxLength value="3"/>
        </xs:restriction>
      </xs:simpleType>
      <xs:element name="t">
        <xs:complexType>
          <xs:attribute name="rid" type="xs:string" use="required"/>
          <xs:attribute name="toks" type="xs:NMTOKENS"/>
          <xs:attribute name="nums" type="bytes3"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    got = _viol(spark, spec,
                [("r1", "a b", "1 2 3"),
                 ("r2", "a,b", "1 2"),          # comma invalid NMTOKEN
                 ("r3", "ok", "300"),           # byte overflow
                 ("r4", "ok", "1 2 3 4")],      # list too long
                "rid string, toks string, nums string")
    assert [g[0] for g in got] == ["r2", "r3", "r4"]


def test_union_member_types(spark):
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:simpleType name="dateOrDateTime">
        <xs:union memberTypes="xs:date xs:dateTime"/>
      </xs:simpleType>
      <xs:element name="t">
        <xs:complexType>
          <xs:attribute name="rid" type="xs:string" use="required"/>
          <xs:attribute name="when" type="dateOrDateTime"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    got = _viol(spark, spec,
                [("r1", "2021-05-01"), ("r2", "2021-05-01T10:00:00"),
                 ("r3", "yesterday")],
                "rid string, when string")
    assert [g[0] for g in got] == ["r3"]


def test_assertion_facet_translates(spark):
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:simpleType name="even">
        <xs:restriction base="xs:int">
          <xs:assertion test="$value mod 2 = 0"/>
        </xs:restriction>
      </xs:simpleType>
      <xs:element name="t">
        <xs:complexType>
          <xs:attribute name="rid" type="xs:string" use="required"/>
          <xs:attribute name="v" type="even"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    got = _viol(spark, spec, [("r1", "4"), ("r2", "5")],
                "rid string, v string")
    assert [g[0] for g in got] == ["r2"]


# ------------------------------------------------------------ row element

def test_child_elements_required_and_repeated(spark):
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:element name="order">
        <xs:complexType>
          <xs:sequence>
            <xs:element name="sku" type="xs:NCName"/>
            <xs:element name="note" type="xs:string" minOccurs="0"/>
            <xs:element name="tag" type="xs:token" minOccurs="1"
                        maxOccurs="3"/>
          </xs:sequence>
          <xs:attribute name="oid" type="xs:string" use="required"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="oid")
    by_name = {c.name: c for c in spec.columns}
    assert not by_name["sku"].nullable
    assert by_name["note"].nullable
    assert by_name["tag"].dtype == "array<string>"
    assert (by_name["tag"].min_length, by_name["tag"].max_length) == (1, 3)
    got = _viol(spark, spec,
                [("o1", "p-1", None, ["a"]),
                 ("o2", None, "x", ["a"]),          # missing sku
                 ("o3", "p:3", None, ["a"]),        # bad NCName
                 ("o4", "p-4", None, ["a", "b", "c", "d"])],  # 4 tags
                "oid string, sku string, note string, tag array<string>")
    assert ("o2", "required:sku") in got
    assert [g for g in got if g[0] == "o3"]
    assert ("o4", "facet:maxLength:tag") in got


def test_fixed_default_prohibited(spark):
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:element name="t">
        <xs:complexType>
          <xs:attribute name="rid" type="xs:string" use="required"/>
          <xs:attribute name="version" type="xs:string" fixed="1.0"/>
          <xs:attribute name="legacy" type="xs:string"
                        use="prohibited"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    got = _viol(spark, spec,
                [("r1", "1.0", None), ("r2", "2.0", None),
                 ("r3", None, "x")],
                "rid string, version string, legacy string")
    assert [g[0] for g in got] == ["r2", "r3"]


def test_complextype_assert(spark):
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:element name="range">
        <xs:complexType>
          <xs:attribute name="rid" type="xs:string" use="required"/>
          <xs:attribute name="min" type="xs:int"/>
          <xs:attribute name="max" type="xs:int"/>
          <xs:assert test="@min le @max"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    got = _viol(spark, spec,
                [("r1", 1, 2), ("r2", 5, 3)],
                "rid string, min int, max int")
    assert [g[0] for g in got] == ["r2"]


def test_content_model_via_tags_column(spark):
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:element name="doc">
        <xs:complexType>
          <xs:sequence>
            <xs:element name="head"/>
            <xs:choice minOccurs="1" maxOccurs="unbounded">
              <xs:element name="p"/>
              <xs:element name="table"/>
            </xs:choice>
          </xs:sequence>
          <xs:attribute name="rid" type="xs:string" use="required"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid", tags_column="kids")
    assert len(spec.content_models) == 1
    assert spec.content_models[0].column == "kids"
    got = _viol(spark, spec,
                [("r1", ["head", "p", "table"]),
                 ("r2", ["p"]),
                 ("r3", ["head"])],
                "rid string, kids array<string>")
    assert [g[0] for g in got] == ["r2", "r3"]


# ------------------------------------------------------------ identities

IDENTITY_XSD = f"""
<xs:schema {XS}>
  <xs:element name="orders">
    <xs:complexType>
      <xs:sequence>
        <xs:element ref="order" maxOccurs="unbounded"/>
      </xs:sequence>
    </xs:complexType>
    <xs:key name="orderKey">
      <xs:selector xpath=".//order"/>
      <xs:field xpath="@oid"/>
    </xs:key>
    <xs:unique name="slotUnique">
      <xs:selector xpath="order"/>
      <xs:field xpath="@day"/>
      <xs:field xpath="@slot"/>
    </xs:unique>
    <xs:keyref name="parentRef" refer="orderKey">
      <xs:selector xpath=".//order"/>
      <xs:field xpath="@parent"/>
    </xs:keyref>
  </xs:element>
  <xs:element name="order">
    <xs:complexType>
      <xs:attribute name="oid" type="xs:string" use="required"/>
      <xs:attribute name="day" type="xs:string"/>
      <xs:attribute name="slot" type="xs:string"/>
      <xs:attribute name="parent" type="xs:string"/>
    </xs:complexType>
  </xs:element>
</xs:schema>"""


def test_identity_constraints(spark):
    spec = spec_from_xsd(IDENTITY_XSD, element="order")
    # key_column inferred from the single single-field xs:key
    assert spec.key_column == "oid"
    assert {u.name: (u.is_key, tuple(u.columns)) for u in spec.uniques} \
        == {"orderKey": (True, ("oid",)),
            "slotUnique": (False, ("day", "slot"))}
    assert spec.keyrefs[0].ref_table == "order"
    assert spec.keyrefs[0].ref_columns == ["oid"]

    rows = [("o1", "mon", "1", None), ("o2", "mon", "1", "o1"),
            ("o3", "tue", "2", "oX")]
    df = spark.createDataFrame(
        rows, "oid string, day string, slot string, parent string")
    got = sorted((r.row_key, r.constraint) for r in
                 validate(df, spec, refs={"order": df})
                 .violations.collect())
    assert ("o3", "keyref:parentRef") in got
    dup = [g for g in got if g[1] == "unique:slotUnique"]
    assert {g[0] for g in dup} == {"o1", "o2"}


# --------------------------------------------------------------- errors

@pytest.mark.parametrize("xsd,match", [
    # xs:import is SUPPORTED since round 6; importing one's own
    # targetNamespace stays an error with the reference's wording
    (f'<xs:schema {XS} targetNamespace="urn:t" xmlns:t="urn:t">'
     '<xs:import namespace="urn:t"/></xs:schema>',
     "must be different from schema's 'targetNamespace'"),
    # (mixed element content imports since round 6: value column +
    # content model — see test_xsd_import_ns.py mixed tests)
    # (xs:QName imports since round 6 — prefixes resolve against the
    # spec's namespace map; see test_xsd_import_ns.py QName tests)
    (f'''<xs:schema {XS}><xs:element name="t">
         <xs:complexType><xs:attribute name="v" type="nope"/>
         </xs:complexType></xs:element></xs:schema>''',
     "unknown type"),
    (f'''<xs:schema {XS}><xs:element name="t">
         <xs:complexType><xs:attribute name="rid"/></xs:complexType>
         <xs:unique name="u"><xs:selector xpath="other/row"/>
         <xs:field xpath="@rid"/></xs:unique>
         </xs:element></xs:schema>''',
     "does not resolve to the row element"),
    # multi-step identity fields like 'a/b' are SUPPORTED since round 6
    # (nested-record selectors, tests/test_xsd_import_records.py);
    # descendant-axis fields stay rejected:
    (f'''<xs:schema {XS}><xs:element name="t">
         <xs:complexType><xs:attribute name="rid"/></xs:complexType>
         <xs:unique name="u"><xs:selector xpath="."/>
         <xs:field xpath=".//b"/></xs:unique>
         </xs:element></xs:schema>''',
     "only child/attribute steps"),
    (f'''<xs:schema {XS}><xs:element name="a">
         <xs:complexType><xs:attribute name="x"/></xs:complexType>
         </xs:element><xs:element name="b">
         <xs:complexType><xs:attribute name="x"/></xs:complexType>
         </xs:element></xs:schema>''',
     "pass element="),
    (f'''<xs:schema {XS}><xs:element name="t">
         <xs:complexType><xs:attribute name="rid"/></xs:complexType>
         </xs:element></xs:schema>''',
     "pass key_column="),
    (f'''<xs:schema {XS}><xs:element name="t">
         <xs:complexType><xs:sequence>
         <xs:element name="kid"><xs:complexType>
         <xs:sequence><xs:element name="leaf"/></xs:sequence>
         </xs:complexType></xs:element>
         </xs:sequence><xs:attribute name="rid"/></xs:complexType>
         </xs:element></xs:schema>''',
     "pass tags_column="),
])
def test_unsupported_constructs_rejected(xsd, match):
    kc = None if match == "pass key_column=" else "rid"
    with pytest.raises(ValueError, match=match):
        spec_from_xsd(xsd, key_column=kc)


def test_equivalent_to_handbuilt(spark):
    """The imported spec and the hand-built spec produce IDENTICAL
    violations on the same frame."""
    from xmlschema_spark import ColumnSpec, TableSpec
    xsd_spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:element name="t">
        <xs:complexType>
          <xs:attribute name="rid" type="xs:string" use="required"/>
          <xs:attribute name="n">
            <xs:simpleType>
              <xs:restriction base="xs:int">
                <xs:minInclusive value="0"/>
                <xs:maxExclusive value="100"/>
              </xs:restriction>
            </xs:simpleType>
          </xs:attribute>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    hand = TableSpec(name="t", key_column="rid", columns=[
        ColumnSpec("rid", "string", nullable=False),
        ColumnSpec("n", "xsd:int", min_inclusive="0",
                   max_exclusive="100")])
    rows = [("r1", "5"), ("r2", "-1"), ("r3", "100"), ("r4", "2.5")]
    schema = "rid string, n string"
    assert _viol(spark, xsd_spec, rows, schema) \
        == _viol(spark, hand, rows, schema)


# ------------------------------- groups / attributeGroups / derivation

def test_group_and_attributegroup_refs(spark):
    """Named model groups and attribute groups splice in place
    (groups.py XsdGroup ref, attributes.py:336-505)."""
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:attributeGroup name="idAttrs">
        <xs:attribute name="rid" type="xs:string" use="required"/>
        <xs:attribute name="ver" type="xs:int"/>
      </xs:attributeGroup>
      <xs:group name="nameFields">
        <xs:sequence>
          <xs:element name="first" type="xs:token"/>
          <xs:element name="last" type="xs:token"/>
        </xs:sequence>
      </xs:group>
      <xs:element name="t">
        <xs:complexType>
          <xs:sequence>
            <xs:group ref="nameFields"/>
            <xs:element name="age" type="xs:int" minOccurs="0"/>
          </xs:sequence>
          <xs:attributeGroup ref="idAttrs"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    assert [c.name for c in spec.columns] \
        == ["rid", "ver", "first", "last", "age"]
    got = _viol(spark, spec,
                [("r1", "1", "Ada", "L.", "36"),
                 ("r2", "x", "Bob", None, None)],
                "rid string, ver string, first string, "
                "last string, age string")
    assert set(got) == {("r2", "facet:pattern:ver"),
                        ("r2", "facet:decode:ver"),
                        ("r2", "required:last")}


def test_group_ref_occurs_in_content_model(spark):
    """The occurs on the group REFERENCE bound the expanded group as a
    unit (a ref'd sequence repeated 1..2 times)."""
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:group name="pair">
        <xs:sequence>
          <xs:element name="k"/><xs:element name="v"/>
        </xs:sequence>
      </xs:group>
      <xs:element name="t">
        <xs:complexType>
          <xs:sequence>
            <xs:group ref="pair" minOccurs="1" maxOccurs="2"/>
          </xs:sequence>
          <xs:attribute name="rid"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid", tags_column="tags")
    got = _viol(spark, spec,
                [("r1", ["k", "v"]),
                 ("r2", ["k", "v", "k", "v"]),
                 ("r3", ["k"]),
                 ("r4", ["k", "v", "k", "v", "k", "v"])],
                "rid string, tags array<string>")
    assert set(got) == {("r3", "content:t:tags"),
                        ("r4", "content:t:tags")}


def test_complexcontent_extension_flattens(spark):
    """An extension appends its particle after the base's and merges
    attributes (complex_types.py:456-485); a two-level chain flattens
    to plain columns when every child is simple."""
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:complexType name="baseT">
        <xs:sequence><xs:element name="a" type="xs:int"/></xs:sequence>
        <xs:attribute name="rid" type="xs:string" use="required"/>
      </xs:complexType>
      <xs:complexType name="midT">
        <xs:complexContent>
          <xs:extension base="baseT">
            <xs:sequence>
              <xs:element name="b" type="xs:token" minOccurs="0"/>
            </xs:sequence>
            <xs:attribute name="tag" type="xs:NCName"/>
          </xs:extension>
        </xs:complexContent>
      </xs:complexType>
      <xs:element name="t" type="midT"/>
    </xs:schema>""", key_column="rid")
    assert [c.name for c in spec.columns] == ["rid", "tag", "a", "b"]
    assert not [c for c in spec.columns if c.name == "a"][0].nullable
    got = _viol(spark, spec,
                [("r1", "ok", "3", "x"),
                 ("r2", "not ok", "y", None),
                 ("r3", None, None, None)],
                "rid string, tag string, a string, b string")
    assert set(got) == {("r2", "facet:pattern:tag"),
                        ("r2", "facet:pattern:a"),
                        ("r2", "facet:decode:a"),
                        ("r3", "required:a")}


def test_complexcontent_restriction_overrides(spark):
    """A restriction REPLACES the content model and overrides
    attributes by name; use='prohibited' drops the base attribute and
    asserts the column NULL (complex_types.py:361-410)."""
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:complexType name="baseT">
        <xs:sequence>
          <xs:element name="a" type="xs:int" minOccurs="0"/>
          <xs:element name="b" type="xs:token" minOccurs="0"/>
        </xs:sequence>
        <xs:attribute name="rid" type="xs:string" use="required"/>
        <xs:attribute name="legacy" type="xs:token"/>
        <xs:attribute name="n" type="xs:int"/>
      </xs:complexType>
      <xs:element name="t">
        <xs:complexType>
          <xs:complexContent>
            <xs:restriction base="baseT">
              <xs:sequence>
                <xs:element name="a" type="xs:int"/>
              </xs:sequence>
              <xs:attribute name="legacy" use="prohibited"/>
              <xs:attribute name="n" use="required">
                <xs:simpleType>
                  <xs:restriction base="xs:int">
                    <xs:maxInclusive value="9"/>
                  </xs:restriction>
                </xs:simpleType>
              </xs:attribute>
            </xs:restriction>
          </xs:complexContent>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    # restriction's model replaced the base's: only 'a', now required
    assert [c.name for c in spec.columns] == ["rid", "n", "a"]
    got = _viol(spark, spec,
                [("r1", "5", None, "1"),
                 ("r2", "11", "old", "2"),
                 ("r3", None, None, None)],
                "rid string, n string, legacy string, a string")
    assert set(got) == {("r2", "facet:maxInclusive:n"),
                        ("r2", "assert:prohibited_legacy"),
                        ("r3", "required:n"),
                        ("r3", "required:a")}


def test_simplecontent_extension_and_restriction(spark):
    """simpleContent: the text content becomes the value column, its
    type resolved through the chain with restriction facets as a
    derivation step (complex_types.py:302-359)."""
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:complexType name="priced">
        <xs:simpleContent>
          <xs:extension base="xs:decimal">
            <xs:attribute name="rid" type="xs:string" use="required"/>
            <xs:attribute name="cur" type="xs:token"/>
          </xs:extension>
        </xs:simpleContent>
      </xs:complexType>
      <xs:complexType name="bounded">
        <xs:simpleContent>
          <xs:restriction base="priced">
            <xs:minInclusive value="0"/>
            <xs:attribute name="cur" type="xs:token" use="required"/>
          </xs:restriction>
        </xs:simpleContent>
      </xs:complexType>
      <xs:element name="t" type="bounded"/>
    </xs:schema>""", key_column="rid", value_column="amount")
    assert [c.name for c in spec.columns] == ["rid", "cur", "amount"]
    got = _viol(spark, spec,
                [("r1", "USD", "9.99"), ("r2", "EUR", "-3"),
                 ("r3", None, "1e2"), ("r4", "GBP", "abc")],
                "rid string, cur string, amount string")
    # strict xsd:decimal lexical space inherited through the chain
    # ('1e2' invalid), restriction facet applied, attr override
    assert set(got) == {("r2", "facet:minInclusive:amount"),
                        ("r3", "facet:pattern:amount"),
                        ("r3", "required:cur"),
                        ("r4", "facet:pattern:amount")}


def test_xsd11_all_extends_all_merges(spark):
    """XSD 1.1: an 'all' extension of an 'all' base merges members
    into one order-free group (complex_types.py:976-996)."""
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:complexType name="b">
        <xs:all><xs:element name="a"/></xs:all>
        <xs:attribute name="rid"/>
      </xs:complexType>
      <xs:element name="t"><xs:complexType><xs:complexContent>
        <xs:extension base="b">
          <xs:all><xs:element name="c"/></xs:all>
        </xs:extension></xs:complexContent></xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid", tags_column="tags", xsd11=True)
    got = _viol(spark, spec,
                [("r1", ["a", "c"]), ("r2", ["c", "a"]),
                 ("r3", ["a"]), ("r4", ["a", "c", "a"])],
                "rid string, tags array<string>")
    assert set(got) == {("r3", "content:t:tags"),
                        ("r4", "content:t:tags")}


@pytest.mark.parametrize("xsd,match,kw", [
    # XSD 1.0 'all'-extension prohibitions (reference wordings,
    # complex_types.py:465-480)
    (f'''<xs:schema {XS}><xs:complexType name="b">
       <xs:sequence><xs:element name="a"/></xs:sequence>
       </xs:complexType>
       <xs:element name="t"><xs:complexType><xs:complexContent>
       <xs:extension base="b"><xs:all><xs:element name="c"/></xs:all>
       </xs:extension></xs:complexContent></xs:complexType>
       </xs:element></xs:schema>''',
     "cannot extend a complex content with xs:all", {}),
    (f'''<xs:schema {XS}><xs:complexType name="b">
       <xs:all><xs:element name="a"/></xs:all></xs:complexType>
       <xs:element name="t"><xs:complexType><xs:complexContent>
       <xs:extension base="b">
       <xs:sequence><xs:element name="c"/></xs:sequence>
       </xs:extension></xs:complexContent></xs:complexType>
       </xs:element></xs:schema>''',
     "xs:sequence cannot extend xs:all", {}),
    (f'''<xs:schema {XS}><xs:complexType name="b">
       <xs:all><xs:element name="a"/></xs:all></xs:complexType>
       <xs:element name="t"><xs:complexType><xs:complexContent>
       <xs:extension base="b"><xs:choice><xs:element name="c"/>
       </xs:choice></xs:extension></xs:complexContent></xs:complexType>
       </xs:element></xs:schema>''',
     "XSD 1.0 does not allow extension of a not empty 'all'", {}),
    # XSD 1.1 all-merge preconditions (complex_types.py:983-990)
    (f'''<xs:schema {XS}><xs:complexType name="b">
       <xs:all><xs:element name="a"/></xs:all></xs:complexType>
       <xs:element name="t"><xs:complexType><xs:complexContent>
       <xs:extension base="b">
       <xs:sequence><xs:element name="c"/></xs:sequence>
       </xs:extension></xs:complexContent></xs:complexType>
       </xs:element></xs:schema>''',
     "with a different model", {"xsd11": True}),
    (f'''<xs:schema {XS}><xs:complexType name="b">
       <xs:all minOccurs="0"><xs:element name="a"/></xs:all>
       </xs:complexType>
       <xs:element name="t"><xs:complexType><xs:complexContent>
       <xs:extension base="b"><xs:all><xs:element name="c"/></xs:all>
       </xs:extension></xs:complexContent></xs:complexType>
       </xs:element></xs:schema>''',
     "minOccurs must be the same", {"xsd11": True}),
    # merge/override misuse
    (f'''<xs:schema {XS}><xs:complexType name="b">
       <xs:attribute name="rid"/><xs:attribute name="x"/>
       </xs:complexType>
       <xs:element name="t"><xs:complexType><xs:complexContent>
       <xs:extension base="b"><xs:attribute name="x"/>
       </xs:extension></xs:complexContent></xs:complexType>
       </xs:element></xs:schema>''',
     "duplicated attribute 'x'", {}),
    # circularity (reference circularity checks)
    (f'''<xs:schema {XS}><xs:group name="g"><xs:sequence>
       <xs:group ref="g"/></xs:sequence></xs:group>
       <xs:element name="t"><xs:complexType><xs:sequence>
       <xs:group ref="g"/></xs:sequence><xs:attribute name="rid"/>
       </xs:complexType></xs:element></xs:schema>''',
     "circular definition of group 'g'", {"tags_column": "tags"}),
    (f'''<xs:schema {XS}>
       <xs:attributeGroup name="ag"><xs:attributeGroup ref="ag"/>
       </xs:attributeGroup>
       <xs:element name="t"><xs:complexType>
       <xs:attributeGroup ref="ag"/><xs:attribute name="rid"/>
       </xs:complexType></xs:element></xs:schema>''',
     "circular definition of attributeGroup 'ag'", {}),
    (f'''<xs:schema {XS}><xs:complexType name="a">
       <xs:complexContent><xs:extension base="b"/></xs:complexContent>
       </xs:complexType><xs:complexType name="b">
       <xs:complexContent><xs:extension base="a"/></xs:complexContent>
       </xs:complexType>
       <xs:element name="t" type="a"/></xs:schema>''',
     "circular definition of complexType", {}),
    # simpleContent base sanity
    (f'''<xs:schema {XS}><xs:complexType name="b">
       <xs:sequence><xs:element name="a"/></xs:sequence>
       </xs:complexType>
       <xs:element name="t"><xs:complexType><xs:simpleContent>
       <xs:extension base="b"><xs:attribute name="rid"/>
       </xs:extension></xs:simpleContent></xs:complexType>
       </xs:element></xs:schema>''',
     "has no simple content", {}),
])
def test_derivation_errors(xsd, match, kw):
    with pytest.raises(ValueError, match=match):
        spec_from_xsd(xsd, key_column="rid", **kw)


# --------------------------- real reference schema files import as-is

_CASES = "/root/reference/tests/test_cases"


def test_reference_collection_person(spark):
    """The reference's flagship example schema imports directly:
    collection.xsd's personType row (examples/collection/collection.xsd,
    profiled by profiling/profile_decoder.py)."""
    spec = spec_from_xsd(f"{_CASES}/examples/collection/collection.xsd",
                         element="person", key_column="id")
    assert [c.name for c in spec.columns] \
        == ["id", "name", "born", "dead", "qualification"]
    got = _viol(spark, spec,
                # rows shaped like collection.xml's person elements
                [("vdg", "Vincent van Gogh", "1853-03-30",
                  "1890-07-29", "painter"),
                 ("pm", "Paul Morand", "1888-13-01", None, None),
                 (None, "Anon", "1900-01-01", None, "unknown")],
                "id string, name string, born string, dead string, "
                "qualification string")
    assert set(got) == {("pm", "facet:pattern:born"),
                        (None, "required:id")}


def test_reference_menu_schema(spark):
    """menù.xsd (non-ASCII names): repeated simple children become
    array columns with occurs as length facets."""
    spec = spec_from_xsd(f"{_CASES}/examples/menù/menù.xsd",
                         key_column="rid")
    assert spec.name == "menù"
    col = {c.name: c for c in spec.columns}
    assert col["antipasto"].max_length == 10
    assert not col["antipasto"].nullable  # minOccurs defaults to 1
    got = _viol(spark, spec,
                [("r1", ["a"], ["b"], ["c"], ["d"]),
                 ("r2", [], ["b"], ["c"], list("0123456789x"))],
                "rid string, antipasto array<string>, "
                "primo array<string>, secondo array<string>, "
                "dolce array<string>")
    assert set(got) == {("r2", "facet:minLength:antipasto"),
                        ("r2", "facet:maxLength:dolce")}


def test_reference_complex_extensions_schema(spark):
    """features/derivations/complex-extensions.xsd imports as a type
    library: case 1 (complexContent extension over a simpleContent
    base with no group — LEGAL, content stays simple) and case 3."""
    path = f"{_CASES}/features/derivations/complex-extensions.xsd"
    spec = spec_from_xsd(path, element="external-word",
                         key_column="language", value_column="word")
    assert [c.name for c in spec.columns] \
        == ["language", "other-language", "word"]
    assert {c.name: c.default for c in spec.columns}["other-language"] \
        == "italian"
    spec3 = spec_from_xsd(path, element="derivedComplexContentType",
                          key_column="dummy", value_column="expr")
    assert [c.name for c in spec3.columns] \
        == ["dummy", "resetTypeRef", "expr"]
    got = _viol(spark, spec3,
                [("d1", "ok", "x"), ("d2", "not a Name", "y")],
                "dummy string, resetTypeRef string, expr string")
    assert set(got) == {("d2", "facet:pattern:resetTypeRef")}


def test_reference_mixed_type_rejected():
    """Case 2 of the same file: extPersonType extends the MIXED
    personType with an element-only non-empty group — the reference's
    content-type mismatch error (complex_types.py:478-484)."""
    path = f"{_CASES}/features/derivations/complex-extensions.xsd"
    with pytest.raises(ValueError,
                       match="different content type \\(mixed=True\\)"):
        spec_from_xsd(path, element="extPersonType", key_column="x",
                      tags_column="children")


# ------------------- element refs, substitution groups, default attrs

def test_element_ref_and_substitution_group(spark):
    """A ref particle naming a substitution head admits the members
    (transitively) and honors the head's abstract flag
    (elements.py:609-623, xsd_globals substitution maps)."""
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:element name="head" abstract="true" type="xs:string"/>
      <xs:element name="m1" substitutionGroup="head" type="xs:string"/>
      <xs:element name="m2" substitutionGroup="head" type="xs:string"/>
      <xs:element name="m3" substitutionGroup="m1" type="xs:string"/>
      <xs:element name="t">
        <xs:complexType>
          <xs:sequence>
            <xs:element ref="head" maxOccurs="2"/>
          </xs:sequence>
          <xs:attribute name="rid"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", element="t", key_column="rid",
                         tags_column="tags")
    model = spec.content_models[0].model
    head = model.children[0]
    assert head.abstract and sorted(head.substitutes) \
        == ["m1", "m2", "m3"]
    got = _viol(spark, spec,
                [("r1", ["m1"]), ("r2", ["m2", "m3"]),
                 ("r3", ["head"]),          # abstract head itself
                 ("r4", ["m1", "m2", "m3"])],   # 3 > maxOccurs 2
                "rid string, tags array<string>")
    assert set(got) == {("r3", "content:t:tags"),
                        ("r4", "content:t:tags")}


def test_element_ref_flat_column(spark):
    """A ref'd SIMPLE global element becomes a column: type from the
    global declaration, occurs from the reference particle."""
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:element name="score">
        <xs:simpleType>
          <xs:restriction base="xs:int">
            <xs:maxInclusive value="100"/>
          </xs:restriction>
        </xs:simpleType>
      </xs:element>
      <xs:element name="t">
        <xs:complexType>
          <xs:sequence>
            <xs:element ref="score" minOccurs="0"/>
          </xs:sequence>
          <xs:attribute name="rid"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", element="t", key_column="rid")
    by = {c.name: c for c in spec.columns}
    assert by["score"].nullable            # ref's minOccurs=0
    got = _viol(spark, spec, [("r1", "99"), ("r2", "101"), ("r3", None)],
                "rid string, score string")
    assert set(got) == {("r2", "facet:maxInclusive:score")}


def test_repeated_top_sequence_maps_to_arrays():
    """A TOP sequence with maxOccurs>1 repeats the whole child list —
    each child maps to an ARRAY column whose size carries the
    repetition count (words.xsd shape; round 7 — previously this
    required tags_column). Children occurring exactly once per
    repetition are count drivers: a coupling assert ties their sizes
    together and to the group occurs."""
    spec = spec_from_xsd(f"""
    <xs:schema {XS}>
      <xs:element name="words">
        <xs:complexType>
          <xs:sequence minOccurs="1" maxOccurs="unbounded">
            <xs:element name="word" type="xs:string"/>
          </xs:sequence>
          <xs:attribute name="rid" type="xs:string" use="required"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>""", key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["word"].dtype == "array<string>"
    assert by_name["word"].min_length == 1
    assert by_name["word"].max_length is None
    assert not by_name["word"].nullable
    assert any(a.name.startswith("group_occurs") for a in spec.asserts)


def test_default_attributes_apply_and_optout(spark):
    """XSD 1.1 defaultAttributes: the named attributeGroup applies to
    the row type unless it opts out with defaultAttributesApply=false
    (features/attributes/default_attributes.xsd)."""
    schema = f"""
    <xs:schema {XS} defaultAttributes="default_attrs"
               xmlns="ns" targetNamespace="ns">
      <xs:attributeGroup name="default_attrs">
        <xs:attribute name="node-id" type="xs:positiveInteger"
                      use="required"/>
        <xs:attribute name="colour" type="xs:token"/>
      </xs:attributeGroup>
      <xs:element name="a">
        <xs:complexType>
          <xs:attribute name="rid"/>
        </xs:complexType>
      </xs:element>
      <xs:element name="b">
        <xs:complexType defaultAttributesApply="false">
          <xs:attribute name="rid"/>
        </xs:complexType>
      </xs:element>
    </xs:schema>"""
    spec_a = spec_from_xsd(schema, element="a", key_column="rid")
    assert [c.name for c in spec_a.columns] \
        == ["rid", "node-id", "colour"]
    got = _viol(spark, spec_a,
                [("r1", "3", "red"), ("r2", "0", None), ("r3", None, None)],
                "rid string, `node-id` string, colour string")
    assert set(got) >= {("r3", "required:node-id")}
    assert any(g == ("r2", "facet:minInclusive:node-id")
               or g[0] == "r2" for g in got)  # 0 not a positiveInteger
    spec_b = spec_from_xsd(schema, element="b", key_column="rid")
    assert [c.name for c in spec_b.columns] == ["rid"]


def test_reference_default_attributes_file():
    """The reference's default_attributes.xsd imports: tree opts out
    of the schema default attributes."""
    path = f"{_CASES}/features/attributes/default_attributes.xsd"
    spec = spec_from_xsd(path, element="tree", key_column="rid",
                         tags_column="kids")
    assert [c.name for c in spec.columns] == []   # opted out
    assert spec.content_models and \
        spec.content_models[0].model.children[0].name == "node"


def test_default_requires_optional_use():
    """attributes.py:190-193: 'use' must be 'optional' when a default
    is present — a schema-parse error, mirrored at import."""
    with pytest.raises(ValueError,
                       match="must be 'optional' if the attribute "
                             "'default' is present"):
        spec_from_xsd(f"""
        <xs:schema {XS}><xs:element name="t">
          <xs:complexType>
            <xs:attribute name="rid"/>
            <xs:attribute name="v" type="xs:int" use="required"
                          default="3"/>
          </xs:complexType></xs:element></xs:schema>""",
                      key_column="rid")


def test_reference_vehicles_include_chain(spark):
    """xs:include merges by file location, at most once — the
    vehicles set is a CIRCULAR include chain (vehicles -> cars ->
    types -> cars) and is legal XSD (examples/vehicles/*.xsd)."""
    p = f"{_CASES}/examples/vehicles/vehicles.xsd"
    spec = spec_from_xsd(p, element="vehicles", key_column="rid",
                         tags_column="kids")
    assert [c.name for c in spec.content_models[0].model.children] \
        == ["cars", "bikes"]
    # a complexType that only exists via the include chain resolves
    spec_t = spec_from_xsd(p, element="vehicleType", key_column="make")
    assert [c.name for c in spec_t.columns] == ["make", "model"]
    got = _viol(spark, spec,
                [("r1", ["cars", "bikes"]), ("r2", ["bikes", "cars"])],
                "rid string, kids array<string>")
    assert set(got) == {("r2", "content:vehicles:kids")}


def test_include_from_text_rejected():
    with pytest.raises(ValueError, match="relative"):
        spec_from_xsd(f"""
        <xs:schema {XS}>
          <xs:include schemaLocation="other.xsd"/>
          <xs:element name="t"><xs:complexType>
          <xs:attribute name="rid"/></xs:complexType></xs:element>
        </xs:schema>""", key_column="rid")


@pytest.mark.parametrize("body,match", [
    ('''<xs:attribute name="a1"/><xs:attribute name="a2"/>
        <xs:attribute name="a2"/>''',
     "multiple declaration for attribute 'a2'"),
    ('''<xs:attributeGroup ref="other"/>
        <xs:attributeGroup ref="other"/>''',
     "duplicated attributeGroup 'other'"),
    ('<xs:attribute name="a" use="prohibited" fixed="foo"/>',
     "'fixed' with use=prohibited is not allowed"),
    ('<xs:attribute name="a" type="xs:ID" default="XYZ"/>',
     "xs:ID key attributes cannot have a default value"),
    ('<xs:attribute name="a" type="xs:ID" fixed="XYZ"/>',
     "xs:ID key attributes cannot have a fixed value"),
])
def test_attribute_parse_rules(body, match):
    """Reference attribute parse-error parity
    (tests/validators/test_attributes.py:242-291,403-427,585-593)."""
    with pytest.raises(ValueError, match=match):
        spec_from_xsd(f"""
        <xs:schema {XS}>
          <xs:attributeGroup name="other">
            <xs:attribute name="x"/></xs:attributeGroup>
          <xs:element name="t"><xs:complexType>
            <xs:attribute name="rid"/>{body}
          </xs:complexType></xs:element>
        </xs:schema>""", key_column="rid")


@pytest.mark.parametrize("body,match", [
    ('<xs:element ref="unknown"/>', "unknown element ref 'unknown'"),
    ('<xs:element ref="node" default="foo"/>',
     "cannot carry a default/fixed value constraint"),
])
def test_element_ref_parse_rules(body, match):
    """Reference element-ref parse-error parity
    (tests/validators/test_elements.py:22-46)."""
    with pytest.raises(ValueError, match=match):
        spec_from_xsd(f"""
        <xs:schema {XS}>
          <xs:element name="node" type="xs:string"/>
          <xs:element name="t"><xs:complexType>
            <xs:sequence>{body}</xs:sequence>
            <xs:attribute name="rid"/>
          </xs:complexType></xs:element>
        </xs:schema>""", element="t", key_column="rid",
                      tags_column="tags")


@pytest.mark.parametrize("ics,match", [
    ('''<xs:unique name="u1"><xs:selector xpath="."/>
        <xs:field xpath="@rid"/></xs:unique>
        <xs:unique name="u1"><xs:selector xpath="."/>
        <xs:field xpath="@rid"/></xs:unique>''',
     "duplicated identity constraint name 'u1'"),
    ('''<xs:unique><xs:selector xpath="."/>
        <xs:field xpath="@rid"/></xs:unique>''',
     "missing required attribute 'name'"),
    ('''<xs:key name="k1"><xs:selector xpath="."/>
        <xs:field xpath="@rid"/></xs:key>
        <xs:keyref name="kr1" refer="kr2"><xs:selector xpath="."/>
        <xs:field xpath="@rid"/></xs:keyref>
        <xs:keyref name="kr2" refer="k1"><xs:selector xpath="."/>
        <xs:field xpath="@rid"/></xs:keyref>''',
     "reference to a non key/unique identity constraint"),
    ('''<xs:keyref name="kr"><xs:selector xpath="."/>
        <xs:field xpath="@rid"/></xs:keyref>''',
     "missing required attribute 'refer'"),
])
def test_identity_parse_rules(ics, match):
    """Reference identity parse-error parity
    (tests/validators/test_identities.py:37-72,206-290)."""
    with pytest.raises(ValueError, match=match):
        spec_from_xsd(f"""
        <xs:schema {XS}><xs:element name="t">
          <xs:complexType><xs:attribute name="rid"/></xs:complexType>
          {ics}
        </xs:element></xs:schema>""", key_column="rid")


def test_unknown_substitution_group():
    """elements.py:370-374: substitutionGroup must name a global
    element."""
    with pytest.raises(ValueError, match="unknown substitutionGroup"):
        spec_from_xsd(f"""
        <xs:schema {XS}>
          <xs:element name="m1" substitutionGroup="nope"
                      type="xs:string"/>
          <xs:element name="t"><xs:complexType>
            <xs:attribute name="rid"/></xs:complexType></xs:element>
        </xs:schema>""", element="t", key_column="rid")


def test_circular_substitution_group():
    """xsd_globals.py:640-643 circularity check."""
    with pytest.raises(ValueError,
                       match="circularity found for substitutionGroup"):
        spec_from_xsd(f"""
        <xs:schema {XS}>
          <xs:element name="a" substitutionGroup="b" type="xs:string"/>
          <xs:element name="b" substitutionGroup="a" type="xs:string"/>
          <xs:element name="t"><xs:complexType>
            <xs:attribute name="rid"/></xs:complexType></xs:element>
        </xs:schema>""", element="t", key_column="rid")


def test_reference_decoder_simple_types(spark):
    """features/decoder/simple-types.xsd: a simpleContent extension
    type (year_attr_string_75 — string_75 value + integer attribute)
    and XSD digit/length/hex facets import and validate."""
    path = f"{_CASES}/features/decoder/simple-types.xsd"
    spec = spec_from_xsd(path, element="year_attr_string_75",
                         key_column="Year", value_column="cert")
    assert [c.name for c in spec.columns] == ["Year", "cert"]
    got = _viol(spark, spec,
                [("1999", "ok"), ("MMXX", "x"), ("2000", "y" * 76)],
                "Year string, cert string")
    assert ("MMXX", "facet:pattern:Year") in got
    assert ("2000", "facet:maxLength:cert") in got
    # hexBinary length counts DECODED OCTETS (issue #63 type)
    spec_hex = spec_from_xsd(f"""
    <xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      <xs:simpleType name='hexCode'>
        <xs:restriction base='xs:hexBinary'>
          <xs:length value='4'/>
        </xs:restriction>
      </xs:simpleType>
      <xs:element name="t"><xs:complexType>
        <xs:attribute name="rid"/>
        <xs:attribute name="code" type="hexCode"/>
      </xs:complexType></xs:element>
    </xs:schema>""", key_column="rid")
    got2 = _viol(spark, spec_hex,
                 [("r1", "0A0B0C0D"), ("r2", "0A0B"), ("r3", "zz")],
                 "rid string, code string")
    assert ("r2", "facet:length:code") in got2
    assert any(g[0] == "r3" for g in got2)


def test_reference_type_alternatives(spark):
    """XSD 1.1 xs:alternative -> ConditionalSpec with first-match-wins
    guards (elements.py:654-657, get_alternative_type elements.py:1340;
    features/elements/type_alternatives-no-ns.xsd imports as-is). The
    mixed attributes-only base type contributes an unconstrained
    string value column; each alternative re-types it conditionally."""
    p = f"{_CASES}/features/elements/type_alternatives-no-ns.xsd"
    spec = spec_from_xsd(p, key_column="choice")
    assert [c.name for c in spec.conditionals] \
        == ["alternative_0", "alternative_1", "alternative_2"]
    assert spec.conditionals[0].when == "choice = 'int'"
    assert "NOT (choice = 'int')" in spec.conditionals[1].when
    got = _viol(spark, spec,
                [("int", "3"), ("int2", "3.5"),
                 ("float", "3.5"), ("float2", "abc"),
                 ("bool", "true"), ("bool2", "maybe"),
                 ("other", "anything goes")],
                "choice string, value string")
    # rows are keyed by the 'choice' column here
    bad = {g[0] for g in got}
    assert bad == set()  # 'int2' etc. don't match any test -> free text
    got2 = _viol(spark, spec,
                 [("int", "3"), ("int", "3.5"), ("float", "abc"),
                  ("bool", "maybe"), ("other", "x")],
                 "choice string, value string")
    assert {(g[0], g[1]) for g in got2} \
        == {("int", "cond:alternative_0:facet:pattern:value"),
            ("int", "cond:alternative_0:facet:decode:value"),
            ("float", "cond:alternative_1:facet:pattern:value"),
            ("float", "cond:alternative_1:facet:decode:value"),
            ("bool", "cond:alternative_2:facet:pattern:value"),
            ("bool", "cond:alternative_2:facet:decode:value")}
