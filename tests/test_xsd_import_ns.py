"""Round-6: namespace-aware XSD import — targetNamespace, xs:import,
per-document QName resolution, chameleon include/import adoption, and
the reference's own multi-namespace test cases imported as-is.

Reference parity anchors: loaders.py:85-182 (load_declared_schemas),
schemas.py:330-348 (targetNamespace adoption + default-ns mapping),
features/namespaces/* test cases."""

import pytest

from xmlschema_spark.sources.xsd_import import spec_from_xsd

XS = 'xmlns:xs="http://www.w3.org/2001/XMLSchema"'
REF = "/root/reference/tests/test_cases"


def _imp(xsd, **kw):
    kw.setdefault("key_column", "rid")
    return spec_from_xsd(xsd, **kw)


# ------------------------------------------------- QName resolution

def test_cross_namespace_type_ref_via_import(tmp_path):
    (tmp_path / "other.xsd").write_text(f"""
      <xs:schema {XS} targetNamespace="urn:other"
                 xmlns="urn:other">
        <xs:simpleType name="code">
          <xs:restriction base="xs:string">
            <xs:pattern value="[A-Z]{{3}}"/>
          </xs:restriction>
        </xs:simpleType>
      </xs:schema>""")
    (tmp_path / "main.xsd").write_text(f"""
      <xs:schema {XS} targetNamespace="urn:main"
                 xmlns:tns="urn:main" xmlns:o="urn:other">
        <xs:import namespace="urn:other" schemaLocation="other.xsd"/>
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute name="rid" type="xs:string" use="required"/>
            <xs:attribute name="c" type="o:code"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>""")
    spec = _imp(str(tmp_path / "main.xsd"))
    assert spec.name == "row"
    col = {c.name: c for c in spec.columns}["c"]
    assert col.base == "{urn:other}code"
    assert spec.simple_types["{urn:other}code"].pattern == ["[A-Z]{3}"]


def test_locations_param_satisfies_locationless_import():
    other = f"""
      <xs:schema {XS} targetNamespace="urn:other">
        <xs:simpleType name="pct">
          <xs:restriction base="xs:int">
            <xs:maxInclusive value="100"/>
          </xs:restriction>
        </xs:simpleType>
      </xs:schema>"""
    main = f"""
      <xs:schema {XS} xmlns:o="urn:other">
        <xs:import namespace="urn:other"/>
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute name="rid" type="xs:string"/>
            <xs:attribute name="p" type="o:pct"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>"""
    spec = _imp(main, locations={"urn:other": other})
    assert spec.simple_types["{urn:other}pct"].max_inclusive == "100"
    # without locations the namespace stays deferred: the REFERENCE
    # into it fails at resolution, naming the fix
    with pytest.raises(ValueError, match="locations="):
        _imp(main)


def test_default_ns_maps_to_target_namespace():
    """features/namespaces/default_ns_valid1.xsd shape: default xmlns
    = targetNamespace, unprefixed refs find target-ns components."""
    spec = _imp(f"""
      <xs:schema {XS} xmlns="urn:m" targetNamespace="urn:m">
        <xs:simpleType name="rootType">
          <xs:restriction base="xs:string"/>
        </xs:simpleType>
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute name="rid" type="rootType"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>""")
    col = {c.name: c for c in spec.columns}["rid"]
    assert col.base == "{urn:m}rootType"


def test_default_ns_invalid_parity():
    """features/namespaces/default_ns_invalid.xsd: an unprefixed ref
    in a targetNamespace'd schema WITHOUT a default mapping resolves
    to no-namespace and must NOT find the target-ns component."""
    with pytest.raises(ValueError, match="unknown type 'rootType'"):
        _imp(f"""
          <xs:schema {XS} targetNamespace="urn:m">
            <xs:simpleType name="rootType">
              <xs:restriction base="xs:string"/>
            </xs:simpleType>
            <xs:element name="row">
              <xs:complexType>
                <xs:attribute name="rid" type="rootType"/>
              </xs:complexType>
            </xs:element>
          </xs:schema>""")


def test_builtin_not_shadowing_user_type():
    """A global simpleType whose local name collides with an XSD
    built-in ('token') wins over the built-in for unqualified refs;
    xs:token still reaches the built-in (round-5 ADVICE fix)."""
    spec = _imp(f"""
      <xs:schema {XS}>
        <xs:simpleType name="token">
          <xs:restriction base="xs:string">
            <xs:length value="4"/>
          </xs:restriction>
        </xs:simpleType>
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute name="rid" type="token"/>
            <xs:attribute name="w" type="xs:token"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>""")
    cols = {c.name: c for c in spec.columns}
    assert cols["rid"].base == "token"          # the user type
    assert spec.simple_types["token"].length == 4
    assert cols["w"].dtype == "xsd:token"       # the built-in


def test_unknown_prefix_reference_wording():
    with pytest.raises(ValueError,
                       match="prefix 'nope' not found in namespace"):
        _imp(f"""
          <xs:schema {XS}>
            <xs:element name="row">
              <xs:complexType>
                <xs:attribute name="rid" type="nope:thing"/>
              </xs:complexType>
            </xs:element>
          </xs:schema>""")


# ------------------------------------------------- import parity errors

def test_import_own_namespace_rejected():
    with pytest.raises(ValueError, match="must be different from "
                                         "schema's 'targetNamespace'"):
        _imp(f'<xs:schema {XS} targetNamespace="urn:t">'
             '<xs:import namespace="urn:t"/></xs:schema>')


def test_import_no_namespace_into_no_namespace_schema_rejected():
    with pytest.raises(ValueError,
                       match="must have a 'targetNamespace'"):
        _imp(f'<xs:schema {XS}><xs:import/></xs:schema>')


def test_import_target_namespace_mismatch(tmp_path):
    (tmp_path / "o.xsd").write_text(
        f'<xs:schema {XS} targetNamespace="urn:actual"/>')
    (tmp_path / "m.xsd").write_text(
        f'<xs:schema {XS} targetNamespace="urn:m">'
        '<xs:import namespace="urn:declared" schemaLocation="o.xsd"/>'
        '<xs:element name="row"><xs:complexType>'
        '<xs:attribute name="rid" type="xs:string"/>'
        '</xs:complexType></xs:element></xs:schema>')
    with pytest.raises(ValueError,
                       match="found 'urn:actual' instead of "
                             "'urn:declared'"):
        _imp(str(tmp_path / "m.xsd"))


def test_include_target_namespace_mismatch(tmp_path):
    (tmp_path / "inc.xsd").write_text(
        f'<xs:schema {XS} targetNamespace="urn:other"/>')
    (tmp_path / "m.xsd").write_text(
        f'<xs:schema {XS} targetNamespace="urn:m">'
        '<xs:include schemaLocation="inc.xsd"/>'
        '</xs:schema>')
    with pytest.raises(ValueError,
                       match="of an included schema differs from"):
        _imp(str(tmp_path / "m.xsd"))


# ------------------------------------------------- chameleon adoption

def test_chameleon_include_adopts_namespace(tmp_path):
    """A no-namespace included document is adopted into the including
    schema's namespace, its unbound default prefix mapped to it
    (schemas.py:345-348)."""
    (tmp_path / "cham.xsd").write_text(f"""
      <xs:schema {XS}>
        <xs:simpleType name="sz">
          <xs:restriction base="xs:int">
            <xs:maxInclusive value="9"/>
          </xs:restriction>
        </xs:simpleType>
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute name="rid" type="xs:string"/>
            <xs:attribute name="s" type="sz"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>""")
    (tmp_path / "m.xsd").write_text(
        f'<xs:schema {XS} targetNamespace="urn:m" xmlns="urn:m">'
        '<xs:include schemaLocation="cham.xsd"/>'
        '</xs:schema>')
    spec = _imp(str(tmp_path / "m.xsd"))
    col = {c.name: c for c in spec.columns}["s"]
    assert col.base == "{urn:m}sz"       # adopted, then resolved
    assert spec.simple_types["{urn:m}sz"].max_inclusive == "9"


def test_adopted_import_of_no_tns_document():
    """import namespace=N of a document WITHOUT targetNamespace adopts
    N (the import-side chameleon, schemas.py:345-348)."""
    other = f"""
      <xs:schema {XS}>
        <xs:simpleType name="t">
          <xs:restriction base="xs:string"/>
        </xs:simpleType>
      </xs:schema>"""
    spec = _imp(f"""
      <xs:schema {XS} xmlns:o="urn:o">
        <xs:import namespace="urn:o"/>
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute name="rid" type="o:t"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>""", locations={"urn:o": other})
    assert "{urn:o}t" in spec.simple_types


# ------------------------------------------------- attribute refs

def test_attribute_ref_resolves_global_declaration():
    """xs:attribute ref= takes its TYPE from the global declaration,
    use/default from the reference (attributes.py:98-125)."""
    spec = _imp(f"""
      <xs:schema {XS} targetNamespace="urn:m" xmlns="urn:m">
        <xs:attribute name="step" type="xs:positiveInteger"
                      default="1"/>
        <xs:attribute name="rid" type="xs:string"/>
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute ref="rid" use="required"/>
            <xs:attribute ref="step"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>""")
    cols = {c.name: c for c in spec.columns}
    assert cols["rid"].nullable is False          # use=required wins
    assert cols["step"].dtype == "xsd:positiveInteger"
    assert cols["step"].default == "1"            # global default kept


def test_attribute_ref_fixed_consistency():
    base = f"""
      <xs:schema {XS} targetNamespace="urn:m" xmlns="urn:m">
        <xs:attribute name="v" type="xs:string" fixed="a"/>
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute name="rid" type="xs:string"/>
            <xs:attribute ref="v" fixed="%s"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>"""
    spec = _imp(base % "a")                       # same fixed: fine
    assert {c.name: c for c in spec.columns}["v"].fixed == "a"
    with pytest.raises(ValueError,
                       match="different fixed value 'a'"):
        _imp(base % "b")


def test_attribute_ref_disallows_form_and_type():
    with pytest.raises(ValueError,
                       match="not allowed when attribute reference"):
        _imp(f"""
          <xs:schema {XS} targetNamespace="urn:m" xmlns="urn:m">
            <xs:attribute name="v" type="xs:string"/>
            <xs:element name="row">
              <xs:complexType>
                <xs:attribute name="rid" type="xs:string"/>
                <xs:attribute ref="v" type="xs:int"/>
              </xs:complexType>
            </xs:element>
          </xs:schema>""")


def test_attribute_ref_xml_namespace_builtins(spark):
    """ref='xml:lang' / 'xml:space' resolve against the synthesized
    xml.xsd declarations the reference bundles as a base schema."""
    from xmlschema_spark import validate

    spec = _imp(f"""
      <xs:schema {XS}
                 xmlns:xml="http://www.w3.org/XML/1998/namespace">
        <xs:import namespace="http://www.w3.org/XML/1998/namespace"/>
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute name="rid" type="xs:string"/>
            <xs:attribute ref="xml:lang"/>
            <xs:attribute ref="xml:space"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>""")
    cols = {c.name: c for c in spec.columns}
    assert cols["space"].default == "preserve"
    df = spark.createDataFrame(
        [("a", "en", "default"), ("b", "", "preserve"),
         ("c", "not a lang!", "noenum")],
        "rid string, lang string, space string")
    got = sorted((r.row_key, r.constraint) for r in
                 validate(df, spec).violations.collect())
    assert ("c", "facet:enumeration:space") in got
    assert any(k == "c" and "lang" in c for k, c in got)
    assert [k for k, _ in got] == ["c", "c"]      # a, b fully valid


def test_attribute_ref_unknown_parity():
    """issue_266b-2.xsd as-is: an unprefixed ref in a targetNamespace'd
    schema without a default mapping resolves to no-namespace — the
    declaration is in NO namespace's registry (reference parse error
    'unknown attribute')."""
    with pytest.raises(ValueError,
                       match="unknown attribute 'testAttribute3'"):
        spec_from_xsd(
            f"{REF}/issues/issue_266/issue_266b-2.xsd",
            key_column="rid")


# ------------------------------------------------- mixed content

def test_mixed_content_value_column_plus_model(spark):
    """Round-6 mixed contract: character data -> value column
    (unconstrained string), child tags -> content model, side by
    side."""
    from xmlschema_spark import validate

    spec = _imp(f"""
      <xs:schema {XS}>
        <xs:element name="row">
          <xs:complexType mixed="true">
            <xs:sequence>
              <xs:element name="b" maxOccurs="2"/>
              <xs:element name="i" minOccurs="0"/>
            </xs:sequence>
            <xs:attribute name="rid" type="xs:string"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>""", tags_column="children")
    names = {c.name for c in spec.columns}
    assert "value" in names                     # the text content
    assert spec.content_models and \
        spec.content_models[0].column == "children"
    df = spark.createDataFrame(
        [("a", "some text", ["b", "i"]),
         ("b", None, ["b", "b", "i"]),
         ("c", "txt", ["i", "b"])],              # wrong order
        "rid string, value string, children array<string>")
    bad = [r.row_key for r in validate(df, spec).violations.collect()]
    assert bad == ["c"]


def test_mixed_extension_rules():
    """Reference complex_types.py:478-484: a non-empty extension group
    must declare the SAME mixed-ness as its base; an empty extension
    keeps the base's content type (mixed included)."""
    tpl = f"""
      <xs:schema {XS}>
        <xs:complexType name="baseT" mixed="true">
          <xs:sequence><xs:element name="kid"/></xs:sequence>
        </xs:complexType>
        <xs:element name="row">
          <xs:complexType %s>
            <xs:complexContent>
              <xs:extension base="baseT">
                %s
                <xs:attribute name="rid" type="xs:string"/>
              </xs:extension>
            </xs:complexContent>
          </xs:complexType>
        </xs:element>
      </xs:schema>"""
    more = "<xs:sequence><xs:element name='more'/></xs:sequence>"
    # matching mixed-ness: value column + combined model
    spec = _imp(tpl % ('mixed="true"', more), tags_column="children")
    assert "value" in {c.name for c in spec.columns}
    kids = [p.name for c in spec.content_models
            for p in _flat_particles(c.model)]
    assert kids == ["kid", "more"]
    # element-only extension of a mixed base with a non-empty group:
    # the reference's content-type mismatch error
    with pytest.raises(ValueError,
                       match="different content type \\(mixed=True\\)"):
        _imp(tpl % ("", more), tags_column="children")
    # empty extension group: content (and mixed-ness) stays the base's
    spec2 = _imp(tpl % ("", ""), tags_column="children")
    assert "value" in {c.name for c in spec2.columns}


def _flat_particles(p):
    if p.kind == "element":
        return [p]
    out = []
    for c in p.children:
        out.extend(_flat_particles(c))
    return out


def test_emptiable_mixed_still_bare_string():
    spec = _imp(f"""
      <xs:schema {XS}>
        <xs:element name="row">
          <xs:complexType mixed="true">
            <xs:attribute name="rid" type="xs:string"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>""")
    cols = {c.name: c for c in spec.columns}
    assert cols["value"].dtype == "string"
    assert not spec.content_models


# ------------------------------------------------- QName / NOTATION

def test_qname_column_prefix_binding_and_enum(spark):
    """xs:QName values resolve prefixes against the SPEC's namespace
    map (the schema document's root bindings); enumeration compares
    EXPANDED names, so two prefixes bound to the same URI are equal
    (builtins.py:139-145)."""
    from xmlschema_spark import validate

    spec = _imp(f"""
      <xs:schema {XS} xmlns:a="urn:one" xmlns:b="urn:one"
                 xmlns:c="urn:two">
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute name="rid" type="xs:string"/>
            <xs:attribute name="q">
              <xs:simpleType>
                <xs:restriction base="xs:QName">
                  <xs:enumeration value="a:ok"/>
                  <xs:enumeration value="c:fine"/>
                </xs:restriction>
              </xs:simpleType>
            </xs:attribute>
          </xs:complexType>
        </xs:element>
      </xs:schema>""")
    assert spec.namespaces["a"] == "urn:one"
    df = spark.createDataFrame(
        [("1", "a:ok"), ("2", "b:ok"),      # same URI as a: -> equal
         ("3", "c:ok"),                      # bound, not in enum
         ("4", "zz:ok"),                     # unbound prefix
         ("5", "not a name"),                # lexical failure
         ("6", "c:fine")],
        "rid string, q string")
    got = sorted((r.row_key, r.constraint) for r in
                 validate(df, spec).violations.collect())
    assert got == [
        ("3", "facet:enumeration:q"),
        ("4", "facet:qnamePrefix:q"),
        ("5", "facet:pattern:q"),
    ]


def test_notation_subtype_with_declared_notations(spark):
    from xmlschema_spark import validate

    spec = _imp(f"""
      <xs:schema {XS}>
        <xs:notation name="png" public="image/png"/>
        <xs:notation name="jpeg" system="file:jpeg"/>
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute name="rid" type="xs:string"/>
            <xs:attribute name="fmt">
              <xs:simpleType>
                <xs:restriction base="xs:NOTATION">
                  <xs:enumeration value="png"/>
                  <xs:enumeration value="jpeg"/>
                </xs:restriction>
              </xs:simpleType>
            </xs:attribute>
          </xs:complexType>
        </xs:element>
      </xs:schema>""")
    df = spark.createDataFrame([("1", "png"), ("2", "gif")],
                               "rid string, fmt string")
    got = [(r.row_key, r.constraint) for r in
           validate(df, spec).violations.collect()]
    assert got == [("2", "facet:enumeration:fmt")]


def test_notation_enum_must_match_declaration():
    with pytest.raises(ValueError,
                       match="must match a notation declaration"):
        _imp(f"""
          <xs:schema {XS}>
            <xs:notation name="png" public="image/png"/>
            <xs:element name="row">
              <xs:complexType>
                <xs:attribute name="rid" type="xs:string"/>
                <xs:attribute name="fmt">
                  <xs:simpleType>
                    <xs:restriction base="xs:NOTATION">
                      <xs:enumeration value="gif"/>
                    </xs:restriction>
                  </xs:simpleType>
                </xs:attribute>
              </xs:complexType>
            </xs:element>
          </xs:schema>""")


def test_notation_direct_use_rejected():
    from xmlschema_spark.plans.compiler import compile_plan
    spec = _imp(f"""
      <xs:schema {XS}>
        <xs:element name="row">
          <xs:complexType>
            <xs:attribute name="rid" type="xs:string"/>
            <xs:attribute name="fmt" type="xs:NOTATION"/>
          </xs:complexType>
        </xs:element>
      </xs:schema>""")
    with pytest.raises(ValueError,
                       match="only against a subtype with an "
                             "enumeration facet"):
        compile_plan(spec)


def test_notation_requires_public_or_system():
    with pytest.raises(ValueError,
                       match="'public' or a 'system' attribute"):
        _imp(f'<xs:schema {XS}><xs:notation name="n"/>'
             '<xs:element name="row"><xs:complexType>'
             '<xs:attribute name="rid" type="xs:string"/>'
             '</xs:complexType></xs:element></xs:schema>')


# ------------------------------------------------- redefine / override

_BASE_LIB = """
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           targetNamespace="urn:m" xmlns="urn:m">
  <xs:simpleType name="size">
    <xs:restriction base="xs:int">
      <xs:maxInclusive value="100"/>
    </xs:restriction>
  </xs:simpleType>
</xs:schema>"""


def _redef_main(body):
    return (f'<xs:schema {XS} targetNamespace="urn:m" xmlns="urn:m">'
            f"{body}"
            '<xs:element name="row"><xs:complexType>'
            '<xs:attribute name="rid" type="xs:string"/>'
            '<xs:attribute name="s" type="size"/>'
            '</xs:complexType></xs:element></xs:schema>')


def test_redefine_simpletype_chains_onto_original(tmp_path, spark):
    """xs:redefine: the redefining restriction derives from the
    ORIGINAL definition (self-reference), so both the original's and
    the redefinition's facets apply (xsd_globals redefinition
    semantics)."""
    from xmlschema_spark import validate

    (tmp_path / "lib.xsd").write_text(_BASE_LIB)
    (tmp_path / "m.xsd").write_text(_redef_main(
        '<xs:redefine schemaLocation="lib.xsd">'
        '<xs:simpleType name="size">'
        '<xs:restriction base="size"><xs:minInclusive value="10"/>'
        '</xs:restriction></xs:simpleType></xs:redefine>'))
    spec = _imp(str(tmp_path / "m.xsd"))
    assert "{urn:m}size__redefined" in spec.simple_types
    df = spark.createDataFrame(
        [("a", "50"), ("b", "5"), ("c", "500")], "rid string, s string")
    got = sorted((r.row_key, r.constraint) for r in
                 validate(df, spec).violations.collect())
    assert got == [("b", "facet:minInclusive:s"),   # redefinition
                   ("c", "facet:maxInclusive:s")]   # original kept


def test_redefine_without_self_reference_rejected(tmp_path):
    (tmp_path / "lib.xsd").write_text(_BASE_LIB)
    (tmp_path / "m.xsd").write_text(_redef_main(
        '<xs:redefine schemaLocation="lib.xsd">'
        '<xs:simpleType name="size">'
        '<xs:restriction base="xs:int"><xs:minInclusive value="10"/>'
        '</xs:restriction></xs:simpleType></xs:redefine>'))
    with pytest.raises(ValueError,
                       match="wrong redefinition without "
                             "self-reference"):
        _imp(str(tmp_path / "m.xsd"))


def test_override_replaces_component(tmp_path, spark):
    """xs:override: the overriding component REPLACES the original
    outright — no self-reference, no chaining."""
    from xmlschema_spark import validate

    (tmp_path / "lib.xsd").write_text(_BASE_LIB)
    (tmp_path / "m.xsd").write_text(_redef_main(
        '<xs:override schemaLocation="lib.xsd">'
        '<xs:simpleType name="size">'
        '<xs:restriction base="xs:int"><xs:minInclusive value="10"/>'
        '</xs:restriction></xs:simpleType></xs:override>'))
    spec = _imp(str(tmp_path / "m.xsd"))
    assert "{urn:m}size__redefined" not in spec.simple_types
    df = spark.createDataFrame(
        [("a", "500"), ("b", "5")], "rid string, s string")
    got = sorted((r.row_key, r.constraint) for r in
                 validate(df, spec).violations.collect())
    # the original's maxInclusive is GONE; only the override applies
    assert got == [("b", "facet:minInclusive:s")]


def test_redefine_same_schema_rejected(tmp_path):
    p = tmp_path / "self.xsd"
    p.write_text(
        f'<xs:schema {XS}>'
        f'<xs:redefine schemaLocation="{p}"/>'
        '<xs:element name="row"><xs:complexType>'
        '<xs:attribute name="rid" type="xs:string"/>'
        '</xs:complexType></xs:element></xs:schema>')
    with pytest.raises(ValueError,
                       match="can't redefine the same schema"):
        _imp(str(p))


def test_redefine_load_failure_wording(tmp_path):
    (tmp_path / "m.xsd").write_text(_redef_main(
        '<xs:redefine schemaLocation="missing.xsd"/>'))
    with pytest.raises(ValueError, match="can't redefine schema"):
        _imp(str(tmp_path / "m.xsd"))


def test_redefined_target_missing_rejected(tmp_path):
    (tmp_path / "lib.xsd").write_text(_BASE_LIB)
    (tmp_path / "m.xsd").write_text(_redef_main(
        '<xs:redefine schemaLocation="lib.xsd">'
        '<xs:simpleType name="nope">'
        '<xs:restriction base="nope"/></xs:simpleType></xs:redefine>'))
    with pytest.raises(ValueError, match="not found in 'lib.xsd'"):
        _imp(str(tmp_path / "m.xsd"))


# ----------------------------------------- reference schemas as-is

def test_reference_issue_362_crossed_imports():
    """Crossed imports/includes + an unresolvable remote location hint
    (deferred like the reference's include warnings)."""
    spec = spec_from_xsd(f"{REF}/issues/issue_362/issue_362_1.xsd",
                         key_column="rid", tags_column="children",
                         element="root")
    cm = spec.content_models[0]
    kids = [p.name for p in cm.model.children]
    assert kids == ["item1", "item2", "item3"]
    assert cm.target_ns == "http://xmlschema.test/tns1"


def test_reference_vehicles_entry_via_localname():
    """element= accepts the local name of a namespace-qualified global
    ('vehicles' -> '{http://example.com/vehicles}vehicles')."""
    spec = spec_from_xsd(
        f"{REF}/examples/vehicles/vehicles.xsd",
        element="vehicles", key_column="rid", tags_column="children")
    names = [p.name for p in spec.content_models[0].model.children]
    assert names == ["cars", "bikes"]


def test_reference_chameleon3_import():
    """chameleon3.xsd: imports its ns: namespace with no location —
    satisfied via locations= with a type-library text."""
    lib = f"""
      <xs:schema {XS}
         targetNamespace="http://example.com/xmlschema/namespaces"
         xmlns="http://example.com/xmlschema/namespaces">
        <xs:simpleType name="rootType">
          <xs:restriction base="xs:string"/>
        </xs:simpleType>
      </xs:schema>"""
    with open(f"{REF}/features/namespaces/chameleon3.xsd") as f:
        text = f.read()
    # chameleon3's root is SIMPLE-typed: resolution must get through
    # the import and fail on the no-columns rule, not on the import
    with pytest.raises(ValueError,
                       match="simple-typed row elements carry"):
        spec_from_xsd(
            text, key_column="value",
            locations={"http://example.com/xmlschema/namespaces": lib})


def test_reference_chameleon3_simple_row_error():
    lib = f"""
      <xs:schema {XS}
         targetNamespace="http://example.com/xmlschema/namespaces">
        <xs:complexType name="rootType">
          <xs:attribute name="rid" type="xs:string"/>
        </xs:complexType>
      </xs:schema>"""
    with open(f"{REF}/features/namespaces/chameleon3.xsd") as f:
        text = f.read()
    spec = spec_from_xsd(
        text, key_column="rid",
        locations={"http://example.com/xmlschema/namespaces": lib})
    assert [c.name for c in spec.columns] == ["rid"]
