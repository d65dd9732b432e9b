"""XSD 1.1 notQName on wildcards — both engine paths.

Reference: validators/wildcards.py:121-158 (_parse_not_constraints),
:784-791 (Xsd11AnyElement.is_matching), :837-845
(Xsd11AnyAttribute.is_matching). A notQName entry excludes the exact
name BEFORE the namespace constraint is consulted; '##defined'
excludes globally-declared names and '##definedSibling' (xs:any only)
the names the wildcard's sibling element particles match. The schema
set is closed once imported, so the importer expands both tokens to
concrete name lists statically — faithful to the reference's dynamic
maps lookup over the same closed set.

Content-model path: the exclusion compiles into the wildcard's tag
regex as a negative lookahead against the whole ';'-terminated tag.
Record path: AttrWildcardSpec.not_qname excludes exact (Clark-form)
extra struct fields in the schema-metadata admission pass."""

import pytest

from xmlschema_spark import validate
from xmlschema_spark.plans.compiler import compile_plan
from xmlschema_spark.plans.content_model import check_upa
from xmlschema_spark.sources.xsd_export import spec_to_xsd
from xmlschema_spark.sources.xsd_import import spec_from_xsd
from xmlschema_spark.specs import (ContentModelSpec, ParticleSpec,
                                   TableSpec)

XS = 'xmlns:xs="http://www.w3.org/2001/XMLSchema"'


def E(name, lo=1, hi=1, **kw):
    return ParticleSpec(kind="element", name=name, min_occurs=lo,
                        max_occurs=hi, **kw)


def SEQ(*ch, lo=1, hi=1):
    return ParticleSpec(kind="sequence", children=list(ch),
                        min_occurs=lo, max_occurs=hi)


def ANY(lo=1, hi=1, **kw):
    return ParticleSpec(kind="any", min_occurs=lo, max_occurs=hi, **kw)


def _viol(spark, model, rows, target_ns=None, xsd11=True):
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v", model=model, target_ns=target_ns,
            xsd11=xsd11)])
    df = spark.createDataFrame(rows, "rid string, v array<string>")
    return sorted(r.row_key
                  for r in validate(df, spec).violations.collect())


# ------------------------------------------------ content-model path

def test_not_qname_excludes_exact_tag(spark):
    model = SEQ(E("a"), ANY(lo=0, hi=None, not_qname=["b"]))
    rows = [("ok_other", ["a", "c"]),
            ("ok_empty", ["a"]),
            ("bad_excluded", ["a", "b"]),
            ("ok_prefix_not_excluded", ["a", "bb"]),
            ("bad_mid", ["a", "c", "b", "c"])]
    assert _viol(spark, model, rows) == ["bad_excluded", "bad_mid"]


def test_not_qname_exclusion_beats_namespace(spark):
    """Exclusion applies even when the namespace constraint admits the
    name (wildcards.py:791: `name not in self.not_qname` is ANDed with
    the namespace test)."""
    model = SEQ(ANY(lo=1, hi=1, namespace=["urn:x"],
                    not_qname=["urn:x:bad"]))
    rows = [("ok", ["urn:x:good"]),
            ("bad_excluded", ["urn:x:bad"]),
            ("bad_ns", ["urn:y:good"])]
    assert _viol(spark, model, rows) == ["bad_excluded", "bad_ns"]


def test_not_qname_uri_namespace_with_colons(spark):
    """Namespace tokens may contain ':' (URIs) — the exclusion and the
    consistency check must treat the full token as the namespace."""
    model = SEQ(ANY(lo=1, hi=1, namespace=["http://x/ns"],
                    not_qname=["http://x/ns:bad"]))
    rows = [("ok", ["http://x/ns:good"]),
            ("bad", ["http://x/ns:bad"])]
    assert _viol(spark, model, rows) == ["bad"]


def test_not_qname_makes_element_wildcard_upa_valid():
    """<element name='m' minOccurs=0/><any/> is a UPA violation — the
    wildcard can also be attributed 'm'. Excluding 'm' via notQName
    disambiguates (the reference's Xsd11AnyElement.is_matching returns
    False for excluded names, so the paths become distinguishable)."""
    with pytest.raises(ValueError, match="Unique Particle Attribution"):
        check_upa(SEQ(E("m", 0, 1), ANY(1, 1)))
    check_upa(SEQ(E("m", 0, 1), ANY(1, 1, not_qname=["m"])))


def test_unexpanded_hash_token_rejected(spark):
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v",
            model=SEQ(ANY(not_qname=["##defined"])))])
    with pytest.raises(ValueError, match="notQName"):
        compile_plan(spec)


def test_not_qname_on_non_any_particle_rejected(spark):
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v",
            model=SEQ(E("a", not_qname=["b"])))])
    with pytest.raises(ValueError,
                       match="apply only to 'any' particles"):
        compile_plan(spec)


def test_consistency_names_must_be_in_allowed_namespaces(spark):
    """wildcards.py:153-155: a notQName entry in a namespace the
    wildcard can never match is a parse error."""
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v",
            model=SEQ(ANY(namespace=["urn:x"],
                          not_qname=["urn:y:foo"])))])
    with pytest.raises(ValueError,
                       match="must be in namespaces that are allowed"):
        compile_plan(spec)


def test_consistency_not_namespace_conflict(spark):
    """wildcards.py:146-151: every excluded QName sits in a namespace
    notNamespace already rules out — the exclusion list is vacuous."""
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v",
            model=SEQ(ANY(not_namespace=["urn:x"],
                          not_qname=["urn:x:foo"])))])
    with pytest.raises(ValueError,
                       match="allowed by notNamespace"):
        compile_plan(spec)


def test_open_content_not_qname(spark):
    """The openContent wildcard takes notQName like any other
    (Xsd11AnyElement is the wildcard class either way)."""
    from xmlschema_spark.specs import OpenContentSpec
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v", model=SEQ(E("a")), xsd11=True,
            open_content=OpenContentSpec(
                mode="interleave",
                wildcard=ANY(not_qname=["secret"])))])
    df = spark.createDataFrame(
        [("ok", ["x", "a", "y"]), ("bad", ["a", "secret"])],
        "rid string, v array<string>")
    assert sorted(r.row_key for r in
                  validate(df, spec).violations.collect()) == ["bad"]


# ------------------------------------------------------ importer path

def _box(any_attrs):
    return (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            '<xs:sequence><xs:element name="box" minOccurs="0">'
            '<xs:complexType><xs:sequence>'
            '<xs:element name="note" type="xs:string" minOccurs="0"/>'
            f'<xs:any minOccurs="0" maxOccurs="unbounded" {any_attrs}/>'
            '</xs:sequence>'
            '<xs:attribute name="tag" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')


def test_record_wildcard_not_qname_violates(spark):
    """An extra struct field named in notQName violates even under
    processContents='skip' — the wildcard never MATCHES it, which is
    distinct from matching-without-a-declaration."""
    spec = spec_from_xsd(_box('processContents="skip" notQName="ban"'),
                         key_column="rid")
    ws = [w for w in spec.attr_wildcards if w.path == "box"]
    assert len(ws) == 1 and ws[0].not_qname == ["ban"]
    df = spark.createDataFrame(
        [("r1", ("t", None, "x", "y"))],
        "rid string, box struct<tag string, note string, ban string, "
        "free string>")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:notQName:box.ban" in got
    assert not any("free" in c for c in got)


def test_importer_defined_sibling_expands():
    """##definedSibling on xs:any expands to the wildcard's sibling
    element names (wildcards.py:786-790) — visible on the
    content-model path (tags_column keeps the particle tree)."""
    text = (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            '<xs:sequence>'
            '<xs:element name="head" type="xs:string"/>'
            '<xs:element name="body" type="xs:string"/>'
            '<xs:any minOccurs="1" maxOccurs="unbounded" '
            'processContents="skip" notQName="x ##definedSibling"/>'
            '</xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')
    spec = spec_from_xsd(text, key_column="rid", tags_column="tags")
    model = spec.content_models[0].model
    wc = [c for c in model.children if c.kind == "any"][0]
    assert wc.not_qname == ["body", "head", "x"]


def test_importer_defined_expands_to_globals():
    """##defined on xs:any expands to the schema set's global element
    declarations (wildcards.py:784: `name in self.maps.elements`)."""
    text = (f'<xs:schema {XS}>'
            '<xs:element name="reserved" type="xs:string"/>'
            '<xs:element name="row"><xs:complexType><xs:sequence>'
            '<xs:element name="a" type="xs:string"/>'
            '<xs:any minOccurs="1" processContents="skip" '
            'notQName="##defined"/>'
            '</xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')
    spec = spec_from_xsd(text, key_column="rid", tags_column="tags",
                         element="row")
    wc = [c for c in spec.content_models[0].model.children
          if c.kind == "any"][0]
    assert "reserved" in wc.not_qname and "row" in wc.not_qname


def test_any_attribute_defined_expands_to_global_attrs(spark):
    """##defined on xs:anyAttribute excludes the set's global
    attribute declarations (wildcards.py:837-845); other extras stay
    admitted under skip."""
    text = (f'<xs:schema {XS} targetNamespace="urn:b" '
            'xmlns:b="urn:b">'
            '<xs:attribute name="ga" type="xs:string"/>'
            '<xs:element name="row"><xs:complexType>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '<xs:anyAttribute processContents="skip" '
            'notQName="##defined"/>'
            '</xs:complexType></xs:element></xs:schema>')
    spec = spec_from_xsd(text, key_column="rid")
    ws = [w for w in spec.attr_wildcards if w.path == ""]
    assert ws and ws[0].not_qname == ["{urn:b}ga"]
    df = spark.createDataFrame(
        [("r1", "v", "w")],
        "rid string, `{urn:b}ga` string, other string")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:notQName:{urn:b}ga" in got
    assert not any("other" in c for c in got)


def test_any_attribute_rejects_defined_sibling():
    text = (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '<xs:anyAttribute processContents="skip" '
            'notQName="##definedSibling"/>'
            '</xs:complexType></xs:element></xs:schema>')
    with pytest.raises(Exception,
                       match="wrong value for 'notQName' attribute"):
        spec_from_xsd(text, key_column="rid")


def test_unmapped_prefix_in_not_qname():
    text = (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            '<xs:sequence><xs:any minOccurs="0" '
            'notQName="nosuch:name"/></xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')
    with pytest.raises(Exception,
                       match="unmapped QName in 'notQName'"):
        spec_from_xsd(text, key_column="rid")


def test_importer_consistency_error_not_allowed_namespace():
    text = _box('processContents="skip" namespace="urn:x" '
                'notQName="ban"')
    with pytest.raises(Exception,
                       match="must be in namespaces that are allowed"):
        spec_from_xsd(text, key_column="rid")


def test_qualified_not_qname_resolves_to_clark(spark):
    text = (f'<xs:schema {XS} xmlns:q="urn:q">'
            '<xs:element name="row"><xs:complexType><xs:sequence>'
            '<xs:element name="box" minOccurs="0"><xs:complexType>'
            '<xs:sequence><xs:any minOccurs="0" maxOccurs="unbounded" '
            'processContents="skip" namespace="##any" '
            'notQName="q:ban"/></xs:sequence>'
            '<xs:attribute name="tag" type="xs:string"/>'
            '</xs:complexType></xs:element></xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')
    spec = spec_from_xsd(text, key_column="rid")
    ws = [w for w in spec.attr_wildcards if w.path == "box"]
    assert ws[0].not_qname == ["{urn:q}ban"]
    df = spark.createDataFrame(
        [("r1", ("t", "x", "y"))],
        "rid string, box struct<tag string, `{urn:q}ban` string, "
        "plain string>")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:notQName:box.{urn:q}ban" in got
    assert not any("plain" in c for c in got)


# -------------------------------------------------------- round-trips

def test_record_not_qname_export_round_trip(spark):
    spec = spec_from_xsd(_box('processContents="skip" notQName="ban"'),
                         key_column="rid")
    text = spec_to_xsd(spec)
    spec2 = spec_from_xsd(text, key_column="rid")
    ws = [w for w in spec2.attr_wildcards if w.path == "box"]
    assert ws and ws[0].not_qname == ["ban"]
    df = spark.createDataFrame(
        [("r1", ("t", None, "x", "y"))],
        "rid string, box struct<tag string, note string, ban string, "
        "free string>")
    v1 = sorted((r.constraint, r.row_key) for r in
                validate(df, spec).violations.collect())
    v2 = sorted((r.constraint, r.row_key) for r in
                validate(df, spec2).violations.collect())
    assert v1 == v2 and any("notQName" in c for c, _ in v1)


def test_particle_not_qname_export_round_trip(spark):
    """Content-model path round-trip: exported notQName (incl. the
    expanded ##definedSibling names) re-imports with identical
    violations."""
    text = (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            '<xs:sequence>'
            '<xs:element name="head" type="xs:string"/>'
            '<xs:any minOccurs="1" maxOccurs="unbounded" '
            'processContents="skip" notQName="ban ##definedSibling"/>'
            '</xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')
    spec = spec_from_xsd(text, key_column="rid", tags_column="tags")
    out = spec_to_xsd(spec)
    spec2 = spec_from_xsd(out, key_column="rid", tags_column="tags")
    df = spark.createDataFrame(
        [("ok", ["head", "x"]), ("bad1", ["head", "ban"]),
         ("bad2", ["head", "head"])],
        "rid string, tags array<string>")
    v1 = sorted((r.constraint, r.row_key) for r in
                validate(df, spec).violations.collect())
    v2 = sorted((r.constraint, r.row_key) for r in
                validate(df, spec2).violations.collect())
    assert v1 == v2
    assert sorted({k for _, k in v1}) == ["bad1", "bad2"]
