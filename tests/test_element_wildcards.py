"""Element wildcards (xs:any) + XSD 1.1 openContent inside record
types and at the row level.

The tabular projection: extra child elements of a record surface as
extra struct fields, exactly like extra attributes, so an OPTIONAL
xs:any in the content model (XsdAnyElement, reference
wildcards.py:33-99) and an xs:openContent wildcard (XsdOpenContent,
wildcards.py:848-897) both map to AttrWildcardSpec(kind='element') and
reuse the anyAttribute admission machinery (namespace constraint +
processContents, checked once against the static DataFrame schema —
zero data movement). Several wildcards on one path merge by UNION
admission; a wildcard branch inside a choice drops the selection-count
LOWER bounds (an unknown extra field could satisfy the choice)."""

import pytest

from xmlschema_spark import validate
from xmlschema_spark.sources.xsd_import import spec_from_xsd
from xmlschema_spark.sources.xsd_export import spec_to_xsd

XS = 'xmlns:xs="http://www.w3.org/2001/XMLSchema"'


def _imp(text, **kw):
    return spec_from_xsd(text, **kw)


def _row_schema(body, attrs='<xs:attribute name="rid" type="xs:string"'
                            ' use="required"/>'):
    return (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
            f'<xs:sequence>{body}</xs:sequence>{attrs}'
            '</xs:complexType></xs:element></xs:schema>')


def _box(content, box_attrs=""):
    return _row_schema(f"""
<xs:element name="box" minOccurs="0">
  <xs:complexType>
    {content}
    <xs:attribute name="tag" type="xs:string" use="required"/>
    {box_attrs}
  </xs:complexType>
</xs:element>""")


SEQ_ANY = ('<xs:sequence>'
           '<xs:element name="note" type="xs:string" minOccurs="0"/>'
           '<xs:any minOccurs="0" maxOccurs="unbounded" '
           'processContents="%s"%s/>'
           '</xs:sequence>')


# ---------------------------------------------------------------- xs:any
# inside a record's sequence: the record STILL maps to a struct (no
# tags_column fallback) and the wildcard governs extra fields.

def test_any_in_record_keeps_record_mapping():
    spec = _imp(_box(SEQ_ANY % ("strict", "")), key_column="rid")
    by_name = {c.name: c for c in spec.columns}
    assert "box.note" in by_name           # element facets retained
    ws = [w for w in spec.attr_wildcards if w.path == "box"]
    assert len(ws) == 1 and ws[0].kind == "element"
    assert ws[0].process == "strict" and ws[0].oc_mode is None


def test_any_strict_rejects_extra_field(spark):
    spec = _imp(_box(SEQ_ANY % ("strict", "")), key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("t", "n", "x"))],
        "rid string, box struct<tag string, note string, extra string>")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:strict:box.extra" in got
    assert not any("box.note" in c or "box.tag" in c for c in got)


@pytest.mark.parametrize("mode", ["skip", "lax"])
def test_any_skip_lax_admit_extra_field(spark, mode):
    spec = _imp(_box(SEQ_ANY % (mode, "")), key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("t", "n", "x"))],
        "rid string, box struct<tag string, note string, extra string>")
    assert validate(df, spec).violations.count() == 0


def test_any_namespace_constraint(spark):
    """##other + skip: a no-namespace extra violates the namespace
    constraint, a Clark-qualified one is admitted."""
    spec = _imp(_box(SEQ_ANY % ("skip", ' namespace="##other"')),
                key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("t", None, "x", "y"))],
        "rid string, box struct<tag string, note string, extra string, "
        "`{urn:x}ext` string>")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:namespace:box.extra" in got
    assert not any("{urn:x}ext" in c for c in got)


def test_any_not_namespace(spark):
    """XSD 1.1 notNamespace complement: the excluded namespace
    violates, everything else (incl. no-namespace) is admitted."""
    spec = _imp(_box(SEQ_ANY % ("skip", ' notNamespace="urn:x"')),
                key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("t", None, "x", "y", "z"))],
        "rid string, box struct<tag string, note string, extra string, "
        "`{urn:x}bad` string, `{urn:y}ok` string>")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert any("{urn:x}bad" in c and c.startswith("wildcard:namespace")
               for c in got)
    assert not any("extra" in c or "{urn:y}ok" in c for c in got)


def test_required_any_imports_flat():
    """xs:any minOccurs=1 imports FLAT as a required wildcard
    (AttrWildcardSpec.min_occurs=1 — per-row presence predicate,
    runner._required_wildcard_parts) instead of the historical
    tags_column fallback; see tests/test_required_wildcard.py for the
    row-level semantics."""
    spec = _imp(_row_schema('<xs:any minOccurs="1"/>'),
                key_column="rid")
    assert not spec.content_models
    assert any(w.kind == "element" and w.min_occurs == 1
               for w in spec.attr_wildcards)


def test_namespace_and_not_namespace_exclusive():
    with pytest.raises(Exception, match="mutually exclusive"):
        _imp(_box(SEQ_ANY % (
            "skip", ' namespace="##any" notNamespace="urn:x"')),
            key_column="rid")


# ---------------------------------------------------------------- union
# admission: anyAttribute + xs:any on the SAME record merge.

def test_attr_and_element_wildcards_union(spark):
    """anyAttribute ##other strict + xs:any ##local skip: a plain
    extra is admitted via the element wildcard (skip); a qualified
    extra only matches the strict attribute wildcard -> strict
    violation; neither admits nothing here."""
    spec = _imp(_box(SEQ_ANY % ("skip", ' namespace="##local"'),
                     '<xs:anyAttribute namespace="##other" '
                     'processContents="strict"/>'),
                key_column="rid")
    assert len([w for w in spec.attr_wildcards if w.path == "box"]) == 2
    df = spark.createDataFrame(
        [("r1", ("t", None, "x", "y"))],
        "rid string, box struct<tag string, note string, extra string, "
        "`{urn:x}q` string>")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert not any("box.extra" in c for c in got)       # skip admits
    assert "wildcard:strict:box.{urn:x}q" in got        # strict only


# ---------------------------------------------------------------- choice
# with a wildcard branch: lower bounds drop, upper bounds stay.

CHOICE_ANY = """<xs:choice>
  <xs:element name="num" type="xs:int"/>
  <xs:element name="txt" type="xs:string"/>
  <xs:any processContents="skip"/>
</xs:choice>"""


def test_choice_wildcard_branch_relaxes_lower_bound(spark):
    spec = _imp(_box(CHOICE_ANY), key_column="rid")
    ws = [w for w in spec.attr_wildcards if w.path == "box"]
    assert len(ws) == 1 and ws[0].kind == "element"
    df = spark.createDataFrame(
        [("r1", ("t", None, None, "w")),   # wildcard satisfies choice
         ("r2", ("t", None, None, None)),  # nothing selected — STILL ok
         #   (the tabular row can't see that no extra existed either)
         ("r3", ("t", "1", "a", None))],   # both branches — violates
        "rid string, box struct<tag string, num string, txt string, "
        "extra string>")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert ("r3", "assert:choice_box") in got
    assert not any(k in ("r1", "r2") for k, _ in got)


# ---------------------------------------------------------------- XSD 1.1
# openContent: interleave / suffix admit extras, mode='none' closes.

def _oc_box(mode, any_el='<xs:any processContents="%s"/>'):
    inner = any_el if mode == "none" else any_el
    return _box(f"""
    <xs:openContent mode="{mode}">{'' if mode == 'none' else inner}
    </xs:openContent>
    <xs:sequence>
      <xs:element name="note" type="xs:string" minOccurs="0"/>
    </xs:sequence>""")


@pytest.mark.parametrize("mode", ["interleave", "suffix"])
def test_open_content_admits_extras(spark, mode):
    spec = _imp(_oc_box(mode, '<xs:any processContents="skip"/>'),
                key_column="rid")
    ws = [w for w in spec.attr_wildcards if w.path == "box"]
    assert len(ws) == 1 and ws[0].oc_mode == mode
    df = spark.createDataFrame(
        [("r1", ("t", "n", "x"))],
        "rid string, box struct<tag string, note string, extra string>")
    assert validate(df, spec).violations.count() == 0


def test_open_content_strict_flags_extras(spark):
    spec = _imp(_oc_box("interleave",
                        '<xs:any processContents="strict"/>'),
                key_column="rid")
    df = spark.createDataFrame(
        [("r1", ("t", "n", "x"))],
        "rid string, box struct<tag string, note string, extra string>")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:strict:box.extra" in got


def test_open_content_mode_none_is_closed():
    spec = _imp(_oc_box("none"), key_column="rid")
    assert not [w for w in spec.attr_wildcards if w.path == "box"]


# ---------------------------------------------------------------- row
# level: openContent / xs:any on the ROW type govern extra TOP-LEVEL
# columns (path='') instead of the blanket allow_extra_columns.

ROW_OC = (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
          '<xs:openContent mode="interleave">'
          '<xs:any processContents="%s"/></xs:openContent>'
          '<xs:sequence>'
          '<xs:element name="note" type="xs:string" minOccurs="0"/>'
          '</xs:sequence>'
          '<xs:attribute name="rid" type="xs:string" use="required"/>'
          '</xs:complexType></xs:element></xs:schema>')


def test_row_open_content_strict(spark):
    spec = _imp(ROW_OC % "strict", key_column="rid")
    ws = [w for w in spec.attr_wildcards if w.path == ""]
    assert len(ws) == 1 and ws[0].oc_mode == "interleave"
    df = spark.createDataFrame([("r1", "n", "x")],
                               "rid string, note string, extra string")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:strict:extra" in got
    assert not any(c.endswith(":note") or c.endswith(":rid")
                   for c in got if c.startswith("wildcard"))


def test_row_open_content_skip_admits(spark):
    spec = _imp(ROW_OC % "skip", key_column="rid")
    df = spark.createDataFrame([("r1", "n", "x")],
                               "rid string, note string, extra string")
    assert validate(df, spec).violations.count() == 0


def test_row_any_governs_top_level_extras(spark):
    spec = _imp(_row_schema(
        '<xs:element name="note" type="xs:string" minOccurs="0"/>'
        '<xs:any minOccurs="0" namespace="##other" '
        'processContents="skip"/>'), key_column="rid")
    ws = [w for w in spec.attr_wildcards if w.path == ""]
    assert len(ws) == 1 and ws[0].kind == "element"
    df = spark.createDataFrame(
        [("r1", "n", "x", "y")],
        "rid string, note string, extra string, `{urn:x}ext` string")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:namespace:extra" in got     # no-ns excluded
    assert not any("{urn:x}ext" in c for c in got)


# ---------------------------------------------------------------- export
# round-trips (behavioral: re-import -> identical violations).

def _round_trip(spark, text, df):
    spec = _imp(text, key_column="rid")
    out = spec_to_xsd(spec)
    spec2 = _imp(out, key_column="rid")
    v1 = sorted((r.row_key, r.constraint)
                for r in validate(df, spec).violations.collect())
    v2 = sorted((r.row_key, r.constraint)
                for r in validate(df, spec2).violations.collect())
    assert v1 == v2
    return out, v1


def test_any_in_record_export_round_trip(spark):
    df = spark.createDataFrame(
        [("r1", ("t", "n", "x"))],
        "rid string, box struct<tag string, note string, extra string>")
    out, v1 = _round_trip(spark, _box(SEQ_ANY % ("strict", "")), df)
    assert "<xs:any" in out
    assert ("<schema>", "wildcard:strict:box.extra") in v1


def test_open_content_export_round_trip(spark):
    df = spark.createDataFrame(
        [("r1", ("t", "n", "x"))],
        "rid string, box struct<tag string, note string, extra string>")
    out, v1 = _round_trip(
        spark, _oc_box("suffix", '<xs:any processContents="strict"/>'),
        df)
    assert 'xs:openContent mode="suffix"' in out
    assert ("<schema>", "wildcard:strict:box.extra") in v1


def test_row_open_content_export_round_trip(spark):
    df = spark.createDataFrame([("r1", "n", "x")],
                               "rid string, note string, extra string")
    out, v1 = _round_trip(spark, ROW_OC % "strict", df)
    assert "<xs:openContent" in out
    assert ("<schema>", "wildcard:strict:extra") in v1


def test_not_namespace_export_round_trip(spark):
    df = spark.createDataFrame(
        [("r1", ("t", None, "x", "y"))],
        "rid string, box struct<tag string, note string, extra string, "
        "`{urn:x}bad` string>")
    out, v1 = _round_trip(
        spark, _box(SEQ_ANY % ("skip", ' notNamespace="urn:x"')), df)
    assert 'notNamespace="urn:x"' in out
    assert any(c.startswith("wildcard:namespace:box.{urn:x}bad")
               for _, c in v1)


# ---------------------------------------------------------------- real
# reference schemas with xs:any inside record types now import FLAT
# (previously fell back to tags_column / raised).

REF = "/root/reference/tests/test_cases/issues"


def test_reference_issue_298_imports_flat(spark):
    """issue_298.xsd: mixed 'freeform' type whose content is a
    repeated sequence holding only <xs:any processContents='lax'> —
    record mapping retained, wildcard admits extra nested fields."""
    spec = _imp(f"{REF}/issue_298/issue_298.xsd", key_column="rid")
    assert not spec.content_models
    assert [c.name for c in spec.columns] == ["Container.Freeform.value"]
    ws = [(w.path, w.kind, w.process) for w in spec.attr_wildcards]
    assert ws == [("Container.Freeform", "element", "lax")]
    df = spark.createDataFrame(
        [("r1", ((None, "free"),)), ("r2", (("txt", None),))],
        "rid string, Container struct<Freeform struct<"
        "value string, extra string>>")
    got = [r.constraint for r in validate(df, spec).violations.collect()]
    assert not any(c.startswith("wildcard") for c in got)   # lax admits


def test_reference_issue_334_imports_flat():
    """issue_334.xsd (CWE Demonstrative_Examples): xhtml-constrained
    xs:any wildcards inside mixed record types that live INSIDE a
    record array — wildcard paths address through the array."""
    spec = _imp(f"{REF}/issue_334/issue_334.xsd", key_column="rid")
    assert not spec.content_models
    assert [r.name for r in spec.record_arrays] == \
        ["Demonstrative_Example"]
    ws = {w.path: w for w in spec.attr_wildcards}
    assert set(ws) == {"Demonstrative_Example.Intro_Text",
                       "Demonstrative_Example.Body_Text",
                       "Demonstrative_Example.Example_Code"}
    for w in ws.values():
        assert w.kind == "element" and w.process == "strict"
        assert w.namespace == ["http://www.w3.org/1999/xhtml"]


# ---------------------------------------------------------------- row
# type's own xs:anyAttribute (previously silently dropped).

ROW_ANYATTR = (f'<xs:schema {XS}><xs:element name="row"><xs:complexType>'
               '<xs:attribute name="rid" type="xs:string"'
               ' use="required"/>'
               '<xs:anyAttribute processContents="%s"%s/>'
               '</xs:complexType></xs:element></xs:schema>')


def test_row_any_attribute_strict(spark):
    spec = _imp(ROW_ANYATTR % ("strict", ""), key_column="rid")
    ws = [w for w in spec.attr_wildcards if w.path == ""]
    assert len(ws) == 1 and ws[0].kind == "attribute"
    df = spark.createDataFrame([("r1", "x")],
                               "rid string, extra string")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:strict:extra" in got


def test_row_any_attribute_skip_admits(spark):
    spec = _imp(ROW_ANYATTR % ("skip", ""), key_column="rid")
    df = spark.createDataFrame([("r1", "x")],
                               "rid string, extra string")
    assert validate(df, spec).violations.count() == 0


def test_row_any_attribute_not_namespace(spark):
    spec = _imp(ROW_ANYATTR % ("skip", ' notNamespace="##local"'),
                key_column="rid")
    df = spark.createDataFrame(
        [("r1", "x", "y")],
        "rid string, extra string, `{urn:x}ok` string")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:namespace:extra" in got
    assert not any("{urn:x}ok" in c for c in got)


def test_row_any_attribute_export_round_trip(spark):
    df = spark.createDataFrame([("r1", "x")],
                               "rid string, extra string")
    out, v1 = _round_trip(spark, ROW_ANYATTR % ("strict", ""), df)
    assert "<xs:anyAttribute" in out
    assert ("<schema>", "wildcard:strict:extra") in v1


# ---------------------------------------------------------------- XSD 1.1
# xs:defaultOpenContent (XsdDefaultOpenContent, wildcards.py:900-950;
# application complex_types.py:142-152): a per-document default that
# applies to every complexType without its OWN openContent.

def _doc_schema(default_oc, box_content, box_extra=""):
    return (f'<xs:schema {XS}>{default_oc}'
            '<xs:element name="row"><xs:complexType><xs:sequence>'
            '<xs:element name="box" minOccurs="0">'
            f'<xs:complexType>{box_content}'
            '<xs:attribute name="tag" type="xs:string"/>'
            f'{box_extra}</xs:complexType></xs:element>'
            '</xs:sequence>'
            '<xs:attribute name="rid" type="xs:string" use="required"/>'
            '</xs:complexType></xs:element></xs:schema>')


DOC = ('<xs:defaultOpenContent%s>'
       '<xs:any processContents="strict"/>'
       '</xs:defaultOpenContent>')
SEQ_NOTE = ('<xs:sequence>'
            '<xs:element name="note" type="xs:string" minOccurs="0"/>'
            '</xs:sequence>')


def test_default_open_content_applies_to_record(spark):
    """A record type WITHOUT its own openContent takes the document's
    default — extra struct fields are strict-checked. The row type
    takes it too (path='')."""
    spec = _imp(_doc_schema(DOC % "", SEQ_NOTE), key_column="rid")
    ws = {w.path: w for w in spec.attr_wildcards}
    assert set(ws) == {"box", ""}
    assert ws["box"].oc_mode == "interleave"
    assert ws["box"].process == "strict"
    df = spark.createDataFrame(
        [("r1", ("t", "n", "x"))],
        "rid string, box struct<tag string, note string, extra string>")
    got = {r.constraint for r in validate(df, spec).violations.collect()}
    assert "wildcard:strict:box.extra" in got


def test_own_open_content_none_overrides_default():
    """mode='none' on the type cancels the inherited default
    (complex_types.py:149-152) — the record gets NO wildcard."""
    spec = _imp(_doc_schema(
        DOC % "", f'<xs:openContent mode="none"/>{SEQ_NOTE}'),
        key_column="rid")
    assert not [w for w in spec.attr_wildcards if w.path == "box"]


def test_default_open_content_skips_empty_type():
    """An EMPTY complexType only takes the default when the
    declaration says appliesToEmpty."""
    spec = _imp(_doc_schema(DOC % "", ""), key_column="rid")
    assert not [w for w in spec.attr_wildcards if w.path == "box"]
    spec2 = _imp(_doc_schema(DOC % ' appliesToEmpty="true"', ""),
                 key_column="rid")
    assert [w for w in spec2.attr_wildcards if w.path == "box"]


def test_default_open_content_parse_errors():
    with pytest.raises(Exception,
                       match="cannot be 'none'"):
        _imp(_doc_schema('<xs:defaultOpenContent mode="none">'
                         '<xs:any/></xs:defaultOpenContent>',
                         SEQ_NOTE), key_column="rid")
    with pytest.raises(Exception, match="cannot be empty"):
        _imp(_doc_schema('<xs:defaultOpenContent/>', SEQ_NOTE),
             key_column="rid")


def test_default_open_content_export_round_trip(spark):
    """Default-applied wildcards export as per-type xs:openContent —
    behaviorally identical on re-import."""
    df = spark.createDataFrame(
        [("r1", ("t", "n", "x"))],
        "rid string, box struct<tag string, note string, extra string>")
    out, v1 = _round_trip(spark, _doc_schema(DOC % "", SEQ_NOTE), df)
    assert 'xs:openContent mode="interleave"' in out
    assert ("<schema>", "wildcard:strict:box.extra") in v1
