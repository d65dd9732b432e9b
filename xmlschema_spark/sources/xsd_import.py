"""XSD document importer — build a TableSpec from XSD schema text.

The reference's front door is an XSD document (``XMLSchema(source)``,
schemas/xsd_globals build); until now this engine required hand-built
TableSpecs. This module closes that porting gap: a (documented subset
of) XSD maps mechanically onto the spec model that ``compile_plan``
already validates and flattens, so a reference user can bring their
schema text as-is.

Mapping (reference parity anchors):

  global xs:simpleType           -> ``TableSpec.simple_types`` entry
    xs:restriction base=...      -> ``ColumnSpec.base`` chain —
                                    validated and flattened by
                                    ``plans/restriction.py`` exactly
                                    like XsdAtomicRestriction
                                    (simple_types.py:447-463)
    facet children               -> ColumnSpec facet fields
                                    (facets.py:84-894)
    xs:assertion test=...        -> ColumnSpec.assertion via the XPath
                                    translator (facets.py:836-894)
    xs:list itemType=...         -> ``lexical_list`` + ``item``
                                    (simple_types.py:991-1019)
    xs:union memberTypes=...     -> ``union_members``
                                    (simple_types.py:1178-1211)

  the ROW element (a global xs:element, chosen by ``element=`` or the
  single global one)             -> the TableSpec
    xs:attribute                 -> column (use='required' -> non-null,
                                    attributes.py:224-228;
                                    use='prohibited' -> must-be-absent
                                    assert; fixed/default carried,
                                    elements.py:750-769)
    simple-typed child element   -> column (minOccurs=0 -> nullable)
    ... with maxOccurs > 1       -> array column: ``item`` carries the
                                    simple type, minOccurs/maxOccurs
                                    become min/max_length (array size
                                    IS the occurs count)
    xs:assert test=...           -> AssertSpec via the XPath translator
                                    (assertions.py:36-179)
    element-only COMPLEX content -> ContentModelSpec particle tree over
                                    ``tags_column`` (the row stores its
                                    child-tag sequence; models.py
                                    ModelVisitor analog) — requires
                                    ``tags_column=...``

  xs:unique / xs:key / xs:keyref (identities.py) -> UniqueSpec /
    KeyrefSpec: the selector must resolve to the row element
    ('.', 'row', './/row', 'tns:row'); fields are '@attr' or 'child'
    single steps. keyref refer= resolves against the named key and
    points at this table (``ref_table = spec.name``).

Out of scope (raises ValueError naming the construct): xs:import /
xs:include / xs:redefine / xs:override, attributeGroup / group refs,
complexContent extension/restriction, mixed content, xs:notation,
QName/NOTATION types, and multi-step identity field paths. The
reference resolves these during schema build; flattening them is
schema-authoring work the importer will not guess at.
"""

from __future__ import annotations

import re
from typing import Optional
from xml.etree import ElementTree

from ..specs import (AssertSpec, ColumnSpec, ContentModelSpec, KeyrefSpec,
                     OpenContentSpec, ParticleSpec, TableSpec, UniqueSpec)

_XSD_NS = "http://www.w3.org/2001/XMLSchema"
_N = "{%s}" % _XSD_NS

# XSD built-in simple types -> engine dtype names (compile_column's
# vocabulary: plans/compiler.py xsd: dispatch + native spark types)
_BUILTIN_DTYPES = {
    "string": "string",
    "anyURI": "string",            # lexical space ~ any collapsed string
    "anySimpleType": "string",
    "boolean": "xsd:boolean",
    "decimal": "xsd:decimal",
    "float": "xsd:float",
    "double": "xsd:double",
    "hexBinary": "xsd:hexBinary",
    "base64Binary": "xsd:base64Binary",
}
for _k in ("byte", "short", "int", "long", "unsignedByte", "unsignedShort",
           "unsignedInt", "unsignedLong", "integer", "nonNegativeInteger",
           "nonPositiveInteger", "negativeInteger", "positiveInteger",
           "date", "dateTime", "dateTimeStamp", "time", "duration",
           "dayTimeDuration", "yearMonthDuration", "gYear", "gYearMonth",
           "gMonth", "gMonthDay", "gDay", "normalizedString", "token",
           "language", "Name", "NCName", "NMTOKEN", "ID", "IDREF",
           "ENTITY"):
    _BUILTIN_DTYPES[_k] = f"xsd:{_k}"

# plural built-ins are lexical lists of their singular kind
# (simple_types.py:58-76 list types)
_BUILTIN_LISTS = {"NMTOKENS": "xsd:NMTOKEN", "IDREFS": "xsd:IDREF",
                  "ENTITIES": "xsd:ENTITY"}

_UNSUPPORTED_TOP = ("import", "include", "redefine", "override",
                    "attributeGroup", "group", "notation")

_FACET_INT = {"length": "length", "minLength": "min_length",
              "maxLength": "max_length", "totalDigits": "total_digits",
              "fractionDigits": "fraction_digits"}
_FACET_STR = {"minInclusive": "min_inclusive",
              "minExclusive": "min_exclusive",
              "maxInclusive": "max_inclusive",
              "maxExclusive": "max_exclusive"}


def _err(msg: str) -> None:
    raise ValueError(f"xsd import: {msg}")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _strip_prefix(qname: str) -> str:
    return qname.rsplit(":", 1)[-1]


def _resolve_type(qname: Optional[str], named: dict) -> dict:
    """A type reference -> partial ColumnSpec kwargs."""
    if qname is None:
        return {}
    local = _strip_prefix(qname)
    if local in _BUILTIN_LISTS:
        return {"lexical_list": True,
                "item": {"dtype": _BUILTIN_LISTS[local]}}
    if local in _BUILTIN_DTYPES:
        return {"dtype": _BUILTIN_DTYPES[local]}
    if local in ("QName", "NOTATION"):
        _err(f"xs:{local} needs in-scope namespace bindings a row does "
             "not have (reference: qnames resolved during decode)")
    if local in named:
        return {"base": local}
    _err(f"unknown type {qname!r} (not a built-in, not a global "
         "simpleType of this document)")
    return {}


def _parse_facets(restriction, kw: dict) -> None:
    """Facet children of an xs:restriction -> ColumnSpec kwargs."""
    from ..functions.xpath_assert import xpath_assertion
    for f in restriction:
        tag = _local(f.tag)
        if tag == "annotation":
            continue
        if tag == "simpleType":          # inline base
            continue                     # handled by caller
        v = f.get("value")
        if tag == "pattern":
            kw.setdefault("pattern", []).append(v)
        elif tag == "enumeration":
            kw.setdefault("enum", []).append(v)
        elif tag in _FACET_INT:
            kw[_FACET_INT[tag]] = int(v)
        elif tag in _FACET_STR:
            kw[_FACET_STR[tag]] = v
        elif tag == "whiteSpace":
            kw["whitespace"] = v
        elif tag == "explicitTimezone":
            kw["explicit_timezone"] = v
        elif tag == "assertion":
            test = f.get("test")
            if test is None:
                _err("xs:assertion requires a 'test' attribute "
                     "(facets.py: missing attribute 'test')")
            kw["assertion"] = xpath_assertion(test)
        else:
            _err(f"unsupported facet xs:{tag}")


def _parse_simple_type(node, name: str, named: dict, anon: dict) -> dict:
    """<xs:simpleType> -> ColumnSpec kwargs (dtype/base/facets/list/
    union). `anon` collects generated named entries for inline bases."""
    body = [c for c in node if _local(c.tag) != "annotation"]
    if len(body) != 1:
        _err(f"simpleType {name!r} must contain exactly one of "
             "restriction|list|union")
    child = body[0]
    kind = _local(child.tag)
    if kind == "restriction":
        kw: dict = {}
        base = child.get("base")
        inline = [c for c in child if _local(c.tag) == "simpleType"]
        if base is None and inline:
            anon_name = f"{name}__base"
            anon[anon_name] = _parse_simple_type(
                inline[0], anon_name, named, anon)
            kw["base"] = anon_name
        elif base is None:
            _err(f"xs:restriction in {name!r} needs base= or an inline "
                 "simpleType")
        else:
            kw.update(_resolve_type(base, named))
        _parse_facets(child, kw)
        return kw
    if kind == "list":
        item_type = child.get("itemType")
        inline = [c for c in child if _local(c.tag) == "simpleType"]
        if item_type is not None:
            item_kw = _resolve_type(item_type, named)
        elif inline:
            item_kw = _parse_simple_type(inline[0], f"{name}__item",
                                         named, anon)
        else:
            _err(f"xs:list in {name!r} needs itemType= or an inline "
                 "simpleType")
        if item_kw.get("lexical_list"):
            _err("a list of a list type is not representable "
                 "(reference rejects list-of-list item types too)")
        return {"lexical_list": True, "item": item_kw}
    if kind == "union":
        members: list[dict] = []
        mt = child.get("memberTypes")
        if mt:
            for q in mt.split():
                members.append(_resolve_type(q, named))
        for inline in child:
            if _local(inline.tag) == "simpleType":
                members.append(_parse_simple_type(
                    inline, f"{name}__member{len(members)}", named, anon))
        if not members:
            _err(f"xs:union in {name!r} has no member types")
        return {"union_members": members}
    _err(f"unsupported simpleType child xs:{kind}")
    return {}


def _kw_to_colspec(name: str, kw: dict) -> ColumnSpec:
    kw = dict(kw)
    if kw.get("item") is not None and isinstance(kw["item"], dict):
        kw["item"] = _kw_to_colspec(name, kw["item"])
    if kw.get("union_members"):
        kw["union_members"] = [
            m if isinstance(m, ColumnSpec) else _kw_to_colspec(name, m)
            for m in kw["union_members"]]
    return ColumnSpec(name=name, **kw)


# ------------------------------------------------------------------ particles

_OCCURS_RE = re.compile(r"^\d+$")


def _occ(node, attr: str, dflt: int):
    v = node.get(attr)
    if v is None:
        return dflt
    if v == "unbounded":
        return None
    if not _OCCURS_RE.match(v):
        _err(f"bad {attr} value {v!r}")
    return int(v)


def _parse_particle(node, named: dict, complex_names: set) -> ParticleSpec:
    tag = _local(node.tag)
    lo, hi = _occ(node, "minOccurs", 1), _occ(node, "maxOccurs", 1)
    if tag == "element":
        name = node.get("name") or node.get("ref")
        if name is None:
            _err("element particle needs name= or ref=")
        return ParticleSpec(kind="element", name=_strip_prefix(name),
                            min_occurs=lo, max_occurs=hi,
                            abstract=node.get("abstract") == "true")
    if tag == "any":
        ns = node.get("namespace")
        if ns and ns not in ("##any", "##other", "##local",
                             "##targetNamespace"):
            ns = ns.split()
        return ParticleSpec(kind="any", min_occurs=lo, max_occurs=hi,
                            namespace=ns if ns else "##any",
                            process_contents=node.get("processContents",
                                                      "strict"))
    if tag in ("sequence", "choice", "all"):
        children = [_parse_particle(c, named, complex_names)
                    for c in node if _local(c.tag) != "annotation"]
        return ParticleSpec(kind=tag, min_occurs=lo, max_occurs=hi,
                            children=children)
    _err(f"unsupported particle xs:{tag} (group refs and "
         "complexContent need schema flattening first)")
    raise AssertionError  # unreachable


def _element_is_simple(el, named: dict) -> bool:
    t = el.get("type")
    if t is not None:
        local = _strip_prefix(t)
        return (local in _BUILTIN_DTYPES or local in _BUILTIN_LISTS
                or local in named)
    return any(_local(c.tag) == "simpleType" for c in el)


# -------------------------------------------------------------- identity

_STEP_RE = re.compile(r"^(?:\./)?(?:\.//)?(?:[A-Za-z_][\w.-]*:)?"
                      r"([A-Za-z_][\w.-]*|\.)$")


def _selector_target(xpath: str) -> Optional[str]:
    """The element name a selector xpath points at ('.' = context)."""
    m = _STEP_RE.match(xpath.strip())
    return m.group(1) if m else None


def _field_column(xpath: str) -> str:
    p = xpath.strip()
    if p.startswith("@"):
        p = p[1:]
    p = _strip_prefix(p)
    if not re.match(r"^[A-Za-z_][\w.-]*$", p):
        _err(f"identity field {xpath!r} must be a single '@attr' or "
             "'child' step (multi-step field paths need document "
             "structure a row does not have)")
    return p


# ------------------------------------------------------------------- main

def spec_from_xsd(xsd: str, *, element: Optional[str] = None,
                  key_column: Optional[str] = None,
                  tags_column: Optional[str] = None,
                  xsd11: bool = False) -> TableSpec:
    """Build a TableSpec from XSD schema text (or a file path).

    element:    name of the global xs:element that represents one ROW
                (defaults to the single global element).
    key_column: the row-identity column; defaults to the field of the
                schema's single single-field xs:key, if there is one.
    tags_column: when the row element's content model has COMPLEX
                children, the name of the column holding the row's
                child-tag sequence (array<string>, array<struct> with a
                'tag' field, or lexical); the particle tree becomes a
                ContentModelSpec over it.
    xsd11:      enable XSD 1.1 particle rules (relaxed 'all', asserts
                are always accepted since the engine targets 1.1
                assertions natively).
    """
    text = xsd if xsd.lstrip().startswith("<") else open(xsd).read()
    root = ElementTree.fromstring(text)
    if root.tag != f"{_N}schema":
        _err(f"root element is {root.tag!r}, expected xs:schema")
    target_ns = root.get("targetNamespace")

    for child in root:
        if _local(child.tag) in _UNSUPPORTED_TOP:
            _err(f"xs:{_local(child.tag)} is not supported — flatten "
                 "the schema first (the reference resolves these "
                 "during schema build)")

    named: dict[str, dict] = {}
    anon: dict[str, dict] = {}
    for st in root.findall(f"{_N}simpleType"):
        name = st.get("name")
        if name is None:
            _err("global simpleType requires a name")
        named[name] = {}          # pre-register for forward refs
    for st in root.findall(f"{_N}simpleType"):
        name = st.get("name")
        named[name] = _parse_simple_type(st, name, named, anon)
    named.update(anon)

    complex_types = {ct.get("name"): ct
                     for ct in root.findall(f"{_N}complexType")
                     if ct.get("name")}

    globals_ = root.findall(f"{_N}element")
    if element is None:
        if len(globals_) != 1:
            _err(f"{len(globals_)} global elements — pass element= to "
                 "choose the row element")
        row_el = globals_[0]
    else:
        cands = [e for e in globals_ if e.get("name") == element]
        if not cands:
            _err(f"no global element named {element!r}")
        row_el = cands[0]
    table_name = row_el.get("name")

    # ---- resolve the row element's complexType
    ct = None
    t = row_el.get("type")
    if t is not None:
        local = _strip_prefix(t)
        if local in complex_types:
            ct = complex_types[local]
        else:
            _err(f"row element type {t!r} is not a global complexType "
                 "of this document (simple-typed row elements carry no "
                 "columns)")
    else:
        inline = [c for c in row_el if _local(c.tag) == "complexType"]
        if not inline:
            _err(f"row element {table_name!r} has no complexType")
        ct = inline[0]

    columns: list[ColumnSpec] = []
    asserts: list[AssertSpec] = []
    content_models: list[ContentModelSpec] = []
    open_content = None

    def _column_from_simple(name, el, lo, hi):
        t = el.get("type")
        if t is not None:
            kw = dict(_resolve_type(t, named))
        else:
            inline = [c for c in el if _local(c.tag) == "simpleType"]
            kw = _parse_simple_type(inline[0], f"{name}__type",
                                    named, anon) if inline else {}
        if hi is None or hi > 1:
            # repeated simple element -> array column; the array size
            # IS the occurs count (min/maxOccurs -> min/max_length)
            item = dict(kw)
            kw = {"dtype": "array<string>",
                  "item": item or {"dtype": "string"}}
            if lo > 0:
                kw["min_length"] = lo
            if hi is not None:
                kw["max_length"] = hi
            kw["nullable"] = lo == 0
        else:
            kw["nullable"] = lo == 0
        if el.get("fixed") is not None:
            kw["fixed"] = el.get("fixed")
        if el.get("default") is not None:
            kw["default"] = el.get("default")
        columns.append(_kw_to_colspec(name, kw))

    # ---- attributes
    def _walk_attributes(node):
        for a in node.findall(f"{_N}attribute"):
            name = a.get("name")
            use = a.get("use", "optional")
            if use == "prohibited":
                # tabular analog of a prohibited attribute: if the
                # column exists it must be entirely absent (NULL)
                asserts.append(AssertSpec(
                    name=f"prohibited_{name}",
                    expr=f"`{name}` IS NULL", columns=[name]))
                continue
            t = a.get("type")
            if t is not None:
                kw = dict(_resolve_type(t, named))
            else:
                inline = [c for c in a if _local(c.tag) == "simpleType"]
                kw = _parse_simple_type(inline[0], f"{name}__type",
                                        named, anon) if inline else {}
            kw["nullable"] = use != "required"
            if a.get("fixed") is not None:
                kw["fixed"] = a.get("fixed")
            if a.get("default") is not None:
                kw["default"] = a.get("default")
            columns.append(_kw_to_colspec(name, kw))
        if node.findall(f"{_N}anyAttribute"):
            pass  # wildcard attributes = allow_extra_columns (default)

    _walk_attributes(ct)

    # ---- content
    model_groups = [c for c in ct
                    if _local(c.tag) in ("sequence", "choice", "all")]
    oc_nodes = [c for c in ct if _local(c.tag) == "openContent"]
    if _local(ct.tag) == "complexType" and any(
            _local(c.tag) in ("simpleContent", "complexContent")
            for c in ct):
        _err("simpleContent/complexContent derivation on the row "
             "element is not supported — flatten the type first")
    if ct.get("mixed") == "true":
        _err("mixed content has no tabular analog")

    if model_groups:
        group = model_groups[0]
        elements = [c for c in group if _local(c.tag) == "element"]
        non_element = [c for c in group
                       if _local(c.tag) not in ("element", "annotation")]
        all_simple = (not non_element and _local(group.tag) != "choice"
                      and all(_element_is_simple(e, named)
                              for e in elements)
                      and tags_column is None)
        if all_simple:
            # flat row shape: each child element is a column
            for e in elements:
                lo, hi = _occ(e, "minOccurs", 1), _occ(e, "maxOccurs", 1)
                _column_from_simple(e.get("name"), e, lo, hi)
        else:
            if tags_column is None:
                _err("the row element has structured content (complex "
                     "children, choice, or wildcards) — pass "
                     "tags_column= naming the column that holds the "
                     "row's child-tag sequence, and the particle tree "
                     "will compile to a ContentModelSpec")
            if oc_nodes:
                oc = oc_nodes[0]
                wc = [c for c in oc if _local(c.tag) == "any"]
                open_content = OpenContentSpec(
                    mode=oc.get("mode", "interleave"),
                    wildcard=_parse_particle(wc[0], named, set())
                    if wc else None)
            content_models.append(ContentModelSpec(
                name=table_name, column=tags_column,
                model=_parse_particle(group, named, set()),
                target_ns=target_ns, open_content=open_content,
                xsd11=xsd11))

    # ---- XSD 1.1 asserts on the complexType
    from ..functions.xpath_assert import translate_xpath_assert
    for i, a in enumerate(ct.findall(f"{_N}assert")):
        test = a.get("test")
        if test is None:
            _err("xs:assert requires a 'test' attribute")
        asserts.append(AssertSpec(
            name=a.get("id") or f"assert_{i}",
            expr=translate_xpath_assert(test)))

    # ---- identity constraints (on ANY element of the document whose
    # selector resolves to the row element)
    uniques: list[UniqueSpec] = []
    keyrefs: list[KeyrefSpec] = []
    keys_by_name: dict[str, UniqueSpec] = {}
    pending_keyrefs = []
    for holder in root.iter(f"{_N}element"):
        for ic in holder:
            kind = _local(ic.tag)
            if kind not in ("unique", "key", "keyref"):
                continue
            sel = ic.find(f"{_N}selector")
            fields = ic.findall(f"{_N}field")
            if sel is None or not fields:
                _err(f"xs:{kind} {ic.get('name')!r} needs selector + "
                     "field children")
            target = _selector_target(sel.get("xpath", ""))
            on_row = (target == table_name
                      or (target == "." and holder is row_el))
            if not on_row:
                _err(f"xs:{kind} {ic.get('name')!r} selector "
                     f"{sel.get('xpath')!r} does not resolve to the "
                     f"row element {table_name!r} (only row-scoped "
                     "identities have a tabular analog)")
            cols = [_field_column(f.get("xpath", "")) for f in fields]
            name = ic.get("name")
            if kind in ("unique", "key"):
                u = UniqueSpec(name=name, columns=cols,
                               is_key=(kind == "key"))
                uniques.append(u)
                keys_by_name[name] = u
            else:
                pending_keyrefs.append((name, cols,
                                        _strip_prefix(ic.get("refer"))))
    for name, cols, refer in pending_keyrefs:
        if refer not in keys_by_name:
            _err(f"xs:keyref {name!r} refers to unknown key {refer!r}")
        ref = keys_by_name[refer]
        if len(cols) != len(ref.columns):
            _err(f"xs:keyref {name!r}: cardinality of the keyref "
                 "fields must be the same of the referred key "
                 "(identities.py keyref arity check)")
        keyrefs.append(KeyrefSpec(name=name, columns=cols,
                                  ref_table=table_name,
                                  ref_columns=list(ref.columns)))

    # ---- key column
    if key_column is None:
        single = [u for u in uniques if u.is_key and len(u.columns) == 1]
        if len(single) == 1:
            key_column = single[0].columns[0]
        else:
            _err("pass key_column= (no single single-field xs:key to "
                 "infer it from)")

    return TableSpec(
        name=table_name, key_column=key_column, columns=columns,
        simple_types={n: _kw_to_colspec(n, kw)
                      for n, kw in {**named, **anon}.items()},
        uniques=uniques, keyrefs=keyrefs, asserts=asserts,
        content_models=content_models)
