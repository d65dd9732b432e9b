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

  xs:group / xs:attributeGroup (global def + ref) -> expanded in
    place: a group ref becomes a copy of the named model group with
    the ref's occurs (groups.py:61 XsdGroup ref parse; occurs live on
    the REFERENCE, the named group's top model group carries none);
    attributeGroup refs splice their attribute declarations
    (attributes.py:336-505). Circular refs raise like the reference's
    circularity checks.

  complexContent extension / restriction on the row type -> flattened
    derivation (complex_types.py:361-500 / Xsd11 893-1003): extension
    appends its particle AFTER the base's in an implicit sequence and
    MERGES attributes (duplicate attribute = error); the XSD 1.0
    'all'-extension prohibitions and the XSD 1.1 all-extends-all
    member merge (same minOccurs) use the reference's own wordings.
    Restriction REPLACES the content model and overrides attributes
    by name (use='prohibited' drops the base attribute and asserts
    the column NULL). xs:assert conjoins down the chain.

  simpleContent extension / restriction -> the text content becomes
    the ``value_column`` column (its simple type resolved through the
    chain, restriction facets applied as a derivation step) plus the
    merged attribute columns (complex_types.py:302-359).

  xs:include -> merged in place when the schema is given as a FILE
    PATH (locations resolve against the including file's directory,
    loaded at most once — circular include chains are legal and stop);
    a no-namespace included document is ADOPTED into the including
    schema's targetNamespace (chameleon include, schemas.py:345-348).

  targetNamespace / xs:import (loaders.py:85-182) -> each document's
    QName references resolve against its own in-scope xmlns
    declarations; global components of namespace U key as '{U}name'
    internally and all references rewrite to those canonical keys at
    load, so the rest of the importer is namespace-free. Imports load
    from schemaLocation (relative to the importing FILE) or from the
    `locations=` argument {namespace: path-or-text}; an unresolvable
    import namespace defers (reference: warning) and only an actual
    reference into it errors. Parse-error parity: importing one's own
    targetNamespace, import/include targetNamespace mismatches, and
    unmapped QName prefixes use the reference's wordings.

  xs:alternative (XSD 1.1 type alternatives, elements.py:654-657 +
    get_alternative_type elements.py:1340) -> ConditionalSpec: each
    alternative's test runs through the XPath translator with
    first-match-wins guards; a test-less final alternative is the
    default; the declared type's columns stay unconditional. A mixed
    attributes-only complexType imports as an unconstrained string
    value column (emptiable mixed content IS tabular text).

  mixed content (round 6) -> the row's character data lands in the
    VALUE COLUMN (an unconstrained string — the reference decodes
    mixed text as untyped character data) NEXT TO the content model
    over tags_column; interleaving positions are not represented
    (documented divergence: a row is column-shaped, not a node list).
    Mixed-ness propagates down complexContent EXTENSIONS; emptiable
    mixed (attributes only) stays a bare string value column.

  xs:redefine / xs:override (round 6; loaders.py:118-167) -> the
    target document loads with include semantics; override children
    REPLACE same-named components, redefine children DERIVE from the
    original (renamed '<key>__redefined', self-references repointed —
    'wrong redefinition without self-reference' parity when a type
    redefinition never references itself). xs:notation declarations
    register as the xs:NOTATION value space; xs:QName / xs:NOTATION
    columns resolve value prefixes against TableSpec.namespaces (the
    main document's root bindings).

  record-shaped complex children (round 6) -> STRUCT columns: a
    single-occurrence complex child whose type is attributes + an
    all-simple (or recursively record-shaped) sequence maps to dotted
    nested-field ColumnSpecs ('owner.name', parent='owner') instead of
    requiring tags_column (the reference decodes complex children as
    nested dicts — complex_types.py content mapping + the converters'
    default layout). Required fields are guarded by parent presence
    (minOccurs=0 absence violates nothing); a required record child
    emits a presence assert; simpleContent text becomes a
    value_column field. Mixed/choice/wildcard/repeated/recursive
    children stay on the content-model path. Identity constraint
    fields may be multi-step paths ('owner/@id',
    identities.py:70-96) — they compile to nested-field selectors
    (functions/selectors.py). Passing tags_column= explicitly keeps
    the whole content on the content-model path.

  repeated record children (round 6) -> array<struct> columns
    (RecordArraySpec): a maxOccurs>1 record-shaped child maps its
    particle occurs to ARRAY-SIZE bounds on the parent row and its
    fields to a compiled element sub-plan the runner evaluates over
    the exploded array (explode is narrow — per-element validation
    adds zero shuffles). The reference decodes such children as lists
    of dicts (complex_types.py content, converters default layout).

Out of scope (raises ValueError naming the construct): anything else
the walk rejects by name. The reference resolves those during schema
build; flattening them is schema-authoring work the importer will not
guess at.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Optional
from xml.etree import ElementTree

from ..specs import (AssertSpec, AttrWildcardSpec, ColumnSpec,
                     ConditionalSpec, ContentModelSpec, KeyrefSpec,
                     OpenContentSpec, ParticleSpec, RecordArraySpec,
                     TableSpec, UniqueSpec)

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

_XML_NS = "http://www.w3.org/XML/1998/namespace"

# QName-valued attributes of XSD components (resolved against the
# in-scope namespace declarations, like the reference's
# schema.resolve_qname, schemas.py:1180-1199)
_QNAME_ATTRS = ("type", "base", "ref", "itemType", "refer",
                "substitutionGroup", "defaultAttributes")

# global components whose name= lives in the schema's targetNamespace
_COMPONENT_TAGS = ("simpleType", "complexType", "group",
                   "attributeGroup", "element", "attribute", "notation")


def _parse_schema_doc(text: str):
    """Parse schema text capturing each element's in-scope namespace
    declarations (the reference keeps these via XMLResource
    get_namespaces; ElementTree drops them, so we track start-ns
    events against the element stack). Returns (root, scopes) with
    scopes[id(element)] = {prefix: uri} ('' = default namespace)."""
    parser = ElementTree.XMLPullParser(["start-ns", "start", "end"])
    try:
        parser.feed(text)
        parser.close()
    except ElementTree.ParseError as e:
        _err(f"schema document does not parse: {e}")
    root = None
    stack = [{"xml": _XML_NS}]
    pending: list = []
    scopes: dict[int, dict] = {}
    for ev, obj in parser.read_events():
        if ev == "start-ns":
            pending.append(obj)
        elif ev == "start":
            if pending:
                ns = dict(stack[-1])
                ns.update(dict(pending))
                pending = []
            else:
                ns = stack[-1]
            stack.append(ns)
            scopes[id(obj)] = ns
            if root is None:
                root = obj
        else:
            stack.pop()
    return root, scopes


def _canon(qname: str, nsmap: dict, default_ns: str = "") -> str:
    """Resolve a QName against in-scope declarations to its canonical
    key: 'xs:local' for the XSD namespace, bare local for
    no-namespace, Clark '{uri}local' otherwise. `default_ns` supplies
    the chameleon default (reference schemas.py:345-348: a schema
    adopted into a namespace maps the unbound default prefix to it)."""
    qname = qname.strip()
    if qname.startswith("{"):
        uri, local = qname[1:].split("}", 1)
    elif ":" in qname:
        prefix, local = qname.split(":", 1)
        uri = nsmap.get(prefix)
        if uri is None:
            _err(f"prefix {prefix!r} not found in namespace map")
    else:
        local = qname
        uri = nsmap.get("") or default_ns
    if uri == _XSD_NS:
        return f"xs:{local}"
    if not uri:
        return local
    return "{%s}%s" % (uri, local)


def _key_in_ns(name: str, tns: str) -> str:
    """Registration key of a global component named `name` in
    targetNamespace `tns` — the same canonical form _canon produces
    for references, so lookups are exact string matches."""
    if not tns:
        return name
    if tns == _XSD_NS:
        return f"xs:{name}"
    return "{%s}%s" % (tns, name)


def _localname(key: str) -> str:
    """Display/column name of a canonical key (drop the namespace)."""
    if key.startswith("{"):
        return key.rsplit("}", 1)[1]
    if key.startswith("xs:"):
        return key[3:]
    return key


def _canonicalize_doc(root, scopes: dict, tns: str,
                      default_ns: str = "") -> None:
    """Rewrite every QName-valued attribute to its canonical key and
    mangle global component names (and identity-constraint names,
    which are schema-global QNames in the target namespace) — after
    this pass the whole schema set resolves by exact string match and
    the namespace layer is gone."""
    root_ns = scopes.get(id(root), {})
    for el in root.iter():
        if not isinstance(el.tag, str):
            continue               # comments / PIs
        ns = scopes.get(id(el), root_ns)
        for a in _QNAME_ATTRS:
            v = el.get(a)
            if v is not None:
                el.set(a, _canon(v, ns, default_ns))
        mt = el.get("memberTypes")
        if mt is not None:
            el.set("memberTypes",
                   " ".join(_canon(q, ns, default_ns)
                            for q in mt.split()))
        nq = el.get("notQName")
        if nq is not None:
            # XSD 1.1 notQName: a list of QNames (resolved here like
            # every other QName-valued attribute) plus the '##defined'
            # / '##definedSibling' tokens, which pass through for the
            # wildcard builders to expand (wildcards.py:121-158; the
            # reference's unmapped-prefix wording)
            out = []
            for q in nq.split():
                if q.startswith("##"):
                    out.append(q)
                    continue
                try:
                    out.append(_canon(q, ns, default_ns))
                except Exception:
                    _err("unmapped QName in 'notQName' attribute: "
                         f"{q!r}")
            el.set("notQName", " ".join(out))
        if tns and _local(el.tag) in ("unique", "key", "keyref") \
                and el.get("name"):
            el.set("name", _key_in_ns(el.get("name"), tns))
    if tns:
        for child in root:
            if isinstance(child.tag, str) \
                    and _local(child.tag) in _COMPONENT_TAGS \
                    and child.get("name"):
                child.set("name", _key_in_ns(child.get("name"), tns))


def _read_schema_source(src: str, base_dir: Optional[str],
                        what: str) -> tuple:
    """(text, base_dir, normalized path or None) of a schema source
    that is either literal XML text or a file path / location."""
    if src.lstrip().startswith("<"):
        return src, base_dir, None
    if base_dir is None and not os.path.isabs(src):
        _err(f"{what} location {src!r} is relative — give the schema "
             "as a FILE PATH so locations can resolve against its "
             "directory")
    path = os.path.normpath(os.path.join(base_dir or "", src))
    try:
        with open(path) as f:
            return f.read(), os.path.dirname(path), path
    except OSError as e:
        _err(f"cannot load {what} {src!r}: {e}")


def _assemble_schema_set(xsd: str,
                         locations: Optional[dict] = None) -> tuple:
    """Load the main schema plus its xs:include / xs:import closure,
    canonicalize every document against its own namespace
    declarations, and merge all global components into the main root.
    Returns (root, target_ns).

    Reference parity (loaders.py:85-182 load_declared_schemas):
      - include: same targetNamespace required; a no-namespace
        document is adopted into the including schema's namespace
        (chameleon include) with its unbound default prefix mapped to
        it (schemas.py:345-348); circular chains are legal and stop
        (loaded at most once per location).
      - import: namespace= must differ from the importing schema's
        targetNamespace (loaders.py:103-108 wordings); the imported
        document's targetNamespace must match the declared namespace
        (schemas.py:341-343 wording); a location-less import is
        satisfied from `locations` {namespace: path-or-text}; a
        namespace that stays unresolvable is NOT an error until a
        reference into it fails to resolve (the reference defers
        missing imports the same way, loaders.py:128-147).
    """
    locations = dict(locations or {})
    main_text, main_base, main_path = _read_schema_source(
        xsd, None, "schema")
    # one document may be reached both by include and by import —
    # load it at most once per (path, namespace it lands in)
    seen_docs: set = set()
    if main_path is not None:
        peek, _ = _parse_schema_doc(main_text)
        if peek is not None:
            seen_docs.add((main_path,
                           peek.get("targetNamespace") or ""))
    merged: list = []          # sub-document components, load order

    main_nsmap: dict = {}

    def load(text, base_dir, adopt_tns, expected_ns, doc_path=None):
        root, scopes = _parse_schema_doc(text)
        if root is None or root.tag != f"{_N}schema":
            _err(f"root element is {getattr(root, 'tag', None)!r}, "
                 "expected xs:schema")
        if adopt_tns is None and expected_ns is None:
            # the MAIN document's root bindings become the spec's
            # namespace map (TableSpec.namespaces) for QName values
            main_nsmap.update(scopes.get(id(root), {}))
        tns = root.get("targetNamespace") or ""
        default_ns = ""
        if adopt_tns is not None:            # include context
            if tns and tns != adopt_tns:
                _err(f"the targetNamespace {tns!r} of an included "
                     f"schema differs from {adopt_tns!r} of the "
                     "including schema")
            if not tns and adopt_tns:
                default_ns = adopt_tns       # chameleon adoption
            tns = adopt_tns
        if expected_ns is not None:          # import context
            if tns and tns != expected_ns:
                _err("targetNamespace of XSD resource differs from "
                     f"what expected (found {tns!r} instead of "
                     f"{expected_ns!r})")
            if not tns:
                default_ns = expected_ns     # adopted import
            tns = expected_ns

        def _process_redefine(decl, kind):
            """xs:redefine / xs:override (loaders.py:118-167 load,
            xsd_globals.py redefinition checks). Both load the target
            document with include semantics; override children REPLACE
            the same-named components outright; redefine children
            DERIVE from them — the original is renamed '<key>__redefined'
            and the redefining component's self-references repoint at
            it ('wrong redefinition without self-reference' when a
            simple/complexType redefinition never references itself,
            simple_types.py:1313)."""
            root.remove(decl)
            loc = decl.get("schemaLocation")
            if loc is None:
                _err(f"xs:{kind} requires a schemaLocation attribute")
            try:
                sub_text, sub_base, sub_path = _read_schema_source(
                    loc, base_dir, f"{kind} schema")
            except ValueError as e:
                _err(f"can't {kind} schema {loc!r}: {e}")
            if sub_path is not None and sub_path == doc_path:
                _err(f"can't {kind} the same schema {loc!r}")
            if (sub_path, tns) in seen_docs:
                _err(f"can't {kind} schema {loc!r}: it is already "
                     "loaded via another include/import — redefining "
                     "an independently-included document is not "
                     "supported")
            if sub_path is not None:
                seen_docs.add((sub_path, tns))
            sub = load(sub_text, sub_base, tns, None, sub_path)
            sub_comps = [c for c in sub if isinstance(c.tag, str)]
            children = [c for c in decl if isinstance(c.tag, str)
                        and _local(c.tag) != "annotation"]
            if kind == "override":
                repl = {(_local(c.tag), _key_in_ns(c.get("name"), tns))
                        for c in children if c.get("name")}
                sub_comps = [c for c in sub_comps
                             if (_local(c.tag), c.get("name"))
                             not in repl]
            else:
                for child in children:
                    cname = child.get("name")
                    if cname is None:
                        _err(f"xs:redefine child xs:{_local(child.tag)}"
                             " requires a name")
                    key = _key_in_ns(cname, tns)
                    tgt = [c for c in sub_comps
                           if _local(c.tag) == _local(child.tag)
                           and c.get("name") == key]
                    if not tgt:
                        _err(f"redefined xs:{_local(child.tag)} "
                             f"{cname!r} not found in {loc!r}")
                    newkey = key + "__redefined"
                    for t in tgt:
                        t.set("name", newkey)
                    found_self = False
                    root_ns = scopes.get(id(root), {})
                    for el in child.iter():
                        ns = scopes.get(id(el), root_ns)
                        for a in _QNAME_ATTRS:
                            v = el.get(a)
                            if v is not None and \
                                    _canon(v, ns, default_ns) == key:
                                el.set(a, newkey)
                                found_self = True
                        mt = el.get("memberTypes")
                        if mt is not None:
                            toks = []
                            for q in mt.split():
                                if _canon(q, ns, default_ns) == key:
                                    toks.append(newkey)
                                    found_self = True
                                else:
                                    toks.append(q)
                            el.set("memberTypes", " ".join(toks))
                    if not found_self and _local(child.tag) in (
                            "simpleType", "complexType"):
                        _err("wrong redefinition without "
                             "self-reference")
            merged.extend(sub_comps)
            # the redefining/overriding components belong to THIS
            # document: re-appended so its canonicalization pass
            # resolves and registers them
            for c in children:
                root.append(c)

        for decl in list(root):
            kind = _local(decl.tag) if isinstance(decl.tag, str) else ""
            if kind == "include":
                loc = decl.get("schemaLocation")
                if loc is None:
                    _err("xs:include requires a schemaLocation "
                         "attribute")
                root.remove(decl)
                sub_text, sub_base, sub_path = _read_schema_source(
                    loc, base_dir, "included schema")
                if sub_path is not None:
                    if (sub_path, tns) in seen_docs:
                        continue             # circular chains stop
                    seen_docs.add((sub_path, tns))
                sub = load(sub_text, sub_base, tns, None, sub_path)
                merged.extend(c for c in sub if isinstance(c.tag, str))
            elif kind in ("redefine", "override"):
                _process_redefine(decl, kind)
            elif kind == "import":
                root.remove(decl)
                ns = (decl.get("namespace") or "").strip()
                if ns == tns:
                    if ns == "":
                        _err("if the 'namespace' attribute is not "
                             "present on the import statement then "
                             "the imported schema must have a "
                             "'targetNamespace'")
                    _err("the attribute 'namespace' must be different "
                         "from schema's 'targetNamespace'")
                # candidate locations: the schemaLocation hint, then
                # the locations= map; a location that fails to LOAD is
                # skipped like a missing one — the reference records
                # these as warnings, not errors (loaders.py:128-136,
                # 'It is not an error if the location fails to
                # resolve'); only an actual reference into a
                # never-loaded namespace fails, at resolution time
                for loc in (decl.get("schemaLocation"),
                            locations.get(ns)):
                    if loc is None:
                        continue
                    try:
                        sub_text, sub_base, sub_path = \
                            _read_schema_source(loc, base_dir,
                                                "imported schema")
                    except ValueError:
                        continue         # unresolvable hint: try next
                    key = (sub_path, ns) if sub_path else (loc[:120], ns)
                    if key not in seen_docs:
                        seen_docs.add(key)
                        sub = load(sub_text, sub_base, None, ns,
                                   sub_path)
                        merged.extend(c for c in sub
                                      if isinstance(c.tag, str))
                    break            # a never-loaded ns fails lazily

        _canonicalize_doc(root, scopes, tns, default_ns)
        # XSD 1.1 xs:defaultOpenContent (XsdDefaultOpenContent,
        # wildcards.py:900-950): a PER-DOCUMENT default — stamp every
        # complexType node of THIS document (incl. inline ones) so the
        # builder can apply it where the type has no own openContent
        # (complex_types.py:142-152)
        doc_defaults = [c for c in root if isinstance(c.tag, str)
                        and _local(c.tag) == "defaultOpenContent"]
        if doc_defaults:
            d = doc_defaults[0]
            if d.get("mode", "interleave") == "none":
                _err("the attribute 'mode' of a defaultOpenContent "
                     "cannot be 'none'")
            if not [c for c in d if _local(c.tag) == "any"]:
                _err("a defaultOpenContent declaration cannot be "
                     "empty")
            for node in root.iter():
                if isinstance(node.tag, str) \
                        and _local(node.tag) == "complexType":
                    default_oc_map[id(node)] = d
            for c in doc_defaults:
                root.remove(c)
        return root

    default_oc_map: dict[int, object] = {}
    main_root = load(main_text, main_base, None, None, main_path)
    main_root.extend(merged)
    return (main_root, main_root.get("targetNamespace") or "",
            main_nsmap, default_oc_map)

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
    """Local part of a LEGACY 'p:local' form (Clark keys pass through
    _localname instead — a Clark URI may itself contain ':')."""
    if qname.startswith("{"):
        return qname.rsplit("}", 1)[1]
    return qname.rsplit(":", 1)[-1]


def _builtin_kw(local: str) -> Optional[dict]:
    """ColumnSpec kwargs of the XSD built-in named `local`, or None."""
    if local in _BUILTIN_LISTS:
        return {"lexical_list": True,
                "item": {"dtype": _BUILTIN_LISTS[local]}}
    if local in _BUILTIN_DTYPES:
        return {"dtype": _BUILTIN_DTYPES[local]}
    if local in ("QName", "NOTATION"):
        # round 6: value prefixes resolve against the SPEC's namespace
        # map (TableSpec.namespaces, filled from the schema document's
        # root bindings) — the reference resolves against the schema's
        # in-scope map the same way
        return {"dtype": f"xsd:{local}"}
    return None


def _resolve_type(qname: Optional[str], named: dict) -> dict:
    """A CANONICAL type reference -> partial ColumnSpec kwargs.

    'xs:local' resolves only against the built-ins (the reference
    resolves built-ins by the XSD namespace, not by local name);
    anything else prefers the schema set's own global simpleTypes —
    so a user type whose local name collides with a built-in (e.g. a
    no-namespace global simpleType named 'token') is no longer
    shadowed by the built-in. Unqualified names fall back to the
    built-ins only in no-namespace schemas where no user type claims
    the name (legacy-lenient; the reference would reject the
    reference outright there)."""
    if qname is None:
        return {}
    if qname.startswith("xs:"):
        kw = _builtin_kw(qname[3:])
        if kw is None:
            _err(f"unknown XSD built-in type {qname[3:]!r}")
        return kw
    if qname in named:
        return {"base": qname}
    if not qname.startswith("{"):
        kw = _builtin_kw(qname)
        if kw is not None:
            return kw
    _err(f"unknown type {qname!r} (not a built-in, not a global "
         "simpleType of the schema set; if its namespace was imported "
         "without a resolvable schemaLocation, pass "
         "locations={namespace: path_or_text})")
    return {}


def _parse_facets(restriction, kw: dict) -> None:
    """Facet children of an xs:restriction -> ColumnSpec kwargs."""
    from ..functions.xpath_assert import xpath_assertion
    for f in restriction:
        tag = _local(f.tag)
        if tag in ("annotation", "attribute", "attributeGroup",
                   "anyAttribute", "assert"):
            continue                     # non-facet children (a
            # simpleContent restriction body carries attributes and
            # asserts next to its facets — handled by the flattener)
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


def _parse_not_qname(node, allowed: tuple, elems: Optional[dict] = None,
                     clark: bool = False,
                     defined_names=None) -> Optional[list]:
    """The XSD 1.1 notQName exclusion list of a wildcard node
    (wildcards.py:121-158 _parse_not_constraints; QNames were resolved
    to canonical form by _canonicalize_doc). `allowed` lists the legal
    '##' tokens for this wildcard kind — ('##defined',
    '##definedSibling') for xs:any, ('##defined',) for xs:anyAttribute
    — anything else gets the reference's wording. '##defined' expands
    HERE to the closed schema set's global declarations (`elems`
    globals for elements, `defined_names` for attributes — the
    reference consults its dynamic maps at match time,
    wildcards.py:784/:837, but an imported schema set is closed, so
    the static expansion is faithful); '##definedSibling' passes
    through for the containing group to expand. `clark=False` emits
    data-TAG names — local for target-/no-namespace names (the
    element-particle convention) and 'uri:local' for foreign
    namespaces (the wildcard tag convention); `clark=True` emits
    struct FIELD names (Clark form for namespaced names, the
    AttrWildcardSpec convention)."""
    raw = node.get("notQName") if node is not None else None
    if raw is None:
        return None
    tns = (elems or {}).get("tns")

    def _name(k: str) -> str:
        if k.startswith("xs:"):
            k = "{%s}%s" % (_XSD_NS, k[3:])
        if clark or not k.startswith("{"):
            return k
        uri, local = k[1:].split("}", 1)
        return local if uri == (tns or "") else f"{uri}:{local}"

    out: set = set()
    keep_sibling = False
    for tok in raw.split():
        if tok.startswith("##"):
            if tok not in allowed:
                _err("wrong value for 'notQName' attribute")
            if tok == "##definedSibling":
                keep_sibling = True
            elif defined_names is not None:
                out |= {_name(k) for k in defined_names}
            else:
                out |= {_name(k)
                        for k in (elems or {}).get("globals", {})}
        else:
            out.add(_name(tok))
    return sorted(out) + (["##definedSibling"] if keep_sibling else [])


def _parse_particle(node, named: dict, elems: Optional[dict] = None
                    ) -> ParticleSpec:
    """elems (optional): {'globals': name->global element node,
    'subs': head name -> transitive substitution member names} — a REF
    particle naming a substitution head carries its members (and the
    head's abstract flag), the reference's substitution dispatch
    inside content models (elements.py:609-623 + xsd_globals
    substitution maps)."""
    tag = _local(node.tag)
    lo, hi = _occ(node, "minOccurs", 1), _occ(node, "maxOccurs", 1)
    if tag == "element":
        name = node.get("name") or node.get("ref")
        if name is None:
            _err("element particle needs name= or ref=")
        # ParticleSpec names are data TAGS: local for name=; a ref=
        # resolves by its canonical key, displays by its local part
        local = _localname(name)
        abstract = node.get("abstract") == "true"
        substitutes: list = []
        if node.get("ref") is not None:
            ref = node.get("ref")
            if node.get("default") is not None \
                    or node.get("fixed") is not None:
                # reference: ref particles take the value constraint
                # from the GLOBAL declaration (test_elements.py:40-46)
                _err(f"element reference {local!r} cannot carry a "
                     "default/fixed value constraint")
            if elems is not None:
                head = elems.get("globals", {}).get(ref)
                if head is None:
                    _err(f"unknown element ref {local!r}")
                abstract = head.get("abstract") == "true"
                substitutes = sorted(
                    _localname(m)
                    for m in elems.get("subs", {}).get(ref, ()))
        return ParticleSpec(kind="element", name=local,
                            min_occurs=lo, max_occurs=hi,
                            substitutes=substitutes, abstract=abstract)
    if tag == "any":
        ns = node.get("namespace")
        nns = node.get("notNamespace")
        if ns and ns not in ("##any", "##other", "##local",
                             "##targetNamespace"):
            ns = ns.split()
        # XSD 1.1 notNamespace complement: mutually exclusive with
        # namespace= (the content-model normalizer raises the
        # reference's wording when both survive to compile)
        return ParticleSpec(kind="any", min_occurs=lo, max_occurs=hi,
                            namespace=ns if ns else
                            ("##any" if nns is None else None),
                            not_namespace=nns.split()
                            if nns is not None else None,
                            not_qname=_parse_not_qname(
                                node, ("##defined", "##definedSibling"),
                                elems),
                            process_contents=node.get("processContents",
                                                      "strict"))
    if tag in ("sequence", "choice", "all"):
        children = [_parse_particle(c, named, elems)
                    for c in node if _local(c.tag) != "annotation"]
        # '##definedSibling' (Xsd11AnyElement, wildcards.py:786-790):
        # the wildcard never matches a name one of its sibling element
        # particles matches — expanded here, where the siblings are
        # known (the schema set is closed, so static expansion is
        # faithful)
        sibs = sorted({n for c in children if c.kind == "element"
                       for n in [c.name] + list(c.substitutes)})
        for c in children:
            if c.kind == "any" and c.not_qname \
                    and "##definedSibling" in c.not_qname:
                c.not_qname = sorted(
                    (set(c.not_qname) - {"##definedSibling"})
                    | set(sibs))
        return ParticleSpec(kind=tag, min_occurs=lo, max_occurs=hi,
                            children=children)
    _err(f"unsupported particle xs:{tag}")
    raise AssertionError  # unreachable


_MODEL_TAGS = ("sequence", "choice", "all")


def _group_model_child(node, name: str):
    """The single model-group child of a global xs:group definition."""
    body = [c for c in node if _local(c.tag) in _MODEL_TAGS]
    if len(body) != 1:
        _err(f"global group {name!r} must contain exactly one of "
             "sequence|choice|all")
    return body[0]


def _expand_groups(node, groups: dict, stack: tuple = ()):
    """Replace every <xs:group ref=.../> under `node` (a model group)
    with a copy of the referenced global group's model group, carrying
    the REFERENCE's occurs (groups.py XsdGroup ref parse: minOccurs /
    maxOccurs belong to the reference particle; a named group's top
    model group has none). Returns a new node; cycles raise like the
    reference's circular-group check."""
    out = copy.copy(node)
    out[:] = []
    for c in node:
        tag = _local(c.tag)
        if tag == "group":
            ref = c.get("ref")
            if ref is None:
                _err("a group particle inside a model requires ref= "
                     "(named group definitions are global only)")
            if ref in stack:
                _err(f"circular definition of group {ref!r}")
            if ref not in groups:
                _err(f"unknown group ref {ref!r}")
            eff = copy.deepcopy(_group_model_child(groups[ref], ref))
            for attr in ("minOccurs", "maxOccurs"):
                if c.get(attr) is not None:
                    eff.set(attr, c.get(attr))
                elif attr in eff.attrib:
                    del eff.attrib[attr]
            out.append(_expand_groups(eff, groups, stack + (ref,)))
        elif tag in _MODEL_TAGS:
            out.append(_expand_groups(c, groups, stack))
        else:
            out.append(c)
    return out


def _xml_builtin_attr(ref: str):
    """Synthesized declarations of the xml.xsd attributes the
    reference bundles as a base schema (xml:lang / space / base / id)
    — referenced as `xs:attribute ref="xml:lang"` after importing the
    XML namespace, with or without a schemaLocation."""
    if not ref.startswith("{" + _XML_NS + "}"):
        return None
    local = ref.rsplit("}", 1)[1]
    a = ElementTree.Element(f"{_N}attribute")
    a.set("name", local)
    if local == "lang":
        # xml.xsd: union of xs:language and the empty string
        st = ElementTree.SubElement(a, f"{_N}simpleType")
        un = ElementTree.SubElement(st, f"{_N}union")
        m1 = ElementTree.SubElement(un, f"{_N}simpleType")
        ElementTree.SubElement(m1, f"{_N}restriction").set(
            "base", "xs:language")
        m2 = ElementTree.SubElement(un, f"{_N}simpleType")
        r2 = ElementTree.SubElement(m2, f"{_N}restriction")
        r2.set("base", "xs:string")
        ElementTree.SubElement(r2, f"{_N}enumeration").set("value", "")
        return a
    if local == "space":
        st = ElementTree.SubElement(a, f"{_N}simpleType")
        r = ElementTree.SubElement(st, f"{_N}restriction")
        r.set("base", "xs:NCName")
        for v in ("default", "preserve"):
            ElementTree.SubElement(r, f"{_N}enumeration").set("value", v)
        a.set("default", "preserve")
        return a
    if local == "base":
        a.set("type", "xs:anyURI")
        return a
    if local == "id":
        a.set("type", "xs:ID")
        return a
    return None


def _resolve_attr_ref(c, global_attrs: dict):
    """An <xs:attribute ref="..."/> -> an effective declaration node:
    type (and inline simpleType) from the GLOBAL declaration, name its
    local part, use/default/fixed from the reference with the
    reference's consistency rules (attributes.py:98-125)."""
    ref = c.get("ref")
    for banned in ("form", "type"):
        if c.get(banned) is not None:
            _err(f"attribute {banned!r} is not allowed when attribute "
                 "reference is used")
    decl = global_attrs.get(ref)
    if decl is None:
        decl = _xml_builtin_attr(ref)
    if decl is None:
        _err(f"unknown attribute {_localname(ref)!r}")
    node = copy.deepcopy(decl)
    node.set("name", _localname(ref))
    if c.get("use") is not None:
        node.set("use", c.get("use"))
    if c.get("default") is not None:
        node.set("default", c.get("default"))
        node.attrib.pop("fixed", None)   # local default replaces both
    if c.get("fixed") is not None:
        gf = decl.get("fixed")
        if gf is not None and gf != c.get("fixed"):
            _err("referenced attribute has a different fixed value "
                 f"{gf!r}")
        node.set("fixed", c.get("fixed"))
        node.attrib.pop("default", None)
    return node


def _attr_wildcard(node, attr_groups: dict, stack: tuple = ()):
    """The xs:anyAttribute node under `node` (directly or spliced in
    through attributeGroup refs), or None (XsdAnyAttribute parse,
    wildcards.py:164+; a complexType takes at most one complete
    attribute wildcard)."""
    for c in node:
        tag = _local(c.tag)
        if tag == "anyAttribute":
            return c
        if tag == "attributeGroup":
            ref = c.get("ref")
            if ref and ref in attr_groups and ref not in stack:
                hit = _attr_wildcard(attr_groups[ref], attr_groups,
                                     stack + (ref,))
                if hit is not None:
                    return hit
    return None


def _attr_entries(node, attr_groups: dict, stack: tuple = (),
                  global_attrs: Optional[dict] = None) -> list:
    """Attribute declaration nodes under `node` in document order,
    with <xs:attributeGroup ref=.../> spliced recursively and
    <xs:attribute ref=.../> resolved against the global attribute
    declarations (attributes.py:336-505; circular refs raise)."""
    out = []
    local_refs: set = set()
    for c in node:
        tag = _local(c.tag)
        if tag == "attribute":
            if c.get("ref") is not None:
                out.append(_resolve_attr_ref(c, global_attrs or {}))
            else:
                out.append(c)
        elif tag == "attributeGroup":
            ref = c.get("ref")
            if ref is None:
                _err("a nested attributeGroup requires ref= (the "
                     "attribute 'ref' is required in a local "
                     "attributeGroup)")
            if ref in local_refs:
                # attributes.py:455 duplicated-group wording
                _err(f"duplicated attributeGroup {ref!r}")
            local_refs.add(ref)
            if ref in stack:
                _err(f"circular definition of attributeGroup {ref!r}")
            if ref not in attr_groups:
                _err(f"unknown attributeGroup ref {ref!r}")
            out.extend(_attr_entries(attr_groups[ref], attr_groups,
                                     stack + (ref,), global_attrs))
    return out


def _element_is_simple(el, named: dict,
                       globals_map: Optional[dict] = None) -> bool:
    ref = el.get("ref")
    if ref is not None:
        tgt = (globals_map or {}).get(ref)
        return (_element_is_simple(tgt, named, None)
                if tgt is not None else False)
    t = el.get("type")
    if t is not None:
        return _is_simple_type_ref(t, named)
    return any(_local(c.tag) == "simpleType" for c in el)


def _is_simple_type_ref(q: str, named: dict) -> bool:
    """True when canonical type ref `q` denotes a SIMPLE type (named
    before built-in, like _resolve_type)."""
    if q in named:
        return True
    if q.startswith("xs:"):
        local = q[3:]
    elif q.startswith("{"):
        return False
    else:
        local = q
    return local in _BUILTIN_DTYPES or local in _BUILTIN_LISTS


def _merge_attrs(base: dict, own_nodes: list, mode: str):
    """Merge a derivation step's attribute declarations over the
    base's (complex_types.py _parse_content_tail base_attributes):
    extension may only ADD (duplicate = error, attributes.py
    duplicated-attribute rule), restriction overrides by name and
    use='prohibited' DROPS the base attribute (the column must then
    be absent/NULL). Returns (ordered name->node, prohibited set)."""
    attrs = dict(base)
    prohibited: set = set()
    seen_own: set = set()
    for a in own_nodes:
        name = a.get("name")
        if name is None:
            _err("attribute declaration requires name= or ref=")
        if name in seen_own:
            # attributes.py test_duplicated_attribute wording
            _err(f"multiple declaration for attribute {name!r}")
        seen_own.add(name)
        if a.get("use") == "prohibited":
            if a.get("fixed") is not None:
                _err("'fixed' with use=prohibited is not allowed")
            attrs.pop(name, None)
            prohibited.add(name)
            continue
        if a.get("default") is not None \
                and a.get("use", "optional") != "optional":
            _err("the attribute 'use' must be 'optional' if the "
                 "attribute 'default' is present")
        if (a.get("type") or "") in ("xs:ID", "ID"):
            # XSD 1.0 rule (attributes.py:199-208)
            if a.get("default") is not None:
                _err("xs:ID key attributes cannot have a default value")
            if a.get("fixed") is not None:
                _err("xs:ID key attributes cannot have a fixed value")
        if mode == "extension" and name in attrs:
            _err(f"duplicated attribute {name!r} in extension "
                 "(an extension may only add attributes)")
        attrs[name] = a
    return attrs, prohibited


def _content_node(holder, groups: dict):
    """The model-group child of a complexType / derivation element,
    group refs expanded. None if content-less."""
    for c in holder:
        tag = _local(c.tag)
        if tag in _MODEL_TAGS:
            return _expand_groups(c, groups)
        if tag == "group":
            wrapper = copy.copy(holder)
            wrapper[:] = [c]
            return _expand_groups(wrapper, groups)[0]
    return None


def _flatten_ct(ct, env: dict, stack: tuple = ()) -> dict:
    """Flatten a complexType's derivation chain into effective parts:

      attrs       ordered {name: attribute node} after merging
      prohibited  attribute names that must be absent (NULL)
      content     ONE model-group node (synthetic xs:sequence for an
                  extension composition, merged xs:all for the XSD 1.1
                  all-extends-all case) or None
      value_kw    simpleContent value-type kwargs or None
      asserts     xs:assert nodes, base-first (assertions apply down
                  the chain, XSD 1.1)
      oc_nodes    openContent nodes (own wins over inherited)

    Reference parity: complex_types.py:361-500 (XSD 1.0 extension /
    restriction), 893-1003 (XSD 1.1 all-merge), 302-359
    (simpleContent); error strings mirror the reference's."""
    # mixed content contract (round 6): text interleaves with child
    # elements in XML; the tabular row holds the character data in the
    # VALUE COLUMN (unconstrained string — the reference decodes mixed
    # text as untyped character data, complex_types.py content_type)
    # and the child-tag sequence validates through the content model
    # as usual. Mixed with attributes only (emptiable mixed) stays a
    # bare string value column.
    mixed = ct.get("mixed") == "true"
    groups, attr_groups = env["groups"], env["attr_groups"]
    named, anon = env["named"], env["anon"]
    own_attr_nodes = _attr_entries(ct, attr_groups,
                                   global_attrs=env.get("global_attrs"))
    own_asserts = ct.findall(f"{_N}assert")
    own_oc = [c for c in ct if _local(c.tag) == "openContent"]
    own_wc = _attr_wildcard(ct, attr_groups)

    deriv = [c for c in ct
             if _local(c.tag) in ("simpleContent", "complexContent")]
    if not deriv:
        attrs, prohibited = _merge_attrs({}, own_attr_nodes, "own")
        return {"attrs": attrs, "prohibited": prohibited,
                "content": _content_node(ct, groups),
                # mixed: the text content is an unconstrained string
                # value (beside the content model, if any)
                "value_kw": {"dtype": "string"} if mixed else None,
                "asserts": own_asserts, "oc_nodes": own_oc,
                "mixed": mixed, "attr_wc": own_wc}

    d = deriv[0]
    simple = _local(d.tag) == "simpleContent"
    inner = [c for c in d
             if _local(c.tag) in ("restriction", "extension")]
    if len(inner) != 1:
        _err("restriction or extension tag expected "
             f"inside xs:{_local(d.tag)}")
    der = inner[0]
    mode = _local(der.tag)
    base_q = der.get("base")
    if base_q is None:
        _err(f"xs:{mode} requires a base= attribute")

    der_attr_nodes = _attr_entries(der, attr_groups,
                                   global_attrs=env.get("global_attrs"))
    der_asserts = der.findall(f"{_N}assert")
    der_oc = [c for c in der if _local(c.tag) == "openContent"]
    # complete attribute wildcard (wildcards.py union/restriction
    # rules, simplified): an EXTENSION keeps the base's wildcard when
    # it declares none; a RESTRICTION's wildcard is its own only
    der_wc = _attr_wildcard(der, attr_groups) or own_wc

    def _base_ct():
        if base_q in stack or base_q == ct.get("name"):
            _err(f"circular definition of complexType "
                 f"{_localname(base_q)!r}")
        if base_q not in env["complex_types"]:
            _err(f"base type {base_q!r} is not a global complexType "
                 "of the schema set")
        return _flatten_ct(env["complex_types"][base_q], env,
                           stack + (base_q,))

    if simple:
        if mode == "extension":
            # base: a simple type, or a complexType with simple
            # content (complex_types.py:340-359)
            if _is_simple_type_ref(base_q, named):
                value_kw = dict(_resolve_type(base_q, named))
                base_attrs: dict = {}
                base_asserts: list = []
            else:
                base = _base_ct()
                if base["value_kw"] is None:
                    _err(f"base type {base_q!r} has no simple content")
                value_kw = dict(base["value_kw"])
                base_attrs = base["attrs"]
                base_asserts = base["asserts"]
            attrs, prohibited = _merge_attrs(base_attrs,
                                             der_attr_nodes, mode)
        else:
            # simpleContent restriction: base must be a complexType
            # with simple content; its value type becomes a derivation
            # step the restriction's facets chain onto
            # (complex_types.py:302-338)
            if _is_simple_type_ref(base_q, named):
                _err(f"base {base_q!r} is simple or has a simple "
                     "content (a simpleContent restriction derives "
                     "from a complexType)")
            base = _base_ct()
            if base["value_kw"] is None:
                _err(f"base type {base_q!r} has no simple content")
            inline = [c for c in der
                      if _local(c.tag) == "simpleType"]
            if inline:
                # the restriction re-declares the content's simple
                # type inline (complex_types.py:311-318 — the XSD 1.1
                # type-alternatives schemas use this shape); the
                # restriction's own facets then apply to it
                value_kw = _parse_simple_type(
                    inline[0], f"{ct.get('name') or 'row'}__content",
                    named, anon)
            else:
                anon_name = f"{ct.get('name') or 'row'}__content"
                anon[anon_name] = dict(base["value_kw"])
                named[anon_name] = anon[anon_name]
                value_kw = {"base": anon_name}
            _parse_facets(der, value_kw)
            base_asserts = base["asserts"]
            attrs, prohibited = _merge_attrs(base["attrs"],
                                             der_attr_nodes, mode)
        return {"attrs": attrs, "prohibited": prohibited,
                "content": None, "value_kw": value_kw,
                "asserts": (base_asserts + own_asserts + der_asserts),
                "oc_nodes": der_oc or own_oc, "mixed": False,
                "attr_wc": (der_wc if mode == "extension"
                            else _attr_wildcard(der, attr_groups)
                            or own_wc)}

    # ---- complexContent
    base = _base_ct()
    own_content = _content_node(der, groups)
    attrs, prohibited = _merge_attrs(base["attrs"], der_attr_nodes,
                                     mode)
    asserts = base["asserts"] + own_asserts + der_asserts
    oc_nodes = der_oc or own_oc or base["oc_nodes"]
    # content-type mixed-ness rules (complex_types.py:389-394,478-484):
    # an extension with a NON-EMPTY own group must declare the same
    # mixed-ness as its base; with an empty own group the content (and
    # its mixed-ness) stays the base's; a restriction redeclares it
    # but may not derive mixed from an element-only base.
    own_mixed = mixed or d.get("mixed") == "true"
    base_mixed = base.get("mixed", False)
    own_nonempty = own_content is not None and len(own_content) > 0
    base_nonempty = base["content"] is not None and len(base["content"])
    if mode == "extension":
        if own_nonempty and base_nonempty and own_mixed != base_mixed:
            _err(f"base has a different content type "
                 f"(mixed={base_mixed!r}) and the extension group is "
                 "not empty")
        eff_mixed = base_mixed if not own_nonempty else own_mixed
    else:
        if own_mixed and base_nonempty and not base_mixed:
            _err("derived a mixed content from a base type that has "
                 "element-only content")
        eff_mixed = own_mixed

    if base["value_kw"] is not None and not base_mixed:
        # complexContent over a simple-content base: XSD 1.0 admits an
        # EXTENSION that adds no model group — the content stays the
        # base's simple content (complex_types.py:487-490, exercised
        # by features/derivations/complex-extensions.xsd cases 1/3);
        # anything else is the reference's error
        if mode == "extension" and not env["xsd11"] and (
                own_content is None or len(own_content) == 0):
            return {"attrs": attrs, "prohibited": prohibited,
                    "content": None,
                    "value_kw": dict(base["value_kw"]),
                    "asserts": asserts, "oc_nodes": oc_nodes,
                    "mixed": False,
                    "attr_wc": der_wc or base.get("attr_wc")}
        _err(f"base {base_q!r} is simple or has a simple content")

    if mode == "restriction":
        # restriction REPLACES the content model
        # (complex_types.py:361-410)
        content = own_content
    else:
        bnode = base["content"]
        if bnode is None or len(bnode) == 0:
            content = own_content if own_content is not None else bnode
        elif own_content is None or len(own_content) == 0:
            content = bnode
        else:
            bmodel = _local(bnode.tag)
            gmodel = _local(own_content.tag)
            if not env["xsd11"]:
                if gmodel == "all":
                    _err("cannot extend a complex content with xs:all")
                if bmodel == "all" and gmodel == "sequence":
                    _err("xs:sequence cannot extend xs:all")
                if bmodel == "all":
                    _err("XSD 1.0 does not allow extension of a not "
                         "empty 'all' model group")
                content = ElementTree.Element(f"{_N}sequence")
                content.extend([bnode, own_content])
            else:
                if bmodel == "all":
                    if gmodel != "all":
                        _err("cannot extend a not empty 'all' model "
                             "group with a different model")
                    if _occ(bnode, "minOccurs", 1) != \
                            _occ(own_content, "minOccurs", 1):
                        _err("when extend an xs:all group minOccurs "
                             "must be the same")
                    content = copy.copy(bnode)
                    content[:] = list(bnode) + list(own_content)
                elif gmodel == "all":
                    _err(f"xs:all cannot extend a not empty xs:{bmodel}")
                else:
                    content = ElementTree.Element(f"{_N}sequence")
                    content.extend([bnode, own_content])

    return {"attrs": attrs, "prohibited": prohibited,
            "content": content,
            "value_kw": {"dtype": "string"} if eff_mixed else None,
            "asserts": asserts, "oc_nodes": oc_nodes,
            "mixed": eff_mixed,
            "attr_wc": (der_wc or base.get("attr_wc")
                        if mode == "extension"
                        else _attr_wildcard(der, attr_groups))}


# -------------------------------------------------------------- identity

_STEP_RE = re.compile(r"^(?:\./)?(?:\.//)?(?:[A-Za-z_][\w.-]*:)?"
                      r"([A-Za-z_][\w.-]*|\.)$")


def _selector_target(xpath: str) -> Optional[str]:
    """The element name a selector xpath points at ('.' = context)."""
    m = _STEP_RE.match(xpath.strip())
    return m.group(1) if m else None


def _scope_steps(xpath: str) -> list:
    """Local-name child steps of a selector xpath ('a/b', './a') — []
    when the xpath is not a plain child path (descendant axes,
    predicates, wildcards, attribute steps have no node-set analog
    here; the reference's selectors are similarly restricted,
    identities.py:28-120)."""
    p = xpath.strip()
    if p.startswith("./"):
        p = p[2:]
    if not p or "//" in p or "[" in p or "@" in p or "*" in p:
        return []
    steps = []
    for sstep in p.split("/"):
        if not sstep:
            return []
        name = _strip_prefix(sstep)
        if not re.match(r"^[A-Za-z_][\w.-]*$", name):
            return []
        steps.append(name)
    return steps


def _walk_ras(rs):
    for r in rs:
        yield r
        yield from _walk_ras(r.nested)


def _field_column(xpath: str) -> str:
    """Identity field xpath -> column name. A single '@attr' / 'child'
    step is the plain column; a multi-step path ('meta/owner/@id',
    identities.py:70-96 restricted-XPath fields) becomes a selector
    string the engine compiles to a nested struct-field projection
    (functions/selectors.py) — record-shaped children store those
    steps as struct fields."""
    p = xpath.strip()
    if "//" in p:
        _err(f"identity field {xpath!r}: only child/attribute steps "
             "are supported (no descendant axis, predicates, or "
             "wildcards — the reference's restricted-XPath fields, "
             "identities.py:70-96)")
    if p.startswith("./"):
        p = p[2:]
    steps = [s for s in p.split("/") if s]
    if not steps:
        _err(f"identity field {xpath!r}: only child/attribute steps "
             "are supported (no descendant axis, predicates, or "
             "wildcards — the reference's restricted-XPath fields, "
             "identities.py:70-96)")
    cleaned = []
    for i, s in enumerate(steps):
        at = s.startswith("@")
        name = _strip_prefix(s[1:] if at else s)
        if at and i != len(steps) - 1:
            _err(f"identity field {xpath!r}: attribute step must be "
                 "last")
        if not re.match(r"^[A-Za-z_][\w.-]*$", name):
            _err(f"identity field {xpath!r}: invalid step {s!r}")
        cleaned.append(("@" + name) if at else name)
    if len(cleaned) == 1:
        return cleaned[0].lstrip("@")
    return "/".join(cleaned)


# ------------------------------------------------------------------- main

def spec_from_xsd(xsd: str, *, element: Optional[str] = None,
                  key_column: Optional[str] = None,
                  tags_column: Optional[str] = None,
                  value_column: str = "value",
                  xsd11: bool = False,
                  locations: Optional[dict] = None,
                  unroll_recursion: int = 0) -> TableSpec:
    """Build a TableSpec from XSD schema text (or a file path).

    element:    name of the global xs:element that represents one ROW
                (defaults to the single global element); may also name
                a global complexType directly (type-library schemas
                with no element declarations).
    key_column: the row-identity column; defaults to the field of the
                schema's single single-field xs:key, if there is one.
    tags_column: when the row element's content model has COMPLEX
                children, the name of the column holding the row's
                child-tag sequence (array<string>, array<struct> with a
                'tag' field, or lexical); the particle tree becomes a
                ContentModelSpec over it.
    value_column: when the row type has simpleContent, the column
                holding the element's text content (default 'value');
                the simple type resolved through the derivation chain
                validates it.
    xsd11:      enable XSD 1.1 particle rules (relaxed 'all', asserts
                are always accepted since the engine targets 1.1
                assertions natively).
    locations:  {namespace: path-or-schema-text} satisfying xs:import
                statements that carry no (or no resolvable)
                schemaLocation — the analog of the reference's
                `locations` argument (loaders.py get_locations).
    unroll_recursion: bounded unrolling of RECURSIVE record types
                (opt-in; default 0 keeps the content-model fallback).
                k > 0 materializes k recursive re-entries of each type
                as nested struct/array levels and records a CUT path
                beyond them (TableSpec.recursion_cuts): content deeper
                than the unrolled depth is a violation
                ('recursion:depth:<path>') when the physical schema can
                carry it, vacuously valid when it cannot. The reference
                validates recursion to unbounded depth over trees
                (groups.py iter_model); a Spark schema is finite-depth
                by construction, so the cut makes the boundary explicit
                instead of silently unchecked. REQUIRED recursion
                (minOccurs>0 at the re-entry) admits no finite
                instance and still falls back.

    Namespaces: each schema document's QName references resolve
    against its own in-scope xmlns declarations (default namespace
    included — an unprefixed reference in a targetNamespace'd schema
    without a default mapping does NOT find target-namespace
    components, exactly the reference's
    features/namespaces/default_ns_invalid.xsd case). Global
    components of a non-empty namespace are keyed '{uri}name'
    internally; XSD built-ins only resolve through the XSD namespace
    (or unqualified in a no-namespace schema when no user type of
    that name exists).
    """
    root, target_ns, root_nsmap, default_oc_map = \
        _assemble_schema_set(xsd, locations)
    target_ns = target_ns or None

    # xs:notation declarations (notations.py:19-50): global only, and
    # a 'public' or 'system' attribute is required; their QNames are
    # the value space of xs:NOTATION subtypes (builtins.py:146-152)
    notations: dict[str, object] = {}
    for n in root.findall(f"{_N}notation"):
        if n.get("name") is None:
            _err("a notation must have a 'name' attribute")
        if n.get("public") is None and n.get("system") is None:
            _err("a notation must have a 'public' or a 'system' "
                 "attribute")
        notations[n.get("name")] = n
    for holder in root.iter(f"{_N}notation"):
        if holder not in set(notations.values()):
            _err("a notation declaration must be global")

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
    groups: dict = {}
    for g in root.findall(f"{_N}group"):
        if g.get("name") is None:
            _err("global group requires a name")
        groups[g.get("name")] = g
    attr_groups: dict = {}
    for g in root.findall(f"{_N}attributeGroup"):
        if g.get("name") is None:
            _err("global attributeGroup requires a name")
        attr_groups[g.get("name")] = g
    global_attrs: dict = {}
    for a in root.findall(f"{_N}attribute"):
        if a.get("name") is None:
            _err("global attribute requires a name")
        if _localname(a.get("name")) == "xmlns":
            # attributes.py:139-141 wording
            _err("an attribute name must be different from 'xmlns'")
        global_attrs[a.get("name")] = a
    env = {"complex_types": complex_types, "groups": groups,
           "attr_groups": attr_groups, "named": named, "anon": anon,
           "global_attrs": global_attrs, "xsd11": xsd11}

    globals_ = root.findall(f"{_N}element")
    global_elements = {e.get("name"): e for e in globals_
                       if e.get("name")}
    # substitution groups, transitively closed (xsd_globals.py
    # substitution maps; circularity raises like the reference)
    subs: dict = {}
    for e in globals_:
        h = e.get("substitutionGroup")
        if h:
            if h not in global_elements:
                _err(f"unknown substitutionGroup {h!r}")
            subs.setdefault(h, set()).add(e.get("name"))
    changed = True
    while changed:
        changed = False
        for head, members in subs.items():
            extra = set()
            for m in list(members):
                extra |= subs.get(m, set())
            if not extra <= members:
                members |= extra
                changed = True
    for head, members in subs.items():
        if head in members:
            _err(f"circularity found for substitutionGroup {head!r}")
    elems = {"globals": global_elements, "subs": subs,
             "tns": target_ns}

    def _pick_global(name, table, what):
        """Match a user-facing name against a registry of canonical
        keys: exact canonical match first, else a UNIQUE local-name
        match (so element='cars' finds '{urn:vh}cars')."""
        if name in table:
            return name
        hits = [k for k in table if _localname(k) == name]
        if len(hits) > 1:
            _err(f"{what} {name!r} is ambiguous across namespaces: "
                 f"{sorted(hits)} — pass the Clark name")
        return hits[0] if hits else None

    row_el = None
    row_ct_key = None
    if element is None:
        if len(globals_) != 1:
            _err(f"{len(globals_)} global elements — pass element= to "
                 "choose the row element")
        row_el = globals_[0]
    else:
        k = _pick_global(element, global_elements, "element")
        if k is not None:
            row_el = global_elements[k]
        else:
            row_ct_key = _pick_global(element, complex_types,
                                      "complexType")
            if row_ct_key is None:
                _err(f"no global element or complexType named "
                     f"{element!r}")
    table_name = _localname(row_el.get("name")) \
        if row_el is not None else _localname(element)

    # ---- resolve the row element's complexType
    ct = None
    if row_el is None:
        # element= named a global complexType directly (type-library
        # schemas with no element declarations)
        ct = complex_types[row_ct_key]
        t = None
    else:
        t = row_el.get("type")
    if ct is None and t is not None:
        if t in complex_types:
            ct = complex_types[t]
        else:
            _err(f"row element type {t!r} is not a global complexType "
                 "of the schema set (simple-typed row elements carry "
                 "no columns)")
    elif ct is None:
        inline = [c for c in row_el if _local(c.tag) == "complexType"]
        if not inline:
            _err(f"row element {table_name!r} has no complexType")
        ct = inline[0]

    columns: list[ColumnSpec] = []
    asserts: list[AssertSpec] = []
    content_models: list[ContentModelSpec] = []
    record_arrays: list[RecordArraySpec] = []
    attr_wildcards: list[AttrWildcardSpec] = []
    recursion_cuts: list[str] = []
    open_content = None

    class _NotRecord(Exception):
        """Child element is not record-shaped — fall back to the
        content-model (tags_column) path."""

    class _CutRecord(Exception):
        """Recursive re-entry beyond unroll_recursion — the caller
        (_emit_element) registers a recursion-cut path instead of
        descending (required re-entries re-raise _NotRecord)."""

    def _wc_nq_parse_checks(w):
        """The reference's notQName-vs-namespace consistency parse
        errors (wildcards.py:146-155) for a record-path wildcard:
        each excluded name must live in a namespace the wildcard
        otherwise allows. '##definedSibling' is dropped first — the
        names it excludes are the record's DECLARED fields, which the
        extra-field check never consults (a declared field is never
        'extra'), so its tabular expansion is vacuous."""
        if w.not_qname and "##definedSibling" in w.not_qname:
            w.not_qname = [n for n in w.not_qname
                           if n != "##definedSibling"] or None
        if not w.not_qname:
            return w
        from ..runner import _wildcard_admits
        from dataclasses import replace
        ns_only = replace(w, not_qname=None)
        if w.not_namespace is not None:
            if all(not _wildcard_admits(n, ns_only)
                   for n in w.not_qname):
                _err("the namespace of each QName in notQName is "
                     "allowed by notNamespace")
        elif any(not _wildcard_admits(n, ns_only)
                 for n in w.not_qname):
            _err("names in notQName must be in namespaces that are "
                 "allowed")
        return w

    def _any_wc(node, path, oc_mode=None):
        """AttrWildcardSpec(kind='element') from an xs:any node
        (XsdAnyElement, wildcards.py:33-99) or from an xs:openContent
        wildcard (wildcards.py:848-897; an openContent without an
        xs:any child admits ##any with the strict default). In the
        tabular projection extra child elements are extra struct
        fields, so admission follows the anyAttribute machinery
        (runner._attr_wildcard_rows), incl. XSD 1.1 notQName
        exclusions ('##defined' expands to the schema set's global
        elements, wildcards.py:784-791)."""
        ns = node.get("namespace") if node is not None else None
        nns = node.get("notNamespace") if node is not None else None
        if ns is not None and nns is not None:
            _err("'namespace' and 'notNamespace' attributes are "
                 "mutually exclusive")
        return _wc_nq_parse_checks(AttrWildcardSpec(
            path=path, kind="element", oc_mode=oc_mode,
            process=(node.get("processContents", "strict")
                     if node is not None else "strict"),
            namespace=(ns or "##any").split()
            if nns is None else ["##any"],
            not_namespace=nns.split() if nns is not None else None,
            not_qname=_parse_not_qname(
                node, ("##defined", "##definedSibling"), elems,
                clark=True),
            target_ns=target_ns))

    def _attr_wc_spec(wc, path):
        """AttrWildcardSpec from an xs:anyAttribute node
        (wildcards.py:164+), incl. the XSD 1.1 notNamespace
        complement and notQName ('##defined' expands to the schema
        set's global attribute declarations, wildcards.py:837-845;
        '##definedSibling' is an xs:any-only token here,
        wildcards.py:126-132)."""
        ns = wc.get("namespace")
        nns = wc.get("notNamespace")
        if ns is not None and nns is not None:
            _err("'namespace' and 'notNamespace' attributes are "
                 "mutually exclusive")
        return _wc_nq_parse_checks(AttrWildcardSpec(
            path=path,
            process=wc.get("processContents", "strict"),
            namespace=(ns or "##any").split()
            if nns is None else ["##any"],
            not_namespace=nns.split() if nns is not None else None,
            not_qname=_parse_not_qname(
                wc, ("##defined",), elems, clark=True,
                defined_names=global_attrs),
            target_ns=target_ns))

    def _oc_wc(oc_nodes, path):
        """Emit the record/row-level wildcard for an XSD 1.1
        xs:openContent (mode='none' closes the content — no wildcard;
        interleave/suffix admit the same extra-field set once the
        tabular row drops ordering, so `oc_mode` only preserves the
        mode for export round-trips)."""
        oc = oc_nodes[0]
        mode = oc.get("mode", "interleave")
        if mode == "none":
            return
        wcs = [c for c in oc if _local(c.tag) == "any"]
        attr_wildcards.append(
            _any_wc(wcs[0] if wcs else None, path, oc_mode=mode))

    def _default_oc(ct_node, fl):
        """The document's xs:defaultOpenContent node if it applies to
        this complexType (complex_types.py:142-152): the type's OWN
        openContent always wins (incl. mode='none'); the default
        applies when the type is mixed, has a content model, or the
        declaration says appliesToEmpty; simpleContent types never
        take open content."""
        d = default_oc_map.get(id(ct_node))
        if d is None or fl["oc_nodes"]:
            return None
        if fl.get("value_kw") is not None and not fl["mixed"]:
            return None                      # simpleContent
        if fl["mixed"] \
                or (fl["content"] is not None
                    and len(fl["content"]) > 0) \
                or (d.get("appliesToEmpty", "false").strip()
                    in ("true", "1")):
            return d
        return None

    def _record_ct(el):
        """Resolve a child element to its complexType, or raise
        _NotRecord (simple-typed, unresolvable, or no type)."""
        tgt = el
        if el.get("ref") is not None:
            tgt = global_elements.get(el.get("ref"))
            if tgt is None:
                raise _NotRecord
        t = tgt.get("type")
        if t is not None:
            if _is_simple_type_ref(t, named) or t not in complex_types:
                raise _NotRecord
            return complex_types[t]
        inline = [c for c in tgt if _local(c.tag) == "complexType"]
        if not inline:
            raise _NotRecord
        return inline[0]

    def _record_columns(prefix, rct, optional, out_cols, out_asserts,
                        visiting, out_ras=None, out_cuts=None):
        """Map a record-shaped complexType onto dotted ColumnSpecs under
        struct column `prefix` (complex child elements as struct
        columns — the reference decodes them as nested dicts,
        complex_types.py content + converters default layout; here the
        row stores the record as a struct and facets compile against
        the nested projection, pruned to the parquet ReadSchema).

        Record shape = attributes + a content model of element
        particles (+ optional simpleContent/mixed text -> a
        `value_column` field). The full particle tree is walked
        (groups.py:953-1094 decodes these uniformly):

          * nested sequence / all groups — occurrence multipliers
            compose down the tree;
          * REPEATED groups (maxOccurs>1) — each child maps to an
            array field bounded by the composed occurs; children with
            exactly-one occurs per repetition become count DRIVERS and
            a group-coupling assert ties all driver counts together
            (and bounds the optional children by the repetition count);
          * CHOICE groups — every branch maps to a nullable field and
            a selection-count assert enforces the choice occurs
            (exactly-one / at-most-one / bounded repeated selection);
          * MIXED content — the interleaved character data is the
            nullable `value_column` text field beside the child fields
            (the reference decodes mixed text as untyped character
            data, complex_types.py content_type).

        ELEMENT WILDCARDS (xs:any with effective minOccurs=0, and
        XSD 1.1 openContent) map to AttrWildcardSpec(kind='element'):
        extra struct fields admitted per the wildcard's namespace
        constraint + processContents, exactly like anyAttribute — the
        struct projection drops the ordering the wildcard's position
        carried. A wildcard branch inside a choice additionally
        relaxes the selection-count LOWER bounds (an unknown extra
        field could satisfy the choice, which counts over known
        branches cannot see).

        A REQUIRED element wildcard (effective minOccurs>0) sets
        AttrWildcardSpec.min_occurs=1: each instance of the scope must
        carry >= 1 admitted extra child (per-row presence predicate,
        runner._required_wildcard_parts; the lower bound enforced is
        always 1 — the sound relaxation for minOccurs>1, whose count
        a tabular encoding cannot observe).

        What still falls back to the tags_column content-model path
        (_NotRecord): recursive types, and child names duplicated
        across DIFFERENT particles (same-named direct siblings of one
        sequence/all merge into a single repeated field — see
        _walk_group; across nested groups or choice branches the
        per-context counts don't provably add, so a static struct
        cannot carry them)."""
        depth = visiting.count(id(rct))
        if depth > 0 and not unroll_recursion:
            raise _NotRecord                 # recursive element type
        if depth > unroll_recursion:
            raise _CutRecord                 # beyond the unrolled depth
        visiting = visiting + (id(rct),)
        rflat = _flatten_ct(rct, env)
        if rflat["oc_nodes"]:
            # XSD 1.1 openContent inside the record type: extra struct
            # fields are admitted per the wildcard's namespace
            # constraint + processContents (interleave vs suffix only
            # differ in ordering, which the struct projection drops)
            _oc_wc(rflat["oc_nodes"], prefix)
        else:
            d_oc = _default_oc(rct, rflat)
            if d_oc is not None:
                _oc_wc([d_oc], prefix)
        if rflat.get("attr_wc") is not None:
            # xs:anyAttribute inside the record type: extra struct
            # fields are governed by the wildcard's namespace
            # constraint + processContents (strict is the XSD default)
            # — checked against the static DataFrame schema by
            # runner.schema_violations (AttrWildcardSpec)
            attr_wildcards.append(_attr_wc_spec(rflat["attr_wc"],
                                                prefix))
        emitted: set = set()

        def _field(name, kw, required):
            kw = dict(kw)
            kw["nullable"] = not required
            out_cols.append(_kw_to_colspec(f"{prefix}.{name}",
                                           {**kw, "parent": prefix}))

        for name, a in rflat["attrs"].items():
            t = a.get("type")
            if t is not None:
                kw = dict(_resolve_type(t, named))
            else:
                inline = [c for c in a if _local(c.tag) == "simpleType"]
                kw = _parse_simple_type(inline[0],
                                        f"{prefix}.{name}__type",
                                        named, anon) if inline else {}
            if a.get("fixed") is not None:
                kw["fixed"] = a.get("fixed")
            if a.get("default") is not None:
                kw["default"] = a.get("default")
            emitted.add(name)
            _field(name, kw, a.get("use", "optional") == "required")
        for name in sorted(rflat["prohibited"]):
            out_asserts.append(AssertSpec(
                name=f"prohibited_{prefix}.{name}",
                expr=f"{prefix}.{name} IS NULL",
                columns=[f"{prefix}.{name}"]))
        if rflat["value_kw"] is not None:
            kw = dict(rflat["value_kw"])
            emitted.add(value_column)
            _field(value_column, kw, not kw.get("nullable", True))

        rgroup = rflat["content"]
        if rgroup is not None and len(rgroup) > 0:
            if rflat["value_kw"] is not None and not rflat["mixed"]:
                raise _NotRecord             # simpleContent has no group
            _walk_content(prefix, rgroup, optional, out_cols,
                          out_asserts, out_ras, visiting, emitted,
                          out_cuts)

    def _walk_content(prefix, rgroup, optional, out_cols, out_asserts,
                      out_ras, visiting, emitted, out_cuts=None):
        """Walk a content-model particle tree into fields + occurrence
        asserts (see _record_columns). prefix=None = the ROW element's
        own content (plain column names, no parent guard); otherwise
        fields are dotted under struct column `prefix`."""
        pre = (f"{prefix} IS NULL OR "
               if optional and prefix is not None else "")
        guard_cols = [prefix] if (optional and prefix is not None) \
            else []
        label = prefix if prefix is not None else "row"

        def _field(name, kw, required):
            kw = dict(kw)
            kw["nullable"] = not required
            if prefix is None:
                out_cols.append(_kw_to_colspec(name, kw))
            else:
                out_cols.append(_kw_to_colspec(f"{prefix}.{name}",
                                               {**kw, "parent": prefix}))

        def _mul(a, b):
            return None if (a is None or b is None) else a * b

        def _emit_element(e, e_lo, e_hi):
            """Emit the field for element `e` with EFFECTIVE (already
            multiplied) occurs bounds. Returns (count_sql, path) —
            count_sql evaluates to the element's occurrence count on
            the row (0/1 for scalars, array size for repeated)."""
            tgt, nm = e, e.get("name")
            if e.get("ref") is not None:
                if e.get("default") is not None \
                        or e.get("fixed") is not None:
                    _err(f"element reference "
                         f"{_localname(e.get('ref'))!r} cannot carry "
                         "a default/fixed value constraint")
                tgt = global_elements.get(e.get("ref"))
                if tgt is None:
                    raise _NotRecord
                nm = _localname(e.get("ref"))
            if nm in emitted:
                raise _NotRecord         # duplicate child name
            emitted.add(nm)
            path = nm if prefix is None else f"{prefix}.{nm}"
            repeated = e_hi is None or e_hi > 1
            if _element_is_simple(e, named, global_elements):
                t = tgt.get("type")
                if t is not None:
                    kw = dict(_resolve_type(t, named))
                else:
                    inl = [c for c in tgt
                           if _local(c.tag) == "simpleType"]
                    kw = _parse_simple_type(
                        inl[0], f"{path}__type",
                        named, anon) if inl else {}
                if repeated:
                    item = dict(kw)
                    kw = {"dtype": "array<string>",
                          "item": item or {"dtype": "string"}}
                    if e_lo > 0:
                        kw["min_length"] = e_lo
                    if e_hi is not None:
                        kw["max_length"] = e_hi
                    # a NULL array is 0 occurrences: minOccurs>0 makes
                    # the array itself required (guarded by parent
                    # presence for nested fields, ColumnSpec.parent)
                    _field(nm, kw, e_lo > 0)
                else:
                    if tgt.get("fixed") is not None:
                        kw["fixed"] = tgt.get("fixed")
                    if tgt.get("default") is not None:
                        kw["default"] = tgt.get("default")
                    _field(nm, kw, e_lo > 0)
            elif repeated:
                # repeated record child: a nested array<struct> —
                # validated by a further explode
                # (RecordArraySpec.nested / dotted names)
                if out_ras is None:
                    raise _NotRecord
                sub_ct = _record_ct(e)
                child = RecordArraySpec(name=path, min_occurs=e_lo,
                                        max_occurs=e_hi)
                try:
                    _record_columns(path, sub_ct, True,
                                    child.fields, child.asserts,
                                    visiting, child.nested,
                                    child.recursion_cuts)
                    out_ras.append(child)
                except _CutRecord:
                    # recursive re-entry beyond unroll_recursion: the
                    # array itself is the cut — required recursion
                    # admits no finite instance, fall back. Valid rows
                    # have NO content at the cut (the cut check rejects
                    # the rest), so enclosing choice/group counts see a
                    # literal 0 and never reference the absent path.
                    if e_lo > 0 or out_cuts is None:
                        raise _NotRecord
                    out_cuts.append(path)
                    return "0", path
            else:
                sub_ct = _record_ct(e)
                if e_lo > 0:
                    out_asserts.append(AssertSpec(
                        name=f"required_{path}",
                        expr=f"{pre}{path} IS NOT NULL",
                        columns=[path] + guard_cols))
                try:
                    _record_columns(path, sub_ct,
                                    optional or e_lo == 0,
                                    out_cols, out_asserts, visiting,
                                    out_ras, out_cuts)
                except _CutRecord:
                    if e_lo > 0 or out_cuts is None:
                        raise _NotRecord
                    out_cuts.append(path)
                    return "0", path
            cnt = (f"(CASE WHEN {path} IS NULL THEN 0 "
                   f"ELSE size({path}) END)" if repeated else
                   f"(CASE WHEN {path} IS NOT NULL THEN 1 ELSE 0 END)")
            return cnt, path

        def _aname(base):
            n = base
            i = 2
            while any(a.name == n for a in out_asserts):
                n = f"{base}_{i}"
                i += 1
            return n

        def _emit_choice(cnode, g_lo, g_hi):
            """xs:choice with effective occurs (g_lo, g_hi): every
            branch maps to a NULLABLE field; a selection-count assert
            enforces the choice occurs (ModelVisitor's choice
            matching, models.py:177-330, projected onto counts — the
            tabular row drops interleaving order, as documented for
            the flat mapping)."""
            branches = []            # (count_sql, lo, hi, path)
            has_wc = [False]         # a wildcard branch: an unknown
            # extra field can satisfy the choice, so selection-count
            # LOWER bounds over the known branches are dropped (upper
            # bounds stay sound — known selections undercount)

            def _branches(node, s_lo, s_hi):
                for b in node:
                    btag = _local(b.tag)
                    if btag == "annotation":
                        continue
                    lo = _mul(s_lo, _occ(b, "minOccurs", 1))
                    hi = _mul(s_hi, _occ(b, "maxOccurs", 1))
                    if btag == "element":
                        cnt, path = _emit_element(b, 0, _mul(g_hi, hi))
                        branches.append((cnt, lo, hi, path))
                    elif btag == "any":
                        # a choice branch is never individually
                        # required — the wildcard only ADMITS
                        attr_wildcards.append(
                            _any_wc(b, prefix if prefix is not None
                                    else ""))
                        has_wc[0] = True
                    elif (btag == "choice"
                          and _occ(b, "minOccurs", 1) == 1
                          and _occ(b, "maxOccurs", 1) == 1):
                        # single-occurrence nested choice: selecting it
                        # selects one of ITS branches — inline them as
                        # alternatives of the outer choice
                        _branches(b, s_lo, s_hi)
                    else:
                        raise _NotRecord
            _branches(cnode, 1, 1)
            if not branches:
                return
            total = " + ".join(c for c, *_ in branches)
            cols = sorted({p for *_, p in branches}) + guard_cols
            conds = []
            if all(lo == hi == 1 for _, lo, hi, _ in branches):
                # each selection contributes exactly one occurrence:
                # the summed count IS the selection count
                if g_lo > 0 and not has_wc[0]:
                    conds.append(f"({total}) >= {g_lo}")
                if g_hi is not None:
                    conds.append(f"({total}) <= {g_hi}")
            elif g_hi == 1:
                # single selection: branches are mutually exclusive,
                # the selected branch honors its own occurs
                sel = " + ".join(f"(CASE WHEN {c} > 0 THEN 1 ELSE 0 "
                                 "END)" for c, *_ in branches)
                conds.append(f"({sel}) <= 1")
                if g_lo > 0 and not has_wc[0]:
                    conds.append(f"({sel}) >= 1")
                for c, lo, hi, _p in branches:
                    if lo is not None and lo > 1:
                        conds.append(f"({c} = 0 OR {c} >= {lo})")
            else:
                # repeated choice with non-unit branch occurs: sound
                # count bounds (every selection contributes >=1 when
                # all branch minima are >=1; per-branch maxima are on
                # the array fields; total max = selections * widest)
                if g_lo > 0 and not has_wc[0] \
                        and all(lo and lo >= 1
                                for _, lo, _h, _p in branches):
                    conds.append(f"({total}) >= {g_lo}")
                his = [hi for _, _lo, hi, _p in branches]
                if g_hi is not None and all(h is not None for h in his):
                    conds.append(f"({total}) <= {g_hi * max(his)}")
            if conds:
                out_asserts.append(AssertSpec(
                    name=_aname(f"choice_{label}"),
                    expr=pre + "(" + " AND ".join(conds) + ")",
                    columns=cols))

        def _walk_group(gnode, m_lo, m_hi):
            """Walk a sequence/all group under accumulated occurrence
            multiplier (m_lo, m_hi); None = unbounded. Emits fields
            for element children; for a REPEATED group, a coupling
            assert ties together the counts of the children that occur
            exactly once per repetition (drivers) and bounds the rest
            by the repetition count (groups.py occurrence checks
            projected onto per-name counts).

            Same-named element SIBLINGS merge into one repeated field:
            the XSD Element Declarations Consistent constraint
            (reference: validators/groups.py EDC check) forces one
            type per name in a content model, and the reference's
            converters merge same-named siblings into a LIST — the
            tabular analog is a single array field whose occurs
            bounds are the SUMS of the siblings' bounds. Only direct
            siblings of this group merge (their counts provably add
            within one group instance); a name duplicated across
            nested particles or choice branches still falls back to
            the content-model path (the `emitted` check)."""
            entries = []             # (count_sql, lo, hi, path)
            sib: dict = {}
            for c in gnode:
                if _local(c.tag) != "element":
                    continue
                nm = c.get("name") or (_localname(c.get("ref"))
                                       if c.get("ref") else None)
                if nm is not None:
                    sib.setdefault(nm, []).append(c)
            merged: dict = {}
            for nm, parts in sib.items():
                if len(parts) < 2:
                    continue
                # one TYPE per name (EDC); inline types / identity
                # constraints on a duplicated sibling are not
                # comparable here -> fall back. fixed/default/nillable
                # join the comparability tuple (r8, ADVICE): EDC allows
                # same-typed siblings to differ in value constraints,
                # but the repeated-field emit path carries no
                # fixed/default support — merging would silently drop
                # the constraint, so such shapes keep the content-model
                # fallback. Any sibling carrying fixed/default falls
                # back outright (even when all siblings agree, the
                # merged repeated field could not enforce it).
                if len({(p.get("ref"), p.get("type"),
                         p.get("nillable"))
                        for p in parts}) > 1 \
                        or any(p.get("fixed") is not None
                               or p.get("default") is not None
                               for p in parts) \
                        or any(_local(x.tag) != "annotation"
                               for p in parts for x in p):
                    raise _NotRecord
                lo_sum = sum(_occ(p, "minOccurs", 1) for p in parts)
                his = [_occ(p, "maxOccurs", 1) for p in parts]
                merged[nm] = (lo_sum, None if None in his
                              else sum(his))
            merged_done: set = set()
            for c in gnode:
                ctag = _local(c.tag)
                if ctag == "annotation":
                    continue
                lo = _occ(c, "minOccurs", 1)
                hi = _occ(c, "maxOccurs", 1)
                if ctag == "element":
                    nm = c.get("name") or (_localname(c.get("ref"))
                                           if c.get("ref") else None)
                    if nm in merged:
                        if nm in merged_done:
                            continue     # later sibling: already merged
                        merged_done.add(nm)
                        lo, hi = merged[nm]
                    cnt, path = _emit_element(
                        c, m_lo * lo, _mul(m_hi, hi))
                    entries.append((cnt, lo, hi, path))
                elif ctag in ("sequence", "all"):
                    _walk_group(c, m_lo * lo, _mul(m_hi, hi))
                elif ctag == "choice":
                    _emit_choice(c, m_lo * lo, _mul(m_hi, hi))
                elif ctag == "any":
                    w = _any_wc(c, prefix if prefix is not None
                                else "")
                    if m_lo * lo > 0:
                        # REQUIRED wildcard: each instance of this
                        # scope must carry >= 1 admitted extra child
                        # (runner._required_wildcard_parts row check;
                        # the bound is 1 — a sound relaxation of
                        # minOccurs>1, see AttrWildcardSpec.min_occurs)
                        w.min_occurs = 1
                    attr_wildcards.append(w)
                else:
                    raise _NotRecord
            if (m_lo, m_hi) == (1, 1):
                return
            drivers = [ent for ent in entries if ent[1] == ent[2] == 1]
            if not drivers:
                return       # field-level occurs bounds already hold
            d0 = drivers[0][0]
            conds = [f"{c} = {d0}" for c, *_ in drivers[1:]]
            if m_lo > 0:
                conds.append(f"{d0} >= {m_lo}")
            if m_hi is not None:
                conds.append(f"{d0} <= {m_hi}")
            for c, lo, hi, _p in entries:
                if lo == hi == 1:
                    continue
                if lo > 0:
                    conds.append(f"{c} >= {lo} * {d0}")
                if hi is not None:
                    conds.append(f"{c} <= {hi} * {d0}")
            cols = sorted({p for *_, p in entries}) + guard_cols
            out_asserts.append(AssertSpec(
                name=_aname(f"group_occurs_{label}"),
                expr=pre + "(" + " AND ".join(conds) + ")",
                columns=cols))

        g_lo = _occ(rgroup, "minOccurs", 1)
        g_hi = _occ(rgroup, "maxOccurs", 1)
        if _local(rgroup.tag) == "choice":
            _emit_choice(rgroup, g_lo, g_hi)
        else:
            _walk_group(rgroup, g_lo, g_hi)

    # ---- flatten the row type (derivation chains, group /
    # attributeGroup refs) into effective attributes + content
    flat = _flatten_ct(ct, env)

    # ---- XSD 1.1 schema-level defaultAttributes (attributes.py
    # default_attributes parse; defaultAttributesApply='false' on the
    # complexType opts out) — applied to the flattened row type,
    # already-declared names win
    da = root.get("defaultAttributes")
    if da is not None and ct.get("defaultAttributesApply") != "false":
        ref = da
        if ref not in attr_groups:
            _err(f"defaultAttributes names unknown attributeGroup "
                 f"{ref!r}")
        for a in _attr_entries(attr_groups[ref], attr_groups,
                               global_attrs=global_attrs):
            nm = a.get("name")
            if nm not in flat["attrs"] and nm not in flat["prohibited"]:
                flat["attrs"][nm] = a

    # ---- attributes
    def _attr_colspec(name, a) -> ColumnSpec:
        t = a.get("type")
        if t is not None:
            kw = dict(_resolve_type(t, named))
        else:
            inline = [c for c in a if _local(c.tag) == "simpleType"]
            kw = _parse_simple_type(inline[0], f"{name}__type",
                                    named, anon) if inline else {}
        kw["nullable"] = a.get("use", "optional") != "required"
        if a.get("fixed") is not None:
            kw["fixed"] = a.get("fixed")
        if a.get("default") is not None:
            kw["default"] = a.get("default")
        return _kw_to_colspec(name, kw)

    for name, a in flat["attrs"].items():
        columns.append(_attr_colspec(name, a))
    if flat.get("attr_wc") is not None:
        # the ROW type's own xs:anyAttribute: extra TOP-LEVEL columns
        # are governed by the wildcard (path='') instead of the
        # blanket allow_extra_columns tolerance (wildcards.py:164+)
        attr_wildcards.append(_attr_wc_spec(flat["attr_wc"], ""))
    for name in sorted(flat["prohibited"]):
        # tabular analog of a prohibited attribute: if the column
        # exists it must be entirely absent (NULL)
        asserts.append(AssertSpec(
            name=f"prohibited_{name}",
            expr=f"`{name}` IS NULL", columns=[name]))

    # ---- simpleContent: the text content is the value column
    if flat["value_kw"] is not None:
        kw = dict(flat["value_kw"])
        kw.setdefault("nullable", True)
        columns.append(_kw_to_colspec(value_column, kw))

    # ---- content
    group = flat["content"]
    oc_nodes = flat["oc_nodes"]
    if group is not None and len(group) > 0:
        mapped_flat = False
        if tags_column is None:
            # flat row shape: the row type's particle tree walks into
            # plain columns (a ref takes its TYPE from the global
            # declaration, its occurs from the reference particle —
            # elements.py ref parse); a single-occurrence record-shaped
            # complex child becomes a STRUCT column with dotted
            # nested-field ColumnSpecs, repeated children become
            # array / array<struct> columns, choice and repeated
            # groups compile to occurrence-count asserts (see
            # _walk_content); xs:any / openContent wildcards become
            # element-kind AttrWildcardSpecs governing extra fields.
            # Any non-flattenable shape (recursion, names duplicated
            # across different particles) falls back to the
            # content-model path below (atomic: columns/asserts only
            # extend on full success); same-named direct siblings
            # merge into one repeated field (_walk_group).
            new_cols: list[ColumnSpec] = []
            new_asserts: list[AssertSpec] = []
            new_recarrs: list[RecordArraySpec] = []
            new_cuts: list[str] = []
            n_wc = len(attr_wildcards)
            try:
                _walk_content(None, group, False, new_cols,
                              new_asserts, new_recarrs, (),
                              {c.name for c in columns}, new_cuts)
                columns.extend(new_cols)
                asserts.extend(new_asserts)
                record_arrays.extend(new_recarrs)
                recursion_cuts.extend(new_cuts)
                mapped_flat = True
            except _NotRecord:
                del attr_wildcards[n_wc:]     # roll back record emits
                mapped_flat = False
            if mapped_flat:
                # row-level XSD 1.1 openContent (own or the schema's
                # defaultOpenContent): extra TOP-LEVEL columns are
                # governed by the wildcard (path='') instead of the
                # blanket allow_extra_columns tolerance
                if oc_nodes:
                    _oc_wc(oc_nodes, "")
                else:
                    d_oc = _default_oc(ct, flat)
                    if d_oc is not None:
                        _oc_wc([d_oc], "")
        if not mapped_flat:
            if tags_column is None:
                _err("the row element has structured content (complex "
                     "children, choice, or wildcards) — pass "
                     "tags_column= naming the column that holds the "
                     "row's child-tag sequence, and the particle tree "
                     "will compile to a ContentModelSpec")
            # own openContent wins (incl. mode='none', which the
            # evaluator treats as closed); else the document's
            # defaultOpenContent (never mode='none' by parse check)
            oc_src = oc_nodes[0] if oc_nodes else _default_oc(ct, flat)
            if oc_src is not None:
                wc = [c for c in oc_src if _local(c.tag) == "any"]
                open_content = OpenContentSpec(
                    mode=oc_src.get("mode", "interleave"),
                    wildcard=_parse_particle(wc[0], named, elems)
                    if wc else None)
            content_models.append(ContentModelSpec(
                name=table_name, column=tags_column,
                model=_parse_particle(group, named, elems),
                target_ns=target_ns, open_content=open_content,
                xsd11=xsd11))
    elif oc_nodes:
        # openContent on an EMPTY content model still admits extras
        # (the exporter emits this shape when every simple child
        # re-rendered as an attribute, leaving no sequence)
        _oc_wc(oc_nodes, "")
    else:
        d_oc = _default_oc(ct, flat)
        if d_oc is not None:     # mixed row type, or appliesToEmpty
            _oc_wc([d_oc], "")

    # ---- XSD 1.1 type alternatives on the row element -> conditional
    # type assignment (elements.py:654-657 + get_alternative_type at
    # elements.py:1340; features/elements/type_alternatives.xsd): the
    # FIRST alternative whose test holds selects the type, a final
    # test-less alternative is the default, the declared type's
    # columns stay unconditional
    from ..functions.xpath_assert import translate_xpath_assert
    conditionals: list[ConditionalSpec] = []
    prior_tests: list[str] = []
    for i, alt in enumerate(
            row_el.findall(f"{_N}alternative") if row_el is not None
            else []):
        t = alt.get("type")
        if t is None:
            _err("xs:alternative requires type= (inline alternative "
                 "types are not supported)")
        local_t = t
        if local_t not in complex_types:
            _err(f"xs:alternative type {t!r} is not a global "
                 "complexType of this document")
        alt_flat = _flatten_ct(complex_types[local_t], env,
                               stack=(local_t,))
        cols: list[ColumnSpec] = []
        if alt_flat["value_kw"] is not None:
            kw = dict(alt_flat["value_kw"])
            kw.setdefault("nullable", True)
            cols.append(_kw_to_colspec(value_column, kw))
        for nm2, a in alt_flat["attrs"].items():
            cols.append(_attr_colspec(nm2, a))
        test = alt.get("test")
        guards = [f"NOT ({p})" for p in prior_tests]
        if test is not None:
            when = translate_xpath_assert(test)
            when_full = (" AND ".join([f"({when})"] + guards)
                         if guards else when)
            prior_tests.append(when)
        else:
            # default alternative: applies when no earlier test held
            when_full = " AND ".join(guards) if guards else "true"
        conditionals.append(ConditionalSpec(
            name=alt.get("id") or f"alternative_{i}",
            when=when_full, columns=cols))

    # ---- XSD 1.1 asserts (own + inherited down the chain)
    for i, a in enumerate(flat["asserts"]):
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
    keyref_names: set = set()
    id_names: set = set()
    pending_keyrefs = []
    for holder in root.iter(f"{_N}element"):
        for ic in holder:
            kind = _local(ic.tag)
            if kind not in ("unique", "key", "keyref"):
                continue
            if ic.get("name") is None:
                # identities.py parse: name is required
                _err(f"xs:{kind}: missing required attribute 'name'")
            if ic.get("name") in id_names:
                # identity names share ONE symbol space per namespace
                # (names are namespace-mangled by the canonicalizer;
                # test_identities.py:37-53 'duplicated value')
                _err("duplicated identity constraint name "
                     f"{_localname(ic.get('name'))!r}")
            id_names.add(ic.get("name"))
            sel = ic.find(f"{_N}selector")
            fields = ic.findall(f"{_N}field")
            if sel is None or not fields:
                _err(f"xs:{kind} {ic.get('name')!r} needs selector + "
                     "field children")
            xp = sel.get("xpath", "")
            target = _selector_target(xp)
            on_row = (target == table_name
                      or (target == "." and holder is row_el))
            scope = None
            cols = [_field_column(f.get("xpath", "")) for f in fields]
            if not on_row:
                # selector addressing REPEATED content under the row
                # (FieldValueSelector inside repeated elements,
                # identities.py:461-544): the node set is a record
                # array's elements; fields address element values.
                # Struct (single-record) targets fold into multi-step
                # field selectors — no node-set expansion needed.
                steps = _scope_steps(xp)
                path = ".".join(steps) if steps else None
                ras_paths = {r.name for r in _walk_ras(record_arrays)}
                rec_prefixes = set()
                for nm_ in {c.name for c in columns} | ras_paths:
                    parts_ = nm_.split(".")
                    for i_ in range(1, len(parts_)):
                        rec_prefixes.add(".".join(parts_[:i_]))
                if path in ras_paths:
                    scope = path
                elif path is not None and path in rec_prefixes:
                    pass         # struct record: plain nested fields
                else:
                    _err(f"xs:{kind} {ic.get('name')!r} selector "
                         f"{xp!r} does not resolve to the row element "
                         f"{table_name!r}, a record child, or a "
                         "repeated record child (only those have a "
                         "tabular analog)")
                pre = "/".join(steps)
                cols = [f"{pre}/{c}" for c in cols]
                for c in cols:
                    fp = c.replace("/", ".").replace("@", "")
                    parts = fp.split(".")
                    for i in range(len(steps) + 1, len(parts)):
                        if ".".join(parts[:i]) in ras_paths:
                            _err(f"xs:{kind} {ic.get('name')!r} field "
                                 f"{c!r} crosses repeated content — "
                                 "scope the selector at the repeated "
                                 "element instead")
            name = ic.get("name")        # canonical (ns-mangled) key
            if kind in ("unique", "key"):
                u = UniqueSpec(name=_localname(name), columns=cols,
                               is_key=(kind == "key"), scope=scope)
                uniques.append(u)
                keys_by_name[name] = u
            else:
                if ic.get("refer") is None:
                    _err(f"xs:keyref {_localname(name)!r}: missing "
                         "required attribute 'refer'")
                keyref_names.add(name)
                pending_keyrefs.append((name, cols, ic.get("refer"),
                                        scope))
    for name, cols, refer, scope in pending_keyrefs:
        disp = _localname(name)
        if refer in keyref_names:
            # identities.py 'reference to a non key/unique identity
            # constraint' (test_identities.py:254-273)
            _err(f"xs:keyref {disp!r}: reference to a non key/unique "
                 f"identity constraint {_localname(refer)!r}")
        if refer not in keys_by_name:
            _err(f"xs:keyref {disp!r} refers to unknown key "
                 f"{_localname(refer)!r}")
        ref = keys_by_name[refer]
        if len(cols) != len(ref.columns):
            _err(f"xs:keyref {disp!r}: cardinality of the keyref "
                 "fields must be the same of the referred key "
                 "(identities.py keyref arity check)")
        keyrefs.append(KeyrefSpec(name=disp, columns=cols,
                                  ref_table=table_name,
                                  ref_columns=list(ref.columns),
                                  scope=scope, ref_scope=ref.scope))

    # ---- key column
    if key_column is None:
        # a multi-step (selector) key field cannot be the row-identity
        # column — violation attribution needs a plain column
        single = [u for u in uniques if u.is_key and len(u.columns) == 1
                  and "/" not in u.columns[0]]
        if len(single) == 1:
            key_column = single[0].columns[0]
        else:
            _err("pass key_column= (no single single-field xs:key to "
                 "infer it from)")

    # NOTATION enumeration values must name declared notations
    # (facets.py:652 wording); resolved against the main document's
    # root bindings like any QName value
    def _notation_enum_ok(dtype, enum):
        if dtype != "xsd:NOTATION" or not enum:
            return
        for v in enum:
            key = _canon(" ".join(str(v).split()), root_nsmap)
            if key not in notations:
                _err(f"value {v!r} must match a notation declaration")
    for kw in list(named.values()) + list(anon.values()):
        if isinstance(kw, dict):
            _notation_enum_ok(kw.get("dtype"), kw.get("enum"))
    for c in columns:
        _notation_enum_ok(c.dtype, c.enum)

    return TableSpec(
        name=table_name, key_column=key_column, columns=columns,
        simple_types={n: _kw_to_colspec(n, kw)
                      for n, kw in {**named, **anon}.items()},
        uniques=uniques, keyrefs=keyrefs, asserts=asserts,
        conditionals=conditionals, content_models=content_models,
        record_arrays=record_arrays, attr_wildcards=attr_wildcards,
        target_ns=target_ns, namespaces=dict(root_nsmap),
        recursion_cuts=recursion_cuts)
