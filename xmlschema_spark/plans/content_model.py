"""Content-model compilation: particle trees -> one Catalyst predicate.

The reference validates complex content by walking a ModelVisitor
automaton over the child elements (validators/models.py:177-330, built
from the XsdGroup particle tree parsed at groups.py:503-560). Content
models are regular languages over child names, so the tabular analog
compiles the particle tree to ONE anchored regular expression over the
row's tag sequence and evaluates it JVM-side inside the shuffle-free
row-check pass — no automaton state machine per row, no Python, and at
10^12 rows the model check costs the same codegen pass as any pattern
facet. 'all' groups (order-free) are not regular-expressible without a
factorial blowup, so they compile to per-tag counting conditions over
the same array (size(filter(...)) bounds), which is also one codegen
expression.

Tag-sequence encoding: each tag is emitted as `tag;` and the frames
concatenate, so the regex alphabet is unambiguous ([^;]+; per child);
tag names may not contain ';' (checked at compile). Namespaces: the
token before a tag's FIRST ':' is its namespace; a tag with no ':' has
none — the tabular analog of the reference's '{uri}local' extended
names (utils/qnames.py get_namespace).

Compile-time particle checks mirror the reference's parse errors
(particles.py:140-172, groups.py:521-535, wildcards.py:73-126
namespace-vocabulary errors, wildcards.py:869-886 openContent parse).

Spark-scale additions beyond the round-5 core:

- xs:any NAMESPACE CONSTRAINTS (wildcards.py:73-126 parse,
  164-185 matching): '##any', '##other', token lists with '##local' /
  '##targetNamespace', and XSD 1.1 notNamespace complements — each
  compiles to a plain regex over the tag token, so wildcard particles
  stay inside the same single model regex.
- SUBSTITUTION GROUPS inside particles (elements.py:609-623 dispatch,
  xsd_globals.py:566-570 maps): an element particle lists `substitutes`
  that may appear in place of the head; `abstract` heads admit only
  members. Compiles to a name alternation.
- XSD 1.1 openContent (wildcards.py:848-897, models.py:739-815
  visitors): mode='suffix' appends a wildcard-token star to the model
  regex; mode='interleave' splits the tag sequence by COUNT-BASED
  ATTRIBUTION — the first (total max occurs) occurrences of each
  declared name go to the model, everything else to the wildcard —
  the counting analog of InterleavedModelVisitor's rule that the
  wildcard may not consume a tag while a group element matching it is
  not over its occurs (models.py:757-773). Divergences (documented,
  compile-time rejected where ambiguous): interleave over a model
  containing inner 'any' particles is rejected (the reference gives
  the whole model — wildcards included — priority over open content,
  which count-based attribution cannot see); suffix over an 'all'
  group is rejected (order-free counting has no suffix position).
- XSD 1.1 'all' relaxations (ContentModelSpec.xsd11): wildcard
  members and member maxOccurs > 1; element-vs-wildcard UPA overlap
  inside 'all' is permitted (attribution resolves to the element,
  Xsd11AnyElement precedence), and the counting attribution implements
  exactly that: wildcard members count only non-declared tags.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..specs import ContentModelSpec, OpenContentSpec, ParticleSpec

_KINDS = ("element", "sequence", "choice", "all", "any")

# a Java regex that can never match (empty character class complement)
_NEVER = r"[^\s\S]"

# sentinel target_ns: run _wc_norm for vocabulary errors only
_VOCAB_ONLY = object()


def _err(msg: str) -> None:
    raise ValueError(f"content model particle: {msg}")


# ---------------------------------------------------------------------------
# wildcard namespace constraints (wildcards.py:73-126 parse, 164-185 match)

def _wc_norm(p: ParticleSpec, target_ns: Optional[str]):
    """Normalize an any-particle's constraint to ('any', None, nq) |
    ('other', tns, nq) | ('in', frozenset, nq) | ('not', frozenset,
    nq), where '' in a set means "no namespace" (##local) and `nq` is
    the frozenset of XSD 1.1 notQName-excluded tag names (expanded —
    never '##' tokens). Raises the reference's parse errors for bad
    vocabulary, incl. the notQName consistency rules
    (wildcards.py:146-155)."""
    tns = target_ns or ""
    nq = _wc_nq(p)
    if target_ns is _VOCAB_ONLY:
        # validate_particle pre-pass: vocabulary errors only — the
        # notQName-vs-namespace consistency rules depend on the real
        # target namespace and run at compile
        nq, tns = frozenset(), ""
    if p.not_namespace is not None:
        if p.namespace is not None:
            _err("'namespace' and 'notNamespace' attributes are "
                 "mutually exclusive")
        s = set()
        for ns in p.not_namespace:
            if ns == "##local":
                s.add("")
            elif ns == "##targetNamespace":
                s.add(tns)
            elif isinstance(ns, str) and ns.startswith("##"):
                _err(f"wrong value {ns!r} in 'notNamespace' attribute")
            else:
                s.add(ns)
        norm = ("not", frozenset(s), nq)
        return _wc_nq_consistent(norm)
    ns = p.namespace
    if ns is None or ns == "##any":
        return _wc_nq_consistent(("any", None, nq))
    if ns == "##other":
        return _wc_nq_consistent(("other", tns, nq))
    if isinstance(ns, str):
        items = ns.split()
    else:
        items = list(ns)
    s = set()
    for x in items:
        if x == "##local":
            s.add("")
        elif x == "##targetNamespace":
            s.add(tns)
        elif isinstance(x, str) and x.startswith("##"):
            # '##any'/'##other' are only valid as the WHOLE value
            # (wildcards.py:85-91)
            _err(f"wrong value {x!r} in 'namespace' attribute")
        else:
            s.add(x)
    # an empty value means no namespace allowed (wildcards.py:76-77)
    return _wc_nq_consistent(("in", frozenset(s), nq))


def _wc_nq(p: ParticleSpec) -> frozenset:
    """The particle's notQName exclusion set (XSD 1.1,
    wildcards.py:121-158). Spec-level entries are literal tag names —
    the importer has already expanded '##defined'/'##definedSibling';
    a leftover '##' token cannot be resolved without a schema registry
    and gets the reference's parse wording."""
    if not p.not_qname:
        return frozenset()
    for n in p.not_qname:
        if not isinstance(n, str) or not n:
            _err("wrong value for 'notQName' attribute")
        if n.startswith("##"):
            _err("wrong value for 'notQName' attribute "
                 f"(unexpanded token {n!r}: '##defined' / "
                 "'##definedSibling' resolve only through the XSD "
                 "importer's closed schema set)")
        if ";" in n:
            _err(f"notQName name {n!r} may not contain ';' "
                 "(tag-frame separator)")
    return frozenset(p.not_qname)


def _wc_nq_consistent(norm):
    """The reference's notQName-vs-namespace consistency parse errors
    (wildcards.py:146-155): each excluded QName must live in a
    namespace the wildcard otherwise allows — an exclusion outside the
    admitted space is vacuous and flagged."""
    kind, arg, nq = norm
    if nq:
        if kind == "not":
            if all(_tag_ns_vs(n, arg) in arg for n in nq):
                _err("the namespace of each QName in notQName is "
                     "allowed by notNamespace")
        elif any(not _wc_admits_name((kind, arg, frozenset()), n)
                 for n in nq):
            _err("names in notQName must be in namespaces that are "
                 "allowed")
    return norm


def _tag_ns(name: str) -> str:
    return name.split(":", 1)[0] if ":" in name else ""


def _tag_ns_vs(name: str, known) -> str:
    """The tag's namespace token, preferring a longest-match against
    the constraint's own tokens — namespace URIs may themselves
    contain ':' (the runtime regexes match full literal tokens, so
    compile-time checks must too); the plain first-':' split is only
    the fallback for tags in namespaces the constraint doesn't name."""
    for t in sorted((k for k in known if k), key=len, reverse=True):
        if name.startswith(t + ":"):
            return t
    return _tag_ns(name)


def _wc_admits_name(norm, name: str) -> bool:
    """Compile-time: does this wildcard admit a literal tag?
    (wildcards.py:177-185 is_namespace_allowed; notQName exclusion
    wildcards.py:784-791 — an excluded name never matches, which is
    what makes <element name='a'/><any notQName='a'/> UPA-valid)."""
    kind, arg, nq = norm
    if name in nq:
        return False
    if kind == "any":
        return True
    if kind == "other":
        ns = _tag_ns_vs(name, (arg,) if arg else ())
        return ns != "" and ns != arg
    ns = _tag_ns_vs(name, arg)
    if kind == "in":
        return ns in arg
    return ns not in arg           # 'not'


def _wc_intersects(a, b) -> bool:
    """Conservative compile-time overlap of two wildcard constraints
    over the (infinite) namespace universe — for UPA. notQName
    exclusions are finite, so they can never make two namespace
    constraints with infinite overlap disjoint; ignoring them here
    only ever over-reports (the safe direction for UPA)."""
    for x, y in ((a, b), (b, a)):
        if x[0] == "in" and not x[1]:
            return False           # empty value space intersects nothing
    ka, kb = a[0], b[0]
    if ka == "in" and kb == "in":
        return bool(a[1] & b[1])
    if ka == "in" or kb == "in":
        s = a[1] if ka == "in" else b[1]
        o = b if ka == "in" else a
        if o[0] == "any":
            return True
        if o[0] == "other":
            return any(ns not in ("", o[1]) for ns in s)
        return any(ns not in o[1] for ns in s)   # 'not'
    # any/other/not against any/other/not: the universe of namespaces
    # is unbounded, so two co-finite (or universal) sets always meet
    return True


def _wc_tag_regex(norm) -> str:
    """Anchor-free regex matching ONE tag (no trailing ';') admitted by
    the wildcard. Namespace = the token before the first ':'. notQName
    exclusions compile to a negative lookahead against the whole
    ';'-terminated tag (exact-name exclusion, not a prefix test) —
    matchers that test a LONE tag anchor with '$', which the
    alternation also accepts."""
    kind, arg, nq = norm
    body = _wc_ns_regex(kind, arg)
    if not nq:
        return body
    alt = "|".join(re.escape(n) for n in sorted(nq))
    return rf"(?!(?:{alt})(?:;|$))(?:{body})"


def _wc_ns_regex(kind, arg) -> str:
    if kind == "any":
        return r"[^;]+"
    if kind == "other":
        if arg:
            return rf"(?!{re.escape(arg)}:)[^:;]+:[^;]+"
        return r"[^:;]+:[^;]+"     # any qualified tag
    if kind == "in":
        branches = []
        if "" in arg:
            branches.append(r"[^:;]+")
        toks = sorted(t for t in arg if t)
        if toks:
            alt = "|".join(re.escape(t) for t in toks)
            branches.append(rf"(?:{alt}):[^;]+")
        return "|".join(branches) if branches else _NEVER
    # 'not'
    toks = sorted(t for t in arg if t)
    guard = rf"(?!(?:{'|'.join(re.escape(t) for t in toks)}):)" \
        if toks else ""
    if "" in arg:                  # unqualified disallowed
        return rf"{guard}[^:;]+:[^;]+"
    return rf"{guard}[^;]+"


# ---------------------------------------------------------------------------
# compile-time particle validity

def validate_particle(p: ParticleSpec, top: bool = True,
                      in_all: bool = False, xsd11: bool = False) -> None:
    """Compile-time model checks with the reference's error wording
    (particles.py:148-172, groups.py:527-533, wildcards.py:73-126)."""
    if p.kind not in _KINDS:
        _err(f"unknown particle kind {p.kind!r}")
    if not isinstance(p.min_occurs, int) or p.min_occurs < 0:
        _err("minOccurs value must be a non negative integer")
    if p.max_occurs is not None:
        if not isinstance(p.max_occurs, int) or p.max_occurs < 0:
            _err("maxOccurs value must be a non negative integer or "
                 "'unbounded'")
        if p.min_occurs > p.max_occurs:
            _err("minOccurs must be lesser or equal than maxOccurs")
    if p.kind != "any" and (p.namespace is not None or
                            p.not_namespace is not None or
                            p.not_qname is not None):
        _err("namespace constraints apply only to 'any' particles")
    if p.kind != "element" and (p.substitutes or p.abstract):
        _err("substitution groups apply only to 'element' particles")
    if p.kind == "element":
        if not p.name:
            _err("element particle requires a name")
        for n in [p.name] + list(p.substitutes):
            if ";" in n:
                _err(f"element name {n!r} may not contain ';' "
                     "(tag-frame separator)")
        if p.abstract and not p.substitutes:
            # an abstract head with no members can never match
            # (elements.py:707-710 "use of an abstract element" error)
            _err(f"abstract element {p.name!r} has no substitution "
                 "members and can never match")
        if p.children:
            _err("element particle takes no children")
    elif p.kind == "any":
        if p.children:
            _err("'any' particle takes no children")
        if p.process_contents not in ("strict", "lax", "skip"):
            _err(f"wrong value {p.process_contents!r} for "
                 "'processContents' attribute")
        _wc_norm(p, _VOCAB_ONLY)   # vocabulary errors only
    else:
        # empty model groups are ACCEPTED like the reference (W3C test
        # group complex022; test_models.py test_empty_choice_groups):
        # an empty sequence/all — or an empty choice with minOccurs=0 —
        # is epsilon; an empty choice with minOccurs > 0 can never
        # validate any content (a validation-time error, not parse-time)
        if p.kind == "all":
            if not top:
                _err("in XSD 1.0 an 'all' model group cannot be nested")
            if p.max_occurs is None or p.max_occurs != 1:
                _err("maxOccurs must be 1 for 'all' model groups")
            if p.min_occurs not in (0, 1):
                _err("minOccurs must be (0 | 1) for 'all' model groups")
            for c in p.children:
                if c.kind not in (("element", "any") if xsd11
                                  else ("element",)):
                    _err("in XSD 1.0 an 'all' model group can contain "
                         "only elements")
                if not xsd11 and c.max_occurs not in (0, 1):
                    # groups.py:527-533 Xsd10 'all' restrictions
                    _err("maxOccurs must be (0 | 1) for the elements "
                         "of an XSD 1.0 'all' model group")
        for c in p.children:
            validate_particle(c, top=False, in_all=p.kind == "all",
                              xsd11=xsd11)


# ---------------------------------------------------------------------------
# Unique Particle Attribution (models.py:104-171 distinguishable_paths)

class _Pos:
    """One Glushkov position: a leaf particle instance."""

    __slots__ = ("names", "wc", "label")

    def __init__(self, names, wc, label):
        self.names = names      # frozenset of admissible element names
        self.wc = wc            # wildcard norm, or None for elements
        self.label = label      # human-readable path for errors


def _overlap(a: _Pos, b: _Pos) -> bool:
    if a.wc is None and b.wc is None:
        return bool(a.names & b.names)
    if a.wc is not None and b.wc is not None:
        return _wc_intersects(a.wc, b.wc)
    wc, el = (a, b) if a.wc is not None else (b, a)
    return any(_wc_admits_name(wc.wc, n) for n in el.names)


def check_upa(model: ParticleSpec, target_ns: Optional[str] = None,
              allow_element_wildcard: bool = False) -> None:
    """Unique Particle Attribution — the reference rejects content
    models where a child element could be attributed to more than one
    particle (models.py:104-171 `distinguishable_paths`:
    'Unique Particle Attribution violation between {0!r} and {1!r}').

    Classic Glushkov-determinism check: compute nullable/FIRST/LAST/
    FOLLOW over leaf positions; the model is deterministic iff no
    decision set (FIRST of the model, FOLLOW of any position) holds two
    distinct positions with overlapping symbols. Symbols are NAME SETS
    (substitution heads admit head+members) or wildcard namespace
    constraints; overlap is set intersection / wildcard admission /
    constraint intersection. Group occurrences with max > 1 loop
    LAST->FIRST (numeric maxima are treated as unbounded for the
    overlap test — conservative, like the spec's own treatment of
    repeated groups). With `allow_element_wildcard` (XSD 1.1 'all'
    groups) element-vs-wildcard overlaps are tolerated: attribution
    resolves to the element (Xsd11AnyElement precedence)."""
    follow: dict[int, set] = {}
    positions: list[_Pos] = []

    def add_follow(srcs, dsts) -> None:
        for s in srcs:
            follow.setdefault(id(s), set()).update(dsts)

    def walk(p: ParticleSpec, path: str):
        # returns (nullable, first, last) with follow edges emitted
        if p.kind in ("element", "any"):
            if p.kind == "element":
                names = frozenset(
                    ([] if p.abstract else [p.name]) + list(p.substitutes))
                pos = _Pos(names, None, f"{path}{p.name}")
            else:
                pos = _Pos(frozenset(), _wc_norm(p, target_ns),
                           f"{path}xs:any")
            positions.append(pos)
            first, last = {pos}, {pos}
            if p.max_occurs is None or p.max_occurs > 1:
                add_follow(last, first)
            return p.min_occurs == 0, first, last
        subs = [walk(c, f"{path}{p.kind}/") for c in p.children]
        if p.kind in ("choice", "all"):
            # 'all' shares choice's decision structure for the overlap
            # test: any member may come next at every step
            nullable = any(n for n, _, _ in subs)
            first = set().union(*(f for _, f, _ in subs))
            last = set().union(*(l for _, _, l in subs))
            if p.kind == "all" and len(subs) > 1:
                # order-free: after any member, any other may start
                for i, (_, _, li) in enumerate(subs):
                    for j, (_, fj, _) in enumerate(subs):
                        if i != j:
                            add_follow(li, fj)
        else:                    # sequence
            nullable = all(n for n, _, _ in subs)
            first, last = set(), set()
            for n, f, _ in subs:
                first |= f
                if not n:
                    break
            for n, _, l in reversed(subs):
                last |= l
                if not n:
                    break
            for i in range(len(subs)):
                _, _, li = subs[i]
                for j in range(i + 1, len(subs)):
                    nj, fj, _ = subs[j]
                    add_follow(li, fj)
                    if not nj:
                        break
        if p.max_occurs is None or p.max_occurs > 1:
            add_follow(last, first)
        if p.min_occurs == 0:
            nullable = True
        return nullable, first, last

    _, first, _ = walk(model, "")

    def check_set(s) -> None:
        items = list(s)
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                a, b = items[i], items[j]
                if a is b or not _overlap(a, b):
                    continue
                if allow_element_wildcard and \
                        (a.wc is None) != (b.wc is None):
                    continue
                raise ValueError(
                    f"content model particle: Unique Particle "
                    f"Attribution violation between {a.label!r} "
                    f"and {b.label!r}")

    check_set(first)
    for pos in positions:
        check_set(follow.get(id(pos), ()))


# ---------------------------------------------------------------------------
# regex compilation

def _quant(p: ParticleSpec) -> str:
    lo, hi = p.min_occurs, p.max_occurs
    if (lo, hi) == (1, 1):
        return ""
    if (lo, hi) == (0, 1):
        return "?"
    if hi is None:
        return "*" if lo == 0 else "+" if lo == 1 else f"{{{lo},}}"
    return f"{{{lo},{hi}}}"


def particle_regex(p: ParticleSpec,
                   target_ns: Optional[str] = None) -> str:
    """Anchor-free regex over the `tag;`-framed sequence."""
    if p.kind == "element":
        names = ([] if p.abstract else [p.name]) + list(p.substitutes)
        if len(names) == 1:
            return f"(?:{re.escape(names[0])};){_quant(p)}"
        alt = "|".join(re.escape(n) for n in names)
        return f"(?:(?:{alt});){_quant(p)}"
    if p.kind == "any":
        return f"(?:(?:{_wc_tag_regex(_wc_norm(p, target_ns))});)" \
               f"{_quant(p)}"
    if p.kind == "sequence":
        body = "".join(particle_regex(c, target_ns) for c in p.children)
        return f"(?:{body}){_quant(p)}"
    if p.kind == "choice":
        if not p.children and p.min_occurs > 0:
            # the reference rejects ANY content — empty included —
            # against an empty choice with minOccurs > 0
            # (groups.py:967-970, W3C group complex022): the empty
            # language, not epsilon. [^\s\S] can match no character
            # (never-match without lookahead, RE2-safe).
            return f"(?:[^\\s\\S]){_quant(p)}"
        body = "|".join(particle_regex(c, target_ns) for c in p.children)
        return f"(?:{body}){_quant(p)}"
    raise ValueError(f"particle kind {p.kind!r} has no regex form "
                     "('all' compiles to counting conditions)")


def model_regex(p: ParticleSpec, target_ns: Optional[str] = None,
                suffix_wildcard=None) -> str:
    """The full anchored regex for a non-'all' model; `suffix_wildcard`
    (a normalized constraint) appends the openContent mode='suffix'
    star (SuffixedModelVisitor, models.py:790-815)."""
    body = particle_regex(p, target_ns)
    if suffix_wildcard is not None:
        body += f"(?:(?:{_wc_tag_regex(suffix_wildcard)});)*"
    return f"^(?:{body})$"


def tags_column(cm: ContentModelSpec) -> Column:
    """The row's ordered tag array."""
    col = F.col(cm.column)
    if cm.lexical:
        collapsed = F.trim(F.regexp_replace(col, r"\s+", " "))
        return F.when(collapsed == "", F.array().cast("array<string>")) \
                .otherwise(F.split(collapsed, " "))
    if cm.tag_field is not None:
        return F.transform(col, lambda x: x[cm.tag_field].cast("string"))
    return col.cast("array<string>")


def _frame(tags: Column) -> Column:
    # "a;b;c;" framing: unambiguous token alphabet for the model regex
    return F.concat_ws("", F.transform(tags,
                                       lambda x: F.concat(x, F.lit(";"))))


def _frame_lexical(cm: ContentModelSpec) -> Column:
    """Framed string for a LEXICAL model straight from the text column,
    skipping the split -> transform -> concat_ws array round-trip of
    _frame(tags_column(cm)): the collapsed text's separators are single
    spaces and tags cannot contain ' ' or ';', so replacing each space
    with ';' and appending one trailing ';' produces the identical
    framed string (empty/whitespace-only text frames to '', exactly as
    the empty-array branch of tags_column does). One string pass per
    row instead of an array materialization — the framed value is both
    the regex subject and the violation value column, so the saving is
    paid on every row."""
    collapsed = F.trim(F.regexp_replace(F.col(cm.column), r"\s+", " "))
    return F.when(collapsed == "", F.lit("")) \
        .otherwise(F.concat(F.regexp_replace(collapsed, " ", ";"),
                            F.lit(";")))


def _has_any(p: ParticleSpec) -> bool:
    return p.kind == "any" or any(_has_any(c) for c in p.children)


def _name_groups(model: ParticleSpec) -> list[tuple[frozenset,
                                                    Optional[int]]]:
    """[(name-set, total admissible occurrences)] across the model
    (None = unbounded): the count-based analog of the visitor's
    per-particle 'is over' state. A substitution head and its members
    SHARE one occurs budget (one leaf position), so counting is over
    the position's whole name-set; positions whose name-sets overlap
    are merged (a name can only be attributed to one budget).
    Multiplicities compound down the tree."""
    leaves: list[tuple[set, Optional[int]]] = []

    def walk(p: ParticleSpec, mult: Optional[int]) -> None:
        m = None if (mult is None or p.max_occurs is None) \
            else mult * p.max_occurs
        if p.kind == "element":
            names = set(([] if p.abstract else [p.name])
                        + list(p.substitutes))
            leaves.append((names, m))
            return
        for c in p.children:
            walk(c, m)

    walk(model, 1)
    # merge overlapping name-sets, summing caps (None-propagating)
    groups: list[tuple[set, Optional[int]]] = []
    for names, cap in leaves:
        merged_names, merged_cap = set(names), cap
        keep = []
        for gn, gc in groups:
            if gn & merged_names:
                merged_names |= gn
                merged_cap = None if (merged_cap is None or gc is None) \
                    else merged_cap + gc
            else:
                keep.append((gn, gc))
        keep.append((merged_names, merged_cap))
        groups = keep
    return [(frozenset(n), c) for n, c in groups]


def _norm_open_content(cm: ContentModelSpec) -> Optional[OpenContentSpec]:
    """Parse-time openContent checks (wildcards.py:869-886)."""
    oc = cm.open_content
    if oc is None:
        return None
    if oc.mode not in ("none", "interleave", "suffix"):
        _err(f"wrong value {oc.mode!r} for 'mode' attribute")
    if oc.mode == "none":
        if oc.wildcard is not None:
            _err("an openContent with mode='none' cannot have an "
                 "<xs:any> child declaration")
        return None
    if oc.wildcard is None:
        _err("an <xs:any> child declaration is required")
    if oc.wildcard.kind != "any":
        _err("the openContent child declaration must be an 'any' "
             "particle")
    if (oc.wildcard.min_occurs, oc.wildcard.max_occurs) != (1, 1):
        # the reference rejects explicit occurs on the openContent
        # wildcard (tests/validators/test_wildcards.py:505-538) —
        # open content is implicitly repeatable
        _err("the openContent wildcard takes no minOccurs/maxOccurs")
    validate_particle(oc.wildcard, top=False, xsd11=cm.xsd11)
    return oc


def content_model_checks(cm: ContentModelSpec):
    """Compile one ContentModelSpec to RowChecks (consumed by
    compile_plan; same shuffle-free pass as facets)."""
    from .compiler import RowCheck
    validate_particle(cm.model, xsd11=cm.xsd11)
    oc = _norm_open_content(cm)
    if cm.check_upa:
        check_upa(cm.model, target_ns=cm.target_ns,
                  allow_element_wildcard=(
                      cm.xsd11 and cm.model.kind == "all"))
    tags = tags_column(cm)
    present = F.col(cm.column).isNotNull()
    # lexical models frame via one string pass (see _frame_lexical);
    # NULL text frames to NULL instead of '' there, which is invisible:
    # every consumer of `framed` is guarded by `present` (valid is
    # ~present | ok, and the value column is only materialized for
    # violating — hence present — rows)
    framed = _frame_lexical(cm) if cm.lexical else _frame(tags)
    checks = []
    oc_norm = _wc_norm(oc.wildcard, cm.target_ns) if oc else None
    oc_tag_re = f"^(?:{_wc_tag_regex(oc_norm)})$" if oc else None
    if cm.model.kind == "all":
        if oc and oc.mode == "suffix":
            _err("suffix openContent over an 'all' group is not "
                 "supported (order-free counting has no suffix "
                 "position); use mode='interleave'")
        conds = []
        member_cnts: list[Column] = []
        el_members = [c for c in cm.model.children if c.kind == "element"]
        wc_members = [c for c in cm.model.children if c.kind == "any"]
        all_names: list[str] = []
        for c in el_members:
            all_names.extend(
                ([] if c.abstract else [c.name]) + list(c.substitutes))

        def _in_names(names):
            if len(names) == 1:
                n = names[0]
                return lambda x: x == n
            return lambda x: x.isin(*names)

        for c in el_members:
            names = ([] if c.abstract else [c.name]) + list(c.substitutes)
            cnt = F.size(F.filter(tags, _in_names(names)))
            member_cnts.append(cnt)
            conds.append(cnt >= c.min_occurs)
            if c.max_occurs is not None:
                # openContent interleave absorbs occurrences beyond the
                # cap IF the wildcard admits every name of the member
                # (the not-over rule's counting analog); otherwise the
                # bound stands
                absorbed = oc is not None and all(
                    _wc_admits_name(oc_norm, n) for n in names)
                if not absorbed:
                    conds.append(cnt <= c.max_occurs)
        wc_norms = [_wc_norm(c, cm.target_ns) for c in wc_members]
        for c, nrm in zip(wc_members, wc_norms):
            rx = f"^(?:{_wc_tag_regex(nrm)})$"
            cnt_w = F.size(F.filter(
                tags,
                (lambda rx_: lambda x: x.rlike(rx_))(rx)
                if not all_names else
                (lambda rx_, ns_: lambda x:
                 ~x.isin(*ns_) & x.rlike(rx_))(rx, all_names)))
            member_cnts.append(cnt_w)
            conds.append(cnt_w >= c.min_occurs)
            if c.max_occurs is not None and oc is None:
                conds.append(cnt_w <= c.max_occurs)
        # leftover tags: declared, or admitted by a wildcard member,
        # or by the openContent wildcard — else closed-content error
        def _leftover(x):
            bad = ~x.isin(*all_names) if all_names else F.lit(True)
            for nrm in wc_norms:
                bad = bad & ~x.rlike(f"^(?:{_wc_tag_regex(nrm)})$")
            if oc is not None:
                bad = bad & ~x.rlike(oc_tag_re)
            return bad
        no_leftover = F.size(F.filter(tags, _leftover)) == 0
        ok = F.lit(True)
        for c in conds:
            ok = ok & c
        if cm.model.min_occurs == 0 and member_cnts:
            # emptiable 'all' is EMPTY-OR-COMPLETE (models.py:415-459:
            # zero_missing errors fire only `if occurs[group]`, and the
            # group occurs as soon as ANY member does) — it does NOT
            # make every member optional. Absent = no tag attributed
            # to any element or wildcard member.
            absent = member_cnts[0] == 0
            for cnt in member_cnts[1:]:
                absent = absent & (cnt == 0)
            ok = absent | ok
        ok = ok & no_leftover
        reason = (f"content does not satisfy the 'all' group "
                  f"{sorted(set(all_names))}")
    elif oc is not None and oc.mode == "interleave":
        if _has_any(cm.model):
            _err("openContent interleave over a model containing "
                 "'any' particles is not supported (the model's own "
                 "wildcards take priority over open content, which "
                 "count-based attribution cannot express); use "
                 "mode='suffix' or restructure the model")
        groups = _name_groups(cm.model)

        # per-group attribution evaluated inside the HOF lambda: a tag
        # goes to the MODEL while its position group's occurs budget is
        # not exhausted by earlier same-group tags (the counting analog
        # of is_over); unbounded budgets always attribute to the model
        def _to_model(x, i):
            prefix = F.slice(tags, F.lit(1), i + F.lit(1))
            ok = None
            for names, cap in groups:
                ns = sorted(names)
                member = x.isin(*ns)
                if cap is None:
                    g_ok = member
                else:
                    occ = F.size(F.filter(
                        prefix,
                        (lambda ns_: lambda e: e.isin(*ns_))(ns)))
                    g_ok = member & (occ <= F.lit(cap))
                ok = g_ok if ok is None else ok | g_ok
            return ok if ok is not None else F.lit(False)

        model_seq = F.filter(tags, _to_model)
        open_seq = F.filter(
            tags, lambda x, i: ~_to_model(x, i))
        rx = model_regex(cm.model, cm.target_ns)
        ok = _frame(model_seq).rlike(rx) & \
            F.forall(open_seq,
                     (lambda rx_: lambda t: t.rlike(rx_))(oc_tag_re))
        reason = ("child sequence does not match the content model "
                  "with interleaved open content")
    else:
        sfx = oc_norm if (oc is not None and oc.mode == "suffix") else None
        ok = framed.rlike(model_regex(cm.model, cm.target_ns,
                                      suffix_wildcard=sfx))
        reason = ("child sequence does not match the content model"
                  + (" with suffixed open content" if sfx is not None
                     else ""))
    checks.append(RowCheck(
        constraint=f"content:{cm.name}:{cm.column}",
        reason=reason,
        valid=~present | ok,
        value_col=framed,
    ))
    return checks
