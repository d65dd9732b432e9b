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
tag names may not contain ';' (checked at compile).

Compile-time particle checks mirror the reference's parse errors
(particles.py:140-172, groups.py:521-535): negative/ inverted occurs,
'all' nesting and occurs restrictions, empty groups, unknown kinds.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..specs import ContentModelSpec, ParticleSpec

_KINDS = ("element", "sequence", "choice", "all", "any")


def validate_particle(p: ParticleSpec, top: bool = True,
                      in_all: bool = False) -> None:
    """Compile-time model checks with the reference's error wording
    (particles.py:148-172, groups.py:527-533)."""
    def err(msg: str) -> None:
        raise ValueError(f"content model particle: {msg}")

    if p.kind not in _KINDS:
        err(f"unknown particle kind {p.kind!r}")
    if not isinstance(p.min_occurs, int) or p.min_occurs < 0:
        err("minOccurs value must be a non negative integer")
    if p.max_occurs is not None:
        if not isinstance(p.max_occurs, int) or p.max_occurs < 0:
            err("maxOccurs value must be a non negative integer or "
                "'unbounded'")
        if p.min_occurs > p.max_occurs:
            err("minOccurs must be lesser or equal than maxOccurs")
    if p.kind == "element":
        if not p.name:
            err("element particle requires a name")
        if ";" in p.name:
            err(f"element name {p.name!r} may not contain ';' "
                "(tag-frame separator)")
        if p.children:
            err("element particle takes no children")
    elif p.kind == "any":
        if p.children:
            err("'any' particle takes no children")
    else:
        if not p.children:
            err(f"empty '{p.kind}' model group")
        if p.kind == "all":
            if not top:
                err("in XSD 1.0 an 'all' model group cannot be nested")
            if p.max_occurs is None or p.max_occurs != 1:
                err("maxOccurs must be 1 for 'all' model groups")
            if p.min_occurs not in (0, 1):
                err("minOccurs must be (0 | 1) for 'all' model groups")
            for c in p.children:
                if c.kind != "element":
                    err("in XSD 1.0 an 'all' model group can contain "
                        "only elements")
        for c in p.children:
            validate_particle(c, top=False, in_all=p.kind == "all")


class _Pos:
    """One Glushkov position: a leaf particle instance."""

    __slots__ = ("sym", "label")

    def __init__(self, sym, label):
        self.sym = sym          # element name, or None for 'any'
        self.label = label      # human-readable path for errors


def _overlap(a: _Pos, b: _Pos) -> bool:
    # wildcard overlaps everything (reference ParticleMixin.is_overlap
    # semantics: an xs:any competes with any element name)
    return a.sym is None or b.sym is None or a.sym == b.sym


def check_upa(model: ParticleSpec) -> None:
    """Unique Particle Attribution — the reference rejects content
    models where a child element could be attributed to more than one
    particle (models.py:104-171 `distinguishable_paths`:
    'Unique Particle Attribution violation between {0!r} and {1!r}').

    Classic Glushkov-determinism check: compute nullable/FIRST/LAST/
    FOLLOW over leaf positions; the model is deterministic iff no
    decision set (FIRST of the model, FOLLOW of any position) holds two
    distinct positions with overlapping symbols (same element name, or
    either being a wildcard). Group occurrences with max > 1 loop
    LAST->FIRST (numeric maxima are treated as unbounded for the
    overlap test — conservative, like the spec's own treatment of
    repeated groups)."""
    follow: dict[int, set] = {}
    positions: list[_Pos] = []

    def add_follow(srcs, dsts) -> None:
        for s in srcs:
            follow.setdefault(id(s), set()).update(dsts)

    def walk(p: ParticleSpec, path: str):
        # returns (nullable, first, last) with follow edges emitted
        if p.kind in ("element", "any"):
            pos = _Pos(p.name if p.kind == "element" else None,
                       f"{path}{p.name or 'xs:any'}")
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
                if a is not b and _overlap(a, b):
                    raise ValueError(
                        f"content model particle: Unique Particle "
                        f"Attribution violation between {a.label!r} "
                        f"and {b.label!r}")

    check_set(first)
    for pos in positions:
        check_set(follow.get(id(pos), ()))


def _quant(p: ParticleSpec) -> str:
    lo, hi = p.min_occurs, p.max_occurs
    if (lo, hi) == (1, 1):
        return ""
    if (lo, hi) == (0, 1):
        return "?"
    if hi is None:
        return "*" if lo == 0 else "+" if lo == 1 else f"{{{lo},}}"
    return f"{{{lo},{hi}}}"


def particle_regex(p: ParticleSpec) -> str:
    """Anchor-free regex over the `tag;`-framed sequence."""
    if p.kind == "element":
        return f"(?:{re.escape(p.name)};){_quant(p)}"
    if p.kind == "any":
        return f"(?:[^;]+;){_quant(p)}"
    if p.kind == "sequence":
        body = "".join(particle_regex(c) for c in p.children)
        return f"(?:{body}){_quant(p)}"
    if p.kind == "choice":
        body = "|".join(particle_regex(c) for c in p.children)
        return f"(?:{body}){_quant(p)}"
    raise ValueError(f"particle kind {p.kind!r} has no regex form "
                     "('all' compiles to counting conditions)")


def model_regex(p: ParticleSpec) -> str:
    """The full anchored regex for a non-'all' model."""
    return f"^(?:{particle_regex(p)})$"


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


def content_model_checks(cm: ContentModelSpec):
    """Compile one ContentModelSpec to RowChecks (consumed by
    compile_plan; same shuffle-free pass as facets)."""
    from .compiler import RowCheck
    validate_particle(cm.model)
    if cm.check_upa:
        check_upa(cm.model)
    tags = tags_column(cm)
    present = F.col(cm.column).isNotNull()
    framed = _frame(tags)
    checks = []
    if cm.model.kind == "all":
        conds = []
        names = []

        def _eq(n):
            # closure factory, NOT a default-arg lambda: pyspark counts
            # lambda params to pick the (x) vs (x, i) HOF form, so a
            # defaulted second arg silently becomes the element INDEX
            return lambda x: x == n

        for c in cm.model.children:
            names.append(c.name)
            cnt = F.size(F.filter(tags, _eq(c.name)))
            lo = c.min_occurs if cm.model.min_occurs == 1 else 0
            conds.append(cnt >= lo)
            if c.max_occurs is not None:
                conds.append(cnt <= c.max_occurs)
        # closed content: every tag must be one of the declared names
        conds.append(F.size(F.filter(
            tags, lambda x: ~x.isin(*names))) == 0)
        ok = conds[0]
        for c in conds[1:]:
            ok = ok & c
        reason = (f"content does not satisfy the 'all' group "
                  f"{sorted(names)}")
    else:
        ok = framed.rlike(model_regex(cm.model))
        reason = "child sequence does not match the content model"
    checks.append(RowCheck(
        constraint=f"content:{cm.name}:{cm.column}",
        reason=reason,
        valid=~present | ok,
        value_col=framed,
    ))
    return checks
