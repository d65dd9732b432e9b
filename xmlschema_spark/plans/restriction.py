"""Restriction derivation chains — named simple types + `ColumnSpec.base`.

The reference models every simple type as a derivation chain ending at a
primitive, and validates each restriction STEP at schema-build time
(XsdAtomicRestriction; facet-vs-base-facet checks in
validators/facets.py:84-190,229-267,285-448,482-545,586; exercised by
tests/validators/test_facets.py *_restriction cases). This module is the
tabular analog: `TableSpec.simple_types` is a registry of named
ColumnSpecs, a spec references its base by name (`base="string20"`),
and compile_plan flattens the chain into one effective ColumnSpec —
after validating that every step only TIGHTENS the value space.

XSD semantics preserved by flattening:
  * patterns AND across derivation steps, OR within one step
    (facets.py:723-833: each XsdPatternFacets is an any-of; a
    restriction adds a new facet that must ALSO hold) — carried in
    `pattern_groups`;
  * whiteSpace may only move preserve -> replace -> collapse
    (facets.py:139-150);
  * length must equal the base's; minLength/maxLength, digits and
    ordered bounds may only tighten (facets.py:191,229,267,482,544);
  * enumeration values must come from the base's enumeration
    (facets.py:586);
  * assertions conjoin (XSD 1.1: each step's asserts all apply).

Everything happens at compile time on the driver — the executed plan
sees only the flattened ColumnSpec, so derivation depth costs nothing
at 100 TB.
"""

from __future__ import annotations

import dataclasses

from ..specs import ColumnSpec, TableSpec

_WS_ORDER = {"preserve": 0, "replace": 1, "collapse": 2}


def _num(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def _restrict(base: ColumnSpec, d: ColumnSpec, ctx: str) -> ColumnSpec:
    """One derivation step: validate that `d` only tightens `base`
    (both already flattened), return the effective ColumnSpec."""
    def err(msg: str) -> None:
        raise ValueError(f"restriction '{ctx}': {msg}")

    eff = {}

    # --- value space / primitive: a restriction never changes it
    if d.dtype != "string" and base.dtype != "string" \
            and d.dtype != base.dtype:
        err(f"cannot change the base type {base.dtype!r} to {d.dtype!r}")
    eff["dtype"] = d.dtype if d.dtype != "string" else base.dtype

    # --- whiteSpace: preserve -> replace -> collapse only
    # (facets.py:139-150)
    if d.whitespace is not None and base.whitespace is not None \
            and _WS_ORDER[d.whitespace] < _WS_ORDER[base.whitespace]:
        if base.whitespace == "collapse":
            err("facet value can be only 'collapse'")
        err("facet value can be only 'replace' or 'collapse'")
    eff["whitespace"] = d.whitespace if d.whitespace is not None \
        else base.whitespace

    # --- length family (facets.py:191,229,267)
    if base.length is not None and d.length is not None \
            and d.length != base.length:
        err(f"base facet has a different length ({base.length})")
    length = d.length if d.length is not None else base.length
    min_length = d.min_length if d.min_length is not None \
        else base.min_length
    max_length = d.max_length if d.max_length is not None \
        else base.max_length
    if d.min_length is not None and base.min_length is not None \
            and d.min_length < base.min_length:
        err(f"base facet has a greater min length ({base.min_length})")
    if d.max_length is not None and base.max_length is not None \
            and d.max_length > base.max_length:
        err(f"base type has a lesser max length ({base.max_length})")
    if length is not None:
        # fixed length + derived min/max: consistent bounds collapse
        # into the fixed length; inconsistent ones are an empty space
        if min_length is not None and min_length > length:
            err(f"minLength {min_length} conflicts with length {length}")
        if max_length is not None and max_length < length:
            err(f"maxLength {max_length} conflicts with length {length}")
        min_length = max_length = None
    eff["length"], eff["min_length"], eff["max_length"] = \
        length, min_length, max_length

    # --- ordered bounds: tighten-only, checked when numerically
    # comparable (temporal bounds live in a partial order and are
    # validated by their literal parsers at compile_column time)
    def side(cs: ColumnSpec, lower: bool):
        inc = cs.min_inclusive if lower else cs.max_inclusive
        exc = cs.min_exclusive if lower else cs.max_exclusive
        if inc is not None:
            return inc, False
        if exc is not None:
            return exc, True
        return None, False

    b_lo, b_lo_strict = side(base, True)
    b_hi, b_hi_strict = side(base, False)
    for lower in (True, False):
        d_val, d_strict = side(d, lower)
        if d_val is None:
            continue
        nd = _num(d_val)
        word = "minimum" if lower else "maximum"
        b_same, b_same_strict = (b_lo, b_lo_strict) if lower \
            else (b_hi, b_hi_strict)
        nb = _num(b_same)
        if nd is not None and nb is not None:
            relaxed = nd < nb if lower else nd > nb
            # equal bound but base excluded the endpoint and the
            # derived facet re-admits it -> relaxation
            if relaxed or (nd == nb and b_same_strict and not d_strict):
                op = (">" if b_lo_strict else ">=") if lower \
                    else ("<" if b_hi_strict else "<=")
                err(f"invalid restriction: value must be {op} {b_same}")
        b_other = b_hi if lower else b_lo
        b_other_strict = b_hi_strict if lower else b_lo_strict
        no = _num(b_other)
        if nd is not None and no is not None:
            outside = nd > no if lower else nd < no
            if outside:
                op = ("<" if b_hi_strict else "<=") if lower \
                    else (">" if b_lo_strict else ">=")
                err(f"invalid restriction: value must be {op} {b_other}")
            elif nd == no and (d_strict or b_other_strict):
                err(f"invalid restriction: {d_val} is also the "
                    + ("maximum" if lower else "minimum"))
    # a derived facet on one side replaces BOTH base facets of that side
    d_has_lower = d.min_inclusive is not None or d.min_exclusive is not None
    d_has_upper = d.max_inclusive is not None or d.max_exclusive is not None
    eff["min_inclusive"] = d.min_inclusive if d_has_lower \
        else base.min_inclusive
    eff["min_exclusive"] = d.min_exclusive if d_has_lower \
        else base.min_exclusive
    eff["max_inclusive"] = d.max_inclusive if d_has_upper \
        else base.max_inclusive
    eff["max_exclusive"] = d.max_exclusive if d_has_upper \
        else base.max_exclusive

    # --- digits (facets.py:482,544)
    for f in ("total_digits", "fraction_digits"):
        dv, bv = getattr(d, f), getattr(base, f)
        if dv is not None and bv is not None and dv > bv:
            err(f"invalid restriction: base value is lower ({bv})")
        eff[f] = dv if dv is not None else bv

    # --- enumeration: derived values must come from the base's
    # (facets.py:586)
    if d.enum is not None and base.enum is not None:
        bvals = {str(v) for v in base.enum}
        for v in d.enum:
            if str(v) not in bvals:
                err(f"invalid restriction from {v!r}")
    eff["enum"] = d.enum if d.enum is not None else base.enum

    # --- patterns: base's groups carry over, the derived step adds its
    # own any-of group (AND across steps, OR within a step)
    groups = list(base.pattern_groups or [])
    if base.pattern:
        groups.append(list(base.pattern))
    if d.pattern_groups:
        groups.extend(list(g) for g in d.pattern_groups)
    eff["pattern"] = list(d.pattern) if d.pattern else None
    eff["pattern_groups"] = groups or None

    # --- assertions conjoin
    if d.assertion and base.assertion:
        eff["assertion"] = f"({base.assertion}) AND ({d.assertion})"
    else:
        eff["assertion"] = d.assertion or base.assertion

    # --- explicitTimezone: optional -> required|prohibited only
    # (facets.py:556-587 XsdExplicitTimezoneFacet restriction)
    if d.explicit_timezone is not None \
            and base.explicit_timezone in ("required", "prohibited") \
            and d.explicit_timezone != base.explicit_timezone:
        err(f"invalid restriction: explicitTimezone "
            f"{base.explicit_timezone!r} cannot change to "
            f"{d.explicit_timezone!r}")
    eff["explicit_timezone"] = d.explicit_timezone \
        if d.explicit_timezone is not None else base.explicit_timezone

    # --- fixed value: a base fixed value cannot be overridden
    if d.fixed is not None and base.fixed is not None \
            and str(d.fixed) != str(base.fixed):
        err(f"invalid restriction: fixed value {base.fixed!r} cannot "
            f"change to {d.fixed!r}")
    eff["fixed"] = d.fixed if d.fixed is not None else base.fixed
    eff["default"] = d.default if d.default is not None else base.default

    # --- nillability only tightens
    eff["nullable"] = base.nullable and d.nullable

    # --- structural pieces inherit when the step doesn't redeclare
    for f in ("union_of", "union_members", "item"):
        dv = getattr(d, f)
        eff[f] = dv if dv is not None else getattr(base, f)
    eff["lexical_list"] = d.lexical_list or base.lexical_list

    return dataclasses.replace(d, base=None, **eff)


def resolve_column(cs: ColumnSpec, registry: dict[str, ColumnSpec],
                   stack: tuple = ()) -> ColumnSpec:
    """Flatten a ColumnSpec's derivation chain (and its item / union
    members, which may themselves name a base)."""
    eff = cs
    if cs.base is not None:
        if cs.base in stack:
            raise ValueError(
                f"restriction '{cs.name}': circular base type reference "
                f"({' -> '.join(stack + (cs.base,))})")
        if cs.base not in registry:
            raise ValueError(
                f"restriction '{cs.name}': unknown base simple type "
                f"{cs.base!r} — declare it in TableSpec.simple_types")
        base_eff = resolve_column(registry[cs.base], registry,
                                  stack + (cs.base,))
        eff = _restrict(base_eff, cs, cs.name)
    changed = {}
    if eff.item is not None and (eff.item.base is not None
                                 or eff.item.union_members):
        changed["item"] = resolve_column(eff.item, registry, stack)
    if eff.union_members:
        changed["union_members"] = [
            resolve_column(m, registry, stack) for m in eff.union_members]
    if changed:
        eff = dataclasses.replace(eff, **changed)
    return eff


def flatten_restrictions(spec: TableSpec) -> TableSpec:
    """Resolve every derivation chain in the spec; validate the whole
    simple-type registry eagerly (the reference parses all global types
    at schema build, so an unused invalid type still fails)."""
    registry = spec.simple_types or {}
    needs = bool(registry) or any(
        c.base is not None or c.union_members or c.item is not None
        for c in spec.columns)
    if not needs and not spec.conditionals:
        return spec
    for name, t in registry.items():
        resolve_column(t, registry, (name,))
    new_cols = [resolve_column(c, registry) for c in spec.columns]
    new_conds = [
        dataclasses.replace(
            cond, columns=[resolve_column(c, registry)
                           for c in cond.columns])
        for cond in spec.conditionals]
    return dataclasses.replace(spec, columns=new_cols,
                               conditionals=new_conds,
                               simple_types={})
