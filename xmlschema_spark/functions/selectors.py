"""Restricted-XPath selector DSL -> Catalyst columns.

The reference's identity constraints address their fields with a
restricted XPath subset (XsdSelector/XsdFieldSelector,
xmlschema/validators/identities.py:28-120: child steps, attribute steps,
'.', './', '|' alternatives — no predicates, no '//' descendant axis in
fields). The tabular analog maps child steps to nested struct fields and
attribute steps to columns/fields, compiled to a Column expression so
selector-addressed identity checks stay in whole-stage codegen.

Supported:   'a/b/c'   './a/b'   'a/@id'   '@id'
Rejected loudly (compile-time ValueError, mirroring the reference's
XPath parser errors): predicates '[...]', descendant '//', wildcards,
functions, axes.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_\-\.]*$")


def is_selector(path: str) -> bool:
    """True when the string needs selector compilation (vs a plain
    column name)."""
    return path.startswith("./") or path.startswith("@") or "/" in path


def compile_selector(path: str) -> Column:
    """Compile one restricted-XPath selector to a Column."""
    p = path.strip()
    if p.startswith("./"):
        p = p[2:]
    if "//" in p:
        raise ValueError(
            f"descendant axis '//' not supported in selector {path!r} "
            "(reference restricted-XPath also limits fields to child/attr "
            "steps, identities.py:70-96)")
    if "[" in p or "]" in p:
        raise ValueError(f"predicates not supported in selector {path!r}")
    if "*" in p:
        raise ValueError(f"wildcards not supported in selector {path!r}")
    steps = [s for s in p.split("/") if s]
    if not steps:
        raise ValueError(f"empty selector {path!r}")
    col: Column | None = None
    for i, s in enumerate(steps):
        name = s[1:] if s.startswith("@") else s
        if s.startswith("@") and i != len(steps) - 1:
            raise ValueError(
                f"attribute step must be last in selector {path!r}")
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid step {s!r} in selector {path!r}")
        col = F.col(name) if col is None else col.getField(name)
    return col


def selector_alias(path: str) -> str:
    """Deterministic flat column name for a compiled selector. A short
    stable hash of the RAW path disambiguates selectors whose slugs
    collide ('a/b' vs 'a/@b' both slug to 'a_b' — without the hash the
    second withColumn in one UniqueSpec silently overwrote the first
    and the constraint evaluated over the wrong field)."""
    import zlib
    slug = re.sub(r"[^A-Za-z0-9]+", "_", path.strip()).strip("_")
    crc = format(zlib.crc32(path.strip().encode()) & 0xFFFFFFFF, "08x")
    return f"_sel_{slug}_{crc}"


def resolve_selectors(df: DataFrame,
                      cols: list[str]) -> tuple[DataFrame, list[str]]:
    """Project selector expressions to flat columns; plain names pass
    through. Returns (df with any selector columns added, flat names) —
    identity operators then group/join on ordinary columns."""
    flat: list[str] = []
    for c in cols:
        if is_selector(c):
            a = selector_alias(c)
            df = df.withColumn(a, compile_selector(c))
            flat.append(a)
        else:
            flat.append(c)
    return df, flat


def select_paths(df: DataFrame, paths: dict[str, str]) -> DataFrame:
    """Path-restricted source projection: read ONLY the given selector
    paths (alias -> selector). Nested-field pruning reaches the parquet
    ReadSchema, so at 100 TB unselected struct branches are never read."""
    return df.select(*[compile_selector(p).alias(a)
                       for a, p in paths.items()])
