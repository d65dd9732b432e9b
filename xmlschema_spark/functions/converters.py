"""Decode-sink converters — the tabular analog of the reference's
XMLSchemaConverter layouts and element_hook (converters/default.py and
siblings: BadgerFish/Parker/Columnar choose how decoded content maps to
dict shapes; element_hook rewrites each decoded element).

A converter is a callable (spec, column_names) -> struct Column that
builds the output document expression for one row. It runs INSIDE the
projection (pure Catalyst), so custom layouts cost nothing extra at
100 TB — no UDF, no second pass.
"""

from __future__ import annotations

import json
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.compiler import ValidationPlan, compile_plan
from ..specs import TableSpec

Converter = Callable[[TableSpec, list[str]], Column]


def default_converter(spec: TableSpec, names: list[str]) -> Column:
    """{column: value, ...} — the reference's default dict layout."""
    return F.struct(*[F.col(n) for n in names])


def attr_prefix_converter(attr_cols: list[str],
                          prefix: str = "@") -> Converter:
    """BadgerFish-style layout: designated 'attribute' columns keyed with
    a prefix (converters/default.py attr_prefix semantics)."""
    attrs = set(attr_cols)

    def conv(spec: TableSpec, names: list[str]) -> Column:
        return F.struct(*[
            F.col(n).alias(f"{prefix}{n}" if n in attrs else n)
            for n in names])
    return conv


def nested_converter(groups: dict[str, list[str]]) -> Converter:
    """Group flat columns into nested sub-documents:
    {"meta": ["lang", "n_chars"]} -> {"meta": {"lang": .., "n_chars": ..},
    <rest flat>} — the columnar-converter unflatten direction
    (converters/columnar.py:23-174)."""
    grouped = {c for cols in groups.values() for c in cols}

    def conv(spec: TableSpec, names: list[str]) -> Column:
        fields = [F.col(n) for n in names if n not in grouped]
        for g, cols in groups.items():
            fields.append(F.struct(*[F.col(c) for c in cols]).alias(g))
        return F.struct(*fields)
    return conv


def decode_table(df: DataFrame, spec_or_plan: TableSpec | ValidationPlan,
                 converter: Optional[Converter] = None,
                 names: list[str] | None = None) -> DataFrame:
    """Validated-decode sink: defaults filled, whitespace normalizations
    applied, declared columns assembled by the converter, serialized to
    JSON (reference: XMLSchema.decode -> converter -> dict/JSON,
    documents.py:275,301). Returns (row_key, doc).

    `names` overrides the column order handed to the converter (the
    analog of input-dict insertion order on the encode side): the
    default converter preserves it, unordered_converter re-derives
    model order from the spec instead."""
    from ..runner import apply_defaults
    plan = spec_or_plan if isinstance(spec_or_plan, ValidationPlan) \
        else compile_plan(spec_or_plan)
    spec = plan.spec
    out = apply_defaults(df, spec)
    for name, norm in plan.normalizations.items():
        out = out.withColumn(name, norm)
    if names is None:
        names = [c.name for c in spec.columns]
    conv = converter or default_converter
    doc = conv(spec, names)
    # converters that build JSON text directly (JsonML's heterogeneous
    # arrays) mark themselves raw; struct converters go through to_json
    if not getattr(conv, "raw", False):
        doc = F.to_json(doc)
    return out.select(F.col(spec.key_column).cast("string").alias("row_key"),
                      doc.alias("doc"))


def parker_converter(attr_cols: list[str]) -> Converter:
    """Parker convention (converters/parker.py:22-41: attr_prefix=None,
    text_key='', cdata_prefix=None): attributes are DROPPED from the
    decoded document — only element content survives. Tabular analog:
    the designated attribute columns are omitted from the struct."""
    attrs = set(attr_cols)

    def conv(spec: TableSpec, names: list[str]) -> Column:
        kept = [n for n in names if n not in attrs]
        if not kept:
            raise ValueError("parker_converter dropped every column")
        return F.struct(*[F.col(n) for n in kept])
    return conv


def badgerfish_converter(attr_cols: list[str],
                         text_col: str | None = None) -> Converter:
    """BadgerFish convention (converters/badgerfish.py:24-68:
    attr_prefix='@', text_key='$'): attribute columns keyed '@name',
    the designated text-content column keyed '$', other columns as
    nested elements."""
    attrs = set(attr_cols)

    def conv(spec: TableSpec, names: list[str]) -> Column:
        fields = []
        for n in names:
            if n == text_col:
                fields.append(F.col(n).alias("$"))
            elif n in attrs:
                fields.append(F.col(n).alias(f"@{n}"))
            else:
                fields.append(F.col(n))
        return F.struct(*fields)
    return conv


def gdata_converter(text_col: str | None = None) -> Converter:
    """GData convention (converters/gdata.py:24-42: attr_prefix='',
    text_key='$t'): attributes unprefixed (indistinguishable from
    elements in the flat tabular world), text content keyed '$t'."""
    def conv(spec: TableSpec, names: list[str]) -> Column:
        return F.struct(*[
            F.col(n).alias("$t") if n == text_col else F.col(n)
            for n in names])
    return conv


def abdera_converter(attr_cols: list[str]) -> Converter:
    """Abdera convention (converters/abdera.py:24-80: attr_prefix='',
    text_key=''): attributes collected under an 'attributes' dict,
    element content under 'children'. With no attribute columns the
    result collapses to the bare children dict (the reference's
    `if data.attributes` branch)."""
    attrs = set(attr_cols)

    def conv(spec: TableSpec, names: list[str]) -> Column:
        a = [F.col(n) for n in names if n in attrs]
        c = [F.col(n) for n in names if n not in attrs]
        if not a:
            return F.struct(*c)
        return F.struct(F.struct(*a).alias("attributes"),
                        F.struct(*c).alias("children"))
    return conv


def columnar_converter(attr_cols: list[str],
                       attr_prefix: str = "") -> Converter:
    """Columnar convention (converters/columnar.py:23-174) — the layout
    that motivated this engine's own output shape. Naming rule, exactly
    the reference's element_decode:

      - attributes are flattened with the PARENT element's local name:
        key = parent + attr_prefix + attr (columnar.py:74-79,
        `pfx = xsd_element.local_name + self.attr_prefix`), where
        attr_prefix must be '', '_' or '__' (columnar.py:57-66
        __setattr__ guard, same wording);
      - simple-content children keep their own local names and merge
        straight into the parent dict (columnar.py:95-99);
      - at level 0 the result is wrapped {root: {...}}
        (columnar.py:123-124).

    Attributes come first (result_dict is initialized from
    data.attributes), then children in declared order."""
    if attr_prefix not in ("", "_", "__"):
        raise ValueError("'attr_prefix' can be the empty string or a "
                         "single/double underscore")
    attrs = set(attr_cols)

    def conv(spec: TableSpec, names: list[str]) -> Column:
        fields = [F.col(n).alias(f"{spec.name}{attr_prefix}{n}")
                  for n in names if n in attrs]
        fields += [F.col(n) for n in names if n not in attrs]
        return F.struct(F.struct(*fields).alias(spec.name))
    return conv


def unordered_converter() -> Converter:
    """Unordered convention (converters/unordered.py:21-34): output
    order comes from the MODEL, not from input order — the reference's
    unordered encode mode lets the ModelVisitor decide sibling order
    instead of dict insertion order. Tabular analog: the struct is
    assembled in the spec's DECLARED column order no matter what order
    the caller passed `names` in (decode_table's `names` override);
    columns not declared in the spec keep their given relative order at
    the end (wildcard content follows the modeled content)."""
    def conv(spec: TableSpec, names: list[str]) -> Column:
        want = set(names)
        declared = [c.name for c in spec.columns if c.name in want]
        seen = set(declared)
        rest = [n for n in names if n not in seen]
        return F.struct(*[F.col(n) for n in declared + rest])
    return conv


def _bq(name: str) -> str:
    """Backtick-quote an identifier for embedding in SQL text (inner
    backticks doubled), so names with spaces/hyphens/reserved words
    parse."""
    return "`" + name.replace("`", "``") + "`"


def _json_scalar(name: str) -> Column:
    """JSON-encode one column value (string quoting/escaping, numbers
    bare) with to_json over a 1-element array, brackets stripped —
    engine-portable (DuckDB's to_json(x) produces the same scalar
    encoding for the plain types used here)."""
    q = _bq(name)
    return F.expr(f"substring(to_json(array({q})), 2, "
                  f"length(to_json(array({q}))) - 2)")


def jsonml_converter(attr_cols: list[str]) -> Converter:
    """JsonML convention (converters/jsonml.py:24-90): the row decodes
    to the array form ["table", {attributes}, ["col", value], ...] —
    heterogeneous, so the converter builds the JSON text directly
    (still pure Catalyst string expressions; decode_table detects the
    raw marker and skips its own to_json)."""
    attrs = set(attr_cols)

    def conv(spec: TableSpec, names: list[str]) -> Column:
        # json.dumps on every literal name fragment: a spec/column name
        # containing '"' or '\\' must arrive escaped in the JSON text
        parts: list[Column] = [F.lit("[" + json.dumps(spec.name))]
        a = [n for n in names if n in attrs]
        if a:
            parts.append(F.lit(","))
            parts.append(F.to_json(F.struct(*[F.col(n) for n in a])))
        for n in names:
            if n in attrs:
                continue
            parts.append(F.lit(f",[{json.dumps(n)},"))
            parts.append(_json_scalar(n))
            parts.append(F.lit("]"))
        parts.append(F.lit("]"))
        return F.concat(*parts)
    conv.raw = True          # already JSON text
    return conv
