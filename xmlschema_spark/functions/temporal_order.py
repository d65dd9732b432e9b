"""Ordered VALUE-SPACE comparisons for XSD temporal types.

The reference applies min/max In/Exclusive to *all* ordered types —
durations and Gregorian types included — via typed comparison
(/root/reference/xmlschema/validators/facets.py:285-448), with the facet
constant decoded against the base type (facets.py:300-314). Spark has no
native duration/gYear types, so this module compiles the XSD partial
orders to pure-JVM Catalyst expressions over the LEXICAL columns:

- xs:duration (and yearMonth/dayTime subtypes) decode to a
  (months, seconds) pair; ordering follows the XSD 1.0/1.1 rule — d1 < d2
  iff ref+d1 < ref+d2 at ALL FOUR reference dateTimes (1696-09-01,
  1697-02-01, 1903-03-01, 1903-07-01). Incomparable pairs (P1M vs P30D)
  make every strict comparison False, so — exactly like the reference's
  `if value < self.value: raise` (facets.py:317-321) — an incomparable
  value PASSES the facet. For the subtypes (seconds==0 or months==0) the
  same rule collapses to a total order.
- Gregorian/date/time types map to seconds on the timeline (XSD 1.1
  timeOnTimeline, with fixed fill-in fields per type so same-type
  comparisons are anchor-invariant). Timezoned vs naive follows the XSD
  +-14h rule: both-tz'd or both-naive compare directly; mixed pairs are
  comparable only when they differ by more than 14 hours — otherwise
  incomparable, and the facet passes (reference raises only on a
  *certain* violation).

Limits (documented): proleptic years must be >= 0001 (no BC years —
make_date's domain); a lexically-valid but non-existent date (e.g.
2001-02-30) yields a NULL timeline point and the ordered facet is
suppressed for that row (decode-failure semantics), mirroring
typed_guard in plans/compiler.py.
"""

from __future__ import annotations

import re
from datetime import date

from pyspark.sql import Column
from pyspark.sql import functions as F

# the four XSD reference dateTimes for duration ordering
_REF_POINTS = [date(1696, 9, 1), date(1697, 2, 1),
               date(1903, 3, 1), date(1903, 7, 1)]

_EPOCH = date(1970, 1, 1)

_DUR_RE = re.compile(
    r"^(-?)P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$")

_DUR_EXPR_RE = (r"^(-?)P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)D)?"
                r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$")

_TZ_RE = r"(Z|[+-]\d{2}:\d{2})"

DURATION_KINDS = {"duration", "yearMonthDuration", "dayTimeDuration"}
TEMPORAL_KINDS = {"gYear", "gYearMonth", "gMonth", "gMonthDay", "gDay",
                  "date", "time", "dateTime", "dateTimeStamp"}


# ---------------------------------------------------------------- duration

def parse_duration_literal(s: str, kind: str = "duration") -> tuple[int, float]:
    """Facet-constant decode against the base type (facets.py:300-314):
    -> (months, seconds). Raises ValueError for lexically invalid input
    or a constant outside the subtype's lexical space — the analog of
    the reference's parse_error at schema build."""
    m = _DUR_RE.match(s.strip())
    if not m or (m.group(2) is None and m.group(3) is None
                 and m.group(4) is None and m.group(5) is None
                 and m.group(6) is None and m.group(7) is None):
        raise ValueError(f"invalid xs:{kind} literal {s!r}")
    if "T" in s and s.rstrip().endswith("T"):
        raise ValueError(f"invalid xs:{kind} literal {s!r} (bare 'T')")
    sign = -1 if m.group(1) else 1
    months = sign * (int(m.group(2) or 0) * 12 + int(m.group(3) or 0))
    seconds = sign * (int(m.group(4) or 0) * 86400
                      + int(m.group(5) or 0) * 3600
                      + int(m.group(6) or 0) * 60
                      + float(m.group(7) or 0))
    if kind == "yearMonthDuration" and seconds != 0:
        raise ValueError(f"xs:yearMonthDuration constant {s!r} has a "
                         "day/time component")
    if kind == "dayTimeDuration" and months != 0:
        raise ValueError(f"xs:dayTimeDuration constant {s!r} has a "
                         "year/month component")
    return months, seconds


def duration_cols(col: Column) -> tuple[Column, Column]:
    """(months, seconds) from a duration lexical column — regexp_extract
    only, whole-stage codegen. Non-matching strings yield (0, 0); the
    caller guards with the lexical pattern so those rows never reach the
    ordered comparison."""
    def g(i: int) -> Column:
        return F.coalesce(
            F.regexp_extract(col, _DUR_EXPR_RE, i).try_cast("double"),
            F.lit(0.0))

    sign = F.when(F.regexp_extract(col, _DUR_EXPR_RE, 1) == "-",
                  F.lit(-1.0)).otherwise(F.lit(1.0))
    # try_cast, not cast: under ANSI mode (Spark 4 default) a lexically
    # valid huge duration like 'P9999999999Y' would throw CAST_OVERFLOW
    # and crash the job; NULL months instead suppresses the ordered
    # facet (decode-failure semantics, same as try_to_timestamp for
    # non-existent dates). Months are additionally clamped to the
    # module's documented year range (1..9999 -> +-120000 months):
    # add_months beyond that overflows Spark's int32-days DateType.
    months_raw = (sign * (g(2) * 12 + g(3))).try_cast("int")
    months = F.when(F.abs(months_raw) <= 120000, months_raw)
    seconds = sign * (g(4) * 86400 + g(5) * 3600 + g(6) * 60 + g(7))
    return months, seconds


def _months2days_const(ref: date, months: int) -> int:
    """Days spanned by adding `months` months at reference date `ref`
    (compile-time twin of datediff(add_months(ref, m), ref))."""
    y = ref.year + (ref.month - 1 + months) // 12
    mo = (ref.month - 1 + months) % 12 + 1
    return (date(y, mo, 1) - ref).days


def duration_ordered_valid(col: Column, facet: str, literal: str,
                           kind: str = "duration") -> Column:
    """Valid-if-present predicate for one ordered facet over a duration
    column. Violation fires only on a CERTAIN comparison — i.e. the
    reference's `value < facet_value` holding at all four reference
    points; incomparable values pass (facets.py:317-321 raises only when
    `<` is True, and the partial order returns False for incomparable).
    """
    cm, cs = parse_duration_literal(literal, kind)
    vm, vs = duration_cols(col)
    # per reference point r: value-total-seconds tv_r vs constant tc_r
    comparisons = []
    for ref in _REF_POINTS:
        ref_lit = F.lit(ref.isoformat()).cast("date")
        v_days = F.datediff(F.add_months(ref_lit, vm), ref_lit)
        tv = v_days.cast("double") * 86400.0 + vs
        tc = float(_months2days_const(ref, cm)) * 86400.0 + cs
        comparisons.append((tv, F.lit(tc)))

    def any4(op):
        out = None
        for tv, tc in comparisons:
            c = op(tv, tc)
            out = c if out is None else out | c
        # NULL tv (months beyond the supported range -> NULL from
        # duration_cols) suppresses the facet: the value is treated as
        # incomparable and PASSES, mirroring the partial-order
        # incomparable-passes rule above.
        return F.coalesce(out, F.lit(True))

    # valid = NOT(certain violation); see module docstring
    if facet == "minInclusive":     # violation iff v <  c at all refs
        return any4(lambda a, b: a >= b)
    if facet == "minExclusive":     # violation iff v <= c at all refs
        return any4(lambda a, b: a > b)
    if facet == "maxInclusive":     # violation iff v >  c at all refs
        return any4(lambda a, b: a <= b)
    if facet == "maxExclusive":     # violation iff v >= c at all refs
        return any4(lambda a, b: a < b)
    raise ValueError(f"unknown ordered facet {facet!r}")


# ------------------------------------------------------- gregorian / time

# per-kind lexical regex with capture groups, and the group index of
# each component (0 = absent -> fill-in constant). Fill-ins are fixed
# per type, so same-type comparisons are anchor-invariant; 1972 is a
# leap year so --02-29 stays valid.
_KIND_RE: dict[str, tuple[str, dict[str, int]]] = {
    "gYear": (rf"^(-?\d{{4,}}){_TZ_RE}?$",
              {"y": 1, "tz": 2}),
    "gYearMonth": (rf"^(-?\d{{4,}})-(\d{{2}}){_TZ_RE}?$",
                   {"y": 1, "mo": 2, "tz": 3}),
    "gMonth": (rf"^--(\d{{2}}){_TZ_RE}?$",
               {"mo": 1, "tz": 2}),
    "gMonthDay": (rf"^--(\d{{2}})-(\d{{2}}){_TZ_RE}?$",
                  {"mo": 1, "da": 2, "tz": 3}),
    "gDay": (rf"^---(\d{{2}}){_TZ_RE}?$",
             {"da": 1, "tz": 2}),
    "date": (rf"^(-?\d{{4,}})-(\d{{2}})-(\d{{2}}){_TZ_RE}?$",
             {"y": 1, "mo": 2, "da": 3, "tz": 4}),
    "time": (rf"^(\d{{2}}):(\d{{2}}):(\d{{2}}(?:\.\d+)?){_TZ_RE}?$",
             {"hh": 1, "mi": 2, "ss": 3, "tz": 4}),
    "dateTime": (rf"^(-?\d{{4,}})-(\d{{2}})-(\d{{2}})T"
                 rf"(\d{{2}}):(\d{{2}}):(\d{{2}}(?:\.\d+)?){_TZ_RE}?$",
                 {"y": 1, "mo": 2, "da": 3, "hh": 4, "mi": 5, "ss": 6,
                  "tz": 7}),
}

_KIND_RE["dateTimeStamp"] = _KIND_RE["dateTime"]

_FILL = {"y": 1972, "mo": 12, "da": 1, "hh": 0, "mi": 0, "ss": 0}

_FOURTEEN_H = 14 * 3600.0


def _tz_seconds_col(tz: Column) -> Column:
    """'Z'->0, '+hh:mm'->offset seconds, ''/no-match -> NULL (naive)."""
    return (F.when(tz == "Z", F.lit(0.0))
            .when(tz.rlike(r"^[+-]"),
                  F.when(F.substring(tz, 1, 1) == "-", -1.0).otherwise(1.0)
                  * (F.substring(tz, 2, 2).cast("double") * 3600
                     + F.substring(tz, 5, 2).cast("double") * 60))
            .otherwise(F.lit(None).cast("double")))


def temporal_point(col: Column, kind: str) -> tuple[Column, Column]:
    """(base_seconds, tz_offset_seconds_or_null) for a temporal lexical
    column. base is the NAIVE timeline point (fill-in fields applied);
    UTC instant = base - tz_offset when tz is present. NULL base when
    the regex does not match or the date does not exist."""
    if kind not in _KIND_RE:
        raise ValueError(f"no ordered mapping for xsd:{kind}")
    rx, groups = _KIND_RE[kind]

    def comp(name: str, cast: str = "int") -> Column:
        # absent group on a MATCHING row is impossible (every named
        # group is required by its kind's regex); '' extracts only on a
        # non-matching row, where try_cast -> NULL propagates to a NULL
        # base (facet suppressed)
        if name in groups:
            return F.regexp_extract(col, rx, groups[name]).try_cast(cast)
        return F.lit(_FILL[name]).cast(cast)

    y, mo, da = comp("y"), comp("mo"), comp("da")
    hh, mi = comp("hh"), comp("mi")
    ss = comp("ss", "double")
    # xs:time "24:00:00" is lexically valid and denotes the SAME value
    # as "00:00:00" (XSD canonical mapping; the reference's Time type
    # normalizes it) — for the date-anchored time kind wrap 24 -> 0.
    # dateTime needs no wrap: hh=24 genuinely rolls to the next day on
    # the timeline, which the plain arithmetic already produces.
    if kind == "time":
        hh = F.when(hh == 24, F.lit(0)).otherwise(hh)
    # try_to_timestamp, not make_date: under ANSI mode (Spark 4 default)
    # make_date THROWS on a non-existent date like 2001-02-30; the
    # try-variant yields NULL, which is exactly the decode-suppression
    # this module wants. Years outside 4 digits are forced to NULL
    # explicitly — lpad TRUNCATES overlong strings, so without the
    # guard a 5-digit year would silently decode as its first 4 digits.
    ys = y.cast("string")
    ds = F.when(F.length(ys) > 4, F.lit(None).cast("string")) \
          .otherwise(F.concat(F.lpad(ys, 4, "0"), F.lit("-"),
                              F.lpad(mo.cast("string"), 2, "0"), F.lit("-"),
                              F.lpad(da.cast("string"), 2, "0")))
    days = F.datediff(F.try_to_timestamp(ds, F.lit("yyyy-MM-dd"))
                      .cast("date"),
                      F.lit(_EPOCH.isoformat()).cast("date"))
    base = (days.cast("double") * 86400.0
            + hh.cast("double") * 3600.0 + mi.cast("double") * 60.0 + ss)
    tz = _tz_seconds_col(F.regexp_extract(col, rx, groups["tz"]))
    # non-matching string: every extract is '' -> try_cast null -> days
    # null -> base null (facet suppressed; lexical pattern reports it)
    return base, tz


def parse_temporal_literal(s: str, kind: str) -> tuple[float, float | None]:
    """Compile-time facet-constant decode -> (base_seconds, tz_or_None).
    Raises ValueError when the constant is not in the type's lexical
    space (reference: parse_error during facet build)."""
    rx, groups = _KIND_RE[kind]
    m = re.match(rx, s.strip())
    if not m:
        raise ValueError(f"invalid xs:{kind} literal {s!r}")

    def g(name: str) -> float:
        if name in groups and m.group(groups[name]) is not None:
            return float(m.group(groups[name]))
        return float(_FILL[name])

    y, mo, da = int(g("y")), int(g("mo")), int(g("da"))
    if y < 1:
        raise ValueError(f"years before 0001 unsupported: {s!r}")
    if y > 9999:
        raise ValueError(f"years beyond 9999 unsupported: {s!r}")
    hh = g("hh")
    if kind == "time" and hh == 24:
        hh = 0.0        # xs:time 24:00:00 == 00:00:00 (canonical mapping)
    base = ((date(y, mo, da) - _EPOCH).days * 86400.0
            + hh * 3600.0 + g("mi") * 60.0 + g("ss"))
    tzs = m.group(groups["tz"])
    if tzs is None:
        tz = None
    elif tzs == "Z":
        tz = 0.0
    else:
        sign = -1.0 if tzs[0] == "-" else 1.0
        tz = sign * (int(tzs[1:3]) * 3600 + int(tzs[4:6]) * 60)
    return base, tz


def temporal_ordered_valid(col: Column, facet: str, literal: str,
                           kind: str) -> Column:
    """Valid-if-present predicate for one ordered facet over a temporal
    lexical column, under the XSD +-14h partial order: both-naive or
    both-timezoned pairs compare directly; mixed pairs are comparable
    only beyond a 14-hour gap, and incomparable values PASS (the
    reference raises only on a certain violation; facets.py:317-321).

    NULL timeline point (regex mismatch / non-existent date) suppresses
    the facet — decode-failure semantics, same as typed_guard."""
    cb, ctz = parse_temporal_literal(literal, kind)
    vb, vtz = temporal_point(col, kind)
    v_aware = vtz.isNotNull()
    v_utc = vb - F.coalesce(vtz, F.lit(0.0))

    if ctz is not None:
        c_utc = cb - ctz
        # value aware: direct; value naive: certain iff beyond +-14h.
        # incl=True tests 'certainly v <= c' with an EXACT boundary
        # (the <= operator itself) — no epsilon pad, so exclusive
        # facets stay exact at arbitrary fractional-second precision
        # (minExclusive '12:00:00' must NOT flag '12:00:00.0000005').
        def lt(incl: bool) -> Column:           # certain v < c (or <=)
            def o(a, b):
                return a <= b if incl else a < b
            return F.when(v_aware, o(v_utc, c_utc)) \
                    .otherwise(o(vb + _FOURTEEN_H, c_utc))

        def gt(incl: bool) -> Column:           # certain v > c (or >=)
            def o(a, b):
                return a >= b if incl else a > b
            return F.when(v_aware, o(v_utc, c_utc)) \
                    .otherwise(o(vb - _FOURTEEN_H, c_utc))
    else:
        def lt(incl: bool) -> Column:
            def o(a, b):
                return a <= b if incl else a < b
            return F.when(~v_aware, o(vb, cb)) \
                    .otherwise(o(v_utc, cb - _FOURTEEN_H))

        def gt(incl: bool) -> Column:
            def o(a, b):
                return a >= b if incl else a > b
            return F.when(~v_aware, o(vb, cb)) \
                    .otherwise(o(v_utc, cb + _FOURTEEN_H))

    if facet == "minInclusive":     # violation iff certainly v < c
        bad = lt(False)
    elif facet == "minExclusive":   # violation iff certainly v <= c
        bad = lt(True)
    elif facet == "maxInclusive":   # violation iff certainly v > c
        bad = gt(False)
    elif facet == "maxExclusive":   # violation iff certainly v >= c
        bad = gt(True)
    else:
        raise ValueError(f"unknown ordered facet {facet!r}")
    return vb.isNull() | ~F.coalesce(bad, F.lit(False))
