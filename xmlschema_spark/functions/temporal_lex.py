"""XSD temporal lexical-space patterns (for string-typed temporal columns).

The reference decodes these via elementpath.datatypes fromstring parsers
(builtins.py:97-136,383-415,436-491). Spark maps xs:dateTime/date/time to
native types via try_cast; the types WITHOUT a Spark native mapping
(gYear, gYearMonth, gMonth, gDay, gMonthDay, duration and the derived
yearMonth/dayTime durations) validate as anchored lexical patterns —
plug into ColumnSpec.pattern (they are XSD-regex compatible: plain
character classes only).

Usage:
    ColumnSpec("year", "string", pattern=[GYEAR])
    ColumnSpec("elapsed", "string", pattern=[DURATION])
"""

_TZ = r"(Z|[+-](0\d|1[0-4]):[0-5]\d)?"

# year 0000 is excluded (XSD 1.0 rule, which the reference follows:
# tests/validators/test_builtins.py:209 asserts '0000-01-01' invalid);
# XSD regex has no lookahead, so 0001-0999 is spelled out
_YEAR = r"([1-9]\d{3,}|0(00[1-9]|0[1-9]\d|[1-9]\d{2}))"
# day bounded per month (XSD lexical mapping constraint: <= 30 for
# 04/06/09/11, <= 29 for 02). Month-day validity is YEAR-INDEPENDENT
# except Feb 29, which the year-aware date/dateTime bodies below make
# exact via _LEAPYEAR; gMonthDay keeps --02-29 valid (the type has no
# year, and XSD defines its validity against SOME leap year)
_MONTHDAY = (r"((0[13578]|1[02])-(0[1-9]|[12]\d|3[01])"
             r"|(0[469]|11)-(0[1-9]|[12]\d|30)"
             r"|02-(0[1-9]|[12]\d))")
# same, with Feb capped at 28 — the non-leap branch of date/dateTime
_MONTHDAY_NOLEAP = (r"((0[13578]|1[02])-(0[1-9]|[12]\d|3[01])"
                    r"|(0[469]|11)-(0[1-9]|[12]\d|30)"
                    r"|02-(0[1-9]|1\d|2[0-8]))")
# Gregorian leap years within _YEAR's lexical forms, no lookahead:
# divisible-by-4 depends only on the last two digits; century years
# (..00) are leap iff the century's own last two digits divide by 4.
# Branches: >=4-digit non-century | 4-digit century | >=5-digit
# century | 0xxx non-century | 0400/0800. Negative years use the same
# digit rule on the absolute value.
_LEAPYEAR = (r"([1-9]\d+(0[48]|[2468][048]|[13579][26])"
             r"|([2468][048]|[13579][26])00"
             r"|[1-9]\d*([02468][048]|[13579][26])00"
             r"|0\d(0[48]|[2468][048]|[13579][26])"
             r"|0[48]00)")
# exact year-month-day body: any valid year with a non-leap-safe
# month-day, or a leap year with 02-29
_YMD = (rf"({_YEAR}-{_MONTHDAY_NOLEAP}|{_LEAPYEAR}-02-29)")
_TOD = r"(([01]\d|2[0-3]):[0-5]\d:[0-5]\d(\.\d+)?|(24:00:00(\.0+)?))"

GYEAR = rf"-?{_YEAR}{_TZ}"
GYEARMONTH = rf"-?{_YEAR}-(0[1-9]|1[0-2]){_TZ}"
GMONTH = rf"--(0[1-9]|1[0-2]){_TZ}"
GMONTHDAY = rf"--{_MONTHDAY}{_TZ}"
GDAY = rf"---(0[1-9]|[12]\d|3[01]){_TZ}"

DATE = rf"-?{_YMD}{_TZ}"
TIME = rf"{_TOD}{_TZ}"
DATETIME = rf"-?{_YMD}T{_TOD}{_TZ}"
# XSD 1.1 dateTimeStamp: dateTime with the timezone REQUIRED
# (reference tests/validators/test_builtins.py:311-318)
_TZ_REQ = r"(Z|[+-](0\d|1[0-4]):[0-5]\d)"
DATETIMESTAMP = rf"-?{_YMD}T{_TOD}{_TZ_REQ}"

# xs:duration: sign, P, at least one component; a T must be followed by
# at least one time component (bare 'PT' is invalid)
_TIMEPART = (r"T((\d+H)(\d+M)?(\d+(\.\d+)?S)?"
             r"|(\d+M)(\d+(\.\d+)?S)?"
             r"|(\d+(\.\d+)?S))")
DURATION = (rf"-?P((\d+Y)?(\d+M)?(\d+D)?({_TIMEPART})"
            r"|(\d+Y)(\d+M)?(\d+D)?"
            r"|(\d+Y)?(\d+M)(\d+D)?"
            r"|(\d+Y)?(\d+M)?(\d+D))")
YEARMONTH_DURATION = r"-?P((\d+Y)(\d+M)?|(\d+M))"
# day-then-T branch reuses _TIMEPART so a trailing bare 'T' ('P7DT')
# is invalid, matching the reference
# (tests/validators/test_builtins.py:319-335)
DAYTIME_DURATION = rf"-?P((\d+D)({_TIMEPART})?|{_TIMEPART})"

ALL = {
    "gYear": GYEAR, "gYearMonth": GYEARMONTH, "gMonth": GMONTH,
    "gMonthDay": GMONTHDAY, "gDay": GDAY, "date": DATE, "time": TIME,
    "dateTime": DATETIME, "dateTimeStamp": DATETIMESTAMP,
    "duration": DURATION,
    "yearMonthDuration": YEARMONTH_DURATION,
    "dayTimeDuration": DAYTIME_DURATION,
}


# --- XSD built-in NAME/token lexical types (reference decode parsers:
# xmlschema via elementpath builtins; lexical rules are the public XSD
# datatypes spec). These use XSD regex escapes (\i \c, class
# subtraction) which functions/xsd_regex.translate_xsd_pattern compiles
# to Java regex — same pipeline as user patterns. No ordered facets
# (compile_column rejects min/max on non-temporal xsd kinds).
LANGUAGE = r"[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*"
NAME = r"\i\c*"
NCNAME = r"[\i-[:]][\c-[:]]*"
NMTOKEN = r"\c+"
# token/normalizedString value constraints: no leading/trailing/double
# spaces resp. no tab/newline (XSD 1.0 pt.2 3.3.1-3.3.2); on an already
# whitespace-preserved column these validate the RAW form
NORMALIZED_STRING = r"[^\t\r\n]*"
# token = space-separated runs of non-whitespace: exactly one space
# between runs bans leading/trailing/double spaces AND tab/CR/LF with
# no lookahead (XSD regexes have none)
TOKEN = r"([^\s]+( [^\s]+)*)?"

# xs:QName / xs:NOTATION lexical space: NCName with at most one
# prefix separator (builtins.py:139-152; the VALUE-space prefix
# binding check lives in the compiler against TableSpec.namespaces)
QNAME = rf"{NCNAME}(:{NCNAME})?"

NAME_TYPES = {
    "language": LANGUAGE, "Name": NAME, "NCName": NCNAME,
    "NMTOKEN": NMTOKEN, "ID": NCNAME, "IDREF": NCNAME, "ENTITY": NCNAME,
    "normalizedString": NORMALIZED_STRING, "token": TOKEN,
    "QName": QNAME, "NOTATION": QNAME,
}

ALL.update(NAME_TYPES)


def python_lexical(kind: str):
    """Python-`re`-safe lexical pattern for `kind`, or None. The NAME
    family uses XSD escapes (\\i \\c, class subtraction) whose Java
    translation (xsd_regex) carries `&&[^:]` intersections Python's re
    cannot parse — the compile-time literal checks (fixed/default
    values) need these equivalents with the subtraction expanded by
    simply omitting ':' from the classes. Everything else in ALL is
    already engine-portable."""
    if kind not in ALL:
        return None
    if kind in ("Name", "NCName", "NMTOKEN", "ID", "IDREF", "ENTITY",
                "QName", "NOTATION"):
        from .xsd_regex import _NAME_CHAR, _NAME_START
        start_nc = _NAME_START.lstrip(":")     # \i minus ':'
        char_nc = _NAME_CHAR.lstrip(":")       # \c minus ':'
        if kind == "Name":
            return f"[{_NAME_START}][{_NAME_CHAR}]*"
        if kind == "NMTOKEN":
            return f"[{_NAME_CHAR}]+"
        ncname = f"[{start_nc}][{char_nc}]*"
        if kind in ("QName", "NOTATION"):
            return f"{ncname}(:{ncname})?"
        return ncname                          # NCName/ID/IDREF/ENTITY
    return ALL[kind]
