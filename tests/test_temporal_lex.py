"""XSD temporal lexical patterns — pure-python regex checks (Spark rlike
uses Java regex; these patterns use only portable constructs, verified
against Python re here and via the translator in engine tests)."""

import re

import pytest

from xmlschema_spark.functions.temporal_lex import ALL
from xmlschema_spark.functions.xsd_regex import translate_xsd_pattern

VALID = {
    "gYear": ["2024", "0001", "-0042", "2024Z", "12024+05:00"],
    "gYearMonth": ["2024-01", "0001-12Z"],
    "gMonth": ["--01", "--12Z"],
    "gMonthDay": ["--02-29", "--12-31+14:00"],
    "gDay": ["---01", "---31Z"],
    "date": ["2024-02-29", "-0055-01-01Z", "12012-05-31",
             "2012-05-31-05:00", "2023-01-31", "2023-04-30"],
    "time": ["00:00:00", "23:59:59.999Z", "24:00:00"],
    "dateTime": ["2024-01-02T03:04:05", "2024-01-02T03:04:05.6+05:30"],
    "dateTimeStamp": ["2003-10-20T16:50:08-03:00",
                      "2003-10-20T16:50:08Z"],
    "duration": ["P1Y", "P1Y2M3DT4H5M6.7S", "PT0.5S", "-P30D", "PT1M"],
    "yearMonthDuration": ["P1Y", "P14M", "-P1Y2M"],
    "dayTimeDuration": ["P3D", "PT4H", "-P1DT2H3M4.5S", "PT0.1S"],
}

INVALID = {
    "gYear": ["24", "20245-", "2024+15:00", "0000", "045"],
    "gMonth": ["--13", "-01"],
    "date": ["2024-13-01", "2024-00-10", "2024-1-1", "1999-06-31",
             "2024-02-30", "0000-01-01", "+2012-05-31", "12-05-31"],
    "time": ["24:00:01", "25:00:00", "1:00:00"],
    "dateTime": ["2024-01-02 03:04:05", "2024-01-02T24:01:00",
                 "2007-05-10t14:35:00", "2007-05-10T14:35",
                 "2007-04-31T00:00:00"],
    "dateTimeStamp": ["2003-10-20T16:50:08", "1980-02-28T17:09:20.1"],
    "duration": ["P", "PT", "1Y", "P-1Y", "PYM"],
    "yearMonthDuration": ["P1D", "PT1H", "P"],
    "dayTimeDuration": ["P1Y", "P1M", "P"],  # P1M = month in full duration
}


# name/token types are validated ENGINE-SIDE only (golden manifest
# cases): their translated patterns use Java '&&' class intersection,
# which Python re parses as literal characters with wrong semantics —
# a green re-based test here would be vacuous-or-lying. Parametrize
# over the kinds this harness actually has data for, and assert the
# two sets stay in sync so a new temporal kind can't slip in untested.
_RE_TESTABLE = sorted(VALID)


def test_every_temporal_kind_has_valid_cases():
    from xmlschema_spark.functions.temporal_lex import NAME_TYPES
    assert set(ALL) - set(NAME_TYPES) == set(VALID)


@pytest.mark.parametrize("kind", _RE_TESTABLE)
def test_valid_lexicals(kind):
    pat = re.compile(translate_xsd_pattern(ALL[kind]))
    for v in VALID.get(kind, []):
        assert pat.match(v), (kind, v)


@pytest.mark.parametrize("kind", sorted(INVALID))
def test_invalid_lexicals(kind):
    pat = re.compile(translate_xsd_pattern(ALL[kind]))
    for v in INVALID[kind]:
        assert not pat.match(v), (kind, v)
