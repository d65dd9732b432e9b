"""Restriction derivation chains (plans/restriction.py) — the tabular
analog of the reference's XsdAtomicRestriction facet-vs-base checks
(validators/facets.py:84-190,229-267,285-448,482-545,586; exercised by
tests/validators/test_facets.py *_restriction cases)."""

import pytest

from xmlschema_spark.plans.compiler import compile_plan
from xmlschema_spark.plans.restriction import flatten_restrictions
from xmlschema_spark.specs import ColumnSpec, TableSpec


def _spec(types, col):
    return TableSpec(name="t", key_column="rid", columns=[col],
                     simple_types=types)


def _flat(types, col) -> ColumnSpec:
    return flatten_restrictions(_spec(types, col)).columns[0]


# ------------------------------------------------------- flattening

def test_chain_flattens_tightest_facets():
    types = {
        "string30": ColumnSpec("string30", max_length=30),
        "string20": ColumnSpec("string20", base="string30",
                               max_length=20, min_length=5),
    }
    eff = _flat(types, ColumnSpec("v", base="string20", max_length=10))
    assert eff.max_length == 10 and eff.min_length == 5
    assert eff.base is None


def test_patterns_and_across_steps_or_within():
    types = {
        "alpha": ColumnSpec("alpha", pattern=["[a-z]+", "[A-Z]+"]),
        "short_alpha": ColumnSpec("short_alpha", base="alpha",
                                  pattern=[".{1,3}"]),
    }
    eff = _flat(types, ColumnSpec("v", base="short_alpha"))
    # derived step's own group stays in pattern; base group moves to
    # pattern_groups — the compiler ANDs them
    assert eff.pattern is None
    assert eff.pattern_groups == [["[a-z]+", "[A-Z]+"], [".{1,3}"]]


def test_dtype_inherited_and_unchangeable():
    types = {"price": ColumnSpec("price", dtype="decimal(10,2)",
                                 min_inclusive=0)}
    eff = _flat(types, ColumnSpec("v", base="price", max_inclusive=100))
    assert eff.dtype == "decimal(10,2)"
    assert eff.min_inclusive == 0 and eff.max_inclusive == 100
    with pytest.raises(ValueError, match="cannot change the base type"):
        _flat(types, ColumnSpec("v", base="price", dtype="int"))


def test_assertions_conjoin():
    types = {"even": ColumnSpec("even", dtype="int",
                                assertion="value % 2 = 0")}
    eff = _flat(types, ColumnSpec("v", base="even",
                                  assertion="value > 10"))
    assert eff.assertion == "(value % 2 = 0) AND (value > 10)"


# ------------------------------------------- step validity: whiteSpace

@pytest.mark.parametrize("b,d", [("preserve", "replace"),
                                 ("preserve", "collapse"),
                                 ("replace", "collapse"),
                                 ("collapse", "collapse")])
def test_whitespace_valid_derivations(b, d):
    types = {"base": ColumnSpec("base", whitespace=b)}
    assert _flat(types, ColumnSpec("v", base="base",
                                   whitespace=d)).whitespace == d


@pytest.mark.parametrize("b,d,msg", [
    ("replace", "preserve", "'replace' or 'collapse'"),
    ("collapse", "preserve", "only 'collapse'"),
    ("collapse", "replace", "only 'collapse'"),
])
def test_whitespace_invalid_derivations(b, d, msg):
    # facets.py:139-150 wording
    types = {"base": ColumnSpec("base", whitespace=b)}
    with pytest.raises(ValueError, match=msg):
        _flat(types, ColumnSpec("v", base="base", whitespace=d))


# ----------------------------------------- step validity: length family

def test_length_must_match_base():
    # facets.py:191 "base facet has a different length (8)"
    types = {"user8": ColumnSpec("user8", length=8)}
    assert _flat(types, ColumnSpec("v", base="user8",
                                   length=8)).length == 8
    with pytest.raises(ValueError,
                       match=r"base facet has a different length \(8\)"):
        _flat(types, ColumnSpec("v", base="user8", length=12))


def test_min_length_tighten_only():
    # facets.py:229 "base facet has a greater min length (40)"
    types = {"s40": ColumnSpec("s40", min_length=40)}
    assert _flat(types, ColumnSpec("v", base="s40",
                                   min_length=50)).min_length == 50
    with pytest.raises(ValueError, match="greater min length"):
        _flat(types, ColumnSpec("v", base="s40", min_length=30))


def test_max_length_tighten_only():
    # facets.py:267 "base type has a lesser max length (30)"
    types = {"s30": ColumnSpec("s30", max_length=30)}
    with pytest.raises(ValueError, match="lesser max length"):
        _flat(types, ColumnSpec("v", base="s30", max_length=40))


# ---------------------------------------- step validity: ordered bounds

def test_bounds_tighten_only():
    types = {"pct": ColumnSpec("pct", dtype="int", min_inclusive=0,
                               max_inclusive=100)}
    eff = _flat(types, ColumnSpec("v", base="pct", min_inclusive=10))
    assert eff.min_inclusive == 10 and eff.max_inclusive == 100
    with pytest.raises(ValueError, match="value must be >= 0"):
        _flat(types, ColumnSpec("v", base="pct", min_inclusive=-1))
    with pytest.raises(ValueError, match="value must be <= 100"):
        _flat(types, ColumnSpec("v", base="pct", max_inclusive=200))
    # lower bound beyond the base's UPPER bound
    with pytest.raises(ValueError, match="value must be <= 100"):
        _flat(types, ColumnSpec("v", base="pct", min_inclusive=150))


def test_exclusive_endpoint_not_readmitted():
    # base minExclusive 5 excludes 5; derived minInclusive 5 would
    # re-admit it (facets.py:285-353 "invalid restriction")
    types = {"gt5": ColumnSpec("gt5", dtype="int", min_exclusive=5)}
    assert _flat(types, ColumnSpec("v", base="gt5",
                                   min_inclusive=6)).min_inclusive == 6
    with pytest.raises(ValueError, match="value must be > 5"):
        _flat(types, ColumnSpec("v", base="gt5", min_inclusive=5))


def test_exclusive_meets_opposite_endpoint():
    # facets.py:357,439: "{} is also the maximum"/"minimum"
    types = {"pct": ColumnSpec("pct", dtype="int", min_inclusive=0,
                               max_inclusive=100)}
    with pytest.raises(ValueError, match="also the maximum"):
        _flat(types, ColumnSpec("v", base="pct", min_exclusive=100))


# ------------------------------------------ step validity: digits, enum

def test_digits_tighten_only():
    # facets.py:482,544 "invalid restriction: base value is lower (4)"
    types = {"d4": ColumnSpec("d4", dtype="decimal(10,2)",
                              total_digits=4, fraction_digits=2)}
    eff = _flat(types, ColumnSpec("v", base="d4", total_digits=3,
                                  fraction_digits=1))
    assert eff.total_digits == 3 and eff.fraction_digits == 1
    with pytest.raises(ValueError, match=r"base value is lower \(4\)"):
        _flat(types, ColumnSpec("v", base="d4", total_digits=6))
    with pytest.raises(ValueError, match=r"base value is lower \(2\)"):
        _flat(types, ColumnSpec("v", base="d4", fraction_digits=3))


def test_enum_subset_of_base():
    # facets.py:586 "invalid restriction from 'cow'"
    types = {"animal": ColumnSpec("animal", enum=["cat", "dog", "fox"])}
    eff = _flat(types, ColumnSpec("v", base="animal",
                                  enum=["cat", "dog"]))
    assert eff.enum == ["cat", "dog"]
    with pytest.raises(ValueError, match="invalid restriction from 'cow'"):
        _flat(types, ColumnSpec("v", base="animal", enum=["cow"]))


def test_explicit_timezone_restriction():
    # required/prohibited are terminal (facets.py:556-587)
    types = {"tz": ColumnSpec("tz", dtype="xsd:dateTime",
                              explicit_timezone="required")}
    with pytest.raises(ValueError, match="explicitTimezone"):
        _flat(types, ColumnSpec("v", base="tz",
                                explicit_timezone="prohibited"))


# ----------------------------------------------- registry-level errors

def test_unknown_base_rejected():
    with pytest.raises(ValueError, match="unknown base simple type"):
        _flat({}, ColumnSpec("v", base="nope"))


def test_circular_chain_rejected():
    # facets.py:115 "circular base type reference"
    types = {
        "a": ColumnSpec("a", base="b"),
        "b": ColumnSpec("b", base="a"),
    }
    with pytest.raises(ValueError, match="circular base type reference"):
        flatten_restrictions(_spec(types, ColumnSpec("v", base="a")))


def test_registry_validated_eagerly():
    """An invalid UNUSED global type still fails at compile — the
    reference parses every global simpleType at schema build."""
    types = {
        "s30": ColumnSpec("s30", max_length=30),
        "bad": ColumnSpec("bad", base="s30", max_length=40),
    }
    with pytest.raises(ValueError, match="lesser max length"):
        flatten_restrictions(_spec(types, ColumnSpec("v")))


# ------------------------------------------------------- end to end

def test_derived_type_validates_rows(spark):
    """Full engine pass through a 2-step chain: base pattern AND
    derived pattern AND derived max_length all apply."""
    from xmlschema_spark.runner import validate
    types = {
        "code": ColumnSpec("code", pattern=["[A-Z]+[0-9]*"]),
        "code3": ColumnSpec("code3", base="code", max_length=3),
    }
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("v", base="code3", pattern=["[A-Z].*"])],
        simple_types=types)
    df = spark.createDataFrame(
        [("r1", "AB1"), ("r2", "ABCD1"), ("r3", "ab1"), ("r4", "A-")],
        "rid string, v string")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    # r2: too long; r3: fails base pattern (and derived); r4: fails
    # base pattern only — each exactly one pattern violation row
    assert got == [("r2", "facet:maxLength:v"),
                   ("r3", "facet:pattern:v"),
                   ("r4", "facet:pattern:v")]


def test_from_dict_round_trip(spark):
    from xmlschema_spark.runner import validate
    spec = TableSpec.from_dict({
        "name": "t", "key_column": "rid",
        "simple_types": {
            "nonneg": {"dtype": "int", "min_inclusive": 0},
            "pct": {"base": "nonneg", "max_inclusive": 100},
        },
        "columns": [{"name": "v", "base": "pct"}],
    })
    df = spark.createDataFrame([("r1", "50"), ("r2", "-1"),
                                ("r3", "101")], "rid string, v string")
    got = sorted((r.row_key, r.constraint)
                 for r in validate(df, spec).violations.collect())
    assert got == [("r2", "facet:minInclusive:v"),
                   ("r3", "facet:maxInclusive:v")]
