"""XPath-2.0 assert translator (functions/xpath_assert.py) — reference
idioms from validators/assertions.py:36-179 / facets.py:836-894 and the
reference test suite's actual test="..." expressions round-trip through
the engine."""

import pytest

from xmlschema_spark.functions.xpath_assert import (translate_xpath_assert,
                                                    xpath_assert_spec,
                                                    xpath_assertion)


# ------------------------------------------------------ translation

@pytest.mark.parametrize("xpath,sql", [
    ("$value mod 2 = 0", "value % 2 = 0"),
    ("@min le @max", "min <= max"),
    ("@a > 300", "a > 300"),
    ("child le 10", "child <= 10"),
    ("string-length($value) < 80", "length(value) < 80"),
    ("count($value) eq 3", "size(value) = 3"),
    ("true()", "true"),
    ("@abc and @def", "(abc IS NOT NULL) AND (def IS NOT NULL)"),
    ("not(@x)", "(NOT ((x IS NOT NULL)))"),
    ("empty(@note) or string-length(@note) ge 3",
     "(note IS NULL) OR length(note) >= 3"),
    ("number(@price) * number(@qty) le 10000",
     "CAST(price AS DOUBLE) * CAST(qty AS DOUBLE) <= 10000"),
    ("$value idiv 10 eq 4", "value DIV 10 = 4"),
    ("upper-case($value) ne 'NULL'", "upper(value) <> 'NULL'"),
    ("ceiling($value) lt 5", "ceil(value) < 5"),
])
def test_translation(xpath, sql):
    assert translate_xpath_assert(xpath) == sql


@pytest.mark.parametrize("bad,what", [
    ("child/text()='foo'", "location-path"),
    ("count(./food[@type='fruit']) eq @fruits", "location-path"),
    ("//foods/recon", "location-path"),
    ("position()", "position"),
    ("last() > 1", "last"),
    ("let $foo := 'bar' return $foo", "tokenize|let"),
])
def test_untranslatable_rejected(bad, what):
    with pytest.raises(ValueError, match=what):
        translate_xpath_assert(bad)


# --------------------------------- round-trips through the engine
# (reference asserts from tests/test_cases + test_facets.py:1318-1386)

def _run(spark, spec, rows, schema):
    from xmlschema_spark.runner import validate
    df = spark.createDataFrame(rows, schema)
    return sorted((r.row_key, r.constraint)
                  for r in validate(df, spec).violations.collect())


def test_roundtrip_min_le_max(spark):
    """Reference: test="@min le @max" (xs:assert)."""
    from xmlschema_spark.specs import ColumnSpec, TableSpec
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("min", "int"), ColumnSpec("max", "int")],
        asserts=[xpath_assert_spec("minmax", "@min le @max")])
    got = _run(spark, spec, [("r1", 1, 5), ("r2", 7, 5)],
               "rid string, min int, max int")
    assert got == [("r2", "assert:minmax")]


def test_roundtrip_value_mod(spark):
    """Reference idiom: test="$value mod 2 = 0" (xs:assertion)."""
    from xmlschema_spark.specs import ColumnSpec, TableSpec
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("v", "int",
                            assertion=xpath_assertion("$value mod 2 = 0"))])
    got = _run(spark, spec, [("r1", "4"), ("r2", "7")],
               "rid string, v string")
    assert got == [("r2", "facet:assertion:v")]


def test_roundtrip_exclusive_attrs(spark):
    """Reference: test="(@abc and not(@def)) or (not(@abc) and @def)"
    — exactly one of two attributes present."""
    from xmlschema_spark.specs import ColumnSpec, TableSpec
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("abc"), ColumnSpec("def_")],
        asserts=[xpath_assert_spec(
            "xor", "(@abc and not(@def_)) or (not(@abc) and @def_)")])
    got = _run(spark, spec,
               [("r1", "x", None), ("r2", None, "y"),
                ("r3", "x", "y"), ("r4", None, None)],
               "rid string, abc string, def_ string")
    assert got == [("r3", "assert:xor"), ("r4", "assert:xor")]


def test_roundtrip_a_gt_300(spark):
    """Reference: test="@a > 300"."""
    from xmlschema_spark.specs import ColumnSpec, TableSpec
    spec = TableSpec(name="t", key_column="rid",
                     columns=[ColumnSpec("a", "int")],
                     asserts=[xpath_assert_spec("big", "@a > 300")])
    got = _run(spark, spec, [("r1", 400), ("r2", 100)],
               "rid string, a int")
    assert got == [("r2", "assert:big")]


def test_roundtrip_string_length(spark):
    """Reference idiom: test="string-length($value) < 80"."""
    from xmlschema_spark.specs import ColumnSpec, TableSpec
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec(
            "v", assertion=xpath_assertion(
                "string-length($value) ge 2 and "
                "starts-with($value, 'ID')"))])
    got = _run(spark, spec, [("r1", "ID99"), ("r2", "I"), ("r3", "XX9")],
               "rid string, v string")
    assert got == [("r2", "facet:assertion:v"),
                   ("r3", "facet:assertion:v")]


def test_roundtrip_count_list(spark):
    """Reference: test="count($value) eq 3" over an xs:list value."""
    from xmlschema_spark.specs import ColumnSpec, TableSpec
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("v", "array<string>",
                            assertion=xpath_assertion(
                                "count($value) eq 3"))])
    got = _run(spark, spec,
               [("r1", ["a", "b", "c"]), ("r2", ["a"])],
               "rid string, v array<string>")
    assert got == [("r2", "facet:assertion:v")]


def test_roundtrip_matches(spark):
    """XPath fn:matches with real anchors (XPath flavor, unlike XSD
    pattern facets where ^ $ are literals)."""
    from xmlschema_spark.specs import ColumnSpec, TableSpec
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("v", assertion=xpath_assertion(
            "matches($value, '^[A-Z]{2}[0-9]+$')"))])
    got = _run(spark, spec, [("r1", "AB12"), ("r2", "ab12")],
               "rid string, v string")
    assert got == [("r2", "facet:assertion:v")]


# ----------------------------- XPath 2.0 castable / conditional exprs

@pytest.mark.parametrize("xpath,sql", [
    ("$value castable as xs:integer",
     "(TRY_CAST(value AS BIGINT) IS NOT NULL)"),
    ("@price castable as xs:decimal",
     "(TRY_CAST(price AS DECIMAL(38,18)) IS NOT NULL)"),
    ("not($value castable as xs:date)",
     "(NOT ((TRY_CAST(value AS DATE) IS NOT NULL)))"),
    ("if (@unit = 'kg') then @w < 100 else @w < 1000",
     "(CASE WHEN unit = 'kg' THEN w < 100 ELSE w < 1000 END)"),
])
def test_castable_and_conditional(xpath, sql):
    assert translate_xpath_assert(xpath) == sql


def test_castable_unknown_type_rejected():
    with pytest.raises(ValueError, match="castable"):
        translate_xpath_assert("$value castable as xs:hexBinary")


def test_if_without_else_rejected():
    with pytest.raises(ValueError, match="without 'else'"):
        translate_xpath_assert("if (@a) then @b")


def test_roundtrip_castable(spark):
    """Idiom: test="$value castable as xs:date" as a simple-type
    assertion."""
    from xmlschema_spark.specs import ColumnSpec, TableSpec
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("v", assertion=xpath_assertion(
            "$value castable as xs:date"))])
    got = _run(spark, spec, [("r1", "2024-06-01"), ("r2", "not-a-date")],
               "rid string, v string")
    assert got == [("r2", "facet:assertion:v")]


def test_roundtrip_conditional(spark):
    """Idiom: test="if (@unit = 'kg') then @w le 100 else @w le 1000"
    (unit-dependent bound, the reference's type-alternative shape as a
    single assert)."""
    from xmlschema_spark.specs import ColumnSpec, TableSpec
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("unit"), ColumnSpec("w", "int")],
        asserts=[xpath_assert_spec(
            "wmax", "if (@unit = 'kg') then @w le 100 else @w le 1000")])
    got = _run(spark, spec,
               [("r1", "kg", 50), ("r2", "kg", 500),
                ("r3", "g", 500), ("r4", "g", 5000)],
               "rid string, unit string, w int")
    assert got == [("r2", "assert:wmax"), ("r4", "assert:wmax")]


# ---------------------------------------------------------------------------
# round 6: instance-of, quantified expressions, string-join

@pytest.mark.parametrize("xpath,sql", [
    ("$value instance of xs:integer",
     "(TRY_CAST(value AS BIGINT) IS NOT NULL)"),
    ("@w instance of xs:double and @w gt 0",
     "(TRY_CAST(w AS DOUBLE) IS NOT NULL) AND w > 0"),
    ("some $x in $value satisfies $x gt 5",
     "exists(value, x -> x > 5)"),
    ("every $x in @parts satisfies string-length($x) le 8",
     "forall(parts, x -> length(x) <= 8)"),
    ("every $t in @tags satisfies matches($t, '[a-z]+')",
     "forall(tags, t -> (t RLIKE '[a-z]+'))"),
    ("string-join($value, ',') ne ''",
     "array_join(value, ',') <> ''"),
])
def test_round6_translations(xpath, sql):
    assert translate_xpath_assert(xpath) == sql


@pytest.mark.parametrize("bad,msg", [
    ("some $x in $a, $y in $b satisfies $x", "multiple quantified"),
    ("some $x in $v satisfies", "empty sequence or predicate"),
    ("every $x in satisfies $x gt 1", "empty sequence or predicate"),
    ("$v instance of xs:QName", "instance of"),
])
def test_round6_rejections(bad, msg):
    with pytest.raises(ValueError, match=msg):
        translate_xpath_assert(bad)


def test_roundtrip_quantified(spark):
    """Idiom: test="every $p in $value satisfies $p ge 0" over an
    xs:list simple type (facets.py:836-894 assertion facet with a
    sequence-valued $value)."""
    from xmlschema_spark.specs import ColumnSpec, TableSpec
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("v", "array<int>",
                            assertion=xpath_assertion(
                                "every $p in $value satisfies $p ge 0"))])
    got = _run(spark, spec,
               [("r1", [1, 2, 3]), ("r2", [1, -2])],
               "rid string, v array<int>")
    assert got == [("r2", "facet:assertion:v")]


def test_roundtrip_instance_of(spark):
    """Idiom: test="$value instance of xs:integer" as a type guard on
    an untyped (string) column."""
    from xmlschema_spark.specs import ColumnSpec, TableSpec
    spec = TableSpec(
        name="t", key_column="rid",
        columns=[ColumnSpec("v", assertion=xpath_assertion(
            "$value instance of xs:integer"))])
    got = _run(spark, spec, [("r1", "42"), ("r2", "4.5")],
               "rid string, v string")
    assert got == [("r2", "facet:assertion:v")]
