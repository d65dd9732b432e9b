#!/usr/bin/env python
"""Round-5 golden-manifest sweep: ports the case mass of the
reference's tests/validators/test_facets.py, test_simple_types.py and
the W3C-style regex inventory into tests/golden_cases.json (VERDICT r4
item 1: >=250 value cases). Idempotent: re-running replaces the
round-5 batch (names prefixed r5_)."""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
MANIFEST = os.path.join(HERE, "..", "tests", "golden_cases.json")

V = []       # value cases
E = []       # spec-error cases


def case(name, schema, rows, spec, expect):
    V.append({"name": f"r5_{name}", "schema": schema, "rows": rows,
              "spec": spec, "expect": expect})


def errcase(name, spec, match):
    E.append({"name": f"r5_{name}", "spec": spec, "match": match})


def col_spec(col, **kw):
    return {"name": "t", "key_column": "rid",
            "columns": [{"name": "v", **col, **kw}]}


# =====================================================================
# A. ordered-facet matrices across dtypes (test_facets.py:326-728:
#    min/max In/Exclusive accept/reject triples per base type)
# =====================================================================

_DTYPE_ROWS = {
    "int": ("9", "10", "11", "10"),
    "bigint": ("9", "10", "11", "10"),
    "double": ("9.5", "10.0", "10.5", "10"),
    "decimal(10,2)": ("9.50", "10.00", "10.50", "10"),
    "xsd:short": ("9", "10", "11", "10"),
    "xsd:unsignedByte": ("9", "10", "11", "10"),
    "xsd:date": ("2020-01-09", "2020-01-10", "2020-01-11", "2020-01-10"),
}
for dt, (below, equal, above, bound) in _DTYPE_ROWS.items():
    tag = dt.replace("xsd:", "x_").replace("(10,2)", "")
    rows = [["r1", below], ["r2", equal], ["r3", above]]
    case(f"minin_{tag}", "rid string, v string", rows,
         col_spec({"dtype": dt, "min_inclusive": bound}),
         [["r1", "facet:minInclusive:v"]])
    case(f"minex_{tag}", "rid string, v string", rows,
         col_spec({"dtype": dt, "min_exclusive": bound}),
         [["r1", "facet:minExclusive:v"], ["r2", "facet:minExclusive:v"]])
    case(f"maxin_{tag}", "rid string, v string", rows,
         col_spec({"dtype": dt, "max_inclusive": bound}),
         [["r3", "facet:maxInclusive:v"]])
    case(f"maxex_{tag}", "rid string, v string", rows,
         col_spec({"dtype": dt, "max_exclusive": bound}),
         [["r2", "facet:maxExclusive:v"], ["r3", "facet:maxExclusive:v"]])

# =====================================================================
# B. W3C-style regex sweep (facets.py:723-833 pattern facet; XSD pt.2
#    App F metacharacter list — ^ and $ are LITERALS)
# =====================================================================

def pat(name, patterns, good, bad):
    rows, expect = [], []
    i = 0
    for g in good:
        i += 1
        rows.append([f"r{i}", g])
    for b in bad:
        i += 1
        rows.append([f"r{i}", b])
        expect.append([f"r{i}", "facet:pattern:v"])
    case(f"pat_{name}", "rid string, v string", rows,
         col_spec({"pattern": patterns}), expect)


pat("caret_literal", ["a^b"], ["a^b"], ["ab", "a b"])
pat("dollar_literal", ["US$[0-9]+"], ["US$5", "US$500"], ["US5", "$5"])
pat("dollar_in_class", ["[$€][0-9]+"], ["$5", "€5"], ["5"])
pat("digit_class_subtraction", ["[\\d-[0-3]]+"], ["456", "999"],
    ["120", "4a"])
pat("nested_subtraction_deep", ["[a-z-[m-p-[o]]]+"], ["ao", "oz", "abc"],
    ["mn", "pa"])
pat("group_alternation_plus", ["(ab|cd)+"], ["ab", "abcd", "cdab"],
    ["abc", "ba"])
pat("quantifier_exact", ["a{3}"], ["aaa"], ["aa", "aaaa"])
pat("quantifier_open_min", ["a{2,}"], ["aa", "aaaa"], ["a", ""])
pat("escaped_braces", ["\\{[0-9]+\\}"], ["{42}"], ["42", "{42"])
pat("tab_escape", ["a\\tb"], ["a\tb"], ["a b", "atb"])
pat("word_space_escapes", ["\\w+\\s\\w+"], ["ab cd"], ["abcd"])
pat("nonspace_escape", ["\\S+"], ["abc", "a-b"], ["a b"])
pat("prop_nd_digits", ["\\p{Nd}+"], ["123", "١٢"], ["12a"])
pat("prop_lu_ll_word", ["\\p{Lu}\\p{Ll}+"], ["Hello"],
    ["hello", "HELLO"])
pat("prop_negated_letters", ["\\P{L}+"], ["123!", "++"], ["a1"])
pat("block_basic_latin", ["\\p{IsBasicLatin}+"], ["abc123"],
    ["αβ"])
pat("negated_namestart_escape", ["\\I+"], ["19", "5.5"], ["ab", "a1"])
pat("class_sign_escape", ["[\\-+]?[0-9]+"], ["-5", "+5", "5"], ["x5"])
pat("dot_any_not_anchored_out", ["a.c"], ["abc", "axc"], ["ac", "abbc"])
pat("optional_letter_u", ["colou?r"], ["color", "colour"],
    ["colouur", "colr"])
pat("negated_digit_class", ["[^0-9]+"], ["abc", "x-y"], ["a1", "1"])
pat("pipe_inside_class", ["[|;]"], ["|", ";"], [","])
pat("namechar_class_range", ["[\\c]+"], ["a.b-1", "x:y"], ["a b"])
pat("star_allows_empty", ["[0-9]*"], ["", "123"], ["a"])
pat("backslash_literal", ["a\\\\b"], ["a\\b"], ["ab", "a/b"])
pat("three_way_any_of", ["cat", "dog", "[0-9]+"], ["cat", "dog", "42"],
    ["cow", "cat42"])
pat("branch_empty_alternative", ["(a|)b"], ["ab", "b"], ["aab"])
pat("multichar_escape_in_class", ["[\\s,;]+"], [" ,;", "\t"], ["a,"])

# =====================================================================
# C. totalDigits / fractionDigits (facets.py:451-558;
#    test_facets.py:728-880)
# =====================================================================

case("td_boundary_exact", "rid string, v string",
     [["r1", "12.34"], ["r2", "123.45"], ["r3", "1234.5"]],
     col_spec({"dtype": "decimal(10,2)", "total_digits": 4}),
     [["r2", "facet:totalDigits:v"], ["r3", "facet:totalDigits:v"]])
case("td_ignores_sign_and_point", "rid string, v string",
     [["r1", "-99.99"], ["r2", "-999.99"]],
     col_spec({"dtype": "decimal(10,2)", "total_digits": 4}),
     [["r2", "facet:totalDigits:v"]])
case("fd_exact_boundary", "rid string, v string",
     [["r1", "1.23"], ["r2", "1.2"], ["r3", "1.234"]],
     col_spec({"dtype": "decimal(10,3)", "fraction_digits": 2}),
     [["r3", "facet:fractionDigits:v"]])
case("fd_zero_integer_valued", "rid string, v string",
     [["r1", "5"], ["r2", "5.0"], ["r3", "5.1"]],
     col_spec({"dtype": "decimal(10,2)", "fraction_digits": 0}),
     [["r3", "facet:fractionDigits:v"]])
case("td_on_int_column", "rid string, v string",
     [["r1", "999"], ["r2", "-999"], ["r3", "1000"]],
     col_spec({"dtype": "int", "total_digits": 3}),
     [["r3", "facet:totalDigits:v"]])
case("td_and_fd_combined", "rid string, v string",
     [["r1", "123.4"], ["r2", "12.34"], ["r3", "1234.5"]],
     col_spec({"dtype": "decimal(10,2)", "total_digits": 4,
               "fraction_digits": 1}),
     [["r2", "facet:fractionDigits:v"], ["r3", "facet:totalDigits:v"]])
case("td_one_allows_single_digit", "rid string, v string",
     [["r1", "7"], ["r2", "-7"], ["r3", "77"]],
     col_spec({"dtype": "int", "total_digits": 1}),
     [["r3", "facet:totalDigits:v"]])
case("fd_canonical_trailing_zeros_ok", "rid string, v string",
     [["r1", "1.100"], ["r2", "1.120"], ["r3", "1.123"]],
     col_spec({"dtype": "decimal(10,3)", "fraction_digits": 2}),
     [["r3", "facet:fractionDigits:v"]])

# =====================================================================
# D. lexical lists (simple_types.py:991-1019; test_facets.py:1147-1183
#    restriction on list)
# =====================================================================

case("list_min_items", "rid string, v string",
     [["r1", "a b"], ["r2", "a"], ["r3", "a b c"]],
     col_spec({"lexical_list": True, "min_length": 2,
               "item": {"name": "v"}}),
     [["r2", "facet:minLength:v"]])
case("list_exact_items", "rid string, v string",
     [["r1", "a b c"], ["r2", "a b"], ["r3", "a b c d"]],
     col_spec({"lexical_list": True, "length": 3,
               "item": {"name": "v"}}),
     [["r2", "facet:length:v"], ["r3", "facet:length:v"]])
case("list_max_items", "rid string, v string",
     [["r1", "a"], ["r2", "a b c"]],
     col_spec({"lexical_list": True, "max_length": 2,
               "item": {"name": "v"}}),
     [["r2", "facet:maxLength:v"]])
case("list_item_double_bounds", "rid string, v string",
     [["r1", "1.5 2.5"], ["r2", "1.5 -2.0"]],
     col_spec({"lexical_list": True,
               "item": {"name": "v", "dtype": "double",
                        "min_inclusive": 0}}),
     [["r2", "facet:item:minInclusive:v"]])
case("list_item_boolean_lexical", "rid string, v string",
     [["r1", "true 0 1"], ["r2", "true TRUE"]],
     col_spec({"lexical_list": True,
               "item": {"name": "v", "dtype": "xsd:boolean"}}),
     [["r2", "facet:item:decode:v"]])
case("list_item_decimal_no_exponent", "rid string, v string",
     [["r1", "1.5 2"], ["r2", "1.5 1e2"]],
     col_spec({"lexical_list": True,
               "item": {"name": "v", "dtype": "xsd:decimal"}}),
     [["r2", "facet:item:decode:v"]])
case("list_item_double_inf_nan", "rid string, v string",
     [["r1", "INF -INF NaN 1e3"], ["r2", "Infinity"]],
     col_spec({"lexical_list": True,
               "item": {"name": "v", "dtype": "xsd:double"}}),
     [["r2", "facet:item:decode:v"]])
case("list_item_pattern_and_maxlen", "rid string, v string",
     [["r1", "ab cd"], ["r2", "ab cde"], ["r3", "ab c1"]],
     col_spec({"lexical_list": True,
               "item": {"name": "v", "pattern": ["[a-z]+"],
                        "max_length": 2}}),
     [["r2", "facet:item:maxLength:v"], ["r3", "facet:item:pattern:v"]])
case("list_collapse_multi_space", "rid string, v string",
     [["r1", "  a   b  "], ["r2", "a"]],
     col_spec({"lexical_list": True, "min_length": 2,
               "item": {"name": "v"}}),
     [["r2", "facet:minLength:v"]])
case("list_item_date_ordered", "rid string, v string",
     [["r1", "2020-01-01 2020-06-01"], ["r2", "2020-01-01 2019-01-01"]],
     col_spec({"lexical_list": True,
               "item": {"name": "v", "dtype": "xsd:date",
                        "min_inclusive": "2020-01-01"}}),
     [["r2", "facet:item:minInclusive:v"]])

# =====================================================================
# E. temporal / explicitTimezone (facets.py:561-603;
#    test_facets.py:1226-1318)
# =====================================================================

case("datetime_tz_required", "rid string, v string",
     [["r1", "2020-01-01T00:00:00Z"], ["r2", "2020-01-01T00:00:00"],
      ["r3", "2020-01-01T00:00:00+05:30"]],
     col_spec({"dtype": "xsd:dateTime", "explicit_timezone": "required"}),
     [["r2", "facet:explicitTimezone:v"]])
case("datetime_tz_prohibited", "rid string, v string",
     [["r1", "2020-01-01T00:00:00"], ["r2", "2020-01-01T00:00:00Z"]],
     col_spec({"dtype": "xsd:dateTime",
               "explicit_timezone": "prohibited"}),
     [["r2", "facet:explicitTimezone:v"]])
case("datetime_feb29_nonleap", "rid string, v string",
     [["r1", "2020-02-29T00:00:00"], ["r2", "2021-02-29T00:00:00"]],
     col_spec({"dtype": "xsd:dateTime"}),
     [["r2", "facet:pattern:v"]])
case("date_tz_range_edges", "rid string, v string",
     [["r1", "2020-01-01+14:00"], ["r2", "2020-01-01-14:00"],
      ["r3", "2020-01-01+15:00"]],
     col_spec({"dtype": "xsd:date"}),
     [["r3", "facet:pattern:v"]])
case("gyearmonth_ordered", "rid string, v string",
     [["r1", "2020-07"], ["r2", "2020-05"]],
     col_spec({"dtype": "xsd:gYearMonth", "min_inclusive": "2020-06"}),
     [["r2", "facet:minInclusive:v"]])
case("gday_lexical", "rid string, v string",
     [["r1", "---31"], ["r2", "---32"], ["r3", "--31"]],
     col_spec({"dtype": "xsd:gDay"}),
     [["r2", "facet:pattern:v"], ["r3", "facet:pattern:v"]])
case("time_fractional_exclusive", "rid string, v string",
     [["r1", "12:00:00.501"], ["r2", "12:00:00.50"]],
     col_spec({"dtype": "xsd:time", "min_exclusive": "12:00:00.5"}),
     [["r2", "facet:minExclusive:v"]])
case("duration_incomparable_passes_max", "rid string, v string",
     [["r1", "P30D"], ["r2", "P2M"]],
     col_spec({"dtype": "xsd:duration", "max_exclusive": "P1M"}),
     [["r2", "facet:maxExclusive:v"]])
case("gyear_negative_ordered", "rid string, v string",
     [["r1", "-0044"], ["r2", "0100"]],
     col_spec({"dtype": "xsd:gYear", "max_inclusive": "0050"}),
     [["r2", "facet:maxInclusive:v"]])
case("date_month_day_range_decode", "rid string, v string",
     [["r1", "2020-12-31"], ["r2", "2020-13-01"], ["r3", "2020-04-31"]],
     col_spec({"dtype": "xsd:date"}),
     [["r2", "facet:pattern:v"], ["r3", "facet:pattern:v"]])

# =====================================================================
# F. simple-type assertions (facets.py:836-894; test_facets.py:1318-86)
# =====================================================================

case("assert_mod_even", "rid string, v string",
     [["r1", "4"], ["r2", "7"]],
     col_spec({"dtype": "int", "assertion": "value % 2 = 0"}),
     [["r2", "facet:assertion:v"]])
case("assert_length_fn", "rid string, v string",
     [["r1", "short"], ["r2", "a much longer value"]],
     col_spec({"assertion": "length(value) <= 5"}),
     [["r2", "facet:assertion:v"]])
case("assert_case_when", "rid string, v string",
     [["r1", "5"], ["r2", "-5"]],
     col_spec({"dtype": "int",
               "assertion":
                   "CASE WHEN value < 0 THEN false ELSE true END"}),
     [["r2", "facet:assertion:v"]])
case("assert_extract_year", "rid string, v string",
     [["r1", "2024-06-01 10:00:00"], ["r2", "1999-01-01 00:00:00"]],
     col_spec({"dtype": "timestamp",
               "assertion": "extract(year from value) >= 2000"}),
     [["r2", "facet:assertion:v"]])
case("assert_between", "rid string, v string",
     [["r1", "5"], ["r2", "15"]],
     col_spec({"dtype": "int", "assertion": "value BETWEEN 0 AND 10"}),
     [["r2", "facet:assertion:v"]])
case("assert_startswith", "rid string, v string",
     [["r1", "ID-001"], ["r2", "XX-001"]],
     col_spec({"assertion": "startswith(value, 'ID-')"}),
     [["r2", "facet:assertion:v"]])

# =====================================================================
# G. misc facet interactions (whitespace, enum, fixed, decode)
# =====================================================================

case("ws_replace_newline_then_pattern", "rid string, v string",
     [["r1", "a\nb"], ["r2", "ab"]],
     col_spec({"whitespace": "replace", "pattern": ["a b"]}),
     [["r2", "facet:pattern:v"]])
case("ws_collapse_then_enum_exact", "rid string, v string",
     [["r1", "  a \t  b "], ["r2", "a  c"]],
     col_spec({"whitespace": "collapse", "enum": ["a b"]}),
     [["r2", "facet:enumeration:v"]])
case("empty_string_is_not_null", "rid string, v string",
     [["r1", ""], ["r2", None]],
     col_spec({"nullable": False, "pattern": ["[a-z]+"]}),
     [["r1", "facet:pattern:v"], ["r2", "required:v"]])
case("enum_negative_zero_double", "rid string, v string",
     [["r1", "-0.0"], ["r2", "0"], ["r3", "1"]],
     col_spec({"dtype": "double", "enum": [0]}),
     [["r3", "facet:enumeration:v"]])
case("hexbinary_mixed_case", "rid string, v string",
     [["r1", "0aFF"], ["r2", "0aFG"]],
     col_spec({"dtype": "xsd:hexBinary"}),
     [["r2", "facet:decode:v"]])
case("fixed_date_value", "rid string, v string",
     [["r1", "2020-01-01"], ["r2", "2020-01-02"]],
     col_spec({"dtype": "date", "fixed": "2020-01-01"}),
     [["r2", "facet:fixed:v"]])
case("fixed_after_collapse", "rid string, v string",
     [["r1", "  x "], ["r2", "y"]],
     col_spec({"whitespace": "collapse", "fixed": "x"}),
     [["r2", "facet:fixed:v"]])
case("decode_date_bad_month", "rid string, v string",
     [["r1", "2020-06-01"], ["r2", "2020-13-01"]],
     col_spec({"dtype": "date"}),
     [["r2", "facet:decode:v"]])
case("min_length_boundary_exact", "rid string, v string",
     [["r1", "abc"], ["r2", "ab"]],
     col_spec({"min_length": 3}),
     [["r2", "facet:minLength:v"]])
case("max_length_boundary_exact", "rid string, v string",
     [["r1", "abc"], ["r2", "abcd"]],
     col_spec({"max_length": 3}),
     [["r2", "facet:maxLength:v"]])
case("union_three_members", "rid string, v string",
     [["r1", "42"], ["r2", "2020-01-01"], ["r3", "tok"], ["r4", "--"]],
     col_spec({"union_members": [
         {"name": "m1", "dtype": "int"},
         {"name": "m2", "dtype": "xsd:date"},
         {"name": "m3", "pattern": ["[a-z]+"]}]}),
     [["r4", "facet:union:v"]])
case("bool_enum_value_space", "rid string, v string",
     [["r1", "1"], ["r2", "true"], ["r3", "false"]],
     col_spec({"dtype": "xsd:boolean", "enum": [True]}),
     [["r3", "facet:enumeration:v"]])

# =====================================================================
# H. restriction-derivation value cases (plans/restriction.py;
#    reference XsdAtomicRestriction flattening semantics)
# =====================================================================

def rcase(name, types, col, rows, expect, schema="rid string, v string"):
    spec = {"name": "t", "key_column": "rid", "simple_types": types,
            "columns": [{"name": "v", **col}]}
    case(f"rstr_{name}", schema, rows, spec, expect)


rcase("pattern_and_two_steps",
      {"lower": {"pattern": ["[a-z]+"]}},
      {"base": "lower", "pattern": [".{2,4}"]},
      [["r1", "abc"], ["r2", "Abc"], ["r3", "abcdef"]],
      [["r2", "facet:pattern:v"], ["r3", "facet:pattern:v"]])
rcase("bounds_chain_three_levels",
      {"nonneg": {"dtype": "int", "min_inclusive": 0},
       "pct": {"base": "nonneg", "max_inclusive": 100}},
      {"base": "pct", "min_inclusive": 10},
      [["r1", "50"], ["r2", "5"], ["r3", "150"]],
      [["r2", "facet:minInclusive:v"], ["r3", "facet:maxInclusive:v"]])
rcase("ws_inherited_from_base",
      {"collapsed": {"whitespace": "collapse"}},
      {"base": "collapsed", "length": 3},
      [["r1", "  a b "], ["r2", "abcd"]],
      [["r2", "facet:length:v"]])
rcase("enum_subset",
      {"animal": {"enum": ["cat", "dog", "fox"]}},
      {"base": "animal", "enum": ["cat", "dog"]},
      [["r1", "cat"], ["r2", "fox"]],
      [["r2", "facet:enumeration:v"]])
rcase("assertion_conjoined",
      {"even": {"dtype": "int", "assertion": "value % 2 = 0"}},
      {"base": "even", "assertion": "value > 10"},
      [["r1", "12"], ["r2", "8"], ["r3", "13"]],
      [["r2", "facet:assertion:v"], ["r3", "facet:assertion:v"]])
rcase("decimal_dtype_inherited",
      {"price": {"dtype": "decimal(10,2)", "min_inclusive": 0}},
      {"base": "price", "max_inclusive": 100},
      [["r1", "99.99"], ["r2", "-0.01"], ["r3", "100.01"]],
      [["r2", "facet:minInclusive:v"], ["r3", "facet:maxInclusive:v"]])
rcase("xsd_date_base_with_bounds",
      {"modern": {"dtype": "xsd:date", "min_inclusive": "2000-01-01"}},
      {"base": "modern", "max_exclusive": "2030-01-01"},
      [["r1", "2020-06-15"], ["r2", "1999-12-31"], ["r3", "2030-01-01"]],
      [["r2", "facet:minInclusive:v"], ["r3", "facet:maxExclusive:v"]])
rcase("deep_chain_four_levels",
      {"t1": {"pattern": ["[a-z0-9]+"]},
       "t2": {"base": "t1", "max_length": 8},
       "t3": {"base": "t2", "min_length": 3}},
      {"base": "t3", "pattern": ["[a-z]+[0-9]"]},
      [["r1", "abc1"], ["r2", "ab"], ["r3", "abcdefgh9"],
       ["r4", "abc"], ["r5", "ABC1"]],
      [["r2", "facet:minLength:v"], ["r2", "facet:pattern:v"],
       ["r3", "facet:maxLength:v"],
       ["r4", "facet:pattern:v"], ["r5", "facet:pattern:v"]])
rcase("explicit_tz_added_in_derived",
      {"anytime": {"dtype": "xsd:time"}},
      {"base": "anytime", "explicit_timezone": "required"},
      [["r1", "12:00:00Z"], ["r2", "12:00:00"]],
      [["r2", "facet:explicitTimezone:v"]])
rcase("fixed_inherited",
      {"unit": {"fixed": "EA"}},
      {"base": "unit"},
      [["r1", "EA"], ["r2", "KG"]],
      [["r2", "facet:fixed:v"]])
rcase("min_length_plus_base_pattern",
      {"alpha": {"pattern": ["[A-Za-z]+"]}},
      {"base": "alpha", "min_length": 4},
      [["r1", "abcd"], ["r2", "abc"], ["r3", "ab1c"]],
      [["r2", "facet:minLength:v"], ["r3", "facet:pattern:v"]])
rcase("union_member_uses_named_base",
      {"small": {"dtype": "int", "max_inclusive": 9}},
      {"union_members": [{"name": "m1", "base": "small"},
                         {"name": "m2", "pattern": ["[a-z]+"]}]},
      [["r1", "5"], ["r2", "abc"], ["r3", "42"]],
      [["r3", "facet:union:v"]])
rcase("list_item_named_base",
      {"digit2": {"pattern": ["[0-9]{2}"]}},
      {"lexical_list": True, "item": {"name": "v", "base": "digit2"}},
      [["r1", "12 34"], ["r2", "12 345"]],
      [["r2", "facet:item:pattern:v"]])
rcase("derived_nullable_tightens",
      {"req": {"nullable": False}},
      {"base": "req"},
      [["r1", "x"], ["r2", None]],
      [["r2", "required:v"]])
rcase("item_base_pattern_groups",
      {"hexish": {"pattern": ["[0-9a-f]+"]},
       "hex2": {"base": "hexish", "pattern": [".{2}"]}},
      {"lexical_list": True, "item": {"name": "v", "base": "hex2"}},
      [["r1", "ab 0f"], ["r2", "ab 0Q"], ["r3", "ab 0ff"]],
      [["r2", "facet:item:pattern:v"], ["r3", "facet:item:pattern:v"]])
rcase("conditional_column_named_base",
      {"pos": {"dtype": "int", "min_exclusive": 0}},
      {},
      [["r1", "kg", "5"], ["r2", "kg", "0"], ["r3", "ea", "0"]],
      [["r2", "cond:kg_rules:facet:minExclusive:w"]],
      schema="rid string, k string, w string")
# conditional case needs custom spec shape: rebuild it
V[-1]["spec"] = {
    "name": "t", "key_column": "rid",
    "simple_types": {"pos": {"dtype": "int", "min_exclusive": 0}},
    "columns": [{"name": "k"}],
    "conditionals": [{"name": "kg_rules", "when": "k = 'kg'",
                      "columns": [{"name": "w", "base": "pos"}]}],
}

# =====================================================================
# I. derivation spec-error cases (facets.py restriction matrices —
#    test_facets.py:357-526 valid/invalid derivation sweeps)
# =====================================================================

def _types_err(name, types, col, match):
    errcase(name, {"name": "t", "key_column": "rid",
                   "simple_types": types,
                   "columns": [{"name": "v", **col}]}, match)


_types_err("rstr_minin_below_base_minin",
           {"b": {"dtype": "int", "min_inclusive": 1}},
           {"base": "b", "min_inclusive": 0}, "value must be >= 1")
_types_err("rstr_minin_below_base_minex",
           {"b": {"dtype": "int", "min_exclusive": 1}},
           {"base": "b", "min_inclusive": 0}, "value must be > 1")
_types_err("rstr_minin_above_base_maxin",
           {"b": {"dtype": "int", "max_inclusive": -1}},
           {"base": "b", "min_inclusive": 0}, "value must be <= -1")
_types_err("rstr_minin_at_base_maxex",
           {"b": {"dtype": "int", "max_exclusive": 0}},
           {"base": "b", "min_inclusive": 0}, "also the maximum")
_types_err("rstr_minex_at_base_maxin",
           {"b": {"dtype": "int", "max_inclusive": 0}},
           {"base": "b", "min_exclusive": 0}, "also the maximum")
_types_err("rstr_minex_below_base_minin",
           {"b": {"dtype": "int", "min_inclusive": 1}},
           {"base": "b", "min_exclusive": 0}, "value must be >= 1")
_types_err("rstr_maxin_above_base_maxex",
           {"b": {"dtype": "int", "max_exclusive": 10}},
           {"base": "b", "max_inclusive": 10}, "value must be < 10")
_types_err("rstr_len_differs",
           {"b": {"length": 8}},
           {"base": "b", "length": 12},
           r"base facet has a different length \(8\)")
_types_err("rstr_minlen_down",
           {"b": {"min_length": 40}},
           {"base": "b", "min_length": 30}, "greater min length")
_types_err("rstr_maxlen_up",
           {"b": {"max_length": 30}},
           {"base": "b", "max_length": 40}, "lesser max length")
_types_err("rstr_ws_collapse_to_replace",
           {"b": {"whitespace": "collapse"}},
           {"base": "b", "whitespace": "replace"}, "only 'collapse'")
_types_err("rstr_ws_replace_to_preserve",
           {"b": {"whitespace": "replace"}},
           {"base": "b", "whitespace": "preserve"},
           "'replace' or 'collapse'")
_types_err("rstr_enum_not_subset",
           {"b": {"enum": ["cat", "dog"]}},
           {"base": "b", "enum": ["cow"]},
           "invalid restriction from 'cow'")
_types_err("rstr_td_up",
           {"b": {"dtype": "decimal(10,2)", "total_digits": 4}},
           {"base": "b", "total_digits": 6},
           r"base value is lower \(4\)")
_types_err("rstr_fd_up",
           {"b": {"dtype": "decimal(10,2)", "fraction_digits": 1}},
           {"base": "b", "fraction_digits": 2},
           r"base value is lower \(1\)")
_types_err("rstr_dtype_change",
           {"b": {"dtype": "decimal(10,2)"}},
           {"base": "b", "dtype": "int"}, "cannot change the base type")
_types_err("rstr_unknown_base", {}, {"base": "nope"},
           "unknown base simple type")
errcase("rstr_circular",
        {"name": "t", "key_column": "rid",
         "simple_types": {"a": {"base": "b"}, "b": {"base": "a"}},
         "columns": [{"name": "v", "base": "a"}]},
        "circular base type reference")
_types_err("rstr_tz_required_to_prohibited",
           {"b": {"dtype": "xsd:time", "explicit_timezone": "required"}},
           {"base": "b", "explicit_timezone": "prohibited"},
           "explicitTimezone")
_types_err("rstr_fixed_change",
           {"b": {"fixed": "EA"}},
           {"base": "b", "fixed": "KG"}, "fixed value")


# =====================================================================
# J. content models (plans/content_model.py — reference
#    tests/validators/test_models.py / test_groups.py case shapes)
# =====================================================================

def cmcase(name, model, rows, bad, decl="array<string>", lexical=False,
           tag_field=None, upa=True):
    cm = {"name": "m", "column": "v", "model": model}
    if lexical:
        cm["lexical"] = True
    if tag_field:
        cm["tag_field"] = tag_field
    if not upa:
        cm["check_upa"] = False
    case(f"cm_{name}", f"rid string, v {decl}", rows,
         {"name": "t", "key_column": "rid", "content_models": [cm]},
         [[r, "content:m:v"] for r in bad])


def _e(n, lo=1, hi=1):
    return {"kind": "element", "name": n, "min_occurs": lo,
            "max_occurs": hi}


cmcase("sequence_order",
       {"kind": "sequence", "children": [_e("h"), _e("b", 1, None)]},
       [["r1", ["h", "b", "b"]], ["r2", ["b", "h"]], ["r3", ["h"]]],
       ["r2", "r3"])
cmcase("choice_band",
       {"kind": "choice", "children": [_e("a"), _e("b")],
        "min_occurs": 1, "max_occurs": 2},
       [["r1", ["a", "b"]], ["r2", ["b"]], ["r3", ["a", "b", "a"]],
        ["r4", ["c"]]],
       ["r3", "r4"])
cmcase("optional_then_any",
       {"kind": "sequence", "children": [
           _e("meta", 0, 1),
           {"kind": "any", "min_occurs": 1, "max_occurs": 2}]},
       [["r1", ["meta", "x"]], ["r2", ["x", "y"]],
        ["r3", ["meta", "x", "y", "z"]]],
       ["r3"], upa=False)   # wildcard overlaps the optional element —
#        XSD-nondeterministic by design; UPA opt-out exercises the flag
cmcase("all_group",
       {"kind": "all", "children": [_e("t"), _e("y", 0, 1)]},
       [["r1", ["y", "t"]], ["r2", ["t"]], ["r3", ["t", "y", "y"]],
        ["r4", ["y"]]],
       ["r3", "r4"])
cmcase("struct_tags",
       {"kind": "sequence", "children": [_e("h"), _e("p", 0, None)]},
       [["r1", [["h", 1], ["p", 2]]], ["r2", [["p", 9]]]],
       ["r2"], decl="array<struct<tag:string,n:int>>", tag_field="tag")
cmcase("lexical_tags",
       {"kind": "sequence", "children": [
           {"kind": "choice", "children": [_e("key"), _e("row")]},
           {"kind": "any", "min_occurs": 0, "max_occurs": None}]},
       [["r1", "key a b"], ["r2", " row "], ["r3", "a key"]],
       ["r3"], decl="string", lexical=True)
cmcase("nested_choice_in_sequence",
       {"kind": "sequence", "children": [
           _e("open"),
           {"kind": "choice", "min_occurs": 2, "max_occurs": None,
            "children": [
                _e("a"),
                {"kind": "sequence", "children": [_e("b"), _e("c")]}]},
           _e("close")]},
       [["r1", ["open", "a", "b", "c", "close"]],
        ["r2", ["open", "a", "close"]],
        ["r3", ["open", "b", "c", "b", "c", "close"]],
        ["r4", ["open", "b", "close"]]],
       ["r2", "r4"])
cmcase("null_skipped_empty_checked",
       {"kind": "sequence", "children": [_e("a", 1, None)]},
       [["r1", ["a"]], ["r2", None], ["r3", []]],
       ["r3"])

errcase("cm_occurs_inverted",
        {"name": "t", "key_column": "rid", "content_models": [
            {"name": "m", "column": "v",
             "model": _e("a", 3, 2)}]},
        "minOccurs must be lesser or equal than maxOccurs")
errcase("cm_all_nested",
        {"name": "t", "key_column": "rid", "content_models": [
            {"name": "m", "column": "v",
             "model": {"kind": "sequence", "children": [
                 {"kind": "all", "children": [_e("a")]}]}}]},
        "cannot be nested")
errcase("cm_all_maxoccurs",
        {"name": "t", "key_column": "rid", "content_models": [
            {"name": "m", "column": "v",
             "model": {"kind": "all", "max_occurs": 3,
                       "children": [_e("a")]}}]},
        "maxOccurs must be 1 for 'all'")
errcase("cm_empty_group",
        {"name": "t", "key_column": "rid", "content_models": [
            {"name": "m", "column": "v",
             "model": {"kind": "choice"}}]},
        "empty 'choice' model group")
# reference test_facets.py:1147-1183 (issue 396): a LIST type with item
# length facets, restricted with LIST-level size facets via derivation
rcase("restriction_on_list_issue396",
      {"words56": {"lexical_list": True,
                   "item": {"name": "words56", "min_length": 5,
                            "max_length": 6}}},
      {"base": "words56", "min_length": 1, "max_length": 6},
      [["r1", "abcde"], ["r2", "abcdef"], ["r3", "abcd"],
       ["r4", "abcdefg"], ["r5", "     "],
       ["r6", "abcde abcde abcde abcde abcde abcde"],
       ["r7", "abcde abcde abcde abcde abcd abcde"],
       ["r8", "abcde abcde abcde abcde abcde abcde abcde"]],
      [["r3", "facet:item:minLength:v"],
       ["r4", "facet:item:maxLength:v"],
       ["r5", "facet:minLength:v"],
       ["r7", "facet:item:minLength:v"],
       ["r8", "facet:maxLength:v"]])

errcase("cm_upa_optional_then_same",
        {"name": "t", "key_column": "rid", "content_models": [
            {"name": "m", "column": "v",
             "model": {"kind": "sequence", "children": [
                 _e("a", 0, 1), _e("a")]}}]},
        "Unique Particle Attribution violation")
errcase("cm_upa_wildcard_overlap",
        {"name": "t", "key_column": "rid", "content_models": [
            {"name": "m", "column": "v",
             "model": {"kind": "sequence", "children": [
                 {"kind": "choice", "min_occurs": 1,
                  "max_occurs": None,
                  "children": [_e("x"), _e("y")]},
                 {"kind": "any", "min_occurs": 0, "max_occurs": 1}]}}]},
        "Unique Particle Attribution violation")


def main():
    with open(MANIFEST) as f:
        m = json.load(f)
    m["cases"] = [c for c in m["cases"]
                  if not c["name"].startswith("r5_")] + V
    m["spec_error_cases"] = [c for c in m["spec_error_cases"]
                             if not c["name"].startswith("r5_")] + E
    with open(MANIFEST, "w") as f:
        json.dump(m, f, indent=1, ensure_ascii=False)
        f.write("\n")
    print(f"value cases: {len(m['cases'])} "
          f"(+{len(V)} r5), spec errors: {len(m['spec_error_cases'])} "
          f"(+{len(E)} r5)")


if __name__ == "__main__":
    main()
