"""Manifest-driven golden corpus: one parametrized test consuming
tests/golden_cases.json — the analog of the reference's testfiles
manifest + test factory (/root/reference/tests/run_all_tests.py:29-41,
tests/test_cases/testfiles). Grow coverage by adding CASES to the JSON,
not test functions."""

import json
import os

import pytest

from xmlschema_spark.runner import validate
from xmlschema_spark.specs import TableSpec

_MANIFEST = os.path.join(os.path.dirname(__file__), "golden_cases.json")

with open(_MANIFEST) as _f:
    _CASES = json.load(_f)["cases"]


def test_manifest_is_big_enough():
    assert len(_CASES) >= 30


def test_manifest_names_unique():
    names = [c["name"] for c in _CASES]
    assert len(names) == len(set(names))


@pytest.mark.parametrize("case", _CASES, ids=lambda c: c["name"])
def test_golden_case(spark, case):
    df = spark.createDataFrame([tuple(r) for r in case["rows"]],
                               case["schema"])
    refs = {
        name: spark.createDataFrame([tuple(r) for r in t["rows"]],
                                    t["schema"])
        for name, t in case.get("refs", {}).items()
    }
    spec = TableSpec.from_dict(case["spec"])
    res = validate(df, spec, refs=refs or None)
    got = sorted((r.row_key, r.constraint)
                 for r in res.violations.collect())
    expect = sorted((rk, c) for rk, c in case["expect"])
    assert got == expect, f"{case['name']}: {got} != {expect}"
    res.unpersist()
