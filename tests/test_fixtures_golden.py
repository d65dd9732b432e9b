"""Manifest-style golden tests: exact expected violation counts on the
dirty fixture — the tabular analog of the reference's testfiles manifest
("--errors=N", tests/test_cases/testfiles:15-26)."""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark import validate
from xmlschema_spark.sources.fixtures import (MOD, images_spec,
                                              make_captions_ref, make_images)

N = 20_000  # ~19.8 rows per defect selector


def _n(k):  # rows i in [0, N) with i % 1009 == k
    return len([i for i in range(N) if i % MOD == k])


@pytest.fixture(scope="module")
def dirty_violations(spark):
    df = make_images(spark, N, dirty=True).cache()
    refs = {"captions_ref": make_captions_ref(spark, N)}
    res = validate(df, images_spec(with_keyref=True), refs=refs)
    rows = res.violations.collect()
    by = {}
    for r in rows:
        by.setdefault(r.constraint, []).append(r)
    yield df, by, res
    df.unpersist()


def test_facet_counts(dirty_violations):
    _, by, _ = dirty_violations
    assert len(by["facet:minExclusive:w"]) == _n(1)   # w = -3
    assert len(by["facet:minExclusive:h"]) == _n(2)   # h = 0
    assert len(by["facet:enumeration:fmt"]) == _n(3)  # fmt = tiff
    assert len(by["facet:minLength:caption"]) == _n(4)
    assert len(by["facet:maxLength:caption"]) == _n(5)
    assert len(by["facet:pattern:image_id"]) == _n(6)


def test_unique_counts(dirty_violations):
    _, by, _ = dirty_violations
    # k==7 rows copy row i-1's id -> both rows in each pair flagged
    assert len(by["unique:image_id"]) == 2 * _n(7)
    # k==8 rows all share one constant phash -> all flagged, occurs = group size
    ph = by["unique:phash"]
    assert len(ph) == _n(8)
    assert all(r.occurs == _n(8) for r in ph)


def test_keyref_counts(dirty_violations):
    _, by, _ = dirty_violations
    # k==13 ids dropped from the ref table, plus the k==6 pattern-broken
    # ids which (correctly) also fail to resolve
    assert len(by["keyref:captions_ref"]) == _n(13) + _n(6)


def test_payload_counts(dirty_violations):
    _, by, _ = dirty_violations
    # k==9: re-encoded at (w+1, h) -> dims mismatch; plus the metadata
    # defects k in (1,2) necessarily break payload-dims consistency too
    assert len(by["payload:dims"]) == _n(9) + _n(1) + _n(2)
    assert len(by["payload:required"]) == _n(10)
    # k==12: over-quantized lossy -> PSNR below 40dB; k==7 dup-id rows
    # carry row i-2's id so the id-keyed reference pattern (correctly)
    # mismatches their actual pixels
    pix = by.get("payload:pixels", [])
    assert len(pix) == _n(12) + _n(7)
    # k==3 (fmt=tiff) re-encoded as png container -> fmt mismatch
    assert len(by["payload:fmt"]) == _n(3)


def test_assert_and_required(dirty_violations):
    _, by, _ = dirty_violations
    assert "assert:max_pixels" not in by          # no oversize in fixture
    assert len(by["required:caption"]) == 0 if "required:caption" in by else True


def test_verdicts_shape(dirty_violations):
    df, _, res = dirty_violations
    v = res.verdicts.collect()
    assert sum(r.n_rows for r in v) == N
    assert all(not r["pass"] for r in v)  # every 10k-part has defects


def test_clean_table_is_valid(spark):
    from xmlschema_spark import is_valid
    df = make_images(spark, 3000, dirty=False)
    refs = {"captions_ref": make_captions_ref(spark, 3000)}
    spec = images_spec(with_keyref=False)
    res = validate(df, spec)
    bad = res.violations.collect()
    assert bad == [], [((r.constraint, r.row_key, r.reason)) for r in bad[:5]]


def test_bytes_column_pruned_outside_payload_stage(spark, tmp_path):
    """Column pruning: non-payload stages must not read `bytes`
    (at 100TB the bytes column dominates I/O)."""
    import re
    p = str(tmp_path / "imgs")
    make_images(spark, 500, dirty=False).write.parquet(p)
    df = spark.read.parquet(p)
    spec = images_spec(with_payload=False)
    from xmlschema_spark import violations_frame
    plan_str = violations_frame(df, __import__("xmlschema_spark").compile_plan(spec)) \
        ._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: (struct<[^>]*>)", plan_str)
    assert schemas, "no parquet scan found in plan"
    assert all("bytes" not in s for s in schemas), schemas
