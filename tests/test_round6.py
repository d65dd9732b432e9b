"""Round-6 tests: remote-URI-safe fingerprint-store location check,
survivor-scratch retention (prune_survivors), quoteattr'd element
names in the XSD exporter."""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.operators.dedup import (_normalize_store_locs,
                                             incremental_deduplicate,
                                             prune_survivors)


def _inc(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


# --------------------------------------- store-location normalization

def test_store_loc_local_paths_absolutized():
    got, want = _normalize_store_locs("file:/tmp/s", "/tmp/s/")
    assert got == want == "/tmp/s"


def test_store_loc_remote_uri_not_mangled_by_abspath():
    """hdfs:// and s3a:// store paths must compare as URIs — abspath
    would prepend the cwd and raise a spurious collision error on the
    documented 10^12-row remote-store configuration."""
    got, want = _normalize_store_locs("hdfs://nn:8020/warehouse/fps/",
                                      "hdfs://nn:8020/warehouse/fps")
    assert got == want == "hdfs://nn:8020/warehouse/fps"
    got, want = _normalize_store_locs("s3a://bucket/fps",
                                      "s3a://other/fps")
    assert got != want          # real mismatch still detected


def test_store_loc_mismatch_detected():
    got, want = _normalize_store_locs("file:/tmp/a", "/tmp/b")
    assert got != want


def test_fp_store_accepts_file_uri(spark, tmp_path):
    """A file:// store_path round-trips through the bucketed-table
    location check (catalog reports file:/abs)."""
    store = f"file://{tmp_path}/ustore"
    s = incremental_deduplicate(
        _inc(spark, [("a", "x")]), "text", "doc_id", store,
        run_id="r1", store_buckets=2)
    assert [r.doc_id for r in s.collect()] == ["a"]


# --------------------------------------------- survivor retention

def test_prune_survivors_keeps_inflight_runs(spark, tmp_path):
    """_survivors/run=<id> is caller scratch: pruning deletes consumed
    runs, keeps the ones named, and never touches the run=<id>
    fingerprint partitions (the store itself)."""
    store = str(tmp_path / "fps")
    incremental_deduplicate(_inc(spark, [("a", "one")]),
                            "text", "doc_id", store, run_id="r1").count()
    incremental_deduplicate(_inc(spark, [("b", "two")]),
                            "text", "doc_id", store, run_id="r2").count()
    deleted = prune_survivors(spark, store, keep_run_ids=["r2"])
    assert deleted == ["r1"]
    surv = tmp_path / "fps" / "_survivors"
    assert not (surv / "run=r1").exists()
    assert (surv / "run=r2").is_dir()
    # fingerprint partitions untouched: a duplicate of run r1's doc is
    # still excluded
    s = incremental_deduplicate(_inc(spark, [("c", "one")]),
                                "text", "doc_id", store, run_id="r3")
    assert s.count() == 0
    # idempotent on an already-pruned (or absent) tree
    assert prune_survivors(spark, str(tmp_path / "nostore")) == []


# --------------------------------------------- phash recompute check

def test_phash_exact_mode_dirty_fixture_counts(spark):
    """check_phash=True (exact mode) on the dirty fixture: the stored
    phash is the stable content hash of the ORIGINAL pixels, so a
    mismatch means the payload no longer carries the content the
    metadata describes. Only lossless containers are recomputable
    bit-exactly; the dirty generator's phash-breaking rows are
    k in {8 wrong-constant, 9 re-encoded-at-wrong-dims, 12 perturbed}
    and only their png-container instances flag."""
    from xmlschema_spark import validate
    from xmlschema_spark.sources.fixtures import (FMTS, MOD, images_spec,
                                                  make_images)
    n = 2000
    imgs = make_images(spark, n, dirty=True)
    res = validate(imgs, images_spec(with_keyref=False, check_phash=True))
    got = {r["constraint"]: r["cnt"] for r in
           res.violations.groupBy("constraint").agg(
               F.count("*").alias("cnt")).collect()}
    expected = sum(1 for i in range(n)
                   if i % MOD in (8, 9, 12) and FMTS[i % 3] == "png")
    assert expected == 2            # i=1018 (k=9), i=1021 (k=12)
    assert got.get("payload:phash", 0) == expected
    res.unpersist()


def test_phash_exact_skips_lossy_and_flags_lossless(spark):
    from xmlschema_spark import fakecodec
    from xmlschema_spark.operators.payload import payload_violations
    from xmlschema_spark.specs import PayloadSpec

    px = fakecodec.gen_pixels(7, 24, 16)
    rows = [
        # png, correct content hash -> clean
        ("ok", fakecodec.encode(px, "png"), 24, 16, "png",
         fakecodec.stable_hash64(px)),
        # png, wrong hash -> payload:phash
        ("bad", fakecodec.encode(px, "png"), 24, 16, "png",
         fakecodec.stable_hash64(px) ^ 1),
        # jpeg (lossy), hash of the ORIGINAL pixels: decode is
        # quantized, exact parity is undefined -> skipped, not flagged
        ("lossy", fakecodec.encode(px, "jpeg"), 24, 16, "jpeg",
         fakecodec.stable_hash64(px)),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, "
              "fmt string, phash long")
    spec = PayloadSpec(check_phash=True)
    out = payload_violations(df, spec) \
        .where("constraint = 'payload:phash'").collect()
    assert [r.row_key for r in out] == ["bad"]


def test_phash_perceptual_mode_hamming_tolerance(spark):
    from xmlschema_spark import fakecodec
    from xmlschema_spark.operators.payload import payload_violations
    from xmlschema_spark.specs import PayloadSpec

    px = fakecodec.gen_pixels(3, 32, 32)
    buf = fakecodec.encode(px, "png")
    ph = fakecodec.phash64(px)
    rows = [("a", buf, 32, 32, "png", ph),
            ("b", buf, 32, 32, "png", ph ^ ((1 << 20) - 1))]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, "
              "fmt string, phash long")
    spec = PayloadSpec(check_phash=True, phash_mode="perceptual",
                       phash_max_hamming=8)
    out = payload_violations(df, spec) \
        .where("constraint = 'payload:phash'").collect()
    assert [r.row_key for r in out] == ["b"]
    assert "hamming distance 20" in out[0].reason


# ------------------------------------- Columnar / Unordered converters

def test_columnar_converter_naming_rule(spark):
    """Attribute keys = parent + attr_prefix + name (reference
    columnar.py:74-79), attributes first, level-0 {root: ...} wrap."""
    import json as _json

    from xmlschema_spark.functions.converters import (columnar_converter,
                                                      decode_table)
    from xmlschema_spark.specs import ColumnSpec, TableSpec

    df = spark.createDataFrame([(1, "en", 5)],
                               "doc_id bigint, lang string, n bigint")
    spec = TableSpec(name="doc", key_column="doc_id",
                     columns=[ColumnSpec("doc_id", "bigint"),
                              ColumnSpec("lang", "string"),
                              ColumnSpec("n", "bigint")])
    row = decode_table(df, spec, columnar_converter(["lang"], "__")) \
        .collect()[0]
    d = _json.loads(row.doc)
    assert list(d) == ["doc"]
    assert list(d["doc"]) == ["doc__lang", "doc_id", "n"]
    # empty prefix: parent name glued straight on (reference default)
    row0 = decode_table(df, spec, columnar_converter(["lang"])) \
        .collect()[0]
    assert "doclang" in _json.loads(row0.doc)["doc"]


def test_columnar_converter_rejects_bad_prefix():
    from xmlschema_spark.functions.converters import columnar_converter
    with pytest.raises(ValueError,
                       match="single/double underscore"):
        columnar_converter([], attr_prefix="@")


def test_unordered_converter_model_order_wins(spark):
    """Unordered mode re-derives sibling order from the model; the
    default converter preserves the caller's insertion order — the
    exact contrast the reference documents (unordered.py:24-30)."""
    import json as _json

    from xmlschema_spark.functions.converters import (decode_table,
                                                      unordered_converter)
    from xmlschema_spark.specs import ColumnSpec, TableSpec

    df = spark.createDataFrame([(1, "en", 5, "web")],
                               "doc_id bigint, lang string, n bigint, "
                               "src string")
    spec = TableSpec(name="doc", key_column="doc_id",
                     columns=[ColumnSpec("doc_id", "bigint"),
                              ColumnSpec("lang", "string"),
                              ColumnSpec("n", "bigint")])
    scrambled = ["n", "src", "lang", "doc_id"]
    un = decode_table(df, spec, unordered_converter(),
                      names=scrambled).collect()[0]
    # declared order, undeclared 'src' trailing
    assert list(_json.loads(un.doc)) == ["doc_id", "lang", "n", "src"]
    default = decode_table(df, spec, names=scrambled).collect()[0]
    assert list(_json.loads(default.doc)) == scrambled


# --------------------------------------------- exporter quoteattr

def test_exporter_quotes_element_names():
    from xmlschema_spark.sources.xsd_export import spec_to_xsd
    from xmlschema_spark.specs import (ContentModelSpec, ParticleSpec,
                                       TableSpec)

    spec = TableSpec(name="t", key_column="id", content_models=[
        ContentModelSpec(
            name="cm", column="children", check_upa=False,
            model=ParticleSpec(kind="sequence", children=[
                ParticleSpec(kind="element", name='weird"&name'),
            ]))])
    text = spec_to_xsd(spec, lossy=True)
    # well-formed (pre-fix output had a raw '"' inside a "-quoted
    # attribute) and the name round-trips through an XML parse
    import xml.etree.ElementTree as ET
    root = ET.fromstring(text)
    names = {e.get("name") for e in root.iter()
             if e.tag.endswith("element")}
    assert 'weird"&name' in names
