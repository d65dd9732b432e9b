"""Content-model validation (plans/content_model.py) — the tabular
ModelVisitor analog (reference validators/models.py:177-330,
groups.py:503-560; case inventory from tests/validators/test_models.py
and test_groups.py)."""

import pytest

from xmlschema_spark.plans.compiler import compile_plan
from xmlschema_spark.plans.content_model import (model_regex,
                                                 particle_regex,
                                                 validate_particle)
from xmlschema_spark.specs import (ContentModelSpec, ParticleSpec,
                                   TableSpec)


def E(name, lo=1, hi=1):
    return ParticleSpec(kind="element", name=name, min_occurs=lo,
                        max_occurs=hi)


def SEQ(*ch, lo=1, hi=1):
    return ParticleSpec(kind="sequence", children=list(ch),
                        min_occurs=lo, max_occurs=hi)


def CH(*ch, lo=1, hi=1):
    return ParticleSpec(kind="choice", children=list(ch),
                        min_occurs=lo, max_occurs=hi)


def ANY(lo=1, hi=1):
    return ParticleSpec(kind="any", min_occurs=lo, max_occurs=hi)


def _viol(spark, model, rows, column_decl="array<string>",
          lexical=False, tag_field=None, check_upa=True):
    from xmlschema_spark.runner import validate
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v", model=model, lexical=lexical,
            tag_field=tag_field, check_upa=check_upa)])
    df = spark.createDataFrame(rows, f"rid string, v {column_decl}")
    return sorted(r.row_key
                  for r in validate(df, spec).violations.collect())


# ----------------------------------------------------------- regexes

def test_regex_shapes():
    assert particle_regex(E("a")) == "(?:a;)"
    assert particle_regex(E("a", 0, None)) == "(?:a;)*"
    assert particle_regex(E("a", 2, 5)) == "(?:a;){2,5}"
    assert model_regex(SEQ(E("a"), CH(E("b"), E("c"), lo=0, hi=None))) \
        == "^(?:(?:(?:a;)(?:(?:b;)|(?:c;))*))$"


# ------------------------------------------------- sequence / choice

def test_sequence_order_enforced(spark):
    model = SEQ(E("head"), E("body", 1, None), E("foot", 0, 1))
    rows = [("ok1", ["head", "body", "foot"]),
            ("ok2", ["head", "body", "body"]),
            ("bad_order", ["body", "head"]),
            ("bad_missing", ["head"]),
            ("bad_extra", ["head", "body", "foot", "foot"])]
    assert _viol(spark, model, rows) == \
        ["bad_extra", "bad_missing", "bad_order"]


def test_choice_per_repetition(spark):
    model = CH(E("a"), E("b"), lo=2, hi=3)
    rows = [("ok1", ["a", "b"]), ("ok2", ["b", "b", "a"]),
            ("bad_few", ["a"]), ("bad_many", ["a", "b", "a", "b"]),
            ("bad_alien", ["a", "x"])]
    assert _viol(spark, model, rows) == \
        ["bad_alien", "bad_few", "bad_many"]


def test_nested_groups_and_any(spark):
    # sequence( (meta)?, choice(img | txt)+, any{0,1} ) — the trailing
    # wildcard overlaps the repeated choice, an XSD-nondeterministic
    # model: the regex engine accepts it with check_upa=False (the UPA
    # default rejects it, tested below)
    model = SEQ(E("meta", 0, 1),
                CH(E("img"), E("txt"), lo=1, hi=None),
                ANY(0, 1))
    rows = [("ok1", ["meta", "img", "trailer"]),
            ("ok2", ["txt", "img", "txt"]),
            ("bad_empty", []),
            ("bad_two_any", ["img", "x", "y"])]
    assert _viol(spark, model, rows, check_upa=False) == \
        ["bad_empty", "bad_two_any"]


def test_empty_sequence_allows_empty(spark):
    model = SEQ(E("a", 0, None), lo=1, hi=1)
    rows = [("ok_empty", []), ("ok", ["a", "a"]), ("bad", ["b"])]
    assert _viol(spark, model, rows) == ["bad"]


def test_null_column_skipped(spark):
    model = SEQ(E("a"))
    rows = [("ok", ["a"]), ("null_row", None)]
    assert _viol(spark, model, rows) == []


# ------------------------------------------------------------- all

def test_all_group_order_free(spark):
    model = ParticleSpec(kind="all", children=[
        E("title"), E("author", 0, 1), E("year")])
    rows = [("ok1", ["year", "title"]),
            ("ok2", ["author", "title", "year"]),
            ("bad_dup", ["title", "title", "year"]),
            ("bad_missing", ["author"]),
            ("bad_alien", ["title", "year", "isbn"])]
    assert _viol(spark, model, rows) == \
        ["bad_alien", "bad_dup", "bad_missing"]


def test_all_optional_group(spark):
    # minOccurs=0 on the group: the EMPTY content is fine, but once
    # present the per-child maxima still bind
    model = ParticleSpec(kind="all", min_occurs=0, children=[
        E("a"), E("b")])
    rows = [("ok_empty", []), ("ok_partial", ["a"]),
            ("bad_dup", ["a", "a", "b"])]
    assert _viol(spark, model, rows) == ["bad_dup"]


# ----------------------------------------------- tag sources / shapes

def test_struct_tag_field(spark):
    model = SEQ(E("h"), E("p", 1, None))
    rows = [("ok", [("h", 1), ("p", 2), ("p", 3)]),
            ("bad", [("p", 1)])]
    assert _viol(spark, model, rows,
                 column_decl="array<struct<tag:string,n:int>>",
                 tag_field="tag") == ["bad"]


def test_lexical_tag_string(spark):
    model = SEQ(CH(E("key"), E("table")), ANY(0, None))
    rows = [("ok", "  key   agg row "), ("bad", "agg key row"),
            ("ok_empty_tail", "table")]
    assert _viol(spark, model, rows, column_decl="string",
                 lexical=True) == ["bad"]


def test_from_dict_round_trip(spark):
    from xmlschema_spark.runner import validate
    spec = TableSpec.from_dict({
        "name": "t", "key_column": "rid",
        "content_models": [{
            "name": "doc", "column": "v", "lexical": True,
            "model": {"kind": "sequence", "children": [
                {"kind": "element", "name": "head"},
                {"kind": "element", "name": "body",
                 "min_occurs": 1, "max_occurs": None}]}}],
    })
    df = spark.createDataFrame([("r1", "head body body"),
                                ("r2", "body head")],
                               "rid string, v string")
    got = [(r.row_key, r.constraint)
           for r in validate(df, spec).violations.collect()]
    assert got == [("r2", "content:doc:v")]


# -------------------------------------- compile-time particle checks
# (reference particles.py:148-172, groups.py:527-533 wording)

@pytest.mark.parametrize("particle,msg", [
    (E("a", 2, 1), "minOccurs must be lesser or equal than maxOccurs"),
    (E("a", -1, 1), "minOccurs value must be a non negative integer"),
    (ParticleSpec(kind="sequence"), "empty 'sequence' model group"),
    (ParticleSpec(kind="element"), "requires a name"),
    (ParticleSpec(kind="weird"), "unknown particle kind"),
    (ParticleSpec(kind="all", max_occurs=2, children=[E("a")]),
     "maxOccurs must be 1 for 'all'"),
    (ParticleSpec(kind="all", min_occurs=1, children=[SEQ(E("a"))]),
     "can contain only elements"),
    (SEQ(ParticleSpec(kind="all", children=[E("a")])),
     "cannot be nested"),
    (E("a;b"), "may not contain ';'"),
])
def test_invalid_particles_rejected(particle, msg):
    with pytest.raises(ValueError, match=msg):
        validate_particle(particle)


# -------------------------------- Unique Particle Attribution (UPA)
# (reference models.py:104-171 distinguishable_paths wording)

def _upa(model):
    from xmlschema_spark.plans.content_model import check_upa
    check_upa(model)


@pytest.mark.parametrize("model", [
    SEQ(E("a", 0, 1), E("a")),                    # (a?, a): ambiguous a
    SEQ(E("a", 0, None), E("a")),                 # (a*, a)
    CH(E("a"), SEQ(E("a"), E("b"))),              # choice branches share FIRST
    SEQ(CH(E("x"), E("y"), lo=1, hi=None), ANY(0, 1)),  # wildcard after loop
    SEQ(E("m", 0, 1), ANY(1, 1)),                 # wildcard overlaps optional
    ParticleSpec(kind="all", children=[E("t"), E("t", 0, 1)]),  # dup in all
])
def test_upa_violations_rejected(model):
    with pytest.raises(ValueError,
                       match="Unique Particle Attribution violation"):
        _upa(model)


@pytest.mark.parametrize("model", [
    SEQ(E("a"), E("a")),                          # (a, a): fine
    SEQ(E("a", 0, 1), E("b")),                    # distinct names
    SEQ(CH(E("k"), E("t")), ANY(3, None)),        # header then wildcard
    SEQ(E("open"), CH(E("a"), SEQ(E("b"), E("c")), lo=2, hi=None),
        E("close")),
    ParticleSpec(kind="all", children=[E("t"), E("y", 0, 1)]),
    SEQ(E("a", 2, 5), E("b", 0, None)),
])
def test_deterministic_models_pass_upa(model):
    _upa(model)


def test_upa_enforced_by_default_via_compile_plan(spark):
    # (spark fixture: the opt-out branch builds Catalyst columns,
    # which needs an active session)
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v", model=SEQ(E("a", 0, 1), E("a")))])
    with pytest.raises(ValueError, match="Unique Particle Attribution"):
        compile_plan(spec)
    # explicit opt-out compiles
    spec.content_models[0].check_upa = False
    compile_plan(spec)


def test_particle_errors_surface_via_compile_plan():
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v", model=E("a", 3, 2))])
    with pytest.raises(ValueError, match="lesser or equal"):
        compile_plan(spec)


# ------------------------------------------------------- streaming

def test_content_model_streams_per_microbatch(spark, tmp_path):
    """Content-model checks are part of the shuffle-free row-check
    pass, so they flow through validate_stream's per-micro-batch full
    suite unchanged — violations land in the stream sink with
    batch ids."""
    from xmlschema_spark.streaming.validate_stream import validate_stream
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("r1", "head body"), ("r2", "body head"), ("r3", "head")],
        "rid string, v string").write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="doc", column="v", lexical=True,
            model=SEQ(E("head"), E("body", 1, None)))])
    q = validate_stream(stream, spec, str(tmp_path / "chk"),
                        str(tmp_path / "out"))
    q.awaitTermination(120)
    viols = spark.read.parquet(str(tmp_path / "out" / "violations"))
    got = sorted((r.row_key, r.constraint) for r in viols.collect())
    assert got == [("r2", "content:doc:v"), ("r3", "content:doc:v")]
