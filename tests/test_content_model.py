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


def E(name, lo=1, hi=1, **kw):
    return ParticleSpec(kind="element", name=name, min_occurs=lo,
                        max_occurs=hi, **kw)


def SEQ(*ch, lo=1, hi=1):
    return ParticleSpec(kind="sequence", children=list(ch),
                        min_occurs=lo, max_occurs=hi)


def CH(*ch, lo=1, hi=1):
    return ParticleSpec(kind="choice", children=list(ch),
                        min_occurs=lo, max_occurs=hi)


def ANY(lo=1, hi=1, **kw):
    return ParticleSpec(kind="any", min_occurs=lo, max_occurs=hi, **kw)


def _viol(spark, model, rows, column_decl="array<string>",
          lexical=False, tag_field=None, check_upa=True,
          target_ns=None, open_content=None, xsd11=False):
    from xmlschema_spark.runner import validate
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v", model=model, lexical=lexical,
            tag_field=tag_field, check_upa=check_upa,
            target_ns=target_ns, open_content=open_content,
            xsd11=xsd11)])
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
    # minOccurs=0 on the group means EMPTY-OR-COMPLETE (reference
    # models.py:415-459: zero-missing member errors fire only once
    # occurs[group] is set, which happens as soon as ANY member
    # occurs) — it does NOT make each member individually optional
    model = ParticleSpec(kind="all", min_occurs=0, children=[
        E("a"), E("b")])
    rows = [("ok_empty", []), ("bad_partial", ["a"]),
            ("ok_full", ["b", "a"]), ("bad_dup", ["a", "a", "b"])]
    assert _viol(spark, model, rows) == ["bad_dup", "bad_partial"]


def test_all_optional_group_optional_member(spark):
    # a genuinely-optional member (its own minOccurs=0) stays optional
    # inside an occurring emptiable 'all'
    model = ParticleSpec(kind="all", min_occurs=0, children=[
        E("a"), E("b", 0, 1)])
    rows = [("ok_empty", []), ("ok_no_b", ["a"]),
            ("bad_only_b", ["b"])]
    assert _viol(spark, model, rows) == ["bad_only_b"]


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


def test_empty_model_groups_accepted(spark):
    # the reference ACCEPTS empty model groups at parse time
    # (tests/validators/test_models.py test_empty_choice_groups):
    # an empty sequence/all is epsilon — admits empty content only
    for kind in ("sequence", "all"):
        model = ParticleSpec(kind=kind)
        rows = [("ok_empty", []), ("bad", ["a"])]
        assert _viol(spark, model, rows) == ["bad"], kind


def test_empty_choice_groups(spark):
    # W3C group complex022 via the reference (groups.py:967-970): an
    # empty choice with minOccurs > 0 "cannot validate any content" —
    # EMPTY content included — while minOccurs=0 makes it epsilon
    # (test_empty_choice_groups's nested `<xs:choice minOccurs="0"/>`)
    rows = [("r_empty", []), ("r_a", ["a"])]
    never = ParticleSpec(kind="choice")
    assert _viol(spark, never, rows) == ["r_a", "r_empty"]
    eps = ParticleSpec(kind="choice", min_occurs=0)
    assert _viol(spark, eps, rows) == ["r_a"]
    # nested epsilon choice before a required element (the reference's
    # group1 shape): sequence(choice?(choice?()), elem1)
    nested = SEQ(
        ParticleSpec(kind="choice", min_occurs=0, children=[
            ParticleSpec(kind="choice", min_occurs=0)]),
        E("elem1"))
    rows2 = [("ok", ["elem1"]), ("bad_empty", []), ("bad_two",
                                                    ["elem1", "elem1"])]
    assert _viol(spark, nested, rows2) == ["bad_empty", "bad_two"]


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

# ---------------------------------------------------------------------------
# round 6: wildcard namespace constraints, substitution groups,
# XSD 1.1 openContent and 'all' relaxations
# (reference wildcards.py:73-126 parse / 164-185 match / 848-897
# XsdOpenContent; models.py:739-815 open-content visitors;
# elements.py:609-623 substitution dispatch)

from xmlschema_spark.specs import OpenContentSpec


def OC(mode="interleave", **wc_kw):
    return OpenContentSpec(mode=mode, wildcard=ANY(**wc_kw))


# ------------------------------------- xs:any namespace constraints

def test_any_namespace_other(spark):
    # ##other: qualified AND != targetNamespace (wildcards.py:181-185)
    model = SEQ(E("a"), ANY(namespace="##other", lo=0, hi=None))
    rows = [("ok_foreign", ["a", "ext:x", "other:y"]),
            ("ok_none", ["a"]),
            ("bad_local", ["a", "x"]),
            ("bad_target", ["a", "tns:x"])]
    assert _viol(spark, model, rows, target_ns="tns") == \
        ["bad_local", "bad_target"]


def test_any_namespace_list_with_local(spark):
    model = SEQ(E("h"), ANY(namespace=["##local", "u1"], lo=1, hi=None))
    rows = [("ok", ["h", "x", "u1:y"]),
            ("bad_foreign", ["h", "u2:y"]),
            ("bad_target", ["h", "tns:y"])]
    assert _viol(spark, model, rows, target_ns="tns") == \
        ["bad_foreign", "bad_target"]


def test_any_not_namespace(spark):
    # XSD 1.1 notNamespace complement (wildcards.py:109-119, 177-178)
    model = SEQ(E("h"), ANY(not_namespace=["##local", "u1"], lo=1, hi=1))
    rows = [("ok", ["h", "u2:x"]), ("ok_tns", ["h", "tns:x"]),
            ("bad_local", ["h", "x"]), ("bad_u1", ["h", "u1:x"])]
    assert _viol(spark, model, rows, target_ns="tns") == \
        ["bad_local", "bad_u1"]


def test_any_empty_namespace_matches_nothing(spark):
    # namespace='' means no namespace allowed (wildcards.py:76-77)
    model = SEQ(E("h"), ANY(namespace="", lo=0, hi=1))
    rows = [("ok", ["h"]), ("bad", ["h", "x"]), ("bad_q", ["h", "u:x"])]
    assert _viol(spark, model, rows) == ["bad", "bad_q"]


# -------------------------------------------- substitution groups

def test_substitution_members_match(spark):
    model = SEQ(E("shape", substitutes=["circle", "square"]), E("end"))
    rows = [("ok_head", ["shape", "end"]),
            ("ok_m1", ["circle", "end"]),
            ("ok_m2", ["square", "end"]),
            ("bad_alien", ["triangle", "end"])]
    assert _viol(spark, model, rows) == ["bad_alien"]


def test_abstract_head_requires_member(spark):
    # an abstract head never matches its own tag (elements.py:707-710)
    model = SEQ(E("shape", substitutes=["circle"], abstract=True))
    rows = [("ok", ["circle"]), ("bad_head", ["shape"])]
    assert _viol(spark, model, rows) == ["bad_head"]


def test_substitution_occurs_shared_across_members(spark):
    model = SEQ(E("item", 1, 2, substitutes=["sub"]))
    rows = [("ok_mixed", ["item", "sub"]), ("ok_two_subs", ["sub", "sub"]),
            ("bad_three", ["item", "sub", "item"])]
    assert _viol(spark, model, rows) == ["bad_three"]


# ------------------------------------------- openContent: suffix

def test_open_content_suffix(spark):
    # SuffixedModelVisitor (models.py:790-815): wildcard children only
    # AFTER the model is satisfied
    model = SEQ(E("a"), E("b"))
    oc = OC(mode="suffix", namespace="##other")
    rows = [("ok_plain", ["a", "b"]),
            ("ok_tail", ["a", "b", "ext:x", "ext:y"]),
            ("bad_interleaved", ["a", "ext:x", "b"]),
            ("bad_local_tail", ["a", "b", "x"]),
            ("bad_target_tail", ["a", "b", "tns:x"])]
    assert _viol(spark, model, rows, target_ns="tns",
                 open_content=oc) == \
        ["bad_interleaved", "bad_local_tail", "bad_target_tail"]


# --------------------------------------- openContent: interleave

def test_open_content_interleave_any(spark):
    # InterleavedModelVisitor (models.py:739-787): wildcard children
    # anywhere, but a tag matching a not-over model element is
    # attributed to the MODEL (count-based analog)
    model = SEQ(E("a"), E("b", 1, 2))
    oc = OC(mode="interleave", namespace="##any")
    rows = [("ok_plain", ["a", "b"]),
            ("ok_everywhere", ["x", "a", "y", "b", "b", "z"]),
            # third 'b' is over the cap -> open content absorbs it
            ("ok_overflow", ["a", "b", "b", "b"]),
            # 'b' before 'a' is under the cap -> attributed to the
            # model -> sequence order violated (the visitor's
            # not-over rule rejects exactly this, models.py:757-765)
            ("bad_order", ["b", "a"]),
            ("bad_missing", ["a"])]
    assert _viol(spark, model, rows, open_content=oc) == \
        ["bad_missing", "bad_order"]


def test_open_content_interleave_constrained(spark):
    # non-declared tags must match the wildcard's namespace constraint
    model = SEQ(E("a"))
    oc = OC(mode="interleave", namespace="##local")
    rows = [("ok", ["x", "a", "y"]), ("bad_qualified", ["u:x", "a"])]
    assert _viol(spark, model, rows, open_content=oc) == \
        ["bad_qualified"]


def test_open_content_interleave_unbounded_name_stays_model(spark):
    # unbounded declared names are always attributed to the model
    model = SEQ(E("a", 1, None), E("z"))
    oc = OC(mode="interleave", namespace="##any")
    rows = [("ok", ["a", "a", "z"]),
            # 'a' after 'z' is still model-attributed (unbounded cap)
            # -> breaks the sequence
            ("bad_tail_a", ["a", "z", "a"])]
    assert _viol(spark, model, rows, open_content=oc) == ["bad_tail_a"]


def test_open_content_mode_none_cancels(spark):
    model = SEQ(E("a"))
    oc = OpenContentSpec(mode="none", wildcard=None)
    rows = [("ok", ["a"]), ("bad", ["a", "x"])]
    assert _viol(spark, model, rows, open_content=oc) == ["bad"]


# ------------------------------- openContent + 'all' (counting mode)

def test_all_with_open_content_interleave(spark):
    model = ParticleSpec(kind="all", children=[E("t"), E("u", 0, 1)])
    oc = OC(mode="interleave", namespace="##any")
    rows = [("ok", ["t", "x"]),
            # 'u' beyond its cap is absorbed by ##any open content
            ("ok_overflow", ["u", "t", "u"]),
            ("bad_missing_t", ["u", "x"])]
    assert _viol(spark, model, rows, open_content=oc) == \
        ["bad_missing_t"]


def test_all_open_content_constrained_keeps_bound(spark):
    # wildcard does NOT admit the member's name -> the cap stands
    model = ParticleSpec(kind="all", children=[E("t"), E("u:m", 0, 1)])
    oc = OC(mode="interleave", namespace="##local")
    rows = [("ok", ["t", "u:m", "x"]),
            ("bad_overflow", ["t", "u:m", "u:m"]),
            ("bad_foreign", ["t", "w:z"])]
    assert _viol(spark, model, rows, open_content=oc) == \
        ["bad_foreign", "bad_overflow"]


# --------------------------------------- XSD 1.1 'all' relaxations

def test_xsd11_all_wildcard_member(spark):
    model = ParticleSpec(kind="all", children=[
        E("t"), ANY(namespace="##other", lo=1, hi=2)])
    rows = [("ok", ["ext:x", "t"]),
            ("ok_two", ["ext:x", "t", "ext2:y"]),
            ("bad_none", ["t"]),
            ("bad_three", ["e1:a", "t", "e2:b", "e3:c"]),
            ("bad_local_extra", ["t", "ext:x", "z"])]
    assert _viol(spark, model, rows, target_ns="tns", xsd11=True) == \
        ["bad_local_extra", "bad_none", "bad_three"]


def test_xsd11_all_member_max_occurs(spark):
    model = ParticleSpec(kind="all", children=[E("a", 1, 3), E("b")])
    rows = [("ok", ["a", "b", "a", "a"]), ("bad", ["a", "a", "a", "a", "b"])]
    assert _viol(spark, model, rows, xsd11=True) == ["bad"]


def test_all_substitution_member(spark):
    model = ParticleSpec(kind="all", children=[
        E("head", substitutes=["m1", "m2"]), E("z", 0, 1)])
    rows = [("ok_m", ["m2", "z"]), ("ok_h", ["z", "head"]),
            ("bad_two", ["m1", "head"])]
    assert _viol(spark, model, rows) == ["bad_two"]


# ------------------------------ compile-time rejections (round 6)

@pytest.mark.parametrize("kwargs,msg", [
    (dict(model=SEQ(E("a"), ANY(lo=0)),
          open_content=OpenContentSpec(mode="weird", wildcard=None)),
     "wrong value 'weird' for 'mode'"),
    (dict(model=SEQ(E("a")),
          open_content=OpenContentSpec(mode="interleave", wildcard=None)),
     "an <xs:any> child declaration is required"),
    (dict(model=SEQ(E("a")),
          open_content=OpenContentSpec(
              mode="none",
              wildcard=ParticleSpec(kind="any"))),
     "mode='none' cannot have"),
    (dict(model=SEQ(E("a"), ANY(lo=0)),
          open_content=OpenContentSpec(
              mode="interleave", wildcard=ParticleSpec(kind="any"))),
     "model containing 'any' particles is not supported"),
    (dict(model=ParticleSpec(kind="all", children=[E("a")]),
          open_content=OpenContentSpec(
              mode="suffix", wildcard=ParticleSpec(kind="any"))),
     "suffix openContent over an 'all' group"),
    (dict(model=SEQ(ANY(namespace="##any", not_namespace=["u"]))),
     "mutually exclusive"),
    (dict(model=SEQ(ANY(namespace=["##other"]))),
     "wrong value '##other' in 'namespace'"),
    (dict(model=SEQ(ANY(not_namespace=["##any"]))),
     "wrong value '##any' in 'notNamespace'"),
    (dict(model=SEQ(ANY(process_contents="bogus"))),
     "wrong value 'bogus' for 'processContents'"),
    (dict(model=SEQ(E("h", abstract=True))),
     "abstract element 'h' has no substitution members"),
    (dict(model=SEQ(E("h", namespace="##any"))),
     "namespace constraints apply only to 'any'"),
    (dict(model=ParticleSpec(kind="all", children=[E("a", 0, 3)])),
     "elements of an XSD 1.0 'all'"),
    (dict(model=ParticleSpec(kind="all", children=[ANY()])),
     "can contain only elements"),
])
def test_round6_compile_rejections(kwargs, msg):
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v", check_upa=False, **kwargs)])
    with pytest.raises(ValueError, match=msg):
        compile_plan(spec)


# ----------------------------------------- UPA with the new symbols

@pytest.mark.parametrize("model,kw,bad", [
    # substitution head-set vs member name competes
    (CH(E("h", substitutes=["m"]), E("m")), {}, True),
    (CH(E("h", substitutes=["m"]), E("k")), {}, False),
    # abstract head's own name does not compete
    (CH(E("h", substitutes=["m"], abstract=True), E("h")), {}, False),
    # ##other does not compete with an unqualified element
    (SEQ(ANY(namespace="##other", lo=0), E("a")),
     dict(target_ns="tns"), False),
    (SEQ(ANY(lo=0), E("a")), {}, True),
    # disjoint wildcard lists don't compete
    (CH(ANY(namespace=["u1"]), ANY(namespace=["u2"])), {}, False),
    (CH(ANY(namespace=["u1"]), ANY(namespace=["u1", "u2"])), {}, True),
    (CH(ANY(namespace="##other"), ANY(namespace="##local")),
     dict(target_ns="t"), False),
    (CH(ANY(namespace=["u1"]), E("u1:x")), {}, True),
    (CH(ANY(namespace=["u1"]), E("u2:x")), {}, False),
])
def test_upa_with_namespaces_and_substitution(model, kw, bad):
    from xmlschema_spark.plans.content_model import check_upa
    if bad:
        with pytest.raises(ValueError, match="Unique Particle"):
            check_upa(model, **kw)
    else:
        check_upa(model, **kw)


def test_upa_xsd11_all_element_wildcard_tolerated():
    from xmlschema_spark.plans.content_model import check_upa
    allm = ParticleSpec(kind="all", children=[E("a"), ANY(lo=0)])
    with pytest.raises(ValueError, match="Unique Particle"):
        check_upa(allm)
    check_upa(allm, allow_element_wildcard=True)


def test_round6_from_dict_round_trip(spark):
    from xmlschema_spark.runner import validate
    spec = TableSpec.from_dict({
        "name": "t", "key_column": "rid",
        "content_models": [{
            "name": "doc", "column": "v",
            "target_ns": "tns", "xsd11": True,
            "open_content": {"mode": "suffix",
                             "wildcard": {"kind": "any",
                                          "namespace": "##other"}},
            "model": {"kind": "sequence", "children": [
                {"kind": "element", "name": "head",
                 "substitutes": ["h2"]},
                {"kind": "element", "name": "body"}]}}],
    })
    df = spark.createDataFrame(
        [("r1", ["h2", "body", "ext:x"]), ("r2", ["head", "body", "x"])],
        "rid string, v array<string>")
    got = sorted(r.row_key for r in validate(df, spec).violations.collect())
    assert got == ["r2"]


def test_interleave_substitution_shares_budget(spark):
    # a head and its substitutes share ONE occurs budget: the third
    # occurrence of the {item, sub} group is over and goes to the
    # open-content wildcard (the visitor's is_over is per PARTICLE,
    # not per name)
    model = SEQ(E("item", 1, 2, substitutes=["sub"]))
    oc = OC(mode="interleave", namespace="##any")
    rows = [("ok_over_mixed", ["item", "sub", "item"]),
            ("ok_over_head", ["item", "item", "sub"]),
            ("ok_two", ["sub", "item"])]
    assert _viol(spark, model, rows, open_content=oc) == []
