"""Round-6 driver-side additions: HOF lambda vocabulary, spec
round-trips for the new content-model fields."""

import pytest

from xmlschema_spark.plans.compiler import check_assert_vocabulary


def test_assert_vocabulary_accepts_hof_lambdas():
    cols = {"tags", "vals"}
    check_assert_vocabulary("exists(vals, x -> x > 5)", cols, "t")
    check_assert_vocabulary("forall(tags, t -> length(t) <= 8)", cols, "t")
    check_assert_vocabulary(
        "aggregate(vals, 0, (acc, x) -> acc + x) > 10", cols, "t")
    check_assert_vocabulary(
        "size(filter(vals, v -> v is not null)) = size(vals)", cols, "t")
    # lambda params are scoped: a stray identifier is still a typo
    with pytest.raises(ValueError, match="unknown column 'y'"):
        check_assert_vocabulary("exists(vals, x -> y > 5)", cols, "t")
    with pytest.raises(ValueError, match="unknown column"):
        check_assert_vocabulary("exists(nope, x -> x > 5)", cols, "t")


def test_particle_spec_round_trips_new_fields():
    from xmlschema_spark.specs import (ContentModelSpec, OpenContentSpec,
                                       ParticleSpec, TableSpec)
    spec = TableSpec(
        name="t", key_column="rid",
        content_models=[ContentModelSpec(
            name="m", column="v", target_ns="tns", xsd11=True,
            open_content=OpenContentSpec(
                mode="suffix",
                wildcard=ParticleSpec(kind="any", namespace="##other")),
            model=ParticleSpec(kind="sequence", children=[
                ParticleSpec(name="h", substitutes=["h2"],
                             abstract=False),
                ParticleSpec(kind="any",
                             not_namespace=["##local", "u1"],
                             min_occurs=0, max_occurs=None)]))])
    import json
    back = TableSpec.from_json(spec.to_json())
    cm = back.content_models[0]
    assert cm.target_ns == "tns" and cm.xsd11 is True
    assert cm.open_content.mode == "suffix"
    assert cm.open_content.wildcard.namespace == "##other"
    assert cm.model.children[0].substitutes == ["h2"]
    assert cm.model.children[1].not_namespace == ["##local", "u1"]


def test_content_model_wildcards_query_regex_is_re2_safe(spark):
    """The oracle replays the regex in DuckDB (RE2): the compiled model
    must avoid lookahead, and pass/fail semantics must hold on known
    sequences (substitution head + ns-list body + ##other suffix)."""
    from xmlschema_spark.queries import _doc_ns_regex
    import re
    rx = _doc_ns_regex()
    assert "(?!" not in rx and "(?=" not in rx and "(?<" not in rx
    pat = re.compile(rx)
    # head member + local tags + qualified suffix run
    assert pat.fullmatch("key;value;ext:spark;other:query;other:query;")
    # qualified substitution member as the head
    assert pat.fullmatch("ext:spark;data;")
    # abstract head tag itself is forbidden
    assert not pat.fullmatch("header;value;")
    # 'other:' tag before a local tag — not in the suffix run
    assert not pat.fullmatch("key;other:query;value;")
    # bad head
    assert not pat.fullmatch("query;value;value;")
    # body requires at least one tag after the head
    assert not pat.fullmatch("key;")


def test_content_model_wildcards_query_counts(spark):
    from xmlschema_spark.queries import content_model_wildcards_documents
    out = content_model_wildcards_documents(
        spark, "/root/testdata/sf0.001").collect()
    assert all(r.constraint == "content:doc_ns:text" for r in out)
    # deterministic fixture: violations are a strict, non-empty subset
    import duckdb
    n = duckdb.connect().execute(
        "SELECT count(*) FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet')").fetchone()[0]
    assert 0 < len(out) < n
