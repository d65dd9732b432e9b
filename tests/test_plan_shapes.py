"""Physical-plan shape assertions: the plans we WANT at 100TB, not just
plans that pass. Checked via the executed/optimized plan text."""

import re

from pyspark.sql import functions as F

from xmlschema_spark import compile_plan
from xmlschema_spark.operators.identity import keyref_violations
from xmlschema_spark.operators.row_checks import row_violations
from xmlschema_spark.queries import LINEITEM_SPEC
from xmlschema_spark.specs import KeyrefSpec


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_row_checks_prune_to_spec_columns(spark, sf_dir):
    """The facet scan must read ONLY the columns the spec mentions —
    column pruning reaching the parquet ReadSchema."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = _plan(row_violations(li, compile_plan(LINEITEM_SPEC)))
    # (ReadSchema text is truncated with '...' in long plans — parse the
    # FileScan output column list instead)
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", p)
    assert scans
    read_cols = {c.split("#")[0] for s in scans for c in s.split(",") if c}
    expected = {"l_orderkey", "l_quantity", "l_discount", "l_extendedprice",
                "l_returnflag", "l_linestatus", "l_shipdate"}
    assert read_cols == expected, read_cols


def test_row_checks_single_exchange_free_stage(spark, sf_dir):
    """Row-local validation must be shuffle-free: scan -> project ->
    filter -> generate. Any Exchange in this plan is a bug."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = _plan(row_violations(li, compile_plan(LINEITEM_SPEC)))
    assert "Exchange" not in p, p


def test_keyref_uses_broadcast_join(spark, sf_dir):
    """Small key side must broadcast, not sort-merge."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    v = keyref_violations(li, part,
                          KeyrefSpec("fk", ["l_partkey"], "part", ["p_partkey"]),
                          "l_orderkey")
    assert "BroadcastHashJoin" in _plan(v)


def test_row_checks_whole_stage_codegen(spark, sf_dir):
    """The violation projection must run inside WholeStageCodegen."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = _plan(row_violations(li, compile_plan(LINEITEM_SPEC)))
    # '*(n)' operator prefix marks WholeStageCodegen in the compact form
    assert "*(" in p, p


def test_topk_uses_take_ordered(spark, sf_dir):
    """cosine top-k must compile to TakeOrderedAndProject (per-partition
    top-k + merge), never a global Sort of every row."""
    from xmlschema_spark.operators.similarity import cosine_topk
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in e.select("embedding").first()[0]]
    p = _plan(cosine_topk(e, "embedding", "vec_id", q, k=5))
    assert "TakeOrderedAndProject" in p
