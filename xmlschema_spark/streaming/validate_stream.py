"""Structured Streaming validation.

The reference's lazy iterparse (xml_resource.py:590-656) validates
subtree-at-a-time with deferred identity merging (schemas.py:1386-1405).
The streaming analog:

- row-local facet checks apply directly on the streaming DataFrame
  (stateless — pure projection, no watermark needed);
- identity/keyref checks are deferred per micro-batch via foreachBatch
  (batch-scoped, like the reference's per-document scope), appending
  violations + manifest increments through the checkpoint module;
- cross-batch uniqueness would need stateful dropDuplicates with a
  watermark on an event-time column — exposed via
  streaming_unique_violations for tables that have one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.row_checks import row_violations
from ..plans.compiler import ValidationPlan, compile_plan
from ..specs import TableSpec


def streaming_row_violations(stream_df: DataFrame,
                             spec_or_plan: TableSpec | ValidationPlan) -> DataFrame:
    """Stateless row-local violations on a streaming DataFrame — safe for
    append-mode sinks, no state store, no watermark."""
    plan = spec_or_plan if isinstance(spec_or_plan, ValidationPlan) \
        else compile_plan(spec_or_plan)
    return row_violations(stream_df, plan)


def validate_stream(stream_df: DataFrame, spec: TableSpec,
                    checkpoint_dir: str, output_dir: str,
                    refs: dict[str, DataFrame] | None = None,
                    trigger_once: bool = True):
    """Full-suite validation per micro-batch via foreachBatch: each batch
    runs the SAME batch engine (facets + identity + payload), appending
    violations; identity scope = micro-batch (reference: per-document
    identity scope). Returns the StreamingQuery."""
    from ..runner import validate

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = validate(batch_df, spec, refs=refs)
        (res.violations
         .withColumn("batch_id", F.lit(batch_id))
         .coalesce(1)
         .sortWithinPartitions("constraint", "row_key", "reason")
         .write.mode("append").parquet(f"{output_dir}/violations"))
        (res.verdicts.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(f"{output_dir}/verdicts"))

    w = (stream_df.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def streaming_global_unique_violations(stream_df: DataFrame,
                                       key_cols: list[str],
                                       id_col: str,
                                       constraint: str = "unique:stream"
                                       ) -> DataFrame:
    """GLOBAL cross-batch uniqueness via applyInPandasWithState keyed by
    the field tuple — the streaming analog of the reference's document-
    wide identity counter merge (schemas.py:1386-1405), with state
    bounded to (count, first_id) per DISTINCT key tuple (not per row).

    Emission matches batch unique_violations semantics: every occurrence
    of a duplicated tuple is flagged, including the FIRST one
    retroactively when the second arrives; `occurs` carries the running
    group count at emission time.

    At 10^12 rows the state store shards by the key tuple across
    executors (RocksDB-backed in production configs); a skewed hot tuple
    costs one state entry, not memory."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ("row_key string, constraint string, reason string, "
                  "value string, occurs bigint")
    state_schema = "seen bigint, first_id string"
    reason_prefix = f"duplicated value for '{constraint}' fields {key_cols}: "

    def track(key, pdfs, state):
        import pandas as pd
        if state.exists:
            seen, first = state.get
        else:
            seen, first = 0, None
        value = "|".join(str(k) for k in key)
        out_rows = []
        for pdf in pdfs:
            for rid in pdf[id_col].astype(str).sort_values():
                seen += 1
                if seen == 1:
                    first = rid
                else:
                    if seen == 2 and first is not None:
                        out_rows.append(first)   # retroactive first hit
                    out_rows.append(rid)
        state.update((seen, first))
        if out_rows:
            yield pd.DataFrame({
                "row_key": out_rows,
                "constraint": constraint,
                "reason": reason_prefix + value,
                "value": value,
                "occurs": seen,
            })

    nn = None
    for c in key_cols:
        p = F.col(c).isNotNull()
        nn = p if nn is None else nn & p
    return (stream_df.where(nn)
            .select(*key_cols, F.col(id_col).cast("string").alias(id_col))
            .groupBy(*key_cols)
            .applyInPandasWithState(track, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def streaming_unique_violations(stream_df: DataFrame, key_cols: list[str],
                                event_time_col: str,
                                watermark: str = "10 minutes") -> DataFrame:
    """Cross-batch duplicate detection with bounded state: watermarked
    dropDuplicates emits first-seen rows; duplicates are the complement
    (flagged per batch in foreachBatch by anti-joining the deduped view).
    Exposed as the deduped stream; callers diff against the raw stream."""
    # watermarks require TIMESTAMP (ltz); parquet often yields
    # TIMESTAMP_NTZ — normalize (session tz is pinned to UTC)
    return (stream_df
            .withColumn(event_time_col,
                        F.col(event_time_col).cast("timestamp"))
            .withWatermark(event_time_col, watermark)
            .dropDuplicates(key_cols))
