"""Structured-Streaming ingest for continuously arriving documents.

The reference is pure batch (SURVEY.md §1.2 — its only streaming
surface is a web SSE endpoint, out of engine scope), but a production
linkage deployment ingests documents continuously. This module gives
the engine a streaming front door that reuses the SAME batch operators
via foreachBatch: each micro-batch is normalized + matched with the
broadcast gazetteer artifacts and appended to the matches table —
incremental linkage with exactly-once sink semantics when the sink is
Iceberg (append + checkpointLocation).

Also: watermarked windowed event aggregation over an event stream
(the shape a metrics/audit stream needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.documents import DOCUMENTS_SCHEMA


def read_document_stream(spark: SparkSession, path: str,
                         max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream of spans documents (parquet drop directory)."""
    return (spark.readStream
            .schema(DOCUMENTS_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(path))


def start_incremental_linkage(stream: DataFrame, gaz: DataFrame,
                              out_path: str, checkpoint: str,
                              cfg=None, available_now: bool = True):
    """foreachBatch: run the batch pipeline per micro-batch. The
    gazetteer is prepared ONCE at stream start (normalize + range
    expansion + blocking keys, eager localCheckpoint so the work is
    materialized, not a lazy plan replayed per batch) and the closure
    hands the prepared frame to every micro-batch run."""
    from ..operators import candidates as C
    from ..pipeline import PipelineConfig, run_pipeline
    cfg = cfg or PipelineConfig(enable_vector=False, enable_spatial=False,
                                enable_symspell=False)
    gazp = C.prepare_gazetteer(gaz).localCheckpoint(eager=True)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = run_pipeline(batch_df.sparkSession, batch_df, gaz, cfg,
                           gazp_prepared=gazp)
        (out["matches"]
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_path))

    w = (stream.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_static_candidates(stream_docs: DataFrame,
                             gazp: DataFrame) -> DataFrame:
    """CONTINUOUS (non-foreachBatch) linkage front end: normalize the
    document stream with the same stateless Arrow UDFs the batch path
    uses, derive blocking keys, and stream-static inner-join against
    the prepared gazetteer's exploded key index. Spark keeps the static
    side as a plain batch relation (re-broadcast per micro-batch under
    AQE), the stream side never accumulates state — this is the
    always-on candidate generator in front of the scoring phase.

    Returns a STREAMING DataFrame (doc_id, addr_can, postcode, uprn,
    block_kind) — exact-canonical agreement collapses to method
    'exact'; everything else is a blocked fuzzy candidate for the
    downstream scorer."""
    from ..operators.blocking import explode_keys, with_blocking_keys
    from ..pipeline import normalize_documents

    d = normalize_documents(stream_docs, None)
    d = with_blocking_keys(d)
    dk = explode_keys(d, ["doc_id", "addr_can", "postcode", "addr_core"])
    gk = explode_keys(gazp, ["uprn"]) \
        .withColumnRenamed("block_kind", "g_kind") \
        .withColumnRenamed("block_key", "g_key")
    # NO dropDuplicates here: on a stream it would pin unbounded state;
    # the scoring phase's (addr, uprn) groupBy collapses multi-key hits
    return (dk.join(gk, (dk.block_kind == gk.g_kind) &
                    (dk.block_key == gk.g_key), "inner")
            .select("doc_id", "addr_can", "postcode", "uprn", "block_kind"))


def streaming_dedup(stream: DataFrame, fingerprint_col: str = "fingerprint",
                    id_col: str = "doc_id"):
    """Custom stateful streaming operator: exactly-once-per-fingerprint
    emission across the whole stream via applyInPandasWithState.

    State = per-fingerprint seen flag (GroupState, no timeout — a real
    deployment sets a TTL via GroupStateTimeout + watermark). Only the
    FIRST document carrying each fingerprint passes; later duplicates,
    including ones arriving in later micro-batches, are dropped. This is
    the streaming face of operators/dedup.exact_dedup."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{id_col} string, {fingerprint_col} long"
    state_schema = "seen boolean"

    def dedup_fn(key, pdf_iter, state):
        if state.exists:
            return iter(())
        state.update((True,))
        import pandas as pd
        first = None
        for pdf in pdf_iter:
            if len(pdf):
                first = pdf.iloc[[0]][[id_col, fingerprint_col]]
                break
        return iter(()) if first is None else iter([first])

    return (stream
            .groupBy(fingerprint_col)
            .applyInPandasWithState(
                dedup_fn, outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          window: str = "1 minute",
                          watermark: str = "5 minutes") -> DataFrame:
    """Watermarked tumbling-window counts by event_type — late data
    beyond the watermark is dropped, state is bounded."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"),
                     F.col("event_type"))
            .agg(F.count("*").alias("n"),
                 F.avg("value").alias("avg_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n", "avg_value"))
