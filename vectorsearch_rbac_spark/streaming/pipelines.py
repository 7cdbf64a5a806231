"""Structured Streaming pipelines (SURVEY.md §2 G-group).

Parity: the reference's online maintenance —
``controller/dynamic_partition/hnsw/insertion.py`` (insert blocks into the
right comb-role partition, refine heavy partitions) and ``deletion.py`` —
re-expressed as streaming relations: a file-source stream of new rows,
watermarked event-time processing, and partitioned sinks. Batch and stream
share the same column logic (the functions take DataFrames), which is the
Spark-native replacement for the reference's trigger-style upkeep.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events_from_dir(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of event parquet drops (G1). In production the
    source would be Kafka; the transformation surface is identical."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregate (G1): late rows beyond the
    watermark are dropped; state is bounded by watermark horizon. Works on
    batch DataFrames too (window() is the same expression)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_MEMORY_SINK_SEQ = iter(range(1, 1 << 30))


def run_bounded_to_memory(stream_df: DataFrame, output_mode: str = "complete", timeout_s: int = 300) -> DataFrame:
    """Execute a streaming plan over the files currently present
    (``availableNow``) into a memory sink and return the result table —
    the bounded-replay harness that lets a streaming pipeline answer a
    batch-comparable (oracle-checkable) query.

    ``complete`` mode emits every group regardless of watermark (append
    mode holds back windows the watermark hasn't sealed, so the last
    window of a bounded replay never flushes). Complete mode keeps all
    groups in state — fine when the result is aggregate-sized; the
    append+watermark pipelines above are the unbounded production path.
    """
    name = f"bounded_memory_sink_{next(_MEMORY_SINK_SEQ)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return stream_df.sparkSession.table(name)


def hourly_stats_stream(events: DataFrame) -> DataFrame:
    """Streaming form of plans.queries.hourly_event_stats (F6×G1): the
    same date_trunc('hour') bucketing and aggregates, minus the distinct
    user count — distinct aggregation is not streamable (Spark would need
    unbounded per-key sets); the batch path keeps n_users, the stream
    pairs with streaming_dedup or approx_count_distinct when uniques are
    needed online."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("_sv"),
            F.avg("value").alias("_av"),
        )
        .select(
            "hour",
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.round("_sv", 6).alias("total_value"),
            F.round("_av", 6).alias("avg_value"),
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon (G2): state stores
    only keys inside the horizon, so memory is bounded at any scale."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def streaming_sessionize(events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours") -> DataFrame:
    """Stateful sessionization (G3) via ``applyInPandasWithState``-free
    session windows: Spark's native session_window handles gap merging in
    the state store — the declarative form of the reference's imperative
    session logic."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("started"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("ended"),
            "n_events",
            "total_value",
        )
    )


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator (G3): per-user running (count, sum) via
    ``applyInPandasWithState`` — the escape hatch for stateful logic that
    session_window/agg can't express (reference analogue: the imperative
    per-user bookkeeping its serving loop keeps in Python dicts).

    State is one (n, s) pair per user — O(distinct users) in the state
    store, sharded by the groupBy hash across executors; each micro-batch
    emits the updated running totals for users seen in that batch.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BLOCK_SCHEMA = StructType(
    [
        StructField("block_id", LongType()),
        StructField("document_id", LongType()),
        StructField("vector", StringType()),  # json array payload on the wire
    ]
)


def streaming_block_insertion(
    new_blocks: DataFrame,
    permission_assignment: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """G4: route newly ingested blocks into the comb-role partitioned store.

    Parity: ``dynamic_partition/hnsw/insertion.py`` — the reference computes
    the partition for each inserted row and appends to that partition table
    (with heavy-partition refinement as an offline job). Here: the stream
    joins the (broadcast) doc→comb_role map and appends partitionBy(comb_role)
    — partition refinement stays a batch job (operators/partitioning.py).
    Returns the StreamingQuery.
    """
    doc_comb = permission_assignment.groupBy("document_id").agg(
        F.array_join(F.array_sort(F.collect_list(F.col("role_id").cast("string"))), ",").alias("comb_role")
    )
    routed = new_blocks.join(F.broadcast(doc_comb), "document_id")
    return (
        routed.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("comb_role")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def streaming_corpus_filter(
    spark: SparkSession,
    incoming_dir: str,
    corpus: DataFrame,
    quality_min: float = 0.3,
) -> DataFrame:
    """G5: streaming corpus admission — new document drops are
    quality-scored, exact-dedup'd against the STATIC corpus (stream-static
    left-anti join on the content fingerprint), and annotated for the sink.

    This is the online half of the curation pipeline: the batch side owns
    the big corpus; the stream admits only novel, good-enough docs. The
    static side's fingerprints behave like a dimension: Spark re-plans the
    join each micro-batch, so a periodically refreshed corpus snapshot is
    picked up without restarting the query.

    Scale: the anti join hashes only (fingerprint) — the static side is
    reduced to a key column before the join; the stream side never
    shuffles (no aggregation), so each micro-batch is map-only + one
    broadcast-able key-set probe.
    """
    from ..functions import text as T

    fps = corpus.select(T.fingerprint("text").alias("fp")).distinct()
    incoming = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(incoming_dir)
    )
    scored = incoming.select(
        "doc_id",
        "lang",
        "source",
        T.fingerprint("text").alias("fp"),
        T.quality_score("text").alias("quality"),
        T.token_count("text").cast("long").alias("n_tokens"),
    ).where(F.col("quality") >= quality_min)
    return scored.join(fps, "fp", "left_anti")


def stream_stream_view_purchase_join(
    spark: SparkSession,
    path: str,
    join_window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Stream-stream interval self-join (G7): purchases joined with the
    same user's views from the trailing ``join_window`` — the canonical
    Structured Streaming two-stream correlation (attribution). Both sides
    are branches of one file-source stream, each watermarked; the
    time-range predicate bounds the state store (views older than
    window + watermark are evicted).

    The bounded-replay harness feeds the whole drop in one trigger so the
    inner join is exhaustive and the batch range-join oracle applies
    bit-for-bit; on an unbounded source the same query runs continuously
    with watermark-bounded state.
    """
    ev = stream_events_from_dir(spark, path, max_files_per_trigger=max_files_per_trigger)
    views = (
        ev.where(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
                F.col("event_id").alias("view_id"))
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"),
                F.col("event_id").alias("purchase_id"), "value")
        .withWatermark("p_ts", watermark)
    )
    return purchases.join(
        views,
        F.expr(f"v_user = user_id AND v_ts <= p_ts AND v_ts > p_ts - INTERVAL {join_window}"),
    ).select("purchase_id", "user_id", "value", "view_id")


def streaming_ivf_route(
    spark: SparkSession,
    path: str,
    schema: StructType,
    anchors: list,
    max_files_per_trigger: int = 2,
) -> DataFrame:
    """G8 streaming vector-index maintenance (parity:
    ``dynamic_partition/hnsw/insertion.py`` — arriving vectors are routed
    into the partition-local index they belong to): a file-source stream
    of new embeddings is assigned to its nearest anchor centroid
    IN-FLIGHT, as a pure narrow map — the ``nlists`` anchors are literal
    arrays baked into the plan (same class as a broadcast centroid
    table), the argmin is an ``array_min`` over (distance, centroid_id)
    structs with the repo-wide 6-dp/id tie-break, and no state store or
    shuffle is involved, so the route keeps file-source parallelism at
    any ingest rate. Downstream, ``partitionBy(centroid_id)`` on the sink
    is the physical index append.
    """
    from ..functions import vector as V

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    structs = []
    for cid, vec in enumerate(anchors):
        lit_vec = F.array(*[F.lit(float(x)) for x in vec])
        d = F.round(V.l2_distance("embedding", lit_vec), 6)
        structs.append(F.struct(d.alias("d"), F.lit(cid).alias("centroid_id")))
    best = F.array_min(F.array(*structs))
    return stream.select("vec_id", best.getField("centroid_id").alias("centroid_id"))


def run_streaming_graph_inserts(
    spark: SparkSession,
    path: str,
    schema: StructType,
    initial_blocks,
    initial_graph,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int = 1,
):
    """G8b — streaming GRAPH maintenance (insertion.py parity, index side):
    each arriving micro-batch of vectors is folded into the per-partition
    NSW adjacency with ``graph_ann.insert_into_graph`` via foreachBatch —
    the index mutation is incremental (new nodes link to their m nearest
    existing + reverse edges; untouched partitions flow through), exactly
    the reference's per-batch HNSW insert loop. Runs the stream to
    completion (availableNow) and returns (final_blocks, final_graph).

    State note: the evolving adjacency is a DataFrame checkpointed per
    batch — on a cluster this is the Delta/Iceberg MERGE the sink would
    run; driver-side here only the HANDLE lives in Python, the data stays
    distributed.
    """
    from ..operators import graph_ann

    # only the ITERATED state (the adjacency) needs lineage truncation;
    # blocks is a cheap union chain — but over CHECKPOINTED batch frames:
    # re-executing a foreachBatch DataFrame outside its micro-batch is
    # unsupported (it happens to work for file sources only while the
    # source files persist), so each batch's rows are frozen eagerly
    # before joining the state
    state = {"blocks": initial_blocks, "graph": initial_graph.localCheckpoint()}

    def on_batch(batch_df, batch_id):
        new = batch_df.select(id_col, vec_col).localCheckpoint()
        if new.isEmpty():
            return
        state["graph"] = graph_ann.insert_into_graph(
            state["blocks"], state["graph"], new, m=m, id_col=id_col, vec_col=vec_col
        ).localCheckpoint()
        state["blocks"] = state["blocks"].unionByName(new)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
        .writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state["blocks"], state["graph"]


def streaming_cdc_merge(
    spark: SparkSession,
    path: str,
    schema: StructType,
    initial_store: DataFrame,
    key: str,
    update_cols: list[str],
    delete_col: str,
    max_files_per_trigger: int = 1,
):
    """G9 — streaming CDC apply: a change stream (upserts + tombstones)
    folded into a table via ``dynamic.merge_upsert`` per micro-batch
    through foreachBatch — the Structured-Streaming half of the
    Delta/Iceberg \"MERGE INTO target USING changes\" loop (every CDC
    ingestion pipeline's shape; parity: insertion.py/deletion.py as one
    continuous apply instead of separate jobs).

    Runs the stream to completion (availableNow) and returns the final
    store DataFrame. With at most one change per key in the drop, the
    final state is provably independent of how the files split into
    micro-batches — which is what the oracle checks.

    State note: the evolving store is checkpointed per batch; on a
    cluster each foreachBatch merge is the transactional sink commit,
    the same single-shuffle full-outer join at every step.
    """
    from ..operators.dynamic import merge_upsert

    state = {"store": initial_store.localCheckpoint()}

    def on_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        state["store"] = merge_upsert(
            state["store"], batch_df, key, update_cols=update_cols, delete_col=delete_col
        ).localCheckpoint()

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
        .writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state["store"]


def observe_admission_metrics(stream_df: DataFrame, name: str = "admission") -> DataFrame:
    """G10: pipeline observability — attach ``observe()`` metrics to an
    admission/gate stream: rows admitted, mean quality, and token volume
    per micro-batch. The metrics ride the existing plan (no second scan,
    no extra action) and surface in every ``StreamingQueryProgress`` under
    ``observedMetrics[name]`` — the hook a production pipeline exports to
    its metrics system, and the Spark-native replacement for side-effect
    accumulators. Works identically on a batch DataFrame (metrics appear
    on the query execution)."""
    return stream_df.observe(
        name,
        F.count(F.lit(1)).alias("n_admitted"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
        F.sum("n_tokens").alias("token_volume"),
    )


def run_observed_admission(
    spark: SparkSession,
    incoming_dir: str,
    corpus: DataFrame,
    quality_min: float = 0.3,
    timeout_s: int = 300,
):
    """Run the G5 admission stream with G10 metrics attached (availableNow
    → memory sink); returns (admitted_df, per_batch_metrics) where the
    metrics list holds one dict per micro-batch from the query's recent
    progress — admitted counts, mean quality, token volume."""
    name = f"observed_admission_{next(_MEMORY_SINK_SEQ)}"
    observed = observe_admission_metrics(
        streaming_corpus_filter(spark, incoming_dir, corpus, quality_min), name
    )
    q = (
        observed.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    # recentProgress is RING-BUFFERED (spark.sql.streaming.numRecentProgressUpdates,
    # default 100): beyond the cap the earliest batches' metrics silently
    # vanish and the totals undercount. Fail loudly instead — callers with
    # more micro-batches than the cap must raise the session conf (the
    # registry pins 10000) or aggregate via a StreamingQueryListener.
    cap = int(spark.conf.get("spark.sql.streaming.numRecentProgressUpdates", "100"))
    progress = list(q.recentProgress)
    if len(progress) >= cap:
        raise RuntimeError(
            f"observed admission ran {len(progress)}+ micro-batches — at or above "
            f"the progress retention cap ({cap}); earliest observedMetrics may "
            "have been dropped. Raise spark.sql.streaming.numRecentProgressUpdates."
        )
    metrics = []
    for p in progress:
        om = p.get("observedMetrics") if isinstance(p, dict) else p.observedMetrics
        if om and name in om:
            row = om[name]
            metrics.append(row.asDict() if hasattr(row, "asDict") else dict(row))
    return spark.table(name), metrics
