"""Structured Streaming incarnation of the validation suite.

The reference is a hand-rolled stateful stream processor: poll one Kafka
message, run the full kernel, checkpoint, repeat
(/root/reference/util/op_base.py:80-108 + algo/operator.py:154-187).
The Spark-native analog is Structured Streaming with ``foreachBatch``:
each micro-batch is validated with the SAME batch check suite and
committed to the SAME manifest table — one code path for batch and
streaming (the point of the DataFrame API), with Spark's checkpoint dir
providing the reference's crash-restart liveness (T8,
/root/reference/main.py:62-70) and the manifest providing idempotent
exactly-once-ish state (T5).

Late data: the reference drops events >250 days older than operator
start (/root/reference/algo/operator.py:156-157). For an event-timed
stream, ``with_staleness_filter`` is that gate; in a watermarked
aggregation the same role is played by ``withWatermark``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..checks.base import CheckSpec
from ..plans.manifest import ManifestRun, run_with_manifest


def with_staleness_filter(df: DataFrame, ts_col: str, cutoff) -> DataFrame:
    """Drop rows with event time older than ``cutoff`` (P5/T4 late-data gate)."""
    return df.filter(F.col(ts_col) >= F.lit(cutoff))


def validate_stream(
    stream_df: DataFrame,
    manifest_dir: str,
    checkpoint_dir: str,
    suite: list[CheckSpec] | None = None,
    partition_col: str = "lang",
    trigger_available_now: bool = True,
    on_batch: Callable[[ManifestRun, int], None] | None = None,
    freeze_drift_baseline: bool = False,
    violations_sink: str | None = None,
    warn_skipped_rows: bool = True,
    sink_kwargs: dict | None = None,
    corrupt_dir: str | None = None,
) -> StreamingQuery:
    """Validate a stream of file rows micro-batch by micro-batch.

    Each batch runs the batch suite via ``run_with_manifest``: partitions
    already committed for this suite are anti-joined away, so a partition
    is validated when its data first appears and revalidation only
    happens after a manifest invalidation (re-baseline cadence, T3).
    Batch ids are monotonic and the manifest append is the only side
    effect, so replays after a crash re-run only uncommitted work —
    the streaming-native version of the reference's save_data-per-message
    checkpointing without the O(n) rewrite per event.

    ``corrupt_dir``: quarantine sink for landed csv/json streams
    (``read_input_stream``). When the batch frame carries a
    ``_corrupt_record`` column, each micro-batch is split INSIDE
    foreachBatch — one scan, one checkpoint, never a second query
    re-reading the source — corrupt lines append to ``corrupt_dir``
    stamped with the batch's run_id BEFORE the manifest commit (the
    violations-before-manifest ordering: a committed batch implies its
    quarantine rows are persisted), and only clean rows are validated.
    Replayed batches re-append their corrupt rows — at-least-once, same
    as the violations sink; dedupe by run_id downstream.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        run_id = f"stream-{batch_id:09d}"
        if corrupt_dir is not None and "_corrupt_record" in batch_df.columns:
            from ..sources.registry import split_corrupt

            batch_df, corrupt = split_corrupt(batch_df)
            corrupt.withColumn("run_id", F.lit(run_id)).write.mode(
                "append"
            ).parquet(corrupt_dir)
        run = run_with_manifest(
            batch_df,
            manifest_dir,
            suite=suite,
            partition_col=partition_col,
            # zero-padded so run ids SORT like batch ids: the sketch
            # stores' latest-run selection (novelty_stats, max_by
            # readers) is lexicographic, and "stream-10" < "stream-9"
            # would misorder past ten batches
            run_id=run_id,
            freeze_drift_baseline=freeze_drift_baseline,
            violations_sink=violations_sink,
            count_skipped_rows=warn_skipped_rows,
            # pass-through for the sketch/schema sinks (sketches_dir,
            # kmv_sketches_dir, membership_dir, schemas_dir, ...): every
            # committed micro-batch feeds the same cross-run stores the
            # batch path writes
            **(sink_kwargs or {}),
        )
        if warn_skipped_rows and run.skipped_rows:
            # A partition is committed the first batch its data appears
            # in; rows of the SAME partition arriving in a later batch
            # (file sources with maxFilesPerTrigger split partitions
            # across triggers) are pruned and never validated. Surface
            # that loudly instead of silently under-covering — fix by
            # triggering with availableNow/larger batches, or by
            # invalidating the suite_id to force revalidation.
            import logging

            logging.getLogger(__name__).warning(
                "batch %d: %d row(s) of already-committed partitions were "
                "skipped (partition split across micro-batches — these rows "
                "were NOT validated)",
                batch_id,
                run.skipped_rows,
            )
        if on_batch is not None:
            on_batch(run, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
