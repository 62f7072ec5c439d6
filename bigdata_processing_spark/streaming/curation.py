"""Streaming curation front-end: the stateless + exactly-once-ish part
of the corpus-curation chain (pipelines/curation.py) applied at ingest
time — quality floor, then exact dedup by content fingerprint — so the
batch pipeline downstream starts from a pre-screened landing zone.

Near-dup dedup and decontamination intentionally stay BATCH: they need
corpus-global state (LSH buckets over everything seen, the holdout
vocabulary) that the streaming MinHash operator (streaming/dedup.py)
bounds differently; the division is quality+exact at the edge,
global passes in batch — the standard lambda split for corpus prep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import table_path
from bigdata_processing_spark.functions import text as T
from bigdata_processing_spark.pipelines.curation import QUALITY_MIN, _quality_score

_DOCS_SCHEMA_HINT = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_documents_stream(spark: SparkSession, sf_dir: str,
                          max_files_per_trigger: int | None = None) -> DataFrame:
    """documents as a file-source stream (staged symlink directory, same
    pattern as streaming/windows.read_events_stream)."""
    import os
    import tempfile

    src = table_path(sf_dir, "documents")
    stage = os.path.join(
        tempfile.gettempdir(), "bdps_docstream",
        sf_dir.strip("/").replace("/", "_"),
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)

    reader = spark.readStream.schema(_DOCS_SCHEMA_HINT)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stage)


def run_curation_append_stream(
    stream: DataFrame,
    out_path: str,
    holdout: DataFrame | None = None,
    quality_min: float = QUALITY_MIN,
    checkpoint: str | None = None,
):
    """Streaming front for INCREMENTAL curation: per micro-batch, run
    :func:`pipelines.curation.curate_append` against the state built by
    ``curate_corpus_with_state`` — exact dedup vs the bucketed
    fingerprint store, near-dup via the incremental MinHash probe,
    quality floor, decontamination — then record the batch's stage
    funnel under ``{out}.state/stage_log/batch_id=N/`` (state dir, not
    the appends dir — survivor partition discovery must see only
    ``batch_id=N`` directories there).

    Exactly-once by IDEMPOTENCE, the same discipline as
    operators/incremental_dedup.run_incremental_dedup_stream: every
    write inside curate_append is an overwrite of the batch's OWN
    directories keyed by the Structured Streaming batch id (+1 — id 0
    is the base-corpus state), its index probe/fp scan exclude the
    batch's own id, and the stage log is overwritten last, so a
    foreachBatch redelivery converges to byte-identical survivors and
    an identical funnel (tests/test_curation_append.py replay test).
    Returns the started query."""
    from bigdata_processing_spark.pipelines.curation import (
        _state_path,
        curate_append,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id) + 1  # batch 0 is the base-corpus build
        stats = curate_append(
            batch_df.sparkSession, out_path, batch_df, holdout=holdout,
            quality_min=quality_min, batch_id=bid,
        )
        from bigdata_processing_spark.sources.writers import literal_df

        literal_df(
            batch_df.sparkSession,
            [(s.stage, i, s.docs_in, s.docs_out) for i, s in enumerate(stats)],
            "stage string, stage_idx int, docs_in bigint, docs_out bigint",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{_state_path(out_path)}/stage_log/batch_id={bid}"
        )

    writer = stream.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_append_funnel(spark: SparkSession, out_path: str) -> DataFrame:
    """Per-batch stage funnel recorded by the streaming append sink."""
    from bigdata_processing_spark.pipelines.curation import _state_path

    return (
        spark.read.parquet(f"{_state_path(out_path)}/stage_log")
        .orderBy("batch_id", "stage_idx")
    )


def curate_stream(docs: DataFrame, quality_min: float = QUALITY_MIN) -> DataFrame:
    """Quality floor + exact dedup on the content fingerprint.

    ``dropDuplicates`` holds one fingerprint per unique doc in state —
    at production volumes bound it by ingest-time watermark
    (``dropDuplicatesWithinWatermark`` over an arrival timestamp; the
    fixture docs carry no event time, and re-crawl dups arrive close
    together, so a time-bounded fingerprint window is the real-world
    configuration). Works identically on a batch frame (parity-tested).
    """
    scored = docs.filter(_quality_score() >= quality_min)
    return scored.withColumn("fp", T.fingerprint(F.col("text"))).dropDuplicates(
        ["fp"]
    )
