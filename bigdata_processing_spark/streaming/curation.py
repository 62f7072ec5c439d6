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
