"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic document corpus generated EXECUTOR-SIDE.

Why it exists: benchmark/stress corpora at 100TB can't be materialized
through the driver or shipped as files — a generating data source
produces any requested volume directly in the executors, partitioned,
with no I/O. The Spark 4 Python DataSource API makes that a first-class
``spark.read.format(...)`` citizen (same pattern as a REST/queue/custom-
format connector — ``partitions()`` plans the split, ``read(part)``
streams one split's rows).

Determinism contract: row content is a pure function of ``doc_id`` (md5-
seeded word choice, no RNG state), so any partitioning of the id range
yields the same corpus — reruns, retries, and different parallelism all
agree. Vocabulary/shape mirror the fixture ``documents`` table so every
text operator (dedup, quality, packing) runs unmodified on generated
data.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "window order data column join small line customer query group big "
    "vector stream filter sort the a"
).split()

_LANGS = ("en", "en", "en", "zh", "es", "de")  # en-heavy mixture

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _doc(doc_id: int, min_tokens: int, max_tokens: int) -> tuple:
    """Pure function of doc_id → one document row."""
    h = hashlib.md5(f"docgen|{doc_id}".encode()).digest()
    span = max_tokens - min_tokens + 1
    n_tok = min_tokens + int.from_bytes(h[:4], "big") % span
    words = []
    seed = h
    for i in range(n_tok):
        if i % 16 == 0:
            seed = hashlib.md5(seed + bytes([i % 251])).digest()
        words.append(_VOCAB[seed[i % 16] % len(_VOCAB)])
    text = " ".join(words)
    lang = _LANGS[h[5] % len(_LANGS)]
    source = f"src{h[6] % 8}"
    return (doc_id, text, lang, source, len(text))


class _GenPartition(InputPartition):
    def __init__(self, start: int, end: int, min_tokens: int, max_tokens: int):
        self.start, self.end = start, end
        self.min_tokens, self.max_tokens = min_tokens, max_tokens


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.min_tokens = int(options.get("min_tokens", 40))
        self.max_tokens = int(options.get("max_tokens", 120))

    def partitions(self):
        per = -(-self.n_docs // self.n_partitions)  # ceil
        return [
            _GenPartition(lo, min(lo + per, self.n_docs),
                          self.min_tokens, self.max_tokens)
            for lo in range(0, self.n_docs, per)
        ]

    def read(self, partition: _GenPartition):
        for doc_id in range(partition.start, partition.end):
            yield _doc(doc_id, partition.min_tokens, partition.max_tokens)


class SyntheticDocsDataSource(DataSource):
    """`spark.read.format("synthetic_docs").option("n_docs", N).load()`"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
