"""Streaming hashed-TF featurization front → frozen-quantizer celled
index (VERDICT r6 next-round #7).

The hashing-trick featurization (functions/text.hashed_tf) is a PURE
MAP — one md5 per token, fixed output dim, no trained vocabulary — so
an ingest stream can emit hashed vectors per micro-batch and maintain
the celled ANN index incrementally: per batch, featurize, assign
against the FROZEN seed quantizer (the operators/ivf
``append_to_ivf_index`` pattern — assignment depends only on the
vector and the centroids, so streamed assignments are bit-identical to
a batch recompute), and land the postings with the repo's idempotence
discipline (every write OVERWRITES the batch's own ``batch_id=N``
partition; a foreachBatch redelivery converges — same as
operators/incremental_dedup and streaming/serving).

On-disk layout at ``{path}``:

- ``centroids/``                (cell, cent): the frozen seed quantizer
  — the k lowest-id vectors of the build corpus (ivf.seed_centroids),
  exactly the batch twin's quantizer,
- ``postings/batch_id=N/cell=K/`` (vec_id, v, nrm): assigned vectors,
  cell-partitioned so a probe's cell predicate prunes directories,
- ``counts/batch_id=N/``        (n): completion marker, written LAST.

Parity contract (tests/test_streaming_hashed_tf.py): with the cell
count sized for the FULL corpus (ivf_cell_count(n_total) — a stream
sizes its quantizer for the corpus it expects, or refits) and a build
slice containing the k seed docs, ``hashed_tf_knn_on_index`` over the
streamed index equals the batch ``hashed_tf_knn_celled`` query
row-for-row: same frozen quantizer, same struct-min assignment, same
rank-invariant probe scoring (c·c − 2·q·c ordered-fold dots), same
cosine top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_processing_spark.operators.store import (
    committed_batches as _committed,
    write_batch_marker,
)
from bigdata_processing_spark.sources.writers import literal_df


def _featurize(docs: DataFrame, dim: int, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    from bigdata_processing_spark.functions import text as T
    from bigdata_processing_spark.functions import vectors as V

    # a null-text doc has no tokens to hash (hashed_tf(null) is null) —
    # it cannot be featurized or probed, so it is excluded from the
    # index rather than riding through assignment as a null vector
    # (ADVICE r10: a null v aborted the intexact assigner's np.stack)
    return docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        T.hashed_tf(F.col(text_col), dim).alias("v"),
    ).withColumn("nrm", V.norm(F.col("v")))


def _self_dot(c: list[float]) -> float:
    acc = 0.0
    for x in c:
        acc += x * x
    return acc  # same sequential fold as list_dot_product / V.dot


def _write_postings(path: str, batch_id: int, asg: DataFrame) -> int:
    spark = asg.sparkSession
    asg = asg.persist()
    n = asg.count()
    asg.select("vec_id", "v", "nrm", "cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/postings/batch_id={batch_id}")
    write_batch_marker(spark, path, batch_id, n)
    asg.unpersist()
    return n


def build_hashed_tf_index(docs: DataFrame, path: str, n_cells: int,
                          dim: int | None = None) -> int:
    """Featurize ``docs`` and build the celled index as batch 0, with
    the quantizer FROZEN to the ``n_cells`` lowest-id vectors. Size
    ``n_cells`` for the corpus the stream will grow into
    (ivf_cell_count over the expected total) — the quantizer is frozen
    between refits, exactly like the MinHash stop list."""
    from bigdata_processing_spark.operators.ivf import (
        seed_centroids,
        seeded_assign_cells_intexact,
    )
    from bigdata_processing_spark.queries.nlp import HASHED_TF_DIM

    dim = dim if dim is not None else HASHED_TF_DIM
    spark = docs.sparkSession
    # full-corpus build: spread the CPU-bound featurize + argmin across
    # every core (parquet splits under-parallelize the small-byte frame)
    vecs = _featurize(docs, dim).repartition(
        2 * docs.sparkSession.sparkContext.defaultParallelism
    ).persist()
    cents = seed_centroids(vecs, n_cells, vec_col="v", id_col="vec_id")
    literal_df(
        spark, [(i, list(c)) for i, c in enumerate(cents)],
        "cell int, cent array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    # hashed-TF counts are whole-valued: the exact numpy assigner is
    # bit-equal to the ordered fold (operators/ivf docstring proof)
    asg = seeded_assign_cells_intexact(
        vecs, cents, id_col="vec_id", e_col="v", carry=("v", "nrm")
    )
    n = _write_postings(path, 0, asg)
    vecs.unpersist()
    return n


def _read_centroids(spark: SparkSession, path: str) -> list[list[float]]:
    rows = spark.read.parquet(f"{path}/centroids").collect()
    by_id = {r.cell: list(r.cent) for r in rows}
    return [by_id[i] for i in sorted(by_id)]


def committed_batches(spark: SparkSession, path: str) -> set[int]:
    return _committed(spark, path)


def append_hashed_tf_batch(path: str, docs: DataFrame, batch_id: int,
                           dim: int | None = None) -> int:
    """Fold one ingest batch into the index: featurize (pure map),
    assign against the FROZEN centroids (broadcast struct-min — no
    shuffle beyond the partitioned write), overwrite the batch's own
    postings partition. Replay-idempotent."""
    from bigdata_processing_spark.operators.ivf import (
        seeded_assign_cells_intexact,
    )
    from bigdata_processing_spark.queries.nlp import HASHED_TF_DIM

    dim = dim if dim is not None else HASHED_TF_DIM
    spark = docs.sparkSession
    cents = _read_centroids(spark, path)
    vecs = _featurize(docs, dim)
    # frozen seed centroids are whole-valued hashed-TF vectors: exact
    # numpy assigner, bit-equal to the fold (operators/ivf)
    asg = seeded_assign_cells_intexact(
        vecs, cents, id_col="vec_id", e_col="v", carry=("v", "nrm")
    )
    return _write_postings(path, batch_id, asg)


def run_hashed_tf_index_stream(stream: DataFrame, path: str,
                               checkpoint: str | None = None,
                               dim: int | None = None):
    """Streaming front: per micro-batch, featurize + frozen-cell append.
    Exactly-once by idempotence (batch-keyed partition overwrites, the
    counts marker written last). Returns the started query."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id) + 1  # batch 0 is the build
        append_hashed_tf_batch(path, batch_df, batch_id=bid, dim=dim)

    writer = stream.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def hashed_tf_knn_on_index(spark: SparkSession, path: str,
                           n_probe: int | None = None,
                           top_k: int = 3) -> DataFrame:
    """kNN over the streamed index with the batch twin's exact search
    semantics (queries = indexed vec_id % 100 == 0, probe ranking by
    the rank-invariant c·c − 2·q·c, cosine top-k) — the parity surface.

    Scale shape: only COMMITTED batches are read; the union of probed
    cells becomes a literal ``isin`` on the cell partition column, so
    the candidate scan lists probed directories only (the
    ivf_search_on_disk discipline)."""
    from bigdata_processing_spark.functions import vectors as V
    from bigdata_processing_spark.queries.nlp import HASHED_TF_N_PROBE

    n_probe = n_probe if n_probe is not None else HASHED_TF_N_PROBE
    committed = committed_batches(spark, path)
    posts = spark.read.parquet(f"{path}/postings").filter(
        F.col("batch_id").isin(sorted(committed))
    )
    cents = _read_centroids(spark, path)
    cdf = literal_df(
        spark, [(i, list(c), _self_dot(c)) for i, c in enumerate(cents)],
        "cell int, cent array<double>, cc double",
    )
    qdf = posts.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    probe_score = F.col("cc") - 2.0 * V.dot(F.col("qe"), F.col("cent"))
    wq = Window.partitionBy("qid").orderBy(probe_score.asc(), F.col("cell").asc())
    probes = (
        qdf.crossJoin(F.broadcast(cdf))
        .withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("qid", "qe", "qn", "cell")
    ).persist()
    cells = sorted(r.cell for r in probes.select("cell").distinct().collect())
    pruned = posts.filter(F.col("cell").isin(cells))
    joined = pruned.join(
        F.broadcast(probes),
        (pruned["cell"] == probes["cell"]) & (pruned["vec_id"] != probes["qid"]),
    )
    cos = V.dot(F.col("qe"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid").asc())
    out = (
        joined.select("qid", F.col("vec_id").alias("cid"), cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= top_k)
        .orderBy("qid", "rn")
    )
    probes.unpersist(blocking=False)
    return out
