"""Deduplication operators over ``documents``: exact (fingerprint),
MinHash+LSH banding, n-gram Jaccard verification, SimHash.

North-star LLM-pipeline surface (SURVEY.md §2.12). Design notes for
100TB scale:

- Exact dedup is a hash-groupBy on a 128-bit fingerprint — one shuffle of
  (fingerprint, doc_id), never the document bodies.
- Near-dup is the classic two-stage MinHash pipeline: per-doc signatures
  (one pass, map-side), LSH band-bucket self-join to generate CANDIDATE
  pairs (shuffle is proportional to collisions, not n²), then exact
  n-gram Jaccard verification only on candidates. No all-pairs product
  ever materializes.
- Hashes are md5-derived (functions/text.py::hash64) so every stage is
  reproducible AND expressible in ANSI SQL → DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table, table_rows
from bigdata_processing_spark.functions import text as T
from bigdata_processing_spark.queries import register
from bigdata_processing_spark.sources.writers import literal_df
from bigdata_processing_spark.thresholds import (
    AUDIT_SAMPLE_DOCS,
    CONTAINMENT_THRESHOLD,
    COSINE_NEARDUP_THRESHOLD,
    EDIT_LEN_GAP_MULT,
    EDIT_SIM_THRESHOLD,
    EST_AGREE_MIN,
    JACCARD_THRESHOLD,
    MAX_BUCKET,
    MAX_BUCKET_REPS,
    MAX_DF,
    MAX_DF_FRAC,
    N_BANDS,
    N_HASHES,
    SEMDEDUP_SWEEP_EPS,
    edit_len_gap_mult,
    est_agree_min,
)

# Shared SQL fragments for the DuckDB oracles -------------------------------

_SQL_SHINGLES = """
        toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
            FROM documents
        ),
        shset AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                                                i -> tk[i] || '_' || tk[i + 1])) AS sh
            FROM toks
        ),
        shex AS (
            SELECT doc_id, unnest(sh) AS s FROM shset
        )
"""

_SQL_SIG = (
    "sig AS (SELECT doc_id, "
    + ", ".join(f"min({T.minhash_hash_sql('s', i)}) AS h{i}" for i in range(N_HASHES))
    + " FROM shex GROUP BY doc_id)"
)


def _shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.word_shingles(F.col("text"), 2).alias("sh"))


def _sig_from_shex(shex: DataFrame, broadcast_vocab: bool = True) -> DataFrame:
    """(doc_id, shingle) → minhash signature h0..h{k-1}.

    Dictionary-encoded hashing: digests are computed once per DISTINCT
    shingle and joined back (n-gram vocabularies are far smaller than
    occurrence counts — 931 vs 256k at sf0.1; 2x on the full pipeline
    WITH the explicit broadcast hint — AQE does not convert this join on
    its own). ``broadcast_vocab=False`` drops the hint for corpus scales
    where the vocabulary outgrows a broadcast (_scored_candidates passes
    the same uncompressed-size regime switch that gates its verify join): the
    join degrades to a shuffle keyed by shingle, still one digest per
    distinct shingle."""
    vocab = shex.select("s").distinct().select(
        "s",
        *[h.alias(f"v{i}") for i, h in enumerate(T.minhash_hashes(F.col("s"), N_HASHES))],
    )
    # big regime: hint MERGE, don't merely drop the broadcast hint.
    # Catalyst's static size estimate through explode+aggregate is the
    # compressed file size shrunk by selectivity guesses — at the 100×
    # proof corpus it undercounted a ~1 GB relation below the 10 MB
    # auto-broadcast threshold and OOM'd the driver. The explicit
    # sort-merge hint makes the big-regime plan independent of the
    # estimator.
    vocab = F.broadcast(vocab) if broadcast_vocab else vocab.hint("merge")
    return (
        shex.join(vocab, "s")
        .groupBy("doc_id")
        .agg(*[F.min(f"v{i}").alias(f"h{i}") for i in range(N_HASHES)])
    )


def _signature_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → minhash signature columns h0..h{k-1} (one shuffle).

    The UNPRUNED dictionary vocabulary grows with the corpus (unlike
    the stop list, which is bounded by shingles-per-doc/MAX_DF_FRAC),
    so the dictionary join rides the shared regime switch — the clone
    probe corpora never exercise this (clone vocabularies don't grow),
    which is exactly why the gate must be structural, not measured."""
    shex = _shingle_df(spark, sf_dir).select("doc_id", F.explode("sh").alias("s"))
    return _sig_from_shex(shex, broadcast_vocab=_fits_broadcast(sf_dir))


def _pruned_sig_df(
    spark: SparkSession, sf_dir: str,
    max_df: int = MAX_DF, max_df_frac: float = MAX_DF_FRAC,
) -> DataFrame:
    """doc_id → signature over the DF-PRUNED shingle set — the exact
    signatures the guarded LSH pipeline bands and prefilters on
    (_scored_candidates' sig / the twins' sig_p).

    Round 9: served from the SESSION memo _scored_candidates fills (the
    audit queries call both — pre-memo each cold audit built the whole
    shingle→df→signature chain twice). On a miss the fused one-shuffle
    build runs here and fills the same memo."""
    # the resolved regime is part of the key (ADVICE r9): a memo hit must
    # not hand back a signature frame PLANNED under a different broadcast
    # regime than the caller's (e.g. a cap override forcing sort-merge)
    fits = _fits_broadcast(sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, max_df, max_df_frac, fits)
    cached = _PSIG_MEMO.get(key)
    if cached is not None:
        return cached
    import math

    shset = _shingle_df(spark, sf_dir)
    # footer count == shset.count() (row-preserving select of documents);
    # shset is NOT persisted here, so the count job bought nothing (r12)
    n_docs = table_rows(sf_dir, "documents")
    shex = shset.select("doc_id", F.explode("sh").alias("s"))
    eff = max(max_df, int(math.ceil(max_df_frac * n_docs)))
    sig = _fused_pruned_sig(shex, eff, fits).persist()
    _PSIG_MEMO[key] = sig
    return sig


def _fused_pruned_sig(shex: DataFrame, eff_df: int, fits_broadcast: bool) -> DataFrame:
    """FUSED df-prune + signature dictionary (round 9): ONE groupBy(s)
    computes document frequency, and the kept vocabulary rows are
    hash-projected into the minhash dictionary directly. (doc_id, s)
    rows are unique — word_shingles emits distinct shingles per doc —
    so count(*) == countDistinct(doc_id) without the two-phase distinct
    aggregation. vs the r8 shape (df shuffle → keep join → separate
    vocab DISTINCT shuffle → dictionary join) this removes one full
    vocabulary shuffle and one scan+join of the occurrence stream: the
    dominant fixed cost of every cold family member, and a whole
    shuffle of a 100-TB corpus's vocabulary at scale. Regime switch on
    the dictionary join: broadcast small, MERGE hint big."""
    vocab = (
        shex.groupBy("s").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= eff_df)
        .select(
            "s",
            *[
                h.alias(f"v{i}")
                for i, h in enumerate(T.minhash_hashes(F.col("s"), N_HASHES))
            ],
        )
    )
    vocab = F.broadcast(vocab) if fits_broadcast else vocab.hint("merge")
    return (
        shex.join(vocab, "s")
        .groupBy("doc_id")
        .agg(*[F.min(f"v{i}").alias(f"h{i}") for i in range(N_HASHES)])
    )


# ---------------------------------------------------------------------------
# Exact dedup summary: corpus → fingerprint groups (keep-first policy is
# min(doc_id) per group; summary counts are the dedup report).
# ---------------------------------------------------------------------------
@register(
    "dedup_exact_summary",
    oracle="""
        SELECT count(*) AS n_docs,
               count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
                   AS n_unique,
               count(*) - count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
                   AS n_removed
        FROM documents
    """,
)
def dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = T.fingerprint(F.col("text"))
    return docs.select(fp.alias("fp")).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        (F.count("*") - F.countDistinct("fp")).alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# MinHash signatures (sample): the per-doc signature stage in isolation,
# checkable value-by-value against the oracle.
# ---------------------------------------------------------------------------
@register(
    "minhash_signatures_sample",
    oracle=f"""
        WITH {_SQL_SHINGLES}, {_SQL_SIG}
        SELECT doc_id, {', '.join(f'h{i}' for i in range(N_HASHES))}
        FROM sig
        WHERE doc_id < 25
        ORDER BY doc_id
    """,
)
def minhash_signatures_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A doc's signature depends only on its own shingles, so the sample
    # filter pushes below the whole pipeline — signatures are computed
    # for 25 docs, not the corpus (the oracle filters after aggregation;
    # results are identical by independence).
    shex = (
        _shingle_df(spark, sf_dir)
        .filter(F.col("doc_id") < 25)
        .select("doc_id", F.explode("sh").alias("s"))
    )
    return _sig_from_shex(shex).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Full near-dup pipeline: MinHash → LSH banding → candidate pairs →
# exact bigram-Jaccard verification ≥ 0.8. At scale the only joins are
# (a) the band-bucket self-join (collision-bounded) and (b) candidate
# pairs back to shingle sets.
# ---------------------------------------------------------------------------
_SQL_BANDS = (
    "bands AS (SELECT doc_id, unnest(["
    + ", ".join(
        f"md5(concat_ws('_', {b}, h{2*b}, h{2*b+1}))" for b in range(N_BANDS)
    )
    + "]) AS bk FROM sig)"
)

# The PRODUCTION candidate pipeline (guards ON — the default every family
# consumer shares): RELATIVE document-frequency pruning before signatures
# (shingles in > max(MAX_DF, ceil(MAX_DF_FRAC·n_docs)) docs are
# boilerplate: no near-dup signal, dominant shuffle volume — the cap must
# scale with the corpus or it prunes everything at 10×, see thresholds.py)
# and an LSH bucket cap (a B-doc bucket makes B² pairs; capping bounds
# the worst key). Over-cap buckets are NOT skipped whole (that silently
# kept large non-identical near-dup families — boilerplate templates,
# the dominant dup class in web corpora; exact dedup only catches their
# identical subsets): each over-cap bucket keeps ceil(B/MAX_BUCKET)
# hash-ordered REPRESENTATIVES and pairs every member against the
# representatives only — O(B·B/MAX_BUCKET) pairs instead of O(B²), a
# star per representative that the connected-components stage merges
# into the full family cluster. Hash ordering (md5 of doc_id) makes the
# sample deterministic and ingestion-order-free, and is reproduced
# verbatim by the twin SQL. Produces the ``cand`` CTE; internal names
# are suffixed _p so unguarded ``sig``/``bands`` (audit queries) can
# coexist in the same WITH list.
_SQL_CAND_GUARDED = f"""
        dfreq AS (SELECT s, count(DISTINCT doc_id) AS df FROM shex GROUP BY s),
        ncorp AS (SELECT count(*) AS n_docs FROM documents),
        shex_p AS (
            SELECT shex.doc_id, shex.s FROM shex JOIN dfreq USING (s)
            CROSS JOIN ncorp
            WHERE df <= greatest({MAX_DF},
                                 CAST(ceil({MAX_DF_FRAC} * ncorp.n_docs) AS BIGINT))
        ),
        sig_p AS (SELECT doc_id, """ + ", ".join(
    f"min({T.minhash_hash_sql('s', i)}) AS h{i}" for i in range(N_HASHES)
) + f""" FROM shex_p GROUP BY doc_id),
        bands_p AS (SELECT doc_id, unnest([""" + ", ".join(
    f"md5(concat_ws('_', {b}, h{2*b}, h{2*b+1}))" for b in range(N_BANDS)
) + f"""]) AS bk FROM sig_p),
        bsz AS (SELECT bk, count(*) AS n FROM bands_p GROUP BY bk),
        reps_p AS (
            SELECT bk, doc_id FROM (
                SELECT a.bk, a.doc_id, z.n,
                       row_number() OVER (
                           PARTITION BY a.bk
                           ORDER BY md5(CAST(a.doc_id AS VARCHAR)), a.doc_id
                       ) AS rn
                FROM bands_p a JOIN bsz z ON a.bk = z.bk
                WHERE z.n > {MAX_BUCKET}
            ) WHERE rn <= least(CAST(ceil(n / CAST({MAX_BUCKET} AS DOUBLE)) AS BIGINT), {MAX_BUCKET_REPS})
        ),
        cand AS (
            SELECT DISTINCT d1, d2 FROM (
                SELECT a.doc_id AS d1, b.doc_id AS d2
                FROM bands_p a
                JOIN bands_p b ON a.bk = b.bk AND a.doc_id < b.doc_id
                JOIN bsz ON a.bk = bsz.bk
                WHERE bsz.n <= {MAX_BUCKET}
                UNION ALL
                SELECT least(r.doc_id, m.doc_id) AS d1,
                       greatest(r.doc_id, m.doc_id) AS d2
                FROM reps_p r
                JOIN bands_p m ON r.bk = m.bk AND r.doc_id <> m.doc_id
            )
        )
"""

# Two-stage verification (round 7): the signature-estimate PREFILTER
# between candidate generation and exact verification — agreeing-
# component count of the two signatures must reach EST_AGREE_MIN (4 of
# 8 at the default threshold/margin, thresholds.py) before a pair pays
# the exact shingle-set intersection. ~95% of guarded candidates die
# here at measured-zero true-pair loss (fixture numbers in
# thresholds.py; minhash_prefilter_audit records them per corpus).
# Composes after {_SQL_CAND_GUARDED} — sig_p is the same pruned
# signature table the bands were built from.
_SQL_EST_AGREE_AB = (
    "("
    + " + ".join(f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(N_HASHES))
    + ")"
)
_SQL_CAND_PREF = f"""
        candp AS (
            SELECT c.d1, c.d2 FROM cand c
            JOIN sig_p a ON c.d1 = a.doc_id
            JOIN sig_p b ON c.d2 = b.doc_id
            WHERE {_SQL_EST_AGREE_AB} >= {EST_AGREE_MIN}
        )
"""

# Session-scoped memo of the verified-pairs result: dup_clusters re-ran
# the whole MinHash→LSH→verify pipeline that minhash_lsh_dup_pairs had
# just computed (~75% of dup_clusters' 10×-scale cost, BASELINE.md).
# Keyed by (Spark applicationId, sf_dir, threshold); the cached DataFrame is
# persist()ed so the second consumer reads the materialized pairs
# (pairs ≪ corpus) instead of re-shuffling the corpus.
_PAIR_MEMO: dict[tuple[str, str, float], DataFrame] = {}
_CAND_MEMO: dict[tuple[str, str], DataFrame] = {}
# raw (d1, d2) candidate pairs BEFORE the exact-overlap join — the
# verifiers that never read the overlap counts (the edit-distance
# family) stop paying the array_intersect join for counts they discard
# (round 11, the sf100 probe: 167 s / 75 GB of spill at 100× for
# numbers thrown away).
_RAWCAND_MEMO: dict[tuple, DataFrame] = {}
# (appId, sf_dir, max_df, max_df_frac, fits_broadcast) → persisted PRUNED
# signature frame (the resolved regime keys the memo so a cap override
# can't be served a frame planned under the other regime).
# Filled by _scored_candidates, read by _pruned_sig_df — the audit
# queries consume both, and pre-memo each cold audit run built the
# whole shingle→df→signature chain twice (r8 verdict wrong-item #2).
_PSIG_MEMO: dict[tuple[str, str, int, float, bool], DataFrame] = {}
# per-call persists consumed lazily by callers (can't be unpersisted at
# create time) — evicted by clear_dedup_memos()
_LOOSE_PERSISTS: list[DataFrame] = []


# Registered queries that read the shared session memos: their
# pipeline-order bench timing attributes the common subtree to whichever
# ran first, so bench.py re-times them COLD (memos cleared) and the
# regression gate reads the cold column (VERDICT r03 watch item #3).
MEMO_FAMILY = (
    "lsh_band_sweep",
    "minhash_lsh_dup_pairs",
    "dup_clusters",
    "dedup_survivors",
    "cross_source_dup_matrix",
    "containment_dup_pairs",
    "edit_distance_dup_pairs",
    "lsh_recall_audit",
    # round-4 audit/report queries that also read the session memos
    "minhash_estimate_audit",
    "dup_cluster_size_histogram",
    "dedup_verifier_matrix",
    "dedup_survivors_by_quality",
    # embedding-assignment memo consumers
    "embedding_neardup_pairs",
    "semantic_dedup_survivors",
    "semantic_dedup_sweep",
    "hard_negatives_celled",
    "hard_negative_probe_sweep",
    # round-5: the unguarded audit baseline shares _CAND_MEMO too
    "minhash_unguarded_dup_pairs",
    "incremental_dedup_pairs",
    # round-7: the two-stage-verify audit reads the unfiltered cand memo
    "minhash_prefilter_audit",
)


# Output-level memo for the audit/report queries whose RESULTS are tiny
# (a handful of rows) but whose tails re-run per invocation even when
# the shared pipeline memos hit. Keyed like the other memos; cleared by
# clear_dedup_memos, so the bench cold pass still measures standalone
# cost for every MEMO_FAMILY member.
_OUT_MEMO: dict[tuple, DataFrame] = {}


def _memo_output(fn):
    import functools

    @functools.wraps(fn)
    def wrapper(spark, sf_dir, **kw):
        key = (
            fn.__name__,
            spark.sparkContext.applicationId,
            sf_dir,
            tuple(sorted(kw.items())),
        )
        got = _OUT_MEMO.get(key)
        if got is not None:
            return got
        out = fn(spark, sf_dir, **kw).persist()
        out.count()
        _OUT_MEMO[key] = out
        return out

    return wrapper


def clear_dedup_memos() -> None:
    """Unpersist and drop every session memo + loose persist.

    Long-lived sessions that touch many sf_dirs (pytest tmp dirs,
    multi-scale sweeps, bench cold passes) would otherwise accumulate
    persisted DataFrames in executor storage indefinitely. Also the
    bench's cold-attribution switch: clearing between queries makes each
    memoized-family query pay its own full pipeline cost."""
    from bigdata_processing_spark.queries import dedup as _self

    for memo in (_PAIR_MEMO, _CAND_MEMO, _RAWCAND_MEMO, _PSIG_MEMO,
                 _self._LABEL_MEMO,
                 _self._EDIT_PRE_MEMO, _self._SWEEP_MEMO, _OUT_MEMO,
                 _self._EMB_MEMO):
        for entry in memo.values():
            # _EMB_MEMO holds (DataFrame, centroid list); the rest plain DFs
            df = entry[0] if isinstance(entry, tuple) else entry
            try:
                df.unpersist()
            except Exception:
                pass  # a stopped session's cache is already gone
        memo.clear()
    for df in _LOOSE_PERSISTS:
        try:
            df.unpersist()
        except Exception:
            pass
    _LOOSE_PERSISTS.clear()
    _SIZE_MEMO.clear()


def _verified_dup_pairs(
    spark: SparkSession, sf_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    max_df: int | None = MAX_DF,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """The full MinHash→LSH→verify pipeline, returning (d1, d2, jaccard)
    for pairs at/above ``jaccard_threshold``. Shared by
    minhash_lsh_dup_pairs and the connected-components clustering
    (memoized per session+dir+threshold+guards)."""
    memo_key = (spark.sparkContext.applicationId, sf_dir, jaccard_threshold,
                max_df, max_bucket)
    cached = _PAIR_MEMO.get(memo_key)
    if cached is not None:
        return cached
    # the estimate prefilter rides with the guards: the production
    # (guarded) family prefilters before exact verification; the
    # unguarded textbook baseline (minhash_unguarded_dup_pairs) stays
    # prefilter-free so the audit diff isolates what each stage drops
    agree_min = est_agree_min(jaccard_threshold) if max_bucket is not None else None
    sc = _scored_candidates(spark, sf_dir, max_df=max_df, max_bucket=max_bucket,
                            est_agree_min=agree_min)
    jaccard = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    )
    out = (
        sc.select("d1", "d2", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .persist()
    )
    _PAIR_MEMO[memo_key] = out
    return out


# Round 10: the regime switch moved to operators/regime.py so the whole
# package (tf-idf, surprisal, the curation pipelines) gates corpus-
# growing broadcasts through the SAME decision. The underscore aliases
# keep this module's historical surface (tests/tools poke _SIZE_MEMO to
# force a regime) — same objects, one memo.
from bigdata_processing_spark.operators.regime import (  # noqa: E402
    UNCOMP_TO_MEM_MULT as _UNCOMP_TO_MEM_MULT,
    VERIFY_BROADCAST_MAX_BYTES,
    _SIZE_MEMO,
    bcast_if_small as _bcast_if_small,
    docs_uncompressed_bytes as _docs_uncompressed_bytes,
    fits_broadcast as _fits_broadcast,
)


def _build_candidates(
    spark: SparkSession, sf_dir: str, shset: DataFrame, n_docs: int,
    max_df: int | None, max_bucket: int | None, max_df_frac: float,
    verify_broadcast_max_bytes: int, est_agree_min: int | None,
) -> DataFrame:
    """Lazy guarded candidate (d1, d2) frame from the persisted shingle
    cache — the shared generation core of :func:`_scored_candidates`
    (which layers the exact-overlap join on top) and
    :func:`_candidate_pairs` (which materializes the ids alone for
    verifiers that never read the overlap counts)."""
    shex = shset.select("doc_id", F.explode("sh").alias("s"))
    # ONE regime decision (uncompressed-size proxy) gates every corpus-sized
    # broadcast in this pipeline: the df-prune vocab join, the signature
    # dictionary join, and the verify join. Past the bound they all
    # degrade to key-shuffle joins — the 100x proof OOM'd the first
    # forced vocab broadcast at 500k docs.
    fits_broadcast = _fits_broadcast(sf_dir, verify_broadcast_max_bytes)
    if max_df is not None:
        import math

        # effective cap: floor for tiny corpora, fraction at scale —
        # n_docs via the persisted shingle frame (one row per doc)
        eff_df = max(max_df, int(math.ceil(max_df_frac * n_docs)))
        # fused one-shuffle build (see _fused_pruned_sig), PERSISTED into
        # the session-level signature memo: consumed by the band keys and
        # the estimate prefilter here, and by _pruned_sig_df in the audit
        # queries — which otherwise rebuilt the whole chain per cold run
        psig_key = (
            spark.sparkContext.applicationId, sf_dir, max_df, max_df_frac,
            fits_broadcast,
        )
        sig = _PSIG_MEMO.get(psig_key)
        if sig is None:
            sig = _fused_pruned_sig(shex, eff_df, fits_broadcast).persist()
            _PSIG_MEMO[psig_key] = sig
    else:
        sig = _sig_from_shex(shex, broadcast_vocab=fits_broadcast)
        if est_agree_min is not None and est_agree_min > 0:
            # the prefilter consumes sig three times (band keys + both
            # estimate legs) — without the persist the shingle→signature
            # subtree recomputes for each (ADVICE r9)
            sig = sig.persist()
            _LOOSE_PERSISTS.append(sig)

    band_keys = F.array(
        *[
            F.md5(F.concat_ws("_", F.lit(b), F.col(f"h{2*b}"), F.col(f"h{2*b+1}")))
            for b in range(N_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_keys).alias("bk"))
    # Candidate pairs WITHOUT a self-join: group each band bucket, expand
    # in-bucket pairs with an array comprehension. One shuffle of
    # (bk, doc_id); work is bounded by bucket sizes, and the cap above
    # bounds the worst key (LSH buckets are the classic skew point —
    # this shape makes the skew visible and capped). In the guarded
    # regime the member-array groupBy is GATED to under-cap buckets
    # (size agg first, arrays ≤ max_bucket elements — round 8): the
    # ungated form materialized a hot bucket's whole membership as one
    # array row, ~160 MB at a 1e7-member boilerplate band value.
    if max_bucket is not None:
        bsz0 = bands.groupBy("bk").agg(F.count("*").alias("__n")).persist()
        _LOOSE_PERSISTS.append(bsz0)
        under_bk = bsz0.filter(
            (F.col("__n") > 1) & (F.col("__n") <= max_bucket)
        ).select("bk")
        grouped = bands.join(under_bk, "bk")
    else:
        bsz0 = None
        grouped = bands
    members = grouped.groupBy("bk").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ds")
    )
    bucket_pred = F.size("ds") > 1
    if max_bucket is not None:
        bucket_pred = bucket_pred & (F.size("ds") <= max_bucket)
    pair_arr = F.flatten(
        F.transform(
            "ds",
            lambda x, i: F.transform(
                F.slice("ds", i + 2, F.greatest(F.size("ds") - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("d1"), y.alias("d2")),
            ),
        )
    )
    cand = (
        members.filter(bucket_pred)
        .select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
    )
    if max_bucket is not None:
        # Over-cap buckets: member×representative stars instead of a skip
        # (operators/skew.rep_star_pairs — md5-ordered representative
        # selection, reproduced verbatim by the DuckDB twin's row_number
        # window), fed the FLAT band table: rank-selected reps joined
        # back on bk, O(1) per-row memory (round 8 — no member arrays).
        from bigdata_processing_spark.operators.skew import rep_star_pairs

        cand = cand.unionByName(rep_star_pairs(bands, max_bucket, sizes=bsz0))
    cand = cand.distinct()
    if est_agree_min is not None and est_agree_min > 0:
        # Two-stage verify, stage 1: the signature-estimate prefilter.
        # The signature table is NARROW (9 fixed-width columns — ~100 B
        # per doc regardless of document length), so its broadcast bound
        # is independent of the shingle-set regime: 5M docs still fit
        # the 512 MB cap. Past that it degrades to merge joins keyed by
        # doc_id — still narrow-sig + candidate-id shuffle, a fraction
        # of shuffling full shingle sets for every candidate.
        sig_fits = n_docs * 128 <= verify_broadcast_max_bytes
        aa = sig.select(
            F.col("doc_id").alias("d1"),
            *[F.col(f"h{i}").alias(f"_a{i}") for i in range(N_HASHES)],
        )
        bb = sig.select(
            F.col("doc_id").alias("d2"),
            *[F.col(f"h{i}").alias(f"_b{i}") for i in range(N_HASHES)],
        )
        if sig_fits:
            aa, bb = F.broadcast(aa), F.broadcast(bb)
        else:
            aa, bb = aa.hint("merge"), bb.hint("merge")
        agree = None
        for i in range(N_HASHES):
            term = F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
            agree = term if agree is None else agree + term
        cand = (
            cand.join(aa, "d1").join(bb, "d2")
            .filter(agree >= est_agree_min)
            .select("d1", "d2")
        )
    return cand


def _candidate_pairs(
    spark: SparkSession, sf_dir: str,
    max_df: int | None = MAX_DF,
    max_bucket: int | None = MAX_BUCKET,
    max_df_frac: float = MAX_DF_FRAC,
    verify_broadcast_max_bytes: int = VERIFY_BROADCAST_MAX_BYTES,
    est_agree_min: int | None = None,
) -> DataFrame:
    """Guarded LSH candidate (d1, d2) pairs WITHOUT the exact shingle
    overlap — for verifiers with their own scoring (the edit-distance
    family). If the session already memoized the SCORED frame for the
    same guards, its id projection is served for free; otherwise only
    candidate generation runs and the corpus-sized shingle cache is
    released immediately after (round 11, the sf100 probe: the edit
    family previously paid the full array_intersect verify join —
    167 s / 75 GB of sort spill at 100× — for overlap counts it
    discarded)."""
    memo_key = (spark.sparkContext.applicationId, sf_dir, max_df, max_bucket,
                max_df_frac, verify_broadcast_max_bytes, est_agree_min)
    cached = _RAWCAND_MEMO.get(memo_key)
    if cached is not None:
        return cached
    scored = _CAND_MEMO.get(memo_key)
    if scored is not None:
        out = scored.select("d1", "d2")
        _RAWCAND_MEMO[memo_key] = out
        return out
    shset = _shingle_df(spark, sf_dir).persist()
    n_docs = shset.count()
    cand = _build_candidates(
        spark, sf_dir, shset, n_docs, max_df, max_bucket, max_df_frac,
        verify_broadcast_max_bytes, est_agree_min,
    ).persist()
    cand.count()  # materialize (pairs ≪ corpus) ...
    shset.unpersist()  # ... so the corpus-sized shingle cache can go now
    _RAWCAND_MEMO[memo_key] = cand
    return cand


def _scored_candidates(
    spark: SparkSession, sf_dir: str,
    max_df: int | None = MAX_DF,
    max_bucket: int | None = MAX_BUCKET,
    max_df_frac: float = MAX_DF_FRAC,
    verify_broadcast_max_bytes: int = VERIFY_BROADCAST_MAX_BYTES,
    est_agree_min: int | None = None,
) -> DataFrame:
    """LSH candidate pairs with their exact shingle overlap:
    (d1, d2, inter, n1, n2). Every set-similarity verifier — Jaccard
    (minhash_lsh_dup_pairs / dup_clusters) and containment
    (containment_dup_pairs) — derives from these counts, so the
    candidate generation + overlap join runs once per session and guard
    configuration.

    The corpus-scale guards are ON BY DEFAULT: shingles present in more
    than ``max(max_df, ceil(max_df_frac·n_docs))`` docs are pruned
    before signatures (boilerplate carries no near-dup signal but
    dominates shuffle volume; "common" must be RELATIVE to corpus size —
    an absolute cap prunes the whole vocabulary at 10×, measured in
    tools/sf1_dedup_proof.py) and LSH buckets larger than ``max_bucket``
    are SAMPLED, not expanded (a B-doc bucket expands to B² candidate
    pairs; a single hot template bucket is quadratic at 100×): each
    over-cap bucket keeps ``ceil(B/max_bucket)`` hash-ordered
    representatives and pairs every member against the representatives
    only — O(B·B/max_bucket) bounded work, and the star-per-
    representative shape still lets connected components recover the
    whole family as one cluster. (Skipping over-cap buckets WHOLE — the
    pre-round-6 behavior — silently kept large NON-identical near-dup
    families: exact dedup only catches identical members, so a 50-doc
    mutated boilerplate template survived dedup entirely; pinned by
    test_skew.) Pass ``max_df=None`` / ``max_bucket=None`` to disable —
    ``minhash_unguarded_dup_pairs`` is the registered small-scale audit
    baseline that does. Guards only bound CANDIDATE GENERATION;
    verification always scores the full shingle sets, so a surfaced
    pair's similarity is exact regardless of configuration. Both guards
    are relational and mirrored verbatim in the family's DuckDB twins
    (_SQL_CAND_GUARDED, same thresholds.py constants).

    ``est_agree_min``: when set, candidate pairs whose signatures agree
    on fewer than this many components are dropped BEFORE the exact
    shingle-set join — the two-stage verify (see _SQL_CAND_PREF /
    thresholds.MINHASH_EST_MARGIN). The prefilter is a join against the
    NARROW signature table (~100 B/doc independent of text length, so
    it broadcasts far past the shingle-set regime bound); the exact
    intersection — the 100×-proof cost center — then runs only on the
    ~5% of candidates the estimate can't already rule out. (Carrying
    signatures through the band buckets instead would widen the
    (bk, doc_id) exchange ~3× for every candidate; the narrow broadcast
    join prefilters without touching the dominant shuffle.)"""
    memo_key = (spark.sparkContext.applicationId, sf_dir, max_df, max_bucket,
                max_df_frac, verify_broadcast_max_bytes, est_agree_min)
    cached = _CAND_MEMO.get(memo_key)
    if cached is not None:
        return cached
    # Cache the shingle sets: reused by the signature pass and by both
    # sides of the verification join (without it Spark recomputes the
    # docs→shingles subtree four times — measured 4x slower).
    shset = _shingle_df(spark, sf_dir).persist()
    raw = _RAWCAND_MEMO.get(memo_key)
    if raw is not None:
        # Memo reuse is now bidirectional (round 12, ADVICE r11): a
        # session that ran the edit family first materialized the raw
        # (d1, d2) frame under the same guard key — layer the exact
        # overlap join over it instead of re-running the whole LSH
        # candidate generation (banding shuffles, df-prune, prefilter).
        cand = raw
    else:
        n_docs = shset.count()
        cand = _build_candidates(
            spark, sf_dir, shset, n_docs, max_df, max_bucket, max_df_frac,
            verify_broadcast_max_bytes, est_agree_min,
        )
    # Size-aware verify join: broadcasting the shingle-set lookups avoids
    # shuffling the candidate pairs twice (measured 1.7x on the full
    # pipeline) — but only while the doc→shingles map fits an executor.
    # Past the estimate cap the verify switches to the DISTINCT-TEXT-PAIR
    # form below: same rows (regime-equality pinned in test_plans), still
    # candidate-bounded, no corpus-sized broadcast to OOM on.
    fits_broadcast = _fits_broadcast(sf_dir, verify_broadcast_max_bytes)
    if fits_broadcast:
        s1 = shset.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"))
        s2 = shset.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
        joined = cand.join(F.broadcast(s1), "d1").join(F.broadcast(s2), "d2")
        scored = joined.select(
            "d1",
            "d2",
            F.size(F.array_intersect("sh1", "sh2")).alias("inter"),
            F.size("sh1").alias("n1"),
            F.size("sh2").alias("n2"),
        )
    else:
        # Big regime: the exact intersection runs per DISTINCT TEXT PAIR
        # (round 13 — the r11 edit-DP geometry applied to the
        # jaccard/containment verify). The direct shset merge join
        # carried full shingle arrays for EVERY candidate pair through
        # the sort — 75-88 GB of spill at the 100x clone corpus on the
        # unfiltered audit family (first-ever 100x rows for
        # dedup_verifier_matrix / minhash_estimate_audit), because clone
        # mass makes candidate pairs plentiful while their text content
        # collapses to ~1/clone² distinct pairs. inter/n1/n2 are pure
        # functions of the two TEXTS: join each candidate to its raw-md5
        # fingerprints (16-byte keys shuffle instead of shingle arrays),
        # same-fingerprint pairs short-circuit to inter=n1=n2=|set|, and
        # the array_intersect runs once per distinct (f1, f2) on one
        # representative shingle set per fingerprint, the verdict joined
        # back to all doc pairs that share it. Null/empty-text docs
        # cannot reach candidates (no shingles → no signature → no
        # bands), so the fingerprint join drops no pairs. Everything
        # merge-hinted: each side is corpus-growing and Catalyst's
        # static estimate through these subtrees is untrustworthy.
        docs = load_table(spark, sf_dir, "documents")
        fpd = docs.select("doc_id", F.md5("text").alias("f"))
        f1 = fpd.select(F.col("doc_id").alias("d1"), F.col("f").alias("f1"))
        f2 = fpd.select(F.col("doc_id").alias("d2"), F.col("f").alias("f2"))
        cf = cand.join(f1.hint("merge"), "d1").join(f2.hint("merge"), "d2")
        # three consumers below (same-fp leg, distinct-pair source, the
        # verdict join-back): persisted + eagerly materialized, or each
        # re-runs the two candidate-wide merge joins — measured 43.5 GB
        # of residual 100x sort spill on dedup_verifier_matrix from
        # exactly this recompute. Narrow frame (two ids + two 16-byte
        # fingerprints per candidate pair); released below once the
        # scored output is cached.
        cf = cf.persist()
        cf.count()
        # one representative shingle set per distinct fingerprint
        # (identical texts ⇒ identical shingle sets; min doc_id is a
        # deterministic pick of one of them)
        rep = fpd.groupBy("f").agg(F.min("doc_id").alias("doc_id"))
        rsh = rep.join(shset.hint("merge"), "doc_id").select("f", "sh")
        fsz = rsh.select("f", F.size("sh").alias("__nsz"))
        samefp = (
            cf.filter(F.col("f1") == F.col("f2"))
            .join(fsz.select(F.col("f").alias("f1"), "__nsz").hint("merge"), "f1")
            .select(
                "d1", "d2",
                F.col("__nsz").alias("inter"),
                F.col("__nsz").alias("n1"),
                F.col("__nsz").alias("n2"),
            )
        )
        dtp = (
            cf.filter(F.col("f1") != F.col("f2"))
            .select("f1", "f2")
            .distinct()
            .join(rsh.select(F.col("f").alias("f1"), F.col("sh").alias("sh1")).hint("merge"), "f1")
            .join(rsh.select(F.col("f").alias("f2"), F.col("sh").alias("sh2")).hint("merge"), "f2")
            .select(
                "f1", "f2",
                F.size(F.array_intersect("sh1", "sh2")).alias("inter"),
                F.size("sh1").alias("n1"),
                F.size("sh2").alias("n2"),
            )
        )
        diff = (
            cf.filter(F.col("f1") != F.col("f2"))
            .join(dtp.hint("merge"), ["f1", "f2"])
            .select("d1", "d2", "inter", "n1", "n2")
        )
        scored = samefp.unionByName(diff)
    out = scored.persist()
    out.count()  # materialize the counts (pairs ≪ corpus) ...
    shset.unpersist()  # ... so the corpus-sized shingle cache can go now
    if not fits_broadcast:
        cf.unpersist()  # the scored output is cached; the fingerprinted
        # candidate frame has served its three consumers
    # sig stays persisted: it lives in _PSIG_MEMO for the audit family
    # (narrow — 9 fixed-width columns, ~100 B/doc) and is released by
    # clear_dedup_memos with the other session memos
    _CAND_MEMO[memo_key] = out
    return out


@register(
    "minhash_lsh_dup_pairs",
    oracle=f"""
        WITH {_SQL_SHINGLES}, {_SQL_CAND_GUARDED}, {_SQL_CAND_PREF}
        SELECT c.d1, c.d2,
               len(list_intersect(s1.sh, s2.sh))::DOUBLE
                   / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
                   AS jaccard
        FROM candp c
        JOIN shset s1 ON c.d1 = s1.doc_id
        JOIN shset s2 ON c.d2 = s2.doc_id
        WHERE len(list_intersect(s1.sh, s2.sh))::DOUBLE
                  / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
              >= {JACCARD_THRESHOLD}
        ORDER BY d1, d2
    """,
)
def minhash_lsh_dup_pairs(
    spark: SparkSession, sf_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    max_df: int | None = MAX_DF,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """MinHash near-dup pairs under the PRODUCTION configuration —
    DF pruning + bucket cap default-on (see _scored_candidates). The
    guard-free textbook pipeline survives as
    ``minhash_unguarded_dup_pairs`` for small-scale recall audits."""
    return _verified_dup_pairs(
        spark, sf_dir, jaccard_threshold, max_df=max_df, max_bucket=max_bucket
    ).orderBy("d1", "d2")


# ---------------------------------------------------------------------------
# Unguarded audit baseline: the textbook MinHash pipeline with BOTH
# corpus-scale guards off. Exists to put a number on what the default
# guards drop (diff its pair set against minhash_lsh_dup_pairs) — it is
# NOT the configuration to run at corpus scale: one hot band bucket of B
# docs costs B² pairs here. Shares _scored_candidates (guards=None), so
# the session memo covers both configurations independently.
# ---------------------------------------------------------------------------
@register(
    "minhash_unguarded_dup_pairs",
    oracle=f"""
        WITH {_SQL_SHINGLES}, {_SQL_SIG}, {_SQL_BANDS},
        ucand AS (
            SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
            FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
        )
        SELECT c.d1, c.d2,
               len(list_intersect(s1.sh, s2.sh))::DOUBLE
                   / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
                   AS jaccard
        FROM ucand c
        JOIN shset s1 ON c.d1 = s1.doc_id
        JOIN shset s2 ON c.d2 = s2.doc_id
        WHERE len(list_intersect(s1.sh, s2.sh))::DOUBLE
                  / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
              >= {JACCARD_THRESHOLD}
        ORDER BY d1, d2
    """,
)
def minhash_unguarded_dup_pairs(
    spark: SparkSession, sf_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    return _verified_dup_pairs(
        spark, sf_dir, jaccard_threshold, max_df=None, max_bucket=None
    ).orderBy("d1", "d2")


# ---------------------------------------------------------------------------
# Incremental batch dedup, relational twin: the exact math of
# operators/incremental_dedup.py with the corpus split deterministically
# into an "already indexed" 3/4 (doc_id % 4 != 0) and an arriving batch
# 1/4 (doc_id % 4 == 0). The DF STOP LIST (too-common shingles) is
# FROZEN on the indexed corpus — a stop list, not an allow list, so
# batch docs with novel shingles stay signable; re-pruning per batch
# would re-sign the whole corpus — the bucket cap sees the COMBINED
# old+new bucket,
# and only pairs involving the batch are emitted. test_incremental_dedup
# pins the disk-index operator to this query row-for-row.
# ---------------------------------------------------------------------------
@register(
    "incremental_dedup_pairs",
    oracle=f"""
        WITH {_SQL_SHINGLES},
        shex_idx AS (SELECT doc_id, s FROM shex WHERE doc_id % 4 <> 0),
        nidx AS (SELECT count(*) AS n FROM documents WHERE doc_id % 4 <> 0),
        dfreq AS (
            SELECT s, count(DISTINCT doc_id) AS df FROM shex_idx GROUP BY s
        ),
        stop AS (
            SELECT s FROM dfreq CROSS JOIN nidx
            WHERE df > greatest({MAX_DF},
                                CAST(ceil({MAX_DF_FRAC} * nidx.n) AS BIGINT))
        ),
        shex_p AS (
            SELECT doc_id, s FROM shex
            WHERE s NOT IN (SELECT s FROM stop)
        ),
        sig AS (SELECT doc_id, """ + ", ".join(
        f"min({T.minhash_hash_sql('s', i)}) AS h{i}" for i in range(N_HASHES)
    ) + """ FROM shex_p GROUP BY doc_id),
        anch AS (
            SELECT a.doc_id AS bdoc, min(b.doc_id) AS adoc
            FROM sig a JOIN sig b
              ON """ + " AND ".join(
        f"a.h{i} = b.h{i}" for i in range(N_HASHES)
    ) + """
            WHERE a.doc_id % 4 = 0 AND b.doc_id % 4 <> 0
            GROUP BY a.doc_id
        ),
        bands AS (SELECT doc_id, unnest([""" + ", ".join(
        f"md5(concat_ws('_', {b}, h{2*b}, h{2*b+1}))" for b in range(N_BANDS)
    ) + f"""]) AS bk FROM sig
          WHERE doc_id NOT IN (SELECT bdoc FROM anch)),
        bsz AS (SELECT bk, count(*) AS n FROM bands GROUP BY bk),
        reps_i AS (
            SELECT bk, doc_id FROM (
                SELECT a.bk, a.doc_id, z.n,
                       row_number() OVER (
                           PARTITION BY a.bk
                           ORDER BY md5(CAST(a.doc_id AS VARCHAR)), a.doc_id
                       ) AS rn
                FROM bands a JOIN bsz z ON a.bk = z.bk
                WHERE z.n > {MAX_BUCKET}
            ) WHERE rn <= least(CAST(ceil(n / CAST({MAX_BUCKET} AS DOUBLE)) AS BIGINT), {MAX_BUCKET_REPS})
        ),
        cand AS (
            SELECT DISTINCT d1, d2 FROM (
                SELECT a.doc_id AS d1, b.doc_id AS d2
                FROM bands a
                JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
                JOIN bsz ON a.bk = bsz.bk
                WHERE bsz.n <= {MAX_BUCKET}
                UNION ALL
                SELECT least(r.doc_id, m.doc_id) AS d1,
                       greatest(r.doc_id, m.doc_id) AS d2
                FROM reps_i r
                JOIN bands m ON r.bk = m.bk AND r.doc_id <> m.doc_id
                UNION ALL
                SELECT least(bdoc, adoc) AS d1, greatest(bdoc, adoc) AS d2
                FROM anch
            )
            WHERE d1 % 4 = 0 OR d2 % 4 = 0
        ),
        candp_i AS (
            SELECT c.d1, c.d2 FROM cand c
            JOIN sig a ON c.d1 = a.doc_id
            JOIN sig b ON c.d2 = b.doc_id
            WHERE {_SQL_EST_AGREE_AB} >= {EST_AGREE_MIN}
        )
        SELECT c.d1, c.d2,
               len(list_intersect(s1.sh, s2.sh))::DOUBLE
                   / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
                   AS jaccard,
               ((c.d1 % 4 = 0) <> (c.d2 % 4 = 0)) AS is_cross
        FROM candp_i c
        JOIN shset s1 ON c.d1 = s1.doc_id
        JOIN shset s2 ON c.d2 = s2.doc_id
        WHERE len(list_intersect(s1.sh, s2.sh))::DOUBLE
                  / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
              >= {JACCARD_THRESHOLD}
        ORDER BY d1, d2
    """,
)
@_memo_output
def incremental_dedup_pairs(
    spark: SparkSession, sf_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Near-dup pairs a batch arrival (doc_id % 4 == 0) surfaces against
    an index frozen on the rest of the corpus — new×old AND new×new,
    with ``is_cross`` distinguishing them. Pure relational twin of the
    disk-index operator (operators/incremental_dedup.py): frozen
    boilerplate STOP LIST from the indexed 3/4, combined-bucket cap,
    batch-only pair emission, and the round-8 signature short-circuit
    (batch docs whose full signature equals an indexed doc's anchor to
    the min-id match and skip band expansion)."""
    import math as _math

    docs = load_table(spark, sf_dir, "documents")
    shset = _shingle_df(spark, sf_dir).persist()
    _LOOSE_PERSISTS.append(shset)
    shex = shset.select("doc_id", F.explode("sh").alias("s"))

    shex_idx = shex.filter(F.col("doc_id") % 4 != 0)
    n_idx = docs.filter(F.col("doc_id") % 4 != 0).count()
    eff = max(MAX_DF, int(_math.ceil(MAX_DF_FRAC * n_idx)))
    stop = (
        shex_idx.groupBy("s")
        # count(*) == countDistinct(doc_id): word_shingles is per-doc
        # DISTINCT, so shex rows are unique (doc_id, s) pairs — the plain
        # count skips the two-phase distinct expand (one less pass, r12)
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > eff)
        .select("s")
    )
    shex_p = shex.join(F.broadcast(stop), "s", "left_anti").select("doc_id", "s")
    # five consumers since round 8 (anchor join both sides, band keys,
    # prefilter a/b): persist the narrow signature table so the
    # shingle->signature subtree runs once per call, not five times
    # (the anchor table below persists too — it re-broadcasts under
    # every consumer of the banded table). The stop list above is
    # bounded by construction (<= shingles-per-doc/MAX_DF_FRAC rows,
    # corpus-independent); the dictionary vocabulary is NOT (stop-list
    # pruning only removes the high-df tail) — regime-switch it.
    sig = _sig_from_shex(shex_p, broadcast_vocab=_fits_broadcast(sf_dir)).persist()
    _LOOSE_PERSISTS.append(sig)
    sig.count()  # materialize NOW: consumers otherwise race to fill the
    # cache and the first wave re-runs the shingle subtree concurrently

    # signature-level exact-dup short-circuit (round 8), mirrored from
    # the disk operator: a batch doc whose FULL signature equals an
    # indexed doc's anchors to the MIN-id such doc (one directly-emitted,
    # still exactly-verified pair) and skips band expansion entirely —
    # the clone-recrawl case costs O(batch), not touched-family stars
    siga = sig.filter(F.col("doc_id") % 4 == 0).select(
        F.col("doc_id").alias("bdoc"),
        *[F.col(f"h{i}").alias(f"_n{i}") for i in range(N_HASHES)],
    )
    sigi = sig.filter(F.col("doc_id") % 4 != 0)
    # batch-bounded; persisted because it re-broadcasts under EVERY
    # consumer of the banded signature table (bucket sizes, both join
    # legs, stars) — unpersisted, each consumer re-ran the anchor join
    anch = (
        sigi.join(
            F.broadcast(siga),
            [F.col(f"h{i}") == F.col(f"_n{i}") for i in range(N_HASHES)],
        )
        .groupBy("bdoc")
        .agg(F.min("doc_id").alias("adoc"))
        .persist()
    )
    _LOOSE_PERSISTS.append(anch)
    exact_pairs = anch.select(
        F.least("bdoc", "adoc").alias("d1"),
        F.greatest("bdoc", "adoc").alias("d2"),
    )
    sig_banded = sig.join(
        F.broadcast(anch.select(F.col("bdoc").alias("doc_id"))),
        "doc_id",
        "left_anti",
    )

    band_keys = F.array(
        *[
            F.md5(F.concat_ws("_", F.lit(b), F.col(f"h{2*b}"), F.col(f"h{2*b+1}")))
            for b in range(N_BANDS)
        ]
    )
    bands = sig_banded.select("doc_id", F.explode(band_keys).alias("bk"))
    bsz = bands.groupBy("bk").agg(F.count("*").alias("n"))
    a = bands.select("bk", F.col("doc_id").alias("d1"))
    b = bands.select("bk", F.col("doc_id").alias("d2"))
    under = (
        a.join(b, "bk")
        .filter(F.col("d1") < F.col("d2"))
        .join(bsz.filter(F.col("n") <= MAX_BUCKET).select("bk"), "bk")
        .select("d1", "d2")
    )
    # over-cap buckets: member×representative stars (operators/skew),
    # same geometry as the batch family since round 6 — without it a
    # batch arriving into a large near-dup family probes ZERO pairs
    # (measured at the 100× clone corpus); flat band input since round 8
    # (rank-selected reps, no member arrays)
    from bigdata_processing_spark.operators.skew import rep_star_pairs

    cand = (
        under.unionByName(rep_star_pairs(bands, MAX_BUCKET, sizes=bsz))
        .unionByName(exact_pairs)
        .filter((F.col("d1") % 4 == 0) | (F.col("d2") % 4 == 0))
        .distinct()
    )
    # two-stage verify, mirrored from the disk operator: signature
    # agreement screens candidates before the exact intersection
    agree_min = est_agree_min(jaccard_threshold)
    if agree_min > 0:
        sa = sig.select(F.col("doc_id").alias("d1"),
                        *[F.col(f"h{i}").alias(f"_a{i}") for i in range(N_HASHES)])
        sb = sig.select(F.col("doc_id").alias("d2"),
                        *[F.col(f"h{i}").alias(f"_b{i}") for i in range(N_HASHES)])
        agree = None
        for i in range(N_HASHES):
            term = F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
            agree = term if agree is None else agree + term
        cand = (
            cand.join(sa, "d1").join(sb, "d2")
            .filter(agree >= agree_min)
            .select("d1", "d2")
        )
    s1 = shset.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"))
    s2 = shset.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    # same uncompressed-size regime switch as _scored_candidates: the
    # shingle-set lookups are corpus-sized
    if _fits_broadcast(sf_dir):
        s1, s2 = F.broadcast(s1), F.broadcast(s2)
    else:
        s1, s2 = s1.hint("merge"), s2.hint("merge")
    inter = F.size(F.array_intersect("sh1", "sh2"))
    jac = inter.cast("double") / (F.size("sh1") + F.size("sh2") - inter)
    return (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            jac.alias("jaccard"),
            ((F.col("d1") % 4 == 0) != (F.col("d2") % 4 == 0)).alias("is_cross"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .orderBy("d1", "d2")
    )


# ---------------------------------------------------------------------------
# Near-dup CLUSTERS: connected components over the verified dup-pair
# graph via iterative min-label propagation. Data-sized work (the pair
# pipeline) is distributed; the iteration operates on the pair graph
# (≪ corpus) and converges in O(cluster diameter) rounds. Oracle:
# recursive-CTE transitive closure in DuckDB.
# ---------------------------------------------------------------------------
# Verified pairs over the PRODUCTION (guarded) candidates — compose as
# ``WITH [RECURSIVE] {_SQL_SHINGLES}, {_SQL_CAND_GUARDED}, {_SQL_PAIRS}``.
# Includes the two-stage verify: the signature-estimate prefilter
# (candp) runs before the exact intersection, mirroring
# _scored_candidates(est_agree_min=EST_AGREE_MIN).
_SQL_PAIRS = f"""
        {_SQL_CAND_PREF},
        pairs AS (
            SELECT c.d1, c.d2
            FROM candp c
            JOIN shset s1 ON c.d1 = s1.doc_id
            JOIN shset s2 ON c.d2 = s2.doc_id
            WHERE len(list_intersect(s1.sh, s2.sh))::DOUBLE
                      / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
                  >= {JACCARD_THRESHOLD}
        )
"""


@register(
    "dup_clusters",
    oracle=f"""
        WITH RECURSIVE {_SQL_SHINGLES}, {_SQL_CAND_GUARDED}, {_SQL_PAIRS},
        edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION SELECT d2, d1 FROM pairs
        ),
        reach(node, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
        )
        SELECT node AS doc_id, min(r) AS cluster_id
        FROM reach
        GROUP BY node
        ORDER BY doc_id
    """,
)
def dup_clusters(
    spark: SparkSession, sf_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    return _cluster_labels(spark, sf_dir, jaccard_threshold).orderBy("doc_id")


# Labels memo, mirroring _PAIR_MEMO one level up the pipeline: the
# propagation fixpoint costs ~20 driver-coordinated joins, and both
# dup_clusters and dedup_survivors need its output — the second
# consumer should read the persisted (doc_id, cluster_id) result
# (≪ corpus), not re-run the loop.
_LABEL_MEMO: dict[tuple[str, str, float], DataFrame] = {}


def _cluster_labels(
    spark: SparkSession, sf_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """(doc_id, cluster_id) for every doc in the verified dup-pair graph,
    cluster_id = the component's min doc_id — via large-star/small-star
    connected components (operators/graph.py), which converges in
    O(log² n) rounds instead of min-label propagation's O(diameter),
    so driver coordination stops scaling with cluster shape."""
    import logging

    memo_key = (spark.sparkContext.applicationId, sf_dir, jaccard_threshold)
    cached = _LABEL_MEMO.get(memo_key)
    if cached is not None:
        return cached
    from bigdata_processing_spark.operators.graph import connected_components

    # _verified_dup_pairs is memoized+persisted; projecting off it is cheap
    pairs = _verified_dup_pairs(spark, sf_dir, jaccard_threshold).select("d1", "d2")
    labels, rounds = connected_components(pairs, src="d1", dst="d2")
    logging.getLogger(__name__).info(
        "dup_clusters: connected components converged in %d star rounds", rounds
    )
    out = labels.toDF("doc_id", "cluster_id")  # already persisted+materialized
    _LABEL_MEMO[memo_key] = out
    return out


# ---------------------------------------------------------------------------
# Dedup keep-first materialization: one surviving doc per fingerprint
# group (policy: min doc_id), with the group size it represents.
# ---------------------------------------------------------------------------
@register(
    "dedup_keep_first",
    oracle="""
        SELECT min(doc_id) AS kept_doc,
               count(*) AS group_size,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
        GROUP BY fp
        ORDER BY kept_doc
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("kept_doc"), F.count("*").alias("group_size"))
        .select("kept_doc", "group_size", "fp")
        .orderBy("kept_doc")
    )


# ---------------------------------------------------------------------------
# Brute-force n-gram Jaccard for a bounded query set: exact top-3 most
# similar docs for each query doc. The bounded-query-broadcast pattern —
# the query side stays small and broadcast, so the fact side streams once.
# ---------------------------------------------------------------------------
@register(
    "ngram_jaccard_topk",
    oracle=f"""
        WITH {_SQL_SHINGLES},
        q AS (SELECT doc_id AS qid, sh AS qsh FROM shset WHERE doc_id < 5),
        s AS (
            SELECT qid, doc_id AS cid,
                   len(list_intersect(qsh, sh))::DOUBLE
                       / (len(qsh) + len(sh) - len(list_intersect(qsh, sh))) AS jaccard
            FROM q JOIN shset ON doc_id <> qid
        )
        SELECT qid, cid, jaccard, rn FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY jaccard DESC, cid ASC) AS rn
            FROM s
        )
        WHERE rn <= 3
        ORDER BY qid, rn
    """,
)
def ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    shset = _shingle_df(spark, sf_dir)
    q = shset.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("qid"), F.col("sh").alias("qsh")
    )
    joined = shset.join(F.broadcast(q), F.col("doc_id") != F.col("qid"))
    inter = F.size(F.array_intersect("qsh", "sh"))
    jaccard = inter.cast("double") / (F.size("qsh") + F.size("sh") - inter)
    w = Window.partitionBy("qid").orderBy(F.col("jaccard").desc(), F.col("cid").asc())
    return (
        joined.select("qid", F.col("doc_id").alias("cid"), jaccard.alias("jaccard"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .orderBy("qid", "rn")
    )


# ---------------------------------------------------------------------------
# SimHash: 16-bit signature from per-token hash bits (bit-majority vote).
# Near-identical docs land in the same bucket; output is every bucket
# holding >1 doc plus its members.
# ---------------------------------------------------------------------------
_SIM_BITS = 16

_SQL_SIMHASH = f"""
        tokex AS (
            SELECT DISTINCT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> ''))
                AS tok
            FROM documents
        ),
        th AS (
            SELECT doc_id, ('0x' || substr(md5('0|' || tok), 1, 8))::BIGINT AS h
            FROM tokex
        ),
        bits AS (
            SELECT doc_id,
                   {', '.join(
                       f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
                       for j in range(_SIM_BITS)
                   )}
            FROM th GROUP BY doc_id
        ),
        sh16 AS (
            SELECT doc_id,
                   ({' + '.join(
                       f"(CASE WHEN b{j} > 0 THEN 1 ELSE 0 END << {j})"
                       for j in range(_SIM_BITS)
                   )})::BIGINT AS simhash
            FROM bits
        )
"""


@register(
    "simhash_buckets",
    oracle=f"""
        WITH {_SQL_SIMHASH}
        SELECT simhash, count(*) AS n_docs, min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM sh16
        GROUP BY simhash
        HAVING count(*) > 1
        ORDER BY simhash
    """,
)
def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokex = docs.select(
        "doc_id", F.explode(F.array_distinct(T.tokens(F.col("text")))).alias("tok")
    ).filter(F.col("tok") != "")
    th = tokex.select("doc_id", T.hash64(F.col("tok"), 0).alias("h"))
    # SQL-string expressions for the same py4j-construction reason as
    # simhash_neardup_pairs (r12); arithmetic unchanged
    bit_aggs = [
        F.expr(
            f"sum(CASE WHEN (shiftright(h, {j}) & 1) = 1"
            " THEN 1 ELSE -1 END)"
        ).alias(f"b{j}")
        for j in range(_SIM_BITS)
    ]
    bits = th.groupBy("doc_id").agg(*bit_aggs)
    # THEN {2^j} (the form the old Column API constant-folded to) keeps
    # the physical plan byte-identical to the r11 one — no driver-row
    # rotation needed for a construction-only change
    simhash_sql = "(" + " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(_SIM_BITS)
    ) + ")"
    return (
        bits.select("doc_id", F.expr(simhash_sql).cast("bigint").alias("simhash"))
        .groupBy("simhash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("simhash")
    )


# ---------------------------------------------------------------------------
# 64-bit SimHash near-dup PAIRS (round 7): simhash_buckets only surfaces
# EXACT-signature collisions (same 16-bit bucket); this is the real
# Charikar near-dup operator — 64-bit bit-majority signature, 4×16-bit
# bands as Hamming-LSH keys (pigeonhole recall 1.0 at ≤3, like the
# image dHash family, whose band/cap/star/popcount machinery this query
# REUSES verbatim on both engines: image_neardup_pairs_from_hashes /
# _sql_hamming_pairs_tail). The 64 bits come from the first two 32-bit
# chunks of ONE md5 per distinct token — portable, one digest.
# Scale shape: one token explode + one 64-sum aggregate per doc (map-
# side combined), then everything is the capped band-bucket pipeline —
# signatures are 4 ints/doc; document text never reaches the join.
# ---------------------------------------------------------------------------
SIMHASH_HAMMING_MAX = 3
_SIM64 = 64


def _sql_simhash64_bands() -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN ({'h_lo' if j < 32 else 'h_hi'} >> {j % 32}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS s{j}"
        for j in range(_SIM64)
    )
    band_cols = ", ".join(
        "CAST(("
        + " + ".join(
            f"(CASE WHEN s{16 * b + i} > 0 THEN 1 ELSE 0 END << {i})"
            for i in range(16)
        )
        + f") AS INTEGER) AS b{b}"
        for b in range(4)
    )
    return f"""
        stok AS (
            SELECT DISTINCT doc_id,
                   unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
            FROM documents
        ),
        sth AS (
            SELECT doc_id,
                   ('0x' || substr(md5('0|' || tok), 1, 8))::BIGINT AS h_lo,
                   ('0x' || substr(md5('0|' || tok), 9, 8))::BIGINT AS h_hi
            FROM stok
        ),
        sbits AS (SELECT doc_id, {bit_sums} FROM sth GROUP BY doc_id),
        ibands AS (SELECT doc_id AS img_id, {band_cols} FROM sbits)
"""


def _sql_simhash_neardup() -> str:
    from bigdata_processing_spark.queries.multimodal import (
        _sql_hamming_pairs_tail,
    )

    return (
        f"\n        WITH {_sql_simhash64_bands()}"
        + _sql_hamming_pairs_tail(SIMHASH_HAMMING_MAX, MAX_BUCKET)
    )


@register("simhash_neardup_pairs", oracle=_sql_simhash_neardup())
def simhash_neardup_pairs(
    spark: SparkSession, sf_dir: str,
    hamming_max: int = SIMHASH_HAMMING_MAX,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """(d1, d2, hamming) doc pairs within ``hamming_max`` bits of 64-bit
    SimHash distance — the signature-level complement to the shingle
    MinHash family (SimHash weights token PRESENCE by majority vote, so
    it excels at long docs with small edits where bigram Jaccard
    dilutes slowly)."""
    from bigdata_processing_spark.operators.multimodal import (
        image_neardup_pairs_from_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    tokex = docs.select(
        "doc_id", F.explode(F.array_distinct(T.tokens(F.col("text")))).alias("tok")
    ).filter(F.col("tok") != "")
    # Expression trees built as SQL STRINGS, not per-node Column calls:
    # the 64 bit-sum aggs + 4×16 band terms cost ~1.0 s of py4j round
    # trips per query CONSTRUCTION via the Column API vs 0.21 s parsed
    # (r12, measured; identical analyzed plan — the same trade
    # operators/ivf._scores_sql documents). md5 appears twice but
    # subexpression elimination computes it once per row at runtime.
    th = tokex.selectExpr(
        "doc_id",
        "CAST(conv(substring(md5(concat('0|', tok)), 1, 8), 16, 10)"
        " AS BIGINT) AS h_lo",
        "CAST(conv(substring(md5(concat('0|', tok)), 9, 8), 16, 10)"
        " AS BIGINT) AS h_hi",
    )
    bit_aggs = [
        F.expr(
            f"sum(CASE WHEN (shiftright({'h_lo' if j < 32 else 'h_hi'},"
            f" {j % 32}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"s{j}")
        for j in range(_SIM64)
    ]
    sbits = th.groupBy("doc_id").agg(*bit_aggs)
    band_exprs = [
        "CAST((" + " + ".join(
            f"(CASE WHEN s{16 * b + i} > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(16)
        ) + f") AS INT) AS b{b}"
        for b in range(4)
    ]
    hashes = sbits.selectExpr("doc_id AS img_id", *band_exprs)
    return image_neardup_pairs_from_hashes(
        hashes, hamming_max=hamming_max, max_bucket=max_bucket
    ).orderBy("d1", "d2")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup over IVF cells: candidates are pairs sharing
# BOTH the label partition and a geometric cell, cosine ≥
# thresholds.COSINE_NEARDUP_THRESHOLD.
#
# Scale design: within-label pairing alone is quadratic in the label size
# (measured 4.3× time at 3× data in round 1). The cell count C grows with
# the corpus (C = allpairs_cell_count(n) = max(ivf_cell_count(n), n//128)
# — operators/ivf.py), so the expected within-(label,cell) pair count
# stays ~linear in n — the IVF candidate-pruning shape
# (operators/ivf.py's build_ivf_index is the unconstrained production
# path with a pandas-UDF assigner; here the quantizer must stay
# SQL-expressible so DuckDB reproduces cell assignment bit-for-bit).
#
# Determinism contract (round 6 — TRAINED cells): centroids start as the
# C lowest-vec_id vectors and are refined by a FIXED number of Lloyd
# rounds (_EMB_TRAIN_ITERS) whose means are rounded to 6 decimals —
# deterministic in both engines (operators/ivf.trained_centroids ↔ the
# unrolled CTE chain below); assignment is argmin over c·c − 2·e·c (same
# argmin as full squared distance, e·e is constant per row) with
# cell-index tiebreak. functions/vectors.dot folds doubles in array
# order, bit-equal to DuckDB list_dot_product, so both engines assign
# identical cells. Training the cells (vs the round-5 seeded sample)
# measurably lifts celled recall at the same scan fraction — see
# BASELINE.md round-6 quantizer table / ivf_sweep.py.
# ---------------------------------------------------------------------------
# Shared embedding-assignment CTEs — TRAINED quantizer (round 6): seed
# centroids (lowest-vec_id sample) refined by _EMB_TRAIN_ITERS unrolled
# Lloyd rounds with round-6 means, mirroring
# operators/ivf.trained_centroids round for round. Consumed by the whole
# celled family (embedding_neardup_pairs, semantic_dedup_*,
# hard_negatives_celled, hard_negative_probe_sweep) so cell assignment
# cannot drift between Spark and the oracle.
_EMB_TRAIN_ITERS = 2  # fixed Lloyd rounds — part of the cross-engine contract


def _sql_emb_assign(n_iter: int = _EMB_TRAIN_ITERS) -> str:
    """CTE chain ending in ``cents(cell, c)`` and ``assigned(vec_id,
    label, v, nrm, cell)`` — the oracle twin of
    ``trained_centroids(emb, allpairs_cell_count(n), n_iter)`` followed
    by the final argmin assignment. Each unrolled round re-assigns
    against the previous round's centroids (bit-equal ordered-fold
    argmin) and takes per-(cell, pos) means rounded to 6 decimals;
    empty cells keep their previous centroid (coalesce), matching the
    Spark side's keep-previous rule."""

    def assign(name: str, cents: str) -> str:
        return f"""
        {name} AS (
            SELECT b.vec_id, b.v,
                   (SELECT c.cell FROM {cents} c
                    ORDER BY list_dot_product(c.c, c.c)
                             - 2 * list_dot_product(b.v, c.c) ASC,
                             c.cell ASC
                    LIMIT 1) AS cell
            FROM tc_base b
        )"""

    parts = [
        """
        tc_c0 AS (
            -- LIMIT = allpairs_cell_count(n): max(ivf_cell_count(n), n//128)
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                   embedding::DOUBLE[] AS c
            FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id
                  LIMIT (SELECT greatest(
                           CASE WHEN count(*) < 8 THEN greatest(1, count(*))
                                ELSE least(greatest(8, CAST(floor(4*sqrt(count(*))) AS BIGINT)),
                                           greatest(1, count(*) // 39),
                                           262144) END,
                           count(*) // 128)
                         FROM embeddings))
        )""",
        """
        tc_base AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM embeddings
        )""",
    ]
    for i in range(n_iter):
        parts.append(assign(f"tc_a{i}", f"tc_c{i}"))
        parts.append(f"""
        tc_m{i} AS (
            SELECT cell, list(m ORDER BY pos) AS c FROM (
                SELECT cell, pos, round(avg(val), 6) AS m FROM (
                    SELECT cell, unnest(v) AS val,
                           unnest(range(1, len(v) + 1)) AS pos
                    FROM tc_a{i}
                ) GROUP BY cell, pos
            ) GROUP BY cell
        )""")
        parts.append(f"""
        tc_c{i + 1} AS (
            SELECT s.cell, coalesce(m.c, s.c) AS c
            FROM tc_c{i} s LEFT JOIN tc_m{i} m USING (cell)
        )""")
    parts.append(f"""
        cents AS (SELECT cell, c FROM tc_c{n_iter})""")
    parts.append("""
        assigned AS (
            SELECT b.vec_id, b.label, b.v, b.nrm,
                   (SELECT c.cell FROM cents c
                    ORDER BY list_dot_product(c.c, c.c)
                             - 2 * list_dot_product(b.v, c.c) ASC,
                             c.cell ASC
                    LIMIT 1) AS cell
            FROM tc_base b
        )""")
    return ",".join(parts)


_SQL_EMB_ASSIGN = _sql_emb_assign()


# Assignment memo (same shape as _PAIR_MEMO): both embedding_neardup_pairs
# and semantic_dedup_survivors need the (vec_id, label, e, nrm, cell)
# frame AND the centroid list; the second consumer reads the persisted
# n-row result instead of re-running count + centroid collect + argmin.
_EMB_MEMO: dict[tuple[str, str], tuple[DataFrame, list]] = {}

# Above this many vectors the celled family's quantizer/assigner swap
# the bit-contract interpreted folds for the Arrow matmul assigner
# (round 12). The DuckDB twin (_SQL_EMB_ASSIGN) is exercised at sf0.01
# (2k vectors) and the bench at sf0.1 (20k) — both keep the EXACT path,
# so every oracle row is still bit-compared against the unrolled-CTE
# contract. Past the bound no oracle runs, and the interpreted n×k fold
# is the single dominant 100× cost (335.6 s of the probe's 390 s
# embedding_neardup_pairs wall measured this round); ulp-level argmin
# flips on near-tie cell boundaries change only WHICH near-boundary
# cell a vector buckets into — candidate semantics, not verified
# values.
EMB_EXACT_ASSIGN_MAX = 50_000


def _emb_assigned(spark: SparkSession, sf_dir: str):
    """(assigned base DataFrame, seed centroid list). Persisted per
    (session, sf_dir).

    Precomputes each vector's norm ONCE (n rows) instead of re-folding
    per pair (n² folds); uses the join-based assigner — bit-identical
    argmin to the literal-SQL form the oracle uses, without the
    cells×dim literal expression (135 KB of SQL + codegen blow-up at
    51×64 — measured ~2.9s/run; the broadcast-join form is O(1) plan
    size at ANY cell count). Above ``EMB_EXACT_ASSIGN_MAX`` vectors the
    quantizer fit and the final assignment run on the Arrow matmul
    argmin instead (see the constant's note — the oracle scales stay on
    the exact path)."""
    from bigdata_processing_spark.functions import vectors as V
    from bigdata_processing_spark.operators.ivf import (
        allpairs_cell_count,
        seeded_assign_cells,
        trained_centroids,
    )

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    cached = _EMB_MEMO.get(memo_key)
    if cached is not None:
        return cached
    emb = load_table(spark, sf_dir, "embeddings")
    # footer row count == emb.count() (exact by the parquet spec); the
    # cell-count contract sees the identical integer with no Spark job
    n = table_rows(sf_dir, "embeddings")
    n_cells = allpairs_cell_count(n)
    exact = n <= EMB_EXACT_ASSIGN_MAX
    cents = trained_centroids(
        emb, n_cells, n_iter=_EMB_TRAIN_ITERS, exact=exact
    )
    base = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
        V.norm(F.col("embedding")).alias("nrm"),
    # spread the argmin fold across every core before assigning: the
    # n x k scoring is CPU-bound interpreted arithmetic and the
    # embeddings scan's size-based split under-parallelizes it
    ).repartition(2 * spark.sparkContext.defaultParallelism)
    if exact:
        base = seeded_assign_cells(base, cents, carry=("label", "e", "nrm"))
    else:
        from bigdata_processing_spark.operators.clustering import _assign_udf

        base = base.withColumn("cell", _assign_udf(cents)(F.col("e")))
    base = base.persist()
    _EMB_MEMO[memo_key] = (base, cents)
    return base, cents


@register(
    "embedding_neardup_pairs",
    oracle=f"""
        WITH {_SQL_EMB_ASSIGN}
        SELECT a.vec_id AS v1, b.vec_id AS v2, a.label AS label,
               list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_sim
        FROM assigned a
        JOIN assigned b
          ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {COSINE_NEARDUP_THRESHOLD}
        ORDER BY v1, v2
    """,
)
def embedding_neardup_pairs(
    spark: SparkSession, sf_dir: str,
    cosine_threshold: float = COSINE_NEARDUP_THRESHOLD,
) -> DataFrame:
    n = table_rows(sf_dir, "embeddings")
    out = _emb_scored_pairs(spark, sf_dir, cosine_threshold)
    if n <= EMB_EXACT_ASSIGN_MAX:
        # Result-sized round-robin exchange BEFORE the global sort,
        # SMALL regime only: below the bound the scoring pipeline is an
        # exchange-free broadcast join whose re-execution by the range
        # sort's sampling job doubled the query (guide §2.4 — measured
        # 7.8 -> 0.8 s cold at sf0.1), while the thresholded pair set is
        # tiny. Above the bound the trade inverts: the pair set is
        # corpus-scale (clone mass makes result rows the dominant
        # volume) and the keyless exchange — plus its
        # sortBeforeRepartition local sort — costs MORE than re-running
        # the celled matmul scorer (measured at the 100x probe corpus:
        # 56-73 s with the exchange vs 24-29 s without, interleaved
        # A/B), so the big regime keeps the sampling re-execution.
        out = out.repartition(spark.sparkContext.defaultParallelism)
    return out.orderBy("v1", "v2")


def _emb_scored_pairs(
    spark: SparkSession, sf_dir: str,
    cosine_threshold: float = COSINE_NEARDUP_THRESHOLD,
) -> DataFrame:
    """UNSORTED thresholded in-cell pairs (v1, v2, label, cos_sim) — the
    scoring subtree of embedding_neardup_pairs without its output sort.
    The SemDeDup consumers (survivors, sweep) filter/aggregate/run
    connected components over the pair SET and never read the order, so
    routing them here drops a clone-mass global sort (and the small
    regime's pre-sort exchange) they were discarding — measured in the
    7.7 GB spill of semantic_dedup_sweep's first 100x row."""
    from bigdata_processing_spark.functions import vectors as V

    base, _cents = _emb_assigned(spark, sf_dir)
    a = base.select(
        F.col("vec_id").alias("v1"),
        "label",
        "cell",
        F.col("e").alias("e1"),
        F.col("nrm").alias("n1"),
    )
    b = base.select(
        F.col("vec_id").alias("v2"),
        F.col("label").alias("label2"),
        F.col("cell").alias("cell2"),
        F.col("e").alias("e2"),
        F.col("nrm").alias("n2"),
    )
    pairs = a.join(b, (a.label == b.label2) & (a.cell == b.cell2) & (a.v1 < b.v2))
    # Pair-dot regime (round 13): below the exact-assign bound the pair
    # volume is small (in-cell pairs ≈ n·cell_size/2) and the Arrow
    # round-trip DOMINATES the arithmetic (measured ~1.1 s of fixed
    # pandas-UDF cost vs ~0.05 s of fold on the sf0.1 pairs) — the JVM
    # fold is also bit-identical to the oracle's list_dot_product, so
    # the exact scales get MORE precise and faster at once. Above the
    # bound (no oracle runs there) the vectorized kernel keeps the
    # all-pairs-scale dot workload off the interpreted evaluator.
    n = table_rows(sf_dir, "embeddings")
    pair_dot = V.dot if n <= EMB_EXACT_ASSIGN_MAX else V.dot_vectorized
    cos = pair_dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    return pairs.select("v1", "v2", "label", cos.alias("cos_sim")).filter(
        F.col("cos_sim") >= cosine_threshold
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540): group
# embedding near-dups into semantic clusters (connected components over
# the cosine-threshold pair graph above) and keep, per cluster, the
# member with the LOWEST cosine to its cell centroid — the paper's
# keep-the-outlier policy, which preserves the most marginal example of
# each semantic neighborhood instead of its most generic one.
#
# Composition, not new machinery: candidate pairs come from the
# IVF-cell-pruned pair query (linear-ish pair work at any n), labels
# from large-star/small-star connected components (operators/graph.py),
# and the centroid similarity uses the ordered-fold dot
# (functions/vectors.dot) so both engines rank members bit-identically.
# ---------------------------------------------------------------------------
@register(
    "semantic_dedup_survivors",
    oracle=f"""
        WITH RECURSIVE {_SQL_EMB_ASSIGN},
        pairs AS (
            SELECT a.vec_id AS v1, b.vec_id AS v2
            FROM assigned a
            JOIN assigned b
              ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
                  >= {COSINE_NEARDUP_THRESHOLD}
        ),
        edges AS (
            SELECT v1 AS src, v2 AS dst FROM pairs
            UNION SELECT v2, v1 FROM pairs
        ),
        reach(node, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
        ),
        labels AS (
            SELECT node AS vec_id, min(r) AS cluster_id FROM reach GROUP BY node
        ),
        cent_sim AS (
            SELECT a.vec_id,
                   list_dot_product(a.v, c.c)
                       / (a.nrm * sqrt(list_dot_product(c.c, c.c))) AS cc
            FROM assigned a JOIN cents c ON a.cell = c.cell
        ),
        ranked AS (
            SELECT l.cluster_id, l.vec_id, s.cc,
                   row_number() OVER (PARTITION BY l.cluster_id
                                      ORDER BY s.cc ASC, l.vec_id ASC) AS rn
            FROM labels l JOIN cent_sim s ON l.vec_id = s.vec_id
        )
        SELECT cluster_id,
               count(*) AS n_members,
               min(CASE WHEN rn = 1 THEN vec_id END) AS kept_vec,
               min(CASE WHEN rn = 1 THEN cc END) AS kept_cent_sim,
               count(*) - 1 AS removed
        FROM ranked
        GROUP BY cluster_id
        ORDER BY cluster_id
    """,
)
@_memo_output
def semantic_dedup_survivors(
    spark: SparkSession, sf_dir: str,
    cosine_threshold: float = COSINE_NEARDUP_THRESHOLD,
) -> DataFrame:
    from bigdata_processing_spark.functions import vectors as V
    from bigdata_processing_spark.operators.graph import connected_components

    # unsorted scored pairs: connected components read the edge SET —
    # the registered pair query's global sort would be discarded here
    pairs = _emb_scored_pairs(spark, sf_dir, cosine_threshold).select(
        "v1", "v2"
    )
    labels, _rounds = connected_components(pairs, src="v1", dst="v2")
    labels = labels.toDF("vec_id", "cluster_id")

    assigned, cents = _emb_assigned(spark, sf_dir)
    # centroid vectors arrive as a broadcast (cell, c) table; the
    # ordered-fold dot keeps ranking bit-identical to the oracle
    cvecs = literal_df(
        spark, [(i, list(v)) for i, v in enumerate(cents)],
        "cell int, c array<double>"
    ).select("cell", "c", V.norm(F.col("c")).alias("cnrm"))
    sim = (
        assigned.join(F.broadcast(cvecs), "cell")
        .select(
            "vec_id",
            (V.dot(F.col("e"), F.col("c")) / (F.col("nrm") * F.col("cnrm"))).alias("cc"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(F.col("cc").asc(), F.col("vec_id").asc())
    ranked = (
        labels.join(sim, "vec_id")
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.min(F.when(F.col("rn") == 1, F.col("vec_id"))).alias("kept_vec"),
            F.min(F.when(F.col("rn") == 1, F.col("cc"))).alias("kept_cent_sim"),
            (F.count("*") - 1).alias("removed"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# SemDeDup ε sweep: survivors / removed / cluster-shape per cosine
# threshold, in ONE pass over the expensive work — cell-pair cosines are
# scored once at the loosest ε and persisted; each ε then re-filters the
# scored pairs (tiny) and re-runs connected components on its graph.
# This table is the measured justification for COSINE_NEARDUP_THRESHOLD,
# exactly as lsh_band_sweep justifies the 4×2 banding geometry.
# ---------------------------------------------------------------------------
_SQL_EPS_LIST = ", ".join(str(e) for e in SEMDEDUP_SWEEP_EPS)


@register(
    "semantic_dedup_sweep",
    oracle=f"""
        WITH RECURSIVE {_SQL_EMB_ASSIGN},
        eps_list AS (SELECT unnest([{_SQL_EPS_LIST}]) AS eps),
        scored AS (
            SELECT a.vec_id AS v1, b.vec_id AS v2,
                   list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_sim
            FROM assigned a
            JOIN assigned b
              ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
                  >= {min(SEMDEDUP_SWEEP_EPS)}
        ),
        pairs AS (
            SELECT e.eps, s.v1, s.v2
            FROM scored s JOIN eps_list e ON s.cos_sim >= e.eps
        ),
        edges AS (
            SELECT eps, v1 AS src, v2 AS dst FROM pairs
            UNION SELECT eps, v2, v1 FROM pairs
        ),
        reach(eps, node, r) AS (
            SELECT eps, src, src FROM edges
            UNION
            SELECT e.eps, e.src, reach.r
            FROM edges e JOIN reach ON e.dst = reach.node AND e.eps = reach.eps
        ),
        labels AS (
            SELECT eps, node AS vec_id, min(r) AS cluster_id
            FROM reach GROUP BY eps, node
        ),
        csz AS (
            SELECT eps, cluster_id, count(*) AS sz
            FROM labels GROUP BY eps, cluster_id
        ),
        tot AS (SELECT count(*) AS n_vec FROM assigned),
        agg AS (
            SELECT eps, count(*) AS n_clusters, sum(sz) AS dup_members,
                   sum(sz) - count(*) AS removed, max(sz) AS max_cluster_size
            FROM csz GROUP BY eps
        ),
        np AS (SELECT eps, count(*) AS n_pairs FROM pairs GROUP BY eps)
        SELECT el.eps AS eps,
               coalesce(np.n_pairs, 0) AS n_pairs,
               coalesce(agg.n_clusters, 0) AS n_clusters,
               coalesce(agg.dup_members, 0)::BIGINT AS dup_members,
               coalesce(agg.removed, 0)::BIGINT AS removed,
               (tot.n_vec - coalesce(agg.removed, 0))::BIGINT AS survivors,
               coalesce(agg.max_cluster_size, 0)::BIGINT AS max_cluster_size
        FROM eps_list el
        LEFT JOIN agg ON el.eps = agg.eps
        LEFT JOIN np ON el.eps = np.eps
        CROSS JOIN tot
        ORDER BY el.eps
    """,
)
@_memo_output
def semantic_dedup_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ε SemDeDup outcome over SEMDEDUP_SWEEP_EPS: pair count,
    cluster count, dup members, removed, survivors, and the largest
    cluster. Pair scoring runs once at the loosest ε (IVF-cell-pruned,
    vectorized kernel, persisted); each ε is then a filter over the
    scored pairs plus a connected-components run on its (tiny) graph —
    the corpus-scale cost is paid once, not per grid point."""
    from bigdata_processing_spark.operators.graph import connected_components

    # unsorted scored pairs: every grid point filters/aggregates the
    # pair SET — the registered pair query's global sort (and its
    # small-regime pre-sort exchange) would be discarded here
    scored = (
        _emb_scored_pairs(
            spark, sf_dir, cosine_threshold=min(SEMDEDUP_SWEEP_EPS)
        )
        .select("v1", "v2", "cos_sim")
        .persist()
    )
    _LOOSE_PERSISTS.append(scored)
    base, _cents = _emb_assigned(spark, sf_dir)
    tot = base.agg(F.count("*").alias("n_vec"))

    # ONE connected-components run for ALL grid points: each ε's subgraph
    # is tagged by encoding node = vec_id·n_eps + eps_idx, so the four
    # subgraphs become disjoint components of a single union graph and
    # the O(log²n)-round machinery (with its per-round driver probe) is
    # paid once, not per ε. Encoding is order-preserving within an ε
    # (vec_id monotone ⇒ encoded monotone), so min-of-component decodes
    # back to the plain min vec_id the oracle's per-ε closure computes.
    n_eps = len(SEMDEDUP_SWEEP_EPS)
    tagged = None
    for idx, eps in enumerate(SEMDEDUP_SWEEP_EPS):
        p = scored.filter(F.col("cos_sim") >= eps).select(
            (F.col("v1") * n_eps + idx).alias("src"),
            (F.col("v2") * n_eps + idx).alias("dst"),
        )
        tagged = p if tagged is None else tagged.unionByName(p)
    labels, _rounds = connected_components(tagged, src="src", dst="dst")
    per_eps = labels.toDF("node", "comp").select(
        F.pmod("node", F.lit(n_eps)).cast("int").alias("idx"),
        # integer DIV, not float floor: exact at any id magnitude
        F.expr(f"comp DIV {n_eps}").alias("cluster_id"),
        F.expr(f"node DIV {n_eps}").alias("vec_id"),
    )
    sz = per_eps.groupBy("idx", "cluster_id").agg(F.count("*").alias("sz"))
    stats = sz.groupBy("idx").agg(
        F.count("*").alias("n_clusters"),
        F.sum("sz").alias("dup_members"),
        (F.sum("sz") - F.count("*")).alias("removed"),
        F.max("sz").alias("max_cluster_size"),
    )
    eps_rows = literal_df(
        spark, [(i, float(e)) for i, e in enumerate(SEMDEDUP_SWEEP_EPS)],
        "idx int, eps double",
    )
    npairs = None
    for idx, eps in enumerate(SEMDEDUP_SWEEP_EPS):
        r = scored.filter(F.col("cos_sim") >= eps).agg(
            F.lit(idx).alias("idx"), F.count("*").alias("n_pairs")
        )
        npairs = r if npairs is None else npairs.unionByName(r)
    return (
        eps_rows.join(npairs, "idx", "left")
        .join(stats, "idx", "left")
        .crossJoin(tot)
        .select(
            "eps",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_clusters", F.lit(0)).alias("n_clusters"),
            F.coalesce("dup_members", F.lit(0)).alias("dup_members"),
            F.coalesce("removed", F.lit(0)).alias("removed"),
            (F.col("n_vec") - F.coalesce("removed", F.lit(0))).alias("survivors"),
            F.coalesce("max_cluster_size", F.lit(0)).alias("max_cluster_size"),
        )
        .orderBy("eps")
    )


# ---------------------------------------------------------------------------
# Canonical-doc selection: the step that actually EMITS the deduped
# corpus. Survivor policy: the cluster's min doc_id (which IS the
# propagated cluster label, so no extra argmin pass); docs outside any
# near-dup cluster survive unchanged. Reported per source so a corpus
# owner sees where the duplication lives.
# ---------------------------------------------------------------------------
@register(
    "dedup_survivors",
    oracle=f"""
        WITH RECURSIVE {_SQL_SHINGLES}, {_SQL_CAND_GUARDED}, {_SQL_PAIRS},
        edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION SELECT d2, d1 FROM pairs
        ),
        reach(node, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
        ),
        lab AS (
            SELECT node AS doc_id, min(r) AS cluster_id
            FROM reach GROUP BY node
        )
        SELECT d.source,
               count(*) AS docs_total,
               count(lab.doc_id)::BIGINT AS dup_members,
               sum(CASE WHEN lab.doc_id IS NOT NULL AND lab.doc_id <> lab.cluster_id
                        THEN 1 ELSE 0 END)::BIGINT AS removed,
               (count(*) - sum(CASE WHEN lab.doc_id IS NOT NULL
                                         AND lab.doc_id <> lab.cluster_id
                                    THEN 1 ELSE 0 END))::BIGINT AS kept
        FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id
        GROUP BY d.source
        ORDER BY d.source
    """,
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source kept/removed accounting for near-dup removal: every doc
    in a dup cluster except the cluster's min-id canonical is removed.
    Reuses the memoized verified-pair pipeline through dup_clusters —
    in a session that already ran any dedup query, this is one label
    join plus a per-source rollup. The label frame is O(dup docs) —
    30-80% of a web-scale corpus, NOT dimension-sized — so the join side
    goes through the corpus regime switch: broadcast while small,
    sort-merge past the bound."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    labels = _cluster_labels(spark, sf_dir)  # memoized (doc_id, cluster_id)
    joined = docs.join(_bcast_if_small(labels, sf_dir), "doc_id", "left")
    removed = F.when(
        F.col("cluster_id").isNotNull() & (F.col("doc_id") != F.col("cluster_id")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("docs_total"),
            F.count("cluster_id").alias("dup_members"),
            F.sum(removed).alias("removed"),
            (F.count("*") - F.sum(removed)).alias("kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Duplication provenance: which SOURCE pairs the near-duplication lives
# between. The report a corpus owner reads to find mirror sites /
# re-crawled feeds before deciding retention policy.
# ---------------------------------------------------------------------------
@register(
    "cross_source_dup_matrix",
    oracle=f"""
        WITH {_SQL_SHINGLES}, {_SQL_CAND_GUARDED}, {_SQL_PAIRS}
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               count(*) AS n_pairs
        FROM pairs p
        JOIN documents da ON p.d1 = da.doc_id
        JOIN documents db ON p.d2 = db.doc_id
        GROUP BY source_a, source_b
        ORDER BY source_a, source_b
    """,
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair counts by (source, source) — symmetric pairs folded
    with least/greatest so each source pair appears once. Reads the
    memoized verified-pair set; the pair frame is O(dup pairs), which
    grows with the corpus, so both lookup joins go through the corpus
    regime switch (broadcast small, sort-merge big) rather than forcing
    a broadcast."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = _verified_dup_pairs(spark, sf_dir).select("d1", "d2")
    da = docs.select(F.col("doc_id").alias("d1"), F.col("source").alias("sa"))
    db = docs.select(F.col("doc_id").alias("d2"), F.col("source").alias("sb"))
    m = da.join(_bcast_if_small(pairs, sf_dir), "d1")
    m = db.join(_bcast_if_small(m, sf_dir), "d2")
    return (
        m.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Containment verification: |A∩B| / min(|A|,|B|). Jaccard under-scores a
# short doc embedded in a longer one (the subset-duplicate: a page
# re-published inside a digest) because the union is dominated by the
# long side; containment is the standard second verifier web-dedup
# pipelines run on the SAME candidate set.
# ---------------------------------------------------------------------------
@register(
    "containment_dup_pairs",
    oracle=f"""
        WITH {_SQL_SHINGLES}, {_SQL_CAND_GUARDED},
        sc AS (
            SELECT c.d1, c.d2,
                   len(list_intersect(s1.sh, s2.sh)) AS inter,
                   len(s1.sh) AS n1, len(s2.sh) AS n2
            FROM cand c
            JOIN shset s1 ON c.d1 = s1.doc_id
            JOIN shset s2 ON c.d2 = s2.doc_id
        )
        SELECT d1, d2,
               round(inter::DOUBLE / least(n1, n2), 6) AS containment
        FROM sc
        WHERE inter::DOUBLE / least(n1, n2) >= {CONTAINMENT_THRESHOLD}
        ORDER BY d1, d2
    """,
)
def containment_dup_pairs(
    spark: SparkSession, sf_dir: str,
    containment_threshold: float = CONTAINMENT_THRESHOLD,
) -> DataFrame:
    """Candidate pairs whose shingle CONTAINMENT (overlap over the
    smaller set) clears the threshold (default 0.9) — catches
    subset-duplicates Jaccard misses.
    Reads the memoized scored-candidate counts, so in a session that ran
    any MinHash query this is a filter over persisted pair counts: no
    corpus scan, no shuffle."""
    sc = _scored_candidates(spark, sf_dir)
    containment = F.col("inter").cast("double") / F.least("n1", "n2")
    return (
        sc.select("d1", "d2", F.round(containment, 6).alias("containment"))
        .filter(containment >= containment_threshold)
        .orderBy("d1", "d2")
    )


# ---------------------------------------------------------------------------
# Edit-distance verification on the LSH candidates: Levenshtein is the
# right verifier for short near-identical records (titles, URLs, code
# lines) where token shingles are too coarse — a one-character edit is
# 1 - 1/len similar here but can flip several shingles. O(len²) per
# pair, so it ONLY ever runs on the candidate set, never the corpus.
# ---------------------------------------------------------------------------
# Pruned (pair, texts) set feeding the DP — memoized+persisted like the
# other dedup-family intermediates so repeated calls (bench min-of-2,
# scale smoke, verify sweeps) share one cache entry instead of leaking a
# fresh persist per invocation. The barrier also stops Catalyst from
# inlining the levenshtein expression into both the similarity filter
# and the output projection and re-deriving the candidate subtree around
# it (measured 29s vs 2s at sf0.1 for identical results).
_EDIT_PRE_MEMO: dict[tuple[str, str, float], DataFrame] = {}


def _edit_band_col(maxlen, theta: float):
    """Keep-boundary-covering band for ``levenshtein(x1, x2, band)``.

    A pair survives the verifier iff ``round(1 - dist/maxlen, 6) >=
    theta``, i.e. ``dist <= maxlen*(1-theta) + maxlen*5e-7`` (the
    round-at-6-decimals slack). The band is that bound floored, +1, so
    every keepable pair's distance is computed exactly at ANY maxlen.
    Round 10 used ``floor(maxlen*(1-theta)) + 1``, whose proof required
    ``maxlen < 2e6`` — past it the rounding slack exceeds one edit and a
    keepable pair could be silently banded to -1 → sim 0 (ADVICE r10).
    Including the slack term IN the band removes the precondition
    instead of asserting it; the widening is ``maxlen*5e-7`` DP cells —
    zero below 2e6 chars, negligible beyond."""
    return (
        F.floor(maxlen * F.lit(1.0 - theta) + maxlen * F.lit(5e-7)) + 1
    ).cast("int")


def _edit_scored_pairs(
    spark: SparkSession, sf_dir: str,
    edit_sim_threshold: float = EDIT_SIM_THRESHOLD,
) -> DataFrame:
    """(d1, d2, dist, maxlen) for every length-gap-surviving candidate
    pair — the shared input of the edit-distance verifiers.

    Round-11 shape (the sf100 probe's finding): the DP runs per DISTINCT
    TEXT PAIR, not per doc pair. Raw-md5 text identity joins each
    candidate to its (f1, f2) fingerprint pair; identical texts are dist
    0 outright, and each distinct unequal pair is verified ONCE on one
    representative text per fingerprint, the verdict joined back to all
    doc pairs that share it. Edit distance is a pure text function, so
    the expansion is exact — and on an exact-dup-heavy corpus (the 100×
    clone probe: every doc ×100, 612 s / 108 GB of sort spill in the
    old per-doc-pair form, where every pair row CARRIED both texts
    through the join and repartition) the DP count and the shuffled
    bytes collapse by the clone factor squared: pair rows carry two
    16-byte fingerprints, texts ride only the distinct-pair frame.

    dist >= |len1-len2| exactly, so the length gap bounds similarity:
    prune BEFORE the O(len·band) DP, in the integer form
    (5·|Δlen| <= maxlen) whose boundary decision matches the oracle
    bit-for-bit. The DP is CPU-bound per distinct pair: spread across
    every core (2× defaultParallelism — scales with the rig)."""
    gap_mult = edit_len_gap_mult(edit_sim_threshold)
    memo_key = (spark.sparkContext.applicationId, sf_dir, edit_sim_threshold)
    cached = _EDIT_PRE_MEMO.get(memo_key)
    if cached is not None:
        return cached
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = docs.select(
        "doc_id", F.md5("text").alias("f"), F.length("text").alias("ln")
    )
    cand = _candidate_pairs(spark, sf_dir)
    f1 = fp.select(F.col("doc_id").alias("d1"), F.col("f").alias("f1"),
                   F.col("ln").alias("l1"))
    f2 = fp.select(F.col("doc_id").alias("d2"), F.col("f").alias("f2"),
                   F.col("ln").alias("l2"))
    # cand is O(candidate pairs), fp O(corpus) — both corpus-growing:
    # regime switch, never a forced broadcast
    j = f1.join(_bcast_if_small(cand, sf_dir), "d1")
    j = f2.join(_bcast_if_small(j, sf_dir), "d2")
    maxlen = F.greatest("l1", "l2").cast("int")
    cf = j.filter(
        gap_mult * F.abs(F.col("l1") - F.col("l2")) <= F.greatest("l1", "l2")
    ).select("d1", "d2", "f1", "f2", maxlen.alias("maxlen"))
    # Big regime: cf has three consumers (identical-text leg, the
    # distinct-pair source, the verdict join-back) — persisted and
    # eagerly materialized or each re-runs the two candidate-wide merge
    # joins above (the dominant share of this leg's residual 100x sort
    # spill, same recompute the jaccard verify's cf fix removed).
    # Narrow: two ids, two 16-byte fingerprints, one int per pair.
    # Fixture scale (small regime) skips the extra job entirely.
    _big = not _fits_broadcast(sf_dir)
    if _big:
        cf = cf.persist()
        cf.count()
    same = cf.filter(F.col("f1") == F.col("f2")).select(
        "d1", "d2", F.lit(0).alias("dist"), "maxlen"
    )
    # one representative text per fingerprint (texts under one raw md5
    # are identical — min() is a deterministic pick of that one text)
    texts = docs.groupBy(F.md5("text").alias("f")).agg(
        F.min("text").alias("x")
    )
    dtp = (
        cf.filter(F.col("f1") != F.col("f2"))
        .select("f1", "f2", "maxlen")
        .distinct()
        .join(texts.select(F.col("f").alias("f1"), F.col("x").alias("x1")), "f1")
        .join(texts.select(F.col("f").alias("f2"), F.col("x").alias("x2")), "f2")
        .repartition(2 * spark.sparkContext.defaultParallelism)
    )
    raw = F.expr("levenshtein(x1, x2, _edit_band)")
    dverd = dtp.withColumn(
        "_edit_band", _edit_band_col(F.col("maxlen"), edit_sim_threshold)
    ).select(
        "f1", "f2",
        F.when(raw < 0, F.col("maxlen")).otherwise(raw).alias("dist"),
    )
    diff = (
        cf.filter(F.col("f1") != F.col("f2"))
        .join(dverd, ["f1", "f2"])
        .select("d1", "d2", "dist", "maxlen")
    )
    pre = same.unionByName(diff).persist()
    # Eager materialization (round 13): dedup_verifier_matrix reads this
    # frame from two aggregate branches of ONE action — a lazily-persisted
    # cache makes those branches RACE and run the banded DP twice (the
    # dominant tail of that query's cold run, measured ~2× the DP wall).
    # The count executes the DP exactly once; every consumer (and the
    # edit query's range-sort sampling pass) then reads the cache. The
    # frame is distinct-text-pair sized — far below the corpus.
    pre.count()
    if _big:
        cf.unpersist()  # pre is cached; cf has served its consumers
    _EDIT_PRE_MEMO[memo_key] = pre
    return pre


@register(
    "edit_distance_dup_pairs",
    oracle=f"""
        WITH {_SQL_SHINGLES}, {_SQL_CAND_GUARDED},
        pre AS (
            SELECT c.d1, c.d2, t1.text AS x1, t2.text AS x2,
                   greatest(length(t1.text), length(t2.text)) AS maxlen
            FROM cand c
            JOIN documents t1 ON c.d1 = t1.doc_id
            JOIN documents t2 ON c.d2 = t2.doc_id
            -- dist >= |len1-len2|, so sim >= θ forces the length gap
            -- under (1-θ)·maxlen: prune before the O(len²) verifier
            -- (integer form: boundary decided identically in both engines)
            WHERE {EDIT_LEN_GAP_MULT} * abs(length(t1.text) - length(t2.text))
                      <= greatest(length(t1.text), length(t2.text))
        ),
        sc AS (
            SELECT d1, d2, levenshtein(x1, x2) AS dist, maxlen FROM pre
        )
        SELECT d1, d2, dist,
               round(1 - dist::DOUBLE / maxlen, 6) AS edit_sim
        FROM sc
        WHERE round(1 - dist::DOUBLE / maxlen, 6) >= {EDIT_SIM_THRESHOLD}
        ORDER BY d1, d2
    """,
)
def edit_distance_dup_pairs(
    spark: SparkSession, sf_dir: str,
    edit_sim_threshold: float = EDIT_SIM_THRESHOLD,
) -> DataFrame:
    """LSH candidates verified by normalized Levenshtein similarity
    (1 - dist/maxlen >= threshold, default 0.8). Candidate generation is shared with the
    whole MinHash family; only the verifier differs — the raw texts are
    fetched for the candidate set by doc_id join (broadcast: candidates
    ≪ corpus) and the integer edit distance is bit-exact across
    engines."""
    # All the heavy lifting — length-gap prune, identical-text
    # short-circuit, distinct-text-pair banded DP (_edit_band_col's
    # keep-boundary band; -1 past it maps to maxlen → sim 0, filtered) —
    # lives in _edit_scored_pairs, shared with dedup_verifier_matrix.
    pre = _edit_scored_pairs(spark, sf_dir, edit_sim_threshold)
    sim = 1 - F.col("dist").cast("double") / F.col("maxlen")
    scored = pre.select(
        "d1",
        "d2",
        # DuckDB levenshtein returns BIGINT; Spark's returns int — align
        # the dtype so the driver's value hash encodes identically
        F.col("dist").cast("long").alias("dist"),
        F.round(sim, 6).alias("edit_sim"),
    )
    return (
        scored.filter(F.col("edit_sim") >= edit_sim_threshold)
        .orderBy("d1", "d2")
    )


# ---------------------------------------------------------------------------
# LSH recall audit: on a bounded doc sample, compute the TRUE near-dup
# pair set by exhaustive verification and measure what fraction the
# banding surfaced as candidates. The dedup family's own quality gate —
# banding trades recall for the collision-bounded shuffle, and this
# query puts a number on that trade (8 hashes x 4 bands here).
# ---------------------------------------------------------------------------
@register(
    "lsh_recall_audit",
    oracle=f"""
        WITH {_SQL_SHINGLES}, {_SQL_CAND_GUARDED},
        scand AS (
            SELECT d1, d2 FROM cand
            WHERE d1 < {AUDIT_SAMPLE_DOCS} AND d2 < {AUDIT_SAMPLE_DOCS}
        ),
        truth AS (
            SELECT s1.doc_id AS d1, s2.doc_id AS d2
            FROM shset s1
            JOIN shset s2 ON s1.doc_id < s2.doc_id
            WHERE s1.doc_id < {AUDIT_SAMPLE_DOCS} AND s2.doc_id < {AUDIT_SAMPLE_DOCS}
              AND len(list_intersect(s1.sh, s2.sh))::DOUBLE
                      / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
                  >= {JACCARD_THRESHOLD}
        )
        SELECT count(*) AS n_true_pairs,
               sum(CASE WHEN c.d1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_found_by_lsh,
               round(avg(CASE WHEN c.d1 IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS lsh_recall
        FROM truth t LEFT JOIN scand c ON t.d1 = c.d1 AND t.d2 = c.d2
    """,
)
def lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the LSH candidate generator against exhaustive
    all-pairs verification on the first AUDIT_SAMPLE_DOCS docs. The
    sample bound is what makes the quadratic ground truth runnable at
    ANY corpus scale — the audit's cost is fixed while the audited
    banding ran over everything; the candidate set itself comes from
    the session-memoized full-corpus pipeline, filtered to the sample.

    Sample contract: ``doc_id < AUDIT_SAMPLE_DOCS`` assumes the dense
    0-based doc_id space the fixtures guarantee (TESTDATA.md) — on a
    sparse/offset id space it silently under-samples. The id-space-
    agnostic audit is ``lsh_band_sweep`` (pooled-reference truth over
    the full corpus, no sampling at all)."""
    sh = _shingle_df(spark, sf_dir).filter(F.col("doc_id") < AUDIT_SAMPLE_DOCS)
    s1 = sh.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    jaccard = inter.cast("double") / (F.size("sh1") + F.size("sh2") - inter)
    truth = (
        s1.join(F.broadcast(s2), F.col("d1") < F.col("d2"))
        .filter(jaccard >= JACCARD_THRESHOLD)
        .select("d1", "d2")
    )
    # RAW id pairs, not the scored frame (round 12 — the tier-3 probe
    # caught this paying the full-corpus array_intersect overlap join,
    # 139 s / 74 GB spill at 100×, for counts the audit never reads;
    # the same discarded-overlap antipattern the edit family shed in
    # r11). _candidate_pairs is the identical guarded generation — and
    # the identical candidate ID SET the oracle's cand CTE mirrors —
    # without the verification join; a session that already scored
    # serves it from the memo for free.
    cand = (
        _candidate_pairs(spark, sf_dir)
        .filter((F.col("d1") < AUDIT_SAMPLE_DOCS) & (F.col("d2") < AUDIT_SAMPLE_DOCS))
        .select("d1", "d2", F.lit(1).alias("hit"))
    )
    joined = truth.join(F.broadcast(cand), ["d1", "d2"], "left")
    found = F.when(F.col("hit").isNotNull(), 1).otherwise(0)
    return joined.agg(
        F.count("*").alias("n_true_pairs"),
        F.sum(found).alias("n_found_by_lsh"),
        F.round(F.avg(found.cast("double")), 6).alias("lsh_recall"),
    )


# ---------------------------------------------------------------------------
# LSH banding-parameter sweep: recall AND precision of every banding of
# the 8-hash signature over the FULL corpus, scored against a POOLED
# reference truth — the union of all configs' (bucket-capped) candidates,
# exactly verified by bigram Jaccard. Pooling is the IR-evaluation
# trick that makes a full-corpus audit affordable: exhaustive all-pairs
# truth is quadratic, but the union of candidates across bandings
# misses a j>=0.8 pair only if EVERY config misses it
# (P < 1% at j = 0.8, vanishing as j -> 1), so pooled recall is a tight
# upper-bound estimate, comparable ACROSS configs by construction.
# No sampling, no doc_id-space assumption (ADVICE r03), any corpus size:
# cost is 4 linear bandings + verification on pooled candidates only.
# The sweep keeps the PLAIN bucket cap (no representative sampling —
# it measures banding geometry, and 1-row bands collapse into
# vocabulary-sized buckets whose recall collapse the sweep row should
# show undiluted); production candidates additionally rescue over-cap
# buckets via representatives (_scored_candidates).
# ---------------------------------------------------------------------------
LSH_SWEEP_CONFIGS = ((1, 8), (2, 4), (4, 2), (8, 1))  # (bands, rows), b·r = 8


def _sweep_band_keys_sql(b: int) -> str:
    r = N_HASHES // b
    return ", ".join(
        "md5(concat_ws('_', "
        + ", ".join([str(bi)] + [f"h{r * bi + j}" for j in range(r)])
        + "))"
        for bi in range(b)
    )


def _sweep_cand_sql(b: int) -> str:
    return f"""bands_{b} AS (
            SELECT doc_id, unnest([{_sweep_band_keys_sql(b)}]) AS bk FROM sig),
        bsz_{b} AS (SELECT bk, count(*) AS n FROM bands_{b} GROUP BY bk),
        cand_{b} AS (
            SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
            FROM bands_{b} a
            JOIN bands_{b} b ON a.bk = b.bk AND a.doc_id < b.doc_id
            JOIN bsz_{b} z ON a.bk = z.bk
            WHERE z.n <= {MAX_BUCKET})"""


def _sweep_stat_sql(b: int) -> str:
    r = N_HASHES // b
    found = (
        f"(SELECT count(*) FROM ver v JOIN cand_{b} c"
        f" ON v.d1 = c.d1 AND v.d2 = c.d2)"
    )
    return f"""
        SELECT {b} AS n_bands, {r} AS rows_per_band,
               (SELECT count(*) FROM cand_{b}) AS n_candidates,
               (SELECT count(*) FROM ver) AS n_pool_true,
               {found} AS n_true_found,
               CASE WHEN (SELECT count(*) FROM ver) = 0 THEN NULL
                    ELSE round({found}::DOUBLE
                               / (SELECT count(*) FROM ver), 6) END AS pool_recall,
               CASE WHEN (SELECT count(*) FROM cand_{b}) = 0 THEN NULL
                    ELSE round({found}::DOUBLE
                               / (SELECT count(*) FROM cand_{b}), 6) END AS precision
    """


_SQL_SWEEP = (
    f"""
        WITH {_SQL_SHINGLES}, {_SQL_SIG},
        """
    + ",\n        ".join(_sweep_cand_sql(b) for b, _ in LSH_SWEEP_CONFIGS)
    + """,
        pool AS ("""
    + " UNION ".join(f"SELECT d1, d2 FROM cand_{b}" for b, _ in LSH_SWEEP_CONFIGS)
    + f"""),
        ver AS (
            SELECT p.d1, p.d2
            FROM pool p
            JOIN shset s1 ON p.d1 = s1.doc_id
            JOIN shset s2 ON p.d2 = s2.doc_id
            WHERE len(list_intersect(s1.sh, s2.sh))::DOUBLE
                      / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
                  >= {JACCARD_THRESHOLD}
        )
        SELECT * FROM ("""
    + " UNION ALL ".join(_sweep_stat_sql(b) for b, _ in LSH_SWEEP_CONFIGS)
    + """) ORDER BY n_bands
    """
)


# 4-row output memo: without it every bench/audit re-invocation re-runs
# the 4 full-corpus bandings + pooled verification (~5-7 s warm)
_SWEEP_MEMO: dict[tuple[str, str, float, int], DataFrame] = {}


@register("lsh_band_sweep", oracle=_SQL_SWEEP)
def lsh_band_sweep(
    spark: SparkSession, sf_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Per-banding candidate count, pooled-reference recall, and exact
    precision for every (bands × rows) factorization of the 8-hash
    signature, full corpus, production bucket cap applied.

    Shapes: the signature is computed ONCE and re-banded 4 ways (banding
    is a per-row projection); each config's candidates are bounded by
    the bucket cap; exact Jaccard verification runs only on the pooled
    candidate union. Everything shuffles pair-ids and counts, never
    documents."""
    memo_key = (
        spark.sparkContext.applicationId, sf_dir, jaccard_threshold, max_bucket
    )
    cached = _SWEEP_MEMO.get(memo_key)
    if cached is not None:
        return cached
    shset = _shingle_df(spark, sf_dir).persist()
    _LOOSE_PERSISTS.append(shset)
    # unpruned dictionary vocabulary = corpus-growing: regime-switched
    # like _signature_df (the sweep bands the TEXTBOOK unpruned
    # signatures by design, so there is no df-cap bounding the vocab)
    sig = _sig_from_shex(
        shset.select("doc_id", F.explode("sh").alias("s")),
        broadcast_vocab=_fits_broadcast(sf_dir),
    ).persist()
    _LOOSE_PERSISTS.append(sig)

    # ONE tagged pass for all four bandings: every config's band keys
    # explode together as (cfg, bk), so bucket sizing, capping, and the
    # candidate self-join each run once keyed by (cfg, bk) instead of
    # four times — measured 11.6s → ~5s cold for identical output values
    all_keys = []
    for b, r in LSH_SWEEP_CONFIGS:
        for bi in range(b):
            key = F.md5(
                F.concat_ws(
                    "_", F.lit(bi), *[F.col(f"h{r * bi + j}") for j in range(r)]
                )
            )
            all_keys.append(F.struct(F.lit(b).alias("cfg"), key.alias("bk")))
    bands_all = sig.select(
        "doc_id", F.explode(F.array(*all_keys)).alias("t")
    ).select("doc_id", F.col("t.cfg").alias("cfg"), F.col("t.bk").alias("bk"))
    bsz = bands_all.groupBy("cfg", "bk").agg(F.count("*").alias("n"))
    ok = bands_all.join(bsz.filter(F.col("n") <= max_bucket), ["cfg", "bk"]).select(
        "doc_id", "cfg", "bk"
    )
    cand_all = (
        ok.select(F.col("doc_id").alias("d1"), "cfg", "bk")
        .join(ok.select(F.col("doc_id").alias("d2"), "cfg", "bk"), ["cfg", "bk"])
        .filter(F.col("d1") < F.col("d2"))
        .select("cfg", "d1", "d2")
        .distinct()
        .persist()
    )
    _LOOSE_PERSISTS.append(cand_all)

    pool = cand_all.select("d1", "d2").distinct()
    s1 = shset.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"))
    s2 = shset.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    jac = inter.cast("double") / (F.size("sh1") + F.size("sh2") - inter)
    # corpus-sized shingle-set lookups: same regime switch as the
    # guarded pipeline's verify join (a forced broadcast here ships the
    # whole corpus's shingle sets to every executor)
    ver = (
        pool.join(_bcast_if_small(s1, sf_dir), "d1")
        .join(_bcast_if_small(s2, sf_dir), "d2")
        .filter(jac >= jaccard_threshold)
        .select("d1", "d2")
        .persist()
    )
    _LOOSE_PERSISTS.append(ver)

    # Materialize the two pair caches in dependency order (round 13):
    # the final action reads cand_all from two branches and ver from two
    # — against lazy persists those branches RACE and recompute the
    # banding / verify joins concurrently. Two counts execute each
    # exactly once; every branch below is then a cache read.
    cand_all.count()
    ver.count()
    counts = cand_all.groupBy("cfg").agg(F.count("*").alias("n_candidates"))
    found = (
        ver.join(cand_all, ["d1", "d2"])
        .groupBy("cfg")
        .agg(F.count("*").alias("n_true_found"))
    )
    pool_cnt = ver.agg(F.count("*").alias("n_pool_true"))
    cfgs = literal_df(
        spark, list(LSH_SWEEP_CONFIGS), "cfg int, rows_per_band int"
    )
    out = (
        cfgs.join(counts, "cfg", "left")
        .join(found, "cfg", "left")
        .crossJoin(pool_cnt)
        .select(
            F.col("cfg").alias("n_bands"),
            "rows_per_band",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            "n_pool_true",
            F.coalesce("n_true_found", F.lit(0)).cast("long").alias("n_true_found"),
            F.when(
                F.col("n_pool_true") > 0,
                F.round(
                    F.coalesce("n_true_found", F.lit(0)).cast("double")
                    / F.col("n_pool_true"),
                    6,
                ),
            ).alias("pool_recall"),
            F.when(
                F.coalesce("n_candidates", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_true_found", F.lit(0)).cast("double")
                    / F.col("n_candidates"),
                    6,
                ),
            ).alias("precision"),
        )
    )
    result = out.orderBy("n_bands").persist()
    result.count()  # 4 rows — materialize, then the big intermediates can go
    for df in (shset, sig, ver, cand_all):
        df.unpersist()
    _SWEEP_MEMO[memo_key] = result
    return result


# ---------------------------------------------------------------------------
# Winnowing passage fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
# "Winnowing: Local Algorithms for Document Fingerprinting"): hash every
# token k-gram, slide a w-gram window, keep each window's MINIMUM hash.
# Guarantee: two docs sharing any token run of >= w+k-1 tokens share at
# least one fingerprint — so this catches COPIED PASSAGES between
# otherwise-different documents, the duplication mode whole-doc MinHash
# (global jaccard) structurally misses. Fingerprint density is ~2/(w+1)
# of positions, so the index is a sparse (doc, fp) set.
#
# Scale shape: the window-min is a per-doc sequence op (partitions are
# doc-sized); the pair join shuffles fingerprints, never text, and the
# document-frequency prune drops boilerplate fingerprints (a fp shared
# by >40 docs identifies a template, not a copied passage) BEFORE the
# pair expansion — the same guard _scored_candidates applies by default.
# ---------------------------------------------------------------------------
from bigdata_processing_spark.thresholds import (  # noqa: E402
    WIN_K,
    WIN_MAX_DF,
    WIN_MIN_SHARED,
    WIN_W,
)

_SQL_WIN_GRAM = " || '_' || ".join(f"tk[pos + {j}]" for j in range(WIN_K))


@register(
    "winnowing_dup_passages",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
            FROM documents
        ),
        pos0 AS (
            SELECT doc_id, tk,
                   unnest(range(1, greatest(len(tk) - {WIN_K - 1}, 0) + 1)) AS pos
            FROM toks
        ),
        grams AS (
            SELECT doc_id, pos,
                   ('0x' || substr(md5('win|' || {_SQL_WIN_GRAM}), 1, 8))::BIGINT AS h
            FROM pos0
        ),
        wmin AS (
            SELECT doc_id, pos,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN {WIN_W - 1} PRECEDING AND CURRENT ROW)
                       AS fp
            FROM grams
        ),
        fps AS (
            SELECT DISTINCT doc_id, fp FROM wmin WHERE pos >= {WIN_W}
        ),
        dfq AS (SELECT fp, count(DISTINCT doc_id) AS df FROM fps GROUP BY fp),
        fpp AS (
            SELECT fps.doc_id, fps.fp FROM fps JOIN dfq USING (fp)
            WHERE df <= {WIN_MAX_DF}
        )
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
        FROM fpp a JOIN fpp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY d1, d2
        HAVING count(*) >= {WIN_MIN_SHARED}
        ORDER BY d1, d2
    """,
)
def winnowing_dup_passages(
    spark: SparkSession, sf_dir: str,
    min_shared: int = WIN_MIN_SHARED,
    max_df: int = WIN_MAX_DF,
) -> DataFrame:
    """Doc pairs sharing >= ``min_shared`` winnowed passage fingerprints
    (k=WIN_K token grams, window w=WIN_W; any shared run of w+k-1
    tokens is guaranteed caught). Positions are 1-based in both
    engines (Spark ``element_at`` / DuckDB list indexing) so window
    boundaries align bit-for-bit."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tk = F.filter(T.tokens(F.col("text")), lambda t: t != "")
    n_pos = F.greatest(F.size("tk") - (WIN_K - 1), F.lit(0))
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard empties
    seq = F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
        F.array().cast("array<int>")
    )
    gram = lambda i: F.concat_ws(  # noqa: E731
        "_", *[F.element_at(F.col("tk"), i + j) for j in range(WIN_K)]
    )
    grams = (
        docs.select("doc_id", tk.alias("tk"))
        .select(
            "doc_id",
            F.explode(
                F.transform(seq, lambda i: F.struct(i.alias("pos"), gram(i).alias("g")))
            ).alias("pg"),
        )
        .select("doc_id", F.col("pg.pos").alias("pos"), T.hash64(F.col("pg.g"), "win").alias("h"))
    )
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(-(WIN_W - 1), 0)
    fps = (
        grams.select("doc_id", "pos", F.min("h").over(w).alias("fp"))
        .filter(F.col("pos") >= WIN_W)
        .select("doc_id", "fp")
        .distinct()
    )
    # count(*) == countDistinct(doc_id): fps is explicitly .distinct()
    # (doc_id, fp) — the plain count skips the distinct expand (r12)
    dfq = fps.groupBy("fp").agg(F.count("*").alias("df"))
    # df <= max_df keeps MOST of a real corpus's fingerprints (rare is
    # the common case), so the kept-fp table is O(corpus fingerprints):
    # regime switch, never a forced broadcast
    fpp = fps.join(
        _bcast_if_small(dfq.filter(F.col("df") <= max_df), sf_dir), "fp"
    ).select("doc_id", "fp")
    a = fpp.select(F.col("doc_id").alias("d1"), "fp")
    b = fpp.select(F.col("doc_id").alias("d2"), "fp")
    # the pair self-join's sides are BOTH the corpus-sized kept-fp
    # table; Catalyst's static estimate through the window+agg subtree
    # undercounts it into auto-broadcast territory (measured at the
    # 100× proof corpus) — same regime switch as the dfq join
    return (
        a.join(_bcast_if_small(b, sf_dir), ["fp"])
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy("d1", "d2")
    )


# ---------------------------------------------------------------------------
# MinHash estimator accuracy audit: on the LSH candidate pairs, compare
# the SIGNATURE-estimated jaccard (fraction of agreeing minhash
# components — the unbiased classic estimator, granularity 1/8 at 8
# hashes) against the EXACT shingle jaccard, banded by exact similarity.
# Quantifies what the signature length buys: the per-band MAE is the
# number to read before shrinking/growing N_HASHES.
# ---------------------------------------------------------------------------
_SQL_EST = (
    "("
    + " + ".join(f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(N_HASHES))
    + f")::DOUBLE / {N_HASHES}"
)


@register(
    "minhash_estimate_audit",
    oracle=f"""
        WITH {_SQL_SHINGLES}, {_SQL_CAND_GUARDED}, {_SQL_SIG},
        scored AS (
            SELECT c.d1, c.d2,
                   {_SQL_EST} AS est_j,
                   len(list_intersect(s1.sh, s2.sh))::DOUBLE
                       / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
                       AS exact_j
            FROM cand c
            JOIN sig a ON c.d1 = a.doc_id
            JOIN sig b ON c.d2 = b.doc_id
            JOIN shset s1 ON c.d1 = s1.doc_id
            JOIN shset s2 ON c.d2 = s2.doc_id
        )
        SELECT floor(exact_j * 5) / 5 AS j_band,
               count(*) AS n_pairs,
               round(avg(est_j), 6) AS avg_est,
               round(avg(exact_j), 6) AS avg_exact,
               round(avg(abs(est_j - exact_j)), 6) AS mae
        FROM scored
        GROUP BY j_band
        ORDER BY j_band
    """,
)
@_memo_output
def minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-exact-jaccard-band accuracy of the 8-hash MinHash estimator
    over the LSH candidate set: mean estimated vs mean exact similarity
    and mean absolute error. Exact overlap counts ride free off the
    memoized candidate pipeline; signatures join back by doc_id
    (candidate-bounded, broadcast)."""
    sc = _scored_candidates(spark, sf_dir)
    exact = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    )
    sig = _signature_df(spark, sf_dir)
    a = sig.select(F.col("doc_id").alias("d1"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(N_HASHES)])
    b = sig.select(F.col("doc_id").alias("d2"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(N_HASHES)])
    est = None
    for i in range(N_HASHES):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        est = term if est is None else est + term
    est = est.cast("double") / N_HASHES
    scored = (
        sc.select("d1", "d2", exact.alias("exact_j"))
        .join(a, "d1")
        .join(b, "d2")
        .select("d1", "d2", "exact_j", est.alias("est_j"))
    )
    return (
        scored.groupBy((F.floor(F.col("exact_j") * 5) / 5).alias("j_band"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("est_j"), 6).alias("avg_est"),
            F.round(F.avg("exact_j"), 6).alias("avg_exact"),
            F.round(F.avg(F.abs(F.col("est_j") - F.col("exact_j"))), 6).alias("mae"),
        )
        .orderBy("j_band")
    )


# ---------------------------------------------------------------------------
# Prefilter audit: the measured basis for the two-stage verify. On the
# UNFILTERED guarded candidate set, count how many candidates the
# signature-estimate prefilter passes and — the number that must stay
# zero — how many true pairs (exact jaccard ≥ threshold) it would drop.
# fixture-pinned at 0 in test_queries_dedup_prefilter; re-measure here
# before touching MINHASH_EST_MARGIN or N_HASHES.
# ---------------------------------------------------------------------------
@register(
    "minhash_prefilter_audit",
    oracle=f"""
        WITH {_SQL_SHINGLES}, {_SQL_CAND_GUARDED},
        scored AS (
            SELECT c.d1, c.d2,
                   {_SQL_EST_AGREE_AB} AS agree,
                   len(list_intersect(s1.sh, s2.sh))::DOUBLE
                       / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
                       AS exact_j
            FROM cand c
            JOIN sig_p a ON c.d1 = a.doc_id
            JOIN sig_p b ON c.d2 = b.doc_id
            JOIN shset s1 ON c.d1 = s1.doc_id
            JOIN shset s2 ON c.d2 = s2.doc_id
        )
        SELECT count(*) AS n_candidates,
               sum(CASE WHEN agree >= {EST_AGREE_MIN} THEN 1 ELSE 0 END)::BIGINT
                   AS n_pass,
               sum(CASE WHEN exact_j >= {JACCARD_THRESHOLD} THEN 1 ELSE 0 END)::BIGINT
                   AS n_true_pairs,
               sum(CASE WHEN exact_j >= {JACCARD_THRESHOLD}
                             AND agree < {EST_AGREE_MIN} THEN 1 ELSE 0 END)::BIGINT
                   AS n_missed
        FROM scored
    """,
)
@_memo_output
def minhash_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit of the two-stage verify: candidate count, prefilter
    pass count (the exact-verify volume the production family now pays),
    true-pair count, and the prefilter's miss count — zero on every
    fixture at the shipped margin (thresholds.MINHASH_EST_MARGIN).
    Estimates use the PRUNED signatures the pipeline actually bands on,
    unlike minhash_estimate_audit's unpruned estimator study."""
    sc = _scored_candidates(spark, sf_dir)  # unfiltered: audits the filter
    exact = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    )
    sig = _pruned_sig_df(spark, sf_dir)
    a = sig.select(F.col("doc_id").alias("d1"),
                   *[F.col(f"h{i}").alias(f"a{i}") for i in range(N_HASHES)])
    b = sig.select(F.col("doc_id").alias("d2"),
                   *[F.col(f"h{i}").alias(f"b{i}") for i in range(N_HASHES)])
    agree = None
    for i in range(N_HASHES):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        agree = term if agree is None else agree + term
    scored = (
        sc.select("d1", "d2", exact.alias("exact_j"))
        .join(a, "d1").join(b, "d2")
        .select("exact_j", agree.alias("agree"))
    )
    t = F.lit(JACCARD_THRESHOLD)
    m = F.lit(EST_AGREE_MIN)
    return scored.agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.when(F.col("agree") >= m, 1).otherwise(0)).alias("n_pass"),
        F.sum(F.when(F.col("exact_j") >= t, 1).otherwise(0)).alias("n_true_pairs"),
        F.sum(
            F.when((F.col("exact_j") >= t) & (F.col("agree") < m), 1).otherwise(0)
        ).alias("n_missed"),
    )


# ---------------------------------------------------------------------------
# Prefilter MARGIN sweep: the tuning curve behind MINHASH_EST_MARGIN.
# The round-8 mutated-clone 100× audit measured the margin's real cost
# for the first time — 2.3% of true pairs sit close enough to the
# threshold that their 8-component estimate falls under est_agree_min
# (invisible on clone corpora, where every true pair agrees on all 8).
# This query emits pass/kept/missed per candidate agree_min 0..N_HASHES
# in ONE pass over the memoized unfiltered candidates (the grid is a
# metadata-sized literal cross join), so re-tuning the margin for a
# corpus is a measurement, not a guess.
# ---------------------------------------------------------------------------
@register(
    "minhash_margin_sweep",
    oracle=f"""
        WITH {_SQL_SHINGLES}, {_SQL_CAND_GUARDED},
        scored AS (
            SELECT c.d1, c.d2,
                   {_SQL_EST_AGREE_AB} AS agree,
                   len(list_intersect(s1.sh, s2.sh))::DOUBLE
                       / (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)))
                       AS exact_j
            FROM cand c
            JOIN sig_p a ON c.d1 = a.doc_id
            JOIN sig_p b ON c.d2 = b.doc_id
            JOIN shset s1 ON c.d1 = s1.doc_id
            JOIN shset s2 ON c.d2 = s2.doc_id
        ),
        grid AS (SELECT unnest(range({N_HASHES + 1})) AS agree_min)
        SELECT g.agree_min::BIGINT AS agree_min,
               sum(CASE WHEN s.agree >= g.agree_min THEN 1 ELSE 0 END)::BIGINT
                   AS n_pass,
               sum(CASE WHEN s.exact_j >= {JACCARD_THRESHOLD}
                             AND s.agree >= g.agree_min THEN 1 ELSE 0 END)::BIGINT
                   AS n_true_kept,
               sum(CASE WHEN s.exact_j >= {JACCARD_THRESHOLD}
                             AND s.agree < g.agree_min THEN 1 ELSE 0 END)::BIGINT
                   AS n_true_missed
        FROM grid g CROSS JOIN scored s
        GROUP BY g.agree_min
        ORDER BY agree_min
    """,
)
@_memo_output
def minhash_margin_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(agree_min, n_pass, n_true_kept, n_true_missed) for every
    possible prefilter bound 0..N_HASHES — one scored pass over the
    memoized unfiltered candidate set crossed with a literal grid. The
    shipped bound is thresholds.est_agree_min(JACCARD_THRESHOLD); this
    curve is what justifies (or re-tunes) it per corpus."""
    from bigdata_processing_spark.sources.writers import literal_df

    sc = _scored_candidates(spark, sf_dir)  # unfiltered: sweeps the filter
    exact = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    )
    sig = _pruned_sig_df(spark, sf_dir)
    a = sig.select(F.col("doc_id").alias("d1"),
                   *[F.col(f"h{i}").alias(f"a{i}") for i in range(N_HASHES)])
    b = sig.select(F.col("doc_id").alias("d2"),
                   *[F.col(f"h{i}").alias(f"b{i}") for i in range(N_HASHES)])
    agree = None
    for i in range(N_HASHES):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        agree = term if agree is None else agree + term
    scored = (
        sc.select("d1", "d2", exact.alias("exact_j"))
        .join(a, "d1").join(b, "d2")
        .select("exact_j", agree.alias("agree"))
    )
    grid = literal_df(
        spark, [(m,) for m in range(N_HASHES + 1)], "agree_min bigint"
    )
    t = F.lit(JACCARD_THRESHOLD)
    return (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("agree_min")
        .agg(
            F.sum(
                F.when(F.col("agree") >= F.col("agree_min"), 1).otherwise(0)
            ).alias("n_pass"),
            F.sum(
                F.when(
                    (F.col("exact_j") >= t)
                    & (F.col("agree") >= F.col("agree_min")), 1
                ).otherwise(0)
            ).alias("n_true_kept"),
            F.sum(
                F.when(
                    (F.col("exact_j") >= t)
                    & (F.col("agree") < F.col("agree_min")), 1
                ).otherwise(0)
            ).alias("n_true_missed"),
        )
        .orderBy("agree_min")
    )


# ---------------------------------------------------------------------------
# Cluster-size histogram over the near-dup components: how big dup
# clusters get is the number that sizes everything downstream (survivor
# selection fan-in, LSH bucket caps, CC round expectations). Rides the
# memoized connected-components labels.
# ---------------------------------------------------------------------------
@register(
    "dup_cluster_size_histogram",
    oracle=f"""
        WITH RECURSIVE {_SQL_SHINGLES}, {_SQL_CAND_GUARDED}, {_SQL_PAIRS},
        edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION SELECT d2, d1 FROM pairs
        ),
        reach(node, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
        ),
        lab AS (
            SELECT node AS doc_id, min(r) AS cluster_id
            FROM reach GROUP BY node
        ),
        sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id)
        SELECT cluster_size,
               count(*) AS n_clusters,
               (cluster_size * count(*))::BIGINT AS n_docs
        FROM sz
        GROUP BY cluster_size
        ORDER BY cluster_size
    """,
)
@_memo_output
def dup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """(cluster size → number of clusters, docs covered) over the
    near-dup components. Two tiny keyed rollups on the memoized label
    set — in a session that ran any dedup query this never touches the
    corpus."""
    labels = _cluster_labels(spark, sf_dir, jaccard_threshold)
    sz = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        sz.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


# ---------------------------------------------------------------------------
# Verifier-ensemble matrix: the three exact verifiers that all run on
# the SAME LSH candidate set — global Jaccard, containment (subset
# dups), normalized edit similarity (short-record dups) — with each
# one's pair count and overlap against the Jaccard baseline. The
# one-glance report for choosing which verifier(s) a corpus needs:
# containment surfacing pairs Jaccard misses means digest/subset
# duplication; edit-only pairs mean token-shingle granularity is too
# coarse for the record shape.
# ---------------------------------------------------------------------------
@register(
    "dedup_verifier_matrix",
    oracle=f"""
        WITH {_SQL_SHINGLES}, {_SQL_CAND_GUARDED},
        sc AS (
            SELECT c.d1, c.d2,
                   len(list_intersect(s1.sh, s2.sh)) AS inter,
                   len(s1.sh) AS n1, len(s2.sh) AS n2
            FROM cand c
            JOIN shset s1 ON c.d1 = s1.doc_id
            JOIN shset s2 ON c.d2 = s2.doc_id
        ),
        jac AS (
            SELECT d1, d2 FROM sc
            WHERE inter::DOUBLE / (n1 + n2 - inter) >= {JACCARD_THRESHOLD}
        ),
        con AS (
            SELECT d1, d2 FROM sc
            WHERE inter::DOUBLE / least(n1, n2) >= {CONTAINMENT_THRESHOLD}
        ),
        edt AS (
            SELECT c.d1, c.d2
            FROM cand c
            JOIN documents t1 ON c.d1 = t1.doc_id
            JOIN documents t2 ON c.d2 = t2.doc_id
            WHERE {EDIT_LEN_GAP_MULT} * abs(length(t1.text) - length(t2.text))
                      <= greatest(length(t1.text), length(t2.text))
              AND round(1 - levenshtein(t1.text, t2.text)::DOUBLE
                            / greatest(length(t1.text), length(t2.text)), 6)
                  >= {EDIT_SIM_THRESHOLD}
        )
        SELECT * FROM (
            SELECT 'candidates' AS verifier,
                   (SELECT count(*) FROM cand) AS n_pairs,
                   (SELECT count(*) FROM jac) AS n_also_jaccard
            UNION ALL
            SELECT 'containment',
                   (SELECT count(*) FROM con),
                   (SELECT count(*) FROM con c JOIN jac j
                     ON c.d1 = j.d1 AND c.d2 = j.d2)
            UNION ALL
            SELECT 'edit_distance',
                   (SELECT count(*) FROM edt),
                   (SELECT count(*) FROM edt e JOIN jac j
                     ON e.d1 = j.d1 AND e.d2 = j.d2)
            UNION ALL
            SELECT 'jaccard',
                   (SELECT count(*) FROM jac),
                   (SELECT count(*) FROM jac)
        ) ORDER BY verifier
    """,
)
@_memo_output
def dedup_verifier_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-verifier pair counts over the shared candidate set and each
    verifier's overlap with the Jaccard baseline. Every branch reads
    the memoized candidate/edit intermediates, so in a warm session
    this is four count-aggregations over persisted pair sets."""
    sc = _scored_candidates(spark, sf_dir)
    jaccard = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    )
    containment = F.col("inter").cast("double") / F.least("n1", "n2")
    # same distinct-text-pair scored frame as edit_distance_dup_pairs
    pre = _edit_scored_pairs(spark, sf_dir)
    esim = F.round(1 - F.col("dist").cast("double") / F.col("maxlen"), 6)

    # One conditional-sum aggregation (round 13, second pass): the r13
    # tagged-union shape still paid ~15 tiny stages per cold run (4 union
    # branches re-projected off the caches, a (d1,d2)-keyed left join of
    # the 4x-expanded frame, a groupBy(verifier) exchange, the literal
    # spine join). Every matrix cell is a conditional COUNT over the SAME
    # candidate row set, with the edit verdict the only out-of-frame
    # input — so LEFT-join the (distinct-text-pair) DP verdicts onto the
    # scored candidates ONCE (both sides cached, pair-sized) and compute
    # all cells as conditional sums in a single global aggregation;
    # stack() pivots the 1-row aggregate into the 4-row matrix. No
    # groupBy exchange, no 4x union, and the always-4-rows contract now
    # holds structurally (a global agg emits exactly one row even on an
    # empty candidate set; coalesce matches the oracle's 0-count scalar
    # subqueries there). A/B bit-equal at sf0.1; cold 7.9 -> 5.7 s.
    enriched = sc.join(
        pre.select("d1", "d2", esim.alias("__esim")), ["d1", "d2"], "left"
    )
    jac_p = jaccard >= JACCARD_THRESHOLD
    con_p = containment >= CONTAINMENT_THRESHOLD
    # NULL __esim (length-gap-pruned candidate: no DP row) falls to
    # otherwise(0) — exactly the old edt-set non-membership
    edt_p = F.col("__esim") >= EDIT_SIM_THRESHOLD

    def _cnt(pred):
        return F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))

    agg = enriched.agg(
        F.count("*").alias("__n_cand"),
        _cnt(jac_p).alias("__n_jac"),
        _cnt(con_p).alias("__n_con"),
        _cnt(con_p & jac_p).alias("__nj_con"),
        _cnt(edt_p).alias("__n_edt"),
        _cnt(edt_p & jac_p).alias("__nj_edt"),
    )
    out = agg.selectExpr(
        "stack(4, "
        "'candidates', __n_cand, __n_jac, "
        "'containment', __n_con, __nj_con, "
        "'edit_distance', __n_edt, __nj_edt, "
        "'jaccard', __n_jac, __n_jac) AS (verifier, n_pairs, n_also_jaccard)"
    ).select(
        "verifier",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_also_jaccard").cast("long").alias("n_also_jaccard"),
    )
    return out.orderBy("verifier")


# ---------------------------------------------------------------------------
# Quality-aware survivor selection: keep-BEST instead of keep-first.
# Real pipelines keep the highest-quality member of a dup cluster (the
# clean original, not a truncated mirror) — min-doc_id is an arbitrary
# tie-break. Survivor = argmax quality score (the same len/stopword/
# punct heuristic as quality_scores), doc_id-ascending on ties; the
# policy-delta column counts docs whose keep/remove decision differs
# from the min-id policy (what switching policies actually changes).
# ---------------------------------------------------------------------------
@register(
    "dedup_survivors_by_quality",
    oracle=f"""
        WITH RECURSIVE {_SQL_SHINGLES}, {_SQL_CAND_GUARDED}, {_SQL_PAIRS},
        edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION SELECT d2, d1 FROM pairs
        ),
        reach(node, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
        ),
        lab AS (
            SELECT node AS doc_id, min(r) AS cluster_id
            FROM reach GROUP BY node
        ),
        members AS (
            SELECT d.doc_id, d.source, lab.cluster_id,
                   0.5 * least(length(d.text) / 500.0, 1.0)
                   + 0.3 * (len(list_filter(string_split(d.text, ' '),
                                            t -> t IN ('a','and','in','is','of','the','to')))::DOUBLE
                            / greatest(len(list_filter(string_split(d.text, ' '), t -> t <> '')), 1))
                   + 0.2 * (1 - len(regexp_extract_all(d.text, '[^a-zA-Z0-9 ]'))::DOUBLE
                                / greatest(length(d.text), 1)) AS score
            FROM documents d JOIN lab ON d.doc_id = lab.doc_id
        ),
        surv AS (
            SELECT cluster_id, doc_id AS survivor FROM (
                SELECT cluster_id, doc_id,
                       row_number() OVER (PARTITION BY cluster_id
                                          ORDER BY score DESC, doc_id ASC) AS rn
                FROM members
            ) WHERE rn = 1
        ),
        perdoc AS (
            SELECT m.source,
                   CASE WHEN m.doc_id <> s.survivor THEN 1 ELSE 0 END AS removed_q,
                   CASE WHEN m.doc_id <> m.cluster_id THEN 1 ELSE 0 END AS removed_minid
            FROM members m JOIN surv s ON m.cluster_id = s.cluster_id
        )
        SELECT source,
               count(*) AS dup_members,
               sum(removed_q)::BIGINT AS removed,
               (count(*) - sum(removed_q))::BIGINT AS kept,
               sum(CASE WHEN removed_q <> removed_minid THEN 1 ELSE 0 END)::BIGINT
                   AS policy_changed_docs
        FROM perdoc
        GROUP BY source
        ORDER BY source
    """,
)
@_memo_output
def dedup_survivors_by_quality(
    spark: SparkSession, sf_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Per-source dup accounting under keep-best-quality survivor
    policy, with the count of docs whose decision flips vs keep-first.

    Scale shape: quality scores are computed ONLY for dup-cluster
    members; the label frame is O(dup docs) — a large fraction of a
    web-scale corpus — so the member join goes through the corpus
    regime switch (broadcast small, sort-merge big); the argmax is one
    window over cluster-sized partitions."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    labels = _cluster_labels(spark, sf_dir, jaccard_threshold)
    score = (
        0.5 * F.least(F.length("text") / 500.0, F.lit(1.0))
        + 0.3
        * (
            T.stopword_count(F.col("text")).cast("double")
            / F.greatest(T.token_count(F.col("text")), F.lit(1))
        )
        + 0.2
        * (
            1
            - T.punct_count(F.col("text")).cast("double")
            / F.greatest(F.length("text"), F.lit(1))
        )
    )
    members = docs.join(_bcast_if_small(labels, sf_dir), "doc_id").select(
        "doc_id", "source", "cluster_id", score.alias("score")
    )
    w = W.partitionBy("cluster_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    surv = (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("survivor"))
    )
    perdoc = members.join(surv, "cluster_id").select(
        "source",
        F.when(F.col("doc_id") != F.col("survivor"), 1).otherwise(0).alias("removed_q"),
        F.when(F.col("doc_id") != F.col("cluster_id"), 1).otherwise(0).alias("removed_minid"),
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count("*").alias("dup_members"),
            F.sum("removed_q").alias("removed"),
            (F.count("*") - F.sum("removed_q")).alias("kept"),
            F.sum(
                F.when(F.col("removed_q") != F.col("removed_minid"), 1).otherwise(0)
            ).alias("policy_changed_docs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Document novelty: the share of a doc's distinct bigrams that are
# corpus-COMMON (document frequency >= NOVELTY_COMMON_DF). Low-novelty
# docs are templates/recombinations of corpus-wide phrasing; high-
# novelty docs carry unique content — the doc-grain complement to the
# chunk-grain boilerplate detector and the dedup family's pair grain.
# ---------------------------------------------------------------------------
NOVELTY_COMMON_DF = 10


@register(
    "doc_novelty_bands",
    oracle=f"""
        WITH {_SQL_SHINGLES},
        dfreq AS (SELECT s, count(DISTINCT doc_id) AS df FROM shex GROUP BY s),
        perdoc AS (
            SELECT shex.doc_id,
                   count(*) AS n_shingles,
                   sum(CASE WHEN dfreq.df >= {NOVELTY_COMMON_DF} THEN 1 ELSE 0 END)
                       AS n_common
            FROM shex JOIN dfreq USING (s)
            GROUP BY shex.doc_id
        ),
        banded AS (
            SELECT doc_id, n_shingles,
                   1 - n_common::DOUBLE / n_shingles AS novelty,
                   least(floor((1 - n_common::DOUBLE / n_shingles) * 5), 4)::BIGINT
                       AS novelty_band
            FROM perdoc
        )
        SELECT novelty_band,
               count(*) AS n_docs,
               round(avg(novelty), 6) AS avg_novelty,
               round(avg(n_shingles), 6) AS avg_shingles
        FROM banded
        GROUP BY novelty_band
        ORDER BY novelty_band
    """,
)
def doc_novelty_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs banded by bigram novelty (share of the doc's distinct
    bigrams with corpus df < NOVELTY_COMMON_DF), 5 bands. One shingle
    explode + a vocabulary-sized df table joined back — the same
    two-pass shape as the DF-pruned MinHash pipeline; nothing but
    (doc_id, counters) ever shuffles. The df table is O(vocabulary),
    which grows with the corpus, so the join-back goes through the
    corpus regime switch (broadcast small, sort-merge big). Docs with
    no bigrams (single-token texts) drop out in both engines (no shex
    rows)."""
    shex = _shingle_df(spark, sf_dir).select(
        "doc_id", F.explode("sh").alias("s")
    )
    # count(*) == countDistinct(doc_id): word_shingles is per-doc
    # DISTINCT, so shex rows are unique (doc_id, s) pairs (r12)
    dfreq = shex.groupBy("s").agg(F.count("*").alias("df"))
    perdoc = (
        shex.join(_bcast_if_small(dfreq, sf_dir), "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("df") >= NOVELTY_COMMON_DF, 1).otherwise(0)
            ).alias("n_common"),
        )
    )
    novelty = 1 - F.col("n_common").cast("double") / F.col("n_shingles")
    band = F.least(F.floor(novelty * 5), F.lit(4)).cast("bigint")
    return (
        perdoc.select("n_shingles", novelty.alias("novelty"), band.alias("novelty_band"))
        .groupBy("novelty_band")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("novelty"), 6).alias("avg_novelty"),
            F.round(F.avg("n_shingles").cast("double"), 6).alias("avg_shingles"),
        )
        .orderBy("novelty_band")
    )


# ---------------------------------------------------------------------------
# Corpus emission: the step that WRITES the deduplicated corpus, closing
# the loop from reports to output data. Policy-pluggable survivor
# choice (keep-first via cluster min-id, or keep-best-quality); output
# parquet partitioned by source so downstream mixture sampling reads
# per-source directories.
# ---------------------------------------------------------------------------
def emit_dedup_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    policy: str = "keep_first",
    jaccard_threshold: float = JACCARD_THRESHOLD,
) -> dict[str, int]:
    """Write the near-dup-deduplicated documents table to ``out_path``
    (parquet, PARTITIONED BY source). Returns {docs_in, docs_out,
    removed}.

    Scale shape: the removal set is cluster-membership minus survivors,
    anti-joined against the full scan. The removal set is O(dup docs) —
    30-80% of a web-scale corpus — so both the member join and the
    anti-join go through the corpus regime switch: broadcast while
    small (the corpus then streams straight from input files to output
    files), sort-merge past the bound.

    Plain overwrite write (caller owns the output dir); for the
    crash-safe staged-swap emit use pipelines/curation.curate_corpus,
    which wraps the same anti-join in the compaction swap discipline."""
    docs = load_table(spark, sf_dir, "documents")
    labels = _cluster_labels(spark, sf_dir, jaccard_threshold)
    if policy == "keep_first":
        removed = labels.filter(F.col("doc_id") != F.col("cluster_id")).select(
            "doc_id"
        )
    elif policy == "keep_best_quality":
        from pyspark.sql import Window as W

        score = (
            0.5 * F.least(F.length("text") / 500.0, F.lit(1.0))
            + 0.3
            * (
                T.stopword_count(F.col("text")).cast("double")
                / F.greatest(T.token_count(F.col("text")), F.lit(1))
            )
            + 0.2
            * (
                1
                - T.punct_count(F.col("text")).cast("double")
                / F.greatest(F.length("text"), F.lit(1))
            )
        )
        members = docs.join(_bcast_if_small(labels, sf_dir), "doc_id").select(
            "doc_id", "cluster_id", score.alias("score")
        )
        w = W.partitionBy("cluster_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        removed = (
            members.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") > 1)
            .select("doc_id")
        )
    else:
        raise ValueError(f"unknown survivor policy: {policy}")

    kept = docs.join(_bcast_if_small(removed, sf_dir), "doc_id", "left_anti")
    kept.write.mode("overwrite").partitionBy("source").parquet(out_path)
    n_in = docs.count()
    n_out = spark.read.parquet(out_path).count()
    return {"docs_in": n_in, "docs_out": n_out, "removed": n_in - n_out}


# ---------------------------------------------------------------------------
# Curation funnel, fully relational: the stage-by-stage survivor counts
# of the end-to-end curation pipeline (pipelines/curation.py) as ONE
# declarative query — exact dedup → near-dup removal → quality floor →
# mixture balance — so the flagship composed pipeline has a driver-
# verifiable correctness row (tests additionally reconcile this funnel
# against the imperative pipeline's ledger).
# ---------------------------------------------------------------------------
_SQL_QSCORE = """(0.5 * least(length(d.text) / 500.0, 1.0)
               + 0.3 * (len(list_filter(string_split(d.text, ' '),
                                        t -> t IN ('a','and','in','is','of','the','to')))::DOUBLE
                        / greatest(len(list_filter(string_split(d.text, ' '), t -> t <> '')), 1))
               + 0.2 * (1 - len(regexp_extract_all(d.text, '[^a-zA-Z0-9 ]'))::DOUBLE
                            / greatest(length(d.text), 1)))"""


@register(
    "curation_funnel",
    oracle=f"""
        WITH RECURSIVE {_SQL_SHINGLES}, {_SQL_CAND_GUARDED}, {_SQL_PAIRS},
        edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION SELECT d2, d1 FROM pairs
        ),
        reach(node, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
        ),
        lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
        keepx AS (
            SELECT min(doc_id) AS doc_id
            FROM documents
            GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        ),
        surv2 AS (
            SELECT k.doc_id FROM keepx k LEFT JOIN lab ON k.doc_id = lab.doc_id
            WHERE lab.doc_id IS NULL OR lab.doc_id = lab.cluster_id
        ),
        q3 AS (
            SELECT d.doc_id, d.source
            FROM documents d JOIN surv2 ON d.doc_id = surv2.doc_id
            WHERE {_SQL_QSCORE} >= 0.35
        ),
        src AS (SELECT source, count(*) AS cnt FROM q3 GROUP BY source),
        tgt AS (SELECT min(cnt) AS t FROM src),
        q4 AS (
            SELECT q3.doc_id
            FROM q3 JOIN src ON q3.source = src.source CROSS JOIN tgt
            WHERE ('0x' || substr(md5('curate|' || CAST(q3.doc_id AS VARCHAR)), 1, 8))::BIGINT
                      % 1000000
                  < CAST(floor(tgt.t::DOUBLE / src.cnt * 1000000) AS BIGINT)
        )
        SELECT * FROM (
            SELECT 1 AS stage_idx, 'exact_dedup' AS stage,
                   (SELECT count(*) FROM keepx) AS docs
            UNION ALL
            SELECT 2, 'near_dedup', (SELECT count(*) FROM surv2)
            UNION ALL
            SELECT 3, 'quality_filter', (SELECT count(*) FROM q3)
            UNION ALL
            SELECT 4, 'mixture_balance', (SELECT count(*) FROM q4)
        ) ORDER BY stage_idx
    """,
)
@_memo_output
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage survivor counts of the curation chain, one row per
    stage. Mirrors pipelines/curation.curate_corpus semantics exactly
    (same fingerprint keep-first, CC canonical survivors, quality
    formula and threshold, hash-deterministic balance arithmetic) but
    stays a pure relational query with a DuckDB twin."""
    from bigdata_processing_spark.pipelines.curation import (
        QUALITY_MIN,
        _quality_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    keepx = (
        docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    labels = _cluster_labels(spark, sf_dir)
    near_removed = labels.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    # near_removed is O(dup docs): regime switch, never a forced broadcast
    surv2 = keepx.join(_bcast_if_small(near_removed, sf_dir), "doc_id", "left_anti")
    q3 = (
        docs.join(surv2, "doc_id", "left_semi")
        .filter(_quality_score() >= QUALITY_MIN)
        .select("doc_id", "source")
    )
    src = q3.groupBy("source").agg(F.count("*").alias("cnt"))
    tgt = src.agg(F.min("cnt").alias("t"))
    bucket = F.pmod(
        T.hash64(F.col("doc_id").cast("string"), "curate"), F.lit(1_000_000)
    )
    q4 = (
        q3.join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(tgt))
        .filter(
            bucket
            < F.floor(F.col("t").cast("double") / F.col("cnt") * 1_000_000).cast(
                "bigint"
            )
        )
        .select("doc_id")
    )

    def row(idx: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("docs")).select(
            F.lit(idx).alias("stage_idx"), F.lit(name).alias("stage"), "docs"
        )

    return (
        row(1, "exact_dedup", keepx)
        .unionByName(row(2, "near_dedup", surv2))
        .unionByName(row(3, "quality_filter", q3))
        .unionByName(row(4, "mixture_balance", q4))
        .orderBy("stage_idx")
    )
