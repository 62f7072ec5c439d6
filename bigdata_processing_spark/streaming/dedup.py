"""Incremental MinHash near-dup detection over a document stream —
the custom-stateful-operator slice (applyInPandasWithState).

Batch near-dup (queries/dedup.py) recomputes the LSH index per run; at
ingest time you want each arriving document checked against everything
already seen WITHOUT rescanning the corpus. Shape:

1. **Stateless signature stage** (pure Column exprs, map-side): shingles
   → per-doc MinHash signature via ``array_min(transform(...))`` — no
   shuffle, no state, so it composes with the stateful stage below
   (streaming allows limited stateful-operator chaining; keeping the
   signature map-side sidesteps that entirely).
2. **Stateful band stage**: explode band keys, group by band key,
   ``applyInPandasWithState`` keeps each bucket's members (doc_id +
   shingle blob) in the state store. Each arriving doc is verified
   (exact bigram Jaccard) against its bucket's priors and emitted if
   ≥ threshold. State per bucket is capped at ``max_bucket`` members —
   the same pathological-bucket guard as batch ``MAX_BUCKET``/pruning —
   so state size is bounded by #buckets × cap regardless of stream
   length.

Same hash family / banding / threshold as the batch pipeline, so the
streamed pair set equals the batch ``minhash_lsh_dup_pairs`` result on
the same corpus (asserted in tests/test_streaming_dedup.py) — modulo
cross-bucket duplicate emission, which batch dedups with DISTINCT and
callers dedup downstream here (a per-bucket operator cannot see other
buckets' emissions).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bigdata_processing_spark.functions import text as T

N_HASHES = 8
N_BANDS = 4
JACCARD_THRESHOLD = 0.8
SEP = "\x01"

_OUT_SCHEMA = "d1 bigint, d2 bigint, jaccard double"
_STATE_SCHEMA = "doc_ids array<bigint>, blobs array<string>, stamps array<double>"


def signature_cols(doc_text) -> list:
    """MinHash signature h0..h{k-1} as map-side array folds over the
    shingle set — signature math identical to the batch pipeline
    (functions/text.minhash_hashes), but with no per-doc aggregation."""
    sh = T.word_shingles(doc_text, 2)

    def hasher(seed: int, chunk: int):
        # exactly-one-arg lambda: F.transform infers lambda arity from the
        # Python signature, so closure capture (not default args) is required
        return lambda s: F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}|"), s)), 1 + 8 * chunk, 8),
            16,
            10,
        ).cast("bigint")

    cols = []
    for i in range(N_HASHES):
        seed, chunk = divmod(i, 4)
        cols.append(F.array_min(F.transform(sh, hasher(seed, chunk))).alias(f"h{i}"))
    return [sh.alias("sh")] + cols


def banded(docs: DataFrame, text_col: str = "text",
           ts_col: str | None = None) -> DataFrame:
    """(bk, doc_id, blob, ts) — one row per (band, doc); blob is the
    SEP-joined shingle set carried to the verifier; ts drives retention
    (0.0 when the stream carries no event time)."""
    ts = F.col(ts_col).cast("double") if ts_col else F.lit(0.0)
    sig = docs.select("doc_id", ts.alias("ts"), *signature_cols(F.col(text_col)))
    band_keys = F.array(
        *[
            F.md5(F.concat_ws("_", F.lit(b), F.col(f"h{2*b}"), F.col(f"h{2*b+1}")))
            for b in range(N_BANDS)
        ]
    )
    return sig.select(
        "doc_id",
        "ts",
        # event-time twin of ts for watermarking (timeout-based eviction
        # of idle buckets needs a TimestampType watermark column)
        F.timestamp_seconds(F.col("ts")).alias("event_ts"),
        F.array_join("sh", SEP).alias("blob"),
        F.explode(band_keys).alias("bk"),
    )


def _jaccard(a: set, b: set) -> float:
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def _bucket_matcher(max_bucket: int, max_age: float | None = None,
                    event_timeout: bool = False):
    def match_bucket(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if event_timeout and state.hasTimedOut:
            # idle-bucket eviction: the watermark passed this bucket's
            # high-water + max_age, so every member is out of retention
            # and no in-watermark future row can match — drop the whole
            # bucket so cold buckets don't hold state forever
            state.remove()
            yield pd.DataFrame([], columns=["d1", "d2", "jaccard"])
            return
        if state.exists:
            doc_ids, blobs, stamps = state.get
            doc_ids, blobs, stamps = list(doc_ids), list(blobs), list(stamps)
        else:
            doc_ids, blobs, stamps = [], [], []
        known = set(doc_ids)
        sets = [set(b.split(SEP)) if b else set() for b in blobs]
        out: list[tuple[int, int, float]] = []
        hwm = max(stamps) if stamps else float("-inf")  # bucket's event-time high-water
        for pdf in pdfs:
            for _, row in pdf.sort_values("doc_id").iterrows():
                did = int(row["doc_id"])
                if did in known:  # replays / duplicate band rows
                    continue
                ts = float(row["ts"])
                hwm = max(hwm, ts)
                if max_age is not None:
                    # bounded retention: members older than the bucket's
                    # high-water minus max_age can no longer match — drop
                    # them so state stays proportional to the retention
                    # window, not the stream's lifetime
                    cutoff = hwm - max_age
                    live = [i for i, st in enumerate(stamps) if st >= cutoff]
                    if len(live) < len(doc_ids):
                        doc_ids = [doc_ids[i] for i in live]
                        blobs = [blobs[i] for i in live]
                        stamps = [stamps[i] for i in live]
                        sets = [sets[i] for i in live]
                        known = set(doc_ids)
                s = set(row["blob"].split(SEP)) if row["blob"] else set()
                for prior, pset in zip(doc_ids, sets):
                    j = _jaccard(s, pset)
                    if j >= JACCARD_THRESHOLD:
                        lo, hi = sorted((prior, did))
                        out.append((lo, hi, j))
                if len(doc_ids) < max_bucket:
                    doc_ids.append(did)
                    sets.append(s)
                    blobs.append(row["blob"])
                    stamps.append(ts)
                    known.add(did)
        state.update((doc_ids, blobs, stamps))
        if event_timeout and max_age is not None and hwm > float("-inf"):
            # arm the idle timer: fire once the watermark passes the
            # bucket's high-water + retention (must stay strictly ahead
            # of the current watermark or Spark rejects it)
            timeout_ms = max(
                int((hwm + max_age) * 1000),
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame(out, columns=["d1", "d2", "jaccard"])

    return match_bucket


def streaming_dup_pairs(docs: DataFrame, text_col: str = "text",
                        max_bucket: int = 1000,
                        ts_col: str | None = None,
                        max_age: float | None = None,
                        late_tolerance: float | None = None) -> DataFrame:
    """Verified near-dup pairs for a document stream (or batch frame —
    the parity invariant): each doc vs all previously-seen docs sharing
    an LSH band bucket. Emits (d1, d2, jaccard) with d1 < d2; may emit a
    pair once per shared bucket (dedup downstream).

    Bounded retention: with ``ts_col`` + ``max_age`` (same units as the
    column, e.g. epoch seconds), bucket members falling ``max_age``
    behind their bucket's event-time high-water mark are evicted before
    matching, AND buckets that go cold are dropped wholesale by an
    event-time timeout once the stream's watermark passes their
    high-water + max_age — so total state tracks the retention window
    for every bucket, not just actively-written ones. Default (None)
    keeps members forever (full-corpus dedup).

    Late-row trade-off: the timeout requires a watermark, and Spark
    drops rows arriving more than the watermark delay behind the
    stream's max event time BEFORE they reach the matcher — even ones
    that could still have verified against a bucket whose own high-water
    lags the global watermark. ``late_tolerance`` (seconds, default
    ``max_age``) is that delay: raise it to trade state size for fewer
    missed late pairs. Batch mode and the no-retention config have no
    watermark and never drop rows. The drop is silent at runtime —
    monitor it with :func:`watermark_dropped_rows` on the running query
    (alerts on a nonzero counter are the operational signal that
    ``late_tolerance`` is too tight for the stream's lateness)."""
    b = banded(docs, text_col, ts_col=ts_col)
    event_timeout = (
        docs.isStreaming and ts_col is not None and max_age is not None
    )
    timeout = GroupStateTimeout.NoTimeout
    if event_timeout:
        delay_ms = int((late_tolerance if late_tolerance is not None else max_age) * 1000)
        b = b.withWatermark("event_ts", f"{delay_ms} milliseconds")
        timeout = GroupStateTimeout.EventTimeTimeout
    return b.groupBy("bk").applyInPandasWithState(
        _bucket_matcher(max_bucket, max_age=max_age, event_timeout=event_timeout),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def watermark_dropped_rows(query) -> int:
    """Total rows silently dropped by the watermark across a streaming
    query's recorded progress — the operational counter for the
    late-row trade-off documented on :func:`streaming_dup_pairs`.
    Nonzero means events arrived more than ``late_tolerance`` behind the
    stream's max event time and never reached the matcher; raise
    ``late_tolerance`` (at the cost of state) if those pairs matter."""
    total = 0
    for p in query.recentProgress:
        for op in (p.get("stateOperators") or []):
            total += int(op.get("numRowsDroppedByWatermark") or 0)
    return total
