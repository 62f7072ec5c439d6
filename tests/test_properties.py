"""Property-based tests (hypothesis): engine function semantics hold on
arbitrary inputs, checked against plain-Python models."""

from __future__ import annotations

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bigdata_processing_spark.functions import text as T
from bigdata_processing_spark.functions import vectors as V

# one executor round-trip per example is expensive — keep example counts
# small but meaningful
_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs", "Po")),
    max_size=80,
)


@given(ts=st.lists(texts, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_token_count_model(spark, ts):
    df = spark.createDataFrame([(t,) for t in ts], "t string")
    got = [r.n for r in df.select(T.token_count(F.col("t")).alias("n")).collect()]
    want = [len([w for w in t.split(" ") if w != ""]) for t in ts]
    assert got == want


@given(t=texts, n=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_shingles_model(spark, t, n):
    df = spark.createDataFrame([(t,)], "t string")
    got = df.select(T.word_shingles(F.col("t"), n).alias("s")).collect()[0]["s"]
    toks = [w for w in t.split(" ") if w != ""]
    if n == 1:
        want = list(dict.fromkeys(toks))
    else:
        want = list(
            dict.fromkeys(
                "_".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
            )
        )
    assert got == want


@given(
    v=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=16
    )
)
@settings(**_SETTINGS)
def test_dot_model(spark, v):
    df = spark.createDataFrame([(v, v)], "a: array<double>, b: array<double>")
    got = df.select(V.dot(F.col("a"), F.col("b")).alias("d")).collect()[0]["d"]
    want = math.fsum(x * x for x in v)
    assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-9)


@given(t=texts)
@settings(**_SETTINGS)
def test_fingerprint_is_whitespace_invariant(spark, t):
    variants = [t, f"  {t} ", t.replace(" ", "  ")]
    df = spark.createDataFrame([(v,) for v in variants], "t string")
    fps = {r.f for r in df.select(T.fingerprint(F.col("t")).alias("f")).collect()}
    assert len(fps) == 1


@given(ts=st.lists(texts, min_size=2, max_size=6))
@settings(**_SETTINGS)
def test_streaming_signature_equals_batch_signature(spark, ts):
    """Map-side array-fold signatures (streaming/dedup.signature_cols)
    must equal the batch explode+groupBy signatures for ANY text —
    the invariant that makes streamed and batch dedup comparable."""
    from bigdata_processing_spark.queries.dedup import _sig_from_shex
    from bigdata_processing_spark.streaming.dedup import N_HASHES, signature_cols

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "doc_id long, text string"
    )
    mapside = {
        r.doc_id: tuple(r[f"h{i}"] for i in range(N_HASHES))
        for r in df.select("doc_id", *signature_cols(F.col("text"))).collect()
    }
    shex = df.select(
        "doc_id", F.explode(T.word_shingles(F.col("text"), 2)).alias("s")
    )
    batch = {
        r.doc_id: tuple(r[f"h{i}"] for i in range(N_HASHES))
        for r in _sig_from_shex(shex).collect()
    }
    # docs with <2 tokens have no shingles: absent from batch (groupBy on
    # empty), null signature map-side — compare on the common domain
    for d, sig in batch.items():
        assert mapside[d] == sig


@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    n=st.integers(min_value=2, max_value=5),
)
@settings(**_SETTINGS)
def test_ntile_sizes_differ_by_at_most_one(spark, vals, n):
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    sizes = [
        r.c
        for r in df.select(F.ntile(n).over(w).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    assert sum(sizes) == len(vals)
    assert max(sizes) - min(sizes) <= 1


@given(
    v=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_quantize_dequantize_error_bound(spark, v):
    """Symmetric int8 quantization: every dequantized element is within
    scale/2 of the original (round-half-up), for ANY vector including
    all-zero (epsilon-floored scale)."""
    from bigdata_processing_spark.operators.quantization import quantize

    df = spark.createDataFrame([(1, v)], "vec_id long, embedding array<double>")
    r = quantize(df).collect()[0]
    assert r.scale > 0
    assert all(q is not None for q in r.qvec)
    for x, q in zip(v, r.qvec):
        assert abs(q * r.scale - x) <= r.scale / 2 + 1e-12
        assert abs(q) <= 127


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),        # key (few → collisions)
            st.integers(min_value=-10**9, max_value=10**9),
        ),
        min_size=1,
        max_size=30,
    ),
    n_salts=st.integers(min_value=1, max_value=8),
)
@settings(**_SETTINGS)
def test_salted_agg_exact_for_integers(spark, rows, n_salts):
    """Two-stage salted aggregation is bit-identical to plain groupBy for
    algebraic integer aggregates, for any data and any salt count."""
    from bigdata_processing_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, "k long, v long")
    plain = {
        (r.k): (r.s, r.c, r.lo, r.hi)
        for r in df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("c"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        ).collect()
    }
    salted = {
        (r.k): (r.s, r.c, r.lo, r.hi)
        for r in salted_agg(
            df, ["k"],
            {"s": ("sum", "v"), "c": ("count", "v"),
             "lo": ("min", "v"), "hi": ("max", "v")},
            n_salts=n_salts,
        ).collect()
    }
    assert plain == salted


@given(
    ts=st.lists(
        st.datetimes(
            min_value=__import__("datetime").datetime(1971, 1, 1),
            max_value=__import__("datetime").datetime(2100, 1, 1),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_epoch_us_matches_python_utc_model(spark, ts):
    """epoch_us on a TIMESTAMP_NTZ column equals the Python naive-as-UTC
    epoch computation for any wall time, regardless of session zone."""
    import datetime as dt

    from bigdata_processing_spark.functions.temporal import epoch_us

    ts = [t.replace(microsecond=(t.microsecond // 1000) * 1000) for t in ts]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "i long, ts timestamp_ntz"
    )
    got = {r.i: r.us for r in df.select("i", epoch_us(df, "ts").alias("us")).collect()}
    epoch = dt.datetime(1970, 1, 1)

    def us(td: "dt.timedelta") -> int:
        # exact integer micros — total_seconds()*1e6 loses precision for
        # multi-year deltas (float has 52 mantissa bits, ~2^48 us/decade)
        return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds

    want = {i: us(t - epoch) for i, t in enumerate(ts)}
    assert got == want


@given(
    a=st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False),
               min_size=64, max_size=64),
    b=st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False),
               min_size=64, max_size=64),
)
@settings(**_SETTINGS)
def test_sign_word_packing_model(spark, a, b):
    """Packed sign words match the bit model, and popcount-of-XOR
    Hamming equals the direct sign-mismatch count."""
    from bigdata_processing_spark.queries.similarity import _sign_word

    def words(v):
        w0 = sum(1 << i for i in range(32) if v[i] > 0)
        w1 = sum(1 << i for i in range(32) if v[32 + i] > 0)
        return w0, w1

    df = spark.createDataFrame([(a,), (b,)], "e: array<double>")
    got = [
        (r.w0, r.w1)
        for r in df.select(
            _sign_word("e", 0).alias("w0"), _sign_word("e", 32).alias("w1")
        ).collect()
    ]
    assert got == [words(a), words(b)]
    ham_model = sum((x > 0) != (y > 0) for x, y in zip(a, b))
    (aw0, aw1), (bw0, bw1) = got
    ham_packed = bin(aw0 ^ bw0).count("1") + bin(aw1 ^ bw1).count("1")
    assert ham_packed == ham_model


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2),              # user
                  st.integers(0, 5 * 3600)),      # seconds offset
        min_size=1, max_size=12, unique=True,
    )
)
@settings(**_SETTINGS)
def test_sessionize_model(spark, events, tmp_path_factory):
    """sessionize_events' histogram equals a plain-Python gap model."""
    import collections
    import datetime as dt
    import os

    from bigdata_processing_spark.queries.timeseries import (
        SESSION_GAP_US,
        sessionize_events,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=sec), uid, "click", 1.0, "{}")
        for i, (uid, sec) in enumerate(events)
    ]
    d = str(tmp_path_factory.mktemp("sess"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

    # model: per user, sort by (ts, event_id); new session on gap > 30min
    per_user = collections.defaultdict(list)
    for i, (uid, sec) in enumerate(events):
        per_user[uid].append((sec, i))
    sessions = []
    for uid, evs in per_user.items():
        evs.sort()
        cur = [evs[0]]
        for prev, nxt in zip(evs, evs[1:]):
            if (nxt[0] - prev[0]) * 1_000_000 > SESSION_GAP_US:
                sessions.append((uid, cur))
                cur = []
            cur.append(nxt)
        sessions.append((uid, cur))
    hist = collections.Counter(min(len(s), 10) for _, s in sessions)

    got = {r.events_per_session: r.n_sessions for r in sessionize_events(spark, d).collect()}
    assert got == dict(hist)


@given(ts=st.lists(texts, min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_hashed_tf_model_matches_duckdb(spark, ts):
    """hashed_tf's bucket-count vector is bit-identical to its SQL twin
    for arbitrary unicode text (md5-over-UTF8 and the whitespace split
    must agree across engines, not just on the fixture vocabulary)."""
    import duckdb

    from bigdata_processing_spark.functions.text import hashed_tf, hashed_tf_sql

    df = spark.createDataFrame(list(enumerate(ts)), "i int, t string")
    got = {
        r.i: list(r.v)
        for r in df.select("i", hashed_tf(F.col("t"), 8).alias("v")).collect()
    }
    con = duckdb.connect()
    expr = hashed_tf_sql("t", 8)
    for i, t in enumerate(ts):
        want = con.execute(
            f"SELECT {expr} FROM (SELECT ?::VARCHAR AS t)", [t]
        ).fetchone()[0]
        assert got[i] == list(want), (t, got[i], want)
