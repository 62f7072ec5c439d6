"""Deterministic sketches: KMV distinct-count, Bloom-bitmap join
pruning, and a portable count-min sketch.

KMV (k-minimum-values) distinct-count estimation: hash each key to a
uniform [0,1) value, keep the ``k`` smallest distinct hashes per group,
and estimate ``(k-1) / h_k`` from the k-th minimum (Bar-Yossef et al.,
"Counting distinct elements in a data stream", RANDOM 2002). Unlike
HLL (``approx_count_distinct``), whose register layout is
engine-internal, KMV is *portable*: any engine with md5 reproduces the
exact same estimate, so the sketch is cross-engine oracle-checkable —
and mergeable (union the k-min sets, re-take the k smallest), which is
what makes it a sketch and not just a sample.

Precision contract for the hash: the first 13 hex chars of md5 are a
52-bit integer, below 2^53 — every value and every partial arithmetic
result is an exactly-representable IEEE double, so Spark and DuckDB
produce bit-identical hashes regardless of evaluation order.

Scale design: one shuffle for the (group, hash) distinct, then a
two-stage k-min — per-salt top-k first (parallel over ``n_salts``
reducers per group), then top-k of the ≤ ``n_salts × k`` survivors.
No group's full distinct stream ever funnels through one task's sort,
so a hot group costs what a salted aggregation costs. State per group
is k doubles — at 100 TB the sketch output is KBs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 52  # 13 hex chars of md5: exact in an IEEE double


def hash01(col: Column) -> Column:
    """Uniform [0,1) hash of a key, bit-identical in any md5-capable
    engine. DuckDB twin:
    ``CAST('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 13) AS BIGINT)
    / 4503599627370496.0``."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << HASH_BITS))


def kmv_minset(
    df: DataFrame,
    key: str,
    group_cols: list[str],
    k: int = 64,
    n_salts: int = 16,
) -> DataFrame:
    """Per-group k-minimum hash set — the KMV *sketch itself*, one
    (group, h) row per surviving hash (≤ k per group). This is the
    mergeable representation: the union of two sets' sketches, re-cut
    to the k smallest, IS the union's sketch (every hash in the union's
    true k-min is in one of the operands' k-mins)."""
    hashes = df.select(
        *group_cols, hash01(F.col(key)).alias("h")
    ).distinct()
    # two-stage k-min: every global top-k hash is top-k within its salt,
    # so the salted prefilter is lossless
    salt = (F.col("h") * F.lit(float(1 << HASH_BITS))).cast("long") % n_salts
    w1 = Window.partitionBy(*group_cols, "salt").orderBy("h")
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.withColumn("salt", salt)
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= k)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select(*group_cols, "h")
    )


def kmv_estimate(minset: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Distinct-count estimate from a k-min set: exact (= n_min) when
    the group holds fewer than ``k`` hashes, else ``(k-1)/h_k``."""
    return minset.groupBy(*group_cols).agg(
        F.count("*").alias("n_min"), F.max("h").alias("h_k")
    ).select(
        *group_cols,
        F.when(F.col("n_min") < k, F.col("n_min").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("h_k"))
        .alias("kmv_est"),
    )


def kmv_merge(minsets: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Merge sketches by union: drop the original grouping (the caller
    selects/renames ``group_cols`` to the merged identity first),
    dedupe hashes shared across operands, and re-cut to the k smallest.
    Never touches raw data — this is what makes KMV a sketch."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        minsets.select(*group_cols, "h").distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(*group_cols, "h")
    )


def kmv_distinct(
    df: DataFrame,
    key: str,
    group_cols: list[str],
    k: int = 64,
    n_salts: int = 16,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns one row per group with ``kmv_est`` (double): exact when the
    group has fewer than ``k`` distinct hashes, else ``(k-1)/h_k``.
    """
    return kmv_estimate(kmv_minset(df, key, group_cols, k, n_salts), group_cols, k)


# ---------------------------------------------------------------------------
# Bloom-bitmap join pruning.
#
# The classic shuffle-reduction move for a selective big⋈small join at
# 100 TB: hash the small side's join keys into an m-bit bitmap (a
# single-hash Bloom filter — optimal k≈1 when m ≫ n, and one hash keeps
# the probe to a single broadcast join), broadcast the bitmap, and drop
# big-side rows whose bit is unset BEFORE the join's shuffle. The prune
# is a guaranteed superset of the true matches (Bloom filters have no
# false negatives), so following it with the exact join returns exactly
# the plain join's rows — the bitmap is purely a physical optimization
# and any oracle for the un-pruned query still holds.
#
# Representation: the bitmap is a DataFrame of (word, bword) longs —
# at most bits/64 rows (2048 rows for the default 2^17 bits), built
# with one bit_or aggregation over the small side and broadcast to the
# big side. No driver collect, no UDF; the probe is an inner join on
# word (absent word ⇒ no bits set ⇒ prune) plus a shift-and-mask test.
# xxhash64 (JVM-side, no md5 cost) is fine here: the hash never needs
# cross-engine portability because the final result is exact.
# ---------------------------------------------------------------------------
BLOOM_BITS_DEFAULT = 1 << 17


def bloom_bitmap(small: DataFrame, key: str, bits: int = BLOOM_BITS_DEFAULT) -> DataFrame:
    """m-bit single-hash Bloom filter over ``small[key]`` as ≤ bits/64
    rows of (word long, bword long). One shuffle of (word, partial-or)
    pairs — map-side bit_or combine makes it ≤ bits/64 rows per task."""
    return (
        small.select(F.pmod(F.xxhash64(F.col(key)), F.lit(bits)).alias("pos"))
        .select(
            F.expr("CAST(pos DIV 64 AS BIGINT)").alias("word"),
            # SQL form: the Python shiftleft() only takes literal counts
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bword"))
    )


def bloom_prune(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    bits: int = BLOOM_BITS_DEFAULT,
) -> DataFrame:
    """Rows of ``big`` whose key *might* appear in ``small[small_key]``
    — a superset of the true matches (no false negatives; false-positive
    rate ≈ n_small/bits for bits ≫ n_small). Compose with the exact
    join afterwards: the pruned side ships (selectivity + fpr) of the
    original shuffle volume.

    The bitmap is materialized (one small job) and inlined as a literal
    array predicate — the same execute-build-side-then-inline move
    Spark's own runtime bloom filter injection makes, and the same
    parsed-SQL-literal path as the IVF centroid scores. A literal
    filter sits on the big side's scan and CANNOT be hoisted above the
    exact join, whereas the join-probe form (``bloom_prune_join``) gets
    reordered by PushDownLeftSemiAntiJoin, which would re-shuffle the
    un-pruned side first (observed in test_plans). Driver traffic is
    bounded metadata: ≤ bits/64 longs (2 KB·words), like the k-means
    centroids — never data."""
    arr = [0] * ((bits + 63) // 64)  # ceil: the top word is partial when bits % 64 != 0
    for r in bloom_bitmap(small, small_key, bits).collect():
        arr[r.word] = r.bword
    lits = ",".join(f"{v}L" for v in arr)
    pred = (
        f"(shiftrightunsigned(element_at(array({lits}), "
        f"CAST(pmod(xxhash64(`{big_key}`), {bits}) DIV 64 AS INT) + 1), "
        f"CAST(pmod(xxhash64(`{big_key}`), {bits}) % 64 AS INT)) "
        f"& CAST(1 AS BIGINT)) = 1"
    )
    return big.filter(F.expr(pred))


def bloom_prune_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    bits: int = BLOOM_BITS_DEFAULT,
) -> DataFrame:
    """Fully-distributed variant of :func:`bloom_prune`: probes the
    broadcast (word, bword) bitmap with an inner join + bit test — no
    driver round-trip, for pipelines that must stay lazy end-to-end.
    Caveat: Catalyst may reorder the probe join relative to a following
    exact join, so the pre-shuffle placement is not guaranteed the way
    the literal-predicate form guarantees it."""
    # collision-safe names throughout: a big side that legitimately has a
    # `word`/`bword` column must pass through untouched
    bitmap = bloom_bitmap(small, small_key, bits).select(
        F.col("word").alias("__bf_state_word"),
        F.col("bword").alias("__bf_state_bword"),
    )
    pos = F.pmod(F.xxhash64(F.col(big_key)), F.lit(bits))
    probed = (
        big.withColumn("__bf_word", F.expr(f"CAST(pmod(xxhash64(`{big_key}`), {bits}) DIV 64 AS BIGINT)"))
        .withColumn("__bf_bit", (pos % 64).cast("int"))
        .join(
            F.broadcast(bitmap),
            F.col("__bf_word") == F.col("__bf_state_word"),
            "inner",
        )
        .filter(
            F.expr("(shiftrightunsigned(__bf_state_bword, __bf_bit) & CAST(1 AS BIGINT)) = 1")
        )
    )
    return probed.drop("__bf_word", "__bf_bit", "__bf_state_word", "__bf_state_bword")


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) with
# the same portability contract as KMV: buckets come from the 52-bit
# md5 integer (seeded per row of the sketch), so DuckDB reproduces the
# whole d×w counter matrix — and therefore every estimate — bit-for-bit.
#
# Guarantees the tests and the oracle query lean on:
#   est(key) ≥ true(key) always (counters only ever over-count), and
#   est(key) ≤ true(key) + εN with prob 1-δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉.
#
# Scale design: the sketch build is one groupBy over (row, bucket) —
# map-side combine caps every task's output at d×w cells, so the
# shuffle carries O(d·w·tasks) regardless of input rows. Estimating is
# a broadcast join of the d×w cell table against the probe keys.
# ---------------------------------------------------------------------------
CMS_DEPTH_DEFAULT = 3
CMS_WIDTH_DEFAULT = 256


# ---------------------------------------------------------------------------
# Deterministic bottom-k sample — the quantile member of the portable
# sketch family (KMV = distinct counts, CMS = frequencies, Bloom =
# membership, bottom-k = DISTRIBUTIONS). The k rows with the smallest
# md5-hash of their row id form a uniform sample that is:
#   - deterministic and cross-engine reproducible (same md5 contract as
#     KMV — DuckDB picks the IDENTICAL rows),
#   - mergeable (union two samples, re-cut to the k smallest — every
#     hash in the union's true bottom-k is in one operand's bottom-k),
#   - unbiased for any statistic (the hash is independent of values).
# Quantiles estimated from the sample carry the classic bottom-k error
# (±O(1/√k) in rank); the audit query puts the realized error next to
# the exact percentiles.
# Scale design mirrors kmv_minset: a salted two-stage top-k so no hot
# group ever funnels its full row stream through one task's sort.
# ---------------------------------------------------------------------------
BOTTOMK_DEFAULT = 256


def bottomk_sample(
    df: DataFrame,
    id_col: str,
    group_cols: list[str],
    k: int = BOTTOMK_DEFAULT,
    n_salts: int = 16,
) -> DataFrame:
    """Per-group deterministic uniform sample: the ``k`` rows whose
    ``hash01(id_col)`` is smallest. Returns the input columns unchanged
    (sample rows only). ``id_col`` must be unique per row — ties would
    make the cut order engine-dependent."""
    h = hash01(F.col(id_col))
    salt = (F.col("__h") * F.lit(float(1 << HASH_BITS))).cast("long") % n_salts
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy("__h")
    w2 = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        df.withColumn("__h", h)
        .withColumn("__salt", salt)
        .withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__h", "__salt", "__rn1", "__rn")
    )


def _cms_bucket(col: Column, i: int, width: int) -> Column:
    """Portable bucket: 52-bit md5 int of "key:i" mod width. DuckDB
    twin: ``CAST('0x' || substr(md5(CAST(x AS VARCHAR) || ':i'), 1, 13)
    AS BIGINT) % width``. ``F.concat`` propagates NULL exactly like the
    twin's ``||`` (concat_ws would silently skip it and count NULL keys
    under md5 of the bare seed); the builders below additionally filter
    NULL keys out so both engines agree NULLs are unsketchable."""
    h = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(f":{i}"))), 1, 13),
        16,
        10,
    ).cast("long")
    return (h % width).alias("b")


def cms_sketch(
    df: DataFrame,
    key: str,
    depth: int = CMS_DEPTH_DEFAULT,
    width: int = CMS_WIDTH_DEFAULT,
) -> DataFrame:
    """The d×w counter matrix as (i int, b long, c long) rows. NULL
    keys are excluded — the NULL-propagating hash makes them
    unbucketable in both engines."""
    cells = df.filter(F.col(key).isNotNull()).select(
        F.posexplode(
            F.array(*[_cms_bucket(F.col(key), i, width) for i in range(depth)])
        ).alias("i", "b")
    )
    return cells.groupBy("i", "b").agg(F.count("*").alias("c"))


def cms_estimates(
    df: DataFrame,
    key: str,
    probes: DataFrame,
    depth: int = CMS_DEPTH_DEFAULT,
    width: int = CMS_WIDTH_DEFAULT,
) -> DataFrame:
    """CMS count estimate for every row of ``probes`` (a one-column
    DataFrame named ``key``): min over the d rows of the key's cell
    counts. Returns (key, cms_est long); keys absent from ``df`` report
    the collision noise in their cells (still an overestimate of 0)."""
    return cms_estimates_from_cells(
        cms_sketch(df, key, depth, width), key, probes, depth, width
    )


def cms_estimates_from_cells(
    sketch: DataFrame,
    key: str,
    probes: DataFrame,
    depth: int = CMS_DEPTH_DEFAULT,
    width: int = CMS_WIDTH_DEFAULT,
) -> DataFrame:
    """Estimates from an already-built (i, b, c) cell table — the entry
    point for merged sketches (streaming state, pre-aggregated per-day
    sketches): CMS cells merge by plain cell-wise addition, so a
    consumer never needs the rows that built them. NULL probes are
    dropped (same contract as the build side)."""
    probe_cells = probes.filter(F.col(key).isNotNull()).select(
        key,
        F.posexplode(
            F.array(*[_cms_bucket(F.col(key), i, width) for i in range(depth)])
        ).alias("i", "b"),
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["i", "b"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key: str,
    min_count: int,
    depth: int = CMS_DEPTH_DEFAULT,
    width: int = CMS_WIDTH_DEFAULT,
) -> DataFrame:
    """Exact (key, cnt) for every key with true count ≥ min_count,
    found in two passes: CMS candidates first (superset — est ≥ true
    means no qualifying key can be missed), then an exact count over
    candidate rows only. Output is identical to the plain
    ``GROUP BY key HAVING count(*) ≥ min_count`` — the sketch only
    bounds where the second pass spends its shuffle."""
    cands = (
        cms_estimates(df, key, df.select(key).distinct(), depth, width)
        .filter(F.col("cms_est") >= min_count)
        .select(key)
    )
    return (
        df.join(F.broadcast(cands), key, "left_semi")
        .groupBy(key)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
