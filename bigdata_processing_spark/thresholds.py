"""Shared dedup/similarity tuning constants.

Single source of truth consumed by BOTH sides of every twin: the Spark
query builders (queries/dedup.py, queries/similarity.py) interpolate
these into DataFrame expressions, and the DuckDB oracle SQL strings
interpolate the SAME names into their text at import time — so a
threshold change cannot drift one engine away from the other.

They are also the DEFAULTS, not hardwired behavior: every dedup /
near-dup operator takes them as keyword arguments (e.g.
``minhash_lsh_dup_pairs(spark, sf_dir, jaccard_threshold=0.9)``), so a
reuser tunes per-call while the registered driver-facing queries pin
the defaults their oracles were generated from.
"""

from __future__ import annotations

# MinHash / LSH geometry
N_HASHES = 8          # minhash signature length
N_BANDS = 4           # LSH bands (rows per band = N_HASHES // N_BANDS)

# Verification thresholds
JACCARD_THRESHOLD = 0.8        # bigram-set Jaccard for near-dup pairs
CONTAINMENT_THRESHOLD = 0.9    # |A∩B| / min(|A|,|B|) for subset dups
EDIT_SIM_THRESHOLD = 0.8       # 1 - levenshtein/maxlen for short-record dups
COSINE_NEARDUP_THRESHOLD = 0.4  # embedding cosine for semantic near-dups
# SemDeDup ε sweep grid (semantic_dedup_sweep): the measured basis for
# COSINE_NEARDUP_THRESHOLD, mirroring lsh_band_sweep's role for N_BANDS
SEMDEDUP_SWEEP_EPS = (0.3, 0.4, 0.5, 0.6)

# Celled hard-negative mining: cells probed per anchor. Hard negatives
# are near the DECISION BOUNDARY, not the anchor's cell core, so
# n_probe=1 recalls almost nothing (measured 0.067@sf0.1); 8 of ~51
# cells (≈16% scan) recovers 0.45 under the round-6 trained quantizer
# (0.30 with round-5 seeded cells at the same scan fraction), and
# hard_negative_probe_sweep records the whole curve so the trade is a
# measured choice.
HARD_NEG_N_PROBE = 8
HARD_NEG_PROBE_SWEEP = (1, 2, 4, 8, 12)

# Corpus-scale candidate-generation guards.
#
# The DF prune targets BOILERPLATE — shingles so common they carry no
# near-dup signal — and "common" is relative to corpus size: a shingle
# in 300 of 5,000 docs is boilerplate, one in 300 of 10M docs is a
# near-dup fingerprint. An absolute cap therefore prunes EVERYTHING
# once the corpus grows (measured: 10x sf0.1 -> 0 candidates at df<=40),
# so the effective cap is ``max(MAX_DF, ceil(MAX_DF_FRAC * n_docs))``:
# MAX_DF is the small-corpus floor (keeps tiny fixtures deterministic),
# the fraction is what holds at scale. Both engines compute n_docs from
# the same table, so the twins stay bit-identical.
MAX_DF = 40           # floor: shingles in more docs than this are pruned
MAX_DF_FRAC = 0.08    # scale term: prune shingles in > 8% of the corpus
# The bucket cap is deliberately ABSOLUTE: a B-doc LSH bucket costs B²
# candidate pairs regardless of corpus size. Over-cap buckets are not
# dropped, though — that would silently keep large NON-identical
# near-dup families (mutated boilerplate templates; exact dedup only
# catches the identical subsets). Instead each over-cap bucket keeps
# ceil(B/MAX_BUCKET) hash-ordered representatives and pairs members
# against representatives only: O(B·B/MAX_BUCKET) work, and the
# representative stars still connect the family into one CC cluster
# (queries/dedup._scored_candidates / _SQL_CAND_GUARDED).
MAX_BUCKET = 25       # LSH buckets above this switch to representative pairs
# Representative-count ceiling for over-cap buckets: ceil(B/MAX_BUCKET)
# reps alone is QUADRATIC in B (B·B/25 pairs — measured OOM: a hot
# 16-bit simhash band value held ~1e5 of the 100× corpus's docs, and
# 4,000 reps × 1e5 members exploded the executor). Capping reps bounds
# per-bucket work LINEARLY (≤ 64·B pairs) while keeping the fixture and
# oracle outputs bit-identical everywhere ceil(B/25) ≤ 64 (every
# oracle-checked scale: the biggest fixture buckets are a few hundred
# members). CC family recovery needs only ≥1 rep; 64 keeps the
# mutated-clone verify redundancy the r6 recall proof measured.
MAX_BUCKET_REPS = 64

# Two-stage verification: before the exact-Jaccard join, candidate
# pairs are prefiltered on the SIGNATURE-estimated jaccard (fraction of
# agreeing minhash components — already computed by the LSH stage, so
# the prefilter is a narrow signature join, not a shingle-set join).
# The 100× scale proof showed exact verification of every candidate is
# THE dedup cost center (36.6M exact set intersections, 82 GB spill);
# most candidates share one lucky band and die at verification. The
# margin is deliberately ≫ the measured estimator MAE (≤0.1 in the
# ≥0.6-jaccard bands, minhash_estimate_audit): keep pairs with
# est ≥ JACCARD_THRESHOLD − 0.3, i.e. ≥ 4 of 8 components agreeing.
# P[Bin(8, 0.8) ≤ 3] ≈ 1% unconditionally, and LSH candidacy already
# conditions on ≥ 2 agreeing components, so boundary-pair misses are
# rare by construction and MEASURED zero on the fixtures (sf0.01: 470
# candidates → 36 pass, 25 true pairs, 0 missed; sf0.1: 40,538 → 2,099
# pass, 256 true, 0 missed — a ~20× cut in exact-verify volume;
# minhash_prefilter_audit records this per corpus). Guards bound
# candidate GENERATION; the prefilter bounds candidate VERIFICATION —
# surfaced pairs are still scored on full shingle sets, and the twins
# mirror the integer agree bound verbatim.
MINHASH_EST_MARGIN = 0.3


def est_agree_min(threshold: float) -> int:
    """Integer prefilter bound for jaccard ``threshold``: candidates
    reaching exact verification must have at least this many agreeing
    minhash components (estimate ≥ threshold − MINHASH_EST_MARGIN).
    Integer form so both engines decide the boundary identically."""
    import math

    return max(0, math.ceil(round((threshold - MINHASH_EST_MARGIN) * N_HASHES, 9)))


EST_AGREE_MIN = est_agree_min(JACCARD_THRESHOLD)  # = 4 at 8 hashes

# Perceptual image near-dup (dHash over decoded pixels, 64 bits packed
# as 4×16-bit bands that double as the Hamming-LSH keys). Pigeonhole:
# ≤ IMAGE_HAMMING_MAX flipped bits leave ≥ 1 of 4 bands intact, so
# candidate recall at the default is exactly 1.0 — raise the band count
# before raising the threshold past n_bands − 1. The fixture plants a
# re-encoded copy of every image with all pixel bytes + SHIFT mod 256;
# dHash compares adjacent luma values, so copies differ only at wrap
# positions — a small content-dependent distance, the near-miss class
# the operator exists for.
IMAGE_HAMMING_MAX = 3
IMAGE_VARIANT_SHIFT = 8

# Audit sampling
AUDIT_SAMPLE_DOCS = 200  # all-pairs ground truth is quadratic: sample-bounded

# Winnowing (passage-level fingerprinting, Schleimer et al. SIGMOD'03)
WIN_K = 3            # token-gram size
WIN_W = 4            # winnowing window (in grams)
# guarantee: any shared token run of length >= WIN_W + WIN_K - 1 (= 6
# tokens) shares at least one selected fingerprint
WIN_MIN_SHARED = 2   # doc pairs reported at >= this many shared fingerprints
# Deliberately ABSOLUTE (unlike the signature DF prune): a fingerprint's
# df IS its pair-expansion bucket size (df² pairs), so this is the
# MAX_BUCKET analogue — a pair-work bound, not a signability filter.
# Pruning an fp only drops that fp's pair contributions (docs stay
# discoverable via their other fingerprints); fps shared by larger
# clone families fall to exact dedup, the same division of labor the
# LSH bucket cap encodes.
WIN_MAX_DF = MAX_DF  # fingerprints in more docs than this are skipped


def edit_len_gap_mult(threshold: float) -> int:
    """Integer length-gap prune factor for edit similarity ``threshold``:
    ``dist >= |Δlen|`` exactly, so ``sim >= θ`` forces
    ``|Δlen| <= (1-θ)·maxlen``, i.e. ``mult·|Δlen| <= maxlen`` with
    ``mult = 1/(1-θ)``. Floored so the prune stays CONSERVATIVE (never
    drops a qualifying pair) for thresholds where 1/(1-θ) is fractional;
    the default θ=0.8 gives exactly 5. Integer form so both engines
    decide the boundary identically (float 1-θ rounds differently
    across engines at exactly |Δlen| = (1-θ)·maxlen)."""
    return max(1, int(1.0 / (1.0 - threshold)))


EDIT_LEN_GAP_MULT = edit_len_gap_mult(EDIT_SIM_THRESHOLD)
