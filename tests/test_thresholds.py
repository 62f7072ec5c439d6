"""Dedup/similarity thresholds: shared-constants module + per-call
operator parameters (VERDICT r03 item 2)."""

from __future__ import annotations

from conftest import SF_SMALL

from bigdata_processing_spark import thresholds as TH
from bigdata_processing_spark.queries.dedup import (
    clear_dedup_memos,
    containment_dup_pairs,
    minhash_lsh_dup_pairs,
)


def test_edit_len_gap_mult_conservative():
    assert TH.edit_len_gap_mult(0.8) == 5
    assert TH.edit_len_gap_mult(0.9) == 10
    # fractional 1/(1-θ) floors (conservative: never over-prunes)
    assert TH.edit_len_gap_mult(0.7) == 3
    assert TH.EDIT_LEN_GAP_MULT == TH.edit_len_gap_mult(TH.EDIT_SIM_THRESHOLD)


def test_oracles_interpolate_same_constants():
    from bigdata_processing_spark.queries import all_oracles

    o = all_oracles()
    assert f">= {TH.JACCARD_THRESHOLD}" in o["minhash_lsh_dup_pairs"]
    assert f">= {TH.CONTAINMENT_THRESHOLD}" in o["containment_dup_pairs"]
    assert f">= {TH.COSINE_NEARDUP_THRESHOLD}" in o["embedding_neardup_pairs"]
    assert f">= {TH.EDIT_SIM_THRESHOLD}" in o["edit_distance_dup_pairs"]


def test_jaccard_threshold_is_a_parameter(spark):
    clear_dedup_memos()
    default = minhash_lsh_dup_pairs(spark, SF_SMALL).count()
    strict = minhash_lsh_dup_pairs(spark, SF_SMALL, jaccard_threshold=0.999).count()
    loose = minhash_lsh_dup_pairs(spark, SF_SMALL, jaccard_threshold=0.0).count()
    assert strict <= default <= loose
    assert loose > default  # sub-threshold candidates exist in the fixture


def test_containment_threshold_is_a_parameter(spark):
    default = containment_dup_pairs(spark, SF_SMALL).count()
    all_cand = containment_dup_pairs(spark, SF_SMALL, containment_threshold=0.0).count()
    assert default <= all_cand
    clear_dedup_memos()


def test_est_agree_min_integer_boundary():
    # default geometry: est >= 0.8 - 0.3 = 0.5 -> 4 of 8 components
    assert TH.est_agree_min(TH.JACCARD_THRESHOLD) == 4
    assert TH.EST_AGREE_MIN == 4
    # threshold at/below the margin disables the prefilter entirely
    assert TH.est_agree_min(0.0) == 0
    assert TH.est_agree_min(TH.MINHASH_EST_MARGIN) == 0
    # float-boundary safety: (0.85-0.3)*8 = 4.4000000000000004 -> 5,
    # (0.675-0.3)*8 = 2.9999999999999996 must round to exactly 3, not 4
    assert TH.est_agree_min(0.85) == 5
    assert TH.est_agree_min(0.675) == 3


def test_prefilter_drops_no_true_pair_on_fixtures(spark):
    """The two-stage verify's safety contract: on the fixtures, the
    signature-estimate prefilter must drop ZERO pairs the exact verifier
    would keep — the guarded family's output is identical to a
    prefilter-free run (and the registered audit row agrees)."""
    from conftest import SF_ORACLE

    from bigdata_processing_spark.queries.dedup import (
        _scored_candidates,
        minhash_prefilter_audit,
    )

    for sf in (SF_SMALL, SF_ORACLE):
        clear_dedup_memos()
        pref = {
            (r.d1, r.d2)
            for r in minhash_lsh_dup_pairs(spark, sf).select("d1", "d2").collect()
        }
        # prefilter-free leg over the same guarded candidates
        sc = _scored_candidates(spark, sf)
        from pyspark.sql import functions as F

        jac = F.col("inter").cast("double") / (
            F.col("n1") + F.col("n2") - F.col("inter")
        )
        nofilter = {
            (r.d1, r.d2)
            for r in sc.filter(jac >= TH.JACCARD_THRESHOLD)
            .select("d1", "d2").collect()
        }
        assert pref == nofilter and len(pref) > 0
        audit = minhash_prefilter_audit(spark, sf).collect()[0]
        assert audit.n_missed == 0
        assert audit.n_true_pairs == len(pref)
        # the whole point: the prefilter must actually cut verify volume
        assert audit.n_pass < audit.n_candidates
        clear_dedup_memos()
