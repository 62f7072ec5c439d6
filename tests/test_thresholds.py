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
