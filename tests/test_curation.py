"""Mechanism tests for the curation operators on crafted inputs — the
oracle suite (test_oracle.py) proves engine parity on the fixture
corpus; these prove the operators *discriminate* the way the curation
stage needs them to.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aind_protein_data_transformation_spark.queries.curation import (
    DECON_MIN_SHARED,
    EVAL_MOD,
    PII_DIGIT_RUN,
    PII_EMAIL,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_flags_repetitive_doc(spark, sf_dir, monkeypatch):
    from aind_protein_data_transformation_spark.queries import curation

    crafted = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "one two three four five six seven eight nine ten"),
        ],
    )
    monkeypatch.setattr(
        curation, "load_table", lambda _s, _d, _t: crafted
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in curation.text_repetition_stats(spark, sf_dir).collect()
    }
    assert out[1]["flagged"] and out[1]["top_token_frac"] == 1.0
    assert out[1]["dup_2gram_frac"] > 0.8
    assert not out[2]["flagged"] and out[2]["dup_2gram_frac"] == 0.0


def test_pii_patterns_and_redaction(spark):
    df = spark.createDataFrame(
        [
            ("write to bob@example.com now",),
            ("card 4111111122223333 leaked",),
            ("clean text with no identifiers",),
        ],
        "payload string",
    )
    got = df.select(
        F.regexp_count("payload", F.lit(PII_DIGIT_RUN)).alias("d"),
        F.regexp_count("payload", F.lit(PII_EMAIL)).alias("e"),
        F.regexp_replace(
            F.regexp_replace("payload", PII_DIGIT_RUN, "<NUM>"), PII_EMAIL, "<EMAIL>"
        ).alias("red"),
    ).collect()
    assert [r["e"] for r in got] == [1, 0, 0]
    assert [r["d"] for r in got] == [0, 1, 0]
    assert got[0]["red"] == "write to <EMAIL> now"
    assert got[1]["red"] == "card <NUM> leaked"
    assert got[2]["red"] == "clean text with no identifiers"


def test_pii_scan_collapses_structured_names(spark, sf_dir):
    from aind_protein_data_transformation_spark.queries import REGISTRY

    rows = {
        r["record_type"]: r.asDict()
        for r in REGISTRY["pii_redact_scan"].fn(spark, sf_dir).collect()
    }
    cust = rows["customer_name"]
    # Every Customer#NNNNNNNNN name carries a digit run and redacts to
    # the single form Customer#<NUM> — the k-anonymity collapse.
    assert cust["n_flagged"] == cust["n_records"]
    assert cust["n_distinct_raw"] == cust["n_records"]
    assert cust["n_distinct_redacted"] == 1
    # Word-soup documents carry no identifier-shaped spans.
    assert rows["document_text"]["n_flagged"] == 0


def test_decontamination_finds_planted_copy(spark, sf_dir, monkeypatch):
    from aind_protein_data_transformation_spark.queries import curation

    eval_id = EVAL_MOD  # doc_id % EVAL_MOD == 0 -> eval set
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    crafted = _docs(
        spark,
        [
            (eval_id, text),
            (1, text),  # verbatim contamination
            (2, "totally different words that share no trigrams at all x y"),
        ],
    )
    monkeypatch.setattr(curation, "load_table", lambda _s, _d, _t: crafted)
    out = curation.decontaminate_ngram_overlap(spark, sf_dir).collect()
    assert [r["doc_id"] for r in out] == [1]
    hit = out[0]
    assert hit["eval_id"] == eval_id
    assert hit["shared"] >= DECON_MIN_SHARED
    assert hit["containment"] == 1.0
