"""Sequence packing (training-data pipeline op).

LLM pre-training consumes fixed-length token sequences, not documents:
the corpus is tokenized, concatenated in a deterministic document
order, and chunked into windows of ``SEQ_LEN`` tokens, documents
straddling window boundaries. The queryable artifact is the packing
manifest — per sequence: how many documents contribute, how many
tokens, the first/last document — which is what a loader needs to seek
into the corpus and what a curation pass audits (tokens-per-sequence
fill, boundary-straddle rate).

Scale shape: the only global-order computation is the running token
offset, done by the two-phase distributed prefix sum
(operators/prefix.py) — NO unpartitioned window ever sees data rows
(plan-asserted in tests/test_scale.py). The window→sequence expansion
is an ``explode(sequence(...))`` whose fan-out is 1 + straddles per
document, and the final aggregation is an ordinary hash agg on seq_id.

Reference scope: the reference pipeline has no tokenization stage; this
extends the engine for LLM-corpus work per SURVEY.md §2's
training-pipeline addendum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.prefix import partitioned_prefix_sum
from .registry import query

#: Tokens per packed sequence. Small relative to real SEQ_LENs (2k-8k)
#: is unnecessary at test scale — the shapes are length-independent.
SEQ_LEN = 2048


@query(
    "pack_sequences_fixed",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '')) AS tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, tok,
               SUM(tok) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_end
        FROM t
    ),
    e AS (
        SELECT doc_id, tok, cum_end, cum_end - tok AS cum_start,
               unnest(generate_series(
                   CAST(FLOOR((cum_end - tok) / {SEQ_LEN}) AS BIGINT),
                   CAST(FLOOR((cum_end - 1) / {SEQ_LEN}) AS BIGINT)
               )) AS seq_id
        FROM c WHERE tok > 0
    )
    SELECT seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEAST(cum_end, (seq_id + 1) * {SEQ_LEN})
                    - GREATEST(cum_start, seq_id * {SEQ_LEN})) AS BIGINT)
               AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM e
    GROUP BY seq_id
    ORDER BY seq_id
    """,
)
def pack_sequences_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length sequence-packing manifest over the documents corpus
    (whitespace token counts; doc_id order). The running token offset
    is the distributed prefix sum — the oracle computes the identical
    values with a single-threaded global window."""
    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "size(filter(split(text, '\\\\s+'), x -> x != '')) AS tok",
    )
    cum = partitioned_prefix_sum(docs, "doc_id", "tok", "cum_end")
    spans = cum.where("tok > 0").selectExpr(
        "doc_id",
        "cum_end",
        "cum_end - tok AS cum_start",
        f"explode(sequence(CAST(FLOOR((cum_end - tok) / {SEQ_LEN}) AS BIGINT),"
        f" CAST(FLOOR((cum_end - 1) / {SEQ_LEN}) AS BIGINT))) AS seq_id",
    )
    return (
        spans.groupBy("seq_id")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT) AS n_docs"),
            F.expr(
                f"CAST(SUM(LEAST(cum_end, (seq_id + 1) * {SEQ_LEN})"
                f" - GREATEST(cum_start, seq_id * {SEQ_LEN})) AS BIGINT)"
                " AS n_tokens"
            ),
            F.expr("CAST(MIN(doc_id) AS BIGINT) AS first_doc"),
            F.expr("CAST(MAX(doc_id) AS BIGINT) AS last_doc"),
        )
        .orderBy("seq_id")
    )
