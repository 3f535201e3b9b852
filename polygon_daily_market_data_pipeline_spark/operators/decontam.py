"""Benchmark decontamination — remove training documents that leak
evaluation content.

A training corpus must not contain the benchmarks it will be evaluated
on; the standard guard (GPT-3 appendix C / PaLM / Llama papers) is
n-gram overlap: a training document is CONTAMINATED when it shares at
least one n-word gram (n≈8-13; default 8) with any document in the
eval set. This module is the Spark-first form of that filter.

Scale shape (the reason this works at 100 TB): eval benchmarks are
MB-to-low-GB scale while the corpus is the 100 TB side, so the eval
side reduces to its DISTINCT n-gram set and BROADCASTS. The corpus
side is a map-side explode of each doc's n-grams followed by a
broadcast hash semi-join — only MATCHING grams survive to the per-doc
hit count, so the only shuffle in the plan is hit-sized (contaminated
docs are the rare case), never corpus-sized. No driver collect
anywhere.

Grams are matched as exact normalized strings, which keeps the DuckDB
oracle exact (``corpus_clean_en`` folds this filter into its audited
pipeline). When the broadcast budget matters more than provable
exactness, hash both sides to ``xxhash64(gram)`` longs first — ~8
bytes/gram instead of ~50 — at a ~1e-19 per-pair false-drop risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.functions.text import (
    word_ngrams_all,
)

DEFAULT_NGRAM = 8


def eval_ngram_set(
    eval_docs: DataFrame, text_col: str = "text", n: int = DEFAULT_NGRAM
) -> DataFrame:
    """The distinct n-gram set of the eval/benchmark texts — one
    ``gram`` string column, the broadcast side of the filter. Documents
    shorter than ``n`` tokens contribute nothing."""
    return (
        eval_docs.select(
            F.explode(word_ngrams_all(text_col, n)).alias("gram")
        )
        .distinct()
    )


def contamination_hits(
    docs: DataFrame,
    eval_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """(id, contam_hits) for every training doc sharing ≥1 n-gram with
    the eval set — docs with zero hits are absent (use a left join or
    ``decontaminate`` below). ``contam_hits`` counts matching gram
    OCCURRENCES (a doc repeating a leaked gram counts each repeat),
    which is the severity signal audits want."""
    ex = docs.select(
        F.col(id_col),
        F.explode(word_ngrams_all(text_col, n)).alias("gram"),
    )
    return (
        ex.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("contam_hits"))
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """``docs`` minus every contaminated document (≥1 shared n-gram
    with ``eval_docs``) — the drop-side convenience wrapper; the plan
    is explode → broadcast semi-join → left-anti, no corpus-sized
    shuffle."""
    hits = contamination_hits(
        docs, eval_ngram_set(eval_docs, text_col, n), id_col, text_col, n
    )
    return docs.join(hits.select(id_col), id_col, "left_anti")
