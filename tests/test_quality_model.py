"""Model-based quality filtering (operators/quality_model.py): the
trained reference-vs-background classifier gate. Laws pinned here:

- separation: with a marker vocabulary in the reference distribution,
  every held-out reference-like doc outranks every background-like doc
  (perfect AUC on a separable synthetic — the classifier learned the
  distribution, not noise);
- threshold gate: filter_by_quality_model keeps exactly the >= docs
  and preserves the input schema;
- scale shape: scoring the corpus never re-fits anything — the plan is
  one map pass over the scored frame (no shuffle introduced by the
  model transform itself);
- determinism: two trainings on identical data produce identical keep
  sets (convex objective, fixed init).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.quality_model import (
    filter_by_quality_model,
    quality_model_scores,
    train_quality_model,
)

# reference style: clean prose markers; background style: boilerplate
_REF = [
    "the committee published a detailed analysis of the results",
    "researchers describe a careful study of the observed data",
    "the report presents evidence supporting the main conclusion",
    "a thorough review explains the methodology and findings",
    "the article discusses the historical context of the debate",
    "careful analysis of the evidence supports this conclusion",
    "the study presents a detailed review of prior findings",
    "researchers explain the methodology behind the published report",
]
_BG = [
    "click here buy now free shipping limited offer",
    "subscribe subscribe subscribe win win win prizes",
    "cheap deals cheap deals best price click click",
    "lorem ipsum dolor sit amet consectetur filler filler",
    "buy cheap prizes now free free free offer offer",
    "click the link win a prize subscribe for deals",
    "limited offer best price buy now click here",
    "free prizes click subscribe win cheap deals now",
]


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def _model(spark):
    return train_quality_model(
        _docs(spark, _REF),
        _docs(spark, _BG, start=100),
        num_features=1 << 12,
    )


def test_separates_reference_from_background(spark):
    model = _model(spark)
    held_ref = _docs(
        spark,
        [
            "the analysis presents detailed evidence and findings",
            "a careful study explains the published methodology",
        ],
        start=200,
    )
    held_bg = _docs(
        spark,
        [
            "click now free offer buy cheap prizes",
            "subscribe win deals click free now",
        ],
        start=300,
    )
    corpus = held_ref.unionByName(held_bg)
    scores = {
        r["doc_id"]: r["quality_prob"]
        for r in quality_model_scores(corpus, model).collect()
    }
    assert len(scores) == 4
    # perfect separation on the held-out separable synthetic
    assert min(scores[200], scores[201]) > max(scores[300], scores[301])


def test_threshold_gate_keeps_exactly_at_or_above(spark):
    model = _model(spark)
    corpus = _docs(spark, _REF + _BG, start=500)
    scores = {
        r["doc_id"]: r["quality_prob"]
        for r in quality_model_scores(corpus, model).collect()
    }
    kept = filter_by_quality_model(corpus, model, threshold=0.5)
    assert kept.columns == corpus.columns
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {d for d, p in scores.items() if p >= 0.5}
    # training members separate at 0.5 on this separable set
    assert kept_ids == set(range(500, 508))


def test_scoring_is_one_map_pass_no_shuffle(spark):
    model = _model(spark)
    corpus = _docs(spark, _REF + _BG)
    plan = (
        quality_model_scores(corpus, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan  # broadcast model, map-only


def test_training_is_deterministic(spark):
    m1, m2 = _model(spark), _model(spark)
    corpus = _docs(spark, _REF + _BG, start=700)
    s1 = sorted(
        (r["doc_id"], round(r["quality_prob"], 9))
        for r in quality_model_scores(corpus, m1).collect()
    )
    s2 = sorted(
        (r["doc_id"], round(r["quality_prob"], 9))
        for r in quality_model_scores(corpus, m2).collect()
    )
    assert s1 == s2


def test_pinned_quality_score_duckdb_parity(spark):
    """The pinned integer serving gate (round 15) must agree with the
    DuckDB qms arithmetic BIT-FOR-BIT on organic text — the audit-row
    contract (warehouse_ops quality_model_score). Exercised over the
    sf0.001 documents table: every per-doc score_ppm identical."""
    import duckdb

    from polygon_daily_market_data_pipeline_spark.functions.text import (
        ENGLISH_STOPWORDS,
    )
    from polygon_daily_market_data_pipeline_spark.operators.quality_model import (
        pinned_quality_score,
    )
    from polygon_daily_market_data_pipeline_spark.plans.llm_ops import NORM
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        r["doc_id"]: (r["score_ppm"], r["keep"])
        for r in pinned_quality_score(docs).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = {
        int(i): (int(s), bool(k))
        for i, s, k in con.sql(
            f"""
            WITH qmt AS (
                SELECT doc_id,
                       len(string_split({NORM}, ' ')) AS n_tok,
                       len(regexp_extract_all(
                           ' ' || replace({NORM}, ' ', '  ') || ' ',
                           ' ({'|'.join(ENGLISH_STOPWORDS)}) ')) AS n_stop,
                       len(regexp_extract_all(
                           ' ' || replace({NORM}, ' ', '  ') || ' ',
                           ' [^ ]*[a-z][^ ]* ')) AS n_alpha
                FROM documents
            )
            SELECT doc_id,
                   -1500000
                   + 500000 * (CASE WHEN n_tok BETWEEN 10 AND 100000
                                    THEN 1 ELSE 0 END)
                   + 2 * ((n_stop * 1000000) // greatest(n_tok, 1))
                   + ((n_alpha * 1000000) // greatest(n_tok, 1))
                   AS score_ppm,
                   score_ppm >= 100000 AS keep
            FROM qmt
            """
        ).fetchall()
    }
    assert got == want
    # the gate discriminates on this corpus (non-vacuous BOTH ways —
    # the target-keep-rate cut, not a vacuous keep-everything gate)
    keeps = [k for _s, k in got.values()]
    assert any(keeps) and not all(keeps)


def test_pinned_quality_score_separates_prose_from_soup(spark):
    """Prose-like docs (stopword-rich, alphabetic, sane length) clear
    the pinned gate (keep); symbol/boilerplate soup falls far below it
    (drop)."""
    from polygon_daily_market_data_pipeline_spark.operators.quality_model import (
        pinned_quality_score,
    )

    prose = [
        "the committee published a detailed analysis of the results "
        "and the report presents evidence supporting the conclusion",
        "a thorough review of the data explains the methodology and "
        "the findings were discussed in the historical context",
    ]
    soup = [
        "9183 4711 0042 $$$ ### 22 77 001 13 99 31 555 21 8 4 77",
        "x1 7z 9q 33 44 55 66 77 88 99 00 11 22 33 44 55",
    ]
    rows = {
        r["doc_id"]: (r["score_ppm"], r["keep"])
        for r in pinned_quality_score(
            _docs(spark, prose + soup, start=900)
        ).collect()
    }
    for i in range(len(prose)):
        assert rows[900 + i][1], rows
    for i in range(len(soup)):
        assert not rows[900 + len(prose) + i][1], rows


def test_pinned_quality_score_plan_is_map_only(spark):
    """Scoring is one codegen'd linear scan — no Exchange, no UDF."""
    from polygon_daily_market_data_pipeline_spark.operators.quality_model import (
        pinned_quality_score,
    )

    plan = (
        pinned_quality_score(_docs(spark, _REF, start=300))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_quality_model_scores_rejects_mismatched_num_features(spark):
    """ADVICE r14: an explicit num_features that differs from the
    trained model's feature space raises a clear ValueError (and 0 is
    no longer silently treated as unset)."""
    import pytest

    model = _model(spark)
    corpus = _docs(spark, _REF, start=500)
    for bad in (0, 1 << 10):
        with pytest.raises(ValueError, match="num_features"):
            quality_model_scores(corpus, model, num_features=bad)
