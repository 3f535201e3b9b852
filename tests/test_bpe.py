"""Distributed BPE training (operators/bpe.py): the canonical
Sennrich corpus hand-check, bit-for-bit equality with an independent
pure-Python reference implementation on real corpus text, determinism
under repartitioning, the greedy-fold edge cases, and encode/train
consistency. No SQL oracle by design — iterative argmax is the
non-SQL-expressible class — so the reference-equality law is the
correctness anchor."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.bpe import (
    END,
    _merge_fold,
    bpe_encode_text,
    bpe_segment,
    train_bpe,
    word_frequency_table,
)
from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _ref_bpe(word_counts, n_merges, min_pair_count=2):
    """From-scratch reference BPE (Sennrich et al. 2016 pseudocode),
    same deterministic tie-break: count DESC, left ASC, right ASC."""
    vocab = {}
    for w, n in word_counts.items():
        key = tuple(list(w) + [END])
        vocab[key] = vocab.get(key, 0) + n
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + n
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < min_pair_count:
            break
        merges.append((a, b))
        nv = {}
        for syms, n in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv
    return merges


def test_canonical_corpus_hand_check(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                      + ["widest"] * 3))],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, 6)
    # the textbook trace: es, est, est</w> first (newest+widest mass)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", END)]
    seg = docs.select(bpe_segment(F.lit("lowest"), merges).alias("t")).first()["t"]
    assert seg == ["low", "est" + END]


def test_equals_reference_implementation_on_corpus_text(spark):
    docs = load_table(spark, SF, "documents").where(
        F.col("doc_id") % 9 == 1
    ).select("doc_id", "text")
    wc = {
        r["w"]: r["n"]
        for r in word_frequency_table(docs).collect()
    }
    want = _ref_bpe(wc, 12)
    got = train_bpe(docs, 12)
    assert got == want
    assert len(got) == 12  # real text: 12 merges all reach min count


def test_deterministic_under_repartitioning(spark):
    docs = load_table(spark, SF, "documents").where(
        F.col("doc_id") % 9 == 2
    ).select("doc_id", "text")
    m1 = train_bpe(docs, 8)
    m2 = train_bpe(docs.repartition(13), 8)
    assert m1 == m2 and len(m1) == 8


def test_merge_fold_greedy_nonoverlapping(spark):
    df = spark.createDataFrame([(1,)], "i long")
    def fold(arr, a, b):
        return df.select(
            _merge_fold(F.expr(f"array{tuple(arr)}"), a, b).alias("r")
        ).first()["r"]
    # overlapping same-symbol runs merge left-to-right, non-overlapping
    assert fold(("a", "a", "a"), "a", "a") == ["aa", "a"]
    assert fold(("a", "a", "a", "a"), "a", "a") == ["aa", "aa"]
    # a merge output never re-merges as a left element in the same pass
    assert fold(("x", "y", "y"), "x", "y") == ["xy", "y"]
    # distinct pair, multiple sites
    assert fold(("l", "o", "w", "l", "o"), "l", "o") == ["lo", "w", "lo"]


def test_min_pair_count_stops_early(spark):
    docs = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )
    # every pair occurs once: nothing reaches min_pair_count=2
    assert train_bpe(docs, 5) == []
    # lowering the floor lets it memorize
    assert len(train_bpe(docs, 2, min_pair_count=1)) == 2


def test_encode_counts_consistent_with_segments(spark):
    docs = load_table(spark, SF, "documents").where(
        F.col("doc_id") % 9 == 3
    ).select("doc_id", "text")
    merges = train_bpe(docs, 10)
    enc = bpe_encode_text(docs, merges)
    enc0 = bpe_encode_text(docs, [])
    rows = {r["doc_id"]: r for r in enc.collect()}
    rows0 = {r["doc_id"]: r for r in enc0.collect()}
    assert rows.keys() == rows0.keys()
    for k in rows:
        # zero merges: every word is chars+1 symbols; merges only shrink
        assert rows0[k]["n_bpe_tokens"] > rows[k]["n_bpe_tokens"]
        assert rows[k]["n_bpe_tokens"] >= rows[k]["n_words"]
        assert rows[k]["n_words"] == rows0[k]["n_words"]
    # spot-check one doc against a direct per-word segmentation
    kid = min(rows)
    words = (
        docs.where(F.col("doc_id") == kid)
        .select(F.explode(F.split(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
        )).alias("w"))
        .where(F.col("w") != "")
        .select(F.size(bpe_segment("w", merges)).alias("k"))
        .agg(F.sum("k")).first()[0]
    )
    assert words == rows[kid]["n_bpe_tokens"]


def test_arrow_encoder_equals_expression_path(spark):
    """The production (Arrow-batched) encoder performs the same
    sequential merge replay as the JVM expression path — identical
    counts on real corpus text, whatever the batch boundaries."""
    from polygon_daily_market_data_pipeline_spark.operators.bpe import (
        bpe_encode_text_arrow,
    )

    docs = load_table(spark, SF, "documents").where(
        F.col("doc_id") % 9 == 4
    ).select("doc_id", "text")
    merges = train_bpe(docs, 10)
    want = sorted(map(tuple, bpe_encode_text(docs, merges).collect()))
    got = sorted(
        map(tuple, bpe_encode_text_arrow(docs.repartition(7), merges).collect())
    )
    assert got == want
