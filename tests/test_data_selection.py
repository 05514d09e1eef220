"""DSIR importance-resampling selection + CCNet-style LM perplexity
buckets, pinned on constructed corpora (the test_hygiene.py discipline:
hand-computed expectations where deterministic, full-row cross-check
against the REGISTERED oracle SQL running live in DuckDB)."""

from __future__ import annotations

import duckdb
import pandas as pd

import scrapy_spark.entry_queries as eq
from scrapy_spark.entry_queries import _CLS_M, _DSIR_B, QUERIES


def _with_docs(spark, pdf, name, sf="unused"):
    df = spark.createDataFrame(pdf)
    orig = eq.load
    try:
        eq.load = lambda sp, d, t: df if t == "documents" else orig(sp, d, t)
        return QUERIES[name][0](spark, sf).collect()
    finally:
        eq.load = orig


def _bucket(tok: str) -> int:
    """Python twin of the rolling polynomial token hash -> feature bucket."""
    h = 0
    for ch in tok:
        h = (h * 257 + ord(ch)) % _CLS_M
    return h % _DSIR_B


def _oracle(pdf: pd.DataFrame, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", pdf)
    return con.execute(QUERIES[name][1]).fetchdf()


def _frames_equal(rows, want: pd.DataFrame):
    got = pd.DataFrame([r.asDict() for r in rows])
    got = got[sorted(got.columns)].sort_values("doc_id").reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values("doc_id").reset_index(drop=True)
    assert got.astype(str).equals(want.astype(str)), (
        f"\ngot:\n{got}\nwant:\n{want}"
    )


def _frames_equal_on(got: pd.DataFrame, want: pd.DataFrame, key: str):
    got = got[sorted(got.columns)].sort_values(key).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(key).reset_index(drop=True)
    assert got.astype(str).equals(want.astype(str)), (
        f"\ngot:\n{got}\nwant:\n{want}"
    )


def test_dsir_selection_direction(spark):
    # en docs speak one vocabulary, de docs another; the en-vocab features
    # are then strictly more target-typical than corpus average, the
    # de-vocab ones strictly less -> selection splits by vocabulary.
    en_toks, de_toks = ["alpha", "beta", "gamma"], ["delta", "epsilon", "zeta"]
    buckets = {_bucket(t) for t in en_toks + de_toks}
    assert len(buckets) == 6  # hash sends the 6 tokens to distinct buckets
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "text": [" ".join(en_toks)] * 4 + [" ".join(de_toks)] * 2 + [""],
            "lang": ["en"] * 4 + ["de"] * 2 + ["en"],
        }
    )
    out = {r["doc_id"]: r for r in _with_docs(spark, pdf, "dsir_select")}
    assert len(out) == 7  # all-docs grain, empty doc included
    for did in (1, 2, 3, 4):
        assert out[did]["dsir_selected"] is True
        assert out[did]["dsir_score"] > 0
        assert out[did]["dsir_feats"] == 3
    for did in (5, 6):
        assert out[did]["dsir_selected"] is False
        assert out[did]["dsir_score"] < 0
    # zero-token doc: no evidence -> never selected, zero score
    assert out[7]["dsir_feats"] == 0 and out[7]["dsir_score"] == 0
    assert out[7]["dsir_selected"] is False
    _frames_equal(out.values(), _oracle(pdf, "dsir_select"))


def test_lm_perplexity_buckets_constructed(spark):
    # Unigram counts: x=10, y=2, u/v/w/z=1 -> N=16. Whole-bit costs:
    # bits(x)=floor(log2(16 div 10))=0, bits(y)=log2(8)=3, bits(u..z)=4.
    # Doc averages x100: d1=d2=0, d3=(0+0+3+3)*100 div 4=150,
    # d4=16*100 div 4=400; n=4 docs -> discrete p33 rank 2 (t1=0),
    # p67 rank 3 (t2=150): d1,d2 head; d3 middle; d4 tail; empty doc tail.
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["x x x x", "x x x x", "x x y y", "u v w z", ""],
        }
    )
    out = {
        r["doc_id"]: r for r in _with_docs(spark, pdf, "lm_perplexity_buckets")
    }
    assert len(out) == 5
    assert (out[1]["ppl_bits"], out[1]["ppl_avg_x100"]) == (0, 0)
    assert out[1]["ppl_bucket"] == "head" and out[2]["ppl_bucket"] == "head"
    assert (out[3]["ppl_bits"], out[3]["ppl_avg_x100"]) == (6, 150)
    assert out[3]["ppl_bucket"] == "middle"
    assert (out[4]["ppl_bits"], out[4]["ppl_avg_x100"]) == (16, 400)
    assert out[4]["ppl_bucket"] == "tail"
    assert (out[5]["ppl_tokens"], out[5]["ppl_avg_x100"]) == (0, -1)
    assert out[5]["ppl_bucket"] == "tail"
    _frames_equal(out.values(), _oracle(pdf, "lm_perplexity_buckets"))


def test_lm_perplexity_uniform_corpus_single_value(spark):
    # Degenerate but legal: every doc identical -> one histogram row, both
    # terciles land on the same value, everything is 'head' (<= t1 first).
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a a", "a a", "a a"]})
    out = _with_docs(spark, pdf, "lm_perplexity_buckets")
    assert {r["ppl_bucket"] for r in out} == {"head"}
    _frames_equal(out, _oracle(pdf, "lm_perplexity_buckets"))


def test_bpe_classic_low_lower_lowest(spark):
    # Sennrich et al.'s canonical example. Hand-derived greedy merges with
    # the (count desc, pair asc) tie-break; the corpus runs out of pairs
    # after 6 merges -> ranks 7..8 produce no rows.
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["low low low lower lowest", ""]}
    )
    rows = sorted(
        (r.asDict() for r in _with_docs(spark, pdf, "bpe_train_merges")),
        key=lambda r: r["rank"],
    )
    want = [
        (1, "l", "o", 5), (2, "lo", "w", 5), (3, "low", "e", 2),
        (4, "lowe", "r", 1), (5, "lowe", "s", 1), (6, "lowes", "t", 1),
    ]
    assert [
        (r["rank"], r["left_sym"], r["right_sym"], r["cnt"]) for r in rows
    ] == want
    got = pd.DataFrame(rows)
    _frames_equal_on(got, _oracle(pdf, "bpe_train_merges"), key="rank")

    # post-merge token counts: every word collapsed to ONE symbol except
    # none (all three words end fully merged): 3 + 1 + 1 = 5
    tc = {r["doc_id"]: r["n_bpe_merged"]
          for r in _with_docs(spark, pdf, "bpe_token_count")}
    assert tc == {1: 5, 2: 0}
    want_tc = _oracle(pdf, "bpe_token_count")
    assert {int(r["doc_id"]): int(r["n_bpe_merged"])
            for _, r in want_tc.iterrows()} == tc


def test_bpe_adjacent_occurrences_both_merge(spark):
    # THE double-framing regression case: 'aaaa' holds two adjacent (a,a)
    # occurrences — canonical BPE merges BOTH in one pass -> [aa, aa], then
    # learns (aa, aa). With single separator framing the replace consumed
    # the shared middle separator and produced [aa, a, a], re-learning
    # (a, a) at rank 2 — a malformed merge table with duplicate pairs.
    pdf = pd.DataFrame({"doc_id": [1], "text": ["aaaa"]})
    rows = sorted(
        (r.asDict() for r in _with_docs(spark, pdf, "bpe_train_merges")),
        key=lambda r: r["rank"],
    )
    assert [
        (r["rank"], r["left_sym"], r["right_sym"], r["cnt"]) for r in rows
    ] == [(1, "a", "a", 3), (2, "aa", "aa", 1)]
    pairs = [(r["left_sym"], r["right_sym"]) for r in rows]
    assert len(pairs) == len(set(pairs))  # no pair ever re-learned
    got = pd.DataFrame(rows)
    _frames_equal_on(got, _oracle(pdf, "bpe_train_merges"), key="rank")
    tc = _with_docs(spark, pdf, "bpe_token_count")
    assert tc[0]["n_bpe_merged"] == 1  # fully merged to one symbol


def test_bpe_greedy_nonoverlap_replace_semantics(spark):
    # 'aaa': pair (a,a) appears twice per word but merges LEFTMOST
    # NON-OVERLAPPING (aa + a), the BPE greedy rule — pins that Spark's
    # replace, DuckDB's replace and the hand computation all agree.
    pdf = pd.DataFrame({"doc_id": [1], "text": ["aaa aaa"]})
    rows = sorted(
        (r.asDict() for r in _with_docs(spark, pdf, "bpe_train_merges")),
        key=lambda r: r["rank"],
    )
    assert [
        (r["rank"], r["left_sym"], r["right_sym"], r["cnt"]) for r in rows
    ] == [(1, "a", "a", 4), (2, "aa", "a", 2)]
    got = pd.DataFrame(rows)
    _frames_equal_on(got, _oracle(pdf, "bpe_train_merges"), key="rank")
    tc = _with_docs(spark, pdf, "bpe_token_count")
    assert tc[0]["n_bpe_merged"] == 2  # two words x one 'aaa' symbol each


def test_nb_langid_learns_vocabulary_split(spark):
    # Vocabulary-split corpus: en docs speak {alpha,beta}, de docs speak
    # {delta,zeta}. One doc is LABELED de but written in en vocabulary —
    # the trained model must predict from CONTENT (off-diagonal cell), and
    # the zero-token doc falls back to the prior argmin (de: 4/7 docs).
    # Hand-derived whole-bit costs: mislabeled doc scores en=2 vs de=4.
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "text": ["alpha beta alpha"] * 3 + ["delta zeta"] * 2
            + ["alpha beta", ""],
            "lang": ["en"] * 3 + ["de"] * 4,
        }
    )
    rows = _with_docs(spark, pdf, "nb_langid_confusion")
    got = {(r["true_lang"], r["pred_lang"]): r["n_docs"] for r in rows}
    assert got == {("en", "en"): 3, ("de", "de"): 3, ("de", "en"): 1}
    want = _oracle(pdf, "nb_langid_confusion")
    assert {
        (r["true_lang"], r["pred_lang"]): int(r["n_docs"])
        for _, r in want.iterrows()
    } == got
