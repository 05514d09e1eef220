"""BM25 top-k retrieval (entry_queries.bm25_topk) pinned on a constructed
corpus: full ranked lists cross-checked against an independent pure-Python
integer twin AND the registered DuckDB oracle SQL running live."""

from __future__ import annotations

import duckdb
import pandas as pd

import scrapy_spark.entry_queries as eq
from scrapy_spark.entry_queries import _BM25_K, _BM25_QUERIES, _BM25_S, QUERIES


def _py_bm25(pdf: pd.DataFrame) -> list[tuple]:
    """Independent integer twin of the scaled BM25 formula (header comment
    above _BM25_QUERIES): returns (query_id, rank, doc_id, hits, score)."""
    toks = {r.doc_id: [w for w in r.text.split(" ") if w] for r in pdf.itertuples()}
    dl = {d: len(t) for d, t in toks.items()}
    n_docs = len(toks)
    avgdl = sum(dl.values()) // n_docs
    terms = sorted({t for _, t in _BM25_QUERIES})
    tf = {
        (d, t): sum(1 for w in ws if w == t)
        for d, ws in toks.items()
        for t in terms
        if t in ws
    }
    dfq = {t: sum(1 for (d2, t2) in tf if t2 == t) for t in terms}
    scores: dict[tuple[str, int], list[int]] = {}
    for q, t in _BM25_QUERIES:
        for (d, t2), f in tf.items():
            if t2 != t:
                continue
            idf = (n_docs - dfq[t] + 1) * _BM25_S // (dfq[t] + 1)
            part = (44 * avgdl * f * _BM25_S) // (
                20 * avgdl * f + 6 * avgdl + 18 * dl[d]
            )
            cell = scores.setdefault((q, d), [0, 0])
            cell[0] += 1
            cell[1] += idf * part
    out = []
    for q in sorted({qq for qq, _ in _BM25_QUERIES}):
        rows = sorted(
            ((d, h, s) for (qq, d), (h, s) in scores.items() if qq == q),
            key=lambda r: (-r[2], r[0]),
        )[:_BM25_K]
        out += [(q, i + 1, d, h, s) for i, (d, h, s) in enumerate(rows)]
    return sorted(out)


def test_bm25_topk_constructed_three_engine(spark):
    # filler tokens never match a query term; d5 is empty, d6 all-filler —
    # both must be absent from every ranked list. d3 vs d4 pins length
    # normalization (same tf=1 of 'spark'; shorter d4 must rank higher).
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "spark spark spark spark",
                "spark window join",
                "spark aa bb cc dd ee ff gg",
                "spark",
                "",
                "aa bb",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    orig = eq.load
    try:
        eq.load = lambda sp, d, t: df if t == "documents" else orig(sp, d, t)
        rows = QUERIES["bm25_topk"][0](spark, "unused").collect()
    finally:
        eq.load = orig
    got = sorted(
        (r.query_id, r.bm25_rank, r.doc_id, r.n_terms_hit, r.bm25_scaled)
        for r in rows
    )
    want = _py_bm25(pdf)
    assert got == want, f"\ngot:  {got}\nwant: {want}"
    # ranked docs are exactly the hit docs; empty/no-hit docs are absent
    assert {d for _, _, d, _, _ in got} == {1, 2, 3, 4}
    eng = {d: rk for q, rk, d, _, _ in got if q == "q_engine"}
    assert eng[4] < eng[3]  # length normalization at equal tf
    assert eng[2] == 1  # 3 distinct terms beat any single-term doc here
    # live oracle SQL over the registered frame
    con = duckdb.connect()
    con.register("documents", pdf)
    odf = con.execute(QUERIES["bm25_topk"][1]).fetchdf()
    oracle = sorted(
        (r.query_id, int(r.bm25_rank), int(r.doc_id), int(r.n_terms_hit),
         int(r.bm25_scaled))
        for r in odf.itertuples()
    )
    assert oracle == want
