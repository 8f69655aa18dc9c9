"""End-to-end preprocessing-pipeline equivalence (reference data_ops
step_02→06, SURVEY.md §3.2): the composed lazy Spark plan must match a
sequential pure-python oracle row-for-row on the synthetic web corpus —
split assignment, stable positions, cleaned text bytes, token stats, the
(split, position) anti-join filter, and the per-publisher shrink."""

from __future__ import annotations

import hashlib

from news_crawler_slm_spark.functions.html_clean import clean_html
from news_crawler_slm_spark.plans.pipeline import (
    PreprocessParams,
    preprocess_pages,
)
from news_crawler_slm_spark.sources.synthetic_web import WebScale, generate_web

PARAMS = PreprocessParams(train_frac=0.8, token_threshold=60, cap_n=3)
SCALE = WebScale(n_hosts=9, pages_per_host_max=14, seed=11)


def _oracle(rows):
    """Sequential reference-semantics implementation (the oracle)."""
    pubs = sorted({r[5] for r in rows})
    ranked = sorted(pubs, key=lambda p: hashlib.md5(p.encode()).hexdigest())
    n = len(ranked)
    ts0 = int(round(PARAMS.train_frac * n))
    rem = n - ts0
    train_n, val_n = ts0 + rem % 2, rem // 2
    split_of = {}
    for i, p in enumerate(ranked, 1):
        split_of[p] = "train" if i <= train_n else ("val" if i <= train_n + val_n else "test")

    cleaned = []  # (url, publisher, split, position, text)
    by_split = {}
    for url, html, _links, _ok, _lang, pub in sorted(rows, key=lambda r: (r[5], r[0])):
        by_split.setdefault(split_of[pub], []).append((url, pub))
    texts = {r[0]: clean_html(r[1].decode("utf-8")) for r in rows}
    for split, items in by_split.items():
        for pos, (url, pub) in enumerate(items):
            cleaned.append((url, pub, split, pos, texts[url]))

    stats = {(c[2], c[3]): len(c[4].strip().split()) if c[4].strip() else 1 for c in cleaned}
    # ws_token_count twin: size(split(trim(text),'\s+')) counts 1 for empty
    kept = [c for c in cleaned if not stats[(c[2], c[3])] > PARAMS.token_threshold]

    final = []
    per_pub: dict[tuple, int] = {}
    for c in sorted(kept, key=lambda c: (c[2], c[1], c[3])):
        key = (c[2], c[1])
        per_pub[key] = per_pub.get(key, 0) + 1
        if c[2] == "train" or per_pub[key] <= PARAMS.cap_n:
            final.append(c)
    return cleaned, kept, final


def test_pipeline_matches_sequential_oracle(spark):
    rows = generate_web(SCALE)["web"]
    from news_crawler_slm_spark import schemas

    web = spark.createDataFrame(rows, schemas.WEB)
    pages = web.selectExpr("url", "html", "publisher")
    res = preprocess_pages(pages, PARAMS)

    cleaned_o, kept_o, final_o = _oracle(rows)

    got_cleaned = {
        (r.url, r.publisher, r.split, r.position, r.text) for r in res.cleaned.collect()
    }
    assert got_cleaned == set(cleaned_o)  # split + position + BYTES identical

    got_final = {
        (r.url, r.publisher, r.split, r.position, r.text) for r in res.final.collect()
    }
    assert got_final == set(final_o)
    # the filter actually dropped something and shrink actually capped
    assert len(cleaned_o) > len(kept_o) > len(final_o) or len(kept_o) == len(final_o)


def test_token_stats_table_matches(spark):
    rows = generate_web(SCALE)["web"]
    from news_crawler_slm_spark import schemas

    web = spark.createDataFrame(rows, schemas.WEB)
    res = preprocess_pages(web.selectExpr("url", "html", "publisher"), PARAMS)
    cleaned_o, _, _ = _oracle(rows)
    want = {
        (c[2], c[3], "text", len(c[4].strip().split()) if c[4].strip() else 1)
        for c in cleaned_o
    }
    got = {
        (r.split, r.position, r.column, r.token_count) for r in res.token_stats.collect()
    }
    assert got == want
