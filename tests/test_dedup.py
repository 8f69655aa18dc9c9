"""Value-level oracles for the hash-based dedup/fingerprint pipelines
(minhash_lsh_candidates, simhash_fingerprints, doc_fingerprints).

These pipelines hash with the cross-engine 60-bit md5_long
(functions/hashing.py), so they carry full DuckDB driver oracles; this
file adds an INDEPENDENT pure-Python re-derivation of each pipeline
end-to-end on the same parquet input (hashlib.md5 via md5_long_py), plus
the planted-fixture and hot-bucket-cap guards no SQL oracle can express.
xxh64_oracle.py remains the twin for the operators that still use
xxhash64 internally without exposing it (count-min sketch, ExactSubstr).
"""

from __future__ import annotations

import re

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from news_crawler_slm_spark.functions.hashing import md5_long_py
from news_crawler_slm_spark.plans import catalog_dedup as D
from xxh64_oracle import xxh64_str

_WS = re.compile(r"\s+")


def _docs(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _toks(text: str) -> list[str]:
    s = text.strip()
    return _WS.split(s) if s else []


def test_xxh64_oracle_matches_spark(spark):
    """The oracle hash must agree with Spark's xxhash64 — anchors everything
    below to the engine's actual hash primitive."""
    vals = ["", "a", "hello world", "seed7:foo bar baz", "x" * 100,
            "1234567", "12345678", "1234567890123456789012345678901234567"]
    rows = (
        spark.createDataFrame([(v,) for v in vals], ["s"])
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    )
    for r in rows:
        assert xxh64_str(r["s"]) == r["h"], repr(r["s"])


def _minhash_oracle(docs, n=3, n_hashes=16, bands=4, bucket_cap=64):
    """Pure-Python re-derivation of the banded MinHash plan
    (catalog_dedup.minhash_lsh_candidates) — one md5 base hash per
    shingle + 16 linear permutations — including the hot-bucket cap:
    (band, bucket) groups over bucket_cap members emit no pairs."""
    from news_crawler_slm_spark.operators.incremental_dedup import (
        _MH_P,
        _mh_params,
    )

    rows_per_band = n_hashes // bands
    mh_a, mh_b = _mh_params()
    cache: dict[str, int] = {}

    def hb(g):
        if g not in cache:
            cache[g] = md5_long_py(g) % _MH_P
        return cache[g]

    def h(i, g):
        return (mh_a[i] * hb(g) + mh_b[i]) % _MH_P

    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in docs:
        t = _toks(text)
        if len(t) < n:
            continue
        grams = {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}
        sig = [min(h(i, g) for g in grams) for i in range(n_hashes)]
        for b in range(bands):
            key = "|".join(
                str(sig[b * rows_per_band + r]) for r in range(rows_per_band)
            )
            buckets.setdefault((b, md5_long_py(key)), []).append(doc_id)
    pairs = set()
    for members in buckets.values():
        if len(members) > bucket_cap:
            continue
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                pairs.add((a, b))
    return pairs


def test_minhash_lsh_candidates_value_oracle(spark, sf_dir):
    got = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_candidates(spark, sf_dir).collect()
    }
    want = _minhash_oracle(_docs(sf_dir))
    assert got == want


def test_minhash_lsh_finds_planted_neardup(spark, sf_dir, tmp_path):
    """A planted 90%-overlap near-duplicate must surface as a candidate —
    guards against a vacuously-empty pipeline."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.limit(1).collect()[0]
    mutated = " ".join(_toks(base["text"])[:-1] + ["zzz"])
    planted = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame([(99999, mutated)], ["doc_id", "text"])
    )
    out = str(tmp_path / "planted")
    planted.write.parquet(f"{out}/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_candidates(spark, out).collect()
    }
    assert (base["doc_id"], 99999) in got or (99999, base["doc_id"]) in got


def test_minhash_lsh_hot_bucket_capped(spark, sf_dir, tmp_path):
    """THE 100-TB LSH guard: plant a boilerplate pile-up — `m` identical
    docs, all 4 bands collapsing into one bucket each, which uncapped would
    emit m*(m-1)/2 = 11,175 pairs from a single bucket — and assert the cap
    drops those buckets entirely (zero pairs among the planted ids) while a
    genuine sub-cap near-dup pair on different text still surfaces. Also
    pins the global bound: every surviving bucket has <= cap members, so no
    bucket contributes more than cap*(cap-1)/2 pairs."""
    cap = 64
    m = 150  # planted hot-bucket size, well over the cap
    hot = [(200000 + i, "spam spam spam spam spam spam spam") for i in range(m)]
    base = _docs(sf_dir)[:20]
    pair_a = (300001, "alpha beta gamma delta epsilon zeta eta theta")
    pair_b = (300002, "alpha beta gamma delta epsilon zeta eta iota")
    rows = [(int(d), t) for d, t in base] + hot + [pair_a, pair_b]
    out = str(tmp_path / "hotbucket")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(
        f"{out}/documents.parquet"
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_candidates(spark, out).collect()
    }
    hot_ids = {d for d, _ in hot}
    assert not any(a in hot_ids and b in hot_ids for a, b in got)
    # the near-dup pair shares 3 of 4 bands (only the mutated-suffix band
    # differs) and its buckets are size 2 — far under the cap: must survive
    assert (300001, 300002) in got
    # independent pure-Python oracle agrees on the capped result
    assert got == _minhash_oracle(rows, bucket_cap=cap)


def test_ngram_jaccard_stop_shingle_capped(spark, tmp_path):
    """The inverted-index twin of the LSH hot-bucket guard: 150 docs
    sharing one boilerplate shingle would emit ~11k intersection rows from
    that single posting list; the df-cap drops it (no pair may owe its
    candidacy to an over-cap shingle) while a genuine near-dup pair under
    the cap still surfaces — and the Spark result must equal the DuckDB
    oracle on the same planted corpus (the cap lives in both engines)."""
    import duckdb

    boiler = "click here to subscribe now"
    rows = []
    for i in range(150):
        # shared boilerplate + one unique token: pairwise jaccard 3/5 = 0.6,
        # so WITHOUT the cap every one of the 150*149/2 = 11,175 pairs
        # passes the 0.5 threshold — the cap is what kills them
        rows.append((i, f"{boiler} unique{i}a", "s0", "en", 10))
    rows.append((9001, "alpha beta gamma delta epsilon zeta", "s0", "en", 10))
    rows.append((9002, "alpha beta gamma delta epsilon eta", "s0", "en", 10))
    out = str(tmp_path / "stopshingle")
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(spark, out).collect()
    }
    assert (9001, 9002) in got
    assert not any(a < 9000 and b < 9000 for a, b in got)  # boilerplate killed

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{out}/documents.parquet/*.parquet'"
    )
    from news_crawler_slm_spark.plans import REGISTRY

    want = {
        (int(a), int(b)): j
        for a, b, j in con.execute(REGISTRY["ngram_jaccard_pairs"][1]).fetchall()
    }
    assert got == want


def _simhash_oracle(docs):
    """60-bit md5_long simhash (matches simhash_fingerprints_of — always
    non-negative, so no sign fold is needed)."""
    fps = {}
    for doc_id, text in docs:
        votes = [0] * 60
        for tok in _toks(text):
            u = md5_long_py(tok)
            for i in range(60):
                votes[i] += 1 if (u >> i) & 1 else -1
        u = 0
        for i in range(60):
            if votes[i] > 0:
                u |= 1 << i
        fps[doc_id] = u
    return fps


def test_simhash_fingerprints_value_oracle(spark, sf_dir):
    got = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash_fingerprints(spark, sf_dir).collect()
    }
    want = _simhash_oracle(_docs(sf_dir))
    assert got == want


def test_simhash_neardup_pairs_value_oracle(spark, sf_dir):
    """Manku-style banded Hamming pair generation: pure-Python twin of the
    whole pipeline (dup-union corpus → simhash → 4×15-bit bands →
    cap-filtered band buckets → Hamming <= 3 pairs). The 50 re-crawled
    docs guarantee Hamming-0 pairs, so the check is never vacuous."""
    base = _docs(sf_dir)
    docs = base + [(d + 10000, t) for d, t in base if d < 50]
    fps = _simhash_oracle(docs)

    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, fp in fps.items():
        for b in range(4):
            buckets.setdefault((b, (fp >> (15 * b)) & 0x7FFF), []).append(doc_id)
    want = set()
    for members in buckets.values():
        if len(members) > 64:  # the hot-bucket cap
            continue
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                ham = bin(fps[a] ^ fps[b]).count("1")
                if ham <= 3:
                    want.add((a, b, ham))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in D.simhash_neardup_pairs(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) >= 50  # every re-crawled doc pairs with its original


def test_simhash_hamming_neardup_property(spark, sf_dir):
    """Near-identical docs get near-identical simhashes: flipping two tokens
    out of ~50 must keep Hamming distance well under the random-pair level
    (~32 bits for independent hashes)."""
    doc_id, text = _docs(sf_dir)[0]
    toks = _toks(text)
    mutated = " ".join(toks[:-2] + ["zzz", "yyy"])
    fps = _simhash_oracle([(0, text), (1, mutated), (2, "totally different words entirely")])
    ham = bin(fps[0] ^ fps[1]).count("1")
    assert ham <= 16
    far = bin(fps[0] ^ fps[2]).count("1")
    assert far > ham


def test_doc_fingerprints_value_oracle(spark, sf_dir):
    got = {
        r["doc_id"]: (r["fp64"], r["prefix_fp"])
        for r in D.doc_fingerprints(spark, sf_dir).collect()
    }
    for doc_id, text in _docs(sf_dir):
        want_fp = md5_long_py(text)
        want_prefix = md5_long_py(" ".join(_toks(text)[:8]))
        assert got[doc_id] == (want_fp, want_prefix), doc_id


def test_substring_dedup_planted_spans(spark, tmp_path):
    """Hand-computed ExactSubstr case (W=15): doc 20 copies a 20-token span
    from doc 10 (6 duplicated windows covering exactly the copied tokens),
    doc 30 is a verbatim copy of doc 10 (everything removed), doc 40 is
    shorter than W (no windows; passes through clean). The keeper rule is
    global-first by (doc_id, pos), so doc 10 loses nothing."""
    import hashlib

    a = [f"a{i}" for i in range(30)]          # doc 10: a0..a29, 30 tokens
    b = [f"b{i}" for i in range(15)]
    d10 = " ".join(a)
    d20 = " ".join(b[:10] + a[4:24] + b[10:])  # 35 tokens; a-span at idx 11..30
    d30 = d10                                  # full copy
    d40 = "x0 x1 x2 x3 x4"                     # 5 tokens < W
    out = str(tmp_path / "substr")
    spark.createDataFrame(
        [(10, d10), (20, d20), (30, d30), (40, d40)], ["doc_id", "text"]
    ).write.parquet(f"{out}/documents.parquet")

    stats = {
        r["doc_id"]: (r["n_windows"], r["dup_windows"])
        for r in D.substring_dup_stats(spark, out).collect()
    }
    # doc 10: 30-15+1 = 16 windows, all keepers; doc 20: 35-15+1 = 21
    # windows, the 6 fully inside the copied span (start 11..16) are dups;
    # doc 30: 16 windows, all dups; doc 40: no windows -> no row
    assert stats == {10: (16, 0), 20: (21, 6), 30: (16, 16)}

    clean = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_md5"])
        for r in D.substring_dedup_clean(spark, out).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 20's dup windows start at 11..16, each 15 wide -> covered 11..30
    d20_clean = " ".join(b[:10] + b[10:])
    assert clean == {
        10: (30, 0, md5(d10)),
        20: (35, 20, md5(d20_clean)),
        30: (30, 30, md5("")),
        40: (5, 0, md5(d40)),
    }
