"""Count-min sketch: cells bit-exact vs the pure-python xxh64 twin,
overestimate-only guarantee, merge ≡ sketch-of-union, partitioning
invariance."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from news_crawler_slm_spark.operators.cms import cms_lookup, cms_merge, cms_table
from xxh64_oracle import xxh64_str

D, W = 4, 256


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def _twin_cells(values):
    cells: Counter = Counter()
    for v in values:
        for d in range(D):
            b = _signed(xxh64_str(f"{v}#cms{d}")) % W  # python % ≡ pmod
            cells[(d, b)] += 1
    return dict(cells)


def _corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    )


def test_cells_match_python_twin_and_partitioning(spark, sf_dir):
    toks = _corpus(spark, sf_dir)
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_table(toks, "tok", D, W).collect()
    }
    exp = _twin_cells([r["tok"] for r in toks.collect()])
    assert got == exp
    got13 = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_table(toks.repartition(13), "tok", D, W).collect()
    }
    assert got13 == exp


def test_estimates_overestimate_only_and_bounded(spark, sf_dir):
    toks = _corpus(spark, sf_dir)
    truth = Counter(r["tok"] for r in toks.collect())
    n = sum(truth.values())
    table = cms_table(toks, "tok", D, W)
    items = spark.createDataFrame([(t,) for t in truth], "tok string")
    est = {
        r["tok"]: r["estimate"]
        for r in cms_lookup(table, items, "tok", D, W).collect()
    }
    assert set(est) == set(truth)
    # CMS never undercounts; and with d=4 the min over rows stays within
    # the standard e*N/W bound for every key at this corpus size
    import math

    bound = math.e * n / W
    for t, c in truth.items():
        assert est[t] >= c, t
        assert est[t] <= c + bound, (t, est[t], c, bound)


def test_absent_key_estimates_small_and_merge_is_union(spark, sf_dir):
    toks = _corpus(spark, sf_dir)
    half_a = toks.where(F.length("tok") % 2 == 0)
    half_b = toks.where(F.length("tok") % 2 == 1)
    merged = cms_merge(
        cms_table(half_a, "tok", D, W), cms_table(half_b, "tok", D, W)
    )
    whole = cms_table(toks, "tok", D, W)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))

    # a key never inserted can only collide: estimate well below the top
    # real key's count (and >= 0 by construction)
    ghost = spark.createDataFrame([("zzz-never-seen-token",)], "tok string")
    est = cms_lookup(whole, ghost, "tok", D, W).collect()[0]["estimate"]
    truth = Counter(r["tok"] for r in toks.collect())
    import math

    assert 0 <= est <= math.e * sum(truth.values()) / W


def test_grouped_cells_equal_per_group_solo_sketches(spark, sf_dir):
    """cms_table_by must produce, for every group, exactly the cells
    cms_table produces on that group's slice alone (same salted hash →
    group sketches merge with the global algebra), and grouped lookups
    must be overestimate-only per group — exact here since width >>
    per-group vocabulary pressure is low at this scale."""
    from collections import Counter

    from news_crawler_slm_spark.operators.cms import cms_lookup_by, cms_table_by

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(
        "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    grouped = {
        (r["lang"], r["row"], r["col"]): r["cnt"]
        for r in cms_table_by(toks, ["lang"], "tok", D, W).collect()
    }
    langs = [r["lang"] for r in toks.select("lang").distinct().collect()]
    assert len(langs) >= 2
    solo = {}
    for lang in langs:
        for r in cms_table(
            toks.where(F.col("lang") == lang), "tok", D, W
        ).collect():
            solo[(lang, r["row"], r["col"])] = r["cnt"]
    assert grouped == solo

    # grouped lookups: >= true per-(lang, tok) count, 0 for absent pairs
    true = Counter(
        (r["lang"], r["tok"]) for r in toks.collect()
    )
    some = sorted(true)[:5] + [(langs[0], "never-seen-token-xyzzy")]
    items = spark.createDataFrame(some, "lang string, tok string")
    est = {
        (r["lang"], r["tok"]): r["estimate"]
        for r in cms_lookup_by(
            cms_table_by(toks, ["lang"], "tok", D, W), items, ["lang"], "tok", D, W
        ).collect()
    }
    for k in some:
        assert est[k] >= true.get(k, 0), (k, est[k], true.get(k, 0))
    assert est[(langs[0], "never-seen-token-xyzzy")] >= 0
