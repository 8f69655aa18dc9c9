#!/usr/bin/env python
"""Focused interleaved A/B for the r03 bench drifts (VERDICT r03 #3):
simhash_fingerprints (+48% r02->r03, code untouched) and unigram_perplexity
(+35%, r03 switched float avg(ln p) to order-independent integer
micro-nats).  Measures, interleaved best-of-N at the full bench protocol:

  - simhash (current code — the only version that ever existed since r02)
  - perplexity CURRENT  (integer micro-nats sum)
  - perplexity R02-STYLE (float avg(log p)) — reconstructed inline, the
    exact pre-r03 aggregation shape — to attribute the drift to the
    quantization pass or to measurement weather.

Usage: python scripts/drift_ab.py [sf_dir] [repeats]
Prints one JSON line with best-of timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 7
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def perplexity_r02_style(spark, sf_dir):
    """The pre-r03 aggregation: float avg(ln p) (order-dependent — replaced
    because partition order could flip round(...,4); kept here only as the
    A/B reference implementation)."""
    from pyspark.sql import functions as F

    from news_crawler_slm_spark.plans.catalog import _t

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = d.select(
        F.sum(F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))).alias("n")
    )
    probs = vocab.crossJoin(F.broadcast(total)).select(
        "tok", (F.col("c") / F.col("n")).alias("p")
    )
    return (
        toks.join(F.broadcast(probs), "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.avg(F.log("p")).alias("__m"))
        .select(
            "doc_id", "n_tokens", F.round(F.exp(-F.col("__m")), 4).alias("perplexity")
        )
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from news_crawler_slm_spark.plans import REGISTRY
    from news_crawler_slm_spark.session import get_spark

    spark = get_spark("drift-ab", cores=CPUS, shuffle_partitions=CPUS)

    dfs = {
        "simhash_fingerprints": REGISTRY["simhash_fingerprints"][0](spark, SF_DIR),
        "perplexity_micronats": REGISTRY["unigram_perplexity"][0](spark, SF_DIR),
        "perplexity_r02_float": perplexity_r02_style(spark, SF_DIR),
    }

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    for df in dfs.values():  # warm-up
        run(df)
    best = {k: float("inf") for k in dfs}
    samples: dict[str, list[float]] = {k: [] for k in dfs}
    for _ in range(REPEATS):
        for name, df in dfs.items():
            t0 = time.monotonic()
            run(df)
            dt = time.monotonic() - t0
            samples[name].append(round(dt, 4))
            best[name] = min(best[name], dt)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "repeats": REPEATS,
                "best": {k: round(v, 4) for k, v in best.items()},
                "samples": samples,
            }
        )
    )


if __name__ == "__main__":
    main()
