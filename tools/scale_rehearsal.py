"""10x scale rehearsal — measured evidence that the heavy operators
scale, not just pass.

Builds a ~sf1 dataset in /tmp by unioning 10 key-offset replicas of
the sf0.1 fact tables (dimensions stay fixed, like a real scale-up),
then times a panel of the heaviest / most scale-sensitive queries at
sf0.1 and at 10x and reports the wall-clock scaling factor for each.

Replica perturbation keeps the workload honest:

- ``documents.text`` gets a per-replica suffix token, so MinHash/LSH
  buckets don't degenerate into 10-way exact-duplicate cliques (the
  within-replica duplicate rate — what the dedup ops are sized for —
  is preserved at 10x the volume).
- ``embeddings.embedding`` gets a tiny per-replica additive offset for
  the same reason.
- Fact keys (orderkey / doc_id / event_id) are offset per replica so
  uniqueness invariants hold.

Interpretation: on a fixed 32-core machine, a shuffle-bound linear
operator should land near 10x (plus constant job overhead amortizing
DOWN); pair-generating operators scale with candidate-pair count, not
row count — the point of blocked/LSH designs is that the factor stays
near-linear instead of the 100x an all-pairs design would pay.

Usage: python tools/scale_rehearsal.py [--skip-build]
Appends nothing; prints a markdown table to paste into EXPERIMENTS.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from pgshovel_spark.queries import all_queries  # noqa: E402
from pgshovel_spark.session import get_session  # noqa: E402
from pgshovel_spark.sources.tables import TABLES, load_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_scale/sf1"
REPLICAS = 10
# Key offsets comfortably past each table's max key at sf0.1.
OFF = {"orderkey": 10_000_000, "doc_id": 1_000_000, "event_id": 10_000_000}

PANEL = (
    "q_agg_pricing_summary",  # 6M-row multi-measure hash agg
    "q_agg_stats",            # 6M-row exact-decimal moments
    "q_join_star",            # 6M-row 5-way star join
    "q_win_ntile",            # 1.5M-row two-pass distributed rank
    "q_sessionize",           # 1M events gap-sessionization
    "q_dedup_exact",          # 50k-doc hash-key dedup
    "q_text_tfidf",           # 50k-doc tokenize + 2 aggs + window
    "q_sim_jaccard",          # blocked pair generation (quadratic risk)
    "q_dedup_minhash_pairs",  # LSH pairs, _BUCKET_CAP-bounded (round 3:
                              # uncapped form measured >30 min at 10x on
                              # the dup-dense replica corpus; capped 5 s)
    "q_dedup_clusters",       # connected components over LSH graph
    "q_text_decontaminate",   # broadcast shingle-set overlap
    "q_pack_sequences",       # per-lang window cumsum + chunk spans
    # round-3 additions
    "q_sim_jaccard_prefix",   # prefix-filtered exact SSJoin (output-sensitive)
    "q_event_attribution",    # one-window attribution over 1M events
    "q_ts_gapfill",           # hourly LOCF spine (spans, not rows)
    "q_scd2_intervals",       # lead-window temporal table build
    "q_text_unigram_ppl",     # corpus-LM fold per doc
    "q_sketch_quantile",      # constant-state mergeable histogram
)


def build(spark: SparkSession) -> None:
    os.makedirs(SF1, exist_ok=True)
    for name in TABLES:
        src = load_table(spark, SF01, name)
        if name in ("region", "nation", "customer", "supplier", "part"):
            out = src  # dimensions don't scale with the fact 10x
        else:
            parts = []
            for i in range(REPLICAS):
                r = src
                if name == "orders":
                    r = r.withColumn(
                        "o_orderkey", F.col("o_orderkey") + i * OFF["orderkey"]
                    )
                elif name == "lineitem":
                    r = r.withColumn(
                        "l_orderkey", F.col("l_orderkey") + i * OFF["orderkey"]
                    )
                elif name == "events":
                    r = r.withColumn(
                        "event_id", F.col("event_id") + i * OFF["event_id"]
                    )
                elif name == "documents":
                    r = r.withColumn(
                        "doc_id", F.col("doc_id") + i * OFF["doc_id"]
                    )
                    if i > 0:
                        r = r.withColumn(
                            "text", F.concat("text", F.lit(f" rep{i}"))
                        )
                elif name == "embeddings":
                    r = r.withColumn(
                        "vec_id", F.col("vec_id") + i * OFF["doc_id"]
                    ).withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda x: (x + F.lit(i * 1e-3)).cast("float"),
                        ),
                    )
                parts.append(r)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(SF1, f"{name}.parquet"))
        print(f"built {name}", file=sys.stderr)


def time_query(qfn, spark: SparkSession, sf_dir: str) -> float:
    qfn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        qfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    spark = get_session()
    if not args.skip_build:
        build(spark)

    qs = all_queries()
    print("| Query | sf0.1 (s) | 10x (s) | factor |")
    print("|---|---|---|---|")
    for name in PANEL:
        t1 = time_query(qs[name], spark, SF01)
        t10 = time_query(qs[name], spark, SF1)
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {t10 / t1:.1f}x |")


if __name__ == "__main__":
    main()
