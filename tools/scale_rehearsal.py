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
#: Variant corpus for the EXACT similarity joins: same 10x documents
#: but each replica i>0 appends ~14% replica-specific tokens, so
#: cross-replica copies fall BELOW tau=0.9 while within-replica
#: near-dup pairs (the workload the operator is sized for) are
#: preserved at 10x volume.  The plain SF1 corpus gives every doc 9
#: near-identical copies — for a LOSSLESS tau=0.9 join that multiplies
#: the OUTPUT ~35x by construction, which measures output growth, not
#: operator scaling.  Other tables are symlinked to SF1.
SF1P = "/tmp/spark_graft_scale/sf1p"
REPLICAS = 10
# Key offsets comfortably past each table's max key at sf0.1.
OFF = {"orderkey": 10_000_000, "doc_id": 1_000_000, "event_id": 10_000_000}

#: Shared scratch artifacts timed EXPLICITLY per scale (round 4): the
#: query panel below runs artifact-warm (the production posture — a
#: pipeline persists these once), so the build cost must be measured
#: on its own or consumers like q_dedup_clusters would show a vacuous
#: 0.04s at both scales.
ARTIFACTS = (
    "tok_distinct",
    "bigram_shingles",
    "token_counts",
    "dedup_clusters",
    # round 6
    "trade_edges",
    "shingle_pair_stats",
    "lineitem_by_month",
)

PANEL = (
    "q_agg_pricing_summary",  # 6M-row multi-measure hash agg
    "q_agg_stats",            # 6M-row exact-decimal moments
    "q_join_star",            # 6M-row 5-way star join
    "q_win_ntile",            # 1.5M-row two-pass distributed rank
    "q_sessionize",           # 1M events gap-sessionization
    "q_dedup_exact",          # 50k-doc hash-key dedup
    "q_text_tfidf",           # 50k-doc tokenize + 2 aggs + window
    "q_sim_jaccard",          # blocked pair generation (quadratic risk)
    # round-12 addition
    "q_lsh_band_stats",       # banding diagnostics: bucket-size + pair-budget aggs
    "q_dedup_minhash_pairs",  # LSH pairs, _BUCKET_CAP-bounded (round 3:
                              # uncapped form measured >30 min at 10x on
                              # the dup-dense replica corpus; capped 5 s)
    "q_dedup_clusters",       # connected components over LSH graph
    "q_text_decontaminate",   # broadcast shingle-set overlap
    "q_pack_sequences",       # per-lang window cumsum + chunk spans
    # round-3 additions
    "q_sim_jaccard_prefix",   # prefix-filtered exact SSJoin (output-sensitive)
    # round-4 addition
    "q_graph_trade_components",  # distributed CC over the trade graph
    "q_event_attribution",    # one-window attribution over 1M events
    "q_ts_gapfill",           # hourly LOCF spine (spans, not rows)
    "q_scd2_intervals",       # lead-window temporal table build
    "q_text_unigram_ppl",     # corpus-LM fold per doc
    "q_sketch_quantile",      # constant-state mergeable histogram
    # round-6 additions
    "q_graph_triangles",      # array-projection wedge closing
    "q_scan_partition_pruned",  # partition-pruned warehouse scan
    "q_text_blocklist",       # map-only governance scrub
    "q_text_chunk",           # map-only RAG chunking
    "q_split_train_eval",     # hash-split manifest
    "q_text_crossdup",        # cached trigram-hash df join
    # round-6 second wave
    "q_graph_pagerank",       # 3 unrolled iterations, one declarative plan
    "q_waiting_orders",       # one-pass per-order double-correlation
    "q_min_cost_supplier",    # Q2-shape min-cost rate card
    "q_important_stock",      # Q11-shape global-scalar HAVING
    "q_excess_inventory",     # Q20-shape stacked aggregates
    "q_sample_weighted",      # A-ES priority TakeOrdered
    "q_ann_recall",           # Arrow-matmul batch scoring + IVF routing
    "q_dedup_chunks",         # chunk-hash frequency dedup triage
    "q_embed_gram",           # int64 Arrow Gram partials
    "q_cdc_snapshot_diff",    # one-pass dual-snapshot aggregate
    "q_drift_psi",            # conditional-agg histogram + fold
    # round-7 uncached rewrites (exchange-reuse instead of persist —
    # rehearse that the shared-subtree recompute stays amortized at 10x)
    "q_skyline",
    "q_pipeline_curate",
    # round-11: the five round-10 last-wave additions the r10 verdict
    # flagged as missing their adjudication rows
    "q_expr_try",             # try_* error-safety panel, row-local codegen
    "q_graph_lpa",            # synchronous label propagation, 4 rounds
    "q_late_events",          # bucketed two-pass prefix max (r11 rewrite)
    "q_sample_temperature",   # temperature-rule mixture weights
    "q_mm_video",             # AVI/RIFF container decode, mapInPandas
    # round-11 additions
    "q_sample_rejection",     # row-local quality gate + tiny aggregate
    "q_graph_kcore",          # window-flag peel on the edge artifact
    "q_mm_imagedup",          # cross-format image dedup, codec mapInPandas
    "q_text_ppl_buckets",     # CCNet terciles via two-pass rank
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
    build_perturbed(spark)


def build_perturbed(spark: SparkSession) -> None:
    """SF1P: the cross-replica-divergent documents variant (see SF1P
    note); every non-documents table is a symlink into SF1."""
    os.makedirs(SF1P, exist_ok=True)
    src = load_table(spark, SF01, "documents")
    parts = []
    for i in range(REPLICAS):
        r = src.withColumn("doc_id", F.col("doc_id") + i * OFF["doc_id"])
        if i > 0:
            ntoks = F.size(F.split(F.col("text"), r"\s+"))
            extra = F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.lit(1), (ntoks / 7).cast("int"))),
                    lambda j: F.concat(F.lit(f"r{i}q"), j.cast("string")),
                ),
            )
            r = r.withColumn("text", F.concat("text", F.lit(" "), extra))
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(os.path.join(SF1P, "documents.parquet"))
    for name in TABLES:
        if name == "documents":
            continue
        link = os.path.join(SF1P, f"{name}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SF1, f"{name}.parquet"), link)
    print("built perturbed documents", file=sys.stderr)


def time_query(qfn, spark: SparkSession, sf_dir: str) -> float:
    qfn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        qfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def _artifact_builders():
    from pgshovel_spark.queries import graph_analytics, similarity, sketches, warehouse

    return {
        "tok_distinct": similarity._tok_distinct,
        "bigram_shingles": similarity._bigram_shingles,
        "token_counts": sketches._token_counts,
        "dedup_clusters": similarity._cluster_table,
        "trade_edges": graph_analytics._trade_edges,
        "shingle_pair_stats": similarity._shingle_pair_stats,
        "lineitem_by_month": warehouse._lineitem_by_month,
    }


def _auto_panel() -> tuple:
    """Every engine row >1.5 s in the committed BENCH_DETAIL.json —
    the round-8 gate: anything expensive enough to matter gets a 10x
    factor each round, not just the hand-picked panel."""
    import json

    detail = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json",
    )
    with open(detail) as f:
        walls = json.load(f)["spark"]
    names = [
        n
        for n, w in sorted(walls.items(), key=lambda kv: -kv[1])
        if w > 1.5 and not n.startswith("artifact:")
    ]
    return tuple(names)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--only", nargs="*", help="subset of PANEL/ARTIFACTS to run")
    ap.add_argument(
        "--auto",
        action="store_true",
        help="panel = every BENCH_DETAIL engine row >1.5s (+ all artifacts)",
    )
    args = ap.parse_args()

    from pgshovel_spark.operators.scratch import clear_scratch

    spark = get_session()
    if not args.skip_build:
        build(spark)
    elif not os.path.exists(os.path.join(SF1P, "documents.parquet")):
        # --skip-build from a pre-round-4 sf1 dir: the perturbed
        # documents variant is cheap to (re)derive on its own
        build_perturbed(spark)

    builders = _artifact_builders()
    qs = all_queries()
    # 1. artifact builds, cold per scale (order matters: dedup_clusters
    # consumes tok_distinct, so it is timed build-on-warm-token-table —
    # the real incremental cost of the cluster map).  A throwaway
    # sf0.001 pass first: the very first build otherwise absorbs
    # whole-session JVM/codegen warm-up and poisons its factor.
    for name in ARTIFACTS:
        builders[name](spark, "/root/testdata/sf0.001")
    clear_scratch(spark, sf_dirs=[SF01, SF1, SF1P, "/root/testdata/sf0.001"])
    print("| Artifact build | sf0.1 (s) | 10x (s) | factor |")
    print("|---|---|---|---|")
    arts = [a for a in ARTIFACTS if not args.only or a in args.only]
    times: dict[tuple[str, str], float] = {}
    for sf_dir in (SF01, SF1):
        clear_scratch(spark, sf_dirs=[SF01, SF1, SF1P])
        for name in arts:
            t0 = time.time()
            builders[name](spark, sf_dir)
            times[(name, sf_dir)] = time.time() - t0
    for name in arts:
        t1, t10 = times[(name, SF01)], times[(name, SF1)]
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {t10 / t1:.1f}x |")

    # 2. query panel, artifact-warm (the production steady state)
    panel = _auto_panel() if args.auto else PANEL
    print("| Query | sf0.1 (s) | 10x (s) | factor |")
    print("|---|---|---|---|")
    for name in panel:
        if args.only and name not in args.only:
            continue
        sf10 = SF1P if name == "q_sim_jaccard_prefix" else SF1
        t1 = time_query(qs[name], spark, SF01)
        t10 = time_query(qs[name], spark, sf10)
        note = " (perturbed corpus)" if sf10 == SF1P else ""
        print(
            f"| {name}{note} | {t1:.2f} | {t10:.2f} | {t10 / t1:.1f}x |", flush=True
        )
    spark.stop()  # local[32] JVM holds non-daemon threads otherwise


if __name__ == "__main__":
    main()
