"""Persisted IVF (inverted-file) ANN index — the embedding-search
scale path (SURVEY.md §2.G / SCALE.md "k-NN / ANN").

``q_sim_ann_ivf`` demonstrates the query SHAPE with label-as-cluster;
this module is the real thing: a k-means coarse quantizer trained on
the corpus, vectors persisted PARTITIONED BY centroid id, and a search
that reads only the ``n_probe`` nearest partitions — directory-level
pruning bounds scanned bytes regardless of corpus size, which is what
makes ANN feasible at 100 TB (the same inverted-file layout FAISS uses,
expressed as a parquet layout instead of an in-memory index).

Determinism: the quantizer initializes with k-means++ (Arthur &
Vassilvitskii 2007) over a DETERMINISTIC hash-ordered sample of the
corpus with a fixed-seed RNG, then runs a fixed Lloyd iteration count
— rebuilds are bit-reproducible.  The sample is the lowest-xxhash64
``sample_n`` vectors: a uniform pseudo-random subset that one
TakeOrdered job computes at any corpus size (the classic reservoir
alternative needs a sequential pass).  Assignment is a vectorized
Arrow-batched pandas_udf (one numpy matmul per batch) — the per-row
higher-order-function fold would be interpreted and ~100x slower at
assignment time.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return m / n


def _nearest_udf(centroids: np.ndarray):
    cn = _normalize(centroids)

    @pandas_udf("long")
    def nearest(embs: pd.Series) -> pd.Series:
        m = _normalize(np.stack(embs.to_numpy()))
        return pd.Series(np.argmax(m @ cn.T, axis=1))

    return nearest


def _kmeanspp_init(
    vecs: DataFrame, k_clusters: int, id_col: str, sample_n: int, seed: int
) -> np.ndarray:
    """k-means++ seeding over a deterministic sample.

    The candidate pool is the ``sample_n`` vectors with the lowest
    xxhash64(id) — uniform pseudo-random, order-independent, and ONE
    distributed TakeOrdered job no matter the corpus size; the pool
    (not the corpus) is what the quadratic-ish D^2 seeding touches.
    Distances use 1 - cosine on normalized vectors (the metric the
    quantizer serves).  Fixed-seed RNG -> reproducible index builds.
    """
    cand = (
        vecs.select("__v", F.xxhash64(F.col(id_col).cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(sample_n)
        .collect()
    )
    X = _normalize(np.stack([np.asarray(r["__v"]) for r in cand]))
    rng = np.random.RandomState(seed)
    first = int(rng.randint(len(X)))
    chosen = [first]
    # squared cosine distance to the nearest chosen seed so far
    d2 = np.square(1.0 - X @ X[first])
    for _ in range(1, min(k_clusters, len(X))):
        total = float(d2.sum())
        if total <= 0.0:  # all candidates identical to a seed
            nxt = int(rng.randint(len(X)))
        else:
            nxt = int(rng.choice(len(X), p=d2 / total))
        chosen.append(nxt)
        d2 = np.minimum(d2, np.square(1.0 - X @ X[nxt]))
    cents = X[chosen]
    if len(cents) < k_clusters:  # degenerate tiny corpus: pad by repeat
        cents = np.vstack([cents] * (k_clusters // len(cents) + 1))[:k_clusters]
    return np.ascontiguousarray(cents, dtype=float)


def build_ivf_index(
    df: DataFrame,
    out_dir: str,
    k_clusters: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 5,
    sample_n: int | None = None,
    seed: int = 2971,
) -> None:
    """Train a k-means coarse quantizer (cosine metric, k-means++
    sampled init, ``n_iter`` Lloyd rounds) and persist:

    - ``{out_dir}/centroids``: k rows (centroid_id, centroid).
    - ``{out_dir}/vectors``: the input plus ``centroid_id``,
      partitioned by it — the inverted file.

    Centroid state is k x dim floats (a few KB) — collecting it to the
    driver between rounds is model state, not data; the k-means++
    candidate pool is ``sample_n`` rows (default 64 per cluster,
    FAISS's train-set heuristic), also bounded driver state."""
    vecs = df.select(id_col, F.col(vec_col).cast("array<double>").alias("__v"))

    cents = _kmeanspp_init(
        vecs, k_clusters, id_col, sample_n or max(64 * k_clusters, 256), seed
    )

    for _ in range(n_iter):
        assigned = vecs.withColumn("__c", _nearest_udf(cents)("__v"))
        # element-wise mean per cluster: posexplode -> (cluster, pos) avg
        new = (
            assigned.select("__c", F.posexplode("__v").alias("__p", "__x"))
            .groupBy("__c", "__p")
            .agg(F.avg("__x").alias("__m"))
            .collect()
        )
        for r in new:
            cents[r["__c"]][r["__p"]] = r["__m"]

    spark = df.sparkSession
    cent_rows = [(i, [float(x) for x in cents[i]]) for i in range(k_clusters)]
    spark.createDataFrame(
        cent_rows, "centroid_id long, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "centroids"))

    assigned = df.withColumn(
        "centroid_id",
        _nearest_udf(cents)(F.col(vec_col).cast("array<double>")),
    )
    (
        assigned.write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(out_dir, "vectors"))
    )
    # Baseline quantization quality for the staleness monitor
    # (ivf_append / ivf_staleness): mean cosine distance of every
    # vector to its assigned centroid — one bounded aggregate.
    # A REBUILD resets the stats log first: rows from the previous
    # era (append distances measured against the OLD centroids, the
    # old build baseline) would otherwise blend into the staleness
    # ratio and keep the retrain flag pinned after the very rebuild
    # it recommended.
    import shutil

    shutil.rmtree(os.path.join(out_dir, "stats"), ignore_errors=True)
    _append_stats(
        spark, out_dir, "build",
        assigned.select(
            id_col,
            "centroid_id",
            F.col(vec_col).cast("array<double>").alias("__v"),
        ),
        cents,
    )


def _assigned_dist_udf(centroids: np.ndarray):
    """cosine distance (1 - sim) of each vector to ITS assigned
    centroid id — vectorized row gather, one matmul per Arrow batch."""
    cn = _normalize(centroids)

    @pandas_udf("double")
    def dist(embs: pd.Series, cids: pd.Series) -> pd.Series:
        m = _normalize(np.stack(embs.to_numpy()))
        c = cn[cids.to_numpy().astype(int)]
        return pd.Series(1.0 - np.einsum("ij,ij->i", m, c))

    return dist


def _append_stats(
    spark: SparkSession, index_dir: str, kind: str, assigned: DataFrame,
    cents: np.ndarray,
) -> dict:
    """Append one (kind, n, mean_assigned_dist) row to the index's
    stats log and return it as a dict.  ``assigned`` must carry
    (__v array<double>, centroid_id)."""
    row = (
        assigned.select(
            _assigned_dist_udf(cents)(F.col("__v"), F.col("centroid_id")).alias("__d")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.avg("__d").alias("mean_dist"))
        .collect()[0]
    )
    stats = {"kind": kind, "n": int(row["n"]), "mean_dist": float(row["mean_dist"] or 0.0)}
    spark.createDataFrame(
        [(kind, stats["n"], stats["mean_dist"])],
        "kind string, n long, mean_dist double",
    ).coalesce(1).write.mode("append").parquet(os.path.join(index_dir, "stats"))
    return stats


def ivf_append(
    spark: SparkSession,
    index_dir: str,
    new_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Incrementally maintain a built IVF index: assign NEW vectors to
    the EXISTING centroids and append them to the inverted file — no
    retrain, no rewrite of prior partitions (parquet append into the
    hive-partitioned layout adds files only under the touched
    centroid_id directories, so search-side partition pruning is
    unchanged).  This is the CDC-fed freshness path: similarity search
    sees new vectors after one append, at assignment cost O(batch),
    not O(corpus).

    Returns the batch's staleness stats (see ``ivf_staleness``): the
    batch's mean assigned-centroid distance is recorded in the stats
    log, so a drifting corpus (new vectors systematically farther from
    every centroid than the training distribution) surfaces as a
    rising ratio and triggers the retrain recommendation.
    """
    cent = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    k = len(cent)
    cents = np.zeros((k, len(cent[0]["centroid"])))
    for r in cent:
        cents[int(r["centroid_id"])] = np.asarray(r["centroid"])
    assigned = new_df.withColumn(
        "centroid_id", _nearest_udf(cents)(F.col(vec_col).cast("array<double>"))
    )
    (
        assigned.write.mode("append")
        .partitionBy("centroid_id")
        .parquet(os.path.join(index_dir, "vectors"))
    )
    batch = _append_stats(
        spark, index_dir, "append",
        assigned.select(
            id_col, "centroid_id",
            F.col(vec_col).cast("array<double>").alias("__v"),
        ),
        cents,
    )
    return ivf_staleness(spark, index_dir) | {"batch": batch}


def ivf_staleness(
    spark: SparkSession, index_dir: str, retrain_ratio: float = 1.5,
    retrain_frac: float = 0.5,
) -> dict:
    """Staleness report from the index's stats log:

    - ``ratio``: appended-mass mean assigned distance / build baseline
      — quantization-quality drift (appends far from every centroid
      mean the coarse quantizer no longer tiles the corpus).
    - ``appended_frac``: appended rows / total — even drift-free
      appends eventually unbalance the inverted lists.
    - ``retrain``: True when either exceeds its threshold — the
      caller's cue to rebuild (build_ivf_index on the full corpus).

    Driver cost: one scan of the few-row stats log.
    """
    rows = spark.read.parquet(os.path.join(index_dir, "stats")).collect()
    base_n = base_d = app_n = app_d = 0.0
    for r in rows:
        if r["kind"] == "build":
            base_n += r["n"]
            base_d += r["n"] * r["mean_dist"]
        else:
            app_n += r["n"]
            app_d += r["n"] * r["mean_dist"]
    baseline = (base_d / base_n) if base_n else 0.0
    appended = (app_d / app_n) if app_n else 0.0
    ratio = (appended / baseline) if (baseline > 0 and app_n) else 1.0
    frac = app_n / (base_n + app_n) if (base_n + app_n) else 0.0
    return {
        "baseline_mean_dist": baseline,
        "appended_mean_dist": appended,
        "ratio": round(ratio, 6),
        "appended_frac": round(frac, 6),
        "retrain": bool(ratio > retrain_ratio or frac > retrain_frac),
    }


def ivf_search(
    spark: SparkSession,
    index_dir: str,
    probe: list[float],
    n_probe: int = 2,
    top_k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by cosine against the probe, scanning ONLY the ``n_probe``
    partitions whose centroids are nearest — the read is directory-
    pruned (assert with ``df.inputFiles()``), so scanned bytes track
    n_probe/k of the corpus, not the corpus."""
    cent = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    cmat = np.stack([np.asarray(r["centroid"]) for r in cent])
    ids = np.array([r["centroid_id"] for r in cent])
    p = _normalize(np.asarray(probe, dtype=float)[None, :])[0]
    sims = _normalize(cmat) @ p
    chosen = [int(i) for i in ids[np.argsort(-sims)][:n_probe]]

    vecs = spark.read.parquet(os.path.join(index_dir, "vectors")).filter(
        F.col("centroid_id").isin(chosen)
    )
    pn = float(np.linalg.norm(probe)) or 1.0

    @pandas_udf("double")
    def cos(embs: pd.Series) -> pd.Series:
        m = np.stack(embs.to_numpy()).astype(float)
        denom = np.linalg.norm(m, axis=1) * pn
        denom[denom == 0.0] = 1.0
        return pd.Series((m @ np.asarray(probe, dtype=float)) / denom)

    return (
        vecs.select(id_col, "centroid_id", cos(F.col(vec_col).cast("array<double>")).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def ivf_knn_join(
    spark: SparkSession,
    index_dir: str,
    probes: DataFrame,
    n_probe: int = 2,
    top_k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """Distributed batched KNN JOIN through the IVF index: top-k
    neighbors for EVERY probe row — the hard-negative-mining /
    near-dup-lookup shape a training pipeline actually runs (N probes,
    not one).

    Plan: the k x dim centroid matrix routes each probe to its
    ``n_probe`` nearest lists (one Arrow batch matmul, then explode);
    probes JOIN the inverted file on ``centroid_id`` — the vectors'
    PARTITION key, so each probe's candidates come from directory-
    pruned reads and the join shuffles candidates, never the corpus;
    cosine scores are one Arrow matmul per batch; a per-probe
    row_number window takes the top-k (deterministic (sim DESC, id)
    tiebreak).  Driver state is the centroid matrix only.

    Candidate volume is sum over probes of their n_probe list sizes —
    n_probe/k of the corpus per probe, the IVF contract.
    """
    from pyspark.sql import Window

    cent = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    order = np.argsort([r["centroid_id"] for r in cent])
    cmat = _normalize(
        np.stack([np.asarray(cent[i]["centroid"]) for i in order])
    )
    cids = np.array([cent[i]["centroid_id"] for i in order])

    @pandas_udf("array<long>")
    def route(embs: pd.Series) -> pd.Series:
        m = _normalize(np.stack(embs.to_numpy()).astype(float))
        sims = m @ cmat.T
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([[int(cids[j]) for j in row] for row in top])

    routed = probes.select(
        F.col(probe_id_col).alias("__pid"),
        F.col(probe_vec_col).cast("array<double>").alias("__pv"),
        F.explode(route(F.col(probe_vec_col).cast("array<double>"))).alias(
            "centroid_id"
        ),
    )
    vecs = spark.read.parquet(os.path.join(index_dir, "vectors")).select(
        id_col, "centroid_id", F.col(vec_col).cast("array<double>").alias("__v")
    )
    cand = routed.join(vecs, "centroid_id")

    @pandas_udf("double")
    def cos2(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(float)
        mb = np.stack(b.to_numpy()).astype(float)
        denom = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        denom[denom == 0.0] = 1.0
        return pd.Series(np.einsum("ij,ij->i", ma, mb) / denom)

    w = Window.partitionBy("__pid").orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        cand.select("__pid", id_col, cos2("__pv", "__v").alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select(
            F.col("__pid").alias(probe_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.round("sim", 6).alias("sim"),
            F.col("rn").alias("rank"),
        )
    )


# ------------------------------------------------ product quantization

def train_pq_codebooks(
    df: DataFrame,
    m_sub: int = 8,
    k_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_n: int = 2000,
    seed: int = 7,
    iters: int = 5,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou, Douze & Schmid,
    "Product quantization for nearest neighbor search", TPAMI 2011):
    split the d-dim space into ``m_sub`` subspaces and k-means each
    one to ``k_codes`` codewords.  Returns (m_sub, k_codes, d/m_sub).

    Same driver-state discipline as the IVF quantizer: training runs
    on a DETERMINISTIC lowest-xxhash64 sample (one TakeOrdered job at
    any corpus size), the resulting model is m*k*(d/m) floats —
    ~1 KB here — and fixed-seed init makes rebuilds bit-reproducible.
    """
    rows = (
        df.select(
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.xxhash64(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy("__h")
        .limit(sample_n)
        .collect()
    )
    X = np.stack([np.asarray(r["__v"]) for r in rows])
    d = X.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    sub = d // m_sub
    rng = np.random.RandomState(seed)
    books = np.empty((m_sub, k_codes, sub))
    for mi in range(m_sub):
        Xm = X[:, mi * sub : (mi + 1) * sub]
        # deterministic init: k distinct sample rows
        idx = rng.permutation(len(Xm))[:k_codes]
        C = Xm[idx].copy()
        for _ in range(iters):
            # squared L2 to each codeword; argmin assignment
            d2 = ((Xm[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for ci in range(k_codes):
                mask = a == ci
                if mask.any():
                    C[ci] = Xm[mask].mean(axis=0)
        books[mi] = C
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, code) with code = ``m_sub`` bytes — a 64-dim float vector
    compresses 32x (256 -> 8 bytes), which is what lets an ANN sweep
    hold billions of vectors in memory at 100 TB corpus scale.
    Arrow-batched numpy argmin per subspace; no per-row Python."""
    m_sub, k_codes, sub = codebooks.shape
    books = np.ascontiguousarray(codebooks)

    @pandas_udf("binary")
    def encode(embs: pd.Series) -> pd.Series:
        M = np.stack(embs.to_numpy()).astype(float)
        n = M.shape[0]
        codes = np.empty((n, m_sub), dtype=np.uint8)
        for mi in range(m_sub):
            Xm = M[:, mi * sub : (mi + 1) * sub]
            C = books[mi]
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
            d2 = -2.0 * (Xm @ C.T) + (C * C).sum(axis=1)[None, :]
            codes[:, mi] = d2.argmin(axis=1)
        return pd.Series(list(codes.tobytes(order="C")[i * m_sub:(i + 1) * m_sub]
                              for i in range(n)))

    return df.select(
        F.col(id_col), encode(F.col(vec_col).cast("array<double>")).alias("code")
    )


def pq_search(
    encoded: DataFrame,
    codebooks: np.ndarray,
    probe: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the probe stays exact, every
    stored vector is its 8-byte code, and per-vector distance is
    ``m_sub`` table lookups into the probe's precomputed (m, k) LUT —
    a ~1 KB broadcast however big the corpus.  Map-side scan +
    TakeOrdered; no shuffle of vectors anywhere."""
    m_sub, k_codes, sub = codebooks.shape
    probe = np.asarray(probe, dtype=float)
    lut = np.empty((m_sub, k_codes))
    for mi in range(m_sub):
        qm = probe[mi * sub : (mi + 1) * sub]
        lut[mi] = ((codebooks[mi] - qm[None, :]) ** 2).sum(axis=1)
    lut_c = np.ascontiguousarray(lut)

    @pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        B = np.frombuffer(b"".join(codes.to_numpy()), dtype=np.uint8).reshape(
            -1, m_sub
        )
        return pd.Series(lut_c[np.arange(m_sub)[None, :], B].sum(axis=1))

    scored = encoded.select(F.col(id_col), adc("code").alias("adc_dist"))
    return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(k)
