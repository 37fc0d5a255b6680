"""Incremental IVF maintenance (operators/ann.py ivf_append /
ivf_staleness): the CDC-fed freshness path — new vectors assign to
EXISTING centroids and append into the inverted file; search sees them
immediately; a staleness metric (mean assigned-centroid distance vs
the build baseline) flags when the coarse quantizer no longer tiles
the corpus and a retrain is due."""

from __future__ import annotations

import numpy as np
import pytest

from pgshovel_spark.operators.ann import (
    build_ivf_index,
    ivf_append,
    ivf_search,
    ivf_staleness,
)


def _mk_df(spark, X, ids):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in X[j]]) for j, i in enumerate(ids)],
        "vec_id long, embedding array<double>",
    )


def _recall(spark, idx, X, ids, probes_at, n_probe=4, top_k=10):
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    out = []
    for i in probes_at:
        probe = [float(x) for x in X[i]]
        p = np.asarray(probe)
        p = p / max(np.linalg.norm(p), 1e-12)
        exact = set(np.asarray(ids)[np.argsort(-(Xn @ p), kind="stable")[:top_k]].tolist())
        got = {
            r.vec_id
            for r in ivf_search(spark, idx, probe, n_probe=n_probe, top_k=top_k).collect()
        }
        out.append(len(exact & got) / top_k)
    return sum(out) / len(out)


def test_append_matches_rebuild_recall(spark, tmp_path):
    """Same-distribution appends: an appended index's recall stays
    within tolerance of a full rebuild over the union corpus, and the
    staleness monitor stays quiet (ratio ~ 1)."""
    rng = np.random.RandomState(11)
    centers = rng.randn(6, 24) * 4.0
    base = np.vstack([c + rng.randn(60, 24) for c in centers])
    newv = np.vstack([c + rng.randn(20, 24) for c in centers])
    allv = np.vstack([base, newv])
    all_ids = np.arange(len(allv))

    idx = str(tmp_path / "ivf_inc")
    build_ivf_index(_mk_df(spark, base, all_ids[: len(base)]), idx, k_clusters=6, n_iter=5)
    report = ivf_append(spark, idx, _mk_df(spark, newv, all_ids[len(base):]))
    # appended vectors are immediately searchable
    assert (
        spark.read.parquet(idx + "/vectors").count() == len(allv)
    )

    idx_full = str(tmp_path / "ivf_full")
    build_ivf_index(_mk_df(spark, allv, all_ids), idx_full, k_clusters=6, n_iter=5)

    probes_at = list(range(0, len(allv), 97))
    r_inc = _recall(spark, idx, allv, all_ids, probes_at)
    r_full = _recall(spark, idx_full, allv, all_ids, probes_at)
    assert r_inc >= r_full - 0.1, (r_inc, r_full)
    assert r_inc >= 0.85, r_inc

    # same-distribution appends: quantization quality holds
    assert report["ratio"] < 1.3, report
    assert not report["retrain"], report


def test_drifted_appends_trigger_retrain(spark, tmp_path):
    """Appending vectors from an UNSEEN region (every new vector far
    from every trained centroid) drives the assigned-distance ratio
    over the threshold -> retrain recommended."""
    rng = np.random.RandomState(23)
    centers = rng.randn(4, 16) * 4.0
    base = np.vstack([c + 0.2 * rng.randn(50, 16) for c in centers])
    # orthogonal-ish drifted mass: new tight cluster nowhere near training
    drift_center = rng.randn(16) * 40.0
    drifted = drift_center + 0.2 * rng.randn(60, 16)

    idx = str(tmp_path / "ivf_drift")
    build_ivf_index(_mk_df(spark, base, np.arange(len(base))), idx, k_clusters=4, n_iter=5)
    base_report = ivf_staleness(spark, idx)
    assert not base_report["retrain"]

    report = ivf_append(
        spark, idx, _mk_df(spark, drifted, np.arange(1000, 1000 + len(drifted)))
    )
    assert report["ratio"] > 1.5 or report["appended_frac"] > 0.5, report
    assert report["retrain"], report


def test_append_volume_alone_triggers_retrain(spark, tmp_path):
    """Even drift-free appends recommend a rebuild once the appended
    mass dominates the trained mass (inverted lists unbalance)."""
    rng = np.random.RandomState(5)
    centers = rng.randn(3, 8) * 4.0
    base = np.vstack([c + rng.randn(20, 8) for c in centers])
    more = np.vstack([c + rng.randn(50, 8) for c in centers])
    idx = str(tmp_path / "ivf_vol")
    build_ivf_index(_mk_df(spark, base, np.arange(len(base))), idx, k_clusters=3, n_iter=4)
    report = ivf_append(spark, idx, _mk_df(spark, more, np.arange(500, 500 + len(more))))
    assert report["appended_frac"] > 0.5
    assert report["retrain"]
