"""Round-9 hardening regressions (ADVICE r8): NULL-safe literal maps,
catalog lookups with descriptive misses, directory-layout rowcounts,
and the PNG decoder's declared ValueError contract."""

from __future__ import annotations

import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pgshovel_spark.operators.multimodal import decode_png_gray
from pgshovel_spark.sources.tables import nations_in_region, table_rowcount


def _png(w=2, h=2, ihdr_len=13, idat=None):
    ihdr_data = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)[:ihdr_len]
    raw = b"".join(b"\x00" + bytes([i] * w) for i in range(h))
    idat_data = zlib.compress(raw) if idat is None else idat

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + b"\x00\x00\x00\x00"

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr_data)
        + chunk(b"IDAT", idat_data)
        + chunk(b"IEND", b"")
    )


class TestPngContract:
    def test_valid_png_roundtrips(self):
        w, h, rows = decode_png_gray(_png())
        assert (w, h) == (2, 2) and rows == [[0, 0], [1, 1]]

    def test_truncated_ihdr_is_valueerror(self):
        with pytest.raises(ValueError, match="IHDR"):
            decode_png_gray(_png(ihdr_len=9))

    def test_empty_idat_is_valueerror(self):
        with pytest.raises(ValueError, match="IDAT"):
            decode_png_gray(_png(idat=b""))

    def test_corrupt_idat_is_valueerror(self):
        with pytest.raises(ValueError, match="IDAT"):
            decode_png_gray(_png(idat=b"\xff\xfenot-zlib"))


class TestCatalogLookups:
    def test_unknown_region_raises_descriptive(self, spark, sf_dir):
        with pytest.raises(ValueError, match="NO_SUCH_REGION"):
            nations_in_region(spark, sf_dir, "NO_SUCH_REGION")

    def test_known_region_still_works(self, spark, sf_dir):
        keys = nations_in_region(spark, sf_dir, "ASIA")
        assert keys and all(isinstance(k, int) for k in keys)


class TestRowcount:
    def test_directory_layout_sums_footers(self, tmp_path):
        d = tmp_path / "orders.parquet"
        d.mkdir()
        t1 = pa.table({"o_orderkey": list(range(7))})
        t2 = pa.table({"o_orderkey": list(range(5))})
        pq.write_table(t1, d / "part-0.parquet")
        pq.write_table(t2, d / "part-1.parquet")
        assert table_rowcount(str(tmp_path), "orders") == 12

    def test_regenerated_file_invalidates_cache(self, tmp_path):
        p = tmp_path / "orders.parquet"
        pq.write_table(pa.table({"o_orderkey": [1, 2, 3]}), p)
        assert table_rowcount(str(tmp_path), "orders") == 3
        pq.write_table(pa.table({"o_orderkey": [1, 2, 3, 4]}), p)
        # force a different mtime stamp even on coarse filesystems
        st = os.stat(p)
        os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
        assert table_rowcount(str(tmp_path), "orders") == 4


class TestMadOutliersNulls:
    def test_null_event_type_and_all_null_group_dropped(self, spark, tmp_path):
        """A NULL event_type row and an all-NULL value group must be
        silently dropped (the old broadcast-join semantics), not crash
        the driver-side literal-map construction."""
        from pgshovel_spark.queries.aggregates import q_agg_mad_outliers

        vals = [float(v) for v in range(1, 11)] + [1000.0]
        types = ["alpha"] * 11
        ids = list(range(1, 12))
        # NULL event_type row + a group whose values are all NULL
        types += [None, "ghost", "ghost"]
        vals += [5.0, None, None]
        ids += [100, 101, 102]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "event_type": pa.array(types, pa.string()),
                    "value": pa.array(vals, pa.float64()),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = q_agg_mad_outliers(spark, str(tmp_path)).collect()
        got = {r["event_id"] for r in out}
        assert 1000 not in got  # sanity: ids are small
        assert got == {11}  # the 1000.0 outlier; NULL rows dropped


class TestDedupSubstring:
    """q_dedup_substring construction checks: the window-hash +
    diagonal-islands form must equal the literal longest-shared-token-
    run definition (O(n*m) DP) on synthetic corpora."""

    @staticmethod
    def _run(spark, docs):
        """docs: list of (doc_id, lang, text)."""
        import pgshovel_spark.queries.curation as cur
        from pgshovel_spark.sources import tables as tbl

        df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
        orig = tbl._DF_CACHE.copy()
        key = (spark.sparkContext.applicationId, "__substr__", "documents")
        tbl._DF_CACHE[key] = df
        try:
            return {
                (r.doc_a, r.doc_b): (r.max_run, r.n_windows)
                for r in cur.q_dedup_substring(spark, "__substr__").collect()
            }
        finally:
            tbl._DF_CACHE.clear()
            tbl._DF_CACHE.update(orig)

    @staticmethod
    def _brute(docs, k=25):
        toks = {i: t.lower().split() for i, _l, t in docs}
        lang = {i: l for i, l, _t in docs}
        out = {}
        ids = sorted(toks)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                if lang[a] != lang[b]:
                    continue
                ta, tb = toks[a], toks[b]
                # longest common token run (DP) + count of matching k-windows
                best, nw = 0, 0
                dp = [[0] * (len(tb) + 1) for _ in range(len(ta) + 1)]
                for i in range(1, len(ta) + 1):
                    for j in range(1, len(tb) + 1):
                        if ta[i - 1] == tb[j - 1]:
                            dp[i][j] = dp[i - 1][j - 1] + 1
                            best = max(best, dp[i][j])
                for i in range(len(ta) - k + 1):
                    for j in range(len(tb) - k + 1):
                        if ta[i : i + k] == tb[j : j + k]:
                            nw += 1
                if best >= k:
                    out[(a, b)] = (best, nw)
        return out

    def test_planted_run(self, spark):
        import random

        rng = random.Random(7)
        filler = lambda n: " ".join(f"w{rng.randrange(10**6)}" for _ in range(n))
        shared40 = " ".join(f"s{j}" for j in range(40))
        shared24 = " ".join(f"t{j}" for j in range(24))
        docs = [
            (1, "en", filler(30) + " " + shared40 + " " + filler(20)),
            (2, "en", shared40 + " " + filler(50)),
            (3, "en", filler(25) + " " + shared24),   # below K: no pair
            (4, "en", shared24 + " " + filler(25)),
            (5, "de", filler(10) + " " + shared40),   # other lang: no pair
        ]
        got = self._run(spark, docs)
        assert got == {(1, 2): (40, 16)}  # 40-24+1 = 16 windows

    def test_random_matches_brute_force(self, spark):
        import random

        rng = random.Random(42)
        vocab = [f"v{j}" for j in range(12)]  # tiny vocab -> chance runs
        base = [rng.choice(vocab) for _ in range(60)]
        docs = []
        for i in range(8):
            t = list(base)
            # mutate: splice in noise + a copied slab from base
            for _ in range(rng.randrange(6)):
                t[rng.randrange(len(t))] = rng.choice(vocab)
            off = rng.randrange(20)
            docs.append((i, "en", " ".join(t[off : off + 45])))
        got = self._run(spark, docs)
        want = self._brute(docs)
        assert got == want

    def test_repeated_gram_within_doc(self, spark):
        """A gram repeated inside one doc must pair at every position
        (two diagonals, no intra-doc pair)."""
        blk = " ".join(f"r{j}" for j in range(25))
        pad1 = " ".join(f"x{j}" for j in range(5))
        docs = [
            (1, "en", blk + " " + pad1 + " " + blk),  # block twice
            (2, "en", blk),
        ]
        got = self._run(spark, docs)
        want = self._brute(docs)
        assert got == want
        assert got[(1, 2)] == (25, 2)


class TestSemanticClusterCap:
    """q_dedup_semantic's tiled gram: a label larger than _CLUSTER_CAP
    must produce bit-identical output to the single-gram brute force —
    the cap bounds memory, never changes a compared value."""

    def test_over_cap_label_matches_brute_force(self, spark, monkeypatch):
        import uuid

        import numpy as np

        import pgshovel_spark.queries.similarity as sim
        from pgshovel_spark.sources import tables as tbl

        rng = np.random.default_rng(11)
        rows = []
        for label in (0, 1):
            for i in range(10):  # 10 >> cap of 3: forces 4x4 tiling
                emb = rng.normal(size=8)
                if i % 3 == 0:  # plant near-dups: shared direction
                    emb = emb * 0.05 + np.arange(8) * (1 + label)
                rows.append((label, label * 100 + i, [float(x) for x in emb]))
        # one all-zero vector: the zero-norm guard must hold per tile
        rows.append((0, 99, [0.0] * 8))
        df = spark.createDataFrame(
            rows, "label long, vec_id long, embedding array<double>"
        )
        fake = f"__semcap_{uuid.uuid4().hex[:8]}__"
        key = (spark.sparkContext.applicationId, fake, "embeddings")
        orig = tbl._DF_CACHE.copy()
        tbl._DF_CACHE[key] = df
        monkeypatch.setattr(sim, "_CLUSTER_CAP", 3)
        try:
            got = {
                r.vec_id: (r.csim, r.n_neighbors, r.is_pruned)
                for r in sim.q_dedup_semantic(spark, fake).collect()
            }
        finally:
            tbl._DF_CACHE.clear()
            tbl._DF_CACHE.update(orig)

        # brute force: full gram per label, same rounded-3dp rule
        by_label = {}
        for label, vid, emb in rows:
            by_label.setdefault(label, []).append((vid, np.array(emb)))
        want = {}
        for label, members in by_label.items():
            ids = np.array([v for v, _ in members])
            m = np.stack([e for _, e in members])
            cent = m.mean(axis=0)
            norms = np.sqrt((m * m).sum(axis=1))
            safe = np.where(norms == 0, 1.0, norms)
            cn = np.sqrt((cent * cent).sum()) or 1.0
            cs = np.round((m @ cent) / (safe * cn), 3) + 0.0
            cs[norms == 0] = np.round(0.0, 3)
            sims = np.round((m @ m.T) / np.outer(safe, safe), 3) + 0.0
            np.fill_diagonal(sims, -2.0)
            sims[norms == 0, :] = -2.0
            sims[:, norms == 0] = -2.0
            neigh = sims >= sim._SEMDEDUP_THETA
            dom = (cs[None, :] < cs[:, None]) | (
                (cs[None, :] == cs[:, None]) & (ids[None, :] < ids[:, None])
            )
            for i, vid in enumerate(ids):
                want[int(vid)] = (
                    float(cs[i]),
                    int(neigh[i].sum()),
                    int((neigh[i] & dom[i]).any()),
                )
        assert set(got) == set(want)
        for vid in want:
            # csim comes through the JVM cosine path; compare the
            # neighbor/prune decisions exactly and csim to 3dp
            assert got[vid][1:] == want[vid][1:], (vid, got[vid], want[vid])
        # sanity: the tiling actually ran multi-tile and pruned something
        assert any(v[2] for v in got.values())
