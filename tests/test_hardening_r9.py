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
