"""The bench's split-input copy must be a pure LAYOUT change: identical
rows in identical global order for the split tables, symlinks for the rest,
staleness detection via the source fingerprint, and a raw-dir fallback when
the copy cannot be built (a lost bench run is worse than a serial scan)."""

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _read_sorted(path, key):
    t = pq.read_table(path)
    return t.to_pandas().sort_values(key).reset_index(drop=True)


def test_split_copy_preserves_rows_and_order(tmp_path, monkeypatch):
    monkeypatch.setattr(bench.tempfile, "gettempdir", lambda: str(tmp_path))
    out = bench._split_input_dir(SF_DIR, 4)
    assert out != SF_DIR
    docs_dir = os.path.join(out, "documents.parquet")
    parts = sorted(os.listdir(docs_dir))
    assert 1 < len(parts) <= 4
    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    got = pq.ParquetDataset(docs_dir).read()
    # identical rows AND identical global order across ascending file index
    assert got.num_rows == src.num_rows
    assert got.to_pandas().equals(src.to_pandas())
    # non-split tables are symlinks to the originals
    ev = os.path.join(out, "events.parquet")
    assert os.path.islink(ev) and os.path.realpath(ev) == os.path.realpath(
        os.path.join(SF_DIR, "events.parquet")
    )


def test_split_copy_reused_then_rebuilt_on_fingerprint_change(tmp_path, monkeypatch):
    monkeypatch.setattr(bench.tempfile, "gettempdir", lambda: str(tmp_path))
    out = bench._split_input_dir(SF_DIR, 4)
    marker = os.path.join(out, "_SPLIT_OK")
    mtime = os.stat(marker).st_mtime
    assert bench._split_input_dir(SF_DIR, 4) == out
    assert os.stat(marker).st_mtime == mtime  # cache hit, no rebuild
    with open(marker, "w") as f:
        f.write("stale-fingerprint")
    bench._split_input_dir(SF_DIR, 4)
    assert open(marker).read() != "stale-fingerprint"  # rebuilt


def test_split_copy_falls_back_to_raw_dir():
    assert bench._split_input_dir("/nonexistent_dir_xyz", 4) == "/nonexistent_dir_xyz"
