"""Input-sized shuffle-partition policy for the scale sweeps
(VERDICT r11 item 6). The r11 100× GANN sweep read the graph family
~2× above linear purely because `spark.sql.shuffle.partitions` stayed
at the fixed default 32 while the data grew 100×; NOTES_r11 §5 proved
by experiment that 128 partitions restores linearity. The sweep now
sizes the ceiling from the input bytes — these tests pin the sizing
function itself (pure, no Spark)."""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "scale_sweep_mod", os.path.join(REPO, "tools", "scale_sweep.py")
)
scale_sweep = importlib.util.module_from_spec(spec)
spec.loader.exec_module(scale_sweep)


def _mkfile(path, nbytes):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.truncate(nbytes)


def test_small_input_stays_at_floor(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_PARTITIONS", raising=False)
    _mkfile(str(tmp_path / "events.parquet"), 10 * 1024 * 1024)
    assert scale_sweep.sized_shuffle_partitions(str(tmp_path)) == 32


def test_gann100_scale_sizes_to_about_128(tmp_path, monkeypatch):
    """1.6 GB (the r11 100× GANN replica) must land near the 128 the
    §5 experiment proved linear — inside [96, 160], not at the floor."""
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_PARTITIONS", raising=False)
    # Spark-written table layout: directory of part files
    for i in range(4):
        _mkfile(
            str(tmp_path / "embeddings.parquet" / f"part-{i:05d}.parquet"),
            400 * 1024 * 1024,
        )
    got = scale_sweep.sized_shuffle_partitions(str(tmp_path))
    assert 96 <= got <= 160, got


def test_huge_input_clamps_to_ceiling(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_PARTITIONS", raising=False)
    _mkfile(str(tmp_path / "big.parquet"), 20 * 1024 * 1024 * 1024)
    assert scale_sweep.sized_shuffle_partitions(str(tmp_path)) == 1024


def test_env_override_wins(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_PARTITIONS", "77")
    _mkfile(str(tmp_path / "x.parquet"), 1)
    assert scale_sweep.sized_shuffle_partitions(str(tmp_path)) == 77


def test_hidden_and_marker_files_ignored(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_PARTITIONS", raising=False)
    _mkfile(str(tmp_path / "t.parquet" / "_SUCCESS"), 500 * 1024 * 1024)
    _mkfile(str(tmp_path / "t.parquet" / ".crc"), 500 * 1024 * 1024)
    assert scale_sweep.sized_shuffle_partitions(str(tmp_path)) == 32
