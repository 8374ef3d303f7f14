import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osmium_tool_ray.sources.writers import CheckpointedWriter
from osmium_tool_ray.stages.tiles import assign_tiles_salted, cell_counts


@pytest.fixture(scope="module")
def skewed(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(21)
    n = 5000
    # ~40% of rows in one hot spot, rest uniform
    hot = rng.random(n) < 0.4
    lon = np.where(hot, 10.001 + rng.random(n) * 0.01, rng.uniform(-170, 170, n))
    lat = np.where(hot, 45.001 + rng.random(n) * 0.01, rng.uniform(-80, 80, n))
    return rd.from_items([{"image_id": f"i{i}", "lon": float(lon[i]),
                           "lat": float(lat[i]), "value": 1.0} for i in range(n)])


def test_cell_counts(skewed):
    out = cell_counts(skewed, level=6).take_all()
    total = sum(r["n_images"] for r in out)
    assert total == 5000
    assert max(r["n_images"] for r in out) >= 1900  # the hot cell


def test_salted_assignment_matches_unsalted(skewed):
    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cell": [g["cell"].iloc[0]], "salt": [g["salt"].iloc[0]],
                             "n": [len(g)], "vsum": [g["value"].sum()]})

    out = assign_tiles_salted(skewed, level=6, agg_fn=agg, hot_threshold=500,
                              salts=8).take_all()
    got = {int(r["cell"]): (int(r["n"]), r["vsum"]) for r in out}
    # compare against the plain per-cell counts
    plain = {int(r["cell"]): int(r["n_images"])
             for r in cell_counts(skewed, level=6).take_all()}
    assert {c: v[0] for c, v in got.items()} == plain
    assert sum(v[0] for v in got.values()) == 5000


def test_checkpointed_writer_resume(tmp_path):
    w = CheckpointedWriter(str(tmp_path / "run"), run_fingerprint="fp1")
    t1 = pa.table({"a": [1, 2, 3]})
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return t1

    r1 = w.run({"k1": (factory, "in1"), "k2": (factory, "in2")})
    assert r1["written"] == ["k1", "k2"] and calls["n"] == 2
    # resume: both skipped, factories not called again
    r2 = w.run({"k1": (factory, "in1"), "k2": (factory, "in2")})
    assert r2["skipped"] == ["k1", "k2"] and calls["n"] == 2
    # changed input fingerprint invalidates k2 only
    r3 = w.run({"k1": (factory, "in1"), "k2": (factory, "in2-changed")})
    assert r3["written"] == ["k2"] and r3["skipped"] == ["k1"]
    # lineage records appended per completed partition
    lines = [json.loads(l) for l in open(w.lineage_path)]
    assert len(lines) == 3
    assert all(l["rows"] == 3 for l in lines)
    # partition dir is final (no .tmp left behind)
    assert os.path.isdir(tmp_path / "run" / "part=k1")
    assert not any(d.endswith(".tmp") for d in os.listdir(tmp_path / "run"))


def test_writer_cleans_stale_tmp(tmp_path):
    """A crash mid-write leaves part=<k>.tmp behind; the next run must
    discard it and write a fresh atomic partition."""
    import pyarrow as pa

    w = CheckpointedWriter(str(tmp_path / "r2"), run_fingerprint="fp")
    stale = tmp_path / "r2" / "part=k.tmp"
    stale.mkdir(parents=True)
    (stale / "garbage.parquet").write_bytes(b"not parquet")
    assert not w.is_done("k", "in")
    w.write(pa.table({"a": [1]}), "k", "in")
    assert w.is_done("k", "in")
    assert not stale.exists()
    import pyarrow.parquet as pq
    assert pq.read_table(tmp_path / "r2" / "part=k" / "data.parquet").num_rows == 1
