"""Small-files compaction job (jobs/compact_job.py): fragmented input
rewritten to target-sized files, rows preserved exactly, resume skips,
changed input re-runs."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def fragmented(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("frag"))
    rng = np.random.default_rng(31)
    for i in range(20):                           # 20 tiny files
        tbl = pa.table({
            "id": pa.array(np.arange(i * 100, (i + 1) * 100,
                                     dtype=np.int64)),
            "v": pa.array(rng.integers(0, 1000, 100), type=pa.int64()),
        })
        pq.write_table(tbl, os.path.join(d, f"f{i:03d}.parquet"))
    return d


def test_compact_preserves_rows(ray_session, fragmented, tmp_path_factory):
    from osmium_tool_ray.jobs.compact_job import run_job

    out = str(tmp_path_factory.mktemp("compact_run"))
    m = run_job(fragmented, out, target_rows=1000)
    assert m["input_files"] == 20 and m["rows"] == 2000
    assert m["output_files"] <= 4                 # 2000 rows / 1000 target
    part = os.path.join(out, "part=data")
    got = pa.concat_tables([
        pq.read_table(os.path.join(part, f))
        for f in os.listdir(part) if f.endswith(".parquet")])
    assert got.num_rows == 2000
    assert sorted(got["id"].to_pylist()) == list(range(2000))

    # resume: same input -> skip
    m2 = run_job(fragmented, out, target_rows=1000)
    assert m2["partitions_skipped"] == 1 and m2["partitions_written"] == 0

    # changed input -> fingerprint differs -> rewrite
    extra = pa.table({"id": pa.array([9999], type=pa.int64()),
                      "v": pa.array([1], type=pa.int64())})
    pq.write_table(extra, os.path.join(fragmented, "f999.parquet"))
    m3 = run_job(fragmented, out, target_rows=1000)
    assert m3["partitions_written"] == 1
    assert m3["rows"] == 2001
