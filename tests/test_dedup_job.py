"""End-to-end resumable dedup job (jobs/dedup_job.py): staged
pairs -> clusters -> survivors partitions, resume skips completed
stages, and survivor semantics (exactly one representative per dup
cluster; non-duplicates untouched)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _read_part(out, name):
    d = os.path.join(out, f"part={name}")
    return pa.concat_tables([pq.read_table(os.path.join(d, f))
                             for f in os.listdir(d) if f.endswith(".parquet")])

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def job_run(ray_session, tmp_path_factory):
    from osmium_tool_ray.jobs.dedup_job import run_job

    out = str(tmp_path_factory.mktemp("dedup_run"))
    metrics = run_job(SF, out)
    return out, metrics


def test_job_writes_all_stages(job_run):
    out, metrics = job_run
    assert metrics["partitions_written"] == 3
    for part in ("pairs", "clusters", "survivors"):
        assert os.path.isdir(os.path.join(out, f"part={part}")), part
    assert os.path.exists(os.path.join(out, "metrics.json"))


def test_survivor_semantics(job_run):
    out, _ = job_run
    clusters = _read_part(out, "clusters")
    survivors = _read_part(out, "survivors")
    surv = set(survivors["image_id"].to_pylist())
    reps = set(clusters["rep"].to_pylist())
    members = set(clusters["image_id"].to_pylist())
    # every representative survives; every non-rep dup member is dropped
    assert reps <= surv
    assert not (members - reps) & surv
    # corpus minus dropped == survivors
    from osmium_tool_ray.sources.corpus import images_dataset

    total = images_dataset(SF, columns=["image_id"]).count()
    assert len(surv) == total - len(members - reps)


def test_no_driver_id_materialization():
    # the survivors stage must anti-join as a Dataset (Bloom prefilter +
    # bucketed exact), never fold the drop-id list onto the driver — at
    # 100 TB the drop set is billions of ids (VERDICT r02 item #2)
    import inspect

    from osmium_tool_ray.jobs import dedup_job

    src = inspect.getsource(dedup_job)
    assert "take_all" not in src
    assert "semi_join_bloom" in src


def test_resume_skips_done(job_run):
    from osmium_tool_ray.jobs.dedup_job import run_job

    out, _ = job_run
    metrics = run_job(SF, out)
    assert metrics["partitions_written"] == 0
    assert metrics["partitions_skipped"] == 3
