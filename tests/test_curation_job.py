"""Resumable curation job (jobs/curation_job.py): staged
survivors -> packed partitions, resume skips completed stages, output
matches the one-shot curate_docs pipeline."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _read_part(out, name):
    d = os.path.join(out, f"part={name}")
    return pa.concat_tables([pq.read_table(os.path.join(d, f))
                             for f in os.listdir(d)
                             if f.endswith(".parquet")])


@pytest.fixture(scope="module")
def job_run(ray_session, tmp_path_factory):
    from osmium_tool_ray.jobs.curation_job import run_job

    out = str(tmp_path_factory.mktemp("curate_run"))
    metrics = run_job(SF, out)
    return out, metrics


def test_job_writes_both_stages(job_run):
    out, metrics = job_run
    assert metrics["partitions_written"] == 2
    for part in ("survivors", "packed"):
        assert os.path.isdir(os.path.join(out, f"part={part}")), part


def test_packed_matches_one_shot(job_run, ray_session):
    import ray.data as rd

    from osmium_tool_ray.pipelines.curation import curate_docs

    out, _ = job_run
    packed = _read_part(out, "packed")
    mine = {
        packed["doc_id"][i].as_py(): (packed["n_chars_clean"][i].as_py(),
                                      packed["bin"][i].as_py(),
                                      packed["offset"][i].as_py())
        for i in range(packed.num_rows)}
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    exp = {r["doc_id"]: (r["n_chars_clean"], r["bin"], r["offset"])
           for r in curate_docs(docs).take_all()}
    assert mine == exp


def test_resume_skips_done(job_run):
    from osmium_tool_ray.jobs.curation_job import run_job

    out, _ = job_run
    metrics2 = run_job(SF, out)          # same input, same out dir
    assert metrics2["partitions_written"] == 0
    assert metrics2["partitions_skipped"] == 2
