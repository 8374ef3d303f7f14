"""Resumable image-curation job (jobs/image_curation_job.py):
dups -> selected partitions, resume skips completed stages, dup ids
never survive into the selection."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _read_part(out, name):
    d = os.path.join(out, f"part={name}")
    tbls = [pq.read_table(os.path.join(d, f)) for f in os.listdir(d)
            if f.endswith(".parquet")]
    return pa.concat_tables(tbls) if tbls else None


@pytest.fixture(scope="module")
def job_run(ray_session, tmp_path_factory):
    from osmium_tool_ray.jobs.image_curation_job import run_job

    out = str(tmp_path_factory.mktemp("imgcurate_run"))
    metrics = run_job(SF, out, level=4, per_tile_k=5)
    return out, metrics


def test_job_writes_both_stages(job_run):
    out, metrics = job_run
    assert metrics["partitions_written"] == 2
    for part in ("dups", "selected"):
        assert os.path.isdir(os.path.join(out, f"part={part}")), part


def test_selected_matches_one_shot(job_run, ray_session):
    from osmium_tool_ray.pipelines.curation import curate_images
    from osmium_tool_ray.sources.corpus import images_dataset

    out, _ = job_run
    sel = _read_part(out, "selected")
    got = sorted((sel["image_id"][i].as_py(), sel["cell_x"][i].as_py(),
                  sel["cell_y"][i].as_py(), sel["rk"][i].as_py())
                 for i in range(sel.num_rows))
    # the synthetic corpus has no content dups, so one-shot == job
    dups = _read_part(out, "dups")
    assert dups is None or dups.num_rows == 0
    imgs = images_dataset(SF, with_bytes=True,
                          columns=["image_id", "bytes", "phash",
                                   "lon", "lat"])
    ref = curate_images(imgs, level=4, per_tile_k=5)
    want = sorted((r["image_id"], r["cell_x"], r["cell_y"], r["rk"])
                  for r in ref.take_all())
    assert got == want


def test_resume_skips_completed(job_run):
    from osmium_tool_ray.jobs.image_curation_job import run_job

    out, _ = job_run
    metrics2 = run_job(SF, out, level=4, per_tile_k=5)
    assert metrics2["partitions_written"] == 0
    assert metrics2["partitions_skipped"] == 2
