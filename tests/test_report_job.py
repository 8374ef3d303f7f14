"""Resumable report job (jobs/report_job.py): seven audit/analytics
partitions, resume skips everything, outputs match the one-shot
queries."""

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
    from osmium_tool_ray.jobs.report_job import run_job

    out = str(tmp_path_factory.mktemp("report_run"))
    metrics = run_job(SF, out)
    return out, metrics


def test_job_writes_all_reports(job_run):
    out, metrics = job_run
    assert metrics["partitions_written"] == 7
    assert metrics["partitions_skipped"] == 0
    for part in ("pricing", "late_orders", "promo_monthly", "dq",
                 "fk", "reconciliation", "freshness"):
        assert os.path.isdir(os.path.join(out, f"part={part}")), part


def test_resume_skips_everything(job_run):
    from osmium_tool_ray.jobs.report_job import run_job

    out, _ = job_run
    m2 = run_job(SF, out)
    assert m2["partitions_skipped"] == 7
    assert m2["partitions_written"] == 0


def test_reports_match_one_shot(job_run, ray_session):
    import __ray_entry__ as E

    out, _ = job_run
    fk = _read_part(out, "fk")
    want = {r["edge"]: (r["n_rows"], r["n_orphans"])
            for r in E.queries()["fk_integrity_audit"](SF).take_all()}
    got = {fk["edge"][i].as_py(): (fk["n_rows"][i].as_py(),
                                   fk["n_orphans"][i].as_py())
           for i in range(fk.num_rows)}
    assert got == want
    dq = _read_part(out, "dq")
    assert dq.num_rows == 4
    fresh = _read_part(out, "freshness")
    assert fresh.num_rows == 5
