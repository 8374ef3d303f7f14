"""Resumable nightly-reporting job — the `ray job submit` entrypoint
for the analytics/audit report pack (the reference's batch-CLI shape,
/root/reference/src/command_fileinfo.cpp's run-and-emit discipline,
generalized to a multi-report DAG).

    ray job submit -- python -m osmium_tool_ray.jobs.report_job \\
        --input /root/testdata/sf0.01 --out /tmp/report_run

Each report is one checkpointed partition written atomically with an
input fingerprint (sources/writers.CheckpointedWriter), so a killed run
resumes at the first incomplete report and a re-run over unchanged
inputs skips everything:

  part=pricing/        TPC-H Q1 pricing summary
  part=late_orders/    Q4-shaped late-order priority counts
  part=promo_monthly/  Q14 monthly promo revenue trend
  part=dq/             data-quality expectations violations
  part=fk/             referential-integrity orphan audit
  part=reconciliation/ header-vs-lines ledger audit
  part=freshness/      per-type staleness audit

Every report is a bounded aggregate — the job's output is dashboards,
not data, so partitions are tiny no matter the input scale."""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import time


def _input_fp(input_path: str, tag: str) -> str:
    h = hashlib.sha256()
    h.update(input_path.encode())
    h.update(tag.encode())
    for t in ("lineitem", "orders", "events"):
        try:
            h.update(str(os.path.getmtime(
                f"{input_path}/{t}.parquet")).encode())
        except OSError:
            pass
    return h.hexdigest()[:16]


def run_job(input_path: str, out_dir: str) -> dict:
    import ray

    if not ray.is_initialized():  # standalone; the driver may own it
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    import __ray_entry__ as E

    from ..sources.writers import CheckpointedWriter

    qs = E.queries()
    reports = {
        "pricing": "pricing_summary",
        "late_orders": "late_order_priority",
        "promo_monthly": "promo_trend_monthly",
        "dq": "dq_expectations",
        "fk": "fk_integrity_audit",
        "reconciliation": "order_reconciliation",
        "freshness": "freshness_by_type",
    }
    writer = CheckpointedWriter(out_dir, run_fingerprint="report-v1")
    fp = _input_fp(input_path, "report-v1")

    t0 = time.monotonic()
    written = skipped = 0
    for part, qname in reports.items():
        def factory(_q=qname):
            return qs[_q](input_path)

        r = writer.run({part: (factory, fp)})
        written += len(r["written"])
        skipped += len(r["skipped"])
    metrics = {
        "partitions_written": written,
        "partitions_skipped": skipped,
        "n_reports": len(reports),
        "wall_s": round(time.monotonic() - t0, 3),
        "input": input_path,
        "out": out_dir,
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="sf dir")
    p.add_argument("--out", required=True, help="output run directory")
    args = p.parse_args(argv)
    print(json.dumps(run_job(args.input, args.out)))


if __name__ == "__main__":
    main()
