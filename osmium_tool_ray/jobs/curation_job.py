"""Resumable corpus-curation job — the `ray job submit` entrypoint for
the normalize -> filter -> dedup -> pack pipeline
(pipelines/curation.py).

    ray job submit -- python -m osmium_tool_ray.jobs.curation_job \\
        --input /root/testdata/sf0.01 --out /tmp/curate_run

Two checkpointed partitions written atomically with input fingerprints
(sources/writers.CheckpointedWriter), so a killed run resumes at the
first incomplete stage:

  part=survivors/  (doc_id, sz)  — normalized, length-filtered,
                                   exact-deduped survivor table
  part=packed/     (doc_id, n_chars_clean, bin, offset)
                                 — fixed-budget sequence packing

The survivor stage shuffles only (id, size, fingerprint); the packing
stage sorts the survivor table (ids + sizes — never text)."""

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
    try:
        h.update(str(os.path.getmtime(
            f"{input_path}/documents.parquet")).encode())
    except OSError:
        pass
    return h.hexdigest()[:16]


def run_job(input_path: str, out_dir: str, min_chars: int = 64,
            budget: int = 8192) -> dict:
    import ray

    if not ray.is_initialized():  # standalone; the driver may own the session
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    from ..pipelines.curation import curate_survivors, pack_survivors
    from ..sources.writers import CheckpointedWriter

    writer = CheckpointedWriter(
        out_dir, run_fingerprint=f"curate-v1-m{min_chars}-b{budget}")
    fp = _input_fp(input_path, f"{min_chars}/{budget}")

    def survivors_factory():
        docs = read_parquet_clean(f"{input_path}/documents.parquet",
                               columns=["doc_id", "text"])
        return curate_survivors(docs, min_chars=min_chars)

    def packed_factory():
        surv = read_parquet_clean(os.path.join(out_dir, "part=survivors"),
                               file_extensions=["parquet"])
        return pack_survivors(surv, budget=budget)

    t0 = time.monotonic()
    r1 = writer.run({"survivors": (survivors_factory, fp)})
    r2 = writer.run({"packed": (packed_factory, fp)})
    metrics = {
        "partitions_written": len(r1["written"]) + len(r2["written"]),
        "partitions_skipped": len(r1["skipped"]) + len(r2["skipped"]),
        "wall_s": round(time.monotonic() - t0, 3),
        "input": input_path,
        "out": out_dir,
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="sf dir with documents.parquet")
    p.add_argument("--out", required=True, help="output run directory")
    p.add_argument("--min-chars", type=int, default=64)
    p.add_argument("--budget", type=int, default=8192)
    args = p.parse_args(argv)
    print(json.dumps(run_job(args.input, args.out,
                             min_chars=args.min_chars,
                             budget=args.budget)))


if __name__ == "__main__":
    main()
