"""Small-files compaction job — rewrite a fragmented parquet directory
into target-sized files (the table-maintenance pass every long-running
ingest needs; the reference's closest relative is `cat` used to rewrite
a file, /root/reference/src/command_cat.cpp:156-235).

    ray job submit -- python -m osmium_tool_ray.jobs.compact_job \\
        --input /path/fragmented --out /tmp/compacted --target-rows 500000

One streaming read -> repartition(target_num_blocks) -> checkpointed
atomic write (skip-if-done on re-run, manifest carries row counts and
the input fingerprint). Row content is untouched; only the file layout
changes. The repartition is the one data movement and it is the point
of the job."""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import time


def _input_fp(input_path: str) -> str:
    """Fingerprint = the sorted (name, size, mtime) of the input files —
    a changed input invalidates the checkpoint."""
    h = hashlib.sha256()
    for name in sorted(os.listdir(input_path)):
        if not name.endswith(".parquet"):
            continue
        st = os.stat(os.path.join(input_path, name))
        h.update(f"{name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def run_job(input_path: str, out_dir: str,
            target_rows: int = 500_000) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    from ..sources.writers import CheckpointedWriter

    files = [os.path.join(input_path, f)
             for f in sorted(os.listdir(input_path))
             if f.endswith(".parquet")]
    total_rows = sum(pq.read_metadata(f).num_rows for f in files)
    n_blocks = max(1, -(-total_rows // target_rows))

    writer = CheckpointedWriter(out_dir,
                                run_fingerprint=f"compact-v1-t{target_rows}")
    fp = _input_fp(input_path)

    def factory():
        return read_parquet_clean(files).repartition(n_blocks)

    t0 = time.monotonic()
    res = writer.run({"data": (factory, fp)})
    out_part = os.path.join(out_dir, "part=data")
    out_files = [f for f in os.listdir(out_part) if f.endswith(".parquet")]
    metrics = {
        "input_files": len(files),
        "output_files": len(out_files),
        "rows": int(total_rows),
        "partitions_written": len(res["written"]),
        "partitions_skipped": len(res["skipped"]),
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
                   help="directory of parquet files to compact")
    p.add_argument("--out", required=True, help="output run directory")
    p.add_argument("--target-rows", type=int, default=500_000)
    args = p.parse_args(argv)
    print(json.dumps(run_job(args.input, args.out,
                             target_rows=args.target_rows)))


if __name__ == "__main__":
    main()
