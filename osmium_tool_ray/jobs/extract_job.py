"""Resumable multi-region extract job — the `ray job submit` entrypoint.

    ray job submit -- python -m osmium_tool_ray.jobs.extract_job \\
        --config extracts.json --input /root/testdata/sf0.01 --out /tmp/run1

One output partition per extract (part=<output-name>/), written atomically
with a manifest fingerprinting the input + region geometry
(sources/writers.CheckpointedWriter). Re-running the same command skips
completed partitions; changing the input or a region's geometry invalidates
only the affected partitions. A lineage.jsonl + metrics.json record every
completed partition (north-rule: per-partition checkpoints, lineage,
metrics, resumable mid-job).

The per-extract write re-runs the matcher with a single-region filter per
pending extract rather than caching the fan-out — each pass is map-only and
prunes to narrow columns + blobs only at the sink, so re-scan is cheaper
than materializing the full fan-out (the reference re-reads its input per
pass the same way, strategy_*.cpp run())."""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import time


def _fingerprint(input_path: str, region) -> str:
    h = hashlib.sha256()
    h.update(input_path.encode())
    h.update(region.name.encode())
    h.update(region.kind.encode())
    if region.kind == "bbox":
        h.update(json.dumps(region.bbox).encode())
    else:
        for ring in region.rings:
            h.update(ring.tobytes())
    try:
        h.update(str(os.path.getmtime(f"{input_path}/events.parquet")).encode())
    except OSError:
        pass
    return h.hexdigest()[:16]


def run_job(config: str | dict, input_path: str, out_dir: str,
            with_bytes: bool = True, concurrency: int | None = None) -> dict:
    import ray

    if not ray.is_initialized():  # standalone; the driver may own the session
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ..sources.corpus import images_dataset
    from ..sources.writers import CheckpointedWriter
    from ..state.regions import parse_extract_config

    regions = parse_extract_config(config)
    writer = CheckpointedWriter(out_dir, run_fingerprint="extract-v1")

    def make_factory(region):
        def factory():
            import pyarrow as pa
            ds = images_dataset(input_path, with_bytes=with_bytes)

            def f(batch: pa.Table) -> pa.Table:
                m = region.contains(batch["lon"].to_numpy(zero_copy_only=False),
                                    batch["lat"].to_numpy(zero_copy_only=False))
                return batch.filter(pa.array(m))

            return ds.map_batches(f, batch_format="pyarrow")
        return factory

    t0 = time.monotonic()
    partitions = {r.name: (make_factory(r), _fingerprint(input_path, r))
                  for r in regions}
    result = writer.run(partitions)
    metrics = {
        "partitions_written": result["written"],
        "partitions_skipped": result["skipped"],
        "wall_s": round(time.monotonic() - t0, 3),
        "input": input_path,
        "out": out_dir,
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="extract config JSON (file or inline)")
    p.add_argument("--input", required=True, help="sf dir with events.parquet")
    p.add_argument("--out", required=True, help="output run directory")
    p.add_argument("--no-bytes", action="store_true")
    args = p.parse_args(argv)
    metrics = run_job(args.config, args.input, args.out,
                      with_bytes=not args.no_bytes)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
