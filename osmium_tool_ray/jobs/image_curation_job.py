"""Resumable image-curation job — the `ray job submit` entrypoint for
the decode-verify -> content-dedup -> tile-balanced-selection pipeline
(pipelines/curation.curate_images + stages/media.content_dup_images).

    ray job submit -- python -m osmium_tool_ray.jobs.image_curation_job \\
        --input /root/testdata/sf0.01 --out /tmp/imgcurate_run

Two checkpointed partitions written atomically with input fingerprints
(sources/writers.CheckpointedWriter), so a killed run resumes at the
first incomplete stage:

  part=dups/      (image_id, dup_of)   — cross-format exact content
                                          duplicates to drop
  part=selected/  (image_id, cell_x, cell_y, rk)
                                       — per-tile top-k survivors,
                                          duplicates excluded

Blobs stay map-side in both stages (hash + verify run where the bytes
are); only narrow id/cell projections shuffle, and the dup drop is a
Bloom-prefiltered anti-join (idops.semi_join_bloom), never a driver id
list."""

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
            f"{input_path}/events.parquet")).encode())
    except OSError:
        pass
    return h.hexdigest()[:16]


def run_job(input_path: str, out_dir: str, level: int = 6,
            per_tile_k: int = 8) -> dict:
    import ray

    if not ray.is_initialized():  # standalone; the driver may own the session
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ..pipelines.curation import curate_images
    from ..sources.corpus import images_dataset
    from ..sources.writers import CheckpointedWriter

    writer = CheckpointedWriter(
        out_dir, run_fingerprint=f"imgcurate-v1-l{level}-k{per_tile_k}")
    fp = _input_fp(input_path, f"{level}/{per_tile_k}")

    def dups_factory():
        from ..stages.media import content_dup_images

        imgs = images_dataset(input_path, with_bytes=True,
                              columns=["image_id", "bytes"])
        return content_dup_images(imgs)

    def selected_factory():
        from ..pipelines.idops import semi_join_bloom
        from ..sources.readers import read_parquet_clean

        imgs = images_dataset(input_path, with_bytes=True,
                              columns=["image_id", "bytes", "phash",
                                       "lon", "lat"])
        dups = read_parquet_clean(os.path.join(out_dir, "part=dups"),
                                  file_extensions=["parquet"])
        if dups.count():
            imgs = semi_join_bloom(imgs, "image_id",
                                   dups.select_columns(["image_id"]),
                                   "image_id", invert=True)
        return curate_images(imgs, level=level, per_tile_k=per_tile_k)

    t0 = time.monotonic()
    r1 = writer.run({"dups": (dups_factory, fp)})
    r2 = writer.run({"selected": (selected_factory, fp)})
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
                   help="sf dir with events.parquet (image corpus source)")
    p.add_argument("--out", required=True, help="output run directory")
    p.add_argument("--level", type=int, default=6)
    p.add_argument("--per-tile-k", type=int, default=8)
    args = p.parse_args(argv)
    print(json.dumps(run_job(args.input, args.out, level=args.level,
                             per_tile_k=args.per_tile_k)))


if __name__ == "__main__":
    main()
