"""tags-filter job — second `ray job submit` entrypoint.

    ray job submit -- python -m osmium_tool_ray.jobs.tags_filter_job \\
        --input /root/testdata/sf0.01 --out /tmp/tf_run \\
        --expressions "n/amenity" "w/highway" [-i] [-R] [-t]

Runs the reference-closure tags-filter over the corpus (captions parsed to
k=v tags via caption_tags) and writes a single checkpointed partition with
manifest + lineage (resumable; the expression list is part of the
fingerprint, so changing it invalidates the output)."""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import time


def run_job(input_path: str, out_dir: str, expressions: list[str],
            invert: bool = False, add_referenced: bool = True,
            remove_tags: bool = False) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    from ..functions.matchers import caption_tags
    from ..pipelines.tags_filter import run_tags_filter
    from ..sources.corpus import images_dataset
    from ..sources.writers import CheckpointedWriter

    fp = hashlib.sha256(json.dumps(
        [input_path, sorted(expressions), invert, add_referenced, remove_tags]
    ).encode()).hexdigest()[:16]
    writer = CheckpointedWriter(out_dir, run_fingerprint="tags-filter-v1")

    def factory():
        ds = images_dataset(input_path)

        def add_tags(batch: pa.Table) -> pa.Table:
            # graft caption->tag convention: explicit k=v tokens in the
            # caption, plus the trailing category word as kind=<word>
            import pyarrow.compute as pc

            caps = batch["caption"].combine_chunks()
            kind = pc.extract_regex(caps, pattern=r"(?P<w>[^ ]+)$").field("w")
            synth = pc.binary_join_element_wise(caps, pa.array(
                [" kind="] * batch.num_rows), kind, "")
            return batch.append_column("tags", caption_tags(synth.combine_chunks()
                                                            if isinstance(synth, pa.ChunkedArray)
                                                            else synth))

        tagged = ds.map_batches(add_tags, batch_format="pyarrow")
        res = run_tags_filter(tagged, expressions, invert=invert,
                              add_referenced=add_referenced,
                              remove_tags=remove_tags)
        return res["images_out"].drop_columns(["tags"])

    t0 = time.monotonic()
    result = writer.run({"matched": (factory, fp)})
    metrics = {"partitions_written": result["written"],
               "partitions_skipped": result["skipped"],
               "wall_s": round(time.monotonic() - t0, 3),
               "expressions": expressions, "out": out_dir}
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--expressions", nargs="+", required=True)
    p.add_argument("-i", "--invert", action="store_true")
    p.add_argument("-R", "--omit-referenced", action="store_true")
    p.add_argument("-t", "--remove-tags", action="store_true")
    args = p.parse_args(argv)
    metrics = run_job(args.input, args.out, args.expressions,
                      invert=args.invert,
                      add_referenced=not args.omit_referenced,
                      remove_tags=args.remove_tags)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
