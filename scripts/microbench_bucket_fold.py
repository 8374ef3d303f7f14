"""Round-4 microbench: per-key groupby(key).map_groups vs the
hash-bucket segmented fold (blocks.group_by_key_bucket) at high distinct
key counts — the evidence BASELINE.md cites for the retrofit of
sessionize / asof_join / running_total / track_length / dedup_exact /
curation keep-first / the topk-sample finishers.

Usage: python scripts/microbench_bucket_fold.py [n_keys ...]
Runs dedup_exact-shaped keep-first over n rows with n/2 distinct keys
through BOTH groupings and prints one JSON line per size. The naive
path is capped (it pays ~5 ms Python per distinct key; at 1e6 keys that
is ~an hour) — pass NAIVE_MAX_KEYS to raise."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NAIVE_MAX_KEYS = int(os.environ.get("NAIVE_MAX_KEYS", "60000"))


def make_ds(n_rows: int, n_keys: int):
    import ray.data as rd

    rng = np.random.default_rng(7)
    keys = rng.integers(0, n_keys, n_rows)
    tbl = pa.table({
        "fp": pa.array(keys, type=pa.int64()),
        "doc_id": pa.array(np.arange(n_rows), type=pa.int64()),
        "sz": pa.array(rng.integers(1, 1000, n_rows), type=pa.int64()),
    })
    return rd.from_arrow(tbl).repartition(32).materialize()


def run_bucketed(ds):
    from osmium_tool_ray.pipelines.merge import dedup_exact

    t0 = time.monotonic()
    n = dedup_exact(ds, ["fp"], order_col="doc_id").count()
    return time.monotonic() - t0, n


def run_naive(ds):
    """The pre-round-4 shape: one pandas call per distinct key."""
    import pandas as pd

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("doc_id", kind="stable").head(1)

    t0 = time.monotonic()
    n = ds.groupby(["fp"]).map_groups(pick, batch_format="pandas").count()
    return time.monotonic() - t0, n


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 200_000, 2_000_000]
    for n_keys in sizes:
        ds = make_ds(n_keys * 2, n_keys)
        wall_b, n_b = run_bucketed(ds)
        rec = {"n_rows": n_keys * 2, "n_distinct_keys_approx": n_keys,
               "bucketed_s": round(wall_b, 2), "survivors": n_b}
        if n_keys <= NAIVE_MAX_KEYS:
            wall_n, n_n = run_naive(ds)
            assert n_n == n_b
            rec["per_key_map_groups_s"] = round(wall_n, 2)
            rec["speedup"] = round(wall_n / wall_b, 1)
        else:
            rec["per_key_map_groups_s"] = \
                f"skipped (>{NAIVE_MAX_KEYS} keys; ~5 ms/key projected)"
        print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
