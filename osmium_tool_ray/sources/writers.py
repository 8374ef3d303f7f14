"""Checkpointed, resumable partitioned output (north-rule requirement:
"streaming with per-partition checkpoints, lineage records, and metrics,
resumable mid-job").

Layout: one directory per partition under the run root, written atomically
(write to `<part>.tmp/`, fsync-free rename to `<part>/`), plus a
`manifest.json` per partition recording the input fingerprint, row count
and wall time, and a run-level `lineage.jsonl` appending one record per
completed partition. On resume, partitions whose manifest exists AND whose
input fingerprint matches are skipped; a stale fingerprint invalidates the
partition so a resumed job never mixes stale outputs (SURVEY.md §7.4).

The reference's only resumable artifacts are renumber's on-disk index and
the locations index (/root/reference/src/command_renumber.cpp:410-423,
command_create_locations_index.cpp:102-141); this generalizes that to every
sink."""

from __future__ import annotations

import json
import os
import shutil
import time


class CheckpointedWriter:
    def __init__(self, out_dir: str, run_fingerprint: str = ""):
        self.out_dir = out_dir
        self.run_fingerprint = run_fingerprint
        os.makedirs(out_dir, exist_ok=True)
        self.lineage_path = os.path.join(out_dir, "lineage.jsonl")

    def _part_dir(self, key: str) -> str:
        return os.path.join(self.out_dir, f"part={key}")

    def _manifest_path(self, key: str) -> str:
        return os.path.join(self._part_dir(key), "manifest.json")

    def is_done(self, key: str, input_fingerprint: str = "") -> bool:
        try:
            with open(self._manifest_path(key)) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return (m.get("input_fingerprint") == input_fingerprint
                and m.get("run_fingerprint") == self.run_fingerprint)

    def write(self, ds, key: str, input_fingerprint: str = "") -> dict:
        """Write one partition atomically; returns its manifest record.
        `ds` is a Ray Dataset (or pyarrow Table)."""
        final = self._part_dir(key)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        t0 = time.monotonic()
        import pyarrow as pa
        import pyarrow.parquet as pq

        if isinstance(ds, pa.Table):
            pq.write_table(ds, os.path.join(tmp, "data.parquet"))
            rows = ds.num_rows
        else:
            ds.write_parquet(tmp)
            rows = sum(pq.read_metadata(os.path.join(tmp, f)).num_rows
                       for f in os.listdir(tmp) if f.endswith(".parquet"))
        manifest = {
            "partition": key,
            "rows": int(rows),
            "wall_s": round(time.monotonic() - t0, 3),
            "input_fingerprint": input_fingerprint,
            "run_fingerprint": self.run_fingerprint,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        with open(self.lineage_path, "a") as f:
            f.write(json.dumps(manifest) + "\n")
        return manifest

    def run(self, partitions: dict[str, tuple], metrics: dict | None = None) -> dict:
        """partitions: key -> (dataset_factory, input_fingerprint). Skips
        completed partitions; returns {"written": [...], "skipped": [...]}."""
        written, skipped = [], []
        for key, (factory, fp) in partitions.items():
            if self.is_done(key, fp):
                skipped.append(key)
                continue
            self.write(factory(), key, fp)
            written.append(key)
        out = {"written": written, "skipped": skipped}
        if metrics is not None:
            metrics.update(out)
        return out
