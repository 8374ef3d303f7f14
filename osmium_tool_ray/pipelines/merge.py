"""Merge / sort / dedup / version-window operators.

Reference semantics re-expressed as Ray Data shuffles (SURVEY.md §2.4-2.6):

  * merge: k-way merge of sorted inputs, equal (type,id,version) objects
    emitted once (/root/reference/src/command_merge.cpp:256-275 queue loop,
    :260 dedup). Ray: union + groupby(key).first — a sort-based shuffle
    replaces the priority queue.
  * merge-changes --simplify: keep only the last version of each object
    (/root/reference/src/command_merge_changes.cpp:123-144
    reverse+stable_sort+unique_copy). Ray: groupby(id) -> max version.
  * apply-changes: change file wins over base at equal (id, version);
    last version wins overall (object_order_type_id_reverse_version,
    /root/reference/src/command_apply_changes.cpp:327-334); history mode
    keeps every distinct version (:317-325).
  * time-filter: snapshot at time T of a history stream — per id keep the
    version with the largest timestamp <= T, drop it if not visible
    (/root/reference/src/command_time_filter.cpp:131-189 DiffIterator
    windows).
  * derive-changes / diff: ordered full-outer comparison of two snapshots
    into created/modified/deleted (or left/right/same/different) classes
    (/root/reference/src/command_derive_changes.cpp:153-203,
    command_diff.cpp:293-396).

All group steps pre-project to narrow key/version columns where possible;
payload columns ride along only when the caller asks for full rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def merge(datasets: list, key_cols: list[str]):
    """Union N datasets, emit each distinct key once (first copy wins —
    duplicates are byte-identical by the merge contract)."""
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)

    def first_per_key(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return ds.groupby(key_cols).map_groups(first_per_key, batch_format="pandas")


def dedup_exact(ds, key_cols: list[str], order_col: str | None = None):
    """Exact dedup: one row per key (lowest order_col wins when given)."""
    def pick(g: pd.DataFrame) -> pd.DataFrame:
        if order_col is not None:
            g = g.sort_values(order_col, kind="stable")
        return g.head(1)

    return ds.groupby(key_cols).map_groups(pick, batch_format="pandas")


def sort_dataset(ds, keys: list[str], descending=False):
    """Global sort — the sink-time ordering contract (command_sort.cpp:150);
    Ray's range-partitioned distributed sort replaces both the reference's
    'simple' (all-in-RAM) and 'multipass' strategies."""
    return ds.sort(keys, descending=descending)


def apply_changes(base, changes, id_cols: list[str], version_col: str = "version",
                  history: bool = False):
    """Merge a change stream onto a base snapshot.

    Non-history: per id keep the row with the highest (version, source) —
    source=1 for changes, so the change wins ties at equal version.
    History: keep every distinct (id, version), change copy winning within a
    version."""
    import pyarrow.compute as pc

    def tag(src):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column("_src", pa.array(np.full(b.num_rows, src, dtype=np.int8)))
        return f

    u = base.map_batches(tag(0), batch_format="pyarrow").union(
        changes.map_batches(tag(1), batch_format="pyarrow"))

    if history:
        keys = id_cols + [version_col]

        def pick_hist(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("_src", ascending=False, kind="stable")
            return g.head(1).drop(columns=["_src"])

        return u.groupby(keys).map_groups(pick_hist, batch_format="pandas")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([version_col, "_src"], ascending=False, kind="stable")
        return g.head(1).drop(columns=["_src"])

    return u.groupby(id_cols).map_groups(pick, batch_format="pandas")


def merge_changes_simplify(datasets: list, id_cols: list[str], version_col: str = "version"):
    """merge-changes --simplify: union change files, keep last version only."""
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)

    def last(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(version_col, ascending=False, kind="stable").head(1)

    return ds.groupby(id_cols).map_groups(last, batch_format="pandas")


def time_filter(ds, t, id_cols: list[str], ts_col: str = "ts",
                visible_col: str | None = "visible"):
    """Snapshot visible at time `t`: per id the latest version with ts <= t,
    dropped when that version is not visible (deleted)."""
    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g[ts_col] <= t]
        if g.empty:
            return g
        g = g.sort_values(ts_col, kind="stable").tail(1)
        if visible_col is not None and visible_col in g.columns:
            g = g[g[visible_col]]
        return g

    return ds.groupby(id_cols).map_groups(pick, batch_format="pandas")


def derive_changes(old, new, id_cols: list[str], value_cols: list[str]):
    """Full-outer comparison -> rows tagged change='created'|'modified'|
    'deleted'|'same' (diff keeps 'same'; derive-changes drops it)."""
    def tag(src):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column("_side", pa.array(np.full(b.num_rows, src, dtype=np.int8)))
        return f

    u = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow"))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        sides = set(g["_side"])
        if sides == {0}:
            out = g.head(1).drop(columns=["_side"]).copy()
            out["change"] = "deleted"
        elif sides == {1}:
            out = g.head(1).drop(columns=["_side"]).copy()
            out["change"] = "created"
        else:
            o = g[g["_side"] == 0].head(1)[value_cols].reset_index(drop=True)
            n = g[g["_side"] == 1].head(1)
            same = bool((o == n[value_cols].reset_index(drop=True)).all(axis=None))
            out = n.drop(columns=["_side"]).copy()
            out["change"] = "same" if same else "modified"
        return out

    return u.groupby(id_cols).map_groups(classify, batch_format="pandas")


def diff_summary(old, new, id_cols: list[str], value_cols: list[str]) -> dict:
    """diff: counts per class + identical flag (exit code 0 iff identical,
    command_diff.cpp:293-396)."""
    tagged = derive_changes(old, new, id_cols, value_cols)
    counts = {r["change"]: r["count()"] for r in
              tagged.groupby("change").count().take_all()}
    for k in ("created", "deleted", "modified", "same"):
        counts.setdefault(k, 0)
    counts["identical"] = (counts["created"] == 0 and counts["deleted"] == 0
                           and counts["modified"] == 0)
    return counts
