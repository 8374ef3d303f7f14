"""Changeset-filter: the reference's conjunctive changeset predicate as one
vectorized map_batches stage.

Reference semantics (/root/reference/src/command_changeset_filter.cpp:234-250
— the copy_if lambda — plus the helpers :205-211):

  * --with-discussion    -> num_comments > 0
  * --without-discussion -> num_comments == 0
  * --with-changes       -> num_changes > 0
  * --without-changes    -> num_changes == 0
  * --open               -> changeset open (closed_at not set)
  * --closed             -> changeset closed (closed_at set)
  * --uid / --user       -> equality
  * --after=T            -> open OR closed_at >= T   (changeset_after :205)
  * --before=T           -> created_at <= T          (changeset_before :209)
  * --bbox               -> bounds valid AND overlaps query box

All flags AND together. Changeset table model (schema per SURVEY.md §1.1):
`id:int64, created_at:timestamp, closed_at:timestamp (null = open),
num_changes:int64, num_comments:int64, uid:int64, user:string,
min_lon/min_lat/max_lon/max_lat:float64 (all-null row = no bounds)`.

Scale shape: a stateless Arrow-vectorized filter — no shuffle, no state;
predicates compile to pyarrow.compute kernels per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def changeset_predicate(batch: pa.Table, *,
                        with_discussion: bool = False,
                        without_discussion: bool = False,
                        with_changes: bool = False,
                        without_changes: bool = False,
                        open: bool = False,
                        closed: bool = False,
                        uid: int | None = None,
                        user: str | None = None,
                        after=None,
                        before=None,
                        bbox: tuple[float, float, float, float] | None = None,
                        ) -> pa.ChunkedArray:
    """Boolean mask for one Arrow batch of changeset rows (the reference's
    copy_if lambda, command_changeset_filter.cpp:234-250)."""
    mask = pa.array([True] * batch.num_rows, type=pa.bool_())
    is_open = pc.is_null(batch["closed_at"])
    if with_discussion:
        mask = pc.and_(mask, pc.greater(batch["num_comments"], 0))
    if without_discussion:
        mask = pc.and_(mask, pc.equal(batch["num_comments"], 0))
    if with_changes:
        mask = pc.and_(mask, pc.greater(batch["num_changes"], 0))
    if without_changes:
        mask = pc.and_(mask, pc.equal(batch["num_changes"], 0))
    if open:
        mask = pc.and_(mask, is_open)
    if closed:
        mask = pc.and_(mask, pc.invert(is_open))
    if uid is not None:
        mask = pc.and_(mask, pc.equal(batch["uid"], uid))
    if user is not None:
        mask = pc.and_(mask, pc.equal(batch["user"], user))
    if after is not None:
        # open changesets always pass --after (changeset_after :205-207)
        ok = pc.or_(is_open, pc.greater_equal(batch["closed_at"],
                                              pa.scalar(after)))
        mask = pc.and_(mask, pc.fill_null(ok, True))
    if before is not None:
        mask = pc.and_(mask, pc.less_equal(batch["created_at"],
                                           pa.scalar(before)))
    if bbox is not None:
        left, bottom, right, top = bbox
        valid = pc.and_(pc.is_valid(batch["min_lon"]),
                        pc.is_valid(batch["max_lat"]))
        overlaps = pc.and_(
            pc.and_(pc.less_equal(batch["min_lon"], right),
                    pc.greater_equal(batch["max_lon"], left)),
            pc.and_(pc.less_equal(batch["min_lat"], top),
                    pc.greater_equal(batch["max_lat"], bottom)))
        mask = pc.and_(mask, pc.fill_null(pc.and_(valid, overlaps), False))
    return pc.fill_null(mask, False)


def changeset_filter(changesets, **flags):
    """Dataset-level form: filter a changesets Dataset by the conjunctive
    predicate. Pure streaming map_batches — no shuffle."""
    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(changeset_predicate(batch, **flags))

    return changesets.map_batches(f, batch_format="pyarrow")
