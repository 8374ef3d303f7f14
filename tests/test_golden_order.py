"""Golden order-validation suite vs the reference's test/order/
fail-order-* fixtures (each breaks the (type, id) stream order in one
way; command_fileinfo.cpp:104-151 flips `ordered` to false on them).

The fixtures are tiny XML files; a minimal attribute scrape extracts the
(type, id) sequence — we test ORDER semantics, not XML parsing (XML is
an engine-container n/a, SURVEY §8.1)."""

import re
from pathlib import Path

import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.stats import check_sorted

ORDER_DIR = Path("/root/reference/test/order")
KIND_RANK = {"node": 0, "way": 1, "relation": 2}
_ELEM = re.compile(r"<(node|way|relation)\b[^>]*?\bid=\"(-?\d+)\"")


def _sequence(path: Path):
    kinds, ids = [], []
    for m in _ELEM.finditer(path.read_text()):
        kinds.append(KIND_RANK[m.group(1)])
        ids.append(int(m.group(2)))
    assert kinds, path
    return kinds, ids


def _ds(ray_session, kinds, ids, nblocks=2):
    import ray.data as rd

    tbl = pa.table({"kind_rank": pa.array(kinds, type=pa.int64()),
                    "id": pa.array(ids, type=pa.int64())})
    n = max(1, len(kinds) // nblocks)
    pieces = [tbl.slice(i, n) for i in range(0, len(kinds), n)]
    return rd.from_arrow_refs([ray_session.put(p) for p in pieces])


@pytest.mark.parametrize("fixture", sorted(p.name for p in ORDER_DIR.glob("fail-order-*.osm")))
def test_fail_order_fixtures_detected(ray_session, fixture):
    kinds, ids = _sequence(ORDER_DIR / fixture)
    res = check_sorted(_ds(ray_session, kinds, ids), ["kind_rank", "id"])
    assert res["sorted"] is False and res["violations"] >= 1, (fixture, res)


def test_ordered_stream_passes(ray_session):
    kinds = [0, 0, 0, 1, 1, 2]
    ids = [10, 11, 12, 5, 9, 1]     # ids restart per type: still ordered
    res = check_sorted(_ds(ray_session, kinds, ids), ["kind_rank", "id"])
    assert res == {"sorted": True, "violations": 0}


def test_boundary_violation_between_blocks(ray_session):
    """The inversion straddles a block boundary — only the driver's
    boundary fold can see it."""
    res = check_sorted(_ds(ray_session, [0, 0, 0, 0], [1, 9, 2, 3],
                           nblocks=2), ["kind_rank", "id"])
    assert res["sorted"] is False and res["violations"] == 1


def test_duplicate_keys_are_ordered(ray_session):
    """Equal consecutive (type, id) keys: multiple versions, still
    ordered (the reference only flags multiple_versions, not disorder)."""
    res = check_sorted(_ds(ray_session, [0, 0, 0], [7, 7, 8]),
                       ["kind_rank", "id"])
    assert res == {"sorted": True, "violations": 0}
