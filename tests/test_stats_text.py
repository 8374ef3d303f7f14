import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.functions.matchers import get_string_matcher
from osmium_tool_ray.pipelines.stats import fileinfo, tags_count
from osmium_tool_ray.schema import TAGS_TYPE
from osmium_tool_ray.stages.text import Fingerprint, LangId, QualityScore, TokenCount


def test_fileinfo(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"id": 5, "lon": 1.0, "lat": 2.0, "caption": "a"},
                        {"id": 2, "lon": -3.0, "lat": 7.0, "caption": "b"}])
    info = fileinfo(ds, id_col="id", lon_col="lon", lat_col="lat", hash_col="caption")
    assert info["count"] == 2
    assert (info["min_id"], info["max_id"]) == (2, 5)
    assert (info["min_lon"], info["max_lat"]) == (-3.0, 7.0)
    # content hash is order-insensitive
    ds2 = rd.from_items([{"id": 2, "lon": -3.0, "lat": 7.0, "caption": "b"},
                         {"id": 5, "lon": 1.0, "lat": 2.0, "caption": "a"}])
    info2 = fileinfo(ds2, id_col="id", hash_col="caption")
    assert info2["content_hash"] == info["content_hash"]


def test_tags_count(ray_session):
    import ray.data as rd

    rows = [[{"key": "highway", "value": "primary"}],
            [{"key": "highway", "value": "residential"}],
            [{"key": "highway", "value": "primary"}, {"key": "name", "value": "x"}],
            []]
    ds = rd.from_arrow(pa.table({"tags": pa.array(rows, type=TAGS_TYPE)}))
    out = tags_count(ds, "tags").take_all()
    assert [(r["key"], r["count"]) for r in out] == [("highway", 3), ("name", 1)]
    out = tags_count(ds, "tags", count_values=True, sort="count-desc").take_all()
    assert out[0]["key"] == "highway" and out[0]["value"] == "primary" and out[0]["count"] == 2
    # HAVING min-count + key matcher
    out = tags_count(ds, "tags", min_count=2).take_all()
    assert len(out) == 1
    out = tags_count(ds, "tags", key_filter=get_string_matcher("name")).take_all()
    assert [(r["key"], r["count"]) for r in out] == [("name", 1)]


def test_token_count_and_quality():
    t = pa.table({"text": pa.array(["Hello, world! abc", ""])})
    out = TokenCount("text")(t)
    assert out["n_tokens"].to_pylist() == [3, 0]
    out2 = QualityScore("text")(t)
    assert abs(out2["punct_ratio"].to_pylist()[0] - 2 / 17) < 1e-12
    assert out2["punct_ratio"].to_pylist()[1] == 0.0


def test_langid():
    import pandas as pd

    df = pd.DataFrame({"text": ["the cat and the dog of it",
                                "der Hund und die Katze ist",
                                "zzz qqq"]})
    out = LangId("text")(df)
    assert out["lang_pred"].tolist() == ["en", "de", "unknown"]


def test_fingerprint_deterministic():
    t = pa.table({"text": pa.array(["abc", "abc", "abd"])})
    out = Fingerprint("text")(t)["fp"].to_pylist()
    assert out[0] == out[1] != out[2]
