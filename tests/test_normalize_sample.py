"""Normalizer redaction stage (stages/text.Normalizer) vs a plain-Python
re reference, and weighted Bernoulli sampling (pipelines/sampling
.weighted_sample) predicate/partitioning properties."""

import re

import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.sampling import (
    KNUTH, MOD, det_hash, weighted_sample,
)
from osmium_tool_ray.stages.text import Normalizer


def _ref_normalize(text: str) -> tuple[str, int]:
    low = text.lower()
    pat = re.compile(r"\b(?:customer|supplier|part)\b")
    n = len(pat.findall(low))
    red = pat.sub("<ENT>", low)
    return re.sub(r"  +", " ", red).strip(" "), n


def test_normalizer_matches_python_re(ray_session):
    texts = [
        "Customer went to the SUPPLIER",          # case folding
        "customers keep their parts apart",       # \b: no partial hits
        "part  part   PART",                      # run collapse + multi-hit
        "  leading and trailing   ",               # trim
        "",                                        # empty
        "nothing to redact here",
    ]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": pa.array(texts)})
    out = Normalizer(text_col="text")(batch)
    for i, t in enumerate(texts):
        clean, n = _ref_normalize(t)
        assert out["clean"][i].as_py() == clean, t
        assert out["n_redacted"][i].as_py() == n, t


def test_normalizer_word_boundaries():
    out = Normalizer()(pa.table({"text": pa.array(
        ["part partly apart part.part"])}))
    # only standalone 'part' tokens match (incl. both sides of the dot)
    assert out["n_redacted"][0].as_py() == 3
    assert out["clean"][0].as_py() == "<ENT> partly apart <ENT>.<ENT>"


def test_weighted_sample_predicate(ray_session):
    import ray.data as rd

    n = 5000
    ids = np.arange(n, dtype=np.int64)
    w = (ids * 37) % 700                      # weights 0..699, cap at 512
    tbl = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
    out = weighted_sample(rd.from_arrow(tbl), "doc_id", "w", 512)
    got = sorted(r["doc_id"] for r in out.take_all())
    h = det_hash(ids, mult=KNUTH)
    exp = ids[h * np.int64(512) < np.minimum(w, 512) * np.int64(MOD)]
    assert got == sorted(exp.tolist())
    # weight 0 rows never survive; weight >= cap rows always survive
    zero = set(ids[w == 0].tolist())
    full = set(ids[w >= 512].tolist())
    assert zero.isdisjoint(got)
    assert full.issubset(got)


def test_weighted_sample_partitioning_invariant(ray_session):
    import ray.data as rd

    ids = np.arange(3000, dtype=np.int64)
    w = (ids * 13) % 600
    tbl = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
    a = weighted_sample(rd.from_arrow(tbl), "doc_id", "w", 512)
    b = weighted_sample(rd.from_arrow(tbl).repartition(17), "doc_id",
                        "w", 512)
    assert sorted(r["doc_id"] for r in a.take_all()) == \
        sorted(r["doc_id"] for r in b.take_all())
