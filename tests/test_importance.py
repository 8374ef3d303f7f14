"""DSIR-style importance score (stages/text.importance_score) vs a
hand-computable fixture and the forced bucketed-join path."""

import pandas as pd
import pyarrow as pa

from osmium_tool_ray.stages.text import importance_score


def _fixture():
    # target = lang 'en'. Vocabulary: the/cat/le/chat.
    # f('the')=2 ft=2; f('cat')=2 ft=2; f('le')=2 ft=0; f('chat')=2 ft=0
    # N_r=8, N_t=4 -> weight(w) = ft*8 - fr*4: the/cat=8, le/chat=-8
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["the cat", "the cat", "le chat", "le chat"]),
        "lang": pa.array(["en", "en", "fr", "fr"]),
    })


def test_importance_hand_fixture(ray_session):
    import ray.data as rd

    out = {r["doc_id"]: (r["n_toks"], r["score_num"], r["score"])
           for r in importance_score(
               rd.from_arrow(_fixture()), "lang", "en").take_all()}
    assert out == {1: (2, 16, 0.5), 2: (2, 16, 0.5),
                   3: (2, -16, -0.5), 4: (2, -16, -0.5)}


def test_importance_bucketed_path_parity(ray_session):
    import ray.data as rd

    import numpy as np

    rng = np.random.default_rng(31)
    n = 400
    vocab = np.array(["w%d" % i for i in range(40)])
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 12)))
             for _ in range(n)]
    t = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(np.where(rng.random(n) < 0.4, "en", "xx"),
                         type=pa.string()),
    })
    ds = rd.from_arrow(t).repartition(6)
    a = importance_score(ds, "lang", "en").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = importance_score(ds, "lang", "en", broadcast_cap=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype(str),
                                  b[a.columns].astype(str))


def test_importance_separates_target(ray_session):
    import ray.data as rd

    out = importance_score(rd.from_arrow(_fixture()), "lang",
                           "en").to_pandas()
    en = out[out.doc_id <= 2].score.mean()
    fr = out[out.doc_id > 2].score.mean()
    assert en > 0 > fr


def test_importance_zero_token_docs_absent(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["hello world", "   "]),
        "lang": pa.array(["en", "en"]),
    })
    out = importance_score(rd.from_arrow(t), "lang", "en").take_all()
    assert [r["doc_id"] for r in out] == [1]
