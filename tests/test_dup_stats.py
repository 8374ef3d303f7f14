"""dup_stats_by_source query on a planted corpus: per-source doc /
distinct / duplicate counts and cross-source shared fingerprints."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def test_dup_stats_planted(ray_session, tmp_path):
    texts = ["aaa", "aaa", "bbb",          # src1: 1 dup pair + unique
             "aaa", "ccc", "ccc", "ccc"]   # src2: shares aaa, 2 dup rows
    srcs = ["s1", "s1", "s1", "s2", "s2", "s2", "s2"]
    tbl = pa.table({"doc_id": pa.array(np.arange(7, dtype=np.int64)),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * 7),
                    "source": pa.array(srcs),
                    "n_chars": pa.array([len(t) for t in texts],
                                        type=pa.int64())})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = E.queries()["dup_stats_by_source"](str(tmp_path)).to_pandas() \
        .set_index("source")
    s1, s2 = got.loc["s1"], got.loc["s2"]
    assert (s1.n_docs, s1.n_distinct_fp, s1.dup_rows, s1.shared_fps) \
        == (3, 2, 1, 1)      # aaa shared with s2
    assert (s2.n_docs, s2.n_distinct_fp, s2.dup_rows, s2.shared_fps) \
        == (4, 2, 2, 1)
