"""Generated DuckDB oracle SQL for sketch/model-style queries.

These builders emit exact SQL twins for pipeline stages whose outputs were
previously only rows-count-checked: the SQL reproduces the engine's own
hashing (functions/sqlhash) or ground-truth definition (all-pairs Jaccard)
bit-for-bit, so the driver's value-hash compare becomes a real gate.

The SQL is machine-generated (64 per-bit aggregates, inlined splitmix
chains) — readability lives here in the builders, not the emitted text."""

from __future__ import annotations

from .functions.sqlhash import hash_str_sql, u64_to_i64_sql
from .stages.text import _LANG_STOPWORDS


def simhash_sql(table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text", out_col: str = "simhash") -> str:
    """Exact twin of stages/dedup.SimHash: lower -> split [^a-z0-9_]+ ->
    per-token hash_str_u64 -> per-bit majority vote -> uint64 viewed as
    int64. Distinct tokens are hashed once and re-joined (the splitmix
    chain is ~60 SQL ops per token)."""
    votes = ",\n        ".join(
        f"SUM(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(64))
    assemble = " + ".join(
        f"CASE WHEN v{j} > 0 THEN CAST({1 << j} AS HUGEINT) ELSE 0 END"
        for j in range(64))
    return f"""
    WITH tok_rows AS (
        SELECT {id_col}, unnest(list_filter(
            string_split_regex(lower({text_col}), '[^a-z0-9_]+'),
            _t -> _t <> '')) AS tok
        FROM {table}
    ),
    tok_hash AS (
        SELECT tok, {hash_str_sql('tok')} AS h
        FROM (SELECT DISTINCT tok FROM tok_rows)
    ),
    votes AS (
        SELECT r.{id_col},
        {votes}
        FROM tok_rows r JOIN tok_hash h USING (tok)
        GROUP BY r.{id_col}
    ),
    sh AS (SELECT {id_col}, ({assemble}) AS u FROM votes)
    SELECT d.{id_col}, {u64_to_i64_sql('COALESCE(s.u, 0)')} AS {out_col}
    FROM {table} d LEFT JOIN sh s USING ({id_col})"""


def langid_sql(table: str = "documents", id_col: str = "doc_id",
               text_col: str = "text", out_col: str = "lang_pred") -> str:
    """Exact twin of stages/text.LangId: stopword-vote with max-count
    argmax, ties broken by sorted-language order, zero votes -> unknown."""
    langs = sorted(_LANG_STOPWORDS)
    counts = ",\n        ".join(
        "SUM(CASE WHEN tok IN ({}) THEN 1 ELSE 0 END) AS c_{}".format(
            ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[lang])), lang)
        for lang in langs)
    # argmax in declared order: lang L wins when its count >= every later
    # lang's count (earlier langs already failed their >= chains)
    branches = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"c_{lang} >= c_{later}" for later in langs[i + 1:])
        branches.append(f"WHEN {conds} THEN '{lang}'")
    case = "\n            ".join(branches)
    greatest = ", ".join(f"c_{lang}" for lang in langs)
    return f"""
    WITH toks AS (
        SELECT {id_col},
               unnest(regexp_extract_all(lower({text_col}), '[a-z0-9_]+')) AS tok
        FROM {table}
    ),
    counts AS (
        SELECT {id_col},
        {counts}
        FROM toks GROUP BY {id_col}
    ),
    pick AS (
        SELECT {id_col}, CASE
            WHEN GREATEST({greatest}) = 0 THEN 'unknown'
            {case}
            ELSE '{langs[-1]}' END AS {out_col}
        FROM counts
    )
    SELECT d.{id_col}, COALESCE(p.{out_col}, 'unknown') AS {out_col}
    FROM {table} d LEFT JOIN pick p USING ({id_col})"""


def rasterize_convex_sql(poly: list, level: int = 7, supersample: int = 8) -> str:
    """Exact twin of stages/raster.rasterize_region for a CONVEX CCW
    polygon: per-cell s x s midpoint-lattice PIP fraction in PURE INTEGER
    arithmetic.

    The lattice coordinates are exact binary rationals (cell width
    360/2^level and the (k+0.5)/s offsets are dyadic), so
    4 * lat * 1e7 and 2 * lon * 1e7 are exact BIGINTs:
        V = -3600000000 + g*56250000 + (2k+1)*3515625   (g = x or y)
    and to_fix's round-half-away reduces to integer adjust-and-divide.
    Inside-or-boundary for the convex CCW ring = every edge cross product
    >= 0 on the to_fix'd coordinates — identical to the exact kernel
    (functions/pip.py) boundary-inclusion semantics. Coverage =
    hit_count / s^2, a single exact division. Cell ids are the Morton
    interleave of functions/cells.xy_to_cell, built bit-by-bit.

    Only supports level=7, supersample=8 geometry constants (the query
    fixture); generalize the literals if other configs need oracles."""
    if level != 7 or supersample != 8:
        raise ValueError("oracle constants are specialized to level=7, s=8")
    from .functions.geometry import to_fix

    fixpoly = [(int(to_fix(p[0])), int(to_fix(p[1]))) for p in poly]
    edges = " AND ".join(
        f"(({x2} - {x1}) * (py - {y1}) - (px - {x1}) * ({y2} - {y1})) >= 0"
        for (x1, y1), (x2, y2) in zip(fixpoly[:-1], fixpoly[1:]))
    morton = " + ".join(
        [f"((x // {1 << j}) % 2) * {1 << (2 * j)}" for j in range(level)]
        + [f"((y // {1 << j}) % 2) * {1 << (2 * j + 1)}" for j in range(level)])
    # bbox cover of the polygon envelope at level 7 (extra rim cells get
    # zero lattice hits and drop out via cnt > 0)
    import math
    n = 1 << level
    lons = [p[0] for p in poly]
    lats = [p[1] for p in poly]
    x0 = max(0, min(n - 1, math.floor((min(lons) + 180.0) / 360.0 * n)))
    x1 = max(0, min(n - 1, math.floor((max(lons) + 180.0) / 360.0 * n)))
    y0 = max(0, min(n - 1, math.floor((min(lats) + 90.0) / 180.0 * n)))
    y1 = max(0, min(n - 1, math.floor((max(lats) + 90.0) / 180.0 * n)))
    return f"""
    WITH cells AS (
        SELECT x, y
        FROM (SELECT unnest(range({x0}, {x1 + 1})) AS x),
             (SELECT unnest(range({y0}, {y1 + 1})) AS y)
    ),
    pts AS (
        SELECT x, y,
            (-3600000000 + x*56250000 + (2*kx+1)*3515625) AS VL,
            (-3600000000 + y*56250000 + (2*ky+1)*3515625) AS VA
        FROM cells, (SELECT unnest(range(0, 8)) AS kx),
                    (SELECT unnest(range(0, 8)) AS ky)
    ),
    fixpts AS (
        SELECT x, y,
            CAST(CASE WHEN VL >= 0 THEN (VL+1)/2 ELSE (VL-1)/2 END AS BIGINT) AS px,
            CAST(CASE WHEN VA >= 0 THEN FLOOR((VA+2)/4.0)
                 ELSE CEIL((VA-2)/4.0) END AS BIGINT) AS py
        FROM pts
    ),
    cnts AS (
        SELECT x, y, SUM(CASE WHEN {edges} THEN 1 ELSE 0 END) AS cnt
        FROM fixpts GROUP BY x, y
    )
    SELECT CAST(({morton}) * 32 + {level} AS BIGINT) AS cell,
           CAST(cnt AS DOUBLE) / 64 AS coverage
    FROM cnts WHERE cnt > 0"""


def char_shingle_pairs_sql(threshold: float, k: int = 5,
                           table: str = "documents", id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    """Ground-truth char-k-shingle Jaccard near-dup pairs + min-label
    transitive closure — the definitional twin of stages/dedup
    .minhash_dedup (whose LSH banding has complete recall on the driver
    corpus; the exact verify stage makes precision exact, so pipeline
    output == ground truth). Shingles are the k-char substrings
    themselves (the engine hashes them 64-bit; collision-free on this
    corpus), docs shorter than k contribute one whole-text shingle."""
    return f"""
    WITH RECURSIVE docs_s AS (
        SELECT {id_col} AS id, {text_col} AS t, length({text_col}) AS n
        FROM {table}
    ),
    shingles AS (
        SELECT DISTINCT id, substr(t, i, {k}) AS sh
        FROM docs_s, unnest(range(1, greatest(n - {k - 1}, 0) + 1)) AS u(i)
        WHERE n >= {k}
        UNION
        SELECT DISTINCT id, t AS sh FROM docs_s WHERE n < {k}
    ),
    sizes AS (SELECT id, COUNT(*) AS ns FROM shingles GROUP BY id),
    inter AS (
        SELECT a.id AS a, b.id AS b, COUNT(*) AS i
        FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.id < b.id
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT i.a, i.b FROM inter i
        JOIN sizes sa ON sa.id = i.a JOIN sizes sb ON sb.id = i.b
        WHERE CAST(i.i AS DOUBLE) / (sa.ns + sb.ns - i.i) >= {threshold}
    ),
    edges AS (SELECT a AS x, b AS y FROM cand
              UNION SELECT b, a FROM cand),
    reach AS (
        SELECT x AS src, x AS dst FROM (SELECT DISTINCT x FROM edges)
        UNION
        SELECT r.src, e.y FROM reach r JOIN edges e ON e.x = r.dst
    )
    SELECT src AS {id_col}, MIN(dst) AS dup_of
    FROM reach GROUP BY src HAVING MIN(dst) <> src"""


def jaccard_join_sql(threshold: float, n: int = 3,
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Ground-truth EXACT word-n-gram Jaccard join pairs — the
    definitional twin of stages/dedup.jaccard_join (same tokenization and
    short-doc whole-text shingle as word_ngram_pairs_sql, but emitting
    the qualifying pairs themselves with exact set sizes)."""
    return f"""
    WITH tok AS (
        SELECT {id_col} AS id,
               list_filter(string_split_regex(lower({text_col}), '[^a-z0-9_]+'),
                           _t -> _t <> '') AS ts,
               lower({text_col}) AS lt
        FROM {table}
    ),
    grams AS (
        SELECT DISTINCT id,
               list_aggregate(ts[i : i + {n - 1}], 'string_agg', ' ') AS sh
        FROM tok, unnest(range(1, len(ts) - {n - 1} + 1)) AS u(i)
        WHERE len(ts) >= {n}
        UNION
        SELECT DISTINCT id, lt AS sh FROM tok WHERE len(ts) < {n}
    ),
    sizes AS (SELECT id, COUNT(*) AS ns FROM grams GROUP BY id),
    inter AS (
        SELECT a.id AS a, b.id AS b, COUNT(*) AS i
        FROM grams a JOIN grams b ON a.sh = b.sh AND a.id < b.id
        GROUP BY 1, 2
    )
    SELECT i.a AS a, i.b AS b, i.i AS inter_sz,
           sa.ns + sb.ns - i.i AS union_sz,
           CAST(i.i AS DOUBLE) / (sa.ns + sb.ns - i.i) AS jacc
    FROM inter i
    JOIN sizes sa ON sa.id = i.a JOIN sizes sb ON sb.id = i.b
    WHERE CAST(i.i AS DOUBLE) / (sa.ns + sb.ns - i.i) >= {threshold}"""


def fuzzy_contamination_sql(threshold: float, n: int = 3,
                            bench_pred: str = "id % 101 = 0",
                            table: str = "documents",
                            id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    """Ground-truth fuzzy benchmark decontamination — the definitional
    twin of stages/dedup.fuzzy_contamination: per corpus doc, the best
    (jacc desc, bench id asc) benchmark match with word-n-gram set
    Jaccard >= threshold."""
    return f"""
    WITH tok AS (
        SELECT {id_col} AS id,
               list_filter(string_split_regex(lower({text_col}), '[^a-z0-9_]+'),
                           _t -> _t <> '') AS ts,
               lower({text_col}) AS lt
        FROM {table}
    ),
    grams AS (
        SELECT DISTINCT id,
               list_aggregate(ts[i : i + {n - 1}], 'string_agg', ' ') AS sh
        FROM tok, unnest(range(1, len(ts) - {n - 1} + 1)) AS u(i)
        WHERE len(ts) >= {n}
        UNION
        SELECT DISTINCT id, lt AS sh FROM tok WHERE len(ts) < {n}
    ),
    sizes AS (SELECT id, COUNT(*) AS ns FROM grams GROUP BY id),
    inter AS (
        SELECT d.id AS did, b.id AS bid, COUNT(*) AS i
        FROM grams d JOIN grams b ON d.sh = b.sh
        WHERE b.{bench_pred}
        GROUP BY 1, 2
    )
    SELECT did AS {id_col}, bid AS bench_id, i.i AS inter_sz,
           sd.ns + sb.ns - i.i AS union_sz,
           CAST(i.i AS DOUBLE) / (sd.ns + sb.ns - i.i) AS jacc
    FROM inter i
    JOIN sizes sd ON sd.id = i.did JOIN sizes sb ON sb.id = i.bid
    WHERE CAST(i.i AS DOUBLE) / (sd.ns + sb.ns - i.i) >= {threshold}
    QUALIFY ROW_NUMBER() OVER (PARTITION BY did
                               ORDER BY jacc DESC, bid ASC) = 1"""


def word_ngram_pairs_sql(threshold: float, n: int = 3,
                         table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """Ground-truth word-n-gram Jaccard near-dup pairs + closure — the
    definitional twin of stages/dedup.ngram_jaccard_pairs. Tokens are the
    lowercased [^a-z0-9_]+ split; n-grams are space-joined windows; docs
    with fewer than n tokens contribute one whole-lowercased-text
    shingle (matching _flat_word_ngram_hashes)."""
    return f"""
    WITH RECURSIVE tok AS (
        SELECT {id_col} AS id,
               list_filter(string_split_regex(lower({text_col}), '[^a-z0-9_]+'),
                           _t -> _t <> '') AS ts,
               lower({text_col}) AS lt
        FROM {table}
    ),
    grams AS (
        SELECT DISTINCT id,
               list_aggregate(ts[i : i + {n - 1}], 'string_agg', ' ') AS sh
        FROM tok, unnest(range(1, len(ts) - {n - 1} + 1)) AS u(i)
        WHERE len(ts) >= {n}
        UNION
        SELECT DISTINCT id, lt AS sh FROM tok WHERE len(ts) < {n}
    ),
    sizes AS (SELECT id, COUNT(*) AS ns FROM grams GROUP BY id),
    inter AS (
        SELECT a.id AS a, b.id AS b, COUNT(*) AS i
        FROM grams a JOIN grams b ON a.sh = b.sh AND a.id < b.id
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT i.a, i.b FROM inter i
        JOIN sizes sa ON sa.id = i.a JOIN sizes sb ON sb.id = i.b
        WHERE CAST(i.i AS DOUBLE) / (sa.ns + sb.ns - i.i) >= {threshold}
    ),
    edges AS (SELECT a AS x, b AS y FROM cand
              UNION SELECT b, a FROM cand),
    reach AS (
        SELECT x AS src, x AS dst FROM (SELECT DISTINCT x FROM edges)
        UNION
        SELECT r.src, e.y FROM reach r JOIN edges e ON e.x = r.dst
    )
    SELECT src AS {id_col}, MIN(dst) AS dup_of
    FROM reach GROUP BY src HAVING MIN(dst) <> src"""


def containment_join_sql(threshold: float, n: int = 3,
                         table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """Ground-truth EXACT word-n-gram DIRECTED containment join — the
    definitional twin of stages/dedup.containment_join (same
    tokenization and short-doc whole-text shingle as jaccard_join_sql,
    but asymmetric: |Sa ∩ Sb| / |Sa| >= t over ordered pairs a != b)."""
    return f"""
    WITH tok AS (
        SELECT {id_col} AS id,
               list_filter(string_split_regex(lower({text_col}), '[^a-z0-9_]+'),
                           _t -> _t <> '') AS ts,
               lower({text_col}) AS lt
        FROM {table}
    ),
    grams AS (
        SELECT DISTINCT id,
               list_aggregate(ts[i : i + {n - 1}], 'string_agg', ' ') AS sh
        FROM tok, unnest(range(1, len(ts) - {n - 1} + 1)) AS u(i)
        WHERE len(ts) >= {n}
        UNION
        SELECT DISTINCT id, lt AS sh FROM tok WHERE len(ts) < {n}
    ),
    sizes AS (SELECT id, COUNT(*) AS ns FROM grams GROUP BY id),
    inter AS (
        SELECT a.id AS a, b.id AS b, COUNT(*) AS i
        FROM grams a JOIN grams b ON a.sh = b.sh AND a.id <> b.id
        GROUP BY 1, 2
    )
    SELECT i.a AS a, i.b AS b, i.i AS inter_sz, sa.ns AS a_sz,
           CAST(i.i AS DOUBLE) / sa.ns AS containment
    FROM inter i JOIN sizes sa ON sa.id = i.a
    WHERE CAST(i.i AS DOUBLE) / sa.ns >= {threshold}"""
