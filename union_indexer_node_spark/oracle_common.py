"""Shared SQL fragments and oracle-builder helpers used by the
DuckDB oracle strings in ``queries_oracle_sql.py`` (and re-exported by
``queries.py`` for the Spark-side fixtures that interpolate the same
constants, e.g. the injected duplicate passage ``_DISC``). Moved out
of ``queries.py`` in round 11 — all are self-contained string
builders with no Spark or registry dependencies."""

from __future__ import annotations

from .pipelines.ann_lsh import hyperplanes as _hyperplanes

_ANN_PLANES = _hyperplanes(dim=64, n_bits=8)


def _planes_sql() -> list[str]:
    return ["[" + ", ".join(repr(x) for x in p) + "]" for p in _ANN_PLANES]

_FEED_COLS_SQL = "author, permlink, title, created_at, app_name, num_votes"


_TOKS_CTE = """
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
)
"""


_SIG_CTE = f"""
{_TOKS_CTE.strip()},
sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(generate_series(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
  )) AS s
  FROM toks
),
hashed AS (
  SELECT doc_id, md5(s) || md5(s || '#') AS hx FROM sh
),
sig AS (
  SELECT doc_id,
    min(substr(hx,  1, 8)) h0, min(substr(hx,  9, 8)) h1,
    min(substr(hx, 17, 8)) h2, min(substr(hx, 25, 8)) h3,
    min(substr(hx, 33, 8)) h4, min(substr(hx, 41, 8)) h5,
    min(substr(hx, 49, 8)) h6, min(substr(hx, 57, 8)) h7
  FROM hashed GROUP BY doc_id
)
"""


_SHINGLE_SIG_CTE = f"""
{_SIG_CTE.strip()},
canon AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
bands_all AS (
  SELECT doc_id, 0 AS band_idx, md5(h0 || '|' || h1) AS band_key
  FROM sig WHERE doc_id IN (SELECT doc_id FROM canon)
  UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3)
  FROM sig WHERE doc_id IN (SELECT doc_id FROM canon)
  UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5)
  FROM sig WHERE doc_id IN (SELECT doc_id FROM canon)
  UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7)
  FROM sig WHERE doc_id IN (SELECT doc_id FROM canon)
),
bands AS (
  SELECT doc_id, band_idx, band_key FROM (
    SELECT doc_id, band_idx, band_key,
           COUNT(*) OVER (PARTITION BY band_idx, band_key) AS m
    FROM bands_all
  ) WHERE m <= 200
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
)
"""


_BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"


def _bucket_sql(vec_expr: str) -> str:
    terms = [
        f"(CASE WHEN list_sum(list_transform(generate_series(1, 64), "
        f"i -> (CAST({vec_expr} AS DOUBLE[]))[i] * ({p})[i])) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(_planes_sql())
    ]
    return "CAST((" + " + ".join(terms) + ") AS INTEGER)"


_CENTS = "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"


_DISC_PCT = "CAST(ROUND(l_discount * 100, 0) AS BIGINT)"


_KMEANS_CTE_1 = """q AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS qv
      FROM embeddings
      WHERE embedding IS NOT NULL
    ),
    seeds AS (
      SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
             AS INTEGER) AS cluster,
             list_transform(qv, v -> round(v / 1000000.0, 6)) AS c
      FROM q
      QUALIFY ROW_NUMBER() OVER (
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 4
    ),
    d0 AS (
      SELECT q.vec_id, q.qv, s.cluster,
             round(list_sum(list_transform(q.qv,
               (v, i) -> (v / 1000000.0 - s.c[i])
                         * (v / 1000000.0 - s.c[i]))), 4) AS dist
      FROM q CROSS JOIN seeds s
    ),
    a0 AS (
      SELECT vec_id, qv, cluster, dist FROM d0
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY dist, cluster) = 1
    ),
    c1d AS (
      SELECT a0.cluster, t.i AS dim, SUM(a0.qv[t.i]) AS s, COUNT(*) AS n
      FROM a0 CROSS JOIN range(1, 65) AS t(i)
      GROUP BY a0.cluster, t.i
    ),
    cent1 AS (
      SELECT s.cluster,
             CASE WHEN COUNT(c1d.dim) = 0 THEN ANY_VALUE(s.c)
                  ELSE list(round(c1d.s / (c1d.n * 1000000.0), 6)
                            ORDER BY c1d.dim) END AS c
      FROM seeds s LEFT JOIN c1d ON s.cluster = c1d.cluster
      GROUP BY s.cluster
    ),
    d1 AS (
      SELECT a0.vec_id, a0.qv, m.cluster,
             round(list_sum(list_transform(a0.qv,
               (v, i) -> (v / 1000000.0 - m.c[i])
                         * (v / 1000000.0 - m.c[i]))), 4) AS dist
      FROM a0 CROSS JOIN cent1 m
    ),
    a1 AS (
      SELECT vec_id, qv, cluster, dist FROM d1
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY dist, cluster) = 1
    )"""


_KMEANS_CTE = _KMEANS_CTE_1 + """,
    c2d AS (
      SELECT a1.cluster, t.i AS dim, SUM(a1.qv[t.i]) AS s, COUNT(*) AS n
      FROM a1 CROSS JOIN range(1, 65) AS t(i)
      GROUP BY a1.cluster, t.i
    ),
    cent2 AS (
      SELECT m.cluster,
             CASE WHEN COUNT(c2d.dim) = 0 THEN ANY_VALUE(m.c)
                  ELSE list(round(c2d.s / (c2d.n * 1000000.0), 6)
                            ORDER BY c2d.dim) END AS c
      FROM cent1 m LEFT JOIN c2d ON m.cluster = c2d.cluster
      GROUP BY m.cluster
    ),
    d2 AS (
      SELECT a1.vec_id, m.cluster,
             round(list_sum(list_transform(a1.qv,
               (v, i) -> (v / 1000000.0 - m.c[i])
                         * (v / 1000000.0 - m.c[i]))), 4) AS dist
      FROM a1 CROSS JOIN cent2 m
    ),
    asg AS (
      SELECT vec_id, cluster, dist FROM d2
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY dist, cluster) = 1
    )"""


def _passage_oracle(w: int, s: int) -> str:
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             md5(array_to_string(array_slice(toks, s, s + {w - 1}), ' '))
               AS h
      FROM t, LATERAL (SELECT UNNEST(generate_series(
                 1, len(toks) - {w - 1}, {s})) AS s) g
      WHERE len(toks) >= {w}
    ),
    sh AS (SELECT h, MIN(doc_id) <> MAX(doc_id) AS shared
           FROM w GROUP BY h),
    per AS (
      SELECT w.doc_id, COUNT(*) AS n_windows,
             SUM(CASE WHEN sh.shared THEN 1 ELSE 0 END) AS n_shared
      FROM w JOIN sh USING (h) GROUP BY w.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(per.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(per.n_shared, 0) AS BIGINT) AS n_shared_windows,
           COALESCE(per.n_shared, 0) > 0 AS has_shared_passage
    FROM documents d LEFT JOIN per USING (doc_id)
    """


_DISC = (
    "this content is provided as is without warranty of any kind"
    " whatsoever"
)


def _bpe_train_oracle(k: int) -> str:
    """Unrolled k-iteration BPE-training recurrence (the
    sim_kmeans_clusters oracle pattern): v_{i+1} applies the top pair
    of v_i via the same word-boundary-anchored regexp merge the engine
    uses; the result is the merge table itself, so a wrong count, a
    broken tiebreak, or a divergent merge in ANY iteration mismatches."""
    parts = [
        """
    WITH v0 AS (
      SELECT array_to_string(regexp_extract_all(w, '.'), ' ') AS ws, wf
      FROM (SELECT w, COUNT(*) AS wf
            FROM (SELECT unnest(list_filter(
                     regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '')) AS w
                  FROM documents)
            GROUP BY w)
    )"""
    ]
    for i in range(k):
        parts.append(
            f""",
    p{i} AS (
      SELECT s[j] AS a, s[j + 1] AS b, SUM(wf) AS c
      FROM (SELECT string_split(ws, ' ') AS s, wf FROM v{i}),
           LATERAL (SELECT UNNEST(generate_series(1, len(s) - 1)) AS j) g
      WHERE len(s) >= 2
      GROUP BY 1, 2
    ),
    t{i} AS (SELECT a, b, c FROM p{i} ORDER BY c DESC, a, b LIMIT 1)"""
        )
        if i < k - 1:
            parts.append(
                f""",
    v{i + 1} AS (
      SELECT regexp_replace(ws, '\\b' || t.a || ' ' || t.b || '\\b',
                            t.a || t.b, 'g') AS ws, wf
      FROM v{i}, t{i} t
    )"""
            )
    selects = [
        f"""SELECT {i} AS merge_idx, a AS pair_left, b AS pair_right,
           a || b AS merged, CAST(c AS BIGINT) AS pair_count FROM t{i}"""
        for i in range(k)
    ]
    return "".join(parts) + "\n    " + "\n    UNION ALL\n    ".join(selects)


def _bpe_encode_oracle(k: int) -> str:
    """Train-then-ENCODE recurrence: the same unrolled k-iteration
    trainer as _bpe_train_oracle but with the word carried through
    every vocab CTE, finishing with the (word → post-merge symbol
    count) join that prices each document in learned-BPE tokens."""
    parts = [
        """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    wordocc AS (
      SELECT doc_id, unnest(toks) AS w FROM t
    ),
    v0 AS (
      SELECT w, array_to_string(regexp_extract_all(w, '.'), ' ') AS ws, wf
      FROM (SELECT w, COUNT(*) AS wf FROM wordocc GROUP BY w)
    )"""
    ]
    for i in range(k):
        parts.append(
            f""",
    p{i} AS (
      SELECT s[j] AS a, s[j + 1] AS b, SUM(wf) AS c
      FROM (SELECT string_split(ws, ' ') AS s, wf FROM v{i}),
           LATERAL (SELECT UNNEST(generate_series(1, len(s) - 1)) AS j) g
      WHERE len(s) >= 2
      GROUP BY 1, 2
    ),
    t{i} AS (SELECT a, b, c FROM p{i} ORDER BY c DESC, a, b LIMIT 1),
    v{i + 1} AS (
      SELECT w, regexp_replace(ws, '\\b' || tt.a || ' ' || tt.b || '\\b',
                               tt.a || tt.b, 'g') AS ws, wf
      FROM v{i}, t{i} tt
    )"""
        )
    parts.append(
        f""",
    enc AS (SELECT w, len(string_split(ws, ' ')) AS n_syms FROM v{k}),
    occ AS (SELECT doc_id, w, COUNT(*) AS c FROM wordocc GROUP BY 1, 2),
    per AS (
      SELECT occ.doc_id, SUM(occ.c) AS n_words,
             SUM(occ.c * enc.n_syms) AS n_bpe
      FROM occ JOIN enc USING (w) GROUP BY occ.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(per.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(per.n_bpe, 0) AS BIGINT) AS n_bpe_tokens
    FROM documents d LEFT JOIN per USING (doc_id)"""
    )
    return "".join(parts)


