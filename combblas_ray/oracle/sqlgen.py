"""DuckDB oracle SQL for every corpus/graph query.

The synthetic corpus (see ``sources/corpus.py``) is pure integer
arithmetic, so these oracles REGENERATE the corpus/edge table inside SQL
(``documents`` x ``generate_series`` -> file ids) and re-derive each query's
answer independently of any Ray code. Fixed-iteration algorithms (PageRank,
CC, BFS, SSSP, label propagation) are emitted as unrolled CTE chains.

Column names match the Ray pipelines exactly (the driver hash-compares by
sorted column name).
"""

from __future__ import annotations

import functools
import re


def _materialized(fn):
    """Force every CTE to MATERIALIZED — the unrolled iteration chains
    reference each prior CTE several times; inlining would re-evaluate the
    whole chain exponentially."""

    @functools.wraps(fn)
    def wrap(*a, **k):
        return re.sub(r"\bAS \(", "AS MATERIALIZED (", fn(*a, **k))

    return wrap


# n = rows(lineitem); file ids are dense 0..n-1.
PREFIX = """
WITH params AS (SELECT count(*) AS n FROM lineitem),
files AS (
  SELECT row_number() OVER () - 1 AS i FROM lineitem
),
targets AS (
  SELECT i, CAST(0 AS BIGINT) AS ord, i % 64 AS j FROM files
  UNION ALL
  SELECT f.i, CAST(t.t AS BIGINT) AS ord,
         (f.i * 101 + t.t * 4099 + 17) % p.n AS j
  FROM files f CROSS JOIN params p, generate_series(1, 4) t(t)
  WHERE t.t <= f.i % 5
),
edges AS (
  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
  FROM (SELECT i AS src, j AS dst FROM targets WHERE i <> j)
  GROUP BY src, dst
),
verts AS (SELECT i, 'm_' || i AS label FROM files)
"""


@_materialized
def corpus_scan() -> str:
    return PREFIX + """
, contents AS (
  SELECT f.i,
         string_agg('import m_' || t.j, chr(10) ORDER BY t.ord)
         || chr(10) || '# file m_' || f.i || ' lang='
         || (['py','js','go','rs'])[(f.i % 4) + 1] AS content
  FROM files f JOIN targets t ON t.i = f.i
  GROUP BY f.i
)
SELECT 'repo_' || (c.i % 100) AS repo,
       'src/m_' || c.i || '.py' AS path,
       printf('%040x', (c.i * 2654435761 + 40503) % 4294967296) AS "commit",
       (['py','js','go','rs'])[(c.i % 4) + 1] AS lang,
       sha256(c.content) AS sha256
FROM contents c
"""


@_materialized
def edge_table() -> str:
    return PREFIX + """
SELECT vs.label AS src_label, vd.label AS dst_label, e.w AS w
FROM edges e JOIN verts vs ON vs.i = e.src JOIN verts vd ON vd.i = e.dst
"""


@_materialized
def vertex_ids() -> str:
    return PREFIX + """
SELECT label, row_number() OVER (ORDER BY label) - 1 AS vid FROM verts
"""


@_materialized
def out_degrees() -> str:
    return PREFIX + """
SELECT v.label AS label, count(*) AS outdeg, sum(e.w) AS outw
FROM edges e JOIN verts v ON v.i = e.src GROUP BY v.label
"""


@_materialized
def in_degrees() -> str:
    return PREFIX + """
SELECT v.label AS label, count(*) AS indeg, sum(e.w) AS inw
FROM edges e JOIN verts v ON v.i = e.dst GROUP BY v.label
"""


@_materialized
def spmv_plus_times() -> str:
    # x[i] = (i % 11) + 1 in arithmetic space; y = A (.) x summed over in-edges
    return PREFIX + """
SELECT v.label AS label, sum(e.w * ((e.src % 11) + 1)) AS y
FROM edges e JOIN verts v ON v.i = e.dst GROUP BY v.label
"""


@_materialized
def spmv_min_plus() -> str:
    return PREFIX + """
SELECT v.label AS label, min(e.w + ((e.src % 11) + 1)) AS y
FROM edges e JOIN verts v ON v.i = e.dst GROUP BY v.label
"""


@_materialized
def reach2_bool() -> str:
    # seeds = arith ids % 97 == 0; 2 hops of src->dst edges, seeds included
    return PREFIX + """
, seeds AS (SELECT i FROM files WHERE i % 97 = 0),
hop1 AS (
  SELECT i FROM seeds
  UNION
  SELECT e.dst AS i FROM edges e JOIN seeds s ON s.i = e.src
),
hop2 AS (
  SELECT i FROM hop1
  UNION
  SELECT e.dst AS i FROM edges e JOIN hop1 h ON h.i = e.src
)
SELECT v.label AS label FROM hop2 JOIN verts v ON v.i = hop2.i
"""


@_materialized
@_materialized
def harmonic2() -> str:
    """Distance-2 harmonic centrality: c1 = distinct 1-hop, c2 = distinct
    2-hop-only neighbors, h = c1 + c2/2 (dyadic-exact DOUBLE; twin of
    `queries.q_harmonic2`)."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
two AS (
  SELECT DISTINCT a.src AS i, b.dst AS j
  FROM und a JOIN und b ON a.dst = b.src
  WHERE a.src <> b.dst
),
two2 AS (
  SELECT i, j FROM two
  WHERE NOT EXISTS (SELECT 1 FROM und u WHERE u.src = two.i
                    AND u.dst = two.j)
),
c2t AS (SELECT i, count(*) AS c FROM two2 GROUP BY i),
c1t AS (SELECT src AS i, count(*) AS c FROM und GROUP BY src)
SELECT v.label AS label,
       CAST(COALESCE(c1t.c, 0) AS BIGINT) AS c1,
       CAST(COALESCE(c2t.c, 0) AS BIGINT) AS c2,
       COALESCE(c1t.c, 0) + 0.5 * COALESCE(c2t.c, 0) AS harmonic
FROM verts v
LEFT JOIN c1t ON c1t.i = v.i
LEFT JOIN c2t ON c2t.i = v.i
"""


@_materialized
def link_predict_cn(topk: int = 100, min_cn: int = 2) -> str:
    """Common-neighbors link prediction on DENSE ids (pair orientation
    and tie-breaks must match the engine's label-rank id space — twin of
    `queries.q_link_predict_cn`)."""
    return PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d, label FROM verts
),
du AS (
  SELECT ds.d AS u, dd.d AS v
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
  UNION
  SELECT dd.d, ds.d
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
),
cn AS (
  SELECT x.u AS a, y.v AS b, count(*) AS c
  FROM du x JOIN du y ON x.v = y.u
  WHERE x.u < y.v
  GROUP BY 1, 2
),
cn2 AS (
  SELECT a, b, c FROM cn
  WHERE c >= {min_cn}
    AND NOT EXISTS (SELECT 1 FROM du e WHERE e.u = cn.a AND e.v = cn.b)
)
SELECT da.label AS a, db.label AS b, CAST(c.c AS BIGINT) AS cn
FROM cn2 c JOIN dense da ON da.d = c.a JOIN dense db ON db.d = c.b
ORDER BY c.c DESC, c.a ASC, c.b ASC
LIMIT {topk}
"""


@_materialized
def pagerank(iters: int = 10, damping: float = 0.85) -> str:
    d = damping
    sql = PREFIX + f"""
, outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
r0 AS (SELECT f.i, 1.0 / p.n AS score FROM files f CROSS JOIN params p)
"""
    prev = "r0"
    for k in range(1, iters + 1):
        sql += f"""
, dang{k} AS (
  SELECT coalesce(sum(r.score), 0.0) AS dm FROM {prev} r
  LEFT JOIN outw o ON o.src = r.i WHERE o.src IS NULL
),
contrib{k} AS (
  SELECT e.dst AS i, sum(r.score * e.w / o.ow) AS c
  FROM edges e JOIN {prev} r ON r.i = e.src JOIN outw o ON o.src = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT f.i,
         (1.0 - {d}) / p.n + {d} * (coalesce(c.c, 0.0) + dg.dm / p.n) AS score
  FROM files f CROSS JOIN params p CROSS JOIN dang{k} dg
  LEFT JOIN contrib{k} c ON c.i = f.i
)"""
        prev = f"r{k}"
    sql += f"""
SELECT v.label AS label, round(r.score * p.n, 6) AS score
FROM {prev} r JOIN verts v ON v.i = r.i CROSS JOIN params p
"""
    return sql


@_materialized
def connected_components(iters: int = 12) -> str:
    """Fixed-iteration synchronous min-label propagation over the
    undirected view; component id = lexicographically smallest label."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
l0 AS (SELECT i, label AS comp FROM verts)
"""
    prev = "l0"
    for k in range(1, iters + 1):
        sql += f"""
, l{k} AS (
  SELECT v.i, least(l.comp, coalesce(m.mn, l.comp)) AS comp
  FROM verts v JOIN {prev} l ON l.i = v.i
  LEFT JOIN (
    SELECT u.dst AS i, min(lp.comp) AS mn
    FROM und u JOIN {prev} lp ON lp.i = u.src GROUP BY u.dst
  ) m ON m.i = v.i
)"""
        prev = f"l{k}"
    sql += f"""
SELECT v.label AS label, l.comp AS comp
FROM {prev} l JOIN verts v ON v.i = l.i
"""
    return sql


@_materialized
def bfs_distance(root_label: str = "m_0", iters: int = 12) -> str:
    """Unrolled min-plus BFS distances from root over the undirected view;
    unreached vertices are omitted (inner semantics)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
SELECT v.label AS label, CAST(d.dist AS BIGINT) AS dist
FROM {prev} d JOIN verts v ON v.i = d.i
"""
    return sql


@_materialized
def bfs_sigma(root_label: str = "m_0", iters: int = 12) -> str:
    """Unrolled BFS distances + per-level shortest-path-count sums
    (sigma_k(v) = sum of sigma_{k-1} over predecessors; integer-exact,
    order-free BIGINT sums — twin of `queries.q_bfs_sigma`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
, distf AS (SELECT i, dist FROM {prev}),
s0 AS (SELECT i, CAST(1 AS BIGINT) AS sig FROM d0)
"""
    for k in range(1, iters + 1):
        # s(k-1) holds exactly the level-(k-1) vertices, so the only join
        # guard needed is dist(dst) = k
        sql += f"""
, s{k} AS (
  SELECT u.dst AS i, sum(sp.sig) AS sig
  FROM und u JOIN s{k - 1} sp ON sp.i = u.src
  JOIN distf dd ON dd.i = u.dst AND dd.dist = {k}
  GROUP BY u.dst
)"""
    union = " UNION ALL ".join(f"SELECT * FROM s{k}"
                               for k in range(iters + 1))
    sql += f"""
, sig AS ({union})
SELECT v.label AS label, CAST(d.dist AS BIGINT) AS dist,
       CAST(s.sig AS BIGINT) AS sigma
FROM distf d JOIN sig s ON s.i = d.i JOIN verts v ON v.i = d.i
"""
    return sql


@_materialized
def sigma_hist(root_label: str = "m_0", iters: int = 12) -> str:
    """Shortest-path-count histogram: (sigma, n_vertices) over the
    reached set — the aggregate face of the int64 sigma channel (twin of
    `queries.q_sigma_hist`; same unrolled chain as `bfs_sigma`)."""
    base = bfs_sigma(root_label, iters)
    return f"""
WITH pervertex AS ({base})
SELECT sigma, CAST(count(*) AS BIGINT) AS n_vertices
FROM pervertex GROUP BY sigma
"""


@_materialized
def msbfs(mod: int = 97, iters: int = 12) -> str:
    """Multi-source BFS distances (nearest seed, seeds = i %% mod == 0)
    — the `bfs_distance` chain with a seed-set d0 (twin of
    `queries.q_msbfs`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE i % {mod} = 0)
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
SELECT v.label AS label, CAST(d.dist AS BIGINT) AS dist
FROM {prev} d JOIN verts v ON v.i = d.i
"""
    return sql


@_materialized
def sssp(root_label: str = "m_0", iters: int = 15) -> str:
    """Unrolled Bellman-Ford on the DIRECTED graph with integer lengths
    len(u,v) = 1 + (u + 2v) % 7; reached vertices only."""
    sql = PREFIX + f"""
, wedges AS (
  SELECT src, dst, CAST(1 + (src + 2 * dst) % 7 AS DOUBLE) AS len FROM edges
),
d0 AS (SELECT i, CAST(0 AS DOUBLE) AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS i, dp.dist + e.len AS dist
    FROM wedges e JOIN {prev} dp ON dp.i = e.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
SELECT v.label AS label, d.dist AS dist
FROM {prev} d JOIN verts v ON v.i = d.i
"""
    return sql


def _labelprop_chain(iters: int = 5, num_classes: int = 10) -> tuple:
    """Shared label-propagation CTE chain (see `label_propagation`);
    returns (sql_body, final_cte). Reused by `modularity_stats`."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
c0 AS (SELECT i, i % {num_classes} AS cls FROM files)
"""
    prev = "c0"
    for k in range(1, iters + 1):
        sql += f"""
, cnt{k} AS (
  SELECT u.dst AS i, c.cls, count(*) AS cnt
  FROM und u JOIN {prev} c ON c.i = u.src
  GROUP BY u.dst, c.cls
),
best{k} AS (
  SELECT i, cls FROM (
    SELECT i, cls, row_number() OVER (
      PARTITION BY i ORDER BY cnt DESC, cls ASC) AS rn
    FROM cnt{k}
  ) WHERE rn = 1
),
c{k} AS (
  SELECT c.i, coalesce(b.cls, c.cls) AS cls
  FROM {prev} c LEFT JOIN best{k} b ON b.i = c.i
)"""
        prev = f"c{k}"
    return sql, prev


@_materialized
def label_propagation(iters: int = 5, num_classes: int = 10) -> str:
    """Synchronous mode-of-in-neighbors label propagation (directed, using
    the undirected view), init class = i % num_classes, tie -> smaller
    class, no in-neighbors -> keep. Exact integer output."""
    sql, prev = _labelprop_chain(iters, num_classes)
    sql += f"""
SELECT v.label AS label, CAST(c.cls AS BIGINT) AS cls
FROM {prev} c JOIN verts v ON v.i = c.i
"""
    return sql


@_materialized
def modularity_stats(iters: int = 5, num_classes: int = 10) -> str:
    """Per-class modularity sufficient statistics over the fixed-round
    label-propagation communities: vertex count, degree sum and
    internal-edge endpoint count on the undirected distinct view (Q =
    sum_c [e_c/2m - (d_c/2m)^2] is a driver-side scalar over these
    BIGINTs). Twin of `queries.q_modularity_stats`."""
    sql, prev = _labelprop_chain(iters, num_classes)
    sql += f"""
, clsf AS (SELECT i, cls FROM {prev}),
deg AS (SELECT src AS i, count(*) AS dg FROM und GROUP BY src),
vagg AS (
  SELECT c.cls, CAST(count(*) AS BIGINT) AS n_vertices,
         CAST(sum(coalesce(d.dg, 0)) AS BIGINT) AS deg_sum
  FROM clsf c LEFT JOIN deg d ON d.i = c.i GROUP BY c.cls
),
eagg AS (
  SELECT cs.cls, CAST(count(*) AS BIGINT) AS internal
  FROM und u
  JOIN clsf cs ON cs.i = u.src
  JOIN clsf cd ON cd.i = u.dst AND cd.cls = cs.cls
  GROUP BY cs.cls
)
SELECT CAST(v.cls AS BIGINT) AS cls, v.n_vertices, v.deg_sum,
       coalesce(e.internal, 0) AS internal
FROM vagg v LEFT JOIN eagg e ON e.cls = v.cls
"""
    return sql


@_materialized
def triangle_count() -> str:
    """Masked SpGEMM triangle count: L(u<v) path u->w->v (u<w<v) closed by
    L(u,v). One row: (triangles BIGINT)."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
L AS (SELECT src, dst FROM und WHERE src < dst)
SELECT count(*) AS triangles
FROM L a JOIN L b ON b.src = a.dst JOIN L m ON m.src = a.src AND m.dst = b.dst
"""


@_materialized
def spgemm_aa() -> str:
    return PREFIX + """
SELECT vs.label AS src_label, vd.label AS dst_label, sum(a.w * b.w) AS val
FROM edges a JOIN edges b ON b.src = a.dst
JOIN verts vs ON vs.i = a.src JOIN verts vd ON vd.i = b.dst
GROUP BY vs.label, vd.label
"""


@_materialized
def ewise_mult() -> str:
    return PREFIX + """
SELECT vs.label AS src_label, vd.label AS dst_label, a.w * b.w AS val
FROM edges a JOIN edges b ON b.src = a.dst AND b.dst = a.src
JOIN verts vs ON vs.i = a.src JOIN verts vd ON vd.i = a.dst
"""


@_materialized
def set_difference() -> str:
    return PREFIX + """
SELECT vs.label AS src_label, vd.label AS dst_label, a.w AS w
FROM edges a
JOIN verts vs ON vs.i = a.src JOIN verts vd ON vd.i = a.dst
WHERE NOT EXISTS (
  SELECT 1 FROM edges b WHERE b.src = a.dst AND b.dst = a.src
)
"""


@_materialized
def kselect2() -> str:
    return PREFIX + """
SELECT v.label AS label, x.w AS v2
FROM (
  SELECT dst, w, row_number() OVER (PARTITION BY dst ORDER BY w DESC) AS rn
  FROM edges
) x JOIN verts v ON v.i = x.dst
WHERE x.rn = 2
"""


@_materialized
def reduce_colmax() -> str:
    return PREFIX + """
SELECT v.label AS label, max(e.w) AS maxw
FROM edges e JOIN verts v ON v.i = e.dst GROUP BY v.label
"""


@_materialized
def subgraph() -> str:
    return PREFIX + """
, sel AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS sid
  FROM verts WHERE i % 3 = 0
)
SELECT s1.sid AS si, s2.sid AS sj, e.w AS w
FROM edges e JOIN sel s1 ON s1.i = e.src JOIN sel s2 ON s2.i = e.dst
"""


@_materialized
def invert_vec() -> str:
    return PREFIX + """
SELECT (7 * f.i + 3) % p.n AS y, min(f.i) AS i
FROM files f CROSS JOIN params p
GROUP BY (7 * f.i + 3) % p.n
"""


@_materialized
def uniq_degrees() -> str:
    return PREFIX + """
SELECT d.deg AS deg, min(v.label) AS label
FROM (SELECT dst, count(*) AS deg FROM edges GROUP BY dst) d
JOIN verts v ON v.i = d.dst
GROUP BY d.deg
"""


@_materialized
def prune_w2() -> str:
    return PREFIX + """
SELECT vs.label AS src_label, vd.label AS dst_label, e.w AS w
FROM edges e
JOIN verts vs ON vs.i = e.src JOIN verts vd ON vd.i = e.dst
WHERE e.w >= 2
"""


@_materialized
def bandwidth() -> str:
    return PREFIX + """
SELECT CAST(max(abs(src - dst)) AS BIGINT) AS bw FROM edges
"""


def tpch_q1() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_discount) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def top_customers() -> str:
    return """
SELECT o.o_custkey AS c_custkey, c.c_name AS c_name,
       round(sum(o.o_totalprice), 2) AS total
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY o.o_custkey, c.c_name
ORDER BY sum(o.o_totalprice) DESC, o.o_custkey ASC
LIMIT 10
"""


def events_hourly() -> str:
    return """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS cnt, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def events_sliding(win_h: int = 2) -> str:
    return f"""
SELECT date_trunc('hour', ts) - k.k * INTERVAL 1 HOUR AS win, event_type,
       count(*) AS cnt, round(sum(value), 6) AS sum_value
FROM events CROSS JOIN generate_series(0, {win_h - 1}) k(k)
GROUP BY 1, 2
"""


def token_stats() -> str:
    return """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_calc
FROM documents
"""


def langid() -> str:
    return """
WITH c AS (
  SELECT doc_id,
    len(list_filter(string_split(text,' '), t -> t = 'sort'))  AS c_de,
    len(list_filter(string_split(text,' '), t -> t = 'the'))   AS c_en,
    len(list_filter(string_split(text,' '), t -> t = 'data'))  AS c_es,
    len(list_filter(string_split(text,' '), t -> t = 'join'))  AS c_fr,
    len(list_filter(string_split(text,' '), t -> t = 'batch')) AS c_zh
  FROM documents
)
SELECT doc_id, CASE
  WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
  WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
  WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
  WHEN c_fr >= c_zh THEN 'fr'
  ELSE 'zh' END AS pred_lang
FROM c
"""


def quality() -> str:
    return """
SELECT doc_id,
  round(len(list_distinct(string_split(text,' '))) * 1.0
        / greatest(len(string_split(text,' ')), 1), 6) AS distinct_ratio,
  round(list_aggregate(list_transform(string_split(text,' '),
                                      t -> length(t)), 'sum') * 1.0
        / greatest(len(string_split(text,' ')), 1), 6) AS avg_tok_len
FROM documents
"""


def dedup_exact() -> str:
    return """
SELECT doc_id,
       min(doc_id) OVER (
         PARTITION BY array_to_string(
           list_sort(list_distinct(string_split(text, ' '))), ' ')
       ) AS canon_id
FROM documents
"""


def _jaccard_pairs_body(tau: float, df_cap: int) -> str:
    """Shared CTE chain ending in ``pairs(a, b, jac)`` — used by both
    `jaccard_pairs` and `dup_clusters`."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
  ))) AS s FROM toks
),
counts AS MATERIALIZED (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
df AS MATERIALIZED (SELECT s, count(*) AS dfc FROM sh GROUP BY s),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN df ON df.s = a.s WHERE df.dfc <= {df_cap}
),
inter AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT c.a AS a, c.b AS b,
         round(i.i * 1.0 / (ca.nsh + cb.nsh - i.i), 6) AS jac
  FROM cand c JOIN inter i ON i.a = c.a AND i.b = c.b
  JOIN counts ca ON ca.doc_id = c.a JOIN counts cb ON cb.doc_id = c.b
  WHERE i.i * 1.0 / (ca.nsh + cb.nsh - i.i) >= {tau}
)
"""


def jaccard_pairs(tau: float = 0.5, df_cap: int = 1000) -> str:
    return _jaccard_pairs_body(tau, df_cap) + """
SELECT a, b, jac FROM pairs
"""


def dup_clusters(tau: float = 0.5, rounds: int = 6,
                 df_cap: int = 1000) -> str:
    """Near-duplicate cluster labels: exactly ``rounds`` unrolled
    synchronous min-label rounds over the Jaccard pair graph (twin of
    `queries.q_dup_clusters`). Docs in no pair are omitted."""
    sql = _jaccard_pairs_body(tau, df_cap) + """
, und AS MATERIALIZED (
  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
),
l0 AS MATERIALIZED (SELECT DISTINCT u AS v, u AS lbl FROM und)
"""
    prev = "l0"
    for k in range(1, rounds + 1):
        sql += f"""
, l{k} AS MATERIALIZED (
  SELECT v, min(lbl) AS lbl FROM (
    SELECT v, lbl FROM {prev}
    UNION ALL
    SELECT e.v AS v, l.lbl FROM und e JOIN {prev} l ON l.v = e.u
  ) GROUP BY v
)"""
        prev = f"l{k}"
    sql += f"""
SELECT v AS doc_id, CAST(lbl AS BIGINT) AS cluster FROM {prev}
"""
    return sql


def minhash_pairs(tau: float = 0.5, num_perm: int = 64, bands: int = 16,
                  seed: int = 7) -> str:
    """Bit-exact twin of `dedup.minhash_lsh_pairs`: signatures from
    md5-low-32 shingle hashes through the seeded universal-hash family
    (a, b literals below; exact in HUGEINT), banded Horner buckets
    (h = (h*1000003 + sv) mod 2^61 seeded band+1, matching the numpy
    `_fp_mulmod` fold), candidates = any shared bucket value, exact
    Jaccard verify with the green `jaccard_pairs` oracle's tail."""
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 32, size=num_perm)
    b = rng.randint(0, 1 << 32, size=num_perm)
    perm_vals = ", ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_perm)
    )
    rpb = num_perm // bands
    p61m = (1 << 61) - 1
    mod61 = 1 << 61
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
  ))) AS s FROM toks
),
counts AS MATERIALIZED (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
base AS MATERIALIZED (
  SELECT doc_id, CAST(md5_number_lower(s) % 4294967296 AS HUGEINT) AS hv
  FROM sh
),
perms(i, pa, pb) AS MATERIALIZED (SELECT * FROM (VALUES {perm_vals})),
sig AS MATERIALIZED (
  SELECT doc_id, p.i, MIN((p.pa * hv + p.pb) % {p61m}) AS sv
  FROM base CROSS JOIN perms p GROUP BY doc_id, p.i
),
chunks AS MATERIALIZED (
  SELECT doc_id, i // {rpb} AS band, list(sv ORDER BY i) AS chunk
  FROM sig GROUP BY doc_id, i // {rpb}
),
buckets AS MATERIALIZED (
  SELECT doc_id,
    list_reduce(list_prepend(CAST(band + 1 AS HUGEINT), chunk),
                (acc, x) -> (acc * 1000003 + x) % {mod61}) AS bucket
  FROM chunks
),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM buckets x JOIN buckets y ON x.bucket = y.bucket
                               AND x.doc_id < y.doc_id
),
inter AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT c.a AS a, c.b AS b,
       round(i.i * 1.0 / (ca.nsh + cb.nsh - i.i), 6) AS jac
FROM cand c JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN counts ca ON ca.doc_id = c.a JOIN counts cb ON cb.doc_id = c.b
WHERE i.i * 1.0 / (ca.nsh + cb.nsh - i.i) >= {tau}
"""


@_materialized
def mis_fixed(rounds: int = 12, seed: int = 0) -> str:
    """Fixed-round Luby MIS twin of `queries.q_mis_fixed`: LCG priorities
    prio(d) = (d*48271 + b) mod 2^31-1 on DENSE ids (label ranks), then
    ``rounds`` unrolled synchronous rounds — per round, an active vertex
    wins if its priority beats every active neighbor's (isolated actives
    win vacuously); winners and their neighbors deactivate."""
    p = 2147483647
    b = (seed * 2654435761 + 11) % p
    sql = PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d, label FROM verts
),
pri AS (
  SELECT d, label, (d * 48271 + {b}) % {p} AS prio FROM dense
),
du AS (
  SELECT ds.d AS u, dd.d AS v
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
  UNION
  SELECT dd.d, ds.d
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
),
mis0 AS (SELECT d FROM pri WHERE 1 = 0),
act0 AS (SELECT d, prio FROM pri)
"""
    prev_mis, prev_act = "mis0", "act0"
    for k in range(1, rounds + 1):
        sql += f"""
, nbmin{k} AS (
  SELECT e.u AS d, min(p2.prio) AS m
  FROM du e JOIN {prev_act} p2 ON p2.d = e.v GROUP BY e.u
),
win{k} AS (
  SELECT a.d FROM {prev_act} a LEFT JOIN nbmin{k} nb ON nb.d = a.d
  WHERE a.prio < COALESCE(nb.m, {p + 1})
),
mis{k} AS (SELECT d FROM {prev_mis} UNION SELECT d FROM win{k}),
act{k} AS (
  SELECT a.d, a.prio FROM {prev_act} a
  WHERE a.d NOT IN (SELECT d FROM win{k})
    AND NOT EXISTS (SELECT 1 FROM du e JOIN win{k} w ON w.d = e.v
                    WHERE e.u = a.d)
)"""
        prev_mis, prev_act = f"mis{k}", f"act{k}"
    sql += f"""
SELECT p3.label AS label,
       CAST(CASE WHEN m.d IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_mis
FROM pri p3 LEFT JOIN {prev_mis} m ON m.d = p3.d
"""
    return sql


@_materialized
def coloring_fixed(rounds: int = 8, b: int = 37) -> str:
    """Fixed-round Jones-Plassmann twin of `queries.q_coloring_fixed`:
    LCG priorities on dense ids; per unrolled round, an uncolored vertex
    wins when its priority is below every uncolored neighbor's, then
    takes the smallest color absent among its already-colored neighbors
    (MIN over generate_series with a NOT EXISTS color probe — the SQL
    analog of the engine's bor_second lowest-zero-bit mask)."""
    p = 2147483647
    sql = PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d, label FROM verts
),
pri AS (
  SELECT d, label, (d * 48271 + {b}) % {p} AS prio FROM dense
),
du AS (
  SELECT ds.d AS u, dd.d AS v
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
  UNION
  SELECT dd.d, ds.d
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
),
col0 AS (SELECT d, CAST(0 AS BIGINT) AS c FROM pri WHERE 1 = 0)
"""
    prev = "col0"
    for k in range(1, rounds + 1):
        sql += f"""
, unc{k} AS (
  SELECT p2.d, p2.prio FROM pri p2
  WHERE p2.d NOT IN (SELECT d FROM {prev})
),
nbmin{k} AS (
  SELECT e.u AS d, min(q.prio) AS m
  FROM du e JOIN unc{k} q ON q.d = e.v GROUP BY e.u
),
win{k} AS (
  SELECT u.d FROM unc{k} u LEFT JOIN nbmin{k} nb ON nb.d = u.d
  WHERE u.prio < COALESCE(nb.m, {p + 1})
),
newc{k} AS (
  SELECT w.d, min(gs.c) AS c
  FROM win{k} w CROSS JOIN generate_series(0, 61) gs(c)
  WHERE NOT EXISTS (SELECT 1 FROM du e JOIN {prev} pc ON pc.d = e.v
                    WHERE e.u = w.d AND pc.c = gs.c)
  GROUP BY w.d
),
col{k} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM newc{k})"""
        prev = f"col{k}"
    sql += f"""
SELECT p3.label AS label, CAST(COALESCE(cc.c, -1) AS BIGINT) AS color
FROM pri p3 LEFT JOIN {prev} cc ON cc.d = p3.d
"""
    return sql


def _matching_chain(rounds: int = 12, b: int = 23) -> tuple:
    """Shared fixed-round maximal-matching CTE chain (LCG priorities,
    propose/accept rounds — see `matching_fixed`); returns (sql_body,
    final_match_cte). Reused by `matching_fixed` and `coarsen`."""
    p = 2147483647
    sql = PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d, label FROM verts
),
pri AS (
  SELECT d, label, (d * 48271 + {b}) % {p} AS prio FROM dense
),
du AS (
  SELECT ds.d AS u, dd.d AS v
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
  UNION
  SELECT dd.d, ds.d
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
),
match0 AS (SELECT d, d AS mate FROM pri WHERE 1 = 0)
"""
    prev = "match0"
    for k in range(1, rounds + 1):
        sql += f"""
, um{k} AS (
  SELECT pr.d, pr.prio FROM pri pr
  LEFT JOIN {prev} m ON m.d = pr.d WHERE m.d IS NULL
),
x{k} AS (
  SELECT u.d, u.prio * p.n + u.d AS x FROM um{k} u CROSS JOIN params p
),
nb{k} AS (
  SELECT e.u AS d, min(x.x) AS nbx
  FROM du e JOIN x{k} x ON x.d = e.v GROUP BY e.u
),
prop{k} AS (
  SELECT nb.nbx % p.n AS partner, u.prio * p.n + u.d AS code
  FROM um{k} u JOIN nb{k} nb ON nb.d = u.d CROSS JOIN params p
  WHERE u.prio < nb.nbx // p.n
),
acc{k} AS (
  SELECT b2.t AS d, b2.bc % p.n AS mate
  FROM (SELECT partner AS t, min(code) AS bc FROM prop{k}
        GROUP BY partner) b2
  CROSS JOIN params p
),
match{k} AS (
  SELECT d, mate FROM {prev}
  UNION ALL SELECT d, mate FROM acc{k}
  UNION ALL SELECT mate AS d, d AS mate FROM acc{k}
)"""
        prev = f"match{k}"
    return sql, prev


@_materialized
def matching_fixed(rounds: int = 12, b: int = 23) -> str:
    """Fixed-round maximal-matching twin of `queries.q_matching_fixed`.
    Per round over unmatched vertices with LCG priorities
    prio(d) = (d*48271 + b) mod 2^31-1: encode x = prio*n + d, nb = min x
    over neighbors, v proposes to nb%n when prio(v) < nb//n, each target
    accepts its min-code proposer, both endpoints leave the pool.
    Proposers are never targets (a proposer beats every unmatched
    neighbor's priority), so the per-round accepts are conflict-free —
    identical to the engine kernels `_mm_x/_mm_props/_mm_accept`."""
    sql, prev = _matching_chain(rounds, b)
    sql += f"""
SELECT da.label AS label, db.label AS partner
FROM {prev} m
JOIN dense da ON da.d = m.d JOIN dense db ON db.d = m.mate
WHERE m.d < m.mate
"""
    return sql


def ann_topk(nq: int = 10, k: int = 5) -> str:
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {nq}),
sims AS (
  SELECT q.qid, e.vec_id AS nid,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q, embeddings e WHERE e.vec_id <> q.qid
)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS BIGINT) AS rnk
FROM (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
  FROM sims
)
WHERE rn <= {k}
"""


def ann_lsh(nq: int = 10, k: int = 5, nbits: int = 6, probe_bits: int = 2,
            seed: int = 11, dim: int = 64) -> str:
    """Multi-probe sign-LSH ANN re-derived in SQL: seeded hyperplanes as
    DOUBLE literals, per-vector sign codes, candidates = vectors whose
    code equals the query's code xor any <=probe_bits-bit flip, exact
    cosine re-rank with the (sim DESC, id ASC) tie-break of the green
    brute-force `ann_topk` oracle. Mirrors `ann.py:ann_lsh_topk`."""
    code_expr, flip_vals = _lsh_sql_parts(nbits, probe_bits, seed, dim)
    return f"""
WITH codes AS MATERIALIZED (
  SELECT vec_id, {code_expr} AS code FROM embeddings
),
q AS MATERIALIZED (
  SELECT e.vec_id AS qid, e.embedding AS qe, c.code AS qcode
  FROM embeddings e JOIN codes c ON c.vec_id = e.vec_id
  WHERE e.vec_id < {nq}
),
sims AS MATERIALIZED (
  SELECT q.qid, e.vec_id AS nid,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q
  CROSS JOIN (VALUES {flip_vals}) AS f(flip)
  JOIN codes c ON c.code = xor(q.qcode, f.flip)
  JOIN embeddings e ON e.vec_id = c.vec_id AND e.vec_id <> q.qid
)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS BIGINT) AS rnk
FROM (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
  FROM sims
)
WHERE rn <= {k}
"""


@_materialized
def bfs_parents(root_label: str = "m_0", iters: int = 12) -> str:
    """Parent = lexicographically smallest neighbor one level closer
    (deterministic independently of frontier mechanics)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
SELECT v.label AS label,
       CASE WHEN d.dist = 0 THEN v.label ELSE (
         SELECT min(vp.label)
         FROM und u JOIN {prev} dp ON dp.i = u.src
         JOIN verts vp ON vp.i = u.src
         WHERE u.dst = d.i AND dp.dist = d.dist - 1
       ) END AS parent_label
FROM {prev} d JOIN verts v ON v.i = d.i
"""
    return sql


@_materialized
def colstochastic() -> str:
    return PREFIX + """
, outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src)
SELECT vs.label AS src_label, vd.label AS dst_label,
       round(e.w / o.ow, 10) AS w_norm
FROM edges e JOIN outw o ON o.src = e.src
JOIN verts vs ON vs.i = e.src JOIN verts vd ON vd.i = e.dst
"""


@_materialized
def masked_colsums() -> str:
    return PREFIX + """
SELECT v.label AS label, sum(e.w) AS msum
FROM edges e JOIN verts v ON v.i = e.dst
WHERE e.src % 5 = 0
GROUP BY v.label
"""


@_materialized
def ewise_apply_outer() -> str:
    return PREFIX + """
, at AS (SELECT dst AS src, src AS dst, w FROM edges),
j AS (
  SELECT coalesce(a.src, b.src) AS src, coalesce(a.dst, b.dst) AS dst,
         2.0 * coalesce(a.w, 0.0) + coalesce(b.w, 0.0) AS val
  FROM edges a FULL OUTER JOIN at b ON b.src = a.src AND b.dst = a.dst
)
SELECT vs.label AS src_label, vd.label AS dst_label, j.val AS val
FROM j JOIN verts vs ON vs.i = j.src JOIN verts vd ON vd.i = j.dst
"""


def sessions(gap_minutes: int = 30) -> str:
    return f"""
WITH ordered AS (
  SELECT event_id, ts, user_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tagged AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM ordered
)
SELECT user_id,
       min(event_id) AS session_start_event,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM tagged GROUP BY user_id, sess
"""


@_materialized
def prune_rect() -> str:
    return PREFIX + """
SELECT vs.label AS src_label, vd.label AS dst_label, e.w AS w
FROM edges e
JOIN verts vs ON vs.i = e.src JOIN verts vd ON vd.i = e.dst
WHERE NOT (e.src % 7 = 0 AND e.dst % 3 = 0)
"""


@_materialized
def spasgn() -> str:
    return PREFIX + """
, carved AS (
  SELECT src, dst, w FROM edges
  WHERE NOT (src % 7 = 0 AND dst % 7 = 0)
),
assigned AS (
  SELECT src, dst, w FROM carved
  UNION ALL
  SELECT i AS src, i AS dst, 9.0 AS w FROM files WHERE i % 7 = 0
)
SELECT vs.label AS src_label, vd.label AS dst_label, a.w AS w
FROM assigned a
JOIN verts vs ON vs.i = a.src JOIN verts vd ON vd.i = a.dst
"""


@_materialized
def subsref_perm() -> str:
    """B = A(ri, ci), ri/ci permuted + repeated + rectangular: every edge
    (src, dst) expands to all (i, j) with ri[i]=src, ci[j]=dst."""
    return PREFIX + """
, ri AS (SELECT t.i AS i, (7 * t.i + 3) % 101 AS v
         FROM generate_series(0, 199) t(i)),
ci AS (SELECT t.j AS j, (5 * t.j + 2) % 173 AS v
       FROM generate_series(0, 149) t(j))
SELECT r.i AS bi, c.j AS bj, e.w AS w
FROM edges e JOIN ri r ON r.v = e.src JOIN ci c ON c.v = e.dst
"""


@_materialized
def spasgn_general() -> str:
    """A(ri, ci) := B: carve the ri x ci cross product, insert B mapped
    through the index vectors."""
    return PREFIX + """
, ri AS (SELECT t.i AS i, (11 * t.i + 5) % p.n AS v
         FROM generate_series(0, 299) t(i) CROSS JOIN params p),
ci AS (SELECT t.j AS j, (13 * t.j + 1) % p.n AS v
       FROM generate_series(0, 199) t(j) CROSS JOIN params p),
carved AS (
  SELECT e.src, e.dst, e.w FROM edges e
  WHERE e.src NOT IN (SELECT v FROM ri)
     OR e.dst NOT IN (SELECT v FROM ci)
),
bmap AS (
  SELECT r.v AS src, c.v AS dst, CAST(1 + (r.i % 4) AS DOUBLE) AS w
  FROM ri r JOIN ci c ON c.j = (5 * r.i + 2) % 200
),
assigned AS (
  SELECT src, dst, w FROM carved
  UNION ALL
  SELECT src, dst, w FROM bmap
)
SELECT vs.label AS src_label, vd.label AS dst_label, a.w AS w
FROM assigned a
JOIN verts vs ON vs.i = a.src JOIN verts vd ON vd.i = a.dst
"""


def clean_corpus() -> str:
    return """
WITH stats AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text,' '))) * 1.0
           / greatest(len(string_split(text,' ')), 1) AS dr,
         min(doc_id) OVER (
           PARTITION BY array_to_string(
             list_sort(list_distinct(string_split(text, ' '))), ' ')
         ) AS canon_id
  FROM documents
)
SELECT doc_id FROM stats
WHERE dr >= 0.3 AND n_tokens >= 20 AND doc_id = canon_id
"""


def token_counts_re() -> str:
    return r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
            AS BIGINT) AS n_re_tokens
FROM documents
"""


@_materialized
def spmm_batch() -> str:
    return PREFIX + """
SELECT v.label AS label,
       sum(e.w * (((e.src + 0) % 7) + 1)) AS y0,
       sum(e.w * (((e.src + 1) % 7) + 1)) AS y1,
       sum(e.w * (((e.src + 2) % 7) + 1)) AS y2
FROM edges e JOIN verts v ON v.i = e.dst GROUP BY v.label
"""


@_materialized
def reduce_rowmin() -> str:
    return PREFIX + """
SELECT v.label AS label, min(e.w) AS minw
FROM edges e JOIN verts v ON v.i = e.src GROUP BY v.label
"""


@_materialized
def vec_ewise_add() -> str:
    return PREFIX + """
, outd AS (SELECT src AS i, count(*) AS c FROM edges GROUP BY src),
ind AS (SELECT dst AS i, count(*) AS c FROM edges GROUP BY dst),
j AS (
  SELECT coalesce(o.i, d.i) AS i,
         CAST(coalesce(o.c, 0) + 2 * coalesce(d.c, 0) AS DOUBLE) AS val
  FROM outd o FULL OUTER JOIN ind d ON d.i = o.i
)
SELECT v.label AS label, j.val AS val FROM j JOIN verts v ON v.i = j.i
"""


@_materialized
def vec_argmin() -> str:
    return PREFIX + """
, ind AS (SELECT dst AS i, count(*) AS c FROM edges GROUP BY dst)
SELECT v.label AS label, CAST(d.c AS BIGINT) AS minval
FROM ind d JOIN verts v ON v.i = d.i
ORDER BY d.c ASC, v.label ASC LIMIT 1
"""


def asof_click() -> str:
    return """
SELECT event_id,
       coalesce(
         max_by(event_id, ts) FILTER (event_type = 'click')
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         -1) AS prior_click
FROM events
"""


@_materialized
def prune_column() -> str:
    """PruneColumn(pvals=colmax, lt): keep only per-column (src) maxima."""
    return PREFIX + """
, colmax AS (SELECT src, max(w) AS mw FROM edges GROUP BY src)
SELECT vs.label AS src_label, vd.label AS dst_label, e.w AS w
FROM edges e
JOIN colmax c ON c.src = e.src
JOIN verts vs ON vs.i = e.src JOIN verts vd ON vd.i = e.dst
WHERE e.w >= c.mw
"""


@_materialized
def prune_column_idx() -> str:
    """PruneColumnByIndex: drop columns with src % 5 == 0."""
    return PREFIX + """
SELECT vs.label AS src_label, vd.label AS dst_label, e.w AS w
FROM edges e
JOIN verts vs ON vs.i = e.src JOIN verts vd ON vd.i = e.dst
WHERE e.src % 5 != 0
"""


def embed_dups(tau: float = 0.4) -> str:
    """Exact all-pairs cosine near-dup (pairs only — no float column, so
    the hash compare is ulp-safe; tau sits in a gap of the sim
    distribution)."""
    return f"""
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {tau}
"""


def _lsh_sql_parts(nbits: int, probe_bits: int, seed: int, dim: int):
    """(code_expr, flip_vals) shared by the sign-LSH oracles: seeded
    hyperplanes as 17-sig-digit DOUBLE literals (exact float64
    round-trip; MUST stay bit-identical to `ann.lsh_planes` +
    `_sign_codes`) and the multi-probe flip VALUES list."""
    import itertools

    import numpy as np

    planes = np.random.RandomState(seed).randn(nbits, dim)
    code_expr = " + ".join(
        "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ", ".join("%.17g" % v for v in row)
        + f"]) > 0 THEN {1 << i} ELSE 0 END)"
        for i, row in enumerate(planes)
    )
    flips = [0] + [
        sum(1 << b for b in combo)
        for r in range(1, probe_bits + 1)
        for combo in itertools.combinations(range(nbits), r)
    ]
    return code_expr, ", ".join(f"({f})" for f in flips)


def fingerprint() -> str:
    """Bit-exact twin of `text.fingerprint`: Horner chain
    h = (h*1000003 + md5_number_lower(tok) % 2^61) % 2^61 via
    list_transform + list_reduce in HUGEINT (the multiply overflows
    int64)."""
    p = 1 << 61
    return f"""
SELECT doc_id,
  CAST(list_reduce(
    list_prepend(CAST(0 AS HUGEINT),
      list_transform(string_split(text, ' '),
                     t -> CAST(md5_number_lower(t) % {p} AS HUGEINT))),
    (acc, x) -> (acc * 1000003 + x) % {p}
  ) AS BIGINT) AS fingerprint
FROM documents
"""


_SIMHASH_CODES = """
toks AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
bits AS MATERIALIZED (
  SELECT doc_id, j,
         SUM(CASE WHEN (md5_number_lower(tok) >> j) & 1 = 1
                  THEN 1 ELSE -1 END) AS s
  FROM toks CROSS JOIN generate_series(0, 63) AS g(j)
  GROUP BY doc_id, j
),
codes AS MATERIALIZED (
  SELECT doc_id,
    CAST(SUM(CASE WHEN s > 0 AND j < 63 THEN CAST(1 AS HUGEINT) << j ELSE 0 END)
       + SUM(CASE WHEN s > 0 AND j = 63
                  THEN CAST(-9223372036854775808 AS HUGEINT) ELSE 0 END)
    AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)"""


def simhash_sql() -> str:
    """Bit-exact twin of `dedup.simhash`: per-bit signed token-occurrence
    majority over md5_number_lower hashes, reassembled into the int64
    bit pattern (bit 63 contributes -2^63)."""
    return "WITH " + _SIMHASH_CODES + """
SELECT doc_id, simhash FROM codes
"""


def embed_dups_lsh(tau: float = 0.4, nbits: int = 4, probe_bits: int = 1,
                   seed: int = 11, dim: int = 64) -> str:
    """Sign-LSH-bucketed near-dup, fully re-derived in SQL: the seeded
    hyperplanes are emitted as DOUBLE literals (17 sig digits = exact
    float64 round-trip), sign codes via list_dot_product on the
    DOUBLE-cast embeddings (sign is normalization-invariant), multi-probe
    buckets via least(code, xor(code, flip)), candidates = shared-bucket
    pairs, exact cosine verify (same kernel as the green `embed_dups`
    oracle). Mirrors `functions/ann.py:embedding_dup_pairs_lsh`."""
    code_expr, flip_vals = _lsh_sql_parts(nbits, probe_bits, seed, dim)
    return f"""
WITH codes AS MATERIALIZED (
  SELECT vec_id, {code_expr} AS code FROM embeddings
),
buckets AS MATERIALIZED (
  SELECT vec_id, least(code, xor(code, f.flip)) AS bucket
  FROM codes, (VALUES {flip_vals}) AS f(flip)
),
cands AS MATERIALIZED (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM buckets x JOIN buckets y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT c.a, c.b
FROM cands c
JOIN embeddings ea ON ea.vec_id = c.a
JOIN embeddings eb ON eb.vec_id = c.b
WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {tau}
"""


@_materialized
def ewise_scale() -> str:
    """EWiseScale by the functional dense matrix ((i + 2j) % 5) + 1."""
    return PREFIX + """
SELECT vs.label AS src_label, vd.label AS dst_label,
       e.w * ((e.dst + 2 * e.src) % 5 + 1) AS w
FROM edges e
JOIN verts vs ON vs.i = e.src JOIN verts vd ON vd.i = e.dst
"""


@_materialized
def sample_edges() -> str:
    """Deterministic 10% Knuth-hash edge sample in DENSE-id space: dense
    id = rank of label; key = dsrc*n + ddst."""
    return PREFIX + """
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d FROM verts
)
SELECT vs.label AS src_label, vd.label AS dst_label, e.w AS w
FROM edges e
JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
JOIN verts vs ON vs.i = e.src JOIN verts vd ON vd.i = e.dst
CROSS JOIN params p
WHERE (((ds.d * p.n + dd.d) % 1048576) * 2654435761 + (ds.d * p.n + dd.d) // 1048576) % 4294967296 % 100 < 10
"""


@_materialized
def randperm_edges() -> str:
    """Modular-permutation relabeling in arithmetic space."""
    return PREFIX + """
SELECT (e.src * 48271) % p.n AS psrc,
       (e.dst * 48271) % p.n AS pdst,
       e.w AS w
FROM edges e CROSS JOIN params p
"""


@_materialized
def rcm_ordering(cc_iters: int = 12, bfs_iters: int = 16) -> str:
    """RCM ordering, fully re-derived in SQL (dense-id space): structural
    undirected degree, min-label CC fixpoint, per-component min-(deg,id)
    roots, unrolled multi-source BFS levels, then the reversed
    (comp, level, deg, id) lexicographic rank."""
    sql = PREFIX + """
, dense AS (SELECT i, row_number() OVER (ORDER BY label) - 1 AS d FROM verts),
dpairs AS (
  SELECT ds.d AS a, dd.d AS b FROM edges e
  JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
  WHERE ds.d <> dd.d
),
dund AS (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM dpairs UNION ALL SELECT b, a FROM dpairs
  )
),
allv AS (SELECT d AS v FROM dense),
degs AS (
  SELECT av.v, coalesce(cnt.c, 0) AS deg
  FROM allv av LEFT JOIN (
    SELECT a AS v, count(*) AS c FROM dund GROUP BY a
  ) cnt ON cnt.v = av.v
),
l0 AS (SELECT v, v AS comp FROM allv)
"""
    prev = "l0"
    for k in range(1, cc_iters + 1):
        sql += f"""
, l{k} AS (
  SELECT a.v, least(l.comp, coalesce(m.mn, l.comp)) AS comp
  FROM allv a JOIN {prev} l ON l.v = a.v
  LEFT JOIN (
    SELECT u.b AS v, min(lp.comp) AS mn
    FROM dund u JOIN {prev} lp ON lp.v = u.a GROUP BY u.b
  ) m ON m.v = a.v
)"""
        prev = f"l{k}"
    sql += f"""
, comps AS (SELECT v, comp FROM {prev}),
roots AS (
  SELECT v FROM (
    SELECT c.v,
           row_number() OVER (PARTITION BY c.comp
                              ORDER BY g.deg, c.v) AS rn
    FROM comps c JOIN degs g ON g.v = c.v
  ) WHERE rn = 1
),
d0 AS (SELECT v, 0 AS dist FROM roots)
"""
    prev = "d0"
    for k in range(1, bfs_iters + 1):
        sql += f"""
, d{k} AS (
  SELECT v, min(dist) AS dist FROM (
    SELECT v, dist FROM {prev}
    UNION ALL
    SELECT u.b AS v, dp.dist + 1 AS dist
    FROM dund u JOIN {prev} dp ON dp.v = u.a
  ) GROUP BY v
)"""
        prev = f"d{k}"
    sql += f"""
, levels AS (
  SELECT a.v, coalesce(d.dist, p.n) AS lvl
  FROM allv a CROSS JOIN params p LEFT JOIN {prev} d ON d.v = a.v
),
ranked AS (
  SELECT c.v,
         row_number() OVER (
           ORDER BY c.comp, lv.lvl, g.deg, c.v
         ) - 1 AS rn
  FROM comps c JOIN levels lv ON lv.v = c.v JOIN degs g ON g.v = c.v
)
SELECT vt.label AS label,
       CAST(p.n - 1 - r.rn AS BIGINT) AS rcm_index
FROM ranked r CROSS JOIN params p
JOIN dense dn ON dn.d = r.v JOIN verts vt ON vt.i = dn.i
"""
    return sql


@_materialized
def knn_components(k: int = 5, cc_iters: int = 25) -> str:
    """kNN-graph communities re-derived in SQL: exact cosine top-k per
    vector (ties by neighbor id), symmetrized, then unrolled min-label
    CC — component = min vec_id (no label mapping involved)."""
    sql = f"""
WITH sims AS MATERIALIZED (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
topk AS MATERIALIZED (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY sim DESC, nid ASC) AS rn
    FROM sims
  ) WHERE rn <= {k}
),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT qid AS a, nid AS b FROM topk
    UNION ALL SELECT nid, qid FROM topk
  )
),
verts2 AS MATERIALIZED (SELECT DISTINCT vec_id AS v FROM embeddings),
l0 AS MATERIALIZED (SELECT v, v AS comp FROM verts2)
"""
    prev = "l0"
    for i in range(1, cc_iters + 1):
        sql += f"""
, l{i} AS MATERIALIZED (
  SELECT a.v, least(l.comp, coalesce(m.mn, l.comp)) AS comp
  FROM verts2 a JOIN {prev} l ON l.v = a.v
  LEFT JOIN (
    SELECT u.b AS v, min(lp.comp) AS mn
    FROM und u JOIN {prev} lp ON lp.v = u.a GROUP BY u.b
  ) m ON m.v = a.v
)"""
        prev = f"l{i}"
    sql += f"""
SELECT v AS vec_id, CAST(comp AS BIGINT) AS component FROM {prev}
"""
    return sql


@_materialized
def randperm_sorted(seed: int = 7) -> str:
    """Sort-based RandPerm: rank of the seeded LCG key (a*i + b) mod P,
    P = 2^31-1 prime — a bijection, so ORDER BY is tie-free."""
    b = (seed * 2654435761 + 11) % 2147483647
    return PREFIX + f"""
SELECT 'm_' || i AS label,
       row_number() OVER (ORDER BY (i * 48271 + {b}) % 2147483647) - 1 AS p
FROM files
"""


@_materialized
def filtered_bfs_payload(root_label: str = "m_0", iters: int = 12,
                         latest_min: int = 300) -> str:
    """Unrolled BFS distances on the DIRECTED graph restricted to edges
    whose arithmetic payload passes cnt > 0 AND latest >= latest_min
    (cnt = (src*7 + dst) % 5, latest = (src + 2*dst) % 1000)."""
    sql = PREFIX + f"""
, fedges AS (
  SELECT src, dst FROM edges
  WHERE (src * 7 + dst) % 5 > 0 AND (src + 2 * dst) % 1000 >= {latest_min}
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM fedges u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
SELECT v.label AS label, CAST(d.dist AS BIGINT) AS dist
FROM {prev} d JOIN verts v ON v.i = d.i
"""
    return sql


@_materialized
def clustering_coeff() -> str:
    """Per-vertex triangles / degree / local clustering coefficient.
    `coeff` is deliberately NOT rounded: both sides evaluate the
    identical IEEE expression (2.0*tri)/(deg*(deg-1.0)) over exact
    integers, so the doubles compare bit-equal."""
    return PREFIX + """
, und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges GROUP BY 1, 2
),
uadj AS (SELECT a AS v, b AS u FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT v, count(*) AS d FROM uadj GROUP BY v),
tri AS (
  SELECT x.v AS v, count(*) AS t
  FROM uadj x JOIN uadj y ON x.v = y.v AND x.u < y.u
  JOIN und t2 ON t2.a = x.u AND t2.b = y.u
  GROUP BY x.v
)
SELECT vt.label AS label,
       CAST(coalesce(d.d, 0) AS BIGINT) AS deg,
       CAST(coalesce(tr.t, 0) AS BIGINT) AS tri,
       CASE WHEN coalesce(d.d, 0) >= 2
            THEN 2.0 * coalesce(tr.t, 0) / (d.d * (d.d - 1.0))
            ELSE 0.0 END AS coeff
FROM verts vt
LEFT JOIN deg d ON d.v = vt.i
LEFT JOIN tri tr ON tr.v = vt.i
"""


@_materialized
def kcore_fixed(k: int, rounds: int) -> str:
    """Exactly-`rounds` synchronous k-core peel rounds."""
    sql = PREFIX + """
, und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges GROUP BY 1, 2
),
uadj AS (SELECT a AS v, b AS u FROM und UNION ALL SELECT b, a FROM und),
act0 AS (SELECT i FROM files)
"""
    prev = "act0"
    for r in range(1, rounds + 1):
        sql += f"""
, act{r} AS (
  SELECT a.v AS i
  FROM uadj a
  JOIN {prev} s ON s.i = a.u
  JOIN {prev} m ON m.i = a.v
  GROUP BY a.v HAVING count(*) >= {k}
)"""
        prev = f"act{r}"
    sql += f"""
SELECT vt.label AS label,
       CAST(CASE WHEN a.i IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core
FROM verts vt LEFT JOIN {prev} a ON a.i = vt.i
"""
    return sql


@_materialized
def hits_fixed(iters: int) -> str:
    """Exactly-`iters` un-normalized HITS iterations over the STRUCTURAL
    directed graph (each distinct (src, dst) pair counts once); integer
    sums end-to-end."""
    if iters < 1:
        raise ValueError("hits_fixed oracle: iters must be >= 1 "
                         "(the final SELECT references a{iters})")
    sql = PREFIX + """
, dpairs AS (SELECT src, dst FROM edges),
h0 AS (SELECT i, CAST(1 AS BIGINT) AS h FROM files)
"""
    prev_h = "h0"
    for it in range(1, iters + 1):
        sql += f"""
, a{it} AS (
  SELECT f.i, coalesce(s.s, 0) AS a
  FROM files f LEFT JOIN (
    SELECT e.dst AS i, sum(h.h) AS s
    FROM dpairs e JOIN {prev_h} h ON h.i = e.src GROUP BY e.dst
  ) s ON s.i = f.i
),
h{it} AS (
  SELECT f.i, coalesce(s.s, 0) AS h
  FROM files f LEFT JOIN (
    SELECT e.src AS i, sum(a.a) AS s
    FROM dpairs e JOIN a{it} a ON a.i = e.dst GROUP BY e.src
  ) s ON s.i = f.i
)"""
        prev_h = f"h{it}"
    sql += f"""
SELECT vt.label AS label,
       CAST(a.a AS BIGINT) AS auth, CAST(h.h AS BIGINT) AS hub
FROM verts vt
JOIN a{iters} a ON a.i = vt.i
JOIN h{iters} h ON h.i = vt.i
"""
    return sql


def katz_fixed(iters: int = 3, alpha: float = 0.125) -> str:
    """Exactly-`iters` truncated Katz iterations over the structural
    directed graph. alpha is a power of two, so every value is a dyadic
    rational and the DOUBLE sums are order-free exact — the float column
    hash-matches bit-for-bit (twin of `queries.q_katz_fixed`)."""
    if iters < 1:
        raise ValueError("katz_fixed oracle: iters must be >= 1")
    sql = PREFIX + """
, dpairs AS (SELECT src, dst FROM edges),
x0 AS (SELECT i, CAST(1 AS DOUBLE) AS x FROM files)
"""
    prev = "x0"
    for it in range(1, iters + 1):
        sql += f"""
, x{it} AS (
  SELECT f.i, 1 + {alpha!r} * coalesce(s.s, 0) AS x
  FROM files f LEFT JOIN (
    SELECT e.dst AS i, sum(xp.x) AS s
    FROM dpairs e JOIN {prev} xp ON xp.i = e.src GROUP BY e.dst
  ) s ON s.i = f.i
)"""
        prev = f"x{it}"
    sql += f"""
SELECT vt.label AS label, x.x AS katz
FROM verts vt JOIN {prev} x ON x.i = vt.i
"""
    return sql


def countmin(d: int = 4, w: int = 512) -> str:
    """The identical Count-Min sketch rebuilt in SQL: row r's bucket =
    (md5_number_lower(tok) >> 16r) & (w-1) (twin of
    `queries.q_countmin`)."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
h AS MATERIALIZED (SELECT md5_number_lower(tok) AS h FROM toks),
rb AS (
  SELECT rr.r AS r, CAST((h.h >> (16 * rr.r)) & {w - 1} AS BIGINT) AS b
  FROM h CROSS JOIN generate_series(0, {d - 1}) rr(r)
)
SELECT r, b, count(*) AS cnt FROM rb GROUP BY r, b
"""


def vocab_topk(k: int = 100) -> str:
    return f"""
WITH tok AS MATERIALIZED (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT tok, CAST(count(*) AS BIGINT) AS cnt
FROM tok GROUP BY tok
ORDER BY cnt DESC, tok ASC
LIMIT {k}
"""


def decontaminate(mod: int = 97) -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
  ))) AS s FROM toks
),
bench AS MATERIALIZED (SELECT DISTINCT s FROM sh WHERE doc_id % {mod} = 0)
SELECT sh.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_contam
FROM sh JOIN bench b ON b.s = sh.s
WHERE sh.doc_id % {mod} <> 0
GROUP BY sh.doc_id
"""


@_materialized
def ppr(iters: int = 10, damping: float = 0.85, seed_mod: int = 101) -> str:
    """Personalized PageRank: teleport + dangling mass on the seed set
    {i %% seed_mod == 0}; r0 = teleport vector; unrolled iterations."""
    d = damping
    sql = PREFIX + f"""
, seeds AS (SELECT i FROM files WHERE i % {seed_mod} = 0),
sc AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM seeds),
tvec AS (
  SELECT f.i,
         CASE WHEN s.i IS NOT NULL THEN 1.0 / sc.c ELSE 0.0 END AS tv
  FROM files f CROSS JOIN sc LEFT JOIN seeds s ON s.i = f.i
),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
r0 AS (SELECT i, tv AS score FROM tvec)
"""
    prev = "r0"
    for k in range(1, iters + 1):
        sql += f"""
, dang{k} AS (
  SELECT coalesce(sum(r.score), 0.0) AS dm FROM {prev} r
  LEFT JOIN outw o ON o.src = r.i WHERE o.src IS NULL
),
contrib{k} AS (
  SELECT e.dst AS i, sum(r.score * e.w / o.ow) AS c
  FROM edges e JOIN {prev} r ON r.i = e.src JOIN outw o ON o.src = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT t.i,
         (1.0 - {d}) * t.tv + {d} * (coalesce(c.c, 0.0) + dg.dm * t.tv)
           AS score
  FROM tvec t CROSS JOIN dang{k} dg
  LEFT JOIN contrib{k} c ON c.i = t.i
)"""
        prev = f"r{k}"
    sql += f"""
SELECT v.label AS label, round(r.score * p.n, 6) AS score
FROM {prev} r JOIN verts v ON v.i = r.i CROSS JOIN params p
"""
    return sql


def containment_pairs(tau: float = 0.8, df_cap: int = 1000) -> str:
    """Twin of `jaccard_pairs` with containment = inter / min size."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
  ))) AS s FROM toks
),
counts AS MATERIALIZED (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
df AS MATERIALIZED (SELECT s, count(*) AS dfc FROM sh GROUP BY s),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN df ON df.s = a.s WHERE df.dfc <= {df_cap}
),
inter AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT c.a AS a, c.b AS b,
       round(i.i * 1.0 / least(ca.nsh, cb.nsh), 6) AS cont
FROM cand c JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN counts ca ON ca.doc_id = c.a JOIN counts cb ON cb.doc_id = c.b
WHERE i.i * 1.0 / least(ca.nsh, cb.nsh) >= {tau}
"""


@_materialized
def ktruss_fixed(k: int, rounds: int) -> str:
    """Exactly-`rounds` synchronous k-truss edge-peel rounds: per round,
    support(edge) = triangles over the CURRENT edge set; keep edges with
    support >= k-2."""
    sql = PREFIX + """
, t0 AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges GROUP BY 1, 2
)
"""
    prev = "t0"
    for r in range(1, rounds + 1):
        sql += f"""
, adj{r} AS (
  SELECT a AS v, b AS u FROM {prev} UNION ALL SELECT b, a FROM {prev}
),
supp{r} AS (
  SELECT e.a, e.b, count(*) AS c
  FROM {prev} e
  JOIN adj{r} x ON x.v = e.a AND x.u <> e.b
  JOIN {prev} t ON t.a = least(x.u, e.b) AND t.b = greatest(x.u, e.b)
  GROUP BY e.a, e.b
),
t{r} AS (
  SELECT e.a, e.b FROM {prev} e
  LEFT JOIN supp{r} s ON s.a = e.a AND s.b = e.b
  WHERE coalesce(s.c, 0) >= {k - 2}
)"""
        prev = f"t{r}"
    sql += f"""
SELECT least(va.label, vb.label) AS a_label,
       greatest(va.label, vb.label) AS b_label
FROM {prev} e
JOIN verts va ON va.i = e.a JOIN verts vb ON vb.i = e.b
"""
    return sql


def sample_stratified(quota: dict | None = None, default: int = 50) -> str:
    q = quota or {"en": 25, "de": 60, "es": 60, "fr": 60, "zh": 60}
    cases = " ".join(f"WHEN '{lg}' THEN {r}" for lg, r in sorted(q.items()))
    return f"""
SELECT doc_id, lang FROM documents
WHERE (doc_id * 48271 + 11) % 100 < CASE lang {cases} ELSE {default} END
"""


def redact(patterns=None, repl: str = "[REDACTED]") -> str:
    """Sequential per-pattern chain matching `text.Redactor`: pattern i
    is counted and replaced on the text AFTER patterns 1..i-1 ran (both
    engines are RE2, so match semantics are identical)."""
    pats = list(patterns) if patterns is not None else [
        r"\b\d{3}-\d{2}-\d{4}\b",
        r"[A-Za-z0-9._]+@[A-Za-z0-9.]+",
        r"\bspark\b",
    ]
    sql = """
WITH t0 AS MATERIALIZED (
  SELECT doc_id, text AS s, CAST(0 AS BIGINT) AS n FROM documents
)"""
    prev = "t0"
    for i, p in enumerate(pats, 1):
        sql += f"""
, t{i} AS MATERIALIZED (
  SELECT doc_id,
         regexp_replace(s, '{p}', '{repl}', 'g') AS s,
         n + len(regexp_extract_all(s, '{p}')) AS n
  FROM {prev}
)"""
        prev = f"t{i}"
    sql += f"""
SELECT doc_id, s AS clean, n AS n_redact FROM {prev}
"""
    return sql


def tpch_q3(seg: str = "BUILDING", date: str = "1998-01-01") -> str:
    """Three-table join chain + top-10; revenue in exact integer cents
    (matches `queries.q_tpch_q3`'s floor(price*(1-disc)*100) per line —
    identical IEEE double products, order-free integer sum)."""
    return f"""
SELECT l.l_orderkey AS l_orderkey,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS rev_cents,
       min(o.o_orderdate) AS o_orderdate,
       min(o.o_orderpriority) AS o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{seg}'
  AND o.o_orderdate < TIMESTAMP '{date}'
  AND l.l_shipdate > TIMESTAMP '{date}'
GROUP BY l.l_orderkey
ORDER BY rev_cents DESC, l_orderkey ASC
LIMIT 10
"""


def tpch_q5(region: str = "ASIA", lo: str = "1996-01-01",
            hi: str = "1999-01-01") -> str:
    """Six-table local-supplier revenue per nation, exact integer cents
    (twin of `queries.q_tpch_q5`)."""
    return f"""
SELECT n.n_name AS n_name,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS rev_cents
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
                AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = '{region}'
  AND o.o_orderdate >= TIMESTAMP '{lo}'
  AND o.o_orderdate <  TIMESTAMP '{hi}'
GROUP BY n.n_name
"""


def group_topn(k: int = 3) -> str:
    return f"""
SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rnk
  FROM documents
) WHERE rnk <= {k}
"""


@_materialized
def degree_corr_stats() -> str:
    """One-row integer sufficient statistics for Pearson degree
    assortativity over directed edges (twin of
    `queries.q_degree_corr_stats`)."""
    return PREFIX + """
, outd AS (SELECT src AS v, count(*) AS c FROM edges GROUP BY src),
ind AS (SELECT dst AS v, count(*) AS c FROM edges GROUP BY dst)
SELECT count(*) AS m,
       sum(o.c) AS sum_du, sum(i.c) AS sum_dv,
       sum(o.c * i.c) AS sum_dudv,
       sum(o.c * o.c) AS sum_du2, sum(i.c * i.c) AS sum_dv2
FROM edges e JOIN outd o ON o.v = e.src JOIN ind i ON i.v = e.dst
"""


def funnel() -> str:
    """Ordered view -> click -> purchase funnel: stage k counts users
    whose first stage-k event is strictly after their first stage-(k-1)
    event (twin of `queries.q_funnel`)."""
    return """
WITH v AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id
)
SELECT 'view' AS stage, count(*) AS n_users FROM v
UNION ALL SELECT 'click', count(*) FROM c
UNION ALL SELECT 'purchase', count(*) FROM p
"""


@_materialized
def degree_hist() -> str:
    """Power-of-two out-degree histogram; the bucket bound is an integer
    shift (1::BIGINT << k), never floor(log2(float))."""
    return PREFIX + """
, deg AS (SELECT src, count(*) AS cnt FROM edges GROUP BY src),
buck AS (
  SELECT p.k AS bucket
  FROM deg d JOIN generate_series(0, 61) p(k)
    ON d.cnt >= (CAST(1 AS BIGINT) << p.k)
   AND d.cnt <  (CAST(1 AS BIGINT) << (p.k + 1))
)
SELECT bucket, count(*) AS n_vertices FROM buck GROUP BY bucket
"""


def events_outliers() -> str:
    """Per-type counts above the exact discrete p99 (twin of
    `queries.q_events_outliers`; types with no outliers omitted)."""
    return """
WITH q AS (
  SELECT event_type, quantile_disc(value, 0.99) AS p99
  FROM events GROUP BY event_type
)
SELECT e.event_type AS event_type, q.p99 AS p99,
       count(*) AS n_above
FROM events e JOIN q USING (event_type)
WHERE e.value > q.p99
GROUP BY e.event_type, q.p99
"""


def bigram_novelty() -> str:
    """Per-doc count of globally unique distinct bigrams (df == 1; twin
    of `queries.q_bigram_novelty`)."""
    return """
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bg AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, len(t)), i -> t[i] || ' ' || t[i+1]
  ))) AS s FROM toks
),
df AS (SELECT s, count(*) AS c, min(doc_id) AS d FROM bg GROUP BY s)
SELECT d AS doc_id, count(*) AS n_unique FROM df WHERE c = 1 GROUP BY d
"""


def events_quantiles() -> str:
    return """
SELECT event_type,
       quantile_disc(value, 0.5) AS q50,
       quantile_disc(value, 0.9) AS q90,
       quantile_disc(value, 0.99) AS q99
FROM events GROUP BY event_type
"""


def hll_registers() -> str:
    """HyperLogLog register table rebuilt in SQL: bucket = low 8 bits of
    md5_number_lower(tok); rho = 1 + trailing zeros of the next 52 bits
    (twin of `text.hll_registers`)."""
    return """
WITH toks AS MATERIALIZED (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
),
h AS (SELECT md5_number_lower(tok) AS h FROM toks),
parts AS (
  SELECT CAST(h & 255 AS BIGINT) AS b,
         CAST((h >> 8) & ((1::UBIGINT << 52) - 1) AS BIGINT) AS rest
  FROM h
),
rho AS (
  SELECT b, CASE WHEN rest > 0
                 THEN bit_count((rest & (-rest)) - 1) + 1
                 ELSE 53 END AS r
  FROM parts
)
SELECT b, CAST(max(r) AS BIGINT) AS r FROM rho GROUP BY b
"""


def tfidf_topk(k: int = 3, scale: int = 1_000_000) -> str:
    """Integer tf-idf top-k terms per doc (twin of `text.tfidf_topk`)."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS MATERIALIZED (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok
),
df AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         tf.tf * ((n.n * {scale}) // df.df) AS score
  FROM tf JOIN df USING (tok) CROSS JOIN n
),
rnk AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rn
  FROM scored
)
SELECT doc_id, tok, tf, df, CAST(score AS BIGINT) AS score
FROM rnk WHERE rn <= {k}
"""


def event_gaps() -> str:
    return """
WITH g AS (
  SELECT event_id,
         lag(event_id) OVER w AS prev_event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, CAST(prev_event_id AS BIGINT) AS prev_event_id,
       CAST(gap_us AS BIGINT) AS gap_us
FROM g WHERE prev_event_id IS NOT NULL
"""


def rollup_counts() -> str:
    return """
WITH base AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(hr, -1) AS hr,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(cents) AS BIGINT) AS cents
FROM base GROUP BY ROLLUP (event_type, hr)
"""


@_materialized
def scc_coloring(iters: int = 8) -> str:
    """Fixed-round SCC coloring: `iters` unrolled min-label rounds in
    BOTH edge directions; scc = fwd-min when it equals bwd-min, else the
    vertex's own label (twin of `algorithms.scc_coloring`)."""
    sql = PREFIX + """
, f0 AS (SELECT i, label AS m FROM verts),
b0 AS (SELECT i, label AS m FROM verts)
"""
    for k in range(1, iters + 1):
        sql += f"""
, f{k} AS (
  SELECT v.i, least(l.m, coalesce(x.mn, l.m)) AS m
  FROM verts v JOIN f{k - 1} l ON l.i = v.i
  LEFT JOIN (
    SELECT e.src AS i, min(lp.m) AS mn
    FROM edges e JOIN f{k - 1} lp ON lp.i = e.dst GROUP BY e.src
  ) x ON x.i = v.i
),
b{k} AS (
  SELECT v.i, least(l.m, coalesce(x.mn, l.m)) AS m
  FROM verts v JOIN b{k - 1} l ON l.i = v.i
  LEFT JOIN (
    SELECT e.dst AS i, min(lp.m) AS mn
    FROM edges e JOIN b{k - 1} lp ON lp.i = e.src GROUP BY e.dst
  ) x ON x.i = v.i
)"""
    sql += f"""
SELECT v.label AS label,
       CASE WHEN f.m = b.m THEN f.m ELSE v.label END AS scc
FROM verts v
JOIN f{iters} f ON f.i = v.i
JOIN b{iters} b ON b.i = v.i
"""
    return sql


def random_walks(walkers: int = 24, steps: int = 6) -> str:
    """Deterministic LCG random walks (twin of `algorithms.random_walks`):
    neighbor rank ordered by the DENSE-ID order = dst label lexicographic
    order; rank request = ((w*1000003 + t*10007)*1103515245 + 12345)
    % 2^31 % outdeg."""
    sql = PREFIX + """
, adj AS MATERIALIZED (
  SELECT e.src, e.dst,
         row_number() OVER (PARTITION BY e.src ORDER BY vd.label) - 1
           AS rnk,
         count(*) OVER (PARTITION BY e.src) AS odeg
  FROM edges e JOIN verts vd ON vd.i = e.dst
),
s0 AS (
  SELECT t.t AS walker, v.i AS cur
  FROM generate_series(0, {W}) t(t)
  JOIN verts v ON v.label = 'm_' || t.t
)
""".replace("{W}", str(walkers - 1))
    for k in range(1, steps + 1):
        sql += f"""
, s{k} AS (
  SELECT s.walker, a.dst AS cur
  FROM s{k - 1} s JOIN adj a ON a.src = s.cur
   AND a.rnk = ((s.walker * 1000003 + {k} * 10007) * 1103515245 + 12345)
               % 2147483648 % a.odeg
)"""
    selects = [
        f"SELECT CAST(walker AS BIGINT) AS walker, "
        f"CAST({k} AS BIGINT) AS step, v.label AS label "
        f"FROM s{k} JOIN verts v ON v.i = s{k}.cur"
        for k in range(0, steps + 1)
    ]
    sql += "\n" + "\nUNION ALL\n".join(selects)
    return sql


def pivot_user_type() -> str:
    """PIVOT events into per-user per-type count columns (conditional
    aggregation twin of `queries.q_pivot_user_type`)."""
    types = ("click", "error", "purchase", "signup", "view")
    cols = ",\n       ".join(
        f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in types
    )
    return f"""
SELECT user_id,
       {cols}
FROM events GROUP BY user_id
"""


def oov_rate(k: int = 64) -> str:
    """Per-doc OOV counts against the corpus top-k vocabulary
    ((cnt DESC, tok ASC) cut — same deterministic tie rule as
    `text.vocab_topk`)."""
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS MATERIALIZED (
  SELECT tok FROM (
    SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
    ORDER BY cnt DESC, tok ASC LIMIT {k}
  )
)
SELECT t.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (
         t.tok NOT IN (SELECT tok FROM vocab)) AS BIGINT) AS n_oov
FROM tok t GROUP BY t.doc_id
"""


def running_total() -> str:
    """Twin of `queries.q_running_total` (cumulative SUM window)."""
    return """
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_cents
FROM events
"""


def cust_no_orders() -> str:
    """Twin of `queries.q_cust_no_orders` (NOT EXISTS anti join)."""
    return """
SELECT c.c_custkey, c.c_name,
       CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


def seq_pack(budget: int) -> str:
    """Twin of `queries.q_seq_pack` (per-lang token-budget binning)."""
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
  FROM documents
)
SELECT doc_id, lang, ntok,
       CAST((sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - ntok)
            // {budget} AS BIGINT) AS bin
FROM toks
"""


@_materialized
def nbr_jaccard(topk: int = 100, min_cn: int = 2) -> str:
    """Neighborhood-Jaccard link prediction on DENSE ids (integer-scaled
    score, same orientation/tie-breaks as `queries.q_nbr_jaccard`)."""
    return PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d, label FROM verts
),
du AS (
  SELECT ds.d AS u, dd.d AS v
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
  UNION
  SELECT dd.d, ds.d
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
),
deg AS (SELECT u, count(*) AS dg FROM du GROUP BY u),
cn AS (
  SELECT x.u AS a, y.v AS b, count(*) AS c
  FROM du x JOIN du y ON x.v = y.u
  WHERE x.u < y.v
  GROUP BY 1, 2
),
cn2 AS (
  SELECT a, b,
         CAST((c * 1000000) // (da.dg + db.dg - c) AS BIGINT) AS score
  FROM cn JOIN deg da ON da.u = cn.a JOIN deg db ON db.u = cn.b
  WHERE c >= {min_cn}
    AND NOT EXISTS (SELECT 1 FROM du e WHERE e.u = cn.a AND e.v = cn.b)
)
SELECT da.label AS a, db.label AS b, c.score
FROM cn2 c JOIN dense da ON da.d = c.a JOIN dense db ON db.d = c.b
ORDER BY c.score DESC, c.a ASC, c.b ASC
LIMIT {topk}
"""


def chunk_dups(w: int = 8) -> str:
    """Twin of `queries.q_chunk_dups`: per-doc duplicated-chunk counts,
    chunk hash = the fingerprint Horner chain over each w-token slice
    (md5_number_lower % 2^61, HUGEINT accumulator)."""
    p = 1 << 61
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
cks AS MATERIALIZED (
  SELECT doc_id, l,
         unnest(generate_series(
           0, CAST((len(l) + {w} - 1) // {w} AS BIGINT) - 1)) AS ck
  FROM toks
),
chunks AS MATERIALIZED (
  SELECT doc_id,
    CAST(list_reduce(
      list_prepend(CAST(0 AS HUGEINT),
        list_transform(l[(ck * {w} + 1):(ck * {w} + {w})],
                       t -> CAST(md5_number_lower(t) % {p} AS HUGEINT))),
      (acc, x) -> (acc * 1000003 + x) % {p}
    ) AS BIGINT) AS ch
  FROM cks
),
dupc AS MATERIALIZED (
  SELECT ch FROM chunks GROUP BY ch HAVING count(DISTINCT doc_id) > 1
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (WHERE d.ch IS NOT NULL) AS BIGINT)
         AS dup_chunks
FROM chunks c LEFT JOIN dupc d ON d.ch = c.ch
GROUP BY c.doc_id
"""


@_materialized
def stress(root_label: str = "m_0", iters: int = 12) -> str:
    """Single-source stress centrality: the `bfs_sigma` forward chain +
    an unrolled backward pass g(v) = SUM over dist-(k+1) neighbors of
    (1 + g) by descending level; stress = sigma * g (integer BIGINT,
    root excluded). Twin of `queries.q_stress`."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
, distf AS (SELECT i, dist FROM {prev}),
s0 AS (SELECT i, CAST(1 AS BIGINT) AS sig FROM d0)
"""
    for k in range(1, iters + 1):
        sql += f"""
, s{k} AS (
  SELECT u.dst AS i, sum(sp.sig) AS sig
  FROM und u JOIN s{k - 1} sp ON sp.i = u.src
  JOIN distf dd ON dd.i = u.dst AND dd.dist = {k}
  GROUP BY u.dst
)"""
    union = " UNION ALL ".join(f"SELECT * FROM s{k}"
                               for k in range(iters + 1))
    sql += f"""
, sig AS ({union}),
g{iters} AS (SELECT CAST(NULL AS BIGINT) AS i, CAST(0 AS BIGINT) AS g
             WHERE 1 = 0)"""
    for k in range(iters - 1, -1, -1):
        sql += f"""
, g{k} AS (
  SELECT u.src AS i, sum(1 + coalesce(gn.g, 0)) AS g
  FROM und u
  JOIN distf ds ON ds.i = u.src AND ds.dist = {k}
  JOIN distf dd ON dd.i = u.dst AND dd.dist = {k + 1}
  LEFT JOIN g{k + 1} gn ON gn.i = u.dst
  GROUP BY u.src
)"""
    gunion = " UNION ALL ".join(f"SELECT * FROM g{k}"
                                for k in range(iters))
    sql += f"""
, gall AS ({gunion})
SELECT v.label AS label, CAST(d.dist AS BIGINT) AS dist,
       CAST(s.sig AS BIGINT) AS sigma,
       CAST(s.sig * coalesce(ga.g, 0) AS BIGINT) AS stress
FROM distf d
JOIN sig s ON s.i = d.i
LEFT JOIN gall ga ON ga.i = d.i
JOIN verts v ON v.i = d.i
WHERE v.label <> '{root_label}'
"""
    return sql


@_materialized
def widest_paths(root_label: str = "m_1", iters: int = 8,
                 inf: int = 1000000000) -> str:
    """Unrolled fixed-round widest-path (max of path-min edge weight)
    over the directed integer-weighted graph — twin of
    `queries.q_widest_paths` (max_min semiring)."""
    sql = PREFIX + f"""
, wedges AS (
  SELECT src, dst, CAST(1 + (src + 2 * dst) % 7 AS DOUBLE) AS len FROM edges
),
b0 AS (SELECT i, CAST({inf} AS DOUBLE) AS wd FROM verts
       WHERE label = '{root_label}')
"""
    prev = "b0"
    for k in range(1, iters + 1):
        sql += f"""
, b{k} AS (
  SELECT i, max(wd) AS wd FROM (
    SELECT i, wd FROM {prev}
    UNION ALL
    SELECT e.dst AS i, least(bp.wd, e.len) AS wd
    FROM wedges e JOIN {prev} bp ON bp.i = e.src
  ) GROUP BY i
)"""
        prev = f"b{k}"
    sql += f"""
SELECT v.label AS label, CAST(b.wd AS BIGINT) AS width
FROM {prev} b JOIN verts v ON v.i = b.i
"""
    return sql


@_materialized
def community_stats(iters: int = 12) -> str:
    """Per-component vertex + internal-edge counts over the fixed-round
    min-label CC chain — twin of `queries.q_community_stats`."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
l0 AS (SELECT i, label AS comp FROM verts)
"""
    prev = "l0"
    for k in range(1, iters + 1):
        sql += f"""
, l{k} AS (
  SELECT v.i, least(l.comp, coalesce(m.mn, l.comp)) AS comp
  FROM verts v JOIN {prev} l ON l.i = v.i
  LEFT JOIN (
    SELECT u.dst AS i, min(lp.comp) AS mn
    FROM und u JOIN {prev} lp ON lp.i = u.src GROUP BY u.dst
  ) m ON m.i = v.i
)"""
        prev = f"l{k}"
    sql += f"""
, compf AS (SELECT i, comp FROM {prev}),
vcnt AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_vertices
         FROM compf GROUP BY comp),
ecnt AS (
  SELECT cs.comp, CAST(count(*) AS BIGINT) AS n_edges
  FROM edges e
  JOIN compf cs ON cs.i = e.src
  JOIN compf cd ON cd.i = e.dst AND cd.comp = cs.comp
  GROUP BY cs.comp
)
SELECT v.comp AS comp, v.n_vertices,
       coalesce(e.n_edges, 0) AS n_edges
FROM vcnt v LEFT JOIN ecnt e ON e.comp = v.comp
"""
    return sql


def json_props() -> str:
    """Twin of `queries.q_json_props` (RE2 regexp_extract of the JSON
    `k` field + per-type integer aggregates)."""
    return """
WITH k AS (
  SELECT event_type,
         TRY_CAST(nullif(regexp_extract(props, '"k":\\s*(\\d+)', 1),
                        '') AS BIGINT) AS kv
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(kv) AS BIGINT) AS sum_k,
       CAST(max(kv) AS BIGINT) AS max_k
FROM k WHERE kv IS NOT NULL
GROUP BY event_type
"""


@_materialized
def ecc_sample(seeds: tuple = ("m_0", "m_1", "m_2"),
               iters: int = 12) -> str:
    """Per-seed BFS eccentricity + reach counts (unrolled min-label BFS
    chains over the undirected view, one per seed) — twin of
    `queries.q_ecc_sample`."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
)"""
    finals = []
    for si, s in enumerate(seeds):
        sql += f"""
, q{si}d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{s}')"""
        prev = f"q{si}d0"
        for k in range(1, iters + 1):
            sql += f"""
, q{si}d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
            prev = f"q{si}d{k}"
        finals.append(
            f"SELECT '{s}' AS seed, CAST(max(dist) AS BIGINT) AS ecc, "
            f"CAST(count(*) AS BIGINT) AS n_reached FROM {prev}"
        )
    sql += "\n" + "\nUNION ALL\n".join(finals)
    return sql


@_materialized
def coarsen(rounds: int = 12, b: int = 23) -> str:
    """Graph coarsening by matching contraction (S^T A S with S the
    matched-pair selection matrix): comp(v) = min(v, mate(v)); coarse
    edges = per-(comp s, comp d) weight sums, loops dropped. Twin of
    `queries.q_coarsen`; reuses the `matching_fixed` chain."""
    sql, prev = _matching_chain(rounds, b)
    sql += f"""
, compv AS (
  SELECT de.d, least(de.d, coalesce(m.mate, de.d)) AS comp
  FROM dense de LEFT JOIN {prev} m ON m.d = de.d
),
dedges AS (
  SELECT ds_.d AS s, dd_.d AS t, e.w
  FROM edges e
  JOIN dense ds_ ON ds_.i = e.src
  JOIN dense dd_ ON dd_.i = e.dst
)
SELECT da.label AS src_label, db.label AS dst_label,
       CAST(sum(e.w) AS DOUBLE) AS w
FROM dedges e
JOIN compv cs ON cs.d = e.s
JOIN compv cd ON cd.d = e.t
JOIN dense da ON da.d = cs.comp
JOIN dense db ON db.d = cd.comp
WHERE cs.comp <> cd.comp
GROUP BY 1, 2
"""
    return sql


def bigram_topk(k: int = 100) -> str:
    """Twin of `queries.q_bigram_topk`: consecutive token pairs within
    each doc, global counts, exact (cnt DESC, tok ASC) top-k."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
flat AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS i
  FROM toks
),
bi AS (
  SELECT a.tok || ' ' || b.tok AS tok
  FROM flat a JOIN flat b
    ON b.doc_id = a.doc_id AND b.i = a.i + 1
)
SELECT tok, CAST(count(*) AS BIGINT) AS cnt
FROM bi GROUP BY tok
ORDER BY cnt DESC, tok ASC
LIMIT {k}
"""


def transpose() -> str:
    """A^T (twin of `queries.q_transpose`)."""
    return PREFIX + """
SELECT vs.label AS src_label, vd.label AS dst_label, e.w AS w
FROM edges e
JOIN verts vs ON vs.i = e.dst JOIN verts vd ON vd.i = e.src
"""


def galerkin(nc: int = 64, wmod: int = 3) -> str:
    """Weighted Galerkin triple product R*A*R^T on arithmetic ids (twin
    of `queries.q_galerkin`)."""
    return PREFIX + f"""
SELECT CAST(e.src % {nc} AS BIGINT) AS csrc,
       CAST(e.dst % {nc} AS BIGINT) AS cdst,
       sum((1 + e.src % {wmod}) * e.w * (1 + e.dst % {wmod})) AS w
FROM edges e
GROUP BY csrc, cdst
"""


def tpch_q4(late_days: int = 60) -> str:
    """EXISTS semi-join order-priority check (twin of
    `queries.q_tpch_q4`)."""
    return f"""
SELECT o.o_orderpriority AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS cnt
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {late_days} DAY
)
GROUP BY o.o_orderpriority
"""


@_materialized
def wl_refine(rounds: int = 2) -> str:
    """Weisfeiler-Lehman color refinement twin of `queries.wl_refine`:
    c0 = undirected degree; per round g = (c^2+3c+7) mod 2^61, S = sum
    of neighbor g mod 2^64, c' = g(((S + 1000003*c) mod 2^64) mod 2^61).
    All arithmetic in HUGEINT — bit-identical to the uint64 wrap/mask
    kernels on the Ray side."""
    M61 = 1 << 61
    M64 = 1 << 64
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, count(*) AS dg FROM und GROUP BY src),
c0 AS (
  SELECT v.i, CAST(coalesce(d.dg, 0) AS HUGEINT) AS c
  FROM verts v LEFT JOIN deg d ON d.i = v.i
)"""
    prev = "c0"
    for k in range(1, rounds + 1):
        sql += f""",
g{k} AS (SELECT i, (c*c + 3*c + 7) % {M61} AS gc FROM {prev}),
s{k} AS (
  SELECT u.src AS i, sum(g.gc) % {M64} AS s
  FROM und u JOIN g{k} g ON g.i = u.dst GROUP BY u.src
),
t{k} AS (
  SELECT p.i,
         ((coalesce(s.s, 0) + 1000003 * p.c) % {M64}) % {M61} AS t
  FROM {prev} p LEFT JOIN s{k} s ON s.i = p.i
),
c{k} AS (SELECT i, (t*t + 3*t + 7) % {M61} AS c FROM t{k})"""
        prev = f"c{k}"
    sql += f"""
SELECT v.label AS label, CAST(c.c AS BIGINT) AS color
FROM {prev} c JOIN verts v ON v.i = c.i
"""
    return sql


def ntile(k: int = 4) -> str:
    """Balanced-bucket window function (twin of `queries.q_ntile`)."""
    return f"""
SELECT event_id,
       CAST(NTILE({k}) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS BIGINT) AS tile
FROM events
"""


@_materialized
def cycle4() -> str:
    """Global 4-cycle statistic (twin of `queries.q_cycle4`)."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
cn AS (
  SELECT u1.src AS a, u2.src AS b, count(*) AS c
  FROM und u1 JOIN und u2 ON u1.dst = u2.dst AND u1.src < u2.src
  GROUP BY a, b
),
tot AS (SELECT coalesce(sum((c*(c-1))//2), 0) AS p2 FROM cn)
SELECT CAST(p2 AS BIGINT) AS pairs2, CAST(p2 // 2 AS BIGINT) AS squares
FROM tot
"""


def tpch_q6(lo: str = "1996-01-01", hi: str = "1997-01-01") -> str:
    """Filtered streaming aggregate (twin of `queries.q_tpch_q6`):
    revenue = floor(price * discount * 100) per line, order-free
    integer sum."""
    return f"""
SELECT coalesce(sum(CAST(floor(l_extendedprice * l_discount * 100)
                         AS BIGINT)), 0) AS rev_cents,
       count(*) AS nlines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{lo}'
  AND l_shipdate <  TIMESTAMP '{hi}'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def basket_pairs(topk: int = 20) -> str:
    """Market-basket part-pair co-occurrence counts, top-k (twin of
    `queries.q_basket_pairs`)."""
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS cnt
FROM op x JOIN op y ON x.l_orderkey = y.l_orderkey
                   AND x.l_partkey < y.l_partkey
GROUP BY 1, 2
ORDER BY cnt DESC, a ASC, b ASC
LIMIT {topk}
"""


@_materialized
def link_predict_ra(topk: int = 20, min_cn: int = 2,
                    scale: int = 1_000_000_000) -> str:
    """Resource-allocation link prediction on dense ids (integer RA
    index; twin of `queries.q_link_predict_ra`)."""
    return PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d, label FROM verts
),
du AS (
  SELECT ds.d AS u, dd.d AS v
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
  UNION
  SELECT dd.d, ds.d
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
),
deg AS (SELECT u, count(*) AS dg FROM du GROUP BY u),
cn AS (
  SELECT x.u AS a, y.v AS b, count(*) AS c,
         sum({scale} // dz.dg) AS ra
  FROM du x JOIN du y ON x.v = y.u JOIN deg dz ON dz.u = x.v
  WHERE x.u < y.v
  GROUP BY 1, 2
),
cn2 AS (
  SELECT a, b, CAST(ra AS BIGINT) AS score, CAST(c AS BIGINT) AS cn
  FROM cn
  WHERE c >= {min_cn}
    AND NOT EXISTS (SELECT 1 FROM du e WHERE e.u = cn.a AND e.v = cn.b)
)
SELECT da.label AS a, db.label AS b, c.score, c.cn
FROM cn2 c JOIN dense da ON da.d = c.a JOIN dense db ON db.d = c.b
ORDER BY c.score DESC, c.a ASC, c.b ASC
LIMIT {topk}
"""


def first_last_event() -> str:
    """FIRST_VALUE / LAST_VALUE per user over (ts, event_id) order
    (twin of `queries.q_first_last_event`)."""
    return """
WITH w AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT a.user_id,
       a.event_type AS first_type,
       b.event_type AS last_type,
       CAST(floor(b.value * 100 + 0.5) AS BIGINT)
         - CAST(floor(a.value * 100 + 0.5) AS BIGINT) AS delta_cents,
       CAST(a.n AS BIGINT) AS n
FROM w a JOIN w b ON a.user_id = b.user_id AND b.rn = a.n
WHERE a.rn = 1
"""


def dense_rank_spend() -> str:
    """DENSE_RANK of customer total spend within market segment (twin
    of `queries.q_dense_rank_spend`)."""
    return """
WITH s AS (
  SELECT o_custkey,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           AS spend_cents
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_mktsegment, s.spend_cents,
       CAST(dense_rank() OVER (PARTITION BY c.c_mktsegment
                               ORDER BY s.spend_cents DESC)
            AS BIGINT) AS drank
FROM s JOIN customer c ON c.c_custkey = s.o_custkey
"""


def cube_counts() -> str:
    """GROUP BY CUBE(event_type, day-of-week); dow via pure integer
    epoch-ms arithmetic (twin of `queries.q_cube_counts`)."""
    return """
WITH base AS (
  SELECT event_type,
         ((epoch_ms(ts) // 86400000) + 4) % 7 AS dow,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT coalesce(event_type, 'ALL') AS event_type,
       CAST(coalesce(dow, -1) AS BIGINT) AS dow,
       count(*) AS cnt,
       sum(cents) AS cents
FROM base GROUP BY CUBE(event_type, dow)
"""


@_materialized
def kmeans_fixed(k: int = 4, rounds: int = 2, dim: int = 64,
                 qscale: int = 1 << 20) -> str:
    """Integer-exact fixed-round Lloyd k-means over quantized embeddings
    (twin of `queries.q_kmeans_fixed`): q = floor((x+0.5)*2^20) — the
    float32->double cast, the +0.5 add and the power-of-two scale incur
    identical IEEE roundings in numpy and DuckDB; distances, argmin
    tie-breaks and floor-mean centroid updates are all BIGINT."""
    sql = f"""
WITH q AS (
  SELECT vec_id, CAST(g.d AS BIGINT) - 1 AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
c0 AS (SELECT vec_id AS cluster, dim, q AS c FROM q WHERE vec_id < {k})"""
    prev = "c0"
    for r in range(1, rounds + 1):
        sql += f""",
a{r} AS (
  SELECT vec_id, cluster FROM (
    SELECT q.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY sum((q.q - c.c) * (q.q - c.c)) ASC, c.cluster ASC
           ) AS rn
    FROM q JOIN {prev} c ON c.dim = q.dim
    GROUP BY q.vec_id, c.cluster
  ) WHERE rn = 1
),
c{r} AS (
  SELECT p.cluster, p.dim, coalesce(s.m, p.c) AS c
  FROM {prev} p LEFT JOIN (
    SELECT a.cluster, q.dim, sum(q.q) // count(*) AS m
    FROM a{r} a JOIN q ON q.vec_id = a.vec_id
    GROUP BY a.cluster, q.dim
  ) s ON s.cluster = p.cluster AND s.dim = p.dim
)"""
        prev = f"c{r}"
    sql += f"""
SELECT vec_id, cluster FROM (
  SELECT q.vec_id, c.cluster,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY sum((q.q - c.c) * (q.q - c.c)) ASC, c.cluster ASC
         ) AS rn
  FROM q JOIN {prev} c ON c.dim = q.dim
  GROUP BY q.vec_id, c.cluster
) WHERE rn = 1
"""
    return sql


@_materialized
def closeness_sample(seeds: tuple = ("m_0", "m_1", "m_2"),
                     iters: int = 12) -> str:
    """Per-seed BFS distance sums + reach counts (twin of
    `queries.q_closeness_sample`; same unrolled chains as
    `ecc_sample`, MATERIALIZED so the 3x12 chain re-reads the edge
    table once, not once per CTE scan)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
)"""
    finals = []
    for si, s in enumerate(seeds):
        sql += f"""
, c{si}d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{s}')"""
        prev = f"c{si}d0"
        for k in range(1, iters + 1):
            sql += f"""
, c{si}d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
            prev = f"c{si}d{k}"
        finals.append(
            f"SELECT '{s}' AS seed, CAST(sum(dist) AS BIGINT) AS sum_d, "
            f"CAST(count(*) AS BIGINT) AS n_reached FROM {prev}"
        )
    sql += "\n" + "\nUNION ALL\n".join(finals)
    return sql


def source_stats() -> str:
    """Per-source doc/lang/char/distinct-text audit (twin of
    `queries.q_source_stats`; distinct texts via md5_number_lower —
    the Ray side hashes identically)."""
    return """
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       sum(n_chars) AS chars,
       count(DISTINCT md5_number_lower(text)) AS n_distinct
FROM documents GROUP BY source
"""


def big_spenders() -> str:
    """Customers with spend > 2x segment mean, division-free integer
    comparison (twin of `queries.q_big_spenders`)."""
    return """
WITH s AS (
  SELECT o_custkey,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           AS spend_cents
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c.c_custkey, c.c_mktsegment, s.spend_cents
  FROM s JOIN customer c ON c.c_custkey = s.o_custkey
),
seg AS (
  SELECT c_mktsegment, sum(spend_cents) AS seg_sum,
         count(*) AS seg_cnt
  FROM j GROUP BY c_mktsegment
)
SELECT j.c_custkey, j.c_mktsegment, j.spend_cents
FROM j JOIN seg g ON g.c_mktsegment = j.c_mktsegment
WHERE j.spend_cents * g.seg_cnt > 2 * g.seg_sum
"""


@_materialized
def rep_ngrams(w: int = 3) -> str:
    """Per-doc duplicate-w-gram stats (twin of `queries.q_rep_ngrams`):
    w-gram = space-joined list slice, token multiplicity via per-doc
    group counts."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
gpos AS (
  SELECT doc_id, l,
         unnest(generate_series(1, len(l) - {w - 1})) AS d
  FROM toks
),
grams AS (
  SELECT doc_id, array_to_string(l[d : d + {w - 1}], ' ') AS gram
  FROM gpos
),
dist AS (
  SELECT doc_id, count(DISTINCT gram) AS d_w FROM grams GROUP BY doc_id
),
tokc AS (
  SELECT doc_id, max(c) AS maxtok FROM (
    SELECT doc_id, tok, count(*) AS c FROM (
      SELECT doc_id, unnest(l) AS tok FROM toks
    ) GROUP BY doc_id, tok
  ) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(greatest(len(t.l) - {w - 1}, 0) AS BIGINT) AS total_w,
       CAST(coalesce(d.d_w, 0) AS BIGINT) AS distinct_w,
       CAST(greatest(len(t.l) - {w - 1}, 0) - coalesce(d.d_w, 0)
            AS BIGINT) AS dup_w,
       CAST(coalesce(k.maxtok, 0) AS BIGINT) AS maxtok
FROM toks t
LEFT JOIN dist d ON d.doc_id = t.doc_id
LEFT JOIN tokc k ON k.doc_id = t.doc_id
"""


@_materialized
def colloc_lift(k: int = 50, min_count: int = 5,
                scale: int = 1_000_000_000_000) -> str:
    """Top-k bigrams by integer lift-association score (twin of
    `queries.q_colloc_lift`)."""
    return f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS l FROM documents
),
ucnt AS (
  SELECT tok, count(*) AS c FROM (
    SELECT unnest(l) AS tok FROM toks
  ) GROUP BY tok
),
bpos AS (
  SELECT l, unnest(generate_series(1, len(l) - 1)) AS d FROM toks
),
bcnt AS (
  SELECT a, b, count(*) AS cab FROM (
    SELECT l[d] AS a, l[d + 1] AS b FROM bpos
  ) GROUP BY a, b
  HAVING count(*) >= {min_count}
)
SELECT bc.a, bc.b, CAST(bc.cab AS BIGINT) AS cab,
       CAST(bc.cab * {scale} // (ua.c * ub.c) AS BIGINT) AS score
FROM bcnt bc JOIN ucnt ua ON ua.tok = bc.a JOIN ucnt ub ON ub.tok = bc.b
ORDER BY score DESC, bc.a ASC, bc.b ASC
LIMIT {k}
"""


@_materialized
def hyperanf(rounds: int = 3, p: int = 3) -> str:
    """HyperANF register evolution (twin of `queries.q_hyperanf`):
    per-vertex HLL registers (bucket = low p bits of
    md5_number_lower(label), rho = trailing zeros of the next 52 bits)
    max-merged over neighbors for `rounds` rounds, packed 6 bits per
    register."""
    m = 1 << p
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
hh AS (
  SELECT i, md5_number_lower(label) AS h FROM verts
),
r0 AS (
  SELECT i, CAST(h & {m - 1} AS BIGINT) AS j,
         CASE WHEN rest > 0
              THEN bit_count((rest & (-rest)) - 1) + 1
              ELSE 53 END AS r
  FROM (SELECT i, h,
               CAST((h >> {p}) & ((1::UBIGINT << 52) - 1) AS BIGINT)
                 AS rest
        FROM hh)
)"""
    prev = "r0"
    for k in range(1, rounds + 1):
        sql += f""",
r{k} AS (
  SELECT i, j, max(r) AS r FROM (
    SELECT i, j, r FROM {prev}
    UNION ALL
    SELECT u.src AS i, q.j, q.r FROM und u JOIN {prev} q ON q.i = u.dst
  ) GROUP BY i, j
)"""
        prev = f"r{k}"
    sql += f"""
SELECT v.label AS label,
       CAST(coalesce(sum(CAST(q.r AS BIGINT) << CAST(6 * q.j AS INT)),
                     0) AS BIGINT) AS packed
FROM verts v LEFT JOIN {prev} q ON q.i = v.i
GROUP BY v.label
"""
    return sql


def tpch_q10(lo: str = "1996-07-01", hi: str = "1996-10-01",
             topk: int = 20) -> str:
    """Returned-item revenue per customer, top-k (twin of
    `queries.q_tpch_q10`)."""
    return f"""
SELECT c.c_custkey, c.c_name,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS rev_cents,
       CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
       n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '{lo}'
  AND o.o_orderdate <  TIMESTAMP '{hi}'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY rev_cents DESC, c.c_custkey ASC
LIMIT {topk}
"""


@_materialized
def triangles_list() -> str:
    """Triangle enumeration as label triples a < b < c (twin of
    `queries.q_triangles_list`; orientation in LABEL order = the Ray
    side's dense-id order, since dense ids are label ranks)."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
lab AS (
  SELECT v1.label AS la, v2.label AS lb
  FROM und u JOIN verts v1 ON v1.i = u.src JOIN verts v2 ON v2.i = u.dst
),
adj AS (SELECT la AS a, lb AS b FROM lab WHERE la < lb)
SELECT e1.a AS a, e1.b AS b, e2.b AS c
FROM adj e1
JOIN adj e2 ON e2.a = e1.b
JOIN adj e3 ON e3.a = e1.a AND e3.b = e2.b
"""


@_materialized
def edge_jaccard(scale: int = 1_000_000) -> str:
    """Edge-level neighborhood Jaccard on dense ids (twin of
    `queries.q_edge_jaccard`; cn = 0 edges kept with score 0)."""
    return PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d, label FROM verts
),
du AS (
  SELECT ds.d AS u, dd.d AS v
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
  UNION
  SELECT dd.d, ds.d
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
),
deg AS (SELECT u, count(*) AS dg FROM du GROUP BY u),
adj AS (SELECT u, v FROM du WHERE u < v),
cn AS (
  SELECT x.u AS a, y.v AS b, count(*) AS c
  FROM du x JOIN du y ON x.v = y.u
  WHERE x.u < y.v
  GROUP BY 1, 2
)
SELECT da.label AS a, db.label AS b,
       CAST(coalesce(c.c, 0) AS BIGINT) AS cn,
       CAST(coalesce(c.c, 0) * {scale}
            // (ga.dg + gb.dg - coalesce(c.c, 0)) AS BIGINT) AS score
FROM adj j
LEFT JOIN cn c ON c.a = j.u AND c.b = j.v
JOIN deg ga ON ga.u = j.u
JOIN deg gb ON gb.u = j.v
JOIN dense da ON da.d = j.u
JOIN dense db ON db.d = j.v
"""


def tpch_q18(qty: int = 150) -> str:
    """Large-volume orders (HAVING over a join; twin of
    `queries.q_tpch_q18`)."""
    return f"""
WITH s AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > {qty}
)
SELECT o.o_orderkey, o.o_custkey,
       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
       s.sum_qty
FROM s JOIN orders o ON o.o_orderkey = s.l_orderkey
"""


def tpch_q14(lo: str = "1996-09-01", hi: str = "1996-10-01") -> str:
    """Promotion-effect sufficient statistics (twin of
    `queries.q_tpch_q14`)."""
    return f"""
SELECT coalesce(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                              * 100) AS BIGINT))
                FILTER (WHERE p.p_type = 'PROMO'), 0) AS promo_cents,
       coalesce(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                              * 100) AS BIGINT)), 0) AS total_cents,
       count(*) AS nlines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '{lo}'
  AND l.l_shipdate <  TIMESTAMP '{hi}'
"""


def window_pair_join(win_us: int = 3_600_000_000) -> str:
    """Per-user count of unordered event pairs within the time window
    (twin of `queries.q_window_pair_join`; ties pair exactly once)."""
    return f"""
WITH pr AS (
  SELECT a.user_id, count(*) AS c
  FROM events a JOIN events b ON b.user_id = a.user_id
  WHERE (b.ts > a.ts AND epoch_us(b.ts) <= epoch_us(a.ts) + {win_us})
     OR (b.ts = a.ts AND b.event_id > a.event_id)
  GROUP BY a.user_id
),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id, CAST(coalesce(pr.c, 0) AS BIGINT) AS pairs_1h
FROM u LEFT JOIN pr ON pr.user_id = u.user_id
"""


def skyline_parts() -> str:
    """Pareto front of parts (maximize size, minimize price; twin of
    `queries.q_skyline_parts`)."""
    return """
WITH p AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM part
)
SELECT a.p_partkey, a.p_size, a.price_cents
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.p_size >= a.p_size AND b.price_cents <= a.price_cents
    AND (b.p_size > a.p_size OR b.price_cents < a.price_cents)
)
"""


def retention_cohorts() -> str:
    """Cohort-week retention counts (twin of
    `queries.q_retention_cohorts`; weeks = epoch days // 7)."""
    return """
WITH uw AS (
  SELECT DISTINCT user_id,
         (epoch_ms(ts) // 86400000) // 7 AS wk
  FROM events
),
coh AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id)
SELECT CAST(c.cw AS BIGINT) AS cohort_week,
       CAST(u.wk - c.cw AS BIGINT) AS week_offset,
       count(*) AS users
FROM uw u JOIN coh c ON c.user_id = u.user_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# multimodal (integer blob synthesis regenerated in SQL)
# ---------------------------------------------------------------------------


def image_stats() -> str:
    """Regenerates make_blob's pixel arithmetic: w = 8+(id%5)*4,
    h = 8+(id%3)*4, pixel i = (i*(id+7)) % 251 for i in [0, w*h)."""
    return """
WITH dims AS (
  SELECT doc_id AS item_id,
         CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS width,
         CAST(8 + (doc_id % 3) * 4 AS BIGINT) AS height
  FROM documents
)
SELECT d.item_id, d.width, d.height,
       CAST(SUM((r.i * (d.item_id + 7)) % 251) AS BIGINT) AS px_sum,
       CAST(MIN((r.i * (d.item_id + 7)) % 251) AS BIGINT) AS px_min,
       CAST(MAX((r.i * (d.item_id + 7)) % 251) AS BIGINT) AS px_max
FROM dims d CROSS JOIN range(384) r(i)
WHERE r.i < d.width * d.height
GROUP BY 1, 2, 3
"""


def image_resize_stats() -> str:
    """2x2 mean-pool resize twin: pooled pixel (X,Y) =
    (p(2X,2Y)+p(2X+1,2Y)+p(2X,2Y+1)+p(2X+1,2Y+1)) // 4 with
    p(x,y) = ((y*w + x)*(id+7)) % 251; w,h are always even here."""
    return """
WITH dims AS (
  SELECT doc_id AS item_id,
         CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS w,
         CAST(8 + (doc_id % 3) * 4 AS BIGINT) AS h
  FROM documents
),
cells AS (
  SELECT d.item_id, d.w, d.h,
         ( ((2*y.i)   * d.w + 2*x.i    ) * (d.item_id + 7) % 251
         + ((2*y.i)   * d.w + 2*x.i + 1) * (d.item_id + 7) % 251
         + ((2*y.i+1) * d.w + 2*x.i    ) * (d.item_id + 7) % 251
         + ((2*y.i+1) * d.w + 2*x.i + 1) * (d.item_id + 7) % 251
         ) // 4 AS rp
  FROM dims d CROSS JOIN range(12) x(i) CROSS JOIN range(8) y(i)
  WHERE x.i < d.w // 2 AND y.i < d.h // 2
)
SELECT item_id,
       CAST(w // 2 AS BIGINT) AS width,
       CAST(h // 2 AS BIGINT) AS height,
       CAST(SUM(rp) AS BIGINT) AS px_sum,
       CAST(MIN(rp) AS BIGINT) AS px_min,
       CAST(MAX(rp) AS BIGINT) AS px_max
FROM cells GROUP BY 1, 2, 3
"""


def video_frames() -> str:
    """make_video_blob twin: nf = 4+(id%5), 8x8 frames, data i =
    (i*(id+3)) % 241; sampled frames are j = 0,2,4,... < nf."""
    return """
WITH vids AS (
  SELECT doc_id AS item_id,
         CAST(4 + (doc_id % 5) AS BIGINT) AS nf
  FROM documents
)
SELECT v.item_id, f.i AS frame,
       CAST(SUM(((f.i * 64 + k.i) * (v.item_id + 3)) % 241) AS BIGINT)
         AS f_sum
FROM vids v CROSS JOIN range(8) f(i) CROSS JOIN range(64) k(i)
WHERE f.i < v.nf AND f.i % 2 = 0
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# wave 14: rich club / TPC-H Q12, Q13 / rolling window
# ---------------------------------------------------------------------------


def rich_club(d: int = 8) -> str:
    """Rich-club sufficient statistics (twin of `queries.q_rich_club`)."""
    return PREFIX + f"""
, und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
deg AS (SELECT src AS v, count(*) AS dg FROM und GROUP BY 1),
rich AS (SELECT v FROM deg WHERE dg > {d})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM rich) AS nv,
       (SELECT CAST(count(*) AS BIGINT)
        FROM und u JOIN rich a ON a.v = u.src JOIN rich b ON b.v = u.dst
        WHERE u.src < u.dst) AS ne
"""


def tpch_q12(year: int = 1995) -> str:
    """Shipping-priority counts by returnflag (twin of
    `queries.q_tpch_q12`)."""
    return f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE '{year}-01-01'
  AND l_shipdate < DATE '{year + 1}-01-01'
GROUP BY 1
"""


def tpch_q13(excl: str = "4-NOT SPECIFIED") -> str:
    """Customer order-count distribution (twin of `queries.q_tpch_q13`)."""
    return f"""
WITH c_orders AS (
  SELECT c_custkey, count(o_custkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{excl}'
  GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count
"""


def rolling_sum4() -> str:
    """Bounded-frame rolling sum (twin of `queries.q_rolling_sum4`)."""
    return """
SELECT event_id, user_id,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS roll_cents
FROM events
"""


# ---------------------------------------------------------------------------
# wave 15: reciprocity / simhash pairs / range search / TPC-H Q16 / mode
# ---------------------------------------------------------------------------


def reciprocity() -> str:
    """Directed reciprocity statistics (twin of `queries.q_reciprocity`)."""
    return PREFIX + """
, de AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM de) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM de e
        JOIN de r ON r.src = e.dst AND r.dst = e.src) AS n_recip
"""


def simhash_pairs(t: int = 3) -> str:
    """All doc pairs with SimHash hamming distance <= t (twin of
    `queries.q_simhash_pairs`; the Ray side's 4-band blocking is
    complete for t <= 3 by pigeonhole, so the blocked result equals
    this all-pairs scan)."""
    return "WITH " + _SIMHASH_CODES + f"""
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamm
FROM codes x JOIN codes y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {t}
"""


def range_search(nq: int = 4, thr: int = 18_000_000_000_000,
                 dim: int = 64, qscale: int = 1 << 20) -> str:
    """Integer-quantized threshold similarity search (twin of
    `queries.q_range_search`; same q = floor((x+0.5)*2^20) quantization
    as `kmeans_fixed`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
dots AS (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id, sum(a.q * b.q) AS dot
  FROM q a JOIN q b ON b.dim = a.dim
  WHERE a.vec_id < {nq}
  GROUP BY 1, 2
)
SELECT qid, vec_id, CAST(dot AS BIGINT) AS dot
FROM dots WHERE dot >= {thr}
"""


def tpch_q16(excl: str = "Brand#1",
             sizes: tuple = (1, 7, 14, 21, 28, 35, 42, 49)) -> str:
    """Supplier-count report with anti-joined bad suppliers (twin of
    `queries.q_tpch_q16`)."""
    in_list = ", ".join(str(s) for s in sizes)
    return f"""
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{excl}' AND p_size IN ({in_list})
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


def mode_hour() -> str:
    """Per-type modal hour-of-day, ties to the lowest hour (twin of
    `queries.q_mode_hour`)."""
    return """
WITH c AS (
  SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY cnt DESC, hour) AS rn
      FROM c)
SELECT event_type, hour, cnt FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# wave 16: TPC-H Q7 / Q15 / Q17 / Q22 + regression sufficient statistics
# ---------------------------------------------------------------------------


def tpch_q7(lo_year: int = 1995, hi_year: int = 1997) -> str:
    """International shipping volume by nation pair x ship year, exact
    integer cents (twin of `queries.q_tpch_q7`)."""
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS rev_cents
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE s_nationkey <> c_nationkey
  AND l_shipdate >= DATE '{lo_year}-01-01'
  AND l_shipdate < DATE '{hi_year}-01-01'
GROUP BY 1, 2, 3
"""


def tpch_q15(lo: str = "1996-01-01", hi: str = "1996-04-01") -> str:
    """Top supplier(s) by quarterly revenue, ties kept (twin of
    `queries.q_tpch_q15`)."""
    return f"""
WITH revenue0 AS (
  SELECT l_suppkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS total_rev_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '{lo}' AND l_shipdate < DATE '{hi}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_cents
FROM supplier JOIN revenue0 ON s_suppkey = l_suppkey
WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM revenue0)
"""


def tpch_q17(brand: str = "Brand#2") -> str:
    """Small-quantity-order revenue: the correlated avg subquery run
    division-free in integers (twin of `queries.q_tpch_q17`)."""
    return f"""
WITH pl AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{brand}'
),
st AS (
  SELECT l_partkey, count(*) AS cnt, sum(qty) AS sq
  FROM pl GROUP BY 1
)
SELECT CAST(coalesce(sum(pl.cents), 0) AS BIGINT) AS cents,
       CAST(count(*) AS BIGINT) AS nlines
FROM pl JOIN st USING (l_partkey)
WHERE 5 * pl.qty * st.cnt < st.sq
"""


def tpch_q22(segs: tuple = ("BUILDING", "AUTOMOBILE", "MACHINERY"),
             cutoff: str = "2000-01-01") -> str:
    """Global sales opportunity: above-average-balance customers with no
    RECENT orders, division-free comparison (twin of
    `queries.q_tpch_q22`)."""
    seg_list = ", ".join(f"'{s}'" for s in segs)
    return f"""
WITH base AS (
  SELECT c_custkey, c_mktsegment,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents,
         (c_acctbal > 0.0)::INT AS is_pos
  FROM customer WHERE c_mktsegment IN ({seg_list})
),
avgpos AS (
  SELECT sum(is_pos) AS n_pos,
         sum(CASE WHEN is_pos = 1 THEN bal_cents ELSE 0 END) AS sum_pos
  FROM base
)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_cents) AS BIGINT) AS totbal_cents
FROM base, avgpos
WHERE bal_cents * n_pos > sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= DATE '{cutoff}')
GROUP BY 1
"""


def regr_stats() -> str:
    """Per-type integer regression sufficient statistics of value cents
    vs hour-of-day (twin of `queries.q_regr_stats`)."""
    return """
WITH b AS (
  SELECT event_type,
         CAST(extract(hour FROM ts) AS BIGINT) AS x,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x * y) AS BIGINT) AS sum_xy,
       CAST(sum(x * x) AS BIGINT) AS sum_x2,
       CAST(sum(y * y) AS BIGINT) AS sum_y2
FROM b GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 17: TPC-H Q9 / Q19, edit-distance window, language Gini, audio stats
# ---------------------------------------------------------------------------


def tpch_q9(part_sub: str = "widget") -> str:
    """Product-type profit by supplier nation x ship year, exact integer
    cents (twin of `queries.q_tpch_q9`)."""
    return f"""
SELECT n_name AS nation,
       CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS profit_cents
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%{part_sub}%'
GROUP BY 1, 2
"""


def tpch_q19(clauses: tuple) -> str:
    """Disjunctive-predicate revenue (twin of `queries.q_tpch_q19`)."""
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in clauses)
    return f"""
SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                    * 100) AS BIGINT)), 0) AS BIGINT)
         AS cents,
       CAST(count(*) AS BIGINT) AS nlines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {ors}
"""


def edit_window(w: int = 3, k: int = 96) -> str:
    """Byte-level Levenshtein between prefix texts of neighbor doc pairs
    (twin of `queries.q_edit_window`; DuckDB's levenshtein counts byte
    edits, matching `text.levenshtein_batch`)."""
    return f"""
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(levenshtein(substr(a.text, 1, {k}),
                        substr(b.text, 1, {k})) AS BIGINT) AS dist
FROM documents a
JOIN documents b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + {w}
"""


def lang_gini() -> str:
    """Per-source language-diversity sufficient statistics (twin of
    `queries.q_lang_gini`)."""
    return """
WITH c AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1, 2
)
SELECT source, CAST(sum(cnt) AS BIGINT) AS n,
       CAST(sum(cnt * cnt) AS BIGINT) AS sumsq
FROM c GROUP BY 1
"""


def audio_stats(sr: int = 8000, mod: int = 4001) -> str:
    """Regenerates make_audio_blob's PCM arithmetic:
    n = 256 + (id%4)*128, sample i = (i*(id+11)) % mod - 2000; features
    n_samples / abs sum / energy / zero crossings (twin of
    `queries.q_audio_stats`)."""
    return f"""
WITH dims AS (
  SELECT doc_id AS item_id,
         CAST(256 + (doc_id % 4) * 128 AS BIGINT) AS n
  FROM documents
),
s AS (
  SELECT d.item_id, d.n, r.i,
         (r.i * (d.item_id + 11)) % {mod} - 2000 AS v,
         ((r.i - 1) * (d.item_id + 11)) % {mod} - 2000 AS pv
  FROM dims d CROSS JOIN range(640) r(i)
  WHERE r.i < d.n
)
SELECT item_id, CAST(min(n) AS BIGINT) AS n_samples,
       CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
       CAST(sum(v * v) AS BIGINT) AS sq_sum,
       CAST(sum(CASE WHEN i >= 1 AND ((v < 0) <> (pv < 0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS zc
FROM s GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 18: TPC-H Q2 / Q8 / Q11 / Q20 adaptations + Bloom-filter probe
# ---------------------------------------------------------------------------


def tpch_q2(sub: str = "bolt", sizes: tuple = ()) -> str:
    """Minimum-balance supplier per selected part over distinct shipped
    pairs (twin of `queries.q_tpch_q2`)."""
    in_list = ", ".join(str(s) for s in sizes)
    return f"""
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p_partkey, p_name, s_suppkey, s_name,
         CAST(floor(s_acctbal * 100) AS BIGINT) AS bal_cents
  FROM pairs
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  WHERE p_name LIKE '%{sub}%' AND p_size IN ({in_list})
),
r AS (SELECT *, row_number() OVER (PARTITION BY p_partkey
                                   ORDER BY bal_cents, s_suppkey) AS rn
      FROM cand)
SELECT p_partkey, p_name, s_suppkey, s_name, bal_cents
FROM r WHERE rn = 1
"""


def tpch_q8() -> str:
    """Per (customer region, order year) total vs same-region-supplied
    revenue, exact integer cents (twin of `queries.q_tpch_q8`)."""
    return """
SELECT r.r_name,
       CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS total_cents,
       sum(CASE WHEN sn.n_regionkey = cn.n_regionkey
                THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT) ELSE 0 END) AS local_cents
FROM lineitem
JOIN orders    ON o_orderkey = l_orderkey
JOIN customer  ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region r  ON r.r_regionkey = cn.n_regionkey
JOIN supplier  ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
GROUP BY 1, 2
"""


def tpch_q11() -> str:
    """Important parts: value above 1.3x the mean per-part value,
    division-free (twin of `queries.q_tpch_q11`)."""
    return """
WITH v AS (
  SELECT l_partkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS value_cents
  FROM lineitem GROUP BY 1
),
t AS (SELECT count(*) AS n, sum(value_cents) AS s FROM v)
SELECT l_partkey, value_cents
FROM v, t WHERE 10 * value_cents * n > 13 * s
"""


def tpch_q20(year: int = 1996) -> str:
    """Dominant supplier pairs: more than half of a part's yearly
    quantity (twin of `queries.q_tpch_q20`)."""
    return f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= DATE '{year}-01-01'
    AND l_shipdate < DATE '{year + 1}-01-01'
  GROUP BY 1, 2
),
pt AS (SELECT l_partkey, sum(qty) AS total_qty FROM ps GROUP BY 1)
SELECT ps.l_partkey, ps.l_suppkey, ps.qty,
       CAST(pt.total_qty AS BIGINT) AS total_qty
FROM ps JOIN pt USING (l_partkey)
WHERE 2 * ps.qty > pt.total_qty
"""


def bloom_probe(m: int = 1 << 14, k: int = 4,
                seg: str = "BUILDING") -> str:
    """Bloom-filter probe counts rebuilt in SQL: bit j of key x =
    (md5_number_lower(x) >> 14j) & (m-1); an order is bloom-positive
    iff all k bits are set (twin of `queries.q_bloom_probe`)."""
    return f"""
WITH keys AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = '{seg}'
),
bits AS (
  SELECT DISTINCT CAST((md5_number_lower(CAST(c_custkey AS VARCHAR))
                        >> (14 * CAST(r.i AS INT)))
                       & {m - 1} AS BIGINT) AS bit
  FROM keys CROSS JOIN range({k}) r(i)
),
pu AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
       FROM orders GROUP BY 1),
pb AS (
  SELECT pu.o_custkey,
         CAST((md5_number_lower(CAST(pu.o_custkey AS VARCHAR))
               >> (14 * CAST(r.i AS INT))) & {m - 1} AS BIGINT) AS bit
  FROM pu CROSS JOIN range({k}) r(i)
),
posu AS (
  SELECT o_custkey, min(CASE WHEN bit IN (SELECT bit FROM bits)
                             THEN 1 ELSE 0 END) AS pos
  FROM pb GROUP BY 1
)
SELECT CAST(sum(cnt) AS BIGINT) AS n_orders,
       CAST(sum(cnt * pos) AS BIGINT) AS n_pos,
       CAST(sum(CASE WHEN pu.o_custkey IN (SELECT c_custkey FROM keys)
                     THEN cnt ELSE 0 END) AS BIGINT) AS n_true
FROM pu JOIN posu USING (o_custkey)
"""


# ---------------------------------------------------------------------------
# wave 19: bipartite projection, priority sample, TPC-H Q21,
# double-sweep BFS, positional token search
# ---------------------------------------------------------------------------


def bipartite_proj() -> str:
    """Event-type co-occurrence by distinct users (twin of
    `queries.q_bipartite_proj`)."""
    return """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS t1, b.event_type AS t2,
       CAST(count(*) AS BIGINT) AS users
FROM ut a JOIN ut b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def priority_sample(k: int = 5) -> str:
    """K smallest md5-low-63 priorities per language (twin of
    `queries.q_priority_sample`)."""
    return f"""
WITH p AS (
  SELECT lang, doc_id,
         CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
              & 9223372036854775807::UBIGINT AS BIGINT) AS prio
  FROM documents
),
r AS (SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY prio, doc_id) AS rn
      FROM p)
SELECT lang, doc_id, prio FROM r WHERE rn <= {k}
"""


def tpch_q21() -> str:
    """Sole-R-supplier blame counts on finished multi-supplier orders
    (twin of `queries.q_tpch_q21`)."""
    return """
WITH lo AS (
  SELECT l_orderkey, l_suppkey, l_returnflag
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
),
per AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS ns,
         count(DISTINCT CASE WHEN l_returnflag = 'R'
                             THEN l_suppkey END) AS nr,
         min(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS rsupp
  FROM lo GROUP BY 1
)
SELECT rsupp AS l_suppkey, CAST(count(*) AS BIGINT) AS numwait
FROM per WHERE ns >= 2 AND nr = 1
GROUP BY 1
"""


@_materialized
def double_sweep(root_label: str = "m_0", iters: int = 12) -> str:
    """Double-sweep BFS: unrolled sweep from the root, re-root at the
    farthest reached vertex (tie -> min id), unrolled sweep again
    (twin of `queries.q_double_sweep`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
, r2 AS (SELECT i FROM {prev} ORDER BY dist DESC, i LIMIT 1),
e0 AS (SELECT i, 0 AS dist FROM r2)
"""
    prev = "e0"
    for k in range(1, iters + 1):
        sql += f"""
, e{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"e{k}"
    sql += f"""
SELECT (SELECT v.label FROM r2 JOIN verts v ON v.i = r2.i) AS label,
       CAST((SELECT max(dist) FROM {prev}) AS BIGINT) AS ecc,
       CAST((SELECT count(*) FROM {prev}) AS BIGINT) AS reached
"""
    return sql


def token_pos(token: str = "data") -> str:
    """First 1-based token index of `token` per document (twin of
    `queries.q_token_pos`)."""
    return f"""
SELECT doc_id,
       CAST(list_position(string_split(text, ' '), '{token}')
            AS BIGINT) AS pos
FROM documents
WHERE list_position(string_split(text, ' '), '{token}') > 0
"""


# ---------------------------------------------------------------------------
# wave 20: bipartiteness, percolation CC, Kronecker product, drawdown,
# decayed counters
# ---------------------------------------------------------------------------


@_materialized
def bipartite_check(root_label: str = "m_0", iters: int = 12) -> str:
    """BFS 2-coloring oddness of the reached subgraph (twin of
    `queries.q_bipartite_check`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
, ue AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
),
odd AS (
  SELECT count(*) AS c
  FROM ue JOIN {prev} da ON da.i = ue.a JOIN {prev} db ON db.i = ue.b
  WHERE da.dist % 2 = db.dist % 2
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM {prev}) AS reached,
       (SELECT CAST(c AS BIGINT) FROM odd) AS odd_edges,
       (SELECT CAST(CASE WHEN c = 0 THEN 1 ELSE 0 END AS BIGINT)
        FROM odd) AS is_bipartite
"""
    return sql


@_materialized
def percolation_cc(p: int = 60, iters: int = 12) -> str:
    """Knuth-hash bond percolation + unrolled min-dense-id propagation;
    component count (twin of `queries.q_percolation_cc`)."""
    sql = PREFIX + f"""
, dense AS (SELECT i, row_number() OVER (ORDER BY label) - 1 AS d
            FROM verts),
de AS (
  SELECT DISTINCT ds.d AS s, dd.d AS t
  FROM edges e JOIN dense ds ON ds.i = e.src
               JOIN dense dd ON dd.i = e.dst
  WHERE e.src <> e.dst
),
su AS (
  SELECT s, t FROM de CROSS JOIN params pr
  WHERE (((s * pr.n + t) % 1048576) * 2654435761
         + (s * pr.n + t) // 1048576) % 4294967296 % 100 < {p}
),
sund AS (SELECT s, t FROM su UNION SELECT t AS s, s AS t FROM su),
c0 AS (SELECT d AS i, d AS comp FROM dense)
"""
    prev = "c0"
    for k in range(1, iters + 1):
        sql += f"""
, c{k} AS (
  SELECT c.i, least(c.comp, coalesce(m.mn, c.comp)) AS comp
  FROM {prev} c
  LEFT JOIN (SELECT u.t AS i, min(cp.comp) AS mn
             FROM sund u JOIN {prev} cp ON cp.i = u.s
             GROUP BY u.t) m ON m.i = c.i
)"""
        prev = f"c{k}"
    sql += f"""
SELECT (SELECT CAST(count(*) AS BIGINT) FROM su) AS kept_edges,
       (SELECT CAST(count(DISTINCT comp) AS BIGINT) FROM {prev})
         AS n_components
"""
    return sql


def kron_product(b_edges: tuple = ()) -> str:
    """Kronecker product of the full dense-id edge table with a literal
    stencil (twin of `queries.q_kron_product`)."""
    vals = ", ".join(f"({p}, {q}, {w})" for p, q, w in b_edges)
    return PREFIX + f"""
, dense AS (SELECT i, row_number() OVER (ORDER BY label) - 1 AS d
            FROM verts),
a AS (
  SELECT ds.d AS s, dd.d AS t, CAST(e.w AS BIGINT) AS wa
  FROM edges e JOIN dense ds ON ds.i = e.src
               JOIN dense dd ON dd.i = e.dst
),
b (p, q, wb) AS (VALUES {vals})
SELECT a.s * 5 + b.p AS ksrc, a.t * 5 + b.q AS kdst,
       CAST(a.wa * b.wb AS BIGINT) AS w
FROM a CROSS JOIN b
"""


def max_drawdown() -> str:
    """Per-user max drawdown of the running cents balance (twin of
    `queries.q_max_drawdown`)."""
    return """
WITH b AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
c AS (
  SELECT user_id, ts, event_id,
         SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
  FROM b
),
d AS (
  SELECT user_id, cum,
         MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS peak
  FROM c
)
SELECT user_id, CAST(max(peak - cum) AS BIGINT) AS max_drawdown
FROM d GROUP BY 1
"""


def decayed_counts(decay_us: int, ref: str) -> str:
    """Dyadic time-decayed counters per event type (twin of
    `queries.q_decayed_counts`)."""
    return f"""
WITH b AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         least(greatest((epoch_us(TIMESTAMP '{ref}') - epoch_us(ts))
                        // {decay_us}, 0), 62) AS age
  FROM events
)
SELECT event_type,
       CAST(sum(cents >> age) AS BIGINT) AS decayed,
       CAST(sum(cents) AS BIGINT) AS raw
FROM b GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 21: PQ codes, KWIC, running distinct, parity reach, triangle
# strength
# ---------------------------------------------------------------------------


def pq_codes(nseed: int = 4, nsub: int = 8, dim: int = 64,
             qscale: int = 1 << 20) -> str:
    """Product-quantization codes vs the quantized seed centroids (twin
    of `queries.q_pq_codes`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
seeds AS (SELECT * FROM q WHERE vec_id < {nseed}),
d2 AS (
  SELECT v.vec_id, (v.dim - 1) // {dim // nsub} AS s,
         c.vec_id AS code, sum((v.q - c.q) * (v.q - c.q)) AS d2
  FROM q v JOIN seeds c ON c.dim = v.dim
  GROUP BY 1, 2, 3
),
r AS (SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                   ORDER BY d2, code) AS rn
      FROM d2)
SELECT vec_id, CAST(s AS BIGINT) AS s, CAST(code AS BIGINT) AS code
FROM r WHERE rn = 1
"""


def kwic(token: str = "data") -> str:
    """3-token window around the first occurrence of `token` (twin of
    `queries.q_kwic`)."""
    return f"""
WITH p AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         list_position(string_split(text, ' '), '{token}') AS pos
  FROM documents
)
SELECT doc_id,
       array_to_string(list_slice(toks, greatest(pos - 1, 1), pos + 1),
                       ' ') AS ctx3
FROM p WHERE pos > 0
"""


def running_distinct() -> str:
    """Running distinct event-type count per user (twin of
    `queries.q_running_distinct`)."""
    return """
WITH b AS (
  SELECT event_id, user_id, ts,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first
  FROM events
)
SELECT event_id,
       CAST(SUM(first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS run_distinct
FROM b
"""


@_materialized
def reach2_parity() -> str:
    """Ordered pairs with an odd number of directed 2-paths (twin of
    `queries.q_reach2_parity`)."""
    return PREFIX + """
, two AS (
  SELECT a.src AS i, b.dst AS j, count(*) AS c
  FROM edges a JOIN edges b ON b.src = a.dst
  GROUP BY 1, 2
)
SELECT vi.label AS src_label, vj.label AS dst_label
FROM two JOIN verts vi ON vi.i = two.i JOIN verts vj ON vj.i = two.j
WHERE c % 2 = 1
"""


@_materialized
def triangle_strength() -> str:
    """Sum of min canonical edge weight over all triangles (twin of
    `queries.q_triangle_strength`)."""
    return PREFIX + """
, uw AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         CAST(sum(w) AS BIGINT) AS w
  FROM edges WHERE src <> dst GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles,
       CAST(coalesce(sum(least(x.w, y.w, z.w)), 0) AS BIGINT)
         AS strength
FROM uw x JOIN uw y ON y.a = x.b
          JOIN uw z ON z.a = x.a AND z.b = y.b
"""


# ---------------------------------------------------------------------------
# wave 22: streaks, byte audit, directed 3-cycles, repo stats, top-2
# share
# ---------------------------------------------------------------------------


def max_streak() -> str:
    """Longest consecutive-day streak per user via gaps-and-islands
    (twin of `queries.q_max_streak`)."""
    return """
WITH d AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 86400000000 AS day
  FROM events
),
r AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id
                                  ORDER BY day) AS isl
  FROM d
),
runs AS (SELECT user_id, count(*) AS len FROM r GROUP BY user_id, isl)
SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
FROM runs GROUP BY 1
"""


def byte_stats() -> str:
    """Per-language codepoint vs byte totals (twin of
    `queries.q_byte_stats`)."""
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
FROM documents GROUP BY 1
"""


@_materialized
def cycle3_directed() -> str:
    """trace(A^3) over distinct loop-free directed edges (twin of
    `queries.q_cycle3_directed`)."""
    return PREFIX + """
SELECT CAST(count(*) AS BIGINT) AS closed_walks3
FROM edges e1
JOIN edges e2 ON e2.src = e1.dst
JOIN edges e3 ON e3.src = e2.dst AND e3.dst = e1.src
"""


@_materialized
def repo_stats() -> str:
    """Per-repo file/lang/import counts regenerated from the corpus
    arithmetic (twin of `queries.q_repo_stats`; import lines per file
    = its targets rows, incl. the ord-0 self-candidate)."""
    return PREFIX + """
, imp AS (SELECT i, count(*) AS ni FROM targets GROUP BY i)
SELECT 'repo_' || (f.i % 100) AS repo,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(count(DISTINCT f.i % 4) AS BIGINT) AS n_langs,
       CAST(sum(imp.ni) AS BIGINT) AS n_imports
FROM files f JOIN imp ON imp.i = f.i
GROUP BY 1
"""


def top2_share(k: int = 2) -> str:
    """Top-k users by spend per event type with type totals (twin of
    `queries.q_top2_share`)."""
    return f"""
WITH b AS (
  SELECT event_type, user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
tu AS (SELECT event_type, user_id, sum(cents) AS uc FROM b GROUP BY 1, 2),
tt AS (SELECT event_type, sum(uc) AS tc FROM tu GROUP BY 1),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY uc DESC, user_id) AS rn
      FROM tu)
SELECT r.event_type, CAST(rn AS BIGINT) AS rank, user_id,
       CAST(uc AS BIGINT) AS user_cents, CAST(tc AS BIGINT) AS type_cents
FROM r JOIN tt ON tt.event_type = r.event_type
WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# wave 23: co-citation, similarity histogram, transitions, MAD, degree
# quantiles
# ---------------------------------------------------------------------------


@_materialized
def cocitation_topk(k: int = 50, cmin: int = 2) -> str:
    """Top-k co-citation pairs (common in-neighbors) (twin of
    `queries.q_cocitation_topk`)."""
    return PREFIX + f"""
, cc AS (
  SELECT vi.label AS a, vj.label AS b, count(*) AS cnt
  FROM edges e1 JOIN edges e2 ON e2.src = e1.src AND e1.dst <> e2.dst
  JOIN verts vi ON vi.i = e1.dst JOIN verts vj ON vj.i = e2.dst
  WHERE vi.label < vj.label
  GROUP BY 1, 2
)
SELECT a, b, CAST(cnt AS BIGINT) AS cnt
FROM cc WHERE cnt >= {cmin}
ORDER BY cnt DESC, a, b
LIMIT {k}
"""


def sim_hist(nvec: int = 128, shift: int = 40, dim: int = 64,
             qscale: int = 1 << 20) -> str:
    """Bucketed pairwise integer-dot histogram (twin of
    `queries.q_sim_hist`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
  WHERE vec_id < {nvec}
),
dots AS (
  SELECT a.vec_id AS i, b.vec_id AS j, sum(a.q * b.q) AS dot
  FROM q a JOIN q b ON b.dim = a.dim AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT CAST(dot >> {shift} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM dots GROUP BY 1
"""


def transition_counts() -> str:
    """Markov transition counts of consecutive per-user event types
    (twin of `queries.q_transition_counts`)."""
    return """
WITH o AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type AS from_type, nxt AS to_type,
       CAST(count(*) AS BIGINT) AS cnt
FROM o WHERE nxt IS NOT NULL
GROUP BY 1, 2
"""


def events_mad() -> str:
    """Exact lower-median + MAD per event type, integer cents (twin of
    `queries.q_events_mad`)."""
    return """
WITH b AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM b
),
med AS (SELECT event_type, c AS med FROM r WHERE rn = (n + 1) // 2),
a AS (
  SELECT b.event_type, m.med, abs(b.c - m.med) AS d
  FROM b JOIN med m ON m.event_type = b.event_type
),
r2 AS (
  SELECT event_type, med, d,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM a
)
SELECT event_type, CAST(med AS BIGINT) AS med_cents,
       CAST(d AS BIGINT) AS mad_cents
FROM r2 WHERE rn = (n + 1) // 2
"""


@_materialized
def degree_quantiles(ps: tuple = (50, 90, 99)) -> str:
    """Discrete out-degree quantiles (twin of
    `queries.q_degree_quantiles`)."""
    vals = ", ".join(f"({p})" for p in ps)
    return PREFIX + f"""
, deg AS (SELECT src, count(*) AS dg FROM edges GROUP BY 1),
cnt AS (SELECT count(*) AS c FROM deg),
r AS (SELECT dg, row_number() OVER (ORDER BY dg) AS rn FROM deg)
SELECT CAST(q.p AS BIGINT) AS p, CAST(r.dg AS BIGINT) AS degree
FROM (VALUES {vals}) q(p), cnt
JOIN r ON r.rn = greatest(1, (q.p * cnt.c + 99) // 100)
"""


# ---------------------------------------------------------------------------
# wave 24: interval coverage, forward as-of, reorder gaps, vertex
# cover, greedy k-center
# ---------------------------------------------------------------------------


def interval_coverage(win_us: int) -> str:
    """Interval-union covered time per user (twin of
    `queries.q_interval_coverage`)."""
    return f"""
WITH b AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {win_us} AS e,
         event_id
  FROM events
),
c AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS pm
  FROM b
)
SELECT user_id,
       CAST(sum(greatest(e - greatest(s, coalesce(pm, -1)), 0))
            AS BIGINT) AS covered_us
FROM c GROUP BY 1
"""


def first_response(frm: str = "view", to: str = "purchase") -> str:
    """Forward as-of wait time (twin of `queries.q_first_response`)."""
    return f"""
WITH b AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IN ('{frm}', '{to}')
),
n AS (
  SELECT user_id, ts, event_id, event_type,
         min(CASE WHEN event_type = '{to}' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS nxt
  FROM b
)
SELECT event_id, CAST(nxt - epoch_us(ts) AS BIGINT) AS wait_us
FROM n WHERE event_type = '{frm}' AND nxt IS NOT NULL
"""


def order_gap_stats() -> str:
    """Consecutive-order gap statistics per customer (twin of
    `queries.q_order_gap_stats`)."""
    return """
WITH o AS (
  SELECT o_custkey,
         (lead(epoch_us(o_orderdate))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate,
                  o_orderkey)
          - epoch_us(o_orderdate)) // 86400000000 AS gap
  FROM orders
)
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap) AS BIGINT) AS sum_days,
       CAST(max(gap) AS BIGINT) AS max_days
FROM o WHERE gap IS NOT NULL
GROUP BY 1
"""


@_materialized
def vertex_cover(rounds: int = 12, b: int = 23) -> str:
    """Matched endpoints of the fixed-round matching = 2-approx vertex
    cover (twin of `queries.q_vertex_cover`)."""
    sql, prev = _matching_chain(rounds, b)
    sql += f"""
SELECT da.label AS label
FROM {prev} m JOIN dense da ON da.d = m.d
"""
    return sql


def k_center(k: int = 6, dim: int = 64, qscale: int = 1 << 20) -> str:
    """Greedy farthest-point selection, unrolled (twin of
    `queries.q_k_center`)."""
    sql = f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
dd AS MATERIALIZED (
  SELECT a.vec_id AS i, b.vec_id AS c,
         sum((a.q - b.q) * (a.q - b.q)) AS d2
  FROM q a JOIN q b ON b.dim = a.dim
  GROUP BY 1, 2
),
c0 (c) AS (VALUES (0))
"""
    prev = "c0"
    for r in range(1, k):
        sql += f"""
, m{r} AS (
  SELECT i FROM (
    SELECT dd.i, min(dd.d2) AS md
    FROM dd JOIN {prev} ON dd.c = {prev}.c
    WHERE dd.i NOT IN (SELECT c FROM {prev})
    GROUP BY dd.i
  ) ORDER BY md DESC, i LIMIT 1
),
c{r} AS (SELECT c FROM {prev} UNION SELECT i FROM m{r})
"""
        prev = f"c{r}"
    picks = ["SELECT 0 AS rank, 0 AS vec_id"] + [
        f"SELECT {r} AS rank, i AS vec_id FROM m{r}" for r in range(1, k)]
    sql += "\n" + "\nUNION ALL\n".join(picks)
    return sql


# ---------------------------------------------------------------------------
# wave 25: attribute mixing, monthly buckets, schema harmonization,
# degree moments, per-language quality
# ---------------------------------------------------------------------------


@_materialized
def lang_mixing() -> str:
    """Directed edge counts between endpoint file languages (twin of
    `queries.q_lang_mixing`)."""
    return PREFIX + """
SELECT (['py','js','go','rs'])[(e.src % 4) + 1] AS lang_src,
       (['py','js','go','rs'])[(e.dst % 4) + 1] AS lang_dst,
       CAST(count(*) AS BIGINT) AS cnt
FROM edges e GROUP BY 1, 2
"""


def orders_monthly() -> str:
    """Monthly order count + total cents (twin of
    `queries.q_orders_monthly`)."""
    return """
SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(extract(month FROM o_orderdate) AS BIGINT) AS o_month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders GROUP BY 1, 2
"""


def party_counts() -> str:
    """Customer/supplier union harmonized per nation (twin of
    `queries.q_party_counts`)."""
    return """
WITH p AS (
  SELECT c_nationkey AS nk, 'c' AS role,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer
  UNION ALL
  SELECT s_nationkey, 's', CAST(floor(s_acctbal * 100) AS BIGINT)
  FROM supplier
)
SELECT n_name,
       CAST(sum(CASE WHEN role = 'c' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_customers,
       CAST(sum(CASE WHEN role = 's' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_suppliers,
       CAST(sum(CASE WHEN role = 'c' THEN cents ELSE 0 END) AS BIGINT)
         AS cust_bal_cents,
       CAST(sum(CASE WHEN role = 's' THEN cents ELSE 0 END) AS BIGINT)
         AS supp_bal_cents
FROM p JOIN nation ON n_nationkey = nk
GROUP BY 1
"""


@_materialized
def degree_moments() -> str:
    """Degree-sequence wedge/claw normalizers (twin of
    `queries.q_degree_moments`)."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS d
        FROM und GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_vertices,
       CAST(sum(d) AS BIGINT) AS deg_sum,
       CAST(sum(d * (d - 1) // 2) AS BIGINT) AS wedges,
       CAST(sum(d * (d - 1) * (d - 2) // 6) AS BIGINT) AS claws
FROM deg
"""


def quality_by_lang() -> str:
    """Per-language quality sufficient statistics (twin of
    `queries.q_quality_by_lang`)."""
    return """
WITH t AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
per AS (
  SELECT doc_id, min(lang) AS lang, count(*) AS nt,
         count(DISTINCT tok) AS nd, sum(length(tok)) AS ch
  FROM t GROUP BY doc_id
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS sum_tokens,
       CAST(sum(nd) AS BIGINT) AS sum_distinct,
       CAST(sum(ch) AS BIGINT) AS sum_tok_chars
FROM per GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 26: continuation counts, butterflies, rolling DAU, video motion,
# supplier HHI
# ---------------------------------------------------------------------------


def continuation_counts() -> str:
    """Distinct left contexts per token (twin of
    `queries.q_continuation_counts`)."""
    return """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
b AS (
  SELECT unnest(toks[1:len(toks) - 1]) AS l,
         unnest(toks[2:len(toks)]) AS r
  FROM t
),
d AS (SELECT DISTINCT l, r FROM b)
SELECT r AS tok, CAST(count(*) AS BIGINT) AS cont_cnt
FROM d GROUP BY 1
"""


def butterfly_count() -> str:
    """Bipartite 2x2 biclique count over (user, event_type) (twin of
    `queries.q_butterfly_count`)."""
    return """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
pairs AS (
  SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS u
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT CAST(coalesce(sum(u * (u - 1) // 2), 0) AS BIGINT)
  AS butterflies
FROM pairs
"""


def rolling_dau(win: int = 7) -> str:
    """Rolling distinct active users per day (twin of
    `queries.q_rolling_dau`)."""
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
),
ex AS (
  SELECT DISTINCT user_id, day + CAST(g.i AS BIGINT) AS wday
  FROM ud CROSS JOIN generate_series(0, {win - 1}) g(i)
)
SELECT wday AS day, CAST(count(*) AS BIGINT) AS dau
FROM ex GROUP BY 1
"""


def video_motion() -> str:
    """Regenerates make_video_blob's frame arithmetic: nf = 4+(id%5),
    frame-size 64, pixel i = (i*(id+3)) % 241; motion = sum over i>=64
    of |p(i) - p(i-64)| (twin of `queries.q_video_motion`)."""
    return """
WITH dims AS (
  SELECT doc_id AS item_id, CAST(4 + (doc_id % 5) AS BIGINT) AS nf
  FROM documents
),
s AS (
  SELECT d.item_id, d.nf,
         abs((r.i * (d.item_id + 3)) % 241
             - ((r.i - 64) * (d.item_id + 3)) % 241) AS dv
  FROM dims d CROSS JOIN range(512) r(i)
  WHERE r.i >= 64 AND r.i < d.nf * 64
)
SELECT item_id, CAST(min(nf) AS BIGINT) AS n_frames,
       CAST(sum(dv) AS BIGINT) AS motion
FROM s GROUP BY 1
"""


def supplier_hhi() -> str:
    """Per-supplier part-concentration sufficient statistics (twin of
    `queries.q_supplier_hhi`)."""
    return """
WITH c AS (
  SELECT l_suppkey, l_partkey, CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1, 2
)
SELECT l_suppkey, CAST(sum(cnt) AS BIGINT) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cnt * cnt) AS BIGINT) AS sumsq
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 27: embedding label stats, global deciles, peak hour, commit
# nibbles, hapax counts
# ---------------------------------------------------------------------------


def emb_label_stats(dim: int = 64, qscale: int = 1 << 20) -> str:
    """Per-label count + quantized squared-norm totals (twin of
    `queries.q_emb_label_stats`)."""
    return f"""
WITH q AS (
  SELECT vec_id, label,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
per AS (SELECT vec_id, min(label) AS label, sum(q * q) AS n2
        FROM q GROUP BY 1)
SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n2) AS BIGINT) AS sum_norm2
FROM per GROUP BY 1
"""


def doc_deciles(k: int = 10) -> str:
    """Global NTILE over (n_chars, doc_id) (twin of
    `queries.q_doc_deciles`)."""
    return f"""
SELECT doc_id,
       CAST(ntile({k}) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
         AS decile
FROM documents
"""


def peak_hour_load() -> str:
    """Per-user modal absolute hour (ties -> earliest) (twin of
    `queries.q_peak_hour_load`)."""
    return """
WITH c AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY cnt DESC, hr) AS rn
      FROM c)
SELECT user_id, CAST(hr AS BIGINT) AS peak_hour, cnt AS peak_cnt
FROM r WHERE rn = 1
"""


@_materialized
def commit_nibbles() -> str:
    """Low-nibble histogram of corpus commit hashes (twin of
    `queries.q_commit_nibbles`)."""
    return PREFIX + """
, com AS (
  SELECT printf('%040x', (f.i * 2654435761 + 40503) % 4294967296)
    AS commit
  FROM files f
)
SELECT substr(commit, 40, 1) AS nibble, CAST(count(*) AS BIGINT) AS cnt
FROM com GROUP BY 1
"""


def hapax_counts() -> str:
    """Distinct tokens + hapax legomena per language (twin of
    `queries.q_hapax_counts`)."""
    return """
WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
c AS (SELECT lang, tok, count(*) AS cnt FROM t GROUP BY 1, 2)
SELECT lang, CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hapax
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 28: Benford audit, edge multiplicity, full-outer roles, embedding
# dim stats, qty-discount grid
# ---------------------------------------------------------------------------


def benford_digits() -> str:
    """First-significant-digit histogram of positive cents (twin of
    `queries.q_benford_digits`)."""
    return """
WITH b AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events
)
SELECT substr(CAST(cents AS VARCHAR), 1, 1) AS digit,
       CAST(count(*) AS BIGINT) AS cnt
FROM b WHERE cents > 0
GROUP BY 1
"""


@_materialized
def edge_multiplicity() -> str:
    """Histogram of dedup-summed edge weights (twin of
    `queries.q_edge_multiplicity`)."""
    return PREFIX + """
SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS cnt
FROM edges GROUP BY 1
"""


def nation_roles_outer() -> str:
    """FULL OUTER of per-nation customer vs supplier counts (twin of
    `queries.q_nation_roles_outer`)."""
    return """
WITH cc AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS c
            FROM customer GROUP BY 1),
sc AS (SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS s
       FROM supplier GROUP BY 1)
SELECT coalesce(cc.nk, sc.nk) AS n_nationkey,
       CAST(coalesce(cc.c, 0) AS BIGINT) AS n_cust,
       CAST(coalesce(sc.s, 0) AS BIGINT) AS n_supp
FROM cc FULL OUTER JOIN sc ON sc.nk = cc.nk
"""


def emb_dim_stats(dim: int = 64, qscale: int = 1 << 20) -> str:
    """Per-dimension quantized sum / sum-of-squares (twin of
    `queries.q_emb_dim_stats`)."""
    return f"""
WITH q AS (
  SELECT CAST(g.d AS BIGINT) - 1 AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
)
SELECT dim, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(sum(q * q) AS BIGINT) AS sum_q2
FROM q GROUP BY 1
"""


def qty_disc_grid() -> str:
    """Quantity-band x discount-percent counts (twin of
    `queries.q_qty_disc_grid`)."""
    return """
SELECT CAST(CAST(l_quantity AS BIGINT) // 10 AS BIGINT) AS qty_band,
       CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct,
       CAST(count(*) AS BIGINT) AS cnt
FROM lineitem GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# wave 29: DAG layering, out-of-order audit, degree joint histogram,
# pixel histogram, multiset except
# ---------------------------------------------------------------------------


@_materialized
def dag_layers(iters: int = 12) -> str:
    """Longest-path layering of the dense-order acyclic orientation
    (twin of `queries.q_dag_layers`)."""
    sql = PREFIX + """
, dense AS (SELECT i, row_number() OVER (ORDER BY label) - 1 AS d,
            label FROM verts),
dag AS (
  SELECT DISTINCT ds.d AS s, dd.d AS t
  FROM edges e JOIN dense ds ON ds.i = e.src
               JOIN dense dd ON dd.i = e.dst
  WHERE ds.d < dd.d
),
l0 AS (SELECT d AS v, 0 AS layer FROM dense)
"""
    prev = "l0"
    for k in range(1, iters + 1):
        sql += f"""
, l{k} AS (
  SELECT p.v, greatest(p.layer, coalesce(m.mx, p.layer)) AS layer
  FROM {prev} p
  LEFT JOIN (SELECT g.t AS v, max(pp.layer + 1) AS mx
             FROM dag g JOIN {prev} pp ON pp.v = g.s
             GROUP BY g.t) m ON m.v = p.v
)"""
        prev = f"l{k}"
    sql += f"""
SELECT de.label AS label, CAST(l.layer AS BIGINT) AS layer
FROM {prev} l JOIN dense de ON de.d = l.v
"""
    return sql


def ooo_events() -> str:
    """Per-user out-of-order inversion count + max backward skew (twin
    of `queries.q_ooo_events`)."""
    return """
WITH b AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS pm
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN pm > us THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(coalesce(max(CASE WHEN pm > us THEN pm - us END), 0)
            AS BIGINT) AS max_skew_us
FROM b GROUP BY 1
"""


@_materialized
def deg_joint_hist() -> str:
    """Joint (outdeg, indeg) counts over ALL vertices (twin of
    `queries.q_deg_joint_hist`)."""
    return PREFIX + """
, od AS (SELECT src AS v, count(*) AS d FROM edges GROUP BY 1),
idg AS (SELECT dst AS v, count(*) AS d FROM edges GROUP BY 1)
SELECT CAST(coalesce(od.d, 0) AS BIGINT) AS outdeg,
       CAST(coalesce(idg.d, 0) AS BIGINT) AS indeg,
       CAST(count(*) AS BIGINT) AS cnt
FROM verts v
LEFT JOIN od ON od.v = v.i LEFT JOIN idg ON idg.v = v.i
GROUP BY 1, 2
"""


def pixel_hist() -> str:
    """Global pixel-value histogram over image payloads (twin of
    `queries.q_pixel_hist`; make_blob arithmetic)."""
    return """
WITH dims AS (
  SELECT doc_id AS item_id,
         CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS width,
         CAST(8 + (doc_id % 3) * 4 AS BIGINT) AS height
  FROM documents
)
SELECT CAST((r.i * (d.item_id + 7)) % 251 AS BIGINT) AS pixel,
       CAST(count(*) AS BIGINT) AS cnt
FROM dims d CROSS JOIN range(384) r(i)
WHERE r.i < d.width * d.height
GROUP BY 1
"""


def token_except(a: str = "en", b: str = "es") -> str:
    """Multiset EXCEPT ALL of token bags between two languages (twin of
    `queries.q_token_except`)."""
    return f"""
WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE lang IN ('{a}', '{b}')
),
c AS (
  SELECT tok,
         sum(CASE WHEN lang = '{a}' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN lang = '{b}' THEN 1 ELSE 0 END) AS cb
  FROM t GROUP BY 1
)
SELECT tok, CAST(ca - cb AS BIGINT) AS excess
FROM c WHERE ca > cb
"""


# ---------------------------------------------------------------------------
# wave 30: configuration-model stats, curation funnel, dup-cluster
# sizes, similarity by label
# ---------------------------------------------------------------------------


@_materialized
def config_model_stats() -> str:
    """Configuration-model null expectation numerators (twin of
    `queries.q_config_model_stats`)."""
    return PREFIX + """
, od AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS d
         FROM edges GROUP BY 1),
idg AS (SELECT dst AS v, CAST(count(*) AS BIGINT) AS d
        FROM edges GROUP BY 1)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) AS m,
       (SELECT CAST(sum(o.d * i.d) AS BIGINT)
        FROM edges e JOIN od o ON o.v = e.src
                     JOIN idg i ON i.v = e.dst) AS sum_dout_din,
       (SELECT CAST(sum(d * d) AS BIGINT) FROM od) AS sum_dout2,
       (SELECT CAST(sum(d * d) AS BIGINT) FROM idg) AS sum_din2
"""


def filter_funnel(min_chars: int = 150, num: int = 3,
                  den: int = 10) -> str:
    """Successive quality-gate survivor counts (twin of
    `queries.q_filter_funnel`)."""
    return f"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
),
per AS (
  SELECT doc_id, min(lang) AS lang, min(n_chars) AS nc,
         count(*) AS nt, count(DISTINCT tok) AS nd
  FROM t GROUP BY doc_id
),
f AS (
  SELECT (nc >= {min_chars}) AS s1,
         (nc >= {min_chars} AND nd * {den} >= nt * {num}) AS s2,
         (nc >= {min_chars} AND nd * {den} >= nt * {num}
          AND lang <> 'zh') AS s3
  FROM per
)
SELECT CAST(g.i AS BIGINT) AS stage,
       CAST(CASE g.i WHEN 0 THEN (SELECT count(*) FROM f)
                     WHEN 1 THEN (SELECT sum(s1::INT) FROM f)
                     WHEN 2 THEN (SELECT sum(s2::INT) FROM f)
                     ELSE (SELECT sum(s3::INT) FROM f) END AS BIGINT)
         AS survivors
FROM generate_series(0, 3) g(i)
"""


def dup_size_hist(tau: float = 0.5, rounds: int = 6,
                  df_cap: int = 1000) -> str:
    """Cluster-size histogram over the dup_clusters assignment (twin of
    `queries.q_dup_size_hist`)."""
    base = dup_clusters(tau, rounds, df_cap)
    # swap the final projection for the size histogram
    tail = base.rindex("SELECT v AS doc_id")
    final_cte = base[tail:].split("FROM ")[1].strip()
    return base[:tail] + """, sizes AS (
  SELECT lbl, CAST(count(*) AS BIGINT) AS sz
  FROM lfinal GROUP BY lbl
)
SELECT sz AS size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY 1
""".replace("lfinal", final_cte)


def sim_by_label(nvec: int = 128, dim: int = 64,
                 qscale: int = 1 << 20) -> str:
    """Same-label vs cross-label integer dot sums (twin of
    `queries.q_sim_by_label`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, label,
         CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
  WHERE vec_id < {nvec}
),
labs AS (SELECT DISTINCT vec_id, label FROM q),
dots AS (
  SELECT a.vec_id AS i, b.vec_id AS j, sum(a.q * b.q) AS dot
  FROM q a JOIN q b ON b.dim = a.dim AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
tagged AS (
  SELECT (la.label = lb.label)::INT AS same, dot
  FROM dots JOIN labs la ON la.vec_id = dots.i
            JOIN labs lb ON lb.vec_id = dots.j
)
SELECT CAST(g.i AS BIGINT) AS same_label,
       CAST(coalesce(sum(CASE WHEN same = g.i THEN 1 END), 0)
            AS BIGINT) AS n_pairs,
       CAST(coalesce(sum(CASE WHEN same = g.i THEN dot END), 0)
            AS BIGINT) AS sum_dot
FROM generate_series(0, 1) g(i) LEFT JOIN tagged ON TRUE
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 31: ball conductance, spend Gini, trigram L1, 1-NN accuracy,
# segment momentum
# ---------------------------------------------------------------------------


@_materialized
def ball_conductance(root_label: str = "m_0", r: int = 2) -> str:
    """Sweep-cut statistics of the r-hop ball (twin of
    `queries.q_ball_conductance`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, r + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
, ball AS (SELECT i FROM {prev}),
deg AS (SELECT src AS v, count(*) AS d FROM und GROUP BY 1),
ue AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
),
tagged AS (
  SELECT (ba.i IS NOT NULL)::INT AS ia, (bb.i IS NOT NULL)::INT AS ib
  FROM ue LEFT JOIN ball ba ON ba.i = ue.a
          LEFT JOIN ball bb ON bb.i = ue.b
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ball) AS ball_size,
       (SELECT CAST(coalesce(sum(d.d), 0) AS BIGINT)
        FROM ball b JOIN deg d ON d.v = b.i) AS volume,
       (SELECT CAST(coalesce(sum(CASE WHEN ia <> ib THEN 1 END), 0)
                    AS BIGINT) FROM tagged) AS cut_edges,
       (SELECT CAST(coalesce(sum(CASE WHEN ia = 1 AND ib = 1
                                      THEN 1 END), 0) AS BIGINT)
        FROM tagged) AS internal_edges
"""
    return sql


def spend_gini() -> str:
    """Exact Gini numerator over customer spend (twin of
    `queries.q_spend_gini`)."""
    return """
WITH s AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
r AS (
  SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS rn,
         count(*) OVER () AS n
  FROM s
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum((2 * rn - n - 1) * cents) AS BIGINT) AS gini_num
FROM r
"""


def trigram_l1(a: str = "en", b: str = "fr", maxlen: int = 600) -> str:
    """Character-trigram L1 divergence between two language profiles
    (twin of `queries.q_trigram_l1`)."""
    return f"""
WITH t AS (
  SELECT lang, substr(text, CAST(r.i AS INT), 3) AS tri
  FROM documents CROSS JOIN range(1, {maxlen}) r(i)
  WHERE lang IN ('{a}', '{b}') AND r.i <= length(text) - 2
),
c AS (
  SELECT tri,
         sum(CASE WHEN lang = '{a}' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN lang = '{b}' THEN 1 ELSE 0 END) AS cb
  FROM t GROUP BY 1
)
SELECT CAST(sum(abs(ca - cb)) AS BIGINT) AS l1_dist,
       CAST(sum(ca) AS BIGINT) AS mass_a,
       CAST(sum(cb) AS BIGINT) AS mass_b
FROM c
"""


def knn1_accuracy(nvec: int = 256, dim: int = 64,
                  qscale: int = 1 << 20) -> str:
    """1-NN label-match accuracy over quantized dots (twin of
    `queries.q_knn1_accuracy`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, label, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
  WHERE vec_id < {nvec}
),
labs AS (SELECT DISTINCT vec_id, label FROM q),
dots AS (
  SELECT a.vec_id AS i, b.vec_id AS j, sum(a.q * b.q) AS dot
  FROM q a JOIN q b ON b.dim = a.dim AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
nn AS (
  SELECT i, j FROM (
    SELECT i, j, row_number() OVER (PARTITION BY i
                                    ORDER BY dot DESC, j) AS rn
    FROM dots
  ) WHERE rn = 1
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct
FROM nn JOIN labs la ON la.vec_id = nn.i
        JOIN labs lb ON lb.vec_id = nn.j
"""


def segment_momentum() -> str:
    """Month-over-month revenue deltas per segment (twin of
    `queries.q_segment_momentum`)."""
    return """
WITH m AS (
  SELECT c_mktsegment,
         CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(extract(month FROM o_orderdate) AS BIGINT) AS o_month,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1, 2, 3
)
SELECT c_mktsegment, o_year, o_month, cents,
       CAST(cents - lag(cents) OVER (PARTITION BY c_mktsegment
                                     ORDER BY o_year, o_month)
            AS BIGINT) AS delta
FROM m
"""


# ---------------------------------------------------------------------------
# wave 32: relational division, RANGE frame, apportionment, mobility,
# time heatmap
# ---------------------------------------------------------------------------


def supplies_all(brand: str = "Brand#2", k: int = 3) -> str:
    """Suppliers covering every one of the brand's top-k shipped parts
    — relational division (twin of `queries.q_supplies_all`)."""
    return f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = '{brand}'),
target AS (
  SELECT l_partkey FROM lineitem JOIN bp ON p_partkey = l_partkey
  GROUP BY 1 ORDER BY count(*) DESC, l_partkey LIMIT {k}
),
pairs AS (
  SELECT DISTINCT l_suppkey, l_partkey
  FROM lineitem JOIN target USING (l_partkey)
)
SELECT l_suppkey FROM pairs
GROUP BY 1
HAVING count(*) = (SELECT count(*) FROM target)
"""


def range_frame_sum(win_us: int) -> str:
    """Value-based RANGE frame rolling sum, peers included (twin of
    `queries.q_range_frame_sum`)."""
    return f"""
SELECT event_id,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL '{win_us} microseconds' PRECEDING
           AND CURRENT ROW) AS BIGINT) AS range_cents
FROM events
"""


def mixture_alloc(total: int = 1000) -> str:
    """Largest-remainder apportionment of sampling slots by token mass
    (twin of `queries.q_mixture_alloc`)."""
    return f"""
WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
m AS (SELECT lang, CAST(count(*) AS BIGINT) AS tokens FROM t GROUP BY 1),
tot AS (SELECT sum(tokens) AS s, count(*) AS k FROM m),
b AS (
  SELECT lang, tokens,
         {total} * tokens // s AS base,
         {total} * tokens % s AS rem
  FROM m, tot
),
lft AS (SELECT {total} - sum(base) AS l FROM b),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang) AS rn
      FROM b)
SELECT lang, tokens,
       CAST(base + CASE WHEN rn <= (SELECT l FROM lft)
                        THEN 1 ELSE 0 END AS BIGINT) AS seats
FROM r
"""


def mobility_matrix(ya: int = 1996, yb: int = 1999) -> str:
    """Threshold-quartile spend mobility matrix (twin of
    `queries.q_mobility_matrix`)."""
    def spend(y, alias):
        return f"""
{alias} AS MATERIALIZED (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  WHERE o_orderdate >= DATE '{y}-01-01'
    AND o_orderdate < DATE '{y + 1}-01-01'
  GROUP BY 1
),
{alias}r AS MATERIALIZED (
  SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
         count(*) OVER () AS n
  FROM {alias}
),
{alias}t AS (
  SELECT
    (SELECT cents FROM {alias}r
     WHERE rn = greatest(1, (25 * n + 99) // 100) LIMIT 1) AS t25,
    (SELECT cents FROM {alias}r
     WHERE rn = greatest(1, (50 * n + 99) // 100) LIMIT 1) AS t50,
    (SELECT cents FROM {alias}r
     WHERE rn = greatest(1, (75 * n + 99) // 100) LIMIT 1) AS t75
)"""

    return f"""
WITH {spend(ya, "sa")},
{spend(yb, "sb")[1:]}
SELECT CAST(1 + (sa.cents > ta.t25)::INT + (sa.cents > ta.t50)::INT
            + (sa.cents > ta.t75)::INT AS BIGINT) AS q_a,
       CAST(1 + (sb.cents > tb.t25)::INT + (sb.cents > tb.t50)::INT
            + (sb.cents > tb.t75)::INT AS BIGINT) AS q_b,
       CAST(count(*) AS BIGINT) AS cnt
FROM sa JOIN sb ON sb.o_custkey = sa.o_custkey, sat ta, sbt tb
GROUP BY 1, 2
"""


def dow_hour_heat() -> str:
    """Weekday x hour event counts (twin of `queries.q_dow_hour_heat`;
    dayofweek: 0 = Sunday, matching (epoch_day + 4) % 7)."""
    return """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(extract(hour FROM ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# wave 33: spectral moment, idempotency dedup, multiset intersect,
# continuous percentile, Pareto coverage
# ---------------------------------------------------------------------------


@_materialized
def closed_walks4() -> str:
    """trace(A^4) over the distinct directed adjacency (twin of
    `queries.q_closed_walks4`)."""
    return PREFIX + """
, two AS (
  SELECT a.src AS i, b.dst AS j, CAST(count(*) AS BIGINT) AS c
  FROM edges a JOIN edges b ON b.src = a.dst
  GROUP BY 1, 2
)
SELECT CAST(coalesce(sum(x.c * y.c), 0) AS BIGINT) AS closed_walks4
FROM two x JOIN two y ON y.i = x.j AND y.j = x.i
"""


def idem_dedup(bucket_us: int) -> str:
    """Events vs distinct (user, type, minute) keys per type (twin of
    `queries.q_idem_dedup`)."""
    return f"""
WITH k AS (
  SELECT event_type, user_id, epoch_us(ts) // {bucket_us} AS minute
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT (user_id, minute)) AS BIGINT) AS n_keys
FROM k GROUP BY 1
"""


def token_intersect(a: str = "en", b: str = "es") -> str:
    """Multiset INTERSECT ALL mass between two language token bags
    (twin of `queries.q_token_intersect`)."""
    return f"""
WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE lang IN ('{a}', '{b}')
),
c AS (
  SELECT tok,
         sum(CASE WHEN lang = '{a}' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN lang = '{b}' THEN 1 ELSE 0 END) AS cb
  FROM t GROUP BY 1
)
SELECT CAST(sum(least(ca, cb)) AS BIGINT) AS intersect_mass,
       CAST(sum(CASE WHEN least(ca, cb) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS common_tokens
FROM c
"""


def pctl_cont(num: int = 3, den: int = 8) -> str:
    """PERCENTILE_CONT bracketing order statistics as exact rationals
    (twin of `queries.q_pctl_cont`)."""
    return f"""
WITH b AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM b
),
pos AS (
  SELECT event_type, min(n) AS n,
         ((min(n) - 1) * {num}) // {den} AS k,
         ((min(n) - 1) * {num}) % {den} AS rem
  FROM r GROUP BY event_type
)
SELECT p.event_type,
       CAST((SELECT c FROM r WHERE r.event_type = p.event_type
             AND rn = p.k + 1) AS BIGINT) AS lo,
       CAST(CASE WHEN p.rem = 0
                 THEN (SELECT c FROM r WHERE r.event_type = p.event_type
                       AND rn = p.k + 1)
                 ELSE (SELECT c FROM r WHERE r.event_type = p.event_type
                       AND rn = least(p.k + 2, p.n)) END AS BIGINT)
         AS hi,
       CAST(p.rem AS BIGINT) AS frac_num,
       CAST({den} AS BIGINT) AS frac_den
FROM pos p
"""


def pareto80(pct: int = 80) -> str:
    """Smallest top-customer set reaching pct% of revenue (twin of
    `queries.q_pareto80`)."""
    return f"""
WITH s AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn,
         SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
  FROM s
),
t AS (SELECT sum(cents) AS total FROM s),
hit AS (SELECT min(rn) AS n_top FROM r, t
        WHERE 100 * cum >= {pct} * total)
SELECT CAST(h.n_top AS BIGINT) AS n_top,
       CAST((SELECT cum FROM r WHERE rn = h.n_top) AS BIGINT)
         AS covered_cents,
       CAST(t.total AS BIGINT) AS total_cents
FROM hit h, t
"""


# ---------------------------------------------------------------------------
# wave 34: neighbor-degree curve, systematic sampling, peel schedule,
# n_chars audit, dominant-dimension histogram
# ---------------------------------------------------------------------------


@_materialized
def knn_curve() -> str:
    """Average-neighbor-degree curve sufficient statistics (twin of
    `queries.q_knn_curve`)."""
    return PREFIX + """
, od AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS d
         FROM edges GROUP BY 1)
SELECT os.d AS d,
       (SELECT CAST(count(*) AS BIGINT) FROM od x
        WHERE x.d = os.d) AS n_vertices,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(coalesce(odd.d, 0)) AS BIGINT) AS nbr_deg_sum
FROM edges e
JOIN od os ON os.v = e.src
LEFT JOIN od odd ON odd.v = e.dst
GROUP BY os.d
"""


def systematic_sample(step: int = 37) -> str:
    """Every step-th doc under the global (n_chars, doc_id) order
    (twin of `queries.q_systematic_sample`)."""
    return f"""
WITH r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rank
  FROM documents
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank % {step} = 0
"""


@_materialized
def peel_trace(rounds: int = 6, k: int = 2) -> str:
    """Synchronous degree < k peeling schedule (twin of
    `queries.q_peel_trace`)."""
    sql = PREFIX + """
, ue AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
),
alive0 AS (SELECT i FROM verts)
"""
    prev = "alive0"
    selects = []
    for r in range(1, rounds + 1):
        sql += f"""
, deg{r} AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT ue.a AS v FROM ue
    JOIN {prev} x ON x.i = ue.a JOIN {prev} y ON y.i = ue.b
    UNION ALL
    SELECT ue.b FROM ue
    JOIN {prev} x ON x.i = ue.a JOIN {prev} y ON y.i = ue.b
  ) GROUP BY v
),
kill{r} AS (
  SELECT p.i FROM {prev} p
  LEFT JOIN deg{r} d ON d.v = p.i
  WHERE coalesce(d.d, 0) < {k}
),
alive{r} AS (
  SELECT i FROM {prev} WHERE i NOT IN (SELECT i FROM kill{r})
)"""
        selects.append(
            f"SELECT {r} AS round,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM kill{r})"
            f" AS removed,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM alive{r})"
            f" AS surviving")
        prev = f"alive{r}"
    # the Ray side early-stops after the first empty round; mirror by
    # keeping rows up to and including the first removed = 0 row
    sql += ("\n, trace AS (" + "\nUNION ALL\n".join(selects) + ")\n"
            + """
, firstz AS (SELECT coalesce(min(round), 999) AS z FROM trace
             WHERE removed = 0)
SELECT CAST(round AS BIGINT) AS round, removed, surviving
FROM trace, firstz WHERE round <= z
""")
    return sql


def nchars_audit() -> str:
    """n_chars column vs length(text) consistency (twin of
    `queries.q_nchars_audit`)."""
    return """
SELECT CAST(sum(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END)
            AS BIGINT) AS n_match,
       CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mismatch,
       CAST(max(abs(length(text) - n_chars)) AS BIGINT) AS max_abs_diff
FROM documents
"""


def dominant_dim_hist(dim: int = 64, qscale: int = 1 << 20) -> str:
    """Argmax-dimension histogram (ties -> lowest dim) (twin of
    `queries.q_dominant_dim_hist`)."""
    return f"""
WITH q AS (
  SELECT vec_id, CAST(g.d AS BIGINT) - 1 AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
r AS (SELECT vec_id, dim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY q DESC, dim) AS rn
      FROM q)
SELECT dim, CAST(count(*) AS BIGINT) AS cnt
FROM r WHERE rn = 1
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 35: triad motifs, digit ratio, basket triples, key gaps,
# per-user gap percentile
# ---------------------------------------------------------------------------


@_materialized
def motif_counts() -> str:
    """Feed-forward vs cyclic triads + mutual pairs (twin of
    `queries.q_motif_counts`)."""
    return PREFIX + """
, two AS (
  SELECT a.src AS i, b.dst AS j, CAST(count(*) AS BIGINT) AS c
  FROM edges a JOIN edges b ON b.src = a.dst
  GROUP BY 1, 2
)
SELECT (SELECT CAST(coalesce(sum(two.c), 0) AS BIGINT)
        FROM two JOIN edges e ON e.src = two.i AND e.dst = two.j)
         AS feed_forward,
       (SELECT CAST(coalesce(sum(two.c), 0) AS BIGINT)
        FROM two JOIN edges e ON e.src = two.j AND e.dst = two.i)
         AS cycles3_walks,
       (SELECT CAST(count(*) AS BIGINT)
        FROM edges a JOIN edges b ON b.src = a.dst AND b.dst = a.src
        WHERE a.src < a.dst) AS mutual_pairs
"""


def digit_ratio() -> str:
    """Digit-bearing token counts per source (twin of
    `queries.q_digit_ratio`)."""
    return """
WITH t AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN regexp_matches(tok, '[0-9]')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_digit
FROM t GROUP BY 1
"""


def basket_triples(minsup: int = 2, k: int = 20) -> str:
    """Frequent distinct part triples across orders (twin of
    `queries.q_basket_triples`)."""
    return f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
       CAST(count(*) AS BIGINT) AS support
FROM d a
JOIN d b ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
JOIN d c ON c.l_orderkey = a.l_orderkey AND c.l_partkey > b.l_partkey
GROUP BY 1, 2, 3
HAVING count(*) >= {minsup}
ORDER BY support DESC, p1, p2, p3
LIMIT {k}
"""


def orderkey_gaps() -> str:
    """Orderkey sequence density audit (twin of
    `queries.q_orderkey_gaps`)."""
    return """
SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key,
       CAST(max(o_orderkey) - min(o_orderkey) + 1
            - count(DISTINCT o_orderkey) AS BIGINT) AS missing
FROM orders
"""


def user_gap_p95(p: int = 95) -> str:
    """Per-user p95 inter-event gap (twin of
    `queries.q_user_gap_p95`)."""
    return f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
gg AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL),
r AS (
  SELECT user_id, gap,
         row_number() OVER (PARTITION BY user_id ORDER BY gap) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM gg
)
SELECT user_id, CAST(gap AS BIGINT) AS p95_gap_us
FROM r WHERE rn = greatest(1, ({p} * n + 99) // 100)
"""


# ---------------------------------------------------------------------------
# wave 36: triplet violations, peak concurrency, quantile bins, YoY
# movers, max type run
# ---------------------------------------------------------------------------


def triplet_violations(nvec: int = 256, dim: int = 64,
                       qscale: int = 1 << 20) -> str:
    """Triplet margin violations (twin of
    `queries.q_triplet_violations`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, label, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
  WHERE vec_id < {nvec}
),
labs AS (SELECT DISTINCT vec_id, label FROM q),
trip AS (
  SELECT a.vec_id AS a,
         (SELECT min(p.vec_id) FROM labs p
          WHERE p.vec_id > a.vec_id AND p.label = a.label) AS p,
         (SELECT min(n.vec_id) FROM labs n
          WHERE n.vec_id > a.vec_id AND n.label <> a.label) AS n
  FROM labs a
),
tv AS (SELECT * FROM trip WHERE p IS NOT NULL AND n IS NOT NULL),
dots AS (
  SELECT x.vec_id AS i, y.vec_id AS j, sum(x.q * y.q) AS dot
  FROM q x JOIN q y ON y.dim = x.dim
  GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_triplets,
       CAST(sum(CASE WHEN dp.dot <= dn.dot THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations
FROM tv
JOIN dots dp ON dp.i = tv.a AND dp.j = tv.p
JOIN dots dn ON dn.i = tv.a AND dn.j = tv.n
"""


def peak_concurrency(win_us: int) -> str:
    """Max simultaneously-open event windows (twin of
    `queries.q_peak_concurrency`)."""
    return f"""
WITH d AS (
  SELECT epoch_us(ts) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT epoch_us(ts) + {win_us}, -1 FROM events
),
r AS (
  SELECT SUM(delta) OVER (ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS run
  FROM d
)
SELECT CAST(max(run) AS BIGINT) AS max_concurrent FROM r
"""


def price_quartile_bins() -> str:
    """Threshold-quartile bins with per-bin counts/sums (twin of
    `queries.q_price_quartile_bins`)."""
    return """
WITH b AS (
  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
),
r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn,
             count(*) OVER () AS n
      FROM b),
t AS (
  SELECT
    (SELECT c FROM r WHERE rn = greatest(1, (25 * n + 99) // 100)
     LIMIT 1) AS t25,
    (SELECT c FROM r WHERE rn = greatest(1, (50 * n + 99) // 100)
     LIMIT 1) AS t50,
    (SELECT c FROM r WHERE rn = greatest(1, (75 * n + 99) // 100)
     LIMIT 1) AS t75
)
SELECT CAST(1 + (c > t25)::INT + (c > t50)::INT + (c > t75)::INT
            AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(c) AS BIGINT) AS sum_cents
FROM b, t GROUP BY 1
"""


def yoy_movers(ya: int = 1996, yb: int = 1999, k: int = 10) -> str:
    """Top-k absolute spend movers between two years (twin of
    `queries.q_yoy_movers`)."""
    return f"""
WITH sa AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  WHERE o_orderdate >= DATE '{ya}-01-01'
    AND o_orderdate < DATE '{ya + 1}-01-01'
  GROUP BY 1
),
sb AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  WHERE o_orderdate >= DATE '{yb}-01-01'
    AND o_orderdate < DATE '{yb + 1}-01-01'
  GROUP BY 1
)
SELECT sa.o_custkey, CAST(sb.cents - sa.cents AS BIGINT) AS delta_cents
FROM sa JOIN sb ON sb.o_custkey = sa.o_custkey
ORDER BY abs(sb.cents - sa.cents) DESC, sa.o_custkey
LIMIT {k}
"""


def max_type_run() -> str:
    """Longest same-type run per type across user streams (twin of
    `queries.q_max_type_run`)."""
    return """
WITH b AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn_all,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn_t
  FROM events
),
runs AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS len
  FROM b GROUP BY event_type, user_id, rn_all - rn_t
)
SELECT event_type, CAST(max(len) AS BIGINT) AS max_run
FROM runs GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 37: dataset split, wedge-sample estimator, path uniqueness,
# referential integrity, lag-2 autocorrelation
# ---------------------------------------------------------------------------


def data_split(train: int = 8, val: int = 1) -> str:
    """md5 % 10 train/val/test assignment (twin of
    `queries.q_data_split`)."""
    return f"""
WITH s AS (
  SELECT doc_id,
         CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 AS BIGINT)
           AS h
  FROM documents
)
SELECT CASE WHEN h < {train} THEN 'train'
            WHEN h < {train + val} THEN 'val' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM s GROUP BY 1
"""


@_materialized
def wedge_sample_est(mod: int = 7) -> str:
    """Deterministic wedge sample + closure counts (twin of
    `queries.q_wedge_sample_est`; dense-id LCG)."""
    return PREFIX + f"""
, dense AS (SELECT i, row_number() OVER (ORDER BY label) - 1 AS d
            FROM verts),
de AS (
  SELECT ds.d AS s, dd.d AS t
  FROM edges e JOIN dense ds ON ds.i = e.src
               JOIN dense dd ON dd.i = e.dst
  WHERE e.src <> e.dst
),
und AS (SELECT s AS m, t AS x FROM de UNION SELECT t, s FROM de),
w AS (
  SELECT w1.x AS a, w1.m AS m, w2.x AS c,
         ((((w1.x * (SELECT n FROM params) + w2.x) % 2147483648)
           * 48271 + w1.m) % {mod} = 0) AS sel
  FROM und w1 JOIN und w2 ON w2.m = w1.m AND w1.x < w2.x
),
ue AS (SELECT least(m, x) AS a, greatest(m, x) AS b FROM und)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM w) AS total_wedges,
       (SELECT CAST(count(*) AS BIGINT) FROM w WHERE sel) AS sampled,
       (SELECT CAST(count(*) AS BIGINT) FROM w
        WHERE sel AND EXISTS (SELECT 1 FROM ue
                              WHERE ue.a = w.a AND ue.b = w.c))
         AS closed
"""


@_materialized
def path_unique_audit() -> str:
    """Corpus (repo, path) primary-key audit (twin of
    `queries.q_path_unique_audit`)."""
    return PREFIX + """
, pairs AS (
  SELECT 'repo_' || (i % 100) AS repo, 'src/m_' || i || '.py' AS path
  FROM files
),
c AS (SELECT repo, path, CAST(count(*) AS BIGINT) AS n
      FROM pairs GROUP BY 1, 2)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(max(n) AS BIGINT) AS max_dup
FROM c
"""


def ref_integrity() -> str:
    """documents.doc_id vs embeddings.vec_id FK audit (twin of
    `queries.q_ref_integrity`)."""
    return """
WITH d AS (SELECT doc_id FROM documents),
v AS (SELECT vec_id FROM embeddings)
SELECT CAST(sum(CASE WHEN d.doc_id IS NOT NULL
                     AND v.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS matched,
       CAST(sum(CASE WHEN v.vec_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_only,
       CAST(sum(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS vecs_only
FROM d FULL OUTER JOIN v ON v.vec_id = d.doc_id
"""


def lag2_match() -> str:
    """Lag-2 same-type pair counts per type (twin of
    `queries.q_lag2_match`)."""
    return """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS nxt2
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN nxt2 = event_type THEN 1 ELSE 0 END)
            AS BIGINT) AS n_match
FROM o WHERE nxt2 IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 38: language confusion, DAG path counts, positional profile,
# price spread, order-size histogram
# ---------------------------------------------------------------------------


def lang_confusion() -> str:
    """(true lang, predicted lang) confusion counts over the marker
    heuristic (twin of `queries.q_lang_confusion`; same CASE chain as
    the green `langid` oracle)."""
    return """
WITH c AS (
  SELECT lang,
    len(list_filter(string_split(text,' '), t -> t = 'sort'))  AS c_de,
    len(list_filter(string_split(text,' '), t -> t = 'the'))   AS c_en,
    len(list_filter(string_split(text,' '), t -> t = 'data'))  AS c_es,
    len(list_filter(string_split(text,' '), t -> t = 'join'))  AS c_fr,
    len(list_filter(string_split(text,' '), t -> t = 'batch')) AS c_zh
  FROM documents
),
p AS (
  SELECT lang AS true_lang, CASE
    WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr
         AND c_de >= c_zh THEN 'de'
    WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
    WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
    WHEN c_fr >= c_zh THEN 'fr'
    ELSE 'zh' END AS pred_lang
  FROM c
)
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS cnt
FROM p GROUP BY 1, 2
"""


@_materialized
def dag_path_counts(iters: int = 12, mod: int = (1 << 61) - 1) -> str:
    """Synchronous DAG path-count DP mod 2^61-1 (twin of
    `queries.q_dag_path_counts`)."""
    sql = PREFIX + """
, dense AS (SELECT i, row_number() OVER (ORDER BY label) - 1 AS d,
            label FROM verts),
dag AS (
  SELECT DISTINCT ds.d AS s, dd.d AS t
  FROM edges e JOIN dense ds ON ds.i = e.src
               JOIN dense dd ON dd.i = e.dst
  WHERE ds.d < dd.d
),
c0 AS (SELECT d AS v, CAST(1 AS HUGEINT) AS c FROM dense)
"""
    prev = "c0"
    for k in range(1, iters + 1):
        sql += f"""
, c{k} AS (
  SELECT p.v,
         CAST((1 + coalesce(m.s, 0)) % {mod} AS HUGEINT) AS c
  FROM (SELECT d AS v FROM dense) p
  LEFT JOIN (SELECT g.t AS v, sum(pp.c % {mod}) AS s
             FROM dag g JOIN {prev} pp ON pp.v = g.s
             GROUP BY g.t) m ON m.v = p.v
)"""
        prev = f"c{k}"
    sql += f"""
SELECT de.label AS label, CAST(l.c AS BIGINT) AS paths
FROM {prev} l JOIN dense de ON de.d = l.v
"""
    return sql


def pos_profile(head: int = 10) -> str:
    """Head vs tail positional token stats (twin of
    `queries.q_pos_profile`)."""
    return f"""
WITH t AS (
  SELECT string_split(text, ' ') AS toks FROM documents
),
u AS (
  SELECT unnest(toks) AS tok,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM t
)
SELECT CASE WHEN pos < {head} THEN 'head' ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(length(tok)) AS BIGINT) AS sum_len
FROM u GROUP BY 1
"""


def price_spread(k: int = 15) -> str:
    """Top-k parts by price spread (twin of
    `queries.q_price_spread`)."""
    return f"""
SELECT l_partkey,
       CAST(max(CAST(floor(l_extendedprice * 100) AS BIGINT))
            - min(CAST(floor(l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS spread,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem GROUP BY 1
ORDER BY spread DESC, l_partkey
LIMIT {k}
"""


def order_lines_hist() -> str:
    """Lines-per-order histogram (twin of
    `queries.q_order_lines_hist`)."""
    return """
WITH c AS (SELECT l_orderkey, count(*) AS k FROM lineitem GROUP BY 1)
SELECT CAST(k AS BIGINT) AS n_lines, CAST(count(*) AS BIGINT)
  AS n_orders
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 39: source vocabulary Jaccard, unpivot, modal transition,
# iceberg cells, churn flags
# ---------------------------------------------------------------------------


def source_vocab_jaccard(k: int = 25) -> str:
    """Top-k source pairs by shared distinct tokens + vocab sizes (twin
    of `queries.q_source_vocab_jaccard`)."""
    return f"""
WITH ts AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok, source
  FROM documents
),
inter AS (
  SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT)
    AS inter
  FROM ts a JOIN ts b ON b.tok = a.tok AND a.source < b.source
  GROUP BY 1, 2
),
vocab AS (SELECT source, CAST(count(*) AS BIGINT) AS v
          FROM ts GROUP BY 1)
SELECT sa, sb, inter, va.v AS na, vb.v AS nb
FROM inter JOIN vocab va ON va.source = inter.sa
           JOIN vocab vb ON vb.source = inter.sb
ORDER BY inter DESC, sa, sb
LIMIT {k}
"""


def party_unpivot() -> str:
    """Wide party profile unpivoted to long form (twin of
    `queries.q_party_unpivot`)."""
    return """
WITH p AS (
  SELECT c_nationkey AS nk, 'c' AS role,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer
  UNION ALL
  SELECT s_nationkey, 's', CAST(floor(s_acctbal * 100) AS BIGINT)
  FROM supplier
),
wide AS (
  SELECT n_name,
         CAST(sum(CASE WHEN role = 'c' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_customers,
         CAST(sum(CASE WHEN role = 's' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_suppliers,
         CAST(sum(CASE WHEN role = 'c' THEN cents ELSE 0 END)
              AS BIGINT) AS cust_bal_cents,
         CAST(sum(CASE WHEN role = 's' THEN cents ELSE 0 END)
              AS BIGINT) AS supp_bal_cents
  FROM p JOIN nation ON n_nationkey = nk
  GROUP BY 1
)
SELECT n_name, 'n_customers' AS metric, n_customers AS value FROM wide
UNION ALL
SELECT n_name, 'n_suppliers', n_suppliers FROM wide
UNION ALL
SELECT n_name, 'cust_bal_cents', cust_bal_cents FROM wide
UNION ALL
SELECT n_name, 'supp_bal_cents', supp_bal_cents FROM wide
"""


def modal_transition() -> str:
    """Per from-type modal next type (twin of
    `queries.q_modal_transition`)."""
    return """
WITH o AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
c AS (SELECT event_type AS from_type, nxt AS to_type,
             CAST(count(*) AS BIGINT) AS cnt
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY from_type
                                   ORDER BY cnt DESC, to_type) AS rn
      FROM c)
SELECT from_type, to_type, cnt FROM r WHERE rn = 1
"""


def iceberg_cells(minc: int = 12) -> str:
    """(type, hour) cells above threshold (twin of
    `queries.q_iceberg_cells`)."""
    return f"""
SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1, 2
HAVING count(*) >= {minc}
"""


def churn_flags(days: int = 7) -> str:
    """Inactive-user counts vs the trailing cutoff (twin of
    `queries.q_churn_flags`)."""
    return f"""
WITH u AS (SELECT user_id, max(epoch_us(ts)) AS mx
           FROM events GROUP BY 1),
g AS (SELECT max(mx) AS gmax FROM u)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN mx < gmax - {days} * 86400000000::BIGINT
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CAST(min(gmax - {days} * 86400000000::BIGINT) AS BIGINT)
         AS cutoff_us
FROM u, g
"""


# ---------------------------------------------------------------------------
# wave 40: LCC share, rank-cut top spenders, neighborhood diversity,
# segment median, farthest pair
# ---------------------------------------------------------------------------


@_materialized
def lcc_share(iters: int = 12) -> str:
    """Largest-component summary over the fixed CC rounds (twin of
    `queries.q_lcc_share`)."""
    base = connected_components(iters)
    tail = base.rindex("SELECT v.label AS label")
    final = base[tail:].split("FROM ")[1].split(" ")[0].strip()
    return base[:tail] + f"""
, sizes AS (SELECT comp, CAST(count(*) AS BIGINT) AS sz
            FROM {final} GROUP BY comp)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM verts) AS n,
       (SELECT CAST(max(sz) AS BIGINT) FROM sizes) AS lcc_size,
       (SELECT CAST(count(*) AS BIGINT) FROM sizes) AS n_components
"""


def top_spenders_ties(cut: int = 5) -> str:
    """RANK <= cut with ties included (twin of
    `queries.q_top_spenders_ties`)."""
    return f"""
WITH s AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
r AS (SELECT *, rank() OVER (ORDER BY cents DESC) AS rk FROM s)
SELECT o_custkey, cents FROM r WHERE rk <= {cut}
"""


@_materialized
def nbr_lang_div() -> str:
    """Distinct out-neighbor languages per vertex, histogrammed (twin
    of `queries.q_nbr_lang_div`)."""
    return PREFIX + """
, pairs AS (
  SELECT DISTINCT e.src AS v, e.dst % 4 AS lg FROM edges e
),
div AS (SELECT v, CAST(count(*) AS BIGINT) AS k FROM pairs GROUP BY 1)
SELECT k AS n_langs, CAST(count(*) AS BIGINT) AS n_vertices
FROM div GROUP BY 1
"""


def segment_median() -> str:
    """Per-segment lower-median order cents (twin of
    `queries.q_segment_median`)."""
    return """
WITH b AS (
  SELECT c_mktsegment, CAST(floor(o_totalprice * 100) AS BIGINT) AS c
  FROM orders JOIN customer ON c_custkey = o_custkey
),
r AS (
  SELECT c_mktsegment, c,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY c)
           AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM b
)
SELECT c_mktsegment, CAST(c AS BIGINT) AS median_cents,
       CAST(n AS BIGINT) AS n_orders
FROM r WHERE rn = (n + 1) // 2
"""


def farthest_pair(nvec: int = 128, dim: int = 64,
                  qscale: int = 1 << 20) -> str:
    """Minimum-dot pair among the sample (twin of
    `queries.q_farthest_pair`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
  WHERE vec_id < {nvec}
),
dots AS (
  SELECT a.vec_id AS i, b.vec_id AS j, sum(a.q * b.q) AS dot
  FROM q a JOIN q b ON b.dim = a.dim AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT i, j, CAST(dot AS BIGINT) AS dot
FROM dots ORDER BY dot, i, j LIMIT 1
"""


# ---------------------------------------------------------------------------
# wave 41: winsorized stats, never-discounted, label centroids, max
# idle gap, token-length histogram
# ---------------------------------------------------------------------------


def winsorized_stats(lo: int = 5, hi: int = 95) -> str:
    """Clipped-sum winsorized statistics (twin of
    `queries.q_winsorized_stats`)."""
    return f"""
WITH b AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn,
             count(*) OVER () AS n
      FROM b),
t AS (
  SELECT
    (SELECT c FROM r WHERE rn = greatest(1, ({lo} * n + 99) // 100)
     LIMIT 1) AS lo,
    (SELECT c FROM r WHERE rn = greatest(1, ({hi} * n + 99) // 100)
     LIMIT 1) AS hi
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(least(greatest(c, t.lo), t.hi)) AS BIGINT)
         AS clipped_sum,
       CAST(min(t.lo) AS BIGINT) AS lo,
       CAST(min(t.hi) AS BIGINT) AS hi
FROM b, t
"""


def never_discounted() -> str:
    """Parts whose max discount is zero (twin of
    `queries.q_never_discounted`)."""
    return """
WITH m AS (
  SELECT l_partkey,
         max(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS mx
  FROM lineitem GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CASE WHEN mx = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS never_discounted
FROM m
"""


def label_centroids(dim: int = 64, qscale: int = 1 << 20) -> str:
    """Per-label floor-mean centroids on the quantization (twin of
    `queries.q_label_centroids`; q >= 0 so DuckDB's truncating //
    equals floor)."""
    return f"""
WITH q AS (
  SELECT label, CAST(g.d AS BIGINT) - 1 AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
)
SELECT CAST(label AS BIGINT) AS label, dim,
       CAST(sum(q) // count(*) AS BIGINT) AS centroid_q
FROM q GROUP BY 1, 2
"""


def max_idle_gap() -> str:
    """Largest global inter-event gap and its start (twin of
    `queries.q_max_idle_gap`)."""
    return """
WITH t AS (SELECT epoch_us(ts) AS t FROM events),
g AS (
  SELECT t, lead(t) OVER (ORDER BY t) - t AS gap FROM t
)
SELECT CAST(gap AS BIGINT) AS gap_us, CAST(t AS BIGINT) AS at_us
FROM g WHERE gap IS NOT NULL
ORDER BY gap DESC, t LIMIT 1
"""


def tok_len_hist() -> str:
    """Token-length histogram (twin of `queries.q_tok_len_hist`)."""
    return """
WITH t AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT CAST(length(tok) AS BIGINT) AS len,
       CAST(count(*) AS BIGINT) AS cnt
FROM t GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 42: part growth, bounce rate, audio energy histogram, P3
# census, blob collisions
# ---------------------------------------------------------------------------


def part_growth() -> str:
    """First-appearance month per part + cumulative counts (twin of
    `queries.q_part_growth`)."""
    return """
WITH f AS (
  SELECT l_partkey, min(date_trunc('month', o_orderdate)) AS m
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1
),
c AS (
  SELECT CAST(extract(year FROM m) AS BIGINT) AS o_year,
         CAST(extract(month FROM m) AS BIGINT) AS o_month,
         CAST(count(*) AS BIGINT) AS new_parts
  FROM f GROUP BY 1, 2
)
SELECT o_year, o_month, new_parts,
       CAST(SUM(new_parts) OVER (ORDER BY o_year, o_month
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT)
         AS cum_parts
FROM c
"""


def bounce_stats(gap_minutes: int = 30) -> str:
    """Session and bounce counts (twin of `queries.q_bounce_stats`)."""
    return f"""
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                 > {gap_minutes} * 60000000::BIGINT
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sid AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS s
  FROM o
),
sizes AS (SELECT user_id, s, count(*) AS k FROM sid GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounce
FROM sizes
"""


def audio_energy_hist(shift: int = 27, mod: int = 4001) -> str:
    """Energy-band histogram over the PCM synthesis (twin of
    `queries.q_audio_energy_hist`)."""
    return f"""
WITH dims AS (
  SELECT doc_id AS item_id,
         CAST(256 + (doc_id % 4) * 128 AS BIGINT) AS n
  FROM documents
),
s AS (
  SELECT d.item_id,
         sum(((r.i * (d.item_id + 11)) % {mod} - 2000)
             * ((r.i * (d.item_id + 11)) % {mod} - 2000)) AS sq
  FROM dims d CROSS JOIN range(640) r(i)
  WHERE r.i < d.n
  GROUP BY 1
)
SELECT CAST(sq >> {shift} AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS cnt
FROM s GROUP BY 1
"""


@_materialized
def p3_count() -> str:
    """3-edge path census closed form (twin of
    `queries.q_p3_count`)."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS d
        FROM und GROUP BY 1),
ue AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
),
ms AS (
  SELECT CAST(sum((da.d - 1) * (db.d - 1)) AS BIGINT) AS s
  FROM ue JOIN deg da ON da.v = ue.a JOIN deg db ON db.v = ue.b
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS t
  FROM ue x JOIN ue y ON y.a = x.b JOIN ue z ON z.a = x.a
                                           AND z.b = y.b
)
SELECT ms.s AS middle_sum, tri.t AS triangles,
       CAST(ms.s - 3 * tri.t AS BIGINT) AS p3_paths
FROM ms, tri
"""


def blob_collisions() -> str:
    """Image payload (w, h, px_sum) collision audit (twin of
    `queries.q_blob_collisions`; make_blob arithmetic)."""
    return """
WITH dims AS (
  SELECT doc_id AS item_id,
         CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS w,
         CAST(8 + (doc_id % 3) * 4 AS BIGINT) AS h
  FROM documents
),
s AS (
  SELECT d.item_id, d.w, d.h,
         sum((r.i * (d.item_id + 7)) % 251) AS px
  FROM dims d CROSS JOIN range(384) r(i)
  WHERE r.i < d.w * d.h
  GROUP BY 1, 2, 3
),
g AS (SELECT w, h, px, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY 1, 2, 3)
SELECT CAST(sum(c) AS BIGINT) AS n_items,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(max(c) AS BIGINT) AS max_group
FROM g
"""


# ---------------------------------------------------------------------------
# wave 43: KS statistic, rank-sum U, chi-square cells, quarterly top
# order, norm outliers
# ---------------------------------------------------------------------------


def ks_stat(a: str = "click", b: str = "purchase") -> str:
    """Division-free two-sample KS numerator (twin of
    `queries.q_ks_stat`)."""
    return f"""
WITH v AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE event_type IN ('{a}', '{b}')
),
h AS (
  SELECT c,
         sum(CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN event_type = '{b}' THEN 1 ELSE 0 END) AS cb
  FROM v GROUP BY 1
),
n AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM h),
w AS (
  SELECT SUM(ca) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cua,
         SUM(cb) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cub
  FROM h
)
SELECT CAST(max(abs(cua * n.nb - cub * n.na)) AS BIGINT) AS ks_num,
       CAST(min(n.na) AS BIGINT) AS n_a,
       CAST(min(n.nb) AS BIGINT) AS n_b
FROM w, n
"""


def rank_sum_u(a: str = "click", b: str = "purchase") -> str:
    """Doubled-midrank Mann-Whitney numerators (twin of
    `queries.q_rank_sum_u`)."""
    return f"""
WITH v AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE event_type IN ('{a}', '{b}')
),
h AS (
  SELECT c,
         sum(CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN event_type = '{b}' THEN 1 ELSE 0 END) AS cb
  FROM v GROUP BY 1
),
w AS (
  SELECT ca, cb,
         SUM(ca + cb) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED
                            PRECEDING AND 1 PRECEDING) AS pos
  FROM h
),
n AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM h)
SELECT CAST(sum(((coalesce(pos, 0) + 1)
                 + (coalesce(pos, 0) + ca + cb)) * ca) AS BIGINT)
         AS r2_sum_a,
       CAST(min(n.na) AS BIGINT) AS n_a,
       CAST(min(n.nb) AS BIGINT) AS n_b
FROM w, n
"""


@_materialized
def chi2_cells() -> str:
    """(lang, source) contingency with margins (twin of
    `queries.q_chi2_cells`)."""
    return """
WITH c AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
  FROM documents GROUP BY 1, 2
),
r AS (SELECT lang, sum(obs) AS rn FROM c GROUP BY 1),
col AS (SELECT source, sum(obs) AS cn FROM c GROUP BY 1),
g AS (SELECT sum(obs) AS n FROM c)
SELECT c.lang, c.source, c.obs,
       CAST(r.rn AS BIGINT) AS row_n, CAST(col.cn AS BIGINT) AS col_n,
       CAST(g.n AS BIGINT) AS grand_n
FROM c JOIN r ON r.lang = c.lang JOIN col ON col.source = c.source,
     g
"""


def quarter_top_order() -> str:
    """Per-quarter max vs total order cents (twin of
    `queries.q_quarter_top_order`)."""
    return """
SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST((extract(month FROM o_orderdate) - 1) // 3 + 1 AS BIGINT)
         AS quarter,
       CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS max_cents,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders GROUP BY 1, 2
"""


def norm_outliers(k: int = 5, dim: int = 64,
                  qscale: int = 1 << 20) -> str:
    """Top-k quantized squared norms (twin of
    `queries.q_norm_outliers`)."""
    return f"""
WITH q AS (
  SELECT vec_id,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
n2 AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS norm2
       FROM q GROUP BY 1)
SELECT vec_id, norm2 FROM n2
ORDER BY norm2 DESC, vec_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# wave 44: RFM segmentation, embedding ranges, part lift, Benford by
# type, slow gaps
# ---------------------------------------------------------------------------


def rfm_cells(r_days: tuple = (400, 900), f: tuple = (5, 12),
              m_cents: tuple = (10_000_000, 30_000_000)) -> str:
    """Fixed-band RFM cell counts (twin of `queries.q_rfm_cells`)."""
    return f"""
WITH per AS (
  SELECT o_custkey, max(epoch_us(o_orderdate)) AS last_us,
         count(*) AS freq,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
g AS (SELECT max(last_us) AS gmax FROM per),
b AS (
  SELECT ((g.gmax - last_us) // 86400000000 > {r_days[0]})::INT
         + ((g.gmax - last_us) // 86400000000 > {r_days[1]})::INT
           AS rb,
         (freq > {f[0]})::INT + (freq > {f[1]})::INT AS fb,
         (cents > {m_cents[0]})::INT + (cents > {m_cents[1]})::INT
           AS mb
  FROM per, g
)
SELECT CAST(rb AS BIGINT) AS r_band, CAST(fb AS BIGINT) AS f_band,
       CAST(mb AS BIGINT) AS m_band,
       CAST(count(*) AS BIGINT) AS n_customers
FROM b GROUP BY 1, 2, 3
"""


def emb_dim_range(dim: int = 64, qscale: int = 1 << 20) -> str:
    """Per-dimension quantized min/max (twin of
    `queries.q_emb_dim_range`)."""
    return f"""
WITH q AS (
  SELECT CAST(g.d AS BIGINT) - 1 AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
)
SELECT dim, CAST(min(q) AS BIGINT) AS min_q,
       CAST(max(q) AS BIGINT) AS max_q
FROM q GROUP BY 1
"""


def part_lift_topk(scale: int = 1_000_000_000, k: int = 5,
                   minsup: int = 2) -> str:
    """Integer basket lift for part pairs (twin of
    `queries.q_part_lift_topk`)."""
    return f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS no FROM d),
marg AS (SELECT l_partkey, count(*) AS s FROM d GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS cab
  FROM d a JOIN d b ON b.l_orderkey = a.l_orderkey
                   AND b.l_partkey > a.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {minsup}
)
SELECT p1, p2, CAST(cab AS BIGINT) AS support,
       CAST(cab * n.no * {scale} // (ma.s * mb.s) AS BIGINT)
         AS lift_scaled
FROM pairs
JOIN marg ma ON ma.l_partkey = pairs.p1
JOIN marg mb ON mb.l_partkey = pairs.p2, n
ORDER BY lift_scaled DESC, p1, p2
LIMIT {k}
"""


def benford_by_type() -> str:
    """Per-type first-digit histogram (twin of
    `queries.q_benford_by_type`)."""
    return """
WITH b AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, substr(CAST(cents AS VARCHAR), 1, 1) AS digit,
       CAST(count(*) AS BIGINT) AS cnt
FROM b WHERE cents > 0
GROUP BY 1, 2
"""


def slow_gaps(thr_us: int) -> str:
    """Per from-type gap counts above threshold (twin of
    `queries.q_slow_gaps`)."""
    return f"""
WITH o AS (
  SELECT event_type,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
           - epoch_us(ts) AS gap
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(CASE WHEN gap > {thr_us} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over
FROM o WHERE gap IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 45: repo density, source modal language, aspect histogram,
# token second moment, status-priority grid
# ---------------------------------------------------------------------------


@_materialized
def repo_density() -> str:
    """Per-repo file + internal-edge counts (twin of
    `queries.q_repo_density`)."""
    return PREFIX + """
, f AS (SELECT i % 100 AS repo, count(*) AS nf FROM files GROUP BY 1),
ie AS (
  SELECT src % 100 AS repo, CAST(count(*) AS BIGINT) AS e
  FROM edges WHERE src % 100 = dst % 100
  GROUP BY 1
)
SELECT 'repo_' || f.repo AS repo, CAST(f.nf AS BIGINT) AS n_files,
       CAST(coalesce(ie.e, 0) AS BIGINT) AS internal_edges
FROM f LEFT JOIN ie ON ie.repo = f.repo
"""


def source_modal_lang() -> str:
    """Per-source modal language with counts (twin of
    `queries.q_source_modal_lang`)."""
    return """
WITH c AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1, 2
),
t AS (SELECT source, sum(cnt) AS total FROM c GROUP BY 1),
r AS (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY cnt DESC, lang) AS rn
      FROM c)
SELECT r.source, r.lang AS modal_lang, r.cnt AS modal_cnt,
       CAST(t.total AS BIGINT) AS total
FROM r JOIN t ON t.source = r.source
WHERE rn = 1
"""


def aspect_hist() -> str:
    """Image (width, height) histogram (twin of
    `queries.q_aspect_hist`)."""
    return """
SELECT CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS width,
       CAST(8 + (doc_id % 3) * 4 AS BIGINT) AS height,
       CAST(count(*) AS BIGINT) AS cnt
FROM documents GROUP BY 1, 2
"""


def token_f2() -> str:
    """Token-frequency second moment (twin of
    `queries.q_token_f2`)."""
    return """
WITH t AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
f AS (SELECT tok, CAST(count(*) AS BIGINT) AS f FROM t GROUP BY 1)
SELECT CAST(sum(f) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(f * f) AS BIGINT) AS sum_f2
FROM f
"""


def status_priority_grid() -> str:
    """(status, priority) counts (twin of
    `queries.q_status_priority_grid`)."""
    return """
SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
FROM orders GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# wave 46: class outliers, vertex net flow, DAG layer histogram,
# linenumber audit, cross-repo cut
# ---------------------------------------------------------------------------


@_materialized
def class_outliers(dim: int = 64, qscale: int = 1 << 20) -> str:
    """Division-free in-class outlier counts vs floor-mean centroids
    (twin of `queries.q_class_outliers`)."""
    return f"""
WITH q AS (
  SELECT vec_id, label, CAST(g.d AS BIGINT) - 1 AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
cent AS (
  SELECT label, dim, sum(q) // count(*) AS c
  FROM q GROUP BY 1, 2
),
d2 AS (
  SELECT q.vec_id, q.label,
         sum((q.q - c.c) * (q.q - c.c)) AS d2
  FROM q JOIN cent c ON c.label = q.label AND c.dim = q.dim
  GROUP BY 1, 2
),
st AS (SELECT label, count(*) AS n, sum(d2) AS s FROM d2 GROUP BY 1)
SELECT CAST(st.label AS BIGINT) AS label, CAST(st.n AS BIGINT) AS n,
       CAST(sum(CASE WHEN d2.d2 * st.n > 2 * st.s THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM d2 JOIN st ON st.label = d2.label
GROUP BY 1, 2
"""


@_materialized
def vertex_netflow() -> str:
    """Flow-imbalance counts over dedup-summed weights (twin of
    `queries.q_vertex_netflow`; vertices with no edges are balanced)."""
    return PREFIX + """
, ow AS (SELECT src AS v, sum(CAST(w AS BIGINT)) AS w
         FROM edges GROUP BY 1),
iw AS (SELECT dst AS v, sum(CAST(w AS BIGINT)) AS w
       FROM edges GROUP BY 1),
net AS (
  SELECT v.i, coalesce(ow.w, 0) - coalesce(iw.w, 0) AS nf
  FROM verts v LEFT JOIN ow ON ow.v = v.i LEFT JOIN iw ON iw.v = v.i
)
SELECT CAST(sum(CASE WHEN nf > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sources,
       CAST(sum(CASE WHEN nf < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sinks,
       CAST(sum(CASE WHEN nf = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_balanced,
       CAST(max(nf) AS BIGINT) AS max_net,
       CAST(min(nf) AS BIGINT) AS min_net
FROM net
"""


@_materialized
def dag_layer_hist(iters: int = 12) -> str:
    """Layer-width histogram over the dag_layers chain (twin of
    `queries.q_dag_layer_hist`)."""
    base = dag_layers(iters)
    tail = base.rindex("SELECT de.label AS label")
    final = base[tail:].split("FROM ")[1].split(" ")[0].strip()
    return base[:tail] + f"""
SELECT CAST(layer AS BIGINT) AS layer,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM {final} GROUP BY 1
"""


def linenumber_audit() -> str:
    """Per-order linenumber contiguity assertion (twin of
    `queries.q_linenumber_audit`)."""
    return """
WITH a AS (
  SELECT l_orderkey, max(l_linenumber) AS mx, count(*) AS c
  FROM lineitem GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN mx <> c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations
FROM a
"""


@_materialized
def repo_cross_topk(k: int = 10) -> str:
    """Top-k repo pairs by directed cross-edge count + the total cut
    (twin of `queries.q_repo_cross_topk`)."""
    return PREFIX + f"""
, ce AS (
  SELECT src % 100 AS ra, dst % 100 AS rb,
         CAST(count(*) AS BIGINT) AS cnt
  FROM edges WHERE src % 100 <> dst % 100
  GROUP BY 1, 2
),
t AS (SELECT sum(cnt) AS total FROM ce)
SELECT 'repo_' || ra AS repo_a, 'repo_' || rb AS repo_b, cnt,
       CAST(t.total AS BIGINT) AS total_cut
FROM ce, t
ORDER BY cnt DESC, ra, rb
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# wave 47: monthly active customers, round bias, dimension sign
# correlation, user span, part-name vocabulary
# ---------------------------------------------------------------------------


def monthly_active_customers() -> str:
    """Distinct ordering customers per month (twin of
    `queries.q_monthly_active_customers`)."""
    return """
SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(extract(month FROM o_orderdate) AS BIGINT) AS o_month,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers
FROM orders GROUP BY 1, 2
"""


def round_bias() -> str:
    """Whole-dollar value share per type (twin of
    `queries.q_round_bias`)."""
    return """
WITH b AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN c % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_round
FROM b GROUP BY 1
"""


def dim_sign_corr(k: int = 10, mid: int = 1 << 19, dim: int = 64,
                  qscale: int = 1 << 20) -> str:
    """Top-k dimension pairs by sign agreement (twin of
    `queries.q_dim_sign_corr`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, CAST(g.d AS BIGINT) - 1 AS dim,
         CASE WHEN CAST(floor((CAST(embedding[CAST(g.d AS INT)]
                               AS DOUBLE) + 0.5) * {qscale}) AS BIGINT)
                   > {mid} THEN 1 ELSE -1 END AS s
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
g2 AS (
  SELECT a.dim AS i, b.dim AS j, sum(a.s * b.s) AS g,
         count(*) AS n
  FROM q a JOIN q b ON b.vec_id = a.vec_id AND b.dim > a.dim
  GROUP BY 1, 2
)
SELECT i AS dim_i, j AS dim_j,
       CAST((n + g) // 2 AS BIGINT) AS agree, CAST(n AS BIGINT) AS n
FROM g2
ORDER BY agree DESC, i, j
LIMIT {k}
"""


def user_span() -> str:
    """Per-user activity envelope (twin of `queries.q_user_span`)."""
    return """
SELECT user_id,
       CAST(max(epoch_us(ts) // 86400000000)
            - min(epoch_us(ts) // 86400000000) AS BIGINT) AS span_days,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def pname_vocab_topk(k: int = 10) -> str:
    """Top-k part-name words (twin of
    `queries.q_pname_vocab_topk`)."""
    return f"""
WITH t AS (
  SELECT unnest(string_split(p_name, ' ')) AS word FROM part
)
SELECT word, CAST(count(*) AS BIGINT) AS cnt
FROM t GROUP BY 1
ORDER BY cnt DESC, word LIMIT {k}
"""


# ---------------------------------------------------------------------------
# wave 48: session size histogram, degree tails, document extremes
# ---------------------------------------------------------------------------


def session_size_hist(gap_minutes: int = 30) -> str:
    """Session-size distribution (twin of
    `queries.q_session_size_hist`)."""
    return f"""
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                 > {gap_minutes} * 60000000::BIGINT
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sid AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS s
  FROM o
),
sizes AS (SELECT count(*) AS k FROM sid GROUP BY user_id, s)
SELECT CAST(k AS BIGINT) AS size, CAST(count(*) AS BIGINT)
  AS n_sessions
FROM sizes GROUP BY 1
"""


@_materialized
def degree_tails() -> str:
    """Isolated/pendant/max-degree census (twin of
    `queries.q_degree_tails`)."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (
  SELECT v.i, CAST(coalesce(d.c, 0) AS BIGINT) AS d
  FROM verts v LEFT JOIN (SELECT src AS i, count(*) AS c
                          FROM und GROUP BY 1) d ON d.i = v.i
),
m AS (SELECT max(d) AS mx FROM deg)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg WHERE d = 0)
         AS n_isolated,
       (SELECT CAST(count(*) AS BIGINT) FROM deg WHERE d = 1)
         AS n_pendant,
       (SELECT CAST(mx AS BIGINT) FROM m) AS max_deg,
       (SELECT CAST(count(*) AS BIGINT) FROM deg, m WHERE d = mx)
         AS n_at_max
"""


def doc_length_extremes() -> str:
    """Shortest/longest documents with tie-broken ids (twin of
    `queries.q_doc_length_extremes`)."""
    return """
WITH lo AS (SELECT n_chars AS c, doc_id AS i FROM documents
            ORDER BY n_chars, doc_id LIMIT 1),
hi AS (SELECT n_chars AS c, doc_id AS i FROM documents
       ORDER BY n_chars DESC, doc_id LIMIT 1)
SELECT CAST(lo.c AS BIGINT) AS min_chars,
       CAST(lo.i AS BIGINT) AS min_doc,
       CAST(hi.c AS BIGINT) AS max_chars,
       CAST(hi.i AS BIGINT) AS max_doc
FROM lo, hi
"""


@_materialized
def rand_parent(seed: int = 11) -> str:
    """RandReduce analog: per dst the in-neighbor minimizing the packed
    (split-key Knuth hash << 31 | arith src) key — every intermediate
    exact in BIGINT."""
    return PREFIX + f"""
, rr AS (
  SELECT e.dst, e.src,
         (((e.src % 1048576) * 2654435761 + e.src // 1048576 + {seed})
          % 4294967296) * 2147483648 + e.src AS k
  FROM edges e
)
SELECT v.label AS label, 'm_' || x.src AS parent
FROM (
  SELECT dst, src, row_number() OVER (PARTITION BY dst ORDER BY k) AS rn
  FROM rr
) x JOIN verts v ON v.i = x.dst
WHERE x.rn = 1
"""


def prep_corpus(min_toks: int = 5, dr_num: int = 1, dr_den: int = 2,
                train: int = 8, val: int = 1) -> str:
    """Dedup -> quality gate -> md5 split (twin of
    `queries.q_prep_corpus`)."""
    return f"""
WITH k AS (
  SELECT doc_id,
         array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                         ' ') AS key,
         len(string_split(text, ' ')) AS ntoks,
         len(list_distinct(string_split(text, ' '))) AS ndist
  FROM documents
),
canon AS (
  SELECT *, min(doc_id) OVER (PARTITION BY key) AS canon_id FROM k
),
reps AS (
  SELECT doc_id, ntoks FROM canon
  WHERE doc_id = canon_id AND ntoks >= {min_toks}
    AND ndist * {dr_den} >= ntoks * {dr_num}
),
h AS (
  SELECT doc_id, ntoks,
         CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 AS BIGINT)
           AS hh
  FROM reps
)
SELECT doc_id,
       CASE WHEN hh < {train} THEN 'train'
            WHEN hh < {train + val} THEN 'val' ELSE 'test' END AS split,
       CAST(ntoks AS BIGINT) AS n_tokens
FROM h
"""


# ---------------------------------------------------------------------------
# wave 50: edge support census, edit-1 vocabulary pairs, above-average
# orders, ship-lag quantiles, 1-NN margins
# ---------------------------------------------------------------------------


@_materialized
def edge_support_hist() -> str:
    """Per-edge triangle-support histogram of the undirected distinct
    graph (twin of `queries.q_edge_support_hist`): each triangle
    u<w<v credits its three edges; left join keeps support-0 edges
    (local bridges)."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
L AS (SELECT src, dst FROM und WHERE src < dst),
tris AS (
  SELECT a.src AS u, a.dst AS w, b.dst AS v
  FROM L a JOIN L b ON b.src = a.dst
  JOIN L m ON m.src = a.src AND m.dst = b.dst
),
credit AS (
  SELECT u AS lo, w AS hi FROM tris
  UNION ALL SELECT w, v FROM tris
  UNION ALL SELECT u, v FROM tris
),
supp AS (
  SELECT l.src, l.dst, count(c.lo) AS s
  FROM L l LEFT JOIN credit c ON c.lo = l.src AND c.hi = l.dst
  GROUP BY l.src, l.dst
)
SELECT CAST(s AS BIGINT) AS support, CAST(count(*) AS BIGINT) AS n_edges
FROM supp GROUP BY s
"""


def edit1_pairs() -> str:
    """Levenshtein-1 vocabulary pairs over documents tokens UNION part
    name words (twin of `queries.q_edit1_pairs` / SymSpell deletion
    neighborhood — the oracle brute-forces levenshtein)."""
    return """
WITH t AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
  UNION
  SELECT DISTINCT unnest(string_split(p_name, ' ')) FROM part
)
SELECT a.tok AS wa, b.tok AS wb
FROM t a JOIN t b ON a.tok < b.tok AND levenshtein(a.tok, b.tok) = 1
"""


def above_avg_orders() -> str:
    """Per-customer orders strictly above the customer's own average
    price, exact integer cross-multiplication (twin of
    `queries.q_above_avg_orders`)."""
    return """
WITH o AS (
  SELECT o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders
),
s AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         sum(c) AS sum_c
  FROM o GROUP BY 1
)
SELECT o.o_custkey, s.n_orders,
       CAST(sum(CASE WHEN o.c * s.n_orders > s.sum_c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above
FROM o JOIN s USING (o_custkey)
GROUP BY o.o_custkey, s.n_orders
"""


def ship_lag_stats() -> str:
    """Order-to-ship lag-day quantiles/extremes per priority (twin of
    `queries.q_ship_lag_stats`; timestamps midnight-aligned so the
    day diff is exact)."""
    return """
WITH j AS (
  SELECT o_orderpriority AS prio,
         CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)
           AS lag
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
)
SELECT prio, CAST(count(*) AS BIGINT) AS n,
       CAST(quantile_disc(lag, 0.5) AS BIGINT) AS lag_q50,
       CAST(quantile_disc(lag, 0.9) AS BIGINT) AS lag_q90,
       CAST(min(lag) AS BIGINT) AS lag_min,
       CAST(max(lag) AS BIGINT) AS lag_max
FROM j GROUP BY 1
"""


def knn_margin(nvec: int = 256, dim: int = 64,
               qscale: int = 1 << 20) -> str:
    """Per-label 1-NN margin stats over quantized dots (twin of
    `queries.q_knn_margin`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, label, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
  WHERE vec_id < {nvec}
),
labs AS (SELECT DISTINCT vec_id, label FROM q),
dots AS MATERIALIZED (
  SELECT a.vec_id AS i, b.vec_id AS j, sum(a.q * b.q) AS dot
  FROM q a JOIN q b ON b.dim = a.dim AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
best AS (
  SELECT d.i, any_value(la.label) AS label,
         max(CASE WHEN lb.label = la.label THEN d.dot END) AS bs,
         max(CASE WHEN lb.label <> la.label THEN d.dot END) AS bo
  FROM dots d JOIN labs la ON la.vec_id = d.i
              JOIN labs lb ON lb.vec_id = d.j
  GROUP BY d.i
)
SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN bs > bo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pos,
       CAST(sum(bs - bo) AS BIGINT) AS sum_margin
FROM best WHERE bs IS NOT NULL AND bo IS NOT NULL
GROUP BY label
"""


# ---------------------------------------------------------------------------
# wave 51: 1-NN confusion, repeat buyers, cross-modal lang norms,
# msbfs distance histogram, vocabulary growth
# ---------------------------------------------------------------------------


def knn_confusion(nvec: int = 256, dim: int = 64,
                  qscale: int = 1 << 20) -> str:
    """1-NN true-vs-predicted label confusion counts over quantized
    dots (twin of `queries.q_knn_confusion`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, label, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
  WHERE vec_id < {nvec}
),
labs AS (SELECT DISTINCT vec_id, label FROM q),
dots AS (
  SELECT a.vec_id AS i, b.vec_id AS j, sum(a.q * b.q) AS dot
  FROM q a JOIN q b ON b.dim = a.dim AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
nn AS (
  SELECT i, j FROM (
    SELECT i, j, row_number() OVER (PARTITION BY i
                                    ORDER BY dot DESC, j) AS rn
    FROM dots
  ) WHERE rn = 1
)
SELECT CAST(la.label AS BIGINT) AS true_label,
       CAST(lb.label AS BIGINT) AS pred_label,
       CAST(count(*) AS BIGINT) AS n
FROM nn JOIN labs la ON la.vec_id = nn.i
        JOIN labs lb ON lb.vec_id = nn.j
GROUP BY 1, 2
"""


def repeat_buyers() -> str:
    """Customers with >= 2 orders in some calendar month (twin of
    `queries.q_repeat_buyers`)."""
    return """
WITH m AS (
  SELECT o_custkey,
         CAST(extract(year FROM o_orderdate) AS BIGINT) * 12
           + CAST(extract(month FROM o_orderdate) AS BIGINT) AS ym,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey,
       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat_months,
       CAST(max(c) AS BIGINT) AS max_month_orders
FROM m GROUP BY 1
HAVING sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) >= 1
"""


def lang_norm_stats(dim: int = 64, qscale: int = 1 << 20) -> str:
    """Per document-language embedding count + quantized squared-norm
    totals, vec_id == doc_id join (twin of
    `queries.q_lang_norm_stats`)."""
    return f"""
WITH q AS (
  SELECT vec_id,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
per AS (SELECT vec_id, sum(q * q) AS n2 FROM q GROUP BY 1)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(per.n2) AS BIGINT) AS sum_norm2
FROM per JOIN documents d ON d.doc_id = per.vec_id
GROUP BY 1
"""


@_materialized
def msbfs_hist(mod: int = 97, iters: int = 12) -> str:
    """Histogram of nearest-seed hop distances (aggregate face of
    `msbfs`; twin of `queries.q_distance_hist`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE i % {mod} = 0)
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
SELECT CAST(dist AS BIGINT) AS dist,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM {prev} GROUP BY 1
"""
    return sql


def vocab_growth(buckets: int = 10) -> str:
    """First-appearance decile histogram of the BIGRAM vocabulary
    (Heaps curve; twin of `queries.q_vocab_growth`). md*B/n is exact
    in float64 on both sides (md*B < 2^53; IEEE division + floor)."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
flat AS MATERIALIZED (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS i
  FROM toks
),
bi AS (
  SELECT a.doc_id AS doc_id, a.tok || ' ' || b.tok AS tok
  FROM flat a JOIN flat b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
m AS (SELECT tok, min(doc_id) AS md FROM bi GROUP BY 1),
p AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
SELECT CAST(floor(md * {buckets} / n) AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS new_tokens
FROM m, p GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 52: weighted median, CC size histogram, audio lag-1 corr,
# int64 polynomial SpMV, KMV distinct sketch
# ---------------------------------------------------------------------------


def weighted_median_price() -> str:
    """Quantity-weighted lower median of part price cents per brand
    (twin of `queries.q_weighted_median_price`)."""
    return """
WITH pw AS (
  SELECT p_brand, CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
           AS cents,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
),
c AS (
  SELECT p_brand, cents, w,
         sum(w) OVER (PARTITION BY p_brand ORDER BY cents) AS cw,
         sum(w) OVER (PARTITION BY p_brand) AS tot
  FROM pw
)
SELECT p_brand, CAST(min(cents) AS BIGINT) AS wmedian_cents,
       CAST(min(tot) AS BIGINT) AS total_qty
FROM c WHERE 2 * cw >= tot GROUP BY 1
"""


@_materialized
def cc_size_hist(iters: int = 12) -> str:
    """Component-size histogram under the same fixed-round min-label
    chain as `connected_components` (twin of
    `queries.q_cc_size_hist`)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
l0 AS (SELECT i, label AS comp FROM verts)
"""
    prev = "l0"
    for k in range(1, iters + 1):
        sql += f"""
, l{k} AS (
  SELECT v.i, least(l.comp, coalesce(m.mn, l.comp)) AS comp
  FROM verts v JOIN {prev} l ON l.i = v.i
  LEFT JOIN (
    SELECT u.dst AS i, min(lp.comp) AS mn
    FROM und u JOIN {prev} lp ON lp.i = u.src GROUP BY u.dst
  ) m ON m.i = v.i
)"""
        prev = f"l{k}"
    sql += f"""
SELECT CAST(cnt AS BIGINT) AS size,
       CAST(count(*) AS BIGINT) AS n_components
FROM (SELECT comp, count(*) AS cnt FROM {prev} GROUP BY comp)
GROUP BY 1
"""
    return sql


def audio_lag_corr(mod: int = 4001) -> str:
    """Lag-1 PCM autocorrelation per audio payload (twin of
    `queries.q_audio_lag_corr`; regenerates make_audio_blob's integer
    synthesis)."""
    return f"""
WITH dims AS (
  SELECT doc_id AS item_id,
         CAST(256 + (doc_id % 4) * 128 AS BIGINT) AS n
  FROM documents
),
s AS (
  SELECT d.item_id, d.n, r.i,
         (r.i * (d.item_id + 11)) % {mod} - 2000 AS v,
         ((r.i + 1) * (d.item_id + 11)) % {mod} - 2000 AS nv
  FROM dims d CROSS JOIN range(640) r(i)
  WHERE r.i < d.n
)
SELECT item_id, CAST(min(n) AS BIGINT) AS n_samples,
       CAST(sum(CASE WHEN i <= n - 2 THEN v * nv ELSE 0 END)
            AS BIGINT) AS lag1
FROM s GROUP BY 1
"""


@_materialized
def poly_filter() -> str:
    """p(A)x = A^2 x + A x + x over exact BIGINT (twin of
    `queries.q_poly_filter`; x[i] = (i % 11) + 1)."""
    return PREFIX + """
, x AS (SELECT i, CAST((i % 11) + 1 AS BIGINT) AS v FROM files),
y AS (
  SELECT e.dst AS i, CAST(sum(CAST(e.w AS BIGINT) * x.v) AS BIGINT) AS v
  FROM edges e JOIN x ON x.i = e.src GROUP BY 1
),
z AS (
  SELECT e.dst AS i, CAST(sum(CAST(e.w AS BIGINT) * y.v) AS BIGINT) AS v
  FROM edges e JOIN y ON y.i = e.src GROUP BY 1
)
SELECT vl.label AS label,
       CAST(coalesce(z.v, 0) + coalesce(y.v, 0) + x.v AS BIGINT) AS p
FROM x JOIN verts vl ON vl.i = x.i
LEFT JOIN y ON y.i = x.i LEFT JOIN z ON z.i = x.i
"""


def kmv_distinct(k: int = 64, mask: int = (1 << 40) - 1) -> str:
    """KMV distinct sketch vs exact over per-language bigrams (twin of
    `queries.q_kmv_distinct`); estimate (k-1)*2^40 // h_k on the
    masked md5 low-64 hash, exact-count fallback below k."""
    scale = (k - 1) * (mask + 1)
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents
),
flat AS MATERIALIZED (
  SELECT doc_id, lang, unnest(l) AS tok, generate_subscripts(l, 1) AS i
  FROM toks
),
bi AS MATERIALIZED (
  SELECT DISTINCT a.lang AS lang, a.tok || ' ' || b.tok AS tok
  FROM flat a JOIN flat b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
hx AS (
  SELECT DISTINCT lang,
         CAST(md5_number_lower(tok) & {mask} AS BIGINT) AS h
  FROM bi
),
r AS (
  SELECT lang, h,
         row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY lang) AS hcnt
  FROM hx
),
ex AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_exact FROM bi
       GROUP BY 1)
SELECT ex.lang, ex.n_exact,
       CAST(CASE WHEN min(r.hcnt) < {k} THEN min(r.hcnt)
                 ELSE max(CASE WHEN r.rn = {k} THEN {scale} // r.h END)
            END AS BIGINT) AS kmv_est
FROM r JOIN ex ON ex.lang = r.lang
GROUP BY ex.lang, ex.n_exact
"""


# ---------------------------------------------------------------------------
# wave 53: prefix census, same-repo triangles, discount monotonicity,
# top-k year overlap, record-breaking events
# ---------------------------------------------------------------------------


def prefix_census(depth: int = 5) -> str:
    """Distinct token-prefix counts per depth (twin of
    `queries.q_prefix_census`)."""
    return f"""
WITH t AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
),
p AS (
  SELECT DISTINCT d.d AS depth,
         substring(tok, 1, CAST(d.d AS INT)) AS pre
  FROM t CROSS JOIN generate_series(1, {depth}) d(d)
  WHERE length(tok) >= d.d
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_prefixes
FROM p GROUP BY 1
"""


@_materialized
def tri_repo_mix() -> str:
    """Distinct-repo count per triangle (repo = i %% 100; twin of
    `queries.q_tri_repo_mix`)."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
L AS (SELECT src, dst FROM und WHERE src < dst),
tris AS (
  SELECT a.src % 100 AS ru, a.dst % 100 AS rw, b.dst % 100 AS rv
  FROM L a JOIN L b ON b.src = a.dst
  JOIN L m ON m.src = a.src AND m.dst = b.dst
),
cls AS (
  SELECT CASE WHEN ru = rw AND ru = rv THEN 1
              WHEN ru = rw OR ru = rv OR rw = rv THEN 2
              ELSE 3 END AS n_repos
  FROM tris
)
SELECT CAST(n_repos AS BIGINT) AS n_repos,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM cls GROUP BY 1
"""


def disc_monotone() -> str:
    """Discount monotonicity audit over linenumber order (twin of
    `queries.q_disc_monotone`)."""
    return """
WITH d AS (
  SELECT l_orderkey,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dc,
         lag(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
           OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber,
                          CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
           AS pdc
  FROM lineitem
),
per AS (
  SELECT l_orderkey,
         CAST(sum(CASE WHEN pdc IS NOT NULL AND dc > pdc
                       THEN 1 ELSE 0 END) AS BIGINT) AS viol
  FROM d GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN viol > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nonmonotone,
       CAST(sum(viol) AS BIGINT) AS n_violations
FROM per
"""


def topk_overlap(y1: int = 1995, y2: int = 1996, k: int = 50) -> str:
    """Leaderboard overlap: |top-k customers by revenue in y1 ∩ y2|
    (rank by cents DESC, custkey ASC; twin of
    `queries.q_topk_overlap`)."""
    return f"""
WITH s AS (
  SELECT o_custkey,
         CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders
  WHERE extract(year FROM o_orderdate) IN ({y1}, {y2})
  GROUP BY 1, 2
),
r AS (
  SELECT o_custkey, yr,
         row_number() OVER (PARTITION BY yr
                            ORDER BY cents DESC, o_custkey) AS rn
  FROM s
),
a AS (SELECT o_custkey FROM r WHERE yr = {y1} AND rn <= {k}),
b AS (SELECT o_custkey FROM r WHERE yr = {y2} AND rn <= {k})
SELECT CAST({k} AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_overlap
FROM a JOIN b USING (o_custkey)
"""


def record_counts() -> str:
    """Record-breaking events per type (running strict max of value
    cents over (ts, event_id) order; twin of
    `queries.q_record_counts`)."""
    return """
WITH v AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
         max(CAST(floor(value * 100 + 0.5) AS BIGINT))
           OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN prev_max IS NULL OR c > prev_max
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_records
FROM v GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 54: induced APSP, successor variety, year-end ledger, nation x
# priority grid, per-dim quartiles
# ---------------------------------------------------------------------------


@_materialized
def apsp_top(k: int = 32, iters: int = 12) -> str:
    """Hub-to-hub hop distances over the full graph within `iters`
    hops: rooted min-plus BFS chain with a root column, restricted to
    hub columns (twin of `queries.q_apsp_top`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, count(*) AS d FROM und GROUP BY 1),
S AS (
  SELECT i FROM (
    SELECT i, row_number() OVER (ORDER BY d DESC, i) AS rn FROM deg
  ) WHERE rn <= {k}
),
d0 AS (SELECT i AS r, i, 0 AS dist FROM S)
"""
    prev = "d0"
    for x in range(1, iters + 1):
        sql += f"""
, d{x} AS (
  SELECT r, i, min(dist) AS dist FROM (
    SELECT r, i, dist FROM {prev}
    UNION ALL
    SELECT dp.r, u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY 1, 2
)"""
        prev = f"d{x}"
    sql += f"""
SELECT va.label AS a_label, vb.label AS b_label,
       CAST(d.dist AS BIGINT) AS dist
FROM {prev} d JOIN S t ON t.i = d.i
JOIN verts va ON va.i = d.r JOIN verts vb ON vb.i = d.i
WHERE d.r <> d.i
"""
    return sql


def succ_variety(k: int = 20) -> str:
    """Top-k tokens by distinct-successor count (twin of
    `queries.q_succ_variety`)."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
flat AS MATERIALIZED (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS i
  FROM toks
),
bi AS (
  SELECT DISTINCT a.tok AS tok, b.tok AS suc
  FROM flat a JOIN flat b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
v AS (SELECT tok, CAST(count(*) AS BIGINT) AS variety FROM bi
      GROUP BY 1)
SELECT tok, variety FROM v ORDER BY variety DESC, tok LIMIT {k}
"""


def yearend_ledger(y0: int = 1992, y1: int = 1998) -> str:
    """Cumulative (orders, cents) per customer at each spine year end,
    carry-forward (twin of `queries.q_yearend_ledger`)."""
    return f"""
WITH cust AS (SELECT DISTINCT o_custkey FROM orders),
yrs AS (SELECT CAST(y.y AS BIGINT) AS yr
        FROM generate_series({y0}, {y1}) y(y)),
o AS (
  SELECT o_custkey,
         CAST(extract(year FROM o_orderdate) AS BIGINT) AS oy,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT c.o_custkey, yrs.yr,
       CAST(count(o.oy) AS BIGINT) AS cum_orders,
       CAST(coalesce(sum(o.cents), 0) AS BIGINT) AS cum_cents
FROM cust c CROSS JOIN yrs
LEFT JOIN o ON o.o_custkey = c.o_custkey AND o.oy <= yrs.yr
GROUP BY 1, 2
"""


def nation_priority_grid() -> str:
    """Order counts per (customer nation, priority) — 3-table star
    join (twin of `queries.q_nation_priority_grid`)."""
    return """
SELECT n_name, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
GROUP BY 1, 2
"""


def emb_dim_quartiles(dim: int = 64, qscale: int = 1 << 20) -> str:
    """Per-dimension exact discrete quartiles of quantized embedding
    values (twin of `queries.q_emb_dim_quartiles`)."""
    return f"""
WITH q AS (
  SELECT CAST(g.d - 1 AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
)
SELECT dim,
       CAST(quantile_disc(q, 0.25) AS BIGINT) AS q25,
       CAST(quantile_disc(q, 0.5) AS BIGINT) AS q50,
       CAST(quantile_disc(q, 0.75) AS BIGINT) AS q75
FROM q GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 55: hub asymmetry, dup-graph triangles, loyal customers,
# peak-position census, lineitem covariance
# ---------------------------------------------------------------------------


@_materialized
def hub_asymmetry(k: int = 32, iters: int = 12) -> str:
    """Directed-distance asymmetry classification over hub pairs (twin
    of `queries.q_hub_asymmetry`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, count(*) AS d FROM und GROUP BY 1),
S AS (
  SELECT i FROM (
    SELECT i, row_number() OVER (ORDER BY d DESC, i) AS rn FROM deg
  ) WHERE rn <= {k}
),
d0 AS (SELECT i AS r, i, 0 AS dist FROM S)
"""
    prev = "d0"
    for x in range(1, iters + 1):
        sql += f"""
, d{x} AS (
  SELECT r, i, min(dist) AS dist FROM (
    SELECT r, i, dist FROM {prev}
    UNION ALL
    SELECT dp.r, e.dst AS i, dp.dist + 1 AS dist
    FROM edges e JOIN {prev} dp ON dp.i = e.src
  ) GROUP BY 1, 2
)"""
        prev = f"d{x}"
    sql += f"""
, dm AS (
  SELECT d.r, d.i, d.dist FROM {prev} d JOIN S t ON t.i = d.i
),
pairs AS (
  SELECT s1.i AS a, s2.i AS b FROM S s1 JOIN S s2 ON s1.i < s2.i
),
j AS (
  SELECT p.a, p.b, x.dist AS dab, y.dist AS dba
  FROM pairs p
  LEFT JOIN dm x ON x.r = p.a AND x.i = p.b
  LEFT JOIN dm y ON y.r = p.b AND y.i = p.a
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN dab IS NOT NULL AND dba IS NOT NULL
                          AND dab = dba THEN 1 ELSE 0 END) AS BIGINT)
         AS n_symmetric,
       CAST(sum(CASE WHEN dab IS NOT NULL AND dba IS NOT NULL
                          AND dab <> dba THEN 1 ELSE 0 END) AS BIGINT)
         AS n_asymmetric,
       CAST(sum(CASE WHEN (dab IS NULL) <> (dba IS NULL)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_oneway,
       CAST(sum(CASE WHEN dab IS NULL AND dba IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_unreachable
FROM j
"""
    return sql


def dupgraph_triangles(tau: float = 0.5) -> str:
    """Triangles in the exact-jaccard near-dup pair graph (twin of
    `queries.q_dupgraph_triangles`)."""
    return f"""
WITH L AS (
  SELECT a AS src, b AS dst FROM ({jaccard_pairs(tau)}) t
)
SELECT CAST(count(*) AS BIGINT) AS dup_triangles
FROM L x JOIN L y ON y.src = x.dst
JOIN L m ON m.src = x.src AND m.dst = y.dst
"""


def loyal_customers(years: tuple = (1995, 1996, 1997)) -> str:
    """Customers with >= 1 order in EVERY listed year (twin of
    `queries.q_loyal_customers`)."""
    ylist = ", ".join(str(y) for y in years)
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_loyal FROM (
  SELECT o_custkey FROM orders
  WHERE extract(year FROM o_orderdate) IN ({ylist})
  GROUP BY 1
  HAVING count(DISTINCT extract(year FROM o_orderdate))
         = {len(years)}
)
"""


def peak_position(buckets: int = 4) -> str:
    """Quartile of the first-maximum position per user (twin of
    `queries.q_peak_position`)."""
    return f"""
WITH r AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS idx,
         count(*) OVER (PARTITION BY user_id) AS n,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
mx AS (
  SELECT user_id, idx, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY c DESC, idx) AS rk
  FROM r
)
SELECT CAST(idx * {buckets} // n AS BIGINT) AS quartile,
       CAST(count(*) AS BIGINT) AS n_users
FROM mx WHERE rk = 1 GROUP BY 1
"""


def lineitem_cov() -> str:
    """Pairwise covariance sufficient statistics over (quantity, price
    cents, discount cents), exact BIGINT (twin of
    `queries.q_lineitem_cov`)."""
    return """
WITH v AS (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d
  FROM lineitem
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(sum(p) AS BIGINT) AS sum_p,
       CAST(sum(d) AS BIGINT) AS sum_d,
       CAST(sum(q * q) AS BIGINT) AS sum_qq,
       CAST(sum(q * p) AS BIGINT) AS sum_qp,
       CAST(sum(q * d) AS BIGINT) AS sum_qd,
       CAST(sum(p * p) AS BIGINT) AS sum_pp,
       CAST(sum(p * d) AS BIGINT) AS sum_pd,
       CAST(sum(d * d) AS BIGINT) AS sum_dd
FROM v
"""


# ---------------------------------------------------------------------------
# wave 56: monthly autocorrelation, audience overlap, home-supplied
# customers, hourly uniques, multi-supplier orders
# ---------------------------------------------------------------------------


def orders_autocorr() -> str:
    """Lag-1 autocorrelation sufficient stats of the monthly order
    count series (twin of `queries.q_orders_autocorr`)."""
    return """
WITH m AS (
  SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) * 12
           + CAST(extract(month FROM o_orderdate) AS BIGINT) AS ym,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
s AS (
  SELECT c, lead(c) OVER (ORDER BY ym) AS nc FROM m
)
SELECT CAST(count(*) AS BIGINT) AS n_months,
       CAST(sum(c) AS BIGINT) AS sum_c,
       CAST(sum(c * c) AS BIGINT) AS sum_cc,
       CAST(coalesce(sum(c * nc), 0) AS BIGINT) AS sum_lag
FROM s
"""


def type_audience_jaccard() -> str:
    """Audience overlap counts per event-type pair (twin of
    `queries.q_type_audience_jaccard`)."""
    return """
WITH a AS (SELECT DISTINCT event_type, user_id FROM events),
t AS (SELECT DISTINCT event_type FROM events),
p AS (
  SELECT x.event_type AS ta, y.event_type AS tb
  FROM t x JOIN t y ON x.event_type < y.event_type
)
SELECT p.ta, p.tb,
       CAST((SELECT count(*) FROM a WHERE a.event_type = p.ta)
            AS BIGINT) AS n_a,
       CAST((SELECT count(*) FROM a WHERE a.event_type = p.tb)
            AS BIGINT) AS n_b,
       CAST((SELECT count(*) FROM a x JOIN a y
             ON y.user_id = x.user_id
             WHERE x.event_type = p.ta AND y.event_type = p.tb)
            AS BIGINT) AS n_both
FROM p
"""


def home_supplied_customers() -> str:
    """Customers with a lineitem supplied from their own nation (twin
    of `queries.q_home_supplied_customers`)."""
    return """
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_home
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE s_nationkey = c_nationkey
"""


def hourly_uniques() -> str:
    """Distinct users per (event type, epoch hour) (twin of
    `queries.q_hourly_uniques`)."""
    return """
SELECT event_type,
       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
"""


def multi_supplier_orders(min_supp: int = 3, min_part: int = 2) -> str:
    """Orders with >= min_supp suppliers AND >= min_part parts, plus
    the facet maxima (twin of `queries.q_multi_supplier_orders`)."""
    return f"""
WITH per AS (
  SELECT l_orderkey,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS ns,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS np
  FROM lineitem GROUP BY 1
)
SELECT CAST(sum(CASE WHEN ns >= {min_supp} AND np >= {min_part}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_orders,
       CAST(max(ns) AS BIGINT) AS max_supps,
       CAST(max(np) AS BIGINT) AS max_parts
FROM per
"""


# ---------------------------------------------------------------------------
# wave 57: diversified top-k, nation p90 outliers, order-index curve,
# Fano burstiness, adjacent embedding dots
# ---------------------------------------------------------------------------


def diverse_top_orders(k: int = 10, per_cust: int = 2) -> str:
    """Quota-constrained top-k orders (twin of
    `queries.q_diverse_top_orders`)."""
    return f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY cents DESC, o_orderkey) AS rn
  FROM o
)
SELECT o_orderkey, o_custkey, cents FROM r WHERE rn <= {per_cust}
ORDER BY cents DESC, o_orderkey LIMIT {k}
"""


def nation_p90_orders() -> str:
    """Per-nation order count, exact discrete p90 and strict-tail count
    (twin of `queries.q_nation_p90_orders`)."""
    return """
WITH j AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders JOIN customer ON c_custkey = o_custkey
),
p AS (
  SELECT nk, CAST(quantile_disc(cents, 0.9) AS BIGINT) AS p90
  FROM j GROUP BY 1
)
SELECT j.nk AS nk, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(p.p90) AS BIGINT) AS p90_cents,
       CAST(sum(CASE WHEN j.cents > p.p90 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above
FROM j JOIN p ON p.nk = j.nk GROUP BY 1
"""


def order_index_cents(buckets: int = 3) -> str:
    """Lifetime order-index buckets (1st, 2nd, 3rd+) with count and
    cents sums (twin of `queries.q_order_index_cents`)."""
    return f"""
WITH r AS (
  SELECT o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
)
SELECT CAST(least(rn, {buckets}) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM r GROUP BY 1
"""


def fano_factor() -> str:
    """Per-type burstiness sufficient stats over observed per-hour
    counts (twin of `queries.q_fano_factor`)."""
    return """
WITH h AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(c) AS BIGINT) AS sum_c,
       CAST(sum(c * c) AS BIGINT) AS sum_cc
FROM h GROUP BY 1
"""


def emb_pair_dots(dim: int = 64, qscale: int = 1 << 20) -> str:
    """Quantized dots between consecutive vec_ids (twin of
    `queries.q_emb_pair_dots`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
)
SELECT a.vec_id, CAST(sum(a.q * b.q) AS BIGINT) AS dot
FROM q a JOIN q b ON b.vec_id = a.vec_id + 1 AND b.dim = a.dim
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 58: 1-NN hubness, hub bisector, Lorenz deciles, co-purchase
# degree histogram, comeback customers
# ---------------------------------------------------------------------------


def nn_hubness(nvec: int = 256, dim: int = 64,
               qscale: int = 1 << 20) -> str:
    """1-NN in-degree histogram over quantized dots (twin of
    `queries.q_nn_hubness`)."""
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
  WHERE vec_id < {nvec}
),
ids AS (SELECT DISTINCT vec_id FROM q),
dots AS (
  SELECT a.vec_id AS i, b.vec_id AS j, sum(a.q * b.q) AS dot
  FROM q a JOIN q b ON b.dim = a.dim AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
nn AS (
  SELECT i, j FROM (
    SELECT i, j, row_number() OVER (PARTITION BY i
                                    ORDER BY dot DESC, j) AS rn
    FROM dots
  ) WHERE rn = 1
),
deg AS (
  SELECT ids.vec_id, CAST(count(nn.i) AS BIGINT) AS indeg
  FROM ids LEFT JOIN nn ON nn.j = ids.vec_id
  GROUP BY 1
)
SELECT indeg, CAST(count(*) AS BIGINT) AS n_vectors
FROM deg GROUP BY 1
"""


@_materialized
def hub_bisector(iters: int = 12) -> str:
    """Two-hub Voronoi bisector census (twin of
    `queries.q_hub_bisector`)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, count(*) AS d FROM und GROUP BY 1),
S AS (
  SELECT i, rn FROM (
    SELECT i, row_number() OVER (ORDER BY d DESC, i) AS rn FROM deg
  ) WHERE rn <= 2
),
d0 AS (SELECT rn AS r, i, 0 AS dist FROM S)
"""
    prev = "d0"
    for x in range(1, iters + 1):
        sql += f"""
, d{x} AS (
  SELECT r, i, min(dist) AS dist FROM (
    SELECT r, i, dist FROM {prev}
    UNION ALL
    SELECT dp.r, u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY 1, 2
)"""
        prev = f"d{x}"
    sql += f"""
, wide AS (
  SELECT v.i,
         min(CASE WHEN d.r = 1 THEN d.dist END) AS da,
         min(CASE WHEN d.r = 2 THEN d.dist END) AS db
  FROM verts v LEFT JOIN {prev} d ON d.i = v.i
  GROUP BY 1
)
SELECT CAST(sum(CASE WHEN da IS NOT NULL AND db IS NOT NULL
                          AND da < db THEN 1 ELSE 0 END) AS BIGINT)
         AS n_closer_a,
       CAST(sum(CASE WHEN da IS NOT NULL AND db IS NOT NULL
                          AND db < da THEN 1 ELSE 0 END) AS BIGINT)
         AS n_closer_b,
       CAST(sum(CASE WHEN da IS NOT NULL AND db IS NOT NULL
                          AND da = db THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tie,
       CAST(sum(CASE WHEN da IS NOT NULL AND db IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
       CAST(sum(CASE WHEN db IS NOT NULL AND da IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b,
       CAST(sum(CASE WHEN da IS NULL AND db IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
FROM wide
"""
    return sql


def lorenz_deciles(buckets: int = 10) -> str:
    """Customer-spend Lorenz deciles (twin of
    `queries.q_lorenz_deciles`)."""
    return f"""
WITH s AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) - 1 AS rk,
         count(*) OVER () AS n
  FROM s
)
SELECT CAST(rk * {buckets} // n AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM r GROUP BY 1
"""


def copurchase_degree_hist() -> str:
    """Distinct co-purchase partner count histogram (twin of
    `queries.q_copurchase_degree_hist`)."""
    return """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pp AS (
  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
  FROM op a JOIN op b
    ON b.l_orderkey = a.l_orderkey AND b.l_partkey <> a.l_partkey
),
deg AS (SELECT x, CAST(count(*) AS BIGINT) AS partners FROM pp
        GROUP BY 1)
SELECT partners, CAST(count(*) AS BIGINT) AS n_parts
FROM deg GROUP BY 1
"""


def comeback_customers(days: int = 365) -> str:
    """Customers with a >= `days` gap between consecutive orders, and
    the total gap count (twin of `queries.q_comeback_customers`)."""
    return f"""
WITH r AS (
  SELECT o_custkey, o_orderdate,
         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey)
           AS prev_d
  FROM orders
),
g AS (
  SELECT o_custkey,
         CAST(sum(CASE WHEN prev_d IS NOT NULL AND
                            date_diff('day', prev_d, o_orderdate)
                            >= {days} THEN 1 ELSE 0 END) AS BIGINT)
           AS gaps
  FROM r GROUP BY 1
)
SELECT CAST(sum(CASE WHEN gaps > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_comeback,
       CAST(sum(gaps) AS BIGINT) AS n_gaps
FROM g
"""


# ---------------------------------------------------------------------------
# wave 59: C(k) curve, decile-priority grid, dup-cluster purity,
# core-periphery mixing, last-order status
# ---------------------------------------------------------------------------


@_materialized
def cc_by_degree() -> str:
    """Per log2-degree bucket: vertex count, triangle and wedge sums
    (twin of `queries.q_cc_by_degree`)."""
    return PREFIX + """
, und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges GROUP BY 1, 2
),
uadj AS (SELECT a AS v, b AS u FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM uadj GROUP BY v),
tri AS (
  SELECT x.v AS v, CAST(count(*) AS BIGINT) AS t
  FROM uadj x JOIN uadj y ON x.v = y.v AND x.u < y.u
  JOIN und t2 ON t2.a = x.u AND t2.b = y.u
  GROUP BY x.v
),
per AS (
  SELECT d.v, d.d, coalesce(tr.t, 0) AS t
  FROM deg d LEFT JOIN tri tr ON tr.v = d.v
  WHERE d.d >= 2
)
SELECT CAST(floor(log2(d)) AS BIGINT) AS log2_deg,
       CAST(count(*) AS BIGINT) AS n_vertices,
       CAST(sum(t) AS BIGINT) AS sum_tri,
       CAST(sum(d * (d - 1) // 2) AS BIGINT) AS sum_wedges
FROM per GROUP BY 1
"""


def decile_priority_grid(buckets: int = 10) -> str:
    """Order counts per (customer spend-decile, priority) (twin of
    `queries.q_decile_priority_grid`)."""
    return f"""
WITH s AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
r AS (
  SELECT o_custkey,
         (row_number() OVER (ORDER BY cents, o_custkey) - 1)
           * {buckets} // (count(*) OVER ()) AS dec
  FROM s
)
SELECT CAST(r.dec AS BIGINT) AS decile, o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o JOIN r ON r.o_custkey = o.o_custkey
GROUP BY 1, 2
"""


def dup_cluster_purity(tau: float = 0.5, rounds: int = 6,
                       df_cap: int = 1000) -> str:
    """Language purity of near-dup clusters (twin of
    `queries.q_dup_cluster_purity`)."""
    base = dup_clusters(tau, rounds, df_cap)
    tail = base.rindex("SELECT v AS doc_id")
    final_cte = base[tail:].split("FROM ")[1].strip()
    return base[:tail] + """, per AS (
  SELECT f.lbl AS lbl,
         CAST(count(DISTINCT d.lang) AS BIGINT) AS nl
  FROM lfinal f JOIN documents d ON d.doc_id = f.v
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(CASE WHEN nl = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pure,
       CAST(sum(CASE WHEN nl > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mixed
FROM per
""".replace("lfinal", final_cte)


def core_periphery_mix(k: int = 32) -> str:
    """Distinct undirected edges by hub membership of endpoints (twin
    of `queries.q_core_periphery_mix`)."""
    return PREFIX + f"""
, undd AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, count(*) AS d FROM undd GROUP BY 1),
S AS (
  SELECT i FROM (
    SELECT i, row_number() OVER (ORDER BY d DESC, i) AS rn FROM deg
  ) WHERE rn <= {k}
),
L AS (SELECT src, dst FROM undd WHERE src < dst),
cls AS (
  SELECT (CASE WHEN sa.i IS NOT NULL THEN 1 ELSE 0 END)
         + (CASE WHEN sb.i IS NOT NULL THEN 1 ELSE 0 END) AS ic
  FROM L LEFT JOIN S sa ON sa.i = L.src LEFT JOIN S sb ON sb.i = L.dst
)
SELECT CAST(sum(CASE WHEN ic = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cc,
       CAST(sum(CASE WHEN ic = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cp,
       CAST(sum(CASE WHEN ic = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pp
FROM cls
"""


def last_order_status() -> str:
    """Status of each customer's final order, counted per status (twin
    of `queries.q_last_order_status`)."""
    return """
WITH r AS (
  SELECT o_custkey, o_orderstatus,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC,
                                     o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_customers
FROM r WHERE rn = 1 GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 60: BFS children histogram, length-frequency grid, user type
# diversity, strong-tie triangles, nation top brand
# ---------------------------------------------------------------------------


@_materialized
def bfs_children_hist(root_label: str = "m_0", iters: int = 12) -> str:
    """Children-per-parent histogram of the deterministic BFS parent
    tree (twin of `queries.q_bfs_children_hist`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
, pt AS (
  SELECT d.i, (
    SELECT min(vp.label)
    FROM und u JOIN {prev} dp ON dp.i = u.src
    JOIN verts vp ON vp.i = u.src
    WHERE u.dst = d.i AND dp.dist = d.dist - 1
  ) AS parent_label
  FROM {prev} d WHERE d.dist >= 1
),
cc AS (SELECT parent_label, count(*) AS c FROM pt GROUP BY 1)
SELECT CAST(c AS BIGINT) AS n_children,
       CAST(count(*) AS BIGINT) AS n_parents
FROM cc GROUP BY 1
"""
    return sql


def len_freq_grid() -> str:
    """(token length x log2 global frequency) vocabulary census (twin
    of `queries.q_len_freq_grid`)."""
    return """
WITH t AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
f AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM t GROUP BY 1)
SELECT CAST(length(tok) AS BIGINT) AS tok_len,
       CAST(floor(log2(freq)) AS BIGINT) AS log2_freq,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM f GROUP BY 1, 2
"""


def user_type_div_hist() -> str:
    """Distinct-event-type-per-user histogram (twin of
    `queries.q_user_type_div_hist`)."""
    return """
WITH d AS (
  SELECT user_id, count(DISTINCT event_type) AS nt FROM events
  GROUP BY 1
)
SELECT CAST(nt AS BIGINT) AS n_types,
       CAST(count(*) AS BIGINT) AS n_users
FROM d GROUP BY 1
"""


@_materialized
def strong_triangles() -> str:
    """Triangles on the full vs the w>=2 symmetric-multiplicity pruned
    graph (twin of `queries.q_strong_triangles`)."""
    return PREFIX + """
, uw AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         sum(w) AS w2
  FROM edges GROUP BY 1, 2
),
t1 AS (
  SELECT count(*) AS c
  FROM uw x JOIN uw y ON y.a = x.b
  JOIN uw m ON m.a = x.a AND m.b = y.b
),
s2 AS (SELECT a, b FROM uw WHERE w2 >= 2),
t2 AS (
  SELECT count(*) AS c
  FROM s2 x JOIN s2 y ON y.a = x.b
  JOIN s2 m ON m.a = x.a AND m.b = y.b
)
SELECT CAST(1 AS BIGINT) AS w_min, CAST(t1.c AS BIGINT) AS triangles
FROM t1
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(t2.c AS BIGINT) FROM t2
"""


def nation_top_brand() -> str:
    """Top revenue brand per customer nation, ties brand asc (twin of
    `queries.q_nation_top_brand`)."""
    return """
WITH rev AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk, p_brand AS brand,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN part     ON p_partkey = l_partkey
  GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY nk
                               ORDER BY cents DESC, brand) AS rn
  FROM rev
)
SELECT nk, brand AS top_brand, cents FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# wave 61: daily new users, centroid distances, priority escalation,
# supplier brand span, discount-band share
# ---------------------------------------------------------------------------


def daily_new_users() -> str:
    """Per-day active vs first-ever users (twin of
    `queries.q_daily_new_users`)."""
    return """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
),
act AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM e GROUP BY 1
),
fst AS (SELECT user_id, min(day) AS day FROM e GROUP BY 1),
new_ AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM fst
         GROUP BY 1)
SELECT act.day, act.n_active,
       CAST(coalesce(new_.n_new, 0) AS BIGINT) AS n_new
FROM act LEFT JOIN new_ ON new_.day = act.day
"""


def centroid_dists(dim: int = 64, qscale: int = 1 << 20) -> str:
    """Pairwise squared distances between per-label integer centroids
    (twin of `queries.q_centroid_dists`)."""
    return f"""
WITH q AS (
  SELECT label, CAST(g.d - 1 AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
c AS (
  SELECT CAST(label AS BIGINT) AS label, dim,
         CAST(floor(sum(q) / count(*)) AS BIGINT) AS cq
  FROM q GROUP BY 1, 2
)
SELECT a.label AS la, b.label AS lb,
       CAST(sum((a.cq - b.cq) * (a.cq - b.cq)) AS BIGINT) AS dist2
FROM c a JOIN c b ON b.dim = a.dim AND a.label < b.label
GROUP BY 1, 2
"""


def priority_escalation() -> str:
    """Consecutive-order priority transitions per customer, classified
    by leading digit (twin of `queries.q_priority_escalation`)."""
    return """
WITH r AS (
  SELECT o_custkey,
         CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS dig,
         lag(CAST(substring(o_orderpriority, 1, 1) AS BIGINT))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS pdig
  FROM orders
)
SELECT CAST(sum(CASE WHEN pdig IS NOT NULL AND dig < pdig
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       CAST(sum(CASE WHEN pdig IS NOT NULL AND dig > pdig
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
       CAST(sum(CASE WHEN pdig IS NOT NULL AND dig = pdig
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_same
FROM r
"""


def supplier_brand_span() -> str:
    """Distinct-brand-per-supplier histogram (twin of
    `queries.q_supplier_brand_span`)."""
    return """
WITH sb AS (
  SELECT DISTINCT l_suppkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
),
per AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS brands FROM sb
        GROUP BY 1)
SELECT brands, CAST(count(*) AS BIGINT) AS n_suppliers
FROM per GROUP BY 1
"""


def disc_band_share(bands: tuple = (0, 3, 6, 9)) -> str:
    """Lineitem count + revenue cents per discount band (twin of
    `queries.q_disc_band_share`)."""
    cuts = list(bands[1:])
    case = "CASE "
    for i, c in enumerate(cuts):
        case += f"WHEN dc < {c} THEN {i} "
    case += f"ELSE {len(cuts)} END"
    return f"""
WITH v AS (
  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dc,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
)
SELECT CAST({case} AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM v GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 62: run-length histogram, LSH bucket census, status-line grid,
# quality-gate grid, local homophily
# ---------------------------------------------------------------------------


def type_run_hist() -> str:
    """Same-type run-length histogram per user sequence (twin of
    `queries.q_type_run_hist`; islands via rank difference)."""
    return """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rt
  FROM events
),
runs AS (
  SELECT user_id, event_type, rn - rt AS grp,
         CAST(count(*) AS BIGINT) AS len
  FROM r GROUP BY 1, 2, 3
)
SELECT len AS run_len, CAST(count(*) AS BIGINT) AS n_runs
FROM runs GROUP BY 1
"""


def lsh_bucket_census(dims: int = 8, qscale: int = 1 << 20) -> str:
    """Sign-LSH bucket-size histogram over dims 0..dims-1 (twin of
    `queries.q_lsh_bucket_census`)."""
    half = qscale // 2
    return f"""
WITH q AS (
  SELECT vec_id, CAST(g.d - 1 AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dims}) g(d)
),
b AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN q >= {half} THEN 1 << dim ELSE 0 END)
              AS BIGINT) AS bucket
  FROM q GROUP BY 1
),
sz AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1)
SELECT c AS bucket_size, CAST(count(*) AS BIGINT) AS n_buckets
FROM sz GROUP BY 1
"""


def status_line_grid() -> str:
    """Lineitem counts per (order status, line status) (twin of
    `queries.q_status_line_grid`)."""
    return """
SELECT o_orderstatus, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1, 2
"""


def quality_gate_grid(min_toks: int = 5, dr_num: int = 1,
                      dr_den: int = 2) -> str:
    """2x2 quality-gate census (twin of
    `queries.q_quality_gate_grid`)."""
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
flat AS (
  SELECT doc_id, unnest(l) AS tok FROM t
),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS nt,
         CAST(count(DISTINCT tok) AS BIGINT) AS nd
  FROM flat GROUP BY 1
)
SELECT CAST(CASE WHEN nt >= {min_toks} THEN 1 ELSE 0 END AS BIGINT)
         AS pass_len,
       CAST(CASE WHEN nd * {dr_den} >= nt * {dr_num} THEN 1 ELSE 0 END
            AS BIGINT) AS pass_ratio,
       CAST(count(*) AS BIGINT) AS n_docs
FROM per GROUP BY 1, 2
"""


@_materialized
def local_homophily_hist(buckets: int = 10) -> str:
    """Same-repo neighbor-share decile histogram (twin of
    `queries.q_local_homophily_hist`)."""
    return PREFIX + f"""
, undd AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
per AS (
  SELECT src AS v, CAST(count(*) AS BIGINT) AS tot,
         CAST(sum(CASE WHEN src % 100 = dst % 100 THEN 1 ELSE 0 END)
              AS BIGINT) AS same
  FROM undd GROUP BY 1
)
SELECT CAST(least(same * {buckets} // tot, {buckets - 1}) AS BIGINT)
         AS decile,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM per GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 63: brand rank concordance, 2-hop ball census, dedup share by
# source, type gap medians, brand price mode
# ---------------------------------------------------------------------------


def brand_rank_concordance(y1: int = 1995, y2: int = 1996) -> str:
    """Kendall concordant/discordant/tied pair counts between two
    years' brand revenue rankings (twin of
    `queries.q_brand_rank_concordance`)."""
    return f"""
WITH rev AS (
  SELECT p_brand AS brand,
         CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS cents
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN part   ON p_partkey = l_partkey
  WHERE extract(year FROM o_orderdate) IN ({y1}, {y2})
  GROUP BY 1, 2
),
w AS (
  SELECT brand,
         coalesce(max(CASE WHEN yr = {y1} THEN cents END), 0) AS a,
         coalesce(max(CASE WHEN yr = {y2} THEN cents END), 0) AS b
  FROM rev GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN x.a <> y.a AND x.b <> y.b
                          AND ((x.a > y.a) = (x.b > y.b))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_concordant,
       CAST(sum(CASE WHEN x.a <> y.a AND x.b <> y.b
                          AND ((x.a > y.a) <> (x.b > y.b))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_discordant,
       CAST(sum(CASE WHEN x.a = y.a OR x.b = y.b
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_tied
FROM w x JOIN w y ON x.brand < y.brand
"""


@_materialized
def reach2_hist() -> str:
    """2-hop ball-size histogram over the undirected distinct graph
    (twin of `queries.q_reach2_hist`)."""
    return PREFIX + """
, undd AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
two AS (
  SELECT a.src AS v, b.dst AS u
  FROM undd a JOIN undd b ON b.src = a.dst
),
ball AS (
  SELECT DISTINCT v, u FROM (
    SELECT src AS v, dst AS u FROM undd
    UNION ALL SELECT v, u FROM two
  ) WHERE v <> u
),
per AS (SELECT v, CAST(count(*) AS BIGINT) AS bs FROM ball GROUP BY 1)
SELECT bs AS ball_size, CAST(count(*) AS BIGINT) AS n_vertices
FROM per GROUP BY 1
"""


def dedup_share_by_source() -> str:
    """Exact-dedup canonical share per source (twin of
    `queries.q_dedup_share_by_source`; canonical = min doc_id per
    sorted-distinct-token key)."""
    return """
WITH k AS (
  SELECT doc_id, source,
         array_to_string(
           list_sort(list_distinct(string_split(text, ' '))), ' ')
           AS key
  FROM documents
),
c AS (
  SELECT doc_id, source,
         CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY key)
              THEN 1 ELSE 0 END AS canon
  FROM k
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(canon) AS BIGINT) AS n_canonical
FROM c GROUP BY 1
"""


def type_gap_median() -> str:
    """Per-type inter-event gap quantiles in global (ts, event_id)
    order (twin of `queries.q_type_gap_median`)."""
    return """
WITH r AS (
  SELECT event_type, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS pt
  FROM events
),
g AS (SELECT event_type, CAST(t - pt AS BIGINT) AS gap FROM r
      WHERE pt IS NOT NULL)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gap, 0.5) AS BIGINT) AS gap_q50_us,
       CAST(quantile_disc(gap, 0.9) AS BIGINT) AS gap_q90_us
FROM g GROUP BY 1
"""


def brand_price_mode() -> str:
    """Modal retail price cents per brand, ties -> lowest cents (twin
    of `queries.q_brand_price_mode`)."""
    return """
WITH c AS (
  SELECT p_brand,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY p_brand
                               ORDER BY n DESC, cents) AS rn
  FROM c
)
SELECT p_brand, cents AS modal_cents, n FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# wave 64: customer concentration, weekend split, name-key audit,
# id alignment, region profile
# ---------------------------------------------------------------------------


def cust_concentration() -> str:
    """Largest-order share decile per customer (twin of
    `queries.q_cust_concentration`)."""
    return """
WITH c AS (
  SELECT o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
s AS (
  SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS tot,
         CAST(max(cents) AS BIGINT) AS mx
  FROM c GROUP BY 1
)
SELECT CAST(least(mx * 10 // tot, 9) AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers
FROM s GROUP BY 1
"""


def weekend_split() -> str:
    """Weekend/weekday count + value sums per event type (twin of
    `queries.q_weekend_split`; epoch day 0 = Thursday -> weekend is
    day %% 7 in (2, 3))."""
    return """
SELECT event_type,
       CAST(CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                      IN (2, 3) THEN 1 ELSE 0 END AS BIGINT)
         AS is_weekend,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events GROUP BY 1, 2
"""


def name_key_audit() -> str:
    """Numeric-suffix-vs-key consistency over customer and supplier
    names (twin of `queries.q_name_key_audit`)."""
    return """
SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN CAST(string_split(c_name, '#')[2] AS BIGINT)
                          = c_custkey THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       CAST(sum(CAST(string_split(c_name, '#')[2] AS BIGINT))
            AS BIGINT) AS sum_parsed
FROM customer
UNION ALL
SELECT 'supplier', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN CAST(string_split(s_name, '#')[2] AS BIGINT)
                          = s_suppkey THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CAST(string_split(s_name, '#')[2] AS BIGINT))
            AS BIGINT)
FROM supplier
"""


def id_alignment_audit() -> str:
    """Full-outer key alignment between embeddings.vec_id and
    documents.doc_id (twin of `queries.q_id_alignment_audit`)."""
    return """
WITH j AS (
  SELECT e.vec_id, d.doc_id
  FROM embeddings e FULL OUTER JOIN documents d
    ON d.doc_id = e.vec_id
)
SELECT CAST(sum(CASE WHEN vec_id IS NOT NULL AND doc_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_aligned,
       CAST(sum(CASE WHEN vec_id IS NOT NULL AND doc_id IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_emb_only,
       CAST(sum(CASE WHEN vec_id IS NULL AND doc_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_doc_only
FROM j
"""


def region_profile() -> str:
    """Per-region nation/customer/supplier counts (twin of
    `queries.q_region_profile`)."""
    return """
SELECT r_name,
       CAST((SELECT count(*) FROM nation n
             WHERE n.n_regionkey = r.r_regionkey) AS BIGINT)
         AS n_nations,
       CAST((SELECT count(*) FROM customer c JOIN nation n2
             ON n2.n_nationkey = c.c_nationkey
             WHERE n2.n_regionkey = r.r_regionkey) AS BIGINT)
         AS n_customers,
       CAST((SELECT count(*) FROM supplier s JOIN nation n3
             ON n3.n_nationkey = s.s_nationkey
             WHERE n3.n_regionkey = r.r_regionkey) AS BIGINT)
         AS n_suppliers
FROM region r
"""


# ---------------------------------------------------------------------------
# wave 65: Gram diagonal, language run stats, user lifetime histogram
# ---------------------------------------------------------------------------


@_materialized
def col_sumsq() -> str:
    """diag(A^T A): per-column sum of squared in-edge weights (twin of
    `queries.q_col_sumsq`)."""
    return PREFIX + """
SELECT vd.label AS label, CAST(sum(e.w * e.w) AS BIGINT) AS sum_w2
FROM edges e JOIN verts vd ON vd.i = e.dst GROUP BY 1
"""


def lang_run_stats() -> str:
    """Global language runs along doc_id order (twin of
    `queries.q_lang_run_stats`)."""
    return """
WITH r AS (
  SELECT lang, row_number() OVER (ORDER BY doc_id) AS rn,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rl
  FROM documents
),
runs AS (
  SELECT lang, rn - rl AS grp, CAST(count(*) AS BIGINT) AS len
  FROM r GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(len) AS BIGINT) AS max_run,
       CAST(count(*) - 1 AS BIGINT) AS n_switches
FROM runs
"""


def user_lifetime_hist() -> str:
    """First-to-last event whole-day span histogram per user (twin of
    `queries.q_user_lifetime_hist`)."""
    return """
WITH s AS (
  SELECT user_id,
         CAST(floor(epoch(max(ts)) / 86400)
              - floor(epoch(min(ts)) / 86400) AS BIGINT) AS days
  FROM events GROUP BY 1
)
SELECT days, CAST(count(*) AS BIGINT) AS n_users
FROM s GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 66: cross-source duplicate leakage, user trend split,
# CC weight-threshold curve
# ---------------------------------------------------------------------------


def cross_source_dups() -> str:
    """Exact-dup groups spanning multiple sources (twin of
    `queries.q_cross_source_dups`)."""
    return """
WITH k AS (
  SELECT doc_id, source,
         array_to_string(
           list_sort(list_distinct(string_split(text, ' '))), ' ')
           AS key
  FROM documents
),
g AS (
  SELECT key, CAST(count(*) AS BIGINT) AS c,
         CAST(count(DISTINCT source) AS BIGINT) AS ns
  FROM k GROUP BY 1
)
SELECT CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_groups,
       CAST(sum(CASE WHEN c >= 2 AND ns > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_spanning,
       CAST(sum(CASE WHEN c >= 2 AND ns > 1 THEN c ELSE 0 END)
            AS BIGINT) AS n_docs_spanning
FROM g
"""


def user_trend_split() -> str:
    """Rising/falling/flat users by half-sequence mean comparison
    (twin of `queries.q_user_trend_split`)."""
    return """
WITH r AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS idx,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
per AS (
  SELECT user_id, CAST(min(n) AS BIGINT) AS n,
         CAST(sum(CASE WHEN idx < n // 2 THEN c ELSE 0 END)
              AS BIGINT) AS a,
         CAST(sum(CASE WHEN idx >= n // 2 THEN c ELSE 0 END)
              AS BIGINT) AS b
  FROM r GROUP BY 1 HAVING min(n) >= 2
)
SELECT CAST(sum(CASE WHEN b * (n // 2) > a * (n - n // 2)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_rising,
       CAST(sum(CASE WHEN b * (n // 2) < a * (n - n // 2)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_falling,
       CAST(sum(CASE WHEN b * (n // 2) = a * (n - n // 2)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flat
FROM per
"""


@_materialized
def cc_threshold_curve(iters: int = 12) -> str:
    """Component counts at symmetric-weight thresholds 1 and 2 (twin
    of `queries.q_cc_threshold_curve`)."""
    sql = PREFIX + """
, uw AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b, sum(w) AS w2
  FROM edges GROUP BY 1, 2
)"""
    parts = []
    for t in (1, 2):
        sql += f"""
, u{t} AS (
  SELECT a AS src, b AS dst FROM uw WHERE w2 >= {t}
  UNION ALL SELECT b, a FROM uw WHERE w2 >= {t}
),
t{t}l0 AS (SELECT i, label AS comp FROM verts)
"""
        prev = f"t{t}l0"
        for k in range(1, iters + 1):
            sql += f"""
, t{t}l{k} AS (
  SELECT v.i, least(l.comp, coalesce(m.mn, l.comp)) AS comp
  FROM verts v JOIN {prev} l ON l.i = v.i
  LEFT JOIN (
    SELECT u.dst AS i, min(lp.comp) AS mn
    FROM u{t} u JOIN {prev} lp ON lp.i = u.src GROUP BY u.dst
  ) m ON m.i = v.i
)"""
            prev = f"t{t}l{k}"
        parts.append(
            f"SELECT CAST({t} AS BIGINT) AS w_min, "
            f"CAST(count(DISTINCT comp) AS BIGINT) AS n_components "
            f"FROM {prev}")
    sql += "\n" + "\nUNION ALL\n".join(parts)
    return sql


# ---------------------------------------------------------------------------
# wave 67: CC convergence trace, BFS frontier trace, whale share
# ---------------------------------------------------------------------------


@_materialized
def cc_convergence_trace(iters: int = 12) -> str:
    """Per-round changed-label counts of the min-label chain (twin of
    `queries.q_cc_convergence_trace`; min over label strings equals
    min over dense ids because ids are the label sort ranks)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
l0 AS (SELECT i, label AS comp FROM verts)
"""
    prev = "l0"
    for k in range(1, iters + 1):
        sql += f"""
, l{k} AS (
  SELECT v.i, least(l.comp, coalesce(m.mn, l.comp)) AS comp
  FROM verts v JOIN {prev} l ON l.i = v.i
  LEFT JOIN (
    SELECT u.dst AS i, min(lp.comp) AS mn
    FROM und u JOIN {prev} lp ON lp.i = u.src GROUP BY u.dst
  ) m ON m.i = v.i
)"""
        prev = f"l{k}"
    parts = []
    for k in range(1, iters + 1):
        parts.append(
            f"SELECT CAST({k} AS BIGINT) AS round, "
            f"CAST(count(*) AS BIGINT) AS n_changed "
            f"FROM l{k} a JOIN l{k - 1} b ON b.i = a.i "
            f"WHERE a.comp <> b.comp")
    sql += "\n" + "\nUNION ALL\n".join(parts)
    return sql


@_materialized
def bfs_frontier_trace(root_label: str = "m_0", iters: int = 12) -> str:
    """Level-size histogram of the BFS from the root (twin of
    `queries.q_bfs_frontier_trace`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
SELECT CAST(dist AS BIGINT) AS level,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM {prev} GROUP BY 1
"""
    return sql


def whale_share(k: int = 10) -> str:
    """Top-k user value share, exact cents pair (twin of
    `queries.q_whale_share`)."""
    return f"""
WITH s AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1
),
r AS (
  SELECT cents, row_number() OVER (ORDER BY cents DESC, user_id)
           AS rn
  FROM s
)
SELECT CAST({k} AS BIGINT) AS k,
       CAST(sum(CASE WHEN rn <= {k} THEN cents ELSE 0 END) AS BIGINT)
         AS topk_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM r
"""


# ---------------------------------------------------------------------------
# wave 68: suffix census, edge degree grid, same-day orders,
# blob byte histogram
# ---------------------------------------------------------------------------


def suffix_census(depth: int = 5) -> str:
    """Distinct token-suffix counts per depth (twin of
    `queries.q_suffix_census`)."""
    return f"""
WITH t AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
),
p AS (
  SELECT DISTINCT d.d AS depth,
         substring(tok, length(tok) - CAST(d.d AS INT) + 1,
                   CAST(d.d AS INT)) AS suf
  FROM t CROSS JOIN generate_series(1, {depth}) d(d)
  WHERE length(tok) >= d.d
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_suffixes
FROM p GROUP BY 1
"""


@_materialized
def edge_deg_grid() -> str:
    """Sorted log2-degree bucket pair per distinct undirected edge
    (twin of `queries.q_edge_deg_grid`)."""
    return PREFIX + """
, undd AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, CAST(count(*) AS BIGINT) AS d FROM undd
        GROUP BY 1),
L AS (SELECT src, dst FROM undd WHERE src < dst),
cls AS (
  SELECT least(CAST(floor(log2(da.d)) AS BIGINT),
               CAST(floor(log2(db.d)) AS BIGINT)) AS lo_bucket,
         greatest(CAST(floor(log2(da.d)) AS BIGINT),
                  CAST(floor(log2(db.d)) AS BIGINT)) AS hi_bucket
  FROM L JOIN deg da ON da.i = L.src JOIN deg db ON db.i = L.dst
)
SELECT lo_bucket, hi_bucket, CAST(count(*) AS BIGINT) AS n_edges
FROM cls GROUP BY 1, 2
"""


def same_day_orders() -> str:
    """Same-day multi-order counts (twin of
    `queries.q_same_day_orders`)."""
    return """
WITH d AS (
  SELECT o_custkey,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
m AS (SELECT * FROM d WHERE c >= 2)
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_cust_days,
       CAST(coalesce(sum(c), 0) AS BIGINT) AS n_orders_involved
FROM m
"""


def blob_bytes_hist() -> str:
    """Synthetic blob byte-length histogram per modality (twin of
    `queries.q_blob_bytes_hist`; 12-byte header + integer payload
    formulas from multimodal.make_*)."""
    return """
WITH d AS (SELECT doc_id FROM documents),
sz AS (
  SELECT 'image' AS kind,
         CAST(12 + (8 + (doc_id % 5) * 4) * (8 + (doc_id % 3) * 4)
              AS BIGINT) AS nbytes
  FROM d
  UNION ALL
  SELECT 'audio', CAST(12 + 2 * (256 + (doc_id % 4) * 128) AS BIGINT)
  FROM d
  UNION ALL
  SELECT 'video', CAST(12 + (4 + (doc_id % 5)) * 64 AS BIGINT)
  FROM d
)
SELECT kind, nbytes, CAST(count(*) AS BIGINT) AS n_items
FROM sz GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# wave 69: busy minutes, BFS level cut
# ---------------------------------------------------------------------------


def busy_minutes(k: int = 3) -> str:
    """HOURS holding >= k events per type (twin of
    `queries.q_busy_minutes`; hour windows — see the query note)."""
    return f"""
WITH m AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS mn,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(sum(CASE WHEN c >= {k} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_busy_minutes
FROM m GROUP BY 1
HAVING sum(CASE WHEN c >= {k} THEN 1 ELSE 0 END) > 0
"""


@_materialized
def bfs_level_cut(root_label: str = "m_0", iters: int = 12) -> str:
    """Distinct undirected edges by BFS-level relation of endpoints
    (twin of `queries.q_bfs_level_cut`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for x in range(1, iters + 1):
        sql += f"""
, d{x} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{x}"
    sql += f"""
, L AS (SELECT src AS a, dst AS b FROM und WHERE src < dst),
cls AS (
  SELECT la.dist AS x, lb.dist AS y
  FROM L LEFT JOIN {prev} la ON la.i = L.a
  LEFT JOIN {prev} lb ON lb.i = L.b
)
SELECT CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL AND x = y
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
       CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL AND x <> y
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
       CAST(sum(CASE WHEN x IS NULL OR y IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unreached
FROM cls
"""
    return sql


def _apsp_chain(k: int, iters: int) -> str:
    """Shared hub K-source min-plus chain prefix (see `apsp_top`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, count(*) AS d FROM und GROUP BY 1),
S AS (
  SELECT i FROM (
    SELECT i, row_number() OVER (ORDER BY d DESC, i) AS rn FROM deg
  ) WHERE rn <= {k}
),
d0 AS (SELECT i AS r, i, 0 AS dist FROM S)
"""
    prev = "d0"
    for x in range(1, iters + 1):
        sql += f"""
, d{x} AS (
  SELECT r, i, min(dist) AS dist FROM (
    SELECT r, i, dist FROM {prev}
    UNION ALL
    SELECT dp.r, u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY 1, 2
)"""
        prev = f"d{x}"
    return sql, prev


@_materialized
def hub_ecc(k: int = 32, iters: int = 12) -> str:
    """Per-hub windowed eccentricity + reach count (twin of
    `queries.q_hub_ecc`)."""
    sql, prev = _apsp_chain(k, iters)
    return sql + f"""
SELECT va.label AS label, CAST(max(d.dist) AS BIGINT) AS ecc,
       CAST(count(*) AS BIGINT) AS n_reached
FROM {prev} d JOIN verts va ON va.i = d.r
GROUP BY 1
"""


@_materialized
def hub_coreach(k: int = 32, iters: int = 12) -> str:
    """Vertices reached by all / any / none of the hubs (twin of
    `queries.q_hub_coreach`)."""
    sql, prev = _apsp_chain(k, iters)
    return sql + f"""
, reach AS (SELECT i, count(DISTINCT r) AS nr FROM {prev} GROUP BY 1),
tot AS (SELECT count(*) AS n FROM verts)
SELECT CAST(sum(CASE WHEN nr = {k} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_all,
       CAST(count(*) AS BIGINT) AS n_any,
       CAST((SELECT n FROM tot) - count(*) AS BIGINT) AS n_none
FROM reach
"""


def source_lang_entropy() -> str:
    """Per-source language-mix Shannon entropy (twin of
    `queries.q_source_lang_entropy`)."""
    return """
WITH c AS (
  SELECT source, lang, CAST(count(*) AS DOUBLE) AS c
  FROM documents GROUP BY 1, 2
),
t AS (SELECT source, sum(c) AS s FROM c GROUP BY 1)
SELECT c.source AS source,
       round(-sum((c.c / t.s) * ln(c.c / t.s)), 6) AS entropy,
       CAST(t.s AS BIGINT) AS n_docs
FROM c JOIN t ON c.source = t.source
GROUP BY c.source, t.s
"""


def user_value_lag() -> str:
    """Per-type mean |lag-1 value delta| over (user, type) streams
    (twin of `queries.q_user_value_lag`)."""
    return """
WITH l AS (
  SELECT event_type,
         value - lag(value) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS dv
  FROM events
)
SELECT event_type, round(avg(abs(dv)), 6) AS mean_abs_dv,
       CAST(count(dv) AS BIGINT) AS n_pairs
FROM l WHERE dv IS NOT NULL GROUP BY 1
"""


def order_gap_hist() -> str:
    """Histogram of per-customer consecutive-order day gaps (twin of
    `queries.q_order_gap_hist`)."""
    return """
WITH l AS (
  SELECT date_diff('day',
           lag(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap
  FROM orders
)
SELECT CAST(gap AS BIGINT) AS gap_days, CAST(count(*) AS BIGINT) AS n
FROM l WHERE gap IS NOT NULL GROUP BY 1
"""


# --- wave 72: iterative linear-algebra faces -------------------------------


def _w72_power_chain(iters: int) -> str:
    """Shared unrolled power-iteration chain: x{iters} is the final unit
    vector over the undirected structural adjacency (norm-0 rounds hold
    the uniform fixed point, mirroring the Ray short-circuit)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
x0 AS (SELECT f.i, 1.0 / sqrt(p.n) AS v FROM files f CROSS JOIN params p)
"""
    prev = "x0"
    for k in range(1, iters + 1):
        sql += f"""
, y{k} AS (
  SELECT f.i, coalesce(s.sv, 0.0) AS v
  FROM files f LEFT JOIN (
    SELECT u.src AS i, sum(x.v) AS sv
    FROM und u JOIN {prev} x ON x.i = u.dst GROUP BY u.src
  ) s ON s.i = f.i
),
n{k} AS (SELECT sqrt(sum(v * v)) AS nrm FROM y{k}),
x{k} AS (
  SELECT y.i,
         CASE WHEN n.nrm > 0 THEN y.v / n.nrm
              ELSE 1.0 / sqrt(p.n) END AS v
  FROM y{k} y CROSS JOIN n{k} n CROSS JOIN params p
)"""
        prev = f"x{k}"
    return sql


@_materialized
def eigencentrality(iters: int = 8) -> str:
    """Power iteration (twin of `queries.q_eigencentrality`): score =
    final unit-vector entry * sqrt(n), rounded 6."""
    return _w72_power_chain(iters) + f"""
SELECT v.label AS label, round(x.v * sqrt(p.n), 6) AS score
FROM x{iters} x JOIN verts v ON v.i = x.i CROSS JOIN params p
"""


@_materialized
def spectral_bound(iters: int = 8) -> str:
    """Rayleigh quotient x^T A x of the final power-iteration vector
    (twin of `queries.q_spectral_bound`); one row."""
    return _w72_power_chain(iters) + f"""
, yfin AS (
  SELECT f.i, coalesce(s.sv, 0.0) AS v
  FROM files f LEFT JOIN (
    SELECT u.src AS i, sum(x.v) AS sv
    FROM und u JOIN x{iters} x ON x.i = u.dst GROUP BY u.src
  ) s ON s.i = f.i
)
SELECT round(coalesce(sum(x.v * y.v), 0.0), 6) AS rayleigh
FROM x{iters} x JOIN yfin y ON y.i = x.i
"""


@_materialized
def sinkhorn_balance(iters: int = 6) -> str:
    """Sinkhorn-Knopp alternating scaling rounds (twin of
    `queries.q_sinkhorn_balance`): r = 1/(A c), c = 1/(A r) from c = 1,
    isolated vertices at 0; per-vertex (r, c) rounded 6."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
c0 AS (SELECT i, 1.0 AS v FROM files)
"""
    prev_c = "c0"
    for k in range(1, iters + 1):
        sql += f"""
, r{k} AS (
  SELECT f.i,
         CASE WHEN coalesce(s.sv, 0.0) > 0 THEN 1.0 / s.sv
              ELSE 0.0 END AS v
  FROM files f LEFT JOIN (
    SELECT u.src AS i, sum(c.v) AS sv
    FROM und u JOIN {prev_c} c ON c.i = u.dst GROUP BY u.src
  ) s ON s.i = f.i
),
c{k} AS (
  SELECT f.i,
         CASE WHEN coalesce(s.sv, 0.0) > 0 THEN 1.0 / s.sv
              ELSE 0.0 END AS v
  FROM files f LEFT JOIN (
    SELECT u.src AS i, sum(r.v) AS sv
    FROM und u JOIN r{k} r ON r.i = u.dst GROUP BY u.src
  ) s ON s.i = f.i
)"""
        prev_c = f"c{k}"
    sql += f"""
SELECT v.label AS label, round(r.v, 6) AS r, round(c.v, 6) AS c
FROM r{iters} r JOIN c{iters} c ON c.i = r.i
JOIN verts v ON v.i = r.i
"""
    return sql


def _w72_jacobi_chain(iters: int) -> str:
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
degq AS (
  SELECT f.i, CAST(coalesce(d.d, 0) AS DOUBLE) AS d
  FROM files f LEFT JOIN (
    SELECT src AS i, count(*) AS d FROM und GROUP BY src
  ) d ON d.i = f.i
),
bvec AS (SELECT i, CAST(1 + i % 7 AS DOUBLE) AS v FROM files),
jx0 AS (SELECT i, 0.0 AS v FROM files)
"""
    prev = "jx0"
    for k in range(1, iters + 1):
        sql += f"""
, jx{k} AS (
  SELECT d.i, (b.v + coalesce(s.sv, 0.0)) / (d.d + 1.0) AS v
  FROM degq d JOIN bvec b ON b.i = d.i
  LEFT JOIN (
    SELECT u.src AS i, sum(x.v) AS sv
    FROM und u JOIN {prev} x ON x.i = u.dst GROUP BY u.src
  ) s ON s.i = d.i
)"""
        prev = f"jx{k}"
    return sql


@_materialized
def jacobi_laplacian(iters: int = 8) -> str:
    """Unrolled Jacobi rounds for (L + I) x = b, b = 1 + (i % 7) (twin
    of `queries.q_jacobi_laplacian`); per-vertex x rounded 6."""
    return _w72_jacobi_chain(iters) + f"""
SELECT v.label AS label, round(x.v, 6) AS x
FROM jx{iters} x JOIN verts v ON v.i = x.i
"""


@_materialized
def jacobi_resid(iters: int = 8) -> str:
    """||(L + I) x - b||_inf after the Jacobi rounds (twin of
    `queries.q_jacobi_resid`); one row."""
    return _w72_jacobi_chain(iters) + f"""
, yfin AS (
  SELECT f.i, coalesce(s.sv, 0.0) AS v
  FROM files f LEFT JOIN (
    SELECT u.src AS i, sum(x.v) AS sv
    FROM und u JOIN jx{iters} x ON x.i = u.dst GROUP BY u.src
  ) s ON s.i = f.i
)
SELECT round(max(abs((d.d + 1.0) * x.v - y.v - b.v)), 6) AS resid
FROM jx{iters} x JOIN degq d ON d.i = x.i
JOIN bvec b ON b.i = x.i JOIN yfin y ON y.i = x.i
"""


@_materialized
def gcn_prop(f: int = 4) -> str:
    """Two-layer GCN propagation H = A_hat relu(A_hat X W1) W2 with
    A_hat = D^{-1/2}(A + I)D^{-1/2}, X = one-hot(i % f) (twin of
    `queries.q_gcn_prop`); per-vertex (y0, y1) rounded 6."""
    w1_rows = ", ".join(
        f"({a}, {b}, {((3 * a + 5 * b) % 7 - 3) / 4.0})"
        for a in range(f) for b in range(f))
    w2_rows = ", ".join(
        f"({a}, {b}, {((2 * a + 3 * b) % 5 - 2) / 4.0})"
        for a in range(f) for b in range(2))
    return PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
w1(a, b, w) AS (VALUES {w1_rows}),
w2(a, b, w) AS (VALUES {w2_rows}),
degq AS (
  SELECT f.i, CAST(coalesce(d.d, 0) AS DOUBLE) AS d
  FROM files f LEFT JOIN (
    SELECT src AS i, count(*) AS d FROM und GROUP BY src
  ) d ON d.i = f.i
),
sv AS (SELECT i, 1.0 / sqrt(d + 1.0) AS s FROM degq),
h0 AS (
  SELECT f.i, t.f AS f,
         CASE WHEN f.i % {f} = t.f THEN 1.0 ELSE 0.0 END AS v
  FROM files f CROSS JOIN generate_series(0, {f - 1}) t(f)
),
u0 AS (SELECT h.i, h.f, h.v * s.s AS v FROM h0 h JOIN sv s ON s.i = h.i),
p0 AS (
  SELECT u.i, u.f, (u.v + coalesce(a.sv, 0.0)) * s.s AS v
  FROM u0 u JOIN sv s ON s.i = u.i
  LEFT JOIN (
    SELECT e.src AS i, uu.f, sum(uu.v) AS sv
    FROM und e JOIN u0 uu ON uu.i = e.dst GROUP BY e.src, uu.f
  ) a ON a.i = u.i AND a.f = u.f
),
h1 AS (
  SELECT p.i, w.b AS f, greatest(0.0, sum(p.v * w.w)) AS v
  FROM p0 p JOIN w1 w ON w.a = p.f GROUP BY p.i, w.b
),
u1 AS (SELECT h.i, h.f, h.v * s.s AS v FROM h1 h JOIN sv s ON s.i = h.i),
p1 AS (
  SELECT u.i, u.f, (u.v + coalesce(a.sv, 0.0)) * s.s AS v
  FROM u1 u JOIN sv s ON s.i = u.i
  LEFT JOIN (
    SELECT e.src AS i, uu.f, sum(uu.v) AS sv
    FROM und e JOIN u1 uu ON uu.i = e.dst GROUP BY e.src, uu.f
  ) a ON a.i = u.i AND a.f = u.f
),
h2 AS (
  SELECT p.i, w.b AS f, sum(p.v * w.w) AS v
  FROM p1 p JOIN w2 w ON w.a = p.f GROUP BY p.i, w.b
)
SELECT v.label AS label,
       round(max(CASE WHEN h.f = 0 THEN h.v END), 6) AS y0,
       round(max(CASE WHEN h.f = 1 THEN h.v END), 6) AS y1
FROM h2 h JOIN verts v ON v.i = h.i
GROUP BY v.label
"""


# --- wave 73: spectral filter, CG solve, LM quality scoring ----------------


def _w73_lt_cte(name: str, prev: str) -> str:
    """One scaled-Laplacian apply: {name} = (2/lmax)(d*v - A v) - v."""
    return f"""
, {name} AS (
  SELECT d.i,
         (2.0 / lm.m) * (d.d * t.v - coalesce(s.sv, 0.0)) - t.v AS v
  FROM degq d JOIN {prev} t ON t.i = d.i CROSS JOIN lmax lm
  LEFT JOIN (
    SELECT u.src AS i, sum(tt.v) AS sv
    FROM und u JOIN {prev} tt ON tt.i = u.dst GROUP BY u.src
  ) s ON s.i = d.i
)"""


@_materialized
def chebyshev_filter(order: int = 4) -> str:
    """Order-``order`` Chebyshev filter on the scaled Laplacian with
    lmax = 2(max_deg + 1), theta_j = 1/(j+1) (twin of
    `queries.q_chebyshev_filter`); per-vertex y rounded 6."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
degq AS (
  SELECT f.i, CAST(coalesce(d.d, 0) AS DOUBLE) AS d
  FROM files f LEFT JOIN (
    SELECT src AS i, count(*) AS d FROM und GROUP BY src
  ) d ON d.i = f.i
),
lmax AS (SELECT 2.0 * (max(d) + 1.0) AS m FROM degq),
t0 AS (SELECT i, CAST(1 + i % 7 AS DOUBLE) AS v FROM files)
"""
    sql += _w73_lt_cte("t1", "t0")
    for j in range(2, order + 1):
        sql += _w73_lt_cte(f"lt{j}", f"t{j - 1}")
        sql += f"""
, t{j} AS (
  SELECT a.i, 2.0 * a.v - b.v AS v
  FROM lt{j} a JOIN t{j - 2} b ON b.i = a.i
)"""
    terms = " + ".join(f"t{j}.v / {j + 1}.0" for j in range(order + 1))
    joins = "".join(f" JOIN t{j} ON t{j}.i = t0.i"
                    for j in range(1, order + 1))
    sql += f"""
SELECT v.label AS label, round({terms}, 6) AS y
FROM t0{joins} JOIN verts v ON v.i = t0.i
"""
    return sql


def _w73_cg_chain(iters: int) -> str:
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
degq AS (
  SELECT f.i, CAST(coalesce(d.d, 0) AS DOUBLE) AS d
  FROM files f LEFT JOIN (
    SELECT src AS i, count(*) AS d FROM und GROUP BY src
  ) d ON d.i = f.i
),
cg_x0 AS (SELECT i, 0.0 AS v FROM files),
cg_r0 AS (SELECT i, CAST(1 + i % 7 AS DOUBLE) AS v FROM files),
cg_p0 AS (SELECT i, v FROM cg_r0),
rr0 AS (SELECT sum(v * v) AS s FROM cg_r0)
"""
    for k in range(1, iters + 1):
        p, kk = f"cg_p{k - 1}", k
        sql += f"""
, q{kk} AS (
  SELECT d.i, (d.d + 1.0) * p.v - coalesce(s.sv, 0.0) AS v
  FROM degq d JOIN {p} p ON p.i = d.i
  LEFT JOIN (
    SELECT u.src AS i, sum(pp.v) AS sv
    FROM und u JOIN {p} pp ON pp.i = u.dst GROUP BY u.src
  ) s ON s.i = d.i
),
pq{kk} AS (SELECT sum(p.v * q.v) AS s FROM {p} p JOIN q{kk} q ON q.i = p.i),
al{kk} AS (
  SELECT CASE WHEN pq.s > 0 THEN rr.s / pq.s ELSE 0.0 END AS a
  FROM pq{kk} pq CROSS JOIN rr{k - 1} rr
),
cg_x{kk} AS (
  SELECT x.i, x.v + al.a * p.v AS v
  FROM cg_x{k - 1} x JOIN {p} p ON p.i = x.i CROSS JOIN al{kk} al
),
cg_r{kk} AS (
  SELECT r.i, r.v - al.a * q.v AS v
  FROM cg_r{k - 1} r JOIN q{kk} q ON q.i = r.i CROSS JOIN al{kk} al
),
rr{kk} AS (SELECT sum(v * v) AS s FROM cg_r{kk}),
be{kk} AS (
  SELECT CASE WHEN rrp.s > 0 THEN rr.s / rrp.s ELSE 0.0 END AS b
  FROM rr{kk} rr CROSS JOIN rr{k - 1} rrp
),
cg_p{kk} AS (
  SELECT r.i, r.v + be.b * p.v AS v
  FROM cg_r{kk} r JOIN {p} p ON p.i = r.i CROSS JOIN be{kk} be
)"""
    return sql


@_materialized
def conjgrad_fixed(iters: int = 5) -> str:
    """Unrolled guarded conjugate-gradient rounds for (L + I) x = b
    (twin of `queries.q_conjgrad_fixed`); per-vertex x rounded 6."""
    return _w73_cg_chain(iters) + f"""
SELECT v.label AS label, round(x.v, 6) AS x
FROM cg_x{iters} x JOIN verts v ON v.i = x.i
"""


@_materialized
def cg_resid(iters: int = 5) -> str:
    """||r||_2 after the CG rounds (twin of `queries.q_cg_resid`)."""
    return _w73_cg_chain(iters) + f"""
SELECT round(sqrt(s), 6) AS resid FROM rr{iters}
"""


def lm_score() -> str:
    """Per-language mean add-one-smoothed unigram cross-entropy (twin
    of `queries.q_lm_score`); space tokenizer = `vocab_topk`'s."""
    return """
WITH tok AS MATERIALIZED (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
cnt AS MATERIALIZED (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
tot AS (
  SELECT (SELECT count(*) FROM tok) AS n, (SELECT count(*) FROM cnt) AS v
),
doc AS (
  SELECT t.doc_id, any_value(t.lang) AS lang,
         avg(-ln((c.c + 1.0) / (tt.n + tt.v))) AS h
  FROM tok t JOIN cnt c ON c.tok = t.tok CROSS JOIN tot tt
  GROUP BY t.doc_id
)
SELECT lang, round(avg(h), 6) AS mean_h,
       CAST(count(*) AS BIGINT) AS n_docs
FROM doc GROUP BY lang
"""


# --- wave 74: SALSA, lambda_2, LM outlier census ----------------------------


@_materialized
def salsa_fixed(iters: int = 4) -> str:
    """Unrolled SALSA authority rounds on the structural directed graph
    (twin of `queries.q_salsa_fixed`): h = D_out^{-1} A a then
    a = D_in^{-1} A^T h, guarded divisions; per-vertex auth rounded 6."""
    sql = PREFIX + """
, din AS (
  SELECT f.i, CAST(coalesce(d.c, 0) AS DOUBLE) AS d
  FROM files f LEFT JOIN (
    SELECT dst AS i, count(*) AS c FROM edges GROUP BY dst
  ) d ON d.i = f.i
),
dout AS (
  SELECT f.i, CAST(coalesce(d.c, 0) AS DOUBLE) AS d
  FROM files f LEFT JOIN (
    SELECT src AS i, count(*) AS c FROM edges GROUP BY src
  ) d ON d.i = f.i
),
sa0 AS (SELECT i, 1.0 AS v FROM files)
"""
    prev = "sa0"
    for k in range(1, iters + 1):
        sql += f"""
, sh{k} AS (
  SELECT o.i,
         CASE WHEN o.d > 0 THEN coalesce(s.sv, 0.0) / o.d
              ELSE 0.0 END AS v
  FROM dout o LEFT JOIN (
    SELECT e.src AS i, sum(a.v) AS sv
    FROM edges e JOIN {prev} a ON a.i = e.dst GROUP BY e.src
  ) s ON s.i = o.i
),
sa{k} AS (
  SELECT d.i,
         CASE WHEN d.d > 0 THEN coalesce(s.sv, 0.0) / d.d
              ELSE 0.0 END AS v
  FROM din d LEFT JOIN (
    SELECT e.dst AS i, sum(h.v) AS sv
    FROM edges e JOIN sh{k} h ON h.i = e.src GROUP BY e.dst
  ) s ON s.i = d.i
)"""
        prev = f"sa{k}"
    sql += f"""
SELECT v.label AS label, round(a.v, 6) AS auth
FROM {prev} a JOIN verts v ON v.i = a.i
"""
    return sql


def _w86_deflate_chain(iters: int) -> str:
    """Shared Wielandt-deflation chain: everything through ``dv{iters}``
    (the normalized deflated vector) plus the ``lam1`` CTE. The deflated
    start is b = 1 + (i % 7) unit-normalized then orthogonalized
    against x1; every normalization is zero-guarded like the Ray side.
    Used by `lambda2` (scalar) and `fiedler_cut` (sign bisection)."""
    sql = _w72_power_chain(iters) + f"""
, yf1 AS (
  SELECT f.i, coalesce(s.sv, 0.0) AS v
  FROM files f LEFT JOIN (
    SELECT u.src AS i, sum(x.v) AS sv
    FROM und u JOIN x{iters} x ON x.i = u.dst GROUP BY u.src
  ) s ON s.i = f.i
),
lam1 AS (
  SELECT coalesce(sum(x.v * y.v), 0.0) AS l
  FROM x{iters} x JOIN yf1 y ON y.i = x.i
),
dbv AS (SELECT i, CAST(1 + i % 7 AS DOUBLE) AS v FROM files),
dbb AS (SELECT sqrt(sum(v * v)) AS s FROM dbv),
dw AS (
  SELECT b.i, CASE WHEN n.s > 0 THEN b.v / n.s ELSE 0.0 END AS v
  FROM dbv b CROSS JOIN dbb n
),
dc AS (
  SELECT coalesce(sum(x.v * w.v), 0.0) AS c
  FROM x{iters} x JOIN dw w ON w.i = x.i
),
dv0r AS (
  SELECT w.i, w.v - dc.c * x.v AS v
  FROM dw w JOIN x{iters} x ON x.i = w.i CROSS JOIN dc
),
dn0 AS (SELECT sqrt(sum(v * v)) AS s FROM dv0r),
dv0 AS (
  SELECT r.i, CASE WHEN n.s > 0 THEN r.v / n.s ELSE 0.0 END AS v
  FROM dv0r r CROSS JOIN dn0 n
)"""
    prev = "dv0"
    for k in range(1, iters + 1):
        sql += f"""
, dy{k} AS (
  SELECT f.i, coalesce(s.sv, 0.0) AS v
  FROM files f LEFT JOIN (
    SELECT u.src AS i, sum(v.v) AS sv
    FROM und u JOIN {prev} v ON v.i = u.dst GROUP BY u.src
  ) s ON s.i = f.i
),
dxv{k} AS (
  SELECT coalesce(sum(x.v * v.v), 0.0) AS c
  FROM x{iters} x JOIN {prev} v ON v.i = x.i
),
dd{k} AS (
  SELECT y.i, y.v - l.l * c.c * x.v AS v
  FROM dy{k} y JOIN x{iters} x ON x.i = y.i
  CROSS JOIN lam1 l CROSS JOIN dxv{k} c
),
dn{k} AS (SELECT sqrt(sum(v * v)) AS s FROM dd{k}),
dv{k} AS (
  SELECT d.i, CASE WHEN n.s > 0 THEN d.v / n.s ELSE 0.0 END AS v
  FROM dd{k} d CROSS JOIN dn{k} n
)"""
        prev = f"dv{k}"
    return sql


def _w86_dyf(iters: int) -> str:
    return f"""
, dyf AS (
  SELECT f.i, coalesce(s.sv, 0.0) AS v
  FROM files f LEFT JOIN (
    SELECT u.src AS i, sum(v.v) AS sv
    FROM und u JOIN dv{iters} v ON v.i = u.dst GROUP BY u.src
  ) s ON s.i = f.i
)"""


@_materialized
def lambda2(iters: int = 8) -> str:
    """(lambda_1, lambda_2) by power + Wielandt-deflated power iteration
    (twin of `queries.q_lambda2`); one row, rounded 6."""
    return _w86_deflate_chain(iters) + _w86_dyf(iters) + f"""
SELECT round((SELECT l FROM lam1), 6) AS lambda1,
       round(coalesce(sum(v.v * y.v), 0.0), 6) AS lambda2
FROM dv{iters} v JOIN dyf y ON y.i = v.i
"""


@_materialized
def fiedler_cut(iters: int = 8) -> str:
    """Spectral-bisection quality by the SIGN of the deflated power
    vector (twin of `queries.q_fiedler_cut`): one row with (lambda2,
    side sizes, undirected cut size, conductance). Side = round(v, 9)
    >= 0 — the rounding is shared with the Ray side so both twins take
    the same branch on near-zero entries."""
    return _w86_deflate_chain(iters) + _w86_dyf(iters) + f"""
, lam2q AS (
  SELECT coalesce(sum(v.v * y.v), 0.0) AS l
  FROM dv{iters} v JOIN dyf y ON y.i = v.i
),
sideq AS (
  SELECT i, CASE WHEN round(v, 9) >= 0 THEN 1 ELSE 0 END AS s
  FROM dv{iters}
),
degq2 AS (
  SELECT f.i, coalesce(d.d, 0) AS d
  FROM files f LEFT JOIN (
    SELECT src AS i, count(*) AS d FROM und GROUP BY 1
  ) d ON d.i = f.i
),
cutq AS (
  SELECT count(*) AS c
  FROM und u JOIN sideq a ON a.i = u.src JOIN sideq b ON b.i = u.dst
  WHERE a.s = 0 AND b.s = 1
),
vols AS (
  SELECT sum(CASE WHEN s.s = 1 THEN d.d ELSE 0 END) AS vp,
         sum(d.d) AS vt, sum(s.s) AS np, count(*) AS nn
  FROM degq2 d JOIN sideq s ON s.i = d.i
)
SELECT round((SELECT l FROM lam2q), 6) AS lambda2,
       CAST(v.np AS BIGINT) AS n_pos,
       CAST(v.nn - v.np AS BIGINT) AS n_neg,
       CAST((SELECT c FROM cutq) AS BIGINT) AS cut_edges,
       round(CASE WHEN least(v.vp, v.vt - v.vp) > 0
                  THEN (SELECT c FROM cutq) / least(v.vp, v.vt - v.vp)
                  ELSE 0.0 END, 6) AS conductance
FROM vols v
"""


def lm_outliers() -> str:
    """Per-language (n_docs, n_out) with outlier = per-doc unigram
    cross-entropy > mean + 2 * population sigma (twin of
    `queries.q_lm_outliers`)."""
    return """
WITH tok AS MATERIALIZED (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
cnt AS MATERIALIZED (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
tot AS (
  SELECT (SELECT count(*) FROM tok) AS n, (SELECT count(*) FROM cnt) AS v
),
doc AS MATERIALIZED (
  SELECT t.doc_id, any_value(t.lang) AS lang,
         avg(-ln((c.c + 1.0) / (tt.n + tt.v))) AS h
  FROM tok t JOIN cnt c ON c.tok = t.tok CROSS JOIN tot tt
  GROUP BY t.doc_id
),
st AS (
  SELECT lang, avg(h) AS m,
         avg(h * h) - avg(h) * avg(h) AS vp,
         count(*) AS n
  FROM doc GROUP BY lang
)
SELECT s.lang, CAST(s.n AS BIGINT) AS n_docs,
       CAST(coalesce(o.c, 0) AS BIGINT) AS n_out
FROM st s LEFT JOIN (
  SELECT d.lang, count(*) AS c
  FROM doc d JOIN st s2 ON s2.lang = d.lang
  WHERE d.h > s2.m + 2.0 * sqrt(greatest(s2.vp, 0.0))
  GROUP BY d.lang
) o ON o.lang = s.lang
"""


# --- wave 75: subgraph centrality (truncated Estrada) -----------------------

_W75_BASE = """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
a2 AS MATERIALIZED (
  SELECT a.src AS i, b.dst AS j, CAST(count(*) AS BIGINT) AS c
  FROM und a JOIN und b ON a.dst = b.src
  GROUP BY a.src, b.dst
),
wd2 AS (SELECT src AS i, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY src),
wd3 AS (
  SELECT a2.i, CAST(sum(a2.c) AS BIGINT) AS d
  FROM a2 JOIN und u ON u.src = a2.i AND u.dst = a2.j
  GROUP BY a2.i
),
wd4 AS (SELECT i, CAST(sum(c * c) AS BIGINT) AS d FROM a2 GROUP BY i)
"""


@_materialized
def estrada_trunc() -> str:
    """sc(v) = 1 + d2/2! + d3/3! + d4/4! from the exact closed-walk
    diagonals (twin of `queries.q_estrada_trunc`)."""
    return PREFIX + _W75_BASE + """
SELECT v.label AS label,
       round(1.0 + coalesce(d2.d, 0) / 2.0 + coalesce(d3.d, 0) / 6.0
             + coalesce(d4.d, 0) / 24.0, 6) AS sc
FROM files f
LEFT JOIN wd2 d2 ON d2.i = f.i
LEFT JOIN wd3 d3 ON d3.i = f.i
LEFT JOIN wd4 d4 ON d4.i = f.i
JOIN verts v ON v.i = f.i
"""


@_materialized
def closed_walks234() -> str:
    """Exact int64 traces tr(A^2..4) (twin of
    `queries.q_closed_walks234`); one row."""
    return PREFIX + _W75_BASE + """
SELECT (SELECT coalesce(sum(d), 0) FROM wd2) AS w2,
       (SELECT coalesce(sum(d), 0) FROM wd3) AS w3,
       (SELECT coalesce(sum(d), 0) FROM wd4) AS w4
"""


# --- wave 76: convergence trace + LM length-quality correlation ------------


@_materialized
def power_trace(iters: int = 8) -> str:
    """Per-iteration Rayleigh quotients r_k = x_k^T A x_k of the power
    chain (twin of `queries.q_power_trace`); iters rows."""
    sql = _w72_power_chain(iters) + f"""
, y{iters + 1} AS (
  SELECT f.i, coalesce(s.sv, 0.0) AS v
  FROM files f LEFT JOIN (
    SELECT u.src AS i, sum(x.v) AS sv
    FROM und u JOIN x{iters} x ON x.i = u.dst GROUP BY u.src
  ) s ON s.i = f.i
)"""
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS iter, "
        f"round((SELECT coalesce(sum(x.v * y.v), 0.0) "
        f"FROM x{k} x JOIN y{k + 1} y ON y.i = x.i), 6) AS rayleigh"
        for k in range(iters))
    return sql + "\n" + rows + "\n"


def lm_len_corr() -> str:
    """Per-language Pearson r of (token count, cross-entropy) (twin of
    `queries.q_lm_len_corr`)."""
    return """
WITH tok AS MATERIALIZED (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
cnt AS MATERIALIZED (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
tot AS (
  SELECT (SELECT count(*) FROM tok) AS n, (SELECT count(*) FROM cnt) AS v
),
doc AS MATERIALIZED (
  SELECT t.doc_id, any_value(t.lang) AS lang,
         CAST(count(*) AS DOUBLE) AS tn,
         avg(-ln((c.c + 1.0) / (tt.n + tt.v))) AS h
  FROM tok t JOIN cnt c ON c.tok = t.tok CROSS JOIN tot tt
  GROUP BY t.doc_id
)
SELECT lang,
       CASE WHEN (count(*) * sum(tn * tn) - sum(tn) * sum(tn))
                 * (count(*) * sum(h * h) - sum(h) * sum(h)) > 0
            THEN round((count(*) * sum(tn * h) - sum(tn) * sum(h))
                       / sqrt((count(*) * sum(tn * tn) - sum(tn) * sum(tn))
                              * (count(*) * sum(h * h) - sum(h) * sum(h))),
                       6)
            ELSE 0.0 END AS r,
       CAST(count(*) AS BIGINT) AS n_docs
FROM doc GROUP BY lang
"""


# --- wave 77: PageRank convergence metrics ----------------------------------


@_materialized
def pagerank_trace(iters: int = 8, damping: float = 0.85) -> str:
    """Per-iteration (dangling mass, L1 delta) of the pagerank chain,
    both scaled by n (twin of `queries.q_pagerank_trace`)."""
    d = damping
    sql = PREFIX + f"""
, outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
r0 AS (SELECT f.i, 1.0 / p.n AS score FROM files f CROSS JOIN params p)
"""
    prev = "r0"
    for k in range(1, iters + 1):
        sql += f"""
, dang{k} AS (
  SELECT coalesce(sum(r.score), 0.0) AS dm FROM {prev} r
  LEFT JOIN outw o ON o.src = r.i WHERE o.src IS NULL
),
contrib{k} AS (
  SELECT e.dst AS i, sum(r.score * e.w / o.ow) AS c
  FROM edges e JOIN {prev} r ON r.i = e.src JOIN outw o ON o.src = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT f.i,
         (1.0 - {d}) / p.n + {d} * (coalesce(c.c, 0.0) + dg.dm / p.n) AS score
  FROM files f CROSS JOIN params p CROSS JOIN dang{k} dg
  LEFT JOIN contrib{k} c ON c.i = f.i
),
dl{k} AS (
  SELECT sum(abs(a.score - b.score)) AS dlt
  FROM r{k} a JOIN {prev} b ON b.i = a.i
)"""
        prev = f"r{k}"
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS iter, "
        f"round((SELECT dm FROM dang{k}) * p.n, 3) AS dmass_n, "
        f"round((SELECT dlt FROM dl{k}) * p.n, 3) AS delta_n "
        f"FROM params p"
        for k in range(1, iters + 1))
    return sql + "\n" + rows + "\n"


# --- wave 78: MCL chaos trace ------------------------------------------------


@_materialized
def mcl_chaos_trace(rounds: int = 2, inflation: float = 2.0,
                    prune: float = 1e-4, select: int = 50) -> str:
    """Per-round MCL chaos over the fixed expand/prune/select/inflate
    recipe (twin of `queries.q_mcl_chaos_trace`): columns are keyed by
    src (the pipeline's column-distributed convention), ranks tie-break
    by dst ASC like the numpy lexsort."""
    sql = PREFIX + f"""
, undm AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
withloops AS (
  SELECT src, dst, 1.0 AS w FROM undm
  UNION ALL
  SELECT i, i, 1.0 FROM files
),
m0 AS (
  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS w
  FROM withloops
)"""
    for k in range(1, rounds + 1):
        sql += f"""
, me{k} AS MATERIALIZED (
  SELECT a.src AS src, b.dst AS dst, sum(a.w * b.w) AS w
  FROM m{k - 1} a JOIN m{k - 1} b ON a.dst = b.src
  GROUP BY a.src, b.dst
),
mn{k} AS (
  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS w FROM me{k}
),
ms{k} AS (
  SELECT src, dst, w FROM (
    SELECT src, dst, w,
           row_number() OVER (PARTITION BY src
                              ORDER BY w DESC, dst ASC) AS rn
    FROM mn{k} WHERE w >= {prune}
  ) WHERE rn <= {select}
),
m{k} AS (
  SELECT src, dst,
         pow(w, {inflation}) / sum(pow(w, {inflation}))
             OVER (PARTITION BY src) AS w
  FROM ms{k}
),
mch{k} AS (
  SELECT max(cm - cs) AS chaos FROM (
    SELECT src, max(w) AS cm, sum(w * w) AS cs FROM m{k} GROUP BY src
  )
)"""
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS round, "
        f"round((SELECT chaos FROM mch{k}), 6) AS chaos"
        for k in range(1, rounds + 1))
    return sql + "\n" + rows + "\n"


# --- wave 79: BFS direction-switch trace -------------------------------------


@_materialized
def bfs_dir_trace(root_label: str = "m_0", iters: int = 12) -> str:
    """Replays the direction-optimizing BFS's per-level Beamer decision
    from the exact level sets (twin of `queries.q_bfs_dir_trace`):
    fedges_l = sum of undirected degrees over the level-l frontier,
    m_rem at decision l+1 = |und| - sum(fedges_0..l), bottomup unless
    fsize*50 < n AND fedges*4 < m_rem. All-integer row set."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
degq AS (SELECT src AS i, count(*) AS d FROM und GROUP BY src),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
, fl AS (
  SELECT CAST(l.dist AS BIGINT) AS l,
         CAST(count(*) AS BIGINT) AS fsize,
         CAST(sum(coalesce(g.d, 0)) AS BIGINT) AS fedges
  FROM {prev} l LEFT JOIN degq g ON g.i = l.i
  GROUP BY l.dist
),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und)
SELECT f.l + 1 AS level, f.fsize, f.fedges,
       mm.m - (SELECT sum(f2.fedges) FROM fl f2 WHERE f2.l <= f.l)
         AS m_rem,
       CASE WHEN f.fsize * 50 < p.n
                 AND f.fedges * 4 < mm.m
                     - (SELECT sum(f2.fedges) FROM fl f2
                        WHERE f2.l <= f.l)
            THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS bottomup
FROM fl f CROSS JOIN mm CROSS JOIN params p
WHERE f.l + 1 <= {iters}
"""
    return sql


# --- wave 80: SSSP relaxation + label-flip traces ----------------------------


@_materialized
def sssp_relax_trace(root_label: str = "m_1", iters: int = 15) -> str:
    """Per-round strict-improvement counts of the Bellman-Ford chain
    (twin of `queries.q_sssp_relax_trace`): improved = newly reached or
    distance lowered; zero-count rounds are filtered (the Ray loop
    exits at the fixpoint)."""
    sql = PREFIX + f"""
, wedges AS (
  SELECT src, dst, CAST(1 + (src + 2 * dst) % 7 AS DOUBLE) AS len FROM edges
),
sd0 AS (SELECT i, CAST(0 AS DOUBLE) AS dist
        FROM verts WHERE label = '{root_label}')
"""
    prev = "sd0"
    for k in range(1, iters + 1):
        sql += f"""
, sd{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS i, dp.dist + e.len AS dist
    FROM wedges e JOIN {prev} dp ON dp.i = e.src
  ) GROUP BY i
),
imp{k} AS (
  SELECT CAST(count(*) AS BIGINT) AS c
  FROM sd{k} a LEFT JOIN {prev} b ON b.i = a.i
  WHERE b.i IS NULL OR a.dist < b.dist
)"""
        prev = f"sd{k}"
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS round, "
        f"(SELECT c FROM imp{k}) AS n_improved"
        for k in range(1, iters + 1))
    return sql + f"""
SELECT round, n_improved FROM (
{rows}
) WHERE n_improved > 0
"""


@_materialized
def labelprop_flip_trace(iters: int = 5, num_classes: int = 10) -> str:
    """Per-round label-flip counts of the LP chain (twin of
    `queries.q_labelprop_flip_trace`)."""
    sql, _ = _labelprop_chain(iters, num_classes)
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS round, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM c{k} a "
        f"JOIN c{k - 1} b ON b.i = a.i WHERE a.cls <> b.cls) AS n_flips"
        for k in range(1, iters + 1))
    return sql + "\n" + rows + "\n"


# --- wave 81: widest/katz convergence traces ---------------------------------


@_materialized
def widest_relax_trace(root_label: str = "m_1", iters: int = 8,
                       inf: int = 1000000000) -> str:
    """Per-round strict-improvement counts of the max-min chain (twin
    of `queries.q_widest_relax_trace`); zero rounds filtered."""
    sql = PREFIX + f"""
, wedges AS (
  SELECT src, dst, CAST(1 + (src + 2 * dst) % 7 AS DOUBLE) AS len FROM edges
),
wb0 AS (SELECT i, CAST({inf} AS DOUBLE) AS wd FROM verts
        WHERE label = '{root_label}')
"""
    prev = "wb0"
    for k in range(1, iters + 1):
        sql += f"""
, wb{k} AS (
  SELECT i, max(wd) AS wd FROM (
    SELECT i, wd FROM {prev}
    UNION ALL
    SELECT e.dst AS i, least(bp.wd, e.len) AS wd
    FROM wedges e JOIN {prev} bp ON bp.i = e.src
  ) GROUP BY i
),
wimp{k} AS (
  SELECT CAST(count(*) AS BIGINT) AS c
  FROM wb{k} a LEFT JOIN {prev} b ON b.i = a.i
  WHERE b.i IS NULL OR a.wd > b.wd
)"""
        prev = f"wb{k}"
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS round, "
        f"(SELECT c FROM wimp{k}) AS n_improved"
        for k in range(1, iters + 1))
    return sql + f"""
SELECT round, n_improved FROM (
{rows}
) WHERE n_improved > 0
"""


@_materialized
def katz_growth_trace(iters: int = 3, alpha: float = 0.125) -> str:
    """Per-iteration sum(x_k) of the dyadic Katz chain (order-free
    exact DOUBLE; twin of `queries.q_katz_growth_trace`)."""
    sql = PREFIX + """
, dpairs AS (SELECT src, dst FROM edges),
kx0 AS (SELECT i, CAST(1 AS DOUBLE) AS x FROM files)
"""
    prev = "kx0"
    for it in range(1, iters + 1):
        sql += f"""
, kx{it} AS (
  SELECT f.i, 1 + {alpha!r} * coalesce(s.s, 0) AS x
  FROM files f LEFT JOIN (
    SELECT e.dst AS i, sum(xp.x) AS s
    FROM dpairs e JOIN {prev} xp ON xp.i = e.src GROUP BY e.dst
  ) s ON s.i = f.i
)"""
        prev = f"kx{it}"
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({it} AS BIGINT) AS iter, "
        f"(SELECT sum(x) FROM kx{it}) AS sum_x"
        for it in range(1, iters + 1))
    return sql + "\n" + rows + "\n"


# --- wave 82: sketch-accuracy audits -----------------------------------------


def hll_audit() -> str:
    """HLL estimate vs exact distinct tokens (twin of
    `queries.q_hll_audit`): identical registers, identical estimator
    (alpha m^2 / sum 2^-r with linear-counting correction)."""
    return """
WITH toks AS MATERIALIZED (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
),
h AS (SELECT md5_number_lower(tok) AS h FROM toks),
parts AS (
  SELECT CAST(h & 255 AS BIGINT) AS b,
         CAST((h >> 8) & ((1::UBIGINT << 52) - 1) AS BIGINT) AS rest
  FROM h
),
rho AS (
  SELECT b, CASE WHEN rest > 0
                 THEN bit_count((rest & (-rest)) - 1) + 1
                 ELSE 53 END AS r
  FROM parts
),
regs AS (SELECT b, CAST(max(r) AS BIGINT) AS r FROM rho GROUP BY b),
full_regs AS (
  SELECT g.b, coalesce(regs.r, 0) AS r
  FROM generate_series(0, 255) g(b) LEFT JOIN regs ON regs.b = g.b
),
stats AS (
  SELECT sum(pow(2.0, -r)) AS denom,
         sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zeros
  FROM full_regs
),
est0 AS (
  SELECT (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 / denom AS e,
         zeros
  FROM stats
),
estf AS (
  SELECT CASE WHEN e <= 2.5 * 256.0 AND zeros > 0
              THEN 256.0 * ln(256.0 / zeros) ELSE e END AS e
  FROM est0
),
ex AS (SELECT CAST(count(*) AS BIGINT) AS exact FROM toks)
SELECT round(estf.e, 6) AS est, ex.exact,
       round((estf.e - ex.exact) / ex.exact, 6) AS rel_err
FROM estf CROSS JOIN ex
"""


def cm_audit(k: int = 10, d: int = 4, w: int = 512) -> str:
    """Count-Min overcount census for the top-k tokens (twin of
    `queries.q_cm_audit`); all-integer columns, same md5-low-64 bucket
    rule as the `countmin` oracle."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
cnt AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
),
hashed AS MATERIALIZED (
  SELECT tok, c, md5_number_lower(tok) AS h FROM cnt
),
sketch AS MATERIALIZED (
  SELECT r.r AS r, CAST((h >> (16 * r.r)) & {w - 1} AS BIGINT) AS b,
         sum(c) AS s
  FROM hashed CROSS JOIN generate_series(0, {d - 1}) r(r)
  GROUP BY 1, 2
),
top AS (
  SELECT tok, c, h FROM hashed ORDER BY c DESC, tok ASC LIMIT {k}
),
est AS (
  SELECT t.tok, t.c, min(sk.s) AS e
  FROM top t CROSS JOIN generate_series(0, {d - 1}) r(r)
  JOIN sketch sk
    ON sk.r = r.r
   AND sk.b = CAST((t.h >> (16 * r.r)) & {w - 1} AS BIGINT)
  GROUP BY t.tok, t.c
)
SELECT tok, c AS exact, CAST(e AS BIGINT) AS est,
       CAST(e - c AS BIGINT) AS overcount
FROM est
"""


# --- wave 83: 2D grid census (partition-layout evidence) ---------------------


def grid_census(g: int) -> str:
    """Replays the 2D owner rule min(i // (n//g), g-1) over the edge
    table (row block by dst, column block by src) over the engine's DENSE ids
    (label-sort ranks, the `vertex_ids` rule) — twin of
    `queries.q_grid_census`."""
    return PREFIX + f"""
, vids AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS vid FROM verts
),
ls AS (SELECT greatest(n // {g}, 1) AS v FROM params)
SELECT least(vd.vid // ls.v, {g - 1}) AS br,
       least(vs.vid // ls.v, {g - 1}) AS bc,
       CAST(count(*) AS BIGINT) AS nnz
FROM edges e
JOIN vids vs ON vs.i = e.src
JOIN vids vd ON vd.i = e.dst
CROSS JOIN ls
GROUP BY 1, 2
"""


# --- wave 84: SpGEMM planning metrics ----------------------------------------


@_materialized
def spgemm_flops() -> str:
    """EstimateFLOP metrics for C = A*A on the undirected structural
    graph (twin of `queries.q_spgemm_flops`): flops = sum deg(k)^2,
    nnz_c = distinct product coordinates, compression = their ratio."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
degq AS (SELECT src AS i, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY src),
fl AS (SELECT CAST(sum(d * d) AS BIGINT) AS flops FROM degq),
nc AS (
  SELECT CAST(count(*) AS BIGINT) AS nnz_c FROM (
    SELECT DISTINCT a.src, b.dst FROM und a JOIN und b ON a.dst = b.src
  )
)
SELECT fl.flops, nc.nnz_c,
       round(CAST(fl.flops AS DOUBLE) / nc.nnz_c, 6) AS compression
FROM fl CROSS JOIN nc
"""


# --- wave 85: MCL prune/select statistics ------------------------------------


@_materialized
def mcl_prune_stats(rounds: int = 2, inflation: float = 2.0,
                    prune: float = 1e-4, select: int = 50) -> str:
    """Per-round expansion/prune/select nonzero counts of the MCL chain
    (twin of `queries.q_mcl_prune_stats`); shares the recipe CTEs of
    the `mcl_chaos_trace` oracle."""
    sql = PREFIX + f"""
, undm AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
withloops AS (
  SELECT src, dst, 1.0 AS w FROM undm
  UNION ALL
  SELECT i, i, 1.0 FROM files
),
m0 AS (
  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS w
  FROM withloops
)"""
    for k in range(1, rounds + 1):
        sql += f"""
, me{k} AS MATERIALIZED (
  SELECT a.src AS src, b.dst AS dst, sum(a.w * b.w) AS w
  FROM m{k - 1} a JOIN m{k - 1} b ON a.dst = b.src
  GROUP BY a.src, b.dst
),
mn{k} AS (
  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS w FROM me{k}
),
ms{k} AS MATERIALIZED (
  SELECT src, dst, w FROM (
    SELECT src, dst, w,
           row_number() OVER (PARTITION BY src
                              ORDER BY w DESC, dst ASC) AS rn
    FROM mn{k} WHERE w >= {prune}
  ) WHERE rn <= {select}
),
m{k} AS (
  SELECT src, dst,
         pow(w, {inflation}) / sum(pow(w, {inflation}))
             OVER (PARTITION BY src) AS w
  FROM ms{k}
)"""
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS round, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM me{k}) AS nnz_expanded, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM mn{k} "
        f"WHERE w >= {prune}) AS nnz_pruned, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM ms{k}) AS nnz_selected"
        for k in range(1, rounds + 1))
    return sql + "\n" + rows + "\n"


@_materialized
def effres_hubs(iters: int = 12, k: int = 4) -> str:
    """Pairwise regularized effective resistance between the top-k
    degree hubs (twin of `queries.q_effres_hubs`): for each rank pair
    (pa < pb), unrolled batched Jacobi rounds of (L + I) x = e_s - e_t,
    r_eff = x_s - x_t rounded 6. The pair dimension rides every CTE so
    all C(k,2) solves unroll in ONE chain (the SQL image of the fused
    SpMM batching)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
degq AS (
  SELECT f.i, CAST(coalesce(d.d, 0) AS DOUBLE) AS d
  FROM files f LEFT JOIN (
    SELECT src AS i, count(*) AS d FROM und GROUP BY src
  ) d ON d.i = f.i
),
S AS (
  SELECT i, rn FROM (
    SELECT i, row_number() OVER (ORDER BY d DESC, i) AS rn FROM degq
  ) WHERE rn <= {k}
),
prs AS (
  SELECT a.rn AS pa, b.rn AS pb, a.i AS s, b.i AS t
  FROM S a JOIN S b ON a.rn < b.rn
),
bvec AS (
  SELECT pa, pb, s AS i, 1.0 AS v FROM prs
  UNION ALL
  SELECT pa, pb, t AS i, -1.0 AS v FROM prs
),
frame AS (SELECT p.pa, p.pb, f.i FROM files f CROSS JOIN prs p),
jx0 AS (SELECT pa, pb, i, 0.0 AS v FROM frame)
"""
    prev = "jx0"
    for r in range(1, iters + 1):
        sql += f"""
, jx{r} AS (
  SELECT fr.pa, fr.pb, fr.i,
         (coalesce(b.v, 0.0) + coalesce(s.sv, 0.0)) / (d.d + 1.0) AS v
  FROM frame fr
  JOIN degq d ON d.i = fr.i
  LEFT JOIN bvec b
    ON b.pa = fr.pa AND b.pb = fr.pb AND b.i = fr.i
  LEFT JOIN (
    SELECT x.pa, x.pb, u.src AS i, sum(x.v) AS sv
    FROM und u JOIN {prev} x ON x.i = u.dst
    GROUP BY 1, 2, 3
  ) s ON s.pa = fr.pa AND s.pb = fr.pb AND s.i = fr.i
)"""
        prev = f"jx{r}"
    sql += f"""
SELECT p.pa AS pa, p.pb AS pb, round(xs.v - xt.v, 6) AS r_eff
FROM prs p
JOIN {prev} xs ON xs.pa = p.pa AND xs.pb = p.pb AND xs.i = p.s
JOIN {prev} xt ON xt.pa = p.pa AND xt.pb = p.pb AND xt.i = p.t
ORDER BY pa, pb
"""
    return sql


def zipf_fit(k: int = 100) -> str:
    """OLS fit of ln(count) on ln(rank) over the top-k token spectrum
    (twin of `queries.q_zipf_fit`); one row (n_tokens, slope,
    intercept, r2), rank by (count DESC, token ASC)."""
    return f"""
WITH tok AS MATERIALIZED (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
tc AS MATERIALIZED (
  SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
),
top AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS r
  FROM tc ORDER BY cnt DESC, tok ASC LIMIT {k}
)
SELECT CAST(count(*) AS BIGINT) AS n_tokens,
       round(coalesce(regr_slope(ln(cnt), ln(r)), 0.0), 6) AS slope,
       round(coalesce(regr_intercept(ln(cnt), ln(r)),
                      avg(ln(cnt))), 6) AS intercept,
       round(coalesce(pow(corr(ln(cnt), ln(r)), 2), 1.0), 6) AS r2
FROM top
"""


@_materialized
def minplus_doubling(k: int = 128, rounds: int = 3) -> str:
    """Min-plus distance-doubling APSP on the top-k-degree induced
    subgraph (twin of `queries.q_minplus_doubling`): unordered-pair
    distance histogram for distances <= 2^rounds, plus a dist = -1 row
    for unreached pairs (only when nonzero)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
degq AS (
  SELECT f.i, coalesce(d.d, 0) AS d
  FROM files f LEFT JOIN (
    SELECT src AS i, count(*) AS d FROM und GROUP BY src
  ) d ON d.i = f.i
),
S AS (
  SELECT i, rn FROM (
    SELECT i, row_number() OVER (ORDER BY d DESC, i) AS rn FROM degq
  ) WHERE rn <= {k}
),
d0 AS (
  SELECT u.src AS i, u.dst AS j, 1 AS d
  FROM und u JOIN S a ON a.i = u.src JOIN S b ON b.i = u.dst
  UNION ALL
  SELECT i, i, 0 FROM S
)
"""
    prev = "d0"
    for r in range(1, rounds + 1):
        sql += f"""
, d{r} AS (
  SELECT i, j, min(d) AS d FROM (
    SELECT i, j, d FROM {prev}
    UNION ALL
    SELECT a.i, b.j, a.d + b.d
    FROM {prev} a JOIN {prev} b ON a.j = b.i
  ) GROUP BY 1, 2
)"""
        prev = f"d{r}"
    sql += f"""
, reach AS (
  SELECT CAST(d AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS pairs
  FROM {prev} WHERE i < j GROUP BY d
),
tot AS (
  SELECT cnt * (cnt - 1) / 2 AS np
  FROM (SELECT count(*) AS cnt FROM S)
)
SELECT dist, pairs FROM reach
UNION ALL
SELECT CAST(-1 AS BIGINT) AS dist,
       CAST(t.np - (SELECT sum(pairs) FROM reach) AS BIGINT) AS pairs
FROM tot t
WHERE t.np - (SELECT sum(pairs) FROM reach) > 0
"""
    return sql


@_materialized
def cheeger_sweep(iters: int = 8, B: int = 64) -> str:
    """Threshold sweep-cut curve over the deflated power vector (twin
    of `queries.q_cheeger_sweep`): per fixed threshold t_b = -1 + 2b/B
    the proper-cut rows (b, thresh, n_in, cut_edges, conductance)."""
    return _w86_deflate_chain(iters) + f"""
, bs AS (SELECT b FROM generate_series(1, {B - 1}) t(b)),
sideq AS (
  SELECT s.b, v.i,
         CASE WHEN round(v.v, 9) <= -1.0 + 2.0 * s.b / {B}
              THEN 1 ELSE 0 END AS s
  FROM dv{iters} v CROSS JOIN bs s
),
degq2 AS (
  SELECT f.i, coalesce(d.d, 0) AS d
  FROM files f LEFT JOIN (
    SELECT src AS i, count(*) AS d FROM und GROUP BY 1
  ) d ON d.i = f.i
),
agg AS (
  SELECT sq.b, sum(sq.s) AS nin, sum(sq.s * d.d) AS vol
  FROM sideq sq JOIN degq2 d ON d.i = sq.i GROUP BY 1
),
cutq AS (
  SELECT a.b, count(*) AS cut
  FROM und u
  JOIN sideq a ON a.i = u.src
  JOIN sideq b2 ON b2.i = u.dst AND b2.b = a.b
  WHERE a.s = 1 AND b2.s = 0
  GROUP BY 1
),
tot AS (SELECT sum(d) AS vt, count(*) AS n FROM degq2)
SELECT a.b AS b, round(-1.0 + 2.0 * a.b / {B}, 6) AS thresh,
       CAST(a.nin AS BIGINT) AS n_in,
       CAST(coalesce(c.cut, 0) AS BIGINT) AS cut_edges,
       round(CASE WHEN least(a.vol, t.vt - a.vol) > 0
                  THEN coalesce(c.cut, 0)
                       / least(a.vol, t.vt - a.vol)
                  ELSE 0.0 END, 6) AS conductance
FROM agg a LEFT JOIN cutq c ON c.b = a.b CROSS JOIN tot t
WHERE a.nin > 0 AND a.nin < t.n
ORDER BY b
"""


@_materialized
def simrank_pairs(c: float = 0.8, k: int = 3) -> str:
    """SimRank S1/S2 between the top-k in-degree hubs (twin of
    `queries.q_simrank_pairs`): S1 from common in-neighbors, S2 the
    full definition sum over I(a) x I(b) with S0 = I."""
    return PREFIX + f"""
, ind AS (
  SELECT f.i, coalesce(d.c, 0) AS d
  FROM files f LEFT JOIN (
    SELECT dst AS i, count(*) AS c FROM edges GROUP BY 1
  ) d ON d.i = f.i
),
S AS (
  SELECT i, rn FROM (
    SELECT i, row_number() OVER (ORDER BY d DESC, i) AS rn FROM ind
  ) WHERE rn <= {k}
),
prs AS (
  SELECT a.rn AS pa, b.rn AS pb, a.i AS a, b.i AS b
  FROM S a JOIN S b ON a.rn < b.rn
),
ia AS (SELECT p.pa, p.pb, e.src AS i FROM edges e JOIN prs p
       ON e.dst = p.a),
ib AS (SELECT p.pa, p.pb, e.src AS j FROM edges e JOIN prs p
       ON e.dst = p.b),
cn AS (
  SELECT e1.dst AS i, e2.dst AS j, count(*) AS c
  FROM edges e1 JOIN edges e2 ON e1.src = e2.src
  GROUP BY 1, 2
),
terms AS (
  SELECT x.pa, x.pb,
         CASE WHEN x.i = y.j THEN 1.0
              WHEN di.d > 0 AND dj.d > 0
              THEN {c} * coalesce(q.c, 0) / (di.d * dj.d)
              ELSE 0.0 END AS s
  FROM ia x
  JOIN ib y ON y.pa = x.pa AND y.pb = x.pb
  JOIN ind di ON di.i = x.i
  JOIN ind dj ON dj.i = y.j
  LEFT JOIN cn q ON q.i = x.i AND q.j = y.j
),
nab AS (
  SELECT x.pa, x.pb, count(*) AS c
  FROM ia x JOIN ib y
    ON y.pa = x.pa AND y.pb = x.pb AND y.j = x.i
  GROUP BY 1, 2
),
tsum AS (SELECT pa, pb, sum(s) AS s FROM terms GROUP BY 1, 2)
SELECT p.pa AS pa, p.pb AS pb,
       round({c} * coalesce(nq.c, 0) / (da.d * db.d), 6) AS s1,
       round({c} * coalesce(ts.s, 0.0) / (da.d * db.d), 6) AS s2
FROM prs p
JOIN ind da ON da.i = p.a
JOIN ind db ON db.i = p.b
LEFT JOIN nab nq ON nq.pa = p.pa AND nq.pb = p.pb
LEFT JOIN tsum ts ON ts.pa = p.pa AND ts.pb = p.pb
ORDER BY pa, pb
"""


def weighted_systematic(k: int = 16) -> str:
    """Weighted systematic sample of orders, probability proportional
    to cents(o_totalprice) (twin of `queries.q_weighted_systematic`):
    thresholds t_j = (2j+1) W / (2k) exact-int against the cumulative
    cents in o_orderkey order."""
    return f"""
WITH oc AS (
  SELECT o_orderkey AS kk,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
cw AS (
  SELECT kk, cents, sum(cents) OVER (ORDER BY kk) AS cum FROM oc
),
tot AS (SELECT sum(cents) AS w FROM oc),
th AS (
  SELECT s.j, (2 * s.j + 1) * t.w // (2 * {k}) AS t
  FROM generate_series(0, {k - 1}) s(j) CROSS JOIN tot t
)
SELECT th.j AS j, c.kk AS o_orderkey, c.cents AS cents
FROM th JOIN cw c ON th.t >= c.cum - c.cents AND th.t < c.cum
ORDER BY j
"""


# --- wave 88: Hutchinson trace, k-truss peel, EWMA daily flags --------------


@_materialized
def hutchinson_trace(P: int = 6) -> str:
    """Per-probe Hutchinson estimates of tr(A^3) with Knuth-hash
    Rademacher signs; exact-int64 chained SpMVs (twin of
    `queries.q_hutchinson_trace`)."""
    return PREFIX + f"""
, und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
z AS (
  SELECT pr.p, f.i,
         CAST(1 - 2 * (((((((((pr.p * pm.n + f.i) % 1048576) * 2654435761
              + ((pr.p * pm.n + f.i) // 1048576) * 40503) % 4294967296)
              % 65536) * 48271
              + ((((pr.p * pm.n + f.i) % 1048576) * 2654435761
              + ((pr.p * pm.n + f.i) // 1048576) * 40503) % 4294967296)
              // 65536) % 4294967296) // 65536) % 2) AS BIGINT) AS v
  FROM generate_series(1, {P}) pr(p) CROSS JOIN files f CROSS JOIN params pm
),
y1 AS (
  SELECT z.p, u.src AS i, CAST(sum(z.v) AS BIGINT) AS v
  FROM und u JOIN z ON z.i = u.dst GROUP BY z.p, u.src
),
y2 AS (
  SELECT y1.p, u.src AS i, CAST(sum(y1.v) AS BIGINT) AS v
  FROM und u JOIN y1 ON y1.i = u.dst GROUP BY y1.p, u.src
),
y3 AS (
  SELECT y2.p, u.src AS i, CAST(sum(y2.v) AS BIGINT) AS v
  FROM und u JOIN y2 ON y2.i = u.dst GROUP BY y2.p, u.src
),
est AS (
  SELECT z.p, CAST(coalesce(sum(z.v * y3.v), 0) AS BIGINT) AS est
  FROM z LEFT JOIN y3 ON y3.p = z.p AND y3.i = z.i GROUP BY z.p
)
SELECT p AS probe, est,
       round(avg(est) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW), 6) AS mean_est
FROM est ORDER BY p
"""


@_materialized
def ktruss_peel(k: int = 4, rounds: int = 3) -> str:
    """Per-round k-truss peel counts: support = common-neighbor count on
    edges, peel support < k-2 (twin of `queries.q_ktruss_peel`)."""
    sql = PREFIX + """
, e0 AS (SELECT src, dst FROM edges WHERE src <> dst
         UNION SELECT dst AS src, src AS dst FROM edges WHERE src <> dst)
"""
    for r in range(1, rounds + 1):
        sql += f"""
, s{r} AS (
  SELECT a.src AS i, b.dst AS j, count(*) AS c
  FROM e{r - 1} a JOIN e{r - 1} b ON a.dst = b.src
  GROUP BY a.src, b.dst
),
e{r} AS (
  SELECT e.src, e.dst
  FROM e{r - 1} e JOIN s{r} s ON s.i = e.src AND s.j = e.dst
  WHERE s.c >= {k - 2}
)"""
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"(SELECT count(*) // 2 FROM e{r - 1}) AS n_edges, "
        f"(SELECT count(*) // 2 FROM e{r}) AS n_survive"
        for r in range(1, rounds + 1))
    return sql + "\n" + rows + "\nORDER BY round\n"


def ewma_daily(num: int = 1, den: int = 4, factor: float = 1.5) -> str:
    """Recursive EWMA over the dense daily event-count axis with dyadic
    alpha = num/den and burst flag (twin of `queries.q_ewma_daily`)."""
    a = num / den
    return f"""
WITH RECURSIVE d0 AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
  FROM events GROUP BY 1
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d0),
axis AS (
  SELECT lo AS day, CAST(0 AS BIGINT) AS t FROM bounds
  UNION ALL
  SELECT a.day + 1, a.t + 1 FROM axis a, bounds b WHERE a.day < b.hi
),
x AS MATERIALIZED (
  SELECT a.day, a.t, coalesce(d0.c, 0) AS c
  FROM axis a LEFT JOIN d0 ON d0.day = a.day
),
rec AS (
  SELECT day, t, c, CAST(c AS DOUBLE) AS s, FALSE AS flag
  FROM x WHERE t = 0
  UNION ALL
  SELECT x.day, x.t, x.c,
         {a!r} * x.c + {1.0 - a!r} * r.s,
         x.c > {factor!r} * r.s
  FROM rec r JOIN x ON x.t = r.t + 1
)
SELECT day, CAST(c AS BIGINT) AS cnt,
       CAST(floor(s * 1000000 + 0.5) AS BIGINT) AS ewma_u, flag
FROM rec ORDER BY day
"""


# --- wave 89: bow-tie census, 4-clique count, CUSUM drift flags -------------


def bowtie_census() -> str:
    """CORE/IN/OUT/OTHER bow-tie census pivoted on the top-degree hub,
    with forward/backward reach as recursive closures (exact fixpoint —
    twin of `queries.q_bowtie_census`). Recursive CTEs cannot take the
    MATERIALIZED hint, so only the prefix/prep CTEs are materialized."""
    pre = re.sub(r"\bAS \(", "AS MATERIALIZED (", PREFIX).replace(
        "WITH params", "WITH RECURSIVE params", 1)
    return pre + """
, und AS MATERIALIZED (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS MATERIALIZED (SELECT src AS i, count(*) AS d FROM und GROUP BY 1),
pv AS MATERIALIZED (
  SELECT i FROM deg ORDER BY d DESC, i LIMIT 1
),
fwd AS (
  SELECT i FROM pv
  UNION
  SELECT e.dst AS i FROM edges e JOIN fwd r ON r.i = e.src
),
bwd AS (
  SELECT i FROM pv
  UNION
  SELECT e.src AS i FROM edges e JOIN bwd r ON r.i = e.dst
),
cls AS MATERIALIZED (
  SELECT v.i, (f.i IS NOT NULL) AS in_f, (b.i IS NOT NULL) AS in_b
  FROM files v LEFT JOIN fwd f ON f.i = v.i
               LEFT JOIN bwd b ON b.i = v.i
)
SELECT CAST(sum(CASE WHEN in_f AND in_b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_core,
       CAST(sum(CASE WHEN in_b AND NOT in_f THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in,
       CAST(sum(CASE WHEN in_f AND NOT in_b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_out,
       CAST(sum(CASE WHEN NOT in_f AND NOT in_b THEN 1 ELSE 0 END)
            AS BIGINT) AS n_other
FROM cls
"""


@_materialized
def k4_count() -> str:
    """Triangle / triangle-pair / K4 counts via the shared-lowest-edge
    triangle join (twin of `queries.q_k4_count`). n_triangles and n_k4
    are id-space invariant, but n_tri_pairs groups triangles by their
    LOWEST edge, which depends on the vertex total order — so the
    oracle maps into dense label-rank ids, the Ray side's order."""
    return PREFIX + """
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d FROM verts
),
de AS (
  SELECT ds.d AS src, dd.d AS dst
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
),
und AS (
  SELECT src, dst FROM de UNION SELECT dst, src FROM de
),
adj AS (SELECT src AS a, dst AS b FROM und WHERE src < dst),
tri AS (
  SELECT e1.a AS a, e1.b AS m, e2.b AS c
  FROM adj e1
  JOIN adj e2 ON e2.a = e1.b
  JOIN adj e3 ON e3.a = e1.a AND e3.b = e2.b
),
pairs AS (
  SELECT t1.c AS c1, t2.c AS c2
  FROM tri t1 JOIN tri t2 ON t1.a = t2.a AND t1.m = t2.m AND t1.c < t2.c
)
SELECT (SELECT count(*) FROM tri) AS n_triangles,
       (SELECT count(*) FROM pairs) AS n_tri_pairs,
       (SELECT count(*) FROM pairs p
        JOIN adj e ON e.a = p.c1 AND e.b = p.c2) AS n_k4
"""


def cusum_flags(mult: int = 2) -> str:
    """Integer one-sided Page CUSUM over the dense daily event-count
    axis (twin of `queries.q_cusum_flags`)."""
    return f"""
WITH RECURSIVE d0 AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
  FROM events GROUP BY 1
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d0),
axis AS (
  SELECT lo AS day, CAST(0 AS BIGINT) AS t FROM bounds
  UNION ALL
  SELECT a.day + 1, a.t + 1 FROM axis a, bounds b WHERE a.day < b.hi
),
x AS MATERIALIZED (
  SELECT a.day, a.t, coalesce(d0.c, 0) AS c
  FROM axis a LEFT JOIN d0 ON d0.day = a.day
),
kk AS MATERIALIZED (
  SELECT CAST(sum(c) // count(*) AS BIGINT) AS k FROM x
),
rec AS (
  SELECT day, t, c,
         greatest(CAST(0 AS BIGINT), CAST(c - k.k AS BIGINT)) AS s
  FROM x, kk k WHERE t = 0
  UNION ALL
  SELECT x.day, x.t, x.c,
         greatest(CAST(0 AS BIGINT), CAST(r.s + x.c - k.k AS BIGINT))
  FROM rec r JOIN x ON x.t = r.t + 1, kk k
)
SELECT day, CAST(c AS BIGINT) AS cnt, s AS cusum,
       s > {mult} * k.k AS flag
FROM rec, kk k ORDER BY day
"""


# --- wave 90: Steiner 2-approx, mutual-NN pairs, snowball census ------------


@_materialized
def steiner_approx(k: int = 4, iters: int = 12) -> str:
    """Metric-closure MST over the top-k hub terminals: rank-rooted
    min-plus BFS chain + unrolled Prim with the (dist, rank_a, rank_b)
    tie-break (twin of `queries.q_steiner_approx`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, count(*) AS d FROM und GROUP BY 1),
S AS (
  SELECT i, rn FROM (
    SELECT i, row_number() OVER (ORDER BY d DESC, i) AS rn FROM deg
  ) WHERE rn <= {k}
),
d0 AS (SELECT rn AS r, i, 0 AS dist FROM S)
"""
    prev = "d0"
    for x in range(1, iters + 1):
        sql += f"""
, d{x} AS (
  SELECT r, i, min(dist) AS dist FROM (
    SELECT r, i, dist FROM {prev}
    UNION ALL
    SELECT dp.r, u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY 1, 2
)"""
        prev = f"d{x}"
    sql += f"""
, h AS (
  SELECT d.r AS ta, t.rn AS tb, min(d.dist) AS d
  FROM {prev} d JOIN S t ON t.i = d.i WHERE d.r <> t.rn GROUP BY 1, 2
),
tr0 AS (SELECT 1 AS t)"""
    for s in range(1, k):
        sql += f"""
, p{s} AS (
  SELECT ta, tb, d FROM h
  WHERE ta IN (SELECT t FROM tr{s - 1})
    AND tb NOT IN (SELECT t FROM tr{s - 1})
  ORDER BY d, ta, tb LIMIT 1
),
tr{s} AS (SELECT t FROM tr{s - 1} UNION ALL SELECT tb FROM p{s})"""
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({s} AS BIGINT) AS step, CAST(ta AS BIGINT) AS ta, "
        f"CAST(tb AS BIGINT) AS tb, CAST(d AS BIGINT) AS dist FROM p{s}"
        for s in range(1, k))
    return sql + "\n" + rows + "\nORDER BY step\n"


def mutual_nn() -> str:
    """Mutual cosine top-1 pairs over the embedding table (twin of
    `queries.q_mutual_nn`; ties by neighbor id)."""
    return """
WITH sims AS MATERIALIZED (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
top1 AS MATERIALIZED (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY sim DESC, nid ASC) AS rn
    FROM sims
  ) WHERE rn = 1
)
SELECT t1.qid AS a, t1.nid AS b
FROM top1 t1 JOIN top1 t2 ON t2.qid = t1.nid AND t2.nid = t1.qid
WHERE t1.qid < t1.nid
"""


@_materialized
def snowball_census(rounds: int = 2, fan: int = 3) -> str:
    """Deterministic snowball sample from the top-degree hub: each
    frontier vertex names its `fan` smallest-id structural neighbors
    (id = arith on both twins), unrolled `rounds` rounds (twin of
    `queries.q_snowball_census`)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, count(*) AS d FROM und GROUP BY 1),
pv AS (SELECT i FROM deg ORDER BY d DESC, i LIMIT 1),
s0 AS (SELECT i, 0 AS rnd FROM pv),
f0 AS (SELECT i FROM pv)
"""
    for r in range(1, rounds + 1):
        sql += f"""
, cand{r} AS (
  SELECT u.src, u.dst,
         row_number() OVER (PARTITION BY u.src ORDER BY u.dst) AS rn
  FROM und u WHERE u.src IN (SELECT i FROM f{r - 1})
),
new{r} AS (
  SELECT DISTINCT dst AS i FROM cand{r}
  WHERE rn <= {fan} AND dst NOT IN (SELECT i FROM s{r - 1})
),
s{r} AS (SELECT i, rnd FROM s{r - 1}
         UNION ALL SELECT i, {r} AS rnd FROM new{r}),
f{r} AS (SELECT i FROM new{r})"""
    sql += f"""
SELECT v.label AS label, CAST(s.rnd AS BIGINT) AS round
FROM s{rounds} s JOIN verts v ON v.i = s.i
"""
    return sql


# --- wave 91: hub walk returns, threshold cascade, Holt trend ---------------


@_materialized
def hub_walk_returns(t_max: int = 6) -> str:
    """Exact closed-walk counts (A^t)[hub,hub] at the top-degree hub
    (twin of `queries.q_hub_walk_returns`)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, count(*) AS d FROM und GROUP BY 1),
pv AS (SELECT i FROM deg ORDER BY d DESC, i LIMIT 1),
w0 AS (SELECT i, CAST(1 AS BIGINT) AS c FROM pv)
"""
    for t in range(1, t_max + 1):
        sql += f"""
, w{t} AS (
  SELECT u.dst AS i, CAST(sum(w.c) AS BIGINT) AS c
  FROM und u JOIN w{t - 1} w ON w.i = u.src GROUP BY 1
)"""
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS t, CAST(coalesce("
        f"(SELECT w.c FROM w{t} w, pv p WHERE w.i = p.i), 0) AS BIGINT)"
        f" AS walks"
        for t in range(1, t_max + 1))
    return sql + "\n" + rows + "\nORDER BY t\n"


@_materialized
def threshold_cascade(mod: int = 17, theta: int = 2,
                      rounds: int = 4) -> str:
    """Bootstrap-percolation active counts per synchronous round (twin
    of `queries.q_threshold_cascade`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
a0 AS (SELECT i FROM files WHERE i % {mod} = 0)
"""
    for r in range(1, rounds + 1):
        sql += f"""
, y{r} AS (
  SELECT u.dst AS j, count(*) AS c
  FROM und u JOIN a{r - 1} w ON w.i = u.src GROUP BY 1
),
a{r} AS (
  SELECT i FROM a{r - 1}
  UNION
  SELECT j AS i FROM y{r} WHERE c >= {theta}
)"""
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"(SELECT count(*) FROM a{r}) AS n_active"
        for r in range(rounds + 1))
    return sql + "\n" + rows + "\nORDER BY round\n"


def holt_trend(a_num: int = 1, a_den: int = 2,
               b_num: int = 1, b_den: int = 4) -> str:
    """Holt double-exponential smoothing over the dense daily axis with
    dyadic gains (twin of `queries.q_holt_trend`). The recursive step
    recomputes the new level inline for the trend update — the same
    double expression twice is bit-identical, matching numpy's use of
    the stored value."""
    a = a_num / a_den
    be = b_num / b_den
    newl = f"{a!r} * x.c + {1.0 - a!r} * (r.l + r.b)"
    return f"""
WITH RECURSIVE d0 AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
  FROM events GROUP BY 1
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d0),
axis AS (
  SELECT lo AS day, CAST(0 AS BIGINT) AS t FROM bounds
  UNION ALL
  SELECT a.day + 1, a.t + 1 FROM axis a, bounds b WHERE a.day < b.hi
),
x AS MATERIALIZED (
  SELECT a.day, a.t, coalesce(d0.c, 0) AS c
  FROM axis a LEFT JOIN d0 ON d0.day = a.day
),
rec AS (
  SELECT day, t, c, CAST(c AS DOUBLE) AS l,
         CAST(coalesce((SELECT c FROM x WHERE t = 1), c) - c AS DOUBLE)
           AS b
  FROM x WHERE t = 0
  UNION ALL
  SELECT x.day, x.t, x.c,
         {newl},
         {be!r} * (({newl}) - r.l) + {1.0 - be!r} * r.b
  FROM rec r JOIN x ON x.t = r.t + 1
)
SELECT day, CAST(c AS BIGINT) AS cnt,
       CAST(floor(l * 1000000 + 0.5) AS BIGINT) AS level_u,
       CAST(floor(b * 1000000 + 0.5) AS BIGINT) AS trend_u
FROM rec ORDER BY day
"""


def bm25_topk(k: int = 15, qk: int = 3, scale: int = 1_000) -> str:
    """Integer-rational BM25 top-k (twin of `text.bm25_topk`): query =
    top-`qk` DF tokens, idf_u = (N*scale)//df, tf factor in milli-units
    via the exact k1=1.2 / b=0.75 fraction (22000*tf*S)//(10*S*tf +
    3*S + 9*dl*N)."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
flat AS MATERIALIZED (
  SELECT doc_id, unnest(t) AS tok FROM toks
),
tf AS MATERIALIZED (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM flat GROUP BY doc_id, tok
),
df AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
dl AS MATERIALIZED (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
),
s AS (SELECT CAST(sum(dl) AS BIGINT) AS s FROM dl),
q AS (SELECT tok, df FROM df ORDER BY df DESC, tok ASC LIMIT {qk}),
scored AS (
  SELECT tf.doc_id,
         ((n.n * {scale}) // q.df) * ((22000 * tf.tf * s.s) //
           (10 * s.s * tf.tf + 3 * s.s + 9 * dl.dl * n.n)) AS part
  FROM tf JOIN q USING (tok)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN n CROSS JOIN s
),
agg AS (SELECT doc_id, CAST(sum(part) AS BIGINT) AS score_u
        FROM scored GROUP BY doc_id)
SELECT doc_id, score_u FROM agg WHERE score_u > 0
ORDER BY score_u DESC, doc_id ASC LIMIT {k}
"""


@_materialized
def nbt_trace(t_max: int = 6) -> str:
    """Non-backtracking walk totals via the vertex-space Hashimoto
    recurrence p2 = A p1 - D p0, pk = A p_{k-1} - (D-I) p_{k-2} (twin
    of `queries.q_nbt_trace`)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
degt AS (SELECT src AS i, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY 1),
deg AS (
  SELECT f.i, coalesce(degt.d, 0) AS d
  FROM files f LEFT JOIN degt ON degt.i = f.i
),
p0 AS (SELECT i, CAST(1 AS BIGINT) AS c FROM files),
p1 AS (SELECT i, d AS c FROM deg)
"""
    for k in range(2, t_max + 1):
        coef = "dg.d" if k == 2 else "(dg.d - 1)"
        sql += f"""
, p{k} AS (
  SELECT dg.i, coalesce(a.s, 0) - {coef} * q.c AS c
  FROM deg dg
  JOIN p{k - 2} q ON q.i = dg.i
  LEFT JOIN (
    SELECT u.dst AS i, sum(p.c) AS s
    FROM und u JOIN p{k - 1} p ON p.i = u.src GROUP BY 1
  ) a ON a.i = dg.i
)"""
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS k, "
        f"CAST((SELECT sum(c) FROM p{k}) AS BIGINT) AS walks"
        for k in range(1, t_max + 1))
    return sql + "\n" + rows + "\nORDER BY k\n"


TRI_ID_CTE = """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
adj AS (SELECT src AS a, dst AS b FROM und WHERE src < dst),
tri AS (
  SELECT e1.a AS a, e1.b AS m, e2.b AS c
  FROM adj e1
  JOIN adj e2 ON e2.a = e1.b
  JOIN adj e3 ON e3.a = e1.a AND e3.b = e2.b
)"""


@_materialized
def diamond_count() -> str:
    """Diamonds = sum over edges of C(triangle-support, 2) (twin of
    `queries.q_diamond_count`)."""
    return PREFIX + TRI_ID_CTE + """
, te AS (
  SELECT a AS u, m AS v FROM tri
  UNION ALL SELECT a, c FROM tri
  UNION ALL SELECT m, c FROM tri
),
sup AS (SELECT u, v, CAST(count(*) AS BIGINT) AS s FROM te GROUP BY u, v)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles,
       CAST(count(*) AS BIGINT) AS n_sup_edges,
       CAST(coalesce(sum(s * (s - 1) // 2), 0) AS BIGINT) AS n_diamonds,
       CAST(coalesce(max(s), 0) AS BIGINT) AS max_support
FROM sup
"""


@_materialized
def tailed_triangles() -> str:
    """Paw census sum_v t_v * (d_v - 2) (twin of
    `queries.q_tailed_triangles`)."""
    return PREFIX + TRI_ID_CTE + """
, tv AS (
  SELECT a AS v FROM tri
  UNION ALL SELECT m FROM tri
  UNION ALL SELECT c FROM tri
),
tc AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM tv GROUP BY v),
degt AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS d
         FROM und GROUP BY 1)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles,
       CAST(coalesce(sum(tc.t * (degt.d - 2)), 0) AS BIGINT) AS n_tailed
FROM tc JOIN degt USING (v)
"""


DAILY_AXIS_CTE = """
WITH RECURSIVE d0 AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
  FROM events GROUP BY 1
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d0),
axis AS (
  SELECT lo AS day, CAST(0 AS BIGINT) AS t FROM bounds
  UNION ALL
  SELECT a.day + 1, a.t + 1 FROM axis a, bounds b WHERE a.day < b.hi
),
x AS MATERIALIZED (
  SELECT a.day, a.t, CAST(coalesce(d0.c, 0) AS BIGINT) AS c
  FROM axis a LEFT JOIN d0 ON d0.day = a.day
)"""


def mann_kendall() -> str:
    """Mann-Kendall S + tie-corrected 18*Var(S) over the dense daily
    axis (twin of `queries.q_mann_kendall`)."""
    return DAILY_AXIS_CTE + """
, pairs AS (
  SELECT CAST(sign(j.c - i.c) AS BIGINT) AS sg
  FROM x i JOIN x j ON j.t > i.t
),
ties AS (SELECT CAST(count(*) AS BIGINT) AS t FROM x GROUP BY c),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x)
SELECT n.n AS n_days,
       (SELECT CAST(coalesce(sum(sg), 0) AS BIGINT) FROM pairs) AS s_stat,
       CAST(n.n * (n.n - 1) * (2 * n.n + 5)
            - coalesce((SELECT sum(t * (t - 1) * (2 * t + 5)) FROM ties),
                       0) AS BIGINT) AS var18
FROM n
"""


def theil_sen() -> str:
    """Theil-Sen slope as an exact reduced fraction: median of pairwise
    slopes, even medians averaged exactly (twin of
    `queries.q_theil_sen`). Pair slopes order exactly under DOUBLE
    division (small-integer numerators/denominators are well separated
    beyond 2^-53); the median itself stays integer-rational."""
    return DAILY_AXIS_CTE + """
, sl AS (
  SELECT j.c - i.c AS num, j.t - i.t AS den
  FROM x i JOIN x j ON j.t > i.t
),
rnk AS (
  SELECT num, den, row_number() OVER (
    ORDER BY CAST(num AS DOUBLE) / den, num, den) AS rn,
    count(*) OVER () AS cnt
  FROM sl
),
m1 AS (SELECT num AS n1, den AS d1 FROM rnk WHERE rn = (cnt + 1) // 2),
m2 AS (SELECT num AS n2, den AS d2 FROM rnk WHERE rn = (cnt + 2) // 2),
med AS (
  SELECT (SELECT cnt FROM rnk LIMIT 1) AS n_pairs,
         n1 * d2 + n2 * d1 AS num, 2 * d1 * d2 AS den
  FROM m1, m2
)
SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(CASE WHEN num = 0 THEN 0
                 ELSE num // gcd(abs(num), den) END AS BIGINT)
         AS slope_num,
       CAST(CASE WHEN num = 0 THEN 1
                 ELSE den // gcd(abs(num), den) END AS BIGINT)
         AS slope_den
FROM med
"""


def runs_test() -> str:
    """Wald-Wolfowitz runs statistics against the discrete median of
    the daily counts (twin of `queries.q_runs_test`; equal-to-median
    days dropped)."""
    return DAILY_AXIS_CTE + """
, med AS (SELECT quantile_disc(c, 0.5) AS m FROM x),
s AS (
  SELECT t, c > m.m AS sgn
  FROM x, med m WHERE c <> m.m
),
runs AS (
  SELECT sgn, lag(sgn) OVER (ORDER BY t) AS prev FROM s
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM s WHERE sgn) AS n_plus,
       (SELECT CAST(count(*) AS BIGINT) FROM s WHERE NOT sgn) AS n_minus,
       (SELECT CAST(coalesce(sum(CASE WHEN prev IS NULL
                                      OR sgn <> prev THEN 1
                                      ELSE 0 END), 0) AS BIGINT)
        FROM runs) AS n_runs,
       (SELECT CAST(m AS BIGINT) FROM med) AS median_cnt
"""


def winnow_stats(k: int = 3, w: int = 4) -> str:
    """Winnowing fingerprint census twin of `queries.q_winnow_stats`:
    md5 k-gram hashes mod 2^61, per-doc window-min selection (short
    docs select their global min), distinct-set count + XOR."""
    p = 1 << 61
    gram = " || ' ' || ".join(
        "t[i]" if j == 0 else f"t[i+{j}]" for j in range(k))
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
kg AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - {k - 2}), i ->
           {{'i': i,
             'h': CAST(md5_number_lower({gram}) % {p} AS BIGINT)}})) AS u
  FROM toks WHERE len(t) >= {k}
),
kh AS (SELECT doc_id, u.i AS i, u.h AS h FROM kg),
win AS (
  SELECT doc_id, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
           AS mh,
         count(*) OVER (PARTITION BY doc_id) AS ng
  FROM kh
),
sel AS (SELECT DISTINCT doc_id, mh FROM win
        WHERE i <= greatest(ng - {w} + 1, 1)),
fps AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
         CAST(bit_xor(mh) AS BIGINT) AS fp_xor
  FROM sel GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(greatest(len(string_split(d.text, ' ')) - {k - 1}, 0)
            AS BIGINT) AS n_kgrams,
       CAST(coalesce(f.n_fps, 0) AS BIGINT) AS n_fps,
       CAST(coalesce(f.fp_xor, 0) AS BIGINT) AS fp_xor
FROM documents d LEFT JOIN fps f ON f.doc_id = d.doc_id
"""


def heavy_hitters(k: int = 64) -> str:
    """Exact frequent items cnt * k > m (twin of
    `queries.q_heavy_hitters`; the Ray side's Misra-Gries prefilter is
    an internal optimization with a lossless guarantee)."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM toks)
SELECT tok, CAST(count(*) AS BIGINT) AS cnt
FROM toks, m GROUP BY tok, m.m HAVING count(*) * {k} > m.m
"""


def daily_xcorr(max_lag: int = 3) -> str:
    """Integer lag co-moments between the two busiest event types'
    daily series (twin of `queries.q_daily_xcorr`)."""
    return f"""
WITH RECURSIVE d0 AS (
  SELECT event_type AS et, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
tot AS (SELECT et, sum(c) AS s FROM d0 GROUP BY et),
t2 AS (SELECT et, row_number() OVER (ORDER BY s DESC, et ASC) AS rn
       FROM tot),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d0),
axis AS (
  SELECT lo AS day, CAST(0 AS BIGINT) AS t FROM bounds
  UNION ALL
  SELECT a.day + 1, a.t + 1 FROM axis a, bounds b WHERE a.day < b.hi
),
x AS MATERIALIZED (
  SELECT a.t, coalesce(d.c, 0) AS c
  FROM axis a LEFT JOIN (
    SELECT day, c FROM d0 JOIN t2 USING (et) WHERE rn = 1
  ) d ON d.day = a.day
),
y AS MATERIALIZED (
  SELECT a.t, coalesce(d.c, 0) AS c
  FROM axis a LEFT JOIN (
    SELECT day, c FROM d0 JOIN t2 USING (et) WHERE rn = 2
  ) d ON d.day = a.day
),
lags AS (SELECT unnest(generate_series(0, {max_lag})) AS lag)
SELECT CAST(l.lag AS BIGINT) AS lag,
       CAST((SELECT count(*) FROM x) - l.lag AS BIGINT) AS n_terms,
       (SELECT CAST(coalesce(sum(x.c * y.c), 0) AS BIGINT)
        FROM x JOIN y ON y.t = x.t + l.lag) AS sxy,
       (SELECT CAST(coalesce(sum(y.c * x.c), 0) AS BIGINT)
        FROM y JOIN x ON x.t = y.t + l.lag) AS syx,
       (SELECT et FROM t2 WHERE rn = 1) AS tx,
       (SELECT et FROM t2 WHERE rn = 2) AS ty
FROM lags l ORDER BY lag
"""


def lev2_pairs() -> str:
    """Levenshtein-exactly-2 vocabulary pairs (twin of
    `queries.q_lev2_pairs`; the oracle brute-forces levenshtein over
    the V^2 grid, the Ray side blocks with depth-2 SymSpell)."""
    return """
WITH t AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
  UNION
  SELECT DISTINCT unnest(string_split(p_name, ' ')) FROM part
)
SELECT a.tok AS wa, b.tok AS wb
FROM t a JOIN t b ON a.tok < b.tok AND levenshtein(a.tok, b.tok) = 2
"""


def dow_seasonal() -> str:
    """Day-of-week seasonal sufficient statistics over the dense daily
    axis (twin of `queries.q_dow_seasonal`)."""
    return DAILY_AXIS_CTE + """
SELECT CAST((day + 4) % 7 AS BIGINT) AS dow,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(c) AS BIGINT) AS sum_cnt,
       CAST(min(c) AS BIGINT) AS min_cnt,
       CAST(max(c) AS BIGINT) AS max_cnt
FROM x GROUP BY 1
"""


@_materialized
def attack_curve(h: int = 4, iters: int = 12) -> str:
    """Hub-removal robustness curve (twin of `queries.q_attack_curve`):
    per removal count j, `iters` unrolled min-label rounds over the
    induced subgraph in LABEL-string order (lexicographic label rank ==
    the Ray side's dense-id order)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
degt AS (SELECT src AS i, CAST(count(*) AS BIGINT) AS d
         FROM und GROUP BY 1),
degall AS (
  SELECT f.i, coalesce(degt.d, 0) AS d
  FROM files f LEFT JOIN degt ON degt.i = f.i
),
hubs AS (
  SELECT i, row_number() OVER (ORDER BY d DESC, i ASC) AS rk
  FROM degall
)"""
    parts = []
    for j in range(h + 1):
        sql += f"""
, k{j} AS (SELECT v.i, v.label FROM verts v
           WHERE v.i NOT IN (SELECT i FROM hubs WHERE rk <= {j})),
u{j} AS (
  SELECT u.src, u.dst FROM und u
  JOIN k{j} a ON a.i = u.src JOIN k{j} b ON b.i = u.dst
),
a{j}l0 AS (SELECT i, label AS comp FROM k{j})
"""
        prev = f"a{j}l0"
        for r in range(1, iters + 1):
            sql += f"""
, a{j}l{r} AS (
  SELECT v.i, least(l.comp, coalesce(m.mn, l.comp)) AS comp
  FROM k{j} v JOIN {prev} l ON l.i = v.i
  LEFT JOIN (
    SELECT u.dst AS i, min(lp.comp) AS mn
    FROM u{j} u JOIN {prev} lp ON lp.i = u.src GROUP BY u.dst
  ) m ON m.i = v.i
)"""
            prev = f"a{j}l{r}"
        parts.append(f"""
SELECT CAST({j} AS BIGINT) AS n_removed,
       CAST((SELECT count(*) FROM k{j}) AS BIGINT) AS n_kept,
       CAST(count(DISTINCT comp) AS BIGINT) AS n_components,
       CAST((SELECT max(cc) FROM (
         SELECT count(*) AS cc FROM {prev} GROUP BY comp)) AS BIGINT)
         AS lcc_size
FROM {prev}""")
    return sql + "\nUNION ALL\n".join(parts)


def _bpe_chain(rounds: int, join: str) -> str:
    """Shared BPE round chain: padded double-space representation (each
    symbol owns its leading/trailing space) makes plain left-to-right
    replace() exactly the greedy non-overlapping BPE merge rule."""
    sql = """
WITH s0 AS MATERIALIZED (
  SELECT doc_id, ' ' || replace(text, ' ', '  ') || ' ' AS s
  FROM documents
)"""
    for r in range(rounds):
        sql += f"""
, t{r} AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(s), ' +') AS t FROM s{r}
),
p{r} AS MATERIALIZED (
  SELECT u.a AS a, u.b AS b, count(*) AS c FROM (
    SELECT unnest(list_transform(range(1, len(t)), i ->
      {{'a': t[i], 'b': t[i+1]}})) AS u
    FROM t{r} WHERE len(t) >= 2
  ) GROUP BY 1, 2
),
m{r} AS MATERIALIZED (
  SELECT a, b, CAST(c AS BIGINT) AS c FROM p{r}
  ORDER BY c DESC, a ASC, b ASC LIMIT 1
),
s{r + 1} AS MATERIALIZED (
  SELECT x.doc_id,
         replace(x.s, ' ' || m.a || '  ' || m.b || ' ',
                 ' ' || m.a || '{join}' || m.b || ' ') AS s
  FROM s{r} x, m{r} m
)"""
    sql += f"""
, t{rounds} AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(s), ' +') AS t FROM s{rounds}
)"""
    return sql


def bpe_merges(rounds: int = 4, join: str = "+") -> str:
    """BPE merge trace (twin of `queries.q_bpe_merges`)."""
    parts = [
        f"SELECT CAST({r + 1} AS BIGINT) AS round, m{r}.a AS sym_a, "
        f"m{r}.b AS sym_b, m{r}.c AS pair_count, "
        f"(SELECT CAST(sum(len(t)) AS BIGINT) FROM t{r + 1}) "
        f"AS syms_after FROM m{r}"
        for r in range(rounds)
    ]
    return _bpe_chain(rounds, join) + "\n" + "\nUNION ALL\n".join(parts) \
        + "\nORDER BY round\n"


def bpe_doc_stats(rounds: int = 4, join: str = "+") -> str:
    """Per-doc symbol counts before/after the trained merges (twin of
    `queries.q_bpe_doc_stats`)."""
    return _bpe_chain(rounds, join) + f"""
SELECT b.doc_id, CAST(len(b.t) AS BIGINT) AS n_before,
       CAST(len(a.t) AS BIGINT) AS n_after
FROM t0 b JOIN t{rounds} a ON a.doc_id = b.doc_id
"""


def vocab_coverage(js=(1, 2, 4, 8, 16, 32)) -> str:
    """Zipf coverage curve (twin of `queries.q_vocab_coverage`)."""
    lst = ", ".join(str(j) for j in js)
    return f"""
WITH f AS MATERIALIZED (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY tok
),
rk AS MATERIALIZED (
  SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rn FROM tf
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS m FROM tf),
js AS (SELECT unnest([{lst}]) AS j)
SELECT CAST(j AS BIGINT) AS j,
       (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM rk
        WHERE rn <= j) AS covered,
       tot.m AS total
FROM js, tot ORDER BY j
"""


def _mix64_sql(col: str) -> str:
    """splitmix64 of UBIGINT column expr `col`, bit-exact vs
    `shuffle._mix64` (32-bit split multiplies mod 2^64)."""
    m64 = 18446744073709551616

    def mul(z, m):
        return (f"CAST(((((CAST({z} AS HUGEINT) >> 32) * {m}) "
                f"% 4294967296) * 4294967296 + "
                f"(CAST({z} AS HUGEINT) % 4294967296) * {m}) "
                f"% {m64} AS UBIGINT)")

    z1 = (f"CAST((CAST({col} AS HUGEINT) + 11400714819323198485) "
          f"% {m64} AS UBIGINT)")
    z2 = mul(f"xor({z1}, ({z1}) >> 30)", 13787848793156543929)
    z3 = mul(f"xor({z2}, ({z2}) >> 27)", 10723151780598845931)
    return f"xor({z3}, ({z3}) >> 31)"


def route_balance(g: int = 32) -> str:
    """Per-bucket row counts of the engine's double-splitmix64 router
    on l_orderkey (twin of `queries.q_route_balance`: bucket =
    (mix64(mix64(key)) >> 33) % g)."""
    inner = _mix64_sql("CAST(l_orderkey AS UBIGINT)")
    outer = _mix64_sql(f"h")
    return f"""
WITH h1 AS (SELECT {inner} AS h FROM lineitem),
h2 AS (SELECT {outer} AS h FROM h1)
SELECT CAST((h >> 33) % {g} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS rows
FROM h2 GROUP BY 1
"""


def table_profile(tables: dict) -> str:
    """Null / exact-distinct census per column (twin of
    `queries.q_table_profile`)."""
    parts = []
    for tbl, cols in tables.items():
        for c in cols:
            parts.append(f"""
SELECT '{tbl}' AS tbl, '{c}' AS col,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM {tbl}""")
    return "\nUNION ALL\n".join(parts)


@_materialized
def ball2_jaccard() -> str:
    """Distance-<=2 ball sizes and intersections of the top-3 hubs
    (twin of `queries.q_ball2_jaccard`)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
degt AS (SELECT src AS i, CAST(count(*) AS BIGINT) AS d
         FROM und GROUP BY 1),
degall AS (
  SELECT f.i, coalesce(degt.d, 0) AS d
  FROM files f LEFT JOIN degt ON degt.i = f.i
),
hub3 AS (
  SELECT i, rk FROM (
    SELECT i, row_number() OVER (ORDER BY d DESC, i ASC) AS rk
    FROM degall
  ) WHERE rk <= 3
),
b1 AS (
  SELECT DISTINCT h.rk, u.dst AS v
  FROM und u JOIN hub3 h ON h.i = u.src
  UNION SELECT rk, i FROM hub3
),
b2 AS (
  SELECT DISTINCT b.rk, u.dst AS v
  FROM und u JOIN b1 b ON b.v = u.src
  UNION SELECT rk, v FROM b1
),
sz AS (SELECT rk, CAST(count(*) AS BIGINT) AS n FROM b2 GROUP BY rk),
ix AS (
  SELECT a.rk AS ra, b.rk AS rb, CAST(count(*) AS BIGINT) AS inter
  FROM b2 a JOIN b2 b ON a.v = b.v AND a.rk < b.rk
  GROUP BY 1, 2
)
SELECT (SELECT v.label FROM hub3 h JOIN verts v ON v.i = h.i
        WHERE h.rk = p.ra) AS la,
       (SELECT v.label FROM hub3 h JOIN verts v ON v.i = h.i
        WHERE h.rk = p.rb) AS lb,
       (SELECT n FROM sz WHERE rk = p.ra) AS na,
       (SELECT n FROM sz WHERE rk = p.rb) AS nb,
       coalesce((SELECT inter FROM ix
                 WHERE ra = p.ra AND rb = p.rb), 0) AS inter
FROM (VALUES (1, 2), (1, 3), (2, 3)) p(ra, rb)
"""
    return sql


@_materialized
def deg_kendall() -> str:
    """Kendall tau-b sufficient statistics between in/out degree (twin
    of `queries.q_deg_kendall`; the O(n^2) fold collapses onto the
    joint degree histogram)."""
    return PREFIX + """
, di AS (SELECT dst AS i, CAST(count(*) AS BIGINT) AS c
         FROM edges GROUP BY 1),
do_ AS (SELECT src AS i, CAST(count(*) AS BIGINT) AS c
        FROM edges GROUP BY 1),
jd AS (
  SELECT f.i, coalesce(di.c, 0) AS x, coalesce(do_.c, 0) AS y
  FROM files f LEFT JOIN di ON di.i = f.i
  LEFT JOIN do_ ON do_.i = f.i
),
cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
          FROM jd GROUP BY 1, 2),
nc AS (SELECT CAST(coalesce(sum(a.c * b.c), 0) AS BIGINT) AS v
       FROM cells a JOIN cells b ON b.x > a.x AND b.y > a.y),
nd AS (SELECT CAST(coalesce(sum(a.c * b.c), 0) AS BIGINT) AS v
       FROM cells a JOIN cells b ON b.x > a.x AND b.y < a.y),
txy AS (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS v FROM cells),
gx AS (SELECT CAST(sum(cx * (cx - 1) // 2) AS BIGINT) AS v FROM
       (SELECT sum(c) AS cx FROM cells GROUP BY x)),
gy AS (SELECT CAST(sum(cy * (cy - 1) // 2) AS BIGINT) AS v FROM
       (SELECT sum(c) AS cy FROM cells GROUP BY y)),
n AS (SELECT CAST(sum(c) AS BIGINT) AS v FROM cells)
SELECT n.v AS n, nc.v AS nc, nd.v AS nd,
       gx.v - txy.v AS tx_pairs,
       gy.v - txy.v AS ty_pairs,
       txy.v AS txy_pairs
FROM n, nc, nd, gx, gy, txy
"""


def segment_gini() -> str:
    """Per-segment Lorenz/Gini sufficient statistics (twin of
    `queries.q_segment_gini`)."""
    return """
WITH r AS (
  SELECT c_mktsegment AS seg,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (
           PARTITION BY c_mktsegment
           ORDER BY floor(c_acctbal * 100 + 0.5), c_custkey) AS rn
  FROM customer
)
SELECT seg, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum(rn * cents) AS BIGINT) AS rank_num
FROM r GROUP BY seg
"""


def deseason_top(k: int = 5) -> str:
    """Top-|dev| deseasonalized days (twin of
    `queries.q_deseason_top`)."""
    return DAILY_AXIS_CTE + f"""
, d AS (SELECT day, c, CAST((day + 4) % 7 AS BIGINT) AS dow FROM x),
s AS (SELECT dow, CAST(count(*) AS BIGINT) AS ndw,
             CAST(sum(c) AS BIGINT) AS sdw
      FROM d GROUP BY 1)
SELECT d.day, CAST(d.c AS BIGINT) AS cnt,
       CAST(d.c * s.ndw - s.sdw AS BIGINT) AS dev_num,
       s.ndw AS dow_days
FROM d JOIN s USING (dow)
ORDER BY abs(d.c * s.ndw - s.sdw) DESC, d.day ASC LIMIT {k}
"""


def _pr_chain(iters: int = 10, damping: float = 0.85) -> str:
    """PageRank CTE chain ending at r{iters} (same recurrence as
    `pagerank()`), for oracles composing on the PR output."""
    d = damping
    sql = PREFIX + """
, outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
r0 AS (SELECT f.i, 1.0 / p.n AS score FROM files f CROSS JOIN params p)
"""
    prev = "r0"
    for k in range(1, iters + 1):
        sql += f"""
, dang{k} AS (
  SELECT coalesce(sum(r.score), 0.0) AS dm FROM {prev} r
  LEFT JOIN outw o ON o.src = r.i WHERE o.src IS NULL
),
contrib{k} AS (
  SELECT e.dst AS i, sum(r.score * e.w / o.ow) AS c
  FROM edges e JOIN {prev} r ON r.i = e.src JOIN outw o ON o.src = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT f.i,
         (1.0 - {d}) / p.n + {d} * (coalesce(c.c, 0.0) + dg.dm / p.n)
           AS score
  FROM files f CROSS JOIN params p CROSS JOIN dang{k} dg
  LEFT JOIN contrib{k} c ON c.i = f.i
)"""
        prev = f"r{k}"
    sql += f"""
, su AS MATERIALIZED (
  SELECT r.i, v.label,
         CAST(round(round(r.score * p.n, 6) * 1000000) AS BIGINT) AS su
  FROM {prev} r JOIN verts v ON v.i = r.i CROSS JOIN params p
)"""
    return sql


@_materialized
def pr_deg_footrule(iters: int = 10) -> str:
    """Footrule/d^2 between the PageRank and in-degree rankings (twin
    of `queries.q_pr_deg_footrule`)."""
    return _pr_chain(iters) + """
, di AS (SELECT dst AS i, CAST(count(*) AS BIGINT) AS c
         FROM edges GROUP BY 1),
rk AS (
  SELECT s.i,
         row_number() OVER (ORDER BY s.su DESC, s.label ASC) AS r1,
         row_number() OVER (ORDER BY coalesce(di.c, 0) DESC,
                            s.label ASC) AS r2
  FROM su s LEFT JOIN di ON di.i = s.i
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(abs(r1 - r2)) AS BIGINT) AS footrule,
       CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS d2_sum
FROM rk
"""


@_materialized
def pr_mass_by_comp(iters: int = 10, cc_iters: int = 12) -> str:
    """PageRank mass per fixed-round min-label component (twin of
    `queries.q_pr_mass_by_comp`)."""
    sql = _pr_chain(iters) + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
l0 AS (SELECT i, label AS comp FROM verts)
"""
    prev = "l0"
    for k in range(1, cc_iters + 1):
        sql += f"""
, l{k} AS MATERIALIZED (
  SELECT v.i, least(l.comp, coalesce(m.mn, l.comp)) AS comp
  FROM verts v JOIN {prev} l ON l.i = v.i
  LEFT JOIN (
    SELECT u.dst AS i, min(lp.comp) AS mn
    FROM und u JOIN {prev} lp ON lp.i = u.src GROUP BY u.dst
  ) m ON m.i = v.i
)"""
        prev = f"l{k}"
    sql += f"""
SELECT l.comp AS comp, CAST(count(*) AS BIGINT) AS n_vertices,
       CAST(sum(s.su) AS BIGINT) AS mass_u
FROM {prev} l JOIN su s ON s.i = l.i
GROUP BY l.comp
"""
    return sql


@_materialized
def pr_lorenz(iters: int = 10) -> str:
    """PageRank-mass Lorenz deciles (twin of `queries.q_pr_lorenz`)."""
    return _pr_chain(iters) + """
, rk AS (
  SELECT su, (10 * (row_number() OVER (ORDER BY su ASC, label ASC) - 1))
             // (SELECT count(*) FROM su) AS decile
  FROM su
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(su) AS BIGINT) AS mass_u
FROM rk GROUP BY decile
"""


def _rmat_chain(scale: int = 10, ef: int = 8, seed: int = 1) -> str:
    """Bit-exact SQL twin of `sources.rmat.rmat_batch`: per (edge id,
    bit) splitmix64 draw, exact double thresholds (embedded via repr of
    the SAME float sums numpy uses), bits assembled MSB-first."""
    a, b, c = 0.57, 0.19, 0.19
    t1, t2, t3 = repr(a), repr(a + b), repr(a + b + c)
    ne = ef * (1 << scale)
    mix = _mix64_sql(
        f"CAST((CAST(e AS HUGEINT) * 2654435761 + {seed * 1_000_003} "
        f"+ bit) % 18446744073709551616 AS UBIGINT)")
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {ne - 1})) AS e),
bits AS (
  SELECT e, unnest(generate_series(0, {scale - 1})) AS bit FROM ids
),
h AS MATERIALIZED (SELECT e, bit, {mix} AS h FROM bits),
qq AS MATERIALIZED (
  SELECT e, bit,
         CASE WHEN r < {t1} THEN 0 WHEN r < {t2} THEN 1
              WHEN r < {t3} THEN 2 ELSE 3 END AS q
  FROM (SELECT e, bit,
               CAST(h >> 11 AS DOUBLE) / 9007199254740992.0 AS r
        FROM h)
),
redges AS MATERIALIZED (
  SELECT e,
         CAST(sum((q // 2) << ({scale - 1} - bit)) AS BIGINT) AS u,
         CAST(sum((q % 2) << ({scale - 1} - bit)) AS BIGINT) AS v
  FROM qq GROUP BY e
)"""


def rmat_census(scale: int = 10, ef: int = 8, seed: int = 1) -> str:
    """R-MAT structural census (twin of `queries.q_rmat_census`)."""
    return _rmat_chain(scale, ef, seed) + """
, dis AS (SELECT DISTINCT u, v FROM redges WHERE u <> v)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM redges) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM redges WHERE u = v)
         AS n_loops,
       (SELECT CAST(count(*) AS BIGINT) FROM dis) AS n_distinct,
       (SELECT CAST(count(*) AS BIGINT) FROM
         (SELECT u AS x FROM dis UNION SELECT v FROM dis)) AS n_touched
"""


def rmat_deg_hist(scale: int = 10, ef: int = 8, seed: int = 1) -> str:
    """Out-degree histogram over distinct loopless R-MAT pairs (twin of
    `queries.q_rmat_deg_hist`)."""
    return _rmat_chain(scale, ef, seed) + """
, dis AS (SELECT DISTINCT u, v FROM redges WHERE u <> v),
dg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM dis GROUP BY u)
SELECT d AS outdeg, CAST(count(*) AS BIGINT) AS n_vertices
FROM dg GROUP BY d
"""


def rmat_quadrants(scale: int = 10, ef: int = 8, seed: int = 1) -> str:
    """Top-level initiator-quadrant counts (twin of
    `queries.q_rmat_quadrants`)."""
    return _rmat_chain(scale, ef, seed) + f"""
SELECT CAST(u >> {scale - 1} AS BIGINT) AS qu,
       CAST(v >> {scale - 1} AS BIGINT) AS qv,
       CAST(count(*) AS BIGINT) AS n_edges
FROM redges GROUP BY 1, 2
"""


def mm_roundtrip() -> str:
    """Edge census the MM writer/reader roundtrip must reproduce (twin
    of `queries.q_mm_roundtrip`; PREFIX edges are the dedup-summed
    loopless truth)."""
    return PREFIX + """
SELECT CAST(count(*) AS BIGINT) AS nnz,
       CAST(round(sum(w)) AS BIGINT) AS w_sum
FROM edges
"""


def salted_degree_topk(k: int = 10) -> str:
    """Plain degree top-k — the salt-free truth the salted two-phase
    plan must reproduce (twin of `queries.q_salted_degree_topk`)."""
    return PREFIX + f"""
SELECT v.label AS label, CAST(count(*) AS BIGINT) AS indeg
FROM edges e JOIN verts v ON v.i = e.dst
GROUP BY v.label ORDER BY indeg DESC, label ASC LIMIT {k}
"""


@_materialized
def salt_imbalance(s: int = 8) -> str:
    """Group-size census with and without the splitmix64 salt (twin of
    `queries.q_salt_imbalance`). The salt hashes the DENSE vertex id
    (label rank — the engine's id space), so the oracle maps src
    through the label-rank dictionary first."""
    mix = _mix64_sql("CAST(dn.d AS UBIGINT)")
    return PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY 'm_' || i) - 1 AS d FROM files
),
plain AS (SELECT dst, CAST(count(*) AS BIGINT) AS c
          FROM edges GROUP BY dst),
salted AS (
  SELECT e.dst, CAST(({mix}) % {s} AS BIGINT) AS salt,
         CAST(count(*) AS BIGINT) AS c
  FROM edges e JOIN dense dn ON dn.i = e.src GROUP BY 1, 2
)
SELECT 'plain' AS variant,
       (SELECT CAST(count(*) AS BIGINT) FROM plain) AS n_groups,
       (SELECT CAST(max(c) AS BIGINT) FROM plain) AS max_group,
       (SELECT CAST(sum(c) AS BIGINT) FROM plain) AS sum_rows
UNION ALL
SELECT 'salted',
       (SELECT CAST(count(*) AS BIGINT) FROM salted),
       (SELECT CAST(max(c) AS BIGINT) FROM salted),
       (SELECT CAST(sum(c) AS BIGINT) FROM salted)
"""


@_materialized
def khop_cheapest(rounds: int = 6) -> str:
    """K-hop cheapest paths under negative integer weights (twin of
    `queries.q_khop_cheapest`; weights and the relaxation run in the
    dense label-rank id space)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
degt AS (SELECT src AS i, CAST(count(*) AS BIGINT) AS d
         FROM und GROUP BY 1),
hub AS (SELECT i FROM degt ORDER BY d DESC, i ASC LIMIT 1),
dense AS (
  SELECT i, row_number() OVER (ORDER BY 'm_' || i) - 1 AS dn FROM files
),
we AS (
  SELECT ds.dn AS s, dd.dn AS t,
         CAST((ds.dn + 2 * dd.dn) % 7 - 3 AS DOUBLE) AS w
  FROM edges e JOIN dense ds ON ds.i = e.src
  JOIN dense dd ON dd.i = e.dst
),
d0 AS (
  SELECT dn.dn AS v,
         CASE WHEN dn.i = h.i THEN 0.0
              ELSE 'infinity'::DOUBLE END AS val
  FROM dense dn, hub h
)"""
    for k in range(1, rounds + 1):
        sql += f"""
, d{k} AS (
  SELECT p.v, least(p.val, coalesce(m.mn, 'infinity'::DOUBLE)) AS val
  FROM d{k - 1} p
  LEFT JOIN (
    SELECT we.t AS v, min(p2.val + we.w) AS mn
    FROM we JOIN d{k - 1} p2 ON p2.v = we.s
    WHERE p2.val < 'infinity'::DOUBLE
    GROUP BY we.t
  ) m ON m.v = p.v
)"""
    parts = [
        f"SELECT CAST({k} AS BIGINT) AS k, "
        f"CAST(count(*) FILTER (val < 'infinity'::DOUBLE) AS BIGINT) "
        f"AS n_reached, "
        f"CAST(min(val) FILTER (val < 'infinity'::DOUBLE) AS BIGINT) "
        f"AS min_dist, "
        f"CAST(sum(val) FILTER (val < 'infinity'::DOUBLE) AS BIGINT) "
        f"AS sum_dist FROM d{k}"
        for k in range(1, rounds + 1)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(parts) + "\nORDER BY k\n"


@_materialized
def louvain_pass() -> str:
    """One singleton-start Louvain sweep with the integer gain score
    m2*w - k_u*k_v, ties by neighbor label (twin of
    `queries.q_louvain_pass`)."""
    return PREFIX + """
, sym AS (
  SELECT u, v, CAST(sum(w) AS BIGINT) AS w FROM (
    SELECT src AS u, dst AS v, w FROM edges
    UNION ALL SELECT dst, src, w FROM edges
  ) GROUP BY u, v
),
kk AS (SELECT u, CAST(sum(w) AS BIGINT) AS k FROM sym GROUP BY u),
m2 AS (SELECT CAST(sum(w) AS BIGINT) AS m2 FROM sym),
sc AS (
  SELECT s.u, s.v, m2.m2 * s.w - ku.k * kv.k AS score,
         vl.label AS vlabel
  FROM sym s
  JOIN kk ku ON ku.u = s.u
  JOIN kk kv ON kv.u = s.v
  CROSS JOIN m2
  JOIN verts vl ON vl.i = s.v
),
pick AS (
  SELECT u, v, score, row_number() OVER (
    PARTITION BY u ORDER BY score DESC, vlabel ASC) AS rn
  FROM sc
)
SELECT va.label AS label,
       CASE WHEN p.score > 0 THEN vb.label ELSE va.label END AS comm
FROM verts va
LEFT JOIN (SELECT * FROM pick WHERE rn = 1) p ON p.u = va.i
LEFT JOIN verts vb ON vb.i = p.v
"""


@_materialized
def densest_peel(rounds: int = 8) -> str:
    """Synchronous densest-subgraph peel trace (twin of
    `queries.q_densest_peel`; integer cross-multiplied removal rule)."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
a0 AS (SELECT i FROM files)
"""
    for r in range(rounds + 1):
        sql += f"""
, d{r} AS (
  SELECT a.i, CAST(coalesce(x.c, 0) AS BIGINT) AS dg
  FROM a{r} a
  LEFT JOIN (
    SELECT u.src AS i, count(*) AS c
    FROM und u JOIN a{r} b ON b.i = u.dst GROUP BY u.src
  ) x ON x.i = a.i
),
s{r} AS (
  SELECT CAST(count(*) AS BIGINT) AS nv,
         CAST(coalesce(sum(dg), 0) AS BIGINT) AS ne2
  FROM d{r}
)"""
        if r < rounds:
            sql += f"""
, a{r + 1} AS (
  SELECT d.i FROM d{r} d, s{r} s WHERE d.dg * s.nv > s.ne2
)"""
    parts = [
        f"SELECT CAST({r} AS BIGINT) AS round, nv AS n_v, "
        f"ne2 // 2 AS n_e FROM s{r}"
        for r in range(rounds + 1)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(parts) + "\nORDER BY round\n"


@_materialized
def ci_topk(k: int = 25) -> str:
    """Collective-influence CI_1 top-k (twin of `queries.q_ci_topk`)."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, CAST(count(*) AS BIGINT) AS d FROM und
        GROUP BY src),
ciq AS (
  SELECT u.src AS i, CAST(sum(greatest(dn.d - 1, 0)) AS BIGINT) AS s
  FROM und u JOIN deg dn ON dn.i = u.dst GROUP BY u.src
)
SELECT v.label AS label,
       coalesce(d.d, 0) AS deg,
       coalesce(greatest(d.d - 1, 0) * c.s, 0) AS ci
FROM verts v
LEFT JOIN deg d ON d.i = v.i
LEFT JOIN ciq c ON c.i = v.i
ORDER BY ci DESC, v.i ASC
LIMIT """ + str(k) + "\n"


@_materialized
def domset_trace(rounds: int = 6, b: int = 53,
                 p: int = 2147483647) -> str:
    """Synchronous parallel greedy dominating set trace (twin of
    `queries.q_domset_trace`): priorities (d*48271 + b) mod p on DENSE
    ids (label ranks); score = closed-nbhd white count * p + prio;
    local maxima join per round, their closed neighborhoods turn
    dominated."""
    sql = PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d FROM verts
),
pr AS (SELECT d, CAST((d * 48271 + {b}) % {p} AS BIGINT) AS prio
       FROM dense),
und AS (
  SELECT ds.d AS u, dd.d AS v
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
  UNION
  SELECT dd.d, ds.d
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
),
s0 AS (SELECT d FROM pr WHERE FALSE),
w0 AS (SELECT d FROM pr)
"""
    for r in range(rounds):
        sql += f"""
, wc{r} AS (
  SELECT pr.d,
         CAST((CASE WHEN pr.d IN (SELECT d FROM w{r}) THEN 1 ELSE 0 END)
              + coalesce(x.c, 0) AS BIGINT) AS wv
  FROM pr LEFT JOIN (
    SELECT u.u AS d, count(*) AS c
    FROM und u JOIN w{r} wb ON wb.d = u.v GROUP BY u.u
  ) x ON x.d = pr.d
),
sc{r} AS (
  SELECT w.d,
         CASE WHEN w.d IN (SELECT d FROM s{r}) OR w.wv = 0 THEN 0
              ELSE w.wv * {p} + pr.prio END AS sc
  FROM wc{r} w JOIN pr ON pr.d = w.d
),
mx{r} AS (
  SELECT u.u AS d, max(s2.sc) AS m
  FROM und u JOIN sc{r} s2 ON s2.d = u.v GROUP BY u.u
),
win{r} AS (
  SELECT s.d FROM sc{r} s LEFT JOIN mx{r} m ON m.d = s.d
  WHERE s.sc > 0 AND s.sc >= coalesce(m.m, 0)
),
s{r + 1} AS (SELECT d FROM s{r} UNION SELECT d FROM win{r}),
w{r + 1} AS (
  SELECT w.d FROM w{r} w
  WHERE w.d NOT IN (SELECT d FROM win{r})
    AND w.d NOT IN (SELECT u.u FROM und u
                    JOIN win{r} x ON x.d = u.v)
)"""
    parts = [
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM s{r}) AS n_set, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM w{r}) AS n_white"
        for r in range(rounds + 1)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(parts) + "\nORDER BY round\n"


@_materialized
def scan_topk(k: int = 25) -> str:
    """Ego-net scan statistic top-k (twin of `queries.q_scan_topk`;
    scan = deg + per-vertex triangles, ties by dense label rank)."""
    return PREFIX + """
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d, label
  FROM verts
),
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges GROUP BY 1, 2
),
uadj AS (SELECT a AS v, b AS u FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT v, count(*) AS dg FROM uadj GROUP BY v),
tri AS (
  SELECT x.v AS v, count(*) AS t
  FROM uadj x JOIN uadj y ON x.v = y.v AND x.u < y.u
  JOIN und t2 ON t2.a = x.u AND t2.b = y.u
  GROUP BY x.v
)
SELECT dn.label AS label,
       CAST(d.dg AS BIGINT) AS deg,
       CAST(coalesce(tr.t, 0) AS BIGINT) AS tri,
       CAST(d.dg + coalesce(tr.t, 0) AS BIGINT) AS scan
FROM deg d
JOIN dense dn ON dn.i = d.v
LEFT JOIN tri tr ON tr.v = d.v
ORDER BY scan DESC, dn.d ASC
LIMIT """ + str(k) + "\n"


@_materialized
def hindex_coreness(rounds: int = 4) -> str:
    """Iterated neighborhood H-index (twin of
    `queries.q_hindex_coreness`): c_0 = deg, c_{k+1}(v) = H-index of
    neighbor c_k values via max(least(c, rank))."""
    sql = PREFIX + """
, und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges GROUP BY 1, 2
),
uadj AS (SELECT a AS v, b AS u FROM und UNION ALL SELECT b, a FROM und),
c0 AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM uadj GROUP BY v)
"""
    for k in range(1, rounds + 1):
        sql += f"""
, c{k} AS (
  SELECT v, CAST(max(least(c, rn)) AS BIGINT) AS c FROM (
    SELECT u.v AS v, p.c AS c,
           row_number() OVER (PARTITION BY u.v ORDER BY p.c DESC) AS rn
    FROM uadj u JOIN c{k - 1} p ON p.v = u.u
  ) GROUP BY v
)"""
    return sql + f"""
SELECT vt.label AS label, d.c AS deg, f.c AS core
FROM c0 d
JOIN c{rounds} f ON f.v = d.v
JOIN verts vt ON vt.i = d.v
"""


@_materialized
def odd_cycle_census(cc_iters: int = 12, rounds: int = 12,
                     topc: int = 10) -> str:
    """Per-component odd-cycle census (twin of
    `queries.q_odd_cycle_census`): min-label CC chain, parity BFS from
    each component representative, equal-level edges counted as odd."""
    sql = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
l0 AS (SELECT i, label AS comp FROM verts)
"""
    prev = "l0"
    for k in range(1, cc_iters + 1):
        sql += f"""
, l{k} AS (
  SELECT v.i, least(l.comp, coalesce(m.mn, l.comp)) AS comp
  FROM verts v JOIN {prev} l ON l.i = v.i
  LEFT JOIN (
    SELECT u.dst AS i, min(lp.comp) AS mn
    FROM und u JOIN {prev} lp ON lp.i = u.src GROUP BY u.dst
  ) m ON m.i = v.i
)"""
        prev = f"l{k}"
    sql += f"""
, rep AS (
  SELECT l.i FROM {prev} l JOIN verts v ON v.i = l.i
  WHERE v.label = l.comp
),
d0 AS (SELECT i, CAST(0 AS BIGINT) AS dist FROM rep)
"""
    dprev = "d0"
    for r in range(1, rounds + 1):
        sql += f"""
, d{r} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {dprev}
    UNION ALL
    SELECT u.dst AS i, p.dist + 1 AS dist
    FROM und u JOIN {dprev} p ON p.i = u.src
  ) GROUP BY i
)"""
        dprev = f"d{r}"
    sql += f"""
, uedge AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges GROUP BY 1, 2
),
ecen AS (
  SELECT l.comp,
         CAST(count(*) AS BIGINT) AS n_edges,
         CAST(coalesce(count(*) FILTER (da.dist IS NOT NULL
              AND db.dist IS NOT NULL AND da.dist = db.dist), 0)
              AS BIGINT) AS odd_edges
  FROM uedge e
  JOIN {prev} l ON l.i = e.a
  LEFT JOIN {dprev} da ON da.i = e.a
  LEFT JOIN {dprev} db ON db.i = e.b
  GROUP BY l.comp
),
csize AS (
  SELECT comp, CAST(count(*) AS BIGINT) AS size FROM {prev} GROUP BY comp
)
SELECT s.comp AS comp, s.size,
       coalesce(e.n_edges, 0) AS n_edges,
       coalesce(e.odd_edges, 0) AS odd_edges
FROM csize s LEFT JOIN ecen e ON e.comp = s.comp
ORDER BY s.size DESC, s.comp ASC
LIMIT {topc}
"""
    return sql


@_materialized
def hitting_time(rounds: int = 6, seed_mod: int = 97) -> str:
    """Truncated hitting time to the absorbing seed set (twin of
    `queries.q_hitting_time`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, count(*) AS d FROM und GROUP BY src),
seeds AS (SELECT i FROM files WHERE i % {seed_mod} = 0),
h0 AS (SELECT i, CAST(0 AS DOUBLE) AS h FROM files)
"""
    for k in range(1, rounds + 1):
        sql += f"""
, h{k} AS (
  SELECT f.i,
         CASE WHEN f.i IN (SELECT i FROM seeds) THEN 0.0
              WHEN coalesce(dg.d, 0) = 0 THEN 0.0
              ELSE 1.0 + coalesce(s.y, 0.0) / dg.d END AS h
  FROM files f
  LEFT JOIN deg dg ON dg.i = f.i
  LEFT JOIN (
    SELECT u.src AS i, sum(p.h) AS y
    FROM und u JOIN h{k - 1} p ON p.i = u.dst GROUP BY u.src
  ) s ON s.i = f.i
)"""
    return sql + f"""
SELECT v.label AS label, round(h.h, 6) AS h
FROM h{rounds} h JOIN verts v ON v.i = h.i
"""


def mix_allocation(budget: int = 100000) -> str:
    """Largest-remainder training-mix apportionment (twin of
    `queries.q_mix_allocation`; exact integer arithmetic)."""
    return f"""
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS docs
  FROM documents GROUP BY source, lang
),
w AS (
  SELECT source, lang, docs,
         CAST(floor(sqrt(docs)) AS BIGINT) AS wt
  FROM cells
),
tot AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM w),
qt AS (
  SELECT source, lang, docs, wt,
         ({budget} * wt) // t.tw AS fl,
         ({budget} * wt) % t.tw AS rem
  FROM w CROSS JOIN tot t
),
r AS (SELECT {budget} - CAST(sum(fl) AS BIGINT) AS topup FROM qt),
rk AS (
  SELECT *, row_number() OVER (
    ORDER BY rem DESC, source ASC, lang ASC) AS rn
  FROM qt
)
SELECT source, lang, docs,
       CAST(fl + CASE WHEN rn <= (SELECT topup FROM r) THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM rk
"""


@_materialized
def gap_encoding() -> str:
    """WebGraph gap-encoding cost under original dense ids vs the
    degree-rank relabel (twin of `queries.q_gap_encoding`)."""
    return PREFIX + """
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d FROM verts
),
du AS (
  SELECT ds.d AS u, dd.d AS v
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
  UNION
  SELECT dd.d, ds.d
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS dg FROM du GROUP BY u),
rk AS (
  SELECT u, row_number() OVER (ORDER BY dg DESC, u ASC) - 1 AS r
  FROM deg
),
rdu AS (
  SELECT ru.r AS u, rv.r AS v
  FROM du JOIN rk ru ON ru.u = du.u JOIN rk rv ON rv.u = du.v
),
cost_orig AS (
  SELECT CAST(sum(CAST(floor(log2(g)) AS BIGINT) + 1) AS BIGINT) AS bits,
         CAST(count(DISTINCT u) AS BIGINT) AS lists
  FROM (
    SELECT u, coalesce(v - lag(v) OVER (PARTITION BY u ORDER BY v),
                       v + 1) AS g
    FROM du
  )
),
cost_rank AS (
  SELECT CAST(sum(CAST(floor(log2(g)) AS BIGINT) + 1) AS BIGINT) AS bits,
         CAST(count(DISTINCT u) AS BIGINT) AS lists
  FROM (
    SELECT u, coalesce(v - lag(v) OVER (PARTITION BY u ORDER BY v),
                       v + 1) AS g
    FROM rdu
  )
)
SELECT 'orig' AS ordering, bits AS total_bits, lists AS n_lists
FROM cost_orig
UNION ALL
SELECT 'degrank', bits, lists FROM cost_rank
"""


def split_leakage(tau: float = 0.5, df_cap: int = 1000,
                  train: int = 8, val: int = 1) -> str:
    """Cross-split near-duplicate leakage census (twin of
    `queries.q_split_leakage`)."""
    return _jaccard_pairs_body(tau, df_cap) + f"""
, sp AS (
  SELECT doc_id,
         CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 10
                   < {train} THEN 0
              WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 10
                   < {train + val} THEN 1
              ELSE 2 END AS c
  FROM documents
)
SELECT (['train', 'val', 'test'])[least(sa.c, sb.c) + 1] AS split_a,
       (['train', 'val', 'test'])[greatest(sa.c, sb.c) + 1] AS split_b,
       CAST(count(*) AS BIGINT) AS pairs
FROM pairs p
JOIN sp sa ON sa.doc_id = p.a
JOIN sp sb ON sb.doc_id = p.b
GROUP BY 1, 2
"""


@_materialized
def ppr_push(rounds: int = 5, alpha: float = 0.25, keep: float = 0.375,
             eps: float = 0.0009765625,
             root_label: str = "m_0") -> str:
    """Synchronous ACL PPR push from the root (twin of
    `queries.q_ppr_push`)."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
deg AS (SELECT src AS i, CAST(count(*) AS DOUBLE) AS d FROM und
        GROUP BY src),
rt AS (SELECT i FROM verts WHERE label = '{root_label}'),
s0 AS (
  SELECT f.i,
         CASE WHEN f.i IN (SELECT i FROM rt) THEN 1.0 ELSE 0.0 END AS r,
         0.0 AS p
  FROM files f
)
"""
    prev = "s0"
    for k in range(1, rounds + 1):
        sql += f"""
, x{k} AS (
  SELECT s.i,
         CASE WHEN coalesce(dg.d, 0) > 0 AND s.r > {eps} * dg.d
              THEN {keep} * s.r / dg.d ELSE 0.0 END AS x
  FROM {prev} s LEFT JOIN deg dg ON dg.i = s.i
),
s{k} AS (
  SELECT s.i,
         CASE WHEN coalesce(dg.d, 0) > 0 AND s.r > {eps} * dg.d
              THEN {keep} * s.r ELSE s.r END + coalesce(y.y, 0.0) AS r,
         CASE WHEN coalesce(dg.d, 0) > 0 AND s.r > {eps} * dg.d
              THEN s.p + {alpha} * s.r ELSE s.p END AS p
  FROM {prev} s
  LEFT JOIN deg dg ON dg.i = s.i
  LEFT JOIN (
    SELECT u.src AS i, sum(xx.x) AS y
    FROM und u JOIN x{k} xx ON xx.i = u.dst GROUP BY u.src
  ) y ON y.i = s.i
)"""
        prev = f"s{k}"
    return sql + f"""
SELECT v.label AS label, round(s.p, 6) AS p, round(s.r, 6) AS r
FROM {prev} s JOIN verts v ON v.i = s.i
"""


@_materialized
def edge_betweenness(root_label: str = "m_0", iters: int = 8,
                     topk: int = 20) -> str:
    """Single-source edge betweenness over the shortest-path DAG
    (twin of `queries.q_edge_betweenness`): the `bfs_sigma` forward
    chain + an unrolled backward dependency chain, edge score =
    sigma_u/sigma_v * (1 + delta_v)."""
    sql = PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d FROM verts
),
und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
d0 AS (SELECT i, 0 AS dist FROM verts WHERE label = '{root_label}')
"""
    prev = "d0"
    for k in range(1, iters + 1):
        sql += f"""
, d{k} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM und u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"d{k}"
    sql += f"""
, distf AS (SELECT i, dist FROM {prev}),
s0 AS (SELECT i, CAST(1 AS BIGINT) AS sig FROM d0)
"""
    for k in range(1, iters + 1):
        sql += f"""
, s{k} AS (
  SELECT u.dst AS i, sum(sp.sig) AS sig
  FROM und u JOIN s{k - 1} sp ON sp.i = u.src
  JOIN distf dd ON dd.i = u.dst AND dd.dist = {k}
  GROUP BY u.dst
)"""
    union = " UNION ALL ".join(f"SELECT * FROM s{k}"
                               for k in range(iters + 1))
    sql += f"""
, sig AS ({union}),
del{iters} AS (SELECT i, CAST(0 AS DOUBLE) AS delta
               FROM distf WHERE FALSE)
"""
    for lv in range(iters, 0, -1):
        sql += f"""
, nb{lv} AS (
  SELECT u.src AS i,
         sum((ss.sig / sd.sig) * (1 + coalesce(dd.delta, 0))) AS delta
  FROM und u
  JOIN distf fu ON fu.i = u.src AND fu.dist = {lv - 1}
  JOIN distf fv ON fv.i = u.dst AND fv.dist = {lv}
  JOIN sig ss ON ss.i = u.src
  JOIN sig sd ON sd.i = u.dst
  LEFT JOIN del{lv} dd ON dd.i = u.dst
  GROUP BY u.src
),
del{lv - 1} AS (SELECT * FROM del{lv} UNION ALL SELECT * FROM nb{lv})"""
    sql += f"""
SELECT vu.label AS src_label, vv.label AS dst_label,
       round((su.sig / sv.sig) * (1 + coalesce(dd.delta, 0)), 6)
         AS score
FROM und u
JOIN distf fu ON fu.i = u.src
JOIN distf fv ON fv.i = u.dst AND fv.dist = fu.dist + 1
JOIN sig su ON su.i = u.src
JOIN sig sv ON sv.i = u.dst
LEFT JOIN del0 dd ON dd.i = u.dst
JOIN verts vu ON vu.i = u.src
JOIN verts vv ON vv.i = u.dst
JOIN dense du2 ON du2.i = u.src
JOIN dense dv2 ON dv2.i = u.dst
ORDER BY (su.sig / sv.sig) * (1 + coalesce(dd.delta, 0)) DESC,
         du2.d ASC, dv2.d ASC
LIMIT {topk}
"""
    return sql


@_materialized
def block_prune_scan(g: int = 4) -> str:
    """Diagonal-block census through the Owner arithmetic on dense ids
    (twin of `queries.q_block_prune_scan`; ls = max(1, n // g),
    br keys on dst, bc on src — ``SpParMat.cpp:5081``)."""
    return PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d FROM verts
),
de AS (
  SELECT ds.d AS src, dd.d AS dst, e.w
  FROM edges e
  JOIN dense ds ON ds.i = e.src
  JOIN dense dd ON dd.i = e.dst
),
ls AS (SELECT greatest(1, CAST(n AS BIGINT) // {g}) AS v FROM params),
keyed AS (
  SELECT least(dst // ls.v, {g - 1}) * {g}
         + least(src // ls.v, {g - 1}) AS bid, w
  FROM de CROSS JOIN ls
)
SELECT bid, CAST(count(*) AS BIGINT) AS nnz,
       CAST(sum(w) AS BIGINT) AS wsum
FROM keyed
WHERE bid % {g + 1} = 0
GROUP BY bid
"""


def patch_stats(p: int = 4) -> str:
    """4x4 patch-mean brightness census (twin of
    `queries.q_patch_stats`; make_blob pixel arithmetic regenerated:
    pixel (x, y) = ((y*w + x) * (id+7)) % 251)."""
    return f"""
WITH dims AS (
  SELECT doc_id AS item_id,
         CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS w,
         CAST(8 + (doc_id % 3) * 4 AS BIGINT) AS h
  FROM documents
),
patches AS (
  SELECT d.item_id, pr.i AS pr, pc.i AS pc,
         SUM(((pr.i * {p} + dy.i) * d.w + pc.i * {p} + dx.i)
             * (d.item_id + 7) % 251) AS psum
  FROM dims d
  CROSS JOIN range(4) pr(i) CROSS JOIN range(6) pc(i)
  CROSS JOIN range({p}) dy(i) CROSS JOIN range({p}) dx(i)
  WHERE pr.i < d.h // {p} AND pc.i < d.w // {p}
  GROUP BY 1, 2, 3
)
SELECT CAST((psum // {p * p}) // 16 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_patches
FROM patches
GROUP BY 1
"""


@_materialized
def pca_top(iters: int = 3, dim: int = 64) -> str:
    """Top principal component by power iteration (twin of
    `queries.q_pca_top`; per-row evaluation of the identical
    C v = sum_i x_i (x_i . v)/N - mu (mu . v) recurrence)."""
    sql = f"""
WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
mu AS (
  SELECT CAST(g.d - 1 AS BIGINT) AS dim,
         sum(CAST(embedding[CAST(g.d AS INT)] AS DOUBLE)) / nn.n AS mj
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
  CROSS JOIN nn
  GROUP BY 1, nn.n
),
v0 AS (SELECT CAST(g.d - 1 AS BIGINT) AS dim, 0.125 AS val
       FROM generate_series(1, {dim}) g(d))
"""
    prev = "v0"
    for k in range(1, iters + 1):
        sql += f"""
, p{k} AS (
  SELECT e.vec_id,
         sum(CAST(e.embedding[CAST(g.d AS INT)] AS DOUBLE) * v.val)
           AS pv
  FROM embeddings e CROSS JOIN generate_series(1, {dim}) g(d)
  JOIN {prev} v ON v.dim = g.d - 1
  GROUP BY e.vec_id
),
mv{k} AS (
  SELECT sum(mu.mj * v.val) AS muv
  FROM mu JOIN {prev} v ON v.dim = mu.dim
),
w{k} AS (
  SELECT CAST(g.d - 1 AS BIGINT) AS dim,
         sum(CAST(e.embedding[CAST(g.d AS INT)] AS DOUBLE) * p.pv)
           / nn.n
         - any_value(mu.mj) * any_value(mv.muv) AS u
  FROM embeddings e CROSS JOIN generate_series(1, {dim}) g(d)
  JOIN p{k} p ON p.vec_id = e.vec_id
  JOIN mu ON mu.dim = g.d - 1
  CROSS JOIN mv{k} mv CROSS JOIN nn
  GROUP BY 1, nn.n
),
nrm{k} AS (SELECT sqrt(sum(u * u)) AS s FROM w{k}),
v{k} AS (SELECT w.dim, w.u / nrm.s AS val
         FROM w{k} w CROSS JOIN nrm{k} nrm)"""
        prev = f"v{k}"
    return sql + f"""
SELECT dim, round(val, 6) AS loading FROM {prev} ORDER BY dim
"""


@_materialized
def twin_census() -> str:
    """Twin-class size histogram (twin of `queries.q_twin_census`;
    id-invariant census — equal neighbor SETS class together on either
    id space)."""
    return PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
sig AS (
  SELECT src AS u,
         md5_number_lower(string_agg(CAST(dst AS VARCHAR), ','
                                     ORDER BY dst))
           % 9223372036854775808 AS sg
  FROM und GROUP BY src
),
cls AS (SELECT sg, count(*) AS cnt FROM sig GROUP BY sg)
SELECT CAST(cnt AS BIGINT) AS class_size,
       CAST(count(*) AS BIGINT) AS n_classes
FROM cls GROUP BY cnt ORDER BY 1
"""


def kanon_risk(ks=(2, 5, 10, 20), widths=(256, 1024)) -> str:
    """k-anonymity risk census (twin of `queries.q_kanon_risk`)."""
    parts = []
    for w in widths:
        for k in ks:
            parts.append(f"""
SELECT CAST({w} AS BIGINT) AS width, CAST({k} AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_cells_below,
       CAST(coalesce(sum(docs), 0) AS BIGINT) AS n_docs_below
FROM (
  SELECT source, lang, n_chars // {w} AS nb,
         count(*) AS docs
  FROM documents GROUP BY 1, 2, 3
) WHERE docs < {k}""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY width, k\n"


@_materialized
def block_format_census(g: int = 32, ratio: int = 4) -> str:
    """Resident block-format census (twin of
    `queries.q_block_format_census`; Owner arithmetic on dense ids,
    hypersparse iff nr > ratio * nnz)."""
    return PREFIX + f"""
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d FROM verts
),
du AS (
  SELECT ds.d AS u, dd.d AS v
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
  UNION
  SELECT dd.d, ds.d
  FROM edges e JOIN dense ds ON ds.i = e.src JOIN dense dd ON dd.i = e.dst
),
ls AS (SELECT greatest(1, CAST(n AS BIGINT) // {g}) AS lsz FROM params),
blk AS (
  SELECT least(du.v // ls.lsz, {g - 1}) AS br,
         CAST(count(*) AS BIGINT) AS nnz
  FROM du CROSS JOIN ls
  GROUP BY least(du.v // ls.lsz, {g - 1}), least(du.u // ls.lsz, {g - 1})
),
sized AS (
  SELECT nnz,
         CASE WHEN br < {g - 1} THEN ls.lsz
              ELSE (SELECT CAST(n AS BIGINT) FROM params)
                   - {g - 1} * ls.lsz END AS nr
  FROM blk CROSS JOIN ls
)
SELECT CASE WHEN nnz > 0 AND nr > {ratio} * nnz
            THEN 'hypersparse' ELSE 'csr' END AS fmt,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(nnz) AS BIGINT) AS nnz
FROM sized
GROUP BY 1 ORDER BY 1
"""


def cdc_chunks(w: int = 8, b: int = 131, mask: int = 64) -> str:
    """Content-defined chunk-count histogram (twin of
    `queries.q_cdc_chunks`)."""
    terms = " + ".join(
        f"CAST(ascii(substr(d.text, CAST(d.p - {j} AS INT), 1)) AS BIGINT) * {b ** j}"
        for j in range(w))
    return f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series({w}, length(text))) AS p
  FROM documents
),
cuts AS (
  SELECT d.doc_id,
         CAST(count(*) FILTER (({terms}) % {mask} = 0) AS BIGINT)
           AS n_cuts
  FROM pos d
  GROUP BY d.doc_id
),
alldocs AS (
  SELECT doc_id, coalesce(c.n_cuts, 0) + 1 AS n_chunks
  FROM documents LEFT JOIN cuts c USING (doc_id)
)
SELECT CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_docs
FROM alldocs GROUP BY 1 ORDER BY 1
"""


def attribution() -> str:
    """Last-touch vs first-touch purchase attribution (twin of
    `queries.q_attribution`)."""
    return """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER w AS rn,
         count(*) FILTER (event_type = 'purchase') OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
touches AS (
  SELECT user_id, coalesce(seg, 0) AS seg, event_type, rn
  FROM e WHERE event_type <> 'purchase'
),
spans AS (
  SELECT user_id, seg,
         arg_max(event_type, rn) AS et_last,
         arg_min(event_type, rn) AS et_first
  FROM touches GROUP BY 1, 2
),
conv AS (
  SELECT user_id, coalesce(seg, 0) AS seg
  FROM e WHERE event_type = 'purchase'
),
credits AS (
  SELECT s.et_last, s.et_first
  FROM conv c JOIN spans s ON s.user_id = c.user_id AND s.seg = c.seg
)
SELECT coalesce(a.event_type, b.event_type) AS event_type,
       coalesce(a.c, 0) AS last_touch,
       coalesce(b.c, 0) AS first_touch
FROM (SELECT et_last AS event_type, CAST(count(*) AS BIGINT) AS c
      FROM credits GROUP BY 1) a
FULL OUTER JOIN
     (SELECT et_first AS event_type, CAST(count(*) AS BIGINT) AS c
      FROM credits GROUP BY 1) b
  ON a.event_type = b.event_type
ORDER BY 1
"""


@_materialized
def masked_spmv(mask_mod: int = 3, acc_mod: int = 7) -> str:
    """Masked SpMV, replace vs accumulate (twin of
    `queries.q_masked_spmv`)."""
    return PREFIX + f"""
, yv AS (
  SELECT v.i, sum(e.w * ((e.src % 11) + 1)) AS y
  FROM edges e JOIN verts v ON v.i = e.dst GROUP BY v.i
)
SELECT v.label AS label,
       CASE WHEN v.i % {mask_mod} = 0 THEN coalesce(yv.y, 0.0)
            ELSE 0.0 END AS y_replace,
       CASE WHEN v.i % {mask_mod} = 0
            THEN (v.i % {acc_mod}) + coalesce(yv.y, 0.0)
            ELSE CAST(v.i % {acc_mod} AS DOUBLE) END AS y_accum
FROM verts v LEFT JOIN yv ON yv.i = v.i
"""


def topp_selection(num: int = 1, den: int = 2) -> str:
    """Top-p mass selection per language (twin of
    `queries.q_topp_selection`)."""
    return f"""
WITH ranked AS (
  SELECT lang, n_chars,
         sum(n_chars) OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS before_mass
  FROM documents
),
tot AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS char_mass
  FROM documents GROUP BY lang
)
SELECT t.lang, t.n_docs, t.char_mass,
       CAST(count(*) FILTER ({den} * coalesce(r.before_mass, 0)
                             < {num} * t.char_mass) AS BIGINT) AS kept
FROM ranked r JOIN tot t ON t.lang = r.lang
GROUP BY t.lang, t.n_docs, t.char_mass
"""


@_materialized
def repo_boilerplate() -> str:
    """Repo import-line boilerplate census (twin of
    `queries.q_repo_boilerplate`; regenerates the corpus import lines
    from the targets relation)."""
    return PREFIX + """
, lines AS (
  SELECT 'repo_' || (t.i % 100) AS repo, 'import m_' || t.j AS line
  FROM targets t
),
percnt AS (
  SELECT repo, line, CAST(count(*) AS BIGINT) AS c
  FROM lines GROUP BY repo, line
)
SELECT repo,
       CAST(sum(c) AS BIGINT) AS n_imports,
       CAST(count(*) AS BIGINT) AS distinct_imports,
       CAST(max(c) AS BIGINT) AS max_repeat
FROM percnt GROUP BY repo
"""


def effective_tokens(tau: float = 0.5, rounds: int = 6,
                     df_cap: int = 1000) -> str:
    """Dedup-discounted mass per source (twin of
    `queries.q_effective_tokens`; wraps the `dup_clusters` chain)."""
    inner = dup_clusters(tau, rounds, df_cap)
    return f"""
WITH dc AS MATERIALIZED ({inner}),
sizes AS MATERIALIZED (
  SELECT cluster, CAST(count(*) AS BIGINT) AS sz
  FROM dc GROUP BY cluster
)
SELECT d.source,
       CAST(sum(d.n_chars) AS BIGINT) AS raw_chars,
       round(sum(d.n_chars / CAST(coalesce(s.sz, 1) AS DOUBLE)), 6)
         AS effective_chars
FROM documents d
LEFT JOIN dc ON dc.doc_id = d.doc_id
LEFT JOIN sizes s ON s.cluster = dc.cluster
GROUP BY d.source
ORDER BY d.source
"""


@_materialized
def pr_damping_sensitivity(iters: int = 10, d2: float = 0.6,
                           topk: int = 20) -> str:
    """PageRank damping sensitivity (twin of
    `queries.q_pr_damping_sensitivity`; two unrolled chains, ranks
    over rounded scores with arith tie-break)."""

    def chain(tag: str, d: float) -> str:
        sql = f"""
, r{tag}0 AS (SELECT f.i, 1.0 / p.n AS score
              FROM files f CROSS JOIN params p)
"""
        prev = f"r{tag}0"
        for k in range(1, iters + 1):
            sql += f"""
, dang{tag}{k} AS (
  SELECT coalesce(sum(r.score), 0.0) AS dm FROM {prev} r
  LEFT JOIN outw o ON o.src = r.i WHERE o.src IS NULL
),
contrib{tag}{k} AS (
  SELECT e.dst AS i, sum(r.score * e.w / o.ow) AS c
  FROM edges e JOIN {prev} r ON r.i = e.src
  JOIN outw o ON o.src = e.src
  GROUP BY e.dst
),
r{tag}{k} AS (
  SELECT f.i,
         (1.0 - {d}) / p.n
         + {d} * (coalesce(c.c, 0.0) + dg.dm / p.n) AS score
  FROM files f CROSS JOIN params p CROSS JOIN dang{tag}{k} dg
  LEFT JOIN contrib{tag}{k} c ON c.i = f.i
)"""
            prev = f"r{tag}{k}"
        return sql

    return PREFIX + """
, outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src)
""" + chain("a", 0.85) + chain("b", d2) + f"""
, sc AS (
  SELECT a.i, round(a.score * p.n, 6) AS s085,
         round(b.score * p.n, 6) AS s060
  FROM ra{iters} a JOIN rb{iters} b ON b.i = a.i CROSS JOIN params p
),
rk AS (
  SELECT i, s085, s060,
         row_number() OVER (ORDER BY s085 DESC, i ASC) AS rank85,
         row_number() OVER (ORDER BY s060 DESC, i ASC) AS rank60
  FROM sc
)
SELECT v.label AS label, r.s085, r.s060,
       CAST(r.rank85 AS BIGINT) AS rank85,
       CAST(r.rank60 AS BIGINT) AS rank60
FROM rk r JOIN verts v ON v.i = r.i
ORDER BY r.rank85
LIMIT {topk}
"""


@_materialized
def jsonl_roundtrip() -> str:
    """JSONL roundtrip census in dense id space (twin of
    `queries.q_jsonl_roundtrip`)."""
    return PREFIX + """
, dense AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS d FROM verts
),
de AS (
  SELECT ds.d AS src, dd.d AS dst, e.w
  FROM edges e
  JOIN dense ds ON ds.i = e.src
  JOIN dense dd ON dd.i = e.dst
)
SELECT CAST(count(*) AS BIGINT) AS nnz,
       CAST(sum(src) AS BIGINT) AS srcsum,
       CAST(sum(dst) AS BIGINT) AS dstsum,
       CAST(sum(w) AS BIGINT) AS wsum
FROM de
"""


def shot_census(t: int = 5000) -> str:
    """Shot-boundary census (twin of `queries.q_shot_census`;
    make_video_blob frame arithmetic regenerated: frame size 64,
    pixel i = (i*(id+3)) % 241, a cut where the pair diff sum > t)."""
    return f"""
WITH dims AS (
  SELECT doc_id AS item_id, CAST(4 + (doc_id % 5) AS BIGINT) AS nf
  FROM documents
),
pairdiff AS (
  SELECT d.item_id, (r.i // 64) AS pair_idx,
         CAST(sum(abs((r.i * (d.item_id + 3)) % 241
                      - ((r.i - 64) * (d.item_id + 3)) % 241))
              AS BIGINT) AS dv
  FROM dims d CROSS JOIN range(512) r(i)
  WHERE r.i >= 64 AND r.i < d.nf * 64
  GROUP BY 1, 2
),
shots AS (
  SELECT dm.item_id,
         1 + CAST(coalesce(count(*) FILTER (p.dv > {t}), 0) AS BIGINT)
           AS n_shots
  FROM dims dm LEFT JOIN pairdiff p ON p.item_id = dm.item_id
  GROUP BY dm.item_id
)
SELECT n_shots, CAST(count(*) AS BIGINT) AS n_videos
FROM shots GROUP BY 1 ORDER BY 1
"""


def ann_recall_audit(nq: int = 10, k: int = 5) -> str:
    """Recall@k histogram of LSH vs exact (twin of
    `queries.q_ann_recall_audit`; wraps the two green ANN oracles)."""
    ex = ann_topk(nq, k)
    ls = ann_lsh(nq, k)
    return f"""
WITH exact_nn AS MATERIALIZED ({ex}),
lsh_nn AS MATERIALIZED ({ls}),
perq AS (
  SELECT q.qid, CAST(coalesce(h.c, 0) AS BIGINT) AS hits
  FROM (SELECT DISTINCT query_id AS qid FROM exact_nn) q
  LEFT JOIN (
    SELECT e.query_id AS qid, count(*) AS c
    FROM exact_nn e JOIN lsh_nn l
      ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
    GROUP BY 1
  ) h ON h.qid = q.qid
)
SELECT hits, CAST(count(*) AS BIGINT) AS n_queries
FROM perq GROUP BY 1 ORDER BY 1
"""


@_materialized
def pr_mass_by_repo(iters: int = 10, topk: int = 10) -> str:
    """PageRank mass per repository (twin of
    `queries.q_pr_mass_by_repo`; repo = arith id % 100)."""
    base = pagerank(iters)
    return f"""
WITH pr AS MATERIALIZED (
  SELECT CAST(substr(label, 3) AS BIGINT) AS i, score
  FROM ({base})
),
agg AS (
  SELECT (i % 100) AS rid, CAST(count(*) AS BIGINT) AS n_modules,
         round(sum(score), 6) AS mass
  FROM pr GROUP BY 1
)
SELECT 'repo_' || rid AS repo, n_modules, mass
FROM agg
ORDER BY mass DESC, rid ASC
LIMIT {topk}
"""


@_materialized
def ws_census(k: int = 2, mod: int = 10) -> str:
    """Watts-Strogatz degree census (twin of `queries.q_ws_census`;
    md5-rewired ring lattice regenerated bit-exactly)."""
    return PREFIX + f"""
, base AS (
  SELECT f.i, j.j,
         md5_number_lower('ws:' || f.i || ':' || j.j) AS h
  FROM files f CROSS JOIN generate_series(1, {k}) j(j)
),
ed AS (
  SELECT i AS src,
         CASE WHEN h % {mod} = 0 THEN
           CASE WHEN CAST((h // {mod}) % p.n AS BIGINT) = i
                THEN CAST(((h // {mod}) % p.n + 1) % p.n AS BIGINT)
                ELSE CAST((h // {mod}) % p.n AS BIGINT) END
         ELSE (i + j) % p.n END AS dst
  FROM base CROSS JOIN params p
),
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ed GROUP BY 1, 2
),
uadj AS (SELECT a AS v FROM und UNION ALL SELECT b FROM und),
deg AS (SELECT v, count(*) AS d FROM uadj GROUP BY v)
SELECT CAST(d AS BIGINT) AS deg,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM deg GROUP BY 1 ORDER BY 1
"""


@_materialized
def ws_bfs_trace(rounds: int = 8, k: int = 2, mod: int = 10) -> str:
    """BFS reach trace over the regenerated WS graph (twin of
    `queries.q_ws_bfs_trace`)."""
    sql = PREFIX + f"""
, base AS (
  SELECT f.i, j.j,
         md5_number_lower('ws:' || f.i || ':' || j.j) AS h
  FROM files f CROSS JOIN generate_series(1, {k}) j(j)
),
ed AS (
  SELECT i AS src,
         CASE WHEN h % {mod} = 0 THEN
           CASE WHEN CAST((h // {mod}) % p.n AS BIGINT) = i
                THEN CAST(((h // {mod}) % p.n + 1) % p.n AS BIGINT)
                ELSE CAST((h // {mod}) % p.n AS BIGINT) END
         ELSE (i + j) % p.n END AS dst
  FROM base CROSS JOIN params p
),
wund AS (
  SELECT src, dst FROM ed WHERE src <> dst
  UNION SELECT dst, src FROM ed WHERE src <> dst
),
wd0 AS (SELECT CAST(0 AS BIGINT) AS i, 0 AS dist)
"""
    prev = "wd0"
    for r in range(1, rounds + 1):
        sql += f"""
, wd{r} AS (
  SELECT i, min(dist) AS dist FROM (
    SELECT i, dist FROM {prev}
    UNION ALL
    SELECT u.dst AS i, dp.dist + 1 AS dist
    FROM wund u JOIN {prev} dp ON dp.i = u.src
  ) GROUP BY i
)"""
        prev = f"wd{r}"
    parts = [
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM wd{r}) AS n_reached"
        for r in range(rounds + 1)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(parts) + "\nORDER BY round\n"


@_materialized
def coverage_greedy(k: int = 5) -> str:
    """Greedy max-coverage selection trace (twin of
    `queries.q_coverage_greedy`; shingle identity = md5-low-64 mod
    2^63, identical digests on both sides)."""
    sql = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
shd AS (
  SELECT DISTINCT doc_id,
         md5_number_lower(s) % 9223372036854775808 AS dig
  FROM (
    SELECT doc_id, unnest(list_distinct(list_transform(
      range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
    ))) AS s FROM toks
  )
),
cov0 AS (SELECT CAST(NULL AS HUGEINT) AS dig WHERE FALSE)
"""
    sel: list[str] = []
    for r in range(1, k + 1):
        notin = (" AND doc_id NOT IN (" + ", ".join(
            f"(SELECT doc_id FROM pick{i})" for i in range(1, r))
            + ")") if r > 1 else ""
        sql += f"""
, gain{r} AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS g
  FROM shd
  WHERE dig NOT IN (SELECT dig FROM cov{r - 1}){notin}
  GROUP BY doc_id
),
pick{r} AS (
  SELECT doc_id, g FROM gain{r} ORDER BY g DESC, doc_id ASC LIMIT 1
),
cov{r} AS (
  SELECT dig FROM cov{r - 1}
  UNION
  SELECT s.dig FROM shd s JOIN pick{r} p ON p.doc_id = s.doc_id
)"""
        sel.append(
            f"SELECT CAST({r} AS BIGINT) AS round, p.doc_id, p.g AS gain, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM cov{r}) "
            f"AS covered_total FROM pick{r} p")
    return sql + "\n" + "\nUNION ALL\n".join(sel) + "\nORDER BY round\n"


@_materialized
def greedy_routing(pairs: int = 20, hmax: int = 12, k: int = 2,
                   mod: int = 10) -> str:
    """Greedy ring-metric routing on the regenerated WS graph (twin of
    `queries.q_greedy_routing`)."""
    sql = PREFIX + f"""
, base AS (
  SELECT f.i, j.j,
         md5_number_lower('ws:' || f.i || ':' || j.j) AS h
  FROM files f CROSS JOIN generate_series(1, {k}) j(j)
),
ed AS (
  SELECT i AS src,
         CASE WHEN h % {mod} = 0 THEN
           CASE WHEN CAST((h // {mod}) % p.n AS BIGINT) = i
                THEN CAST(((h // {mod}) % p.n + 1) % p.n AS BIGINT)
                ELSE CAST((h // {mod}) % p.n AS BIGINT) END
         ELSE (i + j) % p.n END AS dst
  FROM base CROSS JOIN params p
),
wund AS (
  SELECT src, dst FROM ed WHERE src <> dst
  UNION SELECT dst, src FROM ed WHERE src <> dst
),
pr AS (
  SELECT g.p AS p,
         CAST((g.p * 7919) % pp.n AS BIGINT) AS s,
         CAST((g.p * 104729 + 17) % pp.n AS BIGINT) AS t
  FROM generate_series(0, {pairs - 1}) g(p) CROSS JOIN params pp
),
st0 AS (
  SELECT p, s AS c, t,
         CASE WHEN s = t THEN 1 ELSE 0 END AS reached,
         CAST(0 AS BIGINT) AS hops
  FROM pr
)
"""
    prev = "st0"
    for h in range(1, hmax + 1):
        sql += f"""
, pk{h} AS (
  SELECT p, nbr, nd, row_number() OVER (
    PARTITION BY p ORDER BY nd ASC, nbr ASC) AS rn
  FROM (
    SELECT s.p, u.dst AS nbr,
           least(((u.dst - s.t) % pp.n + pp.n) % pp.n,
                 pp.n - ((u.dst - s.t) % pp.n + pp.n) % pp.n) AS nd
    FROM {prev} s JOIN wund u ON u.src = s.c CROSS JOIN params pp
    WHERE s.reached = 0
  )
),
st{h} AS (
  SELECT s.p,
         CASE WHEN s.reached = 1 THEN s.c
              ELSE coalesce(w.nbr, s.c) END AS c,
         s.t,
         CASE WHEN s.reached = 1 THEN 1
              WHEN w.nbr = s.t THEN 1 ELSE 0 END AS reached,
         CASE WHEN s.reached = 1 THEN s.hops
              ELSE CAST({h} AS BIGINT) END AS hops
  FROM {prev} s
  LEFT JOIN (SELECT * FROM pk{h} WHERE rn = 1) w ON w.p = s.p
)"""
        prev = f"st{h}"
    return sql + f"""
SELECT s.p AS pair, CAST(s.reached AS BIGINT) AS reached,
       CASE WHEN s.reached = 1 THEN s.hops
            ELSE CAST({hmax} AS BIGINT) END AS hops,
       CAST(least(((s.c - s.t) % pp.n + pp.n) % pp.n,
                  pp.n - ((s.c - s.t) % pp.n + pp.n) % pp.n)
            AS BIGINT) AS final_dist
FROM {prev} s CROSS JOIN params pp
ORDER BY pair
"""


def lru_audit(caps=(2, 4, 8)) -> str:
    """LRU stack-distance hit counts per (user, capacity) — independent
    re-derivation via lag() + a correlated distinct-count over the
    inter-access window (twin of `queries.q_lru_audit`)."""
    cap_list = ", ".join(str(c) for c in caps)
    return f"""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(ts) OVER w AS pts, lag(event_id) OVER w AS pid
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
dist AS (
  SELECT o.user_id,
         (SELECT count(DISTINCT e2.event_type) FROM events e2
          WHERE e2.user_id = o.user_id
            AND (e2.ts > o.pts OR (e2.ts = o.pts AND e2.event_id > o.pid))
            AND (e2.ts < o.ts OR (e2.ts = o.ts AND e2.event_id < o.event_id))
         ) + 1 AS sd
  FROM ordered o WHERE o.pts IS NOT NULL
),
caps AS (SELECT unnest([{cap_list}]) AS capacity),
acc AS (SELECT user_id, count(*) AS accesses FROM events GROUP BY 1),
hit AS (
  SELECT d.user_id, c.capacity, count(*) AS hits
  FROM dist d JOIN caps c ON d.sd <= c.capacity
  GROUP BY 1, 2
)
SELECT a.user_id, CAST(c.capacity AS BIGINT) AS capacity,
       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       CAST(a.accesses AS BIGINT) AS accesses
FROM acc a CROSS JOIN caps c
LEFT JOIN hit h ON h.user_id = a.user_id AND h.capacity = c.capacity
"""


def _voronoi_rounds(L: int, iters: int, state: str, seeds: str,
                    skip: int | None = None):
    """One unrolled composite-BFS chain (seeds + state CTEs, names
    parameterized so two chains can share a query); returns
    (sql_fragment, last_state_name). ``skip`` drops one landmark."""
    w = L + 1
    cond = f" WHERE g.l <> {skip}" if skip is not None else ""
    sql = f"""
, {seeds} AS (
  SELECT i, min(lm) AS lm FROM (
    SELECT g.l AS lm, CAST((g.l * 7919 + 5) % p.n AS BIGINT) AS i
    FROM generate_series(0, {L - 1}) g(l) CROSS JOIN params p{cond}
  ) GROUP BY i
),
{state}0 AS (SELECT i, CAST(lm AS BIGINT) AS val FROM {seeds})
"""
    prev = f"{state}0"
    for k in range(1, iters + 1):
        sql += f"""
, {state}{k} AS (
  SELECT i, min(val) AS val FROM (
    SELECT i, val FROM {prev}
    UNION ALL
    SELECT u.dst AS i, sp.val + {w} AS val
    FROM und u JOIN {prev} sp ON sp.i = u.src
  ) GROUP BY i
)"""
        prev = f"{state}{k}"
    return sql, prev


def _voronoi_chain(L: int, iters: int):
    """PREFIX + undirected view + the full-landmark chain; returns
    (sql_through_last_state, last_state_name)."""
    head = PREFIX + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
)"""
    body, prev = _voronoi_rounds(L, iters, "s", "seeds")
    return head + body, prev


@_materialized
def voronoi_cells(L: int = 8, iters: int = 12) -> str:
    """Graph Voronoi cells around landmarks (l*7919+5) % n — unrolled
    multi-source BFS carrying the composite val = dist*(L+1) + landmark
    (numeric min == lexicographic (dist, lm) min; twin of
    `queries.q_voronoi_cells`)."""
    w = L + 1
    sql, prev = _voronoi_chain(L, iters)
    return sql + f"""
SELECT CAST(s.val % {w} AS BIGINT) AS landmark,
       'm_' || sd.i AS seed_label,
       CAST(count(*) AS BIGINT) AS cell_size,
       CAST(sum(s.val // {w}) AS BIGINT) AS dist_sum,
       CAST(max(s.val // {w}) AS BIGINT) AS ecc
FROM {prev} s JOIN seeds sd ON sd.lm = s.val % {w}
GROUP BY 1, 2
"""


@_materialized
def voronoi_quotient(L: int = 8, iters: int = 12) -> str:
    """Ordered adjacent-pair counts between Voronoi cells (twin of
    `queries.q_voronoi_quotient`): the X^T A X quotient re-derived
    relationally over the undirected distinct-pair view."""
    w = L + 1
    sql, prev = _voronoi_chain(L, iters)
    return sql + f"""
SELECT CAST(sa.val % {w} AS BIGINT) AS cell_a,
       CAST(sb.val % {w} AS BIGINT) AS cell_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM und u
JOIN {prev} sa ON sa.i = u.src
JOIN {prev} sb ON sb.i = u.dst
GROUP BY 1, 2
"""


def fdr_select(M: int = 1_000_003, alpha_den: int = 20,
               sig_mod: int = 7, sig_div: int = 997) -> str:
    """Benjamini-Hochberg selection per language (twin of
    `queries.q_fdr_select`): cumulative rank via a RANGE window (peers
    included), exact integer feasibility test."""
    return f"""
WITH p AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % {sig_mod} = 0
              THEN ((doc_id * 2654435761) % {M}) // {sig_div}
              ELSE (doc_id * 2654435761) % {M} END AS p_int
  FROM documents
),
mm AS (SELECT count(*) AS m FROM p),
r AS (
  SELECT p_int,
         count(*) OVER (ORDER BY p_int RANGE UNBOUNDED PRECEDING) AS rk
  FROM p
),
feas AS (
  SELECT p_int, rk FROM r CROSS JOIN mm
  WHERE p_int * {alpha_den} * m <= rk * {M}
),
thr AS (
  SELECT coalesce(max(p_int), -1) AS thr,
         coalesce(max(rk), 0) AS k_star
  FROM feas
)
SELECT p.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN p.p_int <= t.thr THEN 1 ELSE 0 END) AS BIGINT)
         AS n_selected,
       CAST(t.k_star AS BIGINT) AS k_star,
       CAST(t.thr AS BIGINT) AS thr
FROM p CROSS JOIN thr t
GROUP BY p.lang, t.k_star, t.thr
"""


@_materialized
def stopping_audit() -> str:
    """Secretary 1/3-rule stopping audit per user (twin of
    `queries.q_stopping_audit`)."""
    return """
WITH o AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS m
  FROM events
),
ph AS (
  SELECT user_id, max(value) AS pmax FROM o WHERE rn <= m // 3 GROUP BY 1
),
cand AS (
  SELECT o.user_id, o.event_id, o.value, o.rn
  FROM o LEFT JOIN ph ON ph.user_id = o.user_id
  WHERE o.rn > o.m // 3 AND (ph.pmax IS NULL OR o.value > ph.pmax)
),
first_cand AS (
  SELECT user_id, event_id, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY rn) AS r
    FROM cand
  ) WHERE r = 1
),
last_ev AS (
  SELECT user_id, event_id, value FROM o WHERE rn = m
),
mx AS (SELECT user_id, max(value) AS vmax, count(*) AS m
       FROM events GROUP BY 1)
SELECT mx.user_id, CAST(mx.m AS BIGINT) AS m,
       CAST(coalesce(fc.event_id, le.event_id) AS BIGINT)
         AS picked_event_id,
       coalesce(fc.value, le.value) AS picked_value,
       CAST(CASE WHEN coalesce(fc.value, le.value) = mx.vmax
                 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM mx
JOIN last_ev le ON le.user_id = mx.user_id
LEFT JOIN first_cand fc ON fc.user_id = mx.user_id
"""


@_materialized
def critical_path(iters: int = 12) -> str:
    """Weighted earliest-finish histogram on the dense-order DAG with
    len(u,v) = 1 + (u + 2v) % 7 over file ids (twin of
    `queries.q_critical_path`; unrolled max-plus relaxation)."""
    sql = PREFIX + """
, dense AS (SELECT i, row_number() OVER (ORDER BY label) - 1 AS d
            FROM verts),
dag AS (
  SELECT DISTINCT ds.d AS s, dd.d AS t,
         CAST(1 + (e.src + 2 * e.dst) % 7 AS BIGINT) AS len
  FROM edges e JOIN dense ds ON ds.i = e.src
               JOIN dense dd ON dd.i = e.dst
  WHERE ds.d < dd.d
),
f0 AS (SELECT d AS v, CAST(0 AS BIGINT) AS ef FROM dense)
"""
    prev = "f0"
    for k in range(1, iters + 1):
        sql += f"""
, f{k} AS (
  SELECT p.v, greatest(p.ef, coalesce(m.mx, p.ef)) AS ef
  FROM {prev} p
  LEFT JOIN (SELECT g.t AS v, max(pp.ef + g.len) AS mx
             FROM dag g JOIN {prev} pp ON pp.v = g.s
             GROUP BY g.t) m ON m.v = p.v
)"""
        prev = f"f{k}"
    return sql + f"""
SELECT CAST(ef AS BIGINT) AS ef, CAST(count(*) AS BIGINT) AS cnt
FROM {prev} GROUP BY ef
"""


def morton_census(bits: int = 8) -> str:
    """Z-order cell census over the first two embedding dims (twin of
    `queries.q_morton_census`); bit interleave unrolled as int ops."""
    terms = " | ".join(
        f"(((q0 >> {b}) & 1) << {2 * b}) | (((q1 >> {b}) & 1) << {2 * b + 1})"
        for b in range(bits)
    )
    return f"""
WITH q AS (
  SELECT label,
         CAST(least(greatest(
           floor((CAST(embedding[1] AS DOUBLE) + 1.0) * 128.0), 0), 255)
           AS BIGINT) AS q0,
         CAST(least(greatest(
           floor((CAST(embedding[2] AS DOUBLE) + 1.0) * 128.0), 0), 255)
           AS BIGINT) AS q1
  FROM embeddings
),
z AS (SELECT label, {terms} AS cell FROM q)
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(DISTINCT label) AS BIGINT) AS n_labels
FROM z GROUP BY cell
"""


@_materialized
def stable_matching(C: int = 4, R: int = 10, M: int = 100003) -> str:
    """Gale-Shapley deferred acceptance after R synchronous rounds
    (twin of `queries.q_stable_matching`): unrolled state recurrence
    (s, ptr, held) with bounded candidate lists."""
    sql = PREFIX + """
, g0 AS (SELECT i AS s, CAST(0 AS BIGINT) AS ptr,
         CAST(-1 AS BIGINT) AS held FROM files)
"""
    prev = "g0"
    for k in range(1, R + 1):
        sql += f"""
, c{k} AS (
  SELECT s, ptr,
         CASE WHEN held >= 0 THEN held
              ELSE (s * 101 + ptr * 4099 + 17)
                   % greatest(p.n // 3, 1) END AS r
  FROM {prev} CROSS JOIN params p
  WHERE held >= 0 OR ptr < {C}
),
w{k} AS (
  SELECT s, ptr, r,
         row_number() OVER (PARTITION BY r
                            ORDER BY (r * 7919 + s * 104729 + 11) % {M}, s) AS rn
  FROM c{k}
),
g{k} AS (
  SELECT g.s,
         CASE WHEN w.rn > 1 THEN g.ptr + 1 ELSE g.ptr END AS ptr,
         CASE WHEN w.rn = 1 THEN w.r ELSE CAST(-1 AS BIGINT) END AS held
  FROM {prev} g LEFT JOIN w{k} w ON w.s = g.s
)"""
        prev = f"g{k}"
    return sql + f"""
SELECT CAST(CASE WHEN held >= 0 THEN ptr ELSE -1 END AS BIGINT)
         AS rank_choice,
       CAST(count(*) AS BIGINT) AS cnt
FROM {prev} GROUP BY 1
"""


def ipc_roundtrip() -> str:
    """Arrow IPC roundtrip census — same relational census as the JSONL
    twin (`queries.q_ipc_roundtrip`); the interchange format differs,
    the surviving numbers must not."""
    return jsonl_roundtrip()


def ring_balance(W: int = 16, V: int = 8, M: int = 1 << 20) -> str:
    """Consistent-hash ring placement per worker (twin of
    `queries.q_ring_balance`): first vnode clockwise, wrap to the ring
    minimum, ties by (pos, w, v)."""
    return PREFIX + f"""
, ring AS (
  SELECT w.w, v.v, (w.w * 104729 + v.v * 7919 + 1) % {M} AS pos
  FROM generate_series(0, {W - 1}) w(w)
  CROSS JOIN generate_series(0, {V - 1}) v(v)
),
items AS (
  SELECT i, (i * 2654435761) % {M} AS ipos FROM files
),
assigned AS (
  SELECT it.i,
         coalesce(
           (SELECT r.w FROM ring r WHERE r.pos >= it.ipos
            ORDER BY r.pos, r.w, r.v LIMIT 1),
           (SELECT r.w FROM ring r ORDER BY r.pos, r.w, r.v LIMIT 1)
         ) AS worker
  FROM items it
)
SELECT CAST(worker AS BIGINT) AS worker,
       CAST(count(*) AS BIGINT) AS n_items
FROM assigned GROUP BY worker
"""


def equalize_hist() -> str:
    """Global census of per-image histogram-equalized pixels (twin of
    `queries.q_equalize_hist`; make_blob arithmetic, RANGE window =
    count of pixels <= p within the image)."""
    return """
WITH dims AS (
  SELECT doc_id AS item_id,
         CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS width,
         CAST(8 + (doc_id % 3) * 4 AS BIGINT) AS height
  FROM documents
),
pix AS (
  SELECT d.item_id, (r.i * (d.item_id + 7)) % 251 AS p,
         d.width * d.height AS N
  FROM dims d CROSS JOIN range(384) r(i)
  WHERE r.i < d.width * d.height
),
cum AS (
  SELECT item_id, p, N,
         count(*) OVER (PARTITION BY item_id ORDER BY p
                        RANGE UNBOUNDED PRECEDING) AS c
  FROM pix
)
SELECT CAST((255 * c) // N AS BIGINT) AS eq_pixel,
       CAST(count(*) AS BIGINT) AS cnt
FROM cum GROUP BY 1
"""


@_materialized
def landmark_dist_audit(L: int = 8, P: int = 12, iters: int = 12) -> str:
    """Landmark-oracle estimate vs true hop distance for P sample pairs
    (twin of `queries.q_landmark_dist_audit`): two grouped unrolled
    BFS chains (per-landmark and per-source), both depth-capped."""
    sql = PREFIX + f"""
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
lmseed AS (
  SELECT g.l, CAST((g.l * 7919 + 5) % p.n AS BIGINT) AS i
  FROM generate_series(0, {L - 1}) g(l) CROSS JOIN params p
),
pr AS (
  SELECT g.p,
         CAST((g.p * 7919 + 3) % pp.n AS BIGINT) AS s,
         CAST((g.p * 104729 + 31) % pp.n AS BIGINT) AS t
  FROM generate_series(0, {P - 1}) g(p) CROSS JOIN params pp
),
ld0 AS (SELECT l, i, CAST(0 AS BIGINT) AS d FROM lmseed),
sd0 AS (SELECT p, s AS i, CAST(0 AS BIGINT) AS d FROM pr)
"""
    lp, sp = "ld0", "sd0"
    for k in range(1, iters + 1):
        sql += f"""
, ld{k} AS (
  SELECT l, i, min(d) AS d FROM (
    SELECT l, i, d FROM {lp}
    UNION ALL
    SELECT x.l, u.dst AS i, x.d + 1 AS d
    FROM und u JOIN {lp} x ON x.i = u.src
  ) GROUP BY l, i
),
sd{k} AS (
  SELECT p, i, min(d) AS d FROM (
    SELECT p, i, d FROM {sp}
    UNION ALL
    SELECT x.p, u.dst AS i, x.d + 1 AS d
    FROM und u JOIN {sp} x ON x.i = u.src
  ) GROUP BY p, i
)"""
        lp, sp = f"ld{k}", f"sd{k}"
    return sql + f"""
SELECT pr.p AS pair,
       CAST(coalesce(tr.d, -1) AS BIGINT) AS true_d,
       CAST(coalesce(es.est, -1) AS BIGINT) AS est_d
FROM pr
LEFT JOIN {sp} tr ON tr.p = pr.p AND tr.i = pr.t
LEFT JOIN (
  SELECT pr2.p, min(a.d + b.d) AS est
  FROM pr pr2
  JOIN {lp} a ON a.i = pr2.s
  JOIN {lp} b ON b.i = pr2.t AND b.l = a.l
  GROUP BY pr2.p
) es ON es.p = pr.p
ORDER BY pair
"""


def ordinal_patterns() -> str:
    """Sliding-window-3 ordinal pattern census per event type (twin of
    `queries.q_ordinal_patterns`); ranks via pairwise comparisons with
    earlier-day tie preference."""
    return """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type,
         lag(c, 2) OVER (PARTITION BY event_type ORDER BY day) AS v0,
         lag(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS v1,
         c AS v2
  FROM daily
),
pat AS (
  SELECT event_type,
         100 * (CASE WHEN v1 < v0 THEN 1 ELSE 0 END
                + CASE WHEN v2 < v0 THEN 1 ELSE 0 END)
         + 10 * (CASE WHEN v0 <= v1 THEN 1 ELSE 0 END
                 + CASE WHEN v2 < v1 THEN 1 ELSE 0 END)
         + (CASE WHEN v0 <= v2 THEN 1 ELSE 0 END
            + CASE WHEN v1 <= v2 THEN 1 ELSE 0 END) AS pattern
  FROM win WHERE v0 IS NOT NULL
)
SELECT event_type, CAST(pattern AS BIGINT) AS pattern,
       CAST(count(*) AS BIGINT) AS cnt
FROM pat GROUP BY 1, 2
"""


def ldiversity(ls=(2, 3, 4)) -> str:
    """l-diversity census over hour cells (twin of
    `queries.q_ldiversity`)."""
    l_list = ", ".join(str(x) for x in ls)
    return f"""
WITH cells AS (
  SELECT epoch_us(ts) // 3600000000 AS cell,
         count(*) AS n_events,
         count(DISTINCT event_type) AS n_types
  FROM events GROUP BY 1
),
ls AS (SELECT unnest([{l_list}]) AS l)
SELECT CAST(ls.l AS BIGINT) AS l,
       CAST(coalesce(sum(CASE WHEN c.n_types < ls.l THEN 1 END), 0)
            AS BIGINT) AS n_cells_below,
       CAST(coalesce(sum(CASE WHEN c.n_types < ls.l
                               THEN c.n_events END), 0)
            AS BIGINT) AS n_events_below
FROM ls LEFT JOIN cells c ON true
GROUP BY ls.l
"""


@_materialized
def voronoi_failover(L: int = 8, iters: int = 12) -> str:
    """Redistribution of landmark 0's Voronoi cell after dropping it
    (twin of `queries.q_voronoi_failover`): full chain and survivor
    chain side by side, histogram over the survivors' cells."""
    w = L + 1
    sql, sp = _voronoi_chain(L, iters)
    body, rp = _voronoi_rounds(L, iters, "r", "rseeds", skip=0)
    return sql + body + f"""
SELECT CAST(coalesce(r.val % {w}, -1) AS BIGINT) AS new_cell,
       CAST(count(*) AS BIGINT) AS n_reassigned
FROM {sp} s LEFT JOIN {rp} r ON r.i = s.i
WHERE s.val % {w} = 0
GROUP BY 1
"""


def lcp_census(cap: int = 64, bucket: int = 8) -> str:
    """Adjacent-pair LCP histogram over text-sorted docs (twin of
    `queries.q_lcp_census`); LCP = monotone prefix-equality indicator
    sum, length-clamped."""
    terms = " + ".join(
        f"CASE WHEN substr(text, 1, {k}) = substr(prev, 1, {k}) "
        f"THEN 1 ELSE 0 END"
        for k in range(1, cap + 1)
    )
    return f"""
WITH s AS (
  SELECT text, lag(text) OVER (ORDER BY text) AS prev FROM documents
),
p AS (
  SELECT least({terms},
               length(text), length(prev), {cap}) AS lcp
  FROM s WHERE prev IS NOT NULL
)
SELECT CAST(lcp // {bucket} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM p GROUP BY 1
"""


@_materialized
def rr_histogram(coin_mod: int = 3) -> str:
    """Randomized-response histogram + debiased estimator numerator
    (twin of `queries.q_rr_histogram`)."""
    return f"""
WITH kk AS (
  SELECT count(DISTINCT event_type) AS K, count(*) AS N FROM events
),
types AS (
  SELECT event_type, row_number() OVER (ORDER BY event_type) - 1 AS ti
  FROM (SELECT DISTINCT event_type FROM events)
),
h AS (
  SELECT event_type, (event_id * 2654435761) % 1000003 AS hv
  FROM events
),
rep AS (
  SELECT CASE WHEN h.hv % {coin_mod} <> 0 THEN h.event_type
              ELSE tt.event_type END AS rep
  FROM h CROSS JOIN kk
  LEFT JOIN types tt ON tt.ti = (h.hv // {coin_mod}) % kk.K
),
tc AS (SELECT event_type, count(*) AS true_cnt FROM events GROUP BY 1),
nc AS (SELECT rep AS event_type, count(*) AS noisy_cnt
       FROM rep GROUP BY 1)
SELECT t.event_type,
       CAST(coalesce(tc.true_cnt, 0) AS BIGINT) AS true_cnt,
       CAST(coalesce(nc.noisy_cnt, 0) AS BIGINT) AS noisy_cnt,
       CAST(9 * kk.K * coalesce(nc.noisy_cnt, 0) - 3 * kk.N AS BIGINT)
         AS est_num6k
FROM types t CROSS JOIN kk
LEFT JOIN tc ON tc.event_type = t.event_type
LEFT JOIN nc ON nc.event_type = t.event_type
"""


@_materialized
def dag_negative_sssp(iters: int = 12, shift: int = 4) -> str:
    """Negative-weight shortest-path histogram on the dense-order DAG,
    len(u,v) = 1 + (u + 2v) % 7 - shift (twin of
    `queries.q_dag_negative_sssp`; unrolled min-plus relaxation)."""
    sql = PREFIX + f"""
, dense AS (SELECT i, row_number() OVER (ORDER BY label) - 1 AS d
            FROM verts),
dag AS (
  SELECT DISTINCT ds.d AS s, dd.d AS t,
         CAST(1 + (e.src + 2 * e.dst) % 7 - {shift} AS BIGINT) AS len
  FROM edges e JOIN dense ds ON ds.i = e.src
               JOIN dense dd ON dd.i = e.dst
  WHERE ds.d < dd.d
),
n0 AS (SELECT d AS v, CAST(0 AS BIGINT) AS dist FROM dense)
"""
    prev = "n0"
    for k in range(1, iters + 1):
        sql += f"""
, n{k} AS (
  SELECT p.v, least(p.dist, coalesce(m.mn, p.dist)) AS dist
  FROM {prev} p
  LEFT JOIN (SELECT g.t AS v, min(pp.dist + g.len) AS mn
             FROM dag g JOIN {prev} pp ON pp.v = g.s
             GROUP BY g.t) m ON m.v = p.v
)"""
        prev = f"n{k}"
    return sql + f"""
SELECT CAST(dist AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS cnt
FROM {prev} GROUP BY dist
"""


@_materialized
def jl_distortion(dim: int = 64, K: int = 8, P: int = 16,
                  qscale: int = 1 << 20) -> str:
    """Exact integer JL distortion pairs (twin of
    `queries.q_jl_distortion`)."""
    return f"""
WITH q AS (
  SELECT vec_id, CAST(g.d AS BIGINT) AS dim,
         CAST(floor((CAST(embedding[CAST(g.d AS INT)] AS DOUBLE) + 0.5)
                    * {qscale}) AS BIGINT) AS q
  FROM embeddings CROSS JOIN generate_series(1, {dim}) g(d)
),
sgn AS (
  SELECT d.d, k.k,
         CASE WHEN (d.d * 31 + k.k * 17) % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM generate_series(0, {dim - 1}) d(d)
  CROSS JOIN generate_series(0, {K - 1}) k(k)
),
proj AS (
  SELECT q.vec_id, sg.k, sum(q.q * sg.s) AS p
  FROM q JOIN sgn sg ON sg.d = q.dim - 1
  GROUP BY 1, 2
),
vv AS (SELECT count(*) AS V FROM embeddings),
pairs AS (
  SELECT g.p, (g.p * 37 + 1) % vv.V AS a, (g.p * 61 + 7) % vv.V AS b
  FROM generate_series(0, {P - 1}) g(p) CROSS JOIN vv
),
od AS (
  SELECT pr.p, sum((qa.q - qb.q) * (qa.q - qb.q)) AS d_orig
  FROM pairs pr
  JOIN q qa ON qa.vec_id = pr.a
  JOIN q qb ON qb.vec_id = pr.b AND qb.dim = qa.dim
  GROUP BY 1
),
pd AS (
  SELECT pr.p, sum((pa.p - pb.p) * (pa.p - pb.p)) AS d_proj
  FROM pairs pr
  JOIN proj pa ON pa.vec_id = pr.a
  JOIN proj pb ON pb.vec_id = pr.b AND pb.k = pa.k
  GROUP BY 1
)
SELECT pr.p AS pair, CAST(od.d_orig AS BIGINT) AS d_orig,
       CAST(pd.d_proj AS BIGINT) AS d_proj
FROM pairs pr JOIN od ON od.p = pr.p JOIN pd ON pd.p = pr.p
ORDER BY pair
"""


def group_split(mod: int = 10) -> str:
    """Repo-disjoint split census (twin of `queries.q_group_split`)."""
    return PREFIX + f"""
, r AS (
  SELECT i % 100 AS rnum, count(*) AS nf FROM files GROUP BY 1
),
a AS (
  SELECT rnum, nf,
         CASE WHEN (rnum * 2654435761) % {mod} < 8 THEN 'train'
              WHEN (rnum * 2654435761) % {mod} = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM r
)
SELECT split, CAST(count(*) AS BIGINT) AS n_repos,
       CAST(sum(nf) AS BIGINT) AS n_files
FROM a GROUP BY split
"""


@_materialized
def dag_transitive(iters_unused: int = 0) -> str:
    """Transitive-reduction census of the dense-order DAG (twin of
    `queries.q_dag_transitive`)."""
    return PREFIX + """
, dense AS (SELECT i, row_number() OVER (ORDER BY label) - 1 AS d
            FROM verts),
dag AS (
  SELECT DISTINCT ds.d AS s, dd.d AS t
  FROM edges e JOIN dense ds ON ds.i = e.src
               JOIN dense dd ON dd.i = e.dst
  WHERE ds.d < dd.d
),
p2 AS (
  SELECT a.s, b.t, count(*) AS m
  FROM dag a JOIN dag b ON b.s = a.t
  GROUP BY 1, 2
),
red AS (
  SELECT d.s, d.t, coalesce(p.m, 0) AS m
  FROM dag d LEFT JOIN p2 p ON p.s = d.s AND p.t = d.t
)
SELECT CAST(m AS BIGINT) AS two_paths,
       CAST(count(*) AS BIGINT) AS n_edges
FROM red GROUP BY m
"""


@_materialized
def replication_factor(g: int) -> str:
    """Vertex replication histogram over the 2D owner rule (twin of
    `queries.q_replication_factor`)."""
    return PREFIX + f"""
, vids AS (
  SELECT i, row_number() OVER (ORDER BY label) - 1 AS vid FROM verts
),
ls AS (SELECT greatest(n // {g}, 1) AS v FROM params),
be AS (
  SELECT vs.vid AS s, vd.vid AS d,
         least(vd.vid // ls.v, {g - 1}) * {g}
           + least(vs.vid // ls.v, {g - 1}) AS bid
  FROM edges e
  JOIN vids vs ON vs.i = e.src
  JOIN vids vd ON vd.i = e.dst
  CROSS JOIN ls
),
vb AS (
  SELECT DISTINCT s AS v, bid FROM be
  UNION
  SELECT DISTINCT d AS v, bid FROM be
),
rep AS (SELECT v, count(*) AS r FROM vb GROUP BY v)
SELECT CAST(r AS BIGINT) AS replication,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM rep GROUP BY r
"""


@_materialized
def fair_share(num: int = 6, den: int = 10) -> str:
    """Max-min fair water-filling across sources (twin of
    `queries.q_fair_share`); closed-form prefix test in exact
    integers."""
    return f"""
WITH d AS (
  SELECT source, count(*) AS dem FROM documents GROUP BY 1
),
cap AS (
  SELECT ({num} * sum(dem)) // {den} AS C, count(*) AS m FROM d
),
s AS (
  SELECT source, dem,
         row_number() OVER (ORDER BY dem, source) AS rk,
         sum(dem) OVER (ORDER BY dem, source
                        ROWS UNBOUNDED PRECEDING) AS pref
  FROM d
),
kk AS (
  SELECT coalesce(max(s.rk), 0) AS k
  FROM s CROSS JOIN cap
  WHERE s.dem * (cap.m - s.rk + 1) <= cap.C - (s.pref - s.dem)
),
pk AS (
  SELECT coalesce((SELECT pref FROM s JOIN kk ON s.rk = kk.k), 0) AS Pk
),
lev AS (
  SELECT CASE WHEN cap.m > kk.k
              THEN (cap.C - pk.Pk) // (cap.m - kk.k) ELSE 0 END AS L,
         CASE WHEN cap.m > kk.k
              THEN (cap.C - pk.Pk) % (cap.m - kk.k) ELSE 0 END AS r
  FROM cap CROSS JOIN kk CROSS JOIN pk
)
SELECT s.source, CAST(s.dem AS BIGINT) AS demand,
       CAST(CASE WHEN s.rk <= kk.k THEN s.dem
                 WHEN s.rk - kk.k <= lev.r THEN lev.L + 1
                 ELSE lev.L END AS BIGINT) AS alloc
FROM s CROSS JOIN kk CROSS JOIN lev
"""


def dedup_canonical(tau: float = 0.5, rounds: int = 6,
                    df_cap: int = 1000) -> str:
    """Keep-longest canonicalization over the near-dup clusters (twin
    of `queries.q_dedup_canonical`; nests the dup_clusters chain)."""
    return f"""
WITH clus AS (
{dup_clusters(tau, rounds, df_cap)}
),
j AS (
  SELECT c.cluster, c.doc_id, d.n_chars
  FROM clus c JOIN documents d ON d.doc_id = c.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster
                               ORDER BY n_chars DESC, doc_id) AS rn
  FROM j
),
agg AS (
  SELECT cluster, count(*) AS n_members, sum(n_chars) AS tot
  FROM j GROUP BY 1
)
SELECT CAST(a.cluster AS BIGINT) AS cluster,
       CAST(r.doc_id AS BIGINT) AS rep_doc,
       CAST(a.n_members AS BIGINT) AS n_members,
       CAST(r.n_chars AS BIGINT) AS chars_kept,
       CAST(a.tot - r.n_chars AS BIGINT) AS chars_dropped
FROM agg a JOIN ranked r ON r.cluster = a.cluster AND r.rn = 1
"""


def encoding_planner(cols=("l_returnflag", "l_linestatus",
                           "l_quantity")) -> str:
    """Per-column RLE/dict/plain census in primary-key order (twin of
    `queries.q_encoding_planner`)."""
    parts = []
    for c in cols:
        parts.append(f"""
SELECT '{c}' AS col,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN pv IS NULL OR v <> pv THEN 1 ELSE 0 END)
            AS BIGINT) AS n_runs,
       (SELECT CAST(count(DISTINCT {c}) AS BIGINT) FROM lineitem)
         AS n_distinct
FROM (
  SELECT {c} AS v,
         lag({c}) OVER (ORDER BY l_orderkey, l_linenumber) AS pv
  FROM lineitem
)""")
    return "\nUNION ALL\n".join(parts)


def diversity_index() -> str:
    """Exact-integer Gini-Simpson + Berger-Parker per source (twin of
    `queries.q_diversity_index`)."""
    return """
WITH sl AS (
  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(sum(c * (c - 1)) AS BIGINT) AS simpson_num,
       CAST(sum(c) * (sum(c) - 1) AS BIGINT) AS simpson_den,
       CAST(max(c) AS BIGINT) AS berger_max
FROM sl GROUP BY source
"""


@_materialized
def cuckoo_feasibility(rounds: int = 48) -> str:
    """Cuckoo bucket-graph component excess census (twin of
    `queries.q_cuckoo_feasibility`); M = 2^ceil(log2 n) derived from
    the corpus, md5 bucket hashes."""
    sql = PREFIX + f"""
, mm AS (
  SELECT CAST(power(2, ceil(log2(n))) AS BIGINT) AS M FROM params
),
ck AS (
  SELECT md5_number_lower('ck1:' || i) % mm.M AS u,
         md5_number_lower('ck2:' || i) % mm.M AS v
  FROM files CROSS JOIN mm
),
cund AS (
  SELECT u, v FROM ck UNION ALL SELECT v AS u, u AS v FROM ck
),
c0 AS (SELECT DISTINCT u AS v, u AS lbl FROM cund)
"""
    prev = "c0"
    for k in range(1, rounds + 1):
        sql += f"""
, c{k}n AS (
  SELECT v, min(lbl) AS lbl FROM (
    SELECT v, lbl FROM {prev}
    UNION ALL
    SELECT e.v AS v, l.lbl FROM cund e JOIN {prev} l ON l.v = e.u
  ) GROUP BY v
),
c{k} AS (
  SELECT a.v, least(a.lbl, coalesce(b.lbl, a.lbl)) AS lbl
  FROM c{k}n a LEFT JOIN c{k}n b ON b.v = a.lbl
)"""
        prev = f"c{k}"
    return sql + f"""
, nb AS (SELECT lbl, count(*) AS n_buckets FROM {prev} GROUP BY 1),
ek AS (
  SELECT l.lbl, count(*) AS n_keys
  FROM ck k JOIN {prev} l ON l.v = k.u
  GROUP BY 1
),
comp AS (
  SELECT nb.lbl, nb.n_buckets, coalesce(ek.n_keys, 0) AS n_keys
  FROM nb LEFT JOIN ek ON ek.lbl = nb.lbl
)
SELECT CAST(n_keys - n_buckets AS BIGINT) AS excess,
       CAST(count(*) AS BIGINT) AS n_components,
       CAST(sum(n_keys) AS BIGINT) AS n_keys
FROM comp GROUP BY 1
"""


def policy_scan(patterns=("window window", "batch batch batch",
                          "^the ")) -> str:
    """Per-(pattern, lang) regex match counts (twin of
    `queries.q_policy_scan`); newline spliced via chr(10)."""
    parts = []
    for i, p in enumerate(patterns):
        lit = p.replace("\n", "' || chr(10) || '")
        parts.append(f"""
SELECT CAST({i} AS BIGINT) AS pattern_id, lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
WHERE regexp_matches(text, '{lit}')
GROUP BY lang""")
    return "\nUNION ALL\n".join(parts)


def replica_spread(W: int = 16, R: int = 4, K: int = 3) -> str:
    """Distinct-rack spread census of hash replica placement (twin of
    `queries.q_replica_spread`)."""
    cols = ", ".join(
        f"(md5_number_lower('rp:' || i || ':' || {j}) % {W}) % {R} AS r{j}"
        for j in range(K))
    distinct = f"len(list_distinct([{', '.join(f'r{j}' for j in range(K))}]))"
    return PREFIX + f"""
, pl AS (SELECT {cols} FROM files)
SELECT CAST({distinct} AS BIGINT) AS n_racks,
       CAST(count(*) AS BIGINT) AS n_objects
FROM pl GROUP BY 1
"""


@_materialized
def d2_similarity() -> str:
    """Cross-language D2 bigram dot products (twin of
    `queries.q_d2_similarity`)."""
    return """
WITH toks AS (
  SELECT lang, string_split(text, ' ') AS t FROM documents
),
bi AS (
  SELECT lang,
         unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i + 1])) AS g
  FROM toks
),
c AS (SELECT lang, g, count(*) AS c FROM bi GROUP BY 1, 2)
SELECT a.lang AS lang_a, b.lang AS lang_b,
       CAST(sum(a.c * b.c) AS BIGINT) AS d2
FROM c a JOIN c b ON b.g = a.g AND a.lang < b.lang
GROUP BY 1, 2
"""


@_materialized
def weighted_voronoi(L: int = 8, iters: int = 16,
                     frac: int = 16) -> str:
    """Weighted directed Voronoi cells via the dyadic dist + lm/16
    composite (twin of `queries.q_weighted_voronoi`); lengths
    1 + (src + 2*dst) % 7 on the directed edge table."""
    sql = PREFIX + f"""
, wedges AS (
  SELECT src, dst,
         CAST(1 + (src + 2 * dst) % 7 AS DOUBLE) AS len
  FROM edges
),
vseeds AS (
  SELECT i, min(lm) AS lm FROM (
    SELECT g.l AS lm, CAST((g.l * 7919 + 5) % p.n AS BIGINT) AS i
    FROM generate_series(0, {L - 1}) g(l) CROSS JOIN params p
  ) GROUP BY i
),
w0 AS (SELECT i, CAST(lm AS DOUBLE) / {frac} AS val FROM vseeds)
"""
    prev = "w0"
    for k in range(1, iters + 1):
        sql += f"""
, w{k} AS (
  SELECT i, min(val) AS val FROM (
    SELECT i, val FROM {prev}
    UNION ALL
    SELECT e.dst AS i, sp.val + e.len AS val
    FROM wedges e JOIN {prev} sp ON sp.i = e.src
  ) GROUP BY i
)"""
        prev = f"w{k}"
    return sql + f"""
SELECT CAST(round((val - floor(val)) * {frac}) AS BIGINT) AS landmark,
       CAST(count(*) AS BIGINT) AS cell_size,
       CAST(sum(floor(val)) AS BIGINT) AS dist_sum,
       CAST(max(floor(val)) AS BIGINT) AS ecc
FROM {prev}
GROUP BY 1
"""
