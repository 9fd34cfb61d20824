"""relational layer (4/7): the core ORACLES table plus drift/governance audits and the r3
batch of statistics/streaming operators.

Split out of pipelines/relational.py (r4) with ZERO behavior change —
statements keep their original order; ``relational`` re-exports
everything, and ORACLES entries registered here mutate the shared dict
owned by rel_audit_core (or the facade-merged view). See
pipelines/relational.py for the facade contract.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..stages.fastagg import fast_groupby_agg, live_arrow
from .queries import JOIN_PARTS, T, _canon_stage, _queries_matrix
from .rel_joins import (
    _pagerank_oracle,
    _round_half_away,
    _ts_ns,
)
from .rel_stats import (
    _bfs_oracle,
)
from .rel_text_profile import (
    _yyyymm_from_ns,
)



ORACLES: dict[str, str] = {
    "grouped_distinct_count": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "mode_per_group": """
        WITH c AS (
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY user_id, event_type
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
            FROM c
        )
        SELECT user_id, event_type AS mode_event, n FROM r WHERE rn = 1
    """,
    "histogram": """
        SELECT CAST(round(l_quantity * 100) AS BIGINT) // 500 AS bucket,
               count(*) AS n
        FROM lineitem GROUP BY bucket
    """,
    "set_except": """
        SELECT p_brand, p_type, p_size FROM part WHERE p_size > 25
        EXCEPT
        SELECT p_brand, p_type, p_size FROM part WHERE p_retailprice > 950
    """,
    "set_intersect": """
        SELECT p_brand, p_type, p_size FROM part WHERE p_size > 25
        INTERSECT
        SELECT p_brand, p_type, p_size FROM part WHERE p_retailprice > 950
    """,
    "bm25_topk": """
        WITH arr AS (
            SELECT doc_id,
                   string_split_regex(lower(text), '[^a-z0-9_]+') AS a
            FROM documents
        ),
        tok AS (
            SELECT doc_id, a[i] AS tok
            FROM arr, UNNEST(generate_series(1, len(a))) AS g(i)
            WHERE a[i] <> ''
        ),
        f AS (
            SELECT doc_id, count(*) AS dl,
                   sum(CASE WHEN tok = 'hash' THEN 1 ELSE 0 END) AS tf0,
                   sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS tf1,
                   sum(CASE WHEN tok = 'vector' THEN 1 ELSE 0 END) AS tf2
            FROM tok GROUP BY doc_id
        ),
        g AS (
            SELECT count(*) AS n, sum(dl) AS total,
                   sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                   sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                   sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
            FROM f
        ),
        s AS (
            SELECT doc_id,
                   ln(((n - df0) + 0.5) / (df0 + 0.5))
                   * ((tf0 * 2.2) / (tf0 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                 + ln(((n - df1) + 0.5) / (df1 + 0.5))
                   * ((tf1 * 2.2) / (tf1 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                 + ln(((n - df2) + 0.5) / (df2 + 0.5))
                   * ((tf2 * 2.2) / (tf2 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                   AS score
            FROM f, g
        )
        SELECT doc_id,
               CAST(round(score * 1000000.0) AS BIGINT) AS score_fp
        FROM s ORDER BY score_fp DESC, doc_id LIMIT 10
    """,
    "json_extract": """
        WITH m AS (
            SELECT event_type,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        ),
        c AS (
            SELECT event_type, k, count(*) AS c
            FROM m GROUP BY event_type, k
        )
        SELECT event_type, count(*) AS n_distinct_k,
               CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(k * c) AS BIGINT) AS k_sum
        FROM c GROUP BY event_type
    """,
    "interval_coverage": """
        WITH m AS (
            SELECT user_id, epoch_us(ts) // 1000000 AS s,
                   epoch_us(ts) // 1000000 + 300 AS e
            FROM events
        ),
        w AS (
            SELECT user_id, s, e,
                   max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pmax
            FROM m
        ),
        g AS (
            SELECT user_id, s, e,
                   sum(CASE WHEN pmax IS NULL OR s > pmax
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS isl
            FROM w
        ),
        i AS (
            SELECT user_id, isl, min(s) AS st, max(e) AS en
            FROM g GROUP BY user_id, isl
        )
        SELECT user_id, count(*) AS n_islands,
               CAST(sum(en - st) AS BIGINT) AS covered_s
        FROM i GROUP BY user_id
    """,
    "rrf_fusion": """
        WITH arr AS (
            SELECT doc_id,
                   string_split_regex(lower(text), '[^a-z0-9_]+') AS a
            FROM documents
        ),
        tok AS (
            SELECT doc_id, a[i] AS tok
            FROM arr, UNNEST(generate_series(1, len(a))) AS g(i)
            WHERE a[i] <> ''
        ),
        f AS (
            SELECT doc_id, count(*) AS dl,
                   sum(CASE WHEN tok = 'hash' THEN 1 ELSE 0 END) AS tf0,
                   sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS tf1,
                   sum(CASE WHEN tok = 'vector' THEN 1 ELSE 0 END) AS tf2
            FROM tok GROUP BY doc_id
        ),
        g AS (
            SELECT count(*) AS n, sum(dl) AS total,
                   sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                   sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                   sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
            FROM f
        ),
        s AS (
            SELECT doc_id,
                   CAST(round((
                   ln(((n - df0) + 0.5) / (df0 + 0.5))
                   * ((tf0 * 2.2) / (tf0 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                 + ln(((n - df1) + 0.5) / (df1 + 0.5))
                   * ((tf1 * 2.2) / (tf1 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                 + ln(((n - df2) + 0.5) / (df2 + 0.5))
                   * ((tf2 * 2.2) / (tf2 + 1.2 * ((1.0 - 0.75)
                      + 0.75 * (dl / ((total * 1.0) / n)))))
                   ) * 1000000.0) AS BIGINT) AS score_fp
            FROM f, g
        ),
        la AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score_fp DESC, doc_id)
                       AS r
            FROM s QUALIFY r <= 20
        ),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        dims AS (
            SELECT e.vec_id,
                   CAST(round((CAST(e.embedding[i] AS DOUBLE)
                               * CAST(q.qe[i] AS DOUBLE)) * 1e12)
                        AS BIGINT) AS pxy,
                   CAST(round((CAST(e.embedding[i] AS DOUBLE)
                               * CAST(e.embedding[i] AS DOUBLE)) * 1e12)
                        AS BIGINT) AS pxx
            FROM embeddings e, q,
                 UNNEST(generate_series(1, len(e.embedding))) AS gg(i)
        ),
        nb AS (
            SELECT CAST(sum(CAST(round((CAST(qe[i] AS DOUBLE)
                                        * CAST(qe[i] AS DOUBLE)) * 1e12)
                                 AS BIGINT)) AS BIGINT) AS nb
            FROM q, UNNEST(generate_series(1, len(qe))) AS gg(i)
        ),
        sims AS (
            SELECT vec_id,
                   CAST(round((CAST(sum(pxy) AS BIGINT) * 1.0)
                              / (sqrt(CAST(sum(pxx) AS BIGINT) * 1.0)
                                 * sqrt((SELECT nb FROM nb) * 1.0))
                              * 1000000.0) AS BIGINT) AS sim_fp
            FROM dims GROUP BY vec_id
        ),
        lb AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY sim_fp DESC, vec_id) AS r
            FROM sims QUALIFY r <= 20
        ),
        u AS (
            SELECT doc_id, 1000000 // (60 + r) AS c FROM la
            UNION ALL
            SELECT vec_id AS doc_id, 1000000 // (60 + r) AS c FROM lb
        )
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_fp
        FROM u GROUP BY doc_id
        ORDER BY rrf_fp DESC, doc_id LIMIT 10
    """,
    "quantile_norm": """
        WITH m AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS p
            FROM orders
        )
        SELECT o_orderkey,
               CAST((rank() OVER (ORDER BY p) - 1) * 1000000
                    // ((SELECT count(*) FROM m) - 1) AS BIGINT) AS q_fp
        FROM m
    """,
    "grouped_geomean": """
        WITH m AS (
            SELECT o_orderpriority,
                   CAST(round(ln(CAST(round(o_totalprice * 100) AS BIGINT)
                                 * 1.0) * 1000000000.0) AS BIGINT) AS lnp
            FROM orders
        )
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(lnp) AS BIGINT) AS ln_sum_fp
        FROM m GROUP BY o_orderpriority
    """,
    "bigram_lm_score": """
        WITH arr AS (
            SELECT doc_id,
                   string_split_regex(lower(text), '[^a-z0-9_]+') AS a
            FROM documents
        ),
        tok AS (
            SELECT doc_id, a[i] AS tok,
                   row_number() OVER (PARTITION BY doc_id ORDER BY i)
                       AS pos
            FROM arr, UNNEST(generate_series(1, len(a))) AS g(i)
            WHERE a[i] <> ''
        ),
        bg AS (
            SELECT t1.doc_id, t1.tok AS w1, t2.tok AS w2
            FROM tok t1
            JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
        ),
        bi AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
        hd AS (SELECT w1, CAST(sum(c) AS BIGINT) AS hc
               FROM bi GROUP BY w1),
        v AS (SELECT count(DISTINCT tok) AS nv FROM tok),
        term AS (
            SELECT bg.doc_id,
                   CAST(round(ln((bi.c + 1) * 1.0) * 1000000000.0)
                        AS BIGINT)
                   - CAST(round(ln((hd.hc + (SELECT nv FROM v)) * 1.0)
                                * 1000000000.0) AS BIGINT) AS term_fp
            FROM bg JOIN bi USING (w1, w2) JOIN hd USING (w1)
        )
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum(term_fp) AS BIGINT) AS ll_fp
        FROM term GROUP BY doc_id
    """,
    "grouped_regression": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity) AS BIGINT) AS x,
                   CAST(round(l_extendedprice) AS BIGINT) AS y
            FROM lineitem
        ),
        a AS (
            SELECT l_returnflag, count(*) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy
            FROM m GROUP BY l_returnflag
        ),
        f AS (
            SELECT l_returnflag, n,
                   ((n * 1.0) * sxy - (sx * 1.0) * sy)
                   / ((n * 1.0) * sxx - (sx * 1.0) * sx) AS slope
            FROM a
        )
        SELECT f.l_returnflag, f.n,
               CAST(round(slope * 1000000.0) AS BIGINT) AS slope_fp,
               CAST(round(((a.sy * 1.0) - slope * (a.sx * 1.0))
                          / (a.n * 1.0) * 1000000.0)
                    AS BIGINT) AS intercept_fp
        FROM f JOIN a USING (l_returnflag)
    """,
    "weighted_avg": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
                   CAST(round(l_discount * 100) AS BIGINT) AS d
            FROM lineitem
        ),
        a AS (
            SELECT l_returnflag, count(*) AS n,
                   sum(p) AS sp, sum(p * d) AS spd
            FROM m GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               CAST(spd * 10000 // sp AS BIGINT) AS wavg_disc_fp
        FROM a
    """,
    "unpivot_long": """
        SELECT p_partkey, 'p_size' AS attr,
               CAST(p_size AS BIGINT) * 100 AS val_fp
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS attr,
               CAST(round(p_retailprice * 100) AS BIGINT) AS val_fp
        FROM part
    """,
    "grouped_skew": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity) AS BIGINT) AS x
            FROM lineitem
        ),
        a AS (
            SELECT l_returnflag, count(*) AS n,
                   sum(x) AS sx, sum(x * x) AS sxx,
                   sum(x * x * x) AS sxxx
            FROM m GROUP BY l_returnflag
        ),
        f AS (
            SELECT l_returnflag, n,
                   ((n * 1.0) * sxx - (sx * 1.0) * sx)
                   / ((n * 1.0) * (n * 1.0)) AS m2,
                   ((((n * 1.0) * (n * 1.0)) * sxxx
                     - (3.0 * (n * 1.0)) * ((sx * 1.0) * sxx))
                    + (2.0 * (sx * 1.0)) * ((sx * 1.0) * sx))
                   / (((n * 1.0) * (n * 1.0)) * (n * 1.0)) AS m3
            FROM a
        )
        SELECT l_returnflag, n,
               CAST(round(m3 / (m2 * sqrt(m2)) * 1000000.0)
                    AS BIGINT) AS skew_fp
        FROM f
    """,
    "grouped_corr": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity) AS BIGINT) AS x,
                   CAST(round(l_extendedprice) AS BIGINT) AS y
            FROM lineitem
        ),
        a AS (
            SELECT l_returnflag, count(*) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(y * y) AS syy,
                   sum(x * y) AS sxy
            FROM m GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               CAST(round(
                   ((n * 1.0) * sxy - (sx * 1.0) * sy)
                   / (sqrt((n * 1.0) * sxx - (sx * 1.0) * sx)
                      * sqrt((n * 1.0) * syy - (sy * 1.0) * sy))
                   * 1000000.0) AS BIGINT) AS corr_fp
        FROM a
    """,
    "grouped_variance": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity * 100) AS BIGINT) AS v
            FROM lineitem
        ),
        a AS (
            SELECT l_returnflag, count(*) AS n,
                   sum(v) AS s, sum(v * v) AS s2
            FROM m GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               round((s2 * 1.0 - (s * 1.0) * (s * 1.0) / n) / n / 10000.0
                     * 10000.0) / 10000.0 AS var_pop
        FROM a
    """,
    "bigram_stats": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text),
                                                  '[^a-z0-9_]+'),
                               t -> t <> '') AS w
            FROM documents
        ),
        bi AS (
            SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS c
            FROM toks, UNNEST(range(1, len(w))) AS u(i)
            WHERE len(w) >= 2
            GROUP BY w1, w2
        ),
        h AS (SELECT w1, sum(c) AS hc FROM bi GROUP BY w1)
        SELECT bi.w1, bi.w2, c,
               CAST((c * 1000000) // hc AS BIGINT) AS prob_fp
        FROM bi JOIN h USING (w1)
        WHERE c >= 5
    """,
    "group_outliers": """
        WITH m AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
            FROM events
        ),
        a AS (
            SELECT event_type, count(*) AS n,
                   sum(v) AS s, sum(v * v) AS s2
            FROM m GROUP BY event_type
        )
        SELECT m.event_type, count(*) AS n_outliers
        FROM m JOIN a USING (event_type)
        WHERE (m.v * 1.0 - a.s * 1.0 / a.n)
              * (m.v * 1.0 - a.s * 1.0 / a.n)
              > 9.0 * ((a.s2 * 1.0 - (a.s * 1.0) * (a.s * 1.0) / a.n)
                       / a.n)
        GROUP BY m.event_type
    """,
    "pivot_wide": """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    """,
    "range_join": """
        WITH w AS (
            SELECT event_id AS window_id,
                   epoch_us(ts) AS start_us,
                   epoch_us(ts) + (30 + (event_id % 5) * 15) * 60000000
                       AS end_us
            FROM events WHERE event_id % 89 = 0
        )
        SELECT e.event_id, w.window_id
        FROM events e JOIN w
          ON epoch_us(e.ts) >= w.start_us AND epoch_us(e.ts) < w.end_us
    """,
    "similarity_join": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text),
                                                  '[^a-z0-9_]+'),
                               t -> t <> '') AS w
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
            FROM toks, UNNEST(range(1, len(w) - 1)) AS u(i)
            WHERE len(w) >= 3
        ),
        szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        pairs AS (
            SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
            FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id
        )
        SELECT a, b,
               CAST((inter * 1000000) // (sa.sz + sb.sz - inter) AS BIGINT)
                   AS jaccard_fp
        FROM pairs
        JOIN szs sa ON a = sa.doc_id
        JOIN szs sb ON b = sb.doc_id
        WHERE inter * 100 >= (sa.sz + sb.sz - inter) * 50
    """,
    "j_inner_join": """
        SELECT c_nationkey,
               round(sum(o_totalprice) * 10000.0) / 10000.0 AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    """,
    "j_left_outer": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "asof_join": """
        WITH m AS (
            SELECT user_id, ts, max(event_id) AS marker_event_id
            FROM events WHERE event_id % 97 = 0 GROUP BY user_id, ts
        )
        SELECT e.event_id, m.marker_event_id
        FROM events e ASOF LEFT JOIN m
          ON e.user_id = m.user_id AND e.ts >= m.ts
    """,
    "region_revenue": """
        SELECT r_name,
               round(sum(o_totalprice) * 10000.0) / 10000.0 AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "event_funnel": """
        WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS t_click
              FROM events e JOIN v USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > v.t_view
              GROUP BY e.user_id),
        p AS (SELECT e.user_id FROM events e JOIN c USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > c.t_click
              GROUP BY e.user_id)
        SELECT (SELECT count(*) FROM v) AS n_view,
               (SELECT count(*) FROM c) AS n_view_click,
               (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
    "window_functions": """
        WITH s AS (
            SELECT user_id, ts, event_id,
                   CAST(round(value * 1000000) AS BIGINT) AS v
            FROM events
        )
        SELECT user_id, event_id,
               row_number() OVER w AS rn,
               CAST(sum(v) OVER w AS BIGINT) AS run_sum_fp,
               v - lag(v) OVER w AS step_fp
        FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "rollup_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_fp,
               count(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "cube_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_fp,
               count(*) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "relational_division": """
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (1, 2, 3, 4, 5)
        GROUP BY l_suppkey
        HAVING count(DISTINCT l_partkey) >= 3
    """,
    "above_customer_avg": """
        WITH fp AS (
            SELECT o_orderkey, o_custkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS p
            FROM orders),
        agg AS (
            SELECT o_custkey AS k, sum(p) AS s, count(*) AS n
            FROM fp GROUP BY o_custkey)
        SELECT fp.o_orderkey
        FROM fp JOIN agg ON fp.o_custkey = agg.k
        WHERE fp.p * agg.n > agg.s
    """,
    "table_diff": """
        WITH old AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS p
            FROM orders WHERE o_orderkey % 10 != 0),
        new AS (
            SELECT o_orderkey,
                   (CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END)
                   * CAST(round(o_totalprice * 100) AS BIGINT) AS p
            FROM orders WHERE o_orderkey % 7 != 0)
        SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
               CASE WHEN old.o_orderkey IS NULL THEN 'added'
                    WHEN new.o_orderkey IS NULL THEN 'removed'
                    WHEN old.p != new.p THEN 'changed'
                    ELSE 'same' END AS status
        FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    """,
    "rank_functions": """
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(round(value * 1000000) AS BIGINT) AS v
            FROM events
        )
        SELECT user_id, event_id,
               rank() OVER (PARTITION BY user_id ORDER BY v) AS rnk,
               dense_rank() OVER (PARTITION BY user_id ORDER BY v) AS drnk,
               CASE WHEN count(*) OVER (PARTITION BY user_id) = 1 THEN 0
                    ELSE (rank() OVER (PARTITION BY user_id ORDER BY v) - 1)
                         * 1000000
                         // (count(*) OVER (PARTITION BY user_id) - 1)
               END AS pct_fp,
               ntile(4) OVER (PARTITION BY user_id ORDER BY v, event_id)
                   AS tile
        FROM e
    """,
    "quantiles": """
        WITH s AS (
            SELECT l_quantity AS v,
                   row_number() OVER (ORDER BY l_quantity) AS rn,
                   count(*) OVER () AS n
            FROM lineitem
        )
        SELECT max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.25 * n) AS BIGINT))
                        THEN v END) AS q25,
               max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.50 * n) AS BIGINT))
                        THEN v END) AS q50,
               max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.75 * n) AS BIGINT))
                        THEN v END) AS q75,
               max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.95 * n) AS BIGINT))
                        THEN v END) AS q95
        FROM s
    """,
    "grouped_median": """
        WITH s AS (
            SELECT l_returnflag, l_quantity AS v,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_quantity) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem)
        SELECT l_returnflag,
               max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT))
                        THEN v END) AS median_qty,
               max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.9 * n) AS BIGINT))
                        THEN v END) AS p90_qty
        FROM s GROUP BY l_returnflag
    """,
    "pagerank": _pagerank_oracle(),
    "key_skew": """
        WITH c AS (
            SELECT o_custkey, count(*) AS c
            FROM orders GROUP BY o_custkey
        ),
        r AS (
            SELECT c, row_number() OVER (ORDER BY c, o_custkey) AS i
            FROM c
        ),
        a AS (
            SELECT count(*) AS k, sum(c) AS s,
                   max(c) AS top1, sum(i * c) AS ic
            FROM r
        )
        SELECT k AS n_keys, CAST(s AS BIGINT) AS n_rows,
               CAST(top1 * 1000000 // s AS BIGINT) AS top1_fp,
               CAST((2 * ic - (k + 1) * s) * 1000000 // (k * s)
                    AS BIGINT) AS gini_fp
        FROM a
    """,
    "winsorize": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS v
            FROM lineitem
        ),
        s AS (
            SELECT l_returnflag, v,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY v) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM m
        ),
        q AS (
            SELECT l_returnflag,
                   max(CASE WHEN rn = GREATEST(1,
                       CAST(ceil(0.05 * n) AS BIGINT)) THEN v END) AS lo,
                   max(CASE WHEN rn = GREATEST(1,
                       CAST(ceil(0.95 * n) AS BIGINT)) THEN v END) AS hi
            FROM s GROUP BY 1
        )
        SELECT m.l_returnflag, count(*) AS n,
               CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_lo,
               CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_hi,
               CAST(sum(CASE WHEN v < lo THEN lo
                             WHEN v > hi THEN hi ELSE v END)
                    AS BIGINT) AS sum_clipped_fp
        FROM m JOIN q USING (l_returnflag)
        GROUP BY 1
    """,
    "triangle_count": """
        WITH nn AS (SELECT count(*) AS c FROM customer),
        e0 AS (
            SELECT o_custkey AS src,
                   o_orderkey % (SELECT c FROM nn) AS dst
            FROM orders
        ),
        e AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM e0 WHERE src <> dst
        ),
        w AS (
            SELECT e1.v AS a, e2.v AS b
            FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        )
        SELECT (SELECT count(*) FROM w) AS n_wedges,
               (SELECT count(*) FROM w JOIN e
                 ON e.u = w.a AND e.v = w.b) AS n_triangles
    """,
    "percentile_cont": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS v
            FROM lineitem
        ),
        s AS (
            SELECT l_returnflag, v,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY v) - 1 AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM m
        ),
        q AS (
            SELECT g.l_returnflag, g.n, t.k,
                   (t.k * (g.n - 1)) // 4 AS idx,
                   (t.k * (g.n - 1)) % 4 AS rem
            FROM (SELECT DISTINCT l_returnflag, n FROM s) g
            CROSS JOIN (VALUES (1), (2), (3)) t(k)
        ),
        j AS (
            SELECT q.l_returnflag, q.n, q.k, q.rem,
                   max(CASE WHEN s.rn = q.idx THEN s.v END) AS lo,
                   max(CASE WHEN s.rn = q.idx + 1 THEN s.v END) AS hi
            FROM q JOIN s
              ON s.l_returnflag = q.l_returnflag
             AND (s.rn = q.idx OR s.rn = q.idx + 1)
            GROUP BY 1, 2, 3, 4
        )
        SELECT l_returnflag, any_value(n) AS n,
               max(CASE WHEN k = 1 THEN
                   (4 * lo + rem * (COALESCE(hi, lo) - lo)) / 400.0
                   END) AS p25,
               max(CASE WHEN k = 2 THEN
                   (4 * lo + rem * (COALESCE(hi, lo) - lo)) / 400.0
                   END) AS p50,
               max(CASE WHEN k = 3 THEN
                   (4 * lo + rem * (COALESCE(hi, lo) - lo)) / 400.0
                   END) AS p75
        FROM j GROUP BY l_returnflag
    """,
    "grouped_entropy": """
        WITH c AS (
            SELECT user_id, event_type, count(*) AS c
            FROM events GROUP BY user_id, event_type
        ),
        a AS (
            SELECT user_id, sum(c) AS n,
                   sum(CAST(round(c * ln(c) * 1000000000.0) AS BIGINT))
                       AS s
            FROM c GROUP BY user_id
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_events,
               CAST(round((ln(n) - (s / 1000000000.0) / n) * 1000000.0)
                    AS BIGINT) AS entropy_fp
        FROM a
    """,
    "cross_join": """
        SELECT r_name, n_name, r_name || ':' || n_name AS pair
        FROM region CROSS JOIN nation
    """,
    "segment_monthly_revenue": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               round(sum(o_totalprice) * 10000.0) / 10000.0 AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY 1
    """,
    "string_agg": """
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey
    """,
    "distinct_count": """
        SELECT count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps
        FROM lineitem
    """,
    "sample_hash": """
        SELECT doc_id, n_chars FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    """,
    "source_cap": """
        SELECT source, doc_id, rn AS rank FROM (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents) WHERE rn <= 15
    """,
    "stratified_sample": """
        SELECT doc_id, lang FROM documents
        WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3'))
           OR (lang <> 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3','4','5','6','7'))
    """,
    "term_doc_freq": """
        SELECT term, count(*) AS df FROM (
            SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text),
                                                    '[^a-z0-9_]+')) AS term
                FROM documents)
            WHERE term <> '')
        GROUP BY term ORDER BY df DESC, term LIMIT 50
    """,
    "tfidf_top_terms": """
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text),
                                                '[^a-z0-9_]+')) AS term
            FROM documents),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM tok WHERE term <> '' GROUP BY doc_id, term),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS df
            FROM tok WHERE term <> '' GROUP BY term),
        s AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                   (tf.tf * 1000000) // df.df AS score_fp,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY (tf.tf * 1000000) // df.df DESC, tf.term
                   ) AS rn
            FROM tf JOIN df USING (term))
        SELECT doc_id, term, tf, CAST(score_fp AS BIGINT) AS score_fp
        FROM s WHERE rn <= 3
    """,
    "export_partitioned": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
        FROM orders GROUP BY 1
    """,
    "cohort_retention": """
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        f AS (SELECT user_id, min(day) AS c FROM du GROUP BY user_id)
        SELECT strftime(f.c, '%Y-%m-%d') AS cohort_day,
               CAST(du.day - f.c AS BIGINT) AS k,
               count(*) AS n_users
        FROM du JOIN f USING (user_id)
        WHERE du.day - f.c <= 13
        GROUP BY 1, 2
    """,
    "grouped_mad": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity * 100) AS BIGINT) AS v
            FROM lineitem
        ),
        s AS (
            SELECT l_returnflag, v,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY v) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM m
        ),
        med AS (
            SELECT l_returnflag,
                   max(CASE WHEN rn = GREATEST(1,
                       CAST(ceil(0.5 * n) AS BIGINT)) THEN v END) AS med
            FROM s GROUP BY 1
        ),
        dev AS (
            SELECT m.l_returnflag, med.med, abs(m.v - med.med) AS dd
            FROM m JOIN med USING (l_returnflag)
        ),
        s2 AS (
            SELECT l_returnflag, med, dd,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY dd) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM dev
        )
        SELECT l_returnflag, any_value(med) AS median_fp,
               max(CASE WHEN rn = GREATEST(1,
                   CAST(ceil(0.5 * n) AS BIGINT)) THEN dd END) AS mad_fp
        FROM s2 GROUP BY 1
    """,
    "event_transitions": """
        WITH s AS (
            SELECT event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS nxt
            FROM events
        )
        SELECT event_type AS prev_event, nxt AS next_event,
               count(*) AS n
        FROM s WHERE nxt IS NOT NULL
        GROUP BY 1, 2
    """,
    "fuzzy_best_match": """
        WITH q AS (
            SELECT p_partkey,
                   substr(p_name, 1, p_partkey % length(p_name))
                   || substr(p_name, p_partkey % length(p_name) + 2)
                       AS qname
            FROM part WHERE p_partkey < 50
        ),
        c AS (SELECT p_name AS cname FROM part WHERE p_partkey < 500),
        d AS (
            SELECT q.p_partkey, q.qname, c.cname,
                   levenshtein(q.qname, c.cname) AS dist,
                   row_number() OVER (
                       PARTITION BY q.p_partkey
                       ORDER BY levenshtein(q.qname, c.cname), c.cname
                   ) AS rn
            FROM q CROSS JOIN c
        )
        SELECT p_partkey, qname, cname AS match_name, dist
        FROM d WHERE rn = 1
    """,
    "rolling_active_users": """
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        w AS (
            SELECT CAST(day + g.i * INTERVAL 1 DAY AS DATE) AS wday,
                   user_id
            FROM du CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6))
                 g(i)
        )
        SELECT strftime(wday, '%Y-%m-%d') AS day,
               count(DISTINCT user_id) AS wau
        FROM w GROUP BY 1
    """,
    "pareto_frontier": """
        WITH m AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS p,
                   CAST(o_orderdate AS DATE) AS d
            FROM orders
        )
        SELECT o_orderkey, p AS price_fp,
               strftime(d, '%Y-%m-%d') AS date
        FROM m b
        WHERE NOT EXISTS (
            SELECT 1 FROM m a
            WHERE a.p >= b.p AND a.d <= b.d
              AND (a.p > b.p OR a.d < b.d))
    """,
    "export_jsonl_csv": """
        SELECT CAST(source AS VARCHAR) AS key, count(*) AS n,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM documents GROUP BY source
        UNION ALL
        SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS n,
               CAST(sum(event_id) AS BIGINT) AS id_sum
        FROM events GROUP BY event_type
    """,
    "embedding_norms": """
        SELECT vec_id,
               round(sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                     * 1000000.0) / 1000000.0 AS l2
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        GROUP BY vec_id
    """,
}

# Composed oracle: transitive closure over the similarity pairs — the
# recursive CTE replays q_connected_components' min-label fixpoint.
ORACLES["connected_components"] = (
    "WITH RECURSIVE pairs_t AS (" + ORACLES["similarity_join"] + "),\n"
    """e AS (
        SELECT a AS src, b AS dst FROM pairs_t
        UNION SELECT b, a FROM pairs_t
        UNION SELECT a, a FROM pairs_t
        UNION SELECT b, b FROM pairs_t
    ),
    reach(n, m) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.n, e2.dst FROM reach r JOIN e e2 ON r.m = e2.src
    )
    SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n"""
)

ORACLES["unnest_explode"] = """
    SELECT vec_id, ord, embedding[ord]::DOUBLE AS val
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(ord)
"""

ORACLES["gap_fill"] = """
    WITH m AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM m GROUP BY 1),
    g AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day FROM b)
    SELECT g.user_id, g.day, CAST(COALESCE(m.n, 0) AS BIGINT) AS n
    FROM g LEFT JOIN m ON g.user_id = m.user_id AND g.day = m.day
"""

ORACLES["lead_dwell"] = """
    SELECT user_id, event_id,
           CAST(date_diff('microsecond', ts,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                AS DOUBLE) AS dwell_us
    FROM events
"""

ORACLES["cdc_upsert"] = """
    WITH base AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_fp,
               CAST(0 AS BIGINT) AS version
        FROM orders
    ),
    upd AS (
        SELECT o_orderkey, price_fp + 100000 AS price_fp,
               CAST(1 AS BIGINT) AS version
        FROM base WHERE o_orderkey % 7 = 0
    ),
    allr AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY version DESC) AS rn
        FROM allr
    )
    SELECT o_orderkey, price_fp, version FROM r WHERE rn = 1
"""

ORACLES["graph_bfs"] = _bfs_oracle()

ORACLES["j_full_outer"] = """
    WITH l AS (
        SELECT c_custkey, CAST(1 AS BIGINT) AS has_neg_bal
        FROM customer WHERE c_acctbal < 0
    ),
    r AS (
        SELECT o_custkey, count(*) AS n_big
        FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
    )
    SELECT COALESCE(l.c_custkey, r.o_custkey) AS custkey,
           COALESCE(l.has_neg_bal, 0) AS has_neg_bal,
           CAST(COALESCE(r.n_big, 0) AS BIGINT) AS n_big
    FROM l FULL OUTER JOIN r ON l.c_custkey = r.o_custkey
"""

ORACLES["forward_fill"] = """
    SELECT user_id, event_id,
           last_value(CASE WHEN event_id % 7 = 0 THEN event_id END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled
    FROM events
"""

ORACLES["exists_subquery"] = """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
"""

ORACLES["order_count_distribution"] = """
    WITH c AS (
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    SELECT n_orders, count(*) AS n_custs FROM c GROUP BY n_orders
"""

ORACLES["argmax_join"] = """
    SELECT c_nationkey, n_name, c_custkey, c_acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer) t JOIN nation ON n_nationkey = c_nationkey
    WHERE rn = 1
"""

ORACLES["mom_growth"] = """
    WITH m AS (
        SELECT c_mktsegment, strftime(o_orderdate, '%Y-%m') AS month,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_fp
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2)
    SELECT c_mktsegment, month, rev_fp,
           lag(rev_fp) OVER (PARTITION BY c_mktsegment ORDER BY month)
               AS prev_fp,
           rev_fp - lag(rev_fp) OVER (PARTITION BY c_mktsegment
                                      ORDER BY month) AS diff_fp
    FROM m
"""

ORACLES["source_jaccard"] = """
    WITH tok AS (
        SELECT DISTINCT source, term FROM (
            SELECT source,
                   unnest(regexp_split_to_array(lower(text),
                                                '[^a-z0-9_]+')) AS term
            FROM documents)
        WHERE term <> ''),
    sz AS (SELECT source, count(*) AS n FROM tok GROUP BY source),
    i AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
        FROM tok a JOIN tok b ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2)
    SELECT i.src_a, i.src_b,
           CAST(i.n_inter AS BIGINT) AS n_inter,
           CAST(sa.n + sb.n - i.n_inter AS BIGINT) AS n_union,
           i.n_inter / (sa.n + sb.n - i.n_inter) AS jaccard
    FROM i JOIN sz sa ON sa.source = i.src_a
           JOIN sz sb ON sb.source = i.src_b
"""

ORACLES["bucketed_join"] = """
    SELECT c_nationkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS rev_fp,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
"""

ORACLES["fk_integrity"] = """
    SELECT 'lineitem.l_orderkey->orders' AS relation,
           count(DISTINCT l_orderkey) AS n_child_keys,
           (SELECT count(DISTINCT l.l_orderkey) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphans
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           count(DISTINCT l_partkey),
           (SELECT count(DISTINCT l.l_partkey) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    FROM lineitem
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           count(DISTINCT o_custkey),
           (SELECT count(DISTINCT o.o_custkey) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    FROM orders
    ORDER BY relation
"""

ORACLES["table_profile"] = """
    SELECT 'o_custkey' AS col, count(*) AS n_rows,
           count(*) - count(o_custkey) AS n_null,
           count(DISTINCT o_custkey) AS n_distinct FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus) FROM orders
    ORDER BY col
"""

ORACLES["chi_square"] = """
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ),
    t AS (
        SELECT *,
               CAST(sum(n) OVER (PARTITION BY o_orderstatus) AS BIGINT)
                   AS rt,
               CAST(sum(n) OVER (PARTITION BY o_orderpriority) AS BIGINT)
                   AS ct,
               CAST(sum(n) OVER () AS BIGINT) AS tot
        FROM c
    )
    SELECT o_orderstatus, o_orderpriority, n,
           CAST(round(1e6 * (CAST(rt * ct AS DOUBLE) / tot))
                AS BIGINT) AS e_fp,
           CAST(round(1e9 * ((n - CAST(rt * ct AS DOUBLE) / tot)
                             * (n - CAST(rt * ct AS DOUBLE) / tot)
                             / (CAST(rt * ct AS DOUBLE) / tot)))
                AS BIGINT) AS chi2_fp
    FROM t ORDER BY o_orderstatus, o_orderpriority
"""

ORACLES["idle_rich_customers"] = """
    WITH pool AS (
        SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer
        WHERE c_acctbal > 0.0
          AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    s AS (SELECT CAST(sum(bal_c) AS BIGINT) AS tot,
                 count(*) AS np FROM pool)
    SELECT c_nationkey, count(*) AS n_custs,
           CAST(sum(bal_c) AS BIGINT) AS totbal_fp
    FROM pool, s
    WHERE bal_c * np > tot
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = pool.c_custkey
                        AND o.o_totalprice > 450000.0)
    GROUP BY c_nationkey
"""

ORACLES["group_mean_impute"] = """
    WITH v AS (
        SELECT event_id, user_id,
               CAST(round(value * 1e6) AS BIGINT) AS v_fp,
               (event_id % 11 = 0) AS miss
        FROM events
    ),
    m AS (
        SELECT user_id,
               CAST(round(CAST(sum(CASE WHEN NOT miss THEN v_fp END)
                               AS DOUBLE)
                          / NULLIF(count(CASE WHEN NOT miss THEN 1 END),
                                   0))
                    AS BIGINT) AS mean_fp
        FROM v GROUP BY user_id
    )
    SELECT v.event_id, v.user_id,
           CASE WHEN v.miss THEN m.mean_fp ELSE v.v_fp END AS value_fp
    FROM v JOIN m USING (user_id)
"""

ORACLES["trimmed_mean"] = """
    WITH q AS (
        SELECT l_returnflag,
               CAST(round(l_quantity * 100) AS BIGINT) AS qc,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_quantity) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    )
    SELECT l_returnflag, count(*) AS n_kept,
           CAST(sum(qc) AS BIGINT) AS sum_fp,
           CAST(round(CAST(sum(qc) AS DOUBLE) / count(*))
                AS BIGINT) AS mean_fp
    FROM q WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY l_returnflag ORDER BY l_returnflag
"""

# decontaminate gained an exact oracle (string-level shingle overlap —
# the engine's 64-bit shingle hashes are injective in practice, verified
# by this very comparison): windows mirror functions/sketches.shingles
# (k=8; ≤k tokens → ONE whole-doc shingle via greatest(len−6, 2))
ORACLES["decontaminate"] = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text),
                                              '[^a-z0-9_]+'),
                           t -> t <> '') AS ts
        FROM documents
    ),
    wins AS (
        SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS sh
        FROM toks, UNNEST(range(1, greatest(len(ts) - 6, 2))) AS u(i)
        WHERE len(ts) >= 1
    ),
    bench AS (SELECT DISTINCT sh FROM wins WHERE doc_id < 5),
    flags AS (
        SELECT w.doc_id,
               max(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS hit
        FROM wins w LEFT JOIN bench b ON w.sh = b.sh
        GROUP BY w.doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id < 5 THEN TRUE
                ELSE COALESCE(f.hit, 0) = 1 END AS contaminated
    FROM documents d LEFT JOIN flags f ON d.doc_id = f.doc_id
"""

ORACLES["zorder_layout"] = """
    WITH xy AS (
        SELECT o_custkey % 1048576 AS x,
               CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT)
                   % 1048576 AS y
        FROM orders
    ),
    z AS (
        SELECT x, y,
               CAST((SELECT sum((((x >> i) & 1) * (2.0 ** (2 * i)))
                                + (((y >> i) & 1)
                                   * (2.0 ** (2 * i + 1))))
                     FROM range(0, 20) t(i)) AS BIGINT) >> 28 AS zblock
        FROM xy
    ),
    blk AS (
        SELECT zblock, count(*) AS n_rows,
               min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y
        FROM z GROUP BY zblock
    )
    SELECT zblock, n_rows, min_x, max_x, min_y, max_y,
           (min_x <= 4000 AND max_x >= 2000
            AND min_y <= 10500 AND max_y >= 9500) AS touched
    FROM blk
"""

ORACLES["disjunctive_band_revenue"] = """
    SELECT CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                               * 100) AS BIGINT)) AS BIGINT)
               AS revenue_fp,
           count(*) AS n_rows
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_type = 'PROMO'
           AND l_quantity >= 1.0 AND l_quantity <= 11.0)
       OR (p_type = 'SMALL' AND p_size >= 1 AND p_size <= 25
           AND l_quantity >= 10.0 AND l_quantity <= 20.0)
       OR (p_type = 'LARGE' AND p_size >= 10
           AND l_quantity >= 20.0 AND l_quantity <= 30.0)
"""

ORACLES["supplier_nation_profit"] = """
    SELECT n_name,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                               * 100) AS BIGINT)) AS BIGINT)
               AS profit_fp,
           count(*) AS n_items
    FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON n_nationkey = s_nationkey
         JOIN orders ON o_orderkey = l_orderkey
    GROUP BY n_name, o_year
"""

ORACLES["returned_revenue_topk"] = """
    WITH lost AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS lost_fp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY o_custkey
    )
    SELECT o_custkey, n_name, lost_fp
    FROM lost JOIN customer ON c_custkey = o_custkey
              JOIN nation ON n_nationkey = c_nationkey
    ORDER BY lost_fp DESC, o_custkey
    LIMIT 20
"""

ORACLES["rfm_segments"] = """
    WITH pc AS (
        SELECT o_custkey,
               max(CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT))
                   AS last_day,
               count(*) AS f,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS m_cents
        FROM orders GROUP BY o_custkey
    ),
    rd AS (SELECT max(last_day) AS ref_day FROM pc),
    rf AS (SELECT ref_day - last_day AS r, f, m_cents FROM pc, rd),
    ranked AS (
        SELECT r, f, m_cents,
               row_number() OVER (ORDER BY r) AS rr,
               row_number() OVER (ORDER BY f) AS fr,
               count(*) OVER () AS n
        FROM rf
    ),
    th AS (
        SELECT
            max(CASE WHEN rr = greatest(1, CAST(ceil(0.25 * n)
                                                AS BIGINT))
                     THEN r END) AS r25,
            max(CASE WHEN rr = greatest(1, CAST(ceil(0.5 * n)
                                                AS BIGINT))
                     THEN r END) AS r50,
            max(CASE WHEN rr = greatest(1, CAST(ceil(0.75 * n)
                                                AS BIGINT))
                     THEN r END) AS r75,
            max(CASE WHEN fr = greatest(1, CAST(ceil(0.25 * n)
                                                AS BIGINT))
                     THEN f END) AS f25,
            max(CASE WHEN fr = greatest(1, CAST(ceil(0.5 * n)
                                                AS BIGINT))
                     THEN f END) AS f50,
            max(CASE WHEN fr = greatest(1, CAST(ceil(0.75 * n)
                                                AS BIGINT))
                     THEN f END) AS f75
        FROM ranked
    )
    SELECT 1 + CAST(r > r25 AS BIGINT) + CAST(r > r50 AS BIGINT)
             + CAST(r > r75 AS BIGINT) AS r_bucket,
           1 + CAST(f > f25 AS BIGINT) + CAST(f > f50 AS BIGINT)
             + CAST(f > f75 AS BIGINT) AS f_bucket,
           CAST(length(CAST(m_cents AS VARCHAR)) AS BIGINT) AS m_band,
           count(*) AS n_custs
    FROM rf, th
    GROUP BY r_bucket, f_bucket, m_band
"""

ORACLES["first_touch_attribution"] = """
    WITH f AS (
        SELECT user_id, first(event_type ORDER BY ts, event_id)
                   AS channel
        FROM events GROUP BY user_id
    ),
    p AS (
        SELECT user_id, count(*) AS n_purch
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT channel,
           CAST(sum(n_purch) AS BIGINT) AS n_purchases,
           count(*) AS n_users
    FROM p JOIN f USING (user_id)
    GROUP BY channel
"""

ORACLES["time_to_convert"] = """
    WITH fv AS (
        SELECT user_id, min(epoch_ms(ts)) AS v_ms
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    d AS (
        SELECT e.user_id, epoch_ms(e.ts) - fv.v_ms AS dd
        FROM events e JOIN fv USING (user_id)
        WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= fv.v_ms
    )
    SELECT user_id, CAST(min(dd) AS BIGINT) AS ttc_ms
    FROM d GROUP BY user_id
"""

ORACLES["incremental_agg"] = """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS rev_fp,
           count(*) AS n
    FROM orders GROUP BY month
"""

ORACLES["quality_top_quartile"] = """
    WITH r AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    ),
    t AS (
        SELECT source,
               max(CASE WHEN rn = CAST(greatest(1, ceil(0.75 * n))
                                       AS BIGINT)
                        THEN n_chars END) AS p75
        FROM r GROUP BY source
    )
    SELECT doc_id, documents.source, n_chars
    FROM documents JOIN t ON documents.source = t.source
    WHERE n_chars > p75
"""

ORACLES["schema_evolution_read"] = """
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
               AS o_orderpriority_u,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS tot_fp
    FROM orders GROUP BY o_orderpriority_u
"""

ORACLES["standardize"] = """
    WITH m AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ),
    a AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(v) AS BIGINT) AS s,
               CAST(sum(v * v) AS BIGINT) AS s2
        FROM m GROUP BY event_type
    )
    SELECT event_id, m.event_type,
           CAST(round(1e6 * ((m.v * 1.0 - a.s * 1.0 / a.n)
                             / sqrt((a.s2 * 1.0
                                     - (a.s * 1.0) * (a.s * 1.0) / a.n)
                                    / a.n)))
                AS BIGINT) AS z_fp
    FROM m JOIN a USING (event_type)
"""

ORACLES["train_val_test_split"] = """
    WITH b AS (
        SELECT source,
               CAST((SELECT sum((strpos('0123456789abcdef',
                                        substr(h, i, 1)) - 1)
                                * 16 ** (8 - i))
                     FROM range(1, 9) t(i)) AS BIGINT) % 10 AS bucket
        FROM (SELECT source, md5(CAST(doc_id AS VARCHAR)) AS h
              FROM documents)
    )
    SELECT source,
           CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n
    FROM b GROUP BY source, split
"""

ORACLES["q6_band_revenue"] = """
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 1e4)
                         AS BIGINT)) AS BIGINT) AS revenue_fp,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24.0
"""

ORACLES["ship_delay_distribution"] = """
    SELECT date_diff('day', CAST(o_orderdate AS DATE),
                     CAST(l_shipdate AS DATE)) AS delay_days,
           count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY delay_days
"""

ORACLES["promo_revenue_ratio"] = """
    WITH m AS (
        SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m')
                   AS month,
               CAST(sum(CASE WHEN p_type = 'PROMO'
                             THEN CAST(round(l_extendedprice * 100)
                                       AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS promo_fp,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS total_fp
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY month
    )
    SELECT month, promo_fp, total_fp,
           CAST(round(1e9 * (CAST(promo_fp AS DOUBLE)
                             / CAST(total_fp AS DOUBLE)))
                AS BIGINT) AS ratio_fp
    FROM m
"""

ORACLES["pmi_bigrams"] = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text),
                                              '[^a-z0-9_]+'),
                           t -> t <> '') AS w
        FROM documents
    ),
    bi AS (
        SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS c
        FROM toks, UNNEST(range(1, len(w))) AS u(i)
        WHERE len(w) >= 2
        GROUP BY w1, w2
    ),
    h AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM bi GROUP BY w1),
    t AS (SELECT w2, CAST(sum(c) AS BIGINT) AS c2 FROM bi GROUP BY w2),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS nb FROM bi)
    SELECT bi.w1, bi.w2, c,
           CAST(round(1e9 * ln((c * nb) * 1.0 / (c1 * c2)))
                AS BIGINT) AS pmi_fp
    FROM bi JOIN h USING (w1) JOIN t USING (w2), nn
    WHERE c >= 5
"""

ORACLES["daily_anomaly"] = """
    WITH d AS (
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    w AS (
        SELECT day, CAST(n AS BIGINT) AS n,
               CAST(count(*) OVER win AS BIGINT) AS k,
               CAST(COALESCE(sum(n) OVER win, 0) AS BIGINT) AS s,
               CAST(COALESCE(sum(n * n) OVER win, 0) AS BIGINT) AS s2
        FROM d
        WINDOW win AS (ORDER BY day
                       ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, n,
           (n * 7 - s) * (n * 7 - s) AS dev_sq,
           9 * (s2 * 7 - s * s) AS thr,
           (n * 7 - s) * (n * 7 - s) > 9 * (s2 * 7 - s * s)
               AS is_anomaly
    FROM w
    WHERE k = 7
    ORDER BY day
"""

ORACLES["dedup_survivor"] = """
    WITH h AS (
        SELECT doc_id, source, n_chars, md5(text) AS hh FROM documents
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY hh ORDER BY n_chars DESC, doc_id) AS rn
        FROM h
    )
    SELECT doc_id, source, n_chars FROM r WHERE rn = 1 ORDER BY doc_id
"""

ORACLES["time_weighted_avg"] = """
    WITH o AS (
        SELECT user_id,
               CAST(round(value * 1e3) AS BIGINT) AS v_fp,
               epoch_ms(ts) AS ms,
               lead(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    d AS (
        SELECT user_id, v_fp, nxt - ms AS dw FROM o WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           CAST(sum(dw) AS BIGINT) AS total_dwell_ms,
           CAST(round(CAST(sum(v_fp * dw) AS DOUBLE)
                      / sum(dw)) AS BIGINT) AS twa_fp
    FROM d GROUP BY user_id HAVING sum(dw) > 0
"""

ORACLES["weighted_sample"] = """
    WITH u AS (
        SELECT o_orderkey, o_totalprice,
               ((SELECT sum((strpos('0123456789abcdef',
                                    substr(h, i, 1)) - 1)
                            * 16 ** (8 - i))
                 FROM range(1, 9) t(i)) + 1) / 4294967296.0 AS uu
        FROM (SELECT o_orderkey, o_totalprice,
                     md5(CAST(o_orderkey AS VARCHAR)) AS h FROM orders)
    )
    SELECT o_orderkey,
           CAST(round(1e9 * (ln(uu) / o_totalprice)) AS BIGINT) AS key_fp
    FROM u
    ORDER BY ln(uu) / o_totalprice DESC, o_orderkey
    LIMIT 100
"""

ORACLES["ratio_to_report"] = """
    WITH nr AS (
        SELECT c_nationkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_fp
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    ),
    x AS (
        SELECT n_name, r_name, rev_fp,
               CAST(sum(rev_fp) OVER (PARTITION BY r_name) AS BIGINT)
                   AS reg_fp
        FROM nr JOIN nation ON n_nationkey = c_nationkey
                JOIN region ON r_regionkey = n_regionkey
    )
    SELECT n_name, r_name, rev_fp,
           CAST(round(1e9 * (CAST(rev_fp AS DOUBLE)
                             / CAST(reg_fp AS DOUBLE)))
                AS BIGINT) AS share_fp
    FROM x ORDER BY n_name
"""

ORACLES["q3_shipping_priority"] = """
    WITH li AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_fp
        FROM lineitem
        WHERE l_shipdate > TIMESTAMP '1998-07-01'
        GROUP BY l_orderkey
    )
    SELECT l_orderkey, o_orderdate, o_orderpriority, revenue_fp
    FROM li JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
    ORDER BY revenue_fp DESC, l_orderkey
    LIMIT 10
"""

ORACLES["q7_nation_trade_volume"] = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                               * 100) AS BIGINT)) AS BIGINT)
               AS volume_fp,
           count(*) AS n_items
    FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON sn.n_nationkey = s_nationkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY supp_nation, cust_nation, l_year
"""

ORACLES["q15_top_supplier"] = """
    WITH r AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS total_fp
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT l_suppkey, total_fp FROM r
    WHERE total_fp = (SELECT max(total_fp) FROM r)
    ORDER BY l_suppkey
"""

ORACLES["q17_small_qty_revenue"] = """
    WITH q AS (
        SELECT l_partkey,
               CAST(round(l_quantity * 100) AS BIGINT) AS qty_fp,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ),
    a AS (
        SELECT l_partkey AS pk,
               CAST(sum(qty_fp) AS BIGINT) AS sum_qty_fp,
               count(*) AS n_li
        FROM q GROUP BY l_partkey
    )
    SELECT CAST(sum(cents) AS BIGINT) AS revenue_fp,
           count(*) AS n_rows
    FROM q JOIN a ON l_partkey = pk
    WHERE 5 * qty_fp * n_li < sum_qty_fp
"""

ORACLES["q18_large_orders"] = """
    WITH q AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                    AS BIGINT) AS sum_qty_fp
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 25000
    )
    SELECT l_orderkey, o_custkey, o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
           sum_qty_fp
    FROM q JOIN orders ON o_orderkey = l_orderkey
    ORDER BY total_cents DESC, l_orderkey
    LIMIT 20
"""

ORACLES["q8_market_share"] = """
    WITH t AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                    AS BIGINT) AS rev,
               CASE WHEN sn.n_name = 'NATION_3' THEN 1 ELSE 0 END AS ist
        FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation sn ON sn.n_nationkey = s_nationkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation cn ON cn.n_nationkey = c_nationkey
             JOIN region ON r_regionkey = cn.n_regionkey
        WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(sum(rev * ist) AS BIGINT) AS target_fp,
           CAST(sum(rev) AS BIGINT) AS total_fp,
           CAST(round(1e9 * (CAST(sum(rev * ist) AS DOUBLE)
                             / CAST(sum(rev) AS DOUBLE)))
                AS BIGINT) AS share_fp
    FROM t GROUP BY o_year
"""

ORACLES["q16_part_supplier_counts"] = """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
    GROUP BY p_brand, p_type, p_size
"""

ORACLES["q21_late_sole_supplier"] = """
    WITH ls AS (
        SELECT l_orderkey AS ok, l_suppkey AS sk,
               max(CASE WHEN l_shipdate > o_orderdate
                             + INTERVAL 365 DAY
                        THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY ok, sk
    ),
    po AS (
        SELECT ok, count(*) AS ns, sum(late) AS nl,
               max(CASE WHEN late = 1 THEN sk END) AS lsk
        FROM ls GROUP BY ok
    )
    SELECT lsk AS l_suppkey, count(*) AS numwait
    FROM po WHERE ns > 1 AND nl = 1
    GROUP BY lsk
    ORDER BY numwait DESC, l_suppkey
    LIMIT 20
"""

ORACLES["orc_roundtrip"] = """
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_sum_fp,
           CAST(sum(l_orderkey) AS BIGINT) AS key_sum
    FROM lineitem GROUP BY l_returnflag
"""

ORACLES["benford_audit"] = """
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                                     AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS digit
        FROM orders
    )
    SELECT digit, count(*) AS n,
           CAST(round(1e9 * ((ln(digit + 1.0)
                              - ln(CAST(digit AS DOUBLE)))
                             / ln(10.0))) AS BIGINT) AS benford_fp
    FROM d GROUP BY digit
"""

ORACLES["grouping_sets_agg"] = """
    SELECT COALESCE(l_returnflag, '') AS rf,
           COALESCE(l_linestatus, '') AS ls,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS sum_qty_fp,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""

ORACLES["churned_customers"] = """
    WITH pairs AS (
        SELECT DISTINCT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                    AS BIGINT) AS mnum
        FROM orders
    ),
    mx AS (SELECT max(mnum) AS m FROM pairs)
    SELECT lpad(CAST(mnum // 12 AS VARCHAR), 4, '0') || '-'
               || lpad(CAST(mnum % 12 + 1 AS VARCHAR), 2, '0') AS month,
           count(*) AS n_churned
    FROM pairs p, mx
    WHERE p.mnum < mx.m
      AND NOT EXISTS (
          SELECT 1 FROM pairs q
          WHERE q.o_custkey = p.o_custkey AND q.mnum = p.mnum + 1)
    GROUP BY month
"""

ORACLES["late_events"] = """
    WITH a AS (
        SELECT user_id, event_id, ts,
               md5(CAST(event_id AS VARCHAR)) AS h
        FROM events
    ),
    x AS (
        SELECT user_id, ts,
               max(ts) OVER (PARTITION BY user_id ORDER BY h, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS mx
        FROM a
    )
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN ts < mx THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late
    FROM x GROUP BY user_id
"""

ORACLES["inverted_index"] = """
    WITH tok AS (
        SELECT doc_id, u.tok AS term
        FROM documents, unnest(string_split(text, ' ')) AS u(tok)
    ),
    td AS (
        SELECT term, doc_id, count(*) AS tf
        FROM tok GROUP BY term, doc_id
    ),
    r AS (
        SELECT term, doc_id, tf, row_number() OVER (
            PARTITION BY term ORDER BY doc_id) AS rn
        FROM td
    )
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
           string_agg(CASE WHEN rn <= 10
                           THEN CAST(doc_id AS VARCHAR) END,
                      ',' ORDER BY doc_id) AS postings
    FROM r GROUP BY term
"""

ORACLES["event_cooccurrence"] = """
    SELECT a.event_type AS first_type, b.event_type AS second_type,
           count(*) AS n
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY first_type, second_type
"""

ORACLES["compact_store"] = """
    SELECT count(*) AS n_rows,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           true AS compacted
    FROM documents
"""

ORACLES["theil_index"] = """
    WITH pc AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders GROUP BY o_custkey
    ),
    t AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s FROM pc)
    SELECT n AS n_customers,
           CAST(sum(CAST(round(1e9 * (((x * n) / s)
                                      * (ln(x) + ln(n) - ln(s))))
                         AS BIGINT)) AS BIGINT) AS theil_sum_fp
    FROM pc, t GROUP BY n
"""

ORACLES["weighted_join_sample"] = """
    WITH j AS (
        SELECT l_orderkey, l_linenumber, p_type, l_extendedprice,
               md5(CAST(l_orderkey AS VARCHAR) || ':'
                   || CAST(l_linenumber AS VARCHAR)) AS h
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    u AS (
        SELECT l_orderkey, l_linenumber, p_type, l_extendedprice,
               ((SELECT sum((strpos('0123456789abcdef',
                                    substr(h, i, 1)) - 1)
                            * 16 ** (8 - i))
                 FROM range(1, 9) t(i)) + 1) / 4294967296.0 AS uu
        FROM j
    )
    SELECT l_orderkey, l_linenumber, p_type,
           CAST(round(1e9 * (ln(uu) / l_extendedprice)) AS BIGINT)
               AS key_fp
    FROM u
    ORDER BY ln(uu) / l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
"""

ORACLES["label_reachability"] = """
    WITH e AS (
        SELECT o_custkey AS src,
               o_orderkey % (SELECT count(*) FROM customer) AS dst,
               o_orderkey % 3 AS lbl
        FROM orders
    ),
    f0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS q,
                  CAST(0 AS BIGINT) AS d),
    v0 AS (SELECT * FROM f0),
    n1 AS (
        SELECT DISTINCT e.dst AS node, CAST(1 AS BIGINT) AS q,
               CAST(1 AS BIGINT) AS d
        FROM f0 f JOIN e ON e.src = f.node
        WHERE (f.q = 0 AND e.lbl = 0) OR (f.q = 1 AND e.lbl = 1)
    ),
    f1 AS (SELECT * FROM n1 WHERE NOT EXISTS (
               SELECT 1 FROM v0 v
               WHERE v.node = n1.node AND v.q = n1.q)),
    v1 AS (SELECT * FROM v0 UNION ALL SELECT * FROM f1),
    n2 AS (
        SELECT DISTINCT e.dst AS node, CAST(1 AS BIGINT) AS q,
               CAST(2 AS BIGINT) AS d
        FROM f1 f JOIN e ON e.src = f.node
        WHERE (f.q = 0 AND e.lbl = 0) OR (f.q = 1 AND e.lbl = 1)
    ),
    f2 AS (SELECT * FROM n2 WHERE NOT EXISTS (
               SELECT 1 FROM v1 v
               WHERE v.node = n2.node AND v.q = n2.q)),
    v2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM f2),
    n3 AS (
        SELECT DISTINCT e.dst AS node, CAST(1 AS BIGINT) AS q,
               CAST(3 AS BIGINT) AS d
        FROM f2 f JOIN e ON e.src = f.node
        WHERE (f.q = 0 AND e.lbl = 0) OR (f.q = 1 AND e.lbl = 1)
    ),
    f3 AS (SELECT * FROM n3 WHERE NOT EXISTS (
               SELECT 1 FROM v2 v
               WHERE v.node = n3.node AND v.q = n3.q)),
    v3 AS (SELECT * FROM v2 UNION ALL SELECT * FROM f3)
    SELECT node, d AS dist FROM v3 WHERE q = 1
"""

ORACLES["k_anonymity"] = """
    WITH q AS (
        SELECT c_nationkey, c_mktsegment,
               (CAST(round(c_acctbal * 100) AS BIGINT) + 100000)
                   // 100000 AS bal_band
        FROM customer
    ),
    g AS (
        SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS n
        FROM q GROUP BY c_nationkey, c_mktsegment, bal_band
    )
    SELECT count(*) AS n_groups,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_risky_groups,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
               AS n_risky_rows,
           CAST(min(n) AS BIGINT) AS min_group
    FROM g
"""

ORACLES["weekly_revenue"] = """
    SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
           CAST(week(o_orderdate) AS BIGINT) AS iso_week,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_fp,
           count(*) AS n_orders
    FROM orders GROUP BY iso_year, iso_week
"""

ORACLES["psi_drift"] = """
    WITH b AS (
        SELECT CAST(round(value * 100) AS BIGINT) // 2000 AS bucket,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
                   AS in1
        FROM events
    ),
    cnt AS (
        SELECT bucket,
               CAST(sum(in1) AS BIGINT) AS c1,
               CAST(sum(1 - in1) AS BIGINT) AS c2
        FROM b GROUP BY bucket
    ),
    tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t1,
                   CAST(sum(c2) AS BIGINT) AS t2,
                   count(*) AS nb
            FROM cnt)
    SELECT bucket, c1, c2,
           CAST(round(1e9 * ((((c1 + 1.0) / (t1 + CAST(nb AS DOUBLE)))
                              - ((c2 + 1.0) / (t2 + CAST(nb AS DOUBLE))))
                             * ln(((c1 + 1.0) / (t1 + CAST(nb AS DOUBLE)))
                                  / ((c2 + 1.0)
                                     / (t2 + CAST(nb AS DOUBLE))))))
                AS BIGINT) AS psi_term_fp
    FROM cnt, tot
"""

ORACLES["ab_test_welch"] = """
    WITH a AS (
        SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT arm, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS s2
        FROM a GROUP BY arm
    ),
    w AS (
        SELECT
            max(CASE WHEN arm = 'A' THEN n END) AS na,
            max(CASE WHEN arm = 'A' THEN s END) AS sa,
            max(CASE WHEN arm = 'A' THEN s2 END) AS s2a,
            max(CASE WHEN arm = 'B' THEN n END) AS nb,
            max(CASE WHEN arm = 'B' THEN s END) AS sb,
            max(CASE WHEN arm = 'B' THEN s2 END) AS s2b
        FROM m
    ),
    c AS (
        SELECT na, nb,
               (sa * 1.0) / na - (sb * 1.0) / nb AS diff,
               sqrt(((s2a * 1.0 - (sa * 1.0) * (sa * 1.0) / na)
                     / (na - 1)) / na
                    + ((s2b * 1.0 - (sb * 1.0) * (sb * 1.0) / nb)
                       / (nb - 1)) / nb) AS se
        FROM w
    )
    SELECT na AS n_a, nb AS n_b,
           CAST(round(1e6 * diff) AS BIGINT) AS diff_fp,
           CAST(round(1e6 * (diff - 1.96 * se)) AS BIGINT) AS ci_lo_fp,
           CAST(round(1e6 * (diff + 1.96 * se)) AS BIGINT) AS ci_hi_fp
    FROM c
"""

ORACLES["frequent_itemsets"] = """
    WITH ot AS (
        SELECT DISTINCT l_orderkey, p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT a.p_type AS item_a, b.p_type AS item_b,
           count(*) AS support
    FROM ot a JOIN ot b
      ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
    GROUP BY item_a, item_b
    HAVING count(*) >= 10
"""

ORACLES["db_file_export"] = """
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_fp
    FROM orders GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""

ORACLES["graph_sssp"] = """
    WITH e AS (
        SELECT CAST(o_custkey AS BIGINT) AS src,
               CAST(o_orderkey % (SELECT count(*) FROM customer)
                    AS BIGINT) AS dst,
               CAST((o_orderkey // (SELECT count(*) FROM customer))
                    % 9 + 1 AS BIGINT) AS w
        FROM orders
    ),
    d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
    c1 AS (SELECT e.dst AS node, min(d.dist + e.w) AS dist
           FROM d0 d JOIN e ON e.src = d.node GROUP BY e.dst),
    d1 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM
           (SELECT * FROM d0 UNION ALL SELECT * FROM c1) GROUP BY node),
    c2 AS (SELECT e.dst AS node, min(d.dist + e.w) AS dist
           FROM d1 d JOIN e ON e.src = d.node GROUP BY e.dst),
    d2 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM
           (SELECT * FROM d1 UNION ALL SELECT * FROM c2) GROUP BY node),
    c3 AS (SELECT e.dst AS node, min(d.dist + e.w) AS dist
           FROM d2 d JOIN e ON e.src = d.node GROUP BY e.dst),
    d3 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM
           (SELECT * FROM d2 UNION ALL SELECT * FROM c3) GROUP BY node),
    c4 AS (SELECT e.dst AS node, min(d.dist + e.w) AS dist
           FROM d3 d JOIN e ON e.src = d.node GROUP BY e.dst),
    d4 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM
           (SELECT * FROM d3 UNION ALL SELECT * FROM c4) GROUP BY node)
    SELECT node, dist FROM d4
"""

ORACLES["did_estimate"] = """
    WITH a AS (
        SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm,
               CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 2 ELSE 1
                    END AS period,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT arm, period, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS s
        FROM a GROUP BY arm, period
    ),
    w AS (
        SELECT
            max(CASE WHEN arm='A' AND period=1 THEN n END) AS na1,
            max(CASE WHEN arm='A' AND period=1 THEN s END) AS sa1,
            max(CASE WHEN arm='A' AND period=2 THEN n END) AS na2,
            max(CASE WHEN arm='A' AND period=2 THEN s END) AS sa2,
            max(CASE WHEN arm='B' AND period=1 THEN n END) AS nb1,
            max(CASE WHEN arm='B' AND period=1 THEN s END) AS sb1,
            max(CASE WHEN arm='B' AND period=2 THEN n END) AS nb2,
            max(CASE WHEN arm='B' AND period=2 THEN s END) AS sb2
        FROM m
    )
    SELECT na1 AS n_a1, na2 AS n_a2, nb1 AS n_b1, nb2 AS n_b2,
           CAST(round(1e6 * (((sa2 * 1.0) / na2 - (sa1 * 1.0) / na1)
                             - ((sb2 * 1.0) / nb2
                                - (sb1 * 1.0) / nb1)))
                AS BIGINT) AS did_fp
    FROM w
"""

ORACLES["q2_min_cost_supplier"] = """
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey
        FROM lineitem
    ),
    r AS (
        SELECT n_nationkey FROM nation JOIN region
          ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ),
    c AS (
        SELECT l_partkey, l_suppkey,
               (l_partkey * 31 + l_suppkey * 17) % 10000 + 1 AS cost
        FROM ps JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey IN (SELECT n_nationkey FROM r)
    ),
    k AS (
        SELECT l_partkey,
               min(cost * 4294967296 + l_suppkey) AS packed
        FROM c GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           CAST(packed % 4294967296 AS BIGINT) AS best_suppkey,
           CAST(packed // 4294967296 AS BIGINT) AS min_cost
    FROM k
"""

ORACLES["q1_pricing_summary"] = """
    WITH f AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity * 100.0) AS BIGINT) AS q_fp,
               CAST(round(l_extendedprice * 100.0) AS BIGINT) AS p_fp,
               CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                    AS BIGINT) AS dp_fp,
               CAST(round(l_extendedprice * (1.0 - l_discount)
                          * (1.0 + l_tax) * 100.0) AS BIGINT) AS ch_fp,
               CAST(round(l_discount * 10000.0) AS BIGINT) AS d_fp
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    ),
    g AS (
        SELECT l_returnflag, l_linestatus,
               CAST(sum(q_fp) AS BIGINT) AS sum_qty_fp,
               CAST(sum(p_fp) AS BIGINT) AS sum_base_fp,
               CAST(sum(dp_fp) AS BIGINT) AS sum_disc_price_fp,
               CAST(sum(ch_fp) AS BIGINT) AS sum_charge_fp,
               CAST(sum(d_fp) AS BIGINT) AS sum_disc_fp,
               count(*) AS count_order
        FROM f GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, sum_qty_fp, sum_base_fp,
           sum_disc_price_fp, sum_charge_fp,
           CAST(round(1e4 * (CAST(sum_qty_fp AS DOUBLE)
                             / (100.0 * count_order)))
                AS BIGINT) AS avg_qty_fp,
           CAST(round(1e4 * (CAST(sum_base_fp AS DOUBLE)
                             / (100.0 * count_order)))
                AS BIGINT) AS avg_price_fp,
           CAST(round(1e4 * (CAST(sum_disc_fp AS DOUBLE)
                             / (10000.0 * count_order)))
                AS BIGINT) AS avg_disc_fp,
           count_order
    FROM g
"""

ORACLES["q4_order_priority"] = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
"""

ORACLES["q11_important_parts"] = """
    WITH v AS (
        SELECT l_partkey AS partkey,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                                   * 100.0) AS BIGINT))
                    AS BIGINT) AS value_fp
        FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT CAST(sum(value_fp) AS HUGEINT) AS total,
                 count(*) AS np FROM v)
    SELECT partkey, value_fp FROM v, t
    WHERE value_fp * (np * 3) > total * 4
"""

ORACLES["q12_priority_by_returnflag"] = """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l_returnflag
"""

ORACLES["q20_excess_suppliers"] = """
    WITH tp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    v AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT))
                    AS BIGINT) AS qty_fp
        FROM lineitem JOIN tp ON l_partkey = p_partkey
        GROUP BY l_suppkey
    ),
    s AS (
        SELECT l_suppkey, s_name, qty_fp
        FROM v JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey < 13
    ),
    t AS (SELECT CAST(sum(qty_fp) AS HUGEINT) AS total,
                 count(*) AS ns FROM s)
    SELECT l_suppkey AS s_suppkey, s_name, qty_fp
    FROM s, t
    WHERE qty_fp * ns > total
"""

ORACLES["embedding_covariance"] = """
    WITH e AS (
        SELECT vec_id, i,
               CAST(round(x * 1e4) AS BIGINT) AS q
        FROM (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
    ),
    p AS (
        SELECT a.i AS i, b.i AS j,
               CAST(sum(a.q * b.q) AS BIGINT) AS s_ij
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
        GROUP BY a.i, b.i
    ),
    s AS (SELECT i, CAST(sum(q) AS BIGINT) AS s_i FROM e GROUP BY i),
    n AS (SELECT count(*) AS n FROM embeddings)
    SELECT p.i, p.j,
           CAST(n.n * p.s_ij - sa.s_i * sb.s_i AS BIGINT) AS cov_n2_fp
    FROM p
    JOIN s sa ON sa.i = p.i
    JOIN s sb ON sb.i = p.j, n
"""

ORACLES["weighted_median"] = """
    WITH w AS (
        SELECT l_returnflag,
               CAST(round(l_quantity * 100.0) AS BIGINT) AS v,
               CAST(round(l_extendedprice * 100.0) AS BIGINT) AS wt
        FROM lineitem
    ),
    g AS (
        SELECT l_returnflag, v, CAST(sum(wt) AS BIGINT) AS wv
        FROM w GROUP BY l_returnflag, v
    ),
    c AS (
        SELECT l_returnflag, v, wv,
               sum(wv) OVER (PARTITION BY l_returnflag ORDER BY v)
                   AS cw,
               sum(wv) OVER (PARTITION BY l_returnflag) AS tw
        FROM g
    )
    SELECT l_returnflag, CAST(min(v) AS BIGINT) AS wmedian_fp
    FROM c WHERE 2 * cw >= tw
    GROUP BY l_returnflag
"""

ORACLES["store_time_travel"] = """
    SELECT g.e AS as_of_epoch, count(*) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders, (SELECT unnest([0, 1, 2]) AS e) g
    WHERE o_orderkey % 3 <= g.e
    GROUP BY g.e
"""

ORACLES["cumulative_users"] = """
    WITH f AS (
        SELECT user_id,
               min(date_diff('day', DATE '1970-01-01',
                             CAST(ts AS DATE))) AS day
        FROM events GROUP BY user_id
    ),
    c AS (SELECT day, count(*) AS n FROM f GROUP BY day)
    SELECT day, CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM c
"""

ORACLES["max_concurrency"] = """
    WITH iv AS (
        SELECT epoch_ns(ts) AS s,
               epoch_ns(ts) + 1800000000000 AS e
        FROM events
    ),
    b AS (
        SELECT s // 86400000000000 AS day, s AS t, 1 AS d FROM iv
        UNION ALL
        SELECT s // 86400000000000 AS day,
               least(e, (s // 86400000000000 + 1) * 86400000000000)
                   AS t, -1 AS d
        FROM iv
        UNION ALL
        SELECT e // 86400000000000 AS day,
               (e // 86400000000000) * 86400000000000 AS t, 1 AS d
        FROM iv
        WHERE e // 86400000000000 > s // 86400000000000
          AND e > (e // 86400000000000) * 86400000000000
        UNION ALL
        SELECT e // 86400000000000 AS day, e AS t, -1 AS d
        FROM iv
        WHERE e // 86400000000000 > s // 86400000000000
          AND e > (e // 86400000000000) * 86400000000000
    ),
    r AS (
        SELECT day,
               sum(d) OVER (PARTITION BY day ORDER BY t, d DESC
                            ROWS UNBOUNDED PRECEDING) AS run
        FROM b
    )
    SELECT day, CAST(max(run) AS BIGINT) AS peak FROM r GROUP BY day
"""

ORACLES["session_paths"] = """
    WITH brk AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS b
        FROM events
    ),
    s AS (
        SELECT user_id, ts, event_id, event_type,
               sum(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
        FROM brk
    ),
    o AS (
        SELECT user_id, sess, event_type,
               row_number() OVER (PARTITION BY user_id, sess
                                  ORDER BY ts, event_id) AS rn
        FROM s
    ),
    tri AS (
        SELECT a.event_type AS t1, b.event_type AS t2,
               c.event_type AS t3, count(*) AS n
        FROM o a
        JOIN o b ON a.user_id = b.user_id AND a.sess = b.sess
               AND b.rn = a.rn + 1
        JOIN o c ON a.user_id = c.user_id AND a.sess = c.sess
               AND c.rn = a.rn + 2
        GROUP BY t1, t2, t3
    )
    SELECT t1, t2, t3, CAST(n AS BIGINT) AS n
    FROM tri ORDER BY n DESC, t1, t2, t3 LIMIT 20
"""

ORACLES["cdc_merge_delete"] = """
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 7 = 0
                      THEN 100000 ELSE 0 END AS price_fp
    FROM orders
    WHERE o_orderkey % 11 <> 0
"""

ORACLES["balanced_downsample"] = """
    WITH c AS (SELECT label, count(*) AS n FROM embeddings
               GROUP BY label),
    k AS (SELECT min(n) AS k FROM c),
    h AS (SELECT label, vec_id,
                 md5(CAST(vec_id AS VARCHAR)) AS h
          FROM embeddings),
    r AS (SELECT label, vec_id,
                 row_number() OVER (PARTITION BY label
                                    ORDER BY h, vec_id) AS rn
          FROM h)
    SELECT label, vec_id FROM r, k WHERE rn <= k.k
"""

ORACLES["target_encode_loo"] = """
    WITH c AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders
    ),
    g AS (
        SELECT o_orderpriority, CAST(sum(cents) AS BIGINT) AS s,
               count(*) AS n
        FROM c GROUP BY o_orderpriority
    )
    SELECT o_orderkey,
           CAST(round(1e6 * (CAST(s - cents AS DOUBLE)
                             / CAST(n - 1 AS DOUBLE)))
                AS BIGINT) AS loo_enc_fp
    FROM c JOIN g USING (o_orderpriority)
"""

ORACLES["collapse_runs"] = """
    WITH l AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN prev IS NULL OR event_type <> prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
    FROM l GROUP BY user_id
"""

ORACLES["info_gain"] = """
    WITH cont AS (
        SELECT o_orderpriority AS x, o_orderstatus AS y,
               count(*) AS c
        FROM orders GROUP BY x, y
    ),
    sxy AS (SELECT CAST(sum(CAST(round(c * ln(c) * 1e9) AS BIGINT))
                        AS BIGINT) AS s FROM cont),
    mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS c FROM cont GROUP BY x),
    sx AS (SELECT CAST(sum(CAST(round(c * ln(c) * 1e9) AS BIGINT))
                       AS BIGINT) AS s FROM mx),
    my AS (SELECT y, CAST(sum(c) AS BIGINT) AS c FROM cont GROUP BY y),
    sy AS (SELECT CAST(sum(CAST(round(c * ln(c) * 1e9) AS BIGINT))
                       AS BIGINT) AS s FROM my),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cont)
    SELECT n,
           CAST(round(1e6 * (ln(n) + ((CAST(sxy.s - sx.s - sy.s
                                            AS DOUBLE) / 1e9) / n)))
                AS BIGINT) AS ig_fp
    FROM nn, sxy, sx, sy
"""

ORACLES["label_centroids"] = """
    WITH e AS (
        SELECT label, i, CAST(round(x * 1e4) AS BIGINT) AS q
        FROM (SELECT label, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
    ),
    g AS (
        SELECT label, i AS dim, CAST(sum(q) AS BIGINT) AS s_fp,
               count(*) AS n
        FROM e GROUP BY label, i
    )
    SELECT label, dim, s_fp, n,
           CAST(round(1e6 * (CAST(s_fp AS DOUBLE) / (1e4 * n)))
                AS BIGINT) AS mean_fp
    FROM g
"""

ORACLES["resume_export"] = """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           count(*) AS n
    FROM orders GROUP BY month
"""

ORACLES["degree_assortativity"] = """
    WITH e AS (
        SELECT o_custkey AS src,
               (o_orderkey * o_orderkey)
                   % (SELECT count(*) FROM customer) AS dst
        FROM orders
    ),
    od AS (SELECT src, count(*) AS x FROM e GROUP BY src),
    idg AS (SELECT dst, count(*) AS y FROM e GROUP BY dst),
    j AS (SELECT x, y FROM e JOIN od USING (src)
          JOIN idg USING (dst)),
    m AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM j
    )
    SELECT n,
           CAST(round(1e6 * (((n * 1.0) * sxy - (sx * 1.0) * sy)
                / (sqrt((n * 1.0) * sxx - (sx * 1.0) * sx)
                   * sqrt((n * 1.0) * syy - (sy * 1.0) * sy))))
                AS BIGINT) AS assort_fp
    FROM m
"""

ORACLES["time_split_embargo"] = """
    WITH t AS (
        SELECT CASE WHEN ts < TIMESTAMP '2024-01-11' THEN 'train'
                    WHEN ts >= TIMESTAMP '2024-01-16' THEN 'test'
                    ELSE '' END AS split,
               user_id,
               epoch_ns(ts) // 86400000000000 AS day
        FROM events
    )
    SELECT split, count(*) AS n_rows,
           CAST(min(day) AS BIGINT) AS min_day,
           CAST(max(day) AS BIGINT) AS max_day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM t WHERE split <> '' GROUP BY split
"""

ORACLES["pareto_8020"] = """
    WITH v AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT cents,
               sum(cents) OVER (ORDER BY cents DESC, o_custkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
               row_number() OVER (ORDER BY cents DESC, o_custkey)
                   AS rn
        FROM v
    ),
    t AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
                 count(*) AS n_customers FROM v),
    k AS (SELECT min(rn) AS k_top FROM r, t
          WHERE 5 * cum >= 4 * total)
    SELECT n_customers, k_top, total AS total_cents,
           (SELECT CAST(cum AS BIGINT) FROM r, k
            WHERE rn = k.k_top) AS top_cents
    FROM t, k
"""

ORACLES["clustering_coefficient"] = """
    WITH e0 AS (
        SELECT o_custkey AS s,
               o_orderkey % (SELECT count(*) FROM customer) AS d
        FROM orders
    ),
    e1 AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
           FROM e0 WHERE s <> d),
    adj AS (SELECT u AS c, v AS nb FROM e1
            UNION ALL SELECT v, u FROM e1),
    deg AS (SELECT c, count(*) AS deg FROM adj GROUP BY c),
    w AS (SELECT x.c, x.nb AS a, y.nb AS b
          FROM adj x JOIN adj y ON x.c = y.c AND x.nb < y.nb),
    t AS (SELECT w.c, count(*) AS n_tri
          FROM w JOIN e1 ON w.a = e1.u AND w.b = e1.v
          GROUP BY w.c)
    SELECT deg.c AS node, deg.deg,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
           CAST(round(1e6 * ((2.0 * coalesce(t.n_tri, 0))
                             / (deg.deg * (deg.deg - 1))))
                AS BIGINT) AS coef_fp
    FROM deg LEFT JOIN t ON deg.c = t.c
    WHERE deg.deg >= 2
"""

ORACLES["sampled_estimate"] = """
    WITH s AS (
        SELECT count(*) AS n_total,
               CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, 1)
                             IN ('0', '1', '2', '3')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, 1)
                             IN ('0', '1', '2', '3')
                              AND n_chars >= 300
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_long_sampled
        FROM documents
    ),
    w AS (
        SELECT n_total, n_sampled, n_long_sampled,
               CAST(n_long_sampled AS DOUBLE) / n_sampled AS p,
               1.0 + (1.96 * 1.96) / n_sampled AS den
        FROM s
    ),
    h AS (
        SELECT *,
               (p + (1.96 * 1.96) / (2.0 * n_sampled)) / den AS center,
               (1.96 * sqrt((p * (1.0 - p)) / n_sampled
                            + (1.96 * 1.96)
                              / (4.0 * ((n_sampled * 1.0)
                                        * n_sampled)))) / den AS half
        FROM w
    )
    SELECT n_total, n_sampled, n_long_sampled,
           CAST(round(p * n_total) AS BIGINT) AS est_long_total,
           CAST(round(1e6 * (center - half)) AS BIGINT) AS ci_lo_fp,
           CAST(round(1e6 * (center + half)) AS BIGINT) AS ci_hi_fp
    FROM h
"""

ORACLES["containment_join"] = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text),
                                              '[^a-z0-9_]+'),
                           t -> t <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
        FROM toks, UNNEST(range(1, len(w) - 1)) AS u(i)
        WHERE len(w) >= 3
    ),
    szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id <> y.doc_id
        GROUP BY x.doc_id, y.doc_id
    )
    SELECT a, b, inter,
           CAST((inter * 1000000) // sa.sz AS BIGINT)
               AS containment_fp
    FROM pairs JOIN szs sa ON a = sa.doc_id
    WHERE inter * 100 >= 80 * sa.sz
"""

ORACLES["cascade_delete"] = """
    WITH gone AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0.0),
    so AS (SELECT o_orderkey FROM orders
           WHERE o_custkey NOT IN (SELECT c_custkey FROM gone))
    SELECT (SELECT count(*) FROM gone) AS n_customers_deleted,
           (SELECT count(*) FROM so) AS n_orders_surviving,
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM so))
               AS n_lineitems_surviving
"""

ORACLES["rollup_consistency"] = """
    WITH c AS (
        SELECT epoch_ns(o_orderdate) // 86400000000000 AS day,
               strftime(date_trunc('month', o_orderdate), '%Y-%m')
                   AS month,
               strftime(o_orderdate, '%Y') AS year,
               CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders
    ),
    g AS (
        SELECT 'day' AS granularity, count(DISTINCT day) AS n_groups,
               count(*) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS total_cents FROM c
        UNION ALL
        SELECT 'month', count(DISTINCT month), count(*),
               CAST(sum(cents) AS BIGINT) FROM c
        UNION ALL
        SELECT 'year', count(DISTINCT year), count(*),
               CAST(sum(cents) AS BIGINT) FROM c
    )
    SELECT granularity, n_groups, n_orders, total_cents FROM g
"""

ORACLES["weekday_profile"] = """
    WITH c AS (
        SELECT isodow(o_orderdate) AS weekday,
               CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders
    ),
    g AS (
        SELECT weekday, CAST(sum(cents) AS BIGINT) AS revenue_fp,
               count(*) AS n_orders
        FROM c GROUP BY weekday
    )
    SELECT weekday, revenue_fp, n_orders,
           CAST(round(1e4 * (CAST(revenue_fp AS DOUBLE)
                             / CAST(n_orders AS DOUBLE)))
                AS BIGINT) AS avg_cents_fp
    FROM g
"""

ORACLES["corpus_card"] = """
    WITH d AS (
        SELECT lang, source,
               len(string_split_regex(text, '\\s+')) AS n_tokens,
               len(text) AS n_chars
        FROM documents
    ),
    l AS (SELECT lang, count(*) AS c FROM d GROUP BY lang),
    s AS (SELECT CAST(sum(CAST(round(c * ln(c) * 1e9) AS BIGINT))
                      AS BIGINT) AS s FROM l),
    t AS (SELECT count(*) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(sum(n_chars) AS BIGINT) AS total_chars FROM d),
    ls AS (SELECT count(*) AS n_languages FROM l),
    sc AS (SELECT count(DISTINCT source) AS n_sources FROM d)
    SELECT n_docs, n_languages, n_sources, total_tokens, total_chars,
           CAST(round(1e6 * (ln(n_docs)
                             - ((CAST(s.s AS DOUBLE) / 1e9)
                                / n_docs))) AS BIGINT)
               AS lang_entropy_fp
    FROM t, ls, sc, s
"""

ORACLES["median_of_means"] = """
    WITH c AS (
        SELECT CAST(strpos('0123456789abcdef',
                           substr(md5(CAST(l_orderkey AS VARCHAR)),
                                  1, 1)) - 1 AS BIGINT) % 16 AS bucket,
               CAST(round(l_extendedprice * 100.0) AS BIGINT) AS cents
        FROM lineitem
    ),
    g AS (
        SELECT bucket, CAST(sum(cents) AS BIGINT) AS s,
               count(*) AS n
        FROM c GROUP BY bucket
    ),
    m AS (
        SELECT CAST(round(1e4 * (CAST(s AS DOUBLE)
                                 / (100.0 * n))) AS BIGINT) AS mean_fp
        FROM g
    ),
    r AS (
        SELECT mean_fp,
               row_number() OVER (ORDER BY mean_fp) AS rn,
               count(*) OVER () AS k
        FROM m
    )
    SELECT (SELECT CAST(max(k) AS BIGINT) FROM r) AS n_buckets,
           (SELECT mean_fp FROM r WHERE rn = (k - 1) // 2 + 1)
               AS mom_fp,
           (SELECT min(mean_fp) FROM r) AS min_bucket_mean_fp,
           (SELECT max(mean_fp) FROM r) AS max_bucket_mean_fp
"""

ORACLES["fd_discovery"] = """
    WITH cand AS (
        SELECT 'part' AS table_name, 'p_partkey' AS lhs,
               'p_brand' AS rhs,
               (SELECT count(DISTINCT p_partkey) FROM part)
                   AS n_distinct_lhs,
               (SELECT count(*) FROM (SELECT DISTINCT p_partkey,
                                             p_brand FROM part))
                   AS n_distinct_pair
        UNION ALL
        SELECT 'part', 'p_brand', 'p_type',
               (SELECT count(DISTINCT p_brand) FROM part),
               (SELECT count(*) FROM (SELECT DISTINCT p_brand, p_type
                                      FROM part))
        UNION ALL
        SELECT 'orders', 'o_custkey', 'o_orderpriority',
               (SELECT count(DISTINCT o_custkey) FROM orders),
               (SELECT count(*) FROM (SELECT DISTINCT o_custkey,
                                             o_orderpriority
                                      FROM orders))
        UNION ALL
        SELECT 'lineitem', 'l_orderkey', 'l_returnflag',
               (SELECT count(DISTINCT l_orderkey) FROM lineitem),
               (SELECT count(*) FROM (SELECT DISTINCT l_orderkey,
                                             l_returnflag
                                      FROM lineitem))
    )
    SELECT table_name, lhs, rhs,
           CAST(n_distinct_lhs AS BIGINT) AS n_distinct_lhs,
           CAST(n_distinct_pair AS BIGINT) AS n_distinct_pair,
           n_distinct_lhs = n_distinct_pair AS fd_holds
    FROM cand
"""

ORACLES["hill_tail_index"] = """
    WITH c AS (
        SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders ORDER BY cents DESC LIMIT 201
    ),
    m AS (SELECT CAST(min(cents) AS BIGINT) AS xk1 FROM c),
    t AS (
        SELECT CAST(sum(CAST(round((ln(cents) - ln(xk1)) * 1e9)
                             AS BIGINT)) AS BIGINT) AS s
        FROM c, m WHERE cents > xk1 OR cents = xk1
    )
    SELECT 200 AS k, xk1 AS xk1_cents,
           CAST(round(1e6 * ((CAST(s AS DOUBLE) / 1e9) / 200))
                AS BIGINT) AS hill_fp
    FROM t, m
"""

ORACLES["ks_drift"] = """
    WITH pts AS (
        SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) // 100 AS v,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS a,
               CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS b
        FROM orders WHERE o_orderstatus IN ('F', 'O')
    ),
    g AS (SELECT v, sum(a) AS c1, sum(b) AS c2 FROM pts GROUP BY v),
    t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c2) AS BIGINT) AS n2 FROM g),
    c AS (SELECT sum(c1) OVER w AS cum1, sum(c2) OVER w AS cum2
          FROM g WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
    d AS (SELECT CAST(max(abs(t.n2 * c.cum1 - t.n1 * c.cum2)) AS BIGINT)
              AS d_num FROM c, t)
    SELECT t.n1, t.n2, d.d_num,
           CAST(round(1e9 * (CAST(d.d_num AS DOUBLE) / (t.n1 * t.n2)))
                AS BIGINT) AS ks_fp
    FROM t, d
"""

ORACLES["mann_whitney"] = """
    WITH pts AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS a,
               CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS b
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    g AS (SELECT v, sum(a) AS c1, sum(b) AS c2 FROM pts GROUP BY v),
    c AS (SELECT c1, c2, c1 + c2 AS cnt,
                 coalesce(sum(c1 + c2) OVER (
                     ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS cumb
          FROM g),
    t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c2) AS BIGINT) AS n2,
                 CAST(sum(c1 * (2 * cumb + cnt + 1)) AS BIGINT) AS r1x2
          FROM c)
    SELECT n1, n2,
           CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(2 * n1 * n2 - (r1x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2
    FROM t
"""

ORACLES["cusum_changepoint"] = """
    WITH d AS (
        SELECT epoch_ns(ts) // 86400000000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY day
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS s FROM d),
    c AS (SELECT day,
                 sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                     AS cum,
                 row_number() OVER (ORDER BY day) AS rn
          FROM d),
    e AS (SELECT day, abs(t.n * c.cum - c.rn * t.s) AS dev FROM c, t),
    b AS (SELECT day, dev FROM e ORDER BY dev DESC, day LIMIT 1)
    SELECT t.n AS n_days, t.s AS total_events,
           CAST(b.dev AS BIGINT) AS max_dev_abs, b.day AS cp_day
    FROM t, b
"""

ORACLES["lag1_autocorr"] = """
    WITH d AS (
        SELECT epoch_ns(ts) // 86400000000000 AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY day
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS s FROM d),
    v AS (SELECT t.n * d.x - t.s AS dv,
                 lead(t.n * d.x - t.s) OVER (ORDER BY d.day) AS dnx
          FROM d, t),
    agg AS (SELECT CAST(sum(CASE WHEN dnx IS NULL THEN 0
                                 ELSE dv * dnx END) AS BIGINT) AS num,
                   CAST(sum(dv * dv) AS BIGINT) AS den
            FROM v)
    SELECT t.n AS n_days, agg.num, agg.den,
           CAST(round(1e9 * (CAST(agg.num AS DOUBLE) / agg.den))
                AS BIGINT) AS acf_fp
    FROM t, agg
"""

ORACLES["l_diversity"] = """
    SELECT o_orderpriority,
           CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS omonth,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_sensitive
    FROM orders GROUP BY 1, 2
"""

ORACLES["dq_violations"] = """
    SELECT 'bad_returnflag' AS rule,
           CAST(sum(CASE WHEN l_returnflag NOT IN ('R', 'N', 'A')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           CAST(count(*) AS BIGINT) AS n_checked
    FROM lineitem
    UNION ALL
    SELECT 'discount_gt_tax',
           CAST(sum(CASE WHEN l_discount > l_tax THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'price_below_1000x_qty',
           CAST(sum(CASE WHEN l_extendedprice < 1000.0 * l_quantity
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'qty_out_of_range',
           CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'ship_before_1996',
           CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1996-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
"""

ORACLES["zone_map_pruning"] = """
    WITH z AS (
        SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate)
                    AS BIGINT) AS yyyymm,
               l_orderkey
        FROM lineitem
    )
    SELECT yyyymm,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(l_orderkey) AS BIGINT) AS min_key,
           CAST(max(l_orderkey) AS BIGINT) AS max_key,
           yyyymm >= 199601 AND yyyymm <= 199612 AS would_scan
    FROM z GROUP BY yyyymm
"""

ORACLES["incremental_dedup"] = """
    WITH mx AS (
        SELECT CAST(max(doc_id) AS BIGINT) * 4 // 5 AS cutoff
        FROM documents
    ),
    store AS (
        SELECT DISTINCT md5(substr(text, 1, 16)) AS h
        FROM documents, mx WHERE doc_id < cutoff
    ),
    batch AS (
        SELECT md5(substr(text, 1, 16)) AS h,
               CAST(min(doc_id) AS BIGINT) AS doc_id
        FROM documents, mx WHERE doc_id >= cutoff GROUP BY 1
    )
    SELECT b.doc_id
    FROM batch b LEFT JOIN store s ON b.h = s.h
    WHERE s.h IS NULL
"""

ORACLES["apportion_quota"] = """
    WITH s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY source
    ),
    w AS (SELECT source, n, n * n AS wt FROM s),
    t AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM w),
    q AS (SELECT source, n, (1000 * wt) // t.tw AS q0,
                 1000 * wt - ((1000 * wt) // t.tw) * t.tw AS rem
          FROM w, t),
    l AS (SELECT CAST(1000 - sum(q0) AS BIGINT) AS leftover FROM q),
    r AS (SELECT source, n, q0,
                 row_number() OVER (ORDER BY rem DESC, source) AS rk
          FROM q)
    SELECT r.source, r.n AS n_docs,
           CAST(r.q0 + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM r, l
"""

ORACLES["edge_reciprocity"] = """
    WITH e AS (
        SELECT DISTINCT event_id % 151 AS src,
               (event_id * event_id) % 151 AS dst
        FROM events
        WHERE event_id % 151 <> (event_id * event_id) % 151
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM e),
    r AS (SELECT CAST(count(*) AS BIGINT) AS nr
          FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src)
    SELECT m.m_edges, r.nr AS n_reciprocated,
           CAST(round(1e6 * (CAST(r.nr AS DOUBLE) / m.m_edges))
                AS BIGINT) AS recip_fp
    FROM m, r
"""

ORACLES["stickiness_dau_mau"] = """
    WITH p AS (
        SELECT DISTINCT
               CAST(year(ts) * 100 + month(ts) AS BIGINT) AS mo,
               epoch_ns(ts) // 86400000000000 AS day, user_id
        FROM events
    ),
    a AS (SELECT mo, CAST(count(*) AS BIGINT) AS sdau
          FROM p GROUP BY mo),
    d AS (SELECT mo, CAST(count(DISTINCT day) AS BIGINT) AS ndays
          FROM p GROUP BY mo),
    u AS (SELECT mo, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
          FROM p GROUP BY mo)
    SELECT a.mo AS month, a.sdau, d.ndays, u.mau,
           CAST(round(1e6 * (CAST(a.sdau AS DOUBLE)
                             / (d.ndays * u.mau))) AS BIGINT)
               AS stickiness_fp
    FROM a JOIN d ON a.mo = d.mo JOIN u ON a.mo = u.mo
"""

ORACLES["anova_f"] = """
    WITH m AS (
        SELECT l_returnflag AS g,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sx,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sxx
        FROM lineitem GROUP BY 1
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS n,
                 CAST(sum(sx) AS BIGINT) AS s,
                 CAST(sum(sxx) AS BIGINT) AS q FROM m),
    b AS (SELECT CAST(sum(CAST(round(
                     1e6 * ((CAST(sx AS DOUBLE) * sx) / n))
                     AS BIGINT)) AS BIGINT) AS st FROM m),
    s2 AS (SELECT t.k, t.n,
                  b.st - CAST(round(1e6 * ((CAST(t.s AS DOUBLE) * t.s)
                                           / t.n)) AS BIGINT) AS ssb,
                  1000000 * t.q - b.st AS ssw
           FROM t, b)
    SELECT k AS k_groups, n AS n_total,
           CAST(ssb AS BIGINT) AS ssb_fp, CAST(ssw AS BIGINT) AS ssw_fp,
           CAST(round(1e6 * (CAST((n - k) * ssb AS DOUBLE)
                             / CAST((k - 1) * ssw AS DOUBLE)))
                AS BIGINT) AS f_fp
    FROM s2
"""

ORACLES["trending_terms"] = """
    WITH mx AS (SELECT CAST(max(doc_id) AS BIGINT) // 2 AS cutoff
                FROM documents),
    tok AS (
        SELECT CASE WHEN doc_id >= mx.cutoff THEN 1 ELSE 0 END AS lt,
               unnest(regexp_split_to_array(lower(text),
                                            '[^a-z0-9_]+')) AS term
        FROM documents, mx
    ),
    g AS (
        SELECT term,
               CAST(sum(1 - lt) AS BIGINT) AS c_early,
               CAST(sum(lt) AS BIGINT) AS c_late
        FROM tok WHERE term <> '' GROUP BY term
    )
    SELECT term, c_early, c_late,
           CAST(c_late - c_early AS BIGINT) AS delta
    FROM g ORDER BY delta DESC, term LIMIT 20
"""

ORACLES["dup_cluster_sizes"] = """
    WITH c AS (
        SELECT md5(substr(text, 1, 16)) AS h,
               CAST(count(*) AS BIGINT) AS sz
        FROM documents GROUP BY 1
    )
    SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
    FROM c GROUP BY sz
"""


# =============================================== round-3 seventh batch


def q_hhi_concentration(sf_dir):
    """Herfindahl–Hirschman revenue-concentration index across nations
    (the market-concentration gate a source-mixing pipeline runs before
    trusting a corpus split). Revenue is integer cents; orders pre-
    aggregate to one row per customer BEFORE the customer join (the
    exchange moves |customer| skinny rows, never |orders|), nation sums
    are ≤25 rows, and the final share-of-squares is EXACT Python-int
    arithmetic mirrored by HUGEINT in the oracle — Σsᵢ²·10¹² and the
    grand total² stay under 128 bits through ~sf1000. Division is
    positive-truncating on both sides (Python ``//`` vs HUGEINT ``/``)."""
    orders = T(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "ck": b["o_custkey"],
            "p": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    per_cust = fast_groupby_agg(
        orders.map_batches(_fp, batch_format="pyarrow"),
        ["ck"], {"s": ("p", "sum")})
    cust = T(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = per_cust.join(cust, "inner", num_partitions=JOIN_PARTS,
                      on=("ck",), right_on=("c_custkey",))
    nat = fast_groupby_agg(j, ["c_nationkey"], {"s": ("s", "sum")}).to_pandas()
    s = [int(v) for v in nat["s"]]
    tot = sum(s)
    ssq = sum(v * v for v in s)
    return pd.DataFrame([{
        "n_nations": np.int64(len(s)),
        "hhi_fp": np.int64(ssq * 10**12 // (tot * tot)),
    }])


# lcm(1..50): every rounded l_quantity divides it exactly, so per-value
# reciprocal mass c·(L/x) is an exact integer on both engines.
_HARMONIC_L = 3099044504245996706400  # 72 bits; HUGEINT literal in SQL


def q_grouped_harmonic(sf_dir):
    """Exact harmonic mean of l_quantity per return flag via the
    common-denominator trick: with L = lcm(1..50), Σ 1/x = Σ (L/x) / L
    is EXACT integer arithmetic — no float reciprocal sum (whose result
    would depend on association order). The distributed part is a
    (flag, value) value-count groupby (≤ 200 rows out, map-side
    combined); the ≤200-row table finishes on the driver in Python
    ints, mirrored by HUGEINT in the oracle. n·L·10⁶ < 2¹²⁷ through
    ~sf100."""
    li = T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _x(b: pa.Table) -> pa.Table:
        return pa.table({
            "f": b["l_returnflag"],
            "x": pa.array(_round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False)
            ).astype(np.int64), pa.int64()),
        })

    cells = fast_groupby_agg(
        li.map_batches(_x, batch_format="pyarrow"),
        ["f", "x"], {"c": (None, "count")}).to_pandas()
    rows = []
    for f, g in cells.groupby("f", sort=True):
        n = int(g["c"].sum())
        s = sum(int(c) * (_HARMONIC_L // int(x))
                for x, c in zip(g["x"], g["c"]))
        rows.append({"l_returnflag": f, "n": np.int64(n),
                     "harm_fp": np.int64(n * _HARMONIC_L * 10**6 // s)})
    return pd.DataFrame(rows)


def q_spearman_corr(sf_dir):
    """Global Spearman rank correlation of l_quantity vs l_discount —
    the monotone-association check (Pearson misses nonlinear ties;
    grouped_corr covers that side). Both columns have TINY domains
    (≤50 × ≤11 distinct values), so the whole fact table reduces to a
    map-side-combined (x, y) contingency table; average tie-ranks are
    held as EXACT integers via the 2·rank trick (2·cum_before+cnt+1),
    and all six rank moments are Python-int / HUGEINT exact (< 2¹²⁷
    through sf100). The only floats are the mirrored final expression:
    int→double casts (correctly rounded on BOTH engines — verified
    against DuckDB's HUGEINT cast at half-ulp tie points), IEEE sqrt
    and one division."""
    li = T(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def _xy(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pa.array(_round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False)
            ).astype(np.int64), pa.int64()),
            "y": pa.array(_round_half_away(
                b["l_discount"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    cells = fast_groupby_agg(
        li.map_batches(_xy, batch_format="pyarrow"),
        ["x", "y"], {"c": (None, "count")}).to_pandas()

    def _rank2(marg: dict[int, int]) -> dict[int, int]:
        out, cum = {}, 0
        for v in sorted(marg):
            out[v] = 2 * cum + marg[v] + 1
            cum += marg[v]
        return out

    mx = cells.groupby("x")["c"].sum().astype(int).to_dict()
    my = cells.groupby("y")["c"].sum().astype(int).to_dict()
    r2x, r2y = _rank2(mx), _rank2(my)
    n = sx = sy = sxx = syy = sxy = 0
    for x, y, c in zip(cells["x"], cells["y"], cells["c"]):
        c, rx, ry = int(c), r2x[int(x)], r2y[int(y)]
        n += c
        sx += c * rx
        sy += c * ry
        sxx += c * rx * rx
        syy += c * ry * ry
        sxy += c * rx * ry
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    rho = float(num) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
    return pd.DataFrame([{
        "n": np.int64(n),
        "rho_fp": np.int64(int(_round_half_away(
            np.array([rho * 1e9]))[0])),
    }])


def q_survival_km(sf_dir):
    """Kaplan–Meier survival curve for repeat purchase: per customer,
    days from the FIRST order to the SECOND; single-order customers
    are right-censored at the dataset's last order date — the textbook
    churn estimator with real censoring. The per-customer bottom-2
    order dates come from ONE splitmix64(custkey) % P shuffle and a
    vectorized per-partition walk (lexsort by (ck, t), np.unique group
    starts — P udf calls, not one per customer); a map-side-combined
    value-count over
    (duration_days, observed) then leaves a TIME-SPAN-sized table
    (≤ ~2400 rows at any sf) for the driver. Survival is the
    left-to-right float product Π (n_risk−d)/n_risk — every factor is
    a ≤2⁵³-exact int division and IEEE multiply, so the recurrence is
    bit-equal to the oracle's ordered RECURSIVE CTE (no libm
    anywhere)."""
    orders = T(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    from ..functions.sketches import _splitmix64

    P = 64

    def _us(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ck": b["o_custkey"],
            "part": pa.array(
                (_splitmix64(ck) % np.uint64(P)).astype(np.int64)),
            "t": b["o_orderdate"].cast(pa.int64())})

    tsd = orders.map_batches(_us, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Max

    gmax = int(tsd.aggregate(Max("t", alias_name="m"))["m"])

    def _bottom2(df: pd.DataFrame) -> pd.DataFrame:
        ck0 = df["ck"].to_numpy(np.int64)
        t0 = df["t"].to_numpy(np.int64)
        order = np.lexsort((t0, ck0))
        ck, t = ck0[order], t0[order]
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        counts = np.diff(np.r_[starts, len(ck)])
        multi = counts >= 2
        t1 = t[starts]
        second = np.where(multi, t[np.minimum(starts + 1, len(t) - 1)],
                          gmax)
        return pd.DataFrame({
            "dur": ((second - t1) // 86_400_000_000).astype(np.int64),
            "obs": multi.astype(np.int64),
        })

    per_cust = tsd.groupby("part").map_groups(
        _bottom2, batch_format="pandas")
    vc = fast_groupby_agg(
        per_cust, ["dur"],
        {"d": ("obs", "sum"), "tot": (None, "count")}).to_pandas()
    vc = vc.sort_values("dur", ascending=False).reset_index(drop=True)
    n_risk = vc["tot"].cumsum().astype(int)
    rows = []
    s = None
    for dur, d, nr in sorted(zip(vc["dur"].astype(int), vc["d"].astype(int),
                                 n_risk), key=lambda r: r[0]):
        if d == 0:
            continue
        # mirrored op order: (n_risk − d) * 1.0 / n_risk, seeded at 1.0
        factor = float(nr - d) * 1.0 / float(nr)
        s = factor if s is None else s * factor
        rows.append({"t_days": np.int64(dur), "n_risk": np.int64(nr),
                     "d_events": np.int64(d),
                     "surv_fp": np.int64(int(_round_half_away(
                         np.array([s * 1e9]))[0]))})
    return pd.DataFrame(rows)


@ray.remote
def _block_nrows_task(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _block_take_task(t: pa.Table, idxs: list[int]) -> list[int]:
    col = t["v"].to_numpy(zero_copy_only=False)
    return [int(col[i]) for i in idxs]


def q_equidepth_histogram(sf_dir):
    """Equi-depth (equal-frequency) 10-bucket histogram of order value —
    the statistics primitive equi-WIDTH histograms (q_histogram) can't
    replace on skewed data, and the building block for range-
    partitioning a fact column. o_totalprice is near-unique, so the
    value-counts CDF of q_quantiles would be corpus-sized; instead this
    is a distributed RANK-SELECT: sort the fp column (the one sanctioned
    all-to-all), read per-block row counts via skinny remote tasks
    (blocks stay in plasma — the driver holds ONE int per block), then
    fetch exactly the ≤10 boundary rows from the ≤10 blocks that
    contain them. Boundary ranks are ceil(j·n/10) with the float
    product mirrored in the oracle (j·n exact in double through 2⁵³)."""
    orders = T(sf_dir, "orders", ["o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({"v": pa.array(_round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64), pa.int64())})

    ds = orders.map_batches(_fp, batch_format="pyarrow") \
        .sort("v").materialize()
    refs = ds.to_arrow_refs()
    counts = ray.get([_block_nrows_task.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)])
    n = int(offsets[-1])
    ranks = [(j, int(math.ceil(j * n / 10.0))) for j in range(1, 11)]
    wanted: dict[int, list[tuple[int, int]]] = {}
    for j, rk in ranks:
        # rk is 1-based; row index rk-1 lives in block bi with
        # offsets[bi] <= rk-1 < offsets[bi+1]
        bi = int(np.searchsorted(offsets[1:], rk - 1, side="right"))
        wanted.setdefault(bi, []).append((j, rk - 1 - int(offsets[bi])))
    fetched = ray.get([
        _block_take_task.remote(refs[bi], [li for _, li in pairs])
        for bi, pairs in wanted.items()])
    out = {}
    for (bi, pairs), vals in zip(wanted.items(), fetched):
        for (j, _), v in zip(pairs, vals):
            out[j] = v
    return pd.DataFrame([{
        "bucket": np.int64(j), "cum_rank": np.int64(rk),
        "boundary": np.int64(out[j]),
    } for j, rk in ranks])


ORACLES["hhi_concentration"] = """
    WITH r AS (
        -- sum(BIGINT) is an exact HUGEINT in DuckDB; sum(HUGEINT)
        -- silently degrades to DOUBLE, hence the DECIMAL(38,0) sums
        -- at the next level
        SELECT c_nationkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    ),
    t AS (SELECT count(*) AS k,
                 CAST(sum(CAST(s AS DECIMAL(38, 0))) AS HUGEINT) AS tot,
                 CAST(sum(CAST(s * s AS DECIMAL(38, 0))) AS HUGEINT) AS ssq
          FROM r)
    SELECT CAST(k AS BIGINT) AS n_nations,
           CAST(ssq * 1000000000000 // (tot * tot) AS BIGINT) AS hhi_fp
    FROM t
"""

ORACLES["grouped_harmonic"] = """
    WITH m AS (
        SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS x
        FROM lineitem
    ),
    g AS (SELECT l_returnflag, x, count(*) AS c FROM m GROUP BY 1, 2),
    a AS (
        SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CAST(CAST(c AS HUGEINT)
                   * (CAST('3099044504245996706400' AS HUGEINT) // x)
                   AS DECIMAL(38, 0))) AS HUGEINT) AS s
        FROM g GROUP BY 1
    )
    SELECT l_returnflag, n,
           CAST(CAST(n AS HUGEINT)
                * CAST('3099044504245996706400' AS HUGEINT)
                * 1000000 // s AS BIGINT) AS harm_fp
    FROM a
"""

ORACLES["spearman_corr"] = """
    WITH m AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_discount * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    cells AS (SELECT x, y, count(*) AS c FROM m GROUP BY x, y),
    mgx AS (SELECT x, sum(c) AS cx FROM cells GROUP BY x),
    mgy AS (SELECT y, sum(c) AS cy FROM cells GROUP BY y),
    rx AS (
        SELECT x, 2 * CAST(COALESCE(sum(cx) OVER (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT)
                 + CAST(cx AS BIGINT) + 1 AS r2x
        FROM mgx
    ),
    ry AS (
        SELECT y, 2 * CAST(COALESCE(sum(cy) OVER (ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT)
                 + CAST(cy AS BIGINT) + 1 AS r2y
        FROM mgy
    ),
    s AS (
        -- DECIMAL(38,0) sums: sum(HUGEINT) degrades to DOUBLE in
        -- DuckDB, which is exact only below 2^53 and would silently
        -- drift at scale
        SELECT CAST(sum(c) AS HUGEINT) AS n,
               CAST(sum(CAST(CAST(c AS HUGEINT) * r2x
                    AS DECIMAL(38, 0))) AS HUGEINT) AS sx,
               CAST(sum(CAST(CAST(c AS HUGEINT) * r2y
                    AS DECIMAL(38, 0))) AS HUGEINT) AS sy,
               CAST(sum(CAST(CAST(c AS HUGEINT) * r2x * r2x
                    AS DECIMAL(38, 0))) AS HUGEINT) AS sxx,
               CAST(sum(CAST(CAST(c AS HUGEINT) * r2y * r2y
                    AS DECIMAL(38, 0))) AS HUGEINT) AS syy,
               CAST(sum(CAST(CAST(c AS HUGEINT) * r2x * r2y
                    AS DECIMAL(38, 0))) AS HUGEINT) AS sxy
        FROM cells JOIN rx USING (x) JOIN ry USING (y)
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
                / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                   * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                * 1000000000.0) AS BIGINT) AS rho_fp
    FROM s
"""

ORACLES["survival_km"] = """
    WITH RECURSIVE o2 AS (
        SELECT o_custkey, epoch_us(o_orderdate) AS t FROM orders
    ),
    g AS (SELECT max(t) AS gmax FROM o2),
    r AS (
        SELECT o_custkey, t,
               row_number() OVER (PARTITION BY o_custkey ORDER BY t) AS rn
        FROM o2
    ),
    u AS (
        SELECT o_custkey, min(t) AS mn, count(*) AS c,
               min(CASE WHEN rn = 2 THEN t END) AS m2
        FROM r GROUP BY o_custkey
    ),
    d AS (
        SELECT CASE WHEN c >= 2 THEN (m2 - mn) // 86400000000
                    ELSE ((SELECT gmax FROM g) - mn) // 86400000000
               END AS dur,
               CASE WHEN c >= 2 THEN 1 ELSE 0 END AS obs
        FROM u
    ),
    vc AS (
        SELECT dur, CAST(sum(obs) AS BIGINT) AS d_events,
               CAST(count(*) AS BIGINT) AS tot
        FROM d GROUP BY dur
    ),
    ev AS (
        SELECT dur, d_events,
               CAST(sum(tot) OVER (ORDER BY dur DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_risk
        FROM vc
    ),
    ev2 AS (
        SELECT dur, d_events, n_risk,
               row_number() OVER (ORDER BY dur) AS rn
        FROM ev WHERE d_events > 0
    ),
    km AS (
        SELECT rn, dur, d_events, n_risk,
               (n_risk - d_events) * 1.0 / n_risk AS s
        FROM ev2 WHERE rn = 1
        UNION ALL
        SELECT e.rn, e.dur, e.d_events, e.n_risk,
               km.s * ((e.n_risk - e.d_events) * 1.0 / e.n_risk)
        FROM km JOIN ev2 e ON e.rn = km.rn + 1
    )
    SELECT dur AS t_days, n_risk, d_events,
           CAST(round(s * 1000000000.0) AS BIGINT) AS surv_fp
    FROM km
"""

ORACLES["equidepth_histogram"] = """
    WITH m AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
    ),
    r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM m),
    t AS (SELECT count(*) AS n FROM m),
    b AS (
        SELECT CAST(j AS BIGINT) AS bucket,
               CAST(ceil(j * (SELECT n FROM t) / 10.0) AS BIGINT) AS cum_rank
        FROM range(1, 11) s(j)
    )
    SELECT bucket, cum_rank, r.v AS boundary
    FROM b JOIN r ON r.rn = b.cum_rank
"""


def q_daily_ewma(sf_dir):
    """Exponentially weighted moving average of daily revenue
    (α = 0.25) — the smoothing primitive behind anomaly baselines and
    trend dashboards, and a SECOND instance of the ordered-IEEE-
    recurrence contract introduced by survival_km: the distributed part
    is one map-side-combined day histogram (time-span bounded, ≤ ~2400
    rows at any sf); the recurrence s_t = 0.25·v_t + 0.75·s_{t−1} runs
    left-to-right over exact integer cents, so every step is two IEEE
    multiplies and an add — bit-equal to the oracle's ordered RECURSIVE
    CTE. ewma_fp is ×100 half-away quantized (cent-hundredths keep it
    under 2⁶³ through ~sf1000)."""
    orders = T(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def _day(b: pa.Table) -> pa.Table:
        return pa.table({
            "d": pa.array(
                b["o_orderdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 86_400_000_000, pa.int64()),
            "v": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    vc = fast_groupby_agg(
        orders.map_batches(_day, batch_format="pyarrow"),
        ["d"], {"v": ("v", "sum")}).to_pandas().sort_values("d")
    rows, s = [], None
    for d, v in zip(vc["d"].astype(int), vc["v"].astype(int)):
        # mirrored op order: 0.25 * v + 0.75 * s (v implicit int→double)
        s = 1.0 * v if s is None else 0.25 * v + 0.75 * s
        rows.append({"d": np.int64(d), "v": np.int64(v),
                     "ewma_fp": np.int64(int(_round_half_away(
                         np.array([s * 100.0]))[0]))})
    return pd.DataFrame(rows)


def q_grouped_boxplot(sf_dir):
    """Five-number boxplot profile per return flag — min, Q1, median,
    Q3, max by the pinned rank rule (rank = ceil(q·n), the
    q_quantiles contract), plus the 1.5·IQR outlier count computed
    all-integer (2x vs 2·Q1 − 3·IQR cross-multiplication, no float
    anywhere). The distributed part is the (flag, value) value-count
    fold (≤ 200 rows out at any sf); the CDF walk finishes on the
    driver and is mirrored by window cumulative sums in the oracle."""
    li = T(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _x(b: pa.Table) -> pa.Table:
        return pa.table({
            "f": b["l_returnflag"],
            "x": pa.array(_round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False)
            ).astype(np.int64), pa.int64()),
        })

    cells = fast_groupby_agg(
        li.map_batches(_x, batch_format="pyarrow"),
        ["f", "x"], {"c": (None, "count")}).to_pandas()
    rows = []
    for f, g in cells.sort_values("x").groupby("f", sort=True):
        xs = g["x"].to_numpy(np.int64)
        cs = g["c"].to_numpy(np.int64)
        cum = np.cumsum(cs)
        n = int(cum[-1])

        def _at(q: float) -> int:
            rk = math.ceil(q * n)  # mirrored float product, exact <2^53
            return int(xs[np.searchsorted(cum, rk, side="left")])

        q1, med, q3 = _at(0.25), _at(0.5), _at(0.75)
        iqr = q3 - q1
        out_mask = (2 * xs < 2 * q1 - 3 * iqr) | (2 * xs > 2 * q3 + 3 * iqr)
        rows.append({
            "l_returnflag": f, "n": np.int64(n),
            "x_min": np.int64(xs[0]), "q1": np.int64(q1),
            "med": np.int64(med), "q3": np.int64(q3),
            "x_max": np.int64(xs[-1]),
            "n_outliers": np.int64(int(cs[out_mask].sum())),
        })
    return pd.DataFrame(rows)


def q_interpolate_daily(sf_dir):
    """Dense daily revenue series with LINEAR interpolation across
    missing days (gap_fill's zero-fill sibling — the resampling rule a
    rate metric needs). Interpolation is exact integer cross-
    multiplication, (v0·(d1−t) + v1·(t−d0))·10³ // (d1−d0), in Python
    ints mirrored by HUGEINT — no float slope, no accumulation. The
    distributed part is the one day-histogram exchange; the dense walk
    is TIME-SPAN bounded (~2400 rows/decade) on the driver, mirrored
    by a generate_series × prev/next lookup in the oracle."""
    orders = T(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def _day(b: pa.Table) -> pa.Table:
        return pa.table({
            "d": pa.array(
                b["o_orderdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 86_400_000_000, pa.int64()),
            "v": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    vc = fast_groupby_agg(
        orders.map_batches(_day, batch_format="pyarrow"),
        ["d"], {"v": ("v", "sum")}).to_pandas().sort_values("d")
    ds_ = vc["d"].to_numpy(np.int64)
    vs = vc["v"].to_numpy(np.int64)
    rows = []
    for t in range(int(ds_[0]), int(ds_[-1]) + 1):
        i = int(np.searchsorted(ds_, t, side="left"))
        if i < len(ds_) and int(ds_[i]) == t:
            v_fp = int(vs[i]) * 1000
        else:
            d0, v0 = int(ds_[i - 1]), int(vs[i - 1])
            d1, v1 = int(ds_[i]), int(vs[i])
            v_fp = (v0 * (d1 - t) + v1 * (t - d0)) * 1000 // (d1 - d0)
        rows.append({"t": np.int64(t), "v_fp": np.int64(v_fp)})
    return pd.DataFrame(rows)


ORACLES["daily_ewma"] = """
    WITH RECURSIVE m AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS d,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
        FROM orders GROUP BY 1
    ),
    e AS (
        SELECT d, CAST(v AS BIGINT) AS v,
               row_number() OVER (ORDER BY d) AS rn
        FROM m
    ),
    w AS (
        -- e0 suffixes force DOUBLE literals (bare 0.25 is DECIMAL in
        -- DuckDB, which would diverge from the engine's IEEE ops)
        SELECT rn, d, v, 1.0e0 * v AS s FROM e WHERE rn = 1
        UNION ALL
        SELECT e.rn, e.d, e.v, 0.25e0 * e.v + 0.75e0 * w.s
        FROM w JOIN e ON e.rn = w.rn + 1
    )
    SELECT d, v, CAST(round(s * 100.0) AS BIGINT) AS ewma_fp FROM w
"""

ORACLES["grouped_boxplot"] = """
    WITH m AS (
        SELECT l_returnflag AS f,
               CAST(round(l_quantity) AS BIGINT) AS x
        FROM lineitem
    ),
    g AS (SELECT f, x, CAST(count(*) AS BIGINT) AS c FROM m GROUP BY 1, 2),
    w AS (
        SELECT f, x, c,
               CAST(sum(c) OVER (PARTITION BY f ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(sum(c) OVER (PARTITION BY f) AS BIGINT) AS n
        FROM g
    ),
    pick AS (
        SELECT f, n,
               min(x) FILTER (cum >= CAST(ceil(0.25 * n) AS BIGINT)) AS q1,
               min(x) FILTER (cum >= CAST(ceil(0.5 * n) AS BIGINT)) AS med,
               min(x) FILTER (cum >= CAST(ceil(0.75 * n) AS BIGINT)) AS q3,
               min(x) AS x_min, max(x) AS x_max
        FROM w GROUP BY f, n
    )
    SELECT p.f AS l_returnflag, p.n, p.x_min, p.q1, p.med, p.q3, p.x_max,
           CAST(COALESCE((
               SELECT sum(g2.c) FROM g g2
               WHERE g2.f = p.f
                 AND (2 * g2.x < 2 * p.q1 - 3 * (p.q3 - p.q1)
                      OR 2 * g2.x > 2 * p.q3 + 3 * (p.q3 - p.q1))
           ), 0) AS BIGINT) AS n_outliers
    FROM pick p
"""

ORACLES["interpolate_daily"] = """
    WITH m AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
    ),
    b AS (SELECT min(d) AS lo, max(d) AS hi FROM m),
    days AS (
        SELECT unnest(generate_series(lo, hi)) AS t FROM b
    ),
    nb AS (
        SELECT t,
               (SELECT max(d) FROM m WHERE d <= t) AS d0,
               (SELECT min(d) FROM m WHERE d >= t) AS d1
        FROM days
    )
    SELECT nb.t,
           CASE WHEN nb.d0 = nb.d1
                THEN (SELECT v FROM m WHERE d = nb.t) * 1000
                ELSE CAST((CAST(m0.v AS HUGEINT) * (nb.d1 - nb.t)
                           + CAST(m1.v AS HUGEINT) * (nb.t - nb.d0))
                          * 1000 // (nb.d1 - nb.d0) AS BIGINT)
           END AS v_fp
    FROM nb
    LEFT JOIN m m0 ON m0.d = nb.d0
    LEFT JOIN m m1 ON m1.d = nb.d1
"""


def q_kendall_tau(sf_dir):
    """Kendall τ-b of l_quantity vs l_discount — the concordance-based
    rank association (Spearman's sibling; robust to different tie
    structure). Everything before the final division is EXACT integer:
    concordant/discordant pair mass comes from the tiny-domain (x, y)
    contingency fold (≤ 550 cells at any sf) as Σ c_a·c_b over cell
    pairs strictly ordered in both / opposite dimensions, and the tie
    corrections n₀−n₁, n₀−n₂ are integer marginal sums. The oracle
    mirrors with HUGEINT (sum(BIGINT)→HUGEINT is exact; per-term
    products stay under 2⁶³ through sf100) and the one final
    float-sqrt-division expression is written operation-for-operation
    identically."""
    li = T(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def _xy(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pa.array(_round_half_away(
                b["l_quantity"].to_numpy(zero_copy_only=False)
            ).astype(np.int64), pa.int64()),
            "y": pa.array(_round_half_away(
                b["l_discount"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    cells = fast_groupby_agg(
        li.map_batches(_xy, batch_format="pyarrow"),
        ["x", "y"], {"c": (None, "count")}).to_pandas()
    recs = [(int(x), int(y), int(c))
            for x, y, c in zip(cells["x"], cells["y"], cells["c"])]
    conc = disc = 0
    for xa, ya, ca in recs:
        for xb, yb, cb in recs:
            if xb > xa and yb > ya:
                conc += ca * cb
            elif xb > xa and yb < ya:
                disc += ca * cb
    n = sum(c for _, _, c in recs)
    n0 = n * (n - 1) // 2
    mx: dict[int, int] = {}
    my: dict[int, int] = {}
    for x, y, c in recs:
        mx[x] = mx.get(x, 0) + c
        my[y] = my.get(y, 0) + c
    n1 = sum(c * (c - 1) // 2 for c in mx.values())
    n2 = sum(c * (c - 1) // 2 for c in my.values())
    tau = float(conc - disc) / (math.sqrt(float(n0 - n1))
                                * math.sqrt(float(n0 - n2)))
    return pd.DataFrame([{
        "n": np.int64(n), "conc": np.int64(conc), "disc": np.int64(disc),
        "tau_fp": np.int64(int(_round_half_away(np.array([tau * 1e9]))[0])),
    }])


_MARKOV_ITERS = 12
_MARKOV_SCALE = 10**9


def q_markov_stationary(sf_dir, iters: int = _MARKOV_ITERS):
    """Stationary distribution of the event-type Markov chain by power
    iteration — where does a user's session settle? States are the
    event-type domain (≤ a handful); the DISTRIBUTED work is the
    consecutive-pair transition count (per-user sorted pairing, then a
    map-side-combined (prev, next) fold — the event_transitions plan,
    aggregated globally); the k×k iteration runs on the driver
    ENTIRELY in ×10⁹ integer fixed point — pᵗ⁺¹(j) = Σᵢ pᵗ(i)·c(i,j)
    // out(i) — so every level is summation-order-free and the oracle
    (the same recurrence unrolled one CTE per iteration, pagerank's
    pattern) matches bit for bit. Mass evaporates at states with no
    outgoing edges (documented; none in this domain); states with no
    incoming edges read 0 via the final left join."""
    ev = T(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        return pd.DataFrame({"prv": et[:-1], "nxt": et[1:]})

    trans = fast_groupby_agg(
        ev.groupby("user_id").map_groups(_pairs, batch_format="pandas"),
        ["prv", "nxt"], {"c": (None, "count")}).to_pandas()
    states = sorted(set(ev.unique("event_type")))
    out = {s: 0 for s in states}
    for p, c in zip(trans["prv"], trans["c"]):
        out[p] += int(c)
    k = len(states)
    pi = {s: _MARKOV_SCALE // k for s in states}
    tl = [(p, nx, int(c)) for p, nx, c in
          zip(trans["prv"], trans["nxt"], trans["c"])]
    for _ in range(iters):
        nxt_pi = {s: 0 for s in states}
        for p, nx, c in tl:
            nxt_pi[nx] += pi[p] * c // out[p]
        pi = nxt_pi
    return pd.DataFrame([
        {"event_type": s, "pi_fp": np.int64(pi[s])} for s in states])


def _markov_oracle(iters: int = _MARKOV_ITERS) -> str:
    """Unrolled power-iteration CTE (one level per iteration — the
    pagerank oracle pattern; integer fixed point throughout)."""
    lvls = [f"""
    p0 AS (
        SELECT st, CAST({_MARKOV_SCALE} // (SELECT count(*) FROM states)
                   AS BIGINT) AS pi
        FROM states
    )"""]
    for i in range(iters):
        lvls.append(f"""
    p{i + 1} AS (
        SELECT t.nxt AS st,
               CAST(sum(p.pi * t.c // t.rt) AS BIGINT) AS pi
        FROM p{i} p JOIN trans t ON t.prv = p.st
        GROUP BY t.nxt
    )""")
    return f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    raw AS (
        SELECT event_type AS prv, nxt, CAST(count(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    trans AS (
        SELECT prv, nxt, c,
               CAST(sum(c) OVER (PARTITION BY prv) AS BIGINT) AS rt
        FROM raw
    ),
    states AS (SELECT DISTINCT event_type AS st FROM events),
    {','.join(lvls)}
    SELECT s.st AS event_type,
           CAST(COALESCE(p.pi, 0) AS BIGINT) AS pi_fp
    FROM states s LEFT JOIN p{iters} p ON p.st = s.st
"""


ORACLES["kendall_tau"] = """
    WITH m AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_discount * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
              FROM m GROUP BY x, y),
    cd AS (
        SELECT
            CAST(COALESCE((SELECT sum(a.c * b.c) FROM cells a
                 JOIN cells b ON b.x > a.x AND b.y > a.y), 0)
                 AS HUGEINT) AS conc,
            CAST(COALESCE((SELECT sum(a.c * b.c) FROM cells a
                 JOIN cells b ON b.x > a.x AND b.y < a.y), 0)
                 AS HUGEINT) AS disc
    ),
    marg AS (
        SELECT CAST(sum(c) AS HUGEINT) AS n,
               CAST((SELECT sum(cx * (cx - 1) // 2) FROM (
                    SELECT sum(c) AS cx FROM cells GROUP BY x))
                    AS HUGEINT) AS n1,
               CAST((SELECT sum(cy * (cy - 1) // 2) FROM (
                    SELECT sum(c) AS cy FROM cells GROUP BY y))
                    AS HUGEINT) AS n2
        FROM cells
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(conc AS BIGINT) AS conc,
           CAST(disc AS BIGINT) AS disc,
           CAST(round(CAST(conc - disc AS DOUBLE)
                / (sqrt(CAST(n * (n - 1) // 2 - n1 AS DOUBLE))
                   * sqrt(CAST(n * (n - 1) // 2 - n2 AS DOUBLE)))
                * 1000000000.0) AS BIGINT) AS tau_fp
    FROM cd, marg
"""

ORACLES["markov_stationary"] = _markov_oracle()


def q_confusion_matrix(sf_dir, n_classes: int = 3):
    """Model-evaluation scorecard: per-class TP/FP/FN and integer ×10⁶
    precision / recall / F1 of the q_batch_inference scorer against
    the derived ground truth ``label % n_classes`` (the embeddings
    table's 10 raw labels folded onto the scorer's 3-class head).
    Distributed part: the inference Dataset hash-joins embeddings on
    vec_id, then one map-side-combined (truth, pred) fold — the
    exchange is the k×k confusion matrix, never rows. Per-class ratios
    are floor divisions over exact counts; F1 is the all-integer
    2·p·r // (p+r) with a zero guard — mirrored literally in SQL."""
    from .queries import q_batch_inference

    pred = q_batch_inference(sf_dir, n_classes)
    emb = T(sf_dir, "embeddings", ["vec_id", "label"])

    def _truth(b: pa.Table) -> pa.Table:
        return pa.table({
            "vid_r": b["vec_id"],
            "truth": pa.array(
                b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
                % n_classes, pa.int64()),
        })

    j = pred.join(emb.map_batches(_truth, batch_format="pyarrow"),
                  "inner", num_partitions=4,
                  on=("vec_id",), right_on=("vid_r",))
    cm = fast_groupby_agg(
        j, ["truth", "pred"], {"c": (None, "count")}).to_pandas()
    classes = list(range(n_classes))
    tp = {k: 0 for k in classes}
    pred_cnt = {k: 0 for k in classes}
    truth_cnt = {k: 0 for k in classes}
    for t, p, c in zip(cm["truth"], cm["pred"], cm["c"]):
        t, p, c = int(t), int(p), int(c)
        pred_cnt[p] += c
        truth_cnt[t] += c
        if t == p:
            tp[t] = c
    rows = []
    for k in classes:
        prec = tp[k] * 10**6 // pred_cnt[k] if pred_cnt[k] else 0
        rec = tp[k] * 10**6 // truth_cnt[k] if truth_cnt[k] else 0
        f1 = 2 * prec * rec // (prec + rec) if prec + rec else 0
        rows.append({
            "class": np.int64(k), "tp": np.int64(tp[k]),
            "fp": np.int64(pred_cnt[k] - tp[k]),
            "fn": np.int64(truth_cnt[k] - tp[k]),
            "prec_fp": np.int64(prec), "rec_fp": np.int64(rec),
            "f1_fp": np.int64(f1),
        })
    return pd.DataFrame(rows)


def q_window_range_sum(sf_dir):
    """Value-based RANGE window frame — for every order, the same
    customer's total order value within ±30 DAYS of it (the
    window-function class the ROWS-frame suite can't express: the
    frame is defined by the ORDER BY *value*, so it is insensitive to
    tie order and row position). Plan: ONE hash shuffle into
    splitmix64(custkey) % P partitions, then a fully VECTORIZED
    two-pointer over each partition: rows lexsorted by (ck, day),
    windows resolved by searchsorted on the composite key
    ck·SPAN + (day − dmin) with SPAN = day-range + 2·30 + 1, so a
    ±30-day probe can never cross into a neighboring customer's key
    range — P udf calls total, not one per customer (the map_groups
    original paid 15k pandas calls at sf0.1; this is ~5×).
    All integer cents; no float anywhere."""
    from ..functions.sketches import _splitmix64

    P = 64
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ok": b["o_orderkey"], "ck": b["o_custkey"],
            "part": pa.array(
                (_splitmix64(ck) % np.uint64(P)).astype(np.int64)),
            "d": pa.array(
                b["o_orderdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 86_400_000_000, pa.int64()),
            "v": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    def _range_sum(g: pd.DataFrame) -> pd.DataFrame:
        ck0 = g["ck"].to_numpy(np.int64)
        d0 = g["d"].to_numpy(np.int64)
        order = np.lexsort((d0, ck0))
        ck, d = ck0[order], d0[order]
        v = g["v"].to_numpy(np.int64)[order]
        ok = g["ok"].to_numpy(np.int64)[order]
        dmin = int(d.min())
        span = int(d.max()) - dmin + 61
        key = ck * span + (d - dmin)
        pre = np.concatenate([[0], np.cumsum(v)])
        lo = np.searchsorted(key, key - 30, side="left")
        hi = np.searchsorted(key, key + 30, side="right")
        return pd.DataFrame({
            "o_orderkey": ok,
            "range_sum": (pre[hi] - pre[lo]).astype(np.int64),
        })

    return orders.map_batches(_fp, batch_format="pyarrow") \
        .groupby("part").map_groups(_range_sum, batch_format="pandas")


ORACLES["confusion_matrix"] = """
    WITH e AS (
        SELECT vec_id, gs - 1 AS j,
               CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                    AS BIGINT) AS efp
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(gs)
    ),
    l AS (
        SELECT vec_id, c,
               CAST(sum(efp * (((j * 31 + c * 17) % 7) - 3))
                    AS BIGINT) AS logit_fp
        FROM e, unnest(generate_series(0, 2)) AS cc(c)
        GROUP BY vec_id, c
    ),
    r AS (
        SELECT vec_id, c, row_number() OVER (
            PARTITION BY vec_id ORDER BY logit_fp DESC, c) AS rn
        FROM l
    ),
    p AS (
        SELECT r.vec_id, CAST(r.c AS BIGINT) AS pred,
               CAST(emb.label % 3 AS BIGINT) AS truth
        FROM r JOIN embeddings emb ON emb.vec_id = r.vec_id
        WHERE rn = 1
    ),
    k AS (SELECT CAST(gs AS BIGINT) AS cls
          FROM unnest(generate_series(0, 2)) AS t(gs)),
    agg AS (
        SELECT cls,
               CAST(COALESCE((SELECT count(*) FROM p
                    WHERE truth = cls AND pred = cls), 0) AS BIGINT) AS tp,
               CAST(COALESCE((SELECT count(*) FROM p
                    WHERE pred = cls), 0) AS BIGINT) AS pc,
               CAST(COALESCE((SELECT count(*) FROM p
                    WHERE truth = cls), 0) AS BIGINT) AS tc
        FROM k
    )
    SELECT cls AS class, tp, pc - tp AS fp, tc - tp AS fn,
           CASE WHEN pc > 0 THEN tp * 1000000 // pc ELSE 0 END AS prec_fp,
           CASE WHEN tc > 0 THEN tp * 1000000 // tc ELSE 0 END AS rec_fp,
           CASE WHEN (CASE WHEN pc > 0 THEN tp * 1000000 // pc ELSE 0 END)
                     + (CASE WHEN tc > 0 THEN tp * 1000000 // tc ELSE 0 END)
                     > 0
                THEN 2 * (CASE WHEN pc > 0 THEN tp * 1000000 // pc
                          ELSE 0 END)
                       * (CASE WHEN tc > 0 THEN tp * 1000000 // tc
                          ELSE 0 END)
                     // ((CASE WHEN pc > 0 THEN tp * 1000000 // pc
                          ELSE 0 END)
                         + (CASE WHEN tc > 0 THEN tp * 1000000 // tc
                            ELSE 0 END))
                ELSE 0 END AS f1_fp
    FROM agg
"""

ORACLES["window_range_sum"] = """
    WITH m AS (
        SELECT o_orderkey,
               o_custkey AS ck,
               epoch_us(o_orderdate) // 86400000000 AS d,
               CAST(round(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    )
    SELECT o_orderkey,
           CAST(sum(v) OVER (PARTITION BY ck ORDER BY d
                RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)
                AS BIGINT) AS range_sum
    FROM m
"""


_HIER_DIVISORS = [10**i for i in range(9)]  # customer keys < 10^8 guard


def q_hierarchy_rollup(sf_dir):
    """Subtree aggregation over a hierarchy — every prefix node of the
    decimal-digit customer-key trie (parent(k) = k//10, root 0) gets
    its subtree customer count and revenue. The classic recursive
    rollup needs NO iteration here because ancestors are computable:
    each per-customer row flat-maps to its ≤9-row ancestor chain and
    ONE map-side-combined groupby folds the tree — the pattern for any
    materialized-path / fixed-arity hierarchy at 100 TB (vs. the
    join-per-level plans the iterative graph family uses when parents
    are data). All integer cents; the oracle mirrors the chain with a
    divisor table + DISTINCT (the engine's strictly-decreasing chain
    and the divisor set collapse to the same node set)."""
    orders = T(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({
            "ck": b["o_custkey"],
            "p": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    per_cust = fast_groupby_agg(
        orders.map_batches(_fp, batch_format="pyarrow"),
        ["ck"], {"rev": ("p", "sum")})

    def _ancestors(b: pa.Table) -> pa.Table:
        ck = b["ck"].to_numpy(zero_copy_only=False)
        if len(ck) and int(ck.max()) >= _HIER_DIVISORS[-1]:
            raise ValueError("hierarchy_rollup assumes custkey < 10^8")
        rev = b["rev"].to_numpy(zero_copy_only=False)
        nodes, revs = [], []
        for k, r in zip(ck, rev):
            k, r = int(k), int(r)
            while True:
                nodes.append(k)
                revs.append(r)
                if k == 0:
                    break
                k //= 10
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "rev": pa.array(revs, pa.int64()),
                         "one": pa.array(np.ones(len(nodes), np.int64))})

    return fast_groupby_agg(
        per_cust.map_batches(_ancestors, batch_format="pyarrow"),
        ["node"],
        {"n_customers": ("one", "sum"), "subtree_rev": ("rev", "sum")})


def q_table_checksum(sf_dir):
    """Order-invariant distributed table checksum — the replication /
    migration integrity primitive: every row canonicalizes to a pinned
    string, md5's leading 60 bits become an int64, and the table
    digest is (Σ mod 2⁶³, XOR, count) — all three mergeable map-side,
    so the exchange is three integers per block and the result is
    independent of row order, partitioning, and parallelism. The
    row-serialization contract (field order, '|' separator, cents,
    epoch days) is pinned in the oracle SQL string itself."""
    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority"])

    def _h(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        st = b["o_orderstatus"].to_pylist()
        p = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d = b["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000
        pr = b["o_orderpriority"].to_pylist()
        hs = np.fromiter(
            (int(hashlib.md5(
                f"{a}|{c}|{s}|{v}|{dd}|{q}".encode()).hexdigest()[:15], 16)
             for a, c, s, v, dd, q in zip(ok, ck, st, p, d, pr)),
            dtype=np.int64, count=len(ok))
        acc_sum = 0
        for h in hs:
            acc_sum = (acc_sum + int(h)) % (2**63)
        acc_xor = int(np.bitwise_xor.reduce(hs)) if len(hs) else 0
        return pa.table({
            "s": pa.array([acc_sum], pa.int64()),
            "x": pa.array([acc_xor], pa.int64()),
            "n": pa.array([len(hs)], pa.int64()),
        })

    parts = orders.map_batches(_h, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([{
        "checksum_sum": np.int64(int(parts["s"].astype(object).sum())
                                 % (2**63)),
        "checksum_xor": np.int64(np.bitwise_xor.reduce(
            parts["x"].to_numpy(np.int64)) if len(parts) else 0),
        "n_rows": np.int64(int(parts["n"].sum())),
    }])


ORACLES["hierarchy_rollup"] = """
    WITH pc AS (
        SELECT o_custkey AS ck,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
        FROM orders GROUP BY 1
    ),
    dv AS (SELECT CAST(pow(10, g) AS BIGINT) AS d
           FROM unnest(generate_series(0, 8)) AS t(g)),
    anc AS (SELECT DISTINCT ck, ck // d AS node, rev FROM pc, dv)
    SELECT node,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(rev AS BIGINT)) AS BIGINT) AS subtree_rev
    FROM anc GROUP BY node
"""

ORACLES["table_checksum"] = """
    WITH h AS (
        SELECT CAST(concat('0x', substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|' ||
                   CAST(o_custkey AS VARCHAR) || '|' ||
                   o_orderstatus || '|' ||
                   CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                        AS VARCHAR) || '|' ||
                   CAST(epoch_us(o_orderdate) // 86400000000
                        AS VARCHAR) || '|' ||
                   o_orderpriority), 1, 15)) AS BIGINT) AS v
        FROM orders
    )
    SELECT CAST(CAST(sum(v) AS HUGEINT)
                % 9223372036854775808 AS BIGINT) AS checksum_sum,
           CAST(bit_xor(v) AS BIGINT) AS checksum_xor,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM h
"""


def q_running_median(sf_dir):
    """Order-sensitive running (cumulative) median of daily revenue —
    the windowed-QUANTILE class (sum/rank windows are algebraic; a
    running median needs an order-statistics structure). Distributed
    part: the one day-histogram exchange; the walk is TIME-SPAN
    bounded on the driver with an insertion-sorted buffer (the
    two-heap equivalent), lower-median rank rule ceil(n/2) pinned by
    the oracle's windowed quantile_disc(0.5). All integer cents."""
    import bisect

    orders = T(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def _day(b: pa.Table) -> pa.Table:
        return pa.table({
            "d": pa.array(
                b["o_orderdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 86_400_000_000, pa.int64()),
            "v": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    vc = fast_groupby_agg(
        orders.map_batches(_day, batch_format="pyarrow"),
        ["d"], {"v": ("v", "sum")}).to_pandas().sort_values("d")
    buf: list[int] = []
    rows = []
    for d, v in zip(vc["d"].astype(int), vc["v"].astype(int)):
        bisect.insort(buf, v)
        rows.append({"d": np.int64(d), "v": np.int64(v),
                     "run_med": np.int64(buf[(len(buf) + 1) // 2 - 1])})
    return pd.DataFrame(rows)


_KNAPSACK_MAX_SOURCES = 20


def q_source_knapsack(sf_dir, budget_pct: int = 60):
    """Exact 0/1-knapsack source selection — choose the subset of
    corpus sources maximizing content value (docs containing 'the' —
    the stand-in for a quality score) under a character budget (60% of
    the corpus), the data-mixing decision a token-budgeted training
    run actually makes (greedy set_cover's optimal sibling). The
    distributed part is ONE per-source (value, weight) fold; the
    source domain is tiny by nature, so exhaustive 2^k enumeration on
    the driver IS the spec (vectorized numpy bit folds, guarded at 20
    sources ≈ 1M masks; beyond that a dp over quantized budget
    replaces it), and the oracle enumerates the same masks with bit
    arithmetic. Ties pinned: value DESC, weight ASC, mask ASC over
    lexicographically bit-indexed sources."""
    docs = T(sf_dir, "documents", ["source", "text", "n_chars"])

    def _vw(b: pa.Table) -> pa.Table:
        has = pc.match_substring(b["text"], "the")
        return pa.table({
            "source": b["source"],
            "val": pa.array(
                has.to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64()),
            "w": b["n_chars"],
        })

    sv = fast_groupby_agg(
        docs.map_batches(_vw, batch_format="pyarrow"),
        ["source"], {"val": ("val", "sum"), "w": ("w", "sum")}
    ).to_pandas().sort_values("source").reset_index(drop=True)
    k = len(sv)
    if k > _KNAPSACK_MAX_SOURCES:
        raise ValueError("source_knapsack enumerates 2^k; k too large")
    vals = [int(v) for v in sv["val"]]
    ws = [int(w) for w in sv["w"]]
    budget = sum(ws) * budget_pct // 100
    masks = np.arange(1 << k, dtype=np.int64)
    tv = np.zeros(1 << k, dtype=np.int64)
    tw = np.zeros(1 << k, dtype=np.int64)
    for i in range(k):
        bit = (masks >> i) & 1
        tv += bit * vals[i]
        tw += bit * ws[i]
    feas = tw <= budget
    order = np.lexsort((masks[feas], tw[feas], -tv[feas]))
    mask = int(masks[feas][order[0]])
    tv, tw = int(tv[feas][order[0]]), int(tw[feas][order[0]])
    return pd.DataFrame([{
        "source": s, "chosen": np.int64((mask >> i) & 1),
        "val": np.int64(vals[i]), "w": np.int64(ws[i]),
        "total_val": np.int64(tv), "total_w": np.int64(tw),
    } for i, s in enumerate(sv["source"])])


ORACLES["running_median"] = """
    WITH m AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
    )
    SELECT d, v,
           CAST(quantile_disc(v, 0.5) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS run_med
    FROM m
"""

ORACLES["source_knapsack"] = """
    WITH sv AS (
        SELECT source,
               CAST(sum(CASE WHEN contains(text, 'the')
                        THEN 1 ELSE 0 END) AS BIGINT) AS val,
               CAST(sum(n_chars) AS BIGINT) AS w,
               row_number() OVER (ORDER BY source) - 1 AS i
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(w) * 60 // 100 AS BIGINT) AS budget,
                   count(*) AS k FROM sv),
    masks AS (
        SELECT CAST(gs AS BIGINT) AS mask
        FROM tot, unnest(generate_series(
             0, CAST(pow(2, k) AS BIGINT) - 1)) AS t(gs)
    ),
    scored AS (
        SELECT m.mask,
               CAST(COALESCE(sum(CASE WHEN (m.mask >> s.i) & 1 = 1
                    THEN s.val END), 0) AS BIGINT) AS tv,
               CAST(COALESCE(sum(CASE WHEN (m.mask >> s.i) & 1 = 1
                    THEN s.w END), 0) AS BIGINT) AS tw
        FROM masks m, sv s GROUP BY m.mask
    ),
    best AS (
        SELECT mask, tv, tw FROM scored, tot WHERE tw <= budget
        ORDER BY tv DESC, tw ASC, mask ASC LIMIT 1
    )
    SELECT s.source,
           CAST((b.mask >> s.i) & 1 AS BIGINT) AS chosen,
           s.val, s.w,
           b.tv AS total_val, b.tw AS total_w
    FROM sv s, best b
"""


def q_calibration_bins(sf_dir, n_bins: int = 10):
    """Model-calibration reliability table — confidence-decile vs
    accuracy, the diagram every scorer ships with: q_batch_inference
    logits join ground truth (label % 3), rows bucket by EQUAL-WIDTH
    bins over the logit range (min/max from one aggregate — rank-free,
    so no sort), and each bin reports count + correct + integer ×10⁶
    accuracy. Everything is integer arithmetic over exact logits; bin
    index ⌊(logit−lo)·B/(hi−lo+1)⌋ is one integer cross-multiplication
    mirrored in SQL. The exchange is the B-row bin table."""
    from .queries import q_batch_inference

    pred = q_batch_inference(sf_dir).materialize()
    from ray.data.aggregate import Max, Min

    dom = pred.aggregate(Min("best_logit_fp"), Max("best_logit_fp"))
    lo, hi = int(dom["min(best_logit_fp)"]), int(dom["max(best_logit_fp)"])
    span = hi - lo + 1
    emb = T(sf_dir, "embeddings", ["vec_id", "label"])

    def _truth(b: pa.Table) -> pa.Table:
        return pa.table({
            "vid_r": b["vec_id"],
            "truth": pa.array(
                b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
                % 3, pa.int64()),
        })

    j = pred.join(emb.map_batches(_truth, batch_format="pyarrow"),
                  "inner", num_partitions=4,
                  on=("vec_id",), right_on=("vid_r",))

    def _bin(b: pa.Table) -> pa.Table:
        lg = b["best_logit_fp"].to_numpy(zero_copy_only=False)
        ok = (b["pred"].to_numpy(zero_copy_only=False)
              == b["truth"].to_numpy(zero_copy_only=False))
        return pa.table({
            "bin": pa.array((lg - lo) * n_bins // span, pa.int64()),
            "ok": pa.array(ok.astype(np.int64), pa.int64()),
        })

    g = fast_groupby_agg(
        j.map_batches(_bin, batch_format="pyarrow"),
        ["bin"], {"n": (None, "count"), "correct": ("ok", "sum")}
    ).to_pandas().sort_values("bin").reset_index(drop=True)
    return pd.DataFrame({
        "bin": g["bin"].astype(np.int64),
        "n": g["n"].astype(np.int64),
        "correct": g["correct"].astype(np.int64),
        "acc_fp": (g["correct"].astype(np.int64) * 10**6
                   // g["n"].astype(np.int64)),
    })


def q_seasonal_strength(sf_dir):
    """Weekday-seasonality strength of daily revenue — F_seasonal =
    1 − Var(residual)/Var(series), the STL decomposition's headline
    statistic with the seasonal component taken as weekday means.
    Every moment is an EXACT integer: the total deviation mass
    Vt = Σ(n·x_t − S)² and per-weekday residual masses
    A_w = Σ_{t∈w}(n_w·x_t − S_w)² come straight from the one
    day-histogram exchange (HUGEINT/DECIMAL(38,0) in the oracle,
    Python ints here); each A_w is ×10⁹-quantized BEFORE the 7-term
    cross-weekday sum (the anova_f per-term policy — the sum is then
    association-order-free), and the finale is one mirrored float
    tree. The exchange is the TIME-SPAN-sized day table."""
    orders = T(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def _day(b: pa.Table) -> pa.Table:
        return pa.table({
            "d": pa.array(
                b["o_orderdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 86_400_000_000, pa.int64()),
            "v": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64), pa.int64()),
        })

    vc = fast_groupby_agg(
        orders.map_batches(_day, batch_format="pyarrow"),
        ["d"], {"v": ("v", "sum")}).to_pandas()
    d = [int(x) for x in vc["d"]]
    x = [int(v) for v in vc["v"]]
    n = len(x)
    s = sum(x)
    vt = sum((n * xi - s) ** 2 for xi in x)
    wsum = {w: 0 for w in range(7)}
    wcnt = {w: 0 for w in range(7)}
    for di, xi in zip(d, x):
        wsum[di % 7] += xi
        wcnt[di % 7] += 1
    aw = {w: 0 for w in range(7) if wcnt[w]}
    for di, xi in zip(d, x):
        w = di % 7
        aw[w] += (wcnt[w] * xi - wsum[w]) ** 2
    # per-weekday DIMENSIONLESS ratio term, ×1e9-quantized BEFORE the
    # 7-term sum (order-free; each ≲ 1e9 so int64-safe at any sf):
    # Var(res)/Var(tot) = Σ_w A_w·n²/(n_w²·Vt); strength stays integer
    sres = sum(int(_round_half_away(np.array(
        [float(a) * (n * n) / (wcnt[w] * wcnt[w]) / float(vt)
         * 1_000_000_000.0]))[0])
        for w, a in aw.items())
    return pd.DataFrame([{
        "n_days": np.int64(n),
        "strength_fp": np.int64(1_000_000_000 - sres),
    }])


ORACLES["calibration_bins"] = """
    WITH e AS (
        SELECT vec_id, gs - 1 AS j,
               CAST(round(CAST(embedding[gs] AS DOUBLE) * 1000000)
                    AS BIGINT) AS efp
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS t(gs)
    ),
    l AS (
        SELECT vec_id, c,
               CAST(sum(efp * (((j * 31 + c * 17) % 7) - 3))
                    AS BIGINT) AS logit_fp
        FROM e, unnest(generate_series(0, 2)) AS cc(c)
        GROUP BY vec_id, c
    ),
    r AS (
        SELECT vec_id, c, logit_fp, row_number() OVER (
            PARTITION BY vec_id ORDER BY logit_fp DESC, c) AS rn
        FROM l
    ),
    p AS (
        SELECT r.vec_id, CAST(r.c AS BIGINT) AS pred,
               r.logit_fp AS lg,
               CAST(emb.label % 3 AS BIGINT) AS truth
        FROM r JOIN embeddings emb ON emb.vec_id = r.vec_id
        WHERE rn = 1
    ),
    dom AS (SELECT min(lg) AS lo, max(lg) - min(lg) + 1 AS span FROM p)
    SELECT (p.lg - d.lo) * 10 // d.span AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END)
                AS BIGINT) AS correct,
           CAST(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS acc_fp
    FROM p, dom d
    GROUP BY 1
"""

ORACLES["seasonal_strength"] = """
    WITH m AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS s FROM m),
    vt AS (
        SELECT CAST(sum(CAST(
                   (CAST(t.n AS HUGEINT) * m.v - t.s)
                   * (CAST(t.n AS HUGEINT) * m.v - t.s)
                   AS DECIMAL(38, 0))) AS HUGEINT) AS vtot
        FROM m, tot t
    ),
    wk AS (
        SELECT d % 7 AS w, count(*) AS nw,
               CAST(sum(v) AS BIGINT) AS sw
        FROM m GROUP BY 1
    ),
    aw AS (
        SELECT w.w, w.nw,
               CAST(sum(CAST(
                   (CAST(w.nw AS HUGEINT) * m.v - w.sw)
                   * (CAST(w.nw AS HUGEINT) * m.v - w.sw)
                   AS DECIMAL(38, 0))) AS HUGEINT) AS a
        FROM m JOIN wk w ON m.d % 7 = w.w GROUP BY w.w, w.nw
    ),
    tq AS (
        SELECT CAST(sum(CAST(round(CAST(a AS DOUBLE) * (t.n * t.n)
                   / (nw * nw) / CAST(v.vtot AS DOUBLE)
                   * 1000000000.0) AS BIGINT)) AS BIGINT) AS sres
        FROM aw, tot t, vt v
    )
    SELECT CAST(t.n AS BIGINT) AS n_days,
           CAST(1000000000 - q.sres AS BIGINT) AS strength_fp
    FROM tq q, tot t
"""


def q_reset_cumsum(sf_dir):
    """Cumulative sum with RESET markers — per user, event values
    accumulate in order and restart at every 'signup' event (the
    odometer / session-scoped-accumulator scan; a running total that
    is NOT a plain window because the frame boundary is data-driven).
    Plan: one hash shuffle by user, per-group vectorized two-level
    cumsum (global cumsum minus the cumsum at the last reset —
    no Python loop); the oracle expresses the same thing with the
    count-of-resets-so-far window-partition trick. Values are ×10⁶
    integer fixed point; ties ordered by (ts, event_id) — a total
    order, pinned on both sides."""
    ev = T(sf_dir, "events", ["user_id", "event_type", "ts", "event_id",
                              "value"])

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        v = _round_half_away(g["value"].to_numpy() * 1e6).astype(np.int64)
        reset = (g["event_type"].to_numpy() == "signup")
        cum = np.cumsum(v)
        # cumsum value just BEFORE the most recent reset row (the reset
        # row itself starts the new run with its own value); the last
        # reset is tracked by POSITION so negative values are safe
        n = len(v)
        pos = np.where(reset, np.arange(n), -1)
        last_pos = np.maximum.accumulate(pos)
        base_at_reset = cum - v
        base = np.where(last_pos >= 0,
                        base_at_reset[np.maximum(last_pos, 0)], 0)
        run_sum = cum - base
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "run_sum": run_sum.astype(np.int64),
        })

    return ev.groupby("user_id").map_groups(_scan, batch_format="pandas")


ORACLES["reset_cumsum"] = """
    WITH m AS (
        SELECT user_id, event_id, ts,
               CAST(round(value * 1000000) AS BIGINT) AS v,
               CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS rs
        FROM events
    ),
    g AS (
        SELECT *, CAST(sum(rs) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS grp
        FROM m
    )
    SELECT event_id,
           CAST(sum(v) OVER (PARTITION BY user_id, grp
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS run_sum
    FROM g
"""


def q_ttl_dedup(sf_dir, ttl_days: int = 7):
    """Streaming TTL dedup: keep an event iff it is the first for its
    (user, event_type) key, OR its ts is at least TTL after the last
    KEPT event of that key — the suppression CHAIN of a streaming dedup
    operator with a time-to-live cache (an emitted event arms the
    suppressor for TTL; suppressed events do NOT re-arm it). This is
    data-dependent like reset_cumsum but worse: the frame boundary
    depends on prior *decisions*, so no window function expresses it.
    Plan: ONE hash shuffle by user_id, then a per-key searchsorted walk
    that jumps kept-row → kept-row in O(kept · log n) without touching
    suppressed rows. The oracle states the identical chain as a
    recursive CTE whose step is a LATERAL next-kept probe (first row
    by (ts, event_id) with ts ≥ kept.ts + TTL). Ties are total-ordered
    by (ts, event_id) on both sides; the ≥-at-boundary rule is pinned
    by side='left' ↔ `ts >= k.ts + INTERVAL`."""
    ev = T(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    ttl = np.timedelta64(ttl_days * 86_400 * 10**9, "ns")

    def _walk(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for et, sub in g.groupby("event_type", sort=False):
            sub = sub.sort_values(["ts", "event_id"], kind="mergesort")
            ts = sub["ts"].to_numpy(dtype="datetime64[ns]")
            ids = sub["event_id"].to_numpy()
            keep, pos, n = [], 0, len(ts)
            while pos < n:
                keep.append(pos)
                pos = int(np.searchsorted(ts, ts[pos] + ttl, side="left"))
            frames.append(pd.DataFrame({
                "event_type": et, "event_id": ids[keep]}))
        out = pd.concat(frames, ignore_index=True)
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return ev.groupby("user_id").map_groups(_walk, batch_format="pandas")


ORACLES["ttl_dedup"] = """
    WITH RECURSIVE k AS (
        SELECT user_id, event_type, ts, event_id
        FROM (SELECT user_id, event_type, ts, event_id,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1
        UNION ALL
        SELECT n.user_id, n.event_type, n.ts, n.event_id
        FROM k, LATERAL (
            SELECT user_id, event_type, ts, event_id FROM events e
            WHERE e.user_id = k.user_id AND e.event_type = k.event_type
              AND e.ts >= k.ts + INTERVAL 7 DAY
            ORDER BY ts, event_id LIMIT 1
        ) n
    )
    SELECT user_id, event_type, event_id FROM k
"""


# exp2(-r/H) sub-period decay factors: computed ONCE here (numpy libm)
# and INJECTED into the oracle SQL verbatim at 17 significant digits,
# so no transcendental is ever re-evaluated by the second engine — the
# hardened form of grouped_entropy's quantize-before-sum policy (the
# 1-ULP libm-divergence hazard flagged in round-2 ADVICE cannot occur
# when both sides read the same literal).
_DECAY_HALF_LIFE_DAYS = 30
_DECAY_LUT = np.exp2(-(np.arange(_DECAY_HALF_LIFE_DAYS)
                       / float(_DECAY_HALF_LIFE_DAYS)))


def q_decayed_counts(sf_dir):
    """Exponentially time-decayed event counts per type (half-life 30
    days, as-of the global max event date) — the freshness-weighted
    popularity statistic of every feed/trending system. Exactness:
    2^(-age/H) factors as ldexp(lut[age % H], -(age // H)); ldexp is
    EXACT power-of-two scaling (mirrored in SQL as division by
    1 << q, also exact), and the H lut constants are shared literals —
    so every per-event term is bit-identical on both sides before ×1e9
    quantization; the int64 sum is association-order-free. Plan: one
    scalar max (distributed), then a vectorized map + map-side-combined
    groupby over the ≤5-type domain. q is clamped at 62 on both sides
    (the term quantizes to 0 long before that at any data span)."""
    ev = T(sf_dir, "events", ["event_type", "ts"])
    gmax = np.datetime64(ev.max("ts"), "ns").astype("datetime64[D]")
    H = _DECAY_HALF_LIFE_DAYS

    def _terms(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        age = (gmax - ts).astype(np.int64)
        q = np.minimum(age // H, 62)
        term = np.ldexp(_DECAY_LUT[age % H], -q)
        return pa.table({
            "event_type": b["event_type"],
            "fp": pa.array(_round_half_away(term * 1e9).astype(np.int64)),
        })

    return fast_groupby_agg(
        ev.map_batches(_terms, batch_format="pyarrow"),
        ["event_type"], {"decay_fp": ("fp", "sum"), "n": (None, "count")})


def _decayed_counts_oracle() -> str:
    lut_rows = ", ".join(
        f"({r}, {v:.17g})" for r, v in enumerate(_DECAY_LUT))
    return f"""
    WITH lut(r, v) AS (VALUES {lut_rows}),
    m AS (
        SELECT event_type,
               date_diff('day', CAST(ts AS DATE),
                         (SELECT max(CAST(ts AS DATE)) FROM events)) AS age
        FROM events
    )
    SELECT m.event_type,
           CAST(sum(CAST(round(
                lut.v / CAST(1::BIGINT << LEAST(m.age // {_DECAY_HALF_LIFE_DAYS}, 62)
                             AS DOUBLE)
                * 1000000000) AS BIGINT)) AS BIGINT) AS decay_fp,
           count(*) AS n
    FROM m JOIN lut ON lut.r = m.age % {_DECAY_HALF_LIFE_DAYS}
    GROUP BY m.event_type
    """


ORACLES["decayed_counts"] = _decayed_counts_oracle()


def q_temperature_mix(sf_dir):
    """Temperature-scaled source mixing weights, w_s ∝ n_s^(1/2) — the
    multilingual/multi-source rebalancing rule (upweight small sources,
    temperature T=2) from multilingual-LM data work. Exactness: sqrt is
    CORRECTLY ROUNDED under IEEE 754 (unlike pow/exp), so numpy and
    DuckDB agree bit-for-bit on n^0.5; weights quantize ×1e9 to int64,
    and the ppm share is an exact integer cross floor-division done in
    Python ints (no overflow at any corpus size) ↔ HUGEINT/
    DECIMAL(38,0) in SQL. Plan: map-side-combined count per source
    (source domain ≤ tens of rows at any scale), driver finale over
    that domain-bounded frame."""
    counts = fast_groupby_agg(
        T(sf_dir, "documents", ["source"]),
        ["source"], {"n_docs": (None, "count")})
    pdf = counts.to_pandas()  # source-domain-sized
    n = pdf["n_docs"].to_numpy().astype(np.float64)
    w = _round_half_away(np.sqrt(n) * 1e9).astype(np.int64)
    tot = int(w.sum())
    return pa.table({
        "source": pa.array(pdf["source"].astype(str)),
        "n_docs": pa.array(pdf["n_docs"].to_numpy().astype(np.int64)),
        "w_fp": pa.array(w),
        "share_ppm": pa.array(
            np.array([int(x) * 1_000_000 // tot for x in w],
                     dtype=np.int64)),
    })


ORACLES["temperature_mix"] = """
    WITH c AS (SELECT source, count(*) AS n_docs FROM documents
               GROUP BY source),
    w AS (SELECT source, n_docs,
                 CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000000)
                      AS BIGINT) AS w_fp
          FROM c)
    SELECT source, n_docs, w_fp,
           CAST(CAST(w_fp AS HUGEINT) * 1000000
                // CAST(sum(CAST(w_fp AS DECIMAL(38,0))) OVER ()
                        AS HUGEINT) AS BIGINT) AS share_ppm
    FROM w
"""


def q_salted_join(sf_dir, n_salts: int = 8):
    """Skew-mitigating SALTED shuffle join: revenue per market segment
    via orders ⋈ customer where one hot customer key would otherwise
    pin an entire shuffle partition to one task. The probe side
    (orders) gets salt = splitmix64(o_orderkey) % S — a hot key's rows
    spread across S partitions — and the build side (customer) is
    replicated S× with salts 0..S−1 (bounded: S · |dim| rows, and the
    dim side is the SMALL side by construction). Joining on
    (key, salt) is then EXACTLY the plain key join, pinned here by the
    plain-SQL oracle and by a salted-vs-unsalted equality test. This is
    the standard hot-key fix for joins that carry row-level payloads,
    where fastagg's map-side pre-aggregation (the other skew weapon)
    does not apply. Revenue is ×100 integer cents end to end."""
    from ..functions.sketches import _splitmix64

    def _salt_orders(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "o_custkey": b["o_custkey"],
            "cents": pa.array(_round_half_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)),
            "salt": pa.array(
                (_splitmix64(k) % np.uint64(n_salts)).astype(np.int64)),
        })

    def _replicate_cust(b: pa.Table) -> pa.Table:
        n = b.num_rows
        idx = np.repeat(np.arange(n), n_salts)
        return pa.table({
            "c_custkey": b["c_custkey"].take(pa.array(idx)),
            "c_mktsegment": b["c_mktsegment"].take(pa.array(idx)),
            "salt": pa.array(np.tile(np.arange(n_salts, dtype=np.int64), n)),
        })

    orders = T(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_totalprice"],
               target_block_mb=32, min_blocks=8).map_batches(
        _salt_orders, batch_format="pyarrow")
    cust = T(sf_dir, "customer", ["c_custkey", "c_mktsegment"],
             target_block_mb=32, min_blocks=4).map_batches(
        _replicate_cust, batch_format="pyarrow")
    j = orders.join(cust, "inner", num_partitions=JOIN_PARTS,
                    on=("o_custkey", "salt"),
                    right_on=("c_custkey", "salt"))
    return fast_groupby_agg(j, ["c_mktsegment"], {
        "revenue_c": ("cents", "sum"),
        "n_orders": (None, "count"),
    })


ORACLES["salted_join"] = """
    SELECT c_mktsegment,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_c,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


def q_partition_prune_read(sf_dir):
    """Path-level partition pruning: events written ONCE as
    hive-partitioned Parquet (one directory per event_type — the
    resumable layout), then a reader that needs only two types reads
    ONLY those two partition DIRECTORIES — no other partition's files
    are listed, opened, or filtered (directory pruning is a stronger
    guarantee than row-group zone-map pruning, which still lists every
    file: see q_zone_map_pruning for that tier). The in-query audit
    asserts every input file of the pruned read lives under the two
    selected dirs; the oracle recomputes the per-type monthly counts
    from the source table, value-checking the sink → pruned-read →
    aggregate path end to end."""
    import shutil

    import ray.data as rd

    root = f"/tmp/fcray_prune_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    try:
        # etype duplicates the partition column INSIDE the files: explicit
        # file-path reads (below) skip hive-partition inference, and a
        # real table layout keeps the partition key queryable either way
        T(sf_dir, "events", ["event_id", "event_type", "ts"]).map_batches(
            lambda b: pa.table({
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "etype": b["event_type"],
                "month": pc.strftime(b["ts"], format="%Y-%m"),
            }),
            batch_format="pyarrow",
        ).write_parquet(root, partition_cols=["event_type"])

        want = ["click", "purchase"]
        # ray 2.49 read_parquet expands ONE root dir but not a LIST of
        # dirs — list the partition files explicitly (this is also what
        # a manifest-driven reader would do)
        paths = sorted(
            f"{root}/event_type={t}/{f}" for t in want
            if os.path.isdir(f"{root}/event_type={t}")
            for f in os.listdir(f"{root}/event_type={t}")
            if f.endswith(".parquet"))
        back = rd.read_parquet(paths)
        files = back.input_files()
        assert files and all(
            any(f"/event_type={t}/" in f or f.rsplit("/", 2)[-2] ==
                f"event_type={t}" for t in want) for f in files), \
            f"pruned read touched a foreign partition: {files[:3]}"
        got = fast_groupby_agg(back, ["etype", "month"],
                               {"n": (None, "count")})
        return got.map_batches(
            lambda b: pa.table({
                "event_type": pc.cast(b["etype"], pa.string()),
                "month": pc.cast(b["month"], pa.string()),
                "n": b["n"],
            }),
            batch_format="pyarrow",
        ).to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLES["partition_prune_read"] = """
    SELECT event_type, strftime(ts, '%Y-%m') AS month, count(*) AS n
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type, month
"""


# Poisson(1) inverse-CDF thresholds at 8-bit resolution:
# floor(256 · P[X ≤ k]) for k = 0..4 — a row's bootstrap weight in
# replicate b is the count of thresholds ≤ its b-th md5 digest byte.
# Shared integer literals, so engine and oracle CANNOT diverge (and the
# transcendental e^-1 is evaluated exactly once, at import, per the
# decayed_counts policy).
_POIS1_TH = [int(math.floor(256 * sum(math.exp(-1) / math.factorial(i)
                                      for i in range(k + 1))))
             for k in range(5)]
_BOOTSTRAP_B = 16


def q_bootstrap_ci(sf_dir):
    """Poisson bootstrap of the mean order price — THE resampling
    technique for data too large to multinomial-resample (each row
    contributes an independent Poisson(1) weight per replicate, so a
    replicate needs one streaming pass, no global coordination; see
    Chamandy et al., "Estimating uncertainty for massive data streams").
    Deterministic: replicate b's weight is the inverse-CDF bucket of
    the b-th BYTE of md5(o_orderkey) — one digest per row serves all
    16 replicates, weights are small ints, and every aggregate is
    integer (Σw, Σw·cents; the replicate mean is an exact ×1e6 integer
    floor division). Plan: per-batch 16-row partials (b, Σw, Σw·cents)
    → map-side-combined groupby → 16-row driver finale. The replicate
    means' spread IS the sampling-uncertainty estimate; min/max/etc.
    are left to the reader since all 16 means are returned."""
    th = np.asarray(_POIS1_TH, dtype=np.uint8)
    B = _BOOTSTRAP_B

    def _partials(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].to_pylist()
        cents = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dig = b"".join(hashlib.md5(str(k).encode()).digest() for k in keys)
        v = np.frombuffer(dig, dtype=np.uint8).reshape(len(keys), 16)
        reps, n_effs, wsums = [], [], []
        for rb in range(B):
            w = np.searchsorted(th, v[:, rb], side="right").astype(np.int64)
            reps.append(rb)
            n_effs.append(int(w.sum()))
            wsums.append(int((w * cents).sum()))
        return pa.table({
            "replicate": pa.array(reps, pa.int64()),
            "n_eff": pa.array(n_effs, pa.int64()),
            "wsum": pa.array(wsums, pa.int64()),
        })

    agg = fast_groupby_agg(
        T(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
            _partials, batch_format="pyarrow"),
        ["replicate"], {"n_eff": ("n_eff", "sum"), "wsum": ("wsum", "sum")})
    pdf = agg.to_pandas()  # B rows
    mean_fp = [int(w) * 1_000_000 // max(int(n), 1)
               for w, n in zip(pdf["wsum"], pdf["n_eff"])]
    return pa.table({
        "replicate": pa.array(pdf["replicate"].to_numpy().astype(np.int64)),
        "n_eff": pa.array(pdf["n_eff"].to_numpy().astype(np.int64)),
        "wsum": pa.array(pdf["wsum"].to_numpy().astype(np.int64)),
        "mean_fp": pa.array(np.array(mean_fp, dtype=np.int64)),
    })


def _bootstrap_ci_oracle() -> str:
    w_cases = "\n            + ".join(
        f"CASE WHEN v >= {t} THEN 1 ELSE 0 END" for t in _POIS1_TH)
    return f"""
    WITH m AS (
        SELECT md5(CAST(o_orderkey AS VARCHAR)) AS h,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    r AS (SELECT unnest(generate_series(0, {_BOOTSTRAP_B - 1})) AS b),
    x AS (
        SELECT r.b,
               CAST(('0x' || substr(m.h, 2 * r.b + 1, 2)) AS INTEGER) AS v,
               m.cents
        FROM m CROSS JOIN r
    ),
    w AS (
        SELECT b, cents,
               ({w_cases}) AS wt
        FROM x
    ),
    a AS (
        SELECT b AS replicate,
               CAST(sum(wt) AS BIGINT) AS n_eff,
               CAST(sum(CAST(wt AS HUGEINT) * cents) AS DECIMAL(38,0)) AS ws
        FROM w GROUP BY b
    )
    SELECT replicate, n_eff, CAST(ws AS BIGINT) AS wsum,
           CAST(CAST(ws AS HUGEINT) * 1000000
                // GREATEST(CAST(n_eff AS HUGEINT), 1) AS BIGINT) AS mean_fp
    FROM a
    """


ORACLES["bootstrap_ci"] = _bootstrap_ci_oracle()


def q_t_closeness(sf_dir, t_fp: int = 200_000):
    """t-closeness audit — the third leg of the privacy-governance trio
    (k_anonymity: group size; l_diversity: distinct sensitive values;
    here: the DISTRIBUTION of the sensitive attribute inside each
    quasi-identifier group must stay within distance t of the global
    one, or the group leaks the attribute by association). Sensitive =
    o_orderstatus (3-value domain), QI = priority × order month (the
    l_diversity key). Distance = total variation, computed EXACTLY in
    integers: tvd = Σ_s |n_gs·N − N_s·n_g| / (2·n_g·N), emitted ×10⁶ by
    one floor division (every |·| term is a product of counts — no
    floats anywhere). Plan: the kendall_tau tiny-domain contingency
    fold — each batch emits per-QI one-hot partial sums, ONE map-side-
    combined groupby (QI-domain-sized exchange), a 3-integer global
    fold broadcast back as Python scalars, and a vectorized finale.
    Products are ≤ max_group·N; at true 100-TB counts route them
    through Python ints / DECIMAL(38) like hhi_concentration — the SQL
    side already does (count() sums are HUGEINT)."""
    ds = T(sf_dir, "orders",
           ["o_orderpriority", "o_orderdate", "o_orderstatus"])

    def _fold(b: pa.Table) -> pa.Table:
        s = b["o_orderstatus"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "omonth": pa.array(_yyyymm_from_ns(_ts_ns(b["o_orderdate"])),
                               pa.int64()),
            "f": pa.array((s == "F").astype(np.int64)),
            "o": pa.array((s == "O").astype(np.int64)),
            "p": pa.array((s == "P").astype(np.int64)),
        })

    g = fast_groupby_agg(
        ds.map_batches(_fold, batch_format="pyarrow"),
        ["o_orderpriority", "omonth"],
        {"nf": ("f", "sum"), "no": ("o", "sum"), "np": ("p", "sum"),
         "n_rows": (None, "count")}).to_pandas()
    # global sensitive-value counts: 3 integers (domain-sized, not
    # data-sized — the one driver-side fold this audit needs)
    tf, to, tp = (int(g["nf"].sum()), int(g["no"].sum()),
                  int(g["np"].sum()))
    tn = tf + to + tp
    nf = g["nf"].to_numpy(np.int64)
    no = g["no"].to_numpy(np.int64)
    npp = g["np"].to_numpy(np.int64)
    ng = g["n_rows"].to_numpy(np.int64)
    raw = (np.abs(nf * tn - tf * ng) + np.abs(no * tn - to * ng)
           + np.abs(npp * tn - tp * ng))
    tvd = 1_000_000 * raw // (2 * ng * tn)
    return pd.DataFrame({
        "o_orderpriority": g["o_orderpriority"],
        "omonth": g["omonth"].astype(np.int64),
        "n_rows": ng,
        "tvd_fp": tvd,
        "breach": tvd > t_fp,
    })
