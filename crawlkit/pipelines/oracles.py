"""DuckDB oracle SQL for every SQL-expressible queries() entry.

Column names and value semantics match the Ray implementations exactly
(see ``relational.py`` — money as FLOOR(x*100) integer cents so that
distributed summation order cannot perturb the driver's value-hash).

Float-emitting oracles (``text_score``) mirror the engine's IEEE-754
op ORDER exactly (same left-associated double arithmetic, LEAST/
GREATEST for np.clip) so even double-valued columns hash-match bit for
bit; the stopword list literals are generated from the same
``text._LANG_STOPWORDS`` source the engine uses.
"""

from .text import _LANG_STOPWORDS


def _stoplist(lang: str) -> str:
    return "[" + ", ".join("'" + w + "'" for w in sorted(_LANG_STOPWORDS[lang])) + "]"


ORACLE_SQL: dict[str, str] = {
    # NOTE: DuckDB SUM(BIGINT) yields HUGEINT which pandas renders as
    # float64 while the engine emits int64 — every aggregate SUM below is
    # wrapped CAST(SUM(...) AS BIGINT) so dtypes match the Ray side.
    "g1_group_merge": """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events GROUP BY event_type
    """,
    "g2_running_max": """
        SELECT user_id, MAX(CAST(FLOOR(value * 100) AS BIGINT)) AS max_cents
        FROM events GROUP BY user_id
    """,
    "d1_distinct": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    "dedup_exact_first": """
        SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
    """,
    "f1_filter": """
        SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' AND value > 50.0
    """,
    "f4_permissive_cast": """
        SELECT doc_id,
               CAST(NULLIF(regexp_replace(source, '[^0-9]+', '', 'g'), '') AS BIGINT) AS src_num
        FROM documents
        WHERE NULLIF(regexp_replace(source, '[^0-9]+', '', 'g'), '') IS NOT NULL
    """,
    "f_above_avg": """
        SELECT l_orderkey, l_linenumber,
               CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
        WHERE CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
              * (SELECT COUNT(*) FROM lineitem)
              > (SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 FROM lineitem)
    """,
    "m2_extract_number": """
        SELECT doc_id,
               CAST(NULLIF(regexp_replace(source, '[^0-9]+', '', 'g'), '') AS BIGINT) AS num
        FROM documents
    """,
    "m3_take_before": """
        SELECT doc_id,
               CASE WHEN strpos(text, 'table') > 0
                    THEN substr(text, 1, strpos(text, 'table') - 1)
                    ELSE text END AS prefix
        FROM documents
    """,
    "m6_range_expand": """
        SELECT l_orderkey, UNNEST(range(1, CAST(m AS BIGINT))) AS page
        FROM (SELECT l_orderkey, MAX(l_linenumber) AS m
              FROM lineitem GROUP BY l_orderkey) t
    """,
    "m13_json_extract": """
        SELECT event_id, CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
        FROM events
    """,
    "o1_sort_topk": """
        SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events ORDER BY cents DESC, event_id LIMIT 100
    """,
    "j_broadcast_join": """
        SELECT r_name, COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "j_hash_join": """
        SELECT o_orderkey, o_orderpriority, revenue_cents
        FROM (SELECT l_orderkey,
                     CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
              FROM lineitem GROUP BY l_orderkey) r
        JOIN orders ON l_orderkey = o_orderkey
        ORDER BY revenue_cents DESC, o_orderkey LIMIT 10
    """,
    "j_shuffle_join": """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(revenue_cents) AS BIGINT) AS sum_rev_cents
        FROM (SELECT l_orderkey,
                     CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
              FROM lineitem GROUP BY l_orderkey) r
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    "j_asof": """
        SELECT e1.event_id, e1.user_id, e1.ts, e2.ts AS prior_ts
        FROM events e1
        ASOF LEFT JOIN events e2
          ON e1.user_id = e2.user_id AND e2.ts < e1.ts
    """,
    "w_tumbling": """
        SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events GROUP BY event_type, hour
    """,
    "q1_pricing": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "u_union": """
        SELECT event_id, event_type FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, event_type FROM events WHERE event_type = 'error'
    """,
    "s_except": """
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'click'
          AND user_id NOT IN (SELECT user_id FROM events
                              WHERE event_type = 'purchase' AND value > 90)
    """,
    "s_intersect": """
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'click'
          AND user_id IN (SELECT user_id FROM events
                          WHERE event_type = 'purchase' AND value > 90)
    """,
    "sample_deterministic": """
        SELECT event_id, event_type FROM events
        WHERE (event_id * 2654435761) % 100 < 10
    """,
    "w_sliding": """
        SELECT event_type, u.win AS win, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM (SELECT event_type, value, epoch_us(ts) // 1800000000 AS h FROM events) t,
             UNNEST([t.h, t.h - 1]) AS u(win)
        GROUP BY event_type, u.win
    """,
    "w_session": """
        WITH s AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), t AS (
            SELECT user_id,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM s
        )
        SELECT user_id, session_idx, COUNT(*) AS n_events
        FROM t GROUP BY user_id, session_idx
    """,
    "j_interval_overlap": """
        WITH s AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), t AS (
            SELECT user_id, epoch_us(ts) AS us,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM s
        ), sess AS (
            SELECT user_id, session_idx,
                   MIN(us) // 3600000000 AS h1, MAX(us) // 3600000000 AS h2
            FROM t GROUP BY user_id, session_idx
        )
        SELECT user_id, session_idx, CAST(u.h AS BIGINT) AS promo_hour
        FROM sess, UNNEST(generate_series(sess.h1, sess.h2)) AS u(h)
        WHERE u.h % 3 = 0
    """,
    "w_rolling_max": """
        SELECT event_id, user_id,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents,
               CAST(MAX(CAST(FLOOR(value * 100) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS roll_max_cents
        FROM events
    """,
    # nearest-in-time join, both directions: tie-break |dt|, ts, id
    "j_asof_nearest": """
        WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us
                   FROM events WHERE event_type = 'click'),
             p AS (SELECT event_id, user_id, epoch_us(ts) AS us
                   FROM events WHERE event_type = 'purchase')
        SELECT c.event_id, c.user_id, p.event_id AS nearest_id,
               ABS(c.us - p.us) AS abs_us
        FROM c JOIN p ON c.user_id = p.user_id
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY c.event_id
            ORDER BY ABS(c.us - p.us), p.us, p.event_id) = 1
    """,
    # gaps-and-islands: hr − ROW_NUMBER() island key, per-user streaks
    "w_gaps_islands": """
        WITH h AS (
            SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hr
            FROM events
        ), t AS (
            SELECT user_id, hr,
                   hr - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hr) AS grp
            FROM h
        )
        SELECT user_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY MIN(hr))
                    AS BIGINT) AS island_idx,
               MIN(hr) AS start_hr, MAX(hr) AS end_hr,
               COUNT(*) AS n_hours
        FROM t GROUP BY user_id, grp
    """,
    # time-window self-join pair count: ordered pairs within 300 s
    "j_time_self": """
        WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events)
        SELECT a.user_id, COUNT(*) AS n_pairs
        FROM e a JOIN e b
          ON a.user_id = b.user_id
         AND b.us - a.us BETWEEN 0 AND 300000000
         AND (a.us < b.us OR (a.us = b.us AND a.event_id < b.event_id))
        GROUP BY a.user_id
    """,
    # running count-distinct: first-occurrence flag + running sum (the
    # rewrite for the illegal COUNT(DISTINCT) OVER)
    "w_running_distinct": """
        WITH t AS (
            SELECT event_id, user_id, ts, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events
        )
        SELECT event_id, user_id,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
        FROM t
    """,
    "topk_per_group": """
        SELECT event_type, event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
        QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY cents DESC, event_id) <= 3
    """,
    "median_disc": """
        SELECT event_type,
               quantile_disc(CAST(FLOOR(value * 100) AS BIGINT), 0.5) AS median_cents
        FROM events GROUP BY event_type
    """,
    "count_distinct_exact": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
    """,
    "heavy_hitters": """
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
        HAVING COUNT(*) * 200 > (SELECT COUNT(*) FROM events)
    """,
    "mode_per_group": """
        SELECT event_type, CAST(user_id AS BIGINT) AS mode_user, cnt FROM (
            SELECT event_type, user_id, COUNT(*) AS cnt
            FROM events GROUP BY event_type, user_id
        )
        QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, user_id) = 1
    """,
    "j_keyed_range": """
        SELECT l_orderkey, COUNT(*) AS n_shipped
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= o_orderdate
          AND l_shipdate < o_orderdate + INTERVAL 30 DAY
        GROUP BY l_orderkey
    """,
    "text_redact": r"""
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(text, '[A-Za-z0-9.%+-]+@[A-Za-z0-9.-]+', '<email>', 'g'),
                   '[0-9]+', '#', 'g') AS redacted
        FROM documents
    """,
    "text_token_count": r"""
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens
        FROM documents
    """,
    "text_bpe_token_count": r"""
        SELECT doc_id, len(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+')) AS n_bpe_tokens
        FROM documents
    """,
    "text_quality_counts": r"""
        SELECT doc_id,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
               length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
               len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens
        FROM documents
    """,
    # exact top-k cosine ANN ranks (query set = vec_id % 50 == 0, self
    # excluded, ties by neighbor_id asc — deterministic ranks; both
    # sides compute in DOUBLE from the same float32 inputs)
    "knn_bruteforce": """
        WITH q AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                   FROM embeddings WHERE vec_id % 50 = 0),
             d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                   FROM embeddings)
        SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
               CAST(row_number() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(q.e, d.e) DESC, d.vec_id) AS BIGINT) AS rank
        FROM q, d
        WHERE d.vec_id <> q.vec_id
        QUALIFY rank <= 10
    """,
    # bit-exact SimHash: word hash = md5_number_lower (engine uses the
    # same low-64 md5), majority vote per bit; the int64 signature is
    # assembled as low-63 bits + an explicit sign-bit term so BIGINT
    # never overflows
    "dedup_simhash": r"""
        WITH words AS (
            SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS w
            FROM documents
        ), wh AS (
            SELECT doc_id, md5_number_lower(w) AS h FROM words
        ), nw AS (
            SELECT doc_id, COUNT(*) AS n FROM wh GROUP BY doc_id
        ), bits AS (
            SELECT wh.doc_id, t.j,
                   SUM(CASE WHEN (h >> t.j) & 1 = 1 THEN 1 ELSE 0 END) AS ones
            FROM wh, UNNEST(range(0, 64)) AS t(j)
            GROUP BY wh.doc_id, t.j
        ), sigs AS (
            SELECT b.doc_id,
                   CAST(SUM(CASE WHEN 2 * ones > n AND j < 63
                                 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
                        + SUM(CASE WHEN 2 * ones > n AND j = 63
                                   THEN -9223372036854775808 ELSE 0 END) AS BIGINT) AS simhash
            FROM bits b JOIN nw USING (doc_id)
            GROUP BY b.doc_id
        )
        SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
        FROM documents d LEFT JOIN sigs s USING (doc_id)
    """,
    # 32-bit polynomial content fingerprint over unicode CODEPOINTS
    # (engine hashes codepoints too — matches beyond ASCII); Horner step
    # stays < 2^52 so BIGINT math is exact
    "text_fingerprint32": """
        SELECT doc_id,
               CASE WHEN length(text) = 0 THEN 0
                    ELSE CAST(list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                                      list_transform(regexp_split_to_array(text, ''),
                                                     c -> CAST(unicode(c) + 1 AS BIGINT))),
                         (acc, d) -> (CAST(acc AS BIGINT) * 1000003 + d) % 4294967296) AS BIGINT)
               END AS fp32
        FROM documents
    """,
    # 64-bit polynomial fingerprint + winnowed min window-hash, mod-2^64
    # via HUGEINT (round-2 VERDICT #3); the unsigned MIN over window
    # hashes happens in HUGEINT space BEFORE the signed-int64 view, so
    # it equals the engine's np.uint64 min → int64 view
    "text_fingerprint": """
        WITH b AS (
          SELECT doc_id,
                 list_transform(regexp_split_to_array(text, ''),
                                c -> CAST(unicode(c) + 1 AS HUGEINT)) AS ds,
                 length(text) AS n
          FROM documents
        ), fh AS (
          SELECT doc_id,
                 CASE WHEN n = 0 THEN CAST(0 AS HUGEINT)
                      ELSE list_reduce(list_prepend(CAST(0 AS HUGEINT), ds),
                           (acc, d) -> (acc * 1000003 + d)
                                       % CAST('18446744073709551616' AS HUGEINT))
                 END AS vf
          FROM b
        ), wins AS (
          SELECT doc_id,
                 list_reduce(list_prepend(CAST(0 AS HUGEINT),
                                          ds[CAST(j + 1 AS BIGINT):CAST(j + w AS BIGINT)]),
                             (acc, d) -> (acc * 1000003 + d)
                                         % CAST('18446744073709551616' AS HUGEINT)) AS v
          FROM (SELECT doc_id, ds, n, LEAST(32, n) AS w FROM b WHERE n > 0),
               UNNEST(range(0, n - w + 1)) AS t(j)
        ), wm AS (
          SELECT doc_id, MIN(v) AS vm FROM wins GROUP BY doc_id
        )
        SELECT f.doc_id,
               CAST(CASE WHEN vf >= CAST('9223372036854775808' AS HUGEINT)
                         THEN vf - CAST('18446744073709551616' AS HUGEINT)
                         ELSE vf END AS BIGINT) AS fp_full,
               CAST(CASE WHEN COALESCE(vm, 0) >= CAST('9223372036854775808' AS HUGEINT)
                         THEN COALESCE(vm, 0) - CAST('18446744073709551616' AS HUGEINT)
                         ELSE COALESCE(vm, 0) END AS BIGINT) AS fp_winmin
        FROM fh f LEFT JOIN wm USING (doc_id)
    """,
    # language-ID + quality score: IEEE-op-order mirror of TextScore
    # (stopword-hit counts as integers, then the identical
    # left-associated double expression; en-first argmax tiebreak)
    "text_score": f"""
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(lower(COALESCE(text, '')), '[A-Za-z]+') AS tk,
                 COALESCE(text, '') AS txt
          FROM documents
        ), hits AS (
          SELECT doc_id, txt, len(tk) AS n_tok,
                 len(list_filter(tk, t -> list_contains({_stoplist('en')}, t))) AS h_en,
                 len(list_filter(tk, t -> list_contains({_stoplist('de')}, t))) AS h_de,
                 len(list_filter(tk, t -> list_contains({_stoplist('fr')}, t))) AS h_fr,
                 len(list_filter(tk, t -> list_contains({_stoplist('es')}, t))) AS h_es
          FROM toks
        ), scored AS (
          SELECT doc_id,
                 CASE WHEN GREATEST(h_en, h_de, h_fr, h_es) = 0 THEN 'unknown'
                      WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
                      WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
                      WHEN h_fr >= h_es THEN 'fr'
                      ELSE 'es' END AS lang_pred,
                 CAST(GREATEST(h_en, h_de, h_fr, h_es) AS DOUBLE)
                     / CAST(GREATEST(n_tok, 1) AS DOUBLE) AS stop_ratio,
                 CAST(length(txt) AS DOUBLE) AS n_chars,
                 CAST(length(txt) - length(regexp_replace(txt, '[A-Za-z]', '', 'g'))
                      AS DOUBLE) AS alpha,
                 CAST(length(txt) - length(regexp_replace(txt, '[.,;:!?]', '', 'g'))
                      AS DOUBLE) AS punct,
                 n_tok
          FROM hits
        )
        SELECT doc_id, lang_pred, stop_ratio,
               LEAST(GREATEST(
                 CAST(0.35 AS DOUBLE) * (alpha / CAST(GREATEST(n_chars, 1) AS DOUBLE))
                 + CAST(0.25 AS DOUBLE)
                   * LEAST(GREATEST(stop_ratio * 4, CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE))
                 + CAST(0.25 AS DOUBLE)
                   * LEAST(GREATEST(CAST(n_tok AS DOUBLE) / CAST(50.0 AS DOUBLE),
                                    CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE))
                 + CAST(0.15 AS DOUBLE)
                   * (CAST(1 AS DOUBLE)
                      - LEAST(GREATEST(punct / CAST(GREATEST(n_tok, 1) AS DOUBLE),
                                       CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE))),
                 CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE)) AS quality_score
        FROM scored
    """,
    "w_lag_delta": """
        WITH c AS (
          SELECT CAST(event_id AS BIGINT) AS event_id,
                 CAST(user_id AS BIGINT) AS user_id, ts,
                 CAST(FLOOR(value * 100) AS BIGINT) AS cents
          FROM events
        ), l AS (
          SELECT event_id, user_id, cents,
                 lag(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_cents
          FROM c
        )
        SELECT event_id, user_id, cents, prev_cents,
               cents - prev_cents AS delta_cents
        FROM l WHERE prev_cents IS NOT NULL
    """,
    "w_rolling_sum": """
        WITH c AS (
          SELECT CAST(event_id AS BIGINT) AS event_id,
                 CAST(user_id AS BIGINT) AS user_id, ts,
                 CAST(FLOOR(value * 100) AS BIGINT) AS cents
          FROM events
        )
        SELECT event_id, user_id, cents,
               CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_cents
        FROM c
    """,
    "rank_dense": """
        SELECT p_partkey, p_brand,
               CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS cents,
               CAST(dense_rank() OVER (
                    PARTITION BY p_brand
                    ORDER BY CAST(FLOOR(p_retailprice * 100) AS BIGINT) DESC) AS BIGINT) AS drank
        FROM part
    """,
    "ntile_bucket": """
        SELECT o_orderkey, o_orderpriority,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(ntile(4) OVER (
                    PARTITION BY o_orderpriority
                    ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT), o_orderkey) AS BIGINT) AS bucket
        FROM orders
    """,
    "rollup_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "pivot_wide": """
        SELECT o_orderstatus,
               CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
               CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_other
        FROM orders GROUP BY o_orderstatus
    """,
    "string_agg_segments": """
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
               string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
        FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
        GROUP BY c_nationkey
    """,
    "text_word_freq": """
        SELECT w AS word, COUNT(*) AS cnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
              FROM documents) t
        GROUP BY w ORDER BY cnt DESC, w LIMIT 20
    """,
    "j_left_outer": """
        SELECT c_custkey, c_mktsegment,
               CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)), -1) AS BIGINT) AS sum_spent_cents
        FROM customer LEFT OUTER JOIN (
            SELECT o_custkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
        ) o ON o.o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
    """,
    "stratified_sample": """
        SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
               CAST(user_id AS BIGINT) AS user_id
        FROM events
        WHERE (event_id * 2654435761) % 100 <
              CASE WHEN event_type = 'purchase' THEN 100
                   WHEN event_type = 'click' THEN 25 ELSE 10 END
    """,
    "text_top_keyword": r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
          FROM documents
        ), tf AS (
          SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), dfreq AS (
          SELECT word, COUNT(*) AS df FROM tf GROUP BY 1
        )
        SELECT CAST(tf.doc_id AS BIGINT) AS doc_id, tf.word,
               CAST(tf.tf AS BIGINT) AS tf, CAST(dfreq.df AS BIGINT) AS df,
               CAST(tf.tf * 1000000 // dfreq.df AS BIGINT) AS score
        FROM tf JOIN dfreq USING (word)
        QUALIFY row_number() OVER (
            PARTITION BY tf.doc_id
            ORDER BY tf.tf * 1000000 // dfreq.df DESC, tf.word ASC) = 1
    """,
    # connected components over the SAME exact-Jaccard pair graph as
    # dedup_ngram_jaccard: recursive min-label reachability
    "dedup_clusters": r"""
        WITH RECURSIVE words AS (
            SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
            FROM documents
        ), sh0 AS (
            SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
            FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
            WHERE len(ws) >= 3
            UNION ALL
            SELECT doc_id, array_to_string(ws, ' ') AS shingle
            FROM words WHERE len(ws) BETWEEN 1 AND 2
        ), dsh AS (
            SELECT DISTINCT doc_id, shingle FROM sh0
        ), cnt AS (
            SELECT doc_id, COUNT(*) AS c FROM dsh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS intersection
            FROM dsh a JOIN dsh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT doc_id_a, doc_id_b
            FROM inter
            JOIN cnt ca ON ca.doc_id = inter.doc_id_a
            JOIN cnt cb ON cb.doc_id = inter.doc_id_b
            WHERE intersection * 10 >= 2 * (ca.c + cb.c - intersection)
        ), edges AS (
            SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
            UNION ALL
            SELECT doc_id_b, doc_id_a FROM pairs
        ), reach(node, label) AS (
            SELECT DISTINCT src, src FROM edges
            UNION
            SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT CAST(node AS BIGINT) AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    """,
    # snapshot diff: B is derived from A by md5 coins (%17 removed,
    # %13 perturbed, %19 adds id+1e9), so the expected classification
    # is a pure function of the coins
    "table_diff": """
        WITH rm AS (
            SELECT doc_id FROM documents
            WHERE md5_number_lower(CAST(doc_id AS VARCHAR) || ':rm') % 17 = 0
        ), ch AS (
            SELECT doc_id FROM documents
            WHERE md5_number_lower(CAST(doc_id AS VARCHAR) || ':ch') % 13 = 0
        ), ad AS (
            SELECT doc_id + 1000000000 AS doc_id FROM documents
            WHERE md5_number_lower(CAST(doc_id AS VARCHAR) || ':add') % 19 = 0
        )
        SELECT doc_id, 'removed' AS status FROM rm
        UNION ALL
        SELECT doc_id, 'changed' FROM ch
        WHERE doc_id NOT IN (SELECT doc_id FROM rm)
        UNION ALL
        SELECT doc_id, 'added' FROM ad
    """,
    # DSIR importance weights: per-bucket integer ratio score
    # s[b] = (target_tokens[b] * 1e6) // raw_tokens[b] over md5 % 1024
    # hashed unigrams; doc weight = sum of its tokens' bucket scores
    "dsir_weights": r"""
        WITH words AS (
            SELECT doc_id, lang,
                   unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS w
            FROM documents
        ), hashed AS (
            SELECT doc_id, lang,
                   CAST(md5_number_lower(w) % 1024 AS BIGINT) AS bucket
            FROM words
        ), score AS (
            SELECT bucket,
                   (SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000)
                       // COUNT(*) AS s
            FROM hashed GROUP BY bucket
        )
        SELECT d.doc_id, CAST(COALESCE(SUM(sc.s), 0) AS BIGINT) AS dsir_weight
        FROM documents d
        LEFT JOIN hashed h ON h.doc_id = d.doc_id
        LEFT JOIN score sc ON sc.bucket = h.bucket
        GROUP BY d.doc_id
    """,
    # DSIR resampling: deterministic weighted-reservoir priority
    # (integer Efraimidis–Spirakis surrogate), keep the k smallest
    "dsir_sample": r"""
        WITH words AS (
            SELECT doc_id, lang,
                   unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS w
            FROM documents
        ), hashed AS (
            SELECT doc_id, lang,
                   CAST(md5_number_lower(w) % 1024 AS BIGINT) AS bucket
            FROM words
        ), score AS (
            SELECT bucket,
                   (SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000)
                       // COUNT(*) AS s
            FROM hashed GROUP BY bucket
        ), wt AS (
            SELECT d.doc_id, CAST(COALESCE(SUM(sc.s), 0) AS BIGINT) AS dsir_weight
            FROM documents d
            LEFT JOIN hashed h ON h.doc_id = d.doc_id
            LEFT JOIN score sc ON sc.bucket = h.bucket
            GROUP BY d.doc_id
        )
        SELECT doc_id, dsir_weight,
               CAST(((md5_number_lower(CAST(doc_id AS VARCHAR) || ':dsir')
                      % 2147483648 + 1) * 1000000)
                    // (dsir_weight + 1) AS BIGINT) AS priority
        FROM wt
        ORDER BY priority, doc_id
        LIMIT 50
    """,
    # feature-hashing sparse embedding: bucket = md5 % 64, sign = bit 63
    "text_embed_counts": r"""
        WITH words AS (
            SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS w
            FROM documents
        ), hashed AS (
            SELECT doc_id,
                   CAST(md5_number_lower(w) % 64 AS BIGINT) AS bucket,
                   CASE WHEN (md5_number_lower(w) >> 63) & 1 = 1 THEN -1 ELSE 1 END AS sign
            FROM words
        )
        SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS signed_cnt
        FROM hashed
        GROUP BY doc_id, bucket
        HAVING SUM(sign) <> 0
    """,
    "cube_agg": """
        WITH f AS (
            SELECT event_type,
                   CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow,
                   CAST(FLOOR(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT COALESCE(event_type, '(all)') AS event_type,
               CAST(COALESCE(dow, -1) AS BIGINT) AS dow,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               COUNT(*) AS n
        FROM f GROUP BY CUBE(event_type, dow)
    """,
    "j_bloom_anti": """
        SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
               CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS price_cents
        FROM lineitem
        WHERE l_orderkey NOT IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
    """,
    "w_first_last": """
        WITH o AS (
            SELECT user_id, event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS cnt
            FROM events
        )
        SELECT f.user_id, f.event_id AS first_event_id, l.event_id AS last_event_id,
               f.cents AS first_cents, l.cents AS last_cents
        FROM (SELECT * FROM o WHERE rn = 1) f
        JOIN (SELECT * FROM o WHERE rn = cnt) l USING (user_id)
    """,
    "cohort_retention": """
        WITH w AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 604800000000 AS wk
            FROM events
        ), c AS (
            SELECT user_id, MIN(wk) AS cw FROM w GROUP BY user_id
        )
        SELECT CAST(c.cw AS BIGINT) AS cohort_week,
               CAST(w.wk - c.cw AS BIGINT) AS week_offset,
               COUNT(*) AS n_users
        FROM w JOIN c USING (user_id)
        GROUP BY 1, 2
    """,
    # ordered funnel: users completing each prefix view→click→purchase
    # with strictly-increasing first-completion timestamps, each step
    # within a 24-hour window of the previous step's completion
    "funnel_conversion": """
        WITH v AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t1
              AND e.ts <= v.t1 + INTERVAL 24 HOUR
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t2
              AND e.ts <= c.t2 + INTERVAL 24 HOUR
            GROUP BY e.user_id
        )
        SELECT stage, CAST(n_users AS BIGINT) AS n_users FROM (
            SELECT 'view' AS stage, COUNT(*) AS n_users FROM v
            UNION ALL SELECT 'view>click', COUNT(*) FROM c
            UNION ALL SELECT 'view>click>purchase', COUNT(*) FROM p
        )
    """,
    # hashed bag-of-words linear classifier: weight(w) = md5_lower64(w)
    # % 1001 − 500 (same md5 low half as dedup_simhash), integer score
    "text_classify": r"""
        WITH words AS (
            SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS w
            FROM documents
        ), tw AS (
            SELECT doc_id,
                   CAST(md5_number_lower(w) % 1001 AS BIGINT) - 500 AS wt
            FROM words
        ), sc AS (
            SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score FROM tw GROUP BY doc_id
        )
        SELECT d.doc_id, COALESCE(sc.score, 0) AS score,
               CASE WHEN COALESCE(sc.score, 0) > 0 THEN 'pos' ELSE 'neg' END AS label
        FROM documents d LEFT JOIN sc USING (doc_id)
    """,
    # dedup APPLIED: corpus minus non-representative cluster members
    # (same recursive-CTE clustering as dedup_clusters, then anti-join)
    "dedup_survivors": r"""
        WITH RECURSIVE words AS (
            SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
            FROM documents
        ), sh0 AS (
            SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
            FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
            WHERE len(ws) >= 3
            UNION ALL
            SELECT doc_id, array_to_string(ws, ' ') AS shingle
            FROM words WHERE len(ws) BETWEEN 1 AND 2
        ), dsh AS (
            SELECT DISTINCT doc_id, shingle FROM sh0
        ), cnt AS (
            SELECT doc_id, COUNT(*) AS c FROM dsh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS intersection
            FROM dsh a JOIN dsh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT doc_id_a, doc_id_b
            FROM inter
            JOIN cnt ca ON ca.doc_id = inter.doc_id_a
            JOIN cnt cb ON cb.doc_id = inter.doc_id_b
            WHERE intersection * 10 >= 2 * (ca.c + cb.c - intersection)
        ), edges AS (
            SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
            UNION ALL
            SELECT doc_id_b, doc_id_a FROM pairs
        ), reach(node, label) AS (
            SELECT DISTINCT src, src FROM edges
            UNION
            SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
        ), dropped AS (
            SELECT node FROM reach GROUP BY node HAVING MIN(label) <> node
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        WHERE doc_id NOT IN (SELECT node FROM dropped)
    """,
    # exact word-3-gram Jaccard dedup with INTEGER threshold math
    # (i*10 >= 2*(|a|+|b|-i)  ⇔  J >= 0.2) — no float compare anywhere
    "j_full_outer": """
        WITH b AS (
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_mktsegment = 'BUILDING'
        ), s AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spent
            FROM orders WHERE o_orderpriority = '1-URGENT'
            GROUP BY o_custkey
        )
        SELECT CAST(COALESCE(b.c_custkey, s.o_custkey) AS BIGINT) AS custkey,
               COALESCE(b.c_mktsegment, '(none)') AS seg,
               CAST(COALESCE(s.spent, -1) AS BIGINT) AS sum_spent_cents
        FROM b FULL OUTER JOIN s ON b.c_custkey = s.o_custkey
    """,
    "corr_moments": """
        WITH xy AS (
            SELECT event_type,
                   CAST(FLOOR(value * 100) AS BIGINT) AS x,
                   CAST(user_id AS BIGINT) AS y
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM xy GROUP BY event_type
    """,
    "j_bloom_semi": """
        SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
               CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS price_cents
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
    """,
    "w_percent_rank": """
        WITH c AS (
            SELECT event_id, event_type,
                   CAST(FLOOR(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
               CAST(RANK() OVER w - 1 AS BIGINT) AS pr_num,
               CAST(COUNT(*) OVER (PARTITION BY event_type) - 1 AS BIGINT) AS pr_den,
               CAST(COUNT(*) OVER (
                    PARTITION BY event_type ORDER BY cents
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cd_num
        FROM c
        WINDOW w AS (PARTITION BY event_type ORDER BY cents)
    """,
    "emb_centroid": """
        SELECT CAST(label AS BIGINT) AS label,
               CAST(i - 1 AS BIGINT) AS dim,
               CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT)
                   AS sum_micro,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        GROUP BY label, i
    """,
    # Z-order layout: per-dim max-normalize to 16 bits, interleave,
    # top-6-bit grid cell
    "zorder_layout": """
        WITH mx AS (
            SELECT MAX(l_partkey) AS mp, MAX(l_suppkey) AS ms FROM lineitem
        ), nrm AS (
            SELECT l_orderkey, l_linenumber,
                   (l_partkey * 65536) // (mp + 1) AS xn,
                   (l_suppkey * 65536) // (ms + 1) AS yn
            FROM lineitem, mx
        ), bits AS (
            -- row-preserving bit fold: (l_orderkey, l_linenumber) is not
            -- unique in the fixture, so no UNNEST + GROUP BY
            SELECT l_orderkey, l_linenumber,
                   CAST(list_sum(list_transform(generate_series(0, 15),
                        i -> (((xn >> i) & 1) << (2 * i + 1))
                             + (((yn >> i) & 1) << (2 * i)))) AS BIGINT) AS zcode
            FROM nrm
        )
        SELECT l_orderkey, l_linenumber, zcode,
               CAST(zcode >> 26 AS BIGINT) AS zpart
        FROM bits
    """,
    # TeraSort manifest: md5-coin sample → quantile_disc bounds →
    # part_id = #bounds strictly below the key; COALESCE covers the
    # empty-sample degenerate case (everything in partition 0)
    "sort_partitioned": """
        WITH t AS (
            SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS key,
                   md5_number_lower(CAST(l_orderkey AS VARCHAR) || '-'
                                    || CAST(l_linenumber AS VARCHAR)) % 50 AS coin
            FROM lineitem
        ), b AS (
            SELECT quantile_disc(key, [0.125, 0.25, 0.375, 0.5,
                                       0.625, 0.75, 0.875]) AS bs
            FROM t WHERE coin = 0
        )
        SELECT CAST(COALESCE(len(list_filter(b.bs, x -> x < t.key)), 0) AS BIGINT)
                   AS part_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(t.key) AS min_cents, MAX(t.key) AS max_cents
        FROM t, b GROUP BY 1
    """,
    # record linkage: Levenshtein ≤ τ pairs under nation blocking — the
    # blocking predicate is part of the operator contract (both sides
    # apply it), so engine and oracle agree exactly
    "fuzzy_blocking": """
        SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
               CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    # INT8 scalar quantization of embeddings: per-dim min/max over
    # int64 micro-units, code = (v-min)*255 // range (constant dim → 0);
    # CAST ... AS DOUBLE mirrors the engine's float32→float64 promotion
    "emb_quantize_int8": """
        WITH vals AS (
            SELECT vec_id, CAST(t.i AS BIGINT) AS dim,
                   CAST(FLOOR(CAST(embedding[t.i + 1] AS DOUBLE) * 1000000)
                        AS BIGINT) AS v
            FROM embeddings, UNNEST(range(0, len(embedding))) AS t(i)
        ), stats AS (
            SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM vals GROUP BY dim
        )
        SELECT vec_id, vals.dim,
               CAST(CASE WHEN mx = mn THEN 0
                         ELSE ((v - mn) * 255) // (mx - mn) END AS UTINYINT) AS code
        FROM vals JOIN stats USING (dim)
    """,
    # positional 5-gram duplicate-span statistic (Lee et al. substring
    # dedup): gram occurrence counted WITH multiplicity corpus-wide; the
    # engine counts on a 64-bit gram hash (collision-free assumption)
    "dup_span_fraction": r"""
        WITH words AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
            FROM documents
        ), grams AS (
            SELECT doc_id,
                   ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                         || ' ' || ws[i+4] AS gram
            FROM words, UNNEST(range(1, len(ws) - 3)) AS t(i)
            WHERE len(ws) >= 5
        ), occ AS (
            SELECT doc_id, COUNT(*) OVER (PARTITION BY gram) AS c FROM grams
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        FROM occ GROUP BY doc_id
    """,
    # distributed-trainer sufficient statistics: upper-triangle Gram
    # matrix of the 16-dim hashed features + X^T y rows (j = -1);
    # dense grid so structurally-zero entries match the engine's dense
    # per-batch partials
    "gram_matrix": r"""
        WITH words AS (
            SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS w
            FROM documents
        ), hashed AS (
            SELECT doc_id,
                   CAST(md5_number_lower(w) % 16 AS BIGINT) AS bucket,
                   CASE WHEN (md5_number_lower(w) >> 63) & 1 = 1 THEN -1 ELSE 1 END AS sign
            FROM words
        ), counts AS (
            SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS c
            FROM hashed GROUP BY doc_id, bucket
        ), gram AS (
            SELECT a.bucket AS i, b.bucket AS j, SUM(a.c * b.c) AS g
            FROM counts a JOIN counts b USING (doc_id)
            WHERE a.bucket <= b.bucket
            GROUP BY 1, 2
        ), xty AS (
            SELECT c.bucket AS i,
                   SUM(c.c * CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS g
            FROM counts c JOIN documents d USING (doc_id)
            GROUP BY 1
        ), grid AS (
            SELECT ii.range AS i, jj.range AS j
            FROM range(16) ii, range(16) jj WHERE ii.range <= jj.range
        )
        SELECT CAST(grid.i AS BIGINT) AS i, CAST(grid.j AS BIGINT) AS j,
               CAST(COALESCE(gram.g, 0) AS BIGINT) AS g
        FROM grid LEFT JOIN gram ON gram.i = grid.i AND gram.j = grid.j
        UNION ALL
        SELECT CAST(ii.range AS BIGINT) AS i, CAST(-1 AS BIGINT) AS j,
               CAST(COALESCE(xty.g, 0) AS BIGINT) AS g
        FROM range(16) ii LEFT JOIN xty ON xty.i = ii.range
    """,
    # end-to-end corpus assembly: dedup-survivor ∩ decontaminated ∩
    # mix-sampled docs with salted split coins — composes the
    # dedup_clusters and decontaminate CTEs verbatim
    "assemble_corpus": r"""
        WITH RECURSIVE words AS (
            SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
            FROM documents
        ), sh0 AS (
            SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
            FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
            WHERE len(ws) >= 3
            UNION ALL
            SELECT doc_id, array_to_string(ws, ' ') AS shingle
            FROM words WHERE len(ws) BETWEEN 1 AND 2
        ), dsh AS (
            SELECT DISTINCT doc_id, shingle FROM sh0
        ), cnt AS (
            SELECT doc_id, COUNT(*) AS c FROM dsh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS intersection
            FROM dsh a JOIN dsh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT doc_id_a, doc_id_b
            FROM inter
            JOIN cnt ca ON ca.doc_id = inter.doc_id_a
            JOIN cnt cb ON cb.doc_id = inter.doc_id_b
            WHERE intersection * 10 >= 2 * (ca.c + cb.c - intersection)
        ), edges AS (
            SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
            UNION ALL
            SELECT doc_id_b, doc_id_a FROM pairs
        ), reach(node, label) AS (
            SELECT DISTINCT src, src FROM edges
            UNION
            SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
        ), dropdup AS (
            SELECT node AS doc_id FROM reach GROUP BY node
            HAVING node <> MIN(label)
        ), bench_sh AS (
            SELECT DISTINCT shingle FROM dsh WHERE doc_id % 97 = 0
        ), contam AS (
            SELECT DISTINCT d.doc_id FROM dsh d JOIN bench_sh USING (shingle)
            WHERE d.doc_id % 97 <> 0
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
               CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR) || ':split') % 100 < 80 THEN 'train'
                    WHEN md5_number_lower(CAST(doc_id AS VARCHAR) || ':split') % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
        WHERE doc_id % 97 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM dropdup)
          AND doc_id NOT IN (SELECT doc_id FROM contam)
          AND md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 <
              CASE lang WHEN 'en' THEN 1000 WHEN 'de' THEN 600
                        WHEN 'fr' THEN 600 WHEN 'es' THEN 400
                        WHEN 'zh' THEN 300 ELSE 250 END
    """,
    # eval-set decontamination: same shingle construction as
    # dedup_ngram_jaccard; benchmark slice = doc_id % 97 == 0
    "decontaminate": r"""
        WITH words AS (
            SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
            FROM documents
        ), sh0 AS (
            SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
            FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
            WHERE len(ws) >= 3
            UNION ALL
            SELECT doc_id, array_to_string(ws, ' ') AS shingle
            FROM words WHERE len(ws) BETWEEN 1 AND 2
        ), dsh AS (
            SELECT DISTINCT doc_id, shingle FROM sh0
        ), bench AS (
            SELECT DISTINCT shingle FROM dsh WHERE doc_id % 97 = 0
        ), cnt AS (
            SELECT doc_id, COUNT(*) AS c FROM dsh WHERE doc_id % 97 <> 0 GROUP BY doc_id
        ), hits AS (
            SELECT d.doc_id, COUNT(*) AS h
            FROM dsh d JOIN bench USING (shingle)
            WHERE d.doc_id % 97 <> 0 GROUP BY d.doc_id
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(h AS BIGINT) AS n_contaminated,
               CAST(c AS BIGINT) AS n_shingles
        FROM hits JOIN cnt USING (doc_id)
    """,
    "split_assign": """
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS BIGINT) AS bucket,
               CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 80 THEN 'train'
                    WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "mix_sample": """
        SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
        FROM documents
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 <
              CASE lang WHEN 'en' THEN 1000 WHEN 'de' THEN 600
                        WHEN 'fr' THEN 600 WHEN 'es' THEN 400
                        WHEN 'zh' THEN 300 ELSE 250 END
    """,
    "dedup_ngram_jaccard": r"""
        WITH words AS (
            SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
            FROM documents
        ), sh0 AS (
            SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
            FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
            WHERE len(ws) >= 3
            UNION ALL
            SELECT doc_id, array_to_string(ws, ' ') AS shingle
            FROM words WHERE len(ws) BETWEEN 1 AND 2
        ), dsh AS (
            SELECT DISTINCT doc_id, shingle FROM sh0
        ), cnt AS (
            SELECT doc_id, COUNT(*) AS c FROM dsh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS intersection
            FROM dsh a JOIN dsh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_id_a, doc_id_b, intersection
        FROM inter
        JOIN cnt ca ON ca.doc_id = inter.doc_id_a
        JOIN cnt cb ON cb.doc_id = inter.doc_id_b
        WHERE intersection * 10 >= 2 * (ca.c + cb.c - intersection)
    """,
}


def _pagerank_sql(iters: int = 5) -> str:
    """Unrolled integer power iteration matching ``graph.pagerank``:
    every step is closed over integer arithmetic (``//`` division,
    ``(Σ·85)//100`` damping) so engine and oracle agree bit for bit.
    Same md5-lower64 edge derivation as the engine."""
    steps = []
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(
            f""", r{i} AS (
            SELECT n.v AS node,
                   CAST(150000 + COALESCE(s.s85, 0) AS BIGINT) AS r
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS node, (SUM(r.r // e.outdeg) * 85) // 100 AS s85
                FROM edges e JOIN {prev} r ON r.node = e.src
                GROUP BY e.dst
            ) s ON s.node = n.v
        )"""
        )
        prev = f"r{i}"
    return f"""
        WITH nodes AS (
            SELECT CAST(doc_id AS BIGINT) AS v FROM documents
        ), deg AS (
            SELECT v,
                   1 + CAST(md5_number_lower(CAST(v AS VARCHAR) || '-d') % 3 AS BIGINT)
                       AS outdeg
            FROM nodes
        ), edges AS (
            SELECT d.v AS src, d.outdeg,
                   CAST(md5_number_lower(
                            CAST(d.v AS VARCHAR) || '-e' || CAST(t.j AS VARCHAR)
                        ) % (SELECT COUNT(*) FROM nodes) AS BIGINT) AS dst
            FROM deg d, UNNEST(range(0, d.outdeg)) AS t(j)
        ), r0 AS (
            SELECT v AS node, CAST(1000000 AS BIGINT) AS r FROM nodes
        ){''.join(steps)}
        SELECT node AS doc_id, r AS rank FROM {prev}
    """


ORACLE_SQL["pagerank"] = _pagerank_sql(5)

# multi-source BFS levels over the same md5-derived edges: min #hops
# from any seed (doc_id % 97 = 0), bounded at depth 4; the recursive
# CTE enumerates every path of length ≤ 4 (UNION dedups states) and
# MIN(dist) is exactly frontier-BFS truncated at 4 rounds
ORACLE_SQL["bfs_levels"] = """
    WITH RECURSIVE nodes AS (
        SELECT CAST(doc_id AS BIGINT) AS v FROM documents
    ), deg AS (
        SELECT v,
               1 + CAST(md5_number_lower(CAST(v AS VARCHAR) || '-d') % 3 AS BIGINT)
                   AS outdeg
        FROM nodes
    ), edges AS (
        SELECT d.v AS src,
               CAST(md5_number_lower(
                        CAST(d.v AS VARCHAR) || '-e' || CAST(t.j AS VARCHAR)
                    ) % (SELECT COUNT(*) FROM nodes) AS BIGINT) AS dst
        FROM deg d, UNNEST(range(0, d.outdeg)) AS t(j)
    ), bfs(node, dist) AS (
        SELECT v, 0 FROM nodes WHERE v % 97 = 0
        UNION
        SELECT e.dst, b.dist + 1
        FROM bfs b JOIN edges e ON e.src = b.node
        WHERE b.dist < 4
    )
    SELECT node AS doc_id, CAST(MIN(dist) AS BIGINT) AS level
    FROM bfs GROUP BY node
"""

# inverted index: sorted posting lists for terms in the df band
ORACLE_SQL["inverted_index"] = r"""
    WITH words AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
        FROM documents
    ), pairs AS (
        SELECT DISTINCT term, doc_id FROM words
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM pairs GROUP BY term
    HAVING COUNT(*) BETWEEN 2 AND 1000
"""

# top-k bigram collocations by integer PMI surrogate (Church & Hanks):
# rank by c_xy*1e12 // (c_x*c_y) — global N factors cancel in ranking
ORACLE_SQL["collocations"] = r"""
    WITH words AS (
        SELECT list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
        FROM documents
    ), uni AS (
        SELECT unnest(ws) AS w FROM words
    ), ucnt AS (
        SELECT w, COUNT(*) AS c FROM uni GROUP BY w
    ), bi AS (
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM words, UNNEST(range(1, len(ws))) AS t(i)
        WHERE len(ws) >= 2
    ), bcnt AS (
        SELECT w1, w2, COUNT(*) AS cb FROM bi GROUP BY w1, w2
    )
    SELECT w1, w2, CAST(cb AS BIGINT) AS pair_cnt,
           CAST(cb * 1000000000000 // (u1.c * u2.c) AS BIGINT) AS pmi_score
    FROM bcnt
    JOIN ucnt u1 ON u1.w = w1
    JOIN ucnt u2 ON u2.w = w2
    WHERE cb >= 3
    ORDER BY pmi_score DESC, w1, w2 LIMIT 20
"""

# exact per-group percentiles via distributed histogram (no group
# materialization); index convention = DuckDB quantile_disc
ORACLE_SQL["percentile_hist"] = """
    SELECT event_type,
           quantile_disc(CAST(FLOOR(value * 100) AS BIGINT), 0.5) AS p50_cents,
           quantile_disc(CAST(FLOOR(value * 100) AS BIGINT), 0.95) AS p95_cents
    FROM events GROUP BY event_type
"""

# winsorize: clamp to global exact [p05, p95] (quantile_disc convention)
ORACLE_SQL["winsorize"] = """
    WITH c AS (
        SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events
    ), q AS (
        SELECT quantile_disc(cents, 0.05) AS lo,
               quantile_disc(cents, 0.95) AS hi
        FROM c
    )
    SELECT c.event_id, c.cents,
           CAST(LEAST(GREATEST(c.cents, q.lo), q.hi) AS BIGINT) AS w_cents
    FROM c, q
"""

# streaming first-wins dedup ≡ batch min-id dedup under doc_id arrival
ORACLE_SQL["dedup_incremental"] = """
    SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
"""

# per-group uniform sample: smallest-k md5 coins per language
ORACLE_SQL["group_sample"] = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
           CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) & 9223372036854775807 AS BIGINT) AS coin
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY lang
        ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)) & 9223372036854775807, doc_id
    ) <= 20
"""

# Spearman moments: doubled average ranks (2*RANK() + cnt - 1) keep
# tied-rank halves integral; six exact-int sufficient statistics
ORACLE_SQL["spearman_moments"] = """
    WITH r AS (
        SELECT
            2 * RANK() OVER (ORDER BY l_quantity)
              + COUNT(*) OVER (PARTITION BY l_quantity) - 1 AS x2,
            2 * RANK() OVER (ORDER BY CAST(FLOOR(l_discount * 100) AS BIGINT))
              + COUNT(*) OVER (PARTITION BY CAST(FLOOR(l_discount * 100) AS BIGINT)) - 1 AS y2
        FROM lineitem
    )
    SELECT COUNT(*) AS n,
           CAST(SUM(x2) AS BIGINT) AS sum_x2,
           CAST(SUM(y2) AS BIGINT) AS sum_y2,
           CAST(SUM(x2 * x2) AS BIGINT) AS sum_x2x2,
           CAST(SUM(y2 * y2) AS BIGINT) AS sum_y2y2,
           CAST(SUM(x2 * y2) AS BIGINT) AS sum_x2y2
    FROM r
"""

# triangle count over the undirected view of the same md5-derived graph:
# canonical u<v distinct edges, classic three-way self-join u<v<w
ORACLE_SQL["triangle_count"] = """
    WITH nodes AS (
        SELECT CAST(doc_id AS BIGINT) AS v FROM documents
    ), deg AS (
        SELECT v,
               1 + CAST(md5_number_lower(CAST(v AS VARCHAR) || '-d') % 3 AS BIGINT)
                   AS outdeg
        FROM nodes
    ), dir_edges AS (
        SELECT d.v AS src,
               CAST(md5_number_lower(
                        CAST(d.v AS VARCHAR) || '-e' || CAST(t.j AS VARCHAR)
                    ) % (SELECT COUNT(*) FROM nodes) AS BIGINT) AS dst
        FROM deg d, UNNEST(range(0, d.outdeg)) AS t(j)
    ), und AS (
        SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        FROM dir_edges WHERE src <> dst
    )
    SELECT COUNT(*) AS n_triangles
    FROM und e1
    JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
    JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
"""

# 2-D Pareto skyline (min price cents, max size); identical points keep
# each other — NOT EXISTS demands strictness in at least one dimension
ORACLE_SQL["skyline_pareto"] = """
    WITH p AS (
        SELECT p_partkey,
               CAST(p_size AS BIGINT) AS p_size,
               CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS price_cents
        FROM part
    )
    SELECT p_partkey, p_size, price_cents
    FROM p a
    WHERE NOT EXISTS (
        SELECT 1 FROM p b
        WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
          AND (b.price_cents < a.price_cents OR b.p_size > a.p_size)
    )
    ORDER BY p_partkey
"""

# z-score outliers with denominators cleared: (n·v − S)² > z²(n·Q − S²)
# over v = floor(value) — exact integers on both sides, z = 2
# robust median/MAD outlier screen — the 1.4826 consistency scale is
# cleared to |x−med|·1000 > 1482·mad; quantile_disc matches the
# engine's ceil(n/2)−1 histogram-rank selection
ORACLE_SQL["mad_outliers"] = """
    WITH e AS (
        SELECT event_id, event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
    ), med AS (
        SELECT event_type, quantile_disc(cents, 0.5) AS med
        FROM e GROUP BY event_type
    ), madt AS (
        SELECT e.event_type, quantile_disc(ABS(e.cents - med.med), 0.5) AS mad
        FROM e JOIN med USING (event_type) GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.cents
    FROM e JOIN med USING (event_type) JOIN madt USING (event_type)
    WHERE ABS(e.cents - med.med) * 1000 > 1482 * madt.mad
"""

ORACLE_SQL["zscore_outliers"] = """
    WITH e AS (
        SELECT event_id, event_type, CAST(FLOOR(value) AS BIGINT) AS value_floor
        FROM events
    ), m AS (
        SELECT event_type, COUNT(*) AS n, SUM(value_floor) AS s,
               SUM(value_floor * value_floor) AS q
        FROM e GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value_floor
    FROM e JOIN m USING (event_type)
    WHERE (m.n * e.value_floor - m.s) * (m.n * e.value_floor - m.s)
          > 4 * (m.n * m.q - m.s * m.s)
"""

# mutual top-k pairs from the same deterministic rank definition as
# knn_bruteforce, with EVERY vector as a query
ORACLE_SQL["knn_reciprocal"] = """
    WITH d AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ), r AS (
        SELECT q.vec_id AS qid, n.vec_id AS nid,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.e, n.e) DESC, n.vec_id) AS rank
        FROM d q, d n
        WHERE n.vec_id <> q.vec_id
        QUALIFY rank <= 10
    )
    SELECT r1.qid AS vec_id_a, r1.nid AS vec_id_b
    FROM r r1 JOIN r r2 ON r1.qid = r2.nid AND r1.nid = r2.qid
    WHERE r1.qid < r1.nid
"""

# Gopher-style per-doc bigram repetition signals: LEAD window builds the
# bigram stream per doc, LEFT JOIN keeps bigram-less docs with zeros;
# the repetition flag is the float threshold cleared to integers
# (top*5 > total, matching the engine's cross-multiply)
ORACLE_SQL["text_gopher_repetition"] = r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
        FROM documents
    ), b AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS bg
        FROM t
    ), c AS (
        SELECT doc_id, bg, COUNT(*) AS n FROM b GROUP BY doc_id, bg
    ), agg AS (
        SELECT doc_id, SUM(n) AS n_bigrams, COUNT(*) AS n_distinct_bigrams,
               MAX(n) AS top_bigram_count
        FROM c GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_bigrams, 0)::BIGINT AS n_bigrams,
           COALESCE(a.n_distinct_bigrams, 0)::BIGINT AS n_distinct_bigrams,
           COALESCE(a.top_bigram_count, 0)::BIGINT AS top_bigram_count,
           COALESCE(a.top_bigram_count * 5 > a.n_bigrams, FALSE) AS is_repetitive
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""

# conjunctive AND search: docs containing ALL of the (fixed, broadcast)
# query terms, top-20 by summed tf, ties broken by doc_id
ORACLE_SQL["search_conjunctive"] = r"""
    WITH w AS (
        SELECT doc_id, u.w AS word
        FROM documents,
             UNNEST(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
                 AS u(w)
    ), m AS (
        SELECT doc_id, word, COUNT(*)::BIGINT AS tf
        FROM w WHERE word IN ('table', 'hash', 'sort')
        GROUP BY doc_id, word
    )
    SELECT doc_id, SUM(tf)::BIGINT AS tf_total
    FROM m GROUP BY doc_id
    HAVING COUNT(DISTINCT word) = 3
    ORDER BY tf_total DESC, doc_id
    LIMIT 20
"""

# top-k event-type trigram paths; per-user order = (ts, event_id), the
# shared window-op tie-break contract
ORACLE_SQL["path_trigrams"] = """
    WITH o AS (
        SELECT event_type AS t1,
               LEAD(event_type, 1) OVER w AS t2,
               LEAD(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1 || '>' || t2 || '>' || t3 AS trigram, COUNT(*)::BIGINT AS n
    FROM o WHERE t3 IS NOT NULL
    GROUP BY trigram
    ORDER BY n DESC, trigram
    LIMIT 10
"""

# per-column profile of events; reprs are canonical strings (ints as
# decimal text, doubles as FLOOR(x*100) cents) so min/max compare
# lexicographically and identically on both sides
ORACLE_SQL["data_profile"] = """
    WITH r AS (
        SELECT event_type AS c_event_type,
               CAST(user_id AS VARCHAR) AS c_user_id,
               CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR) AS c_value,
               props AS c_props
        FROM events
    )
    SELECT 'event_type' AS col, COUNT(*)::BIGINT AS n,
           (COUNT(*) - COUNT(c_event_type))::BIGINT AS n_null,
           COUNT(DISTINCT c_event_type)::BIGINT AS n_distinct,
           MIN(c_event_type) AS min_repr, MAX(c_event_type) AS max_repr
    FROM r
    UNION ALL
    SELECT 'props', COUNT(*)::BIGINT, (COUNT(*) - COUNT(c_props))::BIGINT,
           COUNT(DISTINCT c_props)::BIGINT, MIN(c_props), MAX(c_props)
    FROM r
    UNION ALL
    SELECT 'user_id', COUNT(*)::BIGINT, (COUNT(*) - COUNT(c_user_id))::BIGINT,
           COUNT(DISTINCT c_user_id)::BIGINT, MIN(c_user_id), MAX(c_user_id)
    FROM r
    UNION ALL
    SELECT 'value', COUNT(*)::BIGINT, (COUNT(*) - COUNT(c_value))::BIGINT,
           COUNT(DISTINCT c_value)::BIGINT, MIN(c_value), MAX(c_value)
    FROM r
"""

# shuffle-key skew audit: exact per-key counts then mergeable stats;
# Σc² (Simpson) and MAX(c) predict hash-partition imbalance
ORACLE_SQL["skew_audit"] = """
    WITH cu AS (SELECT COUNT(*)::BIGINT AS c FROM events GROUP BY user_id),
         ce AS (SELECT COUNT(*)::BIGINT AS c FROM events GROUP BY event_type)
    SELECT * FROM (
        SELECT 'event_type' AS key_col, COUNT(*)::BIGINT AS n_keys,
               CAST(SUM(c) AS BIGINT) AS n_rows, MAX(c) AS max_c,
               CAST(SUM(c * c) AS BIGINT) AS simpson
        FROM ce
        UNION ALL
        SELECT 'user_id', COUNT(*)::BIGINT, CAST(SUM(c) AS BIGINT),
               MAX(c), CAST(SUM(c * c) AS BIGINT)
        FROM cu
    ) ORDER BY key_col
"""

# sequence packing: global token prefix-sum in doc_id order over
# non-empty docs, then seq ids by integer division; token definition =
# the text_token_count regex
ORACLE_SQL["pack_sequences"] = r"""
    WITH n AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\s+'),
                               x -> x <> ''))::BIGINT AS n_tokens
        FROM documents
    ), nz AS (
        SELECT doc_id, n_tokens,
               (SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS tok_offset
        FROM n WHERE n_tokens > 0
    )
    SELECT doc_id, n_tokens, tok_offset,
           (tok_offset // 128)::BIGINT AS seq_first,
           ((tok_offset + n_tokens - 1) // 128)::BIGINT AS seq_last
    FROM nz
"""

# integer-surrogate BM25 (OR retrieval): idf = 1e6*(N-df)//(df+1),
# saturation = tf*1000//(tf+2) — integer floor division on both sides
ORACLE_SQL["bm25_topk"] = r"""
    WITH w AS (
        SELECT doc_id, u.w AS word
        FROM documents,
             UNNEST(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
                 AS u(w)
    ), m AS (
        SELECT doc_id, word, COUNT(*)::BIGINT AS tf
        FROM w WHERE word IN ('table', 'hash', 'sort')
        GROUP BY doc_id, word
    ), df AS (
        SELECT word, COUNT(*)::BIGINT AS df FROM m GROUP BY word
    ), nd AS (
        SELECT COUNT(*)::BIGINT AS n FROM documents
    )
    SELECT m.doc_id,
           SUM((1000000 * (nd.n - df.df) // (df.df + 1))
               * (m.tf * 1000 // (m.tf + 2)))::BIGINT AS score
    FROM m JOIN df USING (word) CROSS JOIN nd
    GROUP BY m.doc_id
    ORDER BY score DESC, m.doc_id
    LIMIT 20
"""

# TPC-H Q10 shape: returned-item revenue per customer, top-20 with
# nation; FLOOR-cents per line item on both sides
ORACLE_SQL["q10_returned"] = """
    WITH rev AS (
        SELECT l_orderkey,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                   )::BIGINT AS revenue_cents
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY l_orderkey
    ), bc AS (
        SELECT o.o_custkey, SUM(rev.revenue_cents)::BIGINT AS revenue_cents
        FROM rev JOIN orders o ON rev.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey
    )
    SELECT bc.o_custkey, c.c_name, n.n_name, bc.revenue_cents
    FROM bc JOIN customer c ON bc.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
    ORDER BY bc.revenue_cents DESC, bc.o_custkey
    LIMIT 20
"""

# in-degree histogram of the md5 doc graph incl. zero-in-degree nodes;
# same edge derivation as pagerank/triangle_count
ORACLE_SQL["graph_degree_hist"] = """
    WITH nodes AS (
        SELECT CAST(doc_id AS BIGINT) AS v FROM documents
    ), deg AS (
        SELECT v,
               1 + CAST(md5_number_lower(CAST(v AS VARCHAR) || '-d') % 3 AS BIGINT)
                   AS outdeg
        FROM nodes
    ), edges AS (
        SELECT d.v AS src,
               CAST(md5_number_lower(
                        CAST(d.v AS VARCHAR) || '-e' || CAST(t.j AS VARCHAR)
                    ) % (SELECT COUNT(*) FROM nodes) AS BIGINT) AS dst
        FROM deg d, UNNEST(range(0, d.outdeg)) AS t(j)
    ), indeg AS (
        SELECT n.v, COUNT(e.dst)::BIGINT AS in_degree
        FROM nodes n LEFT JOIN edges e ON e.dst = n.v
        GROUP BY n.v
    )
    SELECT in_degree, COUNT(*)::BIGINT AS n_nodes
    FROM indeg GROUP BY in_degree
    ORDER BY in_degree
"""

# langid confusion matrix: the text_score lang_pred CTE joined to the
# gold lang column (same stoplists, same en-first tiebreak)
ORACLE_SQL["langid_confusion"] = f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(lower(COALESCE(text, '')), '[A-Za-z]+') AS tk
      FROM documents
    ), hits AS (
      SELECT doc_id,
             len(list_filter(tk, t -> list_contains({_stoplist('en')}, t))) AS h_en,
             len(list_filter(tk, t -> list_contains({_stoplist('de')}, t))) AS h_de,
             len(list_filter(tk, t -> list_contains({_stoplist('fr')}, t))) AS h_fr,
             len(list_filter(tk, t -> list_contains({_stoplist('es')}, t))) AS h_es
      FROM toks
    ), scored AS (
      SELECT doc_id,
             CASE WHEN GREATEST(h_en, h_de, h_fr, h_es) = 0 THEN 'unknown'
                  WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
                  WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
                  WHEN h_fr >= h_es THEN 'fr'
                  ELSE 'es' END AS lang_pred
      FROM hits
    )
    SELECT d.lang, s.lang_pred, COUNT(*)::BIGINT AS n
    FROM documents d JOIN scored s USING (doc_id)
    GROUP BY d.lang, s.lang_pred
"""

# MOSS winnowing collisions: same Horner window hashes as
# text_fingerprint (16-char windows), winnowed by a ROWS-window MIN of
# every 8 consecutive hashes (global min when fewer than 8 windows),
# distinct per doc, pairs sharing >= 2 fingerprints
ORACLE_SQL["fingerprint_collisions"] = """
    WITH b AS (
      SELECT doc_id,
             list_transform(regexp_split_to_array(text, ''),
                            c -> CAST(unicode(c) + 1 AS HUGEINT)) AS ds,
             length(text) AS n
      FROM documents
    ), wins AS (
      SELECT doc_id, t.j AS j,
             list_reduce(list_prepend(CAST(0 AS HUGEINT),
                                      ds[CAST(t.j + 1 AS BIGINT):CAST(t.j + w AS BIGINT)]),
                         (acc, d) -> (acc * 1000003 + d)
                                     % CAST('18446744073709551616' AS HUGEINT)) AS v
      FROM (SELECT doc_id, ds, n, LEAST(16, n) AS w FROM b WHERE n > 0),
           UNNEST(range(0, n - w + 1)) AS t(j)
    ), sel AS (
      SELECT doc_id,
             MIN(v) OVER (PARTITION BY doc_id ORDER BY j
                          ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp,
             j,
             COUNT(*) OVER (PARTITION BY doc_id) AS c
      FROM wins
      QUALIFY (j + 8 <= c) OR (c < 8 AND j = 0)
    ), fps AS (
      SELECT DISTINCT doc_id, fp FROM sel
    )
    SELECT a.doc_id AS doc_id_a, b2.doc_id AS doc_id_b,
           COUNT(*)::BIGINT AS n_shared
    FROM fps a JOIN fps b2 ON a.fp = b2.fp AND a.doc_id < b2.doc_id
    GROUP BY doc_id_a, doc_id_b
    HAVING COUNT(*) >= 2
"""

# containment variant of the jaccard pair oracle: denominator is the
# smaller doc's shingle count (tau = 0.5 as 5 tenths)
ORACLE_SQL["dedup_containment"] = r"""
    WITH words AS (
        SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
        FROM documents
    ), sh0 AS (
        SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 3
        UNION ALL
        SELECT doc_id, array_to_string(ws, ' ') AS shingle
        FROM words WHERE len(ws) BETWEEN 1 AND 2
    ), dsh AS (
        SELECT DISTINCT doc_id, shingle FROM sh0
    ), cnt AS (
        SELECT doc_id, COUNT(*) AS c FROM dsh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS intersection
        FROM dsh a JOIN dsh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b, intersection
    FROM inter
    JOIN cnt ca ON ca.doc_id = inter.doc_id_a
    JOIN cnt cb ON cb.doc_id = inter.doc_id_b
    WHERE intersection * 10 >= 5 * LEAST(ca.c, cb.c)
"""

# per-(user, UTC-hour) burst screen (integer hour buckets, same
# epoch_us // 3.6e9 convention as w_tumbling)
ORACLE_SQL["event_bursts"] = """
    SELECT user_id, (epoch_us(ts) // 3600000000)::BIGINT AS hour,
           COUNT(*)::BIGINT AS n_events
    FROM events
    GROUP BY user_id, hour
    HAVING COUNT(*) >= 2
"""

# corpus-bigram LM predictability surrogate: per doc Σ over bigram
# tokens of (c(xy)*1e6)//c(x·) — integer floor division both sides;
# zipped parallel UNNESTs build (head, bigram) per position
ORACLE_SQL["lm_score"] = r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
        FROM documents
    ), b AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(ws)), i -> ws[i])) AS x,
               UNNEST(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS bg
        FROM t
    ), c1 AS (
        SELECT x, COUNT(*)::BIGINT AS cx FROM b GROUP BY x
    ), c2 AS (
        SELECT bg, COUNT(*)::BIGINT AS cxy FROM b GROUP BY bg
    ), s AS (
        SELECT b.doc_id, SUM((c2.cxy * 1000000) // c1.cx) AS v
        FROM b JOIN c1 USING (x) JOIN c2 USING (bg)
        GROUP BY b.doc_id
    )
    SELECT d.doc_id, COALESCE(s.v, 0)::BIGINT AS lm_score
    FROM documents d LEFT JOIN s USING (doc_id)
"""


ORACLE_SQL["event_transitions"] = """
    WITH s AS (
        SELECT event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    )
    SELECT event_type AS from_type, nxt AS to_type,
           COUNT(*)::BIGINT AS n
    FROM s WHERE nxt IS NOT NULL
    GROUP BY 1, 2
"""

ORACLE_SQL["cooccurrence_pairs"] = """
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*)::BIGINT AS n_users
    FROM d a JOIN d b USING (user_id)
    WHERE a.event_type < b.event_type
    GROUP BY 1, 2
"""

# keep in sync with windows.SEQUENCE_MATCH_PATTERN — lookahead-free so
# RE2 (DuckDB) and Python `re` agree
ORACLE_SQL["sequence_match"] = r"""
    WITH p AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id
    )
    SELECT user_id FROM p
    WHERE regexp_matches(path, '(?:^|>)view(?:>[a-df-z][a-z]*)*>purchase')
"""

ORACLE_SQL["scd2_intervals"] = """
    WITH s AS (
        SELECT user_id, event_type, epoch_us(ts) AS us,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id)
               AS isl
        FROM events
    )
    SELECT user_id, event_type AS state,
           MIN(us) AS valid_from_us, MAX(us) AS valid_to_us,
           COUNT(*)::BIGINT AS n_events
    FROM s GROUP BY user_id, event_type, isl
"""

ORACLE_SQL["s_except_all"] = """
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'view'
"""


ORACLE_SQL["attribution_last_touch"] = """
    WITH s AS (
        SELECT event_id, event_type,
               LAST_VALUE(
                   CASE WHEN event_type IN ('view', 'click')
                        THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
        FROM events
    )
    SELECT event_id AS purchase_id, COALESCE(touch, 'direct') AS channel
    FROM s WHERE event_type = 'purchase'
"""

ORACLE_SQL["active_users_rolling"] = """
    WITH hrs AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hr FROM events
    ), b AS (
        SELECT MIN(hr) AS mn, MAX(hr) AS mx FROM hrs
    ), grid AS (
        SELECT b.mn + r.x AS hr FROM b, UNNEST(range(0, b.mx - b.mn + 1)) AS r(x)
    )
    SELECT g.hr, COUNT(DISTINCT h.user_id)::BIGINT AS n_active
    FROM grid g JOIN hrs h ON h.hr BETWEEN g.hr - 23 AND g.hr
    GROUP BY g.hr
"""

# ExactSubstr duplicate-span REMOVAL (Lee et al. 2022): every duplicated
# 5-gram keeps only its minimal (doc_id, pos) occurrence; tokens covered
# by losing occurrences are removed. Mirrors the engine's gram-shard
# first-wins election (string grams here, 64-bit hashes there).
ORACLE_SQL["dedup_exact_substr"] = r"""
    WITH words AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
        FROM documents
    ), grams AS (
        SELECT doc_id, i - 1 AS pos,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                     || ' ' || ws[i+4] AS gram
        FROM words, UNNEST(range(1, len(ws) - 3)) AS t(i)
        WHERE len(ws) >= 5
    ), marked AS (
        SELECT doc_id, pos,
               COUNT(*) OVER (PARTITION BY gram) AS c,
               ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        FROM grams
    ), kills AS (
        SELECT doc_id, pos FROM marked WHERE c >= 2 AND rn > 1
    ), toks AS (
        SELECT doc_id, i - 1 AS tpos, ws[i] AS tok
        FROM words, UNNEST(range(1, len(ws) + 1)) AS t(i)
    ), removed AS (
        SELECT DISTINCT t.doc_id, t.tpos
        FROM toks t JOIN kills k
          ON t.doc_id = k.doc_id AND t.tpos >= k.pos AND t.tpos < k.pos + 5
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(r.tpos) AS BIGINT) AS n_removed,
           COALESCE(string_agg(CASE WHEN r.tpos IS NULL THEN t.tok END,
                               ' ' ORDER BY t.tpos), '') AS kept_text
    FROM toks t LEFT JOIN removed r
      ON t.doc_id = r.doc_id AND t.tpos = r.tpos
    GROUP BY t.doc_id
"""

# JSONL source round-trip: the engine reads a JSONL export of documents
# with ray.data.read_json and re-aggregates FROM THE DECODED TEXT; the
# oracle aggregates the original parquet — a hash match proves decode
# fidelity (unicode escapes included), not just row counts.
ORACLE_SQL["src_jsonl"] = """
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS sum_chars
    FROM documents GROUP BY source, lang
"""

# CSV source round-trip: floats cross the CSV boundary as shortest
# round-trip decimals, so integer cents match the parquet exactly.
ORACLE_SQL["src_csv"] = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY event_type
"""

# Multimodal + crawl-telemetry oracles over EXPORTED parquet (round-5
# VERDICT #7): DuckDB cannot decode GIFs or run a crawl, but it CAN
# check (a) pure string predicates against the generator-intent caption
# manifest, (b) decoded GIF frame metadata against the generator-intent
# frame manifest, and (c) the distributed fetch-log rollup against a
# flat GROUP BY over the exported per-page log. The manifests are
# written by queries() (generator side, no codec involved); the log is
# exported by the query itself (and the raw log is pinned ≡ refsim in
# tests/test_crawl_golden.py).
ORACLE_SQL["mm_caption_filter"] = r"""
    SELECT image_id, w, h, fmt, caption,
           CAST(length(regexp_extract_all(caption, '\S+')) AS BIGINT)
               AS n_cap_tokens
    FROM read_parquet('/tmp/crawlkit_oracle/captions.parquet')
    WHERE length(regexp_extract_all(caption, '\S+')) >= 7
      AND length(regexp_extract_all(caption, '[A-Za-z]')) * 100
          >= length(caption) * 50
"""

ORACLE_SQL["mm_gif_frames_meta"] = """
    SELECT gif_id, frame_idx, delay_cs, w, h
    FROM read_parquet('/tmp/crawlkit_oracle/gif_manifest.parquet')
    WHERE frame_idx % 2 = 0
"""

ORACLE_SQL["crawl_fetch_report"] = """
    SELECT host, status,
           CAST(COUNT(*) AS BIGINT) AS pages,
           CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
           CAST(SUM(attempts) AS BIGINT) AS total_attempts,
           CAST(SUM(CASE WHEN error <> '' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_errors
    FROM read_parquet('/tmp/crawlkit_oracle/fetch_log_t1.parquet')
    GROUP BY host, status
"""
