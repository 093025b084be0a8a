#!/usr/bin/env python3
"""Single-node context numbers: time DuckDB (the reference's host engine)
running SQL equivalents of the headline bench queries on the same
parquet, for BENCH_CONTEXT.md. Usage: bench_duckdb.py [sf_dir]"""
import sys, time, json, duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
import os

def fresh_connection():
    c = duckdb.connect()
    # an in-memory connection cannot spill without a temp dir — the sf100
    # text twins (185M-pair LM join, 46M-line string_agg) OOM'd without
    # it — and the dir must EXIST or spilling silently fails back to OOM
    spill = os.environ.get("TMPDIR", "/tmp") + "/duckdb_bench_spill"
    os.makedirs(spill, exist_ok=True)
    c.execute(f"PRAGMA temp_directory='{spill}'")
    # the big unnest/list pipelines hold per-thread ordered buffers that
    # neither spill nor shrink; dropping insertion-order preservation is
    # DuckDB's documented memory valve (results are aggregates or carry
    # their own ORDER BY, so output is unaffected)
    c.execute("PRAGMA preserve_insertion_order=false")
    for t in ["lineitem", "orders", "documents", "embeddings", "events"]:
        # scale dirs generated for the heavy tiers carry only the fact/dim
        # tables — attach what exists; a filtered run only needs its own views
        if os.path.exists(f"{sf}/{t}.parquet"):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return c

con = fresh_connection()

queries = {
    "q01_pricing": """
      SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2), round(avg(l_extendedprice),2),
             round(avg(l_extendedprice*(1-l_discount)),2), count(*)
      FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
    # flat numeric part of the 4num cofactor: 4 sums + 10 pairwise products
    "cofactor_numeric_flat": """
      SELECT count(*), sum(l_quantity), sum(l_extendedprice), sum(l_discount), sum(l_tax),
             sum(l_quantity*l_quantity), sum(l_quantity*l_extendedprice), sum(l_quantity*l_discount),
             sum(l_quantity*l_tax), sum(l_extendedprice*l_extendedprice),
             sum(l_extendedprice*l_discount), sum(l_extendedprice*l_tax),
             sum(l_discount*l_discount), sum(l_discount*l_tax), sum(l_tax*l_tax)
      FROM lineitem""",
    # what the full triple additionally delivers: categorical blocks
    # (expressed as the group-bys a SQL user would need)
    "cofactor_full_equivalent": """
      WITH t AS (SELECT l_quantity q, l_extendedprice e, l_discount d, l_tax x,
                        l_linenumber c1, year(l_shipdate) c2 FROM lineitem)
      SELECT
        (SELECT count(*) FROM t),
        (SELECT sum(q*e + q*d + e*d + q*x) FROM t),
        (SELECT count(*) FROM (SELECT c1, count(*), sum(q), sum(e), sum(d), sum(x) FROM t GROUP BY c1)),
        (SELECT count(*) FROM (SELECT c2, count(*), sum(q), sum(e), sum(d), sum(x) FROM t GROUP BY c2)),
        (SELECT count(*) FROM (SELECT c1, c2, count(*) FROM t GROUP BY c1, c2))""",
    # the filtered-cofactor bench row's WHERE over the same full-triple
    # equivalent (graft: cofactor_filtered / sf100_cofactor_filtered)
    "cofactor_filtered_equivalent": """
      WITH t AS (SELECT l_quantity q, l_extendedprice e, l_discount d, l_tax x,
                        l_linenumber c1, year(l_shipdate) c2 FROM lineitem
                 WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
                   AND l_quantity < 30)
      SELECT
        (SELECT count(*) FROM t),
        (SELECT sum(q*e + q*d + e*d + q*x) FROM t),
        (SELECT count(*) FROM (SELECT c1, count(*), sum(q), sum(e), sum(d), sum(x) FROM t GROUP BY c1)),
        (SELECT count(*) FROM (SELECT c2, count(*), sum(q), sum(e), sum(d), sum(x) FROM t GROUP BY c2)),
        (SELECT count(*) FROM (SELECT c1, c2, count(*) FROM t GROUP BY c1, c2))""",
    # grouped full-quad cofactor by l_linenumber (graft:
    # cofactor_grouped_columnar / sf100_cofactor_grouped_columnar):
    # per-group count + 4 sums + 10 pairwise products
    "cofactor_grouped_equivalent": """
      SELECT l_linenumber, count(*),
             sum(l_quantity), sum(l_extendedprice), sum(l_discount), sum(l_tax),
             sum(l_quantity*l_quantity), sum(l_quantity*l_extendedprice),
             sum(l_quantity*l_discount), sum(l_quantity*l_tax),
             sum(l_extendedprice*l_extendedprice), sum(l_extendedprice*l_discount),
             sum(l_extendedprice*l_tax), sum(l_discount*l_discount),
             sum(l_discount*l_tax), sum(l_tax*l_tax)
      FROM lineitem GROUP BY 1""",
    # grouped cofactor by the WIDE string key o_orderpriority (graft:
    # cofactor_grouped_dict / sf100_cofactor_grouped_dict — the
    # dictionary-label kernel route): count + 2 sums + 3 pairwise
    # products per group over orders
    "cofactor_grouped_dict_equivalent": """
      SELECT o_orderpriority, count(*),
             sum(o_totalprice), sum(o_custkey),
             sum(o_totalprice*o_totalprice), sum(o_totalprice*o_custkey),
             sum(CAST(o_custkey AS DOUBLE)*o_custkey)
      FROM orders GROUP BY 1""",
    # multi-key grouped cofactor by (l_returnflag, l_linestatus)
    # (graft: cofactor_grouped_multikey / sf100_cofactor_grouped_multikey):
    # the same 15 sums per KEY PAIR — DuckDB's perfect-hash grouped
    # aggregate on two low-cardinality keys, its best case
    "cofactor_grouped_multikey_equivalent": """
      SELECT l_returnflag, l_linestatus, count(*),
             sum(l_quantity), sum(l_extendedprice), sum(l_discount), sum(l_tax),
             sum(l_quantity*l_quantity), sum(l_quantity*l_extendedprice),
             sum(l_quantity*l_discount), sum(l_quantity*l_tax),
             sum(l_extendedprice*l_extendedprice), sum(l_extendedprice*l_discount),
             sum(l_extendedprice*l_tax), sum(l_discount*l_discount),
             sum(l_discount*l_tax), sum(l_tax*l_tax)
      FROM lineitem GROUP BY 1, 2""",
    # grouped FULL MIXED triple by l_linenumber (graft:
    # tools.GroupedMixedProbe — 4 numerics + 2 categoricals riding the
    # columnar kernel in ONE scan). The honest SQL equivalent needs FOUR
    # grouped aggregations over the fact: the flat 15 sums per group,
    # count+4 sums per (group, cat) for EACH cat column (the triple's
    # lin_cat + num-cat blocks), and cross counts per (group, c1, c2)
    # (the cat-cat quad block). cofactor_grouped_equivalent above is
    # DuckDB's best case; this is the operator's actual workload.
    "cofactor_grouped_mixed_equivalent": """
      WITH t AS (SELECT l_linenumber k, l_quantity q, l_extendedprice e,
                        l_discount d, l_tax x,
                        l_returnflag c1, year(l_shipdate) c2 FROM lineitem),
      flat AS (SELECT k, count(*) n, sum(q) s1, sum(e) s2, sum(d) s3, sum(x) s4,
                      sum(q*q) p1, sum(q*e) p2, sum(q*d) p3, sum(q*x) p4,
                      sum(e*e) p5, sum(e*d) p6, sum(e*x) p7,
                      sum(d*d) p8, sum(d*x) p9, sum(x*x) p10
               FROM t GROUP BY k),
      m1 AS (SELECT k, c1, count(*) n, sum(q) s1, sum(e) s2, sum(d) s3, sum(x) s4
             FROM t GROUP BY k, c1),
      m2 AS (SELECT k, c2, count(*) n, sum(q) s1, sum(e) s2, sum(d) s3, sum(x) s4
             FROM t GROUP BY k, c2),
      p12 AS (SELECT k, c1, c2, count(*) n FROM t GROUP BY k, c1, c2)
      SELECT flat.k, flat.n, flat.s1 + flat.p2,
             (SELECT count(*) FROM m1 WHERE m1.k = flat.k),
             (SELECT sum(s1 + n) FROM m1 WHERE m1.k = flat.k),
             (SELECT count(*) FROM m2 WHERE m2.k = flat.k),
             (SELECT sum(s1 + n) FROM m2 WHERE m2.k = flat.k),
             (SELECT sum(n) FROM p12 WHERE p12.k = flat.k)
      FROM flat ORDER BY flat.k""",
    "factorized_join": """
      SELECT count(*), sum(l_quantity), avg(o_totalprice), avg(l_quantity*o_totalprice)
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
    "knn_bruteforce": """
      SELECT qId, cId, rank FROM (
        SELECT a.vec_id qId, b.vec_id cId,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY list_cosine_similarity(a.embedding,b.embedding) DESC, b.vec_id) rank
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 20) WHERE rank <= 3""",
    # int8-quantized knn (graft's knn_int8 counterpart: same grid, search
    # over the quantized lists, quantization cost included)
    "knn_int8": """
      WITH qz AS (
        SELECT vec_id,
               list_transform(embedding, x ->
                 floor(x::DOUBLE * (CASE WHEN mx > 1e-300 THEN 127.0/mx ELSE 0.0 END) + 0.5)) q
        FROM (SELECT vec_id, embedding,
                     list_max(list_transform(embedding, x -> abs(x::DOUBLE))) mx
              FROM embeddings))
      SELECT qId, cId, rank FROM (
        SELECT a.vec_id qId, b.vec_id cId,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY list_cosine_similarity(a.q,b.q) DESC, b.vec_id) rank
        FROM qz a JOIN qz b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 20) WHERE rank <= 3""",
    "window_running": """
      SELECT l_suppkey, rn, run_qty FROM (
        SELECT l_suppkey, row_number() OVER w rn,
               sum(l_quantity) OVER (w ROWS UNBOUNDED PRECEDING) run_qty
        FROM lineitem WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber))
      WHERE rn <= 3""",
    "text_stats": """
      SELECT doc_id, len(string_split_regex(trim(text), '[\\t\\n\\x0B\\f\\r ]+')),
             len(list_distinct(string_split_regex(trim(text), '[\\t\\n\\x0B\\f\\r ]+'))), length(text)
      FROM documents""",
    # the fused byte-level text kernels (graft: sf10_lang_id /
    # sf10_quality_score — q13/q12's oracle SQL, the honest DuckDB
    # formulation of the same heuristics). minhash_prepare has no SQL
    # equivalent (signature+band arrays), so that row is graft-only.
    "lang_id": """
      WITH langs(lang, words) AS (VALUES
        ('de', ['der','die','das','und','ist','nicht','ein','eine','mit','für','auf','von']),
        ('en', ['the','a','of','and','to','in','is','it','that','for','on','with','as']),
        ('es', ['el','la','los','las','y','es','un','una','para','en','que','de']),
        ('fr', ['le','la','les','et','est','un','une','pour','dans','que','des','du']),
        ('it', ['il','lo','la','e','è','un','una','per','che','di','non','con'])),
      tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '[\\t\\n\\x0B\\f\\r ]+') AS ts
              FROM documents),
      scored AS (SELECT doc_id, lang,
                        len(list_filter(ts, t -> list_contains(words, t))) AS score
                 FROM tok, langs),
      best AS (SELECT doc_id, lang, score,
                      row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, lang DESC) AS rn
               FROM scored)
      SELECT CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred,
             count(*) AS cnt
      FROM best WHERE rn = 1
      GROUP BY 1 ORDER BY lang_pred""",
    # top-100 vocabulary (graft: sf10_top_terms)
    "top_terms": """
      SELECT term, count(*) AS n FROM (
        SELECT unnest(list_filter(
          string_split_regex(text, '[\t\n\x0B\f\r ]+'), x -> x <> '')) AS term
        FROM documents)
      GROUP BY 1 ORDER BY n DESC, term ASC LIMIT 100""",
    # 2004-term blocklist stats (graft: sf10_blocklist): DuckDB's
    # natural plan for a large term set — unnest + hash join against
    # the generated list, then per-doc re-aggregate
    "blocklist": """
      WITH bl AS (
        SELECT 'term' || i || 'x' || (i % 7) AS term FROM range(2000) t(i)
        UNION ALL SELECT unnest(['hash', 'join', 'slow', 'customer'])),
      tok AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(text, '[\t\n\x0B\f\r ]+'), x -> x <> '')) AS term
        FROM documents)
      SELECT count(*), sum(m) FROM (
        SELECT tok.doc_id, count(bl.term) AS m
        FROM tok LEFT JOIN bl USING (term) GROUP BY 1)""",
    # Okapi BM25 3-term scoring (graft: sf10_bm25 — q87's oracle shape
    # over the full tier)
    "bm25": """
      WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
                           x -> x <> '') AS ts
        FROM documents),
      dl AS (SELECT doc_id, len(ts) AS dl, ts FROM d),
      stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
      tf AS (
        SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, dl, unnest(ts) AS term FROM dl)
        WHERE term IN ('hash', 'join', 'vector') GROUP BY 1, 2, 3),
      idf AS (
        SELECT term, ln((stats.n - dft + 0.5) / (dft + 0.5) + 1) AS idf
        FROM (SELECT term, count(DISTINCT doc_id) AS dft FROM tf GROUP BY 1), stats)
      SELECT count(*), sum(s) FROM (
        SELECT tf.doc_id,
               sum(idf.idf * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))) AS s
        FROM tf JOIN idf USING (term), stats GROUP BY 1)""",
    # duplicated 3-gram mining (graft: sf10_dup_ngrams — q92's oracle
    # shape at top-100): per-doc distinct 3-grams, doc-frequency count
    "dup_ngrams": """
      WITH tok AS (
        SELECT doc_id, list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
                                   x -> x <> '') AS ts
        FROM documents),
      g AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(len(ts) - 2, 1) + 1),
          i -> array_to_string(ts[i:least(i + 2, len(ts))], ' ')))) AS ngram
        FROM tok WHERE len(ts) > 0)
      SELECT ngram, count(*) AS n_docs
      FROM g GROUP BY 1 HAVING count(*) >= 2
      ORDER BY n_docs DESC, ngram ASC LIMIT 100""",
    # exact-substring dedup end to end (graft: sf10_dup_span_removal —
    # q94's oracle shape at minDocs=8): mine duplicated 3-grams, cover
    # every occurrence, rebuild survivors
    "dup_span_removal": """
      WITH tok AS (
        SELECT doc_id, list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
                                   x -> x <> '') AS ts
        FROM documents WHERE text IS NOT NULL),
      dup AS (
        SELECT ngram FROM (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, greatest(len(ts) - 2, 1) + 1),
            i -> array_to_string(ts[i:least(i + 2, len(ts))], ' ')))) AS ngram
          FROM tok WHERE len(ts) > 0)
        GROUP BY 1 HAVING count(*) >= 8),
      w AS (
        SELECT doc_id, i, least(i + 2, len(ts)) AS e,
               array_to_string(ts[i:least(i + 2, len(ts))], ' ') AS ngram
        FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 2, 1) + 1)) AS i
              FROM tok WHERE len(ts) > 0)),
      cov AS (
        SELECT DISTINCT doc_id, pos FROM (
          SELECT w.doc_id, unnest(range(w.i, w.e + 1)) AS pos
          FROM w JOIN dup USING (ngram))),
      pos AS (
        SELECT doc_id, pos, ts[pos] AS tok
        FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS pos
              FROM tok WHERE len(ts) > 0)),
      clean AS (
        SELECT p.doc_id,
               coalesce(string_agg(CASE WHEN c.pos IS NULL THEN p.tok END,
                                   ' ' ORDER BY p.pos), '') AS clean_text,
               count(c.pos) AS n_removed, count(*) AS n_tokens
        FROM pos p LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.pos = c.pos
        GROUP BY p.doc_id)
      SELECT count(*), sum(n_removed), sum(n_tokens), sum(length(clean_text))
      FROM clean""",
    # token-budget chunking (graft: sf10_chunk_text — q82's oracle shape
    # minus the ORDER BY, the same verbatim window recompute)
    "chunk_text": """
      WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '[\\t\\n\\x0B\\f\\r ]+') AS ts
        FROM documents WHERE length(trim(text)) > 0),
      chunks AS (
        SELECT doc_id,
               CAST((s - 1) / 56 AS BIGINT) AS chunk_idx,
               array_to_string(list_slice(ts, CAST(s AS BIGINT), least(s + 63, len(ts))), ' ') AS chunk
        FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1, 56)) AS s FROM tok)
        WHERE s = 1 OR s + 7 < len(ts))
      SELECT doc_id, chunk_idx, length(chunk) FROM chunks""",
    "quality_score": """
      SELECT doc_id,
             floor(least(1.0, length(text) / 500.0)
                   * (len(list_distinct(string_split_regex(trim(text), '[\\t\\n\\x0B\\f\\r ]+')))::DOUBLE
                      / len(string_split_regex(trim(text), '[\\t\\n\\x0B\\f\\r ]+')))
                   * greatest(0.0, 1.0 - (len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE
                                          / length(text)) * 4.0)
                   * 10000 + 0.5) / 10000 AS quality
      FROM documents ORDER BY doc_id""",
    # DuckDB's NATIVE asof / inequality joins (graft: q44 / q46)
    "asof_join": """
      WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
      c AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'click'),
      v AS (SELECT user_id, t AS vt, max(event_id) AS v_eid
            FROM e WHERE event_type = 'view' GROUP BY 1, 2)
      SELECT c.event_id, coalesce(v.v_eid, -1), coalesce(c.t - v.vt, -1)
      FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.vt <= c.t""",
    "range_join": """
      WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
      err AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'error'),
      c AS (SELECT user_id, t FROM e WHERE event_type = 'click')
      SELECT err.event_id, count(c.t)
      FROM err LEFT JOIN c
        ON c.user_id = err.user_id AND c.t BETWEEN err.t - 300000000 AND err.t
      GROUP BY err.event_id""",
    # bigram-LM quality scoring end to end (graft: sf10_lm_score —
    # q98's shape minus ORDER BY: retrain the add-1 model in SQL, score
    # via the pairs ⋈ counts join)
    "lm_score": """
      WITH tok AS (
        SELECT doc_id, list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
                                   x -> x <> '') AS ts
        FROM documents WHERE text IS NOT NULL),
      uni AS (
        SELECT t AS w, count(*) AS c
        FROM (SELECT unnest(ts) AS t FROM tok) GROUP BY 1),
      v AS (SELECT CAST(count(*) AS DOUBLE) AS nv FROM uni),
      pairs AS (
        SELECT doc_id, ts[i] AS pw, ts[i + 1] AS w
        FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
              FROM tok WHERE len(ts) >= 2)),
      big AS (SELECT pw, w, count(*) AS c FROM pairs GROUP BY 1, 2)
      SELECT count(*), sum(s) FROM (
        SELECT p.doc_id, avg(-ln((coalesce(b.c, 0) + 1.0) / (u.c + v.nv))) AS s
        FROM pairs p
        JOIN uni u ON u.w = p.pw
        LEFT JOIN big b ON b.pw = p.pw AND b.w = p.w
        CROSS JOIN v GROUP BY p.doc_id)""",
    # C4 line filter over the 4-token-chunk derived corpus (graft:
    # sf10_dedup_lines — q97's shape minus ORDER BY)
    "dedup_lines": """
      WITH tok AS (
        SELECT doc_id, list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
                                   x -> x <> '') AS ts
        FROM documents WHERE text IS NOT NULL),
      lines AS (
        SELECT doc_id, CAST((s - 1) / 4 AS BIGINT) AS pos,
               array_to_string(list_slice(ts, CAST(s AS BIGINT), least(s + 3, len(ts))), ' ') AS line
        FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1, 4)) AS s
              FROM tok WHERE len(ts) > 0)),
      dup AS (SELECT line FROM lines GROUP BY 1 HAVING count(*) >= 2),
      agg AS (
        SELECT l.doc_id,
               coalesce(string_agg(CASE WHEN d.line IS NULL THEN l.line END,
                                   chr(10) ORDER BY l.pos), '') AS clean,
               count(d.line) AS n_removed, count(*) AS n_lines
        FROM lines l LEFT JOIN dup d USING (line) GROUP BY l.doc_id)
      SELECT count(*), sum(n_removed), sum(n_lines), sum(length(clean)) FROM agg""",
    # Gopher word rules (graft: sf10_gopher_rules — q99's shape minus
    # ORDER BY, metrics + composed keep)
    "gopher_rules": """
      WITH t AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
                           x -> x <> '') AS ts
        FROM documents),
      m AS (
        SELECT doc_id, len(ts) AS n_tokens,
               coalesce(list_sum(list_transform(ts, x -> strlen(x))), 0) AS n_chars,
               coalesce(list_sum(list_transform(ts,
                 x -> CASE WHEN regexp_matches(x, '[A-Za-z]') THEN 1 ELSE 0 END)), 0) AS n_alpha,
               len(list_intersect(list_distinct(ts),
                 ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS n_stop,
               (strlen(text) - strlen(replace(text, '#', '')))
               + (strlen(text) - strlen(replace(text, '...', ''))) / 3 AS n_sym
        FROM t)
      SELECT count(*), sum(CASE WHEN
               n_tokens >= 10 AND n_tokens <= 100000
               AND CAST(n_chars AS DOUBLE) / n_tokens >= 3.0
               AND CAST(n_chars AS DOUBLE) / n_tokens <= 10.0
               AND CAST(n_sym AS DOUBLE) / n_tokens < 0.1
               AND CAST(n_alpha AS DOUBLE) / n_tokens >= 0.8
               AND n_stop >= 1 THEN 1 ELSE 0 END)
      FROM m""",
    # deterministic mixture composition (graft: sf10_corpus_mix —
    # q96's shape minus ORDER BY, incl. the mix_key re-derive)
    "corpus_mix": """
      WITH w AS (
        SELECT * FROM (VALUES ('src0', 2, 2147483648),
                              ('src1', 1, 0),
                              ('src2', 0, 1073741824)) AS t(source, fl, th)),
      h AS (
        SELECT doc_id, source, CAST(xor(h2, h2 >> 13) AS BIGINT) AS hash
        FROM (
          SELECT doc_id, source,
                 CAST((CAST(xor(h1, h1 >> 16) AS HUGEINT) * 2246822519)
                      % 4294967296 AS BIGINT) AS h2
          FROM (
            SELECT doc_id, source,
                   CAST((((CAST(doc_id AS HUGEINT) % 4294967296) + 4294967296)
                          % 4294967296 * 2654435761)
                        % 4294967296 AS BIGINT) AS h1
            FROM documents))),
      kept AS (
        SELECT h.doc_id, h.source, ep.epoch,
               xor(h.doc_id, (CAST(ep.epoch AS BIGINT) + 1) * 2654435761) AS mk
        FROM h JOIN w USING (source)
        JOIN (SELECT CAST(unnest([0, 1, 2]) AS INT) AS epoch) ep
          ON ep.epoch <= w.fl
        WHERE ep.epoch < w.fl OR h.hash < w.th)
      SELECT count(*), sum(mix_key) FROM (
        SELECT CAST(xor(k2, k2 >> 13) AS BIGINT) AS mix_key
        FROM (
          SELECT CAST((CAST(xor(k1, k1 >> 16) AS HUGEINT) * 2246822519)
                      % 4294967296 AS BIGINT) AS k2
          FROM (
            SELECT CAST((((CAST(mk AS HUGEINT) % 4294967296) + 4294967296)
                          % 4294967296 * 2654435761)
                        % 4294967296 AS BIGINT) AS k1
            FROM kept)))""",
    # graft: sf10_quantile_cut / sf100_quantile_cut — DuckDB's natural
    # plan for the same shape of exact cut (its own quantile aggregate
    # for the threshold, then the filter; rank differs by 1 from
    # graft's n-ceil(0.1n)+1 — timing context, the q104 oracle owns
    # value parity)
    "quantile_cut": """
      WITH t AS (SELECT quantile_disc(n_chars, 0.9) AS th FROM documents)
      SELECT count(*), sum(n_chars) FROM documents, t WHERE n_chars >= th""",
    # graft: sf100_source_cap — the window formulation over the pinned
    # portable hash (survivors must MATCH graft's, so the hash recompute
    # is part of the honest cost)
    "source_cap": """
      WITH h AS (
        SELECT doc_id, source, CAST(xor(h2, h2 >> 13) AS BIGINT) AS hash
        FROM (
          SELECT doc_id, source,
                 CAST((CAST(xor(h1, h1 >> 16) AS HUGEINT) * 2246822519)
                      % 4294967296 AS BIGINT) AS h2
          FROM (
            SELECT doc_id, source,
                   CAST((((CAST(doc_id AS HUGEINT) % 4294967296) + 4294967296)
                          % 4294967296 * 2654435761)
                        % 4294967296 AS BIGINT) AS h1
            FROM documents))),
      r AS (
        SELECT doc_id,
               row_number() OVER (PARTITION BY source ORDER BY hash, doc_id) AS rn
        FROM h)
      SELECT count(*), sum(doc_id) FROM r WHERE rn <= 10000""",
}

only = set(sys.argv[2:])  # optional query-name filter: time just these rows
out = {}
for name, sql in queries.items():
    if only and name not in only:
        continue
    times = []
    try:
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            times.append(time.time() - t0)
        out[name] = round(sorted(times)[1], 3)
    except Exception as e:
        # one pathological row (e.g. an OOM at a scale the engine can't
        # hold) must not erase the rest of the run's numbers — and a real
        # OOM poisons the connection, so rebuild it for the next row
        out[name] = f"FAILED: {type(e).__name__}"
        print(f"[duckdb-bench] {name} failed: {e}", file=sys.stderr)
        try:
            con.close()
        except Exception:
            pass
        import gc
        gc.collect()  # the dead instance's buffers must release first
        con = fresh_connection()
print(json.dumps({"engine": "duckdb-" + duckdb.__version__, "sf": sf, "queries": out}))
