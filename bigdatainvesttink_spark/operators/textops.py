"""Text analysis over ``documents`` (SURVEY.md §2-D4): quality scoring,
language-ID heuristic, BPE-ish token counting, and document fingerprinting.

All token math stays JVM-side via higher-order array functions (split /
filter / transform / aggregate) — no Python in the hot path; ratios are
exact integer divisions in float64 so the DuckDB oracle matches bitwise.
Everything is a single scan + narrow projection at any scale (the fingerprint
adds one hash-shuffle on doc_id from posexplode/groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import stable_hash60, tokenize
from ..io import load_table
from ..registry import query

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")

# Marker-token vocabularies for the language-ID heuristic. The fixture corpus
# is synthetic word soup; these partition its vocabulary into three "dialects"
# so the n-gram-counting machinery is exercised with a deterministic answer.
LANG_MARKERS = {
    "english": ("the", "a", "of", "fast", "slow", "small", "big"),
    "database": ("table", "query", "scan", "join", "filter", "hash", "sort"),
    "streaming": ("spark", "stream", "window", "batch", "row", "vector"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


# --------------------------------------------------------------------------
# D4a: quality scoring — length/distinct/stopword ratios per document.
@query(
    "d4_text_quality",
    oracle=f"""
        SELECT doc_id, lang, source, n_chars,
               n_tokens, n_distinct,
               CASE WHEN n_tokens > 0
                    THEN CAST(n_distinct AS DOUBLE) / n_tokens END AS ttr,
               CASE WHEN n_tokens > 0
                    THEN CAST(sum_len AS DOUBLE) / n_tokens END AS mean_token_len,
               CASE WHEN n_tokens > 0
                    THEN CAST(n_stop AS DOUBLE) / n_tokens END AS stopword_ratio
        FROM (
            SELECT doc_id, lang, source, n_chars,
                   len(toks) AS n_tokens,
                   len(list_distinct(toks)) AS n_distinct,
                   list_sum([length(t) FOR t IN toks]) AS sum_len,
                   len(list_filter(toks,
                       t -> list_contains([{_sql_list(STOPWORDS)}], t))) AS n_stop
            FROM (
                SELECT doc_id, lang, source, n_chars,
                       list_filter(string_split(text, ' '), t -> t <> '') AS toks
                FROM documents
            ) t
        ) m
    """,
)
def d4_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokenize("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size("toks")
    n_distinct = F.size(F.array_distinct("toks"))
    sum_len = F.aggregate(
        F.transform("toks", lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n_stop = F.size(F.filter("toks", lambda t: F.array_contains(stop_arr, t)))
    ratio = lambda num: F.when(  # noqa: E731
        n_tokens > 0, num.cast("double") / n_tokens
    )
    return d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        ratio(n_distinct).alias("ttr"),
        ratio(sum_len).alias("mean_token_len"),
        ratio(n_stop).alias("stopword_ratio"),
    )


# --------------------------------------------------------------------------
# D4b: language-ID heuristic — marker-token voting with deterministic
# tie-break (english > database > streaming on equal votes).
@query(
    "d4_lang_id",
    oracle=f"""
        SELECT doc_id,
               s_en AS score_english, s_db AS score_database,
               s_st AS score_streaming,
               CASE WHEN s_en = 0 AND s_db = 0 AND s_st = 0 THEN 'unknown'
                    WHEN s_en >= s_db AND s_en >= s_st THEN 'english'
                    WHEN s_db >= s_st THEN 'database'
                    ELSE 'streaming' END AS predicted
        FROM (
            SELECT doc_id,
                   len(list_filter(toks, t -> list_contains([{_sql_list(LANG_MARKERS['english'])}], t))) AS s_en,
                   len(list_filter(toks, t -> list_contains([{_sql_list(LANG_MARKERS['database'])}], t))) AS s_db,
                   len(list_filter(toks, t -> list_contains([{_sql_list(LANG_MARKERS['streaming'])}], t))) AS s_st
            FROM (
                SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
                FROM documents
            ) t
        ) scores
    """,
)
def d4_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokenize("text"))

    def score(words) -> F.Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter("toks", lambda t: F.array_contains(arr, t)))

    s_en = score(LANG_MARKERS["english"])
    s_db = score(LANG_MARKERS["database"])
    s_st = score(LANG_MARKERS["streaming"])
    scored = d.select(
        "doc_id",
        s_en.alias("score_english"),
        s_db.alias("score_database"),
        s_st.alias("score_streaming"),
    )
    e, db, st = (
        F.col("score_english"),
        F.col("score_database"),
        F.col("score_streaming"),
    )
    predicted = (
        F.when((e == 0) & (db == 0) & (st == 0), "unknown")
        .when((e >= db) & (e >= st), "english")
        .when(db >= st, "database")
        .otherwise("streaming")
    )
    return scored.withColumn("predicted", predicted)


# --------------------------------------------------------------------------
# D4c: token counting — whitespace tokens and a BPE-ish regex segmentation
# (letter runs / digit runs / single non-alphanumeric marks), the standard
# pre-tokenizer shape for LLM data pipelines.
@query(
    "d4_token_count",
    oracle=r"""
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), t -> t <> '')) AS ws_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens,
               length(text) AS n_chars_actual
        FROM documents
    """,
)
def d4_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(tokenize("text")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


# --------------------------------------------------------------------------
# D4d: document fingerprint — position-weighted rolling hash over the token
# stream: fp = sum_i (h(tok_i) % p) * w_i mod p, w_i = ((i+1)*2654435761) % p
# reduced per-term so every intermediate stays < 2^63 (ANSI-overflow safe).
@query(
    "d4_fingerprint",
    oracle="""
        SELECT doc_id,
               CAST(list_sum([
                   ((CAST(CAST('0x' || substr(md5(toks[i+1]), 1, 15) AS UBIGINT) AS BIGINT)
                     % 2147483647)
                    * (((i + 1) * 2654435761) % 2147483647)) % 2147483647
                   FOR i IN range(len(toks))
               ]) % 2147483647 AS BIGINT) AS fingerprint,
               len(toks) AS n_tokens
        FROM (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
        ) t
        WHERE len(toks) > 0
    """,
)
def d4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = 2_147_483_647
    d = (
        _docs(spark, sf_dir)
        .withColumn("toks", tokenize("text"))
        .filter(F.size("toks") > 0)
    )
    exploded = d.select("doc_id", F.posexplode("toks").alias("i", "tok"))
    term = (
        (stable_hash60("tok") % p) * (((F.col("i") + 1) * 2654435761) % p)
    ) % p
    return (
        exploded.withColumn("term", term)
        .groupBy("doc_id")
        .agg(
            (F.sum("term") % p).alias("fingerprint"),
            F.count("*").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# D4e: TF-IDF — term importance per document, top-3 terms each, built from
# two hash aggregations + a broadcast of the (tiny) document-frequency
# table. At 100 TB the df table is vocab-sized, so the broadcast holds; the
# token shuffle is the classic inverted-index cost. ln() differs by ulps
# across libm implementations, so scores are 6dp-rounded and ranked with a
# token tiebreak (functions/core.py float policy).
@query(
    "d4_tfidf_top_terms",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                              t -> t <> '')) AS token
            FROM documents WHERE text <> ''
        ), tf AS (
            SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
        ), df AS (
            SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token
        ), n AS (
            SELECT COUNT(*) AS n_docs FROM documents WHERE text <> ''
        ), scored AS (
            SELECT tf.doc_id, tf.token, tf.tf, df.df,
                   round(tf.tf * ln((CAST(n.n_docs AS DOUBLE) + 1.0)
                                    / (CAST(df.df AS DOUBLE) + 1.0)), 6) AS tfidf
            FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
        )
        SELECT doc_id, token, tf, df, tfidf, rnk FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rnk
            FROM scored
        ) r WHERE rnk <= 3
    """,
)
def d4_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = (
        _docs(spark, sf_dir)
        .filter(F.col("text") != "")
        .withColumn("toks", tokenize("text"))
    )
    toks = d.select("doc_id", F.explode("toks").alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_tbl = toks.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = d.agg(F.count("*").alias("n_docs"))
    # the document-frequency table is VOCABULARY-sized — sublinear in
    # corpus (Heaps' law) but data-derived, so the hint gates on the
    # footer token bound (r9 broadcast audit); past the cap the join
    # shuffles on token, the standard TF-IDF plan at corpus scale
    from .dedup import doc_text_bytes
    from .similarity import _bounded_broadcast

    tb = doc_text_bytes(sf_dir)  # vocabulary <= tokens <= text bytes / 2
    scored = (
        tf.join(
            _bounded_broadcast(
                df_tbl, None if tb is None else tb // 2 + 1, 24
            ),
            "token",
        )
        .join(F.broadcast(n))  # 1-row corpus count: bounded forever
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("n_docs").cast("double") + 1.0)
                    / (F.col("df").cast("double") + 1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tf", "df", "tfidf", "rnk")
    )


# --------------------------------------------------------------------------
# D4g: PII redaction — the standard pre-training scrub (emails, phone
# numbers) as pure regexp projection: map-side, no shuffle, WholeStageCodegen
# end to end. The synthetic corpus contains no PII, so every 7th document
# gets a deterministic injected email+phone (identical string arithmetic on
# both engines) and the redactor must scrub exactly those.
@query(
    "d4_pii_redact",
    oracle=r"""
        WITH aug AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN text || ' contact user' || doc_id ||
                             '@example.com or +1-555-' ||
                             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        ELSE text END AS text
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(
                   text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT)
                   AS n_emails,
               CAST(len(regexp_extract_all(
                   text, '\+[0-9][0-9-]{6,}')) AS INT) AS n_phones,
               regexp_replace(regexp_replace(
                   text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>',
                   'g'), '\+[0-9][0-9-]{6,}', '<PHONE>', 'g') AS redacted
        FROM aug
    """,
)
def d4_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    phone_re = r"\+[0-9][0-9-]{6,}"
    d = _docs(spark, sf_dir)
    aug = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id"),
                F.lit("@example.com or +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(email_re), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(phone_re), 0)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ).alias("redacted"),
    )


# --------------------------------------------------------------------------
# D4h: bigram language-model scoring — perplexity-style document quality.
# A maximum-likelihood bigram model is trained ON THE CORPUS ITSELF (count
# tables, no external model), then every document is scored by its mean
# bigram log-probability ln(c2(a,b) / c1(a)) where c1 counts token a as a
# context (non-final position). Low scores flag documents whose token
# transitions are rare in the corpus — the in-engine form of the
# "KenLM perplexity filter" step in LLM data pipelines (CCNet and
# descendants), with the model swap being the only difference.
# Scale: two count aggregates (shuffled on token / token-pair — the same
# keys the scoring joins use, so partitioning is reused), then a
# fact-to-counts join. Floats: each ln term is rounded to 6dp and summed in
# DECIMAL (order-independent); only the final mean divides in float64.
@query(
    "d4_bigram_logprob",
    oracle="""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '')
                       AS ts
            FROM documents WHERE text <> ''
        ),
        bg AS (
            SELECT doc_id, ts[i] AS a, ts[i+1] AS b
            FROM toks, unnest(range(1, len(ts))) AS u(i)
            WHERE len(ts) >= 2
        ),
        c2 AS (SELECT a, b, COUNT(*) AS n2 FROM bg GROUP BY a, b),
        c1 AS (SELECT a, COUNT(*) AS n1 FROM bg GROUP BY a)
        SELECT bg.doc_id,
               COUNT(*) AS n_bigrams,
               CAST(SUM(CAST(ROUND(ln(CAST(c2.n2 AS DOUBLE) / c1.n1), 6)
                             AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
                   AS avg_logprob
        FROM bg JOIN c2 ON c2.a = bg.a AND c2.b = bg.b
                JOIN c1 ON c1.a = bg.a
        GROUP BY bg.doc_id
    """,
)
def d4_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    toks = d.select("doc_id", tokenize("text").alias("ts")).filter(
        F.size("ts") >= 2
    )
    # element_at is 1-based like the oracle's list indexing.
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1),"
                " i -> named_struct('a', element_at(ts, i),"
                "                   'b', element_at(ts, i + 1)))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    c2 = bg.groupBy("a", "b").agg(F.count("*").alias("n2"))
    c1 = bg.groupBy("a").agg(F.count("*").alias("n1"))
    scored = bg.join(c2, ["a", "b"]).join(c1, ["a"])
    term = F.round(
        F.log(F.col("n2").cast("double") / F.col("n1")), 6
    ).cast("decimal(27,6)")
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (F.sum(term).cast("double") / F.count("*")).alias("avg_logprob"),
    )


# --------------------------------------------------------------------------
# D4h: vocabulary coverage — build the corpus top-500 vocabulary by token
# frequency (ties broken by token asc: a total order, so the cut is
# deterministic in both engines) and score every document's out-of-vocab
# rate. This is the vocabulary-construction + OOV-audit step of a tokenizer
# training pipeline. Scale: the token-count aggregate shuffles on token
# (map-side partial combine); the vocabulary itself is ONE 500-element
# array row broadcast onto the fact scan, so the per-document scoring pass
# is shuffle-free — no explode, no re-join on doc_id. At vocab sizes where
# an O(|V|) per-token membership probe stops being cheap (>~10^5), switch
# to explode + broadcast semi-join; for tokenizer-sized vocabularies the
# single-pass HOF filter wins.
@query(
    "d4_vocab_coverage",
    oracle="""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '')
                       AS ts
            FROM documents
        ),
        counts AS (
            SELECT tok, COUNT(*) AS n
            FROM (SELECT unnest(ts) AS tok FROM toks) e
            GROUP BY tok
        ),
        vocab AS (
            SELECT list_sort(list(tok)) AS v
            FROM (SELECT tok FROM counts ORDER BY n DESC, tok ASC LIMIT 500) t
        )
        SELECT doc_id,
               len(ts) AS n_tokens,
               len(ts) - len(list_filter(ts, t -> list_contains(v, t)))
                   AS n_oov,
               CAST(len(ts) - len(list_filter(ts, t -> list_contains(v, t)))
                    AS DOUBLE) / len(ts) AS oov_rate
        FROM toks CROSS JOIN vocab
        WHERE len(ts) > 0
    """,
)
def d4_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        "doc_id", tokenize("text").alias("ts")
    )
    counts = (
        toks.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    vocab = (
        counts.orderBy(F.desc("n"), F.asc("tok"))
        .limit(500)
        .agg(F.sort_array(F.collect_list("tok")).alias("v"))
    )
    n_tokens = F.size("ts")
    n_in = F.size(F.filter("ts", lambda t: F.array_contains(F.col("v"), t)))
    return (
        toks.filter(n_tokens > 0)
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            (n_tokens - n_in).alias("n_oov"),
            ((n_tokens - n_in).cast("double") / n_tokens).alias("oov_rate"),
        )
    )


# --------------------------------------------------------------------------
# D4i: Zipf rank-frequency fit — OLS slope of ln(freq) on ln(rank) over the
# top-1000 terms; natural-language corpora sit near slope -1, so a drifting
# slope is a cheap corpus-health monitor (boilerplate-heavy or synthetic
# text flattens the head). Rank is a total order (n DESC, token ASC); the
# top-1000 cut plans as TakeOrderedAndProject (no global sort shuffle) and
# the regression runs on a bounded 1000-row side regardless of corpus size.
# covar/var quotients are intrinsically order-sensitive -> round6 on both
# engines (core.py policy, b4b precedent).
@query(
    "d4_zipf_slope",
    oracle="""
        WITH counts AS (
            SELECT tok, COUNT(*) AS n
            FROM (
                SELECT unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS tok
                FROM documents
            ) e
            GROUP BY tok
        ),
        ranked AS (
            SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC)
                           AS DOUBLE)) AS lx,
                   ln(CAST(n AS DOUBLE)) AS ly
            FROM (SELECT tok, n FROM counts ORDER BY n DESC, tok ASC
                  LIMIT 1000) t
        )
        SELECT COUNT(*) AS n_terms,
               ROUND(COVAR_POP(lx, ly) / VAR_POP(lx), 6) AS zipf_slope,
               ROUND(AVG(ly) - COVAR_POP(lx, ly) / VAR_POP(lx) * AVG(lx), 6)
                   AS intercept
        FROM ranked
    """,
)
def d4_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        _docs(spark, sf_dir)
        .select(F.explode(tokenize("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(1000)
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranked = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("lx"),
        F.log(F.col("n").cast("double")).alias("ly"),
    )
    slope = F.covar_pop("lx", "ly") / F.var_pop("lx")
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(F.avg("ly") - slope * F.avg("lx"), 6).alias("intercept"),
    )


# --------------------------------------------------------------------------
# D4j: Count-Min sketch heavy-hitter audit — the streaming/distributed
# frequency sketch, built EXACTLY: depth-4 x width-1024 counters where
# hash_j is the same Mersenne-prime permutation family as the minhash
# (functions/text.py — integer arithmetic, bit-exact cross-engine), so the
# sketch (and its overcount error) is deterministic and oracle-checkable,
# not merely approximate. Scale: counters build with map-side partial
# aggregation onto a FIXED 4096-cell grid (sketch merge = cell-wise sum —
# the reason CMS exists); the probe side recomputes the 4 buckets for the
# top-20 true tokens (80 rows) and broadcasts against the sketch.
CMS_DEPTH = 4
CMS_WIDTH = 1024
_CMS_PRIME = 2_147_483_647


def _cms_bucket_sql(tok_expr: str, j: int) -> str:
    s60 = (
        f"CAST(CAST('0x' || substr(md5({tok_expr}), 1, 15) AS UBIGINT)"
        " AS BIGINT)"
    )
    return (
        f"((({2 * j + 1} * ({s60} % {_CMS_PRIME}) + {7919 * (j + 1)})"
        f" % {_CMS_PRIME}) % {CMS_WIDTH})"
    )


def _cms_bucket_col(tok: str, j: int):
    s_mod = stable_hash60(tok) % _CMS_PRIME
    return ((2 * j + 1) * s_mod + 7919 * (j + 1)) % _CMS_PRIME % CMS_WIDTH


@query(
    "d4_cms_heavy_hitters",
    oracle=f"""
        WITH counts AS (
            SELECT tok, COUNT(*) AS n
            FROM (
                SELECT unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS tok
                FROM documents
            ) e
            GROUP BY tok
        ),
        sketch AS (
            SELECT j, bucket, CAST(SUM(n) AS BIGINT) AS c
            FROM (
                SELECT n, j,
                       CASE j {"".join(f"WHEN {j} THEN {_cms_bucket_sql('tok', j)} " for j in range(CMS_DEPTH))}END AS bucket
                FROM counts
                CROSS JOIN (VALUES {", ".join(f"({j})" for j in range(CMS_DEPTH))}) AS d(j)
            ) h
            GROUP BY j, bucket
        ),
        top20 AS (
            SELECT tok, n FROM counts ORDER BY n DESC, tok ASC LIMIT 20
        ),
        probes AS (
            SELECT tok, n, j,
                   CASE j {"".join(f"WHEN {j} THEN {_cms_bucket_sql('tok', j)} " for j in range(CMS_DEPTH))}END AS bucket
            FROM top20
            CROSS JOIN (VALUES {", ".join(f"({j})" for j in range(CMS_DEPTH))}) AS d(j)
        )
        SELECT p.tok AS token, p.n AS true_count,
               MIN(s.c) AS cms_estimate,
               MIN(s.c) - p.n AS overcount
        FROM probes p JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
        GROUP BY p.tok, p.n
    """,
)
def d4_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        _docs(spark, sf_dir)
        .select(F.explode(tokenize("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    buckets = F.array(
        *[_cms_bucket_col("tok", j) for j in range(CMS_DEPTH)]
    )
    sketch = (
        counts.select("n", F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.sum("n").alias("c"))
    )
    top20 = counts.orderBy(F.desc("n"), F.asc("tok")).limit(20)
    probes = top20.select(
        "tok", "n", F.posexplode(buckets).alias("j", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(F.col("tok").alias("token"), F.col("n").alias("true_count"))
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "token",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_count")).alias("overcount"),
        )
    )


# --------------------------------------------------------------------------
# D4: PMI collocations — corpus-level bigram association mining: which
# token pairs co-occur far more than their marginal frequencies predict
# (the classic collocation-extraction step for tokenizer merges and
# phrase vocabularies). PMI = ln(n_ab * N / (n_first_a * n_second_b)),
# position-specific marginals. Scale: three count aggregates over the
# bigram stream (shuffled on pair / first / second — each with map-side
# partial combine), then key-joins of count tables; nothing is ever
# data-sized except the bigram stream itself. The min-support cut (>= 5)
# happens BEFORE the marginal joins, so the scored set is
# vocabulary-sized. ln is engine-libm; 6dp rounding + full (pmi, a, b)
# tiebreak makes the top-50 cut deterministic (d4_bigram_logprob policy).
@query(
    "d4_collocations_pmi",
    oracle="""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '')
                       AS ts
            FROM documents WHERE text <> ''
        ),
        bg AS (
            SELECT ts[i] AS a, ts[i+1] AS b
            FROM toks, unnest(range(1, len(ts))) AS u(i)
            WHERE len(ts) >= 2
        ),
        nb AS (SELECT COUNT(*) AS total FROM bg),
        c2 AS (
            SELECT a, b, COUNT(*) AS n_ab FROM bg GROUP BY a, b
            HAVING COUNT(*) >= 5
        ),
        cf AS (SELECT a, COUNT(*) AS n_first FROM bg GROUP BY a),
        cs AS (SELECT b, COUNT(*) AS n_second FROM bg GROUP BY b),
        scored AS (
            SELECT c2.a AS w_a, c2.b AS w_b, n_ab, n_first, n_second,
                   ROUND(ln(CAST(n_ab AS DOUBLE) * nb.total
                            / n_first / n_second), 6) AS pmi
            FROM c2 JOIN cf ON cf.a = c2.a
                    JOIN cs ON cs.b = c2.b
                    CROSS JOIN nb
        )
        SELECT w_a, w_b, n_ab, n_first, n_second, pmi, rnk FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY pmi DESC, w_a ASC, w_b ASC) AS rnk
            FROM scored
        ) r WHERE rnk <= 50
    """,
)
def d4_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    toks = d.select("doc_id", tokenize("text").alias("ts")).filter(
        F.size("ts") >= 2
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1),"
                " i -> named_struct('a', element_at(ts, i),"
                "                   'b', element_at(ts, i + 1)))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    nb = bg.agg(F.count("*").alias("total"))
    c2 = (
        bg.groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    cf = bg.groupBy("a").agg(F.count("*").alias("n_first"))
    cs = bg.groupBy("b").agg(F.count("*").alias("n_second"))
    scored = (
        c2.join(cf, "a")
        .join(cs, "b")
        .crossJoin(F.broadcast(nb))
        .select(
            F.col("a").alias("w_a"),
            F.col("b").alias("w_b"),
            "n_ab",
            "n_first",
            "n_second",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("total")
                    / F.col("n_first")
                    / F.col("n_second")
                ),
                6,
            ).alias("pmi"),
        )
    )
    # Distributed top-k first (TakeOrderedAndProject — per-partition heaps,
    # no single-partition window over the vocabulary-sized scored set);
    # the rank column is then a window over only the 50 survivors.
    top = scored.orderBy(
        F.col("pmi").desc(), F.col("w_a").asc(), F.col("w_b").asc()
    ).limit(50)
    w = Window.orderBy(
        F.col("pmi").desc(), F.col("w_a").asc(), F.col("w_b").asc()
    )
    return top.withColumn("rnk", F.row_number().over(w))


# --------------------------------------------------------------------------
# D4: KS drift test — the two-sample Kolmogorov-Smirnov statistic of each
# source's document-length distribution against the rest of the corpus:
# the standard "did this feed's shape drift?" monitor for text
# pipelines. The whole computation lives on the (source x distinct
# length) GRID, never on documents: per-cell counts, per-source running
# sums over the global length grid (densified by a bounded
# grid-x-sources cross join — at 100 TB you quantize lengths into
# buckets first, same grid bound), the all-sources cumulation via the
# two-phase prefix-sum helper (the grid is domain-bounded, not
# constant-bounded, so it gets no single-partition sort either), and
# ECDF ratios that are exact integer divisions — the max
# |ECDF_s - ECDF_rest| needs no rounding policy at all.
@query(
    "d4_ks_length_drift",
    oracle="""
        WITH lens AS (
            SELECT source, n_chars AS val FROM documents WHERE text <> ''
        ),
        counts AS (
            SELECT source, val, COUNT(*) AS c FROM lens GROUP BY 1, 2
        ),
        srcs AS (
            SELECT source, COUNT(*) AS n_s FROM lens GROUP BY source
        ),
        tot AS (SELECT COUNT(*) AS n_all FROM lens),
        grid AS (SELECT DISTINCT val FROM lens),
        dense AS (
            SELECT s.source, g.val, s.n_s, COALESCE(c.c, 0) AS c
            FROM grid g CROSS JOIN srcs s
            LEFT JOIN counts c ON c.source = s.source AND c.val = g.val
        ),
        cum AS (
            SELECT source, val, n_s,
                   SUM(c) OVER (PARTITION BY source ORDER BY val ASC)
                       AS cum_s,
                   SUM(c) OVER (ORDER BY val ASC
                                RANGE BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_all
            FROM dense
        )
        SELECT source, MAX(n_s) AS n_docs,
               MAX(ABS(CAST(cum_s AS DOUBLE) / n_s
                       - CAST(cum_all - cum_s AS DOUBLE)
                         / ((SELECT n_all FROM tot) - n_s))) AS ks_stat
        FROM cum
        GROUP BY source
    """,
)
def d4_ks_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    lens = d.select("source", F.col("n_chars").alias("val"))
    counts = lens.groupBy("source", "val").agg(F.count("*").alias("c"))
    srcs = lens.groupBy("source").agg(F.count("*").alias("n_s"))
    tot = lens.agg(F.count("*").alias("n_all"))
    grid = lens.select("val").distinct()
    # cum_all depends only on val: it's the inclusive prefix sum of the
    # PER-VAL total counts over the length grid. The grid is only
    # domain-bounded (max doc length), so the fold runs through the
    # two-phase prefix-sum helper — parallel range-partitioned cumsums +
    # a <=32-row offset collect — instead of a single-partition RANGE
    # window (VERDICT r5 ask #2); the grid-sized result broadcasts back
    # onto the dense (grid x sources) frame.
    from ..functions.distributed_rank import with_global_prefix_sum

    gtot = counts.groupBy("val").agg(F.sum("c").cast("long").alias("ct"))
    pinned: list = []
    cum_all_by_val = with_global_prefix_sum(
        gtot,
        [F.col("val").asc()],
        "ct",
        out="cum_all",
        inclusive=True,
        persisted_out=pinned,
    ).select("val", "cum_all")
    dense = (
        grid.crossJoin(F.broadcast(srcs))
        .join(counts, ["source", "val"], "left")
        .select(
            "source", "val", "n_s", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    )
    w_s = Window.partitionBy("source").orderBy(F.col("val").asc())
    cum = dense.select(
        "source",
        "val",
        "n_s",
        F.sum("c").over(w_s).alias("cum_s"),
    ).join(F.broadcast(cum_all_by_val), "val")
    ks = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            F.abs(
                F.col("cum_s").cast("double") / F.col("n_s")
                - (F.col("cum_all") - F.col("cum_s")).cast("double")
                / (F.col("n_all") - F.col("n_s"))
            ).alias("diff"),
        )
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_docs"),
            F.max("diff").alias("ks_stat"),
        )
    )
    # Materialize the per-source readout (bounded by the source catalog)
    # so the helper's persisted grid is released here; the lazy plan
    # stays attached for the plan audits (plans/audit._unwrap).
    rows = ks.collect()
    schema = ks.schema
    for p in pinned:
        p.unpersist()
    out = spark.createDataFrame(rows, schema)
    out._lazy_plan = ks
    return out


# --------------------------------------------------------------------------
# D4: passage chunking — the RAG / pretraining chunker: each document is
# split into overlapping token windows (width 64, stride 48), emitting
# one row per chunk with its span and a head-token preview. Everything
# runs map-side inside one projection (sequence + transform HOFs over
# the token array — no UDF, no shuffle at all until a consumer
# aggregates); chunk counts per doc are ceil((len - width)/stride) + 1,
# so output size is corpus-token-bounded with ~1.33x overlap overhead,
# exactly the accounting the final columns expose.
CHUNK_W, CHUNK_S = 64, 48


@query(
    "d4_passage_chunks",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents WHERE text <> ''
        )
        SELECT doc_id, i AS chunk_idx,
               i * {CHUNK_S} + 1 AS start_tok,
               LEAST(len(ts), i * {CHUNK_S} + {CHUNK_W}) AS end_tok,
               LEAST(len(ts), i * {CHUNK_S} + {CHUNK_W})
                   - i * {CHUNK_S} AS n_tokens,
               ts[i * {CHUNK_S} + 1] AS head_token
        FROM toks,
             unnest(range(0,
                 GREATEST(1, 1 + CAST(CEIL(
                     CAST(len(ts) - {CHUNK_W} AS DOUBLE)
                     / {CHUNK_S}) AS BIGINT)))) AS u(i)
        WHERE len(ts) > 0
    """,
)
def d4_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    toks = d.select("doc_id", tokenize("text").alias("ts")).filter(
        F.size("ts") > 0
    )
    n_chunks = F.greatest(
        F.lit(1),
        1
        + F.ceil(
            (F.size("ts") - F.lit(CHUNK_W)).cast("double") / CHUNK_S
        ).cast("bigint"),
    )
    chunks = toks.select(
        "doc_id",
        "ts",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * CHUNK_S + 1
    end = F.least(F.size("ts").cast("bigint"), F.col("chunk_idx") * CHUNK_S + CHUNK_W)
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        start.cast("bigint").alias("start_tok"),
        end.alias("end_tok"),
        (end - F.col("chunk_idx") * CHUNK_S).alias("n_tokens"),
        F.element_at("ts", start.cast("int")).alias("head_token"),
    )


# --------------------------------------------------------------------------
# D4: blocklist safety filter — the list-based content gate every
# training corpus passes through (profanity/unsafe-term lists, customer
# blocklists): documents are scored by blocklisted-token hits and
# flagged when hits exceed both an absolute floor and a density
# threshold (hits alone over-flag long docs). The blocklist is a tiny
# broadcast-able array probed with JVM-side HOFs inside ONE map-side
# projection — the per-doc scan is shuffle-free; only the per-source
# rollup exchanges. All decisions are exact-integer comparisons (the
# density test cross-multiplies instead of dividing), so nothing
# rounds. Blocklist terms are fixture-vocabulary words standing in for
# a real unsafe-term list.
BLOCKLIST = ("slow", "hash", "big")


@query(
    "d4_blocklist_filter",
    oracle=f"""
        WITH scored AS (
            SELECT source,
                   len(list_filter(string_split(text, ' '), t -> t <> ''))
                       AS n_tok,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ({", ".join(f"'{w}'" for w in BLOCKLIST)})))
                       AS n_hits
            FROM documents WHERE text <> ''
        )
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(*) FILTER (
                   WHERE n_hits >= 3 AND n_hits * 20 > n_tok)
                   AS n_flagged,
               CAST(SUM(n_hits) AS BIGINT) AS total_hits,
               CAST(COUNT(*) FILTER (
                   WHERE n_hits >= 3 AND n_hits * 20 > n_tok) AS DOUBLE)
                   / COUNT(*) AS flag_rate
        FROM scored
        GROUP BY source
    """,
)
def d4_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    block = F.array(*[F.lit(w) for w in BLOCKLIST])
    toks = tokenize("text")
    scored = d.select(
        "source",
        F.size(toks).alias("n_tok"),
        F.size(F.filter(toks, lambda t: F.array_contains(block, t))).alias(
            "n_hits"
        ),
    )
    flagged = (F.col("n_hits") >= 3) & (
        F.col("n_hits") * 20 > F.col("n_tok")
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_if(flagged).alias("n_flagged"),
        F.sum("n_hits").cast("bigint").alias("total_hits"),
        (F.count_if(flagged).cast("double") / F.count("*")).alias(
            "flag_rate"
        ),
    )


# --------------------------------------------------------------------------
# D4: boilerplate detection — repeated PASSAGES across documents (the
# headers/footers/templates that survive doc-level dedup because their
# host documents differ): the corpus is cut into non-overlapping
# 16-token windows, each window hashed, and windows appearing in 3+
# DISTINCT documents are reported with their spread. This is the
# passage-granular complement of d1's doc-level exact dedup and the
# operator a CommonCrawl-style pipeline runs to strip template text.
# Hashing shrinks every window to 8 bytes before the shuffle (the d1
# discipline: shuffle hashes, not text — the sample text rides along
# only for the tiny flagged tail via max_by).
BP_W = 16


@query(
    "d4_boilerplate_chunks",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents WHERE text <> ''
        ),
        windows AS (
            SELECT doc_id,
                   array_to_string(ts[i * {BP_W} + 1 : (i + 1) * {BP_W}],
                                   ' ') AS w
            FROM toks, unnest(range(0, len(ts) // {BP_W})) AS u(i)
            WHERE len(ts) >= {BP_W}
        ),
        hashed AS (
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5(w), 1, 15) AS UBIGINT)
                        AS BIGINT) AS h,
                   w
            FROM windows
        )
        SELECT h AS chunk_hash,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occurrences,
               MAX(w) AS sample_text
        FROM hashed
        GROUP BY h
        HAVING COUNT(DISTINCT doc_id) >= 3
    """,
)
def d4_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    toks = d.select("doc_id", tokenize("text").alias("ts")).filter(
        F.size("ts") >= BP_W
    )
    windows = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(ts) div {BP_W} - 1),"
                f" i -> array_join(slice(ts, i * {BP_W} + 1, {BP_W}), ' '))"
            )
        ).alias("w"),
    )
    hashed = windows.select(
        "doc_id", stable_hash60(F.col("w")).alias("h"), "w"
    )
    return (
        hashed.groupBy(F.col("h").alias("chunk_hash"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.max("w").alias("sample_text"),
        )
        .filter(F.col("n_docs") >= 3)
    )


# --------------------------------------------------------------------------
# Compression-ratio quality signal (pytest-verified utility, not an
# oracle row: zlib is engine-external, so no SQL oracle can mirror it).
# The CCNet/Gopher-style filter: highly repetitive or templated text
# compresses far below natural prose, so deflate ratio is a cheap
# one-pass quality feature. Runs as an Arrow-batched mapInPandas over
# the documents scan — the same stdlib-only vectorized-UDF discipline
# as the multimodal harness (zlib ships with CPython; no external
# deps). Scale: map-side only, ratio column lands next to doc_id for
# whatever gate consumes it.
def compression_ratio(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, n_compressed, ratio) via zlib level 6."""
    import pandas as pd  # noqa: F401 — mapInPandas contract

    def score(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            n_bytes = raw.str.len().astype("int64")
            n_comp = raw.map(lambda b: len(zlib.compress(b, 6))).astype(
                "int64"
            )
            out = pdf[["doc_id"]].copy()
            out["n_bytes"] = n_bytes
            out["n_compressed"] = n_comp
            out["ratio"] = n_comp / n_bytes.where(n_bytes > 0, 1)
            yield out

    return docs.select("doc_id", "text").mapInPandas(
        score,
        "doc_id long, n_bytes long, n_compressed long, ratio double",
    )


# --------------------------------------------------------------------------
# D4: corpus unigram entropy — the information content of the token
# distribution (the number every tokenizer/compression decision is
# implicitly made against), with its perplexity. Token counts are
# exact; each -p*log2(p) term is 6dp-gridded and decimal-summed over
# the token-type grid (vocabulary-sized, partial-agg combined — the
# d6_behavior_entropy discipline at corpus scope); perplexity
# re-rounds after the engine-libm exp2. One scan, two tiny aggregates.
@query(
    "d4_unigram_entropy",
    oracle="""
        WITH tok AS (
            SELECT unnest(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS t
            FROM documents WHERE text <> ''
        ),
        cnt AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, COUNT(*) AS n_types
                FROM cnt),
        terms AS (
            SELECT ROUND(-(CAST(n AS DOUBLE) / tot.tn)
                         * log2(CAST(n AS DOUBLE) / tot.tn), 6) AS term
            FROM cnt CROSS JOIN tot
        )
        SELECT (SELECT n_types FROM tot) AS n_types,
               (SELECT tn FROM tot) AS total_tokens,
               CAST(SUM(CAST(term AS DECIMAL(27,6))) AS DOUBLE)
                   AS entropy_bits,
               ROUND(POWER(2.0, CAST(SUM(CAST(term AS DECIMAL(27,6)))
                                     AS DOUBLE)), 6) AS perplexity
        FROM terms
    """,
)
def d4_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    tok = d.select(F.explode(tokenize("text")).alias("t"))
    cnt = tok.groupBy("t").agg(F.count("*").alias("n"))
    tot = cnt.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.count("*").alias("n_types"),
    )
    p = F.col("n").cast("double") / F.col("tn")
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        F.round(-p * F.log2(p), 6).cast("decimal(27,6)").alias("term")
    )
    ent = F.sum("term").cast("double")
    return (
        terms.agg(ent.alias("entropy_bits"))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_types",
            F.col("tn").alias("total_tokens"),
            "entropy_bits",
            F.round(F.pow(F.lit(2.0), F.col("entropy_bits")), 6).alias(
                "perplexity"
            ),
        )
    )


# --------------------------------------------------------------------------
# D4: quality-classifier training — 4 unrolled batch-gradient-descent
# steps of a logistic regression over three document-quality features
# (mean token length, type-token ratio, stopword ratio) against a
# deterministic label (doc longer than the median). This is the in-engine
# form of the fastText/logreg quality gates pretraining pipelines train
# on curated-vs-crawl corpora — here the full training loop is a Spark
# plan: per step ONE pass over the cached feature table computing the
# gradient as an exact integer-micro aggregate, then a broadcast weight
# update. Exactness: features and sigmoid outputs are floor(x*1e6+0.5)
# micro-integers (floor on a double is bit-identical cross-engine, unlike
# ROUND), gradient terms are exact DECIMAL(38,0) products of micro
# values, and the weight update divides exact sums in a fixed IEEE order
# — so all 4 weight vectors match DuckDB bit-for-bit. At 100 TB the same
# shape holds: the feature pass is map-side + one scalar aggregate per
# step, and the model state (4 doubles) rides a broadcast.
LOGREG_STEPS = 4
LOGREG_LR = 0.5


def _logreg_oracle() -> str:
    sql = f"""
        WITH feats AS MATERIALIZED (
            SELECT x.*,
                   CASE WHEN n_chars > m.med THEN 1 ELSE 0 END AS y
            FROM (
                SELECT doc_id, n_chars,
                       CAST(floor(CAST(list_sum([length(t) FOR t IN ts])
                                       AS DOUBLE) / len(ts) * 1000000
                                  + 0.5) AS BIGINT) AS x1_u,
                       CAST(floor(CAST(len(list_distinct(ts)) AS DOUBLE)
                                  / len(ts) * 1000000 + 0.5) AS BIGINT)
                           AS x2_u,
                       CAST(floor(CAST(len(list_filter(ts, t ->
                                list_contains([{_sql_list(STOPWORDS)}], t)))
                                       AS DOUBLE)
                                  / len(ts) * 1000000 + 0.5) AS BIGINT)
                           AS x3_u
                FROM (
                    SELECT doc_id, n_chars,
                           list_filter(string_split(text, ' '),
                                       t -> t <> '') AS ts
                    FROM documents WHERE text <> ''
                ) q WHERE len(ts) > 0
            ) x,
            (SELECT quantile_disc(n_chars, 0.5) AS med
             FROM documents WHERE text <> '') m
        ),
        w0 AS (SELECT CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS wl,
                      CAST(0.0 AS DOUBLE) AS wt, CAST(0.0 AS DOUBLE) AS ws)
    """
    for k in range(1, LOGREG_STEPS + 1):
        sql += f""",
        g{k} AS (
            SELECT b, wl, wt, ws, COUNT(*) AS n,
                   CAST(SUM(d_u) AS DOUBLE) AS g0,
                   CAST(SUM(CAST(d_u AS DECIMAL(19,0))
                            * CAST(x1_u AS DECIMAL(19,0))) AS DOUBLE) AS g1,
                   CAST(SUM(CAST(d_u AS DECIMAL(19,0))
                            * CAST(x2_u AS DECIMAL(19,0))) AS DOUBLE) AS g2,
                   CAST(SUM(CAST(d_u AS DECIMAL(19,0))
                            * CAST(x3_u AS DECIMAL(19,0))) AS DOUBLE) AS g3
            FROM (
                SELECT w.b, w.wl, w.wt, w.ws, f.x1_u, f.x2_u, f.x3_u,
                       CAST(floor(1000000 / (1 + exp(-(w.b
                           + w.wl * (CAST(f.x1_u AS DOUBLE) / 1000000)
                           + w.wt * (CAST(f.x2_u AS DOUBLE) / 1000000)
                           + w.ws * (CAST(f.x3_u AS DOUBLE) / 1000000))))
                           + 0.5) AS BIGINT) - f.y * 1000000 AS d_u
                FROM feats f, w{k - 1} w
            ) s GROUP BY b, wl, wt, ws
        ),
        w{k} AS (
            SELECT b - {LOGREG_LR} * (g0 / n / 1000000.0) AS b,
                   wl - {LOGREG_LR} * (g1 / n / 1000000000000.0) AS wl,
                   wt - {LOGREG_LR} * (g2 / n / 1000000000000.0) AS wt,
                   ws - {LOGREG_LR} * (g3 / n / 1000000000000.0) AS ws
            FROM g{k}
        )"""
    rows = "\n        UNION ALL ".join(
        f"SELECT {k} AS step, b AS bias, wl AS w_len, wt AS w_ttr,"
        f" ws AS w_stop FROM w{k}"
        for k in range(1, LOGREG_STEPS + 1)
    )
    return sql + "\n        " + rows


@query("d4_quality_logreg", oracle=_logreg_oracle())
def d4_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    med = d.agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS med"
        )
    )
    ts = tokenize("text")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])

    def micro(x):
        return F.floor(x * F.lit(1000000) + F.lit(0.5)).cast("long")

    base = d.select("doc_id", "n_chars", ts.alias("ts")).filter(
        F.size("ts") > 0
    )
    feats = (
        base.select(
            "n_chars",
            micro(
                F.aggregate(
                    F.transform("ts", lambda t: F.length(t)),
                    F.lit(0),
                    lambda a, x: a + x,
                ).cast("double")
                / F.size("ts")
            ).alias("x1_u"),
            micro(
                F.size(F.array_distinct("ts")).cast("double")
                / F.size("ts")
            ).alias("x2_u"),
            micro(
                F.size(
                    F.filter("ts", lambda t: F.array_contains(stop_arr, t))
                ).cast("double")
                / F.size("ts")
            ).alias("x3_u"),
        )
        .crossJoin(F.broadcast(med))
        .select(
            "x1_u",
            "x2_u",
            "x3_u",
            F.when(F.col("n_chars") > F.col("med"), 1)
            .otherwise(0)
            .alias("y"),
        )
        .persist()
    )
    w = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 0.0)], "b double, wl double, wt double, ws double"
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    out = None
    for k in range(1, LOGREG_STEPS + 1):
        z = (
            F.col("b")
            + F.col("wl") * (F.col("x1_u").cast("double") / F.lit(1000000))
            + F.col("wt") * (F.col("x2_u").cast("double") / F.lit(1000000))
            + F.col("ws") * (F.col("x3_u").cast("double") / F.lit(1000000))
        )
        s = feats.crossJoin(F.broadcast(w)).select(
            "b",
            "wl",
            "wt",
            "ws",
            "x1_u",
            "x2_u",
            "x3_u",
            (
                F.floor(F.lit(1000000) / (F.lit(1) + F.exp(-z)) + F.lit(0.5))
                .cast("long")
                - F.col("y") * F.lit(1000000)
            ).alias("d_u"),
        )
        g = s.groupBy("b", "wl", "wt", "ws").agg(
            F.count("*").alias("n"),
            F.sum("d_u").cast("double").alias("g0"),
            F.sum(dec("d_u") * dec("x1_u")).cast("double").alias("g1"),
            F.sum(dec("d_u") * dec("x2_u")).cast("double").alias("g2"),
            F.sum(dec("d_u") * dec("x3_u")).cast("double").alias("g3"),
        )
        w = g.select(
            (F.col("b") - F.lit(LOGREG_LR) * (F.col("g0") / F.col("n") / F.lit(1000000.0))).alias("b"),
            (F.col("wl") - F.lit(LOGREG_LR) * (F.col("g1") / F.col("n") / F.lit(1000000000000.0))).alias("wl"),
            (F.col("wt") - F.lit(LOGREG_LR) * (F.col("g2") / F.col("n") / F.lit(1000000000000.0))).alias("wt"),
            (F.col("ws") - F.lit(LOGREG_LR) * (F.col("g3") / F.col("n") / F.lit(1000000000000.0))).alias("ws"),
        )
        row = w.select(
            F.lit(k).alias("step"),
            F.col("b").alias("bias"),
            F.col("wl").alias("w_len"),
            F.col("wt").alias("w_ttr"),
            F.col("ws").alias("w_stop"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# --------------------------------------------------------------------------
# D4: language-ID evaluation — the confusion cross-tab between the
# corpus's labeled language and the marker-dialect the d4_lang_id
# heuristic predicts, with per-label coverage shares. This is the eval
# harness any classifier in the curation path ships with (the same shape
# scores a fastText langid swap-in at 100 TB): one scan computing the
# prediction map-side, one hash aggregate to the bounded
# (label x prediction) grid, shares as exact integer ratios against a
# broadcast per-label total.
@query(
    "d4_langid_confusion",
    oracle=f"""
        WITH pred AS (
            SELECT lang,
                   CASE WHEN s_en = 0 AND s_db = 0 AND s_st = 0
                             THEN 'unknown'
                        WHEN s_en >= s_db AND s_en >= s_st THEN 'english'
                        WHEN s_db >= s_st THEN 'database'
                        ELSE 'streaming' END AS predicted
            FROM (
                SELECT lang,
                       len(list_filter(toks, t -> list_contains(
                           [{_sql_list(LANG_MARKERS['english'])}], t))) AS s_en,
                       len(list_filter(toks, t -> list_contains(
                           [{_sql_list(LANG_MARKERS['database'])}], t))) AS s_db,
                       len(list_filter(toks, t -> list_contains(
                           [{_sql_list(LANG_MARKERS['streaming'])}], t))) AS s_st
                FROM (
                    SELECT lang,
                           list_filter(string_split(text, ' '),
                                       t -> t <> '') AS toks
                    FROM documents
                ) t
            ) s
        ),
        cells AS (
            SELECT lang, predicted, COUNT(*) AS n
            FROM pred GROUP BY lang, predicted
        ),
        tot AS (SELECT lang, SUM(n) AS tn FROM cells GROUP BY lang)
        SELECT c.lang, c.predicted, CAST(c.n AS BIGINT) AS n,
               CAST(c.n AS DOUBLE) / t.tn AS share_of_lang
        FROM cells c JOIN tot t ON t.lang = c.lang
    """,
)
def d4_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokenize("text"))

    def score(words) -> F.Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter("toks", lambda t: F.array_contains(arr, t)))

    s_en, s_db, s_st = (
        score(LANG_MARKERS["english"]),
        score(LANG_MARKERS["database"]),
        score(LANG_MARKERS["streaming"]),
    )
    pred = d.select(
        "lang",
        F.when((s_en == 0) & (s_db == 0) & (s_st == 0), "unknown")
        .when((s_en >= s_db) & (s_en >= s_st), "english")
        .when(s_db >= s_st, "database")
        .otherwise("streaming")
        .alias("predicted"),
    )
    cells = pred.groupBy("lang", "predicted").agg(F.count("*").alias("n"))
    tot = cells.groupBy("lang").agg(F.sum("n").alias("tn"))
    return cells.join(F.broadcast(tot), "lang").select(
        "lang",
        "predicted",
        "n",
        (F.col("n").cast("double") / F.col("tn")).alias("share_of_lang"),
    )


# --------------------------------------------------------------------------
# D3/D4 capstone: RAG corpus preparation report — the end-to-end pass a
# retrieval corpus ships through before indexing, composed from this
# repo's proven stages in ONE oracle-checked query: (1) passage chunking
# on the d4_passage_chunks grid (64-token windows, stride 48), (2)
# chunk-level exact dedup by content hash (the index should never store
# the same passage twice), (3) query-term coverage of the SURVIVING
# chunks for the BM25 query terms — the sanity metric that the dedup
# didn't hollow out retrieval coverage. One corpus scan feeds the chunk
# explode; dedup is a hash aggregate on 16-byte chunk fingerprints;
# coverage is map-side HOF counting on the deduped set. Output is the
# per-source report a data card embeds.
@query(
    "d3_rag_corpus_report",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents WHERE text <> ''
        ),
        chunks AS (
            SELECT source,
                   ts[i * {CHUNK_S} + 1 :
                      LEAST(len(ts), i * {CHUNK_S} + {CHUNK_W})] AS ch
            FROM toks,
                 unnest(range(0,
                     GREATEST(1, 1 + CAST(CEIL(
                         CAST(len(ts) - {CHUNK_W} AS DOUBLE)
                         / {CHUNK_S}) AS BIGINT)))) AS u(i)
            WHERE len(ts) > 0
        ),
        fps AS (
            SELECT source, md5(array_to_string(ch, ' ')) AS fp,
                   len(list_filter(ch, t -> t = 'table')) AS h_table,
                   len(list_filter(ch, t -> t = 'join')) AS h_join,
                   len(list_filter(ch, t -> t = 'stream')) AS h_stream
            FROM chunks
        ),
        uniq AS (
            SELECT source, fp,
                   MIN(h_table) AS h_table, MIN(h_join) AS h_join,
                   MIN(h_stream) AS h_stream, COUNT(*) AS copies
            FROM fps GROUP BY source, fp
        )
        SELECT source,
               CAST(SUM(copies) AS BIGINT) AS n_chunks,
               CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
               1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(copies) AS dup_rate,
               CAST(SUM(CASE WHEN h_table > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS chunks_with_table,
               CAST(SUM(CASE WHEN h_join > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS chunks_with_join,
               CAST(SUM(CASE WHEN h_stream > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS chunks_with_stream
        FROM uniq GROUP BY source
    """,
)
def d3_rag_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    toks = d.select("doc_id", "source", tokenize("text").alias("ts")).filter(
        F.size("ts") > 0
    )
    n_chunks = F.greatest(
        F.lit(1),
        1
        + F.ceil(
            (F.size("ts") - F.lit(CHUNK_W)).cast("double") / CHUNK_S
        ).cast("bigint"),
    )
    start = F.col("i") * CHUNK_S + 1
    width = (
        F.least(
            F.size("ts").cast("bigint"),
            F.col("i") * CHUNK_S + F.lit(CHUNK_W),
        )
        - F.col("i") * CHUNK_S
    )
    chunks = toks.select(
        "source",
        "ts",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
    ).select(
        "source",
        F.slice("ts", start.cast("int"), width.cast("int")).alias("ch"),
    )

    def hits(term: str):
        return F.size(F.filter("ch", lambda t: t == F.lit(term)))

    fps = chunks.select(
        "source",
        F.md5(F.array_join("ch", " ")).alias("fp"),
        hits("table").alias("h_table"),
        hits("join").alias("h_join"),
        hits("stream").alias("h_stream"),
    )
    uniq = fps.groupBy("source", "fp").agg(
        F.min("h_table").alias("h_table"),
        F.min("h_join").alias("h_join"),
        F.min("h_stream").alias("h_stream"),
        F.count("*").alias("copies"),
    )
    return uniq.groupBy("source").agg(
        F.sum("copies").cast("long").alias("n_chunks"),
        F.count("*").alias("n_unique_chunks"),
        (
            F.lit(1.0) - F.count("*").cast("double") / F.sum("copies")
        ).alias("dup_rate"),
        F.sum(F.when(F.col("h_table") > 0, 1).otherwise(0))
        .cast("long")
        .alias("chunks_with_table"),
        F.sum(F.when(F.col("h_join") > 0, 1).otherwise(0))
        .cast("long")
        .alias("chunks_with_join"),
        F.sum(F.when(F.col("h_stream") > 0, 1).otherwise(0))
        .cast("long")
        .alias("chunks_with_stream"),
    )


# --------------------------------------------------------------------------
# D4: corpus-driven stopword induction — the data-dependent version of
# the hand-curated STOPWORDS list above: rank every vocabulary token by
# document-frequency ratio and flag those present in over 60% of
# documents. Real pipelines induce their stop list per-corpus exactly
# like this (a legal corpus stops on "court", not "the"). One scan with
# per-doc token DEDUP before the explode (array_distinct map-side, so a
# token counts once per doc), then a vocabulary-sized aggregate joined
# against a broadcast 1-row doc count; ratios are exact integer
# divisions.
STOPWORD_DF_THRESHOLD = 0.6


@query(
    "d4_stopword_discovery",
    oracle=f"""
        WITH nd AS (
            SELECT COUNT(*) AS n_docs FROM documents
            WHERE text <> ''
        ),
        df AS (
            SELECT tok, COUNT(*) AS doc_freq FROM (
                SELECT doc_id,
                       unnest(list_distinct(list_filter(
                           string_split(text, ' '), t -> t <> ''))) AS tok
                FROM documents WHERE text <> ''
            ) x GROUP BY tok
        )
        SELECT tok, CAST(doc_freq AS BIGINT) AS doc_freq,
               CAST(doc_freq AS DOUBLE) / nd.n_docs AS df_ratio,
               doc_freq > nd.n_docs * {STOPWORD_DF_THRESHOLD}
                   AS is_stopword
        FROM df, nd
    """,
)
def d4_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    nd = d.agg(F.count("*").alias("n_docs"))
    df = (
        d.select(
            F.explode(F.array_distinct(tokenize("text"))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("doc_freq"))
    )
    return df.crossJoin(F.broadcast(nd)).select(
        "tok",
        F.col("doc_freq").cast("long").alias("doc_freq"),
        (F.col("doc_freq").cast("double") / F.col("n_docs")).alias(
            "df_ratio"
        ),
        (
            F.col("doc_freq")
            > F.col("n_docs") * F.lit(STOPWORD_DF_THRESHOLD)
        ).alias("is_stopword"),
    )


# --------------------------------------------------------------------------
# Heaps' law vocabulary-growth curve — the companion of d4_zipf_slope:
# vocabulary size V(N) at the 25/50/75/100% doc_id-prefix cuts of the
# corpus. The sub-linearity of V in N is what sizes tokenizer vocabularies
# and dedup hash tables before a full pass. Exact-integer discipline: the
# cut points are percentile_disc doc_ids (exact), and every arm is a
# conditional COUNT / COUNT(DISTINCT ...) in ONE scan (Expand-multiplied
# two-stage aggregate — the same exact-ANALYZE cost shape as
# rel_column_profile); the long format comes from stack() on the single
# aggregate row, never a Union that would split the scan per branch. The
# log-log slope itself is a pytest invariant (numpy), keeping libm ln out
# of the oracle contract.
@query(
    "d4_heaps_law",
    oracle="""
        WITH docs AS (
            SELECT doc_id, text FROM documents WHERE text <> ''
        ), th AS (
            SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY doc_id) AS t1,
                   percentile_disc(0.50) WITHIN GROUP (ORDER BY doc_id) AS t2,
                   percentile_disc(0.75) WITHIN GROUP (ORDER BY doc_id) AS t3,
                   MAX(doc_id) AS t4
            FROM docs
        ), toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM docs
        ), s AS (
            SELECT
              CAST(COUNT(DISTINCT CASE WHEN doc_id <= th.t1 THEN doc_id END) AS BIGINT) AS d1,
              CAST(SUM(CASE WHEN doc_id <= th.t1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              CAST(COUNT(DISTINCT CASE WHEN doc_id <= th.t1 THEN tok END) AS BIGINT) AS v1,
              CAST(COUNT(DISTINCT CASE WHEN doc_id <= th.t2 THEN doc_id END) AS BIGINT) AS d2,
              CAST(SUM(CASE WHEN doc_id <= th.t2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
              CAST(COUNT(DISTINCT CASE WHEN doc_id <= th.t2 THEN tok END) AS BIGINT) AS v2,
              CAST(COUNT(DISTINCT CASE WHEN doc_id <= th.t3 THEN doc_id END) AS BIGINT) AS d3,
              CAST(SUM(CASE WHEN doc_id <= th.t3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
              CAST(COUNT(DISTINCT CASE WHEN doc_id <= th.t3 THEN tok END) AS BIGINT) AS v3,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d4,
              CAST(COUNT(*) AS BIGINT) AS n4,
              CAST(COUNT(DISTINCT tok) AS BIGINT) AS v4
            FROM toks, th
        )
        SELECT 'q25' AS prefix, d1 AS n_docs, n1 AS n_tokens, v1 AS vocab FROM s
        UNION ALL SELECT 'q50', d2, n2, v2 FROM s
        UNION ALL SELECT 'q75', d3, n3, v3 FROM s
        UNION ALL SELECT 'q100', d4, n4, v4 FROM s
    """,
)
def d4_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    th = d.agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY doc_id)"
        ).alias("t1"),
        F.expr(
            "percentile_disc(0.50) WITHIN GROUP (ORDER BY doc_id)"
        ).alias("t2"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY doc_id)"
        ).alias("t3"),
    )
    toks = d.select("doc_id", F.explode(tokenize("text")).alias("tok")).crossJoin(
        F.broadcast(th)
    )
    aggs = []
    for k in (1, 2, 3):
        cond = F.col("doc_id") <= F.col(f"t{k}")
        aggs += [
            F.countDistinct(F.when(cond, F.col("doc_id")))
            .cast("long")
            .alias(f"d{k}"),
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n{k}"),
            F.countDistinct(F.when(cond, F.col("tok")))
            .cast("long")
            .alias(f"v{k}"),
        ]
    aggs += [
        F.countDistinct("doc_id").cast("long").alias("d4"),
        F.count("*").cast("long").alias("n4"),
        F.countDistinct("tok").cast("long").alias("v4"),
    ]
    s = toks.agg(*aggs)
    return s.selectExpr(
        """stack(4,
            'q25',  d1, n1, v1,
            'q50',  d2, n2, v2,
            'q75',  d3, n3, v3,
            'q100', d4, n4, v4) AS (prefix, n_docs, n_tokens, vocab)"""
    )


# --------------------------------------------------------------------------
# RAKE keyword extraction — Rapid Automatic Keyword Extraction (Rose et
# al.), the classic unsupervised keyphrase miner, composed from this
# module's own corpus statistics: the stop list is the top-10
# document-frequency terms (the rank-based form of d4_stopword_discovery —
# a fixed df-ratio cut is degenerate on the fixture's tightly-clustered
# df band), phrases are the maximal stopword-free token runs (one
# running-count window per doc over the position explode), words are
# scored deg/freq over the whole corpus, and each phrase scores
# Sum(deg)/Sum(freq) of its members — the single-division simplification
# that keeps the score an exact rational, quantized through the
# floor(x*1e6 + 0.5) integer path (never ROUND of a rational). Plan: one
# token explode, one broadcast stop join, vocabulary-sized word stats
# joined back to phrase members, top-3 per doc.
RAKE_N_STOPS = 10


@query(
    "d4_rake_keywords",
    oracle=f"""
        WITH stops AS (
            SELECT tok FROM (
                SELECT tok, ROW_NUMBER() OVER (
                    ORDER BY COUNT(*) DESC, tok ASC) AS r
                FROM (
                    SELECT doc_id, unnest(list_distinct(list_filter(
                        string_split(text, ' '), t -> t <> ''))) AS tok
                    FROM documents WHERE text <> ''
                ) x GROUP BY tok
            ) ranked WHERE r <= {RAKE_N_STOPS}
        ),
        toks AS (
            SELECT doc_id, unnest(l) AS tok,
                   generate_subscripts(l, 1) AS pos
            FROM (
                SELECT doc_id,
                       list_filter(string_split(text, ' '), t -> t <> '') AS l
                FROM documents WHERE text <> ''
            ) d
        ),
        flagged AS (
            SELECT t.doc_id, t.tok, t.pos,
                   CASE WHEN s.tok IS NOT NULL THEN 1 ELSE 0 END AS is_stop,
                   SUM(CASE WHEN s.tok IS NOT NULL THEN 1 ELSE 0 END) OVER (
                       PARTITION BY t.doc_id ORDER BY t.pos) AS phrase_id
            FROM toks t LEFT JOIN stops s ON s.tok = t.tok
        ),
        members AS (
            SELECT doc_id, phrase_id, tok, pos FROM flagged WHERE is_stop = 0
        ),
        wstats AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(plen) AS BIGINT) AS deg
            FROM (
                SELECT m.tok, COUNT(*) OVER (
                    PARTITION BY m.doc_id, m.phrase_id) AS plen
                FROM members m
            ) GROUP BY tok
        ),
        phrases AS (
            SELECT m.doc_id, m.phrase_id,
                   string_agg(m.tok, ' ' ORDER BY m.pos) AS phrase,
                   CAST(COUNT(*) AS BIGINT) AS plen,
                   CAST(SUM(w.deg) AS BIGINT) AS sdeg,
                   CAST(SUM(w.freq) AS BIGINT) AS sfreq
            FROM members m JOIN wstats w ON w.tok = m.tok
            GROUP BY m.doc_id, m.phrase_id
        ),
        scored AS (
            SELECT doc_id, phrase, plen,
                   CAST((2 * sdeg * 1000000 + sfreq) // (2 * sfreq)
                        AS BIGINT) AS score_ppm
            FROM phrases
        )
        SELECT doc_id, phrase, plen, score_ppm, rnk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY score_ppm DESC, phrase ASC) AS rnk
            FROM scored) r
        WHERE rnk <= 3
    """,
)
def d4_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    stop_rank = Window.orderBy(F.col("doc_freq").desc(), F.col("tok").asc())
    stops = (
        d.select(F.explode(F.array_distinct(tokenize("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("doc_freq"))
        .withColumn("r", F.row_number().over(stop_rank))
        .filter(F.col("r") <= RAKE_N_STOPS)
        .select(F.col("tok").alias("stop_tok"))
    )
    toks = d.select(
        "doc_id", F.posexplode(tokenize("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    flagged = (
        toks.join(F.broadcast(stops), F.col("stop_tok") == F.col("tok"), "left")
        .select(
            "doc_id",
            "tok",
            "pos",
            F.when(F.col("stop_tok").isNotNull(), 1).otherwise(0).alias(
                "is_stop"
            ),
        )
        .withColumn("phrase_id", F.sum("is_stop").over(wdoc))
    )
    members = flagged.filter(F.col("is_stop") == 0).select(
        "doc_id", "phrase_id", "tok", "pos"
    )
    wphrase = Window.partitionBy("doc_id", "phrase_id")
    wstats = (
        members.withColumn("plen", F.count("*").over(wphrase))
        .groupBy("tok")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
    )
    phrases = (
        members.join(
            wstats.withColumnRenamed("tok", "wtok"),
            F.col("wtok") == F.col("tok"),
        )
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").cast("long").alias("plen"),
            F.sum("deg").cast("long").alias("sdeg"),
            F.sum("freq").cast("long").alias("sfreq"),
        )
    )
    scored = phrases.select(
        "doc_id",
        "phrase",
        "plen",
        F.expr("(2 * sdeg * 1000000 + sfreq) div (2 * sfreq)")
        .cast("long")
        .alias("score_ppm"),
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("phrase").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 3)
    )


# --------------------------------------------------------------------------
# D4: held-out LM evaluation — the proper train/eval form of
# d4_bigram_logprob: the bigram model fits on even doc_ids only, and
# scores the UNSEEN odd-doc half with add-1 (Laplace) smoothing over the
# training vocabulary, so unseen transitions get finite mass instead of
# crashing the product — the perplexity number a CCNet-style quality
# filter actually thresholds on. Smoothed probability
# (c2+1)/(c1+V) is an exact rational; each ln term rounds to 6dp and
# sums in DECIMAL (order-independent), mirrors d4_bigram_logprob's
# discipline; perplexity exponentiates the per-lang mean at the very
# end. Plan: two count aggregates on the train half, broadcast V, two
# left joins onto the eval bigrams (same token keys), one lang rollup.
@query(
    "d4_lm_heldout_eval",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents WHERE text <> ''
        ),
        train_bg AS (
            SELECT ts[i] AS a, ts[i+1] AS b
            FROM toks, unnest(range(1, len(ts))) AS u(i)
            WHERE len(ts) >= 2 AND doc_id % 2 = 0
        ),
        c2 AS (SELECT a, b, COUNT(*) AS n2 FROM train_bg GROUP BY a, b),
        c1 AS (SELECT a, COUNT(*) AS n1 FROM train_bg GROUP BY a),
        vocab AS (
            SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM (
                SELECT unnest(ts) AS tok FROM toks WHERE doc_id % 2 = 0
            )
        ),
        eval_bg AS (
            SELECT doc_id, lang, ts[i] AS a, ts[i+1] AS b
            FROM toks, unnest(range(1, len(ts))) AS u(i)
            WHERE len(ts) >= 2 AND doc_id % 2 = 1
        ),
        scored AS (
            SELECT e.lang, e.doc_id,
                   ROUND(ln(CAST(COALESCE(c2.n2, 0) + 1 AS DOUBLE)
                            / (COALESCE(c1.n1, 0) + vocab.v)), 6) AS lp
            FROM eval_bg e
            LEFT JOIN c2 ON c2.a = e.a AND c2.b = e.b
            LEFT JOIN c1 ON c1.a = e.a
            CROSS JOIN vocab
        )
        SELECT lang,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CAST(lp AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
                   AS avg_logprob,
               ROUND(exp(-(CAST(SUM(CAST(lp AS DECIMAL(27,6))) AS DOUBLE)
                           / COUNT(*))), 6) AS perplexity
        FROM scored
        GROUP BY lang
    """,
)
def d4_lm_heldout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    toks = d.select("doc_id", "lang", tokenize("text").alias("ts"))
    bg_expr = F.explode(
        F.expr(
            "transform(sequence(1, size(ts) - 1),"
            " i -> named_struct('a', element_at(ts, i),"
            "                   'b', element_at(ts, i + 1)))"
        )
    ).alias("p")
    train = toks.filter((F.col("doc_id") % 2 == 0) & (F.size("ts") >= 2))
    evalh = toks.filter((F.col("doc_id") % 2 == 1) & (F.size("ts") >= 2))
    train_bg = train.select(bg_expr).select(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )
    c2 = train_bg.groupBy("a", "b").agg(F.count("*").alias("n2"))
    c1 = train_bg.groupBy("a").agg(F.count("*").alias("n1"))
    vocab = (
        toks.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode("ts").alias("tok"))
        .agg(F.countDistinct("tok").cast("long").alias("v"))
    )
    eval_bg = evalh.select("doc_id", "lang", bg_expr).select(
        "doc_id", "lang", F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )
    scored = (
        eval_bg.join(c2, ["a", "b"], "left")
        .join(c1, ["a"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "doc_id",
            F.round(
                F.log(
                    (F.coalesce(F.col("n2"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("n1"), F.lit(0)) + F.col("v"))
                ),
                6,
            ).alias("lp"),
        )
    )
    lp_dec = F.col("lp").cast("decimal(27,6)")
    avg_lp = F.sum(lp_dec).cast("double") / F.count("*")
    return scored.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_bigrams"),
        avg_lp.alias("avg_logprob"),
        F.round(F.exp(-avg_lp), 6).alias("perplexity"),
    )


# --------------------------------------------------------------------------
# D4: feature hashing (the "hashing trick") — the fixed-width text
# vectorizer that needs NO vocabulary pass: each token hashes straight to
# one of 64 buckets (engine-portable md5 arithmetic), giving every doc a
# constant-size integer count vector regardless of corpus vocabulary —
# the memory-bounded alternative to d4_vocab_coverage's explicit top-500
# vocabulary, and the standard first featurizer for linear models at
# corpus scale. The collision audit (distinct tokens vs occupied
# buckets) quantifies the trick's information loss. One explode + one
# hash agg; the 64-wide vector assembles map-side per doc.
FEATURE_HASH_DIM = 64


@query(
    "d4_feature_hashing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                              t -> t <> '')) AS tok
            FROM documents WHERE text <> ''
        ),
        hashed AS (
            SELECT doc_id, tok,
                   CAST(CAST('0x' || substr(md5(tok), 1, 15) AS UBIGINT)
                        AS BIGINT) % {FEATURE_HASH_DIM} AS bucket
            FROM toks
        ),
        cells AS (
            SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_toks_in_bucket
            FROM hashed GROUP BY doc_id, bucket
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_occupied_buckets,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST(SUM(n_toks_in_bucket) AS BIGINT) AS n_distinct_tokens,
               CAST(SUM(CASE WHEN n_toks_in_bucket > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_collision_buckets,
               CAST(MAX(n) AS BIGINT) AS max_bucket_count
        FROM cells GROUP BY doc_id
    """,
)
def d4_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    hashed = d.select(
        "doc_id", F.explode(tokenize("text")).alias("tok")
    ).withColumn("bucket", stable_hash60("tok") % FEATURE_HASH_DIM)
    cells = hashed.groupBy("doc_id", "bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("tok").cast("long").alias("n_toks_in_bucket"),
    )
    return cells.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_occupied_buckets"),
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum("n_toks_in_bucket").cast("long").alias("n_distinct_tokens"),
        F.sum(F.when(F.col("n_toks_in_bucket") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_collision_buckets"),
        F.max("n").cast("long").alias("max_bucket_count"),
    )

# --------------------------------------------------------------------------
# D4: tokenizer fertility — pieces-per-word under a max-4-char subword
# model ((len+3)//4 pieces per word, the piece count of any
# max-piece-length tokenizer on an alphabet with no merges), the metric
# LLM data teams use to compare tokenizer cost across languages /
# sources before committing a vocab. The corpus is touched once; all
# per-doc math is higher-order array folds (JVM-side), then one
# grid-sized groupBy(lang). Ratios of integer sums go through the exact
# integer-division 6dp path (`div` truncates, `//` floors — identical on
# these positive sums), never ROUND (exact-rational half-trap).
@query(
    "d4_tokenizer_fertility",
    oracle="""
        WITH tok AS (
            SELECT lang,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
        ),
        w AS (
            SELECT lang,
                   len(toks) AS ws,
                   list_sum([ (length(t) + 3) // 4 FOR t IN toks ]) AS pieces,
                   list_sum([ CASE WHEN length(t) = 1 THEN 1 ELSE 0 END
                              FOR t IN toks ]) AS singles,
                   list_sum([ length(t) FOR t IN toks ]) AS chars
            FROM tok WHERE len(toks) > 0
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(ws) AS BIGINT) AS n_words,
               CAST(SUM(pieces) AS BIGINT) AS n_pieces,
               CAST((SUM(pieces) * 1000000) // SUM(ws) AS BIGINT)
                   AS fertility_u,
               CAST((SUM(chars) * 1000000) // SUM(ws) AS BIGINT)
                   AS mean_word_len_u,
               CAST((SUM(singles) * 1000000) // SUM(ws) AS BIGINT)
                   AS single_share_u
        FROM w GROUP BY lang
    """,
)
def d4_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokenize("text")).filter(
        F.size("toks") > 0
    )
    fold = lambda expr: F.aggregate(  # noqa: E731
        F.transform("toks", expr), F.lit(0).cast("long"), lambda a, x: a + x
    )
    per_doc = d.select(
        "lang",
        F.size("toks").cast("long").alias("ws"),
        fold(lambda t: F.floor((F.length(t) + F.lit(3)) / F.lit(4))).alias(
            "pieces"
        ),
        fold(
            lambda t: F.when(F.length(t) == 1, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        ).alias("singles"),
        fold(lambda t: F.length(t).cast("long")).alias("chars"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("n_words"),
        F.sum("pieces").cast("long").alias("n_pieces"),
        F.sum("singles").cast("long").alias("singles"),
        F.sum("chars").cast("long").alias("chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_pieces",
        F.expr("n_pieces * 1000000 div n_words").alias("fertility_u"),
        F.expr("chars * 1000000 div n_words").alias("mean_word_len_u"),
        F.expr("singles * 1000000 div n_words").alias("single_share_u"),
    )

# --------------------------------------------------------------------------
# D4: source-overlap contamination matrix — pairwise 3-gram Jaccard
# between SOURCES (not documents): the cross-corpus audit run before
# mixing crawls into a training set, catching feeds that are secretly
# the same upstream corpus (cf. d7_split_leakage_scan, which guards
# train/test splits at document level). Scale shape: distinct
# (source, shingle) pairs, then ONE groupBy(shingle) whose per-key
# source set is bounded by the source count, expanded map-side into
# ordered pairs by a higher-order transform — the corpus is never
# self-joined; work is O(shingles x sources^2-bounded), not O(docs^2).
# Jaccard through the exact integer 6dp path.
@query(
    "d4_source_overlap_matrix",
    oracle="""
        WITH ss AS (
            SELECT DISTINCT source, shingle FROM (
                SELECT source, unnest(
                    list_distinct([toks[i+1] || ' ' || toks[i+2] || ' '
                                   || toks[i+3]
                                   FOR i IN range(0, len(toks) - 2)]))
                    AS shingle
                FROM (SELECT source, string_split(text, ' ') AS toks
                      FROM documents WHERE text <> '')
                WHERE len(toks) >= 3
            )
        ),
        sz AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
        pairs AS (
            SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
            FROM ss a JOIN ss b ON b.shingle = a.shingle
                              AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT p.src_a, p.src_b,
               CAST(p.shared AS BIGINT) AS shared_shingles,
               CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b,
               CAST(p.shared * 1000000 // (za.n + zb.n - p.shared)
                    AS BIGINT) AS jaccard_u
        FROM pairs p JOIN sz za ON za.source = p.src_a
                     JOIN sz zb ON zb.source = p.src_b
    """,
)
def d4_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import shingles

    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    ss = (
        d.select(
            "source",
            F.explode(
                F.array_distinct(shingles(tokenize("text"), 3))
            ).alias("shingle"),
        )
        .distinct()
    )
    sz = ss.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    srcs = ss.groupBy("shingle").agg(
        F.array_sort(F.collect_set("source")).alias("srcs")
    )
    pair_expr = F.flatten(
        F.transform(
            "srcs",
            lambda x, i: F.transform(
                F.slice(F.col("srcs"), i + 2, F.size("srcs")),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    pairs = (
        srcs.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.src_a").alias("src_a"),
                 F.col("p.src_b").alias("src_b"))
        .agg(F.count("*").cast("long").alias("shared_shingles"))
    )
    za = sz.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    zb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(za), "src_a")
        .join(F.broadcast(zb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared_shingles",
            "n_a",
            "n_b",
            F.expr(
                "shared_shingles * 1000000 div (n_a + n_b - shared_shingles)"
            ).alias("jaccard_u"),
        )
    )

# --------------------------------------------------------------------------
# D4: Jensen-Shannon content drift — per source, JSD(source unigram
# dist || corpus dist) over the corpus top-200 vocabulary plus one OOV
# bucket (so both distributions sum to 1 and the grid stays bounded):
# the CONTENT companion to d4_ks_length_drift's length-only test, and
# the number a mixing run monitors to catch a feed whose topic mix
# shifted. Scale shape: one token-count shuffle, a vocabulary-sized
# ranking, then all JSD math on the sources x (200+1) probability grid
# — the corpus is touched once. p/q are doubles from identical integer
# counts; per-cell terms round6 then decimal-sum; JSD <= ln(2) by
# construction (pytest-asserted).
JSD_VOCAB = 200


@query(
    "d4_js_divergence",
    oracle=f"""
        WITH tok AS (
            SELECT source, unnest(list_filter(string_split(text, ' '),
                                              t -> t <> '')) AS t
            FROM documents WHERE text <> ''
        ),
        sc AS (SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        cc AS (SELECT t, SUM(c) AS c FROM sc GROUP BY t),
        vocab AS (
            SELECT t FROM (
                SELECT t, ROW_NUMBER() OVER (ORDER BY c DESC, t ASC) AS rn
                FROM cc
            ) WHERE rn <= {JSD_VOCAB}
        ),
        stot AS (SELECT source, SUM(c) AS n FROM sc GROUP BY source),
        ctot AS (SELECT SUM(c) AS n FROM cc),
        sv AS (
            SELECT s.source, v.t, COALESCE(sc.c, 0) AS c
            FROM (SELECT DISTINCT source FROM sc) s
            CROSS JOIN vocab v
            LEFT JOIN sc ON sc.source = s.source AND sc.t = v.t
            UNION ALL
            SELECT st.source, '<oov>', st.n - COALESCE(SUM(sc.c), 0)
            FROM stot st
            LEFT JOIN (sc JOIN vocab USING (t)) sc
              ON sc.source = st.source
            GROUP BY st.source, st.n
        ),
        cv AS (
            SELECT v.t, cc.c FROM vocab v JOIN cc USING (t)
            UNION ALL
            SELECT '<oov>', (SELECT n FROM ctot)
                  - (SELECT SUM(cc.c) FROM cc JOIN vocab USING (t))
        ),
        terms AS (
            SELECT sv.source,
                   CAST(sv.c AS DOUBLE) / st.n AS p,
                   CAST(cv.c AS DOUBLE) / (SELECT n FROM ctot) AS q
            FROM sv JOIN cv USING (t) JOIN stot st
              ON st.source = sv.source
        )
        SELECT source,
               CAST(SUM(CAST(ROUND(
                   CASE WHEN p > 0
                        THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
                 + CASE WHEN q > 0
                        THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END,
                   6) AS DECIMAL(27,6))) AS DOUBLE) AS jsd_nats
        FROM terms GROUP BY source
    """,
)
def d4_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("text") != "")
    tok = d.select("source", F.explode(tokenize("text")).alias("t"))
    sc = tok.groupBy("source", "t").agg(F.count("*").alias("c"))
    cc = sc.groupBy("t").agg(F.sum("c").alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("t").asc())
    vocab = (
        cc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= JSD_VOCAB)
        .select("t")
    )
    stot = sc.groupBy("source").agg(F.sum("c").alias("n"))
    ctot = cc.agg(F.sum("c").alias("cn"))
    sources = sc.select("source").distinct()
    in_vocab = (
        sources.crossJoin(F.broadcast(vocab))
        .join(sc, ["source", "t"], "left")
        .select("source", "t", F.coalesce("c", F.lit(0)).alias("c"))
    )
    oov = (
        stot.join(
            sc.join(F.broadcast(vocab), "t")
            .groupBy("source")
            .agg(F.sum("c").alias("iv")),
            "source",
            "left",
        )
        .select(
            "source",
            F.lit("<oov>").alias("t"),
            (F.col("n") - F.coalesce("iv", F.lit(0))).alias("c"),
        )
    )
    sv = in_vocab.unionAll(oov)
    cv_in = vocab.join(cc, "t").select("t", "c")
    cv_oov = (
        ctot.crossJoin(
            cc.join(F.broadcast(vocab), "t").agg(F.sum("c").alias("iv"))
        )
        .select(
            F.lit("<oov>").alias("t"), (F.col("cn") - F.col("iv")).alias("c")
        )
    )
    cv = cv_in.unionAll(cv_oov).withColumnRenamed("c", "qc")
    terms = (
        sv.join(F.broadcast(cv), "t")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(ctot))
        .select(
            "source",
            (F.col("c").cast("double") / F.col("n")).alias("p"),
            (F.col("qc").cast("double") / F.col("cn")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    term = F.round(
        F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m))
        .otherwise(F.lit(0.0))
        + F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log(F.col("q") / m))
        .otherwise(F.lit(0.0)),
        6,
    )
    return terms.groupBy("source").agg(
        F.sum(term.cast("decimal(27,6)")).cast("double").alias("jsd_nats")
    )
