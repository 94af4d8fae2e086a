"""Tokenizer training and retrieval scoring over ``documents`` /
``embeddings`` (SURVEY.md §2-D4/D3 extensions): distributed BPE merge
training, BPE encoding stats, BM25 lexical ranking, and hybrid
(lexical + vector) reciprocal-rank fusion — the retrieval stack an
LLM-data pipeline runs next to its dedup/curation stages.

Scale design: BPE training is the canonical two-phase distributed shape —
ONE corpus-wide word-count aggregate (the only pass that touches raw text;
map-side combinable), then N merge rounds on the word-TYPE table, which is
vocabulary-sized (bounded: ~10^6 rows at 100 TB, 31 here) and cached. Each
round's winning pair is a 1-row argmax collected to the driver — the merge
table IS the model artifact, exactly like the k-row centroid collects in
``clustering.py`` — and is re-broadcast as a literal rewrite. BM25 is one
scan with map-side HOF term counting plus two broadcast 1-row stats joins;
fusion joins two bounded top-k lists. No UDFs anywhere; every score is
either exact-integer math or a round6-then-decimal-sum per the repo's
cross-engine float policy (continuous ln/cosine terms only — exact ratios
are never rounded).

Reference parity note: the reference repo has no tokenizer/retrieval layer
(it delegates all querying to ClickHouse/Grafana); these are §2-D extension
operators mandated by the driver contract (BASELINE.json), modeled on
public BPE (Sennrich et al. 2016) and BM25 (Robertson-Sparck Jones)
formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..io import load_table
from ..registry import query

BPE_ROUNDS = 6

# BM25 constants (standard Robertson defaults) and the fixed query terms —
# all three occur in the synthetic corpus vocabulary.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("table", "join", "stream")
RRF_K = 60


# --------------------------------------------------------------------------
# Shared BPE machinery
# --------------------------------------------------------------------------
def _bpe_oracle_prefix(rounds: int) -> str:
    """Unrolled-CTE DuckDB mirror of the merge loop.

    Each round: count adjacent symbol pairs over the word-type table
    (weighted by word frequency), pick the most frequent pair with a
    (count DESC, left ASC, right ASC) deterministic tiebreak, and apply
    the merge. Merge application doubles the inter-symbol spaces first so
    a single left-to-right ``replace`` merges every non-overlapping
    occurrence (BPE's greedy semantics — chained same-symbol runs like
    ``a a a`` merge left-first on both engines).
    """
    sql = """
        WITH words AS (
            SELECT w, COUNT(*) AS cnt FROM (
                SELECT unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS w
                FROM documents
            ) x GROUP BY w
        ),
        w0 AS (
            SELECT w, cnt,
                   array_to_string(
                       [substr(w, i, 1)
                        FOR i IN generate_series(1, length(w))], ' ') AS seq
            FROM words
        )"""
    for r in range(1, rounds + 1):
        sql += f""",
        t{r} AS (
            SELECT cnt,
                   list_filter(string_split(seq, ' '), t -> t <> '') AS toks
            FROM w{r - 1}
        ),
        p{r} AS (
            SELECT toks[i] AS a, toks[i + 1] AS b,
                   CAST(SUM(cnt) AS BIGINT) AS c
            FROM t{r}, unnest(generate_series(1, len(toks) - 1)) AS g(i)
            WHERE len(toks) >= 2
            GROUP BY 1, 2
        ),
        win{r} AS (
            SELECT a, b, c FROM p{r}
            ORDER BY c DESC, a ASC, b ASC LIMIT 1
        ),
        w{r} AS (
            SELECT w, cnt,
                   trim(regexp_replace(
                       replace(' ' || replace(seq, ' ', '  ') || ' ',
                               ' ' || win.a || '  ' || win.b || ' ',
                               ' ' || win.a || win.b || ' '),
                       ' +', ' ', 'g')) AS seq
            FROM w{r - 1}, win{r} AS win
        )"""
    return sql


def _bpe_train_rounds(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_ROUNDS
) -> tuple[list[tuple], DataFrame]:
    """Run the merge loop; return (merge table rows, final word-seq frame).

    The word-type table is cached (vocabulary-sized); each round is one
    pair-count aggregate + a 1-row argmax collect, and the merge is applied
    as a literal string rewrite (symbols are [a-z]+ by construction, so
    embedding them in an expression is safe).
    """
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(tokenize("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    cur = words.withColumn(
        "seq",
        F.expr(
            "array_join(transform(sequence(1, length(w)),"
            " i -> substr(w, i, 1)), ' ')"
        ),
    ).persist()
    merges: list[tuple] = []
    for r in range(1, rounds + 1):
        pairs = (
            cur.select("cnt", F.split("seq", " ").alias("toks"))
            .filter(F.size("toks") >= 2)
            .select(
                "cnt",
                "toks",
                F.expr("explode(sequence(1, size(toks) - 1))").alias("i"),
            )
            .select(
                F.element_at("toks", F.col("i")).alias("a"),
                F.element_at("toks", F.col("i") + F.lit(1)).alias("b"),
                "cnt",
            )
        )
        pc = pairs.groupBy("a", "b").agg(F.sum("cnt").alias("c"))
        row = (
            pc.orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()[0]
        )
        a, b = row["a"], row["b"]
        merges.append((r, a, b, a + b, int(row["c"])))
        cur = cur.withColumn(
            "seq",
            F.expr(
                "trim(regexp_replace("
                f"replace(' ' || replace(seq, ' ', '  ') || ' ',"
                f" ' {a}  {b} ', ' {a}{b} '), ' +', ' '))"
            ),
        )
    return merges, cur


# --------------------------------------------------------------------------
# D4: BPE merge training — the learned merge table itself, exact-checked.
def _bpe_train_oracle() -> str:
    rows = "\n            UNION ALL ".join(
        f"SELECT {r} AS merge_round, a AS left_sym, b AS right_sym,"
        f" a || b AS new_sym, c AS pair_count FROM win{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    return _bpe_oracle_prefix(BPE_ROUNDS) + f"\n        {rows}"


@query("d4_bpe_train", oracle=_bpe_train_oracle())
def d4_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, cur = _bpe_train_rounds(spark, sf_dir)
    cur.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_round int, left_sym string, right_sym string,"
        " new_sym string, pair_count long",
    )


# --------------------------------------------------------------------------
# D4: BPE encoding stats — apply the learned merges back to the corpus and
# report per-source compression: BPE tokens per word and chars per BPE
# token. The corpus is touched twice total (once for training counts, once
# for the per-source word counts); the learned segmentation joins in from
# the vocabulary-sized table. Ratios of exact integers are emitted as raw
# double divisions (identical IEEE ops both engines), never rounded.
@query(
    "d4_bpe_encode",
    oracle=_bpe_oracle_prefix(BPE_ROUNDS)
    + f""",
        per_sw AS (
            SELECT source, w, COUNT(*) AS n FROM (
                SELECT source,
                       unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS w
                FROM documents
            ) x GROUP BY source, w
        ),
        seg AS (
            SELECT w, length(w) AS n_chars_w,
                   len(list_filter(string_split(seq, ' '), t -> t <> ''))
                       AS n_bpe
            FROM w{BPE_ROUNDS}
        )
        SELECT s.source,
               CAST(SUM(s.n) AS BIGINT) AS n_words,
               CAST(SUM(s.n * g.n_bpe) AS BIGINT) AS n_bpe_tokens,
               CAST(SUM(s.n * g.n_chars_w) AS BIGINT) AS n_chars,
               CAST(SUM(s.n * g.n_bpe) AS DOUBLE) / SUM(s.n)
                   AS bpe_per_word,
               CAST(SUM(s.n * g.n_chars_w) AS DOUBLE) / SUM(s.n * g.n_bpe)
                   AS chars_per_token
        FROM per_sw s JOIN seg g ON g.w = s.w
        GROUP BY s.source
    """,
)
def d4_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, cur = _bpe_train_rounds(spark, sf_dir)
    seg = cur.select(
        "w",
        F.length("w").cast("long").alias("n_chars_w"),
        F.size(F.split("seq", " ")).cast("long").alias("n_bpe"),
    )
    d = load_table(spark, sf_dir, "documents")
    per_sw = (
        d.select("source", F.explode(tokenize("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("n"))
    )
    out = (
        per_sw.join(F.broadcast(seg), "w")
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("n_bpe")).alias("n_bpe_tokens"),
            F.sum(F.col("n") * F.col("n_chars_w")).alias("n_chars"),
        )
        .select(
            "source",
            "n_words",
            "n_bpe_tokens",
            "n_chars",
            (
                F.col("n_bpe_tokens").cast("double") / F.col("n_words")
            ).alias("bpe_per_word"),
            (
                F.col("n_chars").cast("double") / F.col("n_bpe_tokens")
            ).alias("chars_per_token"),
        )
    )
    cur.unpersist()
    return out


# --------------------------------------------------------------------------
# D4: BM25 top-k — lexical relevance ranking for a fixed 3-term query.
# One corpus scan computes per-doc term frequencies map-side (HOF filter
# counts, no explode); corpus stats (N, avgdl, per-term document
# frequencies) are two 1-row broadcast joins. Each per-term score carries
# a continuous ln() factor, so it is round6-quantized and the three terms
# are decimal-summed — ranking order is then bit-identical cross-engine.
def _bm25_oracle() -> str:
    tf_cols = ",\n                   ".join(
        f"len(list_filter(ts, t -> t = '{t}')) AS tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ",\n                   ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS DOUBLE)"
        f" AS df_{t}"
        for t in BM25_TERMS
    )
    k1, b = BM25_K1, BM25_B
    terms = "\n                 + ".join(
        f"CAST(ROUND(ln((n_docs - df_{t} + 0.5) / (df_{t} + 0.5) + 1)"
        f" * (tf_{t} * {k1 + 1}) / (tf_{t} + {k1} * ({1 - b} + {b} * dl"
        f" / avgdl)), 6) AS DECIMAL(27,6))"
        for t in BM25_TERMS
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents
        ),
        tf AS (
            SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl,
                   {tf_cols}
            FROM toks
        ),
        stat AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                   {df_cols}
            FROM tf
        ),
        scored AS (
            SELECT doc_id,
                   CAST({terms} AS DOUBLE) AS bm25
            FROM tf, stat
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC)
                    AS INTEGER) AS rank,
               doc_id, bm25
        FROM scored
        ORDER BY bm25 DESC, doc_id ASC LIMIT 10
    """


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for every document, scores decimal-exact."""
    d = load_table(spark, sf_dir, "documents")
    tf = d.select(
        "doc_id",
        F.size(tokenize("text")).cast("double").alias("dl"),
        *[
            F.size(F.filter(tokenize("text"), lambda x: x == F.lit(t))).alias(
                f"tf_{t}"
            )
            for t in BM25_TERMS
        ],
    )
    stat = tf.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    k1, b = BM25_K1, BM25_B
    term_score = None
    for t in BM25_TERMS:
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5)
            / (F.col(f"df_{t}") + 0.5)
            + 1
        )
        s = F.round(
            idf
            * (F.col(f"tf_{t}") * F.lit(k1 + 1))
            / (
                F.col(f"tf_{t}")
                + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
            6,
        ).cast("decimal(27,6)")
        term_score = s if term_score is None else term_score + s
    return tf.crossJoin(F.broadcast(stat)).select(
        "doc_id", term_score.cast("double").alias("bm25")
    )


@query("d4_bm25_topk", oracle=_bm25_oracle())
def d4_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    scored = _bm25_scored(spark, sf_dir)
    top = scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(
        10
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return top.select(
        F.row_number().over(w).alias("rank"), "doc_id", "bm25"
    )


# --------------------------------------------------------------------------
# D3: hybrid retrieval — reciprocal-rank fusion of the BM25 lexical top-50
# and the cosine vector top-50 (query = vec_id 0), joined on
# doc_id == vec_id. RRF score = sum over lists of 1/(60 + rank); both
# addends are exact IEEE divisions of small integers, so the fused score
# needs no rounding policy at all. Top-k of each list is a
# TakeOrderedAndProject (no global sort); the fusion join touches 2x50
# rows. This is the standard first-stage ranker an embedding-era corpus
# search runs: lexical and semantic evidence fused without score
# calibration.
@query(
    "d3_rrf_hybrid",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents
        ),
        tf AS (
            SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl,
                   {", ".join(f"len(list_filter(ts, t -> t = '{t}')) AS tf_{t}" for t in BM25_TERMS)}
            FROM toks
        ),
        stat AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                   {", ".join(f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{t}" for t in BM25_TERMS)}
            FROM tf
        ),
        bm AS (
            SELECT doc_id,
                   CAST({" + ".join(f"CAST(ROUND(ln((n_docs - df_{t} + 0.5) / (df_{t} + 0.5) + 1) * (tf_{t} * {BM25_K1 + 1}) / (tf_{t} + {BM25_K1} * ({1 - BM25_B} + {BM25_B} * dl / avgdl)), 6) AS DECIMAL(27,6))" for t in BM25_TERMS)}
                        AS DOUBLE) AS bm25
            FROM tf, stat
        ),
        bm_rank AS (
            SELECT doc_id AS item_id,
                   ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rb
            FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 50
        ),
        v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])))
                       AS norm
            FROM embeddings
        ),
        qv AS (SELECT * FROM v WHERE vec_id = 0),
        vec_rank AS (
            SELECT v.vec_id AS item_id,
                   ROW_NUMBER() OVER (ORDER BY
                       round(list_dot_product(qv.e, v.e)
                             / (qv.norm * v.norm), 6) DESC,
                       v.vec_id ASC) AS rv
            FROM v, qv WHERE v.vec_id <> 0
            ORDER BY round(list_dot_product(qv.e, v.e)
                           / (qv.norm * v.norm), 6) DESC, v.vec_id ASC
            LIMIT 50
        ),
        fused AS (
            SELECT COALESCE(b.item_id, x.item_id) AS item_id,
                   COALESCE(1.0 / ({RRF_K} + b.rb), 0)
                   + COALESCE(1.0 / ({RRF_K} + x.rv), 0) AS rrf_score,
                   b.rb AS bm25_rank, x.rv AS cosine_rank
            FROM bm_rank b FULL OUTER JOIN vec_rank x
              ON x.item_id = b.item_id
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC,
                                       item_id ASC) AS INTEGER)
                   AS fused_rank,
               item_id, rrf_score,
               CAST(bm25_rank AS BIGINT) AS bm25_rank,
               CAST(cosine_rank AS BIGINT) AS cosine_rank
        FROM fused
        ORDER BY rrf_score DESC, item_id ASC LIMIT 10
    """,
)
def d3_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .similarity import _dot, _vectors

    bm = _bm25_scored(spark, sf_dir)
    wb = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    bm_rank = (
        bm.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(50)
        .select(
            F.col("doc_id").alias("item_id"),
            F.row_number().over(wb).alias("rb"),
        )
    )
    v = _vectors(spark, sf_dir).drop("label")
    qv = v.filter(F.col("vec_id") == 0).select(
        F.col("e").alias("qe"), F.col("norm").alias("qnorm")
    )
    cos = F.round(
        _dot(F.col("qe"), F.col("e")) / (F.col("qnorm") * F.col("norm")), 6
    )
    scored = (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", cos.alias("cosine"))
    )
    wv = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    vec_rank = (
        scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(50)
        .select(
            F.col("vec_id").alias("item_id"),
            F.row_number().over(wv).alias("rv"),
        )
    )
    fused = bm_rank.join(vec_rank, "item_id", "full_outer").select(
        "item_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rb")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("rv")), F.lit(0.0)
            )
        ).alias("rrf_score"),
        F.col("rb").cast("long").alias("bm25_rank"),
        F.col("rv").cast("long").alias("cosine_rank"),
    )
    wf = Window.orderBy(F.col("rrf_score").desc(), F.col("item_id").asc())
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col("item_id").asc())
        .limit(10)
        .select(
            F.row_number().over(wf).alias("fused_rank"),
            "item_id",
            "rrf_score",
            "bm25_rank",
            "cosine_rank",
        )
    )
