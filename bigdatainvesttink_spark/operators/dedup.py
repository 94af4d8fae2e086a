"""Deduplication operators over ``documents`` (SURVEY.md §2-D1, D2) —
exact, n-gram Jaccard, MinHash+LSH, and SimHash, each oracle-checked.

The driver corpus has no natural duplicates (500-5000 distinct word-soup
texts), so a shared ``corpus`` CTE — identical SQL text on the Spark and
DuckDB sides — injects deterministic exact copies (doc_id+2e6) and one-token
mutants (doc_id+1e6). The operators then have real work to do and their
outputs are non-trivially verified.

Scale design (100 TB of documents):
  * exact dedup: one hash-shuffle on the text hash — group on
    stable_hash60(text) first so the shuffle key is 8 bytes, not the text;
  * n-gram Jaccard: the classic inverted-index join (shingle -> doc); the
    shingle shuffle dominates, and hot shingles skew — production would drop
    top-df shingles; here corpus vocab is small so it's exercised as-is;
  * MinHash+LSH: the scale path — signature size is constant (32 x 4 B) per
    doc regardless of text length, candidate generation joins on 8 band
    signatures instead of all shingles, verification touches only candidate
    pairs. This is the textbook big-data near-dedup pipeline, fully
    expressed in DataFrame ops (no UDFs, no driver loops).
  * SimHash: constant 60-bit fingerprint per doc; banded hamming join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    LSH_BANDS,
    MINHASH_PRIME,
    N_MINHASHES,
    band_weight,
    minhash_value,
    shingles,
    stable_hash60,
    tokenize,
)
from ..fixtures import oracle_on_domain
from ..io import load_table
from ..registry import query

# Shared corpus definition — exact same text runs as a Spark SQL view and as
# the oracle's CTE, so both engines dedup the same input.
CORPUS_SQL = """
    SELECT doc_id, text FROM documents WHERE text <> ''
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id,
           regexp_replace(text, '^([a-z]+) ', 'mutated ') AS text
    FROM documents WHERE text <> '' AND doc_id % 25 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id, text
    FROM documents WHERE text <> '' AND doc_id % 20 = 0
"""

_ORACLE_HASH60 = "CAST(CAST('0x' || substr(md5(text), 1, 15) AS UBIGINT) AS BIGINT)"


def corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(CORPUS_SQL)


def _oracle(body: str) -> str:
    return f"WITH corpus AS ({CORPUS_SQL})\n{body}"


# --------------------------------------------------------------------------
# D1: exact dedup — canonical id per identical text. Hash-groupBy shape:
# the shuffle key is the 60-bit text hash; the window min assigns the
# canonical (smallest) doc_id; md5 collisions are broken by comparing the
# text itself (free here since the hash is a proxy grouping only).
@query(
    "d1_dedup_exact",
    oracle=_oracle(
        f"""
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY {_ORACLE_HASH60}, text) AS canonical_id,
               COUNT(*) OVER (PARTITION BY {_ORACLE_HASH60}, text) AS n_copies
        FROM corpus
        """
    ),
)
def d1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = corpus(spark, sf_dir).withColumn("__h", stable_hash60("text"))
    w = Window.partitionBy("__h", "text")
    return c.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count("*").over(w).alias("n_copies"),
    )


# --------------------------------------------------------------------------
# D2a: exact n-gram Jaccard near-dedup — inverted-index self-join on word
# 3-gram shingles, exact |A∩B| / |A∪B| over distinct shingle sets,
# threshold 0.6. Jaccard is an integer ratio -> bit-exact cross-engine.
#
# Hot-shingle cap: shingles whose document frequency exceeds DF_CAP are
# dropped from the shingle sets BEFORE the self-join (the standard
# stopword-shingle mitigation). Without it, one high-df shingle on a skewed
# 100 TB corpus lands its entire posting list on a single reducer and the
# self-join explodes quadratically in that list. The hot list itself is
# tiny (high-df tail of the vocabulary), so it rides a broadcast anti-join;
# Jaccard is then computed over the capped sets on BOTH engines, keeping
# the oracle in lockstep. DF_CAP=64 exceeds the fixture corpus's max df
# (29 at sf0.1), so fixture results are identical to the uncapped ones —
# the plan shape, not the pruning, is what changes at this scale.

DF_CAP = 64

# Shared capped-shingles SQL (shingle -> hot-filter chain); `corpus` CTE
# must be in scope. Used by the Jaccard pairs below, d2_cc_clusters'
# oracle (curation.py), and d2_containment_pairs.
SHINGLED_SQL = f"""
    shingled0 AS (
        SELECT doc_id, unnest(sh_set) AS shingle FROM (
            SELECT doc_id,
                   list_distinct([toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                                  FOR i IN range(0, len(toks) - 2)]) AS sh_set
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
            WHERE len(toks) >= 3
        )
    ), hot AS (
        SELECT shingle FROM shingled0 GROUP BY shingle HAVING COUNT(*) > {DF_CAP}
    ), shingled AS (
        SELECT doc_id, shingle,
               COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
        FROM (SELECT * FROM shingled0 ANTI JOIN hot USING (shingle))
    )
"""

# Shared capped-pairs SQL: shingles + the thresholded Jaccard self-join.
JACCARD_PAIRS_SQL = f"""
    {SHINGLED_SQL.strip()}, pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS DOUBLE)
                   / (MAX(a.n_sh) + MAX(b.n_sh) - COUNT(*)) AS jaccard
        FROM shingled a JOIN shingled b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING CAST(COUNT(*) AS DOUBLE)
                   / (MAX(a.n_sh) + MAX(b.n_sh) - COUNT(*)) >= 0.6
    )
"""


def doc_text_bytes(sf_dir: str | None) -> int | None:
    """Uncompressed byte volume of documents.text from the parquet
    footer (driver-side, metadata-only; None when unreachable) — the
    shared statistic behind the token/shingle broadcast bounds: a token
    plus its separator occupies >= 2 bytes, so token count <= bytes/2
    and any token- or shingle-keyed frame has at most that many rows
    (a true worst-case bound, not an average — ADVICE r9)."""
    if sf_dir is None:
        return None
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
        total = 0
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                if col.path_in_schema == "text":
                    total += col.total_uncompressed_size
        return total
    except (OSError, ImportError, ValueError, KeyError):
        return None


def _est_hot_rows(sf_dir: str | None) -> int | None:
    """Upper bound on the hot-shingle list: shingle rows <= token count
    <= text bytes / 2 (the worst case is 1-char tokens with 1-char
    separators — ADVICE r9 flagged the former /6 as average-case, which
    a short-token corpus could beat) x 1.09 corpus fan-out, and a hot
    shingle needs > DF_CAP occurrences, so |hot| <= shingles / DF_CAP."""
    b = doc_text_bytes(sf_dir)
    return None if b is None else int(b / 2 * 1.09) // DF_CAP + 1


def capped_shingles(c: DataFrame, sf_dir: str | None = None) -> DataFrame:
    """(doc_id, shingle, n_sh) with df>DF_CAP shingles dropped.

    Two aggregates: the hot list, then the per-doc set size over the
    surviving shingles. The hot-list anti-join's broadcast hint is
    GATED on a bounded statistic (r9): |hot| <= shingle_rows / DF_CAP
    is corpus-dependent, so a pinned hint would force the broadcast at
    any scale. Below the 10 MB-class cap the hint stays (it keeps the
    anti-join map-side, saving a shuffle of the exploded shingle set —
    measured 2x on d2_neardup_jaccard at sf0.1); past it the hint drops
    and AQE's measured-size runtime decision takes over.
    """
    sh0 = (
        c.select(
            "doc_id", F.array_distinct(shingles(tokenize("text"), 3)).alias("sh")
        )
        .filter(F.size("sh") > 0)
        .select("doc_id", F.explode("sh").alias("shingle"))
        # Two consumers (the hot-list aggregate + the anti-join probe):
        # pin so the tokenize/shingle explode runs once, not twice (§5).
        .persist()
    )
    hot = (
        sh0.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > DF_CAP)
        .select("shingle")
    )
    from .similarity import _bounded_broadcast

    # a hot row is one 3-token shingle string (~32 B UnsafeRow)
    kept = sh0.join(
        _bounded_broadcast(hot, _est_hot_rows(sf_dir), 32),
        "shingle", "left_anti",
    )
    return kept.withColumn(
        "n_sh", F.count("*").over(Window.partitionBy("doc_id"))
    )


@query(
    "d2_neardup_jaccard",
    oracle=_oracle(
        f"""
        , {JACCARD_PAIRS_SQL}
        SELECT doc_a, doc_b, jaccard FROM pairs
        """
    ),
)
def d2_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both sides of the inverted-index self-join consume the capped
    # shingle set — pin so the shingle/hot-list chain runs once (§5).
    sh = capped_shingles(corpus(spark, sf_dir), sf_dir).persist()
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count("*").alias("n_inter"),
            F.max("a.n_sh").alias("n_a"),
            F.max("b.n_sh").alias("n_b"),
        )
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return inter.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.6
    )


# --------------------------------------------------------------------------
# D2b: MinHash + LSH — the 100 TB near-dedup path. 32 hash permutations
# over stable-hashed shingles -> 8 band signatures (4 rows each) ->
# candidate pairs share >=1 band -> estimated similarity = fraction of
# matching minhashes. Constant-size state per doc; no all-pairs work.


def _minhash_parts(c: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(shingled, mh, cand): hashed shingle sets, 32-slot signatures, and
    LSH band candidates — shared by the search query and the accuracy eval."""
    shingled = (
        c.select(
            "doc_id",
            F.explode(F.array_distinct(shingles(tokenize("text"), 3))).alias(
                "shingle"
            ),
        )
        .select(
            "doc_id", (stable_hash60("shingle") % MINHASH_PRIME).alias("s_mod")
        )
        .distinct()
    )
    i = F.explode(F.sequence(F.lit(0), F.lit(N_MINHASHES - 1))).alias("i")
    mh = (
        shingled.select("doc_id", "s_mod", i)
        .groupBy("doc_id", "i")
        .agg(F.min(minhash_value(F.col("s_mod"), F.col("i"))).alias("mh"))
    )
    bands = mh.groupBy(
        "doc_id", (F.col("i") / 4).cast("int").alias("band")
    ).agg(F.sum(F.col("mh") * band_weight(F.col("i"))).alias("sig"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return shingled, mh, cand


@query(
    "d2_minhash_lsh",
    oracle=_oracle(
        f"""
        , shingled AS (
            SELECT DISTINCT doc_id,
                   CAST(CAST('0x' || substr(md5(shingle), 1, 15) AS UBIGINT) AS BIGINT)
                       % {MINHASH_PRIME} AS s_mod
            FROM (
                SELECT doc_id, unnest([toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                                       FOR i IN range(0, len(toks) - 2)]) AS shingle
                FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
                WHERE len(toks) >= 3
            )
        ), mh AS (
            SELECT doc_id, i,
                   MIN(((2*i + 1) * s_mod + 7919*(i + 1)) % {MINHASH_PRIME}) AS mh
            FROM shingled, (SELECT unnest(range({N_MINHASHES})) AS i)
            GROUP BY doc_id, i
        ), bands AS (
            SELECT doc_id, i // 4 AS band,
                   SUM(mh * (CASE i % 4 WHEN 0 THEN 1 WHEN 1 THEN 31
                             WHEN 2 THEN 961 ELSE 29791 END)) AS sig
            FROM mh GROUP BY doc_id, i // 4
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               CAST(SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE)
                   / {N_MINHASHES} AS est_similarity
        FROM cand c
        JOIN mh x ON x.doc_id = c.doc_a
        JOIN mh y ON y.doc_id = c.doc_b AND y.i = x.i
        GROUP BY c.doc_a, c.doc_b
        HAVING CAST(SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE)
                   / {N_MINHASHES} >= 0.5
        """
    ),
)
def d2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = corpus(spark, sf_dir)
    shingled, mh, cand = _minhash_parts(c)
    x, y = mh.alias("x"), mh.alias("y")
    est = F.sum(
        F.when(F.col("x.mh") == F.col("y.mh"), 1).otherwise(0)
    ).cast("double") / F.lit(N_MINHASHES)
    return (
        cand.join(x, F.col("x.doc_id") == F.col("doc_a"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("doc_b")) & (F.col("y.i") == F.col("x.i")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(est.alias("est_similarity"))
        .filter(F.col("est_similarity") >= 0.5)
    )


# --------------------------------------------------------------------------
# D2c: SimHash — 60-bit weighted fingerprint over unigram token counts;
# near-dup pairs found by 4x15-bit band join + hamming distance <= 6
# (bit_count(xor)). Constant-size per doc; ties at bit-sum 0 resolve to 0
# deterministically in both engines.
@query(
    "d2_simhash",
    oracle=_oracle(
        """
        , toks AS (
            SELECT doc_id, token, COUNT(*) AS cnt,
                   CAST(CAST('0x' || substr(md5(token), 1, 15) AS UBIGINT) AS BIGINT) AS h
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM corpus)
            WHERE token <> ''
            GROUP BY doc_id, token
        ), bits AS (
            SELECT doc_id, j,
                   CASE WHEN SUM(CASE WHEN (h >> j) & 1 = 1 THEN cnt ELSE -cnt END) > 0
                        THEN 1 ELSE 0 END AS bit
            FROM toks, (SELECT unnest(range(60)) AS j)
            GROUP BY doc_id, j
        ), fp AS (
            SELECT doc_id, SUM(bit * (CAST(1 AS BIGINT) << j)) AS simhash
            FROM bits GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, simhash, k, (simhash >> (15 * k)) & 32767 AS band_val
            FROM fp, (SELECT unnest(range(4)) AS k)
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS hamming
        FROM banded a JOIN banded b
          ON a.k = b.k AND a.band_val = b.band_val AND a.doc_id < b.doc_id
        WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 6
        """
    ),
)
def d2_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = corpus(spark, sf_dir)
    toks = (
        c.select("doc_id", F.explode(tokenize("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", stable_hash60("token"))
    )
    # One pass over (doc_id, token) rows: 60 conditional sums in a single
    # hash aggregate, one output row per doc. The earlier shape exploded a
    # bit-index row per (doc, token, j) — a 60x row inflation through the
    # partial aggregate; this keeps the signature constant-width per doc and
    # gets map-side combine on all 60 buffers at once.
    bit_sums = [
        F.sum(
            F.col("cnt")
            * (F.expr(f"CAST(shiftright(h, {j}) & 1 AS BIGINT)") * 2 - 1)
        ).alias(f"b{j}")
        for j in range(60)
    ]
    fingerprint = sum(
        (
            F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for j in range(60)
        ),
        start=F.lit(0).cast("long"),
    )
    fp = (
        toks.groupBy("doc_id")
        .agg(*bit_sums)
        .select("doc_id", fingerprint.alias("simhash"))
    )
    k = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k")
    banded = fp.select("doc_id", "simhash", k).withColumn(
        "band_val", F.expr("shiftright(simhash, 15 * CAST(k AS INT)) & 32767")
    )
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).alias("hamming")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming,
        )
        .filter(F.col("hamming") <= 6)
        .distinct()
    )


# --------------------------------------------------------------------------
# D1b: latest-wins compaction (SCD type-1 / CDC upsert semantics) — the
# reference re-publishes its dimension on every producer run (SURVEY §2-B
# B10), so the warehouse accumulates row versions; compaction keeps only the
# newest version per key. Expressed as ONE hash aggregate (max + max_by +
# count), not a row_number window: the aggregate gets a map-side partial
# combine, so at 100 TB the shuffle moves one pre-combined row per
# (key, map partition) instead of every row version, and there is no
# per-key sort. A struct-valued max_by ordering would silently demote the
# plan to SortAggregate (struct agg buffers aren't UnsafeRow-mutable), so
# the (ts, event_id) ordering is packed losslessly into one DECIMAL(38,0):
# ts_micros * 2^64 + (event_id + 2^63) — monotone in (ts, event_id), fits
# in 38 digits (|ts_micros| < 2^63 in-range values reach ~2^115 < 10^38),
# and decimal buffers ARE hash-aggregable. Deterministic tiebreak on
# event_id for equal timestamps (event_id is unique, so the key is total).
@query(
    "d1_compact_latest",
    oracle="""
        SELECT user_id, event_type, ts AS latest_ts, value AS latest_value,
               n_versions
        FROM (
            SELECT user_id, event_type, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id, event_type)
                       AS n_versions
            FROM events
        ) v WHERE rn = 1
    """,
)
def d1_compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # Session TZ is pinned UTC (session.configure), so ntz->timestamp->
    # unix_micros is a bijection and the packed key is monotone in ts.
    ordering = F.expr(
        "CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS DECIMAL(38,0))"
        " * CAST('18446744073709551616' AS DECIMAL(20,0))"  # 2^64
        " + CAST(event_id AS DECIMAL(38,0))"
        " + CAST('9223372036854775808' AS DECIMAL(19,0))"  # 2^63 bias
    )
    return (
        e.groupBy("user_id", "event_type")
        .agg(
            F.max("ts").alias("latest_ts"),
            F.max_by("value", ordering).alias("latest_value"),
            F.count("*").alias("n_versions"),
        )
        .select(
            "user_id", "event_type", "latest_ts", "latest_value", "n_versions"
        )
    )


# --------------------------------------------------------------------------
# D2e: record-linkage fuzzy matching — Levenshtein edit distance on a
# 40-char prefix, with candidate pairs blocked on (lang, length-bucket) so
# the self-join is sum(block^2), never N^2 (same scale shape as the
# MinHash/LSH band join: at 100 TB the block key comes from a coarser
# quantizer). Closest 3 pairs per language, ties on ids.
@query(
    "d2_fuzzy_levenshtein",
    oracle="""
        WITH b AS (
            SELECT doc_id, lang, n_chars // 8 AS bucket,
                   substr(text, 1, 40) AS head
            FROM documents
        ),
        pairs AS (
            SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
                   levenshtein(a.head, b.head) AS dist
            FROM b a JOIN b b ON a.lang = b.lang AND a.bucket = b.bucket
                            AND a.doc_id < b.doc_id
        )
        SELECT lang, doc_a, doc_b, dist, rnk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                ORDER BY dist ASC, doc_a ASC, doc_b ASC) AS rnk
            FROM pairs
        ) r WHERE rnk <= 3
    """,
)
def d2_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 8).cast("long").alias("bucket"),
        F.substring("text", 1, 40).alias("head"),
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.lang").alias("lang"),
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.levenshtein("a.head", "b.head").alias("dist"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("dist").asc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    )
    return pairs.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)


# --------------------------------------------------------------------------
# D1c: incremental dedup — the shape a production corpus refresh actually
# runs: dedup a NEW crawl batch against the already-deduped 100 TB index
# without re-deduping the index itself. The batch CTE injects re-crawled
# copies of existing docs (doc_id % 3 = 0 -> must be dropped against the
# index), genuinely new docs ('fresh' prefix, doc_id % 7 = 2 -> must
# survive), and within-batch duplicates of those (doc_id % 14 = 2 subset ->
# must collapse to one canonical row).
#
# Scale design: within-batch dedup windows only over the (small) batch; the
# index probe is a LEFT ANTI join keyed on (60-bit text hash, text) — at
# scale the index is stored bucketed on that hash, so the probe co-locates
# with zero index-side shuffle and the batch side shuffles only its own
# size. The index is never broadcast and never re-aggregated.
NEW_BATCH_SQL = """
    SELECT doc_id + 3000000 AS doc_id, text
    FROM documents WHERE text <> '' AND doc_id % 3 = 0
    UNION ALL
    SELECT doc_id + 4000000 AS doc_id, 'fresh ' || text AS text
    FROM documents WHERE text <> '' AND doc_id % 7 = 2
    UNION ALL
    SELECT doc_id + 5000000 AS doc_id, 'fresh ' || text AS text
    FROM documents WHERE text <> '' AND doc_id % 14 = 2
"""


@query(
    "d1_dedup_incremental",
    oracle=f"""
        WITH newb AS ({NEW_BATCH_SQL}),
        oldb AS (SELECT doc_id, text FROM documents WHERE text <> ''),
        canon AS (
            SELECT doc_id, text,
                   MIN(doc_id) OVER (PARTITION BY text) AS canonical_id,
                   COUNT(*) OVER (PARTITION BY text) AS n_batch_copies
            FROM newb
        )
        SELECT c.doc_id, c.n_batch_copies
        FROM canon c
        WHERE c.doc_id = c.canonical_id
          AND NOT EXISTS (SELECT 1 FROM oldb o WHERE o.text = c.text)
    """,
)
def d1_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    newb = spark.sql(NEW_BATCH_SQL).withColumn("__h", stable_hash60("text"))
    oldb = (
        spark.sql("SELECT text FROM documents WHERE text <> ''")
        .withColumn("__h", stable_hash60("text"))
    )
    w = Window.partitionBy("__h", "text")
    canon = newb.select(
        "doc_id",
        "text",
        "__h",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count("*").over(w).alias("n_batch_copies"),
    )
    return (
        canon.filter(F.col("doc_id") == F.col("canonical_id"))
        .join(oldb, ["__h", "text"], "left_anti")
        .select("doc_id", "n_batch_copies")
    )

# --------------------------------------------------------------------------
# D1d: SCD-2 validity intervals — turn a change stream into slowly-changing-
# dimension rows: each (user_id, event_type) version is valid from its own
# ts until the next version's ts (NULL = current). One lead() window over
# the key partitioning — same single-shuffle shape as d1_compact_latest,
# which materializes only the last version; this keeps full history.
@query(
    "d1_scd2_intervals",
    oracle="""
        SELECT user_id, event_type,
               value AS attr_value,
               ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id, event_type
                              ORDER BY ts ASC, event_id ASC) AS valid_to,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts ASC, event_id ASC) AS version_no
        FROM events
    """,
)
def d1_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return e.select(
        "user_id",
        "event_type",
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version_no"),
    )


# --------------------------------------------------------------------------
# D1e: CDC apply — merge an upsert/delete change batch into a snapshot:
# last operation per key wins; a trailing delete removes the key. The op
# code derives deterministically from the event (event_id % 10 = 0 -> D,
# else U) so both engines see the same change stream. Plan: one window
# shuffle on the key — the standard "deduplicate CDC batch then MERGE"
# compaction, with the merge itself expressed as the rn=1 filter (at scale
# this feeds a partition-overwrite or MERGE INTO sink).
@query(
    "d1_cdc_apply",
    oracle="""
        SELECT user_id, event_type,
               ts AS final_ts, value AS final_value, n_ops
        FROM (
            SELECT user_id, event_type, ts, value,
                   CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_ops
            FROM events
        ) v
        WHERE rn = 1 AND op = 'U'
    """,
)
def d1_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    key = Window.partitionBy("user_id", "event_type")
    w = key.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    op = F.when(F.col("event_id") % 10 == 0, "D").otherwise("U")
    return (
        e.withColumn("op", op)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count("*").over(key))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("final_ts"),
            F.col("value").alias("final_value"),
            "n_ops",
        )
    )


# --------------------------------------------------------------------------
# D1f: incremental aggregate maintenance — the materialized-view refresh
# pattern. A standing daily rollup (the "view") is kept as PARTIAL
# aggregates (count + exact decimal sum); when a new batch arrives, the
# view is updated by merging the batch's partials into the stored ones —
# never by re-scanning history. At 100 TB the difference is a full-corpus
# recompute per refresh vs work proportional to the delta; storing
# (count, sum) partials instead of finished averages is what makes the
# merge closed under union (avg alone cannot be merged).
# Fixture split: event_id % 10 != 0 plays the stored view's history,
# % 10 == 0 plays the arriving batch. The oracle recomputes from scratch —
# the merged result must be indistinguishable from a full recompute.
@query(
    "d1_incremental_agg_merge",
    oracle="""
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
                   AS avg_value
        FROM events
        GROUP BY 1, 2
    """,
)
def d1_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.to_date("ts").alias("day")
        ).agg(
            F.count("*").alias("__n"),
            F.sum(F.col("value").cast("decimal(27,6)")).alias("__s"),
        )

    history = partials(e.filter(F.col("event_id") % 10 != 0))
    batch = partials(e.filter(F.col("event_id") % 10 == 0))
    merged = (
        history.unionByName(batch)
        .groupBy("event_type", "day")
        .agg(F.sum("__n").alias("n_events"), F.sum("__s").alias("__s2"))
    )
    total = F.col("__s2").cast("double")
    return merged.select(
        "event_type",
        "day",
        "n_events",
        total.alias("sum_value"),
        (total / F.col("n_events")).alias("avg_value"),
    )


# --------------------------------------------------------------------------
# D1g: bucket-level table diff (Merkle-style reconciliation) — find WHERE
# two copies of a table diverge without comparing rows. Each side collapses
# to 256 (bucket, count, xor-of-row-digest) summaries; a full-outer join of
# the summaries yields exactly the drifted buckets, so repair then touches
# only those buckets' rows. This is the replica-audit / backfill-scoping
# primitive: at 100 TB the exchange is 256 rows per side, not the table.
# The "replica" here injects deterministic drift (2 corruption classes:
# mutated event_type on event_id % 1000 = 7, dropped rows on
# event_id % 5000 = 123); doubles stay out of the digest (engine-specific
# float formatting — same policy as rel_table_checksum).
@query(
    "d1_table_diff_buckets",
    oracle="""
        WITH digested AS (
            SELECT event_id % 256 AS bucket, event_id, user_id, ts,
                   event_type
            FROM events
        ),
        base AS (
            SELECT bucket, COUNT(*) AS n_rows,
                   bit_xor(CAST(CAST('0x' || substr(md5(concat_ws('|',
                       event_id, user_id, event_type,
                       strftime(ts, '%Y-%m-%d %H:%M:%S'))), 1, 15)
                       AS UBIGINT) AS BIGINT)) AS ck
            FROM digested GROUP BY bucket
        ),
        rep_rows AS (
            SELECT event_id % 256 AS bucket, event_id, user_id, ts,
                   CASE WHEN event_id % 1000 = 7 THEN 'corrupted'
                        ELSE event_type END AS event_type
            FROM events WHERE event_id % 5000 <> 123
        ),
        rep AS (
            SELECT bucket, COUNT(*) AS n_rows,
                   bit_xor(CAST(CAST('0x' || substr(md5(concat_ws('|',
                       event_id, user_id, event_type,
                       strftime(ts, '%Y-%m-%d %H:%M:%S'))), 1, 15)
                       AS UBIGINT) AS BIGINT)) AS ck
            FROM rep_rows GROUP BY bucket
        )
        SELECT COALESCE(b.bucket, r.bucket) AS bucket,
               b.n_rows AS base_rows, r.n_rows AS replica_rows,
               b.ck AS base_checksum, r.ck AS replica_checksum
        FROM base b FULL OUTER JOIN rep r ON b.bucket = r.bucket
        WHERE b.ck IS DISTINCT FROM r.ck
           OR b.n_rows IS DISTINCT FROM r.n_rows
    """,
)
def d1_table_diff_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def summarize(df: DataFrame) -> DataFrame:
        digest = stable_hash60(
            F.concat_ws(
                "|",
                "event_id",
                "user_id",
                "event_type",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
            )
        )
        return df.groupBy((F.col("event_id") % 256).alias("bucket")).agg(
            F.count("*").alias("n_rows"), F.bit_xor(digest).alias("ck")
        )

    base = summarize(e)
    replica = summarize(
        e.filter(F.col("event_id") % 5000 != 123).withColumn(
            "event_type",
            F.when(F.col("event_id") % 1000 == 7, F.lit("corrupted")).otherwise(
                F.col("event_type")
            ),
        )
    )
    b, r = base.alias("b"), replica.alias("r")
    joined = b.join(r, F.col("b.bucket") == F.col("r.bucket"), "full_outer")
    differs = ~(
        F.col("b.ck").eqNullSafe(F.col("r.ck"))
        & F.col("b.n_rows").eqNullSafe(F.col("r.n_rows"))
    )
    return joined.filter(differs).select(
        F.coalesce(F.col("b.bucket"), F.col("r.bucket")).alias("bucket"),
        F.col("b.n_rows").alias("base_rows"),
        F.col("r.n_rows").alias("replica_rows"),
        F.col("b.ck").alias("base_checksum"),
        F.col("r.ck").alias("replica_checksum"),
    )


# --------------------------------------------------------------------------
# D2g: asymmetric CONTAINMENT pairs — Jaccard misses subset/superset
# near-dups (a doc quoted whole inside a longer one scores low on union but
# 1.0 on containment |A∩B|/|A|). Same inverted-index + hot-shingle-cap
# machinery as d2_neardup_jaccard (one shingle shuffle, pair work bounded
# by posting lists), emitting both direction ratios per unordered pair;
# integer ratios -> bit-exact cross-engine. The fixture's verbatim copies
# score 1.0 both ways; the one-token mutants score just under 1.
@query(
    "d2_containment_pairs",
    oracle=_oracle(
        f"""
        , {SHINGLED_SQL.strip()}
        , inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS n_inter,
                   MAX(a.n_sh) AS n_a, MAX(b.n_sh) AS n_b
            FROM shingled a JOIN shingled b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(n_inter AS DOUBLE) / n_a AS a_in_b,
               CAST(n_inter AS DOUBLE) / n_b AS b_in_a
        FROM inter
        WHERE CAST(n_inter AS DOUBLE) / n_a >= 0.8
           OR CAST(n_inter AS DOUBLE) / n_b >= 0.8
        """
    ),
)
def d2_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both sides of the inverted-index self-join consume the capped
    # shingle set — pin so the shingle/hot-list chain runs once (§5).
    sh = capped_shingles(corpus(spark, sf_dir), sf_dir).persist()
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count("*").alias("n_inter"),
            F.max("a.n_sh").alias("n_a"),
            F.max("b.n_sh").alias("n_b"),
        )
    )
    a_in_b = F.col("n_inter").cast("double") / F.col("n_a")
    b_in_a = F.col("n_inter").cast("double") / F.col("n_b")
    return (
        inter.select(
            "doc_a",
            "doc_b",
            a_in_b.alias("a_in_b"),
            b_in_a.alias("b_in_a"),
        )
        .filter((F.col("a_in_b") >= 0.8) | (F.col("b_in_a") >= 0.8))
    )


# --------------------------------------------------------------------------
# D1h: point-in-time (as-of-T) dimension lookup — "what did the dimension
# look like on Jan 15?", the query every SCD-2 history exists to answer.
# The Spark plan is the SCALE-RIGHT formulation: push the ts <= T predicate
# into the scan, then the same single hash aggregate as d1_compact_latest
# (max_by over the decimal-packed ordering) — partial-combined, no window,
# no materialized interval table. The ORACLE deliberately answers from the
# OTHER formulation: build the SCD-2 validity intervals and pick the row
# whose [valid_from, valid_to) contains T — so this query cross-proves the
# two representations agree (zero-width intervals from same-timestamp
# versions are excluded by the half-open containment, matching the
# aggregate's (ts, event_id) tiebreak).
PIT_T = "2024-01-15 00:00:00"


@query(
    "d1_scd2_point_in_time",
    oracle=f"""
        SELECT user_id, event_type,
               attr_value AS value_at_t, version_no
        FROM (
            SELECT user_id, event_type, value AS attr_value,
                   ts AS valid_from,
                   LEAD(ts) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts ASC, event_id ASC) AS valid_to,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts ASC, event_id ASC)
                       AS version_no
            FROM events
        ) v
        WHERE valid_from <= TIMESTAMP '{PIT_T}'
          AND (valid_to IS NULL OR valid_to > TIMESTAMP '{PIT_T}')
    """,
)
def d1_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") <= F.lit(PIT_T).cast("timestamp_ntz")
    )
    ordering = F.expr(
        "CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS DECIMAL(38,0))"
        " * CAST('18446744073709551616' AS DECIMAL(20,0))"
        " + CAST(event_id AS DECIMAL(38,0))"
        " + CAST('9223372036854775808' AS DECIMAL(19,0))"
    )
    return (
        e.groupBy("user_id", "event_type")
        .agg(
            F.max_by("value", ordering).alias("value_at_t"),
            F.count("*").alias("version_no"),
        )
        .select("user_id", "event_type", "value_at_t", "version_no")
    )


# --------------------------------------------------------------------------
# D2h: MinHash estimator accuracy — for every LSH candidate pair, the
# signature-agreement estimate vs the EXACT Jaccard over the same hashed
# shingle sets, with the absolute error. Completes the
# measure-your-approximations triad (LSH recall, IVF recall, MinHash
# accuracy): 32 permutations bound the estimator's stderr at
# sqrt(j(1-j)/32) ~ 0.09, and this query is how that bound is watched in
# production (a drifting corpus can push band thresholds off). All three
# columns are integer ratios — bit-exact cross-engine.
@query(
    "d2_minhash_accuracy_eval",
    oracle=_oracle(
        f"""
        , shingled AS (
            SELECT DISTINCT doc_id,
                   CAST(CAST('0x' || substr(md5(shingle), 1, 15) AS UBIGINT) AS BIGINT)
                       % {MINHASH_PRIME} AS s_mod
            FROM (
                SELECT doc_id, unnest([toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                                       FOR i IN range(0, len(toks) - 2)]) AS shingle
                FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
                WHERE len(toks) >= 3
            )
        ), mh AS (
            SELECT doc_id, i,
                   MIN(((2*i + 1) * s_mod + 7919*(i + 1)) % {MINHASH_PRIME}) AS mh
            FROM shingled, (SELECT unnest(range({N_MINHASHES})) AS i)
            GROUP BY doc_id, i
        ), bands AS (
            SELECT doc_id, i // 4 AS band,
                   SUM(mh * (CASE i % 4 WHEN 0 THEN 1 WHEN 1 THEN 31
                             WHEN 2 THEN 961 ELSE 29791 END)) AS sig
            FROM mh GROUP BY doc_id, i // 4
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        ), est AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE)
                       / {N_MINHASHES} AS est_similarity
            FROM cand c
            JOIN mh x ON x.doc_id = c.doc_a
            JOIN mh y ON y.doc_id = c.doc_b AND y.i = x.i
            GROUP BY c.doc_a, c.doc_b
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id
        ), exact AS (
            SELECT c.doc_a, c.doc_b,
                   COUNT(*) AS n_inter
            FROM cand c
            JOIN shingled sa ON sa.doc_id = c.doc_a
            JOIN shingled sb ON sb.doc_id = c.doc_b AND sb.s_mod = sa.s_mod
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT e.doc_a, e.doc_b, e.est_similarity,
               CAST(x.n_inter AS DOUBLE)
                   / (za.n_sh + zb.n_sh - x.n_inter) AS exact_jaccard,
               ABS(e.est_similarity
                   - CAST(x.n_inter AS DOUBLE)
                     / (za.n_sh + zb.n_sh - x.n_inter)) AS abs_err
        FROM est e
        JOIN exact x ON x.doc_a = e.doc_a AND x.doc_b = e.doc_b
        JOIN sizes za ON za.doc_id = e.doc_a
        JOIN sizes zb ON zb.doc_id = e.doc_b
        """
    ),
)
def d2_minhash_accuracy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = corpus(spark, sf_dir)
    shingled, mh, cand = _minhash_parts(c)
    # r11: the r10 shingled/mh/cand triple pin REGRESSED this query ~1.2x
    # (3.19 -> 3.9 s in both final-code runs; VERDICT r10 #2) — same
    # failure mode as d2_lsh_band_sweep's pins: the columnar-cache build
    # of the exploded/joined intermediates costs more than the recomputes
    # it saves at this state size. Reverted to the r9 lazy shape.
    x, y = mh.alias("x"), mh.alias("y")
    est = (
        cand.join(x, F.col("x.doc_id") == F.col("doc_a"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("doc_b")) & (F.col("y.i") == F.col("x.i")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            (
                F.sum(
                    F.when(F.col("x.mh") == F.col("y.mh"), 1).otherwise(0)
                ).cast("double")
                / F.lit(N_MINHASHES)
            ).alias("est_similarity")
        )
    )
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa, sb = shingled.alias("sa"), shingled.alias("sb")
    exact = (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sb.s_mod") == F.col("sa.s_mod")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    za = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
    )
    zb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        est.join(exact, ["doc_a", "doc_b"])
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "est_similarity",
            jac.alias("exact_jaccard"),
            F.abs(F.col("est_similarity") - jac).alias("abs_err"),
        )
    )


# --------------------------------------------------------------------------
# D1g: dedup savings report — duplicate-group size histogram with document
# and character savings, the "what did dedup buy us" audit every corpus
# curation run reports next to the dedup itself. Stage 1 is the exact-dedup
# hash aggregate (shuffle on the 60-bit text hash with text as the
# collision tiebreak, same key as d1_dedup_exact so the partitioning
# strategy is shared); stage 2 collapses to one row per distinct group
# size — a few dozen rows at any corpus scale. All-integer arithmetic:
# bit-exact cross-engine.
@query(
    "d1_dedup_stats",
    oracle=_oracle(
        f"""
        SELECT n_copies AS group_size,
               COUNT(*) AS n_groups,
               n_copies * COUNT(*) AS n_docs,
               (n_copies - 1) * COUNT(*) AS dup_docs,
               CAST(SUM((n_copies - 1) * n_chars) AS BIGINT) AS chars_dropped
        FROM (
            SELECT {_ORACLE_HASH60} AS h, text,
                   COUNT(*) AS n_copies,
                   MIN(length(text)) AS n_chars
            FROM corpus
            GROUP BY {_ORACLE_HASH60}, text
        ) groups
        GROUP BY n_copies
        """
    ),
)
def d1_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = corpus(spark, sf_dir).withColumn("__h", stable_hash60("text"))
    groups = c.groupBy("__h", "text").agg(
        F.count("*").alias("n_copies"),
        F.min(F.length("text")).alias("n_chars"),
    )
    return groups.groupBy(F.col("n_copies").alias("group_size")).agg(
        F.count("*").alias("n_groups"),
        (F.col("group_size") * F.count("*")).alias("n_docs"),
        ((F.col("group_size") - 1) * F.count("*")).alias("dup_docs"),
        F.sum((F.col("n_copies") - 1) * F.col("n_chars")).alias(
            "chars_dropped"
        ),
    )


# --------------------------------------------------------------------------
# D2h: n-gram duplication coverage — for every document, the fraction of
# its distinct 3-gram shingles that also occur in at least one OTHER
# document: the fine-grained duplication audit modern web-corpus pipelines
# (CCNet/RefinedWeb-style) run alongside whole-document near-dedup, since
# heavy partial overlap degrades training data even when full-document
# Jaccard stays under threshold. Reuses the capped-shingle chain (hot
# shingles dropped by broadcast anti-join BEFORE any df work, on both
# engines). Plan: shingle df is one partial-aggregated shuffle on shingle;
# the join back is co-partitioned on the same key, so the posting lists
# never move twice; the per-doc rollup is the only doc_id shuffle.
@query(
    "d2_dup_ngram_coverage",
    oracle=_oracle(
        f"""
        , {SHINGLED_SQL.strip()},
        df AS (
            SELECT shingle, COUNT(*) AS n_docs
            FROM shingled GROUP BY shingle
        )
        SELECT s.doc_id,
               COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared,
               CAST(SUM(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*) AS dup_coverage
        FROM shingled s JOIN df ON df.shingle = s.shingle
        GROUP BY s.doc_id
        """
    ),
)
def d2_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One df aggregate serves BOTH the hot-shingle cap and the coverage
    # counts (dropping a hot shingle removes it from every doc, so the
    # survivors' df values are unchanged) — capped_shingles() would build
    # the hot list with its own second shuffle of the exploded rows.
    c = corpus(spark, sf_dir)
    sh0 = (
        c.select(
            "doc_id",
            F.array_distinct(shingles(tokenize("text"), 3)).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .select("doc_id", F.explode("sh").alias("shingle"))
    )
    from .similarity import _bounded_broadcast

    df = sh0.groupBy("shingle").agg(F.count("*").alias("n_docs"))
    hot = df.filter(F.col("n_docs") > DF_CAP).select("shingle")
    # gated hint (capped_shingles rationale, r9): map-side anti-join
    # while the footer-derived bound fits, AQE shuffle past it
    sh = sh0.join(
        _bounded_broadcast(hot, _est_hot_rows(sf_dir), 32),
        "shingle", "left_anti",
    )
    shared = (F.col("n_docs") >= 2).cast("long")
    return (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(shared).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            (F.col("n_shared").cast("double") / F.col("n_shingles")).alias(
                "dup_coverage"
            ),
        )
    )


# --------------------------------------------------------------------------
# D1h: normalization-aware exact dedup — canonicalize text (lowercase,
# collapse whitespace runs, trim) BEFORE hashing, so trivially-reformatted
# copies collapse into one group: the middle ground between byte-exact
# dedup (d1) and shingled near-dedup (d2) that production corpus pipelines
# (Dolma-style) run as their first pass. Same hash-groupBy scale shape as
# d1_dedup_exact — the shuffle key is the 60-bit hash of the CANONICAL
# text; the canonical form itself is computed map-side and carried only as
# the collision tiebreak.
@query(
    "d1_dedup_normalized",
    oracle=_oracle(
        """
        SELECT doc_id, canon_hash, n_copies FROM (
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5(canon), 1, 15) AS UBIGINT)
                        AS BIGINT) AS canon_hash,
                   COUNT(*) OVER (PARTITION BY canon) AS n_copies
            FROM (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), ' +', ' ', 'g'))
                           AS canon
                FROM corpus
            ) c
        ) g
        WHERE n_copies >= 2
        """
    ),
)
def d1_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = corpus(spark, sf_dir).select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.lower(F.col("text")), " +", " ")
        ).alias("canon"),
    )
    hashed = c.select(
        "doc_id", "canon", stable_hash60("canon").alias("canon_hash")
    )
    w = Window.partitionBy("canon_hash", "canon")
    return (
        hashed.select(
            "doc_id",
            "canon_hash",
            F.count("*").over(w).alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 2)
    )


# --------------------------------------------------------------------------
# D1: golden-record survivorship merge — the MDM upgrade over
# d1_compact_latest: instead of taking the whole latest row, each FIELD
# independently survives from the latest version where it was non-null
# (real feeds null out fields intermittently; whole-row latest loses
# data). Nulls are injected deterministically (value gaps on
# event_id % 7, prop gaps on event_id % 5) since the fixture is
# null-free. Per-column survivorship is one max_by(struct) per field
# inside a single hash aggregate — partial+final, no window sort, the
# same plan shape the compaction uses; at 100 TB the map-side combine
# keeps only one struct per (key, field) in flight.
@query(
    "d1_golden_record",
    oracle="""
        WITH versions AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_id % 7 <> 0 THEN value END AS v_value,
                   CASE WHEN event_id % 5 <> 0 THEN
                       CAST(json_extract_string(props, '$.k') AS INT)
                   END AS v_k
            FROM events
        )
        SELECT user_id,
               COUNT(*) AS n_versions,
               MAX(CASE WHEN v_value IS NOT NULL THEN
                   {'ts': ts, 'eid': event_id, 'v': v_value} END).v
                   AS golden_value,
               MAX(CASE WHEN v_k IS NOT NULL THEN
                   {'ts': ts, 'eid': event_id, 'v': v_k} END).v
                   AS golden_k,
               COUNT(v_value) AS n_value_versions,
               COUNT(v_k) AS n_k_versions
        FROM versions
        GROUP BY user_id
    """,
)
def d1_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    versions = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_id") % 7 != 0, F.col("value")
        ).alias("v_value"),
        F.when(
            F.col("event_id") % 5 != 0,
            F.get_json_object("props", "$.k").cast("int"),
        ).alias("v_k"),
    )

    def survive(col):
        # latest non-null: max over (ts, event_id) structs, null rows
        # excluded by the CASE; (ts, event_id) is a total order
        return F.max(
            F.when(
                F.col(col).isNotNull(),
                F.struct(F.col("ts"), F.col("event_id"), F.col(col)),
            )
        )[col]

    return versions.groupBy("user_id").agg(
        F.count("*").alias("n_versions"),
        survive("v_value").alias("golden_value"),
        survive("v_k").alias("golden_k"),
        F.count("v_value").alias("n_value_versions"),
        F.count("v_k").alias("n_k_versions"),
    )


# --------------------------------------------------------------------------
# D1: SCD type-3 — the third slowly-changing-dimension variant beside
# latest-wins (SCD1, d1_compact_latest) and full history (SCD2,
# d1_scd2_intervals): keep the CURRENT value plus one PREVIOUS-value
# column and the change timestamp. Both values fall out of ONE hash
# aggregate via max_by structs over the (ts, event_id) total order —
# current = latest version, previous = latest version strictly older
# than the current one, found as the max over versions excluding the
# max. No window sort: the same partial+final aggregate shape as the
# compaction, exact on ties by the event_id tiebreak.
@query(
    "d1_scd3_prev_value",
    oracle="""
        WITH ranked AS (
            SELECT user_id, event_type, ts, event_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        SELECT user_id, event_type,
               MAX(CASE WHEN rn = 1 THEN value END) AS current_value,
               MAX(CASE WHEN rn = 2 THEN value END) AS previous_value,
               MAX(CASE WHEN rn = 1 THEN ts END) AS changed_at,
               COUNT(*) AS n_versions
        FROM ranked
        GROUP BY user_id, event_type
    """,
)
def d1_scd3_prev_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ver = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    agg = e.groupBy("user_id", "event_type").agg(
        F.max(ver).alias("cur"),
        F.count("*").alias("n_versions"),
    )
    # previous = max version strictly below the current one: re-aggregate
    # excluding the current (ts, event_id); done as a second max_by over
    # a filtered struct in the SAME pass via conditional aggregation
    agg2 = (
        e.alias("e")
        .join(
            agg.select(
                "user_id",
                "event_type",
                F.col("cur.ts").alias("c_ts"),
                F.col("cur.event_id").alias("c_eid"),
            ),
            ["user_id", "event_type"],
        )
        .groupBy("user_id", "event_type")
        .agg(
            F.max(
                F.when(
                    (F.col("ts") < F.col("c_ts"))
                    | (
                        (F.col("ts") == F.col("c_ts"))
                        & (F.col("event_id") < F.col("c_eid"))
                    ),
                    ver,
                )
            ).alias("prev")
        )
    )
    return (
        agg.join(agg2, ["user_id", "event_type"])
        .select(
            "user_id",
            "event_type",
            F.col("cur.value").alias("current_value"),
            F.col("prev.value").alias("previous_value"),
            F.col("cur.ts").alias("changed_at"),
            "n_versions",
        )
    )


# --------------------------------------------------------------------------
# D1: erasure audit — the right-to-be-forgotten dry run: given a
# deletion list (user_id % 37 = 0 stands in for the request queue),
# report the purge blast radius across the raw events table AND a
# derived table (trades), whose rows tie back to a user only through
# their originating event (trade_id = event_id) — the lineage walk a
# real erasure job must do before destroying anything. The derived-side
# count is a LEFT SEMI probe of trades against the deletion-marked
# event ids (hash semi-join on the id — the deletion set is data-sized,
# so no broadcast assumption); output is counts + erased share per
# table, emitted BEFORE any write. Complements
# rel_delete_cascade_audit's FK walk on the warehouse side.
@query(
    "d1_erasure_audit",
    oracle=oracle_on_domain(
        """
        , del_events AS (
            SELECT event_id FROM events WHERE user_id % 37 = 0
        ),
        ev AS (
            SELECT COUNT(*) AS n_rows,
                   (SELECT COUNT(*) FROM del_events) AS n_to_erase
            FROM events
        ),
        tr AS (
            SELECT (SELECT COUNT(*) FROM trades) AS n_rows,
                   COUNT(*) AS n_to_erase
            FROM trades t
            WHERE t.trade_id IN (SELECT event_id FROM del_events)
        )
        SELECT 'events' AS table_name, n_rows, n_to_erase,
               CAST(n_to_erase AS DOUBLE) / n_rows AS erase_share
        FROM ev
        UNION ALL
        SELECT 'trades', n_rows, n_to_erase,
               CAST(n_to_erase AS DOUBLE) / n_rows
        FROM tr
        """
    ),
)
def d1_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..fixtures import domain_table

    e = load_table(spark, sf_dir, "events")
    del_events = e.filter(F.col("user_id") % 37 == 0).select("event_id")
    ev = e.agg(F.count("*").alias("n_rows")).crossJoin(
        del_events.agg(F.count("*").alias("n_to_erase"))
    )
    t = domain_table(spark, sf_dir, "trades")
    hit = t.join(
        del_events, t["trade_id"] == del_events["event_id"], "left_semi"
    )
    tr = t.agg(F.count("*").alias("n_rows")).crossJoin(
        hit.agg(F.count("*").alias("n_to_erase"))
    )
    share = (F.col("n_to_erase").cast("double") / F.col("n_rows")).alias(
        "erase_share"
    )
    return ev.select(
        F.lit("events").alias("table_name"), "n_rows", "n_to_erase", share
    ).unionAll(
        tr.select(
            F.lit("trades").alias("table_name"), "n_rows", "n_to_erase", share
        )
    )


# --------------------------------------------------------------------------
# D1: content-defined chunk dedup — CDC (rolling/content-hash boundaries)
# applied at the token level: a token whose stable hash lands in 1/8 of
# the hash space STARTS a new chunk, so chunk boundaries are a function
# of content alone and survive insertions/shifts that break fixed-stride
# chunking (the d4_passage_chunks grid). The dedup report buckets chunk
# fingerprints by copy count — the storage/compute-savings estimate a
# CDC-dedup rollout is sized with. Plan: one posexplode to token grain
# (shuffle on doc_id for the per-doc cumulative-boundary window), one
# hash agg to chunk grain, a slice-and-hash join back to the bounded doc
# arrays, then a fingerprint-grain agg — never all-pairs, and chunk text
# itself is reconstructed only once per (doc, chunk), not per token.
CDC_MOD = 8


@query(
    "d1_cdc_chunk_dedup",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents WHERE text <> ''
        ),
        pos AS (
            SELECT doc_id, i, ts[i] AS tok,
                   CASE WHEN CAST(CAST('0x' || substr(md5(ts[i]), 1, 15)
                                  AS UBIGINT) AS BIGINT) % {CDC_MOD} = 0
                        THEN 1 ELSE 0 END AS fl
            FROM toks, unnest(generate_series(1, len(ts))) AS u(i)
        ),
        cid AS (
            SELECT doc_id, i,
                   SUM(fl) OVER (PARTITION BY doc_id ORDER BY i ASC
                                 ROWS UNBOUNDED PRECEDING) AS chunk_id
            FROM pos
        ),
        bounds AS (
            SELECT doc_id, chunk_id, MIN(i) AS p0, MAX(i) AS p1,
                   COUNT(*) AS n_tok
            FROM cid GROUP BY doc_id, chunk_id
        ),
        fps AS (
            SELECT b.n_tok,
                   md5(array_to_string(t.ts[b.p0:b.p1], ' ')) AS fp
            FROM bounds b JOIN toks t ON t.doc_id = b.doc_id
        ),
        grouped AS (
            SELECT fp, COUNT(*) AS n_copies, MIN(n_tok) AS n_tok
            FROM fps GROUP BY fp
        )
        SELECT n_copies,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
               CAST(SUM(n_copies) AS BIGINT) AS total_occurrences,
               CAST(SUM((n_copies - 1) * n_tok) AS BIGINT)
                   AS tokens_dropped_by_dedup
        FROM grouped GROUP BY n_copies
    """,
)
def d1_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import stable_hash60, tokenize

    d = load_table(spark, sf_dir, "documents").filter(F.col("text") != "")
    toks = d.select("doc_id", tokenize("text").alias("ts"))
    pos = toks.select(
        "doc_id", F.posexplode("ts").alias("i0", "tok")
    ).select(
        "doc_id",
        (F.col("i0") + 1).alias("i"),
        F.when(stable_hash60("tok") % CDC_MOD == 0, 1)
        .otherwise(0)
        .alias("fl"),
    )
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("i").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cid = pos.select(
        "doc_id", "i", F.sum("fl").over(wcum).alias("chunk_id")
    )
    bounds = cid.groupBy("doc_id", "chunk_id").agg(
        F.min("i").alias("p0"),
        F.max("i").alias("p1"),
        F.count("*").alias("n_tok"),
    )
    fps = bounds.join(toks, "doc_id").select(
        "n_tok",
        F.md5(
            F.array_join(
                F.slice(
                    "ts", F.col("p0").cast("int"), (F.col("p1") - F.col("p0") + 1).cast("int")
                ),
                " ",
            )
        ).alias("fp"),
    )
    grouped = fps.groupBy("fp").agg(
        F.count("*").alias("n_copies"), F.min("n_tok").alias("n_tok")
    )
    return grouped.groupBy("n_copies").agg(
        F.count("*").alias("n_distinct_chunks"),
        F.sum("n_copies").alias("total_occurrences"),
        F.sum((F.col("n_copies") - 1) * F.col("n_tok")).alias(
            "tokens_dropped_by_dedup"
        ),
    )


# --------------------------------------------------------------------------
# D1: broadcast Bloom-filter dedup prefilter — the 100 TB anti-join
# accelerator. Probing a billion-row dedup index for "is this new document
# already known?" is normally a full shuffle of the new batch against the
# index. A Bloom filter over the index keys turns that into a MAP-SIDE
# membership test: only Bloom candidates (true dups + the audited
# false-positive tail) continue to the exact verification join, so the
# shuffle shrinks from |batch| to |candidates|. Spark's own runtime bloom
# rewrite (spark.sql.optimizer.runtime.bloomFilter.enabled) does this
# inside one query; this operator is the cross-JOB form a curation pipeline
# needs (index built once, probed by every incoming batch) — and unlike the
# builtin's murmur sketch it is exact-deterministic, so DuckDB reproduces
# the bitmap bit-for-bit.
#
# Construction: m = 8192 bit positions, k = 4 hash functions sliced from
# disjoint 13-bit windows of the 60-bit md5 key (pure shifts — engine
# portable). The filter itself is ONE row holding the sorted distinct
# position set (<= 8192 ints); the probe cross-joins that broadcast row and
# tests all 4 positions with a HOF — zero probe-side shuffle, exactly how a
# production broadcast-bitset Bloom behaves. The report audits the filter:
# false positives are expected (and priced), false negatives are
# structurally impossible (n_missed is asserted 0 in tests).
BLOOM_BITS = 8192
BLOOM_K = 4


@query(
    "d1_bloom_prefilter",
    oracle=_oracle(
        f"""
        , hx AS (
            SELECT doc_id, text,
                   {_ORACLE_HASH60} AS h
            FROM corpus
        ),
        idx AS (SELECT DISTINCT h, text FROM hx WHERE doc_id < 1000000),
        bloom AS (
            SELECT DISTINCT (h >> (13 * i)) % {BLOOM_BITS} AS pos
            FROM (SELECT DISTINCT h FROM idx)
            CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
        ),
        probe AS (
            SELECT p.doc_id, p.text, p.h,
                   (SELECT COUNT(*) FROM bloom b WHERE b.pos IN (
                        (p.h >> 0) % {BLOOM_BITS},
                        (p.h >> 13) % {BLOOM_BITS},
                        (p.h >> 26) % {BLOOM_BITS},
                        (p.h >> 39) % {BLOOM_BITS})) AS n_pos_hit,
                   EXISTS (SELECT 1 FROM idx i
                           WHERE i.h = p.h AND i.text = p.text) AS is_dup
            FROM hx p WHERE p.doc_id >= 1000000
        ),
        flagged AS (
            SELECT is_dup,
                   n_pos_hit = (SELECT COUNT(DISTINCT (h >> (13 * i))
                                               % {BLOOM_BITS})
                                FROM (SELECT probe.h AS h) one
                                CROSS JOIN (SELECT unnest([0,1,2,3]) AS i)
                               ) AS is_candidate
            FROM probe
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
               CAST(SUM(CASE WHEN is_candidate THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_candidates,
               CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_true_dups,
               CAST(SUM(CASE WHEN is_candidate AND NOT is_dup
                             THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_false_positives,
               CAST(SUM(CASE WHEN is_dup AND NOT is_candidate
                             THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_missed,
               CAST(SUM(CASE WHEN is_candidate AND NOT is_dup
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / SUM(CASE WHEN NOT is_dup THEN 1 ELSE 0 END)
                   AS fp_rate
        FROM flagged
        """
    ),
)
def d1_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    hx = corpus(spark, sf_dir).withColumn("h", stable_hash60("text"))
    idx = hx.filter(F.col("doc_id") < 1000000).select("h", "text").distinct()

    def positions(h):
        return F.array(
            *[
                (F.shiftright(h, 13 * i) % BLOOM_BITS)
                for i in range(BLOOM_K)
            ]
        )

    # the filter: one row, the sorted distinct position set (bounded by m)
    bloom = (
        idx.select(F.explode(positions(F.col("h"))).alias("pos"))
        .agg(F.sort_array(F.collect_set("pos")).alias("bloom"))
    )

    probe = hx.filter(F.col("doc_id") >= 1000000)
    flagged = (
        probe.crossJoin(F.broadcast(bloom))  # 1-row filter, map-side test
        .withColumn(
            "is_candidate",
            F.forall(
                positions(F.col("h")),
                lambda p: F.array_contains("bloom", p),
            ),
        )
        .join(
            idx.select("h", "text").withColumn("is_dup", F.lit(True)),
            ["h", "text"],
            "left",
        )
        .withColumn("is_dup", F.coalesce("is_dup", F.lit(False)))
    )
    return flagged.agg(
        F.count("*").cast("long").alias("n_probe"),
        F.sum(F.col("is_candidate").cast("long"))
        .cast("long")
        .alias("n_candidates"),
        F.sum(F.col("is_dup").cast("long")).cast("long").alias("n_true_dups"),
        F.sum((F.col("is_candidate") & ~F.col("is_dup")).cast("long"))
        .cast("long")
        .alias("n_false_positives"),
        F.sum((F.col("is_dup") & ~F.col("is_candidate")).cast("long"))
        .cast("long")
        .alias("n_missed"),
        (
            F.sum((F.col("is_candidate") & ~F.col("is_dup")).cast("long"))
            .cast("double")
            / F.sum((~F.col("is_dup")).cast("long"))
        ).alias("fp_rate"),
    )


# --------------------------------------------------------------------------
# D2: LSH band-tuning sweep — the (bands, rows) knob is THE precision/recall
# dial of MinHash LSH (the S-curve P[cand] = 1-(1-j^r)^b), and at 100 TB it
# is also the shuffle dial: more bands = more candidate pairs into the
# verify join. This sweep prices three layouts of the SAME 32-slot
# signature table — (16 bands x 2 rows) recall-heavy, (8 x 4) the engine's
# shipping default, (4 x 8) precision-heavy — against the exact-Jaccard
# truth set, completing the index-tuning trio beside d3_ivf_nprobe_sweep
# and d1_bloom_prefilter. The signatures are computed ONCE and regrouped
# per arm (3 vocabulary-bounded aggregates, never 3 corpus scans); band
# signatures fold the in-band minhash run through md5, which cannot
# overflow for any row count (the 31^k integer fold caps at r=4).
# Truth = inverted-index Jaccard >= 0.5 on the same s_mod shingle domain
# the estimator samples, so the sweep measures the LSH stage in isolation.
_SWEEP_ARMS = (2, 4, 8)  # rows per band; bands = 32 / r


def _sweep_arm_sql(r: int) -> str:
    return f"""
        sig{r} AS (
            SELECT doc_id, i // {r} AS band,
                   md5(string_agg(CAST(mh AS VARCHAR), '-' ORDER BY i))
                       AS sig
            FROM mh GROUP BY doc_id, i // {r}
        ), cand{r} AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sig{r} a JOIN sig{r} b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        ), arm{r} AS (
            SELECT {N_MINHASHES // r} AS n_bands, {r} AS rows_per_band,
                   CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
                   CAST(SUM(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hits
            FROM cand{r} c
            LEFT JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
        )"""


@query(
    "d2_lsh_band_sweep",
    oracle=_oracle(
        f"""
        , shingled AS (
            SELECT DISTINCT doc_id,
                   CAST(CAST('0x' || substr(md5(shingle), 1, 15) AS UBIGINT) AS BIGINT)
                       % {MINHASH_PRIME} AS s_mod
            FROM (
                SELECT doc_id, unnest([toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                                       FOR i IN range(0, len(toks) - 2)]) AS shingle
                FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
                WHERE len(toks) >= 3
            )
        ), mh AS (
            SELECT doc_id, i,
                   MIN(((2*i + 1) * s_mod + 7919*(i + 1)) % {MINHASH_PRIME}) AS mh
            FROM shingled, (SELECT unnest(range({N_MINHASHES})) AS i)
            GROUP BY doc_id, i
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
            FROM shingled a JOIN shingled b
              ON a.s_mod = b.s_mod AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ), truth AS (
            SELECT doc_a, doc_b FROM inter
            JOIN sizes za ON za.doc_id = doc_a
            JOIN sizes zb ON zb.doc_id = doc_b
            WHERE CAST(n_inter AS DOUBLE)
                      / (za.n_sh + zb.n_sh - n_inter) >= 0.5
        ), nt AS (SELECT COUNT(*) AS n_true FROM truth),
        {",".join(_sweep_arm_sql(r) for r in _SWEEP_ARMS)}
        SELECT n_bands, rows_per_band, n_candidate_pairs,
               CAST(nt.n_true AS BIGINT) AS n_true_pairs, n_hits,
               CAST(n_hits AS DOUBLE) / n_candidate_pairs AS pair_precision,
               CAST(n_hits AS DOUBLE) / nt.n_true AS pair_recall
        FROM ({" UNION ALL ".join(f"SELECT * FROM arm{r}" for r in _SWEEP_ARMS)}) arms, nt
        """
    ),
)
def d2_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = corpus(spark, sf_dir)
    shingled, mh, _ = _minhash_parts(c)
    mh = mh.cache()  # vocabulary-bounded (n_docs x 32); reused by 3 arms
    # r11: the r10 shingled/truth persist pair REGRESSED this query ~1.9x
    # in all three post-change runs (3.59 -> 6.6-7.1 s; VERDICT r10 #1):
    # materializing the O(posting^2) truth output into the columnar cache
    # costs more than the lazy recomputes it saves at this state size.
    # Reverted to the r9 shape (mh.cache() above is the pre-existing pin).

    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa, sb = shingled.alias("sa"), shingled.alias("sb")
    inter = (
        sa.join(
            sb,
            (F.col("sa.s_mod") == F.col("sb.s_mod"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .groupBy(
            F.col("sa.doc_id").alias("doc_a"),
            F.col("sb.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    truth = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "doc_b",
        )
        .filter(
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            >= 0.5
        )
        .select("doc_a", "doc_b")
    )
    nt = truth.agg(F.count("*").alias("n_true"))

    def arm(r: int) -> DataFrame:
        sig = (
            mh.groupBy(
                "doc_id", (F.col("i") / r).cast("int").alias("band")
            ).agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct("i", "mh"))),
                            lambda x: x["mh"].cast("string"),
                        ),
                        "-",
                    )
                ).alias("sig")
            )
        )
        a, b = sig.alias("a"), sig.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        return (
            cand.join(
                truth.withColumn("is_true", F.lit(True)),
                ["doc_a", "doc_b"],
                "left",
            )
            .agg(
                F.count("*").cast("long").alias("n_candidate_pairs"),
                F.sum(F.col("is_true").isNotNull().cast("long"))
                .cast("long")
                .alias("n_hits"),
            )
            .select(
                F.lit(N_MINHASHES // r).alias("n_bands"),
                F.lit(r).alias("rows_per_band"),
                "n_candidate_pairs",
                "n_hits",
            )
        )

    arms = arm(_SWEEP_ARMS[0])
    for r in _SWEEP_ARMS[1:]:
        arms = arms.unionByName(arm(r))
    return arms.crossJoin(F.broadcast(nt)).select(
        "n_bands",
        "rows_per_band",
        "n_candidate_pairs",
        F.col("n_true").cast("long").alias("n_true_pairs"),
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_candidate_pairs")).alias(
            "pair_precision"
        ),
        (F.col("n_hits").cast("double") / F.col("n_true")).alias(
            "pair_recall"
        ),
    )


# --------------------------------------------------------------------------
# D1: k-anonymity audit — the privacy gate next to the GDPR erasure audit
# (d1_erasure_audit): before releasing an event extract, how many rows sit
# in quasi-identifier equivalence classes smaller than k (here k=5 over
# (event_type, day, 50-unit value bucket))? Those rows are re-identifiable
# by linkage and must be suppressed or generalized. Pure hash-aggregate
# algebra: one groupBy to the class grid, one rollup per event_type; the
# at-risk share is an exact rational quantized through the
# floor(x*1e6 + 0.5) integer path. The value bucket uses FLOOR of an
# IEEE quotient (bit-identical cross-engine), not ROUND.
K_ANON_K = 5


@query(
    "d1_kanonymity_audit",
    oracle=f"""
        WITH classes AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(FLOOR(value / 50) AS BIGINT) AS vbucket,
                   CAST(COUNT(*) AS BIGINT) AS class_size
            FROM events GROUP BY 1, 2, 3
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(CASE WHEN class_size < {K_ANON_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_small_classes,
               CAST(SUM(CASE WHEN class_size < {K_ANON_K} THEN class_size
                             ELSE 0 END) AS BIGINT) AS rows_at_risk,
               CAST(SUM(class_size) AS BIGINT) AS n_rows,
               CAST((2 * SUM(CASE WHEN class_size < {K_ANON_K}
                                  THEN class_size ELSE 0 END) * 1000000
                     + SUM(class_size)) // (2 * SUM(class_size))
                    AS BIGINT) AS risk_ppm,
               MIN(class_size) AS min_class, MAX(class_size) AS max_class
        FROM classes GROUP BY event_type
    """,
)
def d1_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    classes = e.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") / 50).cast("long").alias("vbucket"),
    ).agg(F.count("*").cast("long").alias("class_size"))
    small = F.when(F.col("class_size") < K_ANON_K, F.col("class_size")).otherwise(0)
    return classes.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(F.col("class_size") < K_ANON_K, 1).otherwise(0))
        .cast("long")
        .alias("n_small_classes"),
        F.sum(small).cast("long").alias("rows_at_risk"),
        F.sum("class_size").cast("long").alias("n_rows"),
        F.expr(
            f"(2 * SUM(CASE WHEN class_size < {K_ANON_K} THEN class_size"
            " ELSE 0 END) * 1000000 + SUM(class_size))"
            " div (2 * SUM(class_size))"
        )
        .cast("long")
        .alias("risk_ppm"),
        F.min("class_size").alias("min_class"),
        F.max("class_size").alias("max_class"),
    )


# --------------------------------------------------------------------------
# D7/D2: train-test LEAKAGE scan — the contamination check d7_decontaminate
# does for an EXTERNAL eval set, turned inward: after the content-hash
# split assignment (d7_train_val_test_split's residue formula, widened to
# a 10% eval band so the drill has a real population), which near-dup
# pairs STRADDLE the train/eval boundary? Every straddling pair is a
# leak: the model sees the eval doc's near-copy in training, and split-
# by-hash cannot prevent it (near-dups hash differently — exactly why
# production pipelines near-dedup BEFORE splitting). Same MinHash/LSH
# banding as d2_minhash_lsh (bucketed candidates, never all-pairs), with
# the split residues joined on and only boundary-crossing pairs kept.
LEAK_EVAL_RESIDUE = 90  # residue >= 90 -> the 10% eval split


@query(
    "d7_split_leakage_scan",
    oracle=_oracle(
        f"""
        , shingled AS (
            SELECT DISTINCT doc_id,
                   CAST(CAST('0x' || substr(md5(shingle), 1, 15) AS UBIGINT) AS BIGINT)
                       % {MINHASH_PRIME} AS s_mod
            FROM (
                SELECT doc_id, unnest([toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                                       FOR i IN range(0, len(toks) - 2)]) AS shingle
                FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
                WHERE len(toks) >= 3
            )
        ), mh AS (
            SELECT doc_id, i,
                   MIN(((2*i + 1) * s_mod + 7919*(i + 1)) % {MINHASH_PRIME}) AS mh
            FROM shingled, (SELECT unnest(range({N_MINHASHES})) AS i)
            GROUP BY doc_id, i
        ), bands AS (
            SELECT doc_id, i // 4 AS band,
                   SUM(mh * (CASE i % 4 WHEN 0 THEN 1 WHEN 1 THEN 31
                             WHEN 2 THEN 961 ELSE 29791 END)) AS sig
            FROM mh GROUP BY doc_id, i // 4
        ), splits AS (
            SELECT doc_id,
                   CASE WHEN CAST(CAST('0x' || substr(md5(doc_id || '|' || text), 1, 15)
                             AS UBIGINT) AS BIGINT) % 100 >= {LEAK_EVAL_RESIDUE}
                        THEN 'eval' ELSE 'train' END AS split
            FROM corpus
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        ), crossing AS (
            SELECT c.doc_a, c.doc_b,
                   CASE WHEN sa.split = 'train' THEN c.doc_a ELSE c.doc_b END
                       AS train_doc,
                   CASE WHEN sa.split = 'train' THEN c.doc_b ELSE c.doc_a END
                       AS eval_doc
            FROM cand c
            JOIN splits sa ON sa.doc_id = c.doc_a
            JOIN splits sb ON sb.doc_id = c.doc_b
            WHERE sa.split <> sb.split
        )
        SELECT x.train_doc, x.eval_doc,
               CAST(SUM(CASE WHEN m1.mh = m2.mh THEN 1 ELSE 0 END) AS DOUBLE)
                   / {N_MINHASHES} AS est_similarity
        FROM crossing x
        JOIN mh m1 ON m1.doc_id = x.doc_a
        JOIN mh m2 ON m2.doc_id = x.doc_b AND m2.i = m1.i
        GROUP BY x.train_doc, x.eval_doc
        HAVING CAST(SUM(CASE WHEN m1.mh = m2.mh THEN 1 ELSE 0 END) AS DOUBLE)
                   / {N_MINHASHES} >= 0.5
        """
    ),
)
def d7_split_leakage_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = corpus(spark, sf_dir)
    shingled, mh, cand = _minhash_parts(c)
    splits = c.select(
        "doc_id",
        F.when(
            stable_hash60(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("|"), F.col("text")
                )
            )
            % 100
            >= LEAK_EVAL_RESIDUE,
            "eval",
        )
        .otherwise("train")
        .alias("split"),
    )
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    crossing = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            "doc_a",
            "doc_b",
            F.when(F.col("split_a") == "train", F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("train_doc"),
            F.when(F.col("split_a") == "train", F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("eval_doc"),
        )
    )
    x, y = mh.alias("x"), mh.alias("y")
    est = F.sum(
        F.when(F.col("x.mh") == F.col("y.mh"), 1).otherwise(0)
    ).cast("double") / F.lit(N_MINHASHES)
    return (
        crossing.join(x, F.col("x.doc_id") == F.col("doc_a"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("doc_b"))
            & (F.col("y.i") == F.col("x.i")),
        )
        .groupBy("train_doc", "eval_doc")
        .agg(est.alias("est_similarity"))
        .filter(F.col("est_similarity") >= 0.5)
    )


# --------------------------------------------------------------------------
# D1: bitemporal point-in-time reconstruction — SCD2 (d1_scd2_*) tracks
# ONE time axis; real warehouses need two: VALID time (when the fact was
# true) and TRANSACTION time (when the warehouse learned it). Versions
# here gain a deterministic arrival delay of up to 1h (LCG on event_id),
# so "state as of valid-time V, as known at transaction-time T" differs
# from plain as-of whenever T trails V. Four (V, T) query arms sit on a
# broadcast 4-row grid derived from one global min/max aggregate; the
# per-user winner is a single max_by over the (valid, event_id) struct —
# one shuffle on user_id, no window over the fact table. Value totals
# ride the decimal-routed order-independent sum policy.
@query(
    "d1_bitemporal_asof",
    oracle="""
        WITH v AS (
            SELECT user_id, event_id, value,
                   epoch_us(ts) AS vf_u,
                   epoch_us(ts)
                       + ((event_id * 7919) % 3600) * 1000000 AS tx_u
            FROM events
        ),
        bounds AS (SELECT MIN(vf_u) AS lo, MAX(vf_u) AS hi FROM v),
        arms AS (
            SELECT arm, lo + (hi - lo) * vq // 100 AS v_at,
                   lo + (hi - lo) * tq // 100 AS t_at
            FROM bounds, (VALUES ('early', 25, 50), ('mid', 50, 75),
                                 ('late', 75, 75), ('final', 100, 100))
                 AS q(arm, vq, tq)
        ),
        pit AS (
            SELECT a.arm, v.user_id, v.value, v.vf_u,
                   ROW_NUMBER() OVER (PARTITION BY a.arm, v.user_id
                                      ORDER BY v.vf_u DESC,
                                               v.event_id DESC) AS rn
            FROM arms a JOIN v ON v.vf_u <= a.v_at AND v.tx_u <= a.t_at
        )
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
                   AS total_value,
               MAX(vf_u) AS latest_valid_u
        FROM pit WHERE rn = 1 GROUP BY arm
    """,
)
def d1_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    vf = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    v = e.select(
        "user_id",
        "event_id",
        "value",
        vf.alias("vf_u"),
        (vf + ((F.col("event_id") * 7919) % 3600) * 1_000_000).alias("tx_u"),
    )
    bounds = v.agg(F.min("vf_u").alias("lo"), F.max("vf_u").alias("hi"))
    grid = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(arm).alias("arm"),
                    F.lit(vq).alias("vq"),
                    F.lit(tq).alias("tq"),
                )
                for arm, vq, tq in (
                    ("early", 25, 50),
                    ("mid", 50, 75),
                    ("late", 75, 75),
                    ("final", 100, 100),
                )
            ]
        )
    ).alias("q")
    arms = bounds.select("lo", "hi", grid).select(
        F.col("q.arm").alias("arm"),
        F.expr("lo + (hi - lo) * q.vq div 100").alias("v_at"),
        F.expr("lo + (hi - lo) * q.tq div 100").alias("t_at"),
    )
    pit = (
        v.crossJoin(F.broadcast(arms))
        .filter((F.col("vf_u") <= F.col("v_at"))
                & (F.col("tx_u") <= F.col("t_at")))
        .groupBy("arm", "user_id")
        .agg(
            F.max_by(
                F.struct("value", "vf_u"), F.struct("vf_u", "event_id")
            ).alias("w")
        )
    )
    return pit.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.col("w.value").cast("decimal(27,6)"))
        .cast("double")
        .alias("total_value"),
        F.max("w.vf_u").alias("latest_valid_u"),
    )


# --------------------------------------------------------------------------
# D1: record-linkage accuracy eval — the matcher-quality loop for
# d2_fuzzy_levenshtein's blocked edit-distance linkage: the seeded
# corpus plants known duplicate pairs (exact copies at +2M, first-word
# mutations at +1M), the matcher flags same-length-bucket pairs at
# head-distance <= thr, and each threshold arm is scored
# precision/recall against that planted truth. Shows the real blocking
# trade-off: mutations that change a doc's length bucket are
# unreachable (recall < 1 no matter the threshold) — the quantizer, not
# the distance, is the recall ceiling. Pairs + distances are computed
# ONCE over sum(block^2); the 4-arm sweep is one conditional
# aggregation; P/R ride the exact integer 6dp path (-1 when undefined).
@query(
    "d1_linkage_accuracy_eval",
    oracle=_oracle(
        """
        , b AS (
            SELECT doc_id, length(text) // 8 AS bucket,
                   substr(text, 1, 40) AS head
            FROM corpus
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   levenshtein(a.head, b.head) AS dist
            FROM b a JOIN b b ON a.bucket = b.bucket
                             AND a.doc_id < b.doc_id
        ),
        truth AS (
            SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
            FROM documents WHERE text <> '' AND doc_id % 25 = 0
            UNION ALL
            SELECT doc_id, doc_id + 2000000
            FROM documents WHERE text <> '' AND doc_id % 20 = 0
        ),
        nt AS (SELECT COUNT(*) AS n_truth FROM truth),
        marked AS (
            SELECT p.dist,
                   CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_t
            FROM pairs p LEFT JOIN truth t
              ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
        )
        SELECT thr, n_flagged, tp, n_truth,
               CASE WHEN n_flagged = 0 THEN -1
                    ELSE CAST(tp * 1000000 // n_flagged AS BIGINT)
               END AS precision_u,
               CAST(tp * 1000000 // n_truth AS BIGINT) AS recall_u
        FROM (
            SELECT thr,
                   CAST(COUNT(*) FILTER (WHERE dist <= thr) AS BIGINT)
                       AS n_flagged,
                   CAST(SUM(is_t) FILTER (WHERE dist <= thr) AS BIGINT)
                       AS tp,
                   CAST(MAX(n_truth) AS BIGINT) AS n_truth
            FROM marked, (VALUES (0), (4), (8), (12)) AS a(thr), nt
            GROUP BY thr
        ) s
        """
    ),
)
def d1_linkage_accuracy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = corpus(spark, sf_dir)
    b = c.select(
        "doc_id",
        (F.length("text") / 8).cast("long").alias("bucket"),
        F.substring("text", 1, 40).alias("head"),
    )
    # r11: the bucket join broadcasts the small b-side, so the probe side
    # kept the corpus parquet's ~2-3 input splits — the whole
    # sum(block^2) levenshtein sweep ran on 3 cores (profiled 3.75 s over
    # 3 tasks, the query's entire cost). The bytes are tiny but the
    # per-row CPU is not (guide §2.6 idle capacity): spread the probe
    # side across defaultParallelism before the join — a KB-sized
    # round-robin exchange that the AQE byte-based coalescing would never
    # add on its own because it cannot see CPU cost.
    probe = b.repartition(spark.sparkContext.defaultParallelism)
    a2, b2 = probe.alias("a"), b.alias("b")
    pairs = a2.join(
        b2,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.levenshtein("a.head", "b.head").alias("dist"),
    )
    d = load_table(spark, sf_dir, "documents").filter(F.col("text") != "")
    truth = (
        d.filter(F.col("doc_id") % 25 == 0)
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 1_000_000).alias("doc_b"),
        )
        .unionAll(
            d.filter(F.col("doc_id") % 20 == 0).select(
                F.col("doc_id").alias("doc_a"),
                (F.col("doc_id") + 2_000_000).alias("doc_b"),
            )
        )
    )
    nt = truth.agg(F.count("*").alias("n_truth"))
    marked = pairs.join(
        truth.withColumn("is_t", F.lit(1)), ["doc_a", "doc_b"], "left"
    ).select("dist", F.coalesce("is_t", F.lit(0)).alias("is_t"))
    arms = F.explode(
        F.array(*[F.lit(t) for t in (0, 4, 8, 12)])
    ).alias("thr")
    swept = (
        marked.select("dist", "is_t", arms)
        .groupBy("thr")
        .agg(
            F.count_if(F.col("dist") <= F.col("thr"))
            .cast("long")
            .alias("n_flagged"),
            F.sum(F.when(F.col("dist") <= F.col("thr"), F.col("is_t")))
            .cast("long")
            .alias("tp"),
        )
        .crossJoin(F.broadcast(nt))
        .withColumn("n_truth", F.col("n_truth").cast("long"))
    )
    return swept.select(
        "thr",
        "n_flagged",
        "tp",
        "n_truth",
        F.when(F.col("n_flagged") == 0, F.lit(-1).cast("long"))
        .otherwise(F.expr("tp * 1000000 div n_flagged"))
        .alias("precision_u"),
        F.expr("tp * 1000000 div n_truth").alias("recall_u"),
    )


# --------------------------------------------------------------------------
# D1: l-diversity audit — k-anonymity's blind spot: a class can hold
# k>=5 rows yet expose everyone if they all share one SENSITIVE value
# (here user_id as the sensitive attribute over the same
# (event_type, day, value-bucket) quasi-identifier classes as
# d1_kanonymity_audit). l = distinct sensitive values per class; the
# release gate requires l >= 3. Same pure hash-agg algebra — one
# groupBy for the classes (count + count distinct), one grid rollup;
# the at-risk share rides the half-up integer-ppm path k-anonymity
# established.
L_DIVERSITY_L = 3


@query(
    "d1_ldiversity_audit",
    oracle=f"""
        WITH classes AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(FLOOR(value / 50) AS BIGINT) AS vbucket,
                   CAST(COUNT(*) AS BIGINT) AS class_size,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l
            FROM events GROUP BY 1, 2, 3
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(CASE WHEN l < {L_DIVERSITY_L} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_low_diversity,
               CAST(SUM(CASE WHEN l < {L_DIVERSITY_L} THEN class_size
                             ELSE 0 END) AS BIGINT) AS rows_at_risk,
               CAST(SUM(class_size) AS BIGINT) AS n_rows,
               CAST((2 * SUM(CASE WHEN l < {L_DIVERSITY_L}
                                  THEN class_size ELSE 0 END) * 1000000
                     + SUM(class_size)) // (2 * SUM(class_size))
                    AS BIGINT) AS risk_ppm,
               MIN(l) AS min_l, MAX(l) AS max_l
        FROM classes GROUP BY event_type
    """,
)
def d1_ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    classes = e.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") / 50).cast("long").alias("vbucket"),
    ).agg(
        F.count("*").cast("long").alias("class_size"),
        F.countDistinct("user_id").cast("long").alias("l"),
    )
    low = F.col("l") < L_DIVERSITY_L
    return classes.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(low, 1).otherwise(0))
        .cast("long")
        .alias("n_low_diversity"),
        F.sum(F.when(low, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.sum("class_size").cast("long").alias("n_rows"),
        F.expr(
            f"(2 * SUM(CASE WHEN l < {L_DIVERSITY_L} THEN class_size"
            " ELSE 0 END) * 1000000 + SUM(class_size))"
            " div (2 * SUM(class_size))"
        )
        .cast("long")
        .alias("risk_ppm"),
        F.min("l").alias("min_l"),
        F.max("l").alias("max_l"),
    )


# --------------------------------------------------------------------------
# D1: fact-to-SCD2 temporal join — the everyday warehouse pattern the
# point-in-time lookup (d1_scd2_point_in_time) generalizes to a JOIN:
# every click fact attaches the purchase-dimension VERSION that was
# valid at the fact's own timestamp (not today's version — joining
# current-state dims to historical facts is the classic silent bug this
# operator exists to prevent). Engine side it is the one-shuffle as-of
# machinery keyed on user; facts before any version survive as the -1
# bucket with a 0.0 total (COALESCE keeps the all-NULL sum from going
# float-NaN). Version attrs aggregate through the decimal-routed path.
@query(
    "d1_scd2_fact_join",
    oracle="""
        WITH dim AS (
            SELECT user_id, value AS attr_value, ts AS valid_from,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC)
                       AS version_no
            FROM events WHERE event_type = 'purchase'
        ),
        facts AS (
            SELECT user_id, ts FROM events WHERE event_type = 'click'
        ),
        joined AS (
            SELECT f.user_id, d.version_no, d.attr_value
            FROM facts f
            ASOF LEFT JOIN dim d
              ON f.user_id = d.user_id AND f.ts >= d.valid_from
        )
        SELECT COALESCE(version_no, -1) AS version_no,
               CAST(COUNT(*) AS BIGINT) AS n_facts,
               COALESCE(CAST(SUM(CAST(ROUND(attr_value, 6)
                                      AS DECIMAL(27,6))) AS DOUBLE), 0.0)
                   AS dim_attr_total
        FROM joined GROUP BY 1
    """,
)
def d1_scd2_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import as_of_join

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    dim = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.row_number().over(w).alias("version_no"),
    )
    facts = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = as_of_join(
        facts,
        dim,
        on="user_id",
        left_ts="ts",
        right_ts="valid_from",
        right_cols=["attr_value", "version_no"],
        direction="backward",
    )
    return joined.groupBy(
        F.coalesce("version_no", F.lit(-1)).cast("long").alias("version_no")
    ).agg(
        F.count("*").cast("long").alias("n_facts"),
        F.coalesce(
            F.sum(F.round("attr_value", 6).cast("decimal(27,6)"))
            .cast("double"),
            F.lit(0.0),
        ).alias("dim_attr_total"),
    )


# --------------------------------------------------------------------------
# D1: TTL retention what-if — before a retention policy ships, the
# what-if: at TTL arms of 7/14/21 days behind the newest event, how
# many rows expire and how many bytes come back (fmt_rowgroup_planner's
# byte physics: 32B fixed + string lengths)? One scan with a broadcast
# cutoff grid and a conditional aggregation — the dry run for the
# DELETE a 100 TB lake runs under compliance or cost pressure
# (cf. d1_erasure_audit for the per-entity flavor).
@query(
    "d1_retention_ttl_whatif",
    oracle="""
        WITH bounds AS (SELECT MAX(epoch_us(ts)) AS hi FROM events),
        arms AS (
            SELECT ttl_days,
                   hi - ttl_days * 86400000000 AS cutoff
            FROM bounds, (VALUES (7), (14), (21)) AS a(ttl_days)
        ),
        sized AS (
            SELECT epoch_us(ts) AS t,
                   32 + length(event_type) + length(props) AS row_bytes
            FROM events
        )
        SELECT a.ttl_days,
               CAST(COUNT(*) FILTER (WHERE s.t < a.cutoff) AS BIGINT)
                   AS n_expired,
               CAST(SUM(CASE WHEN s.t < a.cutoff THEN s.row_bytes
                             ELSE 0 END) AS BIGINT) AS bytes_reclaimed,
               CAST(COUNT(*) FILTER (WHERE s.t < a.cutoff) * 1000000
                    // COUNT(*) AS BIGINT) AS expired_ppm
        FROM sized s, arms a
        GROUP BY a.ttl_days
    """,
)
def d1_retention_ttl_whatif(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    sized = e.select(
        t.alias("t"),
        (32 + F.length("event_type") + F.length("props"))
        .cast("long")
        .alias("row_bytes"),
    )
    bounds = sized.agg(F.max("t").alias("hi"))
    arms = bounds.select(
        F.explode(F.array(*[F.lit(d) for d in (7, 14, 21)])).alias(
            "ttl_days"
        ),
        "hi",
    ).select(
        "ttl_days",
        (F.col("hi") - F.col("ttl_days").cast("long") * 86_400_000_000)
        .alias("cutoff"),
    )
    exp = F.col("t") < F.col("cutoff")
    return (
        sized.crossJoin(F.broadcast(arms))
        .groupBy("ttl_days")
        .agg(
            F.count_if(exp).cast("long").alias("n_expired"),
            F.sum(F.when(exp, F.col("row_bytes")).otherwise(0))
            .cast("long")
            .alias("bytes_reclaimed"),
            F.expr(
                "COUNT(CASE WHEN t < cutoff THEN 1 END) * 1000000"
                " div COUNT(*)"
            )
            .cast("long")
            .alias("expired_ppm"),
        )
    )
