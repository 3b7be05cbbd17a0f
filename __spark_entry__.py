"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``     — flagship MinHash+LSH dedup pipeline on sf0.001 documents.
``queries()``        — one entry per implemented operator (SURVEY.md §2 + the
                       training-data-pipeline suite).
``oracle_sql()``     — DuckDB-equivalent ANSI SQL for every SQL-expressible
                       query (identical column names/aliases + 6dp rounding of
                       computed floats on both sides).  Non-SQL ops (MinHash /
                       SimHash sketching, iterative CC) are rows-only here and
                       oracle-checked in tests/ against a single-process numpy
                       reference implementation instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rabbittclust_spark.config import PipelineConfig
from rabbittclust_spark.functions.text_stats import (
    BPE_RE,
    LANG_MARKERS,
    STOPWORDS,
    TOKEN_RE,
    bpe_token_count_expr,
    fingerprint_expr,
    lang_id_expr,
    quality_score_exprs,
    token_count_expr,
)
from rabbittclust_spark.operators.ann import brute_force_topk, embedding_neardup_pairs
from rabbittclust_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from rabbittclust_spark.operators.postprocess import cluster_stats
from rabbittclust_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# shared constants (both engines derive from these — parity by construction)
# ---------------------------------------------------------------------------
MIN_LEN = 100          # doc_size_stats "below min" boundary
LEN_FILTER = 200       # length_filter predicate
NGRAM_N = 3
NGRAM_MIN_JACCARD = 0.05
TOKEN_MASH_K = 3       # Mash k for the token-set distance oracle
TOKEN_MIN_COMMON = 5
ANN_K = 5
ANN_QUERY_MOD = 50
NEARDUP_TAU = 0.4

_CFG = PipelineConfig(min_len=20)  # driver docs are short (48..553 chars)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: MinHash+LSH near-dup clustering of sf0.001 documents."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    return minhash_dedup(docs, _CFG)["assignments"].orderBy("doc_id")


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------

def _q_doc_size_stats(spark, sf_dir):
    # calSize analog (src/SketchInfo.cpp:438-552)
    d = _docs(spark, sf_dir)
    n = F.length("text")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.min(n).cast("long").alias("min_len"),
        F.max(n).cast("long").alias("max_len"),
        F.round(F.avg(n), 6).alias("avg_len"),
        F.sum(F.when(n < MIN_LEN, 1).otherwise(0)).cast("long").alias("n_below_min"),
    )


def _q_length_filter(spark, sf_dir):
    # minLen filter (src/SketchInfo.cpp:963)
    d = _docs(spark, sf_dir)
    return d.where(F.length("text") >= LEN_FILTER).select(
        "doc_id", F.length("text").cast("long").alias("text_len"))


def _q_exact_dedup(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir)).select("doc_id", "canonical_id")


def _q_token_counts(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count_expr(F.col("text")).cast("long").alias("n_ws_tokens"),
        bpe_token_count_expr(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


def _q_text_quality(spark, sf_dir):
    d = _docs(spark, sf_dir)
    cols = quality_score_exprs(F.col("text"))
    return d.select("doc_id", *[v.alias(k) for k, v in cols.items()])


def _q_lang_id(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", lang_id_expr(F.col("text")).alias("pred_lang"))


def _q_doc_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", fingerprint_expr(F.col("text")).alias("fp"))


def _q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=NGRAM_N,
                               min_jaccard=NGRAM_MIN_JACCARD, block_col="source")


def _token_pairs(spark, sf_dir):
    """Distinct-token inverted-index pair counts blocked by source — the
    SQL-expressible twin of pair_counts_index (src/MST.cpp:399-575)."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        F.col("doc_id").cast("long").alias("doc_id"), "source",
        F.explode(F.array_distinct(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0)))).alias("tok"),
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) &
               (F.col("a.source") == F.col("b.source")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .agg(F.count("*").alias("common"))
        .where(F.col("common") >= TOKEN_MIN_COMMON)
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "src")
                        .withColumnRenamed("n", "n1"), "src")
        .join(sizes.withColumnRenamed("doc_id", "dst")
                   .withColumnRenamed("n", "n2"), "dst")
    )


def _q_token_pair_mash(spark, sf_dir):
    from rabbittclust_spark.functions.distances import jaccard_expr, mash_distance_expr
    p = _token_pairs(spark, sf_dir)
    j = jaccard_expr(F.col("common"), F.col("n1"), F.col("n2"))
    d = mash_distance_expr(j, TOKEN_MASH_K)
    return p.select(
        "src", "dst", F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"), "common",
        F.round(j, 6).alias("jaccard"), F.round(d, 6).alias("mash_d"),
    )


def _q_ani_histogram(spark, sf_dir):
    # ANI histogram over token-pair Mash distances (src/MST.cpp:362-368)
    from rabbittclust_spark.functions.distances import jaccard_expr, mash_distance_expr
    p = _token_pairs(spark, sf_dir)
    d = mash_distance_expr(jaccard_expr(F.col("common"), F.col("n1"), F.col("n2")),
                           TOKEN_MASH_K)
    return (
        p.select(F.floor((1.0 - d) * 100).cast("long").alias("ani_bucket"))
        .groupBy("ani_bucket").agg(F.count("*").alias("cnt"))
    )


def _q_density_histogram(spark, sf_dir):
    # per-doc neighbor counts per distance bucket + cumulative
    # (src/MST.cpp:342-369, DENSE_SPAN=100)
    from rabbittclust_spark.functions.distances import jaccard_expr, mash_distance_expr
    p = _token_pairs(spark, sf_dir)
    d = mash_distance_expr(jaccard_expr(F.col("common"), F.col("n1"), F.col("n2")),
                           TOKEN_MASH_K)
    sym = p.select(F.col("src").alias("doc_id"), d.alias("dist")).union(
        p.select(F.col("dst").alias("doc_id"), d.alias("dist")))
    bucketed = sym.select(
        "doc_id", F.least(F.floor(F.col("dist") * 100), F.lit(99)).cast("long").alias("bucket"))
    counts = bucketed.groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return counts.withColumn("cum_cnt", F.sum("cnt").over(w))


def _q_topk_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(),
                                                F.col("o_orderkey").asc())
    return (o.withColumn("rk", F.row_number().over(w).cast("long"))
            .where(F.col("rk") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice", "rk"))


def _q_value_histogram(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (e.select(F.floor("value").cast("long").alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("cnt")))


def _q_events_stats(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"),
        F.round(F.avg("value"), 6).alias("avg_v"),
        F.round(F.stddev_pop("value"), 6).alias("std_v"),
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("q1"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("q3"),
    )


def _q_union_dedup(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.union(c).distinct()


def _q_best_supplier(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").asc(),
                                                  F.col("s_suppkey").asc())
    return (s.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("s_nationkey", "s_suppkey", "s_acctbal"))


def _q_ann_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % ANN_QUERY_MOD == 0)
    out = brute_force_topk(e, q, k=ANN_K)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _q_embedding_neardup(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(e, tau=NEARDUP_TAU)


# --- rows-only (non-SQL-expressible: custom sketches + iterative CC) --------

def _q_minhash_dedup(spark, sf_dir):
    a = minhash_dedup(_docs(spark, sf_dir), _CFG)["assignments"]
    return a.select("doc_id", "cluster_id", "is_rep")


def _q_minhash_dedup_banded(spark, sf_dir):
    import dataclasses
    cfg = dataclasses.replace(_CFG, pair_mode="banded")
    a = minhash_dedup(_docs(spark, sf_dir), cfg)["assignments"]
    return a.select("doc_id", "cluster_id", "is_rep")


def _q_simhash_dedup(spark, sf_dir):
    return simhash_dedup(_docs(spark, sf_dir), _CFG)


def _q_minhash_cluster_stats(spark, sf_dir):
    a = minhash_dedup(_docs(spark, sf_dir), _CFG)["assignments"]
    return cluster_stats(a)


def _q_fracminhash_containment(spark, sf_dir):
    """FracMinHash sketch + containment distance (reference --fast + -c path,
    src/SketchInfo.cpp:274-433, src/MST.cpp:529-540)."""
    import dataclasses

    from rabbittclust_spark.operators.pairs import build_edges
    from rabbittclust_spark.operators.sketch import sketch_fracminhash

    cfg = dataclasses.replace(_CFG, containment=True, frac_scale=4,
                              pair_mode="index")
    sk = sketch_fracminhash(_docs(spark, sf_dir), cfg)
    return build_edges(sk, cfg).orderBy("src", "dst")


def _q_dedup_medoid(spark, sf_dir):
    """--dedup-dist medoid collapse (src/cluster_postprocess.cpp:60-157)."""
    from rabbittclust_spark.operators.postprocess import dedup_medoid_collapse

    out = minhash_dedup(_docs(spark, sf_dir), _CFG)
    return dedup_medoid_collapse(
        out["assignments"], out["edges"],
        out["sketches"].select("doc_id", "len"),
        dedup_dist=_CFG.threshold / 2)


def _q_incremental_append(spark, sf_dir):
    """--append semantics (src/mst_state.h:13-30): first half of documents is
    the persisted state, second half is the appended batch."""
    from pyspark.sql import functions as F

    from rabbittclust_spark.streaming.incremental import append_batch

    docs = _docs(spark, sf_dir)
    half = docs.agg(F.expr("percentile(doc_id, 0.5)").alias("m")).collect()[0]["m"]
    old = docs.where(F.col("doc_id") <= half)
    new = docs.where(F.col("doc_id") > half)
    state = minhash_dedup(old, _CFG)
    out = append_batch(state["sketches"],
                       state["assignments"].select("doc_id", "cluster_id"),
                       new, _CFG)
    return out["assignments"].orderBy("doc_id")


def _q_repdb_topk(spark, sf_dir):
    """RepDB --query top-k (src/greedy.cpp:2536-2638)."""
    from pyspark.sql import functions as F

    from rabbittclust_spark.operators.sketch import sketch_minhash
    from rabbittclust_spark.streaming.incremental import query_topk

    docs = _docs(spark, sf_dir)
    reps = sketch_minhash(docs.where(F.col("doc_id") % 5 != 0), _CFG)
    queries_df = docs.where(F.col("doc_id") % 25 == 0)
    return query_topk(reps, queries_df, _CFG, k=3) \
        .select("query_id", "rep_id", F.round("dist", 6).alias("dist"), "rank")


def _q_dbscan(spark, sf_dir):
    """DBSCAN over the eps-neighborhood graph (src/dbscan.cpp:725-1101)."""
    from rabbittclust_spark.operators.dbscan import dbscan

    docs = _docs(spark, sf_dir)
    out = minhash_dedup(docs, _CFG)
    return dbscan(out["sketches"].select("doc_id"), out["edges"],
                  eps=_CFG.threshold, min_pts=3)


def _q_noise_removal(spark, sf_dir):
    """--dense noise removal (src/MST.cpp:189-211): low-density members get
    cluster_id = -1, remainder re-clustered."""
    from rabbittclust_spark.operators.postprocess import remove_noise

    out = minhash_dedup(_docs(spark, sf_dir), _CFG)
    return remove_noise(out["assignments"], out["edges"])


def _q_distinct_token_counts(spark, sf_dir):
    """Per-doc distinct-token cardinality — exact (HLL's exact twin;
    the reference's HyperLogLog alternative sketch, src/SketchInfo.cpp:130-141)."""
    d = _docs(spark, sf_dir)
    toks = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
    return d.select("doc_id",
                    F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"))


def _q_hll_cardinality(spark, sf_dir):
    """approx_count_distinct (HLL) of tokens per doc — rows-only (sketch
    internals differ across engines)."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(
        F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))).alias("tok"))
    return toks.groupBy("doc_id").agg(
        F.approx_count_distinct("tok").alias("n_approx"))


def _q_multimodal_features(spark, sf_dir):
    """Multimodal binary-column plumbing (stub codecs, real Spark machinery).

    The feature array is posexploded to (doc_id, kind, pos, value) scalar rows
    so the driver's canonicalizer (pandas sort/factorize) gets hashable cells;
    the array-producing operator itself is unchanged.
    """
    from pyspark.sql import functions as F

    from rabbittclust_spark.operators.multimodal import extract_features

    media = _docs(spark, sf_dir).select(
        "doc_id", F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(F.lit(640).alias("width"), F.lit(480).alias("height"),
                 F.lit(None).cast("int").alias("sample_rate"),
                 F.lit(None).cast("int").alias("duration_ms")).alias("meta"))
    feats = extract_features(media)
    return feats.select(
        "doc_id", "kind",
        F.posexplode("feature").alias("pos", "value"),
    ).select("doc_id", "kind", F.col("pos").cast("long").alias("pos"),
             F.round(F.col("value").cast("double"), 6).alias("value"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # scans / filters / stats (SURVEY.md §2.1-2.2)
        "doc_size_stats": _q_doc_size_stats,
        "length_filter": _q_length_filter,
        # dedup suite
        "exact_dedup": _q_exact_dedup,
        "ngram_jaccard": _q_ngram_jaccard,
        "minhash_dedup": _q_minhash_dedup,
        "minhash_dedup_banded": _q_minhash_dedup_banded,
        "simhash_dedup": _q_simhash_dedup,
        "minhash_cluster_stats": _q_minhash_cluster_stats,
        "fracminhash_containment": _q_fracminhash_containment,
        "dedup_medoid": _q_dedup_medoid,
        "incremental_append": _q_incremental_append,
        "repdb_topk": _q_repdb_topk,
        "multimodal_features": _q_multimodal_features,
        "dbscan": _q_dbscan,
        "noise_removal": _q_noise_removal,
        "distinct_token_counts": _q_distinct_token_counts,
        "hll_cardinality": _q_hll_cardinality,
        # posting-list join + distances (§2.4-2.5, §2.9)
        "token_pair_mash": _q_token_pair_mash,
        "ani_histogram": _q_ani_histogram,
        "density_histogram": _q_density_histogram,
        # windows / sorts / top-k (§2.6)
        "topk_orders": _q_topk_orders,
        "best_supplier": _q_best_supplier,
        # aggregations (§2.5)
        "value_histogram": _q_value_histogram,
        "events_stats": _q_events_stats,
        # set ops (§2.7)
        "union_dedup": _q_union_dedup,
        # text analysis (training-data pipeline)
        "token_counts": _q_token_counts,
        "text_quality": _q_text_quality,
        "lang_id": _q_lang_id,
        "doc_fingerprint": _q_doc_fingerprint,
        # similarity search
        "ann_cosine_topk": _q_ann_topk,
        "embedding_neardup": _q_embedding_neardup,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _sql_word_count(word: str, text: str = "text") -> str:
    """Whole-word occurrence count, replicating text_stats._word_occurrences
    (left-to-right non-overlapping replace in both engines)."""
    pad = f"' ' || {text} || ' '"
    w = f"' {word} '"
    return (f"CAST((length({pad}) - length(replace({pad}, {w}, '')))"
            f" / {len(word) + 2} AS BIGINT)")


def _sql_stopword_count() -> str:
    return " + ".join(_sql_word_count(w) for w in STOPWORDS)


def _sql_lang_id() -> str:
    scores = {lang: " + ".join(_sql_word_count(w) for w in words)
              for lang, words in LANG_MARKERS.items()}
    score_cols = ", ".join(f"({v}) AS s_{k}" for k, v in scores.items())
    best = "greatest(" + ", ".join(f"s_{k}" for k in LANG_MARKERS) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{k} = {best} THEN '{k}'" for k in LANG_MARKERS) + " ELSE 'und' END"
    return f"""
    WITH scored AS (SELECT doc_id, {score_cols} FROM documents)
    SELECT doc_id, {case} AS pred_lang FROM scored
    """


_TOKEN_PAIRS_CTE = f"""
toks AS (
  SELECT doc_id, source, unnest(list_distinct(regexp_extract_all(text, '{TOKEN_RE}'))) AS tok
  FROM documents
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, CAST(count(*) AS BIGINT) AS common
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.source = b.source
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {TOKEN_MIN_COMMON}
),
scored AS (
  SELECT p.src, p.dst, sa.n AS n1, sb.n AS n2, p.common,
         p.common / CAST(sa.n + sb.n - p.common AS DOUBLE) AS j
  FROM pairs p
  JOIN sizes sa ON p.src = sa.doc_id
  JOIN sizes sb ON p.dst = sb.doc_id
),
dists AS (
  SELECT src, dst, n1, n2, common, j,
         CASE WHEN j >= 1.0 THEN 0.0
              WHEN j <= 0.0 THEN 1.0
              ELSE least(1.0, -ln(2.0 * j / (1.0 + j)) / {TOKEN_MASH_K}.0)
         END AS mash_d
  FROM scored
)
"""


def oracle_sql() -> dict[str, str]:
    q = quality_sql = f"""
    WITH base AS (
      SELECT doc_id, text,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens,
             CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS BIGINT) AS n_punct,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
             ({_sql_stopword_count()}) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
      round(n_punct / (CASE WHEN n_chars > 0 THEN CAST(n_chars AS DOUBLE) ELSE 1.0 END), 6) AS punct_ratio,
      round(n_alpha / (CASE WHEN n_chars > 0 THEN CAST(n_chars AS DOUBLE) ELSE 1.0 END), 6) AS alpha_ratio,
      round(n_stop / (CASE WHEN n_tokens > 0 THEN CAST(n_tokens AS DOUBLE) ELSE 1.0 END), 6) AS stopword_ratio,
      round(n_chars / (CASE WHEN n_tokens > 0 THEN CAST(n_tokens AS DOUBLE) ELSE 1.0 END), 6) AS mean_token_len
    FROM base
    """
    return {
        "doc_size_stats": f"""
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(min(length(text)) AS BIGINT) AS min_len,
                   CAST(max(length(text)) AS BIGINT) AS max_len,
                   round(avg(length(text)), 6) AS avg_len,
                   CAST(count(CASE WHEN length(text) < {MIN_LEN} THEN 1 END) AS BIGINT) AS n_below_min
            FROM documents
        """,
        "length_filter": f"""
            SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len
            FROM documents WHERE length(text) >= {LEN_FILTER}
        """,
        "exact_dedup": """
            WITH g AS (SELECT md5(text) AS h, min(doc_id) AS canonical_id
                       FROM documents GROUP BY 1)
            SELECT d.doc_id, g.canonical_id
            FROM documents d JOIN g ON md5(d.text) = g.h
        """,
        "ngram_jaccard": f"""
            WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, source, array_to_string(t[s.i:s.i+{NGRAM_N - 1}], ' ') AS g
              FROM toks, UNNEST(generate_series(1, len(t) - {NGRAM_N - 1})) AS s(i)
            ),
            sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY doc_id),
            pairs AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, CAST(count(*) AS BIGINT) AS common
              FROM grams a JOIN grams b
                ON a.g = b.g AND a.source = b.source AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT p.src, p.dst, p.common,
                   round(p.common / CAST(sa.n + sb.n - p.common AS DOUBLE), 6) AS jaccard
            FROM pairs p
            JOIN sizes sa ON p.src = sa.doc_id
            JOIN sizes sb ON p.dst = sb.doc_id
            WHERE p.common / CAST(sa.n + sb.n - p.common AS DOUBLE) >= {NGRAM_MIN_JACCARD}
        """,
        "token_pair_mash": f"""
            WITH {_TOKEN_PAIRS_CTE}
            SELECT src, dst, n1, n2, common,
                   round(j, 6) AS jaccard, round(mash_d, 6) AS mash_d
            FROM dists
        """,
        "ani_histogram": f"""
            WITH {_TOKEN_PAIRS_CTE}
            SELECT CAST(floor((1.0 - mash_d) * 100) AS BIGINT) AS ani_bucket,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM dists GROUP BY 1
        """,
        "density_histogram": f"""
            WITH {_TOKEN_PAIRS_CTE},
            sym AS (
              SELECT src AS doc_id, mash_d FROM dists
              UNION ALL
              SELECT dst AS doc_id, mash_d FROM dists
            ),
            counts AS (
              SELECT doc_id, CAST(least(floor(mash_d * 100), 99) AS BIGINT) AS bucket,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM sym GROUP BY 1, 2
            )
            SELECT doc_id, bucket, cnt,
                   CAST(sum(cnt) OVER (PARTITION BY doc_id ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
            FROM counts
        """,
        "topk_orders": """
            SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     CAST(row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
              FROM orders
            ) WHERE rk <= 3
        """,
        "best_supplier": """
            SELECT s_nationkey, s_suppkey, s_acctbal FROM (
              SELECT s_nationkey, s_suppkey, s_acctbal,
                     row_number() OVER (PARTITION BY s_nationkey
                          ORDER BY s_acctbal ASC, s_suppkey ASC) AS rk
              FROM supplier
            ) WHERE rk = 1
        """,
        "value_histogram": """
            SELECT CAST(floor(value) AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
        """,
        "events_stats": """
            SELECT CAST(count(*) AS BIGINT) AS n,
                   round(min(value), 6) AS min_v,
                   round(max(value), 6) AS max_v,
                   round(avg(value), 6) AS avg_v,
                   round(stddev_pop(value), 6) AS std_v,
                   round(quantile_cont(value, 0.25), 6) AS q1,
                   round(quantile_cont(value, 0.5), 6) AS median,
                   round(quantile_cont(value, 0.75), 6) AS q3
            FROM events
        """,
        "union_dedup": """
            SELECT o_custkey AS custkey FROM orders
            UNION
            SELECT c_custkey AS custkey FROM customer
        """,
        "token_counts": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "text_quality": quality_sql,
        "lang_id": _sql_lang_id(),
        "doc_fingerprint": f"""
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                       regexp_extract_all(text, '{TOKEN_RE}'))), ' ')) AS fp
            FROM documents
        """,
        "distinct_token_counts": f"""
            SELECT doc_id,
                   CAST(len(list_distinct(regexp_extract_all(text, '{TOKEN_RE}'))) AS BIGINT)
                     AS n_distinct
            FROM documents
        """,
        "ann_cosine_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id % {ANN_QUERY_MOD} = 0),
            c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            scored AS (
              SELECT q.query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qv, c.v) AS cos
              FROM q, c WHERE c.vec_id != q.query_id
            ),
            ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, round(cos, 6) AS cos,
                   CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= {ANN_K}
        """,
        "embedding_neardup": f"""
            WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id AS src, b.vec_id AS dst,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cos
            FROM c a JOIN c b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= {NEARDUP_TAU}
        """,
        # minhash_dedup / minhash_dedup_banded / simhash_dedup /
        # minhash_cluster_stats: custom-hash sketches + iterative CC are not
        # SQL-expressible; covered by the numpy parity oracle in tests/.
    }
