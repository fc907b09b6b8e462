"""Training-data pipeline query corpus: dedup (exact / n-gram Jaccard /
MinHash-LSH / SimHash / embedding), similarity search (brute-force, LSH,
IVF), text analysis (tokens, quality, language ID, fingerprints), and
multimodal binary-column plumbing.

Oracle strategy: anything whose math can be pinned to integers (quantized
dots, shingle counts, micro-ratios) is oracle-checked bit-exactly; sketch-
or FP-order-dependent operators (MinHash, SimHash, cosine, LSH/IVF probes,
mapInPandas decodes) are rows-only, with their exact counterparts covering
the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tidb_spark.catalog import load_table
from tidb_spark.data import dedup as dd
from tidb_spark.data import multimodal as mm
from tidb_spark.data import similarity as sim
from tidb_spark.data import text as tx
from tidb_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# DuckDB expression mirroring dd.normalize_text.
_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"


# --------------------------------------------------------------------------
# Dedup.

DEDUP_EXACT_ORACLE = f"""
SELECT md5({_NORM}) AS fingerprint,
       MIN(doc_id)  AS canonical_id,
       COUNT(*)     AS dup_count
FROM documents
GROUP BY fingerprint
ORDER BY fingerprint
"""


@register("dedup_exact", oracle=DEDUP_EXACT_ORACLE, tags=("dedup",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized-text fingerprint (one
    shuffle); canonical row = min doc_id."""
    docs = _t(spark, sf_dir, "documents")
    return dd.exact_dedup(docs, "text", "doc_id").orderBy("fingerprint")


DEDUP_NGRAM_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([substr(n, i, 8) FOR i IN range(1, greatest(length(n) - 6, 2))]) AS s
  FROM (SELECT doc_id, {_NORM} AS n FROM documents WHERE doc_id < 200)
),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         len(list_intersect(a.s, b.s)) AS c, len(a.s) AS n1, len(b.s) AS n2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT d1, d2, CAST(c AS DOUBLE) / (n1 + n2 - c) AS jaccard
FROM pairs
WHERE CAST(c AS DOUBLE) / (n1 + n2 - c) >= 0.2
ORDER BY d1, d2
"""


@register("dedup_ngram_jaccard", oracle=DEDUP_NGRAM_ORACLE, tags=("dedup",))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 8-gram Jaccard near-dup pairs via shingle inverted-index join
    (the scale path — no all-pairs comparison); the oracle cross-checks with
    an all-pairs list_intersect on the same restricted doc set."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return dd.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=8, threshold=0.2, max_posting=None
    ).orderBy("d1", "d2")


DEDUP_CLUSTER_ORACLE = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct([substr(n, i, 8) FOR i IN range(1, greatest(length(n) - 6, 2))]) AS s
  FROM (SELECT doc_id, {_NORM} AS n FROM documents WHERE doc_id < 200)
),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         len(list_intersect(a.s, b.s)) AS c, len(a.s) AS n1, len(b.s) AS n2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
),
good AS (
  SELECT d1, d2 FROM pairs
  WHERE CAST(c AS DOUBLE) / (n1 + n2 - c) >= 0.2
),
edges AS (
  SELECT d1 AS a, d2 AS b FROM good
  UNION
  SELECT d2 AS a, d1 AS b FROM good
),
reach(n, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT reach.n, edges.b FROM reach JOIN edges ON reach.r = edges.a
),
comp AS (SELECT n AS doc_id, MIN(r) AS canonical_id FROM reach GROUP BY n),
sizes AS (
  SELECT canonical_id, COUNT(*) AS cluster_size FROM comp GROUP BY canonical_id
)
SELECT comp.doc_id, comp.canonical_id, sizes.cluster_size
FROM comp JOIN sizes USING (canonical_id)
ORDER BY doc_id
"""


@register("dedup_cluster", oracle=DEDUP_CLUSTER_ORACLE, tags=("dedup",))
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: transitive closure of the exact
    8-gram-Jaccard near-dup pairs → (doc_id, canonical_id = min id in
    cluster, cluster_size).  Connected components run as alternating
    large-star/small-star rounds (O(log n) rounds of one groupBy + one
    join — the 100 TB shape; `data/cluster.py`); the oracle walks the
    same edges with DuckDB's recursive CTE, the reference's own
    formulation of reachability (its recursive-CTE executor)."""
    from tidb_spark.data import cluster as cl

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    pairs = dd.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=8, threshold=0.2, max_posting=None
    ).select("d1", "d2")
    return cl.duplicate_clusters(pairs).orderBy("doc_id")


@register("dedup_minhash_lsh", oracle=None, tags=("dedup", "approx"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32)+LSH(8 bands) candidate pairs verified at Jaccard ≥ 0.2 —
    sketch collisions are hash-family-specific → rows-only; exact semantics
    covered by dedup_ngram_jaccard."""
    docs = _t(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(
        docs, "text", "doc_id", k=8, num_hashes=32, bands=8, verify_threshold=0.2
    ).orderBy("d1", "d2")


@register("dedup_simhash", oracle=None, tags=("dedup", "approx"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32-bit) near-dup pairs at Hamming ≤ 6 via banded chunks."""
    docs = _t(spark, sf_dir, "documents")
    return dd.simhash_pairs(
        docs, "text", "doc_id", bits=32, chunks=4, max_hamming=6
    ).orderBy("d1", "d2")


EMBED_NEARDUP_ORACLE = """
WITH q AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
n AS (
  SELECT vec_id, qv,
         CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS norm2
  FROM q
),
pairs AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2,
         CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS BIGINT) AS dot,
         a.norm2 AS na2, b.norm2 AS nb2
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT v1, v2, dot
FROM pairs
WHERE dot > 0 AND dot * dot * 25 >= 4 * na2 * nb2
ORDER BY v1, v2
"""


@register("embedding_neardup", oracle=EMBED_NEARDUP_ORACLE, tags=("dedup", "similarity"))
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.4 — the corpus has no
    pairs above ~0.6, see BASELINE tuning) in exact integer arithmetic:
    vectors floor-quantized at 1e3, cosine test algebraized to
    dot²·25 ≥ 4·‖a‖²·‖b‖² — bit-exact across engines, no FP anywhere."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.allpairs_cosine_above(
        emb, scale=1000, threshold_num=2, threshold_den=5
    ).orderBy("v1", "v2")


# --------------------------------------------------------------------------
# Similarity search.

SIM_TOPK_ORACLE = """
WITH q AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
),
queries AS (SELECT vec_id AS query_id, qv AS query_qv FROM q WHERE vec_id < 5),
scored AS (
  SELECT query_id, vec_id,
         CAST(list_sum(list_transform(list_zip(query_qv, qv), p -> p[1] * p[2])) AS BIGINT) AS score
  FROM q CROSS JOIN queries
),
ranked AS (
  SELECT query_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, score FROM ranked WHERE rn <= 10
ORDER BY query_id, vec_id
"""


@register("sim_topk_quantized", oracle=SIM_TOPK_ORACLE, tags=("similarity",))
def sim_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-10 by exact quantized dot product (bit-exact oracle
    twin of the cosine top-k): broadcast queries × vectors, window top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = sim.brute_force_topk(
        emb, queries, k=10, metric="quantized_dot"
    )
    return out.select(
        "query_id", "vec_id", F.col("score").cast("long").alias("score")
    ).orderBy("query_id", "vec_id")


@register("sim_topk_cosine", oracle=None, tags=("similarity", "approx"))
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True cosine top-10 (FP scores are fold-order sensitive → rows-only;
    quantized twin above is the exact gate)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sim.brute_force_topk(emb, queries, k=10, metric="cosine").orderBy(
        "query_id", "vec_id"
    )


@register("sim_lsh_topk", oracle=None, tags=("similarity", "approx"))
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN (4 tables × 12 planes): candidates from
    bucket joins only — the 100 TB serving path."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sim.lsh_topk(emb, queries, dim=64, k=10, planes=12, tables=4).orderBy(
        "query_id", "vec_id"
    )


@register("sim_ivf_topk", oracle=None, tags=("similarity", "approx"))
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: 16 coarse lists, probe 4 — partition pruning for
    vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sim.ivf_topk(emb, queries, k=10, nlist=16, nprobe=4).orderBy(
        "query_id", "vec_id"
    )


# --------------------------------------------------------------------------
# Text analysis.

TEXT_STATS_ORACLE = f"""
SELECT doc_id,
       length({_NORM}) AS n_chars_norm,
       CASE WHEN length({_NORM}) = 0 THEN 0
            ELSE len(string_split({_NORM}, ' ')) END AS n_tokens,
       CASE WHEN length(text) = 0 THEN 0
            ELSE CAST(FLOOR((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1000000.0 / length(text)) AS BIGINT)
            END AS punct_micros
FROM documents
ORDER BY doc_id
"""


@register("text_stats", oracle=TEXT_STATS_ORACLE, tags=("text",))
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts + punctuation micro-ratio (integer arithmetic — FP-safe
    across engines); all inside whole-stage codegen."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length(dd.normalize_text(F.col("text"))).cast("long").alias("n_chars_norm"),
        tx.token_count(F.col("text")).alias("n_tokens"),
        tx.punct_ratio_micros(F.col("text")).alias("punct_micros"),
    ).orderBy("doc_id")


def _langid_oracle() -> str:
    """Generate the DuckDB argmax-of-stopword-hits expression from the same
    table the Spark operator uses, so the two can't drift."""
    padded = f"' ' || {_NORM} || ' '"
    hit_exprs = {}
    for lang, words in sorted(tx.LANG_STOPWORDS.items()):
        terms = [
            f"CAST((length({padded}) - length(replace({padded}, ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
            for w in words
        ]
        hit_exprs[lang] = " + ".join(terms)
    greatest = "GREATEST(" + ", ".join(f"h_{lang}" for lang in sorted(hit_exprs)) + ")"
    case = "'und'"
    for lang in sorted(hit_exprs, reverse=True):
        case = f"CASE WHEN best > 0 AND h_{lang} = best THEN '{lang}' ELSE {case} END"
    hits_sql = ", ".join(f"{e} AS h_{lang}" for lang, e in sorted(hit_exprs.items()))
    return f"""
WITH hits AS (SELECT doc_id, lang, {hits_sql} FROM documents),
best AS (SELECT *, {greatest} AS best FROM hits)
SELECT doc_id, lang AS labeled_lang, {case} AS predicted_lang
FROM best
ORDER BY doc_id
"""


@register("text_lang_id", oracle=_langid_oracle(), tags=("text",))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID heuristic vs the labeled lang column."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        tx.lang_id(F.col("text")).alias("predicted_lang"),
    ).orderBy("doc_id")


TEXT_FINGERPRINT_ORACLE = f"""
WITH fp AS (SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents)
SELECT f.doc_id, f.fingerprint, c.n_same
FROM fp f JOIN (SELECT fingerprint, COUNT(*) AS n_same FROM fp GROUP BY fingerprint) c
  ON f.fingerprint = c.fingerprint
ORDER BY f.doc_id
"""


@register("text_fingerprint", oracle=TEXT_FINGERPRINT_ORACLE, tags=("text",))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint (md5 of normalized text) + per-fingerprint
    multiplicity via a self-joined aggregate."""
    docs = _t(spark, sf_dir, "documents")
    fp = docs.select("doc_id", tx.fingerprint_md5(F.col("text")).alias("fingerprint"))
    counts = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("n_same"))
    return fp.join(counts, on="fingerprint").select(
        "doc_id", "fingerprint", "n_same"
    ).orderBy("doc_id")


@register("text_winnowing", oracle=None, tags=("text", "approx"))
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint sets (rolling-hash minima per window) — hash
    values are engine-specific → rows-only; emits per-doc fingerprint count
    plus docs sharing a fingerprint."""
    docs = _t(spark, sf_dir, "documents")
    w = 4
    posting = dd.shingle_posting(docs, "text", "doc_id", k=8, with_pos=True)
    win = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    n_win = Window.partitionBy("doc")
    fps = (
        posting.select(
            F.col("doc").alias("doc_id"),
            "pos",
            F.min("g").over(win).alias("fp"),
            F.max("pos").over(n_win).alias("max_pos"),
        )
        # Only full windows (the reference winnowing emits n-w+1 windows;
        # degenerate short docs keep window 1).
        .where(
            (F.col("pos") <= F.col("max_pos") - (w - 1)) | (F.col("pos") == 1)
        )
        .select("doc_id", "fp")
        .distinct()
    )
    shared = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .where(F.col("n_docs") > 1)
    )
    return shared.orderBy(F.col("n_docs").desc(), "fp").limit(100)


# --------------------------------------------------------------------------
# Multimodal binary columns.

MM_META_ORACLE = """
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       octet_length(encode(text)) AS byte_len,
       sha256(text) AS content_sha
FROM documents
ORDER BY media_id
"""


@register("multimodal_meta", oracle=MM_META_ORACLE, tags=("multimodal",))
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media table derived from documents: typed metadata
    (byte length, content hash) computed without any decode — the metadata
    path never touches codec code and prunes the payload column at scan."""
    docs = _t(spark, sf_dir, "documents")
    return (
        mm.attach_binary_payload(docs, "text", "doc_id")
        .select("media_id", "media_type", "byte_len", "content_sha")
        .orderBy("media_id")
    )


@register("multimodal_features", oracle=None, tags=("multimodal", "stub"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode → feature vectors (deterministic
    fake decoder standing in for absent codec libs; the batching/schema
    plumbing is the operator under test)."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.attach_binary_payload(docs, "text", "doc_id")
    feats = mm.decode_features(media, dim=8, fake=True)
    return feats.select("media_id", "media_type", "byte_len", "width", "height").orderBy(
        "media_id"
    )


MM_FRAMES_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id, text,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         octet_length(encode(text)) AS byte_len
  FROM documents
)
SELECT media_id, i AS frame_no, sha256(substr(text, i * 64 + 1, 64)) AS frame_sha
FROM media, UNNEST(range(0, least(byte_len // 64, 7) + 1)) AS t(i)
WHERE media_type = 'video'
ORDER BY media_id, frame_no
"""


@register("multimodal_frames", oracle=MM_FRAMES_ORACLE, tags=("multimodal",))
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: explode deterministic byte-slice 'frames'
    of video payloads (real decoder stubbed; slice/partition shape real)."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.attach_binary_payload(docs, "text", "doc_id")
    return (
        mm.frame_sample(media, every_n_bytes=64, max_frames=8)
        .select("media_id", F.col("frame_no").cast("long").alias("frame_no"), "frame_sha")
        .orderBy("media_id", "frame_no")
    )


TEXT_QUALITY_ORACLE = f"""
WITH s AS (
  SELECT doc_id, text, {_NORM} AS n,
         length({_NORM}) AS nc,
         CASE WHEN length({_NORM}) = 0 THEN 0
              ELSE len(string_split({_NORM}, ' ')) END AS nt,
         CASE WHEN length(text) = 0 THEN 0
              ELSE CAST(FLOOR((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1000000.0 / length(text)) AS BIGINT)
              END AS pm
  FROM documents
)
SELECT doc_id,
       (CASE WHEN nc BETWEEN 50 AND 10000 THEN 400000 ELSE 100000 END
        + CASE WHEN nt > 0 AND CAST(nc AS DOUBLE) / nt BETWEEN 3.0 AND 12.0
               THEN 400000 ELSE 100000 END
        - LEAST(pm, 200000) + 200000) AS quality_micros,
       CAST(list_sum(list_transform(string_split(n, ' '),
                     w -> CAST(CEIL(length(w) / 4.0) AS BIGINT))) AS BIGINT)
         AS bpe_tokens
FROM s
ORDER BY doc_id
"""


@register("text_quality", oracle=TEXT_QUALITY_ORACLE, tags=("text",))
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (length band + mean-word-length band −
    punctuation penalty, all integer micro-units) and BPE-ish subword
    count — the heuristic filter stage of a training-data pipeline."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.quality_score_micros(F.col("text")).alias("quality_micros"),
        tx.bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    ).orderBy("doc_id")
