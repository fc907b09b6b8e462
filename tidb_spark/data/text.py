"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All JVM-side column expressions (no Python UDFs) —
at 100 TB these run inside whole-stage codegen on the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from tidb_spark.data.dedup import normalize_text, shingle_hashes


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    normalized = normalize_text(col)
    return F.when(F.length(normalized) == 0, 0).otherwise(
        F.size(F.split(normalized, " "))
    ).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: count of word-piece units — each word
    contributes ceil(len/4) pieces (a deterministic stand-in for a real
    tokenizer; the Spark plumbing — regexp over the scan — is the point).

    Computed as ``regexp_count(text, '\\S{1,4}')``: greedy matching chops
    every maximal non-space run into non-overlapping 4-char chunks plus one
    shorter tail, i.e. exactly ceil(len/4) matches per word, entirely
    JVM-side.  The previous ``F.aggregate`` HOF over the split-word array
    ran interpreted per element (~20 µs/elem — the trap documented in
    data/dedup.py) and cost text_quality ~1.5 s at sf0.1."""
    return F.regexp_count(normalize_text(col), F.lit(r"\S{1,4}")).cast("long")


def punct_ratio_micros(col: Column) -> Column:
    """Punctuation chars per million chars (integer — FP-safe for oracles)."""
    total = F.length(col)
    punct = total - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(total == 0, 0).otherwise(
        F.floor(punct.cast("double") * 1_000_000 / total.cast("double"))
    ).cast("long")


def stopword_hits(col: Column, stopwords: list[str]) -> Column:
    """Total occurrences of the given (space-padded) stopwords."""
    padded = F.concat(F.lit(" "), normalize_text(col), F.lit(" "))
    total = F.lit(0).cast("long")
    for w in stopwords:
        needle = f" {w} "
        total = total + (
            (F.length(padded) - F.length(F.regexp_replace(padded, needle, "")))
            / len(needle)
        ).cast("long")
    return total


# Tiny per-language stopword lists for the n-gram/stopword heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of stopword hit counts, 'und' when no
    list scores (deterministic tie-break: language name order)."""
    scores = {
        lang: stopword_hits(col, words) for lang, words in sorted(LANG_STOPWORDS.items())
    }
    best_score = F.greatest(*scores.values())
    result = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        result = F.when(
            (best_score > 0) & (scores[lang] == best_score), F.lit(lang)
        ).otherwise(result)
    return result


def quality_score_micros(col: Column) -> Column:
    """Composite quality score in [0, 1e6]: length band + punctuation
    penalty + mean-word-length band — all integer arithmetic."""
    normalized = normalize_text(col)
    n_chars = F.length(normalized)
    n_tokens = token_count(col)
    mean_word_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        n_chars.cast("double") / n_tokens.cast("double")
    )
    length_ok = F.when((n_chars >= 50) & (n_chars <= 10_000), 400_000).otherwise(
        100_000
    )
    word_ok = F.when((mean_word_len >= 3.0) & (mean_word_len <= 12.0), 400_000).otherwise(
        100_000
    )
    punct_penalty = F.least(punct_ratio_micros(col), F.lit(200_000))
    return (length_ok + word_ok - punct_penalty + F.lit(200_000)).cast("long")


def fingerprint_md5(col: Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def winnowing_from_hashes(hashes: Column, *, window: int = 4) -> Column:
    """Winnowing minima over an ALREADY-MATERIALIZED hash-array column.

    ``hashes`` must be a bound column reference (e.g. produced by a prior
    ``select``), not an inline expression: Catalyst evaluates a lambda body
    per element, so an inline hash-array expression would be recomputed for
    every window position — O(n²) per document."""
    n = F.size(hashes)
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(hashes, i, window)),
    )
    return F.array_distinct(windows)


def winnowing_fingerprints(col: Column, *, k: int = 8, window: int = 4) -> Column:
    """Winnowing (Schleimer et al., SIGMOD'03): distinct minima of each
    sliding window over the k-gram rolling-hash sequence — a compact,
    position-robust fingerprint set.

    Convenience single-expression form; for anything beyond tiny inputs use
    ``shingle_hashes`` in one select, then :func:`winnowing_from_hashes` on
    the materialized column (see that function's warning)."""
    return winnowing_from_hashes(shingle_hashes(col, k), window=window)


def scrub_pii(col: Column) -> Column:
    """PII redaction for training-data hygiene: emails, phone-ish number
    runs, and IPv4 literals replaced with typed placeholder tokens.

    Pure codegen regexp_replace chain (no UDF).  Patterns restrict to the
    RE2 ∩ java.util.regex common subset (no backrefs/lookaround) so an
    external engine (the DuckDB oracle, a Flink port) reproduces them
    byte-for-byte."""
    out = F.regexp_replace(
        col, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    out = F.regexp_replace(
        out, r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"
    )
    out = F.regexp_replace(out, r"\+?\d[\d -]{7,}\d", "<PHONE>")
    return out


def chunk_spans(col: Column, *, stride: int) -> Column:
    """Start offsets (0-based, token units) of overlapping chunks over the
    normalized-whitespace token stream: 0, stride, 2*stride, ... while the
    start is inside the document.  Every document yields >= 1 chunk (an
    empty/short doc is one short chunk) — RAG/pretraining chunkers keep
    tails, they don't drop them.
    """
    toks = F.split(normalize_text(col), " ")
    n = F.size(toks)
    return F.sequence(
        F.lit(0), F.greatest(n - F.lit(1), F.lit(0)), F.lit(stride)
    )


def chunk_text(col: Column, start: Column, *, window: int) -> Column:
    """The chunk's text: `window` tokens from 0-based `start` (1-based
    slice), re-joined with single spaces.  Pure codegen: split + slice +
    concat_ws."""
    toks = F.split(normalize_text(col), " ")
    return F.concat_ws(" ", F.slice(toks, start + F.lit(1), F.lit(window)))


def canonicalize_url(col: Column) -> Column:
    """Canonical URL form for URL-level deduplication (the CCNet /
    Common-Crawl pipeline's first dedup key): lowercase scheme+host,
    strip default ports (:80/:443), drop the fragment, drop tracking
    query params (utm_*, fbclid, gclid, ref), sort the surviving params,
    and strip trailing slashes from the path.  Pure codegen column
    expressions — regexp_extract/replace plus array filter/sort — so the
    canonicalization runs inside whole-stage codegen on the scan at any
    scale.
    """
    no_frag = F.split(col, "#").getItem(0)
    scheme_host = F.lower(
        F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]+)", 1)
    )
    scheme_host = F.regexp_replace(scheme_host, r":(80|443)$", "")
    path = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.when(
        no_frag.contains("?"), F.split(no_frag, r"\?", 2).getItem(1)
    )
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "")
            & ~p.rlike(r"^(utm_[^=]*|fbclid|gclid|ref)="),
        )
    )
    qtail = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    return F.concat(scheme_host, path, qtail)


def segment_spans(col: Column, *, seg_tokens: int) -> Column:
    """Fixed-stride token segments: array of (seg_idx, seg_text) structs,
    segment i = tokens [i*seg_tokens, (i+1)*seg_tokens).  The paragraph
    proxy for boilerplate detection when the corpus carries no newlines;
    swap the splitter for real line/paragraph splits when it does.  Pure
    codegen (split / sequence / transform / slice)."""
    toks = F.split(normalize_text(col), " ")
    n_seg = F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.struct(
            i.alias("seg_idx"),
            F.array_join(
                F.slice(toks, i * seg_tokens + 1, seg_tokens), " "
            ).alias("seg"),
        ),
    )


def strip_common_segments(
    df,
    text_col: str,
    id_col: str,
    *,
    seg_tokens: int = 10,
    min_df: int = 50,
):
    """Boilerplate removal (the CCNet/C4 common-paragraph strip): segment
    every document, count each distinct segment's document frequency,
    drop segments appearing in >= ``min_df`` documents, and reassemble
    the survivors in order.

    Scale shape: one shuffle keyed on segment text for the df-count
    (map-side combined), one more to regroup survivors per document;
    the boilerplate set is an anti-join — no driver materialization,
    no all-pairs work.  Returns (id, n_seg_before, n_seg_kept,
    cleaned_text).
    """
    segs = df.select(
        F.col(id_col).alias("doc"),
        F.explode(segment_spans(F.col(text_col), seg_tokens=seg_tokens)).alias(
            "s"
        ),
    ).select("doc", F.col("s.seg_idx").alias("seg_idx"), F.col("s.seg").alias("seg"))
    common = (
        segs.groupBy("seg")
        .agg(F.count_distinct("doc").alias("df"))
        .where(F.col("df") >= min_df)
        .select("seg")
    )
    kept = segs.join(common, "seg", "left_anti")
    # Segment count is a closed-form expression on the source row — no
    # second aggregate over the exploded frame.
    n_toks = F.size(F.split(normalize_text(F.col(text_col)), " "))
    before = df.select(
        F.col(id_col).alias("doc"),
        F.ceil(n_toks / F.lit(seg_tokens)).cast("long").alias("n_seg_before"),
    )
    return (
        before.join(
            kept.groupBy("doc").agg(
                F.count(F.lit(1)).alias("n_seg_kept"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("seg_idx", "seg"))
                        ),
                        lambda s: s.seg,
                    ),
                    " ",
                ).alias("cleaned_text"),
            ),
            "doc",
            "left",
        )
        .select(
            "doc",
            "n_seg_before",
            F.coalesce("n_seg_kept", F.lit(0)).alias("n_seg_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )
