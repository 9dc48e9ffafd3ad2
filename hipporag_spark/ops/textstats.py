"""Text analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. All JVM built-ins, SQL-oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles as shingles_of

STOPWORDS = ["the", "a", "of", "and", "to", "in"]

# tiny marker dictionaries for the n-gram/stopword language-ID heuristic;
# deterministic tie-break = list order
LANG_MARKERS = {
    "en": ["the", "a", "and", "of"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "la", "los", "y"],
    "zh": ["de", "le", "shi", "bu"],
}


def _words(col):
    return F.filter(F.split(F.lower(col), " "), lambda w: F.length(w) > 0)


def token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, avg_token_len) — whitespace +
    BPE-ish subword estimate (≈ chars/4, the common rule of thumb)."""
    w = _words(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct_tokens"),
        F.round(
            F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            / F.size(w),
            6,
        ).alias("avg_token_len"),
        F.ceil(F.length("text") / 4).alias("est_bpe_tokens"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite quality signals per doc (length / stopword ratio /
    type-token ratio / punctuation ratio), each in [0,1], rounded 6dp."""
    w = _words(F.col("text"))
    n = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    punct = F.length(F.regexp_replace(F.col("text"), "[A-Za-z0-9 ]", ""))
    return documents.select(
        "doc_id",
        n.alias("n_words"),
        F.round(F.size(F.array_distinct(w)) / n, 6).alias("type_token_ratio"),
        F.round(n_stop / n, 6).alias("stopword_ratio"),
        F.round(punct / F.length("text"), 6).alias("punct_ratio"),
        F.round(F.least(F.length("text") / F.lit(500.0), F.lit(1.0)), 6).alias("length_score"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language-ID heuristic: ``(doc_id, predicted_lang, hits)``.

    Score per language = # marker-word occurrences; winner = max hits with
    deterministic tie-break on language code order. (The synthetic corpus
    is English-ish for every ``lang`` value — the operator's semantics, not
    its accuracy on synthetic text, are the contract.)
    """
    w = _words(F.col("text"))
    scores = [
        F.struct(
            F.size(F.filter(w, lambda x: x.isin(ms))).alias("hits"),
            F.lit(-i).alias("ord"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, ms) in enumerate(sorted(LANG_MARKERS.items()))
    ]
    best = F.greatest(*scores)
    return documents.select(
        "doc_id", best["lang"].alias("predicted_lang"), best["hits"].alias("hits")
    )


def fingerprint(documents: DataFrame, base: int = 7, cycle: int = 11) -> DataFrame:
    """Order-sensitive rolling document fingerprint: ``(doc_id, fingerprint)``.

    fp = Σ_pos wordhash16(word) · base^(pos mod cycle) — positional weighting
    keeps it order-sensitive while staying a plain SUM (distribution-safe,
    no sequential scan). wordhash16 = first 4 md5 hex chars.
    """
    w = documents.select("doc_id", F.posexplode(_words(F.col("text"))).alias("pos", "word"))
    return (
        w.withColumn("h", F.conv(F.substring(F.md5("word"), 1, 4), 16, 10).cast("long"))
        .withColumn("pw", F.pow(F.lit(base), F.pmod(F.col("pos"), F.lit(cycle))).cast("long"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("h") * F.col("pw")).alias("fingerprint"))
    )


def tfidf(documents: DataFrame, top_k: int = 5) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic two-aggregation
    relational plan: explode words → per-(doc, term) counts → join
    per-term document frequencies → score → per-doc window top-k.

    Scale shape: both aggregations are partial (map-side combine) before
    their exchanges; the document-frequency side is one row per distinct
    term, orders of magnitude smaller than the corpus — Catalyst
    broadcasts it (AQE decides from runtime stats). The final top-k is a
    window over (doc, ≤|vocab ∩ doc|) rows, partitioned by doc. Smoothed
    idf = ln((N+1)/(df+1)) + 1 (sklearn's convention); tf = raw count /
    doc token count.

    Deterministic tie-break: (score desc, term asc) — pinned so the
    DuckDB oracle hash-matches.
    """
    from pyspark.sql import Window

    words = documents.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tc"))
    doclen = words.groupBy("doc_id").agg(F.count("*").alias("dl"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = documents.select(F.countDistinct("doc_id").alias("__n"))
    scored = (
        tf.join(doclen, "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("tc") / F.col("dl"))
                * (F.log((F.col("__n") + 1) / (F.col("df") + 1)) + 1),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "rank", "term", "tfidf")
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021, table A1
    — public recipe): ``(doc_id, n_bigrams, top_bigram_frac,
    dup_trigram_frac, flagged)``.

    top_bigram_frac  = occurrences of the single most frequent word
    2-gram / total 2-gram occurrences; dup_trigram_frac = fraction of
    3-gram occurrences whose gram appears more than once in the doc.
    ``flagged`` marks machine-generated/boilerplate-repetitive docs at
    the published thresholds (top 2-gram > 0.20, duplicated 3-grams
    > 0.30).

    Scale shape: two explode → ``groupBy(doc_id, gram)`` counts, each
    with map-side partial aggregation, then a per-doc rollup — the
    exchanges are keyed by (doc, gram) so hub grams never concentrate;
    everything is JVM built-ins (no Python in the plan).
    """
    def gram_counts(k: int):
        return (
            documents.select(
                "doc_id", F.explode(shingles_of(F.col("text"), k)).alias("g")
            )
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
        )

    bi = gram_counts(2).groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac"),
    )
    tri = gram_counts(3).groupBy("doc_id").agg(
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c"),
            6,
        ).alias("dup_trigram_frac")
    )
    return bi.join(tri, "doc_id").select(
        "doc_id",
        "n_bigrams",
        "top_bigram_frac",
        "dup_trigram_frac",
        (
            (F.col("top_bigram_frac") > 0.20) | (F.col("dup_trigram_frac") > 0.30)
        ).alias("flagged"),
    )
