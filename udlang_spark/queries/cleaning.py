"""Corpus-cleaning queries: the filter/normalize stage of an LLM training-data
pipeline (quality rules, in-document normalization, intra-corpus duplicated
spans, LM-familiarity scoring, subword tokenization).

All engine extensions beyond the reference's record-at-a-time surface
(SURVEY.md §2.6 "ext"); each is stock Spark shaped for 100 TB — per-operator
shuffle budgets are in the docstrings. Published rule sets these follow:
Gopher's document-quality heuristics (Rae et al. 2021, table A1) and the
duplicated-span analysis of Lee et al. 2021 ("Deduplicating Training Data
Makes Language Models Better"), both re-expressed transcendental-free so the
DuckDB oracles hash bit-for-bit (integer counts and IEEE-exact divisions
only — the cross-engine determinism rule from queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udlang_spark.functions import text as TXT
from udlang_spark.session import persist_tracked
from udlang_spark.sources.tables import load_table

_WL = "regexp_extract_all(lower(text), '\\S+')"  # = TXT.words(), oracle side
_STOPS = "['" + "','".join(TXT.STOPWORDS) + "']"


# ---------------------------------------------------------------------------
# Gopher-style document quality rules
# ---------------------------------------------------------------------------


def t_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule diagnostics per document (Rae et al. 2021 A1,
    thresholds adapted to this corpus's scale): word count in [20, 100000],
    mean word length in [2, 12], >= 80% of words contain an alphabetic
    character, and >= 2 stopword hits. Emits each measured signal plus the
    first failed rule (or NULL) and the final keep flag.

    Scale: pure row-local Column work — zero shuffles, rides along any scan;
    one whole-stage-codegen span. The word array is computed once and every
    signal folds over the bound value (no per-signal re-tokenization).
    """
    docs = load_table(spark, "documents", sf_dir)
    w = TXT.words("text")
    d = docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.aggregate(F.transform(w, F.length), F.lit(0), lambda a, x: a + x).alias(
            "_chars"
        ),
        F.size(F.filter(w, lambda x: x.rlike("[a-z]"))).alias("n_alpha_words"),
        F.size(F.filter(w, lambda x: x.isin(*TXT.STOPWORDS))).alias("n_stop"),
    )
    mean_len = (F.col("_chars") / F.col("n_words")).alias("mean_word_len")
    alpha = (F.col("n_alpha_words") / F.col("n_words")).alias("alpha_frac")
    rule = (
        F.when(
            (F.col("n_words") < 20) | (F.col("n_words") > 100000), "word_count"
        )
        .when(
            (F.col("_chars") / F.col("n_words") < 2)
            | (F.col("_chars") / F.col("n_words") > 12),
            "mean_word_len",
        )
        .when(F.col("n_alpha_words") * 5 < F.col("n_words") * 4, "alpha_frac")
        .when(F.col("n_stop") < 2, "stopwords")
        .alias("failed_rule")
    )
    return d.select(
        "doc_id",
        "n_words",
        mean_len,
        alpha,
        F.col("n_stop"),
        rule,
        rule.isNull().alias("keep"),
    ).select(
        "doc_id", "n_words", "mean_word_len", "alpha_frac", "n_stop",
        "failed_rule", "keep",
    )


ORACLE_GOPHER_RULES = f"""
WITH w AS (
  SELECT doc_id, {_WL} AS wl FROM documents
),
sig AS (
  SELECT doc_id,
    len(wl) AS n_words,
    list_sum(list_transform(wl, x -> length(x))) AS chars,
    len(list_filter(wl, x -> regexp_matches(x, '[a-z]'))) AS n_alpha_words,
    len(list_filter(wl, x -> list_contains({_STOPS}, x))) AS n_stop
  FROM w
),
r AS (
  SELECT *,
    CASE
      WHEN n_words < 20 OR n_words > 100000 THEN 'word_count'
      WHEN chars::DOUBLE / n_words < 2 OR chars::DOUBLE / n_words > 12
        THEN 'mean_word_len'
      WHEN n_alpha_words * 5 < n_words * 4 THEN 'alpha_frac'
      WHEN n_stop < 2 THEN 'stopwords'
    END AS failed_rule
  FROM sig
)
SELECT doc_id, n_words,
  chars::DOUBLE / n_words AS mean_word_len,
  n_alpha_words::DOUBLE / n_words AS alpha_frac,
  n_stop, failed_rule, failed_rule IS NULL AS keep
FROM r
"""


# ---------------------------------------------------------------------------
# consecutive-duplicate-word collapse (normalization)
# ---------------------------------------------------------------------------


def t_dedup_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse runs of consecutive repeated tokens ("a a the" -> "a the"),
    the classic crawl-noise normalization, and emit before/after counts plus
    an md5 witness of the cleaned text.

    Scale: row-local — zero shuffles. The kept-token array is built by
    zipping the token array with its shifted self (two HOF *arguments*, so
    the regex tokenization runs twice per row total); the naive
    `filter(w, (x, i) -> w[i-1] != x)` form puts `w` INSIDE the lambda,
    re-running the regex per element — the measured ~50x trap from
    functions/text.py shingles.
    """
    docs = load_table(spark, "documents", sf_dir)
    w = TXT.words("text")
    sz = F.size(w)
    prev = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(w, 1, F.greatest(sz - 1, F.lit(0))),
    )
    kept = F.array_compact(
        F.zip_with(w, prev, lambda c, p: F.when(p.isNull() | (c != p), c))
    )
    return docs.select(
        "doc_id",
        sz.alias("n_tokens"),
        F.size(kept).alias("n_kept"),
        (sz - F.size(kept)).alias("n_removed"),
        F.md5(F.array_join(kept, " ")).alias("cleaned_md5"),
    )


ORACLE_DEDUP_WORDS = f"""
WITH w AS (SELECT doc_id, {_WL} AS wl FROM documents),
k AS (
  SELECT doc_id, wl,
    list_filter(wl, (x, i) -> i = 1 OR wl[i - 1] <> x) AS kept
  FROM w
)
SELECT doc_id,
  len(wl) AS n_tokens,
  len(kept) AS n_kept,
  len(wl) - len(kept) AS n_removed,
  md5(array_to_string(kept, ' ')) AS cleaned_md5
FROM k
"""


# ---------------------------------------------------------------------------
# intra-corpus duplicated spans (Lee et al. 2021, k-gram approximation)
# ---------------------------------------------------------------------------

_SPAN_K = 8  # tokens per span fingerprint


def d_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span statistics: the fraction of a doc's
    distinct {k}-token grams that also appear in at least one OTHER document
    (the k-gram approximation of substring-level dedup from Lee et al. 2021
    — a span duplicated across docs shares all its k-grams).

    Scale: the gram relation is computed once and persisted; the only wide
    ops are one gram-key aggregation (map-side-combined count of distinct
    docs per gram), one gram-key join of the doc-gram relation against the
    duplicated-gram set, and the per-doc count aggs. Nothing is all-pairs
    and no per-doc state exceeds its own gram set; skewed grams (boilerplate
    shared by millions of docs) are exactly the AQE skew-join case.
    """
    docs = load_table(spark, "documents", sf_dir)
    grams = persist_tracked(
        docs.select(
            "doc_id", F.explode(TXT.shingles("text", n=_SPAN_K)).alias("gram")
        )
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    totals = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    dups = (
        grams.join(dup, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_grams"))
    )
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(dups, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.coalesce("n_dup_grams", F.lit(0))
                / F.col("n_grams").cast("double"),
            ).alias("dup_frac"),
        )
    )


def _spans_cte(k: int = _SPAN_K) -> str:
    join = " || ' ' || ".join(f"wl[i+{j}]" for j in range(k))
    return f"""
WITH w AS (SELECT doc_id, {_WL} AS wl FROM documents),
g AS (
  SELECT doc_id, list(DISTINCT ({join})) AS grams
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(wl) - {k - 1})) AS i) s
  WHERE len(wl) >= {k}
  GROUP BY doc_id
),
gr AS (SELECT doc_id, unnest(grams) AS gram FROM g),
dup AS (
  SELECT gram FROM gr GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
tot AS (SELECT doc_id, count(*) AS n_grams FROM gr GROUP BY doc_id),
dd AS (
  SELECT doc_id, count(*) AS n_dup_grams
  FROM gr JOIN dup USING (gram) GROUP BY doc_id
)
"""


ORACLE_DUPLICATE_SPANS = (
    _spans_cte()
    + """
SELECT d.doc_id,
  coalesce(n_grams, 0) AS n_grams,
  coalesce(n_dup_grams, 0) AS n_dup_grams,
  CASE WHEN coalesce(n_grams, 0) > 0
    THEN coalesce(n_dup_grams, 0) / n_grams::DOUBLE END AS dup_frac
FROM documents d
LEFT JOIN tot USING (doc_id)
LEFT JOIN dd USING (doc_id)
"""
)


# ---------------------------------------------------------------------------
# bigram-LM familiarity (transcendental-free perplexity proxy)
# ---------------------------------------------------------------------------


def t_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model-style quality proxy without a model: score each doc by
    the fraction of its distinct bigrams that occur in >= 2 documents
    ("familiar" under a corpus bigram LM). Gibberish scores low, formulaic
    text high. The CCNet pipeline uses a KenLM perplexity for this slot; the
    familiarity ratio is the transcendental-free analogue (ratios of exact
    integer counts — no log, so the DuckDB differential is hash-exact under
    any partitioning; the band thresholds are fixed constants, not corpus
    quantiles, so scoring stays row-local after the join).

    Scale: one bigram-key agg + one bigram-key join + per-doc aggs on a
    persisted bigram relation — same budget as d_duplicate_spans; no global
    sort (bands, not ntile — a corpus-wide quantile would serialize through
    one window partition).
    """
    docs = load_table(spark, "documents", sf_dir)
    bg = persist_tracked(
        docs.select("doc_id", F.explode(TXT.shingles("text", n=2)).alias("bg"))
    )
    familiar = (
        bg.groupBy("bg")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("bg")
    )
    per_doc = bg.groupBy("doc_id").agg(F.count("*").alias("n_bigrams"))
    fam = (
        bg.join(familiar, "bg")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_familiar"))
    )
    ratio = F.when(
        F.col("n_bigrams") > 0,
        F.coalesce("n_familiar", F.lit(0)) / F.col("n_bigrams").cast("double"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(fam, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_familiar", F.lit(0)).alias("n_familiar"),
            ratio.alias("familiar_ratio"),
            F.when(ratio.isNull(), "empty")
            .when(ratio < 0.25, "low")
            .when(ratio < 0.5, "mid")
            .when(ratio < 0.75, "high")
            .otherwise("top")
            .alias("band"),
        )
    )


ORACLE_BIGRAM_LM = f"""
WITH w AS (SELECT doc_id, {_WL} AS wl FROM documents),
g AS (
  SELECT doc_id, list(DISTINCT (wl[i] || ' ' || wl[i+1])) AS grams
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(wl) - 1)) AS i) s
  WHERE len(wl) >= 2
  GROUP BY doc_id
),
gr AS (SELECT doc_id, unnest(grams) AS bg FROM g),
familiar AS (
  SELECT bg FROM gr GROUP BY bg HAVING count(DISTINCT doc_id) >= 2
),
per_doc AS (SELECT doc_id, count(*) AS n_bigrams FROM gr GROUP BY doc_id),
fam AS (
  SELECT doc_id, count(*) AS n_familiar
  FROM gr JOIN familiar USING (bg) GROUP BY doc_id
),
j AS (
  SELECT d.doc_id,
    coalesce(n_bigrams, 0) AS n_bigrams,
    coalesce(n_familiar, 0) AS n_familiar,
    CASE WHEN coalesce(n_bigrams, 0) > 0
      THEN coalesce(n_familiar, 0) / n_bigrams::DOUBLE END AS familiar_ratio
  FROM documents d LEFT JOIN per_doc USING (doc_id) LEFT JOIN fam USING (doc_id)
)
SELECT *,
  CASE
    WHEN familiar_ratio IS NULL THEN 'empty'
    WHEN familiar_ratio < 0.25 THEN 'low'
    WHEN familiar_ratio < 0.5 THEN 'mid'
    WHEN familiar_ratio < 0.75 THEN 'high'
    ELSE 'top'
  END AS band
FROM j
"""


# ---------------------------------------------------------------------------
# greedy subword (wordpiece-style) tokenization with a corpus-derived vocab
# ---------------------------------------------------------------------------

_WP_VOCAB = 64  # vocabulary size (2..4-char grams); single chars are implicit
_WP_MAX = 4  # longest vocab entry


def _wp_vocab_df(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(word_counts, vocab) — vocab = top-{_WP_VOCAB} character 2..4-grams by
    corpus occurrence (gram occurrences within a word x word frequency),
    tie-broken by gram text. Computed on the DISTINCT word domain (the q44
    measured decision: per-string work on the value domain, re-attach by
    join), so gram extraction cost scales with |vocab of corpus|, not corpus
    size."""
    words_rel = docs.select(
        "doc_id", F.explode(TXT.words("text")).alias("word")
    )
    # persisted: the distinct-word relation feeds three consumers (the gram
    # pipeline behind the vocab top-k, the segmentation input, and nothing
    # else directly — but without the persist the vocab .collect() and the
    # tokenized scan each re-run the corpus explode + word agg)
    word_counts = persist_tracked(
        words_rel.groupBy("word").agg(F.count("*").alias("wc"))
    )
    grams = None
    for n in range(2, _WP_MAX + 1):
        # sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty (DuckDB's
        # generate_series(1, 0) is) — words shorter than n must be gated out
        # explicitly or they contribute junk grams to the vocab count.
        idx = F.when(
            F.length("word") >= n,
            F.sequence(F.lit(1), F.length("word") - (n - 1)),
        ).otherwise(F.array().cast("array<int>"))
        g = word_counts.select(
            F.explode(
                F.transform(idx, lambda i: F.substring(F.col("word"), i, F.lit(n)))
            ).alias("gram"),
            "wc",
        )
        grams = g if grams is None else grams.unionAll(g)
    vocab = (
        grams.groupBy("gram")
        .agg(F.sum("wc").alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(_WP_VOCAB)
    )
    return word_counts, vocab


def t_wordpiece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match subword tokenization (wordpiece-style) with a
    corpus-derived vocabulary: vocab = the {_WP_VOCAB} most frequent 2..4
    character grams (weighted by word frequency, ties by gram text); each
    word is segmented left-to-right taking the longest vocab match, single
    character as the unconditional fallback. Emits per-doc word/subword
    counts and the mean subwords-per-word — the fertility statistic every
    tokenizer-design loop monitors.

    Scale: the segmentation loop (data-dependent trip count) runs in an
    Arrow-batched mapInPandas over the DISTINCT word domain only; the vocab
    (<= {_WP_VOCAB} strings) is a closure constant on the executors, and
    docs re-attach by a word equi-join (AQE broadcasts the tokenized domain
    when small). Wide ops: word-count agg, gram agg + top-k, the re-attach
    join, the per-doc agg — all key-partitioned, nothing all-pairs, no
    driver materialization beyond the {_WP_VOCAB}-row vocab."""
    docs = load_table(spark, "documents", sf_dir)
    word_counts, vocab = _wp_vocab_df(docs)
    vset = frozenset(r["gram"] for r in vocab.collect())

    def seg(batches):
        for pdf in batches:
            counts = []
            for word in pdf["word"]:
                pos, n = 0, 0
                ln = len(word)
                while pos < ln:
                    step = 1
                    for m in range(_WP_MAX, 1, -1):
                        if word[pos : pos + m] in vset and pos + m <= ln:
                            step = m
                            break
                    pos += step
                    n += 1
                counts.append(n)
            pdf = pdf[["word"]].copy()
            pdf["n_sub"] = counts
            yield pdf

    tokenized = word_counts.select("word").mapInPandas(
        seg, "word string, n_sub long"
    )
    words_rel = docs.select("doc_id", F.explode(TXT.words("text")).alias("word"))
    per_doc = (
        words_rel.join(tokenized, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
    )
    return (
        load_table(spark, "documents", sf_dir)
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_subwords", F.lit(0)).alias("n_subwords"),
            F.when(
                F.coalesce("n_words", F.lit(0)) > 0,
                F.col("n_subwords") / F.col("n_words").cast("double"),
            ).alias("fertility"),
        )
    )


def _wordpiece_oracle() -> str:
    gram_selects = "\nUNION ALL\n".join(
        f"""SELECT substr(word, i, {n}) AS gram, wc
  FROM wc, LATERAL (
    SELECT unnest(generate_series(1, greatest(length(word) - {n - 1}, 0))) AS i
  ) s"""
        for n in range(2, _WP_MAX + 1)
    )
    match_arms = "\n      ".join(
        f"CASE WHEN substr(word, pos + 1, {m}) IN "
        f"(SELECT gram FROM vocab WHERE length(gram) = {m}) THEN {m} END,"
        for m in range(_WP_MAX, 1, -1)
    )
    return f"""
WITH RECURSIVE w AS (SELECT doc_id, {_WL} AS wl FROM documents),
wr AS (SELECT doc_id, unnest(wl) AS word FROM w),
wc AS (SELECT word, count(*) AS wc FROM wr GROUP BY word),
grams AS ({gram_selects}),
vocab AS (
  SELECT gram FROM grams GROUP BY gram
  ORDER BY sum(wc) DESC, gram ASC LIMIT {_WP_VOCAB}
),
tok AS (
  SELECT word, 0 AS pos, 0 AS n FROM wc
  UNION ALL
  SELECT word,
    pos + coalesce(
      {match_arms}
      1) AS pos,
    n + 1
  FROM tok WHERE pos < length(word)
),
nsub AS (SELECT word, max(n) AS n_sub FROM tok GROUP BY word),
per_doc AS (
  SELECT doc_id, count(*) AS n_words, sum(n_sub) AS n_subwords
  FROM wr JOIN nsub USING (word) GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(n_words, 0) AS n_words,
  coalesce(n_subwords, 0)::BIGINT AS n_subwords,
  CASE WHEN coalesce(n_words, 0) > 0
    THEN n_subwords / n_words::DOUBLE END AS fertility
FROM documents d LEFT JOIN per_doc USING (doc_id)
"""


ORACLE_WORDPIECE = _wordpiece_oracle()


QUERIES = {
    "t_gopher_rules": t_gopher_rules,
    "t_dedup_words": t_dedup_words,
    "d_duplicate_spans": d_duplicate_spans,
    "t_bigram_lm": t_bigram_lm,
    "t_wordpiece": t_wordpiece,
}

ORACLE = {
    "t_gopher_rules": ORACLE_GOPHER_RULES,
    "t_dedup_words": ORACLE_DEDUP_WORDS,
    "d_duplicate_spans": ORACLE_DUPLICATE_SPANS,
    "t_bigram_lm": ORACLE_BIGRAM_LM,
    "t_wordpiece": ORACLE_WORDPIECE,
}
