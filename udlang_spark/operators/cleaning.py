"""Corpus-cleaning operators: quality rules, normalization, duplicated
spans, LM-familiarity scoring, subword tokenization. DataFrame -> DataFrame
functions over any relation with (doc_id, <text_col>) — the query layer
(queries/cleaning.py) wires them to the `documents` table and carries the
DuckDB oracles.

Scale design (why these shapes for 100 TB):
- gopher_rules / collapse_repeat_tokens are pure row-local Column work —
  zero shuffles, they ride along any scan.
- duplicate_span_stats / bigram_familiarity shuffle on gram keys only
  (agg + join + per-doc agg on a persisted gram relation) — never
  all-pairs; boilerplate grams shared by millions of docs are the AQE
  skew-join case.
- wordpiece_stats runs its data-dependent segmentation loop in Python on
  the DISTINCT word domain only (Arrow-batched mapInPandas) and re-attaches
  by equi-join — per-string work scales with |vocabulary|, not corpus size
  (the q44 domain-trick, applied to tokenization).

Published rule sets these follow: Gopher's document-quality heuristics
(Rae et al. 2021, table A1) and the duplicated-span analysis of Lee et al.
2021, re-expressed transcendental-free (integer counts and IEEE-exact
divisions) so cross-engine differentials hash bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from udlang_spark.functions import text as TXT
from udlang_spark.session import persist_tracked


def gopher_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher quality-rule diagnostics per document: word count in
    [20, 100000], mean word length in [2, 12], >= 80% of words contain an
    alphabetic character, >= 2 stopword hits. Emits each measured signal
    plus the first failed rule (or NULL) and the final keep flag.

    The word array is computed once; every signal folds over the bound
    value (no per-signal re-tokenization). One whole-stage-codegen span."""
    w = TXT.words(text_col)
    d = docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.aggregate(F.transform(w, F.length), F.lit(0), lambda a, x: a + x).alias(
            "_chars"
        ),
        F.size(F.filter(w, lambda x: x.rlike("[a-z]"))).alias("n_alpha_words"),
        F.size(F.filter(w, lambda x: x.isin(*TXT.STOPWORDS))).alias("n_stop"),
    )
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
    # the ratio columns need the n_words > 0 guard the CASE arms get for
    # free from short-circuiting: an empty doc divides by zero under ANSI
    # mode otherwise (caught by the degenerate-input pytest — the corpus
    # differential never sees an empty doc)
    nz = F.col("n_words") > 0
    return d.select(
        "doc_id",
        "n_words",
        F.when(nz, F.col("_chars") / F.col("n_words")).alias("mean_word_len"),
        F.when(nz, F.col("n_alpha_words") / F.col("n_words")).alias("alpha_frac"),
        F.col("n_stop"),
        rule,
        rule.isNull().alias("keep"),
    )


def collapse_repeat_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Collapse runs of consecutive repeated tokens ("a a the" -> "a the")
    and emit before/after counts plus an md5 witness of the cleaned text.

    The kept-token array is built by zipping the token array with its
    shifted self (two HOF *arguments*, so the regex tokenization runs twice
    per row total); the naive `filter(w, (x, i) -> w[i-1] != x)` form puts
    `w` INSIDE the lambda, re-running the regex per element — the measured
    ~50x trap from functions/text.py shingles."""
    w = TXT.words(text_col)
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


def duplicate_span_stats(
    docs: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """Per-document duplicated-span statistics: the fraction of a doc's
    distinct k-token grams that also appear in at least one OTHER document
    (the k-gram approximation of substring-level dedup from Lee et al. 2021
    — a span duplicated across docs shares all its k-grams)."""
    grams = persist_tracked(
        docs.select(
            "doc_id", F.explode(TXT.shingles(text_col, n=k)).alias("gram")
        )
    )
    # "appears in >= 2 DISTINCT docs" == min(doc_id) != max(doc_id): the
    # count_distinct form expands to a two-phase distinct aggregate — an
    # extra full gram-keyed Exchange of (gram, doc_id) rows plus two more
    # aggregate passes — while min/max combine map-side, so the one
    # remaining exchange carries ~one row per distinct gram per partition
    # (guide §2.3 aggregate-before-shuffle; r14).
    dup = (
        grams.groupBy("gram")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .where(F.col("_mn") != F.col("_mx"))
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


def _positioned_grams(wl, k: int):
    """Array of k-token grams ALIGNED to their 0-based start positions
    (shingles' zip_with-of-slices construction, minus the array_distinct —
    positions matter here). Empty array for docs with fewer than k
    tokens."""
    sz = F.size(wl)
    m = sz - (k - 1)
    grams = F.slice(wl, 1, m)
    for j in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(wl, j + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(sz >= k, grams).otherwise(F.array().cast("array<string>"))


def _maximal_spans(st, k: int):
    """array<struct<s,e>> of MAXIMAL merged spans from a sorted starts
    array: gram intervals [p, p+k) whose consecutive gap is <= k touch or
    overlap and stitch into one run, so span heads are positions with gap
    > k and span tails positions whose successor's gap is > k — two
    indexed filters + one zip_with, all codegen. The union of the
    returned (sorted, disjoint) spans equals the union of the raw gram
    intervals by construction.

    F.filter's index is 0-based; element_at is 1-based, so element_at(st,
    i) is the PREVIOUS element and element_at(st, i+2) the NEXT.
    try_element_at (NULL out of bounds) keeps ANSI mode quiet; the when()
    guards make the boundary rows unconditional heads/tails anyway."""
    span_heads = F.filter(
        st,
        lambda x, i: F.when(i == F.lit(0), F.lit(True)).otherwise(
            (x - F.try_element_at(st, i)) > F.lit(k)
        ),
    )
    span_tails = F.filter(
        st,
        lambda x, i: F.when(i == F.size(st) - 1, F.lit(True)).otherwise(
            (F.try_element_at(st, i + F.lit(2)) - x) > F.lit(k)
        ),
    )
    return F.zip_with(
        span_heads,
        span_tails,
        lambda s, e: F.struct(s.alias("s"), (e + F.lit(k)).alias("e")),
    )


def _kept_outside_spans(wl, spans):
    """Tokens of `wl` outside the sorted DISJOINT `spans`: the complement
    gaps [prev_e, next_s) sliced out of wl and flattened — O(|wl| +
    n_spans) row-local array copies. The naive form (filter wl, exists
    over starts per token) is O(|wl| * |starts|): quadratic in doc length
    on a dup-heavy doc where |starts| ~ |wl| (r9 VERDICT #6 — the 7.42x
    10x-stress ratio was exactly this corner). Spans are maximal, so
    consecutive gaps are non-empty except possibly the first/last; slice
    with length 0 returns []."""
    gap_s = F.concat(F.array(F.lit(0)), F.transform(spans, lambda sp: sp["e"]))
    gap_e = F.concat(F.transform(spans, lambda sp: sp["s"]), F.array(F.size(wl)))
    return F.flatten(
        F.zip_with(
            gap_s, gap_e, lambda gs, ge: F.slice(wl, gs + F.lit(1), ge - gs)
        )
    )


def scrub_duplicate_spans(
    docs: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """REMOVE cross-document duplicated spans and emit the cleaned corpus
    — the production counterpart of duplicate_span_stats (which only
    reports them). A k-token gram occurring in >= 2 documents marks its k
    token positions as duplicated in every document EXCEPT the gram's
    keeper (min doc_id), so exactly one canonical copy of every
    duplicated span survives — the Lee et al. 2021 substring-dedup
    policy, k-gram approximated.

    Scale shape (gram-key shuffles only, never all-pairs): one posexplode
    to the positioned gram relation; one gram-key aggregate finds
    duplicated grams and their keepers; one join + per-doc aggregate
    collects each doc's marked start positions (bounded by the doc's own
    gram count); the final token filter is row-local higher-order-function
    work (exists over the starts array). The corpus text itself shuffles
    ZERO times — only (doc_id, pos, gram) rows and the per-doc starts
    arrays move.

    Output per doc: token counts before/after and an md5 witness of the
    cleaned text, so an oracle differential pins every kept token."""
    toks = persist_tracked(
        docs.select(
            "doc_id",
            TXT.words(F.coalesce(F.col(text_col), F.lit(""))).alias("wl"),
        )
    )
    pos = persist_tracked(
        toks.select(
            "doc_id",
            F.posexplode(_positioned_grams(F.col("wl"), k)).alias(
                "pos", "gram"
            ),
        )
    )
    # ">= 2 DISTINCT docs" == min != max (and min IS the keeper): the
    # count_distinct form cost a second full gram-keyed Exchange plus two
    # extra aggregate passes; min/max combine map-side (guide §2.3; r14)
    dup = (
        pos.groupBy("gram")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.max("doc_id").alias("_mx"),
        )
        .where(F.col("keeper") != F.col("_mx"))
        .select("gram", "keeper")
    )
    starts = (
        pos.join(dup, "gram")
        .where(F.col("doc_id") != F.col("keeper"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("pos")).alias("starts"))
    )
    joined = toks.join(starts, "doc_id", "left")
    # kept = complement of the union of [p, p+k) over starts == complement
    # of the maximal merged spans — reconstructed by gap slices, O(|wl| +
    # n_spans) per row instead of exists-per-token O(|wl| * |starts|)
    spans = _maximal_spans(F.col("starts"), k)
    kept = F.when(F.col("starts").isNull(), F.col("wl")).otherwise(
        _kept_outside_spans(F.col("wl"), spans)
    )
    return joined.select(
        "doc_id",
        F.size("wl").alias("n_tokens"),
        F.size(kept).alias("n_kept"),
        (F.size("wl") - F.size(kept)).alias("n_removed"),
        F.md5(F.concat_ws(" ", kept)).alias("cleaned_md5"),
    )


def scrub_maximal_spans(
    docs: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """scrub_duplicate_spans refined toward Lee et al. 2021's MAXIMAL-
    substring semantics (r8 VERDICT #6): overlapping/adjacent duplicated
    k-grams are stitched into maximal runs, so a duplicated substring of
    any length L >= k surfaces as ONE span [start, start+L) instead of
    L-k+1 anonymous gram marks. Emits per doc the maximal-span census —
    n_spans, tokens removed (= the union coverage, so it equals
    scrub_duplicate_spans' n_removed by construction), the longest span —
    plus the same cleaned-text md5 witness.

    The stitch is ROW-LOCAL (the per-doc starts array is already sorted
    and bounded by the doc's own gram count): with fixed k, sorted starts
    merge iff the gap to the previous start is <= k, so span heads are the
    positions with gap > k, span tails the positions whose successor's gap
    is > k — two indexed filters + one zip_with, all inside codegen. No
    shuffle beyond the gram-key aggregate shared with the plain scrub; the
    corpus text still shuffles zero times."""
    toks = persist_tracked(
        docs.select(
            "doc_id",
            TXT.words(F.coalesce(F.col(text_col), F.lit(""))).alias("wl"),
        )
    )
    pos = persist_tracked(
        toks.select(
            "doc_id",
            F.posexplode(_positioned_grams(F.col("wl"), k)).alias(
                "pos", "gram"
            ),
        )
    )
    # ">= 2 DISTINCT docs" == min != max, min is the keeper (guide §2.3 —
    # same rewrite as scrub_duplicate_spans; r14)
    dup = (
        pos.groupBy("gram")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.max("doc_id").alias("_mx"),
        )
        .where(F.col("keeper") != F.col("_mx"))
        .select("gram", "keeper")
    )
    starts = (
        pos.join(dup, "gram")
        .where(F.col("doc_id") != F.col("keeper"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("pos")).alias("starts"))
    )
    joined = toks.join(starts, "doc_id", "left")
    st = F.coalesce(F.col("starts"), F.array().cast("array<int>"))
    spans = _maximal_spans(st, k)
    span_lens = F.transform(spans, lambda sp: sp["e"] - sp["s"])
    # gap-slice reconstruction: O(|wl| + n_spans) per row (r9 VERDICT #6 —
    # the exists-per-token form was O(|wl| * |starts|), quadratic on a
    # dup-heavy doc where every gram is duplicated and |starts| ~ |wl|)
    kept = F.when(F.col("starts").isNull(), F.col("wl")).otherwise(
        _kept_outside_spans(F.col("wl"), spans)
    )
    return joined.select(
        "doc_id",
        F.size("wl").alias("n_tokens"),
        F.size(spans).alias("n_spans"),
        F.coalesce(
            F.aggregate(span_lens, F.lit(0), lambda a, x: a + x), F.lit(0)
        ).alias("n_removed"),
        F.coalesce(F.array_max(span_lens), F.lit(0)).alias("max_span_len"),
        F.md5(F.concat_ws(" ", kept)).alias("cleaned_md5"),
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    line_words: int = 3,
    min_docs: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Line-level boilerplate removal (the RefinedWeb/CCNet "shared line"
    pass): a LINE occurring in >= `min_docs` DISTINCT documents is
    boilerplate (nav bars, cookie banners, footers) and is dropped from
    EVERY document — no keeper, unlike scrub_duplicate_spans, because a
    line shared by thousands of pages is template chrome, not content.

    The production splitter is '\\n'; this corpus carries no newlines, so
    the line unit is pluggable and defaults to fixed `line_words`-word
    chunks — the Spark plumbing (split, positioned explode, line-key agg,
    flag join, ordered reassembly) is identical either way.

    Scale shape (r14 — the d_span_scrub positions-only idiom; guide §2.3
    shuffle keys/metadata instead of payloads, §8): the text never rides
    ANY exchange. One persisted per-doc line-ARRAY projection feeds all
    three passes. (1) The boiler aggregate counts doc-deduped lines —
    array_distinct runs map-side, so "count_distinct(doc_id) >= min_docs"
    becomes a plain count with map-side partials: ONE line-keyed Exchange
    of (line, partial count) instead of the distinct aggregate's two.
    (2) Boiler hits are joined (broadcast — template chrome is a bounded
    set) to the positioned explode and reduced to per-doc POSITION sets:
    the only other Exchange carries (doc_id, int positions), never line
    text. (3) Counts and the cleaned-text md5 are computed map-side from
    the persisted line array + the broadcast per-doc position sets —
    replacing the per-doc collect_list reassembly that shuffled every
    kept line's text.

    Output per doc: line counts before/after and an md5 witness of the
    reassembled cleaned text, so a differential pins every kept line."""
    la = persist_tracked(
        docs.select(
            "doc_id",
            TXT.words(F.coalesce(F.col(text_col), F.lit(""))).alias("wl"),
        )
        .select(
            "doc_id",
            F.when(
                F.size("wl") > 0,
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size("wl") / F.lit(line_words)).cast("int")
                        - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice(
                            F.col("wl"),
                            i * line_words + 1,
                            line_words,
                        ),
                        " ",
                    ),
                ),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("la"),
        )
    )
    # doc-deduped map-side (array_distinct), so "in >= min_docs DISTINCT
    # docs" is a plain count with map-side partials — one Exchange, not
    # the distinct aggregate's two
    boiler = (
        la.select(F.explode(F.array_distinct("la")).alias("line"))
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("line")
    )
    # per-doc boiler POSITION sets: the only other Exchange carries
    # (doc_id, array<int>) — kept-line text never shuffles
    hits = (
        la.select("doc_id", F.posexplode("la").alias("pos", "line"))
        .join(F.broadcast(boiler), "line")
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("bpos"))
    )
    # map-side reassembly from the persisted line array: filter() keeps
    # construction (= position) order, so the md5 witness is identical to
    # the former collect_list + array_sort reassembly
    kept = F.filter(
        "la",
        lambda x, i: ~F.coalesce(F.array_contains("bpos", i), F.lit(False)),
    )
    n_lines = F.size("la").cast("long")
    n_kept = F.size(kept).cast("long")
    return (
        la.join(F.broadcast(hits), "doc_id", "left")
        .select(
            "doc_id",
            n_lines.alias("n_lines"),
            n_kept.alias("n_kept"),
            (n_lines - n_kept).alias("n_removed"),
            F.md5(F.concat_ws(" ", kept)).alias("cleaned_md5"),
        )
    )


def bigram_familiarity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """LM-style quality proxy without a model: the fraction of a doc's
    distinct bigrams occurring in >= 2 documents ("familiar" under a corpus
    bigram LM). The CCNet pipeline uses a KenLM perplexity for this slot;
    the familiarity ratio is the transcendental-free analogue. Band
    thresholds are fixed constants, not corpus quantiles — a corpus-wide
    ntile would serialize through one window partition."""
    # NOTE (r14, measured and REJECTED): persisting the per-doc bigram
    # ARRAY instead of the exploded rows (to make n_bigrams a map-side
    # size() and drop the per-doc count aggregate) looked like a free
    # Exchange removal — but InMemoryRelation's columnar cache builder is
    # ~4.5× slower materializing an array<string> column than the same
    # data exploded to flat string rows (5.99 s vs 1.32 s at sf0.1), and
    # the whole query regressed 0.94 → 3.8 s. The exploded persist stays.
    bg = persist_tracked(
        docs.select("doc_id", F.explode(TXT.shingles(text_col, n=2)).alias("bg"))
    )
    # ">= 2 DISTINCT docs" == min(doc_id) != max(doc_id) — skips the
    # two-phase distinct aggregate's extra bigram-keyed Exchange and its
    # two extra aggregate passes (guide §2.3; r14)
    familiar = (
        bg.groupBy("bg")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .where(F.col("_mn") != F.col("_mx"))
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


def language_quality_bands(
    docs: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-LANGUAGE quality quartile banding (r7 VERDICT #5 — the
    CCNet-style selection step): score each doc by bigram-LM familiarity
    permille (integer (1000·n_familiar) div n_bigrams — exact cross-engine
    arithmetic, unlike a float ratio), build a per-language score
    HISTOGRAM (the mergeable sketch: (lang × score) counts, ≤1001 cells
    per language), read the p25/p50/p75 thresholds off the cumulative
    histogram (ceil(n·q) rank, the t_group_quantiles probe), and band
    every doc 1..4 against its language's thresholds. Docs with no
    bigrams are excluded (no quality evidence).

    Scale shape — NO corpus-wide sort anywhere: familiarity is gram-key
    shuffles (bigram_familiarity); the histogram is ONE map-side-combining
    count aggregate to the bounded (lang × permille) grain; the cumulative
    window + threshold probe run over that bounded relation; the final
    banding is a BROADCAST join of ≤|langs| threshold rows against the
    scored docs. A corpus-wide ntile would serialize through one window
    partition — this never touches more than the sketch."""
    from pyspark.sql.window import Window

    fam = bigram_familiarity(docs, text_col=text_col)
    # explicit-count repartition before the cache: this is a JOIN output
    # whose bytes are tiny, so AQE would coalesce the cached relation to ~1
    # partition and serialize both downstream consumers (the corpus-wide
    # histogram agg and the final banding join) onto one task — the
    # semantic_dedup r9 trap (explicit-count repartitions are exempt).
    scored = persist_tracked(
        fam.where(F.col("n_bigrams") > 0)
        .join(docs.select("doc_id", lang_col), "doc_id")
        .select(
            "doc_id",
            F.col(lang_col).alias("lang"),
            F.expr("(1000 * n_familiar) div n_bigrams").alias("score"),
        )
        .repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
    )
    hist = scored.groupBy("lang", "score").agg(F.count(F.lit(1)).alias("n"))
    cum = hist.withColumn(
        "cum",
        F.sum("n").over(
            Window.partitionBy("lang")
            .orderBy("score")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    totals = hist.groupBy("lang").agg(F.sum("n").alias("n_total"))
    quants = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)]
    targets = totals.select(
        "lang",
        *[
            F.expr(f"(n_total * {num} + {den} - 1) div {den}").alias(q)
            for q, num, den in quants
        ],
    ).unpivot("lang", [q for q, _, _ in quants], "q", "target")
    probe = cum.join(
        targets,
        (cum["lang"] == targets["lang"])
        & (F.col("cum") >= F.col("target"))
        & (F.col("cum") - F.col("n") < F.col("target")),
    ).drop(targets["lang"])
    thresh = F.broadcast(
        probe.groupBy("lang").agg(
            *[
                F.max(F.when(F.col("q") == q, F.col("score"))).alias(f"t{q[1:]}")
                for q, _, _ in quants
            ]
        )
    )
    band = (
        F.lit(1)
        + (F.col("score") > F.col("t25")).cast("int")
        + (F.col("score") > F.col("t50")).cast("int")
        + (F.col("score") > F.col("t75")).cast("int")
    )
    return scored.join(thresh, "lang").select(
        "doc_id", "lang", "score", band.alias("band")
    )


def wordpiece_vocab(
    docs: DataFrame, n_vocab: int = 64, max_len: int = 4, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(word_counts, vocab) — vocab = top-n_vocab character 2..max_len grams
    by corpus occurrence (gram occurrences within a word x word frequency),
    tie-broken by gram text. Computed on the DISTINCT word domain, so gram
    extraction cost scales with |corpus vocabulary|, not corpus size."""
    words_rel = docs.select(
        "doc_id", F.explode(TXT.words(text_col)).alias("word")
    )
    return _wordpiece_vocab_from_words(words_rel, n_vocab, max_len)


def _wordpiece_vocab_from_words(
    words_rel: DataFrame, n_vocab: int = 64, max_len: int = 4
) -> tuple[DataFrame, DataFrame]:
    """wordpiece_vocab over an explicit (doc_id, word) occurrence relation
    so a caller that already tokenized can share the pass (r14: the
    wordpiece_stats regex split used to run twice — once here, once for
    the per-doc re-attach scan). word_counts is persisted: the vocab
    top-k collect and the segmentation scan are separate consumers."""
    word_counts = persist_tracked(
        words_rel.groupBy("word").agg(F.count("*").alias("wc"))
    )
    grams = None
    for n in range(2, max_len + 1):
        # sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty
        # (DuckDB's generate_series(1, 0) is) — words shorter than n must be
        # gated out explicitly or they contribute junk grams to the count
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
        .limit(n_vocab)
    )
    return word_counts, vocab


def segment_words(
    word_counts: DataFrame, vocab_set: frozenset[str], max_len: int = 4
) -> DataFrame:
    """Greedy longest-match segmentation of the distinct word domain:
    at each position take the longest vocab match (<= max_len), single
    character as the unconditional fallback. Arrow-batched; the vocab is a
    closure constant on the executors."""

    def seg(batches):
        for pdf in batches:
            counts = []
            for word in pdf["word"]:
                pos, n = 0, 0
                ln = len(word)
                while pos < ln:
                    step = 1
                    for m in range(max_len, 1, -1):
                        if pos + m <= ln and word[pos : pos + m] in vocab_set:
                            step = m
                            break
                    pos += step
                    n += 1
                counts.append(n)
            pdf = pdf[["word"]].copy()
            pdf["n_sub"] = counts
            yield pdf

    return word_counts.select("word").mapInPandas(seg, "word string, n_sub long")


def wordpiece_stats(
    docs: DataFrame,
    n_vocab: int = 64,
    max_len: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Per-doc word/subword counts and mean subwords-per-word (fertility —
    the statistic every tokenizer-design loop monitors) under greedy
    longest-match subword tokenization with a corpus-derived vocabulary.
    The only driver materialization is the n_vocab-row vocab collect.

    r14: the word ARRAYS are persisted and both passes (the vocab
    word-count aggregate and the per-doc re-attach scan) explode from
    them, so the regex tokenization — the dominant per-row cost — runs
    once per run instead of twice."""
    toks = persist_tracked(
        docs.select("doc_id", TXT.words(text_col).alias("_wl"))
    )
    words_rel = toks.select("doc_id", F.explode("_wl").alias("word"))
    word_counts, vocab = _wordpiece_vocab_from_words(
        words_rel, n_vocab, max_len
    )
    vset = frozenset(r["gram"] for r in vocab.collect())
    tokenized = segment_words(word_counts, vset, max_len)
    per_doc = (
        words_rel.join(tokenized, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
    )
    return (
        docs.select("doc_id")
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


def bpe_learn_stats(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn a BPE merge table (Sennrich et al. 2016) over the corpus and
    emit per-doc subword statistics under the learned segmentation.

    BPE's sufficient statistic is the word-frequency relation: each round
    counts adjacent token pairs weighted by word frequency, picks the most
    frequent pair (ties: lexicographic), and greedily merges it left-to-
    right within every word. The iterative shape on Spark is the kmeans
    pattern: the DRIVER loops n_merges times; each round is one pair-key
    aggregate (tiny — pair space, not corpus) plus a narrow Arrow-batched
    re-segmentation over the DISTINCT word domain. Only the single best
    pair ever reaches the driver per round. State is persisted per round so
    round r's aggregate does not recompute rounds 1..r-1's lineage.

    At 100 TB: the word-domain relation is the only corpus-derived state
    (billions of rows, key-partitioned); pair aggregates are map-side
    combined; re-segmentation cost is |vocabulary| x word length per round.
    """
    words_rel = docs.select(
        "doc_id", F.explode(TXT.words(text_col)).alias("word")
    )
    word_counts = words_rel.groupBy("word").agg(F.count("*").alias("wc"))
    state = persist_tracked(
        word_counts.select(
            "word",
            "wc",
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.substring(F.col("word"), i, F.lit(1)),
            ).alias("toks"),
        )
    )

    def merge_fn(a: str, b: str):
        def seg(batches):
            for pdf in batches:
                out = []
                for toks in pdf["toks"]:
                    toks = list(toks)
                    res = []
                    i = 0
                    n = len(toks)
                    while i < n:
                        if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                            res.append(a + b)
                            i += 2
                        else:
                            res.append(toks[i])
                            i += 1
                    out.append(res)
                pdf = pdf.copy()
                pdf["toks"] = out
                yield pdf

        return seg

    schema = "word string, wc long, toks array<string>"
    sz = F.size("toks")
    prev = None
    for _ in range(n_merges):
        pairs = (
            state.select(
                F.explode(
                    F.arrays_zip(
                        F.slice("toks", 1, F.greatest(sz - 1, F.lit(0))),
                        F.slice(
                            F.col("toks"), 2, F.greatest(sz - 1, F.lit(0))
                        ),
                    )
                ).alias("p"),
                "wc",
            )
            .select(
                F.col("p").getItem("0").alias("a"),
                F.col("p").getItem("1").alias("b"),
                "wc",
            )
            .groupBy("a", "b")
            .agg(F.sum("wc").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        # the collect materialized the CURRENT state's cache, so the state
        # from two rounds ago is no longer reachable — drop it now rather
        # than accumulating n_merges cached copies of the word domain
        if prev is not None:
            prev.unpersist(False)
        if not best:
            break
        prev = state
        state = persist_tracked(
            state.mapInPandas(merge_fn(best[0]["a"], best[0]["b"]), schema)
        )

    nsub = state.select("word", F.size("toks").alias("n_sub"))
    per_doc = (
        words_rel.join(nsub, "word")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_words"), F.sum("n_sub").alias("n_subwords"))
    )
    return (
        docs.select("doc_id")
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


BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "a"),
    ("ta", "b"),
    ("tab", "l"),
    ("tabl", "e"),
    ("v", "a"),
    ("va", "l"),
    ("val", "u"),
    ("valu", "e"),
    ("s", "c"),
    ("sc", "a"),
    ("a", "g"),
    ("ag", "g"),
)
"""Default fixed merge table for bpe_encode_stats — a shipped-artifact
tokenizer, the way production encode works (merges are model artifacts,
not re-learned at encode time)."""


def bpe_encode_stats(
    docs: DataFrame,
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
    text_col: str = "text",
) -> DataFrame:
    """Apply a FIXED BPE merge table (the encode side of Sennrich et al.
    2016; bpe_learn_stats is the learn side) and emit per-doc token stats
    plus an md5 witness of the full segmentation.

    Each merge rule (a, b) is applied as one greedy left-to-right pass over
    the token sequence (merge, then skip past the merged token). A single
    pass per rule is already its fixpoint: a merged token "ab" can never
    equal a (b is non-empty), so no new (a, b) adjacency is created —
    which is what lets the DuckDB oracle unroll the rules as a fixed CTE
    chain (run-parity merge per round, the t_bpe_learn machinery with the
    learned best-pair subquery replaced by the rule's constants).

    Scale shape: merges apply over the DISTINCT word domain only (one
    Arrow-batched mapInPandas — per-string work scales with |vocabulary|,
    not corpus size), re-attached by equi-join; the per-doc agg is the only
    corpus shuffle beyond the word explode. Unlike bpe_learn_stats there is
    no driver loop at all — the merge table is a closure constant."""
    words_rel = docs.select(
        "doc_id", F.posexplode(TXT.words(text_col)).alias("pos", "word")
    )
    vocab = words_rel.select("word").distinct()
    rules = tuple(merges)

    def enc(batches):
        for pdf in batches:
            segs, subs = [], []
            for word in pdf["word"]:
                toks = list(word)
                for a, b in rules:
                    res, i, n = [], 0, len(toks)
                    while i < n:
                        if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                            res.append(a + b)
                            i += 2
                        else:
                            res.append(toks[i])
                            i += 1
                    toks = res
                segs.append("+".join(toks))
                subs.append(len(toks))
            out = pdf[["word"]].copy()
            out["seg"] = segs
            out["n_sub"] = subs
            yield out

    segmented = vocab.mapInPandas(enc, "word string, seg string, n_sub int")
    per_doc = (
        words_rel.join(segmented, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                        lambda s: s["seg"],
                    ),
                    " ",
                )
            ).alias("enc_md5"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_subwords", F.lit(0)).cast("long").alias("n_subwords"),
            F.when(
                F.coalesce("n_words", F.lit(0)) > 0,
                F.col("n_subwords") / F.col("n_words").cast("double"),
            ).alias("fertility"),
            "enc_md5",
        )
    )
