"""Crafted-input and randomized invariants for the cleaning operators
(operators/cleaning.py) — semantics the sf0.01 oracle differential can't
exercise: degenerate inputs, idempotence, symmetry, greedy-match parity."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from udlang_spark.operators import cleaning as OPS


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _random_texts(n=200, seed=5):
    rng = random.Random(seed)
    vocab = ["a", "ab", "the", "zzz", "x9", "!", "naïve", "", "  "]
    out = []
    for _ in range(n):
        k = rng.randrange(0, 40)
        out.append(" ".join(rng.choice(vocab) for _ in range(k)))
    return out


def test_collapse_idempotent_and_run_free(spark):
    """Collapsing is idempotent: re-collapsing the cleaned text removes
    nothing, and the cleaned token stream has no adjacent repeats."""
    texts = _random_texts()
    docs = _docs(spark, texts)
    first = OPS.collapse_repeat_tokens(docs).collect()
    by_id = {r["doc_id"]: r for r in first}
    # reconstruct cleaned text per doc by re-deriving kept tokens in Python
    for doc_id, text in enumerate(texts):
        toks = text.lower().split()
        kept = [t for i, t in enumerate(toks) if i == 0 or toks[i - 1] != t]
        r = by_id[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["n_kept"] == len(kept)
        assert all(a != b for a, b in zip(kept, kept[1:]))
    # idempotence: collapse the cleaned texts; n_removed must be 0 everywhere
    cleaned_texts = []
    for doc_id, text in enumerate(texts):
        toks = text.lower().split()
        cleaned_texts.append(
            " ".join(
                t for i, t in enumerate(toks) if i == 0 or toks[i - 1] != t
            )
        )
    second = OPS.collapse_repeat_tokens(_docs(spark, cleaned_texts))
    assert second.where(F.col("n_removed") != 0).count() == 0


def test_gopher_rules_on_degenerate_docs(spark):
    docs = _docs(spark, ["", "   ", "the " * 25, "zzz " * 25, "ab " * 30])
    rows = {r["doc_id"]: r for r in OPS.gopher_rules(docs).collect()}
    assert rows[0]["failed_rule"] == "word_count"  # empty: 0 words
    assert rows[1]["failed_rule"] == "word_count"  # whitespace-only
    assert rows[2]["keep"]  # 25x "the": all rules pass
    assert rows[3]["failed_rule"] == "stopwords"  # no stopword hits
    assert rows[4]["failed_rule"] == "stopwords"  # alpha ok, no stopwords


def test_duplicate_spans_crafted_symmetry(spark):
    """Two docs sharing an 8-token span both get flagged; an unrelated doc
    gets zero duplicated grams."""
    span = "one two three four five six seven eight"
    docs = _docs(
        spark,
        [
            f"intro {span} outro alpha",
            f"different head {span} tail words here",
            "totally unrelated content with enough words to form grams "
            "nine ten eleven twelve",
        ],
    )
    rows = {r["doc_id"]: r for r in OPS.duplicate_span_stats(docs, k=8).collect()}
    assert rows[0]["n_dup_grams"] >= 1
    assert rows[1]["n_dup_grams"] >= 1
    assert rows[2]["n_dup_grams"] == 0
    assert rows[2]["n_grams"] > 0


def test_bigram_familiarity_extremes(spark):
    """A doc duplicated verbatim is fully familiar; a doc with unique words
    is fully unfamiliar; a sub-bigram doc lands in the 'empty' band."""
    docs = _docs(
        spark,
        [
            "alpha beta gamma delta",
            "alpha beta gamma delta",
            "unique1 unique2 unique3",
            "solo",
        ],
    )
    rows = {r["doc_id"]: r for r in OPS.bigram_familiarity(docs).collect()}
    assert rows[0]["familiar_ratio"] == 1.0 and rows[0]["band"] == "top"
    assert rows[1]["familiar_ratio"] == 1.0
    assert rows[2]["familiar_ratio"] == 0.0 and rows[2]["band"] == "low"
    assert rows[3]["band"] == "empty" and rows[3]["n_bigrams"] == 0


def test_wordpiece_greedy_matches_python_reference(spark):
    """The distributed segmentation agrees with an independent greedy
    reference on random words over the derived vocab."""
    texts = _random_texts(n=100, seed=11)
    docs = _docs(spark, texts)
    word_counts, vocab = OPS.wordpiece_vocab(docs, n_vocab=16, max_len=4)
    vset = frozenset(r["gram"] for r in vocab.collect())
    seg = {
        r["word"]: r["n_sub"]
        for r in OPS.segment_words(word_counts, vset, max_len=4).collect()
    }

    def ref(word):
        pos, n = 0, 0
        while pos < len(word):
            for m in (4, 3, 2, 1):
                if m == 1 or (
                    pos + m <= len(word) and word[pos : pos + m] in vset
                ):
                    pos += m
                    n += 1
                    break
        return n

    assert seg  # non-empty domain
    for word, n_sub in seg.items():
        assert n_sub == ref(word), word


def test_gram_stats_partition_invariant(spark):
    """Duplicated-span and familiarity stats must not depend on input
    partitioning — the property that makes results stable under cluster
    re-sharding, AQE coalescing, and retries."""
    from tests.conftest import SF_DIR_CORRECTNESS
    from udlang_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF_DIR_CORRECTNESS)
    for op in (OPS.duplicate_span_stats, OPS.bigram_familiarity):
        a = sorted(tuple(r) for r in op(docs).collect())
        b = sorted(tuple(r) for r in op(docs.repartition(7, "doc_id")).collect())
        assert a == b, op.__name__


def test_bpe_learn_matches_python_reference(spark):
    """The distributed BPE loop (pair counts -> best pair -> greedy merge)
    agrees with a pure-Python Sennrich-style reference on a crafted corpus:
    same merge sequence, same final per-doc subword counts."""
    from collections import Counter

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "low new lowest newest",
    ]
    docs = _docs(spark, texts)

    # pure-Python reference over the word-frequency relation
    wc = Counter(w for t in texts for w in t.lower().split())
    state = {w: [c for c in w] for w in wc}

    def one_round():
        pairs = Counter()
        for w, toks in state.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += wc[w]
        if not pairs:
            return None
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        a, b = best
        for w, toks in state.items():
            res, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(toks[i])
                    i += 1
            state[w] = res
        return best

    for _ in range(8):
        one_round()

    expect = {}
    for doc_id, t in enumerate(texts):
        ws = t.lower().split()
        expect[doc_id] = (len(ws), sum(len(state[w]) for w in ws))

    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in OPS.bpe_learn_stats(docs, n_merges=8).collect()
    }
    assert got == expect


def test_bpe_encode_matches_fixpoint_reference(spark):
    """Encode applies each merge rule as ONE greedy left-to-right pass; the
    docstring claims that pass is already the rule's fixpoint. Verify
    against a reference that re-applies each rule until no change, on
    adversarial inputs (runs of identical pairs, overlapping rule
    prefixes)."""
    texts = [
        "table value scan agg",
        "tata tatab ttab aagg aag gg",
        "aaaa tttt scsc valval",
        "tabtab tabletable valuevalue",
        "t a b l e",
        "",
    ]
    docs = _docs(spark, texts)
    rules = OPS.BPE_MERGES

    def encode_fix(word):
        toks = list(word)
        for a, b in rules:
            while True:
                res, i, merged = [], 0, False
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                        res.append(a + b)
                        i += 2
                        merged = True
                    else:
                        res.append(toks[i])
                        i += 1
                toks = res
                if not merged:
                    break
        return toks

    import hashlib

    expect = {}
    for doc_id, t in enumerate(texts):
        ws = t.lower().split()
        segs = [encode_fix(w) for w in ws]
        n_sub = sum(len(s) for s in segs)
        md5 = (
            hashlib.md5(
                " ".join("+".join(s) for s in segs).encode()
            ).hexdigest()
            if ws
            else None
        )
        expect[doc_id] = (len(ws), n_sub, md5)

    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"], r["enc_md5"])
        for r in OPS.bpe_encode_stats(docs).collect()
    }
    assert got == expect


def test_span_scrub_keeper_and_coverage(spark):
    """Crafted corpus: docs 0 and 2 share an 8-token span, doc 1 is
    unique. The scrub must (a) keep the span in the MIN doc (keeper),
    (b) remove exactly the span's tokens from the other doc, (c) leave
    unique docs untouched, and (d) report consistent counts."""
    span = "one two three four five six seven eight"
    texts = [
        f"prefix {span} suffix",          # doc 0: keeper — untouched
        "totally unrelated words here",   # doc 1: unique — untouched
        f"intro {span} outro tail",       # doc 2: span scrubbed
    ]
    docs = _docs(spark, texts)
    rows = {r["doc_id"]: r for r in OPS.scrub_duplicate_spans(docs, k=8).collect()}
    assert rows[0]["n_removed"] == 0 and rows[0]["n_kept"] == 10
    assert rows[1]["n_removed"] == 0
    assert rows[2]["n_removed"] == 8
    assert rows[2]["n_kept"] == 3  # intro outro tail
    import hashlib

    assert rows[2]["cleaned_md5"] == hashlib.md5(b"intro outro tail").hexdigest()
    for r in rows.values():
        assert r["n_removed"] == r["n_tokens"] - r["n_kept"] >= 0


def test_span_scrub_overlapping_spans_union_coverage(spark):
    """Two duplicated 8-gram windows overlapping in one doc scrub as their
    POSITION UNION (no double-removal, no gaps), and a doc duplicated
    END-TO-END scrubs to empty with md5('')."""
    span9 = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # 9 tokens → two overlapping 8-grams
    texts = [span9, f"pad {span9}", "w1 w2 w3"]
    docs = _docs(spark, texts)
    rows = {r["doc_id"]: r for r in OPS.scrub_duplicate_spans(docs, k=8).collect()}
    # doc 0 is keeper of both grams (min doc_id); doc 1 loses all 9 span
    # tokens (union of the two overlapping windows), keeping only "pad"
    assert rows[0]["n_removed"] == 0
    assert rows[1]["n_removed"] == 9 and rows[1]["n_kept"] == 1
    # short doc (<k tokens) is never touched even though its words appear
    assert rows[2]["n_removed"] == 0
    import hashlib

    # fully-scrubbed witness path: make doc 1 an exact dup of doc 0
    docs2 = _docs(spark, [span9, span9])
    r2 = {r["doc_id"]: r for r in OPS.scrub_duplicate_spans(docs2, k=8).collect()}
    assert r2[0]["n_removed"] == 0
    assert r2[1]["n_kept"] == 0
    assert r2[1]["cleaned_md5"] == hashlib.md5(b"").hexdigest()


def test_span_scrub_dup_heavy_worst_case(spark):
    """r9 VERDICT #6: the constructed worst case for the per-doc starts
    array — EVERY gram duplicated (a long doc recrawled verbatim), so
    |starts| ~ |wl|. The old exists-per-token kept-filter was O(|wl| *
    |starts|) = quadratic here (~4M lambda evals/doc at 2k tokens); the
    gap-slice reconstruction is O(|wl| + n_spans). Semantics pinned: the
    keeper copy is untouched, every other copy scrubs to empty in ONE
    maximal span of the full doc length, and an alternating half-dup doc
    keeps exactly its unique tokens."""
    import hashlib

    L = 2000
    long_doc = " ".join(f"tok{i}" for i in range(L))
    # doc 0 = keeper; docs 1,2 verbatim recrawls; doc 3 = second half dup
    half = " ".join(f"tok{i}" for i in range(L // 2, L))
    docs = _docs(spark, [long_doc, long_doc, long_doc, f"uniq3a uniq3b {half}"])
    plain = {r["doc_id"]: r for r in OPS.scrub_duplicate_spans(docs, k=8).collect()}
    assert plain[0]["n_removed"] == 0
    for d in (1, 2):
        assert plain[d]["n_kept"] == 0 and plain[d]["n_removed"] == L
        assert plain[d]["cleaned_md5"] == hashlib.md5(b"").hexdigest()
    assert plain[3]["n_kept"] == 2  # only the two unique tokens survive
    mx = {r["doc_id"]: r for r in OPS.scrub_maximal_spans(docs, k=8).collect()}
    assert mx[0]["n_spans"] == 0
    for d in (1, 2):
        # the whole doc is ONE stitched maximal span, not L-k+1 gram marks
        assert mx[d]["n_spans"] == 1 and mx[d]["max_span_len"] == L
        assert mx[d]["n_removed"] == plain[d]["n_removed"]
        assert mx[d]["cleaned_md5"] == plain[d]["cleaned_md5"]
    assert mx[3]["n_spans"] == 1 and mx[3]["max_span_len"] == L - L // 2
    assert mx[3]["cleaned_md5"] == plain[3]["cleaned_md5"]


def test_lang_quality_bands_quartiles(spark):
    """Per-language banding invariants on a crafted corpus: bands span
    1..4 within each language, band is monotone in score, and each
    language's thresholds derive from ITS OWN distribution (the same
    score can band differently across languages)."""
    import random

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    for i in range(120):
        lang = "en" if i % 2 == 0 else "de"
        # en docs draw from a shared small vocab (familiar), de docs get
        # progressively more unique junk tokens (unfamiliar tail)
        toks = [rng.choice(vocab) for _ in range(10)]
        n_junk = (i // 2) % 6 if lang == "de" else 0
        toks += [f"junk{lang}{i}_{j}" for j in range(n_junk)]
        rows.append((i, " ".join(toks), lang))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = OPS.language_quality_bands(docs).collect()
    assert out
    by_lang = {}
    for r in out:
        assert 1 <= r["band"] <= 4
        by_lang.setdefault(r["lang"], []).append((r["score"], r["band"]))
    for lang, pairs in by_lang.items():
        pairs.sort()
        bands = [b for _, b in pairs]
        assert bands == sorted(bands), f"band not monotone in score for {lang}"
    # en is DEGENERATE by construction (every doc fully familiar, score
    # 1000): all quartile thresholds coincide, so every doc bands 1 —
    # nobody exceeds its own distribution's p75
    assert {b for _, b in by_lang["en"]} == {1}
    assert all(s == 1000 for s, _ in by_lang["en"])
    # de has a real score spread: its OWN thresholds split it into all 4
    # quartile bands even though many de scores would band 1 under en's
    assert {b for _, b in by_lang["de"]} == {1, 2, 3, 4}


def test_scrub_maximal_spans_stitches_runs(spark):
    """r9 (VERDICT r8 #6): a duplicated substring LONGER than k must
    surface as ONE maximal span (its overlapping k-grams stitched), two
    separated duplicated substrings as TWO spans, and ADJACENT runs
    (gap exactly k) as one. n_removed must equal the plain scrub's union
    coverage, and the md5 witness must match scrub_duplicate_spans'."""
    import hashlib

    # w1..w12: a 12-token duplicated run (5 overlapping 8-grams)
    run12 = " ".join(f"w{i}" for i in range(1, 13))
    # q1..q8: a second, separate 8-token duplicated run
    run8 = " ".join(f"q{i}" for i in range(1, 9))
    texts = [
        f"{run12} filler alpha {run8}",                    # doc 0: keeper
        "unique text " + " ".join(f"u{i}" for i in range(30)),
        f"head {run12} mid1 mid2 mid3 {run8} tail",        # doc 2: two spans
        f"lead {run12} {run12} close",                     # doc 3: see below
    ]
    docs = _docs(spark, texts)
    got = {r["doc_id"]: r for r in OPS.scrub_maximal_spans(docs, k=8).collect()}
    plain = {
        r["doc_id"]: r for r in OPS.scrub_duplicate_spans(docs, k=8).collect()
    }
    # doc 2: the 12-token run is ONE span of 12, run8 is a second span
    assert got[2]["n_spans"] == 2
    assert got[2]["max_span_len"] == 12
    assert got[2]["n_removed"] == 20
    # doc 3: run12 twice back-to-back — w12 w1 bridging grams are unique to
    # doc 3 BUT the two marked runs touch (gap <= k) → stitched into one
    assert got[3]["n_spans"] == 1
    # untouched docs report zero spans
    assert got[0]["n_spans"] == 0 and got[1]["n_spans"] == 0
    for d in got:
        assert got[d]["n_removed"] == plain[d]["n_removed"], d
        assert got[d]["cleaned_md5"] == plain[d]["cleaned_md5"], d
    assert got[2]["cleaned_md5"] == hashlib.md5(
        b"head mid1 mid2 mid3 tail"
    ).hexdigest()
