"""Query registry: every implemented operator from SURVEY.md §2 appears here
as a named query (Callable[(SparkSession, sf_dir)] -> DataFrame) plus, where
SQL-expressible, a DuckDB oracle SQL string producing identical columns.

Cross-engine determinism rules used throughout:
- money aggregates go through DECIMAL so sums are exact in both engines, then
  cast to double (correctly-rounded, deterministic) — no float-sum-order
  nondeterminism can leak into the hash;
- every top-k has a total-order tie-break;
- timestamps in outputs are formatted to strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from udlang_spark.queries import cleaning, kernels, llm, relational, streaming

QueryFn = Callable[[SparkSession, str], DataFrame]

_ALL_QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

for mod in (kernels, llm, streaming, relational, cleaning):
    _ALL_QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)

# Registration order matters: the external driver differentially verifies the
# FIRST 50 registry entries against their DuckDB oracles each round.
# History: r3 relational q01–q50 (50/50). r4 kernel + oracled-LLM (47
# green + 3 harness errs, re-confirmed r5). r5 the 38 never-checked +
# mid-round additions (50/50). r6 4 never-checked + 13 r6 operators + 33
# oldest re-confirmations — 49/50, 1 red (k_tower, fixed r7: BIGINT cast
# both engines; strict checker now hashes driver-faithful pandas dtypes).
# r7 (50/50 green): k_tower + 5 never-checked + q34–q50 (r3-stale) + the
# 17 round-7 operators at land time + 10 oldest r4 kernel greens.
# Round-12 window (cumulative state after r11: 201 of the 204 registered
# queries have a driver row and ALL are green at their latest check —
# staleness histogram r7:6, r8:48, r9:48, r10:49, r11:50; the 3 without a
# row are the r11 late additions, strict-green at land time and
# J-checked green by the r11 judge). Composition per r11 VERDICT #1:
#   (a) the three queries with NO driver row: t_maxsim_topk (r12: now the
#       scored-dictionary derivation + e_ann_recall's denominator fix —
#       both re-strict-checked), e_ann_recall, s_maxsim_stream;
#   (b) the three NEW round-12 queries, registered at land time:
#       t_maxsim_vocab (learned-vocab broadcast dictionary join, r11
#       VERDICT #4), e_ivfpq_recall (recall@5 gate for the compressed
#       IVF-PQ probe, ADC + rerank arms, r11 VERDICT #5), and
#       e_ivfpq_append_recall (the same recall card against the
#       append-grown index; shares ORACLE_E_IVFPQ_RECALL verbatim via the
#       append==rebuild bit-identity — registered IN-window at land time
#       so the no-driver-row pattern of the last two rounds stops
#       recurring; its slot comes from deferring t_langid, whose langid
#       path is exercised in-window by t_lang_quality_bands);
#   (c) the six r7-stale kernels deferred from the r11 window (k_hello,
#       k_simple, k_point, k_scopes, k_count, k_lists) — clears the last
#       r7 staleness;
#   (d) 38 of the 48 r8-stale greens, led by the seven shingle consumers
#       re-shaped by r11's let1 (d_minhash_lsh, d_dedup_corpus,
#       d_simhash_neardup, d_exact_dedup, d_incremental_dedup, t_decontam,
#       d_line_dedup — strict-green on the new code in r11). The 10
#       deferred to r13, each with sibling coverage: q51_transitions,
#       t_heavy_hitters (both J-checked green by the r11 judge on current
#       code), m_image_meta, m_payload_meta, m_ahash_neardup (multimodal
#       header/fingerprint family unchanged since r8; siblings
#       m_ahash_dedup r11, m_real_decode r9), d_url_dedup (its streaming
#       twin s_url_dedup_stream stays in-window), t_span_corrupt (span
#       machinery re-rowed r11 via d_span_scrub/_maximal), k_pipeline
#       (kernel compile paths re-rowed r11 + 6 kernel rows in THIS
#       window), t_lift_bigrams (r11 protocol bench row; sibling
#       t_bigram_lm covers the bigram path), t_langid (see (b)).
# 3 + 3 + 6 + 38 = 50.
_PRIORITY: list[str] = [
    # -- (a) no driver row yet (r11 late additions) --
    "t_maxsim_topk",
    "e_ann_recall",
    "s_maxsim_stream",
    # -- (b) new round-12 queries at land time --
    "t_maxsim_vocab",
    "e_ivfpq_recall",
    "e_ivfpq_append_recall",
    # -- (c) the last r7-stale kernels --
    "k_hello",
    "k_simple",
    "k_point",
    "k_scopes",
    "k_count",
    "k_lists",
    # -- (d) r8-stale, shingle consumers first --
    "d_minhash_lsh",
    "d_dedup_corpus",
    "d_simhash_neardup",
    "d_exact_dedup",
    "d_incremental_dedup",
    "t_decontam",
    "d_line_dedup",
    "d_fingerprint",
    "d_ngram_jaccard",
    "d_simhash",
    "e_centroid_assign",
    "e_cosine_topk",
    "e_near_dups",
    "e_negative_pairs",
    "e_pagerank",
    "k_builtins",
    "k_cast",
    "k_match_lit",
    "k_match_union",
    "k_methods",
    "k_modules",
    "k_spread",
    "q52_retention",
    "s_cdc_apply",
    "s_interval_stream",
    "s_url_dedup_stream",
    "t_chunks",
    "t_corpus_pipeline",
    "t_dsir_select",
    "t_lang_quality_bands",
    "t_length_outliers",
    "t_ngram_topk",
    "t_pack_greedy",
    "t_quality",
    "t_rarity",
    "t_repetition",
    "t_tfidf_topk",
    "t_token_stats",
]
assert len(_PRIORITY) == 50, len(_PRIORITY)
assert len(set(_PRIORITY)) == 50
assert all(n in _ALL_QUERIES and n in ORACLE for n in _PRIORITY), [
    n for n in _PRIORITY if n not in _ALL_QUERIES or n not in ORACLE
]

QUERIES: dict[str, QueryFn] = {name: _ALL_QUERIES[name] for name in _PRIORITY}
QUERIES.update(
    (name, fn) for name, fn in _ALL_QUERIES.items() if name not in QUERIES
)

__all__ = ["QUERIES", "ORACLE", "QueryFn"]
