"""Bloom-filter semi-join pruning (SURVEY.md §2.5 scale notes).

The classic shuffle reducer: build an m-bit Bloom filter over the (small)
dimension's join keys, probe the fact side BEFORE its shuffle, and let only
rows that might match travel. Zero false negatives by construction; false
positives cost nothing but wasted shuffle rows (they fall out of the real
join). At 100 TB this is the difference between shuffling the whole fact
table and shuffling the ~matching slice — Spark's own runtime bloom
(spark.sql.optimizer.runtime.bloomFilter.enabled) does the same thing with
engine-private hashing; this explicit form is deterministic (md5-derived
positions), so its pruning decisions are reproducible cross-engine and
oracle-checkable.

Representation: m bits as m/32 32-bit words in i64 slots (bit j of word w =
key hashed to position 32w+j). 32-bit words keep every shift below both
engines' bit-63 overflow checks (same convention as similarity's sign
signatures). The word table is collected to the driver — bounded by
m/32 integers, never by data — and probed as a literal array in pure
Column codegen: the probe adds NO join and NO shuffle to the fact side.
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 32


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """k deterministic bit positions per key, ALL funded by ONE md5: hash
    row i reads hex chars [8i+1, 8i+8] of md5("bloom:" + key) — the
    count-min sketch's slicing convention (one digest, four independent
    32-bit rows), reproducible in any engine. One hash per probed row,
    not k."""
    if k_hashes > 4:
        raise ValueError("one md5 digest funds at most 4 32-bit hash rows")
    h = F.md5(F.concat(F.lit("bloom:"), key.cast("string")))
    return [
        F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % m_bits
        for i in range(k_hashes)
    ]


def bloom_build(
    dim: DataFrame, key_col: str, m_bits: int = 4096, k_hashes: int = 3
) -> list[int]:
    """The filter's dense word list (length m_bits/32): one distributed
    bit_or aggregation over the dimension's key positions, then a
    driver-side densify — the only materialization, bounded by m_bits/32
    integers regardless of dimension size."""
    if m_bits % _WORD_BITS != 0:
        raise ValueError("m_bits must be a multiple of 32")
    pos = F.explode(
        F.array(*_positions(F.col(key_col), m_bits, k_hashes))
    ).alias("pos")
    words = (
        dim.select(pos)
        .select(
            (F.col("pos") / _WORD_BITS).cast("int").alias("word"),
            # call_function: the F.shiftleft wrapper only takes an int
            # shift; the SQL function itself accepts a Column
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % _WORD_BITS).cast("int"),
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    sparse = {r["word"]: r["bits"] for r in words.collect()}
    return [int(sparse.get(w, 0)) for w in range(m_bits // _WORD_BITS)]


def bloom_might_contain(
    key: Column, word_list: list[int], k_hashes: int
) -> Column:
    """Pure-Column membership probe against a single constant BINARY
    literal (the m/32 words big-endian-packed): ALL k positions' bits set.
    No join, no shuffle, no Python — the predicate rides the fact scan.

    Representation notes (both measured at 1024 words × 600k rows):
    - F.lit(list) emits an ArrayType literal whose 1024-node tree costs
      ~0.5 s of Catalyst ANALYSIS per query — pure driver overhead that
      recurs on every plan using the filter;
    - a hex-STRING literal analyzes fast but probes in O(position) per
      row (UTF8String.substring counts code points from the start —
      measured 16 s);
    - one BinaryType literal is O(1) both ways: byte-offset substring
      slices 4 bytes, hex+conv rebuilds the word.
    """
    m_bits = len(word_list) * _WORD_BITS
    blob = b"".join(
        int(w & 0xFFFFFFFF).to_bytes(4, "big") for w in word_list
    )
    lit = F.lit(blob)
    tests = []
    for p in _positions(key, m_bits, k_hashes):
        word = F.conv(
            F.hex(
                F.call_function(
                    "substring",
                    lit,
                    (p / _WORD_BITS).cast("int") * 4 + 1,
                    F.lit(4),
                )
            ),
            16,
            10,
        ).cast("long")
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % _WORD_BITS).cast("int")
        )
        tests.append(word.bitwiseAND(bit) != 0)
    return _reduce(Column.__and__, tests)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """fact rows whose key passes the dimension's Bloom filter — a
    superset of the exact semi-join (no false negatives), to be fed into
    the real join with most non-matching rows already dropped map-side."""
    words = bloom_build(dim, on, m_bits, k_hashes)
    return fact.where(bloom_might_contain(F.col(on), words, k_hashes))
