"""Every registered query must survive degenerate inputs: empty and
whitespace-only documents, single-token docs, massive repeats, non-ASCII,
verbatim duplicates, zero-norm and duplicated embeddings, and minimal
relational tables. At 100 TB some partition WILL contain the weird row;
ANSI mode turns an unguarded division into a job-killing exception
(this sweep caught two: gopher_rules ratios and Column-level cosine)."""

from __future__ import annotations

import duckdb
import pytest

from udlang_spark.queries import QUERIES
from udlang_spark.session import release_caches

_SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def degenerate_sf(tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_degenerate")
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{_SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, key in (
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
    ):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{_SRC}/{t}.parquet') "
            f"ORDER BY {key} LIMIT 30) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{_SRC}/orders.parquet') "
        f"ORDER BY o_orderkey LIMIT 50) TO '{out}/orders.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT l.* FROM read_parquet('{_SRC}/lineitem.parquet') l "
        f"JOIN read_parquet('{out}/orders.parquet') o ON l.l_orderkey = o.o_orderkey) "
        f"TO '{out}/lineitem.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{_SRC}/events.parquet') LIMIT 100) "
        f"TO '{out}/events.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"""
COPY (
  SELECT * FROM (VALUES
    (0, '', 'en', 'src0', 0),
    (1, '   ', 'en', 'src0', 3),
    (2, 'solo', 'de', 'src1', 4),
    (3, repeat('a ', 200), 'es', 'src2', 400),
    (4, 'naïve café über ça 字 λ', 'fr', 'src3', 22),
    (5, repeat('the quick brown fox jumps over the lazy dog ', 5), 'en', 'src4', 220),
    (6, repeat('the quick brown fox jumps over the lazy dog ', 5), 'en', 'src5', 220)
  ) t(doc_id, text, lang, source, n_chars)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  WITH base AS (SELECT * FROM read_parquet('{_SRC}/embeddings.parquet')),
  six AS (SELECT vec_id, embedding, label FROM base ORDER BY vec_id LIMIT 6),
  zero AS (
    SELECT 101 AS vec_id,
      (SELECT list_transform(embedding, x -> CAST(0.0 AS FLOAT))
       FROM base WHERE vec_id = 0) AS embedding, 1 AS label
  ),
  dup AS (
    SELECT 102 AS vec_id,
      (SELECT embedding FROM base WHERE vec_id = 0) AS embedding, 0 AS label
  )
  SELECT * FROM six UNION ALL SELECT * FROM zero UNION ALL SELECT * FROM dup
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    con.close()
    return str(out)


def test_all_queries_survive_degenerate_inputs(spark, degenerate_sf):
    fails = []
    for name, fn in QUERIES.items():
        try:
            fn(spark, degenerate_sf).collect()
        except Exception as e:  # noqa: BLE001 — collecting the full list
            first = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            fails.append(f"{name}: {first}")
        finally:
            release_caches()
    assert not fails, "\n".join(fails)


@pytest.fixture(scope="session")
def empty_sf(tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{_SRC}/{t}.parquet') WHERE 1=0) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(out)


def test_all_queries_survive_empty_tables(spark, empty_sf):
    """Zero-row tables are the harshest degenerate case: empty seed
    collects (np.stack), zero denominators in grand-total ratios, empty
    Arrow batches. Caught on first run: four np.stack-on-empty centroid
    seeds and q50's funnel ratios."""
    fails = []
    for name, fn in QUERIES.items():
        try:
            fn(spark, empty_sf).collect()
        except Exception as e:  # noqa: BLE001 — collecting the full list
            first = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            fails.append(f"{name}: {first}")
        finally:
            release_caches()
    assert not fails, "\n".join(fails)
