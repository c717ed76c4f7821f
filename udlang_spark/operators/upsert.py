"""CDC / slowly-changing-dimension operators (engine extensions — the
reference has no storage or update concept at all; SURVEY.md §2.1).

Without a table format (Delta/Iceberg ship as external jars, not in this
container), MERGE INTO is emulated with the classic relational identity:

    merged = updates ∪ (base ▷ updates)        -- updates win per key

which is exactly what a MERGE with WHEN MATCHED UPDATE / WHEN NOT MATCHED
INSERT produces for full-row updates. Scale shape: one left-anti join
keyed on the merge key (broadcast when the update batch is small — the
common CDC case) plus a union; no row rewrite of untouched data happens
here — that's the table format's job at 100 TB, this is the dataset-level
semantics.

scd2_history turns an append-only change stream into type-2 dimension
rows (validity intervals): one window partition per key does everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Merge: every key in `updates` replaces its row in `base`; unmatched
    base rows pass through. Columns must match.

    PRECONDITION: `updates` must carry at most ONE row per key — no
    reduction is applied, so a batch with several rows for a key keeps
    them all. For multi-row change batches, reduce first (e.g. the
    seq-aware latest-wins in streaming.runner.run_cdc_apply_stream, or a
    row_number window on your ordering column)."""
    if set(base.columns) != set(updates.columns):
        raise ValueError("upsert requires identical schemas")
    untouched = base.join(updates.select(key), key, "left_anti")
    return untouched.select(*base.columns).unionByName(updates)


def scd2_history(
    changes: DataFrame,
    key: str,
    ts_col: str,
    tie_break: str,
) -> DataFrame:
    """Type-2 history from a change stream: each change row becomes a
    version with [valid_from, valid_to) and an is_current flag; valid_to
    is the next change's timestamp (NULL while current). One shuffle —
    the window partition on `key`."""
    w = Window.partitionBy(key).orderBy(ts_col, tie_break)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Key-wise reconciliation of two table versions: one row per key with
    status 'added' (key only in new), 'removed' (only in old), 'changed'
    (both, any non-key column differs, null-safe), or 'unchanged'.

    One full-outer sort-merge join on the key; the column comparison is an
    eqNullSafe conjunction evaluated inside the join stage's codegen — no
    per-row hashing pass, no second shuffle. With both snapshots bucketed
    on the key (sources/bucketing.py) the exchange disappears entirely —
    the natural layout for a table that is diffed every refresh cycle.
    """
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshot_diff requires identical schemas")
    data_cols = [c for c in old.columns if c not in keys]
    o = old.alias("o")
    n = new.alias("n")
    cond = [F.col(f"o.{k}") == F.col(f"n.{k}") for k in keys]
    same = F.lit(True)
    for c in data_cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    in_old = F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    key_cols = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys
    ]
    return o.join(n, cond, "full_outer").select(*key_cols, status.alias("status"))
