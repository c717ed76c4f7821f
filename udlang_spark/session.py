"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same configuration
keys are the ones that matter on a 1000-executor cluster — AQE (runtime
re-planning, skew-join splitting, partition coalescing), a shuffle-partition
count sized to the data, and Arrow for any Python-side exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "udlang_spark", **extra_conf: str) -> SparkSession:
    """Build (or return the active) SparkSession.

    Scale notes: on a real cluster, ``spark.sql.shuffle.partitions`` should be
    ~2-3x total cores (or left to AQE coalescing with a high initial value);
    locally we match core count. AQE is always on: it converts sort-merge
    joins to broadcast at runtime when a side turns out small, splits skewed
    shuffle partitions, and coalesces tiny ones — all critical at 100 TB.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


# ---------------------------------------------------------------------------
# persisted-DataFrame registry
#
# Several operators persist a reduced intermediate (shingle sets, SimHash
# fingerprints, BM25 per-doc stats) because two downstream passes need it.
# Spark's CacheManager holds those blocks until an explicit unpersist — in a
# long-lived driver session (an oracle sweep, a notebook, a service) that is
# a slow leak bounded only by LRU eviction. Operators register their persists
# here; sweep drivers call ``release_caches()`` between queries.
#
# The registry holds STRONG references on purpose: derived DataFrames keep
# no Python reference to their persisted parent, so the wrapper's refcount
# hits zero as soon as the operator returns — a weakref registry would be
# empty by the time release_caches() runs while the JVM-side cache entry
# (which is what leaks) lives on. The Python wrappers held here are a few
# hundred bytes each and are dropped at every release.
# ---------------------------------------------------------------------------

_PERSISTED: list = []
_PERSISTED_IDS: set[int] = set()


# ---------------------------------------------------------------------------
# per-session analyzed-plan cache
#
# Some queries return the SAME DataFrame object for the same (session, input
# fingerprint) so exprIds stay stable across bench runs and re-executions hit
# the JVM codegen cache (the t_maxsim_topk lesson, SURVEY §9 r12). Keying is
# on the SparkSession OBJECT via a WeakKeyDictionary (r12 ADVICE #1: an
# applicationId key is shared by newSession() siblings with different SQL
# confs, and entries from stopped contexts linger), so a sibling session
# never sees another session's plans and dead sessions drop their entries
# automatically. Eviction is FIFO of the oldest entry only (r12 ADVICE #2:
# a full clear at the cap threw away the hot entry whose exprId stability
# the cache exists to preserve).
# ---------------------------------------------------------------------------


class _PlanCache:
    # Cap = bound on a pathological many-corpus session, NOT a working-set
    # tuning. The r13 probe caches brought one (session, corpus) working
    # set to EXACTLY 8 distinct keys (measured: maxsim, the shared exact
    # arm, two recall cards, three persisted-index probes, the retrieval
    # pipeline) — flush against the old cap of 8, where the next cache
    # user would have silently FIFO-thrashed the whole set every bench
    # pass. Raised to 24 for headroom; entries are a few hundred bytes of
    # Python wrapper each, and tests pin that the full working set fits
    # without eviction.
    MAX_PER_SESSION = 24

    def __init__(self) -> None:
        import weakref

        self._per = weakref.WeakKeyDictionary()

    def get(self, spark, key):
        return self._per.get(spark, {}).get(key)

    def put(self, spark, key, df) -> None:
        per = self._per.get(spark)
        if per is None:
            per = {}
            self._per[spark] = per
        if key not in per and len(per) >= self.MAX_PER_SESSION:
            per.pop(next(iter(per)))  # FIFO-evict the oldest entry only
        per[key] = df

    def clear(self) -> None:
        self._per.clear()


plan_cache = _PlanCache()


def persist_tracked(df, storage_level=None):
    """persist() a DataFrame and register it for later release_caches().

    Idempotent per DataFrame OBJECT within one release window (r13 ADVICE
    #3): plan-cache hits re-arm their pins through here on every call, so
    a long-lived serving session that never releases would otherwise grow
    the registry without bound with duplicate refs. The id() key is safe
    because the registry holds a strong reference — the object cannot be
    collected (and its id reused) while tracked."""
    if id(df) in _PERSISTED_IDS:
        return df  # already persisted and tracked in this window
    df.persist() if storage_level is None else df.persist(storage_level)
    _PERSISTED.append(df)
    _PERSISTED_IDS.add(id(df))
    return df


def release_caches() -> None:
    """Unpersist every tracked DataFrame (non-blocking)."""
    global _PERSISTED
    for df in _PERSISTED:
        try:
            df.unpersist(False)
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    _PERSISTED = []
    _PERSISTED_IDS.clear()
