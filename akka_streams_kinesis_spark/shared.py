"""Cross-query shared cached frames + transient-persist registry.

Two cache tiers with ONE documented lifecycle (round-8 ADVICE: persisted
frames were accumulating with no owner, relying silently on LRU eviction):

``shared_frame(spark, name, sf_dir, build)``
    Build-once, reuse-everywhere frames consumed by SEVERAL registry
    queries in the same process — the minhash band table, the candidate
    pairs, the connected-components labels. The first consumer pays the
    build; every later consumer (bench, driver correctness loop, tests)
    hits the cache, so a bench run stops paying ~4 cold rebuilds of the
    same minhash→CC chain (VERDICT r07 ask #4; the standing-shingle
    persist pattern from commit 2ca4063, generalized). Keyed by
    ``(spark, name, sf_dir)`` — a new session or a different scale factor
    builds fresh.

``transient_persist(df)``
    Intra-query multi-consumer frames (a triangle list feeding four
    aggregates). Same ``persist()`` semantics, but the frame is
    registered here so a harness can bound memory with one call instead
    of each operator guessing when its last consumer ran.

``release_shared()``
    Unpersists and forgets everything in both tiers. ``bench.py`` calls
    it after the headline loop; long-lived sessions that never call it
    fall back to Spark's LRU block eviction (persist() is
    MEMORY_AND_DISK — eviction is safe, never wrong), which is the
    documented, deliberate fallback rather than an accident.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_SHARED: dict[tuple, DataFrame] = {}
_TRANSIENT: list[DataFrame] = []


def shared_frame(
    spark: SparkSession, name: str, sf_dir: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the cached frame for (spark, name, sf_dir), building and
    persisting it on first use."""
    key = (spark, name, sf_dir)
    df = _SHARED.get(key)
    if df is None:
        df = build().persist()
        _SHARED[key] = df
    return df


def transient_persist(df: DataFrame) -> DataFrame:
    """persist() + register for a later release_shared()."""
    df = df.persist()
    _TRANSIENT.append(df)
    return df


def release_shared() -> None:
    """Unpersist every registered frame (both tiers) and forget them."""
    for df in _SHARED.values():
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — blocks are gone anyway
    _SHARED.clear()
    for df in _TRANSIENT:
        try:
            df.unpersist()
        except Exception:
            pass
    _TRANSIENT.clear()
