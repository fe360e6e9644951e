"""Cross-epoch cache for UNBOUND Column expression trees.

The per-epoch serial floor of the CDC loop is dominated not by the
snapshot commit (~10 ms) but by py4j expression CONSTRUCTION: building
the fold's ~40 aggregate columns costs ~190 ms of driver round-trips,
the dead-letter when-chain ~40 ms, the alignment projection ~20 ms —
per epoch, every epoch, and all of it serial driver time that no amount
of executors parallelizes (it is the textbook scaling-efficiency
poison: constant per-epoch driver work shrinks the N→4N ratio).

Every one of those expressions is UNBOUND — built purely from
``F.col``/``F.when``/literals, referencing no DataFrame — and PySpark
``Column`` objects are immutable expression wrappers that are safe to
reuse across any number of plans in the same SparkContext. So: build
once per (context, parameter-key), reuse every epoch. A steady-state
replay pays the construction cost on epoch 0 only.

The cache is keyed by the ACTIVE SparkContext identity and clears
itself when the context changes (a stopped context's JVM expression
objects must not leak into a new one).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_CACHE: dict[Any, Any] = {}
_CACHE_CTX: Any = None


def cached_exprs(key: Any, builder: Callable[[], Any]) -> Any:
    """Return ``builder()``'s result, memoized per active SparkContext.

    ``key`` must capture every parameter the built expressions depend
    on; ``builder`` must construct UNBOUND expressions only (no
    DataFrame references — those would pin plans across batches).
    """
    global _CACHE_CTX
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is not _CACHE_CTX:
        _CACHE.clear()
        _CACHE_CTX = sc
    if key not in _CACHE:
        _CACHE[key] = builder()
    return _CACHE[key]
