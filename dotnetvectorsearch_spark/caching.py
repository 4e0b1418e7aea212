"""Session registry for TRANSIENT operator caches.

Several operators persist an intermediate frame that multiple downstream
consumers share within one query plan (exploded n-grams, LSH band rows,
inverted-index shingles, token occurrences). The persist is required —
without it a self-joined plan re-executes its expensive upstream 2-4
times — but the frames are TOKEN-scale, and a long-lived session that
runs many such queries accumulates cached storage until LRU eviction
starts ejecting caches you actually want hot (ANN cells, BM25 postings).

The unpersist can't happen inside the operator: the returned DataFrame
is lazy, and unpersisting before the caller's action would silently undo
the sharing. So operators register every transient persist here, and
session owners (bench loops, oracle checkers, notebooks) call
:func:`release_transient` at natural boundaries — after each query's
action — to drop them deterministically. Long-lived caches that are
MEANT to stay hot for the session (materialized indexes, centroid
tables) are deliberately NOT registered.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
# Strong references on purpose: the registered frames are operator-local
# and would otherwise be garbage-collected the moment the operator
# returns — the registry must keep them reachable until the session
# owner releases them (holding them is exactly what today's leaked
# persists do anyway; release_transient is the new part).
_TRANSIENT: list[DataFrame] = []


def transient_persist(df: DataFrame) -> DataFrame:
    """persist() + register for a later :func:`release_transient`."""
    df = df.persist()
    with _LOCK:
        _TRANSIENT.append(df)
    return df


from contextlib import contextmanager


@contextmanager
def transient_scope():
    """Release, at exit, ONLY the transient persists registered inside
    the with-block — for long-running owners (streaming foreachBatch
    loops) that must not clear the GLOBAL registry out from under a
    concurrent query in the same session (advisor r5: a second stream's
    registered persist dropped between plan construction and action
    silently re-executes its upstream; perf only, never correctness).
    Caveat: frames registered by ANOTHER thread while the block runs
    are treated as the block's own — the window is one micro-batch, and
    a wrongly-released frame only recomputes.
    """
    with _LOCK:
        before = {id(f) for f in _TRANSIENT}
    try:
        yield
    finally:
        with _LOCK:
            mine = [f for f in _TRANSIENT if id(f) not in before]
            for f in mine:
                _TRANSIENT.remove(f)
        for df in mine:
            try:
                df.unpersist(blocking=True)
            except Exception:  # noqa: BLE001 - session may already be gone
                pass


def release_transient() -> int:
    """Unpersist every registered transient cache; returns the count.

    Safe to call at any point — frames whose plans are re-executed later
    simply recompute (correctness never depends on a cache).
    """
    with _LOCK:
        frames = list(_TRANSIENT)
        _TRANSIENT.clear()
    released = 0
    for df in frames:
        try:
            # blocking: PySpark's default unpersist is async, which
            # leaves the block manager's registry briefly stale — the
            # release must be deterministic for accounting (and tests)
            df.unpersist(blocking=True)
            released += 1
        except Exception:  # noqa: BLE001 - session may already be gone
            pass
    return released
