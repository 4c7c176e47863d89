"""Tracked lineage cuts for ITERATIVE algorithms.

``localCheckpoint`` pins its RDD blocks for the session lifetime: the
truncated lineage means Spark can never recompute them, so the blocks are
exempt from storage eviction. A loop that cuts lineage every round
(connected components, LR training) therefore accumulates one pinned
copy of its working set per round until unified storage starves unified
execution memory — the symptom is ``SparkOutOfMemoryError
[UNABLE_TO_ACQUIRE_MEMORY]`` deep inside an otherwise-healthy shuffle,
long before the data itself is large (observed at 1M docs on a 8 GiB
heap: ~10 CC rounds x 1 edge-set copy).

The fix is mechanical: record which persistent RDD ids a checkpoint call
registered, and free the PREVIOUS round's ids once the new round's
result has been materialized and every consumer of the old frame has
run. These helpers do the bookkeeping; the algorithms own the "when".

The last round's blocks stay pinned by design — the returned DataFrame's
lineage bottoms out in them, so freeing them would make downstream
actions fail, not recompute.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark import SparkContext
from pyspark.sql import DataFrame

# Thread-local collection point for scoped_fused_caches (below).
_SCOPED = threading.local()


@contextmanager
def scoped_fused_caches():
    """Collect every frame :func:`fused_checkpoint` persists on THIS
    thread inside the block, so a composite operator that fully consumes
    its intermediates before returning (e.g. ``dedup.lsh_audit``, which
    collects a one-row aggregate) can unpersist them instead of leaving
    per-call caches registered for the session:

        with scoped_fused_caches() as frames:
            ... build and CONSUME the plan ...
        for f in frames:
            f.unpersist()

    Thread-local by design — concurrent operators on other threads are
    never swept. Nests: an inner scope shadows the outer one, so a
    composite op only ever frees its own intermediates.
    """
    prev = getattr(_SCOPED, "frames", None)
    _SCOPED.frames = []
    try:
        yield _SCOPED.frames
    finally:
        _SCOPED.frames = prev

# Serializes checkpoint MATERIALIZATION (see fused_checkpoint): Spark's
# RDD.doCheckpoint takes the JVM-global RDDCheckpointData lock and then
# per-RDD monitors, while the DAG scheduler takes them in the opposite
# order when a concurrently-scheduled plan references the same RDD — a
# lock inversion observed as a hard driver deadlock (dag-scheduler vs
# broadcast-exchange thread) when a LAZY localCheckpoint's first
# materialization landed on an AQE broadcast-exchange thread.
_MATERIALIZE_LOCK = threading.Lock()


def _persistent_ids(sc: SparkContext) -> set[int]:
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


def tracked_checkpoint(
    df: DataFrame, *, eager: bool = True, reliable: bool = False
) -> tuple[DataFrame, set[int]]:
    """Cut lineage and return ``(checkpointed_df, new_persistent_rdd_ids)``.

    The id set is what :func:`unpersist_ids` needs to free this cut later.
    ``persist`` registers the RDD at call time (not first materialization),
    so this works for ``eager=False`` too; for ``reliable=True`` the data
    lives in checkpoint files, the pinned set is usually empty, and
    freeing it is then a no-op.

    The id is read off the RETURNED frame's own plan (``checkpoint``
    returns a Dataset over ``LogicalRDD(pinned_rdd)``), never by diffing
    the session-global persistent-RDD registry: a global before/after diff
    would capture whatever a CONCURRENT thread persisted in the window and
    later unpersist it — and a localCheckpoint's blocks are unrecoverable
    once dropped (truncated lineage cannot recompute). Falls back to the
    global diff only if a future Spark changes the returned plan shape."""
    sc = df.sparkSession.sparkContext
    before = _persistent_ids(sc)
    with _MATERIALIZE_LOCK:
        out = df.checkpoint(eager=eager) if reliable else df.localCheckpoint(
            eager=eager)
    try:
        # LogicalRDD.rdd() — the exact RDD checkpoint() just registered
        return out, {int(out._jdf.queryExecution().analyzed().rdd().id())}
    except Exception:
        return out, _persistent_ids(sc) - before


def unpersist_ids(df_or_sc, ids: set[int]) -> None:
    """Free the blocks a previous :func:`tracked_checkpoint` pinned
    (non-blocking). Safe to call with ids that are already gone."""
    sc = (df_or_sc if isinstance(df_or_sc, SparkContext)
          else df_or_sc.sparkSession.sparkContext)
    jmap = sc._jsc.getPersistentRDDs()
    for i in ids:
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)


def fused_checkpoint(df: DataFrame) -> DataFrame:
    """One-shot materialize-and-reuse cut for a frame that feeds MULTIPLE
    plan branches (LSH triples, shingle subtrees, token arrays): compute
    it once, let every branch read the blocks.

    Implemented as an EVICTABLE eager persist (MEMORY_AND_DISK +
    materializing count), deliberately NOT ``localCheckpoint``:

    * Checkpoint blocks are pinned for the session (truncated lineage is
      unrecomputable, so they are eviction-exempt). Per-call operators —
      ``minhash_lsh_candidates`` / ``signature_tables`` once per arriving
      batch, ``run_recipe`` per corpus — would accumulate one pinned copy
      of their working set per CALL in a long-lived ingest session until
      unified storage starves execution memory (the exact
      ``SparkOutOfMemoryError [UNABLE_TO_ACQUIRE_MEMORY]`` failure this
      module's docstring describes for iterative loops). Persisted blocks
      keep their lineage, so under pressure Spark evicts them and a later
      branch recomputes — graceful degradation instead of OOM. Every
      frame cut here is deterministic (md5-derived), so a recomputed
      shard is value-identical.
    * ``localCheckpoint`` has a driver-deadlock path: a LAZY checkpoint
      whose first materialization lands on an AQE broadcast-exchange
      thread takes Spark's global RDDCheckpointData lock and the RDD
      monitor in the opposite order to the DAG scheduler (observed live
      via ``jstack``). Persist involves neither lock; the eager count
      just guarantees one materialization job on the calling thread.

    Iterative algorithms must keep using :func:`tracked_checkpoint` +
    :func:`unpersist_ids`: per-round lineage TRUNCATION (not just reuse)
    is what stops their plans growing without bound.
    """
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    frames = getattr(_SCOPED, "frames", None)
    if frames is not None:
        frames.append(df)
    return df
