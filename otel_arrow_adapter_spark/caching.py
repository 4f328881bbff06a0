"""Cache lifecycle helper: bounded persist footprints for multi-use plans.

Library functions here persist intermediates that their result's plan uses
more than once (LSH band tables, shingle tables, simhash signatures,
k-means centroids).  Left alone, those caches live for the whole session —
harmless at sf0.01, a real memory accrual in a long-lived 100 TB session
(the reference frees its builders per batch; Spark caches are explicit).

``owned_result`` is the single ownership rule: a function materializes its
OWN result into a cache, releases every intermediate cache its plan
consumed, and hands the one remaining cache to the caller.  After the
caller's ``result.unpersist()`` the session holds zero lingering RDDs
(asserted by tests/test_functions.py::test_no_lingering_caches_*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def owned_result(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Persist + eagerly materialize ``result``, then unpersist each
    intermediate cache its plan consumed.

    The count() triggers exactly the job a downstream action would run
    anyway — with the intermediates still cached — so total compute is
    unchanged; afterwards only the (typically much smaller) result stays
    resident.  The caller owns the returned cache and should
    ``unpersist()`` it when done."""
    result = result.persist()
    result.count()
    for df in intermediates:
        df.unpersist()
    return result


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the RDD behind a ``localCheckpoint()``-ed DataFrame.

    Local checkpoints persist at RDD level (MEMORY_AND_DISK), which the
    Dataset-level ``unpersist()`` / CacheManager never sees — an iterative
    loop that checkpoints per round would otherwise leak one RDD per round
    for the session. No-op for frames that were never checkpointed (plain
    logical plans carry no RDD handle)."""
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getSimpleName() == "LogicalRDD":
        plan.rdd().unpersist(False)
