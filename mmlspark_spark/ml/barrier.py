"""Gang-scheduled barrier training harness.

Parity: reference ``lightgbm/.../LightGBMBase.scala:392-432,475-484`` —
the reference launches one native LightGBM worker per partition under
barrier execution, exchanges worker ``host:port`` addresses through the
barrier coordinator, and hands the full machine list to the native
NetworkInit. The idiomatic PySpark expression of the same protocol is
``df.rdd.barrier().mapPartitions`` + ``BarrierTaskContext.allGather``:
every task binds a free port, gathers the cluster-wide machine list,
and runs the native trainer against its own partition's rows.

The harness is trainer-agnostic so the network/partition plumbing is
testable without any native library installed (tests drive it with a
pure-numpy ``train_fn``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def barrier_train(
    prepared: DataFrame,
    train_fn: Callable,
    numTasks: int | None = None,
    repartitionCols: list | None = None,
    sortCols: list | None = None,
    pass_context: bool = False,
):
    """Run ``train_fn`` once per partition under barrier scheduling.

    ``prepared`` has columns (features ``array<double>``, label
    ``double``[, extra]). ``train_fn(X, y, machines, port,
    partition_id, extra)`` is called on each executor with that
    partition's rows as numpy arrays (``extra`` is the third column's
    values, or None), the gathered ``host:port`` machine list (one
    entry per task, index == partition id), and this task's reserved
    port; exactly one task (by convention partition 0) returns the
    non-None model payload, which this function returns.
    ``pass_context=True`` appends the live ``BarrierTaskContext`` as a
    seventh argument so iterative trainers can run their own per-pass
    ``allGather`` synchronization (the reference's per-pass allreduce,
    ``VowpalWabbitBase.scala:339-445``).

    ``numTasks`` repartitions to that many barrier tasks, capped at
    ``defaultParallelism`` because barrier mode requires every task to
    be scheduled concurrently — at 1000 executors that cap IS the
    cluster, matching the reference's ``numTasks`` semantics.
    ``repartitionCols`` hash-partitions on those columns instead of
    round-robin (keeps e.g. ranking query groups whole within one
    task); ``sortCols`` additionally sorts within partitions (makes
    groups contiguous).

    Scale: each task materializes ONE partition as numpy arrays — the
    same per-worker buffer the native engine needs anyway — and the
    driver only ever receives the final model payload, never feature
    data.
    """
    from mmlspark_spark.core.cache import persist_intermediate

    sc = prepared.sparkSession.sparkContext
    # pin the prepared (featurized/cast) input ONCE: the shrink loop
    # below runs a probe pass per attempt plus the barrier run itself,
    # and without the pin each of those re-executes the full upstream
    # lineage (tokenize/featurize/shuffle)
    prepared = persist_intermediate(prepared)
    n = numTasks or prepared.rdd.getNumPartitions()
    n = max(1, min(n, sc.defaultParallelism))

    def _partition(m: int) -> DataFrame:
        if repartitionCols:
            out = prepared.repartition(m, *repartitionCols)
            if sortCols:
                out = out.sortWithinPartitions(*sortCols)
            return out
        return prepared.repartition(m)

    # An empty barrier partition is fatal: its native trainer raises on
    # a 0-row dataset while every other worker, whose num_machines
    # includes the dead task, blocks in NetworkInit until timeout
    # (reference LightGBMBase handles empty partitions explicitly; we
    # prevent them instead). ONE probe pass per attempt detects empty
    # partitions — whether from rows < n, distinct repartition keys
    # < n, or hash collisions — and shrinks until every barrier task
    # has rows; the same sizes also catch the empty-dataset case, so
    # no separate count/countDistinct pre-scan is paid.
    pre = _partition(n)
    while True:
        sizes = pre.rdd.mapPartitions(
            lambda it: iter([sum(1 for _ in it)])).collect()
        if sum(sizes) == 0:
            prepared.unpersist()
            raise ValueError("cannot barrier-train on an empty dataset")
        nonempty = sum(1 for s in sizes if s)
        if nonempty == len(sizes):
            break
        n = max(1, nonempty)
        pre = _partition(n)

    def run(it):
        import socket

        import numpy as np
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        pid = ctx.partitionId()
        # Reserve a free port, release it, and let the trainer re-bind:
        # the standard NetworkInit handshake (reference
        # LightGBMUtils.scala findOpenPort). The small re-bind race is
        # inherent to the protocol.
        s = socket.socket()
        s.bind(("", 0))
        port = s.getsockname()[1]
        s.close()
        host = ctx.getTaskInfos()[pid].address.split(":")[0]
        machines = ctx.allGather(f"{host}:{port}")
        rows = list(it)
        extra = None
        if rows:
            X = np.asarray([list(r[0]) for r in rows], dtype="float64")
            y = np.asarray([r[1] for r in rows], dtype="float64")
            if len(rows[0]) > 2:
                extra = np.asarray([r[2] for r in rows])
        else:  # pragma: no cover - guarded by numTasks <= parallelism
            X = np.zeros((0, 0), dtype="float64")
            y = np.zeros(0, dtype="float64")
        args = (X, y, list(machines), port, pid, extra)
        out = train_fn(*args, ctx) if pass_context else train_fn(*args)
        return iter([out] if out is not None else [])

    try:
        results = pre.rdd.barrier().mapPartitions(run).collect()
    finally:
        prepared.unpersist()
    if not results:
        raise ValueError("no barrier task returned a model payload")
    return results[0]
