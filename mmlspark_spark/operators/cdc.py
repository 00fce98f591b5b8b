"""Batch CDC application — the MERGE INTO / slowly-changing-dimension
workhorse, expressed as one join + classification instead of row-at-a-
time mutation (Spark has no in-place update; the scalable shape is
"read current state, apply batch, write new state").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer
from mmlspark_spark.functions.keys import content_hash128


class SCD2Merge(Transformer):
    """Apply a change batch to the CURRENT rows of a dimension with
    SCD Type-2 semantics. ``transform(dim)`` returns the new state:

    - keys absent from the batch: passed through, ``is_current`` true;
    - keys whose tracked values actually changed: the OLD row with
      ``is_current`` false (history retention) plus the NEW row with
      ``is_current`` true and ``batch_id`` stamped;
    - keys whose batch row equals the current row: passed through
      unchanged (no-op updates must not spawn history rows);
    - brand-new keys: inserted, ``is_current`` true, stamped.

    Change detection hashes the tracked columns through the null-safe
    length-prefixed serialization (functions/keys.py) — NULL→value and
    value→NULL transitions are real changes, and ('a', NULL) never
    equals (NULL, 'a').

    ``batchId`` is caller-supplied (a load timestamp, an ingest run
    id): stamping with now() inside the plan would be nondeterministic
    under task retries.

    Duplicate keys in the change batch are REJECTED eagerly (one
    aggregate over the small batch at transform time) — a multi-match
    batch would fan the join out and leave two ``is_current`` rows for
    one key, the exact corruption SQL MERGE raises on. Pre-reduce the
    batch to one row per key (e.g. latest by a change-sequence column)
    before merging.

    Scale: Spark cannot broadcast a FULL OUTER join, so the merge is
    deliberately split into (a) dim LEFT JOIN changes — a broadcast
    hash join when the batch is small (``broadcastChanges``), which is
    the common daily-CDC case, classifying unchanged/history/updated
    rows with pure expressions; the joined frame is persisted for its
    three consumers, so the dimension scans ONCE for the
    classification — and (b) inserts via changes LEFT ANTI the
    dimension's KEY PROJECTION (only the key columns of the big side
    scan again, column-pruned). State grows only by changed+new rows
    per batch; key the dimension's bucketing to the merge key so
    repeated daily merges co-locate (operators/scale.py:bucketed_join).
    The caller should release the persisted frame after its action
    (core.cache.release_intermediates, as bench.py does).
    """

    def __init__(self, changesDf: DataFrame = None, keyCols=("id",),
                 trackedCols=None, batchId: str = "1",
                 broadcastChanges: bool = True,
                 currentCol: str = "is_current",
                 batchCol: str = "batch_id"):
        super().__init__(changesDf=changesDf, keyCols=list(keyCols),
                         trackedCols=list(trackedCols or []),
                         batchId=str(batchId),
                         broadcastChanges=broadcastChanges,
                         currentCol=currentCol, batchCol=batchCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, *self.keyCols)
        tracked = self.trackedCols or [
            f.name for f in schema.fields if f.name not in self.keyCols]
        self._require_cols(schema, *tracked)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.currentCol, T.BooleanType(), False),
            T.StructField(self.batchCol, T.StringType())])

    def _transform(self, dim: DataFrame) -> DataFrame:
        from mmlspark_spark.core.cache import (
            attach_intermediates,
            persist_intermediate,
        )

        data_cols = [c for c in dim.columns if c not in self.keyCols]
        tracked = self.trackedCols or data_cols
        # Eager multi-match guard: duplicate keys in the batch would
        # fan the join out into two is_current rows per key.
        # reserved alias, not .count(): a key column literally named
        # "count" would make F.col("count") ambiguous
        dup = (self.changesDf.groupBy(*self.keyCols)
               .agg(F.count("*").alias("__n"))
               .filter(F.col("__n") > 1).limit(1).collect())
        if dup:
            dup_key = tuple(dup[0][k] for k in self.keyCols)
            raise ValueError(
                f"change batch has multiple rows for key {dup_key!r}; "
                "reduce to one row per key (e.g. latest by change "
                "sequence) before merging")
        ch = self.changesDf.select(
            *[F.col(c).alias(f"__c_{c}") for c in dim.columns])
        if self.broadcastChanges:
            ch = F.broadcast(ch)
        h_old_1, h_old_2 = content_hash128(tracked)
        h_new_1, h_new_2 = content_hash128(
            [F.col(f"__c_{c}") for c in tracked])
        cond = None
        for k in self.keyCols:
            c = dim[k].eqNullSafe(F.col(f"__c_{k}"))
            cond = c if cond is None else (cond & c)
        # persisted: unchanged/history/updated each consume j — without
        # it the dimension re-scans (and the batch re-broadcasts) per
        # branch
        j = persist_intermediate(
            dim.withColumn("__h1", h_old_1).withColumn("__h2", h_old_2)
            .join(ch.withColumn("__n1", h_new_1).withColumn("__n2", h_new_2),
                  cond, "left"))
        in_ch = F.col("__n1").isNotNull()
        changed = in_ch & ((F.col("__h1") != F.col("__n1"))
                           | (F.col("__h2") != F.col("__n2")))
        batch = F.lit(self.batchId)

        def emit(src, side, current, stamped, flt=None):
            pick = ((lambda c: F.col(f"__c_{c}")) if side == "new"
                    else (lambda c: dim[c]))
            cols = ([pick(c).alias(c) for c in dim.columns]
                    + [F.lit(current).alias(self.currentCol),
                       (batch if stamped else F.lit(None).cast("string"))
                       .alias(self.batchCol)])
            return (src.filter(flt) if flt is not None else src).select(*cols)

        unchanged = emit(j, "old", True, False, ~changed)
        history = emit(j, "old", False, False, changed)
        updated = emit(j, "new", True, True, changed)
        # inserts: anti join against the dimension's KEY PROJECTION so
        # only the key columns of the (big) dim side shuffle
        key_cond = None
        for k in self.keyCols:
            c = F.col(f"__c_{k}").eqNullSafe(F.col(f"__k_{k}"))
            key_cond = c if key_cond is None else (key_cond & c)
        dim_keys = dim.select(
            *[F.col(k).alias(f"__k_{k}") for k in self.keyCols])
        inserted = emit(
            self.changesDf.select(
                *[F.col(c).alias(f"__c_{c}") for c in dim.columns])
            .join(dim_keys, key_cond, "left_anti"),
            "new", True, True)
        out = (unchanged.unionByName(history)
               .unionByName(updated).unionByName(inserted))
        return attach_intermediates(out, j)
