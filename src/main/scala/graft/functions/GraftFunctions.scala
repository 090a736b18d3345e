package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level helpers shared by the dedup/similarity operators. All are
  * pure Catalyst expression compositions (higher-order functions) — they
  * stay inside WholeStageCodegen and never fall back to UDFs.
  */
object GraftFunctions {

  /** All unordered pairs (a, b) with a before b in array order, from a
    * (pre-sorted, distinct) id array: the candidate-pair explosion used
    * after LSH bucketing. Emitting pairs from a grouped id list keeps the
    * shuffle narrow — two ids per row instead of two full feature arrays.
    * Bucket-size caps must be applied by the caller BEFORE this (the output
    * is quadratic in the bucket size). */
  def pairsCol(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + 2, size(ids)), y => struct(x.as("a"), y.as("b")))))
}
