package graft.ops

import org.apache.spark.sql.DataFrame

/** Package-private peepholes for the profiling tools — exposes counts over
  * [[Graph]]'s private subplans without widening their visibility for
  * library callers. */
object GraphProbe {
  /** Rows surviving the wedge shuffle + radix sort + RLE common count (the
    * operator's cost center), before the size attach / scoring stages. */
  def commonsCount(adj: DataFrame): Long =
    Graph.rleWedgeCountPublicForProbe(Graph.nbrTaggedSorted(adj)).count()

  /** Restricted-degree aggregate cardinality (explode kept + count). */
  def sizesCount(adj: DataFrame): Long =
    Graph.nbrSizes(adj, 256).count()

  /** Full plan with the two-equi-join attach instead of the dictionary. */
  def fullJoinAttach(adj: DataFrame): Long =
    Graph.neighborJaccardAdj(adj, 256, dictAttach = false).count()
}
