package graft.ops

import org.apache.spark.sql.DataFrame

/** Tiny-input parallelism guard shared by the ops: a small parquet scan
  * yields one or two input splits, which runs an expensive per-row stage
  * (signatures, dot products) on one core no matter the cluster size.
  * When the plan's ESTIMATED scan parallelism is below the session
  * default, repartition BEFORE the per-row compute; at real scale
  * (thousands of splits) the condition is false and this is a no-op — no
  * payload shuffle is added to the 100 TB path.
  *
  * The estimate comes from optimizer statistics (`sizeInBytes` /
  * `maxPartitionBytes`), NOT from `df.rdd.getNumPartitions` — building the
  * RDD forces a full physical-planning pass per invocation, and this guard
  * runs inside every dedup/similarity helper. Stats are an upper bound for
  * column-pruned scans (they reflect total relation size), which only
  * makes the guard MORE conservative about adding the repartition on big
  * inputs — the correct bias. */
object TinyInput {
  def parallelized(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val target = sess.sparkContext.defaultParallelism
    val cap = sess.sessionState.conf.numShufflePartitions
    val maxSplit = math.max(1L, sess.sessionState.conf.filesMaxPartitionBytes)
    val sizeEst = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits =
      if (sizeEst > BigInt(Long.MaxValue)) Long.MaxValue
      else (sizeEst.toLong + maxSplit - 1) / maxSplit
    if (estSplits < math.min(target, cap).toLong) df.repartition(target)
    else df
  }
}
