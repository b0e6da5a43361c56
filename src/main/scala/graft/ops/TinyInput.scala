package graft.ops

import org.apache.spark.sql.DataFrame

/** Tiny-input parallelism guard shared by the ops: a small parquet scan
  * yields one or two input splits, which runs an expensive per-row stage
  * (signatures, dot products) on one core no matter the cluster size.
  * When the plan's scan parallelism is below the session default,
  * repartition BEFORE the per-row compute; at real scale (thousands of
  * splits) the condition is false and this is a no-op — no payload
  * shuffle is added to the 100 TB path. */
object TinyInput {
  def parallelized(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val cap = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < math.min(target, cap)) df.repartition(target)
    else df
  }
}
