package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.execution.LogicalRDD

/** Fresh, bounded statistics for checkpointed frames.
  *
  * `Dataset.checkpoint`/`localCheckpoint` attach the ORIGIN plan's
  * estimated statistics to the resulting `LogicalRDD` leaf. Catalyst's
  * size-only join estimate multiplies the children's `sizeInBytes`,
  * so an iterative self-join loop compounds the inherited estimate
  * geometrically — a 3-way self-join per round cubes it every round,
  * and by round ~12 the `sizeInBytes` BigInt has millions of digits.
  * At that point the DRIVER burns unbounded CPU inside
  * `BigInteger.multiply` during planning (observed: a connected-
  * components round that executes in ~1s spending 40+ minutes in
  * stats estimation).
  *
  * [[withFreshStats]] rebuilds the leaf with REAL stats: the
  * materialized block sizes from the block manager (the checkpoint
  * just ran eagerly, so blocks exist), falling back to a 1 TiB cap
  * when storage info is unavailable (e.g. reliable checkpoints on
  * disk). Either way the estimate is grounded per round instead of
  * compounding across rounds. Lives under `org.apache.spark.sql` for
  * the `private[sql]` `Dataset.ofRows` constructor.
  */
object CheckpointStats {
  private val Cap = BigInt(1L) << 40 // 1 TiB: never-broadcast, never-compounding

  def withFreshStats(cp: DataFrame): DataFrame = {
    val classic = cp.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    classic.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val spark = classic.sparkSession
        val measured = spark.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => BigInt(i.memSize + i.diskSize))
          .filter(_ > 0)
        val stats = Statistics(sizeInBytes = measured.getOrElse(Cap).min(Cap).max(1))
        org.apache.spark.sql.classic.Dataset.ofRows(spark,
          new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(spark, Some(stats), None))
      case _ => cp
    }
  }
}
