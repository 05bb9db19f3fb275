package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.CheckpointStats

/** Lineage-cut policy for iterative plans.
  *
  * `localCheckpoint` keeps blocks in executor storage memory — fast,
  * but on a real cluster an executor loss (or memory-pressure
  * eviction) makes the job unrecoverable ("lineage truncated and
  * cannot be recomputed"). So: when a reliable checkpoint directory is
  * configured (`spark.graft.checkpointDir` conf or the
  * `SPARK_GRAFT_CHECKPOINT_DIR` env var), cut lineage with a reliable
  * `checkpoint()` to that directory; otherwise fall back to
  * `localCheckpoint` as the local-mode fast path. Every iterative
  * operator routes through [[cut]], so the policy is one switch.
  */
object Ckpt {
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val dir = Option(spark.conf.get("spark.graft.checkpointDir", null))
      .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
    // withFreshStats: replace the inherited (geometrically compounding
    // across self-join rounds) size estimate with the checkpoint's
    // real materialized size — see graftbridge.CheckpointStats.
    dir match {
      case Some(d) if d.nonEmpty =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(d)
        CheckpointStats.withFreshStats(df.checkpoint(eager = true))
      case _ => CheckpointStats.withFreshStats(df.localCheckpoint(eager = true))
    }
  }
}
