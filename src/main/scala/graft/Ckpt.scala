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
    // real materialized size — see graftbridge.CheckpointStats. An
    // exact row count rides the SAME materialization action as an
    // observe metric (no extra job): for all-fixed-width schemas
    // count × UnsafeRow width is the frame's true byte size, so a
    // genuinely small per-round state broadcasts in its next join
    // instead of inheriting the block manager's java-object-inflated
    // memSize (measured ~9× on 2-long label rows: 12.6 MB reported
    // for a 1.4 MB frame — just over the broadcast threshold, turning
    // every per-round self-join into a 2-exchange sort-merge join).
    val rowObs = if (df.isStreaming) None
      else Some(org.apache.spark.sql.Observation())
    val observed = rowObs.map(o => df.observe(o,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))).getOrElse(df)
    dir match {
      case Some(d) if d.nonEmpty =>
        // setCheckpointDir appends a session UUID; re-point only when
        // the configured ROOT actually changed (comparing path-only,
        // since SparkContext stores a scheme-qualified URI).
        val want = new org.apache.hadoop.fs.Path(d).toUri.getPath
        val engaged = spark.sparkContext.getCheckpointDir
          .exists(c => new org.apache.hadoop.fs.Path(c).toUri.getPath.startsWith(want))
        if (!engaged) spark.sparkContext.setCheckpointDir(d)
        CheckpointStats.withFreshStats(observed.checkpoint(eager = true),
          rowObs.flatMap(o => CheckpointStats.observedCount(o)))
      case _ =>
        CheckpointStats.withFreshStats(observed.localCheckpoint(eager = true),
          rowObs.flatMap(o => CheckpointStats.observedCount(o)))
    }
  }

  /** [[cut]] elided when the frame is ALREADY a materialized
    * checkpoint leaf (or a bare column projection over one):
    * re-checkpointing re-writes the whole frame — at cluster scale a
    * redundant full pass of the edge table to the checkpoint
    * filesystem every time composed operators (transitive-reduce →
    * tip-clip → bubble-remove → unitigs) hand each other frames their
    * previous stage just materialized. Only for stage-boundary cuts
    * whose frames are never released mid-operator; iterative rounds
    * keep plain [[cut]] so release() bookkeeping stays
    * one-frame-per-checkpoint.
    */
  def cutLight(df: DataFrame): DataFrame =
    if (isMaterializedLeaf(df.queryExecution.analyzed)) df else cut(df)

  private def isMaterializedLeaf(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = p match {
    case org.apache.spark.sql.catalyst.plans.logical.Project(pl, child)
        if pl.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference]) =>
      isMaterializedLeaf(child)
    case lr: org.apache.spark.sql.execution.LogicalRDD =>
      lr.rdd.isCheckpointed // true for reliable AND local checkpoints
    case _ => false
  }

  /** Free the storage behind a frame produced by [[cut]] once a later
    * round has materialized and the frame can never be read again:
    * reliable-checkpoint files are deleted (Spark itself never cleans
    * them — a 64-round loop would otherwise keep 64 full copies on
    * the checkpoint filesystem) and local-checkpoint blocks are
    * unpersisted. No-op on non-checkpoint frames; never throws.
    */
  def release(df: DataFrame): Unit = CheckpointStats.release(df)
}
