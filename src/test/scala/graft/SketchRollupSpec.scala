package graft

import org.apache.spark.sql.functions._

/** Mergeable-sketch rollup — the 100-TB pattern for distinct counting
  * over partitioned/incremental data: build an HLL sketch PER SHARD
  * (Spark 4's Apache DataSketches `hll_sketch_agg`), persist the
  * binary sketches, and answer global or sliced distinct-count
  * questions by MERGING sketches (`hll_union_agg`) — never rescanning
  * the shards. The estimate from merged per-shard sketches must equal
  * the estimate from one pass over the union (sketch merge is exact,
  * not approximate-on-approximate), which is what makes sketches
  * safe to materialize per partition/day and roll up later.
  *
  * Spec-only (no DuckDB oracle): sketch binaries are
  * implementation-defined; the driver's oracle can't replay them.
  * The q8b HLL entry pins Spark's approx_count_distinct against an
  * exact oracle; this pins the MERGE algebra.
  */
class SketchRollupSpec extends SparkSpec {
  import spark.implicits._

  test("merged per-shard HLL sketches equal the single-pass sketch estimate") {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), (col("event_id") % 8).as("shard"))
    // per-shard sketches (what a partitioned sink would persist)...
    val perShard = e.groupBy("shard")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    // ...rolled up by merging, never rescanning the data
    val merged = perShard.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[Long].head()
    val single = e.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .as[Long].head()
    assert(merged == single, s"merge must be lossless: $merged vs $single")
    // and the estimate is a real estimate of the true cardinality
    val exact = e.select("user_id").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact")
  }

  test("sliced rollup: any shard subset answers from its sketches alone") {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), (col("event_id") % 8).as("shard"))
    val perShard = e.groupBy("shard")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val subsetEst = perShard.filter(col("shard") < 4)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .as[Long].head()
    val subsetSingle = e.filter(col("shard") < 4)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .as[Long].head()
    assert(subsetEst == subsetSingle)
  }
}
