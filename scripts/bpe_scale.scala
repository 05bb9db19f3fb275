// BPE training scale probe (round 10): train 8192 merges over the
// large-vocabulary corpus and record per-block wall time -- the proof
// that train()'s periodic lineage cut keeps time LINEAR in rounds
// (no analyzer blowup, no O(n^2) replace-chain re-evaluation).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --driver-class-path target/scala-2.13/classes \
//   -i scripts/bpe_scale.scala  (corpus from scripts/make_bpe_corpus.py)
import org.apache.spark.sql.functions._

val dir = sys.env.getOrElse("BPE_DIR", "/tmp/bpedocs")
val total = sys.env.getOrElse("BPE_MERGES", "8192").toInt
val block = 512
spark.sparkContext.setLogLevel("ERROR")
val docs = spark.read.parquet(s"$dir/documents.parquet")
println(s"BPE corpus: ${docs.count()} docs, vocab " +
  docs.select(explode(expr("filter(split(text, ' '), x -> x != '')")).as("w"))
    .select("w").distinct().count())

// train in one call; block timings come from a wrapper that trains
// incrementally by calling train() once and timing inside is not
// exposed, so time SEPARATE runs at increasing merge counts instead:
// linear wall time in rounds <=> t(2n) ~ 2*t(n).
// probe conf: local[8] + wholeStage=false -- per-round work is
// vocabulary-tiny, so codegen COMPILATION (a fresh plan every round)
// dominates; interpreted eval halves round latency at this scale.
// On a real cluster with 10^7-row vocabularies the data dominates
// and codegen wins again -- this is a probe-only knob.
for (n <- Seq(1024, 2048, total)) {
  val t0 = System.nanoTime()
  val (merges, seg) = graft.operators.Bpe.train(docs, "text", n, ckptEvery = 16)
  val secs = (System.nanoTime() - t0) / 1e9
  val distinctPairs = merges.map(m => (m.a, m.b)).distinct.size
  println(f"BPE n=$n%6d merges=${merges.size}%6d distinct=$distinctPairs%6d " +
    f"time=$secs%8.1fs per_round=${secs / merges.size * 1000}%6.1fms")
  assert(merges.size == n, s"exhausted early at ${merges.size}")
  assert(distinctPairs == n, "duplicate merge emitted")
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  System.gc(); Thread.sleep(2000)
}
println("BPE_SCALE_DONE")
sys.exit(0)
