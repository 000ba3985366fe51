package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: per-query Spark JOB / STAGE / TASK counts plus wall.
  *
  * Round-18 instrumentation (verdict item 3/6): at sf0.1 many catalog
  * queries are fixed-overhead-bound, so wall-clock A/B sits under the
  * box's ±0.2 s noise floor — but a removed blocking action or a removed
  * exchange shows up EXACTLY in the job/stage count, which is noise-free.
  * Usage mirrors Bench: `runMain graft.JobProbe q_a q_b ...` (no args =
  * the full headline set), `SPARK_GRAFT_SF_DIR`/`SPARK_GRAFT_CPUS` as in
  * Bench. Each query runs twice (first run pays session memo/JIT; the
  * second run's counts are the steady-state shape) and prints one line:
  *
  *   [jobprobe] <name> jobs=J stages=S tasks=T wall=W   (cold: ...)
  *
  * Diagnostic only — never part of the driver artifact, no JSON contract.
  * Counts come from a SparkListener; the listener bus is asynchronous, so
  * a short quiesce wait follows each query before the counters are read
  * (at local scale the bus drains in milliseconds).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    System.setProperty("graft.bench.noSort", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })

    val unknown = args.toSeq.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val selected = if (args.isEmpty) Bench.headline else args.toSeq.distinct

    def runOnce(name: String): (Int, Int, Int, Double) = {
      Thread.sleep(200) // drain listener bus from the previous query
      val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
      val w0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - w0) / 1e9
      graft.plans.Checkpoints.releaseAll(spark)
      Thread.sleep(200)
      (jobs.get - j0, stages.get - s0, tasks.get - t0, wall)
    }

    // warmup: JIT + codegen + parquet footer caches, as in Bench
    runOnce("q1_agg")
    selected.foreach { n =>
      val cold = runOnce(n)
      val warm = runOnce(n)
      println(f"[jobprobe] $n%-28s jobs=${warm._1}%3d stages=${warm._2}%3d " +
        f"tasks=${warm._3}%5d wall=${warm._4}%6.2f  " +
        f"(cold: jobs=${cold._1}%3d stages=${cold._2}%3d wall=${cold._4}%6.2f)")
    }
    spark.stop()
  }
}
