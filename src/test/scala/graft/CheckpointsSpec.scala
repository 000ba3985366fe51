package graft

import org.apache.spark.sql.functions._

/** Persist-lifecycle contract of [[graft.plans.Checkpoints]] (round-5
  * advisory: release() swept EVERY LogicalRDD in a derived plan, so
  * releasing a frame built from several checkpointed ancestors could
  * destroy blocks other consumers still needed — truncated lineage
  * fails instead of recomputing). */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("release drops the checkpoint root and a single-checkpoint projection") {
    graft.plans.Checkpoints.releaseAll(spark)
    val ck = Seq(1L, 2L, 3L).toDF("x").localCheckpoint(true)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    graft.plans.Checkpoints.release(ck)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "root release must unpersist the checkpoint's blocks")

    // the operator-return shape: a thin projection over ONE checkpoint
    val ck2 = Seq(4L, 5L).toDF("x").localCheckpoint(true)
    val view = ck2.select(col("x").as("y"))
    graft.plans.Checkpoints.release(view)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "single-checkpoint projection release must unpersist the ancestor")
  }

  test("release accepts a self-union of ONE checkpoint (the bidir shape)") {
    // several LogicalRDD plan nodes sharing a single persisted RDD are
    // one checkpoint, not several — the star-clustering bidir() shape;
    // counting nodes instead of distinct RDD ids spuriously rejected it
    graft.plans.Checkpoints.releaseAll(spark)
    val ck = Seq((1L, 2L)).toDF("u", "v").localCheckpoint(true)
    val bidir = ck.select(col("u").as("src")).union(ck.select(col("v").as("src")))
    graft.plans.Checkpoints.release(bidir)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "self-union of one checkpoint must release its single RDD")
  }

  test("release REFUSES a frame spanning several checkpoints") {
    graft.plans.Checkpoints.releaseAll(spark)
    val a = Seq((1L, "a")).toDF("k", "va").localCheckpoint(true)
    val b = Seq((1L, "b")).toDF("k", "vb").localCheckpoint(true)
    val joined = a.join(b, "k")
    intercept[IllegalArgumentException] {
      graft.plans.Checkpoints.release(joined)
    }
    // and critically: the refusal left BOTH ancestors' blocks intact
    assert(spark.sparkContext.getPersistentRDDs.size == 2,
      "a refused release must not unpersist anything")
    assert(joined.count() == 1, "ancestors must still be readable")
    graft.plans.Checkpoints.releaseAll(spark)
  }

  test("releaseAll reports one attributable descriptor per released RDD") {
    graft.plans.Checkpoints.releaseAll(spark)
    Seq(1L).toDF("x").localCheckpoint(true)
    val released = graft.plans.Checkpoints.releaseAll(spark)
    assert(released.size == 1 && released.head.startsWith("id="),
      s"descriptor must carry the RDD id: $released")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
