package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Persist-lifecycle management for operators that `localCheckpoint` /
  * `persist` intermediate frames (SURVEY.md §2a D13/D14 job-chaining
  * semantics; the reference relies on HDFS job boundaries to free
  * intermediate state — `JobHandler.java:264-331` — while a long-lived
  * Spark session keeps every checkpointed block pinned until told
  * otherwise).
  *
  * The library contract: an operator that materializes internal frames
  * releases every block it no longer references before returning; a
  * RETURNED frame that is itself checkpointed is documented at the
  * operator, and callers release it with [[release]] when done. A
  * long-lived session (a bench harness, a multi-query cluster driver)
  * sweeps stragglers between queries with [[releaseAll]] — round 4
  * measured 1.6-4.5x slowdowns on every query scheduled after an
  * operator that leaked its checkpoints.
  */
object Checkpoints {

  /** Release the storage blocks behind a `localCheckpoint`ed (or
    * otherwise RDD-backed) frame. After this the frame CANNOT be
    * recomputed — local checkpoints truncate lineage by design — so only
    * call it on frames no consumer will touch again. No-op for plans not
    * backed by a materialized RDD.
    *
    * CONTRACT: the frame must be the SOLE remaining consumer view of its
    * checkpoint — either the materialized node itself (what
    * `localCheckpoint()` returns) or a thin projection over exactly one
    * (the shape operators return after a final column rename). A plan
    * sweeping MORE than one distinct checkpoint is rejected outright:
    * that is a frame built by joining/unioning several checkpointed
    * ancestors, and blindly unpersisting them would irreversibly destroy
    * blocks other consumers may still need — lineage is truncated, so
    * they fail instead of recomputing. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case other =>
        // distinct CHECKPOINTS, not LogicalRDD nodes: a self-join/union
        // of one checkpointed frame (the bidir() shape) nests several
        // plan nodes that all share a single persisted RDD — legal
        val nested = other.collect { case l: LogicalRDD => l.rdd }
          .groupBy(_.id).map(_._2.head).toSeq
        require(nested.size <= 1,
          s"release() requires a frame backed by a single checkpoint, but " +
            s"this plan spans ${nested.size} distinct checkpointed RDDs — " +
            "a frame combining several checkpointed ancestors whose " +
            "blocks may back other live consumers. Release each original " +
            "checkpointed frame individually instead.")
        nested.foreach(_.unpersist(blocking = false))
    }

  /** Unpersist every RDD the context still tracks; returns one
    * `id=… name=…` descriptor per released RDD so a leak is
    * attributable to the operator that persisted it. Expected between
    * independent queries in a long-lived session: at that boundary
    * anything still persisted is either a documented checkpointed RESULT
    * the caller has finished with, or a leak (an operator violating the
    * contract above — worth logging). */
  def releaseAll(spark: SparkSession): Seq[String] = {
    val rdds = spark.sparkContext.getPersistentRDDs
    rdds.values.foreach(_.unpersist(blocking = false))
    rdds.map { case (id, r) =>
      s"id=$id name=${Option(r.name).getOrElse(r.toString.takeWhile(_ != ' '))}"
    }.toSeq
  }
}
