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
    * backed by a materialized RDD. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Unpersist every RDD the context still tracks; returns how many were
    * released. Expected between independent queries in a long-lived
    * session: at that boundary anything still persisted is either a
    * documented checkpointed RESULT the caller has finished with, or a
    * leak (an operator violating the contract above — worth logging). */
  def releaseAll(spark: SparkSession): Int = {
    val rdds = spark.sparkContext.getPersistentRDDs
    rdds.values.foreach(_.unpersist(blocking = false))
    rdds.size
  }
}
