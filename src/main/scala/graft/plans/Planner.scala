package graft.plans

import graft.model.Record
import graft.operators.{AnnotationMode, ViewOperator}

/** The dependency-chain planner (reference `JobHandler.determineDependencies`,
  * `infrastructure/JobHandler.java:264-331`, over the DAG of
  * `AnnotationMode.java:186-238`).
  *
  * The reference emits one MapReduce job per missing dependency level; in
  * Spark the whole chain is narrow `mapPartitions` stages on one lineage, so
  * the "plan" is simply the ordered operator list — whole-stage codegen fuses
  * it into a single pass (SURVEY.md §3 "Spark shape").
  *
  * Semantics preserved from the reference:
  *   - work-skipping: a view that exists and is fresh is not recomputed
  *     (`CuratorHandler.provide`, 1046-1050);
  *   - version staleness: a view is stale iff its `source` differs from the
  *     registered operator's source (`updateRequired`, 816-896);
  *   - sticky forceUpdate cascade: once any requirement is recomputed, every
  *     dependent later in the chain recomputes too (`provide`, 1036-1045);
  *   - forced-start pruning: a user-asserted starting annotation implies its
  *     dependencies are present (`JobHandler.java:273-285`);
  *   - fusion: CHUNK subsumes TOKEN+POS in one job (`JobHandler.java:310-318`)
  *     — in Spark every chain is one fused stage, so this is representational
  *     only (`planJobs` mirrors the reference's job list for observability).
  */
object Planner {

  /** Full topological chain for a target (dependencies first, target last). */
  def chain(target: AnnotationMode): Seq[AnnotationMode] = AnnotationMode.expand(target)

  /** The ordered list of *jobs* the reference would launch: the target's
    * dependency closure minus `present` views (or minus everything implied by
    * a forced start), with the TOKEN/POS-into-CHUNK fusion applied. */
  def planJobs(
      target: AnnotationMode,
      present: Set[AnnotationMode],
      forcedStart: Option[AnnotationMode] = None): Seq[AnnotationMode] = {
    val full = chain(target)
    val missing = forcedStart match {
      // forced start: everything before it in the dependency chain is
      // asserted present (JobHandler.java:273-285)
      case Some(start) if full.contains(start) => full.dropWhile(_ != start)
      // prune present views INCLUDING the target: a corpus that already
      // carries a fresh target view plans zero jobs (work-skipping at the
      // corpus level; the reference reaches the same end state by running
      // a job whose every record-level annotate is a skip)
      case _ => full.filterNot(present.contains)
    }
    // fusion rewrite: CHUNK's in-process handler also emits TOKEN and POS
    val fused =
      if (missing.contains(AnnotationMode.CHUNK))
        missing.filterNot(m => m == AnnotationMode.TOKEN || m == AnnotationMode.POS)
      else if (missing.contains(AnnotationMode.POS))
        missing.filterNot(_ == AnnotationMode.TOKEN)
      else missing
    fused
  }

  /** Apply a chain to one record with work-skipping + sticky-force cascade.
    * Pure per-record function — the engine maps it over partitions.
    * `assumeFresh` modes are never recomputed regardless of source-version
    * staleness — the forced-start assertion (`JobHandler.java:273-285`):
    * a view produced by a foreign tool (different source string) upstream of
    * the forced start must be consumed as-is, not overwritten. */
  def provide(
      registry: Map[AnnotationMode, ViewOperator],
      order: Seq[AnnotationMode],
      force: Boolean,
      assumeFresh: Set[AnnotationMode] = Set.empty)(r0: Record): Record = {
    var r = r0
    var dirty = Set.empty[AnnotationMode]
    for (m <- order) {
      if (!assumeFresh(m)) {
        val op = registry.getOrElse(m,
          throw new IllegalStateException(s"no operator registered for $m"))
        val depDirty = m.deps.exists(dirty)
        if (force || depDirty || !op.isFresh(r)) {
          r = op(r)
          dirty += m
        }
      }
    }
    r
  }

  /** Modes a forced start asserts present: everything strictly before the
    * start in the target's chain (`JobHandler.java:273-285`). Empty when the
    * start is absent from the chain. */
  def assertedPresent(target: AnnotationMode, forcedStart: Option[AnnotationMode]): Set[AnnotationMode] =
    forcedStart match {
      case Some(start) if chain(target).contains(start) =>
        chain(target).takeWhile(_ != start).toSet
      case _ => Set.empty
    }

  /** Transitive dependents of `modes` (inverted DAG) — the set whose views a
    * cascade invalidation must clear (`cascadeRemoveStaleFields`,
    * `CuratorHandler.java:600-644`). */
  def dependents(modes: Set[AnnotationMode]): Set[AnnotationMode] = {
    val inverted: Map[AnnotationMode, Seq[AnnotationMode]] =
      AnnotationMode.values.flatMap(m => m.deps.map(_ -> m))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var out = Set.empty[AnnotationMode]
    var frontier = modes
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(inverted.getOrElse(_, Nil)) -- out -- modes
      out ++= next
      frontier = next
    }
    out
  }
}
