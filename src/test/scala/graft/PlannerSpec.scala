package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Record
import graft.operators.{AnnotationMode => M, Annotators}
import graft.plans.Planner

class PlannerSpec extends AnyFunSuite {

  test("dependency closures match the reference DAG (AnnotationMode.java:186-238)") {
    assert(Planner.chain(M.TOKEN) == Seq(M.TOKEN))
    assert(Planner.chain(M.POS) == Seq(M.TOKEN, M.POS))
    assert(Planner.chain(M.CHUNK) == Seq(M.TOKEN, M.POS, M.CHUNK))
    assert(Planner.chain(M.COREF) == Seq(M.TOKEN, M.POS, M.NER, M.COREF))
    assert(Planner.chain(M.VERB_SRL) == Seq(M.TOKEN, M.POS, M.CHUNK, M.PARSE, M.VERB_SRL))
    assert(Planner.chain(M.WIKI) == Seq(M.TOKEN, M.POS, M.CHUNK, M.NER, M.WIKI))
  }

  test("fromString is fuzzy like the reference (AnnotationModeTester.java)") {
    assert(M.fromString("TOKEN") == M.TOKEN)
    assert(M.fromString("tokenizer") == M.TOKEN)
    assert(M.fromString("tokens") == M.TOKEN)
    assert(M.fromString("part of speech") == M.POS)
    assert(M.fromString("named entity") == M.NER)
    assert(M.fromString("charniak") == M.PARSE)
    assert(M.fromString("stanford-parse") == M.STANFORD_PARSE)
    assert(M.fromString("verb srl") == M.VERB_SRL)
    assert(M.fromString("nom") == M.NOM_SRL)
    assert(M.fromString("wikifier") == M.WIKI)
    assertThrows[IllegalArgumentException](M.fromString("nonsense-xyz"))
  }

  test("planJobs prunes present annotations and fuses TOKEN/POS into CHUNK (JobHandler.java:264-331)") {
    // nothing present: CHUNK job subsumes TOKEN and POS
    assert(Planner.planJobs(M.CHUNK, Set.empty) == Seq(M.CHUNK))
    // POS target subsumes TOKEN
    assert(Planner.planJobs(M.POS, Set.empty) == Seq(M.POS))
    // SRL with nothing present: CHUNK fusion swallows TOKEN+POS, PARSE remains
    assert(Planner.planJobs(M.VERB_SRL, Set.empty) == Seq(M.CHUNK, M.PARSE, M.VERB_SRL))
    // with TOKEN+POS+CHUNK present only PARSE and SRL remain
    assert(Planner.planJobs(M.VERB_SRL, Set(M.TOKEN, M.POS, M.CHUNK)) ==
      Seq(M.PARSE, M.VERB_SRL))
    // forced start asserts deps present (JobHandler.java:273-285)
    assert(Planner.planJobs(M.VERB_SRL, Set.empty, forcedStart = Some(M.PARSE)) ==
      Seq(M.PARSE, M.VERB_SRL))
  }

  test("provide skips fresh views (CuratorHandler.provide work-skipping)") {
    val r0 = Record.fresh("the quick dog runs fast.")
    val once = Planner.provide(Annotators.registry, Planner.chain(M.POS), force = false)(r0)
    val twice = Planner.provide(Annotators.registry, Planner.chain(M.POS), force = false)(once)
    assert(once == twice, "second provide must be a no-op on fresh views")
  }

  test("forced start never overwrites foreign-tool upstream views (JobHandler.java:273-285)") {
    val r0 = Record.fresh("the quick dog runs fast.")
    val annotated = Planner.provide(Annotators.registry, Planner.chain(M.POS), force = false)(r0)
    // foreign tokenizer: different source string — normally stale, but a
    // forced start at POS asserts TOKEN present and must consume it as-is
    val foreign = annotated.copy(labelViews = annotated.labelViews.updatedWith("tokens")(
      _.map(l => l.copy(source = "other-tokenizer-2.1"))))
    val asserted = Planner.assertedPresent(M.POS, Some(M.POS))
    assert(asserted == Set(M.TOKEN))
    val out = Planner.provide(Annotators.registry, Planner.chain(M.POS), force = false, asserted)(foreign)
    assert(out.labelViews("tokens").source == "other-tokenizer-2.1",
      "forced-start-asserted views must not be recomputed")
    // a forced start outside the chain asserts nothing
    assert(Planner.assertedPresent(M.POS, Some(M.NER)).isEmpty)
  }

  test("stale dependency triggers sticky recompute cascade (CuratorHandler.java:1036-1045)") {
    val r0 = Record.fresh("the quick dog runs fast.")
    val annotated = Planner.provide(Annotators.registry, Planner.chain(M.POS), force = false)(r0)
    // simulate an old tokenizer version in the store
    val stale = annotated.copy(labelViews = annotated.labelViews.updatedWith("tokens")(
      _.map(l => l.copy(source = "graft-tokens-0.9"))))
    val repaired = Planner.provide(Annotators.registry, Planner.chain(M.POS), force = false)(stale)
    assert(repaired.labelViews("tokens").source == "graft-tokens-1.0",
      "stale tokens must recompute")
    assert(repaired.labelViews("pos") == annotated.labelViews("pos"),
      "pos must recompute too (sticky cascade), landing on the same value")
    // and a fresh chain on top of repaired is a no-op
    val again = Planner.provide(Annotators.registry, Planner.chain(M.POS), force = false)(repaired)
    assert(again == repaired)
  }

  test("dependents computes the inverted-DAG transitive closure (cascadeRemoveStaleFields)") {
    val d = Planner.dependents(Set(M.TOKEN))
    assert(d.contains(M.POS) && d.contains(M.CHUNK) && d.contains(M.VERB_SRL) &&
      d.contains(M.WIKI) && d.contains(M.COREF))
    assert(!d.contains(M.TOKEN) && !d.contains(M.NER) && !d.contains(M.SENTENCE))
    assert(Planner.dependents(Set(M.PARSE)) == Set(M.VERB_SRL, M.NOM_SRL))
  }
}
