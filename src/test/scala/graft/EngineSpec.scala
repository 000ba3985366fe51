package graft

import java.nio.file.Files

import graft.model._
import graft.operators.{AnnotationMode => M, Annotators, ViewOperator}
import graft.plans.AnnotationEngine
import graft.sources.Sources

class EngineSpec extends SparkSpec {

  private lazy val docs: Seq[String] = Seq(
    "The quick brown fox jumps over the lazy dog.",
    "Alice met Bob in Paris. They visited the Louvre museum!",
    "Numbers like 42 and 7 are tokens too.",
    "One more short document?")

  private def corpus = {
    import spark.implicits._
    val ds = spark.createDataset(docs.map(t => Record.fresh(t)))
    ds.repartition(2)
  }

  test("end-to-end: ingest -> TOKEN -> parquet -> read back -> spans reconstruct text") {
    val out = Files.createTempDirectory("graft-e2e").toString + "/records"
    val annotated = AnnotationEngine.default.annotate(corpus, M.TOKEN)
    Sources.writeRecords(annotated, out, idPrefixPartitions = true)
    val back = Sources.readRecords(spark, out).collect()
    assert(back.length == docs.size)
    for (r <- back; t <- r.labelViews("tokens").labels)
      assert(r.rawText.substring(t.start, t.ending) == t.label)
    assert(back.forall(Invariants.valid))
  }

  test("annotate to WIKI fills the whole dependency chain in one pass") {
    val r = AnnotationEngine.default.annotate(corpus, M.WIKI).collect().head
    assert(Set("tokens", "sentences", "pos", "chunk", "ner", "wikifier")
      .subsetOf(r.viewNames))
  }

  test("annotation plan is shuffle-free (no exchange in the physical plan)") {
    import spark.implicits._
    // plain source (no repartition in the fixture lineage)
    val src = spark.createDataset(docs.map(t => Record.fresh(t)))
    val annotated = AnnotationEngine.default.annotate(src, M.VERB_SRL)
    val plan = annotated.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"annotation chain must not shuffle, got:\n$plan")
  }

  test("idempotence: annotating twice equals annotating once (work-skipping)") {
    val eng = AnnotationEngine.default
    val once = eng.annotate(corpus, M.POS).collect().sortBy(_.identifier)
    val twice = eng.annotate(eng.annotate(corpus, M.POS), M.POS)
      .collect().sortBy(_.identifier)
    assert(once.toSeq == twice.toSeq)
  }

  test("commonAnnotations: intersection of view-name sets (D10)") {
    val eng = AnnotationEngine.default
    import spark.implicits._
    val mixed = eng.annotate(corpus, M.POS)
      .union(spark.createDataset(Seq(Record.fresh("extra doc with no views"))))
    assert(eng.commonAnnotations(mixed, sampleK = 25) == Set.empty)
    val uniform = eng.annotate(corpus, M.POS)
    assert(eng.commonAnnotations(uniform, sampleK = 25) ==
      Set("tokens", "sentences", "pos"))
  }

  test("planForCorpus prunes already-present views (D12 sampling planner)") {
    val eng = AnnotationEngine.default
    val posDone = eng.annotate(corpus, M.POS)
    assert(eng.planForCorpus(posDone, M.VERB_SRL) == Seq(M.CHUNK, M.PARSE, M.VERB_SRL))
  }

  test("verify: per-view diff flags a mismatching view (D16)") {
    val eng = AnnotationEngine.default
    val a = eng.annotate(corpus, M.POS)
    val rows = eng.verify(a, a).collect()
    assert(rows.nonEmpty && rows.forall(_._3), "self-verify must match")
    // tamper with one view on one record
    import spark.implicits._
    val tampered = a.map { r =>
      if (r.rawText.startsWith("Alice"))
        r.copy(labelViews = r.labelViews.updatedWith("pos")(
          _.map(l => l.copy(score = 0.5))))
      else r
    }
    val diff = eng.verify(a, tampered).collect()
    assert(diff.count(row => !row._3) == 1)
    assert(diff.find(row => !row._3).get._2 == "pos")
  }

  test("textConsistent: levenshtein tolerance (D17)") {
    val eng = AnnotationEngine.default
    import spark.implicits._
    val before = corpus
    val after = corpus.map(r => r.copy(rawText = r.rawText + "x")) // id unchanged on purpose? no -
    // keep identifier stable so the join pairs rows (consistency check is about text drift)
    val rows = eng.textConsistent(before, after).collect()
    assert(rows.forall(_._2), "1-char drift is within tolerance 10")
  }

  test("open registry admits dynamic views (the reference 'mention' demo)") {
    object MentionOp extends ViewOperator {
      val mode = M.NER // reuse a slot's deps; writes a dynamic view name
      val version = "9.9"
      def apply(r: Record): Record =
        r.copy(labelViews = r.labelViews + ("mention" ->
          Labeling(Seq(Span(0, r.rawText.length, "mention", 1.0, source, Map.empty)),
            source, 1.0)))
    }
    val eng = AnnotationEngine.default.withOperator(MentionOp)
    val r = eng.annotate(corpus, M.NER).collect().head
    assert(r.labelViews.contains("mention"))
  }

  test("archive lookup prefers stored annotated records (D15)") {
    val eng = AnnotationEngine.default
    val store = eng.annotate(corpus, M.POS)
    val incoming = corpus
    val out = Sources.lookup(incoming, store).collect()
    assert(out.forall(_.labelViews.contains("pos")), "stored records must win")
  }

  test("archive upsert keeps the record with more views (D14)") {
    val eng = AnnotationEngine.default
    val store = eng.annotate(corpus, M.TOKEN)
    val updates = eng.annotate(corpus, M.POS)
    val merged = Sources.upsert(store, updates).collect()
    assert(merged.length == docs.size)
    assert(merged.forall(_.labelViews.contains("pos")), "richer update must win")
    // and the reverse: poorer update loses
    val kept = Sources.upsert(updates, store).collect()
    assert(kept.forall(_.labelViews.contains("pos")), "richer stored must survive")
  }

  test("groupCorpus collects member ids into content-addressed MultiRecords") {
    import spark.implicits._
    val recs = Seq("alpha doc one.", "beta doc two.", "alpha doc three.")
      .map(graft.model.Record.fresh(_))
    val ds = spark.createDataset(recs)
    val groups = graft.plans.AnnotationEngine.default
      .groupCorpus(ds, r => if (r.rawText.startsWith("alpha")) "a" else "b")
      .collect().toMap
    assert(groups.keySet == Set("a", "b"))
    assert(groups("a").recordIds.size == 2 && groups("b").recordIds.size == 1)
    // identity equals a locally built MultiRecord over the same members
    val expected = graft.model.MultiRecord.fresh(
      recs.filter(_.rawText.startsWith("alpha")).map(_.identifier))
    assert(groups("a").identifier == expected.identifier)
  }
}
