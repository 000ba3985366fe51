package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.operators.{AnnotationMode => M, Annotators => A}
import graft.plans.Planner

class AnnotatorsSpec extends AnyFunSuite {

  private val text = "The Quick Dog runs fast. It jumped over 2 lazy cats!"
  private def annotated(target: M): Record =
    Planner.provide(A.registry, Planner.chain(target), force = false)(Record.fresh(text))

  test("tokenizer: spans reconstruct their surface text and are in order") {
    val r = annotated(M.TOKEN)
    val toks = r.labelViews("tokens").labels
    assert(toks.nonEmpty)
    for (t <- toks) assert(text.substring(t.start, t.ending) == t.label)
    assert(toks.sliding(2).forall { case Seq(a, b) => a.ending <= b.start; case _ => true })
    assert(Invariants.violations(r).isEmpty)
  }

  test("tokenizer: Unicode space chars are SYM tokens, exactly like the regex (\\s is ASCII)") {
    // U+2003 EM SPACE, U+1680 OGHAM SPACE MARK, U+001C FILE SEPARATOR:
    // Character.isWhitespace says true, but regex \s (Java and RE2 alike)
    // is ASCII-only — TokenPattern emits them as single SYM tokens, and so
    // must the hand-rolled scanner, or token counts (and every downstream
    // POS/NER oracle) silently diverge from DuckDB on such inputs.
    for (t <- Seq("a\u2003b", "a\u1680b", "a\u001cb", "x\u2028y\u3000z")) {
      val scanned = A.tokenSpans(t, "t").map(_.label)
      val regex = A.TokenPattern.findAllIn(t).toSeq
      assert(scanned == regex, s"scanner $scanned != regex $regex for ${t.map(_.toInt)}")
    }
    // ASCII \s chars are still separators, not tokens
    assert(A.tokenSpans("a b\tcd", "t").map(_.label) == Seq("a", "b", "c", "d"))
  }

  test("tokenizer: fused sentences view (reference multilabeler emits both)") {
    val r = annotated(M.TOKEN)
    val sents = r.labelViews("sentences").labels
    assert(sents.size == 2)
    assert(text.substring(sents(0).start, sents(0).ending) == "The Quick Dog runs fast.")
    assert(text.substring(sents(1).start, sents(1).ending) == "It jumped over 2 lazy cats!")
  }

  test("whitespaced (ws*) path splits on whitespace only (CuratorHandler.wsprovide)") {
    val r = Planner.provide(A.registry, Seq(M.TOKEN), force = false)(
      Record.fresh("alpha beta. gamma", whitespaced = true))
    val toks = r.labelViews("tokens").labels.map(_.label)
    assert(toks == Seq("alpha", "beta.", "gamma"))
    assert(r.labelViews("sentences").labels.size == 1)
  }

  test("pos: one tag per token, deterministic rules") {
    val r = annotated(M.POS)
    val toks = r.labelViews("tokens").labels
    val pos = r.labelViews("pos").labels
    assert(pos.size == toks.size)
    val tags = pos.map(_.label)
    assert(tags.contains("DT"))   // The
    assert(tags.contains("CD"))   // 2
    assert(tags.contains("SYM"))  // . !
    assert(A.PosTagger.tag("quickly") == "RB")
    assert(A.PosTagger.tag("jumped") == "VBD")
    assert(A.PosTagger.tag("running") == "VBG")
    assert(A.PosTagger.tag("The") == "DT")
    assert(A.PosTagger.tag("Dog") == "NNP")
    assert(A.PosTagger.tag("cats") == "NNS")
  }

  test("chunk: contiguous NP/VP spans over token groups") {
    val r = annotated(M.CHUNK)
    val chunks = r.labelViews("chunk").labels
    assert(chunks.nonEmpty)
    assert(chunks.forall(c => c.label == "NP" || c.label == "VP"))
    assert(chunks.exists(c => c.label == "NP" &&
      text.substring(c.start, c.ending).contains("The Quick Dog")))
  }

  test("ner: capitalized runs and cardinals") {
    val r = annotated(M.NER)
    val ner = r.labelViews("ner").labels
    val surfaces = ner.map(s => text.substring(s.start, s.ending))
    assert(surfaces.contains("The Quick Dog"))
    assert(ner.exists(s => s.label == "CARDINAL" && text.substring(s.start, s.ending) == "2"))
  }

  test("ner-ext: extended ontology rides next to the base view") {
    val t2 = "Alice met Acme Corp in January 1995 buying 7 units id 12345678"
    val r = graft.operators.Annotators.NerExtTagger(Record.fresh(t2))
    assert(r.labelViews.contains("ner"), "base view must ride along")
    val ext = r.labelViews("ner-ext").labels
    def surf(s: graft.model.Span) = t2.substring(s.start, s.ending)
    assert(ext.exists(s => s.label == "PERSON" && surf(s) == "Alice"))
    assert(ext.exists(s => s.label == "ORG" && surf(s) == "Acme Corp"))
    assert(ext.exists(s => s.label == "DATE" && surf(s) == "January"))
    assert(ext.exists(s => s.label == "DATE" && surf(s) == "1995"))
    assert(ext.exists(s => s.label == "CARDINAL" && surf(s) == "7"))
    assert(ext.exists(s => s.label == "ID" && surf(s) == "12345678"))
    // distinct source: never mistaken for a fresh base "ner"
    assert(r.viewSource("ner-ext") != r.viewSource("ner"))
  }

  test("parse: one tree per sentence, valid top and child indices") {
    val r = annotated(M.PARSE)
    val forest = r.parseViews("charniak")
    assert(forest.trees.size == 2)
    for (t <- forest.trees) {
      assert(t.top == 0 && t.nodes.nonEmpty)
      assert(t.nodes.head.label == "S")
      for (n <- t.nodes; k <- n.children.keys) assert(k >= 0 && k < t.nodes.size)
    }
    assert(Invariants.violations(r).isEmpty)
  }

  test("stanford parser emits two views from one operator (multiparser)") {
    val r = annotated(M.STANFORD_PARSE)
    assert(r.parseViews.contains("stanfordParse"))
    assert(r.parseViews.contains("stanfordDep"))
    val dep = r.parseViews("stanfordDep").trees.head
    assert(dep.nodes(dep.top).children.values.forall(_ == "dep"))
  }

  test("coref: clusters group same-surface mentions") {
    val text2 = "Alice met Bob. Alice paid Bob."
    val r = Planner.provide(A.registry, Planner.chain(M.COREF), force = false)(
      Record.fresh(text2))
    val clusters = r.clusterViews("coref").clusters
    assert(clusters.size == 2) // {Alice, Alice}, {Bob, Bob}
    assert(clusters.forall(_.labels.size == 2))
  }

  test("verb srl: predicate-argument trees with ARG0/ARG1 roles") {
    val r = annotated(M.VERB_SRL)
    val forest = r.parseViews("srl")
    assert(forest.trees.nonEmpty)
    for (t <- forest.trees) {
      assert(t.nodes(t.top).label == "PRED")
      assert(t.nodes(t.top).children.values.toSet.subsetOf(Set("ARG0", "ARG1")))
    }
  }

  test("wikifier: ner spans carry title/url attributes (span attribute map)") {
    val r = annotated(M.WIKI)
    val spans = r.labelViews("wikifier").labels
    assert(spans.nonEmpty)
    val s = spans.find(s => text.substring(s.start, s.ending) == "The Quick Dog").get
    assert(s.attributes("title") == "The_Quick_Dog")
    assert(s.attributes("url").endsWith("/The_Quick_Dog"))
  }

  test("operators fail loudly on missing dependencies (failure taxonomy)") {
    val bare = Record.fresh("no views here")
    assertThrows[graft.operators.AnnotationFailedException](A.PosTagger(bare))
    assertThrows[graft.operators.AnnotationFailedException](A.VerbSrl(bare))
  }

  test("every registered operator keeps rawText intact (D17 intent)") {
    for (m <- M.values) {
      val r = Planner.provide(A.registry, Planner.chain(m), force = false)(Record.fresh(text))
      assert(r.rawText == text, s"$m changed rawText")
      assert(Invariants.violations(r).isEmpty, s"$m violated invariants")
    }
  }
}
