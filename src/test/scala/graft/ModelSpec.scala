package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.model._

class ModelSpec extends AnyFunSuite {

  test("identifier is sha1 of FLAG:whitespaced:rawText") {
    // known vector: sha1 of "FLAG:false:hello world"
    val id = Identifier.id("hello world", whitespaced = false)
    assert(id.matches("[0-9a-f]{40}"))
    assert(id == sha1Hex("FLAG:false:hello world"))
    assert(Identifier.id("hello world", whitespaced = true) ==
      sha1Hex("FLAG:true:hello world"))
  }

  test("identifier is content-addressed: same text same id, different text different id") {
    val prop = Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a: String, b: String) =>
      val ia = Identifier.id(a, whitespaced = false)
      ia == Identifier.id(a, whitespaced = false) &&
        ((a == b) || ia != Identifier.id(b, whitespaced = false))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("fresh record satisfies invariants") {
    val r = Record.fresh("some document text.")
    assert(Invariants.violations(r).isEmpty)
  }

  test("invariants catch out-of-bounds spans and bad tree tops") {
    val r = Record.fresh("abc")
    val bad = r.copy(labelViews = Map("tokens" ->
      Labeling(Seq(Span(0, 99, "x", 1.0, "s", Map.empty)), "s", 1.0)))
    assert(Invariants.violations(bad).exists(_.contains("out of bounds")))
    val badTree = r.copy(parseViews = Map("charniak" ->
      Forest(Seq(Tree(Nil, 3, 1.0)), "s")))
    assert(Invariants.violations(badTree).exists(_.contains("top")))
  }

  test("MultiRecord identity is content-addressed and member-order-free") {
    import graft.model.MultiRecord
    val a = MultiRecord.fresh(Seq("id2", "id1", "id3"))
    val b = MultiRecord.fresh(Seq("id1", "id3", "id2"))
    assert(a.identifier == b.identifier && a.recordIds == Seq("id1", "id2", "id3"))
    assert(a.identifier != MultiRecord.fresh(Seq("id1", "id2")).identifier)
    assert(a.viewNames.isEmpty)
  }

  test("empty rawText is an invariant violation (rejected at ingest)") {
    val r = Record("x", "", Map.empty, Map.empty, Map.empty, Map.empty, false)
    assert(Invariants.violations(r).nonEmpty)
  }

  private def sha1Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
}
