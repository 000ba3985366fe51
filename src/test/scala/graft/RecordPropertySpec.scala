package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.model._
import graft.sources.ThriftCompat

/** ScalaCheck round-trip properties over randomly generated Records
  * (SURVEY.md §5: "random Records, write∘read == id"), modeled on the
  * reference's DummyInputCreator-style synthetic corpora. */
class RecordPropertySpec extends SparkSpec {

  private val genText: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.const("the"), Gen.const("Dog"),
      Gen.const("42"), Gen.const("."))).map(_.mkString(" ")).suchThat(_.nonEmpty)

  private def genSpan(len: Int): Gen[Span] = for {
    start <- Gen.choose(0, math.max(0, len - 2))
    end <- Gen.choose(start + 1, len)
    label <- Gen.alphaStr
    score <- Gen.choose(0.0, 1.0)
    src <- Gen.identifier
    attrs <- Gen.mapOfN(2, Gen.zip(Gen.identifier, Gen.identifier))
  } yield Span(start, end, label, score, src, attrs)

  private val genRecord: Gen[Record] = for {
    text <- genText
    ws <- Gen.oneOf(true, false)
    nSpans <- Gen.choose(0, 5)
    spans <- Gen.listOfN(nSpans, genSpan(text.length))
    src <- Gen.identifier
    withCluster <- Gen.oneOf(true, false)
    withTree <- Gen.oneOf(true, false)
  } yield {
    val base = Record.fresh(text, ws)
    val lab = Map("tokens" -> Labeling(spans.toVector, src, 1.0))
    val clu = if (withCluster)
      Map("coref" -> Clustering(Vector(Labeling(spans.toVector, src, 0.5)), src, 1.0))
    else Map.empty[String, Clustering]
    val par = if (withTree && spans.nonEmpty)
      Map("charniak" -> Forest(Vector(Tree(
        spans.toVector.zipWithIndex.map { case (s, i) =>
          TreeNode(s.label, s, if (i == 0) Map(1 -> "e").filter(_ => spans.size > 1) else Map.empty, 1.0)
        }, 0, 1.0)), src))
    else Map.empty[String, Forest]
    base.copy(labelViews = lab, clusterViews = clu, parseViews = par)
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  test("JSONL interchange round-trip is the identity on arbitrary unicode strings") {
    // one Spark job over a generated corpus beats one job per ScalaCheck
    // case: sample a batch of arbitrary strings (full unicode, including
    // surrogate-pair and control-char cases the nasty-string spec pins
    // by hand), round-trip them through writeJsonl/readJsonl, compare
    import spark.implicits._
    val batch = Gen.listOfN(200, org.scalacheck.Arbitrary.arbitrary[String])
      .sample.get.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-prop").toString + "/t"
    graft.sources.Sources.writeJsonl(batch.toDF("doc_id", "text"), dir)
    val back = graft.sources.Sources.readJsonl(spark, dir,
        org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val expected = batch.toMap
    assert(back == expected,
      s"JSONL round trip diverged on ${expected.count(kv => back.get(kv._1) != Some(kv._2))} of ${expected.size} strings")
  }

  test("thrift codec round-trip is the identity on random records") {
    check(Prop.forAll(genRecord) { r =>
      ThriftCompat.readRecord(ThriftCompat.writeRecord(r)) == r
    })
  }

  test("generated records satisfy the structural invariants") {
    check(Prop.forAll(genRecord) { r => Invariants.violations(r).isEmpty })
  }

  test("parquet store round-trip is the identity on a random corpus") {
    import spark.implicits._
    val recs = Gen.listOfN(30, genRecord).sample.get
      .groupBy(_.identifier).values.map(_.head).toSeq // content-dedup like ingest
    val out = java.nio.file.Files.createTempDirectory("graft-prop").toString + "/t"
    spark.createDataset(recs).write.parquet(out)
    val back = spark.read.parquet(out).as[Record].collect()
    assert(back.sortBy(_.identifier).toSeq == recs.sortBy(_.identifier))
  }

  test("sql registration: rolling_hash/min_window_hash callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT rolling_hash('abc') AS a, min_window_hash('abc', 32) AS b").head()
    // 'abc' shorter than the window: both hash the whole string
    val expected = "abc".getBytes("UTF-8")
      .foldLeft(0L)((h, b) => h * graft.functions.RollingHash.Base + (b & 0xffL))
    assert(r.getLong(0) == expected && r.getLong(1) == expected)
  }

  test("sql registration: signature expressions callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash_text('a b c', true) AS sh,
        |  size(minhash_sig('a b c d', 16, true)) AS mh,
        |  size(shingle_hashes('a b c d', true)) AS sg,
        |  vec_dot(array(1D, 2D), array(3D, 4D)) AS vd""".stripMargin).head()
    assert(r.getLong(0) != 0L)
    assert(r.getInt(1) == 16)
    assert(r.getInt(2) == 2) // "a b c d" has two distinct 3-gram shingles
    assert(r.getDouble(3) == 11.0)
  }

  test("sql registration: arity checked with a usable message; foldable args accepted") {
    graft.functions.GraftFunctions.register(spark)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val e = intercept[Throwable](spark.sql("SELECT minhash_sig('abc')").head())
    assert(messages(e).exists(_.contains("minhash_sig expects 3 arguments")),
      s"raw index error leaked: ${messages(e)}")
    val e2 = intercept[Throwable](spark.sql("SELECT rolling_hash('a', 'b')").head())
    assert(messages(e2).exists(_.contains("rolling_hash expects 1 argument")))
    // foldable non-literal constants fold like Spark's own builtins
    val r = spark.sql(
      "SELECT size(minhash_sig('a b c d', 8 * 4, 1 = 1)) AS n, " +
        "min_window_hash('abcdefgh', CAST(2 AS INT) + 2) IS NOT NULL AS ok").head()
    assert(r.getInt(0) == 32 && r.getBoolean(1))
  }

  test("multimodal stub decoder survives the Int-overflow payload boundary") {
    // payload.length * 31 exceeds Int.MaxValue beyond ~69.3 MB; the stub
    // must match the oracle's BIGINT arithmetic there, not wrap
    val n = Int.MaxValue / 31 + 17
    val m = graft.operators.Multimodal.stubDecoder(new Array[Byte](n))
    assert(m.nBytes == n && m.width == n % 640 + 1)
    assert(m.height == ((n.toLong * 31L) % 480L + 1L).toInt)
    assert(m.height != (n * 31) % 480 + 1,
      "boundary payload no longer distinguishes Long from Int arithmetic")
  }
}
