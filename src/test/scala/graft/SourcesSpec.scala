package graft

import java.nio.file.{Files, Paths}

import graft.model.{Identifier, Record}
import graft.sources.Sources

class SourcesSpec extends SparkSpec {

  test("rawTextDir: .txt files become fresh records; empty docs rejected; dups collapse (D3/D8)") {
    val dir = Files.createTempDirectory("graft-raw")
    Files.writeString(dir.resolve("a.txt"), "first document text")
    Files.writeString(dir.resolve("b.txt"), "second document text")
    Files.writeString(dir.resolve("dup.txt"), "first document text") // duplicate content
    Files.writeString(dir.resolve("empty.txt"), "")
    val ds = Sources.rawTextDir(spark, dir.toString)
    val recs = ds.collect()
    assert(recs.length == 2, "empty rejected, duplicate collapsed by content hash")
    assert(recs.forall(r => r.identifier == Identifier.id(r.rawText, false)))
    assert(recs.forall(r => r.viewNames.isEmpty))
  }

  test("fromTextColumn: column-form sha1 identity matches the Scala form") {
    import spark.implicits._
    val df = Seq("alpha text", "beta text").toDF("text")
    val recs = Sources.fromTextColumn(df, "text").collect()
    assert(recs.length == 2)
    for (r <- recs) assert(r.identifier == Identifier.id(r.rawText, false))
  }

  test("record store round-trip with id-prefix partitioning (D7)") {
    import spark.implicits._
    val recs = (1 to 50).map(i => Record.fresh(s"document number $i"))
    val ds = spark.createDataset(recs)
    val out = Files.createTempDirectory("graft-store").toString + "/t"
    Sources.writeRecords(ds, out, idPrefixPartitions = true)
    val back = Sources.readRecords(spark, out).collect()
    assert(back.sortBy(_.identifier).toSeq == recs.sortBy(_.identifier))
    // partition dirs exist (hash-prefix layout)
    val parts = new java.io.File(out).listFiles().filter(_.getName.startsWith("id_prefix="))
    assert(parts.nonEmpty)
  }

  test("old-output rotation moves existing dir aside (D18)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-rot").toString
    val out = s"$base/result"
    spark.createDataset(Seq(Record.fresh("v1"))).write.parquet(out)
    val moved = Sources.rotateOldOutput(spark, out)
    assert(moved.exists(_.contains("old_jobs")))
    assert(!Files.exists(Paths.get(out)))
    assert(Files.exists(Paths.get(moved.get)))
    // second rotation of a recreated dir gets a new suffix
    spark.createDataset(Seq(Record.fresh("v2"))).write.parquet(out)
    val moved2 = Sources.rotateOldOutput(spark, out)
    assert(moved2.isDefined && moved2 != moved)
  }

  test("input-kind detection (D11)") {
    import spark.implicits._
    val recDir = Files.createTempDirectory("graft-kind").toString + "/recs"
    spark.createDataset(Seq(Record.fresh("abc"))).write.parquet(recDir)
    assert(Sources.containsSerializedRecords(spark, recDir))
    val plainDir = Files.createTempDirectory("graft-kind2").toString + "/plain"
    Seq(("x", 1)).toDF("a", "b").write.parquet(plainDir)
    assert(!Sources.containsSerializedRecords(spark, plainDir))
    assert(!Sources.containsSerializedRecords(spark, "/nonexistent/dir"))
  }

  test("store compaction rewrites many small files into few, content intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString + "/store"
    val recs = (1 to 50).map(i => Record.fresh(s"doc number $i"))
    // fragment the store the way accumulated micro-batches would
    Sources.writeRecords(spark.createDataset(recs).repartition(20), dir)
    val before = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(before > 5, s"fixture must start fragmented, had $before files")
    val after = Sources.compactRecords(spark, dir, targetBytes = 1L << 30)
    assert(after < before && after >= 1, s"$before -> $after files")
    val back = Sources.readRecords(spark, dir).collect()
    assert(back.map(_.identifier).sorted.toSeq == recs.map(_.identifier).sorted,
      "compaction must preserve exactly the store's records")
    // clean swap: no recovery companions or stray copies left behind
    assert(!new java.io.File(dir + "_tmp").exists && !new java.io.File(dir + "_bak").exists)
  }

  test("compaction preserves the id_prefix cell layout of incremental stores") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-cell").toString + "/store"
    val recs = (1 to 60).map(i => Record.fresh(s"celled doc $i"))
    Sources.writeRecords(spark.createDataset(recs).repartition(10), dir,
      idPrefixPartitions = true)
    def cells = new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("id_prefix="))
    val cellsBefore = cells.map(_.getName).sorted
    assert(cellsBefore.nonEmpty, "fixture must be cell-partitioned")
    Sources.compactRecords(spark, dir, targetBytes = 1L << 30)
    assert(cells.map(_.getName).sorted == cellsBefore,
      "compaction must rewrite INTO the cell layout, not flatten it")
    assert(!new java.io.File(dir).listFiles.exists(f =>
        f.isFile && f.getName.endsWith(".parquet")),
      "no flat data files may sit beside the cell dirs")
    val back = Sources.readRecords(spark, dir).collect().map(_.identifier).sorted
    assert(back.toSeq == recs.map(_.identifier).sorted)
  }

  test("compaction heals a crashed swap before rewriting") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-crash").toString + "/store"
    val recs = (1 to 20).map(i => Record.fresh(s"crashy doc $i"))
    Sources.writeRecords(spark.createDataset(recs).repartition(5), dir)
    // simulate a crash inside a previous swap: the live store was moved
    // aside to _bak and the process died before promoting _tmp
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + "_bak")))
    val after = Sources.compactRecords(spark, dir)
    assert(after >= 1)
    val back = Sources.readRecords(spark, dir).collect().map(_.identifier).sorted
    assert(back.toSeq == recs.map(_.identifier).sorted,
      "recoverSwap must restore the full store before compaction touches it")
  }

  test("JSONL interchange round trip preserves nasty strings exactly; corrupt shards fail fast") {
    import spark.implicits._
    // the properties that make JSONL line-safe: embedded newlines,
    // quotes, backslashes, control chars and non-BMP unicode must all
    // survive write -> read byte-for-byte; a null field round-trips null
    val nasty = Seq(
      (1L, "plain ascii"),
      (2L, "quotes \" and \\ backslashes \\\" mixed"),
      (3L, "embedded\nnewline\tand\ttabs\r\n"),
      (4L, "unicode: 嗨 🤖 café "),
      (5L, null.asInstanceOf[String]))
    val dir = Files.createTempDirectory("graft_jsonl_spec").toString
    Sources.writeJsonl(nasty.toDF("doc_id", "text"), dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING")
    val back = Sources.readJsonl(spark, dir, schema)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(back == nasty.toMap, s"round trip diverged: $back")
    // FAILFAST: a malformed line is a loud error, not a silent null row
    Files.writeString(Paths.get(dir, "part-corrupt.json"), "{not json at all\n")
    val e = intercept[org.apache.spark.SparkException] {
      Sources.readJsonl(spark, dir, schema).collect()
    }
    assert(e.getMessage.contains("MALFORMED_RECORD") ||
      Option(e.getCause).exists(_.getMessage.contains("MALFORMED_RECORD")) ||
      e.getMessage.toLowerCase.contains("malformed"),
      s"expected a fail-fast malformed-record error, got: ${e.getMessage.take(200)}")
  }
}
