package graft

import org.apache.spark.sql.functions._
import graft.functions.RollingHash.{min_window_hash, rolling_hash}
import graft.functions.SimHash64.simhash64

/** Asserts every custom Catalyst expression actually compiles under
  * whole-stage codegen. With `spark.sql.codegen.fallback=false` a Janino
  * CompileException fails the query instead of silently degrading to
  * interpreted execution (the round-1 bug: a companion method named `eval`
  * gets no static forwarder, so generated code couldn't call it). */
class CodegenSpec extends SparkSpec {

  private def withStrictCodegen[A](body: => A): A = {
    val conf = spark.conf
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body
    finally {
      conf.set("spark.sql.codegen.fallback", prevFallback)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("rolling_hash / min_window_hash / simhash64 / vec_dot compile under strict codegen") {
    withStrictCodegen {
      import spark.implicits._
      val df = Seq("the quick brown fox", "jumps over", "x" * 200)
        .toDF("text")
        .select(
          rolling_hash(col("text")).as("rh"),
          min_window_hash(col("text"), 32).as("mwh"),
          simhash64(transform(split(col("text"), " "), t => xxhash64(t))).as("sh"))
      val rows = df.collect()
      assert(rows.length == 3)
      // codegen and interpreted paths must agree
      val interp = Seq("the quick brown fox", "jumps over", "x" * 200).map { s =>
        var h = 0L
        s.getBytes("UTF-8").foreach(b => h = h * graft.functions.RollingHash.Base + (b & 0xffL))
        h
      }
      assert(rows.map(_.getLong(0)).toSeq == interp)

      import graft.functions.VecDot.vec_dot
      val vd = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
        .toDF("a", "b").select(vec_dot(col("a"), col("b")).as("d")).collect()
      assert(vd.head.getDouble(0) == 32.0)

      import graft.functions.ArrEqCount.arr_eq_count
      val ec = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 8L)))
        .toDF("a", "b").select(arr_eq_count(col("a"), col("b")).as("c")).collect()
      assert(ec.head.getInt(0) == 2)

      import graft.functions.VecSqDiff.vec_sqdiff
      val sq = Seq((Seq(1.0, 2.0), Seq(4.0, 0.0)))
        .toDF("a", "b").select(vec_sqdiff(col("a"), col("b")).as("d")).collect()
      assert(sq.head.getDouble(0) == 13.0)

      import graft.functions.MinHashSig.minhash_sig
      val mh = Seq("one two three four", "ab")
        .toDF("text").select(minhash_sig(col("text"), 8, portable = true).as("sig"))
        .collect()
      assert(mh(0).getSeq[Long](0).length == 8)
      assert(mh(1).isNullAt(0), "under 3 tokens must yield null")

      import graft.functions.SignBits.sign_bits
      val sb0 = Seq(Seq(1.0, -2.0, 0.0, 3.0), Seq(-1.0))
        .toDF("v").select(sign_bits(col("v")).as("s")).collect()
      // bits 0 and 3 set; all-negative packs to 0
      assert(sb0(0).getLong(0) == 9L && sb0(1).getLong(0) == 0L)

      import graft.functions.ZOrderKey.zorder_key
      val zk = Seq((3L, 5L)).toDF("a", "b")
        .select(zorder_key(col("a"), col("b")).as("z")).collect()
      assert(zk.head.getLong(0) == graft.functions.ZOrderKey.interleave(3L, 5L))

      import graft.functions.CdcCuts.cdc_cuts
      val cdcText = "the quick brown fox jumps over the lazy dog " * 20
      val cdcDf = Seq(cdcText, "short").toDF("text")
        .select(cdc_cuts(col("text"), 32).as("c")).collect()
      // naive reference: hash every 32-byte window independently
      def naiveCuts(s: String): Long = {
        val b = s.getBytes("UTF-8")
        (0 to b.length - 32).count { i =>
          var h = 0L
          (i until i + 32).foreach(j => h = h * 1000003L + (b(j) & 0xffL))
          (h & 63L) == 0L
        }.toLong
      }
      assert(cdcDf(0).getLong(0) == naiveCuts(cdcText))
      assert(cdcDf(1).getLong(0) == 0L, "below one window -> no cuts")
      // local-content stability: appending bytes never changes earlier cuts
      assert(graft.functions.CdcCuts.evalCuts((cdcText + "APPENDED TAIL").getBytes("UTF-8"), 32)
        >= graft.functions.CdcCuts.evalCuts(cdcText.getBytes("UTF-8"), 32))

      import graft.functions.CdcChunkHashes.cdc_chunk_hashes
      // naive independent reference: find every cut (window hash low 6
      // bits zero, each window hashed from scratch), split at the cuts,
      // fold each chunk's bytes separately
      def naiveChunks(s: String): Seq[Long] = {
        val b = s.getBytes("UTF-8")
        def rangeHash(from: Int, until: Int): Long = {
          var h = 0L
          (from until until).foreach(j => h = h * 1000003L + (b(j) & 0xffL))
          h
        }
        if (b.isEmpty) Seq(0L)
        else {
          val cutEnds = (0 to b.length - 32).filter { i =>
            (rangeHash(i, i + 32) & 63L) == 0L
          }.map(_ + 32)
          val bounds = (0 +: cutEnds) :+ b.length
          bounds.zip(bounds.tail).collect {
            case (s0, e0) if e0 > s0 => rangeHash(s0, e0)
          }
        }
      }
      val chDf = Seq(cdcText, "short", "").toDF("text")
        .select(cdc_chunk_hashes(col("text"), 32).as("c")).collect()
      assert(chDf(0).getSeq[Long](0) == naiveChunks(cdcText), "chunk hashes at cuts")
      assert(chDf(1).getSeq[Long](0) == naiveChunks("short"),
        "below one window -> single whole-text chunk")
      assert(chDf(2).getSeq[Long](0) == Seq(0L), "empty text -> single zero chunk")
      // edit locality: chunks strictly before an appended tail are shared
      val before = graft.functions.CdcChunkHashes.evalChunks(cdcText.getBytes("UTF-8"), 32)
      val after = graft.functions.CdcChunkHashes
        .evalChunks((cdcText + "APPENDED TAIL").getBytes("UTF-8"), 32)
      assert(before.dropRight(1).sameElements(after.take(before.length - 1)),
        "appending bytes must not reshape earlier chunks")

      import graft.functions.GramHashes.gram_hashes
      import graft.functions.SplitWords.split_words
      // equivalence oracle: same 60-bit md5 prefix Spark's own builtins
      // compute over the filtered token stream
      val gtext = "  the quick  brown fox jumps over the quick brown fox "
      val gref = {
        val w = gtext.split("\\s+", -1).filter(_.nonEmpty)
        w.sliding(5).map { g =>
          java.lang.Long.parseLong(
            java.security.MessageDigest.getInstance("MD5")
              .digest(g.mkString(" ").getBytes("UTF-8"))
              .map(b => f"$b%02x").mkString.take(15), 16)
        }.toSeq
      }
      val gh = Seq(gtext, "a b c d", "").toDF("text")
        .select(gram_hashes(col("text"), 5).as("g")).collect()
      assert(gh(0).getSeq[Long](0) == gref, "positional 5-gram hashes")
      assert(gh(1).getSeq[Long](0).isEmpty, "under n tokens -> empty array")
      assert(gh(2).getSeq[Long](0).isEmpty)
      val sw = Seq(gtext, " \t ", "").toDF("text")
        .select(split_words(col("text")).as("w")).collect()
      assert(sw(0).getSeq[String](0) == gtext.split("\\s+", -1).filter(_.nonEmpty).toSeq)
      assert(sw(1).getSeq[String](0).isEmpty && sw(2).getSeq[String](0).isEmpty)

      import graft.functions.GramTexts.gram_texts
      val gt = Seq(gtext, "a b", "").toDF("text")
        .select(gram_texts(col("text"), 3).as("g")).collect()
      assert(gt(0).getSeq[String](0) ==
        gtext.split("\\s+", -1).filter(_.nonEmpty).sliding(3).map(_.mkString(" ")).toSeq,
        "positional 3-gram texts over the filtered token stream")
      assert(gt(1).getSeq[String](0).isEmpty && gt(2).getSeq[String](0).isEmpty)

      import graft.functions.SkipGramPairs.skipgram_pairs
      val sg = Seq("a  b c d", "x y", "lone", "").toDF("text")
        .select(skipgram_pairs(col("text"), 2).as("p")).collect()
        .map(_.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getString(1))))
      // forward pairs at distance 1 then 2 per anchor, anchors in order
      assert(sg(0) == Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")),
        s"skip-gram window 2: got ${sg(0)}")
      assert(sg(1) == Seq(("x", "y")) && sg(2).isEmpty && sg(3).isEmpty)

      import graft.functions.GramScore.gram_score
      // independent reference: MessageDigest md5 over the same sliding
      // bigrams, the same centered-mod weight, summed left to right
      val gsRef = {
        val w = gtext.split("\\s+", -1).filter(_.nonEmpty)
        w.sliding(2).map { g =>
          java.lang.Long.parseLong(
            java.security.MessageDigest.getInstance("MD5")
              .digest(g.mkString(" ").getBytes("UTF-8"))
              .map(b => f"$b%02x").mkString.take(15), 16) % 2001 - 1000
        }.sum
      }
      val gsN = gtext.split("\\s+", -1).count(_.nonEmpty).toLong - 1
      val gs = Seq(gtext, "one", "").toDF("text")
        .select(gram_score(col("text"), 2, 2001, 1000).as("s")).collect()
      assert(gs(0).getSeq[Long](0) == Seq(gsN, gsRef),
        "hashed-bigram linear score: [n_grams, sum of (h % 2001 - 1000)]")
      assert(gs(1).getSeq[Long](0) == Seq(0L, 0L), "under n tokens -> [0, 0]")
      assert(gs(2).getSeq[Long](0) == Seq(0L, 0L))

      import graft.functions.WordScan.word_scan
      val ws = Seq("The cat and the dog, a big dog.")
        .toDF("text").select(word_scan(col("text"), Seq("the", "a", "dog"), 2).as("sc"))
        .collect().head.getSeq[Int](0)
      // runs: The,cat,and,the,dog,a,big,dog -> in set: The,the,dog,a,dog=5;
      // short (<=2): a = 1; runs = 8; split tokens = 8; ws chars = 7
      assert(ws == Seq(5, 1, 8, 8, 7), s"got $ws")
    }
  }

  test("rep_scan and the band generators compile under strict codegen") {
    withStrictCodegen {
      import spark.implicits._
      import graft.functions.RepScan.rep_scan
      val r = Seq("a b a b a b", "x", "")
        .toDF("text").select(rep_scan(col("text")).as("r"))
        .collect().map(_.getSeq[Int](0))
      // "a b a b a b": bigrams a·b ×3, b·a ×2 -> n=5, max=3
      assert(r(0) == Seq(5, 3) && r(1) == Seq(0, 0) && r(2) == Seq(0, 0), r.toSeq)

      import graft.functions.RepScanN.rep_scan_n
      val rn = Seq("a b a b a b", "x y", "")
        .toDF("text").select(rep_scan_n(col("text"), 3).as("r"))
        .collect().map(_.getSeq[Int](0))
      // "a b a b a b": 3-grams aba ×2, bab ×2 -> n=4, max=2, dup=4
      assert(rn(0) == Seq(4, 2, 4) && rn(1) == Seq(0, 0, 0) &&
        rn(2) == Seq(0, 0, 0), rn.toSeq)

      import graft.functions.BandGenerators.{minhash_bands, shingle_posts, simhash_bands}
      val mb = Seq("one two three four", "ab")
        .toDF("text").select(col("text"), minhash_bands(col("text"), 8, 4, true))
        .collect()
      // 4 band rows for the real doc, zero for the under-3-token doc
      assert(mb.length == 4 && mb.forall(_.getString(0) == "one two three four"))
      val sp = Seq("one two three four").toDF("text")
        .select(shingle_posts(col("text"), true)).collect()
      assert(sp.length == 2 && sp.forall(_.getInt(0) == 2), "2 shingles, each carrying n=2")
      val sb = Seq("x y z").toDF("text")
        .select(simhash_bands(col("text"), 4, 15, true)).collect()
      assert(sb.length == 4 && sb.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))

      import graft.functions.QualityGate.quality_gate
      val qg = Seq(
        "too short",
        "the dog and the cat and the fox go to the park for a very long walk today",
        "qqqq wwww eeee rrrr tttt yyyy uuuu iiii oooo pppp ssss dddd")
        .toDF("text").select(quality_gate(col("text"), Seq("the", "a", "to", "for"), 2).as("r"))
        .collect().map(_.getString(0)).toSeq
      assert(qg == Seq("too_short", "ok", "no_stopwords"), qg)
    }
  }

  test("pack_str14 compiles under strict codegen and matches the conv/hex formulation") {
    withStrictCodegen {
      import spark.implicits._
      import graft.functions.PackStr14.pack_str14
      val tags = Seq("en", "zh-Hant-TW", "日本語", "", "z-z-z-z-z-z-z")
      val got = tags.toDF("s").select(pack_str14(col("s")).as("p")).collect()
        .map(_.getDecimal(0))
      // the retired SQL formulation, replayed literally per tag
      val pow56 = java.math.BigInteger.ONE.shiftLeft(56)
      val expected = tags.map { t =>
        val b = java.util.Arrays.copyOf(t.getBytes("UTF-8"), 14)
        def half(off: Int) = new java.math.BigInteger(1, b.slice(off, off + 7))
        new java.math.BigDecimal(half(0).multiply(pow56).add(half(7)))
      }
      got.zip(expected).foreach { case (g, e) =>
        assert(g.compareTo(e) == 0, s"pack mismatch: $g vs $e") }
      // null propagates; >14 bytes fails loudly (the assert_true contract)
      val n = Seq[Option[String]](None).toDF("s")
        .select(pack_str14(col("s"))).collect()
      assert(n.head.isNullAt(0))
      intercept[Exception] {
        Seq("x-private-use-subtag-way-too-long").toDF("s")
          .select(pack_str14(col("s"))).collect()
      }
    }
  }

  test("token_windows compiles under strict codegen and matches the transform/slice formulation") {
    withStrictCodegen {
      import spark.implicits._
      import graft.functions.TokenWindows.token_windows
      val texts = Seq(
        "a b c d e f g h i j k l",      // 12 tokens -> [10, 2]
        "  leading   and\ttab\nnewline ", // messy whitespace
        "one", "", "   ")
      val df = texts.toDF("text").select(
        token_windows(col("text"), 10).as("got"),
        expr("transform(sequence(0, cast(ceil(size(filter(split(text, '\\\\s+'), w -> w != '')) / 10.0) AS INT) - 1), " +
          "i -> array_join(slice(filter(split(text, '\\\\s+'), w -> w != ''), i * 10 + 1, 10), ' '))").as("want"),
        size(filter(split(col("text"), "\\s+"), w => w =!= lit(""))).as("ntok"))
      df.collect().foreach { r =>
        val got = r.getSeq[String](0)
        // the transform formulation is undefined at 0 tokens (descending
        // sequence) — there token_windows' contract is the empty array
        val want = if (r.getInt(2) == 0) Seq.empty[String] else r.getSeq[String](1)
        assert(got == want, s"got $got want $want")
      }
    }
  }

  test("capped_collect_list survives the sort-based aggregation fallback") {
    // ObjectHashAggregate falls back to sort-based aggregation beyond the
    // in-memory key budget — force it with a threshold of 1 so every group
    // takes the serialize -> sort -> merge path (the path a degenerate
    // 100-TB bucket would take), and assert cap semantics are unchanged.
    import graft.functions.CappedCollectList.capped_collect_list
    val prev = spark.conf.get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1")
    try {
      val out = spark.range(0, 90, 1, 8)
        .select((col("id") % 3).as("g"), col("id"))
        .groupBy("g").agg(capped_collect_list(col("id"), 25).as("xs"))
        .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
      // every group has 30 > 25 rows -> all null, even across serialized merges
      assert(out.values.forall(_.isEmpty), s"over-cap groups must be null: $out")
      val ok = spark.range(0, 60, 1, 8)
        .select((col("id") % 3).as("g"), col("id"))
        .groupBy("g").agg(capped_collect_list(col("id"), 25).as("xs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
      assert(ok.forall { case (g, xs) => xs == (g until 60L by 3).toSeq },
        s"under-cap groups must collect exactly once each: $ok")
    } finally spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", prev)
  }

  test("min_window_hash static forwarder exists (codegen callable from Java)") {
    // The generated code calls graft.functions.MinWindowHash.evalBytes(byte[], int)
    // as a static method; verify the forwarder is present on the class.
    val m = classOf[graft.functions.MinWindowHash]
      .getMethod("evalBytes", classOf[Array[Byte]], classOf[Int])
    assert(java.lang.reflect.Modifier.isStatic(m.getModifiers))
    val s = classOf[graft.functions.SimHash64]
      .getMethod("evalVotes", classOf[org.apache.spark.sql.catalyst.util.ArrayData])
    assert(java.lang.reflect.Modifier.isStatic(s.getModifiers))
  }
}
