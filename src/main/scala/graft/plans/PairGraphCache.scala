package graft.plans

import org.apache.spark.sql.DataFrame

/** Session-scoped DISK cache for the near-dup PAIR GRAPH — the frame five
  * catalog consumers (keep_best, keep_central, ledger, cluster_cohesion,
  * source_overlap) each re-derived independently (~1.5 s per query at
  * sf0.1: shingle generator + posting join + pair aggregate), exactly the
  * artifact a real curation session computes once and then audits from
  * every angle.
  *
  * Unlike the quantizer memo ([[graft.operators.Similarity]], which
  * COLLECTS its k-row artifacts), the pair graph is GRAPH-SIZED — it is
  * never collected. Entries are parquet directories under a
  * session-unique tmp root:
  *
  *   - parquet, not `localCheckpoint`: checkpoint blocks die under the
  *     long-lived-session `Checkpoints.releaseAll` sweep between queries
  *     (and lineage truncation means a swept consumer FAILS, not
  *     recomputes); a file-backed frame survives any sweep and each
  *     consumer pass replans against a plain scan;
  *   - session-unique root (pid + JVM start time, deleted on JVM exit):
  *     bench/verify measurements never inherit artifacts from a previous
  *     process, so recorded bests stay comparable run-to-run;
  *   - keyed like the quantizer memo: sorted input files + canonicalized
  *     plan + leaf content digest + knob tag ([[graft.operators.Similarity.leafDigest]]
  *     — same mtime-granularity residual, same contract). Frames with no
  *     file-backed leaf (in-memory spec corpora) derive uncached;
  *   - LRU-capped: past [[maxEntries]] the eldest entry leaves the map
  *     (its key re-derives on next use); the directory itself lives until
  *     the shutdown hook deletes the root, because frames already handed
  *     out reference the path lazily and must keep working.
  *
  * At cluster scale the same pattern holds with a durable FS path (HDFS/
  * object store) instead of java.io.tmpdir — the cache IS the "write the
  * pair graph once, audit it many times" workflow, not a bench trick.
  */
object PairGraphCache {

  // 16, not 8 (advisor round 17): benchMode alone populates 7 distinct
  // tags (jac:0.2, jac:0.0, mh:0.0, cc:jac0.2, ledger, cont:0.3, sh:3);
  // one more artifact, or a session toggling bench/portable mode (14
  // keys), would silently LRU-thrash at 8 — every "hit" becoming a full
  // re-derivation plus a fresh graph-sized parquet directory in /tmp.
  private[graft] var maxEntries = 16 // var: the eviction spec shrinks it
  private val entries = new java.util.LinkedHashMap[String, java.io.File](
    16, 0.75f, /*accessOrder=*/ true)
  private[graft] val hits = new java.util.concurrent.atomic.AtomicLong
  private[graft] val misses = new java.util.concurrent.atomic.AtomicLong
  /** One monitor per cache key (lock striping) — see cached(). */
  private val keyLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  /** Monotonic suffix so every DERIVATION writes a fresh directory: a
    * key evicted from the map and later re-derived must never overwrite
    * the path a previously handed-out frame still references lazily. */
  private val gen = new java.util.concurrent.atomic.AtomicLong
  private[graft] def size: Int = entries.synchronized(entries.size)
  private[graft] def clear(): Unit = {
    entries.synchronized {
      val it = entries.values.iterator
      while (it.hasNext) org.apache.commons.io.FileUtils.deleteQuietly(it.next())
      entries.clear()
    }
    keyLocks.clear() // the data is gone; don't accrete monitors forever
  }

  private lazy val root: java.io.File = {
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
    val d = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_pairs_${rt.getPid}_${rt.getStartTime}")
    d.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(d)))
    d
  }

  /** The cached (or freshly derived-and-written) frame for `derive` over
    * `input`. `tag` carries every knob that changes the derivation
    * (threshold, portable, maxDf, generator family) — two calls with the
    * same input but different knobs must not alias. */
  def cached(input: DataFrame, tag: String)(derive: => DataFrame): DataFrame = {
    val files = input.inputFiles
    val digest =
      if (files.isEmpty) None
      else graft.operators.Similarity.leafDigest(input)
    digest match {
      case None => derive // in-memory corpus: nothing stable to key on
      case Some(leaves) =>
        val plan = input.queryExecution.analyzed.canonicalized
          .treeString(verbose = false, addSuffix = false,
            maxFields = Int.MaxValue, printOperatorId = false)
        val key = java.util.HexFormat.of().formatHex(
          java.security.MessageDigest.getInstance("MD5").digest(
            (files.sorted.mkString("\n") + "\u0000" + plan + "\u0000" +
              leaves + "\u0000" + tag).getBytes("UTF-8")))
        // one lock PER KEY covers lookup + derive + register (like the
        // quantizer memo's striping): same-key callers deduplicate the
        // expensive derivation, while different pair graphs derive in
        // parallel instead of convoying parallel verify behind a global
        // monitor. The entries map has its own short-held monitor (the
        // access-ordered LinkedHashMap mutates LRU state on get).
        val lock = keyLocks.computeIfAbsent(key, _ => new Object)
        val dir = lock.synchronized {
          var d = entries.synchronized {
            val d0 = entries.get(key)
            // _SUCCESS guards a crashed partial write poisoning the session
            if (d0 != null && !new java.io.File(d0, "_SUCCESS").isFile) {
              entries.remove(key); null
            } else d0
          }
          if (d == null) {
            misses.incrementAndGet()
            // unique per-derivation suffix: a key evicted and re-derived
            // gets a FRESH directory, so the overwrite can never race a
            // previously handed-out frame still reading the old path
            d = new java.io.File(root, s"${key}_${gen.incrementAndGet()}")
            derive.write.mode("overwrite").parquet(d.getAbsolutePath)
            entries.synchronized {
              entries.put(key, d)
              while (entries.size > maxEntries) {
                // evict from the MAP only — physical deletion is deferred
                // to the root's shutdown hook. A frame handed out by an
                // earlier cached() call still references its parquet path
                // lazily; deleting here would fail that consumer at action
                // time with FileNotFoundException instead of re-deriving
                // (advisor round 14). The footprint stays bounded by
                // session length, not unbounded history: an evicted KEY
                // re-derives into a genuinely fresh directory (the gen
                // suffix), and /tmp is reclaimed at JVM exit.
                val evicted = entries.entrySet().iterator().next().getKey
                entries.remove(evicted)
                // eviction is legal but should never be SILENT: a session
                // whose working set exceeds the cap turns every cache win
                // into a re-derivation, which looks like an unexplained
                // per-query regression unless this line names the cause
                System.err.println(s"[pair-cache] evicted $evicted " +
                  s"(cap $maxEntries) — its next consumer re-derives")
              }
            }
          } else hits.incrementAndGet()
          d
        }
        input.sparkSession.read.parquet(dir.getAbsolutePath)
    }
  }
}
