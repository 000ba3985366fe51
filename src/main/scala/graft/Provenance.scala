package graft

/** Artifact provenance: git SHA + wall-clock stamp, embedded in the bench
  * and verify outputs so any BENCH_r{N}/CORRECTNESS_r{N} artifact is
  * traceable to the exact commit that produced it (a round-9 advisory —
  * two artifacts from different working trees are otherwise
  * indistinguishable post hoc).
  *
  * The SHA is read straight from `.git` (HEAD → loose ref → packed-refs)
  * rather than exec'ing `git`: the bench JVM must not fork processes, and
  * the read degrades to "unknown" outside a work tree instead of failing.
  */
object Provenance {
  def gitSha(repo: String = "."): String = try {
    import java.nio.file.{Files, Paths}
    val head = Files.readString(Paths.get(repo, ".git", "HEAD")).trim
    val full =
      if (head.startsWith("ref: ")) {
        val ref = head.drop(5).trim
        val loose = Paths.get(repo, ".git", ref)
        if (Files.exists(loose)) Files.readString(loose).trim
        else {
          val packed = Paths.get(repo, ".git", "packed-refs")
          if (!Files.exists(packed)) ""
          else Files.readAllLines(packed).stream()
            .filter(l => l.endsWith(" " + ref))
            .map[String](l => l.split(" ")(0))
            .findFirst().orElse("")
        }
      } else head
    if (full.length >= 12) full.take(12) else "unknown"
  } catch { case _: Throwable => "unknown" }

  def nowIso: String =
    java.time.Instant.now().truncatedTo(java.time.temporal.ChronoUnit.SECONDS).toString
}
