package graft.operators

/** The annotation operator taxonomy.
  *
  * Mirrors the reference enum `AnnotationMode`
  * (`/root/reference/src/.../infrastructure/AnnotationMode.java:16`), its
  * curator-view-name map (105-131), view-kind map (148-163 +
  * `ViewType.java:8-10`) and dependency DAG (186-238).
  */
sealed abstract class ViewKind
object ViewKind {
  case object Label extends ViewKind
  case object Cluster extends ViewKind
  case object Parse extends ViewKind
  case object General extends ViewKind
}

sealed abstract class AnnotationMode(
    val viewName: String,
    val kind: ViewKind,
    /** Ordered direct dependencies (reference `getDependencies`). */
    val deps: Seq[AnnotationMode]) {
  def name: String = toString
}

object AnnotationMode {
  import ViewKind._

  case object TOKEN extends AnnotationMode("tokens", Label, Nil)
  case object SENTENCE extends AnnotationMode("sentences", Label, Nil)
  case object POS extends AnnotationMode("pos", Label, Seq(TOKEN))
  case object CHUNK extends AnnotationMode("chunk", Label, Seq(TOKEN, POS))
  case object NER extends AnnotationMode("ner", Label, Nil)
  case object PARSE extends AnnotationMode("charniak", Parse, Seq(TOKEN))
  /** Callable but absent from the reference's dependency switch
    * (`AnnotationMode.java:192-235` falls through) — we keep it plannable
    * with its config-implied deps (TOKEN, SENTENCE). */
  case object STANFORD_PARSE extends AnnotationMode("stanfordParse", Parse, Seq(TOKEN, SENTENCE))
  case object COREF extends AnnotationMode("coref", Cluster, Seq(TOKEN, POS, NER))
  case object VERB_SRL extends AnnotationMode("srl", Parse, Seq(TOKEN, POS, CHUNK, PARSE))
  case object NOM_SRL extends AnnotationMode("nom", Parse, Seq(TOKEN, POS, CHUNK, PARSE))
  case object WIKI extends AnnotationMode("wikifier", Label, Seq(TOKEN, POS, CHUNK, NER))

  val values: Seq[AnnotationMode] = Seq(
    TOKEN, SENTENCE, POS, CHUNK, NER, PARSE, STANFORD_PARSE, COREF,
    VERB_SRL, NOM_SRL, WIKI)

  private val byView: Map[String, AnnotationMode] =
    values.map(m => m.viewName.toLowerCase -> m).toMap

  /** Fuzzy parser mirroring the reference's forgiving `fromString`
    * (`AnnotationMode.java:29-73`): exact enum name, curator view name, or
    * common aliases/prefixes, case-insensitive. */
  def fromString(s: String): AnnotationMode = {
    val t = s.trim.toLowerCase.replace("-", "_").replace(" ", "_")
    def has(x: String) = t.contains(x)
    values.find(_.name.toLowerCase == t)
      .orElse(byView.get(t))
      .getOrElse {
        if (has("token")) TOKEN
        else if (has("sentence") || has("ssplit")) SENTENCE
        else if (has("chunk")) CHUNK
        else if (has("pos") || has("part_of_speech")) POS
        else if (has("ner") || has("named")) NER
        else if (has("stanford")) STANFORD_PARSE
        else if (has("charniak") || t == "parse" || has("parser")) PARSE
        else if (has("coref")) COREF
        else if (has("nom")) NOM_SRL
        else if (has("srl") || has("verb")) VERB_SRL
        else if (has("wiki")) WIKI
        else throw new IllegalArgumentException(s"unknown annotation mode: $s")
      }
  }

  /** Transitive dependency closure in topological (dependency-first) order,
    * target last. Deterministic order for equal ranks. */
  def expand(target: AnnotationMode): Seq[AnnotationMode] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[AnnotationMode]
    def visit(m: AnnotationMode): Unit =
      if (!out.contains(m)) { m.deps.foreach(visit); out += m }
    visit(target)
    out.toSeq
  }
}
