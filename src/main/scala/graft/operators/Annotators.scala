package graft.operators

import graft.model._

/** A per-document annotation operator: `Record => Record`, adding its view(s).
  *
  * Uniform contract mirroring the reference's Thrift annotator services
  * (`Labeler`/`ClusterGenerator`/`Parser` dispatch in
  * `CuratorHandler.transform`, `CuratorHandler.java:911-961`):
  *   - `source` is the provenance+version string stored on the produced view;
  *     a stored view is *fresh* iff its source equals the registered
  *     operator's source (staleness semantics of
  *     `CuratorHandler.updateRequired`, 816-896);
  *   - a failed annotation must fail loudly, never silently drop the view
  *     (`HadoopCuratorClient.java:70-72`) — operators throw
  *     [[AnnotationFailedException]];
  *   - operators are pure functions of the record, so Spark speculation and
  *     retries are safe (an improvement over the reference's side-effectful
  *     reducers, `CuratorJob.java:106-109`).
  *
  * The annotator *models* are deliberately simple deterministic algorithms
  * behind the same operator contracts (view names, kinds, span semantics) —
  * the model internals are pluggable, the dataflow is the product.
  */
trait ViewOperator extends Serializable {
  def mode: AnnotationMode
  def version: String
  final def source: String = s"graft-${mode.viewName}-$version"

  /** Compute this operator's view(s) and return the enriched record.
    * Dependencies are guaranteed present by the planner. */
  def apply(r: Record): Record

  /** Present and produced by this exact operator version? */
  final def isFresh(r: Record): Boolean =
    r.viewSource(mode.viewName).contains(source)
}

final class AnnotationFailedException(msg: String) extends RuntimeException(msg)

/** Typed failure taxonomy (reference `CuratorReducer.java:143-177`). */
final class ServiceUnavailableException(msg: String) extends RuntimeException(msg)

object Annotators {

  // --------------------------------------------------------------------
  // Shared text primitives (deterministic, regex-defined so the DuckDB
  // oracle can replicate token counts exactly)
  // --------------------------------------------------------------------

  /** Token = run of word chars (letters/digits/underscore/apostrophe) or a
    * single non-space symbol. */
  val TokenPattern = "[A-Za-z0-9_']+|[^A-Za-z0-9_'\\s]".r

  /** Sentence = maximal run of non-terminators plus trailing terminators. */
  val SentencePattern = "[^.!?]+[.!?]*".r

  /** Whitespaced (`ws*`) path token: maximal non-whitespace run. */
  private val WsTokenPattern = "\\S+".r

  @inline private def isTokChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_' || c == '\''

  /** Regex `\s` (ASCII: space, tab, LF, vertical tab, form feed, CR) —
    * NOT `Character.isWhitespace`, which also accepts Unicode spaces
    * (U+1680, U+2000–U+200A, U+2028/29, ...) that TokenPattern and the
    * RE2-based oracle treat as SYM-token characters; using it here dropped
    * those chars and broke exact Spark↔oracle token parity. Mirrors
    * `WordScan.isWsByte`.
    *
    * KNOWN DIVERGENCE — U+000B: Java `\s` includes vertical tab; RE2's
    * (DuckDB's) `\s` is `[\t\n\f\r ]` without it. The engine follows the
    * Java-heritage reference semantics; a corpus containing 0x0B would
    * tokenize differently from a RE2 oracle. AnnotatorsSpec asserts the
    * fixture corpus is VT-free, which is what makes the oracle parity
    * claim sound. */
  @inline private def isRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Hand-rolled scan with exactly TokenPattern's semantics (a run of
    * `[A-Za-z0-9_']` chars, or one non-space other char) — the regex engine
    * was the dominant per-document cost of the whole annotator chain. */
  def tokenSpans(text: String, src: String): Seq[Span] = {
    val out = Vector.newBuilder[Span]
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (isTokChar(c)) {
        var j = i + 1
        while (j < n && isTokChar(text.charAt(j))) j += 1
        out += Span(i, j, text.substring(i, j), 1.0, src, Map.empty)
        i = j
      } else {
        if (!isRegexWs(c))
          out += Span(i, i + 1, text.substring(i, i + 1), 1.0, src, Map.empty)
        i += 1
      }
    }
    out.result()
  }

  /** Hand-rolled scan with exactly SentencePattern's semantics (a 1+ run of
    * non-terminators plus trailing `[.!?]*`), then whitespace-trimmed. */
  def sentenceSpans(text: String, src: String): Seq[Span] = {
    val out = Vector.newBuilder[Span]
    val n = text.length
    @inline def isTerm(c: Char) = c == '.' || c == '!' || c == '?'
    var i = 0
    while (i < n) {
      if (isTerm(text.charAt(i))) i += 1 // outside any match, like the regex
      else {
        val start = i
        while (i < n && !isTerm(text.charAt(i))) i += 1
        while (i < n && isTerm(text.charAt(i))) i += 1
        // trim whitespace off the span edges — regex \s (ASCII), same set
        // as the tokenizer gate, so the oracle's trim replicates it
        var s = start; var e = i
        while (s < e && isRegexWs(text.charAt(s))) s += 1
        while (e > s && isRegexWs(text.charAt(e - 1))) e -= 1
        if (s < e) out += Span(s, e, "sentence", 1.0, src, Map.empty)
      }
    }
    out.result()
  }

  private def addLabel(r: Record, name: String, lab: Labeling): Record =
    r.copy(labelViews = r.labelViews + (name -> lab))
  private def addParse(r: Record, name: String, f: Forest): Record =
    r.copy(parseViews = r.parseViews + (name -> f))

  private def tokensOf(r: Record): Seq[Span] =
    r.labelViews.getOrElse("tokens",
      throw new AnnotationFailedException("missing dependency view: tokens")).labels
  private def posOf(r: Record): Seq[Span] =
    r.labelViews.getOrElse("pos",
      throw new AnnotationFailedException("missing dependency view: pos")).labels
  private def sentencesOf(r: Record): Seq[Span] =
    r.labelViews.get("sentences").map(_.labels)
      .getOrElse(sentenceSpans(r.rawText, "derived"))

  // --------------------------------------------------------------------
  // TOKEN + SENTENCE: fused multilabeler, like the reference's in-process
  // Illinois tokenizer emitting both views in one pass
  // (`CuratorReducer.java:820-832`). The `ws` (whitespaced) path splits on
  // whitespace only (`CuratorHandler.wsprovide`, 1112-1119).
  // --------------------------------------------------------------------
  object Tokenizer extends ViewOperator {
    val mode = AnnotationMode.TOKEN
    val version = "1.0"
    def apply(r: Record): Record = {
      val sentSrc = s"graft-sentences-$version"
      val (toks, sents) =
        if (r.whitespaced) {
          val ws = WsTokenPattern.findAllMatchIn(r.rawText)
            .map(m => Span(m.start, m.end, m.matched, 1.0, source, Map.empty)).toVector
          val all = if (r.rawText.isEmpty) Vector.empty
            else Vector(Span(0, r.rawText.length, "sentence", 1.0, sentSrc, Map.empty))
          (ws, all)
        } else
          (tokenSpans(r.rawText, source), sentenceSpans(r.rawText, sentSrc))
      addLabel(addLabel(r, "tokens", Labeling(toks, source, 1.0)),
        "sentences", Labeling(sents, sentSrc, 1.0))
    }
  }

  /** SENTENCE alone delegates to the fused tokenizer (reference: same
    * multilabeler serves both views). */
  object Sentencer extends ViewOperator {
    val mode = AnnotationMode.SENTENCE
    val version = "1.0"
    def apply(r: Record): Record = Tokenizer(r)
  }

  // --------------------------------------------------------------------
  // POS: per-token deterministic suffix/lexicon tagger. Pure function of the
  // token string — exactly replicable as a SQL CASE for the oracle.
  // --------------------------------------------------------------------
  object PosTagger extends ViewOperator {
    val mode = AnnotationMode.POS
    val version = "1.0"

    private val determiners = Set("the", "a", "an", "this", "that", "these", "those")
    private val preps = Set("of", "in", "on", "at", "by", "for", "with", "to", "from", "as")
    private val conj = Set("and", "or", "but", "nor", "so", "yet")
    private val pronouns = Set("i", "you", "he", "she", "it", "we", "they",
      "him", "her", "them", "his", "its", "their", "my", "your", "our")
    private val modals = Set("will", "would", "can", "could", "shall", "should",
      "may", "might", "must")
    private val beVerbs = Set("is", "are", "was", "were", "be", "been", "am", "being")
    // precompiled: String.matches recompiles its pattern on every call,
    // and this runs once per token across the whole annotator chain
    private val CardinalPattern = java.util.regex.Pattern.compile("[0-9]+([.,][0-9]+)?")

    /** The tag function — keep in sync with the SQL replica in
      * [[graft.queries.Annotation]]. */
    def tag(token: String): String = {
      val lt = token.toLowerCase
      if (!token.exists(_.isLetterOrDigit)) "SYM"
      else if (CardinalPattern.matcher(lt).matches()) "CD"
      else if (determiners(lt)) "DT"
      else if (preps(lt)) "IN"
      else if (conj(lt)) "CC"
      else if (pronouns(lt)) "PRP"
      else if (modals(lt)) "MD"
      else if (beVerbs(lt)) "VB"
      else if (lt.endsWith("ly") && lt.length > 3) "RB"
      else if (lt.endsWith("ing") && lt.length > 4) "VBG"
      else if (lt.endsWith("ed") && lt.length > 3) "VBD"
      else if (token.head.isUpper) "NNP"
      else if (lt.endsWith("s") && lt.length > 3) "NNS"
      else "NN"
    }

    def apply(r: Record): Record = {
      val spans = tokensOf(r).map(t => t.copy(label = tag(t.label), source = source))
      addLabel(r, "pos", Labeling(spans, source, 1.0))
    }
  }

  // --------------------------------------------------------------------
  // CHUNK: FSM over POS tags grouping runs into NP/VP chunks
  // (reference IllinoisChunkerHandler semantics: spans over token groups).
  // --------------------------------------------------------------------
  object Chunker extends ViewOperator {
    val mode = AnnotationMode.CHUNK
    val version = "1.0"
    private val npTags = Set("DT", "CD", "PRP", "NN", "NNS", "NNP")
    private val vpTags = Set("MD", "VB", "VBD", "VBG", "RB")

    def chunkOf(tag: String): String =
      if (npTags(tag)) "NP" else if (vpTags(tag)) "VP" else "O"

    def apply(r: Record): Record = {
      val pos = posOf(r)
      val out = Vector.newBuilder[Span]
      var i = 0
      while (i < pos.size) {
        val kind = chunkOf(pos(i).label)
        var j = i + 1
        while (j < pos.size && chunkOf(pos(j).label) == kind) j += 1
        if (kind != "O")
          out += Span(pos(i).start, pos(j - 1).ending, kind, 1.0, source, Map.empty)
        i = j
      }
      addLabel(r, "chunk", Labeling(out.result(), source, 1.0))
    }
  }

  // --------------------------------------------------------------------
  // NER: dictionary/shape tagger — capitalized runs become entities, digit
  // tokens become CARDINAL (reference NER is an external model server; the
  // operator contract, not the model, is what we reproduce).
  // --------------------------------------------------------------------
  object NerTagger extends ViewOperator {
    val mode = AnnotationMode.NER
    val version = "1.0"
    private[operators] val CardinalPattern =
      java.util.regex.Pattern.compile("[0-9]+([.,][0-9]+)?")
    /** Explicitly ASCII (not Char.isUpper): the DuckDB oracle matches
      * '^[A-Z]', and full-Unicode uppercase ('École') would diverge. */
    private[operators] def capInitial(s: String): Boolean =
      s.nonEmpty && s.head >= 'A' && s.head <= 'Z'
    def apply(r: Record): Record = {
      val toks = r.labelViews.get("tokens").map(_.labels)
        .getOrElse(tokenSpans(r.rawText, source))
      val out = Vector.newBuilder[Span]
      var i = 0
      while (i < toks.size) {
        val t = toks(i)
        if (NerTagger.capInitial(t.label)) {
          var j = i + 1
          while (j < toks.size && NerTagger.capInitial(toks(j).label)) j += 1
          out += Span(t.start, toks(j - 1).ending, "MISC", 1.0, source, Map.empty)
          i = j
        } else if (NerTagger.CardinalPattern.matcher(t.label).matches()) {
          out += Span(t.start, t.ending, "CARDINAL", 1.0, source, Map.empty)
          i += 1
        } else i += 1
      }
      addLabel(r, "ner", Labeling(out.result(), source, 1.0))
    }
  }

  // --------------------------------------------------------------------
  // NER-EXT: the reference's extended-NER variant view — same service
  // contract as "ner" but a RICHER TYPE ONTOLOGY, stored under the
  // distinct view name "ner-ext" alongside the base view
  // (`CuratorClient.java:1022-1058`: provide("ner-ext", ...) then reads
  // record.getLabelViews().get("ner-ext") next to "ner"). Registered
  // through the open registry (AnnotationEngine.withOperator), exactly
  // how a deployment hosts any extra view. Deterministic shape rules so
  // the DuckDB oracle replays them:
  //   capitalized runs: month-led -> DATE, multi-token -> ORG,
  //                     single token -> PERSON;
  //   numeric tokens:   19xx/20xx -> DATE, >= 7 digits -> ID,
  //                     otherwise CARDINAL.
  // --------------------------------------------------------------------
  object NerExtTagger extends ViewOperator {
    val mode = AnnotationMode.NER
    val version = "1.0-ext" // distinct source: never reads as a fresh "ner"
    private val Months = Set("january", "february", "march", "april", "may",
      "june", "july", "august", "september", "october", "november", "december")
    private val YearPattern = java.util.regex.Pattern.compile("(19|20)[0-9][0-9]")
    private val IdPattern = java.util.regex.Pattern.compile("[0-9]{7,}")
    def apply(r: Record): Record = {
      val base = NerTagger(r) // the base view rides along, like the reference
      val toks = base.labelViews.get("tokens").map(_.labels)
        .getOrElse(tokenSpans(base.rawText, source))
      val out = Vector.newBuilder[Span]
      var i = 0
      while (i < toks.size) {
        val t = toks(i)
        if (NerTagger.capInitial(t.label)) {
          var j = i + 1
          while (j < toks.size && NerTagger.capInitial(toks(j).label)) j += 1
          val lab =
            if (Months(t.label.toLowerCase)) "DATE"
            else if (j - i >= 2) "ORG"
            else "PERSON"
          out += Span(t.start, toks(j - 1).ending, lab, 1.0, source, Map.empty)
          i = j
        } else if (NerTagger.CardinalPattern.matcher(t.label).matches()) {
          val lab =
            if (YearPattern.matcher(t.label).matches()) "DATE"
            else if (IdPattern.matcher(t.label).matches()) "ID"
            else "CARDINAL"
          out += Span(t.start, t.ending, lab, 1.0, source, Map.empty)
          i += 1
        } else i += 1
      }
      addLabel(base, "ner-ext", Labeling(out.result(), source, 1.0))
    }
  }

  // --------------------------------------------------------------------
  // PARSE ("charniak"): deterministic shallow constituency tree per
  // sentence: S -> chunk nodes -> token leaves. Nodes stored preorder,
  // `top` = root index, children edges unlabeled (constituency).
  // --------------------------------------------------------------------
  object ConstituencyParser extends ViewOperator {
    val mode = AnnotationMode.PARSE
    val version = "1.0"

    def parseSentence(sent: Span, pos: Seq[Span], src: String): Tree = {
      val inSent = pos.filter(p => p.start >= sent.start && p.ending <= sent.ending)
      val nodes = Vector.newBuilder[TreeNode]
      // root placeholder at index 0, patched after children are laid out
      var rootChildren = Map.empty[Int, String]
      var next = 1
      val groups = groupChunks(inSent)
      val laid = groups.map { case (kind, toks) =>
        val chunkIdx = next
        next += 1
        val leafIdx = toks.indices.map(_ + next)
        next += toks.size
        (chunkIdx, kind, toks, leafIdx)
      }
      nodes += TreeNode("S", Span(sent.start, sent.ending, "S", 1.0, src, Map.empty),
        laid.map(g => g._1 -> "").toMap, 1.0)
      rootChildren = laid.map(g => g._1 -> "").toMap
      for ((_, kind, toks, leafIdx) <- laid) {
        nodes += TreeNode(kind,
          Span(toks.head.start, toks.last.ending, kind, 1.0, src, Map.empty),
          leafIdx.map(_ -> "").toMap, 1.0)
        for (tk <- toks) nodes += TreeNode(tk.label, tk.copy(source = src), Map.empty, 1.0)
      }
      Tree(nodes.result(), 0, 1.0)
    }

    private def groupChunks(pos: Seq[Span]): Seq[(String, Seq[Span])] = {
      val out = Vector.newBuilder[(String, Seq[Span])]
      var i = 0
      while (i < pos.size) {
        val kind0 = Chunker.chunkOf(pos(i).label)
        val kind = if (kind0 == "O") "X" else kind0
        var j = i + 1
        while (j < pos.size && {
          val k = Chunker.chunkOf(pos(j).label); (if (k == "O") "X" else k) == kind
        }) j += 1
        out += ((kind, pos.slice(i, j)))
        i = j
      }
      out.result()
    }

    def apply(r: Record): Record = {
      // PARSE depends only on TOKEN (AnnotationMode.java:211-213) — tag
      // tokens on the fly (pure per-token function) rather than demanding a
      // pos view.
      val pos = tokensOf(r).map(t => t.copy(label = PosTagger.tag(t.label)))
      val trees = sentencesOf(r).map(s => parseSentence(s, pos, source))
      addParse(r, mode.viewName, Forest(trees, source))
    }
  }

  /** STANFORD_PARSE: one multiparser emitting two Forest views
    * (`stanfordParse` constituency + `stanfordDep` dependencies), like the
    * reference's StanfordParserHandler (`CuratorReducer.java:882-889`). */
  object StanfordParser extends ViewOperator {
    val mode = AnnotationMode.STANFORD_PARSE
    val version = "1.0"
    def apply(r: Record): Record = {
      val toks = tokensOf(r)
      val sents = sentencesOf(r)
      // constituency: flat S over tokens
      val cTrees = sents.map { s =>
        val in = toks.filter(t => t.start >= s.start && t.ending <= s.ending)
        val nodes = TreeNode("S", Span(s.start, s.ending, "S", 1.0, source, Map.empty),
          in.indices.map(i => (i + 1) -> "").toMap, 1.0) +:
          in.map(t => TreeNode(t.label, t.copy(source = source), Map.empty, 1.0))
        Tree(nodes, 0, 1.0)
      }
      // dependencies: first verb-ish token is root; all others attach to it
      val dTrees = sents.map { s =>
        val in = toks.filter(t => t.start >= s.start && t.ending <= s.ending)
        if (in.isEmpty) Tree(Nil, -1, 1.0)
        else {
          val rootIdx = in.indexWhere(t => PosTagger.tag(t.label).startsWith("VB"))
          val root = if (rootIdx >= 0) rootIdx else 0
          val children = in.indices.filter(_ != root).map(_ -> "dep").toMap
          val nodes = in.zipWithIndex.map { case (t, i) =>
            TreeNode(t.label, t.copy(source = source),
              if (i == root) children else Map.empty, 1.0)
          }
          Tree(nodes, root, 1.0)
        }
      }
      addParse(addParse(r, "stanfordParse", Forest(cTrees, source)),
        "stanfordDep", Forest(dTrees, source))
    }
  }

  // --------------------------------------------------------------------
  // COREF: cluster mentions (NER spans) by case-insensitive surface string —
  // each cluster is one entity's mentions (`Clustering` = set-of-sets).
  // --------------------------------------------------------------------
  object CorefResolver extends ViewOperator {
    val mode = AnnotationMode.COREF
    val version = "1.0"
    def apply(r: Record): Record = {
      val ner = r.labelViews.getOrElse("ner",
        throw new AnnotationFailedException("missing dependency view: ner")).labels
      val clusters = ner.groupBy(s => r.rawText.substring(s.start, s.ending).toLowerCase)
        .toSeq.sortBy(_._1)
        .map { case (_, ms) =>
          Labeling(ms.map(_.copy(source = source)), source, 1.0)
        }
      r.copy(clusterViews = r.clusterViews +
        ("coref" -> Clustering(clusters, source, 1.0)))
    }
  }

  // --------------------------------------------------------------------
  // SRL: predicate-argument trees. Verbal predicates (VERB_SRL) are VP
  // chunks; nominal predicates (NOM_SRL) are derivational nouns. Arguments:
  // nearest NP chunk left = ARG0, nearest right = ARG1.
  // --------------------------------------------------------------------
  sealed abstract class SrlOperator extends ViewOperator {
    protected def predicates(r: Record, chunks: Seq[Span]): Seq[Span]
    def apply(r: Record): Record = {
      val chunks = r.labelViews.getOrElse("chunk",
        throw new AnnotationFailedException("missing dependency view: chunk")).labels
      val nps = chunks.filter(_.label == "NP")
      val trees = predicates(r, chunks).map { p =>
        val left = nps.filter(_.ending <= p.start).lastOption
        val right = nps.find(_.start >= p.ending)
        val args = (left.map(_ -> "ARG0") ++ right.map(_ -> "ARG1")).toSeq
        val children = args.indices.map(i => (i + 1) -> args(i)._2).toMap
        val nodes = TreeNode("PRED", p.copy(source = source), children, 1.0) +:
          args.map { case (s, role) => TreeNode(role, s.copy(source = source), Map.empty, 1.0) }
        Tree(nodes, 0, 1.0)
      }
      addParse(r, mode.viewName, Forest(trees, source))
    }
  }

  object VerbSrl extends SrlOperator {
    val mode = AnnotationMode.VERB_SRL
    val version = "1.0"
    protected def predicates(r: Record, chunks: Seq[Span]): Seq[Span] =
      chunks.filter(_.label == "VP")
  }

  object NomSrl extends SrlOperator {
    val mode = AnnotationMode.NOM_SRL
    val version = "1.0"
    private val nomSuffixes = Seq("tion", "ment", "ness", "ance", "ence")
    protected def predicates(r: Record, chunks: Seq[Span]): Seq[Span] =
      tokensOf(r).filter(t => nomSuffixes.exists(t.label.toLowerCase.endsWith))
        .map(_.copy(source = source))
  }

  // --------------------------------------------------------------------
  // WIKI: entity linking — NER spans get attribute maps (title/url/score),
  // the reference demo reads span attributes (`CuratorClient.java:1167-1175`).
  // --------------------------------------------------------------------
  object Wikifier extends ViewOperator {
    val mode = AnnotationMode.WIKI
    val version = "1.0"
    def apply(r: Record): Record = {
      val ner = r.labelViews.getOrElse("ner",
        throw new AnnotationFailedException("missing dependency view: ner")).labels
      val spans = ner.map { s =>
        val surface = r.rawText.substring(s.start, s.ending)
        val title = surface.replace(' ', '_')
        s.copy(label = title, source = source, attributes = Map(
          "title" -> title,
          "url" -> s"https://en.wikipedia.org/wiki/$title",
          "score" -> "1.0"))
      }
      addLabel(r, "wikifier", Labeling(spans, source, 1.0))
    }
  }

  /** The default operator registry. Open: callers may register additional
    * dynamic view producers (reference's `mention` demo,
    * `CuratorClient.java:1281-1308`) via `AnnotationEngine.withOperator`. */
  val registry: Map[AnnotationMode, ViewOperator] = Map(
    AnnotationMode.TOKEN -> Tokenizer,
    AnnotationMode.SENTENCE -> Sentencer,
    AnnotationMode.POS -> PosTagger,
    AnnotationMode.CHUNK -> Chunker,
    AnnotationMode.NER -> NerTagger,
    AnnotationMode.PARSE -> ConstituencyParser,
    AnnotationMode.STANFORD_PARSE -> StanfordParser,
    AnnotationMode.COREF -> CorefResolver,
    AnnotationMode.VERB_SRL -> VerbSrl,
    AnnotationMode.NOM_SRL -> NomSrl,
    AnnotationMode.WIKI -> Wikifier)
}
