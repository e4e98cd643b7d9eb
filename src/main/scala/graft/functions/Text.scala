package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders composed from native (codegen'd)
  * `org.apache.spark.sql.functions` — no UDFs. Semantics are mirrored
  * 1:1 by the DuckDB oracle SQL in the operator modules, so keep both in
  * sync when editing.
  */
object Text {

  /** Whitespace tokenization of trimmed text. `split` on an empty string
    * yields `[""]` in both Spark and DuckDB (`regexp_split_to_array`) —
    * parity preserved.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles: join every n consecutive tokens with a space.
    * Empty result when fewer than n tokens. Codegen kernel — the HOF
    * formulation (transform + slice + array_join) stays outside
    * whole-stage codegen and allocates per gram.
    */
  def shingles(toks: Column, n: Int): Column = Exprs.word_ngrams(toks, n)

  /** Distinct token set (order-normalized for set similarity). */
  def tokenSet(text: Column): Column = array_sort(array_distinct(tokens(text)))

  /** The classic UTF-8-read-as-Latin-1 mojibake sequences and their
    * repairs — the high-frequency subset an ftfy-style pass fixes,
    * each bad form computed as utf8(good) re-read as cp1252 (with the
    * unprintable 0x80–0x9F gaps dropped, which is why the close-quote
    * survives only as the bare "â€"). Literal string replaces (exact,
    * no regex), mirrored verbatim by the oracle; longer sequences run
    * first so shared prefixes can't half-match. */
  val MojibakeFixes: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€œ" -> "“", "â€“" -> "–", "â€”" -> "—", "â€¦" -> "…",
    "â€" -> "”", "Ã©" -> "é", "Ã¨" -> "è", "Ã¡" -> "á", "Ã³" -> "ó",
    "Ãº" -> "ú", "Ã±" -> "ñ", "Ã§" -> "ç", "Ã¼" -> "ü", "Ã¶" -> "ö",
    "Ã¤" -> "ä", "Ãª" -> "ê", "Ã´" -> "ô", "Ã«" -> "ë", "Ã‰" -> "É")

  /** Repair double-encoded text — single-pass longest-match codegen
    * kernel ([[TextKernels.fixMojibake]]); a chain of replaces is
    * unsound when repairs are adjacent (the chain's own output can
    * complete a later pattern). Stateless, no shuffle, fuses with the
    * other shaping passes. */
  def fixMojibake(text: Column): Column = Exprs.fix_mojibake(text)

  /** Plain-text extraction from raw HTML (the WET-extraction shape):
    * script/style blocks go first (content and all), then every
    * remaining tag becomes a space, the four ubiquitous entities decode,
    * and whitespace collapses. Pure `regexp_replace` chain — codegen,
    * stateless, fusable with the other shaping passes; patterns use the
    * RE2-compatible subset ((?s), non-greedy) so the DuckDB oracle runs
    * them verbatim. */
  def stripHtml(html: Column): Column = {
    // comments strip FIRST: a commented-out '<script>' would otherwise
    // make the script pass consume real body text up to the next real
    // '</script>' (and legacy '<script><!-- code //--></script>' still
    // works — the comment empties the element, the script pass removes
    // the shell). They also must go whole before the generic tag pass,
    // which consumes a comment only up to its first '>'.
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComments, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    // &amp; decodes LAST: an author writing &amp;lt; escaped the
    // ampersand precisely so &lt; renders literally — decoding &amp;
    // first would double-decode it into a real '<'
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      noTags, "&lt;", "<"), "&gt;", ">"), "&nbsp;", " "), "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  // Small per-language marker-word lists for the n-gram/stopword heuristic
  // language ID. Mirrored literally in the oracle SQL.
  val EN: Seq[String] = Seq("the", "and", "of", "to", "in", "is", "a")
  val ES: Seq[String] = Seq("el", "la", "los", "de", "que", "y", "en")
  val FR: Seq[String] = Seq("le", "la", "les", "et", "des", "un", "est")
  val DE: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein")
  val PT: Seq[String] = Seq("o", "os", "de", "que", "e", "uma", "um")

  private def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Heuristic language ID: CJK codepoints → zh, else argmax of
    * marker-word hits with a fixed priority order (en,es,fr,de,pt), und
    * when no marker hits at all.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val en = markerCount(toks, EN)
    val es = markerCount(toks, ES)
    val fr = markerCount(toks, FR)
    val de = markerCount(toks, DE)
    val pt = markerCount(toks, PT)
    val top = greatest(en, es, fr, de, pt)
    // explicit null-in-null-out: with a null text every when-condition
    // evaluates null (≡ false) and the otherwise would label the doc
    // 'pt' — a null document must not be classified at all
    when(text.isNull, lit(null).cast("string"))
      .when(text.rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
      .when(top === 0, "und")
      .when(en === top, "en")
      .when(es === top, "es")
      .when(fr === top, "fr")
      .when(de === top, "de")
      .otherwise("pt")
  }

  /** Number of non-alphanumeric, non-space characters. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))

  /** Stopword ratio over EN markers (quality signal). */
  def stopwordCount(text: Column): Column =
    markerCount(tokens(lower(text)), EN)

  /** Composite quality score in [0,1]: length component + low-punctuation
    * component + stopword-presence component. Deterministic, mirrored in
    * the oracle SQL.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val nTok = size(tokens(text)).cast("double")
    val lenScore = least(len / lit(500.0), lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(len, lit(1.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(nTok, lit(1.0))
    // null text must score null, not 0.7: least/greatest IGNORE nulls in
    // Spark, so without the guard a null doc collects the full length
    // and stopword credits and sails through quality gates
    when(text.isNotNull, round(
      lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - least(punctRatio * 5, lit(1.0))) +
        lit(0.3) * least(stopRatio * 4, lit(1.0)),
      4))
  }
}
