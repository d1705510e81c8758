package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Everything is built from codegen'd `functions._` expressions — no UDFs
  * in the hot path, so whole-stage codegen spans the full pipeline and the
  * operators scale linearly with a parquet scan at 100 TB (pure map-side,
  * zero shuffles).
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: alternating letter-runs / digit-runs /
    * punctuation as separate tokens (a cheap stand-in for a real BPE
    * vocabulary, still a single regex scan).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Character-class ratio helpers (single regexp pass each). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^!-/:-@\\[-`{-~]", "")) /
        length(text).cast("double"))

  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^A-Za-z]", "")) /
        length(text).cast("double"))

  private val StopwordsEn = Seq("the", "a", "an", "and", "or", "of", "in",
    "to", "is", "are", "was", "for", "on", "with", "as", "by", "at", "it")

  /** Occurrence count of tokens belonging to a fixed marker set, via the
    * fused native expression (functions.TokenSetCountExpr): one compiled
    * pass with a hash probe per token. The HOF formulation
    * `size(filter(toks, _.isin(markers)))` runs the lambda interpreted
    * with a linear literal scan per element — a real cost on the
    * full-corpus lang-id/quality scans.
    */
  def countInSet(toks: Column, markers: Seq[String]): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_count_in_set", toks,
      array(markers.map(lit): _*))
  }

  /** Fraction of tokens that are English stopwords — a quality/fluency
    * signal (natural prose sits around 0.3–0.5; keyword soup near 0).
    */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) === 0, 0.0)
      .otherwise(countInSet(toks, StopwordsEn) / size(toks).cast("double"))
  }

  /** Engine-portable round-half-up for NON-NEGATIVE doubles:
    * floor(x·10^dp + 0.5)/10^dp, the same arithmetic in any engine.
    * Spark's round() rounds the SHORTEST DECIMAL REPRESENTATION of the
    * double (BigDecimal.valueOf goes through Double.toString), while
    * DuckDB rounds the binary value — a double just below an exact
    * x.xxx5 boundary whose shortest repr IS the boundary rounds UP in
    * Spark and DOWN in DuckDB (bit one sf0.1 quality row: 0.65774999…
    * prints as "0.65775"). Ratios of small integers land on such
    * boundaries constantly, so every ratio-valued oracle column must go
    * through this instead of round().
    */
  def portableRound(c: Column, dp: Int): Column = {
    val p = math.pow(10, dp)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** The matching DuckDB fragment (same doubles, same floor). */
  def portableRoundSql(e: String, dp: Int): String = {
    val p = "1" + "0" * dp
    s"floor(($e) * $p + 0.5) / $p"
  }

  /** Composite quality score in [0,1]: length sweet-spot × low punctuation
    * × presence of stopwords. Deliberately simple and fully declarative.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text) / lit(500.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 4, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 3, lit(1.0))
    portableRound((lenScore + punctScore + stopScore) / 3, 4)
  }

  /** N-gram-frequency language ID over a tiny built-in profile set.
    * The score for each language is the stopword-hit fraction of tokens;
    * argmax wins, 'und' when nothing hits. (A real system ships char-3-gram
    * profiles; the operator shape — per-language score columns + argmax —
    * is identical.)
    */
  private val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> StopwordsEn,
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un",
      "una", "por", "con", "para", "es"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "en", "un", "une",
      "du", "que", "pour", "dans", "est"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu",
      "mit", "auf", "ist", "ein", "eine", "nicht"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = split(lower(trim(text)), "\\s+")
    LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      lang -> when(size(toks) === 0, 0.0)
        .otherwise(countInSet(toks, markers) /
          size(toks).cast("double"))
    }
  }

  def langId(text: Column): Column = {
    // argmax via array_max over (score, rank, lang) structs: each score
    // expression appears ONCE in the plan. The earlier when()-chain
    // reduce duplicated the accumulated branches per comparison level —
    // 2^(n-1) copies of the first language's whole score tree — which
    // bloated codegen compilation and evaluation. Rank = reverse sorted
    // position, so score ties resolve to the alphabetically-first
    // language, identical to the chain's keep-first semantics (and to
    // the DuckDB oracle's CASE order).
    val scores = langScores(text)
    val n = scores.size
    val packed = array(scores.zipWithIndex.map { case ((lang, sc), i) =>
      struct(sc.as("s"), lit(n - 1 - i).as("r"), lit(lang).as("l"))
    }: _*)
    val best = array_max(packed)
    // null text short-circuits to 'und': without the guard, every score
    // is null and argmax would pick an arbitrary language
    when(text.isNull, "und")
      .when(best.getField("s") <= 0.0, "und")
      .otherwise(best.getField("l"))
  }

  /** Stable document fingerprint: md5 of whitespace-normalized lowercase
    * text (the exact-dedup key).
    */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit rolling content hash over tokens: h' = xxhash64(h, token),
    * folded left over the token stream — order-sensitive, so
    * near-identical docs with swapped words get different prints (unlike
    * a bag-of-words hash). Chained hashing instead of polynomial
    * multiply keeps the fold ANSI-safe (no long overflow).
    */
  def rollingHash(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    aggregate(toks, lit(0L), (acc, t) => xxhash64(acc, t))
  }

  /** Order-sensitive chained md5 fingerprint over tokens:
    * h' = md5(h || " " || token), folded left from "". Same
    * order-sensitivity as rollingHash but built from the engine-portable
    * md5 primitive, so it is DuckDB-oracle-checkable end to end (xxhash64
    * chains are Spark-specific). Use rollingHash when only Spark needs to
    * reproduce the print (2 longs of state vs a 32-char string).
    */
  def chainedMd5(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    aggregate(toks, lit(""), (acc, t) => md5(concat(acc, lit(" "), t)))
  }

  /** Engine-portable deterministic sampling predicate: keep a row when
    * the first two hex chars of its content fingerprint fall below the
    * threshold derived from `fraction` (resolution 1/256). Reproducible
    * across runs, engines, partitionings and cluster sizes — the
    * property a training pipeline needs for stable held-out splits,
    * which `rand()` / TABLESAMPLE cannot give. Content-keyed, so exact
    * duplicates land on the same side of the split.
    */
  def sampleByFingerprint(text: Column, fraction: Double): Column =
    substring(fingerprintMd5(text), 1, 2) <= lit(hexThreshold(fraction))

  /** Two-hex-char upper bound implementing sample rate `r` (resolution
    * 1/256, clamped to [1/256, 1]). The single source of truth for the
    * fingerprint-sampling threshold — Curation's per-stratum rates and
    * the weighted-sample DuckDB oracle compare against the same literal.
    */
  def hexThreshold(r: Double): String = {
    require(r > 0.0 && r <= 1.0, s"rate must be in (0,1], got $r")
    f"${math.max(1, math.round(r * 256).toInt) - 1}%02x"
  }

  /** Canonical text normalization for training corpora: lowercase, strip
    * everything but [a-z0-9] and whitespace, collapse whitespace runs,
    * trim. Pure codegen'd regexp chain — map-side at any scale.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))
}
