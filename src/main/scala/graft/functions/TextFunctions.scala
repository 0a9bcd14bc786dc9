package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, built
  * from codegen'd built-ins (`org.apache.spark.sql.functions`) so they stay
  * inside whole-stage codegen — no UDFs on the 100TB path.
  */
object TextFunctions {

  /** Whitespace token count (single-space split — parity with the SQL
    * oracle's string_split).
    */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** A BPE-ish subword proxy: tokens ≈ ceil(chars / 4) blended with word
    * count — the standard cheap estimator for budgeting LLM token usage.
    */
  def tokenEstimate(text: Column): Column =
    greatest(ceil(length(text) / 4.0).cast("long"), tokenCount(text).cast("long"))

  /** Quality features: length, word count, mean word length, punctuation
    * ratio, uppercase ratio — the length/punct/stopword-ratio family.
    */
  def qualityFeatures(df: DataFrame, text: Column): DataFrame = {
    val words = tokenCount(text)
    df.withColumn("n_chars2", length(text))
      .withColumn("n_words", words)
      .withColumn("mean_word_len", round(length(text).cast("double") / words, 4))
      .withColumn("punct_chars", length(text) - length(regexp_replace(text, "[.,;:!?]", "")))
      .withColumn("upper_chars", length(text) - length(regexp_replace(text, "[A-Z]", "")))
      .withColumn("quality_score",
        round(when(words < 5, 0.0).otherwise(
          lit(1.0)
            - least(lit(0.5), col("punct_chars").cast("double") / greatest(col("n_chars2"), lit(1)))
            - least(lit(0.5), col("upper_chars").cast("double") / greatest(col("n_chars2"), lit(1)))), 4))
  }

  /** Stopword-hit count for one stopword, computed by length difference —
    * expressible identically in any SQL engine (oracle parity).
    */
  def stopwordHits(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val needle = s" $word "
    ((length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(needle), ""))) / needle.length).cast("int")
  }

  private val EnglishStop = Seq("the", "and", "of", "to", "in")
  private val FrenchStop = Seq("le", "la", "et", "les", "des")
  private val GermanStop = Seq("der", "die", "und", "das", "ist")

  /** n-gram/stopword-heuristic language ID over a text column: counts
    * stopword hits per language, argmax with deterministic tie-break.
    */
  def langId(text: Column): Column = {
    def score(ws: Seq[String]) = ws.map(w => stopwordHits(text, w)).reduce(_ + _)
    val en = score(EnglishStop); val fr = score(FrenchStop); val de = score(GermanStop)
    when(en >= fr && en >= de && en > 0, "en")
      .when(fr >= de && fr > 0, "fr")
      .when(de > 0, "de")
      .otherwise("unknown")
  }

  /** Document fingerprint: md5 of the lowercased text (built-in, codegen'd,
    * oracle-replayable; the exact-match dedup key).
    */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** Word shingles (n-grams of tokens) — the dedup unit for MinHash /
    * Jaccard. One-pass codegen expression: the equivalent built-in chain
    * (split + transform + slice) inlines the tokenization into every lambda
    * element and goes O(words²) per document (see [[VecHash.wordShingles]]).
    */
  def wordShingles(text: Column, n: Int): Column = hashfns.word_shingles(text, n)
}
