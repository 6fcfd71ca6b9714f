package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators — all pure Column
  * expressions (codegen'd, no UDFs), with semantics chosen so the DuckDB
  * oracle can state the identical computation (same regexes, same float
  * ops, floor-based rounding).
  */
object TextFunctions {

  /** lower + trim + whitespace collapse. */
  def normalize(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** BPE-ish subtoken count: letter runs, digit runs, single other chars. */
  val subtokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def subtokenCount(text: Column): Column =
    size(regexp_extract_all(normalize(text), lit(subtokenPattern), lit(0)))

  /** Language marker lists (tiny stopword profiles). Kept in sync with the
    * SQL literals in TextQueries.
    */
  val enStop = Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")
  val esStop = Seq("el", "la", "de", "que", "los", "un", "una", "por")
  val deStop = Seq("der", "die", "das", "und", "ist", "nicht", "ein")
  val frStop = Seq("le", "la", "les", "des", "et", "un", "une", "dans")

  def hitCount(toks: Column, words: Seq[String]): Column = {
    val stoplist = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(stoplist, t)))
  }

  /** Deterministic truncation to n decimal places (engine-portable: IEEE
    * double multiply, floor, divide — identical in Spark and DuckDB, unlike
    * round() whose half-way behavior differs).
    */
  def detRound(x: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(x * lit(p)) / lit(p)
  }

  /** Rolling polynomial fingerprint is md5 of the normalized text — portable
    * across engines; shingle count rides along for LSH sizing.
    */
  def fingerprint(text: Column): Column = md5(normalize(text))
}
