package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions._

/** Text-analysis operators for LLM-training-data curation: language ID,
  * quality scoring, token counting, and document fingerprinting
  * (SURVEY.md §2 #31-34).
  *
  * Everything is pure `Column` arithmetic over built-in functions — no UDFs,
  * so the whole pipeline stays inside whole-stage codegen and scales as a
  * single narrow projection (plus one keyed shuffle for the fingerprint
  * bottom-k). At 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small: the heuristic is O(tokens x |list|)
    * comparisons inside codegen. */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "zu", "ein", "eine", "mit", "von", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "was", "for", "on"),
    "es" -> Seq("el", "la", "de", "y", "que", "un", "una", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "que", "un", "une", "pour", "dans", "les")
  )

  private def stopwordHits(tokens: Column, lang: String): Column =
    size(filter(tokens, t => t.isin(stopwords(lang): _*))).cast(LongType)

  /** Language ID: count stopword hits per candidate language, predict the
    * argmax (alphabetical-first tie-break, "und" = undetermined when no
    * list hits). One projection — no shuffle. */
  def langId(docs: DataFrame, textCol: String): DataFrame = {
    val toks = wsTokens(lower(col(textCol)))
    val scored = docs.withColumn("__toks", toks)
      .withColumn("hits_de", stopwordHits(col("__toks"), "de"))
      .withColumn("hits_en", stopwordHits(col("__toks"), "en"))
      .withColumn("hits_es", stopwordHits(col("__toks"), "es"))
      .withColumn("hits_fr", stopwordHits(col("__toks"), "fr"))
    val best = greatest(col("hits_de"), col("hits_en"), col("hits_es"), col("hits_fr"))
    scored
      .withColumn(
        "pred_lang",
        when(best === 0, lit("und"))
          .when(col("hits_de") === best, "de")
          .when(col("hits_en") === best, "en")
          .when(col("hits_es") === best, "es")
          .otherwise("fr"))
      .withColumn("lang_score",
        best.cast(DoubleType) / size(col("__toks")).cast(DoubleType))
      .drop("__toks")
  }

  /** Quality metrics: length / token / punctuation / stopword statistics
    * plus a composite score, as used to filter web corpora before training.
    * Pure arithmetic; integer counts divided once (bit-deterministic). */
  def quality(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = wsTokens(t)
    docs
      .withColumn("n_chars_q", length(t).cast(LongType))
      .withColumn("n_tokens", size(toks).cast(LongType))
      .withColumn("n_punct",
        (length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))).cast(LongType))
      .withColumn("n_digits",
        (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast(LongType))
      .withColumn("n_stopwords", stopwordHits(wsTokens(lower(t)), "en"))
      .withColumn("avg_token_len",
        (col("n_chars_q") - (col("n_tokens") - lit(1L))).cast(DoubleType) /
          col("n_tokens").cast(DoubleType))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .withColumn("punct_ratio",
        col("n_punct").cast(DoubleType) / col("n_chars_q").cast(DoubleType))
      .withColumn("quality_score",
        least(col("n_tokens").cast(DoubleType) / lit(50.0), lit(1.0)) * lit(0.5)
          + col("n_stopwords").cast(DoubleType) / col("n_tokens").cast(DoubleType) * lit(0.5))
  }

  /** Token counting: whitespace tokens, distinct tokens, and a BPE-ish
    * regex segmentation (letter runs / digit runs / single punctuation). */
  def tokenStats(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("ws_tokens", size(wsTokens(t)).cast(LongType))
      .withColumn("distinct_tokens", size(array_distinct(wsTokens(t))).cast(LongType))
      .withColumn("bpe_tokens",
        size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
          .cast(LongType))
  }

  /** Document fingerprint: bottom-k sketch over hashed word shingles —
    * the MinHash-style content signature used for fast containment checks.
    * md5-hex is used as the hash so the sketch is reproducible in any
    * engine. Computed entirely PER ROW (hash, sort, slice inside one
    * projection) — zero shuffle, so at 100 TB it runs at scan speed; the
    * earlier window-function formulation shuffled every shingle row. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 8): DataFrame =
    docs
      .select(
        col(idCol),
        posexplode(slice(
          sort_array(transform(
            array_distinct(wordShingles(col(textCol), shingleN)), s => md5(s))),
          1, k)))
      .toDF(idCol, "rk0", "sh_hash")
      .select(col(idCol), (col("rk0") + 1).cast(LongType).as("rk"), col("sh_hash"))
}
