package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fuzzy record linkage (entity resolution): find all record pairs whose
  * key strings are within edit distance 1 — duplicate author names,
  * typo'd entities, OCR'd near-identical titles — WITHOUT the quadratic
  * name × name cross the naive formulation implies.
  *
  * Candidate scheme: deletion-neighborhood blocking (FastSS / SymSpell).
  * Every name expands to {itself} ∪ {its single-character deletions} —
  * a linear |name|+1 per-row expansion. Any two strings within
  * levenshtein distance 1 share at least one variant (substitution: both
  * sides delete the differing position; insert/delete: the longer side's
  * deletion equals the shorter string verbatim), so ALL true pairs
  * surface from a plain hash equi-join on the variant. Variant sharing
  * overshoots ("ab"/"ba" share "b" at distance 2), so the exact
  * levenshtein verifies every candidate — the standard generate-and-
  * verify contract, with recall guaranteed by construction.
  *
  * Scale posture (100 TB): the join shuffles 8-byte variant hashes plus
  * the short key strings — never records; candidate buckets are bounded
  * by alphabet × positions for natural keys, and `maxVariantFreq`
  * drops degenerate hot variants (the stop-shingle cap posture from
  * [[Dedup]]) before the self-join on adversarial distributions.
  */
object Linkage {

  /** All id pairs with `levenshtein(name1, name2) <= 1` (ids ordered
    * `id1 < id2`), each with both names and the exact distance. */
  def fuzzyPairs(records: DataFrame, idCol: String, nameCol: String,
      maxVariantFreq: Option[Long] = None): DataFrame = {
    // round-robin repartition before the deletion-variant explode: the
    // records scan is one task (single-row-group parquet) and the
    // variant generation (|name|+1 substring builds + hashes per row)
    // is real per-row compute that otherwise runs serially — and the
    // self-join embeds the subtree TWICE (the ngram_diversity pattern)
    val base = records
      .repartition(records.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), col(nameCol).as("name"))
    val nm = col("name")
    // deletion variants via a per-row HOF over a tiny (|name|+1) array —
    // the "small per-row arrays" case where an interpreted HOF is fine
    val dels = transform(sequence(lit(1), length(nm)),
      i => concat(nm.substr(lit(1), i - lit(1)), nm.substr(i + lit(1), length(nm) - i)))
    val vars1 = base
      .select(col("id"), explode(array_union(array(nm), dels)).as("variant"))
      // join on the 64-bit hash: the self-join shuffles two 8-byte longs
      // per row — names rejoin only AFTER the pair distinct, so the
      // candidate blowup (multi-variant sharers, false sharers) never
      // carries string payload (collision odds ~2^-64)
      .select(col("id"), xxhash64(col("variant")).as("vh"))
    val vars = maxVariantFreq match {
      case Some(cap) =>
        // drop degenerate hot variants before the self-join; AQE sizes
        // the anti-join from the actual post-filter `hot` cardinality
        val hot = vars1.groupBy("vh").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("vh")
        vars1.join(hot, Seq("vh"), "left_anti")
      case None => vars1
    }
    vars.as("a")
      .join(vars.as("b"),
        col("a.vh") === col("b.vh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
      .join(base.select(col("id").as("id1"), col("name").as("name1")), "id1")
      .join(base.select(col("id").as("id2"), col("name").as("name2")), "id2")
      // threshold form: banded O(len·k) DP with early exit (-1 when the
      // distance exceeds the bound) instead of the full O(len²) matrix —
      // the verify step runs once per candidate, so the band matters
      .withColumn("dist", levenshtein(col("name1"), col("name2"), 1).cast(LongType))
      .filter(col("dist") >= 0 && col("dist") <= 1)
      .select("id1", "name1", "id2", "name2", "dist")
  }
}
