package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** The reference's cleaning-operator menu, re-expressed as composable
  * DataFrame ops (reference: dags/scripts/rust_twitter_steam_dims.py and
  * rust_twitter_steam_facts.py — dropna/fillna/rename/astype/
  * drop_duplicates/conditional-replace appear in every transform).
  *
  * Every op is a narrow projection or a single keyed shuffle; nothing pulls
  * data to the driver, so all of them scale linearly with input size.
  */
object Cleaning {

  implicit class CleaningOps(val df: DataFrame) extends AnyVal {

    /** pandas `dropna(subset=...)` (reference: dims.py:33). */
    def dropNaSubset(cols: Seq[String]): DataFrame = df.na.drop(cols)

    /** pandas `fillna(value={...})` (reference: facts.py:115-123). */
    def fillNaValues(values: Map[String, Any]): DataFrame = df.na.fill(values)

    /** pandas `rename(columns={...})` (reference: dims.py:500-516). */
    def renameColumns(renames: Map[String, String]): DataFrame =
      renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

    /** pandas `astype({...})` (reference: dims.py:519-530). */
    def castColumns(casts: Map[String, DataType]): DataFrame =
      casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }

    /** pandas conditional assignment `df.loc[cond, col] = value`
      * (reference: dims.py:29 — empty description replaced by name). */
    def replaceWhere(colName: String, cond: Column, value: Column): DataFrame =
      df.withColumn(colName, when(cond, value).otherwise(col(colName)))

    /** pandas `drop_duplicates(subset=keys)` with DETERMINISTIC keep-first
      * semantics (pandas keeps first occurrence in file order; Spark's
      * dropDuplicates picks an arbitrary row, so we define "first" by an
      * explicit total order). One shuffle on the key — scales.
      * (reference: dims.py:43,140,291,425,533) */
    def dedupKeepFirst(keys: Seq[String], order: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
  }
}
