package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §5).
  *
  * AQE's skew-join splitting handles most runtime skew; explicit salting is
  * the deterministic fallback when one natural key dominates (e.g. a
  * single viral profile owning 1% of a 100 TB fact table): the fact side
  * gets a random salt in [0, salts), the dim side is EXPLODED salts x (dims
  * are small — the blow-up is bounded), and the join key becomes
  * (key, salt), spreading the hot key over `salts` reducers.
  */
object Skew {

  /** Salt the big (probe) side: adds `__salt` in [0, salts). Uses a
    * deterministic per-row hash (not rand()) so retried tasks salt
    * identically — a requirement for exactly-once recomputes. */
  def saltLarge(df: DataFrame, hashCols: Seq[Column], salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(hashCols: _*), lit(salts)).cast("int"))

  /** Replicate the small (build) side across every salt value. */
  def replicateSmall(df: DataFrame, salts: Int): DataFrame =
    df.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))

  /** Salted equi-join: join on keys + matching salt, salt column dropped.
    * `saltBy` picks the entropy source on the large side (any unique-ish
    * columns — NOT the hot key itself). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltBy: Seq[Column], salts: Int): DataFrame =
    saltLarge(large, saltBy, salts)
      .join(replicateSmall(small, salts), keys :+ "__salt")
      .drop("__salt")
}
