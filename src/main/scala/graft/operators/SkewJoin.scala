package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations on hot keys.
  *
  * At 100 TB a handful of hot keys (one power user, one null-ish default)
  * can pin a single reducer for hours. Two standard remedies, both
  * implemented declaratively so Catalyst/AQE still optimize around them:
  *
  *  - **Salted join** (`saltedJoin`): the skewed (large) side gets a
  *    random-but-deterministic salt in [0, S); the small side is
  *    replicated S ways with an exploded salt column; the join key
  *    becomes (key, salt), spreading each hot key over S reducers.
  *    Exact same result set as the unsalted join.
  *  - **Two-phase aggregation** (`saltedCount`): partial aggregate on
  *    (key, salt), then final aggregate on key — the map-side combine
  *    Spark already does, made explicit when a custom agg defeats it.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) solves the same problem at runtime by splitting oversized
  * partitions; salting remains the portable plan-level tool when AQE
  * can't see the skew (e.g. pre-shuffle aggregation states).
  */
object SkewJoin {

  /** Deterministic salt in [0, buckets): hash of the row's key plus a
    * disambiguator column (so equal keys still spread). */
  private def salt(key: Column, spread: Column, buckets: Int): Column =
    pmod(hash(key, spread), lit(buckets))

  /** Join `big` (skewed on `key`) with `small`, spreading each key over
    * `buckets` reducers. `spread` should be any column that varies within
    * a key group (a row id). Result equals `big.join(small, key)`. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      spread: String, buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", salt(col(key), col(spread), buckets))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    // shuffle_hash pins the shuffled (key, salt) exchange the salt exists
    // to spread — salting targets relations too big to broadcast, and at
    // test scale AQE would otherwise pick a broadcast plan that neither
    // shuffles nor demonstrates the technique
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase count per key: (key, salt) partial → key final. */
  def saltedCount(df: DataFrame, key: String, spread: String, buckets: Int): DataFrame =
    df
      .groupBy(col(key), salt(col(key), col(spread), buckets).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(key)
      .agg(sum("__partial").as("n"))
}
