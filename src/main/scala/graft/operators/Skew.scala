package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys (SURVEY.md §7.4.6) — the 100 TB
  * posture for aggregations whose key distribution is Zipfian (a handful
  * of users produce most events).
  *
  * AQE's skew-join splitting covers joins at runtime; for aggregations
  * the classic fix is SALTING: append a random-but-deterministic salt to
  * the key, aggregate partially per (key, salt) — spreading a hot key
  * over `salts` reducers — then aggregate the partials per key. Both
  * phases are ordinary shuffles; associative aggregates compose exactly.
  *
  * MEASURED SCOPE (r13, `graft.Scale zipf` — SCALING.md): for a
  * DISTRIBUTIVE aggregate the plain `groupBy` is already flat under a
  * 20%-of-volume hot key (reducer-max task 207 vs 208 ms salted at 5M
  * rows, 278 vs 293 ms at 50M), because hash aggregation partially
  * aggregates map-side — each reducer receives at most one partial row
  * per (key, map partition). Reach for salting only where partial
  * aggregation cannot collapse the payload (collect_list-shaped
  * aggregates, or pre-aggregation joins where AQE's split is the first
  * line); for sum/count/min/max it is a measured no-op that adds a
  * shuffle phase.
  */
object Skew {

  /** Deterministic salt in [0, salts): cheap, uniform, and derived from a
    * high-cardinality disambiguator column (e.g. event_id) so one hot
    * key's rows spread evenly.
    */
  def salt(disambiguator: Column, salts: Int): Column =
    pmod(xxhash64(disambiguator), lit(salts)).cast("int")

  /** Two-phase salted sum/count per key: exactly `groupBy(key).agg(sum,
    * count)` but with the hot key's first-phase load spread over `salts`
    * reducers. Returns (key, sum_v, n).
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     disambiguator: Column, salts: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"), salt(disambiguator, salts).as("s"))
      .groupBy("k", "s")
      .agg(sum("v").as("pv"), count(lit(1)).as("pn")) // partial per (key, salt)
      .groupBy("k")
      .agg(sum("pv").as("sum_v"), sum("pn").as("n")) // final per key
}
