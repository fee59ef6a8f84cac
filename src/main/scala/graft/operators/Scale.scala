package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale techniques as reusable utilities (SURVEY.md §4). These are the
  * knobs a 100 TB deployment reaches for when AQE alone isn't enough:
  * salting for pathological key skew, bucketing for repeated co-located
  * joins on the same key.
  */
object Scale {

  /** Two-phase salted aggregation for skewed keys: phase 1 counts/sums on
    * (key, salt) so a hot key spreads over `buckets` reducers; phase 2
    * merges the (|keys| × buckets)-sized partials. Result ≡
    * `df.groupBy(key).agg(count, sum(valueCol))` for any salt function —
    * the salt only moves rows between reducers. */
  def saltedAgg(df: DataFrame, key: String, valueCol: String, buckets: Int): DataFrame =
    df
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))

  /** Write both sides bucketed+sorted by the join key so subsequent joins
    * need no exchange (bucket-pruned SortMergeJoin over co-located files).
    * The returned names are registered tables; join them with
    * autoBroadcastJoinThreshold=-1 to see the exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
