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

  /** Salted replicated-build join for skewed join keys — the manual form of
    * what AQE's skew-join does with runtime stats: the build side is
    * replicated `buckets`× (one copy per salt value) and the probe side
    * scatters each hot key over `buckets` reducers via a deterministic
    * per-row salt, so no single task takes a whole hot key. Result ≡
    * `probe.join(build, key)` for any salt expression. Build-side cost is
    * |build| × buckets rows — use for build sides too big to broadcast but
    * far smaller than the probe side. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltCol: org.apache.spark.sql.Column, buckets: Int): DataFrame =
    probe
      .withColumn("__salt", pmod(saltCol, lit(buckets)))
      // shuffle_hash pins the shuffled join the salt exists for — a build
      // side small enough for the planner to broadcast wouldn't need
      // salting in the first place
      .join(build.withColumn("__salt",
          explode(array((0 until buckets).map(lit): _*))).hint("shuffle_hash"),
        Seq(key, "__salt"))
      .drop("__salt")

  /** Write both sides bucketed+sorted by the join key so subsequent joins
    * need no exchange (bucket-pruned SortMergeJoin over co-located files).
    * The returned names are registered tables; join them with
    * autoBroadcastJoinThreshold=-1 to see the exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Hive-style partitioned layout (`out/col=value/part-*.parquet`): the
    * standard way a 100 TB corpus store is laid out so per-partition
    * queries (one language, one source, one dump date) read only matching
    * directories — the scan's PartitionFilters prune everything else
    * without touching file footers. */
  def writePartitioned(df: DataFrame, out: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(out)
}
