package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway local profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // warm
    li.groupBy("l_returnflag").count().collect()
    def q1Dec() = li
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,4)"))
          .cast("decimal(18,4)").cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)"))
          .cast("decimal(18,4)").cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast("decimal(18,4)")
          * (lit(BigDecimal(1)).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))))
          .cast("decimal(18,4)").cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    def q1Long() = li
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity") * 10000).cast("long").as("qty4"),
        round(col("l_extendedprice") * 10000).cast("long").as("price4"),
        round(col("l_discount") * 10000).cast("long").as("disc4"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(col("qty4")).cast("decimal(38,0)").cast("decimal(38,4)")
          / lit(10000)).cast("decimal(18,4)").cast("double").as("sum_qty"),
        (sum(col("price4")).cast("decimal(38,0)").cast("decimal(38,4)")
          / lit(10000)).cast("decimal(18,4)").cast("double").as("sum_base_price"),
        (sum(col("price4") * (lit(10000L) - col("disc4"))).cast("decimal(38,0)")
          .cast("decimal(38,8)") / lit(100000000L)).cast("decimal(18,4)")
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    def q1Hybrid() = li
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity") * 10000).cast("long").as("qty4"),
        round(col("l_extendedprice") * 10000).cast("long").as("price4"),
        round(col("l_discount") * 10000).cast("long").as("disc4"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(col("qty4").cast("decimal(38,0)")).cast("decimal(38,4)")
          / lit(10000)).cast("decimal(18,4)").cast("double").as("sum_qty"),
        (sum(col("price4").cast("decimal(38,0)")).cast("decimal(38,4)")
          / lit(10000)).cast("decimal(18,4)").cast("double").as("sum_base_price"),
        (sum((col("price4") * (lit(10000L) - col("disc4"))).cast("decimal(38,0)"))
          .cast("decimal(38,8)") / lit(100000000L)).cast("decimal(18,4)")
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    // r14: the scale-safe 128-bit-accumulator path (Int128Sum) — expected
    // to match the all-long probe's speed with NO overflow bound.
    def q1I128() = {
      import org.apache.spark.sql.graft.Int128Sum.{fixedPoint, sumLongs, unscaled}
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          fixedPoint(col("l_quantity"), 4)
            .cast("decimal(18,4)").cast("double").as("sum_qty"),
          fixedPoint(col("l_extendedprice"), 4)
            .cast("decimal(18,4)").cast("double").as("sum_base_price"),
          sumLongs(unscaled(col("l_extendedprice"), 4)
            * (lit(10000L) - unscaled(col("l_discount"), 4)), 8)
            .cast("decimal(18,4)").cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }
    (1 to 3).foreach { i =>
      time(s"q1 decimal pass $i")(q1Dec().write.mode("overwrite").format("noop").save())
      time(s"q1 long pass $i")(q1Long().write.mode("overwrite").format("noop").save())
      time(s"q1 hybrid pass $i")(q1Hybrid().write.mode("overwrite").format("noop").save())
      time(s"q1 int128 pass $i")(q1I128().write.mode("overwrite").format("noop").save())
    }
    val c = q1Hybrid().orderBy("l_returnflag", "l_linestatus").collect()
    val a = q1Dec().orderBy("l_returnflag", "l_linestatus").collect()
    val b = q1Long().orderBy("l_returnflag", "l_linestatus").collect()
    val d = q1I128().orderBy("l_returnflag", "l_linestatus").collect()
    println("[probe] equalLong=" + (a.map(_.toString).mkString("|") == b.map(_.toString).mkString("|"))
      + " equalHybrid=" + (a.map(_.toString).mkString("|") == c.map(_.toString).mkString("|"))
      + " equalInt128=" + (a.map(_.toString).mkString("|") == d.map(_.toString).mkString("|")))
    spark.stop()
  }
}
