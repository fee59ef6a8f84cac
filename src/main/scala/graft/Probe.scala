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
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = li
      .repartition(col("l_orderkey"))
      .dropDuplicates("l_orderkey", "l_partkey")
      .withColumn("m", count(lit(1)).over(w))
      .where(col("m").between(2L, 64L))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |    y -> struct(x AS part_a, y AS part_b))))""".stripMargin))
        .as("p"))
      .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
    time("pairs count (uncached)")(println("[probe] n=" + pairs.count()))
    val pc = pairs.persist()
    time("pairs persist+count")(println("[probe] n=" + pc.count()))
    val e = pc.distinct().persist()
    time("edges distinct+count")(println("[probe] n=" + e.count()))
    time("pair rollup (steady parts_copurchase shape)")(
      println("[probe] top=" + pc.groupBy("part_a", "part_b").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc).limit(20).collect().length))
    val adj = e.groupBy(col("part_a").as("p"))
      .agg(sort_array(collect_list(col("part_b"))).as("nbrs")).persist()
    time("adjacency build")(println("[probe] adj=" + adj.count()))
    val tri = e.join(adj.select(col("p").as("pa_"), col("nbrs").as("nbrs_a")),
        col("part_a") === col("pa_"))
      .join(adj.select(col("p").as("pb_"), col("nbrs").as("nbrs_b")),
        col("part_b") === col("pb_"))
      .select(col("part_a").as("ta"), col("part_b").as("tb"),
        explode(org.apache.spark.sql.graft.SortedLongIntersect(
          col("nbrs_a"), col("nbrs_b"))).as("tc"))
    time("triangle intersect count")(println("[probe] tri=" + tri.count()))
    // alternative pair generation: self-join instead of collect+slice-explode
    val dd = li.repartition(col("l_orderkey"))
      .dropDuplicates("l_orderkey", "l_partkey")
    val keep = dd.groupBy("l_orderkey").agg(count(lit(1)).as("m"))
      .where(col("m").between(2L, 64L)).select("l_orderkey")
    val dd2 = dd.join(keep, "l_orderkey")
    val pairs2 = dd2.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(dd2.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        "l_orderkey")
      .where(col("part_a") < col("part_b"))
      .select("part_a", "part_b")
    time("pairs2 self-join count")(println("[probe] n2=" + pairs2.count()))
    time("pairs2 again")(println("[probe] n2=" + pairs2.count()))
    println("[probe] collected=" + pairs2.collect().length)
    val fin = pairs2.queryExecution.executedPlan.toString
    println("[probe] final plan scans=" +
      fin.linesIterator.count(_.contains("Scan parquet")) +
      " reused=" + fin.linesIterator.count(_.contains("ReusedExchange")))
    println(fin.linesIterator.take(60).mkString("\n"))
    spark.stop()
  }
}
