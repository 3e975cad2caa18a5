package graft.tools
import org.apache.spark.sql.functions._
object Q61Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("32")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def time(n: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q61probe] $n%-24s ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    // warm-up full query
    graft.SparkEntry.queries("q61_bloom_prune")(spark, dir).count()
    time("full query (warm)") { graft.SparkEntry.queries("q61_bloom_prune")(spark, dir).count() }
    val smallKeys = t("customer").where(col("c_nationkey") < 5)
      .select(col("c_custkey").cast("string")).distinct().as[String]
    time("buildBits only") { graft.ops.Bloom.buildBits(smallKeys, 1 << 12, 4) }
    val bits = graft.ops.Bloom.buildBits(smallKeys, 1 << 12, 4)
    val large = t("orders").select(col("o_orderkey"), col("o_custkey"), col("o_custkey").cast("string").as("key"))
    time("pruneWithBits count") { graft.ops.Bloom.pruneWithBits(large, "key", bits, 1 << 12, 4).count() }
    time("orders scan count") { large.count() }
    time("full query again") { graft.SparkEntry.queries("q61_bloom_prune")(spark, dir).count() }
    // HOF variant: h1/h2 referenced ONCE -> 2 md5/row instead of 8
    val m = 1 << 12; val k = 4
    def hofPrune() = {
      val staged = large
        .withColumn("__bloom_bits", typedLit(bits.toSeq))
        .withColumn("__bloom_h1",
          graft.ops.TextOps.hexInt(concat(col("key"), lit("_h1"))) % m)
        .withColumn("__bloom_h2",
          graft.ops.TextOps.hexInt(concat(col("key"), lit("_h2"))) % m)
      val pass = expr(
        s"""forall(transform(sequence(0, ${k - 1}),
           |  j -> (__bloom_h1 + j * __bloom_h2) % $m),
           |  p -> (shiftright(element_at(__bloom_bits,
           |    CAST(p div 64 AS INT) + 1), CAST(p % 64 AS INT)) & 1) = 1)""".stripMargin)
      staged.where(pass).drop("__bloom_bits", "__bloom_h1", "__bloom_h2")
    }
    time("hof prune count (warm1)") { hofPrune().count() }
    time("hof prune count (warm2)") { hofPrune().count() }
    val a = graft.ops.Bloom.pruneWithBits(large, "key", bits, m, k).count()
    val b = hofPrune().count()
    println(s"[q61probe] parity: classic=$a hof=$b ${if (a == b) "OK" else "MISMATCH"}")
    spark.stop()
  }
}
