package graft
import org.apache.spark.sql.functions._
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(args(0))
    def run(): Long = spark.range(0, 4000000000L, 1, 256)
      .select(sum(hash(col("id") * 31 + 7)).as("h")).collect()(0).getLong(0)
    run()
    val t0 = System.nanoTime(); run()
    println(f"CPUPROBE cpus=${args(0)} ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
