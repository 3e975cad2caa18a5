package graft
import org.apache.spark.sql.functions._

/** Host-regime control: a PURE whole-stage-codegen kernel (range →
  * hash → sum over 256 granules) with no IO, no shuffle beyond the
  * final reduce, and no library code — its wall time moves only with
  * the host's effective CPU throughput. Every bench artifact embeds
  * [[control]] from the SAME JVM and window so round-over-round
  * comparisons can be read as wall / control (regime-normalized)
  * alongside raw seconds: this shared VM drifts 30-45% across sessions
  * (documented in BENCH/DEDUP_SF1.md), which otherwise costs a day of
  * adjudication per round.
  */
object CpuProbe {

  /** One warm pass then one timed pass of the control kernel. */
  def control(spark: org.apache.spark.sql.SparkSession): Double = {
    def run(): Long = spark.range(0, 4000000000L, 1, 256)
      .select(sum(hash(col("id") * 31 + 7)).as("h")).collect()(0).getLong(0)
    run()
    val t0 = System.nanoTime(); run()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = Bench.session(args(0))
    println(f"CPUPROBE cpus=${args(0)} ${control(spark)}%.2f s")
    spark.stop()
  }
}
