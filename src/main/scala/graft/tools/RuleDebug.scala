package graft.tools
import org.apache.spark.sql._
object RuleDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("4")
    import org.apache.spark.sql.functions._
    val c = GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.Literal("x"))
    val aggCol = graft.ops.Bloom.bitsAggUdaf(1 << 12, 4).apply(c)
    val e = GraftColumnBridge.expression(aggCol)
    println("[ruledebug] expr class: " + e.getClass.getName)
    println("[ruledebug] resolved: " + e.resolved)
    println("[ruledebug] tree: " + e.treeString.take(800))
    spark.stop()
  }
}
