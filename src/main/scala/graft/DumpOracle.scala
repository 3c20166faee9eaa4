package graft

/** Prints one declared oracle SQL (dev tool: lets DuckDB dry-run a single
  * lane's replay without a full Verify pass). */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val w = new java.io.PrintWriter(args(1), "UTF-8")
    try w.print(SparkEntry.oracleSql(args(0))) finally w.close()
  }
}
