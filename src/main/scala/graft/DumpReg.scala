package graft
object DumpReg {
  def main(args: Array[String]): Unit = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new java.io.PrintWriter(args(0))
    SparkEntry.queries.keys.toSeq.sorted.foreach(k => out.println("Q " + k))
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (k, v) =>
      out.println("O " + k + " " + md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
    out.close()
  }
}
