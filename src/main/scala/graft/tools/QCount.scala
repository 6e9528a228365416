package graft.tools

/** Dev tool: print the registered-query / oracle counts for SURVEY bookkeeping. */
object QCount {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println("rows_only=" + (q -- o).toSeq.sorted.mkString(","))
    println("orphan_oracles=" + (o -- q).toSeq.sorted.mkString(","))
  }
}
