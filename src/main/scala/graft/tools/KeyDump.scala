package graft.tools
object KeyDump {
  def main(args: Array[String]): Unit = {
    println("KEYS:" + graft.SparkEntry.queries.keys.toSeq.sorted.mkString(","))
    println("ORACLES:" + graft.SparkEntry.oracleSql.keys.toSeq.sorted.mkString(","))
  }
}
