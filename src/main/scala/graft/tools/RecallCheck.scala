package graft.tools
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate()
    val sf = "/root/testdata/sf0.001"
    val brute = graft.SparkEntry.queries("knn_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.SparkEntry.queries("knn_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"RECALL lsh=${(brute & lsh).size.toDouble / brute.size} candidates=${lsh.size}")
    spark.stop()
  }
}
