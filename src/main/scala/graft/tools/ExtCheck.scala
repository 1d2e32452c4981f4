package graft.tools
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate()
    val r = spark.sql("SELECT graft_cosine(array(cast(1.0 as float), cast(0.0 as float)), array(cast(1.0 as float), cast(0.0 as float)))").collect()(0).getDouble(0)
    val t = graft.plans.TopK.perKey(
      spark.range(10).selectExpr("id % 2 as k", "cast(id as double) as v", "id"),
      Seq("k"), Seq("v", "id"), 2)
    println(s"EXTCHECK cosine=$r topk=${t.count()}")
    spark.stop()
  }
}
