package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the named queries (all if no
  * names given) so scan pushdown / broadcast / codegen spans can be reviewed.
  * `runMain graft.Explain <sfDir> [query ...]`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else QueryCatalog.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      QueryCatalog.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
