package graft

import org.apache.spark.sql.functions._
import graft.quality.DataChecks
import graft.quality.DataChecks._

class QualitySpec extends SparkSpec {

  test("DataChecks: scalar rules + FK count exact violations in one audit") {
    val s = spark
    import s.implicits._
    val fact = Seq[(java.lang.Long, String, java.lang.Double, java.lang.Long)](
      (1L, "O", 10.0, 100L),   // clean
      (2L, "F", 20.0, 101L),   // clean
      (2L, "X", -5.0, 102L),   // dup id, bad enum, bad range, dangling fk
      (null, "P", 2000000.0, 100L), // null id, over range
      (3L, null, 30.0, null)   // null enum (NOT an in_set violation), null fk (ignored)
    ).toDF("id", "status", "amount", "cust")
    val dim = Seq(100L, 101L).toDF("c_id")

    val out = DataChecks.audit(fact, Seq(
      NotNull("id"), Unique("id"), InSet("status", Seq("O", "F", "P")),
      InRange("amount", 0d, 1000000d), ForeignKey("cust", dim, "c_id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap

    assert(out("not_null_id") == ((1L, 5L, false)))
    assert(out("unique_id") == ((1L, 5L, false)))       // one extra '2'
    assert(out("in_set_status") == ((1L, 5L, false)))   // only 'X'
    assert(out("in_range_amount") == ((2L, 5L, false))) // -5 and 2e6
    assert(out("fk_cust") == ((1L, 5L, false)))         // only 102
  }

  test("DataChecks: clean table passes every rule") {
    val s = spark
    import s.implicits._
    val fact = Seq((1L, "O", 10.0), (2L, "F", 20.0)).toDF("id", "status", "amount")
    val out = DataChecks.audit(fact, Seq(
      NotNull("id"), Unique("id"), InSet("status", Seq("O", "F")),
      InRange("amount", 0d, 100d)))
    assert(out.filter(!col("pass")).count() == 0)
    assert(out.count() == 4)
  }
}
