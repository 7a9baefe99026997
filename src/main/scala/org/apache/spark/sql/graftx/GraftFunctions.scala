package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: exposes the native graft expressions to
  * `spark.sql(...)` so the engine is usable from pure SQL, not just the
  * Column API. (Registration via the session's FunctionRegistry; an
  * equivalent `SparkSessionExtensions#injectFunction` wiring would be used
  * when the session is built by a host application.)
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("rolling_hash",
      exprs => RollingHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSigExpr(exprs.head, 3, 24), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHashExpr(exprs.head, 2), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_intersect_size",
      exprs => SortedIntersectSize(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("band_hashes",
      exprs => BandHashes(exprs.head, 4), "scala_udf")
    reg.createOrReplaceTempFunction("byte_entropy",
      exprs => ByteEntropy(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("subword_pieces",
      exprs => SubwordPieces(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("jaro_winkler",
      exprs => JaroWinkler(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("unicode_fold",
      exprs => UnicodeFold(exprs.head), "scala_udf")
  }
}
