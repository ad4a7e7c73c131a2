package graft

import graft.ext.{GraftExtensions, GraftFunctions}
import org.apache.spark.sql.SparkSession

/** SQL surface: custom expressions registered via SparkSessionExtensions /
  * a live-session FunctionRegistry. */
class ExtensionsSpec extends SparkSpec {

  test("live-session registration: kll functions usable from spark.sql") {
    GraftFunctions.register(spark)
    spark.range(10000)
      .selectExpr("cast(id % 100 as double) as v")
      .createOrReplaceTempView("ext_v")
    val qs = spark.sql(
      "SELECT kll_quantiles(kll_sketch(v), array(0.25D, 0.5D, 0.75D)) AS q FROM ext_v")
      .head().getSeq[Double](0)
    assert(qs.length == 3)
    assert(math.abs(qs(1) - 50.0) < 10, qs.mkString(","))
    assert(qs(0) <= qs(1) && qs(1) <= qs(2))

    val cdf = spark.sql(
      "SELECT kll_cdf(kll_sketch(v, 400), array(49.5D)) AS c FROM ext_v")
      .head().getSeq[Double](0)
    assert(math.abs(cdf.head - 0.5) < 0.05, cdf.mkString(","))

    spark.range(10000).createOrReplaceTempView("ext_v_ids")
    val n = spark.sql(
      "SELECT count(*) AS n FROM (SELECT array_bounds(array(id, id + 5), 0, 9999) AS ok FROM ext_v_ids) WHERE ok")
      .head().getLong(0)
    // rows with id+5 > 9999 fail: ids 9995..9999 → 5 rows fail
    assert(n == 9995, s"n=$n")
  }

  test("spark.sql.extensions path: fresh session with GraftExtensions") {
    val orig = spark // keep the shared session's context
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions()(_))
      .getOrCreate()
    try {
      s2.range(1000).selectExpr("cast(id as double) as v")
        .createOrReplaceTempView("ext2_v")
      val med = s2.sql(
        "SELECT kll_quantiles(kll_sketch(v), array(0.5D))[0] AS m FROM ext2_v")
        .head().getDouble(0)
      assert(math.abs(med - 500.0) < 60, s"med=$med")
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }
}
