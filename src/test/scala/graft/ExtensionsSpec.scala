package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExtensions

/** Exercises the SQL-registry path on the shared live session (builder-time
  * SparkSessionExtensions can't attach to an existing session, so the test
  * uses the runtime register hook — same builder, same registry entry). */
class ExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("dot_product_float is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_product_float(
           CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
           CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d""").collect()(0)
    assert(r.getAs[Double]("d") == 32.0)
  }

  test("registration rejects wrong arity with a clear message") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT dot_product_float(CAST(array(1.0) AS ARRAY<FLOAT>))").collect())
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("dot_product_float"))
  }
}
