package graft

import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions
import graft.functions.VectorFunctions

/** The native VecDot expression must agree bit-for-bit with the HOF fold
  * (same left-to-right accumulation) in both codegen and interpreted
  * evaluation paths. */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("graft_vec_dot equals the HOF dot bit-for-bit") {
    VectorExpressions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(0.7, 0.11, -0.13)),
      (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    val rows = df.select(
      expr("graft_vec_dot(a, b)").as("native"),
      VectorFunctions.dot($"a", $"b").as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(rows(0).getDouble(0) == 32.0)
  }

  test("null inputs propagate to null") {
    VectorExpressions.register(spark)
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
    val out = df.select(expr("graft_vec_dot(a, b)")).collect().head
    assert(out.isNullAt(0))
  }
}
