package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** s20 honesty pins: the z-order locality claim (tile-aligned buckets
  * ⇒ per-bucket spans ≤ 63 on BOTH dimensions) must hold for every
  * bucket, and must actually beat the naive row-order layout — whose
  * same-size buckets span nearly the full domain on both dimensions,
  * so min/max stats prune nothing. */
class LayoutSpec extends AnyFunSuite with SparkSuite {

  test("every z-bucket is a <=64x64 tile; row-order buckets span the domain") {
    val dir = "/root/testdata/sf0.01"
    val rows = Registry.queries("s20_zorder_layout")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xs, ys) = (r.getAs[Long]("x_span"), r.getAs[Long]("y_span"))
      assert(xs <= 63 && ys <= 63, s"bucket ${r.get(0)} spans $xs x $ys")
    }
    // naive layout: same bucket count, rows in arrival (key) order
    val naive = Registry.table(spark, dir, "orders")
      .select((col("o_custkey") % 1024).as("x"),
        (datediff(col("o_orderdate").cast("date"),
          lit("1992-01-01").cast("date")) % 1024).cast("long").as("y"),
        (col("o_orderkey") % 256).as("bucket"))
      .groupBy("bucket")
      .agg((max("x") - min("x")).as("x_span"), (max("y") - min("y")).as("y_span"))
      .collect()
    val wide = naive.count(r =>
      r.getAs[Long]("x_span") > 500 && r.getAs[Long]("y_span") > 500)
    assert(wide * 10 >= naive.length * 9,
      s"row-order layout unexpectedly tight ($wide/${naive.length} wide) — the comparison is vacuous")
  }
}
