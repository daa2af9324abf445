package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator coverage — SURVEY.md §2.2 (filters), §2.3 (joins),
  * §2.4 (aggregations), §2.5 (windows), §2.6 (sorts/limits/set ops) —
  * re-expressed over the driver test tables.
  *
  * Oracle-parity rules used throughout:
  *   - double aggregates go through exact DECIMAL(18,2) arithmetic and are
  *     cast back to DOUBLE at the end, so Spark and DuckDB produce
  *     bit-identical doubles regardless of summation order;
  *   - every query has a total deterministic ORDER BY (sort field + key
  *     tiebreaker) in both the Spark plan and the oracle SQL.
  */
object RelationalQueries {
  import Registry.table

  /** Exact-decimal view of a double column holding 2-decimal money values. */
  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  def defs: Seq[Q] = Seq(
    // ---- A1-analog: the big fold — pricing summary over lineitem.
    // groupBy + partial aggregation (map-side combine is automatic).
    Q(
      "q1_agg",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"),
          )
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim),
    ),
  )
}
