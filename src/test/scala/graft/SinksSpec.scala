package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

class SinksSpec extends AnyFunSuite with SparkSuite {

  test("S7 multi-stream sink: one pass, one directory per record type") {
    val dir = Files.createTempDirectory("multisink").toString
    val events = graft.queries.Registry.table(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("user_id"))
    Sinks.writeByType(events, "event_type", dir)
    val types = events.select("event_type").distinct()
      .collect().map(_.getString(0))
    assert(types.nonEmpty)
    types.foreach { t =>
      val n = Sinks.readStreamDir(spark, dir, "event_type", t).count()
      val want = events.filter(col("event_type") === t).count()
      assert(n == want)
    }
  }

  test("S8 time-series append log: append + tail + from-offset reads") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tslog").toString
    def batch(ids: Range) = ids.map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00")))
      .toDF("id", "ts")
    Sinks.appendLog(batch(0 until 10), dir)
    Sinks.appendLog(batch(10 until 20), dir) // second append survives
    val tail = Sinks.readTail(spark, dir, "ts", "id", 5)
      .collect().map(_.getLong(0)).toSeq
    assert(tail == Seq(19L, 18L, 17L, 16L, 15L))
    val from = Sinks.readFrom(spark, dir, "ts",
      java.sql.Timestamp.valueOf("2024-01-01 00:17:00")).count()
    assert(from == 3)
  }

  test("J3 bucketed tables join with no shuffle (no Exchange in plan)") {
    val session = spark.newSession()
    session.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val suffix = java.lang.Long.toHexString(System.nanoTime()) // fresh warehouse paths
    val orders = session.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = session.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Sinks.writeBucketed(orders, s"orders_b_$suffix", "o_orderkey", 8)
    Sinks.writeBucketed(lineitem, s"lineitem_b_$suffix", "o_orderkey", 8)
    val joined = session.table(s"orders_b_$suffix")
      .join(session.table(s"lineitem_b_$suffix"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    // co-bucketed layout ⇒ no shuffle on either side
    assert(!plan.contains("Exchange"))
    assert(joined.count() == lineitem.count())

    // S4: point lookup on the bucket key prunes to a single bucket
    // (the TFile seek-by-key equivalent). The planner auto-disables
    // bucketed scans when no operator exploits the distribution, so pin
    // it on for the lookup.
    session.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val lookup = session.table(s"orders_b_$suffix")
      .filter(org.apache.spark.sql.functions.col("o_orderkey") === 77L)
    val lp = lookup.queryExecution.executedPlan.toString
    assert(lp.contains("SelectedBucketsCount: 1 out of 8"), lp)
    assert(lookup.count() == 1)
  }

  test("external-path bucketed tables (writeBucketedAt) also join shuffle-free") {
    // j6's staging variant: the catalog must carry the bucket spec even
    // when the files live at an explicit location, or the merge join
    // silently regains its exchanges
    val session = spark.newSession()
    session.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val suffix = java.lang.Long.toHexString(System.nanoTime())
    val base = java.nio.file.Files.createTempDirectory("graft-bext-").toString
    val orders = session.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val customer = session.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_nationkey")
    Sinks.writeBucketedAt(orders, s"oext_$suffix", "o_custkey", 4, s"$base/o")
    Sinks.writeBucketedAt(customer, s"cext_$suffix", "c_custkey", 4, s"$base/c")
    val joined = session.table(s"oext_$suffix")
      .join(session.table(s"cext_$suffix"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(joined.count() == orders.count())
  }

  test("appendBucketed validates the bucket spec against the existing table") {
    // the banded-index append path leans on this: appending with a
    // mismatched bucket count must fail loudly, not silently mix layouts
    // (a mixed-bucket table would serve wrong-partitioned scans)
    val session = spark.newSession()
    val suffix = java.lang.Long.toHexString(System.nanoTime())
    val base = java.nio.file.Files.createTempDirectory("graft-bval-").toString
    val df = session.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    Sinks.writeBucketedAt(df, s"bval_$suffix", "n_nationkey", 4, s"$base/t")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Sinks.appendBucketed(df, s"bval_$suffix", "n_nationkey", 8)
    }
    assert(e.getMessage.toLowerCase.contains("bucket"), e.getMessage)
  }

  test("two-key bucketed tables serve a two-key join shuffle-free (d9 band shape)") {
    // requireAllClusterKeysForCoPartition=true (the default) rejects a
    // partitioning on a strict subset of the join keys, so the banded
    // index MUST be bucketed by both (band_idx, band_key) — this pins
    // that layout actually yields an exchange-free sort-merge join
    val session = spark.newSession()
    session.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val suffix = java.lang.Long.toHexString(System.nanoTime())
    val base = java.nio.file.Files.createTempDirectory("graft-b2k-").toString
    // the synthetic lineitem does not enforce PK uniqueness — dedupe so
    // the 1:1 join count is checkable
    val li = session.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .dropDuplicates("l_orderkey", "l_linenumber")
    Sinks.writeBucketedAt(li, s"b2a_$suffix",
      Seq("l_orderkey", "l_linenumber"), 4, s"$base/a")
    Sinks.writeBucketedAt(li.withColumnRenamed("l_quantity", "q2"),
      s"b2b_$suffix", Seq("l_orderkey", "l_linenumber"), 4, s"$base/b")
    val joined = session.table(s"b2a_$suffix")
      .join(session.table(s"b2b_$suffix"), Seq("l_orderkey", "l_linenumber"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(joined.count() == li.count())
  }
}
