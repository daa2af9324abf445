package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TopK

class TopKSpec extends AnyFunSuite with SparkSuite {

  test("bounded heap top-k matches window row_number semantics") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    val rows = (1L to 2000L).map(i =>
      (s"g${i % 7}", rnd.nextInt(50).toDouble, i)) // heavy score ties
    val df = rows.toDF("grp", "score", "key")

    val heap = df.groupBy($"grp")
      .agg(TopK.topKKeys(5)($"score", $"key").as("topk"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"key".asc)
    val win = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .groupBy($"grp")
      .agg(array_sort(collect_list(struct($"rn", $"key"))).as("s"))
      .select($"grp",
        concat_ws(",", expr("transform(s, x -> cast(x.key as string))")).as("topk"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    assert(heap == win)
  }

  test("string-keyed heap matches window row_number semantics with ranks") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val words = (1 to 3000).map(i => (i % 2 + 1, s"w${rnd.nextInt(40)}"))
    val counts = words.toDF("n", "gram")
      .groupBy($"n", $"gram").agg(count(lit(1)).as("cnt"))

    val heap = counts.groupBy($"n")
      .agg(TopK.topScoredStrings(5)($"cnt", $"gram").as("top"))
      .select($"n", posexplode($"top"))
      .select($"n", ($"pos" + 1).as("pos"), $"col.key".as("gram"),
        $"col.score".as("cnt"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet

    val w = Window.partitionBy($"n").orderBy($"cnt".desc, $"gram".asc)
    val win = counts.withColumn("pos", row_number().over(w))
      .filter($"pos" <= 5)
      .select($"n", $"pos", $"gram", $"cnt")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet

    assert(heap == win)
  }

  test("groups smaller than k return all members in rank order") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 10L), ("a", 3.0, 11L), ("b", 2.0, 20L))
      .toDF("grp", "score", "key")
    val got = df.groupBy($"grp").agg(TopK.topKKeys(5)($"score", $"key").as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "11,10", "b" -> "20"))
  }
}
