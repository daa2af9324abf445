package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B for the g17 star-contraction round shape (r21; not part
  * of the library surface). Variant A is the shipped r5–r20 round
  * (small-star = groupBy(hi).min + join-back, large-star output
  * checkpointed because that join consumes it twice); variant B fuses
  * the whole round into ONE linear plan (small-star min as a window
  * over hi, both member edges emitted via explode) so the per-round
  * ls checkpoint barrier and the join disappear. Interleaved warm
  * min-of-N in one JVM + per-variant job counts + exact output parity.
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StarScratch /root/testdata/sf0.1" }}}
  */
object StarScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Iterative

    val jobCount = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobCount.incrementAndGet()
    })

    // the g17 substrate
    val c = graft.queries.Registry.table(spark, sfDir, "customer").select("c_custkey")
    val pairs = c.select(col("c_custkey").as("a"))
      .where(col("a") % 100 =!= 99)
      .join(c.select(col("c_custkey").as("b")), col("b") === col("a") + 1)

    def canonical(df: DataFrame): DataFrame = {
      val mat = Iterative.materializer(spark, None)
      mat(df
        .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct())
    }

    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(hash(col("lo"), col("hi")).cast("long"))).first()
      if (r.getLong(0) == 0L) (0L, 0L) else (r.getLong(0), r.getLong(1))
    }

    def readout(edges: DataFrame): DataFrame = {
      val members = edges.select(col("hi").as("node"), col("lo").as("component"))
      val roots = edges.select(col("lo")).distinct()
        .join(edges.select(col("hi").as("lo")), Seq("lo"), "left_anti")
        .select(col("lo").as("node"), col("lo").as("component"))
      members.unionByName(roots)
    }

    // variant A: the shipped round (two mats, groupBy+join small-star)
    def runA(): DataFrame = {
      val mat = Iterative.materializer(spark, None)
      var edges = canonical(pairs)
      var cur = sig(edges)
      var converged = cur._1 == 0L
      var rounds = 0
      while (!converged && rounds < 30) {
        val prevEdges = edges
        val nbr = edges.select(col("lo").as("u"), col("hi").as("v"))
          .unionByName(edges.select(col("hi").as("u"), col("lo").as("v")))
        val lm = nbr.groupBy("u").agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("mn"), col("u")).as("m"))
        val ls = mat(nbr.filter(col("v") > col("u"))
          .join(lm, "u")
          .select(col("m").as("lo"), col("v").as("hi"))
          .distinct())
        val sm = ls.groupBy("hi").agg(min(col("lo")).as("m"))
        val withM = ls.join(sm, "hi")
        edges = mat(withM.select(col("m").as("lo"), col("hi"))
          .unionByName(withM.select(col("m").as("lo"), col("lo").as("hi")))
          .filter(col("lo") =!= col("hi"))
          .distinct())
        val next = sig(edges)
        rounds += 1
        converged = next == cur && graft.ops.Components.confirmedFixpoint(prevEdges, edges)
        cur = next
      }
      println(s"[starscratch]   A rounds=$rounds")
      readout(edges)
    }

    // variant B: one linear plan per round (window small-star + explode)
    def runB(): DataFrame = {
      val mat = Iterative.materializer(spark, None)
      var edges = canonical(pairs)
      var cur = sig(edges)
      var converged = cur._1 == 0L
      var rounds = 0
      while (!converged && rounds < 30) {
        val prevEdges = edges
        val nbr = edges.select(col("lo").as("u"), col("hi").as("v"))
          .unionByName(edges.select(col("hi").as("u"), col("lo").as("v")))
        val lm = nbr.groupBy("u").agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("mn"), col("u")).as("m"))
        val ls = nbr.filter(col("v") > col("u"))
          .join(lm, "u")
          .select(col("m").as("lo"), col("v").as("hi"))
          .distinct()
        edges = mat(ls
          .withColumn("m", min(col("lo")).over(Window.partitionBy("hi")))
          .select(col("m").as("lo"),
            explode(array(col("hi"), col("lo"))).as("hi"))
          .filter(col("lo") =!= col("hi"))
          .distinct())
        val next = sig(edges)
        rounds += 1
        converged = next == cur && graft.ops.Components.confirmedFixpoint(prevEdges, edges)
        cur = next
      }
      println(s"[starscratch]   B rounds=$rounds")
      readout(edges)
    }

    // variant D: groupBy+join small-star (AQE-skew-splittable) but NO
    // ls checkpoint — the join's second consumption of ls re-reads the
    // distinct's exchange (ReusedExchange), so the round is still one
    // materialization, without variant B's unsplittable window groups
    def runD(): DataFrame = {
      val mat = Iterative.materializer(spark, None)
      var edges = canonical(pairs)
      var cur = sig(edges)
      var converged = cur._1 == 0L
      var rounds = 0
      while (!converged && rounds < 30) {
        val prevEdges = edges
        val nbr = edges.select(col("lo").as("u"), col("hi").as("v"))
          .unionByName(edges.select(col("hi").as("u"), col("lo").as("v")))
        val lm = nbr.groupBy("u").agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("mn"), col("u")).as("m"))
        val ls = nbr.filter(col("v") > col("u"))
          .join(lm, "u")
          .select(col("m").as("lo"), col("v").as("hi"))
          .distinct()
        val sm = ls.groupBy("hi").agg(min(col("lo")).as("m"))
        val withM = ls.join(sm, "hi")
        edges = mat(withM.select(col("m").as("lo"), col("hi"))
          .unionByName(withM.select(col("m").as("lo"), col("lo").as("hi")))
          .filter(col("lo") =!= col("hi"))
          .distinct())
        val next = sig(edges)
        rounds += 1
        converged = next == cur && graft.ops.Components.confirmedFixpoint(prevEdges, edges)
        cur = next
      }
      println(s"[starscratch]   D rounds=$rounds")
      readout(edges)
    }

    def time(tag: String, f: () => DataFrame): DataFrame = {
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      val out = f()
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[starscratch] $tag%s  ${sec}%6.2f s  jobs=${jobCount.get() - j0}%3d  rows=$rows")
      out
    }

    // parity once, then interleaved timing
    val a0 = time("A warmup", runA _).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b0 = time("B warmup", runB _).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d0 = time("D warmup", runD _).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[starscratch] parity: ${if (a0 == b0 && a0 == d0) "IDENTICAL" else s"MISMATCH |A|=${a0.size} |B|=${b0.size} |D|=${d0.size}"}")
    require(a0 == b0 && a0 == d0, "variant outputs differ")
    for (i <- 1 to 4) {
      time(s"A run$i", runA _)
      time(s"B run$i", runB _)
      time(s"D run$i", runD _)
    }
    spark.stop()
  }
}
