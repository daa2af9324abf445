package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Soak-test data generator: writes a `factor`-times-scaled copy of a
  * TESTDATA scale-factor directory (same schemas, same file layout), so
  * the flagship queries can be benchmarked one decade above the largest
  * driver-provided SF and the measured cost ratios recorded in
  * SCALING.md. Not part of the library surface.
  *
  * Construction (all deterministic, no RNG):
  *  - dimension tables (`region`, `nation`) are copied unchanged;
  *  - fact tables are replicated `factor`× with every key shifted by
  *    `rep * stride(keyDomain)` where the stride is `max(key)+1` in the
  *    source — replica i of `lineitem` references replica i of
  *    `orders`/`part`/`supplier`, so join fan-out ratios are preserved
  *    exactly;
  *  - `documents.text` in replica i>0 is alphabet-rotated (per-replica
  *    Caesar `translate`): char n-grams and token vocabularies are
  *    disjoint across replicas, so each replica's INTERNAL
  *    duplicate/near-duplicate structure is identical to the original
  *    while no cross-replica near-dups are introduced — duplicate
  *    cluster COUNT scales with the corpus and cluster SIZE does not,
  *    the linear-corpus-growth regime a crawl corpus approximates;
  *  - `embeddings.embedding` in replica i>0 is dimension-rotated
  *    (norm and coordinate distribution preserved, replicas
  *    ≈ orthogonal) then jittered ±0.01 — decorrelated, not collapsed
  *    into factor-cliques of embedding near-dups.
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleGen <srcSfDir> <outDir> <factor> [skew|hubskew]")
    val src = args(0); val out = args(1)
    val factor = args(2).toInt
    val mode = if (args.length == 4) args(3) else ""
    require(mode.isEmpty || mode == "skew" || mode == "hubskew",
      s"mode must be skew or hubskew, got $mode")
    require(factor >= 2 && factor <= 100, s"factor must be in [2,100], got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, src, out, factor, mode == "skew", mode == "hubskew")
    finally spark.stop()
  }

  /** With `skew` on, one "bot" user (`events.user_id`) absorbs ~20% of
    * all events, and one hot customer key (`orders.o_custkey = 1`)
    * ~20% of all orders — `o_custkey` is exactly the key the listgen /
    * crowding family aliases as `host` (lg1/lg2/lg6/i19 group on it),
    * so this is the megasite-host case for the per-host heaps
    * (deterministic hash selection; no other table is skewed). The
    * zipf-head regime a crawl corpus actually has: the per-key skew
    * discipline (bounded heaps, day-bucketed windows, bucket-prefix
    * ranks) is MEASURED on a hot key, not argued — a query that buffers
    * one key's rows on one task goes visibly superlinear here.
    */
  /** With `hubskew` on, the GRAPH gets a supernode: ~20% of lineitems
    * collapse onto `l_suppkey = 1` (the in-hub: distinct edges from
    * nearly every customer land on one supplier node) and ~20% of
    * orders onto `o_custkey = 1` (the out-hub), so one node owns ~20%
    * of the edge MASS and the (1 → supplier-1) edge has enormous
    * multiplicity — the facebook.com-of-the-web case the reference
    * caps with its ≤100 subdomain sampling (PageRankUtils.java:
    * 2445-2500). This is a different regime from `skew`: the bot mode
    * skews per-key ROW mass (orders/events) but the distinct edge set
    * stays bounded by the supplier count; hubskew skews the distinct
    * EDGE distribution itself, which is what the per-half-step joins,
    * component fixpoints and degree folds key on.
    */
  def generate(spark: SparkSession, src: String, out: String, factor: Int,
      skew: Boolean = false, hubskew: Boolean = false): Unit = {
    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    // a corpus grows by ADDING archives, not by inflating one file: write
    // factor× the source's file count so scan parallelism scales with the
    // data exactly as it does in production (one small output file would
    // pin every pre-shuffle stage of the soak to one task and fake a
    // superlinear cost curve — observed: d2 at 29.8× from exactly this)
    def write(name: String)(df: DataFrame): Unit = {
      val srcFiles = math.max(1, spark.read.parquet(s"$src/$name.parquet").inputFiles.length)
      df.repartition(factor * srcFiles)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name done")
    }
    // one replica index per source row; kept as a column until the final
    // select so key shifts can reference it
    def replicate(df: DataFrame): DataFrame =
      df.withColumn("rep", explode(sequence(lit(0L), lit((factor - 1).toLong))))
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    def writeDim(name: String)(df: DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name done")
    }
    writeDim("region")(read("region"))
    writeDim("nation")(read("nation"))

    val customer = read("customer")
    val supplier = read("supplier")
    val part = read("part")
    val orders = read("orders")
    val custStride = stride(customer, "c_custkey")
    val suppStride = stride(supplier, "s_suppkey")
    val partStride = stride(part, "p_partkey")
    val orderStride = stride(orders, "o_orderkey")

    write("customer")(replicate(customer)
      .withColumn("c_custkey", col("c_custkey") + col("rep") * custStride)
      .drop("rep"))
    write("supplier")(replicate(supplier)
      .withColumn("s_suppkey", col("s_suppkey") + col("rep") * suppStride)
      .drop("rep"))
    write("part")(replicate(part)
      .withColumn("p_partkey", col("p_partkey") + col("rep") * partStride)
      .drop("rep"))
    // skew/hubskew: ~20% of orders collapse onto custkey 1 (a valid
    // rep-0 key, so customer joins stay referentially intact — they
    // just fan in); under hubskew this is the graph's out-hub
    val custShifted = col("o_custkey") + col("rep") * custStride
    write("orders")(replicate(orders)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * orderStride)
      .withColumn("o_custkey",
        if (skew || hubskew)
          when(pmod(hash(col("o_orderkey")), lit(5)) === 0, lit(1L))
            .otherwise(custShifted)
        else custShifted)
      .drop("rep"))
    // hubskew: ~20% of lineitems collapse onto suppkey 1 — the in-hub;
    // the hash keys on the full line identity so collapsed lines spread
    // across all orders (every customer gains an edge onto the hub)
    val suppShifted = col("l_suppkey") + col("rep") * suppStride
    write("lineitem")(replicate(read("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * orderStride)
      .withColumn("l_partkey", col("l_partkey") + col("rep") * partStride)
      .withColumn("l_suppkey",
        if (hubskew)
          when(pmod(hash(col("l_orderkey"), col("l_linenumber"),
              col("rep")), lit(5)) === 0, lit(1L))
            .otherwise(suppShifted)
        else suppShifted)
      .drop("rep"))

    // the source events table stores TIMESTAMP(NANOS); read it the way
    // Registry.table does (nanos as long) and keep `ts` as a plain INT64
    // in the copy — Registry's `ts div 1000` conversion handles both
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = read("events")
    val eventStride = stride(events, "event_id")
    val userStride = stride(events, "user_id")
    // skew: ~20% of all events collapse onto one bot user (crawler UAs
    // are single keys with 1e8+ events at corpus scale); timestamps are
    // untouched, so the bot's history spans the full time range — the
    // worst case for any per-user ordered window
    val userShifted = col("user_id") + col("rep") * userStride
    write("events")(replicate(events)
      .withColumn("event_id", col("event_id") + col("rep") * eventStride)
      .withColumn("user_id",
        if (skew) when(pmod(hash(col("event_id")), lit(5)) === 0,
            lit(userStride * factor)).otherwise(userShifted)
        else userShifted)
      .drop("rep"))

    val documents = read("documents")
    val docStride = stride(documents, "doc_id")
    // Replica texts must be dissimilar at the CHARACTER level, because
    // the dedupe family shingles char 3-grams: a per-token suffix leaves
    // replicas at ~0.7 char-Jaccard, every doc becomes a factor-clique
    // of near-dups, and candidate pairs grow QUADRATICALLY in the factor
    // (measured: d2 17× at 10× data). A per-replica alphabet
    // SUBSTITUTION keeps length, word counts and distribution shape
    // identical while making char n-grams (and token vocabularies)
    // (near-)disjoint across replicas — duplicate structure is preserved
    // per replica, cluster COUNT scales, cluster SIZE doesn't. A plain
    // Caesar rotation cycles at 26 and capped dedupe soaks at 25×; the
    // affine maps x → a·x+b (mod 26), a coprime to 26, give 312 distinct
    // substitutions, and two DISTINCT affine maps agree on at most
    // gcd(a1−a2, 26) ≤ 2 letters — a trigram collides across replicas
    // only when all three chars agree (≲ (2/26)³ of trigrams), so
    // cross-replica Jaccard stays ≈ 0 up to the factor-100 cap.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    def affine(i: Int): String = {
      val a = coprimes(i % coprimes.length)
      val b = i % 26
      (0 until 26).map(x => alpha((a * x + b) % 26)).mkString
    }
    val rotated = (1 until factor).foldLeft(when(col("rep") === 0, col("text"))) {
      (acc, i) => acc.when(col("rep") === i, translate(col("text"), alpha, affine(i)))
    }
    write("documents")(replicate(documents)
      .withColumn("doc_id", col("doc_id") + col("rep") * docStride)
      .withColumn("text", rotated)
      .withColumn("n_chars", length(col("text")))
      .drop("rep"))

    val embeddings = read("embeddings")
    val vecStride = stride(embeddings, "vec_id")
    // Replica vectors must be DECORRELATED, not just perturbed: a ±0.01
    // jitter leaves replicas at cosine ≈ 0.999, so every vector becomes
    // a factor-clique of embedding near-dups and the ss near-dup family
    // goes superlinear by data construction (the embedding analog of
    // the text mirror problem above). A per-replica circular shift of
    // the dimensions preserves the norm and the coordinate distribution
    // exactly while making replicas ≈ orthogonal; the jitter then fills
    // space locally.
    val dim = size(col("embedding"))
    val k = pmod(col("rep"), dim.cast("long")).cast("int")
    val vecRotated = when(col("rep") === 0, col("embedding")).otherwise(
      concat(slice(col("embedding"), k + 1, dim - k),
        slice(col("embedding"), lit(1), k)))
    write("embeddings")(replicate(embeddings)
      .withColumn("vec_id", col("vec_id") + col("rep") * vecStride)
      .withColumn("embedding",
        when(col("rep") === 0, col("embedding")).otherwise(
          transform(vecRotated,
            (x, i) => (x + (pmod(hash(col("vec_id"), i), lit(201)) - 100)
              .cast("float") / lit(10000.0f)).cast("float"))))
      .drop("rep"))
  }
}
