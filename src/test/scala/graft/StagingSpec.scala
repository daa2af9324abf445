package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Registry, Staging}

/** Proves the `spark.graft.stageDir` plumbing: with the conf set, every
  * persisted-index staging site resolves under the configured base (the
  * cluster-portability contract — a driver-local /tmp table is unreadable
  * by executors on a real deployment), and the index-backed queries run
  * green against a non-default dir. Unset, the local-temp fallback holds.
  */
class StagingSpec extends AnyFunSuite with SparkSuite {

  test("Staging.dir falls back to local temp when the conf is unset") {
    spark.conf.unset(Staging.ConfKey)
    val d = Staging.dir("spec-unset")
    assert(new java.io.File(d).isDirectory)
    assert(d.contains("graft-spec-unset-"))
  }

  test("Staging.dir resolves under the configured base and creates it") {
    val base = Files.createTempDirectory("graft-stage-base-").toString
    spark.conf.set(Staging.ConfKey, base)
    try {
      val d = Staging.dir("spec-conf")
      assert(d.startsWith("file:") || d.startsWith("/"),
        s"qualified or absolute path expected: $d")
      val local = d.stripPrefix("file:")
      assert(local.startsWith(base), s"$d not under $base")
      assert(new java.io.File(local).isDirectory)
    } finally spark.conf.unset(Staging.ConfKey)
  }

  test("Staging.Memo reuses per base but re-resolves on a base change") {
    val memo = new Staging.Memo("spec-memo")
    spark.conf.unset(Staging.ConfKey)
    val p1 = memo.path
    assert(memo.path == p1) // stable within a base
    val base = Files.createTempDirectory("graft-stage-memo-").toString
    spark.conf.set(Staging.ConfKey, base)
    try {
      val p2 = memo.path
      assert(p2 != p1)
      assert(p2.stripPrefix("file:").startsWith(base))
      assert(memo.path == p2)
    } finally spark.conf.unset(Staging.ConfKey)
  }

  test("index-backed queries run green pointing at a non-default stageDir") {
    val base = Files.createTempDirectory("graft-stage-e2e-").toString
    spark.conf.set(Staging.ConfKey, base)
    try {
      for (name <- Seq("d9_indexed_incremental", "i20_cluster_members",
          "ss9_ivf_indexed", "cu24_frozen_split")) {
        val q = Registry.queries.getOrElse(name,
          fail(s"registry is missing $name"))
        val n = q(spark, sfDir).count()
        assert(n > 0, s"$name returned no rows under stageDir=$base")
      }
      // the staged indexes physically landed under the configured base
      val staged = new java.io.File(base).listFiles()
        .map(_.getName).toSeq
      for (tag <- Seq("graft-d9-", "graft-i20-", "graft-ss9-", "graft-cu24-"))
        assert(staged.exists(_.startsWith(tag)),
          s"no $tag* dir under $base (got: ${staged.mkString(", ")})")
    } finally spark.conf.unset(Staging.ConfKey)
  }
}
