package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Bench.fullDumpPath must never resolve to a git-tracked BENCH_FULL.json
  * (the committed baseline) unless explicitly overridden — and must ALWAYS
  * resolve to a writable path (r20's refusal left the driver with no
  * per-query artifact for two rounds; the protected case now falls back to
  * the untracked BENCH_LAST.json). */
class BenchGuardSpec extends AnyFunSuite {

  private def run(dir: java.nio.file.Path, args: String*): Unit = {
    val pr = new ProcessBuilder(args: _*).directory(dir.toFile)
      .redirectErrorStream(true).start()
    pr.getInputStream.readAllBytes()
    assert(pr.waitFor() == 0, s"command failed: ${args.mkString(" ")}")
  }

  test("explicit override always wins") {
    val d = Files.createTempDirectory("benchguard")
    assert(Bench.fullDumpPath(Some("/tmp/x.json"), d) == "/tmp/x.json")
  }

  test("non-repo cwd resolves to cwd/BENCH_FULL.json") {
    val d = Files.createTempDirectory("benchguard")
    assert(Bench.fullDumpPath(None, d) ==
      d.resolve("BENCH_FULL.json").toString)
  }

  test("repo cwd with tracked BENCH_FULL.json falls back to BENCH_LAST.json") {
    val d = Files.createTempDirectory("benchguard")
    run(d, "git", "init", "-q")
    run(d, "git", "-c", "user.email=t@t", "-c", "user.name=t",
      "commit", "-q", "--allow-empty", "-m", "init")
    Files.write(d.resolve("BENCH_FULL.json"), "{}\n".getBytes("UTF-8"))
    // untracked file in a repo: still writable under the baseline name
    assert(Bench.fullDumpPath(None, d) ==
      d.resolve("BENCH_FULL.json").toString)
    run(d, "git", "add", "BENCH_FULL.json")
    run(d, "git", "-c", "user.email=t@t", "-c", "user.name=t",
      "commit", "-q", "-m", "baseline")
    // tracked baseline: the dump is still written, under a different name
    assert(Bench.fullDumpPath(None, d) ==
      d.resolve("BENCH_LAST.json").toString)
  }
}
