package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Brotli, BrotliFixture}

/** The x23 fixture assembler: all 251 seeds round-trip through our
  * decoder to the analytic text, and the committed referee pairs
  * (assembled stream + its libbrotlidec decode, generated once via
  * tools/brotli_ref.py) pin that the ASSEMBLER emits format-correct
  * brotli — both sides of the gate are checked against the reference
  * library, not merely against each other. */
class BrotliFixtureSpec extends AnyFunSuite {

  test("all 251 seeds decode to the analytic text") {
    for (k <- 0L until 251L) {
      val docId = k + 251 * 2
      val got = Brotli.decode(BrotliFixture.encode(docId, "en"))
      assert(got != null, s"seed $k")
      assert(new String(got, "UTF-8") ==
        BrotliFixture.expectedText(docId, "en"), s"seed $k")
    }
  }

  test("committed referee pairs: assembler bytes and libbrotlidec decode") {
    // the assembler is deterministic, so regenerating the stream must
    // reproduce the committed bytes, and the committed .dec (produced
    // by the system libbrotlidec) must equal the analytic text
    val ids = Seq(0, 1, 2, 3, 4, 6, 12, 37, 120, 250)
    for (k <- ids) {
      val name = f"a$k%03d"
      def res(ext: String): Array[Byte] = {
        val in = getClass.getResourceAsStream(s"/brotli_asm/$name.$ext")
        assert(in != null, s"missing $name.$ext")
        try in.readAllBytes() finally in.close()
      }
      val docId = k + 251L * 2
      assert(java.util.Arrays.equals(
        BrotliFixture.encode(docId, "en"), res("br")),
        s"$name: assembler drifted from the referee-checked bytes")
      assert(new String(res("dec"), "UTF-8") ==
        BrotliFixture.expectedText(docId, "en"),
        s"$name: libbrotlidec decode differs from the analytic text")
    }
  }
}
