package graft

import org.scalatest.funsuite.AnyFunSuite

/** Edge-contract tests for the native BPE merge-apply expression
  * ([[graft.functions.BpeApply]]) — the deep-round equivalences live in
  * QueriesSpec; this pins the boundary behaviors that would otherwise
  * only fail in production: empty inputs, malformed merge tables, the
  * ASCII contract of char mode, and the partition (lossless) invariant
  * under randomized merge tables.
  */
class BpeApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bytes(word: String, merges: String): Seq[String] = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(word).toDF("w")
      .selectExpr(s"bpe_apply_bytes(w, '$merges') AS s")
      .collect().head.getSeq[String](0).toSeq
  }

  private def chars(word: String, merges: String): Seq[String] = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(word).toDF("w")
      .selectExpr(s"bpe_apply_chars(w, '$merges') AS s")
      .collect().head.getSeq[String](0).toSeq
  }

  test("empty merge table returns the base alphabet") {
    assert(bytes("ab", "") == Seq("61", "62"))
    assert(chars("ab", "") == Seq("a", "b"))
    assert(bytes("", "") == Seq.empty)
  }

  test("null word returns null, not a crash") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "w")
      .selectExpr("bpe_apply_bytes(w, '61 62') AS s").collect().head
    assert(r.isNullAt(0))
  }

  test("merged symbols fuse greedily left to right") {
    // merge (61,61): "aaaaa" -> (aa)(aa)(a) — the leftmost-greedy contract
    assert(bytes("aaaaa", "61 61") == Seq("6161", "6161", "61"))
    assert(chars("aaaaa", "a a") == Seq("aa", "aa", "a"))
    // a later merge consumes an earlier product
    assert(bytes("aab", "61 61 6161 62") == Seq("616162"))
  }

  test("char mode refuses non-ASCII input instead of silently diverging") {
    val e = intercept[Exception](chars("café", "c a"))
    assert(e.getMessage != null)
  }

  test("malformed merge tables are rejected loudly") {
    intercept[Exception](bytes("ab", "61"))       // odd symbol count
    intercept[Exception](bytes("ab", "6 1"))      // odd-length hex symbol
    intercept[Exception](chars("ab", "é a"))      // non-ASCII char symbol
  }

  test("partition invariant: symbols always reconstruct the input (randomized)") {
    // any merge table (even nonsense pairs) must keep symbols a PARTITION
    // of the byte string — concatenating them reconstructs hex(utf8(w))
    val rnd = new scala.util.Random(7)
    val alphabet = Seq("a", "b", "ab", "ba", "猫", "1", ".")
    for (_ <- 1 to 50) {
      val w = Seq.fill(rnd.nextInt(12) + 1)(
        alphabet(rnd.nextInt(alphabet.size))).mkString
      val hexSyms = graft.ops.CorpusOps.byteSyms(w)
      val merges = Seq.fill(rnd.nextInt(6))(
        s"${hexSyms(rnd.nextInt(hexSyms.length))} ${hexSyms(rnd.nextInt(hexSyms.length))}")
        .mkString(" ")
      val out = bytes(w, merges)
      assert(out.mkString == hexSyms.mkString, s"'$w' with [$merges]")
    }
  }

  test("parsed-merge-table cache is bounded (LRU eviction past the cap)") {
    // deep-dial sweeps create one distinct merge-table literal per rounds
    // value; the JVM-wide cache must never grow past MaxCachedTables
    for (i <- 0 until graft.functions.BpeApply.maxCachedTablesForTest + 8)
      bytes("ab", f"61 ${0x30 + (i % 64)}%02X")
    assert(graft.functions.BpeApply.cacheSizeForTest
      <= graft.functions.BpeApply.maxCachedTablesForTest)
  }
}
