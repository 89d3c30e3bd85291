package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks (SURVEY.md §5 test plan): native Catalyst
  * expressions are verified against executable Scala models on arbitrary
  * ASCII input, and operator algebra laws hold as multisets. */
object PropertyProps extends Properties("graft") {

  private lazy val spark = TestSpark.spark

  private val asciiString: Gen[String] =
    Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString).map(_.take(200))

  // --- models ------------------------------------------------------------

  private def charFoldModel(s: String, seed: Long): Long =
    s.foldLeft(seed)((h, c) => (h * 31 + c.toLong) & 0xFFFFFFFFL)

  private def shingleModel(s: String, n: Int): Seq[String] = {
    val words = s.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq
    if (words.length < n) Seq.empty
    else words.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  private def jaccardModel(a: Seq[String], b: Seq[String]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    val union = (sa ++ sb).size
    if (union == 0) 0.0 else sa.intersect(sb).size.toDouble / union
  }

  // --- expression vs model ----------------------------------------------

  private def evalOne[T](sql: String, value: String): T = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq(value).toDF("s").createOrReplaceTempView("prop_in")
    spark.sql(sql).head().getAs[T](0)
  }

  property("char_fold matches the fold model on ASCII") =
    forAll(asciiString) { s =>
      evalOne[Long]("SELECT char_fold(s, 7) FROM prop_in", s) == charFoldModel(s, 7)
    }

  property("shingle_set matches the sliding-window model") =
    forAll(asciiString.suchThat(_.nonEmpty)) { s =>
      val got = evalOne[scala.collection.Seq[String]](
        "SELECT shingle_set(s, 3) FROM prop_in", s).toSeq
      got.sorted == shingleModel(s, 3).sorted
    }

  property("jaccard_sim matches the set model") = {
    val words = Gen.listOfN(2, Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")))
    forAll(words) { ws =>
      import spark.implicits._
      graft.functions.GraftFunctions.register(spark)
      val a = ws.head.distinct
      val b = ws(1).distinct
      Seq((a, b)).toDF("x", "y").createOrReplaceTempView("prop_j")
      val got = spark.sql("SELECT jaccard_sim(x, y) FROM prop_j").head().getDouble(0)
      got == jaccardModel(a, b)
    }
  }

  property("minhash signatures are permutation-invariant (set semantics)") =
    forAll(Gen.listOf(Gen.oneOf("aa bb cc", "dd ee ff", "gg hh ii", "jj kk ll"))) { sh =>
      import spark.implicits._
      graft.functions.GraftFunctions.register(spark)
      val fwd = sh.distinct
      val rev = fwd.reverse
      Seq((fwd, rev)).toDF("f", "r").createOrReplaceTempView("prop_m")
      val row = spark.sql(
        "SELECT minhash_sig(f, 8), minhash_sig(r, 8) FROM prop_m").head()
      row.getAs[scala.collection.Seq[Long]](0) == row.getAs[scala.collection.Seq[Long]](1)
    }

  // --- operator algebra --------------------------------------------------

  property("map fusion: map(f)∘map(g) == map(f andThen g) as multiset") =
    forAll(Gen.listOf(Gen.choose(-1000L, 1000L))) { xs =>
      import spark.implicits._
      val f = (x: Long) => x * 3 + 1
      val g = (x: Long) => x - 7
      val ds = xs.toDS()
      ds.map(f).map(g).collect().sorted.toSeq ==
        ds.map(f.andThen(g)).collect().sorted.toSeq
    }

  property("union commutativity as multiset (funnel semantics)") =
    forAll(Gen.listOf(Gen.choose(0L, 50L)), Gen.listOf(Gen.choose(0L, 50L))) { (a, b) =>
      import spark.implicits._
      val (da, db) = (a.toDS(), b.toDS())
      da.union(db).collect().sorted.toSeq == db.union(da).collect().sorted.toSeq
    }

  property("ExactMean == decimal-sum model (any partitioning)") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)), Gen.choose(1, 8)) { (xs, parts) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val em = udaf(new graft.functions.ExactMean)
      val got = xs.toDS().repartition(parts)
        .agg(em(col("value"))).head().getDouble(0)
      val model = xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / xs.size
      got == model
    }

  property("backoff is monotone and capped (retries.rs:74-78)") =
    forAll(Gen.choose(0, 30), Gen.choose(0, 30)) { (i, j) =>
      import scala.concurrent.duration._
      val p = graft.runtime.RetryPolicy(maxRetries = 31, backoffUnit = 1.milli,
        backoffFactor = 2, maxBackoff = 64.millis)
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      Prop(p.backoffDelay(lo) <= p.backoffDelay(hi) &&
        p.backoffDelay(hi) <= 64.millis)
    }
}
