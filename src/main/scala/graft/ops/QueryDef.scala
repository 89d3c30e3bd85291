package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One named engine query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle statement run by
  * the driver against the same parquet tables.
  *
  * `headline` marks the queries timed by [[graft.Bench]] at sf0.1.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Shared helpers for oracle-exact numerics.
  *
  * The driver hash-compares Spark parquet output against DuckDB results, so
  * every float has to be bit-identical across both engines. Strategy:
  *   - sums of doubles go through `decimal(18,6)` (exact, associative —
  *     immune to partial-aggregation reordering on a cluster) and are cast
  *     back to double at the end (one deterministic IEEE rounding);
  *   - averages/ratios are a single IEEE double division of two values that
  *     are themselves exact — deterministic on both engines;
  *   - raw double columns pass through untouched (bit-exact by definition).
  */
object Q {
  val D6: DecimalType = DecimalType(18, 6)

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an event-time column to `TimestampType` regardless of how
    * the parquet writer encoded it — the engine's input-format-agnostic
    * contract (reference stages make no input-encoding assumptions either:
    * `/root/reference/gasket/src/framework.rs:10`). Three encodings seen
    * from the driver's generators so far, all handled:
    *   - parquet TIMESTAMP(NANOS), which Spark 4 only reads with
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (as a long): integer
    *     division ns→us (a double division would lose precision:
    *     epoch-ns ≈ 1.7e18 > 2^53). DuckDB's `cast(ts as timestamp)`
    *     truncates the same way.
    *   - parquet timestamp[us] without UTC adjustment → TIMESTAMP_NTZ:
    *     cast to TimestampType — bit-identical under the session's UTC
    *     timezone (Sessions pins `spark.sql.session.timeZone=UTC`), and
    *     matching DuckDB, which treats the column as wall-clock micros.
    *   - timestamp[us] UTC-adjusted → already TimestampType: pass through.
    * Works on batch AND streaming frames (pure column projection). */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(colName,
          col(colName).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(table(spark, dir, "events"))

  /** Exact (decimal-routed) sum of a double expression, returned as double. */
  def sumd(c: Column): Column = sum(c.cast(D6)).cast(DoubleType)

  /** DuckDB spelling of [[sumd]]. */
  def oSumd(expr: String): String =
    s"cast(sum(cast(($expr) as decimal(18,6))) as double)"

  /** Exact average: decimal sum divided by count — one IEEE division. */
  def avgd(c: Column): Column = sumd(c) / count(lit(1))
  def oAvgd(expr: String): String = s"(${oSumd(expr)} / count(*))"

  /** Exact long-scaled sum: each double is scaled to 6 decimals via ONE
    * IEEE multiply and rounded half-up (`floor(x·10⁶ + 0.5)` — for any
    * non-negative input whose true value has ≤ 6 decimals this matches
    * the decimal(18,6) cast's HALF_UP exactly; bare `floor` did not:
    * 2.01·10⁶ = 2009999.99…98 floored to n−1, drifting 1 micro/row off
    * the decimal spelling), then summed as exact BIGINTs. Both engines
    * run the identical multiply-add-floor, so results stay bit-identical
    * engine↔oracle for ANY double input, and additionally equal [[sumd]]
    * for 6-decimal non-negative values. ~30% faster than the
    * decimal(18,6) route in hot aggregations (no 128-bit arithmetic or
    * overflow checks per row). ONLY for sums whose magnitude is
    * schema-bounded (per-group sums with bounded group size): 6-decimal
    * scaling overflows BIGINT near 9.2e12 in the summed value —
    * corpus-wide money sums must stay on [[sumd]]. */
  def sumLong6(c: Column): Column =
    sum(floor(c * lit(1000000d) + lit(0.5d))
      .cast(org.apache.spark.sql.types.LongType))

  /** DuckDB spelling of [[sumLong6]]: cast to BIGINT keeps the engine on
    * 64-bit addition (DuckDB's bare sum(BIGINT) widens to HUGEINT). */
  def oSumLong6(expr: String): String =
    s"sum(CAST(floor(($expr) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))"

  /** Exact long-scaled average: [[sumLong6]] / (count · 10^6) — one IEEE
    * division of two exact values, so bit-identical across engines (and
    * equal to [[avgd]] whenever the inputs are 6-decimal-exact). */
  def avgLong6(c: Column): Column =
    sumLong6(c).cast(DoubleType) / (count(lit(1)) * lit(1000000d))
  def oAvgLong6(expr: String): String =
    s"(CAST(${oSumLong6(expr)} AS DOUBLE) / (count(*) * CAST(1000000 AS DOUBLE)))"

  /** Microsecond-exact timestamp rendering, identical in Spark and DuckDB
    * (DuckDB side must cast ns timestamps to `timestamp` first). */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
  def oTsStr(expr: String): String =
    s"strftime(cast(($expr) as timestamp), '%Y-%m-%d %H:%M:%S.%f')"

  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
  def oDateStr(expr: String): String =
    s"strftime(cast(($expr) as date), '%Y-%m-%d')"

  /** Memoized, cached stage intermediates keyed by (name, data dir).
    * Composed queries (d06 reusing d02's pairs, q40 reusing d06) share ONE
    * cached copy instead of re-deriving and re-caching per call — without
    * this, repeated runs leak orphaned InMemoryRelations (a DataFrame's
    * cache survives view replacement until explicitly unpersisted). */
  private val stagedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def staged(key: String, dir: String)(build: => DataFrame): DataFrame = {
    // keyed per active session: a memoized frame registers temp views in
    // its own session's catalog, so another live session must not reuse it
    val session = SparkSession.active
    val k = s"$key|$dir|${System.identityHashCode(session)}"
    // NOT computeIfAbsent: build recurses into staged() for nested stages
    // (d06 -> d02), and CHM's mapping function must not touch the map
    // (same-bin collision => IllegalStateException("Recursive update"))
    val existing = stagedMemo.get(k)
    if (existing != null && !existing.sparkSession.sparkContext.isStopped) {
      existing
    } else {
      if (existing != null) stagedMemo.remove(k, existing)
      val built = build.cache()
      val prev = stagedMemo.putIfAbsent(k, built)
      if (prev == null) built
      else { built.unpersist(); prev } // lost a benign race; use the winner
    }
  }

  /** [[staged]] without the extra `.cache()`: for intermediates that are
    * ALREADY materialized (checkpoints), where wrapping an
    * InMemoryRelation on top would discard the checkpoint's preserved
    * output partitioning (the one property fusedBase exists to keep —
    * InMemoryRelation.withOutput loses the partitioning attributes on
    * Spark 4.1). Without memoization every call re-built and
    * re-checkpointed a fresh copy whose blocks outlived the call; the
    * memoized copy is shared per (key, dir, session) and its blocks are
    * swept by [[releaseAllPersisted]] like any checkpoint. */
  def stagedMaterialized(key: String, dir: String)(build: => DataFrame): DataFrame = {
    val session = SparkSession.active
    val k = s"$key|$dir|${System.identityHashCode(session)}"
    val existing = stagedMemo.get(k)
    if (existing != null && !existing.sparkSession.sparkContext.isStopped) {
      existing
    } else {
      if (existing != null) stagedMemo.remove(k, existing)
      val built = build
      val prev = stagedMemo.putIfAbsent(k, built)
      if (prev == null) { materializedKeys.add(k); built }
      else {
        // lost a benign race: the loser was eagerly checkpointed and is
        // tracked by NOTHING — release its blocks now (staged()'s rule;
        // without this a concurrent fusedBase pair pins a full events
        // copy until releaseAllPersisted)
        try checkpointRdd(built).foreach(_.unpersist(blocking = false))
        catch { case _: Throwable => () }
        prev
      }
    }
  }

  /** Keys of [[stagedMaterialized]] entries: their frames are backed by
    * (local)checkpoint RDD BLOCKS, which `DataFrame.unpersist` does not
    * release — [[clearStaged]] unpersists the underlying LogicalRDD for
    * these so a clear never orphans a full checkpointed copy (round-10
    * advice item). */
  private val materializedKeys =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The checkpoint RDD behind a materialized frame (LogicalRDD leaf),
    * if any. */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Unpersist and forget every memoized intermediate (cold-cache runs).
    * Blocking: a non-blocking unpersist races the NEXT cold run — the old
    * blocks are still draining while the new run fills the store, and the
    * eviction/GC churn showed up as an unattributable 60% bench swing. */
  def clearStaged(): Unit = {
    stagedMemo.forEach { (k, df) =>
      try if (!df.sparkSession.sparkContext.isStopped) {
        df.unpersist(blocking = true)
        // checkpointed frames: the blocks live on the LogicalRDD, which
        // plan-level unpersist cannot see
        if (materializedKeys.contains(k))
          checkpointRdd(df).foreach(_.unpersist(blocking = true))
      }
      catch { case _: Throwable => () }
    }
    stagedMemo.clear()
    materializedKeys.clear()
  }

  /** Drop EVERY persisted RDD still registered with the context — staged
    * caches AND (local)checkpoint blocks from iterative queries (d06's
    * rounds), which `clearStaged` can't see. Bench calls this between
    * timed runs so each run starts from a genuinely empty block store.
    * Only safe when no live Dataset will be re-read: checkpoint lineage is
    * truncated, so swept blocks are unrecoverable. */
  def releaseAllPersisted(spark: SparkSession): Unit = {
    clearStaged()
    val sc = spark.sparkContext
    if (!sc.isStopped)
      sc.getPersistentRDDs.values.foreach { rdd =>
        try rdd.unpersist(blocking = true)
        catch { case _: Throwable => () }
      }
  }

  /** Run `body` with AQE shuffle coalescing governed purely by the 64 MB
    * advisory size (`parallelismFirst=false`), restoring the session's
    * setting afterwards. For ITERATIVE operators (d06 label propagation,
    * s06 Lloyd rounds) whose per-round shuffles carry metadata-width rows:
    * a round is a synchronization barrier, so fewer, larger reduce tasks
    * beat parallelism-first splitting at every scale — locally the 1 MB
    * floor would split a 20 MB round-shuffle into 20 tasks of overhead,
    * and on a cluster advisory-sized (64 MB) partitions minimize the
    * per-round barrier cost the same way. Single-pass queries must NOT run
    * under this: a 64×-scale profile showed the advisory target coalescing
    * q18's 178 MB reduce onto 3 of 32 cores (see [[graft.Sessions]]). */
  def withAdvisoryCoalesce[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "false")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Per-round lineage truncation for iterative algorithms (d06 label
    * propagation, s06 Lloyd iterations). Each round must read the previous
    * round's BLOCKS, never its plan — without this the final plan
    * re-derives all K rounds (each referencing the previous twice →
    * exponential recompute).
    *
    * Durability is configurable: when the session has a reliable
    * checkpoint dir (`sc.setCheckpointDir`, e.g. HDFS/S3 on a cluster),
    * rounds checkpoint there and survive executor loss; otherwise
    * `localCheckpoint` stores blocks on executors — the right default at
    * local[32], NOT fault-tolerant on a real cluster (an executor loss
    * kills the job). */
  def roundCheckpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager = true)
    else df.localCheckpoint(true)

  /** Register the named driver tables as temp views (plus graft SQL
    * functions) and run a Spark-SQL statement against them. */
  def withViews(s: SparkSession, d: String, names: String*)(sql: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    names.foreach { n =>
      val df = if (n == "events") events(s, d) else table(s, d, n)
      df.createOrReplaceTempView(n)
    }
    s.sql(sql)
  }

  /** Normalized document text. Spark spelling (backslash-escaped string
    * literals) vs DuckDB spelling (needs the 'g' flag for replace-all). */
  val sNorm = """lower(trim(regexp_replace(text, '\\s+', ' ')))"""
  val oNorm = """lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"""

  /** DuckDB longhand for [[graft.functions.CharFold]]: identical fold, so
    * hash-based dedup queries stay oracle-checkable. */
  def oCharFold(e: String, seed: Int): String =
    s"""list_reduce(list_prepend(CAST($seed AS BIGINT),
       |  list_transform(range(1, length($e)+1),
       |    i -> CAST(ascii(substring($e, i, 1)) AS BIGINT))),
       |  (a, c) -> (a * 31 + c) % 4294967296)""".stripMargin
}
