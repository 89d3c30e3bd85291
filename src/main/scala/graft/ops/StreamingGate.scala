package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

/** Streaming rows of the oracle gate — the reference is FUNDAMENTALLY an
  * unbounded-pipeline framework (`/root/reference/gasket/src/daemon.rs:
  * 13-86`, `runtime.rs:19-317`), so the hard external gate must exercise a
  * real Structured Streaming plan end-to-end, not just the batch twins.
  *
  * q42 runs the q21 aggregation as an actual streaming query: file source
  * over the events parquet → watermarked tumbling-window agg → parquet
  * sink, `Trigger.AvailableNow`. Append mode only emits a window once the
  * watermark passes it, and a bounded replay ends with the newest windows
  * still above the watermark — so the input is replayed with two
  * far-future SENTINEL files appended (the standard bounded-replay flush):
  * sentinel batch 1 pushes the watermark past every real window, sentinel
  * batch 2 gives the state store a batch in which to emit them. Sentinel
  * rows are filtered from the result; the oracle is the IDENTICAL batch
  * SQL q21 runs. At scale nothing here is bounded-specific: the same
  * query with a real unbounded source needs no sentinels — arriving data
  * advances the watermark continuously.
  */
object StreamingGate {

  /** Every scratch dir the gate creates (stream input staging, sinks,
    * checkpoints), registered for recursive deletion at JVM exit. Eager
    * deletion is NOT safe — each gate query returns a DataFrame that
    * lazily re-reads its parquet sink dir — so the JVM-lifetime registry
    * plus one shutdown hook is the correct scope: a gate run leaves /tmp
    * clean. (19 bare `createTempDirectory` sites leaked before this.) */
  private val tempDirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val cleanupHookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tempDirs.forEach { root =>
        try {
          import java.util.Comparator
          val st = Files.walk(root)
          try st.sorted(Comparator.reverseOrder[Path]())
            .forEach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
          finally st.close()
        } catch { case _: Throwable => () }
      }
    }, "graft-streaminggate-tempdir-cleanup"))

  private[graft] def tempDir(prefix: String): Path = {
    cleanupHookInstalled
    val p = Files.createTempDirectory(prefix)
    tempDirs.add(p)
    p
  }

  private val SENTINEL = "__sentinel__"
  private val SENT_NS: Long = 4102444800L * 1000000000L // 2100-01-01T00:00Z

  /** Write a one-row events file with the given raw schema directly into
    * `dest` (Spark writes directories; the part file is moved out). */
  private def writeSentinel(
      s: SparkSession,
      sch: org.apache.spark.sql.types.StructType,
      tsNs: Long,
      dest: Path): Unit = {
    // the sentinel must be written in the RAW input schema (it lands in the
    // same streaming input dir as the driver's files) — so each supported
    // ts encoding needs its matching external JVM type
    val tsVal: Any = sch("ts").dataType match {
      case LongType => tsNs
      case org.apache.spark.sql.types.TimestampNTZType =>
        java.time.LocalDateTime.ofEpochSecond(
          tsNs / 1000000000L, (tsNs % 1000000000L).toInt,
          java.time.ZoneOffset.UTC)
      case _ => new java.sql.Timestamp(tsNs / 1000000L)
    }
    val row = Row(-1L, tsVal, -1L, SENTINEL, 0.0, "{}")
    val tmp = tempDir("graft-q42-sent")
    s.createDataFrame(java.util.Collections.singletonList(row), sch)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = parquetParts(tmp).head
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The `.parquet` part files of a directory. `Files.list` holds an open
    * directory handle until the java stream is closed — the unclosed
    * spelling leaked one descriptor per batch write in the q42/q58
    * input-dir setup. */
  private def parquetParts(dir: Path): Seq[Path] = {
    val st = Files.list(dir)
    try st.filter(_.getFileName.toString.endsWith(".parquet"))
      .toArray.toSeq.map(_.asInstanceOf[Path])
    finally st.close()
  }

  /** Symlink (or copy) every part file of `table`.parquet into `inDir`
    * under an ordered name prefix. */
  private def linkParts(d: String, table: String, inDir: Path): Unit = {
    val src = Paths.get(s"$d/$table.parquet").toAbsolutePath
    val parts: Seq[Path] =
      if (Files.isDirectory(src)) parquetParts(src)
      else Seq(src)
    parts.zipWithIndex.foreach { case (p, i) =>
      val link = inDir.resolve(f"0_${table}_$i%04d.parquet")
      try Files.createSymbolicLink(link, p)
      catch { case _: Throwable => Files.copy(p, link) }
    }
  }

  /** Populate a streaming input dir: the real events file(s) symlinked
    * (copied if the filesystem refuses links) plus two sentinel files
    * whose mtimes force them to batch AFTER the real data. */
  private def stageInput(s: SparkSession, d: String): Path = {
    val inDir = tempDir("graft-q42-in")
    linkParts(d, "events", inDir)
    val sch = Q.table(s, d, "events").schema
    val now = System.currentTimeMillis()
    val s1 = inDir.resolve("1_sentinel.parquet")
    val s2 = inDir.resolve("2_sentinel.parquet")
    writeSentinel(s, sch, SENT_NS, s1)
    writeSentinel(s, sch, SENT_NS + 86400L * 1000000000L, s2)
    Files.setLastModifiedTime(s1, FileTime.fromMillis(now + 60000))
    Files.setLastModifiedTime(s2, FileTime.fromMillis(now + 120000))
    inDir
  }

  val q42 = QueryDef(
    "q42_streaming_hourly",
    (s, d) => {
      import s.implicits._
      val sch = Q.table(s, d, "events").schema
      val inDir = stageInput(s, d)
      val outDir = tempDir("graft-q42-out").toString
      val ckpt = tempDir("graft-q42-ckpt").toString
      // maxFilesPerTrigger=1 keeps the sentinels in their own batches:
      // watermark emission in Append mode is always one batch behind the
      // data that advanced it
      val raw = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir.toString)
      // same encoding normalization as Q.events (batch side)
      val ev = Q.normalizeTs(raw)
      val q = ev
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), Q.sumd($"value").as("sum_value"))
        .select(Q.tsStr($"window.start").as("hour"), $"event_type", $"n", $"sum_value")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(outDir).where($"event_type" =!= SENTINEL)
    },
    // the batch q21 SQL verbatim — streaming and batch must agree exactly
    Some(s"""
      SELECT ${Q.oTsStr("date_trunc('hour', cast(ts as timestamp))")} AS hour,
             event_type, count(*) AS n, ${Q.oSumd("value")} AS sum_value
      FROM events GROUP BY 1, 2"""))

  /** Gap-based sessionization as a BATCH aggregation via `session_window`
    * — the oracle-checkable twin of [[graft.streaming.EventTime.sessionize]]
    * (same 30-minute gap semantics, half-open [start, last+gap) windows:
    * an event exactly `gap` after the previous one starts a NEW session).
    * DuckDB longhand: lag-diff ≥ gap marks a boundary, running sum of
    * boundary marks numbers the sessions. One shuffle on user_id; state
    * per (user, session) — the formulation that holds at 100 TB. */
  val q43 = QueryDef(
    "q43_session_windows",
    (s, d) => {
      import s.implicits._
      Q.events(s, d)
        .groupBy($"user_id", session_window($"ts", "30 minutes"))
        .agg(count(lit(1)).as("n_events"), Q.sumd($"value").as("sum_value"))
        .select($"user_id", Q.tsStr($"session_window.start").as("session_start"),
          $"n_events", $"sum_value")
    },
    Some(s"""
      WITH e AS (SELECT user_id, cast(ts as timestamp) AS ts, value FROM events),
      m AS (SELECT user_id, ts, value,
              CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                   THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      g AS (SELECT user_id, ts, value,
              sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
            FROM m)
      SELECT user_id, ${Q.oTsStr("min(ts)")} AS session_start,
             count(*) AS n_events, ${Q.oSumd("value")} AS sum_value
      FROM g GROUP BY user_id, sid"""))

  /** Streaming exact deduplication in the hard gate: file stream over the
    * documents parquet → content digest → stateful `dropDuplicates` →
    * parquet sink, `Trigger.AvailableNow`. The input is replayed as a
    * SECOND file with `maxFilesPerTrigger=1`, so batch 2 is 100%
    * duplicates of batch 1 — the dedup state must genuinely carry across
    * batches (a single-batch run would prove nothing), and the distinct
    * set is unchanged by the replay. Output is the distinct
    * digest SET — deterministic regardless of which arrival won — so the
    * oracle is plain batch `SELECT DISTINCT`. No watermark: the gate input
    * is bounded; an unbounded deployment would bound the state with
    * `dropDuplicatesWithinWatermark` instead, same plan otherwise. */
  /** q49's dedup stream, parameterized on the state-store provider (the
    * [[graft.streaming.StateStores]] seam): the gate runs the session
    * default; StreamingSpec runs the SAME pipeline under RocksDB — at
    * 100 TB the distinct-digest state outgrows executor heap, and the
    * spill-to-disk provider is the deployment setting. */
  private[graft] def dedupStream(
      s: SparkSession, d: String, provider: Option[String]): DataFrame = {
    val sch = Q.table(s, d, "documents").schema
    val inDir = tempDir("graft-q49-in")
    linkParts(d, "documents", inDir)
    // replay: same bytes under a later name — batch 2 is all duplicates
    val src = Paths.get(s"$d/documents.parquet").toAbsolutePath
    if (Files.isRegularFile(src)) {
      val replay = inDir.resolve("1_documents_replay.parquet")
      try Files.createSymbolicLink(replay, src)
      catch { case _: Throwable => Files.copy(src, replay) }
      Files.setLastModifiedTime(replay,
        FileTime.fromMillis(System.currentTimeMillis() + 60000))
    }
    val outDir = tempDir("graft-q49-out").toString
    val ckpt = tempDir("graft-q49-ckpt").toString
    graft.streaming.StateStores.withProvider(s, provider) {
      val q = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir.toString)
        .select(expr(s"md5(${Q.sNorm})").as("fp"))
        .dropDuplicates("fp")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(outDir)
  }

  val q49 = QueryDef(
    "q49_streaming_dedup",
    (s, d) => dedupStream(s, d, None),
    Some(s"SELECT DISTINCT md5(${Q.oNorm}) AS fp FROM documents"))

  /** Stream-stream inner join in the hard gate: purchases and clicks as
    * two independent file streams, joined on user_id with a 1-hour
    * lookback (`c.ts ∈ [p.ts − 1h, p.ts]`). The click side is delivered
    * in TWO files with `maxFilesPerTrigger=1`, so batch 2's clicks must
    * match purchases buffered in join state from batch 1 — a single-batch
    * run would prove nothing about the stateful join. Inner-join matches
    * emit in the batch they pair up (no watermark flush needed); the
    * watermarks + time-range bound the state for an unbounded deployment.
    * Output is the match SET (event-id pairs) — arrival order can't
    * matter — and the oracle is the identical batch self-join. */
  val q53 = QueryDef(
    "q53_streaming_join",
    (s, d) => {
      import s.implicits._
      val ev = Q.events(s, d) // batch read, ns→us normalized
      val pDir = tempDir("graft-q53-p").toString
      val cDir = tempDir("graft-q53-c").toString
      ev.where($"event_type" === "purchase").coalesce(1)
        .write.mode("overwrite").parquet(pDir)
      // two click files => two source batches => cross-batch join state
      val clicks = ev.where($"event_type" === "click")
      clicks.where($"event_id" % 2 === 0).coalesce(1)
        .write.mode("append").parquet(cDir)
      clicks.where($"event_id" % 2 =!= 0).coalesce(1)
        .write.mode("append").parquet(cDir)
      val pSch = s.read.parquet(pDir).schema
      // Watermark delay must exceed the EVENT-TIME SPAN of the replay, not
      // a deployment-realistic lateness: batch N's late-record filter uses
      // the watermark from before batch N-1, so with a short delay a third
      // click batch (another part file, a replay) would be silently dropped
      // wholesale — the bounded-replay twin of q42's sentinel rule. The
      // events table spans ~1 month; 90 days keeps every possible batch
      // split correct. An unbounded deployment would use its real lateness
      // bound here — the plan is identical.
      val purchases = s.readStream.schema(pSch).parquet(pDir)
        .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
        .withWatermark("p_ts", "90 days")
      val clickStream = s.readStream.schema(pSch)
        .option("maxFilesPerTrigger", "1").parquet(cDir)
        .select($"event_id".as("c_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
        .withWatermark("c_ts", "90 days")
      val joined = purchases.join(clickStream,
        expr("p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"))
      val outDir = tempDir("graft-q53-out").toString
      val ckpt = tempDir("graft-q53-ckpt").toString
      val q = joined
        .select($"p_id", $"c_id", $"p_user".as("user_id"),
          Q.tsStr($"p_ts").as("purchase_ts"), Q.tsStr($"c_ts").as("click_ts"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(outDir)
    },
    Some(s"""
      WITH e AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts,
                        event_type FROM events)
      SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id,
             ${Q.oTsStr("p.ts")} AS purchase_ts, ${Q.oTsStr("c.ts")} AS click_ts
      FROM e p JOIN e c ON p.user_id = c.user_id
      WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts"""))

  /** One LSH band-key group's streaming state: the first-arriving
    * (min-id within its batch) document owning this bucket. */
  private[graft] case class BandRow(doc_id: Long, bj: Long, bkey: String)
  private[graft] case class BucketOwner(owner: Long)
  private[graft] case class DupHit(bj: Long, owner_doc: Long, dup_doc: Long)

  /** Streaming NEAR-duplicate suppression — the ingest-time twin of d02:
    * documents arrive in batches, each explodes into its MinHash/LSH band
    * keys (the identical `shingle_set`/`minhash_sig` native expressions
    * and banding dial as d02), and `flatMapGroupsWithState` keyed by
    * (band, band-key) keeps ONE owner per bucket: the first batch's
    * min-doc_id claimant. A document colliding with a bucket owned by an
    * EARLIER batch is emitted as a suppression hit (band, owner, dup) —
    * exactly the candidate edge d02's batch self-join finds, discovered
    * incrementally with no self-join and no reprocessing of old batches.
    *
    * Determinism (what makes this oracle-checkable): the input is split
    * into two files by doc_id parity with ordered names + mtimes and
    * `maxFilesPerTrigger=1`, so batch membership is a function of the
    * DATA (batch = doc_id % 2), and the emitted set is batch-order
    * invariant — owners are min-per-batch (order-free aggregation), hits
    * are strictly-cross-batch. The oracle is the equivalent batch SQL
    * over the same band table. Same-batch collisions are deliberately
    * NOT emitted (they're batch-internal, d02's job); the streaming
    * operator's contract is exactly the incremental delta.
    *
    * Scale: state is one row per DISTINCT band key (the bucket registry,
    * ≪ corpus, metadata-width); per batch one band-key shuffle of the
    * new documents only. Unbounded deployment bounds state with the
    * RocksDB provider (q49's seam) + the [[neardupHits]] `ttlMs`
    * processing-time TTL (an expired bucket is evicted and the next
    * claimant re-registers as owner — StreamingSpec proves the
    * re-admission across a RocksDB restart); the gate input is bounded
    * so the gate run uses NoTimeout. */
  /** Stage `table` into a fresh streaming input dir as two doc_id-parity
    * batches with ordered names + mtimes and `maxFilesPerTrigger=1` on
    * the reader — batch membership is a pure function of the DATA
    * (batch = doc_id % 2), which is what makes a cross-batch streaming
    * operator's output oracle-checkable. Shared by q58 and m07. */
  private[graft] def stageParityBatches(
      s: SparkSession, d: String, table: String,
      parity: String = "doc_id % 2"): Path = {
    val rows = Q.table(s, d, table)
    val inDir = tempDir(s"graft-$table-parity-in")
    def writeBatch(par: Int, name: String, mtPlus: Long): Unit = {
      val tmp = tempDir(s"graft-$table-parity-b")
      rows.where(expr(parity) === par).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = parquetParts(tmp).head
      val dest = inDir.resolve(name)
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(System.currentTimeMillis() + mtPlus))
    }
    writeBatch(0, "0_even.parquet", 0)
    writeBatch(1, "1_odd.parquet", 60000)
    inDir
  }

  private[graft] def neardupStream(
      s: SparkSession, d: String, provider: Option[String]): DataFrame = {
      val sch = Q.table(s, d, "documents").schema
      val inDir = stageParityBatches(s, d, "documents")
      val outDir = tempDir("graft-q58-out").toString
      val ckpt = tempDir("graft-q58-ckpt").toString
      neardupHits(s, inDir, sch, provider, None, None, outDir, ckpt)
  }

  /** The q58 stream itself, factored out of the gate staging so the TTL
    * and restart behavior are testable: reads `inDir` as a file stream
    * (schema `sch` must carry `doc_id` + `text`), bands each document,
    * and runs the bucket-registry FSM.
    *
    * `ttlMs` is the bucket TTL — the bounded-state dial the scaladoc
    * above promises: `Some(ms)` switches the registry to
    * `ProcessingTimeTimeout`; a bucket unseen for `ms` is evicted on the
    * next batch (the `hasTimedOut` path) and its next claimant registers
    * as a fresh owner. Every touch (ownership claim OR a suppressed
    * duplicate) re-arms the clock, so only genuinely cold buckets age
    * out — the same keep-warm rule as the reference's capacity-bounded
    * channel registry (`/root/reference/gasket/src/messaging.rs:384-391`).
    * `None` = NoTimeout (gate runs on bounded input).
    *
    * `buckets` is an optional live-bucket-count accumulator (wire it
    * from `Registry.sparkCounter` — SURVEY §2.1 #24): +1 on register,
    * −1 on evict, so registry growth/stall is observable the way the
    * reference exposes queue depth (`messaging.rs:281-377`). Task
    * retries can over-count (accumulator semantics) — it is telemetry,
    * not state.
    *
    * Trigger choice is forced by the TTL: `ProcessingTimeTimeout` makes
    * the stateful operator report "another batch needed" forever, so
    * under `Trigger.AvailableNow` the query never self-terminates, and
    * `processAllAvailable()` never returns either — every timer batch
    * counts as batch construction, so `noNewData` is never signaled
    * (both measured: unbounded empty batches / a 20-min hang). A TTL
    * run therefore uses a periodic trigger, polls streaming progress
    * until `awaitRows` input rows are consumed, sleeps `settleMs` so
    * evictions can fire, then `stop()`s — the always-on shape of a real
    * deployment; the bounded gate run stays on AvailableNow. */
  private[graft] def neardupHits(
      s: SparkSession, inDir: Path,
      sch: org.apache.spark.sql.types.StructType,
      provider: Option[String], ttlMs: Option[Long],
      buckets: Option[org.apache.spark.util.LongAccumulator],
      outDir: String, ckpt: String,
      settleMs: Long = 0L, awaitRows: Long = 0L): DataFrame = {
      graft.functions.GraftFunctions.register(s)
      import s.implicits._
      val k = DedupOps.minhashK
      val rowRefs = (1 to DedupOps.minhashRows)
        .map(i => s"CAST(element_at(sg, bj*${DedupOps.minhashRows} + $i) AS STRING)")
        .mkString(", ")
      val timeoutConf =
        if (ttlMs.isDefined)
          org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout
        else org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout
      val hits = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
        .selectExpr("doc_id", "shingle_set(text, 3) AS sset")
        .where("size(sset) >= 1")
        .selectExpr("doc_id", s"minhash_sig(sset, $k) AS sg")
        .selectExpr("doc_id", "sg",
          s"explode(sequence(0, ${DedupOps.minhashBands - 1})) AS bj")
        .selectExpr("doc_id", "CAST(bj AS BIGINT) AS bj",
          s"concat_ws(',', $rowRefs) AS bkey")
        .as[BandRow]
        .groupByKey(r => (r.bj, r.bkey))
        .flatMapGroupsWithState(
          org.apache.spark.sql.streaming.OutputMode.Append, timeoutConf) {
          (key: (Long, String), rows: Iterator[BandRow],
           st: org.apache.spark.sql.streaming.GroupState[BucketOwner]) =>
            if (st.hasTimedOut) {
              st.remove()
              buckets.foreach(_.add(-1))
              Iterator.empty
            } else {
              val ids = rows.map(_.doc_id).toSeq
              val out = if (st.exists) {
                val o = st.get.owner
                ids.sorted.iterator.map(id => DupHit(key._1, o, id))
              } else {
                st.update(BucketOwner(ids.min))
                buckets.foreach(_.add(1))
                Iterator.empty
              }
              ttlMs.foreach(st.setTimeoutDuration)
              out
            }
        }
      graft.streaming.StateStores.withProvider(s, provider) {
        val writer = hits.toDF()
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append")
        if (ttlMs.isEmpty) {
          val q = writer.trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        } else {
          val q = writer
            .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
          try {
            val deadline = System.nanoTime() + 60L * 1000000000L
            def consumed: Long =
              q.recentProgress.map(_.numInputRows).sum
            while (consumed < awaitRows && q.exception.isEmpty &&
                System.nanoTime() < deadline)
              Thread.sleep(100)
            q.exception.foreach(throw _)
            require(consumed >= awaitRows,
              s"stream consumed $consumed of $awaitRows rows before deadline")
            // settle window for evictions: sleep the requested window,
            // then — if the caller is watching the bucket registry —
            // keep polling (30 s cap) until every TTL-expired bucket has
            // actually been evicted. A fixed sleep raced RocksDB snapshot
            // maintenance under full-suite load (one aborted eviction
            // micro-batch = a retry landing after the window), observed
            // r16 as a 1-in-N StreamingSpec flake.
            if (settleMs > 0) {
              Thread.sleep(settleMs)
              val cap = System.nanoTime() + 30L * 1000000000L
              while (buckets.exists(_.value > 0) && q.exception.isEmpty &&
                  System.nanoTime() < cap)
                Thread.sleep(200)
            }
          } finally q.stop()
        }
      }
      // explicit schema: a zero-hit run leaves only _spark_metadata in the
      // sink dir, and schema inference would throw on a semantically-empty
      // (and oracle-matching) result
      s.read.schema(org.apache.spark.sql.Encoders.product[DupHit].schema)
        .parquet(outDir)
  }

  val q58 = QueryDef(
    "q58_streaming_neardup",
    (s, d) => neardupStream(s, d, None),
    Some(s"""
      WITH ${DedupOps.oracleBandsCte},
      own AS (SELECT bj, bkey, min(doc_id) AS owner_doc
              FROM bands WHERE doc_id % 2 = 0 GROUP BY bj, bkey)
      SELECT b.bj AS bj, o.owner_doc AS owner_doc, b.doc_id AS dup_doc
      FROM bands b JOIN own o ON b.bj = o.bj AND b.bkey = o.bkey
      WHERE b.doc_id % 2 = 1"""))

  /** Stream-STATIC enrichment join — the remaining production join shape
    * the gate didn't cover: an unbounded fact stream (events, file source
    * replayed with `maxFilesPerTrigger=1` so the join runs across several
    * micro-batches) enriched against a bounded static dimension
    * (customer), stateless and append-mode — no watermark, no state
    * store; every micro-batch joins and emits immediately. Spark plans
    * the static side as a broadcast per batch — the deployment shape for
    * catalog-sized dims; a dim too big to broadcast falls back to a
    * shuffle join with the same logical plan (a config threshold, not a
    * rewrite). The purchase filter is pushed to the streaming scan.
    * Output is the enriched row SET (batch-split invariant since the
    * operator is stateless); oracle is the identical batch join. */
  val q64 = QueryDef(
    "q64_streaming_enrich",
    (s, d) => {
      import s.implicits._
      val sch = Q.table(s, d, "events").schema
      val inDir = tempDir("graft-q64-in")
      linkParts(d, "events", inDir)
      val cust = Q.table(s, d, "customer")
        .select($"c_custkey", $"c_nationkey", $"c_mktsegment")
      val outDir = tempDir("graft-q64-out").toString
      val ckpt = tempDir("graft-q64-ckpt").toString
      val q = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir.toString)
        .where($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"value")
        .join(cust, $"user_id" === $"c_custkey")
        .select($"event_id", $"user_id", $"value", $"c_nationkey", $"c_mktsegment")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(outDir)
    },
    Some("""
      SELECT e.event_id, e.user_id, e.value, c.c_nationkey, c.c_mktsegment
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.event_type = 'purchase'"""))

  /** Streaming stream-static ANN — ingest-time retrieval: embedding rows
    * arrive as micro-batches (parity-staged file stream), and each
    * batch's QUERY vectors (s02/s03's `qSet`) probe the STATIC corpus
    * IVF index ([[SimilarityOps.s03Statics]]: normalized corpus + probe
    * assignments, staged once before the stream starts) for their top-5
    * cosine neighbors. Per batch the logic is stateless — assign the
    * streamed vector to its probe centroids (same broadcast-centroid
    * arg-max as the batch row), join the probed inverted lists, score,
    * rank — so the emitted SET is batch-split invariant and the oracle
    * is s03's UNCHANGED batch oracle: the streaming pipeline must
    * reproduce the batch result exactly.
    *
    * Spelled with `foreachBatch` (the production pattern for
    * stream-static joins needing per-batch ranking: append-mode
    * streaming forbids non-time windows, but inside foreachBatch each
    * micro-batch is a bounded frame where `row_number` is legal). At
    * 100 TB the static side is the big one and never re-shuffles per
    * batch: the streamed queries broadcast onto the probed lists. */
  val s11 = QueryDef(
    "s11_streaming_knn",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      SimilarityOps.s03Statics(s, d)
      // hand the static index to the micro-batch session as FILES: the
      // foreachBatch session is a clone whose inherited views point at
      // the outer session's cached plans, and executing those across the
      // session boundary breaks (exchange-reuse key errors). Parquet is
      // the session-neutral contract — exactly how a deployed job would
      // ship a prebuilt index to a streaming consumer anyway.
      val nPath = tempDir("graft-s11-n").toString
      val aPath = tempDir("graft-s11-assign").toString
      s.table("s03_n").write.mode("overwrite").parquet(nPath)
      s.table("s03_assign").write.mode("overwrite").parquet(aPath)
      val sch = Q.table(s, d, "embeddings").schema
      // batch membership = (vec_id div 100) % 2: the query set is
      // vec_id % 100 = 0 (all even ids), so a plain id-parity split would
      // land every query in one batch — this split alternates QUERIES
      // across batches, proving genuine multi-batch operation
      val inDir = stageParityBatches(s, d, "embeddings",
        parity = "(vec_id div 100) % 2")
      val outDir = tempDir("graft-s11-out").toString
      val ckpt = tempDir("graft-s11-ckpt").toString
      val q = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          // the micro-batch Dataset lives in a session CLONED at stream
          // start (temp views + functions inherited) — register and query
          // there, not on the outer session, or the view is invisible
          val bs = batch.sparkSession
          graft.functions.GraftFunctions.register(bs)
          batch.createOrReplaceTempView("s11_batch")
          bs.read.parquet(nPath).createOrReplaceTempView("s03_n")
          bs.read.parquet(aPath).createOrReplaceTempView("s03_assign")
          bs.sql(s"""
            WITH bq AS (SELECT vec_id,
                          transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                        FROM s11_batch WHERE ${SimilarityOps.qSet}),
            nq AS (SELECT vec_id, v, sqrt(dot_product(v, v)) AS nrm FROM bq),
            c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM s03_n
                  WHERE vec_id % 50 = 7 AND vec_id < 3200),
            pr AS (SELECT /*+ BROADCAST(c) */ t.vec_id AS query_id, cid,
                     row_number() OVER (PARTITION BY t.vec_id
                       ORDER BY dot_product(t.v, cv) / (t.nrm * cn) DESC,
                                cid) AS rn
                   FROM nq t CROSS JOIN c),
            probes AS (SELECT query_id, cid AS cluster FROM pr
                       WHERE rn <= ${SimilarityOps.ivfProbes}),
            members AS (SELECT vec_id, cluster FROM s03_assign WHERE rn = 1),
            cand AS (SELECT DISTINCT p.query_id, m.vec_id AS neighbor_id
                     FROM probes p JOIN members m ON m.cluster = p.cluster
                     WHERE m.vec_id <> p.query_id),
            sc AS (SELECT cand.query_id, cand.neighbor_id,
                     dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
                   FROM cand JOIN nq q ON q.vec_id = cand.query_id
                             JOIN s03_n t ON t.vec_id = cand.neighbor_id),
            r AS (SELECT query_id, neighbor_id, cos,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rn
                  FROM sc)
            SELECT query_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rn,
                   CAST($batchId AS BIGINT) AS batch_id
            FROM r WHERE rn <= 5""")
            // foreachBatch is at-least-once: a replayed micro-batch must
            // not duplicate rows in the sink. Standard idempotence
            // pattern — partition by batchId + dynamic-partition
            // overwrite, so a retry REPLACES its own batch's output and
            // never touches other batches' (round-10 advice item).
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(outDir).drop("batch_id")
    },
    // the streaming pipeline must reproduce the batch result exactly
    SimilarityOps.s03.oracle)

  private[graft] case class SpanRow(doc_id: Long, p: Long, h: String)
  private[graft] case class SpanHit(doc_id: Long, p: Long)

  /** d20's per-shingle FSM body, extracted so the spec pins its ONE
    * load-bearing memory property: per-group memory is O(1) in the
    * batch, NEVER O(occurrences). The round-11 spelling did
    * `rows.toSeq.sortBy(...)` — a universal-boilerplate shingle
    * occurring millions of times in one batch landed in one in-memory
    * Seq in one task (round-11 verdict item 3). Now: a hash already
    * owned (state exists) streams its occurrences out LAZILY without
    * touching the iterator up front (the sort existed only for
    * deterministic output order, which the parquet sink + sorted oracle
    * compare never needed); an unseen hash folds the iterator into a
    * running min — one Long of state, no buffering either way. State
    * updates stay inside the function call (the lazy branch performs
    * none), as `flatMapGroupsWithState` requires. */
  private[graft] def spanFsm(
      rows: Iterator[SpanRow],
      st: org.apache.spark.sql.streaming.GroupState[BucketOwner])
      : Iterator[SpanHit] =
    if (st.exists) rows.map(r => SpanHit(r.doc_id, r.p))
    else {
      var mn = Long.MaxValue
      while (rows.hasNext) { val r = rows.next(); if (r.doc_id < mn) mn = r.doc_id }
      st.update(BucketOwner(mn))
      Iterator.empty
    }

  /** Streaming ingest-time SUBSTRING dedup — d19's variable-length exact
    * span removal at the point of ingest (the place a production pipeline
    * actually wants it: strip boilerplate from NEW documents against the
    * corpus already admitted, not in a nightly batch). q58's
    * bucket-registry FSM on shingle hashes: per arriving document, a
    * shingle hash at every token offset; the first batch to present a
    * hash registers as its owner (state = one row per distinct live
    * shingle, metadata-width); later batches' occurrences emit
    * `(doc_id, position)` hits. A batch post-pass then replays d19's
    * linear coverage machinery (window MAX over the last W−1 hit flags +
    * `lag` span heads) to reassemble each later-batch document with its
    * owned spans stripped.
    *
    * Hits are strictly cross-batch (batch-internal repeats are d19's
    * batch job), and batch membership is a pure function of the data
    * ([[stageParityBatches]]: even docs then odd docs), so the DuckDB
    * oracle derives the identical result in batch SQL: repeated-hash set
    * = the EVEN docs' shingles, coverage over the ODD docs.
    *
    * Scale: state is one entry per distinct live shingle (539 k at 64× —
    * the q49 RocksDB seam + q58's TTL pattern are the unbounded dials);
    * per batch only the NEW documents' shingles shuffle. */
  private[graft] def spanDedupStream(
      s: SparkSession, d: String, provider: Option[String]): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val W = CurationOps.W
    val sch = Q.table(s, d, "documents").schema
    val inDir = stageParityBatches(s, d, "documents")
    val outDir = tempDir("graft-d20-out").toString
    val ckpt = tempDir("graft-d20-ckpt").toString
    val hits = s.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
      .where("length(text) >= 1")
      .selectExpr("doc_id", s"split(${Q.sNorm}, ' ') AS t")
      .where(s"size(t) >= $W")
      .selectExpr("doc_id", "t",
        s"explode(sequence(0, size(t) - $W)) AS p")
      .selectExpr("doc_id", "CAST(p AS BIGINT) AS p",
        s"md5(array_join(slice(t, p + 1, $W), ' ')) AS h")
      .as[SpanRow]
      .groupByKey(_.h)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[SpanRow],
         st: org.apache.spark.sql.streaming.GroupState[BucketOwner]) =>
          spanFsm(rows, st)
      }
    graft.streaming.StateStores.withProvider(s, provider) {
      val q = hits.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.schema(org.apache.spark.sql.Encoders.product[SpanHit].schema)
      .parquet(outDir)
      .createOrReplaceTempView("d20_hits")
    // batch post-pass: d19's coverage + reassembly over the LATER batch
    CurationOps.coverageTail(Q.withViews(s, d, "documents")(s"""
      WITH toks AS (SELECT doc_id, split(${Q.sNorm}, ' ') AS t
                    FROM documents
                    WHERE length(text) >= 1 AND doc_id % 2 = 1),
      pr AS (SELECT doc_id, pos AS p, tok
             FROM toks LATERAL VIEW posexplode(t) x AS pos, tok),
      sh AS (SELECT DISTINCT doc_id, p FROM d20_hits)
      SELECT pr.doc_id, pr.p, pr.tok,
             CASE WHEN sh.p IS NOT NULL THEN 1 ELSE 0 END AS sb
      FROM pr LEFT JOIN sh
        ON pr.doc_id = sh.doc_id AND pr.p = sh.p"""))
  }

  val d20 = QueryDef(
    "d20_streaming_span_dedup",
    (s, d) => spanDedupStream(s, d, None),
    Some {
      val W = CurationOps.W
      s"""
      WITH toks AS (SELECT doc_id, string_split(${Q.oNorm}, ' ') AS t
                    FROM documents WHERE length(text) >= 1),
      pr AS (SELECT doc_id, CAST(p1 - 1 AS BIGINT) AS p, t[CAST(p1 AS INT)] AS tok,
               CASE WHEN p1 + $W - 1 <= len(t)
                    THEN md5(array_to_string(
                      list_slice(t, CAST(p1 AS INT), CAST(p1 + $W - 1 AS INT)), ' '))
               END AS h
             FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p1
                   FROM toks)),
      rep AS (SELECT DISTINCT h FROM pr
              WHERE h IS NOT NULL AND doc_id % 2 = 0),
      mk AS (SELECT pr.doc_id, pr.p, pr.tok,
               CASE WHEN r.h IS NOT NULL THEN 1 ELSE 0 END AS sb
             FROM pr LEFT JOIN rep r ON pr.h = r.h
             WHERE pr.doc_id % 2 = 1),
      ${CurationOps.oCoverageTail}"""
    })

  final case class D23Mem(doc_id: Long, n_chars: Long)
  final case class D23Member(cluster_id: Long, doc_id: Long, n_chars: Long)
  final case class D23Tomb(cluster_id: Long, doc_id: Long, bno: Long)
  final case class D23ClusterState(members: Seq[D23Mem])
  final case class D23Out(bno: Long, cluster_id: Long, canonical_doc: Long,
      canonical_chars: Long, n_members: Long)

  /** d23's per-cluster FSM, extracted for the spec (d20's pattern): fold
    * the batch's tombstones for this cluster into a deletion set (bounded
    * by the batch's requests for ONE cluster), strip them from the
    * surviving-member state, and emit the re-elected canonical — or the
    * `(-1, -1, 0)` sentinel when the cluster empties. A key invoked with
    * no batch rows (possible when the runtime touches seeded initial
    * state) emits nothing and leaves state untouched — the delta
    * contract: silence means "stored base row still valid". State is the
    * cluster's surviving member list — the same per-group bound d13's
    * election window already has. */
  private[graft] def deleteFsm(key: Long, rows: Iterator[D23Tomb],
      st: org.apache.spark.sql.streaming.GroupState[D23ClusterState])
      : Iterator[D23Out] =
    if (!rows.hasNext) Iterator.empty
    else {
      var bno = 0L
      val del = scala.collection.mutable.HashSet.empty[Long]
      while (rows.hasNext) { val r = rows.next(); bno = r.bno; del += r.doc_id }
      val cur = st.getOption.map(_.members).getOrElse(Seq.empty)
      val rest = cur.filterNot(m => del.contains(m.doc_id))
      st.update(D23ClusterState(rest))
      if (rest.isEmpty) Iterator.single(D23Out(bno, key, -1L, -1L, 0L))
      else {
        var cd = rest.head
        rest.tail.foreach { m =>
          if (m.n_chars > cd.n_chars ||
            (m.n_chars == cd.n_chars && m.doc_id < cd.doc_id)) cd = m
        }
        Iterator.single(D23Out(bno, key, cd.doc_id, cd.n_chars,
          rest.size.toLong))
      }
    }

  /** STREAMING deletion propagation — d22 at the point the deletion
    * requests actually arrive (GDPR/opt-out feeds are streams, and the
    * SLA is "stop serving the data promptly", not "wait for the nightly
    * batch"): tombstone requests arrive as micro-batches, map to their
    * dedup cluster through the STATIC member artifact (stream-static
    * join, q64's shape), and a `flatMapGroupsWithState` FSM keyed by
    * cluster — INITIALIZED from the stored artifact via the initial-state
    * seam — strips the deleted members and emits the re-elected canonical
    * row per touched cluster per batch. Untouched clusters emit nothing
    * (their stored base row stays valid — d22's delta contract,
    * incrementally); an emptied cluster emits the `(-1,-1,0)` retirement
    * sentinel. Batch membership is a pure function of the data
    * ([[stageParityBatches]] with the tombstone rule folded into the
    * parity expression: even requests then odd requests), so the DuckDB
    * oracle reproduces the exact per-batch emission set in batch SQL — a
    * cluster hit in both batches emits twice with strictly shrinking
    * membership, and the hash checks both snapshots.
    *
    * Scale: state = surviving member list per cluster (bounded by
    * cluster size — d13's existing per-group bound; RocksDB provider via
    * the q49 seam, StreamingSpec parity); per batch only the REQUESTS
    * shuffle (request-batch-sized ≪ corpus) — the member artifact
    * broadcasts once as the static join side and the corpus itself never
    * moves. */
  private[graft] def deletePropagationStream(
      s: SparkSession, d: String, provider: Option[String]): DataFrame = {
    import s.implicits._
    DedupOps.d06.run(s, d).createOrReplaceTempView("d23_lab")
    val mem = Q.staged("d23_mem", d) {
      Q.withViews(s, d, "documents")("""
        SELECT l.cluster_id, l.doc_id, doc.n_chars
        FROM d23_lab l JOIN documents doc ON l.doc_id = doc.doc_id""")
    }
    val init = mem.groupBy($"cluster_id")
      .agg(collect_list(struct($"doc_id", $"n_chars")).as("members"))
      .as[(Long, Seq[D23Mem])]
      .map { case (cid, ms) => (cid, D23ClusterState(ms)) }
      .groupByKey(_._1).mapValues(_._2)
    // the request feed: documents restricted to the tombstone rule, split
    // even-requests-then-odd-requests (rule folded into the parity expr
    // so non-tombstoned docs land in neither batch)
    val sch = Q.table(s, d, "documents").schema
    val inDir = stageParityBatches(s, d, "documents",
      parity = "CASE WHEN doc_id % 13 = 4 THEN CAST(doc_id % 2 AS INT) ELSE -1 END")
    val outDir = tempDir("graft-d23-out").toString
    val ckpt = tempDir("graft-d23-ckpt").toString
    val out = s.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
      .select($"doc_id")
      .join(mem, "doc_id") // unclustered requests touch no cluster row
      .selectExpr("cluster_id", "doc_id", "CAST(doc_id % 2 AS BIGINT) AS bno")
      .as[D23Tomb]
      .groupByKey(_.cluster_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
        initialState = init)(deleteFsm _)
    graft.streaming.StateStores.withProvider(s, provider) {
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.schema(org.apache.spark.sql.Encoders.product[D23Out].schema)
      .parquet(outDir)
  }

  val d23 = QueryDef(
    "d23_streaming_delete_propagation",
    (s, d) => deletePropagationStream(s, d, None),
    Some(s"""
      WITH lab AS (${DedupOps.d06.oracle.get.trim}),
      mem AS (SELECT l.cluster_id, l.doc_id, doc.n_chars
              FROM lab l JOIN documents doc ON l.doc_id = doc.doc_id),
      tomb AS (SELECT m.cluster_id, m.doc_id,
                 CAST(m.doc_id % 2 AS BIGINT) AS bno
               FROM mem m WHERE m.doc_id % 13 = 4),
      aff AS (SELECT DISTINCT cluster_id, bno FROM tomb),
      surv AS (SELECT a.bno, m.cluster_id, m.doc_id, m.n_chars
               FROM aff a JOIN mem m ON a.cluster_id = m.cluster_id
               LEFT JOIN tomb t
                 ON m.doc_id = t.doc_id AND t.bno <= a.bno
               WHERE t.doc_id IS NULL),
      re AS (SELECT bno, cluster_id,
               max(CASE WHEN rk = 1 THEN doc_id END) AS cd,
               max(CASE WHEN rk = 1 THEN n_chars END) AS cc,
               CAST(count(*) AS BIGINT) AS n
             FROM (SELECT s.bno, s.cluster_id, s.doc_id, s.n_chars,
                     row_number() OVER (PARTITION BY s.bno, s.cluster_id
                       ORDER BY s.n_chars DESC, s.doc_id) AS rk
                   FROM surv s) t
             GROUP BY bno, cluster_id)
      SELECT bno, cluster_id, cd AS canonical_doc, cc AS canonical_chars,
             n AS n_members
      FROM re
      UNION ALL
      SELECT a.bno, a.cluster_id, CAST(-1 AS BIGINT) AS canonical_doc,
             CAST(-1 AS BIGINT) AS canonical_chars,
             CAST(0 AS BIGINT) AS n_members
      FROM aff a LEFT JOIN re r
        ON a.bno = r.bno AND a.cluster_id = r.cluster_id
      WHERE r.cluster_id IS NULL"""))

  final case class DriftRow(tok: String, snap: Long, cnt: Long)
  final case class DriftState(cnt_a: Long, cnt_b: Long)
  final case class DriftOut(bno: Long, tok: String, cnt_a: Long, cnt_b: Long)

  /** q71's per-token FSM (d20's extraction pattern): fold the batch's
    * occurrence counts into the running (cnt_a, cnt_b) pair and emit ONE
    * row with the updated totals — O(1) state and O(1) memory per group
    * regardless of how often a token occurs in a batch (the iterator is
    * folded, never buffered). The batch number rides the rows themselves:
    * the staging layout (maxFilesPerTrigger=1 over parity-staged files)
    * makes every micro-batch parity-uniform, and the fold ENFORCES that
    * invariant rather than assuming it (round-13 advice) — a mixed-parity
    * batch (config change, file compaction, a different trigger) would
    * otherwise fold both snapshots into one emission with an arbitrary
    * bno and silently miscompute the NA/NB alarm post-pass, so it fails
    * loudly here instead. */
  private[graft] def driftFsm(
      tok: String, rows: Iterator[DriftRow],
      st: org.apache.spark.sql.streaming.GroupState[DriftState])
      : Iterator[DriftOut] = {
    var a = 0L; var b = 0L; var bno = -1L
    while (rows.hasNext) {
      val r = rows.next()
      if (bno == -1L) bno = r.snap
      else if (r.snap != bno)
        throw new IllegalStateException(
          s"driftFsm: mixed-parity micro-batch for token '$tok' " +
            s"(snap ${r.snap} after snap $bno) — the parity-staged " +
            "maxFilesPerTrigger=1 layout was violated")
      if (r.snap == 0L) a += r.cnt else b += r.cnt
    }
    val prev = st.getOption.getOrElse(DriftState(0L, 0L))
    val next = DriftState(prev.cnt_a + a, prev.cnt_b + b)
    st.update(next)
    Iterator.single(DriftOut(bno, tok, next.cnt_a, next.cnt_b))
  }

  /** STREAMING token-distribution drift — q70 at the point snapshot N+1
    * actually arrives: per ingest batch, each touched token's RUNNING
    * (baseline, incoming) counts, with the drift alarm evaluated against
    * the running totals — the monitoring a recurring pipeline wants
    * per-ingest, not after the release is already assembled. d23's
    * regime applied to the data-card path: the spec proves the final
    * per-token state CONVERGES to q70's batch pivot, so the two paths
    * are one semantics at two latencies.
    *
    * Scale: state is one (cnt_a, cnt_b) pair per distinct vocabulary
    * token (vocabulary-width — sublinear in corpus); per batch only the
    * arriving documents' histogram rows shuffle; the alarm post-pass
    * touches the metadata-width emission frame only. */
  private[graft] def driftStream(
      s: SparkSession, d: String, provider: Option[String]): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val sch = Q.table(s, d, "documents").schema
    val inDir = stageParityBatches(s, d, "documents")
    val outDir = tempDir("graft-q71-out").toString
    val ckpt = tempDir("graft-q71-ckpt").toString
    val rows = s.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
      .where("length(text) >= 1")
      .selectExpr("doc_id % 2 AS snap",
        s"explode(space_token_histogram(${Q.sNorm})) AS (tok, cnt)")
      .selectExpr("tok", "CAST(snap AS BIGINT) AS snap", "CAST(cnt AS BIGINT) AS cnt")
      .as[DriftRow]
      .groupByKey(_.tok)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (tok: String, rs: Iterator[DriftRow],
         st: org.apache.spark.sql.streaming.GroupState[DriftState]) =>
          driftFsm(tok, rs, st)
      }
    graft.streaming.StateStores.withProvider(s, provider) {
      val q = rows.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // alarm post-pass over the metadata-width emissions: NA = the full
    // baseline total (known after batch 0), NB = the running incoming
    // total; checkpointed leaf so the three references share one scan
    Q.roundCheckpoint(
      s.read.schema(org.apache.spark.sql.Encoders.product[DriftOut].schema)
        .parquet(outDir))
      .createOrReplaceTempView("q71_hits")
    s.sql(s"""
      WITH na AS (SELECT CAST(coalesce(sum(cnt_a), 0) AS BIGINT) AS v
                  FROM q71_hits WHERE bno = 0),
      nb AS (SELECT CAST(coalesce(sum(cnt_b), 0) AS BIGINT) AS v
             FROM q71_hits WHERE bno = 1)
      SELECT h.bno, h.tok, h.cnt_a, h.cnt_b,
             CASE WHEN h.bno = 1
                  THEN abs(h.cnt_a * nb.v - h.cnt_b * na.v)
                         > ${CorpusOps.driftRhs("na.v", "nb.v", "div")}
                  ELSE false END AS is_drifted
      FROM q71_hits h CROSS JOIN na CROSS JOIN nb""")
  }

  val q71 = QueryDef(
    "q71_streaming_drift",
    (s, d) => driftStream(s, d, None),
    Some(s"""
      WITH toks AS (SELECT doc_id % 2 AS snap, tok FROM (
              SELECT doc_id, unnest(string_split(${Q.oNorm}, ' ')) AS tok
              FROM documents WHERE length(text) >= 1) WHERE tok <> ''),
      tc AS (SELECT snap, tok, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
      ec AS (SELECT tok, c FROM tc WHERE snap = 0),
      oc AS (SELECT tok, c FROM tc WHERE snap = 1),
      na AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS v FROM ec),
      nb AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS v FROM oc)
      SELECT CAST(0 AS BIGINT) AS bno, tok, c AS cnt_a,
             CAST(0 AS BIGINT) AS cnt_b, false AS is_drifted
      FROM ec
      UNION ALL
      SELECT CAST(1 AS BIGINT), o.tok, CAST(coalesce(e.c, 0) AS BIGINT), o.c,
             abs(coalesce(e.c, 0) * nb.v - o.c * na.v)
               > ${CorpusOps.driftRhs("na.v", "nb.v", "//")}
      FROM oc o LEFT JOIN ec e ON o.tok = e.tok
      CROSS JOIN na CROSS JOIN nb"""))

  final case class D28Edge(a: Long, b: Long)
  final case class D28State(members: Seq[Long], edges: Seq[D28Edge])
  final case class D28Tomb(cluster_id: Long, vec_id: Long, bno: Long)
  final case class D28Out(bno: Long, old_cluster: Long, vec_id: Long,
      new_cluster: Long, is_pruned_new: Boolean)

  /** d28's per-cluster FSM (d23's extraction pattern, one level deeper in
    * the artifact stack): fold the batch's tombstones for this SEMANTIC
    * cluster into a deletion set, strip them from the surviving member
    * list AND the surviving intra-cluster mutual-τ edge list, then
    * re-derive the component labels among survivors — a deletion can
    * SPLIT a semantic neighborhood (the deleted node may be the
    * articulation point), so re-election is connectivity, not a max scan
    * like d23's. Components come from a min-label union-find over the
    * cluster's surviving stored edges — the in-group twin of
    * [[DedupOps.minLabelComponents]]'s distributed fixpoint, exact
    * because the state holds the WHOLE cluster's edges (cluster-bounded:
    * ≤ members·k rows — d13/d23's per-group bound). Mixed-parity batches
    * fail loudly (q71's hardened convention, round-14): the parity-staged
    * maxFilesPerTrigger=1 layout is ENFORCED, not assumed. A key invoked
    * with no batch rows emits nothing and leaves state untouched — the
    * delta contract: silence means "stored labels still valid". */
  private[graft] def semDeleteFsm(key: Long, rows: Iterator[D28Tomb],
      st: org.apache.spark.sql.streaming.GroupState[D28State])
      : Iterator[D28Out] =
    if (!rows.hasNext) Iterator.empty
    else {
      var bno = -1L
      val del = scala.collection.mutable.HashSet.empty[Long]
      while (rows.hasNext) {
        val r = rows.next()
        if (bno == -1L) bno = r.bno
        else if (r.bno != bno)
          throw new IllegalStateException(
            s"semDeleteFsm: mixed-parity micro-batch for cluster $key " +
              s"(bno ${r.bno} after bno $bno) — the parity-staged " +
              "maxFilesPerTrigger=1 layout was violated")
        del += r.vec_id
      }
      val cur = st.getOption.getOrElse(D28State(Seq.empty, Seq.empty))
      val ms = cur.members.filterNot(del.contains)
      val es = cur.edges.filter(e => !del.contains(e.a) && !del.contains(e.b))
      st.update(D28State(ms, es))
      if (ms.isEmpty) Iterator.single(D28Out(bno, key, -1L, -1L, false))
      else {
        // min-label connected components over the surviving stored edges:
        // union-by-min with path compression, O(|members| + |edges|)
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        ms.foreach(m => parent(m) = m)
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        es.foreach { e =>
          val ra = find(e.a); val rb = find(e.b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        ms.map { m =>
          val c = find(m)
          D28Out(bno, key, m, c, c != m)
        }.iterator
      }
    }

  /** STREAMING deletion propagation through the SEMANTIC artifacts —
    * d27 at the point the requests actually arrive (round-14 verdict
    * item 5): d23 proves request-arrival-latency repair for d06's
    * LEXICAL clusters, but a forgotten document also survives as a
    * stored neighbor/representative in s15's k-NN graph and d24's
    * semantic clusters, and waiting for d27's batch repair leaves the
    * semantic artifacts serving the deleted vector until the next run.
    * Same seam as d23: tombstones arrive as micro-batches, map to their
    * semantic cluster through the STATIC d24 label artifact
    * (stream-static join), and a `flatMapGroupsWithState` FSM keyed by
    * `sem_cluster_id` — initialized from the stored artifact (members +
    * the cluster's mutual-τ edge subgraph, both cluster-bounded) —
    * emits the repaired per-member labels for each touched cluster per
    * batch; an emptied cluster emits the (-1, -1, false) retirement
    * sentinel. Untouched clusters emit nothing (their stored labels stay
    * valid — the delta contract).
    *
    * The honest scope boundary is d27's, inherited deliberately: the
    * stream repairs over the STORED edge subgraph, so edges a
    * from-scratch survivor rebuild would newly reveal (freed top-k
    * slots) are out of scope by construction. That divergence CANNOT be
    * priced in-stream — pricing it IS a full survivor re-index, a batch
    * job by definition — so the `matches_full` audit lives on d27's
    * batch row (tombstone-now / re-index-on-cadence, with the stream as
    * the "now" leg and d27's rebuild leg pricing the cadence gap).
    *
    * Scale: state per cluster = surviving members + surviving stored
    * intra-cluster edges (≤ members·k — the τ-cut's percolation analysis
    * is exactly the dial keeping neighborhoods small at 100 TB); per
    * batch only the REQUESTS shuffle; the corpus and its vectors never
    * move (the label artifact joins in once as the static side; RocksDB
    * provider parity via the q49 seam, StreamingSpec). */
  private[graft] def semanticDeleteStream(
      s: SparkSession, d: String, provider: Option[String]): DataFrame = {
    import s.implicits._
    DedupOps.s15KnnFrame(s, d)
    val lab = Q.staged("d28_lab", d) { DedupOps.d24.run(s, d) }
    lab.createOrReplaceTempView("d28_lab")
    // the stored cluster-contained mutual-τ edge list, keyed by cluster
    // (both endpoints share the label BY CONSTRUCTION — labels are the
    // components of exactly this edge set)
    val edges = Q.staged("d28_edges", d) {
      s.sql(s"""
        SELECT la.sem_cluster_id AS cluster_id, k.src AS a, k.nb AS b
        FROM s15_knn k
        JOIN s15_knn m ON m.src = k.nb AND m.nb = k.src
        JOIN d28_lab la ON la.vec_id = k.src
        WHERE k.cos >= ${DedupOps.semGraphTau}
          AND m.cos >= ${DedupOps.semGraphTau}""")
    }
    val init = lab.selectExpr("sem_cluster_id AS cluster_id", "vec_id")
      .groupBy($"cluster_id")
      .agg(collect_list($"vec_id").as("members"))
      .join(edges.groupBy($"cluster_id")
        .agg(collect_list(struct($"a", $"b")).as("edges")),
        Seq("cluster_id"), "left")
      .as[(Long, Seq[Long], Option[Seq[D28Edge]])]
      .map { case (cid, ms, es) => (cid, D28State(ms, es.getOrElse(Seq.empty))) }
      .groupByKey(_._1).mapValues(_._2)
    val sch = Q.table(s, d, "embeddings").schema
    val inDir = stageParityBatches(s, d, "embeddings",
      parity = "CASE WHEN vec_id % 13 = 4 THEN CAST(vec_id % 2 AS INT) ELSE -1 END")
    val outDir = tempDir("graft-d28-out").toString
    val ckpt = tempDir("graft-d28-ckpt").toString
    val labKey = lab.selectExpr("vec_id", "sem_cluster_id AS cluster_id")
    val out = s.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
      .select($"vec_id")
      .join(labKey, "vec_id")
      .selectExpr("cluster_id", "vec_id", "CAST(vec_id % 2 AS BIGINT) AS bno")
      .as[D28Tomb]
      .groupByKey(_.cluster_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
        initialState = init)(semDeleteFsm _)
    graft.streaming.StateStores.withProvider(s, provider) {
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.schema(org.apache.spark.sql.Encoders.product[D28Out].schema)
      .parquet(outDir)
  }

  val d28 = QueryDef(
    "d28_streaming_semantic_delete",
    (s, d) => semanticDeleteStream(s, d, None),
    Some(s"""
      WITH RECURSIVE
      lab AS (${DedupOps.d24.oracle.get.trim}),
      knn AS (${DedupOps.s15OracleSql("TRUE").trim}),
      tomb AS (SELECT vec_id, CAST(vec_id % 2 AS BIGINT) AS bno
               FROM embeddings WHERE ${DedupOps.d27TombPred}),
      aff AS (SELECT DISTINCT l.sem_cluster_id AS oc, t.bno
              FROM lab l JOIN tomb t ON l.vec_id = t.vec_id),
      mem AS (SELECT l.vec_id, l.sem_cluster_id AS oc FROM lab l),
      surv AS (SELECT a.bno, a.oc, m.vec_id
               FROM aff a JOIN mem m ON m.oc = a.oc
               LEFT JOIN tomb t ON t.vec_id = m.vec_id AND t.bno <= a.bno
               WHERE t.vec_id IS NULL),
      sedges AS (SELECT sa.bno, k.vec_id AS a, k.neighbor_id AS b
                 FROM knn k
                 JOIN surv sa ON k.vec_id = sa.vec_id
                 JOIN surv sb ON k.neighbor_id = sb.vec_id AND sb.bno = sa.bno
                 WHERE k.mutual AND k.cos >= ${DedupOps.semGraphTau}),
      wnodes AS (SELECT DISTINCT bno, a AS id FROM sedges),
      -- wreach/wnodes, NOT reach/nodes: the embedded d24 oracle defines
      -- its own recursive `reach`/`nodes`, and a same-named outer
      -- recursive CTE makes the inner self-reference bind ambiguously
      -- (d27's dreach/rreach naming, same reason)
      wreach(bno, id, r) AS (
        SELECT bno, id, id FROM wnodes
        UNION
        SELECT e.bno, e.a, wreach.r FROM sedges e
        JOIN wreach ON e.b = wreach.id AND e.bno = wreach.bno),
      dlab AS (SELECT bno, id, min(r) AS c FROM wreach GROUP BY bno, id)
      SELECT s.bno, s.oc AS old_cluster, s.vec_id,
             COALESCE(dl.c, s.vec_id) AS new_cluster,
             (COALESCE(dl.c, s.vec_id) <> s.vec_id) AS is_pruned_new
      FROM surv s LEFT JOIN dlab dl ON dl.bno = s.bno AND dl.id = s.vec_id
      UNION ALL
      SELECT a.bno, a.oc AS old_cluster, CAST(-1 AS BIGINT) AS vec_id,
             CAST(-1 AS BIGINT) AS new_cluster, false AS is_pruned_new
      FROM aff a LEFT JOIN (SELECT DISTINCT bno, oc FROM surv) sv
        ON a.bno = sv.bno AND a.oc = sv.oc
      WHERE sv.oc IS NULL"""))

  val all: Seq[QueryDef] =
    Seq(q42, q43, q49, q53, q58, q64, s11, d20, d23, q71, d28)
}
