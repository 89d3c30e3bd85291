package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    // Timing protocol (evolved over rounds 3-5 chasing dispersion):
    //  - Per-query ADJACENT warmup: each query warms immediately before
    //    its own timed runs. The round-4 global warm-then-time-all loop
    //    left 15 other queries' warm passes (heap churn + C2 compilation
    //    of THEIR generated code) between the first query's warmup and
    //    its timed runs — measured as q01 doubling in the driver bench
    //    (1.26 s) while a same-day adjacent-warm local run showed 0.23 s.
    //  - FIVE timed runs, headline = min (the least-perturbed observation
    //    of the same deterministic work), median reported alongside.
    //  - spread = (median - min)/min: how far the TYPICAL run sits above
    //    the best one. (max-min)/min was reported through round 4, but on
    //    sub-second queries a single scheduler hiccup in any run pushed it
    //    past 1.0 with no engine change — the median-based figure measures
    //    systematic dispersion and stays comparable across rounds; the
    //    worst case is still visible as runs are logged to stderr.
    // Every timed run starts COLD on the staged caches (releaseAllPersisted)
    // so timings are end-to-end engine work, not cache re-reads; a failed
    // query reports -1 (loud), never a bogus timing.
    // optional args = query-name filter (scale experiments time a subset;
    // the driver's no-arg invocation times every headline query)
    val picked =
      if (args.isEmpty) SparkEntry.headline
      else SparkEntry.registry.filter(q => args.contains(q.name))
    // Machine-state calibration (round-10 verdict item 3): driver-bench
    // medians drifted +10% across rounds on IDENTICAL code paths while
    // the controlled idle-machine protocol improved — so each bench run
    // self-records (a) the 1-min loadavg at start and (b) the min-of-3
    // time of a FIXED data-independent calibration job (a codegen'd
    // range→groupBy→count: same scan/hash-agg/shuffle machinery the
    // real queries exercise, zero dependence on the code under test).
    // A round whose aggregate moves >10% with a matching calibration
    // move is machine-attributed in the artifact itself; a move with a
    // flat calibration is a real regression.
    val loadavg1m = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("id % 997 AS k")
        .groupBy("k").count().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    calibOnce() // warm the calibration plan's generated code
    val calibSec = Seq.fill(3)(calibOnce()).min
    // Execute the query's OWN physical plan to completion (toRdd.count
    // consumes every output row in place, nothing ships to the driver).
    // Timing `df.count()` instead is a measurement bug, not a protocol
    // choice: Catalyst prunes columns a count doesn't need, so row-wise
    // projection queries lose their entire payload (t08's quality battery
    // read 0.43 s at 64× while the real work is 10.2 s; q08's window was
    // optimized out completely) — while the DuckDB side of every
    // comparison fetches full rows. This is the same count()-pruning trap
    // ExprProbe documents; rounds ≤ 5 bench numbers for projection-shaped
    // queries are under-measured (aggregate-shaped headliners were
    // unaffected: grouping forces their upstream pipelines).
    def exec(q: graft.ops.QueryDef): Unit =
      q.run(spark, sfDir).queryExecution.toRdd.count()
    def once(q: graft.ops.QueryDef): Double = {
      // sweep staged caches AND checkpoint blocks (d06 rounds) with
      // blocking unpersist, then settle the heap — an async drain racing
      // the next cold run cost q40 a phantom +62% in round 3
      graft.ops.Q.releaseAllPersisted(spark)
      System.gc()
      val t0 = System.nanoTime()
      val t = try { exec(q); (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
          -1.0
      }
      System.err.println(String.format(java.util.Locale.ROOT, "[bench] %s run: %.3f s", q.name, Double.box(t)))
      t
    }
    val nRuns = 5
    val runs = picked.map { q =>
      // adjacent warmup: JIT-compile THIS query's generated code and take
      // the C2 storm now, right before its timed runs
      graft.ops.Q.releaseAllPersisted(spark)
      try exec(q)
      catch { case _: Throwable => () } // failures surface in the timed runs
      q.name -> Seq.fill(nRuns)(once(q))
    }
    val results = runs.map { case (name, rs) =>
      name -> (if (rs.exists(_ < 0)) -1.0 else rs.min)
    }.toMap
    val medians = runs.collect { case (name, rs) if rs.forall(_ >= 0) =>
      name -> rs.sorted.apply(nRuns / 2)
    }.toMap
    val spread = runs.collect { case (name, rs) if rs.forall(_ >= 0) && rs.min > 0 =>
      name -> ((rs.sorted.apply(nRuns / 2) - rs.min) / rs.min)
    }.toMap
    // Locale.ROOT: the f-interpolator honors the default locale, and a
    // comma-decimal locale would make the emitted line invalid JSON
    def fmt(m: Map[String, Double]): String =
      m.map { case (k, v) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
      }.mkString("{", ",", "}")
    // failures (-1 sentinel) are reported, never folded into the total
    val ok = results.filter(_._2 >= 0)
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    // Calib-drift guard (round-14 verdict item 2): the committed round-14
    // "final" artifact self-recorded loadavg 6.78 with the calibration job
    // +69% over the same round's quiet-machine baseline — a loaded run
    // silently became the round's headline. The bench now defends itself:
    // any run whose fixed calibration job drifts >25% off the committed
    // quiet reference is STAMPED "load_suspect":true in the artifact
    // itself, so a noisy run can never masquerade as a clean baseline.
    // The reference resolves from (in order): -Dgraft.bench.calibRef, a
    // committed per-host calibration file (tools/bench_calib.json — keyed
    // so a new host gets a loud "uncalibrated" stamp instead of silently
    // inheriting another machine's constant, round-15 advice), then the
    // historical in-code constant as a last resort. The artifact stamps
    // WHERE the reference came from so a reader can tell a calibrated
    // verdict from an inherited one.
    val (calibQuietRef, calibRefSource) =
      sys.props.get("graft.bench.calibRef")
        .map(v => (v.toDouble, "prop")) getOrElse {
        val f = java.nio.file.Paths.get(
          sys.props.get("graft.repo.root")
            .orElse(sys.env.get("GRAFT_REPO_ROOT"))
            .getOrElse(sys.props.getOrElse("user.dir", ".")),
          "tools", "bench_calib.json")
        val fromFile = try {
          val txt = new String(java.nio.file.Files.readAllBytes(f),
            java.nio.charset.StandardCharsets.UTF_8)
          // single-purpose parse: {"calib_ref": <double>, ...}
          val m = java.util.regex.Pattern
            .compile(""""calib_ref"\s*:\s*([0-9.]+)""").matcher(txt)
          if (m.find()) Some(m.group(1).toDouble) else None
        } catch { case _: Throwable => None }
        fromFile.map(v => (v, "file"))
          .getOrElse((0.43, "default_unverified"))
      }
    val calibDrift = calibSec / calibQuietRef - 1.0
    // Suspect when EITHER signal fires: calib drift >25% of the quiet
    // reference, OR the machine was demonstrably busy at start (r15's
    // committed pin carried loadavg 8.29 with an in-guard calib — exactly
    // the ambiguity the stamp exists to kill; loadavg > 4 on this 32-core
    // box means several concurrent JVMs, not background hum).
    val loadSuspect = calibDrift > 0.25 || loadavg1m > 4.0
    if (loadSuspect) System.err.println(String.format(java.util.Locale.ROOT,
      "[bench] WARNING: calibration %.3f s (%.0f%% over the quiet " +
        "reference %.2f s) at loadavg %.2f — artifact stamped load_suspect",
      Double.box(calibSec), Double.box(calibDrift * 100),
      Double.box(calibQuietRef), Double.box(loadavg1m)))
    val calib = String.format(java.util.Locale.ROOT,
      """"loadavg1m":%.2f,"calib_sec":%.4f,"calib_ref":%.4f,"calib_ref_source":"%s","calib_drift":%.3f,"load_suspect":%b""",
      Double.box(loadavg1m), Double.box(calibSec), Double.box(calibQuietRef),
      calibRefSource, Double.box(calibDrift), Boolean.box(loadSuspect))
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs":$nRuns,$calib,"queries":${fmt(results)},"medians":${fmt(medians)},"spread":${fmt(spread)},"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // Round-11 verdict item 6: the driver's BENCH_r{N}.json captured only
    // a truncated stdout tail ("parsed": null two rounds running), so the
    // medians were not machine-comparable across rounds. Write the full
    // metric object to files too: a fixed /tmp path the driver can pick
    // up whole, plus a repo-root copy the builder commits each round.
    // The repo copy is resolved against an explicit root (round-12
    // advice: a cwd-relative path silently lands elsewhere when the
    // bench is launched outside the repo): GRAFT_REPO_ROOT env /
    // graft.repo.root property, falling back to user.dir (sbt sets it
    // to the project root). The absolute path is always logged.
    val repoRoot = sys.props.get("graft.repo.root")
      .orElse(sys.env.get("GRAFT_REPO_ROOT"))
      .getOrElse(sys.props.getOrElse("user.dir", "."))
    for (p <- Seq(
           java.nio.file.Paths.get(
             sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench_out.json")),
           java.nio.file.Paths.get(repoRoot, "BENCH_SELF.json"))) {
      val abs = p.toAbsolutePath
      try {
        java.nio.file.Files.write(abs,
          (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[bench] wrote $abs")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $abs: ${e.getMessage}") }
    }
    spark.stop()
  }
}
