package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Shuffle/spill files on tmpfs: the virtio disk's kernel-time
      // spikes dominated bench variance at this data scale.
      .config("spark.local.dir", "/dev/shm/spark-graft")
      // Single-JVM local[32] with a large heap: 64 MB broadcasts are safe
      // and fast here (the default 10 MB is sized for small executors).
      // Corpus-derived frames stay guarded by their own size gates, which
      // read THIS threshold - at real corpus scale their estimates exceed
      // any sane setting and the joins fail over to shuffle plans.
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session (codegen compiler, parquet footer reads, shuffle
    // machinery) so the first timed query doesn't pay JVM start-up costs.
    spark.range(1000).selectExpr("sum(id)").collect()
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    def once(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // Drop the previous run's persisted intermediates: accumulated
      // caches otherwise crowd the heap and GC noise dominates the tail
      // of the run (measured: up to 3x variance on the shingle queries).
      spark.catalog.clearCache()
      try {
        val t0 = System.nanoTime()
        // Force FULL materialization of every output column: a bare
        // count() lets Catalyst prune projections the aggregate doesn't
        // need, which erased scan-local operators' entire compute from
        // their own benchmark (measured: the hashed classifier read
        // 0.34 s counted vs 13.5 s materialized at 100×).
        // bit_xor(xxhash64(...)) folds all columns into one row without
        // ANSI overflow. Each query's FINAL orderBy is still eliminated
        // (the checksum is order-insensitive) — deliberately: those sorts
        // exist only for the deterministic oracle compare, not as
        // operator semantics, and timing them would charge every query a
        // presentation cost no 100 TB consumer pays. Operators whose
        // semantics ARE ordered (top-k, windows) keep that cost: it sits
        // below the aggregate as TakeOrderedAndProject / window exchanges.
        fn(spark, sfDir).selectExpr("count(*)", "bit_xor(xxhash64(struct(*)))")
          .collect()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          // A crashed query must not read as a fast run: -1, not its
          // time-to-failure.
          -1.0
      }
    }
    // Queries at or above 0.3 s are sampled three times and report the
    // MEDIAN: a single sample mixes one-time analysis/codegen and ±40% host
    // noise into round-over-round deltas (both measured), so single runs
    // could not adjudicate even 2x regressions; the MIN (used through round
    // 18) is set by the luckiest window and under-reports the steady warm
    // cost, so cross-round adjudication kept happening on out-of-artifact
    // median tables — the recorded artifact now IS the comparable number
    // (median of {cold, warm, warm} ≈ the warm sample, the statistic the
    // round-over-round watch adjudicates on). The re-samples are
    // INTERLEAVED — two
    // extra sweeps over the whole slow set, not three back-to-back runs of
    // one query — so a multi-second host-noise window can't own all three
    // samples of a single query (observed in round 9: simhash min-of-3
    // reported 4.07 s back-to-back while the isolated warm cost was 0.84 s).
    // Fixed-work CALIBRATION probe: a constant 1e8-row range sum —
    // corpus-independent, shuffle-free, pure codegen throughput. FIFTEEN
    // probes, three at each of five points spaced across the run (start,
    // mid-first-pass, after the first pass, between the two re-sample
    // sweeps, end) after one untimed warm probe (the probe's own codegen
    // compile must not count as host noise). The spread (min/med/max,
    // all reported) makes a noisy host window self-evident in the
    // artifact itself; the cross-round scale factor uses the MEDIAN —
    // round 13 showed a single-probe min swinging 0.33→0.24 between
    // same-code rounds, and round 17 showed even a 5-probe median moving
    // the scaled total 28% on an unchanged box (0.25→0.22 flipped a
    // ÷1.12 discount into a ×1.14 surcharge); 15 probes tighten the
    // denominator the headline number divides by. Round-over-round
    // regression comparisons should scale by calib.med before judging a
    // delta — and adjudicate on MEDIAN-OF-3 full runs, never one.
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      // bit_xor fold: overflow-free under ANSI (a plain sum of id*const
      // blows past Long), same fixed per-row work.
      spark.range(100000000L).selectExpr("bit_xor(id * 2654435761)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    calibOnce() // untimed: compile the probe itself
    val calibBuf = scala.collection.mutable.ArrayBuffer.empty[Double]
    // Every probe is separated from the next by real query work:
    // back-to-back probes measure a JIT-hot state the spaced 0.25 s
    // reference was never pinned against (observed 0.25 spaced vs
    // 0.04-0.09 consecutive on the same box — a 3x artifact that would
    // dominate the scaled total). Chunked interleaving keeps all 15
    // probes the SAME kind of measurement as the original five.
    def interleaveProbes(names: Seq[(String, (SparkSession, String) => DataFrame)],
        nChunks: Int): Seq[(String, Double)] =
      if (names.isEmpty) Seq.empty
      else {
        val size = math.max(1, (names.size + nChunks - 1) / nChunks)
        names.grouped(size).toSeq.flatMap { g =>
          val r = g.map { case (name, fn) => name -> once(name, fn) }
          calibBuf += calibOnce()
          r
        }
      }
    // No probe outside the chunked interleaving: a leading probe right
    // after the untimed warm one, or a trailing probe right after a
    // chunk's own closing probe, is back-to-back by construction — the
    // round-18 median-of-3 session recorded calib minima of 0.05–0.11
    // (vs 0.21–0.26 medians) from exactly those two positions. Hot
    // probes read LOW, which scales the total UP: a bias, not noise.
    // 8 + 3 + 4 chunks keep the probe count at 15, all query-spaced.
    val firstPass = interleaveProbes(named, 8)
    val firstByName = firstPass.toMap
    val slow = named.filter { case (name, _) => firstByName(name) >= 0.3 }
    val sweepA = interleaveProbes(slow, 3)
    val sweepB = interleaveProbes(slow, 4)
    val resamples: Seq[(String, Double)] = sweepA ++ sweepB
    val calibs = calibBuf.toSeq
    val calibMed = calibs.sorted.apply(calibs.size / 2)
    val samplesByName = (firstPass ++ resamples).groupBy(_._1)
    val results = named.map { case (name, _) =>
      val ss = samplesByName(name).map(_._2)
      // Any crashed sample marks the query failed — a query that crashes
      // intermittently must not report its lucky fast run.
      name -> (if (ss.exists(_ < 0)) -1.0
               else ss.sorted.apply(ss.size / 2)) // median of the samples
    }
    // CONTINUITY statistic: per-query MIN (the headline statistic through
    // round 18) — medians read systematically higher than mins on the
    // same samples, so the round the artifact switched statistics needs
    // both totals or every cross-round comparison silently inflates.
    val resultsMin = named.map { case (name, _) =>
      val ss = samplesByName(name).map(_._2)
      name -> (if (ss.exists(_ < 0)) -1.0 else ss.min)
    }
    val totalMin = resultsMin.map(_._2).filter(_ >= 0).sum
    // 2-decimal times and a basename sf keep the whole line under the
    // driver's 2,000-char tail capture with headroom for more queries
    // (round 9's full-precision line was 2,393 chars and lost its own
    // total to truncation; 3 decimals hit exactly 1,998 at 79 queries).
    // 10 ms resolution is far below the host's run-to-run noise.
    // Locale.ROOT: the f-interpolator uses the JVM default locale, which
    // on comma-decimal hosts would emit 0,94 and corrupt the JSON line.
    def fmt(v: Double, places: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(v))
    def fmtQ(v: Double): String = fmt(v, 2).replaceFirst("\\.?0+$", "")
    // The stdout line must stay inside the driver's 2,000-char tail capture
    // or the leading `{"metric":...` is cut and the JSON is lost (happened
    // in round 9). At 83 queries the full per-query dict alone is ~1,900
    // chars, so the line reports individual times ONLY for the >= 0.3 s
    // slow set (the same queries the median-of-3 re-sampling covers — every
    // number printed here is a sampled median) plus every crashed query
    // by name; the sub-0.3 s tail, where a single sample is host-noise
    // anyway, folds into one {n, sum, max} rollup. The COMPLETE per-query
    // table for the round is recorded in PLANS.md, which has no size cap.
    // The >= 0.3 s membership alone is noise-sensitive: on a slow host
    // window nearly every query crosses it (observed this round: 74
    // crossings at a 68.9 s total -> 1,796 chars, ~200 headroom left), so
    // the named set is additionally capped at the TOP-40 slowest. 40
    // entries bound the line at ~1,400 chars at ANY noise level, and the
    // dropped 0.3–0.4 s band is exactly the one where a single number is
    // least informative.
    val (crashed, timed) = results.partition(_._2 < 0)
    val namedSet = (crashed.map(_._1) ++
      timed.filter(_._2 >= 0.3).sortBy(-_._2).take(40).map(_._1)).toSet
    val (named_, fast) = results.partition { case (k, _) => namedSet(k) }
    val qs = named_.map { case (k, v) => "\"" + k + "\":" + fmtQ(v) }
      .mkString("{", ",", "}")
    val fastStr =
      if (fast.isEmpty) """{"n":0,"sum":0,"max":0}"""
      else s"""{"n":${fast.size},"sum":${fmtQ(fast.map(_._2).sum)},""" +
        s""""max":${fmtQ(fast.map(_._2).max)}}"""
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    // `failed` makes totals across runs with different crash sets honestly
    // incomparable at a glance — a crashed heavy query must not read as a
    // speedup.
    val sfName = new java.io.File(sfDir).getName
    // Full tables to stderr for humans / PLANS.md (driver parses stdout
    // only): medians (the artifact statistic) and mins (the pre-r19
    // continuity statistic, for like-for-like cross-round watches).
    System.err.println("[bench-full] " + results
      .map { case (k, v) => s"$k=${fmt(v, 2)}" }.mkString(" "))
    System.err.println("[bench-min] " + resultsMin
      .map { case (k, v) => s"$k=${fmt(v, 2)}" }.mkString(" "))
    // Mechanical cross-round normalization (round-11 verdict item 6,
    // statistic fixed per round-13 item 5): the host's clean-window calib
    // for the fixed 1e8-row probe was pinned ONCE at 0.25 s (round-11
    // same-code runs measured 0.22–0.31; the value is a unit choice, not
    // a tuning knob — changing it rescales every round identically).
    // calib_scaled_total = total · (CALIB_REF / calib.med) expresses this
    // run's total in reference-host seconds, so a round-over-round
    // regression check is one subtraction instead of a prose argument
    // about host noise. MEDIAN of the five spaced probes, not min: the
    // min is set by the single luckiest window and swung the scaled total
    // 16 s between same-code rounds; the median moves only if the host is
    // actually slow for at least half the run. The full spread rides in
    // the calib block so a skewed run is visible either way.
    val CalibRef = 0.25
    val calibScaledTotal = total * (CalibRef / calibMed)
    // Self-describing comparability: the host's clean calibration band is
    // 0.21–0.26 (pinned across rounds 11–18 same-code runs). A calib
    // median past 0.30 means the box was slow for at least half the run —
    // the artifact says so itself, so a reader never mistakes a degraded
    // window's medians for code evidence (the round-19 adjudication).
    val hostDegraded = calibMed > 0.30
    val calibStr =
      s"""{"min":${fmtQ(calibs.min)},"med":${fmtQ(calibMed)},""" +
        s""""max":${fmtQ(calibs.max)},"n":${calibs.size},""" +
        s""""stat":"median","ref":$CalibRef}"""
    println(s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","failed":$failed,"qstat":"median_of_3","host_degraded":$hostDegraded,"total_min":${fmt(totalMin, 3)},"calib":$calibStr,"calib_scaled_total":${fmt(calibScaledTotal, 3)},"calib_scaled_total_min":${fmt(totalMin * (CalibRef / calibMed), 3)},"queries":$qs,"fast":$fastStr,"sf":"$sfName"}""")
    spark.stop()
  }
}
