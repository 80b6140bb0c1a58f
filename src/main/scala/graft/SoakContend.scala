package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.model.Schemas
import graft.streaming.StateMaterializer

/** FORCED-CONTENTION soak: N real publishing JVMs merging into ONE
  * serving-shape [[graft.store.ManifestTable]] at a tight cadence, so the
  * optimistic publish protocol's contended paths — exclusive-create loss,
  * fencing at the swap, and the disjoint-merge REBASE — fire in the wild
  * across process boundaries, not just under the deterministic in-JVM
  * hooks of ManifestConcurrencySpec. The steady-state soak
  * ([[SoakIngest]]) serializes its cross-process publishers through
  * reservations at production cadences, so its contention counters
  * correctly read zero; this harness exists to make them NONZERO while
  * proving the same end-state guarantee the reference gets from its
  * transactional KV store (store/kv/store.go:332–467): no interleaving
  * loses a commit.
  *
  * Workload shape (chosen so the EXACT final state is computable):
  *   - each child owns a private key range (`own-<child>-k*`) and merges
  *     ALL of its own keys most rounds — cross-child these batches are
  *     key-disjoint AND bounds-disjoint, so a lost race should REBASE;
  *   - every 5th round merges the SHARED keys (`sh-k*`) instead — those
  *     collide across children by content, forcing the recompute path
  *     (the landed winner's higher row must survive the loser's argmax);
  *   - occasionally a child compacts the whole target
  *     (range-partitioned, so per-file bounds re-tighten rather than
  *     spanning every child's range), racing everyone's merges with a
  *     whole-table rewrite — the rebase-ineligible class.
  *
  * Heights are globally unique (`round * children + child`), so LWW
  * expectations are exact: an own key's final row must be its owner's
  * LAST APPLIED own round; a shared key's final row must be the max
  * height any child reports applied. The parent recomputes that expected
  * state from the children's summaries and compares it to the table —
  * `equiv_match:true` with nonzero lost/fenced/rebased counters is the
  * round's proof obligation.
  *
  * Parent: `runMain graft.SoakContend [children] [minutes] [intervalMs]`.
  * Child (spawned by the parent): `child target idx n seconds intervalMs file`.
  */
object SoakContend {
  val OwnKeys = 8
  val SharedKeys = 2
  private val Tablet = "t0"

  def main(args: Array[String]): Unit =
    if (args.nonEmpty && args(0) == "child") child(args.drop(1)) else parent(args)

  private def rowsDf(spark: SparkSession, keys: Seq[String], h: Long,
      v: String): DataFrame = {
    val rows = keys.map(k =>
      Row(1, Tablet, h, k, v.getBytes("UTF-8"), false))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.tabletRows)
  }

  // ------------------------------------------------------------- child

  private def child(args: Array[String]): Unit = {
    val target = args(0)
    val idx = args(1).toInt
    val children = args(2).toInt
    val seconds = args(3).toLong
    val intervalMs = args(4).toLong
    val summaryFile = args(5)
    // KILL-ESCALATED victim ("1"): announce the first escalated
    // derivation via a bait file and stall inside it so the parent can
    // SIGKILL this JVM mid-escalation — reservation, placeholder sidecar
    // and heartbeat marker all left live on disk. The victim never
    // merges shared keys and never compacts, so the SURVIVORS' reports
    // stay sufficient for the parent's exact-state compare (the victim's
    // own keys get a LWW self-consistency check instead — its last
    // applied round dies with it).
    val killBait = args.length > 6 && args(6) == "1"
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-soak-contend-$idx")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = StateMaterializer.targetTable(target)
    val ownKeys = (0 until OwnKeys).map(j => f"own-$idx%02d-k$j")
    val sharedKeys = (0 until SharedKeys).map(j => s"sh-k$j")
    val rnd = new scala.util.Random(idx.toLong * 7919L)
    // WILD-TYPE takeover/fencing injector: once in a while this child
    // pauses at the pre-swap window PAST the (shortened) publish lease --
    // the paused-owner class the fencing nonce exists for, here with a
    // real foreign JVM performing the takeover instead of a spec hook.
    // The pause is one-shot per arm so a single round pays it; the
    // fenced merge's staged attempt then rebases or recomputes like any
    // other loss. Zero lost commits stays the invariant either way.
    val pauseMs = new java.util.concurrent.atomic.AtomicLong(0L)
    t.beforePublishHook = () => {
      val p = pauseMs.getAndSet(0L)
      if (p > 0L) {
        println(s"""{"contend_pause":{"child":$idx,"ms":$p}}""")
        Thread.sleep(p)
      }
    }
    if (killBait) t.duringEscalatedDeriveHook = () => {
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(summaryFile + ".escalating"),
        "1".getBytes("UTF-8"))
      catch { case scala.util.control.NonFatal(_) => () }
      println(s"""{"contend_bait":{"child":$idx,"escalating":true}}""")
      Thread.sleep(20000L) // the parent kills -9 inside this window
    }
    var r = 0
    var lastOwnR = -1L
    var lastSharedR = -1L
    var compactions = 0L
    // Kill-mode parents shorten the compaction cadence (the escalation
    // TRIGGER: a compaction invalidating a staged merge past rebasing)
    // so the victim reaches an escalated derivation within the short
    // run instead of waiting out the default every-97-rounds cadence.
    val compactEvery = sys.props.get("graft.soak.compactEvery")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(97)
    var errors = 0L
    // STARVATION-WAIT gauge: the wall time each merge spent from call to
    // landed (losses, rebases, escalations and reservation waits
    // included). The give-up class this bounds surfaced as
    // ConcurrentPublishException after the retry budget; with loss
    // escalation the claim is that no merge ever approaches it — the MAX
    // is the evidence, not just the error count.
    var maxMergeWaitMs = 0L
    var mergesOver10s = 0L
    val deadline = System.currentTimeMillis() + seconds * 1000L
    while (System.currentTimeMillis() < deadline) {
      val shared = !killBait && r % 5 == 4
      val h = r.toLong * children + idx
      if (!killBait && rnd.nextInt(40) == 0)
        pauseMs.set(graft.store.ManifestTable.publishLeaseMillis + 1500L)
      try {
        if (!killBait && r % compactEvery == compactEvery - 1) {
          // Whole-table rewrite racing everyone's merges: the
          // rebase-ineligible class. Range-partitioned so per-file key
          // bounds re-tighten to contiguous runs instead of spanning
          // every child's range (which would starve the rebase path for
          // the rest of the run).
          StateMaterializer.compact(target, 8)
          compactions += 1L
        }
        val mergeT0 = System.currentTimeMillis()
        val report = t.merge(
          rowsDf(spark, if (shared) sharedKeys else ownKeys, h, s"c$idx-r$r"),
          StateMaterializer.KeyCols, orderCol = "height",
          deleteCol = "is_deletion", commitId = s"c$idx-r$r",
          keepTombstones = true)
        val mergeWait = System.currentTimeMillis() - mergeT0
        if (mergeWait > maxMergeWaitMs) maxMergeWaitMs = mergeWait
        if (mergeWait > 10000L) mergesOver10s += 1L
        if (report.applied) {
          if (shared) lastSharedR = r.toLong else lastOwnR = r.toLong
        } else errors += 1L // unique commitIds: a skip here is a bug
      } catch {
        case scala.util.control.NonFatal(e) =>
          errors += 1L
          println(s"""{"contend_child_error":{"child":$idx,"round":$r,""" +
            s""""error":"${e.getClass.getSimpleName}: ${
              Option(e.getMessage).getOrElse("").take(160)
                .replace("\"", "'").replace("\n", " ")}"}}""")
      }
      r += 1
      Thread.sleep(intervalMs + rnd.nextInt(50).toLong)
    }
    val summary = s"""{"child":$idx,"rounds":$r,""" +
      s""""last_own_r":$lastOwnR,"last_shared_r":$lastSharedR,""" +
      s""""compactions":$compactions,"errors":$errors,""" +
      s""""lost_races":${t.lostRaceCount.get()},""" +
      s""""takeovers":${t.leaseTakeoverCount.get()},""" +
      s""""fenced":${t.fencedPublishCount.get()},""" +
      s""""rebased":${t.rebasedMergeCount.get()},""" +
      s""""escalated":${t.escalatedMergeCount.get()},""" +
      s""""heartbeats":${t.reservationHeartbeatCount.get()},""" +
      s""""max_merge_wait_ms":$maxMergeWaitMs,""" +
      s""""merges_over_10s":$mergesOver10s,""" +
      s""""head_check":"${t.verifyHead().getOrElse("clean")}"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(summaryFile),
      summary.getBytes("UTF-8"))
    println(summary)
    spark.stop()
  }

  // ------------------------------------------------------------ parent

  private def parent(args: Array[String]): Unit = {
    val children = if (args.length > 0) args(0).toInt else 3
    val minutes = if (args.length > 1) args(1).toInt else 5
    val intervalMs = if (args.length > 2) args(2).toLong else 150L
    // "kill-escalated": child 0 becomes the VICTIM — short escalation
    // lease, bait-file announcement, SIGKILLed by this parent mid-
    // escalated-derivation. Proof obligations on top of the ordinary
    // storm: the dead reservation (placeholder + heartbeat marker) is
    // taken over at the short lease by a real foreign JVM, the
    // generation republishes cleanly, the survivors' exact-state compare
    // still holds, and the post-storm sweep returns the marker count to
    // the takeover-survivor baseline.
    val killEscalated = args.length > 3 && args(3) == "kill-escalated"
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[8]")
      .appName("graft-soak-contend")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-contend").toString
    val target = s"$base/serving"
    val seconds = minutes.toLong * 60L

    def fork(idx: Int, file: String): Option[Process] = {
      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      val cp = System.getProperty("java.class.path")
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val victim = killEscalated && idx == 0
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx3g", "-Dspark.ui.enabled=false",
        // Short lease so the injected pre-swap pauses overrun it and real
        // cross-process takeovers + content-fencings happen in-run.
        "-Dgraft.publish.leaseMs=4000") ++
        // The victim's escalated reservation advertises a 3 s lease so
        // its post-kill takeover is measured in seconds in-run.
        (if (victim) Seq("-Dgraft.escalation.leaseMs=3000") else Seq.empty) ++
        // Kill mode: survivors compact every ~12 rounds so the victim's
        // merges keep losing past rebasing — the escalation trigger.
        (if (killEscalated && !victim)
          Seq("-Dgraft.soak.compactEvery=12") else Seq.empty) ++
        Seq("-cp", cp,
        "graft.SoakContend", "child", target, idx.toString,
        children.toString, seconds.toString, intervalMs.toString,
        file) ++ (if (victim) Seq("1") else Seq.empty)).toArray
      try Some(new ProcessBuilder(cmd: _*).inheritIO().start())
      catch {
        case scala.util.control.NonFatal(e) =>
          println(s"""{"contend_spawn_failed":{"child":$idx,"error":"${e.getMessage}"}}""")
          None
      }
    }

    val procs = (0 until children).map { i =>
      (i, s"$base/child-$i.json", fork(i, s"$base/child-$i.json"))
    }

    // MID-STORM READER: while the children race, the parent reads the
    // table continuously — the reader-isolation half of the guarantee.
    // Every poll must parse the head (no torn pointer ever surfaces),
    // the generation must never REGRESS (a regressed pointer would make
    // a changefeed re-emit delivered commits), and a snapshot read at
    // the current head must never error — across hundreds of contended
    // publishes, takeovers, and fencings happening underneath it.
    val deadline = System.currentTimeMillis() + (seconds + 180L) * 1000L
    val t0 = StateMaterializer.targetTable(target)
    var readerReads = 0L
    var readerErrors = 0L
    var lastGen = 0L
    var genRegressions = 0L
    def childrenLive = procs.exists(_._3.exists(_.isAlive))
    val baitFile = java.nio.file.Paths.get(s"$base/child-0.json.escalating")
    var killedAtMs = -1L
    val stormT0 = System.currentTimeMillis()
    while (childrenLive && System.currentTimeMillis() < deadline) {
      if (killEscalated && killedAtMs < 0L &&
          java.nio.file.Files.exists(baitFile)) {
        // The victim announced its escalated derivation and is stalled
        // inside it: reservation owned, placeholder + heartbeat marker
        // on disk. SIGKILL it there — no shutdown hooks, no cleanup.
        Thread.sleep(700L)
        procs.head._3.foreach(_.destroyForcibly())
        killedAtMs = System.currentTimeMillis() - stormT0
        println(s"""{"contend_kill":{"victim":0,"at_ms":$killedAtMs}}""")
      }
      try {
        val g = t0.currentGeneration().getOrElse(0L)
        if (g < lastGen) genRegressions += 1L
        lastGen = math.max(lastGen, g)
        if (g > 0L) { t0.read().count(); () }
        readerReads += 1L
      } catch {
        case scala.util.control.NonFatal(e) =>
          readerErrors += 1L
          println(s"""{"contend_reader_error":"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").take(160)
              .replace("\"", "'").replace("\n", " ")}"}""")
      }
      Thread.sleep(2000L)
    }
    procs.foreach { case (_, _, p) =>
      p.foreach { proc =>
        proc.waitFor(60L, java.util.concurrent.TimeUnit.SECONDS)
        if (proc.isAlive) proc.destroy()
      }
    }

    def field(json: String, name: String): Long =
      json.split("\"" + name + "\":", 2) match {
        case Array(_, rest) => rest.takeWhile(c => c == '-' || c.isDigit).toLong
        case _ => -1L
      }
    val summaries = procs.map { case (i, file, _) =>
      (i, scala.util.Try(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(file)), "UTF-8")).getOrElse(""))
    }

    // Exact expected final state from the children's reports.
    val expected = scala.collection.mutable.Map.empty[String, (Long, String)]
    summaries.foreach { case (c, json) =>
      val lastOwn = field(json, "last_own_r")
      // Kill mode: the victim's keys NEVER join the exact compare —
      // whether it died (summary missing, last applied round unknowable)
      // or survived to write one (its rows are then checked by the same
      // LWW self-consistency rule either way).
      if (lastOwn >= 0L && !(killEscalated && c == 0))
        (0 until OwnKeys).foreach { j =>
          expected.update(f"own-$c%02d-k$j",
            (lastOwn * children + c, s"c$c-r$lastOwn"))
        }
    }
    val sharedWinner = summaries
      .map { case (c, json) => (c, field(json, "last_shared_r")) }
      .filter(_._2 >= 0L)
      .map { case (c, r) => (r * children + c, c, r) }
      .sortBy(_._1).lastOption
    sharedWinner.foreach { case (h, c, r) =>
      (0 until SharedKeys).foreach(j =>
        expected.update(s"sh-k$j", (h, s"c$c-r$r")))
    }

    val t = StateMaterializer.targetTable(target)
    val allRows = t.read().collect().map(row =>
      row.getAs[String]("primary_key") ->
        ((row.getAs[Long]("height"),
          new String(row.getAs[Array[Byte]]("value"), "UTF-8")))).toMap
    // In kill mode the victim's summary died with it, so its own keys
    // cannot join the exact compare — each surviving victim row is
    // instead checked for LWW SELF-consistency (height stamped by child
    // 0, value naming exactly that round): any clobbered / torn / half-
    // merged state fails it. Survivors' keys stay on the exact compare.
    val (victimRows, actual) =
      if (killEscalated) allRows.partition(_._1.startsWith("own-00-"))
      else (Map.empty[String, (Long, String)], allRows)
    val victimConsistent = victimRows.forall { case (_, (h, v)) =>
      h % children == 0 && v == s"c0-r${h / children}"
    }
    val equiv = actual == expected.toMap && victimConsistent
    if (!equiv) {
      val keys = (actual.keySet ++ expected.keySet).toSeq.sorted
      keys.filter(k => actual.get(k) != expected.get(k)).take(20).foreach(k =>
        println(s"""{"contend_mismatch":{"key":"$k","actual":"${actual.get(k)}","expected":"${expected.get(k)}"}}"""))
      victimRows.filterNot { case (_, (h, v)) =>
        h % children == 0 && v == s"c0-r${h / children}" }.take(20)
        .foreach { case (k, hv) => println(
          s"""{"contend_victim_inconsistent":{"key":"$k","actual":"$hv"}}""") }
    }
    def sum(name: String): Long = summaries.map(s => math.max(0L, field(s._2, name))).sum
    def maxOf(name: String): Long =
      summaries.foldLeft(0L)((m, s) => math.max(m, field(s._2, name)))
    println(s"""{"contend_summary":{"children":$children,"minutes":$minutes,""" +
      s""""interval_ms":$intervalMs,""" +
      s""""rounds":${sum("rounds")},"compactions":${sum("compactions")},""" +
      s""""errors":${sum("errors")},""" +
      s""""lost_races":${sum("lost_races")},"takeovers":${sum("takeovers")},""" +
      s""""fenced":${sum("fenced")},"rebased":${sum("rebased")},""" +
      s""""escalated":${sum("escalated")},""" +
      s""""heartbeats":${sum("heartbeats")},""" +
      s""""max_merge_wait_ms":${maxOf("max_merge_wait_ms")},""" +
      s""""merges_over_10s":${sum("merges_over_10s")},""" +
      s""""reader_reads":$readerReads,"reader_errors":$readerErrors,""" +
      s""""gen_regressions":$genRegressions,""" +
      s""""final_generation":${t.currentGeneration().getOrElse(0L)},""" +
      s""""head_check":"${t.verifyHead().getOrElse("clean")}",""" +
      (if (killEscalated)
        s""""killed_victim":0,"killed_at_ms":$killedAtMs,""" +
          s""""victim_keys":${victimRows.size},""" +
          s""""victim_consistent":$victimConsistent,"""
       else "") +
      s""""keys":${actual.size},"equiv_match":$equiv}}""")

    // METADATA CENSUS: the contended-run object accounting the amortized
    // single-writer depth probe cannot see — owner-suffixed attempt
    // manifests (losers linger until swept), pointer staging tmps — plus
    // the read-side resolution cost at this depth. Printed RAW (end of
    // storm), then again after a maintenance sweep under the children's
    // short lease (the parent's default 10-minute floor would reclaim
    // nothing this young), so both the accumulation rate and the
    // steady-state footprint land in the artifact.
    def census(label: String): Unit = {
      val conf = spark.sessionState.newHadoopConf()
      val rootP = new org.apache.hadoop.fs.Path(target)
      val cfs = rootP.getFileSystem(conf)
      val mdir = new org.apache.hadoop.fs.Path(s"$target/_manifests")
      val entries =
        if (cfs.exists(mdir)) cfs.listStatus(mdir)
        else Array.empty[org.apache.hadoop.fs.FileStatus]
      // THE shared name patterns (ManifestTable companion) — a drifted
      // local copy would make this census disagree with the sweep/audit.
      def cls(re: scala.util.matching.Regex) =
        entries.filter(e => re.findFirstIn(e.getPath.getName).isDefined)
      val owned = cls(graft.store.ManifestTable.OwnedManifestNameRe)
      val sidecars = cls(graft.store.ManifestTable.SidecarNameRe)
      val legacy = cls(graft.store.ManifestTable.LegacyManifestNameRe)
      val hbs = cls(graft.store.ManifestTable.HeartbeatNameRe)
      val ownedGens = owned.map(_.getPath.getName.split("\\.")(0)).distinct
      val tmps = cfs.listStatus(rootP)
        .filter(e => e.isFile && e.getPath.getName.endsWith(".tmp"))
      // Fresh handle: the parent's long-lived reader has a warm
      // resolution cache — the census prices a COLD reader at depth.
      val tc = StateMaterializer.targetTable(target)
      val head = tc.currentGeneration().getOrElse(0L)
      val rt0 = System.nanoTime()
      tc.manifestEntriesFull(head)
      val resolveHeadMs = (System.nanoTime() - rt0) / 1000000L
      val lo = math.max(1L, head - 255L)
      val ft0 = System.nanoTime()
      (lo to head).foreach(g => tc.manifestEntries(g))
      val fold256Ms = (System.nanoTime() - ft0) / 1000000L
      println(s"""{"contend_metadata_census":{"label":"$label",""" +
        s""""generation":$head,""" +
        s""""owned_manifests":${owned.length},""" +
        s""""orphan_owned":${owned.length - ownedGens.length},""" +
        s""""owned_bytes":${owned.map(_.getLen).sum},""" +
        s""""sidecars":${sidecars.length},""" +
        s""""sidecar_bytes":${sidecars.map(_.getLen).sum},""" +
        s""""legacy_manifests":${legacy.length},""" +
        s""""heartbeat_markers":${hbs.length},""" +
        s""""pointer_tmps":${tmps.length},""" +
        s""""metadata_objects":${entries.length + tmps.length},""" +
        s""""metadata_bytes":${entries.map(_.getLen).sum + tmps.map(_.getLen).sum},""" +
        s""""resolve_head_ms":$resolveHeadMs,"fold_256_ms":$fold256Ms}}""")
    }
    census("raw")
    // Capture-and-RESTORE the process-global properties rather than
    // remove(): a bare remove would silently unset any harness-provided
    // settings for the rest of the parent run, and the parent's
    // still-live table handles read these dynamically.
    val prevLease = sys.props.get("graft.publish.leaseMs")
    val prevRetry = sys.props.get("graft.publish.retryMs")
    sys.props("graft.publish.leaseMs") = "4000"  // the children's lease
    sys.props("graft.publish.retryMs") = "5000"
    try {
      val swept = t.sweepOrphans(retainGenerations = 8, minAgeMillis = 30000L)
      println(s"""{"contend_sweep":{"reclaimed":${swept.size}}}""")
    } finally {
      prevLease match {
        case Some(v) => sys.props("graft.publish.leaseMs") = v
        case None => sys.props.remove("graft.publish.leaseMs")
      }
      prevRetry match {
        case Some(v) => sys.props("graft.publish.retryMs") = v
        case None => sys.props.remove("graft.publish.retryMs")
      }
    }
    census("swept")
    spark.stop()
  }
}
