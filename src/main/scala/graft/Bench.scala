package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every suite query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line of per-query wall seconds.
  *
  * Results are forced through the `noop` sink, not `count()`: count lets
  * Catalyst prune projections (a map-only query would measure nothing),
  * while noop executes the full physical plan and discards rows.
  */
object Bench {

  /** 1-, 5-, 15-minute load averages — recorded in the artifact so an
    * inflated measurement window is self-evident from the JSON alone
    * (two rounds running, the driver's record was taken under heavy
    * host load and overstated per-query times 2-14× vs quiet probes;
    * the artifact itself must carry the evidence). */
  private def loadavg(): String =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(" ").take(3).mkString("[", ",", "]")
    catch { case _: Throwable => "[]" }

  /** Parse a BENCH_QUIET.json body into the per-query min map. First
    * occurrence of each name wins (the "queries" object precedes
    * "queries_median"/"queries_runs" in BENCH_DETAIL-shaped files).
    * `\s*` after the colon: both compact (`"q_x":0.8`) and
    * pretty-printed (`"q_x": 0.8`) records must parse — the round-6
    * committed file was pretty-printed and the stricter regex silently
    * returned an EMPTY map, making the outlier re-probe dead code.
    * Exposed (not private) so BenchSpec can round-trip the COMMITTED
    * file through this exact parser. */
  def parseQuietBaseline(txt: String): Map[String, Double] = {
    val re = """"(q[A-Za-z0-9_]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)""".r
    re.findAllMatchIn(txt).foldLeft(Map.empty[String, Double]) { (m, g) =>
      if (m.contains(g.group(1))) m else m + (g.group(1) -> g.group(2).toDouble)
    }
  }

  /** Committed quiet-host per-query baselines (BENCH_QUIET.json — the
    * "queries" object of a quiet full-suite BENCH_DETAIL run, pinned
    * in git). A present-but-unparseable file is a LOUD failure, not a
    * silent no-baseline state: that exact silence hid a dead re-probe
    * for a full round. */
  private def quietBaseline(): Map[String, Double] = {
    val p = java.nio.file.Paths.get("BENCH_QUIET.json")
    if (!java.nio.file.Files.exists(p)) return Map.empty
    val parsed = parseQuietBaseline(java.nio.file.Files.readString(p))
    if (parsed.isEmpty)
      System.err.println("[bench] WARN: BENCH_QUIET.json exists but parsed " +
        "to an EMPTY baseline map — outlier re-probe is disabled; fix the " +
        "file (or parser) before trusting n_reprobed:0")
    else
      System.err.println(s"[bench] quiet baseline loaded: ${parsed.size} pins")
    parsed
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = graft.core.Session.cpus.toString
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // see core.Session: keep CPU-bound compact-row stages parallel
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM + parquet-footer warmup so query 1 doesn't pay session costs.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    val metrics = new graft.core.MetricsListener
    spark.listenerManager.register(metrics)

    // optional diagnostic subset: SPARK_GRAFT_BENCH_FILTER=regex runs
    // only matching queries (isolates suite-order effects from
    // per-query cost when chasing a regression)
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val selected = filter match {
      // q_stream_* rows are MemoryStream replay harnesses for the
      // correctness gate (hundreds of scheduled micro-batches): they
      // measure micro-batch scheduling overhead, not engine throughput,
      // so the default bench set excludes them (an explicit filter can
      // still select them)
      case None => Queries.all.filterNot(_._1.startsWith("q_stream_"))
      case Some(re) => Queries.all.filter { case (n, _) => re.findFirstIn(n).isDefined }
    }
    // Best-of-N per query (default 3): a single-shot record is one host
    // starvation burst away from being garbage — round 4's recorded run
    // had 150× spikes on queries an independent probe reproduced at
    // ~1 s. The MIN over N same-session runs is the least
    // noise-sensitive point estimate of the code's cost (host bursts
    // only ever ADD time); the median is recorded alongside as the
    // honest typical-run number.
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3))
    val loadStart = loadavg()

    def runReps(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        labelPrefix: String): Seq[Double] =
      (1 to reps).map { r =>
        val lbl = s"$labelPrefix$name#$r"
        metrics.label(lbl)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // listener callbacks are async: wait for this run's event before
        // relabeling, or shuffle bytes get attributed to the next run.
        // 30 s cap — the old 3 s silently misattributed under a starved
        // host; if even 30 s is not enough, say so LOUDLY.
        var tries = 0
        while (ok && metrics.get(lbl).isEmpty && tries < 300) {
          Thread.sleep(100); tries += 1
        }
        if (ok && metrics.get(lbl).isEmpty)
          System.err.println(s"[bench] WARN: no listener event for $lbl " +
            "after 30 s — shuffle attribution for this query is unreliable")
        // queries are independent: any RDD still persisted (checkpoint
        // blocks from iterative operators) is leaked state that would
        // squeeze later queries' execution memory over a 100+-query run
        graft.core.Checkpoints.freeAllPersisted(spark)
        elapsed
      }

    val firstPass = selected.map { case (name, (fn, _)) =>
      val times = runReps(name, fn, "")
      val shuffle = (1 to reps).flatMap(r => metrics.get(s"$name#$r")).headOption
      (name, times, shuffle)
    }

    // BASELINE-relative outlier re-probe: best-of-N inside ONE loaded
    // window does not decorrelate from sustained host load (the round-5
    // lesson — all three reps inflated together). Any query whose
    // first-pass min exceeds 2× its committed quiet best gets a second
    // chance LATER in the process lifetime; the recorded min is over
    // all runs. Queries with no baseline (new this round) are skipped —
    // the quiet record catches up when it is re-committed.
    val baseline = quietBaseline()
    val reprobed = firstPass.map { case (name, times, shuffle) =>
      val needsReprobe = baseline.get(name).exists(q => times.min > 2 * q)
      val allTimes =
        if (!needsReprobe) times
        else times ++ runReps(name, Queries.queries(name), "re:")
      (name, allTimes, shuffle, needsReprobe)
    }
    val nReprobed = reprobed.count(_._4)

    val results = reprobed.map { case (name, times, shuffle, _) =>
      val sorted = times.sorted
      // true median: for even N average the two middles — the upper-middle
      // element alone would record a worse-than-median "typical" value
      val med =
        if (sorted.length % 2 == 1) sorted(sorted.length / 2)
        else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2
      (name, sorted.head, med, times, shuffle)
    }
    val total = results.map(_._2).sum
    val loadEnd = loadavg()

    // Full-precision per-query detail (all queries + shuffle bytes) goes to a
    // FILE: the harness that runs this main captures only a ~2000-char tail of
    // stdout, so the printed line must stay compact. Printing every query at
    // full double precision (~4.5 KB for 85 queries) made the line truncate
    // mid-JSON and parse as null in rounds 2-3.
    // "queries" stays the flat per-query number (now the best-of-N min)
    // for parser compatibility; medians and raw runs ride alongside.
    val qsFull = results.map { case (k, mn, _, _, _) => "\"" + k + "\":" + f"$mn%.3f" }
      .mkString("{", ",", "}")
    val qsMed = results.map { case (k, _, md, _, _) => "\"" + k + "\":" + f"$md%.3f" }
      .mkString("{", ",", "}")
    val qsRuns = results.map { case (k, _, _, ts, _) =>
      "\"" + k + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val shuffleMb = results.map { case (k, _, _, _, sh) =>
      val mb = sh.map(_.shuffleBytes / 1e6).getOrElse(-1.0) // -1 = unattributed, loud
      "\"" + k + "\":" + f"$mb%.1f"
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"cpus":$cpus,"reps":$reps,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"n_reprobed":$nReprobed,"queries":$qsFull,"queries_median":$qsMed,"queries_runs":$qsRuns,"shuffle_mb":$shuffleMb,"sf":"$sfDir"}""")

    // Compact single line: suite total + the slowest 40 queries at 2 decimals
    // (~1.3 KB — fits the tail window with margin even as the suite grows).
    // "queries_truncated" says EXPLICITLY that the map is a top-N slice:
    // in round 11 three false regressions (q_pagerank, q_fuzzy_join,
    // q_min_k_prob) were only clearable from the BENCH_DETAIL files
    // because nothing in this line said the slow tail was all it showed.
    val topN = 40
    val top = results.sortBy(-_._2).take(topN)
      .map { case (k, mn, _, _, _) => "\"" + k + "\":" + f"$mn%.2f" }
      .mkString("{", ",", "}")
    val truncated = results.size > topN
    println(s"""{"metric":"total","value":${f"$total%.2f"},"unit":"sec","n_queries":${results.size},"reps":$reps,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"n_reprobed":$nReprobed,"queries":$top,"queries_truncated":$truncated,"queries_shown":${math.min(topN, results.size)},"detail":"BENCH_DETAIL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
