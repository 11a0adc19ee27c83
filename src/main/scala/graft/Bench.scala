package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology:
  *  - Results are materialized through the `noop` sink, not `count()`
  *    — count() lets Catalyst prune the projected expressions away,
  *    which would "benchmark" a plan that computes nothing.
  *  - An untimed warm-up pass over every query at the smallest scale
  *    factor absorbs JVM/codegen/classloading costs that a long-lived
  *    cluster would not pay per query.
  *  - Each query is timed over `SPARK_GRAFT_BENCH_RUNS` runs (default
  *    3) and the MEDIAN is reported: this host exhibits rare
  *    multi-minute scheduler stalls (same plan, 100× wall time) that
  *    a median absorbs while still reporting honest steady-state
  *    cost. Runs are INTERLEAVED — pass 1 over all queries, then pass
  *    2, … — so one query's samples are minutes apart and a sustained
  *    stall window lands on different queries in each pass instead of
  *    swallowing all of one query's back-to-back runs. The JSON
  *    records runs + stat used.
  *  - A run that throws contributes no time (the median is over
  *    surviving runs); per-query failed-run counts appear under
  *    "failed_runs", and a query with zero surviving runs reports -1.
  *  - Queries whose median still exceeds 2× their own best sample get
  *    extra samples (bounded by one pass worth) — see the outlier
  *    re-sampling comment in main() for the rationale.
  */
object Bench {

  /** Hard budget for the printed stdout line: the driver keeps only
    * the last ~2000 chars of stdout, and sbt's trailing [success]
    * line eats ~75 (BENCH_r{1,2,4}.json all recorded "parsed": null
    * when the full-name line outgrew the window). 1850 leaves ~75 of
    * slack under the real ~1925 budget. */
  val MaxLineChars = 1850

  // Locale.ROOT: a comma-decimal default locale (de_DE, fr_FR…)
  // would render 8.496 as "8,496" and break the JSON parse the
  // compact line exists for. 10 ms resolution with trailing zeros
  // trimmed ("1.20"→"1.2", "3.00"→"3") — host noise is orders of
  // magnitude above 10 ms and BENCH_DETAIL.json keeps full precision.
  private def fmt(v: Double): String =
    if (v < 0) "-1"
    else {
      val t = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
        .reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      if (t.isEmpty) "0" else t // "0.00" trims to "" otherwise
    }

  private def jsonObj[A](pairs: Seq[(String, A)])(render: A => String): String =
    pairs.map { case (k, v) => "\"" + k + "\":" + render(v) }
      .mkString("{", ",", "}")

  /** Builds the one printed JSON line, guaranteed ≤ `maxChars`: query
    * keys are unique short id prefixes ("q01_pricing_summary" →
    * "q01"), and if the full per-query map still overflows the
    * budget, the CHEAPEST queries fold into `"other_n":K,
    * "other_sec":S` until the line fits (measured on the real string,
    * not an estimate). The heavy queries — the ones a bench reader
    * compares round-over-round — are always the last to fold, and
    * BENCH_DETAIL.json always carries the full map. */
  def compactLine(results: Seq[(String, Double)], total: Double,
      runs: Int, failedRuns: Seq[(String, Int)], resampledTotal: Int,
      sfDir: String, maxChars: Int = MaxLineChars,
      noisy: Seq[(String, (Double, Double))] = Nil,
      memoBuild: Seq[(String, Double)] = Nil): String = {
    def short(n: String): String = n.takeWhile(_ != '_')
    val ambiguous = results.map(_._1).groupBy(short).exists(_._2.size > 1)
    def key(n: String): String = if (ambiguous) n else short(n)
    // fold order: cheapest first (ties by name for determinism);
    // -1 failures never fold — a red must stay visible in the line
    val foldOrder = results.filter(_._2 >= 0).sortBy { case (n, v) => (v, n) }
    def build(nFold: Int): String = {
      val folded = foldOrder.take(nFold)
      val foldedSet = folded.map(_._1).toSet
      val kept = results.filterNot { case (n, _) => foldedSet(n) }
      val qs = jsonObj(kept.map { case (k, v) => key(k) -> v })(fmt)
      val extras = new StringBuilder
      if (nFold > 0)
        extras ++= s""","other_n":$nFold,"other_sec":${fmt(
            folded.map(_._2).sum)}"""
      if (failedRuns.nonEmpty)
        extras ++= ",\"failed_runs\":" + jsonObj(
          failedRuns.map { case (k, n) => key(k) -> n })(_.toString)
      if (resampledTotal > 0)
        extras ++= s""","resampled":$resampledTotal"""
      // per-query [min,max] spread for the queries whose samples
      // disagree most (capped upstream): the in-line evidence that a
      // median move is host noise (wide spread) vs a plan change
      if (noisy.nonEmpty)
        extras ++= ",\"spread\":" + jsonObj(noisy.map {
          case (k, mm) => key(k) -> mm
        }) { case (mn, mx) => s"[${fmt(mn)},${fmt(mx)}]" }
      // first-touch cost of each build-once memo frame under THIS
      // sfDir (round-14 verdict item 5): median-of-repeats correctly
      // excludes the cold build from steady-state numbers, but that
      // made cold-start cost visible only as a sample spread; here it
      // is an artifact. Memo frame names are already short.
      if (memoBuild.nonEmpty)
        extras ++= ",\"memo_build_sec\":" + jsonObj(memoBuild)(fmt)
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""queries":$qs,"runs":$runs,"stat":"median"$extras,""" +
        s""""sf":"$sfDir"}"""
    }
    // last resort, reached only under mass failure: -1 entries never
    // fold above, so a round with many reds can overflow even the
    // all-folded line. Collapse the reds and the failed_runs detail
    // into counts — the line must parse inside the driver tail window
    // (the parsed:null mode this builder exists to prevent) even when
    // everything is on fire; BENCH_DETAIL.json keeps the names.
    def buildCollapsed(): String = {
      val ok = results.filter(_._2 >= 0)
      val nRed = results.size - ok.size
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""queries":{},"other_n":${ok.size},"other_sec":${fmt(
            ok.map(_._2).sum)},"failed_n":$nRed,""" +
        s""""failed_run_total":${failedRuns.map(_._2).sum},""" +
        s""""runs":$runs,"stat":"median","sf":"$sfDir"}"""
    }
    (0 to foldOrder.size).iterator.map(build)
      .find(_.length <= maxChars)
      .getOrElse(buildCollapsed())
  }

  /** Canonicalize a plan line whose element ORDER is
    * allocation-dependent: RewriteDistinctAggregates groups the
    * distinct aggregates of a multi-countDistinct query in a HashMap
    * keyed by ExpressionSet, whose bucket order follows raw exprId
    * VALUES — stable in a fresh JVM, but in a long bench session the
    * global expression counter differs per run (noisy queries
    * resample → more expressions allocated), flipping which group
    * gets which `gid` and reordering the Expand projections, the
    * grouping Keys, and the per-gid FILTER functions (measured: q14's
    * fingerprint flipped in 1 of 3 same-code runs, breaking the
    * bench_merge fp-agreement gate). Every affected line carries the
    * `gid#` column, so: blank the gid literals, then sort the
    * top-level comma elements inside every bracket/paren group of
    * those lines — order inside a list is never the structural signal
    * the fingerprint exists to catch. */
  private[graft] def canonGidLine(line: String): String = {
    val blanked = line
      .replaceAll("gid# = \\d+", "gid# = _")
      // Expand projections' trailing gid value — scoped to the
      // list-of-lists structure (`, N], [` / `, N]]`), so a genuine
      // trailing integer constant elsewhere on a gid-carrying line
      // still flips the fingerprint (round-13 ADVICE)
      .replaceAll(", \\d+\\](?=(, \\[|\\]))", ", _]")
    def matching(s: String, open: Int): Int = {
      val (o, c) = (s.charAt(open),
        if (s.charAt(open) == '[') ']' else ')')
      var depth = 0
      var i = open
      while (i < s.length) {
        val ch = s.charAt(i)
        if (ch == o) depth += 1
        else if (ch == c) { depth -= 1; if (depth == 0) return i }
        else if (ch == '[' || ch == '(') depth += 1 // mixed nesting
        else if (ch == ']' || ch == ')') depth -= 1
        i += 1
      }
      -1
    }
    // rebuild, sorting each group's top-level comma elements. Every
    // walk runs over PAIRED strings of equal length: `m` (masked) is
    // what bracket pairing and the sort ORDER trust; `o` (original,
    // gid-blanked) supplies the EMITTED characters — so literal
    // content survives canonicalization intact. Round 15 emitted the
    // masked text itself, which collapsed two genuinely different
    // plans whose literals differ only in structural characters
    // (rlike '[ab]' vs '(ab)' both emitted as '_ab_') — the exact
    // false identity the round-13 bail-out existed to prevent
    // (round-15 ADVICE). Returns (canonMasked, canonOriginal); ties
    // on the masked sort key break by the original text, so the
    // output is still deterministic.
    def canonElem(m: String, o: String): (String, String) = {
      val sbM = new StringBuilder
      val sbO = new StringBuilder
      var i = 0
      while (i < m.length) {
        val ch = m.charAt(i)
        if (ch == '[' || ch == '(') {
          val close = matching(m, i)
          if (close < 0) {
            sbM.append(m.substring(i)); sbO.append(o.substring(i))
            i = m.length
          } else {
            val (cm, co) =
              canonSeg(m.substring(i + 1, close), o.substring(i + 1, close))
            val cl = if (ch == '[') ']' else ')'
            sbM.append(ch).append(cm).append(cl)
            sbO.append(o.charAt(i)).append(co).append(cl)
            i = close + 1
          }
        } else { sbM.append(ch); sbO.append(o.charAt(i)); i += 1 }
      }
      (sbM.result(), sbO.result())
    }
    def canonSeg(m: String, o: String): (String, String) = {
      val cuts = scala.collection.mutable.ArrayBuffer[Int]()
      var depth = 0
      var i = 0
      while (i < m.length) {
        val ch = m.charAt(i)
        if (ch == '[' || ch == '(') depth += 1
        else if (ch == ']' || ch == ')') depth -= 1
        else if (ch == ',' && depth == 0) cuts += i
        i += 1
      }
      val bounds = (Seq(-1) ++ cuts ++ Seq(m.length)).sliding(2).toSeq
      val parts = bounds.map { b =>
        // trim by m's whitespace — masking never touches whitespace,
        // so m and o share every whitespace position
        var s = b.head + 1
        var e = b.last
        while (s < e && m.charAt(s).isWhitespace) s += 1
        while (e > s && m.charAt(e - 1).isWhitespace) e -= 1
        canonElem(m.substring(s, e), o.substring(s, e))
      }
      val sorted = if (parts.size > 1) parts.sorted else parts
      (sorted.map(_._1).mkString(", "), sorted.map(_._2).mkString(", "))
    }
    // sorting trusts bracket pairing, and bracket chars may hide
    // inside string literals (e.g. a regexp pattern in a FILTER).
    // Round 13 bailed out of canonicalization for ANY quoted line —
    // which left the exprId-dependent reorder the function exists to
    // suppress live on every gid line embedding a string literal
    // (round-14 ADVICE). Instead, mask only the STRUCTURAL characters
    // inside quoted spans (brackets/commas → '_'), so the pairing
    // walk sees the real structure while literal content still
    // distinguishes plans; an unterminated quote or a line still
    // unbalanced after masking keeps the bail-out (two DIFFERENT
    // plans must never canonicalize to the same text).
    val masked = maskQuotedStructure(blanked)
    val unsortable = masked.isEmpty ||
      masked.count(_ == '[') != masked.count(_ == ']') ||
      masked.count(_ == '(') != masked.count(_ == ')')
    if (unsortable) blanked
    else try canonElem(masked, blanked)._2
    catch { case _: Throwable => blanked }
  }

  /** Replace brackets/parens/commas INSIDE quoted spans with '_',
    * honoring backslash escapes; returns "" when a quote never
    * terminates (the caller then skips sorting entirely). */
  private[graft] def maskQuotedStructure(s: String): String = {
    val sb = new StringBuilder(s.length)
    var q: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q == 0) {
        if (c == '"' || c == '\'') q = c
        sb.append(c)
      } else if (c == '\\' && i + 1 < s.length) {
        sb.append(c).append(
          if ("[](),".contains(s.charAt(i + 1))) '_' else s.charAt(i + 1))
        i += 1
      } else {
        if (c == q) q = 0
        sb.append(if ("[](),".contains(c)) '_' else c)
      }
      i += 1
    }
    if (q != 0) "" else sb.result()
  }

  /** Plan fingerprint: md5 of the formatted physical plan with the
    * volatile tokens stripped — stable across JVMs of the same code,
    * changed by any real plan-shape change. Recorded per query in the
    * detail file so a future bench can separate "same plan, slower
    * host" from "plan regressed" without re-reading source.
    * Volatile tokens (all proven run-varying): expr ids `#123`,
    * exchange markers `[id=#n]`, `[plan_id=n]` (a GLOBAL JVM counter
    * that AQE's racy stage re-planning advances nondeterministically —
    * unnormalized it made every fingerprint unique per run and the
    * drift check vacuously green, the round-12 finding), RDD ids in
    * checkpoint scans, the data path, and the element order of
    * `gid#`-carrying distinct-aggregate lines ([[canonGidLine]]). */
  def planFp(spark: SparkSession, name: String, sfDir: String): String =
    try {
      val p = SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
        .replaceAll("#\\d+L?", "#")
        .replaceAll("\\[id=#?\\d+\\]", "")
        .replaceAll("\\[plan_id=\\d+\\]", "")
        .replaceAll("RDD\\[\\d+\\]", "RDD")
        .replaceAll("RDD at [A-Za-z.]+:\\d+", "RDD")
        // checkpoint-scan RDD callsites carry a SOURCE LINE NUMBER
        // ("MapPartitionsRDD at localCheckpoint at Dedup.scala:868"):
        // un-normalized, ANY edit that shifts lines in an operator
        // file flips the fingerprint of every memo-scan plan built
        // from it — a round-14 finding (t36/t37/x33 flipped on a
        // TextAnalysis edit nowhere near their code)
        .replaceAll("at [A-Za-z0-9_$.]+\\.scala:\\d+", "at <src>")
        // a checkpoint scan's outputPartitioning prints the RDD's
        // PARTITION COUNT (UnknownPartitioning(N)) — a runtime
        // artifact: AQE coalescing and input timing pick how many
        // partitions the checkpointed frame materialized with, so the
        // same code can print 0, 1, or 4 across sessions (round-15
        // finding: i14's radix checkpoints split the sf1 bench
        // repeats' fingerprints and bench_merge refused the merge).
        // Shuffle widths stay significant — hashpartitioning(col, 32)
        // is untouched; only the Unknown form is runtime-derived.
        .replaceAll("UnknownPartitioning\\(\\d+\\)",
          "UnknownPartitioning(_)")
        // JVM-assigned lambda identities in MapPartitions/object nodes
        // (the multimodal codec boundary): Foo$$Lambda$1397/0x7f...
        .replaceAll("\\$\\$Lambda[$/0-9a-fx@.]*", "\\$\\$Lambda")
        .replaceAll(java.util.regex.Pattern.quote(sfDir), "<sf>")
        .linesIterator
        .map {
          // canonicalize only in distinct-aggregate context — the
          // nodes RewriteDistinctAggregates actually reorders (Expand
          // projections, HashAggregate keys/functions, the gid-keyed
          // Exchange) plus explicit `gid# = N` filters — so a future
          // USER column named gid can't get unrelated lines order-
          // normalized (round-13 ADVICE). Node context = the last
          // formatted-detail header seen.
          var node = ""
          val hdr = raw"^\((\d+)\) (\w+)".r
          val gidNodes = Set("Expand", "HashAggregate", "Exchange")
          l: String => {
            hdr.findFirstMatchIn(l).foreach(m => node = m.group(2))
            if (l.contains("gid#") &&
                (l.contains("gid# = ") || gidNodes(node))) canonGidLine(l)
            else l
          }
        }
        .mkString("\n")
      // SPARK_GRAFT_FP_DUMP=<dir>: write the NORMALIZED plan text per
      // query, so a cross-run fingerprint flip can be diffed to its
      // varying token instead of reverse-engineered from two hashes
      // (dev-only; the driver never sets it)
      sys.env.get("SPARK_GRAFT_FP_DUMP").foreach { d =>
        new java.io.File(d).mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$d/$name.txt"), p.getBytes("UTF-8"))
      }
      java.security.MessageDigest.getInstance("MD5").digest(
        p.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    } catch { case _: Throwable => "err" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // default 300s: a single host stall inside a broadcast build would
      // otherwise surface as a timeout-exception whose wall time is
      // indistinguishable from real query cost
      .config("spark.sql.broadcastTimeout", "3600")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String, dir: String = sfDir): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    // Warm-up at the smallest available sibling scale factor of the
    // configured data root (falls back to the root itself), so a
    // non-default SPARK_GRAFT_SF_DIR still gets a real warm-up.
    val warmDir = {
      val siblings = Option(new java.io.File(sfDir).getParentFile)
        .flatMap(p => Option(p.listFiles())).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.matches("sf[0-9.]+"))
        .flatMap(f => f.getName.drop(2).toDoubleOption.map(_ -> f))
      if (siblings.nonEmpty) siblings.minBy(_._1)._2.toString else sfDir
    }
    // Optional comma-separated subset for local debugging runs; the
    // driver never sets it, so driver benches always cover everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    System.err.println(s"[bench] warm-up dir: $warmDir")
    names.foreach { name =>
      try materialize(name, warmDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
    }
    spark.catalog.clearCache()
    // Storage-memory accounting: several operators persist() shared
    // frames for the duration of the query (norms, band tables, kNN
    // graphs — documented clearCache lifetimes). This measures what
    // that costs instead of assuming it: cached bytes still resident
    // when the query finishes, max over runs, recorded per query in
    // BENCH_DETAIL.json ("storage_mb") so a frame that would not fit
    // executor storage at the target scale is a number, not a guess.
    @annotation.nowarn("cat=deprecation")
    def storageBytes(): Long =
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
    val storagePeak = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to runs; name <- names) {
      val t0 = System.nanoTime()
      val ok =
        try { materialize(name); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // elapsed captured BEFORE the cache drop: unpersisting the
      // operator's signature tables is inter-query hygiene, not part
      // of the measured query
      val dt = (System.nanoTime() - t0) / 1e9
      storagePeak(name) = math.max(storagePeak(name), storageBytes())
      spark.catalog.clearCache()
      if (ok) samples(name) = dt :: samples(name)
    }
    def median(ts: List[Double]): Double = ts.sorted.apply(ts.size / 2)

    // Outlier re-sampling: interleaving spreads one query's samples
    // minutes apart, but a host-stall window can still land on the
    // same query in 2 of 3 passes, leaving a median 10-50× its true
    // cost (observed: identical code measured 3.9s locally vs 59s in a
    // stalled driver run). When a query's median exceeds twice its own
    // best sample (+1s absolute floor so micro-queries don't thrash),
    // the fast sample proves the plan is cheap and the median is
    // stall-contaminated — collect extra samples until the median is
    // consistent or the extra budget (one full pass worth) runs out.
    // The median over ALL collected samples is reported; the printed
    // line carries only the total resample count (to stay inside the
    // driver's stdout tail window), per-query counts go to
    // BENCH_DETAIL.json.
    var extraBudget = names.size
    var resampled = Map.empty[String, Int].withDefaultValue(0)
    var rounds = 0
    var outliers = Seq.empty[String]
    def findOutliers(): Seq[String] = names.filter { n =>
      val ts = samples(n)
      ts.nonEmpty && median(ts) > math.max(2 * ts.min, ts.min + 1.0)
    }
    while ({ outliers = findOutliers(); outliers.nonEmpty && extraBudget > 0 && rounds < 4 }) {
      rounds += 1
      for (name <- outliers if extraBudget > 0) {
        extraBudget -= 1
        val t0 = System.nanoTime()
        val ok =
          try { materialize(name); true }
          catch { case e: Throwable =>
            // log like the other two failure paths — a silent resample
            // failure would burn the shared budget invisibly and leave
            // the stall-contaminated median it was meant to repair
            System.err.println(s"[bench] resample $name failed: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        storagePeak(name) = math.max(storagePeak(name), storageBytes())
        spark.catalog.clearCache()
        if (ok) {
          samples(name) = dt :: samples(name)
          resampled += name -> (resampled(name) + 1)
        }
      }
    }

    var failedRuns = Map.empty[String, Int]
    val results = names.map { name =>
      val times = samples(name)
      val nFailed = runs - math.min(runs, times.size - resampled(name))
      if (nFailed > 0) failedRuns += name -> nFailed
      if (times.isEmpty) name -> -1.0
      else name -> median(times)
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    // Per-query sample spread [min, max] — the executable attribution
    // for round-over-round drift: a median that moved with a wide
    // spread (and an unchanged plan fingerprint, below) is host
    // variance; a tight spread at a new level is a real change. Full
    // map goes to the detail file; the printed line carries only the
    // widest few (max/min > 1.5 with a 1s absolute floor, capped at 8
    // so the line always fits).
    val spread = names.flatMap { n =>
      val ts = samples(n)
      if (ts.isEmpty) None else Some(n -> (ts.min, ts.max))
    }
    val noisy = spread
      .filter { case (_, (mn, mx)) => mx > 1.5 * mn && mx - mn > 1.0 }
      .sortBy { case (_, (mn, mx)) => -(mx - mn) }
      .take(8)
    def planFp(name: String): String = Bench.planFp(spark, name, sfDir)

    // The driver keeps only the last ~2000 chars of stdout and parses
    // the JSON line out of that window (BENCH_r{1,2,4}.json all show
    // "parsed": null because the full-name line outgrew it). So the
    // printed line uses the short id prefix of each query name
    // ("q01_pricing_summary" → "q01" — prefixes are unique by
    // construction) and 3-decimal seconds; the full-name, full-
    // precision record goes to BENCH_DETAIL.json next to the build.
    val memoBuild = graft.operators.Memos.buildSecFor(sfDir)
      .toSeq.sortBy(_._1)
    val line = compactLine(results, total, runs,
      failedRuns.toSeq.sortBy(_._1), resampled.values.sum, sfDir,
      noisy = noisy, memoBuild = memoBuild)
    try {
      val detail = jsonObj(results)(_.toString)
      val errDetail = jsonObj(failedRuns.toSeq.sortBy(_._1))(_.toString)
      val resDetail = jsonObj(resampled.toSeq.sortBy(_._1))(_.toString)
      // peak cached bytes per query, MB at 0.1 precision; zero-holding
      // queries are omitted to keep the record readable
      val stoDetail = jsonObj(storagePeak.toSeq.filter(_._2 > 0)
        .sortBy(_._1).map { case (n, b) =>
          n -> (math.round(b / 104857.6) / 10.0) })(_.toString)
      val spreadDetail = jsonObj(spread) { case (mn, mx) => s"[$mn,$mx]" }
      val fpDetail = jsonObj(names.map(n => n -> planFp(n)))("\"" + _ + "\"")
      val memoDetail = jsonObj(memoBuild)(_.toString)
      val detailLine =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$detail,"runs":$runs,"stat":"median","failed_runs":$errDetail,"resampled":$resDetail,"storage_mb":$stoDetail,"spread":$spreadDetail,"memo_build_sec":$memoDetail,"plan_fp":$fpDetail,"sf":"$sfDir"}"""
      // Scale runs write to their OWN artifact (SPARK_GRAFT_BENCH_DETAIL
      // = e.g. BENCH_SF1.json) so the default sf0.1 driver run can't
      // overwrite the sf1 evidence a doc cites — the round-9 finding.
      val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
        "BENCH_DETAIL.json")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(detailPath),
        (detailLine + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
