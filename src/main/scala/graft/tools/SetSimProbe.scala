package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Stage-by-stage timing of SetSimJoin.jaccardJoin at sf0.1 (5000 docs,
  * ~2.97M true pairs at τ=0.8 — the corpus is duplicate-dense, so the
  * exact join is OUTPUT-BOUND). Feeds PERF.md's d24 row.
  */
object SetSimProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SETSIM $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    val docs = Tables.documents(spark, d).withColumn("w", split(col("text"), " "))

    // ===== `var` mode (round 10): the d24 VARIANCE probe — the same
    // jaccardJoin swings 13–20 s at sf0.1 with no code change. The
    // A/B discriminates the cache-pinning hypothesis: the GATE uses
    // the handle-free overload, whose interning cache stays pinned
    // until the plan is GC'd (nondeterministic), so successive runs in
    // one session (a bench pass) inherit whatever storage the
    // ContextCleaner has or hasn't reclaimed. Interleaved series:
    // `pinned` = the gate shape; `released` = releasable handle run
    // after the count. Per run: wall, GC-time delta, heap before/
    // after, cached-RDD count going in.
    if (args.contains("var")) {
      import scala.jdk.CollectionConverters._
      val iters = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(8)
      val gcBeans = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala
      def gcMs = gcBeans.map(_.getCollectionTime).sum
      def heapGb = java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage.getUsed / 1e9
      for (i <- 1 to iters; mode <- Seq("pinned", "released")) {
        if (args.contains("gc")) { System.gc(); Thread.sleep(3000) }
        val cached0 = spark.sparkContext.getPersistentRDDs.size
        val (gc0, h0, t0) = (gcMs, heapGb, System.nanoTime())
        val n = mode match {
          case "pinned" => graft.operators.SetSimJoin
            .jaccardJoin(docs, "doc_id", col("w"), 4, 5).count()
          case _ =>
            val (df, rel) = graft.operators.SetSimJoin
              .jaccardJoinReleasable(docs, "doc_id", col("w"), 4, 5)
            try df.count() finally rel()
        }
        println(f"SETSIMVAR i=$i%2d mode=$mode%-8s " +
          f"t=${(System.nanoTime() - t0) / 1e9}%6.2fs " +
          f"gc=${gcMs - gc0}%6dms heap=$h0%5.1f->$heapGb%5.1fGB " +
          f"cachedRDDs=$cached0%3d pairs=$n%d")
      }
      spark.stop()
      return
    }

    // ===== `zipf` mode (round 10, d30): the containment b-side bound
    // on the documents' word-TRIGRAM sets — the realistic long-tailed
    // vocabulary, where the claimed real-world win ("ids absent from
    // every probe prefix drop out entirely via the minNa semi-join")
    // is measurable rather than asserted. Prints posting/candidate
    // counts with and without the bound → the PERF.md pruning row.
    if (args.contains("zipf")) {
      graft.GraftExtensions.registerNative(spark)
      val d3 = docs.withColumn("sh", expr("array_distinct(word_ngrams(w, 3))"))
      val base3 = d3.select(col("doc_id").cast("long").as("id"),
          col("sh").as("ts")).where(size(col("ts")) > 0)
      val freq3 = base3.select(explode(col("ts")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("df"))
      t("zipf-vocab") { freq3.count() }
      import org.apache.spark.sql.expressions.Window
      val tid3 = freq3.select(col("tok"),
        row_number().over(Window.orderBy(col("df"), col("tok"))).as("tid"))
      val bI = base3.select(col("id"), explode(col("ts")).as("tok"))
        .join(tid3, "tok")
        .groupBy("id")
        .agg(sort_array(collect_list(col("tid"))).as("its"),
          count(lit(1)).cast("int").as("n"))
        .persist()
      t("zipf-docs") { bI.count() }
      val (cn, cd) = (19, 20)
      val pl = (col("n") - (col("n") * cn + cd - 1)
        .divide(cd).cast("int") + 1)
      val aZ = bI.select(col("id"), col("n"),
          posexplode(slice(col("its"), lit(1), pl)).as(Seq("p0", "tid")))
        .select(col("id").as("ia"), col("n").as("na"),
          (col("p0") + 1).as("pa"), col("tid"))
      val bZ = bI.select(col("id"), col("n"),
          posexplode(col("its")).as(Seq("p0", "tid")))
        .select(col("id").as("ib"), col("n").as("nb"),
          (col("p0") + 1).as("pb"), col("tid"))
      t("zipf-b-postings") { bZ.count() }
      val mnA = aZ.groupBy("tid").agg(min(col("na")).as("min_na"))
      t("zipf-prefix-vocab") { mnA.count() }
      val bZp = bZ.join(mnA, "tid")
        .where(col("nb") - col("pb") + 1 >=
          (col("min_na") * cn + cd - 1).divide(cd).cast("int"))
        .drop("min_na")
      t("zipf-b-pruned") { bZp.count() }
      def cands(bs: org.apache.spark.sql.DataFrame) =
        aZ.join(bs, "tid").where(col("ia") =!= col("ib"))
      t("zipf-raw-unbounded") { cands(bZ).count() }
      t("zipf-raw-bounded") { cands(bZp).count() }
      t("zipf-end-to-end") {
        graft.operators.SetSimJoin.containmentJoin(
          d3, "doc_id", col("sh"), cn, cd).count()
      }
      bI.unpersist()
      spark.stop()
      return
    }

    val base = docs
      .select(col("doc_id").cast("long").as("id"),
        array_distinct(col("w")).as("ts"))
      .where(size(col("ts")) > 0)
    t("base") { base.count() }
    val freq = base.select(explode(col("ts")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    t("freq") { freq.count() }
    val ordered = base.select(col("id"), explode(col("ts")).as("tok"))
      .join(freq, "tok")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ft"))
      .select(col("id"),
        expr("transform(ft, x -> x.tok)").as("ots"),
        size(col("ft")).as("n"))
    t("ordered") { ordered.count() }
    val (tauNum, tauDen) = (4, 5)
    val prefLen = (col("n") - (col("n") * tauNum + tauDen - 1)
      .divide(tauDen).cast("int") + 1)
    val prefixes = ordered
      .select(col("id"), col("n"),
        explode(slice(col("ots"), lit(1), prefLen)).as("tok"))
    t("prefix-rows") { prefixes.count() }
    val a = prefixes.select(col("id").as("ia"), col("n").as("na"), col("tok"))
    val b = prefixes.select(col("id").as("ib"), col("n").as("nb"), col("tok"))
    val raw = a.join(b, "tok").where(col("ia") < col("ib"))
    t("raw-cands") { raw.count() }
    val lenOk = raw.where(least(col("na"), col("nb")) * tauDen >=
      greatest(col("na"), col("nb")) * tauNum)
    t("len-filtered") { lenOk.count() }
    val candidates = lenOk.select("ia", "ib").distinct()
    t("cands-distinct") { candidates.count() }
    val ta = base.select(col("id").as("ia"), col("ts").as("tsa"))
    val tb = base.select(col("id").as("ib"), col("ts").as("tsb"))
    val verified = candidates.join(ta, "ia").join(tb, "ib")
      .select(col("ia"), col("ib"),
        size(array_intersect(col("tsa"), col("tsb"))).cast("long").as("inter_sz"),
        (size(col("tsa")) + size(col("tsb"))).cast("long").as("nsum"))
      .select(col("ia"), col("ib"), col("inter_sz"),
        (col("nsum") - col("inter_sz")).as("union_sz"))
      .where(col("inter_sz") * tauDen >= col("union_sz") * tauNum)
    t("verified") { verified.count() }
    println("verify join plan: " + verified.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
      .mkString(" | "))
    // variant A: explicit broadcast of the array sides in the verify
    val verifiedB = candidates.join(broadcast(ta), "ia").join(broadcast(tb), "ib")
      .select(col("ia"), col("ib"),
        size(array_intersect(col("tsa"), col("tsb"))).cast("long").as("inter_sz"),
        (size(col("tsa")) + size(col("tsb"))).cast("long").as("nsum"))
      .select(col("ia"), col("ib"), col("inter_sz"),
        (col("nsum") - col("inter_sz")).as("union_sz"))
      .where(col("inter_sz") * tauDen >= col("union_sz") * tauNum)
    t("verified-bcast") { verifiedB.count() }
    // variant B: PPJoin positional filter — carry 1-based prefix
    // positions; overlap ≤ min(na-pa, nb-pb)+1 must reach
    // α = ceil(tauNum(na+nb)/(tauNum+tauDen))
    val prefPos = ordered
      .select(col("id"), col("n"),
        posexplode(slice(col("ots"), lit(1), prefLen)).as(Seq("p0", "tok")))
      .withColumn("p", col("p0") + 1).drop("p0")
    val pa = prefPos.select(col("id").as("ia"), col("n").as("na"),
      col("p").as("pa"), col("tok"))
    val pb = prefPos.select(col("id").as("ib"), col("n").as("nb"),
      col("p").as("pb"), col("tok"))
    val alpha = ((col("na") + col("nb")) * tauNum + (tauNum + tauDen) - 1)
      .divide(tauNum + tauDen).cast("int")
    val posCands = pa.join(pb, "tok").where(col("ia") < col("ib"))
      .where(least(col("na"), col("nb")) * tauDen >=
        greatest(col("na"), col("nb")) * tauNum)
      .where(least(col("na") - col("pa"), col("nb") - col("pb")) + 1 >= alpha)
    t("pos-cands") { posCands.count() }
    val posDistinct = posCands.select("ia", "ib").distinct()
    t("pos-distinct") { posDistinct.count() }
    val verifiedC = posDistinct.join(broadcast(ta), "ia").join(broadcast(tb), "ib")
      .select(col("ia"), col("ib"),
        size(array_intersect(col("tsa"), col("tsb"))).cast("long").as("inter_sz"),
        (size(col("tsa")) + size(col("tsb"))).cast("long").as("nsum"))
      .select(col("ia"), col("ib"), col("inter_sz"),
        (col("nsum") - col("inter_sz")).as("union_sz"))
      .where(col("inter_sz") * tauDen >= col("union_sz") * tauNum)
    t("verified-pos") { verifiedC.count() }
    // variant D: tokens interned to frequency-ranked INT ids — the
    // ordered token array becomes a sorted int array, prefix join keys
    // are ints, and the verify intersects primitive int arrays
    import org.apache.spark.sql.expressions.Window
    val tokIds = freq.select(col("tok"),
      row_number().over(Window.orderBy(col("df"), col("tok"))).as("tid"))
    val baseI = base.select(col("id"), explode(col("ts")).as("tok"))
      .join(tokIds, "tok")
      .groupBy("id")
      .agg(sort_array(collect_list(col("tid"))).as("its"),
        count(lit(1)).cast("int").as("n"))
    t("baseI") { baseI.count() }
    val prefI = baseI
      .select(col("id"), col("n"),
        posexplode(slice(col("its"), lit(1), prefLen)).as(Seq("p0", "tid")))
      .withColumn("p", col("p0") + 1).drop("p0")
    val ia2 = prefI.select(col("id").as("ia"), col("n").as("na"),
      col("p").as("pa"), col("tid"))
    val ib2 = prefI.select(col("id").as("ib"), col("n").as("nb"),
      col("p").as("pb"), col("tid"))
    val candsI = ia2.join(ib2, "tid").where(col("ia") < col("ib"))
      .where(least(col("na"), col("nb")) * tauDen >=
        greatest(col("na"), col("nb")) * tauNum)
      .where(least(col("na") - col("pa"), col("nb") - col("pb")) + 1 >= alpha)
      .select("ia", "ib").distinct()
    t("candsI") { candsI.count() }
    val taI = baseI.select(col("id").as("ia"), col("its").as("tsa"))
    val tbI = baseI.select(col("id").as("ib"), col("its").as("tsb"))
    val verifiedI = candsI.join(broadcast(taI), "ia").join(broadcast(tbI), "ib")
      .select(col("ia"), col("ib"),
        size(array_intersect(col("tsa"), col("tsb"))).cast("long").as("inter_sz"),
        (size(col("tsa")) + size(col("tsb"))).cast("long").as("nsum"))
      .select(col("ia"), col("ib"), col("inter_sz"),
        (col("nsum") - col("inter_sz")).as("union_sz"))
      .where(col("inter_sz") * tauDen >= col("union_sz") * tauNum)
    t("verified-int") { verifiedI.count() }
    t("end-to-end") {
      graft.operators.SetSimJoin.jaccardJoin(docs, "doc_id", col("w"), 4, 5).count()
    }

    // ===== containment (d27) — b-side candidate bound (round 9) =====
    // b joins on ALL its token ids (no safe b-prefix exists), so hot
    // ids form the largest buckets. The bound drops b postings that
    // cannot reach ceil(tau*minNa(tid)) overlap for ANY probe whose
    // prefix contains tid — measured here as posting rows and raw
    // candidate rows, with and without the bound.
    val (cn, cd) = (19, 20) // containment tau
    val prefLenC = (col("n") - (col("n") * cn + cd - 1)
      .divide(cd).cast("int") + 1)
    val aC = baseI
      .select(col("id"), col("n"),
        posexplode(slice(col("its"), lit(1), prefLenC)).as(Seq("p0", "tid")))
      .select(col("id").as("ia"), col("n").as("na"),
        (col("p0") + 1).as("pa"), col("tid"))
    val bC = baseI
      .select(col("id"), col("n"),
        posexplode(col("its")).as(Seq("p0", "tid")))
      .select(col("id").as("ib"), col("n").as("nb"),
        (col("p0") + 1).as("pb"), col("tid"))
    t("cont-b-postings") { bC.count() }
    val minNa = aC.groupBy("tid").agg(min(col("na")).as("min_na"))
    val bPruned = bC.join(minNa, "tid")
      .where(col("nb") - col("pb") + 1 >=
        (col("min_na") * cn + cd - 1).divide(cd).cast("int"))
      .drop("min_na")
    t("cont-b-pruned") { bPruned.count() }
    val alphaC = (col("na") * cn + cd - 1).divide(cd).cast("int")
    def contCands(bSide: org.apache.spark.sql.DataFrame) =
      aC.join(bSide, "tid")
        .where(col("ia") =!= col("ib"))
        .where(col("nb") * cd >= col("na") * cn)
        .where(least(col("na") - col("pa"), col("nb") - col("pb")) + 1 >= alphaC)
    t("cont-raw-unbounded") { aC.join(bC, "tid").where(col("ia") =!= col("ib")).count() }
    t("cont-raw-bounded") { aC.join(bPruned, "tid").where(col("ia") =!= col("ib")).count() }
    t("cont-cands-unbounded") { contCands(bC).count() }
    t("cont-cands-bounded") { contCands(bPruned).count() }
    t("cont-end-to-end") {
      graft.operators.SetSimJoin.containmentJoin(docs, "doc_id", col("w"), cn, cd).count()
    }
    spark.stop()
  }
}
