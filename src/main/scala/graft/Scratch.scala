package graft

import org.apache.spark.sql.functions._

/** Stage-level profiler for the heavy queries (dev tool; not part of
  * the driver contract). `SPARK_GRAFT_CC_DEBUG=1` also prints the
  * connected-components round counts. Pass a second arg "cluster" for
  * the dedup_cluster stage breakdown.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Graft.session()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s  -> $r")
      r
    }
    if (args.lift(1).contains("curation")) {
      // per-gate stage breakdown of curation_report (each gate frame is
      // what Pipeline.curateGates pins; the report joins them on doc_id).
      // Gates run through the noop sink, NOT count(): a bare count lets
      // Spark prune the projection-only scoring expressions the gate
      // exists to measure (the same trap Bench documents)
      // by-name: frame CONSTRUCTION is part of the stage (the dedup
      // chain runs its statistics actions and eager pins there)
      def run(label: String)(df: => org.apache.spark.sql.DataFrame): Unit =
        time(label)(df.write.format("noop").mode("overwrite").save())
      time("warm scan")(graft.core.Tables.documents(spark, dir).count())
      run("gate quality")(graft.text.TextOps.qualityScore(spark, dir))
      run("gate repetition")(graft.curate.Curate.repetitionStats(spark, dir))
      run("gate rarity")(graft.text.Relevance.rarityScore(spark, dir))
      run("gate lm")(graft.text.Relevance.lmScore(spark, dir))
      run("gate dedup_cluster")(graft.dedup.Dedup.dedupCluster(spark, dir))
      run("gate decontaminate")(graft.curate.Curate.decontaminate(spark, dir))
      run("composed report")(graft.Pipeline.curationReport(spark, dir))
    } else if (args.lift(1).contains("cluster")) {
      time("warm q1")(graft.core.Tables.lineitem(spark, dir).count())
      val pairs = graft.dedup.Dedup.dedupMinhash(spark, dir)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")).persist()
      time("verified pairs")(pairs.count())
      val forest = graft.dedup.Components.localForest(pairs).persist()
      time("localForest")(forest.count())
      val labels = time("minLabels build")(graft.dedup.Components.minLabels(pairs))
      time("labels count")(labels.count())
      val clustered = graft.core.Tables.documents(spark, dir).select("doc_id")
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("cluster"))
      val sizes = clustered.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      time("final join")(clustered.join(sizes, "cluster").count())
    } else if (args.lift(1).contains("floor")) {
      // decomposition of the sub-second tail's per-entry fixed cost:
      // frame construction (scala + any construction-time jobs),
      // catalyst planning (executedPlan force), and execution (noop).
      val names = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
        "dim_enrich", "orphan_requeue", "topk_per_group", "q5_join",
        "sync_status_rollup", "token_freq", "mm_meta", "length_histogram"))
      (1 to 3).foreach { round =>
        names.foreach { n =>
          val fn = graft.SparkEntry.queries(n)
          val t0 = System.nanoTime()
          val df = fn(spark, dir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan
          val t2 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t3 = System.nanoTime()
          println(f"[floor] r$round $n%-22s construct ${(t1 - t0) / 1e3}%8.0f us  plan ${(t2 - t1) / 1e3}%8.0f us  exec ${(t3 - t2) / 1e3}%8.0f us")
        }
      }
    } else if (args.lift(1).contains("readcost")) {
      // what one Tables.read costs warm: listing + footer schema
      // inference + normalize analysis, driver-side
      (1 to 3).foreach { r =>
        Seq("lineitem", "documents", "events", "customer").foreach { t =>
          val t0 = System.nanoTime()
          (1 to 10).foreach { _ =>
            val df = t match {
              case "lineitem" => graft.core.Tables.lineitem(spark, dir)
              case "documents" => graft.core.Tables.documents(spark, dir)
              case "events" => graft.core.Tables.events(spark, dir)
              case _ => graft.core.Tables.customer(spark, dir)
            }
            df.schema // force analysis
          }
          println(f"[readcost] r$r $t%-10s ${(System.nanoTime() - t0) / 1e7}%8.1f ms/read")
        }
      }
    } else if (args.lift(1).contains("pairmass")) {
      // decomposition of the dedup verify floor: how many pairs the
      // within-component grid walks, and how many a cheap exact
      // prefilter (size compatibility / shared band bucket) admits
      import graft.core.Materialize.MatOps
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.register(spark)
      val docs = graft.core.Tables.documents(spark, dir)
      val groups = docs.select(col("doc_id"),
          array_sort(expr("transform(array_distinct(split(text, ' ')), t -> xxhash64(t))")).as("s"))
        .groupBy("s").agg(min(col("doc_id")).as("rep"))
        .materializeOnce(eager = true)
      val sorted = groups.select(col("rep").as("doc_id"), col("s"))
      println("[pairmass] n reps = " + sorted.count())
      val banded = sorted.select(col("doc_id"),
          explode(call_function("minhash_band_buckets", col("s"), lit(64))).as("bucket"))
        .materializeOnce(eager = true)
      val edges = banded
        .withColumn("root", min(col("doc_id")).over(Window.partitionBy("bucket")))
        .filter(col("doc_id") =!= col("root"))
        .select(col("doc_id").as("src"), col("root").as("dst"))
      val labels = graft.dedup.Components.minLabels(edges).materializeOnce(eager = true)
      val hist = labels.groupBy("lbl").agg(count(lit(1)).as("m")).materializeOnce(eager = true)
      println("[pairmass] top components:")
      hist.orderBy(desc("m")).limit(10).collect().foreach(r => println("  m=" + r))
      println("[pairmass] sum C(m,2) = " +
        hist.agg(sum(expr("m * (m - 1) / 2"))).first())
      // size-compatible pair mass within components, via per-(comp, size)
      // histograms (distinct sizes are few hundred, so the self-join is tiny)
      val szh = sorted.select(col("doc_id"), size(col("s")).as("sz"))
        .join(labels, "doc_id")
        .groupBy("lbl", "sz").agg(count(lit(1)).as("c"))
        .materializeOnce(eager = true)
      val compat = szh.as("x").join(szh.as("y"),
          col("x.lbl") === col("y.lbl") && col("x.sz") <= col("y.sz") &&
            col("y.sz") <= lit(2) * col("x.sz"))
        .select(when(col("x.sz") === col("y.sz"),
            expr("x.c * (x.c - 1) / 2")).otherwise(expr("x.c * y.c")).as("p"))
        .agg(sum(col("p"))).first()
      println("[pairmass] size-compatible pairs = " + compat)
      // distinct bucket-sharing (direct-candidate) pairs at rep grain:
      // per-bucket pairs deduped — the exact set the walk must see
      val direct = banded.as("a").join(banded.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("pa"), col("b.doc_id").as("pb"))
        .distinct().count()
      println("[pairmass] distinct bucket-sharing pairs = " + direct)
      // verified true rep pairs (the merge-walk survivors)
      val truePairs = graft.dedup.Dedup.minhashVerifiedPairs(
          docs.select(col("doc_id"),
            expr("transform(array_distinct(split(text, ' ')), t -> xxhash64(t))").as("s")))
        .count()
      println("[pairmass] verified doc pairs = " + truePairs)
    } else {
      time("warm q1")(graft.core.Tables.lineitem(spark, dir).count())
      time("dedup_minhash")(graft.dedup.Dedup.dedupMinhash(spark, dir).count())
      time("ngram_jaccard")(graft.dedup.Dedup.ngramJaccard(spark, dir).count())
      time("dedup_cluster")(graft.dedup.Dedup.dedupCluster(spark, dir).count())
      time("dedup_embedding")(graft.dedup.Dedup.dedupEmbedding(spark, dir).count())
      time("ann_lsh")(graft.sim.Similarity.annLsh(spark, dir).count())
      time("ann_ivf")(graft.sim.Similarity.annIvf(spark, dir).count())
      time("simhash_fp")(graft.dedup.Dedup.simhashFp(spark, dir).count())
      time("search_doc")(graft.index.Indexing.searchDoc(spark, dir).count())
    }
    spark.stop()
  }
}
