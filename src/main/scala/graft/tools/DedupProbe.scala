package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.pipeline.{Dedup, Similarity}
import graft.sources.TableIO

/** r14 A/B for the signature-frame caches (guide §1.2 — the band/signature/bucket
  * frame feeds BOTH sides of a candidate self-join whose below-exchange renames defeat
  * ReuseExchange, so the expensive map kernel ran twice per call): interleaved
  * nocache/cache pairs in one JVM, result-equality check after.
  * `sbt "runMain graft.tools.DedupProbe <sfDir> [reps] [minhash|simhash|emblsh]"` */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val mode = if (args.length > 2) args(2) else "minhash"
    val spark = GraftSession.get("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def time1(tag: String, r: Int, f: () => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f().collect().length
      println(f"[ddprobe] $tag rep$r ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
      clear()
    }

    // --- no-cache twins (the pre-r14 plans, inlined) ---
    def minhashNoCache(): DataFrame = {
      val g = Dedup.gramHashSets(TableIO.documents(spark, dir)).cache()
      Dedup.minhashPairsFrom(g, Dedup.lshBands(Dedup.minhashSignatures(g)), 0.8)
        .orderBy(col("a_id"), col("b_id"))
    }
    def simhashNoCache(): DataFrame = {
      val sh = Dedup.simhashes(TableIO.documents(spark, dir))
      val widths = Seq.tabulate(8)(_ => 8)
      val offsets = widths.scanLeft(0)(_ + _)
      val blocks = (0 until 8).map { k =>
        val mask = (1L << 8) - 1L
        struct(lit(k).as("blk"),
          shiftright(col("simhash"), offsets(k)).bitwiseAND(lit(mask)).as("bv"))
      }
      val banded = sh.select(col("doc_id"), col("simhash"), explode(array(blocks: _*)).as("e"))
        .select(col("doc_id"), col("simhash"), col("e.blk").as("blk"), col("e.bv").as("bv"))
      val x = banded.select(col("doc_id").as("a_id"), col("simhash").as("ha"), col("blk"), col("bv"))
      val y = banded.select(col("doc_id").as("b_id"), col("simhash").as("hb"), col("blk"), col("bv"))
      x.join(y, Seq("blk", "bv"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("hamming", expr("bit_count(ha ^ hb)"))
        .filter(col("hamming") <= 7)
        .select(col("a_id"), col("b_id"), col("hamming")).distinct()
        .orderBy(col("a_id"), col("b_id"))
    }
    def embLshNoCache(): DataFrame = {
      import graft.functions.VectorFunctions.cosineSimilarity
      val vecs = TableIO.embeddings(spark, dir)
      val buckets = Similarity.lshBuckets(vecs, vecs.count())
      val candidates = buckets.select(col("vec_id").as("a_id"), col("bucket"))
        .join(buckets.select(col("vec_id").as("b_id"), col("bucket")), Seq("bucket"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id")).distinct()
      val ea = vecs.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      val eb = vecs.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
      candidates.join(ea, "a_id").join(eb, "b_id")
        .withColumn("cos", cosineSimilarity(col("ea"), col("eb")))
        .filter(col("cos") >= 0.45)
        .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos4"))
        .orderBy(col("a_id"), col("b_id"))
    }

    // ngram twin: the pre-r14 any-row-survives candidate filter (per-row positional
    // bound + distinct), against the r14 per-pair aggregated tight bound
    def ngramOldFilter(): DataFrame = {
      val g = Dedup.gramHashSets(TableIO.documents(spark, dir)).cache()
      val threshold = 0.5
      val inv = g.select(col("doc_id"), col("sz"), explode(col("gh")).as("h"))
      val gramDf = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val byRarity = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
      val p = inv.join(gramDf, Seq("h"))
        .withColumn("rk", row_number().over(byRarity))
        .filter(col("rk") <= col("sz") - ceil(col("sz") * threshold) + 1)
        .select(col("doc_id"), col("h"), col("rk"), col("sz"))
      val a = p.select(col("doc_id").as("a_id"), col("h"), col("rk").as("rka"), col("sz").as("sza"))
      val b = p.select(col("doc_id").as("b_id"), col("h"), col("rk").as("rkb"), col("sz").as("szb"))
      val candidates = a.join(b, Seq("h"))
        .filter(col("a_id") < col("b_id"))
        .filter(least(col("sza"), col("szb")) >= lit(threshold) * greatest(col("sza"), col("szb")))
        .filter(least(col("sza") - col("rka"), col("szb") - col("rkb")) + 1 >=
          ceil(lit(threshold / (1 + threshold)) * (col("sza") + col("szb"))))
        .select(col("a_id"), col("b_id")).distinct()
      Dedup.verifiedJaccardForProbe(candidates, g)
        .filter(col("jacc") >= threshold)
        .orderBy(col("a_id"), col("b_id"))
    }
    // kmeans twin: the pre-r14 plan — interpreted HOF distance, no vectors cache
    def kmeansOld(): DataFrame = {
      import graft.pipeline.Clustering
      val k = 8
      val vectors = TableIO.embeddings(spark, dir)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 1000.0).cast("long")).as("qe"))
      def assign(vs: DataFrame, cents: DataFrame): DataFrame =
        vs.crossJoin(broadcast(cents))
          .withColumn("dist", Clustering.sqDistHof(col("qe"), col("ce")))
          .groupBy(col("vec_id"))
          .agg(min(struct(col("dist"), col("cid"))).as("m"), first(col("qe")).as("qe"))
          .select(col("vec_id"), col("qe"), col("m.cid").as("cid"), col("m.dist").as("dist"))
      def update(assigned: DataFrame, prev: DataFrame): DataFrame = {
        val sums = assigned
          .select(col("cid"), posexplode(col("qe")).as(Seq("pos", "v")))
          .groupBy(col("cid"), col("pos"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .withColumn("comp", floor(col("s") / col("n")).cast("long"))
          .groupBy(col("cid"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
            e => e.getField("comp")).as("ce_new"))
        prev.join(sums, Seq("cid"), "left")
          .select(col("cid"), coalesce(col("ce_new"), col("ce")).as("ce"))
      }
      var cents = vectors.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("qe").as("ce"))
      for (_ <- 1 to 2) cents = update(assign(vectors, cents), cents)
      val fin = assign(vectors, cents)
      fin.groupBy(col("cid"))
        .agg(count(lit(1)).as("n"), sum(col("dist")).as("inertia"))
        .join(cents.select(col("cid"),
          aggregate(col("ce"), lit(0L), (acc, x) => acc + x).as("centroid_sum")), Seq("cid"))
        .select(col("cid"), col("n"), col("inertia"), col("centroid_sum"))
        .orderBy(col("cid"))
    }
    if (mode == "ngramcount") {
      // candidate-set sizes: pre-r14 any-row filter vs r14 per-pair tight bound
      val g = Dedup.gramHashSets(TableIO.documents(spark, dir)).cache()
      val threshold = 0.5
      val inv = g.select(col("doc_id"), col("sz"), explode(col("gh")).as("h"))
      val gramDf = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val byRarity = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
      val p = inv.join(gramDf, Seq("h"))
        .withColumn("rk", row_number().over(byRarity))
        .filter(col("rk") <= col("sz") - ceil(col("sz") * threshold) + 1)
        .select(col("doc_id"), col("h"), col("rk"), col("sz"))
      val a = p.select(col("doc_id").as("a_id"), col("h"), col("rk").as("rka"), col("sz").as("sza"))
      val b = p.select(col("doc_id").as("b_id"), col("h"), col("rk").as("rkb"), col("sz").as("szb"))
      val old = a.join(b, Seq("h"))
        .filter(col("a_id") < col("b_id"))
        .filter(least(col("sza"), col("szb")) >= lit(threshold) * greatest(col("sza"), col("szb")))
        .filter(least(col("sza") - col("rka"), col("szb") - col("rkb")) + 1 >=
          ceil(lit(threshold / (1 + threshold)) * (col("sza") + col("szb"))))
        .select(col("a_id"), col("b_id")).distinct().count()
      val nw = Dedup.ngramCandidates(g, threshold).count()
      println(s"[ddprobe] candidates old=$old new=$nw")
      spark.stop()
      return
    }
    val (noCache, cached): (() => DataFrame, () => DataFrame) = mode match {
      case "minhash" => (minhashNoCache _, () => Dedup.dedupMinhash(spark, dir))
      case "simhash" => (simhashNoCache _, () => Dedup.dedupSimhash(spark, dir))
      case "emblsh"  => (embLshNoCache _, () => Dedup.dedupEmbeddingLsh(spark, dir))
      case "ngram"   => (ngramOldFilter _, () => Dedup.dedupNgramJaccard(spark, dir))
      case "kmeans"  => (kmeansOld _, () => graft.pipeline.Clustering.qKmeans(spark, dir))
      case "basketlift" =>
        (() => graft.operators.AnalyticsOps.qBasketLiftImpl(spark, dir, 20, 3, fusedItems = false),
         () => graft.operators.AnalyticsOps.qBasketLiftImpl(spark, dir, 20, 3, fusedItems = true))
    }
    for (r <- 1 to reps) {
      time1(s"$mode-noc", r, noCache)
      time1(s"$mode-cch", r, cached)
    }
    val a = noCache().collect().map(_.toString).toSeq
    clear()
    val b = cached().collect().map(_.toString).toSeq
    println(s"[ddprobe] equal=${a == b}")
    spark.stop()
  }
}
