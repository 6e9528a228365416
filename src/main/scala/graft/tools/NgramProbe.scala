package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.pipeline.Dedup
import graft.sources.TableIO

/** r14 phase decomposition for dedup_ngram_jaccard (VERDICT r13 Next #8): times the
  * gram build, the prefix index (inverted index + df + rarity window), the candidate
  * self-join, and the verification join separately, so the 13 s sf1 bill is attributed
  * to a stage before anything is changed (guide §1.1). The index phase is inlined from
  * Dedup.prefixIndex (private) — same plan.
  * `sbt "runMain graft.tools.NgramProbe <sfDir> [reps]"` */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val threshold = 0.5
    val spark = GraftSession.get("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ngprobe]   $tag ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to reps) {
      println(s"[ngprobe] === rep $rep: phase decomposition ===")
      val total0 = System.nanoTime()
      val g = Dedup.gramHashSets(TableIO.documents(spark, dir)).cache()
      t("gram build+count")(g.count())
      // phase 2: prefix index (inlined from Dedup.prefixIndex — same plan)
      val inv = g.select(col("doc_id"), col("sz"), explode(col("gh")).as("h"))
      val gramDf = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val byRarity = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
      val p = inv.join(gramDf, Seq("h"))
        .withColumn("rk", row_number().over(byRarity))
        .filter(col("rk") <= col("sz") - ceil(col("sz") * threshold) + 1)
        .select(col("doc_id"), col("h"), col("rk"), col("sz"))
        .localCheckpoint(false)
      t("prefix index")(noop(p))
      val pM = p.localCheckpoint()
      // phase 3: candidate self-join + PPJoin filters + distinct
      val a = pM.select(col("doc_id").as("a_id"), col("h"), col("rk").as("rka"), col("sz").as("sza"))
      val b = pM.select(col("doc_id").as("b_id"), col("h"), col("rk").as("rkb"), col("sz").as("szb"))
      val cand = a.join(b, Seq("h"))
        .filter(col("a_id") < col("b_id"))
        .filter(least(col("sza"), col("szb")) >= lit(threshold) * greatest(col("sza"), col("szb")))
        .filter(least(col("sza") - col("rka"), col("szb") - col("rkb")) + 1 >=
          ceil(lit(threshold / (1 + threshold)) * (col("sza") + col("szb"))))
        .select(col("a_id"), col("b_id")).distinct()
        .localCheckpoint()
      t("candidate join")(println(s"[ngprobe]     candidates=${cand.count()}"))
      // phase 4: verification join against the gram frame (public path for parity)
      t("verify join")(noop(
        Dedup.ngramJaccardPairs(g, threshold).orderBy(col("a_id"), col("b_id"))))
      println(f"[ngprobe]   TOTAL(phases) ${(System.nanoTime() - total0) / 1e9}%6.2f s")
      clear()
      // end-to-end twin for the same rep, exactly the declared query
      t("end-to-end dedup_ngram_jaccard")(noop(Dedup.dedupNgramJaccard(spark, dir)))
      clear()
    }
    spark.stop()
  }
}
