package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.TableIO
import graft.pipeline.Dedup

/** Ad-hoc perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    spark.range(1000).selectExpr("sum(id)").count() // warmup

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("gramHashSets")(Dedup.gramHashSets(TableIO.documents(spark, dir)).count())
    val g = Dedup.gramHashSets(TableIO.documents(spark, dir))
    time("inverted index")(g.select(col("doc_id"), explode(col("gh")).as("h")).count())
    val inv = g.select(col("doc_id"), explode(col("gh")).as("h"))
    time("cooccur join+agg") {
      inv.select(col("doc_id").as("a_id"), col("h"))
        .join(inv.select(col("doc_id").as("b_id"), col("h")), Seq("h"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter")).count()
    }
    time("full ngram_jaccard")(Dedup.dedupNgramJaccard(spark, dir).count())
    time("simhashes")(Dedup.simhashes(TableIO.documents(spark, dir)).count())
    time("full simhash")(Dedup.dedupSimhash(spark, dir).count())
    time("minhash signatures")(Dedup.minhashSignatures(g).count())
    time("full minhash")(Dedup.dedupMinhash(spark, dir).count())
    spark.stop()
  }
}
