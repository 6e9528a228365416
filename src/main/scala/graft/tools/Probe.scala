package graft.tools
import graft.GraftSession
import graft.sources.TableIO

/** Dev scratch probe (contents vary per investigation). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = GraftSession.get("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // register the star (bucketed inventory etc.) and time the current verbatim plan
    val current = graft.SparkEntry.queries("tpcds_q22")(spark, dir)
    time("q22-verbatim") { exec(current) }
    // hand rewrite: pre-aggregate on the FULL base grouping key, then rollup the
    // 20k-row pre-aggregate (avg decomposed into sum+count)
    val pre = spark.sql("""
      SELECT i_product_name, i_brand, i_class, i_category,
             sum(inv_quantity_on_hand) s, count(inv_quantity_on_hand) c
      FROM inventory, date_dim, item, warehouse
      WHERE inv_date_sk = d_date_sk AND inv_item_sk = i_item_sk
        AND inv_warehouse_sk = w_warehouse_sk
        AND d_month_seq BETWEEN 360 AND 360 + 11
      GROUP BY i_product_name, i_brand, i_class, i_category""")
    pre.createOrReplaceTempView("q22_pre")
    val hand = spark.sql("""
      SELECT i_product_name, i_brand, i_class, i_category, sum(s) / sum(c) AS qoh
      FROM q22_pre
      GROUP BY ROLLUP (i_product_name, i_brand, i_class, i_category)
      ORDER BY qoh, i_product_name NULLS FIRST, i_brand NULLS FIRST, i_class NULLS FIRST,
        i_category NULLS FIRST
      LIMIT 100""")
    time("q22-preagg") { exec(hand) }
    spark.stop()
  }
}
