package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LayoutWriter, TableIO}

/**
 * Layout management: clustering on the dominant filter column must make parquet min/max
 * skipping real — measured with scan metrics, not assumed. The same predicate over the
 * same rows should READ a small fraction of a clustered layout and all of a random one.
 */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  /** Rows the parquet reader actually emitted (post row-group/page skipping), summed
    * over every scan node. Pure scan+filter plans have no exchange, so no AQE nesting. */
  private def rowsScanned(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }

  test("clustered layout skips row groups a random layout must read") {
    val dir = Files.createTempDirectory("graft-layout").toString
    // cluster on a DATE cast: TIMESTAMP_NTZ predicates are pushed but do not prune row
    // groups in this stack (pinned below) — a layout manager must cluster on a type whose
    // parquet stats the reader actually uses
    val li = TableIO.lineitem(spark, sf)
      .withColumn("ship_d", to_date(col("l_shipdate"))).cache()
    try {
      // a ~5% window in the MIDDLE of the date range: a random layout's every file
      // span contains it, a clustered layout's files mostly don't
      val dates = li.select(col("ship_d")).distinct()
        .orderBy(col("ship_d")).collect().map(_.getDate(0))
      val lo = dates(dates.length * 45 / 100)
      val hi = dates(dates.length * 50 / 100)

      // random layout: every file spans the whole date range
      li.repartition(8, col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$dir/random")
      // clustered layout: disjoint date ranges per file, sorted inside
      LayoutWriter.writeClustered(li, s"$dir/clustered", Seq("ship_d"), targetFiles = 8)

      def filtered(path: String) =
        spark.read.parquet(path)
          .filter(col("ship_d") >= lit(lo) && col("ship_d") <= lit(hi))

      val total = li.count()
      val matching = filtered(s"$dir/random").count()
      assert(matching > 0 && matching < total / 8,
        s"probe predicate should be selective: $matching of $total")

      val randomRead = rowsScanned(filtered(s"$dir/random"))
      val clusteredRead = rowsScanned(filtered(s"$dir/clustered"))

      // random: min/max spans of all 8 files contain the probe -> reads everything
      assert(randomRead >= total * 9 / 10,
        s"random layout should read ~all rows, read $randomRead of $total")
      // clustered: only the file(s) whose range can match are read
      assert(clusteredRead * 2 <= randomRead,
        s"clustered layout should skip most row groups: $clusteredRead vs $randomRead")
    } finally {
      li.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("TIMESTAMP_NTZ caveat is real: pushed NTZ predicate does not prune row groups") {
    val dir = Files.createTempDirectory("graft-layout-ntz").toString
    val li = TableIO.lineitem(spark, sf).cache()
    try {
      LayoutWriter.writeClustered(li, s"$dir/ntz", Seq("l_shipdate"), targetFiles = 8)
      val dates = li.select(col("l_shipdate")).distinct()
        .orderBy(col("l_shipdate")).collect().map(_.get(0))
      val lo = dates(dates.length * 45 / 100)
      val hi = dates(dates.length * 50 / 100)
      val f = spark.read.parquet(s"$dir/ntz")
        .filter(col("l_shipdate") >= lit(lo) && col("l_shipdate") <= lit(hi))
      f.collect()
      val plan = f.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
        s"NTZ predicate should still be pushed:\n$plan")
      // ...but every row group is read anyway: if a Spark upgrade starts pruning these,
      // this assertion fails and the LayoutWriter caveat doc should be dropped
      assert(rowsScanned(f) == li.count(),
        "NTZ row groups pruned: update LayoutWriter's caveat doc — DATE cast no longer needed")
    } finally {
      li.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("partition-level upsert rewrites only the touched partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-upsert").toString
    val dir = s"$root/tbl"
    try {
      Seq((1L, "a", 2020), (2L, "b", 2020), (3L, "c", 2021), (4L, "d", 2022))
        .toDF("id", "v", "yr").write.partitionBy("yr").parquet(dir)

      def snapshot(yr: Int): Map[String, Long] = {
        val d = new java.io.File(s"$dir/yr=$yr")
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toMap
      }
      val before2021 = snapshot(2021)
      val before2022 = snapshot(2022)

      // one key update, one insert into an existing partition, one brand-new partition
      val updates = Seq((2L, "B", 2020), (5L, "e", 2020), (6L, "f", 2023))
        .toDF("id", "v", "yr")
      graft.sources.LayoutWriter.upsertPartitioned(spark, dir, updates, "id", "yr")

      val out = spark.read.parquet(dir).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
      assert(out == Map(
        1L -> ("a", 2020), 2L -> ("B", 2020), 3L -> ("c", 2021),
        4L -> ("d", 2022), 5L -> ("e", 2020), 6L -> ("f", 2023)))

      // untouched partitions: same files, same mtimes — bit-for-bit alone
      assert(snapshot(2021) == before2021, "yr=2021 must not be rewritten")
      assert(snapshot(2022) == before2022, "yr=2022 must not be rewritten")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("delete-by-key rewrites only holding partitions, drops emptied ones, idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-delete").toString
    val dir = s"$root/tbl"
    try {
      Seq((1L, "a", 2020), (2L, "b", 2020), (3L, "c", 2021), (4L, "d", 2022))
        .toDF("id", "v", "yr").write.partitionBy("yr").parquet(dir)
      def snapshot(yr: Int): Map[String, Long] = {
        val d = new java.io.File(s"$dir/yr=$yr")
        if (!d.exists()) Map.empty
        else d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toMap
      }
      val before2022 = snapshot(2022)

      // delete key 1 (partial partition) and key 3 (the whole 2021 partition)
      val deleted = graft.sources.LayoutWriter.deleteByKeys(
        spark, dir, Seq(1L, 3L, 99L).toDF("id"), "id", "yr")
      assert(deleted == 2L)
      val out = spark.read.parquet(dir).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
      assert(out == Map(2L -> ("b", 2020), 4L -> ("d", 2022)))
      assert(!new java.io.File(s"$dir/yr=2021").exists(), "emptied partition removed")
      assert(snapshot(2022) == before2022, "unaffected partition untouched")

      // idempotent re-run: nothing deleted, no rewrites anywhere
      val before2020 = snapshot(2020)
      assert(graft.sources.LayoutWriter.deleteByKeys(
        spark, dir, Seq(1L, 3L).toDF("id"), "id", "yr") == 0L)
      assert(snapshot(2020) == before2020, "no-op delete must not rewrite")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("z-order layout skips row groups on BOTH filter columns; 1-D clustering only on one") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    val orders = TableIO.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")).cache()
    try {
      LayoutWriter.writeZOrdered(orders, s"$dir/z", "o_custkey", "o_totalprice", targetFiles = 16)
      LayoutWriter.writeClustered(orders, s"$dir/one", Seq("o_custkey"), targetFiles = 16)

      val total = orders.count()
      // narrow probes in the middle of each column's range
      val (cLo, cHi) = {
        val r = orders.agg(min("o_custkey"), max("o_custkey")).head()
        val span = r.getLong(1) - r.getLong(0)
        (r.getLong(0) + span * 45 / 100, r.getLong(0) + span * 50 / 100)
      }
      val (pLo, pHi) = {
        val r = orders.agg(min("o_totalprice"), max("o_totalprice")).head()
        val span = r.getDouble(1) - r.getDouble(0)
        (r.getDouble(0) + span * 45 / 100, r.getDouble(0) + span * 50 / 100)
      }
      def onCust(path: String) = spark.read.parquet(path)
        .filter(col("o_custkey") >= cLo && col("o_custkey") <= cHi)
      def onPrice(path: String) = spark.read.parquet(path)
        .filter(col("o_totalprice") >= pLo && col("o_totalprice") <= pHi)

      // z-order: BOTH axes skip meaningfully
      val zCust = rowsScanned(onCust(s"$dir/z"))
      val zPrice = rowsScanned(onPrice(s"$dir/z"))
      assert(zCust * 2 <= total, s"z-order custkey probe read $zCust of $total")
      assert(zPrice * 2 <= total, s"z-order price probe read $zPrice of $total")

      // 1-D clustering: clustered axis skips hard, the OTHER axis reads ~everything —
      // the gap z-ordering exists to close
      val oneCust = rowsScanned(onCust(s"$dir/one"))
      val onePrice = rowsScanned(onPrice(s"$dir/one"))
      assert(oneCust * 4 <= total, s"clustered-axis probe should skip hard: $oneCust")
      assert(onePrice >= total * 9 / 10,
        s"unclustered-axis probe should read ~all rows, read $onePrice of $total")
      // and on that axis, z beats 1-D by a wide margin
      assert(zPrice * 2 <= onePrice, s"z-order should beat 1-D on the second axis: $zPrice vs $onePrice")
    } finally {
      orders.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("Hilbert index is a continuous bijection (round-trip + unit steps)") {
    import org.apache.spark.sql.graft.HilbertCurve
    // reference inverse (d2xy) for the round-trip: standard algorithm, test-only
    def d2xy(d: Long): (Long, Long) = {
      var (x, y) = (0L, 0L)
      var t = d
      var s = 1L
      while (s < (1L << HilbertCurve.Bits)) {
        val rx = 1L & (t / 2)
        val ry = 1L & (t ^ rx)
        if (ry == 0L) {
          if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
          val tmp = x; x = y; y = tmp
        }
        x += s * rx
        y += s * ry
        t /= 4
        s *= 2
      }
      (x, y)
    }
    val rnd = new scala.util.Random(5)
    val maxD = 1L << (2 * HilbertCurve.Bits)
    (1 to 2000).foreach { _ =>
      val d = math.abs(rnd.nextLong()) % (maxD - 1)
      val (x, y) = d2xy(d)
      assert(HilbertCurve.index(x, y) == d) // bijection round-trip
      val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x2 - x) + math.abs(y2 - y) == 1, // THE Hilbert property:
        s"curve step $d -> ${d + 1} jumped from ($x,$y) to ($x2,$y2)") // unit grid steps
    }
    assert(HilbertCurve.index(0, 0) == 0)
  }

  test("Hilbert layout skips row groups on BOTH filter columns") {
    val dir = Files.createTempDirectory("graft-hilbert").toString
    val orders = TableIO.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")).cache()
    try {
      LayoutWriter.writeHilbert(orders, s"$dir/h", "o_custkey", "o_totalprice", targetFiles = 16)
      val total = orders.count()
      val (cLo, cHi) = {
        val r = orders.agg(min("o_custkey"), max("o_custkey")).head()
        val span = r.getLong(1) - r.getLong(0)
        (r.getLong(0) + span * 45 / 100, r.getLong(0) + span * 50 / 100)
      }
      val (pLo, pHi) = {
        val r = orders.agg(min("o_totalprice"), max("o_totalprice")).head()
        val span = r.getDouble(1) - r.getDouble(0)
        (r.getDouble(0) + span * 45 / 100, r.getDouble(0) + span * 50 / 100)
      }
      val hCust = rowsScanned(spark.read.parquet(s"$dir/h")
        .filter(col("o_custkey") >= cLo && col("o_custkey") <= cHi))
      val hPrice = rowsScanned(spark.read.parquet(s"$dir/h")
        .filter(col("o_totalprice") >= pLo && col("o_totalprice") <= pHi))
      assert(hCust * 2 <= total, s"hilbert custkey probe read $hCust of $total")
      assert(hPrice * 2 <= total, s"hilbert price probe read $hPrice of $total")
    } finally {
      orders.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("quantile z-order keeps skipping on a skewed column where linear z-order cannot") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-zorder-q").toString
    val n = 60000
    try {
      // deterministic heavy skew: v = exp(12 * u) with u pseudo-shuffled — under LINEAR
      // bucketing over [1, e^12], over half the rows collapse into bucket 0, so the
      // z-curve degenerates to the other column there and skew-axis probes stop skipping
      val df = spark.range(n).select(
        (col("id") * 2654435761L % n).as("a"),
        exp(((col("id") * 1103515245L + 12345L) % n).cast("double") / n * 12.0).as("v"))
        .cache()
      LayoutWriter.writeZOrdered(df, s"$dir/lin", "a", "v", targetFiles = 64)
      LayoutWriter.writeZOrderedQuantile(df, s"$dir/q", "a", "v", targetFiles = 64)

      // a narrow probe INSIDE the dense region (30th-35th percentile of v): quantile
      // buckets 77..90, which share their top TWO bucket bits — the z-curve constraint
      // a probe needs (a range straddling the bucket-128 boundary would fix no top bit
      // and skip nothing at file granularity, for linear and quantile alike)
      val qs = df.stat.approxQuantile("v", Array(0.30, 0.35), 1e-4)
      def probe(path: String) = spark.read.parquet(path)
        .filter(col("v") >= qs(0) && col("v") <= qs(1))
      val linRead = rowsScanned(probe(s"$dir/lin"))
      val quantRead = rowsScanned(probe(s"$dir/q"))
      assert(quantRead * 2 <= n, s"quantile z-order should skip: read $quantRead of $n")
      assert(quantRead * 2 <= linRead,
        s"quantile buckets should beat linear on the skewed axis: $quantRead vs $linRead")
      // the OTHER (uniform) axis still skips under quantile bucketing (same top-bit
      // placement discipline as the v probe)
      val aRead = rowsScanned(spark.read.parquet(s"$dir/q")
        .filter(col("a") >= n * 30 / 100 && col("a") <= n * 35 / 100))
      assert(aRead * 2 <= n, s"uniform axis must keep skipping: $aRead of $n")
      df.unpersist()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("upsert partition-move deletes the emptied directory, including escaped and null names") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-upsert-move").toString
    val dir = s"$root/tbl"
    try {
      // partition values exercising Hive path escaping (':' -> %3A) and the null
      // partition (__HIVE_DEFAULT_PARTITION__) — a raw "col=value" path would miss both
      Seq((1L, "a", "us:east"), (2L, "b", "us:east"), (3L, "c", "eu"), (4L, "d", null))
        .toDF("id", "v", "region").write.partitionBy("region").parquet(dir)
      assert(new java.io.File(s"$dir/region=us%3Aeast").exists(), "writer escapes ':'")
      assert(new java.io.File(s"$dir/region=__HIVE_DEFAULT_PARTITION__").exists())

      // move BOTH rows out of us:east and the one row out of the null partition:
      // both directories are emptied and must disappear, not linger with stale files
      val updates = Seq((1L, "A", "eu"), (2L, "B", "eu"), (4L, "D", "eu"))
        .toDF("id", "v", "region")
      LayoutWriter.upsertPartitioned(spark, dir, updates, "id", "region")

      val out = spark.read.parquet(dir).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      assert(out == Map(1L -> ("A", "eu"), 2L -> ("B", "eu"),
        3L -> ("c", "eu"), 4L -> ("D", "eu")), s"got $out")
      assert(!new java.io.File(s"$dir/region=us%3Aeast").exists(),
        "emptied escaped partition directory must be deleted")
      assert(!new java.io.File(s"$dir/region=__HIVE_DEFAULT_PARTITION__").exists(),
        "emptied null partition directory must be deleted")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("upsert tolerates differently-typed updates without deleting fresh partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-upsert-typed").toString
    val dir = s"$root/tbl"
    try {
      // table partitioned on an INT yr (what partition inference reads back); the
      // updates batch carries yr as LONG — driver-side value comparison must not treat
      // 2020:Int and 2020L as different partitions (that marked the freshly-written
      // partition as emptied and deleted it right after the write)
      Seq((1L, "a", 2020), (2L, "b", 2021)).toDF("id", "v", "yr")
        .write.partitionBy("yr").parquet(dir)
      val updates = Seq((1L, "A", 2020L)).toDF("id", "v", "yr") // the ONLY row of yr=2020
      LayoutWriter.upsertPartitioned(spark, dir, updates, "id", "yr")
      val out = spark.read.parquet(dir).collect()
        .map(r => r.getAs[Long]("id") -> (r.getAs[String]("v"), r.getAs[Int]("yr"))).toMap
      assert(out == Map(1L -> ("A", 2020), 2L -> ("b", 2021)), s"got $out")
      assert(new java.io.File(s"$dir/yr=2020").exists(), "fresh partition must survive")
      // the partition column type must not silently widen to the updates' LONG
      assert(spark.read.parquet(dir).schema("yr").dataType ==
        org.apache.spark.sql.types.IntegerType)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("upsert rejects duplicate keys in the updates batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-upsert-dup").toString
    val dir = s"$root/tbl"
    try {
      Seq((1L, "a", 2020)).toDF("id", "v", "yr").write.partitionBy("yr").parquet(dir)
      val dupes = Seq((1L, "x", 2020), (1L, "y", 2020)).toDF("id", "v", "yr")
      val e = intercept[IllegalArgumentException] {
        LayoutWriter.upsertPartitioned(spark, dir, dupes, "id", "yr")
      }
      assert(e.getMessage.contains("duplicate"), e.getMessage)
      // table untouched by the failed upsert
      assert(spark.read.parquet(dir).collect().map(_.getString(1)).toSeq == Seq("a"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("partitioned+clustered layout composes directory pruning with row-group skipping") {
    val dir = Files.createTempDirectory("graft-layout2").toString
    val orders = TableIO.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
    try {
      LayoutWriter.writePartitionedClustered(
        orders, s"$dir/po", "o_year", Seq("o_custkey"), targetFiles = 16)

      val yr = orders.select(min("o_year")).first().getInt(0)
      val read = spark.read.parquet(s"$dir/po")
        .filter(col("o_year") === yr && col("o_custkey") <= 10)

      // directory pruning visible in the plan: only one year partition survives
      read.collect()
      val plan = read.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters"), s"expected pushed filters:\n$plan")

      val expected = orders.filter(col("o_year") === yr && col("o_custkey") <= 10).count()
      assert(read.count() == expected)

      // row-group skipping on the clustered col inside the surviving partition
      val inYear = orders.filter(col("o_year") === yr).count()
      val scanned = rowsScanned(read)
      assert(scanned < inYear,
        s"expected in-partition skipping: scanned $scanned of $inYear partition rows")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
