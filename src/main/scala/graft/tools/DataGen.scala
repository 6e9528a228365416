package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/**
 * Scale-rehearsal data generator: replicate a driver-generated sf directory `factor`x
 * into a larger one (e.g. sf0.1 -> sf1) with the SAME distributions, so per-query
 * scaling ratios measure the ENGINE, not a changed workload.
 *
 * Replication is distribution-preserving by construction — each replica is an
 * independent shard of the original: primary keys shift by `rep * cardinality`, foreign
 * keys shift by the SAME offsets (join degrees, selectivities and group cardinalities
 * per key are exactly those of the source; global group counts scale like real TPC-H,
 * where customer/supplier/part scale linearly with SF while nation/region stay fixed).
 *
 * Two columns must NOT replicate verbatim or the dedup/ANN workloads stop scaling like
 * a corpus and start measuring self-duplicate explosion (10 identical copies of every
 * doc = 45 intra-bucket pairs per doc — quadratic in factor, nothing like a real 10x
 * corpus):
 *  - documents.text: replica r>0 rotates every token by `3r` positions in the corpus
 *    vocabulary — token frequencies become a permuted copy of the original Zipf curve,
 *    doc lengths and intra-replica duplicate structure are preserved exactly, and
 *    cross-replica shingle overlap drops to noise (the shingle space is the vocab^n
 *    lattice; a rotation moves a doc's shingles to a disjoint region).
 *  - embeddings.embedding: replica r>0 adds deterministic hash-seeded noise (±0.25 per
 *    dim) and re-normalizes — intra-replica geometry is approximately preserved,
 *    cross-replica near-identity is destroyed.
 *
 * events.ts is rewritten from the driver's TIMESTAMP(NANOS) (which this session reads
 * as long nanos) to a plain micros timestamp so DuckDB and Spark read the generated
 * files with the same type. Everything else round-trips bit-exact for replica 0.
 */
object DataGen {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: DataGen <srcSfDir> <outDir> <factor>")
    val Array(srcDir, outDir, factorStr) = args
    val factor = factorStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]", cpus.toInt)

    def src(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")
    def reps(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(spark.range(factor).toDF("rep")))
    def write(df: DataFrame, name: String, nFiles: Int): Unit = {
      df.repartition(nFiles).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      println(s"[datagen] $name written")
    }

    // fixed dims copy verbatim (TPC-H semantics: nation/region do not scale with SF)
    write(src("region"), "region", 1)
    write(src("nation"), "nation", 1)

    val nC = src("customer").count()
    val nS = src("supplier").count()
    val nP = src("part").count()
    val nO = src("orders").count()
    val nE = src("events").count()
    val nU = src("events").agg(max(col("user_id"))).head.getLong(0) + 1
    val nD = src("documents").count()
    val nV = src("embeddings").count()

    def shifted(name: String, shifts: (String, Long)*): DataFrame =
      shifts.foldLeft(reps(src(name))) { case (df, (c, n)) =>
        df.withColumn(c, col(c) + col("rep") * n)
      }.drop("rep")

    write(shifted("customer", "c_custkey" -> nC), "customer", 2)
    write(shifted("supplier", "s_suppkey" -> nS), "supplier", 2)
    write(shifted("part", "p_partkey" -> nP), "part", 2)
    write(shifted("orders", "o_orderkey" -> nO, "o_custkey" -> nC), "orders", 16)
    write(shifted("lineitem",
      "l_orderkey" -> nO, "l_partkey" -> nP, "l_suppkey" -> nS), "lineitem", 32)

    // events: shift ids, normalize ts to a micros timestamp both engines read natively
    val ev = shifted("events", "event_id" -> nE, "user_id" -> nU)
    val evOut =
      if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        ev.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else ev
    write(evOut, "events", 16)

    // documents: shift doc_id; rotate replica text through the corpus vocabulary
    val docs = src("documents")
    val vocab = docs.filter(col("text").isNotNull)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .distinct().orderBy("t").collect().map(_.getString(0))
    val vIdx = vocab.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast((vocab, vIdx))
    val rotate = udf { (text: String, rep: Long) =>
      if (rep == 0L || text == null) text
      else {
        val (vs, vm) = bc.value
        text.trim.split("\\s+").map { t =>
          vm.get(t) match {
            case Some(i) => vs(((i + rep * 3) % vs.length).toInt)
            case None => t
          }
        }.mkString(" ")
      }
    }
    val nCharsType = docs.schema("n_chars").dataType
    val docsOut = reps(docs)
      .withColumn("doc_id", col("doc_id") + col("rep") * nD)
      .withColumn("text", rotate(col("text"), col("rep")))
      .withColumn("n_chars", length(col("text")).cast(nCharsType))
      .drop("rep")
    write(docsOut, "documents", 8)

    // embeddings: shift vec_id; noise + renormalize replica vectors (unit-norm source)
    val noised = udf { (vecId: Long, arr: Seq[Float], rep: Long) =>
      if (rep == 0L || arr == null) arr
      else {
        val out = new Array[Double](arr.length)
        var norm = 0.0
        var j = 0
        while (j < arr.length) {
          var z = vecId * 1315423911L + j * 2654435761L + rep * 0x9E3779B97F4A7C15L
          z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL; z ^= z >>> 33
          val r = ((z & 0xFFFFFF).toDouble / 0xFFFFFF - 0.5) * 2.0
          val v = arr(j) + 0.25 * r
          out(j) = v; norm += v * v; j += 1
        }
        val inv = 1.0 / math.sqrt(norm)
        out.map(v => (v * inv).toFloat).toSeq
      }
    }
    val embOut = reps(src("embeddings"))
      .withColumn("embedding", noised(col("vec_id"), col("embedding"), col("rep")))
      .withColumn("vec_id", col("vec_id") + col("rep") * nV)
      .drop("rep")
    write(embOut, "embeddings", 4)

    spark.stop()
    println(s"[datagen] done: $outDir at ${factor}x of $srcDir")
  }
}
