package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft

/**
 * The library front door exercised on CONSTRUCTED DataFrames — none of these touch the
 * driver test tables, proving the operators work on arbitrary user data with extra
 * columns passing through (the "switch to graft" contract, not just the test harness).
 */
class GraftApiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank", "web"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend", "web"),
      (3L, "completely different content about spark query engines and planning", "books"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank", "crawl"), // exact dup of 1
      (5L, "yet another unrelated document mentioning distributed joins only", "books")
    ).toDF("doc_id", "text", "source")
  }

  test("dedupe keeps one representative per exact/near-dup cluster, extra columns intact") {
    val kept = Graft.dedupe(docs, threshold = 0.8)
    assert(kept.columns.toSeq == Seq("doc_id", "text", "source"), "input columns preserved")
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    // 4 is an exact dup of 1; 2 is a near-dup of 1 (one token differs) -> cluster keeps 1
    assert(ids == Set(1L, 3L, 5L), s"got $ids")
  }

  test("nearDupPairs and nearDupClusters agree on the constructed corpus") {
    val pairs = Graft.nearDupPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)), s"got $pairs")
    val comp = Graft.nearDupClusters(docs, 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
  }

  test("ngramJaccardPairs on user data equals set-arithmetic truth") {
    val got = Graft.ngramJaccardPairs(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L)), s"got $got")
  }

  test("text signals run on arbitrary frames") {
    assert(Graft.tokenCounts(docs).count() == 5)
    val rep = Graft.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rep(1L) > rep(3L), "doc 1 repeats 'the' three times; doc 3 has no repeats")
    val fp = Graft.fingerprints(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(4L) && fp(1L) != fp(2L))
  }

  test("topKNeighbors works on a constructed vector frame") {
    import spark.implicits._
    // corpus on a plane: vec 10 is closest to the query direction, then 11
    val corpus = Seq(
      (10L, Array(1.0f, 0.1f, 0f, 0f)),
      (11L, Array(1.0f, 0.8f, 0f, 0f)),
      (12L, Array(-1.0f, 0.2f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 0f, 0f, 0f))).toDF("query_id", "embedding")
    val got = Graft.topKNeighbors(corpus, queries, k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 10L), (2, 11L)), s"got ${got.toSeq}")
  }

  test("topKNeighbors keeps a corpus vector whose id collides with the query id") {
    import spark.implicits._
    // query_id and vec_id are UNRELATED id spaces in the library API: corpus vec 5 is the
    // true nearest neighbor of query 5 and must NOT be self-excluded
    val corpus = Seq(
      (5L, Array(1.0f, 0f, 0f, 0f)),
      (6L, Array(0.2f, 1.0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((5L, Array(1.0f, 0.05f, 0f, 0f))).toDF("query_id", "embedding")
    val top1 = Graft.topKNeighbors(corpus, queries, k = 1).collect().head
    assert(top1.getLong(2) == 5L, s"self-exclusion wrongly dropped vec 5: $top1")
  }

  test("dedupe passes null-text rows through untouched (no content signal)") {
    import spark.implicits._
    val withNulls = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta", "a"),
      (2L, null, "b"),
      (3L, null, "c")
    ).toDF("doc_id", "text", "source")
    val ids = Graft.dedupe(withNulls).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L), s"null-text rows must not collapse: $ids")
  }

  test("mixtureWeighted applies caller-supplied weights on arbitrary sources") {
    import spark.implicits._
    val corpus = (1L to 100L).map(i =>
      (i, s"text $i", if (i <= 50) "wikipedia" else "commoncrawl"))
      .toDF("doc_id", "text", "source")
    val blended = Graft.mixtureWeighted(corpus, Map("wikipedia" -> 3.0, "commoncrawl" -> 0.5))
    val bySource = blended.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("wikipedia") == 150L, s"3.0x of 50 docs: $bySource")
    val cc = bySource.getOrElse("commoncrawl", 0L)
    assert(cc > 5 && cc < 45, s"~50% of 50 docs via hash-Bernoulli: $cc")
    // unlisted sources pass through at weight 1, deterministically
    val withOther = corpus.withColumn("source", org.apache.spark.sql.functions.lit("books"))
    assert(Graft.mixtureWeighted(withOther, Map("wikipedia" -> 3.0)).count() == 100L)
    // collision guard: pre-existing copy_id must be rejected, not clobbered
    intercept[IllegalArgumentException] {
      Graft.mixtureWeighted(corpus.withColumn("copy_id", org.apache.spark.sql.functions.lit(1)), Map("wikipedia" -> 2.0))
    }
  }

  test("topKPerKey and saltedJoin run on user frames") {
    import spark.implicits._
    val sales = Seq(("a", 3), ("a", 9), ("a", 5), ("b", 7), ("b", 1)).toDF("k", "v")
    val top = Graft.topKPerKey(sales, Seq("k"), Seq(("v", true)), 1)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(top == Map("a" -> 9, "b" -> 7))
    val dim = Seq(("a", "alpha"), ("b", "beta")).toDF("k", "name")
    val joined = Graft.saltedJoin(sales, dim, "k",
      org.apache.spark.sql.functions.col("v"), salts = 4)
    assert(joined.count() == 5)
  }

  test("profile plans are Expand-free in BOTH modes; default is the one-pass HLL++ form") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.0), (2L, "b", 3.0), (3L, "a", 2.0)).toDF("id", "tag", "x")
    val cols = Seq("id", "tag", "x")
    def plan(p: org.apache.spark.sql.DataFrame): String =
      p.queryExecution.executedPlan.toString
    val approx = Graft.profile(df, cols)
    assert(!plan(approx).contains("Expand"),
      "default profile must not multiply the input via Expand")
    // one HLL++ pass: no per-column subtrees, so no join in the plan either
    assert(!plan(approx).contains("Join"), "approx mode must stay a single aggregate pass")
    // exact mode: per-column single-distinct subtrees, still never the Expand shape
    assert(!plan(Graft.profile(df, cols, exact = true)).contains("Expand"),
      "exact ndv must use per-column single-distinct aggregates, not multi-distinct Expand")
    // on a tiny frame HLL++ ndv is exact: values must agree with the exact form
    val ndv = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ndv == Map("id" -> 3L, "tag" -> 2L, "x" -> 2L), s"got $ndv")
  }

  test("chunk, contamination, winnow, and splitAssign run on user frames") {
    import spark.implicits._
    val chunks = Graft.chunk(docs, chunkSize = 6, stride = 4).collect()
    assert(chunks.nonEmpty && chunks.forall(_.getInt(2) <= 6))

    val bench = Seq((9L, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text")
    val cont = Graft.contamination(docs, bench)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(cont(1L) == 1.0, "doc 1 is a verbatim copy of the benchmark text")
    assert(cont(3L) == 0.0, "doc 3 shares nothing with the benchmark")

    val fp1 = Graft.winnow(docs.filter($"doc_id" === 1L)).collect().map(_.getLong(2)).toSet
    val fp4 = Graft.winnow(docs.filter($"doc_id" === 4L)).collect().map(_.getLong(2)).toSet
    assert(fp1 == fp4, "identical texts must produce identical fingerprint sets")

    val assigned = Graft.splitAssign(docs)
    assert(assigned.columns.contains("split") && assigned.count() == docs.count())
    intercept[IllegalArgumentException] { Graft.splitAssign(docs.drop("doc_id")) }
  }

  test("asOfJoin and rangeJoin run on user frames") {
    import spark.implicits._
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 101.0)).toDF("k", "qts", "px")
    val trades = Seq((1L, 15L), (1L, 25L)).toDF("k", "tts")
    val enriched = Graft.asOfJoin(trades, quotes, "k", "tts", "qts", Seq("px"))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(enriched == Map(15L -> 100.0, 25L -> 101.0))

    val points = Seq((1L, 5.0), (2L, 42.0)).toDF("pid", "x")
    val intervals = Seq((7L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val inRange = Graft.rangeJoin(points, intervals, "x", "lo", "hi", binWidth = 8.0)
    assert(inRange.select("pid").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("round-4 curation facade methods run on user frames") {
    import spark.implicits._
    // segment dedup: doc 4 is an exact dup of doc 1 -> all its segments drop
    val segs = Graft.dedupSegments(docs, k = 4).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(segs(1L) == 4 && segs(4L) == 0, s"got $segs") // 13 tokens -> 4 segments

    // duplicate spans: docs 1+4 share their full 13-token text; doc 2 (the near-dup)
    // shares exactly its first 12 tokens with them
    val spans = Graft.duplicateSpans(docs, spanLen = 12).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(spans.toSet == Set((1L, 1, 13), (2L, 1, 12), (4L, 1, 13)), s"got ${spans.toSeq}")

    // shuffle shards: a permutation; deterministic; requireCols rejects a bad frame
    val sh = Graft.shuffleShards(docs, numShards = 2).collect()
    assert(sh.length == 5 && sh.map(_.getLong(0)).distinct.length == 5)
    intercept[IllegalArgumentException] { Graft.shuffleShards(docs.drop("doc_id")) }

    // perplexity: repeated-phrase docs score below the unique-vocab doc
    val ppl = Graft.perplexityScores(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl(1L) < ppl(3L), s"got $ppl")

    // rrf fusion on hand-built rankings
    val fused = Graft.rrfFuse(Seq(
      Seq((1L, 10L, 1)).toDF("query_id", "neighbor_id", "rank"),
      Seq((1L, 10L, 2), (1L, 11L, 1)).toDF("query_id", "neighbor_id", "rank")))
    assert(fused.collect().head.getLong(2) == 10L, "two-list candidate ranks first")

    // int8 round-trip on a user vector frame
    val vecs = Seq((7L, Array(0.5f, -1.0f, 0.25f))).toDF("vec_id", "embedding")
    val back = Graft.dequantizeInt8(Graft.quantizeInt8(vecs)).collect().head.getSeq[Float](1)
    assert(back.zip(Seq(0.5f, -1.0f, 0.25f)).forall { case (a, b) => math.abs(a - b) < 0.005f })

    // cutSpans on a user spans frame; unlisted docs pass through
    val spanFrame = Seq((4L, 1, 13)).toDF("doc_id", "span_start", "span_end")
    val trimmed = Graft.cutSpans(docs, spanFrame)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(trimmed(4L) == "" && trimmed(1L).nonEmpty, s"got ${trimmed(4L)}")

    // vocabulary coverage is monotone and ends at the top-k share
    val vocab = Graft.vocabCoverage(docs, k = 5).collect().map(_.getDouble(3))
    assert(vocab.length == 5 && vocab.sameElements(vocab.sorted), s"got ${vocab.toSeq}")
  }

  test("round-5 facade: sharded packGreedy, media kernels, arrow round-trip") {
    import spark.implicits._
    // sharded packing exposed at the facade: 3 docs of one stream, 2-doc shards ->
    // doc 3 starts a fresh bin even though it would fit bin 0
    val p = Graft.packGreedy(
      Seq((0L, "a b", "s"), (1L, "c d", "s"), (2L, "e", "s")).toDF("doc_id", "text", "source"),
      "source", budget = 100, shardDocs = 2L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(p == Map(0L -> 0L, 1L -> 0L, 2L -> 1L), s"got $p")

    // media kernels accept arbitrary frames; junk payloads drop, never throw
    val junk = Seq((1L, "junk bytes".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(Graft.decodeImages(junk).count() == 0)
    assert(Graft.decodeAudios(junk).count() == 0)
    assert(Graft.decodeVideoMetas(junk).count() == 0)
    intercept[IllegalArgumentException] { Graft.decodeImages(junk.drop("payload")) }

    // BPE training via the facade: the shared-prefix pair dominates
    val bpe = Graft.bpeTrain(
      Seq((1L, "see see seen"), (2L, "set")).toDF("doc_id", "text"), numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(bpe.head == (("s", "e", 4L)), s"got ${bpe.head}") // 's e' in all 4 words

    // arrow write/read round-trip through the facade
    val dir = java.nio.file.Files.createTempDirectory("graft_api_arrow").toString
    val frame = Seq((1L, "x", 1.5), (2L, "y", -0.5)).toDF("id", "s", "v")
    Graft.writeArrow(frame, dir)
    val back = Graft.readArrow(spark, dir)
    assert(back.schema == frame.schema)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // semantic dedup on a user frame: the exact copy (higher id, same cluster) drops
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)), (3L, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val sem = Graft.semanticDedup(vecs, k = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(sem == Map(1L -> 1, 2L -> 1, 3L -> 0), s"got $sem")
    intercept[IllegalArgumentException] { Graft.semanticDedup(vecs.drop("embedding")) }
  }

  test("linkRecords facade: blocked fuzzy linkage on user frames, schema-guarded") {
    import spark.implicits._
    val clean = Seq((1L, "acme corp", "c"), (2L, "apex corp", "c")).toDF("id", "name", "block")
    val dirty = Seq((9L, "acme c0rp", "c")).toDF("id", "name", "block")
    val got = Graft.linkRecords(clean, dirty).collect()
    assert(got.length == 1 && got.head.getLong(2) == 1L)
    intercept[IllegalArgumentException] { Graft.linkRecords(clean.drop("block"), dirty) }
  }

  test("round-5b facade: triangles, row ids, weighted sample, bloom audit, histograms, NB") {
    import spark.implicits._
    // triangle count on a user edge frame (K3 plus a pendant)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    assert(Graft.triangleCount(edges).head().getLong(0) == 1L)

    // global row ids on a user frame: dense, key-ordered, extra columns intact
    val rid = Graft.globalRowIds(docs, "doc_id", numParts = 3)
      .orderBy("rid").collect()
    assert(rid.map(_.getAs[Long]("rid")).sameElements(1L to 5L))
    assert(rid.map(_.getAs[Long]("doc_id")).sameElements(1L to 5L))
    assert(rid.head.getAs[String]("source") == "web", "payload columns must survive")

    // weighted sampling without replacement on a user weight column
    val weighted = docs.withColumn("w", org.apache.spark.sql.functions.length($"text"))
    val picked = Graft.weightedSample(weighted, "w", 3).collect()
    assert(picked.length == 3 && picked.map(_.getLong(0)).distinct.length == 3)

    // bloom audit == exact audit on user frames
    val bench = docs.filter($"source" === "books")
    val cand = docs.filter($"source" =!= "books")
    val exact = Graft.contamination(cand, bench).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bloom = Graft.contaminationBloom(cand, bench).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bloom == exact)

    // histogram rollup serving on a user frame
    val vals = Seq(("a", 1, 5.0), ("a", 2, 15.0), ("a", 1, 25.0), ("b", 1, 5.0)).toDF("g", "cell", "v")
    val hist = Graft.mergeHistograms(
      Graft.buildHistograms(vals, Seq("g", "cell"), "v", width = 10.0, nBuckets = 10), Seq("g"), 10.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(hist("a") == ((3L, 15.0)) && hist("b") == ((1L, 5.0)), s"got $hist")

    // NB classification on a user label column
    val labeled = docs.withColumn("label",
      org.apache.spark.sql.functions.when($"source" === "books", "b").otherwise("w"))
    val preds = Graft.nbClassify(labeled, "label").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds.size == 5 && preds(3L) == "b" && preds(1L) == "w", s"got $preds")
    intercept[IllegalArgumentException] { Graft.nbClassify(docs, "label") }

    // equi-depth binning on a user frame: every row bucketed, buckets span 1..2
    val binned = Graft.equidepthBins(docs.withColumn("w",
      org.apache.spark.sql.functions.length($"text")), Seq.empty[String] :+ "source", "w", 2)
    assert(binned.count() == 5 && binned.select("bucket").distinct().count() <= 2)

    // bootstrap on a user value column: deterministic replicate stats
    val bs = Graft.bootstrapStats(docs.withColumn("w",
      org.apache.spark.sql.functions.length($"text")), "w", 5).collect()
    assert(bs.length == 5)
    intercept[IllegalArgumentException] { Graft.bootstrapStats(docs, "w", 5) }
  }

  test("round-5c facade: skyline, cumsum, MMR, KN model, manifest skip on user frames") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}

    // skyline on a constructed points frame
    val sky = Graft.skyline(Seq(
        (1L, 1.0, 1), (2L, 2.0, 5), (3L, 3.0, 3), (4L, 1.5, 5))
      .toDF("p_partkey", "p_retailprice", "p_size"))
      .collect().map(_.getLong(0)).toSet
    // 3 dominated by 4 (cheaper, bigger); 2 dominated by 4 (same size, cheaper)
    assert(sky == Set(1L, 4L), s"got $sky")
    intercept[IllegalArgumentException] { Graft.skyline(docs) }

    // distributed cumsum on a user frame
    val cum = Graft.distributedCumSum(
      Seq(("x", 3L), ("y", 1L), ("z", 2L)).toDF("k", "v"),
      Seq(col("v").desc, col("k")), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(cum == Map("x" -> 3L, "z" -> 5L, "y" -> 6L), s"got $cum")

    // MMR on constructed vectors: two candidates clustered at +45 deg of the query,
    // one at -45 deg — relevance alone keeps the cluster, MMR must cross to -45
    val corpus = Seq(
      (10L, Array(0.8f, 0.6f)), (11L, Array(0.7071f, 0.7071f)),
      (20L, Array(0.7071f, -0.7071f))).toDF("vec_id", "embedding")
    val queries = Seq((0L, Array(1f, 0f))).toDF("query_id", "embedding")
    val picks = Graft.mmrTopK(corpus, queries, nCand = 3, k = 2, lam = 0.5)
      .collect().map(_.getLong(2))
    // top-2 by pure relevance is (10, 11); MMR swaps 11 for the diverse 20
    assert(picks.toSeq == Seq(10L, 20L), s"got ${picks.toSeq}")

    // KN model on a user pair frame: probabilities positive, every pair scored
    val kn = Graft.knBigramModel(Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("w1", "w2"))
    assert(kn.count() == 3 && kn.collect().forall(_.getDouble(2) > 0))

    // manifest-skip round trip on a user frame
    val dir = java.nio.file.Files.createTempDirectory("api_manifest").toFile
      .getAbsolutePath + "/t"
    Graft.writeWithManifest((1L to 100L).map(i => (i, s"r$i")).toDF("id", "s"),
      dir, Seq("id"), numFiles = 5)
    val pruned = Graft.readPruned(spark, dir, "id", lit(10L), lit(20L))
    assert(pruned.count() == 11 && pruned.inputFiles.length < 5)
  }

  test("dedupeBy keeps the highest-priority representative per duplicate cluster") {
    import spark.implicits._
    // doc 1/2/4 are the near/exact-dup cluster (see `docs`); give 2 the best quality
    val scored = docs.withColumn("quality",
      org.apache.spark.sql.functions.when($"doc_id" === 2L, 9.0).otherwise(1.0))
    val kept = Graft.dedupeBy(scored, "quality", threshold = 0.8)
    assert(kept.columns.toSeq == Seq("doc_id", "text", "source", "quality"))
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 3L, 5L), s"got $ids")
    // min-id tie-break when priorities are equal: same clusters, all priority 1.0
    val tied = Graft.dedupeBy(docs.withColumn("quality",
      org.apache.spark.sql.functions.lit(1.0)), "quality", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tied == Set(1L, 3L, 5L), s"got $tied")
  }

  test("round-5d facade: geo join, k-means, OLS, SES, rolling corr, text signals") {
    import spark.implicits._
    import java.sql.Date

    // geo: two points 0.5 km apart match at 1 km radius; an antipodal-ish one doesn't
    val left = Seq((1L, 10.0, 20.0), (2L, -40.0, 130.0)).toDF("id", "lat", "lon")
    val right = Seq((7L, 10.004, 20.0), (8L, 52.0, -60.0)).toDF("sid", "slat", "slon")
    val pairs = Graft.geoRadiusJoin(left, right, 1.0, maxAbsLat = 60.0)
      .select("id", "sid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 7L)))

    // k-means: two tight blobs, k=2 -> the blobs are the clusters
    val blob = (0 until 30).map { i =>
      val base = if (i % 2 == 0) 0.1f else 0.9f
      (i.toLong, Array(base + i * 1e-4f, base - i * 1e-4f))
    }
    val asg = Graft.kmeansAssign(blob.toDF("vec_id", "embedding"), k = 2, rounds = 2)
      .select("vec_id", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val byParity = asg.groupBy(_._1 % 2).map { case (p, g) => p -> g.map(_._2).toSet }
    assert(byParity(0L).size == 1 && byParity(1L).size == 1 && byParity(0L) != byParity(1L))

    // OLS facade on exact-plan points
    val pts = (1 to 200).map(i => (i.toLong % 17, i.toLong % 11, 5 + 2 * (i % 17) + 3 * (i % 11)))
      .map { case (a, b, y) => (a, b, y.toLong) }
    val fit = Graft.ols2(pts.toDF("x1", "x2", "y")).collect().head
    assert(math.abs(fit.getDouble(1) - 5.0) < 1e-6 && math.abs(fit.getDouble(2) - 2.0) < 1e-6
      && math.abs(fit.getDouble(3) - 3.0) < 1e-6)

    // SES + rolling corr run on user frames with the documented schemas
    val daily = (1 to 10).map(d => ("k", Date.valueOf(f"2024-05-$d%02d"), d.toLong * 3))
      .toDF("event_type", "day", "cnt")
    assert(Graft.sesForecast(daily).count() == 10)
    val xy = (1 to 10).map(d => (Date.valueOf(f"2024-05-$d%02d"), d.toLong, 11L - d))
      .toDF("day", "x", "y")
    val rc = Graft.rollingCorr(xy).collect()
    assert(rc.length == 10 && math.abs(rc.last.getDouble(3) - (-1.0)) < 1e-9)

    // text signals
    val docs = Seq((1L, "one two three."), (2L, "aaa " * 50)).toDF("doc_id", "text")
    assert(Graft.readability(docs).count() == 2)
    val cs = Graft.compressionSignal(docs).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(cs(2L) < cs(1L)) // repetition compresses harder
  }

  test("equidepthBinsApprox tracks the exact binning within sketch tolerance") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 4000).map(i => ("g", rnd.nextGaussian() * 10 + 50)).toDF("k", "v")
    val approx = Graft.equidepthBinsApprox(df, Seq("k"), "v", 4)
    val counts = approx.groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(1, 2, 3, 4), s"got ${counts.keySet}")
    // equi-depth within t-digest tolerance: each bucket within 15% of n/4
    counts.values.foreach(c => assert(math.abs(c - 1000L) < 150, s"bucket sizes $counts"))
  }
}
