package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** Constructed-data checks for the text-curation operators whose oracle runs on the
  * documents table — these pin the SEMANTICS (what gets redacted/normalized/counted)
  * on inputs chosen to hit the edges the synthetic corpus may not contain. */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("PII scrub redacts emails, phones, and IPs and counts each") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob.smith+spam@example.co.uk or 555-123-4567 now"),
      (2L, "server at 10.0.0.1 and 192.168.1.255; mail root@host.org"),
      (3L, "no pii here at all"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs).orderBy("doc_id").collect()
    assert(got(0).getInt(1) == 1 && got(0).getInt(2) == 1 && got(0).getInt(3) == 0)
    assert(got(0).getString(4) == "contact [EMAIL] or [PHONE] now")
    assert(got(1).getInt(1) == 1 && got(1).getInt(3) == 2)
    assert(got(1).getString(4) == "server at [IP] and [IP]; mail [EMAIL]")
    assert(got(2).getString(4) == "no pii here at all")
    assert(got(3).isNullAt(4), "null text must stay null, not become a redaction")
  }

  test("counts reconcile with inserted tokens: no phantom counts inside redacted spans") {
    import spark.implicits._
    // the IP-shaped host lives INSIDE the email match: after [EMAIL] replacement there is
    // no IP left to redact, so n_ips must be 0 (a phantom 1 would break count auditing)
    val got = TextAnalysis.piiScrub(
      Seq((1L, "mail admin@10.0.0.1.com now")).toDF("doc_id", "text")).collect().head
    assert(got.getString(4) == "mail [EMAIL] now")
    assert(got.getInt(1) == 1 && got.getInt(3) == 0,
      s"n_ips must count inserted [IP] tokens only: $got")
  }

  test("phone redaction wins over the looser IP pattern (ordering contract)") {
    import spark.implicits._
    // 555.123.4567 is both phone-shaped and (loosely) IP-shaped; the documented
    // order scrubs phones first so it must surface as [PHONE].
    val got = TextAnalysis.piiScrub(Seq((1L, "call 555.123.4567 ok")).toDF("doc_id", "text"))
      .collect().head
    assert(got.getString(4) == "call [PHONE] ok")
  }

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    import spark.implicits._
    val got = TextAnalysis.normalize(
      Seq((1L, "  Hello,   WORLD!!  it's 42\tdegrees  ")).toDF("doc_id", "text"))
      .collect().head.getString(1)
    assert(got == "hello world it s 42 degrees")
  }

  test("chunk emits overlapping token windows; short docs one chunk; no shuffle") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than a chunk
      (3L, null.asInstanceOf[String])                 // null text -> no chunks
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, chunkSize = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6,9: windows of 4 tokens, last one truncated
    assert(d1.map(_._4).toSeq == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"),
      s"got ${d1.toSeq}")
    assert(d1.map(_._3).toSeq == Seq(4, 4, 4, 1), "n_chunk_tokens tracks truncation")
    // consecutive chunks overlap by chunkSize - stride = 1 token
    assert(d1(0)._4.split(' ').last == d1(1)._4.split(' ').head)
    assert(got.filter(_._1 == 2L).map(_._4).toSeq == Seq("a b"))
    assert(!got.exists(_._1 == 3L), "null text must produce no chunks")
    val plan = TextAnalysis.chunk(docs, 4, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must be map-only:\n$plan")
  }

  test("perplexity: common-token docs score lower than rare-token docs; all docs visible") {
    import spark.implicits._
    // "the cat" tokens are frequent (appear in 3 docs); doc 4's tokens are hapaxes.
    val docs = Seq(
      (1L, "the cat the cat"),
      (2L, "the cat sat"),
      (3L, "the cat ran"),
      (4L, "zyx wvu tsr"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.perplexityScores(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), Option(r.get(2)).map(_ => r.getDouble(2))))).toMap

    assert(got.size == 5, "every doc appears, including the null-text one")
    assert(got(5L) == ((0, None)), "token-less doc reports 0 tokens / null score")
    assert(got(1L)._2.get < got(4L)._2.get,
      s"frequent-token doc must score below hapax doc: ${got(1L)} vs ${got(4L)}")
    // doc 4: every token count 1, N = 13 tokens -> xent = ln(13) exactly
    assert(math.abs(got(4L)._2.get - math.log(13)) < 1e-3, s"hapax doc xent: ${got(4L)}")
  }

  test("dsir: docs resembling the target slice outrank off-target docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // target docs 1-2 speak "aa bb"; doc 4 speaks the target language without being in
    // the target; doc 5 speaks tokens the target never uses; doc 6 has no text.
    val docs = Seq(
      (1L, "aa bb aa", true),
      (2L, "bb aa bb", true),
      (3L, "aa zz", false),
      (4L, "aa bb", false),
      (5L, "zz yy zz yy", false),
      (6L, null.asInstanceOf[String], false)
    ).toDF("doc_id", "text", "tgt")
    val got = TextAnalysis.dsirScores(docs, col("tgt")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(!got.contains(6L), "token-less docs have no tokens to score")
    assert(got(4L)._2 > got(5L)._2, s"target-alike must outrank off-target: $got")
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(5L)._2, s"mixed doc ranks between: $got")
    // hand check doc 5: tokens zz (c_all=3? no: zz appears in docs 3,5,5 -> c_all=3, c_tgt=0)
    // and yy (c_all=2, c_tgt=0); N_all=14, N_tgt=6, V=4
    val pT = (t: Long) => math.log((t + 1.0) / (6 + 4.0))
    val pC = (c: Long) => math.log((c + 1.0) / (14 + 4.0))
    val want5 = ((pT(0) - pC(3)) * 2 + (pT(0) - pC(2)) * 2) / 4
    assert(math.abs(got(5L)._2 - (math.rint(want5 * 1e4) / 1e4)) < 1e-9,
      s"doc 5 score ${got(5L)._2} vs hand-computed $want5")
  }

  test("vocabCoverage ranks by frequency with monotone cumulative coverage") {
    import spark.implicits._
    // 10 tokens total: a x4, b x3, c x2, d x1
    val docs = Seq((1L, "a a b c"), (2L, "a b c d"), (3L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, k = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == Seq((1, "a", 4L), (2, "b", 3L), (3, "c", 2L)))
    assert(got.map(_._4).toSeq == Seq(0.4, 0.7, 0.9), s"coverage: ${got.toSeq}")
  }

  test("topBigrams counts corpus-wide with deterministic tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"), // "a b" x2, "b a" x1, "b c" x1
      (2L, "a b z"),     // "a b" x1, "b z" x1
      (3L, "solo")       // no bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topBigrams(docs, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)),
      s"expected count-desc then lexicographic ties, got $got")
  }

  test("BPE trainer learns the planted dominant pair first; matches the reference replay") {
    import spark.implicits._
    import graft.pipeline.BpeTrainer
    // Sennrich's textbook shape: 'er' is the most frequent adjacent char pair
    // (newer x3 + wider x2 = support 5)
    val docs = Seq(
      (1L, "newer newer newer wider"),
      (2L, "wider low")
    ).toDF("doc_id", "text")
    val rules = BpeTrainer.bpeTrain(docs, numMerges = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rules.head == ((1, "e", "r", "er", 5L)), s"got ${rules.head}")
    assert(rules.map(_._1).toSeq == (1 to rules.length), "ranks dense from 1")

    // full parity with the in-memory reference on the same word-count table
    val wordCounts = Seq("newer" -> 3L, "wider" -> 2L, "low" -> 1L)
      .sortBy { case (w, c) => (-c, w) }
    val ref = BpeTrainer.mergeLoop(wordCounts, 6)
    assert(rules.toSeq == ref, s"spark path diverged from reference:\n$ref\nvs\n${rules.toSeq}")

    // determinism across runs
    val again = BpeTrainer.bpeTrain(docs, numMerges = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(again.sameElements(rules))

    // vocabCap bounds what the loop sees: cap 1 -> only "newer"'s pairs exist
    val capped = BpeTrainer.bpeTrain(docs, numMerges = 2, vocabCap = 1).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(capped.head == (("e", "r", 3L)), s"got ${capped.head}")

    // merges exhaust gracefully below numMerges (short corpus, many merges requested)
    val tiny = BpeTrainer.bpeTrain(Seq((1L, "ab")).toDF("doc_id", "text"), numMerges = 50)
    assert(tiny.count() == 1, "one possible merge in a 2-char corpus")
  }

  test("BPE encoder reproduces training segmentation and handles unseen words") {
    import spark.implicits._
    import graft.pipeline.BpeTrainer
    val docs = Seq(
      (1L, "newer newer newer wider"),
      (2L, "wider low")
    ).toDF("doc_id", "text")
    val rules = BpeTrainer.bpeTrain(docs, numMerges = 6)
    val ranks = rules.collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap

    // encoding a training word yields the training loop's final segmentation for it:
    // replay mergeLoop on the training table and read off each word's end state
    var seqs = Seq("newer" -> 3L, "wider" -> 2L, "low" -> 1L)
      .map { case (w, c) => (w, w.map(_.toString).toArray, c) }
    BpeTrainer.mergeLoop(Seq("newer" -> 3L, "wider" -> 2L, "low" -> 1L), 6)
      .foreach { case (_, l, r, m, _) =>
        seqs = seqs.map { case (w, s, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += m; i += 2 }
            else { out += s(i); i += 1 }
          }
          (w, out.toArray, c)
        }
      }
    seqs.foreach { case (w, expected, _) =>
      val got = BpeTrainer.encodeWord(w, ranks)
      assert(got.sameElements(expected), s"$w: ${got.toSeq} vs ${expected.toSeq}")
    }

    // unseen word: known merges apply, the rest stays as characters — never throws
    assert(BpeTrainer.encodeWord("lower", ranks).nonEmpty)
    assert(BpeTrainer.encodeWord("xyz", Map.empty).toSeq == Seq("x", "y", "z"))

    // distributed kernel: n_tokens is the sum of per-word encoded lengths
    val enc = BpeTrainer.bpeEncode(docs, rules).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val lenOf = seqs.map { case (w, s, _) => w -> s.length }.toMap
    assert(enc(1L)._1 == 3 * lenOf("newer") + lenOf("wider"), s"got ${enc(1L)}")
    assert(enc(2L)._1 == lenOf("wider") + lenOf("low"))
    // null/empty docs stay visible with zero counts
    val nulls = BpeTrainer.bpeEncode(
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"), rules).collect()
    assert(nulls.head.getLong(1) == 0L && nulls.head.getLong(2) == 0L)
  }

  test("naive Bayes recovers class-distinctive vocabulary; prior breaks unseen-token docs") {
    import spark.implicits._
    // two classes with disjoint signature tokens plus shared filler; class "a" has more
    // training docs, so a doc of only-unseen tokens must fall back to the "a" prior
    val docs = Seq(
      (1L, "apfel birne apfel und", "de"),
      (2L, "birne apfel und und", "de"),
      (3L, "apple pear apple and", "en"),
      (4L, "pear apple and and", "en"),
      (5L, "apple and pear pear", "en"),
      (6L, "apfel und birne", "de"),
      (7L, "zzz qqq", "de") // unseen-signature doc, still labeled for training size only
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.nbScores(docs, "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 7)
    assert(got(1L) == "de" && got(2L) == "de" && got(6L) == "de")
    assert(got(3L) == "en" && got(4L) == "en" && got(5L) == "en")
    // determinism
    val again = TextAnalysis.nbScores(docs, "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == again)
    // null text / null label rows are excluded from train AND score
    val withNull = docs.union(Seq((8L, null.asInstanceOf[String], "de")).toDF("doc_id", "text", "lang"))
    assert(TextAnalysis.nbScores(withNull, "lang").count() == 7)
  }
}
