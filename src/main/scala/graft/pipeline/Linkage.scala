package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StringFunctions.jaroWinkler
import graft.sources.TableIO

/**
 * Record linkage / entity resolution: match dirty observations to a clean master table
 * by blocked fuzzy string comparison — the classic Fellegi-Sunter pipeline shape, and a
 * core curation op (merging crawl snapshots, linking metadata catalogs, deduplicating
 * near-identical records whose keys don't line up).
 *
 * Plan shape (and why it survives 100 TB):
 *   - NO cross join ever: candidate generation is an equi-join on a blocking key, so the
 *     pair space is Σ |clean_block| × |dirty_block|, bounded by block design, not n².
 *     A skewed block is a skewed join key — AQE skew-split or salting applies unchanged.
 *   - scoring is the native codegen `jaro_winkler` expression (one static call inside
 *     whole-stage codegen; Spark ships no fuzzy comparator beyond levenshtein).
 *   - best-match-per-record is a rank<=1 window that RankLimitRule rewrites onto the
 *     native TopKPerKey pre-limit — no full sort of the candidate table.
 *   - the clean side is typically a dimension (catalog); at real scale Spark's AQE
 *     broadcasts it into the block join automatically.
 */
object Linkage {

  /**
   * For each dirty record, the single best clean match in its block at or above
   * `threshold` (Jaro-Winkler, rounded to 6 decimals; ties broken by smallest clean id).
   *
   * `clean`: (id, name, block); `dirty`: (id, name, block). Returns
   * (dirty_id, dirty_name, clean_id, clean_name, score6), one row per matched dirty id.
   */
  def linkRecords(clean: DataFrame, dirty: DataFrame, threshold: Double): DataFrame = {
    val c = clean.select(col("id").as("clean_id"), col("name").as("clean_name"), col("block"))
    val d = dirty.select(col("id").as("dirty_id"), col("name").as("dirty_name"), col("block"))
    val scored = d.join(c, "block")
      .withColumn("score6", round(jaroWinkler(col("dirty_name"), col("clean_name")), 6))
      .filter(col("score6") >= threshold)
    // rank<=1 rides RankLimitRule -> native TopKPerKey (no global candidate sort)
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dirty_id")).orderBy(col("score6").desc, col("clean_id"))))
      .filter(col("rn") === 1)
      .select(col("dirty_id"), col("dirty_name"), col("clean_id"), col("clean_name"), col("score6"))
  }

  /**
   * Driver query: link every part row, observed with a deterministic corruption (last
   * character of the adjective dropped — "small ring" → "smal ring"), back to the clean
   * name catalog (distinct p_name, canonical id = min p_partkey). Block = the noun token,
   * so candidates are the ~8 catalog names per noun, never the full catalog.
   * Fully SQL-expressible, so the DuckDB oracle replays the whole pipeline including
   * `jaro_winkler_similarity` (the expression's semantics twin).
   */
  def qRecordLinkage(spark: SparkSession, dir: String): DataFrame = {
    val p = TableIO.part(spark, dir).select(col("p_partkey"), col("p_name"))
    val adj = substring_index(col("p_name"), " ", 1)
    val noun = substring_index(col("p_name"), " ", -1)
    val clean = p.groupBy(col("p_name")).agg(min(col("p_partkey")).as("id"))
      .select(col("id"), col("p_name").as("name"), substring_index(col("p_name"), " ", -1).as("block"))
    val dirty = p.select(col("p_partkey").as("id"),
      concat(adj.substr(lit(1), length(adj) - 1), lit(" "), noun).as("name"),
      noun.as("block"))
    linkRecords(clean, dirty, threshold = 0.8)
      .select(col("dirty_id").as("p_partkey"), col("dirty_name").as("obs_name"),
        col("clean_id").as("cat_id"), col("clean_name").as("cat_name"), col("score6"))
      .orderBy(col("p_partkey"))
  }

  val qRecordLinkageSql: String =
    """WITH clean AS (
      |  SELECT min(p_partkey) AS cat_id, p_name AS cat_name,
      |         split_part(p_name, ' ', 2) AS block
      |  FROM part GROUP BY p_name
      |), dirty AS (
      |  SELECT p_partkey,
      |         substr(split_part(p_name, ' ', 1), 1, length(split_part(p_name, ' ', 1)) - 1)
      |           || ' ' || split_part(p_name, ' ', 2) AS obs_name,
      |         split_part(p_name, ' ', 2) AS block
      |  FROM part
      |), scored AS (
      |  SELECT d.p_partkey, d.obs_name, c.cat_id, c.cat_name,
      |         round(jaro_winkler_similarity(d.obs_name, c.cat_name), 6) AS score6
      |  FROM dirty d JOIN clean c USING (block)
      |), best AS (
      |  SELECT *, row_number() OVER (PARTITION BY p_partkey
      |                               ORDER BY score6 DESC, cat_id) AS rn
      |  FROM scored WHERE score6 >= 0.8
      |)
      |SELECT p_partkey, obs_name, cat_id, cat_name, score6
      |FROM best WHERE rn = 1
      |ORDER BY p_partkey""".stripMargin

  /**
   * Edit-distance (Levenshtein) banded similarity join — the absolute-threshold
   * complement to the Jaro-Winkler ratio matcher above. Standard banding applies: a
   * length-difference pre-filter (|len(a)-len(b)| <= d implies nothing is lost) runs
   * as a cheap codegen predicate BEFORE the O(len²) DP comparator, and Spark's
   * `levenshtein(l, r, threshold)` early-exits rows that blow the band. Candidates
   * still come from the equi-join on the blocking key — never a cross join.
   */
  def editDistJoin(clean: DataFrame, dirty: DataFrame, maxDist: Int): DataFrame = {
    val c = clean.select(col("id").as("clean_id"), col("name").as("clean_name"), col("block"))
    val d = dirty.select(col("id").as("dirty_id"), col("name").as("dirty_name"), col("block"))
    val scored = d.join(c, "block")
      .filter(abs(length(col("dirty_name")) - length(col("clean_name"))) <= maxDist)
      .withColumn("dist", levenshtein(col("dirty_name"), col("clean_name")))
      .filter(col("dist") <= maxDist)
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dirty_id")).orderBy(col("dist"), col("clean_id"))))
      .filter(col("rn") === 1)
      .select(col("dirty_id"), col("dirty_name"), col("clean_id"), col("clean_name"), col("dist"))
  }

  /**
   * `q_editdist_join`: the part catalog observed with the adjective's FIRST character
   * dropped ("small ring" → "mall ring"), matched back by bounded edit distance within
   * the noun block. DuckDB's `levenshtein` is the oracle twin.
   */
  def qEditdistJoin(spark: SparkSession, dir: String): DataFrame = {
    val p = TableIO.part(spark, dir).select(col("p_partkey"), col("p_name"))
    val adj = substring_index(col("p_name"), " ", 1)
    val noun = substring_index(col("p_name"), " ", -1)
    val clean = p.groupBy(col("p_name")).agg(min(col("p_partkey")).as("id"))
      .select(col("id"), col("p_name").as("name"), substring_index(col("p_name"), " ", -1).as("block"))
    val dirty = p.select(col("p_partkey").as("id"),
      concat(adj.substr(lit(2), length(adj) - 1), lit(" "), noun).as("name"),
      noun.as("block"))
    editDistJoin(clean, dirty, maxDist = 2)
      .select(col("dirty_id").as("p_partkey"), col("dirty_name").as("obs_name"),
        col("clean_id").as("cat_id"), col("clean_name").as("cat_name"), col("dist"))
      .orderBy(col("p_partkey"))
  }

  val qEditdistJoinSql: String =
    """WITH clean AS (
      |  SELECT min(p_partkey) AS cat_id, p_name AS cat_name,
      |         split_part(p_name, ' ', 2) AS block
      |  FROM part GROUP BY p_name
      |), dirty AS (
      |  SELECT p_partkey,
      |         substr(split_part(p_name, ' ', 1), 2)
      |           || ' ' || split_part(p_name, ' ', 2) AS obs_name,
      |         split_part(p_name, ' ', 2) AS block
      |  FROM part
      |), scored AS (
      |  SELECT d.p_partkey, d.obs_name, c.cat_id, c.cat_name,
      |         levenshtein(d.obs_name, c.cat_name) AS dist
      |  FROM dirty d JOIN clean c USING (block)
      |  WHERE abs(length(d.obs_name) - length(c.cat_name)) <= 2
      |), best AS (
      |  SELECT *, row_number() OVER (PARTITION BY p_partkey
      |                               ORDER BY dist, cat_id) AS rn
      |  FROM scored WHERE dist <= 2
      |)
      |SELECT p_partkey, obs_name, cat_id, cat_name, CAST(dist AS INT) AS dist
      |FROM best WHERE rn = 1
      |ORDER BY p_partkey""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_record_linkage" -> (qRecordLinkage(_, _)),
    "q_editdist_join" -> (qEditdistJoin(_, _)))

  val oracles: Map[String, String] = Map(
    "q_record_linkage" -> qRecordLinkageSql,
    "q_editdist_join" -> qEditdistJoinSql)
}
