package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Approximate heavy hitters (SpaceSaving, Metwally et al. ICDT'05) — the bounded-memory
 * scale path next to the exact corpus top-k (`text_topgrams`): at 100 TB the exact path
 * shuffles one row per DISTINCT bigram (fine but corpus-dependent), while the sketch
 * bounds per-task state at `capacity` counters and ships exactly `capacity` rows per
 * partition REGARDLESS of corpus cardinality — DuckDB's approx_top_k / Druid's
 * frequent-items analog, which Spark itself lacks.
 *
 * Shape: one map-only pass builds a per-partition SpaceSaving summary (typed
 * mapPartitions, a HashMap of at most `capacity` counters); summaries merge by
 * summed-count groupBy (map-side combined, ≤ capacity x partitions rows) and a
 * TakeOrdered top-k. Guarantees surviving the merge (union bound over partitions):
 * every item with true count > N/capacity is PRESENT, and for each reported item
 * est - err <= true count <= est. Approximate counts by design -> rows-only for the
 * driver; HeavyHittersSpec proves presence + error-bound + exactness-when-unsaturated
 * against the exact counts.
 */
object HeavyHitters {

  /** Incrementally-updatable SpaceSaving sketch: at most `capacity` (est, err)
    * counters; est overestimates the true count by at most err. Eviction replaces the
    * min-est counter (ties to the lexicographically smallest item — deterministic);
    * the min is tracked by a LAZY heap (stale entries discarded at pop, heap compacted
    * at 4x capacity) so a near-uniform stream — the all-evict worst case — costs
    * O(log capacity) per item, not O(capacity). `seed` restores a previously exported
    * summary, which is what lets the STREAMING form carry the sketch across
    * micro-batches as keyed state (StreamingTopK). */
  private[graft] final class SpaceSavingSketch(capacity: Int,
      seed: Iterable[(String, (Long, Long))] = Nil) {
    private val counters = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    // dequeue must yield (min est, then min item): reverse of the natural max-ordering
    private implicit val ord: Ordering[(Long, String)] =
      Ordering.Tuple2(Ordering.Long, Ordering.String).reverse
    private var heap = scala.collection.mutable.PriorityQueue.empty[(Long, String)]
    seed.foreach { case (item, (est, err)) => counters(item) = (est, err); push(est, item) }

    private def push(est: Long, item: String): Unit = {
      heap.enqueue((est, item))
      if (heap.size > 4 * capacity) { // compact: rebuild from the live counters only
        heap = scala.collection.mutable.PriorityQueue.empty[(Long, String)]
        counters.foreach { case (k, (e, _)) => heap.enqueue((e, k)) }
      }
    }

    def add(x: String): Unit = counters.get(x) match {
      case Some((est, err)) =>
        counters(x) = (est + 1, err); push(est + 1, x)
      case None if counters.size < capacity =>
        counters(x) = (1L, 0L); push(1L, x)
      case None =>
        // discard stale heap entries (superseded est, or evicted item) at pop time
        var top = heap.dequeue()
        while (!counters.get(top._2).exists(_._1 == top._1)) top = heap.dequeue()
        val (minEst, minItem) = top
        counters.remove(minItem)
        counters(x) = (minEst + 1, minEst)
        push(minEst + 1, x)
    }

    def summary: Map[String, (Long, Long)] = counters.toMap
  }

  /** Per-partition SpaceSaving pass: (item, est, err) rows, at most `capacity` per
    * partition. */
  private[graft] def spaceSaving(it: Iterator[String], capacity: Int)
      : Iterator[(String, Long, Long)] = {
    val sk = new SpaceSavingSketch(capacity)
    it.foreach(sk.add)
    sk.summary.iterator.map { case (item, (est, err)) => (item, est, err) }
  }

  /**
   * Top-k items of `items` (single string column) by approximate count:
   * (item, est, err) with est descending, ties by item text. `capacity` counters per
   * partition bound both memory and shuffle width.
   */
  def approxTopK(items: DataFrame, k: Int, capacity: Int): DataFrame = {
    require(k > 0 && capacity >= k, "capacity must be at least k")
    val spark = items.sparkSession
    import spark.implicits._
    items.as[String]
      .mapPartitions(it => spaceSaving(it.filter(_ != null), capacity))
      .toDF("item", "est", "err")
      .groupBy(col("item"))
      .agg(sum(col("est")).as("est"), sum(col("err")).as("err"))
      .orderBy(col("est").desc, col("item"))
      .limit(k)
  }

  /** `text_topgrams_sketch`: approximate top-20 corpus bigrams — the sketch twin of the
    * exact, oracle-checked `text_topgrams`. */
  def textTopgramsSketch(spark: SparkSession, dir: String,
      k: Int = 20, capacity: Int = 4096): DataFrame = {
    val bigrams = TableIO.documents(spark, dir)
      .select(split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))")).as("item"))
    approxTopK(bigrams, k, capacity)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_topgrams_sketch" -> (textTopgramsSketch(_, _, 20, 4096)))

  // rows-only by declared design: counts are approximate (SpaceSaving overestimates);
  // the exact twin text_topgrams carries the hash-matched oracle, HeavyHittersSpec
  // carries the sketch guarantees
  val oracles: Map[String, String] = Map.empty
}
