package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators over a document corpus.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup is a hash groupBy — one shuffle on the content hash;
  *  - near-dup goes through MinHash-LSH: shingle → k-minhash signature →
  *    band hashes → self-join on (band, hash) buckets. Work is O(rows ×
  *    bucket_size), NEVER an all-pairs cross join; candidate pairs are
  *    then verified with exact Jaccard on the shingle sets.
  *  - pathological buckets (thousands of identical docs) should be capped
  *    or pre-collapsed by exact dedup first — exact dedup before LSH is
  *    the recommended pipeline order.
  */
object Dedup {

  /** Per-group exact-duplicate stats via content hash (md5 — engine
    * portable). */
  def exactStats(docs: DataFrame, textCol: String, groupCol: String): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("total"),
        countDistinct(md5(col(textCol).cast("binary"))).as("uniq_text"),
        countDistinct(substring(col(textCol), 1, 40)).as("uniq_prefix"))
      .orderBy(col(groupCol))

  /** Keep the lowest-id row per normalized key (here: 40-char prefix).
    * The window partitions by the key — bucket sizes are duplicate-group
    * sizes, which stay small after exact dedup. */
  def keepFirstByKey(docs: DataFrame, idCol: String, key: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
  }

  /** MinHash signature as k wide columns via explode + k codegen'd MIN
    * aggregates — one hash aggregate with map-side partial combine, no
    * interpreted higher-order lambdas (those evaluate per-element on the
    * interpreted path and were the 10× cost in the first cut). */
  private def minhashWide(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int): DataFrame = {
    val shingled = docs.select(col(idCol).as("id"),
      explode(TextOps.wordShingles(col(textCol), shingleN)).as("s"))
    val aggs = (0 until k).map(j => min(xxhash64(col("s"), lit(j))).as(s"h$j"))
    shingled.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: ids sharing at least one of `bands` band-hashes
    * of a k-value MinHash signature (k = bands * rowsPerBand). Band width
    * r = k/bands trades recall for candidate noise: r=4 keeps the
    * accidental-collision rate at sim s down to s^4 per band, which is
    * what keeps bucket sizes sane as the corpus grows.
    *
    * `maxBucket` is the skew guard: a band bucket larger than it is
    * dropped BEFORE the self-join (a bucket of b identical docs is O(b²)
    * pairs — 10⁵ un-collapsed exact duplicates would be 10¹⁰ candidate
    * rows). Legit near-dup groups are orders of magnitude smaller; a
    * bucket that big means exact-dedup was skipped, and those pairs are
    * exact duplicates better handled by `exactStats`/`keepFirstByKey`.
    * The count runs in the same shuffle the join needs — no extra pass. */
  def lshCandidates(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      maxBucket: Int = 4096): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val r = k / bands
    val sig = minhashWide(docs, idCol, textCol, shingleN, k)
    val bandCols = (0 until bands).map(b =>
      xxhash64((lit(b) +: (0 until r).map(i => col(s"h${b * r + i}"))): _*))
    val banded = sig
      .select(col("id"), posexplode(array(bandCols: _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
    val capped = banded
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("__bsz") <= maxBucket)
      .drop("__bsz")
    val left = capped.select(col("id").as("id_a"), col("band"), col("bh"))
    val right = capped.select(col("id").as("id_b"), col("band"), col("bh"))
    left.join(right, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates verified with exact Jaccard on
    * the distinct shingle sets. The threshold compare is exact integer
    * math (`den*|∩| >= num*|∪|`), the reported sim a single double
    * division — deterministic across engines. */
  def nearDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      thresholdNum: Int = 1, thresholdDen: Int = 2,
      maxBucket: Int = 4096): DataFrame = {
    val cands = lshCandidates(docs, idCol, textCol, shingleN, k, bands, maxBucket)
    // shingle arrays rebuilt only along the (small) candidate join — one
    // pass over docs per side, no cache needed
    val sh = docs.select(col(idCol).as("id"),
      TextOps.wordShingles(col(textCol), shingleN).as("sh"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val uni = size(array_union(col("sh_a"), col("sh_b")))
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("__inter", inter).withColumn("__uni", uni)
      .filter(col("__inter") * thresholdDen >= col("__uni") * thresholdNum)
      .select(col("id_a"), col("id_b"),
        (col("__inter").cast("double") / col("__uni")).as("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** 64-bit SimHash per doc via explode + 64 codegen'd conditional-sum
    * aggregates (same no-lambda design as minhashWide), packed into one
    * long by a projection. Features are 3-word shingles, not single
    * tokens — bag-of-words features make every same-domain doc hash
    * near-identical (giant buckets); shingles are order-sensitive and
    * separate non-duplicates. */
  def simhashWide(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"),
        explode(TextOps.wordShingles(col(textCol), 3)).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val aggs = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1L) === 1L, 1).otherwise(-1)).as(s"b$j"))
    tok.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        (0 until 64).map(j =>
          when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _).as("simhash"))
  }

  /** SimHash near-duplicates: banded into eight 8-bit chunks — by
    * pigeonhole two docs within hamming distance 7 share at least one
    * chunk exactly, and noisier pairs are still caught with high
    * probability; candidates verified by exact hamming distance. */
  def simhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 7, maxBucket: Int = 4096): DataFrame = {
    val hashed = simhashWide(docs, idCol, textCol)
    val chunkCols = (0 until 8).map(i =>
      shiftright(col("simhash"), i * 8).bitwiseAND(0xFFL))
    val chunked = hashed.select(col("id"), col("simhash"),
      posexplode(array(chunkCols: _*)))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "cv"))
      // same skew guard as lshCandidates: an over-cap chunk bucket (mass
      // exact duplicates) would be O(bucket²) in the self-join below
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy(col("chunk"), col("cv"))))
      .filter(col("__bsz") <= maxBucket)
      .drop("__bsz")
    val left = chunked.select(col("id").as("id_a"), col("simhash").as("sh_a"), col("chunk"), col("cv"))
    val right = chunked.select(col("id").as("id_b"), col("simhash").as("sh_b"), col("chunk"), col("cv"))
    // filter on hamming BEFORE distinct: same-domain corpora produce very
    // similar simhashes, so chunk buckets can be large — the cheap bitwise
    // filter prunes the candidate stream, the distinct then runs on the
    // few surviving pairs
    left.join(right, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextOps.hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }
}
