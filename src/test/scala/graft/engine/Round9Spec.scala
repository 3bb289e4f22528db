package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 semantics: equi-depth theta banding under adversarial
  * (clustered) distributions, theta scalar DISTINCT ON, the NULL-tuple
  * EXISTS-over-DISTINCT-with-OFFSET corners, and the curation guards
  * (negative ids, overflow-safe mixes). */
class Round9Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var engine: Engine = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .appName("round9-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    engine = Engine.forTestdata(spark, dir)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sql(s: String): DataFrame = engine.execute(s)
  private def rows(s: String): Seq[Row] = sql(s).collect().toSeq

  // ---- equi-depth banding math (VERDICT r8 #1) --------------------------

  test("equi-depth bands stay balanced on a 90%-in-1%-of-range cluster") {
    val sp = spark; import sp.implicits._
    // 90 % of values packed into [1000, 1010] (1 % of the range), the
    // rest spread over [0, 1_000_000] — the shape that collapses
    // fixed-width bands into one hot band
    val n = 20000
    val vals = (0 until n).map { i =>
      if (i % 10 < 9) 1000.0 + (i % 997) / 100.0
      else (i.toLong * 104729L % 1000000L).toDouble
    }
    val df = vals.toDF("v")
    val bands = 64
    val probes = (1 until bands).map(_.toDouble / bands)
    val qs = df.agg(percentile_approx(col("v"),
      array(probes.map(lit(_)): _*), lit(1000))).head().getSeq[Double](0)
    val edges = ThetaBanding.edges(qs, vals.min)
    assert(edges.nonEmpty)
    val pops = df.select(ThetaBanding.bandOf(col("v"), edges).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1))
    val uniform = n.toDouble / (edges.length + 1)
    // every band within ~2x of uniform (VERDICT r8 #1's done bar); ties
    // at a single hot VALUE are the only irreducible excess and this
    // fixture spreads the cluster over ~1000 distinct values
    assert(pops.max <= 2.0 * uniform + 1,
      s"hot band ${pops.max} vs uniform $uniform (bands=${edges.length + 1})")
    // and the fixed-width split on the same data would be pathological:
    // the cluster occupies ~1% of the range, i.e. one fixed band would
    // hold >= 90% of all rows — the failure mode this fix removes
    val (mn, mx) = (vals.min, vals.max)
    val width = (mx - mn) / bands
    val hotFixed = vals.groupBy(v => math.min(bands - 1,
      math.floor((v - mn) / width).toInt)).values.map(_.size).max
    assert(hotFixed >= (0.9 * n).toInt)
  }

  test("bandOf is monotone and NULL-safe") {
    val sp = spark; import sp.implicits._
    val edges = IndexedSeq(10.0, 20.0, 30.0)
    val df = Seq[Option[Double]](Some(5), Some(10), Some(15), Some(25),
      Some(30), Some(99), None).toDF("v")
    val got = df.select(ThetaBanding.bandOf(col("v"), edges).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq == Seq(0L, 1L, 1L, 2L, 3L, 3L, null))
  }

  test("theta banded grouped agg is exact over a clustered inner") {
    // clustered inner (80 % of v in [1001, 1051]) driven end-to-end
    // through the engine's EXISTS + GROUP BY + HAVING theta path — the
    // banded-aggregation plan must agree with a brute-force cross join
    sql("drop table if exists r9bt")
    sql("create table r9bt (k Int64, v Float64)")
    sql("""insert into r9bt select l_orderkey % 20,
           case when l_linenumber < 5 then 1000 + l_quantity
                else l_extendedprice * 10 end
           from lineitem""")
    val got = rows("""select c_custkey from customer
        where c_custkey < 500 and exists (
          select 1 from r9bt where v > c_acctbal group by k having count(1) >= 3)
        order by c_custkey""").map(_.getLong(0))
    // brute force in plain Spark over the same data
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select((col("l_orderkey") % 20).as("k"),
        when(col("l_linenumber") < 5, lit(1000) + col("l_quantity"))
          .otherwise(col("l_extendedprice") * 10).cast("double").as("v"))
    val cust = graft.Tables.load(spark, dir, "customer")
      .filter(col("c_custkey") < 500)
      .select(col("c_custkey"), col("c_acctbal"))
    val expect = cust.join(li, col("v") > col("c_acctbal"))
      .groupBy("c_custkey", "k").count()
      .filter(col("count") >= 3)
      .select("c_custkey").distinct()
      .orderBy("c_custkey").collect().map(_.getLong(0))
    assert(got == expect.toSeq)
    sql("drop table if exists r9bt")
  }

  // ---- theta scalar DISTINCT ON (VERDICT r8 #5) -------------------------

  test("theta scalar DISTINCT ON picks the offset-th surviving key group") {
    val got = rows("""select o_orderkey,
        (select distinct on (l_returnflag) l_suppkey from lineitem
         where l_extendedprice > o_totalprice / 2
         order by l_returnflag, l_extendedprice desc, l_suppkey
         limit 1 offset 1) as v
        from orders where o_orderkey < 50 order by o_orderkey""")
    // window-computed expectation in plain Spark
    val li = graft.Tables.load(spark, dir, "lineitem")
    val ords = graft.Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") < 50)
    import org.apache.spark.sql.expressions.Window
    val pairs = ords.join(li,
        col("l_extendedprice") > col("o_totalprice") / 2, "left")
    val w1 = Window.partitionBy("o_orderkey", "l_returnflag")
      .orderBy(col("l_returnflag"), col("l_extendedprice").desc, col("l_suppkey"))
    val w2 = Window.partitionBy("o_orderkey")
      .orderBy(col("l_returnflag"), col("l_extendedprice").desc, col("l_suppkey"))
    val kept = pairs.filter(col("l_orderkey").isNotNull)
      .withColumn("rn1", row_number().over(w1)).filter(col("rn1") === 1)
      .withColumn("rn2", row_number().over(w2)).filter(col("rn2") === 2)
      .select(col("o_orderkey").as("ok2"), col("l_suppkey").as("ev"))
    val expect = ords.join(kept, col("o_orderkey") === col("ok2"), "left")
      .select(col("o_orderkey"), col("ev"))
      .orderBy("o_orderkey").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
    val gotPairs = got.map(r =>
      (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
    assert(gotPairs == expect.toSeq)
  }

  test("theta scalar DISTINCT ON still rejects WITH TIES and missing ORDER BY") {
    assertThrows[Exception](rows("""select o_orderkey,
        (select distinct on (l_returnflag) l_suppkey from lineitem
         where l_extendedprice > o_totalprice / 2 limit 1) as v
        from orders where o_orderkey < 10"""))
  }

  // ---- NULL-tuple DISTINCT counting (ADVICE r8 #1) ----------------------

  test("EXISTS over DISTINCT with OFFSET counts NULL tuples") {
    sql("drop table if exists r9nt")
    sql("create table r9nt (k Int64, x Int64)")
    sql("insert into r9nt values (1, null), (1, 5), (2, 3), (3, null), (3, null)")
    sql("drop table if exists r9no")
    sql("create table r9no (ok Int64)")
    sql("insert into r9no values (1), (2), (3), (4)")
    // equality correlation: {NULL,5} is TWO distinct rows -> survives
    assert(rows("""select ok from r9no where exists (
        select distinct x from r9nt where k = ok limit 100 offset 1)
        order by ok""").map(_.getLong(0)) == Seq(1L))
    // DISTINCT ON (x): NULL is one group; two NULLs collapse
    assert(rows("""select ok from r9no where exists (
        select distinct on (x) x from r9nt where k = ok
        order by x limit 100 offset 1)
        order by ok""").map(_.getLong(0)) == Seq(1L))
    // theta correlation (k > ok-1 and k < ok+1 == equality for ints):
    // the per-row placeholder must not flip any verdict
    assert(rows("""select ok from r9no where exists (
        select distinct x from r9nt where k > ok - 1 and k < ok + 1
        limit 100 offset 1)
        order by ok""").map(_.getLong(0)) == Seq(1L))
    sql("drop table if exists r9nt")
    sql("drop table if exists r9no")
  }

  // ---- grouped DISTINCT [ON] under EXISTS-with-OFFSET -------------------
  // post-DISTINCT the body has one row per tuple, NOT one per group:
  // k=4 has two (x,y) groups but ONE distinct y (group counting keeps
  // it wrongly); k=3's distinct tuples are {NULL, 7} (NULL-dropping
  // counting drops it wrongly)

  test("EXISTS over grouped DISTINCT [ON] with OFFSET counts distinct tuples") {
    sql("drop table if exists r9gt")
    sql("create table r9gt (k Int64, x Int64, y Int64)")
    sql("""insert into r9gt values
           (1, 1, 7), (1, 2, 7), (1, 3, 8),
           (2, 1, 7), (2, 2, 8), (2, 3, 9),
           (3, 1, null), (3, 2, null), (3, 3, 7),
           (4, 1, 7), (4, 2, 7)""")
    sql("drop table if exists r9go")
    sql("create table r9go (ok Int64)")
    sql("insert into r9go values (1), (2), (3), (4), (5)")
    // depth-1 equality, DISTINCT ON over (x, y) groups
    assert(rows("""select ok from r9go where exists (
        select distinct on (y) 1 from r9gt where k = ok
        group by x, y limit 100 offset 1) order by ok""")
      .map(_.getLong(0)) == Seq(1L, 2L, 3L))
    // depth-1 equality, plain DISTINCT over the grouped select tuple
    assert(rows("""select ok from r9go where exists (
        select distinct y from r9gt where k = ok
        group by x, y limit 100 offset 1) order by ok""")
      .map(_.getLong(0)) == Seq(1L, 2L, 3L))
    // theta correlation (ok-adjacent window == equality for ints)
    assert(rows("""select ok from r9go where exists (
        select distinct on (y) 1 from r9gt
        where k > ok - 1 and k < ok + 1
        group by x, y limit 100 offset 1) order by ok""")
      .map(_.getLong(0)) == Seq(1L, 2L, 3L))
    // expression position (under OR): both the plain and grouped forms
    assert(rows("""select ok from r9go where ok > 100 or exists (
        select distinct y from r9gt where k = ok limit 100 offset 1)
        order by ok""").map(_.getLong(0)) == Seq(1L, 2L, 3L))
    assert(rows("""select ok from r9go where ok > 100 or exists (
        select distinct on (y) 1 from r9gt where k = ok
        group by x, y limit 100 offset 1) order by ok""")
      .map(_.getLong(0)) == Seq(1L, 2L, 3L))
    // without OFFSET the DISTINCT ON is existence-neutral
    assert(rows("""select ok from r9go where exists (
        select distinct on (y) 1 from r9gt where k = ok group by x, y)
        order by ok""").map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L))
    sql("drop table if exists r9gt")
    sql("drop table if exists r9go")
  }

  // ---- banded grouped agg: multi-conjunct correlation must fall back ----
  // (found by tools/fuzzgen.py: fullPart credits whole bands by the ONE
  // banded comparison, so a second conjunct was honored only in the
  // boundary band — wrong aggregates on `k > ok-2 AND k < ok+2` bodies)

  test("theta grouped aggregation is exact under multi-conjunct correlation") {
    sql("drop table if exists r9mo")
    sql("create table r9mo (ok Int64)")
    sql("insert into r9mo values " + (1 to 12).map(i => s"($i)").mkString(", "))
    sql("drop table if exists r9mb")
    sql("create table r9mb (rid Int64, k Int64, x Int64)")
    sql("insert into r9mb values " + (1 to 40).map(r =>
      s"($r, ${r % 14}, ${r % 3 + 1})").mkString(", "))
    val got = rows("""select ok from r9mo where not exists (
        select x from r9mb where k > ok - 2 and k < ok + 2
        group by x having count(1) > 2) order by ok""").map(_.getLong(0))
    // mirror with plain DataFrame ops
    val sp = spark; import sp.implicits._
    val o = (1 to 12).map(_.toLong).toDF("ok")
    val b = (1 to 40).map(r => (r.toLong, (r % 14).toLong, (r % 3 + 1).toLong))
      .toDF("rid", "k", "x")
    val bad = o.join(b, col("k") > col("ok") - 2 && col("k") < col("ok") + 2)
      .groupBy("ok", "x").count().filter(col("count") > 2)
      .select("ok").distinct()
    val expect = o.join(bad, Seq("ok"), "left_anti")
      .orderBy("ok").collect().map(_.getLong(0)).toSeq
    assert(got == expect)
    sql("drop table if exists r9mo")
    sql("drop table if exists r9mb")
  }

  // ---- EXISTS over ungrouped aggregate selects: constant-true ----------
  // one aggregate row ALWAYS exists (SQL's empty-set aggregate row),
  // even when the body's WHERE matches nothing — the nested form was
  // flattening (match-dependent) and the expression-position form was
  // count-rewriting (round-9 fuzzer finds)

  test("EXISTS over an ungrouped aggregate select is constant-true everywhere") {
    sql("drop table if exists r9co")
    sql("create table r9co (ok Int64)")
    sql("insert into r9co values (1), (2), (3)")
    sql("drop table if exists r9cm")
    sql("create table r9cm (g Int64)")
    sql("insert into r9cm values (1), (2), (3)")
    sql("drop table if exists r9ct")
    sql("create table r9ct (k Int64, x Int64)")
    sql("insert into r9ct values (1, 5)") // only k=1 has rows; x > 99 never
    val all = Seq(1L, 2L, 3L)
    // depth-1 conjunct (already-correct baseline)
    assert(rows("""select ok from r9co where exists (
        select max(x) from r9ct where k = ok and x > 99)
        order by ok""").map(_.getLong(0)) == all)
    // expression position (under OR)
    assert(rows("""select ok from r9co where ok > 100 or exists (
        select max(x) from r9ct where k = ok and x > 99)
        order by ok""").map(_.getLong(0)) == all)
    // nested (grandparent correlation), positive and under NOT EXISTS
    assert(rows("""select ok from r9co where exists (
        select 1 from r9cm where g = ok
          and exists (select max(x) from r9ct where k = ok and x > 99))
        order by ok""").map(_.getLong(0)) == all)
    assert(rows("""select ok from r9co where not exists (
        select 1 from r9cm where g = ok
          and exists (select max(x) from r9ct where k = ok and x > 99))
        order by ok""").isEmpty)
    // …but OFFSET >= 1 over the one-row body empties it
    assert(rows("""select ok from r9co where ok > 100 or exists (
        select max(x) from r9ct where k = ok limit 100 offset 1)
        order by ok""").isEmpty)
    sql("drop table if exists r9co")
    sql("drop table if exists r9cm")
    sql("drop table if exists r9ct")
  }

  // ---- IN over grouped DISTINCT ON / LIMIT bodies -----------------------

  test("IN over a grouped DISTINCT ON body keeps the sliced group values") {
    sql("drop table if exists r9it")
    sql("create table r9it (k Int64, x Int64, y Int64, z Int64)")
    // per k, groups (x, y) with count z-rows; DISTINCT ON (y) keeps the
    // max-count row per y (ORDER BY y, count desc)
    sql("""insert into r9it values
           (1, 1, 7, 0), (1, 1, 7, 0), (1, 2, 7, 0), (1, 1, 8, 0),
           (2, 1, 7, 0), (2, 2, 8, 0), (2, 3, 9, 0)""")
    sql("drop table if exists r9io")
    sql("create table r9io (ok Int64)")
    sql("insert into r9io values (1), (2), (3)")
    // k=1: groups (1,7):2 (2,7):1 (1,8):1 -> per y kept counts {7->2, 8->1};
    //   slice (0,2] by (y, count desc) -> values {2, 1}
    // k=2: per-y kept counts all 1 -> values {1, 1} sliced to y=7,8 -> {1}
    // k=3: empty -> IN false
    assert(rows("""select ok from r9io where 2 in (
        select distinct on (y) count(1) from r9it where k = ok
        group by x, y order by y, count(1) desc limit 2)
        order by ok""").map(_.getLong(0)) == Seq(1L))
    assert(rows("""select ok from r9io where 1 in (
        select distinct on (y) count(1) from r9it where k = ok
        group by x, y order by y, count(1) desc limit 2)
        order by ok""").map(_.getLong(0)) == Seq(1L, 2L))
    // theta correlation routes the rid-frame grouped windows
    assert(rows("""select ok from r9io where 2 in (
        select distinct on (y) count(1) from r9it
        where k > ok - 1 and k < ok + 1
        group by x, y order by y, count(1) desc limit 2)
        order by ok""").map(_.getLong(0)) == Seq(1L))
    // ungrouped aggregate + surviving OFFSET: the <=1-row set empties ->
    // IN constant false, NOT IN constant true
    assert(rows("""select ok from r9io where 1 in (
        select count(1) from r9it where k = ok limit 100 offset 1)
        order by ok""").isEmpty)
    assert(rows("""select ok from r9io where ok not in (
        select count(1) from r9it where k = ok limit 100 offset 1)
        order by ok""").map(_.getLong(0)) == Seq(1L, 2L, 3L))
    sql("drop table if exists r9it")
    sql("drop table if exists r9io")
  }

  // ---- real PPM nearest-neighbor resample -------------------------------

  test("resizePpm picks floor-scaled source pixels and re-encodes valid P6") {
    val sp = spark; import sp.implicits._
    // 4x2 image, pixel (x, y) has RGB (10x+y, 100+x, 200+y)
    val w = 4; val h = 2
    val plane = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val x = p % w; val y = p / w
      (i % 3 match {
        case 0 => 10 * x + y
        case 1 => 100 + x
        case 2 => 200 + y
      }).toByte
    }
    val payload = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ plane
    val media = Seq(graft.pipeline.Multimodal.MediaItem(1L, "ppm", payload)).toDS()
    val out = graft.pipeline.Multimodal.resizePpm(media, 1, 2).collect().head
    val (ow, oh, off) = graft.pipeline.Multimodal.parsePpmHeader(out.data, 1L)
    assert((ow, oh) == (2, 1))
    // output (x=0) <- source (0,0); output (x=1) <- source (2,0)
    val got = out.data.drop(off).map(_ & 0xFF).toSeq
    assert(got == Seq(0, 100, 200, 20, 102, 200))
    // and the plane checksum matches the hand fold
    val meta = graft.pipeline.Multimodal.ppmPlaneMeta(
      graft.pipeline.Multimodal.resizePpm(media, 1, 2)).collect().head
    val expect = Seq(0, 100, 200, 20, 102, 200)
      .foldLeft(0L)((a, b) => (a * 131 + b) % 1000000007L)
    assert(meta.plane_hash == expect && meta.width == 2 && meta.height == 1)
  }

  // ---- portable SimHash (qp51 oracle flip) ------------------------------

  test("portable SimHash matches a driver-side replay on a tiny corpus") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "aa bb cc dd"), (2L, "aa bb cc dd"), (3L, "zz yy xx ww vv"))
      .toDF("doc_id", "text")
    val got = graft.pipeline.Dedup
      .simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 3, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // identical docs: identical fingerprints, hamming 0
    assert(got.contains((1L, 2L, 0)))
    // replay doc 1's fingerprint on the driver with plain Scala ints
    val P = 1000000007L
    def hashOf(s: String) = s.foldLeft(0L)((a, c) => (a * 257 + c.toInt) % P)
    val shingles = { val ws = "aa bb cc dd".split("\\s+"); (0 until 2).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}") }
    val planes = graft.pipeline.Dedup.simhashPlanes
    val fp = (0 until 64).map { j =>
      val (k, l) = planes(j)
      val ones = shingles.count(s => ((hashOf(s) * k + l) % P) * 2 >= P)
      if (2 * ones >= shingles.size) 1L << j else 0L
    }.reduce(_ + _)
    val wide = graft.pipeline.Dedup.simhashWide(docs.filter(col("doc_id") === 1), "doc_id", "text", portable = true)
      .collect().head.getLong(1)
    assert(wide == fp)
  }

  // ---- curation guards (ADVICE r8 #2/#3/#4) -----------------------------

  test("lengthBatches and tokenBudgetSelect reject negative ids") {
    val sp = spark; import sp.implicits._
    val docs = Seq((-1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](
      graft.pipeline.Curation.lengthBatches(docs, "doc_id", "text"))
    assertThrows[IllegalArgumentException](
      graft.pipeline.Curation.tokenBudgetSelect(docs, "doc_id", "text", 100L))
  }

  test("hashSample fail-fasts on negative ids and is huge-id exact") {
    val sp = spark; import sp.implicits._
    val bad = Seq((-5L, "s")).toDF("doc_id", "source")
    assertThrows[Exception](
      graft.pipeline.Curation.hashSample(bad, "doc_id", "source",
        Map("s" -> 1000), 1000).collect())
    // ids far past the old formula's wrap point: mix must equal the
    // reduce-first reference computed on the driver
    val big = Seq(9300000000000L, 9223372036854L).map((_, "s"))
      .toDF("doc_id", "source")
    val got = graft.pipeline.Curation.hashSample(big, "doc_id", "source",
        Map("s" -> 1000), 1000)
      .select("doc_id", "mix").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ref(id: Long) = ((id % 999983L) * 1000003L + 12345L) % 999983L * 2654435761L % 1000L
    assert(got.forall { case (id, m) => m == ref(id) })
  }

  test("tokenBudgetSelect sub-bucketing preserves the greedy cut exactly") {
    val sp = spark; import sp.implicits._
    val docs = (0L until 300L).map(i =>
      (i, Seq.fill((i % 7).toInt + 1)(if (i % 3 == 0) "the" else s"w$i")
        .mkString(" "))).toDF("doc_id", "text")
    val got = graft.pipeline.Curation
      .tokenBudgetSelect(docs, "doc_id", "text", 400L, subBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // single-window reference: rank (score desc, id), inclusive cumsum
    val base = docs.select(col("doc_id"),
      when(length(trim(col("text"))) === 0, lit(0L))
        .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
        .as("n_tokens"),
      graft.pipeline.TextOps.stopwordHits(
        array_distinct(split(trim(lower(col("text"))), "\\s+")), "en")
        .cast("long").as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = base.withColumn("cum", sum("n_tokens").over(w))
      .filter(col("cum") <= 400L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.sortBy(_._1).toSeq == expect.toSeq)
  }
}
