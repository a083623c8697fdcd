package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Kernels behind the Signals batch (q210-q215), exercised on
  * topologies and series the corpus never produces: the weighted
  * PageRank recurrence, the fixed-round k-core peel, the CUSUM /
  * Holt-Winters integer folds re-derived sequentially in Scala, and
  * phrase-count semantics for overlapping matches. */
class SignalsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-signals-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def byName(n: String) =
    graft.SparkEntry.queries(n)(spark, sf)

  test("q270/q272 TVD closed form == naive full bucket-spine sum " +
    "(the absent-bucket mass term is exact)") {
    // the shipped queries avoid the group x bucket cross join via
    //   S = sum_in |n_gv*N - n_v*n_g| + n_g*(N - sum_in n_v);
    // pin that shortcut against the definitionally-complete spine:
    // every (group, bucket) pair including the group's absent ones
    val s = spark; import s.implicits._
    val gate = byName("q272_privacy_release_gate")
      .select(col("nat"), col("seg"), col("tvd_milli"))
    val q = Tables.customer(spark, sf)
      .select(col("c_nationkey").as("nat"),
        col("c_mktsegment").as("seg"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) DIV 100000")
          .as("sv"))
    val gb = q.groupBy(col("nat"), col("seg"), col("sv"))
      .agg(count(lit(1)).as("ngv"))
    val gl = q.groupBy(col("sv")).agg(count(lit(1)).as("nv"))
    val gr = q.groupBy(col("nat"), col("seg"))
      .agg(count(lit(1)).as("ng"))
    val nn = q.count()
    val spine = gr.crossJoin(gl) // the join the PRODUCTION query must
                                 // never do; fine in a spec at sf0.001
      .join(gb, Seq("nat", "seg", "sv"), "left")
      .select(col("nat"), col("seg"), col("ng"), col("nv"),
        coalesce(col("ngv"), lit(0L)).as("ngv"))
    val naive = spine
      .groupBy(col("nat"), col("seg"))
      .agg(sum(abs(col("ngv") * lit(nn) - col("nv") * col("ng")))
        .as("s_all"), max(col("ng")).as("ng"))
      .select(col("nat"), col("seg"),
        expr(s"(500 * s_all) DIV (ng * ${nn}L)").as("tvd_naive"))
    val diff = gate.join(naive, Seq("nat", "seg"))
      .filter(col("tvd_milli") =!= col("tvd_naive"))
    assert(diff.isEmpty,
      s"closed form diverges from the spine sum:\n${diff.collect()
        .mkString("\n")}")
    assert(gate.count() == naive.count(),
      "gate must cover every QI group the spine produces")
  }

  test("weighted PageRank: star center outranks leaves; " +
    "symmetric pair ties") {
    val s = spark; import s.implicits._
    // star: center c joined to 4 leaves with weight 1
    val star = Seq(("c", "l1", 1L), ("c", "l2", 1L), ("c", "l3", 1L),
      ("c", "l4", 1L)).toDF("u", "v", "w")
    val pr = Signals.weightedPageRank(star, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr("c") > pr("l1"))
    assert(pr("l1") == pr("l2") && pr("l2") == pr("l3"))
    // single symmetric edge: both endpoints identical rank
    val pair = Seq(("a", "b", 7L)).toDF("u", "v", "w")
    val p2 = Signals.weightedPageRank(pair, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p2("a") == p2("b"))
  }

  test("k-core peel: cycle survives, pendant chain and isolated " +
    "edge peel away") {
    val s = spark; import s.implicits._
    // 4-cycle 1-2-3-4 plus pendant chain 4-5-6 plus isolated edge 8-9
    val undirected = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L,
      4L -> 5L, 5L -> 6L, 8L -> 9L)
    val ed = undirected.toDF("a", "b")
      .unionAll(undirected.map(_.swap).toDF("a", "b"))
    val core = Signals.kcoreSurvivors(ed, 2, 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet == Set(1L, 2L, 3L, 4L))
    assert(core.values.forall(_ == 2L))
    // k=3 on the same graph: nothing survives (max degree in core is 2)
    assert(Signals.kcoreSurvivors(ed, 3, 6).count() == 0L)
  }

  test("CUSUM fold matches a sequential Scala recurrence") {
    val rows = byName("q211_cusum_changepoint").collect()
    assert(rows.length == 20)
    // recompute the full series per type from the events table and
    // fold sequentially; every reported (type, day, cusum) must match
    val e = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), expr("ts_sec DIV 86400").as("day"),
        round(col("value") * 100).cast("long").as("vc"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vc")).as("x"))
      .collect()
      .groupBy(_.getString(0))
    val expected = e.flatMap { case (t, rs) =>
      val m = rs.map(r => r.getLong(1) -> r.getLong(2)).toMap
      val days = m.keys.min to m.keys.max
      val xs = days.map(d => d -> m.getOrElse(d, 0L))
      val mu = xs.map(_._2).sum / xs.size
      var c = 0L
      xs.map { case (d, x) =>
        c = math.max(0L, c + x - mu - mu / 20)
        (t, d) -> (x, c)
      }
    }
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert(expected(key) == ((r.getLong(2), r.getLong(3))),
        s"mismatch at $key")
    }
  }

  test("Holt-Winters fold matches a sequential Scala recurrence " +
    "including negative trends") {
    val rows = byName("q215_holt_forecast").collect()
    assert(rows.nonEmpty)
    val series = rows.groupBy(_.getString(0))
    var sawNegativeTrend = false
    series.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      var lvl = 0L; var tr = 0L
      ordered.zipWithIndex.foreach { case (r, i) =>
        val x = r.getLong(2)
        if (i == 0) { lvl = x; tr = 0L }
        else {
          val nl = (300 * x + 700 * (lvl + tr)) / 1000
          tr = (100 * (nl - lvl) + 900 * tr) / 1000
          lvl = nl
        }
        if (tr < 0) sawNegativeTrend = true
        assert(r.getLong(3) == lvl && r.getLong(4) == tr &&
          r.getLong(5) == lvl + tr,
          s"day ${r.getLong(1)}: got (${r.getLong(3)},${r.getLong(4)})" +
            s" want ($lvl,$tr)")
      }
    }
    assert(sawNegativeTrend,
      "series never exercised the negative-trend division path")
  }

  test("min-label propagation: fixed rounds converge within the " +
    "round budget and stay deterministic beyond it") {
    val s = spark; import s.implicits._
    // chain 1-2-...-9: distance from node 9 to the min is 8 > 6
    // rounds, so 9 must NOT yet carry label 1 (fixed-round
    // semantics), while nodes within 6 hops must
    val chain = (1L until 9L).map(i => i -> (i + 1))
    val ed = chain.toDF("a", "b")
      .unionAll(chain.map(_.swap).toDF("a", "b"))
    val l6 = Signals.minLabelProp(ed, 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 7L).forall(l6(_) == 1L))
    assert(l6(9L) == 3L) // min label within 6 hops of 9 is 3, not yet 1
    // two more rounds finish the chain
    val l8 = Signals.minLabelProp(ed, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 9L).forall(l8(_) == 1L))
    // disjoint triangles stay separate
    val tri = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L,
      7L -> 8L, 8L -> 9L, 9L -> 7L)
    val ed2 = tri.toDF("a", "b")
      .unionAll(tri.map(_.swap).toDF("a", "b"))
    val lt = Signals.minLabelProp(ed2, 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lt == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("CUPED readout: pooled theta is shared and the adjustment " +
    "conserves the overall mean") {
    val rows = byName("q220_cuped_adjustment").collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L))
    val thetas = rows.map(_.getLong(3)).toSet
    assert(thetas.size == 1, s"theta differs per arm: $thetas")
    // sum_arm na*(adj - raw) = -theta * sum_arm na*(mean_x_arm -
    // mean_x) = 0 exactly before flooring; allow 1 milli per user
    // of floor slack
    val drift = rows.map(r =>
      r.getLong(1) * (r.getLong(4) - r.getLong(2))).sum
    val nTotal = rows.map(_.getLong(1)).sum
    assert(math.abs(drift) <= nTotal,
      s"adjustment moved the pooled mean: drift=$drift n=$nTotal")
  }

  test("SRM check: per-day arm counts partition the day's actives") {
    val rows = byName("q221_srm_check").collect()
    assert(rows.length == 10)
    val perDay = Tables.events(spark, sf)
      .select(expr("ts_sec DIV 86400").as("day"), col("user_id"))
      .distinct().groupBy("day").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == perDay(r.getLong(0)))
      val (n0, n1, n) = (r.getLong(1), r.getLong(2),
        r.getLong(1) + r.getLong(2))
      assert(r.getLong(3) == (n0 - n1) * (n0 - n1) * 1000000L / n)
    }
  }

  test("window funnel matches a sequential greedy-chain scan") {
    val rows = byName("q222_window_funnel").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val events = Tables.events(spark, sf)
      .filter(col("event_type").isin("signup", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts_sec"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val depths = events.values.flatMap { es =>
      val s1s = es.filter(_._2 == "signup").map(_._3)
      if (s1s.isEmpty) None
      else {
        val s1 = s1s.min
        val s2 = es.filter(e => e._2 == "click" && e._3 > s1)
          .map(_._3).minOption
        val s3 = s2.flatMap(c => es.filter(e =>
          e._2 == "purchase" && e._3 > c).map(_._3).minOption)
        Some(
          if (s3.exists(_ - s1 <= 86400)) (3L, s3.get - s1)
          else if (s2.exists(_ - s1 <= 86400)) (2L, s2.get - s1)
          else (1L, 0L))
      }
    }.toSeq
    val expected = depths.groupBy(_._1).map { case (dep, xs) =>
      dep -> (xs.size.toLong, xs.map(_._2).sum / xs.size)
    }
    assert(rows == expected)
  }

  test("PIT lookup attributes each purchase to the version open at " +
    "its event id (brute-force scan)") {
    val out = byName("q224_pit_feature_join").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val es = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val byUser = es.groupBy(_._1)
    val rows = es.filter(_._3 == "purchase").map { case (u, eid, _, vc) =>
      // the open version: latest profile event strictly before eid
      val prof = byUser(u).filter(e =>
        Set("signup", "view", "error")(e._3) && e._2 < eid)
      val op = if (prof.isEmpty) "none"
      else prof.maxBy(_._2)._3 match {
        case "signup" => "insert"
        case "error" => "none" // deleted: matches nothing
        case _ => "update"
      }
      val dv = if (op == "none") 0L else prof.maxBy(_._2)._4
      (op, vc, dv)
    }
    val expected = rows.groupBy(_._1).map { case (op, xs) =>
      op -> (xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum)
    }
    assert(out == expected)
  }

  test("phrase search counts overlapping occurrences per doc") {
    val out = byName("q212_phrase_search").collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val Array(t1, t2) = r.getString(0).split(" ")
      val toks = docs(r.getLong(2)).toLowerCase
        .split("[^a-z]+").filter(_.nonEmpty)
      val n = toks.sliding(2).count(w =>
        w.length == 2 && w(0) == t1 && w(1) == t2)
      assert(n == r.getLong(3),
        s"${r.getString(0)} doc ${r.getLong(2)}: scan=$n got=${r.getLong(3)}")
    }
  }
}
