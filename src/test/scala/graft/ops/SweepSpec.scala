package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-11 tuning-sweep queries at
  * sf0.001 — the properties that make each sweep a trustworthy
  * tuning table rather than four unrelated numbers:
  *
  * - q247 (LSH band sweep): collision probability ≈ J^r is monotone
  *   DECREASING in rows-per-band r, so both the candidate volume and
  *   the hit count must be non-increasing as r grows — and the r=2
  *   arm's candidate set must contain every (8×2)-banded q26-style
  *   pair (it IS the q26 banding, keyed identically).
  * - q248 (vocab growth): cum_types is the running sum of new_types
  *   (exactly — triangle join vs a driver-side prefix sum), the
  *   final cumulative equals the corpus's distinct token-type count,
  *   and doc mass sums to the corpus doc count.
  * - q249 (threshold sweep): tighter τ keeps a superset of docs —
  *   n_pairs and n_dropped non-increasing in τ, n_kept
  *   non-decreasing, and the τ=0.60 arm's pair count equals the q25
  *   exact pair relation's row count (same memo, loosest filter).
  */
class SweepSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sweep-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir).collect()

  test("q247: cost and recall are monotone non-increasing in r") {
    val rows = run("q247_lsh_band_sweep").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L))
    val cand = rows.map(_.getLong(2))
    val hit = rows.map(_.getLong(3))
    assert(cand.zip(cand.tail).forall { case (a, b) => a >= b },
      s"candidate volume must fall as r grows: ${cand.toSeq}")
    assert(hit.zip(hit.tail).forall { case (a, b) => a >= b },
      s"hits must fall as r grows: ${hit.toSeq}")
    // every arm's hits are bounded by the ground-truth pair count
    val nTrue = rows.head.getLong(4)
    assert(rows.forall(r => r.getLong(3) <= nTrue))
  }

  test("q248: cumulative types is the exact running sum; totals close") {
    import org.apache.spark.sql.functions._
    val rows = run("q248_vocab_growth").sortBy(_.getLong(0))
    var acc = 0L
    rows.foreach { r =>
      acc += r.getLong(3)
      assert(r.getLong(4) == acc,
        s"bucket ${r.getLong(0)}: cum_types ${r.getLong(4)} != running sum $acc")
    }
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    val nTypes = Text.docTermFreq(spark, sfDir)
      .select(col("tok")).distinct().count()
    assert(acc == nTypes,
      s"final cumulative $acc != corpus distinct types $nTypes")
  }

  test("q249: tighter tau drops less; loosest arm equals the q25 memo") {
    val rows = run("q249_dedup_threshold_sweep").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(6000L, 7000L, 8000L, 9000L))
    val pairs = rows.map(_.getLong(1))
    val dropped = rows.map(_.getLong(2))
    val kept = rows.map(_.getLong(3))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    assert(dropped.zip(dropped.tail).forall { case (a, b) => a >= b })
    assert(kept.zip(kept.tail).forall { case (a, b) => a <= b })
    // τ=0.60 is exactly the memoized exact-Jaccard pair relation
    assert(pairs.head == Text.jaccardPairs(spark, sfDir).count())
  }

  test("q250: mutual pairs are unique per src, non-en only, margin >= 0") {
    val rows = run("q250_bitext_margin_mining")
    val srcs = rows.map(_.getLong(0))
    assert(srcs.distinct.length == srcs.length,
      "rank-1 forward match must yield at most one pair per source doc")
    assert(rows.forall(_.getString(1) != "en"))
    // margin = best − runner-up forward score: non-negative when present
    rows.filter(!_.isNullAt(4)).foreach { r =>
      assert(r.getDouble(4) >= 0.0, s"negative margin in $r")
    }
    // cosine of unit-ish vectors stays in [-1, 1]
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }

  test("q251: silhouette bounded in [0, 1000]; counts close over the corpus") {
    val rows = run("q251_cluster_silhouette")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000L)
      assert(r.getLong(3) >= 0L && r.getLong(4) <= 1000L)
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(4),
        s"min <= avg <= max violated in $r")
    }
    val nVec = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == nVec,
      "every vector belongs to exactly one audited cluster")
  }

  test("q252: agreement bounded in [0, 1000]; sum_d2 consistent with it") {
    val rows = run("q252_signal_rank_corr")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s2, a) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(a >= 0L && a <= 1000L, s"agree_milli out of range in $r")
      assert(n >= 2L)
      val den = BigInt(n) * n * n - n
      assert(BigInt(s2) * 3 <= den, "rho >= -1 bound violated")
      assert((den - 3 * BigInt(s2)) * 1000 / den == BigInt(a),
        "reported agreement must equal the exact rational")
    }
  }

  test("q253: ratios bounded in (0, 1e6]; doc and token totals close") {
    val rows = run("q253_distinct_ngram_diversity")
    rows.foreach { r =>
      Seq(3, 4, 5).foreach { i =>
        assert(r.getLong(i) > 0L && r.getLong(i) <= 1000000L,
          s"distinct-n ppm out of range in $r")
      }
    }
    val docs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == docs)
    import org.apache.spark.sql.functions._
    val toks = Text.withToks(spark, sfDir)
      .agg(sum(size(col("toks")).cast("long"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == toks,
      "per-source token mass must sum to the corpus total")
  }

  test("q254: epochs in [1,4], non-increasing in rank, budget respected") {
    val rows = run("q254_epoch_budget_plan")
    rows.foreach { r =>
      assert(r.getLong(4) >= 1L && r.getLong(4) <= 4L)
      assert(r.getLong(5) == r.getLong(4) * r.getLong(3),
        "planned tokens must equal epochs x mass")
    }
    // greedy by quality: a better-ranked source never trains fewer
    // epochs than a worse-ranked one (one partial source at the
    // budget frontier, 3-epoch extras above it, zero below)
    val byRank = rows.sortBy(_.getLong(1)).map(_.getLong(4))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
      s"epochs must be non-increasing in quality rank: ${byRank.toSeq}")
    val mass = rows.map(_.getLong(3)).sum
    val planned = rows.map(_.getLong(5)).sum
    assert(planned >= mass && planned <= 2 * mass,
      "plan must spend at least one epoch of everything, at most B = 2M")
  }

  test("q256: Venn cells partition the exact pair set; shares close") {
    val rows = run("q256_blocking_agreement")
    val masks = rows.map(r => (r.getBoolean(0), r.getBoolean(1)))
    assert(masks.distinct.length == masks.length, "cells must be disjoint")
    val truth = Text.jaccardPairs(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == truth,
      "every ground-truth pair lands in exactly one Venn cell")
    // integer-floor shares can undershoot by at most (#cells - 1)
    val s = rows.map(_.getLong(3)).sum
    assert(s <= 1000L && s >= 1000L - (rows.length - 1))
  }

  test("q257: size census partitions the corpus; mass closes exactly") {
    val rows = run("q257_cluster_size_census")
    // every doc lands in exactly one size bucket (incl. singletons)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1),
        s"n_docs must equal cluster_size x n_clusters in $r")
    }
    // clustered mass equals the component-label relation's node count
    val clustered = rows.filter(_.getLong(0) >= 2).map(_.getLong(2)).sum
    assert(clustered == Pipeline.clusterLabels(spark, sfDir).count())
  }

  test("q255: KS statistic matches a driver-side brute force exactly") {
    import org.apache.spark.sql.functions._
    val rows = run("q255_ks_length_drift")
    rows.foreach(r => assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L))
    // brute force: collect every (source, len), replay sup |F−G| in BigInt
    val lens = Text.withToks(spark, sfDir)
      .select(col("source"), size(col("toks")).cast("long").as("len"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val all = lens.map(_._2).sorted
    val bySrc = lens.groupBy(_._1)
    val grid = all.distinct
    rows.foreach { r =>
      val (src, n, got) = (r.getString(0), r.getLong(1), r.getLong(2))
      val mine = bySrc(src).map(_._2).sorted
      assert(mine.length == n)
      val nr = all.length - mine.length
      val sup = grid.map { x =>
        val cs = BigInt(mine.count(_ <= x))
        val cr = BigInt(all.count(_ <= x)) - cs
        (cs * nr - cr * mine.length).abs
      }.max
      assert(sup * 1000000 / (BigInt(mine.length) * nr) == BigInt(got),
        s"KS mismatch for $src")
    }
  }
}
