package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Star-contraction connected components (q102's core) on topologies
  * the near-dup corpus never produces: long chains (worst case for
  * q45's O(diameter) label propagation — the case star contraction
  * exists for), hub stars, and multi-component forests. Labels must
  * equal the component minimum for every node. */
class GraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-graph-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Pipeline.starContraction(edges.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain contracts to its minimum (diameter >> round count)") {
    val chain = (1L until 64L).map(i => i -> (i + 1))
    val labels = labelsOf(chain)
    assert(labels.size == 64)
    assert(labels.values.forall(_ == 1L))
  }

  test("hub star roots at the min even when the hub is not the min") {
    // hub 50 connected to 1..10: component min is 1, not the hub
    val star = (1L to 10L).map(i => 50L -> i)
    val labels = labelsOf(star)
    assert(labels.size == 11)
    assert(labels.values.forall(_ == 1L))
  }

  test("forest keeps components separate") {
    val e = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L, 20L -> 21L, 21L -> 22L)
    val labels = labelsOf(e)
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("cycle plus tail agrees with a dense component") {
    val e = Seq(5L -> 6L, 6L -> 7L, 7L -> 5L, // cycle
      7L -> 8L, 8L -> 9L, // tail
      2L -> 9L) // tail reaches a smaller node
    val labels = labelsOf(e)
    assert(labels.values.toSet == Set(2L))
    assert(labels.keySet == Set(2L, 5L, 6L, 7L, 8L, 9L))
  }

  private def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val s = spark
    import s.implicits._
    val r = Pipeline.triangleCensus(edges.toDF("d1", "d2")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("triangle census: K4 is all triangles, transitivity 1") {
    // K4: 4 nodes, 6 edges, wedges = 4*C(3,2) = 12, triangles = 4,
    // transitivity = 3*4/12 = 1
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(census(k4.toSeq) == (4L, 6L, 12L, 4L, 1000L))
  }

  test("triangle census: path has wedges but no triangles") {
    val path = (1L until 6L).map(i => i -> (i + 1))
    assert(census(path) == (6L, 5L, 4L, 0L, 0L))
  }

  test("triangle census: triangle + pendant counts once") {
    // triangle 1-2-3 plus pendant 3-4: wedges = C(2,2)... degrees
    // (2,2,3,1) -> wedges 1+1+3+0 = 5, one triangle
    val e = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L)
    assert(census(e) == (4L, 4L, 5L, 1L, 600L))
  }

  test("triangle census agrees with brute force on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 40
      val edges = Seq.fill(120)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a < b }.distinct
      val adj = edges.toSet
      def connected(a: Long, b: Long) =
        adj(math.min(a, b) -> math.max(a, b))
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val triBrute = nodes.combinations(3).count {
        case Seq(a, b, c) =>
          connected(a, b) && connected(a, c) && connected(b, c)
      }
      val degs = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong)
      val wedBrute = degs.values.map(d => d * (d - 1) / 2).sum
      val (nn, ne, nw, nt, _) = census(edges)
      assert(nn == nodes.size.toLong)
      assert(ne == edges.size.toLong)
      assert(nw == wedBrute)
      assert(nt == triBrute.toLong)
    }
  }

  test("incremental merge: contracted stars + batch edges == full recompute") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { _ =>
      val n = 80
      val edges = Seq.fill(100)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // q164's split shape: an edge is "standing" iff both endpoints
      // land in the standing partition
      def standingNode(x: Long) = x % 5 != 0
      val (standing, batch) = edges.partition {
        case (a, b) => standingNode(a) && standingNode(b)
      }
      val labels0 = Pipeline.starContraction(standing.toDF("d1", "d2"))
      val labelEdges = labels0.filter(col("node") =!= col("label"))
        .select(col("node").as("d1"), col("label").as("d2"))
      val incr = Pipeline.starContraction(
          labelEdges.union(batch.toDF("d1", "d2")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = Pipeline.starContraction(edges.toDF("d1", "d2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(incr == full)
    }
  }

  test("random graphs agree with an independent union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 120
      val edges = Seq.fill(150)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // ground truth: driver-side union-find with min-root labels
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
      assert(labelsOf(edges) == expected)
    }
  }
}
