package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` vectors (64-dim float,
  * unit-norm): brute-force cosine top-k as the correctness baseline,
  * sign-bucket IVF as the scale path, and per-label centroid
  * statistics (vector aggregation).
  *
  * Cross-engine determinism: all arithmetic is double precision with
  * an explicit left-to-right fold (Spark `aggregate` with 0.0 init ≡
  * DuckDB `list_reduce`), `sqrt(na)*sqrt(nb)` spelled identically,
  * and scores rounded to 6 places before ranking with a vec_id
  * tie-break.
  *
  * Scale notes (100 TB): the brute-force path broadcasts the (small)
  * query set against the full collection — linear scan, no shuffle of
  * the big side, whole-stage codegen over array ops. The IVF path
  * replaces the scan with an equi-join on an 8-bit sign-bucket key:
  * candidates shuffle by bucket only, so cost follows bucket occupancy
  * rather than N². Centroid stats are two keyed aggregations
  * (label×dim, then label).
  */
object Vectors {
  import Tables._

  /** double-cast vector + its squared-norm (left-to-right fold order,
    * evaluated by the native codegen kernel).
    * fanOut first: the test collection is ONE parquet split, which
    * would run every downstream per-vector fold single-threaded. */
  private[ops] def prepared(s: SparkSession, d: String): DataFrame = {
    graft.cdc.GraftFunctions.register(s)
    fanOut(embeddings(s, d))
      .select(col("vec_id"), col("label"), col("embedding"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", dot(col("v"), col("v")))
  }

  /** Native `vec_dot` expression — same ascending-index fold the
    * oracle's `list_reduce` runs, but inside whole-stage codegen with
    * no intermediate zipped array (`aggregate(zip_with(...))` falls
    * out of codegen into the interpreted higher-order path). */
  private[ops] def dot(a: Column, b: Column): Column =
    graft.cdc.GraftFunctions.vec_dot(a, b)

  private[ops] val dotSql = (a: String, b: String) =>
    s"list_reduce(list_transform(range(1, 65), i -> $a[i] * $b[i]), (acc, x) -> acc + x)"

  /** Shared oracle CTE chain mirroring [[kmeansAssignments]]: the
    * shifted integer grid `e(vec_id, q)` through two exact-integer
    * Lloyd iterations to the trained assignment `a2(vec_id, j)`.
    * Prepend as `"WITH " + lloydA2Sql` (+ `",\n"` for further CTEs) —
    * q115 (summary), q116 (recall audit), and q122 (semantic dedup)
    * all consume the same chain, so the engine memo and the oracle
    * stay in lockstep by construction. */
  private[ops] val lloydA2Sql =
    """e AS (SELECT vec_id, list_transform(embedding,
      |      x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT) + 1000) AS q
      |    FROM embeddings),
      |dims AS (SELECT vec_id, i, q[i] AS v
      |         FROM e, UNNEST(range(1, 65)) AS t(i)),
      |c0 AS (SELECT vec_id AS j, i, v AS c FROM dims WHERE vec_id < 8),
      |d1 AS (SELECT d.vec_id, c.j,
      |         sum((d.v - c.c) * (d.v - c.c)) AS dist
      |       FROM dims d JOIN c0 c ON c.i = d.i GROUP BY d.vec_id, c.j),
      |a1 AS (SELECT vec_id, j FROM (
      |         SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
      |           ORDER BY dist, j) AS rn FROM d1) WHERE rn = 1),
      |n1 AS (SELECT j, count(*) AS n FROM a1 GROUP BY j),
      |s1 AS (SELECT a1.j, d.i, sum(d.v) AS s
      |       FROM a1 JOIN dims d ON d.vec_id = a1.vec_id
      |       GROUP BY a1.j, d.i),
      |c1 AS (SELECT s1.j, s1.i, (2 * s1.s + n1.n) // (2 * n1.n) AS c
      |       FROM s1 JOIN n1 ON n1.j = s1.j),
      |d2 AS (SELECT d.vec_id, c.j,
      |         sum((d.v - c.c) * (d.v - c.c)) AS dist
      |       FROM dims d JOIN c1 c ON c.i = d.i GROUP BY d.vec_id, c.j),
      |a2 AS (SELECT vec_id, j FROM (
      |         SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
      |           ORDER BY dist, j) AS rn FROM d2) WHERE rn = 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q29_knn_bruteforce",
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |n AS (SELECT vec_id, v,
         |    ${dotSql("v", "v")} AS nrm FROM e),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n
         |      WHERE vec_id < 20),
         |p AS (SELECT qid, c.vec_id AS cid,
         |    round(${dotSql("qv", "c.v")} / (sqrt(qn) * sqrt(c.nrm)), 6)
         |      AS score
         |  FROM q JOIN n c ON c.vec_id <> qid)
         |SELECT qid, rn, cid, score FROM (
         |  SELECT qid, cid, score, row_number() OVER (
         |    PARTITION BY qid ORDER BY score DESC, cid) AS rn FROM p)
         |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin) { (s, d) =>
      val n = prepared(s, d)
      val q = n.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("cid"))
      n.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          round(dot(col("qv"), col("v")) /
            (sqrt(col("qn")) * sqrt(col("nrm"))), 6).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("rn"), col("cid"), col("score"))
        .orderBy(col("qid"), col("rn"))
    },

    QueryDef(
      "q123_hard_negatives",
      s"""WITH e AS (SELECT vec_id, label,
         |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |n AS (SELECT vec_id, label, v,
         |    ${dotSql("v", "v")} AS nrm FROM e),
         |q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv, nrm AS qn
         |      FROM n WHERE vec_id < 20),
         |p AS (SELECT qid, c.vec_id AS cid, c.label AS neg_label,
         |    round(${dotSql("qv", "c.v")} / (sqrt(qn) * sqrt(c.nrm)), 6)
         |      AS score
         |  FROM q JOIN n c ON c.vec_id <> qid AND c.label <> qlabel)
         |SELECT qid, rn, cid, neg_label, score FROM (
         |  SELECT qid, cid, neg_label, score, row_number() OVER (
         |    PARTITION BY qid ORDER BY score DESC, cid) AS rn FROM p)
         |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin) { (s, d) =>
      // Hard-negative mining — the contrastive-training selection pass
      // (pick, per anchor, the most-similar examples with a DIFFERENT
      // label: negatives the current representation finds hardest).
      // Same shape as q29's exact kNN with the label-disagreement
      // predicate pushed into the join, same rounded-score ranking so
      // both engines order identically. The per-anchor top-3 rank
      // prunes through WindowGroupLimit; at corpus scale the exact arm
      // swaps for the trained-IVF candidate generator (q116) with the
      // label filter applied to its cell-mates — this query is the
      // audit-grade exact baseline.
      val n = prepared(s, d)
      val q = n.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("v").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("cid"))
      n.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid") &&
          col("label") =!= col("qlabel"))
        .select(col("qid"), col("vec_id").as("cid"),
          col("label").as("neg_label"),
          round(dot(col("qv"), col("v")) /
            (sqrt(col("qn")) * sqrt(col("nrm"))), 6).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("rn"), col("cid"), col("neg_label"),
          col("score"))
        .orderBy(col("qid"), col("rn"))
    },

    QueryDef(
      "q30_ann_ivf_signbuckets",
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> x::DOUBLE) AS v,
         |    list_reduce(list_transform(range(1, 9), i ->
         |      CASE WHEN embedding[i] > 0 THEN 1 << (i - 1) ELSE 0 END),
         |      (a, b) -> a + b) AS bucket
         |  FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, ${dotSql("v", "v")} AS nrm FROM e),
         |p AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
         |    round(${dotSql("a.v", "b.v")} / (sqrt(a.nrm) * sqrt(b.nrm)), 6)
         |      AS score
         |  FROM n a JOIN n b ON a.bucket = b.bucket
         |                   AND a.vec_id <> b.vec_id)
         |SELECT qid, rn, cid, score FROM (
         |  SELECT qid, cid, score, row_number() OVER (
         |    PARTITION BY qid ORDER BY score DESC, cid) AS rn FROM p)
         |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin) { (s, d) =>
      val n = prepared(s, d)
        .withColumn("bucket",
          (0 until 8).map(i =>
            when(element_at(col("embedding"), i + 1) > 0f, lit(1 << i))
              .otherwise(lit(0))).reduce(_ + _))
      val a = n.select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))
      val b = n.select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"), col("bucket"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("cid"))
      a.join(b, Seq("bucket"))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"),
          round(dot(col("qv"), col("cv")) /
            (sqrt(col("qn")) * sqrt(col("cn"))), 6).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("rn"), col("cid"), col("score"))
        .orderBy(col("qid"), col("rn"))
    },

    QueryDef(
      "q44_embedding_neardup",
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> x::DOUBLE) AS v,
         |    list_reduce(list_transform(range(1, 9), i ->
         |      CASE WHEN embedding[i] > 0 THEN 1 << (i - 1) ELSE 0 END),
         |      (a, b) -> a + b) AS bucket
         |  FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, ${dotSql("v", "v")} AS nrm FROM e),
         |p AS (SELECT a.vec_id AS d1, b.vec_id AS d2,
         |    ${dotSql("a.v", "b.v")} / (sqrt(a.nrm) * sqrt(b.nrm)) AS score
         |  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT d1, d2, round(score, 6) AS score_6
         |FROM p WHERE score >= 0.35 ORDER BY d1, d2""".stripMargin) { (s, d) =>
      // Embedding-cosine near-duplicate pairs, the fifth dedup family
      // (exact / MinHash / SimHash / Jaccard / embedding): candidates
      // come from the same 8-bit sign-bucket LSH as q30, so the pair
      // space is bucket-bounded, never N². The threshold compares the
      // *raw* left-to-right-folded double (bit-identical across
      // engines); only the reported score is rounded.
      val n = prepared(s, d)
        .withColumn("bucket",
          (0 until 8).map(i =>
            when(element_at(col("embedding"), i + 1) > 0f, lit(1 << i))
              .otherwise(lit(0))).reduce(_ + _))
      val a = n.select(col("vec_id").as("d1"), col("v").as("av"),
        col("nrm").as("an"), col("bucket"))
      val b = n.select(col("vec_id").as("d2"), col("v").as("bv"),
        col("nrm").as("bn"), col("bucket"))
      a.join(b, Seq("bucket"))
        .filter(col("d1") < col("d2"))
        .withColumn("score",
          dot(col("av"), col("bv")) / (sqrt(col("an")) * sqrt(col("bn"))))
        .filter(col("score") >= 0.35)
        .select(col("d1"), col("d2"), round(col("score"), 6).as("score_6"))
        .orderBy(col("d1"), col("d2"))
    },

    QueryDef(
      "q63_embedding_quantization",
      s"""WITH e AS (SELECT vec_id, label,
         |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |sc AS (SELECT vec_id, label, v,
         |    list_reduce(list_transform(v, x -> abs(x)),
         |      (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS scale
         |  FROM e),
         |err AS (SELECT label,
         |    list_reduce(list_transform(v, x ->
         |      CASE WHEN scale = 0 THEN 0.0 ELSE
         |        (x - (floor(x / scale * 127.0) * scale / 127.0))
         |        * (x - (floor(x / scale * 127.0) * scale / 127.0)) END),
         |      (a, b) -> a + b) AS sq
         |  FROM sc)
         |SELECT label, count(*) AS n_vectors,
         |  CAST(floor(sum(sq) * 1000000.0 / count(*)) AS BIGINT)
         |    AS mse_6
         |FROM err GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
      // int8 scalar quantization: per-vector scale = max|x|, code =
      // floor(x/scale*127) — the 4x storage compression an ANN index
      // would persist at 100 TB; reconstruction MSE per label stays a
      // keyed aggregation. floor (not round) keeps the code integers
      // engine-identical, and the left-to-right list folds make the
      // error sums bit-identical before the floor-scaled output.
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val sc = e.withColumn("scale",
        aggregate(transform(col("v"), x => abs(x)), lit(0.0),
          (a, b) => when(b > a, b).otherwise(a)))
      val recon = (x: Column, scale: Column) =>
        floor(x / scale * 127.0) * scale / 127.0
      val err = sc.select(col("label"),
        aggregate(transform(col("v"), x =>
          when(col("scale") === 0, 0.0)
            .otherwise((x - recon(x, col("scale")))
              * (x - recon(x, col("scale"))))),
          lit(0.0), (a, b) => a + b).as("sq"))
      err.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vectors"),
          floor(sum(col("sq")) * 1000000.0 / count(lit(1))).cast("long")
            .as("mse_6"))
        .orderBy(col("label"))
    },

    QueryDef(
      "q31_label_centroid_stats",
      s"""WITH x AS (SELECT label, vec_id, i, embedding[i]::DOUBLE AS val
         |  FROM embeddings, UNNEST(range(1, 65)) AS t(i)),
         |cent AS (SELECT label, i, avg(val) AS c FROM x GROUP BY label, i),
         |carr AS (SELECT label, array_agg(c ORDER BY i) AS cv
         |         FROM cent GROUP BY label),
         |dists AS (SELECT e.label, round(sqrt(list_reduce(
         |    list_transform(range(1, 65), i ->
         |      (e.embedding[i]::DOUBLE - cv[i]) * (e.embedding[i]::DOUBLE - cv[i])),
         |    (a, b) -> a + b)), 6) AS dist
         |  FROM embeddings e JOIN carr ON carr.label = e.label)
         |SELECT c.label,
         |  (SELECT count(*) FROM embeddings e2 WHERE e2.label = c.label)
         |    AS n_vectors,
         |  round(sqrt(list_reduce(list_transform(range(1, 65), i ->
         |    cv[i] * cv[i]), (a, b) -> a + b)), 6) AS centroid_norm,
         |  (SELECT round(avg(dist), 4) FROM dists dd WHERE dd.label = c.label)
         |    AS avg_dist
         |FROM carr c ORDER BY c.label""".stripMargin) { (s, d) =>
      val e = prepared(s, d)
      val x = e.select(col("label"), col("vec_id"),
          posexplode(col("v")).as(Seq("pos", "val")))
        .select(col("label"), (col("pos") + 1).as("i"), col("val"))
      val cent = x.groupBy(col("label"), col("i")).agg(avg(col("val")).as("c"))
      val carr = cent.groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
          s => s.getField("c")).as("cv"))
      val dists = e.join(carr, "label")
        .select(col("label"),
          round(sqrt(aggregate(zip_with(col("v"), col("cv"),
            (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)), 6)
            .as("dist"))
      val counts = e.groupBy(col("label")).agg(count(lit(1)).as("n_vectors"))
      val avgd = dists.groupBy(col("label")).agg(r4(avg(col("dist"))).as("avg_dist"))
      carr
        .select(col("label"),
          round(sqrt(aggregate(transform(col("cv"), c => c * c), lit(0.0),
            (acc, x) => acc + x)), 6).as("centroid_norm"))
        .join(counts, "label")
        .join(avgd, "label")
        .select(col("label"), col("n_vectors"), col("centroid_norm"),
          col("avg_dist"))
        .orderBy(col("label"))
    },

    QueryDef(
      "q106_ann_recall_audit",
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> x::DOUBLE) AS v,
         |    list_reduce(list_transform(range(1, 9), i ->
         |      CASE WHEN embedding[i] > 0 THEN 1 << (i - 1) ELSE 0 END),
         |      (a, b) -> a + b) AS bucket
         |  FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, ${dotSql("v", "v")} AS nrm FROM e),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, bucket AS qb
         |      FROM n WHERE vec_id < 20),
         |ex AS (SELECT qid, cid FROM (
         |  SELECT qid, c.vec_id AS cid, row_number() OVER (
         |      PARTITION BY qid ORDER BY
         |        round(${dotSql("qv", "c.v")} / (sqrt(qn) * sqrt(c.nrm)), 6)
         |          DESC, c.vec_id) AS rn
         |    FROM q JOIN n c ON c.vec_id <> qid)
         |  WHERE rn <= 5),
         |iv1 AS (SELECT qid, cid FROM (
         |  SELECT qid, c.vec_id AS cid, row_number() OVER (
         |      PARTITION BY qid ORDER BY
         |        round(${dotSql("qv", "c.v")} / (sqrt(qn) * sqrt(c.nrm)), 6)
         |          DESC, c.vec_id) AS rn
         |    FROM q JOIN n c ON c.bucket = qb AND c.vec_id <> qid)
         |  WHERE rn <= 5),
         |iv9 AS (SELECT qid, cid FROM (
         |  SELECT qid, c.vec_id AS cid, row_number() OVER (
         |      PARTITION BY qid ORDER BY
         |        round(${dotSql("qv", "c.v")} / (sqrt(qn) * sqrt(c.nrm)), 6)
         |          DESC, c.vec_id) AS rn
         |    FROM q JOIN n c ON bit_count(xor(c.bucket, qb)) <= 1
         |                   AND c.vec_id <> qid)
         |  WHERE rn <= 5)
         |SELECT ex.qid,
         |  count(iv1.cid) * 20 AS recall1_pct,
         |  count(iv9.cid) * 20 AS recall9_pct
         |FROM ex
         |LEFT JOIN iv1 ON iv1.qid = ex.qid AND iv1.cid = ex.cid
         |LEFT JOIN iv9 ON iv9.qid = ex.qid AND iv9.cid = ex.cid
         |GROUP BY ex.qid ORDER BY ex.qid""".stripMargin) { (s, d) =>
      // ANN quality gate: recall@5 of the sign-bucket IVF (q30's
      // index) against the exact scan (q29's baseline), per query and
      // per probe width — nprobe=1 (own bucket) vs nprobe=9 (all
      // Hamming-1 sign flips), the knob an IVF deployment tunes. Run
      // as a query so the oracle hash-pins the ACHIEVED recall: on
      // this corpus the 1-probe recall is near zero (8 sign bits
      // partition random 64-dim vectors too finely — the audit's
      // verdict, not a bug) and multi-probe recovers part of it; at
      // 100 TB this is the continuous-monitoring query that decides
      // when an index needs wider probes or retraining. Rankings use
      // the identical rounded-score + vec_id tie-break on both
      // engines. The multi-probe candidate set explodes the 9 probe
      // buckets from the query side and equi-joins on the bucket —
      // never a bit_count theta scan over the collection.
      val n = prepared(s, d)
        .withColumn("bucket",
          (0 until 8).map(i =>
            when(element_at(col("embedding"), i + 1) > 0f, lit(1 << i))
              .otherwise(lit(0))).reduce(_ + _))
      val q = n.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"), col("bucket").as("qb"))
      val qProbes = q.select(col("qid"), col("qv"), col("qn"),
        explode(array(col("qb") +: (0 until 8).map(i =>
          col("qb").bitwiseXOR(lit(1 << i))): _*)).as("probe"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("cid"))
      def top5(cand: DataFrame): DataFrame = cand
        .select(col("qid"), col("vec_id").as("cid"),
          round(dot(col("qv"), col("v")) /
            (sqrt(col("qn")) * sqrt(col("nrm"))), 6).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("cid"))
      val exact = top5(n.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid")))
      val ivf1 = top5(n.join(broadcast(q), col("bucket") === col("qb"))
        .filter(col("vec_id") =!= col("qid")))
        .toDF("q1", "c1")
      val ivf9 = top5(n.join(broadcast(qProbes),
          col("bucket") === col("probe"))
        .filter(col("vec_id") =!= col("qid")))
        .toDF("q9", "c9")
      exact
        .join(ivf1, col("qid") === col("q1") && col("cid") === col("c1"),
          "left")
        .join(ivf9, col("qid") === col("q9") && col("cid") === col("c9"),
          "left")
        .groupBy(col("qid"))
        .agg((count(col("c1")) * 20).as("recall1_pct"),
          (count(col("c9")) * 20).as("recall9_pct"))
        .orderBy(col("qid"))
    },

    QueryDef(
      "q115_kmeans_ivf",
      "WITH " + lloydA2Sql + "\n" +
      """SELECT a2.j AS cluster_id, count(*) AS n_members,
        |  min(a2.vec_id) AS min_vec,
        |  CAST(sum(e2.q0) AS BIGINT) AS sum_q0
        |FROM a2 JOIN (SELECT vec_id, q[1] AS q0 FROM e) e2
        |  ON e2.vec_id = a2.vec_id
        |GROUP BY a2.j ORDER BY cluster_id""".stripMargin) { (s, d) =>
      // TRAINED IVF: two full Lloyd iterations of k-means (k=8, seeds
      // = vectors 0..7), made exactly reproducible by doing ALL
      // arithmetic on integers. Embeddings quantize to a shifted
      // non-negative grid (floor(x·1000)+1000 ∈ [0,2000] — distances
      // are shift-invariant), so squared distances are exact longs,
      // and the recomputed centroid rounds to the grid via
      // (2S+n) DIV (2n) — nearest-integer on non-negatives, where
      // truncating and flooring division agree across engines (the
      // reason for the shift: they disagree on negatives). No
      // doubles anywhere between quantization and output, so two
      // engines — or two cluster topologies — produce bit-identical
      // centroids and assignments; at 100 TB each iteration is one
      // broadcast-assign pass (distances via a codegen'd zip_with
      // fold, ranked within each vector's 8 candidates) plus one
      // keyed (cluster, dim) sum, the canonical distributed-k-means
      // shape. The grid rounding costs ≤0.05% of the embedding scale
      // per coordinate — noise against k-means' own local optima.
      val a2 = kmeansAssignments(s, d)
      a2.join(quantized(s, d).select(col("vec_id"),
          element_at(col("q"), 1).as("q0")), "vec_id")
        .groupBy(col("j").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          min(col("vec_id")).as("min_vec"),
          sum(col("q0")).cast("long").as("sum_q0"))
        .orderBy(col("cluster_id"))
    },

    QueryDef(
      "q116_trained_ivf_recall",
      "WITH " + lloydA2Sql + ",\n" +
      s"""qd AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
         |         sum((da.v - db.v) * (da.v - db.v)) AS dist
         |       FROM a2 a JOIN a2 b ON a.vec_id < 20
         |                         AND b.vec_id <> a.vec_id
         |       JOIN dims da ON da.vec_id = a.vec_id
         |       JOIN dims db ON db.vec_id = b.vec_id AND db.i = da.i
         |       GROUP BY 1, 2),
         |ex AS (SELECT qid, cid FROM (
         |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |           ORDER BY dist, cid) AS rn FROM qd) WHERE rn <= 5),
         |iv AS (SELECT qid, cid FROM (
         |         SELECT qd.qid, qd.cid, row_number() OVER (
         |             PARTITION BY qd.qid ORDER BY qd.dist, qd.cid) AS rn
         |           FROM qd
         |           JOIN a2 qa ON qa.vec_id = qd.qid
         |           JOIN a2 ca ON ca.vec_id = qd.cid AND ca.j = qa.j)
         |       WHERE rn <= 5)
         |SELECT ex.qid, count(iv.cid) * 20 AS recall_pct
         |FROM ex LEFT JOIN iv ON iv.qid = ex.qid AND iv.cid = ex.cid
         |GROUP BY ex.qid ORDER BY ex.qid""".stripMargin) { (s, d) =>
      // The trained-IVF pipeline end to end: q115's k-means centroids
      // become the index (every vector carries its trained cluster),
      // search runs only within the query's own cell (nprobe=1), and
      // recall@5 is audited against the exact scan — with EVERY
      // distance an exact integer on the quantized grid, so search
      // ranking, index assignment, and the audit itself are all
      // bit-reproducible (q106's cosine audit needs a rounded-double
      // tie-break; here even that is gone). The exact arm computes
      // once per probe (20 queries × collection, keyed on the probe),
      // and the IVF arm restricts it to cell-mates via the
      // assignment join — candidate cost follows cell occupancy,
      // the IVF contract.
      val e = quantized(s, d)
      val a2 = kmeansAssignments(s, d)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("q").as("qq"))
      val dist = graft.cdc.GraftFunctions.vec_l2i(col("qq"), col("q"))
      val qd = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"), dist.as("dist"))
      val wq = Window.partitionBy(col("qid"))
        .orderBy(col("dist"), col("cid"))
      val exact = qd.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 5).select(col("qid"), col("cid"))
      val qCell = a2.select(col("vec_id").as("qid"), col("j").as("qj"))
      val cCell = a2.select(col("vec_id").as("cid"), col("j").as("cj"))
      val ivf = qd.join(broadcast(qCell), "qid").join(cCell, "cid")
        .filter(col("qj") === col("cj"))
        .withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 5)
        .select(col("qid").as("iqid"), col("cid").as("icid"))
      exact.join(ivf,
          col("qid") === col("iqid") && col("cid") === col("icid"), "left")
        .groupBy(col("qid"))
        .agg((count(col("icid")) * 20).as("recall_pct"))
        .orderBy(col("qid"))
    },

    QueryDef(
      "q117_product_quantization",
      """WITH e AS (SELECT vec_id, list_transform(embedding,
        |      x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT) + 1000) AS q
        |    FROM embeddings),
        |dims AS (SELECT vec_id, (i - 1) // 8 AS sub, (i - 1) % 8 AS si,
        |           q[i] AS v
        |         FROM e, UNNEST(range(1, 65)) AS t(i)),
        |c0 AS (SELECT sub, vec_id AS j, si, v AS c FROM dims
        |       WHERE vec_id < 4),
        |d1 AS (SELECT d.vec_id, d.sub, c.j,
        |         sum((d.v - c.c) * (d.v - c.c)) AS dist
        |       FROM dims d JOIN c0 c ON c.sub = d.sub AND c.si = d.si
        |       GROUP BY 1, 2, 3),
        |a1 AS (SELECT vec_id, sub, j FROM (
        |         SELECT vec_id, sub, j, row_number() OVER (
        |           PARTITION BY sub, vec_id ORDER BY dist, j) AS rn
        |         FROM d1) WHERE rn = 1),
        |n1 AS (SELECT sub, j, count(*) AS n FROM a1 GROUP BY sub, j),
        |s1 AS (SELECT a1.sub, a1.j, d.si, sum(d.v) AS s
        |       FROM a1 JOIN dims d ON d.vec_id = a1.vec_id
        |                          AND d.sub = a1.sub
        |       GROUP BY 1, 2, 3),
        |c1 AS (SELECT s1.sub, s1.j, s1.si,
        |         (2 * s1.s + n1.n) // (2 * n1.n) AS c
        |       FROM s1 JOIN n1 ON n1.sub = s1.sub AND n1.j = s1.j),
        |d2 AS (SELECT d.vec_id, d.sub, c.j,
        |         sum((d.v - c.c) * (d.v - c.c)) AS dist
        |       FROM dims d JOIN c1 c ON c.sub = d.sub AND c.si = d.si
        |       GROUP BY 1, 2, 3),
        |a2 AS (SELECT vec_id, sub, j, dist FROM (
        |         SELECT vec_id, sub, j, dist, row_number() OVER (
        |           PARTITION BY sub, vec_id ORDER BY dist, j) AS rn
        |         FROM d2) WHERE rn = 1)
        |SELECT sub, j AS symbol, count(*) AS n_members,
        |  CAST(sum(dist) AS BIGINT) AS sum_sq_err
        |FROM a2 GROUP BY sub, j ORDER BY sub, symbol""".stripMargin) {
      (s, d) =>
        // Product quantization — the 8-byte-per-vector compression an
        // ANN index stores instead of raw floats: 8 subspaces of 8
        // dims, each with its own k=4 codebook trained by one
        // exact-integer Lloyd iteration (the q115 grid recipe per
        // subspace, so codebooks and code assignments are
        // bit-reproducible). Output: per (subspace, symbol) the code
        // usage and the EXACT summed squared reconstruction error —
        // the audit that decides codebook size vs recall budget (the
        // PQ analogue of q63's scalar-quantization MSE). Training and
        // encoding are keyed aggs over (sub, symbol, dim); at 100 TB
        // the codebooks are 8×4×8 integers broadcast everywhere —
        // encode is one map-side pass.
        pqAssignments(s, d)
          .groupBy(col("sub"), col("symbol").as("symbol"))
          .agg(count(lit(1)).as("n_members"),
            sum(col("err")).cast("long").as("sum_sq_err"))
          .orderBy(col("sub"), col("symbol"))
    },

    QueryDef(
      "q118_pq_adc_recall",
      """WITH e AS (SELECT vec_id, list_transform(embedding,
        |      x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT) + 1000) AS q
        |    FROM embeddings),
        |dims AS (SELECT vec_id, (i - 1) // 8 AS sub, (i - 1) % 8 AS si,
        |           q[i] AS v
        |         FROM e, UNNEST(range(1, 65)) AS t(i)),
        |c0 AS (SELECT sub, vec_id AS j, si, v AS c FROM dims
        |       WHERE vec_id < 4),
        |d1 AS (SELECT d.vec_id, d.sub, c.j,
        |         sum((d.v - c.c) * (d.v - c.c)) AS dist
        |       FROM dims d JOIN c0 c ON c.sub = d.sub AND c.si = d.si
        |       GROUP BY 1, 2, 3),
        |a1 AS (SELECT vec_id, sub, j FROM (
        |         SELECT vec_id, sub, j, row_number() OVER (
        |           PARTITION BY sub, vec_id ORDER BY dist, j) AS rn
        |         FROM d1) WHERE rn = 1),
        |n1 AS (SELECT sub, j, count(*) AS n FROM a1 GROUP BY sub, j),
        |s1 AS (SELECT a1.sub, a1.j, d.si, sum(d.v) AS s
        |       FROM a1 JOIN dims d ON d.vec_id = a1.vec_id
        |                          AND d.sub = a1.sub
        |       GROUP BY 1, 2, 3),
        |c1 AS (SELECT s1.sub, s1.j, s1.si,
        |         (2 * s1.s + n1.n) // (2 * n1.n) AS c
        |       FROM s1 JOIN n1 ON n1.sub = s1.sub AND n1.j = s1.j),
        |d2 AS (SELECT d.vec_id, d.sub, c.j,
        |         sum((d.v - c.c) * (d.v - c.c)) AS dist
        |       FROM dims d JOIN c1 c ON c.sub = d.sub AND c.si = d.si
        |       GROUP BY 1, 2, 3),
        |a2 AS (SELECT vec_id, sub, j FROM (
        |         SELECT vec_id, sub, j, row_number() OVER (
        |           PARTITION BY sub, vec_id ORDER BY dist, j) AS rn
        |         FROM d2) WHERE rn = 1),
        |qsub AS (SELECT vec_id AS qid, sub, si, v FROM dims
        |         WHERE vec_id < 20),
        |adc AS (SELECT qs.qid, a2.vec_id AS cid,
        |         sum((qs.v - c1.c) * (qs.v - c1.c)) AS dist
        |       FROM qsub qs
        |       JOIN a2 ON a2.sub = qs.sub AND a2.vec_id <> qs.qid
        |       JOIN c1 ON c1.sub = qs.sub AND c1.j = a2.j
        |              AND c1.si = qs.si
        |       GROUP BY 1, 2),
        |pq5 AS (SELECT qid, cid FROM (
        |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |           ORDER BY dist, cid) AS rn FROM adc) WHERE rn <= 5),
        |ed AS (SELECT dq.vec_id AS qid, dc.vec_id AS cid,
        |         sum((dq.v - dc.v) * (dq.v - dc.v)) AS dist
        |       FROM dims dq JOIN dims dc ON dc.sub = dq.sub
        |                                AND dc.si = dq.si
        |                                AND dc.vec_id <> dq.vec_id
        |       WHERE dq.vec_id < 20 GROUP BY 1, 2),
        |ex AS (SELECT qid, cid FROM (
        |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |           ORDER BY dist, cid) AS rn FROM ed) WHERE rn <= 5)
        |SELECT ex.qid, count(pq5.cid) * 20 AS recall_pct
        |FROM ex LEFT JOIN pq5 ON pq5.qid = ex.qid AND pq5.cid = ex.cid
        |GROUP BY ex.qid ORDER BY ex.qid""".stripMargin) { (s, d) =>
      // Compressed-domain search — what PQ exists for: candidates are
      // ranked by ASYMMETRIC distance (uncompressed query subvector
      // vs each candidate's codebook centroid), so the scan touches
      // 8 symbols per candidate instead of 64 raw dims, and the
      // recall@5 audit against the exact integer scan quantifies what
      // the 8-byte compression costs. Every distance stays an exact
      // integer (query, codebooks, and codes all live on the q115
      // grid) — rankings bit-reproducible in both engines. The ADC
      // join is keyed on (sub, symbol) against a broadcast codebook
      // of 8x4 centroids: per-candidate cost is 8 lookups + adds, the
      // table-scan shape a PQ index serves at 100 TB.
      val cb = pqCodebooks(s, d).withColumnRenamed("j", "symbol")
      val codes = pqAssignments(s, d)
        .select(col("vec_id").as("cid"), col("sub"), col("symbol"))
      val qsubs = subVectors(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("sub"), col("sq"))
      val wq = Window.partitionBy(col("qid"))
        .orderBy(col("dist"), col("cid"))
      val adc = qsubs.join(codes, "sub")
        .filter(col("cid") =!= col("qid"))
        .join(broadcast(cb), Seq("sub", "symbol"))
        .select(col("qid"), col("cid"), pqDistExpr.as("pd"))
        .groupBy(col("qid"), col("cid")).agg(sum(col("pd")).as("dist"))
      val pq5 = adc.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 5)
        .select(col("qid").as("pqid"), col("cid").as("pcid"))
      val e = quantized(s, d)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("q").as("qq"))
      val exDist = graft.cdc.GraftFunctions.vec_l2i(col("qq"), col("q"))
      val exact = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"), exDist.as("dist"))
        .withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("cid"))
      exact.join(pq5,
          col("qid") === col("pqid") && col("cid") === col("pcid"), "left")
        .groupBy(col("qid"))
        .agg((count(col("pcid")) * 20).as("recall_pct"))
        .orderBy(col("qid"))
    },

    // ---- q269: IVF + PQ-ADC + exact refine (the composed ANN read
    // path) ------------------------------------------------------
    // q116 proves the coarse quantizer, q117/q118 the compressed
    // codes — this composes them into the pipeline a production ANN
    // index actually serves (FAISS IVFADC + refine): (1) coarse:
    // candidates = the query's own trained cell (nprobe=1); (2) scan:
    // rank cell-mates by ASYMMETRIC distance — the query's 8 subvector
    // distances to each subspace codebook are precomputed ONCE into a
    // (queries x 8 x 4)-row distance TABLE and broadcast, so each
    // candidate costs 8 lookups + adds, never 64 dims; (3) refine:
    // the ADC top-10 are re-ranked by exact integer L2 (10 raw
    // vectors fetched per query), top-5 kept; (4) audit: recall@5 vs
    // the global exact scan, plus the cell's candidate volume — the
    // two numbers that price the accuracy/cost trade end to end.
    // Every distance is exact-integer on the shared q115 grid, so
    // all three stages rank bit-identically in both engines. At
    // 100 TB: dtab is queries x 32 rows broadcast, candidate gen is
    // one equi-join keyed on the cell id, the ADC scan is keyed
    // (cid)-side lookups against broadcast state, and refine touches
    // R=10 raw vectors per query — each stage's cost is the textbook
    // IVFADC bound, none rescans the corpus.
    QueryDef(
      "q269_ivfpq_refine_recall",
      "WITH " + lloydA2Sql + s""",
         |pdims AS (SELECT vec_id, (i - 1) // 8 AS sub, (i - 1) % 8 AS si,
         |            v FROM dims),
         |pc0 AS (SELECT sub, vec_id AS j, si, v AS c FROM pdims
         |        WHERE vec_id < 4),
         |pd1 AS (SELECT d.vec_id, d.sub, c.j,
         |          sum((d.v - c.c) * (d.v - c.c)) AS dist
         |        FROM pdims d JOIN pc0 c ON c.sub = d.sub AND c.si = d.si
         |        GROUP BY 1, 2, 3),
         |pa1 AS (SELECT vec_id, sub, j FROM (
         |          SELECT vec_id, sub, j, row_number() OVER (
         |            PARTITION BY sub, vec_id ORDER BY dist, j) AS rn
         |          FROM pd1) WHERE rn = 1),
         |pn1 AS (SELECT sub, j, count(*) AS n FROM pa1 GROUP BY sub, j),
         |ps1 AS (SELECT pa1.sub, pa1.j, d.si, sum(d.v) AS s
         |        FROM pa1 JOIN pdims d ON d.vec_id = pa1.vec_id
         |                             AND d.sub = pa1.sub
         |        GROUP BY 1, 2, 3),
         |pc1 AS (SELECT ps1.sub, ps1.j, ps1.si,
         |          (2 * ps1.s + pn1.n) // (2 * pn1.n) AS c
         |        FROM ps1 JOIN pn1 ON pn1.sub = ps1.sub AND pn1.j = ps1.j),
         |pd2 AS (SELECT d.vec_id, d.sub, c.j,
         |          sum((d.v - c.c) * (d.v - c.c)) AS dist
         |        FROM pdims d JOIN pc1 c ON c.sub = d.sub AND c.si = d.si
         |        GROUP BY 1, 2, 3),
         |pa2 AS (SELECT vec_id, sub, j FROM (
         |          SELECT vec_id, sub, j, row_number() OVER (
         |            PARTITION BY sub, vec_id ORDER BY dist, j) AS rn
         |          FROM pd2) WHERE rn = 1),
         |qsub AS (SELECT vec_id AS qid, sub, si, v FROM pdims
         |         WHERE vec_id < 20),
         |dtab AS (SELECT qs.qid, qs.sub, c.j,
         |           sum((qs.v - c.c) * (qs.v - c.c)) AS d
         |         FROM qsub qs JOIN pc1 c ON c.sub = qs.sub
         |                                AND c.si = qs.si
         |         GROUP BY 1, 2, 3),
         |cand AS (SELECT qa.vec_id AS qid, ca.vec_id AS cid
         |         FROM a2 qa JOIN a2 ca ON qa.vec_id < 20
         |                    AND ca.j = qa.j AND ca.vec_id <> qa.vec_id),
         |adc AS (SELECT cand.qid, cand.cid, sum(dtab.d) AS dist
         |        FROM cand JOIN pa2 ON pa2.vec_id = cand.cid
         |             JOIN dtab ON dtab.qid = cand.qid
         |                      AND dtab.sub = pa2.sub AND dtab.j = pa2.j
         |        GROUP BY 1, 2),
         |sh AS (SELECT qid, cid FROM (
         |        SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |          ORDER BY dist, cid) AS rn FROM adc) WHERE rn <= 10),
         |rf AS (SELECT sh.qid, sh.cid,
         |          sum((dq.v - dc.v) * (dq.v - dc.v)) AS dist
         |       FROM sh JOIN dims dq ON dq.vec_id = sh.qid
         |            JOIN dims dc ON dc.vec_id = sh.cid AND dc.i = dq.i
         |       GROUP BY 1, 2),
         |r5 AS (SELECT qid, cid FROM (
         |        SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |          ORDER BY dist, cid) AS rn FROM rf) WHERE rn <= 5),
         |ncd AS (SELECT qid, count(*) AS n_cand FROM cand GROUP BY qid),
         |qd AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
         |         sum((da.v - db.v) * (da.v - db.v)) AS dist
         |       FROM a2 a JOIN a2 b ON a.vec_id < 20
         |                         AND b.vec_id <> a.vec_id
         |       JOIN dims da ON da.vec_id = a.vec_id
         |       JOIN dims db ON db.vec_id = b.vec_id AND db.i = da.i
         |       GROUP BY 1, 2),
         |ex AS (SELECT qid, cid FROM (
         |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |           ORDER BY dist, cid) AS rn FROM qd) WHERE rn <= 5)
         |SELECT ex.qid,
         |  CAST(coalesce(max(ncd.n_cand), 0) AS BIGINT) AS n_cand,
         |  count(r5.cid) * 20 AS recall_pct
         |FROM ex LEFT JOIN ncd ON ncd.qid = ex.qid
         |     LEFT JOIN r5 ON r5.qid = ex.qid AND r5.cid = ex.cid
         |GROUP BY ex.qid ORDER BY ex.qid""".stripMargin) { (s, d) =>
      val e = quantized(s, d)
      val a2 = kmeansAssignments(s, d)
      val qCell = a2.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("j"))
      val cand = a2.select(col("vec_id").as("cid"), col("j"))
        .join(broadcast(qCell), "j")
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"))
      val cb = pqCodebooks(s, d)
      val qs = subVectors(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("sub"), col("sq"))
      val dtab = qs.join(broadcast(cb), "sub")
        .select(col("qid"), col("sub"), col("j").as("symbol"),
          graft.cdc.GraftFunctions.vec_l2i(col("sq"), col("c")).as("dsub"))
      val codes = pqAssignments(s, d)
        .select(col("vec_id").as("cid"), col("sub"), col("symbol"))
      val adc = cand.join(codes, "cid")
        .join(broadcast(dtab), Seq("qid", "sub", "symbol"))
        .groupBy(col("qid"), col("cid"))
        .agg(sum(col("dsub")).as("dist"))
      val wq = Window.partitionBy(col("qid"))
        .orderBy(col("dist"), col("cid"))
      val sh = adc.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 10).select(col("qid"), col("cid"))
      val qq = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("q").as("qq"))
      val rf = sh.join(broadcast(qq), "qid")
        .join(e.withColumnRenamed("vec_id", "cid"), "cid")
        .select(col("qid"), col("cid"),
          graft.cdc.GraftFunctions.vec_l2i(col("qq"), col("q")).as("dist"))
      val r5 = rf.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 5)
        .select(col("qid").as("rqid"), col("cid").as("rcid"))
      val ncd = cand.groupBy(col("qid")).agg(count(lit(1)).as("n_cand"))
      val qd = e.crossJoin(broadcast(qq))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          graft.cdc.GraftFunctions.vec_l2i(col("qq"), col("q")).as("dist"))
      val ex = qd.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 5).select(col("qid"), col("cid"))
      ex.join(broadcast(ncd), Seq("qid"), "left")
        .join(r5, col("qid") === col("rqid") &&
          col("cid") === col("rcid"), "left")
        .groupBy(col("qid"))
        .agg(coalesce(max(col("n_cand")), lit(0L)).cast("long")
            .as("n_cand"),
          (count(col("rcid")) * 20).as("recall_pct"))
        .orderBy(col("qid"))
    },

    // ---- q271: refine-depth tuning sweep --------------------------
    // q269 fixes the refine depth at 10; this prices the knob the way
    // q246 prices nprobe: recall@5 and re-rank volume at R = 5/10/20.
    // ONE ADC ranking and ONE exact-distance pass (bounded by R_max =
    // 20 pairs per query) feed all three arms — the arms differ only
    // in a rank predicate against a 3-row broadcast depth relation,
    // so sweep cost is R_max, not Σ R. With 20 queries × 5 slots the
    // summed hit count IS the recall percentage. The tuning read-out:
    // where recall plateaus, stop paying raw-vector fetches.
    QueryDef(
      "q271_refine_depth_sweep",
      "WITH " + lloydA2Sql + s""",
         |pdims AS (SELECT vec_id, (i - 1) // 8 AS sub, (i - 1) % 8 AS si,
         |            v FROM dims),
         |pc0 AS (SELECT sub, vec_id AS j, si, v AS c FROM pdims
         |        WHERE vec_id < 4),
         |pd1 AS (SELECT d.vec_id, d.sub, c.j,
         |          sum((d.v - c.c) * (d.v - c.c)) AS dist
         |        FROM pdims d JOIN pc0 c ON c.sub = d.sub AND c.si = d.si
         |        GROUP BY 1, 2, 3),
         |pa1 AS (SELECT vec_id, sub, j FROM (
         |          SELECT vec_id, sub, j, row_number() OVER (
         |            PARTITION BY sub, vec_id ORDER BY dist, j) AS rn
         |          FROM pd1) WHERE rn = 1),
         |pn1 AS (SELECT sub, j, count(*) AS n FROM pa1 GROUP BY sub, j),
         |ps1 AS (SELECT pa1.sub, pa1.j, d.si, sum(d.v) AS s
         |        FROM pa1 JOIN pdims d ON d.vec_id = pa1.vec_id
         |                             AND d.sub = pa1.sub
         |        GROUP BY 1, 2, 3),
         |pc1 AS (SELECT ps1.sub, ps1.j, ps1.si,
         |          (2 * ps1.s + pn1.n) // (2 * pn1.n) AS c
         |        FROM ps1 JOIN pn1 ON pn1.sub = ps1.sub AND pn1.j = ps1.j),
         |pd2 AS (SELECT d.vec_id, d.sub, c.j,
         |          sum((d.v - c.c) * (d.v - c.c)) AS dist
         |        FROM pdims d JOIN pc1 c ON c.sub = d.sub AND c.si = d.si
         |        GROUP BY 1, 2, 3),
         |pa2 AS (SELECT vec_id, sub, j FROM (
         |          SELECT vec_id, sub, j, row_number() OVER (
         |            PARTITION BY sub, vec_id ORDER BY dist, j) AS rn
         |          FROM pd2) WHERE rn = 1),
         |qsub AS (SELECT vec_id AS qid, sub, si, v FROM pdims
         |         WHERE vec_id < 20),
         |dtab AS (SELECT qs.qid, qs.sub, c.j,
         |           sum((qs.v - c.c) * (qs.v - c.c)) AS d
         |         FROM qsub qs JOIN pc1 c ON c.sub = qs.sub
         |                                AND c.si = qs.si
         |         GROUP BY 1, 2, 3),
         |cand AS (SELECT qa.vec_id AS qid, ca.vec_id AS cid
         |         FROM a2 qa JOIN a2 ca ON qa.vec_id < 20
         |                    AND ca.j = qa.j AND ca.vec_id <> qa.vec_id),
         |adc AS (SELECT cand.qid, cand.cid, sum(dtab.d) AS dist
         |        FROM cand JOIN pa2 ON pa2.vec_id = cand.cid
         |             JOIN dtab ON dtab.qid = cand.qid
         |                      AND dtab.sub = pa2.sub AND dtab.j = pa2.j
         |        GROUP BY 1, 2),
         |sh20 AS (SELECT qid, cid, rn FROM (
         |        SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |          ORDER BY dist, cid) AS rn FROM adc) WHERE rn <= 20),
         |rfd AS (SELECT s.qid, s.cid, s.rn,
         |          sum((dq.v - dc.v) * (dq.v - dc.v)) AS dist
         |       FROM sh20 s JOIN dims dq ON dq.vec_id = s.qid
         |            JOIN dims dc ON dc.vec_id = s.cid AND dc.i = dq.i
         |       GROUP BY 1, 2, 3),
         |depths(r) AS (VALUES (5), (10), (20)),
         |arm AS (SELECT d.r, f.qid, f.cid, row_number() OVER (
         |          PARTITION BY d.r, f.qid ORDER BY f.dist, f.cid) AS rr
         |        FROM depths d JOIN rfd f ON f.rn <= d.r),
         |top5 AS (SELECT r, qid, cid FROM arm WHERE rr <= 5),
         |nrr AS (SELECT d.r, count(*) AS n_reranked
         |        FROM depths d JOIN sh20 s ON s.rn <= d.r GROUP BY d.r),
         |qd AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
         |         sum((da.v - db.v) * (da.v - db.v)) AS dist
         |       FROM a2 a JOIN a2 b ON a.vec_id < 20
         |                         AND b.vec_id <> a.vec_id
         |       JOIN dims da ON da.vec_id = a.vec_id
         |       JOIN dims db ON db.vec_id = b.vec_id AND db.i = da.i
         |       GROUP BY 1, 2),
         |ex AS (SELECT qid, cid FROM (
         |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |           ORDER BY dist, cid) AS rn FROM qd) WHERE rn <= 5),
         |hits AS (SELECT t.r, count(*) AS nh FROM top5 t
         |         JOIN ex ON ex.qid = t.qid AND ex.cid = t.cid
         |         GROUP BY t.r)
         |SELECT d.r AS refine_depth,
         |  CAST(nrr.n_reranked AS BIGINT) AS n_reranked,
         |  CAST(coalesce(h.nh, 0) AS BIGINT) AS recall_pct
         |FROM depths d
         |  JOIN nrr ON nrr.r = d.r
         |  LEFT JOIN hits h ON h.r = d.r
         |ORDER BY refine_depth""".stripMargin) { (s, d) =>
      val e = quantized(s, d)
      val a2 = kmeansAssignments(s, d)
      val qCell = a2.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("j"))
      val cand = a2.select(col("vec_id").as("cid"), col("j"))
        .join(broadcast(qCell), "j")
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"))
      val cb = pqCodebooks(s, d)
      val qs = subVectors(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("sub"), col("sq"))
      val dtab = qs.join(broadcast(cb), "sub")
        .select(col("qid"), col("sub"), col("j").as("symbol"),
          graft.cdc.GraftFunctions.vec_l2i(col("sq"), col("c")).as("dsub"))
      val codes = pqAssignments(s, d)
        .select(col("vec_id").as("cid"), col("sub"), col("symbol"))
      val adc = cand.join(codes, "cid")
        .join(broadcast(dtab), Seq("qid", "sub", "symbol"))
        .groupBy(col("qid"), col("cid"))
        .agg(sum(col("dsub")).as("dist"))
      val wq = Window.partitionBy(col("qid"))
        .orderBy(col("dist"), col("cid"))
      val sh20 = adc.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 20).select(col("qid"), col("cid"), col("rn"))
      val qq = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("q").as("qq"))
      val rfd = sh20.join(broadcast(qq), "qid")
        .join(e.withColumnRenamed("vec_id", "cid"), "cid")
        .select(col("qid"), col("cid"), col("rn"),
          graft.cdc.GraftFunctions.vec_l2i(col("qq"), col("q")).as("dist"))
      val depths = s.range(3)
        .select(when(col("id") === 0, 5).when(col("id") === 1, 10)
          .otherwise(20).cast("int").as("r"))
      val arm = rfd.join(broadcast(depths), col("rn") <= col("r"))
        .withColumn("rr", row_number().over(Window
          .partitionBy(col("r"), col("qid"))
          .orderBy(col("dist"), col("cid"))))
      val top5 = arm.filter(col("rr") <= 5)
        .select(col("r").as("tr"), col("qid").as("tqid"),
          col("cid").as("tcid"))
      val nrr = sh20.join(broadcast(depths), col("rn") <= col("r"))
        .groupBy(col("r")).agg(count(lit(1)).as("n_reranked"))
      val qd = e.crossJoin(broadcast(qq))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          graft.cdc.GraftFunctions.vec_l2i(col("qq"), col("q")).as("dist"))
      val ex = qd.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 5).select(col("qid"), col("cid"))
      // hits per depth = inner-join count (== the LEFT-JOIN non-null
      // count, with the fixed 100-slot denominator implicit); the
      // final stitch is an equi-join of two 3-row aggregates — no
      // complex-subtree broadcast for the plan pin to choke on
      val hits = top5.join(ex, col("tqid") === col("qid") &&
          col("tcid") === col("cid"))
        .groupBy(col("tr").as("r")).agg(count(lit(1)).as("nh"))
      nrr.join(hits, Seq("r"), "left")
        .select(col("r").as("refine_depth"),
          col("n_reranked").cast("long").as("n_reranked"),
          coalesce(col("nh"), lit(0L)).cast("long").as("recall_pct"))
        .orderBy(col("refine_depth"))
    },

    QueryDef(
      "q122_semantic_dedup",
      "WITH " + lloydA2Sql + ",\n" +
      s"""er AS (SELECT vec_id,
         |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |nr AS (SELECT vec_id, v, ${dotSql("v", "v")} AS nrm FROM er),
         |dup AS (SELECT qa.j AS cluster_id, qa.vec_id AS d1,
         |    qb.vec_id AS d2
         |  FROM a2 qa JOIN a2 qb
         |    ON qa.j = qb.j AND qa.vec_id < qb.vec_id
         |  JOIN nr a ON a.vec_id = qa.vec_id
         |  JOIN nr b ON b.vec_id = qb.vec_id
         |  WHERE ${dotSql("a.v", "b.v")} / (sqrt(a.nrm) * sqrt(b.nrm))
         |        >= 0.35),
         |mem AS (SELECT j AS cluster_id, count(*) AS n_members
         |        FROM a2 GROUP BY j),
         |st AS (SELECT cluster_id, count(*) AS n_dup_pairs,
         |         count(DISTINCT d2) AS n_to_drop
         |       FROM dup GROUP BY cluster_id)
         |SELECT m.cluster_id, m.n_members,
         |  CAST(coalesce(st.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
         |  CAST(coalesce(st.n_to_drop, 0) AS BIGINT) AS n_to_drop
         |FROM mem m LEFT JOIN st ON st.cluster_id = m.cluster_id
         |ORDER BY m.cluster_id""".stripMargin) { (s, d) =>
      // SemDeDup (Abbas et al. 2023): semantic dedup scoped to trained
      // k-means cells — embeddings cluster first (the shared exact-
      // integer Lloyd assignment), then cosine near-dup pairs are
      // sought only WITHIN each cell, and every higher-id member of a
      // duplicate pair is marked droppable (keep-lowest, the q55
      // canonical-selection rule). The cluster key bounds the pair
      // space: candidates scale with cell occupancy, never corpus².
      // At 100 TB the cell count k grows with N (fixed target cell
      // size), keeping within-cell pair work linear overall — k=8
      // here is the bit-reproducible oracle fixture, not the scale
      // setting. Cosine compares the raw left-to-right-folded double
      // (the q44 recipe), so the threshold cut is engine-identical.
      val a2 = kmeansAssignments(s, d)
      val m = prepared(s, d).join(a2, "vec_id")
      val aSide = m.select(col("j"), col("vec_id").as("d1"),
        col("v").as("av"), col("nrm").as("an"))
      val bSide = m.select(col("j"), col("vec_id").as("d2"),
        col("v").as("bv"), col("nrm").as("bn"))
      val dup = aSide.join(bSide, Seq("j"))
        .filter(col("d1") < col("d2"))
        .filter(dot(col("av"), col("bv")) /
          (sqrt(col("an")) * sqrt(col("bn"))) >= 0.35)
      val mem = a2.groupBy(col("j").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      val st = dup.groupBy(col("j").as("cluster_id"))
        .agg(count(lit(1)).as("n_dup_pairs"),
          countDistinct(col("d2")).as("n_to_drop"))
      mem.join(st, Seq("cluster_id"), "left")
        .select(col("cluster_id"), col("n_members"),
          coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
          coalesce(col("n_to_drop"), lit(0L)).as("n_to_drop"))
        .orderBy(col("cluster_id"))
    },

    QueryDef(
      "q132_label_centroid_cohesion",
      """WITH e AS (SELECT vec_id, label, list_transform(embedding,
        |      x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT) + 1000) AS q
        |    FROM embeddings),
        |dims AS (SELECT label, vec_id, i, q[i] AS v
        |         FROM e, UNNEST(range(1, 65)) AS t(i)),
        |n AS (SELECT label, count(*) AS n FROM e GROUP BY label),
        |cent AS (SELECT d.label, d.i,
        |    (2 * sum(d.v) + n.n) // (2 * n.n) AS c
        |  FROM dims d JOIN n ON n.label = d.label
        |  GROUP BY d.label, d.i, n.n),
        |nrm AS (SELECT label,
        |    sum((c - 1000) * (c - 1000)) AS centroid_norm2
        |  FROM cent GROUP BY label),
        |d2 AS (SELECT d.label, d.vec_id,
        |    sum((d.v - c.c) * (d.v - c.c)) AS dist2
        |  FROM dims d JOIN cent c ON c.label = d.label AND c.i = d.i
        |  GROUP BY d.label, d.vec_id)
        |SELECT CAST(d2.label AS BIGINT) AS label,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(any_value(centroid_norm2) AS BIGINT) AS centroid_norm2,
        |  CAST(sum(dist2) // count(*) AS BIGINT) AS mean_dist2
        |FROM d2 JOIN nrm ON nrm.label = d2.label
        |GROUP BY d2.label ORDER BY label""".stripMargin) { (s, d) =>
      // Per-label embedding centroid + cohesion — the domain-drift
      // monitor a training pipeline runs over embedded data: each
      // class's exact integer centroid (same shifted-grid + rounded-
      // mean recipe as the Lloyd chain, so it is bit-reproducible
      // across engines and cluster topologies), its norm, and the
      // mean squared distance of members to it. A source whose
      // cohesion degrades between snapshots has drifted or been
      // polluted. Scale shape: the grid explode is map-side; the
      // centroid table is one keyed (label, dim) agg collapsing to
      // #labels×64 rows, broadcast back; per-vector distances are one
      // more keyed agg pair — partial+final everywhere, and every
      // quantity is int64 so reduce order is irrelevant.
      val e = embeddings(s, d).select(col("vec_id"),
        col("label").cast("long").as("label"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
          " * 1000) AS BIGINT) + 1000)").as("q"))
      val dims = e.select(col("label"), col("vec_id"),
        posexplode(col("q")).as(Seq("i", "v")))
      val n = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
      val cent = dims.groupBy(col("label"), col("i"))
        .agg(sum(col("v")).as("sv"))
        .join(n, "label")
        .select(col("label"), col("i"),
          expr("(2 * sv + n) DIV (2 * n)").as("c"))
      val nrm = cent.groupBy(col("label"))
        .agg(sum((col("c") - 1000L) * (col("c") - 1000L))
          .as("centroid_norm2"))
      val d2 = dims.join(broadcast(cent), Seq("label", "i"))
        .select(col("label"), col("vec_id"),
          ((col("v") - col("c")) * (col("v") - col("c"))).as("sq"))
        .groupBy(col("label"), col("vec_id"))
        .agg(sum(col("sq")).as("dist2"))
      d2.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("dist2")).as("tot"))
        .join(broadcast(nrm), "label")
        .select(col("label"), col("n_vecs"),
          col("centroid_norm2").cast("long").as("centroid_norm2"),
          expr("tot DIV n_vecs").as("mean_dist2"))
        .orderBy(col("label"))
    },

    // ---- q172: Matryoshka prefix-dimension recall audit -----------
    // The MRL (Kusupati et al. 2022) deployment question: if search
    // ranks by only the FIRST 16 of 64 dimensions (4x cheaper dots,
    // 4x smaller index), how much of the exact top-5 survives?
    // Both arms run on the shared quantized integer grid, so every
    // distance is an exact int64 and the audit is bit-reproducible —
    // the q116 recall-audit shape with the index arm replaced by a
    // prefix-metric arm. Scale shape: one pass over the collection
    // computes both distances per (query, candidate) from the same
    // row (no second scan), per-query top-5 prunes through
    // WindowGroupLimit; the exact arm is the k-query audit pattern —
    // production search would run the prefix arm + full-dim rerank.
    QueryDef(
      "q172_matryoshka_recall",
      """WITH e AS (SELECT vec_id, list_transform(embedding,
        |      x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT) + 1000) AS q
        |    FROM embeddings),
        |qs AS (SELECT vec_id AS qid, q AS qq FROM e WHERE vec_id < 20),
        |qd AS (SELECT qid, e.vec_id AS cid,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> (qq[i] - e.q[i]) * (qq[i] - e.q[i])),
        |      (acc, x) -> acc + x) AS dfull,
        |    list_reduce(list_transform(range(1, 17),
        |      i -> (qq[i] - e.q[i]) * (qq[i] - e.q[i])),
        |      (acc, x) -> acc + x) AS dpre
        |  FROM qs JOIN e ON e.vec_id <> qid),
        |ex AS (SELECT qid, cid FROM (
        |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |      ORDER BY dfull, cid) AS rn FROM qd) WHERE rn <= 5),
        |pr AS (SELECT qid, cid FROM (
        |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |      ORDER BY dpre, cid) AS rn FROM qd) WHERE rn <= 5)
        |SELECT ex.qid, count(pr.cid) * 20 AS recall_pct
        |FROM ex LEFT JOIN pr ON pr.qid = ex.qid AND pr.cid = ex.cid
        |GROUP BY ex.qid ORDER BY ex.qid""".stripMargin) { (s, d) =>
      val e = quantized(s, d)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("q").as("qq"))
      val dFull = graft.cdc.GraftFunctions.vec_l2i(col("qq"), col("q"))
      val dPre = graft.cdc.GraftFunctions.vec_l2i(
        expr("slice(qq, 1, 16)"), expr("slice(q, 1, 16)"))
      val qd = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          dFull.as("dfull"), dPre.as("dpre"))
      val wq = Window.partitionBy(col("qid"))
      val exact = qd
        .withColumn("rn", row_number().over(
          wq.orderBy(col("dfull"), col("cid"))))
        .filter(col("rn") <= 5).select(col("qid"), col("cid"))
      val pre = qd
        .withColumn("rn", row_number().over(
          wq.orderBy(col("dpre"), col("cid"))))
        .filter(col("rn") <= 5)
        .select(col("qid").as("pqid"), col("cid").as("pcid"))
      exact.join(pre,
          col("qid") === col("pqid") && col("cid") === col("pcid"), "left")
        .groupBy(col("qid"))
        .agg((count(col("pcid")) * 20).as("recall_pct"))
        .orderBy(col("qid"))
    },

    // ---- q179: embedding drift between dataset halves -------------
    // The re-embedding regression check q132's single-snapshot
    // cohesion cannot do: split the collection into two deterministic
    // halves (vec_id parity standing in for old/new embedding runs),
    // compute each label's centroid per half on the shared integer
    // grid (q132's rounded-division convention), and report the
    // squared centroid shift — a per-label drift alarm with zero
    // float accumulation. Scale shape: one (half, label, dim) keyed
    // agg over the exploded dims, then all downstream work on
    // #labels x 64 rows; the centroid join is trivially broadcast.
    QueryDef(
      "q179_centroid_split_drift",
      """WITH e AS (SELECT vec_id, label, list_transform(embedding,
        |      x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT) + 1000) AS q
        |    FROM embeddings),
        |dims AS (SELECT vec_id % 2 AS half, label, i, q[i] AS v
        |         FROM e, UNNEST(range(1, 65)) AS t(i)),
        |c AS (SELECT half, label, i,
        |    (2 * sum(v) + count(*)) // (2 * count(*)) AS c,
        |    count(*) AS n
        |  FROM dims GROUP BY half, label, i)
        |SELECT a.label, CAST(max(a.n) AS BIGINT) AS n_a,
        |  CAST(max(b.n) AS BIGINT) AS n_b,
        |  CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS drift2
        |FROM c a JOIN c b ON a.label = b.label AND a.i = b.i
        |WHERE a.half = 0 AND b.half = 1
        |GROUP BY a.label ORDER BY a.label""".stripMargin) { (s, d) =>
      val e = embeddings(s, d).select(col("vec_id"), col("label"), expr(quantizeSql).as("q"))
      val dims = e.select((col("vec_id") % 2).as("half"), col("label"),
          posexplode(col("q")).as(Seq("i", "v")))
      val c = dims.groupBy(col("half"), col("label"), col("i"))
        .agg(expr("(2 * sum(v) + count(1)) DIV (2 * count(1))").as("c"),
          count(lit(1)).as("n"))
      val a = c.filter(col("half") === 0)
        .select(col("label"), col("i"), col("c").as("ca"), col("n").as("na"))
      val b = c.filter(col("half") === 1)
        .select(col("label"), col("i"), col("c").as("cb"), col("n").as("nb"))
      a.join(b, Seq("label", "i"))
        .groupBy(col("label"))
        .agg(max(col("na")).cast("long").as("n_a"),
          max(col("nb")).cast("long").as("n_b"),
          sum((col("ca") - col("cb")) * (col("ca") - col("cb")))
            .cast("long").as("drift2"))
        .orderBy(col("label"))
    },

    // ---- q230: retrieval ranking metrics (MRR, nDCG@10) -----------
    // The retrieval-eval pass every RAG/embedding pipeline runs: how
    // good is the ANN index's RANKING, not just its recall-set? Exact
    // top-10 cosine neighbors are the graded ground truth (relevance
    // 10..1 by exact rank); the system under test is the 8-bit
    // sign-bucket IVF (q30's single-probe arm). Metrics in exact
    // integers: MRR as 1000000 DIV first-hit-rank, nDCG@10 with the
    // 1/log2(i+1) discounts as a SHARED fixed-point constant table
    // (micro-units) so both engines sum identical longs — no
    // transcendental at query time, the q124/q142 recipe. Scale
    // shape: ground truth is the O(N·20) broadcast audit arm (fine as
    // an audit; the production arm swaps in q116's trained-IVF
    // candidates); everything downstream is 20 queries × ≤10 rows.
    QueryDef(
      "q230_ranking_metrics",
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> x::DOUBLE) AS v,
         |    list_reduce(list_transform(range(1, 9), i ->
         |      CASE WHEN embedding[i] > 0 THEN 1 << (i - 1) ELSE 0 END),
         |      (a, b) -> a + b) AS bucket
         |  FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, ${dotSql("v", "v")} AS nrm FROM e),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, bucket AS qb
         |      FROM n WHERE vec_id < 20),
         |dm(i, w) AS (VALUES (1, 1000000), (2, 630930), (3, 500000),
         |  (4, 430677), (5, 386853), (6, 356207), (7, 333333),
         |  (8, 315465), (9, 301030), (10, 289065)),
         |ex AS (SELECT qid, cid, rn, 11 - rn AS rel FROM (
         |    SELECT qid, c.vec_id AS cid, row_number() OVER (
         |      PARTITION BY qid ORDER BY
         |        round(${dotSql("qv", "c.v")} / (sqrt(qn) * sqrt(c.nrm)), 6)
         |          DESC, c.vec_id) AS rn
         |    FROM q JOIN n c ON c.vec_id <> qid) WHERE rn <= 10),
         |sys AS (SELECT qid, cid, rn FROM (
         |    SELECT qid, c.vec_id AS cid, row_number() OVER (
         |      PARTITION BY qid ORDER BY
         |        round(${dotSql("qv", "c.v")} / (sqrt(qn) * sqrt(c.nrm)), 6)
         |          DESC, c.vec_id) AS rn
         |    FROM q JOIN n c ON c.bucket = qb AND c.vec_id <> qid)
         |  WHERE rn <= 10),
         |hits AS (SELECT s.qid, s.rn AS srn, ex.rel
         |  FROM sys s JOIN ex ON ex.qid = s.qid AND ex.cid = s.cid),
         |agg AS (SELECT q.qid,
         |    CAST(count(h.rel) AS BIGINT) AS n_hits,
         |    CAST(coalesce(1000000 // min(h.srn), 0) AS BIGINT)
         |      AS mrr_micro,
         |    CAST(coalesce(sum(h.rel * dm.w), 0) AS BIGINT) AS dcg
         |  FROM q LEFT JOIN hits h ON h.qid = q.qid
         |         LEFT JOIN dm ON dm.i = h.srn
         |  GROUP BY q.qid),
         |ideal AS (SELECT ex.qid, sum(ex.rel * dm.w) AS idcg
         |  FROM ex JOIN dm ON dm.i = ex.rn GROUP BY ex.qid)
         |SELECT agg.qid, agg.n_hits, agg.mrr_micro,
         |  CAST(agg.dcg * 1000 // ideal.idcg AS BIGINT) AS ndcg_milli
         |FROM agg JOIN ideal ON ideal.qid = agg.qid
         |ORDER BY agg.qid""".stripMargin) { (s, d) =>
      val sp = s; import sp.implicits._
      val n = prepared(s, d)
        .withColumn("bucket",
          (0 until 8).map(i =>
            when(element_at(col("embedding"), i + 1) > 0f, lit(1 << i))
              .otherwise(lit(0))).reduce(_ + _))
      val q = n.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"), col("bucket").as("qb"))
      val dmTab = broadcast(Seq(1 -> 1000000L, 2 -> 630930L, 3 -> 500000L,
        4 -> 430677L, 5 -> 386853L, 6 -> 356207L, 7 -> 333333L,
        8 -> 315465L, 9 -> 301030L, 10 -> 289065L)
        .toDF("i", "w"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("cid"))
      def rank10(cand: DataFrame): DataFrame = cand
        .select(col("qid"), col("vec_id").as("cid"),
          round(dot(col("qv"), col("v")) /
            (sqrt(col("qn")) * sqrt(col("nrm"))), 6).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("qid"), col("cid"), col("rn"))
      val ex = rank10(n.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid")))
        .withColumn("rel", lit(11) - col("rn"))
      val sys = rank10(n.join(broadcast(q), col("bucket") === col("qb"))
        .filter(col("vec_id") =!= col("qid")))
      val hits = sys.join(ex.select(col("qid").as("eq"),
          col("cid").as("ec"), col("rel")),
          col("qid") === col("eq") && col("cid") === col("ec"))
        .select(col("qid"), col("rn").as("srn"), col("rel"))
      val agg = q.select(col("qid"))
        .join(hits, Seq("qid"), "left")
        .join(broadcast(dmTab), col("i") === col("srn"), "left")
        .groupBy(col("qid"))
        .agg(count(col("rel")).cast("long").as("n_hits"),
          coalesce(expr("1000000 DIV min(srn)"), lit(0L)).cast("long")
            .as("mrr_micro"),
          coalesce(sum(col("rel") * col("w")), lit(0L)).cast("long")
            .as("dcg"))
      val ideal = ex.join(broadcast(dmTab), col("i") === col("rn"))
        .groupBy(col("qid")).agg(sum(col("rel") * col("w")).as("idcg"))
      agg.join(ideal, Seq("qid"))
        .select(col("qid"), col("n_hits"), col("mrr_micro"),
          expr("dcg * 1000 DIV idcg").cast("long").as("ndcg_milli"))
        .orderBy(col("qid"))
    },

    // ---- q232: matryoshka truncation SWEEP (cosine, 3 dims) --------
    // q172 audits ONE prefix width (16) per query on the L2 integer
    // grid; this is the complementary capacity-planning sweep: the
    // aggregate recall CURVE across dim 8/16/32 on the COSINE metric
    // the serving index actually ranks by (prefix norms re-derived
    // per width — cosine truncation re-normalizes, so it is not a
    // monotone restriction of the L2 audit). Per dim: rank by
    // prefix-k cosine (same rounded-score + id tie-break), intersect
    // with the full-dim exact top-5, report total hits and recall in
    // milli-units — the 3-row table a capacity review reads. Audit
    // arm (20 queries × N brute force, 3 dims); per-vector prefix
    // norms compute once in the scan stage, never per pair.
    QueryDef(
      "q232_matryoshka_recall",
      { def pdot(k: Int, a: String, b: String) =
          s"list_reduce(list_transform(range(1, ${k + 1}), i -> " +
            s"$a[i] * $b[i]), (acc, x) -> acc + x)"
        val arms = Seq(8, 16, 32).map { k =>
          s"""p$k AS (SELECT qid, c.vec_id AS cid,
             |    round(${pdot(k, "qv", "c.v")} /
             |      (sqrt(${pdot(k, "qv", "qv")}) *
             |       sqrt(${pdot(k, "c.v", "c.v")})), 6) AS score
             |  FROM q JOIN n c ON c.vec_id <> qid),
             |s$k AS (SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
             |      ORDER BY score DESC, cid) AS rn FROM p$k)
             |  WHERE rn <= 5),
             |h$k AS (SELECT count(*) AS h FROM s$k s
             |  JOIN ex ON ex.qid = s.qid AND ex.cid = s.cid)"""
            .stripMargin
        }
        val sel = Seq(8, 16, 32).map { k =>
          s"SELECT $k AS dim, CAST(h AS BIGINT) AS n_hits, " +
            s"CAST(h * 1000 // 100 AS BIGINT) AS recall_milli FROM h$k"
        }.mkString("\nUNION ALL\n")
        s"""WITH e AS (SELECT vec_id,
           |    list_transform(embedding, x -> x::DOUBLE) AS v
           |  FROM embeddings),
           |n AS (SELECT vec_id, v, ${dotSql("v", "v")} AS nrm FROM e),
           |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n
           |      WHERE vec_id < 20),
           |ex AS (SELECT qid, cid FROM (
           |    SELECT qid, c.vec_id AS cid, row_number() OVER (
           |      PARTITION BY qid ORDER BY
           |        round(${dotSql("qv", "c.v")} /
           |          (sqrt(qn) * sqrt(c.nrm)), 6) DESC, c.vec_id) AS rn
           |    FROM q JOIN n c ON c.vec_id <> qid) WHERE rn <= 5),
           |${arms.mkString(",\n")}
           |SELECT * FROM (\n$sel)\nORDER BY dim""".stripMargin
      }) { (s, d) =>
      val sp = s; import sp.implicits._
      val dims = Seq(8, 16, 32)
      // prefix vectors + prefix norms, once per vector in the scan
      val n = dims.foldLeft(prepared(s, d)) { (df, k) =>
        df.withColumn(s"v$k", expr(s"slice(v, 1, $k)"))
          .withColumn(s"n$k", dot(col(s"v$k"), col(s"v$k")))
      }
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("cid"))
      def top5(cand: DataFrame, score: Column): DataFrame = cand
        .select(col("qid"), col("vec_id").as("cid"),
          round(score, 6).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("cid"))
      def qside(cols: Seq[String]): DataFrame =
        n.filter(col("vec_id") < 20).select(col("vec_id").as("qid") +:
          cols.map(c => col(c).as(s"q_$c")): _*)
      val pairsEx = n.crossJoin(broadcast(qside(Seq("v", "nrm"))))
        .filter(col("vec_id") =!= col("qid"))
      val ex = top5(pairsEx,
        dot(col("q_v"), col("v")) / (sqrt(col("q_nrm")) * sqrt(col("nrm"))))
      val armDfs = dims.map { k =>
        val pairs = n
          .crossJoin(broadcast(qside(Seq(s"v$k", s"n$k"))))
          .filter(col("vec_id") =!= col("qid"))
        top5(pairs, dot(col(s"q_v$k"), col(s"v$k")) /
            (sqrt(col(s"q_n$k")) * sqrt(col(s"n$k"))))
          .join(ex.toDF("eq", "ec"),
            col("qid") === col("eq") && col("cid") === col("ec"))
          .agg(count(lit(1)).as("h"))
          .select(lit(k).as("dim"), col("h").cast("long").as("n_hits"),
            expr("h * 1000 DIV 100").cast("long").as("recall_milli"))
      }
      armDfs.reduce(_ unionAll _).orderBy(col("dim"))
    },

    QueryDef(
      "q245_cluster_balanced_sample",
      "WITH " + lloydA2Sql + s""",
         |pri AS (SELECT a2.vec_id, a2.j,
         |    ${Text.h32Sql("CAST(a2.vec_id AS VARCHAR)")} AS pri
         |  FROM a2),
         |r AS (SELECT j, vec_id, pri, row_number() OVER (
         |    PARTITION BY j ORDER BY pri, vec_id) AS rk FROM pri),
         |tot AS (SELECT j, count(*) AS n_total FROM pri GROUP BY j),
         |kept AS (SELECT j, count(*) AS n_kept,
         |    CAST(sum(vec_id) AS BIGINT) AS kept_id_sum,
         |    CAST(max(pri) AS BIGINT) AS max_kept_pri
         |  FROM r WHERE rk <= 40 GROUP BY j)
         |SELECT tot.j AS cluster, tot.n_total, kept.n_kept,
         |  kept.kept_id_sum, kept.max_kept_pri
         |FROM tot JOIN kept ON kept.j = tot.j
         |ORDER BY cluster""".stripMargin) { (s, d) =>
      // Cluster-balanced data selection: cap every LEARNED cluster of
      // the embedding space at the same sample budget (here 40), so
      // the selected training set is diverse by construction instead
      // of mirroring the corpus's cluster skew — the curation pass
      // behind cluster-balanced pretraining subsets (and the fix for
      // "the crawl is 60% one mode"). Groups come from the trained
      // exact-integer Lloyd assignment (the SAME memoized a2 the IVF
      // index q116 and SemDeDup q122 ride — one clustering, three
      // consumers), and the per-cluster draw is q85's min-wise hash
      // rank: deterministic, seed-free, stable under re-partitioning
      // and incremental appends. Scale shape: the rank is a
      // WindowGroupLimit (top-40 per cluster held per-partition — no
      // full sort of any cluster), the census is two keyed aggs off
      // the same memo, and the join of the two 8-row summaries is
      // trivially broadcast. Output: per-cluster census — total mass
      // vs kept (= min(40, n)), the kept-id checksum, and the
      // max kept hash (the cluster's effective sampling threshold,
      // directly comparable across re-runs).
      graft.cdc.GraftFunctions.register(s)
      val pri = kmeansAssignments(s, d)
        .select(col("vec_id"), col("j"),
          graft.cdc.GraftFunctions.md5_h32(
            col("vec_id").cast("string")).as("pri"))
      val r = pri.withColumn("rk",
        row_number().over(Window.partitionBy(col("j"))
          .orderBy(col("pri"), col("vec_id"))))
      val tot = pri.groupBy(col("j")).agg(count(lit(1)).as("n_total"))
      val kept = r.filter(col("rk") <= 40)
        .groupBy(col("j"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("vec_id")).as("kept_id_sum"),
          max(col("pri")).as("max_kept_pri"))
      tot.join(kept, "j")
        .select(col("j").as("cluster"), col("n_total"), col("n_kept"),
          col("kept_id_sum"), col("max_kept_pri"))
        .orderBy(col("cluster"))
    },

    QueryDef(
      "q246_ivf_nprobe_sweep",
      "WITH " + lloydA2Sql + s""",
         |qcd AS (SELECT d.vec_id AS qid, c.j,
         |    sum((d.v - c.c) * (d.v - c.c)) AS dist
         |  FROM dims d JOIN c1 c ON c.i = d.i WHERE d.vec_id < 20
         |  GROUP BY 1, 2),
         |pall AS (SELECT qid, j, row_number() OVER (PARTITION BY qid
         |    ORDER BY dist, j) AS pr FROM qcd),
         |nps AS (SELECT unnest([1, 2, 4, 8]) AS np),
         |pc AS (SELECT n.np, p.qid, p.j FROM nps n
         |  JOIN pall p ON p.pr <= n.np),
         |ed AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE)
         |        AS v FROM embeddings),
         |nnv AS (SELECT vec_id, v, ${dotSql("v", "v")} AS nrm FROM ed),
         |qvv AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM nnv
         |        WHERE vec_id < 20),
         |icand AS (SELECT pc.np, pc.qid, a.vec_id AS cid FROM pc
         |  JOIN a2 a ON a.j = pc.j WHERE a.vec_id <> pc.qid),
         |isc AS (SELECT i.np, i.qid, i.cid,
         |    round(${dotSql("q.qv", "c.v")} /
         |          (sqrt(q.qn) * sqrt(c.nrm)), 6) AS score
         |  FROM icand i JOIN qvv q ON q.qid = i.qid
         |  JOIN nnv c ON c.vec_id = i.cid),
         |iT AS (SELECT np, qid, cid FROM (
         |    SELECT np, qid, cid, row_number() OVER (
         |      PARTITION BY np, qid ORDER BY score DESC, cid) AS ra
         |    FROM isc) WHERE ra <= 10),
         |exp AS (SELECT qid, c.vec_id AS cid,
         |    round(${dotSql("qv", "c.v")} /
         |          (sqrt(qn) * sqrt(c.nrm)), 6) AS score
         |  FROM qvv JOIN nnv c ON c.vec_id <> qid),
         |exT AS (SELECT qid, cid FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, cid) AS ra FROM exp) WHERE ra <= 10),
         |hits AS (SELECT i.np, count(*) AS n_hits FROM iT i
         |  JOIN exT e ON e.qid = i.qid AND e.cid = i.cid GROUP BY i.np),
         |cost AS (SELECT np, count(*) AS n_cand FROM icand GROUP BY np)
         |SELECT CAST(cost.np AS BIGINT) AS nprobe, cost.n_cand,
         |  hits.n_hits,
         |  CAST(hits.n_hits * 1000 // 200 AS BIGINT) AS recall_milli
         |FROM cost JOIN hits ON hits.np = cost.np
         |ORDER BY nprobe""".stripMargin) { (s, d) =>
      // The nprobe TUNING TABLE — the cost/recall curve a deployment
      // reads before turning the one knob a trained IVF index has:
      // for nprobe ∈ {1, 2, 4, 8 = full coverage}, the candidate
      // volume actually scanned (the cost) and recall@10 against the
      // exact ranking (the quality), over the 20 audit queries. The
      // sweep shares ONE corpus pass: probe lists for every arm ride
      // a single broadcast (qid, j, np) relation (cells ranked
      // map-side against the 8 trained-centroid literals, the q116
      // machinery), so the corpus-side work is one equi-join of the
      // memoized cell assignment against a ≤ 20·15-row broadcast —
      // each corpus row fans out only to the arms that probe its
      // cell. Ranking windows partition by (np, qid); the exact
      // baseline is the documented bounded-broadcast audit arm. At
      // 100 TB the same query runs with the audit-query sample and a
      // production nprobe grid — cost scales with probed-cell
      // occupancy × arms, never corpus².
      val nn = prepared(s, d).select(col("vec_id"), col("v"), col("nrm"))
      val qv = nn.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"))
      val arms = kmeansCentroids(s, d).map { case (j, c) =>
        struct(graft.cdc.GraftFunctions.vec_l2i(col("q"),
          expr(s"array(${c.mkString("L,")}L)")).as("dist"),
          lit(j).as("j"))
      }
      val pall = quantized(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"),
          posexplode(transform(array_sort(array(arms: _*)),
            p => p.getField("j"))).as(Seq("pos", "j")))
        .select(col("qid"), col("j"), (col("pos") + 1).as("pr"))
      val nps = s.range(1)
        .select(explode(array(lit(1), lit(2), lit(4), lit(8))).as("np"))
      val pc = pall.crossJoin(broadcast(nps))
        .filter(col("pr") <= col("np"))
        .select(col("np"), col("qid"), col("j"))
      val icand = nn.join(kmeansAssignments(s, d)
          .select(col("vec_id"), col("j")), "vec_id")
        .join(broadcast(pc), "j")
        .filter(col("vec_id") =!= col("qid"))
      val isc = icand.join(broadcast(qv), "qid")
        .select(col("np"), col("qid"), col("vec_id").as("cid"),
          round(dot(col("qv"), col("v")) /
            (sqrt(col("qn")) * sqrt(col("nrm"))), 6).as("score"))
        .tcache()
      val wNp = Window.partitionBy(col("np"), col("qid"))
        .orderBy(col("score").desc, col("cid"))
      val iT = isc.withColumn("ra", row_number().over(wNp))
        .filter(col("ra") <= 10)
        .select(col("np"), col("qid"), col("cid"))
      val wEx = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("cid"))
      val exT = nn.crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          round(dot(col("qv"), col("v")) /
            (sqrt(col("qn")) * sqrt(col("nrm"))), 6).as("score"))
        .withColumn("ra", row_number().over(wEx))
        .filter(col("ra") <= 10)
        .select(col("qid").as("eq"), col("cid").as("ec"))
      val hits = iT.join(exT,
          col("qid") === col("eq") && col("cid") === col("ec"))
        .groupBy(col("np")).agg(count(lit(1)).as("n_hits"))
      val cost = isc.groupBy(col("np")).agg(count(lit(1)).as("n_cand"))
      cost.join(hits, "np")
        .select(col("np").cast("long").as("nprobe"), col("n_cand"),
          col("n_hits"),
          expr("n_hits * 1000 DIV 200").as("recall_milli"))
        .orderBy(col("nprobe"))
    },

    QueryDef(
      "q250_bitext_margin_mining",
      s"""WITH $lloydA2Sql,
         |ev AS (SELECT vec_id,
         |    list_transform(embedding, x -> x::DOUBLE) AS v
         |  FROM embeddings),
         |nv AS (SELECT vec_id, v, ${dotSql("v", "v")} AS nrm FROM ev),
         |mm AS (SELECT nv.vec_id, doc.lang, a2.j, nv.v, nv.nrm
         |  FROM nv JOIN a2 ON a2.vec_id = nv.vec_id
         |  JOIN documents doc ON doc.doc_id = nv.vec_id),
         |p AS (SELECT x.vec_id AS src_id, x.lang, y.vec_id AS tgt_id,
         |    round(${dotSql("x.v", "y.v")} / (sqrt(x.nrm) * sqrt(y.nrm)), 6)
         |      AS score
         |  FROM mm x JOIN mm y ON y.j = x.j
         |  WHERE x.lang <> 'en' AND y.lang = 'en'),
         |f AS (SELECT src_id, lang, tgt_id, score, row_number() OVER (
         |    PARTITION BY src_id ORDER BY score DESC, tgt_id) AS rf
         |  FROM p),
         |b AS (SELECT src_id, tgt_id, row_number() OVER (
         |    PARTITION BY tgt_id ORDER BY score DESC, src_id) AS rb
         |  FROM p)
         |SELECT f1.src_id, f1.lang, f1.tgt_id, f1.score,
         |  round(f1.score - f2.score, 6) AS margin
         |FROM f f1
         |JOIN b ON b.src_id = f1.src_id AND b.tgt_id = f1.tgt_id
         |      AND b.rb = 1
         |LEFT JOIN f f2 ON f2.src_id = f1.src_id AND f2.rf = 2
         |WHERE f1.rf = 1
         |ORDER BY f1.src_id""".stripMargin) { (s, d) =>
      // Bitext mining — the cross-lingual pairing pass a multilingual
      // pretraining pipeline runs to harvest parallel text (the
      // CCMatrix/LASER recipe): pair every non-English doc with its
      // MUTUAL nearest English neighbor in embedding space, and report
      // the margin to the runner-up (the confidence a miner thresholds
      // on — a best match barely above its second-best is noise).
      // Candidates come from the trained-IVF cell equi-join (the SAME
      // memoized Lloyd assignment q116/q122/q245 ride): x pairs only
      // with English docs in its own cell, so pair volume follows cell
      // occupancy, never |non-en|×|en|. Mutuality = rank-1 in BOTH
      // directions over the same cell-restricted pair relation (two
      // per-doc WindowGroupLimit tops, no extra corpus pass); margin =
      // rank-1 minus rank-2 forward score, NULL when the cell offers a
      // single candidate. Scores are the suite's rounded-double cosine
      // so both engines rank identically. At 100 TB: one equi-join on
      // the cell key + per-doc windows — the exact same shape CCMatrix
      // runs with FAISS shards standing in for the cell join.
      val langs = documents(s, d)
        .select(col("doc_id").as("vec_id"), col("lang"))
      val mm = prepared(s, d).select(col("vec_id"), col("v"), col("nrm"))
        .join(kmeansAssignments(s, d), "vec_id")
        .join(langs, "vec_id")
      val xs = mm.filter(col("lang") =!= "en")
        .select(col("vec_id").as("src_id"), col("lang"), col("j"),
          col("v").as("xv"), col("nrm").as("xn"))
      val ys = mm.filter(col("lang") === "en")
        .select(col("vec_id").as("tgt_id"), col("j"),
          col("v").as("yv"), col("nrm").as("yn"))
      val p = xs.join(ys, "j")
        .select(col("src_id"), col("lang"), col("tgt_id"),
          round(dot(col("xv"), col("yv")) /
            (sqrt(col("xn")) * sqrt(col("yn"))), 6).as("score"))
        .tcache()
      val wF = Window.partitionBy(col("src_id"))
        .orderBy(col("score").desc, col("tgt_id"))
      val wB = Window.partitionBy(col("tgt_id"))
        .orderBy(col("score").desc, col("src_id"))
      val f = p.withColumn("rf", row_number().over(wF))
      val b = p.withColumn("rb", row_number().over(wB))
        .filter(col("rb") === 1)
        .select(col("src_id").as("bs"), col("tgt_id").as("bt"))
      val f2 = f.filter(col("rf") === 2)
        .select(col("src_id"), col("score").as("s2"))
      f.filter(col("rf") === 1)
        .join(b, col("src_id") === col("bs") &&
          col("tgt_id") === col("bt"))
        .join(f2, Seq("src_id"), "left")
        .select(col("src_id"), col("lang"), col("tgt_id"), col("score"),
          round(col("score") - col("s2"), 6).as("margin"))
        .orderBy(col("src_id"))
    },

    QueryDef(
      "q251_cluster_silhouette",
      s"""WITH $lloydA2Sql,
         |r AS (SELECT vec_id, j, dist, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY dist, j) AS rn FROM d2),
         |sil AS (SELECT o.vec_id, o.j,
         |    CASE WHEN greatest(o.dist, t.dist) = 0 THEN 0
         |         ELSE (t.dist - o.dist) * 1000 // greatest(o.dist, t.dist)
         |    END AS sm
         |  FROM r o JOIN r t ON t.vec_id = o.vec_id AND t.rn = 2
         |  WHERE o.rn = 1)
         |SELECT j AS cluster, count(*) AS n_vectors,
         |  CAST(sum(sm) // count(*) AS BIGINT) AS avg_sil_milli,
         |  CAST(min(sm) AS BIGINT) AS min_sil_milli,
         |  CAST(max(sm) AS BIGINT) AS max_sil_milli
         |FROM sil GROUP BY j ORDER BY cluster""".stripMargin) { (s, d) =>
      // Clustering-quality audit — the simplified (centroid-based)
      // silhouette a pipeline reads before trusting the trained
      // clusters for balanced sampling (q245) or IVF search (q116):
      // per vector, s = (d_other − d_own)·1000 / max(d_own, d_other)
      // where d_own is the exact-integer L2 to its OWN trained
      // centroid and d_other the nearest FOREIGN centroid. Assignment
      // is argmin, so d_own ≤ d_other and s ∈ [0, 1000] — all-integer
      // ratios, no sqrt, engine-identical (and DIV ≡ // on the
      // non-negative operands). The whole audit is map-side: the 8
      // trained centroids are LITERALS (the q115 recipe), each vector
      // sorts its 8 (dist, j) arms in-row — first arm IS its trained
      // assignment (same lexicographic tie-break as the Lloyd memo),
      // second arm is the nearest rival — then one keyed rollup to 8
      // cluster rows. At 100 TB: one scan, one tiny agg; the oracle's
      // d2 all-pairs CTE is the same arithmetic stated relationally.
      val arms = kmeansCentroids(s, d).map { case (j, c) =>
        struct(graft.cdc.GraftFunctions.vec_l2i(col("q"),
          expr(s"array(${c.mkString("L,")}L)")).as("dist"),
          lit(j).as("j"))
      }
      quantized(s, d)
        .select(array_sort(array(arms: _*)).as("ds"))
        .select(col("ds")(0).getField("j").as("cluster"),
          col("ds")(0).getField("dist").as("d_own"),
          col("ds")(1).getField("dist").as("d_oth"))
        .select(col("cluster"),
          when(greatest(col("d_own"), col("d_oth")) === 0, lit(0L))
            .otherwise(expr(
              "(d_oth - d_own) * 1000 DIV greatest(d_own, d_oth)"))
            .as("sm"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_vectors"),
          expr("sum(sm) DIV count(*)").as("avg_sil_milli"),
          min(col("sm")).as("min_sil_milli"),
          max(col("sm")).as("max_sil_milli"))
        .orderBy(col("cluster"))
    },

    // ---- q258: IVF cell-occupancy census (index health) ----------
    // The batch twin of the r12 streaming ingest drift probe
    // (StreamOps.ivfIngestBatch): per trained cell, occupancy, share
    // of the corpus, load relative to uniform (load_milli = 1000·k·
    // n/total — the same statistic whose max the ingest probe
    // watches), and label purity of the cell's plurality label. An
    // operator a production ANN deployment runs continuously: skewed
    // cells = degraded pruning, low purity = semantic drift inside a
    // cell. Plan: one keyed agg over the memoized Lloyd assignments
    // + one keyed label agg with a per-cell WindowGroupLimit top-1 —
    // output is k rows, all shuffles keyed by cell.
    QueryDef(
      "q258_ivf_cell_census",
      "WITH " + lloydA2Sql + """,
        |emb AS (SELECT vec_id, label FROM embeddings),
        |cell AS (SELECT j, count(*) AS n FROM a2 GROUP BY j),
        |lab AS (SELECT a2.j, emb.label, count(*) AS nl
        |        FROM a2 JOIN emb ON emb.vec_id = a2.vec_id
        |        GROUP BY a2.j, emb.label),
        |top AS (SELECT j, label, nl FROM (
        |    SELECT j, label, nl, row_number() OVER (
        |      PARTITION BY j ORDER BY nl DESC, label) AS rn FROM lab)
        |  WHERE rn = 1),
        |tot AS (SELECT sum(n) AS t FROM cell)
        |SELECT CAST(c.j AS BIGINT) AS cell, CAST(c.n AS BIGINT) AS n_vectors,
        |  CAST(1000000 * c.n // t AS BIGINT) AS share_ppm,
        |  CAST(8000 * c.n // t AS BIGINT) AS load_milli,
        |  CAST(top.label AS BIGINT) AS top_label,
        |  CAST(1000000 * top.nl // c.n AS BIGINT) AS purity_ppm
        |FROM cell c JOIN top ON top.j = c.j CROSS JOIN tot
        |ORDER BY cell""".stripMargin) { (s, d) =>
      val a2 = kmeansAssignments(s, d)
      val e = prepared(s, d).select(col("vec_id"), col("label"))
      val cell = a2.groupBy(col("j")).agg(count(lit(1)).as("n"))
      val lab = a2.join(e, "vec_id")
        .groupBy(col("j"), col("label")).agg(count(lit(1)).as("nl"))
      val top = lab.withColumn("rn", row_number().over(
          Window.partitionBy(col("j"))
            .orderBy(col("nl").desc, col("label"))))
        .filter(col("rn") === 1)
        .select(col("j"), col("label"), col("nl"))
      val tot = cell.agg(sum(col("n")).as("t"))
      cell.join(top, "j").crossJoin(broadcast(tot))
        .select(col("j").cast("long").as("cell"),
          col("n").as("n_vectors"),
          expr("1000000 * n DIV t").as("share_ppm"),
          expr("8000 * n DIV t").as("load_milli"),
          col("label").cast("long").as("top_label"),
          expr("1000000 * nl DIV n").as("purity_ppm"))
        .orderBy(col("cell"))
    },

    // ---- q261: retrieval label-diversity audit --------------------
    // The eval-metric family's third member after relevance (q230
    // MRR/nDCG) and recall (q239): DIVERSITY of what the index
    // returns. Per query, the label spread of its top-5 — distinct
    // labels, exact-integer Simpson concentration Σnl²·1e6/k² (1e6 =
    // all one label ⇒ collapsed retrieval), and the plurality count.
    // Retrieval rides the TRAINED IVF arm (cell equi-join, no
    // corpus-side crossJoin — q191's production shape); nprobe = k
    // keeps it bit-identical to the brute-force oracle, and q239's
    // recall gauge already prices the pruned setting. Scale: probe
    // list is queries×k rows broadcast, candidates = probed-cell
    // occupancy, diversity agg is queries×≤5 rows.
    QueryDef(
      "q261_retrieval_label_diversity",
      s"""WITH e AS (SELECT vec_id, label,
         |    list_transform(embedding, x -> x::DOUBLE) AS v
         |  FROM embeddings),
         |n AS (SELECT vec_id, label, v,
         |    ${dotSql("v", "v")} AS nrm FROM e),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n
         |      WHERE vec_id < 20),
         |p AS (SELECT qid, c.vec_id AS cid, c.label AS clabel,
         |    round(${dotSql("qv", "c.v")} / (sqrt(qn) * sqrt(c.nrm)), 6)
         |      AS score
         |  FROM q JOIN n c ON c.vec_id <> qid),
         |top AS (SELECT qid, clabel FROM (
         |    SELECT qid, clabel, row_number() OVER (
         |      PARTITION BY qid ORDER BY score DESC, cid) AS rn FROM p)
         |  WHERE rn <= 5),
         |cnt AS (SELECT qid, clabel, count(*) AS nl FROM top
         |        GROUP BY qid, clabel)
         |SELECT qid, CAST(count(*) AS BIGINT) AS distinct_labels,
         |  CAST(sum(nl * nl) * 1000000 // 25 AS BIGINT) AS simpson_ppm,
         |  CAST(max(nl) AS BIGINT) AS max_label_n
         |FROM cnt GROUP BY qid ORDER BY qid""".stripMargin) { (s, d) =>
      val lab = prepared(s, d)
        .select(col("vec_id").as("cid"), col("label").as("clabel"))
      ivfSemanticTop(s, d, nprobe = 8, k = 5)
        .join(lab, "cid")
        .groupBy(col("qid"), col("clabel"))
        .agg(count(lit(1)).as("nl"))
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("distinct_labels"),
          expr("sum(nl * nl) * 1000000 DIV 25").as("simpson_ppm"),
          max(col("nl")).cast("long").as("max_label_n"))
        .orderBy(col("qid"))
    },

    // ---- q263: seeding-strategy quality census ---------------------
    // The index-tuning sweep behind the r13 retrain fix, as a
    // first-class operator: BEFORE committing a retrain, measure what
    // each seeding strategy would give — cold (k lowest vec_ids, the
    // reproducible default) vs farthest-point (data-adaptive, the one
    // that can reach drifted mass) — by assigning the whole corpus to
    // each seed matrix once and reporting cells used, worst-cell
    // occupancy, and the exact integer SSE (sum of every vector's
    // squared distance to its seed). All arithmetic on the shared
    // quantization grid, so both engines agree bit-for-bit, including
    // the farthest-point argmax tie-break (max dist, then lowest
    // vec_id). Scale: seed selection is k passes each ending in a
    // 1-row TakeOrdered (no global sort); each census arm is ONE
    // map-side argmin pass + a k-row aggregation — the
    // planned-maintenance cost profile of a retrain decision, never
    // per-query work.
    QueryDef(
      "q263_seeding_quality_census",
      "WITH e AS (SELECT vec_id, list_transform(embedding,\n" +
        "      x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT) + 1000) AS q\n" +
        "    FROM embeddings),\n" +
        "dims AS (SELECT vec_id, i, q[i] AS v\n" +
        "         FROM e, UNNEST(range(1, 65)) AS t(i)),\n" +
        "fs1(vid) AS (SELECT min(vec_id) FROM e),\n" +
        (2 to 8).map { i =>
          s"p$i AS (SELECT d.vec_id, sum((d.v - ds.v) * (d.v - ds.v)) AS dd\n" +
            s"  FROM dims d JOIN dims ds ON ds.i = d.i\n" +
            s"    AND ds.vec_id IN (SELECT vid FROM fs${i - 1})\n" +
            "  GROUP BY d.vec_id, ds.vec_id),\n" +
            s"nx$i AS (SELECT vec_id AS vid FROM (\n" +
            s"    SELECT vec_id, min(dd) AS md FROM p$i GROUP BY 1)\n" +
            "  ORDER BY md DESC, vec_id LIMIT 1),\n" +
            s"fs$i(vid) AS (SELECT vid FROM fs${i - 1}\n" +
            s"  UNION ALL SELECT vid FROM nx$i),\n"
        }.mkString +
        """ad AS (SELECT d.vec_id, ds.vec_id AS j,
          |    sum((d.v - ds.v) * (d.v - ds.v)) AS dist
          |  FROM dims d JOIN dims ds ON ds.i = d.i
          |    AND ds.vec_id IN (SELECT vid FROM fs8)
          |  GROUP BY 1, 2),
          |aa AS (SELECT vec_id, j, dist FROM (
          |    SELECT vec_id, j, dist, row_number() OVER (
          |      PARTITION BY vec_id ORDER BY dist, j) AS rn FROM ad)
          |  WHERE rn = 1),
          |aocc AS (SELECT j, count(*) AS n FROM aa GROUP BY 1),
          |cd AS (SELECT d.vec_id, ds.vec_id AS j,
          |    sum((d.v - ds.v) * (d.v - ds.v)) AS dist
          |  FROM dims d JOIN dims ds ON ds.i = d.i AND ds.vec_id < 8
          |  GROUP BY 1, 2),
          |ca AS (SELECT vec_id, j, dist FROM (
          |    SELECT vec_id, j, dist, row_number() OVER (
          |      PARTITION BY vec_id ORDER BY dist, j) AS rn FROM cd)
          |  WHERE rn = 1),
          |cocc AS (SELECT j, count(*) AS n FROM ca GROUP BY 1)
          |SELECT 'adaptive' AS method,
          |  CAST((SELECT count(*) FROM aocc) AS BIGINT) AS n_cells,
          |  CAST((SELECT max(n) FROM aocc) AS BIGINT) AS max_cell,
          |  CAST((SELECT sum(dist) FROM aa) AS BIGINT) AS sse
          |UNION ALL
          |SELECT 'cold',
          |  CAST((SELECT count(*) FROM cocc) AS BIGINT),
          |  CAST((SELECT max(n) FROM cocc) AS BIGINT),
          |  CAST((SELECT sum(dist) FROM ca) AS BIGINT)
          |ORDER BY method""".stripMargin) { (s, d) =>
      val e = quantized(s, d)
      val cold = Tables.boundedCollect(
        e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("j"), col("q").as("c")),
        8, "cold seed matrix (k = 8)")
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1).toSeq
      val adaptive = farthestPointSeeds(e, 8)
      def census(name: String, seeds: Seq[(Long, Seq[Long])]): DataFrame = {
        val arms = seeds.map { case (j, c) =>
          struct(graft.cdc.GraftFunctions.vec_l2i(col("q"),
            expr(s"array(${c.mkString("L,")}L)")).as("dist"),
            lit(j).as("j"))
        }
        val pick = array_min(array(arms: _*))
        e.select(pick.getField("j").as("j"),
            pick.getField("dist").as("dist"))
          .groupBy(col("j"))
          .agg(count(lit(1)).as("n"), sum(col("dist")).as("sd"))
          .agg(count(lit(1)).as("n_cells"),
            max(col("n")).as("max_cell"), sum(col("sd")).as("sse"))
          .select(lit(name).as("method"), col("n_cells"),
            col("max_cell").cast("long").as("max_cell"),
            col("sse").cast("long").as("sse"))
      }
      census("adaptive", adaptive).unionAll(census("cold", cold))
        .orderBy(col("method"))
    },

    // ---- q283: ANN hubness census ------------------------------------
    // High-dimensional nearest-neighbor lists concentrate on HUB
    // points (Radovanović et al., JMLR'10): a few vectors appear in
    // many queries' top-k while most appear in none — skew that
    // degrades recall and poisons kNN labels (q219). The census: the
    // k-occurrence distribution N_5(x) over the probe panel's exact
    // top-5 lists, INCLUDING the zero-occurrence mass (anti-hubs),
    // plus each bucket's share in milli. Scale shape: the exact arm
    // is the bounded 20-query broadcast audit (PlanEvidence contract);
    // the census itself is two keyed counts over ≤ panel×5 rows.
    QueryDef(
      "q283_ann_hubness",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT) + 1000) AS q
         |    FROM embeddings),
         |dims AS (SELECT vec_id, i, q[i] AS v
         |         FROM e, UNNEST(range(1, 65)) AS t(i)),
         |ed AS (SELECT dq.vec_id AS qid, dc.vec_id AS cid,
         |         sum((dq.v - dc.v) * (dq.v - dc.v)) AS dist
         |       FROM dims dq JOIN dims dc ON dc.i = dq.i
         |                                AND dc.vec_id <> dq.vec_id
         |       WHERE dq.vec_id < 20 GROUP BY 1, 2),
         |ex AS (SELECT qid, cid FROM (
         |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |           ORDER BY dist, cid) AS rn FROM ed) WHERE rn <= 5),
         |occ AS (SELECT cid, count(*) AS k_occurrence FROM ex GROUP BY cid),
         |hist AS (SELECT k_occurrence, count(*) AS n_vectors
         |         FROM occ GROUP BY k_occurrence),
         |nv AS (SELECT count(*) AS n FROM e),
         |hit AS (SELECT count(*) AS h FROM occ),
         |full_hist AS (
         |  SELECT CAST(0 AS BIGINT) AS k_occurrence,
         |    CAST(nv.n - hit.h AS BIGINT) AS n_vectors FROM nv, hit
         |  UNION ALL
         |  SELECT CAST(k_occurrence AS BIGINT),
         |    CAST(n_vectors AS BIGINT) FROM hist)
         |SELECT k_occurrence, n_vectors,
         |  CAST(n_vectors * 1000 // (SELECT n FROM nv) AS BIGINT)
         |    AS share_milli
         |FROM full_hist ORDER BY k_occurrence""".stripMargin) { (s, d) =>
      graft.cdc.GraftFunctions.register(s)
      val e = quantized(s, d)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("q").as("qq"))
      val wq = Window.partitionBy(col("qid"))
        .orderBy(col("dist"), col("cid"))
      val ex = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          graft.cdc.GraftFunctions.vec_l2i(col("qq"), col("q")).as("dist"))
        .withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 5).select(col("qid"), col("cid"))
      val occ = ex.groupBy(col("cid")).agg(count(lit(1)).as("k_occurrence"))
        .tcache() // histogram + hit count share it
      val hist = occ.groupBy(col("k_occurrence"))
        .agg(count(lit(1)).as("n_vectors"))
      val nv = e.agg(count(lit(1)).as("n"))
      val zero = nv.crossJoin(broadcast(
          occ.agg(count(lit(1)).as("h"))))
        .select(lit(0L).as("k_occurrence"), (col("n") - col("h"))
          .as("n_vectors"))
      zero.unionByName(hist)
        .crossJoin(broadcast(nv))
        .select(col("k_occurrence"), col("n_vectors"),
          expr("n_vectors * 1000 DIV n").as("share_milli"))
        .orderBy(col("k_occurrence"))
    },

    // ---- q281: exact sign test between two ANN arms -----------------
    // The statistical-rigor gate the tuning sweeps (q246/q271) stop
    // short of: before declaring one index arm "better", test whether
    // its per-query recall wins could be chance. Per probe query, the
    // trained-IVF arm (q116: nprobe=1 cell-mates, exact integer
    // ranking) and the PQ-ADC arm (q118: asymmetric compressed-domain
    // scan) each score recall@5 against the exact scan; the paired
    // SIGN TEST over the non-tie queries gives an EXACT binomial
    // p-value for the OBSERVED winner — the tail sums from
    // greatest(wi, wp), so the gate certifies whichever arm actually
    // dominated rather than only ever testing IVF superiority (r13
    // advisor finding; the `winner` column names the direction) —
    // C(n,k) built multiplicatively (each partial
    // product is itself a binomial coefficient, so the integer
    // division is exact at every step), tail summed over a k-spine,
    // in milli against 2^n. No normal approximation, no floats:
    // the p-value is bit-identical in both engines. Scale shape:
    // both arms ride the memoized grid/assignment/codebook relations
    // and the 20-query broadcast; the sign-test itself lives on a
    // ≤ 21-row spine.
    QueryDef(
      "q281_arm_sign_test",
      "WITH " + lloydA2Sql + ",\n" +
      s"""pdims AS (SELECT vec_id, (i - 1) // 8 AS sub, (i - 1) % 8 AS si,
         |            v FROM dims),
         |pc0 AS (SELECT sub, vec_id AS j, si, v AS c FROM pdims
         |        WHERE vec_id < 4),
         |pd1 AS (SELECT d.vec_id, d.sub, c.j,
         |          sum((d.v - c.c) * (d.v - c.c)) AS dist
         |        FROM pdims d JOIN pc0 c ON c.sub = d.sub AND c.si = d.si
         |        GROUP BY 1, 2, 3),
         |pa1 AS (SELECT vec_id, sub, j FROM (
         |          SELECT vec_id, sub, j, row_number() OVER (
         |            PARTITION BY sub, vec_id ORDER BY dist, j) AS rn
         |          FROM pd1) WHERE rn = 1),
         |pn1 AS (SELECT sub, j, count(*) AS n FROM pa1 GROUP BY sub, j),
         |ps1 AS (SELECT pa1.sub, pa1.j, d.si, sum(d.v) AS s
         |        FROM pa1 JOIN pdims d ON d.vec_id = pa1.vec_id
         |                             AND d.sub = pa1.sub
         |        GROUP BY 1, 2, 3),
         |pc1 AS (SELECT ps1.sub, ps1.j, ps1.si,
         |          (2 * ps1.s + pn1.n) // (2 * pn1.n) AS c
         |        FROM ps1 JOIN pn1 ON pn1.sub = ps1.sub AND pn1.j = ps1.j),
         |pd2 AS (SELECT d.vec_id, d.sub, c.j,
         |          sum((d.v - c.c) * (d.v - c.c)) AS dist
         |        FROM pdims d JOIN pc1 c ON c.sub = d.sub AND c.si = d.si
         |        GROUP BY 1, 2, 3),
         |pa2 AS (SELECT vec_id, sub, j FROM (
         |          SELECT vec_id, sub, j, row_number() OVER (
         |            PARTITION BY sub, vec_id ORDER BY dist, j) AS rn
         |          FROM pd2) WHERE rn = 1),
         |ed AS (SELECT dq.vec_id AS qid, dc.vec_id AS cid,
         |         sum((dq.v - dc.v) * (dq.v - dc.v)) AS dist
         |       FROM dims dq JOIN dims dc ON dc.i = dq.i
         |                                AND dc.vec_id <> dq.vec_id
         |       WHERE dq.vec_id < 20 GROUP BY 1, 2),
         |ex AS (SELECT qid, cid FROM (
         |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |           ORDER BY dist, cid) AS rn FROM ed) WHERE rn <= 5),
         |iv AS (SELECT qid, cid FROM (
         |         SELECT ed.qid, ed.cid, row_number() OVER (
         |             PARTITION BY ed.qid ORDER BY ed.dist, ed.cid) AS rn
         |           FROM ed
         |           JOIN a2 qa ON qa.vec_id = ed.qid
         |           JOIN a2 ca ON ca.vec_id = ed.cid AND ca.j = qa.j)
         |       WHERE rn <= 5),
         |qsub AS (SELECT vec_id AS qid, sub, si, v FROM pdims
         |         WHERE vec_id < 20),
         |adc AS (SELECT qs.qid, pa2.vec_id AS cid,
         |          sum((qs.v - pc1.c) * (qs.v - pc1.c)) AS dist
         |        FROM qsub qs
         |        JOIN pa2 ON pa2.sub = qs.sub AND pa2.vec_id <> qs.qid
         |        JOIN pc1 ON pc1.sub = qs.sub AND pc1.j = pa2.j
         |               AND pc1.si = qs.si
         |        GROUP BY 1, 2),
         |pq5 AS (SELECT qid, cid FROM (
         |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |           ORDER BY dist, cid) AS rn FROM adc) WHERE rn <= 5),
         |ri AS (SELECT ex.qid, count(iv.cid) AS hi FROM ex
         |       LEFT JOIN iv ON iv.qid = ex.qid AND iv.cid = ex.cid
         |       GROUP BY ex.qid),
         |rp AS (SELECT ex.qid, count(pq5.cid) AS hp FROM ex
         |       LEFT JOIN pq5 ON pq5.qid = ex.qid AND pq5.cid = ex.cid
         |       GROUP BY ex.qid),
         |w AS (SELECT ri.qid, hi, hp FROM ri JOIN rp ON rp.qid = ri.qid),
         |cnt AS (SELECT count(*) AS nq,
         |    sum(CASE WHEN hi > hp THEN 1 ELSE 0 END) AS wi,
         |    sum(CASE WHEN hp > hi THEN 1 ELSE 0 END) AS wp
         |  FROM w),
         |spine AS (SELECT nq, wi, wp, wi + wp AS n, t.k
         |  FROM cnt, UNNEST(range(CAST(greatest(wi, wp) AS BIGINT),
         |    CAST(wi + wp + 1 AS BIGINT))) AS t(k)),
         |tails AS (SELECT nq, wi, wp, n,
         |    sum(list_reduce(list_prepend(CAST(1 AS BIGINT),
         |      list_transform(range(1, CAST(k + 1 AS BIGINT)),
         |        i -> CAST(i AS BIGINT))),
         |      (acc, i) -> acc * (n - i + 1) // i)) AS tail
         |  FROM spine GROUP BY 1, 2, 3, 4)
         |SELECT CAST(nq AS BIGINT) AS n_queries,
         |  CAST(wi AS BIGINT) AS wins_ivf,
         |  CAST(wp AS BIGINT) AS wins_pq,
         |  CAST(nq - n AS BIGINT) AS n_ties,
         |  CASE WHEN wi > wp THEN 'ivf' WHEN wp > wi THEN 'pq'
         |    ELSE 'tie' END AS winner,
         |  CAST(tail * 1000 // (CAST(1 AS BIGINT) << CAST(n AS INT))
         |    AS BIGINT) AS p_winner_milli
         |FROM tails""".stripMargin) { (s, d) =>
      graft.cdc.GraftFunctions.register(s)
      val e = quantized(s, d)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("q").as("qq"))
      val wq = Window.partitionBy(col("qid"))
        .orderBy(col("dist"), col("cid"))
      // exact pair distances feed BOTH the ground truth and the IVF
      // arm's within-cell ranking
      val ed = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          graft.cdc.GraftFunctions.vec_l2i(col("qq"), col("q")).as("dist"))
        .tcache()
      val ex = ed.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 5).select(col("qid"), col("cid"))
        .tcache() // consumed by both arms' hit counts
      val a2 = kmeansAssignments(s, d)
      val iv = ed
        .join(a2.select(col("vec_id").as("qid"), col("j").as("qj")), "qid")
        .join(a2.select(col("vec_id").as("cid"), col("j").as("cj")), "cid")
        .filter(col("qj") === col("cj"))
        .withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 5).select(col("qid"), col("cid"))
      val cb = pqCodebooks(s, d).withColumnRenamed("j", "symbol")
      val codes = pqAssignments(s, d)
        .select(col("vec_id").as("cid"), col("sub"), col("symbol"))
      val qsubs = subVectors(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("sub"), col("sq"))
      val adc = qsubs.join(codes, "sub")
        .filter(col("cid") =!= col("qid"))
        .join(broadcast(cb), Seq("sub", "symbol"))
        .select(col("qid"), col("cid"), pqDistExpr.as("pd"))
        .groupBy(col("qid"), col("cid")).agg(sum(col("pd")).as("dist"))
      val pq5 = adc.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 5).select(col("qid"), col("cid"))
      def hitsOf(arm: DataFrame, nm: String): DataFrame =
        ex.join(arm.select(col("qid").as("aq"), col("cid").as("ac"))
            .withColumn("m", lit(1)),
          col("qid") === col("aq") && col("cid") === col("ac"), "left")
          .groupBy(col("qid")).agg(count(col("m")).as(nm))
      val w = hitsOf(iv, "hi").join(hitsOf(pq5, "hp"), "qid")
      val cnt = w.agg(count(lit(1)).as("nq"),
          sum(when(col("hi") > col("hp"), 1L).otherwise(0L)).as("wi"),
          sum(when(col("hp") > col("hi"), 1L).otherwise(0L)).as("wp"))
        .withColumn("n", col("wi") + col("wp"))
      cnt.select(col("nq"), col("wi"), col("wp"), col("n"),
          // tail of the OBSERVED winner: from greatest(wi, wp)
          explode(sequence(greatest(col("wi"), col("wp")), col("n")))
            .as("k"))
        .withColumn("c", when(col("k") === 0, lit(1L)).otherwise(
          // each partial product is C(n, i), so DIV is exact; the
          // k = 0 branch dodges Spark's descending sequence(1, 0)
          expr("aggregate(sequence(CAST(1 AS BIGINT), k)," +
            " CAST(1 AS BIGINT), (acc, i) -> acc * (n - i + 1) DIV i)")))
        .groupBy(col("nq"), col("wi"), col("wp"), col("n"))
        .agg(sum(col("c")).as("tail"))
        .select(col("nq").as("n_queries"), col("wi").as("wins_ivf"),
          col("wp").as("wins_pq"), (col("nq") - col("n")).as("n_ties"),
          when(col("wi") > col("wp"), lit("ivf"))
            .when(col("wp") > col("wi"), lit("pq"))
            .otherwise(lit("tie")).as("winner"),
          expr("tail * 1000 DIV shiftleft(CAST(1 AS BIGINT)," +
            " CAST(n AS INT))").as("p_winner_milli"))
    },

    // ---- q299: dimension-collapse census -------------------------------
    // Embedding-quality diagnostic beside q283's hubness: anisotropy.
    // A healthy embedding spreads variance across dimensions; a
    // collapsed one concentrates it in a few (rogue dimensions —
    // Timkey & van Schijndel 2021), which quietly dominates every
    // cosine/L2 the ANN stack computes. Per dimension (top 10 by
    // share): its fraction of total variance in milli, plus the
    // participation ratio (Σv)²/Σv² over per-dim variance shares —
    // the standard effective-dimensionality estimate, in milli
    // "dimensions". Exact integers: coordinates land on the milli
    // grid first (float→double cast is exact, floor is engine-
    // identical), then variance numerators are MEAN-CENTERED sums
    // Σ(q−m)² with m the truncated integer mean (r14 advisor
    // finding: the one-pass n·Σq²−(Σq)² form grows O(n²·var) and
    // silently wraps BIGINT in Spark past ~3e7 rows while DuckDB
    // raises — the engines would diverge exactly at scale). Centered,
    // the per-dim numerator is O(n·dev²): BIGINT-exact past 1e12
    // rows/dim. The ×1000 share step divides BEFORE scaling through
    // a data-dependent reducer rsc = max(1, tv DIV 1e9) applied to
    // numerator and denominator alike — shares are ratio-invariant,
    // the reduced numerator ×1000 stays ≤ ~1e12, and truncation
    // (Spark DIV ≡ DuckDB //) is engine-identical. Residual bound
    // (documented, not silent): tv = Σ over dims overflows only past
    // ~1e10 rows/dim × 64 dims. Scale shape: one posexplode scanned
    // twice (means, then centered squares against the broadcast
    // 64-row means), two 1-row broadcast rollups, a top-10.
    QueryDef(
      "q299_dim_collapse_census",
      """WITH e AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS v
        |           FROM embeddings),
        |p AS (SELECT i - 1 AS dim,
        |    CAST(floor(v[i] * 1000) AS BIGINT) AS qv
        |  FROM e, UNNEST(range(1, len(v) + 1)) AS u(i)),
        |m AS (SELECT dim, CAST(sum(qv) AS BIGINT) // count(*) AS mu
        |  FROM p GROUP BY dim),
        |v AS (SELECT p.dim,
        |    CAST(sum((p.qv - m.mu) * (p.qv - m.mu)) AS BIGINT) AS vn
        |  FROM p JOIN m ON p.dim = m.dim GROUP BY p.dim),
        |t AS (SELECT CAST(sum(vn) AS BIGINT) AS tv,
        |    greatest(1, CAST(sum(vn) AS BIGINT) // 1000000000) AS rsc
        |  FROM v),
        |sh AS (SELECT dim, (vn // t.rsc) * 1000
        |    // greatest(1, t.tv // t.rsc) AS share_milli
        |  FROM v CROSS JOIN t),
        |pr AS (SELECT CAST(sum(share_milli) * sum(share_milli) * 1000
        |    // greatest(1, sum(share_milli * share_milli)) AS BIGINT)
        |    AS eff_dims_milli FROM sh)
        |SELECT CAST(sh.dim AS BIGINT) AS dim,
        |  CAST(sh.share_milli AS BIGINT) AS share_milli,
        |  pr.eff_dims_milli
        |FROM sh CROSS JOIN pr
        |ORDER BY sh.share_milli DESC, sh.dim LIMIT 10""".stripMargin) {
      (s, d) =>
      val p = embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("dim").cast("long").as("dim"),
          floor(col("x").cast("double") * 1000).cast("long").as("qv"))
      val m = p.groupBy(col("dim"))
        .agg(expr("sum(qv) DIV count(*)").as("mu"))
      val v = p.join(broadcast(m), Seq("dim"))
        .groupBy(col("dim"))
        .agg(sum(expr("(qv - mu) * (qv - mu)")).as("vn"))
        .tcache() // total + shares share the 64-row relation
      val t = v.agg(sum(col("vn")).as("tv"),
        expr("greatest(1, sum(vn) DIV 1000000000)").as("rsc"))
      val sh = v.crossJoin(broadcast(t))
        .select(col("dim"),
          expr("(vn DIV rsc) * 1000 DIV greatest(1, tv DIV rsc)")
            .as("share_milli"))
        .tcache() // participation ratio + top-10 share it
      val pr = sh.agg(expr("CAST(sum(share_milli) * sum(share_milli)" +
        " * 1000 DIV greatest(1, sum(share_milli * share_milli))" +
        " AS BIGINT)").as("eff_dims_milli"))
      sh.crossJoin(broadcast(pr))
        .select(col("dim"), col("share_milli"), col("eff_dims_milli"))
        .orderBy(col("share_milli").desc, col("dim"))
        .limit(10)
    }
  )

  /** Product quantization over the integer grid: 8 subspaces × 8 dims,
    * k=4 codes per subspace, one exact-integer Lloyd iteration per
    * codebook (same recipe as [[kmeansAssignments]] — the non-negative
    * grid keeps every distance a long and every centroid rounding
    * engine-identical). Returns one row per (vector, subspace) with
    * the assigned symbol and its exact squared reconstruction error. */
  /** Per-vector subspace slices of the quantized grid. */
  private def subVectors(s: SparkSession, d: String): DataFrame =
    quantized(s, d)
      .select(col("vec_id"), posexplode(expr(
        "transform(sequence(0, 7), s -> slice(q, s * 8 + 1, 8))"))
        .as(Seq("sub", "sq")))

  // native codegen kernel (vec_l2i) — the fold shape is pinned by
  // VecL2ISpec against the aggregate(zip_with(...)) it replaced
  private def pqDistExpr = graft.cdc.GraftFunctions.vec_l2i(
    col("sq"), col("c"))

  /** (sub → per-symbol centroids) fetched to the driver — 8×4×8
    * longs, the bounded codebook every PQ system broadcasts. */
  private def collectCodebooks(df: DataFrame)
      : Map[Int, Seq[(Long, Seq[Long])]] =
    Tables.boundedCollect(df, 64, "PQ codebook matrix (8 sub x <=8 codes)")
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).sortBy(_._1).toSeq).toMap

  /** Assign every (vector, subspace) slice to its nearest codebook
    * centroid — centroids as LITERALS (q115's k-means recipe): a pure
    * map-side argmin via array_min over (dist, j) structs, dispatched
    * per subspace by a when-chain on `sub`. No 4× join expansion, no
    * per-(sub, vec) window shuffle; lexicographic struct ordering
    * keeps the min-dist lowest-j tie-break bit-identical to the
    * oracle's row_number. */
  private def pqAssign(sub: DataFrame,
      cents: Map[Int, Seq[(Long, Seq[Long])]]): DataFrame = {
    val picks = (0 until 8).map { s2 =>
      val arms = cents(s2).map { case (j, c) =>
        struct(graft.cdc.GraftFunctions.vec_l2i(col("sq"),
          expr(s"array(${c.mkString("L,")}L)")).as("dist"),
          lit(j).as("j"))
      }
      (s2, array_min(array(arms: _*)))
    }
    val pick = picks.tail.foldLeft(
      when(col("sub") === picks.head._1, picks.head._2)) {
      case (acc, (s2, e2)) => acc.when(col("sub") === s2, e2)
    }
    sub.select(col("vec_id"), col("sub"), col("sq"), pick.as("pick"))
      .select(col("vec_id"), col("sub"), col("sq"),
        col("pick.j").as("j"), col("pick.dist").as("dist"))
  }

  /** Trained PQ codebooks (sub, j, c: 8-dim integer centroid) after
    * one Lloyd iteration per subspace — memoized (q117 + q118). */
  private val pqCbCache = new Tables.DfMemo("pq")

  private[ops] def pqCodebooks(s: SparkSession, d: String): DataFrame =
    pqCbCache.getOrElseUpdate((s, d)) {
      val sub = subVectors(s, d)
      val init = collectCodebooks(sub.filter(col("vec_id") < 4)
        .select(col("sub"), col("vec_id").as("j"), col("sq").as("c")))
      val a1 = pqAssign(sub, init).select(col("vec_id"), col("sub"), col("j"))
      val n1 = a1.groupBy(col("sub"), col("j")).agg(count(lit(1)).as("n"))
      val s1 = a1.join(sub, Seq("vec_id", "sub"))
        .select(col("sub"), col("j"), posexplode(col("sq")).as(Seq("i", "v")))
        .groupBy(col("sub"), col("j"), col("i")).agg(sum(col("v")).as("s"))
      s1.join(n1, Seq("sub", "j"))
        .select(col("sub"), col("j"), col("i"),
          expr("(2 * s + n) DIV (2 * n)").as("ci"))
        .groupBy(col("sub"), col("j"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("ci")))),
          p => p.getField("ci")).as("c"))
        .cache()
    }

  private def pqAssignments(s: SparkSession, d: String): DataFrame =
    pqAssign(subVectors(s, d), collectCodebooks(pqCodebooks(s, d)))
      .select(col("vec_id"), col("sub"), col("j").as("symbol"),
        col("dist").as("err"))

  /** Shifted non-negative integer quantization — the grid every
    * trained-index query (q115-q118) computes on. Memoized: one
    * cached relation of vectors × 64 longs instead of four scans. */
  /** THE quantization grid, one source of truth: floor(x·1000)+1000
    * over the embedding array — shifted non-negative so L2 distances
    * are exact longs and centroid rounding is engine-identical. Five
    * call sites (session memo, q31 halves, ingest assignment, retrain)
    * MUST share it: the streaming-assign == batch-assign bit-identity
    * that the recall audits rest on is exactly this expression being
    * the same everywhere. */
  private[ops] val quantizeSql =
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000)" +
      " AS BIGINT) + 1000)"

  private val quantCache = new Tables.DfMemo("quant")

  private[ops] def quantized(s: SparkSession, d: String): DataFrame =
    quantCache.getOrElseUpdate((s, d))(
      // data-sized cache layout (Tables.cacheSized): one 64-long row
      // per vector (~512 B), so 64k rows/partition is ~32 MB
      Tables.cacheSized(
        prepared(s, d).select(col("vec_id"), expr(quantizeSql).as("q"))))

  /** (vec_id, j): every vector's trained cluster after two exact-
    * integer Lloyd iterations — memoized, shared by q115 (summary)
    * and q116 (search + recall audit). */
  private val kmCache = new Tables.DfMemo("lloyd")
  private val kmCentCache = new Tables.StatMemo[Seq[(Long, Seq[Long])]]("lloyd_cents")

  /** Map-side argmin assignment of the quantized grid against a
    * centroid LITERAL matrix — array_min over (dist, j) structs:
    * lexicographic struct ordering = min dist with lowest-j
    * tie-break, identical to the oracle's row_number ordering. */
  private def assignToCents(e: DataFrame,
      cents: Seq[(Long, Seq[Long])]): DataFrame = {
    val arms = cents.map { case (j, c) =>
      struct(graft.cdc.GraftFunctions.vec_l2i(col("q"),
        expr(s"array(${c.mkString("L,")}L)")).as("dist"),
        lit(j).as("j"))
    }
    e.select(col("vec_id"),
      array_min(array(arms: _*)).getField("j").as("j"))
  }

  /** The TRAINED k×64 centroid matrix after two exact-integer Lloyd
    * iterations — the driver-state coordination payload of the
    * k-means (k·dim longs, bounded), memoized so the IVF probe
    * ranking (q191's semantic arm, q239's recall audit) and the
    * assignment memo share one training run. */
  /** The Lloyd training kernel behind [[kmeansCentroids]], over an
    * arbitrary quantized relation `(vec_id, q)` from a given init:
    * one map-side argmin assignment against the init literals, one
    * keyed (cluster, dim) recompute with grid rounding, collect the
    * k×dim matrix. Public via [[retrainFromEmbeddings]] so the
    * drift-triggered retrain acts on the SAME arithmetic the batch
    * training used — retrained and original indexes stay
    * hash-comparable. */
  private def lloydTrain(e: DataFrame,
      init: Seq[(Long, Seq[Long])]): Seq[(Long, Seq[Long])] = {
    def collectCents(df: DataFrame): Seq[(Long, Seq[Long])] =
      Tables.boundedCollect(df, init.size.max(8),
        s"k-means centroid matrix (k = ${init.size})")
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1).toSeq
    val a1 = assignToCents(e, init)
    val n1 = a1.groupBy(col("j")).agg(count(lit(1)).as("n"))
    val s1 = a1.join(e, "vec_id")
      .select(col("j"), posexplode(col("q")).as(Seq("i", "v")))
      .groupBy(col("j"), col("i")).agg(sum(col("v")).as("s"))
    collectCents(s1.join(n1, "j")
      .select(col("j"), col("i"),
        expr("(2 * s + n) DIV (2 * n)").as("ci"))
      .groupBy(col("j"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("ci")))),
        p => p.getField("ci")).as("c")))
  }

  private[ops] def kmeansCentroids(s: SparkSession,
      d: String): Seq[(Long, Seq[Long])] =
    kmCentCache.getOrElseUpdate((s, d)) {
      val e = quantized(s, d)
      val init = Tables.boundedCollect(
        e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("j"), col("q").as("c")),
        8, "k-means centroid matrix (k = 8)")
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1).toSeq
      lloydTrain(e, init)
    }

  /** Retrain the IVF centroids from a STORED vectors relation
    * `(vec_id, embedding)` — the action the ingest drift probe's
    * `retrain_recommended` flag calls for
    * ([[graft.streaming.StreamOps.ivfIngestBatch]] with a `vecsDir`).
    * Seeds are the k lowest vec_ids (deterministic under re-runs and
    * partitioning); the kernel is the batch training's exact-integer
    * Lloyd, so recall audits run unchanged against the new matrix.
    * At 100 TB: one tiny seed collect + the two keyed passes the
    * batch trainer already costs. */
  def retrainFromEmbeddings(vecs: DataFrame, k: Int = 8,
      adaptiveSeeds: Boolean = false): Seq[(Long, Seq[Long])] = {
    val e = vecs.select(col("vec_id"), expr(quantizeSql).as("q"))
    val init =
      if (adaptiveSeeds) farthestPointSeeds(e, k)
      else Tables.boundedCollect(
        e.orderBy(col("vec_id")).limit(k)
          .select(col("vec_id").as("j"), col("q").as("c")),
        k, s"retrain seed matrix (k = $k)")
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1).toSeq
    lloydTrain(e, init)
  }

  /** Deterministic farthest-point (k-means++-flavored, but argmax
    * instead of sampled — bit-reproducible) seeding over a quantized
    * relation: seed 1 is the lowest vec_id's vector; every next seed
    * is the vector FARTHEST from its nearest chosen seed (ties →
    * lowest vec_id). Data-adaptive where the lowest-k-ids cold
    * seeding is structurally blind: drifted mass always arrives
    * under HIGH vec_ids (a new source, a new modality), so id-ordered
    * seeds can never land on it and a retrain leaves it piled in one
    * cell — the exact skew the ingest report flags. With
    * farthest-point seeds the pile gets its own centroids and the
    * NEXT occupancy report recovers (IvfIngestSpec pins the cycle).
    * Cost: k passes, each a map-side min over ≤k literal distances +
    * a 1-row TakeOrdered (no global sort) — planned-maintenance
    * price, never per-query. */
  private def farthestPointSeeds(e: DataFrame,
      k: Int): Seq[(Long, Seq[Long])] = {
    def pick(df: DataFrame): (Long, Seq[Long]) = {
      val r = Tables.boundedCollect(df.limit(1), 1,
        "farthest-point seed (1 row)").head
      (r.getLong(0), r.getSeq[Long](1))
    }
    var seeds = Seq(pick(
      e.orderBy(col("vec_id")).select(col("vec_id"), col("q"))))
    while (seeds.size < k) {
      val dists = seeds.map { case (_, c) =>
        graft.cdc.GraftFunctions.vec_l2i(col("q"),
          expr(s"array(${c.mkString("L,")}L)"))
      }
      val minD =
        if (dists.size == 1) dists.head else array_min(array(dists: _*))
      seeds = seeds :+ pick(
        e.select(col("vec_id"), col("q"), minD.as("d"))
          .orderBy(col("d").desc, col("vec_id"))
          .select(col("vec_id"), col("q")))
    }
    seeds.sortBy(_._1)
  }

  private[ops] def kmeansAssignments(s: SparkSession, d: String): DataFrame =
    kmCache.getOrElseUpdate((s, d)) {
      // Distributed k-means in its canonical shape: the k×64 centroid
      // matrix is DRIVER state between iterations (see
      // [[kmeansCentroids]]), so each assign pass is a pure map-side
      // argmin over centroid LITERALS — no crossJoin row expansion,
      // no per-vector window shuffle. Only the centroid RECOMPUTE
      // (one keyed (cluster, dim) sum) shuffles — as it must.
      // data-sized cache layout (Tables.cacheSized): one row per vector
      Tables.cacheSized(
        assignToCents(quantized(s, d), kmeansCentroids(s, d)))
    }

  /** IVF-probed semantic top-k: the scale-shape retrieval arm q191
    * fuses (and q239 audits). Probe ranking is a map-side argmin-sort
    * over the k=8 trained centroid LITERALS (each query ranks cells
    * by exact-integer L2 on the quantized grid, takes the nearest
    * `nprobe`); candidates come from an equi-join of the corpus's
    * trained cell against the 20×nprobe probe list — NO corpus-side
    * crossJoin anywhere in the plan. Candidates are exact-reranked by
    * true rounded-double cosine, so at nprobe = k (full coverage —
    * this SF's exactness setting) the output is bit-identical to the
    * brute-force scan, while production sets nprobe « k and pays
    * only probed-cell occupancy; q239 reports the fused recall of
    * that pruned setting against full coverage. */
  private[ops] def ivfSemanticTop(s: SparkSession, d: String,
      nprobe: Int, k: Int): DataFrame = {
    val nn = prepared(s, d).select(col("vec_id"), col("v"), col("nrm"))
    val qv = nn.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"))
    val arms = kmeansCentroids(s, d).map { case (j, c) =>
      struct(graft.cdc.GraftFunctions.vec_l2i(col("q"),
        expr(s"array(${c.mkString("L,")}L)")).as("dist"),
        lit(j).as("j"))
    }
    // (qid, j) probe list: 20 × nprobe rows — driver-bounded, broadcast
    val probes = quantized(s, d).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"),
        explode(slice(transform(array_sort(array(arms: _*)),
          p => p.getField("j")), 1, nprobe)).as("j"))
    val wSem = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid"))
    nn.join(kmeansAssignments(s, d), "vec_id")
      .join(broadcast(probes), "j")
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(qv), "qid")
      .select(col("qid"), col("vec_id").as("cid"),
        round(dot(col("qv"), col("v")) /
          (sqrt(col("qn")) * sqrt(col("nrm"))), 6).as("score"))
      .withColumn("ra", row_number().over(wSem))
      .filter(col("ra") <= k)
      .select(col("qid"), col("cid"), col("ra"))
  }

  /** The trained centroid matrix, public for the streaming ingest
    * path ([[graft.streaming.StreamOps.ivfIngestBatch]]) and its
    * specs — k·64 longs of driver state, same memo as the query arms. */
  def trainedCentroids(s: SparkSession, d: String): Seq[(Long, Seq[Long])] =
    kmeansCentroids(s, d)

  /** The batch-trained (vec_id, j) assignment memo, public so the
    * ingest spec can pin streaming-assign == batch-assign. */
  def trainedAssignments(s: SparkSession, d: String): DataFrame =
    kmeansAssignments(s, d)

  /** Quantize + assign arrival embeddings (`vec_id`, `embedding`)
    * against a trained centroid matrix — the map-side half of IVF
    * index maintenance on ingest. Pure projection over centroid
    * LITERALS (no join, no shuffle): exactly the per-batch cost
    * profile a 1000-executor ingest needs. Returns (vec_id, j). */
  def assignArrivals(arrivals: DataFrame,
      cents: Seq[(Long, Seq[Long])]): DataFrame =
    assignToCents(arrivals.select(col("vec_id"), expr(quantizeSql).as("q")), cents)

  /** Materialize this module's session memos (quantized grid, Lloyd
    * assignments, PQ codebooks) — [[Prewarm]] hook. */
  private[ops] def prewarmQuantized(s: SparkSession, d: String): Unit =
    { quantized(s, d).count(); () }
  private[ops] def prewarmKmeans(s: SparkSession, d: String): Unit =
    { kmeansAssignments(s, d).count(); () }
  private[ops] def prewarmPq(s: SparkSession, d: String): Unit =
    { pqCodebooks(s, d).count(); () }

  private[ops] def prewarmMemos(s: SparkSession, d: String): Unit = {
    quantized(s, d).count()
    kmeansAssignments(s, d).count()
    pqCodebooks(s, d).count()
    ()
  }
}
