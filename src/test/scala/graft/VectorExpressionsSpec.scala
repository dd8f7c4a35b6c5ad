package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions.dotNative

class VectorExpressionsSpec extends SparkTestBase {

  test("native DotProduct is bit-identical to the HOF fold on float arrays") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2 - 1),
        Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      dotNative(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native DotProduct matches zip_with pad semantics: length mismatch " +
    "and null element give NULL; null input gives NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq[Option[Float]](Some(1f), Some(2f)),
        Seq[Option[Float]](Some(3f))), // length mismatch
      (2L, Seq[Option[Float]](Some(1f), None),
        Seq[Option[Float]](Some(3f), Some(4f))), // null element
      (3L, Seq[Option[Float]](Some(1f), Some(2f)),
        Seq[Option[Float]](Some(3f), Some(4f)))) // clean
      .toDF("id", "a", "b")
    val out = df.select(col("id"), dotNative(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).isNullAt(1))
    assert(out(2).getDouble(1) == 11.0)
    val nullIn = df.limit(1)
      .select(dotNative(lit(null).cast("array<float>"), col("b")))
      .head
    assert(nullIn.isNullAt(0))
  }

  test("interpreted (non-codegen) path agrees with codegen path") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1.5, 2.5, -3.0), Seq(2.0, 0.5, 4.0))).toDF("a", "b")
    // force interpreted eval
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    val noCg = df.select(dotNative(col("a"), col("b"))).head.getDouble(0)
    s.conf.set("spark.sql.codegen.wholeStage", "true")
    val cg = df.select(dotNative(col("a"), col("b"))).head.getDouble(0)
    assert(noCg == cg && cg == (3.0 + 1.25 - 12.0))
  }

  test("TopKByScore: heap aggregate == window row_number under ties and " +
    "across partial-merge boundaries; SQL registration works") {
    val s = spark
    import s.implicits._
    // tie-heavy data: many equal scores so the id tie-break is load-bearing;
    // 8 partitions so partial heaps MUST merge correctly
    val rows = for (g <- 0L until 5L; i <- 0L until 40L)
      yield (g, i, (i % 7).toDouble / 7.0)
    val df = rows.toDF("g", "id", "score").repartition(8)
    val heap = df.groupBy(col("g"))
      .agg(graft.functions.TopKFunctions
        .topKByScore(col("score"), col("id"), 5).as("topk"))
      .select(col("g"), posexplode(col("topk")).as(Seq("rank", "t")))
      .select(col("g"), col("rank"), col("t.score").as("score"),
        col("t.c_id").as("id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id"))
    val win = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("g"), (col("rn") - 1).as("rank"), col("score"), col("id"))
    assert(heap.collect().toSet == win.collect().toSet)
    // rank order inside the array is the ranking order (score DESC, id ASC)
    val g0 = heap.filter(col("g") === 0).orderBy("rank").collect()
      .map(r => (r.getDouble(2), r.getLong(3))).toSeq
    assert(g0 == g0.sortBy { case (sc, id) => (-sc, id) })
    // SQL surface (GraftExtensions): literal k required and honored
    df.createOrReplaceTempView("topk_in")
    val viaSql = s.sql(
      """SELECT g, top_k_by_score(score, id, 5) AS topk
        |FROM topk_in GROUP BY g""".stripMargin)
      .select(col("g"), explode(col("topk"))).count()
    assert(viaSql == 25L) // 5 groups x k=5
  }

  test("residual PQ: vectors built as centroid + a residual-codebook entry " +
    "reconstruct EXACTLY, so residual ADC equals exact IVF scoring") {
    val s = spark
    import s.implicits._
    // nlist=2 centroids (vec 0/1), ksub=2 residual seeds (vec 2/3 — their
    // residuals vs their own cells), m=2 subspaces of 2 dims.
    val c0 = Seq(10f, 10f, 10f, 10f)
    val c1 = Seq(-10f, -10f, -10f, -10f)
    // seed residuals: r2 = 0 (so the zero-residual centroid vectors are
    // exactly encodable too), r3 = (-.3, .2, -.1, .3)
    val v2 = Seq(10f, 10f, 10f, 10f)           // cell 0, res (0,0,0,0)
    val v3 = Seq(-10.3f, -9.8f, -10.1f, -9.7f) // cell 1, res (-.3,.2,-.1,.3)
    // composites: centroid + per-subspace residual slices of r2/r3
    val v4 = Seq(9.7f, 10.2f, 10f, 10f)        // c0 + (r3|0, r2|1)
    val v5 = Seq(-10f, -10f, -10.1f, -9.7f)    // c1 + (r2|0, r3|1)
    val v6 = Seq(9.7f, 10.2f, 9.9f, 10.3f)     // c0 + (r3|0, r3|1)
    val emb = Seq(0L -> c0, 1L -> c1, 2L -> v2, 3L -> v3,
      4L -> v4, 5L -> v5, 6L -> v6)
      .map { case (i, v) => (i, v, 0) }.toDF("vec_id", "embedding", "label")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val residual = rows(Similarity.knnIvfPqResidual(emb,
      col("vec_id") >= 4, k = 2, nlist = 2, nprobe = 1, m = 2, ksub = 2))
    val exactIvf = rows(Similarity.knnIvf(emb,
      col("vec_id") >= 4, k = 2, nlist = 2, nprobe = 1))
    // every residual is exactly a codebook entry per subspace →
    // reconstruction is bit-exact → ADC scores equal exact scores
    assert(residual == exactIvf)
    assert(residual.nonEmpty)
  }
}
