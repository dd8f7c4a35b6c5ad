package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`), for a
  * training-data pipeline. No reference counterpart (SURVEY §2.8 north-star).
  *
  * All vector math uses higher-order functions (`zip_with` + `aggregate`) —
  * no UDFs, deterministic left-to-right double summation (which keeps results
  * bit-identical across engines that fold the same way).
  *
  * Per-pair work is ONE dot product: each side's L2 norm is computed once
  * per vector (a linear pre-pass) and carried as a column, so a candidate
  * pair costs a single fold instead of three. The division
  * `dot / (nrm_a * nrm_b)` is arithmetically identical to computing the
  * norms inline (same inputs, same fold order), so oracle parity holds
  * bit-for-bit.
  *
  * Scale posture: the brute-force variant is O(|Q|·|C|) and is only sane for
  * small query sets (it broadcasts Q); the sign-LSH variant buckets both
  * sides so the join is equi on bucket — the 100 TB path.
  */
object Similarity {

  /** Left-to-right double dot product of two array columns — a native
    * codegen'd Catalyst expression ([[graft.functions.DotProduct]]); the
    * interpreted `aggregate(zip_with(...))` fold it replaces is kept in
    * [[dotHof]] as the portability reference (identical bit-for-bit). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotNative(a, b)

  /** Higher-order-function formulation of [[dot]] (interpreted; reference
    * semantics for tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** vec_id, l2 — norm table (rounded 4dp for portability). */
  def norms(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), round(l2(col("embedding")), 4).as("l2"))

  /** Brute-force cosine top-k: for each query vector (`queryPred`), the k
    * nearest other vectors. The query side is broadcast, so the plan is one
    * scan of the corpus per batch of queries — no shuffle of the corpus.
    * Ties break on candidate id for determinism. */
  def knnBrute(emb: DataFrame, queryPred: Column, k: Int = 5): DataFrame = {
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        l2(col("embedding")).as("q_nrm"))
    val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      l2(col("embedding")).as("c_nrm"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos",
        dot(col("qv"), col("cv")) / (col("q_nrm") * col("c_nrm")))
    topK(scored, k)
  }

  /** Sign-LSH bucket key: the sign bits of a fixed set of dimensions
    * (1-based). A degenerate random-hyperplane LSH with axis-aligned
    * hyperplanes — deterministic and engine-portable. */
  def signBucket(v: Column, dims: Seq[Int]): Column =
    concat_ws("", dims.map(d =>
      when(element_at(v, d) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** LSH-bucketed ANN: candidates must share the sign-bucket with the query;
    * then exact cosine + top-k inside the bucket. Equi-join on the bucket key
    * ⇒ shuffle-partitionable by bucket; with b sign bits the corpus fans into
    * 2^b buckets, bounding each join partition at scale. */
  def knnLsh(emb: DataFrame, queryPred: Column, k: Int = 3,
             dims: Seq[Int] = Seq(1, 17, 33, 49)): DataFrame = {
    val withB = emb.withColumn("bucket", signBucket(col("embedding"), dims))
      .withColumn("nrm", l2(col("embedding")))
    val q = withB.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("nrm").as("q_nrm"), col("bucket"))
    val c = withB.select(col("vec_id").as("c_id"),
      col("embedding").as("cv"), col("nrm").as("c_nrm"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos",
        dot(col("qv"), col("cv")) / (col("q_nrm") * col("c_nrm")))
    topK(scored, k)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), round(col("cos"), 4).as("score"))
  }

  /** IVF (inverted-file) ANN — the other scale path besides sign-LSH:
    * coarse-quantize the corpus into `nlist` KMeans cells (seeded,
    * deterministic training), then search only the `nprobe` cells whose
    * centroids are nearest each query. Corpus-side work per query drops from
    * O(N) to O(N · nprobe / nlist); the cell assignment is a one-off batch
    * job whose output would be persisted (bucketed by cell) in production.
    *
    * Not oracle-expressible (KMeans training is not SQL) — covered by
    * ScalaTest with clustered fixtures; the driver records rows-only. */
  def knnIvf(emb: DataFrame, queryPred: Column, k: Int = 3,
             nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.vector_to_array
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    val withVec = emb
      .withColumn("dvec", col("embedding").cast("array<double>"))
      .withColumn("vec", array_to_vector(col("dvec")))
    val model = new KMeans().setK(nlist).setSeed(42)
      .setFeaturesCol("vec").setPredictionCol("cell")
      .fit(withVec)
    val assigned = model.transform(withVec)
      .select(col("vec_id"), col("embedding"), col("dvec"), col("cell"))
      .withColumn("nrm", l2(col("embedding")))
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray)
      }.toIndexedSeq).toDF("cell", "centroid")
    // nprobe nearest cells per query vector (tiny: |Q| × nlist)
    val q = assigned.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("dvec").as("qdv"), col("nrm").as("q_nrm"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("cdist"), col("cell"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist",
        dot(col("qdv"), col("qdv")) -
          lit(2) * dot(col("qdv"), col("centroid")) +
          dot(col("centroid"), col("centroid")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("q_id"), col("qv"), col("q_nrm"), col("cell"))
    // search only the probed cells
    val c = assigned.select(col("vec_id").as("c_id"),
      col("embedding").as("cv"), col("nrm").as("c_nrm"), col("cell"))
    val scored = c.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos",
        dot(col("qv"), col("cv")) / (col("q_nrm") * col("c_nrm")))
    topK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs: distinct (a < b) pairs sharing a
    * sign-bucket with cosine above `threshold`. */
  def cosineNearDup(emb: DataFrame, threshold: Double = 0.95,
                    dims: Seq[Int] = Seq(1, 17, 33, 49)): DataFrame = {
    val withB = emb.withColumn("bucket", signBucket(col("embedding"), dims))
      .withColumn("nrm", l2(col("embedding")))
    val a = withB.select(col("vec_id").as("vec_a"),
      col("embedding").as("va"), col("nrm").as("nrm_a"), col("bucket"))
    val b = withB.select(col("vec_id").as("vec_b"),
      col("embedding").as("vb"), col("nrm").as("nrm_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos",
        dot(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") > threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("score"))
  }
}
