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
}
