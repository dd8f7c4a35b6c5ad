package graft

import org.apache.spark.sql.functions._

import graft.operators.CdrOps

/** Property-style tests over the CDR field algebra (SURVEY §5.1), using
  * seeded random records (the offline cache has no scalatest↔scalacheck
  * bridge): masking preserves arity and non-target fields; drops remove
  * exactly the targets; parse/rejoin round-trips. */
class PropertySpec extends SparkTestBase {
  import CdrOps._

  private val rnd = new scala.util.Random(42)

  private def token(): String = {
    val n = rnd.nextInt(9)
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }
  private def record(): List[String] =
    List.fill(1 + rnd.nextInt(20))(token())

  private def df(fields: Seq[Seq[String]]) = {
    val s = spark
    import s.implicits._
    fields.map(_.mkString("|")).toDF("value")
  }

  test("property: masking preserves arity and every non-target field " +
    "(20 random trials, incl. out-of-range indexes)") {
    for (_ <- 1 to 20) {
      val recs = List.fill(5)(record())
      val idx = rnd.nextInt(26)
      val out = rejoin(maskFields(parseDelim(df(recs), "|"), Seq(idx)),
        "|").select("value").collect().map(_.getString(0))
      out.zip(recs).foreach { case (masked, orig) =>
        val mf = masked.split("\\|", -1)
        assert(mf.length == orig.length)
        orig.zipWithIndex.foreach { case (f, i) =>
          if (i == idx) assert(mf(i) == md5hex(f))
          else assert(mf(i) == f)
        }
      }
    }
  }

  test("property: dropFields removes exactly the targeted positions") {
    for (_ <- 1 to 20) {
      val recs = List.fill(5)(record())
      val idx = rnd.nextInt(26)
      val out = rejoin(dropFields(parseDelim(df(recs), "|"), Seq(idx)),
        "|").select("value").collect().map(_.getString(0))
      out.zip(recs).foreach { case (dropped, orig) =>
        val expect = orig.zipWithIndex.filterNot(_._2 == idx).map(_._1)
        assert(dropped.split("\\|", -1).toSeq == expect ||
          (expect.isEmpty && dropped == ""))
      }
    }
  }

  test("property: parse/rejoin round-trips any record") {
    for (_ <- 1 to 10) {
      val recs = List.fill(8)(record())
      val out = rejoin(parseDelim(df(recs), "|"), "|")
        .select("value").collect().map(_.getString(0)).toSeq
      assert(out == recs.map(_.mkString("|")))
    }
  }

  test("SQL users get dot_product via GraftExtensions injection") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(r == 11.0)
    // null on length mismatch, through SQL
    assert(spark.sql(
      "SELECT dot_product(array(1.0D), array(1.0D, 2.0D)) AS d")
      .head.isNullAt(0))
  }

  test("salted aggregation equals the direct aggregation") {
    val s = spark
    import s.implicits._
    // skewed: 90% of rows on one key
    val rows = (1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"cold${i % 7}", i.toLong))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"),
      sum("v").as("total")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sc = graft.operators.Skew.saltedCount(df, col("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ss = graft.operators.Skew.saltedSum(df, col("k"), col("v"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (k, (n, total)) =>
      assert(sc(k) == n)
      assert(ss(k) == total)
    }
  }
}
