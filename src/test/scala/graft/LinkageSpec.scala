package graft

import org.apache.spark.sql.functions._
import graft.operators.Linkage

class LinkageSpec extends SparkTestBase {

  private def dict(names: String*) = {
    val s = spark
    import s.implicits._
    names.toDF("name")
  }

  private def queries(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("q_id", "q_name", "true_name")
  }

  test("linkEntities: best match within block, deterministic tie-break, " +
    "no cross-block candidates") {
    val d = dict("red widget", "red wedge", "blue bolt")
    val q = queries(
      (1L, "red widgett", "red widget"), // 1 edit from red widget
      (2L, "red wodge", "red wedge"),    // 1 edit from red wedge
      (3L, "zinc plate", "zinc plate"))  // block 'z' empty → unmatched
    val out = Linkage.linkEntities(q, d).collect()
      .map(r => r.getAs[Long]("q_id") -> (r.getAs[String]("matched_name"),
        r.getAs[Long]("lev"))).toMap
    assert(out(1L) == ("red widget", 1L))
    assert(out(2L) == ("red wedge", 1L))
    assert(!out.contains(3L)) // blocking means no candidate, not a bad match
    // equidistant tie → lexicographically smaller name wins (portable order)
    val tie = Linkage.linkEntities(
      queries((9L, "red wadge", "n/a")), d).collect()
    // lev(red wadge, red wedge) = 1; lev(red wadge, red widget) = 2
    assert(tie.head.getAs[String]("matched_name") == "red wedge")
  }

  test("linkEntities honors maxLev; linkEval keeps unmatched queries in " +
    "the denominator") {
    val d = dict("alpha particle")
    val q = queries(
      (0L, "alpha particl", "alpha particle"),  // lev 1, class 0
      (3L, "alpha pebble", "alpha particle"),   // lev > 3, class 0
      (1L, "alpha particle", "alpha particle")) // lev 0, class 1
    assert(Linkage.linkEntities(q, d, maxLev = 0).count() == 1)
    val ev = Linkage.linkEval(q, d).collect()
      .map(r => r.getAs[Long]("mangle") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_matched"),
          r.getAs[Long]("n_correct"), r.getAs[Long]("accuracy_e4"))).toMap
    assert(ev(0L) == (2L, 1L, 1L, 5000L)) // the lev-4 query still counted
    assert(ev(1L) == (1L, 1L, 1L, 10000L))
  }

  test("mangle never touches the blocking character and stays within " +
    "lev 3 of the original") {
    val s = spark
    import s.implicits._
    val names = Seq("small ring", "red widget", "hot gear", "beige sleeve")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
      .select(col("id"), col("name"),
        Linkage.mangle(col("name"), col("id")).as("dirty"))
      .withColumn("lev", levenshtein(col("name"), col("dirty")))
      .collect()
    df.foreach { r =>
      assert(r.getAs[String]("name").head == r.getAs[String]("dirty").head)
      assert(r.getAs[Int]("lev") >= 1 && r.getAs[Int]("lev") <= 3)
    }
  }
}
