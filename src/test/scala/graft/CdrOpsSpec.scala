package graft

import org.apache.spark.sql.functions._
import graft.operators.{CdrOps, TableSpec}

class CdrOpsSpec extends SparkTestBase {
  import CdrOps._

  private def linesDf(lines: Seq[String]) = {
    val s = spark
    import s.implicits._
    lines.toDF("value")
  }

  test("md5 golden vectors (RFC-1321) match Spark's md5()") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      "" -> "d41d8cd98f00b204e9800998ecf8427e",
      "a" -> "0cc175b9c0f1b6a831c399e269772661",
      "abc" -> "900150983cd24fb0d6963f7d28e17f72",
      "message digest" -> "f96b697d7cb7938d525a2f31aaf161d0")
    val got = cases.map(_._1).toDF("v").select(md5($"v")).as[String]
      .collect().toSeq
    assert(got == cases.map(_._2))
    cases.foreach { case (in, exp) => assert(md5hex(in) == exp) }
  }

  test("parseDelim keeps trailing empty fields (SURVEY §2.9.10)") {
    val df = parseDelim(linesDf(Seq("a|b|", "a||")), "|")
    assert(df.select(size(col("f"))).collect().map(_.getInt(0)).toSeq ==
      Seq(3, 3))
  }

  test("field accessors: 0-based; out-of-range yields ERROR not a throw") {
    val df = parseDelim(linesDf(Seq("a|b|c")), "|")
    val row = df.select(field(0), field(2), fieldOrError(5)).head
    assert(row.getString(0) == "a")
    assert(row.getString(1) == "c")
    assert(row.getString(2) == "ERROR")
  }

  test("arityFilter drops wrong-arity records") {
    val df = arityFilter(parseDelim(linesDf(Seq("a,b,c", "a,b", "a,b,c,d")),
      ","), 3)
    assert(df.count() == 1)
  }

  test("maskFields: masks listed cols, preserves others, OOB is a no-op, " +
    "empty field hashes to md5('')") {
    val df = parseDelim(linesDf(Seq("p1|keep||z")), "|")
    val out = rejoin(maskFields(df, Seq(0, 2, 99)), "|")
      .select("value").head.getString(0)
    assert(out == s"${md5hex("p1")}|keep|${md5hex("")}|z")
  }

  test("dropFields and projectFields rebuild without index arithmetic") {
    val df = parseDelim(linesDf(Seq("a|b|c|d|e")), "|")
    assert(rejoin(dropFields(df, Seq(1, 3)), "|").select("value")
      .head.getString(0) == "a|c|e")
    assert(rejoin(projectFields(df, Seq(4, 0, 2)), "|").select("value")
      .head.getString(0) == "e|a|c")
  }

  test("gn44: mask chain on 0,1,2,7 + 44→10 projection (Flume pipeline)") {
    val line = CdrFixtures.gnLine(1)
    val raw = line.split("\\|", -1)
    val df = parseDelim(linesDf(Seq(line)), "|")
    val masked = maskFields(df, TableSpec.gn44.maskCols)
    val projected = rejoin(projectFields(masked, TableSpec.gn44Projection),
      "|").select("value").head.getString(0)
    val expect = TableSpec.gn44Projection.map { i =>
      if (TableSpec.gn44.maskCols.contains(i)) md5hex(raw(i)) else raw(i)
    }.mkString("|")
    assert(projected == expect)
  }

  test("loadCodeMap enforces arity and builds composite keys") {
    val yaxin = loadCodeMap(parseDelim(linesDf(CdrFixtures.yaxinTsv), "\t"),
      (0, 1), 2, 3)
    assert(yaxin.count() == 10) // badrow dropped
    assert(yaxin.filter(col("key") === "4527,10030")
      .head.getString(1) == "district_0")
    val yiyang = loadCodeMap(parseDelim(linesDf(CdrFixtures.yiyangTsv), "\t"),
      (1, 2), 5, 7)
    assert(yiyang.count() == 2) // short row dropped
  }

  test("loadCodeMap lenient mode keeps under-arity rows whose key/value " +
    "positions exist (the reference's commented-out 7-col guard)") {
    // same fixture, one 6-col row added: strict drops it, lenient keeps it
    val rows = CdrFixtures.yiyangTsv :+ "x\t9999\t55\ty\tz\tzone_Z"
    val parsed = parseDelim(linesDf(rows), "\t")
    val strict = loadCodeMap(parsed, (1, 2), 5, 7)
    assert(strict.count() == 2)
    val lenient = loadCodeMap(parsed, (1, 2), 5, 7, strict = false)
    // 2 full rows + the 6-col row; "short\trow" still dropped (no value col)
    assert(lenient.count() == 3)
    assert(lenient.filter(col("key") === "9999,55")
      .head.getString(1) == "zone_Z")
  }

  test("enrichLookup: inner join drops no-match AND empty dim values") {
    val s = spark
    import s.implicits._
    val fact = Seq("k1", "k2", "k3").toDF("fk")
    val dim = Seq(("k1", "v1"), ("k2", "")).toDF("key", "dim_value")
    val out = CdrOps.enrichLookup(fact, dim, col("fk"))
    assert(out.select("fk", "dim_value").collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq == Seq(("k1", "v1")))
  }

  test("enrichPipeline: flagship s61 golden over FIXTURES lines") {
    val dim = loadCodeMap(
      parseDelim(linesDf(CdrFixtures.yaxinTsv), "\t"), (0, 1), 2, 3)
    val out = CdrOps.enrichPipeline(linesDf(CdrFixtures.s61Lines),
      TableSpec.s61, dim)
    val rows = out.collect()
    // 8 yaxin hits + the empty-phone row (lac=4527,ci=10031 hits) = 9;
    // yiyang-only, no-match, short, long, unknown-prefix, empty all absent.
    assert(rows.length == 9)
    assert(rows.forall(_.getString(4) == "2g_call"))
    assert(rows.forall(_.getString(2) == "20160114093012"))
    // spot-check row i=0: phones at cols 12,15 of the generated line
    val r0 = CdrFixtures.s61Lines.head.split(",", -1)
    assert(rows.exists(r => r.getString(0) == md5hex(r0(12)) &&
      r.getString(1) == md5hex(r0(15)) && r.getString(3) == "district_0"))
    // the empty-phone row hashes md5("")
    assert(rows.exists(_.getString(0) == md5hex("")))
  }

  test("routing: withRecordType + routeTo cover all prefixes, unknown " +
    "prefixes preserved") {
    val all = CdrFixtures.s61Lines
    val df = withRecordType(linesDf(all).filter(col("value") =!= ""))
    val types = df.select("record_type").distinct().collect()
      .map(_.getString(0)).toSet
    assert(types.contains("61") && types.contains("99"))
    // 8 yaxin + yiyangOnly + noMatch + short + long + emptyPhone = 13
    assert(routeTo(linesDf(all), "61").count() == 13)
  }

  test("groupConcat: deterministic sorted newline-joined bags per key") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", "z"), ("a", "x"), ("b", "y")).toDF("k", "value")
    val out = CdrOps.groupConcat(df, col("k")).orderBy("group_key")
      .collect()
    assert(out(0).getString(1) == "x\nz")
    assert(out(0).getLong(2) == 2)
    assert(out(1).getString(1) == "y")
  }
}
