package graft

import graft.operators.TableSpec

/** Synthetic CDR fixtures per /root/repo/FIXTURES.md (schemas derived from
  * the reference's positional contracts; no reference data copied). */
object CdrFixtures {

  /** One clean line for `spec`: phone-shaped strings at the masked cols,
    * yyyyMMddHHmmss at starttime, (lac, ci) at the key cols, `t<i>`
    * elsewhere. */
  def cleanLine(spec: TableSpec, i: Int, lac: String, ci: String,
                phone: Int => String = j => s"1${800000000L + j}0"): String = {
    val f = Array.tabulate(spec.fieldCount) { j =>
      if (spec.maskCols.contains(j)) phone(i * 100 + j)
      else if (j == 0) s"${spec.prefix}${"%05d".format(i)}"
      else if (j == spec.starttimeCol) "20160114093012"
      else if (j == spec.lacCol) lac
      else if (j == spec.ciCol) ci
      else s"t$j"
    }
    f.mkString(spec.delim)
  }

  /** s61 fixture set: 8 clean lines hitting the yaxin map, 1 hitting only
    * yiyang, 1 hitting neither (FIXTURES §1: ~80/10/10), plus required dirty
    * rows: wrong arity ±1, empty masked field, unknown prefix, empty line. */
  def s61Lines: Seq[String] = {
    val spec = TableSpec.s61
    val yaxinHits = (0 until 8).map(i => cleanLine(spec, i, "4527",
      s"1003$i"))
    val yiyangOnly = cleanLine(spec, 8, "7777", "88")
    val noMatch = cleanLine(spec, 9, "0", "0")
    val shortLine = cleanLine(spec, 10, "4527", "10030")
      .split(',').dropRight(1).mkString(",")
    val longLine = cleanLine(spec, 11, "4527", "10030") + ",extra"
    val emptyPhone = {
      val f = cleanLine(spec, 12, "4527", "10031").split(",", -1)
      f(12) = ""
      f.mkString(",")
    }
    yaxinHits ++ Seq(yiyangOnly, noMatch, shortLine, longLine, emptyPhone,
      "99unknown,prefix,line", "")
  }

  /** yaxin code-map TSV (3 cols, key=c0,c1 val=c2) incl. a bad-arity row
    * (FIXTURES §3). */
  def yaxinTsv: Seq[String] =
    (0 until 10).map(i => s"4527\t1003$i\tdistrict_$i") :+ "badrow"

  /** yiyang code-map TSV (7 cols, key=c1,c2 val=c5) incl. a short row. */
  def yiyangTsv: Seq[String] = Seq(
    "x\t7777\t88\ty\tz\tzone_Q\tw",
    "x\t4527\t10030\ty\tz\tzone_A\tw",
    "short\trow")

  /** A 44-field pipe-delimited GN-shaped record (FIXTURES §2 — same shape as
    * the reference's sample, synthesized values): MSISDN at 0, IMSI at 6,
    * IMEI at 7, microsecond timestamps at 17/18, trailing empty fields. */
  def gnLine(i: Int): String = {
    val f = Array.tabulate(44) {
      case 0  => s"1861000${"%04d".format(i)}"
      case 6  => s"46000${"%010d".format(i)}"
      case 7  => s"35444${"%010d".format(i)}"
      case 17 => "2015-12-09 16:45:21.208811"
      case 18 => "2015-12-09 16:46:26.377570"
      case 42 | 43 => ""
      case j  => s"g$j"
    }
    f.mkString("|")
  }
}
