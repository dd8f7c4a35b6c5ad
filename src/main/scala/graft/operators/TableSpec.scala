package graft.operators

/** Positional schema + masking/enrichment metadata for a delimited CDR-style
  * table.
  *
  * Re-expresses the reference's per-table metadata value class
  * (reference: src/Process.scala:15-23 — `Process(array, line_length,
  * starttime, lac, ci, sufix_flag)`): which 0-based columns hold subscriber
  * identifiers to MD5-mask, the expected field arity (the dirty-data filter),
  * and the positions of the start-time / LAC / CI columns plus the output tag.
  *
  * @param name       logical table name (s61..s66)
  * @param prefix     2-char record-type prefix routing lines to this table
  * @param delim      field delimiter (a literal string, not a regex)
  * @param fieldCount expected arity; records with a different split length are
  *                   dropped (reference: src/ProcessSums.scala:435)
  * @param maskCols   0-based field indexes to MD5-mask (phone numbers)
  * @param starttimeCol 0-based index of the record start-time field
  * @param lacCol     0-based index of the LAC field (enrichment key part 1)
  * @param ciCol      0-based index of the CI field (enrichment key part 2)
  * @param tag        output tag appended to enriched records
  */
final case class TableSpec(
    name: String,
    prefix: String,
    delim: String,
    fieldCount: Int,
    maskCols: Seq[Int],
    starttimeCol: Int,
    lacCol: Int,
    ciCol: Int,
    tag: String)

object TableSpec {
  // The six enrichable socket tables
  // (reference: src/StreamingSocketProcess.scala:18-23).
  val s61 = TableSpec("s61", "61", ",", 97, Seq(12, 15), 1, 23, 24, "2g_call")
  val s62 = TableSpec("s62", "62", ",", 91, Seq(12, 15), 1, 23, 24, "3g_call")
  val s63 = TableSpec("s63", "63", ",", 50, Seq(11), 1, 18, 19, "2g_address")
  val s64 = TableSpec("s64", "64", ",", 50, Seq(11), 1, 18, 19, "3g_address")
  val s65 = TableSpec("s65", "65", ",", 61, Seq(13, 16), 1, 21, 22, "2g_sms")
  val s66 = TableSpec("s66", "66", ",", 61, Seq(13, 16), 1, 21, 22, "3g_sms")

  val enrichable: Seq[TableSpec] = Seq(s61, s62, s63, s64, s65, s66)

  /** Raw-archive-only prefixes (no parsing; reference:
    * src/StreamingSocketProcess.scala:138-159). */
  val archiveOnlyPrefixes: Seq[String] = Seq("60", "67", "68", "69", "70")

  val allPrefixes: Seq[String] =
    (enrichable.map(_.prefix) ++ archiveOnlyPrefixes).sorted

  val byPrefix: Map[String, TableSpec] =
    enrichable.map(s => s.prefix -> s).toMap

  /** The Flume-path GN/GPRS record: 44 pipe-delimited fields, masked ids at
    * 0,1,2,7, projected to 10 columns 0,7,17,1,2,32,33,36,22,43
    * (reference: src/DesenPross.scala:167-176, src/StreamingFlumeProcess.scala:146-149). */
  val gn44 = TableSpec("gn", "", "|", 44, Seq(0, 1, 2, 7), 17, -1, -1, "gn")

  /** The reference's 44→10 projection column order
    * (reference: src/DesenPross.scala:170-175). */
  val gn44Projection: Seq[Int] = Seq(0, 7, 17, 1, 2, 32, 33, 36, 22, 43)
}
