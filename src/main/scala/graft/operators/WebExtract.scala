package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the curation stage UPSTREAM of every
  * text operator in this engine: real corpora arrive as crawled markup,
  * and the quality/dedup/langid surface all assume the boilerplate
  * (nav, chrome, scripts) is already gone. No reference counterpart
  * (SURVEY §2.8 north-star; the reference ingests pre-parsed CDR lines
  * — `/root/reference/src/ProcessSums.scala` consumes delimited text).
  * This is the trafilatura/readability slot re-expressed as a
  * declarative Spark plan: the extraction is a chain of codegen'd
  * `regexp_replace`/`regexp_extract` passes (RE2-compatible patterns —
  * no backreferences, no lookaround — so the DuckDB oracle runs the
  * SAME patterns), never a UDF.
  *
  * Like the multimodal codec boundary ([[Multimodal.synthMediaPayload]]
  * precedent), the corpus carries no real markup, so [[synthHtml]]
  * wraps each document's text in a structurally-real page (head with
  * title/script/style, nav chrome, `<main>` with paragraph breaks and
  * every 7th word linkified, footer) — the wrap is deterministic SQL
  * both engines compute identically, and the extraction is graded by
  * ROUND TRIP: stripping the markup must recover the original text
  * byte-for-byte. A production deployment swaps the synthetic wrap for
  * the crawl's raw HTML column and keeps every downstream line.
  *
  * Scale shape: one codegen'd per-row map — no shuffle, no explode
  * that outlives the row, no driver participation. The 100 TB posture
  * is the map's linear floor (the `doc_pii_detect` regex-scan cell
  * already prices multi-pass RE2 scanning at scale).
  */
object WebExtract {

  /** Deterministic structurally-real page around `text`:
    * head (title + script + style that extraction MUST drop), nav and
    * footer boilerplate OUTSIDE `<main>` (extraction must not leak
    * them), the document text inside `<main>` with every 7th word
    * wrapped in a link (1-based: words 1, 8, 15, …). Pure SQL — the
    * oracle rebuilds the identical bytes. */
  def synthHtml(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ", -1)
    val body = array_join(
      transform(sequence(lit(1), size(words)), i =>
        when(((i - 1) % 7) === 0,
          concat(lit("<a href=\"/d/"), col("doc_id"), lit("/"), i,
            lit("\">"), element_at(words, i), lit("</a>")))
          .otherwise(element_at(words, i))), " ")
    docs.withColumn("html", concat(
      lit("<html><head><title>doc "), col("doc_id"),
      lit("</title><script>var t=1;</script>" +
        "<style>.m{color:#000}</style></head>" +
        "<body><nav>home about contact login</nav><main>"),
      body,
      lit("</main><footer>(c) corpus mirror - terms - privacy" +
        "</footer></body></html>")))
  }

  /** Strip script/style blocks, then every tag, then collapse runs of
    * whitespace. RE2-safe (one pass per block kind — RE2 has no
    * backreferences to share a `<(script|style)>.*?</\1>` pattern). */
  private def stripMarkup(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    trim(regexp_replace(noTags, "\\s+", " "))
  }

  /** Per-doc extraction report over the synthetic page:
    *   n_tags / n_links    — markup census (every tag; `<a ` openers)
    *   n_chars_html        — page size
    *   main_text           — tag-stripped content of `<main>` only
    *   n_chars_main        — its length
    *   full_text_len       — whole-page strip length (what a naive
    *                         tag-stripper would keep: nav+footer leak
    *                         in, the delta vs n_chars_main is the
    *                         boilerplate the main-selection removed)
    *   density             — n_chars_main / n_chars_html, 4dp
    *   recovered           — 1 iff main_text equals the original text
    *                         whitespace-normalized (the round trip) */
  def htmlExtract(docs: DataFrame): DataFrame = {
    val page = synthHtml(docs)
    val mainHtml = regexp_extract(col("html"), "(?s)<main>(.*)</main>", 1)
    page.select(
      col("doc_id"),
      col("source"),
      size(expr("regexp_extract_all(html, '<[^>]*>', 0)"))
        .cast("long").as("n_tags"),
      size(expr("regexp_extract_all(html, '<a [^>]*>', 0)"))
        .cast("long").as("n_links"),
      length(col("html")).cast("long").as("n_chars_html"),
      stripMarkup(mainHtml).as("main_text"),
      stripMarkup(col("html")).as("full_text"),
      trim(regexp_replace(col("text"), "\\s+", " ")).as("norm_text"))
    .select(
      col("doc_id"), col("source"), col("n_tags"), col("n_links"),
      col("n_chars_html"),
      length(col("main_text")).cast("long").as("n_chars_main"),
      length(col("full_text")).cast("long").as("full_text_len"),
      round(length(col("main_text")).cast("double") /
        col("n_chars_html"), 4).as("density"),
      (col("main_text") === col("norm_text")).cast("int").as("recovered"))
  }

  /** Per-source rollup — the publish gate a crawl-processing owner
    * reads: recovery rate (extraction fidelity), boilerplate share
    * (what main-selection saved vs naive stripping), link density. */
  def htmlExtractReport(docs: DataFrame): DataFrame =
    htmlExtract(docs)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("recovered").as("n_recovered"),
        sum("n_tags").as("n_tags"),
        sum("n_links").as("n_links"),
        round(avg("density"), 4).as("avg_density"),
        sum(col("full_text_len") - col("n_chars_main"))
          .as("boilerplate_chars"))
      .orderBy("source")
}
