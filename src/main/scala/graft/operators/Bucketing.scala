package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables ONCE on their join key so
  * every subsequent join/aggregation on that key runs shuffle-free — the
  * 100 TB answer to "this join shuffles 100 TB every run" (SURVEY §7.1:
  * bucketing / pre-partitioning for co-located joins).
  *
  * Spark's bucketing lives in the catalog (`bucketBy` requires
  * `saveAsTable`); readers of both sides get `HashPartitioning(key, n)`
  * output partitioning, and Catalyst elides the Exchange on joins whose keys
  * match the bucket spec. */
object Bucketing {

  /** Persist `df` as a bucketed managed table (overwriting any previous
    * one). `buckets` should match the downstream parallelism target. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32,
                    sortBy: Option[String] = None): Unit = {
    val spark = df.sparkSession
    // An in-place REWRITE (forget/compact) must not lose the build-param
    // sidecar ([[setTableParams]]) across the drop+recreate — carry any
    // existing graft.* properties over to the new incarnation.
    val carried: Map[String, String] =
      if (!spark.catalog.tableExists(table)) Map.empty
      else try {
        spark.sql(s"SHOW TBLPROPERTIES $table").collect()
          .filter(_.getString(0).startsWith("graft."))
          .map(r => r.getString(0).stripPrefix("graft.") -> r.getString(1))
          .toMap
      } catch { case _: Throwable => Map.empty }
    // drop any previous table AND its location: a stale warehouse dir from
    // a dead session makes CREATE TABLE fail with LOCATION_ALREADY_EXISTS
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    sortBy.fold(w)(c => w.sortBy(c)).saveAsTable(table)
    if (carried.nonEmpty) setTableParams(spark, table, carried)
  }

  /** Write a small UNBUCKETED side table with the same
    * drop-stale-location discipline as [[writeBucketed]] — for index
    * metadata (one-row stats frames) that rides next to a bucketed
    * index. */
  def writePlain(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Append `df` to an EXISTING plain table created by [[writePlain]] —
    * the ledger-maintenance path (e.g. the funnel's RTBF tombstone
    * ledger): O(batch) appends to a small side table. Same
    * existence-require discipline as [[appendBucketed]]: appending to a
    * mistyped name must fail loudly, not register a fragment. */
  def appendPlain(df: DataFrame, table: String): Unit = {
    require(df.sparkSession.catalog.tableExists(table),
      s"appendPlain: table '$table' does not exist — build it with " +
        "writePlain first")
    df.write.mode("append").format("parquet").saveAsTable(table)
  }

  /** Append `df` to an EXISTING bucketed table created by [[writeBucketed]],
    * preserving the bucket layout: each appended file set is hashed into the
    * same `buckets` buckets on `key`, so readers keep
    * `HashPartitioning(key, n)` and co-located joins stay exchange-free
    * after the append. Spark validates the (key, buckets) spec against the
    * catalog and fails loudly on a mismatch rather than silently degrading
    * the layout. This is the index-MAINTENANCE path: grow a persisted index
    * by the increment's size instead of rewriting the corpus-sized table
    * (at 100 TB a rebuild re-pays the full corpus scan; an append pays one
    * pass over the batch). */
  def appendBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int = 32,
                     sortBy: Option[String] = None): Unit = {
    // mode("append").saveAsTable would silently CREATE a missing table, and
    // an append-before-build against a mistyped name then registers an
    // increment-only "index" that later probes would serve as if it were
    // the full corpus. Appending requires the table to already exist.
    require(df.sparkSession.catalog.tableExists(table),
      s"appendBucketed: table '$table' does not exist — build it with " +
        "writeBucketed first (append-before-build would register an " +
        "increment-only index)")
    val w = df.write.mode("append").format("parquet")
      .bucketBy(buckets, key)
    sortBy.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** The bucket count of an existing catalog table, if it is bucketed.
    * The in-place index rewrites (forget/compact) resolve their bucket
    * count from HERE rather than trusting a caller-supplied parameter: a
    * mismatched parameter would silently recreate the table with a
    * different bucket count, breaking the exchange-free co-location every
    * probe relies on, with no error anywhere (r16 advisor finding). */
  def tableBuckets(spark: SparkSession, table: String): Option[Int] =
    try {
      spark.sessionState.catalog
        .getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table))
        .bucketSpec.map(_.numBuckets)
    } catch { case _: Throwable => None }

  /** Persist build parameters on a table as TBLPROPERTIES — the sidecar
    * that lets probe-time entry points validate they were called with the
    * SAME parameters the index was built with (a mismatched probe matches
    * nothing and silently reads 'kept'/'novel' — a compliance false
    * negative with no error; r16 advisor finding). Keys are namespaced
    * `graft.*`. */
  def setTableParams(spark: SparkSession, table: String,
                     params: Map[String, String]): Unit = {
    val kvs = params.map { case (k, v) => s"'graft.$k'='$v'" }
      .mkString(", ")
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ($kvs)")
  }

  /** Read back a `graft.*` table parameter written by [[setTableParams]];
    * None for tables that predate the sidecar (legacy indexes validate
    * nothing — the documented fallback). */
  def getTableParam(spark: SparkSession, table: String,
                    key: String): Option[String] =
    try {
      spark.sql(s"SHOW TBLPROPERTIES $table").collect()
        .find(_.getString(0) == s"graft.$key").map(_.getString(1))
    } catch { case _: Throwable => None }

  /** Require that the caller's parameter matches the table's persisted
    * build parameter, when one exists. */
  def requireTableParam(spark: SparkSession, table: String, key: String,
                        expected: String): Unit =
    getTableParam(spark, table, key).foreach { v =>
      require(v == expected,
        s"$table was built with graft.$key=$v but probed with $expected " +
          "— a parameter-mismatched probe matches nothing and would " +
          "silently report every document as kept/novel")
    }

  /** Join two bucketed tables on their bucket key. When both sides share the
    * same bucket count, the physical plan has NO Exchange under the join —
    * verify with `countExchanges`. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))

  /** Number of shuffle Exchange operators in the final physical plan — the
    * observable for "this join is co-located". Traverses through AQE's
    * adaptive plan and materialized query stages (a post-execution adaptive
    * plan hides its exchanges inside `ShuffleQueryStageExec`). */
  def countExchanges(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  /** [[countExchanges]] EXCLUDING the scan-parallelism fan-out exchange
    * (`SparkEntry.t`'s `pmod(xxhash64(id), …)` repartition of a
    * sub-parallelism local input, r17): plan gates pin each OPERATOR's
    * shuffle budget; the fan-out is a property of the tiny test input,
    * absent at scale by construction (it only fires when the scan cannot
    * reach the session's parallelism). Recognized by its signature
    * single-expression xxhash64 hash partitioning — no operator exchange
    * here keys on a bare xxhash64. */
  def countOperatorExchanges(df: DataFrame): Int = {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // r18 (ADVICE): match the fan-out's EXACT shape — a single
    // pmod(xxhash64(col), lit) partition expression — instead of any
    // expression merely containing "xxhash64", so a future genuine
    // operator shuffle keyed on an xxhash64-derived salt is still
    // counted by the plan gates.
    def isScanFanout(s: ShuffleExchangeLike): Boolean =
      s.outputPartitioning match {
        case h: HashPartitioning if h.expressions.length == 1 =>
          h.expressions.head match {
            case org.apache.spark.sql.catalyst.expressions.Pmod(
                org.apache.spark.sql.catalyst.expressions.XxHash64(args, _),
                org.apache.spark.sql.catalyst.expressions.Literal(_, _), _) =>
              args.length == 1 &&
                args.head.isInstanceOf[
                  org.apache.spark.sql.catalyst.expressions.Attribute]
            case _ => false
          }
        case _ => false
      }
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case s: ShuffleExchangeLike if !isScanFanout(s) => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Render the FULL final physical plan as text, descending through AQE
    * wrappers and materialized query stages (whose default toString elides
    * their subtree) — the observable for plan-shape assertions like "this
    * subtree is a ReusedExchange" or "no join on column X survived". */
  def fullPlanString(df: DataFrame): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val sb = new StringBuilder
    def walk(p: SparkPlan, depth: Int): Unit = {
      sb.append("  " * depth).append(p.nodeName).append(' ')
        .append(p.simpleStringWithNodeId()).append('\n')
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      kids.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    sb.toString
  }
}
