package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

class BucketingSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle; plain tables do shuffle") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val li = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val or = s.read.parquet("/root/testdata/sf0.001/orders.parquet")

      // baseline: plain join shuffles both sides
      val plain = li.join(or, li("l_orderkey") === or("o_orderkey"))
        .groupBy("o_orderstatus").count()
      plain.collect()
      assert(Bucketing.countExchanges(plain) >= 2)

      // bucketed: co-located join, no Exchange under the join
      Bucketing.writeBucketed(li, "li_b", "l_orderkey", buckets = 4,
        sortBy = Some("l_orderkey"))
      Bucketing.writeBucketed(or, "or_b", "o_orderkey", buckets = 4,
        sortBy = Some("o_orderkey"))
      val joined = Bucketing.bucketedJoin(s, "li_b", "or_b",
        "l_orderkey", "o_orderkey")
      val n = joined.count()
      assert(n == li.count()) // every lineitem has its order
      assert(Bucketing.countExchanges(joined) == 0)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS li_b")
      s.sql("DROP TABLE IF EXISTS or_b")
    }
  }

  test("appendBucketed refuses a missing table — append-before-build must " +
    "fail loudly, not register an increment-only index") {
    val s = spark
    val df = s.read.parquet("/root/testdata/sf0.001/region.parquet")
    val e = intercept[IllegalArgumentException] {
      Bucketing.appendBucketed(df, "no_such_bucketed_table", "r_regionkey")
    }
    assert(e.getMessage.contains("does not exist"))
    assert(!s.catalog.tableExists("no_such_bucketed_table"),
      "the refused append must not have created the table")
  }
}
