package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ScalableRank, SkewJoin}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import TestSession.sf

  test("scalable rank equals the single-window rank for all methods") {
    val df = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_acctbal")
    import org.apache.spark.sql.expressions.Window
    val expectMin = df.withColumn("r", F.rank().over(Window.orderBy("c_acctbal")))
      .select("c_custkey", "r").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val gotMin = ScalableRank.withRank(df, "c_acctbal", "r", "min")
      .select("c_custkey", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotMin == expectMin)

    val expectDense = df.withColumn("r", F.dense_rank().over(Window.orderBy(F.col("c_acctbal").desc)))
      .select("c_custkey", "r").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val gotDense = ScalableRank.withRank(df, "c_acctbal", "r", "dense", descending = true)
      .select("c_custkey", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDense == expectDense)

    val gotOrd = ScalableRank.withRank(df, "c_acctbal", "r", "ordinal",
      tiebreakers = Seq("c_custkey"))
      .select("c_custkey", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectOrd = df.withColumn("r",
      F.row_number().over(Window.orderBy(F.col("c_acctbal").asc, F.col("c_custkey").asc)))
      .select("c_custkey", "r").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(gotOrd == expectOrd)
  }

  test("scalable rank handles null keys (dense offsets count the null group)") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.read.parquet(s"$sf/customer.parquet")
      .select(F.col("c_custkey"),
        F.when(F.col("c_custkey") % 5 === 0, null)
          .otherwise(F.col("c_acctbal")).as("bal"))
    for (m <- Seq("min", "dense")) {
      val fn = if (m == "min") F.rank() else F.dense_rank()
      val expect = df.withColumn("r", fn.over(Window.orderBy("bal")))
        .select("c_custkey", "r").collect()
        .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      val got = ScalableRank.withRank(df, "bal", "r", m)
        .select("c_custkey", "r").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"method=$m")
    }
  }

  test("salted join matches plain join on skewed data") {
    import spark.implicits._
    // hot key: 90% of left rows share key 1
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i)).toDF("k", "v")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).count()
    val salted = SkewJoin.saltedJoin(left, right, Seq("k")).count()
    assert(salted == plain)
    val plainLeft = left.join(right.filter($"k" > 500), Seq("k"), "left").count()
    val saltedLeft = SkewJoin.saltedJoin(left, right.filter($"k" > 500), Seq("k"), "left").count()
    assert(saltedLeft == plainLeft)
  }

  test("partitioned store write prunes on the partition column") {
    val store = new graft.store.TableStore(
      java.nio.file.Files.createTempDirectory("graft-part-store").toString, spark)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val ctx = graft.core.SysCtx.fresh()
    store.stageWrite("c", "orders_p", orders, ctx, partitionBy = Seq("o_orderstatus"))
    store.commitTransaction(ctx.transaction)
    val scanned = store.scan("c/orders_p").get.df
    assert(scanned.count() == orders.count())
    // partition pruning: physical plan's read selects only one dir
    val pruned = scanned.filter(F.col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      orders.filter(F.col("o_orderstatus") === "F").count())
    assert(plan.contains("PartitionFilters") || plan.contains("o_orderstatus"))
  }
}
