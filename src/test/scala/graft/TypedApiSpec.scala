package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** The typed Dataset[T] surface: case-class encoders, joinWith, typed
  * groupByKey aggregation, flatMapGroups — each asserted equal to its
  * untyped DataFrame twin, so a user can pick either API and get identical
  * results. Typed operators run through the same Catalyst plans (encoders
  * are expressions, not reflection-at-runtime); the cost difference vs
  * DataFrame code is deserialization boundaries, which these tests keep at
  * the edges (one per group, not per row). */
object TypedApiSpec {
  // top-level (object-scoped) so ExpressionEncoder can instantiate them
  // without an outer-class scope
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double)
  case class Customer(c_custkey: Long, c_mktsegment: String)
}

class TypedApiSpec extends SparkSpec {
  import TypedApiSpec._

  private def orders = {
    val s = spark; import s.implicits._
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[Order]
  }
  private def customers = {
    val s = spark; import s.implicits._
    Tables.customer(spark, sf).select("c_custkey", "c_mktsegment").as[Customer]
  }

  test("typed filter/map pipeline equals the DataFrame twin") {
    val s = spark; import s.implicits._
    val typed = orders.filter(_.o_totalprice > 100000)
      .map(o => (o.o_orderstatus, o.o_orderkey))
      .toDF("st", "k").orderBy("k")
    val untyped = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 100000)
      .select(col("o_orderstatus").as("st"), col("o_orderkey").as("k"))
      .orderBy("k")
    assert(rows(typed) == rows(untyped))
  }

  test("joinWith yields typed pairs matching the untyped join") {
    val s = spark; import s.implicits._
    val o = orders
    val c = customers
    val pairs = o.joinWith(c, o("o_custkey") === c("c_custkey"), "inner")
      .map { case (o, c) => (o.o_orderkey, c.c_mktsegment) }
      .toDF("k", "seg").orderBy("k")
    val untyped = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("k"), col("c_mktsegment").as("seg"))
      .orderBy("k")
    assert(rows(pairs) == rows(untyped))
  }

  test("groupByKey + typed Aggregator equals groupBy.agg") {
    val s = spark; import s.implicits._
    // cents-exact typed sum (same determinism discipline as ColumnOps)
    val sumCents = new Aggregator[Order, Long, Double] {
      def zero = 0L
      def reduce(b: Long, o: Order) = b + math.rint(o.o_totalprice * 100).toLong
      def merge(x: Long, y: Long) = x + y
      def finish(b: Long) = b / 100.0
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }.toColumn
    val typed = orders.groupByKey(_.o_orderstatus)
      .agg(sumCents.name("rev"))
      .toDF("st", "rev").orderBy("st")
    val untyped = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus").as("st"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")).as("rev"))
      .orderBy("st")
    assert(rows(typed) == rows(untyped))
  }

  test("flatMapGroups computes per-group top-1 equal to the window twin") {
    val s = spark; import s.implicits._
    val typed = orders.groupByKey(_.o_orderstatus)
      .flatMapGroups { (st, it) =>
        // iterator is single-pass, O(1) state — the shape that scales
        var best: Order = null
        it.foreach { o =>
          if (best == null || o.o_totalprice > best.o_totalprice ||
            (o.o_totalprice == best.o_totalprice && o.o_orderkey < best.o_orderkey))
            best = o
        }
        Iterator((st, best.o_orderkey))
      }
      .toDF("st", "top_key").orderBy("st")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val untyped = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_orderstatus").as("st"), col("o_orderkey").as("top_key"))
      .orderBy("st")
    assert(rows(typed) == rows(untyped))
  }
}
