package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for the silver cleaning invariants (SURVEY §5:
  * post-silver ids non-null+unique, amount bounds, no orphans) over
  * randomly dirty inputs. */
object SilverProps extends Properties("SilverCleaning") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(SparkSpec.fuzzN(10))

  private lazy val spark = SparkSpec.session

  private val orderSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))

  private val genOrder: Gen[Row] = for {
    key <- Gen.frequency(
      9 -> Gen.choose(1L, 50L).map(x => x: java.lang.Long),
      1 -> Gen.const(null: java.lang.Long))
    cust <- Gen.choose(1L, 15L) // some orphans vs 10 customers
    price <- Gen.frequency(
      8 -> Gen.choose(0.01, 2000.0).map(v => math.round(v * 100) / 100.0),
      1 -> Gen.const(-5.0), 1 -> Gen.const(0.0))
    days <- Gen.frequency(9 -> Gen.choose(0, 3650), 1 -> Gen.const(-20000)) // pre-1990
  } yield Row(key, cust, "O", price,
    new Timestamp(java.time.LocalDateTime.of(2015, 1, 1, 0, 0)
      .plusDays(days).toInstant(java.time.ZoneOffset.UTC).toEpochMilli), "P")

  private val customers = {
    val rows = (1L to 10L).map(i => Row(i, s"Customer#$i", 1, 0.0, "BUILDING"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))))
  }

  property("post-clean invariants: unique non-null keys, bounded amounts, no orphans") =
    Prop.forAll(Gen.listOfN(40, genOrder)) { rows =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows), orderSchema)
      val out = Silver.cleanOrders(df, customers).collect()
      val keys = out.map(_.getLong(0))
      val custs = out.map(_.getLong(1)).toSet
      keys.distinct.length == keys.length &&
        out.forall(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(4)) &&
        out.forall { r =>
          val p = r.getDouble(3); p > 0 && p <= Silver.MaxAmount
        } &&
        custs.subsetOf((1L to 10L).toSet) &&
        out.forall(_.getTimestamp(4).getTime >=
          Timestamp.valueOf(s"${Silver.MinDate.take(4)}-01-01 00:00:00").getTime)
    }

  property("cleaning is idempotent") =
    Prop.forAll(Gen.listOfN(25, genOrder)) { rows =>
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), orderSchema)
      val once = Silver.cleanOrders(df, customers)
      val twice = Silver.cleanOrders(once, customers)
      once.collect().map(_.toString).toSeq == twice.collect().map(_.toString).toSeq
    }
}
