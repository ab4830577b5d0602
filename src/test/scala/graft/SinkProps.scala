package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck fuzz for the manifest sinks: random batch sequences
  * against exact driver-side models — last-write-wins per key for the
  * upsert sink, sum-over-first-delivery-per-batch-id for the merge sink
  * (random replays and id regressions included, directly fuzzing the
  * redelivery guard the crash matrix tests deterministically). */
object SinkProps extends Properties("Sinks") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(SparkSpec.fuzzN(5))

  private lazy val spark = SparkSpec.session

  private def storeClean(sink: String): Boolean = {
    val stored = Option(new java.io.File(sink, "store").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    stored == Streams.readManifest(sink).values.toSet
  }

  // batches of key->value maps (unique keys per batch: replace-by-key is
  // defined per key; duplicate in-batch keys would both land by design)
  private val genUpsertRun = Gen.listOfN(8, Gen.mapOf(for {
    k <- Gen.choose(1L, 9L)
    v <- Gen.choose(-50, 50)
  } yield k -> v * 0.25)).map(_.filter(_.nonEmpty))

  property("upsert sink: any batch sequence converges to last-write-wins per key; store stays clean") =
    Prop.forAll(genUpsertRun) { batches =>
      import spark.implicits._
      val sink = java.nio.file.Files.createTempDirectory("graft_prop_upsert").toString
      try {
        batches.foreach { b =>
          Streams.upsertByKey(spark, sink, "user_id")(
            b.toSeq.toDF("user_id", "v"))
        }
        val model = batches.foldLeft(Map.empty[Long, Double])(_ ++ _)
        val got =
          if (model.isEmpty) Map.empty[Long, Double]
          else Streams.readUpserted(spark, sink)
            .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        (got == model) :| s"got=$got model=$model" &&
          (batches.forall(_.isEmpty) || storeClean(sink)) :| "store not clean"
      } finally Streams.deleteRec(new java.io.File(sink))
    }

  // (batchId, partial rows) with ids drawn from a small range so replays
  // AND out-of-order regressions occur; the guard must merge a batch iff
  // its id exceeds the manifest's high-water mark
  private val genMergeRun = Gen.listOfN(10, for {
    id <- Gen.choose(0L, 6L)
    rows <- Gen.nonEmptyMap(for {
      k <- Gen.oneOf("m1", "m2", "m3")
      v <- Gen.choose(1L, 100L)
    } yield k -> v)
  } yield (id, rows))

  property("merge sink: random replays/regressions merge exactly once per advancing batch-id") =
    Prop.forAll(genMergeRun) { deliveries =>
      import spark.implicits._
      val sink = java.nio.file.Files.createTempDirectory("graft_prop_merge").toString
      try {
        deliveries.foreach { case (id, rows) =>
          Streams.mergeKeyedPartial(spark, sink, Seq("mois"), Seq("ca_cents"), id)(
            rows.toSeq.toDF("mois", "ca_cents"))
        }
        var hwm = -1L
        val model = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
        deliveries.foreach { case (id, rows) =>
          if (id > hwm) { hwm = id; rows.foreach { case (k, v) => model(k) += v } }
        }
        val got =
          if (model.isEmpty) Map.empty[String, Long]
          else Streams.readUpserted(spark, sink)
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        (got == model.toMap) :| s"got=$got model=${model.toMap} hwm=$hwm" &&
          (model.isEmpty || storeClean(sink)) :| "store not clean"
      } finally Streams.deleteRec(new java.io.File(sink))
    }
}
