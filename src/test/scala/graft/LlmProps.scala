package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck fuzz for the transforming span-dedup operator: random
  * corpora over a TINY word alphabet (so identical 8-word blocks arise
  * across documents by chance, plus forced whole-document duplicates)
  * must reproduce a driver-side reference of the C4-style contract —
  * split into span-word blocks, keep ONLY the (doc_id, blk)-first
  * occurrence of each distinct block text corpus-wide, re-assemble.
  * The fixed-case spec pins known shapes; this hunts the layouts nobody
  * writes down: empty documents, partial trailing blocks, within-doc
  * repeats, ties between a doc's own blocks and another doc's. */
object LlmProps extends Properties("Llm") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(SparkSpec.fuzzN(6))

  private lazy val spark = SparkSpec.session

  private def refSpanDedup(docs: Seq[(Long, String)],
      span: Int): Map[Long, (Long, Long, String)] = {
    case class B(doc: Long, blk: Long, text: String)
    val blocks = docs.flatMap { case (id, text) =>
      val ws = text.toLowerCase.split("\\s+", -1)
      val nBlocks = math.ceil(ws.length / span.toDouble).toLong
      (0L until nBlocks).map(b =>
        B(id, b, ws.slice((b * span).toInt, (b * span).toInt + span)
          .mkString(" ")))
    }
    val first = blocks.groupBy(_.text)
      .map { case (t, bs) => t -> bs.minBy(b => (b.doc, b.blk)) }
    docs.map { case (id, _) =>
      val mine = blocks.filter(_.doc == id)
      val kept = mine.filter(b => first(b.text) == b).sortBy(_.blk)
      id -> ((mine.size.toLong, kept.size.toLong,
        kept.map(_.text).mkString(" ")))
    }.toMap
  }

  // 1-8 docs of 0-20 words over a 3-word alphabet; the last doc
  // sometimes copies an earlier one verbatim (guaranteed duplication)
  private val genCorpus: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 8)
    texts <- Gen.listOfN(n, for {
      m <- Gen.choose(0, 20)
      ws <- Gen.listOfN(m, Gen.oneOf("x", "y", "qq"))
    } yield ws.mkString(" "))
    dupFrom <- Gen.choose(0, n - 1)
    dup <- Gen.oneOf(true, false)
  } yield {
    val ts = if (dup && n >= 2) texts.updated(n - 1, texts(dupFrom)) else texts
    ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  property("spanDedup equals the driver reference on random corpora") =
    Prop.forAll(genCorpus) { docs =>
      import spark.implicits._
      val got = Llm.spanDedup(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getString(3)))).toMap
      got == refSpanDedup(docs, 8)
    }
}
