package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck equivalence for the text-ranking operators: on random
  * small corpora (repeated words, multi-space runs, empty and
  * whitespace-only documents), the distributed TF-IDF and unigram-LM
  * scores must match self-contained driver-side references computed
  * with the same tokenization contract. The fixed-case SearchSpec pins
  * intended semantics; these hunt the corpora nobody writes by hand. */
object SearchProps extends Properties("Search") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private val genWord = Gen.oneOf("a", "b", "cat", "dog", "spark", "x")
  private val genDoc = for {
    n <- Gen.choose(0, 8)
    ws <- Gen.listOfN(n, genWord)
    sep <- Gen.oneOf(" ", "  ", " \t ")
  } yield ws.mkString(sep)
  private val genCorpus = for {
    n <- Gen.choose(1, 6)
    docs <- Gen.listOfN(n, genDoc)
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def tok(t: String): Seq[String] =
    t.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private def round6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  property("tfidfTopTerms matches a driver reference on random corpora") =
    Prop.forAll(genCorpus) { corpus =>
      import spark.implicits._
      val n = corpus.size
      val tf = corpus.flatMap { case (id, t) =>
        tok(t).groupBy(identity).map { case (w, os) => (id, w, os.size.toLong) }
      }
      val df = tf.groupBy(_._2).map { case (w, rs) => w -> rs.size.toLong }
      val expected = tf.map { case (id, w, f) =>
        (id, w, f, df(w), round9(f * math.log(n.toDouble / df(w))))
      }.groupBy(_._1).flatMap { case (id, rows) =>
        rows.sortBy(r => (-r._5, r._2)).take(3).zipWithIndex
          .map { case (r, i) => (id, (i + 1).toLong, r._2, r._3, r._4, r._5) }
      }.toSet
      val got = Search.tfidfTopTerms(corpus.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))).toSet
      got == expected
    }

  property("unigramLogProb matches a driver reference on random corpora") =
    Prop.forAll(genCorpus) { corpus =>
      import spark.implicits._
      val all = corpus.flatMap { case (_, t) => tok(t) }
      val uni = all.groupBy(identity).map { case (w, os) => w -> os.size.toLong }
      val total = all.size.toDouble
      val expected = corpus.flatMap { case (id, t) =>
        val ws = tok(t)
        if (ws.isEmpty) None
        else Some((id, ws.size.toLong,
          round6(ws.map(w => math.log(uni(w)) - math.log(total)).sum / ws.size)))
      }.toSet
      val got = Llm.unigramLogProb(corpus.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      got == expected
    }
}
