package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck reference-replay fuzz for the training-data prep operators:
  * every sampling / chunking / packing decision in [[Prep]] is a pure
  * function of (id, seed) by design, so each property re-derives the
  * SAME decision in independent driver-side Scala and demands exact
  * equality on random corpora — random Unicode text, hostile whitespace
  * (leading/trailing/runs/tabs/newlines, empty strings), and random
  * operator parameters the fixture-corpus PrepSpec never varies. This is
  * the [[SketchProps]] posture applied to prep: the replays are the same
  * arithmetic the DuckDB oracles restate, so a falsification here means
  * either the engine or the oracle contract is wrong.
  *
  * Spark session-backed (the operators are DataFrame transforms), so the
  * case count per property is small; the generators concentrate on the
  * edges (empty text, width-1 chunks, budget==chunk size) where a slip
  * in the ceil/slice/next-fit arithmetic would land.
  */
object PrepProps extends Properties("Prep") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(SparkSpec.fuzzN(8))

  private lazy val spark = SparkSpec.session

  private val M32 = 4294967296L

  /** Driver replay of [[Prep.hashPct]]/[[Prep.hashPpm]]'s high-bits
    * multiplicative hash. Exact while (id+seed)*C fits a Long — the
    * generators stay far inside the documented ~3.4e9 id bound. */
  private def refBucket(id: Long, seed: Long, buckets: Long): Long =
    java.lang.Math.floorMod((id + seed) * Prep.KnuthC, M32) * buckets / M32

  /** The raw 32-bit hash itself — the sort key [[Prep.packSequences]] and
    * [[Prep.shuffleDeterministic]] order by. NOT refBucket(_, _, M32):
    * h * 2^32 overflows Long for h >= 2^31, flipping the key's sign. */
  private def refHash(id: Long, seed: Long): Long =
    java.lang.Math.floorMod((id + seed) * Prep.KnuthC, M32)

  // --- corpus generator -----------------------------------------------

  /** Tokens that stress the regex-split contract: plain words, Unicode
    * (incl. astral plane), and the empty string a leading separator
    * produces. Separators include runs and mixed \t\n\r — the cases
    * where Spark's limit(-1) split and a naive reference diverge. */
  private val genWord: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(6)),
    2 -> Gen.oneOf("é", "漢字", "𝕊", "naïve", "ß", "x"),
    1 -> Gen.const(""))
  private val genSep: Gen[String] = Gen.frequency(
    6 -> Gen.const(" "),
    2 -> Gen.oneOf("  ", "\t", "\n", " \t "),
    1 -> Gen.const("\r\n"))
  private val genText: Gen[String] = Gen.frequency(
    8 -> (for {
      n <- Gen.choose(1, 24)
      ws <- Gen.listOfN(n, genWord)
      seps <- Gen.listOfN(n, genSep)
      lead <- Gen.oneOf("", " ", "\t")
      trail <- Gen.oneOf("", " ", "\n")
    } yield lead + ws.zip(seps).map { case (w, s) => w + s }.mkString.dropRight(
      seps.last.length) + trail),
    1 -> Gen.const(""),
    1 -> Gen.oneOf(" ", "   ", "\t\t"))

  private case class Doc(id: Long, source: String, text: String) {
    def nChars: Long = text.length.toLong
  }
  /** Dense ids 0..n-1 — the precondition [[Prep.negativeSamples]]
    * enforces and the permutation replay needs. */
  private val genCorpus: Gen[List[Doc]] = for {
    n <- Gen.choose(2, 28)
    texts <- Gen.listOfN(n, genText)
    srcs <- Gen.listOfN(n, Gen.oneOf("web", "code", "wiki"))
  } yield texts.zip(srcs).zipWithIndex.map { case ((t, s), i) => Doc(i.toLong, s, t) }

  private def corpusDf(docs: List[Doc]) = {
    import spark.implicits._
    docs.map(d => (d.id, d.source, d.text, d.nChars))
      .toDF("doc_id", "source", "text", "n_chars")
  }

  // --- reference chunker / packer --------------------------------------

  /** Spark's split(text, "\\s+") keeps trailing empty fields (limit -1),
    * unlike bare String.split — the replay must match THAT contract. */
  private def refTokens(text: String): Array[String] = text.split("\\s+", -1)

  private case class RefChunk(docId: Long, idx: Long, toks: Seq[String]) {
    def nTokens: Long = toks.length.toLong
    def text: String = toks.mkString(" ")
  }
  private def refChunks(d: Doc, c: Int, s: Int): Seq[RefChunk] = {
    val ts = refTokens(d.text)
    val n = ts.length
    val nChunks = if (n > c) 1 + ((n - c + s - 1) / s) else 1
    (0 until nChunks).map(k =>
      RefChunk(d.id, k.toLong, ts.slice(k * s, math.min(k * s + c, n)).toSeq))
  }

  private val genChunkParams: Gen[(Int, Int)] = for {
    c <- Gen.choose(1, 12)
    s <- Gen.choose(1, c) // stride <= chunk width: the coverage contract
  } yield (c, s)

  property("docChunks equals the driver chunker on hostile text") =
    Prop.forAll(genCorpus, genChunkParams) { case (docs, (c, s)) =>
      val got = Prep.docChunks(corpusDf(docs), chunkTokens = c, stride = s)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
      val want = docs.flatMap(d => refChunks(d, c, s))
        .map(ch => (ch.docId, ch.idx, ch.nTokens, ch.text))
        .sortBy(t => (t._1, t._2))
      if (got != want) {
        val diff = got.zipAll(want, null, null).find { case (a, b) => a != b }
        Prop.falsified :| s"first divergence: got=${diff.get._1} want=${diff.get._2}"
      } else Prop.passed
    }

  private case class RefPacked(grp: Long, seqId: Long, docId: Long,
      idx: Long, nTokens: Long, off: Long)
  private def refPack(docs: List[Doc], b: Int, groups: Int, c: Int, s: Int,
      seed: Long): Seq[RefPacked] =
    docs.flatMap(d => refChunks(d, c, s))
      .groupBy(ch => refBucket(ch.docId, seed, groups.toLong))
      .toSeq.flatMap { case (grp, chs) =>
        val ordered = chs.sortBy(ch =>
          (refHash(ch.docId, seed), ch.docId, ch.idx))
        var (seq, fill) = (0L, 0L)
        ordered.map { ch =>
          if (fill + ch.nTokens > b) { seq += 1; fill = 0L }
          val off = fill
          fill += ch.nTokens
          RefPacked(grp, seq, ch.docId, ch.idx, ch.nTokens, off)
        }
      }
      .sortBy(p => (p.grp, p.seqId, p.off))

  property("packSequences equals the driver next-fit replay") =
    Prop.forAll(genCorpus, genChunkParams, Gen.choose(0, 12),
        Gen.choose(1, 5)) { (docs, cs, extra, groups) =>
      val (c, s) = cs
      val b = c + extra // budget >= chunk width (the enforced require)
      val got = Prep.packSequences(corpusDf(docs), seqTokens = b,
          groups = groups, chunkTokens = c, stride = s)
        .collect()
        .map(r => RefPacked(r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .toSeq
      val want = refPack(docs, b, groups, c, s, seed = 17L)
      if (got != want) {
        val diff = got.zipAll(want, null, null).find { case (a, x) => a != x }
        Prop.falsified :| s"first divergence: got=${diff.get._1} want=${diff.get._2}"
      } else Prop.passed
    }

  // --- reference samplers ----------------------------------------------

  property("sampleMix keep-set equals the hashPct replay") =
    Prop.forAll(genCorpus, Gen.choose(0, 100), Gen.choose(0, 100),
        Gen.choose(1L, 1000L)) { (docs, rWeb, rDef, seed) =>
      val rates = Map("web" -> rWeb)
      val got = Prep.sampleMix(corpusDf(docs), rates, rDef, seed)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val want = docs.filter { d =>
        val rate = rates.getOrElse(d.source, rDef)
        refBucket(d.id, seed, 100L) < rate
      }.map(_.id).sorted
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("splitAssign counts equal the replayed fold") =
    Prop.forAll(genCorpus, Gen.choose(1, 98), Gen.choose(1L, 1000L)) {
      (docs, trainPct, seed) =>
        val valPct = math.min(5, 99 - trainPct)
        val got = Prep.splitAssign(corpusDf(docs), trainPct, valPct, seed)
          .collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
        val want = docs.groupBy(_.source).map { case (src, ds) =>
          val pcts = ds.map(d => refBucket(d.id, seed, 100L))
          src -> ((pcts.count(_ < trainPct).toLong,
            pcts.count(p => p >= trainPct && p < trainPct + valPct).toLong,
            pcts.count(_ >= trainPct + valPct).toLong))
        }
        Prop(got == want) :| s"got=$got want=$want"
    }

  property("negativeSamples equals the skip-self draw replay") =
    Prop.forAll(genCorpus, Gen.choose(1, 4), Gen.choose(1L, 500L)) {
      (docs, k, seed) =>
        val n = docs.length.toLong
        val bySrc = docs.map(d => d.id -> d.source).toMap
        val got = Prep.negativeSamples(corpusDf(docs), k, seed)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
          .toSeq
        val want = docs.flatMap { d =>
          (1 to k).map { rank =>
            val r = java.lang.Math.floorMod(
              (d.id * 31 + rank + seed) * Prep.KnuthC, M32) * (n - 1) / M32
            val neg = if (r >= d.id) r + 1 else r
            (d.id, rank.toLong, neg, bySrc(neg) == d.source)
          }
        }.sortBy(t => (t._1, t._2))
        Prop(got == want) :| s"n=$n diff=${got.diff(want).take(3)}"
    }

  property("shuffleDeterministic is the (hash, id)-sort permutation") =
    Prop.forAll(genCorpus, Gen.choose(1L, 1000L), Gen.choose(1L, 16L)) {
      (docs, seed, shardSize) =>
        val got = Prep.shuffleDeterministic(corpusDf(docs), seed, shardSize)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        val want = docs.map(_.id)
          .sortBy(id => (refHash(id, seed), id))
          .zipWithIndex
          .map { case (id, pos) => (id, pos.toLong, pos.toLong / shardSize) }
          .sortBy(_._1)
        Prop(got == want) :| s"got=$got want=$want"
    }

  property("samplePriority equals the A-ES priority replay") =
    Prop.forAll(genCorpus, Gen.choose(1, 30), Gen.choose(1L, 1000L)) {
      (docs, k, seed) =>
        val got = Prep.samplePriority(corpusDf(docs), k, seed)
          .collect()
          .map(r => (r.getLong(0), r.getDouble(3)))
          .toSeq
        val want = docs.map { d =>
          val pr =
            if (d.nChars > 0) {
              val u = (refBucket(d.id, seed, 1000000L) + 0.5) / 1000000.0
              BigDecimal(math.pow(u, 1.0 / d.nChars))
                .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
            } else 0.0
          (d.id, pr)
        }.sortBy { case (id, pr) => (-pr, id) }.take(k)
        Prop(got == want) :| s"got=${got.take(5)} want=${want.take(5)}"
    }
}
