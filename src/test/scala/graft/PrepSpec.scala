package graft

import org.apache.spark.sql.functions._

/** Training-data prep operators: hash quality, determinism, and the
  * chunking coverage invariants. */
class PrepSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("hashPct is uniform-ish over dense sequential ids (no striping)") {
    val pcts = spark.range(10000)
      .select(Prep.hashPct(col("id"), 7L).as("pct"))
      .groupBy("pct").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pcts.keySet == (0L until 100L).toSet)
    // each bucket expects 100; a multiplicative hash over a dense range
    // stays well within +-50%
    assert(pcts.values.forall(c => c > 50 && c < 150), s"skewed: $pcts")
  }

  test("sampleMix honors per-source rates and is deterministic") {
    val rates = Map("src0" -> 100, "src1" -> 0)
    val out = Prep.sampleMix(docs, rates, defaultPct = 50)
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == total("src0"))       // 100% kept
    assert(!bySrc.contains("src1"))              // 0% kept
    assert(out.collect().toSeq == Prep.sampleMix(docs, rates, 50).collect().toSeq)
  }

  test("sampleTemperature: α<1 up-weights small sources, budget caps at 1.0, shares sum to 1") {
    import spark.implicits._
    val d = ((1 to 100).map(i => (i.toLong, "big")) :+ (101L, "tiny"))
      .toDF("doc_id", "source")
    val out = Prep.sampleTemperature(d, alpha = 0.7, budget = 50)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("share"),
          r.getAs[Double]("keep_rate"))).toMap
    val (nb, shareBig, rateBig) = out("big")
    val (nt, shareTiny, rateTiny) = out("tiny")
    assert(nb == 100L && nt == 1L)
    // proportional share would be 1/101 ≈ 0.0099 — temperature lifts it
    assert(shareTiny > 0.03 && shareTiny < 0.05)
    assert(math.abs(shareBig + shareTiny - 1.0) < 2e-6)
    // tiny source wants 50·share/1 ≈ 1.9 docs — capped to keep-everything
    assert(rateTiny == 1.0)
    assert(rateBig > 0.4 && rateBig < 0.5)
  }

  test("sampleMixTemperature: realized keeps track planned rates, capped source keeps all") {
    import spark.implicits._
    val d = ((1 to 400).map(i => (i.toLong, "big")) ++
      (401 to 404).map(i => (i.toLong, "tiny"))).toDF("doc_id", "source")
    val out = Prep.sampleMixTemperature(d, alpha = 0.7, budget = 120)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Double]("keep_rate"))).toMap
    val (nb, kb, rb) = out("big")
    val (nt, kt, rt) = out("tiny")
    // tiny source's budgeted ask (120·share/4) exceeds 1 → capped, all kept
    assert(rt == 1.0 && kt == nt)
    // uncapped source: realized fraction within hash noise of the plan
    assert(rb > 0.2 && rb < 0.4)
    assert(math.abs(kb.toDouble / nb - rb) < 0.08,
      s"realized ${kb.toDouble / nb} vs planned $rb")
    // determinism: the decision is a pure function of (doc_id, seed)
    assert(Prep.sampleMixTemperature(d, 0.7, 120).collect().toSeq ==
      Prep.sampleMixTemperature(d, 0.7, 120).collect().toSeq)
  }

  test("samplePerSource returns exactly min(k, group size) per source, stably") {
    val out = Prep.samplePerSource(docs, k = 5)
    val per = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per.keySet == totals.keySet)
    assert(per.forall { case (s, n) => n == math.min(5L, totals(s)) })
    assert(out.collect().toSeq == Prep.samplePerSource(docs, k = 5).collect().toSeq)
  }

  test("splitAssign partitions every document exactly once") {
    val out = Prep.splitAssign(docs)
    val sums = out.agg(sum("n_train"), sum("n_val"), sum("n_test")).head()
    assert(sums.getLong(0) + sums.getLong(1) + sums.getLong(2) == docs.count())
  }

  test("docChunks covers every token, in order, with the right overlap") {
    val chunks = Prep.docChunks(docs, chunkTokens = 32, stride = 24).cache()
    // every doc appears; chunk 0 exists for all
    assert(chunks.filter(col("chunk_idx") === 0).count() == docs.count())
    // all chunks but the last are exactly 32 tokens; none exceed 32
    assert(chunks.filter(col("n_tokens") > 32).count() == 0)
    val maxIdx = chunks.groupBy("doc_id").agg(max("chunk_idx").as("mx"))
    assert(chunks.join(maxIdx, Seq("doc_id"))
      .filter(col("chunk_idx") < col("mx") && col("n_tokens") =!= 32)
      .count() == 0)
    // stitching chunks at stride 24 reproduces the original token stream:
    // tokens 0..23 of each non-final chunk + the last chunk whole
    val got = Prep.docChunks(docs, 32, 24)
      .join(maxIdx, Seq("doc_id"))
      .withColumn("part", when(col("chunk_idx") < col("mx"),
        concat_ws(" ", slice(split(col("chunk_text"), "\\s+"), 1, 24)))
        .otherwise(col("chunk_text")))
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("chunk_idx"), col("part")))), s => s("part")), " ").as("whole"))
    val want = docs.select(col("doc_id"),
      concat_ws(" ", split(col("text"), "\\s+")).as("whole"))
    assert(got.join(want, Seq("doc_id"))
      .filter(got("whole") =!= want("whole")).count() == 0)
    chunks.unpersist()
  }

  test("packSequences: every chunk packed exactly once, no sequence over budget") {
    val B = 64
    val pack = Prep.packSequences(docs, seqTokens = B).cache()
    val chunks = Prep.docChunks(docs)
    // bijective over chunks: same count, every (doc_id, chunk_idx) once
    assert(pack.count() == chunks.count())
    assert(pack.select("doc_id", "chunk_idx").distinct().count() == chunks.count())
    // manifest token counts agree with the chunker's
    assert(pack.join(chunks.withColumnRenamed("n_tokens", "want"),
      Seq("doc_id", "chunk_idx"))
      .filter(col("n_tokens") =!= col("want")).count() == 0)
    // budget: no (grp, seq_id) holds more than B tokens
    assert(pack.groupBy("grp", "seq_id").agg(sum("n_tokens").as("t"))
      .filter(col("t") > B).count() == 0)
    // offsets tile each sequence: chunk k starts where chunk k-1 ended
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp", "seq_id").orderBy("tok_offset")
    assert(pack.withColumn("prev_end",
        lag(col("tok_offset") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("tok_offset") =!= col("prev_end")).count() == 0)
    // next-fit is greedy: a new sequence opens only when the previous one
    // could not fit this chunk
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("seq_id", "tok_offset")
    assert(pack.withColumn("prev_fill",
        lag(col("tok_offset") + col("n_tokens"), 1, 0L).over(ws))
      .filter(col("tok_offset") === 0 && col("seq_id") > 0
        && col("prev_fill") + col("n_tokens") <= B)
      .count() == 0)
    pack.unpersist()
  }

  test("packSequences is layout-independent: same manifest after repartition") {
    val a = Prep.packSequences(docs).collect().toSeq
    val b = Prep.packSequences(docs.repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("shuffleDeterministic: exact permutation, layout-independent, seed-sensitive") {
    val n = docs.count()
    val out = Prep.shuffleDeterministic(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // positions are a bijection onto [0, n)
    assert(out.map(_._2).sorted.toSeq == (0L until n).toSeq)
    // shard = pos / 64, so every shard except possibly the last has 64 docs
    val perShard = out.groupBy(_._3).map { case (s, g) => s -> g.length }
    assert(perShard.collect { case (s, c) if s < (n - 1) / 64 => c }.forall(_ == 64))
    // pure function of (doc_id, seed): identical after a physical reshuffle
    val again = Prep.shuffleDeterministic(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
    // the next epoch (seed + 1) is a different permutation of the same ids
    val epoch2 = Prep.shuffleDeterministic(docs, seed = 8L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(epoch2.map(_._2).sorted.toSeq == (0L until n).toSeq)
    assert(epoch2.toSeq != out.toSeq)
  }

  test("samplePriority: formula exact, weight lifts inclusion odds, k respected, deterministic") {
    import spark.implicits._
    val docs = (0L until 400L).map { i =>
      (i, if (i % 2 == 0) "long" else "short", if (i % 2 == 0) 5000 else 50)
    }.toDF("doc_id", "source", "n_chars")
    val out = Prep.samplePriority(docs, k = 100).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getAs[Double]("priority")))
    assert(out.length == 100)
    // spot-check the A-ES priority of the top row against the formula
    val (id0, nc0, p0) = out.head
    val u0 = (math.floorMod((id0 + 13L) * 2654435761L, 4294967296L) * 1000000L /
      4294967296L + 0.5) / 1000000.0
    val expect = BigDecimal(math.pow(u0, 1.0 / nc0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p0 == expect)
    // long documents (100x the weight) must dominate the sample
    val nLong = out.count(_._2 == 5000)
    assert(nLong > 80, s"weighting too weak: $nLong/100 long docs")
    // deterministic across invocations
    val again = Prep.samplePriority(docs, k = 100).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getAs[Double]("priority")))
    assert(out.toSeq == again.toSeq)
  }

  test("negativeSamples: never self, exactly k per doc, deterministic, well-spread") {
    val docs = Tables.documents(spark, sf)
    val out = Prep.negativeSamples(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val n = docs.count()
    assert(out.length == n * 3)
    assert(out.forall { case (d, _, neg, _) => neg != d }) // skip-self holds
    assert(out.forall { case (_, _, neg, _) => neg >= 0 && neg < n }) // in range
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
    }
    // the draw actually spreads: many distinct negatives, not a stripe
    assert(out.map(_._3).distinct.length > n / 2)
    // deterministic across invocations
    val again = Prep.negativeSamples(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == again.toSeq)
  }

  test("negativeSamples: sparse doc_ids fail loudly instead of silently dropping draws") {
    import spark.implicits._
    // gapped ids (0,1,5,9): a drawn neg_id in {2,3,4,6,7,8} would vanish
    // in the annotating join — the enforced dense-range precondition
    // turns that silent row loss into an upfront error
    val sparse = Seq((0L, "web"), (1L, "web"), (5L, "books"), (9L, "code"))
      .toDF("doc_id", "source")
    val e = intercept[IllegalArgumentException] {
      Prep.negativeSamples(sparse)
    }
    assert(e.getMessage.contains("dense doc_ids"))
    // a dense frame with the same cardinality passes and yields exactly
    // k rows per doc (the property the precondition protects)
    val dense = Seq((0L, "web"), (1L, "web"), (2L, "books"), (3L, "code"))
      .toDF("doc_id", "source")
    val ok = Prep.negativeSamples(dense).collect()
    assert(ok.length == 4 * 3)
  }
}
