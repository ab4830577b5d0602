package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // extra args = query-name subset (iteration aid; the driver passes 2)
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args.drop(2).toSet) else None
    // correctness-dump posture: tier-switch queries whose sketch side is
    // separately spec-pinned (kpis_rewritten + PlanShapeSpec) run their
    // exact body here so the oracle hash-checks the query code itself;
    // Bench never sets this and always measures the sketch plan
    System.setProperty("graft.verify.exactTiers", "true")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      // same AQE-gated SMJ->SHJ conversion as Bench (r17): the oracle
      // sweep must hash-check results under the exact conf the bench
      // times, proving join-strategy flips can never change a result
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // 4 queries in flight: Spark's scheduler interleaves their jobs, so
    // one long shuffle doesn't serialize the whole dump. Failures stay
    // isolated per query.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // determinism digests for the no-oracle queries: computed from the
    // parquet just written (exactly what the driver checks), compared
    // against the committed goldens; mismatches print as `digest
    // MISMATCH` (crosscheck fails the sweep on them) rather than
    // failing the query row — the digest pins OUR tree against OUR
    // history and must not convert an environment delta into a driver
    // correctness failure (see graft.Digests).
    val dataset = Paths.get(sfDir).getFileName.toString
    val digests = scala.collection.concurrent.TrieMap.empty[String, String]
    val futures = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      Future {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          if (Digests.queries(name)) {
            val dg = Digests.resultDigest(
              Digests.canonical(name, spark.read.parquet(s"$outDir/$name")))
            digests.put(name, dg)
            Digests.golden.get((name, dataset)).foreach { want =>
              if (want != dg)
                System.err.println(s"[verify] digest MISMATCH $name: got $dg want $want")
            }
          }
          System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    futures.foreach(Await.result(_, Duration.Inf))
    pool.shutdown() // non-daemon workers would keep the forked JVM alive
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // artifacts substitution: oracle SQL that reads persisted model
    // state (IVF centroids) carries a placeholder — concretize it to
    // this dataset's stable artifacts path so the dumped SQL is
    // runnable by the driver's DuckDB after this JVM exits
    val art = Tables.oracleArtifactsDir(sfDir)
    // bounded-error oracles additionally read this run's own dump (the
    // estimate parquet) — concretize the out-dir token the same way
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(SparkEntry.ArtifactsToken, art)
          .replace(SparkEntry.OutDirToken, outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // computed no-oracle digests (regeneration source for Digests.golden)
    Files.writeString(Paths.get(s"$outDir/digests.json"),
      digests.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(s"$k|$dataset")}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
