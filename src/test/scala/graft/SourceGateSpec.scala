package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Static source gates for bug classes that type-check but crash at
  * runtime — greps over `src/main/scala`, no Spark session.
  *
  * The round-10 regression: two call sites decoded a
  * `percentile(..., array(...))` driver row with
  * `.asInstanceOf[Seq[Double]]`, which compiles but throws
  * ClassCastException on every non-empty input (Spark materializes
  * array cells as `mutable.ArraySeq`; bare `Seq` is `immutable.Seq` in
  * Scala 2.13). The correct decode is `Row.getSeq`, centralized in
  * [[Tables.doubleSeqAt]] — this gate makes the cast unwritable.
  */
class SourceGateSpec extends AnyFunSuite {

  private def mainSources: Seq[Path] = {
    val root = Paths.get("src/main/scala")
    assert(Files.isDirectory(root), s"expected to run from repo root; missing $root")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq
  }

  test("no .asInstanceOf[Seq[...]] row decodes in src/main (use Tables.doubleSeqAt)") {
    val offenders = mainSources.flatMap { p =>
      Files.readAllLines(p).asScala.zipWithIndex.collect {
        // comment lines (the helper's own scaladoc names the banned cast) don't count
        case (line, i) if line.contains(".asInstanceOf[Seq[") &&
            !Seq("*", "//").exists(line.trim.startsWith) =>
          s"$p:${i + 1}: ${line.trim}"
      }
    }
    assert(offenders.isEmpty,
      "Row array cells must be decoded with Row.getSeq (Tables.doubleSeqAt), " +
        s"never .asInstanceOf[Seq[...]]:\n${offenders.mkString("\n")}")
  }

  test("percentile-array folds go through the shared decode helper") {
    // every file that builds a percentile(..., array(...)) driver fold
    // must reference doubleSeqAt or getSeq — not ad-hoc casts
    val foldFiles = mainSources.filter { p =>
      Files.readString(p).contains("percentile(")
    }
    assert(foldFiles.nonEmpty, "expected at least one percentile fold in src/main")
    foldFiles.foreach { p =>
      val text = Files.readString(p)
      val decodes = text.contains("doubleSeqAt") || text.contains("getSeq")
      val folds = text.contains(".first()")
      assert(!folds || decodes,
        s"$p folds a percentile row on the driver without Row.getSeq/doubleSeqAt")
    }
  }
}
