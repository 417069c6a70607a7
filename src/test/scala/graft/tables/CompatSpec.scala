package graft.tables

import java.io.File
import java.nio.file.{Files, Paths}

import org.json4s.Extraction
import org.json4s.jackson.JsonMethods

import graft.SparkSpecBase

/** Cross-round back-compat gate: every corpus frozen under
  * `src/test/resources/compat/<round>/` must read IDENTICALLY with the
  * current binary — same versions, rows, content digests, features, time
  * travel, CDF, and the same refusals ([[CompatCorpus.Refused]]). The
  * corpus is copied to a temp dir before reading: the frozen bytes stay
  * pristine AND the read is proven location-independent (the log format
  * stores relative names only). A new round appends its corpus with
  * `Test/runMain graft.tables.CompatCorpusGen src/test/resources/compat/<round>`
  * and this suite picks it up with zero code changes. */
class CompatSpec extends SparkSpecBase {
  import CompatCorpus.fmts

  private val corpusRoot = new File("src/test/resources/compat")

  private def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    val walk = Files.walk(src)
    try walk.forEach { p =>
      val target = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else Files.copy(p, target)
    } finally walk.close()
  }

  test("the compat corpus root exists and holds at least the r18 corpus") {
    assert(corpusRoot.isDirectory,
      s"missing ${corpusRoot.getPath} — run CompatCorpusGen")
    assert(new File(corpusRoot, "r18/expectations.json").isFile,
      "the r18 golden corpus must be frozen (and never regenerated)")
  }

  private val rounds: Seq[File] =
    Option(corpusRoot.listFiles()).map(_.toSeq.filter(_.isDirectory))
      .getOrElse(Seq.empty).sortBy(_.getName)

  rounds.foreach { round =>
    test(s"corpus ${round.getName}: the current binary reads the frozen lake identically") {
      val frozen = CompatCorpus.readExpectations(
        Paths.get(round.getPath, "expectations.json"))
      val tmp = Files.createTempDirectory(s"graft-compat-${round.getName}-")
      copyDir(Paths.get(round.getPath, "lake"), tmp.resolve("lake"))
      val now = CompatCorpus.observe(spark, tmp.resolve("lake").toString)
      assert(now.keySet === frozen.keySet)
      frozen.foreach { case (name, exp) =>
        // JSON-AST compare: one readable diff per table, field order
        // irrelevant, and the frozen file stays the single source of truth
        assert(Extraction.decompose(now(name)) === Extraction.decompose(exp),
          s"table '$name' of corpus ${round.getName} reads differently " +
            s"than when frozen:\n  now:    ${now(name)}\n  frozen: $exp")
      }
    }
  }
}
