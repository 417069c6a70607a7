package graft

import graft.codec.{AvroExpressions, AvroSchemaConverter}
import graft.ext.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen

/** Property tests over the algorithmic core (SURVEY.md §5 plan):
  * merge idempotence, dedup-equals-group-max, codec round-trip.
  * Uses raw ScalaCheck generators (no scalatest bridge in the offline
  * cache) with a fixed-seed manual sampling loop.
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = org.scalacheck.Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, org.scalacheck.rng.Seed(42L + i)))
  }

  private val rowGen = Gen.listOfN(40, for {
    key <- Gen.choose(1, 8)
    seq <- Gen.choose(1L, 1000L)
    v <- Gen.alphaNumStr.map(_.take(8))
  } yield (key, seq, v))

  test("latestPerKey == self-join on per-key max ordering") {
    samples(rowGen, 10).filter(_.nonEmpty).foreach { rows =>
      {
        val df = rows.toDF("key", "seq", "v")
        val got = Dedup.latestPerKey(df, Seq("key"), Seq(col("seq").desc, col("v").desc))
          .select("key", "seq").as[(Int, Long)].collect().toMap
        val expected = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
        assert(got === expected)
      }
    }
  }

  test("upsert last-writer-wins: applying the same batch twice == once") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-prop-").toString
    samples(Gen.listOfN(12, for {
      key <- Gen.choose(1, 5)
      op <- Gen.oneOf("c", "u", "d")
      v <- Gen.choose(0, 100)
    } yield (key, v, op)), 5).filter(_.nonEmpty).foreach { updates =>
      {
        // one row per key (the pipeline dedups before upsert)
        val latest = updates.groupBy(_._1).map(_._2.last).toSeq
        val t = graft.tables.GraftTable(spark,
          s"file://$tmp/t-${java.util.UUID.randomUUID()}")
        t.append(Seq((1, -1, "seed"), (99, -1, "seed")).toDF("key", "v", "tag")
          .withColumn("tag", lit("seed")).drop("tag").withColumn("extra", lit("x")))
        val up = latest.toDF("key", "v", "op").withColumn("extra", lit("y"))
        t.upsert(up, Seq("key"), "op")
        val once = t.read().orderBy("key").collect().map(_.toSeq).toSeq
        t.upsert(up, Seq("key"), "op")
        val twice = t.read().orderBy("key").collect().map(_.toSeq).toSeq
        assert(once === twice)
      }
    }
  }

  test("avro round trip preserves arbitrary flat rows") {
    samples(Gen.listOfN(10, for {
      i <- Gen.choose(Int.MinValue, Int.MaxValue)
      l <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      s <- Gen.asciiPrintableStr.map(_.take(20))
      d <- Gen.choose(-1e9, 1e9)
      b <- Gen.oneOf(true, false)
    } yield (i, l, s, d, b)), 5).filter(_.nonEmpty).foreach { rows =>
      {
        val df = rows.toDF("i", "l", "s", "d", "b")
        val packed = df.select(struct(df.columns.map(col): _*).as("v"))
        val schema = AvroSchemaConverter.toAvroSchema(
          packed.schema("v").dataType.asInstanceOf[StructType], "P")
        val back = packed
          .select(AvroExpressions.to_avro(col("v"), schema.toString).as("bin"))
          .select(AvroExpressions.from_avro(col("bin"), schema.toString).as("v"))
          .select("v.*").as[(Int, Long, String, Double, Boolean)]
          .collect().toSet
        assert(back === rows.toSet)
      }
    }
  }

  test("data skipping is sound: readWhere == read().filter for random data+predicates") {
    val dataGen = Gen.listOfN(30, for {
      id <- Gen.choose(-50, 50)
      s <- Gen.oneOf("aa", "bb", "cc", "dd")
      nullable <- Gen.option(Gen.choose(0, 9))
    } yield (id, s, nullable))
    val dfs = samples(dataGen, 6).filter(_.nonEmpty)
    dfs.zipWithIndex.foreach { case (rows, i) =>
      val t = graft.tables.GraftTable(spark,
        java.nio.file.Files.createTempDirectory(s"graft-skip-$i-").toString + "/t")(
        graft.conf.GraftSettings.default)
      // several small appends -> several files with distinct stat ranges
      rows.grouped(8).foreach(chunk => t.append(chunk.toDF("id", "s", "opt").coalesce(1)))

      val predicates = Seq(
        col("id") > 0, col("id") <= -10, col("id") === 7,
        lit(25) < col("id"), // literal-first form
        col("s") >= "bb", col("s") === "cc",
        col("opt").isNull, col("opt").isNotNull,
        col("id") > -5 && col("s") < "cc",
        col("id") > 0 && col("opt").isNotNull && col("s") =!= "aa")
      predicates.foreach { p =>
        val expected = t.read().filter(p).collect().map(_.toSeq).toSet
        val got = t.readWhere(p).collect().map(_.toSeq).toSet
        assert(got === expected, s"predicate $p on rows=$rows")
      }
    }
  }

  test("CDC replay: random batched op sequences converge to the sequential model") {
    // events (key, value, op) arrive in batches; within a batch only the
    // LATEST event per key applies (Dedup.latestPerKey), across batches
    // upserts merge — the final table must equal a sequential replay of
    // the full event stream into a Map
    val eventGen = Gen.listOfN(60, for {
      key <- Gen.choose(1, 10)
      v <- Gen.choose(0, 999)
      op <- Gen.frequency(5 -> Gen.const("c"), 3 -> Gen.const("u"), 2 -> Gen.const("d"))
    } yield (key, v, op))
    samples(eventGen, 6).filter(_.nonEmpty).zipWithIndex.foreach { case (events, i) =>
      val seqd = events.zipWithIndex.map { case ((k, v, op), seq) => (k, v, op, seq.toLong) }
      val t = graft.tables.GraftTable(spark,
        java.nio.file.Files.createTempDirectory(s"graft-cdc-prop-$i-").toString + "/t")(
        graft.conf.GraftSettings.default)
      seqd.grouped(13).foreach { batch =>
        val deduped = Dedup.latestPerKey(
          batch.toDF("key", "v", "op", "seq"), Seq("key"), Seq(col("seq").desc))
        t.upsert(deduped.drop("seq"), Seq("key"), "op")
      }
      // sequential model: last op per key wins; 'd' removes
      val model = seqd.foldLeft(Map.empty[Int, Int]) {
        case (m, (k, v, op, _)) => if (op == "d") m - k else m + (k -> v)
      }
      val got = t.read().select("key", "v").as[(Int, Int)].collect().toMap
      assert(got === model, s"events=$seqd")
    }
  }

  test("minhash estimate within tolerance of exact jaccard") {
    val base = "spark engine shuffles partitions across the cluster for wide operations " * 3
    val variants = (0 until 6).map(i => (i.toLong, base + (" extra" * i)))
    val df = variants.toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"), Dedup.minhashSignature(col("text"), 128).as("sig"),
      Dedup.wordShingles(col("text")).as("sh"))
    val pairs = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        Dedup.estimatedJaccard(col("a.sig"), col("b.sig")).as("est"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("exact"))
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.15,
        s"est=${r.getDouble(0)} exact=${r.getDouble(1)}")
    }
  }
}
