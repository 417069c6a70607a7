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

  test("WsClass is exactly Java regex \\s over all of ASCII (Spark-side behavior pinned)") {
    // the explicit class exists because RE2's \s excludes \x0B while
    // Java's includes it — the Spark side must keep Java-\s semantics
    // exactly, and the oracle SQL now carries the same literal class
    val ws = graft.ext.TextAnalysis.WsClass
    (0 to 0x7f).foreach { c =>
      val s = c.toChar.toString
      assert(s.matches(ws) === s.matches("\\s"),
        f"char 0x$c%02X diverges between WsClass and Java \\s")
    }
  }

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

  test("blockDedup == naive first-occurrence reference on random corpora") {
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docGen = Gen.listOfN(6, for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    samples(docGen, 8).foreach { texts =>
      val bw = 3
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.blockDedup(df, "doc_id", "text", blockWords = bw, portable = true)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      // naive reference: first (doc, pos) per distinct block text wins
      val blocks = texts.zipWithIndex.flatMap { case (t, i) =>
        val ws = t.trim.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim match {
          case "" => Array.empty[String]
          case s  => s.split(" ")
        }
        ws.grouped(bw).zipWithIndex.map { case (b, p) => (i.toLong, p, b.mkString(" ")) }
      }
      val winner = blocks.groupBy(_._3).map { case (blk, occ) =>
        blk -> occ.map(o => (o._1, o._2)).min }
      texts.zipWithIndex.foreach { case (t, i) =>
        val mine = blocks.filter(_._1 == i.toLong)
        val kept = mine.filter(b => winner(b._3) == ((b._1, b._2)))
        val keptTokens = kept.map(_._3.split(" ").length).sum.toLong
        val (nTok, nBlk, keptBlk, keptTok) = got(i.toLong)
        assert(nBlk === mine.size.toLong, s"doc $i n_blocks")
        assert(keptBlk === kept.size.toLong, s"doc $i kept_blocks")
        assert(keptTok === keptTokens, s"doc $i kept_tokens")
        assert(nTok === mine.map(_._3.split(" ").length).sum.toLong, s"doc $i n_tokens")
      }
    }
  }

  test("removeDupSpans == naive winner-rule reference on random corpora") {
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docGen = Gen.listOfN(6, for {
      n <- Gen.choose(0, 14)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    samples(docGen, 8).foreach { texts =>
      val n = 3
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.ext.Dedup.removeDupSpans(df, "doc_id", "text", n = n, portable = true)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // naive reference: spans = n-grams; losers = every occurrence of an
      // n-gram after the global minimal (doc, pos); covered = union of
      // loser intervals; kept = tokens outside
      val toks: Map[Long, Array[String]] = texts.zipWithIndex.map { case (t, i) =>
        val norm = t.trim.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        i.toLong -> (if (norm.isEmpty) Array.empty[String] else norm.split(" "))
      }.toMap
      val occ = toks.toSeq.flatMap { case (id, ws) =>
        (0 to ws.length - n).map(p => (ws.slice(p, p + n).mkString(" "), id, p))
      }
      val winners = occ.groupBy(_._1).map { case (g, os) =>
        g -> os.map(o => (o._2, o._3)).min
      }
      val losers = occ.filter { case (g, id, p) => winners(g) != ((id, p)) && occ.count(_._1 == g) >= 2 }
      val coveredByDoc = losers.groupBy(_._2).map { case (id, ls) =>
        id -> ls.flatMap { case (_, _, p) => p until (p + n) }.toSet
      }
      toks.foreach { case (id, ws) =>
        val covered = coveredByDoc.getOrElse(id, Set.empty)
        val expectKept = ws.indices.count(!covered.contains(_)).toLong
        val (gotTokens, gotKept) = got(id)
        assert(gotTokens === ws.length.toLong, s"doc $id n_tokens")
        assert(gotKept === expectKept, s"doc $id kept (texts=$texts)")
      }
    }
  }

  test("warc round-trip: arbitrary headers and binary payloads survive both framings") {
    val recGen = Gen.listOfN(5, for {
      uri <- Gen.alphaNumStr.map(s => s"http://x/${s.take(12)}")
      wtype <- Gen.oneOf("response", "request", "resource", "warcinfo")
      nBytes <- Gen.choose(0, 200)
      payload <- Gen.listOfN(nBytes, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield graft.ext.Warc.WarcRecord(wtype, s"<urn:$uri>", uri, "text/plain",
      "2026-01-01T00:00:00Z", payload.toArray))
    samples(recGen, 10).foreach { recs =>
      for (gz <- Seq(true, false)) {
        val back = graft.ext.Warc.records(
          graft.ext.Warc.write(recs.iterator, gzipPerRecord = gz))
        assert(back.length === recs.length)
        back.zip(recs).foreach { case (b, o) =>
          assert(b.warcType === o.warcType && b.targetUri === o.targetUri &&
            b.payload.toSeq === o.payload.toSeq)
        }
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

  test("string data skipping is sound beyond the BMP: prune == scan on supplementary-plane keys") {
    // UTF-16 code units order the surrogate range (U+D800..) BEFORE
    // [U+E000, U+FFFF]; UTF-8 binary (the order Spark collected the
    // min/max stats in) orders supplementary code points AFTER them. The
    // generator straddles exactly that boundary so any comparator mixing
    // the two orders prunes a file that holds a matching row.
    val alphabet = Vector("a", "z", "é", "中", "", "",
      "�", new String(Character.toChars(0x1F600)),
      new String(Character.toChars(0x10000)), new String(Character.toChars(0x10FFFF)))
    val strGen = for {
      n <- Gen.choose(1, 4)
      cs <- Gen.listOfN(n, Gen.oneOf(alphabet))
    } yield cs.mkString
    val dataGen = Gen.listOfN(24, strGen)
    samples(dataGen, 8).zipWithIndex.foreach { case (rows, i) =>
      val t = graft.tables.GraftTable(spark,
        java.nio.file.Files.createTempDirectory(s"graft-skip-utf8-$i-").toString + "/t")(
        graft.conf.GraftSettings.default)
      // several single-file appends -> several files with distinct stat ranges
      rows.grouped(5).foreach(chunk =>
        t.append(chunk.map(Tuple1(_)).toDF("s").coalesce(1)))
      val lits = samples(strGen, 6)
      val predicates =
        lits.flatMap(l => Seq(col("s") > l, col("s") >= l, col("s") < l,
          col("s") <= l, col("s") === l, col("s").startsWith(l))) :+
          col("s").isin(lits: _*)
      predicates.foreach { p =>
        val expected = t.read().filter(p).collect().map(_.getString(0)).sorted
        val got = t.readWhere(p).collect().map(_.getString(0)).sorted
        assert(got === expected, s"predicate $p on rows=${rows.map(_.codePoints.toArray.toSeq)}")
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

  // ------------------------------------------------- proto wire conformance fuzz
  //
  // The pure-Scala proto3 codec is load-bearing for the protobuf CDC path
  // (A11/A13) — fuzz it: random schemas round-trip bit-exactly; unknown
  // higher-numbered fields of EVERY wire type skip cleanly (forward
  // compat); fields added to the reader schema decode to proto3 defaults
  // (backward compat); and the full Spark expression path round-trips via
  // generated .proto text.

  private case class FKind(dt: org.apache.spark.sql.types.DataType, gen: Gen[Any])

  private val scalarKinds: Seq[FKind] = {
    import org.apache.spark.sql.types._
    Seq(
      FKind(IntegerType, Gen.choose(Int.MinValue, Int.MaxValue)),
      FKind(LongType, Gen.choose(Long.MinValue + 1, Long.MaxValue)),
      FKind(StringType, Gen.asciiPrintableStr.map(_.take(12))),
      FKind(BooleanType, Gen.oneOf(true, false)),
      FKind(DoubleType, Gen.choose(-1e12, 1e12)),
      FKind(FloatType, Gen.choose(-1e6, 1e6).map(_.toFloat)),
      FKind(BinaryType,
        Gen.listOfN(5, Gen.choose(-128, 127)).map(_.map(_.toByte).toArray: Any)))
  }

  private val compositeKinds: Seq[FKind] = {
    import org.apache.spark.sql.types._
    Seq(
      FKind(ArrayType(IntegerType, containsNull = false),
        Gen.listOfN(4, Gen.choose(-1000, 1000)).map(_.toSeq: Any)),
      FKind(ArrayType(StringType, containsNull = false),
        Gen.listOfN(3, Gen.alphaNumStr.map(_.take(6))).map(_.toSeq: Any)),
      FKind(
        StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))),
        for { a <- Gen.choose(-99, 99); b <- Gen.alphaNumStr.map(_.take(6)) }
          yield org.apache.spark.sql.Row(a, b): Any))
  }

  private def rowGenFor(kinds: Seq[FKind]): Gen[org.apache.spark.sql.Row] =
    kinds.foldLeft(Gen.const(Vector.empty[Any])) { (acc, k) =>
      acc.flatMap(v => k.gen.map(v :+ _))
    }.map(v => org.apache.spark.sql.Row.fromSeq(v))

  private def schemaOf(kinds: Seq[FKind]): StructType =
    StructType(kinds.zipWithIndex.map { case (k, i) =>
      org.apache.spark.sql.types.StructField(s"f$i", k.dt)
    })

  private val fuzzCase: Gen[(Seq[FKind], org.apache.spark.sql.Row)] = for {
    n <- Gen.choose(1, 4)
    scalars <- Gen.listOfN(n, Gen.oneOf(scalarKinds))
    extras <- Gen.someOf(compositeKinds)
    kinds = scalars ++ extras
    row <- rowGenFor(kinds)
  } yield (kinds, row)

  /** Structural value compare across Array[Byte]/Seq/Row representations. */
  private def norm(v: Any): Any = v match {
    case b: Array[Byte] => b.toSeq
    case r: org.apache.spark.sql.Row => r.toSeq.map(norm)
    case s: Seq[_] => s.map(norm)
    case x => x
  }

  private def wireRoundTrip(schema: StructType,
      row: org.apache.spark.sql.Row,
      readerMsg: graft.codec.ProtoWire.ProtoMessage,
      readerSchema: StructType): org.apache.spark.sql.Row = {
    import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
    val internal = CatalystTypeConverters.createToCatalystConverter(schema)(row)
      .asInstanceOf[InternalRow]
    val bytes = graft.codec.ProtoWire.encodeMessage(internal, schema)
    val decoded = graft.codec.ProtoWire.decodeMessage(readerMsg, bytes, 0, bytes.length)
    CatalystTypeConverters.createToScalaConverter(readerSchema)(decoded)
      .asInstanceOf[org.apache.spark.sql.Row]
  }

  test("proto fuzz: random schemas round-trip bit-exactly through the wire codec") {
    samples(fuzzCase, 60).foreach { case (kinds, row) =>
      val schema = schemaOf(kinds)
      val msg = graft.codec.ProtoWire.fromStructType(schema, "Fuzz")
      val back = wireRoundTrip(schema, row, msg, schema)
      assert(norm(back) === norm(row), s"schema=${schema.simpleString}")
    }
  }

  test("proto fuzz: unknown higher-numbered fields of every wire type are skipped") {
    import org.apache.spark.sql.types._
    // appended extras cover all four proto3 wire types: varint (int64),
    // I64 (double), I32 (float), LEN (string, bytes, nested message)
    val extraKinds = Seq(
      FKind(LongType, Gen.const(42L)),
      FKind(DoubleType, Gen.const(3.14)),
      FKind(FloatType, Gen.const(1.5f)),
      FKind(StringType, Gen.const("future-field")),
      FKind(BinaryType, Gen.const(Array[Byte](1, 2, 3): Any)),
      FKind(StructType(Seq(StructField("x", LongType))),
        Gen.const(org.apache.spark.sql.Row(7L): Any)))
    samples(fuzzCase, 30).foreach { case (kinds, row) =>
      val narrowSchema = schemaOf(kinds)
      val extKinds = kinds ++ extraKinds
      val extSchema = schemaOf(extKinds)
      val extRow = org.apache.spark.sql.Row.fromSeq(
        row.toSeq ++ Seq(42L, 3.14, 1.5f, "future-field", Array[Byte](1, 2, 3),
          org.apache.spark.sql.Row(7L)))
      // decode the WIDER payload against the NARROW message: a v1 reader
      // consuming v2 records must see exactly its own fields
      val narrowMsg = graft.codec.ProtoWire.fromStructType(narrowSchema, "FuzzV1")
      val back = wireRoundTrip(extSchema, extRow, narrowMsg, narrowSchema)
      assert(norm(back) === norm(row), s"schema=${narrowSchema.simpleString}")
    }
  }

  test("proto fuzz: fields added to the reader schema decode to proto3 defaults") {
    import org.apache.spark.sql.types._
    samples(fuzzCase, 30).foreach { case (kinds, row) =>
      val writerSchema = schemaOf(kinds)
      // a v2 reader consuming v1 records: added fields take proto3
      // defaults (0 / "" / false / empty), absent sub-messages are null
      val addedKinds = Seq(
        FKind(IntegerType, Gen.const(0)), FKind(StringType, Gen.const("")),
        FKind(BooleanType, Gen.const(false)), FKind(DoubleType, Gen.const(0.0)),
        FKind(ArrayType(LongType, containsNull = false), Gen.const(Seq.empty[Long]: Any)),
        FKind(StructType(Seq(StructField("x", LongType))), Gen.const(null: Any)))
      val widerKinds = kinds ++ addedKinds
      val widerSchema = StructType(widerKinds.zipWithIndex.map { case (k, i) =>
        StructField(s"f$i", k.dt)
      })
      val widerMsg = graft.codec.ProtoWire.fromStructType(widerSchema, "FuzzV2")
      val back = wireRoundTrip(writerSchema, row, widerMsg, widerSchema)
      val expected = row.toSeq ++ Seq(0, "", false, 0.0, Seq.empty[Long], null)
      assert(norm(back) === norm(org.apache.spark.sql.Row.fromSeq(expected)),
        s"schema=${writerSchema.simpleString}")
    }
  }

  test("proto fuzz: Spark expression path round-trips via generated .proto text") {
    import scala.jdk.CollectionConverters._
    samples(fuzzCase, 8).foreach { case (kinds, row) =>
      val schema = schemaOf(kinds)
      val protoText = graft.codec.ProtoSchemaGen.protoFile(schema, "FuzzMsg")
      val df = spark.createDataFrame(Seq(row).asJava, schema)
      val back = df.select(
        graft.codec.ProtobufExpressions.from_protobuf(
          graft.codec.ProtobufExpressions.to_protobuf(
            struct(df.columns.map(col).toSeq: _*)),
          protoText).as("s"))
        .select("s.*").collect().head
      assert(norm(back) === norm(row), s"schema=${schema.simpleString}")
    }
  }

  test("chunkTokens reassembles to the original token stream") {
    import graft.ext.TextAnalysis
    val wordGen = Gen.listOfN(1, Gen.alphaLowerStr.map(s => if (s.isEmpty) "w" else s.take(5))).map(_.head)
    val textGen = for {
      n <- Gen.choose(1, 200)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    samples(Gen.listOfN(6, textGen), 8).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val chunks = TextAnalysis.chunkTokens(df, "doc_id", "text", chunkSize = 16, stride = 12)
        .orderBy("doc_id", "chunk_idx").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2)).toSeq).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.split(" ").toSeq
        val cs = chunks(i.toLong)
        // drop the stride-overlap from every chunk after the first; what
        // remains must be exactly the original token stream
        val rebuilt = cs.head.split(" ").toSeq ++
          cs.tail.zipWithIndex.flatMap { case (c, k) =>
            // chunk k+1 starts at (k+1)*stride; previous chunk ends at
            // k*stride + 16 => overlap = 16 - 12 = 4 tokens (or fewer at tail)
            c.split(" ").toSeq.drop(math.min(4, toks.length - (k + 1) * 12))
          }
        assert(rebuilt === toks, s"doc $i: chunks $cs do not cover '$t'")
      }
    }
  }

  test("redactPii is idempotent and never leaves a raw match behind") {
    import graft.ext.TextAnalysis
    val piiGen = Gen.oneOf(
      Gen.const("bob@example.com"), Gen.const("10.20.30.40"),
      Gen.const("555-123-4567"), Gen.alphaLowerStr.map(_.take(8)))
    val lineGen = Gen.listOfN(8, piiGen).map(_.mkString(" "))
    samples(Gen.listOfN(10, lineGen), 10).foreach { lines =>
      val df = lines.toDF("text")
      val once = df.select(TextAnalysis.redactPii(col("text")).as("r"))
      val twice = once.select(TextAnalysis.redactPii(col("r")).as("r"))
      val a = once.collect().map(_.getString(0)).toSeq
      val b = twice.collect().map(_.getString(0)).toSeq
      assert(a === b, "redaction must be idempotent")
      assert(a.forall(s => !s.contains("@example.com") && !s.contains("10.20.30.40")
        && !s.contains("555-123-4567")))
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

  test("ratio6 == BigDecimal HALF_UP at scale 6 for random non-negative ratios") {
    // the engine-portable integer rounding must BE round-half-up — incl.
    // exact midpoints (e.g. odd/128 ends ...5 at the 7th decimal), where a
    // double division rounds engine-specifically (the d19 hash-fail class)
    val gen = Gen.listOfN(60, for {
      num <- Gen.oneOf(Gen.choose(0L, 1000L), Gen.choose(0L, 64L).map(_ * 15625)) // 1e6/64ths hit midpoints
      den <- Gen.oneOf(Gen.choose(1L, 1000L), Gen.oneOf(2L, 16L, 32L, 64L, 128L))
    } yield (num, den))
    samples(gen, 4).flatten.foreach { case (num, den) =>
      val got = Seq((num, den)).toDF("n", "d")
        .select(graft.operators.QueryDsl.ratio6(col("n"), col("d")).as("r"))
        .head().getDouble(0)
      // output is DOUBLE (DECIMAL output columns are driver-unsafe); the
      // exact half-up decimal, correctly rounded to double, is the spec
      val want = new java.math.BigDecimal(num)
        .divide(new java.math.BigDecimal(den), 6, java.math.RoundingMode.HALF_UP)
        .doubleValue()
      assert(java.lang.Double.compare(got, want) === 0,
        s"$num/$den: got $got want $want")
    }
  }

  test("any-sign micro-mean formula == BigDecimal HALF_UP (k-means centroid rounding)") {
    val gen = Gen.listOfN(60, for {
      s <- Gen.choose(-2000000L, 2000000L)
      n <- Gen.choose(1L, 500L)
    } yield (s, n))
    samples(gen, 4).flatten.foreach { case (s, n) =>
      val got = Seq((s, n)).toDF("s", "n")
        .select(floor((col("s") * 2 + col("n")).cast("double") / (col("n") * 2).cast("double"))
          .cast("long").as("m"))
        .head().getLong(0)
      val want = new java.math.BigDecimal(s)
        .divide(new java.math.BigDecimal(n), 0, java.math.RoundingMode.HALF_UP).longValueExact()
      // floor((2S+n)/(2n)) is half-up for positives and half-DOWN for
      // negatives under RoundingMode semantics... assert against the
      // mathematical definition floor(S/n + 1/2) instead
      val floorHalf = java.lang.Math.floorDiv(2 * s + n, 2 * n)
      assert(got === floorHalf, s"$s/$n: got $got floorDiv ${floorHalf} (bd $want)")
    }
  }

  test("mixtureSample histogram selection == naive per-stratum rank selection") {
    // the scale path (bounded bucket histogram + boundary-only rank
    // window) must select EXACTLY the rows the obvious implementation
    // (full per-stratum rank over (hash, id)) selects — the cleverness
    // is an optimization, not a semantic
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.choose(20, 150)
      strata <- Gen.choose(2, 4)
      ws <- Gen.listOfN(strata, Gen.choose(1L, 1000000L))
    } yield (n, ws)
    samples(gen, 6).foreach { case (n, ws) =>
      val names = ws.indices.map(i => s"s$i")
      val weights = names.zip(ws).toMap
      val df = (0L until n.toLong).map(i => (i, names((i % names.size).toInt)))
        .toDF("doc_id", "strat")
      val got = graft.ext.TextAnalysis.mixtureSample(df, "doc_id", "strat", weights)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // naive: T and keep via the same integer spec, then rank everything
      val hashed = df.withColumn("__h", graft.ext.TextAnalysis.portableHash60(
        concat_ws(":", lit("mix"), col("doc_id").cast("string"))))
      val counts = hashed.groupBy("strat").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val t = counts.map { case (g, c) => c * 1000000L / weights(g) }.min
      val keep = weights.map { case (g, w) => g -> w * t / 1000000L }
      val naive = hashed
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("strat")).orderBy(col("__h"), col("doc_id"))))
        .collect()
        .filter(r => r.getInt(r.fieldIndex("__rn")) <= keep(r.getString(1)))
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === naive,
        s"n=$n weights=$weights: histogram=${got.size} naive=${naive.size}, " +
          s"diff=${(got diff naive) ++ (naive diff got)}")
    }
  }

  test("container demuxers are total: random and truncated bytes never throw") {
    // at 100 TB some payloads are ALWAYS garbage — a demuxer that throws
    // on any byte sequence kills a 10k-task stage. Random bytes, valid
    // magic + garbage tails, and every truncation prefix must all return
    // cleanly (empty or partial, never an exception).
    val gen = Gen.listOfN(30, for {
      n <- Gen.choose(0, 512)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (n, seed))
    samples(gen, 4).flatten.foreach { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val bytes = Array.fill[Byte](n)(rnd.nextInt().toByte)
      assert(graft.ext.Mp4Demux.parse(bytes).forall(_.sampleCount >= 0))
      assert(graft.ext.WebmDemux.blocks(bytes) != null)
      // graft a valid magic onto garbage: parsers must reject the body,
      // not trust the header
      val mp4ish = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("ISO-8859-1") ++ bytes
      assert(graft.ext.Mp4Demux.parse(mp4ish).isEmpty)
      val webmish = Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte, 0xA3.toByte,
        0x81.toByte, 0x00.toByte) ++ bytes
      assert(graft.ext.WebmDemux.blocks(webmish) != null)
    }
  }

  test("deletion vectors are invisible semantics: random DML sequences match the rewrite path") {
    // the same op sequence applied to a DV table and a classic table must
    // converge to identical content at EVERY step — bitmaps are a storage
    // optimization, never a semantics change
    sealed trait Op
    case class Append(rows: List[(Int, Int)]) extends Op
    case class Delete(lo: Int, hi: Int) extends Op
    case class Update(lo: Int, hi: Int, v: Int) extends Op
    val opGen: Gen[Op] = Gen.frequency(
      3 -> Gen.listOfN(12, Gen.zip(Gen.choose(0, 40), Gen.choose(0, 9)))
        .map(rs => Append(rs.distinct)),
      2 -> Gen.zip(Gen.choose(0, 40), Gen.choose(0, 12)).map { case (a, w) => Delete(a, a + w) },
      2 -> (for {
        a <- Gen.choose(0, 40); w <- Gen.choose(0, 12); v <- Gen.choose(100, 999)
      } yield Update(a, a + w, v)))
    val seqGen = Gen.listOfN(7, opGen)
    samples(seqGen, 4).zipWithIndex.foreach { case (ops, i) =>
      val base = java.nio.file.Files.createTempDirectory(s"graft-dvprop-$i-").toString
      val dvT = graft.tables.GraftTable(spark, s"$base/dv")(
        graft.conf.GraftSettings.default.copy(deletionVectors = true))
      val rwT = graft.tables.GraftTable(spark, s"$base/rw")(
        graft.conf.GraftSettings.default)
      ops.foreach { op =>
        def run(t: graft.tables.GraftTable): Unit = op match {
          case Append(rows) if rows.nonEmpty =>
            t.append(rows.toDF("id", "amt").coalesce(1))
          case Append(_)    => ()
          case Delete(a, b) => if (t.exists) t.delete(col("id") >= a && col("id") <= b)
          case Update(a, b, v) =>
            if (t.exists) t.update(col("id") >= a && col("id") <= b, Map("amt" -> lit(v)))
        }
        run(dvT); run(rwT)
        if (dvT.exists || rwT.exists) {
          val got = dvT.read().collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
          val want = rwT.read().collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
          assert(got === want, s"DV divergence after $op in sequence $ops")
        }
      }
      // and the purge collapses to the same content
      dvT.optimize()
      val got = dvT.read().collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val want = rwT.read().collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(got === want, s"DV divergence after optimize in $ops")
    }
  }

  test("column mapping is invisible semantics: random rename chains match a plain table") {
    // random interleavings of appends and renames: the mapped table's
    // content equals a plain table receiving the same rows under the
    // final names — and data skipping stays sound throughout
    val namePool = Vector("a", "b", "c", "d")
    sealed trait Op
    case class Append(rows: List[(Int, Int)]) extends Op
    case class Rename(fromIdx: Int, toIdx: Int) extends Op
    val opGen: Gen[Op] = Gen.frequency(
      3 -> Gen.listOfN(10, Gen.zip(Gen.choose(0, 30), Gen.choose(0, 9))).map(Append(_)),
      2 -> Gen.zip(Gen.choose(0, 3), Gen.choose(0, 3)).map { case (f, t) => Rename(f, t) })
    samples(Gen.listOfN(8, opGen), 4).zipWithIndex.foreach { case (ops, i) =>
      val base = java.nio.file.Files.createTempDirectory(s"graft-cmprop-$i-").toString
      val t = graft.tables.GraftTable(spark, s"$base/t")(graft.conf.GraftSettings.default)
      // the logical names of the two columns as renames land
      var names = Vector("k", "v")
      var rows = List.empty[(Int, Int)]
      ops.foreach {
        case Append(rs) if rs.nonEmpty =>
          t.append(rs.toDF(names(0), names(1)).coalesce(1))
          rows ++= rs
        case Append(_) => ()
        case Rename(f, tIdx) =>
          val from = names(f % names.size)
          val to = namePool(tIdx)
          if (!names.contains(to) && t.exists) {
            t.renameColumn(from, to)
            names = names.map(n => if (n == from) to else n)
          }
      }
      if (t.exists) {
        assert(t.read().columns.toSeq === names)
        val got = t.read().collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
        val want = rows.map(r => Seq[Any](r._1, r._2)).groupBy(identity).view.mapValues(_.length).toMap
        assert(got === want, s"mapping divergence after $ops")
        // skipping soundness under the final name
        val p = col(names(0)) > 15
        assert(t.readWhere(p).collect().map(_.toSeq).toSet
          === t.read().filter(p).collect().map(_.toSeq).toSet)
      }
    }
  }

  test("partition-value decode inverts Spark's hive path escaping on arbitrary strings") {
    // the stats-atom side of a partitioned-tree convert must read back
    // EXACTLY the value partitionBy wrote — escapePathName is the writer
    // (Spark uses it for every partition dir), hiveUnescape the reader.
    // Percent-only semantics: '+' stays literal, %XX decodes, and the
    // escaper's own output never contains a bare misinterpretable char.
    val tricky = Seq("a+b", "x:y", "50%", "a b", "semi;colon", "eq=ual",
      "sla/sh", "back\\slash", "star*", "qu?est", "élève", "emoji😀",
      "__HIVE_DEFAULT_PARTITION_", "%2B", "%", "+", " ")
    val gen = Gen.oneOf(
      Gen.oneOf(tricky),
      Gen.listOfN(12, Gen.choose(' ', 'ÿ')).map(_.mkString))
    samples(gen, 300).foreach { v =>
      val escaped = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(v)
      assert(!escaped.contains("/"), s"escaper must keep '$v' a single segment")
      assert(graft.tables.GraftTable.hiveUnescape(escaped) === v,
        s"round-trip broke for '$v' (escaped: '$escaped')")
    }
  }
}
