package graft.tables

/** Neutral predicate atoms extracted from a `Column` by
  * [[org.apache.spark.sql.graftbridge.ColumnBridge.conjuncts]] — the only
  * shapes data skipping reasons about. Anything else arrives as [[Opaque]]
  * and never prunes. */
sealed trait PredAtom
/** `col <op> value` with op in > >= < <= = (column-on-the-left form). */
final case class PredCmp(op: String, col: String, value: Any) extends PredAtom
/** `col IN (values)` — the multi-point probe shape (`Column.isin`). */
final case class PredIn(col: String, values: Seq[Any]) extends PredAtom
final case class PredNull(col: String, isNull: Boolean) extends PredAtom
case object PredOpaque extends PredAtom

/** `startswith(col, p)` desugars to range atoms for data skipping:
  * every p-prefixed string s satisfies `s >= p` (p is its prefix) and
  * `s < upper(p)` (they share p.init, and at p's last position s carries
  * p.last vs upper's p.last+1 — s loses regardless of its suffix). The
  * upper bound is omitted when incrementing the last char would leave the
  * safely-comparable plane (near the surrogate range) — prefix pruning
  * then degrades to the lower bound alone, still sound. The decisive
  * shape for URL/domain-prefix scans over host-clustered web tables. */
object PrefixBounds {
  def upper(p: String): Option[String] =
    if (p.nonEmpty && p.last < 0xCFFF.toChar)
      Some(p.init + (p.last + 1).toChar)
    else None
}

/** Evaluates whether a predicate MAY hold on a file given its column
  * min/max/null stats ([[FileStats]]) — the data-skipping decision.
  *
  * Sound by construction: `mayHold` answers false only when the stats
  * PROVE no row can satisfy the conjunct (e.g. `col > 5` against a file
  * whose max is 5). Any unrecognized expression shape, type, or missing
  * column answers true — unsupported predicates cost a scan, never
  * correctness. Mirrors the skipping algebra of Delta/Iceberg manifests.
  */
private[tables] object StatsPruning {

  /** Comparable domain of a literal's runtime value: `("num", BigDecimal)`
    * for numerics/bools (date = epoch days, timestamp = epoch micros) or
    * `("str", String)`. None for nulls and unsupported types. */
  private def litCmp(v: Any): Option[(String, Any)] = v match {
    case null                    => None
    case b: Byte                 => Some(("num", BigDecimal(b.toInt)))
    case s: Short                => Some(("num", BigDecimal(s.toInt)))
    case i: Int                  => Some(("num", BigDecimal(i)))
    case l: Long                 => Some(("num", BigDecimal(l)))
    // Non-finite floats have no BigDecimal image (BigDecimal(NaN) throws)
    // and no place on the stats number line — data-derived atoms (a MERGE
    // source's key min/max, an upsert's key range) can carry them when the
    // batch holds NaN/Infinity keys. None = conservative keep: the atom
    // stops pruning but the DML completes, matching pre-atom behavior.
    case f: Float if f.isNaN || f.isInfinite  => None
    case d: Double if d.isNaN || d.isInfinite => None
    case f: Float                => Some(("num", BigDecimal(f.toDouble)))
    case d: Double               => Some(("num", BigDecimal(d)))
    case d: BigDecimal           => Some(("num", d))
    case d: java.math.BigDecimal => Some(("num", BigDecimal(d)))
    case s: String               => Some(("str", s))
    case b: Boolean              => Some(("bool", BigDecimal(if (b) 1 else 0)))
    case d: java.sql.Date        => Some(("date", BigDecimal(d.toLocalDate.toEpochDay)))
    case d: java.time.LocalDate  => Some(("date", BigDecimal(d.toEpochDay)))
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      Some(("ts", BigDecimal(i.getEpochSecond) * 1000000 + i.getNano / 1000))
    case i: java.time.Instant =>
      Some(("ts", BigDecimal(i.getEpochSecond) * 1000000 + i.getNano / 1000))
    case _ => None
  }

  /** A stored stat string in the literal's comparable domain (stage()
    * wrote dates as `yyyy-MM-dd`, timestamps as epoch micros, booleans as
    * true/false, everything else as its cast-to-string value). */
  private def statCmp(domain: String, s: String): Option[Any] =
    try domain match {
      case "num"  => Some(BigDecimal(s))
      case "str"  => Some(s)
      case "bool" => Some(BigDecimal(if (s == "true") 1 else 0))
      case "date" => Some(BigDecimal(java.time.LocalDate.parse(s).toEpochDay))
      case "ts"   => Some(BigDecimal(s))
      case _      => None
    } catch { case _: Exception => None }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case (x: String, y: String)         => Some(utf8Compare(x, y))
    case _                              => None
  }

  /** Unsigned lexicographic compare of the UTF-8 encodings — the order the
    * stats were COLLECTED in: Spark's `min()`/`max()` aggregates order
    * `StringType` by UTF8String binary comparison. `String.compareTo`
    * orders by UTF-16 code units instead, and the two disagree beyond the
    * BMP: supplementary code points (U+10000+) encode as surrogate pairs
    * starting at 0xD800, sorting BEFORE [U+E000, U+FFFF] in UTF-16 but
    * AFTER them in UTF-8 — mixing the orders lets a range predicate judge
    * `mayHold = false` for a file that holds a matching emoji-bearing row,
    * an UNSOUND prune. One comparator, matched to the stats writer. */
  private def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Can any row of a file with stats `st` satisfy conjunct `p`? */
  def mayHold(p: PredAtom, st: FileStats): Boolean = p match {
    case PredCmp(op, name, v)  => bound(name, v, op, st)
    // IN prunes when NO listed value can fall inside [min, max] — the
    // decisive shape for multi-point probes (an ANN query's bucket set
    // against a bucket-clustered index): each file keeps only the values
    // its range could hold, everything else is skipped.
    case PredIn(name, vs)      => vs.exists(v => bound(name, v, "=", st))
    case PredNull(name, true)  => st.cols.get(name).forall(_.nulls > 0)
    case PredNull(name, false) => st.cols.get(name).forall(_.nulls < st.rows)
    case PredOpaque            => true
  }

  /** Decide `col <op> v` against the column's [min, max, nulls]. All-null
    * columns fail every comparison (SQL three-valued logic: NULL cmp x is
    * never true); unparsable stats keep the file. */
  private def bound(name: String, v: Any, op: String, st: FileStats): Boolean = {
    val decided = for {
      cs <- st.cols.get(name)
      (domain, lv) <- litCmp(v)
    } yield (cs.min.flatMap(statCmp(domain, _)), cs.max.flatMap(statCmp(domain, _))) match {
      case (Some(mn), Some(mx)) =>
        op match {
          case ">"  => cmp(mx, lv).forall(_ > 0)
          case ">=" => cmp(mx, lv).forall(_ >= 0)
          case "<"  => cmp(mn, lv).forall(_ < 0)
          case "<=" => cmp(mn, lv).forall(_ <= 0)
          case "="  => cmp(mn, lv).forall(_ <= 0) && cmp(mx, lv).forall(_ >= 0)
          case _    => true
        }
      case (None, None) if cs.nulls == st.rows => false // all-null column
      case _                                   => true
    }
    decided.getOrElse(true)
  }
}
