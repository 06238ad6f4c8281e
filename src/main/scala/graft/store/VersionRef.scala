package graft.store

/** Version-selector grammar for table references.
  *
  * Mirrors the reference's git-like selectors (grammar
  * client/td-sdk/tabsdata/_tableuri.py:13-160; server enum `Version::
  * {Fixed,Head(isize),Initial(isize)}` and `Versions::{None,Single,List,
  * Range}` at server/libraries/td-objects/src/table_ref.rs:14-64):
  * `HEAD`, `HEAD^`, `HEAD^^`, `HEAD~n`, `INITIAL`, `INITIAL~n`, a fixed
  * 26-char id, comma lists, and `from..to` ranges.
  */
sealed trait Version
object Version {
  /** n backwards from the latest (0 = HEAD). */
  final case class Head(back: Int) extends Version
  /** n forwards from the first (0 = INITIAL). */
  final case class Initial(forward: Int) extends Version
  /** A concrete 26-char version id. */
  final case class Fixed(id: String) extends Version

  private val FixedRe = "^[0-9a-v]{26}$".r
  private val HeadRe = "^HEAD(\\^*)$".r
  private val HeadTildeRe = "^HEAD~(\\d+)$".r
  private val InitialRe = "^INITIAL$".r
  private val InitialTildeRe = "^INITIAL~(\\d+)$".r

  def parse(s: String): Version = s.trim match {
    case HeadRe(carets)      => Head(carets.length)
    case HeadTildeRe(n)      => Head(n.toInt)
    case InitialRe()         => Initial(0)
    case InitialTildeRe(n)   => Initial(n.toInt)
    case f if FixedRe.findFirstIn(f).isDefined => Fixed(f)
    case other => throw new IllegalArgumentException(s"bad version selector: '$other'")
  }
}

/** One or many versions: single, comma list, or `a..b` range. */
sealed trait Versions
object Versions {
  final case class Single(v: Version) extends Versions
  final case class VList(vs: Seq[Version]) extends Versions
  final case class VRange(from: Version, to: Version) extends Versions

  def parse(s: String): Versions = {
    val t = s.trim
    if (t.contains("..")) {
      val parts = t.split("\\.\\.", -1)
      require(parts.length == 2, s"bad version range: '$s'")
      VRange(Version.parse(parts(0)), Version.parse(parts(1)))
    } else if (t.contains(",")) {
      VList(t.split(",").map(Version.parse).toSeq)
    } else Single(Version.parse(t))
  }
}

/** A table reference `collection/table@versions` (version part optional →
  * HEAD), mirroring the reference's table-URI shape. */
final case class TableRef(collection: String, table: String, versions: Versions)
object TableRef {
  def parse(s: String, defaultCollection: String = "default"): TableRef = {
    val (path, ver) = s.indexOf('@') match {
      case -1 => (s, "HEAD")
      case i  => (s.substring(0, i), s.substring(i + 1))
    }
    val (coll, table) = path.indexOf('/') match {
      case -1 => (defaultCollection, path)
      case i  => (path.substring(0, i), path.substring(i + 1))
    }
    TableRef(coll, table, Versions.parse(ver))
  }
}
