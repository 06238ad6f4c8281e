package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{SysCtx, TableFrame}
import graft.flow.FlowEngine
import graft.store._

/** Version-resolution scenarios ported from the reference resolver's test
  * corpus (server/libraries/td-execution/src/version_resolver.rs:449-1957):
  * every selector form × the trigger-time (`triggered_on`) cutoff, plus the
  * fixed-not-found and descending-range error semantics. */
class VersionResolverSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Store with `n` committed versions of c/t at ts = 1000, 2000, ... */
  private def seeded(n: Int): (TableStore, IndexedSeq[VersionEntry]) = {
    val store = new TableStore(Files.createTempDirectory("graft-vr").toString, spark)
    import spark.implicits._
    val entries = (1 to n).map { i =>
      val ctx = SysCtx.fresh().copy(version = store.newId(),
        timestamp = new java.sql.Timestamp(i * 1000L))
      val e = store.stageWrite("c", "t", Seq(i).toDF("v"), ctx)
      store.commitTransaction(ctx.transaction)
      e
    }
    (store, entries)
  }

  private def ids(es: Seq[VersionEntry]): Seq[String] = es.map(_.id)

  test("single HEAD: latest, HEAD at earlier cutoff, HEAD~1 (rs:578)") {
    val (s, v) = seeded(3)
    assert(s.resolveOne("c", "t", Version.Head(0)).get.id == v(2).id)
    // cutoff at version_2's triggered_on resolves HEAD to version_2 (inclusive)
    assert(s.resolveOne("c", "t", Version.Head(0), asOf = Some(2000L)).get.id == v(1).id)
    assert(s.resolveOne("c", "t", Version.Head(1)).get.id == v(1).id)
    // HEAD~1 under the cutoff steps back from the cutoff HEAD
    assert(s.resolveOne("c", "t", Version.Head(1), asOf = Some(2000L)).get.id == v(0).id)
    assert(s.resolveOne("c", "t", Version.Head(5)).isEmpty)
  }

  test("single INITIAL: oldest, INITIAL~n, cutoff hides nothing old (rs:674)") {
    val (s, v) = seeded(3)
    assert(s.resolveOne("c", "t", Version.Initial(0)).get.id == v(0).id)
    assert(s.resolveOne("c", "t", Version.Initial(2)).get.id == v(2).id)
    assert(s.resolveOne("c", "t", Version.Initial(0), asOf = Some(1000L)).get.id == v(0).id)
    // INITIAL~2 beyond the cutoff window is not visible
    assert(s.resolveOne("c", "t", Version.Initial(2), asOf = Some(2000L)).isEmpty)
    assert(s.resolveOne("c", "t", Version.Initial(9)).isEmpty)
  }

  test("single fixed: resolves by id; invisible past cutoff errors (rs:772)") {
    val (s, v) = seeded(3)
    assert(s.resolve("c", "t", Versions.Single(Version.Fixed(v(1).id))).map(_.id) == Seq(v(1).id))
    // the fixed version exists but is after the cutoff → not found → error
    intercept[NoSuchElementException] {
      s.resolve("c", "t", Versions.Single(Version.Fixed(v(2).id)), asOf = Some(2000L))
    }
  }

  test("single fixed not found is an error, not empty (rs:70-84)") {
    val (s, _) = seeded(1)
    intercept[NoSuchElementException] {
      s.resolve("c", "t", Versions.Single(Version.Fixed("0" * 26)))
    }
  }

  test("list of relatives resolves positionally (rs:852)") {
    val (s, v) = seeded(3)
    val got = s.resolve("c", "t",
      Versions.VList(Seq(Version.Head(0), Version.Head(2), Version.Initial(1))))
    assert(ids(got) == Seq(v(2).id, v(0).id, v(1).id))
    // relatives that fall off the end resolve to nothing but don't error
    val sparse = s.resolve("c", "t", Versions.VList(Seq(Version.Head(0), Version.Head(9))))
    assert(ids(sparse) == Seq(v(2).id))
  }

  test("list of fixed ids resolves each; mixed fixed+relative works (rs:914,960)") {
    val (s, v) = seeded(3)
    val got = s.resolve("c", "t",
      Versions.VList(Seq(Version.Fixed(v(0).id), Version.Fixed(v(2).id))))
    assert(ids(got) == Seq(v(0).id, v(2).id))
    val mixed = s.resolve("c", "t",
      Versions.VList(Seq(Version.Fixed(v(1).id), Version.Head(0))))
    assert(ids(mixed) == Seq(v(1).id, v(2).id))
  }

  test("list with missing fixed ids errors naming them (rs:1016)") {
    val (s, v) = seeded(2)
    val missing = "0" * 26
    val err = intercept[NoSuchElementException] {
      s.resolve("c", "t",
        Versions.VList(Seq(Version.Fixed(v(0).id), Version.Fixed(missing))))
    }
    assert(err.getMessage.contains(missing))
  }

  test("range HEAD~1..HEAD and INITIAL..INITIAL~1 (rs:1069,1121)") {
    val (s, v) = seeded(3)
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Head(1), Version.Head(0)))) ==
      Seq(v(1).id, v(2).id))
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Initial(0), Version.Initial(1)))) ==
      Seq(v(0).id, v(1).id))
  }

  test("range INITIAL..HEAD spans all; respects cutoff (rs:1173)") {
    val (s, v) = seeded(3)
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Initial(0), Version.Head(0)))) ==
      ids(v))
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Initial(0), Version.Head(0)),
      asOf = Some(2000L))) == Seq(v(0).id, v(1).id))
  }

  test("descending ranges resolve to nothing (rs:1239,1336,1371)") {
    val (s, _) = seeded(2)
    assert(s.resolve("c", "t", Versions.VRange(Version.Head(0), Version.Head(1))).isEmpty)
    assert(s.resolve("c", "t", Versions.VRange(Version.Initial(1), Version.Initial(0))).isEmpty)
    assert(s.resolve("c", "t", Versions.VRange(Version.Head(0), Version.Initial(0))).isEmpty)
  }

  test("descending range errors when errorOnDescRange (rs:1930)") {
    val (s, _) = seeded(2)
    intercept[IllegalArgumentException] {
      s.resolve("c", "t", Versions.VRange(Version.Head(0), Version.Head(1)),
        errorOnDescRange = true)
    }
  }

  test("same-bound ranges give one version; out-of-history gives none (rs:1498-1646)") {
    val (s, v) = seeded(2)
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Head(0), Version.Head(0)))) ==
      Seq(v(1).id))
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Initial(0), Version.Initial(0)))) ==
      Seq(v(0).id))
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Fixed(v(0).id), Version.Fixed(v(0).id)))) ==
      Seq(v(0).id))
    assert(s.resolve("c", "t", Versions.VRange(Version.Head(5), Version.Head(5))).isEmpty)
  }

  test("fixed..HEAD and fixed-bounded ranges (rs:1406,1684,1770)") {
    val (s, v) = seeded(3)
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Fixed(v(0).id), Version.Fixed(v(1).id)))) ==
      Seq(v(0).id, v(1).id))
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Fixed(v(1).id), Version.Head(0)))) ==
      Seq(v(1).id, v(2).id))
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Initial(0), Version.Fixed(v(1).id)))) ==
      Seq(v(0).id, v(1).id))
    // matching bounds across selector kinds: HEAD meeting the same fixed id
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Fixed(v(2).id), Version.Head(0)))) ==
      Seq(v(2).id))
  }

  test("default selector (Versions::None ≡ HEAD) tracks triggered_on (rs:449,514)") {
    val (s, v) = seeded(2)
    // at each version's own triggered_on, that version is HEAD (inclusive)
    assert(s.resolveOne("c", "t", Version.Head(0), asOf = Some(1000L)).get.id == v(0).id)
    assert(s.resolveOne("c", "t", Version.Head(0), asOf = Some(2000L)).get.id == v(1).id)
    // and "now" (no cutoff) resolves the latest
    assert(s.resolveOne("c", "t", Version.Head(0)).get.id == v(1).id)
  }

  test("resolution is per-table: sibling tables never leak in (rs:477)") {
    val (s, v) = seeded(1)
    import spark.implicits._
    Seq("other_1", "other_2").foreach { t =>
      val ctx = SysCtx.fresh().copy(version = s.newId(),
        timestamp = new java.sql.Timestamp(500L))
      s.stageWrite("c", t, Seq(99).toDF("v"), ctx)
      s.commitTransaction(ctx.transaction)
    }
    val got = s.resolve("c", "t", Versions.Single(Version.Head(0)))
    assert(ids(got) == Seq(v(0).id))
    assert(s.resolve("c", "other_1", Versions.Single(Version.Head(0))).head.id != v(0).id)
  }

  test("range with a pre-history HEAD bound clips to real history (rs:1291)") {
    val (s, v) = seeded(2)
    // HEAD~2..HEAD over 2 versions: the reference yields 3 positional slots
    // [None, v1, v2]; flattened to data that is both real versions
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Head(2), Version.Head(0)))) ==
      Seq(v(0).id, v(1).id))
    // HEAD~5..fixed(v1): 5 slots, only the fixed endpoint exists (rs:1886)
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Head(5), Version.Fixed(v(0).id)))) ==
      Seq(v(0).id))
  }

  test("range with a post-history INITIAL bound clips to real history") {
    val (s, v) = seeded(2)
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Initial(0), Version.Initial(5)))) ==
      ids(v))
  }

  test("inverse fixed range resolves to nothing (rs:1458)") {
    val (s, v) = seeded(3)
    assert(s.resolve("c", "t",
      Versions.VRange(Version.Fixed(v(2).id), Version.Fixed(v(0).id))).isEmpty)
  }

  test("same-bound ranges entirely outside history yield no data (rs:1574,1610)") {
    val (s, _) = seeded(2)
    // reference returns a single None slot for both; no data either way
    assert(s.resolve("c", "t", Versions.VRange(Version.Head(3), Version.Head(3))).isEmpty)
    assert(s.resolve("c", "t", Versions.VRange(Version.Initial(3), Version.Initial(3))).isEmpty)
  }

  test("fixed..INITIAL+n range (rs:1727)") {
    val (s, v) = seeded(2)
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Fixed(v(0).id), Version.Initial(1)))) ==
      Seq(v(0).id, v(1).id))
  }

  test("matching bounds across selector kinds (rs:1809,1847)") {
    val (s, v) = seeded(2)
    // INITIAL..HEAD~1 meet at the first version
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Initial(0), Version.Head(1)))) ==
      Seq(v(0).id))
    // INITIAL..fixed(first) likewise
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Initial(0), Version.Fixed(v(0).id)))) ==
      Seq(v(0).id))
  }

  test("range cutoff composes with positional bounds (rs:1173 × cutoff)") {
    val (s, v) = seeded(3)
    // under cutoff 2000 history is [v0, v1]; HEAD~2..HEAD clips to both
    assert(ids(s.resolve("c", "t", Versions.VRange(Version.Head(2), Version.Head(0)),
      asOf = Some(2000L))) == Seq(v(0).id, v(1).id))
    // fixed bound not visible under the cutoff → no data
    assert(s.resolve("c", "t", Versions.VRange(Version.Fixed(v(2).id), Version.Head(0)),
      asOf = Some(2000L)).isEmpty)
  }

  test("list mixing ranges' bounds under cutoff stays positional (rs:852 × cutoff)") {
    val (s, v) = seeded(3)
    val got = s.resolve("c", "t",
      Versions.VList(Seq(Version.Head(0), Version.Initial(0))), asOf = Some(2000L))
    assert(ids(got) == Seq(v(1).id, v(0).id))
  }

  test("INITIAL arithmetic past HEAD resolves empty, never wraps") {
    val (s, _) = seeded(2)
    assert(s.resolveOne("c", "t", Version.Initial(2)).isEmpty)
    assert(s.resolveOne("c", "t", Version.Initial(100)).isEmpty)
    // and in a list position it is simply absent
    assert(s.resolve("c", "t",
      Versions.VList(Seq(Version.Initial(0), Version.Initial(50)))).length == 1)
  }

  test("empty history: every selector resolves to nothing, fixed errors") {
    val store = new TableStore(Files.createTempDirectory("graft-vr").toString, spark)
    assert(store.resolveOne("c", "t", Version.Head(0)).isEmpty)
    assert(store.resolveOne("c", "t", Version.Initial(0)).isEmpty)
    assert(store.resolve("c", "t",
      Versions.VRange(Version.Initial(0), Version.Head(0))).isEmpty)
    intercept[NoSuchElementException] {
      store.resolve("c", "t", Versions.Single(Version.Fixed("0" * 26)))
    }
  }

  test("flow re-run at the original trigger time sees the original inputs") {
    val store = new TableStore(Files.createTempDirectory("graft-vr").toString, spark)
    val engine = new FlowEngine(store, spark)
    import spark.implicits._
    var payload = Seq((1, "first"))
    engine.publisher("pub", "c", Seq("src")) { _ =>
      Seq(TableFrame.fromRaw(payload.toDF("id", "tag")))
    }
    engine.transformer("tx", "c", Seq("src"), Seq("dst")) { ctx =>
      Seq(ctx.input(0))
    }
    engine.trigger("pub")
    val firstRunTs = store.versions("c", "dst").last.timestampMs
    // an unrelated later execution advances src
    Thread.sleep(5)
    payload = Seq((2, "second"))
    engine.runFunction(engine.fn("pub"), store.newId(), System.currentTimeMillis())
    assert(store.scan("c/src").get.df.count() == 1) // HEAD is now "second"
    assert(store.scan("c/src").get.df.select("tag").head().getString(0) == "second")
    // re-running the transformer with the ORIGINAL execution ts resolves the
    // ORIGINAL src version, not the newer one (version_resolver.rs:29-37)
    engine.runFunction(engine.fn("tx"), store.newId(), firstRunTs)
    val dst = store.scan("c/dst").get.df
    assert(dst.select("tag").head().getString(0) == "first")
  }
}
