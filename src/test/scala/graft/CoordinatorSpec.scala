package graft

import graft.coordinator.{Assignors, GroupCoordinator}
import graft.storage.ParquetStorage

/** Consumer-group lifecycle per reference
  * `nisshi-broker/src/coordinator/group/administrator.rs` (join/sync/
  * heartbeat/leave, generations, CAS persistence).
  */
class CoordinatorSpec extends SparkSpec {

  private def newCoordinator(clock: () => Long = () => 0L) = {
    val root = java.nio.file.Files.createTempDirectory("graft-coord").toString
    new GroupCoordinator(new ParquetStorage(spark, root),
      defaultSessionTimeoutMs = 1000, clock = clock)
  }

  private val meta: Assignors.TopicMeta = Map("t0" -> 4)

  test("join/sync lifecycle: leader computes, members receive") {
    val c = newCoordinator()
    val (m1, gen1, lead1) = c.join("g", None, Set("t0"))
    assert(lead1)
    // second joiner enters the SAME rebalance cohort: one generation for
    // the whole cohort, so concurrent joiners cannot livelock each other
    val (m2, gen2, lead2) = c.join("g", None, Set("t0"))
    assert(!lead2 && gen2 === gen1)
    // sync before leader computes -> rebalance in progress
    assert(c.sync("g", m2, gen2, meta) === Left("REBALANCE_IN_PROGRESS"))
    // leader sync forms the group
    val a1 = c.sync("g", m1, gen2, meta)
    assert(a1.isRight && a1.toOption.get.size === 2)
    val a2 = c.sync("g", m2, gen2, meta)
    assert(a2.isRight && a2.toOption.get.size === 2)
    // all 4 partitions covered exactly once
    assert((a1.toOption.get ++ a2.toOption.get).sorted ===
      (0 until 4).map(Assignors.Topition("t0", _)))
  }

  test("corrupt persisted group state self-heals instead of bricking the group") {
    val root = java.nio.file.Files.createTempDirectory("graft-coord-c").toString
    val storage = new ParquetStorage(spark, root)
    val c = new GroupCoordinator(storage, defaultSessionTimeoutMs = 1000,
      clock = () => 0L)
    val (m1, _, _) = c.join("g", None, Set("t0"))
    assert(m1.nonEmpty)
    // torn write: the persisted state exists but no longer parses
    val dir = java.nio.file.Paths.get(root, "groups")
    import scala.jdk.CollectionConverters._
    val f = java.nio.file.Files.list(dir).iterator().asScala
      .find(p => java.nio.file.Files.isRegularFile(p)).get
    val version = java.nio.file.Files.readString(f).linesIterator.next()
    java.nio.file.Files.writeString(f, s"$version\n{not json")
    // a FRESH process over the same root must still admit joins
    // (the CAS overwrites the unparseable state at its stored version)
    val c2 = new GroupCoordinator(new ParquetStorage(spark, root),
      defaultSessionTimeoutMs = 1000, clock = () => 0L)
    val (m2, gen2, lead2) = c2.join("g", None, Set("t0"))
    assert(m2.nonEmpty && gen2 >= 1 && lead2)
  }

  test("stale generation rejected; unknown member rejected") {
    val c = newCoordinator()
    val (m1, _, _) = c.join("g", None, Set("t0"))
    val (_, gen2, _) = c.join("g", None, Set("t0"))
    assert(c.sync("g", m1, gen2 - 1, meta) === Left("ILLEGAL_GENERATION"))
    assert(c.sync("g", "ghost", gen2, meta) === Left("UNKNOWN_MEMBER_ID"))
    assert(c.heartbeat("g", "ghost", gen2) === Left("UNKNOWN_MEMBER_ID"))
  }

  test("leave bumps generation and re-forms; leadership moves") {
    val c = newCoordinator()
    val (m1, _, _) = c.join("g", None, Set("t0"))
    val (m2, gen2, _) = c.join("g", None, Set("t0"))
    c.sync("g", m1, gen2, meta)
    c.leave("g", m1)
    val Some((state, gen3, n)) = c.describe("g")
    assert(state === "Forming" && gen3 === gen2 + 1 && n === 1)
    // m2 is now leader and can form alone
    val a = c.sync("g", m2, gen3, meta)
    assert(a === Left("REBALANCE_IN_PROGRESS") || a.isRight) // must rejoin first
  }

  test("heartbeat expiry evicts members") {
    var now = 0L
    val c = newCoordinator(() => now)
    val (m1, _, _) = c.join("g", None, Set("t0"))
    now = 5000L
    c.expireMembers()
    assert(c.describe("g").map(_._3) === Some(0))
  }

  test("stateless takeover: a second coordinator serves a group formed by the first") {
    // the stateless-broker property (reference administrator.rs:562-700,
    // lib.rs:1472-1478): full group state lives in storage, so ANY
    // coordinator over the same storage can serve the group
    val root = java.nio.file.Files.createTempDirectory("graft-coord2").toString
    val storage = new ParquetStorage(spark, root)
    val c1 = new GroupCoordinator(storage, defaultSessionTimeoutMs = 1000,
      clock = () => 0L)
    val (m1, gen, _) = c1.join("g", None, Set("t0"))
    val (m2, _, _) = c1.join("g", None, Set("t0"))
    assert(c1.sync("g", m1, gen, meta).isRight)

    val c2 = new GroupCoordinator(storage, defaultSessionTimeoutMs = 1000,
      clock = () => 0L)
    // heartbeat + sync for a member c2 has never seen
    assert(c2.heartbeat("g", m2, gen) === Right(()))
    val a = c2.sync("g", m2, gen, meta)
    assert(a.isRight && a.toOption.get.nonEmpty)
    // same assignment the first coordinator handed out
    assert(a === c1.sync("g", m2, gen, meta))

    // CAS safety: c2 moves the group (member leaves → new generation);
    // c1's stale cache loses the race and tells the caller to rejoin
    assert(c2.leave("g", m2) === Right(()))
    assert(c1.sync("g", m1, gen, meta) === Left("ILLEGAL_GENERATION") ||
      c1.sync("g", m1, gen, meta) === Left("REBALANCE_IN_PROGRESS"))
    // unknown member/group are real errors (zombie detection)
    assert(c2.leave("g", "ghost") === Left("UNKNOWN_MEMBER_ID"))
    assert(c2.leave("nope", m1) === Left("UNKNOWN_GROUP"))
  }

  test("concurrent joins across two stateless coordinators: every admitted member persisted") {
    // the round-4 CAS-race defect: a join whose persistOrReload lost the
    // CAS used to hand out a memberId that was NOT in the persisted
    // roster. With admission retried against the winner's state, every
    // returned memberId must be visible to a FRESH coordinator.
    val root = java.nio.file.Files.createTempDirectory("graft-coord3").toString
    val storage = new ParquetStorage(spark, root)
    val c1 = new GroupCoordinator(storage, defaultSessionTimeoutMs = 1000,
      clock = () => 0L)
    val c2 = new GroupCoordinator(storage, defaultSessionTimeoutMs = 1000,
      clock = () => 0L)
    val admitted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        val c = if (i % 2 == 0) c1 else c2
        admitted.add(c.join("g", None, Set("t0"))._1)
        ()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val fresh = new GroupCoordinator(storage, defaultSessionTimeoutMs = 1000,
      clock = () => 0L)
    val roster = fresh.membersOf("g").map(_._1).toSet
    import scala.jdk.CollectionConverters._
    assert(admitted.asScala.toSet.size === 8) // no id collisions
    admitted.asScala.foreach(id => assert(roster.contains(id), s"$id lost"))
    assert(roster.size === 8)
  }
}
