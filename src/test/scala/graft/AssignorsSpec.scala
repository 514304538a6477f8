package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.coordinator.Assignors
import graft.coordinator.Assignors.Topition

/** Assignor semantics from the reference spec (`plan.md:22-90`) plus the
  * golden cases from its test plan table (`plan.md:176-190`).
  */
class AssignorsSpec extends AnyFunSuite with PropSupport {

  private def subs(ms: (String, Seq[String])*): Assignors.Subscriptions =
    ms.map { case (m, ts) => m -> ts.toSet }.toMap

  // ---- golden cases from plan.md's test table

  test("roundrobin: even_single_topic — 3 members, 3 partitions, 1 each") {
    val a = Assignors.roundRobin(
      subs("c0" -> Seq("t0"), "c1" -> Seq("t0"), "c2" -> Seq("t0")),
      Map("t0" -> 3))
    assert(a.values.forall(_.size == 1))
    assert(a("c0") === Seq(Topition("t0", 0)))
    assert(a("c1") === Seq(Topition("t0", 1)))
    assert(a("c2") === Seq(Topition("t0", 2)))
  }

  test("roundrobin: even_two_topics — each member 1 partition per topic") {
    val a = Assignors.roundRobin(
      subs("c0" -> Seq("t0", "t1"), "c1" -> Seq("t0", "t1"), "c2" -> Seq("t0", "t1")),
      Map("t0" -> 3, "t1" -> 3))
    assert(a.values.forall(_.size == 2))
    a.foreach { case (_, tps) => assert(tps.map(_.topic).distinct.size === 2) }
  }

  test("roundrobin: uneven_single_topic — c0 gets [0,2], c1 gets [1]") {
    val a = Assignors.roundRobin(
      subs("c0" -> Seq("t0"), "c1" -> Seq("t0")), Map("t0" -> 3))
    assert(a("c0") === Seq(Topition("t0", 0), Topition("t0", 2)))
    assert(a("c1") === Seq(Topition("t0", 1)))
  }

  test("roundrobin: interleaved_two_topics — c0 t0:[0,2] t1:[1]; c1 t0:[1] t1:[0,2]") {
    val a = Assignors.roundRobin(
      subs("c0" -> Seq("t0", "t1"), "c1" -> Seq("t0", "t1")),
      Map("t0" -> 3, "t1" -> 3))
    assert(a("c0") === Seq(Topition("t0", 0), Topition("t0", 2), Topition("t1", 1)))
    assert(a("c1") === Seq(Topition("t0", 1), Topition("t1", 0), Topition("t1", 2)))
  }

  test("range: per-topic consecutive ranges, low members get extras") {
    val a = Assignors.range(
      subs("c0" -> Seq("t0", "t1"), "c1" -> Seq("t0", "t1")),
      Map("t0" -> 3, "t1" -> 3))
    // per topic: c0 gets [0,1], c1 gets [2] (consecutive, c0 the extra)
    assert(a("c0") === Seq(Topition("t0", 0), Topition("t0", 1),
      Topition("t1", 0), Topition("t1", 1)))
    assert(a("c1") === Seq(Topition("t0", 2), Topition("t1", 2)))
  }

  test("cooperative-sticky keeps owned partitions within budget") {
    val s = subs("c0" -> Seq("t0"), "c1" -> Seq("t0"))
    val owned = Map(
      "c0" -> Seq(Topition("t0", 2)), // c0 currently owns p2
      "c1" -> Seq(Topition("t0", 0), Topition("t0", 1)))
    val a = Assignors.cooperativeSticky(s, Map("t0" -> 3), owned)
    // every owned partition stays with its owner (budgets allow: 2/1 split)
    assert(a("c0").contains(Topition("t0", 2)))
    assert(a.values.flatten.toSeq.sorted ===
      Seq(Topition("t0", 0), Topition("t0", 1), Topition("t0", 2)))
  }

  // ---- properties (all assignors)

  private val genCase = for {
    nMembers <- Gen.choose(1, 6)
    nTopics <- Gen.choose(1, 4)
    parts <- Gen.listOfN(nTopics, Gen.choose(1, 8))
    topics = (0 until nTopics).map(i => s"t$i")
    meta = topics.zip(parts).toMap
    memberSubs <- Gen.listOfN(nMembers, Gen.someOf(topics).map(_.toSet))
  } yield (
    (0 until nMembers).map(i => s"m$i").zip(memberSubs).toMap: Assignors.Subscriptions,
    meta: Assignors.TopicMeta)

  private def checkPartition(name: String,
                             f: (Assignors.Subscriptions, Assignors.TopicMeta) => Assignors.Assignment): Unit =
    test(s"$name: assignment is a partition of the subscribed universe") {
      forAllGen(genCase) { case (s, meta) =>
        val a = f(s, meta)
        val assigned = a.values.flatten.toSeq
        // no duplicates
        assert(assigned.distinct.size === assigned.size)
        // only subscribed topics per member
        a.foreach { case (m, tps) =>
          assert(tps.forall(tp => s(m).contains(tp.topic)))
        }
        // every partition of a topic someone subscribes to is assigned
        val covered = meta.flatMap { case (t, n) =>
          if (s.values.exists(_.contains(t))) (0 until n).map(Topition(t, _))
          else Seq.empty
        }.toSet
        assert(assigned.toSet === covered)
      }
    }

  checkPartition("range", Assignors.range)
  checkPartition("roundrobin", Assignors.roundRobin)
  checkPartition("uniform", Assignors.uniform)
  checkPartition("cooperative-sticky(empty owned)",
    (s, m) => Assignors.cooperativeSticky(s, m, Map.empty))

  test("roundrobin balance: same-subscription members differ by at most 1") {
    forAllGen(genCase) { case (s, meta) =>
      val uniform = s.values.toSet.size == 1
      if (uniform && s.nonEmpty) {
        val a = Assignors.roundRobin(s, meta)
        val sizes = a.values.map(_.size)
        assert(sizes.max - sizes.min <= 1)
      }
    }
  }

  test("cooperative-sticky is a fixpoint: reassigning own output moves nothing") {
    forAllGen(genCase) { case (s, meta) =>
      val first = Assignors.cooperativeSticky(s, meta, Map.empty)
      val second = Assignors.cooperativeSticky(s, meta, first)
      assert(second === first)
    }
  }
}
