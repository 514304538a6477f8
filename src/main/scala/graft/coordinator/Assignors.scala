package graft.coordinator

import scala.collection.immutable.SortedSet

/** Consumer-group partition assignors — pure, deterministic functions over
  * sorted (topic, partition) universes.
  *
  * Semantics from the reference's spec (`plan.md:22-90`) and
  * `nisshi-sans-io/src/consumer/assignor/range.rs`:
  *  - members are processed in member-id sort order
  *  - the topition universe is sorted by (topic, partition) (the
  *    `BTreeSet<Topition>` iteration order)
  *  - range: per-topic consecutive ranges, low-sorted members get the
  *    remainder (the reference notes its own cross-topic collapse bug and
  *    the correct per-topic semantics — implemented correctly here)
  *  - roundRobin: global interleave, skipping members not subscribed
  *  - uniform / cooperativeSticky: round-robin targets; sticky keeps
  *    currently-owned partitions that remain in the member's target share
  *    budget (KIP-429: nothing is revoked unless it must move)
  */
object Assignors {

  final case class Topition(topic: String, partition: Int)
  object Topition {
    implicit val ordering: Ordering[Topition] =
      Ordering.by(tp => (tp.topic, tp.partition))
  }

  /** memberId -> subscribed topics. */
  type Subscriptions = Map[String, Set[String]]
  /** topic -> partition count. */
  type TopicMeta = Map[String, Int]
  type Assignment = Map[String, Seq[Topition]]

  private def sortedMembers(subs: Subscriptions): Seq[String] =
    subs.keys.toSeq.sorted

  private def universe(meta: TopicMeta): SortedSet[Topition] =
    SortedSet.empty[Topition] ++ meta.flatMap { case (t, n) =>
      (0 until n).map(Topition(t, _))
    }

  /** Range: per topic, consecutive blocks; first (numPartitions mod
    * numMembers) subscribed members get one extra.
    */
  def range(subs: Subscriptions, meta: TopicMeta): Assignment = {
    val out = scala.collection.mutable.Map.empty[String, Vector[Topition]]
      .withDefaultValue(Vector.empty)
    meta.toSeq.sortBy(_._1).foreach { case (topic, n) =>
      val subscribed = sortedMembers(subs).filter(m => subs(m).contains(topic))
      if (subscribed.nonEmpty) {
        val per = n / subscribed.size
        val extra = n % subscribed.size
        var next = 0
        subscribed.zipWithIndex.foreach { case (m, i) =>
          val take = per + (if (i < extra) 1 else 0)
          out(m) = out(m) ++ (next until next + take).map(Topition(topic, _))
          next += take
        }
      }
    }
    sortedMembers(subs).map(m => m -> out(m).toSeq).toMap
  }

  /** RoundRobin: iterate the sorted universe, assign each topition to the
    * next member in rotation that subscribes to its topic (skip logic per
    * `plan.md:56-60`).
    */
  def roundRobin(subs: Subscriptions, meta: TopicMeta): Assignment = {
    val members = sortedMembers(subs)
    val out = scala.collection.mutable.Map.empty[String, Vector[Topition]]
      .withDefaultValue(Vector.empty)
    var cursor = 0
    universe(meta).foreach { tp =>
      // advance to the next subscribed member (bounded by member count)
      var tries = 0
      while (tries < members.size &&
             !subs(members(cursor % members.size)).contains(tp.topic)) {
        cursor += 1; tries += 1
      }
      if (tries < members.size) {
        val m = members(cursor % members.size)
        out(m) = out(m) :+ tp
        cursor += 1
      }
    }
    members.map(m => m -> out(m).toSeq).toMap
  }

  /** Uniform: round-robin for initial assignment (`plan.md:66-73`). */
  def uniform(subs: Subscriptions, meta: TopicMeta): Assignment =
    roundRobin(subs, meta)

  /** CooperativeSticky (KIP-429 flavor): keep owned partitions still valid
    * for their owner up to the owner's target-share budget; distribute the
    * rest round-robin over members with spare capacity. Never assigns a
    * partition to two members; revocations happen by omission (the
    * broker's two-phase rebalance hands them out next round).
    */
  def cooperativeSticky(subs: Subscriptions, meta: TopicMeta,
                        owned: Assignment): Assignment = {
    val members = sortedMembers(subs)
    val all = universe(meta)
    val target = roundRobin(subs, meta)
    val budget: Map[String, Int] = target.map { case (m, tps) => m -> tps.size }
    // phase 1: stickiness — keep valid owned partitions within budget
    val kept = scala.collection.mutable.Map.empty[String, Vector[Topition]]
      .withDefaultValue(Vector.empty)
    val taken = scala.collection.mutable.Set.empty[Topition]
    members.foreach { m =>
      val ours = owned.getOrElse(m, Seq.empty)
        // a partition already kept by an earlier member never sticks
        // twice — a crash-recovered or merged `owned` map can list the
        // same partition under two members, and double-assignment means
        // duplicate consumption
        .filter(tp => all.contains(tp) && subs(m).contains(tp.topic) &&
          !taken.contains(tp))
        .take(budget.getOrElse(m, 0))
      kept(m) = ours.toVector
      taken ++= ours
    }
    // phase 2: fill remaining capacity round-robin over unassigned topitions
    var cursor = 0
    (all -- taken).foreach { tp =>
      var tries = 0
      var placed = false
      while (!placed && tries < members.size) {
        val m = members(cursor % members.size)
        if (subs(m).contains(tp.topic) && kept(m).size < budget.getOrElse(m, 0)) {
          kept(m) = kept(m) :+ tp
          placed = true
        }
        cursor += 1; tries += 1
      }
      // overflow (budget rounding): give to any subscribed member
      if (!placed) members.find(m => subs(m).contains(tp.topic)).foreach { m =>
        kept(m) = kept(m) :+ tp
      }
    }
    members.map(m => m -> kept(m).sorted.toSeq).toMap
  }
}
