package graft.coordinator

import scala.collection.concurrent.TrieMap
import graft.storage.Storage

/** Consumer-group rebalance state machine (T11), the Spark-side analog of
  * the reference's coordinator
  * (`nisshi-broker/src/coordinator/group/administrator.rs:140,562-700,
  * 1420,1439`): Forming → Formed with generation bumps, member admission,
  * leader-computed assignments distributed on sync, heartbeat expiry, and
  * CAS-guarded persistence so multiple stateless coordinators can share
  * one storage.
  */
final class GroupCoordinator(storage: Storage,
                             sessionTimeoutMs: Long = 30000,
                             clock: () => Long = () => System.currentTimeMillis()) {

  sealed trait State
  case object Forming extends State
  case object Formed extends State

  final case class Member(memberId: String, topics: Set[String],
                          lastHeartbeat: Long)
  final case class Group(state: State, generation: Int, leader: Option[String],
                         members: Map[String, Member], protocol: String,
                         assignment: Assignors.Assignment, version: Long)

  private val groups = TrieMap.empty[String, Group]
  private val memberSeq = new java.util.concurrent.atomic.AtomicLong()

  /** JoinGroup (administrator.rs:562-614): admit the member, bump the
    * generation, move to Forming. First joiner becomes leader. Returns
    * (memberId, generation, isLeader).
    */
  def join(groupId: String, memberId: Option[String], topics: Set[String],
           protocol: String = "range"): (String, Int, Boolean) = synchronized {
    val id = memberId.getOrElse(s"member-${memberSeq.incrementAndGet()}")
    val g = groups.getOrElse(groupId,
      Group(Forming, 0, None, Map.empty, protocol, Map.empty, -1L))
    val member = Member(id, topics, clock())
    val leader = g.leader.orElse(Some(id))
    val next = g.copy(
      state = Forming,
      generation = g.generation + 1,
      leader = leader,
      members = g.members + (id -> member),
      protocol = protocol,
      assignment = Map.empty)
    persist(groupId, next)
    (id, next.generation, leader.contains(id))
  }

  /** SyncGroup (administrator.rs:615-660): the leader computes assignments
    * with the negotiated assignor; everyone else fetches theirs. Moves the
    * group to Formed.
    */
  def sync(groupId: String, memberId: String, generation: Int,
           topicMeta: Assignors.TopicMeta): Either[String, Seq[Assignors.Topition]] =
    synchronized {
      val g = groups.getOrElse(groupId, return Left("UNKNOWN_GROUP"))
      if (generation != g.generation) return Left("ILLEGAL_GENERATION")
      if (!g.members.contains(memberId)) return Left("UNKNOWN_MEMBER_ID")
      val formed = if (g.state == Forming && g.leader.contains(memberId)) {
        val subs: Assignors.Subscriptions =
          g.members.map { case (m, v) => m -> v.topics }
        val assignment = g.protocol match {
          case "roundrobin" => Assignors.roundRobin(subs, topicMeta)
          case "uniform" => Assignors.uniform(subs, topicMeta)
          case "cooperative-sticky" =>
            Assignors.cooperativeSticky(subs, topicMeta, g.assignment)
          case _ => Assignors.range(subs, topicMeta)
        }
        val next = g.copy(state = Formed, assignment = assignment)
        persist(groupId, next)
        next
      } else g
      if (formed.state != Formed) Left("REBALANCE_IN_PROGRESS")
      else Right(formed.assignment.getOrElse(memberId, Seq.empty))
    }

  /** Heartbeat: refresh liveness; error if a rebalance is pending. */
  def heartbeat(groupId: String, memberId: String, generation: Int): Either[String, Unit] =
    synchronized {
      val g = groups.getOrElse(groupId, return Left("UNKNOWN_GROUP"))
      if (!g.members.contains(memberId)) return Left("UNKNOWN_MEMBER_ID")
      if (generation != g.generation) return Left("REBALANCE_IN_PROGRESS")
      val m = g.members(memberId).copy(lastHeartbeat = clock())
      groups.put(groupId, g.copy(members = g.members + (memberId -> m)))
      Right(())
    }

  /** LeaveGroup (administrator.rs:661-700): drop the member, re-Form. */
  def leave(groupId: String, memberId: String): Unit = synchronized {
    groups.get(groupId).foreach { g =>
      val remaining = g.members - memberId
      val next = g.copy(
        state = if (remaining.isEmpty) Forming else Forming,
        generation = g.generation + 1,
        leader = if (g.leader.contains(memberId)) remaining.keys.toSeq.sorted.headOption
                 else g.leader,
        members = remaining,
        assignment = Map.empty)
      persist(groupId, next)
    }
  }

  /** Expire members whose heartbeat lapsed (maintenance tick). */
  def expireMembers(): Unit = synchronized {
    val now = clock()
    groups.keys.toSeq.foreach { gid =>
      groups.get(gid).foreach { g =>
        val dead = g.members.values
          .filter(m => now - m.lastHeartbeat > sessionTimeoutMs).map(_.memberId)
        dead.foreach(leave(gid, _))
      }
    }
  }

  def describe(groupId: String): Option[(String, Int, Int)] =
    groups.get(groupId).map(g =>
      (g.state.toString, g.generation, g.members.size))

  def leaderOf(groupId: String): Option[String] =
    groups.get(groupId).flatMap(_.leader)

  /** Member roster with subscriptions (member-id sorted) — the wire
    * facade's JoinGroup response echoes this to the leader.
    */
  def membersOf(groupId: String): Seq[(String, Set[String])] =
    groups.get(groupId).toSeq.flatMap(_.members.toSeq.sortBy(_._1)
      .map { case (m, v) => m -> v.topics })

  /** Persist through the Storage CAS (stateless-broker safety: a stale
    * coordinator's write loses and it refetches).
    */
  private def persist(groupId: String, g: Group): Unit = {
    val serialized = s"${g.state}:${g.generation}:${g.members.size}"
    storage.updateGroup(groupId, serialized, g.version) match {
      case Some(v) => groups.put(groupId, g.copy(version = v))
      case None =>
        val fresh = storage.groupState(groupId).map(_._2).getOrElse(-1L)
        storage.updateGroup(groupId, serialized, fresh)
          .foreach(v => groups.put(groupId, g.copy(version = v)))
    }
  }
}
