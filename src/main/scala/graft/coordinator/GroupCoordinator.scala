package graft.coordinator

import scala.collection.concurrent.TrieMap
import com.fasterxml.jackson.databind.ObjectMapper
import graft.storage.Storage

/** Consumer-group rebalance state machine (T11), the Spark-side analog of
  * the reference's coordinator
  * (`nisshi-broker/src/coordinator/group/administrator.rs:140,562-700,
  * 1420,1439`): Forming → Formed with generation bumps, member admission,
  * leader-computed assignments distributed on sync, heartbeat expiry, and
  * CAS-guarded persistence so multiple stateless coordinators can share
  * one storage.
  *
  * The FULL group state — roster, subscriptions, assignment, generation,
  * protocol — is serialized to storage on every transition
  * (reference `lib.rs:867,1472-1478` persists `GroupDetail` by CAS), so a
  * second stateless coordinator over the same storage can serve
  * Heartbeat/SyncGroup for a group formed by the first. A lost CAS means
  * another coordinator moved the group: the local cache is dropped and the
  * caller is told to rejoin (REBALANCE_IN_PROGRESS).
  *
  * Rebalance barrier: a join against a stable (Formed) group opens ONE
  * rebalance cohort — the generation bumps once, and every member joining
  * while the group is still Forming is admitted into that same
  * generation. (Per-join bumps would livelock two concurrent joiners:
  * each join invalidates the other's generation, reference JoinGroup v0
  * blocks the whole cohort for exactly this reason.)
  */
final class GroupCoordinator(storage: Storage,
                             defaultSessionTimeoutMs: Long = 30000,
                             clock: () => Long = () => System.currentTimeMillis()) {

  sealed trait State
  case object Forming extends State
  case object Formed extends State

  final case class Member(memberId: String, topics: Set[String],
                          lastHeartbeat: Long)
  final case class Group(state: State, generation: Int, leader: Option[String],
                         members: Map[String, Member], protocol: String,
                         assignment: Assignors.Assignment, version: Long,
                         sessionTimeoutMs: Long)

  private val groups = TrieMap.empty[String, Group]
  private val memberSeq = new java.util.concurrent.atomic.AtomicLong()
  // distinguishes ids minted by different stateless coordinators sharing
  // one storage — two coordinators must never hand out the same memberId
  private val instanceTag =
    java.util.UUID.randomUUID().toString.substring(0, 8)
  private val mapper = new ObjectMapper()

  /** Local cache validated against the persisted version: when another
    * stateless coordinator has moved the group (version advanced), the
    * cache is refreshed before serving — reads are never stale, and a
    * coordinator that has never seen the group (takeover) loads it here.
    * In steady state (this coordinator did the last write) the version
    * matches and no reload happens.
    */
  private def current(groupId: String): Option[Group] = {
    val cached = groups.get(groupId)
    val storedVersion = storage.groupState(groupId).map(_._2)
    (cached, storedVersion) match {
      case (Some(g), Some(v)) if g.version == v => Some(g)
      case (_, Some(v)) =>
        val loaded = loadGroup(groupId)
        loaded.foreach(groups.put(groupId, _))
        // stored state exists but doesn't parse (torn write, version
        // skew): surface an EMPTY group carrying the STORED version so
        // the next update CAS-overwrites it — returning None here made
        // join() build version -1, lose every CAS against the stored
        // version, and brick the group forever
        loaded.orElse(Some(Group(Forming, 0, None, Map.empty, "range",
          Map.empty, v, defaultSessionTimeoutMs)))
      case (Some(_), None) => groups.remove(groupId); None // deleted elsewhere
      case (None, None) => None
    }
  }

  /** Pick the protocol a joiner should offer from its preference-ordered
    * list: the group's established protocol when the joiner supports it
    * (Kafka negotiates the most-preferred protocol common to ALL
    * members — a client listing [cooperative-sticky, range] must join a
    * range group via range, not be rejected), otherwise the joiner's
    * own head (a genuine mismatch still fails join()'s check).
    */
  def negotiate(groupId: String, offered: Seq[String]): String = {
    val prefs = if (offered.nonEmpty) offered else Seq("range")
    current(groupId) match {
      case Some(g) if g.members.nonEmpty =>
        prefs.find(_ == g.protocol).getOrElse(prefs.head)
      case _ => prefs.head
    }
  }

  /** JoinGroup (administrator.rs:562-614): admit the member into the
    * current rebalance cohort. A join against a stable group opens a new
    * cohort (one generation bump); joins while Forming share it. First
    * joiner (or surviving leader) leads. Returns
    * (memberId, generation, isLeader).
    */
  def join(groupId: String, memberId: Option[String], topics: Set[String],
           protocol: String = "range",
           sessionTimeoutMs: Long = -1L): (String, Int, Boolean) = synchronized {
    val id = memberId.getOrElse(
      s"member-$instanceTag-${memberSeq.incrementAndGet()}")
    // a lost CAS means another coordinator admitted someone concurrently;
    // the admission MUST be retried against the winner's state — the
    // returned memberId/generation are only valid once they are in the
    // persisted roster
    var attempt = 0
    while (attempt < 32) {
      val g = current(groupId).getOrElse(
        Group(Forming, 0, None, Map.empty, protocol, Map.empty, -1L,
          if (sessionTimeoutMs > 0) sessionTimeoutMs else defaultSessionTimeoutMs))
      // a joiner may not silently switch the assignor under the other
      // members' feet — Kafka rejects with INCONSISTENT_GROUP_PROTOCOL
      if ((g.members.keySet - id).nonEmpty && g.protocol != protocol)
        throw new GroupCoordinator.InconsistentGroupProtocol(
          s"group $groupId negotiated ${g.protocol}, joiner offered $protocol")
      val member = Member(id, topics, clock())
      // one bump per cohort, not per joiner
      val generation =
        if (g.state == Formed || g.members.isEmpty) g.generation + 1
        else g.generation
      val leader = g.leader.filter(g.members.contains).orElse(Some(id))
      val next = g.copy(
        state = Forming,
        generation = generation,
        leader = leader,
        members = g.members + (id -> member),
        protocol = protocol,
        assignment = Map.empty,
        sessionTimeoutMs =
          if (sessionTimeoutMs > 0) sessionTimeoutMs else g.sessionTimeoutMs)
      if (persistOrReload(groupId, next))
        return (id, generation, leader.contains(id))
      attempt += 1
    }
    throw new IllegalStateException(s"join($groupId): persistent CAS contention")
  }

  /** SyncGroup (administrator.rs:615-660): the leader computes assignments
    * with the negotiated assignor; everyone else fetches theirs. Moves the
    * group to Formed.
    */
  def sync(groupId: String, memberId: String, generation: Int,
           topicMeta: Assignors.TopicMeta): Either[String, Seq[Assignors.Topition]] =
    synchronized {
      val g = current(groupId).getOrElse(return Left("UNKNOWN_GROUP"))
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
        if (!persistOrReload(groupId, next))
          return Left("REBALANCE_IN_PROGRESS") // lost CAS: group moved on
        next
      } else g
      if (formed.state != Formed) Left("REBALANCE_IN_PROGRESS")
      else Right(formed.assignment.getOrElse(memberId, Seq.empty))
    }

  /** Heartbeat: refresh liveness; error if a rebalance is pending.
    * Liveness is per-coordinator soft state — not persisted (as in Kafka).
    */
  def heartbeat(groupId: String, memberId: String, generation: Int): Either[String, Unit] =
    synchronized {
      val g = current(groupId).getOrElse(return Left("UNKNOWN_GROUP"))
      if (!g.members.contains(memberId)) return Left("UNKNOWN_MEMBER_ID")
      if (generation != g.generation) return Left("REBALANCE_IN_PROGRESS")
      val m = g.members(memberId).copy(lastHeartbeat = clock())
      groups.put(groupId, g.copy(members = g.members + (memberId -> m)))
      Right(())
    }

  /** LeaveGroup (administrator.rs:661-700): drop the member, open a new
    * rebalance cohort for the survivors. Unknown group/member is a real
    * error — clients use it to detect zombie sessions.
    */
  def leave(groupId: String, memberId: String): Either[String, Unit] = synchronized {
    var attempt = 0
    while (attempt < 32) {
      val g = current(groupId).getOrElse(return Left("UNKNOWN_GROUP"))
      if (!g.members.contains(memberId)) return Left("UNKNOWN_MEMBER_ID")
      val remaining = g.members - memberId
      val next = g.copy(
        state = Forming,
        generation = g.generation + 1,
        leader = if (g.leader.contains(memberId)) remaining.keys.toSeq.sorted.headOption
                 else g.leader,
        members = remaining,
        assignment = Map.empty)
      if (persistOrReload(groupId, next)) return Right(())
      attempt += 1 // lost CAS: reload the winner's state and re-apply
    }
    Left("REBALANCE_IN_PROGRESS")
  }

  /** Expire members whose heartbeat lapsed (maintenance tick), honouring
    * each group's negotiated session timeout.
    */
  def expireMembers(): Unit = synchronized {
    val now = clock()
    groups.keys.toSeq.foreach { gid =>
      groups.get(gid).foreach { g =>
        val dead = g.members.values
          .filter(m => now - m.lastHeartbeat > g.sessionTimeoutMs).map(_.memberId)
        dead.foreach(leave(gid, _))
      }
    }
  }

  def describe(groupId: String): Option[(String, Int, Int)] =
    current(groupId).map(g =>
      (g.state.toString, g.generation, g.members.size))

  def leaderOf(groupId: String): Option[String] =
    current(groupId).flatMap(_.leader)

  /** The group's negotiated assignor protocol (DescribeGroups echo). */
  def protocolOf(groupId: String): Option[String] =
    current(groupId).map(_.protocol)

  /** Group ids known to this coordinator (cached or not yet expired). */
  def listGroups(): Seq[String] = groups.keys.toSeq.sorted

  /** Member roster with subscriptions (member-id sorted) — the wire
    * facade's JoinGroup response echoes this to the leader.
    */
  def membersOf(groupId: String): Seq[(String, Set[String])] =
    current(groupId).toSeq.flatMap(_.members.toSeq.sortBy(_._1)
      .map { case (m, v) => m -> v.topics })

  /** Current assignment per member (for DescribeGroups). */
  def assignmentOf(groupId: String): Assignors.Assignment =
    current(groupId).map(_.assignment).getOrElse(Map.empty)

  /** Any live member present — guards DeleteGroups and offset expiry. */
  def hasMembers(groupId: String): Boolean =
    current(groupId).exists(_.members.nonEmpty)

  /** Union of live-member subscriptions (the OffsetDelete guard: offsets
    * of a topic the group still consumes must not be deleted).
    */
  def subscribedTopics(groupId: String): Set[String] =
    current(groupId).toSet.flatMap((g: Group) =>
      g.members.values.flatMap(_.topics).toSet)

  /** Persist through the Storage CAS. Returns false when the CAS is lost —
    * another stateless coordinator moved the group; the local cache is
    * invalidated so the next touch reloads the winner's state.
    */
  private def persistOrReload(groupId: String, g: Group): Boolean =
    storage.updateGroup(groupId, serialize(g), g.version) match {
      case Some(v) => groups.put(groupId, g.copy(version = v)); true
      case None => groups.remove(groupId); false
    }

  // ------------------------------------------------------- state ser/de

  private def serialize(g: Group): String = {
    val root = mapper.createObjectNode()
    root.put("state", g.state.toString)
    root.put("generation", g.generation)
    g.leader.foreach(root.put("leader", _))
    root.put("protocol", g.protocol)
    root.put("sessionTimeoutMs", g.sessionTimeoutMs)
    val ms = root.putArray("members")
    g.members.toSeq.sortBy(_._1).foreach { case (id, m) =>
      val o = ms.addObject()
      o.put("id", id)
      val ts = o.putArray("topics")
      m.topics.toSeq.sorted.foreach(ts.add)
    }
    val as = root.putArray("assignment")
    g.assignment.toSeq.sortBy(_._1).foreach { case (id, tps) =>
      val o = as.addObject()
      o.put("id", id)
      val arr = o.putArray("tps")
      tps.foreach { tp =>
        val t = arr.addObject()
        t.put("t", tp.topic)
        t.put("p", tp.partition)
        ()
      }
    }
    mapper.writeValueAsString(root)
  }

  private def loadGroup(groupId: String): Option[Group] =
    storage.groupState(groupId).flatMap { case (json, version) =>
      try {
        import scala.jdk.CollectionConverters._
        val root = mapper.readTree(json)
        if (root == null || !root.has("generation")) None
        else {
          val now = clock() // fresh grace window on takeover, not instant expiry
          val members = root.path("members").elements().asScala.map { m =>
            val id = m.path("id").asText()
            val topics = m.path("topics").elements().asScala.map(_.asText()).toSet
            id -> Member(id, topics, now)
          }.toMap
          val assignment: Assignors.Assignment =
            root.path("assignment").elements().asScala.map { a =>
              a.path("id").asText() -> a.path("tps").elements().asScala.map { t =>
                Assignors.Topition(t.path("t").asText(), t.path("p").asInt())
              }.toSeq
            }.toMap
          Some(Group(
            state = if (root.path("state").asText() == "Formed") Formed else Forming,
            generation = root.path("generation").asInt(),
            leader = Option(root.get("leader")).map(_.asText()),
            members = members,
            protocol = root.path("protocol").asText("range"),
            assignment = assignment,
            version = version,
            sessionTimeoutMs =
              root.path("sessionTimeoutMs").asLong(defaultSessionTimeoutMs)))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
}

object GroupCoordinator {
  /** Joiner offered an assignor the group did not negotiate — maps to
    * Kafka error 23 (INCONSISTENT_GROUP_PROTOCOL) at the wire facade.
    */
  final class InconsistentGroupProtocol(msg: String)
      extends RuntimeException(msg)
}
