package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, Similarity, TextAnalysis}

class OpsSpec extends SparkSpec with PropSupport {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents").cache()

  test("shingles: short docs produce empty arrays, not reversed sequences") {
    val df = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).isEmpty)
    assert(out(2L) === Seq("a b c", "b c d"))
  }

  test("exactGroups: all docs distinct => every group size 1") {
    val g = Dedup.exactGroups(docs)
    assert(g.count() === docs.count())
    assert(g.filter(col("n_copies") > 1).count() === 0)
  }

  test("exactGroups: duplicated content collapses to one group") {
    val dup = docs.limit(5).union(docs.limit(5).withColumn("doc_id", col("doc_id") + 1000))
    val g = Dedup.exactGroups(dup)
    assert(g.count() === 5)
    assert(g.filter(col("n_copies") === 2).count() === 5)
    // canonical is the min id (the original, not the +1000 copy)
    assert(g.filter(col("canonical_id") >= 1000).count() === 0)
  }

  test("minhash LSH finds the planted near-duplicate") {
    // plant a near-dup: copy doc 0 with one word changed
    val base = docs.filter(col("doc_id") === 0)
    val nearDup = base.withColumn("doc_id", lit(9999L))
      .withColumn("text", concat(col("text"), lit(" extra")))
    val sig = Dedup.minhashSignatures(docs.union(nearDup), 8, 3)
    val pairs = Dedup.lshCandidatePairs(sig, 8, 2)
    assert(pairs.filter(col("doc_a") === 0 && col("doc_b") === 9999).count() === 1)
  }

  test("simhash of identical docs is identical; hamming 0") {
    val two = docs.limit(1).union(docs.limit(1).withColumn("doc_id", lit(777L)))
    val sk = Dedup.simhash(two)
    val pairs = Dedup.simhashPairs(sk, maxHamming = 0)
    assert(pairs.count() === 1)
    assert(pairs.head().getAs[Long]("hamming") === 0L)
  }

  test("cosine: vector with itself is 1.0; top-k is ordered desc") {
    val e = Tables.load(spark, sf, "embeddings")
    val self = e.select(Similarity.cosineQ(
      Similarity.quantize(col("embedding")),
      Similarity.quantize(col("embedding"))).as("c"))
    assert(self.agg(min("c"), max("c")).head().toSeq
      .forall(v => math.abs(v.asInstanceOf[Double] - 1.0) < 1e-12))
    val top = Similarity.cosineTopK(e, 0L, 10).collect().map(_.getAs[Double]("cosine_r"))
    assert(top.sameElements(top.sorted.reverse))
  }

  test("annBucketed results are a subset of brute-force candidates' cell") {
    val e = Tables.load(spark, sf, "embeddings")
    val ann = Similarity.annBucketed(e, 0L, 5, 3)
    val cells = ann.select("cell").distinct().collect()
    assert(cells.length === 1) // all hits in the query's cell
  }

  test("annIvfTrained: full probing equals brute force; partial probing prunes") {
    val e = Tables.load(spark, sf, "embeddings").cache()
    val brute = Similarity.cosineTopK(e, 0L, 10)
      .select("vec_id").as[Long].collect().toSet

    // nProbe = nCells: every cell scanned → EXACTLY the brute-force
    // top-k (the IVF correctness invariant, independent of clustering)
    val full = Similarity.annIvfTrained(e, 0L, 10, nCells = 8, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(full === brute)

    // partial probing: results come only from probed cells, and the
    // probed region is a strict subset of the corpus (the pruning that
    // pays at scale); recall stays useful even on uniform vectors
    val part = Similarity.annIvfTrained(e, 0L, 10, nCells = 8, nProbe = 3)
    val partIds = part.select("vec_id").as[Long].collect().toSet
    val probedCells = part.select("cell").distinct().as[Int].collect().toSet
    assert(probedCells.size <= 3)
    val recall = (partIds & brute).size / 10.0
    assert(recall >= 0.3, s"recall $recall")
    e.unpersist()
    ()
  }

  test("knnJoinBucketed at bits=0 equals the exact knnJoin; bits>0 stays in-cell") {
    val e = Tables.load(spark, sf, "embeddings").cache()
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Int]("rn"))).toSet
    val exact = Similarity.knnJoin(q, e, k = 3)
    assert(rows(Similarity.knnJoinBucketed(q, e, k = 3, bits = 0)) ===
      rows(exact), "one cell must degenerate to exact search")
    // every query really got k neighbors, ranked 1..k
    val perQuery = exact.groupBy("q_id")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions.max("rn").as("mx"))
      .collect()
    assert(perQuery.length === 4)
    assert(perQuery.forall(r => r.getAs[Long]("n") == 3 && r.getAs[Int]("mx") == 3))
    // bucketed candidates: each query's hits share ITS cell — verify
    // against the exact ranks: bucketed results are a subset of the
    // same-cell corpus, so cosine order within them matches exact order
    val bucketed = Similarity.knnJoinBucketed(q, e, k = 3, bits = 3)
    val cos = bucketed.collect().map(r => (r.getAs[Long]("q_id"),
      r.getAs[Int]("rn"), r.getAs[Double]("cosine_r")))
    cos.groupBy(_._1).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_._2).map(_._3)
      assert(byRank.sameElements(byRank.sorted.reverse),
        "ranks must be cosine-descending within each query")
    }
    e.unpersist()
    ()
  }

  test("interpolated LM at lambda=1e6 IS the plain bigram LM; report and reservoir invariants hold") {
    val d = Tables.load(spark, sf, "documents").cache()
    import graft.ops.{Curation, TextAnalysis}
    // lambda=1 degenerates to the pure conditional — the two scorers
    // must agree doc for doc (pins the mix arithmetic)
    def scores(df: org.apache.spark.sql.DataFrame, c: String) =
      df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long](c)).toMap
    val plain = scores(TextAnalysis.lmScore(d), "lm_score_e6")
    val atOne = scores(TextAnalysis.lmScoreInterpolated(d, lambdaE6 = 1000000L),
      "lm_i_score_e6")
    assert(atOne === plain)
    // the interpolated score is a convex mix: bounded by 1e6
    val mixed = scores(TextAnalysis.lmScoreInterpolated(d), "lm_i_score_e6")
    assert(mixed.values.forall(v => v >= 0 && v <= 1000000L))
    // source report: doc counts partition the corpus; ratios stay in range
    val rep = TextAnalysis.sourceReport(d).collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum === d.count())
    assert(rep.forall { r =>
      val dr = r.getAs[Long]("dup_ratio_e6")
      val mq = r.getAs[Long]("mean_quality_e2")
      dr >= 0 && dr <= 1000000L && mq >= 0 && mq <= 400L
    })
    // reservoir: k rows, rerun-stable, salt-sensitive, and MERGEABLE —
    // re-ranking the union of per-source samples equals the corpus sample
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getAs[Long]("doc_id")).toSet
    val s1 = Curation.reservoirSample(d, 50, "s")
    assert(s1.count() === 50L)
    assert(ids(s1) === ids(Curation.reservoirSample(d, 50, "s")))
    assert(ids(s1) !== ids(Curation.reservoirSample(d, 50, "other-salt")))
    val perSource = d.select("source").distinct().collect()
      .map(_.getString(0))
      .map(src => Curation.reservoirSample(d.filter(col("source") === src), 50, "s"))
      .reduce(_ unionByName _)
    assert(ids(Curation.reservoirSample(perSource, 50, "s")) === ids(s1),
      "bottom-k merge: union of shard samples re-ranked == corpus sample")
    d.unpersist()
    ()
  }

  test("trained lang-id separates crafted languages; alien docs report und") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    // three crafted "languages" with disjoint character inventories —
    // the separation the synthetic corpus (label-independent text)
    // cannot show
    val train = Seq(
      (1L, "aa", "aba bab abb aba bab"),
      (2L, "aa", "bab aba abb bab aba"),
      (3L, "bb", "cdc dcd dcc cdc dcd"),
      (4L, "bb", "dcd cdc dcc dcd cdc"),
      (5L, "cc", "efe fef eff efe fef"),
      (6L, "cc", "fef efe eff fef efe")).toDF("doc_id", "lang", "text")
    val held = Seq(
      (11L, "aba abb bab"), (12L, "cdc dcc dcd"), (13L, "efe eff fef"),
      (14L, "zzz zzz zzz"), (15L, "x")).toDF("doc_id", "text")
    val prof = TextAnalysis.langProfiles(train, topN = 16)
    val preds = TextAnalysis.classifyByProfile(held, prof, topN = 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds === Map(11L -> "aa", 12L -> "bb", 13L -> "cc",
      14L -> "und", 15L -> "und"), s"got $preds")
  }

  test("subword-regularization sampling: reproducible, degenerate at high alpha, covering") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    // costs at the REAL e6 scale (-ln p · 1e6, i.e. millions): alpha
    // multiplies (cost_e6 / 1e6), so toy-scale costs would make every
    // alpha look uniform
    val vocab = Seq(("ab", 1L, 10000000L), ("a", 1L, 10000000L),
      ("b", 1L, 10000000L), ("abc", 1L, 25000000L), ("c", 1L, 10000000L),
      ("bc", 1L, 15000000L))
    val docs = Seq((1L, "abc ab abc"), (2L, "abc xyz")).toDF("doc_id", "text")
    def run(alpha: Double, salt: String): Map[Long, Seq[String]] =
      TextAnalysis.unigramSampleEncode(docs, vocab, alpha, salt)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // coverage: pieces concatenate back to the tokens, any alpha/salt
    val s1 = run(0.2, "e0")
    assert(s1(1L).mkString("") === "abcababc")
    assert(s1(2L).mkString("") === "abcxyz")
    // deterministic: same salt, same draw
    assert(s1 === run(0.2, "e0"))
    // near-argmax alpha degenerates to the 1-best segmentation
    val hard = run(1000.0, "e0")
    val best = TextAnalysis.unigramEncode(docs, vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(hard === best, s"high alpha must pick rank 0: $hard vs $best")
    // near-uniform alpha: across a few epochs (salts) at least one
    // draw differs from the 1-best — the augmentation actually varies
    val varied = (0 until 8).exists(i => run(0.01, s"e$i") != best)
    assert(varied, "sampling never left the 1-best across 8 salts")
    // per-OCCURRENCE draws: a doc repeating one word can segment its
    // occurrences differently within one epoch (near-uniform alpha)
    val rep = Seq((1L, Seq.fill(12)("abc").mkString(" "))).toDF("doc_id", "text")
    val drew = (0 until 4).exists { i =>
      val ps = TextAnalysis.unigramSampleEncode(rep, vocab, 0.01, s"r$i")
        .head().getSeq[String](1)
      // a per-TYPE draw would tile one segmentation 12 times — detect
      // any occurrence that drew differently
      val tiled = ps.length % 12 == 0 && {
        val k = ps.length / 12
        ps.grouped(k).toSeq.distinct.length == 1
      }
      !tiled
    }
    assert(drew, "occurrences of one word never varied within an epoch")
    // empty tokens / empty docs never NULL the piece stream
    val messy = Seq((7L, "abc  ab"), (8L, "")).toDF("doc_id", "text")
    val mp = TextAnalysis.unigramSampleEncode(messy, vocab, 0.2, "e0")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(mp(7L).mkString("") === "abcab")
    assert(mp(8L) === Seq())
    ()
  }

  test("unigram n-best: rank 0 is Viterbi, costs ascend, matches brute force") {
    import spark.implicits._
    val vocab = Seq(("ab", 10L), ("a", 10L), ("b", 10L), ("abc", 25L),
      ("c", 10L), ("bc", 15L))
    val unk = 1000L
    def nbestOf(w: String, n: Int): Seq[(Seq[String], Long)] =
      Seq(Tuple1(w)).toDF("w")
        .select(graft.functions.UnigramExpressions.unigramNbest(
          col("w"), vocab, 4, unk, n).as("nb"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getSeq[String](0), r.getLong(1)))
    // "abc": ab+c=20, then the 25 tie (whole "abc" beats a+bc — longer
    // first), then a+b+c=30
    val nb = nbestOf("abc", 10)
    assert(nb.map(_._2) === nb.map(_._2).sorted, "costs must ascend")
    assert(nb === Seq(
      (Seq("ab", "c"), 20L), (Seq("abc"), 25L), (Seq("a", "bc"), 25L),
      (Seq("a", "b", "c"), 30L)), s"got $nb")
    // rank 0 == the 1-best kernel's segmentation
    val best = Seq(Tuple1(Seq("abc"))).toDF("toks")
      .select(graft.functions.UnigramExpressions.unigramEncode(
        col("toks"), vocab, 4, unk).as("p")).head().getSeq[String](0)
    assert(nb.head._1 === best)
    // every candidate concatenates back; unknown chars carry unk cost
    val ax = nbestOf("axb", 3)
    assert(ax.forall(_._1.mkString("") == "axb"))
    assert(ax.head._2 === 10L + unk + 10L)
    // n truncates the list
    assert(nbestOf("abc", 2).length === 2)
    ()
  }

  test("unigram Viterbi: exhaustive optimality, surrogate-safe segmentation") {
    import spark.implicits._
    val vocab = Seq(("a", 900000L), ("b", 1100000L), ("ab", 1500000L),
      ("ba", 2100000L), ("aab", 1700000L), ("bb", 2600000L))
    val table = vocab.toMap
    val unk = 5000000L
    // brute force: min total cost over ALL segmentations (pieces in
    // vocab, or any single char at unk cost)
    def minCost(w: String): Long =
      if (w.isEmpty) 0L
      else (1 to w.length).flatMap { l =>
        val piece = w.take(l)
        val c = table.get(piece).orElse(
          if (l == 1) Some(unk) else None)
        c.map(_ + minCost(w.drop(l)))
      }.min
    def costOf(pieces: Seq[String]): Long =
      pieces.map(p => table.getOrElse(p, unk)).sum
    // every word over {a,b} up to length 6, exhaustively
    val words = (1 to 6).flatMap(n =>
      (0 until (1 << n)).map(m =>
        (0 until n).map(i => if (((m >> i) & 1) == 1) 'b' else 'a').mkString))
    val segged = words.map(w => Tuple1(Seq(w))).toDF("toks")
      .select(graft.functions.UnigramExpressions.unigramEncode(
        col("toks"), vocab, 4, unk).as("p"))
      .collect().map(_.getSeq[String](0))
    words.zip(segged).foreach { case (w, pieces) =>
      assert(pieces.mkString("") === w, s"coverage broke for '$w': $pieces")
      assert(costOf(pieces) === minCost(w),
        s"'$w': Viterbi cost ${costOf(pieces)} != optimal ${minCost(w)} ($pieces)")
    }
    // astral-plane safety: an emoji word falls back to whole code
    // points, never half a surrogate pair
    val emoji = "a😀b" // a😀b
    val ep = Seq(Tuple1(Seq(emoji))).toDF("toks")
      .select(graft.functions.UnigramExpressions.unigramEncode(
        col("toks"), vocab, 4, unk).as("p"))
      .head().getSeq[String](0)
    assert(ep === Seq("a", "😀", "b"), s"got $ep")
    assert(ep.mkString("") === emoji)
    ()
  }

  test("unigram tokenizer: exact coverage, learned pieces, tie-breaks, determinism") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    // kernel semantics on a crafted table: longer piece wins at equal
    // cost; unknown chars fall back to priced singles
    val tiny = Seq(Tuple1(Seq("abab", "axb"))).toDF("toks")
    val segs = tiny.select(graft.functions.UnigramExpressions.unigramEncode(
      col("toks"), Seq(("ab", 10L), ("a", 10L), ("b", 10L)), 4, 1000L)
      .as("p")).head().getSeq[String](0)
    assert(segs === Seq("ab", "ab", "a", "x", "b"),
      s"got $segs — 'ab' must beat 'a'+'b', 'x' must fall back")
    // trained on the real corpus
    val d = Tables.load(spark, sf, "documents").cache()
    val vocab = TextAnalysis.unigramTrain(d, vocabSize = 100, rounds = 2)
    assert(vocab.exists(_._1.length == 1), "single-char floor must survive")
    assert(vocab.exists(_._1.length > 1), "no multi-char piece was learned")
    assert(vocab.forall(_._3 > 0), "costs must be positive e6 integers")
    val enc = TextAnalysis.unigramEncode(d, vocab).cache()
    // exact coverage: pieces concatenate back to the tokens, doc for doc
    val bad = enc.join(d, "doc_id")
      .select(concat_ws("", col("pieces")).as("p"),
        concat_ws("", split(col("text"), " ")).as("t"))
      .filter(col("p") =!= col("t")).count()
    assert(bad === 0L, s"$bad docs failed round-trip coverage")
    // every emitted piece is vocab or a single-CODE-POINT unknown
    val vs = vocab.map(_._1).toSet
    val used = enc.select(explode(col("pieces")).as("p")).distinct()
      .collect().map(_.getString(0))
    assert(used.forall(p => vs(p) || p.codePointCount(0, p.length) == 1))
    // the model compresses: fewer pieces than characters
    val nPieces = enc.select(sum(size(col("pieces")))).head().getLong(0)
    val nChars = d.select(sum(length(concat_ws("",
      split(col("text"), " "))))).head().getLong(0)
    assert(nPieces < nChars, s"pieces $nPieces !< chars $nChars")
    // training is a pure function of the corpus
    assert(vocab === TextAnalysis.unigramTrain(d, vocabSize = 100, rounds = 2))
    enc.unpersist(); d.unpersist()
    ()
  }

  test("connectedComponents labels chains and keeps components separate") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L)) // chain collapses to min
    assert(Seq(10L, 11L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L))
    // O(1) cached across rounds: only the returned label table may stay
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).size <= 1,
      s"leaked cached RDDs: ${(after -- before).size}")
  }

  test("lshCrossCorpusPairs: bipartite only — new docs pair with corpus, never each other") {
    val corpus = docs.filter(col("doc_id") < 50)
    // two IDENTICAL new docs, both near-dups of corpus doc 0
    val newDocs = docs.filter(col("doc_id") === 0)
      .withColumn("doc_id", lit(9001L))
      .union(docs.filter(col("doc_id") === 0).withColumn("doc_id", lit(9002L)))
    val sigC = Dedup.minhashSignatures(corpus, 8, 3)
    val sigN = Dedup.minhashSignatures(newDocs, 8, 3)
    val pairs = Dedup.lshCrossCorpusPairs(sigN, sigC, 8, 2).cache()
    // both new docs hit their corpus original
    assert(pairs.filter(col("new_id") === 9001L && col("corpus_id") === 0L).count() === 1)
    assert(pairs.filter(col("new_id") === 9002L && col("corpus_id") === 0L).count() === 1)
    // bipartite: corpus ids only on the corpus side, new ids only on the new side
    assert(pairs.filter(col("new_id") < 9000L || col("corpus_id") >= 9000L).count() === 0)
    pairs.unpersist()
    ()
  }

  test("substringDupStats: shared 8-token runs are counted, unique docs at 0") {
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8" // exactly one 8-token window
    val df = Seq(
      (1L, s"$shared tail one"),
      (2L, s"head $shared other end"),
      (3L, "totally different words with no overlap at all here ok")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupStats(df, windowTokens = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._2 >= 1 && out(2L)._2 >= 1, "shared window not detected")
    assert(out(3L)._2 === 0, "unique doc reported shared windows")
    // doc 1: 10 tokens -> 3 windows, all distinct
    assert(out(1L)._1 === 3)
  }

  test("winnowFingerprints: deterministic, short docs absent, density sane") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"), // identical -> identical fingerprints
      (3L, "a b c d e")            // 5 tokens < n+k-1=6 -> no window
    ).toDF("doc_id", "text")
    val out = TextAnalysis.winnowFingerprints(df, n = 3, k = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(!out.contains(3L), "sub-window doc should yield no fingerprints")
    assert(out(1L) === out(2L), "identical docs diverged")
    val (nFp, fpMin, fpMax) = out(1L)
    // 10 tokens -> 8 grams -> 5 complete windows; winnowing dedups mins
    assert(nFp >= 1 && nFp <= 5 && fpMin <= fpMax)
  }

  test("labelCentroids: identical vectors recover the vector exactly") {
    val v = Array(0.5f, -0.25f, 0.0f)
    val df = Seq((1L, v, 7), (2L, v, 7), (3L, Array(1.0f, 1.0f, 1.0f), 8))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(df)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out((7, 0)) === ((2L, 10000000L, 0.5)))
    assert(out((7, 1)) === ((2L, -5000000L, -0.25)))
    assert(out((7, 2)) === ((2L, 0L, 0.0)))
    assert(out((8, 0)) === ((1L, 10000000L, 1.0)))
    assert(out.size === 6)
  }

  test("fimTransform: PSM parses back to the original; cuts in range") {
    import graft.ops.Curation
    val rnd = new scala.util.Random(17)
    val docsDf = ((1L to 40L).map(id => (id,
      (1 to (1 + rnd.nextInt(30))).map(i => s"tok${rnd.nextInt(50)}_$i")
        .mkString(" "))) :+ (99L -> "single")).toDF("doc_id", "text")
    val out = Curation.fimTransform(docsDf)
      .select("doc_id", "text", "n_tokens", "cut1", "cut2", "psm_text")
      .collect()
    for (r <- out) {
      val (orig, n, c1, c2, psm) = (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))
      assert(0 <= c1 && c1 <= c2 && c2 <= n)
      // parse "<PRE> p <SUF> s <MID> m" and reassemble p+m+s
      val sufAt = psm.indexOf(" <SUF> ")
      val midAt = psm.indexOf(" <MID> ")
      assert(psm.startsWith("<PRE> ") && sufAt >= 0 && midAt > sufAt)
      val pre = psm.substring("<PRE> ".length, sufAt)
      val suf = psm.substring(sufAt + " <SUF> ".length, midAt)
      val mid = psm.substring(midAt + " <MID> ".length)
      val rebuilt = Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt === orig, s"FIM round trip failed for doc ${r.getLong(0)}")
    }
    // both degenerate extremes occur somewhere in 41 seeded docs
    assert(out.exists(r => r.getLong(3) === r.getLong(4)), "no empty middle")
    assert(out.exists(r => r.getLong(3) === 0L), "no empty prefix")
  }

  test("ccnetBuckets: per-language tertiles track the LM score order") {
    // en: 7 docs from fluent (repeated common bigrams) to gibberish;
    // de: 4 docs — different language, independent tertiles
    val mk = (id: Long, lang: String, t: String) => (id, lang, t)
    val docsDf = Seq(
      mk(1, "en", "the cat sat the cat sat the cat sat"),
      mk(2, "en", "the cat sat the cat sat"),
      mk(3, "en", "the cat sat on a mat"),
      mk(4, "en", "a mat sat on the cat"),
      mk(5, "en", "zq xw vv uu tt ss"),
      mk(6, "en", "qqq www eee rrr"),
      mk(7, "en", "the cat sat"),
      mk(10, "de", "der hund lief der hund lief"),
      mk(11, "de", "der hund lief schnell"),
      mk(12, "de", "xyz abc def"),
      mk(13, "de", "der hund")
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.ccnetBuckets(docsDf).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    // replicate ntile(3): sorted by (score desc, id), first ceil-thirds
    // get bucket 1, etc.
    for (lang <- Seq("en", "de")) {
      val sorted = out.toSeq.filter(_._2._1 == lang)
        .sortBy { case (id, (_, s, _, _)) => (-s, id) }.map(_._1)
      val n = sorted.size
      val sizes = (0 until 3).map(i => n / 3 + (if (i < n % 3) 1 else 0))
      var idx = 0
      for ((sz, b) <- sizes.zip(Seq(1L, 2L, 3L)); _ <- 0 until sz) {
        assert(out(sorted(idx))._3 === b,
          s"doc ${sorted(idx)} in wrong tertile for $lang")
        idx += 1
      }
    }
    // bucket_name is the bucket number's label, everywhere
    for ((_, (_, _, b, name)) <- out)
      assert(name === Seq("head", "middle", "tail")(b.toInt - 1))
    // raw-conditional pathology the CCNet recipe inherits from its
    // scorer choice: SINGLETON bigrams are "certain" (P=1), so doc 6's
    // unique gibberish scores a perfect 1e6 and heads the split — the
    // reason the smoothed scorers (lmScoreKneserNey/lmScoreInterpolated)
    // exist; ccnetBuckets pins the SPLIT mechanics, not the scorer
    assert(out(6L)._2 === 1000000L)
    // a doc reusing a low-conditional bigram ranks below one that
    // doesn't: doc 3 carries (sat,on)=0.4 and (on,a)=0.5 and must not
    // outscore doc 7 (both bigrams at 1.0)
    assert(out(3L)._2 < out(7L)._2)
  }

  test("spanCorrupt: round trip reconstructs, rate exact, tails pass") {
    import graft.ops.Curation
    val rnd = new scala.util.Random(31)
    val docs = (1L to 30L).map(id => (id,
      (1 to (1 + rnd.nextInt(70))).map(i => s"w${rnd.nextInt(99)}i$i")
        .mkString(" "))) :+ (99L, (1 to 60).map(i => s"t$i").mkString(" "))
    val out = Curation.spanCorrupt(docs.toDF("doc_id", "text"))
      .select("doc_id", "n_tokens", "n_blocks", "n_masked", "input_text",
        "target_text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    val sentinel = "<extra_id_(\\d+)>".r
    val byId = docs.toMap
    for ((id, (nTok, nBlocks, nMasked, input, target)) <- out) {
      val orig = byId(id)
      assert(nTok === orig.split(" ").length.toLong)
      assert(nBlocks === (nTok + 19) / 20)
      // parse the target stream into sentinel -> span
      var spans = Map.empty[String, List[String]]
      var cur: String = null
      for (t <- target.split(" ") if t.nonEmpty) t match {
        case sentinel(_) => cur = t; spans += cur -> Nil
        case tok => spans += cur -> (spans(cur) :+ tok)
      }
      assert(spans.values.map(_.size).sum.toLong === nMasked)
      assert(spans.values.forall(_.size == 3), "span length is fixed at 3")
      // splice each span back over its sentinel -> the original text
      val rebuilt = input.split(" ").flatMap {
        case t @ sentinel(_) => spans(t)
        case t => Seq(t)
      }.mkString(" ")
      assert(rebuilt === orig, s"round trip failed for doc $id")
    }
    // 60 tokens = 3 full blocks -> exactly 9 masked; a 23-token doc has
    // a 3-token tail block that passes through unmasked
    assert(out(99L)._3 === 9L)
    val tail = Curation.spanCorrupt(
      Seq(7L -> (1 to 23).map(i => s"x$i").mkString(" "))
        .toDF("doc_id", "text")).head()
    assert(tail.getAs[Long]("n_blocks") === 2L)
    assert(tail.getAs[Long]("n_masked") === 3L)
    assert(tail.getAs[String]("input_text").endsWith("x21 x22 x23"))
  }

  test("phraseQueryViaIndex: overlaps count, offsets shift, no-match " +
    "docs absent") {
    val df = Seq(
      1L -> "a a a b",      // ["a","a"] matches at 0 and 1 (overlap)
      2L -> "x a a y a a",  // matches at 1 and 4
      3L -> "a b a b",      // no adjacent "a a"
      4L -> "c c c").toDF("doc_id", "text")
    val out = TextAnalysis.phraseQueryViaIndex(df, Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(1L -> ((2L, 0L)), 2L -> ((2L, 1L))))
    // three-term phrase: only the exact ordered run matches
    val tri = TextAnalysis.phraseQueryViaIndex(df, Seq("a", "a", "b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(tri === Map(1L -> ((1L, 1L))))
  }

  test("pmiCollocations: exclusive pairs outrank frequent ones; " +
    "brute-force equality") {
    // "zig zag" appears 3x and its words appear nowhere else ->
    // maximal PMI; "the end" words are everywhere -> low PMI; "one off"
    // appears once -> dropped by minCount
    val docsDf = Seq(
      1L -> "the end of the end zig zag one off",
      2L -> "zig zag the end the end the end",
      3L -> "zig zag the end and the end").toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docsDf, k = 10, minCount = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.head._1 === "zig" && out.head._2 === "zag")
    assert(!out.exists(p => p._1 == "one"), "minCount failed to drop hapax")
    // brute-force reference over all adjacent pairs
    val toks = docsDf.collect().map(_.getString(1)).flatMap(_.split(" "))
    val n = docsDf.collect()
      .map(_.getString(1).split(" ").length).sum.toLong
    val uni = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairs = docsDf.collect().map(_.getString(1).split(" ").toSeq)
      .flatMap(ws => ws.zip(ws.tail))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter(_._2 >= 3)
    val expect = pairs.toSeq.map { case ((a, b), cab) =>
      (a, b, cab, uni(a), uni(b),
        (BigInt(cab) * n * 1000000 / (BigInt(uni(a)) * uni(b))).toLong)
    }.sortBy { case (a, b, _, _, _, s) => (-s, a, b) }.take(10)
    assert(out.toSeq === expect)
  }

  test("saltedJoin: row-identical to the plain join; hot key spreads") {
    import graft.ops.Skew
    // 900 rows on key 0 (hot), a handful elsewhere; dim has a dup key
    // row to prove multiplicity survives (every fact row must meet
    // EVERY dim row of its key exactly once)
    val fact = ((1L to 900L).map(i => (0L, i)) ++
      (901L to 930L).map(i => (i % 7 + 1, i))).toDF("k", "rid")
    val dim = (Seq((0L, "hot"), (0L, "hot2")) ++
      (1L to 7L).map(k => (k, s"d$k"))).toDF("k", "label")
    val salted = Skew.saltedJoin(fact, dim, "k", saltBy = "rid", salts = 8)
    val plain = fact.join(dim, "k")
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "rid", "label").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    assert(multiset(salted) === multiset(plain))
    // the hot key's rows really spread: >1 distinct salt partition key
    val spread = fact.filter(col("k") === 0L)
      .select(pmod(hash(col("rid")), lit(8)).as("s"))
      .distinct().count()
    assert(spread > 4, s"salting left the hot key on $spread salts")
  }

  test("pageRank: exact vs reference with dangling mass; O(1) cached") {
    import graft.ops.Graph
    def ref(edges: Seq[(Long, Long)], iters: Int,
            damp: Int): Map[Long, Long] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val n = nodes.size
      val base = 1000000000000L / n
      val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
      var r = nodes.map(_ -> base).toMap
      for (_ <- 1 to iters) {
        val dangling = nodes.filterNot(outdeg.contains).map(r).sum / n
        val contrib = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map { case (s, _) => r(s) / outdeg(s) }.sum }
        r = nodes.map(v => v -> (base * (100 - damp) / 100 +
          (contrib.getOrElse(v, 0L) + dangling) * damp / 100)).toMap
      }
      r
    }
    // seeded graph with duplicate-free edges and genuine dangling nodes
    val rnd = new scala.util.Random(11)
    val edges = (1 to 60).map(_ =>
      (rnd.nextInt(15).toLong, (15 + rnd.nextInt(5)).toLong))
      .distinct // nodes 15..19 have no out-edges -> dangling
    val beforeIds = spark.sparkContext.getPersistentRDDs.keySet
    val before = beforeIds.size
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(got === ref(edges, iters = 3, damp = 85))
    // truncation-bounded mass conservation
    val total = got.values.sum
    assert(total <= 1000000000000L &&
      total > 1000000000000L - got.size.toLong * 6 * 100,
      s"mass $total")
    // only the returned table's checkpoint may remain cached
    assert(after - before <= 1, s"leaked cached RDDs: $before -> $after")
  }

  test("invertedIndex: widths match the byte codec, gaps decode, " +
    "blocks partition, one shared exchange") {
    import graft.functions.Varint
    import java.nio.ByteBuffer
    // the width CASE chain IS the unsigned-varint size at every
    // boundary, through the full 9-byte non-negative-long range
    def chain(v: Long): Int =
      (7 to 56 by 7).find(b => v < (1L << b)).map(_ / 7).getOrElse(9)
    for (shift <- 7 to 56 by 7; v <- Seq((1L << shift) - 1, 1L << shift))
      assert(chain(v) === Varint.sizeOfUnsignedVarlong(v),
        s"width chain wrong at $v")
    for (v <- Seq(0L, 1L, Long.MaxValue))
      assert(chain(v) === Varint.sizeOfUnsignedVarlong(v),
        s"width chain wrong at $v")
    // ...and the int-range sizes agree with the real byte writer
    for (v <- Seq(0L, 127L, 128L, 16384L, 268435455L)) {
      val buf = ByteBuffer.allocate(8)
      Varint.writeUnsignedVarint(v.toInt, buf)
      assert(buf.position() === Varint.sizeOfUnsignedVarlong(v))
    }
    // docs 3,7,10,11 contain "x"; blocks split by doc % 2
    val df = Seq(3L -> "x y", 7L -> "x x z", 10L -> "x", 11L -> "y x")
      .toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(df, blocks = 2)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6))).toMap
    // block 0: doc 10 -> gaps [10]; block 1: docs 3,7,11 -> [3,4,4]
    assert(rows(("x", 0L)) === ((1L, 1L, 10L, 10L, 1L)))
    assert(rows(("x", 1L)) === ((3L, 4L, 3L, 11L, 3L)))
    // gap cumulative sums rebuild the sorted doc ids (decode identity)
    assert(Seq(3L, 4L, 4L).scanLeft(0L)(_ + _).tail === Seq(3L, 7L, 11L))
    // the window and final aggregate share the (term, block) exchange:
    // exactly 2 exchanges in the whole plan
    // AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan" —
    // count exchanges only in the final-plan section
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
  }

  test("randomProjection: LCG replay exact; JL dot products correlate") {
    val P = 2147483647L
    def sign(j: Int, i: Int): Long = {
      val a = 1103515245L * (j + 1) % P
      val b = 12345L * (2 * j + 1) % P
      ((a * i + b) % P) % 6 match { case 0 => 1L; case 1 => -1L; case _ => 0L }
    }
    // plain-Scala replay of one vector pins the (axis, component) contract
    val v = Array(0.5f, -0.25f, 0.125f, 0.0f)
    val q = v.map(x => math.floor(x.toDouble * 1e7).toLong)
    val expected = (0 until 8).map(j =>
      q.indices.map(i => q(i) * sign(j, i + 1)).sum)
    val got = Similarity.randomProjection(
        Seq((1L, v)).toDF("vec_id", "embedding"), outDims = 8)
      .head().getAs[collection.Seq[Long]]("proj")
    assert(got === expected)
    // density: {+1,-1} axes ~1/3 of entries (2/6 of residues)
    val entries = for (j <- 0 until 16; i <- 1 to 64) yield sign(j, i)
    val nz = entries.count(_ != 0L).toDouble / entries.size
    assert(nz > 0.25 && nz < 0.42, s"sign density $nz far from 1/3")
    // JL: projected dots track original dots (seeded, deterministic)
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 40L).map(id => (id,
      Array.fill(64)((rnd.nextDouble() - 0.5).toFloat)))
    val projs = Similarity.randomProjection(
        vecs.toDF("vec_id", "embedding"), outDims = 48)
      .collect().map(r => r.getLong(0) -> r.getAs[collection.Seq[Long]]("proj")).toMap
    val byId = vecs.toMap
    val pairs = for (a <- 1L to 10L; b <- (a + 1) to 10L) yield {
      val orig = byId(a).zip(byId(b)).map { case (x, y) =>
        x.toDouble * y }.sum
      val proj = projs(a).zip(projs(b)).map { case (x, y) =>
        x.toDouble * y }.sum * 3 / 48 / 1e14
      (orig, proj)
    }
    val (os, ps) = (pairs.map(_._1), pairs.map(_._2))
    val (om, pm) = (os.sum / os.size, ps.sum / ps.size)
    val cov = os.zip(ps).map { case (o, p) => (o - om) * (p - pm) }.sum
    val corr = cov / math.sqrt(
      os.map(o => (o - om) * (o - om)).sum *
        ps.map(p => (p - pm) * (p - pm)).sum)
    assert(corr > 0.7, s"JL correlation $corr too weak")
  }

  test("leakageFreeSplit: a near-dup cluster never straddles the split") {
    import graft.ops.Curation
    val d = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: {1,2,3}, {10,11}; everything else singleton
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster")
    val out = Curation.leakageFreeSplit(d, clusters, validationPerMille = 300)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size === 200)
    // atomic cluster assignment: same key, same split
    assert(Seq(1L, 2L, 3L).map(out(_)).distinct.size === 1)
    assert(Seq(10L, 11L).map(out(_)).distinct.size === 1)
    // singletons key on their own id
    assert(out(50L)._1 === 50L)
    // ~30% validation, deterministic
    val nVal = out.values.count(_._2 == "validation")
    assert(nVal > 30 && nVal < 120, s"validation fraction off: $nVal/200")
    val rerun = Curation.leakageFreeSplit(d, clusters, validationPerMille = 300)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.forall { case (id, (_, s)) => rerun(id) == s })
  }

  test("sourceOverlapMatrix: shared windows counted per source pair") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val df = Seq(
      (1L, s"$shared alpha one", "srcA"),
      (2L, s"beta $shared two", "srcB"),
      (3L, "gamma delta epsilon zeta eta theta iota kappa lambda mu", "srcC")
    ).toDF("doc_id", "text", "source")
    val m = Dedup.sourceOverlapMatrix(df, windowTokens = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("srcA", "srcB")) === 1L) // exactly the planted window
    assert(!m.contains(("srcA", "srcC")) && !m.contains(("srcB", "srcC")))
  }

  test("CC shuffle width scales with the edge count, capped by the cluster") {
    // tiny graph: no point paying multi-partition shuffles
    assert(Dedup.ccPartitionsFor(nEdges = 5000L, defaultParallelism = 32) === 1)
    // corpus-scale pair graph: ~50k edges/partition until the cluster cap
    assert(Dedup.ccPartitionsFor(10_000_000L, 32) === 128) // 4x32 cap binds
    assert(Dedup.ccPartitionsFor(10_000_000L, 8000) === 201) // edges/50k binds
    // a billion-edge graph on a big cluster is NOT capped at the old 200
    assert(Dedup.ccPartitionsFor(1_000_000_000L, 8000) === 20001)
    assert(Dedup.ccPartitionsFor(1_000_000_000L, 1) === 4)
  }

  test("bm25Rank matches a sequential integer BM25 reference") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark merge spark window a b"),
      (2L, "merge merge merge c d e f g h i j k l m n o p q r s t"),
      (3L, "window"),
      (4L, "x y z"),          // no query term -> absent from the output
      (5L, "spark"))
    val terms = Seq("spark", "merge", "window")
    // independent straight-line replay of the e6 fixed-point formulas
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val nDocs = corpus.size.toLong
    val totalDl = toks.values.map(_.size.toLong).sum
    val avgdlE6 = totalDl * 1000000L / nDocs
    val dft = terms.map(w =>
      w -> toks.values.count(_.contains(w)).toLong).toMap
    val expect = corpus.flatMap { case (id, _) =>
      val ts = toks(id)
      val dl = ts.size.toLong
      val hits = terms.filter(ts.contains)
      if (hits.isEmpty) None
      else {
        val score = hits.map { w =>
          val tf = ts.count(_ == w).toLong
          val idfE6 = ((2 * (nDocs - dft(w)) + 1) * 1000000L) / (2 * dft(w) + 1)
          val ratioE6 = dl * 1000000L * 1000000L / avgdlE6
          val normE6 = 1000000L - 750000L + 750000L * ratioE6 / 1000000L
          val tfpartE6 = tf * (1200000L + 1000000L) * 1000000L /
            (tf * 1000000L + 1200000L * normE6 / 1000000L)
          idfE6 * tfpartE6 / 1000000L
        }.sum
        Some((id, hits.size.toLong, score))
      }
    }.sortBy { case (id, _, s) => (-s, id) }
    val got = TextAnalysis.bm25Rank(
        corpus.toDF("doc_id", "text"), terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
    // rare terms outrank common ones at equal tf: doc 3's lone "window"
    // (df 2) must outscore doc 5's lone "spark" (df 2)... both df 2 —
    // so pin the high-tf long doc instead: doc 2's heavy "merge" mass
    // cannot overcome its length normalization against doc 1's two
    // distinct rarer terms
    assert(got.head._1 === 1L)
    // the k cut returns at most k rows and never resurrects no-hit docs
    val top1 = TextAnalysis.bm25Rank(
        corpus.toDF("doc_id", "text"), terms, k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(top1 === Seq(got.head._1))
    assert(!got.map(_._1).contains(4L))
  }

  test("bm25 term score is exact at scales where the naive Long form wraps") {
    import spark.implicits._
    // (id, tf, dl, dft, n_docs, total_dl): each row crosses a boundary
    // where the pre-decomposition form wrapped Long silently — a df=1 idf
    // beyond ~6M docs, a >9.2M-token doc (dl*1e12), and a petabyte-scale
    // total_dl (total_dl*1e6)
    val rows = Seq(
      (1L, 3L, 400L, 1L, 5_000_000_000L, 2_000_000_000_000L),
      (2L, 7L, 12_000_000L, 2L, 1_000_000L, 500_000_000L),
      (3L, 1L, 200L, 1L, 25_000_000_000L, 25_000_000_000_000L),
      (4L, 123456L, 9_000_000L, 17L, 2_000_000_000_000L,
        1_000_000_000_000_000L),
      // and one small-range row proving the decomposition changes nothing
      (5L, 2L, 6L, 3L, 5L, 32L))
    val got = TextAnalysis.withBm25TermScore(
        rows.toDF("id", "tf", "dl", "dft", "n_docs", "total_dl"),
        1200000L, 750000L)
      .select("id", "term_score_e6").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // BigInt replay of the ORIGINAL (undecomposed) formula: the identity
    // (x*y) div m == (x div m)*y + ((x mod m)*y) div m must make the Long
    // pipeline agree with unbounded arithmetic
    val e6 = BigInt(1000000)
    rows.foreach { case (id, tf, dl, dft, n, tot) =>
      val avgdl = BigInt(tot) * e6 / BigInt(n)
      val ratio = BigInt(dl) * e6 * e6 / avgdl
      val norm = e6 - 750000 + BigInt(750000) * ratio / e6
      val tfp = BigInt(tf) * (1200000 + 1000000) * e6 /
        (BigInt(tf) * e6 + BigInt(1200000) * norm / e6)
      val idf = (2 * (BigInt(n) - BigInt(dft)) + 1) * e6 / (2 * BigInt(dft) + 1)
      val want = idf * tfp / e6
      assert(want.isValidLong && want > 0,
        s"row $id: reference score out of Long range — bad test data")
      assert(got(id) === want.toLong, s"row $id drifted from exact math")
    }
  }

  test("blockMaxTopK equals the full-scan top-k on the corpus") {
    val terms = Seq("spark", "merge", "window")
    val full = TextAnalysis.bm25Rank(docs, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val pruned = TextAnalysis.bm25BlockMaxTopK(docs, terms, k = 10,
        blocks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pruned === full,
      "block-max pruning changed the exact top-k")
  }

  test("blockMaxTopK actually skips blocks when the bounds separate") {
    import spark.implicits._
    // block 0 (ids % 4 == 0) holds the short high-tf docs; every other
    // block's best possible score is the long tf=1 doc — its bound
    // lands below tau after phase 1, so phases never touch blocks 1-3
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = (0L until 20L).map { id =>
      if (id % 4 == 0) (id, "needle needle needle")
      else (id, s"needle $filler")
    }
    val got = TextAnalysis.bm25BlockMaxTopK(
      corpus.toDF("doc_id", "text"), Seq("needle"), k = 2, blocks = 4)
    val rows = got.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === Set(0L, 4L))
    assert(rows.forall(_.getAs[Long]("phase") === 1L))
    assert(rows.forall(r => r.getAs[Long]("scanned_blocks") === 1L &&
      r.getAs[Long]("total_blocks") === 4L),
      "bounds should have pruned blocks 1-3")
    // and the pruned result still equals the full scan
    val full = TextAnalysis.bm25Rank(
        corpus.toDF("doc_id", "text"), Seq("needle"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq.sorted ===
      full.sorted)
  }

  test("blockMaxTopK scans everything when phase 1 holds < k docs") {
    import spark.implicits._
    val corpus = Seq((1L, "needle a"), (2L, "needle b c"),
      (3L, "needle d e f"), (10L, "plain text"))
    val got = TextAnalysis.bm25BlockMaxTopK(
      corpus.toDF("doc_id", "text"), Seq("needle"), k = 10, blocks = 4)
    val rows = got.collect()
    // tau = -1 -> every block with candidates is scanned; all 3 hits out
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L, 3L))
    assert(rows.forall(r => r.getAs[Long]("scanned_blocks") ===
      r.getAs[Long]("total_blocks")))
  }

  test("blockMaxTopK property: equals the full scan under heavy ties") {
    import spark.implicits._
    // small vocab + duplicated doc bodies force EQUAL scores across
    // blocks — the risky tau edge: a pruned block with bound == tau can
    // hold a doc that wins the doc-id tie-break, so phase 2 must use
    // >= tau, and both rankers must share the (score desc, id) order
    val vocab = Array("needle", "pin", "thread", "a", "b")
    for (seed <- 1 to 5) {
      var s = seed.toLong
      def nxt(n: Int): Int = {
        s = (s * 6364136223846793005L + 1442695040888963407L)
        (((s >>> 33) % n + n) % n).toInt
      }
      val corpus = (0L until 40L).map { id =>
        val len = 3 + nxt(6)
        (id, (0 until len).map(_ => vocab(nxt(vocab.length)))
          .mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      val terms = Seq("needle", "pin")
      for (blocks <- Seq(3, 5)) {
        val full = TextAnalysis.bm25Rank(df, terms, k = 5)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
        val pruned = TextAnalysis.bm25BlockMaxTopK(df, terms, k = 5,
            blocks = blocks)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
        assert(pruned === full,
          s"seed=$seed blocks=$blocks: pruned top-k diverged")
      }
    }
  }

  test("bm25BlockMaxTopK reads its corpus at most twice (tf chain + stats)") {
    // round-12 regression guard: the lazy merge re-ran the corpus scan
    // behind every consumer (~5x the plain bm25Rank cost); the merge is
    // now ONE action whose branches share the tf and repartition
    // exchanges via ReusedExchange. A fresh parquet corpus (not the
    // suite's cached docs — cache substitution would hide the reads)
    // plus a task-metrics listener pins the file-read volume.
    val root = java.nio.file.Files.createTempDirectory("graft-bmx-scan")
    try {
      import spark.implicits._
      (0L until 400L)
        .map(i => (i, s"spark merge window filler$i pad$i more$i"))
        .toDF("doc_id", "text")
        .repartition(2).write.parquet(root.toString + "/docs")
      val corpus = spark.read.parquet(root.toString + "/docs")
      val fileBytes = {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(
          java.nio.file.Files.walk(root.resolve("docs"))) { st =>
          st.iterator().asScala
            .filter(p => p.toString.endsWith(".parquet"))
            .map(p => java.nio.file.Files.size(p)).sum
        }
      }
      val bytes = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val got = TextAnalysis.bm25BlockMaxTopK(
          corpus, Seq("spark", "merge"), k = 5, blocks = 4).collect()
        assert(got.length === 5, "operator lost rows under the probe")
        // listener events are async: settle until the counter is stable
        var last = -1L; var settled = 0; var waited = 0
        while (settled < 3 && waited < 50) {
          val v = bytes.get
          if (v == last) settled += 1 else { settled = 0; last = v }
          Thread.sleep(100); waited += 1
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      assert(bytes.get > 0L, "listener saw no input — probe is broken")
      assert(bytes.get <= 3L * fileBytes,
        s"corpus read ${bytes.get} bytes vs $fileBytes on disk — " +
          "more than the two expected passes; a merge branch lost " +
          "exchange reuse and re-scans the corpus")
    } finally {
      graft.Fs.deleteRecursively(root)
    }
  }

  test("at-rest block-max index answers row-identically and never scans the corpus") {
    val terms = Seq("spark", "merge", "window")
    val root = java.nio.file.Files.createTempDirectory("graft-bmx-spec")
    try {
      TextAnalysis.bm25IndexWrite(docs, root.toString, blocks = 8)
      val got = TextAnalysis.bm25TopKOverIndex(spark, root.toString,
        terms, k = 10)
      val gotRows = got.collect().map(_.toSeq).toSeq
      val inline = TextAnalysis.bm25BlockMaxTopK(docs, terms, k = 10,
          blocks = 8)
        .collect().map(_.toSeq).toSeq
      assert(gotRows === inline,
        "index-backed top-k diverged from the inline operator")
      // query-time IO contract, pinned on the index reads themselves
      // (the returned table is local — a k-row TakeOrdered result):
      // the partitionBy("block") layout prunes parquet DIRECTORIES, and
      // the term predicate pushes into the postings row groups
      val prunedPlan = spark.read.parquet(root.toString + "/postings")
        .filter(org.apache.spark.sql.functions.col("block") === 3)
        .queryExecution.executedPlan.toString
      assert(prunedPlan.contains("PartitionFilters") &&
        "PartitionFilters: \\[[^\\]]*block".r.findFirstIn(prunedPlan)
          .isDefined,
        "block filter did not prune postings partitions: " +
          prunedPlan.take(600))
      val termPlan = spark.read.parquet(root.toString + "/postings")
        .filter(org.apache.spark.sql.functions.col("w").isin(terms: _*))
        .queryExecution.executedPlan.toString
      assert("PushedFilters: \\[[^\\]]*[Ii]n\\(w".r.findFirstIn(termPlan)
          .isDefined,
        "term predicate did not push into the postings scan: " +
          termPlan.take(600))
    } finally {
      graft.Fs.deleteRecursively(root)
    }
  }

  test("extractContent: word axis, link axis incl. exact boundary, nested anchors") {
    import spark.implicits._
    val page = Seq(
      "<a>abcde</a> fghi", // alen 5 / vlen 10 = exactly the 500 bound -> kept
      "<a>abcdef</a> fgh", // alen 6 / vlen 10 = 600 permille -> dropped
      "one two three", // prose, no links -> kept
      "x", // 1 word < minWords -> dropped
      "", // empty visible -> dropped (and must not divide by zero)
      "<a href=q><b>bold link</b></a> plus trailing prose words here",
      "<A HREF=q>UPPER CASE anchor text link</A> ok" // case-blind axis
    ).mkString("\n")
    val got = TextAnalysis.extractContent(
      Seq((1L, page)).toDF("doc_id", "html"),
      minWords = 2, maxLinkPermille = 500).head()
    assert(got.getAs[Long]("n_lines") === 7)
    assert(got.getAs[Long]("n_content") === 3)
    // nested tags inside the anchor strip to its visible text ("bold
    // link", 9 chars) for the density test; the UPPERCASE anchor must
    // count as link text too (a case-sensitive capture would leak the
    // chrome line as prose); kept lines come back in order as their
    // VISIBLE text
    assert(got.getAs[String]("content") ===
      "abcde fghi\none two three\nbold link plus trailing prose words here")
    assert(got.getAs[Long]("boiler_permille") === (1000L * 4) / 7)
  }

  test("cleanInvisible strips zero-width/BiDi/soft-hyphen and counts them") {
    import spark.implicits._
    val rows = Seq(
      (1L, "plain ascii text"),
      (2L, "a\u200bb\u200fc\u00add\u202ae\u2060f\ufeffg"),
      (3L, "\u200b\u200f\u00ad")) // only invisibles -> empty
    val got = TextAnalysis.cleanInvisible(rows.toDF("doc_id", "text"))
      .orderBy(col("doc_id"))
      .select(col("n_invisible").cast("int"), col("clean_text")).collect()
    assert(got(0).getInt(0) === 0 &&
      got(0).getString(1) === "plain ascii text")
    assert(got(1).getInt(0) === 6 && got(1).getString(1) === "abcdefg",
      "every invisible class member must strip")
    assert(got(2).getInt(0) === 3 && got(2).getString(1) === "")
  }

  test("charDiversity: exact collision index, runs flagged, unicode chars") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "aabb"),        // ss=8,  n=4  -> 500000, drop
      (2L, "abcdefghij"),  // ss=10, n=10 -> 100000, keep
      (3L, "héé")) // chars h,é,é: ss=5, n=3 -> 555555, drop
    val got = TextAnalysis.charDiversity(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chars_counted"), r.getAs[Long]("distinct_chars"),
          r.getAs[Long]("collision_e6"), r.getAs[Boolean]("keep")))).toMap
    assert(got(1L) === ((4L, 2L, 500000L, false)))
    assert(got(2L) === ((10L, 10L, 100000L, true)))
    // unicode: é counts as ONE char (code point), not two utf-8 bytes
    assert(got(3L) === ((3L, 2L, 555555L, false)))
  }

  test("charDiversity separates the natural corpus from planted runs") {
    val planted = docs.withColumn("text",
      when(col("doc_id") % 23 === 0,
        concat(col("text"), lit(" " + "z" * 400)))
        .otherwise(col("text")))
    val byKeep = TextAnalysis.charDiversity(planted)
      .withColumn("is_planted", col("doc_id") % 23 === 0)
      .groupBy("is_planted", "keep").count()
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2))
      .toMap
    // every planted doc drops, every natural doc keeps
    assert(!byKeep.contains((true, true)) && !byKeep.contains((false, false)),
      s"threshold failed to separate: $byKeep")
  }

  test("tfIdfTopTerms: k rows per doc, ranked by score then term") {
    val top = TextAnalysis.tfIdfTopTerms(docs.limit(20), k = 3).cache()
    val counts = top.groupBy("doc_id").count().collect()
    assert(counts.forall(_.getAs[Long]("count") <= 3))
    top.collect().groupBy(_.getAs[Long]("doc_id")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      val scores = sorted.map(_.getAs[Long]("score"))
      assert(scores.sameElements(scores.sorted.reverse))
    }
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val s1 = TextAnalysis.stratifiedSample(docs, "lang",
      Map("en" -> 0.2), defaultRate = 0.8)
    val s2 = TextAnalysis.stratifiedSample(docs, "lang",
      Map("en" -> 0.2), defaultRate = 0.8)
    assert(s1.select("doc_id").exceptAll(s2.select("doc_id")).count() === 0)
    val enRate = s1.filter(col("lang") === "en").count().toDouble /
      docs.filter(col("lang") === "en").count()
    val otherRate = s1.filter(col("lang") =!= "en").count().toDouble /
      docs.filter(col("lang") =!= "en").count()
    assert(enRate < 0.35 && otherRate > 0.6) // near 0.2 / 0.8 given 500 docs
  }

  test("text stats: counts are consistent") {
    val st = TextAnalysis.stats(docs).select("doc_id", "n_tokens", "n_chars_m").collect()
    st.foreach { r => assert(r.getAs[Int]("n_tokens") > 0) }
  }

  test("qualityScore bounded 0..4 and keep = quality>=3") {
    val q = TextAnalysis.qualityScore(docs)
    assert(q.filter(col("quality") < 0 || col("quality") > 4).count() === 0)
    assert(q.filter(col("keep") =!= (col("quality") >= 3)).count() === 0)
  }

  test("languageId picks a language with marker hits or 'und'") {
    val l = TextAnalysis.languageId(docs)
    assert(l.filter(col("predicted_lang") === "und" && col("score_en") > 0).count() === 0)
  }

  test("blockBitsFor keeps expected cell size bounded under 10x corpus growth") {
    import org.scalacheck.Gen
    val gen = for {
      n <- Gen.choose(1L, 1000000000000L) // up to 1e12 rows
      t <- Gen.choose(64L, 65536L)
    } yield (n, t)
    forAllGen(gen) { case (n, t) =>
      val bits = Similarity.blockBitsFor(n, t, maxBits = 62)
      // expected cell cardinality never exceeds the target...
      assert(n.toDouble / (1L << bits) <= t.toDouble)
      // ...and blocking is minimal: one fewer bit would break the bound
      if (bits > 0) assert(n.toDouble / (1L << (bits - 1)) > t.toDouble)
      // 10x the rows: the SAME target still bounds the cell size, so
      // within-cell (quadratic) pair work stays linear in corpus size
      val bits10 = Similarity.blockBitsFor(10 * n, t, maxBits = 62)
      assert(10.0 * n / (1L << bits10) <= t.toDouble)
    }
  }

  test("canonicalPerCluster keeps best quality, ties to smallest id") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "cluster")
    val scored = Seq((1L, 2, 100L), (2L, 4, 50L), (3L, 4, 60L),
      (7L, 1, 10L), (8L, 1, 20L)).toDF("doc_id", "quality", "n_tokens")
    val out = graft.ops.Curation.canonicalPerCluster(clusters, scored)
      .orderBy("cluster").collect()
    // cluster 1: quality 4 tie between 2 and 3 -> 2; drops tokens of 1 and 3
    assert(out(0).getLong(1) === 2L && out(0).getInt(2) === 4)
    assert(out(0).getLong(3) === 3L && out(0).getLong(4) === 160L)
    // cluster 7: quality tie 1 -> smaller id 7; drops 8's 20 tokens
    assert(out(1).getLong(1) === 7L && out(1).getLong(4) === 20L)
  }

  test("tokenBudgetSample fills the budget best-quality-first, exactly once") {
    import spark.implicits._
    val scored = (0L until 400L)
      .map(i => (i, (i % 5).toInt, 10L)).toDF("doc_id", "quality", "n_tokens")
    val picked = graft.ops.Curation
      .tokenBudgetSample(scored, budgetTokens = 1000L, nBuckets = 8)
    val rows = picked.collect()
    // never over budget, and within one doc of filling it (all docs are
    // 10 tokens, 4000 available)
    val total = rows.map(_.getLong(2)).sum
    assert(total <= 1000L && total > 990L)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // best-quality-first: the 80 quality-4 docs all make the cut before
    // any lower band fills the remainder
    assert(rows.count(_.getInt(1) === 4) === 80)
    assert(rows.count(_.getInt(1) === 3) === 20)
    // rerun-stable (hash-ranked, no RNG)
    val again = graft.ops.Curation
      .tokenBudgetSample(scored, budgetTokens = 1000L, nBuckets = 8)
      .collect().map(_.getLong(0)).sorted
    assert(again === rows.map(_.getLong(0)).sorted)
  }

  test("packSequences tiles each stream with no gaps or overlaps") {
    import spark.implicits._
    val docs = (0L until 200L)
      .map(i => (i, ("w " * (1 + (i % 37).toInt)).trim)).toDF("doc_id", "text")
    val out = graft.ops.Curation
      .packSequences(docs, seqLen = 64, nStreams = 4).collect()
    assert(out.length === 200)
    // per stream: intervals [cum-n, cum) partition [0, total) exactly —
    // reconstruct from (first_seq, offset_in_first, n_tokens)
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val starts = rows.map(r => r.getLong(3) * 64 + r.getLong(5)).sorted
      val byStart = rows.sortBy(r => r.getLong(3) * 64 + r.getLong(5))
      var expectedStart = 0L
      byStart.foreach { r =>
        val start = r.getLong(3) * 64 + r.getLong(5)
        assert(start === expectedStart)
        expectedStart = start + r.getLong(2)
        // last_seq is the window holding the doc's final token
        assert(r.getLong(4) === (start + r.getLong(2) - 1) / 64)
      }
      assert(starts.distinct.length === rows.length)
    }
  }

  test("shuffleRank is a permutation of 0..n-1, stable across reruns") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => Tuple1(i)).toDF("doc_id")
    val out = graft.ops.Curation.shuffleRank(docs, nBuckets = 8).collect()
    val pos = out.map(_.getLong(1)).sorted
    assert(pos === (0L until 300L).toArray)
    // deterministic: same order both runs, and not the identity order
    val again = graft.ops.Curation.shuffleRank(docs, nBuckets = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall(r => again(r.getLong(0)) === r.getLong(1)))
    assert(out.exists(r => r.getLong(0) !== r.getLong(1)))
  }

  test("l2Normalize brings any vector to unit norm; zero vector unchanged") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(300.0f, -400.0f)),   // far outside the quantize range
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = vecs.select(col("vec_id"),
        graft.ops.Similarity.l2Normalize(col("embedding")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(math.abs(out(1L).map(x => x * x).sum - 1.0f) < 1e-6)
    assert(out(1L)(0) === 0.6f && out(1L)(1) === -0.8f)
    assert(out(2L) === Seq(0.0f, 0.0f))
  }

  test("quantizeInt8 bounds, sign-preserves, and zero-vector safe") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-2.0f, 1.0f, 2.0f, -0.5f))).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.quantizeInt8(vecs)
      .select("vec_id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // max|x| maps to ±127, zero to 0, signs preserved, all in [-127,127]
    assert(out(1L) === Seq(64L, -127L, 32L, 0L))
    assert(out(2L) === Seq(0L, 0L, 0L, 0L))
    assert(out(3L) === Seq(-127L, 64L, 127L, -32L))
    assert(out.values.flatten.forall(q => q >= -127L && q <= 127L))
  }

  test("chunkDocuments covers every token; overlap stitches chunks") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 40).map(i => s"t$i").mkString(" ")), // 40 toks -> 3 chunks
      (2L, "a b c")).toDF("doc_id", "text")           // short -> 1 chunk
    val out = graft.ops.TextAnalysis
      .chunkDocuments(docs, chunkTokens = 16, overlapTokens = 4)
      .collect().groupBy(_.getLong(0))
    val d1 = out(1L).sortBy(_.getLong(1))
    assert(d1.length === 3)
    // starts advance by stride 12; each chunk holds <= 16 tokens and the
    // first 4 tokens of chunk i+1 repeat the last 4 of chunk i
    val texts = d1.map(_.getString(2))
    assert(texts(0).split(" ").length === 16)
    assert(texts(1).split(" ").take(4) === texts(0).split(" ").takeRight(4))
    // last chunk: tokens 25..40 (start 24), exactly 16
    assert(texts(2).split(" ").head === "t25" && d1(2).getLong(3) === 16L)
    // every token appears in some chunk
    assert(d1.flatMap(_.getString(2).split(" ")).distinct.length === 40)
    assert(out(2L).length === 1 && out(2L).head.getString(2) === "a b c")
  }

  test("topBigrams counts adjacent pairs with deterministic tie-break") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.topBigrams(docs, k = 3).collect()
    // pairs: doc1 = (a b),(b a),(a b),(b c); doc2 = (a b),(b x)
    assert(out(0).getString(1) === "a b" && out(0).getLong(2) === 3L)
    // count-1 ties order lexicographically: "b a" < "b c" < "b x"
    assert(out(1).getInt(0) === 2 && out(1).getString(1) === "b a")
    assert(out(2).getString(1) === "b c")
  }

  test("property: packSequences tiles exactly for random corpora and params") {
    import spark.implicits._
    import org.scalacheck.Gen
    val gen = for {
      nDocs <- Gen.choose(1, 120)
      lens <- Gen.listOfN(nDocs, Gen.choose(1, 50))
      seqLen <- Gen.oneOf(16, 64, 256)
      streams <- Gen.oneOf(1, 3, 8)
    } yield (lens, seqLen, streams)
    forAllGen(gen, cases = 5) { case (lens, seqLen, streams) =>
      val docs = lens.zipWithIndex
        .map { case (n, i) => (i.toLong, ("w " * n).trim) }.toDF("doc_id", "text")
      val out = graft.ops.Curation
        .packSequences(docs, seqLen, nStreams = streams).collect()
      assert(out.length === lens.length)
      out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
        var expected = 0L
        rows.sortBy(r => r.getLong(3) * seqLen + r.getLong(5)).foreach { r =>
          val start = r.getLong(3) * seqLen + r.getLong(5)
          assert(start === expected, "gap or overlap in the stream tiling")
          expected = start + r.getLong(2)
          assert(r.getLong(4) === (start + r.getLong(2) - 1) / seqLen)
        }
      }
    }
  }

  test("property: chunkDocuments reconstructs every document exactly") {
    import spark.implicits._
    import org.scalacheck.Gen
    val gen = for {
      lens <- Gen.listOfN(20, Gen.choose(1, 80))
      chunk <- Gen.choose(4, 24)
      overlap <- Gen.choose(0, 3)
    } yield (lens, chunk, overlap)
    forAllGen(gen, cases = 5) { case (lens, chunk, overlap) =>
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(j => s"t$j").mkString(" "))
      }.toDF("doc_id", "text")
      val stride = chunk - overlap
      val out = graft.ops.TextAnalysis
        .chunkDocuments(docs, chunk, overlap).collect()
        .groupBy(_.getLong(0))
      lens.zipWithIndex.foreach { case (n, i) =>
        val chunks = out(i.toLong).sortBy(_.getLong(1))
        // stitch: chunk 0 whole, then drop the overlap from each next
        val rebuilt = chunks.head.getString(2).split(" ").toSeq ++
          chunks.tail.toSeq.flatMap(_.getString(2).split(" ").drop(overlap).toSeq)
        assert(rebuilt === (1 to n).map(j => s"t$j"),
          s"doc of $n tokens, chunk=$chunk overlap=$overlap")
      }
    }
  }

  test("property: shuffleRank matches the driver-computed global hash order") {
    import spark.implicits._
    import org.scalacheck.Gen
    forAllGen(Gen.listOfN(60, Gen.choose(0L, 100000L)).map(_.distinct),
      cases = 5) { ids =>
      val docs = ids.map(Tuple1(_)).toDF("doc_id")
      val got = graft.ops.Curation.shuffleRank(docs, nBuckets = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference order computed driver-side with the same hash
      val md = java.security.MessageDigest.getInstance("MD5")
      def h60(s: String): Long = {
        val hex = md.digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16)
      }
      val expect = ids.sortBy(id => (h60(s"shuffle|$id"), id))
        .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
      assert(got === expect)
    }
  }

  test("mixtureWeights: integer shares sum to ~1e6 and the cap binds") {
    import spark.implicits._
    val docs = (0L until 300L).map { i =>
      val src = if (i < 280) "srcBig" else "srcRare"
      (i, "w " * 20 + "w", "en", src)
    }.toDF("doc_id", "text", "lang", "source")
    // no .otherwise: srcBig's target is NULL and must default to 1,
    // NOT silently take the cap
    val out = graft.ops.Curation.mixtureWeights(docs, "source",
      targetUnits = when(col("source") === "srcRare", 9L),
      maxWeightE6 = 5000000L).collect()
    val bySrc = out.map(r => r.getString(0) -> r).toMap
    val shareSum = out.map(_.getLong(3)).sum
    assert(shareSum > 999900L && shareSum <= 1000000L)
    // rare domain is steered up; the cap binds (9x target on a tiny
    // share would exceed 5x)
    assert(bySrc("srcRare").getLong(5) === 5000000L)
    assert(bySrc("srcBig").getLong(5) < 1000000L)
  }

  test("dupNgramCoverage: hand-computed Gopher repetition coverage") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a b"), // every 3-gram duplicated: full coverage
      (2L, "x y z w"),     // both grams unique: zero coverage
      (3L, "p q")          // shorter than n: no grams at all
    ).toDF("doc_id", "text")
    val out = graft.ops.Curation.dupNgramCoverage(df, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // doc 1: grams (a b a)x2 (b a b)x2; positions 0..3 cover tokens 0..5
    assert(out(1L) === ((6, 4L, 2L, 10000L)))
    assert(out(2L) === ((4, 2L, 1L, 0L)))
    assert(out(3L) === ((2, 0L, 0L, 0L)))
  }

  test("weightedSample: endpoints, determinism, threshold monotonicity") {
    val scored = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality"))
    val n = docs.count()
    assert(graft.ops.Curation.weightedSample(scored, lit(10000L)).count() === n)
    assert(graft.ops.Curation.weightedSample(scored, lit(0L)).count() === 0)
    // clamping: an out-of-range weight behaves like its clamp
    assert(graft.ops.Curation.weightedSample(scored, lit(99999L)).count() === n)
    val ids = (w: Long) => graft.ops.Curation
      .weightedSample(scored, lit(w)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val quarter = ids(2500L)
    // deterministic rerun, and a larger threshold keeps a superset
    assert(quarter === ids(2500L))
    assert(quarter.subsetOf(ids(7500L)))
    // the draw is roughly uniform: 25% +- 10 points at 500 docs
    assert(math.abs(quarter.size.toDouble / n - 0.25) < 0.10)
  }

  test("ngramDiversity: hand-computed distinct/total gram ratios") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c", "en", "srcA"), // abc x2, bca, cab
      (2L, "a a a a", "en", "srcB")      // aaa x2
    ).toDF("doc_id", "text", "lang", "source")
    val out = graft.ops.TextAnalysis.ngramDiversity(df, n = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out("srcA") === ((4L, 3L, 2L, 7500L)))
    assert(out("srcB") === ((2L, 1L, 0L, 5000L)))
  }

  test("temperatureMixture: isqrt weights upweight small sources exactly") {
    import spark.implicits._
    // perfect-square token counts: 16 and 4 tokens -> isqrt 4 and 2
    val df = Seq(
      (1L, ("w " * 15) + "w", "en", "srcBig"),
      (2L, "w w w w", "en", "srcSmall")).toDF("doc_id", "text", "lang", "source")
    val out = graft.ops.Curation.temperatureMixture(df, "source").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("srcBig").getAs[Long]("isqrt_tokens") === 4L)
    assert(out("srcSmall").getAs[Long]("isqrt_tokens") === 2L)
    assert(out("srcBig").getAs[Long]("share_e6") === 800000L)
    assert(out("srcBig").getAs[Long]("weight_e6") === 666666L)
    assert(out("srcSmall").getAs[Long]("weight_e6") === 333333L)
    // alpha=0.5 compresses: the small source's weight exceeds its share
    assert(out("srcSmall").getAs[Long]("weight_e6") >
      out("srcSmall").getAs[Long]("share_e6"))
  }

  test("property: luhnRedact accepts exactly the constructed check digits") {
    import org.scalacheck.Gen
    import spark.implicits._
    // generate 14-18 digit prefixes; compute the correct Luhn check
    // digit driver-side; the op must redact the valid completion and
    // leave the off-by-one completion alone
    val gen = for {
      len <- Gen.choose(14, 18)
      ds <- Gen.listOfN(len - 1, Gen.choose(0, 9))
      first <- Gen.choose(1, 9) // no leading zero
    } yield (first :: ds).mkString
    def checkDigit(prefix: String): Int = {
      // digits of (prefix + d) right-to-left: d is position 1 (odd,
      // undoubled), so prefix positions start at 2 = doubled
      val sum = prefix.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 0) { val t = 2 * d; if (t > 9) t - 9 else t } else d
      }.sum
      (10 - sum % 10) % 10
    }
    forAllGen(gen, cases = 30) { prefix =>
      val valid = prefix + checkDigit(prefix)
      val invalid = prefix + ((checkDigit(prefix) + 1) % 10)
      val out = TextAnalysis.luhnRedact(
        Seq((1L, s"v $valid v"), (2L, s"i $invalid i"))
          .toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("n_card_numbers")).toMap
      assert(out(1L) === 1L, s"valid $valid not redacted")
      assert(out(2L) === 0L, s"invalid $invalid redacted")
    }
  }

  test("lshVerifiedPairs: exact Jaccard verifies candidates, subset of LSH") {
    // plant an exact duplicate: candidates must contain it and verify
    // it at jaccard_e4 = 10000 with n_common = n_a = n_b
    val dup = docs.filter(col("doc_id") === 0)
      .withColumn("doc_id", lit(8888L))
    val corpus = docs.union(dup)
    val verified = graft.ops.Dedup.lshVerifiedPairs(corpus)
    val hit = verified.filter(col("doc_a") === 0 && col("doc_b") === 8888)
      .collect()
    assert(hit.length === 1)
    assert(hit.head.getAs[Long]("jaccard_e4") === 10000L)
    assert(hit.head.getAs[Long]("n_common") === hit.head.getAs[Long]("n_a"))
    // verified output is a subset of the raw LSH candidates
    val sig = graft.ops.Dedup.minhashSignatures(corpus, 8, 3)
    val cand = graft.ops.Dedup.lshCandidatePairs(sig, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ver = verified.select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ver.subsetOf(cand))
  }

  test("luhnRedact validates the checksum, not just the digit pattern") {
    import spark.implicits._
    val df = Seq(
      (1L, "pay with 4532015112830366 now"),     // valid Luhn
      (2L, "pay with 4532015112830367 now"),     // bad check digit
      (3L, "order 123456789012 shipped"),        // 12 digits: no match
      (4L, "cards 4532015112830366 and 4111111111111111 both valid"),
      (5L, "no digits here")).toDF("doc_id", "text")
    val out = TextAnalysis.luhnRedact(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_card_numbers"), r.getAs[String]("redacted_cards"))))
      .toMap
    assert(out(1L) === ((1L, "pay with <CARD> now")))
    assert(out(2L) === ((0L, "pay with 4532015112830367 now")))
    assert(out(3L) === ((0L, "order 123456789012 shipped")))
    assert(out(4L) === ((2L, "cards <CARD> and <CARD> both valid")))
    // 79927398713 (the classic Luhn example) is 11 digits: too short
    // for a card pattern, so it must NOT be redacted
    val short = TextAnalysis.luhnRedact(
      Seq((9L, "id 79927398713 ok")).toDF("doc_id", "text")).head()
    assert(short.getAs[Long]("n_card_numbers") === 0L)
    assert(out(5L) === ((0L, "no digits here")))
    // a valid card EMBEDDED in a longer non-candidate digit run must
    // stay untouched — replace is boundary-anchored, not substring
    val embedded = TextAnalysis.luhnRedact(
      Seq((10L, "card 4532015112830366 ref 94532015112830366123 end"))
        .toDF("doc_id", "text")).head()
    assert(embedded.getAs[Long]("n_card_numbers") === 1L)
    assert(embedded.getAs[String]("redacted_cards") ===
      "card <CARD> ref 94532015112830366123 end")
  }

  test("qualityEnsemble: every doc labeled once, reason = first failing rule") {
    val out = graft.ops.Curation.qualityEnsemble(docs,
      minQuality = 3, minLmE6 = 34000L, maxRareE6 = 20000L,
      maxDupCovE4 = 500L).collect()
    assert(out.length === docs.count())
    val reasons = out.map(_.getAs[String]("reject_reason")).distinct.toSet
    // thresholds were chosen so every rule fires on this corpus
    assert(reasons === Set("quality", "lm_score", "oov", "repetition", "kept"))
    out.foreach { r =>
      val expected =
        if (r.getAs[Int]("quality") < 3) "quality"
        else if (r.getAs[Long]("lm_score_e6") < 34000L) "lm_score"
        else if (r.getAs[Long]("rare_rate_e6") > 20000L) "oov"
        else if (r.getAs[Long]("dup_cov_e4") > 500L) "repetition"
        else "kept"
      assert(r.getAs[String]("reject_reason") === expected)
      assert(r.getAs[Int]("keep") === (if (expected == "kept") 1 else 0))
    }
  }

  test("vocabCoverage: hand-computed coverage shares, monotone in N") {
    import spark.implicits._
    val df = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.vocabCoverage(df, ns = Seq(1, 2, 3))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1) === ((1L, 3L, 6L, 500000L)))   // "a" covers 3/6
    assert(out(2) === ((2L, 5L, 6L, 833333L)))   // +"b" covers 5/6
    assert(out(3) === ((3L, 6L, 6L, 1000000L)))  // full vocab
    // real corpus: coverage is monotone in N and bounded by 1e6
    val cov = graft.ops.TextAnalysis.vocabCoverage(docs, ns = Seq(5, 50))
      .collect().map(r => r.getInt(0) -> r.getLong(4)).toMap
    assert(cov(5) <= cov(50) && cov(50) <= 1000000L)
  }

  test("kmeansAssign: hand-traced 2D Lloyd round, exact integer dists") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.75f, 0.25f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.25f, 0.75f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(e, k = 2, iters = 1, dims = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // seeds (1e7,0), (7.5e6,2.5e6); after one update c0=(1e7,0) holds only
    // v0 while c1 = floor-mean(v1,v2,v3) = (3333333, 6666666); the final
    // assignment pulls v1 back to c0 — the classic Lloyd migration — at
    // exact squared distance 2*(2.5e6)^2
    assert(out(0L) === ((0L, 0L)))
    assert(out(1L) === ((0L, 2L * 2500000L * 2500000L)))
    assert(out(2L)._1 === 1L)
    assert(out(3L)._1 === 1L)
  }

  test("kmeansAssign: real embeddings fully assigned inside cid domain") {
    val e = Tables.load(spark, sf, "embeddings")
    val rows = Similarity.kmeansAssign(e, k = 4, iters = 2).collect()
    assert(rows.length.toLong === e.count())
    assert(rows.map(_.getLong(1)).forall(c => c >= 0 && c < 4))
    assert(rows.map(_.getLong(1)).distinct.length > 1, "degenerate clustering")
  }

  test("semDedup: near-dups drop to the smallest id within a cluster") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.75f, 0.25f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.25f, 0.75f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(e, k = 2, iters = 1, minCosine = 0.9, dims = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // clusters {0,1} and {2,3}; within-cluster cosine ≈ 0.9487 in both, so
    // the larger id of each pair drops and the smaller survives
    assert(out(0L) === ((2L, 1L, 1L, 0L)))
    assert(out(1L) === ((2L, 1L, 1L, 2L)))
    // below the threshold nothing drops
    val none = Similarity.semDedup(e, k = 2, iters = 1, minCosine = 0.99, dims = 2)
      .collect().map(_.getLong(2)).sum
    assert(none === 0L)
  }

  test("blocklistFilter drops exactly the blocked domains") {
    import spark.implicits._
    val blocked = Seq("src1", "src3").toDF("domain")
    val kept = graft.ops.Curation.blocklistFilter(docs, blocked)
    val keptSources = kept.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(!keptSources.contains("src1") && !keptSources.contains("src3"))
    // nothing else was dropped
    val expected = docs.filter(!col("source").isin("src1", "src3")).count()
    assert(kept.count() === expected)
  }

  test("normalize maps raw text onto the corpus contract") {
    val df = Seq(
      (1L, "  Hello, World!!  It's   90% FINE.  "),
      (2L, "..."),
      (3L, "already clean text")).toDF("doc_id", "text")
    val out = TextAnalysis.normalize(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(out(1L) === (("hello world it s 90 fine", 6L)))
    // all-punctuation input collapses to empty, counted as 0 tokens
    assert(out(2L) === (("", 0L)))
    assert(out(3L) === (("already clean text", 3L)))
  }

  test("trimSharedSpans removes exactly the cross-document windows") {
    // docs 1 and 2 share the 3-token span "p q r"; doc 3 is untouched;
    // doc 4 is entirely a copy of doc 1's shared region
    val df = Seq(
      (1L, "u1 u2 p q r u3"),
      (2L, "v1 p q r v2 v3"),
      (3L, "w1 w2 w3 w4"),
      (4L, "p q r")).toDF("doc_id", "text")
    val out = Dedup.trimSharedSpans(df, windowTokens = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((6L, 3L, "u1 u2 u3")))
    assert(out(2L) === ((6L, 3L, "v1 v2 v3")))
    assert(out(3L) === ((4L, 0L, "w1 w2 w3 w4")))
    // fully-shared doc comes back empty, not missing
    assert(out(4L) === ((3L, 3L, "")))
  }

  test("lineDedup drops corpus-repeated lines, rebuilds docs in order") {
    // the footer line repeats across docs 1-3 (case/whitespace variant
    // included — hashing is on the trimmed lowercase form); doc 4 is
    // nothing but boilerplate; doc 5 is untouched
    val df = Seq(
      (1L, "alpha one\nCopyright Footer\nalpha two"),
      (2L, "beta one\ncopyright footer \nbeta two"),
      (3L, "Copyright Footer\ngamma only"),
      (4L, "copyright footer"),
      (5L, "delta a\ndelta b")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // original line text survives (not the normalized form), order kept
    assert(out(1L) === ((3L, 1L, "alpha one\nalpha two")))
    assert(out(2L) === ((3L, 1L, "beta one\nbeta two")))
    assert(out(3L) === ((2L, 1L, "gamma only")))
    assert(out(4L) === ((1L, 1L, "")))
    assert(out(5L) === ((2L, 0L, "delta a\ndelta b")))
    // a line repeated WITHIN one doc only is not boilerplate
    val within = Seq((1L, "same\nsame\nother")).toDF("doc_id", "text")
    val w = Dedup.lineDedup(within).collect().head
    assert((w.getLong(1), w.getLong(2), w.getString(3)) ===
      ((3L, 0L, "same\nsame\nother")))
    // maxDocs raises the tolerance: the footer lives in 4 docs, so it
    // survives at maxDocs=4
    val tol = Dedup.lineDedup(df, maxDocs = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(tol.values.forall(_ === 0L))
  }

  test("trimSharedSpans: overlapping shared windows cover their union") {
    // "a b c d" appears in both docs => in doc 1 the two 3-windows
    // (a b c) and (b c d) both match, covering positions 1..4 of doc 1
    val df = Seq(
      (1L, "x a b c d y"),
      (2L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.trimSharedSpans(df, windowTokens = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((6L, 4L, "x y")))
    assert(out(2L) === ((4L, 4L, "")))
  }

  test("property: trimSharedSpans bookkeeping holds on random corpora") {
    import org.scalacheck.Gen
    // tiny vocab forces genuine cross-doc window sharing
    val word = Gen.oneOf("a", "b", "c")
    val gen = for {
      nDocs <- Gen.choose(2, 24)
      texts <- Gen.listOfN(nDocs,
        Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" "))))
    } yield texts
    forAllGen(gen, cases = 5) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val W = 3
      val out = Dedup.trimSharedSpans(docs, W).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(out.size === texts.length, "every input doc must come back")
      texts.zipWithIndex.foreach { case (t, i) =>
        val (nTok, nRem, keptText) = out(i.toLong)
        val toks = t.split(" ")
        assert(nTok === toks.length)
        assert(nRem >= 0 && nRem <= nTok)
        val kept = if (keptText.isEmpty) Array.empty[String]
          else keptText.split(" ")
        assert(kept.length === nTok - nRem)
        // kept tokens are a subsequence of the original token stream
        var j = 0
        kept.foreach { k =>
          while (j < toks.length && toks(j) != k) j += 1
          assert(j < toks.length, s"'$k' not a subsequence token in doc $i")
          j += 1
        }
        // a doc shorter than the window can never lose tokens
        if (toks.length < W) assert(nRem === 0)
      }
    }
  }

  test("property: lm/oov/featureHash invariants on random corpora") {
    import org.scalacheck.Gen
    val word = Gen.oneOf("a", "b", "c", "d")
    val gen = for {
      nDocs <- Gen.choose(1, 16)
      texts <- Gen.listOfN(nDocs,
        Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" "))))
    } yield texts
    forAllGen(gen, cases = 4) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val nTokens = texts.map(_.split(" ").length)
      // lmScore: probabilities live in (0, 1e6]; docs with >=2 tokens
      // appear with n_bigrams = len-1; 1-token docs are absent
      val lm = graft.ops.TextAnalysis.lmScore(docs).collect()
      assert(lm.length === nTokens.count(_ >= 2))
      lm.foreach { r =>
        assert(r.getLong(1) === nTokens(r.getLong(0).toInt) - 1)
        assert(r.getLong(2) > 0 && r.getLong(2) <= 1000000L)
      }
      // oovRate: counts bounded, rate consistent with the counts
      val oov = graft.ops.TextAnalysis.oovRate(docs, rareShareDenom = 4L)
        .collect()
      assert(oov.length === texts.length)
      oov.foreach { r =>
        assert(r.getLong(1) === nTokens(r.getLong(0).toInt).toLong)
        assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
        assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1))
      }
      // featureHash: bucket in range; total |feat| bounded by tokens;
      // the sum over buckets equals the sum of instance signs, so the
      // corpus-wide |sum| can never exceed the corpus token count
      val fh = graft.ops.TextAnalysis.featureHash(docs, dims = 8).collect()
      fh.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < 8))
      val byDoc = fh.groupBy(_.getLong(0))
      byDoc.foreach { case (id, rows) =>
        assert(rows.map(r => math.abs(r.getLong(2))).sum <=
          nTokens(id.toInt).toLong)
      }
    }
  }

  test("lmScore: hand-computed bigram conditional probabilities") {
    // corpus bigrams: "a b"x3, "b a"x1, "b c"x1; prefixes: a->3, b->2
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: (a b, m=2, p=1e6) + (b a, m=1, p=5e5) => 2.5e6 DIV 3
    assert(out(1L) === ((3L, 833333L)))
    // doc 2: (a b, 1e6) + (b c, 5e5) => 1.5e6 DIV 2
    assert(out(2L) === ((2L, 750000L)))
  }

  test("lmScoreKneserNey: hand-traced discount + continuation; d=0 = lmScore") {
    // types: (a,b) c2=3, (b,a) 1, (b,c) 1; prefixes a->3, b->2;
    // followers a->1, b->2; predecessors a/b/c -> 1 each; 3 types.
    // (a,b): (3e6-75e4)//3 + ((75e4*1)//3 * 333333)//1e6 = 750000+83333
    // (b,a)=(b,c): (1e6-75e4)//2 + ((75e4*2)//2 * 333333)//1e6
    //            = 125000+249999
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScoreKneserNey(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((3L, (2 * 833333L + 374999L) / 3)))   // 680555
    assert(out(2L) === ((2L, (833333L + 374999L) / 2)))       // 604166
    // zero discount kills both the subtraction and the continuation
    // term: KN(0) must equal the raw conditional scorer bit for bit
    val kn0 = TextAnalysis.lmScoreKneserNey(df, discountE6 = 0L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val plain = TextAnalysis.lmScore(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(kn0 === plain)
    // on the real corpus: probabilities stay in (0, 1e6]
    val corpus = TextAnalysis.lmScoreKneserNey(docs).collect()
      .map(_.getLong(2))
    assert(corpus.forall(v => v > 0 && v <= 1000000L))
  }

  test("oovRate: share-relative rarity flags only the low-share token") {
    // x: 9/10 share, y: 1/10; denom 5 => rare iff share < 1/5 => only y
    val df = Seq((1L, "x x x x y"), (2L, "x x x x x")).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(df, rareShareDenom = 5L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) === ((5L, 1L, 200000L)))
    assert(out(2L) === ((5L, 0L, 0L)))
  }

  test("featureHash: buckets and signs match the h60 contract exactly") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val df = Seq((1L, "a b a"), (2L, "c")).toDF("doc_id", "text")
    val out = TextAnalysis.featureHash(df, dims = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def expect(tokens: Seq[String]): Map[Long, Long] =
      tokens.groupBy(w => h60(w) % 64).view.mapValues(_.map { w =>
        if (((h60(w) >> 32) & 1L) == 1L) -1L else 1L
      }.sum).toMap
    val e1 = expect(Seq("a", "b", "a"))
    val e2 = expect(Seq("c"))
    assert(out === (e1.map { case (b, f) => (1L, b) -> f } ++
      e2.map { case (b, f) => (2L, b) -> f }))
    // signed sums: |feat| per bucket never exceeds the token count
    assert(out.values.forall(f => math.abs(f) <= 3))
  }

  test("dotq kernel: exact values, null propagation, mismatch + overflow errors") {
    import spark.implicits._
    import graft.functions.VectorExpressions.dotq
    // exact value vs a Scala reference on signed fixtures
    val a = Array(3L, -2L, 7L, 0L)
    val b = Array(-1L, 5L, 2L, 9L)
    val df = Seq((a, b)).toDF("a", "b").select(dotq(col("a"), col("b")))
    assert(df.head().getLong(0) === a.zip(b).map { case (x, y) => x * y }.sum)
    // null array -> null result (nullSafeEval contract)
    val n = Seq((Option.empty[Array[Long]], Some(b))).toDF("a", "b")
      .select(dotq(col("a"), col("b")))
    assert(n.head().isNullAt(0))
    // length mismatch is an error, not a silent zip-truncation
    val m = Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
      .select(dotq(col("a"), col("b")))
    assertThrows[Exception](m.head())
    // overflow raises (addExact/multiplyExact), never wraps
    val o = Seq((Array(Long.MaxValue), Array(2L))).toDF("a", "b")
      .select(dotq(col("a"), col("b")))
    assertThrows[Exception](o.head())
  }

  test("clusterBalancedSample caps each k-means cluster at the quota") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.75f, 0.25f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.25f, 0.75f))
    ).toDF("vec_id", "embedding")
    // clusters {0,1} and {2,3} (see the kmeansAssign trace test); cap 1
    // keeps exactly one hash-chosen member of each
    val one = Similarity.clusterBalancedSample(e, k = 2, iters = 1,
      maxPerCluster = 1, dims = 2).collect()
    assert(one.length === 2)
    assert(one.map(_.getLong(1)).sorted === Array(0L, 1L))
    assert(one.forall(_.getInt(3) === 1))
    // a quota above every cluster size keeps everything
    val all = Similarity.clusterBalancedSample(e, k = 2, iters = 1,
      maxPerCluster = 2, dims = 2)
    assert(all.count() === 4L)
  }

  test("importanceWeight: hand-traced add-1-smoothed ratio average") {
    import spark.implicits._
    val df = Seq(
      (1L, "src1", "a a b"), (2L, "src2", "a c"), (3L, "src2", "c c")
    ).toDF("doc_id", "source", "text")
    val out = Curation.importanceWeight(df, col("source") === "src1")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // tf_r: a=3 b=1 c=3, V=3, TOT_r=7; target tf_t: a=2 b=1, TOT_t=3
    // ratio_e6: a = 3*10e6//(4*6) = 1250000, b = 2*10e6//(2*6) = 1666666,
    //           c = 1*10e6//(4*6) = 416666
    assert(out(1L) === ((3L, (2L * 1250000L + 1666666L) / 3L)))
    assert(out(2L) === ((2L, (1250000L + 416666L) / 2L)))
    assert(out(3L) === ((2L, 416666L)))
    // target docs score above the off-target docs — the selection signal
    assert(out(1L)._2 > out(2L)._2 && out(2L)._2 > out(3L)._2)
  }

  test("embDecontaminate flags same-cell near vectors, leaves the rest clean") {
    import spark.implicits._
    val bench = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0.9f, 0.1f)),  // same cell as bench, cosine ~0.994
      (2L, Array(0.0f, 1.0f)),  // different cell (dim1 not positive)
      (3L, Array(-1.0f, 0.0f))  // different cell
    ).toDF("vec_id", "embedding")
    val out = Similarity.embDecontaminate(corpus, bench, minCosine = 0.9, bits = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L), "every corpus id must appear")
    assert(out(1L)._1 === 1L && out(1L)._3 === 1)
    assert(out(1L)._2 > 0.99 && out(1L)._2 < 1.0)
    assert(out(2L) === ((0L, 0.0, 0)))
    assert(out(3L) === ((0L, 0.0, 0)))
    // a threshold above the pair's cosine clears the flag
    val none = Similarity.embDecontaminate(corpus, bench, minCosine = 0.999, bits = 1)
      .collect().map(_.getInt(3)).sum
    assert(none === 0)
  }

  test("bpeTrainMerges: hand-traced greedy merges with lexicographic ties") {
    import spark.implicits._
    // dict: ab (freq 2, [a,b]), abab (freq 1, [a,b,a,b]), abc (freq 1,
    // [a,b,c]) — merges stay WITHIN words, weighted by word frequency
    val df = Seq((1L, "ab ab abab"), (2L, "abc")).toDF("doc_id", "text")
    val mintedBefore = graft.functions.BpeExpressions.broadcastsMinted.get()
    val out = TextAnalysis.bpeTrainMerges(df, nMerges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // training's per-round rewrites ride as plain reference objects:
    // ZERO merge-table broadcasts minted no matter how many rounds run
    // (a broadcast per round would leak 32k blocks at a real vocab)
    assert(graft.functions.BpeExpressions.broadcastsMinted.get()
      === mintedBefore)
    // round 1: (a,b) = 2·1 + 1·2 + 1·1 = 5 wins over (b,a)=1, (b,c)=1;
    // round 2: freq-1 tie between ("a b","a b") and ("a b","c") breaks
    // on b ascending ("a b" < "c" binary); round 3 merges abc's tail;
    // round 4 finds no pairs left -> training stops early at 3 merges
    assert(out === Array(
      (1, "a", "b", 5L), (2, "a b", "a b", 1L), (3, "a b", "c", 1L)))
  }

  test("bpeTrainMerges: overlapping candidate runs merge left-to-right") {
    import spark.implicits._
    val df = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainMerges(df, nMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // [a,a,a,a] has three overlapping (a,a) pairs but only positions 1
    // and 3 merge (position 2 is consumed); round 2 joins the halves
    assert(out === Array((1, "a", "a", 3L), (2, "a a", "a a", 1L)))
    // degenerate corpus: single-char words hold no within-word pairs,
    // so training learns nothing and stops
    val single = Seq((1L, "x y z")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrainMerges(single, nMerges = 3).count() === 0L)
  }

  test("epochSchedule: caps repetition, redistributes the freed budget") {
    import spark.implicits._
    // two sources of 10 tokens each; s2 wants 3x the budget share
    val ten = "t t t t t t t t t t"
    val df = Seq((1L, "s1", ten), (2L, "s2", ten)).toDF("doc_id", "source", "text")
    val out = Curation.epochSchedule(df, "source",
        targetUnits = expr("case when source = 's1' then 1 else 3 end"),
        budgetTokens = 60L, maxEpochsE2 = 200L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))))
      .toMap
    // s2: want 45 > cap 20 -> capped at 20 (2 epochs); the 25 freed
    // tokens all flow to s1: 15 + 25 = 40 (4 epochs, single-round
    // redistribution may exceed the cap by contract)
    assert(out("s2") === ((10L, 750000L, 20L, 200L, 1)))
    assert(out("s1") === ((10L, 250000L, 40L, 400L, 0)))
    // budget below every cap: proportional allocation, nothing capped
    val loose = Curation.epochSchedule(df, "source",
        targetUnits = lit(1L), budgetTokens = 20L, maxEpochsE2 = 200L)
      .collect().map(r => (r.getLong(3), r.getInt(5)))
    assert(loose.toSeq.sorted === Seq((10L, 0), (10L, 0)))
  }

  test("sourceDivergence: hand-traced total variation with absent-token mass") {
    import spark.implicits._
    val df = Seq(
      (1L, "s1", "a a b"), (2L, "s2", "a c"),
      (3L, "s3", "x y"), (4L, "s4", "x y")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceDivergence(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // p_s1 = {a:2/3, b:1/3}, p_s2 = {a:1/2, c:1/2}:
    // TV = (|2/3-1/2| + 1/3 + 1/2) / 2 = 1/2
    assert(out(("s1", "s2")) === ((1L, 500000L)))
    // identical distributions diverge by exactly zero
    assert(out(("s3", "s4")) === ((2L, 0L)))
    // disjoint-vocabulary pairs are absent by contract (tv would be 1e6)
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s4")))
  }

  test("byte-level BPE: GPT-2 table pinned; trainer matches a byte " +
    "reference; encode emits mapped byte symbols") {
    import graft.functions.{BpeExpressions, BpeKernels}
    // independent re-derivation of bytes_to_unicode (Radford et al.
    // 2019 encoder.py): printable latin-1 kept, others get 256+k
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var k = 0
    val ref = (0 until 256).map { b =>
      if (keep(b)) b else { val cp = 256 + k; k += 1; cp }
    }
    assert(BpeKernels.ByteToCp.toSeq === ref)
    assert(BpeKernels.ByteToCp(32) === 288)  // space -> 'Ġ'
    assert(BpeKernels.ByteToCp(10) === 266)  // newline -> 'Ċ'
    assert(BpeKernels.ByteToCp('a'.toInt) === 'a'.toInt)
    // zero-merge encode exposes the raw symbolization: é = C3 A9 ->
    // [Ã, ©]; ASCII maps to itself
    val df0 = Seq(1L -> "é a").toDF("doc_id", "text")
    val syms = TextAnalysis.bpeEncode(df0, merges = Seq.empty,
        byteLevel = true)
      .head().getAs[collection.Seq[String]]("tokens")
    assert(syms === Seq("Ã", "©", "a"))
    // trainer vs a plain-Scala byte reference on a multi-byte corpus
    def byteSyms(w: String): Seq[String] =
      if (w.isEmpty) Seq("")
      else w.getBytes("UTF-8").toSeq.map(b =>
        new String(Character.toChars(ref(b & 0xff))))
    def refBpeB(seqs0: Seq[Seq[String]],
                n: Int): Seq[(Int, String, String, Long)] = {
      var seqs = seqs0
      val out = Seq.newBuilder[(Int, String, String, Long)]
      var done = false
      for (r <- 1 to n if !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for (s <- seqs; i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) =
            counts.getOrElse((s(i), s(i + 1)), 0L) + 1
        if (counts.isEmpty) done = true
        else {
          val ((a, b), f) = counts.toSeq
            .sortBy { case ((x, y), c) => (-c, x, y) }.head
          out += ((r, a, b, f))
          seqs = seqs.map { s =>
            val buf = Seq.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
                buf += (a + " " + b); i += 2
              } else { buf += s(i); i += 1 }
            }
            buf.result()
          }
        }
      }
      out.result()
    }
    val words = Seq("éé", "aé", "über", "ab", "é")
    val docs2 = Seq(1L -> words.mkString(" "),
      2L -> words.take(3).mkString(" "))
    val got = TextAnalysis.bpeTrainMerges(docs2.toDF("doc_id", "text"),
        nMerges = 3, byteLevel = true).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val wordSeqs = docs2.flatMap(_._2.split(" ").toSeq.map(byteSyms))
    assert(got === refBpeB(wordSeqs, 3))
  }

  test("bpeTrainMerges agrees with a sequential reference BPE trainer") {
    import spark.implicits._
    import org.scalacheck.Gen
    // independent reference over per-WORD symbol sequences (merges never
    // cross word boundaries): count all adjacent within-word pairs over
    // every word INSTANCE (instance counting == dict-frequency
    // weighting), argmax by (freq DESC, a, b), rewrite greedily
    // left-to-right inside each word
    def refBpe(seqs0: Seq[Seq[String]], n: Int): Seq[(Int, String, String, Long)] = {
      var seqs = seqs0
      val out = Seq.newBuilder[(Int, String, String, Long)]
      var done = false
      for (r <- 1 to n if !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for (s <- seqs; i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + 1
        if (counts.isEmpty) done = true
        else {
          val ((a, b), f) = counts.toSeq
            .sortBy { case ((x, y), c) => (-c, x, y) }.head
          out += ((r, a, b, f))
          seqs = seqs.map { s =>
            val buf = Seq.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
                buf += (a + " " + b); i += 2
              } else { buf += s(i); i += 1 }
            }
            buf.result()
          }
        }
      }
      out.result()
    }
    // docs are word LISTS; words are 0-4 chars over {a,b,c} so
    // within-word merges actually occur (and "" exercises the [""]
    // split contract)
    val genWord = Gen.choose(0, 4)
      .flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val gen = Gen.listOfN(4,
      Gen.choose(0, 5).flatMap(l => Gen.listOfN(l, genWord)))
    forAllGen(gen, cases = 6) { docLists =>
      val df = docLists.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.bpeTrainMerges(df, nMerges = 3).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      // empty text still tokenizes to [""]; each word opens to its
      // code-point symbols, "" -> [""] (the split contract)
      def syms(w: String): Seq[String] =
        if (w.isEmpty) Seq("") else w.map(_.toString)
      val wordSeqs = docLists.flatMap(ws =>
        if (ws.isEmpty) Seq(Seq("")) else ws.map(syms))
      val expect = refBpe(wordSeqs, 3)
      assert(got === expect)
    }
  }

  test("wordpieceTrainMerges: likelihood argmax diverges from BPE's count") {
    import spark.implicits._
    // (a,b) has the highest COUNT (4) but ubiquitous symbols
    // (a:10, b:4 -> score 4e12/40 = 1e11); (x,y) is rarer (2) but its
    // symbols only ever appear together (x:2, y:2 -> 2e12/4 = 5e11)
    val df = Seq((0L, "xy xy ab ab ab ab aa aa aa")).toDF("doc_id", "text")
    val bpe = TextAnalysis.bpeTrainMerges(df, nMerges = 1).head()
    assert((bpe.getString(1), bpe.getString(2)) === (("a", "b")))
    val wp = TextAnalysis.wordpieceTrainMerges(df, nMerges = 1).head()
    assert((wp.getString(1), wp.getString(2)) === (("x", "y")))
    assert(wp.getLong(3) === 2L && wp.getLong(4) === 500000000000L)
  }

  test("wordpieceTrainMerges agrees with a sequential reference trainer") {
    import spark.implicits._
    import org.scalacheck.Gen
    def refWp(seqs0: Seq[Seq[String]], n: Int)
        : Seq[(Int, String, String, Long, Long)] = {
      var seqs = seqs0
      val out = Seq.newBuilder[(Int, String, String, Long, Long)]
      var done = false
      for (r <- 1 to n if !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        val sym = scala.collection.mutable.Map[String, Long]()
        for (s <- seqs) {
          for (x <- s) sym(x) = sym.getOrElse(x, 0L) + 1
          for (i <- 0 until s.length - 1)
            counts((s(i), s(i + 1))) =
              counts.getOrElse((s(i), s(i + 1)), 0L) + 1
        }
        if (counts.isEmpty) done = true
        else {
          def score(a: String, b: String, f: Long): Long =
            ((BigInt(f) * BigInt(1000000000000L)) /
              (BigInt(sym(a)) * BigInt(sym(b)))).toLong
          val ((a, b), f) = counts.toSeq
            .sortBy { case ((x, y), c) => (-score(x, y, c), x, y) }.head
          out += ((r, a, b, f, score(a, b, f)))
          seqs = seqs.map { s =>
            val buf = Seq.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
                buf += (a + " " + b); i += 2
              } else { buf += s(i); i += 1 }
            }
            buf.result()
          }
        }
      }
      out.result()
    }
    val genWord = Gen.choose(0, 4)
      .flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val gen = Gen.listOfN(4,
      Gen.choose(0, 5).flatMap(l => Gen.listOfN(l, genWord)))
    forAllGen(gen, cases = 6) { docLists =>
      val df = docLists.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.wordpieceTrainMerges(df, nMerges = 3).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSeq
      def syms(w: String): Seq[String] =
        if (w.isEmpty) Seq("") else w.map(_.toString)
      val wordSeqs = docLists.flatMap(ws =>
        if (ws.isEmpty) Seq(Seq("")) else ws.map(syms))
      assert(got === refWp(wordSeqs, 3))
    }
  }

  test("bpeEncode matches a sequential reference rewrite, incl. overlap runs") {
    import spark.implicits._
    // same greedy left-to-right non-overlapping within-word rewrite the
    // trainer uses, applied to one word's code-point symbols
    def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val syms: Seq[String] =
        if (word.isEmpty) Seq("") else word.map(_.toString)
      merges.foldLeft(syms) { case (cur, (a, b)) =>
        val buf = Seq.newBuilder[String]
        var i = 0
        while (i < cur.length) {
          if (i < cur.length - 1 && cur(i) == a && cur(i + 1) == b) {
            buf += (a + " " + b); i += 2
          } else { buf += cur(i); i += 1 }
        }
        buf.result()
      }
    }
    val docsSeq = Seq(
      Seq("aaa"),                 // overlap run: one merge, tail survives
      Seq("aab", "ab", "c"),      // rank-1 merge feeds the rank-2 compound
      Seq("x"), Seq(),            // singleton / empty text
      Seq("aaaab", "aa"))         // runs + later-rank compound per word
    val merges = Seq(("a", "a"), ("a a", "b"))
    val df = docsSeq.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(df, merges)
      .as[(Long, Seq[String])].collect().toMap
    docsSeq.zipWithIndex.foreach { case (ws, i) =>
      val words = if (ws.isEmpty) Seq("") else ws // split contract
      assert(got(i.toLong) === words.flatMap(refEncode(_, merges)), s"doc $i")
    }
    // and the plan is a shuffle-free narrow map
    val enc = TextAnalysis.bpeEncode(df, merges)
    enc.collect()
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bpeEncode shuffled:\n${plan.take(400)}")
  }

  test("bpeEncode on trained merges reproduces the trainer's final stream") {
    import spark.implicits._
    val df = Seq(
      (0L, "the cat sat on the mat the cat sat"),
      (1L, "the cat ran to the cat house"),
      (2L, "a mat a cat a hat")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrainMerges(df, nMerges = 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val enc = TextAnalysis.bpeEncode(df, merges)
      .as[(Long, Seq[String])].collect().toMap
    // every compound symbol in the encoded stream is a trained merge
    val compounds = enc.values.flatten.filter(_.contains(" ")).toSet
    val trained = merges.map { case (a, b) => a + " " + b }.toSet
    assert(compounds.subsetOf(trained), s"$compounds not in $trained")
    // the top merge's symbol survives — standalone or absorbed into a
    // later rank's larger compound (either way it starts a symbol)
    val top = merges.head
    val topSym = top._1 + " " + top._2
    assert(enc.values.flatten.exists(_.startsWith(topSym)))
    // no adjacent (a, b) pair of any trained merge survives un-merged
    merges.foreach { case (a, b) =>
      enc.values.foreach { s =>
        s.sliding(2).foreach { w =>
          assert(!(w.length == 2 && w(0) == a && w(1) == b),
            s"unapplied merge ($a,$b) in $s")
        }
      }
    }
  }

  test("compressionRatio separates templated text from prose, shuffle-free") {
    import spark.implicits._
    val prose = "the quiet harbor town woke early as fishermen hauled " +
      "nets over weathered rails while gulls argued above the tide line"
    val boiler = ("click here to subscribe now " * 20).trim
    val df = Seq((1L, prose), (2L, boiler)).toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getInt(4)))).toMap
    assert(out(2L)._1 > out(1L)._1 * 2, s"boilerplate not separated: $out")
    assert(out(2L)._2 === 1 && out(1L)._2 === 0)
    // the kernel agrees with a by-hand Deflater run
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(prose.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    val got = TextAnalysis.compressionRatio(df)
      .filter(col("doc_id") === 1L).head().getLong(2)
    assert(got === n)
    // narrow map: no shuffle
    val enc = TextAnalysis.compressionRatio(df)
    enc.collect()
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("saltedAggregate reassembles exactly and splits the hot key 16 ways") {
    import spark.implicits._
    // one pathological key carrying 90% of rows + a long tail
    val rows = (0 until 9000).map(i => ("hot", i.toLong, i.toLong)) ++
      (0 until 1000).map(i => (s"k${i % 50}", i.toLong, i.toLong))
    val df = rows.toDF("k", "rid", "v")
    val got = graft.ops.Skew.saltedAggregate(df, "k", "v", saltBy = "rid")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val expect = df.groupBy("k").agg(count(lit(1)), sum("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === expect) // salting is invisible in the results
    // plan shape: two HashAggregate pairs (partial+final per level)
    val plan = graft.ops.Skew.saltedAggregate(df, "k", "v", "rid")
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan.take(400))
    assert(plan.contains("__salt"), "salt column missing from the plan")
  }

  test("contaminationMulti equals N single-benchmark contamination runs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta shared one two three"),
      (2L, "totally clean document with unique words here"),
      (3L, "shared one two three and also x y z tail"),
      (4L, "x y z tail plus alpha beta gamma delta")).toDF("doc_id", "text")
    val benchA = Seq((100L, "shared one two three")).toDF("doc_id", "text")
    val benchB = Seq((200L, "x y z tail words")).toDF("doc_id", "text")
    val multi = graft.ops.Curation.contaminationMulti(
      corpus, Seq("a" -> benchA, "b" -> benchB), n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    for ((name, b) <- Seq("a" -> benchA, "b" -> benchB)) {
      val single = graft.ops.Curation.contamination(corpus, b, n = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
        .toMap
      for ((id, v) <- single)
        assert(multi((id, name)) === v,
          s"multi($id, $name) diverged from the single-benchmark run")
    }
    // every (doc, bench) pair is present, zero-hit ones included
    assert(multi.size === 4 * 2)
  }

  test("saltedTopK domain cap is bit-identical to the one-window form") {
    import spark.implicits._
    // one pathological domain carrying 90% of docs + a long tail —
    // exactly the skew the salted rewrite exists for
    val rows = (0 until 900).map(i => (i.toLong, "hot.example")) ++
      (900 until 1000).map(i => (i.toLong, s"d${i % 23}.example"))
    val df = rows.toDF("doc_id", "source")
    val salted = graft.ops.Curation
      .domainCapSample(df, "source", maxPerDomain = 7)
    val oneWindow = graft.ops.Curation
      .domainCapSampleOneWindow(df, "source", maxPerDomain = 7)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getString(1), r.getInt(2))
    assert(salted.select("doc_id", "source", "sample_rank")
      .collect().map(key).sortBy(identity).toSeq ===
      oneWindow.select("doc_id", "source", "sample_rank")
        .collect().map(key).sortBy(identity).toSeq)
    // the cap actually binds on the hot domain
    assert(salted.filter(col("source") === "hot.example").count() === 7L)
    // plan shape: two Window stages — cell rank then survivor rank —
    // with the first partitioned by (source, __salt)
    val plan = salted.queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(plan).size >= 2,
      "salted top-k lost its two-stage shape: " + plan.take(600))
    assert(plan.contains("__salt"),
      "cell window lost its salt partitioning: " + plan.take(600))
  }

  test("kmeansAssign agrees with a sequential reference Lloyd trainer") {
    import spark.implicits._
    import org.scalacheck.Gen
    val dims = 2
    def refKmeans(vs: Seq[(Long, Seq[Float])], k: Int,
                  iters: Int): Map[Long, (Long, Long)] = {
      val q = vs.sortBy(_._1).map { case (id, e) =>
        id -> e.map(x => math.floor(x.toDouble * 1e7).toLong).toIndexedSeq
      }
      var cents: Seq[(Long, IndexedSeq[Long])] =
        q.take(k).zipWithIndex.map { case ((_, v), i) => i.toLong -> v }
      def key(v: IndexedSeq[Long]): Long = cents.map { case (cid, c) =>
        (0 until dims).map { i => val d = v(i) - c(i); d * d }.sum * k + cid
      }.min
      for (_ <- 0 until iters) {
        val assign = q.map { case (id, v) => (v, key(v)) }
        cents = assign.groupBy(_._2 % k).toSeq.map { case (cid, rows) =>
          cid -> (0 until dims).map { i =>
            math.floor(rows.map(_._1(i)).sum.toDouble / rows.size).toLong
          }.toIndexedSeq
        }.sortBy(_._1)
      }
      q.map { case (id, v) =>
        val kk = key(v); id -> (kk % k, kk / k)
      }.toMap
    }
    val gen = Gen.listOfN(8, Gen.choose(-100, 100))
      .map(_.zipWithIndex.map { case (x, i) =>
        (i.toLong, Seq(x / 100.0f, (x * 7 % 100) / 100.0f))
      })
    forAllGen(gen, cases = 5) { vs =>
      val df = vs.map { case (id, e) => (id, e.toArray) }
        .toDF("vec_id", "embedding")
      val got = Similarity.kmeansAssign(df, k = 3, iters = 2, dims = dims)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got === refKmeans(vs, k = 3, iters = 2))
    }
  }

  test("sourceDivergence agrees with a reference total-variation computation") {
    import spark.implicits._
    import org.scalacheck.Gen
    def refTv(a: Seq[String], b: Seq[String]): (Long, Long) = {
      val (ca, cb) = (a.groupBy(identity).view.mapValues(_.size.toLong).toMap,
        b.groupBy(identity).view.mapValues(_.size.toLong).toMap)
      val (ta, tb) = (a.size.toLong, b.size.toLong)
      val shared = ca.keySet.intersect(cb.keySet)
      val diff = BigInt(ca.filterNot(kv => shared(kv._1)).values.sum) * tb +
        BigInt(cb.filterNot(kv => shared(kv._1)).values.sum) * ta +
        shared.toSeq.map(w =>
          (BigInt(ca(w)) * tb - BigInt(cb(w)) * ta).abs).sum
      (shared.size.toLong,
        (diff * 1000000 / (BigInt(ta) * tb * 2)).toLong)
    }
    val word = Gen.oneOf("a", "b", "c", "d")
    val text = Gen.choose(1, 10).flatMap(l => Gen.listOfN(l, word))
    forAllGen(Gen.zip(text, text), cases = 8) { case (t1, t2) =>
      val df = Seq((1L, "s1", t1.mkString(" ")), (2L, "s2", t2.mkString(" ")))
        .toDF("doc_id", "source", "text")
      val got = TextAnalysis.sourceDivergence(df).collect()
        .map(r => (r.getLong(2), r.getLong(3)))
      val (nShared, tv) = refTv(t1, t2)
      if (nShared == 0) assert(got.isEmpty)
      else assert(got.toSeq === Seq((nShared, tv)))
    }
  }

  test("embedCurationPipeline: dedup drops then quota caps, one assignment") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.75f, 0.25f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.25f, 0.75f))
    ).toDF("vec_id", "embedding")
    // cosine >= 0.9 drops 1 and 3 (see the semDedup trace test); quota 2
    // then keeps both survivors per cluster
    val out = Similarity.embedCurationPipeline(e, k = 2, iters = 1,
      minCosine = 0.9, maxPerCluster = 2, dims = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(out === Array((0L, 0L, 1), (2L, 1L, 1)))
    // a 1-per-cluster quota with no dedup (threshold above every pair)
    // exercises the quota side alone: 2 survivors, rank 1 each
    val q = Similarity.embedCurationPipeline(e, k = 2, iters = 1,
      minCosine = 0.999, maxPerCluster = 1, dims = 2).collect()
    assert(q.length === 2 && q.forall(_.getInt(2) === 1))
  }

  test("trainQualityScores separates trusted text from junk") {
    import spark.implicits._
    val good = Seq("the quick brown fox jumps over the lazy dog",
      "a quiet morning walk through the old town square",
      "fresh bread and coffee on a wooden table",
      "the river bends gently past the stone bridge")
    val junk = Seq("zzz zzz zzz buy buy buy click click click",
      "xxx win win win free free free zzz click",
      "buy free win zzz xxx click buy free win",
      "click click zzz buy xxx free win win zzz")
    val df = (good.zipWithIndex.map { case (t, i) => (i.toLong, 1, t) } ++
      junk.zipWithIndex.map { case (t, i) => (100L + i, 0, t) })
      .toDF("doc_id", "trusted", "text")
    val out = graft.ops.QualityModel
      .trainQualityScores(df, col("trusted") === 1, dims = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length === 8)
    assert(out.forall(r => r._3 > 0.0 && r._3 < 1.0))
    // every trusted doc must outscore every junk doc — the separation
    // property, robust to float-sum order in the gradient aggregate
    val minGood = out.filter(_._2 == 1.0).map(_._3).min
    val maxJunk = out.filter(_._2 == 0.0).map(_._3).max
    assert(minGood > maxJunk,
      s"classifier failed to separate: minGood=$minGood maxJunk=$maxJunk")
  }

  test("kFor scales cluster count with the corpus; semDedupAuto runs on it") {
    import spark.implicits._
    assert(Similarity.kFor(100L, 1024L) === 1)
    assert(Similarity.kFor(2048L, 1024L) === 2)
    assert(Similarity.kFor(5000000000L, 100000L) === 50000) // the paper's regime
    assert(Similarity.kFor(Long.MaxValue / 2, 1L) === 1000000) // clamp
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.75f, 0.25f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.25f, 0.75f))
    ).toDF("vec_id", "embedding")
    // 4 vectors with target 2 -> k=2: identical to the traced semDedup run
    val out = Similarity.semDedupAuto(e, iters = 1, minCosine = 0.9,
      targetClusterSize = 2L, dims = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(0L -> 1L, 1L -> 1L))
  }

  test("curriculumOrder: stages strictly ascend, positions form a permutation") {
    import spark.implicits._
    val df = (0L until 40L).map(i => (i, i % 4)).toDF("doc_id", "grp")
    val out = Curation.curriculumOrder(df, stage = col("grp"), nBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every position 0..39 exactly once
    assert(out.map(_._3).sorted === (0L until 40L).toArray)
    // positions within a stage form a contiguous block, stages in order
    val byPos = out.sortBy(_._3).map(_._2)
    assert(byPos === byPos.sorted, "a later stage appeared before an earlier one")
    // within a stage the order is the salted-hash shuffle, not doc_id order
    val stage0 = out.filter(_._2 == 0L).sortBy(_._3).map(_._1)
    assert(stage0.sorted === stage0.sorted.distinct)
    assert(stage0 !== stage0.sorted, "within-stage order degenerated to id order")
  }

  test("importanceWeight: an empty target slice yields NULL weights") {
    import spark.implicits._
    val df = Seq((1L, "s1", "a b"), (2L, "s2", "a c")).toDF("doc_id", "source", "text")
    val out = Curation.importanceWeight(df, col("source") === "nope").collect()
    assert(out.length === 2)
    assert(out.forall(_.isNullAt(2)), "empty target must surface as NULL, not 0")
  }

  test("epochSchedule never over-spends the budget (property)") {
    import spark.implicits._
    import org.scalacheck.Gen
    val gen = for {
      sizes <- Gen.listOfN(4, Gen.choose(1, 40))
      units <- Gen.listOfN(4, Gen.choose(1L, 5L))
      budget <- Gen.choose(10L, 400L)
      capE2 <- Gen.choose(100L, 500L)
    } yield (sizes, units, budget, capE2)
    forAllGen(gen, cases = 8) { case (sizes, units, budget, capE2) =>
      val docs = sizes.zipWithIndex.map { case (n, i) =>
        (i.toLong, s"s$i", Seq.fill(n)("t").mkString(" "))
      }.toDF("doc_id", "source", "text")
      val unitExpr = units.zipWithIndex
        .map { case (u, i) => s"WHEN source = 's$i' THEN $u" }
        .mkString("CASE ", " ", " ELSE 1 END")
      val out = Curation.epochSchedule(docs, "source", expr(unitExpr),
        budgetTokens = budget, maxEpochsE2 = capE2).collect()
        .map(r => (r.getLong(1), r.getLong(3), r.getInt(5)))
      assert(out.forall(_._2 >= 0L), "negative allocation")
      assert(out.map(_._2).sum <= budget,
        s"allocated ${out.map(_._2).sum} > budget $budget")
      // an uncapped-only world spends at most the proportional wants
      out.foreach { case (n, alloc, capped) =>
        if (capped == 1) assert(alloc >= capE2 * n / 100,
          "a capped source lost its cap-level allocation")
      }
    }
  }

  test("nearestCentroid kernel: argmin with sparse cids, huge-k-safe") {
    import graft.functions.VectorKernels
    import org.apache.spark.sql.catalyst.util.ArrayData
    val v = ArrayData.toArrayData(Array(10L, -4L))
    // cluster 1 vanished: cids {0, 2} survive
    val cents = Array(Array(9L, -4L), Array(10L, -3L))
    val cids = Array(0L, 2L)
    def dist(c: Array[Long]) =
      (0 until 2).map(i => (Seq(10L, -4L)(i) - c(i)) * (Seq(10L, -4L)(i) - c(i))).sum
    val best = Seq((dist(cents(0)), 0L), (dist(cents(1)), 2L)).min
    val got = VectorKernels.nearestCentroid(v, cents, cids)
    assert((got.getLong(0), got.getLong(1)) === ((best._2, best._1)))
    // equal distances tie to the first (smallest) cid
    val tie = Array(Array(10L, -5L), Array(10L, -3L)) // both dist 1
    val t = VectorKernels.nearestCentroid(v, tie, cids)
    assert((t.getLong(0), t.getLong(1)) === ((0L, 1L)))
    // the old dist*k+cid packing overflowed past k ~ 23k at worst-case
    // unit-norm distances; the struct form must survive the regime
    val far = ArrayData.toArrayData(Array.fill(64)(10000000L))
    val farCents = Array(Array.fill(64)(-10000000L))
    val f = VectorKernels.nearestCentroid(far, farCents, Array(49999L))
    assert(f.getLong(0) === 49999L)
    assert(f.getLong(1) === 64L * 4L * 10000000L * 10000000L)
    // a ragged vector must error loudly, never read past its end
    val short63 = ArrayData.toArrayData(Array.fill(63)(1L))
    assertThrows[IllegalArgumentException](
      VectorKernels.nearestCentroid(short63, farCents, Array(0L)))
  }

  test("dotq propagates NULL for null array elements, never fabricates 0") {
    import spark.implicits._
    import graft.functions.VectorExpressions.dotq
    val df = Seq(
      (1L, Array[java.lang.Long](2L, null), Array[java.lang.Long](3L, 4L)),
      (2L, Array[java.lang.Long](2L, 5L), Array[java.lang.Long](3L, 4L))
    ).toDF("id", "a", "b").select(col("id"), dotq(col("a"), col("b")).as("d"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1L) === None, "null element must yield NULL, not a garbage dot")
    assert(rows(2L) === Some(26L))
  }

  test("curriculumOrder keeps NULL-stage docs, ordered first") {
    import spark.implicits._
    val df = Seq((1L, Some(3L)), (2L, Option.empty[Long]), (3L, Some(0L)))
      .toDF("doc_id", "grp")
    val out = Curation.curriculumOrder(df, stage = col("grp"), nBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.keySet === Set(1L, 2L, 3L), "NULL stage silently dropped a doc")
    assert(out(2L) === 0L, "NULL stage must order first")
    assert(out(3L) === 1L && out(1L) === 2L)
  }

  // ----------------------------------------------------- wordpiece

  private def wpPieces(corpus: Seq[(Long, String)], vocab: Seq[String],
                       maxWordChars: Int = 100): Map[Long, Seq[String]] = {
    import spark.implicits._
    TextAnalysis.wordpieceEncode(
        corpus.toDF("doc_id", "text"), vocab, maxWordChars = maxWordChars)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
  }

  test("wordpiece: the BERT 'unaffable' trace, greedy longest-first") {
    val vocab = Seq("un", "una", "##ffable", "##aff", "##able", "aff")
    // greedy takes "una" (3) over "un" (2), then "##ffable" over "##aff"
    val out = wpPieces(Seq(1L -> "unaffable"), vocab)
    assert(out(1L) === Seq("una", "##ffable"))
    // drop "una"/"##ffable": now the canonical un ##aff ##able split
    val out2 = wpPieces(Seq(1L -> "unaffable"),
      Seq("un", "##aff", "##able", "aff"))
    assert(out2(1L) === Seq("un", "##aff", "##able"))
  }

  test("wordpiece: whole-word [UNK] fallback, even after a prefix match") {
    // "hugging" matches "hug" at 0 but has no continuation pieces:
    // the WHOLE word must collapse, no partial [hug, UNK] stream
    val out = wpPieces(Seq(1L -> "hugging xyz hug"), Seq("hug", "##s"))
    assert(out(1L) === Seq("[UNK]", "[UNK]", "hug"))
  }

  test("wordpiece: a word starting with ## cannot alias a continuation") {
    // "##ab" the WORD finds no position-0 piece ("##ab"/"##a" are
    // continuations) -> whole-word [UNK], matching the oracle's
    // NOT LIKE '##%' filter at p = 1
    val out = wpPieces(Seq(1L -> "##ab ab"), Seq("ab", "##ab", "##a", "##b"))
    assert(out(1L) === Seq("[UNK]", "ab"))
  }

  test("wordpiece: maxWordChars guard and empty-word skip") {
    val vocab = Seq("a", "##a")
    val out = wpPieces(Seq(1L -> "aaaaa  aa"), vocab, maxWordChars = 4)
    // "aaaaa" (5 cps) > 4 -> [UNK]; "" from the double space emits
    // nothing; "aa" segments
    assert(out(1L) === Seq("[UNK]", "a", "##a"))
  }

  test("wordpiece matches an independent greedy reference on random words") {
    val vocab = Seq("a", "b", "ab", "abc", "##a", "##b", "##bc", "##c",
      "##ab", "ba")
    val vs = vocab.toSet
    def ref(w: String): Seq[String] = {
      if (w.isEmpty) return Seq.empty
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var start = 0
      while (start < w.length) {
        val m = (w.length to (start + 1) by -1).iterator.map { end =>
          val sub = w.substring(start, end)
          if (start == 0) sub else "##" + sub
        }.find(vs.contains)
        m match {
          case None => return Seq("[UNK]")
          case Some(p) =>
            out += p
            start += (if (start == 0) p.length else p.length - 2)
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(11)
    val words = Seq.fill(200)(
      (1 to (1 + rnd.nextInt(6))).map(_ => "abcd" (rnd.nextInt(4))).mkString)
    val doc = words.mkString(" ")
    val got = wpPieces(Seq(1L -> doc), vocab)(1L)
    val want = words.flatMap(ref)
    assert(got === want)
  }

  // ----------------------------------------------------- stripHtml

  private def strip1(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(TextAnalysis.stripHtml(col("h")).as("c"))
      .collect().head.getString(0)
  }

  test("stripHtml drops script/style content wholesale, not just tags") {
    assert(strip1("<p>keep</p><script>var a = 1 < 2;</script>" +
      "<style>p { color: red }</style><p>tail</p>") === "keep tail")
  }

  test("stripHtml removes comments and collapses whitespace") {
    assert(strip1("a <!-- multi\nline\ncomment --> b\n\t c") === "a b c")
  }

  test("stripHtml decodes entities with &amp; LAST (no double decode)") {
    // &amp;lt; must become the literal text "&lt;", never "<"
    assert(strip1("x &amp;lt; y &amp; z &lt;tag&gt;") === "x &lt; y & z <tag>")
    assert(strip1("&quot;q&#39;s&nbsp;here&quot;") === "\"q's here\"")
  }

  // ------------------------------------------------ prioritySample

  test("prioritySample equals the brute-force smallest-k priorities") {
    val k = 37
    val withPrio = docs
      .withColumn("__h",
        Dedup.h60(concat(lit("prio|"), col("doc_id").cast("string"))))
      .withColumn("p",
        expr("__h DIV greatest(CAST(n_chars AS LONG), 1L)"))
    val want = withPrio.select("doc_id", "p").collect()
      .map(r => (r.getLong(1), r.getLong(0))).sorted.take(k).map(_._2).toSeq
    val got = TextAnalysis.prioritySample(docs, col("n_chars"), k)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got.sorted === want.sorted)
    // rerun-stability: the draw is a pure function of (salt, id, weight)
    val again = TextAnalysis.prioritySample(docs, col("n_chars"), k)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(again.sorted === got.sorted)
  }

  test("prioritySample favors heavier docs and redraws under a new salt") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, if (i < 200) 1L else 1000000L))
      .toDF("doc_id", "w")
    val picked = TextAnalysis.prioritySample(df, col("w"), k = 50)
      .select("doc_id").collect().map(_.getLong(0))
    val heavy = picked.count(_ >= 200L)
    assert(heavy >= 45,
      s"1e6:1 weights must dominate a 50-draw, got $heavy heavy picks")
    val other = TextAnalysis.prioritySample(df, col("w"), k = 50,
      salt = "prio2").select("doc_id").collect().map(_.getLong(0))
    assert(other.sorted.toSeq !== picked.sorted.toSeq,
      "a different salt must redraw the sample")
  }

  test("packSignBits/hammingDist: hand-traced words and distance") {
    import spark.implicits._
    // 40 dims -> 2 words: word0 = bits 0-31, word1 = bits 32-39.
    // v1 positive at {0, 5, 33}; v2 positive at {0, 6, 34, 39}; zero
    // counts as NON-positive (strict > 0)
    def vec(pos: Set[Int]) =
      (0 until 40).map(i => if (pos(i)) 1.0f else if (i % 2 == 0) 0f else -1f)
    val df = Seq((1L, vec(Set(0, 5, 33))), (2L, vec(Set(0, 6, 34, 39))))
      .toDF("vec_id", "embedding")
    val sigs = df.select(col("vec_id"),
        Similarity.packSignBits(col("embedding"), dims = 40).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === Seq((1L << 0) + (1L << 5), 1L << 1))
    assert(sigs(2L) === Seq((1L << 0) + (1L << 6), (1L << 2) + (1L << 7)))
    val d = df.filter(col("vec_id") === 1L)
      .crossJoin(df.filter(col("vec_id") === 2L).select(
        Similarity.packSignBits(col("embedding"), 40).as("other")))
      .select(Similarity.hammingDist(
        Similarity.packSignBits(col("embedding"), 40), col("other"),
        nWords = 2).as("h"))
      .head().getLong(0)
    // word0: {5} vs {6} differ -> 2 bits; word1: {33} vs {34,39} -> 3
    assert(d === 5L)
  }

  test("hammingTopK equals brute-force sign-disagreement counting") {
    val embeddings = Tables.load(spark, sf, "embeddings")
    val all = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val q = all(0L)
    val want = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        (v.indices.count(i => (v(i) > 0f) != (q(i) > 0f)).toLong, id) }
      .sorted.take(10)
    val got = Similarity.hammingTopK(embeddings, queryId = 0L, k = 10,
        dims = 64)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSeq
    assert(got === want)
  }

  test("rrfFuse: hand-traced integer fusion, both-list docs first") {
    import spark.implicits._
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("doc_id", "rank")
    val got = Similarity.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // 1e6 integer divisions: //61=16393, //62=16129, //63=15873
    assert(got === Seq(
      (2L, 2L, 16129L + 16393L), // rank 2 in A, rank 1 in B
      (1L, 1L, 16393L),
      (4L, 1L, 16129L),
      (3L, 1L, 15873L)))
  }

  test("rendezvousAssign: adding a shard only moves docs TO the new one") {
    def assign(shards: Seq[String]): Map[Long, String] =
      Curation.rendezvousAssign(docs, shards).select("doc_id", "shard")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val before = assign(TrainingQueries.HrwShards)
    assert(before.values.toSet === TrainingQueries.HrwShards.toSet,
      "every shard should win some docs at 500/12")
    val after = assign(TrainingQueries.HrwShards :+ "shard12")
    val moved = before.keys.filter(k => before(k) != after(k)).toSeq
    assert(moved.nonEmpty, "a 13th shard must attract some docs")
    assert(moved.forall(k => after(k) === "shard12"),
      "HRW must never move a doc BETWEEN surviving shards")
    // expected migration ~ 1/13 of the corpus; allow wide slack
    assert(moved.size < before.size / 4,
      s"HRW moved ${moved.size} of ${before.size} docs — mod-style churn")
  }

  test("shardManifest: exact partition of the corpus, tamper-evident") {
    val m = Curation.shardManifest(docs, nShards = 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m.keySet === (0L until 16L).toSet, "every shard id present")
    assert(m.values.map(_._1).sum === docs.count(), "docs partitioned exactly")
    // rerun-stable: the assignment is a pure hash, no RNG
    val again = Curation.shardManifest(docs, nShards = 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(again === m)
    // truncating one doc's text flips EXACTLY its shard's checksum
    val tampered = docs.withColumn("text",
      when(col("doc_id") === 7L, substring(col("text"), 1, 5))
        .otherwise(col("text")))
    val tm = Curation.shardManifest(tampered, nShards = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val changed = m.keys.filter(s => tm(s) != m(s)._3).toSeq
    val shard7 = Curation.shardManifest(docs.filter(col("doc_id") === 7L),
      nShards = 16).head().getLong(0)
    assert(changed === Seq(shard7),
      s"tampering doc 7 must flip only shard $shard7, flipped $changed")
  }

  private def acCounts(text: String, phrases: Seq[String]): Seq[Long] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(graft.functions.PhraseExpressions
        .phraseCount(col("t"), phrases).as("c"))
      .head().getSeq[Long](0)
  }

  test("phraseCount: hand-traced overlaps, cross-token and shared-prefix") {
    val got = acCounts("a a a scan slow table value part",
      TrainingQueries.BlockPhrases)
    // slow, fast join, table value part, scan, scan slow, a a, zebra
    assert(got === Seq(1L, 0L, 1L, 1L, 1L, 2L, 0L))
  }

  test("phraseCount: fail-link output closure emits suffix phrases") {
    // matching "aab" must also emit its suffixes "ab" and "b" via the
    // fail-closure — the classic AC correctness trap
    assert(acCounts("aab", Seq("aab", "ab", "b")) === Seq(1L, 1L, 1L))
    assert(acCounts("ababa", Seq("aba", "ba")) === Seq(2L, 2L))
  }

  test("phraseCount: multi-byte UTF-8 phrases count in the char domain") {
    // the kernel walks raw UTF-8 bytes; self-synchronization must keep
    // counts equal to character-domain matching for non-ASCII phrases
    val phrases = Seq("é", "héllo", "日本", "a é")
    val text = "héllo é a é 日本語 日本 héllo ééé"
    def naive(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length))
        .toLong
    assert(acCounts(text, phrases) === phrases.map(naive(text, _)))
    // a phrase that is a byte-PREFIX of another codepoint must not
    // phantom-match: 'é' (C3 A9) inside '日' (E6 97 A5) shares no bytes,
    // but 'Ã' (C3 83) shares its lead byte with 'é' — count must be 0
    assert(acCounts("ééé", Seq("Ã")) === Seq(0L))
  }

  test("phraseCount matches a naive position scan on random text") {
    val phrases = Seq("a", "ab", "ba ", " b", "aa b", "bb")
    def naive(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length))
        .toLong
    val rnd = new scala.util.Random(17)
    (1 to 30).foreach { _ =>
      val t = (1 to (5 + rnd.nextInt(60)))
        .map(_ => "ab ab b"(rnd.nextInt(7))).mkString
      assert(acCounts(t, phrases) === phrases.map(naive(t, _)),
        s"text '$t'")
    }
  }

  private def urlCanon(u: String): (String, String, String) = {
    import spark.implicits._
    val r = Seq(u).toDF("u")
      .select(TextAnalysis.urlParts(col("u")).as("p"))
      .select("p.canon_url", "p.host", "p.domain").head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("urlParts: every canonicalization rule, pinned one by one") {
    // host case + www + default port + utm strip + param sort + frag
    assert(urlCanon("HTTPS://WWW.Ex.COM:443/A/?utm_x=1&b=2&a=1#f")._1 ===
      "https://ex.com/A?a=1&b=2")
    // http default port + empty path -> '/'
    assert(urlCanon("http://ex.com:80")._1 === "http://ex.com/")
    // NON-default port survives
    assert(urlCanon("http://ex.com:8080/x")._1 === "http://ex.com:8080/x")
    // all params tracking -> no '?'
    assert(urlCanon("https://sub.ex.com/p?utm_a=1&utm_b=2")._1 ===
      "https://sub.ex.com/p")
    // registrable domain = last two labels of the PORT-STRIPPED host
    assert(urlCanon("https://a.b.ex.com:9/p") ===
      (("https://a.b.ex.com:9/p", "a.b.ex.com:9", "ex.com")))
    assert(urlCanon("https://sub.ex.com/p")._3 === "ex.com")
    // fragments alone must merge two raw URLs
    assert(urlCanon("https://ex.com/p#one")._1 ===
      urlCanon("https://ex.com/p#two")._1)
    // non-absolute input passes through untouched
    assert(urlCanon("not a url")._1 === "not a url")
  }

  test("c4Filter: every line and page rule fires as specified") {
    import spark.implicits._
    val keepers = (1 to 5).map(i => s"this line number $i is fine.")
    val docsSeq = Seq(
      1L -> keepers.mkString("\n"),                          // clean page
      2L -> (keepers.take(4) ++ Seq(
        "too short.",                       // < 3 words
        "three words here",                 // no terminal punctuation
        "uses javascript every day.",       // the js word rule
        "quoted line still counts \"")).mkString("\n"),      // " terminal
      3L -> (keepers.mkString("\n") + "\nconfig { x }."),    // brace page
      4L -> (keepers.mkString("\n") + "\nlorem ipsum dolor."))
    val out = TextAnalysis.c4Filter(docsSeq.toDF("doc_id", "text2"),
        textCol = "text2")
      .select("doc_id", "n_lines", "n_kept", "reject_reason", "kept_text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    assert(out(1L) === ((5L, 5L, "kept", keepers.mkString("\n"))))
    // doc 2: 4 keepers + the "-terminal line survive; js/short/no-punct
    // lines die; 5 kept... no: 4 + 1 = 5 -> kept
    assert(out(2L)._2 === 5L && out(2L)._3 === "kept")
    assert(!out(2L)._4.contains("javascript") &&
      !out(2L)._4.contains("three words here"))
    assert(out(3L)._3 === "brace" && out(3L)._4 === null)
    assert(out(4L)._3 === "lorem" && out(4L)._4 === null)
    // page-rule precedence and the kept-line floor
    val few = Seq(5L -> keepers.take(3).mkString("\n")).toDF("doc_id", "t")
    assert(TextAnalysis.c4Filter(few, textCol = "t")
      .head().getAs[String]("reject_reason") === "too_few_lines")
  }

  test("gopherFilter: every rule fires, boundaries keep") {
    import spark.implicits._
    val stopTail = "the rest of that batch have come with them to be safe."
    // a 50-word passing page: 38 filler words + the 12-word stop tail
    val base = (Seq.fill(38)("word") :+ stopTail).mkString(" ")
    val docs = Seq(
      1L -> base,                                    // kept (exactly 50 words)
      2L -> "short doc of the kind.",                // word_count (5 < 50)
      3L -> (Seq.fill(50)("reconfiguration")         // mean 15 > 10
        .mkString(" ")),
      4L -> (Seq.fill(45)("word") ++ Seq.fill(5)("#"))
        .mkString(" ") ,                             // 5 hashes /50 = exactly 10% -> keep path continues
      5L -> (Seq.fill(44)("word") ++ Seq.fill(6)("#"))
        .mkString(" "),                              // 6/50 > 10% symbol_ratio
      6L -> (1 to 60).map(_ => "• point alpha beta")
        .mkString("\n"),                             // 100% bullets
      7L -> (1 to 10).map(_ =>
        "the data of that run went on and on and on then...")
        .mkString("\n"),                             // 100% ellipsis lines
      8L -> (Seq.fill(40)("word") ++ Seq.fill(10)("42"))
        .mkString(" "),                              // alpha 40/50 = exactly 80% -> continues
      9L -> (Seq.fill(39)("word") ++ Seq.fill(11)("42"))
        .mkString(" "),                              // 39/50 < 80% alpha_words
      10L -> Seq.fill(50)("word").mkString(" ")      // 0 stopword kinds
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilter(docs)
      .select("doc_id", "reject_reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "kept")
    assert(out(2L) === "word_count")
    assert(out(3L) === "mean_word_len")
    // doc 4: symbols exactly 10% passes that rule; it then fails only on
    // stopwords (no stop tail) — proves the boundary is non-strict
    assert(out(4L) === "stopwords")
    assert(out(5L) === "symbol_ratio")
    assert(out(6L) === "bullet_lines")
    assert(out(7L) === "ellipsis_lines")
    assert(out(8L) === "stopwords") // exactly 80% alpha passes, stopwords fails
    assert(out(9L) === "alpha_words")
    assert(out(10L) === "stopwords")
    // distinct-kinds rule: 8 repeats of ONE stopword is still 1 kind
    val oneKind = Seq(11L -> (Seq.fill(42)("word") ++ Seq.fill(8)("the"))
      .mkString(" ")).toDF("doc_id", "text")
    assert(TextAnalysis.gopherFilter(oneKind)
      .head().getAs[String]("reject_reason") === "stopwords")
  }

  test("gopherFilter property: every audit column matches a naive " +
    "reference") {
    import org.scalacheck.Gen
    val vocab = Seq("the", "be", "to", "of", "and", "that", "have", "with",
      "data", "alpha", "beta", "run", "#", "...", "42", "…",
      "reconfiguration", "•", "x")
    val lineGen = for {
      k <- Gen.choose(0, 12)
      ws <- Gen.listOfN(k, Gen.oneOf(vocab))
      bullet <- Gen.oneOf("", "• ", "- ", "* ")
      tail <- Gen.oneOf("", "...", "…")
    } yield bullet + ws.mkString(" ") + tail
    val docGen = for {
      n <- Gen.choose(1, 8)
      ls <- Gen.listOfN(n, lineGen)
    } yield ls.mkString("\n")
    val stop = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    def cnt(s: String, sub: String): Long = {
      var c = 0L; var i = s.indexOf(sub)
      while (i >= 0) { c += 1; i = s.indexOf(sub, i + sub.length) }
      c
    }
    def naive(text: String): (Long, Long, Long, Long, Long, Long, Long,
        Long, String) = {
      val words = text.split("[ \\t\\n\\f\\r]+", -1).filter(_.nonEmpty)
      val lines = text.split("\r?\n", -1)
      val w = words.length.toLong
      val wls = words.map(_.length.toLong).sum
      val sym = cnt(text, "...") + cnt(text, "…") + cnt(text, "#")
      val nl = lines.length.toLong
      val bl = lines.count(l => l.startsWith("•") || l.startsWith("- ") ||
        l.startsWith("* ")).toLong
      val el = lines.count(l => l.endsWith("...") || l.endsWith("…")).toLong
      val aw = words.count(_.exists(c =>
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))).toLong
      val sk = stop.count(words.contains).toLong
      val reason =
        if (w < 5 || w > 60) "word_count"
        else if (wls < 3 * w || wls > 10 * w) "mean_word_len"
        else if (sym * 10 > w) "symbol_ratio"
        else if (bl * 10 > nl * 9) "bullet_lines"
        else if (el * 10 > nl * 3) "ellipsis_lines"
        else if (aw * 5 < w * 4) "alpha_words"
        else if (sk < 2) "stopwords"
        else "kept"
      (w, wls, sym, nl, bl, el, aw, sk, reason)
    }
    forAllGen(Gen.listOfN(25, docGen), cases = 6) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.gopherFilter(df, minWords = 5, maxWords = 60)
        .select("doc_id", "n_words", "word_len_sum", "n_symbols",
          "n_lines", "bullet_lines", "ellipsis_lines", "alpha_words",
          "stop_kinds", "reject_reason")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
            r.getString(9)))).toMap
      for ((t, i) <- texts.zipWithIndex)
        assert(got(i.toLong) === naive(t), s"doc $i: ${t.take(80)}")
    }
  }

  test("c4Filter: CRLF pages filter identically to LF pages") {
    import spark.implicits._
    val keepers = (1 to 5).map(i => s"this line number $i is fine.")
    val out = TextAnalysis.c4Filter(
        Seq(1L -> keepers.mkString("\n"), 2L -> keepers.mkString("\r\n"))
          .toDF("doc_id", "t"), textCol = "t")
      .select("doc_id", "n_lines", "n_kept", "reject_reason", "kept_text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    // same 5 lines either way; kept_text is rebuilt LF-joined
    assert(out(2L) === out(1L))
    // a line ending in a BARE \r fails the terminal-punct rule — Java's
    // default `$` matches before a trailing \r, the \z anchor (and the
    // oracle's RE2 `$`) must not
    val bare = Seq(3L -> (keepers.take(4).mkString("\n") +
      "\ngood line five.\r")).toDF("doc_id", "t")
    assert(TextAnalysis.c4Filter(bare, textCol = "t")
      .head().getAs[Long]("n_kept") === 4L)
  }

  test("bitextMine: margins clear the threshold and the bucketed scale " +
      "path agrees with exact cosines") {
    val e = Tables.load(spark, sf, "embeddings")
    val src = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("src_id"), col("embedding"))
    val tgt = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("tgt_id"), col("embedding"))
    val exact = Similarity.bitextMine(src, tgt, k = 4, minMarginE6 = 1000000L)
      .cache()
    assert(exact.count() > 0)
    assert(exact.filter(col("margin_e6") < 1000000L ||
      col("cos_e6") <= 0).count() === 0)
    // every mined pair is its source's FORWARD BEST: re-deriving the
    // best tgt per src from raw cosines must agree pair for pair
    val brute = Similarity.knnJoin(
        src.select(col("src_id").as("q_id"), col("embedding")),
        tgt.select(col("tgt_id").as("vec_id"), col("embedding")), k = 1)
      .select(col("q_id").as("src_id"), col("vec_id").as("bt"))
    assert(exact.join(brute, "src_id")
      .filter(col("tgt_id") =!= col("bt")).count() === 0)
    // bucketed scale path: pairs it does emit carry the same exact
    // cosine the unbucketed path computed for that pair
    val bucketed = Similarity
      .bitextMine(src, tgt, k = 4, minMarginE6 = 1000000L, bits = 2)
      .select(col("src_id"), col("tgt_id"), col("cos_e6").as("cos_b"))
    val allCos = Similarity.knnJoin(
        src.select(col("src_id").as("q_id"), col("embedding")),
        tgt.select(col("tgt_id").as("vec_id"), col("embedding")),
        k = Int.MaxValue)
      .select(col("q_id").as("src_id"), col("vec_id").as("tgt_id"),
        round(col("cosine_r") * 1e6).cast("long").as("cos_x"))
    assert(bucketed.join(allCos, Seq("src_id", "tgt_id"))
      .filter(col("cos_b") =!= col("cos_x")).count() === 0)
  }

  test("parseRobots recovers the fixture rules exactly (multi-UA " +
      "stacking, comments, empty Disallow)") {
    val robots = spark.range(1).select(lit("example.com").as("domain"),
      lit(TrainingQueries.RobotsFixtureText).as("content"))
    val parsed = graft.ops.Curation.parseRobots(robots)
      .select(col("agent"), col("allow"), col("prefix"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    // the oracle's decision table plus the parsed-but-inert empty rule
    val expected = TrainingQueries.RobotRules
      .map { case (a, al, p) => (a, al.toLong, p) }.toSet + (("*", 0L, ""))
    assert(parsed === expected)
    // decision edges: longest wins, Allow beats Disallow on ties, no
    // match = allowed, unlisted agent falls back to *
    val urls = Seq(
      (1L, "graftbot", "/public/x"), // Allow /public/ (8) beats Disallow / (1)
      (2L, "graftbot", "/anything"), // Disallow / wins
      (3L, "otherbot", "/private/ok/x"), // * group: Allow (12) > Disallow (9)
      (4L, "otherbot", "/private/x"), // Disallow /private/
      (5L, "otherbot", "/free")) // no rule matches -> allowed
      .toDF("doc_id", "agent", "path")
    val got = graft.ops.Curation
      .robotsDecide(graft.ops.Curation.parseRobots(robots), urls)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === Map(1L -> (1L, 8L), 2L -> (0L, 1L), 3L -> (1L, 12L),
      4L -> (0L, 9L), 5L -> (1L, 0L)))
  }

  test("textTiles flags the seam between two disjoint-topic halves") {
    import spark.implicits._
    // 80 tokens of topic A then 80 of topic B — the ONLY cohesion
    // valley is the seam at token 80
    val a = Seq.fill(20)("alpha beta gamma delta").mkString(" ")
    val b = Seq.fill(20)("omega psi chi phi").mkString(" ")
    val rows = graft.ops.TextAnalysis
      .textTiles(Seq((1L, s"$a $b")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the seam gap: fully disjoint bags -> cosine 0, flagged boundary
    val (seamCos, seamDepth, seamBound) = rows(80L)
    assert(seamCos === 0L && seamBound === 1L)
    // and it is the strict depth maximum over all gaps
    assert(rows.forall { case (g, (_, d, _)) => g == 80L || d < seamDepth })
    // deep inside either half the cycling text is self-similar: no gap
    // there may outrank the seam as a boundary
    assert(rows(40L)._3 === 0L && rows(120L)._3 === 0L)
  }

  test("textTiles kernel is row-identical to the relational twin") {
    import spark.implicits._
    // real corpus + the edge shapes: exactly step+1 tokens (one gap),
    // repeated single word (cosine 1 everywhere), colliding multiset
    // counts, short doc (dropped), empty text (dropped), double spaces
    // (empty tokens from split)
    val edge = Seq(
      (9001L, "a b c d e f"),
      (9002L, Seq.fill(40)("same").mkString(" ")),
      (9003L, "x x y y z x y " + Seq.fill(30)("w q").mkString(" ")),
      (9004L, "tiny doc"),
      (9005L, ""),
      (9006L, "a  b  c  d  e  f  g  h  i  j  k  l"))
      .toDF("doc_id", "text")
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").unionByName(edge)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val kernel = graft.ops.TextAnalysis.textTiles(docs)
      .collect().map(key).toSet
    val relational = graft.ops.TextAnalysis.textTilesRelational(docs)
      .collect().map(key).toSet
    assert(kernel === relational)
    assert(kernel.nonEmpty && !kernel.exists(_._1 == 9004L) &&
      !kernel.exists(_._1 == 9005L))
  }

  test("urlParts canonicalization is idempotent") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val schemes = Seq("http", "https", "HTTPS", "ftp")
    val hosts = Seq("Ex.COM", "www.ex.com", "www.www.Ex.com", "a.b.c.ex.com",
      "ex.com:443", "www.ex.com:8080", "localhost")
    val paths = Seq("", "/", "/A/b", "/a//", "/p/q/")
    val tails = Seq("", "?utm_a=1", "?b=2&a=1&utm_s=x", "#f", "?z=1#f",
      "?utm_a=1#g")
    val urls = (1 to 120).map { _ =>
      schemes(rnd.nextInt(schemes.size)) + "://" +
        hosts(rnd.nextInt(hosts.size)) + paths(rnd.nextInt(paths.size)) +
        tails(rnd.nextInt(tails.size))
    } ++ Seq("not a url", "weird:///x")
    val once = urls.toDF("u")
      .select(TextAnalysis.urlParts(col("u")).getField("canon_url").as("c"))
      .as[String].collect().toSeq
    val twice = once.toDF("u")
      .select(TextAnalysis.urlParts(col("u")).getField("canon_url").as("c"))
      .as[String].collect().toSeq
    assert(twice === once, "canon(canon(u)) must equal canon(u)")
  }

  test("zipfCheck: power-of-two ranks only, exact products, frequency order") {
    val d = Seq((1L, "a a a a b b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = TextAnalysis.zipfCheck(d, maxRank = 8).orderBy("rank").collect()
    // counts: a=5, b=3, c=2, d=1 -> ranks 1..4, powers of two kept: 1,2,4
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 4L))
    assert(out.map(_.getAs[String]("word")).toSeq === Seq("a", "b", "d"))
    assert(out.map(_.getAs[Long]("freq")).toSeq === Seq(5L, 3L, 1L))
    assert(out.forall(r =>
      r.getAs[Long]("freq_rank") ==
        r.getAs[Long]("freq") * r.getAs[Long]("rank")))
  }

  test("textRankKeywords: the hub word wins; pair-less docs contribute no nodes") {
    val d = Seq((1L, "a b a"), (2L, "x a"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.textRankKeywords(d, iters = 3, k = 10).collect()
    // graph: a-b (twice), a-x -> nodes {a, b, x}; "solo" never pairs
    assert(out.length === 3)
    assert(out.head.getAs[String]("word") === "a",
      "the hub (touches b AND x) must rank first")
    assert(!out.map(_.getAs[String]("word")).contains("solo"))
    // undirected doubling: total rank mass stays ~1e12 (bounded trunc loss)
    val total = out.map(_.getAs[Long]("rank_e12")).sum
    assert(total > 990000000000L && total <= 1000000000000L)
  }

  test("bootstrapCI: deterministic, ordered bounds, exact point estimate") {
    val ev = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("doc_id", "score")
    val r1 = Curation.bootstrapCI(ev, "score", nBoot = 40).head()
    assert(r1.getAs[Long]("n_eval") === 4L)
    assert(r1.getAs[Long]("point_e6") === 25000000L) // mean 25 exactly
    val (lo, hi) = (r1.getAs[Long]("lo_e6"), r1.getAs[Long]("hi_e6"))
    // percentile bounds bracket the resample space and sit in order;
    // a replicate mean can never leave [min score, max score]
    assert(lo <= hi && lo >= 10000000L && hi <= 40000000L)
    // rerun-stable: the draws are salted hashes, not RNG state
    val r2 = Curation.bootstrapCI(ev, "score", nBoot = 40).head()
    assert(r1.toSeq === r2.toSeq)
    // more replicates only refine the percentile, never escape the range
    val r3 = Curation.bootstrapCI(ev, "score", nBoot = 200).head()
    assert(r3.getAs[Long]("lo_e6") >= 10000000L &&
      r3.getAs[Long]("hi_e6") <= 40000000L)
  }

  test("bootstrapCI: empty eval fails loudly; duplicate ids stay deterministic") {
    // n = 0 used to reach sequence(0, -1) (counts DOWN in Spark) and
    // NPE on null aggregates — now a typed require
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "score")
    val e = intercept[IllegalArgumentException] {
      Curation.bootstrapCI(empty, "score", nBoot = 10)
    }
    assert(e.getMessage.contains("non-empty"), e.getMessage)
    // colliding ids: the (id, score) secondary sort keeps the row-index
    // assignment total, so the CI replays bit for bit across
    // partitionings
    val dup = Seq((1L, 10L), (1L, 30L), (2L, 20L), (2L, 40L))
      .toDF("doc_id", "score")
    val a = Curation.bootstrapCI(dup.repartition(1), "score", nBoot = 40)
      .head()
    val b = Curation.bootstrapCI(dup.repartition(7, col("score")), "score",
      nBoot = 40).head()
    assert(a.toSeq === b.toSeq,
      "duplicate ids broke the deterministic-replay contract")
  }

  test("lmScoreOverIndex: empty index fails loudly, not silent NULL scores") {
    import graft.ops.TextAnalysis
    val idx = java.nio.file.Files
      .createTempDirectory("graft-lm-empty").toString + "/ix"
    TextAnalysis.lmIndexWrite(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), idx)
    val heldout = Seq((1L, "spark streams merge")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.lmScoreOverIndex(spark, idx, heldout)
    }
    assert(e.getMessage.contains("empty or fully-retracted"), e.getMessage)
  }

  test("hardNegatives: excludeSelf=false keeps id-colliding candidates " +
    "from a separate query-id space") {
    // query id 1 collides with corpus vec_id 1, but the query is NOT
    // that corpus row — with excludeSelf the candidate silently drops
    val queries = Seq((1L, "qlab", Array(1.0f, 0.0f)))
      .toDF("q_id", "label", "embedding")
    val corpus = Seq(
      (1L, "neg", Array(0.9f, 0.1f)), (2L, "neg", Array(0.5f, 0.5f)))
      .toDF("vec_id", "label", "embedding")
    def negIds(excl: Boolean): Set[Long] =
      Similarity.hardNegatives(queries, corpus, shortlist = 5, k = 5,
        excludeSelf = excl)
        .collect().map(_.getAs[Long]("neg_id")).toSet
    assert(negIds(excl = true) === Set(2L),
      "shared-id-space default must still self-exclude")
    assert(negIds(excl = false) === Set(1L, 2L),
      "separate-id-space mode must keep the colliding candidate")
  }

  test("bpeEncodeOverIndex equals the direct encode (frozen-artifact round trip)") {
    val d = docs.limit(50)
    val merges = TextAnalysis.bpeTrainMerges(d, nMerges = 3)
    val idx = java.nio.file.Files
      .createTempDirectory("graft-tok").toString + "/m"
    TextAnalysis.bpeMergesWrite(merges, idx)
    val ms = merges.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def rows(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
      df.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(rows(TextAnalysis.bpeEncodeOverIndex(spark, idx, d)) ===
      rows(TextAnalysis.bpeEncode(d, ms)),
      "the at-rest merge table must reproduce the in-memory encode")
  }

  test("pageRankWeighted equals instance-duplicated pageRank bit for bit") {
    import graft.ops.Graph
    val inst = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L),
      (3L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val weighted = inst.groupBy("src", "dst")
      .agg(count(lit(1)).as("m"))
    def ranks(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("r"))).toSet
    assert(ranks(Graph.pageRankWeighted(weighted, iters = 4)) ===
      ranks(Graph.pageRank(inst, iters = 4)),
      "m·(r DIV d) must equal summing m duplicate instances exactly")
  }

  test("hardNegatives: positives drop, survivors re-rank, shortlist bites first") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.01f), "A"),  // near-perfect positive
      (2L, Array(0.9f, 0.1f, 0.0f), "B"),   // best wrong-label
      (3L, Array(0.5f, 0.5f, 0.0f), "B"),
      (4L, Array(0.8f, 0.2f, 0.0f), "A"),   // positive
      (5L, Array(0.0f, 1.0f, 0.0f), "C")
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq((100L, Array(1.0f, 0.0f, 0.0f), "A"))
      .toDF("q_id", "embedding", "label")
    val wide = Similarity.hardNegatives(queries, corpus, shortlist = 10, k = 2)
      .orderBy("rn").collect()
    assert(wide.map(_.getAs[Long]("neg_id")).toSeq === Seq(2L, 3L))
    assert(wide.map(_.getAs[Int]("rn")).toSeq === Seq(1, 2))
    assert(wide.forall(r =>
      r.getAs[String]("neg_label") != r.getAs[String]("q_label")))
    // DPR semantics: the label filter runs on the RETRIEVED shortlist,
    // not before retrieval — a shortlist of 2 holds {1 (positive), 2},
    // so only id 2 survives even though k = 2
    val tight = Similarity.hardNegatives(queries, corpus, shortlist = 2, k = 2)
      .collect()
    assert(tight.map(_.getAs[Long]("neg_id")).toSeq === Seq(2L))
  }

  test("mmrRerank: diversification beats the plain top-k, score identity holds") {
    // query bisects ids 1 and 3's directions; id 2 duplicates id 1, so
    // relevance alone picks {1, 2} but MMR's redundancy term must pick
    // {1, 3} (sim(1,2) ~ 1e6 vs sim(1,3) ~ 0 at near-equal rel)
    val e = Seq(
      (0L, Array(1.0f, 1.0f, 0.0f)),     // the query vector
      (1L, Array(1.0f, 0.01f, 0.0f)),    // top relevance
      (2L, Array(1.0f, 0.0f, 0.0f)),     // near-dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f))      // diverse, same rel as 2
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(e, queryId = 0L, shortlist = 3, k = 3)
      .orderBy("step").collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 3L, 2L))
    assert(out.head.getAs[Long]("maxsim_e6") === 0L, "first pick is pure rel")
    assert(out.forall(r => r.getAs[Long]("score_e6") ==
      7L * r.getAs[Long]("rel_e6") - 3L * r.getAs[Long]("maxsim_e6")))
    // the redundancy penalty monotonically tightens: later picks carry a
    // selected set that only grows, so maxsim never decreases here
    val ms = out.map(_.getAs[Long]("maxsim_e6")).toSeq
    assert(ms === ms.sorted)
    // k beyond the candidate pool stops at the pool, never loops
    val short = Similarity.mmrRerank(e, queryId = 0L, shortlist = 3, k = 5)
    assert(short.count() === 3)
  }

  test("prefixFilteredJaccard: lossless vs the brute-force join; prefix " +
      "prunes the planted boilerplate gram") {
    // plant heavy boilerplate: one shared sentence prefix across many
    // docs (a frequent gram that PPJoin's ordering must sort last) plus
    // one true near-dup pair
    val base = docs.limit(60)
      .withColumn("text", concat(lit("the quick brown fox says "),
        col("text")))
    val nd = base.filter(col("doc_id") === 0)
      .withColumn("doc_id", lit(100000L))
      .withColumn("text", concat(col("text"), lit(" tail")))
    val d = base.union(nd)
    val pp = Dedup.prefixFilteredJaccard(d, n = 3, tauE6 = 350000L)
      .select("doc_a", "doc_b", "n_common", "j_e6")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // brute force = the no-pruning arm of the existing jaccard join
    val brute = Dedup.ngramJaccardPairs(d, n = 3, minJaccard = 0.35,
        maxDocFreqFraction = 1.0)
      .select("doc_a", "doc_b", "n_common", "jaccard1e4")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(pp.map(t => (t._1, t._2, t._3)) === brute,
      "prefix filter must be lossless")
    assert(pp.exists(t => t._1 === 0L && t._2 === 100000L),
      "the planted near-dup pair must survive")
    // threshold semantics: every reported pair really clears tau
    assert(pp.forall(_._4 >= 350000L))
  }

  test("rougeN: clipped counts by hand; empty and short sides score zero") {
    val pairs = Seq(
      // cand bigrams: [a b, b a, a b] ref: [a b, b a]; clipped m = 2
      (1L, "a b a b", "a b a"),
      (2L, "x y", "p q r"),       // no overlap: m = 0, p/r/f 0
      (3L, "", "a b"),            // empty cand: t_cand = 0
      (4L, "a", "a")              // both below bigram length: t = 0
    ).toDF("pair_id", "cand", "ref")
    val out = graft.ops.EvalMetrics.rougeN(pairs, n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("m") === 2L)
    assert(out(1L).getAs[Long]("t_cand") === 3L)
    assert(out(1L).getAs[Long]("t_ref") === 2L)
    assert(out(1L).getAs[Long]("p_e6") === 666666L)   // 2e6 DIV 3
    assert(out(1L).getAs[Long]("r_e6") === 1000000L)
    // f1 = 2pr/(p+r) with the same truncation
    assert(out(1L).getAs[Long]("f1_e6") ===
      2L * 666666L * 1000000L / (666666L + 1000000L))
    assert(out(2L).getAs[Long]("m") === 0L)
    assert(out(2L).getAs[Long]("f1_e6") === 0L)
    assert(out(3L).getAs[Long]("t_cand") === 0L)
    assert(out(3L).getAs[Long]("p_e6") === 0L)
    assert(out(4L).getAs[Long]("t_cand") === 0L)
  }

  test("bleuCounts: per-order components and the precision product") {
    // cand == ref: every precision 1 -> product e6 = 1e6, deficit 0
    val pairs = Seq(
      (1L, "a b c d e", "a b c d e"),
      (2L, "a b c d", "a b c d e"),  // shorter cand: bp_deficit 1
      (3L, "a b c", "a b c")         // no 4-grams: t4 = 0 -> product 0
    ).toDF("pair_id", "cand", "ref")
    val out = graft.ops.EvalMetrics.bleuCounts(pairs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("bleu_prod_e6") === 1000000L)
    assert(out(1L).getAs[Long]("bp_deficit") === 0L)
    assert((1 to 4).forall(n =>
      out(1L).getAs[Long](s"m$n") === out(1L).getAs[Long](s"t$n")))
    assert(out(2L).getAs[Long]("bp_deficit") === 1L)
    assert(out(2L).getAs[Long]("m1") === 4L)
    assert(out(2L).getAs[Long]("t4") === 1L)
    assert(out(3L).getAs[Long]("bleu_prod_e6") === 0L)
  }

  test("passAtK: exact estimator against the combinatorial definition") {
    // n=8, c=2: pass@4 = 1 - C(6,4)/C(8,4) = 1 - 15/70
    val s = (0 until 8).map(i => (1L, i < 2)) ++
      (0 until 8).map(i => (2L, false)) ++     // c=0: 1 - C(8,4)/C(8,4)=0
      (0 until 8).map(i => (3L, i < 5)) ++     // n-c=3 < k: pass = 1e6
      (0 until 3).map(i => (4L, true))         // n=3 < k: dropped
    val out = graft.ops.EvalMetrics.passAtK(
      s.toDF("problem_id", "correct"), k = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("pass_at_k_e6"))
      .toMap
    assert(out(1L) === 1000000L - 1000000L * (6L*5*4*3) / (8L*7*6*5))
    assert(out(2L) === 0L)
    assert(out(3L) === 1000000L)
    assert(!out.contains(4L))
  }

  test("ngram_overlap: property — kernel equals the naive multiset " +
      "reference on random token arrays") {
    import org.scalacheck.Gen
    import graft.functions.NgramOverlapExpressions.ngramOverlap
    val tok = Gen.oneOf("a", "b", "c", "ab", "", "x y", "é")
    val arr = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tok))
    // naive reference: string-typed multiset intersection of n-grams
    // over the same nonempty-token contract
    def naive(c: List[String], r: List[String], n: Int): (Long, Long, Long) = {
      def grams(t: List[String]) =
        t.filter(_.nonEmpty).sliding(n).filter(_.size == n)
          .map(_.mkString(" ")).toList
      val (cg, rg) = (grams(c), grams(r))
      val rc = scala.collection.mutable.Map.empty[String, Int]
      rg.foreach(g => rc(g) = rc.getOrElse(g, 0) + 1)
      var m = 0L
      cg.foreach { g =>
        if (rc.getOrElse(g, 0) > 0) { rc(g) -= 1; m += 1 }
      }
      (m, cg.length.toLong, rg.length.toLong)
    }
    forAllGen(Gen.zip(arr, arr), cases = 60) { case (c, r) =>
      val row = Seq((c.mkString(" "), r.mkString(" ")))
        .toDF("cand", "ref")
        .select(ngramOverlap(
          filter(split(col("cand"), " "), t => t =!= lit("")),
          filter(split(col("ref"), " "), t => t =!= lit("")), 3).as("o"))
        .head().getStruct(0)
      // NOTE: tokens containing a space ("x y") re-split at the split()
      // layer — the kernel sees the POST-SPLIT arrays, so the reference
      // must too
      val cToks = c.mkString(" ").split(" ").filter(_.nonEmpty).toList
      val rToks = r.mkString(" ").split(" ").filter(_.nonEmpty).toList
      (1 to 3).foreach { n =>
        val (m, tc, tr) = naive(cToks, rToks, n)
        assert(row.getAs[Long](s"m$n") === m, s"m$n for $c vs $r")
        assert(row.getAs[Long](s"tc$n") === tc, s"tc$n for $c vs $r")
        assert(row.getAs[Long](s"tr$n") === tr, s"tr$n for $c vs $r")
      }
      assert(row.getAs[Long]("cand_len") === cToks.length.toLong)
      assert(row.getAs[Long]("ref_len") === rToks.length.toLong)
    }
  }

  test("aucExact: hand cases — perfect, inverted, all-ties, degenerate") {
    def auc(rows: Seq[(Long, Boolean)]): Option[Long] =
      Option(graft.ops.EvalMetrics.aucExact(rows.toDF("score", "label"))
        .head().getAs[java.lang.Long]("auc_e6")).map(_.longValue())
    // perfect separation
    assert(auc(Seq((1L, false), (2L, false), (3L, true), (4L, true)))
      === Some(1000000L))
    // perfectly inverted
    assert(auc(Seq((4L, false), (3L, false), (1L, true), (2L, true)))
      === Some(0L))
    // every score tied: AUC = 1/2
    assert(auc(Seq((7L, true), (7L, false), (7L, true), (7L, false)))
      === Some(500000L))
    // one discordant pair among 1 pos x 3 neg with a tie:
    // gt = 2, eq = 1 -> (2*2+1)e6 / (2*3) = 833333
    assert(auc(Seq((1L, false), (2L, false), (3L, true), (3L, false)))
      === Some(833333L))
    // single-class input: NULL, not a crash
    assert(auc(Seq((1L, true), (2L, true))) === None)
  }

  test("calibrationBins: exact gap mass and global ECE") {
    // two bins: [0.0-0.1) holds 2 rows conf 0, one correct ->
    // gap = |1e6 - 0| = 1e6; [0.9-1.0] holds 2 rows conf 1e6, both
    // correct -> gap 0; ece = 1e6 / 4
    val rows = Seq((0L, true), (0L, false), (1000000L, true),
      (1000000L, true)).toDF("conf_e6", "correct")
    val out = graft.ops.EvalMetrics.calibrationBins(rows)
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq === Seq(0L, 9L))
    assert(out(0).getAs[Long]("gap_e6") === 500000L)  // 1e6 mass / 2 rows
    assert(out(0).getAs[Long]("acc_e6") === 500000L)
    assert(out(1).getAs[Long]("gap_e6") === 0L)
    assert(out.forall(_.getAs[Long]("ece_e6") === 250000L))
    // conf exactly 1e6 must clamp into the last bin, never bin B
    assert(out(1).getAs[Long]("n") === 2L)
  }

  test("kendallTauA: hand cases — perfect, inverted, ties, degenerate") {
    def tau(rows: Seq[(Long, Long)]): Option[Long] =
      Option(graft.ops.EvalMetrics.kendallTauA(rows.toDF("x", "y"))
        .head().getAs[java.lang.Long]("tau_a_e6")).map(_.longValue())
    assert(tau(Seq((1L, 10L), (2L, 20L), (3L, 30L))) === Some(1000000L))
    assert(tau(Seq((1L, 30L), (2L, 20L), (3L, 10L))) === Some(-1000000L))
    // one concordant, one discordant, one x-tie among 4 points:
    // pairs (1,2):con (1,3):con (1,4):dis (2,3):x-tie->0 (2,4):dis
    // (3,4):dis => C=2 D=3 n0=6 -> (2-3)e6 DIV 6 = 0 - ... = -166666
    assert(tau(Seq((1L, 1L), (2L, 2L), (2L, 3L), (3L, 0L)))
      === Some((2L - 3L) * 1000000L / 6L))
    // n < 2: NULL
    assert(tau(Seq((5L, 5L))) === None)
    // determinism under repartitioning (cell-join is exact)
    val big = (0 until 500).map(i => ((i % 7).toLong, (i % 11).toLong))
    assert(tau(big) ===
      Option(graft.ops.EvalMetrics.kendallTauA(
        big.toDF("x", "y").repartition(13, col("y")))
        .head().getAs[java.lang.Long]("tau_a_e6")).map(_.longValue()))
  }

  test("cohenKappa: hand confusion matrix; constant raters degenerate") {
    // 10 items: a=b on 8 (4 true, 4 false), disagree on 2
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(4)((false, false)) ++
      Seq((true, false), (false, true))
    val out = graft.ops.EvalMetrics.cohenKappa(rows.toDF("a", "b")).head()
    assert(out.getAs[Long]("n") === 10L)
    assert(out.getAs[Long]("n_agree") === 8L)
    assert(out.getAs[Long]("po_e6") === 800000L)
    // marginals: a has 5 true/5 false, b has 5/5 -> pe = 50/100
    assert(out.getAs[Long]("pe_e6") === 500000L)
    assert(out.getAs[Long]("kappa_e6") ===
      (800000L - 500000L) * 1000000L / (1000000L - 500000L))
    // both raters constant -> pe = 1 -> kappa undefined (NULL)
    val const = Seq((true, true), (true, true)).toDF("a", "b")
    assert(graft.ops.EvalMetrics.cohenKappa(const).head()
      .isNullAt(4))
  }

  test("bradleyTerry: dominant player ranks first; strengths normalize") {
    // player 0 beats everyone; 1 beats 2 and 3; 2 beats 3
    val games = Seq(
      (0L, 1L, 10L, 9L), (0L, 2L, 10L, 8L), (0L, 3L, 10L, 10L),
      (1L, 2L, 10L, 7L), (1L, 3L, 10L, 8L), (2L, 3L, 10L, 6L))
      .toDF("i", "j", "n", "wi")
    val out = graft.ops.EvalMetrics.bradleyTerry(games, iters = 3)
      .orderBy(desc("strength_e6")).collect()
    assert(out.map(_.getAs[Long]("player")).toSeq === Seq(0L, 1L, 2L, 3L))
    // each round renormalizes to sum = players * 1e6 (up to DIV
    // truncation: at most |players| below)
    val tot = out.map(_.getAs[Long]("strength_e6")).sum
    assert(tot > 4000000L - 4 && tot <= 4000000L)
    assert(out.map(_.getAs[Long]("games")).forall(_ === 30L))
    // determinism across partitionings (integer DIV chain everywhere)
    val b = graft.ops.EvalMetrics.bradleyTerry(
      games.repartition(7, col("j")), iters = 3)
      .orderBy("player").collect().map(_.getAs[Long]("strength_e6")).toSeq
    assert(b === out.sortBy(_.getAs[Long]("player"))
      .map(_.getAs[Long]("strength_e6")).toSeq)
  }
}
