package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, PostTraining}

class PostTrainingSpec extends SparkSpec {
  import spark.implicits._

  test("renderChat: assembly order follows the turn ordinal, not row order") {
    // rows arrive deliberately out of order
    val turns = Seq(
      (1L, 2, "assistant", "hi there"),
      (1L, 1, "user", "hello"),
      (1L, 3, "user", "bye"))
      .toDF("conv_id", "turn", "role", "msg")
    val out = PostTraining.renderChat(turns, "conv_id", "turn", "role", "msg")
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_turns") == 3L)
    assert(out(0).getAs[String]("rendered") ==
      "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n" +
        "<|im_start|>user\nhello<|im_end|>\n" +
        "<|im_start|>assistant\nhi there<|im_end|>\n" +
        "<|im_start|>user\nbye<|im_end|>")
  }

  test("renderChat: deterministic across repartitionings") {
    val turns = (1 to 40).map(i => ((i % 4).toLong, i, "user", s"m$i"))
      .toDF("conv_id", "turn", "role", "msg")
    val a = PostTraining.renderChat(turns.repartition(7), "conv_id", "turn", "role", "msg")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val b = PostTraining.renderChat(turns.coalesce(1), "conv_id", "turn", "role", "msg")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(a == b)
  }

  test("lossMask: prompt words -> -100, response ids intact, count exact") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    val merges = Seq.empty[(String, String)]
    val vocab = Bpe.vocab(docs, "text", merges) // chars a..f, ids 0..5
    val ew = Bpe.encodeWords(docs, "text", "doc_id", merges, vocab)
    val out = PostTraining.lossMask(ew, "doc_id", "bpe_word_ids", lit(1L))
      .collect()(0)
    val ids = out.getAs[scala.collection.Seq[Long]]("input_ids")
    val labels = out.getAs[scala.collection.Seq[Long]]("labels")
    assert(ids.length == 6 && labels.length == 6)
    // first word 'ab' (2 tokens) masked, the rest pass through
    assert(labels.take(2) == Seq(-100L, -100L))
    assert(labels.drop(2) == ids.drop(2))
    assert(out.getAs[Long]("n_masked") == 2L)
  }

  test("lossMask plan: zero exchanges — mask fuses into the encode scan") {
    val docs = Seq((1L, "ab cd ef"), (2L, "gh ij")).toDF("doc_id", "text")
    val vocab = Bpe.vocab(docs, "text", Seq.empty)
    val ew = Bpe.encodeWords(docs, "text", "doc_id", Seq.empty, vocab)
    val plan = PostTraining.lossMask(ew, "doc_id", "bpe_word_ids", lit(1L))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Exchange"), s"lossMask must stay a map pass:\n$plan")
  }

  test("lossMask: k beyond the word count masks everything") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val vocab = Bpe.vocab(docs, "text", Seq.empty)
    val ew = Bpe.encodeWords(docs, "text", "doc_id", Seq.empty, vocab)
    val out = PostTraining.lossMask(ew, "doc_id", "bpe_word_ids", lit(99L))
      .collect()(0)
    assert(out.getAs[scala.collection.Seq[Long]]("labels").forall(_ == -100L))
    assert(out.getAs[Long]("n_masked") == out.getAs[scala.collection.Seq[Long]]("input_ids").length)
  }

  test("dpoPairs: extremes paired under the (score, id) total order") {
    val cands = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.1), (1L, 12L, 0.5),
      (2L, 20L, 0.7), (2L, 21L, 0.7), // exact tie: ids break it
      (3L, 30L, 0.4) // single candidate: no pair
    ).toDF("prompt_id", "doc_id", "score")
    val out = PostTraining.dpoPairs(cands, "prompt_id", "doc_id", "score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((10L, 11L, 0.8)))
    // exact score tie: BOTH orders put the lower id first, so chosen ==
    // rejected and the degenerate pair is filtered — prompt 2 absent
    assert(!out.contains(2L))
    assert(!out.contains(3L))
  }

  test("bestOfN: top-reward winner, acceptance gate, stats per prompt") {
    val cands = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.1), (1L, 12L, 0.5),
      (2L, 20L, 0.2), (2L, 21L, 0.3), // nobody clears the bar
      (3L, 30L, 0.7), (3L, 31L, 0.7)  // exact tie: lower id wins
    ).toDF("prompt_id", "doc_id", "score")
    val out = PostTraining.bestOfN(cands, "prompt_id", "doc_id", "score",
      threshold = 0.5).collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getBoolean(6)))).toMap
    assert(out(1L) == ((10L, 3L, 2L, 0.666667, true)))
    // every prompt emits a row — rejection is a FLAG, not a drop
    assert(out(2L) == ((21L, 2L, 0L, 0.0, false)))
    assert(out(3L) == ((30L, 2L, 2L, 1.0, true)))
  }

  test("bestOfN: deterministic across repartitionings") {
    val cands = (1 to 300).map(i =>
      ((i % 17).toLong, i.toLong, (i * 31 % 97) / 97.0))
      .toDF("prompt_id", "doc_id", "score")
    val a = PostTraining.bestOfN(cands, "prompt_id", "doc_id", "score", 0.5)
      .collect().map(_.toString).sorted
    val b = PostTraining.bestOfN(cands.repartition(7), "prompt_id",
      "doc_id", "score", 0.5).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("groupAdvantage: per-group z-scores; std-0 groups pin advantage 0") {
    val cands = Seq(
      (1L, 10L, 1.0), (1L, 11L, 2.0), (1L, 12L, 3.0), // mean 2, sd sqrt(2/3)
      (2L, 20L, 5.0),                                 // single candidate
      (3L, 30L, 2.0), (3L, 31L, 2.0)                  // all equal: sd exactly 0
    ).toDF("prompt_id", "cand_id", "reward")
    val out = PostTraining.groupAdvantage(cands, "prompt_id", "cand_id", "reward")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(0), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    // z-scores of (1,2,3): ±1/sqrt(2/3) = ±1.2247448…, round 6
    assert(out(10L) == ((1L, 1.0, 3L, -1.224745)))
    assert(out(11L) == ((1L, 2.0, 3L, 0.0)))
    assert(out(12L) == ((1L, 3.0, 3L, 1.224745)))
    assert(out(20L) == ((2L, 5.0, 1L, 0.0)), "single candidate: no signal, not NaN")
    assert(out(30L)._4 == 0.0 && out(31L)._4 == 0.0, "equal rewards: sd 0 -> 0")
  }

  test("groupAdvantage: deterministic across repartitionings (ordered fold)") {
    val cands = (1 to 90).map(i => ((i % 9).toLong, i.toLong, (i * 37 % 13) / 13.0))
      .toDF("prompt_id", "cand_id", "reward")
    val a = PostTraining.groupAdvantage(cands.repartition(11), "prompt_id", "cand_id", "reward")
      .collect().map(_.toSeq).toSet
    val b = PostTraining.groupAdvantage(cands.coalesce(1), "prompt_id", "cand_id", "reward")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("threadPaths: root-to-leaf paths; deep chains truncate LOUDLY") {
    // tree: 0 -> (1, 2), 1 -> (3, 4); 5 is an isolated root-leaf;
    // 10 -> 11 -> 12 -> 13 is a chain deeper than maxDepth = 2
    val msgs = Seq(
      (0L, None), (1L, Some(0L)), (2L, Some(0L)), (3L, Some(1L)),
      (4L, Some(1L)), (5L, None),
      (10L, None), (11L, Some(10L)), (12L, Some(11L)), (13L, Some(12L))
    ).toDF("id", "parent")
    val out = PostTraining.threadPaths(msgs, "id", "parent", maxDepth = 2)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2),
          r.getSeq[Long](3)))).toMap
    assert(out.keySet == Set(2L, 3L, 4L, 5L, 13L), "leaves only")
    assert(out(3L) == ((Some(0L), 3L, Seq(0L, 1L, 3L))))
    assert(out(2L) == ((Some(0L), 2L, Seq(0L, 2L))))
    assert(out(5L) == ((Some(5L), 1L, Seq(5L))), "root that is its own leaf")
    // chain needs 3 walk rounds but maxDepth = 2: partial path, NULL
    // root — loud truncation, never a silently wrong root
    assert(out(13L) == ((None, 3L, Seq(11L, 12L, 13L))))
  }

  test("dpoPairs: deterministic across repartitionings") {
    val cands = (1 to 100).map(i => ((i % 10).toLong, i.toLong, (i * 37 % 13) / 13.0))
      .toDF("prompt_id", "doc_id", "score")
    val a = PostTraining.dpoPairs(cands.repartition(9), "prompt_id", "doc_id", "score")
      .collect().map(_.toSeq).toSet
    val b = PostTraining.dpoPairs(cands.coalesce(1), "prompt_id", "doc_id", "score")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("preferenceCycles: transitive vs cyclic triangles, ties drop, majority wins") {
    def run(ms: Seq[(Long, Long)]) =
      PostTraining.preferenceCycles(ms.toDF("winner", "loser"),
        "winner", "loser").collect().head
    // consistent ranking 1 > 2 > 3: one triangle, zero cycles
    val t = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(t.getLong(0) == 3 && t.getLong(1) == 3 &&
      t.getLong(2) == 1 && t.getLong(3) == 0 && t.getDouble(4) == 0.0)
    // pure cycle 1 > 2 > 3 > 1: the same triangle, now cyclic
    val c = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(c.getLong(2) == 1 && c.getLong(3) == 1 && c.getDouble(4) == 1.0)
    // an exact tie drops its pair; the majority direction survives
    val m = run(Seq((1L, 2L), (2L, 1L),          // tie -> no edge
      (2L, 3L), (2L, 3L), (3L, 2L)))             // majority 2 > 3
    assert(m.getLong(1) == 1 && m.getLong(2) == 0, s"got $m")
  }

  test("ictPairs: window algebra, keep flag, short docs dropped, deterministic") {
    val docs = (0L until 60L).map(i =>
      (i, (0 until (i % 30).toInt + 3).map(k => s"w${i}_$k").mkString(" ")))
      .toDF("doc_id", "text")
    val out = PostTraining.ictPairs(docs, "doc_id", "text",
      windowWords = 8, keepQueryPct = 20).collect()
    // docs with <= 8 words have one window -> dropped
    val expectIds = (0L until 60L).filter(i => (i % 30) + 3 > 8).toSet
    assert(out.map(_.getLong(0)).toSet == expectIds)
    for (r <- out) {
      val id = r.getLong(0); val qIdx = r.getLong(1); val kept = r.getInt(2)
      val query = r.getString(3).split(" ").toSeq
      val context = r.getString(4).split(" ").toSeq
      val words = (0 until (id % 30).toInt + 3).map(k => s"w${id}_$k")
      assert(query == words.slice((qIdx * 8).toInt, (qIdx * 8 + 8).toInt),
        s"doc $id: query is window $qIdx")
      if (kept == 1) assert(context == words, s"doc $id keeps query in context")
      else assert(context ==
        words.take((qIdx * 8).toInt) ++ words.drop((qIdx * 8 + 8).toInt),
        s"doc $id excludes the query window")
    }
    // both keep outcomes occur at 20%-ish on 40+ docs
    assert(out.exists(_.getInt(2) == 1) && out.exists(_.getInt(2) == 0))
    val again = PostTraining.ictPairs(docs.repartition(7), "doc_id", "text",
      windowWords = 8, keepQueryPct = 20).collect().map(_.toSeq).toSet
    assert(again == out.map(_.toSeq).toSet)
  }

  test("bradleyTerry: hand-computed two-item MM rounds") {
    // 1 beats 2 three times, 2 beats 1 once: n_12 = 4, W = (3, 1).
    // Round 1 (p = 1, 1): term = round(4/2, 9) = 2, virtual =
    // round(2/2, 9) = 1 -> p = (4/3, 2/3) rounded to 9.
    // Round 2: sum p = 2.0 exactly, so terms stay 2;
    //   p1 = 4/(2 + round(2/2.333333333, 9)) = 4/2.857142857 = 1.4
    //   p2 = 2/(2 + round(2/1.666666667, 9)) = 2/3.2          = 0.625
    val m = (Seq.fill(3)((1L, 2L)) ++ Seq((2L, 1L))).toDF("winner", "loser")
    val got = PostTraining.bradleyTerry(m, "winner", "loser", rounds = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 4L, 1.4)))
    assert(got(2L) == ((1L, 4L, 0.625)))
  }

  test("bradleyTerry: strengths order by skill; zero-win items stay positive") {
    // a true BT process: P(a beats b) = (a+1)/(a+b+2), skills 1..6
    val ms = for {
      a <- 0L to 5L; b <- 0L to 5L if a != b
      k <- 1L to 40L
    } yield if ((k * 13) % (a + b + 2) <= a) (a, b) else (b, a)
    val out = PostTraining.bradleyTerry(ms.toDF("winner", "loser"),
      "winner", "loser", rounds = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert((0L to 4L).forall(i => out(i) < out(i + 1)),
      s"monotone ladder expected, got $out")
    assert(out.values.forall(_ > 0.0))
    // an item that NEVER wins (add a pure loser 9) stays finite > 0
    val withLoser = PostTraining.bradleyTerry(
      (ms ++ Seq.fill(10)((0L, 9L))).toDF("winner", "loser"),
      "winner", "loser", rounds = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(withLoser(9L) > 0.0 && withLoser(9L) < withLoser(0L))
  }

  test("bradleyTerry: deterministic across repartitionings (sorted folds)") {
    val ms = (1 to 300).map(i =>
      ((i % 7).toLong, ((i * 3) % 7).toLong)).filter(p => p._1 != p._2)
      .toDF("winner", "loser")
    val a = PostTraining.bradleyTerry(ms.repartition(11), "winner", "loser",
      rounds = 5).collect().map(_.toSeq).toSet
    val b = PostTraining.bradleyTerry(ms.coalesce(1), "winner", "loser",
      rounds = 5).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("lengthBiasAudit: exact counts, ties separate, mean delta signed") {
    val pairs = Seq(
      ("s1", "a b c", "a b"),       // chosen longer (+1)
      ("s1", "a", "a b c d"),       // rejected longer (-3)
      ("s1", "x y", "p q"),         // tie (0)
      ("s2", "one two three", "one") // chosen longer (+2)
    ).toDF("src", "chosen", "rejected")
    val out = PostTraining.lengthBiasAudit(pairs, "src", "chosen", "rejected")
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getLong(1) == 3 && s1.getLong(2) == 1 && s1.getLong(3) == 1)
    assert(s1.getDouble(4) == 0.333333)
    assert(s1.getDouble(5) == round6((1.0 - 3.0 + 0.0) / 3))
    assert(out("s2").getDouble(4) == 1.0 && out("s2").getDouble(5) == 2.0)
  }
  private def round6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("chatLint: every flag fires on its planted violation only") {
    val convs = Seq(
      (1L, Seq("user", "assistant")),                      // valid
      (2L, Seq("system", "user", "assistant")),            // valid
      (3L, Seq("user", "user", "assistant")),              // alternation
      (4L, Seq("user", "assistant", "user")),              // trailing user
      (5L, Seq("user", "system", "assistant")),            // misplaced system
      (6L, Seq("assistant", "user", "assistant"))          // starts assistant
    ).toDF("id", "roles")
    val out = PostTraining.chatLint(convs, "id", "roles")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    assert(out(1L) == ((true, true, true, true)))
    assert(out(2L) == ((true, true, true, true)))
    assert(out(3L) == ((true, true, false, false)))
    assert(out(4L) == ((false, true, true, false)))
    assert(out(5L) == ((true, false, true, false)))
    assert(out(6L) == ((true, true, false, false)))
  }
}
