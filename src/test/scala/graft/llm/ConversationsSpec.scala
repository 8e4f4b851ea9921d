package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Conversation-model invariants: validation branch order, truncation
  * maximality (greedy tail, whole pairs, never over budget), role
  * integrity through the corruption slice, and the degenerate shapes
  * (empty text, single sentence) that the sequence(1, 0) descending
  * trap would otherwise corrupt.
  */
class ConversationsSpec extends SparkSpec {

  private def assemble(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    val corrupt = col("doc_id") % 13 === 2
    rows.toDF("doc_id", "text")
      .withColumn("__w", Conversations.words(col("text")))
      .withColumn("__t0",
                  Conversations.wordWindowTurnsOfWords(col("__w")))
      .withColumn("__r0", Conversations.turnRoles(col("__t0")))
      .withColumn("__turns",
                  when(corrupt, slice(col("__t0"), 2, 8))
                    .otherwise(col("__t0")))
      .withColumn("__roles",
                  when(corrupt, slice(col("__r0"), 2, 8))
                    .otherwise(col("__r0")))
  }

  test("degenerate inputs: empty text and a single sentence survive " +
       "every stage with empty pair arrays (no descending sequence)") {
    // ids chosen off the % 13 = 2 corruption slice
    val out = assemble(Seq(1L -> "", 3L -> "just one sentence no split",
                           4L -> "   "))
      .withColumn("__tk", Conversations.turnTokenCounts(col("__turns")))
      .withColumn("__pt", Conversations.pairTokenSums(col("__tk")))
      .withColumn("__ss", Conversations.pairSuffixSums(col("__pt")))
      .select(col("doc_id"), size(col("__turns")).as("n"),
              size(col("__pt")).as("np"), size(col("__ss")).as("ns"),
              Conversations.validationReason(col("__turns"),
                                             col("__roles")).as("reason"),
              Conversations.renderChat(col("__turns"), col("__roles"))
                .as("render"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 0))
    assert(out.map(_.getInt(2)).toSeq == Seq(0, 0, 0),
           "no phantom pairs on short conversations")
    assert(out.map(_.getInt(3)).toSeq == Seq(0, 0, 0))
    assert(out.map(_.getString(4)).forall(_ == "too_short"))
    assert(out(0).getString(5) == "<|end|>",
           "empty conversation renders the bare terminal")
    assert(out(1).getString(5) ==
             "<|user|>just one sentence no split<|end|>")
  }

  test("validation reports the FIRST defect in contract order") {
    def text(nWords: Int) = (1 to nWords).map(i => s"w$i").mkString(" ")
    // doc 2 (% 13 = 2): 40 words -> 4 turns, loses its leading turn
    //   -> starts_with_assistant
    // doc 3: 30 words -> 3 turns -> dangling_user_turn
    // doc 4: 20 words -> 2 turns (12 + 8) -> ok
    val out = assemble(Seq(2L -> text(40), 3L -> text(30),
                           4L -> text(20)))
      .select(col("doc_id"), size(col("__turns")).as("n"),
              Conversations.validationReason(col("__turns"),
                                             col("__roles")).as("reason"),
              element_at(col("__roles"), 1).as("first_role"),
              Conversations.renderChat(col("__turns"), col("__roles"))
                .as("render"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(3, 3, 2))
    assert(out.map(_.getString(2)).toSeq ==
             Seq("starts_with_assistant", "dangling_user_turn", "ok"))
    // corruption preserves ORIGINAL roles: the surviving first turn was
    // turn 2 (words 13-24), so it still renders as the assistant
    assert(out(0).getString(3) == "assistant")
    assert(out(0).getString(4).startsWith("<|assistant|>w13 w14"))
    assert(out(2).getString(4) ==
             "<|user|>" + (1 to 12).map(i => s"w$i").mkString(" ") +
               "<|assistant|>" + (13 to 20).map(i => s"w$i").mkString(" ") +
               "<|end|>")
  }

  test("truncation keeps the maximal TAIL of whole pairs within budget " +
       "(q201 output vs a collected replay on real data)") {
    val rows = graft.operators.LlmQueries
      .queries("q201_chat_assembly")(spark, sf0001)
      .collect()
    assert(rows.length == 500)
    // recompute per-turn token counts independently and replay greedily
    val tk = assemble(
        graft.sources.Tables.documents(spark, sf0001)
          .select(col("doc_id"), col("text"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq)
      .select(col("doc_id"),
              Conversations.turnTokenCounts(col("__turns")).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val budget = 48L
    rows.foreach { r =>
      val (id, kp, kt) = (r.getLong(0), r.getLong(5), r.getLong(6))
      val pairs = tk(id).grouped(2).filter(_.size == 2).map(_.sum).toSeq
      // greedy from the tail
      val suffix = pairs.reverse.scanLeft(0L)(_ + _).drop(1)
      val expectKp = suffix.count(_ <= budget)
      val expectKt = if (expectKp == 0) 0L else suffix(expectKp - 1)
      assert(kp == expectKp && kt == expectKt,
             s"doc $id: got ($kp, $kt), want ($expectKp, $expectKt)")
      assert(kt <= budget, s"doc $id over budget")
      // maximality: one more pair would not fit
      if (expectKp < pairs.size)
        assert(suffix(expectKp) > budget, s"doc $id not maximal")
    }
  }

  test("q202 loss mask: pair-aligned tails, budget respected, mask " +
       "spec consistent with the token accounting") {
    val rows = graft.operators.LlmQueries
      .queries("q202_loss_mask")(spark, sf0001).collect()
    assert(rows.length > 50, s"expected many valid chats, got ${rows.length}")
    // the closed-form validity filter must select EXACTLY q201's
    // 'ok' verdicts
    val okIds = graft.operators.LlmQueries
      .queries("q201_chat_assembly")(spark, sf0001).collect()
      .filter(_.getString(3) == "ok").map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == okIds,
           "q202 rows must be exactly the q201-valid conversations")
    rows.foreach { r =>
      val (kt, ex, learned, masked, spec) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getString(5))
      assert(kt % 2 == 0, "kept tail must be whole pairs")
      assert(ex == learned + masked)
      assert(ex <= 48L, "truncated example must fit the budget")
      val entries = if (spec.isEmpty) Array.empty[String]
                    else spec.split(",")
      assert(entries.length == kt)
      entries.zipWithIndex.foreach { case (e, i) =>
        assert(e.startsWith(if (i % 2 == 0) "0:" else "1:"),
               s"mask parity broken at $i in $spec")
      }
      assert(entries.filter(_.startsWith("1:"))
               .map(_.drop(2).toLong).sum == learned)
      assert(entries.filter(_.startsWith("0:"))
               .map(_.drop(2).toLong).sum == masked)
    }
  }

  test("q204 prefix cache: groups are real first-turn collisions, " +
       "savings arithmetic holds, GLOBAL row is the exact sum") {
    val rows = graft.operators.LlmQueries
      .queries("q204_prefix_cache")(spark, sf0001).collect()
    val (globalRows, prefixRows) = rows.partition(_.getString(0) == "GLOBAL")
    assert(globalRows.length == 1 && prefixRows.nonEmpty)
    prefixRows.foreach { r =>
      assert(r.getLong(2) >= 2L)
      assert(r.getLong(4) == (r.getLong(2) - 1) * r.getLong(3))
    }
    val g = globalRows.head
    assert(g.getLong(2) == prefixRows.map(_.getLong(2)).sum)
    assert(g.getLong(3) == prefixRows.map(_.getLong(3)).sum)
    assert(g.getLong(4) == prefixRows.map(_.getLong(4)).sum)
    // shared md5s really are first-turn collisions: recompute counts
    val firstTurns = assemble(
        graft.sources.Tables.documents(spark, sf0001)
          .select(col("doc_id"), col("text"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq)
      .filter(size(col("__turns")) >= 1)
      .select(element_at(col("__turns"), 1).as("t1"))
      .collect().map(_.getString(0))
    val counts = firstTurns.groupBy(identity).filter(_._2.length >= 2)
    assert(prefixRows.length == counts.size)
    assert(prefixRows.map(_.getLong(2)).sum ==
             counts.values.map(_.length.toLong).sum)
  }

  test("q211 packed examples: slots are contiguous and disjoint per " +
       "window, windows respect capacity up to one waterline item, " +
       "and exactly the q202 examples are packed") {
    val rows = graft.operators.LlmQueries
      .queries("q211_packed_examples")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val q202Ids = graft.operators.LlmQueries
      .queries("q202_loss_mask")(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(2)).toSet == q202Ids)
    rows.groupBy(r => (r.getLong(0), r.getLong(1))).foreach {
      case ((band, batch), slot0) =>
        val slots = slot0.sortBy(_.getLong(4))
        assert(slots.head.getLong(4) == 0L,
               s"window ($band,$batch) must start at offset 0")
        slots.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getLong(5) == b.getLong(4),
                   s"window ($band,$batch): slots must be contiguous")
          case _ => ()
        }
        val total = slots.map(_.getLong(3)).sum
        val maxItem = slots.map(_.getLong(3)).max
        assert(total <= 128L + maxItem - 1,
               s"window ($band,$batch) exceeds waterline bound: $total")
        slots.foreach(r => assert(r.getLong(5) - r.getLong(4) ==
                                    r.getLong(3)))
    }
  }

  test("q201 plans as one row-local stage: no exchange, no generate, " +
       "no window") {
    val plan = graft.operators.LlmQueries
      .queries("q201_chat_assembly")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the final presentation orderBy
    assert(!plan.contains("Generate"), s"no explode:\n$plan")
    assert(!plan.contains("Window"), s"no window:\n$plan")
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 1,
           s"only the presentation sort may exchange:\n$plan")
  }
}
