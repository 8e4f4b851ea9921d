package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Conversation / instruction-tuning data model — the nested shape an
  * SFT/chat pipeline runs on (array-of-turns per example) expressed with
  * row-local higher-order functions only: structure validation, chat-
  * template rendering, token accounting, and budgeted tail truncation
  * that keeps whole (user, assistant) exchange pairs.
  *
  * Every operator here is a pure projection over one row — no shuffle,
  * no window, no explode — so the family is embarrassingly parallel at
  * any corpus size: 100 TB of conversations cost exactly one scan, and
  * the work rides whole-stage codegen. Turn arrays are kept as TWO
  * parallel arrays (contents, roles) rather than array<struct> so the
  * DuckDB oracle can replay every step with plain list functions.
  *
  * Per the shingle/HOF discipline ([[Dedup.shinglesOfNorm]]): callers
  * materialize each derived array as a NAMED column before feeding it to
  * the next lambda, so interpreted lambdas never re-evaluate a whole
  * expression tree per element.
  */
object Conversations {

  /** 1..n as an array, EMPTY when n ≤ 0 — Spark's `sequence(1, 0)` is
    * the DESCENDING [1, 0] (step defaults to -1 when start > stop), so
    * a bare sequence over a possibly-empty conversation would fabricate
    * two phantom indices where DuckDB's generate_series yields none.
    */
  private def indices1To(n: Column): Column =
    slice(sequence(lit(1), greatest(n, lit(1))), lit(1), n)

  /** Split flat text into sentence "turns": terminal punctuation followed
    * by whitespace ends a turn; turns are trimmed, empties dropped, and
    * the conversation capped at `maxTurns`. (A final sentence with no
    * trailing whitespace keeps its punctuation — harmless, deterministic,
    * and identical under Java regex and RE2.)
    */
  def sentenceTurns(text: Column, maxTurns: Int = 8): Column =
    slice(filter(transform(split(text, "[.!?]\\s+"), s => trim(s)),
                 s => length(s) > 0),
          1, maxTurns)

  /** Non-empty whitespace tokens — materialize this as a NAMED column
    * before calling [[wordWindowTurnsOfWords]] (HOF discipline: the
    * window lambda slices the attribute; passing the split tree would
    * re-run the split once per turn).
    */
  def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), x => length(x) > 0)

  /** Fixed word-window turns over an ALREADY-MATERIALIZED token array:
    * consecutive `wordsPerTurn`-word chunks (last chunk may be short),
    * capped at `maxTurns` — the turn derivation for unpunctuated text
    * where [[sentenceTurns]] cannot split.
    */
  def wordWindowTurnsOfWords(words: Column, wordsPerTurn: Int = 12,
                             maxTurns: Int = 8): Column = {
    val nT = least(floor((size(words) + (wordsPerTurn - 1))
                           / wordsPerTurn).cast("int"),
                   lit(maxTurns))
    transform(indices1To(nT),
              i => array_join(slice(words,
                                    (i - 1) * wordsPerTurn + 1,
                                    lit(wordsPerTurn)),
                              " "))
  }

  /** Roles by original position: odd (1-based) turns are the user, even
    * turns the assistant — the alternation contract a well-formed chat
    * transcript satisfies. Kept as a parallel array so a structural edit
    * (e.g. a dropped leading turn) carries each turn's ORIGINAL role.
    */
  def turnRoles(turns: Column): Column =
    transform(indices1To(size(turns)),
              i => when(i % 2 === 1, lit("user")).otherwise(lit("assistant")))

  /** Whitespace token count of one already-trimmed, non-empty turn. */
  def turnTokens(turn: Column): Column =
    size(split(turn, "\\s+")).cast("long")

  /** Per-turn token counts (named-column input per the HOF discipline). */
  def turnTokenCounts(turns: Column): Column =
    transform(turns, t => turnTokens(t))

  /** Structure validation verdict over parallel (turns, roles) arrays:
    * 'too_short' (< 2 turns — no complete exchange), then
    * 'starts_with_assistant' (first role is not the user), then
    * 'dangling_user_turn' (odd turn count — the alternation leaves a
    * user turn unanswered), else 'ok'. Order matters and is part of the
    * contract (a corrupt transcript reports its FIRST defect).
    */
  def validationReason(turns: Column, roles: Column): Column =
    when(size(turns) < 2, lit("too_short"))
      .when(element_at(roles, 1) =!= lit("user"),
            lit("starts_with_assistant"))
      .when(pmod(size(turns), lit(2)) === 1, lit("dangling_user_turn"))
      .otherwise(lit("ok"))

  /** Render the chat template: `<|role|>content` per turn, `<|end|>`
    * terminal — the canonical serialized form a trainer tokenizes.
    */
  def renderChat(turns: Column, roles: Column): Column =
    concat(aggregate(zip_with(roles, turns,
                              (r, c) => concat(lit("<|"), r, lit("|>"), c)),
                     lit(""), (acc, x) => concat(acc, x)),
           lit("<|end|>"))

  /** Token cost of each complete (user, assistant) exchange pair: element
    * j covers turns 2j−1 and 2j (1-based); a dangling last turn is not a
    * pair and is excluded. Input is the NAMED per-turn token-count array.
    */
  def pairTokenSums(tokenCounts: Column): Column = {
    val np = floor(size(tokenCounts) / 2).cast("int")
    transform(indices1To(np),
              j => element_at(tokenCounts, (j * 2 - 1).cast("int")) +
                     element_at(tokenCounts, (j * 2).cast("int")))
  }

  /** Suffix sums of the pair costs: element k = tokens of the LAST k
    * pairs — monotone in k, so "how many trailing pairs fit a budget" is
    * a filter count over this array. Input is the NAMED pair-sum array.
    */
  def pairSuffixSums(pairSums: Column): Column = {
    val np = size(pairSums)
    transform(indices1To(np),
              k => aggregate(slice(pairSums, np - k + 1, k),
                             lit(0L), (acc, x) => acc + x))
  }

  /** Number of trailing complete pairs whose total token cost fits
    * `budget` — the context-window truncation that never splits an
    * exchange and always keeps the most recent context.
    */
  def keptPairs(suffixSums: Column, budget: Long): Column =
    size(filter(suffixSums, s => s <= lit(budget)))

  /** Canonical loss-mask run-length spec over a kept tail that starts
    * on a pair boundary: `0:n` for a user turn's n tokens (masked),
    * `1:m` for an assistant turn's (learned), comma-joined in turn
    * order — the compact form a trainer expands to per-token labels.
    */
  def maskSpec(keptTokenCounts: Column): Column =
    array_join(
      transform(indices1To(size(keptTokenCounts)),
                i => concat(when(i % 2 === 1, lit("0")).otherwise(lit("1")),
                            lit(":"),
                            element_at(keptTokenCounts, i)
                              .cast("string"))),
      ",")

  /** Learned (assistant-turn) token count of a pair-aligned kept tail:
    * the sum over EVEN 1-based positions.
    */
  def learnedTokens(keptTokenCounts: Column): Column =
    coalesce(
      aggregate(
        transform(indices1To(size(keptTokenCounts)),
                  i => when(i % 2 === 0,
                            element_at(keptTokenCounts, i))
                         .otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x),
      lit(0L))
}
