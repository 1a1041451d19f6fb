package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-training (SFT / preference-tuning) data preparation — the
  * stage after the pretraining curation the rest of this package
  * covers: multi-turn conversations are rendered into a chat template,
  * supervised examples get loss masks over their prompt tokens, and
  * preference pairs (chosen, rejected) are mined per prompt for
  * DPO/RLHF-style optimization.
  *
  * Everything here is deterministic (integer ids, exact string
  * assembly, total-order tiebreaks), so the materialized training
  * examples themselves are oracle-checkable — the same discipline as
  * the span-corruption/FIM example materialization in [[Denoise]].
  *
  * Scale shape: one shuffle each. [[renderChat]] groups by
  * conversation (conversations are bounded — thousands of turns at the
  * pathological tail, never corpus-sized), [[lossMask]] is a
  * ZERO-shuffle map pass over already-encoded word arrays, and
  * [[dpoPairs]] is two row_number windows over one hash partitioning
  * of the candidate table (both windows share the prompt-key exchange;
  * candidate sets per prompt are bounded by the sampler's N).
  */
object PostTraining {

  /** Flatten (conversation, turn, role, message) rows into one rendered
    * chat-template string per conversation (ChatML-style
    * `<|im_start|>role\nmessage<|im_end|>` blocks joined by newlines,
    * after a fixed system preamble).
    *
    * collect_list carries (turn, role, message) structs through ONE
    * groupBy shuffle; array_sort on the leading turn ordinal makes the
    * assembly order total and engine-independent regardless of arrival
    * order — rendered output is byte-deterministic. */
  def renderChat(turns: DataFrame, convCol: String, turnCol: String,
      roleCol: String, msgCol: String,
      systemPrompt: String = "You are a helpful assistant."): DataFrame = {
    val sorted = array_sort(collect_list(
      struct(col(turnCol).as("t"), col(roleCol).as("role"),
        col(msgCol).as("msg"))))
    turns.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"), sorted.as("ts"))
      .select(col(convCol), col("n_turns"),
        concat(
          lit(s"<|im_start|>system\n$systemPrompt<|im_end|>\n"),
          array_join(transform(col("ts"), t =>
            concat(lit("<|im_start|>"), t.getField("role"), lit("\n"),
              t.getField("msg"), lit("<|im_end|>"))), "\n")).as("rendered"))
  }

  /** SFT loss-masking over word-structured BPE ids
    * ([[Bpe.encodeWords]] output): the first `promptWords` words of
    * each example are the prompt — their token ids are replaced by the
    * `ignoreIndex` sentinel (-100, the cross-entropy ignore_index
    * convention) in the label stream, while input_ids keep the full
    * sequence. Returns (id, input_ids, labels, n_masked).
    *
    * Masking at the WORD boundary (not a character offset) is what the
    * word-structured encode exists for: the prompt/response split point
    * is exact under any merge table, with no partial-token ambiguity.
    * Zero-shuffle: one transform-with-index over the nested arrays,
    * fused into whatever scan produced the encode. */
  def lossMask(encodedWords: DataFrame, idCol: String, wordIdsCol: String,
      promptWords: Column, ignoreIndex: Long = -100L): DataFrame =
    encodedWords.select(col(idCol),
      flatten(col(wordIdsCol)).as("input_ids"),
      flatten(transform(col(wordIdsCol), (word, i) =>
        when(i.cast("long") < promptWords,
          transform(word, _ => lit(ignoreIndex))).otherwise(word)))
        .as("labels"))
      .withColumn("n_masked",
        size(filter(col("labels"), _ === lit(ignoreIndex))).cast("long"))

  /** Preference-pair mining: per prompt, pair the highest-scoring
    * candidate (chosen) with the lowest-scoring one (rejected), both
    * under the total order (score, id) so ties are engine-independent.
    * Prompts with a single candidate produce no pair (chosen ==
    * rejected is filtered). Returns (prompt, chosen_id, rejected_id,
    * margin).
    *
    * Both row_number windows partition by the SAME prompt key, so
    * Catalyst plans ONE exchange and two in-partition sorts — the
    * CANDIDATE TABLE is never self-joined. The final pairing IS still
    * a join, but of the two 1-row-per-prompt extreme branches (chosen
    * ⋈ rejected on the prompt key) — |prompts|-sized sides, not
    * candidate-sized. */
  def dpoPairs(cands: DataFrame, promptCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val best = Window.partitionBy(col(promptCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val worst = Window.partitionBy(col(promptCol))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    val ranked = cands
      .withColumn("__rc", row_number().over(best))
      .withColumn("__rr", row_number().over(worst))
    val chosen = ranked.filter(col("__rc") === 1)
      .select(col(promptCol), col(idCol).as("chosen_id"),
        col(scoreCol).as("chosen_score"))
    val rejected = ranked.filter(col("__rr") === 1)
      .select(col(promptCol), col(idCol).as("rejected_id"),
        col(scoreCol).as("rejected_score"))
    chosen.join(rejected, promptCol)
      .filter(col("chosen_id") =!= col("rejected_id"))
      .select(col(promptCol), col("chosen_id"), col("rejected_id"),
        round(col("chosen_score") - col("rejected_score"), 6).as("margin"))
  }
}
