package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT/chat data preparation over raw interaction logs: assemble
  * multi-turn conversations (sessionize → role-map → merge consecutive
  * same-role messages) and fit them to a context budget at turn
  * granularity. The d103/d104 gates bind this API to the `events`
  * table; the API itself takes any frame with (key, timestamp, seq,
  * role, content) columns.
  *
  * Scale shape: every window and the turn aggregation cluster on a
  * `keyCol` prefix, so Catalyst plans ONE hash exchange for the whole
  * chain (pinned by `PlanAuditSpec`); per-key streams are bounded, no
  * global sort anywhere. Turn text is order-deterministic via sorted
  * (ts, seq) structs, never a bare collect_list.
  */
object Chat {

  /** Chat-style turns: break conversations on an inactivity gap
    * STRICTLY greater than `gapMinutes`, then collapse consecutive
    * same-role messages into turns (so role alternation holds by
    * construction — the chat-template invariant) and keep
    * conversations with at least `minTurns` turns.
    *
    * Output: (key, conv_idx, turn_idx, role, n_msgs, turn_text,
    * n_turns) — one row per turn, 1-based indexes.
    */
  def turns(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", seqCol: String = "event_id",
      roleCol: String = "role", contentCol: String = "content",
      gapMinutes: Int = 30, minTurns: Int = 2): DataFrame = {
    val key = col(keyCol)
    def ord: Seq[Column] = Seq(col(tsCol), col(seqCol))
    val w = Window.partitionBy(key).orderBy(ord: _*)
    val conv = events
      .withColumn("gap_us",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("brk",
        when(col("gap_us").isNull || col("gap_us") > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("conv_idx", sum(col("brk")).over(w))
    val w2 = Window.partitionBy(key, col("conv_idx")).orderBy(ord: _*)
    val withTurns = conv
      .withColumn("prev_role", lag(col(roleCol), 1).over(w2))
      .withColumn("tbrk",
        when(col("prev_role").isNull || col("prev_role") =!= col(roleCol), 1L)
          .otherwise(0L))
      .withColumn("turn_idx", sum(col("tbrk")).over(w2))
    withTurns
      .groupBy(key, col("conv_idx"), col("turn_idx"), col(roleCol).as("role"))
      .agg(count(lit(1)).as("n_msgs"),
        expr("array_join(transform(array_sort(collect_list(" +
          s"struct($tsCol, $seqCol, $contentCol))), x -> x.$contentCol), ' ')")
          .as("turn_text"))
      .withColumn("n_turns",
        max(col("turn_idx")).over(Window.partitionBy(key, col("conv_idx"))))
      .where(col("n_turns") >= minTurns)
  }

  /** Context-window fit at turn granularity: keep the LAST whole turns
    * whose reverse running cost (`costCol`, e.g. message or token
    * count) stays ≤ `budget`, plus ALWAYS the final turn — truncating
    * mid-turn corrupts the chat template. One extra window over the
    * same (key, conv) clustering as [[turns]] — no new shuffle.
    *
    * Output: one row per conversation with kept/dropped accounting and
    * the role of the first surviving turn.
    */
  def fitToContext(turns: DataFrame, budget: Long,
      keyCol: String = "user_id", costCol: String = "n_msgs"): DataFrame = {
    val wDesc = Window.partitionBy(col(keyCol), col("conv_idx"))
      .orderBy(col("turn_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .withColumn("revcum", sum(col(costCol)).over(wDesc))
      .withColumn("kept",
        col("revcum") <= budget || col("turn_idx") === col("n_turns"))
      .groupBy(col(keyCol), col("conv_idx"), col("n_turns"))
      .agg(
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_turns"),
        sum(when(col("kept"), col(costCol)).otherwise(0L)).as("kept_msgs"),
        sum(when(!col("kept"), col(costCol)).otherwise(0L)).as("dropped_msgs"),
        min(when(col("kept"), struct(col("turn_idx"), col("role"))))
          .getField("role").as("first_kept_role"))
  }

  /** Templated-response detection: conversations whose assistant turns
    * are mostly corpus-wide duplicates (canned/scripted replies) are
    * poor SFT data — the model would learn the template, not the
    * behavior. Hash each assistant turn's normalized text, count each
    * hash corpus-wide (one 16-byte-hash shuffle — turn text itself
    * never crosses the exchange twice), and roll up per conversation:
    * a turn is `templated` when its text occurs ≥ `minFreq` times
    * across ALL conversations; the conversation is flagged when at
    * least half its assistant turns are.
    *
    * Output: one row per conversation — (key, conv_idx,
    * n_asst_turns, n_templated, templated_permille, is_templated).
    */
  def templatedShare(turns: DataFrame, keyCol: String = "user_id",
      roleCol: String = "role", textCol: String = "turn_text",
      assistantRole: String = "assistant", minFreq: Int = 3): DataFrame = {
    val asst = turns.where(col(roleCol) === assistantRole)
      .withColumn("h", md5(lower(trim(col(textCol)))))
    val freq = asst.withColumn("freq",
      count(lit(1)).over(Window.partitionBy(col("h"))))
    freq.groupBy(col(keyCol), col("conv_idx"))
      .agg(count(lit(1)).as("n_asst_turns"),
        sum(when(col("freq") >= minFreq, 1L).otherwise(0L)).as("n_templated"))
      .withColumn("templated_permille",
        expr("n_templated * 1000 div n_asst_turns"))
      .withColumn("is_templated",
        col("n_templated") * 2 >= col("n_asst_turns"))
  }
}
