package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Instruction/chat-data preparation — the SFT-stage pipeline the
  * pre-training ops don't cover: parse flat transcripts into typed
  * turns, validate dialogue structure, and render training strings with
  * special tokens plus the token accounting (assistant tokens are the
  * loss-bearing ones a token-budget planner needs).
  *
  * Everything is declarative: line explode + one per-doc window groups
  * continuation lines into turns, aggregates validate, and the render
  * is an ordered concat — no kernels, no UDFs, shuffles bounded by the
  * (doc, turn) keys.
  *
  * Reference behavior: the reference has no SFT surface; this extends
  * the training-data pipeline family (SURVEY §"LLM-data-pipeline
  * operators") the same way the curation/mixing ops do.
  */
object ChatData {

  /** Roles a transcript line may open a turn with. */
  private val RolePattern = "^(user|assistant|system): "

  /** Parse `textCol` transcripts into turns: a line starting with
    * `role: ` opens a turn; lines without a role prefix are
    * CONTINUATIONS of the open turn (re-joined with `\n`, the format's
    * round-trip). Lines before any role line are dropped (there is no
    * turn to attach them to). Returns (idCol, turn_idx, role, content).
    *
    * Scale shape: one explode + ONE window partitioned by doc (running
    * count of role lines = turn id) + one (doc, turn) micro-group
    * aggregate — the n-gram family's two-exchange shape.
    */
  def parseTurns(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val byLine = Window.partitionBy(col(idCol)).orderBy(col("__line_idx"))
    docs
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__line_idx", "__line")))
      .withColumn("__is_turn",
        col("__line").rlike(RolePattern).cast("long"))
      .withColumn("turn_idx", sum(col("__is_turn")).over(byLine) - 1)
      .filter(col("turn_idx") >= 0) // preamble before any role line
      .withColumn("__part",
        when(col("__is_turn") === 1,
          regexp_replace(col("__line"), RolePattern, ""))
          .otherwise(col("__line")))
      .withColumn("__role",
        when(col("__is_turn") === 1,
          regexp_extract(col("__line"), RolePattern, 1)))
      .groupBy(col(idCol), col("turn_idx"))
      .agg(
        // the role line is first in the group by construction
        max(col("__role")).as("role"),
        concat_ws("\n",
          transform(
            array_sort(collect_list(struct(col("__line_idx"), col("__part")))),
            p => p.getField("__part"))).as("content"))
  }

  /** Dialogue-structure validation over parsed turns: roles must
    * alternate user/assistant from user (a leading system turn is
    * allowed and shifts the expectation), every content non-empty, the
    * dialogue must end on assistant and carry >= minTurns turns.
    * Returns one row per doc with the counts and a deterministic
    * reject_reason precedence (role_order > empty_turn > ends_user >
    * too_short > kept) — the Gopher-filter reporting shape.
    */
  def validateDialogue(turns: DataFrame, minTurns: Int = 2,
                       idCol: String = "doc_id"): DataFrame = {
    val shifted = turns
      .withColumn("__sys0",
        max(when(col("turn_idx") === 0 && col("role") === "system", 1L)
          .otherwise(0L))
          .over(Window.partitionBy(col(idCol))))
      .withColumn("__expected",
        when(col("turn_idx") === 0 && col("__sys0") === 1, lit("system"))
          .otherwise(when(((col("turn_idx") - col("__sys0")) % 2) === 0,
            lit("user")).otherwise(lit("assistant"))))
    shifted.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") =!= col("__expected"), 1L).otherwise(0L))
          .as("role_violations"),
        sum(when(length(col("content")) === 0, 1L).otherwise(0L))
          .as("empty_turns"),
        max(struct(col("turn_idx"), col("role"))).getField("role")
          .as("__last_role"))
      .withColumn("ends_assistant",
        (col("__last_role") === "assistant").cast("long"))
      .withColumn("reject_reason",
        when(col("role_violations") > 0, "role_order")
          .when(col("empty_turns") > 0, "empty_turn")
          .when(col("ends_assistant") === 0, "ends_user")
          .when(col("n_turns") < minTurns, "too_short")
          .otherwise("kept"))
      .withColumn("keep", (col("reject_reason") === "kept").cast("long"))
      .drop("__last_role")
  }

  /** Render validated dialogues into training strings with special
    * tokens — `<|role|>\ncontent<|end|>\n` per turn — and the token
    * accounting: `assistant_tokens` (the loss-bearing completion
    * tokens) vs `total_tokens` (what the sequence costs to pack).
    * Only docs the validator kept are rendered.
    */
  def renderTemplate(turns: DataFrame, validated: DataFrame,
                     idCol: String = "doc_id"): DataFrame = {
    val toks = (c: org.apache.spark.sql.Column) => size(split(c, " "))
    turns
      .join(validated.filter(col("keep") === 1).select(col(idCol)), idCol)
      .withColumn("__rendered",
        concat(lit("<|"), col("role"), lit("|>\n"), col("content"),
          lit("<|end|>\n")))
      .groupBy(col(idCol))
      .agg(
        concat_ws("",
          transform(
            array_sort(collect_list(struct(col("turn_idx"),
              col("__rendered")))),
            p => p.getField("__rendered"))).as("__full"),
        sum(when(col("role") === "assistant",
          toks(col("content")).cast("long")).otherwise(0L))
          .as("assistant_tokens"),
        sum(toks(col("content")).cast("long")).as("total_tokens"))
      .select(col(idCol),
        graft.ops.Dedup.h60(col("__full")).as("rendered_h"),
        length(col("__full")).cast("long").as("rendered_chars"),
        col("assistant_tokens"), col("total_tokens"))
  }
}
