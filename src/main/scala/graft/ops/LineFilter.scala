package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level quality curation (the CCNet / RefinedWeb line-rule pass):
  * drop boilerplate LINES — nav menus, ALL-CAPS headers, digit spam,
  * fragments — and reassemble each document from its surviving lines.
  * The line-granular complement of the document-level `heuristicKeep`
  * gates: a good article keeps its prose and loses its chrome instead
  * of being dropped whole.
  *
  * Scale shape: the keep predicate is pure codegen Column arithmetic on
  * each exploded line (integer counts only — engine-exact, so DuckDB
  * replays it); the ONLY shuffle is the groupBy(id) reassembly, and
  * rows are (id, idx, line) — no full-document payload rides it.
  */
object LineFilter {

  /** Keep predicate for one line; all-integer arithmetic so oracles
    * replay exactly: >= 10 trimmed chars, >= 3 words, not
    * uppercase-dominated (|a-z| >= |A-Z|), digit fraction < 0.4. */
  def lineKeep(line: Column): Column = {
    val lower = length(regexp_replace(line, "[^a-z]", ""))
    val upper = length(regexp_replace(line, "[^A-Z]", ""))
    val digits = length(regexp_replace(line, "[^0-9]", ""))
    length(trim(line)) >= 10 &&
      size(filter(split(trim(line), " "), w => length(w) > 0)) >= 3 &&
      lower >= upper &&
      digits * 5 < length(line) * 2
  }

  /** One row per input document: (id, n_lines, n_kept, text_clean) —
    * `text_clean` is the document reassembled from kept lines in
    * original order, NULL when no line survives. A NULL-text document
    * stays in the output as (id, 0, 0, NULL). */
  def cleanLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame = {
    // sep is a LITERAL separator on both the split and the rejoin (a
    // regex-metachar sep like "|" must not explode per character);
    // posexplode_outer keeps NULL-text documents in the output (one
    // all-dropped row) instead of silently losing them
    val lines = df.select(col(idCol).as("id"),
      posexplode_outer(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("line_idx", "line")))
    lines
      .withColumn("keep", lineKeep(col("line")))
      .groupBy(col("id"))
      .agg(
        count(col("line")).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(when(col("keep"),
          struct(col("line_idx"), col("line"))))).as("kept"))
      .select(col("id"), col("n_lines"), col("n_kept"),
        when(col("n_kept") > 0,
          array_join(transform(col("kept"), k => k.getField("line")), sep))
          .as("text_clean"))
  }
}
