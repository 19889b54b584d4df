package graft.functions

/** THE whitespace tokenizer, as one SQL-expression string. Every Spark-side
  * consumer (TextAnalysis, Curation, InvertedIndex) interpolates this —
  * previously three verbatim copies — so a tokenizer change can never
  * de-synchronize the operators whose oracles assume one token definition.
  * The DuckDB twin is [[graft.operators.TextAnalysis.DuckToks]]. */
object TextTokens {
  val ToksSql: String = "filter(split(text, ' '), w -> w <> '')"
}
