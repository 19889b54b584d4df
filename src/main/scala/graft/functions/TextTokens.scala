package graft.functions

/** THE whitespace tokenizer, as one SQL-expression string. Every Spark-side
  * consumer (TextAnalysis, Curation, InvertedIndex) interpolates this —
  * previously three verbatim copies — so a tokenizer change can never
  * de-synchronize the operators whose oracles assume one token definition.
  * The DuckDB twin is [[graft.operators.TextAnalysis.DuckToks]]. */
object TextTokens {
  // r19: the fused native byte-scan tokenizer (functions/Tokens.scala)
  // replaces the HOF formulation `filter(split(text, ' '), w -> w <> '')`
  // everywhere at once — same token arrays by construction (the native
  // expression's scaladoc carries the argument; NativeFunctionSpec asserts
  // equality on the corpus plus adversarial strings).
  val ToksSql: String = "graft_tokens(text)"
}
