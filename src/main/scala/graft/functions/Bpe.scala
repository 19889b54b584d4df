package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL byte-pair-encoding token counting (SURVEY.md §2.13): the
  * q_token_budget family's whitespace proxy under-/over-counts relative to
  * what a training loader's tokenizer actually produces; this is the
  * standard greedy-merge BPE (pre-tokenize → per-word lowest-rank adjacent
  * merge to fixpoint), with a COMMITTED merge vocabulary, so token-budget /
  * packing / shard-balance numbers can quote loader-real token counts.
  *
  * The algorithm is the published BPE procedure (Sennrich et al. 2016; the
  * GPT-2 reference implementation's shape): a pre-tokenizer regex splits
  * text into words that carry their LEADING SPACE (so merges can learn
  * whole " the"-style tokens), then each word's symbol sequence repeatedly
  * merges the adjacent pair with the LOWEST rank in [[Merges]] until no
  * listed pair remains; the token count is the surviving symbol count.
  * Characters outside the vocabulary simply never merge — one token each —
  * so the count is total over arbitrary input (no <unk> handling needed
  * for counting).
  *
  * [[Merges]] is a fixed 183-rank vocabulary hand-derived from English
  * letter-pair frequency and the corpus's query-log word stock; ranks are
  * positions (lower merges first). It ships in code — the committed-
  * fixture requirement: zero egress, and every engine sees byte-identical
  * ranks. A production deployment swaps in its trained merges file; the
  * walk is vocabulary-agnostic.
  *
  * Scale: evaluation is per-row, state-free (a per-THREAD word→count memo
  * exploits natural-language word repetition), and wrapped in a codegen'd
  * unary Expression — the same whole-stage-codegen surface as
  * rolling_fingerprint, so a 100 TB corpus pays one fused map pass with no
  * UDF serialization boundary.
  */
object Bpe {
  /** GPT-2-style pre-tokenizer: contractions, space-prefixed letter runs,
    * space-prefixed digit runs, space-prefixed punctuation runs, residual
    * whitespace. Deterministic, no locale dependence. */
  private val PreTok = Pattern.compile(
    "'(?:s|d|m|t|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")

  /** The pre-tokens of `text` (words carrying their leading space) — the
    * unit BPE merges within; public so training derives word frequencies
    * with EXACTLY the segmentation encoding will use. */
  def preTokens(text: String): Seq[String] = {
    val m = PreTok.matcher(text)
    val b = Seq.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  /** Matcher form of [[preTokens]] for the per-row encode hot path (no
    * per-call Seq). */
  private[functions] def preTokMatcher(text: String): java.util.regex.Matcher =
    PreTok.matcher(text)

  /** Ordered merge list; rank = index, lower rank merges first. Any pair
    * not listed never merges. Later entries reference symbols earlier
    * entries create (e.g. " th"+"e" needs " t"+"h"). */
  val Merges: Array[(String, String)] = Array(
    // tier 1: space-prefixed first letters — the word-boundary symbols.
    // These rank FIRST, as in trained vocabularies (" t" is among the
    // earliest GPT-2 merges): greedy BPE only forms " the"-style
    // whole-word tokens if the space attaches before the char pairs
    // inside the word out-rank it.
    (" ", "t"), (" ", "a"), (" ", "o"), (" ", "s"), (" ", "w"),
    (" ", "c"), (" ", "i"), (" ", "b"), (" ", "p"), (" ", "f"),
    (" ", "m"), (" ", "d"), (" ", "h"), (" ", "l"), (" ", "r"),
    (" ", "e"), (" ", "n"), (" ", "g"), (" ", "j"), (" ", "k"),
    (" ", "q"), (" ", "u"), (" ", "v"), (" ", "1"), (" ", "2"),
    // tier 2: highest-frequency English letter pairs
    ("t", "h"), ("i", "n"), ("e", "r"), ("a", "n"), ("o", "n"),
    ("r", "e"), ("h", "e"), ("a", "t"), ("e", "n"), ("n", "d"),
    ("e", "s"), ("o", "r"), ("t", "e"), ("e", "d"), ("i", "s"),
    ("i", "t"), ("a", "l"), ("a", "r"), ("s", "t"), ("t", "o"),
    ("n", "t"), ("n", "g"), ("s", "e"), ("h", "a"), ("o", "u"),
    ("l", "e"), ("v", "e"), ("m", "e"), ("c", "o"), ("d", "e"),
    ("l", "l"), ("r", "i"), ("r", "o"), ("l", "i"), ("r", "a"),
    ("i", "c"), ("u", "r"), ("e", "a"), ("o", "m"), ("c", "a"),
    ("c", "h"), ("m", "a"), ("u", "s"), ("p", "e"), ("l", "a"),
    ("s", "i"), ("w", "a"), ("u", "n"), ("w", "h"), ("q", "u"),
    ("s", "h"), ("o", "w"), ("k", "e"), ("p", "a"), ("b", "a"),
    ("j", "o"), ("d", "u"), ("s", "c"), ("s", "p"), ("w", "i"),
    // tier 3: trigram/quadgram assembly from tier-1/2 symbols
    ("th", "e"), (" t", "he"), ("in", "g"), ("an", "d"), (" a", "nd"),
    ("er", "s"), ("ti", "on"), ("a", "tion"), ("en", "t"), ("m", "ent"),
    ("or", "t"), ("s", "ort"), (" s", "ort"), ("ar", "t"), ("p", "art"),
    (" p", "art"), ("c", "an"), ("s", "can"), (" s", "can"), ("at", "ch"),
    ("b", "atch"), (" b", "atch"), ("re", "am"), ("st", "ream"),
    (" st", "ream"), ("ab", "le"), ("t", "able"), (" t", "able"),
    ("a", "ble"), ("in", "dow"), ("w", "indow"), (" w", "indow"),
    ("as", "h"), ("h", "ash"), (" h", "ash"), ("o", "in"), ("j", "oin"),
    (" j", "oin"), ("er", "ge"), ("m", "erge"), (" m", "erge"),
    ("r", "der"), ("o", "rder"), (" o", "rder"), ("e", "y"), ("k", "ey"),
    (" k", "ey"), ("ar", "k"), ("sp", "ark"), (" sp", "ark"),
    ("al", "l"), ("sm", "all"), (" sm", "all"), ("as", "t"), ("f", "ast"),
    (" f", "ast"), ("d", "up"), (" d", "up"), ("a", "st"),
    // tier 4: common suffix/prefix glue (("o","w") already ranks in
    // tier 2 — the rank map REQUIRES uniqueness below, since a duplicate
    // would silently shadow the earlier rank)
    ("d", "ow"), ("e", "w"), ("o", "o"), ("e", "e"),
    ("a", "b"), ("u", "p"), ("i", "d"), ("a", "d"), ("i", "l"),
    ("o", "l"), ("e", "l"), ("u", "l"), ("i", "r"), ("o", "p"),
    ("i", "m"), ("a", "m"), ("u", "m"), ("o", "t"), ("u", "t"),
    ("i", "g"), ("a", "g"), ("o", "g"), ("e", "t"), ("i", "p"),
    ("a", "p"), ("e", "p"), ("o", "b"), ("e", "b"), ("i", "b"),
    ("o", "d"), ("u", "d"), ("e", "g"), ("u", "g"), ("i", "f"),
    ("o", "f"), ("e", "f"), ("a", "f"), ("u", "f"), ("i", "k"))

  /** The committed default vocabulary — what one-argument
    * `bpe_token_count(text)` counts with. */
  val Default: BpeVocab = new BpeVocab(Merges)

  /** Greedy BPE token count of one pre-token under the DEFAULT vocabulary
    * (see [[BpeVocab.encodeCount]]). */
  def encodeCount(word: String): Int = Default.encodeCount(word)

  /** Total BPE token count of `text` under the default vocabulary — the
    * codegen entry point (static forwarder callable from generated Java). */
  def countTokensJ(text: UTF8String): Int = Default.countTokens(text.toString)

  /** Total BPE token count under the LOADED vocabulary at `path` — the
    * codegen entry point for the two-argument form `bpe_token_count(text,
    * '/vocab/merges.txt')`. The registry resolves the path lazily PER JVM,
    * so executors load the file themselves: ship it on a shared
    * filesystem / object store (the same reachability contract as any
    * input path) or via `--files`. One load, then counting is exactly the
    * default vocabulary's codegen'd walk — a trained vocab costs nothing
    * at scan time. */
  def countTokensForJ(path: String, text: UTF8String): Int =
    vocabAt(path).countTokens(text.toString)

  // path -> loaded vocabulary, once per JVM (driver AND each executor).
  // IMMUTABLE-ARTIFACT CONTRACT (ADVICE r12): the memo is deliberately
  // keyed by PATH ALONE and never invalidated, because vocabAt sits on
  // the per-row codegen hot path — a freshness stat per call would cost
  // a filesystem RPC per row. A merges file is therefore an immutable
  // artifact: publish a retrained vocabulary under a NEW (versioned)
  // path — e.g. `/vocabs/bpe-v2/merges.txt` — never by overwriting the
  // old one, which this JVM (and every executor) would keep serving for
  // its lifetime. Distinct paths accumulate one entry each; vocabularies
  // are a handful per deployment, not unbounded.
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[String, BpeVocab]()
  def vocabAt(path: String): BpeVocab =
    loaded.computeIfAbsent(path, p => new BpeVocab(loadMerges(p)))

  // merges-file escaping: symbols may contain literal spaces (the leading-
  // space word-boundary symbols) and, in principle, tabs/newlines (a
  // whitespace-run pre-token can become a symbol), so fields are
  // tab-separated with C-style escapes — lossless for any symbol
  private def esc(s: String): String =
    s.flatMap { case '\\' => "\\\\"; case '\t' => "\\t"; case '\n' => "\\n"
                case '\r' => "\\r"; case c => c.toString }
  private def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b += '\\'; case 't' => b += '\t'
          case 'n' => b += '\n'; case 'r' => b += '\r'
          case other => b += other
        }
        i += 2
      } else { b += c; i += 1 }
    }
    b.toString
  }

  /** The Hadoop configuration merges-file I/O resolves filesystems with:
    * the active session's (spark.hadoop.* — object-store credentials,
    * endpoints — applied exactly as they reach table reads; code review
    * r12: a bare `new Configuration()` dropped them), falling back on
    * executors without an active session to defaults plus any
    * spark.hadoop.* keys from the executor's SparkConf. */
  private def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse {
        val c = new org.apache.hadoop.conf.Configuration()
        Option(org.apache.spark.SparkEnv.get).foreach(env =>
          env.conf.getAllWithPrefix("spark.hadoop.").foreach {
            case (k, v) => c.set(k, v)
          })
        c
      }

  /** Persist an ordered merge list (rank = line order) — the trained-
    * vocabulary artifact [[loadMerges]] reads back. */
  def writeMerges(path: String, merges: Array[(String, String)]): Unit = {
    val sb = new StringBuilder("#graft-bpe v1\n")
    merges.foreach { case (a, b) =>
      sb ++= esc(a); sb += '\t'; sb ++= esc(b); sb += '\n' }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf())
    val out = fs.create(p, true)
    try out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load an ordered merge list written by [[writeMerges]] — the
    * file-path route a production deployment uses to swap its trained
    * merges in for the committed default. */
  def loadMerges(path: String): Array[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf())
    val in = fs.open(p)
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toString("UTF-8")
    } finally in.close()
    text.split("\n", -1).iterator
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .map { l =>
        val tab = l.indexOf('\t')
        require(tab > 0, s"malformed merges line in $path: '$l'")
        (unesc(l.substring(0, tab)), unesc(l.substring(tab + 1)))
      }.toArray
  }

  /** TRAIN a merge vocabulary from word frequencies — the published BPE
    * training loop (Sennrich et al. 2016): start from code-point symbols,
    * repeatedly merge the most frequent adjacent pair, `nMerges` times (or
    * until no pair repeats). Deterministic: ties break on the
    * lexicographically smallest pair, so two engines training on the same
    * frequencies emit byte-identical merges files. `wordFreqs` should be
    * PRE-TOKENIZED words ([[preTokens]] — leading spaces carried) with
    * corpus counts; at scale that table comes out of one groupBy over the
    * corpus (DISTINCT words with counts, not token instances, so it fits
    * the driver — the standard tokenizer-training data reduction), and
    * this loop is O(nMerges · Σ|word|) over it. */
  /** TRAIN on a corpus COLUMN — the distributed face of [[train]] (r19
    * — VERDICT r18 #5): ONE partial-aggregated shuffle reduces the
    * corpus to its DISTINCT pre-tokenized words with counts (flatMap
    * over [[preTokens]] → groupBy word → count, map-side combined), and
    * the merge loop then runs over the reduced table. That reduction is
    * the standard tokenizer-training move: the distinct-word table
    * grows sublinearly in corpus size (Heaps' law), so the loop's input
    * fits the driver even when the corpus doesn't — at 100 TB the
    * shuffle carries words+counts, never documents. `minFreq` drops
    * sub-threshold words before collecting (the standard truncation for
    * pathological vocabularies; 1 = exact — note a dropped hapax can in
    * principle shift a pair count two freq-1 words share). Deterministic
    * end to end: pair counting is input-order-free, the loop tie-breaks
    * lexicographically, and the collected table is sorted — two engines
    * training on the same corpus emit byte-identical merges files
    * (spec-asserted against the driver-side derivation). */
  def trainOnCorpus(df: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int, minFreq: Long = 1L): Array[(String, String)] = {
    import org.apache.spark.sql.{functions => F, Encoders}
    val freqs = df.select(df.col(textCol).cast(StringType)).na.drop()
      .as(Encoders.STRING)
      .flatMap((t: String) => preTokens(t))(Encoders.STRING)
      .groupBy(F.col("value"))
      .agg(F.count(F.lit(1)).as("f"))
      .filter(F.col("f") >= minFreq)
      .orderBy("value")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(freqs, nMerges)
  }

  def train(wordFreqs: Seq[(String, Long)],
      nMerges: Int): Array[(String, String)] = {
    var words: Vector[(Vector[String], Long)] = wordFreqs.iterator.map {
      case (w, f) =>
        val syms = Vector.newBuilder[String]
        var i = 0
        while (i < w.length) {
          val l = Character.charCount(w.codePointAt(i))
          syms += w.substring(i, i + l)
          i += l
        }
        (syms.result(), f)
    }.toVector
    val out = Array.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          j += 1
        }
      }
      // a pair seen once merges nothing worth keeping; stop when no pair
      // repeats (the natural end of training on a small corpus)
      val candidates = counts.filter(_._2 >= 2L)
      if (candidates.isEmpty) exhausted = true
      else {
        val maxF = candidates.valuesIterator.max
        // deterministic tie-break: among max-count pairs, smallest (a, b)
        val (a, b) = candidates.collect { case (p, f) if f == maxF => p }
          .minBy(identity)
        out += ((a, b))
        words = words.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val nb = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                nb += (a + b); j += 2
              } else { nb += syms(j); j += 1 }
            }
            (nb.result(), f)
          }
        }
        r += 1
      }
    }
    out.result()
  }
}

/** One BPE merge vocabulary: the greedy encode walk plus its own
  * per-thread word→count memo (memos must be per-vocab — a shared memo
  * would serve one vocabulary\'s counts to another\'s queries). */
final class BpeVocab(val merges: Array[(String, String)]) extends Serializable {
  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // NUL-separated key: NUL can never appear inside a merge symbol
      // (symbols are built from text characters), so no two pairs
      // concatenate to the same key
      m.put(a + "\u0000" + b, i)
    }
    require(m.size == merges.length,
      s"duplicate merge pair in BPE merges (${merges.length} listed, ${m.size} distinct) " +
        "- a duplicate silently shadows the earlier rank")
    m
  }

  /** Greedy BPE over one pre-token: start from code-point symbols, merge
    * the lowest-rank adjacent pair (ALL its occurrences, left to right)
    * until no pair is in the vocabulary. Returns the surviving symbol
    * count. O(n · merges-applied) with n symbols — words are short, and
    * the per-thread memo makes repeated words O(1). */
  def encodeCount(word: String): Int = {
    var syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var n = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val l = Character.charCount(cp)
      syms(n) = word.substring(i, i + l)
      n += 1
      i += l
    }
    var len = n
    var done = len < 2
    while (!done) {
      // find the lowest-rank adjacent pair
      var best = Integer.MAX_VALUE
      var j = 0
      while (j < len - 1) {
        val r = rank.get(syms(j) + "\u0000" + syms(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
        val (a, b) = merges(best)
        val out = new Array[String](len)
        var src = 0
        var dst = 0
        while (src < len) {
          if (src < len - 1 && syms(src) == a && syms(src + 1) == b) {
            out(dst) = a + b
            src += 2
          } else {
            out(dst) = syms(src)
            src += 1
          }
          dst += 1
        }
        syms = out
        len = dst
        done = len < 2
      }
    }
    len
  }

  /** Per-thread LRU word→count memo (natural language repeats words; the
    * cap bounds executor memory at 16k entries per task thread). Transient
    * lazy: a vocab shipped in a task closure re-creates its memo JVM-side. */
  @transient private lazy val memo =
    ThreadLocal.withInitial[java.util.LinkedHashMap[String, Integer]](() =>
      new java.util.LinkedHashMap[String, Integer](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Integer]): Boolean = size() > 16384
      })

  private def countWord(w: String): Int = {
    val m = memo.get()
    val hit = m.get(w)
    if (hit != null) hit.intValue()
    else {
      val c = encodeCount(w)
      m.put(w, c)
      c
    }
  }

  /** Total BPE token count of `text` — the per-row hot path: walk the
    * matcher directly (the r12 restructure briefly went through
    * [[Bpe.preTokens]], allocating a Seq per ROW on a path that exists to
    * avoid per-row overhead). */
  def countTokens(text: String): Int = {
    val m = Bpe.preTokMatcher(text)
    var total = 0
    while (m.find()) total += countWord(m.group())
    total
  }
}

/** Codegen'd expression `bpe_token_count(text[, '/vocab/merges.txt'])` —
  * evaluation calls the static [[Bpe.countTokensJ]] (committed default
  * vocabulary) or [[Bpe.countTokensForJ]] (a TRAINED merges file, loaded
  * once per JVM through the path registry — r12, VERDICT r11 #7) from
  * inside whole-stage codegen (the pattern of Spark's own regexp
  * expressions: a fused loop calling a JVM-static helper; no UDF
  * serialization boundary, no interpreted fallback). The vocabulary path
  * must be a LITERAL: it selects a tokenizer at plan time, exactly like a
  * regexp pattern — per-row vocabularies are not a thing a loader does. */
case class BpeTokenCount(child: Expression,
    vocabPath: Option[String] = None) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any = vocabPath match {
    case Some(p) => Bpe.countTokensForJ(p, input.asInstanceOf[UTF8String])
    case None => Bpe.countTokensJ(input.asInstanceOf[UTF8String])
  }

  // the path embeds in generated Java as a string literal — escape it
  private def javaLit(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"; case '"' => "\\\""
      case '\n' => "\\n"; case '\r' => "\\r"
      case c => c.toString
    } + "\""

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => vocabPath match {
      case Some(p) =>
        s"${ev.value} = graft.functions.Bpe.countTokensForJ(${javaLit(p)}, $a);"
      case None =>
        s"${ev.value} = graft.functions.Bpe.countTokensJ($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCount {
  val identifier: FunctionIdentifier = FunctionIdentifier("bpe_token_count")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BpeTokenCount].getName, "bpe_token_count")
  val builder: Seq[Expression] => Expression = {
    case Seq(c) => BpeTokenCount(c)
    case Seq(c, p) if p.foldable &&
        p.dataType == org.apache.spark.sql.types.StringType =>
      val v = p.eval(null)
      if (v == null) throw new IllegalArgumentException(
        "bpe_token_count vocabulary path must not be NULL")
      BpeTokenCount(c, Some(v.toString))
    case Seq(_, p) => throw new IllegalArgumentException(
      "bpe_token_count's second argument must be a literal vocabulary " +
        s"path string, got $p")
    case exprs => throw new IllegalArgumentException(
      s"bpe_token_count requires 1 or 2 arguments, got ${exprs.size}")
  }
}
