package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Public Suffix List matcher (publicsuffix.org/list/ semantics) —
  * the data-driven replacement for the two-vs-three-label heuristic in
  * [[graft.operators.WebClean.urlSite]]. Every domain-level corpus
  * policy (per-domain caps, domain blocklists, domain-stratified
  * sampling) keys on the REGISTRABLE domain, and the heuristic
  * mis-keys anything outside its hardcoded ccSLD pattern
  * (`foo.github.io`, `*.kawasaki.jp` wildcards, the `!city.…`/`!www.ck`
  * exception rules).
  *
  * Algorithm (the published spec):
  *  - a rule matches when its labels are a suffix of the host's
  *    labels, `*` consuming exactly one label;
  *  - the prevailing rule is the matching EXCEPTION rule if any, else
  *    the matching rule with the most labels, else the implicit
  *    default rule `*` (public suffix = the last label);
  *  - the public suffix is the matched labels (an exception rule's
  *    labels minus its leading one); the registrable domain is the
  *    public suffix plus one more label.
  *
  * The instance is an expression reference object (the classifier-
  * weights pattern): it serializes with the task binary once per
  * executor and matching is ≤ label-count hash probes per host —
  * in-scan, zero shuffles, no join. A full PSL is ~10k rules / a few
  * hundred KB, well inside reference-object budget.
  */
final class Psl(val normal: Set[String], val wildcardBases: Set[String],
                val exceptions: Set[String]) extends Serializable {

  /** Number of labels in `host`'s public suffix under these rules
    * (>= 1 for any non-empty host — the default rule; 0 for ""). */
  def suffixLabelCount(host: String): Int = {
    if (host.isEmpty) return 0
    // hosts arrive from arbitrary upstream extraction — lowercase here
    // so a mixed-case host can't silently miss every rule and fall to
    // the 1-label default (rules are lowercased at parse time)
    val labels = host.toLowerCase(java.util.Locale.ROOT).split('.')
    val n = labels.length
    var best = 1 // the implicit default rule `*`
    var i = 0
    while (i < n) {
      // suffixes visit longest-first, so the first exception hit is
      // the prevailing one and ties in `best` keep the longer rule
      val suffix = labels.slice(i, n).mkString(".")
      if (exceptions.contains(suffix)) return n - i - 1
      if (normal.contains(suffix) && n - i > best) best = n - i
      if (i + 1 < n &&
          wildcardBases.contains(labels.slice(i + 1, n).mkString(".")) &&
          n - i > best) best = n - i
      i += 1
    }
    best
  }

  /** Kernel entry point (UTF8String in, int out — see
    * [[graft.plans.PslSuffixLabels]]). */
  def suffixLabels(host: UTF8String): Int = suffixLabelCount(host.toString)
}

object Psl {

  /** Parse the standard PSL file format: `//` comments and blank
    * lines skipped, one rule per line (token before any whitespace),
    * `*.base` wildcard rules, `!rule` exception rules; ICANN and
    * PRIVATE sections both load (section markers are comments). */
  def parse(lines: Iterator[String]): Psl = {
    val normal = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    // the published list writes IDN rules in UNICODE (e.g. рф) while
    // crawl hosts arrive punycoded (xn--p1ai): normalize rules to the
    // wire (ASCII-compatible) form at parse time so matching keys on
    // what hosts actually look like. IDN.toASCII is identity on
    // already-ASCII rules, so the bundled subset and its SQL-rendered
    // oracle rules are unaffected.
    def toAscii(rule: String): String =
      try java.net.IDN.toASCII(rule)
      catch { case _: IllegalArgumentException => rule }
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.split("\\s+")(0).toLowerCase(java.util.Locale.ROOT))
      .foreach { rule =>
        if (rule.startsWith("!")) exc += toAscii(rule.substring(1))
        else if (rule.startsWith("*.")) wild += toAscii(rule.substring(2))
        else if (rule == "*") () // the implicit default rule
        else normal += toAscii(rule)
      }
    new Psl(normal.result(), wild.result(), exc.result())
  }

  /** Load a PSL file from disk (point this at the full published
    * list in production). */
  def load(path: String): Psl = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** Classpath resource the bundled subset loads from. Overridable via
    * the `graft.psl.resource` system property so tests can simulate a
    * missing/misplaced resource (the round-11 failure mode: a raw
    * `java -cp classes` launch without Compile/copyResources). */
  private val defaultResource = "/graft/psl_subset.dat"
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Psl]()

  /** The bundled SUBSET (src/main/resources/graft/psl_subset.dat):
    * the same file format with a hand-maintained slice of the public
    * list — enough to exercise every rule kind (multi-label suffixes,
    * wildcards, exceptions, private-section entries) in tests and
    * oracles without shipping the full list. Cached per resource name;
    * a missing resource throws on EVERY call (never caches a failure),
    * so callers must isolate the failure per-entry (see graft.Verify). */
  def subset: Psl = {
    val res = sys.props.getOrElse("graft.psl.resource", defaultResource)
    cache.computeIfAbsent(res, r => {
      val in = getClass.getResourceAsStream(r)
      require(in != null, s"bundled PSL subset resource missing: $r")
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try parse(src.getLines()) finally src.close()
    })
  }
}
