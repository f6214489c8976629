package graft.engine

/** Session-global registry of PERSISTENT (dataset-qualified) SQL UDFs
  * (BigQuery `CREATE FUNCTION p.d.f(...)`). Spark function names are
  * single-part, so the engine registers the UDF under a flattened
  * spelling (`p__d__f`, hyphens → underscores — the same convention the
  * table FQN mapping uses) and the dialect rewrites qualified CALL
  * SITES (`` `p.d.f`(…) `` or `p.d.f(…)`) to the flat name. Bare
  * single-part persistent functions register under their own name and
  * need no entry here.
  */
object FnRegistry {
  private val fns =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // monotone change counter: Dialect's rewrite memoization keys on it,
  // so a CREATE/DROP FUNCTION invalidates every cached rewrite whose
  // call-site mapping could have changed
  private val gen = new java.util.concurrent.atomic.AtomicLong(0L)
  def epoch: Long = gen.get()

  /** Flattened Spark-registrable spelling of a BigQuery function name. */
  def flatten(canonical: String): String =
    canonical.replace("-", "_").split("\\.").mkString("__")

  def register(canonical: String): String = {
    val flat = flatten(canonical)
    if (canonical.contains(".")) { fns.put(canonical.toLowerCase, flat); gen.incrementAndGet() }
    flat
  }

  def remove(canonical: String): Unit = {
    if (fns.remove(canonical.toLowerCase) != null) gen.incrementAndGet()
  }

  def entries: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    fns.asScala.toSeq
  }
}
