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

  /** Flattened Spark-registrable spelling of a BigQuery function name. */
  def flatten(canonical: String): String =
    canonical.replace("-", "_").split("\\.").mkString("__")

  def register(canonical: String): String = {
    val flat = flatten(canonical)
    if (canonical.contains(".")) fns.put(canonical.toLowerCase, flat)
    flat
  }

  def remove(canonical: String): Unit = fns.remove(canonical.toLowerCase)

  def entries: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    fns.asScala.toSeq
  }
}
