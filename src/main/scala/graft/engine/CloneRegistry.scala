package graft.engine

/** Session-global registry of read-only tables. BigQuery snapshot
  * tables (`CREATE SNAPSHOT TABLE … CLONE`) and materialized views are
  * read-only by contract — DML against either errors there, so the
  * engine's mutation paths consult this registry and fail loud instead
  * of silently mutating. Plain clones (`CREATE TABLE … CLONE`) stay
  * writable and never register. Each entry carries the reason shown in
  * the error, so a blocked write says WHICH contract it would break.
  */
object CloneRegistry {
  private val readOnly =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def markReadOnly(table: String): Unit = markReadOnly(table,
    "a snapshot table (CREATE SNAPSHOT TABLE … CLONE) — clone it with " +
      "CREATE TABLE … CLONE to get a writable copy")

  def markReadOnly(table: String, reason: String): Unit =
    readOnly.put(table.toLowerCase, reason)

  /** Forget a mark (the table was dropped / re-materialized). */
  def unmark(table: String): Unit = readOnly.remove(table.toLowerCase)

  /** The mark's reason, if any — lets a transaction pin the read-only
    * state alongside the table's files and restore BOTH on rollback.
    */
  def reasonOf(table: String): Option[String] =
    Option(readOnly.get(table.toLowerCase))

  /** Loud gate every mutation path calls with the resolved catalog
    * name before touching storage.
    */
  def requireWritable(table: String): Unit = {
    val reason = readOnly.get(table.toLowerCase)
    if (reason != null)
      throw new IllegalArgumentException(s"$table is read-only: $reason")
  }
}
