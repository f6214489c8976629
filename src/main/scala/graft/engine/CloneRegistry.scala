package graft.engine

/** Session-global registry of snapshot-clone tables. BigQuery snapshot
  * tables (`CREATE SNAPSHOT TABLE … CLONE`) are read-only by contract
  * — DML against one errors there, so the engine's DML runners consult
  * this registry and fail loud instead of silently mutating history.
  * Plain clones (`CREATE TABLE … CLONE`) stay writable and never
  * register.
  */
object CloneRegistry {
  private val readOnly =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def markReadOnly(table: String): Unit = readOnly.add(table.toLowerCase)

  /** Loud gate every mutation path calls with the resolved catalog
    * name before touching storage.
    */
  def requireWritable(table: String): Unit =
    if (readOnly.contains(table.toLowerCase))
      throw new IllegalArgumentException(
        s"$table is a snapshot table (CREATE SNAPSHOT TABLE … CLONE) " +
          "and is read-only; clone it with CREATE TABLE … CLONE to get " +
          "a writable copy")
}
