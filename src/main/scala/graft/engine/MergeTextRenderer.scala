package graft.engine

/** Renders the REPLACE_MERGE script text in the reference's exact
  * template form (`bumblebee/query.py:6-62`; golden asserted at
  * `executor/tests/test_transformation.py:403`), so dry-run output
  * shows the MERGE a BigQuery user of the reference would recognize.
  * Execution itself uses the partition-pruned rewrite in
  * TransformRunner.mergeReplaceTransform — this is presentation, the
  * rewrite is the engine.
  */
object MergeTextRenderer {

  private val autoTemplate =
    """-- Optimus generated
      |DECLARE partitions ARRAY<DATE>;
      |
      |%HEADER%
      |
      |CREATE TEMP TABLE `opt__partitions` AS (
      |  %SQL%
      |);
      |
      |SET (partitions) = (
      |    SELECT AS STRUCT
      |        array_agg(DISTINCT DATE(`%PCOL%`))
      |    FROM opt__partitions
      |);
      |
      |MERGE INTO
      |  `%DEST%` AS target
      |USING
      |  (
      |      Select * from `opt__partitions`
      |  ) AS source
      |ON FALSE
      |WHEN NOT MATCHED BY SOURCE AND DATE(`%PCOL%`) IN UNNEST(partitions)
      |THEN DELETE
      |WHEN NOT MATCHED THEN INSERT
      |  (
      |     %DCOLS%
      |  )
      |VALUES
      |  (
      |      %SCOLS%
      |  );
      |""".stripMargin

  private val filterTemplate =
    """-- Optimus generated
      |%HEADER%
      |
      |MERGE INTO
      |  `%DEST%` AS target
      |USING
      |  (
      |      %SQL%
      |  ) AS source
      |ON FALSE
      |WHEN NOT MATCHED BY SOURCE AND %FILTER%
      |THEN DELETE
      |WHEN NOT MATCHED THEN INSERT
      |  (
      |     %DCOLS%
      |  )
      |VALUES
      |  (
      |      %SCOLS%
      |  );
      |""".stripMargin

  private def prepare(cols: Seq[String]): String =
    cols.map(c => s"`$c`").mkString(",")

  /** Split a script into DDL "header" statements (CREATE TEMP FUNCTION
    * etc.) and the single DML/CTE body — `query.py:154-179`.
    */
  def parsedSql(script: String): (Seq[String], String) = {
    val stmts = StatementSplitter.split(script).map(_.trim).filter(_.nonEmpty)
    if (stmts.size <= 1) (Seq.empty, stmts.headOption.getOrElse(""))
    else {
      val ddl = raw"(?is)^\s*(CREATE|ALTER|DROP)\b".r
      val (headers, body) = stmts.partition(s => ddl.findFirstIn(s).isDefined)
      if (body.size != 1) throw new IllegalArgumentException(
        "invalid replace query, should have exactly one DML/CTE statements")
      (headers, body.head)
    }
  }

  /** Auto-discovery form: replace every partition the source touches. */
  def auto(script: String, destinationTable: String,
      destinationColumns: Seq[String], sourceColumns: Seq[String],
      partitionColumnName: String): String = {
    val (headers, body) = parsedSql(script)
    autoTemplate
      .replace("%HEADER%", headers.mkString("\n"))
      .replace("%SQL%", body)
      .replace("%DEST%", destinationTable)
      .replace("%PCOL%", partitionColumnName)
      .replace("%DCOLS%", prepare(destinationColumns))
      .replace("%SCOLS%", prepare(sourceColumns))
  }

  /** PARTITION_FILTER form: replace rows matching the user filter. */
  def fromFilter(script: String, destinationTable: String,
      destinationColumns: Seq[String], sourceColumns: Seq[String],
      filterExpression: String): String = {
    val (headers, body) = parsedSql(script)
    filterTemplate
      .replace("%HEADER%", headers.mkString("\n"))
      .replace("%SQL%", body)
      .replace("%DEST%", destinationTable)
      .replace("%FILTER%", filterExpression)
      .replace("%DCOLS%", prepare(destinationColumns))
      .replace("%SCOLS%", prepare(sourceColumns))
  }
}
