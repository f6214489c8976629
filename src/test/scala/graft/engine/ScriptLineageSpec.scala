package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Lineage of multi-statement scripts whose table references only
  * appear after DECLARE/SET variable substitution — the reference
  * handles these with fake-select probes (`main.go:282-323`); here the
  * ScriptRunner renders the substituted text and lineage scans it.
  */
class ScriptLineageSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("tables inside control-flow blocks are discovered") {
    val script =
      """DECLARE n INT64 DEFAULT 0;
        |IF n = 0 THEN
        |  CREATE TEMP TABLE t AS (SELECT * FROM proj.ds.branch_a);
        |ELSE
        |  CREATE TEMP TABLE t AS (SELECT * FROM proj.ds.branch_b);
        |END IF;
        |SELECT * FROM t JOIN proj.ds.dim USING (id)""".stripMargin
    val r = Lineage.findDependenciesInScript(spark, script, "proj.ds.dest")
    // lineage is static: BOTH branches' tables are upstream deps
    assert(r.dependencies.toSet ==
      Set("proj.ds.branch_a", "proj.ds.branch_b", "proj.ds.dim"))
  }

  test("tables inside REPEAT and statement-CASE blocks are discovered") {
    val script =
      """DECLARE n INT64 DEFAULT 0;
        |REPEAT
        |  SET n = n + 1;
        |  CREATE TEMP TABLE acc AS (SELECT * FROM proj.ds.loop_src);
        |UNTIL n >= 2
        |END REPEAT;
        |CASE n
        |  WHEN 2 THEN SELECT * FROM proj.ds.case_a;
        |  ELSE SELECT * FROM proj.ds.case_b;
        |END CASE""".stripMargin
    val r = Lineage.findDependenciesInScript(spark, script, "proj.ds.dest")
    assert(r.dependencies.toSet ==
      Set("proj.ds.loop_src", "proj.ds.case_a", "proj.ds.case_b"))
  }

  test("a MERGE inside an IF keeps its USING source in lineage") {
    val script =
      """DECLARE go BOOL DEFAULT true;
        |IF go THEN
        |  MERGE `proj.ds.tgt` T USING (SELECT * FROM proj.ds.updates) S
        |  ON T.id = S.id
        |  WHEN MATCHED THEN UPDATE SET v = S.v
        |  WHEN NOT MATCHED THEN INSERT (id, v) VALUES (S.id, S.v);
        |END IF""".stripMargin
    val r = Lineage.findDependenciesInScript(spark, script, "proj.ds.tgt")
    assert(r.dependencies == Seq("proj.ds.updates"),
      s"MERGE WHEN/THEN must survive control-flow stripping, got ${r.dependencies}")
  }

  test("table reference built from script variables is discovered") {
    val script =
      """DECLARE src STRING DEFAULT 'proj.ds.hidden_events';
        |DECLARE run_q STRING DEFAULT CONCAT('SELECT * FROM ', src, ' WHERE d >= DATE "2024-01-01"');
        |EXECUTE IMMEDIATE run_q""".stripMargin
    val r = Lineage.findDependenciesInScript(spark, script, "proj.ds.dest")
    assert(r.dependencies == Seq("proj.ds.hidden_events"))
  }

  test("variables in predicate position don't hide the scanned table") {
    val script =
      """DECLARE cutoff DATE DEFAULT DATE '2024-02-01';
        |SELECT * FROM proj.ds.events WHERE d < cutoff""".stripMargin
    val r = Lineage.findDependenciesInScript(spark, script, "proj.ds.dest")
    assert(r.dependencies == Seq("proj.ds.events"))
  }

  test("a qualified upstream sharing a temp table's short name is kept") {
    val script =
      """CREATE TEMP TABLE stats AS (SELECT 1 AS x);
        |SELECT * FROM proj.ds.stats JOIN stats USING (x)""".stripMargin
    val r = Lineage.findDependenciesWithCatalyst(spark, script, "proj.ds.dest")
    // only the UNQUALIFIED reference is the script's own temp table;
    // the 3-part proj.ds.stats is a genuine upstream dependency
    assert(r.dependencies.contains("proj.ds.stats"))
    assert(!r.dependencies.contains("stats"))
  }

  test("destination and @ignoreupstream are still excluded in script lineage") {
    val script =
      """DECLARE q STRING DEFAULT 'SELECT * FROM proj.ds.dest JOIN /* @ignoreupstream */ proj.ds.skipme ON 1=1 JOIN proj.ds.keep ON 1=1';
        |EXECUTE IMMEDIATE q""".stripMargin
    val r = Lineage.findDependenciesInScript(spark, script, "proj.ds.dest")
    assert(r.dependencies == Seq("proj.ds.keep"))
    assert(r.ignored.contains("proj.ds.skipme"))
  }
}
