package graft

import java.nio.file.Files
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.SparkSession

import graft.core.config.{AppConfig, TaskConfig}
import graft.core.window.{DateHelper, WindowFactory}
import graft.engine.{MetricsCollector, TransformRunner}

/** CLI entrypoint — the Spark-native restatement of the reference's
  * executor main (`bq2bq.py:15-51`, `main.py:14-40`, SURVEY §3.1/§3.3):
  * env contract in, windowed macro-rendered transformation through the
  * load-method engine, xcom metrics JSON out.
  *
  * Env: DSTART DEND [EXECUTION_TIME DRY_RUN JOB_LABELS JOB_DIR
  * XCOM_PATH] + the TaskConfig contract (PROJECT DATASET TABLE SQL_TYPE
  * LOAD_METHOD ...), or `in/properties.cfg` under JOB_DIR.
  */
object GraftRun {
  def main(args: Array[String]): Unit = {
    // persistent warehouse + derby metastore: tables created by one run
    // are visible to the next (the standalone equivalent of the hosted
    // catalog the reference writes into)
    val warehouse = sys.env.getOrElse("GRAFT_WAREHOUSE", "graft-warehouse")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // FAIR scheduling so QUERY_PRIORITY can weight INTERACTIVE over
      // BATCH runs (pools in resources/fairscheduler.xml, picked up from
      // the classpath; routing set per-run by TransformRunner)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$warehouse/tables")
      // zstd over the default snappy: ~30% smaller warehouse tables for
      // equal scan speed — the right trade at 100 TB
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$warehouse/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
    try run(sys.env, spark) finally spark.stop()
  }

  /** The whole env-contract run against a provided session — main wires
    * `sys.env` + the persistent-metastore session; tests inject both.
    */
  def run(env: Map[String, String], spark: SparkSession): Unit = {
    val app = AppConfig.fromEnv(env)
    val sqlFile = app.sqlFile.getOrElse(
      throw new IllegalArgumentException("no query.sql under $JOB_DIR/in"))
    val sql = Files.readString(sqlFile)
    val conf = app.propertiesFile match {
      case Some(p) => TaskConfig.fromIni(Files.readString(p))
      case None => TaskConfig.fromEnv(env)
    }

    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setJobGroup("graft-run",
      app.jobLabels.map { case (k, v) => s"$k=$v" }.mkString(","))

    // optional bootstrap DDL (register external sources, create dest)
    app.sqlFile.map(_.getParent.resolve("init.sql")).filter(Files.exists(_)).foreach { f =>
      graft.engine.StatementSplitter.split(Files.readString(f))
        .foreach(stmt => spark.sql(stmt))
    }

    val metrics = new MetricsCollector(spark)
    try {
      // localize the window boundaries to the task timezone
      // (transformation.py:40-48)
      val tz = conf.timezone
      val dstart = DateHelper.localise(app.dstart, "UTC")
        .withZoneSameInstant(java.time.ZoneId.of(tz)).toLocalDateTime
      val dend = DateHelper.localise(app.dend, "UTC")
        .withZoneSameInstant(java.time.ZoneId.of(tz)).toLocalDateTime
      val execTime = DateHelper.localise(app.executionTime, "UTC")
        .withZoneSameInstant(java.time.ZoneId.of(tz)).toLocalDateTime
      val window = WindowFactory.createWindowWithTime(dstart, dend)

      val runner = new TransformRunner(spark)
      // spillover path (A18): USE_SPILLOVER + in/spillover_date.sql →
      // re-run the main query per distinct spillover date
      app.spilloverSqlFile.filter(_ => conf.useSpillover) match {
        case Some(sf) =>
          val dest = runner.catalogName(conf.destinationTable)
          val partitionField = runner.partitionSpecOf(dest) match {
            case graft.engine.PartitionSpec.DayColumn(c) => c
            case _ => throw new IllegalArgumentException(
              s"spillover requires a day-partitioned destination, got $dest")
          }
          runner.spilloverTransform(conf, sql, Files.readString(sf), window,
            execTime, partitionField, app.dryRun)
        case scala.None =>
          runner.transform(conf, sql, window, execTime, app.dryRun)
      }

      metrics.writeXcom(app.xcomPath,
        app.executionTime.format(DateTimeFormatter.ISO_LOCAL_DATE_TIME))
    } finally metrics.detach()
  }
}
