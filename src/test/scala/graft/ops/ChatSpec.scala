package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the chat-data API on in-memory frames: exact-gap
  * boundary, same-role merge, text ordering, and the always-keep-final-
  * turn rule — the invariants the d103/d104 oracles exercise only as a
  * whole.
  */
class ChatSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ev(rows: (Long, String, Long, String, String)*) = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      rows.map { case (u, ts, id, r, c) =>
        Row(u, Timestamp.valueOf(ts), id, r, c) }.asJava,
      T.StructType(Seq(
        T.StructField("user_id", T.LongType),
        T.StructField("ts", T.TimestampType),
        T.StructField("event_id", T.LongType),
        T.StructField("role", T.StringType),
        T.StructField("content", T.StringType))))
  }

  test("a gap of exactly 30 minutes does NOT break the conversation; >30 does") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "user", "a"),
      (1L, "2024-01-01 10:30:00", 2L, "assistant", "b"), // exactly 30 min
      (1L, "2024-01-01 11:00:01", 3L, "user", "c"),      // 30 min 1 s → break
      (1L, "2024-01-01 11:05:00", 4L, "assistant", "d"))
    val t = Chat.turns(df, minTurns = 1).collect()
    val convs = t.map(_.getLong(1)).distinct.sorted
    assert(convs.toSeq == Seq(1L, 2L), s"expected 2 conversations: ${t.mkString(";")}")
    assert(t.count(_.getLong(1) == 1L) == 2) // a|b = 2 turns
  }

  test("consecutive same-role messages merge into one turn, text in (ts, seq) order") {
    val df = ev(
      (7L, "2024-01-01 09:00:00", 10L, "user", "hello"),
      (7L, "2024-01-01 09:00:30", 11L, "user", "again"),
      (7L, "2024-01-01 09:00:30", 12L, "user", "tie"), // ts tie → event_id order
      (7L, "2024-01-01 09:01:00", 13L, "assistant", "hi"))
    val t = Chat.turns(df).orderBy("turn_idx").collect()
    assert(t.length == 2)
    assert(t(0).getAs[String]("role") == "user")
    assert(t(0).getAs[Long]("n_msgs") == 3L)
    assert(t(0).getAs[String]("turn_text") == "hello again tie")
    assert(t(1).getAs[String]("turn_text") == "hi")
  }

  test("single-turn conversations are dropped at the default minTurns") {
    val df = ev(
      (3L, "2024-01-01 08:00:00", 1L, "user", "alone"),
      (3L, "2024-01-01 08:00:10", 2L, "user", "still alone"))
    assert(Chat.turns(df).isEmpty)
  }

  test("fitToContext always keeps the final turn, even when it alone exceeds the budget") {
    val df = ev(
      (5L, "2024-01-01 12:00:00", 1L, "user", "q1"),
      (5L, "2024-01-01 12:00:10", 2L, "assistant", "a1"),
      (5L, "2024-01-01 12:00:20", 3L, "assistant", "a2"),
      (5L, "2024-01-01 12:00:30", 4L, "assistant", "a3"),
      (5L, "2024-01-01 12:01:00", 5L, "user", "q2"))
    // turns: user(1 msg), assistant(3 msgs), user(1 msg)
    val fit1 = Chat.fitToContext(Chat.turns(df), budget = 0).collect()(0)
    assert(fit1.getAs[Long]("kept_turns") == 1L) // only the forced final turn
    assert(fit1.getAs[String]("first_kept_role") == "user")
    assert(fit1.getAs[Long]("dropped_msgs") == 4L)
    // budget 4 fits the last two turns (1 + 3), not the first
    val fit4 = Chat.fitToContext(Chat.turns(df), budget = 4).collect()(0)
    assert(fit4.getAs[Long]("kept_turns") == 2L)
    assert(fit4.getAs[Long]("kept_msgs") == 4L)
    assert(fit4.getAs[String]("first_kept_role") == "assistant")
  }

  test("templatedShare flags conversations whose assistant turns are corpus-wide canned") {
    // three users, each one conversation: the assistant reply "ok" is
    // shared by all three (freq 3 ≥ minFreq) while the unique-<u>
    // replies are not; user 3 gets a third assistant turn so its
    // canned share falls below the ≥½ flagging rule.
    val rows = (1L to 3L).flatMap { u =>
      val base = Seq(
        (u, "2024-01-01 10:00:00", u * 100 + 1, "user", "hi"),
        (u, "2024-01-01 10:00:10", u * 100 + 2, "assistant", "ok"),
        (u, "2024-01-01 10:00:20", u * 100 + 3, "user", "more"),
        (u, "2024-01-01 10:00:30", u * 100 + 4, "assistant", s"unique-$u-a"))
      if (u == 3L) base ++ Seq(
        (u, "2024-01-01 10:00:40", u * 100 + 5, "user", "again"),
        (u, "2024-01-01 10:00:50", u * 100 + 6, "assistant", s"unique-$u-b"))
      else base
    }
    val out = Chat.templatedShare(Chat.turns(ev(rows: _*)))
      .orderBy(col("user_id")).collect()
    // users 1/2: 1 of 2 canned → 500‰, flagged (1*2 >= 2); user 3:
    // 1 of 3 canned → 333‰, not flagged
    assert(out.map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("n_asst_turns"), r.getAs[Long]("n_templated"),
      r.getAs[Long]("templated_permille"), r.getAs[Boolean]("is_templated"))).toSeq ==
      Seq((1L, 2L, 1L, 500L, true), (2L, 2L, 1L, 500L, true),
        (3L, 3L, 1L, 333L, false)))
  }
}
