package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Twelfth query group: hand-checkable Markov transitions and the
  * tokenizer shoot-out's val-only measurement semantics.
  */
class PipelineQueries12Spec extends SparkSpec {
  import spark.implicits._

  test("markov transitions count per-user orderings, normalized per " +
    "source type") {
    val dir = Files.createTempDirectory("q166").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: a → b → a ; user 2: a → b  (transitions: a→b ×2, b→a ×1)
    Seq(
      (1L, ts(1), 1L, "a", 0.0, "{}"),
      (2L, ts(2), 1L, "b", 0.0, "{}"),
      (3L, ts(3), 1L, "a", 0.0, "{}"),
      (4L, ts(1), 2L, "a", 0.0, "{}"),
      (5L, ts(2), 2L, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q166_markov_transitions")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(("a", "b", 2L, 1000L), ("b", "a", 1L, 1000L)))
  }

  test("markov transitions never cross users") {
    val dir = Files.createTempDirectory("q166b").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // interleaved in time across users: u1 a..b, u2 c..d — no a→c or
    // b→d transitions may appear
    Seq(
      (1L, ts(1), 1L, "a", 0.0, "{}"),
      (2L, ts(2), 2L, "c", 0.0, "{}"),
      (3L, ts(3), 1L, "b", 0.0, "{}"),
      (4L, ts(4), 2L, "d", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q166_markov_transitions")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(("a", "b", 1L, 1000L), ("c", "d", 1L, 1000L)))
  }
}
