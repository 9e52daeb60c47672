package graft.queries

import graft.model.CanalDml
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Literal CDC fixtures (FIXTURES.md §1 variants) used by the fixture-based
 * correctness queries (K2 pk-change, K4 truncate, X2 router). Constructed
 * identically here (Spark) and in the DuckDB oracle (VALUES CTEs) so the
 * comparison is end-to-end through the engine, not through parquet.
 */
object Fixtures {

  private def dml(db: String, table: String, typ: String, es: Long,
                  data: Seq[Map[String, String]],
                  old: Seq[Map[String, String]] = null): CanalDml =
    CanalDml("example", "g1", db, table, typ, isDdl = false, sql = null,
      es = es, ts = es + 1, data = data, old = old)

  /** K2 — PK-change sequence on `mytest.user` (pk `id`):
    * final state must be id=2→bob2, id=3→alice2, id=5→eve. */
  val pkChangeDmls: Seq[CanalDml] = Seq(
    dml("mytest", "user", "INSERT", 1,
      Seq(Map("id" -> "1", "name" -> "alice"), Map("id" -> "2", "name" -> "bob"))),
    // UPDATE with pk in `old`: key 1 → 3 (delete old key, upsert new)
    dml("mytest", "user", "UPDATE", 2,
      Seq(Map("id" -> "3", "name" -> "alice2")), Seq(Map("id" -> "1"))),
    // plain UPDATE (old has no pk): full post-image upsert
    dml("mytest", "user", "UPDATE", 3,
      Seq(Map("id" -> "2", "name" -> "bob2")), Seq(Map("name" -> "bob"))),
    dml("mytest", "user", "INSERT", 4, Seq(Map("id" -> "4", "name" -> "dave"))),
    dml("mytest", "user", "DELETE", 5, Seq(Map("id" -> "4", "name" -> "dave"))),
    dml("mytest", "user", "INSERT", 6, Seq(Map("id" -> "5", "name" -> "eve")))
  )

  /** K4 — truncate barrier: rows before the TRUNCATE vanish;
    * final state is id=3→carol, id=1→adam2. */
  val truncateDmls: Seq[CanalDml] = Seq(
    dml("mytest", "user", "INSERT", 1, Seq(Map("id" -> "1", "name" -> "al"))),
    dml("mytest", "user", "INSERT", 2, Seq(Map("id" -> "2", "name" -> "bo"))),
    dml("mytest", "user", "TRUNCATE", 3, null),
    dml("mytest", "user", "INSERT", 4, Seq(Map("id" -> "3", "name" -> "carol"))),
    dml("mytest", "user", "INSERT", 5, Seq(Map("id" -> "1", "name" -> "adam"))),
    dml("mytest", "user", "UPDATE", 6, Seq(Map("id" -> "1", "name" -> "adam2")),
      Seq(Map("name" -> "adam")))
  )

  def toDf(spark: SparkSession, dmls: Seq[CanalDml]): DataFrame = {
    import spark.implicits._
    dmls.toDF()
  }

  /** X2 — routing fixture: configs and incoming event headers. */
  val routerConfigs: Seq[(String, String, String, String)] = Seq(
    ("example", "mytest", "user", "MYTEST2.USER"),
    ("example", "mytest", "user", "BACKUP.USER"), // fan-out: same source, 2nd target
    ("example", "mytest", "order", "MYTEST2.ORDER"),
    ("other", "mytest", "user", "X.Y")
  )
  val routerEvents: Seq[(Long, String, String, String)] = Seq(
    (1L, "example", "mytest", "user"),
    (2L, "example", "mytest", "order"),
    (3L, "example", "mytest", "ghost"), // unmatched → dropped
    (4L, "nope", "mytest", "user")      // unmatched destination → dropped
  )

  /** D1 — DDL statements for the parser golden query. */
  val ddlStatements: Seq[(Long, String)] = Seq(
    (1L, "ALTER TABLE user ADD COLUMN age INT DEFAULT 18"),
    (2L, "ALTER TABLE user ADD gender ENUM('M','F') NOT NULL"),
    (3L, "ALTER TABLE user DROP COLUMN age"),
    (4L, "ALTER TABLE `user` ADD COLUMN score DECIMAL(10,2) DEFAULT '0.5', ADD note VARCHAR(255)"),
    (5L, "TRUNCATE TABLE user"),
    (6L, "CREATE INDEX idx ON user(name)") // unsupported → no ops
  )
}
