package graft.model

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  val yml: String =
    """dataSourceKey: defaultDS
      |destination: example
      |groupId: g1
      |outerAdapterKey: phoenix1
      |concurrent: true
      |dbMapping:
      |  database: mytest
      |  table: user
      |  targetTable: mytest2.user
      |  escapeUpper: true
      |  targetPk: {id: id}
      |  mapAll: true
      |  alter: true
      |  drop: false
      |  limit: false
      |  excludeColumns: [password]
      |  enumColumns: {gender: [Male, Female]}
      |  commitBatch: 3000
      |""".stripMargin

  test("YAML loader parses the reference sample shape (mytest_user.yml)") {
    val c = MappingConfigLoader.parse(yml)
    assert(c.destination == "example" && c.groupId == "g1" && c.concurrent)
    val m = c.dbMapping
    assert(m.database == "mytest" && m.table == "user" && m.targetTable == "mytest2.user")
    assert(m.targetPk == Map("id" -> "id"))
    assert(m.mapAll && m.alter && !m.drop && !m.limit)
    assert(m.excludeColumns == Set("password"))
    assert(m.enumColumns == Map("gender" -> Seq("Male", "Female")))
    assert(m.commitBatch == 3000)
    assert(m.readBatch == 5000) // default kept (MappingConfig.java:115)
  }

  test("YAML block lists parse (excludeColumns as '- item' lines)") {
    val blockYml =
      """destination: example
        |dbMapping:
        |  database: d
        |  table: t
        |  targetTable: tt
        |  excludeColumns:
        |    - password
        |    - secret
        |  mapAll: true
        |""".stripMargin
    val m = MappingConfigLoader.parse(blockYml).dbMapping
    assert(m.excludeColumns == Set("password", "secret"))
    assert(m.mapAll)
  }

  test("targetDb/targetTable split") {
    val m = MappingConfigLoader.parse(yml).dbMapping
    assert(m.targetDb.contains("mytest2") && m.targetTableName == "user")
  }

  test("route key includes groupId unless tcp mode (PhoenixSyncService.java:163-168)") {
    val c = MappingConfigLoader.parse(yml)
    assert(c.routeKey(includeGroup = true) == "example-g1_mytest-user")
    assert(c.routeKey(includeGroup = false) == "example_mytest-user")
  }

  test("enum decode is 1-based and forgiving (MappingConfig.java:273-287)") {
    val m = DbMapping("d", "t", "tt", enumColumns = Map("gender" -> Seq("Male", "Female")))
    assert(m.decodeEnum("gender", "1") == "Male")
    assert(m.decodeEnum("gender", "2") == "Female")
    assert(m.decodeEnum("gender", "0") == "0")   // out of range → raw
    assert(m.decodeEnum("gender", "9") == "9")
    assert(m.decodeEnum("gender", "x") == "x")   // non-numeric → raw
    assert(m.decodeEnum("other", "1") == "1")    // non-enum column → raw
  }

  test("exclusion check is case-sloppy (SyncUtil.java:42)") {
    val m = DbMapping("d", "t", "tt", excludeColumns = Set("password"))
    assert(m.isExcluded("password") && m.isExcluded("PASSWORD"))
    assert(!m.isExcluded("name"))
  }
}
