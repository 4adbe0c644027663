package graft

import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** S6 unique-id contract against a store that actually ENFORCES
  * uniqueness (r15 VERDICT item 5): embedded Derby with a PRIMARY KEY
  * on `_id` stands in for the reference's MongoDB unique index
  * (utils.py:123-146). The point of these tests is that the conflict
  * path runs against REAL key rejections — `insertDocCollectionJdbc`
  * has no anti-join prefilter, so every replayed row is attempted and
  * Derby's SQLIntegrityConstraintViolation is what routes it to the
  * already-stored skip — unlike the filesystem-backed variant, whose
  * uniqueness argument assumes a single writer (see its Scaladoc). */
class SinksJdbcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url: String = {
    System.setProperty("derby.stream.error.file",
      System.getProperty("java.io.tmpdir") + "/derby.log")
    val u = "jdbc:derby:memory:graftsinkpk;create=true"
    val conn = java.sql.DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE docstore") catch { case _: Exception => () }
      st.execute("""CREATE TABLE docstore (
        "_id" VARCHAR(64) PRIMARY KEY, "doc" VARCHAR(4096))""")
      st.close()
    } finally conn.close()
    u
  }

  private def payloads(ids: Long*) =
    ids.toDF("id").select(col("id"),
      concat(lit("name-"), col("id")).as("name"))

  private def pay = struct(col("id"), col("name"))

  private def stored(): Seq[(String, Int)] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        """SELECT "_id", count(*) FROM docstore GROUP BY "_id"""")
      val b = Seq.newBuilder[(String, Int)]
      while (rs.next()) b += ((rs.getString(1), rs.getInt(2)))
      b.result()
    } finally conn.close()
  }

  test("replay lands every row exactly once through real PK conflicts") {
    assert(Sinks.insertDocCollectionJdbc(
      payloads(1L, 2L, 3L), pay, url, "docstore") == 3L)
    // Replay all three plus one new doc: the three dups are ATTEMPTED
    // (no prefilter) and rejected by Derby's primary key — three real
    // key conflicts — while the new doc inserts. attempted − inserted
    // == 3 is the observable that proves the conflict path executed.
    assert(Sinks.insertDocCollectionJdbc(
      payloads(1L, 2L, 3L, 4L), pay, url, "docstore") == 1L)
    val rows = stored()
    assert(rows.size == 4, s"expected 4 distinct _ids, got $rows")
    assert(rows.forall(_._2 == 1),
      s"a PK store can never hold a duplicate _id: $rows")
  }

  test("intra-batch duplicate payloads collapse to one stored row") {
    // Same payload twice in one batch (distinct source rows, identical
    // content hash): dropDuplicates collapses them before the insert,
    // and the store's constraint would reject the second regardless.
    val dupBatch = Seq(10L, 10L).toDF("id")
      .select(col("id"), lit("name-10").as("name"))
    assert(Sinks.insertDocCollectionJdbc(
      dupBatch, pay, url, "docstore") == 1L)
    assert(stored().count(_._2 > 1) == 0)
  }

  test("a row pre-inserted by a FOREIGN writer is skipped, not doubled") {
    // Simulates the concurrent-writer race the filesystem variant
    // cannot win: another writer stored doc 20 between our batch
    // construction and execution. The PK rejects our insert; the
    // batch's other row still lands.
    val id20 = payloads(20L).select(Sinks.docId(pay)).as[String].head()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        """INSERT INTO docstore ("_id", "doc") VALUES (?, ?)""")
      ps.setString(1, id20); ps.setString(2, "{\"foreign\":true}")
      ps.executeUpdate(); ps.close()
    } finally conn.close()
    assert(Sinks.insertDocCollectionJdbc(
      payloads(20L, 21L), pay, url, "docstore") == 1L)
    assert(stored().forall(_._2 == 1))
  }

  test("a non-uniqueness integrity violation PROPAGATES, not skipped") {
    // r16 ADVICE: the old matcher accepted ANY SQLState class 23 as
    // "duplicate key, already stored" — a row rejected by a CHECK or
    // NOT NULL constraint (Derby 23513/23502, same class) was silently
    // dropped yet reported present. A CHECK-constrained store must
    // fail the write loudly; only the PK/unique rejection (23505) is
    // the already-stored verdict.
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE checkedstore")
      catch { case _: Exception => () }
      st.execute("""CREATE TABLE checkedstore (
        "_id" VARCHAR(64) PRIMARY KEY, "doc" VARCHAR(4096),
        CHECK (LENGTH("doc") < 5))""")
      st.close()
    } finally conn.close()
    // Every real payload serializes past 5 chars → Derby CHECK
    // violation (SQLState 23513, class 23 but NOT a dup key).
    val e = intercept[Exception] {
      Sinks.insertDocCollectionJdbc(
        payloads(30L), pay, url, "checkedstore")
    }
    def hasCheckViolation(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[java.sql.SQLException] &&
        t.asInstanceOf[java.sql.SQLException].getSQLState == "23513" ||
        hasCheckViolation(t.getCause))
    assert(hasCheckViolation(e),
      s"expected the CHECK violation (23513) to propagate, got: $e")
  }

  test("a caller-supplied table name that is not an identifier fails " +
      "fast on the driver") {
    val e = intercept[IllegalArgumentException] {
      Sinks.insertDocCollectionJdbc(
        payloads(40L), pay, url, "docstore; DROP TABLE docstore")
    }
    assert(e.getMessage.contains("invalid table identifier"))
    // Schema-qualified names remain accepted (each segment quoted).
    assert(Sinks.insertDocCollectionJdbc(
      payloads(41L), pay, url, "APP.docstore") == 1L)
  }

  test("trailing/empty dot segments fail fast on the driver, not " +
      "store-side (r17 ADVICE)") {
    // Java's default split drops trailing empty segments, so
    // "docstore." and "a..." previously passed validation and reached
    // the store as malformed SQL — breaking the fail-fast contract
    // even though no injection was possible.
    for (bad <- Seq("docstore.", "a...", ".docstore", "..")) {
      val e = intercept[IllegalArgumentException] {
        Sinks.insertDocCollectionJdbc(payloads(42L), pay, url, bad)
      }
      assert(e.getMessage.contains("invalid table identifier"),
        s"'$bad' was not rejected on the driver")
    }
  }
}
