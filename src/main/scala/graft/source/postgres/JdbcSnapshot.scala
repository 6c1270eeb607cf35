package graft.source.postgres

/** S6 at cluster scale — the initial snapshot as a PARTITIONED JDBC read.
  *
  * The reference snapshots with one cursor per table
  * (reference: src/source/postgres/snapshot.zig:144-152) — correct on one
  * node, serial at 100 TB. The Spark-native shape is
  * `spark.read.jdbc(url, table, predicates)` with one PK-range predicate per
  * partition: N executors each open a connection, pin the SAME exported
  * snapshot (`SET TRANSACTION SNAPSHOT` — Postgres allows the snapshot to be
  * attached by any number of sessions while the exporting session lives),
  * and scan a disjoint range. The union is exactly the slot's consistent
  * point, row-for-row.
  *
  * This module builds the predicate/session plumbing; it is exercised
  * against the fixture tables in tests (no live Postgres in the container).
  */
object JdbcSnapshot {

  /** Disjoint, complete PK-range predicates for `parts` partitions over
    * [min, max]. Half-open ranges; first/last unbounded so rows outside the
    * sampled min/max still land in a partition. */
  def partitionPredicates(pkCol: String, min: Long, max: Long, parts: Int): Seq[String] = {
    require(parts > 0, "parts must be positive")
    if (parts == 1 || min >= max) return Seq("1=1")
    val span = max - min
    val bounds = (1 until parts).map(i => min + (span * i) / parts).distinct
    val cuts = bounds.filter(b => b > min && b < max)
    if (cuts.isEmpty) return Seq("1=1")
    val first = s"$pkCol < ${cuts.head}"
    val middle = cuts.sliding(2).collect { case Seq(a, b) =>
      s"$pkCol >= $a AND $pkCol < $b"
    }.toSeq
    val last = s"$pkCol >= ${cuts.last}"
    (first +: middle) :+ last
  }

  /** Per-connection session setup: every partition's connection must pin the
    * exported snapshot before scanning (snapshot.zig:75-100); passed to the
    * JDBC source as `sessionInitStatement`. */
  def sessionInit(snapshotName: String): String =
    Replication.snapshotSessionSql(snapshotName).mkString("; ")

  /** Options for `spark.read.format("jdbc")` — one scan task per predicate. */
  def readOptions(url: String, table: String, snapshotName: String,
      fetchSize: Int = 5000): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "sessionInitStatement" -> sessionInit(snapshotName),
    "fetchsize" -> fetchSize.toString,
    "isolationLevel" -> "REPEATABLE_READ")

  /** Unquoted-identifier gate for names interpolated into the range query —
    * same hardening as the replication command builders. */
  private def ident(s: String): String = {
    require(s.matches("[a-zA-Z_][a-zA-Z0-9_]*(\\.[a-zA-Z_][a-zA-Z0-9_]*)?"),
      s"not a plain identifier: '$s'")
    s
  }

  /** The live half of the partition plan: sample the PK range over a catalog
    * [[Connection]] (driver-side, one row), then cut predicates. The range
    * query runs INSIDE the exported snapshot's session when `snapshotName`
    * is given, so the bounds are consistent with what the partitions scan.
    * Empty table (NULL min) ⇒ the single full-scan predicate. */
  def planPartitions(conn: java.sql.Connection, table: String, pkCol: String,
      parts: Int, snapshotName: Option[String] = None): Seq[String] = {
    val st = conn.createStatement()
    try {
      snapshotName.foreach { snap =>
        Replication.snapshotSessionSql(snap).foreach(st.execute)
      }
      val rs = st.executeQuery(
        s"SELECT min(${ident(pkCol)}), max(${ident(pkCol)}) FROM ${ident(table)}")
      try {
        if (!rs.next() || { rs.getLong(1); rs.wasNull() }) Seq("1=1")
        else partitionPredicates(pkCol, rs.getLong(1), rs.getLong(2), parts)
      } finally rs.close()
    } finally st.close()
  }
}
