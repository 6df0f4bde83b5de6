package graft.sources

/** Dialect seam for the reference's catalog-side stanzas (A11–A13, ref
  * `src/bak_unload.ps1:90-112`): the destructive pre-load, the snapshot
  * restore, and the idempotent read grant. The T-SQL spellings are exactly
  * the reference's, but no SQL Server exists in this environment, so they
  * are string-built and never executed; the Derby instance expresses the
  * same three contracts in the catalog `JdbcSnapshotSpec` actually runs
  * against. A future environment with a live SQL Server runs the same
  * integration path by swapping the dialect object only — nothing else in
  * [[JdbcSnapshot]] or the pipeline knows which dialect it is talking to.
  */
trait SnapshotDialect {

  /** A13 (ref `:99-111`): idempotent "user can read the loaded snapshot"
    * DDL — safe to re-run after every load (the reference re-grants after
    * every RESTORE because its DROP destroys principals). */
  def grantReaderDdl(user: String, obj: String): String

  /** A11 (ref `:94-97`): destructive pre-load — clears the target before a
    * snapshot load. The reference drops the whole database; catalogs
    * where the Spark write path truncate-overwrites instead (the
    * [[JdbcSnapshot.snapshotOverwrite]] contract) drop only the staging
    * object. */
  def dropTargetDdl(target: String): String

  /** A12 (ref `:90-93`): native snapshot restore from a backup artifact.
    * None when the dialect has no RESTORE verb — there the Spark write
    * path IS the load and this stanza is a no-op by design. */
  def restoreDdl(db: String, bakPath: String): Option[String]

  /** True when `e` means the grant's target object already exists — the
    * BENIGN outcome of re-running [[grantReaderDdl]] on a dialect with
    * no IF NOT EXISTS verb. [[JdbcSnapshot.grantReader]] swallows
    * exactly these, which is what makes the A13 contract ("idempotent,
    * safe to re-run after every load") hold on every dialect, not just
    * the ones that can guard in SQL. Default: nothing is benign (T-SQL
    * guards in the statement itself, so an exception there is real). */
  def isBenignAlreadyExists(e: java.sql.SQLException): Boolean = false
}

/** SQL Server spellings — the reference's own dialect, kept verbatim so a
  * real endpoint runs the reference's semantics unchanged. UNTESTED here
  * (no SQL Server in the sandbox); exercised only as strings. */
object TSqlSnapshotDialect extends SnapshotDialect {
  def grantReaderDdl(user: String, obj: String): String =
    s"""IF NOT EXISTS (SELECT name FROM sys.database_principals WHERE name = '$user')
       BEGIN
         CREATE USER [$user] FOR LOGIN [$user];
         ALTER ROLE db_datareader ADD MEMBER [$user];
       END"""
  def dropTargetDdl(target: String): String =
    s"""IF EXISTS (SELECT name FROM sys.databases WHERE name = '$target')
       DROP DATABASE [$target]"""
  def restoreDdl(db: String, bakPath: String): Option[String] =
    Some(s"RESTORE DATABASE [$db] FROM DISK = N'$bakPath' WITH REPLACE")
}

/** Derby spellings — the TESTED instance (embedded `jdbc:derby:memory` in
  * JdbcSnapshotSpec). Derby has no IF NOT EXISTS / RESTORE verbs: the
  * grant contract is a reader view, made idempotent by
  * [[isBenignAlreadyExists]] (SQLState X0Y32, "object already exists" —
  * the exception a re-run raises, classified benign so
  * [[JdbcSnapshot.grantReader]] swallows it); the drop contract clears
  * the staging table, and restore is None — the Spark
  * truncate-overwrite write is the load. */
object DerbySnapshotDialect extends SnapshotDialect {
  def grantReaderDdl(user: String, obj: String): String =
    s"CREATE VIEW ${user}_reader AS SELECT * FROM $obj"
  def dropTargetDdl(target: String): String =
    s"DROP TABLE $target"
  def restoreDdl(db: String, bakPath: String): Option[String] = None
  override def isBenignAlreadyExists(e: java.sql.SQLException): Boolean =
    e.getSQLState == "X0Y32"
}
