package graft.pipeline

/** Write-side catalog maintenance — the ops-plane scripts of the
  * reference, driver-side:
  *
  *  - processor sync (reference scripts/pipelines/pull_processors.js:14-52):
  *    upsert every registered processor's (name, is_filter) into the
  *    catalog, update rows whose is_filter flag drifted, delete catalog
  *    rows with no matching processor. The reference scans
  *    src/transformations + src/filters; here the source of truth is the
  *    in-process [[Processors]] registry.
  *  - topic/schema discovery (reference
  *    scripts/pipelines/getTopicsAndSchemas.js:31-79): insert-if-absent
  *    of broker topic names and registry subjects.
  *
  * The diff is computed as pure data (testable without a database) and
  * applied through a [[CatalogSync.Store]]; `JdbcStore` targets the
  * reference's Postgres tables (code-only in this container — no JDBC
  * driver jar — mirroring `Catalog.fromJdbc`).
  */
object CatalogSync {

  final case class ProcessorRow(name: String, isFilter: Boolean)

  /** What a sync run will change: rows to insert-or-update and obsolete
    * names to delete.
    */
  final case class Plan(upserts: Seq[ProcessorRow], deletes: Seq[String])

  /** The registered processors as catalog rows (ordered for determinism). */
  def registryRows: Seq[ProcessorRow] =
    Processors.all.values.map(p => ProcessorRow(p.name, p.isFilter))
      .toSeq.sortBy(_.name)

  /** Diff the registry against current catalog state: upsert missing or
    * drifted rows (the reference's ON CONFLICT ... WHERE is_filter != $2),
    * delete rows absent from the registry.
    */
  def diffProcessors(current: Map[String, Boolean]): Plan = {
    val rows = registryRows
    Plan(
      upserts = rows.filter(r => !current.get(r.name).contains(r.isFilter)),
      deletes = (current.keySet -- rows.map(_.name).toSet).toSeq.sorted)
  }

  /** Catalog mutation surface (reference tables processors/topics/schemas). */
  trait Store {
    def processors(): Map[String, Boolean]
    def upsertProcessor(row: ProcessorRow): Unit
    def deleteProcessor(name: String): Unit
    def topics(): Set[String]
    def insertTopic(name: String): Unit
    def schemas(): Set[String]
    def insertSchema(name: String): Unit
  }

  /** Apply the processor diff; returns the plan that was applied. */
  def syncProcessors(store: Store): Plan = {
    val plan = diffProcessors(store.processors())
    plan.upserts.foreach(store.upsertProcessor)
    plan.deletes.foreach(store.deleteProcessor)
    plan
  }

  /** Insert-if-absent topic names and registry subjects; returns what was
    * newly inserted. Topic names come from a broker admin listing at
    * deploy time; subjects from [[graft.codec.SchemaRegistry.subjects]].
    */
  def syncTopicsAndSchemas(store: Store, topics: Seq[String],
      subjects: Seq[String]): (Seq[String], Seq[String]) = {
    val newTopics = topics.distinct.filterNot(store.topics())
    newTopics.foreach(store.insertTopic)
    val newSchemas = subjects.distinct.filterNot(store.schemas())
    newSchemas.foreach(store.insertSchema)
    (newTopics, newSchemas)
  }

  /** In-memory store — tests and local catalog exports. */
  final class InMemoryStore(
      initialProcessors: Map[String, Boolean] = Map.empty,
      initialTopics: Set[String] = Set.empty,
      initialSchemas: Set[String] = Set.empty) extends Store {
    private var procs = initialProcessors
    private var tops = initialTopics
    private var schms = initialSchemas
    def processors(): Map[String, Boolean] = procs
    def upsertProcessor(row: ProcessorRow): Unit =
      procs += (row.name -> row.isFilter)
    def deleteProcessor(name: String): Unit = procs -= name
    def topics(): Set[String] = tops
    def insertTopic(name: String): Unit = tops += name
    def schemas(): Set[String] = schms
    def insertSchema(name: String): Unit = schms += name
  }

  /** JDBC store against the reference's Postgres schema (FIXTURES.md §2).
    * Driver-side, one statement per mutation like the reference scripts.
    * SQL is kept portable (UPDATE-then-INSERT upsert, duplicate-key
    * swallowed) instead of Postgres `ON CONFLICT`, so the store runs —
    * and is integration-tested — against embedded Derby in-container;
    * semantics are identical under the unique constraints.
    */
  final class JdbcStore(url: String,
      props: java.util.Properties = new java.util.Properties()) extends Store {
    private def withConn[A](f: java.sql.Connection => A): A = {
      val c = java.sql.DriverManager.getConnection(url, props)
      try f(c) finally c.close()
    }

    /** True for unique/integrity violations across drivers: Derby raises
      * the SQLIntegrityConstraintViolationException subclass, but pgjdbc
      * raises a plain PSQLException — the portable signal is SQLState
      * class 23 (integrity constraint violation).
      */
    private def isConstraintViolation(e: java.sql.SQLException): Boolean =
      e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
        Option(e.getSQLState).exists(_.startsWith("23"))

    /** INSERT that treats a unique-key violation as "already there". */
    private def insertIgnoringDup(c: java.sql.Connection, sql: String,
        value: String): Unit = {
      val st = c.prepareStatement(sql)
      st.setString(1, value)
      try st.executeUpdate()
      catch { case e: java.sql.SQLException if isConstraintViolation(e) => () }
    }
    def processors(): Map[String, Boolean] = withConn { c =>
      val rs = c.createStatement()
        .executeQuery("SELECT processor_name, is_filter FROM processors")
      val b = Map.newBuilder[String, Boolean]
      while (rs.next()) b += (rs.getString(1) -> rs.getBoolean(2))
      b.result()
    }
    def upsertProcessor(row: ProcessorRow): Unit = withConn { c =>
      val up = c.prepareStatement(
        "UPDATE processors SET is_filter = ? WHERE processor_name = ?")
      up.setBoolean(1, row.isFilter); up.setString(2, row.name)
      if (up.executeUpdate() == 0) {
        val ins = c.prepareStatement(
          "INSERT INTO processors (processor_name, is_filter) VALUES (?, ?)")
        ins.setString(1, row.name); ins.setBoolean(2, row.isFilter)
        try ins.executeUpdate()
        catch { case e: java.sql.SQLException if isConstraintViolation(e) =>
          upsertProcessor(row) // lost a concurrent insert race: update instead
        }
      }
    }
    def deleteProcessor(name: String): Unit = withConn { c =>
      val st = c.prepareStatement("DELETE FROM processors WHERE processor_name = ?")
      st.setString(1, name); st.executeUpdate()
    }
    def topics(): Set[String] = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT topic_name FROM topics")
      val b = Set.newBuilder[String]
      while (rs.next()) b += rs.getString(1)
      b.result()
    }
    def insertTopic(name: String): Unit = withConn { c =>
      insertIgnoringDup(c, "INSERT INTO topics (topic_name) VALUES (?)", name)
    }
    def schemas(): Set[String] = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT schema_name FROM schemas")
      val b = Set.newBuilder[String]
      while (rs.next()) b += rs.getString(1)
      b.result()
    }
    def insertSchema(name: String): Unit = withConn { c =>
      insertIgnoringDup(c, "INSERT INTO schemas (schema_name) VALUES (?)", name)
    }
  }
}
