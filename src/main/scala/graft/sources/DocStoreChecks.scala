package graft.sources

import org.apache.spark.sql.catalyst.expressions.{AttributeSeq, BindReferences, EqualNullSafe, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.types.{StructField, StructType}

/** Table CHECK constraints (Delta's `ALTER TABLE ... ADD CONSTRAINT`
  * surface, expressed as TBLPROPERTIES): every property
  * `graft.check.<name> = '<sql predicate>'` is enforced on EVERY row
  * any write path produces — INSERT, streaming epochs, MERGE, and
  * copy-on-write UPDATE rewrites all flow through the two writer
  * factories, which compile the constraints once on the driver and
  * evaluate them per row in the tasks (codegen'd predicates, no UDF).
  * SQL CHECK semantics: a row violates only when the predicate is
  * FALSE — NULL passes, exactly as the standard (and Delta) define it.
  * A violation fails the write job loudly, naming the constraint; the
  * staged segments are aborted, so the table is untouched. */
object DocStoreChecks {
  val PREFIX = "graft.check."

  /** Spark's metadata key for `GENERATED ALWAYS AS (expr)` columns —
    * the catalog declares SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS
    * and the expression rides field metadata into the SCHEMA file.
    * Docstore semantics are WRITE-VALIDATED (Delta's validation half):
    * every write path must supply values satisfying
    * `value <=> (expr)` per row — enforced through the same compiled-
    * predicate machinery as CHECK constraints — so the invariant a
    * reader relies on ("n_chars IS the length of text") can never be
    * broken by any writer. (Compute-when-omitted is an analyzer
    * feature Spark only gives its v1 paths; a v2 INSERT must provide
    * the column.) */
  val GEN_KEY: String =
    org.apache.spark.sql.catalyst.util.GeneratedColumn
      .GENERATION_EXPRESSION_METADATA_KEY

  /** DDL-time validation of generated columns: the expression must
    * analyze against the table schema as a null-safe equality with
    * its column, and may not reference another generated column
    * (enforcement order would become circular). */
  def validateGenerated(schema: StructType): Unit = {
    val genCols = schema.fields.filter(_.metadata.contains(GEN_KEY))
    genCols.foreach { f =>
      val expr = f.metadata.getString(GEN_KEY)
      val cond = s"`${f.name}` <=> ($expr)"
      try analyzedCondition(schema, cond)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"generated column ${f.name} does not analyze against " +
            s"${schema.simpleString}: $expr (${e.getMessage})", e)
      }
      val others = genCols.map(_.name).toSet - f.name
      val refs = org.apache.spark.sql.SparkSession.active.sessionState
        .sqlParser.parseExpression(expr).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.name
        }
      require(!refs.exists(others.contains),
        s"generated column ${f.name} references another generated " +
          s"column — not supported")
    }
  }

  /** Analysis-validate every check property against the table schema —
    * called at CREATE TABLE and ALTER ... SET TBLPROPERTIES time so a
    * typo'd column or unparseable predicate refuses at DDL, not at the
    * first write. */
  def validate(schema: StructType, props: Map[String, String]): Unit = {
    props.filter(_._1.startsWith(PREFIX)).foreach { case (k, sql) =>
      try analyzedCondition(schema, sql)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"check constraint ${k.stripPrefix(PREFIX)} does not analyze " +
            s"against ${schema.simpleString}: $sql (${e.getMessage})", e)
      }
    }
    // graft.bloom.columns refuses typo'd / ineligible columns HERE
    // (CREATE TABLE + SET TBLPROPERTIES), not at the first write
    props.get(DocStore.BLOOM_KEY).foreach(spec =>
      DocStore.validateBloomSpec(schema, spec))
  }

  /** Existing rows must already satisfy a newly-SET constraint —
    * Delta scans and refuses at ADD CONSTRAINT time. Enforcing only
    * future writes would brick every later rewrite (OPTIMIZE,
    * copy-on-write DELETE/UPDATE/MERGE re-evaluate checks on re-read
    * rows) the moment a legacy row violates. One distributed scan per
    * new constraint, stopped at the first violation. */
  def verifyExisting(path: String, newProps: Map[String, String]): Unit = {
    val checks = newProps.filter(_._1.startsWith(PREFIX))
    if (checks.isEmpty) return
    val df = org.apache.spark.sql.SparkSession.active.read
      .format("graft-docstore").option("path", path).load()
    checks.foreach { case (k, sql) =>
      val name = k.stripPrefix(PREFIX)
      val bad = df.where(org.apache.spark.sql.functions.expr(sql)
        .eqNullSafe(org.apache.spark.sql.functions.lit(false)))
        .limit(1).count()
      require(bad == 0,
        s"cannot add CHECK constraint '$name': existing rows violate " +
          s"'$sql' — fix or delete them first (Delta refuses here too)")
    }
  }

  /** Compile the table's row contracts into (description, bound
    * violation predicate) pairs against the INPUT row layout
    * (`order(i)` = input position of table field i): every
    * `graft.check.*` property, plus a null-rejection predicate per
    * NOT NULL-flagged column (DocStore.NOTNULL_KEY — same enforcement
    * path, Delta's column contract). Driver-side only (needs the
    * active session's analyzer); the bound expressions are
    * serializable and ship to tasks inside the writer factory. */
  def compile(path: String, schema: StructType,
      order: Array[Int]): Seq[(String, Expression)] = {
    val notNulls = schema.fields.zipWithIndex.collect {
      case (f, i) if f.metadata.contains(DocStore.NOTNULL_KEY) &&
          f.metadata.getBoolean(DocStore.NOTNULL_KEY) =>
        s"NOT NULL constraint on column '${f.name}'" ->
          (org.apache.spark.sql.catalyst.expressions.IsNull(
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              order(i), f.dataType, nullable = true)): Expression)
    }.toSeq
    val props = DocStoreCatalog.readProps(path)
      .filter(_._1.startsWith(PREFIX))
    val genFields = schema.fields.filter(_.metadata.contains(GEN_KEY))
    if (props.isEmpty && genFields.isEmpty) return notNulls
    val inputFields = new Array[StructField](schema.length)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      inputFields(order(i)) = f }
    val inputSchema = StructType(inputFields.toSeq)
    val gens = genFields.toSeq.map { f =>
      val expr = f.metadata.getString(GEN_KEY)
      val (cond, out) = analyzedCondition(inputSchema,
        s"`${f.name}` <=> ($expr)")
      // <=> never evaluates null, so "violated iff exactly FALSE"
      // rejects every mismatch, null-vs-value rows included
      s"GENERATED ALWAYS AS constraint on column '${f.name}' " +
        s"(expression: $expr)" ->
        (BindReferences.bindReference(EqualNullSafe(cond, Literal(false)),
          AttributeSeq(out)): Expression)
    }
    notNulls ++ gens ++ props.toSeq.sortBy(_._1).map { case (k, sql) =>
      val (cond, out) = analyzedCondition(inputSchema, sql)
      // violated iff the analyzed condition is exactly FALSE
      val violation = EqualNullSafe(cond, Literal(false))
      val name = k.stripPrefix(PREFIX)
      s"CHECK constraint '$name' (property $PREFIX$name)" ->
        BindReferences.bindReference(violation, AttributeSeq(out))
    }
  }

  /** Parse + analyze `sql` as a filter over an empty relation of
    * `schema`, returning the resolved, type-coerced condition and the
    * relation's output attributes (the binding order). */
  private def analyzedCondition(schema: StructType, sql: String)
      : (Expression, Seq[org.apache.spark.sql.catalyst.expressions.Attribute]) = {
    val s = org.apache.spark.sql.SparkSession.active
    val df = s.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      .where(org.apache.spark.sql.functions.expr(sql))
    df.queryExecution.analyzed.collectFirst {
      case f: Filter => (f.condition, f.child.output)
    }.getOrElse(throw new IllegalArgumentException(
      s"constraint did not analyze to a filter condition: $sql"))
  }
}
