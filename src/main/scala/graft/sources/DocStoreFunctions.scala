package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The docstore catalog's V2 function registry — the `FunctionCatalog`
  * face that makes engine primitives SQL-addressable
  * (`SELECT <cat>.system.bucket(8, doc_id)`) and, more importantly,
  * resolvable by Catalyst's storage-partitioned-join machinery: a scan
  * reporting `KeyGroupedPartitioning` over a `bucket(n, doc_id)`
  * transform is only usable for shuffle-free co-partitioned joins if
  * the table's catalog can resolve the `bucket` function to a
  * `BoundFunction` whose `canonicalName` matches on both join sides
  * (`V2ExpressionUtils.loadV2FunctionOpt` looks it up by transform
  * name with an empty namespace).
  *
  * Both functions ship a ScalarFunction MAGIC method (`invoke` with
  * exact JVM types) so calls stay inside whole-stage codegen — Spark
  * compiles them to a direct method call instead of the interpreted
  * `produceResult` row path.
  *
  *  - `bucket(n, id)` — THE partitioning hash, shared byte-for-byte
  *    with the write path and the partition pruner
  *    ([[DocStorePartitioning.bucketOf]]: `floorMod(Long.hashCode(id),
  *    n)`). One definition on purpose: a SQL probe
  *    `WHERE bucket(16, doc_id) = b` computes exactly the directory a
  *    row landed in.
  *  - `normalize_key(s)` — the engine's join-key canonicalizer
  *    ([[graft.expr.NormalizeKey]], reference semantics
  *    src/etl_pipeline.py:32-46) for SQL users outside the Scala DSL.
  */
object DocStoreFunctions {
  /** Namespaces that resolve functions: the root (SPJ resolution uses
    * an empty namespace) and the conventional `system` namespace SQL
    * users address. */
  def knownNamespace(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("system"))

  val names: Seq[String] = Seq("bucket", "normalize_key")

  def load(name: String): Option[UnboundFunction] =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "bucket" => Some(BucketUnbound)
      case "normalize_key" => Some(NormalizeKeyUnbound)
      case _ => None
    }

  /** bucket(n INT, id BIGINT) → INT. Binding is argument-order
    * tolerant — SQL calls bind (INT, BIGINT) while a transform's
    * `arguments()` may present the column before the bucket-count
    * literal — but both orders bind to bound functions sharing ONE
    * canonical name, so SPJ compatibility checks match. */
  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, doc_id): floorMod(Long.hashCode(id), n) — the docstore " +
        "partition bucket of a doc_id (DocStorePartitioning.bucketOf)"
    override def bind(inputType: StructType): BoundFunction = {
      val ts = inputType.fields.map(_.dataType)
      ts match {
        case Array(IntegerType, LongType) => BucketNId
        case Array(LongType, IntegerType) => BucketIdN
        case _ => throw new UnsupportedOperationException(
          s"bucket expects (INT n, BIGINT id); got " +
            s"(${ts.map(_.simpleString).mkString(", ")})")
      }
    }
  }

  private val BUCKET_CANONICAL = "graft.docstore.bucket"

  /** (n, id) argument order — the SQL-call and Expressions.bucket shape. */
  object BucketNId extends ScalarFunction[Integer] {
    override def name(): String = "bucket"
    override def canonicalName(): String = BUCKET_CANONICAL
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    def invoke(n: Int, id: Long): Int = DocStorePartitioning.bucketOf(id, n)
    override def produceResult(input: InternalRow): Integer =
      invoke(input.getInt(0), input.getLong(1))
  }

  /** (id, n) argument order — transform argument layouts that lead
    * with the column. Same canonical name: SPJ treats both as the one
    * bucket function. */
  object BucketIdN extends ScalarFunction[Integer] {
    override def name(): String = "bucket"
    override def canonicalName(): String = BUCKET_CANONICAL
    override def inputTypes(): Array[DataType] = Array(LongType, IntegerType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    def invoke(id: Long, n: Int): Int = DocStorePartitioning.bucketOf(id, n)
    override def produceResult(input: InternalRow): Integer =
      invoke(input.getLong(0), input.getInt(1))
  }

  object NormalizeKeyUnbound extends UnboundFunction {
    override def name(): String = "normalize_key"
    override def description(): String =
      "normalize_key(s): upper-case, NFD accent-strip, keep [A-Z0-9 ], " +
        "collapse spaces, trim — the engine's join-key canonicalizer"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == StringType,
        s"normalize_key expects one STRING argument; got $inputType")
      NormalizeKeyBound
    }
  }

  object NormalizeKeyBound extends ScalarFunction[UTF8String] {
    override def name(): String = "normalize_key"
    override def canonicalName(): String = "graft.docstore.normalize_key"
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = StringType
    def invoke(s: UTF8String): UTF8String =
      if (s == null) null
      else UTF8String.fromString(graft.expr.NormalizeKey.normalize(s.toString))
    override def produceResult(input: InternalRow): UTF8String =
      invoke(input.getUTF8String(0))
  }
}
