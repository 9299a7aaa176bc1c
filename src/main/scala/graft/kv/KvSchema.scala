package graft.kv

import org.apache.spark.sql.types._

/** Logical field of a KV table: a named column stored under an HBase-style
  * (columnFamily, qualifier) address.
  *
  * Mirrors the reference's fieldMap entries (`HBaseScheme.java:55`,
  * populated at `MultiFamilyHBaseTest.java:58-62`: e.g. `"lower" ->
  * {left, lower}`).
  */
final case class KvField(name: String, family: String, qualifier: String) {
  require(name.nonEmpty, "field name must be non-empty")
  require(family.nonEmpty, s"field $name: family must be non-empty")

  /** Column metadata carrying the (family, qualifier) address so DDL
    * derivation survives through DataFrame transformations. */
  def metadata: Metadata = new MetadataBuilder()
    .putString(KvSchema.FamilyKey, family)
    .putString(KvSchema.QualifierKey, qualifier)
    .build()
}

/** Declared schema of a KV table: exactly ONE key field plus N value
  * fields addressed by (family, qualifier).
  *
  * The single-key invariant is the reference's
  * `HBaseScheme.validate()` (`HBaseScheme.java:151-155`, throws unless
  * `keyField.size() == 1`) — here enforced structurally: `keyField` is a
  * single String, and construction rejects duplicate/overlapping names.
  *
  * The full tuple schema is key ++ values, in declaration order
  * (`HBaseScheme.java:157-162`).
  */
final case class KvSchema(keyField: String, valueFields: Seq[KvField]) {
  require(keyField.nonEmpty, "key field must be non-empty")
  require(valueFields.nonEmpty, "at least one value field required")
  require(!valueFields.exists(_.name == keyField),
    s"key field '$keyField' must not also be a value field")
  require(valueFields.map(_.name).distinct.size == valueFields.size,
    "duplicate value field names")
  require(!fieldNames.exists(KvSchema.ReservedNames),
    s"field names ${fieldNames.filter(KvSchema.ReservedNames).mkString(", ")} " +
      "collide with engine columns (__version/__seq/__tombstone/__bucket)")

  /** key ++ value field names, the logical tuple schema. */
  def fieldNames: Seq[String] = keyField +: valueFields.map(_.name)

  /** Distinct column families, in first-appearance order — the DDL
    * derivation of the reference's `getFamilies()`
    * (`HBaseScheme.java:170-177`). */
  def families: Seq[String] = valueFields.map(_.family).distinct

  def field(name: String): KvField =
    valueFields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no such value field: $name"))

  /** Serialize to a single JSON line for persistence alongside the data
    * (`_kvschema.json`), so reads don't need the schema re-declared. */
  def toJson: String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    } + "\""
    val vs = valueFields.map(f =>
      s"{${q("name")}:${q(f.name)},${q("family")}:${q(f.family)},${q("qualifier")}:${q(f.qualifier)}}")
    s"{${q("keyField")}:${q(keyField)},${q("valueFields")}:[${vs.mkString(",")}]}"
  }
}

object KvSchema {
  val FamilyKey = "kv.family"
  val QualifierKey = "kv.qualifier"

  /** Engine-internal column names a user field must not shadow: write()
    * would silently overwrite the user column and the LWW collapse would
    * then fail or return wrong data. Sourced from the KvTable constants
    * so a renamed/added engine column stays guarded automatically. */
  val ReservedNames: Set[String] =
    Set(KvTable.VersionCol, KvTable.SeqCol, KvTable.TombstoneCol,
      KvTable.BucketCol)

  /** Convenience: fields declared as name -> (family, qualifier). */
  def of(keyField: String, fields: (String, (String, String))*): KvSchema =
    KvSchema(keyField, fields.map { case (n, (f, q)) => KvField(n, f, q) })

  /** Parse the `toJson` format (minimal, trusted input). */
  def fromJson(json: String): KvSchema = {
    def extract(src: String, key: String): String = {
      val m = ("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      m.findFirstMatchIn(src).map(_.group(1)
        .replace("\\\"", "\"").replace("\\\\", "\\"))
        .getOrElse(throw new IllegalArgumentException(s"missing $key in $src"))
    }
    val key = extract(json, "keyField")
    val arr = json.substring(json.indexOf('['), json.lastIndexOf(']') + 1)
    val objs = "\\{[^}]*\\}".r.findAllIn(arr).toSeq
    val fields = objs.map { o =>
      KvField(extract(o, "name"), extract(o, "family"), extract(o, "qualifier"))
    }
    KvSchema(key, fields)
  }
}
