package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Scalar function layer (SURVEY §2.8 F1-F12): the reference's string/path/
 * codec helpers as pure Spark column expressions — every one stays inside
 * whole-stage codegen (no UDFs).
 */
package object functions {

  /** F1 — TSV row codec with NULL sentinel
    * (`ReplicationUtils.genValue:471-473`). */
  def tsvEncode(cols: Column*): Column =
    concat_ws("\t", cols.map(c => coalesce(c.cast("string"), lit("NULL"))): _*)

  def tsvField(row: Column, idx: Int): Column = {
    val v = element_at(split(row, "\t"), idx + 1)
    when(v === "NULL", lit(null)).otherwise(v)
  }

  /** F3 — partition name ⇄ map ⇄ values (`HiveUtils.java:41-58`). */
  def partNameToMap(partName: Column): Column =
    str_to_map(partName, lit("/"), lit("="))

  def partNameValue(partName: Column, key: String): Column =
    regexp_extract(partName, s"(?:^|/)${java.util.regex.Pattern.quote(key)}=([^/]*)", 1)

  def partNameRender(kvs: Column): Column =
    array_join(transform(map_entries(kvs),
      e => concat(e.getField("key"), lit("="), e.getField("value"))), "/")

  /** F4 — exchange-partition SQL parse
    * (`incremental/ExchangePartitionParser.java:21-149`). */
  def exchangePartitionSource(command: Column): Column =
    regexp_extract(command,
      "(?i)alter\\s+table\\s+(\\S+)\\s+exchange\\s+partition", 1)

  def exchangePartitionSpec(command: Column): Column =
    regexp_extract(command, "(?i)partition\\s*\\(([^)]*)\\)", 1)

  def exchangePartitionDest(command: Column): Column =
    regexp_extract(command, "(?i)with\\s+table\\s+(\\S+)", 1)

  /** F2 — relative path under a root; subdir test. */
  def relPath(path: Column, root: String): Column =
    regexp_replace(path, "^" + java.util.regex.Pattern.quote(
      if (root.endsWith("/")) root else root + "/"), "")

  def isSubdir(path: Column, root: String): Column =
    path.startsWith(if (root.endsWith("/")) root else root + "/")

  /** F7 — lowercase normalization of object names
    * (`ReplicationUtils.java:481-499`). */
  def lowerName(c: Column): Column = lower(c)

  /** F8 — balancing hash key (reference murmur3-of-(size,mtime),
    * `Stage2DirectoryCopyMapper.java:116-125`). Spark's `hash()` is
    * Murmur3 — the direct analog. */
  def balanceKey(cols: Column*): Column = hash(cols: _*)

  /** Portable (oracle-mirrorable) bucket key: md5-hex prefix as int.
    * `conv(hex, 16, 10)` reads the first two digits in one pass, so the
    * md5 evaluates once per row (the digit-by-digit form computed it
    * twice — measurably slower at scan speed). */
  def md5Bucket(c: Column, buckets: Int): Column =
    conv(substring(md5(c), 1, 2), 16, 10).cast("int") % buckets

  /** F9 — last-modified resolution: max(TLDT, TLMT) from a parameters map
    * (`ReplicationUtils.java:502-572`). */
  def lastModified(params: Column): Column =
    greatest(
      coalesce(element_at(params, graft.model.TableMeta.Tldt).cast("long"), lit(0L)),
      coalesce(element_at(params, graft.model.TableMeta.Tlmt).cast("long"), lit(0L)))

  /** F10 — job-start timestamp formatting (UTC session TZ), reference
    * `MetastoreReplicationJob.java:281-283`, `ReplicationServer.java:392-394`. */
  def utcStamp(ts: Column): Column = date_format(ts, "yyyy-MM-dd HH:mm:ss")

  /** F11 — exponential backoff (`ReplicationUtils.java:446-463`). */
  def backoffMs(attempt: Column, baseMs: Long = 2000L,
      capMs: Long = 3600000L): Column =
    least(lit(capMs),
      (lit(baseMs) * pow(lit(2.0), attempt.cast("double")).cast("long")))

  /** F12 — path builder (`utils/common/PathBuilder.java`). */
  def pathJoin(components: Column*): Column = concat_ws("/", components: _*)

  /** F5 — JSON list/map codec (`ReplicationUtils.java:204-258`). */
  def jsonEncodeList(c: Column): Column = to_json(c)
  def jsonDecodeList(c: Column): Column =
    from_json(c, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType))
}
