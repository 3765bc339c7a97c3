package org.apache.spark.sql.graftbridge

/** Single-seam namespace bridge (the ColumnBridge/DmlBridge posture):
  * `V2TableWithV1Fallback` — the hook Spark's relation resolution uses
  * to stream a v2 catalog table through a v1 `StreamSourceProvider`
  * (`readStream.table` / `writeStream.toTable`, the Delta streaming
  * posture) — is `private[sql]`, so the public re-export lives in this
  * `org.apache.spark.sql` subpackage. No behavior, one empty subtrait.
  */
trait V1FallbackBridge
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
