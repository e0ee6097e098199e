package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.MediaCodecs

/** Container-walk gates: the ID3v2 synchsafe header parse and the
  * ISO-BMFF box walk emitted AS DATA (offsets/sizes/types) and
  * hash-compared against a SQL respecification. Both engines derive
  * the container bytes from doc_id (the Spark side builds real bytes
  * via hex → unhex and runs the byte-level walk the FFI-seam codecs
  * consume; the oracle recomputes the expected facts from the same
  * generative parameters), so the REAL parsing in MediaCodecs is
  * hash-proven even while lossy payload synthesis stays stubbed
  * behind the seam. Adversarial shapes are data-driven: bad synchsafe
  * high bits, torn tags, torn tail boxes, sub-minimum box sizes.
  */
object MediaQueries extends QueryPack {

  override def defs: Map[String, Q] = Map(

    // ID3v2 synchsafe walk: header facts per payload. doc_id % 11
    // plants a synchsafe high bit (parse must reject), doc_id % 13
    // tears the tag (body_len goes NEGATIVE and frames null) — both
    // engines agree on every fact or the hash breaks.
    "q324_id3_walk" -> Q(
      (s, dir) => {
        val media = Tables.documents(s, dir)
          .select(col("doc_id"))
          .withColumn("tag_len", expr("doc_id % 300"))
          .withColumn("bad", expr("doc_id % 11 = 0"))
          .withColumn("torn", expr("doc_id % 13 = 0"))
          .withColumn("fill", expr(
            "CASE WHEN torn THEN tag_len div 2 " +
              "ELSE tag_len + (doc_id % 7) * 417 + doc_id % 100 END"))
          .withColumn("b0", expr(
            "CASE WHEN bad THEN tag_len % 128 + 128 ELSE tag_len % 128 END"))
          .withColumn("hex", expr(
            "concat('494433030000', " +
              "format_string('%02x%02x%02x%02x', " +
              "int((tag_len div 2097152) % 128), int((tag_len div 16384) % 128), " +
              "int((tag_len div 128) % 128), int(b0)), " +
              "repeat('00', int(fill)))"))
          .select(col("doc_id").as("media_id"), unhex(col("hex")).as("bytes"))
        MediaCodecs.id3Walk(media).orderBy(col("media_id"))
      },
      Some("""WITH p AS (
        |  SELECT doc_id, doc_id % 300 AS tag_len,
        |    doc_id % 11 = 0 AS bad,
        |    CASE WHEN doc_id % 13 = 0 THEN (doc_id % 300) // 2
        |         ELSE doc_id % 300 + (doc_id % 7) * 417 + doc_id % 100
        |    END AS fill
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  NOT bad AS synch_ok,
        |  CASE WHEN bad THEN NULL ELSE tag_len END AS tag_len,
        |  CASE WHEN bad THEN NULL ELSE fill - tag_len END AS body_len,
        |  CASE WHEN bad OR fill - tag_len < 0 THEN NULL
        |       ELSE (fill - tag_len) // 417 END AS n_frames
        |FROM p ORDER BY media_id""".stripMargin)),

    // ISO-BMFF box walk: one row per WELL-FORMED box with exact
    // (offset, size, type). doc_id % 11 appends a size-4 box and
    // doc_id % 5 a size-100 header with 8 bytes present — the walk
    // must truncate at both without emitting the torn box.
    "q325_bmff_walk" -> Q(
      (s, dir) => {
        val media = Tables.documents(s, dir)
          .select(col("doc_id"))
          .withColumn("k", expr("1 + doc_id % 3"))
          .withColumn("pay", expr("8 + doc_id % 5"))
          .withColumn("hasfree", expr("doc_id % 7 = 0"))
          .withColumn("tail", expr(
            "CASE WHEN doc_id % 11 = 0 THEN '0000000466726565' " +
              "WHEN doc_id % 5 = 0 THEN '000000646d646174' ELSE '' END"))
          .withColumn("hex", expr(
            "concat('0000001066747970', repeat('00', 8), " +
              "CASE WHEN hasfree THEN concat('0000000c66726565', repeat('00', 4)) ELSE '' END, " +
              "repeat(concat(format_string('%08x', int(8 + pay)), '6d646174', " +
              "repeat('00', int(pay))), int(k)), tail)"))
          .select(col("doc_id").as("media_id"), unhex(col("hex")).as("bytes"))
        MediaCodecs.bmffWalk(media)
          .orderBy(col("media_id"), col("box_idx"))
      },
      Some("""WITH p AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS k, 8 + doc_id % 5 AS pay,
        |    doc_id % 7 = 0 AS hasfree
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, 0 AS box_idx, 0 AS box_off, 16 AS box_size,
        |    'ftyp' AS box_type FROM p
        |  UNION ALL
        |  SELECT doc_id, 1, 16, 12, 'free' FROM p WHERE hasfree
        |  UNION ALL
        |  SELECT doc_id,
        |    CASE WHEN hasfree THEN 2 ELSE 1 END + i,
        |    16 + CASE WHEN hasfree THEN 12 ELSE 0 END + i * (8 + pay),
        |    8 + pay, 'mdat'
        |  FROM (SELECT doc_id, pay, hasfree, unnest(range(0, k)) AS i FROM p))
        |SELECT doc_id AS media_id, CAST(box_idx AS BIGINT) AS box_idx,
        |  CAST(box_off AS BIGINT) AS box_off,
        |  CAST(box_size AS BIGINT) AS box_size, box_type
        |FROM f ORDER BY media_id, box_idx""".stripMargin))
  )
}
