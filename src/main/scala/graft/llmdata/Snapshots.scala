package graft.llmdata

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Corpus snapshot versioning — the CDC pair every managed training
  * corpus needs: DERIVE a change feed by diffing two snapshots (q133)
  * and APPLY a change feed onto a base snapshot (q135, the lakehouse
  * MERGE/upsert primitive). Together they close the loop the batch
  * layout seams (`sources/AppendLog`, `Maintenance.atomicSwap`) leave
  * open: "what changed between corpus v7 and v8, and how do I produce
  * v8 from v7 plus a changelog" — the audit trail data-governance
  * reviews ask for, and the incremental alternative to re-shipping
  * 100 TB per release.
  *
  * Both operators are ONE full-outer id-keyed join: digests (md5) are
  * computed MAP-SIDE before the exchange, so the shuffle carries
  * (id, 16-byte digest), never document text; output cardinality is
  * the CHANGED set (diff) or the corpus (merge), with no stage ever
  * holding more than one row per id per side. At 100 TB both sides
  * being id-bucketed tables makes the join exchange-free
  * (`sources/Bucketed`); nothing here sorts globally except the final
  * presentation ORDER BY the driver's hash gate requires.
  *
  * The two snapshots / the changelog are DERIVED deterministically
  * from `documents` (modular-arithmetic row selection) so both engines
  * construct byte-identical inputs — test scaffolding for what would
  * be two real table versions in production; the operators themselves
  * never look at how their inputs were made.
  */
object Snapshots {

  /** Deterministic digest of a document's content — what the shuffle
    * carries instead of text. */
  private def dg(text: org.apache.spark.sql.Column) = md5(text)

  val qs: Seq[Q] = Seq(
    // ---- q133: snapshot diff — row-level change feed between two
    //      corpus versions. old = v7 (docs with id % 11 = 3 not yet
    //      crawled), new = v8 (docs with id % 13 = 5 since deleted,
    //      docs with id % 7 = 2 re-extracted with different text).
    //      Emits (doc_id, status ∈ added|removed|changed); unchanged
    //      rows are filtered BEFORE the sort, so the output is the
    //      changelog, not the corpus. The full-outer join keys on id;
    //      both inputs are digest projections, so at 100 TB the wide
    //      state is 24 bytes/row. q118's order-free checksum answers
    //      "are they equal"; this answers "show me every difference"
    //      at one more shuffle. ----
    Q(
      "q133_snapshot_diff",
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS odg FROM documents
        |  WHERE doc_id % 11 <> 3),
        |new AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 2 THEN md5(text || ' v2')
        |         ELSE md5(text) END AS ndg
        |  FROM documents WHERE doc_id % 13 <> 5)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       ELSE 'changed' END AS status
        |FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        |WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.odg <> n.ndg
        |ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 11 =!= 3)
        .select(col("doc_id"), dg(col("text")).as("odg"))
      val nw = docs.filter(col("doc_id") % 13 =!= 5)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 2,
            dg(concat(col("text"), lit(" v2"))))
            .otherwise(dg(col("text"))).as("ndg"))
      old.join(nw, Seq("doc_id"), "full_outer")
        .filter(col("odg").isNull || col("ndg").isNull ||
          col("odg") =!= col("ndg"))
        .select(col("doc_id"),
          when(col("odg").isNull, lit("added"))
            .when(col("ndg").isNull, lit("removed"))
            .otherwise(lit("changed")).as("status"))
        .orderBy("doc_id")
    },

    // ---- q135: MERGE / upsert — apply a changelog (op ∈ D|U|I) onto
    //      a base snapshot, producing the next version. Matched D
    //      drops the row, matched U replaces its text, unmatched I
    //      inserts; base rows without a change pass through. The apply
    //      itself is ONE full-outer join on id (each base id meets at
    //      most one change row — the changelog's PK contract) and a
    //      row-local CASE; output digests prove content, not just
    //      membership. The changelog here is derived from `documents`
    //      (three filtered projections unioned — in production it IS
    //      a table, e.g. q133's output joined back to the new text).
    //      Inverse pair with q133: applying the q133-style feed
    //      reproduces the new snapshot exactly. ----
    Q(
      "q135_merge_upsert",
      """WITH chg AS (
        |  SELECT doc_id, 'D' AS op, CAST(NULL AS VARCHAR) AS ctext
        |  FROM documents WHERE doc_id % 13 = 5
        |  UNION ALL
        |  SELECT doc_id, 'U' AS op, text || ' v2' AS ctext
        |  FROM documents WHERE doc_id % 7 = 2 AND doc_id % 13 <> 5
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, 'I' AS op, text AS ctext
        |  FROM documents WHERE doc_id % 17 = 3),
        |m AS (
        |  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
        |    CASE WHEN c.op = 'D' THEN CAST(NULL AS VARCHAR)
        |         WHEN c.op IS NULL THEN b.text
        |         ELSE c.ctext END AS ftext
        |  FROM documents b FULL OUTER JOIN chg c ON b.doc_id = c.doc_id)
        |SELECT doc_id, md5(ftext) AS dg FROM m
        |WHERE ftext IS NOT NULL ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val del = docs.filter(col("doc_id") % 13 === 5)
        .select(col("doc_id"), lit("D").as("op"),
          lit(null).cast("string").as("ctext"))
      val upd = docs
        .filter(col("doc_id") % 7 === 2 && col("doc_id") % 13 =!= 5)
        .select(col("doc_id"), lit("U").as("op"),
          concat(col("text"), lit(" v2")).as("ctext"))
      val ins = docs.filter(col("doc_id") % 17 === 3)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          lit("I").as("op"), col("text").as("ctext"))
      docs.select(col("doc_id"), col("text"))
        .join(del.unionAll(upd).unionAll(ins), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("op") === "D", lit(null).cast("string"))
            .when(col("op").isNull, col("text"))
            .otherwise(col("ctext")).as("ftext"))
        .filter(col("ftext").isNotNull)
        .select(col("doc_id"), dg(col("ftext")).as("dg"))
        .orderBy("doc_id")
    },

    // ---- q137: changelog compaction — fold a multi-epoch change
    //      history down to the LAST operation per key (Kafka
    //      log-compaction semantics; the step a real pipeline runs
    //      before q135's apply so the merge join sees one row per key
    //      no matter how many epochs accumulated). Rendered as ONE
    //      partial-aggregated max_by per column (latest-seq argmax) —
    //      never an id-keyed window SORT: at 100 TB the history is
    //      corpus-sized × epochs, and an argmax fold is O(1) state per
    //      key where row_number pays a per-key sort. Deletes carry a
    //      '' sentinel payload rather than NULL because BOTH engines'
    //      argmax skips null arguments — a silent
    //      latest-non-null-wins bug otherwise (decision log). Three
    //      epochs are derived from `documents` with disjoint seq
    //      ranges; a delete in epoch 1 can be resurrected in epoch 3,
    //      which the oracle checks value-for-value. ----
    Q(
      "q137_changelog_compaction",
      """WITH log AS (
        |  SELECT doc_id, 1000000 + doc_id AS seq, 'U' AS op,
        |    text || ' e1' AS ctext
        |  FROM documents WHERE doc_id % 5 = 1
        |  UNION ALL
        |  SELECT doc_id, 1000000 + doc_id AS seq, 'D' AS op, '' AS ctext
        |  FROM documents WHERE doc_id % 6 = 2 AND doc_id % 5 <> 1
        |  UNION ALL
        |  SELECT doc_id, 2000000 + doc_id AS seq, 'U' AS op,
        |    text || ' e2' AS ctext
        |  FROM documents WHERE doc_id % 7 = 3
        |  UNION ALL
        |  SELECT doc_id, 3000000 + doc_id AS seq, 'D' AS op, '' AS ctext
        |  FROM documents WHERE doc_id % 5 = 1 AND doc_id % 9 = 4
        |  UNION ALL
        |  SELECT doc_id, 3000000 + doc_id AS seq, 'U' AS op,
        |    text || ' e3' AS ctext
        |  FROM documents WHERE doc_id % 6 = 2 AND doc_id % 5 <> 1),
        |c AS (SELECT doc_id, arg_max(op, seq) AS op,
        |    arg_max(ctext, seq) AS lastc
        |  FROM log GROUP BY 1)
        |SELECT doc_id, op,
        |  CASE WHEN op = 'D' THEN CAST(NULL AS VARCHAR)
        |       ELSE md5(lastc) END AS dg
        |FROM c ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      def epoch(base: Long, pred: org.apache.spark.sql.Column,
          op: String, suffix: Option[String]) =
        docs.filter(pred).select(col("doc_id"),
          (lit(base) + col("doc_id")).as("seq"), lit(op).as("op"),
          suffix.map(x => concat(col("text"), lit(x)))
            .getOrElse(lit("")).as("ctext"))
      val log = epoch(1000000L, col("doc_id") % 5 === 1, "U", Some(" e1"))
        .unionAll(epoch(1000000L,
          col("doc_id") % 6 === 2 && col("doc_id") % 5 =!= 1, "D", None))
        .unionAll(epoch(2000000L, col("doc_id") % 7 === 3, "U", Some(" e2")))
        .unionAll(epoch(3000000L,
          col("doc_id") % 5 === 1 && col("doc_id") % 9 === 4, "D", None))
        .unionAll(epoch(3000000L,
          col("doc_id") % 6 === 2 && col("doc_id") % 5 =!= 1, "U",
          Some(" e3")))
      log.groupBy("doc_id")
        .agg(max_by(col("op"), col("seq")).as("op"),
          max_by(col("ctext"), col("seq")).as("lastc"))
        .select(col("doc_id"), col("op"),
          when(col("op") === "D", lit(null).cast("string"))
            .otherwise(md5(col("lastc"))).as("dg"))
        .orderBy("doc_id")
    },

    // ---- q141: time-travel read — reconstruct the corpus AS OF each
    //      of three version boundaries from base + a multi-epoch
    //      changelog, and emit the per-version integrity line (row
    //      count + q118's order-free checksum over id‖content). This
    //      is the "SELECT … VERSION AS OF v" primitive a versioned
    //      corpus store serves, composed from q137's compaction
    //      (argmax over seq ≤ boundary) and q135's apply (full-outer
    //      + row-local CASE), with ONE log scan and ONE base scan
    //      shared across all three boundaries. The tri-version fanout
    //      (base × versions) is the AUDIT shape — a release-integrity
    //      sweep comparing every live version in one pass; a
    //      production single-version read drops the versions join and
    //      is exactly q135. Epoch 9 deletes rows epoch 7 updated and
    //      epoch 8 re-inserts a base-deleted id, so the three
    //      checksums pin ordering semantics, not just counts.
    //      Deletes carry the '' sentinel (q137's argmax-null
    //      decision). ----
    Q(
      "q141_time_travel",
      """WITH log AS (
        |  SELECT 7 AS epoch, doc_id, 7000000 + doc_id AS seq, 'U' AS op,
        |    text || ' e7' AS ctext
        |  FROM documents WHERE doc_id % 4 = 1
        |  UNION ALL
        |  SELECT 7, doc_id, 7000000 + doc_id, 'D', ''
        |  FROM documents WHERE doc_id % 10 = 3 AND doc_id % 4 <> 1
        |  UNION ALL
        |  SELECT 8, doc_id, 8000000 + doc_id, 'U', text || ' e8'
        |  FROM documents WHERE doc_id % 9 = 2
        |  UNION ALL
        |  SELECT 8, doc_id + 2000000, 8000000 + doc_id, 'U', text
        |  FROM documents WHERE doc_id % 10 = 3 AND doc_id % 15 = 3
        |  UNION ALL
        |  SELECT 9, doc_id, 9000000 + doc_id, 'D', ''
        |  FROM documents WHERE doc_id % 4 = 1 AND doc_id % 8 = 5),
        |vs AS (SELECT * FROM (VALUES (7), (8), (9)) AS t(v)),
        |c AS (
        |  SELECT vs.v, l.doc_id, arg_max(l.op, l.seq) AS op,
        |    arg_max(l.ctext, l.seq) AS lastc
        |  FROM log l JOIN vs ON l.epoch <= vs.v
        |  GROUP BY 1, 2),
        |st AS (
        |  SELECT COALESCE(c.v, b.v) AS v,
        |    COALESCE(c.doc_id, b.doc_id) AS doc_id,
        |    CASE WHEN c.op = 'D' THEN CAST(NULL AS VARCHAR)
        |         WHEN c.op IS NULL THEN b.text
        |         ELSE c.lastc END AS ftext
        |  FROM (SELECT vs.v, d.doc_id, d.text
        |        FROM documents d CROSS JOIN vs) b
        |  FULL OUTER JOIN c ON b.v = c.v AND b.doc_id = c.doc_id)
        |SELECT v AS version, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(bit_xor(CAST(('0x' || substr(md5(
        |      doc_id || chr(31) || ftext), 1, 15)) AS BIGINT))
        |    AS BIGINT) AS state_checksum
        |FROM st WHERE ftext IS NOT NULL
        |GROUP BY v ORDER BY version""".stripMargin,
    ) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val vs = Seq(7, 8, 9).toDF("v")
      def ep(e: Int, idShift: Long,
          pred: org.apache.spark.sql.Column, op: String,
          suffix: Option[String]) =
        docs.filter(pred).select(lit(e).as("epoch"),
          (col("doc_id") + idShift).as("doc_id"),
          (lit(e * 1000000L) + col("doc_id")).as("seq"),
          lit(op).as("op"),
          suffix.map(x => concat(col("text"), lit(x)))
            .getOrElse(if (op == "D") lit("") else col("text"))
            .as("ctext"))
      val log = ep(7, 0, col("doc_id") % 4 === 1, "U", Some(" e7"))
        .unionAll(ep(7, 0,
          col("doc_id") % 10 === 3 && col("doc_id") % 4 =!= 1, "D", None))
        .unionAll(ep(8, 0, col("doc_id") % 9 === 2, "U", Some(" e8")))
        .unionAll(ep(8, 2000000L,
          col("doc_id") % 10 === 3 && col("doc_id") % 15 === 3, "U", None))
        .unionAll(ep(9, 0,
          col("doc_id") % 4 === 1 && col("doc_id") % 8 === 5, "D", None))
      val compacted = log.join(broadcast(vs), col("epoch") <= col("v"))
        .groupBy("v", "doc_id")
        .agg(max_by(col("op"), col("seq")).as("op"),
          max_by(col("ctext"), col("seq")).as("lastc"))
      val basePerV = docs.select(col("doc_id"), col("text"))
        .crossJoin(broadcast(vs))
      basePerV.join(compacted, Seq("v", "doc_id"), "full_outer")
        .select(col("v"),
          when(col("op") === "D", lit(null).cast("string"))
            .when(col("op").isNull, col("text"))
            .otherwise(col("lastc")).as("ftext"),
          col("doc_id"))
        .filter(col("ftext").isNotNull)
        .groupBy(col("v").as("version"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(CAST(conv(substring(md5(concat_ws(chr(31), " +
            "doc_id, ftext)), 1, 15), 16, 10) AS BIGINT))")
            .as("state_checksum"))
        .orderBy("version")
    },
  )
}
