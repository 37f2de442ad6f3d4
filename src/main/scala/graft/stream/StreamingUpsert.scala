package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time last-writer-wins compaction — the streaming form of
  * [[graft.util.Upsert.compact]]: a CDC/update stream folds into one
  * winner per key as it arrives, state is one (version, fp) pair per
  * key, and each trigger emits a change-log row whenever a key's
  * winner ADVANCES (stale/duplicate updates are swallowed). Consumers
  * replaying the emitted log last-write-per-key reconstruct exactly
  * the batch-compacted table.
  *
  * Winner order is (version, fp) with fp compared as UTF-8 BYTES
  * (`UTF8String` binary order — what Spark's window `orderBy` on a
  * string column uses), so the batch caller's
  * `Upsert.compact(orderCols = version, fp)` and this kernel pick the
  * same winner even for non-ASCII fingerprints, where Java's UTF-16
  * `String` ordering disagrees with UTF-8 byte order (supplementary
  * vs high-BMP characters sort oppositely).
  *
  * In batch mode each key's group arrives once, so the kernel emits
  * exactly the per-key winner: batch output == `Upsert.compact`
  * (spec-pinned), which is what lets q104 put this state machine under
  * the same oracle shape as q97.
  */
object StreamingUpsert {

  case class Versioned(key: Long, version: Int, fp: String)

  def compactStream(updates: Dataset[Versioned]): Dataset[Versioned] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.key)
      .flatMapGroupsWithState[(Int, String), Versioned](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Versioned], state: GroupState[(Int, String)]) =>
          def fpGt(a: String, b: String): Boolean =
            org.apache.spark.unsafe.types.UTF8String.fromString(a)
              .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) > 0
          var best = state.getOption.orNull
          var advanced = false
          it.foreach { v =>
            if (best == null || v.version > best._1 ||
                (v.version == best._1 && fpGt(v.fp, best._2))) {
              best = (v.version, v.fp); advanced = true
            }
          }
          if (advanced) {
            state.update(best)
            Iterator.single(Versioned(key, best._1, best._2))
          } else Iterator.empty
      }
  }
}
