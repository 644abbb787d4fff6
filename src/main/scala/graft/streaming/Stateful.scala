package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed input event for the custom-state operator. */
case class UserEvent(user_id: Long, value: Double)

/** Per-key running aggregate emitted each micro-batch the key appears in. */
case class UserRunning(user_id: Long, n: Long, total: Double)

/**
 * Custom keyed streaming state via `flatMapGroupsWithState` (SURVEY.md §1.1 /
 * north-star "KeyValueGroupedDataset.mapGroupsWithState for custom state"): a
 * running per-user (count, total) that survives across micro-batches — the general
 * form of the reference's keyed upsert, for state that is *computed*, not just
 * last-written.
 *
 * State lives in the state store (RocksDB-backed at cluster scale), partitioned by
 * key — nothing driver-side. Update-mode output: one row per touched key per batch.
 * For production pipelines add a timeout (`GroupStateTimeout`) to bound state for
 * keys that go quiet; left untimed here because the tests assert exact totals.
 */
object Stateful {

  def runningTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    val enc = Encoders.product[UserRunning]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) => {
          var n = 0L
          var total = 0.0
          batch.foreach { e => n += 1; total += e.value }
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val next = UserRunning(uid, prev.n + n, prev.total + total)
          state.update(next)
          Iterator.single(next)
        })(enc, enc)
  }
}
