package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /**
   * The same running per-user (count, total) on Spark 4's `transformWithState`
   * (SPARK-46815, the arbitrary-state API that supersedes
   * `flatMapGroupsWithState`): typed named state (`ValueState`) acquired from a
   * `StatefulProcessorHandle`, with per-state TTL and timer support — the
   * operational knobs the old API lacked (state here is unbounded running
   * totals, so TTL is explicitly NONE). Requires the RocksDB state store
   * provider; StreamingSpec runs it under RocksDB and asserts totals identical
   * to [[runningTotals]].
   */
  class RunningTotalsProcessor extends StatefulProcessor[Long, UserEvent, UserRunning] {
    @transient private var state: ValueState[UserRunning] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserRunning](
        "running", Encoders.product[UserRunning], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[UserEvent],
                                 timers: TimerValues): Iterator[UserRunning] = {
      var n = 0L
      var total = 0.0
      rows.foreach { e => n += 1; total += e.value }
      val prev = Option(state.get()).getOrElse(UserRunning(uid, 0L, 0.0))
      val next = UserRunning(uid, prev.n + n, prev.total + total)
      state.update(next)
      Iterator.single(next)
    }
  }

  def runningTotalsTws(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    implicit val enc = Encoders.product[UserRunning]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
