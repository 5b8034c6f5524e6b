package graft.serving

import java.util.concurrent.atomic.AtomicLong

/** Engine counters in Prometheus exposition format — the C10 analog of
  * the reference's metrics endpoint (`internal/metrics/metrics.go:77`,
  * port 9253): messages in, coalesced groups, records delivered, polls
  * served, active consumers. Served by `RestServer` at `GET /metrics`.
  */
class EngineMetrics {
  val messagesReceived = new AtomicLong
  val groupsFlushed = new AtomicLong
  val recordsDelivered = new AtomicLong
  val pollsServed = new AtomicLong
  val activeConsumers = new AtomicLong

  def render: String = {
    def c(name: String, help: String, v: Long): String =
      s"# HELP graft_$name $help\n# TYPE graft_$name counter\ngraft_$name $v\n"
    c("messages_received_total", "Records accepted by produce fronts", messagesReceived.get) +
      c("coalescer_groups_total", "Micro-batch groups flushed", groupsFlushed.get) +
      c("records_delivered_total", "Records returned to consumers", recordsDelivered.get) +
      c("polls_served_total", "Poll requests answered", pollsServed.get) +
      s"# HELP graft_active_consumers Registered consumers\n" +
      s"# TYPE graft_active_consumers gauge\ngraft_active_consumers ${activeConsumers.get}\n"
  }
}
