package org.apache.spark

import com.codahale.metrics.{Gauge, MetricRegistry}

import org.apache.spark.metrics.source.Source

/** `private[spark]`-access shim (the metrics sibling of graft's sql
  * `Bridge`): registers long gauges with the Spark `MetricsSystem`, so
  * every configured metrics sink exports them — including the driver's
  * `/metrics/prometheus` servlet that `spark.ui.prometheus.enabled`
  * turns on (see `GraftSession.prometheusConf`). This is what makes
  * the engine's sent/malformed counters scrapeable the way the
  * reference's Prometheus endpoint is (`main.go:181-187`), with zero
  * HTTP code of our own: the servlet is Spark's, the counters are
  * gauges over the streaming listener's atomics.
  */
object GraftMetrics {

  def registerGauges(sc: SparkContext, source: String,
                     gauges: Map[String, () => Long]): Unit = {
    val reg = new MetricRegistry
    gauges.foreach { case (name, read) =>
      reg.register(name, new Gauge[Long] { override def getValue: Long = read() })
    }
    sc.env.metricsSystem.registerSource(new Source {
      override val sourceName: String = source
      override val metricRegistry: MetricRegistry = reg
    })
  }

  /** Current value of a registered gauge — the read side a metrics
    * sink performs; used by specs to assert the wiring end-to-end.
    */
  def gaugeValue(sc: SparkContext, source: String, metric: String): Option[Long] =
    sc.env.metricsSystem.getSourcesByName(source).headOption.flatMap { s =>
      Option(s.metricRegistry.getGauges.get(metric))
        .map(_.getValue.asInstanceOf[Long])
    }
}
