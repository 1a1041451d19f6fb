package graft

import org.apache.spark.sql.functions._
import graft.core.MetricsListener

class MetricsSpec extends SparkSpec {

  test("listener attributes shuffle bytes to the labeled query") {
    val m = new MetricsListener
    spark.listenerManager.register(m)
    try {
      m.label("agg_query")
      spark.range(100000).groupBy(expr("id % 997")).count()
        .write.format("noop").mode("overwrite").save()
      // listener bus is async
      var tries = 0
      while (m.get("agg_query").isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val qm = m.get("agg_query")
      assert(qm.nonEmpty, "onSuccess never fired for the labeled query")
      assert(qm.get.shuffleBytes > 0, s"expected shuffle bytes > 0, got $qm")
    } finally spark.listenerManager.unregister(m)
  }
}
