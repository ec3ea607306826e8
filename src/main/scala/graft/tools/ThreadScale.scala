package graft.tools

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import scala.jdk.CollectionConverters._

/** Dev tool: raw kernel thread-scaling probe with a built-in stack sampler
  * to locate contention. */
object ThreadScale {
  def main(args: Array[String]): Unit = {
    val docs = (0 until 64).map(i => graft.spark.FixtureGen.docForHeavy(i.toLong)).toArray
    for (_ <- 1 to 3; d <- docs) graft.core.Extract.extractPdf(d.bytes, None)

    val hist = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    val sampling = new AtomicBoolean(false)
    val sampler = new Thread(() => {
      while (true) {
        if (sampling.get()) {
          for ((t, frames) <- Thread.getAllStackTraces.asScala
               if t.getName.startsWith("work-") && frames.nonEmpty) {
            val key = t.getState.toString + " @ " + frames.take(3).mkString(" <- ")
            hist.computeIfAbsent(key, _ => new AtomicLong()).incrementAndGet()
          }
        }
        Thread.sleep(17)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    for (threads <- Seq(1, 8, 32)) {
      val pool = Executors.newFixedThreadPool(threads, new java.util.concurrent.ThreadFactory {
        val n = new AtomicLong()
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"work-${n.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      })
      val done = new AtomicLong()
      val unitsPerThread = if (threads == 32) 200 else 96
      hist.clear()
      sampling.set(threads == 32)
      val t0 = System.nanoTime()
      (0 until threads).foreach { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var k = 0
            while (k < unitsPerThread) {
              val d = docs((t * 31 + k) % docs.length)
              if (d.kind != "html" && d.kind != "textrow")
                graft.core.Extract.extractPdf(d.bytes, None)
              done.incrementAndGet()
              k += 1
            }
          }
        })
      }
      pool.shutdown()
      pool.awaitTermination(600, TimeUnit.SECONDS)
      sampling.set(false)
      val secs = (System.nanoTime() - t0) / 1e9
      val gcMs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
      println(f"THREADS $threads: ${done.get()} docs in $secs%.2f s -> ${done.get() / secs}%.0f docs/s (cum GC $gcMs ms)")
      if (threads == 32) {
        val top = hist.asScala.toList.sortBy(-_._2.get()).take(12)
        for ((k, v) <- top) println(s"SAMPLE ${v.get()}  $k")
      }
    }
  }
}
