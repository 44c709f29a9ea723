package graft

import graft.config.StreamsConfig
import graft.functions.XidGen
import graft.sink.BatchPut
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based delivery/key invariants (SURVEY §5 engine test plan #2):
  * hold for ALL inputs, not just the example matrix. Spark-free — these
  * exercise the pure delivery machinery and the xid generator. Run by sbt's
  * native ScalaCheck framework alongside the ScalaTest suites. */
object PropertySpec extends Properties("graft.delivery") {

  private def cfg(batchSize: Int, maxRetries: Int = 3) = StreamsConfig(
    region = "r", streamName = "s", batchSize = batchSize, maxRetries = maxRetries)

  private def recs(n: Int) =
    (0 until n).map(i => BatchPut.Record(Array(i.toByte), s"k$i"))

  property("chunks <= batch_size and everything delivers") =
    forAll(Gen.choose(0, 2000), Gen.choose(1, 500)) { (n: Int, bs: Int) =>
      var calls = List.empty[Int]
      val putter = new BatchPut.Putter {
        def put(rs: Seq[BatchPut.Record]): Seq[BatchPut.PutResult] = {
          calls ::= rs.size; rs.map(_ => BatchPut.PutResult(None))
        }
      }
      val stats = BatchPut.publish(putter, cfg(bs), recs(n), sleep = _ => ())
      Prop.all(
        calls.forall(_ <= bs),
        calls.sum == n,
        stats.acked == n && stats.dropped == 0)
    }

  property("retry terminates within max_retries; still-failing rest drops") =
    forAll(Gen.choose(1, 200), Gen.choose(0, 5), Gen.choose(0, 8)) {
      (n: Int, maxRetries: Int, failFirstK: Int) =>
        var attempts = 0
        val putter = new BatchPut.Putter {
          def put(rs: Seq[BatchPut.Record]): Seq[BatchPut.PutResult] = {
            attempts += 1
            rs.map(r => BatchPut.PutResult(
              if (r.key.stripPrefix("k").toInt < failFirstK) Some("ERR") else None))
          }
        }
        val stats = BatchPut.publish(putter, cfg(500, maxRetries), recs(n), sleep = _ => ())
        val failing = math.min(failFirstK, n)
        Prop.all(
          stats.dropped == failing,
          stats.acked == n - failing,
          attempts <= (if (failing > 0) maxRetries + 1 else 1))
    }

  property("backoff doubles from init, monotone, capped at max") =
    forAll(Gen.choose(1, 100)) { (n: Int) =>
      var sleeps = List.empty[Long]
      val putter = new BatchPut.Putter {
        def put(rs: Seq[BatchPut.Record]): Seq[BatchPut.PutResult] =
          rs.map(_ => BatchPut.PutResult(Some("ERR")))
      }
      BatchPut.publish(putter, cfg(500, maxRetries = 5), recs(n),
        sleep = d => sleeps ::= d.toMillis)
      val s = sleeps.reverse
      Prop.all(
        s == s.sorted,
        s.headOption.forall(_ == 1000L),
        s.forall(_ <= 60000L),
        s.sliding(2).forall {
          case List(a, b) => b == math.min(a * 2, 60000L)
          case _ => true
        })
    }

  property("xids unique, alphabet-clean, k-ordered over increasing seconds") =
    forAll(Gen.listOfN(50, Gen.choose(0L, 4000000000L))) { (seconds: List[Long]) =>
      val sorted = seconds.sorted
      val ids = sorted.map(XidGen.next)
      Prop.all(
        ids.distinct.size == ids.size,
        // distinct seconds order the ids by their time prefix; duplicate
        // seconds fall back to counter order (not asserted — may wrap)
        ids == ids.sorted || sorted.distinct.size < sorted.size,
        ids.forall(_.matches("^[0-9a-v]{20}$")))
    }
}
