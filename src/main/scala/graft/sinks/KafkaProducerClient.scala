package graft.sinks

import graft.sinks.ClientSinks.{KafkaClient, OutRecord}

/** K5's REAL producer binding — [[ClientSinks.KafkaClient]] over
  * `org.apache.kafka.clients.producer.KafkaProducer`, bound by
  * REFLECTION like [[AwsKinesisClient]] / [[GcpPubSubClient]]: the
  * module compiles and ships without the kafka-clients jar (this
  * sandbox has none) yet issues genuine `send` calls wherever the jar
  * is on the classpath.
  *
  * Wire shape per the reference `KafkaSink.scala:280-330,377-401`: one
  * long-lived `KafkaProducer[String, Array[Byte]]` built from the
  * config-derived properties ([[ClientSinks.kafkaProducerProps]] — the
  * producer owns batching via `linger.ms`/`buffer.memory`, A6), each
  * event sent as `ProducerRecord(topic, key, bytes)`, and per-record
  * outcomes observed on the returned `Future[RecordMetadata]` (the
  * reference registers a `Callback` per send and collects failures; a
  * micro-batch collapses that to: send the whole chunk, await every
  * future, return index-aligned `Seq[Option[String]]` — the sink
  * re-sends only the failed subset, exhaustion replaying from the
  * checkpoint or diverting to the SQS backup). `Future` is
  * interface-typed, so no SDK class is named in the await path.
  */
object KafkaProducerClient {

  private val ProducerClass = "org.apache.kafka.clients.producer.KafkaProducer"
  private val RecordClass = "org.apache.kafka.clients.producer.ProducerRecord"

  /** Is the kafka-clients jar on this classpath? */
  def available(): Boolean =
    try { Class.forName(ProducerClass); true }
    catch { case _: ClassNotFoundException => false }

  /** Build the real client; throws ClassNotFoundException when the jar
    * is absent (the factory `() => KafkaProducerClient(props)` runs
    * per-partition on the executor, so a missing jar kills the task at
    * factory time, before any record is attempted — the reflection
    * contract shared by every SDK binding in this package). */
  def apply(props: Map[String, String]): KafkaClient = {
    Class.forName(ProducerClass)
    new KafkaClient {
      // one producer per client (= per executor task); resolved lazily
      // so the closure serializes without touching kafka classes on the
      // driver, held in a VAR so close() can release it without
      // constructing one
      @transient private var created: AnyRef = _
      private def producer: AnyRef = {
        if (created == null) {
          val p = new java.util.Properties()
          props.foreach { case (k, v) => p.setProperty(k, v) }
          created = Class.forName(ProducerClass)
            .getConstructor(classOf[java.util.Properties])
            .newInstance(p).asInstanceOf[AnyRef]
        }
        created
      }

      /** Flush + release the producer's sender thread, buffer and
        * sockets (`KafkaProducer.close()`); the sink calls this once per
        * partition task — without it every micro-batch leaks a live
        * producer (r12 review finding). */
      override def close(): Unit = {
        val p = created
        created = null
        if (p != null)
          try p.getClass.getMethod("close").invoke(p)
          catch { case scala.util.control.NonFatal(_) => () }
      }

      def send(topic: String, records: Seq[OutRecord]): Seq[Option[String]] = {
        val prod = producer
        val cl = prod.getClass.getClassLoader
        val recCls = Class.forName(RecordClass, true, cl)
        val ctor = recCls.getConstructor(
          classOf[String], classOf[Object], classOf[Object])
        val sendM = prod.getClass.getMethods
          .find(m => m.getName == "send" && m.getParameterCount == 1)
          .getOrElse(throw new NoSuchMethodException("send(ProducerRecord)"))
        // send the whole chunk first (the producer batches client-side),
        // then await: outcome order == input order
        val futures = records.map { r =>
          sendM.invoke(prod, ctor.newInstance(topic, r.key, r.payload)
              .asInstanceOf[Object])
            .asInstanceOf[java.util.concurrent.Future[_]]
        }
        futures.map { f =>
          try { f.get(); None }
          catch {
            case e: java.util.concurrent.ExecutionException =>
              val cause = Option(e.getCause).getOrElse(e)
              Some(s"${cause.getClass.getSimpleName}: ${String.valueOf(cause.getMessage)}")
            case e: InterruptedException =>
              Thread.currentThread().interrupt()
              Some(s"InterruptedException: ${String.valueOf(e.getMessage)}")
          }
        }
      }
    }
  }
}
