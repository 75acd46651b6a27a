package graft.sinks

import graft.sinks.ClientSinks.PubSubClient

/** K4's REAL SDK binding — [[ClientSinks.PubSubClient]] over the Google
  * Cloud `Publisher`, bound by REFLECTION like [[AwsKinesisClient]] /
  * [[AwsSqsClient]]: the module compiles and ships without the
  * `google-cloud-pubsub` jars (this sandbox has none) yet issues the
  * genuine publish calls wherever the SDK is on the classpath.
  *
  * Wire shape per the reference `GooglePubSubSink.scala:63-126,:199-240`:
  * a long-lived `Publisher` built per topic
  * (`Publisher.newBuilder(topic).build()` — the client owns batching, A6),
  * each event published as
  * `PubsubMessage.newBuilder.setData(ByteString.copyFrom(bytes)).build()`,
  * and per-message outcomes observed on the returned `ApiFuture[String]`
  * (the reference attaches an `ApiFutureCallback` and prepends failures
  * to a retry buffer). Inside a micro-batch that callback/interval pair
  * collapses to: publish the whole chunk, await every future, and return
  * an index-aligned `Seq[Option[String]]` — `None` = the message id
  * arrived, `Some(code)` = that future failed
  * ([[ClientSinks.PubSubEventSink]] then re-publishes only the failed
  * subset, exhaustion replaying from the checkpoint). `ApiFuture`
  * extends `java.util.concurrent.Future`, so the await is interface-typed
  * — no SDK class named in the hot path.
  */
object GcpPubSubClient {

  private val PublisherClass = "com.google.cloud.pubsub.v1.Publisher"
  private val MessageClass = "com.google.pubsub.v1.PubsubMessage"
  private val ByteStringClass = "com.google.protobuf.ByteString"

  /** Is the Google Cloud PubSub SDK on this classpath? */
  def available(): Boolean =
    try { Class.forName(PublisherClass); true }
    catch { case _: ClassNotFoundException => false }

  /** Build the real client; throws ClassNotFoundException when the SDK is
    * absent (call [[available]] first, or inject a test client instead).
    * The presence check runs HERE — the factory `() => GcpPubSubClient()`
    * is invoked per-partition on the executor, so a missing SDK kills the
    * task at factory time, before any message is attempted; the
    * `Publisher` itself still builds lazily per topic so the returned
    * object serializes cleanly. Topic strings are the fully-qualified
    * form the reference's `ProjectTopicName.of(projectId, topic)` renders
    * (`projects/<p>/topics/<t>`) — `Publisher.newBuilder(String)` accepts
    * it directly. */
  def apply(): PubSubClient = {
    Class.forName(PublisherClass)
    new PubSubClient {
      // one Publisher per topic per sink client (= per executor task);
      // the SDK object is resolved lazily so the closure serializes
      // without touching SDK classes on the driver
      @transient private lazy val publishers =
        scala.collection.mutable.HashMap.empty[String, AnyRef]

      private def publisherFor(topic: String): AnyRef =
        publishers.getOrElseUpdate(topic, {
          val b = Class.forName(PublisherClass)
            .getMethod("newBuilder", classOf[String]).invoke(null, topic)
          b.getClass.getMethod("build").invoke(b)
        })

      def publish(topic: String, messages: Seq[Array[Byte]]): Seq[Option[String]] = {
        val pub = publisherFor(topic)
        val cl = pub.getClass.getClassLoader
        val byteStringCls = Class.forName(ByteStringClass, true, cl)
        val msgCls = Class.forName(MessageClass, true, cl)
        def message(bytes: Array[Byte]): AnyRef = {
          val data = byteStringCls.getMethod("copyFrom", classOf[Array[Byte]])
            .invoke(null, bytes)
          val b = msgCls.getMethod("newBuilder").invoke(null)
          b.getClass.getMethod("setData", byteStringCls).invoke(b, data)
          b.getClass.getMethod("build").invoke(b)
        }
        val publishM = pub.getClass.getMethods
          .find(m => m.getName == "publish" && m.getParameterCount == 1 &&
            m.getParameterTypes()(0).getName == MessageClass)
          .getOrElse(throw new NoSuchMethodException("publish(PubsubMessage)"))
        // publish the whole chunk first (client-side batching coalesces
        // the RPCs), then await: outcome order == input order
        val futures = messages.map(m => publishM.invoke(pub, message(m))
          .asInstanceOf[java.util.concurrent.Future[_]])
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
