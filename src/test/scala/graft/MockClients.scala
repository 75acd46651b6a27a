package graft

import graft.sinks.ClientSinks.{KinesisClient, NsqClient, OutRecord, PubSubClient, RabbitClient, SqsClient, SqsMessage}

import scala.collection.mutable

/** Recording mock wire clients for the K1/K2 client sinks. Local-mode
  * tasks share this JVM, so executor-side writes land in these
  * synchronized buffers. Failure injection is deterministic per record
  * (parsed from the `...-<n>` payload suffix) so partial-failure retry
  * accounting is exact. */
object MockClients {
  private val kCalls = mutable.ArrayBuffer.empty[Seq[OutRecord]]
  private val kStored = mutable.ArrayBuffer.empty[OutRecord]
  private val kFailedOnce = mutable.Set.empty[String]
  private val sCalls = mutable.ArrayBuffer.empty[Seq[SqsMessage]]
  private val sStored = mutable.ArrayBuffer.empty[SqsMessage]

  def reset(): Unit = synchronized {
    kCalls.clear(); kStored.clear(); kFailedOnce.clear(); sCalls.clear(); sStored.clear()
  }
  def kinesisCalls: Seq[Seq[OutRecord]] = synchronized(kCalls.toSeq)
  def kinesisStored: Seq[OutRecord] = synchronized(kStored.toSeq)
  def sqsCalls: Seq[Seq[SqsMessage]] = synchronized(sCalls.toSeq)
  def sqsStored: Seq[SqsMessage] = synchronized(sStored.toSeq)

  private def recordIndex(payload: Array[Byte]): Int = {
    val s = new String(payload, "UTF-8")
    s.substring(s.lastIndexOf('-') + 1).toIntOption.getOrElse(0)
  }

  /** Every record whose numeric suffix is ≡ 0 (mod failOnceEvery) errors
    * on its first send and succeeds on the retry. */
  def kinesis(failOnceEvery: Int): KinesisClient = new KinesisClient {
    def putRecords(stream: String, records: Seq[OutRecord]): Seq[Option[String]] =
      MockClients.synchronized {
        kCalls += records
        records.map { r =>
          val tag = new String(r.payload, "UTF-8")
          if (failOnceEvery > 0 && recordIndex(r.payload) % failOnceEvery == 0 &&
              !kFailedOnce.contains(tag)) {
            kFailedOnce += tag
            Some("ProvisionedThroughputExceededException")
          } else { kStored += r; None }
        }
      }
  }

  def kinesisAlwaysFailing(): KinesisClient = new KinesisClient {
    def putRecords(stream: String, records: Seq[OutRecord]): Seq[Option[String]] =
      MockClients.synchronized { kCalls += records; records.map(_ => Some("ServiceUnavailable")) }
  }

  def sqs(): SqsClient = new SqsClient {
    def sendMessageBatch(queue: String, messages: Seq[SqsMessage]): Seq[Option[String]] =
      MockClients.synchronized { sCalls += messages; sStored ++= messages; messages.map(_ => None) }
  }

  private val pCalls = mutable.ArrayBuffer.empty[Seq[Array[Byte]]]
  private val pStored = mutable.ArrayBuffer.empty[Array[Byte]]
  private val pFailedOnce = mutable.Set.empty[String]
  private val nCalls = mutable.ArrayBuffer.empty[Seq[Array[Byte]]]
  private val rAttempts = mutable.Map.empty[String, Int].withDefaultValue(0)
  private val rStored = mutable.ArrayBuffer.empty[Array[Byte]]
  private val rPublishes = mutable.ArrayBuffer.empty[(String, String)]
  private val rBackoffs = mutable.ArrayBuffer.empty[Long]

  def pubsubCalls: Seq[Seq[Array[Byte]]] = synchronized(pCalls.toSeq)
  def pubsubStored: Seq[Array[Byte]] = synchronized(pStored.toSeq)
  def nsqCalls: Seq[Seq[Array[Byte]]] = synchronized(nCalls.toSeq)
  def rabbitStored: Seq[Array[Byte]] = synchronized(rStored.toSeq)
  def rabbitBackoffs: Seq[Long] = synchronized(rBackoffs.toSeq)
  def recordBackoff(ms: Long): Unit = synchronized(rBackoffs += ms)

  def pubsub(failOnceEvery: Int = 0): PubSubClient = new PubSubClient {
    def publish(topic: String, messages: Seq[Array[Byte]]): Seq[Option[String]] =
      MockClients.synchronized {
        pCalls += messages
        messages.map { m =>
          val tag = new String(m, "UTF-8")
          if (failOnceEvery > 0 && recordIndex(m) % failOnceEvery == 0 &&
              !pFailedOnce.contains(tag)) {
            pFailedOnce += tag; Some("UNAVAILABLE")
          } else { pStored += m; None }
        }
      }
  }

  def nsq(): NsqClient = new NsqClient {
    def produceMulti(topic: String, messages: Seq[Array[Byte]]): Unit =
      MockClients.synchronized { nCalls += messages }
  }

  def nsqFailing(): NsqClient = new NsqClient {
    def produceMulti(topic: String, messages: Seq[Array[Byte]]): Unit =
      throw new RuntimeException("nsq down")
  }

  /** Each event fails its first `failuresPerEvent` publishes, then lands. */
  def rabbit(failuresPerEvent: Int = 0): RabbitClient = new RabbitClient {
    def basicPublish(exchange: String, routingKey: String, body: Array[Byte]): Unit =
      MockClients.synchronized {
        val tag = new String(body, "UTF-8")
        val n = rAttempts(tag)
        rAttempts(tag) = n + 1
        if (n < failuresPerEvent) throw new RuntimeException(s"rabbit transient $n")
        rPublishes += (exchange -> routingKey)
        rStored += body
      }
  }

  /** r11: the (exchange, routingKey) each successful publish carried. */
  def rabbitPublishes: Seq[(String, String)] = synchronized(rPublishes.toSeq)

  private val kfCalls = mutable.ArrayBuffer.empty[(String, Seq[OutRecord])]
  private val kfStored = mutable.ArrayBuffer.empty[OutRecord]
  private val kfFailedOnce = mutable.Set.empty[String]

  def kafkaCalls: Seq[(String, Seq[OutRecord])] = synchronized(kfCalls.toSeq)
  def kafkaStored: Seq[OutRecord] = synchronized(kfStored.toSeq)

  /** r12 K5 mock: per-record outcomes like the kinesis mock — records
    * whose numeric suffix is ≡ 0 (mod failOnceEvery) error once. */
  def kafka(failOnceEvery: Int = 0): graft.sinks.ClientSinks.KafkaClient =
    new graft.sinks.ClientSinks.KafkaClient {
      def send(topic: String, records: Seq[OutRecord]): Seq[Option[String]] =
        MockClients.synchronized {
          kfCalls += (topic -> records)
          records.map { r =>
            val tag = new String(r.payload, "UTF-8")
            if (failOnceEvery > 0 && recordIndex(r.payload) % failOnceEvery == 0 &&
                !kfFailedOnce.contains(tag)) {
              kfFailedOnce += tag
              Some("TimeoutException")
            } else { kfStored += r; None }
          }
        }
    }

  def kafkaAlwaysFailing(): graft.sinks.ClientSinks.KafkaClient =
    new graft.sinks.ClientSinks.KafkaClient {
      def send(topic: String, records: Seq[OutRecord]): Seq[Option[String]] =
        MockClients.synchronized {
          kfCalls += (topic -> records)
          records.map(_ => Some("NotEnoughReplicasException"))
        }
    }

  def resetExtras(): Unit = synchronized {
    pCalls.clear(); pStored.clear(); pFailedOnce.clear(); nCalls.clear()
    rAttempts.clear(); rStored.clear(); rBackoffs.clear(); rPublishes.clear()
    kfCalls.clear(); kfStored.clear(); kfFailedOnce.clear()
  }
}
