package graft

import graft.sinks.ClientSinks.{KinesisClient, OutRecord, SqsClient, SqsMessage}

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
}
