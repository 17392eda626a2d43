package graft.sources

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Batch DataSourceV2 that dials a running RPC endpoint and scans what the
  * service answers — closing the reference's `DSet.import` contract
  * (reference `src/CoreLib/DSetGenerics.fs:788-836`: import a DSet from a
  * NAMED service contract on live nodes; `contractFSharp.fs:219-226`).
  * [[graft.streaming.LiveIngest]] covers the streaming shape of the same
  * idea; this source is the batch dial: `spark.read.format(...)` against
  * one or more live endpoints, each answering a contract name.
  *
  * Wire protocol (deliberately minimal, like the reference's
  * line-oriented contract demos): the client sends `GET <contract>\n`;
  * the server streams one row per line, fields tab-separated, `\N` for
  * null, then closes. Supported field types: BIGINT, INT, DOUBLE,
  * BOOLEAN, STRING, TIMESTAMP (as `java.sql.Timestamp` text). Strings
  * containing tabs/newlines need a framed protocol — out of scope for
  * the contract-dial surface.
  *
  * Scale design: every endpoint in `endpoints` becomes ONE input
  * partition, so a fleet of N service shards is scanned by N parallel
  * executor tasks dialing independently — the driver never touches row
  * data. Column pruning pushes into the reader
  * ([[SupportsPushDownRequiredColumns]]): pruned fields are skipped at
  * parse time (the text still crosses the wire — a richer contract
  * would push the projection to the service; the reference's import has
  * no projection pushdown either).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.RpcDataSource")
  *   .option("endpoints", "hostA:9000,hostB:9000")
  *   .option("contract", "events")
  *   .option("schema", "event_id BIGINT, kind STRING")
  *   .load()
  * }}}
  */
object RpcSource {

  /** Read a contract from live endpoints as a DataFrame (facade over the
    * DataSourceV2 — see class doc for the wire protocol).
    */
  def readRpc(spark: SparkSession, endpoints: Seq[String], schemaDdl: String,
      contract: String): DataFrame =
    spark.read.format(classOf[RpcDataSource].getName)
      .option("endpoints", endpoints.mkString(","))
      .option("contract", contract)
      .option("schema", schemaDdl)
      .load()

  /** Minimal contract-answering service for demos/tests (the counterpart
    * of [[graft.streaming.LiveIngest.serveLines]], plus the handshake):
    * each connection's first line must be `GET <name>`; the server
    * replies with that contract's lines and closes the connection (EOF =
    * end of scan). Unknown contracts get zero rows. Serves any number of
    * sequential/concurrent connections until `close()`. Returns
    * (boundPort, closeFn); port=0 binds an ephemeral port.
    */
  def serve(port: Int, contracts: Map[String, Seq[String]]): (Int, () => Unit) = {
    val server = new ServerSocket(port)
    @volatile var done = false
    val t = new Thread(() => {
      while (!done) {
        try {
          val sock = server.accept()
          val conn = new Thread(() => {
            try {
              val in = new BufferedReader(
                new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
              val out = new PrintWriter(sock.getOutputStream, false)
              val req = Option(in.readLine()).getOrElse("")
              val name = if (req.startsWith("GET ")) req.substring(4).trim else ""
              contracts.getOrElse(name, Seq.empty).foreach(out.println)
              out.flush()
            } catch { case _: Exception => () } // client went away
            finally { try sock.close() catch { case _: Exception => () } }
          }, "graft-rpc-serve-conn")
          conn.setDaemon(true)
          conn.start()
        } catch {
          case _: Exception =>
            if (server.isClosed) done = true
            else try Thread.sleep(100) catch { case _: InterruptedException => done = true }
        }
      }
    }, "graft-rpc-serve")
    t.setDaemon(true)
    t.start()
    (server.getLocalPort, () => { done = true; try server.close() catch { case _: Exception => () } })
  }
}

class RpcDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ddl = options.get("schema")
    require(ddl != null, "rpc source requires a 'schema' option (DDL string)")
    StructType.fromDDL(ddl)
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = new RpcTable(schema)
  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class RpcTable(tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = "graft_rpc"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RpcScanBuilder(tableSchema, options)
}

private[sources] class RpcScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = {
    val eps = Option(options.get("endpoints")).getOrElse(
      throw new IllegalArgumentException("rpc source requires an 'endpoints' option"))
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val contract = Option(options.get("contract")).getOrElse("")
    // session timezone captured at plan time: executors must parse wire
    // timestamp text the way every Spark text source does — in the
    // SESSION zone, not the executor JVM's default (which can differ)
    val tz = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    new RpcScan(full, required, eps, contract, tz)
  }
}

private[sources] class RpcScan(full: StructType, required: StructType,
    endpoints: Seq[String], contract: String, timeZone: String) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    endpoints.map { ep =>
      val i = ep.lastIndexOf(':')
      val port = if (i > 0) scala.util.Try(ep.substring(i + 1).toInt).toOption else None
      port match {
        case Some(p) if p > 0 && p <= 65535 =>
          RpcInputPartition(ep.substring(0, i), p): InputPartition
        case _ => throw new IllegalArgumentException(
          s"rpc source: malformed endpoint '$ep' — expected host:port")
      }
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new RpcReaderFactory(full, required, contract, timeZone)
}

private[sources] case class RpcInputPartition(host: String, port: Int) extends InputPartition

private[sources] class RpcReaderFactory(full: StructType, required: StructType,
    contract: String, timeZone: String) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RpcInputPartition]
    new RpcPartitionReader(p.host, p.port, full, required, contract, timeZone)
  }
}

private[sources] class RpcPartitionReader(host: String, port: Int, full: StructType,
    required: StructType, contract: String, timeZone: String) extends PartitionReader[InternalRow] {
  private val socket = {
    val s = new Socket()
    s.connect(new InetSocketAddress(host, port), 10000)
    s.setSoTimeout(60000)
    s
  }
  private val in = {
    val out = new PrintWriter(socket.getOutputStream, false)
    out.print(s"GET $contract\n")
    out.flush()
    new BufferedReader(new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
  }
  // pruned column -> wire field index (the service always sends the full
  // contract row; pruning skips the parse, not the bytes)
  private val wireIdx: Array[Int] = required.fields.map(f => full.fieldIndex(f.name))
  private var row: InternalRow = _

  override def next(): Boolean = {
    val line = in.readLine()
    if (line == null) false
    else { row = parse(line); true }
  }

  private def parse(line: String): InternalRow = {
    val parts = line.split("\t", -1)
    val vals = new Array[Any](wireIdx.length)
    var i = 0
    while (i < wireIdx.length) {
      val raw = parts(wireIdx(i))
      vals(i) =
        if (raw == "\\N") null
        else required.fields(i).dataType match {
          case LongType => raw.toLong
          case IntegerType => raw.toInt
          case DoubleType => raw.toDouble
          case BooleanType => raw.toBoolean
          case StringType => UTF8String.fromString(raw)
          case TimestampType =>
            // parse in the captured SESSION timezone (java.sql.Timestamp
            // .valueOf would use the executor JVM's default zone)
            val ldt = java.time.LocalDateTime.parse(raw.replace(' ', 'T'))
            DateTimeUtils.instantToMicros(
              ldt.atZone(java.time.ZoneId.of(timeZone)).toInstant)
          case dt => throw new IllegalArgumentException(
            s"rpc source: unsupported field type $dt for '${required.fields(i).name}'")
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def get(): InternalRow = row
  override def close(): Unit = try socket.close() catch { case _: Exception => () }
}
