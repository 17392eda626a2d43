package graft.sources

import java.io.{BufferedReader, InputStreamReader}
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
  * NAMED service contract on live nodes; `contractFSharp.fs:48-226` is
  * the seq-batched contract streaming this mirrors).
  * [[graft.streaming.LiveIngest]] covers the streaming shape of the same
  * idea; this source is the batch dial: `spark.read.format(...)` against
  * one or more live endpoints, each answering a contract name.
  *
  * Wire protocol (line-oriented, framed fields):
  * {{{
  * request:  GET <contract> <col1,col2,...> [<filter>\t<filter>...]\n
  *           -- the projected columns, in scan order; "-" when the scan
  *           needs only row COUNTS (all columns pruned, e.g. count(*));
  *           optional tab-separated filter conjuncts, each
  *           "<op> <b64(col)> <b64(value)|->" with op one of
  *           eq gt ge lt le isnull notnull (base64 of the UTF-8 text,
  *           so any column name or literal survives the token format)
  * response: OK\n   then one row per line, fields tab-separated in the
  *           requested order, then close (EOF = end of scan); or
  *           ERR <message>\n   and close.
  * }}}
  * Fields are escaped so any string survives the wire: `\\` `\t` `\n`
  * `\r` are two-character escapes, and an SQL NULL is the unescaped
  * two-character token `\N` (a literal string "\N" arrives as `\\N`, so
  * there is no collision). An unknown contract answers `OK` with zero
  * rows (a service that does not hold the contract simply has no data).
  *
  * Scale design: every endpoint in `endpoints` becomes ONE input
  * partition, so a fleet of N service shards is scanned by N parallel
  * executor tasks dialing independently — the driver never touches row
  * data. Column pruning pushes THROUGH to the service
  * ([[SupportsPushDownRequiredColumns]] → the request's column list):
  * pruned columns never cross the wire, so a 100-column contract scanned
  * for 2 columns pays a 2-column wire cost. Filters push through too
  * ([[SupportsPushDownFilters]] → the request's conjunct list) as a
  * BEST-EFFORT row pre-filter: the service drops non-matching rows
  * before they cross the wire, and Spark re-evaluates every pushed
  * filter on what arrives (all filters stay residual — the same
  * contract parquet row-group skipping has), so correctness never
  * depends on the service's comparison semantics and a legacy service
  * that ignores the conjuncts still answers correctly. Supported field
  * types: BIGINT, INT, DOUBLE, BOOLEAN, STRING, TIMESTAMP (text, parsed
  * in the session timezone). Parse failures carry host:port, contract,
  * and the offending line.
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

  /** A named dataset a service answers: column names + rows of raw field
    * values (`null` element = SQL NULL).
    */
  final case class RpcContract(columns: Seq[String], rows: Seq[Seq[String]])

  /** Handle on a running fixture service: bound port, per-connection
    * request log, and total payload bytes sent — the observability the
    * pushdown tests need (asserting pruned columns never crossed the
    * wire).
    */
  final class RpcServer private[sources] (server: ServerSocket) {
    val requests = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private[sources] val sent = new java.util.concurrent.atomic.AtomicLong()
    @volatile private[sources] var done = false
    def port: Int = server.getLocalPort
    def bytesSent: Long = sent.get()
    def close(): Unit = { done = true; try server.close() catch { case _: Exception => () } }
  }

  /** Escape one field for the wire (see class doc); `null` → `\N`. */
  private[sources] def escapeField(s: String): String =
    if (s == null) "\\N"
    else {
      val sb = new java.lang.StringBuilder(s.length + 4)
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' => sb.append("\\\\")
          case '\t' => sb.append("\\t")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case c => sb.append(c)
        }
        i += 1
      }
      sb.toString
    }

  /** Reverse of [[escapeField]]; the exact token `\N` is SQL NULL. */
  private[sources] def unescapeField(s: String): String =
    if (s == "\\N") null
    else if (s.indexOf('\\') < 0) s
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '\\' => sb.append('\\'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case _ => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  private def unb64(s: String): Option[String] =
    try Some(new String(java.util.Base64.getDecoder.decode(s), StandardCharsets.UTF_8))
    catch { case _: IllegalArgumentException => None }

  /** Encode one Spark source filter as a wire conjunct, or None when the
    * shape isn't pushable (non-literal, nested column, timestamp — those
    * stay Spark-side only). Literals go as their canonical `toString`;
    * the serving side compares numerically when both sides parse as
    * numbers, lexically otherwise — approximation is safe because every
    * pushed filter is also re-evaluated by Spark (see class doc).
    */
  private[graft] def encodeFilter(f: org.apache.spark.sql.sources.Filter): Option[String] = {
    import org.apache.spark.sql.sources._
    def lit(v: Any): Option[String] = v match {
      case null => None
      case _: String | _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
           _: java.lang.Byte | _: java.lang.Double | _: java.lang.Float |
           _: java.lang.Boolean => Some(b64(v.toString))
      case _ => None
    }
    def simple(col: String): Boolean = !col.contains(".")
    f match {
      case EqualTo(c, v) if simple(c) => lit(v).map(s => s"eq ${b64(c)} $s")
      case GreaterThan(c, v) if simple(c) => lit(v).map(s => s"gt ${b64(c)} $s")
      case GreaterThanOrEqual(c, v) if simple(c) => lit(v).map(s => s"ge ${b64(c)} $s")
      case LessThan(c, v) if simple(c) => lit(v).map(s => s"lt ${b64(c)} $s")
      case LessThanOrEqual(c, v) if simple(c) => lit(v).map(s => s"le ${b64(c)} $s")
      case IsNull(c) if simple(c) => Some(s"isnull ${b64(c)} -")
      case IsNotNull(c) if simple(c) => Some(s"notnull ${b64(c)} -")
      case _ => None
    }
  }

  /** Serving side of [[encodeFilter]]: a row predicate over the
    * contract's FULL column list (the filter column need not be
    * projected — that is the point: the service tests it so it never
    * crosses the wire). Unknown ops/columns or undecodable tokens make
    * a conjunct vacuously true — the scanner re-filters, so best-effort
    * is safe; a stored NULL satisfies only `isnull`.
    */
  private[graft] def rowPredicate(filterTok: String, columns: Seq[String]): Seq[String] => Boolean = {
    val conjuncts: Seq[(String, Int, String)] = filterTok.split('\t').toSeq
      .filter(_.nonEmpty)
      .flatMap { c =>
        c.split(" ", 3) match {
          case Array(op, colB, valB) =>
            unb64(colB).map(columns.indexOf).filter(_ >= 0).flatMap { ix =>
              if (op == "isnull" || op == "notnull") Some((op, ix, ""))
              else unb64(valB).map(v => (op, ix, v))
            }
          case _ => None
        }
      }
    // The pre-drop must be EXACT under Spark's comparison semantics or
    // conservatively keep: the scanner's residual re-filter can remove
    // over-kept rows, but can never resurrect one the service dropped.
    // - numerics compare as BigDecimal (a Double parse would round a
    //   BIGINT beyond 2^53 and drop a matching row)
    // - non-numerics compare as UTF-8 bytes (Spark's UTF8_BINARY; Java's
    //   String.compareTo is UTF-16 order, which diverges on
    //   supplementary characters)
    // - a numeric/non-numeric mix (e.g. NaN literals) is KEPT — vacuous
    //   true, the scanner decides
    def dec(s: String): Option[java.math.BigDecimal] =
      try Some(new java.math.BigDecimal(s)) catch { case _: NumberFormatException => None }
    def utf8Compare(a: String, b: String): Int = {
      val x = a.getBytes(StandardCharsets.UTF_8)
      val y = b.getBytes(StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val d = (x(i) & 0xFF) - (y(i) & 0xFF)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
    row => conjuncts.forall { case (op, ix, v) =>
      val cell = row(ix)
      op match {
        case "isnull" => cell == null
        case "notnull" => cell != null
        case _ if cell == null => false
        case _ =>
          val cmp: Option[Int] = (dec(cell), dec(v)) match {
            case (Some(a), Some(b)) => Some(a.compareTo(b))
            case (None, None)       => Some(utf8Compare(cell, v))
            case _                  => None // mixed: keep, scanner re-filters
          }
          cmp match {
            case None => true
            case Some(c) => op match {
              case "eq" => c == 0
              case "gt" => c > 0
              case "ge" => c >= 0
              case "lt" => c < 0
              case "le" => c <= 0
              case _ => true // unknown op: vacuous, scanner re-filters
            }
          }
      }
    }
  }

  /** Read a contract from live endpoints as a DataFrame (facade over the
    * DataSourceV2 — see class doc for the wire protocol).
    */
  def readRpc(spark: SparkSession, endpoints: Seq[String], schemaDdl: String,
      contract: String): DataFrame =
    readRpc(spark, endpoints, schemaDdl, contract, partitionsPerEndpoint = 1)

  /** [[readRpc]] with N input partitions per endpoint (reference
    * `importN`, `DSetGenerics.fs:788-836`): each endpoint's contract
    * stream is split into `partitionsPerEndpoint` disjoint slices, one
    * executor task each — a big shard behind one endpoint parallelizes
    * without re-sharding the service.
    */
  def readRpc(spark: SparkSession, endpoints: Seq[String], schemaDdl: String,
      contract: String, partitionsPerEndpoint: Int): DataFrame = {
    // the line protocol frames on spaces/newlines and these tokens go on
    // the wire UNescaped (filter literals are base64, identifiers are
    // not): a contract or column name containing whitespace would
    // silently desync the request — an unknown contract answers OK with
    // zero rows by design, so the corruption would look like empty data
    require(contract.nonEmpty && !contract.exists(_.isWhitespace),
      s"readRpc: contract name must be non-empty with no whitespace, got '$contract'")
    org.apache.spark.sql.types.StructType.fromDDL(schemaDdl).fieldNames.foreach { f =>
      require(!f.exists(_.isWhitespace) && !f.contains(","),
        s"readRpc: column name '$f' would corrupt wire framing (whitespace/comma)")
    }
    spark.read.format(classOf[RpcDataSource].getName)
      .option("endpoints", endpoints.mkString(","))
      .option("contract", contract)
      .option("schema", schemaDdl)
      .option("partitionsPerEndpoint", partitionsPerEndpoint.toString)
      .load()
  }

  /** Minimal contract-answering service for demos/tests (the counterpart
    * of [[graft.streaming.LiveIngest.serveLines]], plus the handshake):
    * each connection's first line must be `GET <name> <cols>`; the server
    * answers `OK` and streams exactly the requested columns of that
    * contract (escaped per the class-doc protocol), then closes — so
    * column pruning genuinely shrinks the wire payload. Unknown contract
    * → `OK` + zero rows; unknown column → `ERR`. Serves any number of
    * sequential/concurrent connections until `close()`; port=0 binds an
    * ephemeral port.
    */
  def serve(port: Int, contracts: Map[String, RpcContract]): RpcServer = {
    val server = new ServerSocket(port)
    val handle = new RpcServer(server)
    val t = new Thread(() => {
      while (!handle.done) {
        try {
          val sock = server.accept()
          val conn = new Thread(() => {
            try answer(sock, contracts, handle)
            catch { case _: Exception => () } // client went away
            finally { try sock.close() catch { case _: Exception => () } }
          }, "graft-rpc-serve-conn")
          conn.setDaemon(true)
          conn.start()
        } catch {
          case _: Exception =>
            if (server.isClosed) handle.done = true
            else try Thread.sleep(100) catch { case _: InterruptedException => handle.done = true }
        }
      }
    }, "graft-rpc-serve")
    t.setDaemon(true)
    t.start()
    handle
  }

  /** Parse the slice conjunct (`slice <b64("i/n")> -`) out of a filter
    * token, if present and well-formed.
    */
  private[sources] def parseSlice(filterTok: String): Option[(Int, Int)] =
    filterTok.split('\t').iterator.filter(_.nonEmpty)
      .collectFirst { case c if c.startsWith(s"$SliceOp ") =>
        c.split(" ", 3) match {
          case Array(_, tok, _) => unb64(tok).flatMap { s =>
            s.split("/") match {
              case Array(i, n) =>
                try {
                  val (ii, nn) = (i.toInt, n.toInt)
                  if (nn > 0 && ii >= 0 && ii < nn) Some((ii, nn)) else None
                } catch { case _: NumberFormatException => None }
              case _ => None
            }
          }
          case _ => None
        }
      }.flatten

  /** Wire op for the partitions-per-endpoint slice request (reference
    * `importN`, `DSetGenerics.fs:788-836` — N delegate calls per node,
    * each producing its own partition). A legacy service treats the
    * conjunct as vacuously true (unknown column in [[rowPredicate]]) and
    * streams everything — the reader detects the missing `OK SLICE` ack
    * and falls back to client-side slicing. CAVEAT for the fallback:
    * client-side slicing keeps every N-th row by arrival index across N
    * INDEPENDENT connections, so it is only correct against services
    * whose enumeration order is deterministic per contract (true of the
    * reference's delegate semantics and this repo's fixture); a legacy
    * service with nondeterministic row order must use
    * partitionsPerEndpoint = 1 or upgrade to the acking protocol, so correctness never depends
    * on the service generation.
    */
  private[sources] val SliceOp = "slice"

  private[sources] def sliceConjunct(i: Int, n: Int): String = s"$SliceOp ${b64(s"$i/$n")} -"

  private def answer(sock: Socket, contracts: Map[String, RpcContract], handle: RpcServer): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val os = sock.getOutputStream
    def writeLine(s: String): Unit = {
      val b = (s + "\n").getBytes(StandardCharsets.UTF_8)
      os.write(b)
      handle.sent.addAndGet(b.length.toLong): Unit
    }
    val req = Option(in.readLine()).getOrElse("")
    handle.requests.add(req)
    val tokens = req.split(" ", 4)
    if (tokens.length < 2 || tokens(0) != "GET") writeLine(s"ERR malformed request '$req'")
    else {
      val name = tokens(1)
      val colsTok = if (tokens.length > 2) tokens(2).trim else "*"
      val filterTok = if (tokens.length > 3) tokens(3) else ""
      // slice partitions the POST-filter row stream; acknowledged in the
      // status line so the reader knows server-side slicing happened
      val slice = parseSlice(filterTok)
      val ok = slice.map { case (i, n) => s"OK SLICE $i/$n" }.getOrElse("OK")
      contracts.get(name) match {
        case None => writeLine(ok) // not our contract: zero rows
        case Some(c) =>
          val keep = rowPredicate(filterTok, c.columns)
          var kept = 0L
          def mine(r: Seq[String]): Boolean =
            keep(r) && { val k = kept; kept += 1; slice.forall { case (i, n) => k % n == i } }
          if (colsTok == "-") { // row markers only (fully pruned scan)
            writeLine(ok)
            c.rows.foreach(r => if (mine(r)) writeLine(""))
          } else {
            val want = if (colsTok == "*") c.columns else colsTok.split(",").toSeq
            val idx = want.map(w => w -> c.columns.indexOf(w))
            idx.find(_._2 < 0) match {
              case Some((missing, _)) =>
                writeLine(s"ERR unknown column '$missing' in contract '$name' " +
                  s"(has: ${c.columns.mkString(", ")})")
              case None =>
                writeLine(ok)
                val ix = idx.map(_._2).toArray
                c.rows.foreach { r =>
                  if (mine(r)) writeLine(ix.map(j => escapeField(r(j))).mkString("\t"))
                }
            }
          }
      }
    }
    os.flush()
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
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(f => RpcSource.encodeFilter(f).isDefined)
    // ALL filters stay residual: the service's pre-filter is best-effort
    // (parquet's row-group-skip contract) — Spark re-evaluates on arrival
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def build(): Scan = {
    val eps = Option(options.get("endpoints")).getOrElse(
      throw new IllegalArgumentException("rpc source requires an 'endpoints' option"))
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val contract = Option(options.get("contract")).getOrElse("")
    val ppe = Option(options.get("partitionsPerEndpoint")).map(_.toInt).getOrElse(1)
    require(ppe >= 1, s"partitionsPerEndpoint must be >= 1, got $ppe")
    // session timezone captured at plan time: executors must parse wire
    // timestamp text the way every Spark text source does — in the
    // SESSION zone, not the executor JVM's default (which can differ)
    val tz = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    new RpcScan(required, eps, contract, tz,
      pushed.toSeq.flatMap(RpcSource.encodeFilter), ppe)
  }
}

private[sources] class RpcScan(required: StructType,
    endpoints: Seq[String], contract: String, timeZone: String,
    wireFilters: Seq[String], partitionsPerEndpoint: Int = 1) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_rpc contract=$contract endpoints=${endpoints.size} " +
      s"filters=${wireFilters.size} ppe=$partitionsPerEndpoint"
  override def planInputPartitions(): Array[InputPartition] =
    endpoints.flatMap { ep =>
      val i = ep.lastIndexOf(':')
      val port = if (i > 0) scala.util.Try(ep.substring(i + 1).toInt).toOption else None
      port match {
        case Some(p) if p > 0 && p <= 65535 =>
          (0 until partitionsPerEndpoint).map(si =>
            RpcInputPartition(ep.substring(0, i), p, si, partitionsPerEndpoint): InputPartition)
        case _ => throw new IllegalArgumentException(
          s"rpc source: malformed endpoint '$ep' — expected host:port")
      }
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new RpcReaderFactory(required, contract, timeZone, wireFilters)
}

private[sources] case class RpcInputPartition(host: String, port: Int,
    sliceIdx: Int = 0, sliceN: Int = 1) extends InputPartition

private[sources] class RpcReaderFactory(required: StructType,
    contract: String, timeZone: String, wireFilters: Seq[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RpcInputPartition]
    new RpcPartitionReader(p.host, p.port, required, contract, timeZone, wireFilters,
      p.sliceIdx, p.sliceN)
  }
}

private[sources] class RpcPartitionReader(host: String, port: Int,
    required: StructType, contract: String, timeZone: String,
    wireFilters: Seq[String], sliceIdx: Int = 0, sliceN: Int = 1)
    extends PartitionReader[InternalRow] {
  private def ctx = s"rpc $host:$port contract '$contract'"

  private val socket = {
    val s = new Socket()
    s.connect(new InetSocketAddress(host, port), 10000)
    s.setSoTimeout(60000)
    s
  }
  @volatile private var eof = false
  // true once the service ACKED the slice request (`OK SLICE i/n`) — a
  // legacy service streams every row and this reader slices client-side
  @volatile private var serverSliced = false
  private val in = try {
    // the request carries the PROJECTED column list — pushdown to the
    // service; "-" asks for row markers only (count-style scans) — the
    // pushed filter conjuncts (rows the service drops never cross), and
    // the slice conjunct when this endpoint is split into N partitions
    val colsTok = if (required.fields.isEmpty) "-" else required.fields.map(_.name).mkString(",")
    val conjuncts = wireFilters ++
      (if (sliceN > 1) Seq(RpcSource.sliceConjunct(sliceIdx, sliceN)) else Nil)
    val filterTok = if (conjuncts.isEmpty) "" else conjuncts.mkString(" ", "\t", "")
    val os = socket.getOutputStream
    os.write(s"GET $contract $colsTok$filterTok\n".getBytes(StandardCharsets.UTF_8))
    os.flush()
    val r = new BufferedReader(new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
    r.readLine() match {
      case null => eof = true // legacy/empty service: no handshake, no rows
      case "OK" => ()
      case ok if ok.startsWith("OK SLICE ") => serverSliced = true
      case err if err.startsWith("ERR") =>
        throw new IllegalArgumentException(s"$ctx: service refused: ${err.stripPrefix("ERR").trim}")
      case other =>
        throw new IllegalArgumentException(s"$ctx: unexpected status line '$other'")
    }
    r
  } catch {
    // a handshake failure throws from the CONSTRUCTOR — Spark never gets
    // a reader instance to close(), so the connected socket would leak
    // (×4 task retries per failing partition)
    case e: Throwable =>
      try socket.close() catch { case _: Exception => () }
      throw e
  }
  private var row: InternalRow = _
  private var arrived = 0L // client-side slice counter (legacy services)

  override def next(): Boolean = {
    if (eof) false
    else {
      var line = in.readLine()
      if (sliceN > 1 && !serverSliced) {
        // legacy service: every arriving row is counted, this partition
        // keeps arrival-index ≡ sliceIdx (mod sliceN) — same assignment
        // a slicing service computes on its post-filter stream
        while (line != null && arrived % sliceN != sliceIdx) { arrived += 1; line = in.readLine() }
        if (line != null) arrived += 1
      }
      if (line == null) false
      else { row = parse(line); true }
    }
  }

  private def parse(line: String): InternalRow = try {
    if (required.fields.isEmpty) new GenericInternalRow(0)
    else {
      val parts = line.split("\t", -1)
      if (parts.length != required.fields.length) throw new IllegalArgumentException(
        s"${parts.length} fields on the wire, schema has ${required.fields.length}")
      val vals = new Array[Any](parts.length)
      var i = 0
      while (i < parts.length) {
        val raw = parts(i)
        vals(i) =
          if (raw == "\\N") null
          else {
            val s = RpcSource.unescapeField(raw)
            required.fields(i).dataType match {
              case LongType => s.toLong
              case IntegerType => s.toInt
              case DoubleType => s.toDouble
              case BooleanType => s.toBoolean
              case StringType => UTF8String.fromString(s)
              case TimestampType =>
                // parse in the captured SESSION timezone (java.sql.Timestamp
                // .valueOf would use the executor JVM's default zone)
                val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
                DateTimeUtils.instantToMicros(
                  ldt.atZone(java.time.ZoneId.of(timeZone)).toInstant)
              case dt => throw new IllegalArgumentException(
                s"unsupported field type $dt for '${required.fields(i).name}'")
            }
          }
        i += 1
      }
      new GenericInternalRow(vals)
    }
  } catch {
    case e: Exception => throw new IllegalArgumentException(
      s"$ctx: cannot parse wire line '$line' as (${required.fields.map(f =>
        s"${f.name} ${f.dataType.simpleString}").mkString(", ")}): ${e.getMessage}", e)
  }

  override def get(): InternalRow = row
  override def close(): Unit = try socket.close() catch { case _: Exception => () }
}
