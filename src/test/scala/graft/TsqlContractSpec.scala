package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SqlServerDialect

/** Dialect-level contract for the generated T-SQL (S8/S11/S12): SQL
  * Server itself is unreachable from this container, so the statements
  * are round-tripped through a structural parser of the exact T-SQL
  * subset they use (MERGE with table hints; OBJECT_ID-guarded CREATE
  * TABLE). Unlike the string pins in JdbcPathSpec, this fails on any
  * SYNTACTICALLY invalid statement — unbalanced parens, a missing
  * mandatory semicolon, an INSERT/VALUES arity mismatch, a `src.X`
  * reference that the USING list never binds, a mis-typed keyword —
  * and it pins the ?-parameter ORDER to the ledger's setter order, so
  * a dialect regression can no longer hide behind editing a literal
  * and its pin together. */
object TsqlMiniParser {

  final case class Merge(target: String, hints: Seq[String],
      paramOrder: Seq[String], onCols: Seq[String],
      setCols: Seq[String], insertCols: Seq[String])

  final case class Ddl(guardedName: String, createdName: String,
      cols: Seq[(String, String, Boolean)], // (name, type, notNull)
      pk: Seq[String])

  final case class Insert(target: String, cols: Seq[String], nParams: Int)

  private def tokenize(sql: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    val s = sql
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == 'N' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
        val end = s.indexOf('\'', i + 2)
        require(end > 0, s"unterminated N-string at $i")
        buf += s.substring(i, end + 1); i = end + 1
      } else if (c == '\'') {
        val end = s.indexOf('\'', i + 1)
        require(end > 0, s"unterminated string at $i")
        buf += s.substring(i, end + 1); i = end + 1
      } else if (c == '"') {
        // T-SQL/ANSI quoted identifier — one token, quotes kept so
        // ident() can strip them
        val end = s.indexOf('"', i + 1)
        require(end > 0, s"unterminated quoted identifier at $i")
        buf += s.substring(i, end + 1); i = end + 1
      } else if (c.isLetter || c == '_') {
        val j = Iterator.from(i).find(k => k >= s.length ||
          !(s.charAt(k).isLetterOrDigit || s.charAt(k) == '_')).get
        buf += s.substring(i, j); i = j
      } else if (c.isDigit) {
        val j = Iterator.from(i).find(k => k >= s.length ||
          !s.charAt(k).isDigit).get
        buf += s.substring(i, j); i = j
      } else { buf += c.toString; i += 1 }
    }
    buf.toList
  }

  /** Recursive-descent over the token list; throws on any deviation. */
  private final class P(tokens: List[String]) {
    private var ts = tokens
    def peek: String = ts.headOption.getOrElse("<eof>")
    def next(): String = { val h = peek; require(ts.nonEmpty, "eof"); ts = ts.tail; h }
    def kw(w: String): Unit = {
      val t = next()
      require(t.equalsIgnoreCase(w), s"expected '$w', got '$t'")
    }
    def ident(): String = {
      val t = next()
      if (t.length > 2 && t.charAt(0) == '"' && t.last == '"') {
        val inner = t.substring(1, t.length - 1)
        require(inner.nonEmpty && !inner.contains('"'),
          s"malformed quoted identifier $t")
        inner
      } else {
        require(t.nonEmpty && (t.charAt(0).isLetter || t.charAt(0) == '_') &&
          !Reserved.contains(t.toUpperCase), s"expected identifier, got '$t'")
        t
      }
    }
    // dotted name: a.b or a
    def name(): String = {
      val first = ident()
      if (peek == ".") { next(); s"$first.${ident()}" } else first
    }
    def atEnd: Boolean = ts.isEmpty
  }

  private val Reserved = Set("MERGE", "INTO", "WITH", "AS", "USING",
    "SELECT", "ON", "AND", "WHEN", "MATCHED", "NOT", "THEN", "UPDATE",
    "SET", "INSERT", "VALUES", "IF", "IS", "NULL", "CREATE", "TABLE",
    "PRIMARY", "KEY")

  private val AllowedHints = Set("HOLDLOCK")
  private val AllowedTypes = Set("NVARCHAR", "DATETIME2")

  def parseMerge(sql: String): Merge = {
    val p = new P(tokenize(sql))
    p.kw("MERGE"); p.kw("INTO")
    val target = p.name()
    var hints = Seq.empty[String]
    if (p.peek.equalsIgnoreCase("WITH")) {
      p.kw("WITH"); p.kw("(")
      val h = scala.collection.mutable.Buffer.empty[String]
      h += p.ident()
      while (p.peek == ",") { p.next(); h += p.ident() }
      p.kw(")")
      hints = h.toSeq
      hints.foreach(x => require(AllowedHints.contains(x.toUpperCase),
        s"unknown table hint '$x'"))
    }
    p.kw("AS"); val tgtAlias = p.ident()
    p.kw("USING"); p.kw("("); p.kw("SELECT")
    val params = scala.collection.mutable.Buffer.empty[String]
    def selItem(): Unit = { p.kw("?"); p.kw("AS"); params += p.ident() }
    selItem()
    while (p.peek == ",") { p.next(); selItem() }
    p.kw(")"); p.kw("AS"); val srcAlias = p.ident()
    def qualCol(alias: String): String = {
      val n = p.name()
      require(n.startsWith(alias + "."),
        s"expected $alias-qualified column, got '$n'")
      val col = n.drop(alias.length + 1)
      col
    }
    def srcCol(): String = {
      val col = qualCol(srcAlias)
      require(params.contains(col),
        s"'$srcAlias.$col' not bound by the USING select list")
      col
    }
    p.kw("ON")
    val onCols = scala.collection.mutable.Buffer.empty[String]
    def onPred(): Unit = {
      val t = qualCol(tgtAlias); p.kw("="); val sc = srcCol()
      require(t == sc, s"ON compares $t to $sc — key drift")
      onCols += t
    }
    onPred()
    while (p.peek.equalsIgnoreCase("AND")) { p.next(); onPred() }
    p.kw("WHEN"); p.kw("MATCHED"); p.kw("THEN"); p.kw("UPDATE"); p.kw("SET")
    val setCols = scala.collection.mutable.Buffer.empty[String]
    def setItem(): Unit = {
      val c = p.ident(); p.kw("="); val sc = srcCol()
      require(c == sc, s"SET assigns $c from src.$sc — column drift")
      setCols += c
    }
    setItem()
    while (p.peek == ",") { p.next(); setItem() }
    p.kw("WHEN"); p.kw("NOT"); p.kw("MATCHED"); p.kw("THEN"); p.kw("INSERT")
    p.kw("(")
    val insCols = scala.collection.mutable.Buffer.empty[String]
    insCols += p.ident()
    while (p.peek == ",") { p.next(); insCols += p.ident() }
    p.kw(")"); p.kw("VALUES"); p.kw("(")
    val insVals = scala.collection.mutable.Buffer.empty[String]
    insVals += srcCol()
    while (p.peek == ",") { p.next(); insVals += srcCol() }
    p.kw(")")
    p.kw(";") // mandatory T-SQL MERGE terminator
    require(p.atEnd, s"trailing tokens after MERGE: '${p.peek}'")
    require(insCols.size == insVals.size,
      s"INSERT arity ${insCols.size} != VALUES arity ${insVals.size}")
    insCols.zip(insVals).foreach { case (c, v) =>
      require(c == v, s"INSERT column $c filled from src.$v — drift") }
    Merge(target, hints, params.toSeq, onCols.toSeq, setCols.toSeq,
      insCols.toSeq)
  }

  /** `INSERT INTO <table> (<col>[, <col>]*) VALUES (?[, ?]*)` — the
    * batched-insert shape of BOTH S8 writers: the statement Spark's
    * JDBC sink generates per batch (quoted identifiers) and the marker
    * ledger's portable fallback insert (bare identifiers). Rejects
    * duplicate columns, INSERT/VALUES arity mismatch, anything but `?`
    * parameters, and any trailing tokens. */
  def parseInsert(sql: String): Insert = {
    val p = new P(tokenize(sql))
    p.kw("INSERT"); p.kw("INTO")
    val target = p.name()
    p.kw("(")
    val cols = scala.collection.mutable.Buffer.empty[String]
    cols += p.ident()
    while (p.peek == ",") { p.next(); cols += p.ident() }
    p.kw(")"); p.kw("VALUES"); p.kw("(")
    var nParams = 0
    p.kw("?"); nParams += 1
    while (p.peek == ",") { p.next(); p.kw("?"); nParams += 1 }
    p.kw(")")
    require(p.atEnd, s"trailing tokens after INSERT: '${p.peek}'")
    require(cols.size == nParams,
      s"INSERT arity ${cols.size} != VALUES arity $nParams")
    require(cols.distinct.size == cols.size,
      s"duplicate INSERT columns: ${cols.mkString(",")}")
    Insert(target, cols.toSeq, nParams)
  }

  def parseDdl(sql: String): Ddl = {
    val p = new P(tokenize(sql))
    p.kw("IF"); p.kw("OBJECT_ID"); p.kw("(")
    val g = p.next()
    require(g.startsWith("N'") && g.endsWith("'"), s"guard name '$g'")
    val guarded = g.substring(2, g.length - 1)
    p.kw(","); val k = p.next()
    require(k.equalsIgnoreCase("N'U'"), s"OBJECT_ID kind '$k' != N'U'")
    p.kw(")"); p.kw("IS"); p.kw("NULL")
    p.kw("CREATE"); p.kw("TABLE")
    val created = p.name()
    p.kw("(")
    val cols = scala.collection.mutable.Buffer.empty[(String, String, Boolean)]
    val pk = scala.collection.mutable.Buffer.empty[String]
    var done = false
    while (!done) {
      if (p.peek.equalsIgnoreCase("PRIMARY")) {
        p.kw("PRIMARY"); p.kw("KEY"); p.kw("(")
        pk += p.ident()
        while (p.peek == ",") { p.next(); pk += p.ident() }
        p.kw(")")
      } else {
        val cname = p.ident()
        val ctype = p.ident()
        require(AllowedTypes.contains(ctype.toUpperCase),
          s"type '$ctype' outside the pinned T-SQL type set")
        if (p.peek == "(") { p.next(); p.next(); p.kw(")") } // length arg
        var notNull = false
        if (p.peek.equalsIgnoreCase("NOT")) {
          p.kw("NOT"); p.kw("NULL"); notNull = true
        }
        cols += ((cname, ctype, notNull))
      }
      if (p.peek == ",") p.next() else { p.kw(")"); done = true }
    }
    require(p.atEnd, s"trailing tokens after DDL: '${p.peek}'")
    val colNames = cols.map(_._1).toSet
    pk.foreach(c => require(colNames.contains(c),
      s"PRIMARY KEY column '$c' not declared"))
    pk.foreach(c => require(cols.find(_._1 == c).exists(_._3),
      s"PRIMARY KEY column '$c' not declared NOT NULL"))
    Ddl(guarded, created, cols.toSeq, pk.toSeq)
  }
}

class TsqlContractSpec extends AnyFunSuite {
  import TsqlMiniParser._

  private val merge = SqlServerDialect.markerMerge("ingestion_markers")
  private val ddl = SqlServerDialect.markerDdl("ingestion_markers")

  test("S11 MERGE parses; parameter order matches touch()'s setter order; keyed on the full triple") {
    val m = parseMerge(merge)
    assert(m.target == "ingestion_markers")
    assert(m.hints.map(_.toUpperCase) == Seq("HOLDLOCK"),
      "the race-free upsert contract requires HOLDLOCK")
    // JdbcMarkerLedger.touch binds ?1..?5 in exactly this order — the
    // ONE place the Scala setters and the SQL text must agree
    assert(m.paramOrder == Seq("ParquetSource", "TargetTable",
      "Environment", "BackupDate", "InsertedDate"))
    assert(m.onCols.toSet ==
      Set("ParquetSource", "Environment", "TargetTable"),
      "MERGE must key on the full ledger triple")
    assert(m.setCols.toSet == Set("BackupDate", "InsertedDate"))
    assert(m.insertCols.toSet == Set("ParquetSource", "TargetTable",
      "Environment", "BackupDate", "InsertedDate"))
  }

  test("S12 guarded DDL parses; guard names the created table; PK is the NOT NULL triple") {
    val d = parseDdl(ddl)
    assert(d.guardedName == d.createdName,
      "OBJECT_ID guard must name the table it creates")
    assert(d.pk.toSet == Set("ParquetSource", "Environment", "TargetTable"))
    assert(d.cols.map(_._1) == Seq("ParquetSource", "TargetTable",
      "Environment", "BackupDate", "InsertedDate"))
  }

  test("S8 batched INSERT round-trips the parser: Spark's generated statement AND the ledger's portable insert") {
    // the EXACT statement Spark's JDBC sink generates per executeBatch
    // round for the S8 SQL Server branch: same API
    // (JdbcUtils.getInsertStatement), same dialect resolution by URL
    import org.apache.spark.sql.types._
    val frame = StructType(Seq(
      StructField("ParquetSource", StringType),
      StructField("Environment", StringType),
      StructField("CIGCopyTime", StringType),
      StructField("CIGProcessed", StringType)))
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects
      .get("jdbc:sqlserver://host;databaseName=db")
    val sql = org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
      .getInsertStatement("raw.cig_target", frame, Some(frame),
        isCaseSensitive = false, dialect)
    val ins = parseInsert(sql)
    assert(ins.target == "raw.cig_target")
    assert(ins.cols == frame.fieldNames.toSeq,
      "generated column list must follow the cleaned frame's order")
    assert(ins.nParams == frame.size)
    // the portable marker insert (MarkerLedger fallback path) is the
    // same grammar with bare identifiers; its column order is the
    // setter order of the prepared statement
    val marker = "INSERT INTO ingestion_markers (ParquetSource, " +
      "TargetTable, Environment, BackupDate, InsertedDate) " +
      "VALUES (?,?,?,?,?)"
    val mi = parseInsert(marker)
    assert(mi.cols == Seq("ParquetSource", "TargetTable", "Environment",
      "BackupDate", "InsertedDate"))
    // negative controls: a syntactically-invalid column list fails
    def insFails(sql: String): Boolean =
      try { parseInsert(sql); false }
      catch { case _: IllegalArgumentException => true }
    assert(insFails(marker.replace("TargetTable,", "TargetTable,,")),
      "empty column slot")
    assert(insFails(marker.replace("(?,?,?,?,?)", "(?,?,?,?)")),
      "INSERT/VALUES arity mismatch")
    assert(insFails(marker.replace("Environment,", "Environment),")),
      "unbalanced parenthesis")
    assert(insFails(marker.replace("TargetTable", "ParquetSource")),
      "duplicate column")
    assert(insFails(marker + " ON CONFLICT"), "trailing tokens")
    assert(insFails(marker.replace("VALUES (?,", "VALUES (1,")),
      "literal where a bind parameter belongs")
  }

  test("negative controls: the parser actually rejects invalid T-SQL") {
    def fails(sql: String): Boolean =
      try { parseMerge(sql); false }
      catch { case _: IllegalArgumentException => true }
    assert(fails(merge.stripSuffix(";")), "missing mandatory semicolon")
    assert(fails(merge.replace("MATCHED", "MATCHD")), "keyword typo")
    assert(fails(merge.replaceFirst(", src\\.InsertedDate", "")),
      "INSERT/VALUES arity mismatch")
    assert(fails(merge.replace("src.BackupDate, src.InsertedDate)",
      "src.BackupDate, src.Missing)")), "unbound src column")
    assert(fails(merge.replace("HOLDLOCK", "NOLOCK")),
      "hint outside the pinned set")
    assert(fails(merge.replace("AS tgt", "AS tgt (")),
      "unbalanced parenthesis")
    def ddlFails(sql: String): Boolean =
      try { parseDdl(sql); false }
      catch { case _: IllegalArgumentException => true }
    assert(ddlFails(ddl.replace("N'U'", "N'V'")), "wrong OBJECT_ID kind")
    assert(ddlFails(ddl.replace("NVARCHAR(512) NOT NULL", "NVARCHAR(512)")),
      "PK column must be NOT NULL")
    assert(ddlFails(ddl.replace("DATETIME2", "DATETIME")),
      "type outside the pinned set")
  }
}
