package graft.config

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Runtime configuration for the entregas ETL pipeline.
  *
  * Mirrors the reference's YAML contract (`/root/reference/config/config.yaml:1-19`,
  * validated at `/root/reference/notebooks/ETL_Entregas_Base.ipynb:152-231`):
  *
  *   - `paths`: raw CSV location + processed-output root
  *   - `params`: one `{country, start_date, end_date, proccess}` block per country;
  *     `proccess` (sic — the reference misspells it, we keep the key for config
  *     compatibility) is mutable run state written back after each country.
  *   - `delivery_types.routine` / `.bonus`: delivery-type code lists.
  *   - `unit_factors`: unit-code → multiplier map that compiles into a literal
  *     Spark map expression (the defining trick of the reference pipeline).
  *
  * The parser below is a deliberately tiny subset-of-YAML reader (the config is
  * the only consumer; no external deps resolve offline). It understands
  * two-space-indented mappings, block lists of scalars, and block lists of
  * mappings — exactly the shapes the reference config uses.
  */
final case class CountryParam(
    country: String,
    startDate: String,
    endDate: String,
    process: Boolean
)

final case class EtlConfig(
    rawCsv: String,
    outputRoot: String,
    params: List[CountryParam],
    routineTypes: List[String],
    bonusTypes: List[String],
    unitFactors: Map[String, Double]
) {
  /** All delivery-type codes considered valid (routine ∪ bonus). */
  def knownTypes: List[String] = routineTypes ++ bonusTypes
}

object EtlConfig {

  /** Parse + validate, reference semantics: fail fast before any Spark job
    * (`ETL_Entregas_Base.ipynb:157-231`). Returns all errors, not just the first.
    */
  def load(path: String): Either[List[String], EtlConfig] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Left(List(s"config file not found: $path"))
    else fromYaml(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  def fromYaml(text: String): Either[List[String], EtlConfig] = {
    val root = MiniYaml.parse(text)
    validate(root)
  }

  private def validate(root: MiniYaml.Node): Either[List[String], EtlConfig] = {
    val errs = scala.collection.mutable.ListBuffer.empty[String]

    def section(name: String): Option[MiniYaml.Node] = root match {
      case MiniYaml.MapNode(m) =>
        val r = m.get(name)
        if (r.isEmpty) errs += s"missing section: $name"
        r
      case _ => errs += "config root must be a mapping"; None
    }

    val paths = section("paths")
    val rawCsv = paths.flatMap(_.str("raw_csv"))
    val outputRoot = paths.flatMap(_.str("output_root"))
    if (paths.isDefined && rawCsv.isEmpty) errs += "paths.raw_csv missing"
    if (paths.isDefined && outputRoot.isEmpty) errs += "paths.output_root missing"

    // params: list of {country, start_date, end_date, proccess}
    val dateRe = """\d{4}-\d{2}-\d{2}""".r
    val params: List[CountryParam] = section("params") match {
      case Some(MiniYaml.ListNode(items)) =>
        items.zipWithIndex.flatMap { case (item, i) =>
          val country = item.str("country")
          val sd = item.str("start_date")
          val ed = item.str("end_date")
          val pr = item.str("proccess")
          if (country.isEmpty) errs += s"params[$i].country missing"
          for (d <- sd.toList ++ ed.toList if !dateRe.matches(d))
            errs += s"params[$i]: date '$d' not yyyy-MM-dd"
          pr match {
            case Some(v) if v != "YES" && v != "NO" =>
              errs += s"params[$i].proccess must be YES|NO, got '$v'"
            case None => errs += s"params[$i].proccess missing"
            case _ =>
          }
          for {
            c <- country; s <- sd; e <- ed; v <- pr
            if dateRe.matches(s) && dateRe.matches(e)
          } yield {
            if (s > e) errs += s"params[$i]: start_date $s > end_date $e"
            CountryParam(c, s, e, v == "YES")
          }
        }
      case Some(_) => errs += "params must be a list"; Nil
      case None    => Nil
    }

    def strList(parent: MiniYaml.Node, key: String): List[String] =
      parent match {
        case MiniYaml.MapNode(m) =>
          m.get(key) match {
            case Some(MiniYaml.ListNode(xs)) =>
              xs.collect { case MiniYaml.Scalar(s) => s }
            case _ => errs += s"delivery_types.$key must be a list"; Nil
          }
        case _ => Nil
      }

    val (routine, bonus) = section("delivery_types") match {
      case Some(dt) => (strList(dt, "routine"), strList(dt, "bonus"))
      case None     => (Nil, Nil)
    }
    // Reference checks routine/bonus overlap (`ETL_Entregas_Base.ipynb:186-195`).
    val overlap = routine.toSet intersect bonus.toSet
    if (overlap.nonEmpty)
      errs += s"delivery_types routine/bonus overlap: ${overlap.mkString(",")}"

    // unit_factors: numeric and > 0 (`ETL_Entregas_Base.ipynb:206-220`).
    val factors: Map[String, Double] = section("unit_factors") match {
      case Some(MiniYaml.MapNode(m)) =>
        m.flatMap {
          case (k, MiniYaml.Scalar(v)) =>
            v.toDoubleOption match {
              case Some(d) if d > 0 => Some(k -> d)
              case _ => errs += s"unit_factors.$k must be numeric > 0, got '$v'"; None
            }
          case (k, _) => errs += s"unit_factors.$k must be a scalar"; None
        }
      case Some(_) => errs += "unit_factors must be a mapping"; Map.empty[String, Double]
      case None    => Map.empty[String, Double]
    }

    if (errs.nonEmpty) Left(errs.toList)
    else
      Right(
        EtlConfig(rawCsv.get, outputRoot.get, params, routine, bonus, factors)
      )
  }

  /** Run-state write-back: set `proccess: 'YES'` for the given country and
    * atomically rewrite the file (reference `ETL_Entregas_Base.ipynb:552-558`;
    * we fix its non-atomic write with a temp-file rename, documented divergence).
    */
  def markProcessed(path: String, cfg: EtlConfig, country: String): EtlConfig = {
    val updated = cfg.copy(params = cfg.params.map { p =>
      if (p.country == country) p.copy(process = true) else p
    })
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, render(updated).getBytes(StandardCharsets.UTF_8))
    Files.move(
      tmp,
      Paths.get(path),
      StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE
    )
    updated
  }

  /** Render back to the reference's YAML layout. Empty collections render as
    * flow-style `[]` so render → parse is the identity even for degenerate
    * configs (a bare `key:` would read back as an empty scalar, not a list).
    */
  def render(cfg: EtlConfig): String = {
    val sb = new StringBuilder
    sb ++= "paths:\n"
    sb ++= s"  raw_csv: ${cfg.rawCsv}\n"
    sb ++= s"  output_root: ${cfg.outputRoot}\n"
    if (cfg.params.isEmpty) sb ++= "params: []\n"
    else {
      sb ++= "params:\n"
      cfg.params.foreach { p =>
        sb ++= s"- country: ${p.country}\n"
        sb ++= s"  start_date: '${p.startDate}'\n"
        sb ++= s"  end_date: '${p.endDate}'\n"
        sb ++= s"  proccess: '${if (p.process) "YES" else "NO"}'\n"
      }
    }
    sb ++= "delivery_types:\n"
    def lst(key: String, xs: List[String]): Unit =
      if (xs.isEmpty) sb ++= s"  $key: []\n"
      else { sb ++= s"  $key:\n"; xs.foreach(t => sb ++= s"  - $t\n") }
    lst("routine", cfg.routineTypes)
    lst("bonus", cfg.bonusTypes)
    if (cfg.unitFactors.isEmpty) sb ++= "unit_factors: {}\n"
    else {
      sb ++= "unit_factors:\n"
      cfg.unitFactors.foreach { case (k, v) =>
        val vs = if (v == v.floor && v.abs < 1e15) v.toLong.toString else v.toString
        sb ++= s"  $k: $vs\n"
      }
    }
    sb.result()
  }
}

/** Minimal YAML subset parser: indented mappings, block lists of scalars, and
  * block lists of flat mappings. Quotes stripped; comments (#) and blank lines
  * ignored. Sufficient for the reference config contract — NOT a general YAML
  * implementation.
  */
object MiniYaml {
  sealed trait Node {
    def str(key: String): Option[String] = this match {
      case MapNode(m) =>
        m.get(key).collect { case Scalar(s) => s }
      case _ => None
    }
  }
  final case class Scalar(value: String) extends Node
  final case class ListNode(items: List[Node]) extends Node
  final case class MapNode(entries: Map[String, Node]) extends Node

  private final case class Line(indent: Int, isItem: Boolean, content: String)

  def parse(text: String): Node = {
    // fail LOUDLY on the YAML features outside the subset: silently
    // mis-parsing an anchor or a second document into strange keys is the
    // failure mode a config parser must not have — a user bringing full
    // YAML gets told exactly what is unsupported instead of a wrong config
    text.split("\n", -1).map(_.trim).foreach { t =>
      if (t == "---" || t.startsWith("--- ") || t == "...")
        throw new IllegalArgumentException(
          s"MiniYaml: multi-document markers ('---'/'...') are not supported — " +
            "pass a single bare document (line: '" + t + "')")
    }
    val lines = text
      .split("\n", -1)
      .toList
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .map { raw =>
        val indent = raw.takeWhile(_ == ' ').length
        val body = raw.trim
        if (body.startsWith("- "))
          Line(indent, isItem = true, body.drop(2).trim)
        else if (body == "-") Line(indent, isItem = true, "")
        else Line(indent, isItem = false, body)
      }
    parseBlock(lines)._1
  }

  private def stripComment(s: String): String = {
    // YAML comments start only at line start or after whitespace — a '#'
    // embedded in a value (`/data/x#2024.csv`) is NOT a comment.
    var inS = false; var inD = false
    val b = new StringBuilder
    var i = 0
    var done = false
    while (i < s.length && !done) {
      val c = s.charAt(i)
      val afterWs = i == 0 || s.charAt(i - 1) == ' ' || s.charAt(i - 1) == '\t'
      c match {
        case '\'' if !inD => inS = !inS; b += c
        case '"' if !inS  => inD = !inD; b += c
        case '#' if !inS && !inD && afterWs => done = true
        case _ => b += c
      }
      i += 1
    }
    b.result()
  }

  /** Reject scalar syntax the subset would otherwise mis-read as a plain
    * string: unquoted `&anchor` / `*alias` references and block-scalar
    * headers (`|` / `>`). Quoted values pass — a quoted "*glob*" is a
    * legitimate string, and quoting is also the documented escape hatch.
    */
  private def rejectUnsupportedScalar(raw: String): Unit = {
    val t = raw.trim
    if (t.nonEmpty && (t.head == '&' || t.head == '*'))
      throw new IllegalArgumentException(
        s"MiniYaml: anchors/aliases are not supported (found '$t') — " +
          "inline the shared value, or quote it if a literal &/* string is meant")
    if (Set("|", "|-", "|+", ">", ">-", ">+").contains(t))
      throw new IllegalArgumentException(
        s"MiniYaml: block scalars ('$t') are not supported — use a quoted single-line value")
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '\'' && t.last == '\'') || (t.head == '"' && t.last == '"')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Parse a block starting at lines.head's indent; return (node, rest). */
  private def parseBlock(lines: List[Line]): (Node, List[Line]) =
    lines match {
      case Nil => (MapNode(Map.empty), Nil)
      case first :: _ if first.isItem => parseList(lines, first.indent)
      case first :: _                 => parseMap(lines, first.indent)
    }

  private def parseList(lines: List[Line], indent: Int): (Node, List[Line]) = {
    var rest = lines
    val items = scala.collection.mutable.ListBuffer.empty[Node]
    while (rest.nonEmpty && rest.head.isItem && rest.head.indent == indent) {
      val head = rest.head
      if (head.content.contains(": ") || head.content.endsWith(":")) {
        // list item that opens a mapping: "- key: value" + following deeper keys
        val inline = Line(indent + 2, isItem = false, head.content)
        var body = List(inline)
        rest = rest.tail
        while (rest.nonEmpty && !rest.head.isItem && rest.head.indent > indent) {
          body = body :+ Line(indent + 2, isItem = false, rest.head.content)
          rest = rest.tail
        }
        val (node, _) = parseMap(body, indent + 2)
        items += node
      } else {
        rejectUnsupportedScalar(head.content)
        items += Scalar(unquote(head.content))
        rest = rest.tail
      }
    }
    (ListNode(items.toList), rest)
  }

  private def parseMap(lines: List[Line], indent: Int): (Node, List[Line]) = {
    var rest = lines
    val entries = scala.collection.mutable.LinkedHashMap.empty[String, Node]
    while (rest.nonEmpty && !rest.head.isItem && rest.head.indent == indent) {
      val head = rest.head
      val ci = head.content.indexOf(':')
      if (ci < 0) { rest = rest.tail } // malformed; skip
      else {
        val key = unquote(head.content.substring(0, ci))
        if (key == "<<")
          throw new IllegalArgumentException(
            "MiniYaml: merge keys ('<<') are not supported — inline the shared mapping")
        val value = head.content.substring(ci + 1).trim
        rest = rest.tail
        if (value == "[]") entries(key) = ListNode(Nil)
        else if (value == "{}") entries(key) = MapNode(Map.empty)
        else if (value.nonEmpty) {
          rejectUnsupportedScalar(value)
          entries(key) = Scalar(unquote(value))
        }
        else {
          // nested block: next lines with greater indent (or list items at same/greater indent)
          if (
            rest.nonEmpty && (rest.head.indent > indent ||
              (rest.head.isItem && rest.head.indent >= indent))
          ) {
            val blockIndent =
              if (rest.head.isItem) rest.head.indent else rest.head.indent
            val (node, r2) =
              if (rest.head.isItem) parseList(rest, blockIndent)
              else parseMap(rest, blockIndent)
            entries(key) = node
            rest = r2
          } else entries(key) = Scalar("")
        }
      }
    }
    (MapNode(entries.toMap), rest)
  }
}
