package graft.core

/** Declarative pipeline spec (reference: `bin/cfg.yaml` interpreted
  * piecemeal by yq calls in `bin/fetcher.bash:18,56,132,147,150,167`).
  *
  * We parse the whole config once into typed case classes instead of
  * re-querying it per stage. The shape:
  *
  * {{{
  * fetch:
  *   <group>:
  *     <bucket>:
  *       include: [<regex>, ...]
  * compress:
  *   <compressor>:
  *     include: [<table-name-regex>, ...]
  *     components:
  *       <component>:            # optional subst map
  *         subst: {<col>: <expr>, ...}
  * components:
  *   <component>: [<col>, ...]
  * }}}
  *
  * The parser is a deliberately tiny YAML *subset* (indentation maps,
  * `- ` lists, scalars, quoted strings, comments) — enough for this spec
  * shape with zero external dependencies.
  */
object Config {

  final case class FetchSpec(include: Seq[String])
  final case class CompressorSpec(include: Seq[String],
                                  components: Map[String, Map[String, String]],
                                  componentOrder: Seq[String])
  final case class PipelineSpec(
      fetch: Map[String, Map[String, FetchSpec]],
      compress: Map[String, CompressorSpec],
      compressOrder: Seq[String],
      components: Map[String, Seq[String]])

  // ---- minimal YAML-subset document model ----
  sealed trait Node
  final case class YMap(entries: Seq[(String, Node)]) extends Node {
    def apply(k: String): Option[Node] = entries.collectFirst { case (`k`, v) => v }
  }
  final case class YList(items: Seq[Node]) extends Node
  final case class YStr(value: String) extends Node

  def parseYaml(text: String): YMap = {
    // Strip comments/blank lines, keep (indent, content).
    val lines = text.linesIterator.toVector
      .map { l =>
        val noComment =
          if (l.trim.startsWith("#")) ""
          else l.replaceAll("""\s+#.*$""", "")
        noComment
      }
      .filter(_.trim.nonEmpty)
      .map { l => (l.takeWhile(_ == ' ').length, l.trim) }

    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 &&
          ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t
    }

    // Recursive descent over the indentation structure.
    def parseBlock(from: Int, indent: Int): (Node, Int) = {
      if (from >= lines.length) return (YMap(Nil), from)
      val (_, first) = lines(from)
      if (first.startsWith("- ") || first == "-") {
        var i = from
        val items = Seq.newBuilder[Node]
        while (i < lines.length && lines(i)._1 == indent && lines(i)._2.startsWith("-")) {
          items += YStr(unquote(lines(i)._2.drop(1).trim))
          i += 1
        }
        (YList(items.result()), i)
      } else {
        var i = from
        val entries = Seq.newBuilder[(String, Node)]
        while (i < lines.length && lines(i)._1 == indent && !lines(i)._2.startsWith("-")) {
          val line = lines(i)._2
          val colon = line.indexOf(':')
          require(colon > 0, s"expected 'key:' line, got: $line")
          val key = unquote(line.substring(0, colon))
          val rest = line.substring(colon + 1).trim
          if (rest.nonEmpty) {
            entries += key -> YStr(unquote(rest))
            i += 1
          } else if (i + 1 < lines.length && lines(i + 1)._1 > indent) {
            val (child, next) = parseBlock(i + 1, lines(i + 1)._1)
            entries += key -> child
            i = next
          } else {
            entries += key -> YMap(Nil) // bare key with no value/children
            i += 1
          }
        }
        (YMap(entries.result()), i)
      }
    }

    parseBlock(0, if (lines.nonEmpty) lines(0)._1 else 0)._1 match {
      case m: YMap => m
      case other   => YMap(Seq("root" -> other))
    }
  }

  private def strings(n: Option[Node]): Seq[String] = n match {
    case Some(YList(items)) => items.collect { case YStr(s) => s }
    case Some(YStr(s))      => Seq(s)
    case _                  => Nil
  }

  private def strMap(n: Option[Node]): Map[String, String] = n match {
    case Some(YMap(entries)) =>
      entries.collect { case (k, YStr(v)) => k -> v }.toMap
    case _ => Map.empty
  }

  /** Typed extraction of the full pipeline spec. */
  def parse(text: String): PipelineSpec = {
    val root = parseYaml(text)

    val fetch: Map[String, Map[String, FetchSpec]] = root("fetch") match {
      case Some(YMap(groups)) =>
        groups.map { case (g, node) =>
          val buckets = node match {
            case YMap(bs) => bs.map { case (b, spec) =>
              val inc = spec match {
                case m: YMap => strings(m("include"))
                case _       => Nil
              }
              b -> FetchSpec(inc)
            }.toMap
            case _ => Map.empty[String, FetchSpec]
          }
          g -> buckets
        }.toMap
      case _ => Map.empty
    }

    val (compress, order) = root("compress") match {
      case Some(YMap(cs)) =>
        val pairs = cs.map { case (name, node) =>
          val (inc, comps, compOrder) = node match {
            case m: YMap =>
              val componentsNode = m("components")
              val (cmap, corder) = componentsNode match {
                case Some(YMap(centries)) =>
                  val cm = centries.map { case (cname, cnode) =>
                    val subst = cnode match {
                      case cm2: YMap => strMap(cm2("subst"))
                      case _         => Map.empty[String, String]
                    }
                    cname -> subst
                  }
                  (cm.toMap, centries.map(_._1))
                case _ => (Map.empty[String, Map[String, String]], Nil)
              }
              (strings(m("include")), cmap, corder)
            case _ => (Nil, Map.empty[String, Map[String, String]], Nil)
          }
          name -> CompressorSpec(inc, comps, compOrder)
        }
        (pairs.toMap, cs.map(_._1))
      case _ => (Map.empty[String, CompressorSpec], Nil)
    }

    val components: Map[String, Seq[String]] = root("components") match {
      case Some(YMap(cs)) => cs.map { case (k, v) => k -> strings(Some(v)) }.toMap
      case _              => Map.empty
    }

    PipelineSpec(fetch, compress, order, components)
  }
}
