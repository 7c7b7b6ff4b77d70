package graft.config

import graft.engine.ProjectSpec
import graft.model.ProjectConfig

/** P17 — declarative project configuration (reference
  * pyspider-master/pyspider/libs/read_project_config.py:55-160 reads INI
  * sections into per-project dicts; conf/config.ini carries one section per
  * project). This parser covers the engine-facing keys; handler `spider`
  * scripts become compiled callbacks referenced by name (SURVEY §2.8 —
  * no dynamic code loading).
  *
  * Key mapping (reference name → engine field):
  *   rate, burst                 → ProjectConfig.rate/burst (defaults 3/30,
  *                                 read_project_config.py:77-80)
  *   depth_limit                 → depthLimit (-1 = unlimited)
  *   domain                      → allowDomains (comma list)
  *   list_url_black_pattern      → denyPattern (comma list → alternation)
  *   save_html                   → saveHtml (1/0)
  *   inqueue_limit               → inqueueLimit
  *   respect_robots              → respectRobots (engine-only knob; 1/0)
  *   seeds                       → ProjectSpec.seeds (comma list; the
  *                                 reference's seed_path file is one url per
  *                                 line — pass its contents here)
  *   callback                    → ProjectSpec.seedCallback
  *   every                       → ProjectSpec.cronEverySec (@every secs)
  */
object ProjectIni {

  /** Parse INI text into (section → key → value). `;`/`#` start comments;
    * keys/values are trimmed; later duplicate keys win (ConfigParser). */
  def parseIni(text: String): Seq[(String, Map[String, String])] = {
    val sections = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var current: Option[String] = None
    text.split("\n", -1).foreach { line0 =>
      val line = line0.trim
      if (line.nonEmpty && !line.startsWith(";") && !line.startsWith("#")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          val name = line.substring(1, line.length - 1).trim
          current = Some(name)
          sections.getOrElseUpdate(name,
            scala.collection.mutable.LinkedHashMap.empty)
        } else {
          val eq = line.indexOf('=')
          if (eq > 0) current.foreach { s =>
            sections(s).put(line.substring(0, eq).trim,
              line.substring(eq + 1).trim)
          }
        }
      }
    }
    sections.toSeq.map { case (k, v) => (k, v.toMap) }
  }

  private def commaList(v: String): Seq[String] =
    v.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** `xpath = {"url_regex": {"field": "//xpath", ...}, ...}` — the
    * reference's JSON value verbatim (read_project_config.py:146-150). */
  private def parseXpathJson(s: String): Map[String, Map[String, String]] = {
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(s) match {
      case JObject(pats) => pats.map {
        case (p, JObject(fs)) =>
          p -> fs.collect { case (f, JString(x)) => f -> x }.toMap
        case (p, _) => p -> Map.empty[String, String]
      }.toMap
      case _ => Map.empty
    }
  }

  def specOf(name: String, kv: Map[String, String]): ProjectSpec = {
    def d(k: String, default: Double) = kv.get(k).map(_.toDouble).getOrElse(default)
    def i(k: String, default: Int) = kv.get(k).map(_.toInt).getOrElse(default)
    def b(k: String, default: Boolean) =
      kv.get(k).map(v => v == "1" || v.equalsIgnoreCase("true")).getOrElse(default)
    val deny = kv.get("list_url_black_pattern")
      .map(v => commaList(v).map(p => s"(?:$p)").mkString("|"))
      .filter(_.nonEmpty).orNull
    // P8 — config-driven xpath extraction: an `xpath` JSON value compiles to
    // an XpathSpider registered under `callback` (default "xpath_page")
    val xpathMap = kv.get("xpath").map(parseXpathJson).getOrElse(Map.empty)
    val xpathCb =
      if (xpathMap.isEmpty) None
      else Some(kv.getOrElse("callback", "xpath_page"))
    val callbacks: Map[String, graft.process.Handler] = xpathCb match {
      case Some(cb) => Map(cb -> new graft.process.XpathSpider(cb, xpathMap,
        kv.get("base_url_pattern").map(commaList).getOrElse(Nil),
        follow = b("follow", default = true)))
      case None => Map.empty
    }
    ProjectSpec(
      config = ProjectConfig(
        name = name,
        rate = d("rate", 3.0), // reference default when unset/0
        burst = d("burst", 30.0),
        depthLimit = i("depth_limit", -1),
        allowDomains = kv.get("domain").map(commaList).getOrElse(Nil),
        denyPattern = deny,
        saveHtml = b("save_html", default = false),
        inqueueLimit = i("inqueue_limit", 0),
        respectRobots = b("respect_robots", default = true)),
      seeds = kv.get("seeds").map(commaList).getOrElse(Nil),
      seedCallback = kv.getOrElse("callback", xpathCb.getOrElse("bfs_page")),
      cronEverySec = kv.get("every").map(_.toLong).getOrElse(0L),
      callbacks = callbacks)
  }

  /** INI text → one ProjectSpec per section. */
  def parse(text: String): Seq[ProjectSpec] =
    parseIni(text).map { case (name, kv) => specOf(name, kv) }
}
