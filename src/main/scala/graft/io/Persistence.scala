package graft.io

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Model persistence (reference base.py:98-125 `Model.save` / `load`,
  * which pickles; here: plain JVM serialization plus a JSON surface for
  * the numeric models, so saved models are portable across sessions and
  * inspectable).
  *
  * All graft models are small driver-side case classes (O(d^2) doubles),
  * so persistence is a driver file write — cluster-side state never needs
  * saving. */
object Persistence {

  /** Save any serializable model. */
  def save(model: Serializable, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val out = new java.io.ObjectOutputStream(
      Files.newOutputStream(p, StandardOpenOption.CREATE,
        StandardOpenOption.TRUNCATE_EXISTING))
    try out.writeObject(model) finally out.close()
  }

  /** Load a previously saved model. */
  def load[T](path: String): T = {
    val in = new java.io.ObjectInputStream(Files.newInputStream(Paths.get(path)))
    try in.readObject().asInstanceOf[T] finally in.close()
  }

  // --------------------------------------------------------- JSON surface

  private def jArr(a: Array[Double]): String =
    a.mkString("[", ",", "]")

  /** KoopmanModel -> JSON (inspectable interchange format). */
  def koopmanToJson(m: graft.decomposition.KoopmanModel): String =
    s"""{"type":"KoopmanModel","tau":${m.tau},"d":${m.d},"k":${m.k},""" +
      s""""mean0":${jArr(m.mean0)},"meant":${jArr(m.meant)},""" +
      s""""singularValues":${jArr(m.singularValues)},"u":${jArr(m.u)},""" +
      s""""v":${jArr(m.v)}}"""

  def koopmanFromJson(json: String): graft.decomposition.KoopmanModel = {
    val fields = parseFlatJson(json)
    graft.decomposition.KoopmanModel(
      tau = fields("tau").toInt,
      mean0 = parseArr(fields("mean0")), meant = parseArr(fields("meant")),
      singularValues = parseArr(fields("singularValues")),
      u = parseArr(fields("u")),
      d = fields("d").toInt, k = fields("k").toInt,
      vOpt = fields.get("v").map(parseArr))
  }

  def clusterToJson(m: graft.clustering.ClusterModel): String =
    s"""{"type":"ClusterModel","centers":[${m.centers.map(jArr).mkString(",")}]}"""

  def clusterFromJson(json: String): graft.clustering.ClusterModel = {
    val inner = json.substring(json.indexOf("\"centers\":[") + 11, json.lastIndexOf("]}"))
    val centers =
      if (inner.trim.isEmpty) Array.empty[Array[Double]]
      else inner.split("(?<=\\]),(?=\\[)").map(parseArr)
    graft.clustering.ClusterModel(centers)
  }

  def saveJson(json: String, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, json)
  }

  def loadJson(path: String): String = Files.readString(Paths.get(path))

  // ------------------------------------------------------------- parsing

  /** Flat {"k":v,...} parser for the model JSON written above (numbers and
    * numeric arrays only). */
  private def parseFlatJson(json: String): Map[String, String] = {
    val body = json.trim.stripPrefix("{").stripSuffix("}")
    val out = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < body.length) {
      val kStart = body.indexOf('"', i)
      if (kStart < 0) { i = body.length }
      else {
        val kEnd = body.indexOf('"', kStart + 1)
        val key = body.substring(kStart + 1, kEnd)
        val colon = body.indexOf(':', kEnd)
        var vEnd = colon + 1
        if (body.charAt(colon + 1) == '[') {
          vEnd = body.indexOf(']', colon) + 1
        } else {
          vEnd = colon + 1
          while (vEnd < body.length && body.charAt(vEnd) != ',') vEnd += 1
        }
        val value = body.substring(colon + 1, vEnd).stripPrefix("\"").stripSuffix("\"")
        out(key) = value
        i = vEnd + 1
      }
    }
    out.toMap
  }

  private def parseArr(s: String): Array[Double] = {
    val inner = s.trim.stripPrefix("[").stripSuffix("]").trim
    if (inner.isEmpty) Array.empty else inner.split(",").map(_.trim.toDouble)
  }
}
