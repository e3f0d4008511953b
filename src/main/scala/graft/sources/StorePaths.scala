package graft.sources

/** One home for the md5-keyed temp-dir naming every persisted store's
  * `defaultPath` shares: `graft_<name>_<key12><suffix>` under the JVM
  * temp dir, where the key is the first 12 hex chars of the dataset
  * dir's MD5 — deterministic per (store, dataset, lifecycle), so
  * memoized build-once lifecycles land on the same path across calls
  * while distinct datasets and stores can never collide. Previously
  * copy-pasted per store; a drift between copies would silently key
  * two stores' lifecycles differently.
  */
object StorePaths {

  def datasetKey(datasetDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(datasetDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .take(12)

  def keyedTmp(name: String, datasetDir: String, suffix: String = ""): String =
    s"${sys.props("java.io.tmpdir")}/graft_${name}_${datasetKey(datasetDir)}$suffix"
}
