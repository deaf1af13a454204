package graft.pipeline

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** A17 — secret/config resolution (SURVEY.md §2A), the analog of the
  * reference's chain (`sync-canvas-data-files.py:17-24`): credentials come
  * from a managed secret store when one is configured (`api_sm_id` →
  * Secrets Manager JSON blob), otherwise from plain environment variables.
  *
  * Here the "store" is a `java.util.Properties` file whose path is itself
  * configuration (constructor arg, or the `GRAFT_SECRETS_FILE` env var) —
  * mirroring the reference's pointer-selects-the-store shape: when the
  * pointer is set, the store wins for any name it defines; env is the
  * fallback. Dependency-free by design — a deployment swaps this class for
  * its vault client, keeping `get`/`required`.
  */
final class SecretConfig(
    env: Map[String, String] = sys.env,
    storeFile: Option[Path] = None) {

  private val store: Map[String, String] = {
    val pointer = storeFile.orElse(
      env.get(SecretConfig.StorePointerVar).map(Paths.get(_)))
    pointer.filter(Files.exists(_)).map { p =>
      val props = new java.util.Properties()
      val in = Files.newInputStream(p)
      try props.load(in) finally in.close()
      props.stringPropertyNames().asScala
        .map(k => k -> props.getProperty(k)).toMap
    }.getOrElse(Map.empty)
  }

  /** Store (when configured) first, env second — the reference's order. */
  def get(name: String): Option[String] = store.get(name).orElse(env.get(name))

  /** Like the reference's `os.environ['api_key']`: absence is an error. */
  def required(name: String): String = get(name).getOrElse(
    throw new NoSuchElementException(
      s"config '$name' not found in secret store or environment"))
}

object SecretConfig {
  /** Env var that points at the properties-file secret store (the
    * `api_sm_id` analog). */
  val StorePointerVar = "GRAFT_SECRETS_FILE"
}
