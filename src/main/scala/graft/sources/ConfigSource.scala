package graft.sources

/** External config-store seam — the startup-fetch contract of the
  * reference (`KinesisExample.java:54-82`, `worker/lambda/app.py:9-39`):
  * both processes pull credentials and the sandbox flag from a parameter
  * store (AWS SSM) at startup — plain parameters read as-is, credentials
  * flagged `WithDecryption` — and rate/topology knobs from the
  * environment (`BATCH_SIZE`/`INTERVAL`, `app.py:42-45`).
  *
  * The engine-side abstraction is a single lookup trait keyed by the
  * reference's parameter PATHS (`/sfdc/username`, `/sfdc/sandbox/active`,
  * …) with the `secure` flag carried through, plus three bindings that
  * need no network:
  *
  *   - [[EnvConfigSource]] — the 12-factor binding; paths map to env
  *     names (`/sfdc/sandbox/active` → `SFDC_SANDBOX_ACTIVE`).
  *   - [[FileConfigSource]] — a `java.util.Properties` file keyed by the
  *     raw parameter paths (the local-dev / container-secret binding).
  *   - [[MapConfigSource]] — in-memory, for specs.
  *
  * The production SSM binding is the same trait over an `SsmClient`
  * (`get_parameter(Name = path, WithDecryption = secure)` per the
  * reference) — deployment config, deliberately not implemented here
  * (zero-egress build; no AWS SDK on the classpath).
  *
  * Layering: [[ConfigSource.chain]] resolves first-hit-wins, so
  * `chain(env, file)` gives the usual "env overrides the checked-in
  * file" behavior.
  */
trait ConfigSource {

  /** The value at `path`, or None if this source does not define it.
    * `secure = true` marks credential material (the reference's
    * `WithDecryption`): sources that distinguish at-rest encryption
    * decrypt on read; the in-process bindings treat it as metadata only
    * but MUST NOT log or echo values fetched with it. */
  def get(path: String, secure: Boolean = false): Option[String]

  /** `get` or die with the path named — the reference startup behavior
    * (a missing parameter fails the process before any subscribe). */
  final def require(path: String, secure: Boolean = false): String =
    get(path, secure).getOrElse(
      throw new IllegalArgumentException(s"missing config parameter: $path"))
}

object ConfigSource {

  /** First-hit-wins layering of `sources`. */
  def chain(sources: ConfigSource*): ConfigSource = new ConfigSource {
    def get(path: String, secure: Boolean): Option[String] =
      sources.iterator.flatMap(_.get(path, secure)).nextOption()
  }

  /** Parameter path → env-var name: strip the leading '/', upper-case,
    * non-alphanumerics → '_' (`/sfdc/sandbox/active` →
    * `SFDC_SANDBOX_ACTIVE`). */
  def envName(path: String): String =
    path.dropWhile(_ == '/').map(c => if (c.isLetterOrDigit) c.toUpper else '_')
}

/** Env binding; `env` is injectable so specs do not mutate the JVM
  * environment. */
final class EnvConfigSource(env: Map[String, String] = sys.env)
    extends ConfigSource {
  def get(path: String, secure: Boolean): Option[String] =
    env.get(ConfigSource.envName(path))
}

/** Properties-file binding, keys = raw parameter paths. Missing file ≡
  * empty source (so `chain(env, file)` works before the file exists). */
final class FileConfigSource(path: String) extends ConfigSource {
  private val props: java.util.Properties = {
    val p = new java.util.Properties()
    val f = new java.io.File(path)
    if (f.isFile) {
      val in = new java.io.FileInputStream(f)
      try p.load(new java.io.InputStreamReader(in, "UTF-8")) finally in.close()
    }
    p
  }
  def get(path: String, secure: Boolean): Option[String] =
    Option(props.getProperty(path))
}

/** In-memory binding for specs. */
final class MapConfigSource(m: Map[String, String]) extends ConfigSource {
  def get(path: String, secure: Boolean): Option[String] = m.get(path)
}

/** Resolved login material — what the reference's startup fetch actually
  * produces before handing off to the SOAP login (S7). */
final case class SfdcCredentials(
    domain: String, username: String, password: String, securityToken: String) {

  /** The reference concatenates password+token into the SOAP password
    * field (`KinesisExample.java`: `password + security_token`;
    * `simple_salesforce` does the same). */
  def soapPassword: String = password + securityToken

  /** Login URL the reference derives from the domain
    * (`https://<domain>.salesforce.com`). */
  def loginUrl: String = s"https://$domain.salesforce.com"
}

object SfdcCredentials {

  /** The reference's exact sandbox-branching fetch
    * (`KinesisExample.java:56-82` ≡ `app.py:12-25`): `/sfdc/sandbox/
    * active` selects the key namespace — "0" → production keys with the
    * fixed domain "login"; anything else → the sandbox keys including a
    * configurable domain. Credentials are fetched `secure = true`
    * (SSM `WithDecryption`), the flag and domain plain. */
  def resolve(cs: ConfigSource): SfdcCredentials = {
    val sandbox = cs.get("/sfdc/sandbox/active").exists(_ != "0")
    if (sandbox)
      SfdcCredentials(
        domain = cs.require("/sfdc/sandbox/domain"),
        username = cs.require("/sfdc/sandbox/username", secure = true),
        password = cs.require("/sfdc/sandbox/password", secure = true),
        securityToken = cs.require("/sfdc/sandbox/security_token", secure = true))
    else
      SfdcCredentials(
        domain = "login",
        username = cs.require("/sfdc/username", secure = true),
        password = cs.require("/sfdc/password", secure = true),
        securityToken = cs.require("/sfdc/security_token", secure = true))
  }
}
