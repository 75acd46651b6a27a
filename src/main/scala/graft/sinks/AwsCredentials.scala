package graft.sinks

/** K1/K2 credential selection — the reference's `getProvider`
  * (`kinesis/.../KinesisSink.scala:481-507`, same shape in
  * `sqs/.../SqsSink.scala`): the `aws { accessKey, secretKey }` pair is a
  * MODE selector, not always a key pair. Both "default" → the SDK default
  * provider chain; both "iam" → instance-profile credentials; both "env"
  * → the `AWS_ACCESS_KEY_ID`/`AWS_SECRET_ACCESS_KEY` env provider;
  * anything else → a static key pair. A half-set sentinel is a config
  * error with the reference's exact message.
  *
  * The mode RESOLUTION is pure (testable without the SDK); building the
  * actual `AwsCredentialsProvider` is reflection like the rest of the
  * [[AwsKinesisClient]]/[[AwsSqsClient]] binding, so this module compiles
  * and ships without the SDK jars yet names the genuine provider classes
  * wherever they are on the classpath.
  */
object AwsCredentials {

  sealed trait Mode
  /** `DefaultCredentialsProvider` — the SDK's env → profile → IMDS chain. */
  case object DefaultChain extends Mode
  /** `InstanceProfileCredentialsProvider` — IAM role via IMDS. */
  case object Iam extends Mode
  /** `EnvironmentVariableCredentialsProvider`. */
  case object Env extends Mode
  /** `StaticCredentialsProvider` over an explicit key pair. */
  final case class Static(accessKey: String, secretKey: String) extends Mode

  /** Reference `KinesisSink.scala:487-505` verbatim semantics, including
    * the mismatch error strings. */
  def mode(accessKey: String, secretKey: String): Either[String, Mode] =
    (accessKey, secretKey) match {
      case ("default", "default") => Right(DefaultChain)
      case (a, s) if a == "default" || s == "default" =>
        Left("accessKey and secretKey must both be set to 'default' or neither")
      case ("iam", "iam") => Right(Iam)
      case (a, s) if a == "iam" || s == "iam" =>
        Left("accessKey and secretKey must both be set to 'iam' or neither")
      case ("env", "env") => Right(Env)
      case (a, s) if a == "env" || s == "env" =>
        Left("accessKey and secretKey must both be set to 'env' or neither")
      case (a, s) => Right(Static(a, s))
    }

  /** Resolve a parsed sink config's aws block; a sentinel mismatch is an
    * `IllegalArgumentException` AT WIRING TIME (the reference's
    * `leftMap(new IllegalArgumentException(_))` — config errors surface
    * at startup, never mid-batch on an executor). */
  def modeFor(s: graft.operators.SinkSettings): Mode =
    mode(s.awsAccessKey, s.awsSecretKey)
      .fold(m => throw new IllegalArgumentException(m), identity)

  /** The SDK provider class each mode builds — the reflection target and
    * the spec's pure assertion surface. */
  def providerClass(m: Mode): String = m match {
    case DefaultChain =>
      "software.amazon.awssdk.auth.credentials.DefaultCredentialsProvider"
    case Iam =>
      "software.amazon.awssdk.auth.credentials.InstanceProfileCredentialsProvider"
    case Env =>
      "software.amazon.awssdk.auth.credentials.EnvironmentVariableCredentialsProvider"
    case _: Static =>
      "software.amazon.awssdk.auth.credentials.StaticCredentialsProvider"
  }

  private val BasicClass = "software.amazon.awssdk.auth.credentials.AwsBasicCredentials"
  private val ProviderIface = "software.amazon.awssdk.auth.credentials.AwsCredentialsProvider"

  /** Build the provider reflectively (reference provider construction,
    * `KinesisSink.scala:488-506`): builder().build() for the two chain
    * providers, `create()` for env, `create(AwsBasicCredentials)` for
    * static. Throws `ClassNotFoundException` when the SDK is absent —
    * same factory-time surfacing as the client binding. */
  def providerFor(m: Mode, cl: ClassLoader = getClass.getClassLoader): AnyRef = {
    val cls = Class.forName(providerClass(m), true, cl)
    m match {
      case DefaultChain | Iam =>
        val b = cls.getMethod("builder").invoke(null)
        b.getClass.getMethod("build").invoke(b)
      case Env => cls.getMethod("create").invoke(null)
      case Static(a, s) =>
        val basic = Class.forName(BasicClass, true, cl)
          .getMethod("create", classOf[String], classOf[String])
          .invoke(null, a, s)
        cls.getMethods
          .find(mm => mm.getName == "create" && mm.getParameterCount == 1)
          .getOrElse(throw new NoSuchMethodException("StaticCredentialsProvider.create"))
          .invoke(null, basic)
    }
  }

  /** Apply a mode to an SDK client builder
    * (`builder.credentialsProvider(provider)` — what the reference passes
    * into `KinesisClient.builder()`/`SqsClient.builder()`). DefaultChain
    * is ALSO set explicitly, matching the reference's explicit
    * `DefaultCredentialsProvider` rather than relying on the builder's
    * implicit default. Returns the builder for chaining. */
  def applyTo(builder: AnyRef, m: Mode): AnyRef = {
    val cl = builder.getClass.getClassLoader
    val iface = Class.forName(ProviderIface, true, cl)
    builder.getClass.getMethods
      .find(mm => mm.getName == "credentialsProvider" && mm.getParameterCount == 1 &&
        mm.getParameterTypes()(0).isAssignableFrom(iface))
      .getOrElse(throw new NoSuchMethodException("credentialsProvider(AwsCredentialsProvider)"))
      .invoke(builder, providerFor(m, cl))
    builder
  }

  /** R11: `builder.region(Region.of(r))` — what the reference sets from
    * the sink config's `region` key. No-op when the config has none. */
  def applyRegion(builder: AnyRef, region: Option[String]): AnyRef = {
    region.foreach { r =>
      val cl = builder.getClass.getClassLoader
      val regionCls = Class.forName("software.amazon.awssdk.regions.Region", true, cl)
      val regionObj = regionCls.getMethod("of", classOf[String]).invoke(null, r)
      builder.getClass.getMethods
        .find(mm => mm.getName == "region" && mm.getParameterCount == 1)
        .getOrElse(throw new NoSuchMethodException("region(Region)"))
        .invoke(builder, regionObj)
    }
    builder
  }

  /** R11: `builder.endpointOverride(URI)` — the reference passes its
    * derived endpoint (`SinkSettings.kinesisEndpoint`: customEndpoint or
    * the region default incl. the China partition) into the client
    * builder (`KinesisSink.scala:509-521` createKinesisClient). Only an
    * EXPLICIT `customEndpoint` is overridden here: with none configured
    * the SDK derives the same regional default itself. */
  def applyEndpoint(builder: AnyRef, endpoint: Option[String]): AnyRef = {
    endpoint.foreach { e =>
      builder.getClass.getMethods
        .find(mm => mm.getName == "endpointOverride" && mm.getParameterCount == 1)
        .getOrElse(throw new NoSuchMethodException("endpointOverride(URI)"))
        .invoke(builder, java.net.URI.create(e))
    }
    builder
  }
}
