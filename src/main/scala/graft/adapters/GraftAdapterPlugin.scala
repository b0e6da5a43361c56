package graft.adapters

import java.util.{Map => JMap}

import org.apache.spark.SparkContext
import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, PluginContext, SparkPlugin}

/** A class that registers custom adapters into [[Dispatch]] — the unit a
  * deployment names in `spark.plugins` config to extend the engine
  * without editing it. Must have a public no-arg constructor. */
trait AdapterRegistrar {
  def register(): Unit
}

/** Cluster-grade carrier for [[Dispatch.register]]: the registry is
  * per-JVM (exactly like the reference's module-level
  * `OCREngineFactory._engines` dict, which every Python worker
  * re-imports), so on a multi-executor cluster each executor JVM must run
  * the registrations before tasks dispatch spans. This plugin is the
  * standard Spark mechanism for that:
  *
  * {{{
  * spark-submit \
  *   --conf spark.plugins=graft.adapters.GraftAdapterPlugin \
  *   --conf spark.graft.adapterRegistrars=com.example.MyRegistrar ...
  * }}}
  *
  * `spark.graft.adapterRegistrars` is a comma-separated list of
  * [[AdapterRegistrar]] class names; each is instantiated reflectively
  * and invoked once per JVM — on the driver at context start and on
  * every executor (including ones added later by dynamic allocation)
  * before any task runs. A missing or non-registrar class fails fast
  * with a descriptive error, mirroring the factory's TypeError contract
  * (reference: src/simple_ocr/adapters/factory.py:102-126). */
class GraftAdapterPlugin extends SparkPlugin {

  override def driverPlugin(): DriverPlugin = new DriverPlugin {
    override def init(sc: SparkContext, ctx: PluginContext): JMap[String, String] = {
      GraftAdapterPlugin.runRegistrars(ctx.conf.get(GraftAdapterPlugin.ConfKey, ""))
      java.util.Collections.emptyMap()
    }
  }

  override def executorPlugin(): ExecutorPlugin = new ExecutorPlugin {
    override def init(ctx: PluginContext, extraConf: JMap[String, String]): Unit =
      GraftAdapterPlugin.runRegistrars(ctx.conf.get(GraftAdapterPlugin.ConfKey, ""))
  }
}

object GraftAdapterPlugin {
  val ConfKey = "spark.graft.adapterRegistrars"

  /** Instantiate + invoke each named registrar. Fails fast on unknown
    * classes and on classes that are not [[AdapterRegistrar]]s — a
    * misconfigured extension must abort startup, not silently dispatch
    * docs to the built-ins. */
  private[adapters] def runRegistrars(classNames: String): Unit =
    classNames.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      // context classloader first: registrars commonly ship per-job via
      // --jars (executor MutableURLClassLoader) while the engine jar sits
      // on the system classpath — plain Class.forName would miss them
      val loader = Option(Thread.currentThread().getContextClassLoader)
        .getOrElse(getClass.getClassLoader)
      val cls =
        try Class.forName(name, true, loader)
        catch {
          case e: ClassNotFoundException =>
            throw new IllegalArgumentException(
              s"$ConfKey names unknown class '$name'", e)
        }
      if (!classOf[AdapterRegistrar].isAssignableFrom(cls))
        throw new IllegalArgumentException(
          s"${cls.getName} must implement graft.adapters.AdapterRegistrar")
      cls.getDeclaredConstructor().newInstance()
        .asInstanceOf[AdapterRegistrar].register()
    }
}
