package graft

/** Shared both-evaluation-modes harness for kernel parity specs: runs
  * `f` once with whole-stage codegen + codegen'd expressions forced ON
  * and once with both forced OFF (interpreted eval), restoring the
  * session confs afterwards — the two results compare bit-exactly in
  * the callers.
  */
trait CodegenModes { self: SparkTestBase =>
  def bothModes[T](f: => T): (T, T) = {
    val conf = spark.conf
    val ws = conf.get("spark.sql.codegen.wholeStage", "true")
    val fm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.wholeStage", "true")
      conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = f
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = f
      (gen, interp)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", ws)
      conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }
}
