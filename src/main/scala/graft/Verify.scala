package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Second mode — `--invariance` (round-12 verdict #3, promoted from the
  * `run_verify_cpus.sh` + `compare_runs.py` shell ad-hocery into the
  * verified surface): re-dump the same queries under TWO different
  * parallelisms and compare the dumps BITWISE, one JSON row per query.
  * This is the load-bearing check for tiers where the DuckDB oracle CTE is
  * not payable on one box (sf10's 243 M-row dumps): a result that is
  * bit-identical under different shuffle partitionings cannot depend on
  * task scheduling, addition order across partitions, or limit
  * nondeterminism. Float columns compare by IEEE-754 BIT PATTERN
  * ([[graft.functions.GraftFunctions.doubleBits]]), so a
  * partition-dependent −0.0/+0.0 flip FAILS — the hole the round-12 advice
  * found in the old >200 k-row EXCEPT ALL path. NaNs canonicalize to one
  * pattern (doubleToLongBits), which is what a determinism check wants.
  *
  * {{{
  * graft.Verify <sfDir> <outDir> [q1,q2,...]              — oracle dump
  * graft.Verify --invariance <sfDir> <outBase> [q1,q2,...] — A/B re-dump +
  *   bitwise compare; parallelisms from SPARK_GRAFT_CPUS_AB (default
  *   "16,7"), record at <outBase>/invariance.json
  * }}}
  */
object Verify {

  /** JSON string-body escape: backslash, quote, and ALL control chars
    * (<0x20) — a stray control char in builder-authored SQL or an exception
    * message would otherwise make the driver's json.load fail (oracle mode)
    * or corrupt invariance.json (r13 advice: the error path escaped only
    * \n\r\t). Shared by both emitters. */
  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Code-point-safe prefix: `String.take(n)` can split a surrogate pair
    * mid-astral-char, leaving a lone surrogate that survives [[jsonEscape]]
    * unescaped and turns into '?' at UTF-8 encode time (r14 advice).
    * Truncating on code-point boundaries keeps every emitted char a
    * complete, escapable code point. */
  private def takeCodePoints(s: String, n: Int): String = {
    val cps = s.codePoints().limit(n).toArray
    new String(cps, 0, cps.length)
  }

  /** True when any leaf of `dt` is Float/Double — the nested types the
    * bitwise projection cannot yet reach element-wise. */
  private[graft] def containsFloat(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case DoubleType | FloatType => true
      case ArrayType(e, _) => containsFloat(e)
      case MapType(k, v, _) => containsFloat(k) || containsFloat(v)
      case s: StructType => s.fields.exists(f => containsFloat(f.dataType))
      case _ => false
    }

  private def session(cpus: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Same page-size pin as the Bench/TimeQ/Profile builders (r16,
      // verdict #1/#5): Verify previously inherited the engine's 64k AQE
      // floor WITHOUT the small-page pin — exactly the floor-alone
      // combination the r15 A/B measured 3-4× slower on the minhash
      // family. Engine.ensureInitialized now only applies the floor when
      // the pages are pinned, so this line both speeds Verify up and is
      // what arms the floor for it. Static conf, env-overridable.
      .config("spark.buffer.pageSize",
        sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "1m"))
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Dump each selected query's result to `outDir/<name>` as parquet.
    * Shared across the oracle mode and both invariance passes so the
    * invariance dumps are byte-for-byte the oracle-mode pipeline. */
  private def dump(spark: SparkSession, sfDir: String, outDir: String,
      only: Set[String]): Unit = {
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => only(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Between-query hygiene (see Bench): 117 queries in one session
      // otherwise accumulate checkpoint blocks until the run degrades.
      // Shared pipeline materializations are pinned and survive.
      graft.engine.Hygiene.sweep(spark)
    }
  }

  /** Every float-typed leaf projected through its IEEE-754 bit pattern
    * (arrays element-wise); other columns pass through. Struct/map-typed
    * outputs would need recursion — no query emits one (the schema check
    * below fails loudly if that ever changes rather than weakening the
    * compare silently). */
  private[graft] def bitwise(df: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.doubleBits
    val cols: Seq[Column] = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType => doubleBits(col(f.name)).as(f.name)
        case FloatType => doubleBits(col(f.name).cast(DoubleType)).as(f.name)
        case ArrayType(DoubleType, _) =>
          transform(col(f.name), x => doubleBits(x)).as(f.name)
        case ArrayType(FloatType, _) =>
          transform(col(f.name), x => doubleBits(x.cast(DoubleType))).as(f.name)
        // FLOAT-BEARING nesting (struct/map/array-of-array with a float
        // leaf) would pass through UNPROJECTED and let Spark's set-op float
        // normalization treat -0.0 == +0.0 inside the nesting — refuse
        // rather than silently weaken the gate (r13 advice). Float-free
        // nesting (e.g. array<array<string>>) is bit-exact under plain
        // equality and passes through, matching check_oracle_timed.py's
        // nested-FLOAT refusal rule (r14 advice).
        case dt @ (_: StructType | _: MapType | ArrayType(_: ArrayType, _) |
            ArrayType(_: StructType, _) | ArrayType(_: MapType, _))
            if containsFloat(dt) =>
          throw new IllegalArgumentException(
            s"invariance compare: column ${f.name} has float-bearing nested " +
              s"type ${f.dataType.simpleString} — extend bitwise() before " +
              "trusting it")
        case _ => col(f.name)
      }
    }.toSeq
    df.select(cols: _*)
  }

  private def invariance(sfDir: String, outBase: String, only: Set[String],
      cpusA: Int, cpusB: Int): Unit = {
    require(cpusA != cpusB, s"invariance needs two DIFFERENT parallelisms, got $cpusA,$cpusB")
    val (dirA, dirB) = (s"$outBase/cpus$cpusA", s"$outBase/cpus$cpusB")
    // Two dumps in two fresh sessions: partitioning differences must come
    // from the engine configuration, never from leftover session state.
    val sa = session(cpusA)
    dump(sa, sfDir, dirA, only); sa.stop()
    val sb = session(cpusB)
    dump(sb, sfDir, dirB, only); sb.stop()
    val spark = session(math.max(cpusA, cpusB))
    val rows = only.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      val row = try {
        val a = spark.read.parquet(s"$dirA/$name")
        val b = spark.read.parquet(s"$dirB/$name")
        val colsA = a.schema.fields.map(f => (f.name, f.dataType.simpleString)).sortBy(_._1)
        val colsB = b.schema.fields.map(f => (f.name, f.dataType.simpleString)).sortBy(_._1)
        if (!colsA.sameElements(colsB))
          s""""cols_match":false,"cols_a":"${colsA.mkString(";")}","cols_b":"${colsB.mkString(";")}""""
        else {
          val (na, nb) = (a.count(), b.count())
          if (na != nb) s""""cols_match":true,"rows_a":$na,"rows_b":$nb,"bitwise_match":false"""
          else {
            // Multiset equality, bitwise floats: equal counts + empty
            // symmetric EXCEPT ALL. Column order aligned by name so a
            // writer-side field reorder can't alias two columns.
            val names = a.columns.sorted
            val ba = bitwise(a.select(names.map(col): _*))
            val bb = bitwise(b.select(names.map(col): _*))
            val diff = ba.exceptAll(bb).count() + bb.exceptAll(ba).count()
            s""""cols_match":true,"rows_a":$na,"rows_b":$nb,""" +
              s""""diff_rows":$diff,"bitwise_match":${diff == 0L}"""
          }
        }
      } catch { case e: Throwable =>
        s""""error":"${jsonEscape(takeCodePoints(
          Option(e.getMessage).getOrElse(e.getClass.getName), 300))}""""
      }
      val sec = math.rint((System.nanoTime() - t0) / 1e9 * 10) / 10
      val line = s"""{"query":"$name",$row,"sec":$sec}"""
      println(line)
      line
    }
    val ok = rows.count(_.contains("\"bitwise_match\":true"))
    val record = s"""{"metric":"invariance","sf":"$sfDir","cpus":[$cpusA,$cpusB],""" +
      s""""pass":$ok,"total":${rows.size},"queries":[${rows.mkString(",")}]}"""
    Files.writeString(Paths.get(s"$outBase/invariance.json"), record)
    println(s"""{"metric":"invariance","pass":$ok,"total":${rows.size},""" +
      s""""record":"$outBase/invariance.json"}""")
    spark.stop()
    if (ok != rows.size) sys.exit(1)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--invariance")) {
      val Array(sfDir, outBase) = args.slice(1, 3)
      val only: Set[String] = args.drop(3).headOption
        .map(_.split(",").toSet).getOrElse(SparkEntry.queries.keySet)
      val unknown = only -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
      val ab = sys.env.getOrElse("SPARK_GRAFT_CPUS_AB", "16,7").split(",").map(_.trim.toInt)
      require(ab.length == 2, "SPARK_GRAFT_CPUS_AB must be 'A,B'")
      invariance(sfDir, outBase, only, ab(0), ab(1))
      return
    }
    // args: <sfDir> <outDir> [comma-separated query names — default all]
    val Array(sfDir, outDir) = args.take(2)
    val only: Set[String] = args.drop(2).headOption
      .map(_.split(",").toSet).getOrElse(SparkEntry.queries.keySet)
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = session(cpus.toInt)
    dump(spark, sfDir, outDir, only)
    def q(s: String): String = "\"" + jsonEscape(s) + "\""
    // Only the queries dumped THIS run go into oracle_sql.json — otherwise a
    // subset run into a reused outDir would let check_oracle validate STALE
    // parquet from an earlier dump as PASS.
    val json = SparkEntry.oracleSql.filter(kv => only(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
