package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic local scale-up of a driver testdata directory: build an
  * `sf × copies` dataset as `copies` KEY-SHIFTED, CONTENT-DECORRELATED
  * copies of the source tables, so the scale audit gets a third measured
  * decade without touching the read-only driver fixtures.
  *
  * `runMain graft.tools.ScaleUp <srcDir> <destDir> [copies=5]`
  * (idempotent: skips generation when destDir already holds a manifest
  * with the same source+copies).
  *
  * Construction, per copy c ∈ [0, copies) — c=0 is the identity copy:
  *   - every entity key (custkey, suppkey, partkey, orderkey, event_id,
  *     user_id, doc_id, vec_id) shifts by c·10⁷ — far above every source
  *     key and ≡ 0 mod 10/100, so foreign-key joins stay consistent per
  *     copy and the registered queries' doc_id-mod slices keep their
  *     proportions;
  *   - fixed dimensions (region, nation) are NOT replicated — exactly
  *     how a real 5× fact scale-up behaves;
  *   - document TEXT is token-remapped per copy BY HASH (v2): each
  *     whitespace token `t` in copy c maps to the same-length prefix of
  *     `md5(t#c)` — deterministic, so identical texts stay identical and
  *     token-level Jaccard overlaps are preserved within a copy, and
  *     LENGTH-preserving, so n_chars and char-level edit-distance
  *     structure survive; unlike v1's suffix remap (`tok` → `tokxc`),
  *     hash tokens from different copies share no character-level stems,
  *     so char-granular candidate generation (PassJoin segments, char
  *     shingles) cannot manufacture cross-copy collisions ∝ copies² —
  *     the superlinearity SCALEAUDIT_r15 adjudicated as a v1 artifact.
  *     The source vocab is ~31 tokens of length 1–8 (single-space
  *     separated, no tabs/newlines — verified), so md5-prefix collisions
  *     within a copy are negligible and the ' ' split is lossless.
  *     n_chars is recomputed (the source convention is
  *     n_chars == length(text));
  *   - embeddings get a per-copy deterministic DIMENSION PERMUTATION:
  *     norms and all within-copy distances/cosines are exactly
  *     preserved, cross-copy similarity decorrelates — the vector twin
  *     of the token remap;
  *   - timestamps/dates are unchanged: a 5× corpus over the same time
  *     span means 5× denser windows, which is the honest load shape for
  *     window/sessionization operators.
  */
object ScaleUp {
  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <destDir> [copies]")
    val src = args(0)
    val dest = args(1)
    val copies = if (args.length > 2) args(2).toInt else 5
    val manifest = java.nio.file.Paths.get(dest, "_SCALEUP_MANIFEST")
    val stamp = s"src=$src copies=$copies v=2"
    if (java.nio.file.Files.exists(manifest) &&
        java.nio.file.Files.readString(manifest).trim == stamp) {
      println(s"[scaleup] $dest already generated ($stamp) — skipping")
      return
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$dest/$name.parquet")
      println(s"[scaleup] wrote $name")
    }
    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** Union of `copies` transformed copies of `df`. */
    def replicate(df: DataFrame)(tx: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(c => tx(df, c)).reduce(_ unionByName _)

    def shift(c: Int)(col0: Column): Column = col0 + lit(c * Off)

    // fixed dimensions: copied verbatim, never replicated
    write(read("region"), "region")
    write(read("nation"), "nation")

    write(replicate(read("customer")) { (df, c) =>
      df.withColumn("c_custkey", shift(c)(col("c_custkey")))
    }, "customer")

    write(replicate(read("supplier")) { (df, c) =>
      df.withColumn("s_suppkey", shift(c)(col("s_suppkey")))
    }, "supplier")

    write(replicate(read("part")) { (df, c) =>
      df.withColumn("p_partkey", shift(c)(col("p_partkey")))
    }, "part")

    write(replicate(read("orders")) { (df, c) =>
      df.withColumn("o_orderkey", shift(c)(col("o_orderkey")))
        .withColumn("o_custkey", shift(c)(col("o_custkey")))
    }, "orders")

    write(replicate(read("lineitem")) { (df, c) =>
      df.withColumn("l_orderkey", shift(c)(col("l_orderkey")))
        .withColumn("l_partkey", shift(c)(col("l_partkey")))
        .withColumn("l_suppkey", shift(c)(col("l_suppkey")))
    }, "lineitem")

    write(replicate(read("events")) { (df, c) =>
      df.withColumn("event_id", shift(c)(col("event_id")))
        .withColumn("user_id", shift(c)(col("user_id")))
    }, "events")

    write(replicate(read("documents")) { (df, c) =>
      if (c == 0) df
      else {
        // v2 hash remap: token t → same-length prefix of md5(t#c). md5 is
        // 32 hex chars; repeat×3 covers any token ≤ 96 chars (source max 8).
        val remapped = array_join(
          transform(split(col("text"), " "),
            t => repeat(md5(concat(t, lit(s"#$c"))), 3).substr(lit(1), length(t))),
          " ")
        df.withColumn("doc_id", shift(c)(col("doc_id")))
          .withColumn("text", remapped)
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
    }, "documents")

    val dim = read("embeddings").select(size(col("embedding"))).head().getInt(0)
    write(replicate(read("embeddings")) { (df, c) =>
      if (c == 0) df
      else {
        val perm = new scala.util.Random(42 + c).shuffle((0 until dim).toVector)
        df.withColumn("vec_id", shift(c)(col("vec_id")))
          .withColumn("embedding",
            array(perm.map(p => element_at(col("embedding"), p + 1)): _*))
      }
    }, "embeddings")

    java.nio.file.Files.createDirectories(manifest.getParent)
    java.nio.file.Files.writeString(manifest, stamp + "\n")
    println(s"[scaleup] done: $dest ($stamp)")
    spark.stop()
  }
}
