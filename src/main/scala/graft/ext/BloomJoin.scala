package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: prune the PROBE side of a shuffle
  * join before any exchange, using a bit filter built from the build
  * side's keys.
  *
  * Where it sits in the join taxonomy: a broadcast join needs the build
  * ROWS to fit in memory; this needs only `bits/8` bytes however many
  * build keys there are (millions of keys -> a few hundred KB), so it
  * covers the gap between "small enough to broadcast" and "both sides
  * huge". At 100 TB the win is shuffle bytes: a probe row whose key
  * cannot match never leaves its input partition. False positives only
  * let extra rows through to the exact join that follows — results are
  * identical to the plain join by construction (no false negatives:
  * every build key sets all its k bits).
  *
  * Portability: positions come from md5 over the stringified key (the
  * repo-wide engine-portable draw), so the filter is deterministic
  * across runs, partitionings, and engines.
  */
object BloomJoin {

  /** The k bit positions for one key. One md5 carries 128 bits — four
    * independent 32-bit chunks — so up to 4 probes cost a SINGLE hash
    * per row (the per-row work on the 100 TB probe scan); beyond 4, each
    * extra group of 4 salts one more md5. Shared with the Warehouse
    * per-file bloom manifest, whose driver-side membership test
    * ([[positionsLocal]]) must stay bit-identical to this column form. */
  private[graft] def positions(key: Column, bits: Int, k: Int): Seq[Column] =
    (0 until k).map { i =>
      val h =
        if (i < 4) md5(key.cast("string"))
        else md5(concat(key.cast("string"), lit(":" + (i / 4))))
      conv(substring(h, 1 + 8 * (i % 4), 8), 16, 10).cast("long") % bits
    }

  /** Driver-side twin of [[positions]] for a single already-stringified
    * key: same md5 → four 32-bit chunks → `% bits` pipeline, evaluated
    * in plain JVM code. Used where one value must be tested against a
    * packed filter without spinning up a plan (the Warehouse file-skip
    * manifest). The caller is responsible for passing the SAME string
    * Spark's `CAST(key AS STRING)` would produce (Long/Int/String are
    * safe; floating-point formatting differs between engines). */
  private[graft] def positionsLocal(key: String, bits: Int, k: Int): Seq[Long] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until k).map { i =>
      val h = if (i < 4) md5hex(key) else md5hex(key + ":" + (i / 4))
      val off = 8 * (i % 4)
      java.lang.Long.parseLong(h.substring(off, off + 8), 16) % bits
    }
  }

  /** Membership test against a packed word array built by the same
    * positions pipeline: true iff all k bits are set (maybe-present;
    * false = provably absent). */
  private[graft] def mightContain(key: String, words: Array[Long],
      bits: Int, k: Int): Boolean =
    positionsLocal(key, bits, k).forall { p =>
      (words((p / 64).toInt) >> (p % 64).toInt & 1L) == 1L
    }

  /** Build the packed filter: one distributed aggregation folds every
    * key's bit positions into `bits/64` OR-combined words; only that
    * fixed-size word table (bounded by `bits`, NOT by build row count)
    * ever reaches the driver. */
  def buildFilter(build: DataFrame, keyCol: String, bits: Int,
      k: Int): Array[Long] = {
    require(bits > 0 && bits % 64 == 0 && bits <= (1 << 30),
      s"bits must be a positive multiple of 64 up to 2^30 (32-bit position chunks), got $bits")
    require(k > 0, s"need k > 0 hash probes, got $k")
    val words = build
      .select(explode(array(positions(col(keyCol), bits, k): _*)).as("p"))
      .select((col("p") / 64).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("m"))
      .collect()
    val arr = new Array[Long](bits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Filter `probe` to rows whose key passes the filter — pure codegen
    * arithmetic against a literal word array, no shuffle, sits directly
    * above the scan so pruned rows never reach the join exchange. */
  def pruneProbe(probe: DataFrame, keyCol: String, words: Array[Long],
      bits: Int, k: Int): DataFrame = {
    require(words.length == bits / 64, s"filter has ${words.length} words, expected ${bits / 64}")
    val wlit = lit(words)
    val checks = positions(col(keyCol), bits, k).map { p =>
      call_function("getbit",
        element_at(wlit, (p / 64).cast("int") + 1),
        (p % 64).cast("int")) === 1
    }
    probe.filter(checks.reduce(_ && _))
  }

  /** Bloom-pruned inner equi-join: build the filter from `build`'s keys,
    * prune `probe`, then the exact join — the result equals
    * `probe.join(build, probeKey === buildKey)` row for row. */
  def join(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String, bits: Int = 1 << 20, k: Int = 4): DataFrame = {
    val words = buildFilter(build, buildKey, bits, k)
    pruneProbe(probe, probeKey, words, bits, k)
      .join(build, col(probeKey) === col(buildKey))
  }
}
