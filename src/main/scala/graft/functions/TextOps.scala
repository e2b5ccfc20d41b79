package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data-pipeline operators
  * (dedup, language ID, quality scoring, token counting). All built from
  * codegen'd built-ins / higher-order functions — no UDFs, so every
  * operator stays a narrow per-row map at any scale.
  */
object TextOps {

  /** Whitespace word tokens. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct 3-word shingles (the standard near-dup unit for text).
    * Guard: fewer than 3 words → empty set.
    *
    * Built from `zip_with` over three shifted slices so the lambda bodies
    * reference ONLY their lambda variables: an outer `element_at(w, i)`
    * inside a HOF lambda re-evaluates `w` (the whole split) per element —
    * O(tokens²) per document. The slices are plain per-row expressions,
    * evaluated once. */
  def shingles3(text: Column): Column = {
    val w = words(text)
    val n = greatest(size(w) - 2, lit(0))
    when(size(w) >= 3,
      array_distinct(zip_with(
        zip_with(slice(w, lit(1), n), slice(w, lit(2), n),
          (a, b) => concat_ws(" ", a, b)),
        slice(w, lit(3), n),
        (ab, c) => concat_ws(" ", ab, c))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two string-set columns (double).
    * Integer sizes divide exactly the same in Spark and DuckDB (`/` is
    * fractional division in both). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b))

  /** Murmur3-32 shingle hash widened to an unsigned long in [0, 2^32). */
  def unsignedHash(s: Column): Column =
    hash(s).cast("long").bitwiseAND(lit(0xFFFFFFFFL))

  /** Engine-portable 32-bit string hash: first 8 hex digits of md5,
    * parsed to a long in [0, 2^32). Slower than murmur3 (still one md5
    * per input) but identically computable in DuckDB
    * (`('0x' || substr(md5(s),1,8))::BIGINT`) — lets sketch-based
    * operators be oracle-checked end to end. */
  def portableHash(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** 60-bit engine-portable string hash: first 15 hex digits of md5.
    * 60 (not 64) so the value parses into a signed BIGINT identically in
    * Spark and DuckDB with headroom — the SimHash fingerprint built from
    * it stays non-negative, making shifts/masks portable too. */
  def portableHash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Second independent 60-bit portable hash: hex digits 17–31 of the
    * SAME md5 (disjoint from [[portableHash60]]'s 1–15). Pairing the two
    * gives a 120-bit key from one md5 evaluation — for keys that must be
    * collision-free in practice (span dedup election), where a single
    * 60-bit key's birthday bound at the 100 TB design point (~1e12
    * distinct spans → n²/2^61 ≈ 1e5 expected collisions) is not
    * acceptable but 120 bits (n²/2^121 ≈ 4e-13) is. */
  def portableHash60b(s: Column): Column =
    conv(substring(md5(s), 17, 15), 16, 10).cast("long")

  val minhashPrime = 4294967311L // smallest prime > 2^32

  /** The i-th MinHash permutation h_i(x) = ((2i+1)·x + i·K) mod p applied
    * to an unsigned-hash column. Used as k aggregate expressions
    * `min(permute(i, x))` after exploding shingles — the partial-agg form
    * keeps everything whole-stage-codegen'd and shuffles only k values per
    * document (Broder 1997 resemblance sketches). A nested higher-order
    * (transform-of-transform) form is a trap: Catalyst cannot CSE through
    * lambda scopes, so the inner hash re-evaluates k times per element. */
  def minhashPermute(i: Int, x: Column): Column =
    (x * (2 * i + 1) + lit(i.toLong * 2654435761L)) % lit(minhashPrime)

  /** LSH band keys for a MinHash signature: `bands` bands of `r` rows each;
    * two documents collide in a band iff that band of the signature is
    * identical. Returns array of "bandIdx:v1-v2-..-vr" strings. */
  def minhashBands(sig: Column, bands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat_ws(":", b, concat_ws("-", slice(sig, b * r + 1, lit(r)))))

  /** SimHash bit-i contribution (+1/-1) of a 64-bit token-hash column —
    * aggregated with sum() per document after exploding tokens
    * (Charikar 2002). Same partial-agg rationale as [[minhashPermute]]. */
  def simhashContrib(i: Int, h: Column): Column =
    when(h.bitwiseAND(lit(1L << i)) =!= 0L, 1).otherwise(-1)

  /** Pack 64 per-bit sign aggregates (columns b0..b63, >=0 means bit set)
    * into a single long fingerprint — distinct powers of two, no carries,
    * so plain addition assembles the bit pattern (incl. the sign bit). */
  def simhashPack(bit: Int => Column): Column =
    (0 until 64).map(i =>
      when(bit(i) >= 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)

  /** 60-bit variant of [[simhashPack]]: fingerprint stays non-negative,
    * so the same shifts/masks work unchanged in DuckDB (oracle parity). */
  def simhashPack60(bit: Int => Column): Column =
    (0 until 60).map(i =>
      when(bit(i) >= 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)

  /** SimHash LSH chunk keys over the packed long: `chunks` disjoint bit
    * ranges; any pair within hamming distance < chunks shares ≥1 chunk.
    * Scalar shifts/masks — whole-stage codegen'd. */
  def simhashChunkKeys(sim: Column, chunks: Int, bitsPer: Int): Column = {
    val mask = (1L << bitsPer) - 1
    array((0 until chunks).map(c =>
      concat_ws(":", lit(c),
        shiftrightunsigned(sim, c * bitsPer).bitwiseAND(lit(mask)))): _*)
  }

  /** Hamming distance between two packed 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
