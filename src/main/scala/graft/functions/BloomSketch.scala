package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64

/** Column-API surface over Spark's OWN Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime bloom-filter join pruning, public Catalyst classes but
  * not registered as SQL functions). No new sketch implementation: the
  * engine reuses the battle-tested `org.apache.spark.util.sketch
  * .BloomFilter`, whose bits are a pure function of the inserted key set
  * (constant-seed xxhash64 family, merge = bitwise OR — order- and
  * partitioning-independent), so plans built on it stay deterministic.
  *
  * Both sides hash with `xxhash64` exactly as the runtime-filter rewrite
  * does: the aggregate ingests 64-bit hashes and the membership probe
  * hashes the same way — a caller passes the RAW key column to both
  * helpers and can never mismatch the hashing. */
object BloomSketch {

  /** Aggregate `keys` into one binary Bloom filter of `numBits` bits sized
    * for `expectedItems` distinct keys (bits/item ≈ 10 ⇒ ~1% false
    * positives). Partial-aggregates map-side like any
    * TypedImperativeAggregate; the merged filter is a single
    * `numBits / 8`-byte value. */
  def bloomAgg(keys: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(keys)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe: false ⇒ the key was DEFINITELY never inserted;
    * true ⇒ present or a false positive (confirm exactly downstream). */
  def mightContain(bloom: Column, key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bloom),
      GraftBridge.expression(xxhash64(key))))
}
