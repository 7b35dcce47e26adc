package graft.keyed

import scala.util.hashing.MurmurHash3

/** Worker-assignment partitioners — Spark-native re-expression of
  * malstrom-core/src/keyed/partitioners.rs.
  *
  * Inside a Spark job, key→partition routing is owned by the shuffle
  * (HashPartitioning from `repartition(keys)`), so these functions are NOT
  * on the data path. They exist for the places malstrom uses them
  * OUTSIDE the exchange: routing topics/files/shards to a changing set of
  * consumers (e.g. assigning Kafka-shim partitions to streaming queries),
  * where rendezvous hashing minimizes movement when membership changes.
  */
object Partitioners {

  /** Rendezvous (highest-random-weight) hashing: pick the option with the
    * highest hash(key, option). When the option set changes by one
    * element, only ~1/n of keys move (partitioners.rs `rendezvous_select`,
    * with a stable hash instead of Rust's unstable DefaultHasher). */
  def rendezvousSelect[T](key: String, options: Seq[T]): T = {
    require(options.nonEmpty, "rendezvousSelect of empty options")
    options.maxBy(o => MurmurHash3.stringHash(s"$key|${o.toString}"))
  }

  /** Modulo assignment (partitioners.rs `index_select`): fast, but a
    * membership change reshuffles almost every key. */
  def indexSelect[T](i: Long, options: Seq[T]): T = {
    require(options.nonEmpty, "indexSelect of empty options")
    options(((i % options.size) + options.size).toInt % options.size)
  }
}
