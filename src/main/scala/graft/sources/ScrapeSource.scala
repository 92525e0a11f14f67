package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's rate-limited, batched scraping source re-expressed as a
  * distributed Spark connector (reference:
  * dags/custom_operators/SteamToS3Operator.py:42-119 — 100-id request
  * batching, 0.5 s/request rate limit, vanity-URL resolution, tolerance of
  * private/failed profiles).
  *
  * Design: the fetcher is an injectable, serializable strategy so the HTTP
  * client is swapped for a deterministic stub in tests (no egress here).
  * Ids are fetched with `mapPartitions`: each partition batches its ids
  * (batchSize per request, like the reference's 100-id GetPlayerSummaries
  * calls) and enforces a LOCAL rate budget (minIntervalMs between
  * requests). On a 1000-executor cluster the aggregate rate is
  * partitions x local rate, so the partition count is the cluster-wide
  * rate knob — exactly how a polite distributed scraper is throttled.
  * Failed ids are dropped, not fatal (the reference tolerates private
  * profiles the same way).
  */
object ScrapeSource {

  /** One fetched profile record. */
  case class Profile(profile_id: Long, name: String, visibility: Long,
      steam_level: Long, ok: Boolean)

  /** Injectable fetch strategy: one call = one batched "HTTP request". */
  trait ProfileFetcher extends Serializable {
    def fetchBatch(ids: Seq[Long]): Seq[Profile]
  }

  /** Deterministic stub standing in for the Steam Web API client: derives
    * profile fields from the id (and mirrors the reference's occasional
    * private-profile failures via ok=false for ids % 97 == 0). */
  class StubFetcher extends ProfileFetcher {
    def fetchBatch(ids: Seq[Long]): Seq[Profile] =
      ids.map { id =>
        Profile(id, s"player_$id", id % 3, id % 100, ok = id % 97 != 0)
      }
  }

  /** Retry decorator for any fetcher — the structural analog of the
    * reference's Airflow task retries (`retries=3` on the DAG's operators:
    * dags/rust_twitter_steam_pipeline.py), moved to where it belongs in a
    * distributed connector: around each BATCHED request, inside the
    * partition, so one flaky call retries alone instead of resubmitting a
    * whole Spark task (let alone a whole DAG task). Backoff doubles per
    * attempt; the final failure rethrows and normal Spark task retry takes
    * over as the outer safety net. */
  class RetryingFetcher(inner: ProfileFetcher, maxAttempts: Int = 3,
      initialBackoffMs: Long = 100L) extends ProfileFetcher {
    require(maxAttempts >= 1, s"need maxAttempts >= 1, got $maxAttempts")
    def fetchBatch(ids: Seq[Long]): Seq[Profile] = {
      var attempt = 1
      var backoff = initialBackoffMs
      while (true) {
        try return inner.fetchBatch(ids)
        catch {
          // NonFatal only: OutOfMemoryError / InterruptedException and
          // friends must propagate to Spark's task handling immediately —
          // retrying them would sleep through a fatal condition (and
          // swallow the interrupt flag on task kill)
          case scala.util.control.NonFatal(_) if attempt < maxAttempts =>
            Thread.sleep(backoff)
            backoff *= 2
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Injectable vanity-name resolution strategy (the reference's
    * ResolveVanityURL step: steamcommunity.com/id/<name> must be resolved
    * to a numeric id before the batched profile fetch —
    * reference: dags/custom_operators/SteamToS3Operator.py:42-78). */
  trait VanityResolver extends Serializable {
    def resolveBatch(names: Seq[String]): Map[String, Long]
  }

  /** Deterministic stub: vanity name -> stable positive 63-bit id. */
  class StubResolver extends VanityResolver {
    def resolveBatch(names: Seq[String]): Map[String, Long] =
      names.map(n => n -> (n.hashCode.toLong & Long.MaxValue)).toMap
  }

  /** Resolve profile URLs to numeric ids: numeric `/profiles/<id>` URLs
    * parse directly (pure Column regexp, codegen'd); vanity `/id/<name>`
    * URLs resolve through the injectable resolver in per-partition
    * batches. Output: (url, profile_id). Unresolvable rows drop, like the
    * reference's error tolerance. */
  def resolveProfileIds(urls: DataFrame, urlCol: String,
      resolver: VanityResolver, batchSize: Int = 100): DataFrame = {
    import urls.sparkSession.implicits._
    import graft.functions.{isVanityUrl, numericProfileId, vanityId}
    val u = col(urlCol)
    val numeric = urls
      .filter(!isVanityUrl(u) && numericProfileId(u) =!= "")
      .select(u.as("url"), numericProfileId(u).cast(LongType).as("profile_id"))
    val vanity = urls
      .filter(isVanityUrl(u) && vanityId(u) =!= "")
      .select(u.as("url"), vanityId(u).as("name"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val resolved = resolver.resolveBatch(batch.map(_._2))
          batch.flatMap { case (url, name) => resolved.get(name).map(url -> _) }
        }
      }
      .toDF("url", "profile_id")
    numeric.unionByName(vanity)
  }

  /** Scrape profiles for the ids in `idCol`. `minIntervalMs` is the
    * per-partition spacing between batched requests (reference: 0.5 s);
    * tests pass 0. */
  def scrape(ids: DataFrame, idCol: String, fetcher: ProfileFetcher,
      batchSize: Int = 100, minIntervalMs: Long = 0L): Dataset[Profile] = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast(LongType)).as[Long].mapPartitions { it =>
      var lastCall = 0L
      it.grouped(batchSize).flatMap { batch =>
        val now = System.nanoTime() / 1000000L
        val wait = lastCall + minIntervalMs - now
        if (wait > 0) Thread.sleep(wait)
        lastCall = System.nanoTime() / 1000000L
        fetcher.fetchBatch(batch)
      }
    }.filter(_.ok)
  }
}
