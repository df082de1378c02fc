"""PySpark-native crawl frontier + fetch scheduler.

A from-scratch re-expression of the capabilities of
Cvoluj/scrapy-products-tracker (Scrapy + RabbitMQ + MySQL product
crawler) on the Spark DataFrame API:

- partitioned Bloom / cuckoo URL-seen set over canonicalized +
  murmur3-hashed URLs (vectorized pandas/Arrow UDFs),
- per-domain politeness scheduler (robots cache, crawl-delay,
  token-bucket budget) as salted ``groupBy().applyInPandas``,
- a priority-queue frontier materialized as a snapshot-committed
  table (Iceberg when the runtime jar is present; a Parquet+manifest
  fallback otherwise) ordered by (priority, depth, discovery-seq),
- image+caption payload rows ``(image_id, bytes, w, h, fmt, caption,
  phash)`` with a decoded-pixel PSNR >= 40 dB invariant.

See SURVEY.md for the operator-by-operator mapping to the reference.
"""

__version__ = "0.1.0"
