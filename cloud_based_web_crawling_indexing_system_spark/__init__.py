"""PySpark-native web-crawl frontier + fetch scheduler + indexer.

A from-scratch, Spark-first re-expression of the query and data-
processing capabilities of the reference system
(Seif-Yasser-Ahmed/Cloud-Based-Web-Crawling-Indexing-System, surveyed
in /root/repo/SURVEY.md).  The reference is a thread-per-URL
crawler/indexer over SQS + MySQL; this engine re-expresses each crawl
*round* as one set-oriented DataFrame job over a partitioned lake
table, with:

- frontier as a partitioned table (round scan = "pop", append = "push")
- URL-seen as bloom-shard broadcast pre-filter + exact left-anti join
- politeness as per-host token-bucket window ranks
- robots.txt parsed once per host, broadcast-joined
- HTML->text / link extraction / Porter stemming in vectorized
  pandas/Arrow UDFs (no per-row Python UDFs anywhere)
- per-round snapshot commits with per-partition lineage + metrics,
  resumable from the last committed round.
"""

__version__ = "0.1.0"
