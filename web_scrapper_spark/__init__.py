"""web_scrapper_spark — a PySpark-native crawl/extraction/analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference scraper (``Abrsjh/Web-scrapper``, surveyed in /root/repo/SURVEY.md):

- ``minisoup``     — stdlib-only HTML DOM + CSS-selector engine (runs inside
                     Arrow-batched pandas UDFs; no bs4 dependency).
- ``textutils``    — text cleaning/keywords/summary/entities
                     (reference: src/webscraper/utils/text.py).
- ``validators``   — email/phone/url/date/... predicates
                     (reference: src/webscraper/utils/validators.py).
- ``urlutils``     — URL canonicalization + murmur3 hashing (engine-level).
- ``extract``      — selector-cascade extractors for product / business /
                     article pages (reference: src/webscraper/scrapers/*.py),
                     pure Python so the same code runs in Spark UDFs and in
                     the sequential parity oracle.
- ``frontier``     — partitioned URL frontier + seen-set (salted host keys,
                     bloom pre-filter + exact anti-join dedup, politeness
                     windows) over snapshot-committed parquet tables.
- ``crawl``        — checkpointed crawl epochs (dequeue → fetch-join →
                     parse/extract → dedup-merge), resumable from any
                     snapshot, plus a sequential reference-semantics
                     simulator used as the ordering/seen-set oracle.
- ``operators``    — distributed analytics: dedup (exact/minhash/simhash/
                     ngram-jaccard), similarity search, text analysis.
- ``sources``      — batch IO (csv/json/parquet), declarative select/where/
                     order/limit loader, format-conversion ETL.
"""

__version__ = "0.1.0"
