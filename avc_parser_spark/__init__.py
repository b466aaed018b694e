"""avc_parser_spark — PySpark-native forensic log parse→enrich→route→aggregate engine.

A from-scratch Spark DataFrame rebuild of the capabilities of the reference
``pranlawate/avc-parser`` (a single-process SELinux AVC-denial forensic CLI),
re-expressed over a Common-Crawl-style web-page table
``pages(url, warc_ts, html, text, lang)`` designed for 10^12-document scale.

Layout
------
- ``session``     SparkSession factory tuned for the pipeline (AQE, Arrow).
- ``datagen``     deterministic synthetic ``pages`` generator (audit payloads
                  embedded in web text; seeded, reproducible).
- ``parse``       the vectorized grok/regex battery (pandas/Arrow UDF) —
                  reference semantics from parse_avc.py:329-1199.
- ``enrich``      broadcast-join lookup dims (errno, permission/class/port
                  descriptions, categorizers) — reference §2.4 static dicts.
- ``route``       parse-ok / malformed / quarantine fan-out routing.
- ``aggregate``   salted smart-signature aggregation + second-level aggs.
- ``analyzers``   cross-group findings rules (D1-D4, AN1-AN6).
- ``filters``     group-level filters (process/path/time/context/mls).
- ``sorts``       deterministic group orderings.
- ``checkpoint``  per-partition checkpoint/resume manifest with lineage.
- ``pipeline``    end-to-end composition.
- ``functions``   training-data-pipeline ops: dedup (exact/minhash/simhash),
                  similarity search, text analysis, multimodal plumbing.
"""

__version__ = "0.1.0"
