"""PySpark-native full-text inverted-index build + BM25 taxonomy engine.

A from-scratch re-expression of the query/data semantics of
``nationalarchives/ds-discovery-opensearch-taxonomy`` (C#/.NET, Lucene.NET +
OpenSearch) on top of the Apache Spark DataFrame API:

* analyzer chains (classic tokenizer + word-delimiter expansion + possessive
  strip + ASCII folding + lowercasing) as vectorized, memoized pandas UDFs
  (reference: ``Taxonomy.Common/Domain/Repository/Lucene/Analyzer/*.cs``);
* a classic-Lucene query-string parser for the 136 stored category queries
  (reference: ``Domain/Repository/Lucene/TaxonomyQueryParser.cs``);
* a persistent, term-partitioned inverted index (docID-gap + varbyte blocks
  with per-block max-score metadata) built with explicit skew salting;
* BM25 top-k retrieval with block-max pruning, boolean/phrase/wildcard/range
  query evaluation, and the batch/daily categorisation pipelines
  (reference: ``InMemoryCategoriserRepository.cs``, ``FullReindexService.cs``).

No code is copied from the reference; only observable semantics carry over.
"""

__version__ = "0.1.0"

from ds_discovery_opensearch_taxonomy_spark.config import EngineConfig  # noqa: F401
