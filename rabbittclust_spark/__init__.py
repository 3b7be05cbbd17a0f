"""rabbittclust_spark — a from-scratch PySpark-native near-duplicate detection
and clustering engine with the capabilities of RabbitBio/RabbitTClust,
retargeted from bacterial genomes to Common-Crawl-style web text.

Architecture (Spark-first, NOT a port of the reference's OpenMP C++ engine):

    read webtext / documents
      -> extract + normalize text          (vectorized pandas UDF)
      -> sketch: bottom-s MinHash | SimHash | FracMinHash | k-perm signature
                                           (mapInPandas, numpy, fixed seeds)
      -> candidate pairs: inverted-index explode-join (reference parity mode)
                          or banded LSH join (scale mode)
      -> pair aggregation: groupBy(src,dst).count  + size-ratio / common-count
         pruning predicates pushed below the aggregate
      -> Jaccard / Mash / containment distance     (column expressions)
      -> threshold filter -> edges
      -> connected components (large-star / small-star DataFrame iterations)
      -> assignments -> dedup-medoid collapse -> representatives
      -> metrics + lineage tables, per-stage checkpoint/resume

Reference semantics documented per-function with /root/reference file:line
citations.  Everything here is public-knowledge PySpark.
"""

from rabbittclust_spark.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
