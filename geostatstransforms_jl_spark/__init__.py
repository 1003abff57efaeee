"""geostatstransforms_jl_spark — a from-scratch PySpark-native engine with the
query/data-processing capabilities of JuliaEarth/GeoStatsTransforms.jl.

The reference (at /root/reference, v0.14.18) is a single-process Julia library of
19 composable geospatial table transforms over a "geotable" (attribute table +
geometry domain).  This package re-creates *what* those transforms compute on
idiomatic Spark primitives: DataFrame/SQL plans optimized by Catalyst, spatial
joins re-expressed as equi-joins on engineered cell keys, and Arrow-vectorized
pandas UDFs only where built-in operators cannot express the semantics
(per-tile stencils, boundary tracing, sequential stochastic sweeps).

Layout
------
core/       geotable conventions, aggregation registry, grid metadata,
            quad-cell spatial index, PNG codec, synthetic image table,
            checkpoint/lineage store
operators/  the 19 reference transforms as DataFrame stages
functions/  shared physical services: cell-ring kNN/radius joins,
            table distance, vector math
clustering/ SLIC / GHC / GSC
plans/      Pipeline composition + plan-selection rules (grid fast path, etc.)
sources/    testdata catalog + image-table reader/writer
textops/    training-data-pipeline extras: dedup (exact/minhash/simhash),
            language id, quality scoring, token stats, fingerprints
streaming/  incremental/streaming variants of stateless stages
"""

__version__ = "0.1.0"
