"""spark-geotile: a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the operator surface of GDAL/OGR (reference: rashadkm/gdal_svn,
GDAL 2.0.0-dev) as distributed DataFrame operators over tables of
Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``.

Not a port: the reference's single-machine iterators / chunk loops / thread
pools are re-designed as idiomatic Spark — vectorized web-mercator + quadkey
cell encoding in pandas/Arrow UDFs, broadcast-vs-shuffle point-in-polygon
joins with bbox + cell-prefix pruning, kNN via cell-ring expansion, tile
pyramids as partitioned tables with checkpoint/resume, explicit skew
handling, and an OGR-SQL semantics compatibility layer.

Modules
-------
tiles     web-mercator / geodetic tile math + quadkeys  (gdal2tiles.py:205-318)
geom      pure-numpy WKB + vectorized point-in-polygon  (ogr/ogrgeometry.cpp)
extract   deterministic, byte-exact html→text extraction
fixtures  seeded synthetic pages / gazetteer / polygons generators
geotag    text → (lon, lat) broadcast gazetteer join    (ogr/ogr_geocoding.cpp)
joins     broadcast + shuffle PIP joins, salting, kNN   (ogrlayer.cpp:1954+)
raster    density burn, pyramid reduce, GDAL checksum   (alg/gdalrasterize.cpp)
sqlcompat OGR SQL expression semantics                  (ogr/swq_op_general.cpp)
pipeline  stage runner: lineage/metrics manifest + resume
oracle    single-process pure-Python reference implementation
session   SparkSession builder tuned for this engine
"""

__version__ = "0.1.0"
