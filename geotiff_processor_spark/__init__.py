"""geotiff_processor_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-grounding of the query/data-processing capabilities of
``GastonZalba/geotiff-processor`` (reference at /root/reference, a
single-machine GDAL batch pipeline) as distributed DataFrame operators over
a Common-Crawl-style web-pages table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``:

- geocode pages to lon/lat, encode to hierarchical quadkey cells
  (H3/S2-style parent-prefix property) with native integer expressions or
  Arrow-vectorized pandas UDFs,
- broadcast cell-cover point-in-polygon join (reference analog:
  ``outlines.py`` polygonize inverse),
- cell-prefix kNN + exact two-phase broadcast kNN,
- zonal statistics, XYZ/WMTS tile assignment, iterative AVERAGE overview
  pyramid mirroring the reference overview factors [2..256]
  (``/root/reference/params.py:27``, ``helpers.py:62-70``),
- Mapbox/Terrarium elevation encodings
  (``/root/reference/export_formats/geoserverDEM.py:123-133``),
- percentile color breaks (``/root/reference/helpers.py:108-136``),
- training-data-pipeline operators: exact/MinHash/SimHash dedup, ANN
  similarity search, language-ID / quality / token-count text analysis.

Everything is public PySpark DataFrame API; no per-row Python in hot paths.
"""

__version__ = "0.1.0"
