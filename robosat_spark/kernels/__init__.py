"""Pure-NumPy kernels. No Spark imports allowed in this subpackage.

Every geometric/raster/hash primitive the reference delegates to C libraries
(mercantile, supermercado, shapely, cv2, rasterio, rtree) is re-implemented
here from scratch in vectorized NumPy, then wired into Spark via
``robosat_spark.functions`` as pandas/Arrow UDFs.
"""
