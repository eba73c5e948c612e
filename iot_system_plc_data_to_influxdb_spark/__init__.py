"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference IoT PLC→InfluxDB pipeline
(ARMAGEDONgtx/IoT-system-PLC-data-to-InfluxDB), rebuilt Spark-first.

Layout
------
- ``session``    : SparkSession builder tuned for local[N] testing, AQE on.
- ``catalog``    : loaders for the driver-provided parquet tables.
- ``functions/`` : scalar/column function libraries (S7 address parse,
                   type decode, time-series helpers, text, vectors).
- ``operators/`` : composite relational operators (as-of join, dedup,
                   similarity search, top-k, retention).
- ``plans/``     : the declared query set (SURVEY.md §2) + DuckDB oracle
                   SQL, exposed through ``__spark_entry__.py``.
- ``sources/``   : config plane (XML → typed DataFrame) and the PLC
                   polling streaming source (simulator + snap7 stub).
- ``streaming/`` : structured-streaming pipeline: decode, windowed
                   aggregation, stateful last-value, foreachBatch sink.

Everything is DataFrame/SQL-first: no RDDs, no custom Catalyst rules.
"""

__version__ = "0.1.0"
