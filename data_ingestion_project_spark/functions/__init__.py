"""Column-level helper functions (pure ``pyspark.sql.functions`` builders).

Everything here returns a ``Column`` and stays JVM-side / whole-stage
codegen'd unless explicitly noted (crypto UDFs are pandas UDFs by
necessity — see ``functions.crypto``).
"""

from data_ingestion_project_spark.functions import text, vectors  # noqa: F401
