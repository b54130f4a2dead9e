"""tw_etl_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference ETL system (``28547939/tw-etl``, surveyed in
/root/repo/SURVEY.md), generalized to a relational engine built on the
PySpark DataFrame/SQL API, plus LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Layout:
    session     — SparkSession factory (AQE, Arrow, UTC, local tuning)
    catalog     — test-table loader / temp-view registration
    queries     — oracle-verified query registry (the t2 contract)
    operators   — composite relational operators (as-of join, sessionize,
                  dedup, top-k, …)
    functions   — scalar/vector column expression helpers
    sources     — readers/writers incl. file-metadata scans
    streaming   — Structured Streaming operators + stateful machines
    plans       — plan inspection / optimization assertions
"""

__version__ = "0.1.0"

from tw_etl_spark.session import get_spark  # noqa: F401
from tw_etl_spark.catalog import TABLES, load_tables  # noqa: F401
