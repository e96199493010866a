"""splitserve_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
PSU-Cloud/splitserve (an Apache Spark 2.1.0 fork; see SURVEY.md).  The
reference's capability surface *is* Spark SQL / DataFrames, so this
package exposes that surface idiomatically on modern PySpark (Catalyst,
Tungsten, AQE) and adds large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed
for a 1000-executor / 100 TB deployment even though tests run on
local[N].

Layout:
  session.py    — SparkSession factory with parity configs
  tables.py     — test-table loaders (TPC-H-ish star schema + events/docs/embeddings)
  registry.py   — query registry: (name → Spark callable + DuckDB oracle SQL)
  operators/    — relational operators + beyond-parity pipeline operators
  functions/    — scalar-function parity surface (SURVEY.md §2.8)
  sources/      — readers/writers (parquet/csv/json/text/jdbc)
  plans/        — plan-inspection utilities (pushdown/broadcast assertions)
  streaming/    — Structured Streaming operators (windows, watermark)
"""

from splitserve_spark.session import get_session, ensure_parity_conf
from splitserve_spark.registry import REGISTRY, register, load_all

__version__ = "0.1.0"

__all__ = ["get_session", "ensure_parity_conf", "REGISTRY", "register", "load_all"]
