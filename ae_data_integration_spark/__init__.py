"""ae_data_integration_spark — a PySpark-native analytics engine.

Re-expresses every dataflow capability of the reference study
``wangc90/AE_Data_Integration`` (multi-omics autoencoder data
integration: ingestion, transpose, stratified splits, scaling,
view fusion, loss/metric aggregation, NB classification, clustering
evaluation, hyper-parameter reporting) as idiomatic Spark
DataFrame / SQL plans, and extends it with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal columns, streaming).

Design rules (enforced throughout):

* DataFrame/SQL only — no RDDs; Catalyst owns the physical plan.
* No ``rand()`` in semantics-bearing paths: all sampling/splitting
  derives per-row pseudo-randomness from ``md5(key)`` so results are
  partition-count independent and reproducible at any scale.
* Small dimension tables are broadcast; global statistics are
  computed with ``groupBy().agg`` + broadcast join, never with an
  unpartitioned Window (which would serialize onto one task).
* Python touches data only through Arrow-vectorized
  ``mapInPandas``/``applyInPandas`` (the model-forward layer);
  everything else stays JVM-side inside whole-stage codegen.
"""

__version__ = "0.1.0"

from ae_data_integration_spark.session import get_spark  # noqa: F401
from ae_data_integration_spark.tables import load_tables  # noqa: F401
