"""proto_to_avro_ql_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of getyourguide/proto-to-avro-ql.

The reference (read-only at /root/reference) is a row-at-a-time
Protobuf→Avro schema-projection ETL engine (ProtoToAvroTranslator.scala).
This package re-expresses the same capability surface Spark-first:

- the "translation tree" IR becomes a Catalyst ``Column`` expression tree
  built by :mod:`proto_to_avro_ql_spark.plans.compile`;
- row-at-a-time interpretation becomes one declarative ``df.select`` of
  nested struct/transform/coalesce expressions, executed by whole-stage
  codegen over columnar batches;
- schema pruning falls out of Catalyst nested-schema pruning on parquet;
- default-value semantics (SURVEY.md §1.3) live in
  :mod:`proto_to_avro_ql_spark.functions.defaults`.

Beyond the reference surface, :mod:`proto_to_avro_ql_spark.operators`
adds the large-scale training-data pipeline layer: dedup (exact, MinHash
LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search,
text analysis, multimodal binary plumbing, and windowed event analytics.
"""

from proto_to_avro_ql_spark.plans.compile import (
    Constant,
    Scalar,
    SynthStruct,
    compile_projection,
    projected_schema,
    reference_ordering,
)
from proto_to_avro_ql_spark.plans.gaql import parse_gaql, run_gaql
from proto_to_avro_ql_spark.session import get_spark
from proto_to_avro_ql_spark.sources.io import QueryCache, read_table

__all__ = [
    "Constant",
    "QueryCache",
    "Scalar",
    "SynthStruct",
    "compile_projection",
    "get_spark",
    "parse_gaql",
    "projected_schema",
    "read_table",
    "reference_ordering",
    "run_gaql",
]

__version__ = "0.1.0"
